package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.qcew.{NaicsAgg, Resample, Series}
import graft.ext.{Affinity, AsofJoin, Bloom, Corpus, Dedup, EventsStream, Forecast, Graph, Inference, Multimodal, Privacy, Quantiles, ScaleOps, Sessionize, Similarity, Sketch, Spatial, StatefulOps, TextStats, TimeFill}

/** statistics, hypothesis tests, model eval, privacy, sampling, sketches.
  *
  * One registry shard of [[SparkEntry]] (split in round 9 —
  * the single 11k-line object was the repo's one
  * maintainability hazard). Entries are verbatim; the shared
  * helpers live in [[QueryShared]]. SparkEntry concatenates
  * all shards and unit gates assert name uniqueness and
  * query/oracle set equality.
  */
private[graft] object QueriesStats {
  import QueryShared._

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(

    // ext stats: Gini concentration of per-customer spend within each
    // order priority — the Lorenz-curve summary every mixture-balance
    // review starts from (Inference.giniCoefficient scaladoc: rank
    // window over the AGGREGATED customer grid, Σ i·x an exact long,
    // tie-invariant by construction).
    "q_gini_coef" -> ((s, dir) => {
      Inference.giniCoefficient(spread(t(s, dir, "orders")),
          Seq("o_orderpriority"), col("o_custkey"),
          floor(col("o_totalprice")).cast("long"))
        .orderBy("o_orderpriority")
    }),


    // ext model-eval: Murphy decomposition of the Brier score over 10
    // forecast bins per event type — reliability − resolution +
    // uncertainty, the calibration-plot readout behind q_calibration.
    // Label is the deterministic pseudo-class (user_id % 3 = 0, the
    // q_roc_auc convention) and the forecast is the bin midpoint, so
    // near-zero resolution is the expected honest answer — the
    // plumbing (exact cell grid, drift-free integer BS numerator) is
    // the deliverable (Inference.brierDecomposition scaladoc).
    "q_brier_decomp" -> ((s, dir) => {
      val ev = EventsStream.readEvents(s, s"$dir/events.parquet")
        .select(col("event_type"),
          pmod(round(col("value") * 100).cast("long"), lit(10L)).as("b"),
          (col("user_id") % 3 === 0).as("y"))
      Inference.brierDecomposition(ev, Seq("event_type"), col("b"), 10,
          col("y"))
        .orderBy("event_type")
    }),


    // ext stats: Cramér's V association between return flag and line
    // status — the 0..1 categorical-dependence screen
    // (Inference.cramersV scaladoc: contingency grid + grid-derived
    // margins, exact counts, per-cell χ² float tower).
    "q_cramers_v" -> ((s, dir) => {
      Inference.cramersV(spread(t(s, dir, "lineitem")),
          col("l_returnflag"), col("l_linestatus"))
        .orderBy("n")
    }),


    // ext stats: 2×2 odds ratio with Wald CI per event type — exposed
    // = deterministic arm (user_id % 2), outcome = cents > 5000 (~37%
    // base rate, all four cells populated at sf0.01). OR rounds at 6;
    // the CI bounds pass through ln/exp and round at 4 (the
    // q_token_entropy libm convention) — Inference.oddsRatio scaladoc.
    "q_odds_ratio" -> ((s, dir) => {
      val ev = EventsStream.readEvents(s, s"$dir/events.parquet")
        .select(col("event_type"),
          (col("user_id") % 2 === 1).as("x"),
          (round(col("value") * 100).cast("long") > 5000L).as("y"))
      Inference.oddsRatio(ev, Seq("event_type"), col("x"), col("y"))
        .orderBy("event_type")
    }),


    // ext model-eval: McNemar's paired test between the full-text
    // lang-id and its 16-token truncation against the gold label —
    // "is the cheap truncated classifier actually worse on the SAME
    // docs?" (the q_fleiss_kappa raters, now paired row-wise; exact
    // discordant counts, one division — Inference.mcnemar scaladoc).
    "q_mcnemar" -> ((s, dir) => {
      val toks = spread(t(s, dir, "documents"))
        .select(col("lang"), TextStats.tokens(col("text")).as("l"))
      val paired = toks.select(
        (TextStats.langIdFromTokens(col("l")) === col("lang")).as("c1"),
        (TextStats.langIdFromTokens(slice(col("l"), 1, 16)) === col("lang"))
          .as("c2"))
      Inference.mcnemar(paired, Seq.empty, col("c1"), col("c2"))
        .orderBy("n")
    }),


    // ext stats: Theil T inequality of per-customer spend within each
    // order priority — the decomposable entropy twin of q_gini_coef
    // (Inference.theilIndex scaladoc: quantized-long logs of INTEGER
    // arguments only, so the row-scale sum is exact).
    "q_theil_index" -> ((s, dir) => {
      Inference.theilIndex(spread(t(s, dir, "orders")),
          Seq("o_orderpriority"), col("o_custkey"),
          floor(col("o_totalprice")).cast("long"))
        .orderBy("o_orderpriority")
    }),


    // ext model-eval: Cochran's Q across THREE paired lang-id raters
    // (full text, 16-token, 8-token truncations vs the gold label) —
    // the k-rater omnibus run before pairwise q_mcnemar
    // (Inference.cochranQ scaladoc: per-item indicator sums, Q one
    // division of exact longs).
    "q_cochran_q" -> ((s, dir) => {
      val toks = spread(t(s, dir, "documents"))
        .select(col("lang"), TextStats.tokens(col("text")).as("l"))
      val r = toks.select(
        (TextStats.langIdFromTokens(col("l")) === col("lang")).as("c1"),
        (TextStats.langIdFromTokens(slice(col("l"), 1, 16)) === col("lang"))
          .as("c2"),
        (TextStats.langIdFromTokens(slice(col("l"), 1, 8)) === col("lang"))
          .as("c3"))
      Inference.cochranQ(r, col("c1"), col("c2"), col("c3"))
        .orderBy("n")
    }),


    // ext stats: Herfindahl–Hirschman concentration of per-customer
    // spend within each order priority — the squared-share head-weight
    // complement to q_gini_coef/q_theil_index (Inference.hhi scaladoc:
    // unit grid, double v² per the varC overflow convention).
    "q_hhi" -> ((s, dir) => {
      Inference.hhi(spread(t(s, dir, "orders")),
          Seq("o_orderpriority"), col("o_custkey"),
          floor(col("o_totalprice")).cast("long"))
        .orderBy("o_orderpriority")
    }),


    // ext experiment: stratified ATE per event type — arm = user_id
    // parity, outcome = cents, stratum = a user-id-derived decile (the
    // blocking covariate); emits the naive diff alongside so the
    // adjustment is visible. Plumbing-first like q_roc_auc: near-zero
    // effects expected, the (group, stratum) exact cell grid and the
    // common-support trim are the deliverable
    // (Inference.stratifiedAte scaladoc).
    "q_strat_ate" -> ((s, dir) => {
      val ev = EventsStream.readEvents(s, s"$dir/events.parquet")
        .select(col("event_type"),
          pmod(expr("user_id DIV 7"), lit(10L)).as("st"),
          (col("user_id") % 2).cast("int").as("tr"),
          round(col("value") * 100).cast("long").as("cents"))
      Inference.stratifiedAte(ev, Seq("event_type"), col("st"), col("tr"),
          col("cents"))
        .orderBy("event_type")
    }),


    // A4: deterministic statistical mode (tie-break: smallest value)
    "q_mode" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag").count()
        .orderBy(desc("count"), asc("l_returnflag"))
        .limit(1)
        .select(col("l_returnflag").as("mode_val"))
    }),


    // R1/A8/P15: quarterly->monthly posexplode resample + yearly mean
    "q_resample_yearly" -> ((s, dir) => {
      val base = t(s, dir, "lineitem").select(
        year(col("l_shipdate")).as("year"),
        quarter(col("l_shipdate")).as("qtr"),
        col("l_quantity").as("m1"),
        (col("l_discount") * 100).as("m2"),
        (col("l_tax") * 100).as("m3"))
      Resample.yearlyMean(Resample.monthly(base, "m1", "m2", "m3"))
        .select(col("year"), round(col("employment"), 4).as("employment"), col("date"))
        .orderBy("year")
    }),


    // A9: quarterly mean resample (intended semantics of the reference's
    // buggy groupby key, SURVEY A9 — previously unit-only)
    "q_resample_quarterly" -> ((s, dir) => {
      val base = t(s, dir, "lineitem").select(
        year(col("l_shipdate")).as("year"),
        quarter(col("l_shipdate")).as("qtr"),
        col("l_quantity").as("m1"),
        (col("l_discount") * 100).as("m2"),
        (col("l_tax") * 100).as("m3"))
      Resample.quarterlyMean(Resample.monthly(base, "m1", "m2", "m3"))
        .select(col("year"), col("qtr"),
          round(col("employment"), 4).as("employment"), col("date"))
        .orderBy("year", "qtr")
    }),


    // ext: exact-size stratified sampling, quotas ∝ integer weights
    // (ScaleOps.quotaSample scaladoc) — deterministic md5-order draw,
    // all-integer quota arithmetic, drift-free by construction.
    "q_quota_sample" -> ((s, dir) => {
      val ev = spread(EventsStream.readEvents(s, s"$dir/events.parquet"))
      ScaleOps.quotaSample(
          ev.select("event_type", "event_id", "user_id"),
          Seq("event_type"),
          col("user_id") % 1000 + 1,
          md5(col("event_id").cast("string")),
          100L)
        .select(col("event_type"), col("event_id"),
          col("sample_rank").cast("int").as("rank"))
        .orderBy("event_type", "rank")
    }),


    // ext: count-min sketch as a d×w aggregated table (Sketch scaladoc)
    // — estimates for the exact top-10 users, with the admissibility
    // guarantee (never underestimates) emitted as a checked column.
    "q_cms_topk" -> ((s, dir) => {
      val ev = spread(EventsStream.readEvents(s, s"$dir/events.parquet"))
      val cms = Sketch.countMin(ev, col("user_id"), depth = 4, width = 256)
      val exact = ev.groupBy(col("user_id").as("item"))
        .agg(count(lit(1)).as("exact_n"))
        .orderBy(col("exact_n").desc, col("item")).limit(10)
      Sketch.cmsEstimate(cms, exact, col("item"))
        .withColumn("admissible", col("est") >= col("exact_n"))
        .select("item", "est", "exact_n", "admissible")
        .orderBy(col("exact_n").desc, col("item"))
    }),


    // ext: deterministic HLL distinct users per event_type — the
    // register table is md5-derived INTEGER state (Sketch scaladoc),
    // so the oracle reproduces the sketch bit-for-bit: v_empty and
    // s_scaled (the harmonic denominator as an exact long) gate the
    // full sketch state, est follows the repo's round-4 convention for
    // the one libm call on the linear-counting branch. n_exact rides
    // along so the row itself shows the measured error. Scale: the
    // register aggregate shuffles <= groups x 256 rows — the mergeable
    // approx-distinct that exact COUNT(DISTINCT) can't give at 100 TB.
    "q_hll_distinct" -> ((s, dir) => {
      // item = active user-DAY (user_id:date): ~1.6k distinct per type
      // at sf0.01, so the harmonic ('raw') estimator band is the one
      // exercised — bare user_id (150 distinct) would degenerate to
      // identical linear-counting rows across all groups
      val ev = spread(EventsStream.readEvents(s, s"$dir/events.parquet"))
        .withColumn("user_day", concat(col("user_id").cast("string"),
          lit(":"), col("ts").cast("date").cast("string")))
      val regs = Sketch.hllDetRegisters(ev, Seq("event_type"), col("user_day"))
      val est = Sketch.hllDetEstimate(regs, Seq("event_type"))
      val exact = ev.groupBy("event_type")
        .agg(countDistinct("user_day").as("n_exact"))
      est.join(exact, "event_type")
        .select(col("event_type"), col("n_exact"), col("v_empty"),
          col("s_scaled"), col("band"), col("est"))
        .orderBy("event_type")
    }),


    // ext: KMV bottom-k audience-overlap estimates for every pair of
    // event types, next to the exact Jaccard they approximate. The
    // sketches are k=128 distinct md5 minima per group (KmvAgg: the
    // shuffle carries <= k longs per group per map partition), the
    // pair stage touches ONLY the 5-row sketch table — the mergeable
    // overlap machinery whose exact form (the n_inter join here) has
    // to re-shuffle every distinct (group, user) pair at full scale.
    "q_kmv_overlap" -> ((s, dir) => {
      // audiences = per-type sets of active user-DAYS (see
      // q_hll_distinct): partially overlapping (exact J ~ 0.27 at
      // sf0.01), so the estimator has something real to estimate
      val ev = EventsStream.readEvents(s, s"$dir/events.parquet")
        .withColumn("user_day", concat(col("user_id").cast("string"),
          lit(":"), col("ts").cast("date").cast("string")))
      val sk = Sketch.kmvSketch(ev, "event_type", col("user_day"), k = 128)
      val est = Sketch.kmvOverlap(sk, "event_type", k = 128)
      val du = ev.select(col("event_type").as("g"), col("user_day").as("u"))
        .distinct()
      val sizes = du.groupBy("g").agg(count(lit(1)).as("n"))
      val inter = du.as("x")
        .join(du.as("y"), col("x.u") === col("y.u") && col("x.g") < col("y.g"))
        .groupBy(col("x.g").as("ga"), col("y.g").as("gb"))
        .agg(count(lit(1)).as("n_inter"))
      est.join(inter, Seq("ga", "gb"), "left")
        .join(sizes.withColumnRenamed("g", "ga").withColumnRenamed("n", "n_a"), "ga")
        .join(sizes.withColumnRenamed("g", "gb").withColumnRenamed("n", "n_b"), "gb")
        .withColumn("n_inter", coalesce(col("n_inter"), lit(0L)))
        .withColumn("jaccard_exact", round(col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter")).cast("double"), 4))
        .select("ga", "gb", "n_shared", "ku", "jaccard_kmv", "n_inter",
          "jaccard_exact")
        .orderBy("ga", "gb")
    }),


    // ext: robust outlier screen — median/MAD per group, count of
    // |z| > 3 points; median-based so extremes can't mask themselves.
    // DISCRETE medians (actual data values, pure integer rank logic):
    // interpolated quantiles drift in the last ulp across engine
    // versions, and the rounded report + borderline outlier count can
    // flip on that; the cont twin stays unit-gated.
    "q_outliers" -> ((s, dir) => {
      // keyed fan-out on the near-unique (group, value) grid keys (see
      // q_weighted_median): the operator's first collapse barely
      // collapses, so the keyed exchange doubles as its distribution
      // and the single-split scan no longer funnels the partial
      // aggregate through one task; shuffle count unchanged (2 — the
      // operator's plan-gated contract)
      ScaleOps.robustOutliersDisc(
          spreadBy(t(s, dir, "lineitem")
              .select(col("l_returnflag"), col("l_extendedprice")),
            col("l_returnflag"), col("l_extendedprice")),
          Seq("l_returnflag"), "l_extendedprice")
        .orderBy("l_returnflag")
    }),


    // SQL surface: fixed-width histogram — bin = floor(x / width)
    // clamped to [0, nbins-1]; one map-side-combined aggregate. The
    // bin boundary division is a single IEEE op on doubles, identical
    // cross-engine.
    "q_histogram" -> ((s, dir) => {
      val width = 5000.0
      val bin = least(greatest(floor(col("l_extendedprice") / width), lit(0L)),
        lit(21L)).as("bin")
      t(s, dir, "lineitem")
        .groupBy(bin)
        .agg(count(lit(1)).as("n_rows"),
          round(min("l_extendedprice"), 2).as("min_price"),
          round(max("l_extendedprice"), 2).as("max_price"))
        .orderBy("bin")
    }),


    // OLAP contribution analysis: share-of-total via a window over the
    // AGGREGATED frame — the ratio-to-report pattern. Aggregate first
    // (group count ≪ rows), round the per-group sums so both engines
    // window over identical inputs, then the share is one IEEE
    // division. The window partitions by region over ~5 nations/region
    // — a 25-row frame, trivially one reducer.
    "q_share_of_total" -> ((s, dir) => {
      val perNation = t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"))), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_regionkey", "n_name")
        .agg(round(sum("o_totalprice"), 2).as("nation_total"))
      perNation
        .withColumn("region_total",
          sum("nation_total").over(Window.partitionBy("n_regionkey")))
        .select(col("n_regionkey").as("region_key"), col("n_name").as("nation"),
          col("nation_total"),
          round(col("nation_total") / col("region_total"), 6).as("share_of_region"))
        .orderBy("region_key", "nation")
    }),


    // ML-ops data-drift gate: population stability index between two
    // time slices of the value distribution, per event type. One pass
    // builds both halves' bin counts (conditional counts — bins absent
    // from one half get exact zeros); proportions are exact-count
    // divisions with the standard 1e-6 floor for empty bins; the PSI
    // sum spans ≤10 bin terms, rounded 1e-6. PSI > 0.2 is the usual
    // retrain/alert threshold.
    "q_psi_drift" -> ((s, dir) => {
      val ev = EventsStream.readEvents(s, s"$dir/events.parquet")
        .withColumn("bin", least(floor(col("value") / 50.0), lit(9.0)).cast("long"))
        .withColumn("half", when(dayofmonth(col("ts")) <= 15, "ref").otherwise("cur"))
      val counts = ev.groupBy("event_type", "bin")
        .agg(count(when(col("half") === "ref", 1)).as("c_ref"),
          count(when(col("half") === "cur", 1)).as("c_cur"))
      val tot = counts.groupBy("event_type")
        .agg(sum("c_ref").as("n_ref"), sum("c_cur").as("n_cur"))
      counts.join(broadcast(tot), "event_type")
        .withColumn("p_ref", greatest(col("c_ref").cast("double") / col("n_ref"), lit(1e-6)))
        .withColumn("p_cur", greatest(col("c_cur").cast("double") / col("n_cur"), lit(1e-6)))
        .withColumn("term", (col("p_cur") - col("p_ref")) * log(col("p_cur") / col("p_ref")))
        .groupBy("event_type")
        .agg(min("n_ref").as("n_ref"), min("n_cur").as("n_cur"),
          round(sum("term"), 6).as("psi"))
        .orderBy("event_type")
    }),


    // ML-ops drift, WHOLE-TABLE form: PSI for three feature columns in
    // ONE scan — each row fans out to (feature, bin) pairs via a
    // 3-element explode (the Expand pattern q_psi_drift's SCALING row
    // promises), then the same conditional-count PSI math runs per
    // feature. Adding a column costs one more struct, never a rescan.
    "q_psi_multi" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .withColumn("half",
          when(col("l_shipdate") < lit("1998-07-01").cast("timestamp"), "ref")
            .otherwise("cur"))
      val binned = li.select(col("half"), explode(array(
          struct(lit("quantity").as("feature"),
            least(floor(col("l_quantity") / 5.0), lit(9.0)).cast("long").as("bin")),
          struct(lit("price").as("feature"),
            least(floor(col("l_extendedprice") / 10000.0), lit(10.0)).cast("long").as("bin")),
          struct(lit("discount").as("feature"),
            least(floor(col("l_discount") / 0.01), lit(10.0)).cast("long").as("bin"))))
          .as("fb"))
        .select(col("half"), col("fb.feature").as("feature"), col("fb.bin").as("bin"))
      val counts = binned.groupBy("feature", "bin")
        .agg(count(when(col("half") === "ref", 1)).as("c_ref"),
          count(when(col("half") === "cur", 1)).as("c_cur"))
      val tot = counts.groupBy("feature")
        .agg(sum("c_ref").as("n_ref"), sum("c_cur").as("n_cur"))
      counts.join(broadcast(tot), "feature")
        .withColumn("p_ref", greatest(col("c_ref").cast("double") / col("n_ref"), lit(1e-6)))
        .withColumn("p_cur", greatest(col("c_cur").cast("double") / col("n_cur"), lit(1e-6)))
        .withColumn("term", (col("p_cur") - col("p_ref")) * log(col("p_cur") / col("p_ref")))
        .groupBy("feature")
        .agg(min("n_ref").as("n_ref"), min("n_cur").as("n_cur"),
          round(sum("term"), 6).as("psi"))
        .orderBy("feature")
    }),


    // ext: deterministic stratified hash sampling — md5-prefix
    // membership, not rand(): reproducible across reruns and engines,
    // the way production corpus subsets are cut. 'en' docs kept at
    // 2/16, everything else at 4/16. The predicate is ordered so the
    // cheap hash-bucket test short-circuits the language ID: buckets
    // 0-1 are kept regardless of language, buckets >3 dropped
    // regardless, so langId (tokenize-once, but still the expensive
    // term) evaluates only for the 2/16 of rows where it decides.
    "q_hash_sample" -> ((s, dir) => {
      val docs = spread(t(s, dir, "documents"))
      val bucket = substring(md5(col("doc_id").cast("string")), 1, 1)
      val lang = TextStats.langId(col("text"))
      docs
        .filter(bucket.isin("0", "1") ||
          (bucket.isin("2", "3") && lang =!= "en"))
        .select(col("doc_id"), lang.as("lang_id"))
        .orderBy("doc_id")
    }),


    // ext: exact order statistics + linear relationship aggregates.
    // The quantiles run through the SCALE path (Quantiles.exactQuantiles:
    // hash-agg to distinct values + cumulative-count window — no
    // per-group value map in executor memory, unlike Spark's exact
    // `percentile` aggregate, which this reproduces bit-for-bit and is
    // unit-tested against). percentile_cont semantics match DuckDB's
    // quantile_cont; corr is the textbook Pearson definition in both
    // engines.
    "q_percentiles" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      // keyed fan-out on the near-unique (group, value) grid keys —
      // see q_weighted_median; the corr leg collapses to 3 rows
      // map-side, so its single-split scan stays as-is
      val qs = Quantiles.exactQuantiles(
        spreadBy(li.select(col("l_returnflag"), col("l_extendedprice")),
          col("l_returnflag"), col("l_extendedprice")),
        "l_extendedprice",
        Seq("l_returnflag"), Seq(0.5, 0.95), Seq("p50", "p95"))
      val cr = li.groupBy("l_returnflag")
        .agg(round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("qty_price_corr"))
      qs.join(cr, Seq("l_returnflag"))
        .select(col("l_returnflag"),
          round(col("p50"), 4).as("p50"),
          round(col("p95"), 4).as("p95"),
          col("qty_price_corr"))
        .orderBy("l_returnflag")
    }),


    // discrete percentiles: actual data values (no interpolation), so
    // the cross-engine compare is drift-free by construction even on
    // raw doubles — the disc twin of q_percentiles' cont path, running
    // the SAME scale machinery (distinct-value counts + cumulative
    // window; no per-group value map, unlike Spark's percentile_disc
    // aggregate, which this reproduces bit-for-bit — unit-gated)
    "q_percentile_disc" -> ((s, dir) => {
      // keyed fan-out on the near-unique grid keys — see q_weighted_median
      Quantiles.exactQuantilesDisc(
          spreadBy(t(s, dir, "lineitem")
              .select(col("l_returnflag"), col("l_extendedprice")),
            col("l_returnflag"), col("l_extendedprice")),
          "l_extendedprice",
          Seq("l_returnflag"), Seq(0.5, 0.95), Seq("p50_disc", "p95_disc"))
        .orderBy("l_returnflag")
    }),


    // multiple exact count-distincts per group (Catalyst Expand: one
    // pass over the input fans out per distinct aggregate, partial
    // aggregation bounds the shuffle by distinct keys)
    "q_count_distinct" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    }),


    // drift-free summary statistics: mean/stddev derived from EXACT
    // integer power sums (quantity is integer-valued; sum and sum-of-
    // squares are exact bigints), so the only float ops are one
    // division and one sqrt over identical inputs — bit-equal on any
    // engine, no rounding needed. This is also the mergeable form:
    // (n, s, ss) sums combine map-side and across partitions, unlike a
    // sequential Welford stddev. At larger scale guard n·ss against
    // bigint overflow by computing per finer-grained groups first.
    "q_group_stats" -> ((s, dir) => {
      val q = col("l_quantity").cast("long")
      spread(t(s, dir, "lineitem").select(col("l_returnflag"), q.as("q")))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum("q").as("s"),
          sum(col("q") * col("q")).as("ss"),
          min("q").as("min_q"), max("q").as("max_q"))
        .select(col("l_returnflag"), col("n"), col("s"), col("min_q"), col("max_q"),
          (col("s").cast("double") / col("n").cast("double")).as("mean_q"),
          sqrt((col("n") * col("ss") - col("s") * col("s")).cast("double") /
            (col("n") * (col("n") - lit(1))).cast("double")).as("stddev_q"))
        .orderBy("l_returnflag")
    }),


    // UDAF surface (§2.11): bounded top-k typed Aggregator — the
    // aggregation-pushdown rewrite of the window top-k. The buffer
    // never exceeds k rows, reduce runs map-side before the exchange,
    // and merge combines k-bounded buffers — so the shuffle carries at
    // most k rows per group per map partition instead of every row
    // (TopKAgg scaladoc). Hash-checked against the row_number() window
    // form the oracle runs.
    "q_topk_agg" -> ((s, dir) => {
      val topk = udaf(new graft.functions.TopKAgg(3))
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(topk(col("o_totalprice"), col("o_orderkey")).as("top"))
        .select(col("o_orderpriority"), posexplode(col("top")))
        .select(col("o_orderpriority"),
          (col("pos") + 1).cast("long").as("rnk"),
          col("col.score").as("o_totalprice"),
          col("col.id").as("o_orderkey"))
        .orderBy("o_orderpriority", "rnk")
    }),


    // ext streaming: materialized-view maintenance — each micro-batch
    // lands its PARTIAL aggregates in a batch_id partition (replay
    // overwrites, never double-merges); the served rollup merges the
    // partials. Same oracle as q_incr_agg: the full recompute — the
    // gate proves the streaming-maintained view equals rescanning
    // everything (EventsStream.maintainRollup scaladoc).
    // exact distinct users per type via the mergeable BITMAP aggregator
    // — O(domain/8)-byte state per group regardless of row count,
    // map-side OR-combine; the exact-bitmap point on the distinct
    // spectrum between approx_count_distinct and the Expand plan
    // (functions.BitmapDistinct scaladoc). Oracle = COUNT(DISTINCT).
    // exact distinct via CHUNKED bitmaps (the roaring-bitmap layout):
    // ids split on their high bits into 64Ki-wide buckets and the
    // 16-bit remainder is bitmapped within each (event_type, bucket)
    // group, then bucket cardinalities sum — exact over ANY sparse id
    // domain with a fixed 8 KiB buffer per group, where a single flat
    // bitmap needs the full domain width and fails loudly on sparse
    // ids (it did, at the key-shifted 10× dataset).
    // Chunk key = arithmetic shiftright(id,16): a FLOORING quotient, so
    // with pmod's floored remainder the pair is a true Euclidean
    // decomposition for negative ids too (a truncating `/` would fold
    // -1 and 65535 into the same cell and undercount by one).
    "q_bitmap_distinct" -> ((s, dir) => {
      val bd = udaf(new graft.functions.BitmapDistinct(1 << 16))
      spread(EventsStream.readEvents(s, s"$dir/events.parquet"))
        .groupBy(col("event_type"),
          shiftright(col("user_id").cast("long"), 16).as("id_chunk"))
        .agg(bd(pmod(col("user_id"), lit(65536L))).as("n"))
        .groupBy("event_type")
        .agg(sum("n").as("n_users"))
        .orderBy("event_type")
    }),


    // ext: deterministic weighted sampling (sequential Poisson /
    // priority sampling) — inclusion odds ~ n_chars, reproducible
    // across engines/reruns/partitionings because the draw is
    // md5-derived, never rand(). Two-phase top-k: partitions prune to
    // their local k before anything shuffles.
    "q_weighted_sample" -> ((s, dir) => {
      ScaleOps.weightedSample(spread(t(s, dir, "documents")), k = 60,
          keyCol = "doc_id", weight = col("n_chars"))
        .select(col("doc_id"), col("n_chars"), col("lang"))
        .orderBy("doc_id")
    }),


    // ext: per-STRATUM weighted sampling — the same sequential-Poisson
    // draw with the rank window partitioned by language: k winners per
    // stratum, inclusion odds ~ n_chars within each. WindowGroupLimit
    // prunes every task to k per stratum before the single shuffle.
    "q_weighted_sample_strat" -> ((s, dir) => {
      ScaleOps.weightedSample(spread(t(s, dir, "documents")), k = 8,
          keyCol = "doc_id", weight = col("n_chars"), strata = Seq("lang"))
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy("doc_id")
    }),


    // ext: leakage-safe train/val/test split — the split is a pure
    // function of user_id (md5 nibble), so no user straddles splits;
    // grouped counts audit both the ratio and the entity disjointness
    // (n_users sums to the distinct-user total).
    "q_group_split" -> ((s, dir) => {
      EventsStream.readEvents(s, s"$dir/events.parquet")
        .withColumn("split", ScaleOps.splitByKey(col("user_id")))
        .groupBy("split")
        .agg(countDistinct("user_id").as("n_users"),
          count(lit(1)).as("n_events"),
          round(sum("value"), 2).as("total_value"))
        .orderBy("split")
    }),


    // robust feature preprocessing: winsorization — clamp the tails to
    // the per-group [p05, p95] before aggregating. Percentiles come
    // from the SAME scale path as q_percentiles (distinct-value counts
    // + cumulative window, no per-group value buffer); the clamp is a
    // broadcast join-back plus least/greatest. Counts are exact ints;
    // the winsorized mean is over ~identical magnitudes, rounded 1e-4.
    "q_winsorize" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      // keyed fan-out on the bounds leg's near-unique grid keys — see
      // q_weighted_median; the clamp leg is scan → broadcast join →
      // 3-row collapse, already one chain
      val bounds = Quantiles.exactQuantiles(
        spreadBy(li.select(col("l_returnflag"), col("l_extendedprice")),
          col("l_returnflag"), col("l_extendedprice")),
        "l_extendedprice",
        Seq("l_returnflag"), Seq(0.05, 0.95), Seq("lo", "hi"))
      li.join(broadcast(bounds), Seq("l_returnflag"))
        .withColumn("w", least(greatest(col("l_extendedprice"), col("lo")), col("hi")))
        .groupBy("l_returnflag")
        .agg(count(when(col("l_extendedprice") < col("lo"), 1)).as("n_clamped_low"),
          count(when(col("l_extendedprice") > col("hi"), 1)).as("n_clamped_high"),
          count(lit(1)).as("n_rows"),
          round(min("lo"), 4).as("p05"),
          round(min("hi"), 4).as("p95"),
          round(avg("w"), 4).as("winsorized_mean"))
        .orderBy("l_returnflag")
    }),


    // feature preprocessing: per-group z-score standardization with
    // DRIFT-FREE parameters — mean and stddev derive from exact
    // integer power sums (n, Σx, Σx² — the q_group_stats machinery),
    // so the only float ops are two divisions and a sqrt over
    // identical inputs; z = (x − μ)/σ is then two more IEEE ops.
    // Population σ, not Spark's streaming stddev aggregate (engine-
    // specific accumulation order). Broadcast join-back of the tiny
    // per-group parameter table; outputs are exact counts + exact-
    // extrema rounds.
    "q_standardize" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val stats = li.groupBy("l_returnflag")
        .agg(count(lit(1)).cast("long").as("n"),
          sum(col("l_quantity").cast("long")).as("s1"),
          sum((col("l_quantity") * col("l_quantity")).cast("long")).as("s2"))
        .withColumn("mu", col("s1").cast("double") / col("n"))
        .withColumn("sigma",
          sqrt((col("s2").cast("double") * col("n") - col("s1").cast("double") * col("s1")) /
            (col("n").cast("double") * col("n"))))
      li.join(broadcast(stats), Seq("l_returnflag"))
        .withColumn("z", (col("l_quantity") - col("mu")) / col("sigma"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_rows"),
          count(when(abs(col("z")) > 1.5, 1)).as("n_beyond_15sd"),
          round(min("z"), 6).as("z_min"),
          round(max("z"), 6).as("z_max"),
          round(min("mu"), 6).as("mu"),
          round(min("sigma"), 6).as("sigma"))
        .orderBy("l_returnflag")
    }),


    // exact WEIGHTED discrete quantiles: quantity-weighted price
    // median/p90 per return flag — each row counts its weight, the
    // inventory-weighted "typical price" form. Same distinct-value
    // cumulative machinery as q_percentile_disc with Σw in place of
    // row counts (Quantiles.exactWeightedQuantilesDisc scaladoc).
    "q_weighted_median" -> ((s, dir) => {
      // keyed fan-out on the (group, value) grid keys: the price axis
      // is near-unique (594k distinct at sf0.1), so the grid aggregate
      // barely collapses and the RR spread was a second full-row
      // exchange ahead of the grid's own (round 14 — the q_spearman
      // probe: 0.94 s RR vs 0.56 s keyed on the same base)
      val li = t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_extendedprice"), col("l_quantity"))
      Quantiles.exactWeightedQuantilesDisc(
          spreadBy(li, col("l_returnflag"), col("l_extendedprice")),
          "l_extendedprice", "l_quantity", Seq("l_returnflag"),
          Seq(0.5, 0.9), Seq("wp50", "wp90"))
        .orderBy("l_returnflag")
    }),


    // A/B experiment readout: Welch's t between the user_id%2 arms on
    // the cent-quantized event value, per event_type. The quantization
    // (floor(value·100) — an exact IEEE op both engines perform
    // identically) is what makes the power sums exact longs, so the
    // only floats are the final closed-form expressions (Inference
    // scaladoc). Shuffle carries 6 longs per group.
    "q_ab_ttest" -> ((s, dir) => {
      Inference.welchT(spread(EventsStream.readEvents(s, s"$dir/events.parquet")),
          group = Seq("event_type"),
          arm = col("user_id") % 2, x = floor(col("value") * 100))
        .orderBy("event_type")
    }),


    // effect SIZE for the same experiment readout: Cohen's d between
    // the user_id%2 arms per event_type — the "big or just
    // significant" complement to q_ab_ttest (t grows with √n, d does
    // not; at 100 TB everything is significant and only d is
    // decision-grade). Same one-pass exact power sums
    // (Inference.cohensD scaladoc).
    "q_cohens_d" -> ((s, dir) => {
      Inference.cohensD(spread(EventsStream.readEvents(s, s"$dir/events.parquet")),
          group = Seq("event_type"),
          arm = col("user_id") % 2, x = floor(col("value") * 100))
        .orderBy("event_type")
    }),


    // one-way ANOVA F across ALL k event types at once — the k-sample
    // step up from q_ab_ttest's two arms ("do the type means differ at
    // all?" before any pairwise drill-down). One power-sum pass,
    // k-bounded shuffle; only the O(1) ratios F and η² are emitted
    // (Inference.anovaF scaladoc on why the raw sums of squares are
    // not hash-stable at scale).
    "q_anova_f" -> ((s, dir) => {
      Inference.anovaF(spread(EventsStream.readEvents(s, s"$dir/events.parquet")),
          group = Seq("event_type"), x = floor(col("value") * 100))
    }),


    // Kruskal–Wallis H across order priorities on the dollar-floored
    // total price — the rank-based ANOVA for skewed money amounts,
    // exact via the same doubled-midrank trick as q_mann_whitney
    // (every aggregate an exact long; the value grid, not the rows,
    // carries the one ordered pass).
    "q_kruskal_wallis" -> ((s, dir) => {
      Inference.kruskalWallisH(spread(t(s, dir, "orders")),
          group = Seq("o_orderpriority"), x = floor(col("o_totalprice")))
    }),


    // Brown–Forsythe robust variance-equality gate on the same readout
    // as q_anova_f — run BEFORE trusting ANOVA's pooled variance.
    // Median-centered |deviations| computed entirely on the
    // (type, value) grid: per-group discrete medians from a grid
    // cumulative, count-weighted power sums, rows scanned once.
    "q_levene_bf" -> ((s, dir) => {
      Inference.brownForsytheW(spread(EventsStream.readEvents(s, s"$dir/events.parquet")),
          group = Seq("event_type"), x = floor(col("value") * 100))
    }),


    // Grubbs-style max studentized deviation per return flag: the
    // batch-admission outlier screen, with the suspect value decided
    // by an exact long comparison (n·(max+min) vs 2·Σx — no float
    // argmax over rows, Inference.grubbsMax scaladoc).
    "q_grubbs" -> ((s, dir) => {
      Inference.grubbsMax(spread(t(s, dir, "lineitem")),
          group = Seq("l_returnflag"), x = floor(col("l_extendedprice")))
        .orderBy("l_returnflag")
    }),


    // Mood's median test across market segments on cent-quantized
    // account balance: each segment's split around the GRAND discrete
    // median, per-segment chi-square contributions plus the shared
    // total — the assumption-free location gate when even ranks are
    // too much structure (heavy censoring, bounded scales).
    "q_mood_median" -> ((s, dir) => {
      Inference.moodMedianChi2(spread(t(s, dir, "customer")),
          group = Seq("c_mktsegment"), x = floor(col("c_acctbal") * 100))
        .orderBy("c_mktsegment")
    }),


    // decision-stump split scan: weighted Gini of every quantity
    // threshold against the "returned" label — tree training's inner
    // kernel as a grid-sized scan (counts collapse map-side to the
    // distinct-value grid; smallest-threshold tie-break flags the
    // winner deterministically).
    "q_best_split" -> ((s, dir) => {
      Inference.giniSplitScan(spread(t(s, dir, "lineitem")),
          feature = floor(col("l_quantity")),
          label = col("l_returnflag") === "R")
        .orderBy("threshold")
    }),


    // Friedman test over day blocks × event-type treatments on the
    // daily count: the repeated-measures "do the types rank the same
    // every day?" — each day is its own control, so weekday level
    // shifts cancel exactly. Doubled within-block midranks keep the
    // tie-corrected chi-square ONE division of exact longs
    // (Inference.friedmanT1 scaladoc).
    "q_friedman" -> ((s, dir) => {
      val days = spread(EventsStream.readEvents(s, s"$dir/events.parquet"))
        .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd")
          .as("day"), col("event_type"))
        .agg(count(lit(1)).as("y"))
      Inference.friedmanT1(days, block = col("day"),
          treatment = col("event_type"), y = col("y"))
        .orderBy("trt")
    }),


    // post-hoc pairwise contrasts on the q_anova_f readout: WHICH
    // event-type pairs differ once the omnibus F fires — mean diff and
    // studentized t against the pooled MSW, k² broadcast pairs
    // (Inference.tukeyPairs scaladoc).
    "q_tukey_pairs" -> ((s, dir) => {
      Inference.tukeyPairs(spread(EventsStream.readEvents(s, s"$dir/events.parquet")),
          group = "event_type", x = floor(col("value") * 100))
        .orderBy("g_a", "g_b")
    }),


    // CUPED variance-reduced A/B: per-user pre-period spend adjusts
    // the post-period readout (pre/post = grand median of the distinct
    // day grid — engine-exact), θ and both arm diffs from ONE row of
    // power sums; ρ² says how much variance the covariate removed
    // (Inference.cupedAdjust scaladoc).
    "q_cuped" -> ((s, dir) => {
      val ev = spread(EventsStream.readEvents(s, s"$dir/events.parquet"))
        .select(col("user_id"),
          date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
          floor(col("value") * 100).cast("long").as("cents"))
      val dg = ev.select("day").distinct()
        .withColumn("rn", row_number().over(Window.orderBy("day")))
        .withColumn("nd", count(lit(1)).over(Window.partitionBy()))
      val med = dg.agg(min(when(col("rn") >= shiftright(col("nd") + 1L, 1),
        col("day"))).as("med"))
      Inference.cupedAdjust(ev.crossJoin(broadcast(med)),
        unit = col("user_id"), arm = col("user_id") % 2,
        x = when(col("day") <= col("med"), col("cents")).otherwise(0L),
        y = when(col("day") > col("med"), col("cents")).otherwise(0L))
    }),


    // 2×2 difference-in-differences across the same pre/post boundary:
    // did the odd-user arm MOVE more than the even arm moved? Cancels
    // the arm baseline gap and the common time shock in one
    // conditional power-sum pass (Inference.diffInDiff scaladoc).
    "q_did" -> ((s, dir) => {
      val ev = spread(EventsStream.readEvents(s, s"$dir/events.parquet"))
        .select(col("user_id"),
          date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
          floor(col("value") * 100).cast("long").as("cents"))
      val dg = ev.select("day").distinct()
        .withColumn("rn", row_number().over(Window.orderBy("day")))
        .withColumn("nd", count(lit(1)).over(Window.partitionBy()))
      val med = dg.agg(min(when(col("rn") >= shiftright(col("nd") + 1L, 1),
        col("day"))).as("med"))
      Inference.diffInDiff(ev.crossJoin(broadcast(med)),
        treat = col("user_id") % 2, post = col("day") > col("med"),
        y = col("cents"))
    }),


    // Bartlett's variance-equality test on the q_anova_f readout — the
    // parametric complement to q_levene_bf (most powerful under
    // normality, fragile off it; agreement between the two is the
    // signal). Same per-type power sums, ln tower at the end.
    "q_bartlett" -> ((s, dir) => {
      Inference.bartlettT(spread(EventsStream.readEvents(s, s"$dir/events.parquet")),
          group = Seq("event_type"), x = floor(col("value") * 100))
    }),


    // survey-style raking: reweight the (segment × priority) mix to
    // uniform marginals in 4 IPF rounds — the maximum-entropy
    // rebalance a training-data mixer needs when it must hit source
    // AND language quotas at once. All grid-sized after one counting
    // pass (Inference.ipfRake scaladoc).
    "q_ipf_rake" -> ((s, dir) => {
      val oc = spread(t(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderpriority")))
        .join(broadcast(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"))),
          col("o_custkey") === col("c_custkey"))
      Inference.ipfRake(oc, rowC = col("c_mktsegment"),
          colC = col("o_orderpriority"))
        .orderBy("r", "c")
    }),


    // Simpson's-paradox screen: price-on-quantity slope per return
    // flag vs pooled — does splitting by flag reverse the trend the
    // pooled dashboard shows? Per-segment + pooled slopes from one
    // power-sum pass (Inference.simpsonScreen scaladoc).
    "q_simpson" -> ((s, dir) => {
      Inference.simpsonScreen(spread(t(s, dir, "lineitem")),
          seg = col("l_returnflag"), x = floor(col("l_quantity")),
          y = floor(col("l_extendedprice")))
        .orderBy("seg")
    }),


    // experiment power gate: minimum detectable effect per event type
    // from the OBSERVED variance and the parity arms' actual sizes —
    // run BEFORE reading q_ab_ttest (an underpowered test's null is
    // not evidence). Pinned z literals keep both engines bit-equal
    // (Inference.mdePower scaladoc).
    "q_mde" -> ((s, dir) => {
      Inference.mdePower(spread(EventsStream.readEvents(s, s"$dir/events.parquet")),
          group = Seq("event_type"), arm = col("user_id") % 2,
          x = floor(col("value") * 100))
        .orderBy("event_type")
    }),


    // per-group closed-form least squares: price-per-quantity slope /
    // intercept / r² per return flag from five exact power sums — the
    // feature-vs-target screen a training pipeline runs over every
    // numeric pair, at one scan + group-bounded shuffle.
    "q_group_regression" -> ((s, dir) => {
      Inference.linearFit(spread(t(s, dir, "lineitem")), group = Seq("l_returnflag"),
          x = col("l_quantity"), y = floor(col("l_extendedprice")))
        .orderBy("l_returnflag")
    }),


    // mutual information I(lang; source) from one contingency pass —
    // the dataset-audit question "does language depend on source?"
    // answered with exact counts; per-lang partial contributions so the
    // dependent categories are visible, not just the scalar.
    "q_mutual_info" -> ((s, dir) => {
      Inference.mutualInfo(spread(t(s, dir, "documents")), "lang", "source")
        .orderBy("lang")
    }),


    // split-conformal prediction intervals per market segment:
    // hash-split train/val/test, floor-mean predictor, discrete
    // 0.9-quantile of |y − ŷ| on calibration, empirical coverage on
    // test in basis points — the distribution-free interval calibration
    // every model-serving pipeline should gate on. Integer-exact end to
    // end (Inference.conformalInterval scaladoc).
    "q_conformal" -> ((s, dir) => {
      val o = spread(t(s, dir, "orders"))
        .join(broadcast(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"))),
          col("o_custkey") === col("c_custkey"))
      Inference.conformalInterval(o, Seq("c_mktsegment"), col("o_orderkey"),
          floor(col("o_totalprice") * 100), p = 0.9)
        .orderBy("c_mktsegment")
    }),


    // two-sample KS drift test between the user_id%2 arms on the
    // cent-quantized value: counts collapse to the quantized grid, so
    // the global CDF window runs over grid cells, not rows (Inference
    // scaladoc) — the binning-free complement to q_psi_drift, with a
    // significance threshold.
    "q_ks_test" -> ((s, dir) => {
      Inference.ksTest(spread(EventsStream.readEvents(s, s"$dir/events.parquet")),
          arm = col("user_id") % 2, x = floor(col("value") * 100))
        .orderBy("n0")
    }),


    // WOE / information-value screen of the decade-binned event value
    // against the user-parity label: one contingency pass, exact
    // counts, fixed float tower (Inference.woeIv scaladoc).
    "q_woe_iv" -> ((s, dir) => {
      Inference.woeIv(spread(EventsStream.readEvents(s, s"$dir/events.parquet")),
          bin = floor(col("value") / 10), label = col("user_id") % 2 === 1)
        .orderBy("bin")
    }),


    // chi-square independence: does event_type depend on the user's
    // A/B arm? One contingency pass; per-cell contributions quantized
    // to nano-units so the global Σ runs over exact longs
    // (Inference.chi2 scaladoc) — the categorical complement to
    // q_ab_ttest/q_ks_test.
    "q_chi2_test" -> ((s, dir) => {
      Inference.chi2(
          spread(EventsStream.readEvents(s, s"$dir/events.parquet"))
            .select(col("event_type"), (col("user_id") % 2).cast("int").as("arm")),
          "event_type", "arm")
        .orderBy("n")
    }),


    // Gini concentration of the corpus source mix — the one-number
    // "how skewed is my training-data mixture" readout. Sorted-rank
    // form Σ(2i−n−1)·x_i / (n·Σx): the numerator is exact integer
    // (rank window over the tiny per-source count table), one final
    // division. Complements q_mixture_balance's per-source shares.
    "q_gini_mixture" -> ((s, dir) => {
      val counts = spread(t(s, dir, "documents"))
        .groupBy("source").agg(count(lit(1)).as("x"))
      val i = row_number().over(Window.orderBy(col("x").asc, col("source").asc))
        .cast("long")
      val ranked = counts.select(col("x"),
        ((lit(2) * i).cast("long") * col("x")).as("ix2"))
      ranked.agg(count(lit(1)).as("n_sources"), sum("x").as("total_docs"),
          sum("ix2").as("s_ix2"))
        .select(col("n_sources"), col("total_docs"),
          round((col("s_ix2") - (col("n_sources") + 1) * col("total_docs"))
            .cast("double") /
            (col("n_sources") * col("total_docs")).cast("double"), 6)
            .as("gini"))
    }),


    // privacy: t-closeness audit over (returnflag, linestatus) groups
    // against the ordinal quantity-decile distribution — the
    // distribution-skew leak that k-anonymity and l-diversity both
    // miss. Exact integer EMD numerator; quantities are integral
    // doubles so the int cast is exact, and floor-division on the
    // nonnegative bucket is Euclidean in both engines.
    "q_t_closeness" -> ((s, dir) => {
      Privacy.tClosenessGroups(t(s, dir, "lineitem"),
          Seq(col("l_returnflag"), col("l_linestatus")),
          floor(col("l_quantity").cast("int") / 10).cast("long"))
        .select(col("q0").as("l_returnflag"), col("q1").as("l_linestatus"),
          col("n"), col("t_num"), col("t"))
        .orderBy("l_returnflag", "l_linestatus")
    }),


    // annotation QA at ensemble scale: Fleiss' kappa over THREE raters
    // per document (gold lang, full-text lang-id, first-16-token
    // lang-id) — the multi-annotator agreement gate; every κ term an
    // exact long, three divisions total (Inference.fleissKappa
    // scaladoc).
    "q_fleiss_kappa" -> ((s, dir) => {
      // one scan, one tokenization, all three rater labels in ONE
      // projection, then explode to the long-form assignment — the
      // round-12 unionAll-of-three-projections form re-scanned and
      // re-tokenized the documents table once per rater (and the
      // operator's two rollups doubled that again before round 13's
      // cell-grid persist)
      val assign = spread(t(s, dir, "documents"))
        .select(col("doc_id"), col("lang"),
          TextStats.tokens(col("text")).as("l"))
        .select(col("doc_id"), explode(array(
          col("lang"),
          TextStats.langIdFromTokens(col("l")),
          TextStats.langIdFromTokens(slice(col("l"), 1, 16)))).as("cat"))
      Inference.fleissKappa(assign, col("doc_id"), col("cat"), nRaters = 3)
        .orderBy("n_items")
    }),


    // paired shift test: Wilcoxon signed-rank on per-customer order
    // cents, 1994 vs 1995 — "did the SAME customers spend differently?"
    // where q_mann_whitney compares independent arms. Half-unit ranks
    // keep W+/W− exact longs; one sqrt tower for the tie-corrected z
    // (Inference.wilcoxonSignedRank scaladoc).
    "q_wilcoxon_signed" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
      def yr(y: Int) = ord.filter(year(col("o_orderdate")) === y)
        .groupBy("o_custkey")
        .agg(sum(floor(col("o_totalprice") * 100)).cast("long").as(s"c$y"))
      Inference.wilcoxonSignedRank(
        yr(1994).join(yr(1995), "o_custkey"), col("c1994"), col("c1995"))
        .orderBy("n")
    }),


    // robust co-movement: Kendall's τ-b between the daily click and
    // purchase count series (the q_xcorr_lag grid) — rank-based, so
    // one outlier day can't fabricate correlation; exact concordance
    // and tie counts over the grid pair space, one sqrt
    // (Inference.kendallTauB scaladoc).
    "q_kendall_tau" -> ((s, dir) => {
      val daily = EventsStream.readEvents(s, s"$dir/events.parquet")
        .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
        .agg(
          sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("x"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
      Inference.kendallTauB(daily, col("day"), col("x"), col("y"))
        .orderBy("n_pairs")
    }),


    // retrieval eval rollup: MAP@3 / MRR@3 / hit-rate@3 of the
    // bucketed ANN against same-label relevance (the q_ndcg run,
    // rolled up) — per-query AP and RR cleared to exact 36ths/6ths
    // (rank ≤ 3, n_rel ≤ 3 ⇒ 36·AP and 6·RR are integers), so the
    // global sums are exact longs and exactly three divisions exist.
    // Queries with an empty retrieval set are absent from topk and
    // excluded from Q (documented convention, same as q_ndcg).
    "q_map_mrr" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val lbl = emb.select(col("vec_id"), col("label"))
      val topk = Similarity.bucketedTopK(spread(emb),
        emb.filter(col("vec_id") < 8), k = 3, planes = annPlanes)
      val rel = topk
        .join(lbl.select(col("vec_id").as("query_id"), col("label").as("qlab")),
          "query_id")
        .join(lbl.select(col("vec_id").as("neighbor_id"), col("label").as("nlab")),
          "neighbor_id")
        .withColumn("rel", (col("qlab") === col("nlab")).cast("long"))
      val wq = Window.partitionBy("query_id").orderBy("rank")
      val perq = rel
        .withColumn("cum", sum("rel").over(wq))
        .groupBy("query_id")
        .agg(sum("rel").as("n_rel"),
          sum(col("rel") * col("cum") *
            when(col("rank") === 1, 6L).when(col("rank") === 2, 3L)
              .otherwise(2L)).as("ap18"),
          min(when(col("rel") === 1, col("rank"))).as("first_rel"))
        .select(col("query_id"),
          when(col("n_rel") > 0, expr("ap18 * 6 DIV n_rel")).otherwise(0L)
            .as("ap36"),
          coalesce(expr("6 DIV first_rel"), lit(0L)).as("rr6"),
          col("first_rel"))
      perq.agg(count(lit(1)).as("n_queries"),
          sum("ap36").as("sum_ap36"), sum("rr6").as("sum_rr6"),
          count(col("first_rel")).as("n_hit"))
        .select(col("n_queries"), col("sum_ap36"), col("sum_rr6"), col("n_hit"),
          round(col("sum_ap36").cast("double") /
            (col("n_queries") * 36).cast("double"), 6).as("map3"),
          round(col("sum_rr6").cast("double") /
            (col("n_queries") * 6).cast("double"), 6).as("mrr3"),
          round(col("n_hit").cast("double") / col("n_queries").cast("double"), 6)
            .as("hit_rate"))
    }),


    // eval-set carving: exactly 5 orders per order-priority stratum,
    // chosen by md5 of the order key — deterministic reservoir-free
    // per-class sampling (ScaleOps.stratifiedK scaladoc).
    "q_stratified_k" -> ((s, dir) => {
      ScaleOps.stratifiedK(t(s, dir, "orders"), Seq("o_orderpriority"),
          col("o_orderkey"), k = 5)
        .select(col("o_orderpriority"), col("sample_key").as("o_orderkey"),
          col("rn"))
        .orderBy("o_orderpriority", "rn")
    }),


    // model-eval: per-segment ROC AUC via the tie-aware rank-sum
    // identity — u2 = 2·Mann-Whitney-U stays an exact long
    // (Inference.rocAuc scaladoc); scores quantized to cents so the
    // cumulative window runs over the bounded distinct-score grid, not
    // rows. Label is a deterministic pseudo-class (user_id % 3 = 0) —
    // the eval plumbing is the deliverable, near-0.5 AUC expected.
    "q_roc_auc" -> ((s, dir) => {
      val ev = EventsStream.readEvents(s, s"$dir/events.parquet")
        .select(col("event_type"),
          round(col("value") * 100).cast("long").as("cents"),
          (col("user_id") % 3 === 0).as("y"))
      Inference.rocAuc(ev, Seq("event_type"), col("cents"), col("y"))
        .orderBy("event_type")
    }),


    // model-eval: precision/recall curve over descending score buckets
    // (50-unit bins of the cents score) — "predict positive when
    // score ≥ b" swept across the grid, tp/fp as exact cumulative
    // longs, one division per point (Inference.prCurve scaladoc).
    "q_pr_curve" -> ((s, dir) => {
      val ev = EventsStream.readEvents(s, s"$dir/events.parquet")
        .select(col("event_type"),
          // FLOOR division (pmod-Euclidean, exact in longs): Spark DIV
          // truncates toward zero while the DuckDB oracle's // floors,
          // and nothing pins value ≥ 0 — this form agrees with the
          // oracle for any sign (round-8 advice)
          expr("""(CAST(round(value * 100) AS BIGINT)
                 | - pmod(CAST(round(value * 100) AS BIGINT), 5000))
                 | DIV 5000""".stripMargin.replace("\n", "")).as("b"),
          (col("user_id") % 3 === 0).as("y"))
      Inference.prCurve(ev, Seq("event_type"), col("b"), col("y"))
        .orderBy("event_type", "bucket")
    }),


    // multiple testing: Benjamini–Hochberg FDR over 25 per-brand sign
    // tests (is the brand's share of even-cent prices ≠ 1/2). The z
    // statistic clears from exact integer counts; the two-sided
    // p-value uses the LOGISTIC approximation of the normal CDF
    // (p = 2/(1+exp(1.702·|z|)) — a stated contract, identical closed
    // form in both engines), and the BH sweep (rank, reversed running
    // min of m·p/i, reject from the ROUNDED adjusted p) is
    // Inference.bhAdjust. The window is hypothesis-sized (25 rows) by
    // construction — never data-sized.
    "q_fdr_bh" -> ((s, dir) => {
      val hyp = t(s, dir, "part")
        .select(col("p_brand"),
          (round(col("p_retailprice") * 100).cast("long") % 2 === 0)
            .as("even"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"),
          sum(when(col("even"), 1L).otherwise(0L)).as("x"))
        .select(col("p_brand"),
          (lit(2.0) / (lit(1.0) + exp(lit(1.702) *
            abs((lit(2.0) * col("x") - col("n")) /
              sqrt(col("n").cast("double")))))).as("pval"))
      Inference.bhAdjust(hyp, Seq("p_brand"), col("pval"))
        .orderBy("rank")
    }),


    // sequential testing: SPRT on the up-day rate of each daily series
    // (H1: P(up) = 0.6 vs H0: 0.4). The log-likelihood ratio after t
    // steps is ln(1.5)·(2·ups − t), so the ENTIRE decision runs on the
    // exact integer k = 2·ups − t: cross when |k| ≥ 8 (= ⌈ln 19 ∕
    // ln 1.5⌉, the α=β=0.05 Wald boundary) — no float ever gates a
    // branch, and the one reported llr scales k by a shared literal.
    // Windows run over the bounded daily grid (aggregate-first).
    "q_sprt" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val wo = Window.partitionBy("event_type").orderBy("day")
      val steps = EventsStream.readEvents(s, s"$dir/events.parquet")
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(round(sum("value"), 2).as("day_total"))
        .select(col("event_type"),
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          round(col("day_total") * 100).cast("long").as("c"))
        .withColumn("prev", lag("c", 1).over(wo))
        .filter(col("prev").isNotNull)
        .withColumn("up", when(col("c") > col("prev"), 1L).otherwise(0L))
        .withColumn("t", row_number().over(wo).cast("long"))
        .withColumn("k", lit(2L) * sum("up").over(
          wo.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          - col("t"))
      steps.groupBy("event_type")
        .agg(count(lit(1)).as("n_steps"),
          min(when(abs(col("k")) >= 8L, struct(col("t"), col("k"))))
            .as("cross"),
          max_by(col("k"), col("t")).as("k_final"))
        .select(col("event_type"), col("n_steps"),
          col("cross.t").as("cross_t"), col("cross.k").as("k_cross"),
          when(col("cross.k").isNull, "continue")
            .when(col("cross.k") >= 8L, "accept_h1")
            .otherwise("accept_h0").as("decision"),
          round(col("k_final") * lit(0.4054651081081644), 6).as("llr_final"))
        .orderBy("event_type")
    }),


    // inter-rater agreement with MISSING ratings: Krippendorff's alpha
    // (nominal) over a (user-bucket × event-type) rating matrix —
    // each "rater" (event type) labels the units it observed with a
    // value-quartile category, units seen by ≥ 2 raters qualify, and
    // the coincidence mass clears to exact scaled longs
    // (Inference.krippendorffAlpha scaladoc: ×12 = lcm(1..4) keeps
    // every 1/(m_u−1) integral for up to 5 raters).
    "q_krippendorff" -> ((s, dir) => {
      val ratings = EventsStream.readEvents(s, s"$dir/events.parquet")
        .groupBy((col("user_id") % 500).as("unit"),
          col("event_type").as("rater"))
        .agg(min(round(col("value") * 100).cast("long")).as("mc"))
        .select(col("unit"), col("rater"),
          // pmod-Euclidean floor div, matching the oracle's flooring
          // // for any sign of mc (round-8 advice; value > 0 today but
          // the query shouldn't depend on that)
          least(expr("(mc - pmod(mc, 10000)) DIV 10000"), lit(3L)).as("cat"))
      Inference.krippendorffAlpha(ratings, col("unit"), col("rater"),
          col("cat"))
        .orderBy("n_units")
    }),


    // differential privacy: Laplace-mechanism counts per
    // (event_type, day) with DETERMINISTIC key-seeded noise — the
    // inverse-CDF plumbing, sensitivity-1 scale b = 1/ε and
    // post-processing clamp are the deliverable; a production release
    // swaps the md5-uniform for cryptographic randomness
    // (Privacy.dpCounts scaladoc states the contract).
    "q_dp_counts" -> ((s, dir) => {
      val ev = EventsStream.readEvents(s, s"$dir/events.parquet")
        .select(col("event_type"),
          date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
      Privacy.dpCounts(ev, Seq("event_type", "day"), epsilon = 1.0)
        .orderBy("event_type", "day")
    }),


    // data forensics: Benford first-digit conformance of the price
    // column — exact digit counts over one map-side-combined pass,
    // expected proportions as plan literals, χ² terms nano-quantized
    // so the statistic is an exact-long rollup (the q_chi2_test rule).
    "q_benford" -> ((s, dir) => {
      Inference.benford(t(s, dir, "lineitem"), floor(col("l_extendedprice")))
    }),


    // ML-ops: model calibration audit (reliability diagram) of the
    // hashed linear quality classifier against the lang=='en' label —
    // per predicted-score decile: exact counts, observed positive
    // rate, and mean prediction from micro-quantized exact sums. Bins
    // cut on the ROUND-6 score (the proven hash-stable boundary), so
    // binning is engine-independent.
    "q_calibration" -> ((s, dir) => {
      val docs = spread(t(s, dir, "documents"))
      val scored = TextStats.classifierScore(
          docs, TextStats.hashedModel(s, 1024), dim = 1024)
        .select(col("doc_id"), round(col("score"), 6).as("r"))
      val lab = t(s, dir, "documents")
        .select(col("doc_id"), (col("lang") === "en").cast("int").as("pos"))
      scored.join(lab, "doc_id")
        .select(least(floor(col("r") * 10), lit(9L)).cast("int").as("bin"),
          col("pos"), floor(col("r") * lit(1e6) + lit(0.5)).cast("long").as("sq"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"), sum("pos").cast("long").as("n_pos"),
          sum("sq").as("ssq"))
        .select(col("bin"), col("n"), col("n_pos"),
          round(col("ssq").cast("double") / col("n").cast("double") / lit(1e6), 6)
            .as("mean_pred"),
          round(col("n_pos").cast("double") / col("n").cast("double"), 6)
            .as("obs_rate"))
        .orderBy("bin")
    }),


    // privacy: deterministic keyed pseudonymization — same user maps to
    // the same opaque token everywhere (referential integrity survives;
    // the raw id does not). Heavy-user profile over tokens proves
    // group-bys still work on the pseudonymized stream.
    "q_pseudonymize" -> ((s, dir) => {
      EventsStream.readEvents(s, s"$dir/events.parquet")
        .select(Privacy.pseudonymize(col("user_id"), "pepper").as("user_token"),
          col("event_type"), col("value"))
        .groupBy("user_token")
        .agg(count(lit(1)).as("n_events"),
          countDistinct("event_type").as("n_types"),
          sum(floor(col("value") * 100)).cast("long").as("value_cents"))
        .orderBy(desc("n_events"), asc("user_token"))
        .limit(25)
    }),


    // privacy audit: k-anonymity (k=5) of the (event_type, day-hour)
    // quasi-identifier — per type: how many quasi-id groups exist, how
    // many are small enough to re-identify, and how many rows sit in
    // them. Exact counts end to end.
    "q_k_anonymity" -> ((s, dir) => {
      Privacy.kAnonymityGroups(
          EventsStream.readEvents(s, s"$dir/events.parquet"),
          Seq(col("event_type"), date_format(col("ts"), "yyyy-MM-dd HH").as("qh")),
          k = 5)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_groups"),
          count(when(col("violates_k"), 1)).as("n_violating"),
          sum(when(col("violates_k"), col("n")).otherwise(0L)).cast("long")
            .as("rows_at_risk"),
          min("n").as("min_group"))
        .orderBy("event_type")
    }),


    // uncertainty quantification: jackknife SE of the per-flag monthly
    // mean revenue — leave-one-out reduced to exact integer algebra
    // (Q = Σ(S − n·xᵢ)² over decimal(38,0)), one IEEE tower at the end.
    "q_jackknife" -> ((s, dir) => {
      val grid = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"),
          date_format(col("l_shipdate"), "yyyy-MM").as("ym"))
        .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .cast("long").as("rev"))
      Inference.jackknifeSE(grid, Seq("l_returnflag"), col("rev"))
        .orderBy("l_returnflag")
    }),


    // privacy: l-diversity audit (l=3) — groups that pass k-anonymity
    // can still leak the sensitive attribute if everyone in them shares
    // it. Sensitive stand-in: a demographic code derived from user_id.
    "q_l_diversity" -> ((s, dir) => {
      Privacy.lDiversityGroups(
          EventsStream.readEvents(s, s"$dir/events.parquet"),
          Seq(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("qd")),
          sensitive = col("user_id") % 10, l = 3)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_groups"),
          count(when(col("violates_l"), 1)).as("n_violating"),
          sum(when(col("violates_l"), col("n")).otherwise(0L)).cast("long")
            .as("rows_at_risk"),
          min("l").as("min_l"))
        .orderBy("event_type")
    }),


    // 2-D skyline: parts undominated on (total quantity sold, best unit
    // price in cents) — anti-correlated axes, so the frontier is a real
    // curve. Grid-first: the ordered frontier pass runs over the part
    // grid, never lineitem rows.
    "q_pareto_frontier" -> ((s, dir) => {
      val grid = t(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(sum("l_quantity").cast("long").as("tot_qty"),
          max(floor(col("l_extendedprice") / col("l_quantity") * 100))
            .cast("long").as("unit_cents"))
      ScaleOps.paretoFrontier(grid, "l_partkey", "tot_qty", "unit_cents")
        .orderBy(desc("tot_qty"))
    }),


    // uncertainty at scale: deterministic Poisson bootstrap — hash-
    // drawn Poisson(1) multiplicities per (row, replicate) mean the
    // resample is a pure function of the data (retry/AQE/engine-
    // stable); CI = explicit ranks 2 and 49 of the 50 replicate means.
    "q_bootstrap_ci" -> ((s, dir) => {
      Inference.poissonBootstrapCI(t(s, dir, "lineitem"),
          Seq("l_returnflag"),
          rowKey = concat(col("l_orderkey"), lit("-"), col("l_linenumber")),
          x = floor(col("l_extendedprice") * 100), reps = 50)
        .orderBy("l_returnflag")
    }),


    // feature preprocessing: quantile normalization — map each value
    // to its empirical quantile rank/(n+1) within the group, then
    // summarize per subgroup. Rank sums stay exact longs; one division.
    // Ranks come from the DISTINCT-VALUE cumulative counts (min rank
    // of value v = cum(<v) + 1 — identical to rank() for ties), not a
    // full-row window: with a 3-value group key the row window is
    // two-reducer-funnel territory (the q_spearman lesson). Round 14
    // (guide §2.4): the rank is attached IN PLACE by a RANGE-frame
    // window over the (flag, status, cents) grid — cum(<v) =
    // sum(c) over the strictly-below frame, which sums every status's
    // multiplicity at smaller cents, exactly the old (flag, cents)
    // axis cumsum. The previous axis-aggregate + join-back spelling
    // computed the scan+grid chain TWICE (the join's two legs derive
    // differently, so no ReusedExchange — 2 full scans in the plan)
    // and broadcast a ~594k-row rank relation (cents is near-unique:
    // grid 596,869 / axis 593,702 rows at sf0.1 — a driver-memory
    // cliff at scale, guide §3.1). Now: one scan, no join, no
    // broadcast; the only group-funneled sort is the same 3-partition
    // grid sort the axis form already paid. 4.56 s → measured below.
    "q_quantile_normalize" -> ((s, dir) => {
      val li0 = t(s, dir, "lineitem").select(col("l_returnflag"),
        col("l_linestatus"), floor(col("l_extendedprice") * 100).as("cents"))
      // keyed fan-out: the exchange IS the grid's distribution (spreadBy)
      val li = spreadBy(li0, col("l_returnflag"), col("l_linestatus"),
        col("cents"))
      // the only pass over raw rows: (flag, status, cents) multiplicities
      val grid = li.groupBy("l_returnflag", "l_linestatus", "cents")
        .agg(count(lit(1)).as("c"))
      val wLt = Window.partitionBy("l_returnflag").orderBy("cents")
        .rangeBetween(Window.unboundedPreceding, -1)
      grid
        .withColumn("rk", coalesce(sum("c").over(wLt), lit(0L)) + lit(1L))
        .withColumn("ng", sum("c").over(Window.partitionBy("l_returnflag")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum("c").as("n_rows"),
          sum(col("c") * col("rk")).as("sum_rank"), max("ng").as("ng"))
        .select(col("l_returnflag"), col("l_linestatus"), col("n_rows"),
          round(col("sum_rank").cast("double") /
            (col("n_rows") * (col("ng") + 1)).cast("double"), 6)
            .as("mean_qnorm"))
        .orderBy("l_returnflag", "l_linestatus")
    }),


    // annotation QA: Cohen's kappa of the heuristic language-id vs the
    // gold lang label — chance-corrected agreement in cleared-
    // denominator integer form; exactly one float division.
    "q_cohen_kappa" -> ((s, dir) => {
      Inference.cohenKappa(
        spread(t(s, dir, "documents"))
          .select(col("lang"), TextStats.langId(col("text")).as("pred")),
        "lang", "pred")
    }),


    // retrieval eval: nDCG@3 + reciprocal rank of the bucketed ANN
    // against same-label relevance. Rank-2/3 discounts and the ideal
    // DCG are CASE literals (no float accumulation to diverge); the
    // only sums are over {0, .5, .63..., 1} rounded at 1e-6.
    "q_ndcg" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val lbl = emb.select(col("vec_id"), col("label"))
      val topk = Similarity.bucketedTopK(spread(emb),
        emb.filter(col("vec_id") < 8), k = 3, planes = annPlanes)
      val rel = topk
        .join(lbl.select(col("vec_id").as("query_id"), col("label").as("qlab")),
          "query_id")
        .join(lbl.select(col("vec_id").as("neighbor_id"), col("label").as("nlab")),
          "neighbor_id")
        .withColumn("rel", (col("qlab") === col("nlab")).cast("int"))
      val disc = when(col("rank") === 1, lit(1.0))
        .when(col("rank") === 2, lit(0.6309297535714574))
        .otherwise(lit(0.5))
      rel.groupBy("query_id")
        .agg(sum("rel").cast("long").as("n_rel"),
          sum(col("rel") * disc).as("dcg"),
          min(when(col("rel") === 1, col("rank"))).as("first_rel"))
        .select(col("query_id"), col("n_rel"), round(col("dcg"), 6).as("dcg"),
          round(col("dcg") / when(col("n_rel") === 1, lit(1.0))
            .when(col("n_rel") === 2, lit(1.6309297535714574))
            .when(col("n_rel") === 3, lit(2.1309297535714574))
            .otherwise(lit(1.0)), 6).as("ndcg"),
          coalesce(round(lit(1.0) / col("first_rel"), 6), lit(0.0)).as("rr"))
        .orderBy("query_id")
    }),


    // stats: Spearman rank correlation per returnflag between quantity
    // and price cents — the outlier-proof monotone-association screen.
    // Doubled-midrank machinery keeps every power sum an exact integer
    // (see Inference.spearman); rows collapse to the (group, x, y) grid
    // first and the ranks come from distinct-value cumulative counts,
    // so NO full-row sort ever runs inside the 3-value group partition
    // (the low-cardinality window funnel: 15.3 s → 4.4 s at sf1).
    // Round 14: the fan-out keys on the PRE-CAST grid columns
    // (spreadBy — the co-purchase lesson), so the one row-sized
    // exchange IS the grid aggregation's distribution; the RR spread
    // was pure overhead ahead of it (probe: grid 1.33 → 0.95 s).
    "q_spearman" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(col("l_returnflag"),
        col("l_quantity").cast("long").as("xv"),
        floor(col("l_extendedprice") * 100).cast("long").as("yv"))
      Inference.spearman(
        spreadBy(li, col("l_returnflag"), col("xv"), col("yv")),
        Seq("l_returnflag"), col("xv"), col("yv"))
        .orderBy("l_returnflag")
    }),


    // stats: pairwise Pearson matrix over the four quantized lineitem
    // measures in ONE map-side-combined pass (shuffle = one row of
    // power sums; never k² scans, never a row-pair join) — the
    // feature-redundancy screen before training-data export.
    "q_corr_matrix" -> ((s, dir) => {
      Inference.corrMatrix(spread(t(s, dir, "lineitem")), Seq(
        "qty" -> col("l_quantity"),
        "price_c" -> floor(col("l_extendedprice") * 100),
        "disc_c" -> floor(col("l_discount") * 100),
        "tax_c" -> floor(col("l_tax") * 100)))
        .orderBy("col_a", "col_b")
    }),


    // features: leave-one-out target encoding of `source` by n_chars —
    // the leakage-safe mean encoding (each row's feature excludes its
    // own target). One category aggregate + broadcast join-back; the
    // encode pass itself is narrow.
    "q_target_encode" -> ((s, dir) => {
      Inference.targetEncodeLOO(spread(t(s, dir, "documents")), "source",
        col("doc_id"), col("n_chars"))
        .orderBy("id")
    }),


    // per-group median imputation — the ML-prep null-fill: nulls are
    // planted deterministically (so the oracle reproduces them), the
    // fill value is the group's exact disc median (Quantiles machinery
    // — shuffle is distinct values, never a per-group sort), and the
    // gate pins the post-imputation integer sum.
    "q_impute" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(col("l_returnflag").as("g"),
        when(pmod(col("l_orderkey") * 8 + col("l_linenumber"), lit(13)) === 0, lit(null))
          .otherwise(col("l_quantity")).as("qty"))
        .persist() // median pass + imputation pass
      val med = Quantiles.exactQuantilesDisc(li.filter(col("qty").isNotNull),
        "qty", Seq("g"), Seq(0.5), Seq("med"))
      li.join(broadcast(med), Seq("g"))
        .groupBy("g")
        .agg(count(lit(1)).as("n_rows"),
          sum(col("qty").isNull.cast("long")).as("n_imputed"),
          max(col("med")).as("median_used"),
          sum(floor(coalesce(col("qty"), col("med")))).cast("long").as("sum_qty_filled"))
        .orderBy("g")
    }),


    // ABC (Pareto) revenue analysis per supplier nation: rank parts by
    // exact cents, classify A/B/C at the 80/95% cumulative boundaries —
    // decided by INTEGER cross-multiplication (cum·5 ≤ total·4), so the
    // class never flips on float rounding. The cumulative window
    // partitions per nation over the part-level aggregate (|parts|
    // rows), not raw lineitem.
    "q_abc_analysis" -> ((s, dir) => {
      val rev = t(s, dir, "lineitem")
        .join(t(s, dir, "supplier").select("s_suppkey", "s_nationkey"),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_nationkey"), col("l_partkey").as("p"))
        .agg(sum(floor(col("l_extendedprice") * 100)).cast("long").as("cents"))
        .join(broadcast(t(s, dir, "nation").select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
      val wCum = Window.partitionBy("n_name").orderBy(desc("cents"), asc("p"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wTot = Window.partitionBy("n_name")
      rev.withColumn("cum", sum("cents").over(wCum))
        .withColumn("total", sum("cents").over(wTot))
        .withColumn("abc",
          when(col("cum") * 5 <= col("total") * 4, lit("A"))
            .when(col("cum") * 20 <= col("total") * 19, lit("B"))
            .otherwise(lit("C")))
        .groupBy("n_name", "abc")
        .agg(count(lit(1)).as("n_parts"), sum("cents").as("cents"))
        .orderBy("n_name", "abc")
    }),

    // nucleus (top-p) cutoff: per event type, the SMALLEST prefix of
    // users by descending spend that covers ≥ 90% of total value — the
    // top-p sampling shape applied to a contribution distribution
    // (who do you keep to retain 90% of the signal?). Cents exact;
    // membership is decided by 10·cum_before < 9·total in LONGS so no
    // float ulp can flip the boundary user; one ranked window over
    // per-user aggregates (users-per-type grid, never raw events).
    "q_top_p_filter" -> ((s, dir) => {
      val per = EventsStream.readEvents(s, s"$dir/events.parquet")
        .groupBy(col("event_type"), col("user_id"))
        .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      val w = Window.partitionBy("event_type")
        .orderBy(col("cents").desc, col("user_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val wAll = Window.partitionBy("event_type")
      per
        .withColumn("cum_prev", coalesce(sum("cents").over(w), lit(0L)))
        .withColumn("total", sum("cents").over(wAll))
        .filter(col("cum_prev") * 10 < col("total") * 9)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_kept"), sum("cents").as("kept_cents"),
          max("total").as("total_cents"))
        .select(col("event_type"), col("n_kept"), col("kept_cents"),
          col("total_cents"),
          round(col("kept_cents").cast("double") /
            col("total_cents").cast("double"), 6).as("kept_share"))
        .orderBy("event_type")
    }),

    // group-aware k-fold assignment: every user lands in exactly one of
    // 5 folds by md5 of the key — the deterministic, state-free split
    // that guarantees zero group leakage across folds by construction
    // (the same property q_group_split gates for train/test). Emits the
    // per-fold census a training pipeline checks before trusting CV.
    "q_group_kfold" -> ((s, dir) => {
      EventsStream.readEvents(s, s"$dir/events.parquet")
        .withColumn("fold",
          conv(substring(md5(col("user_id").cast("string")), 1, 8), 16, 10)
            .cast("long") % 5)
        .groupBy("fold")
        .agg(countDistinct("user_id").as("n_users"),
          count(lit(1)).as("n_events"),
          sum(round(col("value") * 100).cast("long")).as("cents"))
        .orderBy("fold")
    }),

    // mergeable fixed-bin quantile sketch vs the exact answer: prices
    // hash into 8192-cent-wide bins (the sketch IS the groupBy — its
    // merge is map-side combine, the property that makes it a sketch),
    // the p-quantile estimate is the upper edge of the first bin whose
    // cumulative count reaches ⌈p·n⌉, and the row carries the EXACT
    // discrete quantile next to it with the absolute error — the
    // accuracy audit a 100-TB deployment runs before trusting the
    // sketch. Every step exact integers.
    "q_quantile_sketch" -> ((s, dir) => {
      // keyed fan-out on the exact leg's near-unique grid keys (the
      // double-cast matches the operator's internal grouping expression
      // so the exchange doubles as its distribution — q_weighted_median
      // note); the sketch leg's partial aggregate collapses to ~39 bins
      // map-side on the same layout
      val cents = spreadBy(t(s, dir, "lineitem")
          .select(col("l_returnflag"),
            floor(col("l_extendedprice") * 100).cast("long").as("c")),
        col("l_returnflag"), col("c").cast("double"))
      val bins = cents
        .groupBy(col("l_returnflag"), expr("c DIV 8192").as("bin"))
        .agg(count(lit(1)).as("bn"))
      val wCum = Window.partitionBy("l_returnflag").orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
      val wAll = Window.partitionBy("l_returnflag")
      val est = bins
        .withColumn("cum", sum("bn").over(wCum))
        .withColumn("n", sum("bn").over(wAll))
        .groupBy("l_returnflag")
        .agg(max("n").as("n"),
          min(when(col("cum") * 2 >= col("n"), (col("bin") + 1) * 8192))
            .as("p50_est"),
          min(when(col("cum") * 20 >= col("n") * 19, (col("bin") + 1) * 8192))
            .as("p95_est"))
      val exact = Quantiles.exactQuantilesDisc(cents, "c",
        Seq("l_returnflag"), Seq(0.5, 0.95), Seq("p50_exact", "p95_exact"))
      est.join(exact, "l_returnflag")
        .select(col("l_returnflag"), col("n"),
          col("p50_est"), col("p50_exact").cast("long").as("p50_exact"),
          (col("p50_est") - col("p50_exact").cast("long")).as("p50_err"),
          col("p95_est"), col("p95_exact").cast("long").as("p95_exact"),
          (col("p95_est") - col("p95_exact").cast("long")).as("p95_err"))
        .orderBy("l_returnflag")
    }),

    // robust outlier flagging by median/MAD: days whose daily total
    // deviates from the per-type median by more than 3·1.4826·MAD —
    // the estimator a single bad day cannot move (unlike the q_rolling
    // mean/σ band). Median and MAD are exact discrete picks; the flag
    // compares 10000·|c−med| > 44478·MAD in longs, so no float touches
    // membership.
    "q_mad_outliers" -> ((s, dir) => {
      val daily = EventsStream.readEvents(s, s"$dir/events.parquet")
        .groupBy(col("event_type"),
          date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
        .agg(sum(round(col("value") * 100).cast("long")).as("c"))
      val med = Quantiles.exactQuantilesDisc(daily, "c",
        Seq("event_type"), Seq(0.5), Seq("med"))
      val dev = daily.join(med, "event_type")
        .withColumn("ad", abs(col("c") - col("med").cast("long")))
      val mad = Quantiles.exactQuantilesDisc(dev, "ad",
        Seq("event_type"), Seq(0.5), Seq("mad"))
      dev.join(mad, "event_type")
        .withColumn("madl", col("mad").cast("long"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
          max(col("med").cast("long")).as("med_cents"),
          max("madl").as("mad_cents"),
          sum((col("ad") * 10000 > col("madl") * 44478).cast("long"))
            .as("n_outliers"))
        .orderBy("event_type")
    }),

    // sample-ratio-mismatch guard: users hash into two arms; a healthy
    // 50/50 split keeps the one-degree chi-square (n_a−n_b)²/(n_a+n_b)
    // under 3.84 — the first dashboard every experiment platform
    // watches, because a broken randomizer invalidates everything
    // downstream. Exact integer counts; the flag compares
    // 100·(n_a−n_b)² > 384·n in longs.
    "q_srm_check" -> ((s, dir) => {
      val arms = EventsStream.readEvents(s, s"$dir/events.parquet")
        .select(col("event_type"), col("user_id"),
          (conv(substring(md5(col("user_id").cast("string")), 1, 8), 16, 10)
            .cast("long") % 2).as("arm"))
        .groupBy("event_type", "user_id")
        .agg(max("arm").as("arm"))
      arms.groupBy("event_type")
        .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"))
        .select(col("event_type"), col("n_a"), col("n_b"),
          round((col("n_a") - col("n_b")).cast("double") *
            (col("n_a") - col("n_b")).cast("double") /
            (col("n_a") + col("n_b")).cast("double"), 6).as("chi2"),
          ((col("n_a") - col("n_b")) * (col("n_a") - col("n_b")) * 100 >
            (col("n_a") + col("n_b")) * 384).as("srm_flag"))
        .orderBy("event_type")
    }),

    // inverse-frequency class weights over the embedding labels: w_c =
    // N / (k·n_c), the standard imbalance correction a classifier head
    // consumes — exact counts, one division per class, weights rounded
    // at 6 (the only float). One map-side-combined aggregate.
    "q_class_weights" -> ((s, dir) => {
      val counts = t(s, dir, "embeddings")
        .groupBy("label").agg(count(lit(1)).as("n"))
      val tot = counts.agg(sum("n").as("total"),
        count(lit(1)).as("k"))
      counts.crossJoin(broadcast(tot)) // 1-row scalar totals
        .select(col("label"), col("n"), col("total"),
          round(col("total").cast("double") /
            (col("k") * col("n")).cast("double"), 6).as("weight"))
        .orderBy("label")
    }),
  )

  val oracles: Seq[(String, String)] = Seq(

      // unit grid then double v² — mirrors Inference.hhi op for op
      "q_hhi" ->
        """WITH pu AS (
          |  SELECT o_orderpriority AS g, o_custkey AS u,
          |         CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS v
          |  FROM orders GROUP BY 1, 2),
          |a AS (
          |  SELECT g, CAST(count(*) AS BIGINT) AS n,
          |         CAST(sum(v) AS BIGINT) AS total,
          |         sum(CAST(v AS DOUBLE) * CAST(v AS DOUBLE)) AS ss
          |  FROM pu GROUP BY 1)
          |SELECT g AS o_orderpriority, n, total,
          |       CASE WHEN total > 0
          |            THEN round(ss / (CAST(total AS DOUBLE)
          |                             * CAST(total AS DOUBLE)), 6)
          |       END AS hhi
          |FROM a ORDER BY o_orderpriority""".stripMargin,


      // (type, stratum) exact cell grid; common-support trim and the
      // weighted float sum mirror Inference.stratifiedAte op for op
      "q_strat_ate" ->
        """WITH e AS (
          |  SELECT event_type,
          |         ((user_id // 7) % 10 + 10) % 10 AS st,
          |         CAST(user_id % 2 AS INTEGER) AS tr,
          |         CAST(round(value * 100) AS BIGINT) AS y
          |  FROM events),
          |cells AS (
          |  SELECT event_type, st,
          |         CAST(sum(CASE WHEN tr = 1 THEN 1 ELSE 0 END) AS BIGINT)
          |           AS n1,
          |         CAST(sum(CASE WHEN tr = 1 THEN y ELSE 0 END) AS BIGINT)
          |           AS s1,
          |         CAST(sum(CASE WHEN tr = 0 THEN 1 ELSE 0 END) AS BIGINT)
          |           AS n0,
          |         CAST(sum(CASE WHEN tr = 0 THEN y ELSE 0 END) AS BIGINT)
          |           AS s0
          |  FROM e GROUP BY 1, 2),
          |g AS (
          |  SELECT event_type,
          |         CAST(sum(n1 + n0) AS BIGINT) AS n,
          |         CAST(sum(n1) AS BIGINT) AS nt,
          |         CAST(sum(n0) AS BIGINT) AS nc,
          |         CAST(sum(s1) AS BIGINT) AS st1,
          |         CAST(sum(s0) AS BIGINT) AS st0,
          |         CAST(sum(CASE WHEN n1 >= 1 AND n0 >= 1 THEN n1 + n0
          |                       ELSE 0 END) AS BIGINT) AS nsup,
          |         sum(CASE WHEN n1 >= 1 AND n0 >= 1
          |                  THEN CAST(n1 + n0 AS DOUBLE)
          |                       * (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
          |                          - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
          |                  ELSE 0.0 END) AS wsum
          |  FROM cells GROUP BY 1)
          |SELECT event_type, n, nt, nc,
          |       CASE WHEN nt >= 1 AND nc >= 1
          |            THEN round(CAST(st1 AS DOUBLE) / CAST(nt AS DOUBLE)
          |                       - CAST(st0 AS DOUBLE) / CAST(nc AS DOUBLE), 6)
          |       END AS diff_naive,
          |       CASE WHEN nsup > 0
          |            THEN round(wsum / CAST(nsup AS DOUBLE), 6)
          |       END AS ate_strat
          |FROM g ORDER BY event_type""".stripMargin,


      // three rater derivations (the q_fleiss_kappa vote columns at
      // full/16/8 tokens) paired per doc; Q a single division of
      // exact longs — mirrors Inference.cochranQ
      "q_cochran_q" ->
        s"""WITH toks AS (SELECT doc_id, lang, $sqlTokens AS l FROM documents),
           |v1 AS (SELECT doc_id, lang, $sqlLangVoteCols FROM toks),
           |p1 AS (SELECT doc_id,
           |              CASE WHEN $sqlLangCase = lang THEN 1 ELSE 0 END AS x1
           |       FROM v1),
           |t16 AS (SELECT doc_id, lang, l[1:16] AS l FROM toks),
           |v2 AS (SELECT doc_id, lang, $sqlLangVoteCols FROM t16),
           |p2 AS (SELECT doc_id,
           |              CASE WHEN $sqlLangCase = lang THEN 1 ELSE 0 END AS x2
           |       FROM v2),
           |t8 AS (SELECT doc_id, lang, l[1:8] AS l FROM toks),
           |v3 AS (SELECT doc_id, lang, $sqlLangVoteCols FROM t8),
           |p3 AS (SELECT doc_id,
           |              CASE WHEN $sqlLangCase = lang THEN 1 ELSE 0 END AS x3
           |       FROM v3),
           |ind AS (
           |  SELECT x1, x2, x3, x1 + x2 + x3 AS ll
           |  FROM p1 JOIN p2 USING (doc_id) JOIN p3 USING (doc_id)),
           |g AS (
           |  SELECT CAST(count(*) AS BIGINT) AS n,
           |         CAST(sum(x1) AS BIGINT) AS g1,
           |         CAST(sum(x2) AS BIGINT) AS g2,
           |         CAST(sum(x3) AS BIGINT) AS g3,
           |         CAST(sum(ll) AS BIGINT) AS sl,
           |         CAST(sum(ll * ll) AS BIGINT) AS sl2
           |  FROM ind)
           |SELECT n, g1, g2, g3,
           |       CASE WHEN 3 * sl - sl2 > 0
           |            THEN round(CAST(2 * (3 * (g1 * g1 + g2 * g2 + g3 * g3)
           |                 - (g1 + g2 + g3) * (g1 + g2 + g3)) AS DOUBLE)
           |                 / CAST(3 * sl - sl2 AS DOUBLE), 6) END AS q_stat
           |FROM g ORDER BY n""".stripMargin,


      // contingency grid + grid margins; per-cell χ² tower mirrors
      // Inference.cramersV op for op — including the round-13
      // empty-cell correction (N² − Σ_observed ri·cj)/N, exact-long
      // numerator, so structural zeros contribute their expected count
      "q_cramers_v" ->
        """WITH cells AS (
          |  SELECT l_returnflag AS a, l_linestatus AS b,
          |         CAST(count(*) AS BIGINT) AS nij
          |  FROM lineitem GROUP BY 1, 2),
          |m AS (
          |  SELECT a, b, nij,
          |         CAST(sum(nij) OVER (PARTITION BY a) AS BIGINT) AS ri,
          |         CAST(sum(nij) OVER (PARTITION BY b) AS BIGINT) AS cj,
          |         CAST(sum(nij) OVER () AS BIGINT) AS n
          |  FROM cells),
          |t AS (
          |  SELECT max(n) AS n, CAST(count(DISTINCT a) AS BIGINT) AS r,
          |         CAST(count(DISTINCT b) AS BIGINT) AS c,
          |         sum((CAST(nij AS DOUBLE)
          |              - CAST(ri AS DOUBLE) * CAST(cj AS DOUBLE)
          |                / CAST(n AS DOUBLE))
          |             * (CAST(nij AS DOUBLE)
          |                - CAST(ri AS DOUBLE) * CAST(cj AS DOUBLE)
          |                  / CAST(n AS DOUBLE))
          |             / (CAST(ri AS DOUBLE) * CAST(cj AS DOUBLE)
          |                / CAST(n AS DOUBLE))) AS chi2obs,
          |         CAST(sum(ri * cj) AS BIGINT) AS rcsum
          |  FROM m),
          |f AS (
          |  SELECT n, r, c,
          |         chi2obs + CAST(n * n - rcsum AS DOUBLE)
          |                   / CAST(n AS DOUBLE) AS chi2
          |  FROM t)
          |SELECT n, r, c, round(chi2, 6) AS chi2,
          |       CASE WHEN n > 0 AND CAST(least(r, c) AS DOUBLE) - 1.0 >= 1.0
          |            THEN round(sqrt(chi2 / (CAST(n AS DOUBLE)
          |                 * (CAST(least(r, c) AS DOUBLE) - 1.0))), 6)
          |       END AS cramers_v
          |FROM f ORDER BY n""".stripMargin,


      // one conditional pass to the four exact cells; OR at 6, CI
      // bounds through ln/exp at 4 — mirrors Inference.oddsRatio
      "q_odds_ratio" ->
        """WITH e AS (
          |  SELECT event_type,
          |         user_id % 2 = 1 AS x,
          |         CAST(round(value * 100) AS BIGINT) > 5000 AS y
          |  FROM events),
          |g AS (
          |  SELECT event_type,
          |         CAST(sum(CASE WHEN x AND y THEN 1 ELSE 0 END) AS BIGINT) AS a,
          |         CAST(sum(CASE WHEN x AND NOT y THEN 1 ELSE 0 END) AS BIGINT)
          |           AS b,
          |         CAST(sum(CASE WHEN NOT x AND y THEN 1 ELSE 0 END) AS BIGINT)
          |           AS c,
          |         CAST(sum(CASE WHEN NOT x AND NOT y THEN 1 ELSE 0 END)
          |              AS BIGINT) AS d
          |  FROM e GROUP BY 1),
          |h AS (
          |  SELECT event_type, a, b, c, d,
          |         CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
          |           / (CAST(b AS DOUBLE) * CAST(c AS DOUBLE)) AS orr,
          |         sqrt(1.0 / CAST(a AS DOUBLE) + 1.0 / CAST(b AS DOUBLE)
          |              + 1.0 / CAST(c AS DOUBLE) + 1.0 / CAST(d AS DOUBLE))
          |           AS se
          |  FROM g)
          |SELECT event_type, a, b, c, d,
          |       CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0
          |            THEN round(orr, 6) END AS odds_ratio,
          |       CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0
          |            THEN round(exp(ln(orr) - 1.96 * se), 4) END AS ci_lo,
          |       CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0
          |            THEN round(exp(ln(orr) + 1.96 * se), 4) END AS ci_hi
          |FROM h ORDER BY event_type""".stripMargin,


      // both raters re-derived per doc (the q_fleiss_kappa vote
      // columns), paired row-wise; exact discordant counts, one
      // division — mirrors Inference.mcnemar
      "q_mcnemar" ->
        s"""WITH toks AS (SELECT doc_id, lang, $sqlTokens AS l FROM documents),
           |v1 AS (
           |  SELECT doc_id, lang, $sqlLangVoteCols
           |  FROM toks),
           |p1 AS (SELECT doc_id, ($sqlLangCase = lang) AS c1 FROM v1),
           |t16 AS (SELECT doc_id, lang, l[1:16] AS l FROM toks),
           |v2 AS (
           |  SELECT doc_id, lang, $sqlLangVoteCols
           |  FROM t16),
           |p2 AS (SELECT doc_id, ($sqlLangCase = lang) AS c2 FROM v2),
           |pair AS (SELECT c1, c2 FROM p1 JOIN p2 USING (doc_id)),
           |g AS (
           |  SELECT CAST(count(*) AS BIGINT) AS n,
           |         CAST(sum(CASE WHEN c1 AND NOT c2 THEN 1 ELSE 0 END)
           |              AS BIGINT) AS b,
           |         CAST(sum(CASE WHEN NOT c1 AND c2 THEN 1 ELSE 0 END)
           |              AS BIGINT) AS c
           |  FROM pair)
           |SELECT n, b, c,
           |       CASE WHEN b + c > 0
           |            THEN round(CAST((b - c) * (b - c) AS DOUBLE)
           |                       / CAST(b + c AS DOUBLE), 6) END AS chi2
           |FROM g ORDER BY n""".stripMargin,


      // quantized-long logs of integer arguments only (ln(mean) =
      // ln(S) − ln(n)); the exact-long sum and T tower mirror
      // Inference.theilIndex op for op
      "q_theil_index" ->
        """WITH pu AS (
          |  SELECT o_orderpriority AS g, o_custkey AS u,
          |         CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS v
          |  FROM orders GROUP BY 1, 2),
          |p AS (SELECT g, v FROM pu WHERE v > 0),
          |a AS (
          |  SELECT g, CAST(count(*) AS BIGINT) AS n,
          |         CAST(sum(v) AS BIGINT) AS s,
          |         CAST(sum(v * CAST(round(ln(CAST(v AS DOUBLE)) * 1e5)
          |                           AS BIGINT)) AS BIGINT) AS xlnx
          |  FROM p GROUP BY 1)
          |SELECT g AS o_orderpriority, n, s AS total,
          |       CASE WHEN n >= 1 AND s > 0
          |            THEN round(CAST(xlnx - s *
          |                 (CAST(round(ln(CAST(s AS DOUBLE)) * 1e5) AS BIGINT)
          |                  - CAST(round(ln(CAST(n AS DOUBLE)) * 1e5)
          |                         AS BIGINT)) AS DOUBLE)
          |                 / (CAST(s AS DOUBLE) * 1e5), 6) END AS theil_t
          |FROM a ORDER BY o_orderpriority""".stripMargin,


      // exact (group, customer) totals, deterministic rank, exact
      // Σ i·x — the G tower mirrors Inference.giniCoefficient op for op
      "q_gini_coef" ->
        """WITH pu AS (
          |  SELECT o_orderpriority AS g, o_custkey AS u,
          |         CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS v
          |  FROM orders GROUP BY 1, 2),
          |r AS (
          |  SELECT g, v,
          |         CAST(row_number() OVER (PARTITION BY g ORDER BY v, u)
          |              AS BIGINT) AS i
          |  FROM pu),
          |a AS (
          |  SELECT g, CAST(count(*) AS BIGINT) AS n,
          |         CAST(sum(v) AS BIGINT) AS total,
          |         CAST(sum(i * v) AS BIGINT) AS iwx
          |  FROM r GROUP BY 1)
          |SELECT g AS o_orderpriority, n, total,
          |       CASE WHEN n >= 2 AND total > 0
          |            THEN round(2.0 * CAST(iwx AS DOUBLE)
          |                       / (CAST(n AS DOUBLE) * CAST(total AS DOUBLE))
          |                       - CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE), 6)
          |       END AS gini
          |FROM a ORDER BY o_orderpriority""".stripMargin,


      // exact (type, bin) cell grid; the integer Brier numerator
      // (y² = y clearing) and the float reliability/resolution sums
      // mirror Inference.brierDecomposition op for op
      "q_brier_decomp" ->
        """WITH e AS (
          |  SELECT event_type,
          |         ((CAST(round(value * 100) AS BIGINT) % 10) + 10) % 10 AS b,
          |         CASE WHEN user_id % 3 = 0 THEN 1 ELSE 0 END AS y
          |  FROM events),
          |cells AS (
          |  SELECT event_type, b, CAST(count(*) AS BIGINT) AS nk,
          |         CAST(sum(y) AS BIGINT) AS ok
          |  FROM e GROUP BY 1, 2),
          |tot AS (
          |  SELECT event_type, CAST(sum(nk) AS BIGINT) AS n,
          |         CAST(sum(ok) AS BIGINT) AS o
          |  FROM cells GROUP BY 1),
          |j AS (
          |  SELECT c.event_type AS event_type, nk, ok, b, n, o,
          |         CAST(2 * b + 1 AS DOUBLE) / 20.0 AS f,
          |         CAST(ok AS DOUBLE) / CAST(nk AS DOUBLE) AS obk,
          |         CAST(o AS DOUBLE) / CAST(n AS DOUBLE) AS obar
          |  FROM cells c JOIN tot USING (event_type)),
          |a AS (
          |  SELECT event_type, max(n) AS n, max(o) AS o,
          |         CAST(sum(nk * (2 * b + 1) * (2 * b + 1)
          |                  - 40 * (2 * b + 1) * ok + 400 * ok) AS BIGINT) AS bnum,
          |         sum(CAST(nk AS DOUBLE) * (f - obk) * (f - obk)) AS reln,
          |         sum(CAST(nk AS DOUBLE) * (obk - obar) * (obk - obar)) AS resn
          |  FROM j GROUP BY 1)
          |SELECT event_type, n,
          |       round(CAST(bnum AS DOUBLE) / (400.0 * CAST(n AS DOUBLE)), 6)
          |         AS brier,
          |       round(reln / CAST(n AS DOUBLE), 6) AS reliability,
          |       round(resn / CAST(n AS DOUBLE), 6) AS resolution,
          |       round(CAST(o AS DOUBLE) / CAST(n AS DOUBLE)
          |             * (1.0 - CAST(o AS DOUBLE) / CAST(n AS DOUBLE)), 6)
          |         AS uncertainty
          |FROM a ORDER BY event_type""".stripMargin,

      "q_mode" ->
        """SELECT l_returnflag AS mode_val FROM lineitem
          |GROUP BY 1 ORDER BY count(*) DESC, l_returnflag LIMIT 1""".stripMargin,


      "q_resample_yearly" ->
        """WITH monthly AS (
          |  SELECT CAST(year(l_shipdate) AS INTEGER) AS year, l_quantity AS employment FROM lineitem
          |  UNION ALL SELECT CAST(year(l_shipdate) AS INTEGER), l_discount * 100 FROM lineitem
          |  UNION ALL SELECT CAST(year(l_shipdate) AS INTEGER), l_tax * 100 FROM lineitem)
          |SELECT year, round(avg(employment), 4) AS employment, make_date(year, 1, 1) AS date
          |FROM monthly GROUP BY year ORDER BY year""".stripMargin,


      "q_resample_quarterly" ->
        """WITH monthly AS (
          |  SELECT CAST(year(l_shipdate) AS INTEGER) AS year,
          |         CAST(quarter(l_shipdate) AS INTEGER) AS qtr, l_quantity AS employment FROM lineitem
          |  UNION ALL SELECT CAST(year(l_shipdate) AS INTEGER),
          |         CAST(quarter(l_shipdate) AS INTEGER), l_discount * 100 FROM lineitem
          |  UNION ALL SELECT CAST(year(l_shipdate) AS INTEGER),
          |         CAST(quarter(l_shipdate) AS INTEGER), l_tax * 100 FROM lineitem)
          |SELECT year, qtr, round(avg(employment), 4) AS employment,
          |       make_date(year, (qtr - 1) * 3 + 1, 1) AS date
          |FROM monthly GROUP BY year, qtr ORDER BY year, qtr""".stripMargin,


      "q_bitmap_distinct" ->
        """SELECT event_type, count(DISTINCT user_id) AS n_users
          |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,


      "q_quota_sample" ->
        """WITH w AS (
          |  SELECT event_type, CAST(sum(user_id % 1000 + 1) AS BIGINT) AS w
          |  FROM events GROUP BY 1),
          |tot AS (SELECT CAST(sum(w) AS BIGINT) AS tot FROM w),
          |q0 AS (
          |  SELECT event_type, (100 * w) // tot AS base, (100 * w) % tot AS rem FROM w, tot),
          |q1 AS (
          |  SELECT event_type, base,
          |         row_number() OVER (ORDER BY rem DESC, event_type) AS rnk FROM q0),
          |quotas AS (
          |  SELECT event_type,
          |         base + CASE WHEN rnk <= 100 - (SELECT sum(base) FROM q0) THEN 1 ELSE 0 END AS quota
          |  FROM q1),
          |ranked AS (
          |  SELECT event_type, event_id,
          |         row_number() OVER (PARTITION BY event_type ORDER BY md5(CAST(event_id AS VARCHAR))) AS rn
          |  FROM events)
          |SELECT r.event_type, r.event_id, CAST(r.rn AS INTEGER) AS rank
          |FROM ranked r JOIN quotas q ON r.event_type = q.event_type
          |WHERE r.rn <= q.quota ORDER BY 1, 3""".stripMargin,


      "q_cms_topk" ->
        """WITH items AS (SELECT user_id AS item FROM events),
          |pairs AS (
          |  SELECT r, item,
          |         CAST(('0x' || substring(md5(CAST(r AS VARCHAR) || ':' || CAST(item AS VARCHAR)), 1, 8)) AS BIGINT) % 256 AS bucket
          |  FROM items, (SELECT unnest([0,1,2,3]) AS r)),
          |cms AS (SELECT r, bucket, count(*) AS c FROM pairs GROUP BY 1, 2),
          |exact AS (SELECT item, count(*) AS exact_n FROM items GROUP BY 1
          |          ORDER BY exact_n DESC, item LIMIT 10),
          |probe AS (
          |  SELECT e.item, e.exact_n, r.r,
          |         CAST(('0x' || substring(md5(CAST(r.r AS VARCHAR) || ':' || CAST(e.item AS VARCHAR)), 1, 8)) AS BIGINT) % 256 AS bucket
          |  FROM exact e, (SELECT unnest([0,1,2,3]) AS r) r)
          |SELECT p.item, CAST(min(coalesce(c.c, 0)) AS BIGINT) AS est,
          |       CAST(min(p.exact_n) AS BIGINT) AS exact_n,
          |       min(coalesce(c.c, 0)) >= min(p.exact_n) AS admissible
          |FROM probe p LEFT JOIN cms c ON p.r = c.r AND p.bucket = c.bucket
          |GROUP BY p.item ORDER BY exact_n DESC, item""".stripMargin,


      // deterministic HLL: every register is integer arithmetic off the
      // same md5, so the sketch state (v_empty, s_scaled) hash-gates
      // exactly; est repeats the engine's literal double ops (round 4
      // absorbs the last-ulp ln on the lc branch)
      "q_hll_distinct" ->
        """WITH h AS (
          |  SELECT event_type,
          |         CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR) || ':' || CAST(CAST(ts AS DATE) AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
          |  FROM events),
          |r AS (
          |  SELECT event_type, hv >> 52 AS bucket,
          |         max(bit_count((((hv & 4503599627370495) | 4503599627370496) & -((hv & 4503599627370495) | 4503599627370496)) - 1) + 1) AS reg
          |  FROM h GROUP BY 1, 2),
          |s AS (
          |  SELECT event_type, count(*) AS n_buckets,
          |         CAST(sum(CAST(1 AS BIGINT) << (53 - reg)) AS BIGINT) AS s_present
          |  FROM r GROUP BY 1),
          |e AS (
          |  SELECT event_type, CAST(256 - n_buckets AS BIGINT) AS v_empty,
          |         s_present + (256 - n_buckets) * (CAST(1 AS BIGINT) << 53) AS s_scaled
          |  FROM s),
          |est AS (
          |  SELECT event_type, v_empty, s_scaled,
          |         (0.7213 / (1.0 + 1.079 / 256.0)) * 256.0 * 256.0 *
          |           CAST(CAST(1 AS BIGINT) << 53 AS DOUBLE) / CAST(s_scaled AS DOUBLE) AS raw
          |  FROM e),
          |x AS (SELECT event_type, count(DISTINCT CAST(user_id AS VARCHAR) || ':' || CAST(CAST(ts AS DATE) AS VARCHAR)) AS n_exact FROM events GROUP BY 1)
          |SELECT est.event_type, CAST(x.n_exact AS BIGINT) AS n_exact, v_empty, s_scaled,
          |       CASE WHEN v_empty > 0 AND raw <= 2.5 * 256.0 THEN 'lc' ELSE 'raw' END AS band,
          |       round(CASE WHEN v_empty > 0 AND raw <= 2.5 * 256.0
          |             THEN 256.0 * ln(256.0 / CAST(v_empty AS DOUBLE)) ELSE raw END, 4) AS est
          |FROM est JOIN x ON est.event_type = x.event_type
          |ORDER BY 1""".stripMargin,


      // KMV overlap: bottom-k DISTINCT md5 minima per group (the
      // window form here equals KmvAgg's in-buffer dedup), union-k via
      // list ops on the tiny sketches, exact Jaccard alongside
      "q_kmv_overlap" ->
        """WITH h AS (
          |  SELECT DISTINCT event_type AS g,
          |         CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR) || ':' || CAST(CAST(ts AS DATE) AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
          |  FROM events),
          |sk AS (
          |  SELECT g, list_sort(list(hv)) AS ks
          |  FROM (SELECT g, hv, row_number() OVER (PARTITION BY g ORDER BY hv) AS rn FROM h)
          |  WHERE rn <= 128 GROUP BY g),
          |kv AS (
          |  SELECT a.g AS ga, b.g AS gb,
          |         list_slice(list_sort(list_distinct(list_concat(a.ks, b.ks))), 1, 128) AS ku_list,
          |         a.ks AS ksa, b.ks AS ksb
          |  FROM sk a JOIN sk b ON a.g < b.g),
          |kve AS (
          |  SELECT ga, gb,
          |         CAST(len(list_filter(ku_list, x -> list_contains(ksa, x) AND list_contains(ksb, x))) AS BIGINT) AS n_shared,
          |         CAST(len(ku_list) AS BIGINT) AS ku
          |  FROM kv),
          |du AS (SELECT DISTINCT event_type AS g, CAST(user_id AS VARCHAR) || ':' || CAST(CAST(ts AS DATE) AS VARCHAR) AS u FROM events),
          |sizes AS (SELECT g, count(*) AS n FROM du GROUP BY 1),
          |inter AS (
          |  SELECT x.g AS ga, y.g AS gb, count(*) AS n_inter
          |  FROM du x JOIN du y ON x.u = y.u AND x.g < y.g GROUP BY 1, 2)
          |SELECT kve.ga, kve.gb, n_shared, ku,
          |       round(CAST(n_shared AS DOUBLE) / CAST(ku AS DOUBLE), 4) AS jaccard_kmv,
          |       CAST(coalesce(n_inter, 0) AS BIGINT) AS n_inter,
          |       round(CAST(coalesce(n_inter, 0) AS DOUBLE) /
          |             CAST(sa.n + sb.n - coalesce(n_inter, 0) AS DOUBLE), 4) AS jaccard_exact
          |FROM kve LEFT JOIN inter ON kve.ga = inter.ga AND kve.gb = inter.gb
          |JOIN sizes sa ON kve.ga = sa.g JOIN sizes sb ON kve.gb = sb.g
          |ORDER BY 1, 2""".stripMargin,


      // discrete medians spelled as pure INTEGER rank logic (smallest
      // value whose <=-count reaches half the group: 2*ce >= n) — no
      // built-in quantile function, so no engine-version sensitivity
      "q_outliers" ->
        """WITH r1 AS (
          |  SELECT l_returnflag, l_extendedprice AS v,
          |         count(*) OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice
          |                        RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ce,
          |         count(*) OVER (PARTITION BY l_returnflag) AS n
          |  FROM lineitem),
          |med AS (SELECT l_returnflag, min(v) AS m FROM r1 WHERE 2 * ce >= n GROUP BY 1),
          |dev AS (
          |  SELECT l.l_returnflag, abs(l.l_extendedprice - med.m) AS adev, med.m
          |  FROM lineitem l JOIN med USING (l_returnflag)),
          |r2 AS (
          |  SELECT l_returnflag, adev,
          |         count(*) OVER (PARTITION BY l_returnflag ORDER BY adev
          |                        RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ce,
          |         count(*) OVER (PARTITION BY l_returnflag) AS n
          |  FROM dev),
          |mad AS (SELECT l_returnflag, min(adev) AS md FROM r2 WHERE 2 * ce >= n GROUP BY 1)
          |SELECT dev.l_returnflag, count(*) AS n,
          |       CAST(sum(CASE WHEN adev > 3.0 * 1.4826 * md THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
          |       round(min(m), 4) AS median, round(min(md), 4) AS mad
          |FROM dev JOIN mad USING (l_returnflag)
          |GROUP BY 1 ORDER BY l_returnflag""".stripMargin,


      "q_histogram" ->
        """SELECT CAST(least(greatest(floor(l_extendedprice / 5000.0), 0), 21) AS BIGINT) AS bin,
          |       count(*) AS n_rows,
          |       round(min(l_extendedprice), 2) AS min_price,
          |       round(max(l_extendedprice), 2) AS max_price
          |FROM lineitem GROUP BY 1 ORDER BY bin""".stripMargin,


      "q_share_of_total" ->
        """WITH pn AS (
          |  SELECT n_regionkey, n_name, round(sum(o_totalprice), 2) AS nation_total
          |  FROM orders
          |  JOIN customer ON o_custkey = c_custkey
          |  JOIN nation ON c_nationkey = n_nationkey
          |  GROUP BY 1, 2)
          |SELECT n_regionkey AS region_key, n_name AS nation, nation_total,
          |       round(nation_total / sum(nation_total) OVER (PARTITION BY n_regionkey), 6) AS share_of_region
          |FROM pn ORDER BY region_key, nation""".stripMargin,


      "q_psi_drift" ->
        """WITH ev AS (
          |  SELECT event_type,
          |         CAST(least(floor(value / 50.0), 9.0) AS BIGINT) AS bin,
          |         CASE WHEN day(ts) <= 15 THEN 'ref' ELSE 'cur' END AS half
          |  FROM events),
          |counts AS (
          |  SELECT event_type, bin,
          |         count(*) FILTER (WHERE half = 'ref') AS c_ref,
          |         count(*) FILTER (WHERE half = 'cur') AS c_cur
          |  FROM ev GROUP BY 1, 2),
          |tot AS (
          |  SELECT event_type, CAST(sum(c_ref) AS BIGINT) AS n_ref,
          |         CAST(sum(c_cur) AS BIGINT) AS n_cur
          |  FROM counts GROUP BY 1),
          |terms AS (
          |  SELECT c.event_type, n_ref, n_cur,
          |         greatest(CAST(c_ref AS DOUBLE) / n_ref, 1e-6) AS p_ref,
          |         greatest(CAST(c_cur AS DOUBLE) / n_cur, 1e-6) AS p_cur
          |  FROM counts c JOIN tot t ON c.event_type = t.event_type)
          |SELECT event_type, min(n_ref) AS n_ref, min(n_cur) AS n_cur,
          |       round(sum((p_cur - p_ref) * ln(p_cur / p_ref)), 6) AS psi
          |FROM terms GROUP BY 1 ORDER BY 1""".stripMargin,


      "q_psi_multi" ->
        """WITH binned AS (
          |  SELECT CASE WHEN l_shipdate < TIMESTAMP '1998-07-01' THEN 'ref' ELSE 'cur' END AS half,
          |         u.feature, u.bin
          |  FROM lineitem, unnest([
          |    {'feature': 'quantity', 'bin': CAST(least(floor(l_quantity / 5.0), 9.0) AS BIGINT)},
          |    {'feature': 'price', 'bin': CAST(least(floor(l_extendedprice / 10000.0), 10.0) AS BIGINT)},
          |    {'feature': 'discount', 'bin': CAST(least(floor(l_discount / 0.01), 10.0) AS BIGINT)}]) t(u)),
          |counts AS (
          |  SELECT feature, bin,
          |         count(*) FILTER (WHERE half = 'ref') AS c_ref,
          |         count(*) FILTER (WHERE half = 'cur') AS c_cur
          |  FROM binned GROUP BY 1, 2),
          |tot AS (
          |  SELECT feature, CAST(sum(c_ref) AS BIGINT) AS n_ref,
          |         CAST(sum(c_cur) AS BIGINT) AS n_cur
          |  FROM counts GROUP BY 1),
          |terms AS (
          |  SELECT c.feature, n_ref, n_cur,
          |         greatest(CAST(c_ref AS DOUBLE) / n_ref, 1e-6) AS p_ref,
          |         greatest(CAST(c_cur AS DOUBLE) / n_cur, 1e-6) AS p_cur
          |  FROM counts c JOIN tot t ON c.feature = t.feature)
          |SELECT feature, min(n_ref) AS n_ref, min(n_cur) AS n_cur,
          |       round(sum((p_cur - p_ref) * ln(p_cur / p_ref)), 6) AS psi
          |FROM terms GROUP BY 1 ORDER BY 1""".stripMargin,


      "q_hash_sample" ->
        s"""WITH toks AS (
           |  SELECT doc_id, $sqlTokens AS l FROM documents),
           |lv AS (
           |  SELECT doc_id,
           |         substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS bucket,
           |         $sqlLangVoteCols
           |  FROM toks),
           |lang AS (
           |  SELECT doc_id, bucket,
           |         $sqlLangCase AS lang_id
           |  FROM lv)
           |SELECT doc_id, lang_id FROM lang
           |WHERE bucket IN ('0', '1')
           |   OR (bucket IN ('2', '3') AND lang_id <> 'en')
           |ORDER BY doc_id""".stripMargin,


      "q_percentiles" ->
        """SELECT l_returnflag,
          |       round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
          |       round(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
          |       round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr
          |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,


      "q_percentile_disc" ->
        """SELECT l_returnflag,
          |       quantile_disc(l_extendedprice, 0.5) AS p50_disc,
          |       quantile_disc(l_extendedprice, 0.95) AS p95_disc
          |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,


      "q_count_distinct" ->
        """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
          |       count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
          |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,


      "q_group_stats" ->
        """WITH g AS (
          |  SELECT l_returnflag, count(*) AS n,
          |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s,
          |         CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS ss,
          |         min(CAST(l_quantity AS BIGINT)) AS min_q,
          |         max(CAST(l_quantity AS BIGINT)) AS max_q
          |  FROM lineitem GROUP BY 1)
          |SELECT l_returnflag, n, s, min_q, max_q,
          |       CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean_q,
          |       sqrt(CAST(n * ss - s * s AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE)) AS stddev_q
          |FROM g ORDER BY l_returnflag""".stripMargin,


      // the window form the TopKAgg aggregator replaces at scale —
      // identical semantics (score desc, id asc tie-break)
      "q_topk_agg" ->
        """SELECT o_orderpriority, CAST(rn AS BIGINT) AS rnk, o_totalprice, o_orderkey
          |FROM (SELECT o_orderpriority, o_totalprice, o_orderkey,
          |             row_number() OVER (PARTITION BY o_orderpriority
          |                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
          |      FROM orders)
          |WHERE rn <= 3
          |ORDER BY o_orderpriority, rnk""".stripMargin,


      // sequential Poisson priority: u = first 52 md5 bits (exactly
      // representable as a double), priority = ONE division u/weight
      "q_weighted_sample" ->
        """WITH pri AS (
          |  SELECT doc_id, n_chars, lang,
          |         CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT) AS DOUBLE)
          |           / CAST(n_chars AS DOUBLE) AS p
          |  FROM documents)
          |SELECT doc_id, n_chars, lang FROM pri
          |QUALIFY row_number() OVER (ORDER BY p, doc_id) <= 60
          |ORDER BY doc_id""".stripMargin,


      "q_weighted_sample_strat" ->
        """WITH pri AS (
          |  SELECT doc_id, lang, n_chars,
          |         CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT) AS DOUBLE)
          |           / CAST(n_chars AS DOUBLE) AS p
          |  FROM documents)
          |SELECT doc_id, lang, n_chars FROM pri
          |QUALIFY row_number() OVER (PARTITION BY lang ORDER BY p, doc_id) <= 8
          |ORDER BY doc_id""".stripMargin,


      "q_group_split" ->
        """WITH s AS (
          |  SELECT user_id, value,
          |         CASE WHEN b < 13 THEN 'train' WHEN b < 15 THEN 'val' ELSE 'test' END AS split
          |  FROM (SELECT user_id, value,
          |          instr('0123456789abcdef', substring(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1 AS b
          |        FROM events))
          |SELECT split, count(DISTINCT user_id) AS n_users, count(*) AS n_events,
          |       round(sum(value), 2) AS total_value
          |FROM s GROUP BY split ORDER BY split""".stripMargin,


      "q_winsorize" ->
        """WITH bounds AS (
          |  SELECT l_returnflag,
          |         quantile_cont(l_extendedprice, 0.05) AS lo,
          |         quantile_cont(l_extendedprice, 0.95) AS hi
          |  FROM lineitem GROUP BY 1)
          |SELECT l.l_returnflag,
          |       count(*) FILTER (WHERE l_extendedprice < lo) AS n_clamped_low,
          |       count(*) FILTER (WHERE l_extendedprice > hi) AS n_clamped_high,
          |       count(*) AS n_rows,
          |       round(min(lo), 4) AS p05,
          |       round(min(hi), 4) AS p95,
          |       round(avg(least(greatest(l_extendedprice, lo), hi)), 4) AS winsorized_mean
          |FROM lineitem l JOIN bounds b ON l.l_returnflag = b.l_returnflag
          |GROUP BY 1 ORDER BY 1""".stripMargin,


      // mean/sigma from exact integer power sums, every float op in
      // the same order as the Spark column expressions
      "q_standardize" ->
        """WITH stats AS (
          |  SELECT l_returnflag, count(*) AS n,
          |         sum(CAST(l_quantity AS BIGINT)) AS s1,
          |         sum(CAST(l_quantity * l_quantity AS BIGINT)) AS s2
          |  FROM lineitem GROUP BY 1),
          |params AS (
          |  SELECT l_returnflag, n, CAST(s1 AS DOUBLE) / n AS mu,
          |         sqrt((CAST(s2 AS DOUBLE) * n - CAST(s1 AS DOUBLE) * s1) /
          |              (CAST(n AS DOUBLE) * n)) AS sigma
          |  FROM stats)
          |SELECT l.l_returnflag, count(*) AS n_rows,
          |       count(*) FILTER (WHERE abs((l_quantity - mu) / sigma) > 1.5) AS n_beyond_15sd,
          |       round(min((l_quantity - mu) / sigma), 6) AS z_min,
          |       round(max((l_quantity - mu) / sigma), 6) AS z_max,
          |       round(min(mu), 6) AS mu, round(min(sigma), 6) AS sigma
          |FROM lineitem l JOIN params p ON l.l_returnflag = p.l_returnflag
          |GROUP BY 1 ORDER BY 1""".stripMargin,


      // manual cumulative-weight mirror of exactWeightedQuantilesDisc:
      // the qualifying value's interval satisfies cum−c < p·Σw ≤ cum
      "q_weighted_median" ->
        """WITH vc AS (
          |  SELECT l_returnflag, l_extendedprice AS v,
          |         sum(CAST(l_quantity AS BIGINT)) AS c
          |  FROM lineitem
          |  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
          |    AND l_quantity > 0
          |  GROUP BY 1, 2),
          |r AS (
          |  SELECT l_returnflag, v, c,
          |         sum(c) OVER (PARTITION BY l_returnflag ORDER BY v) AS cum,
          |         sum(c) OVER (PARTITION BY l_returnflag) AS tot
          |  FROM vc)
          |SELECT l_returnflag,
          |       min(CASE WHEN cum - c < 0.5 * tot AND 0.5 * tot <= cum THEN v END) AS wp50,
          |       min(CASE WHEN cum - c < 0.9 * tot AND 0.9 * tot <= cum THEN v END) AS wp90
          |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,


      "q_ab_ttest" ->
        """WITH e AS (
          |  SELECT event_type, CAST(user_id % 2 AS INTEGER) AS arm,
          |         CAST(floor(value * 100) AS BIGINT) AS x
          |  FROM events),
          |g AS (
          |  SELECT event_type,
          |         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
          |         CAST(sum(CASE WHEN arm = 0 THEN x ELSE 0 END) AS BIGINT) AS s0,
          |         CAST(sum(CASE WHEN arm = 0 THEN x * x ELSE 0 END) AS BIGINT) AS ss0,
          |         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
          |         CAST(sum(CASE WHEN arm = 1 THEN x ELSE 0 END) AS BIGINT) AS s1,
          |         CAST(sum(CASE WHEN arm = 1 THEN x * x ELSE 0 END) AS BIGINT) AS ss1
          |  FROM e GROUP BY 1),
          |h AS (
          |  SELECT event_type, n0, n1,
          |         CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS mean0,
          |         CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS mean1,
          |         (CAST(n0 AS DOUBLE) * CAST(ss0 AS DOUBLE) - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE))
          |           / (CAST(n0 AS DOUBLE) * CAST(n0 - 1 AS DOUBLE))
          |           / CAST(n0 AS DOUBLE) AS se0,
          |         (CAST(n1 AS DOUBLE) * CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
          |           / (CAST(n1 AS DOUBLE) * CAST(n1 - 1 AS DOUBLE))
          |           / CAST(n1 AS DOUBLE) AS se1
          |  FROM g)
          |SELECT event_type, n0, n1,
          |       CASE WHEN n0 >= 1 THEN round(mean0, 6) END AS mean0,
          |       CASE WHEN n1 >= 1 THEN round(mean1, 6) END AS mean1,
          |       CASE WHEN n0 >= 1 AND n1 >= 1
          |            THEN round(mean1 - mean0, 6) END AS mean_diff,
          |       CASE WHEN n0 >= 2 AND n1 >= 2
          |            THEN round((mean1 - mean0) / sqrt(se0 + se1), 6) END AS t_stat,
          |       CASE WHEN n0 >= 2 AND n1 >= 2
          |            THEN round((se0 + se1) * (se0 + se1)
          |                       / (se0 * se0 / CAST(n0 - 1 AS DOUBLE)
          |                          + se1 * se1 / CAST(n1 - 1 AS DOUBLE)), 6)
          |       END AS welch_df
          |FROM h ORDER BY event_type""".stripMargin,


      // same conditional power sums as q_ab_ttest; variance, pooled
      // variance and d mirror Inference.cohensD's double expressions
      // op for op (exact long inputs, so the doubles agree bit-wise)
      "q_cohens_d" ->
        """WITH e AS (
          |  SELECT event_type, CAST(user_id % 2 AS INTEGER) AS arm,
          |         CAST(floor(value * 100) AS BIGINT) AS x
          |  FROM events),
          |g AS (
          |  SELECT event_type,
          |         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
          |         CAST(sum(CASE WHEN arm = 0 THEN x ELSE 0 END) AS BIGINT) AS s0,
          |         CAST(sum(CASE WHEN arm = 0 THEN x * x ELSE 0 END) AS BIGINT) AS ss0,
          |         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
          |         CAST(sum(CASE WHEN arm = 1 THEN x ELSE 0 END) AS BIGINT) AS s1,
          |         CAST(sum(CASE WHEN arm = 1 THEN x * x ELSE 0 END) AS BIGINT) AS ss1
          |  FROM e GROUP BY 1),
          |h AS (
          |  SELECT event_type, n0, n1,
          |         CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
          |           - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS diff,
          |         (CAST(n0 - 1 AS DOUBLE)
          |            * ((CAST(n0 AS DOUBLE) * CAST(ss0 AS DOUBLE)
          |                - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE))
          |               / (CAST(n0 AS DOUBLE) * CAST(n0 - 1 AS DOUBLE)))
          |          + CAST(n1 - 1 AS DOUBLE)
          |            * ((CAST(n1 AS DOUBLE) * CAST(ss1 AS DOUBLE)
          |                - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
          |               / (CAST(n1 AS DOUBLE) * CAST(n1 - 1 AS DOUBLE))))
          |         / CAST(n0 + n1 - 2 AS DOUBLE) AS pv
          |  FROM g)
          |SELECT event_type, n0, n1,
          |       CASE WHEN n0 >= 1 AND n1 >= 1 THEN round(diff, 6) END AS mean_diff,
          |       CASE WHEN n0 >= 2 AND n1 >= 2 THEN round(sqrt(pv), 6) END AS pooled_sd,
          |       CASE WHEN n0 >= 2 AND n1 >= 2 AND pv > 0
          |            THEN round(diff / sqrt(pv), 6) END AS cohens_d
          |FROM h ORDER BY event_type""".stripMargin,


      // exact long power sums per type; the sums-of-squares algebra
      // and the float op order mirror Inference.anovaF expression for
      // expression (only the O(1) ratios are emitted — raw SSB/SSW
      // trailing digits sit below one ulp at scale)
      "q_anova_f" ->
        """WITH e AS (
          |  SELECT event_type AS g, CAST(floor(value * 100) AS BIGINT) AS x
          |  FROM events),
          |g AS (
          |  SELECT g, CAST(count(*) AS BIGINT) AS n,
          |         CAST(sum(x) AS BIGINT) AS s,
          |         CAST(sum(x * x) AS BIGINT) AS ss
          |  FROM e GROUP BY 1),
          |t AS (
          |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS n,
          |         CAST(sum(s) AS DOUBLE) AS sd, CAST(sum(ss) AS DOUBLE) AS ssd,
          |         sum(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
          |             / CAST(n AS DOUBLE)) AS sb
          |  FROM g),
          |h AS (
          |  SELECT k, n, greatest(sb - sd * sd / CAST(n AS DOUBLE), 0) AS ssb,
          |         ssd - sb AS ssw
          |  FROM t)
          |SELECT k, n,
          |       CASE WHEN k >= 2 AND n > k AND ssw > 0
          |            THEN round((ssb / CAST(k - 1 AS DOUBLE))
          |                       / (ssw / CAST(n - k AS DOUBLE)), 6)
          |       END AS f_stat,
          |       CASE WHEN k >= 2 AND n > k AND ssb + ssw > 0
          |            THEN round(ssb / (ssb + ssw), 6) END AS eta_sq
          |FROM h ORDER BY k""".stripMargin,


      // doubled-midrank grid identical to q_mann_whitney's oracle;
      // per-priority doubled rank sums stay exact longs, the H float
      // tower mirrors Inference.kruskalWallisH op for op
      "q_kruskal_wallis" ->
        """WITH o AS (
          |  SELECT o_orderpriority AS g,
          |         CAST(floor(o_totalprice) AS BIGINT) AS v
          |  FROM orders),
          |cells AS (
          |  SELECT g, v, CAST(count(*) AS BIGINT) AS c FROM o GROUP BY 1, 2),
          |vt AS (SELECT v, CAST(sum(c) AS BIGINT) AS cv FROM cells GROUP BY 1),
          |vt2 AS (
          |  SELECT v, cv,
          |         COALESCE(CAST(sum(cv) OVER (ORDER BY v
          |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
          |           AS BIGINT), 0) AS cb
          |  FROM vt),
          |pg AS (
          |  SELECT g, CAST(sum(c) AS BIGINT) AS ng,
          |         CAST(sum(c * (2 * cb + cv + 1)) AS BIGINT) AS r2
          |  FROM cells JOIN vt2 USING (v) GROUP BY 1),
          |gt AS (
          |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(ng) AS BIGINT) AS n,
          |         sum(CAST(r2 AS DOUBLE) * CAST(r2 AS DOUBLE)
          |             / (4.0 * CAST(ng AS DOUBLE))) AS rterm
          |  FROM pg),
          |tt AS (
          |  SELECT CAST(sum(cv * cv * cv - cv) AS BIGINT) AS t3 FROM vt),
          |h AS (
          |  SELECT k, n, t3,
          |         12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
          |           * rterm - 3.0 * (CAST(n AS DOUBLE) + 1.0) AS hs,
          |         1.0 - CAST(t3 AS DOUBLE)
          |           / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
          |              * CAST(n AS DOUBLE) - CAST(n AS DOUBLE)) AS corr
          |  FROM gt CROSS JOIN tt)
          |SELECT k, n, t3,
          |       CASE WHEN k >= 2 AND n >= 2 THEN round(hs, 6) END AS h_stat,
          |       CASE WHEN k >= 2 AND n >= 2 AND corr > 0
          |            THEN round(hs / corr, 6) END AS h_corrected
          |FROM h ORDER BY k""".stripMargin,


      // grid-median |deviations| then the same ANOVA tower as
      // q_anova_f; (ng+1)//2 is the engine-exact lower middle
      // (Spark side: shiftright(ng+1, 1))
      "q_levene_bf" ->
        """WITH e AS (
          |  SELECT event_type AS g, CAST(floor(value * 100) AS BIGINT) AS v
          |  FROM events),
          |cells AS (
          |  SELECT g, v, CAST(count(*) AS BIGINT) AS c FROM e GROUP BY 1, 2),
          |cc AS (
          |  SELECT g, v, c,
          |         CAST(sum(c) OVER (PARTITION BY g ORDER BY v
          |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |           AS BIGINT) AS cum,
          |         CAST(sum(c) OVER (PARTITION BY g) AS BIGINT) AS ng
          |  FROM cells),
          |meds AS (
          |  SELECT g, min(CASE WHEN cum >= (ng + 1) // 2 THEN v END) AS med
          |  FROM cc GROUP BY 1),
          |z AS (
          |  SELECT cells.g AS g, c, abs(v - med) AS z
          |  FROM cells JOIN meds ON cells.g = meds.g),
          |pg AS (
          |  SELECT g, CAST(sum(c) AS BIGINT) AS n,
          |         CAST(sum(c * z) AS BIGINT) AS s,
          |         CAST(sum(c * z * z) AS BIGINT) AS ss
          |  FROM z GROUP BY 1),
          |t AS (
          |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS n,
          |         CAST(sum(s) AS DOUBLE) AS sd, CAST(sum(ss) AS DOUBLE) AS ssd,
          |         sum(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
          |             / CAST(n AS DOUBLE)) AS sb
          |  FROM pg),
          |h AS (
          |  SELECT k, n, greatest(sb - sd * sd / CAST(n AS DOUBLE), 0) AS ssb,
          |         ssd - sb AS ssw
          |  FROM t)
          |SELECT k, n,
          |       CASE WHEN k >= 2 AND n > k AND ssw > 0
          |            THEN round((ssb / CAST(k - 1 AS DOUBLE))
          |                       / (ssw / CAST(n - k AS DOUBLE)), 6)
          |       END AS w_stat
          |FROM h ORDER BY k""".stripMargin,


      // suspect side decided by the exact long comparison
      // n·(max+min) ≥ 2·Σx; variance/sd mirror Inference's varC
      "q_grubbs" ->
        """WITH li AS (
          |  SELECT l_returnflag,
          |         CAST(floor(l_extendedprice) AS BIGINT) AS x
          |  FROM lineitem),
          |g AS (
          |  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
          |         CAST(sum(x) AS BIGINT) AS s,
          |         CAST(sum(x * x) AS BIGINT) AS ss,
          |         CAST(min(x) AS BIGINT) AS mn, CAST(max(x) AS BIGINT) AS mx
          |  FROM li GROUP BY 1),
          |h AS (
          |  SELECT l_returnflag, n, s, mn, mx,
          |         CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
          |         sqrt((CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
          |               - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
          |              / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))) AS sd
          |  FROM g)
          |SELECT l_returnflag, n,
          |       CASE WHEN n * (mx + mn) >= 2 * s THEN mx ELSE mn END
          |         AS suspect_val,
          |       CASE WHEN n >= 3 AND sd > 0
          |            THEN round(greatest(CAST(mx AS DOUBLE) - mean,
          |                                mean - CAST(mn AS DOUBLE)) / sd, 6)
          |       END AS grubbs_g
          |FROM h ORDER BY l_returnflag""".stripMargin,


      // grand grid median, exact per-segment splits, float chi-square
      // tower mirroring Inference.moodMedianChi2 (shared total via the
      // same unpartitioned window sum)
      "q_mood_median" ->
        """WITH c AS (
          |  SELECT c_mktsegment AS g,
          |         CAST(floor(c_acctbal * 100) AS BIGINT) AS v
          |  FROM customer),
          |vt AS (SELECT v, CAST(count(*) AS BIGINT) AS cv FROM c GROUP BY 1),
          |vc AS (
          |  SELECT v,
          |         CAST(sum(cv) OVER (ORDER BY v
          |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |           AS BIGINT) AS cum,
          |         CAST(sum(cv) OVER () AS BIGINT) AS n
          |  FROM vt),
          |med AS (
          |  SELECT min(CASE WHEN cum >= (n + 1) // 2 THEN v END) AS med
          |  FROM vc),
          |pg AS (
          |  SELECT g, CAST(count(*) AS BIGINT) AS n,
          |         CAST(sum(CASE WHEN v > med THEN 1 ELSE 0 END) AS BIGINT)
          |           AS above
          |  FROM c CROSS JOIN med GROUP BY 1),
          |wt AS (
          |  SELECT g, n, above, n - above AS below,
          |         CAST(sum(above) OVER () AS BIGINT) AS na,
          |         CAST(sum(n - above) OVER () AS BIGINT) AS nb,
          |         CAST(sum(n) OVER () AS BIGINT) AS nt
          |  FROM pg),
          |ct AS (
          |  SELECT g, n, above, below,
          |         CAST(n AS DOUBLE) * CAST(na AS DOUBLE)
          |           / CAST(nt AS DOUBLE) AS ea,
          |         CAST(n AS DOUBLE) * CAST(nb AS DOUBLE)
          |           / CAST(nt AS DOUBLE) AS eb
          |  FROM wt),
          |cb AS (
          |  SELECT g, n, above, below,
          |         CASE WHEN ea > 0 AND eb > 0 THEN
          |           (CAST(above AS DOUBLE) - ea) * (CAST(above AS DOUBLE) - ea)
          |             / ea
          |           + (CAST(below AS DOUBLE) - eb)
          |             * (CAST(below AS DOUBLE) - eb) / eb
          |         END AS contrib
          |  FROM ct)
          |SELECT g AS c_mktsegment, n, above, below,
          |       round(contrib, 6) AS chi2_contrib,
          |       round(sum(contrib) OVER (), 6) AS chi2_total
          |FROM cb ORDER BY c_mktsegment""".stripMargin,


      // grid-cumulative counts, impurity tower mirroring
      // Inference.giniSplitScan op for op; row_number tie-break on
      // (gini, threshold) flags the winner in both engines
      "q_best_split" ->
        """WITH li AS (
          |  SELECT CAST(floor(l_quantity) AS BIGINT) AS v,
          |         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS pos
          |  FROM lineitem),
          |cells AS (
          |  SELECT v, CAST(count(*) AS BIGINT) AS c,
          |         CAST(sum(pos) AS BIGINT) AS p
          |  FROM li GROUP BY 1),
          |cum AS (
          |  SELECT v,
          |         CAST(sum(c) OVER (ORDER BY v
          |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |           AS BIGINT) AS n_le,
          |         CAST(sum(p) OVER (ORDER BY v
          |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |           AS BIGINT) AS p_le,
          |         CAST(sum(c) OVER () AS BIGINT) AS nt,
          |         CAST(sum(p) OVER () AS BIGINT) AS pt
          |  FROM cells),
          |sc AS (
          |  SELECT v AS threshold, n_le, p_le,
          |         round((CAST(n_le AS DOUBLE)
          |                  * (1.0 - (CAST(p_le AS DOUBLE) * CAST(p_le AS DOUBLE)
          |                            + CAST(n_le - p_le AS DOUBLE)
          |                              * CAST(n_le - p_le AS DOUBLE))
          |                           / (CAST(n_le AS DOUBLE)
          |                              * CAST(n_le AS DOUBLE)))
          |                + CAST(nt - n_le AS DOUBLE)
          |                  * (1.0 - (CAST(pt - p_le AS DOUBLE)
          |                              * CAST(pt - p_le AS DOUBLE)
          |                            + CAST(nt - n_le - (pt - p_le) AS DOUBLE)
          |                              * CAST(nt - n_le - (pt - p_le) AS DOUBLE))
          |                           / (CAST(nt - n_le AS DOUBLE)
          |                              * CAST(nt - n_le AS DOUBLE))))
          |               / CAST(nt AS DOUBLE), 6) AS gini_split
          |  FROM cum WHERE n_le < nt)
          |SELECT threshold, n_le, p_le, gini_split,
          |       row_number() OVER (ORDER BY gini_split, threshold) = 1
          |         AS is_best
          |FROM sc ORDER BY threshold""".stripMargin,


      // doubled within-block midranks via the same RANGE window; the
      // tie-corrected chi-square cleared to one exact-long division,
      // mirroring Inference.friedmanT1
      "q_friedman" ->
        """WITH d AS (
          |  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS b,
          |         event_type AS trt, count(*)::BIGINT AS y
          |  FROM events GROUP BY 1, 2),
          |k AS (SELECT CAST(count(DISTINCT trt) AS BIGINT) AS k FROM d),
          |bs AS (SELECT b, count(*)::BIGINT AS bk FROM d GROUP BY 1),
          |compl AS (
          |  SELECT d.b, d.trt, d.y, k.k
          |  FROM d JOIN bs ON d.b = bs.b CROSS JOIN k WHERE bs.bk = k.k),
          |r AS (
          |  SELECT trt, k,
          |         2 * CAST(count(*) OVER (PARTITION BY b ORDER BY y
          |               RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
          |             AS BIGINT)
          |         + CAST(count(*) OVER (PARTITION BY b, y) AS BIGINT)
          |         + 1 AS r2
          |  FROM compl),
          |pt AS (
          |  SELECT trt, k, count(*)::BIGINT AS n,
          |         CAST(sum(r2) AS BIGINT) AS r2sum,
          |         CAST(sum(r2 * r2) AS BIGINT) AS a2t
          |  FROM r GROUP BY 1, 2),
          |g AS (
          |  SELECT trt, k, n, r2sum,
          |         CAST(sum(a2t) OVER () AS BIGINT) AS a2,
          |         CAST(sum(r2sum * r2sum) OVER () AS BIGINT) AS sr2
          |  FROM pt)
          |SELECT trt, n AS n_blocks, r2sum,
          |       CASE WHEN n > 0 THEN round(CAST(r2sum AS DOUBLE)
          |                                  / (2.0 * CAST(n AS DOUBLE)), 6)
          |       END AS mean_rank,
          |       CASE WHEN a2 - n * k * (k + 1) * (k + 1) > 0
          |            THEN round(CAST((k - 1) * (sr2 - n * n * k * (k + 1)
          |                                             * (k + 1)) AS DOUBLE)
          |                       / CAST(a2 - n * k * (k + 1) * (k + 1)
          |                              AS DOUBLE), 6)
          |       END AS friedman_chi2
          |FROM g ORDER BY trt""".stripMargin,


      // same conditional power sums as q_anova_f; pair table via the
      // k² self-join, float tower mirroring Inference.tukeyPairs
      "q_tukey_pairs" ->
        """WITH e AS (
          |  SELECT event_type AS g, CAST(floor(value * 100) AS BIGINT) AS x
          |  FROM events),
          |gr AS (
          |  SELECT g, CAST(count(*) AS BIGINT) AS n,
          |         CAST(sum(x) AS BIGINT) AS s,
          |         CAST(sum(x * x) AS BIGINT) AS ss
          |  FROM e GROUP BY 1),
          |tot AS (
          |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS nt,
          |         CAST(sum(ss) AS DOUBLE) AS ssd,
          |         sum(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
          |             / CAST(n AS DOUBLE)) AS sb
          |  FROM gr),
          |p AS (
          |  SELECT a.g AS g_a, b.g AS g_b, a.n AS n_a, b.n AS n_b,
          |         CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE)
          |           - CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE) AS diff,
          |         (ssd - sb) / CAST(nt - k AS DOUBLE) AS msw, nt, k
          |  FROM gr a JOIN gr b ON a.g < b.g CROSS JOIN tot)
          |SELECT g_a, g_b, n_a, n_b, round(diff, 6) AS mean_diff,
          |       CASE WHEN nt > k AND msw > 0
          |            THEN round(diff / sqrt(msw * (1.0 / CAST(n_a AS DOUBLE)
          |                       + 1.0 / CAST(n_b AS DOUBLE))), 6)
          |       END AS t_stat
          |FROM p ORDER BY g_a, g_b""".stripMargin,


      // per-user conditional sums around the grid-median day split;
      // θ/diff/ρ² float tower mirrors Inference.cupedAdjust op for op
      "q_cuped" ->
        """WITH ev AS (
          |  SELECT user_id, strftime(date_trunc('day', ts), '%Y-%m-%d')
          |           AS day,
          |         CAST(floor(value * 100) AS BIGINT) AS cents
          |  FROM events),
          |dg AS (
          |  SELECT day, row_number() OVER (ORDER BY day) AS rn,
          |         count(*) OVER () AS nd
          |  FROM (SELECT DISTINCT day FROM ev)),
          |med AS (
          |  SELECT min(CASE WHEN rn >= (nd + 1) // 2 THEN day END) AS med
          |  FROM dg),
          |pu AS (
          |  SELECT user_id, CAST(user_id % 2 AS INTEGER) AS arm,
          |         CAST(sum(CASE WHEN day <= med THEN cents ELSE 0 END)
          |              AS BIGINT) AS x,
          |         CAST(sum(CASE WHEN day > med THEN cents ELSE 0 END)
          |              AS BIGINT) AS y
          |  FROM ev CROSS JOIN med GROUP BY 1, 2),
          |s AS (
          |  SELECT CAST(count(*) AS BIGINT) AS n,
          |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
          |         CAST(sum(x * x) AS BIGINT) AS sxx,
          |         CAST(sum(y * y) AS BIGINT) AS syy,
          |         CAST(sum(x * y) AS BIGINT) AS sxy,
          |         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
          |           AS n0,
          |         CAST(sum(CASE WHEN arm = 0 THEN x ELSE 0 END) AS BIGINT)
          |           AS sx0,
          |         CAST(sum(CASE WHEN arm = 0 THEN y ELSE 0 END) AS BIGINT)
          |           AS sy0,
          |         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
          |           AS n1,
          |         CAST(sum(CASE WHEN arm = 1 THEN x ELSE 0 END) AS BIGINT)
          |           AS sx1,
          |         CAST(sum(CASE WHEN arm = 1 THEN y ELSE 0 END) AS BIGINT)
          |           AS sy1
          |  FROM pu),
          |h AS (
          |  SELECT n, n0, n1,
          |         CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          |           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS covn,
          |         CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
          |           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS varxn,
          |         CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
          |           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS varyn,
          |         CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE)
          |           - CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS rawdiff,
          |         CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE)
          |           - CAST(sx0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS xdiff
          |  FROM s)
          |SELECT n AS n_units, n0, n1,
          |       CASE WHEN varxn > 0 THEN round(covn / varxn, 6) END AS theta,
          |       CASE WHEN n0 >= 1 AND n1 >= 1 THEN round(rawdiff, 6) END
          |         AS diff_raw,
          |       CASE WHEN n0 >= 1 AND n1 >= 1 AND varxn > 0
          |            THEN round(rawdiff - covn / varxn * xdiff, 6) END
          |         AS diff_cuped,
          |       CASE WHEN varxn > 0 AND varyn > 0
          |            THEN round(covn * covn / (varxn * varyn), 6) END
          |         AS rho_sq
          |FROM h ORDER BY n_units""".stripMargin,


      // four conditional cell sums around the same grid-median split;
      // slopes and DiD mirror Inference.diffInDiff
      "q_did" ->
        """WITH ev AS (
          |  SELECT user_id, strftime(date_trunc('day', ts), '%Y-%m-%d')
          |           AS day,
          |         CAST(floor(value * 100) AS BIGINT) AS cents
          |  FROM events),
          |dg AS (
          |  SELECT day, row_number() OVER (ORDER BY day) AS rn,
          |         count(*) OVER () AS nd
          |  FROM (SELECT DISTINCT day FROM ev)),
          |med AS (
          |  SELECT min(CASE WHEN rn >= (nd + 1) // 2 THEN day END) AS med
          |  FROM dg),
          |b AS (
          |  SELECT CAST(user_id % 2 AS INTEGER) AS tr,
          |         CASE WHEN day > med THEN 1 ELSE 0 END AS po, cents AS y
          |  FROM ev CROSS JOIN med),
          |s AS (
          |  SELECT
          |    CAST(sum(CASE WHEN tr = 0 AND po = 0 THEN 1 ELSE 0 END)
          |         AS BIGINT) AS n00,
          |    CAST(sum(CASE WHEN tr = 0 AND po = 0 THEN y ELSE 0 END)
          |         AS BIGINT) AS s00,
          |    CAST(sum(CASE WHEN tr = 0 AND po = 1 THEN 1 ELSE 0 END)
          |         AS BIGINT) AS n01,
          |    CAST(sum(CASE WHEN tr = 0 AND po = 1 THEN y ELSE 0 END)
          |         AS BIGINT) AS s01,
          |    CAST(sum(CASE WHEN tr = 1 AND po = 0 THEN 1 ELSE 0 END)
          |         AS BIGINT) AS n10,
          |    CAST(sum(CASE WHEN tr = 1 AND po = 0 THEN y ELSE 0 END)
          |         AS BIGINT) AS s10,
          |    CAST(sum(CASE WHEN tr = 1 AND po = 1 THEN 1 ELSE 0 END)
          |         AS BIGINT) AS n11,
          |    CAST(sum(CASE WHEN tr = 1 AND po = 1 THEN y ELSE 0 END)
          |         AS BIGINT) AS s11
          |  FROM b),
          |h AS (
          |  SELECT *,
          |         CAST(s01 AS DOUBLE) / CAST(n01 AS DOUBLE)
          |           - CAST(s00 AS DOUBLE) / CAST(n00 AS DOUBLE) AS slc,
          |         CAST(s11 AS DOUBLE) / CAST(n11 AS DOUBLE)
          |           - CAST(s10 AS DOUBLE) / CAST(n10 AS DOUBLE) AS slt,
          |         n00 >= 1 AND n01 >= 1 AND n10 >= 1 AND n11 >= 1 AS ok
          |  FROM s)
          |SELECT n00, n01, n10, n11,
          |       CASE WHEN n00 >= 1 THEN
          |         round(CAST(s00 AS DOUBLE) / CAST(n00 AS DOUBLE), 6) END
          |         AS mean_c_pre,
          |       CASE WHEN n01 >= 1 THEN
          |         round(CAST(s01 AS DOUBLE) / CAST(n01 AS DOUBLE), 6) END
          |         AS mean_c_post,
          |       CASE WHEN n10 >= 1 THEN
          |         round(CAST(s10 AS DOUBLE) / CAST(n10 AS DOUBLE), 6) END
          |         AS mean_t_pre,
          |       CASE WHEN n11 >= 1 THEN
          |         round(CAST(s11 AS DOUBLE) / CAST(n11 AS DOUBLE), 6) END
          |         AS mean_t_post,
          |       CASE WHEN ok THEN round(slc, 6) END AS slope_ctrl,
          |       CASE WHEN ok THEN round(slt, 6) END AS slope_treat,
          |       CASE WHEN ok THEN round(slt - slc, 6) END AS did
          |FROM h ORDER BY n00""".stripMargin,


      // per-type sample variances from the q_anova_f power sums; the
      // ln tower mirrors Inference.bartlettT op for op
      "q_bartlett" ->
        """WITH e AS (
          |  SELECT event_type AS g, CAST(floor(value * 100) AS BIGINT) AS x
          |  FROM events),
          |g AS (
          |  SELECT g, CAST(count(*) AS BIGINT) AS n,
          |         CAST(sum(x) AS BIGINT) AS s,
          |         CAST(sum(x * x) AS BIGINT) AS ss
          |  FROM e GROUP BY 1),
          |v AS (
          |  SELECT n,
          |         (CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
          |          - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
          |         / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)) AS v
          |  FROM g),
          |t AS (
          |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS n,
          |         sum(CAST(n - 1 AS DOUBLE) * v) AS ssw,
          |         sum(CAST(n - 1 AS DOUBLE) * ln(v)) AS slnv,
          |         sum(1.0 / CAST(n - 1 AS DOUBLE)) AS sinv,
          |         CAST(min(n) AS BIGINT) AS minn, min(v) AS minv
          |  FROM v)
          |SELECT k, n,
          |       CASE WHEN k >= 2 AND minn >= 2 AND minv > 0 THEN
          |         round((CAST(n - k AS DOUBLE)
          |                  * ln(ssw / CAST(n - k AS DOUBLE)) - slnv)
          |               / (1.0 + (sinv - 1.0 / CAST(n - k AS DOUBLE))
          |                        / (3.0 * CAST(k - 1 AS DOUBLE))), 6)
          |       END AS bartlett_t
          |FROM t ORDER BY k""".stripMargin,


      // 8 unrolled half-step CTEs (row scale then column scale × 4
      // rounds), each mirroring Inference.ipfRake's
      // w · ((1/target)/marginal) op for op
      "q_ipf_rake" -> {
        val steps = (1 to 4).flatMap { i =>
          val prevR = if (i == 1) "w0" else s"b${i - 1}"
          Seq(
            s"""a$i AS (
               |  SELECT r, c, n, nr, nc,
               |         w * ((1.0 / CAST(nr AS DOUBLE))
               |              / sum(w) OVER (PARTITION BY r)) AS w
               |  FROM $prevR)""".stripMargin,
            s"""b$i AS (
               |  SELECT r, c, n, nr, nc,
               |         w * ((1.0 / CAST(nc AS DOUBLE))
               |              / sum(w) OVER (PARTITION BY c)) AS w
               |  FROM a$i)""".stripMargin)
        }.mkString(",\n")
        s"""WITH oc AS (
           |  SELECT c_mktsegment AS r, o_orderpriority AS c
           |  FROM orders JOIN customer ON o_custkey = c_custkey),
           |cells AS (
           |  SELECT r, c, count(*)::BIGINT AS n FROM oc GROUP BY 1, 2),
           |dims AS (
           |  SELECT CAST(count(DISTINCT r) AS BIGINT) AS nr,
           |         CAST(count(DISTINCT c) AS BIGINT) AS nc,
           |         CAST(sum(n) AS BIGINT) AS nt
           |  FROM cells),
           |w0 AS (
           |  SELECT r, c, n, nr, nc,
           |         CAST(n AS DOUBLE) / CAST(nt AS DOUBLE) AS w
           |  FROM cells CROSS JOIN dims),
           |$steps
           |SELECT r, c, n, round(w, 6) AS weight
           |FROM b4 ORDER BY r, c""".stripMargin
      },


      // per-segment + pooled slope from one power-sum pass; flip flags
      // compare the ROUNDED slopes exactly as Inference.simpsonScreen
      "q_simpson" ->
        """WITH li AS (
          |  SELECT l_returnflag AS seg,
          |         CAST(floor(l_quantity) AS BIGINT) AS x,
          |         CAST(floor(l_extendedprice) AS BIGINT) AS y
          |  FROM lineitem),
          |g AS (
          |  SELECT seg, CAST(count(*) AS BIGINT) AS n,
          |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
          |         CAST(sum(x * x) AS BIGINT) AS sxx,
          |         CAST(sum(x * y) AS BIGINT) AS sxy
          |  FROM li GROUP BY 1),
          |p AS (
          |  SELECT CAST(sum(n) AS BIGINT) AS pn, CAST(sum(sx) AS BIGINT)
          |           AS psx,
          |         CAST(sum(sy) AS BIGINT) AS psy,
          |         CAST(sum(sxx) AS BIGINT) AS psxx,
          |         CAST(sum(sxy) AS BIGINT) AS psxy
          |  FROM g),
          |sl AS (
          |  SELECT seg, n,
          |         CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
          |                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
          |              THEN round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          |                          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          |                         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
          |                            - CAST(sx AS DOUBLE)
          |                              * CAST(sx AS DOUBLE)), 6)
          |         END AS slope_seg,
          |         CASE WHEN CAST(pn AS DOUBLE) * CAST(psxx AS DOUBLE)
          |                   - CAST(psx AS DOUBLE) * CAST(psx AS DOUBLE) > 0
          |              THEN round((CAST(pn AS DOUBLE) * CAST(psxy AS DOUBLE)
          |                          - CAST(psx AS DOUBLE)
          |                            * CAST(psy AS DOUBLE))
          |                         / (CAST(pn AS DOUBLE)
          |                            * CAST(psxx AS DOUBLE)
          |                            - CAST(psx AS DOUBLE)
          |                              * CAST(psx AS DOUBLE)), 6)
          |         END AS slope_pooled
          |  FROM g CROSS JOIN p),
          |fl AS (
          |  SELECT seg, n, slope_seg, slope_pooled,
          |         slope_seg IS NOT NULL AND slope_pooled IS NOT NULL AND
          |         ((slope_seg > 0 AND slope_pooled < 0) OR
          |          (slope_seg < 0 AND slope_pooled > 0)) AS sign_flip
          |  FROM sl)
          |SELECT seg, n, slope_seg, slope_pooled, sign_flip,
          |       min(CAST(sign_flip AS INTEGER)) OVER () = 1 AS all_flip
          |FROM fl ORDER BY seg""".stripMargin,


      // same conditional power sums as q_ab_ttest; pinned z literals
      // mirror Inference.mdePower op for op
      "q_mde" ->
        """WITH e AS (
          |  SELECT event_type, CAST(user_id % 2 AS INTEGER) AS arm,
          |         CAST(floor(value * 100) AS BIGINT) AS x
          |  FROM events),
          |g AS (
          |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
          |         CAST(sum(x) AS BIGINT) AS s,
          |         CAST(sum(x * x) AS BIGINT) AS ss,
          |         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
          |           AS n0,
          |         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
          |           AS n1
          |  FROM e GROUP BY 1),
          |h AS (
          |  SELECT event_type, n, n0, n1,
          |         (CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
          |          - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
          |         / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)) AS v,
          |         CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean
          |  FROM g),
          |m AS (
          |  SELECT event_type, n, n0, n1, v, mean,
          |         (1.959963984540054 + 0.8416212335729143)
          |           * sqrt(v * (1.0 / CAST(n0 AS DOUBLE)
          |                       + 1.0 / CAST(n1 AS DOUBLE))) AS mde
          |  FROM h)
          |SELECT event_type, n0, n1,
          |       CASE WHEN n >= 2 AND v > 0 THEN round(sqrt(v), 6) END AS sd,
          |       CASE WHEN n0 >= 1 AND n1 >= 1 AND n >= 2 AND v > 0
          |            THEN round(mde, 6) END AS mde_abs,
          |       CASE WHEN n0 >= 1 AND n1 >= 1 AND n >= 2 AND v > 0
          |                 AND mean <> 0.0
          |            THEN round(mde / abs(mean), 6) END AS mde_rel
          |FROM m ORDER BY event_type""".stripMargin,


      "q_group_regression" ->
        """WITH s AS (
          |  SELECT l_returnflag,
          |         CAST(l_quantity AS BIGINT) AS x,
          |         CAST(floor(l_extendedprice) AS BIGINT) AS y
          |  FROM lineitem),
          |g AS (
          |  SELECT l_returnflag, count(*) AS n,
          |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
          |         CAST(sum(x * y) AS BIGINT) AS sxy,
          |         CAST(sum(x * x) AS BIGINT) AS sxx,
          |         CAST(sum(y * y) AS BIGINT) AS syy
          |  FROM s GROUP BY 1),
          |h AS (
          |  SELECT l_returnflag, n,
          |         CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS cov_n,
          |         CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS varx_n,
          |         CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS vary_n,
          |         CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
          |  FROM g)
          |SELECT l_returnflag, n,
          |       round(cov_n / varx_n, 6) AS slope,
          |       round(syd / CAST(n AS DOUBLE) - (cov_n / varx_n) * sxd / CAST(n AS DOUBLE), 6) AS intercept,
          |       round(cov_n * cov_n / (varx_n * vary_n), 6) AS r2
          |FROM h ORDER BY l_returnflag""".stripMargin,


      "q_mutual_info" ->
        """WITH j AS (
          |  SELECT lang, source, count(*) AS nxy FROM documents GROUP BY 1, 2),
          |mx AS (SELECT lang, CAST(sum(nxy) AS BIGINT) AS nx FROM j GROUP BY 1),
          |my AS (SELECT source, CAST(sum(nxy) AS BIGINT) AS ny FROM j GROUP BY 1),
          |tot AS (SELECT CAST(sum(nxy) AS BIGINT) AS n FROM j),
          |c AS (
          |  SELECT j.lang, j.nxy,
          |         CAST(nxy AS DOUBLE) / CAST(n AS DOUBLE)
          |           * ln(CAST(nxy AS DOUBLE) * CAST(n AS DOUBLE)
          |                / CAST(nx * ny AS DOUBLE)) AS contrib
          |  FROM j JOIN mx USING (lang) JOIN my USING (source) CROSS JOIN tot)
          |SELECT lang, count(*) AS n_cells, CAST(sum(nxy) AS BIGINT) AS nx,
          |       round(sum(contrib), 6) AS mi_part
          |FROM c GROUP BY lang ORDER BY lang""".stripMargin,


      "q_conformal" ->
        """WITH r AS (
          |  SELECT c_mktsegment,
          |         instr('0123456789abcdef', substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)) - 1 AS b,
          |         CAST(floor(o_totalprice * 100) AS BIGINT) AS y
          |  FROM orders JOIN customer ON o_custkey = c_custkey),
          |s AS (SELECT c_mktsegment,
          |             CASE WHEN b < 13 THEN 'train' WHEN b < 15 THEN 'val' ELSE 'test' END AS split,
          |             y
          |      FROM r),
          |m AS (SELECT c_mktsegment, count(*) AS n_train,
          |             CAST(sum(y) AS BIGINT) // count(*) AS y_hat
          |      FROM s WHERE split = 'train' GROUP BY 1),
          |q AS (SELECT s.c_mktsegment, CAST(quantile_disc(abs(y - y_hat), 0.9) AS BIGINT) AS qhat
          |      FROM s JOIN m ON s.c_mktsegment = m.c_mktsegment
          |      WHERE split = 'val' GROUP BY 1),
          |tst AS (SELECT s.c_mktsegment, count(*) AS n_test,
          |               count(*) FILTER (WHERE abs(y - y_hat) <= qhat) AS covered
          |        FROM s JOIN m ON s.c_mktsegment = m.c_mktsegment
          |        JOIN q ON s.c_mktsegment = q.c_mktsegment
          |        WHERE split = 'test' GROUP BY 1)
          |SELECT m.c_mktsegment, n_train, y_hat, qhat, n_test, covered,
          |       (covered * 10000) // n_test AS coverage_bp
          |FROM m JOIN q ON m.c_mktsegment = q.c_mktsegment
          |JOIN tst ON m.c_mktsegment = tst.c_mktsegment
          |ORDER BY m.c_mktsegment""".stripMargin,


      "q_ks_test" ->
        """WITH e AS (
          |  SELECT CAST(user_id % 2 AS INTEGER) AS arm,
          |         CAST(floor(value * 100) AS BIGINT) AS v
          |  FROM events),
          |cells AS (
          |  SELECT v,
          |         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
          |         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
          |  FROM e GROUP BY 1),
          |cdf AS (
          |  SELECT CAST(sum(c0) OVER wv AS DOUBLE) / CAST(sum(c0) OVER () AS DOUBLE)
          |           - CAST(sum(c1) OVER wv AS DOUBLE) / CAST(sum(c1) OVER () AS DOUBLE) AS gap,
          |         CAST(sum(c0) OVER () AS BIGINT) AS n0,
          |         CAST(sum(c1) OVER () AS BIGINT) AS n1
          |  FROM cells
          |  WINDOW wv AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
          |k AS (
          |  SELECT n0, n1, round(max(abs(gap)), 6) AS ks_stat
          |  FROM cdf GROUP BY 1, 2)
          |SELECT n0, n1, ks_stat,
          |       round(1.358 * sqrt(CAST(n0 + n1 AS DOUBLE) / CAST(n0 * n1 AS DOUBLE)), 6) AS crit_05,
          |       ks_stat > round(1.358 * sqrt(CAST(n0 + n1 AS DOUBLE) / CAST(n0 * n1 AS DOUBLE)), 6) AS reject_05
          |FROM k ORDER BY n0""".stripMargin,


      "q_woe_iv" ->
        """WITH c AS (
          |  SELECT CAST(floor(value / 10) AS BIGINT) AS bin,
          |         CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS g,
          |         CAST(sum(CASE WHEN user_id % 2 = 1 THEN 0 ELSE 1 END) AS BIGINT) AS b
          |  FROM events GROUP BY 1),
          |t AS (SELECT CAST(sum(g) AS BIGINT) AS gt, CAST(sum(b) AS BIGINT) AS bt FROM c)
          |SELECT bin, g, b,
          |       round(ln(((g + 0.5) / gt) / ((b + 0.5) / bt)), 6) AS woe,
          |       round((((g + 0.5) / gt) - ((b + 0.5) / bt))
          |             * ln(((g + 0.5) / gt) / ((b + 0.5) / bt)), 6) AS iv_part
          |FROM c, t ORDER BY bin""".stripMargin,


      // per-cell contributions quantized to nano-units before the SUM
      // (exact longs — accumulation-order-free), mirroring
      // Inference.chi2's fixed-point discipline
      "q_chi2_test" ->
        """WITH joint AS (
          |  SELECT event_type AS x, user_id % 2 AS y, count(*)::BIGINT AS nxy
          |  FROM events GROUP BY 1, 2),
          |mx AS (SELECT x, CAST(sum(nxy) AS BIGINT) AS nx FROM joint GROUP BY 1),
          |my AS (SELECT y, CAST(sum(nxy) AS BIGINT) AS ny FROM joint GROUP BY 1),
          |tot AS (SELECT CAST(sum(nxy) AS BIGINT) AS n,
          |               CAST(count(DISTINCT x) AS BIGINT) AS dx,
          |               CAST(count(DISTINCT y) AS BIGINT) AS dy FROM joint),
          |cells AS (
          |  SELECT n, dx, dy,
          |         CAST(round((CAST(COALESCE(nxy, 0) AS DOUBLE) - CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE) / CAST(n AS DOUBLE))
          |              * (CAST(COALESCE(nxy, 0) AS DOUBLE) - CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE) / CAST(n AS DOUBLE))
          |              / (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE) / CAST(n AS DOUBLE)) * 1e9) AS BIGINT) AS c9
          |  FROM mx CROSS JOIN my LEFT JOIN joint USING (x, y), tot),
          |s AS (SELECT n, dx, dy, CAST(sum(c9) AS BIGINT) AS chi9
          |      FROM cells GROUP BY 1, 2, 3)
          |SELECT n, (dx - 1) * (dy - 1) AS dof,
          |       round(CAST(chi9 AS DOUBLE) / 1e9, 6) AS chi2_stat,
          |       round(sqrt(CAST(chi9 AS DOUBLE) / 1e9 /
          |             (CAST(n AS DOUBLE) * CAST(least(dx - 1, dy - 1) AS DOUBLE))), 6) AS cramers_v
          |FROM s ORDER BY n""".stripMargin,


      // integer rank-weighted numerator; one final division
      "q_gini_mixture" ->
        """WITH c AS (SELECT source, count(*)::BIGINT AS x FROM documents GROUP BY 1),
          |r AS (SELECT x,
          |             CAST(2 * row_number() OVER (ORDER BY x, source) AS BIGINT) * x AS ix2
          |      FROM c),
          |s AS (SELECT count(*)::BIGINT AS n_sources, CAST(sum(x) AS BIGINT) AS total_docs,
          |             CAST(sum(ix2) AS BIGINT) AS s_ix2 FROM r)
          |SELECT n_sources, total_docs,
          |       round(CAST(s_ix2 - (n_sources + 1) * total_docs AS DOUBLE) /
          |             CAST(n_sources * total_docs AS DOUBLE), 6) AS gini
          |FROM s""".stripMargin,


      // exact integer EMD numerator over the zero-filled group x value
      // grid; one final division — the Privacy.tClosenessGroups math
      "q_t_closeness" ->
        """WITH cells AS (
          |  SELECT l_returnflag AS rf, l_linestatus AS ls,
          |         CAST(l_quantity AS INTEGER) // 10 AS sv,
          |         CAST(count(*) AS BIGINT) AS cnt
          |  FROM lineitem GROUP BY 1, 2, 3),
          |gv AS (SELECT sv, CAST(sum(cnt) AS BIGINT) AS gcnt FROM cells GROUP BY sv),
          |gc AS (SELECT sv, CAST(sum(gcnt) OVER (ORDER BY sv
          |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS gcum
          |       FROM gv),
          |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS big_n,
          |               CAST(count(DISTINCT sv) AS BIGINT) AS m FROM cells),
          |grp AS (SELECT rf, ls, CAST(sum(cnt) AS BIGINT) AS n FROM cells GROUP BY 1, 2),
          |grid AS (
          |  SELECT g.rf, g.ls, g.n, v.sv,
          |         CAST(sum(coalesce(c.cnt, 0)) OVER (PARTITION BY g.rf, g.ls
          |           ORDER BY v.sv ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |           AS BIGINT) AS gcum_grp
          |  FROM grp g CROSS JOIN (SELECT sv FROM gv) v
          |  LEFT JOIN cells c ON c.rf = g.rf AND c.ls = g.ls AND c.sv = v.sv)
          |SELECT grid.rf AS l_returnflag, grid.ls AS l_linestatus, grid.n,
          |       CAST(sum(abs(gcum_grp * tt.big_n - gc.gcum * grid.n)) AS BIGINT) AS t_num,
          |       round(CAST(sum(abs(gcum_grp * tt.big_n - gc.gcum * grid.n)) AS DOUBLE) /
          |             CAST(grid.n * tt.big_n * (tt.m - 1) AS DOUBLE), 6) AS t
          |FROM grid JOIN gc USING (sv) CROSS JOIN tot tt
          |GROUP BY grid.rf, grid.ls, grid.n, tt.big_n, tt.m
          |ORDER BY l_returnflag, l_linestatus""".stripMargin,


      // md5-ranked per-stratum top-5 — the deterministic reservoir
      "q_stratified_k" ->
        """SELECT o_orderpriority, o_orderkey, rn FROM (
          |  SELECT o_orderpriority, o_orderkey,
          |         CAST(row_number() OVER (PARTITION BY o_orderpriority
          |           ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey) AS INTEGER) AS rn
          |  FROM orders) WHERE rn <= 5
          |ORDER BY o_orderpriority, rn""".stripMargin,


      // tie-aware rank-sum AUC: u2 = Σ np·(2·cum_neg_below + nn) over
      // the distinct-score grid — every term an exact long, one
      // division at the end (mirrors Inference.rocAuc)
      "q_roc_auc" ->
        """WITH sc AS (
          |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS s,
          |         (user_id % 3 = 0) AS y
          |  FROM events),
          |bys AS (
          |  SELECT event_type, s,
          |         sum(CASE WHEN y THEN 1 ELSE 0 END) AS np,
          |         sum(CASE WHEN y THEN 0 ELSE 1 END) AS nn
          |  FROM sc GROUP BY 1, 2),
          |cum AS (
          |  SELECT event_type, s, np, nn,
          |         COALESCE(sum(nn) OVER (PARTITION BY event_type ORDER BY s
          |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cnb
          |  FROM bys)
          |SELECT event_type,
          |       CAST(sum(np) AS BIGINT) AS n_pos,
          |       CAST(sum(nn) AS BIGINT) AS n_neg,
          |       CAST(sum(np * (2 * cnb + nn)) AS BIGINT) AS u2,
          |       round(CAST(sum(np * (2 * cnb + nn)) AS DOUBLE) /
          |             nullif(2.0 * sum(np) * sum(nn), 0), 6) AS auc
          |FROM cum GROUP BY 1 ORDER BY 1""".stripMargin,


      // descending-bucket sweep: tp/fp cumulative from the top of the
      // score grid, precision/recall one division per point (mirrors
      // Inference.prCurve)
      "q_pr_curve" ->
        """WITH sc AS (
          |  SELECT event_type, CAST(round(value * 100) AS BIGINT) // 5000 AS b,
          |         (user_id % 3 = 0) AS y
          |  FROM events),
          |byb AS (
          |  SELECT event_type, b,
          |         sum(CASE WHEN y THEN 1 ELSE 0 END) AS np,
          |         sum(CASE WHEN y THEN 0 ELSE 1 END) AS nn
          |  FROM sc GROUP BY 1, 2),
          |cum AS (
          |  SELECT event_type, b AS bucket,
          |         sum(np) OVER (PARTITION BY event_type ORDER BY b DESC
          |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
          |         sum(nn) OVER (PARTITION BY event_type ORDER BY b DESC
          |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fp,
          |         sum(np) OVER (PARTITION BY event_type) AS p_tot
          |  FROM byb)
          |SELECT event_type, bucket,
          |       CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
          |       round(CAST(tp AS DOUBLE) / (tp + fp), 6) AS precision,
          |       round(CAST(tp AS DOUBLE) / nullif(p_tot, 0), 6) AS recall
          |FROM cum ORDER BY event_type, bucket""".stripMargin,


      // BH sweep mirrored: per-brand sign-test z from exact counts,
      // logistic-CDF p (the stated approximation contract), rank by
      // (p, brand), reversed running min of m·p/rank clamped at 1,
      // reject from the ROUNDED adjusted p
      "q_fdr_bh" ->
        """WITH hyp AS (
          |  SELECT p_brand, count(*) AS n,
          |         sum(CASE WHEN CAST(round(p_retailprice * 100) AS BIGINT) % 2 = 0
          |                  THEN 1 ELSE 0 END) AS x
          |  FROM part GROUP BY 1),
          |pv AS (
          |  SELECT p_brand,
          |         2.0 / (1.0 + exp(1.702 * abs((2.0 * x - n) / sqrt(CAST(n AS DOUBLE))))) AS p
          |  FROM hyp),
          |ranked AS (
          |  SELECT p_brand, p,
          |         CAST(count(*) OVER () AS BIGINT) AS m,
          |         CAST(row_number() OVER (ORDER BY p, p_brand) AS INTEGER) AS rank
          |  FROM pv),
          |adj AS (
          |  SELECT p_brand, p, rank,
          |         least(1.0, min(m * p / rank) OVER (ORDER BY rank
          |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) AS p_adj
          |  FROM ranked)
          |SELECT p_brand, round(p, 6) AS p, rank,
          |       round(p_adj, 6) AS p_adj,
          |       (round(p_adj, 6) <= 0.05) AS reject
          |FROM adj ORDER BY rank""".stripMargin,


      // SPRT on the integer spine k = 2·ups − t: cross at |k| ≥ 8 (the
      // α=β=0.05 Wald boundary for 0.6-vs-0.4), decision from the
      // first-crossing struct, llr scales k by the shared ln(1.5)
      // literal
      "q_sprt" ->
        """WITH daily AS (
          |  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
          |         CAST(round(round(sum(value), 2) * 100) AS BIGINT) AS c
          |  FROM events GROUP BY 1, date_trunc('day', ts)),
          |steps AS (
          |  SELECT event_type, day, c,
          |         lag(c) OVER (PARTITION BY event_type ORDER BY day) AS prev
          |  FROM daily),
          |ks AS (
          |  SELECT event_type, day,
          |         CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS t,
          |         2 * sum(CASE WHEN c > prev THEN 1 ELSE 0 END)
          |               OVER (PARTITION BY event_type ORDER BY day
          |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |           - CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS k
          |  FROM steps WHERE prev IS NOT NULL),
          |crs AS (
          |  SELECT event_type, min(t) AS cross_t
          |  FROM ks WHERE abs(k) >= 8 GROUP BY 1),
          |fin AS (
          |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_steps,
          |         max_by(k, t) AS k_final
          |  FROM ks GROUP BY 1)
          |SELECT f.event_type, f.n_steps,
          |       CAST(c.cross_t AS BIGINT) AS cross_t,
          |       CAST(kx.k AS BIGINT) AS k_cross,
          |       CASE WHEN c.cross_t IS NULL THEN 'continue'
          |            WHEN kx.k >= 8 THEN 'accept_h1'
          |            ELSE 'accept_h0' END AS decision,
          |       round(f.k_final * 0.4054651081081644, 6) AS llr_final
          |FROM fin f
          |LEFT JOIN crs c ON c.event_type = f.event_type
          |LEFT JOIN ks kx ON kx.event_type = f.event_type AND kx.t = c.cross_t
          |ORDER BY f.event_type""".stripMargin,


      // coincidence-mass clearing: per-unit off-diagonal mass
      // 12·(m²−Σn_uc²)/(m−1) summed as exact integers; marginals over
      // qualifying units; one division (mirrors
      // Inference.krippendorffAlpha)
      "q_krippendorff" ->
        """WITH ratings AS (
          |  SELECT user_id % 500 AS unit, event_type AS rater,
          |         least(min(CAST(round(value * 100) AS BIGINT)) // 10000, 3) AS cat
          |  FROM events GROUP BY 1, 2),
          |peruc AS (
          |  SELECT unit, cat, CAST(count(*) AS BIGINT) AS nuc
          |  FROM ratings GROUP BY 1, 2),
          |peru AS (
          |  SELECT unit, sum(nuc) AS mu, sum(nuc * nuc) AS sq
          |  FROM peruc GROUP BY 1 HAVING sum(nuc) >= 2),
          |dobs AS (
          |  SELECT CAST(count(*) AS BIGINT) AS n_units,
          |         CAST(COALESCE(sum(mu), 0) AS BIGINT) AS n,
          |         CAST(COALESCE(sum(12 * (mu * mu - sq) / (mu - 1)), 0) AS BIGINT) AS do_scaled
          |  FROM peru),
          |marg AS (
          |  SELECT CAST(COALESCE(sum(nc * nc), 0) AS BIGINT) AS sum_nc2
          |  FROM (SELECT cat, sum(nuc) AS nc FROM peruc
          |        WHERE unit IN (SELECT unit FROM peru) GROUP BY 1))
          |SELECT n_units, n, do_scaled,
          |       CAST(n * n - sum_nc2 AS BIGINT) AS de_num,
          |       round(1.0 - CAST((n - 1) * do_scaled AS DOUBLE) /
          |             CAST(12 * (n * n - sum_nc2) AS DOUBLE), 6) AS alpha
          |FROM dobs CROSS JOIN marg ORDER BY n_units""".stripMargin,


      // Laplace inverse CDF on the md5-seeded uniform, mirrored; 2⁵²
      // as the exact literal; clamp applied after the shared rounding
      "q_dp_counts" ->
        """WITH g AS (
          |  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
          |         CAST(count(*) AS BIGINT) AS n
          |  FROM events GROUP BY 1, 2),
          |nz AS (
          |  SELECT event_type, day, n,
          |         (CAST(('0x' || substring(md5(event_type || chr(1) || day), 1, 13)) AS BIGINT) + 0.5)
          |           / 4503599627370496.0 AS u
          |  FROM g)
          |SELECT event_type, day, n,
          |       round(-1.0 * sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5)), 6) AS noise,
          |       round(n + (-1.0 * sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5))), 6) AS dp_n,
          |       greatest(round(n + (-1.0 * sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5))), 6), 0.0) AS dp_n_clamped
          |FROM nz ORDER BY event_type, day""".stripMargin,


      // three raters per doc (gold, full-text lang-id, 16-token
      // lang-id); every kappa term an exact long — the
      // Inference.fleissKappa clearing
      "q_fleiss_kappa" ->
        s"""WITH toks AS (SELECT doc_id, lang, $sqlTokens AS l FROM documents),
           |r2 AS (
           |  SELECT doc_id, $sqlLangVoteCols
           |  FROM toks),
           |t16 AS (SELECT doc_id, lang, l[1:16] AS l FROM toks),
           |r3 AS (
           |  SELECT doc_id, $sqlLangVoteCols
           |  FROM t16),
           |assign AS (
           |  SELECT doc_id AS i, lang AS cat FROM documents
           |  UNION ALL SELECT doc_id, $sqlLangCase FROM r2
           |  UNION ALL SELECT doc_id, $sqlLangCase FROM r3),
           |cells AS (SELECT i, cat, CAST(count(*) AS BIGINT) AS nij
           |          FROM assign GROUP BY 1, 2),
           |complete AS (
           |  SELECT i, CAST(sum(nij * nij) AS BIGINT) AS sq_i
           |  FROM cells GROUP BY i HAVING sum(nij) = 3),
           |pi AS (SELECT CAST(count(*) AS BIGINT) AS n_items,
           |              CAST(coalesce(sum(sq_i), 0) AS BIGINT) AS sum_sq
           |       FROM complete),
           |pc AS (
           |  SELECT CAST(coalesce(sum(cj * cj), 0) AS BIGINT) AS b FROM (
           |    SELECT cat, CAST(sum(nij) AS BIGINT) AS cj FROM cells
           |    WHERE i IN (SELECT i FROM complete) GROUP BY cat)),
           |terms AS (
           |  SELECT n_items, sum_sq - n_items * 3 AS a,
           |         n_items * 6 AS d1, b,
           |         n_items * 3 * n_items * 3 AS d2
           |  FROM pi CROSS JOIN pc)
           |SELECT n_items, CAST(3 AS INTEGER) AS n_raters,
           |       round(CAST(a AS DOUBLE) / CAST(d1 AS DOUBLE), 6) AS p_bar,
           |       round(CAST(b AS DOUBLE) / CAST(d2 AS DOUBLE), 6) AS p_e,
           |       round(CAST(a * d2 - b * d1 AS DOUBLE) /
           |             CAST(d1 * (d2 - b) AS DOUBLE), 6) AS kappa
           |FROM terms ORDER BY n_items""".stripMargin,


      // half-unit average ranks (2r + t - 1), exact W+/W- and the
      // tie-corrected z tower — the Inference.wilcoxonSignedRank math
      "q_wilcoxon_signed" ->
        """WITH y94 AS (
          |  SELECT o_custkey, CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS c94
          |  FROM orders WHERE year(o_orderdate) = 1994 GROUP BY 1),
          |y95 AS (
          |  SELECT o_custkey, CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS c95
          |  FROM orders WHERE year(o_orderdate) = 1995 GROUP BY 1),
          |d AS (
          |  SELECT c95 - c94 AS d, abs(c95 - c94) AS ad
          |  FROM y94 JOIN y95 USING (o_custkey) WHERE c95 <> c94),
          |ranked AS (
          |  SELECT d, CAST(rank() OVER (ORDER BY ad) AS BIGINT) * 2 +
          |         CAST(count(*) OVER (PARTITION BY ad) AS BIGINT) - 1 AS rank2
          |  FROM d),
          |ties AS (
          |  SELECT CAST(coalesce(sum(t * t * t - t), 0) AS BIGINT) AS tie_cube
          |  FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM d GROUP BY ad)),
          |s AS (
          |  SELECT CAST(count(*) AS BIGINT) AS n,
          |         CAST(sum(CASE WHEN d > 0 THEN rank2 ELSE 0 END) AS BIGINT) AS w_plus2,
          |         CAST(sum(CASE WHEN d < 0 THEN rank2 ELSE 0 END) AS BIGINT) AS w_minus2
          |  FROM ranked)
          |SELECT n, w_plus2, w_minus2,
          |       CASE WHEN 2 * n * (n + 1) * (2 * n + 1) - tie_cube > 0
          |       THEN round(CAST(w_plus2 * 2 - n * (n + 1) AS DOUBLE) * sqrt(CAST(3 AS DOUBLE)) /
          |                  sqrt(CAST(2 * n * (n + 1) * (2 * n + 1) - tie_cube AS DOUBLE)), 6)
          |       END AS z
          |FROM s CROSS JOIN ties ORDER BY n""".stripMargin,


      // exact concordance/tie counts over the day-grid pair space; one
      // sqrt — the Inference.kendallTauB clearing
      "q_kendall_tau" ->
        """WITH g AS (
          |  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
          |         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS x,
          |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y
          |  FROM events GROUP BY 1),
          |p AS (
          |  SELECT sign(b.x - a.x) AS sx, sign(b.y - a.y) AS sy
          |  FROM g a JOIN g b ON a.day < b.day),
          |s AS (
          |  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
          |         CAST(sum(CASE WHEN sx * sy > 0 THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
          |         CAST(sum(CASE WHEN sx * sy < 0 THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
          |         CAST(sum(CASE WHEN sx = 0 AND sy <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS ties_x,
          |         CAST(sum(CASE WHEN sy = 0 AND sx <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS ties_y,
          |         CAST(sum(CASE WHEN sx = 0 AND sy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ties_xy
          |  FROM p)
          |SELECT n_pairs, concordant, discordant, ties_x, ties_y, ties_xy,
          |       CASE WHEN n_pairs - ties_x - ties_xy > 0 AND n_pairs - ties_y - ties_xy > 0
          |       THEN round(CAST(concordant - discordant AS DOUBLE) /
          |                  sqrt(CAST(n_pairs - ties_x - ties_xy AS DOUBLE) *
          |                       CAST(n_pairs - ties_y - ties_xy AS DOUBLE)), 6)
          |       END AS tau_b
          |FROM s ORDER BY n_pairs""".stripMargin,


      // the q_ndcg bucket/top-3 CTEs rolled up: AP/RR cleared to exact
      // 36ths/6ths per query, three divisions total
      "q_map_mrr" ->
        s"""WITH b AS (
           |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
           |         CAST(${sqlHyperplaneBucket("embedding")} AS INTEGER) AS bucket
           |  FROM embeddings),
           |s AS (
           |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           |         list_cosine_similarity(c.v, q.v) AS c
           |  FROM b c JOIN b q ON c.bucket = q.bucket AND c.vec_id <> q.vec_id
           |  WHERE q.vec_id < 8),
           |tk AS (
           |  SELECT query_id, neighbor_id,
           |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS INTEGER) AS rank
           |  FROM s QUALIFY rank <= 3),
           |rel AS (
           |  SELECT tk.query_id, tk.rank,
           |         CAST(CASE WHEN ql.label = nl.label THEN 1 ELSE 0 END AS BIGINT) AS rel
           |  FROM tk JOIN embeddings ql ON ql.vec_id = tk.query_id
           |          JOIN embeddings nl ON nl.vec_id = tk.neighbor_id),
           |relc AS (
           |  SELECT query_id, rank, rel,
           |         CAST(sum(rel) OVER (PARTITION BY query_id ORDER BY rank
           |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
           |  FROM rel),
           |perq AS (
           |  SELECT query_id, CAST(sum(rel) AS BIGINT) AS n_rel,
           |         CAST(sum(rel * cum *
           |              CASE rank WHEN 1 THEN 6 WHEN 2 THEN 3 ELSE 2 END) AS BIGINT) AS ap18,
           |         min(CASE WHEN rel = 1 THEN rank END) AS first_rel
           |  FROM relc GROUP BY query_id),
           |scored AS (
           |  SELECT query_id,
           |         CASE WHEN n_rel > 0 THEN (ap18 * 6) // n_rel ELSE 0 END AS ap36,
           |         coalesce(6 // first_rel, 0) AS rr6, first_rel
           |  FROM perq)
           |SELECT CAST(count(*) AS BIGINT) AS n_queries,
           |       CAST(sum(ap36) AS BIGINT) AS sum_ap36,
           |       CAST(sum(rr6) AS BIGINT) AS sum_rr6,
           |       CAST(count(first_rel) AS BIGINT) AS n_hit,
           |       round(CAST(sum(ap36) AS DOUBLE) / CAST(count(*) * 36 AS DOUBLE), 6) AS map3,
           |       round(CAST(sum(rr6) AS DOUBLE) / CAST(count(*) * 6 AS DOUBLE), 6) AS mrr3,
           |       round(CAST(count(first_rel) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS hit_rate
           |FROM scored ORDER BY n_queries""".stripMargin,


      // expected proportions are the SAME driver-computed literals the
      // Spark plan carries — no engine log10 in either query
      // p literals go through a STRING->DOUBLE cast: DuckDB parses a bare
      // decimal literal as DECIMAL and its decimal->double conversion is
      // one IEEE division (not a correctly-rounded parse) — 1 ulp off
      // the Scala literal for digit 3. varchar->double parses exactly.
      "q_benford" -> {
        val grid = (1 to 9)
          .map(d => s"(${d}, CAST('${math.log10(1.0 + 1.0 / d)}' AS DOUBLE))")
          .mkString(", ")
        s"""WITH counts AS (
           |  SELECT CAST(substr(CAST(CAST(floor(l_extendedprice) AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit,
           |         count(*) AS n_obs
           |  FROM lineitem WHERE CAST(floor(l_extendedprice) AS BIGINT) > 0
           |  GROUP BY 1),
           |grid AS (SELECT d AS digit, CAST(p AS DOUBLE) AS p
           |         FROM (VALUES $grid) t(d, p)),
           |tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM counts)
           |SELECT g.digit, CAST(coalesce(c.n_obs, 0) AS BIGINT) AS n_obs,
           |       t.n AS n, g.p AS expected_p,
           |       CAST(round((coalesce(c.n_obs, 0) - t.n * g.p) *
           |                  (coalesce(c.n_obs, 0) - t.n * g.p) /
           |                  (t.n * g.p) * 1e9, 0) AS BIGINT) AS chi2_nano
           |FROM grid g LEFT JOIN counts c ON c.digit = g.digit CROSS JOIN tot t
           |ORDER BY g.digit""".stripMargin
      },


      // classifier score CTEs identical to q_quality_classifier; bins
      // cut on the round-6 score (hash-stable), stats from exact counts
      // and micro-quantized prediction sums
      "q_calibration" ->
        """WITH toks AS (
          |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS l
          |  FROM documents),
          |f AS (
          |  SELECT doc_id,
          |         CAST(('0x' || substring(md5('f:' || t), 1, 8)) AS BIGINT) % 1024 AS bucket
          |  FROM (SELECT doc_id, unnest(l) AS t FROM toks)),
          |m AS (
          |  SELECT i AS bucket,
          |         (CAST(('0x' || substring(md5('w:' || CAST(i AS VARCHAR)), 1, 8)) AS BIGINT) % 2001 - 1000) / 1000.0 AS w
          |  FROM range(1024) r(i)),
          |z AS (
          |  SELECT doc_id, sum(w) / count(*) AS mean_w
          |  FROM f JOIN m USING (bucket) GROUP BY 1),
          |s AS (
          |  SELECT t.doc_id,
          |         round(1.0 / (1.0 + exp(-8.0 * coalesce(z.mean_w, 0.0))), 6) AS r
          |  FROM toks t LEFT JOIN z USING (doc_id)),
          |lab AS (
          |  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
          |  FROM documents),
          |b AS (
          |  SELECT least(CAST(floor(r * 10) AS BIGINT), 9) AS bin, pos,
          |         CAST(floor(r * 1000000 + 0.5) AS BIGINT) AS sq
          |  FROM s JOIN lab USING (doc_id))
          |SELECT CAST(bin AS INTEGER) AS bin, count(*) AS n,
          |       CAST(sum(pos) AS BIGINT) AS n_pos,
          |       round(CAST(sum(sq) AS DOUBLE) / count(*) / 1000000.0, 6) AS mean_pred,
          |       round(CAST(sum(pos) AS DOUBLE) / count(*), 6) AS obs_rate
          |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,


      "q_pseudonymize" ->
        """SELECT md5('pepper:' || CAST(user_id AS VARCHAR)) AS user_token,
          |       count(*) AS n_events,
          |       count(DISTINCT event_type) AS n_types,
          |       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
          |FROM events GROUP BY 1
          |ORDER BY n_events DESC, user_token LIMIT 25""".stripMargin,


      "q_k_anonymity" ->
        """WITH g AS (
          |  SELECT event_type, strftime(ts, '%Y-%m-%d %H') AS qh, count(*) AS n
          |  FROM events GROUP BY 1, 2)
          |SELECT event_type, count(*) AS n_groups,
          |       count(CASE WHEN n < 5 THEN 1 END) AS n_violating,
          |       CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT) AS rows_at_risk,
          |       CAST(min(n) AS BIGINT) AS min_group
          |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,


      // Q = Σ(S − n·x)² over HUGEINT (squares overflow int64); the
      // final sqrt/division tower mirrors the Spark expression exactly
      "q_jackknife" ->
        """WITH grid AS (
          |  SELECT l_returnflag, strftime(l_shipdate, '%Y-%m') AS ym,
          |         CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)) AS BIGINT)) AS BIGINT) AS rev
          |  FROM lineitem GROUP BY 1, 2),
          |tot AS (
          |  SELECT l_returnflag, count(*) AS n, CAST(sum(rev) AS BIGINT) AS s
          |  FROM grid GROUP BY 1),
          |d AS (
          |  SELECT g.l_returnflag, t.n, t.s,
          |         CAST(t.s - t.n * g.rev AS HUGEINT) AS dd
          |  FROM grid g JOIN tot t USING (l_returnflag)),
          |q AS (SELECT l_returnflag, n, s, sum(dd * dd) AS q
          |      FROM d GROUP BY 1, 2, 3)
          |SELECT l_returnflag, CAST(n AS BIGINT) AS n_periods,
          |       round(CAST(s AS DOUBLE) / n, 4) AS mean_x,
          |       round(sqrt(CAST(q AS DOUBLE) * (n - 1) / n) / (n * (n - 1)), 4)
          |         AS jack_se
          |FROM q ORDER BY l_returnflag""".stripMargin,


      "q_l_diversity" ->
        """WITH g AS (
          |  SELECT event_type, strftime(ts, '%Y-%m-%d') AS qd, count(*) AS n,
          |         count(DISTINCT user_id % 10) AS l
          |  FROM events GROUP BY 1, 2)
          |SELECT event_type, count(*) AS n_groups,
          |       count(CASE WHEN l < 3 THEN 1 END) AS n_violating,
          |       CAST(sum(CASE WHEN l < 3 THEN n ELSE 0 END) AS BIGINT) AS rows_at_risk,
          |       CAST(min(l) AS BIGINT) AS min_l
          |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,


      // same distinct-x collapse + strictly-greater-x running max as
      // ScaleOps.paretoFrontier (rows-frame valid because x is distinct)
      "q_pareto_frontier" ->
        """WITH grid AS (
          |  SELECT l_partkey,
          |         CAST(sum(l_quantity) AS BIGINT) AS tot_qty,
          |         CAST(max(floor(l_extendedprice / l_quantity * 100)) AS BIGINT) AS unit_cents
          |  FROM lineitem GROUP BY 1),
          |perx AS (SELECT tot_qty, max(unit_cents) AS best_y FROM grid GROUP BY 1),
          |reps AS (
          |  SELECT g.tot_qty, p.best_y, min(g.l_partkey) AS rep_id
          |  FROM grid g JOIN perx p ON g.tot_qty = p.tot_qty AND g.unit_cents = p.best_y
          |  GROUP BY 1, 2),
          |fr AS (
          |  SELECT rep_id, tot_qty, best_y,
          |         max(best_y) OVER (ORDER BY tot_qty DESC
          |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_best
          |  FROM reps)
          |SELECT rep_id, tot_qty, CAST(best_y AS BIGINT) AS unit_cents FROM fr
          |WHERE prev_best IS NULL OR best_y > prev_best
          |ORDER BY tot_qty DESC""".stripMargin,


      // identical md5-inverse-CDF Poisson(1) draw (integer cutpoints,
      // no float in the weight decision); CI by explicit rank
      "q_bootstrap_ci" ->
        """WITH base AS (
          |  SELECT l_returnflag,
          |         CAST(('0x' || substring(md5(
          |           CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)
          |         ), 1, 8)) AS BIGINT) AS h,
          |         CAST(floor(l_extendedprice * 100) AS BIGINT) AS xc
          |  FROM lineitem),
          |fan AS (
          |  SELECT l_returnflag, h, xc, i AS rep
          |  FROM base CROSS JOIN range(50) r(i)),
          |wt AS (
          |  SELECT l_returnflag, rep, xc,
          |         (((((h + rep * 2654435761) % 4294967296) * 1597334677) % 4294967296)
          |           * 1812433253) % 4294967296 % 1000000 AS u
          |  FROM fan),
          |wts AS (
          |  SELECT l_returnflag, rep, xc,
          |         CASE WHEN u < 367879 THEN 0 WHEN u < 735758 THEN 1
          |              WHEN u < 919698 THEN 2 WHEN u < 981011 THEN 3
          |              WHEN u < 996340 THEN 4 ELSE 5 END AS w
          |  FROM wt),
          |rm AS (
          |  SELECT l_returnflag, rep,
          |         CAST(sum(w * xc) AS DOUBLE) / CAST(sum(w) AS DOUBLE) AS m
          |  FROM wts GROUP BY 1, 2),
          |rk2 AS (
          |  SELECT l_returnflag, rep, m,
          |         row_number() OVER (PARTITION BY l_returnflag ORDER BY m, rep) AS rn
          |  FROM rm),
          |pt AS (
          |  SELECT l_returnflag, count(*) AS n_rows, CAST(sum(xc) AS BIGINT) AS sx
          |  FROM base GROUP BY 1)
          |SELECT p.l_returnflag, p.n_rows,
          |       round(CAST(sx AS DOUBLE) / n_rows, 6) AS point_mean,
          |       round(lo.m, 6) AS ci_lo, round(hi.m, 6) AS ci_hi
          |FROM pt p
          |JOIN rk2 lo ON lo.l_returnflag = p.l_returnflag AND lo.rn = 2
          |JOIN rk2 hi ON hi.l_returnflag = p.l_returnflag AND hi.rn = 49
          |ORDER BY 1""".stripMargin,


      "q_quantile_normalize" ->
        """WITH li AS (
          |  SELECT l_returnflag, l_linestatus,
          |         CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents
          |  FROM lineitem),
          |r AS (
          |  SELECT l_returnflag, l_linestatus,
          |         rank() OVER (PARTITION BY l_returnflag ORDER BY cents) AS rk,
          |         count(*) OVER (PARTITION BY l_returnflag) AS ng
          |  FROM li)
          |SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
          |       round(CAST(sum(rk) AS DOUBLE) / CAST(count(*) * (max(ng) + 1) AS DOUBLE), 6) AS mean_qnorm
          |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,


      // cleared-denominator integer kappa: exactly one float division,
      // mirrored op for op
      "q_cohen_kappa" ->
        s"""WITH toks AS (
           |  SELECT lang, $sqlTokens AS l FROM documents),
           |v AS (
           |  SELECT lang,
           |         $sqlLangVoteCols
           |  FROM toks),
           |conf AS (
           |  SELECT lang AS x, $sqlLangCase AS y, count(*) AS n
           |  FROM v GROUP BY 1, 2),
           |t AS (
           |  SELECT CAST(sum(n) AS BIGINT) AS n_tot,
           |         CAST(sum(CASE WHEN x = y THEN n ELSE 0 END) AS BIGINT) AS n_agree
           |  FROM conf),
           |r AS (SELECT x, CAST(sum(n) AS BIGINT) AS rm FROM conf GROUP BY 1),
           |c AS (SELECT y, CAST(sum(n) AS BIGINT) AS cm FROM conf GROUP BY 1),
           |p AS (
           |  SELECT COALESCE(CAST(sum(rm * cm) AS BIGINT), 0) AS pe_num
           |  FROM r JOIN c ON r.x = c.y)
           |SELECT n_tot, n_agree,
           |       round(CAST(n_agree AS DOUBLE) / CAST(n_tot AS DOUBLE), 6) AS p_observed,
           |       round(CAST(pe_num AS DOUBLE) / CAST(n_tot * n_tot AS DOUBLE), 6) AS p_expected,
           |       round(CAST(n_tot * n_agree - pe_num AS DOUBLE)
           |             / CAST(n_tot * n_tot - pe_num AS DOUBLE), 6) AS kappa
           |FROM t, p ORDER BY n_tot""".stripMargin,


      // same bucket/top-3 CTEs as q_ann_topk; discounts and ideal DCG
      // are CASE literals so no float accumulation can diverge
      "q_ndcg" ->
        s"""WITH b AS (
           |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
           |         CAST(${sqlHyperplaneBucket("embedding")} AS INTEGER) AS bucket
           |  FROM embeddings),
           |s AS (
           |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           |         list_cosine_similarity(c.v, q.v) AS c
           |  FROM b c JOIN b q ON c.bucket = q.bucket AND c.vec_id <> q.vec_id
           |  WHERE q.vec_id < 8),
           |tk AS (
           |  SELECT query_id, neighbor_id,
           |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS INTEGER) AS rank
           |  FROM s QUALIFY rank <= 3),
           |rel AS (
           |  SELECT tk.query_id, tk.rank,
           |         CASE WHEN ql.label = nl.label THEN 1 ELSE 0 END AS rel
           |  FROM tk JOIN embeddings ql ON ql.vec_id = tk.query_id
           |          JOIN embeddings nl ON nl.vec_id = tk.neighbor_id),
           |agg AS (
           |  SELECT query_id, CAST(sum(rel) AS BIGINT) AS n_rel,
           |         sum(rel * CASE rank WHEN 1 THEN CAST(1.0 AS DOUBLE)
           |                             WHEN 2 THEN 0.6309297535714574
           |                             ELSE CAST(0.5 AS DOUBLE) END) AS dcg,
           |         min(CASE WHEN rel = 1 THEN rank END) AS first_rel
           |  FROM rel GROUP BY 1)
           |SELECT query_id, n_rel, round(dcg, 6) AS dcg,
           |       round(dcg / CASE n_rel WHEN 1 THEN CAST(1.0 AS DOUBLE)
           |                              WHEN 2 THEN 1.6309297535714574
           |                              WHEN 3 THEN 2.1309297535714574
           |                              ELSE CAST(1.0 AS DOUBLE) END, 6) AS ndcg,
           |       COALESCE(round(CAST(1.0 AS DOUBLE) / first_rel, 6), 0.0) AS rr
           |FROM agg ORDER BY query_id""".stripMargin,


      // doubled midranks (minrank + peers-inclusive cumulative count)
      // keep every power sum exact; DuckDB sums promote to HUGEINT,
      // matching Spark's decimal(38,0) — both cast exactly-once to
      // double in the same tower
      "q_spearman" ->
        """WITH b AS (
          |  SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS xv,
          |         CAST(floor(l_extendedprice * 100) AS BIGINT) AS yv
          |  FROM lineitem),
          |r AS (
          |  SELECT g,
          |         rank() OVER (PARTITION BY g ORDER BY xv)
          |           + count(*) OVER (PARTITION BY g ORDER BY xv
          |               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rx,
          |         rank() OVER (PARTITION BY g ORDER BY yv)
          |           + count(*) OVER (PARTITION BY g ORDER BY yv
          |               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ry
          |  FROM b),
          |s AS (
          |  SELECT g, count(*) AS n, sum(rx) AS sx, sum(ry) AS sy,
          |         sum(rx * ry) AS sxy, sum(rx * rx) AS sxx, sum(ry * ry) AS syy
          |  FROM r GROUP BY 1)
          |SELECT g AS l_returnflag, CAST(n AS BIGINT) AS n,
          |       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
          |         round(CAST(n * sxy - sx * sy AS DOUBLE) /
          |               (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
          |                sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
          |       END AS rho
          |FROM s ORDER BY l_returnflag""".stripMargin,


      "q_corr_matrix" ->
        """WITH b AS (
          |  SELECT CAST(l_quantity AS BIGINT) AS qty,
          |         CAST(floor(l_extendedprice * 100) AS BIGINT) AS price_c,
          |         CAST(floor(l_discount * 100) AS BIGINT) AS disc_c,
          |         CAST(floor(l_tax * 100) AS BIGINT) AS tax_c
          |  FROM lineitem),
          |s AS (
          |  SELECT count(*) AS n,
          |         sum(qty) AS s_qty, sum(price_c) AS s_price,
          |         sum(disc_c) AS s_disc, sum(tax_c) AS s_tax,
          |         sum(qty * qty) AS ss_qty, sum(price_c * price_c) AS ss_price,
          |         sum(disc_c * disc_c) AS ss_disc, sum(tax_c * tax_c) AS ss_tax,
          |         sum(qty * price_c) AS sp_qp, sum(qty * disc_c) AS sp_qd,
          |         sum(qty * tax_c) AS sp_qt, sum(price_c * disc_c) AS sp_pd,
          |         sum(price_c * tax_c) AS sp_pt, sum(disc_c * tax_c) AS sp_dt
          |  FROM b),
          |p AS (
          |  SELECT 'qty' AS col_a, 'price_c' AS col_b, n, sp_qp AS sp,
          |         s_qty AS sa, s_price AS sb, ss_qty AS ssa, ss_price AS ssb FROM s
          |  UNION ALL SELECT 'qty', 'disc_c', n, sp_qd, s_qty, s_disc, ss_qty, ss_disc FROM s
          |  UNION ALL SELECT 'qty', 'tax_c', n, sp_qt, s_qty, s_tax, ss_qty, ss_tax FROM s
          |  UNION ALL SELECT 'price_c', 'disc_c', n, sp_pd, s_price, s_disc, ss_price, ss_disc FROM s
          |  UNION ALL SELECT 'price_c', 'tax_c', n, sp_pt, s_price, s_tax, ss_price, ss_tax FROM s
          |  UNION ALL SELECT 'disc_c', 'tax_c', n, sp_dt, s_disc, s_tax, ss_disc, ss_tax FROM s)
          |SELECT col_a, col_b, CAST(n AS BIGINT) AS n,
          |       CASE WHEN n * ssa - sa * sa > 0 AND n * ssb - sb * sb > 0 THEN
          |         round(CAST(n * sp - sa * sb AS DOUBLE) /
          |               (sqrt(CAST(n * ssa - sa * sa AS DOUBLE)) *
          |                sqrt(CAST(n * ssb - sb * sb AS DOUBLE))), 6)
          |       END AS corr
          |FROM p ORDER BY col_a, col_b""".stripMargin,


      "q_target_encode" ->
        """WITH g AS (
          |  SELECT source, count(*) AS n_cat, CAST(sum(n_chars) AS BIGINT) AS s_cat
          |  FROM documents GROUP BY 1)
          |SELECT doc_id AS id, source, CAST(n_chars AS BIGINT) AS t,
          |       CAST(n_cat AS BIGINT) AS n_cat,
          |       CASE WHEN n_cat > 1 THEN
          |         round(CAST(s_cat - n_chars AS DOUBLE) /
          |               CAST(n_cat - 1 AS DOUBLE), 6)
          |       END AS loo_mean
          |FROM documents JOIN g USING (source)
          |ORDER BY id""".stripMargin,


      // quantile_disc == the exact disc median Quantiles computes
      "q_impute" ->
        """WITH li AS (
          |  SELECT l_returnflag AS g,
          |         CASE WHEN (l_orderkey * 8 + l_linenumber) % 13 = 0 THEN NULL
          |              ELSE l_quantity END AS qty
          |  FROM lineitem),
          |med AS (
          |  SELECT g, quantile_disc(qty, 0.5) AS med
          |  FROM li WHERE qty IS NOT NULL GROUP BY 1)
          |SELECT li.g, count(*) AS n_rows,
          |       CAST(count(CASE WHEN qty IS NULL THEN 1 END) AS BIGINT) AS n_imputed,
          |       max(med) AS median_used,
          |       CAST(sum(CAST(floor(COALESCE(qty, med)) AS BIGINT)) AS BIGINT)
          |         AS sum_qty_filled
          |FROM li JOIN med ON li.g = med.g
          |GROUP BY 1 ORDER BY 1""".stripMargin,


      // integer cross-multiplied class boundaries — no float share
      "q_abc_analysis" ->
        """WITH rev AS (
          |  SELECT s_nationkey, l_partkey AS p,
          |         CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
          |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
          |  GROUP BY 1, 2),
          |r2 AS (
          |  SELECT n_name, p, cents,
          |         sum(cents) OVER (PARTITION BY n_name ORDER BY cents DESC, p
          |                          ROWS UNBOUNDED PRECEDING) AS cum,
          |         sum(cents) OVER (PARTITION BY n_name) AS total
          |  FROM rev JOIN nation ON n_nationkey = s_nationkey),
          |cls AS (
          |  SELECT n_name,
          |         CASE WHEN cum * 5 <= total * 4 THEN 'A'
          |              WHEN cum * 20 <= total * 19 THEN 'B'
          |              ELSE 'C' END AS abc, cents
          |  FROM r2)
          |SELECT n_name, abc, count(*) AS n_parts,
          |       CAST(sum(cents) AS BIGINT) AS cents
          |FROM cls GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

      "q_quantile_sketch" ->
        """WITH c AS (
          |  SELECT l_returnflag,
          |         CAST(floor(l_extendedprice * 100) AS BIGINT) AS c
          |  FROM lineitem),
          |bins AS (
          |  SELECT l_returnflag, c // 8192 AS bin, count(*) AS bn
          |  FROM c GROUP BY 1, 2),
          |cum AS (
          |  SELECT l_returnflag, bin, bn,
          |         sum(bn) OVER (PARTITION BY l_returnflag ORDER BY bin
          |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
          |         sum(bn) OVER (PARTITION BY l_returnflag) AS n
          |  FROM bins),
          |est AS (
          |  SELECT l_returnflag, CAST(max(n) AS BIGINT) AS n,
          |         CAST(min(CASE WHEN cum * 2 >= n THEN (bin + 1) * 8192 END) AS BIGINT) AS p50_est,
          |         CAST(min(CASE WHEN cum * 20 >= n * 19 THEN (bin + 1) * 8192 END) AS BIGINT) AS p95_est
          |  FROM cum GROUP BY 1),
          |ex AS (
          |  SELECT l_returnflag,
          |         CAST(quantile_disc(c, 0.5) AS BIGINT) AS p50_exact,
          |         CAST(quantile_disc(c, 0.95) AS BIGINT) AS p95_exact
          |  FROM c GROUP BY 1)
          |SELECT est.l_returnflag, n, p50_est, p50_exact,
          |       p50_est - p50_exact AS p50_err,
          |       p95_est, p95_exact, p95_est - p95_exact AS p95_err
          |FROM est JOIN ex ON est.l_returnflag = ex.l_returnflag
          |ORDER BY est.l_returnflag""".stripMargin,

      "q_mad_outliers" ->
        """WITH daily AS (
          |  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
          |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS c
          |  FROM events GROUP BY 1, date_trunc('day', ts)),
          |med AS (
          |  SELECT event_type, quantile_disc(c, 0.5) AS med
          |  FROM daily GROUP BY 1),
          |dev AS (
          |  SELECT d.event_type, d.c, m.med, abs(d.c - m.med) AS ad
          |  FROM daily d JOIN med m ON d.event_type = m.event_type),
          |mad AS (
          |  SELECT event_type, quantile_disc(ad, 0.5) AS mad
          |  FROM dev GROUP BY 1)
          |SELECT d.event_type, CAST(count(*) AS BIGINT) AS n_days,
          |       CAST(max(d.med) AS BIGINT) AS med_cents,
          |       CAST(max(m.mad) AS BIGINT) AS mad_cents,
          |       CAST(sum(CASE WHEN d.ad * 10000 > m.mad * 44478 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
          |FROM dev d JOIN mad m ON d.event_type = m.event_type
          |GROUP BY 1 ORDER BY 1""".stripMargin,

      "q_srm_check" ->
        """WITH arms AS (
          |  SELECT event_type, user_id,
          |         max(CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2) AS arm
          |  FROM events GROUP BY 1, 2),
          |c AS (
          |  SELECT event_type,
          |         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
          |         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
          |  FROM arms GROUP BY 1)
          |SELECT event_type, n_a, n_b,
          |       round(CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE) / (n_a + n_b), 6) AS chi2,
          |       ((n_a - n_b) * (n_a - n_b) * 100 > (n_a + n_b) * 384) AS srm_flag
          |FROM c ORDER BY event_type""".stripMargin,

      // minimal ≥90%-coverage prefix per type; the integer boundary
      // test mirrors the Spark side term for term
      "q_top_p_filter" ->
        """WITH per AS (
          |  SELECT event_type, user_id,
          |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
          |  FROM events GROUP BY 1, 2),
          |c AS (
          |  SELECT event_type, user_id, cents,
          |         COALESCE(sum(cents) OVER (PARTITION BY event_type
          |           ORDER BY cents DESC, user_id
          |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_prev,
          |         sum(cents) OVER (PARTITION BY event_type) AS total
          |  FROM per)
          |SELECT event_type, CAST(count(*) AS BIGINT) AS n_kept,
          |       CAST(sum(cents) AS BIGINT) AS kept_cents,
          |       CAST(max(total) AS BIGINT) AS total_cents,
          |       round(CAST(sum(cents) AS DOUBLE) / max(total), 6) AS kept_share
          |FROM c WHERE cum_prev * 10 < total * 9
          |GROUP BY 1 ORDER BY 1""".stripMargin,

      // md5-derived fold id mirrored exactly (first 8 hex chars as a
      // base-16 integer, mod 5)
      "q_group_kfold" ->
        """SELECT CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 5 AS fold,
          |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
          |       CAST(count(*) AS BIGINT) AS n_events,
          |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
          |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

      "q_class_weights" ->
        """WITH c AS (SELECT label, count(*) AS n FROM embeddings GROUP BY 1),
          |t AS (SELECT CAST(sum(n) AS BIGINT) AS total,
          |             CAST(count(*) AS BIGINT) AS k FROM c)
          |SELECT label, CAST(n AS BIGINT) AS n, total,
          |       round(CAST(total AS DOUBLE) / (k * n), 6) AS weight
          |FROM c, t ORDER BY label""".stripMargin,
  )
}
