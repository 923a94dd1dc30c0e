package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.qcew.{NaicsAgg, Resample, Series}
import graft.ext.{Affinity, AsofJoin, Bloom, Corpus, Dedup, EventsStream, Forecast, Graph, Inference, Multimodal, Privacy, Quantiles, ScaleOps, Sessionize, Similarity, Sketch, Spatial, StatefulOps, TextStats, TimeFill}

/** Driver contract — see SURVEY.md §7.
  *
  * Every operator shape from SURVEY.md §2 (scan/projection, fixed-width
  * parse, non-strict cast, flagship agg+suppression, dim join, anti/semi
  * join, lag-window series, top-k, unpivot, mode, distinct picklist,
  * time-period concat, resample, union, null-filters, events window) plus
  * the training-data extensions (exact/minhash/LSH/simhash/jaccard dedup,
  * cosine top-k, embedding buckets, text quality/lang-id, multimodal
  * metadata, structured streaming) is expressed as a named query over the
  * driver's testdata tables, with a matching DuckDB oracle in
  * [[oracleSql]].
  *
  * Determinism discipline: every query ends in a total `orderBy` over a
  * unique key, and every float aggregate is `round`ed identically on both
  * sides (sums of ~1e7 rounded at 1e-2..1e-6 absorb reassociation drift).
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** One-time-per-(JVM, dir) setup for q_dsv2_scan's fixed-width
    * fixture: verifies the on-disk extract still matches the live
    * lineitem table by (row count, Σ l_orderkey) and (re)exports it if
    * stale, then memoizes so warm bench runs time ONLY the DSv2 read.
    * computeIfAbsent gives per-key once-semantics under Bench's
    * single-threaded loop and Verify's sequential run alike; the value
    * is the fixture path. Thread-safe: concurrent first calls for the
    * same dir would serialize on the map entry.
    */
  private val dsv2FixtureReady =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def ensureDsv2Fixture(s: SparkSession, dir: String): String = {
    val dirKey = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val fwDir = s"${System.getProperty("java.io.tmpdir")}/graft_dsv2_$dirKey"
    dsv2FixtureReady.computeIfAbsent(fwDir, _ => {
      val liveSig = t(s, dir, "lineitem")
        .agg(count(lit(1)), sum(col("l_orderkey"))).head()
      val fresh =
        java.nio.file.Files.exists(java.nio.file.Paths.get(fwDir, "_SUCCESS")) && {
          val fix = s.read.text(fwDir)
            .select(expr("try_cast(trim(substring(value, 1, 12)) AS BIGINT)").as("okey"))
            .agg(count(lit(1)), sum(col("okey"))).head()
          fix.getLong(0) == liveSig.getLong(0) && !fix.isNullAt(1) &&
            fix.getLong(1) == liveSig.getLong(1)
        }
      if (!fresh)
        t(s, dir, "lineitem")
          .select(concat(
            rpad(col("l_orderkey").cast("string"), 12, " "),
            rpad(col("l_partkey").cast("string"), 12, " "),
            rpad(floor(col("l_quantity")).cast("string"), 8, " "),
            rpad(col("l_returnflag"), 4, " "),
            rpad(date_format(col("l_shipdate"), "yyyy-MM-dd"), 12, " ")).as("value"))
          .coalesce(2)
          .write.mode("overwrite").text(fwDir)
      fwDir
    })
  }

  /** Flagship query on sf=0.001; driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_flagship_agg")(spark, "/root/testdata/sf0.001")

  // ---- SQL-snippet builders shared with the oracles ------------------

  /** DuckDB tokenization matching [[TextStats.tokens]]: lowercased
    * whitespace split, empties dropped. Queries that consume it alias
    * the result `l` and count votes by list membership — the same
    * tokenize-once shape as the Spark side.
    */
  private val sqlTokens =
    """list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')"""

  /** Membership-count votes over the token list `l`, DuckDB form of
    * [[TextStats.langVotes]].
    */
  private def sqlVotesOver(words: Seq[String]): String = {
    val lst = words.map(w => s"'$w'").mkString(", ")
    s"COALESCE(len(list_filter(l, t -> list_contains([$lst], t))), 0)"
  }

  private def sqlLangVotes(lang: String): String =
    sqlVotesOver(TextStats.stopwords(lang))

  /** DuckDB mirror of [[TextStats.langIdFromTokens]]'s argmax with the
    * en > es > fr tie-break, over vote columns named en/es/fr.
    */
  private val sqlLangCase =
    """CASE WHEN greatest(en, es, fr) <= 0 THEN 'und'
      |            WHEN fr > greatest(en, es) THEN 'fr'
      |            WHEN es > en THEN 'es' ELSE 'en' END""".stripMargin

  /** Blocklist for q_blocklist_filter: token-normalized phrases over
    * the corpus vocabulary (two- and three-token sequences). Shared
    * verbatim by the Spark query and the DuckDB oracle's VALUES list.
    */
  private val blockPhrases = Seq(
    "fast table", "spark data", "window merge", "slow scan",
    "big vector", "key agg", "customer line", "stream batch fast")

  /** Closed date-interval predicates for q_zonemap_prune: a mix of
    * month-aligned ranges (skip whole monthly files), one misaligned
    * range (straddling files must scan), and one fully-out-of-range
    * probe. Shared by the Spark query (as epoch days) and the oracle
    * (as DATE literals).
    */
  private val zonePreds = Seq(
    ("1996q1", "1996-01-01", "1996-03-31"),
    ("1998h2", "1998-07-01", "1998-12-31"),
    ("2001", "2001-01-01", "2001-12-31"),
    ("mid1999", "1999-06-15", "1999-08-15"),
    ("pre1995", "1990-01-01", "1994-12-31"))

  /** Local-parallelism shim: the testdata parquet files are single
    * row-groups, so Spark reads each table as ONE input partition and
    * every narrow expression-heavy stage would run on 1 of 32 cores
    * until the first shuffle. On a real cluster input splits provide
    * this fan-out for free; locally an explicit repartition makes the
    * bench reflect the machine. Only applied where downstream
    * aggregates are order-insensitive-exact (ints, min/max, counts).
    * GUARDED: when the input already arrives split to ≥ parallelism
    * (a real cluster's input splits, or an upstream shuffle), this is
    * the identity — no Exchange is added, so the shim costs nothing
    * exactly where it isn't needed.
    */
  private[graft] def spread(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= par) df else df.repartition(par)
  }

  /** Synthetic uniform 2-D points for the spatial queries: two
    * independent 32-bit halves of md5(event_id), mod 10⁴ — nonlinear
    * in the id (a multiplicative hash would lattice both coords), and
    * reproducible in DuckDB by the same md5-hex-slice arithmetic.
    * The md5+conv derivation is the CPU-dense stage of every spatial
    * query, so the 8-byte id column is [[spread]] BEFORE hashing — the
    * sf1 parallelism probe showed q_spatial_nn flat (1.01× from 8→32
    * cores) because this stage inherited the single input split.
    */
  private def eventPoints(s: SparkSession, dir: String): DataFrame =
    spread(EventsStream.readEvents(s, s"$dir/events.parquet")
        .select(col("event_id")))
      .select(col("event_id"),
        (conv(substring(md5(col("event_id").cast("string")), 1, 8), 16, 10)
          .cast("long") % lit(10000L)).as("x"),
        (conv(substring(md5(col("event_id").cast("string")), 9, 8), 16, 10)
          .cast("long") % lit(10000L)).as("y"))

  /** Part co-purchase graph: symmetric edges between parts appearing in
    * the same order at least `minCount` times. The pair explode is the
    * q_assoc_rules shape — a self-equi-join on the order key, fan-out
    * bounded by basket size (~4–7 lines/order), never all-pairs — and
    * the multiplicity HAVING runs map-side-combined on the pair key.
    * Shared spine of the graph-algorithm queries (BFS, k-core).
    */
  private def coPurchasePairs(s: SparkSession, dir: String, minCount: Long): DataFrame =
    coPurchasePairsWithCount(s, dir, minCount).select("id1", "id2")

  private def coPurchaseEdges(s: SparkSession, dir: String, minCount: Long): DataFrame =
    Graph.symmetrize(coPurchasePairs(s, dir, minCount))

  /** [[coPurchasePairs]] keeping an affinity-derived integer edge COST:
    * w = 11 − min(m, 10) ∈ [1, 10] — frequently co-purchased parts are
    * "close". Long weights so [[Graph.sssp]] distances stay exact.
    * Derived from the unweighted pair graph by KEEPING its multiplicity
    * column (via [[coPurchasePairsWithCount]]) so there is exactly one
    * definition of the pair graph to drift (round-8 advice).
    */
  private def coPurchaseWeightedPairs(s: SparkSession, dir: String,
      minCount: Long): DataFrame =
    coPurchasePairsWithCount(s, dir, minCount)
      .select(col("id1"), col("id2"),
        (lit(11L) - least(col("m"), lit(10L))).as("w"))

  /** The single self-join/groupBy/HAVING pair-graph definition both
    * variants share: (id1, id2, m) with m = co-purchase multiplicity.
    */
  private def coPurchasePairsWithCount(s: SparkSession, dir: String,
      minCount: Long): DataFrame = {
    val li = spread(t(s, dir, "lineitem"))
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    li.as("a").join(li.as("b"), col("a.ok") === col("b.ok") &&
        col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("id1"), col("b.pk").as("id2"))
      .agg(count(lit(1)).as("m"))
      .filter(col("m") >= minCount)
  }

  /** DuckDB mirror of [[coPurchaseEdges]]: CTEs `p` (ordered pairs) and
    * `e` (symmetrized), shared by the graph-algorithm oracles.
    */
  private def sqlCoPurchaseCtes(minCount: Int): String =
    s"""p AS (
       |  SELECT a.l_partkey AS src, b.l_partkey AS dst
       |  FROM lineitem a JOIN lineitem b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |  GROUP BY 1, 2 HAVING count(*) >= $minCount),
       |e AS (SELECT src, dst FROM p UNION ALL SELECT dst, src FROM p)""".stripMargin

  /** DuckDB mirror of [[eventPoints]] + cell assignment + the ×9
    * neighbor-cell probe explode, shared by the spatial oracles.
    */
  private val sqlGridCtes =
    """c AS (
      |  SELECT event_id,
      |         CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 AS x,
      |         CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR)), 9, 8)) AS BIGINT) % 10000 AS y
      |  FROM events),
      |g AS (SELECT event_id, x, y, x // 8 AS cx, y // 8 AS cy FROM c),
      |o AS (SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),
      |                            (0,1),(1,-1),(1,0),(1,1)) AS t(dx, dy)),
      |pr AS (
      |  SELECT a.event_id AS id_a, a.x AS ax, a.y AS ay,
      |         a.cx + dx AS ncx, a.cy + dy AS ncy
      |  FROM g a CROSS JOIN o)""".stripMargin

  /** DuckDB mirror of [[Dedup.simhash16]]'s per-bit expression. */
  private def sqlSimhashBit(b: Int): String =
    s"(((instr('0123456789abcdef', substring(h, ${b / 4 + 1}, 1)) - 1) >> ${3 - b % 4}) % 2 * 2 - 1)"

  /** The fixed seeded hyperplanes shared by every ANN query (and
    * inlined, literal-for-literal, into the DuckDB oracles below).
    */
  private val annPlanes = Similarity.defaultPlanes(dim = 64, nPlanes = 4)

  /** DuckDB mirror of [[Similarity.planeDot]]: the same explicit
    * left-associated sum over the same double literals. Java's
    * Double.toString round-trips, so the SQL parser reconstructs
    * bit-identical plane coefficients and the IEEE arithmetic — hence
    * the sign decision — matches Spark exactly.
    */
  private def sqlPlaneDot(plane: Seq[Double], vecExpr: String): String =
    plane.zipWithIndex
      .map { case (p, j) => s"CAST($vecExpr[${j + 1}] AS DOUBLE) * $p" }
      .mkString(" + ")

  /** Shared CTE chain: gap-based sessions of `events` at a 300 s gap
    * (DuckDB mirror of [[Sessionize.sessionizeBatch]]), keyed by the
    * HIGH-CARDINALITY `user_id` — the key a real deployment uses, so
    * the per-key window sort spreads across reducers instead of
    * funneling all events through a handful of event_type partitions.
    * Ends in `sess` = (user_id, sess_id, session_start, session_end,
    * n_events). Tie rows (equal ts) are order-insensitive: their gap
    * is 0, so session membership and min/max/count agree whatever the
    * within-tie order.
    */
  private val sqlSessionCtes =
    """e AS (
      |  SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
      |  FROM events),
      |m AS (
      |  SELECT user_id, ts,
      |         CASE WHEN prev_ts IS NULL OR epoch(ts) - epoch(prev_ts) > 300 THEN 1 ELSE 0 END AS new_sess
      |  FROM e),
      |s AS (
      |  SELECT user_id, ts,
      |         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sess_id
      |  FROM m),
      |sess AS (
      |  SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id,
      |         min(ts) AS session_start, max(ts) AS session_end, count(*) AS n_events
      |  FROM s GROUP BY user_id, sess_id)""".stripMargin

  /** DuckDB mirror of [[Similarity.hyperplaneBucket]] over [[annPlanes]]. */
  private def sqlHyperplaneBucket(vecExpr: String): String =
    annPlanes.zipWithIndex
      .map { case (pl, i) =>
        s"(CASE WHEN ${sqlPlaneDot(pl, vecExpr)} >= 0 THEN ${1 << i} ELSE 0 END)" }
      .mkString(" + ")

  /** Candidate planes for the AUTO-sized ANN oracles: a 12-plane
    * prefix-consistent superset of [[annPlanes]] (defaultPlanes draws
    * sequentially from one seeded stream, so plane i is identical for
    * every requested count — the first `planesForCount(n)` of these ARE
    * the planes `planesForCorpus` derives at runtime). 12 planes covers
    * corpora to 64·2¹² ≈ 262k vectors at targetBucketSize 64 — far past
    * every driver sf; a bigger corpus would need this literal raised.
    */
  private val autoPlanes = Similarity.defaultPlanes(dim = 64, nPlanes = 12)

  /** DuckDB mirror of the auto-sized hyperplane bucket: every candidate
    * plane gated by the MEASURED plane count `nps.np` (CTE from
    * [[sqlAutoPlaneCountCte]]), so the SQL adapts to the corpus size
    * exactly like [[Similarity.planesForCorpus]].
    */
  private def sqlHyperplaneBucketAuto(vecExpr: String): String =
    autoPlanes.zipWithIndex
      .map { case (pl, i) =>
        s"(CASE WHEN nps.np >= ${i + 1} AND ${sqlPlaneDot(pl, vecExpr)} >= 0" +
          s" THEN ${1 << i} ELSE 0 END)" }
      .mkString(" + ")

  /** CTE `nps`: [[Similarity.planesForCount]] (n, targetBucketSize=64)
    * re-expressed as INTEGER thresholds — np = k ⇔ n ∈ (64·2ᵏ⁻¹, 64·2ᵏ],
    * clamped to [1, 12] — so no log/ceil float boundary can ever
    * disagree between engines (exact powers of two are the only inputs
    * where a libm log2 could straddle the ceil; integer comparison has
    * no such edge).
    */
  private val sqlAutoPlaneCountCte: String = {
    val cases = (1 to 11)
      .map(k => s"WHEN count(*) <= ${64L * (1L << k)} THEN $k")
      .mkString("\n      |  ")
    s"""nps AS (SELECT CASE
      |  $cases
      |  ELSE 12 END AS np FROM embeddings)""".stripMargin
  }

  /** Shared CTE: tokens / 3-gram shingles / 4-perm minhash signatures of
    * `documents` (DuckDB mirror of [[Dedup.minhashSignatures]]).
    */
  private val sqlMinhashCtes =
    """toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS l
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, unnest([array_to_string(l[i:i+2], ' ') for i in range(1, len(l) - 1)]) AS shingle
      |  FROM toks),
      |hs AS (SELECT doc_id, md5(shingle) AS h FROM sh),
      |sig AS (
      |  SELECT doc_id,
      |         min(substring(h, 1, 8)) AS mh0, min(substring(h, 9, 8)) AS mh1,
      |         min(substring(h, 17, 8)) AS mh2, min(substring(h, 25, 8)) AS mh3
      |  FROM hs GROUP BY doc_id)""".stripMargin

  // --------------------------------------------------------------------

  /** One entry per implemented operator from SURVEY.md §2 (+ extensions). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // S5/S6: parquet scan with projection + pushed filter
    "q_scan_prune" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .filter(col("l_quantity") > 45)
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // P1/P2: fixed-width field extraction + non-strict numeric cast
    "q_fixedwidth_parse" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(
          col("doc_id"),
          trim(substring(col("text"), 1, 12)).as("f1"),
          trim(substring(col("text"), 13, 12)).as("f2"),
          expr("try_cast(trim(substring(text, 25, 8)) AS BIGINT)").as("num"))
        .orderBy("doc_id")
    }),

    // A1/A2/P3/P4/P6: the QCEW flagship aggregate (via NaicsAgg), mapped
    // onto orders: priority-prefix plays naics4, totalprice plays wages.
    "q_flagship_agg" -> ((s, dir) => {
      // integer-valued employment inputs: the downstream avg then sums
      // exactly (< 2^53) in any order, so Spark and DuckDB agree to the
      // last bit — no rounding-boundary flakes across scale factors
      val records = t(s, dir, "orders").select(
        year(col("o_orderdate")).as("year"),
        quarter(col("o_orderdate")).as("qtr"),
        col("o_orderpriority").as("naics_code"),
        floor(col("o_totalprice")).as("first_month_employment"),
        floor(col("o_totalprice")).as("second_month_employment"),
        floor(col("o_totalprice")).as("third_month_employment"),
        floor(col("o_totalprice")).as("total_wages"))
      NaicsAgg.aggregate(records, minGroupSize = 4L)
        .select(
          col("year"), col("qtr"), col("naics4"), col("total_wages"),
          round(col("total_employment"), 4).as("total_employment"),
          col("dummy"),
          round(col("fondo_contributions"), 4).as("fondo_contributions"),
          round(col("medicare_contributions"), 4).as("medicare_contributions"),
          round(col("ssn_contributions"), 4).as("ssn_contributions"))
        .orderBy("year", "qtr", "naics4")
    }),

    // J1: broadcast dimension enrichment (customer -> nation -> region)
    "q_dim_join" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_cust"),
          round(sum("c_acctbal"), 2).as("acctbal_sum"))
        .orderBy("r_name", "n_name")
    }),

    // J2/P12: anti-join — customers with no high-value order. The
    // threshold keeps the result non-empty at every test SF (round 1's
    // plain "customers with no orders" was vacuously empty: every
    // customer in the generated data has orders).
    "q_anti_join" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_totalprice") > 250000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    }),

    // semi-join (parts that appear in lineitem)
    "q_semi_join" -> ((s, dir) => {
      t(s, dir, "part")
        .join(t(s, dir, "lineitem"),
          col("p_partkey") === col("l_partkey"), "left_semi")
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_parts"))
        .orderBy("p_brand")
    }),

    // W1: first-difference / pct-change series via lag (Series module)
    "q_window_diff" -> ((s, dir) => {
      val rev = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"),
          date_format(col("l_shipdate"), "yyyy-MM").as("ym"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("rev"))
      Series.withDiffs(rev, "rev", Seq("l_returnflag"), Seq("ym"))
        .select(col("l_returnflag"), col("ym"), col("rev"),
          round(col("rev_diff"), 2).as("rev_diff"),
          round(col("rev_diff_p"), 6).as("rev_diff_p"))
        .orderBy("l_returnflag", "ym")
    }),

    // explicit window FRAME: trailing 3-month moving average over the
    // monthly revenue series. Revenue is floored per lineitem (exact
    // int64, like q_mway_join), so the frame averages integer-valued
    // doubles — exact under ANY summation order, immune to the
    // segment-tree frame evaluation some engines use for sliding sums.
    "q_moving_avg" -> ((s, dir) => {
      val rev = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"),
          date_format(col("l_shipdate"), "yyyy-MM").as("ym"))
        .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .cast("long").as("rev"))
      val w = Window.partitionBy("l_returnflag").orderBy("ym").rowsBetween(-2, 0)
      rev.select(col("l_returnflag"), col("ym"), col("rev"),
          round(avg("rev").over(w), 4).as("rev_ma3"))
        .orderBy("l_returnflag", "ym")
    }),

    // top-k per group via row_number window
    "q_topk_window" -> ((s, dir) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select("o_orderpriority", "rnk", "o_orderkey", "o_totalprice")
        .orderBy("o_orderpriority", "rnk")
    }),

    // R1: wide->long unpivot via posexplode
    "q_unpivot" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          posexplode(array(col("l_quantity"), col("l_discount"), col("l_tax")))
            .as(Seq("k", "v")))
        .orderBy("l_orderkey", "l_linenumber", "k")
    }),

    // A4: deterministic statistical mode (tie-break: smallest value)
    "q_mode" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag").count()
        .orderBy(desc("count"), asc("l_returnflag"))
        .limit(1)
        .select(col("l_returnflag").as("mode_val"))
    }),

    // A5/P8: distinct labeled picklist
    "q_distinct_picklist" -> ((s, dir) => {
      t(s, dir, "part")
        .select(concat(lit("(N"), col("p_brand"), lit(") "), col("p_type")).as("label"))
        .distinct()
        .orderBy("label")
    }),

    // P7/A3: time-period concat + per-period aggregate
    "q_time_period" -> ((s, dir) => {
      t(s, dir, "orders")
        .withColumn("time_period",
          concat(year(col("o_orderdate")).cast("string"), lit("-q"),
            quarter(col("o_orderdate")).cast("string")))
        .groupBy("time_period")
        .agg(count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("total_amt"))
        .orderBy("time_period")
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

    // grouping sets: rollup over (year, qtr) with subtotal + grand rows
    "q_rollup" -> ((s, dir) => {
      t(s, dir, "orders")
        .withColumn("year", year(col("o_orderdate")))
        .withColumn("qtr", quarter(col("o_orderdate")))
        .rollup("year", "qtr")
        .agg(count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("total_amt"))
        .orderBy(asc_nulls_first("year"), asc_nulls_first("qtr"))
    }),

    // grouping sets: full cube over (year, qtr)
    "q_cube" -> ((s, dir) => {
      t(s, dir, "orders")
        .withColumn("year", year(col("o_orderdate")))
        .withColumn("qtr", quarter(col("o_orderdate")))
        .cube("year", "qtr")
        .agg(count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("total_amt"))
        .orderBy(asc_nulls_first("year"), asc_nulls_first("qtr"))
    }),

    // grouping sets: EXPLICIT set list — (year), (qtr), grand total —
    // with grouping() flags distinguishing "NULL because aggregated
    // away" from a genuinely null key (the third family member next to
    // rollup and cube, via the typed Dataset API)
    "q_grouping_sets" -> ((s, dir) => {
      t(s, dir, "orders")
        .withColumn("year", year(col("o_orderdate")))
        .withColumn("qtr", quarter(col("o_orderdate")))
        .groupingSets(Seq(Seq(col("year")), Seq(col("qtr")), Seq()),
          col("year"), col("qtr"))
        .agg(grouping(col("year")).cast("int").as("g_year"),
          grouping(col("qtr")).cast("int").as("g_qtr"),
          count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("total_amt"))
        .orderBy(asc_nulls_first("year"), asc_nulls_first("qtr"))
    }),

    // reshape: long->wide pivot (returnflag rows x linestatus columns)
    "q_pivot" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(round(sum("l_extendedprice"), 2))
        .orderBy("l_returnflag")
    }),

    // U1: union of two sources
    "q_union" -> ((s, dir) => {
      t(s, dir, "customer").select(col("c_name").as("name"), lit("customer").as("src"))
        .unionByName(
          t(s, dir, "supplier").select(col("s_name").as("name"), lit("supplier").as("src")))
        .orderBy("src", "name")
    }),

    // ordered string aggregation: listagg WITHIN GROUP — the picklist/
    // label-rollup shape (deterministic because the order-by key is the
    // aggregated value itself)
    "q_listagg" -> ((s, dir) => {
      t(s, dir, "nation")
        .join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)").as("nations"),
          count(lit(1)).as("n_nations"))
        .orderBy("r_name")
    }),

    // set operations: INTERSECT / EXCEPT (distinct set semantics both
    // engines; Catalyst plans them as semi/anti joins under a distinct).
    // Customers with vs without a >250k order — the same non-vacuous
    // split the anti-join query uses.
    "q_setops" -> ((s, dir) => {
      val all = t(s, dir, "customer").select("c_custkey")
      val big = t(s, dir, "orders").filter(col("o_totalprice") > 250000)
        .select(col("o_custkey").as("c_custkey"))
      all.intersect(big).withColumn("op", lit("has_big_order"))
        .unionByName(all.except(big).withColumn("op", lit("no_big_order")))
        .select("op", "c_custkey")
        .orderBy("op", "c_custkey")
    }),

    // BAG-semantics set operations — EXCEPT ALL / INTERSECT ALL keep
    // multiplicity (a customer with 3 orders minus 1 return leaves 2),
    // which Spark plans as dedicated ExceptAll/IntersectAll operators
    // (replicate-and-count generation under the hood), not the
    // distinct-based forms above. Multiplicities are exact ints.
    "q_setops_all" -> ((s, dir) => {
      val ordered = t(s, dir, "orders").select(col("o_custkey").as("c_custkey"))
      val prio = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("c_custkey"))
      ordered.exceptAll(prio).groupBy("c_custkey")
        .agg(count(lit(1)).as("n")).withColumn("op", lit("except_all"))
        .unionByName(
          ordered.intersectAll(prio).groupBy("c_custkey")
            .agg(count(lit(1)).as("n")).withColumn("op", lit("intersect_all")))
        .select("op", "c_custkey", "n")
        .orderBy("op", "c_custkey")
    }),

    // exact moving median over a trailing 7-row window — Spark has no
    // percentile window function, so the frame's values collect into
    // an array (bounded: 7 elements), sort, and index — exact discrete
    // median of integer-rounded daily totals, drift-free. The robust
    // twin of q_moving_avg (one outlier day cannot drag it).
    "q_moving_median" -> ((s, dir) => {
      val daily = EventsStream.readEvents(s, s"$dir/events.parquet")
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(round(sum("value"), 2).as("day_total"))
      val w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
      daily
        .withColumn("vals", array_sort(collect_list("day_total").over(w)))
        .select(col("event_type"),
          date_format(col("day"), "yyyy-MM-dd").as("day"), col("day_total"),
          element_at(col("vals"),
            ((size(col("vals")) + 1) / 2).cast("int")).as("moving_median"))
        .orderBy("event_type", "day")
    }),

    // scalar subquery via the SQL surface (S9 serving): the single-row
    // aggregate plans as a broadcast into the filter. max() is exact
    // and order-independent, so the 0.9x threshold is bit-identical
    // across engines — no drift at the comparison boundary.
    "q_scalar_subquery" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_v")
      s.sql("""SELECT o_orderkey, o_totalprice FROM orders_v
              |WHERE o_totalprice >= CAST(0.9 AS DOUBLE) * (SELECT max(o_totalprice) FROM orders_v)
              |ORDER BY o_orderkey""".stripMargin)
    }),

    // ext: snapshot diff — what did the last 20 days change about each
    // (user, type)'s latest event? latestByKey twice + one full-outer
    // classification join (ScaleOps.snapshotDiff; all four statuses
    // exercised by the unit fixture — 'removed' is structurally
    // impossible here since snapshot B covers a superset window).
    "q_snapshot_diff" -> ((s, dir) => {
      val ev = EventsStream.readEvents(s, s"$dir/events.parquet")
        .select("user_id", "event_type", "event_id", "ts")
      val keys = Seq("user_id", "event_type")
      val a = ScaleOps.latestByKey(
        ev.filter(col("ts") < lit("2024-01-11").cast("timestamp")), keys, Seq("ts", "event_id"))
      val b = ScaleOps.latestByKey(ev, keys, Seq("ts", "event_id"))
      ScaleOps.snapshotDiff(a, b, keys, "event_id")
        .groupBy("status").agg(count(lit(1)).as("n"))
        .orderBy("status")
    }),

    // data-quality gate (the Deequ/dbt-test niche): referential
    // integrity, key uniqueness, completeness, and range checks as ONE
    // unioned summary — each check a map-side-combinable conditional
    // aggregate, the orphan check a broadcast left join on the distinct
    // key set. The shape every pipeline runs before publishing a table.
    "q_data_quality" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      def summary(name: String, flagged: Column, from: DataFrame): DataFrame =
        from.agg(
          sum(when(flagged, 1L).otherwise(0L)).cast("long").as("n_bad"),
          count(lit(1)).as("n_total"))
          .select(lit(name).as("check_name"), col("n_bad"), col("n_total"))
      val orphan = summary("lineitem_orphan_orderkey", col("o_orderkey").isNull,
        li.join(broadcast(o.select("o_orderkey").distinct()),
          col("l_orderkey") === col("o_orderkey"), "left"))
      val dupKeys = summary("orders_duplicate_orderkey", col("cnt") > 1,
        o.groupBy("o_orderkey").agg(count(lit(1)).as("cnt")))
      val nullBal = summary("customer_null_acctbal", col("c_acctbal").isNull, c)
      val qtyRange = summary("lineitem_quantity_out_of_range",
        col("l_quantity") < 1 || col("l_quantity") > 50, li)
      val negPrice = summary("lineitem_nonpositive_price",
        col("l_extendedprice") <= 0, li)
      orphan.unionByName(dupKeys).unionByName(nullBal)
        .unionByName(qtyRange).unionByName(negPrice)
        .orderBy("check_name")
    }),

    // time-RANGE window frame (trailing 7 calendar days) — a range
    // frame over a day index, NOT a row frame: missing days shrink the
    // window, which rows-between cannot express. Integer sums keep the
    // compare drift-free.
    "q_range_frame" -> ((s, dir) => {
      val daily = EventsStream.readEvents(s, s"$dir/events.parquet")
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("event_type").orderBy(unix_date(col("d")))
        .rangeBetween(-6, Window.currentRow)
      daily.withColumn("n_7d", sum("n").over(w))
        .orderBy("event_type", "d")
    }),

    // SQL surface: RECURSIVE CTE (Spark 4 native) — capped running sum
    // with reset, a stateful scan a window function cannot express
    // (each row's value depends on the POST-RESET accumulator of the
    // previous row). Drift-free: the addition chain order is pinned by
    // the recursion itself, so both engines execute the identical
    // IEEE sequence. Depth = max orders per kept customer (≤20 at
    // sf0.1, probed) — far under spark.sql.cteRecursionLevelLimit.
    // The ranked anchor is PERSISTED: the recursive term executes once
    // per recursion level, and an inlined CTE would re-scan and
    // re-window the orders table every level (measured 57 s warm at
    // sf0.1 — the whole bench's worst query; cached it's one scan).
    // At 100 TB the recursion shape itself is wrong anyway: depth ×
    // join passes over a cached relation. The linear-scale form is one
    // repartition(key) + sortWithinPartitions + per-partition
    // sequential fold — O(n log n) in one pass, no iteration. The CTE
    // stays as the SQL-surface demo at demo depth (≤20 levels).
    "q_recursive_cte" -> ((s, dir) => {
      t(s, dir, "orders").filter(col("o_custkey") % 50 === 0)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(
            Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey"))
            .cast("int").as("rn"))
        .persist()
        .createOrReplaceTempView("ranked_v")
      s.sql("""WITH RECURSIVE walk(o_custkey, o_orderkey, rn, acc) AS (
              |  SELECT o_custkey, o_orderkey, rn, o_totalprice FROM ranked_v WHERE rn = 1
              |  UNION ALL
              |  SELECT r.o_custkey, r.o_orderkey, r.rn,
              |         CASE WHEN w.acc + r.o_totalprice > 300000 THEN r.o_totalprice
              |              ELSE w.acc + r.o_totalprice END
              |  FROM walk w JOIN ranked_v r ON r.o_custkey = w.o_custkey AND r.rn = w.rn + 1)
              |SELECT o_custkey, o_orderkey, rn, round(acc, 2) AS acc
              |FROM walk ORDER BY o_custkey, rn""".stripMargin)
    }),

    // date arithmetic family: add/diff/last_day/day-of-week in one
    // projection (DuckDB numbers Sunday 0 where Spark says 1 — the
    // oracle shifts)
    "q_date_math" -> ((s, dir) => {
      spread(t(s, dir, "orders"))
        .select(col("o_orderkey"),
          date_format(date_add(col("o_orderdate"), 30), "yyyy-MM-dd").as("due_date"),
          datediff(lit("1998-12-31").cast("date"), col("o_orderdate")).as("days_to_eoy"),
          date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
          dayofweek(col("o_orderdate")).as("dow"))
        .orderBy("o_orderkey")
    }),

    // P10/P11: null/blank + inequality filters, then aggregate
    "q_filter_nulls" -> ((s, dir) => {
      t(s, dir, "customer")
        .filter(col("c_acctbal").isNotNull &&
          col("c_mktsegment") =!= "BUILDING" &&
          trim(col("c_name").cast("string")) =!= "")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), round(avg("c_acctbal"), 4).as("avg_bal"))
        .orderBy("c_mktsegment")
    }),

    // events: batch tumbling-hour aggregate (streaming's batch twin)
    "q_events_hourly" -> ((s, dir) => {
      EventsStream.readEvents(s, s"$dir/events.parquet")
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
        .orderBy("hour", "event_type")
    }),

    // ext: true Structured Streaming path (memory sink), same oracle as
    // the batch form — the stream must converge to the batch answer.
    "q_events_stream" -> ((s, dir) => {
      EventsStream.runStreamOnce(s, s"$dir/events.parquet")
        .select(
          date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"), col("n_events"),
          round(col("total_value").cast("double"), 2).as("total_value"))
        .orderBy("hour", "event_type")
    }),

    // ext: stream-static enrichment — broadcast dim into the stream,
    // then watermarked daily aggregate; oracled by the batch twin SQL.
    "q_stream_enrich" -> ((s, dir) => {
      EventsStream.runEnrichOnce(s, s"$dir/events.parquet")
        .select(
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("label"), col("type_weight"), col("n_events"),
          col("user_checksum").cast("long").as("user_checksum"))
        .orderBy("day", "label")
    }),

    // ext: JSON property extraction over events.props — `from_json`
    // with an explicit schema for the hot path (ONE parse per row,
    // codegen'd struct access) plus `get_json_object` for the ad-hoc
    // single-field pull, then an aggregate over the extracted field.
    // At scale the typed form wins: schema-on-read parses once into a
    // struct instead of re-walking the JSON per field.
    "q_props_extract" -> ((s, dir) => {
      import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
      val ev = spread(EventsStream.readEvents(s, s"$dir/events.parquet"))
      val propsSchema = StructType(Seq(StructField("k", IntegerType)))
      ev.select(col("event_type"),
          from_json(col("props"), propsSchema).getField("k").as("k_typed"),
          get_json_object(col("props"), "$.k").cast("int").as("k_adhoc"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          sum("k_typed").cast("long").as("k_sum"),
          round(avg("k_typed"), 4).as("k_avg"),
          count(col("k_adhoc")).as("n_with_k"))
        .orderBy("event_type")
    }),

    // ext: time-series gap fill + forward fill (TimeFill scaladoc for
    // the one-shuffle lead+explode design). A rare deterministic slice
    // of events (user_id % 97) gives genuinely sparse daily counts;
    // missing days are manufactured carrying the previous observation.
    "q_gapfill" -> ((s, dir) => {
      val daily = EventsStream.readEvents(s, s"$dir/events.parquet")
        .filter(col("user_id") % 97 === 0)
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("n"))
      TimeFill.forwardFillDaily(daily, Seq("event_type"), "d", Seq("n"))
        .orderBy("event_type", "d")
    }),

    // ext: same densification with linear interpolation — per-row
    // scalar arithmetic (v + (next_v - v) * elapsed/gap) written with
    // the identical operation tree in the oracle, so doubles are
    // bit-stable cross-engine with no rounding needed.
    "q_interpolate" -> ((s, dir) => {
      val daily = EventsStream.readEvents(s, s"$dir/events.parquet")
        .filter(col("user_id") % 97 === 0)
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("n"))
      TimeFill.interpolateDaily(daily, Seq("event_type"), "d", "n")
        .orderBy("event_type", "d")
    }),

    // ext: CDC snapshot compaction — latest event per user as ONE
    // map-side-combining hash aggregate (max_by over struct ordering),
    // not a window sort; ScaleOps.latestByKey scaladoc for why.
    "q_latest_by_key" -> ((s, dir) => {
      val ev = EventsStream.readEvents(s, s"$dir/events.parquet")
        .select("user_id", "event_id", "event_type", "ts", "value")
      ScaleOps.latestByKey(ev, Seq("user_id"), Seq("ts", "event_id"))
        .select(col("user_id"), col("event_id"), col("event_type"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_s"),
          col("value"))
        .orderBy("user_id")
    }),

    // ext: SCD type-2 history build — changelog → per-key validity
    // intervals of the tracked attribute (ScaleOps.scd2 scaladoc: one
    // shuffle; the run-collapsing agg reuses the window's hash
    // partitioning). (user_id, ts) is unique in the testdata, so the
    // history is deterministic without a tiebreaker.
    "q_scd2" -> ((s, dir) => {
      val ev = EventsStream.readEvents(s, s"$dir/events.parquet")
        .select("user_id", "ts", "event_type")
      ScaleOps.scd2(ev, key = "user_id", ord = "ts", attr = "event_type")
        .select(col("user_id"), col("version"), col("event_type"),
          date_format(col("valid_from"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("valid_from"),
          date_format(col("valid_to"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("valid_to"),
          col("n_rows"))
        .orderBy("user_id", "version")
    }),

    // ext: MERGE-style upsert — apply a late batch of per-user updates
    // to an earlier snapshot (ScaleOps.mergeUpsert scaladoc: one
    // full-outer shuffle, presence-marker classification). The target
    // deliberately excludes the `user_id % 10 == 0` cohort so the
    // update batch exercises all three actions: those users insert,
    // the rest of the batch updates, untouched users carry over.
    "q_merge_upsert" -> ((s, dir) => {
      val cut = lit("2024-01-20").cast("timestamp")
      val ev = EventsStream.readEvents(s, s"$dir/events.parquet")
        .select("user_id", "event_id", "event_type", "ts", "value")
      val target = ScaleOps.latestByKey(
          ev.filter(col("ts") < cut && col("user_id") % 10 =!= 0),
          Seq("user_id"), Seq("ts", "event_id"))
        .select("user_id", "event_type", "value")
      val updates = ScaleOps.latestByKey(
          ev.filter(col("ts") >= cut && col("user_id") % 3 === 0),
          Seq("user_id"), Seq("ts", "event_id"))
        .select("user_id", "event_type", "value")
      ScaleOps.mergeUpsert(target, updates, Seq("user_id"))
        .orderBy("user_id")
    }),

    // cohort retention — the product-analytics staple: users grouped by
    // first-seen week, activity counted per week offset. Two shuffles
    // total: the first-event agg and the join back both hash on
    // user_id (the agg's partitioning is reused for the join), then the
    // tiny cohort matrix aggregates. All-integer outputs — drift-free.
    "q_cohort_retention" -> ((s, dir) => {
      val ev = EventsStream.readEvents(s, s"$dir/events.parquet")
        .select("user_id", "ts")
      val firsts = ev.groupBy("user_id")
        .agg(date_trunc("week", min(col("ts"))).as("cw"))
      ev.join(firsts, "user_id")
        .select(col("user_id"), col("cw"), date_trunc("week", col("ts")).as("ew"))
        .groupBy(
          date_format(col("cw"), "yyyy-MM-dd").as("cohort_week"),
          expr("datediff(cast(ew as date), cast(cw as date)) div 7").cast("int")
            .as("week_offset"))
        .agg(countDistinct(col("user_id")).as("active_users"))
        .orderBy("cohort_week", "week_offset")
    }),

    // ext: PII scrub — the corpus tables carry no PII (pure word-salad,
    // probed), so the demo MANUFACTURES email/phone/IP-bearing text
    // from event ids deterministically in both engines, then runs the
    // real redaction operator over it. The unit test covers genuine
    // handwritten PII fixtures.
    "q_pii_redact" -> ((s, dir) => {
      val ev = EventsStream.readEvents(s, s"$dir/events.parquet")
        .filter(col("event_id") % 211 === 0)
      val raw = concat(
        col("event_type"), lit(": contact u"), col("user_id").cast("string"),
        lit("@example.com or +1 (555) 010-"),
        lpad((col("event_id") % 10000).cast("string"), 4, "0"),
        lit(" from 10.0."), (col("user_id") % 256).cast("string"),
        lit("."), (col("event_id") % 256).cast("string"))
      ev.select(col("event_id"), TextStats.redactPii(raw).as("redacted"))
        .orderBy("event_id")
    }),

    // ext: blocked fuzzy matching — edit-distance pairs inside
    // (brand, size) blocks; Dedup.fuzzyPairs scaladoc for why blocking
    // is the scale lever. Bounded levenshtein short-circuits past the
    // threshold; DuckDB computes the full distance — equal on kept rows.
    "q_fuzzy_pairs" -> ((s, dir) => {
      Dedup.fuzzyPairs(
          t(s, dir, "part"), "p_partkey", "p_name", Seq("p_brand", "p_size"), 8)
        .select(col("p_brand"), col("p_size"), col("id_a"), col("id_b"), col("dist"))
        .orderBy("p_brand", "p_size", "id_a", "id_b")
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

    // ext: Z-order clustering key — per 256-key chunk of the Morton
    // curve, the (x, y) bounding rectangle stays small on BOTH axes
    // (the file-skipping property; ScaleOps.zorderKey scaladoc). All
    // integer bit arithmetic: drift-free on any engine.
    "q_zorder" -> ((s, dir) => {
      val x = col("l_orderkey") % 256
      val y = col("l_partkey") % 256
      t(s, dir, "lineitem")
        .select(ScaleOps.zorderKey(x, y, 8).as("zkey"), x.as("x"), y.as("y"))
        .withColumn("chunk", shiftright(col("zkey"), 8))
        .groupBy("chunk")
        .agg(count(lit(1)).as("n"),
          min("x").as("x_min"), max("x").as("x_max"),
          min("y").as("y_min"), max("y").as("y_max"))
        .orderBy("chunk")
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

    // §2.10 streaming + ext sketch: the STREAMING build of the same
    // deterministic HLL — update-mode register maintenance with
    // bounded state (groups x 256 ints, vs the unbounded set an exact
    // streaming COUNT(DISTINCT) would hold), gated against the
    // identical register/estimate SQL as the batch form.
    "q_stream_hll" -> ((s, dir) => {
      val regs = EventsStream.hllRegistersStream(
        EventsStream.readEventsStream(s, s"$dir/events.parquet")
          .withColumn("user_day", concat(col("user_id").cast("string"),
            lit(":"), col("ts").cast("date").cast("string"))),
        "event_type", col("user_day"))
      Sketch.hllDetEstimate(regs, Seq("event_type"))
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

    // J3: the reference README declares (but never ships) a join of the
    // flagship table against an external "hactable" on
    // unique_naics_code — the J1 broadcast-enrichment pattern on the
    // code key. The external side is stood in by a distinct-code dim
    // (the testdata ships no external table); the join shape is the
    // declared one: aggregate facts LEFT JOIN broadcast lookup on the
    // unique code.
    "q_naics_external_join" -> ((s, dir) => {
      val agg = t(s, dir, "orders")
        .withColumn("unique_naics_code", substring(col("o_orderpriority"), 1, 4))
        .groupBy("unique_naics_code")
        .agg(count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("total_amt"))
      val hactable = t(s, dir, "orders")
        .select(substring(col("o_orderpriority"), 1, 4).as("unique_naics_code"))
        .distinct()
        .withColumn("naics_label", concat(lit("NAICS "), col("unique_naics_code")))
      agg.join(broadcast(hactable), Seq("unique_naics_code"), "left")
        .orderBy("unique_naics_code")
    }),

    // ext: as-of join — each event picks up the latest SPARSE daily
    // total (only every-3rd-calendar-day kept, so matches genuinely
    // look back) of its USER. user_id is the high-cardinality key the
    // operator's scaladoc calls for: the window carry partitions
    // across ~n_users reducers instead of funneling everything through
    // a handful of event_type partitions. DuckDB's native ASOF LEFT
    // JOIN is the oracle.
    "q_asof_join" -> ((s, dir) => {
      val ev = EventsStream.readEvents(s, s"$dir/events.parquet")
      val daily = ev
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(round(sum("value"), 2).as("day_total"))
        .filter(dayofmonth(col("day")) % 3 === 0)
      AsofJoin.asofJoinLast(
          ev.select("event_id", "ts", "user_id"), daily,
          keyCols = Seq("user_id"), leftTime = "ts", rightTime = "day",
          payloadCols = Seq("day", "day_total"))
        .select(col("event_id"), col("user_id"),
          date_format(col("day"), "yyyy-MM-dd").as("asof_day"), col("day_total"))
        .orderBy("event_id")
    }),

    // ext: as-of join with a TOLERANCE bound (pandas merge_asof
    // tolerance): same sparse-daily lookup as q_asof_join, but matches
    // staler than 2 days are nulled — only the latest match can ever
    // qualify, so gating it IS tolerance semantics
    "q_asof_tolerance" -> ((s, dir) => {
      val ev = EventsStream.readEvents(s, s"$dir/events.parquet")
      val daily = ev
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(round(sum("value"), 2).as("day_total"))
        .filter(dayofmonth(col("day")) % 3 === 0)
      AsofJoin.asofJoinLast(
          ev.select("event_id", "ts", "user_id"), daily,
          keyCols = Seq("user_id"), leftTime = "ts", rightTime = "day",
          payloadCols = Seq("day", "day_total"),
          toleranceSec = Some(172800L))
        .select(col("event_id"), col("user_id"),
          date_format(col("day"), "yyyy-MM-dd").as("asof_day"), col("day_total"))
        .orderBy("event_id")
    }),

    // ext: range join — assign each event to its containing session
    // interval via the binned equi-join rewrite (1-hour bins), keyed by
    // high-cardinality user_id; every event lands in exactly one of its
    // user's sessions, which the BETWEEN-join oracle re-derives
    // independently
    "q_range_join" -> ((s, dir) => {
      val ev = EventsStream.readEvents(s, s"$dir/events.parquet")
      val sess = Sessionize.sessionizeBatch(ev, gapSeconds = 300, keyCol = "user_id")
        .select(col("user_id"), col("sess_id"),
          col("session_start"), col("session_end"))
      AsofJoin.rangeJoinBinned(
          ev.select("event_id", "ts", "user_id"), sess,
          keyCols = Seq("user_id"), leftTime = "ts",
          rightStart = "session_start", rightEnd = "session_end",
          binSeconds = 3600)
        .select(col("event_id"), col("user_id"), col("sess_id"))
        .orderBy("event_id")
    }),

    // ext: interval-overlap PAIR COUNT per supplier over the DISTINCT
    // shipment windows [shipdate, shipdate + qty%30+1 days]; the
    // combinatorial sweep (each start adds the currently-open count)
    // counts every overlapping pair exactly once WITHOUT enumerating
    // pairs, so cost is one keyed window sort over 2 rows/interval
    // where the oracle's enumerated self-join is Sigma overlap^2.
    // Inclusive-touch semantics; tie-order-invariant exact longs. The
    // interval id packs (epoch-day, duration) — collision-free by
    // construction, satisfying the operator's unique-id contract
    // ((orderkey, linenumber) is NOT unique in this testdata).
    "q_interval_overlap" -> ((s, dir) => {
      val iv = t(s, dir, "lineitem")
        .select(col("l_suppkey").as("k"),
          col("l_shipdate").cast("date").as("s0"),
          (col("l_quantity").cast("int") % 30 + 1).as("dur"))
        .distinct()
        .select(col("k"),
          (datediff(col("s0"), to_date(lit("1970-01-01"))).cast("long") * 31
            + col("dur") - 1).as("rid"),
          col("s0"), date_add(col("s0"), col("dur")).as("e0"))
      Sessionize.overlapPairCounts(iv, "k", "s0", "e0", "rid")
        .select(col("k").as("suppkey"), col("n_intervals"),
          col("n_overlap_pairs"))
        .orderBy("suppkey")
    }),

    // ext: salted join — l_returnflag has only 3 values, the textbook
    // skewed key; the salt spreads each hot key across reducers while
    // the output stays identical to the plain join (what the oracle
    // checks)
    "q_salted_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select("l_returnflag", "l_quantity")
      val dim = li.select("l_returnflag").distinct()
        .withColumn("flag_label", concat(lit("F_"), col("l_returnflag")))
      ScaleOps.saltedJoin(li, dim, "l_returnflag", salts = 8)
        .groupBy("flag_label")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"))
        .orderBy("flag_label")
    }),

    // ext: gap-based sessionization (batch twin of the
    // flatMapGroupsWithState streaming form; 5-minute gap), keyed by
    // user_id — the high-cardinality key that spreads the per-key
    // window sort across all reducers (the operator's scaladoc warns
    // against low-cardinality keys like event_type at scale)
    "q_sessionize" -> ((s, dir) => {
      Sessionize.sessionizeBatch(
          EventsStream.readEvents(s, s"$dir/events.parquet"), gapSeconds = 300,
          keyCol = "user_id")
        .select(col("user_id"), col("sess_id"),
          date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
          col("n_events"))
        .orderBy("user_id", "sess_id")
    }),

    // ext: the same sessionization via Spark's BUILT-IN session_window
    // aggregation — the declarative, merge-on-overlap form (one
    // ObjectHashAggregate, no per-key window sort). The exact-gap
    // one-ulp convention (built-in splits an exactly-gap pair, the
    // lag+cumsum form merges it) is a stated operator contract — see
    // the Sessionize scaladoc's "Exact-gap boundary contract".
    "q_session_window" -> ((s, dir) => {
      val sess = EventsStream.readEvents(s, s"$dir/events.parquet")
        .groupBy(col("user_id"), session_window(col("ts"), "5 minutes").as("w"))
        .agg(min("ts").as("session_start"), max("ts").as("session_end"),
          count(lit(1)).as("n_events"))
      sess
        .withColumn("sess_id",
          row_number().over(
            Window.partitionBy("user_id").orderBy("session_start")).cast("long"))
        .select(col("user_id"), col("sess_id"),
          date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
          col("n_events"))
        .orderBy("user_id", "sess_id")
    }),

    // ext dedup: exact duplicate groups (on a 20-char prefix fingerprint
    // so the synthetic corpus actually collides)
    "q_dedup_exact" -> ((s, dir) => {
      Dedup.exactDuplicates(
          t(s, dir, "documents").select(col("doc_id"), substring(col("text"), 1, 20).as("text")))
        .orderBy("fingerprint")
    }),

    // ext dedup: normalized content fingerprint per doc
    "q_dedup_normfp" -> ((s, dir) => {
      spread(t(s, dir, "documents"))
        .select(col("doc_id"), Dedup.normalizedFingerprint(col("text")).as("fingerprint"))
        .orderBy("doc_id")
    }),

    // ext dedup: bloom-filter ingest prefilter — the join-free fast
    // path for batch-vs-corpus dedup (Bloom scaladoc). The corpus
    // compresses to ONE aggregate's bit array; the batch probes it
    // with a narrow expression, and only the admitted sliver joins the
    // corpus for the exact verdict. Gate encodes the contract: exact
    // dup counts (both engines), no-false-negatives (every true dup
    // was admitted by the filter), and the false-positive bound.
    "q_bloom_prefilter" -> ((s, dir) => {
      val docs = spread(t(s, dir, "documents"))
        .select(col("doc_id"), md5(substring(col("text"), 1, 20)).as("fp"))
      val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      val batch = docs.filter(col("doc_id") % 10 === 0)
      // 100k capacity rides every sf this repo tests (45k docs at sf1)
      // at ~120 KB of bits; real deployments size to the corpus count
      val (_, maybeDup) = Bloom.prefilterNew(batch, corpus, col("fp"),
        expectedItems = 100000L, fpp = 0.01)
      val corpusFp = corpus.select("fp").distinct()
      val agg = batch.agg(count(lit(1)).as("n_batch"))
        .crossJoin(batch.join(corpusFp, Seq("fp"), "left_semi")
          .agg(count(lit(1)).as("n_true_dup")))
        .crossJoin(maybeDup.join(corpusFp, Seq("fp"), "left_semi")
          .agg(count(lit(1)).as("n_dup_admitted")))
        .crossJoin(maybeDup.agg(count(lit(1)).as("n_maybe")))
      agg.select(col("n_batch"), col("n_true_dup"),
        (col("n_dup_admitted") === col("n_true_dup")).as("no_false_negatives"),
        ((col("n_maybe") - col("n_true_dup")) <=
          ceil(col("n_batch") * lit(0.1))).as("fp_within_bound"))
    }),

    // ext dedup: MinHash signatures (k=4 perms, 3-gram shingles)
    "q_minhash" -> ((s, dir) => {
      Dedup.minhashSignatures(spread(t(s, dir, "documents")), k = 4, n = 3)
        .orderBy("doc_id")
    }),

    // ext: corpus vocabulary — top-k bigrams by frequency (the vocab-
    // building sweep before tokenizer training). One shingle explode +
    // map-side-combined count; the top-k is a total order (count desc,
    // ngram) so the LIMIT is deterministic in both engines.
    "q_top_ngrams" -> ((s, dir) => {
      spread(t(s, dir, "documents"))
        .select(explode(Dedup.shingles(col("text"), 2)).as("ngram"))
        .groupBy("ngram").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("ngram")).limit(20)
    }),

    // ext corpus: sliding-window chunking — 32-token chunks at stride
    // 24 (overlapping context windows for training-sequence packing /
    // RAG indexing). Narrow plan: tokenize once, explode; no shuffle.
    "q_doc_chunks" -> ((s, dir) => {
      Corpus.chunkDocs(spread(t(s, dir, "documents")), chunkTokens = 32, stride = 24)
        .orderBy("doc_id", "chunk_ix")
    }),

    // ext corpus: the SAME chunking through the native SlidingChunks
    // Generator (UDTF) — chunks stream one row at a time instead of
    // materializing every window of a doc before the explode; per-row
    // memory O(chunkTokens) regardless of document length. Output
    // identical to q_doc_chunks (shared oracle; unit-gated).
    "q_doc_chunks_gen" -> ((s, dir) => {
      Corpus.chunkDocsGen(spread(t(s, dir, "documents")), chunkTokens = 32, stride = 24)
        .orderBy("doc_id", "chunk_ix")
    }),

    // ext corpus: eval-set decontamination — training docs sharing a
    // word 4-gram with the held-out split (doc_id % 50 == 0). The eval
    // shingle set is broadcast (plan-asserted in CorpusSpec); real
    // deployments use 8–13-grams, proportionate here to ~50-token docs.
    "q_contamination" -> ((s, dir) => {
      val docs = spread(t(s, dir, "documents"))
      Corpus.contamination(
          docs.filter(col("doc_id") % 50 =!= 0),
          docs.filter(col("doc_id") % 50 === 0), n = 4)
        .orderBy("doc_id")
    }),

    // ext corpus: repetition stats (Gopher-style quality rule) — the
    // distinct-token fraction and top-bigram share flag boilerplate /
    // degenerate docs; both shuffles key on doc_id with map-side combine.
    "q_repetition" -> ((s, dir) => {
      Corpus.repetitionStats(spread(t(s, dir, "documents")))
        .orderBy("doc_id")
    }),

    // ext corpus: unigram surprisal — per-doc mean -ln p(token) under
    // the corpus' own unigram LM (zero-dependency quality score). Vocab
    // is one map-side-combined aggregate, broadcast back to the tokens.
    "q_lm_surprisal" -> ((s, dir) => {
      Corpus.unigramSurprisal(spread(t(s, dir, "documents")))
        .orderBy("doc_id")
    }),

    // ext capstone: the END-TO-END training-data pipeline — quality
    // gate -> exact-dup removal (keep lowest doc_id per normalized
    // fingerprint) -> eval-set decontamination -> sliding-window
    // chunking -> per-shard sequence packing. Every stage is an
    // already-oracled operator; this row gates their COMPOSITION. The
    // output is the packed-sequence manifest a trainer would consume.
    "q_clean_corpus" -> ((s, dir) => {
      val docs = spread(t(s, dir, "documents"))
      val kept = TextStats.withQuality(docs)
        .filter(col("quality_score") >= 0.7).select("doc_id", "text")
      val w = Window.partitionBy(Dedup.normalizedFingerprint(col("text")))
        .orderBy("doc_id")
      val canon = kept.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
      val contaminated = Corpus.contamination(
          canon.filter(col("doc_id") % 50 =!= 0),
          docs.filter(col("doc_id") % 50 === 0), n = 4)
        .select("doc_id")
      val clean = canon.filter(col("doc_id") % 50 =!= 0)
        .join(contaminated, Seq("doc_id"), "left_anti")
      val chunks = Corpus.chunkDocs(clean, chunkTokens = 32, stride = 24)
        .withColumn("bucket", col("doc_id") % 8)
      Corpus.packSequences(chunks, "bucket", Seq("doc_id", "chunk_ix"),
          budgetTokens = 256L)
        .orderBy("bucket", "seq_id")
    }),

    // ext corpus: training-sequence packing — chunks concatenated per
    // deterministic shard (doc_id % 8) and sliced every 256 tokens.
    // All-integer outputs; the window sort is per-shard, never global.
    "q_pack_sequences" -> ((s, dir) => {
      val chunks = Corpus.chunkDocs(spread(t(s, dir, "documents")),
          chunkTokens = 32, stride = 24)
        .withColumn("bucket", col("doc_id") % 8)
      Corpus.packSequences(chunks, "bucket", Seq("doc_id", "chunk_ix"),
          budgetTokens = 256L)
        .orderBy("bucket", "seq_id")
    }),

    // ext corpus: within-doc token entropy — internal diversity signal
    // (surprisal measures drift from the corpus; entropy measures
    // repetitiveness: spam scores low)
    "q_token_entropy" -> ((s, dir) => {
      Corpus.tokenEntropy(spread(t(s, dir, "documents")))
        .orderBy("doc_id")
    }),

    // ext: robust outlier screen — median/MAD per group, count of
    // |z| > 3 points; median-based so extremes can't mask themselves.
    // DISCRETE medians (actual data values, pure integer rank logic):
    // interpolated quantiles drift in the last ulp across engine
    // versions, and the rounded report + borderline outlier count can
    // flip on that; the cont twin stays unit-gated.
    "q_outliers" -> ((s, dir) => {
      ScaleOps.robustOutliersDisc(
          t(s, dir, "lineitem"), Seq("l_returnflag"), "l_extendedprice")
        .orderBy("l_returnflag")
    }),

    // classic OLAP join tree (TPC-H Q5 shape): region→nation dim chain
    // BROADCAST into supplier, customer and the orders⋈lineitem fact
    // spine SHUFFLE-joined on their natural keys, with the
    // same-nation residual (c_nationkey = s_nationkey) and a date
    // range on orders. Catalyst orders the tree; the revenue product
    // is per-row IEEE-identical cross-engine, the sum rounded 1e-2.
    // TPC-H Q3 shape (shipping priority): segment-filtered customer
    // BROADCASTS into orders, the date-filtered lineitem joins on the
    // order key, and the top-10 lands in one TakeOrdered — no global
    // sort. Revenue ranks as exact integer cents (floor of the IEEE
    // product, identical expression text both engines), so the order
    // can never drift sub-cent across engines or retries.
    "q_tpch_q3ish" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-06-30").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1998-06-30").cast("timestamp"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
      ord.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"))
        .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100))
          .as("rev_cents"))
        .orderBy(col("rev_cents").desc, col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q10 shape (returned-item reporting): one quarter of
    // orders × returned lines × customer, nation broadcast, top-20
    // lossy customers by exact-cents returned revenue (same
    // drift-free ranking discipline as q3ish).
    "q_tpch_q10ish" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1999-04-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      val li = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
      val cust = t(s, dir, "customer").select("c_custkey", "c_name", "c_nationkey")
      val nat = t(s, dir, "nation").select("n_nationkey", "n_name")
      ord.join(li, col("o_orderkey") === col("l_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100))
          .as("rev_cents"))
        .orderBy(col("rev_cents").desc, col("c_custkey"))
        .limit(20)
    }),

    "q_tpch_q5ish" -> ((s, dir) => {
      val cust = t(s, dir, "customer").select("c_custkey", "c_nationkey")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      val li = t(s, dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      val sup = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val nat = t(s, dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
      val reg = t(s, dir, "region").filter(col("r_name") === "ASIA")
        .select("r_regionkey")
      ord.join(li, col("o_orderkey") === col("l_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"),
          count(lit(1)).as("n_lineitems"))
        .orderBy("n_name")
    }),

    // funnel stage counts (view -> first click after -> first purchase
    // after that): strictly-sequenced semantics a pairwise join can't
    // give; every stage keys on user_id so the three aggregates and
    // both joins share one hash partitioning. All-integer output.
    "q_funnel_stages" -> ((s, dir) => {
      val ev = EventsStream.readEvents(s, s"$dir/events.parquet")
        .select("user_id", "event_type", "ts")
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("v_ts"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, "user_id").filter(col("ts") > col("v_ts"))
        .groupBy("user_id").agg(min("ts").as("c_ts"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, "user_id").filter(col("ts") > col("c_ts"))
        .groupBy("user_id").agg(min("ts").as("p_ts"))
      v.agg(count(lit(1)).as("n_view"))
        .crossJoin(c.agg(count(lit(1)).as("n_view_click")))
        .crossJoin(p.agg(count(lit(1)).as("n_view_click_purchase")))
    }),

    // ext eval: heuristic-vs-ground-truth language confusion matrix —
    // the documents table ships a true `lang` column; zh/de are outside
    // the heuristic's inventory and should land in 'und' or misfire,
    // which this matrix makes visible. One narrow projection + one agg.
    "q_langid_confusion" -> ((s, dir) => {
      spread(t(s, dir, "documents"))
        .select(col("lang"), TextStats.langId(col("text")).as("lang_id"))
        .groupBy("lang", "lang_id").agg(count(lit(1)).as("n"))
        .orderBy("lang", "lang_id")
    }),

    // ext: per-source corpus health report — doc counts, docs caught in
    // any corpus-wide duplicate group, mean quality. The fingerprint
    // self-aggregation joins back by fp as a SHUFFLE join on purpose:
    // at corpus scale the fingerprint table is corpus-sized, never
    // broadcastable.
    "q_source_report" -> ((s, dir) => {
      val docs = TextStats.withQuality(spread(t(s, dir, "documents")))
        .withColumn("fp", Dedup.normalizedFingerprint(col("text")))
      val fpCounts = docs.groupBy("fp").agg(count(lit(1)).as("fp_n"))
      docs.join(fpCounts, "fp")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("fp_n") > 1, 1L).otherwise(0L)).as("n_dup_docs"),
          // quality_score is 2-decimal by construction: sum exact
          // integer hundredths, divide once — order-independent
          round(sum(round(col("quality_score") * 100).cast("long")).cast("double") /
            (count(col("quality_score")) * lit(100.0)), 4).as("avg_quality"))
        .orderBy("source")
    }),

    // ext: vector hygiene gate — dimensionality bounds, null/zero
    // vectors, norm distribution. Norms use the native codegen dot
    // kernel; per-vector values round at 1e-6 before min/max so the
    // extrema are taken over already-stable numbers.
    "q_vector_stats" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .withColumn("nrm",
          round(sqrt(Similarity.dotNative(col("embedding"), col("embedding"))), 6))
      e.agg(
        count(lit(1)).as("n_vectors"),
        sum(when(col("embedding").isNull, 1L).otherwise(0L)).as("n_null"),
        min(size(col("embedding"))).as("min_dims"),
        max(size(col("embedding"))).as("max_dims"),
        sum(when(col("nrm") === 0.0, 1L).otherwise(0L)).as("n_zero"),
        // mean norm via FIXED-POINT micro-units: sum exact longs, one
        // final division — avg over doubles is summation-order
        // sensitive at 1e-4 rounding (engines/versions disagree)
        round(sum(round(col("nrm") * 1e6).cast("long")).cast("double") /
          (count(col("nrm")) * lit(1e6)), 4).as("avg_norm"),
        min("nrm").as("min_norm"),
        max("nrm").as("max_norm"))
    }),

    // ext eval: kNN majority-vote classification over the embeddings'
    // ground-truth labels — eval split (vec_id < 50) scored against the
    // train split by exact cosine top-3 (broadcast queries, two-phase
    // top-k), majority vote tie-broken to the smallest label. The scale
    // path swaps bruteForceTopK for the IVF/ANN searchers — same vote.
    "q_knn_eval" -> ((s, dir) => {
      val emb = spread(t(s, dir, "embeddings"))
      val queries = emb.filter(col("vec_id") < 50)
      val train = emb.filter(col("vec_id") >= 50)
      val topk = Similarity.bruteForceTopK(
        train.select("vec_id", "embedding"),
        queries.select("vec_id", "embedding"), k = 3, roundAt = 6)
      val votes = topk
        .join(train.select(col("vec_id").as("neighbor_id"), col("label").as("n_label")),
          "neighbor_id")
        .groupBy("query_id", "n_label").agg(count(lit(1)).as("v"))
      val pred = votes.groupBy("query_id")
        .agg(max_by(col("n_label"), struct(col("v"), -col("n_label")))
          .as("pred_label"))
      pred
        .join(queries.select(col("vec_id").as("query_id"), col("label")), "query_id")
        .groupBy("label")
        .agg(count(lit(1)).as("n"),
          sum(when(col("pred_label") === col("label"), 1L).otherwise(0L)).as("n_correct"))
        .withColumn("accuracy", round(col("n_correct") * lit(1.0) / col("n"), 4))
        .orderBy("label")
    }),

    // ext: 7-day sliding distinct users per event type — the exact
    // explode-to-window-ends form (sliding COUNT(DISTINCT) has no
    // window-function expression); the HLL sketch-merge twin for
    // corpus-scale item universes is unit-gated against this.
    "q_sliding_distinct" -> ((s, dir) => {
      Sketch.slidingDistinctExact(
          EventsStream.readEvents(s, s"$dir/events.parquet"),
          Seq("event_type"), col("user_id"), to_date(col("ts")), windowDays = 7)
        .select(col("event_type"),
          date_format(col("window_end"), "yyyy-MM-dd").as("window_end"),
          col("n_distinct"))
        .orderBy("event_type", "window_end")
    }),

    // ext: key-distribution profiler — the pre-join skew diagnostic,
    // run over a deliberately skewed key (3 return flags) and a
    // high-cardinality one (suppliers) side by side.
    "q_skew_report" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      ScaleOps.keyDistribution(li, Seq("l_returnflag"))
        .withColumn("key_set", lit("l_returnflag"))
        .unionByName(ScaleOps.keyDistribution(li, Seq("l_suppkey"))
          .withColumn("key_set", lit("l_suppkey")))
        .orderBy("key_set")
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

    // ext dedup: LSH banding (2 bands x 2 rows) -> candidate pairs.
    // Signatures are the expensive artifact (one shingle explode + hash
    // agg over the full corpus): persist them so banding consumes the
    // cached table instead of recomputing from raw text — the physical
    // plan shows one InMemoryTableScan per band, zero second shingle
    // passes. On a real pipeline this would be a parquet signature
    // table written once and joined many times.
    "q_lsh_pairs" -> ((s, dir) => {
      val sig = Dedup.minhashSignatures(spread(t(s, dir, "documents")), k = 4, n = 3).persist()
      Dedup.lshCandidatePairs(Dedup.lshBands(sig, k = 4, rowsPerBand = 2))
        .orderBy("id1", "id2")
    }),

    // ext dedup: cluster resolution — LSH candidate pairs -> connected
    // components -> per-doc cluster id + canonical flag (the last step
    // of a real training-data dedup pipeline)
    "q_dedup_clusters" -> ((s, dir) => {
      val docs = spread(t(s, dir, "documents"))
      val sig = Dedup.minhashSignatures(docs, k = 4, n = 3).persist()
      val pairs = Dedup.lshCandidatePairs(Dedup.lshBands(sig, k = 4, rowsPerBand = 2))
      Dedup.resolveClusters(docs, pairs)
        .orderBy("doc_id")
    }),

    // ext dedup: exact pairwise n-gram Jaccard on a bounded subset
    "q_jaccard_pairs" -> ((s, dir) => {
      Dedup.ngramJaccardPairs(
          spread(t(s, dir, "documents").filter(col("doc_id") < 100)), n = 3, threshold = 0.03)
        .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("id1", "id2")
    }),

    // ext dedup: prefix-filtered exact Jaccard (PPJoin-style) — same
    // answer as q_jaccard_pairs by construction (the prefix lemma
    // loses no pair at the threshold), so the ORACLE IS the naive
    // form's SQL; what changes is the work: only each doc's rarest
    // shingles enter the inverted index, so boilerplate postings never
    // explode the candidate space. Candidate reduction is unit-gated.
    "q_jaccard_prefix" -> ((s, dir) => {
      Dedup.jaccardPairsPrefix(
          spread(t(s, dir, "documents").filter(col("doc_id") < 100)), n = 3, threshold = 0.03)
        .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("id1", "id2")
    }),

    // ext dedup: INCREMENTAL dedup — the new ingest batch (doc_id >=
    // 400) matched against the existing corpus (< 400) through the
    // corpus' LSH band table, then exact-Jaccard verified. The
    // production shape: per-batch cost is one equi-join against
    // precomputed signatures, never corpus x corpus.
    "q_incr_dedup" -> ((s, dir) => {
      val docs = spread(t(s, dir, "documents"))
      Dedup.incrementalDupes(
          docs.filter(col("doc_id") < 400), docs.filter(col("doc_id") >= 400))
        .select(col("new_id"), col("old_id"), col("n_inter"),
          round(col("jaccard"), 6).as("jaccard"))
        .orderBy("new_id", "old_id")
    }),

    // classic OLAP shape #2 (TPC-H Q18): large-volume customers — an
    // aggregate-filtered key set semi-joined back into the detail.
    // The HAVING side aggregates ONCE (map-side combined), produces a
    // tiny key set, and broadcasts it into the second pass; the
    // detail never shuffles twice. Integer quantities keep every
    // aggregate exact.
    "q_tpch_q18ish" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val bigOrders = li.groupBy("l_orderkey")
        .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
        .filter(col("total_qty") > 300)
      t(s, dir, "orders")
        .join(broadcast(bigOrders), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          round(col("o_totalprice"), 2).as("o_totalprice"), col("total_qty"))
        .orderBy(desc("total_qty"), col("o_orderkey"))
        .limit(20)
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

    // ext corpus: n-gram novelty — the fraction of a doc's shingles
    // seen NOWHERE else in the corpus, the memorization/creativity
    // screen for synthetic and scraped data (novelty ~0 means the doc
    // is assembled from corpus boilerplate). Shingle→doc-count is one
    // map-side-combined aggregate; the per-doc ratio is exact counts +
    // one IEEE division.
    "q_novelty" -> ((s, dir) => {
      val sh = spread(t(s, dir, "documents"))
        .select(col("doc_id"), explode(Dedup.shingles(col("text"), 3)).as("shingle"))
        .distinct()
      val freq = sh.groupBy("shingle").agg(countDistinct("doc_id").as("df"))
      sh.join(freq, "shingle")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shingles"),
          count(when(col("df") === 1, 1)).as("n_unique"))
        .withColumn("novelty", round(col("n_unique").cast("double") / col("n_shingles"), 6))
        .orderBy("doc_id")
    }),

    // ext dedup: SimHash Hamming-radius near-dups (Manku/WWW'07) —
    // 4x16-bit chunk pigeonhole join guarantees every pair within
    // distance 3; bit_count(xor) verifies. The shingle-free dedup
    // path: 2 longs per doc instead of a shingle table.
    "q_simhash_dedup" -> ((s, dir) => {
      Dedup.simhashNearDupPairs(spread(t(s, dir, "documents")), maxHamming = 3)
        .orderBy("id1", "id2")
    }),

    // ext dedup: 16-bit SimHash per doc
    "q_simhash" -> ((s, dir) => {
      Dedup.simhash16(spread(t(s, dir, "documents"))).orderBy("doc_id")
    }),

    // ext dedup: production-width 64-bit SimHash (md5-slice form so the
    // oracle can mirror it; simhashXx is the Spark-only fast path)
    "q_simhash64" -> ((s, dir) => {
      Dedup.simhash64(spread(t(s, dir, "documents"))).orderBy("doc_id")
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
      val qs = Quantiles.exactQuantiles(li, "l_extendedprice",
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
      Quantiles.exactQuantilesDisc(t(s, dir, "lineitem"), "l_extendedprice",
          Seq("l_returnflag"), Seq(0.5, 0.95), Seq("p50_disc", "p95_disc"))
        .orderBy("l_returnflag")
    }),

    // ext capstone: the composed training-data pipeline — quality gate,
    // exact dedup keeping the first doc per normalized fingerprint,
    // then per-language corpus stats. Every stage is an already-oracled
    // operator; this gates their COMPOSITION.
    "q_corpus_pipeline" -> ((s, dir) => {
      val kept = TextStats.withQuality(spread(t(s, dir, "documents")))
        .filter(col("quality_score") >= 0.7)
        .select("doc_id", "text")
      val w = Window.partitionBy(Dedup.normalizedFingerprint(col("text")))
        .orderBy("doc_id")
      val canon = kept.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      canon
        .select(TextStats.langId(col("text")).as("lang_id"),
          TextStats.bpeishTokenCount(col("text")).as("n_bpeish"))
        .groupBy("lang_id")
        .agg(count(lit(1)).as("n_docs"), sum("n_bpeish").cast("long").as("total_tokens"))
        .orderBy("lang_id")
    }),

    // ext text: quality features + composite score
    "q_text_quality" -> ((s, dir) => {
      TextStats.withQuality(spread(t(s, dir, "documents")))
        .select(col("doc_id"), col("n_tokens"),
          round(col("punct_ratio"), 6).as("punct_ratio"),
          round(col("stopword_ratio"), 6).as("stopword_ratio"),
          round(col("mean_word_len"), 6).as("mean_word_len"),
          col("quality_score"))
        .orderBy("doc_id")
    }),

    // ext text: hashed-feature linear classifier inference — the
    // model-based quality filter shape (fasttext-style): tokens hash
    // to buckets, a broadcast WEIGHT TABLE scores them, mean-pool +
    // sigmoid per doc. Weights are a deterministic md5 stand-in
    // (TextStats.hashedModel scaladoc); the serving plumbing is real
    // and the oracle re-derives the identical model from the bucket
    // ids. keep is computed from the ROUNDED score in both engines so
    // the boolean can never disagree over a sub-ulp boundary.
    "q_quality_classifier" -> ((s, dir) => {
      val scored = TextStats.classifierScore(
        spread(t(s, dir, "documents")), TextStats.hashedModel(s, 1024), dim = 1024)
      scored
        .select(col("doc_id"), col("n_feats"),
          round(col("score"), 6).as("score"))
        .withColumn("keep", col("score") >= 0.5)
        .orderBy("doc_id")
    }),

    // ext text: heuristic language ID + BPE-ish token count
    "q_lang_tokens" -> ((s, dir) => {
      spread(t(s, dir, "documents"))
        .select(col("doc_id"),
          TextStats.langId(col("text")).as("lang_id"),
          TextStats.bpeishTokenCount(col("text")).as("n_bpeish"))
        .orderBy("doc_id")
    }),

    // ext similarity: exact brute-force cosine top-k (k=3, 5 queries)
    "q_sim_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(spread(emb), emb.filter(col("vec_id") < 5), k = 3)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("query_id", "rank")
    }),

    // ext similarity: random-hyperplane bucket histogram (the ANN
    // partitioner). Seeded hyperplane signs, not raw leading-component
    // signs: real embedding dims are correlated/non-centered, which
    // skews naive sign buckets badly.
    "q_embed_bucket" -> ((s, dir) => {
      spread(t(s, dir, "embeddings"))
        .groupBy(Similarity.hyperplaneBucket(col("embedding"), annPlanes).as("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy("bucket")
    }),

    // ext similarity: bucketed (LSH) ANN top-k — probe only the query's
    // hyperplane bucket; exact cosine within the bucket
    "q_ann_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.bucketedTopK(spread(emb), emb.filter(col("vec_id") < 8), k = 3, planes = annPlanes)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("query_id", "rank")
    }),

    // ext similarity: multi-probe ANN — each query also probes its
    // Hamming-1 neighbor buckets, recovering neighbors lost to a single
    // plane-sign flip
    "q_ann_multiprobe" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.bucketedTopK(spread(emb), emb.filter(col("vec_id") < 8), k = 3,
          planes = annPlanes, multiProbe = true)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("query_id", "rank")
    }),

    // ext similarity: embedding near-duplicate pairs via bucketed
    // self-join (cosine >= threshold within shared bucket). The oracle
    // pins the 4-plane literal form; q_embed_neardup_auto below gates
    // the production corpus-sized-plane path.
    "q_embed_neardup" -> ((s, dir) => {
      Similarity.embeddingNearDupPairs(spread(t(s, dir, "embeddings")),
          threshold = 0.2, planes = annPlanes)
        .select(col("id1"), col("id2"), round(col("cosine"), 6).as("cosine"))
        .orderBy("id1", "id2")
    }),

    // ext similarity: the PRODUCTION auto-plane path, oracle-gated —
    // bucketedTopKAuto derives ⌈log2(n/64)⌉ planes from the MEASURED
    // corpus count (3 planes at sf0.01's 500 vectors, 5 at sf0.1's
    // 2000), so buckets stay ~64 vectors and probe cost per query is
    // bounded as the corpus grows; the oracle re-derives the same
    // count by integer thresholds (sqlAutoPlaneCountCte) and gates a
    // 12-plane candidate set per-plane, so it adapts with the data
    // exactly like the engine.
    "q_ann_topk_auto" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.bucketedTopKAuto(spread(emb), emb.filter(col("vec_id") < 8),
          k = 3, targetBucketSize = 64)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("query_id", "rank")
    }),

    // ext similarity: semantic decontamination — flag corpus vectors
    // within cosine 0.2 of ANY eval vector (vec_id % 101 = 0 plays the
    // held-out eval set). The embedding-space complement of the n-gram
    // q_contamination: paraphrased leakage shares no shingle but still
    // sits next to the eval point. Pair space = eval × corpus within
    // shared buckets, eval broadcast — never corpus × corpus.
    "q_semantic_contamination" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val ev = emb.filter(col("vec_id") % 101 === 0)
      val corpus = spread(emb.filter(col("vec_id") % 101 =!= 0))
      Similarity.semanticContamination(corpus, ev, threshold = 0.2,
          planes = annPlanes)
        .orderBy("vec_id")
    }),

    // ext similarity: near-dup pairs with corpus-sized planes — the
    // linear-pair-work production form of q_embed_neardup (total pair
    // cost ~n·targetBucketSize instead of n²/2^planes at a literal)
    "q_embed_neardup_auto" -> ((s, dir) => {
      Similarity.embeddingNearDupPairsAuto(spread(t(s, dir, "embeddings")),
          threshold = 0.2, targetBucketSize = 64)
        .select(col("id1"), col("id2"), round(col("cosine"), 6).as("cosine"))
        .orderBy("id1", "id2")
    }),

    // ext similarity: SemDeDup — coarse-cluster the corpus (IVF
    // assignment to the 4 seed centroids), prune near-duplicates
    // within clusters only (smaller-id keeps), summarize survivors
    // per cluster. Cluster boundaries bound the pair space; the keep
    // rule is deterministic so the oracle reproduces it exactly.
    "q_semantic_dedup" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      // centroid count from the MEASURED corpus count (pure-integer
      // ceil, mirrored by the oracle): clusters stay ~128 vectors so
      // the within-cluster pair space is LINEAR in n — a fixed
      // centroid literal is n²/k forever (measured 18.5× at 10× data)
      val k = math.max(4L, (emb.count() + 127L) / 128L)
      Similarity.semanticDedup(spread(emb), emb.filter(col("vec_id") < k),
          threshold = 0.2)
        .groupBy("centroid_id")
        .agg(count(lit(1)).as("n_vectors"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("kept"), 0L).otherwise(1L)).as("n_dropped"))
        .orderBy("centroid_id")
    }),

    // ext similarity: IVF index build — every vector assigned to the
    // nearest (max-cosine) of the 4 seed centroids. Centroids
    // broadcast; the argmax is a map-side-combined hash aggregate, so
    // shuffle volume is one row per vector regardless of centroid count.
    "q_ivf_assign" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.ivfAssign(spread(emb), emb.filter(col("vec_id") < 4))
        .select(col("vec_id"), col("centroid_id"),
          round(col("centroid_cos"), 6).as("centroid_cos"))
        .orderBy("vec_id")
    }),

    // ext similarity: IVF ANN search — queries probe their 2 nearest
    // centroids' inverted lists; exact cosine ranks the candidates.
    // The data-adaptive quantizer counterpart of the hyperplane-bucket
    // ANN above (same partitionable equi-join shape).
    "q_ivf_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.ivfTopK(spread(emb), emb.filter(col("vec_id") < 4),
          emb.filter(col("vec_id") < 8), k = 3, nProbe = 2)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("query_id", "rank")
    }),

    // ext streaming: stateful dropDuplicates over the event stream —
    // first row per (user_id, event_type) — reduced to distinct-key
    // counts per type, the stream-order-independent summary (WHICH
    // duplicate survives depends on batch order; the key set doesn't).
    "q_stream_dedup" -> ((s, dir) => {
      EventsStream.runDedupOnce(s, s"$dir/events.parquet")
        .orderBy("event_type")
    }),

    // ext streaming: conversion funnel — click → purchase by the same
    // user within 10 minutes. The batch twin of the stream-stream
    // inner join (EventsStream.funnelStream, unit-gated equal): an
    // equi-join on the high-cardinality user key with the time window
    // as a residual predicate. Sub-second-exact deltas: timestamps are
    // microsecond-resolution, so round(.,6) on fractional epoch
    // seconds is the identity on both engines.
    "q_event_funnel" -> ((s, dir) => {
      EventsStream.funnelBatch(
          EventsStream.readEvents(s, s"$dir/events.parquet"), windowSec = 600)
        .select(col("user_id"), col("click_id"), col("purchase_id"),
          round(col("purchase_ts").cast("double") - col("click_ts").cast("double"), 6)
            .as("secs_to_convert"))
        .orderBy("click_id", "purchase_id")
    }),

    // ext streaming: the REAL stream-stream join run to completion —
    // same oracle as the batch twin above (inner joins emit exactly
    // the batch rows on bounded input)
    "q_event_funnel_stream" -> ((s, dir) => {
      EventsStream.runFunnelOnce(s, s"$dir/events.parquet", windowSec = 600)
        .select(col("user_id"), col("click_id"), col("purchase_id"),
          round(col("purchase_ts").cast("double") - col("click_ts").cast("double"), 6)
            .as("secs_to_convert"))
        .orderBy("click_id", "purchase_id")
    }),

    // ext streaming: stream-stream LEFT OUTER funnel — unmatched
    // clicks emit with null purchase, but only once the watermark
    // passes their last possible match time (click_ts + window). The
    // oracle encodes that contract: matched pairs ∪ unmatched clicks
    // whose window closed under the final watermark = min of the two
    // sides' (max event time − 30 min), in ms. The trailing clicks
    // stay buffered — that's the operator's latency, not a bug.
    "q_event_funnel_outer" -> ((s, dir) => {
      EventsStream.runFunnelOuterOnce(s, s"$dir/events.parquet", windowSec = 600)
        .select(col("user_id"), col("click_id"), col("purchase_id"),
          round(col("purchase_ts").cast("double") - col("click_ts").cast("double"), 6)
            .as("secs_to_convert"))
        .orderBy("click_id", "purchase_id")
    }),

    // multi-way join: the classic pricing-summary shape — selective dim
    // filter broadcast into the orders join, then a shuffle join on the
    // fact key and a top-N. Revenue is floored per lineitem before the
    // sum: exact int64 arithmetic both engines, immune to
    // partition-order reassociation drift.
    "q_mway_join" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1996-01-01"))
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1996-01-01"))
        .select(col("l_orderkey"),
          floor(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      li.join(ord.join(broadcast(cust), col("o_custkey") === col("c_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum("rev").cast("long").as("revenue"))
        .orderBy(desc("revenue"), asc("l_orderkey"))
        .limit(10)
        .select(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          col("revenue"))
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

    // null-safe equi-join (<=>): a masked key (nullif collapses the
    // URGENT tier to null) still joins its null group 1:1 against the
    // dim — IS NOT DISTINCT FROM semantics. Catalyst plans EqualNullSafe
    // as a proper equi-join key (hash/sort-merge-able), NOT a cartesian
    // with a filter — which is what makes the operator usable at scale.
    "q_nullsafe_join" -> ((s, dir) => {
      val masked = expr("nullif(o_orderpriority, '1-URGENT')")
      val agg = t(s, dir, "orders")
        .groupBy(masked.as("pri_key"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("o_totalprice"))).as("total_floor"))
      val dim = t(s, dir, "orders")
        .select(masked.as("pri_key2")).distinct()
        .withColumn("label", coalesce(col("pri_key2"), lit("URGENT (masked)")))
      agg.join(broadcast(dim), col("pri_key") <=> col("pri_key2"))
        .select(col("pri_key"), col("label"), col("n"), col("total_floor"))
        .orderBy("label")
    }),

    // rank-family windows: ntile quartiles + percent_rank + cume_dist.
    // The window order includes the unique key so ntile's row order —
    // and therefore every output — is total and engine-independent.
    "q_ntile" -> ((s, dir) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(asc("o_totalprice"), asc("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_orderpriority"), col("o_orderkey"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cum_dist"))
        .orderBy("o_orderpriority", "o_orderkey")
    }),

    // ext text: TF/DF — top-3 terms per doc by term frequency with the
    // corpus document frequency joined back (the distributed TF-IDF
    // skeleton; tf/df are exact ints so the ranking is engine-exact —
    // the idf float enters only where a caller accepts float output)
    "q_tf_df" -> ((s, dir) => {
      val w = Window.partitionBy("doc_id").orderBy(desc("tf"), asc("term"))
      // no spread(): the 100-doc slice is tiny — a 32-way repartition
      // would cost more than the explode it feeds
      TextStats.termDocFrequency(
          t(s, dir, "documents").filter(col("doc_id") < 100))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("doc_id"), col("rnk"), col("term"), col("tf"), col("df"))
        .orderBy("doc_id", "rnk")
    }),

    // ext text: winnowing-style rolling fingerprint — min md5 over
    // strided character 8-gram windows of normalized text; one narrow
    // codegen'd expression, no shuffle
    "q_doc_fingerprint" -> ((s, dir) => {
      spread(t(s, dir, "documents"))
        .select(col("doc_id"),
          TextStats.minShingleFingerprint(col("text"), w = 8, stride = 4).as("fp8"))
        .orderBy("doc_id")
    }),

    // ext multimodal: hash-derived feature vector — the SQL-only
    // feature path (bit-identical to the batched mapPartitions stub,
    // unit-asserted); features are exact multiples of 1/256 so the
    // cross-engine compare is drift-free
    "q_media_features" -> ((s, dir) => {
      val media = Multimodal.asMedia(spread(t(s, dir, "documents")), "doc_id", "text", "image")
      val f = Multimodal.sqlFeatures(col("payload"), 4)
      media.select(col("media_id") +:
          (0 until 4).map(j => round(element_at(f, j + 1), 6).as(s"f$j")): _*)
        .orderBy("media_id")
    }),

    // ext multimodal: per-partition batched decode (stub codec) metadata
    // multimodal step 0: two-level binary dedup — hash the first
    // 64-byte CHUNK as the cheap prefilter, confirm with the full
    // content hash (dedup BEFORE decode: a chunk hash costs a fraction
    // of a scan, a codec costs orders more). Groups sharing a header
    // chunk are dedup candidates; n_distinct_full separates true
    // copies from header-only collisions that need a byte compare.
    // Payloads are ASCII here (probed at every SF), so DuckDB's char
    // slicing equals Spark's byte slicing — the q_frame_sample device.
    "q_media_dedup" -> ((s, dir) => {
      Multimodal.asMedia(spread(t(s, dir, "documents")), "doc_id", "text", "image")
        .select(col("media_id"),
          md5(substring(col("payload"), 1, 64)).as("chunk_md5"),
          md5(col("payload")).as("full_md5"))
        .groupBy("chunk_md5")
        .agg(min("media_id").as("keep_id"), count(lit(1)).as("n_copies"),
          countDistinct("full_md5").as("n_distinct_full"))
        .filter(col("n_copies") > 1)
        .orderBy("keep_id")
    }),

    // cohort LTV curve: cumulative revenue per signup-week cohort by
    // week offset, plus integer cents-per-user — the revenue twin of
    // q_cohort_retention. Cents are exact longs; the cumulative window
    // runs over the (cohort, offset) grid, never rows.
    "q_cohort_ltv" -> ((s, dir) => {
      val ev = EventsStream.readEvents(s, s"$dir/events.parquet")
        .select(col("user_id"), col("ts"), floor(col("value") * 100).as("cents"))
      val firsts = ev.groupBy("user_id")
        .agg(date_trunc("week", min(col("ts"))).as("cw"))
      val sizes = firsts.groupBy("cw")
        .agg(countDistinct("user_id").as("cohort_users"))
      val grid = ev.join(firsts, "user_id")
        .groupBy(col("cw"),
          expr("datediff(cast(date_trunc('week', ts) as date), cast(cw as date)) div 7")
            .cast("int").as("week_offset"))
        .agg(sum("cents").as("rev_cents"))
      grid
        .withColumn("cum_rev_cents",
          sum("rev_cents").over(Window.partitionBy("cw").orderBy("week_offset")))
        .join(broadcast(sizes), "cw")
        .select(date_format(col("cw"), "yyyy-MM-dd").as("cohort_week"),
          col("week_offset"), col("rev_cents"), col("cum_rev_cents"),
          expr("cum_rev_cents DIV cohort_users").as("ltv_cents_per_user"))
        .orderBy("cohort_week", "week_offset")
    }),

    "q_multimodal_meta" -> ((s, dir) => {
      Multimodal.decodeBatches(
          Multimodal.asMedia(spread(t(s, dir, "documents")), "doc_id", "text", "image"))
        .toDF()
        .orderBy("media_id")
    }),

    // ext multimodal: frame-sampling plumbing. Oracle-able because the
    // synthetic documents are pure ASCII (verified at every SF), so
    // DuckDB's char-slicing equals Spark's byte-slicing of the payload.
    "q_frame_sample" -> ((s, dir) => {
      Multimodal.sampleFrames(
          Multimodal.asMedia(spread(t(s, dir, "documents")), "doc_id", "text", "image"),
          frameBytes = 64, stride = 2)
        .select(col("media_id"), col("frame_idx"), md5(col("frame")).as("frame_md5"))
        .orderBy("media_id", "frame_idx")
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

    // sequence mining: first-order Markov transition counts over each
    // user's event stream (lead window keyed by high-cardinality
    // user_id, then one hash aggregate over the tiny type×type grid).
    // Transition probability = one division of exact longs — bit-stable
    // cross-engine, no rounding.
    "q_event_transitions" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val steps = EventsStream.readEvents(s, s"$dir/events.parquet")
        .select(col("user_id"), col("event_type").as("from_type"),
          lead(col("event_type"), 1).over(w).as("to_type"))
        .filter(col("to_type").isNotNull)
      steps.groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
        .withColumn("p",
          col("n").cast("double") /
            sum("n").over(Window.partitionBy("from_type")).cast("double"))
        .orderBy("from_type", "to_type")
    }),

    // ext scale: incremental aggregate maintenance (materialized-view
    // merge). State = mergeable partials (n, Σ) per key; a new
    // partition folds in WITHOUT rescanning history — merged state is
    // a groupBy-sum over state(base) ∪ state(delta). The oracle
    // recomputes from the full table, so the gate proves merged ==
    // full: a 100-TB pipeline maintains its rollups by reading only
    // the new day, never the history.
    "q_incr_agg" -> ((s, dir) => {
      val ev = EventsStream.readEvents(s, s"$dir/events.parquet")
      def state(df: DataFrame): DataFrame =
        df.groupBy("event_type").agg(count(lit(1)).as("n"), sum("value").as("s"))
      val base = state(ev.filter(to_date(col("ts")) < lit("2024-01-21")))
      val delta = state(ev.filter(to_date(col("ts")) >= lit("2024-01-21")))
      base.unionByName(delta)
        .groupBy("event_type")
        .agg(sum("n").as("n_events"), sum("s").as("s_raw"))
        .select(col("event_type"), col("n_events"),
          round(col("s_raw"), 4).as("total_value"),
          round(col("s_raw") / col("n_events"), 4).as("avg_value"))
        .orderBy("event_type")
    }),

    // ANALYZE-style column profiling: ONE pass computes per-column
    // null count / exact distinct count / min / max for four measures
    // (multiple exact count-distincts plan through Expand, cf.
    // q_count_distinct), then reshapes to a row per column. At real
    // profiler scale swap count_distinct for approx_count_distinct —
    // same single-pass shape, bounded memory.
    "q_column_profile" -> ((s, dir) => {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val aggs = cols.flatMap(c => Seq(
        count(col(c)).as(s"${c}_n"),
        countDistinct(col(c)).as(s"${c}_d"),
        min(col(c)).cast("double").as(s"${c}_min"),
        max(col(c)).cast("double").as(s"${c}_max")))
      val row = t(s, dir, "lineitem").agg(count(lit(1)).as("n_rows"), aggs: _*)
      val structs = array(cols.map(c => struct(
        lit(c).as("col_name"),
        (col("n_rows") - col(s"${c}_n")).as("n_nulls"),
        col(s"${c}_d").as("n_distinct"),
        col(s"${c}_min").as("min_v"),
        col(s"${c}_max").as("max_v"))): _*)
      row.select(explode(structs).as("p")).select("p.*").orderBy("col_name")
    }),

    // ext capstone: ENSEMBLE dedup — surface duplicates (MinHash-LSH
    // text pairs) unioned with semantic duplicates (hyperplane-bucketed
    // embedding pairs), resolved TOGETHER by connected components into
    // one cluster space, which is how production training-data dedup
    // actually runs (near-identical text and paraphrases must collapse
    // into the same cluster, not two overlapping cluster sets). The
    // doc_id == vec_id linkage holds in the testdata by construction
    // (both tables enumerate the same corpus).
    "q_dedup_ensemble" -> ((s, dir) => {
      val docs = spread(t(s, dir, "documents"))
      val sig = Dedup.minhashSignatures(docs, k = 4, n = 3).persist()
      val txtPairs = Dedup.lshCandidatePairs(Dedup.lshBands(sig, k = 4, rowsPerBand = 2))
        .select(col("id1"), col("id2"))
      val embPairs = Similarity.embeddingNearDupPairs(
          spread(t(s, dir, "embeddings")), threshold = 0.2, planes = annPlanes)
        .select(col("id1"), col("id2"))
      Dedup.resolveClusters(docs, txtPairs.unionByName(embPairs))
        .groupBy("cluster_id").agg(count(lit(1)).as("n_members"))
        .filter(col("n_members") > 1)
        .orderBy("cluster_id")
    }),

    // ext eval: MinHash calibration — the signature-agreement Jaccard
    // estimate (k-permutation match fraction, exact multiples of 1/4)
    // against the TRUE n-gram Jaccard, per LSH candidate pair on a
    // bounded doc subset. The "measure, don't guess" check a pipeline
    // runs before trusting k and the banding scheme at full scale;
    // both columns are exact-integer ratios, drift-free cross-engine.
    "q_minhash_eval" -> ((s, dir) => {
      val docs = spread(t(s, dir, "documents")).filter(col("doc_id") < 200)
      val sig = Dedup.minhashSignatures(docs, k = 4, n = 3).persist()
      val cand = Dedup.lshCandidatePairs(Dedup.lshBands(sig, k = 4, rowsPerBand = 2))
      val s1 = sig.select(col("doc_id").as("id1"),
        col("mh0").as("a0"), col("mh1").as("a1"), col("mh2").as("a2"), col("mh3").as("a3"))
      val s2 = sig.select(col("doc_id").as("id2"),
        col("mh0").as("b0"), col("mh1").as("b1"), col("mh2").as("b2"), col("mh3").as("b3"))
      val est = cand.join(s1, "id1").join(s2, "id2")
        .select(col("id1"), col("id2"),
          ((0 until 4).map(i => (col(s"a$i") === col(s"b$i")).cast("int"))
            .reduce(_ + _).cast("double") / lit(4.0)).as("est_jaccard"))
      val exact = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.0)
        .select(col("id1"), col("id2"), col("jaccard").as("true_jaccard"))
      est.join(exact, Seq("id1", "id2"), "left")
        .select(col("id1"), col("id2"), col("est_jaccard"),
          round(coalesce(col("true_jaccard"), lit(0.0)), 6).as("true_jaccard"))
        .orderBy("id1", "id2")
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

    // streaming keyed UPSERT: the latest-row-per-user snapshot
    // maintained by foreachBatch generations (streaming MERGE INTO
    // without a table format; replay rewrites its own generation
    // byte-identically — EventsStream.maintainSnapshot scaladoc). The
    // oracle recomputes latest-by-key from the whole event history, so
    // the gate proves stream-maintained == batch-recomputed.
    "q_stream_upsert" -> ((s, dir) => {
      val snap = java.nio.file.Files.createTempDirectory("graft_upsert_snap").toString
      EventsStream.maintainSnapshot(
        EventsStream.readEventsStream(s, s"$dir/events.parquet")
          .select("user_id", "event_id", "event_type", "ts", "value"),
        Seq("user_id"), Seq("ts", "event_id"), snap,
        java.nio.file.Files.createTempDirectory("graft_upsert_ckpt").toString)
      EventsStream.readSnapshot(s, snap)
        .select(col("user_id"), col("event_id"), col("event_type"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_s"),
          col("value"))
        .orderBy("user_id")
    }),

    "q_stream_rollup" -> ((s, dir) => {
      val state = java.nio.file.Files.createTempDirectory("graft_rollup_state").toString
      EventsStream.maintainRollup(
        EventsStream.readEventsStream(s, s"$dir/events.parquet"),
        Seq("event_type"), "value", state,
        java.nio.file.Files.createTempDirectory("graft_rollup_ckpt").toString)
      EventsStream.readRollup(s, state, Seq("event_type"))
        .select(col("event_type"), col("n_events"),
          round(col("s_raw"), 4).as("total_value"),
          round(col("s_raw") / col("n_events"), 4).as("avg_value"))
        .orderBy("event_type")
    }),

    // graph analytics over the embedding near-dup pair graph: degree,
    // per-node triangle count (ordered two-path + closing-edge join —
    // the standard distributed triangle enumeration; intermediate size
    // Σ deg², bounded by the near-dup thresholds), and local
    // clustering coefficient (two FP ops over exact ints, bit-stable).
    "q_graph_stats" -> ((s, dir) => {
      val e = Similarity.embeddingNearDupPairs(
          spread(t(s, dir, "embeddings")), threshold = 0.2, planes = annPlanes)
        .select("id1", "id2").persist()
      val deg = e.select(col("id1").as("id"))
        .unionAll(e.select(col("id2").as("id")))
        .groupBy("id").agg(count(lit(1)).as("degree"))
      val tri = e.as("ab").join(e.as("bc"), col("ab.id2") === col("bc.id1"))
        .select(col("ab.id1").as("a"), col("ab.id2").as("b"), col("bc.id2").as("c"))
        .join(e.as("ac"), col("a") === col("ac.id1") && col("c") === col("ac.id2"))
        .select("a", "b", "c")
      val triPerNode = tri
        .select(explode(array(col("a"), col("b"), col("c"))).as("id"))
        .groupBy("id").agg(count(lit(1)).as("n_tri"))
      deg.join(triPerNode, Seq("id"), "left")
        .withColumn("n_tri", coalesce(col("n_tri"), lit(0L)))
        .withColumn("lcc", when(col("degree") > 1,
            col("n_tri").cast("double") * lit(2.0) /
              (col("degree") * (col("degree") - 1)).cast("double"))
          .otherwise(lit(0.0)))
        .select("id", "degree", "n_tri", "lcc")
        .orderBy("id")
    }),

    // ext dedup: quality-aware canonical selection — clusters resolve
    // as in q_dedup_clusters, but the kept doc is the HIGHEST
    // quality_score member (ties → smallest id), via one
    // map-side-combining max_by per cluster (resolveClustersBy
    // scaladoc). quality_score is categorical after round(.,2), so
    // the argmax is drift-free cross-engine.
    "q_dedup_keep_best" -> ((s, dir) => {
      val docs = TextStats.withQuality(spread(t(s, dir, "documents")))
      val sig = Dedup.minhashSignatures(docs, k = 4, n = 3).persist()
      val pairs = Dedup.lshCandidatePairs(Dedup.lshBands(sig, k = 4, rowsPerBand = 2))
      Dedup.resolveClustersBy(docs, pairs, "quality_score")
        .orderBy("doc_id")
    }),

    // ext corpus: source mixture balancing — every source is sampled
    // down to the smallest source's token total (balance-down mixture),
    // by taking docs in md5 order until the token budget is spent
    // (cumulative window per source; membership = exact-int
    // take-while, deterministic and layout-independent). The real
    // knob a training pipeline turns when one crawl dwarfs the rest.
    "q_mixture_balance" -> ((s, dir) => {
      val docs = spread(t(s, dir, "documents"))
        .select(col("doc_id"), col("source"),
          size(TextStats.tokens(col("text"))).cast("long").as("n_tok"))
      val totals = docs.groupBy("source").agg(sum("n_tok").as("total_tokens"))
      val budget = totals.agg(min("total_tokens").as("budget"))
      val w = Window.partitionBy("source")
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      docs
        .withColumn("cum", sum("n_tok").over(w))
        .crossJoin(broadcast(budget))
        .filter(col("cum") - col("n_tok") < col("budget"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs_kept"), sum("n_tok").as("tokens_kept"))
        .join(totals, "source")
        .orderBy("source")
    }),

    // ext corpus: vocabulary growth curve (Heaps'-law probe) — distinct
    // 3-gram shingle count as successive contiguous tenths of the
    // corpus arrive; a shingle counts for the FIRST decile that
    // contains it (min-bucket agg, map-side combined), so the curve is
    // one small cumulative window over 10 rows. All-integer,
    // drift-free. (Shingles, not unigrams: the synthetic corpus has a
    // ~31-token vocabulary, fully covered by decile 0 — the trigram
    // space is what actually grows.)
    "q_vocab_growth" -> ((s, dir) => {
      val docs = spread(t(s, dir, "documents"))
      val mx = docs.agg(max("doc_id").as("mx"))
      docs.crossJoin(broadcast(mx))
        .select(expr("doc_id * 10 div (mx + 1)").as("bucket"),
          explode(Dedup.shingles(col("text"), 3)).as("shingle"))
        .groupBy("shingle").agg(min("bucket").as("first_bucket"))
        .groupBy("first_bucket").agg(count(lit(1)).as("new_terms"))
        .withColumn("cum_vocab",
          sum("new_terms").over(Window.orderBy("first_bucket")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .orderBy("first_bucket")
    }),

    // ext streaming: the REAL streaming form of q_session_window —
    // built-in session_window over a watermarked stream, update-mode
    // bounded harness (EventsStream.sessionWindowStream scaladoc for
    // the output-mode reasoning). Same oracle as the batch twin.
    "q_session_window_stream" -> ((s, dir) => {
      val sess = EventsStream.runSessionWindowOnce(s, s"$dir/events.parquet",
        queryName = s"sess_win_${java.util.UUID.randomUUID().toString.replace("-", "")}")
      sess
        .withColumn("sess_id",
          row_number().over(
            Window.partitionBy("user_id").orderBy("session_start")).cast("long"))
        .select(col("user_id"), col("sess_id"),
          date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
          col("n_events"))
        .orderBy("user_id", "sess_id")
    }),

    // ext: as-of join, FORWARD direction (pandas merge_asof
    // direction='forward'): earliest right ≥ left — the same
    // one-shuffle union-and-carry as q_asof_join run in reverse time
    // order. Oracle: DuckDB native ASOF with the inequality flipped.
    "q_asof_forward" -> ((s, dir) => {
      val ev = EventsStream.readEvents(s, s"$dir/events.parquet")
      val daily = ev
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(round(sum("value"), 2).as("day_total"))
        .filter(dayofmonth(col("day")) % 3 === 0)
      AsofJoin.asofJoinLast(
          ev.select("event_id", "ts", "user_id"), daily,
          keyCols = Seq("user_id"), leftTime = "ts", rightTime = "day",
          payloadCols = Seq("day", "day_total"), direction = "forward")
        .select(col("event_id"), col("user_id"),
          date_format(col("day"), "yyyy-MM-dd").as("asof_day"), col("day_total"))
        .orderBy("event_id")
    }),

    // ext: as-of join, NEAREST direction (pandas merge_asof
    // direction='nearest'): smallest |Δt|, ties → backward. Both
    // directional carries share one key partitioning; the oracle
    // recombines DuckDB's two native ASOF directions with the same
    // tie rule.
    "q_asof_nearest" -> ((s, dir) => {
      val ev = EventsStream.readEvents(s, s"$dir/events.parquet")
      val daily = ev
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(round(sum("value"), 2).as("day_total"))
        .filter(dayofmonth(col("day")) % 3 === 0)
      AsofJoin.asofJoinNearest(
          ev.select("event_id", "ts", "user_id"), daily,
          keyCols = Seq("user_id"), leftTime = "ts", rightTime = "day",
          payloadCols = Seq("day", "day_total"))
        .select(col("event_id"), col("user_id"),
          date_format(col("day"), "yyyy-MM-dd").as("asof_day"), col("day_total"))
        .orderBy("event_id")
    }),

    // lake lineage: the hidden `_metadata` column on file sources —
    // per-row provenance (file name, size) with zero storage cost,
    // what incremental pipelines and debugging joins key on. Oracled
    // via DuckDB's filename virtual column.
    "q_file_metadata" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(col("_metadata.file_name").as("file_name"), col("l_orderkey"))
        .groupBy("file_name")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct("l_orderkey").as("n_orders"))
        .orderBy("file_name")
    }),

    // join family completion: broadcast NON-EQUI range lookup — a tiny
    // interval dimension (price bands) broadcast against the fact side,
    // planned as BroadcastNestedLoopJoin. The RIGHT shape when the
    // interval dim is small (bands, brackets, tiers): per-row cost is
    // a scan of ~10 broadcast rows, no shuffle at all. Contrast
    // q_range_join, the binned equi-rewrite for big-big interval
    // joins — picking between the two by dim size IS the scale
    // decision, and each is pinned by its own plan test.
    "q_range_lookup" -> ((s, dir) => {
      val bands = s.range(10).select(
        col("id").cast("int").as("band_id"),
        (col("id") * 10000).cast("double").as("lo"),
        ((col("id") + 1) * 10000).cast("double").as("hi"))
      t(s, dir, "lineitem")
        .join(broadcast(bands),
          col("l_extendedprice") >= col("lo") && col("l_extendedprice") < col("hi"),
          "left")
        .groupBy("band_id")
        .agg(count(lit(1)).as("n_rows"),
          round(min("l_extendedprice"), 2).as("min_price"),
          round(max("l_extendedprice"), 2).as("max_price"))
        .orderBy("band_id")
    }),

    // ext dedup: asymmetric n-gram CONTAINMENT — the superset-duplicate
    // detector Jaccard misses (a doc embedded in a larger doc scores
    // near-zero Jaccard but 1.0 containment on the smaller side). Same
    // inverted-index join as q_jaccard_pairs; bigrams + a 0.25 gate on
    // the larger-side ratio keep the demo non-vacuous on synthetic text.
    "q_containment" -> ((s, dir) => {
      Dedup.containmentPairs(
          spread(t(s, dir, "documents").filter(col("doc_id") < 100)), n = 2, threshold = 0.25)
        .select(col("id1"), col("id2"), col("n_inter"),
          round(col("c1"), 6).as("c1"), round(col("c2"), 6).as("c2"),
          round(col("containment"), 6).as("containment"))
        .orderBy("id1", "id2")
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

    // ML-ops: purged expanding-window time-series CV folds (sklearn
    // TimeSeriesSplit + embargo) — fold boundaries are exact integer
    // indices on the calendar-bounded day grid, broadcast as K rows;
    // the data-sized cost is one narrow labeling pass, no shuffle.
    "q_ts_cv_folds" -> ((s, dir) => {
      ScaleOps.tsCvFolds(
          EventsStream.readEvents(s, s"$dir/events.parquet"),
          col("ts"), nFolds = 5, embargoDays = 3)
        .select(col("fold"), col("n_train_rows"), col("n_test_rows"),
          date_format(col("train_end"), "yyyy-MM-dd").as("train_end"),
          date_format(col("test_start"), "yyyy-MM-dd").as("test_start"),
          date_format(col("test_end"), "yyyy-MM-dd").as("test_end"))
        .orderBy("fold")
    }),

    // ext similarity: int8-quantized approximate top-k — the
    // memory-bandwidth scale path (4× smaller vectors; the quantized
    // table is the serving artifact). qdot is EXACT integer
    // arithmetic; the approximate score is two IEEE multiplies over
    // it, so ranks are bit-reproducible cross-engine. Rerank the
    // survivors with exact cosine on the float originals at serving
    // time (q_sim_topk's kernel).
    "q_quantized_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.quantizedTopK(spread(emb), emb.filter(col("vec_id") < 8), k = 3)
        .select(col("query_id"), col("rank"), col("neighbor_id"), col("qdot"),
          round(col("approx_dot"), 6).as("approx_dot"))
        .orderBy("query_id", "rank")
    }),

    // ext eval: hard-negative mining — per query, the nearest
    // neighbors with a DIFFERENT ground-truth label, the contrastive
    // training pairs that teach a retriever its decision boundary.
    // Label mismatch sits in the broadcast join condition, so
    // same-label pairs never materialize a score.
    "q_hard_negatives" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.hardNegatives(spread(emb), emb.filter(col("vec_id") < 8), k = 2)
        .select(col("query_id"), col("rank"), col("neighbor_id"), col("n_label"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("query_id", "rank")
    }),

    // time series: exponentially weighted moving average — the
    // recursion s_t = α·x_t + (1−α)·s_{t−1} that no window function
    // expresses (weights depend on distance, state on all history).
    // Executed as ONE sequential `aggregate` (fold) per series over the
    // collected per-(type, day) grid: the fold evaluates s_t in exactly
    // the recursion's op order (0.3·x + 0.7·s_prev, left to right), so
    // results stay bit-equal with the DuckDB RECURSIVE-CTE oracle given
    // identical inputs — which the round(2) on daily totals guarantees.
    // (An earlier native recursive-CTE form computed the same values in
    // ~30 iterative joins — one driver-scheduled job per day; the fold
    // is one job. q_recursive_cte keeps the native recursion covered.)
    // Scale: the fold holds ONE series in memory (days per type —
    // bounded by the grid contract), parallel across series.
    "q_ewma" -> ((s, dir) => {
      EventsStream.readEvents(s, s"$dir/events.parquet")
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(round(sum("value"), 2).as("day_total"))
        .select(col("event_type"),
          date_format(col("day"), "yyyy-MM-dd").as("day"), col("day_total"))
        .groupBy("event_type")
        .agg(sort_array(collect_list(struct(col("day"), col("day_total"))))
          .as("ser"))
        .select(col("event_type"), explode(expr(
          """aggregate(ser,
            |  CAST(array() AS ARRAY<STRUCT<day: STRING, day_total: DOUBLE, s: DOUBLE>>),
            |  (acc, p) -> array_append(acc, named_struct(
            |    'day', p.day, 'day_total', p.day_total,
            |    's', CASE WHEN size(acc) = 0 THEN p.day_total
            |              ELSE 0.3D * p.day_total + 0.7D * element_at(acc, -1).s
            |         END)))""".stripMargin)).as("r"))
        .select(col("event_type"), col("r.day").as("day"),
          col("r.day_total").as("day_total"), round(col("r.s"), 6).as("ewma"))
        .orderBy("event_type", "day")
    }),

    // the LONG-series form of the same EWMA: the segmented-scan
    // decomposition (chunk → affine summary A·s_in+B → boundary fold →
    // in-chunk re-fold) that bounds per-task memory at
    // O(chunk + len/chunk) instead of collecting whole series
    // (Forecast.ewmaChunked scaladoc). chunkSize=16 forces every
    // series through MANY boundary compositions, so the gate grades
    // the fallback path itself; round-6 equality with the sequential
    // recursive-CTE oracle is ForecastChunkedSpec-gated on this grid.
    "q_ewma_chunked" -> ((s, dir) => {
      val daily = EventsStream.readEvents(s, s"$dir/events.parquet")
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(round(sum("value"), 2).as("day_total"))
        .select(col("event_type"),
          date_format(col("day"), "yyyy-MM-dd").as("day"), col("day_total"))
      Forecast.ewmaChunked(daily, Seq("event_type"), "day", "day_total",
          alpha = 0.3, chunkSize = 16)
        .select(col("event_type"), col("day"), col("day_total"),
          round(col("ewma"), 6).as("ewma"))
        .orderBy("event_type", "day")
    }),

    // Holt level+trend through the same long-series fallback: per-chunk
    // 2×2 affine-map composition, 2-state boundary fold, in-chunk
    // re-fold (Forecast.holtChunked scaladoc).
    "q_holt_chunked" -> ((s, dir) => {
      val daily = EventsStream.readEvents(s, s"$dir/events.parquet")
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(round(sum("value"), 2).as("day_total"))
        .select(col("event_type"),
          date_format(col("day"), "yyyy-MM-dd").as("day"), col("day_total"))
      Forecast.holtChunked(daily, Seq("event_type"), "day", "day_total",
          alpha = 0.5, beta = 0.3, chunkSize = 16)
        .select(col("event_type"), col("day"), col("day_total"),
          round(col("level"), 6).as("level"), round(col("trend"), 6).as("trend"),
          round(col("level") + col("trend"), 6).as("forecast_next"))
        .orderBy("event_type", "day")
    }),

    // robust feature preprocessing: winsorization — clamp the tails to
    // the per-group [p05, p95] before aggregating. Percentiles come
    // from the SAME scale path as q_percentiles (distinct-value counts
    // + cumulative window, no per-group value buffer); the clamp is a
    // broadcast join-back plus least/greatest. Counts are exact ints;
    // the winsorized mean is over ~identical magnitudes, rounded 1e-4.
    "q_winsorize" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val bounds = Quantiles.exactQuantiles(li, "l_extendedprice",
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

    // ext eval: ANN recall@k — the quality metric that justifies (or
    // vetoes) swapping brute force for the hyperplane index: per
    // query, |ANN top-k ∩ exact top-k| / k. Integer overlap counts +
    // one IEEE division, drift-free. At corpus scale the exact side
    // runs on a hash-sampled query subset (the q_hash_sample pattern)
    // — recall needs a few hundred queries, never the corpus.
    "q_ann_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 8)
      val exact = Similarity.bruteForceTopK(spread(emb), queries, k = 3)
        .select(col("query_id"), col("neighbor_id"))
      val ann = Similarity.bucketedTopK(spread(emb), queries, k = 3, planes = annPlanes)
        .select(col("query_id"), col("neighbor_id"))
      val hits = exact.join(ann, Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy("query_id").agg(count(lit(1)).as("n_hit"))
      queries.select(col("vec_id").as("query_id"))
        .join(hits, Seq("query_id"), "left")
        .select(col("query_id"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"),
          round(coalesce(col("n_hit"), lit(0L)) / 3.0, 6).as("recall_at_3"))
        .orderBy("query_id")
    }),

    // Spark 4 VARIANT type: the open-schema semi-structured path —
    // parse_json once into a binary VARIANT column, extract typed
    // fields with variant_get path expressions. Unlike q_props_extract
    // (from_json needs the schema up front), VARIANT keeps the full
    // document queryable when the schema is unknown or drifting — the
    // lakehouse answer to a props/metadata column. Shredded parquet
    // storage makes repeated extraction columnar at scale.
    // VARIANT ingestion: parse_json the props payload, typed-path
    // extract the integer field, aggregate. The engine-rendered
    // schema_of_variant string is asserted in a unit test
    // (VariantSpec), NOT gated here — an engine-rendered rendering is
    // not a stable cross-version oracle value.
    "q_variant_extract" -> ((s, dir) => {
      spread(EventsStream.readEvents(s, s"$dir/events.parquet"))
        .select(col("event_type"),
          parse_json(col("props")).as("v"))
        .select(col("event_type"),
          expr("variant_get(v, '$.k', 'long')").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          sum("k").cast("long").as("k_sum"),
          min("k").as("k_min"),
          max("k").as("k_max"))
        .orderBy("event_type")
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

    // ext retrieval: BM25 lexical scoring — the canonical text ranker
    // and the lexical half of hybrid RAG retrieval. tf filters to the
    // query's terms BEFORE the shuffle (posting-list read, not a scan
    // per query); df/avgLen are corpus stats a deployment precomputes.
    // Every float input is an exact integer; per-doc term-weight sums
    // (≤3 addends) are rounded 1e-6 to absorb accumulation order.
    "q_bm25" -> ((s, dir) => {
      TextStats.bm25(spread(t(s, dir, "documents")),
          terms = Seq("spark", "table", "fast"))
        .select(col("doc_id"), col("n_terms_matched"),
          round(col("bm25"), 6).as("bm25"))
        .orderBy("doc_id")
    }),

    // ext retrieval: hybrid lexical+vector fusion by reciprocal rank
    // (RRF, the standard hybrid-search combiner): each ranker
    // contributes 1/(60+rank); docs missing from one ranking get only
    // the other's term. Ranks are assigned over ROUNDED scores with id
    // tie-breaks, so rank assignment — and therefore the fused score —
    // is deterministic cross-engine. doc i's embedding is vector i in
    // the testdata, making the id spaces fuse directly.
    "q_hybrid_rrf" -> ((s, dir) => {
      val lex = TextStats.bm25(spread(t(s, dir, "documents")),
          terms = Seq("spark", "table", "fast"))
        .select(col("doc_id"),
          row_number().over(
            Window.orderBy(round(col("bm25"), 6).desc, col("doc_id"))).as("r_lex"))
        .filter(col("r_lex") <= 50)
      val emb = t(s, dir, "embeddings")
      val vec = Similarity.bruteForceTopK(spread(emb), emb.filter(col("vec_id") === 0), k = 50)
        .select(col("neighbor_id").as("doc_id"),
          row_number().over(
            Window.orderBy(round(col("cosine"), 6).desc, col("neighbor_id"))).as("r_vec"))
      lex.join(vec, Seq("doc_id"), "full_outer")
        .withColumn("rrf", round(
          coalesce(lit(1.0) / (lit(60) + col("r_lex")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60) + col("r_vec")), lit(0.0)), 6))
        .select(col("doc_id"), col("r_lex"), col("r_vec"), col("rrf"))
        .orderBy("doc_id")
    }),

    // ext corpus: per-doc out-of-vocabulary rate against the corpus'
    // own top-30 vocabulary — the tokenizer-coverage health metric (a
    // rising OOV rate on a new source means tokenizer or corpus is
    // off-distribution). Vocab is a TakeOrdered top-k over the
    // map-side-combined token counts; membership is a broadcast join;
    // the rate is one IEEE division of exact counts.
    "q_oov_rate" -> ((s, dir) => {
      val docs = spread(t(s, dir, "documents"))
      Corpus.oovRate(docs, Corpus.topVocab(docs, vocabSize = 30))
        .select(col("doc_id"), col("n_tokens"), col("n_oov"),
          round(col("oov_rate"), 6).as("oov_rate"))
        .orderBy("doc_id")
    }),

    // gaps-and-islands: each user's maximal runs of consecutive active
    // HOURS (hour grain makes the islands real — at day grain this
    // synthetic month is one solid block). One window + one hash agg
    // over distinct (user, hour) slots — no self-join, no iteration;
    // the classic slot − row_number() constancy trick. All-integer.
    "q_islands" -> ((s, dir) => {
      Sessionize.activityIslands(
          EventsStream.readEvents(s, s"$dir/events.parquet"), "user_id",
          expr("floor(unix_timestamp(ts) / 3600)"))
        .orderBy("user_id", "island_start")
    }),

    // market-basket association rules over order baskets (items =
    // suppliers feeding the order): support / confidence both ways /
    // lift per co-occurring pair. The frequent-item prune runs BEFORE
    // any pairing (Apriori pass one, Affinity scaladoc) so a
    // pathological mega-basket can't go quadratic. Counts exact;
    // ratios rounded once.
    "q_assoc_rules" -> ((s, dir) => {
      Affinity.associationRules(spread(t(s, dir, "lineitem")),
          basket = col("l_orderkey"), item = col("l_suppkey"),
          minItemCount = 50, minPairCount = 10)
        .orderBy("item1", "item2")
    }),

    // item-item collaborative filtering: top-3 cosine (Ochiai)
    // neighbors per supplier from order co-baskets — the "also bought"
    // kernel; rank on (rounded cosine DESC, id) so ties are engine-
    // and retry-stable (Affinity.itemCosineTopK scaladoc).
    "q_item_cosine" -> ((s, dir) => {
      Affinity.itemCosineTopK(spread(t(s, dir, "lineitem")),
          basket = col("l_orderkey"), item = col("l_suppkey"),
          minItemCount = 50, minPairCount = 10, k = 3)
        .orderBy("item1", "rank")
    }),

    // functional-dependency audit across four candidate FDs — the
    // schema-inference probe run before trusting a column as a key or
    // a dimension as derivable. Each row is one two-phase distinct
    // aggregate; o_orderkey→o_custkey is the key check (0 violations
    // expected), the others measure real violation rates
    // (ScaleOps.fdViolations scaladoc).
    "q_fd_audit" -> ((s, dir) => {
      val o = spread(t(s, dir, "orders"))
      ScaleOps.fdViolations(o, "o_orderkey", "o_custkey")
        .unionAll(ScaleOps.fdViolations(o, "o_custkey", "o_orderpriority"))
        .unionAll(ScaleOps.fdViolations(spread(t(s, dir, "lineitem")),
          "l_orderkey", "l_returnflag"))
        .unionAll(ScaleOps.fdViolations(t(s, dir, "customer"),
          "c_nationkey", "c_mktsegment"))
        .orderBy("fd")
    }),

    // A-priori stage 3: frequent supplier TRIPLES per order basket —
    // the nested-HOF expansion over each basket's sorted item set, so
    // the Spark side needs NO self-join at all (one basket-keyed
    // shuffle + one triple-keyed count; Affinity.tripleCounts
    // scaladoc). The oracle stages pair→triple joins explicitly —
    // a single 3-way SQL join misplans into an inequality-first
    // explosion on DuckDB, which is the point of the array form.
    "q_itemsets3" -> ((s, dir) => {
      Affinity.frequentTriples(spread(t(s, dir, "lineitem")),
          basket = col("l_orderkey"), item = col("l_suppkey"),
          minItemCount = 50, minTripleCount = 2)
        .orderBy("item1", "item2", "item3")
    }),

    // exact WEIGHTED discrete quantiles: quantity-weighted price
    // median/p90 per return flag — each row counts its weight, the
    // inventory-weighted "typical price" form. Same distinct-value
    // cumulative machinery as q_percentile_disc with Σw in place of
    // row counts (Quantiles.exactWeightedQuantilesDisc scaladoc).
    "q_weighted_median" -> ((s, dir) => {
      Quantiles.exactWeightedQuantilesDisc(spread(t(s, dir, "lineitem")),
          "l_extendedprice", "l_quantity", Seq("l_returnflag"),
          Seq(0.5, 0.9), Seq("wp50", "wp90"))
        .orderBy("l_returnflag")
    }),

    // funnel latency profile: disc p50/p90 of the click→purchase
    // delay (exact integer microseconds) per user-id cohort — the
    // time-to-convert readout on top of the q_event_funnel join,
    // composed with the distinct-value quantile pass.
    "q_funnel_delay" -> ((s, dir) => {
      val f = EventsStream.funnelBatch(
        spread(EventsStream.readEvents(s, s"$dir/events.parquet")))
      val d = f.select((col("user_id") % 10).as("cohort"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("click_ts")))
          .as("delay_us"))
      Quantiles.exactQuantilesDisc(d, "delay_us", Seq("cohort"),
          Seq(0.5, 0.9), Seq("p50_us", "p90_us"))
        .select(col("cohort"), col("p50_us").cast("long").as("p50_us"),
          col("p90_us").cast("long").as("p90_us"))
        .orderBy("cohort")
    }),

    // token-pair PMI over documents — which terms co-occur more than
    // their document frequencies predict. Same pruned-pair skeleton as
    // q_assoc_rules, over the tokenize-once token sets.
    "q_pmi_cooccur" -> ((s, dir) => {
      val toks = spread(t(s, dir, "documents"))
        .select(col("doc_id"), explode(TextStats.tokens(col("text"))).as("term"))
      Affinity.pmiPairs(toks, doc = col("doc_id"), term = col("term"),
          minTermCount = 20, minPairCount = 10)
        .orderBy("term1", "term2")
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

    // fixed-iteration PageRank over the ANN near-dup graph — which
    // documents sit at the center of duplicate neighborhoods (dedup
    // triage ranks them first). Three rounds, each ONE join + ONE
    // aggregate bounded by |E|, stacked into a single job — no
    // per-round driver actions (Graph scaladoc).
    "q_pagerank" -> ((s, dir) => {
      // persist the edge list: every iteration re-reads it (contrib
      // join + degree + node spine) — unpersisted, the bucketed
      // near-dup self-join would replay once per reference
      val pairs = Similarity.embeddingNearDupPairs(
          spread(t(s, dir, "embeddings")), threshold = 0.2, planes = annPlanes)
        .select("id1", "id2")
      // MEASURED partition sizing (ScaleOps.sizedEdges): an LSH-survivor
      // graph iterates on O(1) tasks, while a pair graph that grows with
      // the data gets tasks proportional to its edges — no literal
      // partition count (the CC small-graph discipline)
      Graph.pageRank(ScaleOps.sizedEdges(Graph.symmetrize(pairs)), iters = 3)
        .orderBy("id")
    }),

    // multi-source BFS over the sparse (co-ordered ≥ 2×) part graph:
    // min hop distance from the seed parts, bounded at 4 — the
    // "blast radius" query every recall/contamination audit runs on an
    // entity graph. Frontier joins only (Graph.bfsHops scaladoc), so
    // per-round shuffle ≤ |E|; edges persisted — every round re-reads
    // them and the pair self-join must not replay.
    "q_bfs_hops" -> ((s, dir) => {
      val e = coPurchaseEdges(s, dir, minCount = 2).persist()
      val seeds = e.filter(col("src") % 97 === 0).select(col("src").as("id"))
      Graph.bfsHops(e, seeds, maxHops = 4).orderBy("id")
    }),

    // fixed-round k-core peeling (k=90, 3 rounds) over the dense
    // co-purchase graph: the high-degree backbone left after the
    // peeling cascade — the graph-hygiene pass that separates hub
    // structure from incidental co-occurrence. Each round is one
    // degree aggregate + two semi-join restrictions, O(|E|) shuffle
    // (Graph.kCorePeel scaladoc).
    "q_kcore" -> ((s, dir) => {
      Graph.kCorePeel(coPurchaseEdges(s, dir, minCount = 1).persist(),
          k = 90, rounds = 3)
        .orderBy("id")
    }),

    // personalized PageRank from the seed parts over the sparse
    // co-purchase graph — random-walk-with-restart proximity, the
    // related-items recommendation kernel; same |E|-bounded rounds as
    // q_pagerank with teleport pinned to the seeds
    // (Graph.personalizedPageRank scaladoc).
    "q_ppr" -> ((s, dir) => {
      // measured edge sizing, not a literal — see q_pagerank
      val e = ScaleOps.sizedEdges(coPurchaseEdges(s, dir, minCount = 2))
      val seeds = e.filter(col("src") % 97 === 0).select(col("src").as("id"))
      Graph.personalizedPageRank(e, seeds, iters = 3).orderBy("id")
    }),

    // PageRank on the genuinely DIRECTED co-purchase pair graph
    // (id1 < id2 orientation kept, NOT symmetrized) — every component's
    // max-id part is a sink, so the dangling-mass redistribution
    // pageRankDirected adds is load-bearing: total rank mass stays
    // exactly 1 instead of leaking at the sinks. Complements
    // q_pagerank, whose symmetrized input makes the dangling term
    // vacuous by construction.
    "q_pagerank_directed" -> ((s, dir) => {
      val e = ScaleOps.sizedEdges(
        coPurchasePairs(s, dir, minCount = 2)
          .select(col("id1").as("src"), col("id2").as("dst")))
      // truncateLineage: the rank frame is referenced TWICE per round
      // (dangling scalar + contribution join), so without per-round
      // snapshots the pr subtree re-executes 2^iters times; three
      // node-sized checkpoints are far cheaper (measured 4.6 → 3.5 s
      // at sf0.1, and the gap widens with iters)
      Graph.pageRankDirected(e, iters = 3, truncateLineage = true).orderBy("id")
    }),

    // HITS hubs & authorities on the DIRECTED co-purchase pair graph
    // (id1 < id2 orientation — same input as q_pagerank_directed):
    // which parts point AT the popular parts (hubs) vs which parts ARE
    // pointed at (authorities). Integer-exact unnormalized iteration —
    // each score is a directed alternating-walk COUNT (an exact long),
    // normalized once at the end — so the oracle hashes bit-for-bit
    // with no per-round float drift (Graph.hits scaladoc has the
    // D^(2·iters) overflow bound that pins iters=2 here).
    "q_hits" -> ((s, dir) => {
      val e = coPurchasePairs(s, dir, minCount = 2)
        .select(col("id1").as("src"), col("id2").as("dst"))
        .persist() // 2×iters half-steps + node spine re-read the pair
                   // self-join (the q_bfs_hops persist discipline)
      Graph.hits(e, iters = 2).orderBy("id")
    }),

    // bounded-hop WEIGHTED shortest path (multi-source Bellman-Ford)
    // over the co-purchase graph with affinity-derived integer costs
    // (frequent co-purchase = cheap hop: w = 11 − min(m, 10)) — the
    // weighted generalization of q_bfs_hops: "how cheaply can demand
    // reach each part from the seed skus within 4 substitution hops".
    // Long weights keep every distance exact (Graph.sssp scaladoc);
    // per-round shuffle ≤ |E| with snapshot/release plan discipline.
    "q_sssp" -> ((s, dir) => {
      val p = coPurchaseWeightedPairs(s, dir, minCount = 2)
      val e = p.select(col("id1").as("src"), col("id2").as("dst"), col("w"))
        .unionAll(p.select(col("id2").as("src"), col("id1").as("dst"), col("w")))
        .persist() // every relaxation round re-reads the pair self-join
      val seeds = e.filter(col("src") % 97 === 0).select(col("src").as("id"))
      Graph.sssp(e, seeds, maxHops = 4).orderBy("id")
    }),

    // incremental JOIN-view maintenance: the nation-revenue rollup
    // (orders ⋈ customer ⋈ nation) maintained from base + delta
    // PARTIALS — the delta joins only ITS orders against the
    // dimensions, history is never re-scanned, and the merge is a
    // groupBy-sum over two partial states. The oracle recomputes from
    // the full fact table, so the gate proves merged == full — the
    // join generalization of q_incr_agg's aggregate maintenance.
    "q_incr_join_view" -> ((s, dir) => {
      val cust = t(s, dir, "customer").select("c_custkey", "c_nationkey")
      val nat = t(s, dir, "nation").select("n_nationkey", "n_name")
      def partial(o: DataFrame): DataFrame =
        o.join(cust, col("o_custkey") === col("c_custkey"))
          .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(count(lit(1)).as("n"), sum(floor(col("o_totalprice") * 100)).as("cents"))
      val ord = t(s, dir, "orders")
      val cut = lit("1999-01-01").cast("timestamp")
      partial(ord.filter(col("o_orderdate") < cut))
        .unionByName(partial(ord.filter(col("o_orderdate") >= cut)))
        .groupBy("n_name")
        .agg(sum("n").as("n_orders"), sum("cents").as("rev_cents"))
        .orderBy("n_name")
    }),

    // global clustering coefficient by degree-ORIENTED triangle
    // counting over the sparse co-purchase graph — the skew-proof
    // triangle algorithm (out-degree bounded by orientation; wedge
    // join Σout², not Σdeg²; Graph.globalTransitivity scaladoc).
    "q_transitivity" -> ((s, dir) => {
      Graph.globalTransitivity(coPurchaseEdges(s, dir, minCount = 2))
    }),

    // degree assortativity of the co-purchase graph: do hub parts
    // co-sell with other hubs? One degree pass + two edge annotations
    // + exact power sums (Graph.degreeAssortativity scaladoc).
    "q_degree_assort" -> ((s, dir) => {
      Graph.degreeAssortativity(coPurchaseEdges(s, dir, minCount = 2))
    }),

    // inter-event burstiness per user: (σ−μ)/(σ+μ) of microsecond
    // gaps — separates machine-regular from human-bursty actors.
    // One keyed lag window + exact power sums
    // (Sessionize.burstiness scaladoc).
    "q_burstiness" -> ((s, dir) => {
      Sessionize.burstiness(
          EventsStream.readEvents(s, s"$dir/events.parquet"),
          keyCol = "user_id", ord = Seq("ts", "event_id"), minGaps = 20)
        .orderBy("user_id")
    }),

    // order-2 Markov transitions: trigram (t₁,t₂)→t₃ counts and
    // conditional probability over each user's time-ordered event
    // types — the sequence-model step past q_event_transitions'
    // order-1 chain. Two leads on ONE per-user window partitioning.
    "q_markov2" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val tri = EventsStream.readEvents(s, s"$dir/events.parquet")
        .select(col("user_id"), col("event_type").as("t1"),
          lead(col("event_type"), 1).over(w).as("t2"),
          lead(col("event_type"), 2).over(w).as("t3"))
        .filter(col("t3").isNotNull)
      tri.groupBy("t1", "t2", "t3").agg(count(lit(1)).as("n"))
        .withColumn("p", col("n").cast("double") /
          sum("n").over(Window.partitionBy("t1", "t2")).cast("double"))
        .orderBy("t1", "t2", "t3")
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

    // RFM segmentation with BROADCAST breakpoints instead of a global
    // ntile: per-customer recency/frequency/monetary, then each metric
    // bucketed 1–5 by comparison against its four disc-quantile
    // breakpoints (a 1-row broadcast). Unlike ntile(5) OVER () — one
    // partition sorting every customer — the bucket assignment here is
    // a narrow codegen'd projection, and the only ordered pass ranks
    // DISTINCT metric values (Quantiles scaladoc). Ties at a breakpoint
    // go to the lower bucket on both engines (strict >).
    "q_rfm" -> ((s, dir) => {
      val m = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(datediff(lit("1998-12-31").cast("date"), max(col("o_orderdate")))
            .as("recency_days"),
          count(lit(1)).as("frequency"),
          sum(floor(col("o_totalprice"))).as("monetary"))
        .persist() // read 4×: three breakpoint passes + the bucket join
      def bps(c: String) = Quantiles.exactQuantilesDisc(m, c, Seq(),
        Seq(0.2, 0.4, 0.6, 0.8), Seq(s"${c}_b1", s"${c}_b2", s"${c}_b3", s"${c}_b4"))
      def bucket(c: String) = (lit(1) +
        (col(c) > col(s"${c}_b1")).cast("int") + (col(c) > col(s"${c}_b2")).cast("int") +
        (col(c) > col(s"${c}_b3")).cast("int") + (col(c) > col(s"${c}_b4")).cast("int"))
      m.crossJoin(broadcast(
          bps("recency_days").crossJoin(bps("frequency")).crossJoin(bps("monetary"))))
        .select(col("o_custkey"), col("recency_days"), col("frequency"), col("monetary"),
          bucket("recency_days").as("r_bucket"), bucket("frequency").as("f_bucket"),
          bucket("monetary").as("m_bucket"))
        .withColumn("rfm_code",
          col("r_bucket") * 100 + col("f_bucket") * 10 + col("m_bucket"))
        .orderBy("o_custkey")
    }),

    // seasonal-naive forecast rows (ŷ_t = y_{t−4} on quarterly order
    // totals per priority) — the baseline every forecasting pipeline
    // benchmarks against; errors are exact longs end to end.
    "q_seasonal_naive" -> ((s, dir) => {
      val q = t(s, dir, "orders")
        .groupBy(col("o_orderpriority"),
          (year(col("o_orderdate")) * 4 + quarter(col("o_orderdate"))).as("period"))
        .agg(sum(floor(col("o_totalprice"))).as("y"))
      Forecast.seasonalNaive(q, Seq("o_orderpriority"), col("period"), col("y"), season = 4)
        .orderBy("o_orderpriority", "period")
    }),

    // the backtest rollup of q_seasonal_naive: per-series MAE / MAPE —
    // one more map-side-combined aggregate over the forecast rows.
    "q_forecast_backtest" -> ((s, dir) => {
      val q = t(s, dir, "orders")
        .groupBy(col("o_orderpriority"),
          (year(col("o_orderdate")) * 4 + quarter(col("o_orderdate"))).as("period"))
        .agg(sum(floor(col("o_totalprice"))).as("y"))
      Forecast.seasonalNaiveBacktest(q, Seq("o_orderpriority"), col("period"), col("y"), season = 4)
        .orderBy("o_orderpriority")
    }),

    // BPE merge-candidate mining — the corpus-scale step of tokenizer
    // training. The corpus collapses to the distinct-word table BEFORE
    // any character work, so the pair explode runs over |vocab| short
    // strings, not over tokens (Corpus scaladoc). Counts exact.
    "q_bpe_merges" -> ((s, dir) => {
      Corpus.bpeMergeCandidates(spread(t(s, dir, "documents")), topK = 20)
        .orderBy(desc("n_pair"), asc("pair"))
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

    // cross-source duplicate overlap matrix on a 20-char-prefix
    // fingerprint (the coarse granularity that actually surfaces
    // mirroring in this corpus — exact normalized fingerprints are
    // disjoint across sources here, and a 0-row audit gates nothing).
    // Pair fan-out per fingerprint is bounded by the SOURCE count, so
    // no bucket cap is needed (Dedup.sourceOverlap scaladoc).
    "q_source_overlap" -> ((s, dir) => {
      Dedup.sourceOverlap(spread(t(s, dir, "documents")),
          fp = md5(substring(col("text"), 1, 20)))
        .orderBy("source1", "source2")
    }),

    // Johnson–Lindenstrauss random projection 64→8: per-vector
    // compressed components (bit-reproducible native-kernel dots ×
    // 1/√8) plus the norm-distortion ratio the JL lemma bounds — the
    // cheap first stage before clustering/bucketing at 100 TB. Narrow,
    // zero-shuffle; planes are plan literals.
    "q_random_projection" -> ((s, dir) => {
      val planes = Similarity.defaultPlanes(dim = 64, nPlanes = 8, seed = 7L)
      val e = spread(t(s, dir, "embeddings"))
        .withColumn("proj", Similarity.projectRandom(col("embedding"), planes))
        .withColumn("nrm",
          round(sqrt(Similarity.dotNative(col("embedding"), col("embedding"))), 6))
      val pCols = (0 until planes.size).map(i =>
        round(element_at(col("proj"), i + 1), 6).as(s"p$i"))
      val withP = e.select(col("vec_id") +: col("nrm") +: pCols: _*)
      val projNormSq = (0 until planes.size).map(i => col(s"p$i") * col(s"p$i")).reduce(_ + _)
      withP.select(col("vec_id") +: (0 until planes.size).map(i => col(s"p$i")) :+
          when(col("nrm") === 0.0, lit(null))
            .otherwise(round(sqrt(projNormSq) / col("nrm"), 6)).as("distortion"): _*)
        .orderBy("vec_id")
    }),

    // positional inverted index over documents: per term, df/cf and the
    // by-doc_id posting list with 0-based token positions. The df band
    // [5, 1000] is the hapax floor + stopword cap applied BEFORE
    // posting assembly (TextStats.invertedIndex scaladoc). Postings
    // serialize to JSON so the gate compares a flat string, not
    // engine-specific nested reprs.
    "q_inverted_index" -> ((s, dir) => {
      TextStats.invertedIndex(spread(t(s, dir, "documents")), minDf = 5L, maxDf = 1000L)
        .select(col("term"), col("df"), col("cf"),
          to_json(col("postings")).as("postings"))
        .orderBy("term")
    }),

    // last-touch attribution: purchases credited to the latest
    // strictly-earlier view/click of the same user, else 'direct'.
    // RANGE-to-(-1) frame on integral micros makes the answer
    // independent of equal-ts tie order (Affinity scaladoc).
    "q_attribution" -> ((s, dir) => {
      Affinity.lastTouchAttribution(
          spread(EventsStream.readEvents(s, s"$dir/events.parquet")),
          key = col("user_id"), tsInt = unix_micros(col("ts")),
          channel = col("event_type"),
          isConversion = col("event_type") === "purchase",
          isTouch = col("event_type").isin("view", "click"))
        .orderBy("channel")
    }),

    // clickstream path mining: the first-3-event-type path per user
    // (ts-ordered via sort_array of (ts, type) structs — order pinned
    // by data, not by arrival), counted corpus-wide. The sequential-
    // pattern complement of q_event_transitions' Markov matrix: paths
    // are ordered PREFIXES, not memoryless hops. One user-keyed
    // aggregate + one path-keyed count, both map-side combined.
    "q_session_paths" -> ((s, dir) => {
      spread(EventsStream.readEvents(s, s"$dir/events.parquet"))
        .select(col("user_id"), struct(col("ts"), col("event_type")).as("e"))
        .groupBy("user_id")
        .agg(expr(
          "array_join(transform(slice(sort_array(collect_list(e)), 1, 3), x -> x.event_type), '>')")
          .as("path"))
        .groupBy("path").agg(count(lit(1)).as("n_users"))
        .orderBy(desc("n_users"), asc("path"))
        .limit(20)
    }),

    // join-size preflight: predict |A ⋈ B| on the key EXACTLY from the
    // two per-key count tables (Σ n_a(k)·n_b(k)) without running the
    // join — the planner-style guard a pipeline runs before an
    // unfamiliar fact-fact join. Count tables are map-side-combined
    // (shuffle = keys); their join carries one row per key.
    "q_join_size" -> ((s, dir) => {
      val a = t(s, dir, "lineitem").groupBy(col("l_orderkey").as("k"))
        .agg(count(lit(1)).as("na"))
      val b = t(s, dir, "orders").groupBy(col("o_orderkey").as("k"))
        .agg(count(lit(1)).as("nb"))
      a.join(b, Seq("k"))
        .agg(sum(col("na") * col("nb")).as("join_rows"),
          count(lit(1)).as("n_shared_keys"),
          max(col("na") * col("nb")).as("max_key_rows"))
        .orderBy("join_rows")
    }),

    // temporal point-in-interval join: facts (purchases) look up the
    // attribute that was valid AT the fact's timestamp in an SCD2
    // dimension built from the same users' value-tier history — the
    // temporal-warehouse join. Equi-join on the entity with a range
    // residual; fan-out per fact is that user's version count.
    "q_temporal_join" -> ((s, dir) => {
      val ev = spread(EventsStream.readEvents(s, s"$dir/events.parquet"))
      val dim = ScaleOps.scd2(
          ev.select(col("user_id"), col("ts"), floor(col("value") / 25).as("tier")),
          key = "user_id", ord = "ts", attr = "tier").as("d")
      val facts = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts")).as("f")
      facts.join(dim,
          col("f.user_id") === col("d.user_id") &&
            col("f.ts") >= col("d.valid_from") &&
            (col("d.valid_to").isNull || col("f.ts") < col("d.valid_to")))
        .groupBy(col("d.tier").as("tier"))
        .agg(count(lit(1)).as("n_purchases"),
          countDistinct(col("f.user_id")).as("n_users"))
        .orderBy("tier")
    }),

    // order-independent table checksum over a rendered lineitem slice:
    // XOR of 60-bit row hashes + count — identical digest under any
    // partitioning or engine (ScaleOps.tableChecksum scaladoc).
    "q_table_checksum" -> ((s, dir) => {
      ScaleOps.tableChecksum(spread(t(s, dir, "lineitem")),
          Seq(col("l_orderkey"), col("l_linenumber"),
            floor(col("l_quantity")).cast("long"), col("l_returnflag"),
            date_format(col("l_shipdate"), "yyyy-MM-dd")))
        .orderBy("n_rows")
    }),

    // Kaplan–Meier survival (retention) curve over per-user lifetime
    // days: entities collapse to the distinct-duration grid, the
    // product-limit estimate runs as an ORDERED cumulative ln-sum —
    // sequential, so bit-identical cross-engine (Inference scaladoc).
    "q_survival" -> ((s, dir) => {
      val life = spread(EventsStream.readEvents(s, s"$dir/events.parquet"))
        .groupBy("user_id")
        .agg(floor((unix_micros(max("ts")) - unix_micros(min("ts"))) /
          lit(86400000000L)).as("dur_days"))
      Inference.kaplanMeier(life, col("dur_days")).orderBy("d")
    }),

    // time-weighted average of the event value per user: each value
    // holds until the user's next event; cent-scaled integers ×
    // integral micro durations keep both sums exact longs, one final
    // division (TimeFill.timeWeightedAvg scaladoc). Equal-timestamp
    // observations pre-aggregate to max(value) per (user, ts) — the
    // module's contract; without it, which duplicate holds the
    // interval is tie-order dependent on BOTH engines.
    "q_twap" -> ((s, dir) => {
      val obs = spread(EventsStream.readEvents(s, s"$dir/events.parquet"))
        .select(col("user_id"), unix_micros(col("ts")).as("t_us"),
          round(col("value") * 100).cast("long").as("v"))
        .groupBy("user_id", "t_us").agg(max("v").as("v"))
      TimeFill.timeWeightedAvg(obs,
          key = col("user_id"), tsInt = col("t_us"),
          valueInt = col("v"), outScale = 100.0)
        .withColumnRenamed("k", "user_id")
        .orderBy("user_id")
    }),

    // Fellegi–Sunter record linkage over (nation, segment)-blocked
    // customer pairs: two compared fields (name-suffix digit, balance
    // bucket), literal log-likelihood weights folded at plan time,
    // fixed-order sum (Dedup.linkageScore scaladoc). Output is the
    // score histogram — 4 weight combinations — not the pair list.
    "q_linkage" -> ((s, dir) => {
      // Fellegi–Sunter over exact-equality fields: the histogram is
      // agreement-pattern combinatorics over GROUP SIZES (Möbius over
      // the field-subset lattice) — no pair enumeration, no bucket
      // caps, exact at any scale. The enumerated form (round-7's
      // refined pair join) measured 94× slower at 30× data because
      // replicas share compared fields; this form is 2^k = 4 group
      // aggregates, linear forever. Equivalence to the pair-join form
      // is ExtSpec-gated.
      val c = t(s, dir, "customer").select(
        col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
        expr("right(c_name, 1)").as("sfx"),
        floor(col("c_acctbal") / 1000).as("balk"))
      Dedup.linkagePatternHistogram(c,
          blockCols = Seq("c_nationkey", "c_mktsegment"),
          fields = Seq("balk", "sfx"),
          weights = Map("sfx" -> (0.9, 0.1), "balk" -> (0.3, 0.05)),
          threshold = 1.0)
        .orderBy("score")
    }),

    // linear multi-touch attribution: every view/click in the 1-hour
    // lookback before a purchase shares the credit equally — credit
    // summed as exact integer parts-per-billion, so the total is
    // partition-order independent (Affinity scaladoc). 'direct' holds
    // conversions with no in-window touch.
    "q_attribution_linear" -> ((s, dir) => {
      Affinity.linearAttribution(
          spread(EventsStream.readEvents(s, s"$dir/events.parquet")),
          key = col("user_id"), tsInt = unix_micros(col("ts")),
          channel = col("event_type"),
          isConversion = col("event_type") === "purchase",
          isTouch = col("event_type").isin("view", "click"),
          windowT = 3600L * 1000000L)
        .orderBy("channel")
    }),

    // WOE / information-value screen of the decade-binned event value
    // against the user-parity label: one contingency pass, exact
    // counts, fixed float tower (Inference.woeIv scaladoc).
    "q_woe_iv" -> ((s, dir) => {
      Inference.woeIv(spread(EventsStream.readEvents(s, s"$dir/events.parquet")),
          bin = floor(col("value") / 10), label = col("user_id") % 2 === 1)
        .orderBy("bin")
    }),

    // ext streaming: per-user running purchase totals via
    // transformWithState (typed per-key ValueState on the RocksDB
    // provider) — the arbitrary-state API the declarative operators
    // can't replace for whole-stream per-key reductions. The bounded
    // run's final state must equal the batch groupBy, which is the
    // oracle (StatefulOps scaladoc).
    "q_stream_stateful_totals" -> ((s, dir) => {
      StatefulOps.runRunningTotalsOnce(s, s"$dir/events.parquet")
        .orderBy("user_id")
    }),

    // small-file compaction planning — the decision step behind every
    // lakehouse OPTIMIZE: pack the (ordered) file list into
    // target-sized bins by running total (next-fit, order-preserving —
    // compaction must not destroy the sort/z-order clustering the
    // files already have). Documents stand in for the file-metadata
    // table (doc_id = file, n_chars = bytes). The window runs over
    // FILE METADATA, not data — thousands of rows per table partition
    // in production, partitioned by the table's partition key; the
    // plan's bin ids then drive a grouped rewrite job.
    "q_compaction_plan" -> ((s, dir) => {
      val targetBytes = 65536.0 // 64 KiB bins at this sf; production: 1 GiB
      val w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
      t(s, dir, "documents").select(col("doc_id"), col("n_chars"))
        .withColumn("cum_before", coalesce(sum("n_chars").over(w), lit(0L)))
        .withColumn("bin", floor(col("cum_before") / lit(targetBytes)))
        .groupBy("bin")
        .agg(count(lit(1)).as("n_files"), sum("n_chars").as("bytes"),
          min("doc_id").as("first_id"), max("doc_id").as("last_id"))
        .orderBy("bin")
    }),

    // embedding-distribution drift between two shards (vec_id parity
    // as ref/cur): IVF-assign every vector to the fixed centroids,
    // then PSI over the per-centroid assignment distribution — the
    // embedding-space analogue of q_psi_drift that catches semantic
    // mix shift before any scalar feature moves. Emits per-centroid
    // terms (exact counts, one float tower each) rather than the
    // order-dependent global Σ; the caller sums 4 rounded terms.
    // Assignment is the map-side-combined argmax against broadcast
    // centroids (Similarity.ivfAssign) — one shuffled row per vector.
    "q_embed_drift" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val asg = Similarity.ivfAssign(spread(emb), emb.filter(col("vec_id") < 4))
        .select(col("vec_id"), col("centroid_id"))
      val counts = asg
        .groupBy("centroid_id")
        .agg(count(when(col("vec_id") % 2 === 0, 1)).as("c_ref"),
          count(when(col("vec_id") % 2 === 1, 1)).as("c_cur"))
      val tot = counts.agg(sum("c_ref").as("n_ref"), sum("c_cur").as("n_cur"))
      counts.crossJoin(broadcast(tot))
        .withColumn("p_ref",
          greatest(col("c_ref").cast("double") / col("n_ref"), lit(1e-6)))
        .withColumn("p_cur",
          greatest(col("c_cur").cast("double") / col("n_cur"), lit(1e-6)))
        .select(col("centroid_id"), col("c_ref"), col("c_cur"),
          round((col("p_cur") - col("p_ref")) * log(col("p_cur") / col("p_ref")), 6)
            .as("psi_term"))
        .orderBy("centroid_id")
    }),

    // Mann–Whitney rank-sum between the user_id%2 arms on the
    // cent-quantized value — the nonparametric twin of q_ab_ttest,
    // with the AUC effect size. Doubled-rank integer machinery on the
    // distinct-value grid (Inference.mannWhitney scaladoc).
    "q_mann_whitney" -> ((s, dir) => {
      Inference.mannWhitney(
          spread(EventsStream.readEvents(s, s"$dir/events.parquet")),
          arm = col("user_id") % 2, x = floor(col("value") * 100))
        .orderBy("n0")
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

    // sample ACF of the daily event-count series, lags 1..7 — the
    // seasonality screen a forecasting pipeline runs before picking a
    // model. Integer power sums with N²-cleared denominators: one
    // division per lag (Inference.autocorr scaladoc).
    "q_autocorr" -> ((s, dir) => {
      val days = EventsStream.readEvents(s, s"$dir/events.parquet")
        .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("y"))
      Inference.autocorr(days, ord = col("day"), y = col("y"), maxLag = 7)
        .orderBy("lag")
    }),

    // CUSUM mean-shift changepoint on the daily purchase-value series:
    // where does the mean level shift? Exact-integer argmax of the
    // N-scaled cumulative deviation (Forecast.cusumChangepoint
    // scaladoc); cents-quantized values.
    "q_changepoint" -> ((s, dir) => {
      val days = EventsStream.readEvents(s, s"$dir/events.parquet")
        .filter(col("event_type") === "purchase")
        .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
        .agg(sum(floor(col("value") * 100)).cast("long").as("cents"))
      Forecast.cusumChangepoint(days, ord = col("day"), y = col("cents"))
        .select(col("ord").as("day"), col("t"), col("n"), col("cusum_n"),
          col("mean_dev"))
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

    // duplicated-span mining: word 8-grams shared by ≥2 DISTINCT docs
    // — the repeated-boilerplate detector (Lee et al.-style span dedup
    // at shingle granularity). Shingle explode → one map-side-combined
    // count per distinct span; the ≥2-docs filter prunes the long tail
    // before the top-k sort, so what reaches the driver is boilerplate
    // only. Same tokenize-once shape as q_top_ngrams.
    "q_dup_spans" -> ((s, dir) => {
      spread(t(s, dir, "documents"))
        .select(col("doc_id"), explode(Dedup.shingles(col("text"), 8)).as("span"))
        .groupBy("span")
        .agg(countDistinct(col("doc_id")).as("n_docs"), count(lit(1)).as("n_occur"))
        .filter(col("n_docs") >= 2)
        .orderBy(desc("n_docs"), desc("n_occur"), asc("span"))
        .limit(30)
    }),

    // bucketed co-located fact-fact join: both sides written bucketed
    // (and sorted) on the join key, so the join plans with ZERO
    // exchange — the persisted-co-location pattern every incremental
    // 100-TB pipeline uses for its repeated big-big joins
    // (ScaleOps.writeBucketed scaladoc; shuffle-freedom is
    // plan-asserted in PlanSpec). External-path tables keep bench/
    // verify runs from writing into the working directory; the
    // catalog-existence guard makes warm bench runs time the JOIN, not
    // the one-time bucketed write.
    "q_bucket_join" -> ((s, dir) => {
      val dirKey = java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
      val tmp = System.getProperty("java.io.tmpdir")
      val (to, tl) = (s"bj_orders_$dirKey", s"bj_lineitem_$dirKey")
      if (!s.catalog.tableExists(to) || !s.catalog.tableExists(tl)) {
        ScaleOps.writeBucketed(
          t(s, dir, "orders").select("o_orderkey", "o_orderpriority"),
          to, "o_orderkey", 8, path = Some(s"$tmp/graft_$to"))
        ScaleOps.writeBucketed(
          t(s, dir, "lineitem").select(col("l_orderkey").as("o_orderkey"),
            col("l_quantity"), col("l_extendedprice")),
          tl, "o_orderkey", 8, path = Some(s"$tmp/graft_$tl"))
      }
      // merge hint: at this sf the planner would broadcast the tiny
      // orders side, hiding the property under test; at 100 TB neither
      // side broadcasts and sort-merge over co-bucketed scans IS the
      // natural plan — the hint pins the at-scale shape locally
      s.table(tl).join(s.table(to).hint("merge"), "o_orderkey")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          sum(floor(col("l_quantity")).cast("long")).as("sum_qty"),
          sum(floor(col("l_extendedprice")).cast("long")).as("sum_price"))
        .orderBy("o_orderpriority")
    }),

    // DataSource V2 fixed-width scan end-to-end: materialize a
    // deterministic fixed-width extract of lineitem, read it back
    // through graft-fixedwidth with maxSplitBytes forcing multiple
    // record-aligned byte-range splits (the 100-TB planning path), and
    // aggregate. Round-trip parity with the oracle on the original
    // table proves offset math, charset decode, and trim; pruning is
    // plan-asserted in FixedWidthSourceSpec.
    "q_dsv2_scan" -> ((s, dir) => {
      // fixture path keyed by a CONTENT-COLLISION-FREE digest of the sf
      // dir (hashCode could collide across dirs); write once, so
      // repeated runs time the DSv2 READ, not the fixture export — but
      // re-export whenever the fixture no longer matches the LIVE
      // lineitem table by (row count, Σ l_orderkey): the driver has
      // regenerated testdata in place between rounds, and a
      // regeneration can keep the row count while changing values, so
      // count alone would silently serve stale bytes. The check itself
      // (a full live-lineitem aggregate + a full fixture re-read) runs
      // ONCE per (JVM, dir) via ensureDsv2Fixture — the round-8 bench
      // timed it on every warm run, inflating the row ~10× and masking
      // the DSv2 read it claims to measure; the staleness contract only
      // needs first-touch-per-session (testdata regeneration happens
      // between driver rounds, i.e. between JVMs, never mid-session).
      val fwDir = ensureDsv2Fixture(s, dir)
      s.read.format("graft-fixedwidth")
        .option("layout", "okey:1:12,pkey:13:12,qty:25:8,rflag:33:4,sdate:37:12")
        .option("recordLength", 48)
        .option("maxSplitBytes", 1 << 22)
        .load(fwDir)
        .groupBy(col("rflag"))
        .agg(count(lit(1)).as("n"),
          sum(expr("try_cast(qty AS BIGINT)")).as("sum_qty"),
          min(col("sdate")).as("min_sdate"),
          countDistinct(col("okey")).as("n_orders"))
        .orderBy("rflag")
    }),

    // robust trend estimation: Theil–Sen slope (median of pairwise
    // slopes) per event_type over the daily integral value grid — the
    // outlier-proof answer to "is this metric drifting?" that one bad
    // day cannot move. Pair space is over the ~30-cell grid, never
    // rows; the median is a picked data value under a total order.
    "q_theil_sen" -> ((s, dir) => {
      val daily = EventsStream.readEvents(s, s"$dir/events.parquet")
        .groupBy(col("event_type"),
          datediff(col("ts").cast("date"), lit("1970-01-01").cast("date")).as("x"))
        .agg(sum(floor(col("value") * 100)).cast("long").as("y"))
      Forecast.theilSen(daily, Seq("event_type"), col("x"), col("y"))
        .orderBy("event_type")
    }),

    // stats: Mann–Kendall monotone-trend test on the same daily cents
    // grid as q_theil_sen — exact integer S over the bounded pair
    // space, tau-a as truncated-division ppb, no float anywhere in the
    // gated row.
    "q_mann_kendall" -> ((s, dir) => {
      val daily = EventsStream.readEvents(s, s"$dir/events.parquet")
        .groupBy(col("event_type"),
          datediff(col("ts").cast("date"), lit("1970-01-01").cast("date")).as("x"))
        .agg(sum(floor(col("value") * 100)).cast("long").as("y"))
      Forecast.mannKendall(daily, Seq("event_type"), col("x"), col("y"))
        .orderBy("event_type")
    }),

    // lead-lag detection: lagged cross-correlation between the daily
    // click and purchase count series — "does click volume lead
    // purchases by k days?". Exact long moment sums per lag over the
    // bounded day grid, one IEEE-deterministic expression per lag
    // (Inference.crossCorr scaladoc).
    "q_xcorr_lag" -> ((s, dir) => {
      val daily = EventsStream.readEvents(s, s"$dir/events.parquet")
        .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
        .agg(
          sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("x"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
      Inference.crossCorr(daily, ord = col("day"), x = col("x"),
          y = col("y"), maxLag = 7)
        .orderBy("lag")
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

    // DAG scheduling: longest-path layering of the band-restricted
    // co-purchase DAG (edges only from part band b to band b+1 — the
    // band filter is what guarantees acyclicity, so depth < 8 by
    // construction and the generic fixpoint loop exits early).
    // Iterative max-propagation, O(|E|) per round (Graph
    // .longestPathLayers scaladoc); the oracle unrolls the same 7
    // relaxation steps.
    "q_dag_layers" -> ((s, dir) => {
      val e = coPurchasePairs(s, dir, minCount = 1)
        .select((col("id1") % 200).as("src"), (col("id2") % 200).as("dst"))
        .filter(floor(col("dst") / 25) === floor(col("src") / 25) + 1)
        .distinct()
        .persist() // 8 propagation rounds re-read the pair self-join:
                   // unpersisted, each round replays it (measured
                   // 14.1 s → 1.3 s at sf0.1)
      Graph.longestPathLayers(e, maxRounds = 8).orderBy("id")
    }),

    // policy filtering: phrase-blocklist hits over the corpus — banned
    // token sequences matched on the canonical token stream (word-
    // boundary exact, so "fast table" never matches inside "breakfast
    // tables"), candidates generated by a broadcast anchor-token join
    // so the corpus never pays |docs|x|phrases| contains calls
    // (Corpus.blocklistFilter scaladoc).
    "q_blocklist_filter" -> ((s, dir) => {
      Corpus.blocklistFilter(spread(t(s, dir, "documents")), blockPhrases)
        .orderBy("doc_id", "phrase")
    }),

    // graph: per-node local clustering coefficient — the node-level
    // refinement of q_transitivity on the same co-purchase graph; the
    // oriented wedge join enumerates each triangle once, an explode
    // credits all three corners (Graph.localClustering scaladoc).
    "q_local_clustering" -> ((s, dir) => {
      Graph.localClustering(coPurchaseEdges(s, dir, minCount = 2))
        .orderBy("id")
    }),

    // lake: zone-map pruning audit — per-month "files" over shipdate,
    // min/max/rows zone maps, then five closed date-interval predicates
    // evaluated against metadata only; exact skip/scan counts
    // (ScaleOps.zoneMapPruning scaladoc). The month-aligned predicates
    // skip whole files; the misaligned one must scan its straddlers.
    "q_zonemap_prune" -> ((s, dir) => {
      val preds = zonePreds.map { case (n, lo, hi) =>
        (n, java.time.LocalDate.parse(lo).toEpochDay,
          java.time.LocalDate.parse(hi).toEpochDay) }
      ScaleOps.zoneMapPruning(t(s, dir, "lineitem"),
          fileCol = (year(col("l_shipdate")) * 12 + month(col("l_shipdate")))
            .cast("long"),
          valueCol = datediff(col("l_shipdate").cast("date"),
            lit("1970-01-01").cast("date")).cast("long"),
          preds)
        .orderBy("pred")
    }),

    // annotation QA at ensemble scale: Fleiss' kappa over THREE raters
    // per document (gold lang, full-text lang-id, first-16-token
    // lang-id) — the multi-annotator agreement gate; every κ term an
    // exact long, three divisions total (Inference.fleissKappa
    // scaladoc).
    "q_fleiss_kappa" -> ((s, dir) => {
      val d = spread(t(s, dir, "documents"))
        .select(col("doc_id"), col("lang"),
          TextStats.tokens(col("text")).as("l"))
      val assign = d.select(col("doc_id"), col("lang").as("cat"))
        .unionAll(d.select(col("doc_id"),
          TextStats.langIdFromTokens(col("l")).as("cat")))
        .unionAll(d.select(col("doc_id"),
          TextStats.langIdFromTokens(slice(col("l"), 1, 16)).as("cat")))
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

    // popularity-weighted link prediction: Adamic–Adar over the same
    // co-purchase graph as q_common_neighbors — shared neighbors
    // down-weighted by 1/ln(degree), so a rare shared part outranks a
    // commodity one; same apex cap and deterministic top-k
    // (Graph.adamicAdar scaladoc).
    "q_adamic_adar" -> ((s, dir) => {
      Graph.adamicAdar(coPurchaseEdges(s, dir, minCount = 2).persist(),
        maxApexDegree = 60, minCommon = 2, topK = 40)
    }),

    // generation eval: ROUGE-1/2 recall over adjacent (odd=candidate,
    // even=reference) doc pairs — clipped multiset n-gram overlap,
    // exact counts, one division per recall (Corpus.rougeOverlap
    // scaladoc).
    "q_rouge_overlap" -> ((s, dir) => {
      val docs = spread(t(s, dir, "documents"))
      val pairs = docs.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id").as("cand_id"),
          (col("doc_id") - 1).as("ref_id"))
        .join(docs.select(col("doc_id").as("ref_id")), "ref_id")
      Corpus.rougeOverlap(docs, pairs)
        .orderBy("cand_id")
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

    // normalized node similarity: neighborhood Jaccard over the
    // co-purchase graph — cn/(d1+d2−cn), ORDERED by the exact integer
    // ppb so no float touches the top-k cut (Graph.nodeJaccard
    // scaladoc).
    "q_node_jaccard" -> ((s, dir) => {
      Graph.nodeJaccard(coPurchaseEdges(s, dir, minCount = 2).persist(),
        maxApexDegree = 60, minCommon = 2, topK = 40)
    }),

    // influence scoring: 2-bounded harmonic centrality — n1 + n2/2
    // carried as the exact integer 6·n1 + 3·n2; the distinct 2-hop
    // pair set is the Σdeg² wedge bound with the midpoint capped
    // (Graph.harmonicCloseness2 scaladoc).
    "q_harmonic_centrality" -> ((s, dir) => {
      Graph.harmonicCloseness2(coPurchaseEdges(s, dir, minCount = 2),
          maxMidDegree = 60)
        .orderBy("id")
    }),

    // community QA: Newman modularity of the brand partition over the
    // co-purchase graph — is same-brand co-purchase denser than the
    // degree-random baseline? Exact doubled-form clearing, one
    // division per community (Graph.modularity scaladoc).
    "q_modularity" -> ((s, dir) => {
      val labels = t(s, dir, "part")
        .select(col("p_partkey").as("id"), col("p_brand").as("community"))
      Graph.modularity(coPurchaseEdges(s, dir, minCount = 2), labels)
        .orderBy("community")
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

    // triple exponential smoothing: additive Holt–Winters with a
    // 7-day season on the per-type daily grid — the q_holt fold with
    // the seasonal RING carried in the accumulator (zero-initialized,
    // so the recurrence is uniform from t=2 and both engines replay
    // the identical IEEE op sequence); forecast_next = l + b + the
    // next period's seasonal (ring head after the update).
    "q_holt_winters" -> ((s, dir) => {
      EventsStream.readEvents(s, s"$dir/events.parquet")
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(round(sum("value"), 2).as("day_total"))
        .select(col("event_type"),
          date_format(col("day"), "yyyy-MM-dd").as("day"), col("day_total"))
        .groupBy("event_type")
        .agg(sort_array(collect_list(struct(col("day"), col("day_total"))))
          .as("ser"))
        .select(col("event_type"), explode(expr(
          """aggregate(ser,
            |  CAST(array() AS ARRAY<STRUCT<day: STRING, day_total: DOUBLE, l: DOUBLE, b: DOUBLE, s: DOUBLE, ring: ARRAY<DOUBLE>>>),
            |  (acc, p) -> array_append(acc, CASE WHEN size(acc) = 0
            |    THEN named_struct('day', p.day, 'day_total', p.day_total,
            |      'l', p.day_total, 'b', CAST(0.0 AS DOUBLE),
            |      's', CAST(0.0 AS DOUBLE),
            |      'ring', array_repeat(CAST(0.0 AS DOUBLE), 7))
            |    ELSE named_struct('day', p.day, 'day_total', p.day_total,
            |      'l', 0.5D * (p.day_total - element_at(element_at(acc, -1).ring, 1)) + 0.5D * (element_at(acc, -1).l + element_at(acc, -1).b),
            |      'b', 0.3D * ((0.5D * (p.day_total - element_at(element_at(acc, -1).ring, 1)) + 0.5D * (element_at(acc, -1).l + element_at(acc, -1).b)) - element_at(acc, -1).l) + 0.7D * element_at(acc, -1).b,
            |      's', 0.2D * (p.day_total - (0.5D * (p.day_total - element_at(element_at(acc, -1).ring, 1)) + 0.5D * (element_at(acc, -1).l + element_at(acc, -1).b))) + 0.8D * element_at(element_at(acc, -1).ring, 1),
            |      'ring', array_append(slice(element_at(acc, -1).ring, 2, 6),
            |        0.2D * (p.day_total - (0.5D * (p.day_total - element_at(element_at(acc, -1).ring, 1)) + 0.5D * (element_at(acc, -1).l + element_at(acc, -1).b))) + 0.8D * element_at(element_at(acc, -1).ring, 1)))
            |    END))""".stripMargin)).as("r"))
        .select(col("event_type"), col("r.day").as("day"),
          col("r.day_total").as("day_total"),
          round(col("r.l"), 6).as("level"), round(col("r.b"), 6).as("trend"),
          round(col("r.s"), 6).as("seasonal"),
          round(col("r.l") + col("r.b") + element_at(col("r.ring"), 1), 6)
            .as("forecast_next"))
        .orderBy("event_type", "day")
    }),

    // CUSUM control chart — the sequential drift detector
    // S⁺_t = max(0, S⁺_{t−1} + (x_t − μ − k)), S⁻ mirrored — run
    // INTEGER-EXACT: day totals become cents, the recurrence is scaled
    // by 100·n so the target μ = Σc/n never divides (n·c_t − Σc is the
    // exact scaled deviation), and both CUSUM statistics fold as exact
    // longs; the only divisions are the final display rescale. Slack
    // k = 5.00 units, alarm threshold h = 25.00 units, both compared
    // in scaled-integer space so the alarm boolean can never disagree
    // over a float ulp. Same one-fold-per-series scale contract as
    // q_ewma (bounded daily grid; q_ewma_chunked documents the
    // long-series fallback shape).
    "q_cusum" -> ((s, dir) => {
      EventsStream.readEvents(s, s"$dir/events.parquet")
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(round(sum("value"), 2).as("day_total"))
        .select(col("event_type"),
          date_format(col("day"), "yyyy-MM-dd").as("day"), col("day_total"),
          round(col("day_total") * 100).cast("long").as("c"))
        .groupBy("event_type")
        .agg(sort_array(collect_list(struct(col("day"), col("day_total"),
            col("c")))).as("ser"),
          count(lit(1)).as("n"), sum("c").as("stot"))
        .select(col("event_type"), col("n"), explode(expr(
          """aggregate(ser,
            |  CAST(array() AS ARRAY<STRUCT<day: STRING, day_total: DOUBLE, tp: BIGINT, tn: BIGINT>>),
            |  (acc, p) -> array_append(acc, named_struct(
            |    'day', p.day, 'day_total', p.day_total,
            |    'tp', greatest(0L, CASE WHEN size(acc) = 0 THEN 0L ELSE element_at(acc, -1).tp END + (n * p.c - stot) - n * 500L),
            |    'tn', greatest(0L, CASE WHEN size(acc) = 0 THEN 0L ELSE element_at(acc, -1).tn END - (n * p.c - stot) - n * 500L))))""".stripMargin))
          .as("r"))
        .select(col("event_type"), col("r.day").as("day"),
          col("r.day_total").as("day_total"),
          round(col("r.tp") / (lit(100.0) * col("n")), 6).as("s_pos"),
          round(col("r.tn") / (lit(100.0) * col("n")), 6).as("s_neg"),
          (col("r.tp") > col("n") * lit(2500L) ||
            col("r.tn") > col("n") * lit(2500L)).as("alarm"))
        .orderBy("event_type", "day")
    }),

    // Wilder RSI (14-period relative strength index) — the classic
    // momentum oscillator whose smoothing ag_t = (13·ag + gain)/14 is
    // the q_ewma recursion with α = 1/14. Day-over-day deltas are
    // EXACT (long cents via one lag window per series, before any
    // float), the two smoothed averages fold per series in recursion
    // order (bit-equal with the recursive-CTE oracle), and RSI is one
    // row-wise transform of the exploded state. Seeding: ag₂ = gain₂
    // (recurrence uniform from t = 3 — the q_holt_winters convention)
    // rather than the traditional 14-bar SMA warmup; flat series pin
    // RSI to 50 by contract (ag = al = 0 leaves momentum undefined).
    "q_rsi" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("event_type").orderBy("day")
      EventsStream.readEvents(s, s"$dir/events.parquet")
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(round(sum("value"), 2).as("day_total"))
        .select(col("event_type"),
          date_format(col("day"), "yyyy-MM-dd").as("day"), col("day_total"),
          round(col("day_total") * 100).cast("long").as("c"))
        .withColumn("g",
          greatest(col("c") - lag("c", 1).over(w), lit(0L)) / lit(100.0))
        .withColumn("l",
          greatest(lag("c", 1).over(w) - col("c"), lit(0L)) / lit(100.0))
        .groupBy("event_type")
        .agg(sort_array(collect_list(struct(col("day"), col("day_total"),
          col("g"), col("l")))).as("ser"))
        .select(col("event_type"), explode(expr(
          """aggregate(ser,
            |  CAST(array() AS ARRAY<STRUCT<day: STRING, day_total: DOUBLE, ag: DOUBLE, al: DOUBLE>>),
            |  (acc, p) -> array_append(acc, CASE WHEN size(acc) = 0
            |    THEN named_struct('day', p.day, 'day_total', p.day_total,
            |      'ag', CAST(NULL AS DOUBLE), 'al', CAST(NULL AS DOUBLE))
            |    ELSE named_struct('day', p.day, 'day_total', p.day_total,
            |      'ag', CASE WHEN element_at(acc, -1).ag IS NULL THEN p.g
            |                 ELSE (element_at(acc, -1).ag * 13.0D + p.g) / 14.0D END,
            |      'al', CASE WHEN element_at(acc, -1).al IS NULL THEN p.l
            |                 ELSE (element_at(acc, -1).al * 13.0D + p.l) / 14.0D END)
            |    END))""".stripMargin)).as("r"))
        .select(col("event_type"), col("r.day").as("day"),
          col("r.day_total").as("day_total"),
          round(when(col("r.ag").isNull, lit(null))
            .when(col("r.al") === 0.0 && col("r.ag") === 0.0, lit(50.0))
            .when(col("r.al") === 0.0, lit(100.0))
            .otherwise(lit(100.0) - lit(100.0) /
              (lit(1.0) + col("r.ag") / col("r.al"))), 6).as("rsi"))
        .orderBy("event_type", "day")
    }),

    // q_holt_winters through the long-series fallback: per-chunk
    // basis-propagated affine summaries over the (l, b, ring[7]) state,
    // boundary fold, in-chunk sequential re-fold at O(√len) task memory
    // (Forecast.holtWintersChunked scaladoc) — closes the fold family's
    // last collect-whole-series hole.
    "q_holt_winters_chunked" -> ((s, dir) => {
      val daily = EventsStream.readEvents(s, s"$dir/events.parquet")
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(round(sum("value"), 2).as("day_total"))
        .select(col("event_type"),
          date_format(col("day"), "yyyy-MM-dd").as("day"), col("day_total"))
      Forecast.holtWintersChunked(daily, Seq("event_type"), "day",
          "day_total", alpha = 0.5, beta = 0.3, gamma = 0.2, period = 7,
          chunkSize = 16)
        .select(col("event_type"), col("day"), col("day_total"),
          round(col("level"), 6).as("level"),
          round(col("trend"), 6).as("trend"),
          round(col("seasonal"), 6).as("seasonal"),
          round(col("forecast_next"), 6).as("forecast_next"))
        .orderBy("event_type", "day")
    }),

    // q_cusum through the long-series fallback — and the one chunked
    // fold that is BIT-exact, not tolerance-equal: max(0, s+d) maps
    // compose closed in the max-plus semiring over exact longs
    // (Forecast.cusumChunked scaladoc), so this shares q_cusum's
    // oracle with zero float risk. Per-series n/Σc come from one
    // partition window instead of a collected aggregate.
    "q_cusum_chunked" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val wAll = Window.partitionBy("event_type")
      val daily = EventsStream.readEvents(s, s"$dir/events.parquet")
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(round(sum("value"), 2).as("day_total"))
        .select(col("event_type"),
          date_format(col("day"), "yyyy-MM-dd").as("day"), col("day_total"),
          round(col("day_total") * 100).cast("long").as("c"))
        .withColumn("n", count(lit(1)).over(wAll))
        .withColumn("stot", sum("c").over(wAll))
        .withColumn("dp",
          (col("n") * col("c") - col("stot")) - col("n") * lit(500L))
        .withColumn("dn",
          -(col("n") * col("c") - col("stot")) - col("n") * lit(500L))
      Forecast.cusumChunked(daily.select("event_type", "day", "dp", "dn"),
          Seq("event_type"), "day", "dp", "dn", chunkSize = 16)
        .join(daily.select("event_type", "day", "day_total", "n"),
          Seq("event_type", "day"))
        .select(col("event_type"), col("day"), col("day_total"),
          round(col("tp") / (lit(100.0) * col("n")), 6).as("s_pos"),
          round(col("tn") / (lit(100.0) * col("n")), 6).as("s_neg"),
          (col("tp") > col("n") * lit(2500L) ||
            col("tn") > col("n") * lit(2500L)).as("alarm"))
        .orderBy("event_type", "day")
    }),

    // Wilder RSI through the long-series fallback: the α = 1/14
    // smoothing is the EWMA recursion, so each series drops its
    // delta-less first row and runs TWO ewmaChunked folds (gains,
    // losses) seeded ag₂ = g₂ — the α-form op order (α·g + (1−α)·ag),
    // stated in this query's own oracle, vs q_rsi's (13·ag + g)/14;
    // the two differ only in IEEE rounding of each step.
    "q_rsi_chunked" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("event_type").orderBy("day")
      val daily = EventsStream.readEvents(s, s"$dir/events.parquet")
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(round(sum("value"), 2).as("day_total"))
        .select(col("event_type"),
          date_format(col("day"), "yyyy-MM-dd").as("day"), col("day_total"),
          round(col("day_total") * 100).cast("long").as("c"))
        .withColumn("g",
          greatest(col("c") - lag("c", 1).over(w), lit(0L)) / lit(100.0))
        .withColumn("l",
          greatest(lag("c", 1).over(w) - col("c"), lit(0L)) / lit(100.0))
        .withColumn("rn", row_number().over(w))
      val rest = daily.filter(col("rn") > 1)
      val ag = Forecast.ewmaChunked(rest.select("event_type", "day", "g"),
          Seq("event_type"), "day", "g", alpha = 1.0 / 14, chunkSize = 16)
        .select(col("event_type"), col("day"), col("ewma").as("ag"))
      val al = Forecast.ewmaChunked(rest.select("event_type", "day", "l"),
          Seq("event_type"), "day", "l", alpha = 1.0 / 14, chunkSize = 16)
        .select(col("event_type"), col("day"), col("ewma").as("al"))
      daily.select("event_type", "day", "day_total", "rn")
        .join(ag, Seq("event_type", "day"), "left")
        .join(al, Seq("event_type", "day"), "left")
        .select(col("event_type"), col("day"), col("day_total"),
          round(when(col("rn") === 1, lit(null))
            .when(col("al") === 0.0 && col("ag") === 0.0, lit(50.0))
            .when(col("al") === 0.0, lit(100.0))
            .otherwise(lit(100.0) - lit(100.0) /
              (lit(1.0) + col("ag") / col("al"))), 6).as("rsi"))
        .orderBy("event_type", "day")
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

    // generative text classifier: multinomial naive Bayes trained on
    // the corpus labels (language), applied back to every document —
    // token log-probs and priors NANO-QUANTIZED so each doc score is
    // an exact-long rollup and the argmax can never flip on a float
    // ulp (TextStats.naiveBayes scaladoc); resubstitution accuracy is
    // the gate (q_group_split holds the honest-split pattern).
    "q_naive_bayes" -> ((s, dir) => {
      TextStats.naiveBayes(spread(t(s, dir, "documents")),
          col("doc_id"), col("text"), col("lang"))
        .orderBy("id")
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

    // record-linkage blocking quality: pairs completeness / pair
    // quality / reduction ratio of the LSH blocking scheme against the
    // exact-duplicate ground truth (shared normalized fingerprint).
    // No pair space ever enumerates beyond the capped LSH candidates:
    // truth pairs COUNT as Σ m(m−1)/2 per fingerprint group, and the
    // intersection tests each candidate's two fingerprints for
    // equality — so the metrics that judge the blocking cost only the
    // blocking.
    "q_blocking_eval" -> ((s, dir) => {
      val docs = spread(t(s, dir, "documents"))
      val fp = docs.select(col("doc_id"),
        Dedup.normalizedFingerprint(col("text")).as("fp"))
      val sig = Dedup.minhashSignatures(docs, k = 4, n = 3).persist()
      val cand = Dedup.lshCandidatePairs(
        Dedup.lshBands(sig, k = 4, rowsPerBand = 2))
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      val truth = fp.groupBy("fp").agg(count(lit(1)).as("m"))
        .agg(coalesce(sum(expr("m * (m - 1) DIV 2")), lit(0L)).as("n_truth"))
      val hits = cand
        .join(fp.select(col("doc_id").as("id1"), col("fp").as("f1")), "id1")
        .join(fp.select(col("doc_id").as("id2"), col("fp").as("f2")), "id2")
        .agg(count(lit(1)).as("n_cand"),
          coalesce(sum(when(col("f1") === col("f2"), 1L).otherwise(0L)),
            lit(0L)).as("n_hit"))
      nDocs.crossJoin(truth).crossJoin(hits) // three 1-row scalars
        .select(col("n_docs"), col("n_truth"), col("n_cand"), col("n_hit"),
          round(col("n_hit") / nullif(col("n_truth"), lit(0L)).cast("double"),
            6).as("completeness"),
          round(col("n_hit") / nullif(col("n_cand"), lit(0L)).cast("double"),
            6).as("quality"),
          round(lit(1.0) - col("n_cand") /
            (col("n_docs") * (col("n_docs") - 1L) / lit(2.0)), 6)
            .as("reduction_ratio"))
        .orderBy("n_docs")
    }),

    // time-series similarity: BANDED DYNAMIC TIME WARPING between every
    // pair of per-type daily series — the alignment distance that
    // tolerates phase shift (which day-wise L1 cannot), the kernel
    // behind series clustering and motif search. The whole DP runs as
    // ONE nested fold per pair (outer fold over rows of the DP matrix,
    // inner fold builds each row left-to-right), entirely in exact
    // LONG cents with a 10^15 sentinel for cells outside the
    // Sakoe–Chiba band (|i−j| ≤ 10) — so the distance hashes
    // identically on any engine, no float ever enters the recurrence.
    // Scale: series are grid-bounded by the daily-aggregate contract
    // (the q_ewma rule); pairs are |types|²-bounded; the fold is
    // O(n·m) cells per pair — a production banded kernel would store
    // only the 2r+1 band per row, this exact form trades that constant
    // for clarity. Unreachable alignments (length gap > band) surface
    // as NULL.
    "q_dtw" -> ((s, dir) => {
      val ser = EventsStream.readEvents(s, s"$dir/events.parquet")
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(round(sum("value"), 2).as("day_total"))
        .select(col("event_type"),
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          round(col("day_total") * 100).cast("long").as("c"))
        .groupBy("event_type")
        .agg(expr("transform(sort_array(collect_list(struct(day, c))), p -> p.c)")
          .as("ser"))
      val pairs = ser.as("a")
        .join(ser.as("b"), col("a.event_type") < col("b.event_type"))
        .select(col("a.event_type").as("type_a"),
          col("b.event_type").as("type_b"),
          col("a.ser").as("sa"), col("b.ser").as("sb"))
      pairs
        .select(col("type_a"), col("type_b"),
          size(col("sa")).as("n_a"), size(col("sb")).as("n_b"),
          expr(
            """element_at(aggregate(
              |  sequence(1, size(sa)),
              |  concat(array(0L), transform(sequence(1, size(sb)), x -> 1000000000000000L)),
              |  (old, i) -> aggregate(
              |    sequence(1, size(sb)),
              |    array(1000000000000000L),
              |    (racc, j) -> array_append(racc,
              |      CASE WHEN abs(i - j) > 10 THEN 1000000000000000L
              |           ELSE abs(element_at(sa, i) - element_at(sb, j)) +
              |                least(element_at(racc, -1), element_at(old, j + 1), element_at(old, j))
              |      END))), -1)""".stripMargin).as("raw"))
        .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
          when(col("raw") < lit(1000000000000000L), col("raw"))
            .as("dtw_cents"),
          round(when(col("raw") < lit(1000000000000000L), col("raw"))
            / 100.0, 2).as("dtw"))
        .orderBy("type_a", "type_b")
    }),

    // scheduling: weighted CRITICAL PATH over the banded co-purchase
    // DAG (the q_dag_layers input with deterministic integer stage
    // costs w = 1 + (src·7 + dst) % 5) — cost(v) = the most expensive
    // dependency chain ending at v, the number every pipeline latency
    // budget starts from. Max-plus propagation in exact longs with the
    // Σ-monotone early exit (Graph.criticalPath scaladoc).
    "q_critical_path" -> ((s, dir) => {
      val e = coPurchasePairs(s, dir, minCount = 1)
        .select((col("id1") % 200).as("src"), (col("id2") % 200).as("dst"))
        .filter(floor(col("dst") / 25) === floor(col("src") / 25) + 1)
        .distinct()
        .withColumn("w", lit(1L) + (col("src") * 7L + col("dst")) % 5L)
        .persist() // 8 max-plus rounds re-read the pair self-join
      Graph.criticalPath(e, maxRounds = 8).orderBy("id")
    }),

    // TS mining: SAX-lite symbolic discretization — each type's daily
    // series collapses to full-week PAA segments (partial tail weeks
    // drop, so segment sums compare exactly as longs with no
    // mean-of-unequal-lengths rational), each segment takes a quartile
    // letter a–d via ntile over the (sum, index)-ordered segment grid
    // (rank-based alphabet — a stated deviation from Gaussian
    // breakpoints: no float mean/σ enters the symbolization), and the
    // per-type SAX WORD concatenates in week order. The downstream
    // consumers (motif grouping, anomaly grep) string-match the words.
    "q_sax" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val wo = Window.partitionBy("event_type").orderBy("day")
      val seg = EventsStream.readEvents(s, s"$dir/events.parquet")
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(round(sum("value"), 2).as("day_total"))
        .select(col("event_type"),
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          round(col("day_total") * 100).cast("long").as("c"))
        .withColumn("widx", ((row_number().over(wo) - 1) / 7)
          .cast("long"))
        .groupBy("event_type", "widx")
        .agg(sum("c").as("wsum"), count(lit(1)).as("wn"))
        .filter(col("wn") === 7)
        .withColumn("sym", ntile(4).over(
          Window.partitionBy("event_type").orderBy("wsum", "widx")))
      seg.groupBy("event_type")
        .agg(count(lit(1)).as("n_weeks"),
          expr("""concat_ws('', transform(
            |  sort_array(collect_list(struct(widx, char(96 + sym)))),
            |  p -> p.col2))""".stripMargin).as("sax_word"))
        .orderBy("event_type")
    }),

    // finance/metering: daily VWAP — the volume-weighted twin of
    // q_twap: Σ(price·qty)/Σqty per (type, day) with price in exact
    // cents and a deterministic integer qty, so both sums are exact
    // longs and the single division lands at the end.
    "q_vwap" -> ((s, dir) => {
      EventsStream.readEvents(s, s"$dir/events.parquet")
        .select(col("event_type"),
          date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
          round(col("value") * 100).cast("long").as("p"),
          (col("event_id") % 7 + 1).as("q"))
        .groupBy("event_type", "day")
        .agg(sum(col("p") * col("q")).as("pq"), sum("q").as("qty"))
        .select(col("event_type"), col("day"), col("qty"),
          round(col("pq") / (lit(100.0) * col("qty")), 6).as("vwap"))
        .orderBy("event_type", "day")
    }),

    // data forensics: Benford first-digit conformance of the price
    // column — exact digit counts over one map-side-combined pass,
    // expected proportions as plan literals, χ² terms nano-quantized
    // so the statistic is an exact-long rollup (the q_chi2_test rule).
    "q_benford" -> ((s, dir) => {
      Inference.benford(t(s, dir, "lineitem"), floor(col("l_extendedprice")))
    }),

    // rolling co-movement monitor: trailing-14-day Pearson correlation
    // between daily click and purchase value totals, from six exact
    // long frame sums — the drift alarm that fires when two coupled
    // business metrics decouple. Window runs over the bounded day
    // grid (aggregate-first contract), not events.
    "q_rolling_corr" -> ((s, dir) => {
      val daily = EventsStream.readEvents(s, s"$dir/events.parquet")
        .groupBy(datediff(col("ts").cast("date"),
          lit("1970-01-01").cast("date")).as("d"))
        .agg(
          sum(when(col("event_type") === "click", floor(col("value") * 100))
            .otherwise(0L)).cast("long").as("a"),
          sum(when(col("event_type") === "purchase", floor(col("value") * 100))
            .otherwise(0L)).cast("long").as("b"))
      Inference.rollingCorr(daily, col("d"), col("a"), col("b"), window = 14)
    }),

    // embedding class geometry: pairwise cosine between per-label
    // centroids from exact scaled-long component sums (cosine of the
    // SUM vector ≡ cosine of the centroid — scale invariance), k·d
    // shuffle and a k² pair table, corpus never pairwise-joined.
    "q_label_centroids" -> ((s, dir) => {
      Similarity.labelCentroidSims(t(s, dir, "embeddings"))
        .orderBy("label_a", "label_b")
    }),

    // bigram LM quality score: mean −ln P(w2|w1) per doc from the
    // corpus's own bigram counts — catches plausible-words-implausible-
    // order text (shuffled/stuffed/template spam) that the unigram
    // score (q_lm_surprisal) cannot. Bigrams built narrowly (zip_with,
    // no pre-count shuffle); count and join-back share the bigram key.
    "q_bigram_surprisal" -> ((s, dir) => {
      Corpus.bigramSurprisal(spread(t(s, dir, "documents")))
        .orderBy("doc_id")
    }),

    // LM-smoothing: Kneser–Ney continuation counts — per word, how many
    // DISTINCT left contexts it completes (N1+(·w)) and the KN
    // continuation probability against the distinct-bigram-type total,
    // as exact parts-per-billion. One pair-keyed exchange (reused for
    // both the per-word rollup and the normalizer), Zipf-bounded.
    "q_kn_continuation" -> ((s, dir) => {
      Corpus.knContinuation(spread(t(s, dir, "documents")), minCtx = 5)
        .orderBy("w")
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

    // streaming dedup with BOUNDED state: dropDuplicatesWithinWatermark
    // evicts key state as the watermark passes — the unbounded-key
    // production form of q_stream_dedup. Bounded single-batch run ⇒
    // surviving keys == exact distinct (the oracle); the state-size
    // contract is the difference at scale.
    "q_stream_dedup_wm" -> ((s, dir) => {
      EventsStream.runDedupWithinWatermarkOnce(s, s"$dir/events.parquet")
        .orderBy("event_type")
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

    // lexical near-neighbors with no embeddings: TF-IDF cosine over the
    // inverted-index self-join, df-banded so no stopword posting list
    // ever joins. Integer-scaled idf keeps dot/norms exact; cosine is
    // one fixed IEEE tower — bit-identical cross-engine.
    "q_tfidf_pairs" -> ((s, dir) => {
      TextStats.tfidfCosinePairs(spread(t(s, dir, "documents")))
        .withColumn("cos_r", round(col("cosine"), 6))
        .filter(col("cos_r") >= 0.25)
        .select(col("a"), col("b"), col("n_shared"), col("cos_r"))
        .orderBy(desc("cos_r"), asc("a"), asc("b"))
        .limit(50)
    }),

    // model-eval gain table: rank by classifier score, cut into
    // deciles, report exact counts + cumulative precision and lift —
    // the "top-10% is k× richer" number a selection pipeline quotes.
    "q_lift_table" -> ((s, dir) => {
      val docs = spread(t(s, dir, "documents"))
      val scored = TextStats.classifierScore(
          docs, TextStats.hashedModel(s, 1024), dim = 1024)
        .select(col("doc_id"), round(col("score"), 6).as("r"))
      val lab = t(s, dir, "documents")
        .select(col("doc_id"), (col("lang") === "en").cast("int").as("pos"))
      Inference.liftTable(scored.join(lab, "doc_id"),
        col("doc_id"), col("r"), col("pos"), buckets = 10)
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

    // Holt double exponential smoothing (level + trend): the q_ewma
    // sequential-fold contract with TWO carried states; l' then b'
    // reuse the identical expression text, so the IEEE op sequence —
    // hence every bit — matches the oracle's recursive CTE. α=0.5,
    // β=0.3; init l₁=y₁, b₁=0.
    "q_holt" -> ((s, dir) => {
      EventsStream.readEvents(s, s"$dir/events.parquet")
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(round(sum("value"), 2).as("day_total"))
        .select(col("event_type"),
          date_format(col("day"), "yyyy-MM-dd").as("day"), col("day_total"))
        .groupBy("event_type")
        .agg(sort_array(collect_list(struct(col("day"), col("day_total"))))
          .as("ser"))
        .select(col("event_type"), explode(expr(
          """aggregate(ser,
            |  CAST(array() AS ARRAY<STRUCT<day: STRING, day_total: DOUBLE, l: DOUBLE, b: DOUBLE>>),
            |  (acc, p) -> array_append(acc, CASE WHEN size(acc) = 0
            |    THEN named_struct('day', p.day, 'day_total', p.day_total,
            |      'l', p.day_total, 'b', CAST(0.0 AS DOUBLE))
            |    ELSE named_struct('day', p.day, 'day_total', p.day_total,
            |      'l', 0.5D * p.day_total + 0.5D * (element_at(acc, -1).l + element_at(acc, -1).b),
            |      'b', 0.3D * ((0.5D * p.day_total + 0.5D * (element_at(acc, -1).l + element_at(acc, -1).b)) - element_at(acc, -1).l)
            |         + 0.7D * element_at(acc, -1).b)
            |    END))""".stripMargin)).as("r"))
        .select(col("event_type"), col("r.day").as("day"),
          col("r.day_total").as("day_total"),
          round(col("r.l"), 6).as("level"), round(col("r.b"), 6).as("trend"),
          round(col("r.l") + col("r.b"), 6).as("forecast_next"))
        .orderBy("event_type", "day")
    }),

    // entity matching: reciprocal best match among LSH-bucket
    // candidates — each side's argmax ranks on (rounded cosine, id),
    // and only mutually-best pairs survive.
    "q_reciprocal_match" -> ((s, dir) => {
      Similarity.reciprocalBestMatch(spread(t(s, dir, "embeddings")), annPlanes)
        .orderBy("id1")
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

    // SQL rank-function surface in one query: dense_rank /
    // percent_rank / cume_dist / ntile over the same value-ordered
    // window (value order ⇒ tie handling is engine-exact by the SQL
    // standard). Top-3 spenders per nation off the customer grid.
    "q_rank_functions" -> ((s, dir) => {
      val spend = t(s, dir, "orders").groupBy("o_custkey")
        .agg(sum(floor(col("o_totalprice"))).cast("long").as("spend"))
      val g = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
        .join(spend, col("c_custkey") === col("o_custkey"))
      val w = Window.partitionBy("c_nationkey").orderBy(desc("spend"))
      g.select(col("c_nationkey"), col("c_custkey"), col("spend"),
          dense_rank().over(w).as("drank"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume"),
          ntile(4).over(Window.partitionBy("c_nationkey")
            .orderBy(desc("spend"), asc("c_custkey"))).as("quartile"))
        .filter(col("drank") <= 3)
        .orderBy(asc("c_nationkey"), desc("spend"), asc("c_custkey"))
    }),

    // feature preprocessing: quantile normalization — map each value
    // to its empirical quantile rank/(n+1) within the group, then
    // summarize per subgroup. Rank sums stay exact longs; one division.
    // Ranks come from the DISTINCT-VALUE cumulative-count grid (min
    // rank of value v = cum(<v) + 1 — identical to rank() for ties),
    // not a full-row window: with a 3-value group key the row window
    // is two-reducer-funnel territory (the q_spearman lesson), while
    // the grid form's only group-partitioned sort is over distinct
    // cents values and every row-sized exchange hashes on
    // high-cardinality keys.
    "q_quantile_normalize" -> ((s, dir) => {
      val li = spread(t(s, dir, "lineitem")).select(col("l_returnflag"),
        col("l_linestatus"), floor(col("l_extendedprice") * 100).as("cents"))
      // the only pass over raw rows: (flag, status, cents) multiplicities
      val grid = li.groupBy("l_returnflag", "l_linestatus", "cents")
        .agg(count(lit(1)).as("c"))
      val axis = grid.groupBy("l_returnflag", "cents").agg(sum("c").as("ac"))
      val wCum = Window.partitionBy("l_returnflag").orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ranks = axis
        .withColumn("end", sum("ac").over(wCum))
        .withColumn("ng", sum("ac").over(Window.partitionBy("l_returnflag")))
        .select(col("l_returnflag"), col("cents"),
          (col("end") - col("ac") + lit(1L)).as("rk"), col("ng"))
      grid.join(ranks, Seq("l_returnflag", "cents"))
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

    // classical seasonal decomposition, grid-first and integer-exact:
    // trend = centered 7-day sum (full windows only), 7×detrended =
    // 7·y − Σ₇ stays an exact long, and the per-(type, weekday)
    // seasonal index divides once at the end.
    "q_seasonal_decompose" -> ((s, dir) => {
      val daily = EventsStream.readEvents(s, s"$dir/events.parquet")
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(round(sum("value"), 2).as("day_total"))
        .select(col("event_type"), col("day"),
          floor(col("day_total") * 100 + lit(0.5)).cast("long").as("cents"))
      val w7 = Window.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
      daily
        .withColumn("sum7", sum("cents").over(w7))
        .withColumn("n7", count(lit(1)).over(w7))
        .filter(col("n7") === 7)
        .withColumn("d7", col("cents") * 7 - col("sum7"))
        .groupBy(col("event_type"), expr("weekday(day)").as("dow"))
        .agg(count(lit(1)).as("n_days"), sum("d7").as("sd7"))
        .select(col("event_type"), col("dow"), col("n_days"),
          round(col("sd7").cast("double") /
            (col("n_days") * 7).cast("double") / 100.0, 4).as("seasonal_idx"))
        .orderBy("event_type", "dow")
    }),

    // storage advisor: candidate partition-key audit in ONE scan (the
    // q_column_profile Expand pattern) — per candidate: partition
    // count, max/min partition rows, integer skew ratio, and a
    // recommendation under the standard layout rules (not too few
    // partitions, not too many, skew bounded).
    "q_partition_layout" -> ((s, dir) => {
      EventsStream.readEvents(s, s"$dir/events.parquet")
        .select(col("event_type").as("c1"),
          date_format(col("ts"), "yyyy-MM-dd").as("c2"),
          (col("user_id") % 64).cast("string").as("c3"))
        .select(expr(
          "stack(3, 'day', c2, 'event_type', c1, 'user_mod64', c3) AS (cand, v)"))
        .groupBy("cand", "v").agg(count(lit(1)).as("n"))
        .groupBy("cand")
        .agg(count(lit(1)).as("n_partitions"), max("n").as("max_rows"),
          min("n").as("min_rows"), sum("n").as("n_rows"))
        .withColumn("skew_x100",
          expr("(max_rows * n_partitions * 100) div n_rows"))
        .withColumn("recommended",
          col("n_partitions").between(5, 10000) && col("skew_x100") < 300)
        .orderBy("cand")
    }),

    // train/val/test leakage audit: normalized-fingerprint collisions
    // that CROSS the hash-split boundary — the contamination a random
    // row split invites and a key split prevents. Exact counts.
    "q_split_leakage" -> ((s, dir) => {
      val docs = spread(t(s, dir, "documents"))
        .select(col("doc_id"), ScaleOps.splitByKey(col("doc_id")).as("split"),
          Dedup.normalizedFingerprint(col("text")).as("fp"))
      val fpSplits = docs.groupBy("fp")
        .agg(countDistinct("split").as("n_splits"))
      docs.join(fpSplits, "fp")
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("n_splits") > 1, 1)).as("n_leaky_docs"),
          countDistinct(when(col("n_splits") > 1, col("fp"))).as("n_leaky_fps"))
        .orderBy("split")
    }),

    // stats: Spearman rank correlation per returnflag between quantity
    // and price cents — the outlier-proof monotone-association screen.
    // Doubled-midrank machinery keeps every power sum an exact integer
    // (see Inference.spearman); rows collapse to the (group, x, y) grid
    // first and the ranks come from distinct-value cumulative counts,
    // so NO full-row sort ever runs inside the 3-value group partition
    // (the low-cardinality window funnel: 15.3 s → 4.4 s at sf1).
    "q_spearman" -> ((s, dir) => {
      Inference.spearman(spread(t(s, dir, "lineitem")), Seq("l_returnflag"),
        col("l_quantity"), floor(col("l_extendedprice") * 100))
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

    // export: deterministic multiplicative-hash shards (high bits) —
    // reproducible training-data placement any consumer can recompute;
    // per-shard balance audit is one narrow scan + one small groupBy.
    "q_shard_assign" -> ((s, dir) => {
      spread(t(s, dir, "documents"))
        .withColumn("shard", ScaleOps.shardOf(col("doc_id"), 8))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("n_chars_total"),
          countDistinct("lang").as("n_langs"),
          min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
        .orderBy("shard")
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

    // corpus: skip-gram (center, context) training pairs within
    // positional distance 2 — generated narrowly (nested-HOF zip_with;
    // token arrays never self-join), counted on the Zipf-bounded pair
    // grid, top-30 by an engine-exact total order.
    "q_skipgram" -> ((s, dir) => {
      Corpus.skipgramPairs(spread(t(s, dir, "documents")), window = 2, topK = 30)
    }),

    // spatial: grid-blocked proximity self-join — synthetic uniform
    // coordinates from two independent 32-bit halves of md5(event_id)
    // (a multiplicative hash would put both coords on one lattice
    // line: linear in the id), all pairs within Chebyshev distance 8
    // via 3x3 cell blocking, reduced to the distance histogram. The
    // join is an equi-join on the cell key; pair work is bounded by
    // per-cell density.
    "q_grid_join" -> ((s, dir) => {
      Spatial.gridNeighborPairs(eventPoints(s, dir), "event_id",
          col("x"), col("y"), cellSize = 8, radius = 8)
        .groupBy("dist").agg(count(lit(1)).as("n_pairs"))
        .orderBy("dist")
    }),

    // spatial: per-point nearest neighbor within radius — cell-blocked
    // argmin (the geometric twin of ANN top-k); isolated points emit
    // nothing.
    "q_spatial_nn" -> ((s, dir) => {
      Spatial.nearestNeighbors(eventPoints(s, dir), "event_id",
          col("x"), col("y"), cellSize = 8, radius = 8)
        .orderBy("id")
    }),

    // ext: grid-density clustering (cell-level DBSCAN) over the hashed
    // event points — cells of side 200, core at >= 6 points, clusters =
    // 8-neighbor components of core cells labeled by min packed cell
    // key, border points adopt the min-labeled adjacent cluster, rest
    // is noise (-1). Every decision is integer cell arithmetic; the
    // component search runs on the CELL graph (bounded by grid area),
    // so the pattern holds at any corpus size. The DuckDB oracle
    // mirrors the min-label fixpoint with a recursive CTE.
    "q_dbscan_grid" -> ((s, dir) => {
      Spatial.gridDensityClusters(eventPoints(s, dir), "event_id",
          col("x"), col("y"), cellSize = 200, minPts = 6)
        .orderBy("cluster_id")
    }),

    // ops: peak concurrent sessions per day — sweep line over the
    // sessionized intervals (+1/−1 boundaries, one grid-bounded
    // ordered pass), inclusive-overlap tie order.
    "q_max_concurrency" -> ((s, dir) => {
      Sessionize.peakConcurrency(
          Sessionize.sessionizeBatch(
            EventsStream.readEvents(s, s"$dir/events.parquet"),
            gapSeconds = 300, keyCol = "user_id"))
        .orderBy("day")
    }),

    // ops: the same sweep as a TWO-LEVEL segmented scan (chunked by
    // 7-day ranges with carried boundary levels) — the form whose
    // per-chunk sort stays bounded when the boundary stream outgrows
    // one ordered pass; gated against the SAME oracle as
    // q_max_concurrency, so the decomposition identity itself is
    // hash-checked.
    "q_max_concurrency_chunked" -> ((s, dir) => {
      Sessionize.peakConcurrencyChunked(
          Sessionize.sessionizeBatch(
            EventsStream.readEvents(s, s"$dir/events.parquet"),
            gapSeconds = 300, keyCol = "user_id"),
          chunkDays = 7)
        .orderBy("day")
    }),

    // lake: schema-evolution read — two parquet generations (gen 2
    // adds disc_c) merged by mergeSchema; early rows surface null for
    // the late column. The fixture derives deterministically from
    // lineitem and is REWRITTEN every run (overwrite, no cache) so a
    // testdata regeneration can never serve stale bytes; the oracle
    // recomputes the same split from the live table.
    "q_schema_evolution" -> ((s, dir) => {
      val dirKey = java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val evoDir = s"${System.getProperty("java.io.tmpdir")}/graft_evo_$dirKey"
      val li = t(s, dir, "lineitem")
      li.filter(col("l_linenumber") === 1)
        .select(col("l_orderkey"), col("l_returnflag").as("rflag"),
          floor(col("l_quantity")).cast("long").as("qty"))
        .coalesce(1).write.mode("overwrite").parquet(s"$evoDir/gen1")
      li.filter(col("l_linenumber") === 2)
        .select(col("l_orderkey"), col("l_returnflag").as("rflag"),
          floor(col("l_quantity")).cast("long").as("qty"),
          floor(col("l_discount") * 100).cast("long").as("disc_c"))
        .coalesce(1).write.mode("overwrite").parquet(s"$evoDir/gen2")
      s.read.option("mergeSchema", "true")
        .parquet(s"$evoDir/gen1", s"$evoDir/gen2")
        .groupBy("rflag")
        .agg(count(lit(1)).as("n"), count(col("disc_c")).as("n_with_disc"),
          sum("qty").as("sum_qty"), sum("disc_c").as("sum_disc"))
        .orderBy("rflag")
    }),

    // sampling: recency-weighted popularity — step-decay halving per
    // 7 elapsed days keeps every weight a power of two (no libm), so
    // the score is exact integer arithmetic end to end.
    "q_decayed_count" -> ((s, dir) => {
      ScaleOps.decayedCounts(EventsStream.readEvents(s, s"$dir/events.parquet"),
          Seq("event_type"), col("ts"), halfLifeDays = 7)
        .orderBy("event_type")
    }),

    // common-neighbor link prediction over the co-purchase graph:
    // non-adjacent part pairs ranked by shared neighbors — the
    // "related items you don't sell together YET" candidate set. Hub
    // apexes above deg 60 are excluded BEFORE the wedge join (the IDF
    // principle doubling as the skew bound; Graph.commonNeighbors
    // scaladoc); deterministic (cn DESC, id1, id2) top-k.
    "q_common_neighbors" -> ((s, dir) => {
      Graph.commonNeighbors(coPurchaseEdges(s, dir, minCount = 2).persist(),
        maxApexDegree = 60, minCommon = 2, topK = 40)
    }),

    // snapshot reconciliation via FULL OUTER join — the data-diff
    // report every migration/backfill ends with: per-customer order
    // count + exact cents from two halves of the order history,
    // full-outer joined and classified left_only / right_only /
    // changed. One co-keyed shuffle join of two partial aggregates;
    // the classification and delta are narrow integer arithmetic, and
    // the report collapses to |status| rows map-side.
    "q_full_outer_recon" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
      val cut = lit("1996-01-01").cast("timestamp")
      def snap(f: DataFrame): DataFrame = f.groupBy("o_custkey")
        .agg(count(lit(1)).as("n"),
          sum(floor(col("o_totalprice") * 100)).cast("long").as("cents"))
      val a = snap(ord.filter(col("o_orderdate") < cut))
        .select(col("o_custkey"), col("n").as("n_a"), col("cents").as("cents_a"))
      val b = snap(ord.filter(col("o_orderdate") >= cut))
        .select(col("o_custkey"), col("n").as("n_b"), col("cents").as("cents_b"))
      a.join(b, Seq("o_custkey"), "full_outer")
        .select(
          when(col("n_a").isNull, lit("right_only"))
            .when(col("n_b").isNull, lit("left_only"))
            .otherwise(lit("changed")).as("status"),
          coalesce(col("cents_b"), lit(0L)).minus(coalesce(col("cents_a"), lit(0L)))
            .as("delta_cents"))
        .groupBy("status")
        .agg(count(lit(1)).as("n_customers"),
          sum("delta_cents").as("total_delta_cents"))
        .orderBy("status")
    }),

    // URL parse + host rollup — the web-corpus ingestion primitive
    // (every crawl pipeline groups by registered host before
    // dedup/quality). URLs derive deterministically from document
    // columns so the DuckDB oracle reproduces them; the PARSING is the
    // operator: one regexp per component (host / first path segment /
    // query param), all codegen'd, narrow until the per-host count —
    // which map-side-combines to |hosts| rows.
    "q_url_parse" -> ((s, dir) => {
      val urls = t(s, dir, "documents")
        .select(concat(lit("https://"), col("source"), lit(".example.com/docs/"),
          col("lang"), lit("/"), col("doc_id"), lit("?ref=r"),
          pmod(col("n_chars"), lit(7))).as("url"))
      urls.select(
          regexp_extract(col("url"), "^https?://([^/?#]+)", 1).as("host"),
          regexp_extract(col("url"), "^https?://[^/?#]+/[^/?#]+/([^/?#]+)", 1).as("seg2"),
          regexp_extract(col("url"), "[?&]ref=([^&#]*)", 1).as("ref"))
        .groupBy("host")
        .agg(count(lit(1)).as("n_urls"),
          countDistinct(col("ref")).as("n_refs"),
          countDistinct(col("seg2")).as("n_langs"))
        .orderBy("host")
    }),

    // TPC-H Q17-shape: small-quantity outlier orders via a CORRELATED
    // scalar subquery (quantity < 0.2 × that part's own average) —
    // written as the subquery ON PURPOSE: Catalyst decorrelates it
    // into an aggregate + join (no per-row re-scan), the optimization
    // a naive engine gets catastrophically wrong. Revenue is exact
    // cents; the avg comparison is engine-stable because quantities
    // are integral doubles (Σ exact at any summation order).
    "q_tpch_q17ish" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("li_v")
      t(s, dir, "part").createOrReplaceTempView("part_v")
      s.sql("""SELECT count(*) AS n_rows,
              |       CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) DIV 7
              |         AS avg_weekly_cents
              |FROM li_v JOIN part_v ON p_partkey = l_partkey
              |WHERE p_partkey % 5 = 0
              |  AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM li_v l2
              |                    WHERE l2.l_partkey = p_partkey)""".stripMargin)
    }),

    // audience-overlap matrix: pairwise Jaccard between event-type
    // audiences (users with ≥ 15 events of the type). The per-user
    // self-join fans out at most |types|² per user — bounded — and
    // sizes/intersections stay exact longs until one final division.
    "q_audience_overlap" -> ((s, dir) => {
      val au = EventsStream.readEvents(s, s"$dir/events.parquet")
        .groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("n_ev"))
        .filter(col("n_ev") >= 15)
        .select("event_type", "user_id")
        .persist() // sizes + both intersection legs
      val sz = au.groupBy("event_type").agg(count(lit(1)).as("n"))
      au.select(col("event_type").as("t1"), col("user_id"))
        .join(au.select(col("event_type").as("t2"), col("user_id")), Seq("user_id"))
        .filter(col("t1") < col("t2"))
        .groupBy("t1", "t2").agg(count(lit(1)).as("n_both"))
        .join(broadcast(sz.select(col("event_type").as("t1"), col("n").as("n_a"))), Seq("t1"))
        .join(broadcast(sz.select(col("event_type").as("t2"), col("n").as("n_b"))), Seq("t2"))
        .select(col("t1"), col("t2"), col("n_a"), col("n_b"), col("n_both"),
          round(col("n_both").cast("double") /
            (col("n_a") + col("n_b") - col("n_both")).cast("double"), 6).as("jaccard"))
        .orderBy("t1", "t2")
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

    // product-quantization ADC top-k — the memory-compression half of
    // IVF-PQ: vectors stored as 4 one-byte codes (64× smaller than the
    // floats), queries score by summing 4 table lookups. Codebook =
    // designated data rows (vec_id < 16), like q_ivf_topk's centroids;
    // every stage is exact integer arithmetic under ONE global int8
    // scale (Similarity.pqTopK scaladoc), so the gate is hash-exact.
    "q_pq_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.pqTopK(spread(emb), emb.filter(col("vec_id") < 8),
          emb.filter(col("vec_id") < 16), k = 3, subspaces = 4)
        .orderBy("query_id", "rank")
    }),

    // negative sampling for recommender / contrastive training: per
    // customer, 5 popular parts they have NEVER bought, chosen by
    // deterministic hash order — the classic popularity-negative
    // sampler. The candidate pool is the top-50 popular parts
    // (broadcast), so the per-customer explode is bounded by the pool,
    // never |items|; interactions are removed by one anti-join on the
    // (customer, part) key; md5 ordering makes the draw reproducible
    // on any engine with no RNG state.
    "q_neg_sample" -> ((s, dir) => {
      val inter = t(s, dir, "orders").select("o_orderkey", "o_custkey")
        .join(t(s, dir, "lineitem").select("l_orderkey", "l_partkey"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
        .distinct()
      val pop = t(s, dir, "lineitem").groupBy(col("l_partkey").as("p"))
        .agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("p")).limit(50).select("p")
      val w = Window.partitionBy("c")
        .orderBy(md5(concat(col("c").cast("string"), lit("_"),
          col("p").cast("string"))), col("p"))
      t(s, dir, "customer").select(col("c_custkey").as("c"))
        .crossJoin(broadcast(pop)) // bounded: 50-part pool per customer
        .join(inter, Seq("c", "p"), "left_anti")
        .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
        .select(col("c").as("c_custkey"), col("rank"), col("p").as("p_partkey"))
        .orderBy("c_custkey", "rank")
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

    // TextRank keyword extraction: PageRank over the word co-occurrence
    // graph (adjacent-word pairs above a support threshold — the
    // sparsification that gives the graph degree structure), top-20
    // words by score. Composition of two already-oracled kernels:
    // Dedup.shingles bigrams → pair support → Graph.pageRank. The
    // co-occurrence aggregate map-side-combines to the vocab²-bounded
    // pair grid; the graph is vocab-sized, tiny next to the corpus.
    "q_textrank" -> ((s, dir) => {
      val pairs = spread(t(s, dir, "documents"))
        .select(explode(Dedup.shingles(col("text"), 2)).as("bg"))
        .select(split(col("bg"), " ").as("w"))
        .select(col("w").getItem(0).as("id1"), col("w").getItem(1).as("id2"))
        .filter(col("id1") < col("id2"))
        .groupBy("id1", "id2").agg(count(lit(1)).as("m"))
        .filter(col("m") >= 35)
        .select("id1", "id2")
      Graph.pageRank(Graph.symmetrize(pairs).persist(), iters = 3)
        .select(col("id").as("word"), col("pr").as("score"))
        .orderBy(desc("score"), asc("word")).limit(20)
    }),

    // Gopher-style quality rules (Rae et al. 2021 §A1.1 shape): word
    // count bounds, mean word length bounds, alphabetic-word fraction,
    // stopword presence — the published heuristic battery every LLM
    // corpus pass starts with. All four rules decide on INTEGER
    // cross-multiplied comparisons (sumlen ≤ 10·n, 5·nalpha ≥ 4·n), so
    // no float share ever reaches the gate; per-rule pass counts
    // map-side-combine from a single narrow scan.
    "q_gopher_rules" -> ((s, dir) => {
      val toks = Dedup.tokens(col("text"))
      val n = size(toks).cast("long")
      val sumlen = aggregate(transform(toks, w => length(w).cast("long")),
        lit(0L), _ + _)
      val nalpha = aggregate(transform(toks,
        w => w.rlike("[a-z]").cast("long")), lit(0L), _ + _)
      val nstop = Seq("the", "a", "of", "to", "and")
        .map(w => array_contains(toks, w).cast("int")).reduce(_ + _)
      spread(t(s, dir, "documents"))
        .select(explode(map(
          lit("alpha_words"), nalpha * 5 >= n * 4,
          lit("mean_word_len"), sumlen >= n * 3 && sumlen <= n * 10,
          lit("stopwords"), nstop >= 2,
          lit("word_count"), n.between(5, 10000))).as(Seq("rule", "pass")))
        .groupBy("rule")
        .agg(count(lit(1)).as("n_docs"), sum(col("pass").cast("long")).as("n_pass"))
        .orderBy("rule")
    }),

    // ext streaming: SLIDING-window aggregate run to completion — the
    // overlapping-window shape (every event lands in two 2h/1h-slide
    // windows; state = 2× windows-in-flight per type, watermark-
    // bounded). The oracle reproduces the overlap by exploding each
    // event into its two covering window starts.
    "q_stream_sliding" -> ((s, dir) => {
      EventsStream.runSlidingOnce(s, s"$dir/events.parquet")
        .select(date_format(col("w_start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
          col("event_type"), col("n_events"))
        .orderBy("w_start", "event_type")
    }),

    // stream-stream INTERVAL JOIN: clicks attributed to same-user views
    // within 4 h — watermarks on BOTH legs + the time-range condition
    // are what bound the join state (the unbounded-state cliff every
    // stream-stream join must design against; EventsStream scaladoc).
    // The oracle is the batch time-range self-join: bounded-input
    // streaming must converge to exactly the batch answer.
    "q_stream_interval_join" -> ((s, dir) => {
      EventsStream.runIntervalJoinOnce(s, s"$dir/events.parquet")
        .orderBy("click_id", "view_id")
    }),

    // CDC apply with TOMBSTONES: each event is an op on its user key
    // ('D' delete when event_id % 10 = 0, else upsert); the snapshot is
    // the last op per key in (ts, event_id) order with deleted keys
    // ABSENT — the delete-wins semantic q_merge_upsert's pure-upsert
    // merge can't express. One map-side-combined latestByKey pass (no
    // per-key sort); the tombstone filter runs on the keys-sized
    // result, never the log.
    "q_cdc_tombstone" -> ((s, dir) => {
      val ops = EventsStream.readEvents(s, s"$dir/events.parquet")
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
          col("value"),
          when(pmod(col("event_id"), lit(10)) === 0, lit("D"))
            .otherwise(lit("U")).as("op"))
      ScaleOps.latestByKey(ops, Seq("user_id"), Seq("ts", "event_id"))
        .filter(col("op") =!= "D")
        .select(col("user_id"), col("event_type"), col("value"))
        .orderBy("user_id")
    }),

    // rolling z-score anomaly detection with NO floats: a day is
    // anomalous when |x − mean₇| > 2·σ₇ over the trailing week —
    // decided by the cross-multiplied INTEGER identity
    // (7x − S)² > 4·(7Q − S²) over exact cent sums (S=Σx, Q=Σx²), so
    // the sqrt/σ never materializes and the verdict is engine-exact.
    // The window runs over the (nation, day) grid, not raw orders.
    // Overflow bound: S is the TRAILING-WEEK sum, so S² < 2⁶³ requires
    // S < 3·10⁹ cents per 7-day window — about 4·10⁸ cents/day·group
    // (the 7·Q and 4·(7Q − S²) intermediates bind at the same
    // magnitude). Past that, rescale the unit (whole dollars) — the
    // inequality is scale-invariant up to quantization.
    "q_rolling_anomaly" -> ((s, dir) => {
      val daily = t(s, dir, "orders")
        .join(t(s, dir, "customer").select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation").select("n_nationkey", "n_name")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), to_date(col("o_orderdate")).as("day"))
        .agg(sum(floor(col("o_totalprice") * 100)).cast("long").as("cents"))
      val win = Window.partitionBy("n_name").orderBy("day").rowsBetween(-6, 0)
      val dev = lit(7) * col("cents") - col("s")
      daily.withColumn("n", count(lit(1)).over(win))
        .withColumn("s", sum("cents").over(win))
        .withColumn("q", sum(col("cents") * col("cents")).over(win))
        .withColumn("anom", col("n") === 7 &&
          dev * dev > lit(4) * (lit(7) * col("q") - col("s") * col("s")))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_days"),
          sum(col("anom").cast("long")).as("n_anomalies"))
        .orderBy("n_name")
    }),

    // sequence-contiguity audit: are each order's line numbers the
    // contiguous run 1..n? One map-side-combined (count, min, max) per
    // key, then a scalar rollup — the cheapest possible shape for a
    // completeness check over an append log (no window, no sort).
    "q_seq_gaps" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("n"), min("l_linenumber").as("mn"),
          max("l_linenumber").as("mx"))
        .agg(count(lit(1)).as("n_orders"),
          sum((col("mn") =!= 1 || col("mx") =!= col("n")).cast("long")).as("n_gappy"),
          sum((col("mx") - col("n")).cast("long")).as("n_missing"))
    })
  )

  /** DuckDB oracle SQL per query (same tables, same column names,
    * same rounding, same total order).
    *
    * HARD-WON RULE — cast every integer aggregate in an OUTPUT column
    * to BIGINT: DuckDB's `sum` over integers returns HUGEINT (int128),
    * which surfaces as decimal128(38,0) on the gate's arrow/pandas
    * path and renders `123.0` against Spark's integer `123` — a
    * hash-mismatch with rows_match and schema_match both true (the
    * exact signature of the 7 persistent round-4/5 reds plus
    * q_variant_extract). Intermediate CTE hugeints are harmless; only
    * the final SELECT's column types reach the hash. A decimal output
    * compared against a Spark DOUBLE column is fine (q_flagship_agg,
    * q_linkage) — the gate normalizes decimal to float.
    */
  def oracleSql: Map[String, String] = {
    val eventsHourlySql =
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |       event_type, count(*) AS n_events, round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

    // shared by the batch twin and the real stream-stream join run
    val funnelSql =
      """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
        |       round(epoch(p.ts) - epoch(c.ts), 6) AS secs_to_convert
        |FROM events c JOIN events p ON c.user_id = p.user_id
        |WHERE c.event_type = 'click' AND p.event_type = 'purchase'
        |  AND epoch(p.ts) - epoch(c.ts) BETWEEN 0 AND 600
        |ORDER BY click_id, purchase_id""".stripMargin

    val punct = "[!-/:-@\\[-`{-~]"
    val allStopwords = TextStats.stopwords.values.flatten.toSeq.distinct

    // BM25 term-weight CTEs shared by the lexical ranker and the
    // hybrid RRF fusion (terms: spark, table, fast; k1=1.2, b=0.75)
    val sqlBm25Cte =
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($sqlTokens) AS term FROM documents),
         |lens AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
         |corpus AS (
         |  SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS total_len FROM lens),
         |tf AS (
         |  SELECT doc_id, term, count(*) AS tf FROM toks
         |  WHERE term IN ('spark', 'table', 'fast') GROUP BY 1, 2),
         |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |w AS (
         |  SELECT tf.doc_id,
         |         ln(CAST(1.0 AS DOUBLE) + (n_docs - df + CAST(0.5 AS DOUBLE)) / (df + CAST(0.5 AS DOUBLE)))
         |           * (tf * CAST(2.2 AS DOUBLE))
         |           / (tf + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE)
         |              + CAST(0.75 AS DOUBLE) * (dl / (CAST(total_len AS DOUBLE) / n_docs)))) AS weight
         |  FROM tf JOIN df USING (term) JOIN lens USING (doc_id), corpus)""".stripMargin

    // shared by the declarative chunker and the native Generator form
    val docChunksSql =
      s"""WITH toks AS (
         |  SELECT doc_id, $sqlTokens AS l FROM documents),
         |ch AS (
         |  SELECT doc_id,
         |         unnest([{'s': i, 'c': array_to_string(l[i:i+31], ' '),
         |                  'n': len(l[i:i+31])} for i in range(1, len(l)+1, 24)]) AS u
         |  FROM toks WHERE len(l) > 0)
         |SELECT doc_id, CAST((u.s - 1) / 24 AS BIGINT) AS chunk_ix,
         |       CAST(u.s AS BIGINT) AS start_token,
         |       CAST(u.n AS BIGINT) AS n_chunk_tokens, u.c AS chunk_text
         |FROM ch ORDER BY doc_id, chunk_ix""".stripMargin

    // shared by the naive inverted-index Jaccard and its prefix-
    // filtered twin (identical output by the prefix lemma)
    val jaccardPairsSql =
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS l
        |  FROM documents WHERE doc_id < 100),
        |sh AS (
        |  SELECT DISTINCT id, shingle FROM (
        |    SELECT doc_id AS id, unnest([array_to_string(l[i:i+2], ' ') for i in range(1, len(l) - 1)]) AS shingle
        |    FROM toks)),
        |sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id),
        |inter AS (
        |  SELECT a.id AS id1, b.id AS id2, count(*) AS n_inter
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id GROUP BY 1, 2)
        |SELECT id1, id2,
        |       round(CAST(n_inter AS DOUBLE) / (s1.n_sh + s2.n_sh - n_inter), 6) AS jaccard
        |FROM inter JOIN sizes s1 ON s1.id = id1 JOIN sizes s2 ON s2.id = id2
        |WHERE CAST(n_inter AS DOUBLE) / (s1.n_sh + s2.n_sh - n_inter) >= 0.03
        |ORDER BY id1, id2""".stripMargin

    // quality features + score, shared by q_text_quality and the
    // composite q_corpus_pipeline (DuckDB mirror of TextStats.withQuality
    // — tokenize once into `l`, count stopword hits by list membership)
    val sqlQualityFeatureCte =
      s"""qtok AS (
         |  SELECT doc_id, text, $sqlTokens AS l FROM documents),
         |f AS (
         |  SELECT doc_id, text,
         |         CAST(length(text) AS INTEGER) AS n_chars,
         |         CAST(len(l) AS INTEGER) AS n_tok,
         |         CAST(len(regexp_extract_all(text, '$punct')) AS INTEGER) AS n_punct,
         |         (${sqlVotesOver(allStopwords)}) AS stop_hits
         |  FROM qtok)""".stripMargin
    val sqlQualityScore =
      """round(CAST(CASE WHEN n_tok >= 5 THEN 0.4 ELSE 0.0 END
        |           + CASE WHEN (CASE WHEN n_chars = 0 THEN 0.0 ELSE CAST(n_punct AS DOUBLE) / n_chars END) <= 0.2 THEN 0.3 ELSE 0.0 END
        |           + CASE WHEN (CASE WHEN n_tok = 0 THEN 0.0 ELSE CAST(n_chars - n_tok + 1 AS DOUBLE) / n_tok END) BETWEEN 2.0 AND 12.0 THEN 0.3 ELSE 0.0 END
        |         AS DOUBLE), 2)""".stripMargin

    Map(
      "q_scan_prune" ->
        """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
          |FROM lineitem WHERE l_quantity > 45 ORDER BY l_orderkey, l_linenumber""".stripMargin,

      "q_fixedwidth_parse" ->
        """SELECT doc_id, trim(substring(text, 1, 12)) AS f1, trim(substring(text, 13, 12)) AS f2,
          |       TRY_CAST(trim(substring(text, 25, 8)) AS BIGINT) AS num
          |FROM documents ORDER BY doc_id""".stripMargin,

      "q_flagship_agg" ->
        """WITH rec AS (
          |  SELECT CAST(year(o_orderdate) AS INTEGER) AS year,
          |         CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
          |         substring(o_orderpriority, 1, 4) AS naics4,
          |         (floor(o_totalprice) + floor(o_totalprice) + floor(o_totalprice)) / 3.0 AS te,
          |         CAST(floor(o_totalprice) AS BIGINT) AS tw
          |  FROM orders WHERE substring(o_orderpriority, 1, 4) <> '')
          |SELECT year, qtr, naics4, CAST(sum(tw) AS BIGINT) AS total_wages,
          |       round(avg(te), 4) AS total_employment, count(*) AS dummy,
          |       round(sum(tw) * 0.014, 4) AS fondo_contributions,
          |       round(sum(tw) * 0.0145, 4) AS medicare_contributions,
          |       round(sum(tw) * 0.062, 4) AS ssn_contributions
          |FROM rec GROUP BY 1, 2, 3 HAVING count(*) > 4 ORDER BY year, qtr, naics4""".stripMargin,

      "q_dim_join" ->
        """SELECT r_name, n_name, count(*) AS n_cust, round(sum(c_acctbal), 2) AS acctbal_sum
          |FROM customer JOIN nation ON c_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

      "q_anti_join" ->
        """SELECT c_custkey, c_name, c_mktsegment FROM customer
          |WHERE NOT EXISTS (SELECT 1 FROM orders
          |                  WHERE o_custkey = c_custkey AND o_totalprice > 250000)
          |ORDER BY c_custkey""".stripMargin,

      "q_semi_join" ->
        """SELECT p_brand, count(*) AS n_parts FROM part
          |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
          |GROUP BY 1 ORDER BY 1""".stripMargin,

      "q_window_diff" ->
        """WITH rev AS (
          |  SELECT l_returnflag, strftime(l_shipdate, '%Y-%m') AS ym,
          |         round(sum(l_extendedprice * (1 - l_discount)), 2) AS rev
          |  FROM lineitem GROUP BY 1, 2)
          |SELECT l_returnflag, ym, rev,
          |       round(rev - lag(rev) OVER w, 2) AS rev_diff,
          |       round((rev - lag(rev) OVER w) / lag(rev) OVER w, 6) AS rev_diff_p
          |FROM rev WINDOW w AS (PARTITION BY l_returnflag ORDER BY ym)
          |ORDER BY l_returnflag, ym""".stripMargin,

      "q_moving_avg" ->
        """WITH rev AS (
          |  SELECT l_returnflag, strftime(l_shipdate, '%Y-%m') AS ym,
          |         CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)) AS BIGINT)) AS BIGINT) AS rev
          |  FROM lineitem GROUP BY 1, 2)
          |SELECT l_returnflag, ym, rev,
          |       round(avg(rev) OVER (PARTITION BY l_returnflag ORDER BY ym
          |                            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS rev_ma3
          |FROM rev ORDER BY l_returnflag, ym""".stripMargin,

      "q_topk_window" ->
        """SELECT o_orderpriority,
          |       CAST(row_number() OVER (PARTITION BY o_orderpriority
          |                               ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rnk,
          |       o_orderkey, o_totalprice
          |FROM orders QUALIFY rnk <= 3 ORDER BY o_orderpriority, rnk""".stripMargin,

      "q_unpivot" ->
        """SELECT l_orderkey, l_linenumber, CAST(0 AS INTEGER) AS k, l_quantity AS v FROM lineitem
          |UNION ALL SELECT l_orderkey, l_linenumber, CAST(1 AS INTEGER), l_discount FROM lineitem
          |UNION ALL SELECT l_orderkey, l_linenumber, CAST(2 AS INTEGER), l_tax FROM lineitem
          |ORDER BY l_orderkey, l_linenumber, k""".stripMargin,

      "q_mode" ->
        """SELECT l_returnflag AS mode_val FROM lineitem
          |GROUP BY 1 ORDER BY count(*) DESC, l_returnflag LIMIT 1""".stripMargin,

      "q_distinct_picklist" ->
        """SELECT DISTINCT '(N' || p_brand || ') ' || p_type AS label
          |FROM part ORDER BY label""".stripMargin,

      "q_time_period" ->
        """SELECT CAST(year(o_orderdate) AS VARCHAR) || '-q' || CAST(quarter(o_orderdate) AS VARCHAR) AS time_period,
          |       count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_amt
          |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

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

      "q_rollup" ->
        """WITH o AS (
          |  SELECT CAST(year(o_orderdate) AS INTEGER) AS year,
          |         CAST(quarter(o_orderdate) AS INTEGER) AS qtr, o_totalprice
          |  FROM orders)
          |SELECT year, qtr, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_amt
          |FROM o GROUP BY ROLLUP (year, qtr)
          |ORDER BY year ASC NULLS FIRST, qtr ASC NULLS FIRST""".stripMargin,

      "q_cube" ->
        """WITH o AS (
          |  SELECT CAST(year(o_orderdate) AS INTEGER) AS year,
          |         CAST(quarter(o_orderdate) AS INTEGER) AS qtr, o_totalprice
          |  FROM orders)
          |SELECT year, qtr, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_amt
          |FROM o GROUP BY CUBE (year, qtr)
          |ORDER BY year ASC NULLS FIRST, qtr ASC NULLS FIRST""".stripMargin,

      "q_grouping_sets" ->
        """WITH o AS (
          |  SELECT CAST(year(o_orderdate) AS INTEGER) AS year,
          |         CAST(quarter(o_orderdate) AS INTEGER) AS qtr, o_totalprice
          |  FROM orders)
          |SELECT year, qtr,
          |       CAST(GROUPING(year) AS INTEGER) AS g_year,
          |       CAST(GROUPING(qtr) AS INTEGER) AS g_qtr,
          |       count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_amt
          |FROM o GROUP BY GROUPING SETS ((year), (qtr), ())
          |ORDER BY year ASC NULLS FIRST, qtr ASC NULLS FIRST""".stripMargin,

      "q_pivot" ->
        """SELECT l_returnflag,
          |       round(sum(CASE WHEN l_linestatus = 'F' THEN l_extendedprice END), 2) AS F,
          |       round(sum(CASE WHEN l_linestatus = 'O' THEN l_extendedprice END), 2) AS O
          |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

      "q_union" ->
        """SELECT c_name AS name, 'customer' AS src FROM customer
          |UNION ALL SELECT s_name, 'supplier' FROM supplier
          |ORDER BY src, name""".stripMargin,

      "q_listagg" ->
        """SELECT r_name,
          |       string_agg(n_name, ',' ORDER BY n_name) AS nations,
          |       count(*) AS n_nations
          |FROM nation JOIN region ON n_regionkey = r_regionkey
          |GROUP BY 1 ORDER BY 1""".stripMargin,

      "q_setops" ->
        """WITH big AS (
          |  SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 250000)
          |SELECT 'has_big_order' AS op, c_custkey FROM
          |  (SELECT c_custkey FROM customer INTERSECT SELECT c_custkey FROM big)
          |UNION ALL
          |SELECT 'no_big_order', c_custkey FROM
          |  (SELECT c_custkey FROM customer EXCEPT SELECT c_custkey FROM big)
          |ORDER BY op, c_custkey""".stripMargin,

      "q_snapshot_diff" ->
        """WITH a AS (
          |  SELECT user_id, event_type, event_id FROM (
          |    SELECT user_id, event_type, event_id,
          |           row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
          |    FROM events WHERE ts < TIMESTAMP '2024-01-11') WHERE rn = 1),
          |b AS (
          |  SELECT user_id, event_type, event_id FROM (
          |    SELECT user_id, event_type, event_id,
          |           row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
          |    FROM events) WHERE rn = 1)
          |SELECT CASE WHEN a.event_id IS NULL THEN 'added'
          |            WHEN b.event_id IS NULL THEN 'removed'
          |            WHEN a.event_id <> b.event_id THEN 'changed'
          |            ELSE 'unchanged' END AS status,
          |       count(*) AS n
          |FROM a FULL JOIN b ON a.user_id = b.user_id AND a.event_type = b.event_type
          |GROUP BY 1 ORDER BY 1""".stripMargin,

      "q_data_quality" ->
        """SELECT 'customer_null_acctbal' AS check_name,
          |       CAST(sum(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_bad,
          |       count(*) AS n_total FROM customer
          |UNION ALL
          |SELECT 'lineitem_nonpositive_price',
          |       CAST(sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS BIGINT),
          |       count(*) FROM lineitem
          |UNION ALL
          |SELECT 'lineitem_orphan_orderkey',
          |       CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
          |       count(*)
          |FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
          |  ON l.l_orderkey = o.o_orderkey
          |UNION ALL
          |SELECT 'lineitem_quantity_out_of_range',
          |       CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT),
          |       count(*) FROM lineitem
          |UNION ALL
          |SELECT 'orders_duplicate_orderkey',
          |       CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT),
          |       count(*)
          |FROM (SELECT o_orderkey, count(*) AS cnt FROM orders GROUP BY 1)
          |ORDER BY check_name""".stripMargin,

      "q_range_frame" ->
        """WITH daily AS (
          |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d, count(*) AS n
          |  FROM events GROUP BY 1, 2)
          |SELECT event_type, d, n,
          |       CAST(sum(n) OVER (PARTITION BY event_type ORDER BY d
          |            RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW) AS BIGINT) AS n_7d
          |FROM daily ORDER BY event_type, d""".stripMargin,

      "q_recursive_cte" ->
        """WITH RECURSIVE ranked AS (
          |  SELECT o_custkey, o_orderkey, o_totalprice,
          |         CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INTEGER) AS rn
          |  FROM orders WHERE o_custkey % 50 = 0),
          |walk(o_custkey, o_orderkey, rn, acc) AS (
          |  SELECT o_custkey, o_orderkey, rn, o_totalprice FROM ranked WHERE rn = 1
          |  UNION ALL
          |  SELECT r.o_custkey, r.o_orderkey, r.rn,
          |         CASE WHEN w.acc + r.o_totalprice > 300000 THEN r.o_totalprice
          |              ELSE w.acc + r.o_totalprice END
          |  FROM walk w JOIN ranked r ON r.o_custkey = w.o_custkey AND r.rn = w.rn + 1)
          |SELECT o_custkey, o_orderkey, rn, round(acc, 2) AS acc
          |FROM walk ORDER BY o_custkey, rn""".stripMargin,

      "q_scalar_subquery" ->
        """SELECT o_orderkey, o_totalprice FROM orders
          |WHERE o_totalprice >= CAST(0.9 AS DOUBLE) * (SELECT max(o_totalprice) FROM orders)
          |ORDER BY o_orderkey""".stripMargin,

      "q_date_math" ->
        """SELECT o_orderkey,
          |       strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
          |       CAST(date_diff('day', o_orderdate, DATE '1998-12-31') AS INTEGER) AS days_to_eoy,
          |       strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
          |       CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow
          |FROM orders ORDER BY o_orderkey""".stripMargin,

      "q_filter_nulls" ->
        """SELECT c_mktsegment, count(*) AS n, round(avg(c_acctbal), 4) AS avg_bal
          |FROM customer
          |WHERE c_acctbal IS NOT NULL AND c_mktsegment <> 'BUILDING'
          |  AND trim(CAST(c_name AS VARCHAR)) <> ''
          |GROUP BY 1 ORDER BY 1""".stripMargin,

      "q_events_hourly" -> eventsHourlySql,
      "q_events_stream" -> eventsHourlySql,

      "q_stream_enrich" ->
        """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
          |       upper(event_type) AS label,
          |       CAST(length(event_type) AS INTEGER) AS type_weight,
          |       count(*) AS n_events,
          |       CAST(sum(user_id % 100) AS BIGINT) AS user_checksum
          |FROM events GROUP BY 1, 2, 3 ORDER BY 1, 2""".stripMargin,

      "q_props_extract" ->
        """WITH j AS (
          |  SELECT event_type, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
          |  FROM events)
          |SELECT event_type, count(*) AS n_events,
          |       CAST(sum(k) AS BIGINT) AS k_sum,
          |       round(avg(k), 4) AS k_avg,
          |       count(k) AS n_with_k
          |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

      "q_gapfill" ->
        """WITH daily AS (
          |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d, count(*) AS n
          |  FROM events WHERE user_id % 97 = 0 GROUP BY 1, 2),
          |stepped AS (
          |  SELECT *, lead(d) OVER (PARTITION BY event_type ORDER BY d) AS next_d FROM daily)
          |SELECT event_type, CAST(g AS DATE) AS d, n, CAST(g AS DATE) <> d AS is_filled
          |FROM stepped,
          |     unnest(generate_series(CAST(d AS TIMESTAMP),
          |                            CAST(coalesce(next_d - 1, d) AS TIMESTAMP),
          |                            INTERVAL 1 DAY)) AS t(g)
          |ORDER BY 1, 2""".stripMargin,

      "q_interpolate" ->
        """WITH daily AS (
          |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d, count(*) AS n
          |  FROM events WHERE user_id % 97 = 0 GROUP BY 1, 2),
          |stepped AS (
          |  SELECT event_type, d, n,
          |         lead(d) OVER w AS next_d, lead(n) OVER w AS next_n
          |  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY d))
          |SELECT event_type, CAST(g AS DATE) AS d,
          |       CASE WHEN next_d IS NULL THEN CAST(n AS DOUBLE)
          |            ELSE CAST(n AS DOUBLE) + (CAST(next_n AS DOUBLE) - CAST(n AS DOUBLE))
          |                 * (CAST(CAST(g AS DATE) - d AS DOUBLE) / CAST(next_d - d AS DOUBLE)) END AS n,
          |       CAST(g AS DATE) <> d AS is_filled
          |FROM stepped,
          |     unnest(generate_series(CAST(d AS TIMESTAMP),
          |                            CAST(coalesce(next_d - 1, d) AS TIMESTAMP),
          |                            INTERVAL 1 DAY)) AS t(g)
          |ORDER BY 1, 2""".stripMargin,

      "q_bitmap_distinct" ->
        """SELECT event_type, count(DISTINCT user_id) AS n_users
          |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

      // same latest-by-key recompute as the batch query — proving the
      // stream-maintained snapshot equals the full-history answer
      "q_stream_upsert" ->
        """WITH ranked AS (
          |  SELECT user_id, event_id, event_type, ts, value,
          |         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          |  FROM events)
          |SELECT user_id, event_id, event_type,
          |       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_s, value
          |FROM ranked WHERE rn = 1 ORDER BY user_id""".stripMargin,

      "q_latest_by_key" ->
        """WITH ranked AS (
          |  SELECT user_id, event_id, event_type, ts, value,
          |         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          |  FROM events)
          |SELECT user_id, event_id, event_type,
          |       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_s, value
          |FROM ranked WHERE rn = 1 ORDER BY user_id""".stripMargin,

      "q_scd2" ->
        """WITH c AS (
          |  SELECT user_id, ts, event_type,
          |         CASE WHEN event_type IS NOT DISTINCT FROM
          |                   lag(event_type) OVER (PARTITION BY user_id ORDER BY ts)
          |              THEN 0 ELSE 1 END AS chg
          |  FROM events),
          |v AS (
          |  SELECT user_id, ts, event_type,
          |         CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts) AS INT) AS version
          |  FROM c),
          |r AS (
          |  SELECT user_id, version, min(event_type) AS event_type,
          |         min(ts) AS vf, count(*) AS n_rows
          |  FROM v GROUP BY 1, 2)
          |SELECT user_id, version, event_type,
          |       strftime(vf, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
          |       strftime(lead(vf) OVER (PARTITION BY user_id ORDER BY version),
          |                '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
          |       n_rows
          |FROM r ORDER BY user_id, version""".stripMargin,

      "q_merge_upsert" ->
        """WITH t AS (
          |  SELECT user_id, event_type, value FROM (
          |    SELECT user_id, event_type, value,
          |           row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          |    FROM events
          |    WHERE ts < TIMESTAMP '2024-01-20' AND user_id % 10 <> 0)
          |  WHERE rn = 1),
          |u AS (
          |  SELECT user_id, event_type, value FROM (
          |    SELECT user_id, event_type, value,
          |           row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          |    FROM events
          |    WHERE ts >= TIMESTAMP '2024-01-20' AND user_id % 3 = 0)
          |  WHERE rn = 1)
          |SELECT COALESCE(t.user_id, u.user_id) AS user_id,
          |       CASE WHEN u.user_id IS NOT NULL THEN u.event_type ELSE t.event_type END AS event_type,
          |       CASE WHEN u.user_id IS NOT NULL THEN u.value ELSE t.value END AS value,
          |       CASE WHEN t.user_id IS NULL THEN 'inserted'
          |            WHEN u.user_id IS NULL THEN 'kept'
          |            ELSE 'updated' END AS action
          |FROM t FULL JOIN u ON t.user_id = u.user_id
          |ORDER BY user_id""".stripMargin,

      "q_cohort_retention" ->
        """WITH f AS (
          |  SELECT user_id, date_trunc('week', min(ts)) AS cw
          |  FROM events GROUP BY 1),
          |j AS (
          |  SELECT e.user_id, f.cw, date_trunc('week', e.ts) AS ew
          |  FROM events e JOIN f ON e.user_id = f.user_id)
          |SELECT strftime(cw, '%Y-%m-%d') AS cohort_week,
          |       CAST(date_diff('day', cw, ew) // 7 AS INT) AS week_offset,
          |       count(DISTINCT user_id) AS active_users
          |FROM j GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin,

      "q_media_dedup" ->
        """WITH m AS (
          |  SELECT doc_id AS media_id,
          |         md5(substring(text, 1, 64)) AS chunk_md5,
          |         md5(text) AS full_md5
          |  FROM documents)
          |SELECT chunk_md5, min(media_id) AS keep_id, count(*) AS n_copies,
          |       count(DISTINCT full_md5) AS n_distinct_full
          |FROM m GROUP BY 1 HAVING count(*) > 1
          |ORDER BY keep_id""".stripMargin,

      "q_cohort_ltv" ->
        """WITH ev AS (
          |  SELECT user_id, ts, CAST(floor(value * 100) AS BIGINT) AS cents
          |  FROM events),
          |f AS (
          |  SELECT user_id, date_trunc('week', min(ts)) AS cw
          |  FROM ev GROUP BY 1),
          |sz AS (SELECT cw, count(DISTINCT user_id) AS cohort_users FROM f GROUP BY 1),
          |grid AS (
          |  SELECT f.cw,
          |         CAST(date_diff('day', f.cw, date_trunc('week', e.ts)) // 7 AS INT) AS week_offset,
          |         CAST(sum(e.cents) AS BIGINT) AS rev_cents
          |  FROM ev e JOIN f ON e.user_id = f.user_id
          |  GROUP BY 1, 2),
          |cum AS (
          |  SELECT cw, week_offset, rev_cents,
          |         CAST(sum(rev_cents) OVER (PARTITION BY cw ORDER BY week_offset) AS BIGINT)
          |           AS cum_rev_cents
          |  FROM grid)
          |SELECT strftime(c.cw, '%Y-%m-%d') AS cohort_week, c.week_offset,
          |       c.rev_cents, c.cum_rev_cents,
          |       c.cum_rev_cents // s.cohort_users AS ltv_cents_per_user
          |FROM cum c JOIN sz s ON c.cw = s.cw
          |ORDER BY cohort_week, week_offset""".stripMargin,

      "q_pii_redact" ->
        """WITH raw AS (
          |  SELECT event_id,
          |         event_type || ': contact u' || CAST(user_id AS VARCHAR) ||
          |         '@example.com or +1 (555) 010-' || lpad(CAST(event_id % 10000 AS VARCHAR), 4, '0') ||
          |         ' from 10.0.' || CAST(user_id % 256 AS VARCHAR) || '.' || CAST(event_id % 256 AS VARCHAR) AS text
          |  FROM events WHERE event_id % 211 = 0)
          |SELECT event_id,
          |       regexp_replace(
          |         regexp_replace(
          |           regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
          |           '([0-9]{1,3}\.){3}[0-9]{1,3}', '<IP>', 'g'),
          |         '\+?[0-9][0-9().\-\s]{6,}[0-9]', '<PHONE>', 'g') AS redacted
          |FROM raw ORDER BY event_id""".stripMargin,

      // mirrors Dedup.fuzzyPairs' oversize-block refinement: blocks
      // past 128 rows sub-block on the text's md5 nibble (below the
      // cap the sub-key is '' and the join is the plain blocked form)
      "q_fuzzy_pairs" ->
        """WITH bs AS (
          |  SELECT p_brand, p_size, count(*) AS bn FROM part GROUP BY 1, 2),
          |pp AS (
          |  SELECT p.*, CASE WHEN bs.bn > 128 THEN substring(md5(p_name), 1, 1)
          |                   ELSE '' END AS sub
          |  FROM part p JOIN bs USING (p_brand, p_size))
          |SELECT a.p_brand, a.p_size, a.p_partkey AS id_a, b.p_partkey AS id_b,
          |       CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
          |FROM pp a JOIN pp b
          |  ON a.p_brand = b.p_brand AND a.p_size = b.p_size AND a.sub = b.sub
          |     AND a.p_partkey < b.p_partkey
          |WHERE levenshtein(a.p_name, b.p_name) <= 8
          |ORDER BY 1, 2, 3, 4""".stripMargin,

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

      "q_zorder" -> {
        val zexpr = (0 until 8).map(i =>
          s"((((l_orderkey % 256) >> $i) & 1) << ${2 * i}) + ((((l_partkey % 256) >> $i) & 1) << ${2 * i + 1})")
          .mkString(" + ")
        s"""WITH z AS (
           |  SELECT CAST($zexpr AS BIGINT) AS zkey,
           |         l_orderkey % 256 AS x, l_partkey % 256 AS y
           |  FROM lineitem)
           |SELECT zkey >> 8 AS chunk, count(*) AS n,
           |       CAST(min(x) AS BIGINT) AS x_min, CAST(max(x) AS BIGINT) AS x_max,
           |       CAST(min(y) AS BIGINT) AS y_min, CAST(max(y) AS BIGINT) AS y_max
           |FROM z GROUP BY 1 ORDER BY 1""".stripMargin
      },

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

      // streaming HLL: identical register/estimate math as
      // q_hll_distinct (the stream maintains the same integer state)
      "q_stream_hll" ->
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
          |  FROM e)
          |SELECT event_type, v_empty, s_scaled,
          |       CASE WHEN v_empty > 0 AND raw <= 2.5 * 256.0 THEN 'lc' ELSE 'raw' END AS band,
          |       round(CASE WHEN v_empty > 0 AND raw <= 2.5 * 256.0
          |             THEN 256.0 * ln(256.0 / CAST(v_empty AS DOUBLE)) ELSE raw END, 4) AS est
          |FROM est ORDER BY 1""".stripMargin,

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

      "q_naics_external_join" ->
        """WITH agg AS (
          |  SELECT substring(o_orderpriority, 1, 4) AS unique_naics_code,
          |         count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_amt
          |  FROM orders GROUP BY 1),
          |hactable AS (
          |  SELECT DISTINCT substring(o_orderpriority, 1, 4) AS unique_naics_code,
          |         'NAICS ' || substring(o_orderpriority, 1, 4) AS naics_label
          |  FROM orders)
          |SELECT agg.unique_naics_code, n_orders, total_amt, naics_label
          |FROM agg LEFT JOIN hactable USING (unique_naics_code)
          |ORDER BY unique_naics_code""".stripMargin,

      "q_asof_join" ->
        """WITH d AS (
          |  SELECT user_id, date_trunc('day', ts) AS day, round(sum(value), 2) AS day_total
          |  FROM events GROUP BY 1, 2 HAVING day(date_trunc('day', ts)) % 3 = 0)
          |SELECT e.event_id, e.user_id,
          |       strftime(d.day, '%Y-%m-%d') AS asof_day, d.day_total
          |FROM events e ASOF LEFT JOIN d
          |  ON e.user_id = d.user_id AND e.ts >= d.day
          |ORDER BY event_id""".stripMargin,

      // the tolerance gate nulls the ASOF match when it is staler than
      // the bound — the latest match is the only one that could qualify
      "q_asof_tolerance" ->
        """WITH d AS (
          |  SELECT user_id, date_trunc('day', ts) AS day, round(sum(value), 2) AS day_total
          |  FROM events GROUP BY 1, 2 HAVING day(date_trunc('day', ts)) % 3 = 0)
          |SELECT e.event_id, e.user_id,
          |       CASE WHEN epoch(e.ts) - epoch(d.day) <= 172800
          |            THEN strftime(d.day, '%Y-%m-%d') END AS asof_day,
          |       CASE WHEN epoch(e.ts) - epoch(d.day) <= 172800
          |            THEN d.day_total END AS day_total
          |FROM events e ASOF LEFT JOIN d
          |  ON e.user_id = d.user_id AND e.ts >= d.day
          |ORDER BY event_id""".stripMargin,

      "q_salted_join" ->
        """WITH dim AS (
          |  SELECT DISTINCT l_returnflag, 'F_' || l_returnflag AS flag_label FROM lineitem)
          |SELECT flag_label, count(*) AS n, sum(l_quantity) AS sum_qty
          |FROM lineitem JOIN dim USING (l_returnflag)
          |GROUP BY flag_label ORDER BY flag_label""".stripMargin,

      "q_sessionize" ->
        s"""WITH $sqlSessionCtes
           |SELECT user_id, sess_id,
           |       strftime(session_start, '%Y-%m-%d %H:%M:%S') AS session_start,
           |       strftime(session_end, '%Y-%m-%d %H:%M:%S') AS session_end,
           |       n_events
           |FROM sess ORDER BY user_id, sess_id""".stripMargin,

      "q_session_window" ->
        s"""WITH $sqlSessionCtes
           |SELECT user_id, sess_id,
           |       strftime(session_start, '%Y-%m-%d %H:%M:%S') AS session_start,
           |       strftime(session_end, '%Y-%m-%d %H:%M:%S') AS session_end,
           |       n_events
           |FROM sess ORDER BY user_id, sess_id""".stripMargin,

      // the batch sessions FILTERED by the append-mode watermark
      // contract: a session is emitted iff its close (last event +
      // 5-min gap) precedes the final watermark (max event time in ms
      // − 10-min delay). Withheld sessions are each user's suffix, so
      // the retained sess_id numbering is unchanged.
      "q_session_window_stream" ->
        s"""WITH $sqlSessionCtes,
           |wm AS (
           |  SELECT CAST(floor(epoch(max(ts)) * 1000) AS BIGINT) - 600000 AS wm_ms
           |  FROM events)
           |SELECT user_id, sess_id,
           |       strftime(session_start, '%Y-%m-%d %H:%M:%S') AS session_start,
           |       strftime(session_end, '%Y-%m-%d %H:%M:%S') AS session_end,
           |       n_events
           |FROM sess, wm
           |WHERE epoch(session_end) * 1000 + 300000 <= wm_ms
           |ORDER BY user_id, sess_id""".stripMargin,

      // The oracle is the semantic definition (inequality BETWEEN
      // join); the Spark side is the binned equi-join rewrite.
      "q_range_join" ->
        s"""WITH $sqlSessionCtes
           |SELECT ev.event_id, ev.user_id, sess.sess_id
           |FROM events ev JOIN sess
           |  ON ev.user_id = sess.user_id
           | AND ev.ts BETWEEN sess.session_start AND sess.session_end
           |ORDER BY event_id""".stripMargin,

      // the oracle counts by the ENUMERATED pair self-join — an
      // independent algorithm from the engine's sweep, so the hash gate
      // cross-checks the combinatorial identity itself
      "q_interval_overlap" ->
        """WITH iv0 AS (
          |  SELECT DISTINCT l_suppkey AS k, CAST(l_shipdate AS DATE) AS s,
          |         CAST(l_quantity AS INTEGER) % 30 + 1 AS dur
          |  FROM lineitem),
          |iv AS (
          |  SELECT k, CAST(s - DATE '1970-01-01' AS BIGINT) * 31 + dur - 1 AS rid,
          |         s, s + dur AS e
          |  FROM iv0),
          |n AS (SELECT k, CAST(count(*) AS BIGINT) AS n_intervals FROM iv GROUP BY 1),
          |p AS (SELECT a.k, CAST(count(*) AS BIGINT) AS n_overlap_pairs
          |      FROM iv a JOIN iv b ON a.k = b.k AND a.rid < b.rid
          |                         AND a.s <= b.e AND b.s <= a.e
          |      GROUP BY 1)
          |SELECT n.k AS suppkey, n.n_intervals,
          |       COALESCE(p.n_overlap_pairs, 0) AS n_overlap_pairs
          |FROM n LEFT JOIN p ON n.k = p.k ORDER BY suppkey""".stripMargin,

      "q_dedup_exact" ->
        """SELECT md5(substring(text, 1, 20)) AS fingerprint, min(doc_id) AS canonical_id,
          |       count(*) AS n_dups
          |FROM documents GROUP BY 1 HAVING count(*) > 1 ORDER BY 1""".stripMargin,

      "q_dedup_normfp" ->
        """SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
          |FROM documents ORDER BY doc_id""".stripMargin,

      // the bloom bits are engine-specific, so the gate pins the exact
      // counts plus the CONTRACT the filter must satisfy (no false
      // negatives; fp rate within bound) as literal-true booleans
      "q_bloom_prefilter" ->
        """WITH d AS (
          |  SELECT doc_id, md5(substring(text, 1, 20)) AS fp FROM documents),
          |b AS (SELECT * FROM d WHERE doc_id % 10 = 0),
          |c AS (SELECT DISTINCT fp FROM d WHERE doc_id % 10 <> 0)
          |SELECT (SELECT count(*) FROM b) AS n_batch,
          |       (SELECT count(*) FROM b WHERE fp IN (SELECT fp FROM c)) AS n_true_dup,
          |       TRUE AS no_false_negatives,
          |       TRUE AS fp_within_bound
          |ORDER BY n_batch""".stripMargin,

      "q_top_ngrams" ->
        """WITH toks AS (
          |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS l
          |  FROM documents),
          |sh AS (
          |  SELECT unnest([array_to_string(l[i:i+1], ' ') for i in range(1, len(l))]) AS ngram
          |  FROM toks)
          |SELECT ngram, count(*) AS n FROM sh
          |GROUP BY 1 ORDER BY n DESC, ngram LIMIT 20""".stripMargin,

      "q_minhash" ->
        s"""WITH $sqlMinhashCtes
           |SELECT doc_id, mh0, mh1, mh2, mh3 FROM sig ORDER BY doc_id""".stripMargin,

      // chunk starts 1, 1+24, ... (1-based); list slices clamp at the
      // doc end on both engines, so the tail chunk semantics match.
      "q_doc_chunks" -> docChunksSql,

      // the native Generator is output-identical to the declarative
      // form (unit-gated), so it answers to the SAME oracle
      "q_doc_chunks_gen" -> docChunksSql,

      "q_clean_corpus" ->
        s"""WITH $sqlQualityFeatureCte,
           |kept AS (
           |  SELECT doc_id, text FROM f WHERE $sqlQualityScore >= 0.7),
           |canon AS (
           |  SELECT doc_id, text FROM (
           |    SELECT doc_id, text,
           |           row_number() OVER (
           |             PARTITION BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
           |             ORDER BY doc_id) AS rn
           |    FROM kept) WHERE rn = 1),
           |ctoks AS (SELECT doc_id, $sqlTokens AS l FROM canon),
           |trainsh AS (
           |  SELECT doc_id,
           |         unnest(list_distinct([array_to_string(l[i:i+3], ' ') for i in range(1, len(l) - 2)])) AS ng
           |  FROM ctoks WHERE len(l) >= 4 AND doc_id % 50 <> 0),
           |evsh AS (
           |  SELECT DISTINCT unnest(list_distinct([array_to_string(l[i:i+3], ' ') for i in range(1, len(l) - 2)])) AS ng
           |  FROM qtok WHERE len(l) >= 4 AND doc_id % 50 = 0),
           |contam AS (SELECT DISTINCT t.doc_id FROM trainsh t JOIN evsh e USING (ng)),
           |clean AS (
           |  SELECT doc_id, l FROM ctoks
           |  WHERE doc_id % 50 <> 0 AND len(l) > 0
           |    AND doc_id NOT IN (SELECT doc_id FROM contam)),
           |ch AS (
           |  SELECT doc_id, len(l) AS nl, unnest(generate_series(1, len(l), 24)) AS i
           |  FROM clean),
           |chunks AS (
           |  SELECT doc_id, CAST((i - 1) // 24 AS BIGINT) AS chunk_ix,
           |         CAST(least(32, nl - i + 1) AS BIGINT) AS n, doc_id % 8 AS bucket
           |  FROM ch),
           |cum AS (
           |  SELECT bucket, doc_id, n,
           |         sum(n) OVER (PARTITION BY bucket ORDER BY doc_id, chunk_ix
           |                      ROWS UNBOUNDED PRECEDING) AS c
           |  FROM chunks)
           |SELECT bucket, CAST((c - n) // 256 AS BIGINT) AS seq_id, count(*) AS n_chunks,
           |       CAST(sum(n) AS BIGINT) AS n_tokens, count(DISTINCT doc_id) AS n_docs
           |FROM cum GROUP BY 1, 2 ORDER BY bucket, seq_id""".stripMargin,

      "q_pack_sequences" ->
        s"""WITH toks AS (
           |  SELECT doc_id, $sqlTokens AS l FROM documents),
           |ch AS (
           |  SELECT doc_id, len(l) AS nl, unnest(generate_series(1, len(l), 24)) AS i
           |  FROM toks WHERE len(l) > 0),
           |chunks AS (
           |  SELECT doc_id, CAST((i - 1) // 24 AS BIGINT) AS chunk_ix,
           |         CAST(least(32, nl - i + 1) AS BIGINT) AS n, doc_id % 8 AS bucket
           |  FROM ch),
           |cum AS (
           |  SELECT bucket, doc_id, n,
           |         sum(n) OVER (PARTITION BY bucket ORDER BY doc_id, chunk_ix
           |                      ROWS UNBOUNDED PRECEDING) AS c
           |  FROM chunks)
           |SELECT bucket, CAST((c - n) // 256 AS BIGINT) AS seq_id, count(*) AS n_chunks,
           |       CAST(sum(n) AS BIGINT) AS n_tokens, count(DISTINCT doc_id) AS n_docs
           |FROM cum GROUP BY 1, 2 ORDER BY bucket, seq_id""".stripMargin,

      "q_token_entropy" ->
        s"""WITH toks AS (
           |  SELECT doc_id, $sqlTokens AS l FROM documents),
           |tok AS (SELECT doc_id, unnest(l) AS w FROM toks),
           |cnt AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY 1, 2)
           |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
           |       round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 4) AS entropy
           |FROM cnt GROUP BY doc_id ORDER BY doc_id""".stripMargin,

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

      "q_tpch_q3ish" ->
        """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date,
          |       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
          |         AS rev_cents
          |FROM customer JOIN orders ON c_custkey = o_custkey
          |JOIN lineitem ON o_orderkey = l_orderkey
          |WHERE c_mktsegment = 'BUILDING'
          |  AND o_orderdate < TIMESTAMP '1998-06-30 00:00:00'
          |  AND l_shipdate > TIMESTAMP '1998-06-30 00:00:00'
          |GROUP BY 1, 2
          |ORDER BY rev_cents DESC, l_orderkey LIMIT 10""".stripMargin,

      "q_tpch_q10ish" ->
        """SELECT c_custkey, c_name, n_name,
          |       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
          |         AS rev_cents
          |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |JOIN nation ON c_nationkey = n_nationkey
          |WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
          |  AND o_orderdate < TIMESTAMP '1999-04-01 00:00:00'
          |  AND l_returnflag = 'R'
          |GROUP BY 1, 2, 3
          |ORDER BY rev_cents DESC, c_custkey LIMIT 20""".stripMargin,

      "q_tpch_q5ish" ->
        """SELECT n_name,
          |       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
          |       count(*) AS n_lineitems
          |FROM orders
          |JOIN lineitem ON o_orderkey = l_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          |JOIN nation ON s_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |WHERE r_name = 'ASIA'
          |  AND o_orderdate >= TIMESTAMP '1996-01-01'
          |  AND o_orderdate < TIMESTAMP '1998-01-01'
          |GROUP BY 1 ORDER BY n_name""".stripMargin,

      "q_funnel_stages" ->
        """WITH v AS (
          |  SELECT user_id, min(ts) AS v_ts FROM events
          |  WHERE event_type = 'view' GROUP BY 1),
          |c AS (
          |  SELECT e.user_id, min(e.ts) AS c_ts FROM events e
          |  JOIN v ON e.user_id = v.user_id
          |  WHERE e.event_type = 'click' AND e.ts > v.v_ts GROUP BY 1),
          |p AS (
          |  SELECT e.user_id, min(e.ts) AS p_ts FROM events e
          |  JOIN c ON e.user_id = c.user_id
          |  WHERE e.event_type = 'purchase' AND e.ts > c.c_ts GROUP BY 1)
          |SELECT (SELECT count(*) FROM v) AS n_view,
          |       (SELECT count(*) FROM c) AS n_view_click,
          |       (SELECT count(*) FROM p) AS n_view_click_purchase
          |ORDER BY n_view""".stripMargin,

      "q_langid_confusion" ->
        s"""WITH toks AS (
           |  SELECT lang, $sqlTokens AS l FROM documents),
           |v AS (
           |  SELECT lang,
           |         (${sqlLangVotes("en")}) AS en,
           |         (${sqlLangVotes("es")}) AS es,
           |         (${sqlLangVotes("fr")}) AS fr
           |  FROM toks)
           |SELECT lang, $sqlLangCase AS lang_id, count(*) AS n
           |FROM v GROUP BY 1, 2 ORDER BY lang, lang_id""".stripMargin,

      "q_source_report" ->
        s"""WITH $sqlQualityFeatureCte,
           |fp AS (
           |  SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fpv
           |  FROM documents),
           |fpn AS (SELECT fpv, count(*) AS fp_n FROM fp GROUP BY 1),
           |d AS (
           |  SELECT doc_id, source FROM documents)
           |SELECT d.source, count(*) AS n_docs,
           |       CAST(sum(CASE WHEN fpn.fp_n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
           |       round(CAST(sum(CAST(round(($sqlQualityScore) * 100.0) AS BIGINT)) AS DOUBLE)
           |             / (count($sqlQualityScore) * 100.0), 4) AS avg_quality
           |FROM d JOIN fp USING (doc_id) JOIN fpn USING (fpv) JOIN f USING (doc_id)
           |GROUP BY 1 ORDER BY d.source""".stripMargin,

      "q_vector_stats" ->
        """WITH v AS (
          |  SELECT embedding,
          |         round(sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
          |                                       CAST(embedding AS DOUBLE[]))), 6) AS nrm
          |  FROM embeddings)
          |SELECT count(*) AS n_vectors,
          |       CAST(sum(CASE WHEN embedding IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
          |       min(len(embedding)) AS min_dims, max(len(embedding)) AS max_dims,
          |       CAST(sum(CASE WHEN nrm = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
          |       round(CAST(sum(CAST(round(nrm * 1000000.0) AS BIGINT)) AS DOUBLE)
          |             / (count(nrm) * 1000000.0), 4) AS avg_norm,
          |       min(nrm) AS min_norm, max(nrm) AS max_norm
          |FROM v ORDER BY n_vectors""".stripMargin,

      "q_knn_eval" ->
        """WITH q AS (
          |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv, label AS true_label
          |  FROM embeddings WHERE vec_id < 50),
          |t AS (
          |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS tv, label
          |  FROM embeddings WHERE vec_id >= 50),
          |s AS (
          |  SELECT query_id, t.vec_id AS nid, t.label AS n_label,
          |         round(list_cosine_similarity(tv, qv), 6) AS c
          |  FROM t, q),
          |r AS (
          |  SELECT query_id, n_label,
          |         row_number() OVER (PARTITION BY query_id ORDER BY c DESC, nid) AS rk
          |  FROM s),
          |v AS (SELECT query_id, n_label, count(*) AS nv FROM r WHERE rk <= 3 GROUP BY 1, 2),
          |p AS (
          |  SELECT query_id, n_label AS pred_label,
          |         row_number() OVER (PARTITION BY query_id ORDER BY nv DESC, n_label) AS pr
          |  FROM v),
          |j AS (SELECT q.true_label AS label, p.pred_label FROM p JOIN q USING (query_id) WHERE pr = 1)
          |SELECT label, count(*) AS n,
          |       CAST(sum(CASE WHEN pred_label = label THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
          |       round(sum(CASE WHEN pred_label = label THEN 1 ELSE 0 END) * 1.0 / count(*), 4) AS accuracy
          |FROM j GROUP BY 1 ORDER BY label""".stripMargin,

      "q_sliding_distinct" ->
        """WITH pairs AS (
          |  SELECT DISTINCT event_type, CAST(ts AS DATE) AS d, user_id FROM events),
          |win AS (
          |  SELECT event_type, user_id,
          |         unnest([d + CAST(i AS INTEGER) for i in range(0, 7)]) AS we
          |  FROM pairs)
          |SELECT event_type, strftime(we, '%Y-%m-%d') AS window_end,
          |       count(DISTINCT user_id) AS n_distinct
          |FROM win GROUP BY 1, 2 ORDER BY event_type, window_end""".stripMargin,

      // p50/p99 of the integer group sizes as DISCRETE quantiles in
      // pure integer rank logic (smallest size whose <=-count reaches
      // p·keys) — no quantile built-in, no interpolation, no
      // engine-version sensitivity; mean = one exact-int division
      "q_skew_report" ->
        """WITH s1 AS (SELECT count(*) AS _n FROM lineitem GROUP BY l_returnflag),
          |s2 AS (SELECT count(*) AS _n FROM lineitem GROUP BY l_suppkey),
          |w1 AS (
          |  SELECT _n,
          |         count(*) OVER (ORDER BY _n RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ce,
          |         count(*) OVER () AS nk
          |  FROM s1),
          |w2 AS (
          |  SELECT _n,
          |         count(*) OVER (ORDER BY _n RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ce,
          |         count(*) OVER () AS nk
          |  FROM s2),
          |q1 AS (
          |  SELECT (SELECT min(_n) FROM w1 WHERE 2 * ce >= nk) AS p50,
          |         (SELECT min(_n) FROM w1 WHERE 100 * ce >= 99 * nk) AS p99),
          |q2 AS (
          |  SELECT (SELECT min(_n) FROM w2 WHERE 2 * ce >= nk) AS p50,
          |         (SELECT min(_n) FROM w2 WHERE 100 * ce >= 99 * nk) AS p99),
          |r1 AS (
          |  SELECT count(*) AS n_keys, CAST(sum(_n) AS BIGINT) AS n_rows, max(_n) AS max_key_rows,
          |         round(CAST(sum(_n) AS DOUBLE) / count(*), 4) AS mean_key_rows,
          |         round(CAST((SELECT p50 FROM q1) AS DOUBLE), 4) AS p50_key_rows,
          |         round(CAST((SELECT p99 FROM q1) AS DOUBLE), 4) AS p99_key_rows,
          |         round(max(_n) * 1.0 / sum(_n), 4) AS top_key_share,
          |         'l_returnflag' AS key_set
          |  FROM s1),
          |r2 AS (
          |  SELECT count(*) AS n_keys, CAST(sum(_n) AS BIGINT) AS n_rows, max(_n) AS max_key_rows,
          |         round(CAST(sum(_n) AS DOUBLE) / count(*), 4) AS mean_key_rows,
          |         round(CAST((SELECT p50 FROM q2) AS DOUBLE), 4) AS p50_key_rows,
          |         round(CAST((SELECT p99 FROM q2) AS DOUBLE), 4) AS p99_key_rows,
          |         round(max(_n) * 1.0 / sum(_n), 4) AS top_key_share,
          |         'l_suppkey' AS key_set
          |  FROM s2)
          |SELECT * FROM r1 UNION ALL SELECT * FROM r2 ORDER BY key_set""".stripMargin,

      "q_histogram" ->
        """SELECT CAST(least(greatest(floor(l_extendedprice / 5000.0), 0), 21) AS BIGINT) AS bin,
          |       count(*) AS n_rows,
          |       round(min(l_extendedprice), 2) AS min_price,
          |       round(max(l_extendedprice), 2) AS max_price
          |FROM lineitem GROUP BY 1 ORDER BY bin""".stripMargin,

      "q_contamination" ->
        s"""WITH toks AS (
           |  SELECT doc_id, $sqlTokens AS l FROM documents),
           |shing AS (
           |  SELECT doc_id,
           |         unnest(list_distinct([array_to_string(l[i:i+3], ' ') for i in range(1, len(l) - 2)])) AS ng
           |  FROM toks WHERE len(l) >= 4),
           |ev AS (SELECT DISTINCT ng, doc_id AS eval_id FROM shing WHERE doc_id % 50 = 0),
           |tr AS (SELECT doc_id, ng FROM shing WHERE doc_id % 50 <> 0)
           |SELECT tr.doc_id, count(DISTINCT tr.ng) AS n_shared_ngrams,
           |       count(DISTINCT ev.eval_id) AS n_eval_docs
           |FROM tr JOIN ev USING (ng) GROUP BY 1 ORDER BY 1""".stripMargin,

      // the repetitive flag compares the UNROUNDED ratio (one IEEE
      // division of two exact integers — bit-stable cross-engine)
      "q_repetition" ->
        s"""WITH toks AS (
           |  SELECT doc_id, $sqlTokens AS l FROM documents),
           |big AS (
           |  SELECT doc_id, unnest([array_to_string(l[i:i+1], ' ') for i in range(1, len(l))]) AS ng
           |  FROM toks WHERE len(l) >= 2),
           |cnt AS (SELECT doc_id, ng, count(*) AS c FROM big GROUP BY 1, 2),
           |agg AS (SELECT doc_id, sum(c) AS total, max(c) AS top FROM cnt GROUP BY 1)
           |SELECT t.doc_id, len(l) AS n_tokens,
           |       round(len(list_distinct(l)) * 1.0 / len(l), 4) AS uniq_token_frac,
           |       round(top * 1.0 / total, 4) AS top_bigram_frac,
           |       CAST(top * 1.0 / total >= 0.06 AS INT) AS repetitive
           |FROM toks t JOIN agg USING (doc_id) WHERE len(l) >= 2 ORDER BY doc_id""".stripMargin,

      "q_lm_surprisal" ->
        s"""WITH toks AS (
           |  SELECT doc_id, $sqlTokens AS l FROM documents),
           |tok AS (SELECT doc_id, unnest(l) AS w FROM toks),
           |vocab AS (SELECT w, count(*) AS c FROM tok GROUP BY 1),
           |tot AS (SELECT sum(c) AS n FROM vocab)
           |SELECT doc_id, count(*) AS n_tokens,
           |       round(avg(ln(n) - ln(c)), 4) AS surprisal
           |FROM tok JOIN vocab USING (w) CROSS JOIN tot
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

      // NOTE: the sized CTEs' `BETWEEN 2 AND 316` mirrors
      // lshCandidatePairs' default admission cap
      // lshAdmissionCap(maxBucketSize=1000, maxPairsPerBucket=50000)
      // = 316; ContractSpec pins the literal to the formula
      // cap so Spark and oracle agree even if a band bucket blows up at
      // larger scale factors (boilerplate-heavy corpora).
      "q_lsh_pairs" ->
        s"""WITH $sqlMinhashCtes,
           |bands AS (
           |  SELECT doc_id, 0 AS band, md5(mh0 || mh1) AS bh FROM sig
           |  UNION ALL SELECT doc_id, 1, md5(mh2 || mh3) FROM sig),
           |sized AS (
           |  SELECT band, bh FROM bands GROUP BY band, bh
           |  HAVING count(*) BETWEEN 2 AND 316)
           |SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
           |FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
           |JOIN sized s ON s.band = a.band AND s.bh = a.bh
           |ORDER BY id1, id2""".stripMargin,

      // Transitive closure via recursive CTE: reach(id, r) holds every
      // node r reachable from id over the (capped, mirrored) LSH pair
      // graph; the component label is the least reachable id.
      "q_dedup_clusters" ->
        s"""WITH RECURSIVE $sqlMinhashCtes,
           |bands AS (
           |  SELECT doc_id, 0 AS band, md5(mh0 || mh1) AS bh FROM sig
           |  UNION ALL SELECT doc_id, 1, md5(mh2 || mh3) FROM sig),
           |sized AS (
           |  SELECT band, bh FROM bands GROUP BY band, bh
           |  HAVING count(*) BETWEEN 2 AND 316),
           |pairs AS (
           |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
           |  FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
           |  JOIN sized s ON s.band = a.band AND s.bh = a.bh),
           |edges AS (
           |  SELECT id1 AS src, id2 AS dst FROM pairs
           |  UNION SELECT id2, id1 FROM pairs),
           |reach AS (
           |  SELECT src AS id, dst AS r FROM edges
           |  UNION
           |  SELECT e.src, rr.r FROM edges e JOIN reach rr ON rr.id = e.dst),
           |labels AS (SELECT id, min(r) AS min_r FROM reach GROUP BY id)
           |SELECT d.doc_id,
           |       COALESCE(least(l.min_r, d.doc_id), d.doc_id) AS cluster_id,
           |       COALESCE(least(l.min_r, d.doc_id), d.doc_id) = d.doc_id AS is_canonical
           |FROM documents d LEFT JOIN labels l ON l.id = d.doc_id
           |ORDER BY doc_id""".stripMargin,

      // batch-vs-corpus banding over the shared minhash CTEs, exact
      // Jaccard on the distinct shingle sets of candidates only
      "q_incr_dedup" ->
        s"""WITH $sqlMinhashCtes,
           |bands AS (
           |  SELECT doc_id, 0 AS band, md5(mh0 || mh1) AS bh FROM sig
           |  UNION ALL SELECT doc_id, 1, md5(mh2 || mh3) FROM sig),
           |cand AS (
           |  SELECT b.doc_id AS new_id, a.doc_id AS old_id
           |  FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh
           |  WHERE a.doc_id < 400 AND b.doc_id >= 400
           |  GROUP BY 1, 2),
           |dsh AS (SELECT DISTINCT doc_id, shingle FROM sh),
           |sizes AS (SELECT doc_id, count(*) AS n_sh FROM dsh GROUP BY doc_id),
           |inter AS (
           |  SELECT c.new_id, c.old_id, count(*) AS n_inter
           |  FROM cand c
           |  JOIN dsh s1 ON s1.doc_id = c.new_id
           |  JOIN dsh s2 ON s2.doc_id = c.old_id AND s2.shingle = s1.shingle
           |  GROUP BY 1, 2)
           |SELECT i.new_id, i.old_id, i.n_inter,
           |       round(CAST(i.n_inter AS DOUBLE) / (sb.n_sh + se.n_sh - i.n_inter), 6) AS jaccard
           |FROM inter i JOIN sizes sb ON sb.doc_id = i.new_id
           |JOIN sizes se ON se.doc_id = i.old_id
           |ORDER BY new_id, old_id""".stripMargin,

      "q_setops_all" ->
        """WITH ordered AS (SELECT o_custkey AS c_custkey FROM orders),
          |prio AS (SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
          |ex AS (SELECT c_custkey FROM ordered EXCEPT ALL SELECT c_custkey FROM prio),
          |ia AS (SELECT c_custkey FROM ordered INTERSECT ALL SELECT c_custkey FROM prio)
          |SELECT 'except_all' AS op, c_custkey, count(*) AS n FROM ex GROUP BY 2
          |UNION ALL
          |SELECT 'intersect_all' AS op, c_custkey, count(*) AS n FROM ia GROUP BY 2
          |ORDER BY op, c_custkey""".stripMargin,

      // identical construction on both sides (sorted trailing-frame
      // list, lower-middle index) — no reliance on either engine's
      // quantile_disc window tie rule
      "q_moving_median" ->
        """WITH daily AS (
          |  SELECT event_type, date_trunc('day', ts) AS dday,
          |         round(sum(value), 2) AS day_total
          |  FROM events GROUP BY 1, 2),
          |win AS (
          |  SELECT event_type, strftime(dday, '%Y-%m-%d') AS day, day_total,
          |         list_sort(list(day_total) OVER (PARTITION BY event_type ORDER BY dday
          |             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS vals
          |  FROM daily)
          |SELECT event_type, day, day_total,
          |       vals[CAST((len(vals) + 1) // 2 AS INTEGER)] AS moving_median
          |FROM win ORDER BY event_type, day""".stripMargin,

      "q_tpch_q18ish" ->
        """WITH big AS (
          |  SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
          |  FROM lineitem GROUP BY 1
          |  HAVING sum(CAST(l_quantity AS BIGINT)) > 300)
          |SELECT o_orderkey, o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
          |       round(o_totalprice, 2) AS o_totalprice, total_qty
          |FROM orders JOIN big ON o_orderkey = l_orderkey
          |ORDER BY total_qty DESC, o_orderkey LIMIT 20""".stripMargin,

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

      "q_novelty" ->
        """WITH toks AS (
          |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS l
          |  FROM documents),
          |dsh AS (
          |  SELECT DISTINCT doc_id, shingle FROM (
          |    SELECT doc_id, unnest([array_to_string(l[i:i+2], ' ') for i in range(1, len(l) - 1)]) AS shingle
          |    FROM toks)),
          |freq AS (SELECT shingle, count(DISTINCT doc_id) AS df FROM dsh GROUP BY 1)
          |SELECT doc_id, count(*) AS n_shingles,
          |       count(*) FILTER (WHERE df = 1) AS n_unique,
          |       round(CAST(count(*) FILTER (WHERE df = 1) AS DOUBLE) / count(*), 6) AS novelty
          |FROM dsh JOIN freq USING (shingle)
          |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

      "q_jaccard_pairs" -> jaccardPairsSql,

      // the prefix filter is lossless at the threshold, so the
      // prefix-join query answers to the SAME oracle as the naive form
      "q_jaccard_prefix" -> jaccardPairsSql,

      "q_simhash" -> {
        val sums = (0 until 16).map(b => s"sum(${sqlSimhashBit(b)}) AS s$b").mkString(",\n         ")
        val assemble = (0 until 16)
          .map(b => s"CASE WHEN s$b >= 0 THEN ${1 << b} ELSE 0 END").mkString(" + ")
        s"""WITH tok AS (
           |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')) AS t
           |  FROM documents),
           |h AS (SELECT doc_id, md5(t) AS h FROM tok),
           |bits AS (
           |  SELECT doc_id,
           |         $sums
           |  FROM h GROUP BY doc_id)
           |SELECT doc_id, CAST($assemble AS INTEGER) AS simhash FROM bits ORDER BY doc_id""".stripMargin
      },

      "q_simhash64" -> {
        val sums = (0 until 64).map(b => s"sum(${sqlSimhashBit(b)}) AS s$b").mkString(",\n         ")
        // disjoint bit powers: plain addition assembles the exact
        // two's-complement BIGINT (bit 63's power is Long.MinValue)
        val assemble = (0 until 64)
          .map(b => s"CASE WHEN s$b >= 0 THEN CAST(${1L << b} AS BIGINT) ELSE 0 END").mkString(" + ")
        s"""WITH tok AS (
           |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')) AS t
           |  FROM documents),
           |h AS (SELECT doc_id, md5(t) AS h FROM tok),
           |bits AS (
           |  SELECT doc_id,
           |         $sums
           |  FROM h GROUP BY doc_id)
           |SELECT doc_id, CAST($assemble AS BIGINT) AS simhash FROM bits ORDER BY doc_id""".stripMargin
      },

      // same 64-bit signature CTE as q_simhash64, then the 4x16-bit
      // chunk pigeonhole join with bit_count(xor) verification
      "q_simhash_dedup" -> {
        val sums = (0 until 64).map(b => s"sum(${sqlSimhashBit(b)}) AS s$b").mkString(",\n         ")
        val assemble = (0 until 64)
          .map(b => s"CASE WHEN s$b >= 0 THEN CAST(${1L << b} AS BIGINT) ELSE 0 END").mkString(" + ")
        s"""WITH tok AS (
           |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')) AS t
           |  FROM documents),
           |h AS (SELECT doc_id, md5(t) AS h FROM tok),
           |bits AS (
           |  SELECT doc_id,
           |         $sums
           |  FROM h GROUP BY doc_id),
           |sig AS (SELECT doc_id, CAST($assemble AS BIGINT) AS simhash FROM bits),
           |chunks AS (
           |  SELECT doc_id, simhash, i AS ck, (simhash >> CAST(i * 16 AS INTEGER)) & 65535 AS cv
           |  FROM sig, range(4) t(i))
           |SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
           |       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
           |FROM chunks a JOIN chunks b ON a.ck = b.ck AND a.cv = b.cv AND a.doc_id < b.doc_id
           |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
           |ORDER BY id1, id2""".stripMargin
      },

      "q_ann_multiprobe" ->
        s"""WITH b AS (
           |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
           |         CAST(${sqlHyperplaneBucket("embedding")} AS INTEGER) AS bucket
           |  FROM embeddings),
           |q AS (SELECT vec_id, v, bucket FROM b WHERE vec_id < 8),
           |probes AS (
           |  SELECT vec_id, v, bucket AS probe FROM q
           |  UNION ALL SELECT vec_id, v, xor(bucket, 1) FROM q
           |  UNION ALL SELECT vec_id, v, xor(bucket, 2) FROM q
           |  UNION ALL SELECT vec_id, v, xor(bucket, 4) FROM q
           |  UNION ALL SELECT vec_id, v, xor(bucket, 8) FROM q),
           |s AS (
           |  SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
           |         list_cosine_similarity(c.v, p.v) AS c
           |  FROM b c JOIN probes p ON c.bucket = p.probe AND c.vec_id <> p.vec_id)
           |SELECT query_id,
           |       CAST(row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS INTEGER) AS rank,
           |       neighbor_id, round(c, 6) AS cosine
           |FROM s QUALIFY rank <= 3 ORDER BY query_id, rank""".stripMargin,

      "q_hash_sample" ->
        s"""WITH toks AS (
           |  SELECT doc_id, $sqlTokens AS l FROM documents),
           |lv AS (
           |  SELECT doc_id,
           |         substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS bucket,
           |         (${sqlLangVotes("en")}) AS en,
           |         (${sqlLangVotes("es")}) AS es,
           |         (${sqlLangVotes("fr")}) AS fr
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

      "q_text_quality" ->
        s"""WITH $sqlQualityFeatureCte
           |SELECT doc_id, n_tok AS n_tokens,
           |       round(CASE WHEN n_chars = 0 THEN 0.0 ELSE CAST(n_punct AS DOUBLE) / n_chars END, 6) AS punct_ratio,
           |       round(CASE WHEN n_tok = 0 THEN 0.0 ELSE CAST(stop_hits AS DOUBLE) / n_tok END, 6) AS stopword_ratio,
           |       round(CASE WHEN n_tok = 0 THEN 0.0 ELSE CAST(n_chars - n_tok + 1 AS DOUBLE) / n_tok END, 6) AS mean_word_len,
           |       $sqlQualityScore AS quality_score
           |FROM f ORDER BY doc_id""".stripMargin,

      // capstone composite: the pipeline an actual training-data run
      // executes — quality gate -> exact dedup keep-first -> per-language
      // corpus stats — all from already-oracled pieces
      "q_corpus_pipeline" ->
        s"""WITH $sqlQualityFeatureCte,
           |kept AS (
           |  SELECT doc_id, text FROM f WHERE $sqlQualityScore >= 0.7),
           |canon AS (
           |  SELECT doc_id, text FROM (
           |    SELECT doc_id, text,
           |           row_number() OVER (
           |             PARTITION BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
           |             ORDER BY doc_id) AS rn
           |    FROM kept) WHERE rn = 1),
           |ctok AS (
           |  SELECT doc_id, text, $sqlTokens AS l FROM canon),
           |lv AS (
           |  SELECT doc_id,
           |         (${sqlLangVotes("en")}) AS en,
           |         (${sqlLangVotes("es")}) AS es,
           |         (${sqlLangVotes("fr")}) AS fr,
           |         CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS INTEGER) AS n_bpeish
           |  FROM ctok)
           |SELECT $sqlLangCase AS lang_id,
           |       count(*) AS n_docs, CAST(sum(n_bpeish) AS BIGINT) AS total_tokens
           |FROM lv GROUP BY 1 ORDER BY 1""".stripMargin,

      // model re-derived from bucket ids; n_feats counts tokens that
      // joined a weight row (= all tokens: buckets are always in-range)
      "q_quality_classifier" ->
        s"""WITH toks AS (
           |  SELECT doc_id, $sqlTokens AS l FROM documents),
           |f AS (
           |  SELECT doc_id,
           |         CAST(('0x' || substring(md5('f:' || t), 1, 8)) AS BIGINT) % 1024 AS bucket
           |  FROM (SELECT doc_id, unnest(l) AS t FROM toks)),
           |m AS (
           |  SELECT i AS bucket,
           |         (CAST(('0x' || substring(md5('w:' || CAST(i AS VARCHAR)), 1, 8)) AS BIGINT) % 2001 - 1000) / 1000.0 AS w
           |  FROM range(1024) r(i)),
           |z AS (
           |  SELECT doc_id, sum(w) / count(*) AS mean_w, count(*) AS n_feats
           |  FROM f JOIN m USING (bucket) GROUP BY 1),
           |s AS (
           |  SELECT t.doc_id, coalesce(z.n_feats, 0) AS n_feats,
           |         round(1.0 / (1.0 + exp(-8.0 * coalesce(z.mean_w, 0.0))), 6) AS score
           |  FROM toks t LEFT JOIN z USING (doc_id))
           |SELECT doc_id, n_feats, score, score >= 0.5 AS keep
           |FROM s ORDER BY doc_id""".stripMargin,

      "q_lang_tokens" ->
        s"""WITH toks AS (
           |  SELECT doc_id, text, $sqlTokens AS l FROM documents),
           |v AS (
           |  SELECT doc_id,
           |         (${sqlLangVotes("en")}) AS en,
           |         (${sqlLangVotes("es")}) AS es,
           |         (${sqlLangVotes("fr")}) AS fr,
           |         CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS INTEGER) AS n_bpeish
           |  FROM toks)
           |SELECT doc_id,
           |       $sqlLangCase AS lang_id,
           |       n_bpeish
           |FROM v ORDER BY doc_id""".stripMargin,

      "q_sim_topk" ->
        """WITH q AS (
          |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
          |  FROM embeddings WHERE vec_id < 5),
          |s AS (
          |  SELECT query_id, e.vec_id AS neighbor_id,
          |         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), qv) AS c
          |  FROM embeddings e, q WHERE e.vec_id <> query_id)
          |SELECT query_id,
          |       CAST(row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS INTEGER) AS rank,
          |       neighbor_id, round(c, 6) AS cosine
          |FROM s QUALIFY rank <= 3 ORDER BY query_id, rank""".stripMargin,

      "q_embed_bucket" ->
        s"""SELECT CAST(${sqlHyperplaneBucket("embedding")} AS INTEGER) AS bucket, count(*) AS n
           |FROM embeddings GROUP BY 1 ORDER BY 1""".stripMargin,

      "q_ann_topk" ->
        s"""WITH b AS (
           |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
           |         CAST(${sqlHyperplaneBucket("embedding")} AS INTEGER) AS bucket
           |  FROM embeddings),
           |s AS (
           |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           |         list_cosine_similarity(c.v, q.v) AS c
           |  FROM b c JOIN b q ON c.bucket = q.bucket AND c.vec_id <> q.vec_id
           |  WHERE q.vec_id < 8)
           |SELECT query_id,
           |       CAST(row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS INTEGER) AS rank,
           |       neighbor_id, round(c, 6) AS cosine
           |FROM s QUALIFY rank <= 3 ORDER BY query_id, rank""".stripMargin,

      "q_embed_neardup" ->
        s"""WITH b AS (
           |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
           |         CAST(${sqlHyperplaneBucket("embedding")} AS INTEGER) AS bucket
           |  FROM embeddings)
           |SELECT a.vec_id AS id1, bb.vec_id AS id2,
           |       round(list_cosine_similarity(a.v, bb.v), 6) AS cosine
           |FROM b a JOIN b bb ON a.bucket = bb.bucket AND a.vec_id < bb.vec_id
           |WHERE list_cosine_similarity(a.v, bb.v) >= 0.2
           |ORDER BY id1, id2""".stripMargin,

      // same top-k shape as q_ann_topk, but the bucket adapts to the
      // measured corpus count via the nps CTE — per-plane gating over
      // the 12-plane candidate set
      "q_ann_topk_auto" ->
        s"""WITH $sqlAutoPlaneCountCte,
           |b AS (
           |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
           |         CAST(${sqlHyperplaneBucketAuto("embedding")} AS INTEGER) AS bucket
           |  FROM embeddings CROSS JOIN nps),
           |s AS (
           |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           |         list_cosine_similarity(c.v, q.v) AS c
           |  FROM b c JOIN b q ON c.bucket = q.bucket AND c.vec_id <> q.vec_id
           |  WHERE q.vec_id < 8)
           |SELECT query_id,
           |       CAST(row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS INTEGER) AS rank,
           |       neighbor_id, round(c, 6) AS cosine
           |FROM s QUALIFY rank <= 3 ORDER BY query_id, rank""".stripMargin,

      // eval × corpus within shared buckets; max over eval cosines is
      // order-independent, null when the bucket holds no eval vector
      "q_semantic_contamination" ->
        s"""WITH b AS (
           |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
           |         CAST(${sqlHyperplaneBucket("embedding")} AS INTEGER) AS bucket
           |  FROM embeddings),
           |ev AS (SELECT * FROM b WHERE vec_id % 101 = 0),
           |co AS (SELECT * FROM b WHERE vec_id % 101 <> 0),
           |h AS (
           |  SELECT co.vec_id, max(list_cosine_similarity(co.v, ev.v)) AS mc
           |  FROM co JOIN ev ON co.bucket = ev.bucket
           |  GROUP BY 1)
           |SELECT co.vec_id, round(h.mc, 6) AS max_eval_cos,
           |       COALESCE(h.mc >= 0.2, false) AS contaminated
           |FROM co LEFT JOIN h ON co.vec_id = h.vec_id
           |ORDER BY co.vec_id""".stripMargin,

      "q_embed_neardup_auto" ->
        s"""WITH $sqlAutoPlaneCountCte,
           |b AS (
           |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
           |         CAST(${sqlHyperplaneBucketAuto("embedding")} AS INTEGER) AS bucket
           |  FROM embeddings CROSS JOIN nps)
           |SELECT a.vec_id AS id1, bb.vec_id AS id2,
           |       round(list_cosine_similarity(a.v, bb.v), 6) AS cosine
           |FROM b a JOIN b bb ON a.bucket = bb.bucket AND a.vec_id < bb.vec_id
           |WHERE list_cosine_similarity(a.v, bb.v) >= 0.2
           |ORDER BY id1, id2""".stripMargin,

      // SemDeDup: same assignment CTE as q_ivf_assign, pair prune
      // within clusters, smaller-id-keeps drop rule; centroid count
      // derived from the corpus count by pure-integer ceiling math —
      // mirrors the Spark side exactly with no libm boundary risk
      "q_semantic_dedup" ->
        """WITH kk AS (
          |  SELECT GREATEST(4, (count(*) + 127) // 128) AS k FROM embeddings),
          |e AS (
          |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
          |c AS (SELECT vec_id AS centroid_id, v AS cv
          |      FROM e CROSS JOIN kk WHERE vec_id < kk.k),
          |s AS (
          |  SELECT e.vec_id, centroid_id, list_cosine_similarity(v, cv) AS cc
          |  FROM e, c),
          |asg AS (
          |  SELECT vec_id, centroid_id
          |  FROM (SELECT vec_id, centroid_id,
          |               row_number() OVER (PARTITION BY vec_id
          |                                  ORDER BY cc DESC, centroid_id) AS rn
          |        FROM s) WHERE rn = 1),
          |dropped AS (
          |  SELECT DISTINCT b.vec_id
          |  FROM asg a JOIN asg b
          |    ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
          |  JOIN e ea ON ea.vec_id = a.vec_id
          |  JOIN e eb ON eb.vec_id = b.vec_id
          |  WHERE list_cosine_similarity(ea.v, eb.v) >= 0.2)
          |SELECT centroid_id, count(*) AS n_vectors,
          |       CAST(sum(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
          |       CAST(sum(CASE WHEN d.vec_id IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped
          |FROM asg LEFT JOIN dropped d USING (vec_id)
          |GROUP BY 1 ORDER BY 1""".stripMargin,

      // IVF assignment: the argmax is re-derived as a per-vector
      // row_number over (cosine DESC, centroid_id) — same tie-break as
      // the Spark struct-max
      "q_ivf_assign" ->
        """WITH e AS (
          |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
          |c AS (SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id < 4),
          |s AS (
          |  SELECT e.vec_id, centroid_id, list_cosine_similarity(v, cv) AS cc
          |  FROM e, c)
          |SELECT vec_id, centroid_id, round(cc, 6) AS centroid_cos
          |FROM (SELECT vec_id, centroid_id, cc,
          |             row_number() OVER (PARTITION BY vec_id
          |                                ORDER BY cc DESC, centroid_id) AS rn
          |      FROM s) WHERE rn = 1
          |ORDER BY vec_id""".stripMargin,

      "q_ivf_topk" ->
        """WITH e AS (
          |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
          |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 4),
          |sc AS (
          |  SELECT e.vec_id, cid, list_cosine_similarity(v, cv) AS cc,
          |         row_number() OVER (PARTITION BY e.vec_id
          |                            ORDER BY list_cosine_similarity(v, cv) DESC, cid) AS rn
          |  FROM e, c),
          |asg AS (SELECT vec_id AS neighbor_id, cid FROM sc WHERE rn = 1),
          |probe AS (SELECT vec_id AS query_id, cid FROM sc WHERE vec_id < 8 AND rn <= 2),
          |s AS (
          |  SELECT p.query_id, a.neighbor_id,
          |         list_cosine_similarity(eq.v, en.v) AS cos_qn
          |  FROM probe p
          |  JOIN asg a ON p.cid = a.cid
          |  JOIN e eq ON eq.vec_id = p.query_id
          |  JOIN e en ON en.vec_id = a.neighbor_id
          |  WHERE a.neighbor_id <> p.query_id)
          |SELECT query_id,
          |       CAST(row_number() OVER (PARTITION BY query_id
          |                               ORDER BY cos_qn DESC, neighbor_id) AS INTEGER) AS rank,
          |       neighbor_id, round(cos_qn, 6) AS cosine
          |FROM s QUALIFY rank <= 3 ORDER BY query_id, rank""".stripMargin,

      // the deterministic reduction of streaming dedup: surviving keys
      // = distinct keys, whatever the batch arrival order
      "q_stream_dedup" ->
        """SELECT event_type, count(DISTINCT user_id) AS n_users
          |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

      "q_event_funnel" -> funnelSql,
      "q_event_funnel_stream" -> funnelSql,

      // matched pairs ∪ watermark-closed unmatched clicks (the
      // stream-stream left-outer emission contract; wm = min of the
      // two sides' max event time in ms − 30-min delay)
      "q_event_funnel_outer" ->
        """WITH wm AS (
          |  SELECT least(
          |    (SELECT CAST(floor(epoch(max(ts)) * 1000) AS BIGINT) FROM events WHERE event_type = 'click'),
          |    (SELECT CAST(floor(epoch(max(ts)) * 1000) AS BIGINT) FROM events WHERE event_type = 'purchase')
          |  ) - 1800000 AS wm_ms),
          |m AS (
          |  SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
          |         round(epoch(p.ts) - epoch(c.ts), 6) AS secs_to_convert
          |  FROM events c JOIN events p ON c.user_id = p.user_id
          |  WHERE c.event_type = 'click' AND p.event_type = 'purchase'
          |    AND epoch(p.ts) - epoch(c.ts) BETWEEN 0 AND 600),
          |u AS (
          |  SELECT c.user_id, c.event_id AS click_id,
          |         CAST(NULL AS BIGINT) AS purchase_id,
          |         CAST(NULL AS DOUBLE) AS secs_to_convert
          |  FROM events c, wm
          |  WHERE c.event_type = 'click'
          |    AND NOT EXISTS (
          |      SELECT 1 FROM events p
          |      WHERE p.event_type = 'purchase' AND p.user_id = c.user_id
          |        AND epoch(p.ts) - epoch(c.ts) BETWEEN 0 AND 600)
          |    AND epoch(c.ts) * 1000 + 600000 <= wm_ms)
          |SELECT * FROM m UNION ALL SELECT * FROM u
          |ORDER BY click_id, purchase_id""".stripMargin,

      "q_mway_join" ->
        """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
          |       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)) AS BIGINT)) AS BIGINT) AS revenue
          |FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |WHERE c_mktsegment = 'BUILDING'
          |  AND o_orderdate < DATE '1996-01-01'
          |  AND l_shipdate > DATE '1996-01-01'
          |GROUP BY 1, 2
          |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

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

      "q_nullsafe_join" ->
        """WITH a AS (
          |  SELECT nullif(o_orderpriority, '1-URGENT') AS pri_key, count(*) AS n,
          |         CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS total_floor
          |  FROM orders GROUP BY 1),
          |d AS (
          |  SELECT DISTINCT nullif(o_orderpriority, '1-URGENT') AS pri_key2 FROM orders)
          |SELECT a.pri_key, COALESCE(d.pri_key2, 'URGENT (masked)') AS label,
          |       a.n, a.total_floor
          |FROM a JOIN d ON a.pri_key IS NOT DISTINCT FROM d.pri_key2
          |ORDER BY label""".stripMargin,

      "q_ntile" ->
        """SELECT o_orderpriority, o_orderkey,
          |       CAST(ntile(4) OVER w AS INTEGER) AS quartile,
          |       round(percent_rank() OVER w, 6) AS pct_rank,
          |       round(cume_dist() OVER w, 6) AS cum_dist
          |FROM orders
          |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
          |ORDER BY o_orderpriority, o_orderkey""".stripMargin,

      "q_tf_df" ->
        s"""WITH toks AS (
           |  SELECT doc_id, unnest($sqlTokens) AS term
           |  FROM documents WHERE doc_id < 100),
           |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
           |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
           |r AS (
           |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
           |         row_number() OVER (PARTITION BY tf.doc_id
           |                            ORDER BY tf.tf DESC, tf.term) AS rnk
           |  FROM tf JOIN df USING (term))
           |SELECT doc_id, CAST(rnk AS INTEGER) AS rnk, term, tf, df
           |FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,

      // Spark sequence(1, n, 4) is inclusive of the stop; DuckDB
      // range(1, n + 1, 4) exclusive — same index set
      "q_doc_fingerprint" ->
        """WITH n AS (
          |  SELECT doc_id, regexp_replace(lower(text), '\s+', ' ', 'g') AS norm
          |  FROM documents)
          |SELECT doc_id,
          |       list_min([md5(substring(norm, i, 8))
          |                 for i in range(1, greatest(length(norm) - 7, 1) + 1, 4)]) AS fp8
          |FROM n ORDER BY doc_id""".stripMargin,

      // hex-pair parse of the md5 digest (DuckDB has no hex→int conv;
      // two instr lookups per byte reconstruct it exactly)
      "q_media_features" -> {
        def hexv(p: Int) = s"(instr('0123456789abcdef', substring(h, $p, 1)) - 1)"
        val feats = (0 until 4).map { j =>
          s"round((${hexv(2 * j + 1)} * 16 + ${hexv(2 * j + 2)}) / 256.0, 6) AS f$j"
        }.mkString(",\n          |       ")
        s"""WITH m AS (SELECT doc_id AS media_id, md5(text) AS h FROM documents)
           |SELECT media_id,
           |       $feats
           |FROM m ORDER BY media_id""".stripMargin
      },

      "q_multimodal_meta" ->
        """SELECT doc_id AS media_id, 'image' AS kind,
          |       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
          |       CAST(64 + octet_length(encode(text)) % 193 AS INTEGER) AS width,
          |       CAST(64 + (octet_length(encode(text)) * 31) % 131 AS INTEGER) AS height,
          |       CAST(1 AS INTEGER) AS n_frames,
          |       md5(text) AS checksum
          |FROM documents ORDER BY media_id""".stripMargin,

      // char-slice == byte-slice because the corpus is pure ASCII
      // (md5 of the substring's UTF-8 bytes == md5 of the byte frame)
      "q_frame_sample" ->
        """WITH m AS (
          |  SELECT doc_id AS media_id, text,
          |         CAST(ceil(length(text) / 64.0) AS INTEGER) AS nt
          |  FROM documents),
          |f AS (
          |  SELECT media_id, text, unnest(range(0, greatest(nt - 1, 0) + 1)) AS frame_idx
          |  FROM m)
          |SELECT media_id, CAST(frame_idx AS INTEGER) AS frame_idx,
          |       md5(substring(text, CAST(frame_idx AS INTEGER) * 64 + 1, 64)) AS frame_md5
          |FROM f WHERE frame_idx % 2 = 0
          |ORDER BY media_id, frame_idx""".stripMargin,

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

      "q_event_transitions" ->
        """WITH st AS (
          |  SELECT user_id, event_type AS from_type,
          |         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
          |  FROM events),
          |c AS (
          |  SELECT from_type, to_type, count(*) AS n
          |  FROM st WHERE to_type IS NOT NULL GROUP BY 1, 2)
          |SELECT from_type, to_type, n,
          |       CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
          |FROM c ORDER BY from_type, to_type""".stripMargin,

      // full recompute — the gate proves the Spark-side base∪delta
      // partial-state merge equals rescanning everything
      "q_incr_agg" ->
        """SELECT event_type, count(*) AS n_events,
          |       round(sum(value), 4) AS total_value,
          |       round(sum(value) / count(*), 4) AS avg_value
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

      "q_column_profile" -> {
        val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        cols.map { c =>
          s"""SELECT '$c' AS col_name,
             |       count(*) - count($c) AS n_nulls,
             |       count(DISTINCT $c) AS n_distinct,
             |       CAST(min($c) AS DOUBLE) AS min_v,
             |       CAST(max($c) AS DOUBLE) AS max_v
             |FROM lineitem""".stripMargin
        }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
      },

      // text pairs (same CTEs as q_dedup_clusters) ∪ embedding pairs
      // (same bucket predicate as q_embed_neardup) → one recursive
      // reachability closure → per-cluster member counts
      "q_dedup_ensemble" ->
        s"""WITH RECURSIVE $sqlMinhashCtes,
           |bands AS (
           |  SELECT doc_id, 0 AS band, md5(mh0 || mh1) AS bh FROM sig
           |  UNION ALL SELECT doc_id, 1, md5(mh2 || mh3) FROM sig),
           |sized AS (
           |  SELECT band, bh FROM bands GROUP BY band, bh
           |  HAVING count(*) BETWEEN 2 AND 316),
           |tpairs AS (
           |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
           |  FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
           |  JOIN sized s ON s.band = a.band AND s.bh = a.bh),
           |eb AS (
           |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
           |         CAST(${sqlHyperplaneBucket("embedding")} AS INTEGER) AS bucket
           |  FROM embeddings),
           |epairs AS (
           |  SELECT a.vec_id AS id1, bb.vec_id AS id2
           |  FROM eb a JOIN eb bb ON a.bucket = bb.bucket AND a.vec_id < bb.vec_id
           |  WHERE list_cosine_similarity(a.v, bb.v) >= 0.2),
           |allp AS (SELECT id1, id2 FROM tpairs UNION SELECT id1, id2 FROM epairs),
           |edges AS (
           |  SELECT id1 AS src, id2 AS dst FROM allp
           |  UNION SELECT id2, id1 FROM allp),
           |reach AS (
           |  SELECT src AS id, dst AS r FROM edges
           |  UNION
           |  SELECT e.src, rr.r FROM edges e JOIN reach rr ON rr.id = e.dst),
           |labels AS (SELECT id, min(r) AS min_r FROM reach GROUP BY id),
           |assign AS (
           |  SELECT d.doc_id,
           |         COALESCE(least(l.min_r, d.doc_id), d.doc_id) AS cluster_id
           |  FROM documents d LEFT JOIN labels l ON l.id = d.doc_id)
           |SELECT cluster_id, count(*) AS n_members
           |FROM assign GROUP BY cluster_id HAVING count(*) > 1
           |ORDER BY cluster_id""".stripMargin,

      // signature-agreement estimate vs true n-gram Jaccard on the
      // same bounded subset (doc_id < 200) the Spark side uses
      "q_minhash_eval" ->
        """WITH toks AS (
          |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS l
          |  FROM documents WHERE doc_id < 200),
          |sh AS (
          |  SELECT doc_id, unnest([array_to_string(l[i:i+2], ' ') for i in range(1, len(l) - 1)]) AS shingle
          |  FROM toks),
          |hs AS (SELECT doc_id, md5(shingle) AS h FROM sh),
          |sig AS (
          |  SELECT doc_id,
          |         min(substring(h, 1, 8)) AS mh0, min(substring(h, 9, 8)) AS mh1,
          |         min(substring(h, 17, 8)) AS mh2, min(substring(h, 25, 8)) AS mh3
          |  FROM hs GROUP BY doc_id),
          |bands AS (
          |  SELECT doc_id, 0 AS band, md5(mh0 || mh1) AS bh FROM sig
          |  UNION ALL SELECT doc_id, 1, md5(mh2 || mh3) FROM sig),
          |sized AS (
          |  SELECT band, bh FROM bands GROUP BY band, bh
          |  HAVING count(*) BETWEEN 2 AND 316),
          |cand AS (
          |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
          |  FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
          |  JOIN sized s ON s.band = a.band AND s.bh = a.bh),
          |dsh AS (SELECT DISTINCT doc_id AS id, shingle FROM sh),
          |sizes AS (SELECT id, count(*) AS n_sh FROM dsh GROUP BY id),
          |inter AS (
          |  SELECT a.id AS id1, b.id AS id2, count(*) AS n_inter
          |  FROM dsh a JOIN dsh b ON a.shingle = b.shingle AND a.id < b.id GROUP BY 1, 2)
          |SELECT c.id1, c.id2,
          |       (CASE WHEN s1.mh0 = s2.mh0 THEN 1 ELSE 0 END +
          |        CASE WHEN s1.mh1 = s2.mh1 THEN 1 ELSE 0 END +
          |        CASE WHEN s1.mh2 = s2.mh2 THEN 1 ELSE 0 END +
          |        CASE WHEN s1.mh3 = s2.mh3 THEN 1 ELSE 0 END) / 4.0 AS est_jaccard,
          |       round(COALESCE(CAST(i.n_inter AS DOUBLE) / (z1.n_sh + z2.n_sh - i.n_inter), 0.0), 6) AS true_jaccard
          |FROM cand c
          |JOIN sig s1 ON s1.doc_id = c.id1
          |JOIN sig s2 ON s2.doc_id = c.id2
          |JOIN sizes z1 ON z1.id = c.id1
          |JOIN sizes z2 ON z2.id = c.id2
          |LEFT JOIN inter i ON i.id1 = c.id1 AND i.id2 = c.id2
          |ORDER BY c.id1, c.id2""".stripMargin,

      // full recompute — proves the streaming-maintained partials
      // merge to the same answer (same oracle shape as q_incr_agg)
      "q_stream_rollup" ->
        """SELECT event_type, count(*) AS n_events,
          |       round(sum(value), 4) AS total_value,
          |       round(sum(value) / count(*), 4) AS avg_value
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

      "q_graph_stats" ->
        s"""WITH eb AS (
           |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
           |         CAST(${sqlHyperplaneBucket("embedding")} AS INTEGER) AS bucket
           |  FROM embeddings),
           |p AS (
           |  SELECT a.vec_id AS id1, bb.vec_id AS id2
           |  FROM eb a JOIN eb bb ON a.bucket = bb.bucket AND a.vec_id < bb.vec_id
           |  WHERE list_cosine_similarity(a.v, bb.v) >= 0.2),
           |deg AS (
           |  SELECT id, count(*) AS degree
           |  FROM (SELECT id1 AS id FROM p UNION ALL SELECT id2 FROM p)
           |  GROUP BY id),
           |tri AS (
           |  SELECT ab.id1 AS a, ab.id2 AS b, bc.id2 AS c
           |  FROM p ab
           |  JOIN p bc ON ab.id2 = bc.id1
           |  JOIN p ac ON ac.id1 = ab.id1 AND ac.id2 = bc.id2),
           |tpn AS (
           |  SELECT id, count(*) AS n_tri
           |  FROM (SELECT a AS id FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri)
           |  GROUP BY id)
           |SELECT d.id, d.degree, COALESCE(t.n_tri, 0) AS n_tri,
           |       CASE WHEN d.degree > 1
           |            THEN CAST(COALESCE(t.n_tri, 0) AS DOUBLE) * 2.0 /
           |                 CAST(d.degree * (d.degree - 1) AS DOUBLE)
           |            ELSE 0.0 END AS lcc
           |FROM deg d LEFT JOIN tpn t ON t.id = d.id
           |ORDER BY d.id""".stripMargin,

      // same CC closure as q_dedup_clusters + the quality CTEs; the
      // keep-best argmax re-derives as row_number over
      // (quality_score DESC, doc_id)
      "q_dedup_keep_best" ->
        s"""WITH RECURSIVE $sqlMinhashCtes,
           |bands AS (
           |  SELECT doc_id, 0 AS band, md5(mh0 || mh1) AS bh FROM sig
           |  UNION ALL SELECT doc_id, 1, md5(mh2 || mh3) FROM sig),
           |sized AS (
           |  SELECT band, bh FROM bands GROUP BY band, bh
           |  HAVING count(*) BETWEEN 2 AND 316),
           |pairs AS (
           |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
           |  FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
           |  JOIN sized s ON s.band = a.band AND s.bh = a.bh),
           |edges AS (
           |  SELECT id1 AS src, id2 AS dst FROM pairs
           |  UNION SELECT id2, id1 FROM pairs),
           |reach AS (
           |  SELECT src AS id, dst AS r FROM edges
           |  UNION
           |  SELECT e.src, rr.r FROM edges e JOIN reach rr ON rr.id = e.dst),
           |labels AS (SELECT id, min(r) AS min_r FROM reach GROUP BY id),
           |$sqlQualityFeatureCte,
           |q AS (SELECT doc_id, $sqlQualityScore AS quality_score FROM f),
           |assign AS (
           |  SELECT d.doc_id, q.quality_score,
           |         COALESCE(least(l.min_r, d.doc_id), d.doc_id) AS cluster_id
           |  FROM documents d
           |  LEFT JOIN labels l ON l.id = d.doc_id
           |  JOIN q ON q.doc_id = d.doc_id),
           |ranked AS (
           |  SELECT doc_id, cluster_id, quality_score,
           |         row_number() OVER (PARTITION BY cluster_id
           |                            ORDER BY quality_score DESC, doc_id) AS rn
           |  FROM assign)
           |SELECT doc_id, cluster_id, quality_score, rn = 1 AS is_canonical
           |FROM ranked ORDER BY doc_id""".stripMargin,

      "q_mixture_balance" ->
        """WITH d AS (
          |  SELECT doc_id, source,
          |         CAST(len(list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')) AS BIGINT) AS n_tok
          |  FROM documents),
          |tot AS (SELECT source, sum(n_tok) AS total_tokens FROM d GROUP BY source),
          |b AS (SELECT min(total_tokens) AS budget FROM tot),
          |c AS (
          |  SELECT doc_id, source, n_tok,
          |         sum(n_tok) OVER (PARTITION BY source
          |                          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
          |                          ROWS UNBOUNDED PRECEDING) AS cum
          |  FROM d),
          |k AS (
          |  SELECT source, count(*) AS n_docs_kept, sum(n_tok) AS tokens_kept
          |  FROM c, b WHERE cum - n_tok < budget GROUP BY source)
          |SELECT k.source, n_docs_kept,
          |       CAST(k.tokens_kept AS BIGINT) AS tokens_kept,
          |       CAST(t.total_tokens AS BIGINT) AS total_tokens
          |FROM k JOIN tot t ON t.source = k.source
          |ORDER BY k.source""".stripMargin,

      "q_vocab_growth" ->
        """WITH mx AS (SELECT max(doc_id) AS m FROM documents),
          |toks AS (
          |  SELECT (doc_id * 10) // (m + 1) AS bucket,
          |         list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS l
          |  FROM documents, mx),
          |sh AS (
          |  SELECT bucket, unnest([array_to_string(l[i:i+2], ' ') for i in range(1, len(l) - 1)]) AS shingle
          |  FROM toks),
          |fb AS (SELECT shingle, min(bucket) AS first_bucket FROM sh GROUP BY shingle),
          |nb AS (SELECT first_bucket, count(*) AS new_terms FROM fb GROUP BY first_bucket)
          |SELECT first_bucket, new_terms,
          |       CAST(sum(new_terms) OVER (ORDER BY first_bucket ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_vocab
          |FROM nb ORDER BY first_bucket""".stripMargin,

      "q_asof_forward" ->
        """WITH d AS (
          |  SELECT user_id, date_trunc('day', ts) AS day, round(sum(value), 2) AS day_total
          |  FROM events GROUP BY 1, 2 HAVING day(date_trunc('day', ts)) % 3 = 0)
          |SELECT e.event_id, e.user_id,
          |       strftime(d.day, '%Y-%m-%d') AS asof_day, d.day_total
          |FROM events e ASOF LEFT JOIN d
          |  ON e.user_id = d.user_id AND e.ts <= d.day
          |ORDER BY event_id""".stripMargin,

      // both native ASOF directions recombined with the pandas tie
      // rule (backward wins at equal distance); distances compare as
      // epoch doubles, the same arithmetic the Spark side runs
      "q_asof_nearest" ->
        """WITH d AS (
          |  SELECT user_id, date_trunc('day', ts) AS day, round(sum(value), 2) AS day_total
          |  FROM events GROUP BY 1, 2 HAVING day(date_trunc('day', ts)) % 3 = 0),
          |b AS (
          |  SELECT e.event_id, e.user_id, e.ts, d.day AS bday, d.day_total AS btot
          |  FROM events e ASOF LEFT JOIN d ON e.user_id = d.user_id AND e.ts >= d.day),
          |f AS (
          |  SELECT e.event_id, d.day AS fday, d.day_total AS ftot
          |  FROM events e ASOF LEFT JOIN d ON e.user_id = d.user_id AND e.ts <= d.day)
          |SELECT b.event_id, b.user_id,
          |       CASE WHEN bday IS NOT NULL AND (fday IS NULL OR
          |                 epoch(ts) - epoch(bday) <= epoch(fday) - epoch(ts))
          |            THEN strftime(bday, '%Y-%m-%d') ELSE strftime(fday, '%Y-%m-%d') END AS asof_day,
          |       CASE WHEN bday IS NOT NULL AND (fday IS NULL OR
          |                 epoch(ts) - epoch(bday) <= epoch(fday) - epoch(ts))
          |            THEN btot ELSE ftot END AS day_total
          |FROM b JOIN f USING (event_id)
          |ORDER BY event_id""".stripMargin,

      // the oracle sees the table as a VIEW (no file path), so the
      // expected name is the testdata layout constant — the gate then
      // checks Spark's _metadata column surfaces exactly that basename
      // with the right per-file row accounting
      "q_file_metadata" ->
        """SELECT 'lineitem.parquet' AS file_name, count(*) AS n_rows,
          |       count(DISTINCT l_orderkey) AS n_orders
          |FROM lineitem ORDER BY file_name""".stripMargin,

      "q_range_lookup" ->
        """WITH bands AS (
          |  SELECT CAST(i AS INTEGER) AS band_id,
          |         i * 10000.0 AS lo, (i + 1) * 10000.0 AS hi
          |  FROM range(10) t(i))
          |SELECT band_id, count(*) AS n_rows,
          |       round(min(l_extendedprice), 2) AS min_price,
          |       round(max(l_extendedprice), 2) AS max_price
          |FROM lineitem l
          |LEFT JOIN bands b ON l.l_extendedprice >= b.lo AND l.l_extendedprice < b.hi
          |GROUP BY band_id ORDER BY band_id""".stripMargin,

      // bigram containment: same inverted-index CTE shape as
      // q_jaccard_pairs, ratios against EACH side's shingle count
      "q_containment" ->
        """WITH toks AS (
          |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS l
          |  FROM documents WHERE doc_id < 100),
          |sh AS (
          |  SELECT DISTINCT id, shingle FROM (
          |    SELECT doc_id AS id, unnest([array_to_string(l[i:i+1], ' ') for i in range(1, len(l))]) AS shingle
          |    FROM toks)),
          |sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id),
          |inter AS (
          |  SELECT a.id AS id1, b.id AS id2, count(*) AS n_inter
          |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id GROUP BY 1, 2)
          |SELECT id1, id2, n_inter,
          |       round(CAST(n_inter AS DOUBLE) / s1.n_sh, 6) AS c1,
          |       round(CAST(n_inter AS DOUBLE) / s2.n_sh, 6) AS c2,
          |       round(greatest(CAST(n_inter AS DOUBLE) / s1.n_sh,
          |                      CAST(n_inter AS DOUBLE) / s2.n_sh), 6) AS containment
          |FROM inter JOIN sizes s1 ON s1.id = id1 JOIN sizes s2 ON s2.id = id2
          |WHERE greatest(CAST(n_inter AS DOUBLE) / s1.n_sh,
          |               CAST(n_inter AS DOUBLE) / s2.n_sh) >= 0.25
          |ORDER BY id1, id2""".stripMargin,

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

      // purged expanding-window time-series CV: identical integer index
      // arithmetic on the distinct-day grid (test size = n_days // 6,
      // last fold absorbs the tail, 3-day embargo before each test)
      "q_ts_cv_folds" ->
        """WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events),
          |idx AS (SELECT d, row_number() OVER (ORDER BY d) - 1 AS i FROM days),
          |n AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM idx),
          |fb AS (
          |  SELECT fold, fold * (n_days // 6) AS test_lo,
          |         CASE WHEN fold = 5 THEN n_days - 1
          |              ELSE (fold + 1) * (n_days // 6) - 1 END AS test_hi,
          |         fold * (n_days // 6) - 3 - 1 AS train_hi
          |  FROM (SELECT unnest(range(1, 6)) AS fold) f, n),
          |lab AS (
          |  SELECT fb.fold, ev.d,
          |         CASE WHEN ev.i <= fb.train_hi THEN 'train'
          |              WHEN ev.i BETWEEN fb.test_lo AND fb.test_hi THEN 'test'
          |         END AS part
          |  FROM (SELECT idx.i, idx.d FROM events e
          |        JOIN idx ON CAST(e.ts AS DATE) = idx.d) ev
          |  CROSS JOIN fb)
          |SELECT fold,
          |       CAST(count(CASE WHEN part = 'train' THEN 1 END) AS BIGINT) AS n_train_rows,
          |       CAST(count(CASE WHEN part = 'test' THEN 1 END) AS BIGINT) AS n_test_rows,
          |       strftime(max(CASE WHEN part = 'train' THEN d END), '%Y-%m-%d') AS train_end,
          |       strftime(min(CASE WHEN part = 'test' THEN d END), '%Y-%m-%d') AS test_start,
          |       strftime(max(CASE WHEN part = 'test' THEN d END), '%Y-%m-%d') AS test_end
          |FROM lab GROUP BY fold ORDER BY fold""".stripMargin,

      // int8 quantization mirrored term-for-term: scale division, round,
      // exact integer dot, then (qdot * c.scale) * q.scale in the SAME
      // association order as the Spark column expression
      "q_quantized_topk" ->
        """WITH qz AS (
          |  SELECT vec_id,
          |         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale,
          |         CAST(embedding AS DOUBLE[]) AS v
          |  FROM embeddings),
          |q8 AS (
          |  SELECT vec_id, scale,
          |         CASE WHEN scale = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
          |              ELSE list_transform(v, x -> CAST(round(x / scale) AS BIGINT)) END AS q
          |  FROM qz),
          |s AS (
          |  SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
          |         CAST(list_sum([c.q[i] * p.q[i] for i in range(1, len(c.q) + 1)]) AS BIGINT) AS qdot,
          |         c.scale AS cs, p.scale AS ps
          |  FROM q8 c JOIN q8 p ON p.vec_id < 8 AND c.vec_id <> p.vec_id)
          |SELECT query_id,
          |       CAST(row_number() OVER (PARTITION BY query_id ORDER BY (qdot * cs) * ps DESC, neighbor_id) AS INTEGER) AS rank,
          |       neighbor_id, qdot, round((qdot * cs) * ps, 6) AS approx_dot
          |FROM s QUALIFY rank <= 3 ORDER BY query_id, rank""".stripMargin,

      "q_hard_negatives" ->
        """WITH b AS (
          |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings),
          |q AS (SELECT vec_id AS query_id, v AS qv, label AS q_label FROM b WHERE vec_id < 8),
          |s AS (
          |  SELECT query_id, c.vec_id AS neighbor_id, c.label AS n_label,
          |         list_cosine_similarity(c.v, qv) AS c
          |  FROM b c, q WHERE c.vec_id <> query_id AND c.label <> q_label)
          |SELECT query_id,
          |       CAST(row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS INTEGER) AS rank,
          |       neighbor_id, n_label, round(c, 6) AS cosine
          |FROM s QUALIFY rank <= 2 ORDER BY query_id, rank""".stripMargin,

      // the recursion fixes evaluation order; identical rounded daily
      // inputs => bit-equal EWMA on both engines
      "q_ewma" ->
        """WITH RECURSIVE daily AS (
          |  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
          |         round(sum(value), 2) AS day_total,
          |         CAST(row_number() OVER (PARTITION BY event_type ORDER BY date_trunc('day', ts)) AS INTEGER) AS rn
          |  FROM events GROUP BY 1, date_trunc('day', ts)),
          |ewma(event_type, day, day_total, rn, s) AS (
          |  SELECT event_type, day, day_total, rn, day_total FROM daily WHERE rn = 1
          |  UNION ALL
          |  SELECT d.event_type, d.day, d.day_total, d.rn,
          |         0.3 * d.day_total + 0.7 * w.s
          |  FROM ewma w JOIN daily d
          |    ON d.event_type = w.event_type AND d.rn = w.rn + 1)
          |SELECT event_type, day, day_total, round(s, 6) AS ewma
          |FROM ewma ORDER BY event_type, day""".stripMargin,

      // the chunked long-series form must equal the SEQUENTIAL fold to
      // round-6 (ForecastChunkedSpec gates the float-reassociation
      // tolerance on this exact grid), so it shares the recursive-CTE
      // oracle text with q_ewma
      "q_ewma_chunked" ->
        """WITH RECURSIVE daily AS (
          |  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
          |         round(sum(value), 2) AS day_total,
          |         CAST(row_number() OVER (PARTITION BY event_type ORDER BY date_trunc('day', ts)) AS INTEGER) AS rn
          |  FROM events GROUP BY 1, date_trunc('day', ts)),
          |ewma(event_type, day, day_total, rn, s) AS (
          |  SELECT event_type, day, day_total, rn, day_total FROM daily WHERE rn = 1
          |  UNION ALL
          |  SELECT d.event_type, d.day, d.day_total, d.rn,
          |         0.3 * d.day_total + 0.7 * w.s
          |  FROM ewma w JOIN daily d
          |    ON d.event_type = w.event_type AND d.rn = w.rn + 1)
          |SELECT event_type, day, day_total, round(s, 6) AS ewma
          |FROM ewma ORDER BY event_type, day""".stripMargin,

      "q_holt_chunked" ->
        """WITH RECURSIVE daily AS (
          |  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
          |         round(sum(value), 2) AS day_total,
          |         CAST(row_number() OVER (PARTITION BY event_type ORDER BY date_trunc('day', ts)) AS INTEGER) AS rn
          |  FROM events GROUP BY 1, date_trunc('day', ts)),
          |holt(event_type, day, day_total, rn, l, b) AS (
          |  SELECT event_type, day, day_total, rn, day_total, CAST(0.0 AS DOUBLE)
          |  FROM daily WHERE rn = 1
          |  UNION ALL
          |  SELECT d.event_type, d.day, d.day_total, d.rn,
          |         0.5 * d.day_total + 0.5 * (h.l + h.b),
          |         0.3 * ((0.5 * d.day_total + 0.5 * (h.l + h.b)) - h.l) + 0.7 * h.b
          |  FROM holt h JOIN daily d
          |    ON d.event_type = h.event_type AND d.rn = h.rn + 1)
          |SELECT event_type, day, day_total,
          |       round(l, 6) AS level, round(b, 6) AS trend,
          |       round(l + b, 6) AS forecast_next
          |FROM holt ORDER BY event_type, day""".stripMargin,

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

      "q_ann_recall" ->
        s"""WITH b AS (
           |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
           |         CAST(${sqlHyperplaneBucket("embedding")} AS INTEGER) AS bucket
           |  FROM embeddings),
           |q AS (SELECT vec_id, v, bucket FROM b WHERE vec_id < 8),
           |exact AS (
           |  SELECT query_id, neighbor_id FROM (
           |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           |           row_number() OVER (PARTITION BY q.vec_id
           |             ORDER BY list_cosine_similarity(c.v, q.v) DESC, c.vec_id) AS r
           |    FROM b c JOIN q ON c.vec_id <> q.vec_id) WHERE r <= 3),
           |ann AS (
           |  SELECT query_id, neighbor_id FROM (
           |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           |           row_number() OVER (PARTITION BY q.vec_id
           |             ORDER BY list_cosine_similarity(c.v, q.v) DESC, c.vec_id) AS r
           |    FROM b c JOIN q ON c.bucket = q.bucket AND c.vec_id <> q.vec_id) WHERE r <= 3),
           |hits AS (
           |  SELECT e.query_id, count(*) AS n_hit
           |  FROM exact e JOIN ann a ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
           |  GROUP BY 1)
           |SELECT q.vec_id AS query_id, COALESCE(h.n_hit, 0) AS n_hit,
           |       round(COALESCE(h.n_hit, 0) / 3.0, 6) AS recall_at_3
           |FROM q LEFT JOIN hits h ON h.query_id = q.vec_id
           |ORDER BY query_id""".stripMargin,

      // DuckDB has no VARIANT: the oracle extracts the same typed path
      // from the raw JSON; the Spark-side schema_of_variant rendering
      // is unit-asserted (VariantSpec), never oracle-gated
      "q_variant_extract" ->
        """SELECT event_type,
          |       count(*) AS n_events,
          |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
          |       min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_min,
          |       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max
          |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,

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

      // decimal constants are CAST to DOUBLE (DuckDB parses bare 0.5
      // as DECIMAL, which would run the tower in decimal arithmetic);
      // the float expression mirrors the Spark column op-for-op
      "q_bm25" -> (sqlBm25Cte +
        """
          |SELECT doc_id, count(*) AS n_terms_matched, round(sum(weight), 6) AS bm25
          |FROM w GROUP BY 1 ORDER BY doc_id""".stripMargin),

      "q_hybrid_rrf" -> (sqlBm25Cte +
        """,
          |scored AS (
          |  SELECT doc_id, round(sum(weight), 6) AS bm25 FROM w GROUP BY 1),
          |lexr AS (
          |  SELECT doc_id, CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS INTEGER) AS r_lex
          |  FROM scored QUALIFY r_lex <= 50),
          |bv AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
          |qv AS (SELECT v AS q FROM bv WHERE vec_id = 0),
          |vecscored AS (
          |  SELECT bv.vec_id AS doc_id, list_cosine_similarity(bv.v, q) AS c
          |  FROM bv, qv WHERE bv.vec_id <> 0),
          |vectop AS (
          |  SELECT doc_id, c FROM vecscored
          |  QUALIFY row_number() OVER (ORDER BY c DESC, doc_id) <= 50),
          |vecr AS (
          |  SELECT doc_id, CAST(row_number() OVER (ORDER BY round(c, 6) DESC, doc_id) AS INTEGER) AS r_vec
          |  FROM vectop)
          |SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id, r_lex, r_vec,
          |       round(COALESCE(CAST(1.0 AS DOUBLE) / (60 + r_lex), CAST(0.0 AS DOUBLE))
          |             + COALESCE(CAST(1.0 AS DOUBLE) / (60 + r_vec), CAST(0.0 AS DOUBLE)), 6) AS rrf
          |FROM lexr l FULL OUTER JOIN vecr v ON l.doc_id = v.doc_id
          |ORDER BY doc_id""".stripMargin),

      "q_oov_rate" ->
        s"""WITH tok AS (
           |  SELECT doc_id, unnest($sqlTokens) AS w FROM documents),
           |vocab AS (
           |  SELECT w FROM (
           |    SELECT w, count(*) AS c FROM tok GROUP BY w
           |    QUALIFY row_number() OVER (ORDER BY c DESC, w) <= 30))
           |SELECT doc_id, count(*) AS n_tokens,
           |       count(*) FILTER (WHERE v.w IS NULL) AS n_oov,
           |       round(CAST(count(*) FILTER (WHERE v.w IS NULL) AS DOUBLE) / count(*), 6) AS oov_rate
           |FROM tok LEFT JOIN vocab v ON tok.w = v.w
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

      "q_islands" ->
        """WITH slots AS (
          |  SELECT DISTINCT user_id, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS slot
          |  FROM events),
          |g AS (
          |  SELECT user_id, slot,
          |         slot - row_number() OVER (PARTITION BY user_id ORDER BY slot) AS grp
          |  FROM slots)
          |SELECT user_id, min(slot) AS island_start, max(slot) AS island_end,
          |       count(*) AS len_slots
          |FROM g GROUP BY user_id, grp
          |ORDER BY user_id, island_start""".stripMargin,

      "q_assoc_rules" ->
        """WITH bi AS (
          |  SELECT DISTINCT l_orderkey AS basket, l_suppkey AS item FROM lineitem),
          |freq AS (
          |  SELECT item, count(*) AS n_item FROM bi GROUP BY 1 HAVING count(*) >= 50),
          |total AS (SELECT count(DISTINCT basket) AS n_baskets FROM bi),
          |kept AS (SELECT bi.basket, bi.item FROM bi JOIN freq USING (item)),
          |pc AS (
          |  SELECT a.item AS item1, b.item AS item2, count(*) AS n_pair
          |  FROM kept a JOIN kept b ON a.basket = b.basket AND a.item < b.item
          |  GROUP BY 1, 2 HAVING count(*) >= 10)
          |SELECT item1, item2, n_pair, f1.n_item AS n1, f2.n_item AS n2,
          |       round(CAST(n_pair AS DOUBLE) / CAST(n_baskets AS DOUBLE), 6) AS support,
          |       round(CAST(n_pair AS DOUBLE) / CAST(f1.n_item AS DOUBLE), 6) AS conf_1to2,
          |       round(CAST(n_pair AS DOUBLE) / CAST(f2.n_item AS DOUBLE), 6) AS conf_2to1,
          |       round(CAST(n_pair AS DOUBLE) * CAST(n_baskets AS DOUBLE)
          |             / CAST(f1.n_item * f2.n_item AS DOUBLE), 6) AS lift
          |FROM pc JOIN freq f1 ON f1.item = pc.item1
          |        JOIN freq f2 ON f2.item = pc.item2
          |        CROSS JOIN total
          |ORDER BY item1, item2""".stripMargin,

      "q_item_cosine" ->
        """WITH bi AS (
          |  SELECT DISTINCT l_orderkey AS basket, l_suppkey AS item FROM lineitem),
          |freq AS (
          |  SELECT item, count(*) AS n_item FROM bi GROUP BY 1 HAVING count(*) >= 50),
          |kept AS (SELECT bi.basket, bi.item FROM bi JOIN freq USING (item)),
          |pc AS (
          |  SELECT a.item AS item1, b.item AS item2, count(*) AS n_pair
          |  FROM kept a JOIN kept b ON a.basket = b.basket AND a.item < b.item
          |  GROUP BY 1, 2 HAVING count(*) >= 10),
          |dirs AS (
          |  SELECT item1, item2, n_pair FROM pc
          |  UNION ALL SELECT item2, item1, n_pair FROM pc),
          |scored AS (
          |  SELECT item1, item2, n_pair,
          |         round(CAST(n_pair AS DOUBLE)
          |               / sqrt(CAST(f1.n_item * f2.n_item AS DOUBLE)), 6) AS cosine
          |  FROM dirs JOIN freq f1 ON f1.item = dirs.item1
          |            JOIN freq f2 ON f2.item = dirs.item2),
          |ranked AS (
          |  SELECT item1,
          |         CAST(row_number() OVER (PARTITION BY item1
          |                                 ORDER BY cosine DESC, item2) AS INTEGER) AS rank,
          |         item2, n_pair, cosine
          |  FROM scored)
          |SELECT item1, rank, item2, n_pair, cosine
          |FROM ranked WHERE rank <= 3 ORDER BY item1, rank""".stripMargin,

      "q_fd_audit" ->
        """WITH a AS (
          |  SELECT o_orderkey AS lhs,
          |         count(DISTINCT o_custkey)
          |           + max(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS n_rhs
          |  FROM orders WHERE o_orderkey IS NOT NULL GROUP BY 1),
          |b AS (
          |  SELECT o_custkey AS lhs,
          |         count(DISTINCT o_orderpriority)
          |           + max(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS n_rhs
          |  FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1),
          |c AS (
          |  SELECT l_orderkey AS lhs,
          |         count(DISTINCT l_returnflag)
          |           + max(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS n_rhs
          |  FROM lineitem WHERE l_orderkey IS NOT NULL GROUP BY 1),
          |d AS (
          |  SELECT c_nationkey AS lhs,
          |         count(DISTINCT c_mktsegment)
          |           + max(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS n_rhs
          |  FROM customer WHERE c_nationkey IS NOT NULL GROUP BY 1),
          |r AS (
          |  SELECT 'o_orderkey->o_custkey' AS fd, count(*) AS n_groups,
          |         count(*) FILTER (WHERE n_rhs > 1) AS n_violating,
          |         CAST(max(n_rhs) AS BIGINT) AS max_distinct_rhs FROM a
          |  UNION ALL
          |  SELECT 'o_custkey->o_orderpriority', count(*),
          |         count(*) FILTER (WHERE n_rhs > 1), CAST(max(n_rhs) AS BIGINT) FROM b
          |  UNION ALL
          |  SELECT 'l_orderkey->l_returnflag', count(*),
          |         count(*) FILTER (WHERE n_rhs > 1), CAST(max(n_rhs) AS BIGINT) FROM c
          |  UNION ALL
          |  SELECT 'c_nationkey->c_mktsegment', count(*),
          |         count(*) FILTER (WHERE n_rhs > 1), CAST(max(n_rhs) AS BIGINT) FROM d)
          |SELECT fd, n_groups, n_violating, max_distinct_rhs,
          |       (n_violating * 10000) // n_groups AS violation_bp
          |FROM r ORDER BY fd""".stripMargin,

      // staged pair→triple joins: a single 3-way join misplans on
      // DuckDB (inequality-first explosion)
      "q_itemsets3" ->
        """WITH bi AS (
          |  SELECT DISTINCT l_orderkey AS basket, l_suppkey AS item FROM lineitem),
          |freq AS (
          |  SELECT item FROM bi GROUP BY 1 HAVING count(*) >= 50),
          |total AS (SELECT count(DISTINCT basket) AS n_baskets FROM bi),
          |kept AS (SELECT bi.basket, bi.item FROM bi JOIN freq USING (item)),
          |pr AS (
          |  SELECT a.basket, a.item AS item1, b.item AS item2
          |  FROM kept a JOIN kept b ON a.basket = b.basket AND a.item < b.item),
          |tr AS (
          |  SELECT p.item1, p.item2, d.item AS item3, count(*) AS n_triple
          |  FROM pr p JOIN kept d ON p.basket = d.basket AND p.item2 < d.item
          |  GROUP BY 1, 2, 3 HAVING count(*) >= 2)
          |SELECT item1, item2, item3, n_triple,
          |       round(CAST(n_triple AS DOUBLE) / CAST(n_baskets AS DOUBLE), 6) AS support
          |FROM tr CROSS JOIN total
          |ORDER BY item1, item2, item3""".stripMargin,

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

      "q_funnel_delay" ->
        """WITH f AS (
          |  SELECT c.user_id % 10 AS cohort,
          |         epoch_us(p.ts) - epoch_us(c.ts) AS delay_us
          |  FROM events c JOIN events p ON c.user_id = p.user_id
          |  WHERE c.event_type = 'click' AND p.event_type = 'purchase'
          |    AND epoch(p.ts) - epoch(c.ts) BETWEEN 0 AND 600)
          |SELECT cohort,
          |       CAST(quantile_disc(delay_us, 0.5) AS BIGINT) AS p50_us,
          |       CAST(quantile_disc(delay_us, 0.9) AS BIGINT) AS p90_us
          |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,

      "q_pmi_cooccur" ->
        s"""WITH tok AS (
           |  SELECT doc_id, unnest($sqlTokens) AS term FROM documents),
           |bi AS (SELECT DISTINCT doc_id AS basket, term AS item FROM tok),
           |freq AS (
           |  SELECT item, count(*) AS n_item FROM bi GROUP BY 1 HAVING count(*) >= 20),
           |total AS (SELECT count(DISTINCT basket) AS n_docs FROM bi),
           |kept AS (SELECT bi.basket, bi.item FROM bi JOIN freq USING (item)),
           |pc AS (
           |  SELECT a.item AS item1, b.item AS item2, count(*) AS n_pair
           |  FROM kept a JOIN kept b ON a.basket = b.basket AND a.item < b.item
           |  GROUP BY 1, 2 HAVING count(*) >= 10)
           |SELECT item1 AS term1, item2 AS term2, n_pair,
           |       f1.n_item AS n1, f2.n_item AS n2,
           |       round(ln(CAST(n_pair AS DOUBLE) * CAST(n_docs AS DOUBLE)
           |                / CAST(f1.n_item * f2.n_item AS DOUBLE)), 6) AS pmi
           |FROM pc JOIN freq f1 ON f1.item = pc.item1
           |        JOIN freq f2 ON f2.item = pc.item2
           |        CROSS JOIN total
           |ORDER BY term1, term2""".stripMargin,

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
          |       round(mean0, 6) AS mean0, round(mean1, 6) AS mean1,
          |       round(mean1 - mean0, 6) AS mean_diff,
          |       round((mean1 - mean0) / sqrt(se0 + se1), 6) AS t_stat,
          |       round((se0 + se1) * (se0 + se1)
          |             / (se0 * se0 / CAST(n0 - 1 AS DOUBLE)
          |                + se1 * se1 / CAST(n1 - 1 AS DOUBLE)), 6) AS welch_df
          |FROM h ORDER BY event_type""".stripMargin,

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

      "q_pagerank" ->
        s"""WITH eb AS (
           |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
           |         CAST(${sqlHyperplaneBucket("embedding")} AS INTEGER) AS bucket
           |  FROM embeddings),
           |p AS (
           |  SELECT a.vec_id AS id1, bb.vec_id AS id2
           |  FROM eb a JOIN eb bb ON a.bucket = bb.bucket AND a.vec_id < bb.vec_id
           |  WHERE list_cosine_similarity(a.v, bb.v) >= 0.2),
           |e AS (SELECT id1 AS src, id2 AS dst FROM p
           |      UNION ALL SELECT id2, id1 FROM p),
           |deg AS (SELECT src, count(*) AS out_deg FROM e GROUP BY 1),
           |nodes AS (SELECT DISTINCT src AS id FROM e),
           |nn AS (SELECT count(*) AS n FROM nodes),
           |pr0 AS (SELECT id, CAST(1.0 AS DOUBLE) / n AS pr FROM nodes CROSS JOIN nn),
           |pr1 AS (
           |  SELECT nodes.id,
           |         CAST(0.15 AS DOUBLE) / nn.n
           |           + CAST(0.85 AS DOUBLE) * COALESCE(i1.inflow, CAST(0.0 AS DOUBLE)) AS pr
           |  FROM nodes CROSS JOIN nn
           |  LEFT JOIN (SELECT e.dst AS id, sum(pp.pr / CAST(d.out_deg AS DOUBLE)) AS inflow
           |             FROM e JOIN pr0 pp ON pp.id = e.src JOIN deg d ON d.src = e.src
           |             GROUP BY 1) i1 ON i1.id = nodes.id),
           |pr2 AS (
           |  SELECT nodes.id,
           |         CAST(0.15 AS DOUBLE) / nn.n
           |           + CAST(0.85 AS DOUBLE) * COALESCE(i2.inflow, CAST(0.0 AS DOUBLE)) AS pr
           |  FROM nodes CROSS JOIN nn
           |  LEFT JOIN (SELECT e.dst AS id, sum(pp.pr / CAST(d.out_deg AS DOUBLE)) AS inflow
           |             FROM e JOIN pr1 pp ON pp.id = e.src JOIN deg d ON d.src = e.src
           |             GROUP BY 1) i2 ON i2.id = nodes.id),
           |pr3 AS (
           |  SELECT nodes.id,
           |         CAST(0.15 AS DOUBLE) / nn.n
           |           + CAST(0.85 AS DOUBLE) * COALESCE(i3.inflow, CAST(0.0 AS DOUBLE)) AS pr
           |  FROM nodes CROSS JOIN nn
           |  LEFT JOIN (SELECT e.dst AS id, sum(pp.pr / CAST(d.out_deg AS DOUBLE)) AS inflow
           |             FROM e JOIN pr2 pp ON pp.id = e.src JOIN deg d ON d.src = e.src
           |             GROUP BY 1) i3 ON i3.id = nodes.id)
           |SELECT id, round(pr, 6) AS pr FROM pr3 ORDER BY id""".stripMargin,

      "q_bfs_hops" ->
        s"""WITH RECURSIVE ${sqlCoPurchaseCtes(2)},
           |seeds AS (SELECT DISTINCT src AS id FROM e WHERE src % 97 = 0),
           |walk(id, hop) AS (
           |  SELECT id, 0 AS hop FROM seeds
           |  UNION
           |  SELECT e.dst, w.hop + 1 FROM walk w JOIN e ON e.src = w.id
           |  WHERE w.hop < 4)
           |SELECT id, CAST(min(hop) AS INTEGER) AS hop
           |FROM walk GROUP BY id ORDER BY id""".stripMargin,

      "q_kcore" ->
        s"""WITH ${sqlCoPurchaseCtes(1)},
           |d1 AS (SELECT src FROM e GROUP BY src HAVING count(*) >= 90),
           |e1 AS (SELECT e.src, e.dst FROM e
           |       JOIN d1 a ON e.src = a.src JOIN d1 b ON e.dst = b.src),
           |d2 AS (SELECT src FROM e1 GROUP BY src HAVING count(*) >= 90),
           |e2 AS (SELECT e1.src, e1.dst FROM e1
           |       JOIN d2 a ON e1.src = a.src JOIN d2 b ON e1.dst = b.src),
           |d3 AS (SELECT src FROM e2 GROUP BY src HAVING count(*) >= 90),
           |e3 AS (SELECT e2.src, e2.dst FROM e2
           |       JOIN d3 a ON e2.src = a.src JOIN d3 b ON e2.dst = b.src)
           |SELECT src AS id, count(*) AS degree
           |FROM e3 GROUP BY src ORDER BY id""".stripMargin,

      // teleport mass pinned to the seeds; three unrolled rounds over
      // the same left-join spine as the Spark side
      "q_ppr" ->
        s"""WITH ${sqlCoPurchaseCtes(2)},
           |deg AS (SELECT src, count(*) AS out_deg FROM e GROUP BY 1),
           |nodes AS (SELECT DISTINCT src AS id FROM e),
           |seeds AS (SELECT DISTINCT src AS id FROM e WHERE src % 97 = 0),
           |ns AS (SELECT count(*) AS n FROM seeds),
           |tele AS (SELECT id, CAST(1.0 AS DOUBLE) / ns.n AS t FROM seeds CROSS JOIN ns),
           |pr0 AS (SELECT id, t AS pr FROM tele),
           |pr1 AS (
           |  SELECT nodes.id,
           |         CAST(0.15 AS DOUBLE) * COALESCE(tl.t, CAST(0.0 AS DOUBLE))
           |           + CAST(0.85 AS DOUBLE) * COALESCE(i1.inflow, CAST(0.0 AS DOUBLE)) AS pr
           |  FROM nodes LEFT JOIN tele tl ON tl.id = nodes.id
           |  LEFT JOIN (SELECT e.dst AS id, sum(pp.pr / CAST(d.out_deg AS DOUBLE)) AS inflow
           |             FROM e JOIN pr0 pp ON pp.id = e.src JOIN deg d ON d.src = e.src
           |             GROUP BY 1) i1 ON i1.id = nodes.id),
           |pr2 AS (
           |  SELECT nodes.id,
           |         CAST(0.15 AS DOUBLE) * COALESCE(tl.t, CAST(0.0 AS DOUBLE))
           |           + CAST(0.85 AS DOUBLE) * COALESCE(i2.inflow, CAST(0.0 AS DOUBLE)) AS pr
           |  FROM nodes LEFT JOIN tele tl ON tl.id = nodes.id
           |  LEFT JOIN (SELECT e.dst AS id, sum(pp.pr / CAST(d.out_deg AS DOUBLE)) AS inflow
           |             FROM e JOIN pr1 pp ON pp.id = e.src JOIN deg d ON d.src = e.src
           |             GROUP BY 1) i2 ON i2.id = nodes.id),
           |pr3 AS (
           |  SELECT nodes.id,
           |         CAST(0.15 AS DOUBLE) * COALESCE(tl.t, CAST(0.0 AS DOUBLE))
           |           + CAST(0.85 AS DOUBLE) * COALESCE(i3.inflow, CAST(0.0 AS DOUBLE)) AS pr
           |  FROM nodes LEFT JOIN tele tl ON tl.id = nodes.id
           |  LEFT JOIN (SELECT e.dst AS id, sum(pp.pr / CAST(d.out_deg AS DOUBLE)) AS inflow
           |             FROM e JOIN pr2 pp ON pp.id = e.src JOIN deg d ON d.src = e.src
           |             GROUP BY 1) i3 ON i3.id = nodes.id)
           |SELECT id, round(pr, 6) AS ppr FROM pr3 ORDER BY id""".stripMargin,

      // DIRECTED pair graph (no symmetrizing union), node spine
      // src ∪ dst, and the per-round dangling-mass scalar dg_i summed
      // over out-degree-0 sinks — three unrolled rounds mirroring
      // Graph.pageRankDirected term for term
      "q_pagerank_directed" ->
        """WITH p AS (
          |  SELECT a.l_partkey AS src, b.l_partkey AS dst
          |  FROM lineitem a JOIN lineitem b
          |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          |  GROUP BY 1, 2 HAVING count(*) >= 2),
          |e AS (SELECT src, dst FROM p),
          |deg AS (SELECT src, count(*) AS out_deg FROM e GROUP BY 1),
          |nodes AS (SELECT DISTINCT id FROM
          |  (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
          |nn AS (SELECT count(*) AS n FROM nodes),
          |nd AS (SELECT nodes.id, COALESCE(d.out_deg, 0) AS out_deg
          |       FROM nodes LEFT JOIN deg d ON d.src = nodes.id),
          |pr0 AS (SELECT id, out_deg, CAST(1.0 AS DOUBLE) / nn.n AS pr
          |        FROM nd CROSS JOIN nn),
          |dg0 AS (SELECT COALESCE(sum(pr), CAST(0.0 AS DOUBLE)) AS dm
          |        FROM pr0 WHERE out_deg = 0),
          |pr1 AS (
          |  SELECT nd.id, nd.out_deg,
          |         CAST(0.15 AS DOUBLE) / nn.n + CAST(0.85 AS DOUBLE) *
          |           (COALESCE(i1.inflow, CAST(0.0 AS DOUBLE)) + dg0.dm / nn.n) AS pr
          |  FROM nd CROSS JOIN nn CROSS JOIN dg0
          |  LEFT JOIN (SELECT e.dst AS id, sum(pp.pr / CAST(pp.out_deg AS DOUBLE)) AS inflow
          |             FROM e JOIN pr0 pp ON pp.id = e.src GROUP BY 1) i1
          |    ON i1.id = nd.id),
          |dg1 AS (SELECT COALESCE(sum(pr), CAST(0.0 AS DOUBLE)) AS dm
          |        FROM pr1 WHERE out_deg = 0),
          |pr2 AS (
          |  SELECT nd.id, nd.out_deg,
          |         CAST(0.15 AS DOUBLE) / nn.n + CAST(0.85 AS DOUBLE) *
          |           (COALESCE(i2.inflow, CAST(0.0 AS DOUBLE)) + dg1.dm / nn.n) AS pr
          |  FROM nd CROSS JOIN nn CROSS JOIN dg1
          |  LEFT JOIN (SELECT e.dst AS id, sum(pp.pr / CAST(pp.out_deg AS DOUBLE)) AS inflow
          |             FROM e JOIN pr1 pp ON pp.id = e.src GROUP BY 1) i2
          |    ON i2.id = nd.id),
          |dg2 AS (SELECT COALESCE(sum(pr), CAST(0.0 AS DOUBLE)) AS dm
          |        FROM pr2 WHERE out_deg = 0),
          |pr3 AS (
          |  SELECT nd.id, nd.out_deg,
          |         CAST(0.15 AS DOUBLE) / nn.n + CAST(0.85 AS DOUBLE) *
          |           (COALESCE(i3.inflow, CAST(0.0 AS DOUBLE)) + dg2.dm / nn.n) AS pr
          |  FROM nd CROSS JOIN nn CROSS JOIN dg2
          |  LEFT JOIN (SELECT e.dst AS id, sum(pp.pr / CAST(pp.out_deg AS DOUBLE)) AS inflow
          |             FROM e JOIN pr2 pp ON pp.id = e.src GROUP BY 1) i3
          |    ON i3.id = nd.id)
          |SELECT id, round(pr, 6) AS pr FROM pr3 ORDER BY id""".stripMargin,

      // integer-exact unnormalized HITS: two authority/hub rounds of
      // exact walk-count sums over the directed pair graph, one
      // max-normalization at the very end — mirrors Graph.hits term
      // for term (h0 ≡ 1 folds the first authority round into an
      // in-degree-style sum)
      "q_hits" ->
        s"""WITH ${sqlCoPurchaseCtes(2)},
           |de AS (SELECT src, dst FROM p),
           |nd AS (SELECT src AS id FROM de UNION SELECT dst AS id FROM de),
           |a1 AS (SELECT nd.id, COALESCE(x.a, 0) AS a FROM nd
           |       LEFT JOIN (SELECT dst AS id, count(*) AS a
           |                  FROM de GROUP BY 1) x ON x.id = nd.id),
           |h1 AS (SELECT nd.id, COALESCE(x.h, 0) AS h FROM nd
           |       LEFT JOIN (SELECT de.src AS id, sum(a1.a) AS h
           |                  FROM de JOIN a1 ON a1.id = de.dst GROUP BY 1) x
           |         ON x.id = nd.id),
           |a2 AS (SELECT nd.id, COALESCE(x.a, 0) AS a FROM nd
           |       LEFT JOIN (SELECT de.dst AS id, sum(h1.h) AS a
           |                  FROM de JOIN h1 ON h1.id = de.src GROUP BY 1) x
           |         ON x.id = nd.id),
           |h2 AS (SELECT nd.id, COALESCE(x.h, 0) AS h FROM nd
           |       LEFT JOIN (SELECT de.src AS id, sum(a2.a) AS h
           |                  FROM de JOIN a2 ON a2.id = de.dst GROUP BY 1) x
           |         ON x.id = nd.id),
           |mx AS (SELECT max(h2.h) AS mh, max(a2.a) AS ma
           |       FROM h2 JOIN a2 ON a2.id = h2.id)
           |SELECT h2.id,
           |       round(CAST(h2.h AS DOUBLE) / CAST(nullif(mx.mh, 0) AS DOUBLE), 6) AS hub,
           |       round(CAST(a2.a AS DOUBLE) / CAST(nullif(mx.ma, 0) AS DOUBLE), 6) AS auth
           |FROM h2 JOIN a2 ON a2.id = h2.id CROSS JOIN mx
           |ORDER BY h2.id""".stripMargin,

      // bounded-hop weighted shortest path: recursive walk carrying
      // exact integer path cost, capped at 4 hops, min per node —
      // exactly the set Bellman-Ford minimizes over after 4 relaxation
      // rounds. Weight w = 11 − min(m, 10) mirrors
      // coPurchaseWeightedPairs; edges symmetrized with the shared w.
      "q_sssp" ->
        """WITH RECURSIVE pw AS (
          |  SELECT a.l_partkey AS id1, b.l_partkey AS id2,
          |         11 - least(count(*), 10) AS w
          |  FROM lineitem a JOIN lineitem b
          |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          |  GROUP BY 1, 2 HAVING count(*) >= 2),
          |ew AS (SELECT id1 AS src, id2 AS dst, w FROM pw
          |       UNION ALL SELECT id2, id1, w FROM pw),
          |seeds AS (SELECT DISTINCT src AS id FROM ew WHERE src % 97 = 0),
          |walk(id, dist, hop) AS (
          |  SELECT id, CAST(0 AS BIGINT) AS dist, 0 AS hop FROM seeds
          |  UNION
          |  SELECT ew.dst, w2.dist + ew.w, w2.hop + 1
          |  FROM walk w2 JOIN ew ON ew.src = w2.id
          |  WHERE w2.hop < 4)
          |SELECT id, min(dist) AS dist
          |FROM walk GROUP BY id ORDER BY id""".stripMargin,

      // full recompute — the gate proves base+delta partial-state merge
      // over the JOIN view equals rescanning the whole fact
      "q_incr_join_view" ->
        """SELECT n_name, count(*) AS n_orders,
          |       CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
          |FROM orders JOIN customer ON o_custkey = c_custkey
          |JOIN nation ON c_nationkey = n_nationkey
          |GROUP BY 1 ORDER BY 1""".stripMargin,

      // degree-oriented triangle closure, staged exactly as the Spark
      // side: orient small→large by (deg, id), pair out-neighbors in
      // orientation order, close with a semi-join
      "q_transitivity" ->
        s"""WITH ${sqlCoPurchaseCtes(2)},
           |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
           |orient AS (
           |  SELECT e.src, e.dst, dd.deg AS ddst
           |  FROM e JOIN deg ds ON e.src = ds.src JOIN deg dd ON e.dst = dd.src
           |  WHERE ds.deg < dd.deg OR (ds.deg = dd.deg AND e.src < e.dst)),
           |wedge AS (
           |  SELECT a.dst AS v, b.dst AS w
           |  FROM orient a JOIN orient b ON a.src = b.src
           |  WHERE a.ddst < b.ddst OR (a.ddst = b.ddst AND a.dst < b.dst)),
           |tri AS (
           |  SELECT count(*) AS n_triangles
           |  FROM wedge WHERE EXISTS (
           |    SELECT 1 FROM orient o WHERE o.src = wedge.v AND o.dst = wedge.w)),
           |ow AS (SELECT CAST(sum(deg * (deg - 1)) / 2 AS BIGINT) AS n_wedges FROM deg)
           |SELECT n_triangles, n_wedges,
           |       round(3.0 * CAST(n_triangles AS DOUBLE) / CAST(n_wedges AS DOUBLE), 6)
           |         AS transitivity
           |FROM tri CROSS JOIN ow ORDER BY n_triangles""".stripMargin,

      "q_degree_assort" ->
        s"""WITH ${sqlCoPurchaseCtes(2)},
           |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
           |xy AS (
           |  SELECT dx.deg AS x, dy.deg AS y
           |  FROM e JOIN deg dx ON e.src = dx.src JOIN deg dy ON e.dst = dy.src),
           |s AS (
           |  SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
           |         CAST(sum(x * y) AS BIGINT) AS sxy,
           |         CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy
           |  FROM xy)
           |SELECT n AS n_edges,
           |       round((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
           |             / sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
           |                    * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))), 6)
           |         AS assortativity
           |FROM s ORDER BY n_edges""".stripMargin,

      "q_burstiness" ->
        """WITH g AS (
          |  SELECT user_id,
          |         (epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)) // 1000 AS g
          |  FROM events),
          |s AS (
          |  SELECT user_id, count(*) AS n_gaps, CAST(sum(g) AS BIGINT) AS sg,
          |         CAST(sum(g * g) AS BIGINT) AS sgg
          |  FROM g WHERE g IS NOT NULL GROUP BY 1 HAVING count(*) >= 20)
          |SELECT user_id, n_gaps,
          |       round(CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE), 6) AS mean_gap_ms,
          |       round(sqrt(CAST(sgg AS DOUBLE) / CAST(n_gaps AS DOUBLE)
          |                  - (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE))
          |                    * (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE))), 6) AS sd_gap_ms,
          |       round((sqrt(CAST(sgg AS DOUBLE) / CAST(n_gaps AS DOUBLE)
          |                   - (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE))
          |                     * (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE)))
          |              - CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE))
          |             / (sqrt(CAST(sgg AS DOUBLE) / CAST(n_gaps AS DOUBLE)
          |                     - (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE))
          |                       * (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE)))
          |                + CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE)), 6) AS burstiness
          |FROM s ORDER BY user_id""".stripMargin,

      "q_markov2" ->
        """WITH st AS (
          |  SELECT user_id, event_type AS t1,
          |         lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t2,
          |         lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t3
          |  FROM events),
          |c AS (
          |  SELECT t1, t2, t3, count(*) AS n
          |  FROM st WHERE t3 IS NOT NULL GROUP BY 1, 2, 3)
          |SELECT t1, t2, t3, n,
          |       CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY t1, t2) AS DOUBLE) AS p
          |FROM c ORDER BY t1, t2, t3""".stripMargin,

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

      "q_rfm" ->
        """WITH m AS (
          |  SELECT o_custkey,
          |         CAST(date_diff('day', max(o_orderdate), DATE '1998-12-31') AS INTEGER) AS recency_days,
          |         count(*) AS frequency,
          |         CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS monetary
          |  FROM orders GROUP BY 1),
          |bp AS (
          |  SELECT quantile_disc(recency_days, 0.2) AS r1, quantile_disc(recency_days, 0.4) AS r2,
          |         quantile_disc(recency_days, 0.6) AS r3, quantile_disc(recency_days, 0.8) AS r4,
          |         quantile_disc(frequency, 0.2) AS f1, quantile_disc(frequency, 0.4) AS f2,
          |         quantile_disc(frequency, 0.6) AS f3, quantile_disc(frequency, 0.8) AS f4,
          |         quantile_disc(monetary, 0.2) AS m1, quantile_disc(monetary, 0.4) AS m2,
          |         quantile_disc(monetary, 0.6) AS m3, quantile_disc(monetary, 0.8) AS m4
          |  FROM m),
          |b AS (
          |  SELECT o_custkey, recency_days, frequency, monetary,
          |         1 + CAST(recency_days > r1 AS INTEGER) + CAST(recency_days > r2 AS INTEGER)
          |           + CAST(recency_days > r3 AS INTEGER) + CAST(recency_days > r4 AS INTEGER) AS r_bucket,
          |         1 + CAST(frequency > f1 AS INTEGER) + CAST(frequency > f2 AS INTEGER)
          |           + CAST(frequency > f3 AS INTEGER) + CAST(frequency > f4 AS INTEGER) AS f_bucket,
          |         1 + CAST(monetary > m1 AS INTEGER) + CAST(monetary > m2 AS INTEGER)
          |           + CAST(monetary > m3 AS INTEGER) + CAST(monetary > m4 AS INTEGER) AS m_bucket
          |  FROM m CROSS JOIN bp)
          |SELECT o_custkey, recency_days, frequency, monetary,
          |       r_bucket, f_bucket, m_bucket,
          |       r_bucket * 100 + f_bucket * 10 + m_bucket AS rfm_code
          |FROM b ORDER BY o_custkey""".stripMargin,

      "q_seasonal_naive" ->
        """WITH q AS (
          |  SELECT o_orderpriority,
          |         CAST(year(o_orderdate) * 4 + quarter(o_orderdate) AS BIGINT) AS period,
          |         CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS y
          |  FROM orders GROUP BY 1, 2),
          |f AS (
          |  SELECT o_orderpriority, period, y,
          |         lag(y, 4) OVER (PARTITION BY o_orderpriority ORDER BY period) AS forecast
          |  FROM q)
          |SELECT o_orderpriority, period, y, forecast, abs(y - forecast) AS abs_err
          |FROM f WHERE forecast IS NOT NULL
          |ORDER BY o_orderpriority, period""".stripMargin,

      "q_forecast_backtest" ->
        """WITH q AS (
          |  SELECT o_orderpriority,
          |         CAST(year(o_orderdate) * 4 + quarter(o_orderdate) AS BIGINT) AS period,
          |         CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS y
          |  FROM orders GROUP BY 1, 2),
          |f AS (
          |  SELECT o_orderpriority, period, y,
          |         lag(y, 4) OVER (PARTITION BY o_orderpriority ORDER BY period) AS forecast
          |  FROM q)
          |SELECT o_orderpriority, count(*) AS n_eval,
          |       round(CAST(sum(abs(y - forecast)) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS mae,
          |       round(avg(CASE WHEN y <> 0
          |                      THEN CAST(abs(y - forecast) AS DOUBLE) / CAST(abs(y) AS DOUBLE) * 100
          |                 END), 6) AS mape_pct
          |FROM f WHERE forecast IS NOT NULL
          |GROUP BY 1 ORDER BY 1""".stripMargin,

      "q_bpe_merges" ->
        s"""WITH wc AS (
           |  SELECT w, count(*) AS n FROM (
           |    SELECT unnest($sqlTokens) AS w FROM documents)
           |  GROUP BY 1 HAVING length(w) >= 2),
           |pairs AS (
           |  SELECT unnest([substring(w, i, 2) for i in range(1, length(w))]) AS pair, n
           |  FROM wc)
           |SELECT pair, CAST(sum(n) AS BIGINT) AS n_pair
           |FROM pairs GROUP BY 1
           |ORDER BY n_pair DESC, pair LIMIT 20""".stripMargin,

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

      "q_source_overlap" ->
        """WITH sf AS (
          |  SELECT DISTINCT source AS src, md5(substring(text, 1, 20)) AS fp
          |  FROM documents),
          |ps AS (SELECT src, count(*) AS n_fp FROM sf GROUP BY 1),
          |ov AS (
          |  SELECT a.src AS source1, b.src AS source2, count(*) AS n_shared
          |  FROM sf a JOIN sf b ON a.fp = b.fp AND a.src < b.src
          |  GROUP BY 1, 2)
          |SELECT source1, source2, n_shared, p1.n_fp AS n1, p2.n_fp AS n2,
          |       round(CAST(n_shared AS DOUBLE) / CAST(p1.n_fp + p2.n_fp - n_shared AS DOUBLE), 6) AS jaccard
          |FROM ov JOIN ps p1 ON p1.src = ov.source1
          |        JOIN ps p2 ON p2.src = ov.source2
          |ORDER BY source1, source2""".stripMargin,

      "q_random_projection" -> {
        val planes = Similarity.defaultPlanes(dim = 64, nPlanes = 8, seed = 7L)
        val inv = 1.0 / math.sqrt(8.0)
        val pDefs = planes.zipWithIndex.map { case (pl, i) =>
          s"round((${sqlPlaneDot(pl, "embedding")}) * $inv, 6) AS p$i"
        }.mkString(",\n         ")
        val pNames = (0 until 8).map(i => s"p$i").mkString(", ")
        val sumSq = (0 until 8).map(i => s"p$i * p$i").reduce((a, b) => s"$a + $b")
        s"""WITH v AS (
           |  SELECT vec_id,
           |         round(sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
           |                                       CAST(embedding AS DOUBLE[]))), 6) AS nrm,
           |         $pDefs
           |  FROM embeddings)
           |SELECT vec_id, $pNames,
           |       CASE WHEN nrm = 0.0 THEN NULL
           |            ELSE round(sqrt($sumSq) / nrm, 6) END AS distortion
           |FROM v ORDER BY vec_id""".stripMargin
      },

      "q_inverted_index" ->
        s"""WITH toks AS (
           |  SELECT doc_id, $sqlTokens AS l FROM documents),
           |p AS (
           |  SELECT doc_id, unnest([{'term': l[i], 'pos': i - 1} for i in range(1, len(l) + 1)]) AS u
           |  FROM toks),
           |pd AS (
           |  SELECT u.term AS term, doc_id, count(*) AS tf,
           |         list(u.pos ORDER BY u.pos) AS positions
           |  FROM p GROUP BY 1, 2),
           |idx AS (
           |  SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf,
           |         to_json(list({'doc_id': doc_id, 'tf': tf, 'positions': positions}
           |                      ORDER BY doc_id)) AS postings
           |  FROM pd GROUP BY 1)
           |SELECT term, df, cf, postings FROM idx
           |WHERE df BETWEEN 5 AND 1000 ORDER BY term""".stripMargin,

      "q_attribution" ->
        """WITH e AS (
          |  SELECT user_id, epoch_us(ts) AS t, event_type AS ch,
          |         event_type = 'purchase' AS conv,
          |         event_type IN ('view', 'click') AS touch
          |  FROM events),
          |a AS (
          |  SELECT conv,
          |         max(CASE WHEN touch THEN {'t': t, 'ch': ch} END)
          |           OVER (PARTITION BY user_id ORDER BY t
          |                 RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS attr
          |  FROM e)
          |SELECT coalesce(attr.ch, 'direct') AS channel, count(*) AS n_conversions
          |FROM a WHERE conv GROUP BY 1 ORDER BY 1""".stripMargin,

      // ORDER BY ts, event_type: the Spark side sorts (ts, event_type)
      // structs, so equal-ts events must tie-break identically here
      "q_session_paths" ->
        """WITH p AS (
          |  SELECT user_id,
          |         array_to_string(list(event_type ORDER BY ts, event_type)[1:3], '>') AS path
          |  FROM events GROUP BY 1)
          |SELECT path, count(*) AS n_users FROM p GROUP BY 1
          |ORDER BY n_users DESC, path LIMIT 20""".stripMargin,

      "q_join_size" ->
        """WITH a AS (SELECT l_orderkey AS k, count(*) AS na FROM lineitem GROUP BY 1),
          |b AS (SELECT o_orderkey AS k, count(*) AS nb FROM orders GROUP BY 1)
          |SELECT CAST(sum(na * nb) AS BIGINT) AS join_rows,
          |       count(*) AS n_shared_keys,
          |       CAST(max(na * nb) AS BIGINT) AS max_key_rows
          |FROM a JOIN b USING (k) ORDER BY join_rows""".stripMargin,

      "q_temporal_join" ->
        """WITH ev AS (
          |  SELECT user_id, ts, CAST(floor(value / 25) AS BIGINT) AS tier, event_type
          |  FROM events),
          |chg AS (
          |  SELECT user_id, ts, tier,
          |         CASE WHEN tier IS NOT DISTINCT FROM lag(tier) OVER w THEN 0 ELSE 1 END AS c
          |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
          |runs AS (
          |  SELECT user_id, ts, tier,
          |         sum(c) OVER (PARTITION BY user_id ORDER BY ts
          |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS version
          |  FROM chg),
          |d0 AS (
          |  SELECT user_id, version, min(tier) AS tier, min(ts) AS valid_from
          |  FROM runs GROUP BY 1, 2),
          |d AS (
          |  SELECT user_id, version, tier, valid_from,
          |         lead(valid_from) OVER (PARTITION BY user_id ORDER BY version) AS valid_to
          |  FROM d0),
          |f AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase')
          |SELECT d.tier, count(*) AS n_purchases,
          |       count(DISTINCT f.user_id) AS n_users
          |FROM f JOIN d ON f.user_id = d.user_id
          |             AND f.ts >= d.valid_from
          |             AND (d.valid_to IS NULL OR f.ts < d.valid_to)
          |GROUP BY 1 ORDER BY 1""".stripMargin,

      // each column renders length-prefixed (`<len>:<value>`, NULL →
      // 'N') before the '|' join — mirrors ScaleOps.tableChecksum's
      // self-delimiting render exactly
      "q_table_checksum" ->
        """WITH r AS (
          |  SELECT COALESCE(concat(CAST(length(CAST(l_orderkey AS VARCHAR)) AS VARCHAR), ':',
          |                         CAST(l_orderkey AS VARCHAR)), 'N') AS c1,
          |         COALESCE(concat(CAST(length(CAST(l_linenumber AS VARCHAR)) AS VARCHAR), ':',
          |                         CAST(l_linenumber AS VARCHAR)), 'N') AS c2,
          |         COALESCE(concat(CAST(length(CAST(CAST(floor(l_quantity) AS BIGINT) AS VARCHAR)) AS VARCHAR), ':',
          |                         CAST(CAST(floor(l_quantity) AS BIGINT) AS VARCHAR)), 'N') AS c3,
          |         COALESCE(concat(CAST(length(l_returnflag) AS VARCHAR), ':', l_returnflag), 'N') AS c4,
          |         COALESCE(concat(CAST(length(strftime(l_shipdate, '%Y-%m-%d')) AS VARCHAR), ':',
          |                         strftime(l_shipdate, '%Y-%m-%d')), 'N') AS c5
          |  FROM lineitem),
          |h AS (
          |  SELECT CAST(concat('0x', substring(md5(concat_ws('|', c1, c2, c3, c4, c5)), 1, 15)) AS BIGINT) AS rh
          |  FROM r)
          |SELECT count(*) AS n_rows, bit_xor(rh) AS xor_checksum,
          |       min(rh) AS min_hash, max(rh) AS max_hash
          |FROM h ORDER BY n_rows""".stripMargin,

      "q_survival" ->
        """WITH life AS (
          |  SELECT user_id,
          |         CAST(floor((epoch_us(max(ts)) - epoch_us(min(ts))) / 86400000000) AS BIGINT) AS d
          |  FROM events GROUP BY 1),
          |g AS (SELECT d, count(*) AS deaths FROM life GROUP BY 1),
          |r AS (
          |  SELECT d, deaths,
          |         sum(deaths) OVER () - sum(deaths) OVER w + deaths AS n_risk
          |  FROM g
          |  WINDOW w AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
          |s AS (
          |  SELECT d, n_risk, deaths,
          |         CASE WHEN deaths = n_risk THEN 0.0
          |              ELSE round(exp(sum(CASE WHEN deaths < n_risk
          |                         THEN ln(1.0 - CAST(deaths AS DOUBLE) / CAST(n_risk AS DOUBLE)) END)
          |                   OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
          |         END AS survival
          |  FROM r)
          |SELECT d, CAST(n_risk AS BIGINT) AS n_risk, deaths, survival
          |FROM s ORDER BY d""".stripMargin,

      "q_twap" ->
        """WITH e AS (
          |  SELECT user_id AS k, epoch_us(ts) AS t,
          |         max(CAST(round(value * 100) AS BIGINT)) AS v
          |  FROM events GROUP BY 1, 2),
          |l AS (
          |  SELECT k, t, v, lead(t) OVER (PARTITION BY k ORDER BY t) AS tn
          |  FROM e),
          |a AS (
          |  SELECT k, count(*) AS n_obs,
          |         CAST(sum((tn - t) * v) AS BIGINT) AS vw,
          |         CAST(sum(tn - t) AS BIGINT) AS dur
          |  FROM l WHERE tn IS NOT NULL GROUP BY 1)
          |SELECT k AS user_id, n_obs,
          |       round(CAST(vw AS DOUBLE) / CAST(dur AS DOUBLE) / 100.0, 6) AS twap
          |FROM a ORDER BY user_id""".stripMargin,

      "q_linkage" -> {
        def wa(m: Double, u: Double) = math.log(m / u)
        def wd(m: Double, u: Double) = math.log((1.0 - m) / (1.0 - u))
        // the same Möbius-over-group-sizes form as the engine: A(T) =
        // pairs agreeing on at least T, patterns by inclusion-exclusion
        s"""WITH c AS (
           |  SELECT c_custkey, c_nationkey, c_mktsegment,
           |         right(c_name, 1) AS sfx,
           |         CAST(floor(c_acctbal / 1000) AS BIGINT) AS balk
           |  FROM customer),
           |a00 AS (SELECT CAST(coalesce(sum((n * (n - 1)) // 2), 0) AS BIGINT) AS a
           |        FROM (SELECT count(*) AS n FROM c GROUP BY c_nationkey, c_mktsegment)),
           |a10 AS (SELECT CAST(coalesce(sum((n * (n - 1)) // 2), 0) AS BIGINT) AS a
           |        FROM (SELECT count(*) AS n FROM c GROUP BY c_nationkey, c_mktsegment, balk)),
           |a01 AS (SELECT CAST(coalesce(sum((n * (n - 1)) // 2), 0) AS BIGINT) AS a
           |        FROM (SELECT count(*) AS n FROM c GROUP BY c_nationkey, c_mktsegment, sfx)),
           |a11 AS (SELECT CAST(coalesce(sum((n * (n - 1)) // 2), 0) AS BIGINT) AS a
           |        FROM (SELECT count(*) AS n FROM c GROUP BY c_nationkey, c_mktsegment, balk, sfx)),
           |pat AS (
           |  SELECT round(${wd(0.3, 0.05)} + ${wd(0.9, 0.1)}, 6) AS score,
           |         (SELECT a FROM a00) - (SELECT a FROM a10)
           |           - (SELECT a FROM a01) + (SELECT a FROM a11) AS n_pairs
           |  UNION ALL
           |  SELECT round(${wa(0.3, 0.05)} + ${wd(0.9, 0.1)}, 6),
           |         (SELECT a FROM a10) - (SELECT a FROM a11)
           |  UNION ALL
           |  SELECT round(${wd(0.3, 0.05)} + ${wa(0.9, 0.1)}, 6),
           |         (SELECT a FROM a01) - (SELECT a FROM a11)
           |  UNION ALL
           |  SELECT round(${wa(0.3, 0.05)} + ${wa(0.9, 0.1)}, 6),
           |         (SELECT a FROM a11))
           |SELECT score, score >= 1.0 AS is_link, CAST(n_pairs AS BIGINT) AS n_pairs
           |FROM pat WHERE n_pairs > 0 ORDER BY 1""".stripMargin
      },

      "q_attribution_linear" ->
        """WITH e AS (
          |  SELECT user_id AS k, epoch_us(ts) AS t, event_type AS ch,
          |         event_type = 'purchase' AS conv,
          |         event_type IN ('view', 'click') AS touch
          |  FROM events),
          |c AS (SELECT k, t AS ct FROM e WHERE conv),
          |tt AS (SELECT k, t AS tt, ch FROM e WHERE touch),
          |cr AS (
          |  SELECT c.k, c.ct, tt.ch FROM c JOIN tt
          |    ON c.k = tt.k AND tt.tt < c.ct AND c.ct - tt.tt <= 3600000000),
          |pc AS (SELECT k, ct, count(*) AS n FROM cr GROUP BY 1, 2),
          |by_ch AS (
          |  SELECT cr.ch, CAST(sum(1000000000 // pc.n) AS BIGINT) AS credit_ppb,
          |         count(*) AS n_touches
          |  FROM cr JOIN pc ON cr.k = pc.k AND cr.ct = pc.ct
          |  GROUP BY 1),
          |direct AS (
          |  SELECT 'direct' AS ch,
          |         CAST(count(*) * 1000000000 AS BIGINT) AS credit_ppb,
          |         CAST(0 AS BIGINT) AS n_touches
          |  FROM c WHERE NOT EXISTS (
          |    SELECT 1 FROM cr WHERE cr.k = c.k AND cr.ct = c.ct)
          |  HAVING count(*) > 0),
          |u AS (SELECT * FROM by_ch UNION ALL SELECT * FROM direct)
          |SELECT ch AS channel,
          |       round(CAST(credit_ppb AS DOUBLE) / 1e9, 6) AS credit,
          |       n_touches
          |FROM u ORDER BY channel""".stripMargin,

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

      // the stream's final per-key state must equal the batch groupBy
      "q_stream_stateful_totals" ->
        """SELECT user_id, count(*) AS n_purchases,
          |       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
          |FROM events WHERE event_type = 'purchase'
          |GROUP BY 1 ORDER BY user_id""".stripMargin,

      // running-total next-fit binning; exact integer cumulative sums
      "q_compaction_plan" ->
        """WITH c AS (
          |  SELECT doc_id, n_chars,
          |         COALESCE(CAST(sum(n_chars) OVER (ORDER BY doc_id ROWS BETWEEN
          |           UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cb
          |  FROM documents)
          |SELECT CAST(floor(cb / 65536.0) AS BIGINT) AS bin,
          |       count(*) AS n_files, CAST(sum(n_chars) AS BIGINT) AS bytes,
          |       min(doc_id) AS first_id, max(doc_id) AS last_id
          |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,

      // same brute-force assignment CTE as q_ivf_assign (only the
      // argmax is consumed), then exact counts into one PSI tower per
      // centroid
      "q_embed_drift" ->
        """WITH e AS (
          |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
          |c AS (SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id < 4),
          |s AS (
          |  SELECT e.vec_id, centroid_id,
          |         row_number() OVER (PARTITION BY e.vec_id
          |                            ORDER BY list_cosine_similarity(v, cv) DESC,
          |                                     centroid_id) AS rn
          |  FROM e, c),
          |a AS (SELECT vec_id, centroid_id FROM s WHERE rn = 1),
          |counts AS (
          |  SELECT centroid_id,
          |         CAST(count(CASE WHEN vec_id % 2 = 0 THEN 1 END) AS BIGINT) AS c_ref,
          |         CAST(count(CASE WHEN vec_id % 2 = 1 THEN 1 END) AS BIGINT) AS c_cur
          |  FROM a GROUP BY 1),
          |tot AS (SELECT CAST(sum(c_ref) AS BIGINT) AS n_ref,
          |               CAST(sum(c_cur) AS BIGINT) AS n_cur FROM counts)
          |SELECT centroid_id, c_ref, c_cur,
          |       round((greatest(CAST(c_cur AS DOUBLE) / n_cur, 1e-6) -
          |              greatest(CAST(c_ref AS DOUBLE) / n_ref, 1e-6)) *
          |             ln(greatest(CAST(c_cur AS DOUBLE) / n_cur, 1e-6) /
          |                greatest(CAST(c_ref AS DOUBLE) / n_ref, 1e-6)), 6) AS psi_term
          |FROM counts, tot ORDER BY centroid_id""".stripMargin,

      // doubled midranks keep every aggregate an exact long; the
      // halving happens in the final float tower (x.5 is IEEE-exact)
      "q_mann_whitney" ->
        """WITH cells AS (
          |  SELECT CAST(floor(value * 100) AS BIGINT) AS v,
          |         CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
          |         CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
          |  FROM events GROUP BY 1),
          |c2 AS (
          |  SELECT c0, c1, c0 + c1 AS cnt,
          |         COALESCE(CAST(sum(c0 + c1) OVER (ORDER BY v ROWS BETWEEN
          |           UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cb
          |  FROM cells),
          |s AS (
          |  SELECT CAST(sum(c0) AS BIGINT) AS n0, CAST(sum(c1) AS BIGINT) AS n1,
          |         CAST(sum(c1 * (2*cb + cnt + 1)) AS BIGINT) AS r2,
          |         CAST(sum(cnt*cnt*cnt - cnt) AS BIGINT) AS t3
          |  FROM c2)
          |SELECT n0, n1,
          |       CAST(r2 - n1*(n1+1) AS DOUBLE) / 2.0 AS u1,
          |       round(CAST(r2 - n1*(n1+1) AS DOUBLE) /
          |             (2.0 * CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)), 6) AS auc,
          |       CASE WHEN CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE) / 12.0 *
          |                 (CAST(n0 + n1 + 1 AS DOUBLE) - CAST(t3 AS DOUBLE) /
          |                  (CAST(n0 + n1 AS DOUBLE) * CAST(n0 + n1 - 1 AS DOUBLE))) > 0
          |            THEN round(CAST((r2 - n1*(n1+1)) - n0*n1 AS DOUBLE) / 2.0 /
          |                 sqrt(CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE) / 12.0 *
          |                      (CAST(n0 + n1 + 1 AS DOUBLE) - CAST(t3 AS DOUBLE) /
          |                       (CAST(n0 + n1 AS DOUBLE) * CAST(n0 + n1 - 1 AS DOUBLE)))), 6)
          |       END AS z
          |FROM s ORDER BY n0""".stripMargin,

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

      // integer power sums with N²-cleared denominators: one division
      // per lag over identical longs (Inference.autocorr scaladoc)
      "q_autocorr" -> {
        val lagCols = (1 to 7).map(k => s"lag(y, $k) OVER w AS y$k").mkString(", ")
        val sumCols = (1 to 7).map(k =>
          s"CAST(count(y$k) AS BIGINT) AS c$k, CAST(sum(y*y$k) AS BIGINT) AS sab$k, " +
          s"CAST(sum(CASE WHEN y$k IS NOT NULL THEN y END) AS BIGINT) AS sa$k, " +
          s"CAST(sum(y$k) AS BIGINT) AS sb$k").mkString(", ")
        val rows = (1 to 7).map(k =>
          s"""SELECT CAST($k AS INTEGER) AS "lag", c$k AS n_pairs,
             |  round(CAST(n*n*sab$k - n*s*(sa$k + sb$k) + c$k*s*s AS DOUBLE) /
             |        CAST(n*(n*ss - s*s) AS DOUBLE), 6) AS acf FROM t""".stripMargin)
          .mkString("\n", "\nUNION ALL\n", "\n")
        s"""WITH days AS (
           |  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           |         count(*)::BIGINT AS y
           |  FROM events GROUP BY 1),
           |l AS (SELECT y, $lagCols FROM days WINDOW w AS (ORDER BY day)),
           |t AS (SELECT count(*)::BIGINT AS n, CAST(sum(y) AS BIGINT) AS s,
           |             CAST(sum(y*y) AS BIGINT) AS ss, $sumCols FROM l)
           |$rows
           |ORDER BY "lag"""".stripMargin
      },

      // exact-integer argmax of the N-scaled cumulative deviation with
      // a total (|stat| desc, day asc) tie-break
      "q_changepoint" ->
        """WITH days AS (
          |  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
          |         CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
          |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
          |c AS (
          |  SELECT day, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
          |         CAST(sum(cents) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
          |                               AND CURRENT ROW) AS BIGINT) AS st
          |  FROM days),
          |tot AS (SELECT count(*)::BIGINT AS n, CAST(sum(cents) AS BIGINT) AS s FROM days)
          |SELECT day, t, n, n*st - t*s AS cusum_n,
          |       round(CAST(n*st - t*s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_dev
          |FROM c, tot
          |ORDER BY abs(n*st - t*s) DESC, day LIMIT 1""".stripMargin,

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

      // same tokenize-once + list-slice shingling as q_top_ngrams,
      // widened to 8-gram spans with a distinct-doc floor
      "q_dup_spans" ->
        """WITH toks AS (
          |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS l
          |  FROM documents),
          |sh AS (
          |  SELECT doc_id, unnest([array_to_string(l[i:i+7], ' ') for i in range(1, len(l) - 6)]) AS span
          |  FROM toks)
          |SELECT span, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occur
          |FROM sh GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
          |ORDER BY n_docs DESC, n_occur DESC, span LIMIT 30""".stripMargin,

      // the bucketed tables reproduce orders/lineitem exactly, so the
      // oracle joins the originals; co-location is a plan property
      // (PlanSpec), not a value property
      "q_bucket_join" ->
        """SELECT o_orderpriority, count(*) AS n_items,
          |       CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
          |       CAST(sum(CAST(floor(l_extendedprice) AS BIGINT)) AS BIGINT) AS sum_price
          |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          |GROUP BY 1 ORDER BY 1""".stripMargin,

      // the DSv2 round-trip reproduces lineitem exactly, so the oracle
      // aggregates the original table directly
      "q_dsv2_scan" ->
        """SELECT l_returnflag AS rflag,
          |       count(*) AS n,
          |       CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
          |       strftime(min(l_shipdate), '%Y-%m-%d') AS min_sdate,
          |       count(DISTINCT l_orderkey) AS n_orders
          |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

      // median-of-pairwise-slopes over the daily grid; the median is a
      // picked value under the (slope, x1, x2) total order — drift-free
      "q_theil_sen" ->
        """WITH grid AS (
          |  SELECT event_type,
          |         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
          |         CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS y
          |  FROM events GROUP BY 1, 2),
          |pairs AS (
          |  SELECT a.event_type, a.x AS x1, b.x AS x2,
          |         CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS slope
          |  FROM grid a JOIN grid b
          |    ON a.event_type = b.event_type AND a.x < b.x),
          |ranked AS (
          |  SELECT event_type, x1, x2, slope,
          |         row_number() OVER (PARTITION BY event_type
          |                            ORDER BY slope, x1, x2) AS rn,
          |         count(*) OVER (PARTITION BY event_type) AS np
          |  FROM pairs)
          |SELECT event_type, CAST(np AS BIGINT) AS n_pairs,
          |       round(slope, 6) AS ts_slope
          |FROM ranked WHERE rn = (np + 1) // 2
          |ORDER BY event_type""".stripMargin,

      // Mann–Kendall on the identical daily-cents grid; DuckDB's
      // integer // truncates toward zero exactly like Spark's div
      "q_mann_kendall" ->
        """WITH grid AS (
          |  SELECT event_type,
          |         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
          |         CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS y
          |  FROM events GROUP BY 1, 2),
          |p AS (
          |  SELECT a.event_type,
          |         CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END AS sgn
          |  FROM grid a JOIN grid b
          |    ON a.event_type = b.event_type AND a.x < b.x),
          |s AS (SELECT event_type, CAST(sum(sgn) AS BIGINT) AS s_stat,
          |             CAST(count(*) AS BIGINT) AS n_pairs
          |      FROM p GROUP BY 1),
          |n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_points
          |      FROM grid GROUP BY 1)
          |SELECT n.event_type, n.n_points, s.s_stat,
          |       (s.s_stat * 1000000000) // s.n_pairs AS tau_ppb,
          |       CASE WHEN s.s_stat > 0 THEN 'increasing'
          |            WHEN s.s_stat < 0 THEN 'decreasing' ELSE 'none' END AS trend
          |FROM n JOIN s USING (event_type) ORDER BY event_type""".stripMargin,

      // six exact-long moment sums per lag, one IEEE double tower per
      // row — the crossCorr determinism contract; lead() mirrors
      // Spark's, lag 0 is the column itself in both engines
      "q_xcorr_lag" -> {
        val leadCols = (1 to 7).map(k => s"lead(y, $k) OVER w AS y$k")
          .mkString(", ")
        val sumCols = (0 to 7).map { k =>
          val yk = if (k == 0) "y" else s"y$k"
          s"CAST(count($yk) AS BIGINT) AS c$k, " +
          s"CAST(sum(CASE WHEN $yk IS NOT NULL THEN x END) AS BIGINT) AS sx$k, " +
          s"CAST(sum(CASE WHEN $yk IS NOT NULL THEN x*x END) AS BIGINT) AS sxx$k, " +
          s"CAST(sum($yk) AS BIGINT) AS sy$k, " +
          s"CAST(sum($yk*$yk) AS BIGINT) AS syy$k, " +
          s"CAST(sum(x*$yk) AS BIGINT) AS sxy$k"
        }.mkString(", ")
        val rows = (0 to 7).map(k =>
          s"""SELECT CAST($k AS INTEGER) AS "lag", c$k AS n_pairs,
             |  CASE WHEN c$k*sxx$k - sx$k*sx$k > 0 AND c$k*syy$k - sy$k*sy$k > 0
             |  THEN round(CAST(c$k*sxy$k - sx$k*sy$k AS DOUBLE) /
             |             sqrt(CAST(c$k*sxx$k - sx$k*sx$k AS DOUBLE) *
             |                  CAST(c$k*syy$k - sy$k*sy$k AS DOUBLE)), 6)
             |  END AS xcf FROM t""".stripMargin)
          .mkString("\n", "\nUNION ALL\n", "\n")
        s"""WITH days AS (
           |  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           |         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS x,
           |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y
           |  FROM events GROUP BY 1),
           |l AS (SELECT day, x, y, $leadCols FROM days WINDOW w AS (ORDER BY day)),
           |t AS (SELECT $sumCols FROM l)
           |SELECT * FROM ($rows) ORDER BY "lag"""".stripMargin
      },

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

      // the same 7 max-relaxation steps the engine's fixpoint loop
      // converges in (band-DAG depth < 8), unrolled
      "q_dag_layers" -> {
        val steps = (1 to 7).map { k =>
          s"""l$k AS (
             |  SELECT c.id,
             |         CASE WHEN r.m IS NULL OR c.lvl >= r.m THEN c.lvl ELSE r.m END AS lvl
             |  FROM l${k - 1} c LEFT JOIN (
             |    SELECT d.dst AS id, max(c2.lvl) + 1 AS m
             |    FROM d JOIN l${k - 1} c2 ON c2.id = d.src GROUP BY d.dst) r
             |  USING (id))""".stripMargin
        }.mkString(",\n")
        s"""WITH ${sqlCoPurchaseCtes(1)},
           |d AS (SELECT DISTINCT src % 200 AS src, dst % 200 AS dst FROM p
           |      WHERE (dst % 200) // 25 = (src % 200) // 25 + 1),
           |n0 AS (SELECT src AS id FROM d UNION SELECT dst AS id FROM d),
           |l0 AS (SELECT id, CAST(0 AS BIGINT) AS lvl FROM n0),
           |$steps
           |SELECT id, lvl AS level FROM l7 ORDER BY id""".stripMargin
      },

      // padded token-sequence containment on the canonical token
      // stream — identical normalization both sides, so the anchor-
      // token candidate step is invisible to the oracle
      "q_blocklist_filter" -> {
        val vals = blockPhrases.map(p => s"('$p')").mkString(", ")
        s"""WITH p AS (SELECT phrase FROM (VALUES $vals) t(phrase)),
           |d AS (SELECT doc_id,
           |             ' ' || array_to_string($sqlTokens, ' ') || ' ' AS ntext
           |      FROM documents)
           |SELECT d.doc_id, p.phrase
           |FROM d JOIN p ON contains(d.ntext, ' ' || p.phrase || ' ')
           |ORDER BY doc_id, phrase""".stripMargin
      },

      // the q_transitivity oriented-wedge machinery, but the closing
      // EXISTS keeps (u,v,w) and credits every corner
      "q_local_clustering" ->
        s"""WITH ${sqlCoPurchaseCtes(2)},
           |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1),
           |orient AS (
           |  SELECT e.src, e.dst, dd.deg AS ddst
           |  FROM e JOIN deg ds ON e.src = ds.src JOIN deg dd ON e.dst = dd.src
           |  WHERE ds.deg < dd.deg OR (ds.deg = dd.deg AND e.src < e.dst)),
           |wedge AS (
           |  SELECT a.src AS u, a.dst AS v, b.dst AS w
           |  FROM orient a JOIN orient b ON a.src = b.src
           |  WHERE a.ddst < b.ddst OR (a.ddst = b.ddst AND a.dst < b.dst)),
           |tri AS (
           |  SELECT u, v, w FROM wedge WHERE EXISTS (
           |    SELECT 1 FROM orient o WHERE o.src = wedge.v AND o.dst = wedge.w)),
           |corners AS (SELECT u AS id FROM tri
           |            UNION ALL SELECT v FROM tri
           |            UNION ALL SELECT w FROM tri),
           |pern AS (SELECT id, CAST(count(*) AS BIGINT) AS n_tri
           |         FROM corners GROUP BY id)
           |SELECT d.src AS id, d.deg AS degree,
           |       CAST(coalesce(p.n_tri, 0) AS BIGINT) AS n_tri,
           |       CASE WHEN d.deg >= 2 THEN
           |         round(2.0 * CAST(coalesce(p.n_tri, 0) AS DOUBLE) /
           |               CAST(d.deg * (d.deg - 1) AS DOUBLE), 6) END AS lcc
           |FROM deg d LEFT JOIN pern p ON p.id = d.src
           |ORDER BY id""".stripMargin,

      // metadata-only pruning: zone maps from the same month bucketing,
      // predicates as DATE literals -> epoch days, skip test mx<lo|mn>hi
      "q_zonemap_prune" -> {
        val predVals = zonePreds
          .map { case (n, lo, hi) => s"('$n', DATE '$lo', DATE '$hi')" }
          .mkString(", ")
        s"""WITH zm AS (
           |  SELECT CAST(year(l_shipdate) * 12 + month(l_shipdate) AS BIGINT) AS file_id,
           |         CAST(min(date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))) AS BIGINT) AS mn,
           |         CAST(max(date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))) AS BIGINT) AS mx,
           |         CAST(count(*) AS BIGINT) AS nrows
           |  FROM lineitem GROUP BY 1),
           |p AS (SELECT pred,
           |             CAST(date_diff('day', DATE '1970-01-01', lo) AS BIGINT) AS lo,
           |             CAST(date_diff('day', DATE '1970-01-01', hi) AS BIGINT) AS hi
           |      FROM (VALUES $predVals) t(pred, lo, hi)),
           |ev AS (SELECT p.pred, p.lo, p.hi, zm.nrows,
           |              (zm.mx < p.lo OR zm.mn > p.hi) AS skipped
           |       FROM zm CROSS JOIN p)
           |SELECT pred, lo, hi, CAST(count(*) AS BIGINT) AS n_files,
           |       CAST(sum(CASE WHEN skipped THEN 1 ELSE 0 END) AS BIGINT) AS n_skipped,
           |       CAST(sum(CASE WHEN skipped THEN nrows ELSE 0 END) AS BIGINT) AS rows_skipped,
           |       CAST(sum(CASE WHEN NOT skipped THEN nrows ELSE 0 END) AS BIGINT) AS rows_scanned
           |FROM ev GROUP BY 1, 2, 3 ORDER BY pred""".stripMargin
      },

      // q_common_neighbors' wedges rescored cn/(d1+d2-cn); the order
      // key is the exact integer ppb — no float in the cut
      "q_node_jaccard" ->
        s"""WITH ${sqlCoPurchaseCtes(2)},
           |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1),
           |keep AS (SELECT src FROM deg WHERE deg <= 60),
           |ke AS (SELECT e.src AS u, e.dst AS v FROM e
           |       JOIN keep k ON e.src = k.src),
           |cn AS (
           |  SELECT a.v AS id1, b.v AS id2, CAST(count(*) AS BIGINT) AS cn
           |  FROM ke a JOIN ke b ON a.u = b.u AND a.v < b.v
           |  GROUP BY 1, 2 HAVING count(*) >= 2),
           |nonadj AS (
           |  SELECT cn.id1, cn.id2, cn.cn FROM cn WHERE NOT EXISTS (
           |    SELECT 1 FROM e WHERE e.src = cn.id1 AND e.dst = cn.id2))
           |SELECT n.id1, n.id2, n.cn, d1.deg AS d1, d2.deg AS d2,
           |       n.cn * CAST(1000000000 AS BIGINT) // (d1.deg + d2.deg - n.cn) AS jaccard_ppb,
           |       round(CAST(n.cn AS DOUBLE) / CAST(d1.deg + d2.deg - n.cn AS DOUBLE), 6) AS jaccard
           |FROM nonadj n JOIN deg d1 ON n.id1 = d1.src
           |              JOIN deg d2 ON n.id2 = d2.src
           |ORDER BY jaccard_ppb DESC, id1, id2 LIMIT 40""".stripMargin,

      // distinct capped-mid 2-hop pairs minus direct edges; the score
      // is the exact integer 6*n1 + 3*n2
      "q_harmonic_centrality" ->
        s"""WITH ${sqlCoPurchaseCtes(2)},
           |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS n1 FROM e GROUP BY 1),
           |leg AS (SELECT e.src AS u, e.dst AS x FROM e
           |        JOIN deg d ON e.dst = d.src WHERE d.n1 <= 60),
           |hop2 AS (
           |  SELECT DISTINCT a.u, b.u AS u2
           |  FROM leg a JOIN leg b ON a.x = b.x AND a.u <> b.u),
           |far AS (
           |  SELECT h.u AS id, CAST(count(*) AS BIGINT) AS n2 FROM hop2 h
           |  WHERE NOT EXISTS (
           |    SELECT 1 FROM e WHERE e.src = h.u AND e.dst = h.u2)
           |  GROUP BY 1)
           |SELECT deg.src AS id, deg.n1, coalesce(far.n2, 0) AS n2,
           |       deg.n1 * 6 + coalesce(far.n2, 0) * 3 AS harmonic6,
           |       round(CAST(deg.n1 * 6 + coalesce(far.n2, 0) * 3 AS DOUBLE) / 6.0, 6) AS harmonic
           |FROM deg LEFT JOIN far ON deg.src = far.id
           |ORDER BY id""".stripMargin,

      // doubled-form clearing over the labeled subgraph: q_num =
      // e2_in * M2 - d_tot^2, one division per community
      "q_modularity" ->
        s"""WITH ${sqlCoPurchaseCtes(2)},
           |lab AS (SELECT p_partkey AS id, p_brand AS community FROM part),
           |le AS (
           |  SELECT e.src, e.dst, ls.community AS c_src, ld.community AS c_dst
           |  FROM e JOIN lab ls ON e.src = ls.id JOIN lab ld ON e.dst = ld.id),
           |m2 AS (SELECT CAST(count(*) AS BIGINT) AS m2 FROM le),
           |w AS (SELECT c_src AS community, CAST(count(*) AS BIGINT) AS e2_in
           |      FROM le WHERE c_src = c_dst GROUP BY 1),
           |dt AS (
           |  SELECT community, CAST(count(*) AS BIGINT) AS n_nodes,
           |         CAST(sum(deg) AS BIGINT) AS d_tot FROM (
           |    SELECT src, c_src AS community, CAST(count(*) AS BIGINT) AS deg
           |    FROM le GROUP BY 1, 2) GROUP BY 1)
           |SELECT dt.community, dt.n_nodes, coalesce(w.e2_in, 0) AS e2_in,
           |       dt.d_tot,
           |       coalesce(w.e2_in, 0) * m2.m2 - dt.d_tot * dt.d_tot AS q_num,
           |       round(CAST(coalesce(w.e2_in, 0) * m2.m2 - dt.d_tot * dt.d_tot AS DOUBLE) /
           |             CAST(m2.m2 * m2.m2 AS DOUBLE), 6) AS contrib
           |FROM dt LEFT JOIN w USING (community) CROSS JOIN m2
           |ORDER BY community""".stripMargin,

      // md5-ranked per-stratum top-5 — the deterministic reservoir
      "q_stratified_k" ->
        """SELECT o_orderpriority, o_orderkey, rn FROM (
          |  SELECT o_orderpriority, o_orderkey,
          |         CAST(row_number() OVER (PARTITION BY o_orderpriority
          |           ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey) AS INTEGER) AS rn
          |  FROM orders) WHERE rn <= 5
          |ORDER BY o_orderpriority, rn""".stripMargin,

      // the q_holt recursion with the 7-slot seasonal ring carried as a
      // DOUBLE[] column; identical IEEE op order on both engines
      "q_holt_winters" ->
        """WITH RECURSIVE daily AS (
          |  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
          |         round(sum(value), 2) AS day_total,
          |         CAST(row_number() OVER (PARTITION BY event_type ORDER BY date_trunc('day', ts)) AS INTEGER) AS rn
          |  FROM events GROUP BY 1, date_trunc('day', ts)),
          |hw(event_type, day, day_total, rn, l, b, s, ring) AS (
          |  SELECT event_type, day, day_total, rn, day_total,
          |         CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
          |         CAST([0, 0, 0, 0, 0, 0, 0] AS DOUBLE[])
          |  FROM daily WHERE rn = 1
          |  UNION ALL
          |  SELECT d.event_type, d.day, d.day_total, d.rn,
          |         0.5 * (d.day_total - h.ring[1]) + 0.5 * (h.l + h.b),
          |         0.3 * ((0.5 * (d.day_total - h.ring[1]) + 0.5 * (h.l + h.b)) - h.l) + 0.7 * h.b,
          |         0.2 * (d.day_total - (0.5 * (d.day_total - h.ring[1]) + 0.5 * (h.l + h.b))) + 0.8 * h.ring[1],
          |         h.ring[2:7] || [0.2 * (d.day_total - (0.5 * (d.day_total - h.ring[1]) + 0.5 * (h.l + h.b))) + 0.8 * h.ring[1]]
          |  FROM hw h JOIN daily d
          |    ON d.event_type = h.event_type AND d.rn = h.rn + 1)
          |SELECT event_type, day, day_total,
          |       round(l, 6) AS level, round(b, 6) AS trend,
          |       round(s, 6) AS seasonal,
          |       round(l + b + ring[1], 6) AS forecast_next
          |FROM hw ORDER BY event_type, day""".stripMargin,

      // integer-exact CUSUM: the recurrence scaled by 100·n so the
      // series mean never divides — tp/tn fold as exact integers and
      // the alarm compares in scaled space (mirrors the Spark fold
      // term for term; k = 500 cents, h = 2500 cents)
      "q_cusum" ->
        """WITH RECURSIVE daily AS (
          |  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
          |         round(sum(value), 2) AS day_total,
          |         CAST(round(round(sum(value), 2) * 100) AS BIGINT) AS c,
          |         CAST(row_number() OVER (PARTITION BY event_type ORDER BY date_trunc('day', ts)) AS INTEGER) AS rn
          |  FROM events GROUP BY 1, date_trunc('day', ts)),
          |st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
          |              CAST(sum(c) AS BIGINT) AS stot FROM daily GROUP BY 1),
          |cu(event_type, day, day_total, rn, tp, tn) AS (
          |  SELECT d.event_type, d.day, d.day_total, d.rn,
          |         greatest(CAST(0 AS BIGINT), (s.n * d.c - s.stot) - s.n * 500),
          |         greatest(CAST(0 AS BIGINT), -(s.n * d.c - s.stot) - s.n * 500)
          |  FROM daily d JOIN st s ON s.event_type = d.event_type WHERE d.rn = 1
          |  UNION ALL
          |  SELECT d.event_type, d.day, d.day_total, d.rn,
          |         greatest(CAST(0 AS BIGINT), w.tp + (s.n * d.c - s.stot) - s.n * 500),
          |         greatest(CAST(0 AS BIGINT), w.tn - (s.n * d.c - s.stot) - s.n * 500)
          |  FROM cu w JOIN daily d ON d.event_type = w.event_type AND d.rn = w.rn + 1
          |  JOIN st s ON s.event_type = d.event_type)
          |SELECT c2.event_type, c2.day, c2.day_total,
          |       round(c2.tp / (100.0 * s.n), 6) AS s_pos,
          |       round(c2.tn / (100.0 * s.n), 6) AS s_neg,
          |       (c2.tp > s.n * 2500 OR c2.tn > s.n * 2500) AS alarm
          |FROM cu c2 JOIN st s ON s.event_type = c2.event_type
          |ORDER BY c2.event_type, c2.day""".stripMargin,

      // Wilder RSI: exact integer cent deltas via one lag window, then
      // the α = 1/14 smoothing recursion in fold order — shares the
      // q_ewma recursive-CTE spine; flat series pin RSI to 50
      "q_rsi" ->
        """WITH RECURSIVE daily AS (
          |  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
          |         round(sum(value), 2) AS day_total,
          |         CAST(round(round(sum(value), 2) * 100) AS BIGINT) AS c,
          |         CAST(row_number() OVER (PARTITION BY event_type ORDER BY date_trunc('day', ts)) AS INTEGER) AS rn
          |  FROM events GROUP BY 1, date_trunc('day', ts)),
          |d2 AS (
          |  SELECT event_type, day, day_total, rn,
          |         greatest(c - lag(c) OVER (PARTITION BY event_type ORDER BY rn), CAST(0 AS BIGINT)) / 100.0 AS g,
          |         greatest(lag(c) OVER (PARTITION BY event_type ORDER BY rn) - c, CAST(0 AS BIGINT)) / 100.0 AS l
          |  FROM daily),
          |rs(event_type, day, day_total, rn, ag, al) AS (
          |  SELECT event_type, day, day_total, rn,
          |         CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
          |  FROM d2 WHERE rn = 1
          |  UNION ALL
          |  SELECT d.event_type, d.day, d.day_total, d.rn,
          |         CASE WHEN w.ag IS NULL THEN d.g ELSE (w.ag * 13.0 + d.g) / 14.0 END,
          |         CASE WHEN w.al IS NULL THEN d.l ELSE (w.al * 13.0 + d.l) / 14.0 END
          |  FROM rs w JOIN d2 d ON d.event_type = w.event_type AND d.rn = w.rn + 1)
          |SELECT event_type, day, day_total,
          |       round(CASE WHEN ag IS NULL THEN NULL
          |                  WHEN al = 0 AND ag = 0 THEN 50.0
          |                  WHEN al = 0 THEN 100.0
          |                  ELSE 100.0 - 100.0 / (1.0 + ag / al) END, 6) AS rsi
          |FROM rs ORDER BY event_type, day""".stripMargin,

      // the chunked Holt–Winters shares the SEQUENTIAL recursive-CTE
      // oracle: ForecastChunkedSpec gates the boundary-composed fold to
      // 1e-9 relative agreement, and round-6 display equality is the
      // same license q_ewma_chunked/q_holt_chunked run under
      "q_holt_winters_chunked" ->
        """WITH RECURSIVE daily AS (
          |  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
          |         round(sum(value), 2) AS day_total,
          |         CAST(row_number() OVER (PARTITION BY event_type ORDER BY date_trunc('day', ts)) AS INTEGER) AS rn
          |  FROM events GROUP BY 1, date_trunc('day', ts)),
          |hw(event_type, day, day_total, rn, l, b, s, ring) AS (
          |  SELECT event_type, day, day_total, rn, day_total,
          |         CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
          |         CAST([0, 0, 0, 0, 0, 0, 0] AS DOUBLE[])
          |  FROM daily WHERE rn = 1
          |  UNION ALL
          |  SELECT d.event_type, d.day, d.day_total, d.rn,
          |         0.5 * (d.day_total - h.ring[1]) + 0.5 * (h.l + h.b),
          |         0.3 * ((0.5 * (d.day_total - h.ring[1]) + 0.5 * (h.l + h.b)) - h.l) + 0.7 * h.b,
          |         0.2 * (d.day_total - (0.5 * (d.day_total - h.ring[1]) + 0.5 * (h.l + h.b))) + 0.8 * h.ring[1],
          |         h.ring[2:7] || [0.2 * (d.day_total - (0.5 * (d.day_total - h.ring[1]) + 0.5 * (h.l + h.b))) + 0.8 * h.ring[1]]
          |  FROM hw h JOIN daily d
          |    ON d.event_type = h.event_type AND d.rn = h.rn + 1)
          |SELECT event_type, day, day_total,
          |       round(l, 6) AS level, round(b, 6) AS trend,
          |       round(s, 6) AS seasonal,
          |       round(l + b + ring[1], 6) AS forecast_next
          |FROM hw ORDER BY event_type, day""".stripMargin,

      // the chunked CUSUM is BIT-exact against the sequential fold
      // (max-plus composition over exact longs), so it shares q_cusum's
      // oracle verbatim — no tolerance license needed
      "q_cusum_chunked" ->
        """WITH RECURSIVE daily AS (
          |  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
          |         round(sum(value), 2) AS day_total,
          |         CAST(round(round(sum(value), 2) * 100) AS BIGINT) AS c,
          |         CAST(row_number() OVER (PARTITION BY event_type ORDER BY date_trunc('day', ts)) AS INTEGER) AS rn
          |  FROM events GROUP BY 1, date_trunc('day', ts)),
          |st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
          |              CAST(sum(c) AS BIGINT) AS stot FROM daily GROUP BY 1),
          |cu(event_type, day, day_total, rn, tp, tn) AS (
          |  SELECT d.event_type, d.day, d.day_total, d.rn,
          |         greatest(CAST(0 AS BIGINT), (s.n * d.c - s.stot) - s.n * 500),
          |         greatest(CAST(0 AS BIGINT), -(s.n * d.c - s.stot) - s.n * 500)
          |  FROM daily d JOIN st s ON s.event_type = d.event_type WHERE d.rn = 1
          |  UNION ALL
          |  SELECT d.event_type, d.day, d.day_total, d.rn,
          |         greatest(CAST(0 AS BIGINT), w.tp + (s.n * d.c - s.stot) - s.n * 500),
          |         greatest(CAST(0 AS BIGINT), w.tn - (s.n * d.c - s.stot) - s.n * 500)
          |  FROM cu w JOIN daily d ON d.event_type = w.event_type AND d.rn = w.rn + 1
          |  JOIN st s ON s.event_type = d.event_type)
          |SELECT c2.event_type, c2.day, c2.day_total,
          |       round(c2.tp / (100.0 * s.n), 6) AS s_pos,
          |       round(c2.tn / (100.0 * s.n), 6) AS s_neg,
          |       (c2.tp > s.n * 2500 OR c2.tn > s.n * 2500) AS alarm
          |FROM cu c2 JOIN st s ON s.event_type = c2.event_type
          |ORDER BY c2.event_type, c2.day""".stripMargin,

      // chunked RSI states ITS OWN op-order contract: the EWMA α-form
      // (1/14)·g + (1 − 1/14)·ag that ewmaChunked folds, vs q_rsi's
      // (13·ag + g)/14 — the sequential twin of exactly what the Spark
      // side computes, seeded ag₂ = g₂ after the delta-less first row
      "q_rsi_chunked" ->
        """WITH RECURSIVE daily AS (
          |  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
          |         round(sum(value), 2) AS day_total,
          |         CAST(round(round(sum(value), 2) * 100) AS BIGINT) AS c,
          |         CAST(row_number() OVER (PARTITION BY event_type ORDER BY date_trunc('day', ts)) AS INTEGER) AS rn
          |  FROM events GROUP BY 1, date_trunc('day', ts)),
          |d2 AS (
          |  SELECT event_type, day, day_total, rn,
          |         greatest(c - lag(c) OVER (PARTITION BY event_type ORDER BY rn), CAST(0 AS BIGINT)) / 100.0 AS g,
          |         greatest(lag(c) OVER (PARTITION BY event_type ORDER BY rn) - c, CAST(0 AS BIGINT)) / 100.0 AS l
          |  FROM daily),
          |rs(event_type, day, day_total, rn, ag, al) AS (
          |  SELECT event_type, day, day_total, rn,
          |         CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
          |  FROM d2 WHERE rn = 1
          |  UNION ALL
          |  SELECT d.event_type, d.day, d.day_total, d.rn,
          |         CASE WHEN w.ag IS NULL THEN d.g ELSE (1.0/14.0) * d.g + (1.0 - 1.0/14.0) * w.ag END,
          |         CASE WHEN w.al IS NULL THEN d.l ELSE (1.0/14.0) * d.l + (1.0 - 1.0/14.0) * w.al END
          |  FROM rs w JOIN d2 d ON d.event_type = w.event_type AND d.rn = w.rn + 1)
          |SELECT event_type, day, day_total,
          |       round(CASE WHEN ag IS NULL THEN NULL
          |                  WHEN al = 0 AND ag = 0 THEN 50.0
          |                  WHEN al = 0 THEN 100.0
          |                  ELSE 100.0 - 100.0 / (1.0 + ag / al) END, 6) AS rsi
          |FROM rs ORDER BY event_type, day""".stripMargin,

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

      // multinomial NB mirrored stage for stage: nano-quantized token
      // log-probs and priors, closed-form smoothing floor for absent
      // (term, class), argmax by (score DESC, class) — exact-long
      // scores so the winner can never flip
      "q_naive_bayes" ->
        s"""WITH base AS (
           |  SELECT doc_id AS did, lang AS cls, $sqlTokens AS toks
           |  FROM documents),
           |tfc AS (
           |  SELECT did, cls, term, CAST(count(*) AS BIGINT) AS tf
           |  FROM (SELECT did, cls, unnest(toks) AS term FROM base)
           |  GROUP BY 1, 2, 3),
           |dlen AS (SELECT did, cls, sum(tf) AS len FROM tfc GROUP BY 1, 2),
           |cnt AS (SELECT cls AS mcls, term, sum(tf) AS cnt
           |        FROM tfc GROUP BY 1, 2),
           |totc AS (SELECT mcls, sum(cnt) AS tot FROM cnt GROUP BY 1),
           |vocab AS (SELECT CAST(count(DISTINCT term) AS BIGINT) AS v FROM cnt),
           |nall AS (SELECT CAST(count(*) AS BIGINT) AS n_all FROM base),
           |classes AS (
           |  SELECT c.mcls, t.tot, vb.v,
           |         CAST(round(ln(CAST(c.n_docs AS DOUBLE) / na.n_all) * 1e9) AS BIGINT) AS prior_nano,
           |         CAST(round(ln(1.0 / CAST(t.tot + vb.v AS DOUBLE)) * 1e9) AS BIGINT) AS floor_nano
           |  FROM (SELECT cls AS mcls, count(*) AS n_docs FROM base GROUP BY 1) c
           |  JOIN totc t ON t.mcls = c.mcls CROSS JOIN vocab vb CROSS JOIN nall na),
           |model AS (
           |  SELECT cnt.mcls, cnt.term,
           |         CAST(round(ln(CAST(cnt.cnt + 1 AS DOUBLE) /
           |           CAST(t.tot + vb.v AS DOUBLE)) * 1e9) AS BIGINT) AS lp
           |  FROM cnt JOIN totc t ON t.mcls = cnt.mcls CROSS JOIN vocab vb),
           |present AS (
           |  SELECT tfc.did, m.mcls, sum(tfc.tf * m.lp) AS sp, sum(tfc.tf) AS tfp
           |  FROM tfc JOIN model m ON m.term = tfc.term GROUP BY 1, 2),
           |scored AS (
           |  SELECT d.did, d.cls, k.mcls,
           |         k.prior_nano + COALESCE(p.sp, 0) +
           |           (d.len - COALESCE(p.tfp, 0)) * k.floor_nano AS score
           |  FROM dlen d CROSS JOIN classes k
           |  LEFT JOIN present p ON p.did = d.did AND p.mcls = k.mcls),
           |win AS (
           |  SELECT did, cls, mcls, score,
           |         row_number() OVER (PARTITION BY did
           |           ORDER BY score DESC, mcls) AS rn
           |  FROM scored)
           |SELECT did AS id, mcls AS pred,
           |       CAST(score AS BIGINT) AS score_nano,
           |       (mcls = cls) AS correct
           |FROM win WHERE rn = 1 ORDER BY id""".stripMargin,

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

      // blocking-vs-truth clearing: truth pairs count combinatorially
      // per fingerprint group, the intersection tests each capped LSH
      // candidate's fingerprints — the pair space never exceeds the
      // blocking's own output
      "q_blocking_eval" ->
        s"""WITH $sqlMinhashCtes,
           |bands AS (
           |  SELECT doc_id, 0 AS band, md5(mh0 || mh1) AS bh FROM sig
           |  UNION ALL SELECT doc_id, 1, md5(mh2 || mh3) FROM sig),
           |sized AS (
           |  SELECT band, bh FROM bands GROUP BY band, bh
           |  HAVING count(*) BETWEEN 2 AND 316),
           |pairs AS (
           |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
           |  FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
           |  JOIN sized s ON s.band = a.band AND s.bh = a.bh),
           |fps AS (
           |  SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
           |  FROM documents),
           |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
           |tr AS (SELECT CAST(COALESCE(sum(m * (m - 1) // 2), 0) AS BIGINT) AS n_truth
           |       FROM (SELECT fp, count(*) AS m FROM fps GROUP BY 1)),
           |ht AS (SELECT CAST(count(*) AS BIGINT) AS n_cand,
           |              CAST(COALESCE(sum(CASE WHEN f1.fp = f2.fp THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_hit
           |       FROM pairs p
           |       JOIN fps f1 ON f1.doc_id = p.id1
           |       JOIN fps f2 ON f2.doc_id = p.id2)
           |SELECT n_docs, n_truth, n_cand, n_hit,
           |       round(n_hit / CAST(nullif(n_truth, 0) AS DOUBLE), 6) AS completeness,
           |       round(n_hit / CAST(nullif(n_cand, 0) AS DOUBLE), 6) AS quality,
           |       round(1.0 - n_cand / (n_docs * (n_docs - 1) / 2.0), 6) AS reduction_ratio
           |FROM nd CROSS JOIN tr CROSS JOIN ht ORDER BY n_docs""".stripMargin,

      // the identical nested DP fold (DuckDB list_reduce has no init
      // argument, so both seeds ride as prepended elements; index
      // markers are 1-element lists to keep the reduce monomorphic) —
      // exact long cents, 10^15 band sentinel, same recurrence cell
      // for cell as the Spark aggregate
      "q_dtw" ->
        """WITH daily AS (
          |  SELECT event_type, date_trunc('day', ts) AS day,
          |         CAST(round(round(sum(value), 2) * 100) AS BIGINT) AS c
          |  FROM events GROUP BY 1, 2),
          |ser AS (SELECT event_type, list(c ORDER BY day) AS ser
          |        FROM daily GROUP BY 1),
          |pairs AS (
          |  SELECT a.event_type AS type_a, b.event_type AS type_b,
          |         a.ser AS sa, b.ser AS sb
          |  FROM ser a JOIN ser b ON a.event_type < b.event_type),
          |d AS (
          |  SELECT type_a, type_b,
          |         CAST(len(sa) AS INTEGER) AS n_a, CAST(len(sb) AS INTEGER) AS n_b,
          |         list_reduce(
          |           list_prepend(
          |             list_prepend(CAST(0 AS BIGINT),
          |               list_transform(range(1, len(sb) + 1), x -> CAST(1000000000000000 AS BIGINT))),
          |             list_transform(range(1, len(sa) + 1), i -> [CAST(i AS BIGINT)])),
          |           (old, ie) -> list_reduce(
          |             list_prepend([CAST(1000000000000000 AS BIGINT)],
          |               list_transform(range(1, len(sb) + 1), j -> [CAST(j AS BIGINT)])),
          |             (racc, je) -> list_append(racc,
          |               CASE WHEN abs(ie[1] - je[1]) > 10 THEN CAST(1000000000000000 AS BIGINT)
          |                    ELSE abs(sa[ie[1]] - sb[je[1]]) +
          |                         least(racc[-1], old[je[1] + 1], old[je[1]])
          |               END))
          |         )[-1] AS raw
          |  FROM pairs)
          |SELECT type_a, type_b, n_a, n_b,
          |       CASE WHEN raw < 1000000000000000 THEN raw END AS dtw_cents,
          |       round(CASE WHEN raw < 1000000000000000 THEN raw END / 100.0, 2) AS dtw
          |FROM d ORDER BY type_a, type_b""".stripMargin,

      // the q_dag_layers unrolled max-propagation with max(cost + w)
      // instead of max(lvl) + 1 — same 7-step fixpoint on the 8-band
      // DAG, deterministic integer stage costs
      "q_critical_path" -> {
        val steps = (1 to 7).map { k =>
          s"""c$k AS (
             |  SELECT c.id,
             |         CASE WHEN r.m IS NULL OR c.cost >= r.m THEN c.cost ELSE r.m END AS cost
             |  FROM c${k - 1} c LEFT JOIN (
             |    SELECT d.dst AS id, max(c2.cost + d.w) AS m
             |    FROM d JOIN c${k - 1} c2 ON c2.id = d.src GROUP BY d.dst) r
             |  USING (id))""".stripMargin
        }.mkString(",\n")
        s"""WITH ${sqlCoPurchaseCtes(1)},
           |d AS (SELECT src, dst, 1 + (src * 7 + dst) % 5 AS w FROM (
           |        SELECT DISTINCT src % 200 AS src, dst % 200 AS dst FROM p
           |        WHERE (dst % 200) // 25 = (src % 200) // 25 + 1)),
           |n0 AS (SELECT src AS id FROM d UNION SELECT dst AS id FROM d),
           |c0 AS (SELECT id, CAST(0 AS BIGINT) AS cost FROM n0),
           |$steps
           |SELECT id, CAST(cost AS BIGINT) AS cost FROM c7 ORDER BY id""".stripMargin
      },

      // full-week PAA segments (partial tails drop, so sums compare as
      // exact longs), rank-based quartile alphabet via ntile over the
      // (sum, index) order, word assembled in week order
      "q_sax" ->
        """WITH daily AS (
          |  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
          |         CAST(round(round(sum(value), 2) * 100) AS BIGINT) AS c,
          |         CAST(row_number() OVER (PARTITION BY event_type ORDER BY date_trunc('day', ts)) AS BIGINT) AS rn
          |  FROM events GROUP BY 1, date_trunc('day', ts)),
          |seg AS (
          |  SELECT event_type, (rn - 1) // 7 AS widx,
          |         sum(c) AS wsum, count(*) AS wn
          |  FROM daily GROUP BY 1, 2 HAVING count(*) = 7),
          |sym AS (
          |  SELECT event_type, widx,
          |         ntile(4) OVER (PARTITION BY event_type ORDER BY wsum, widx) AS q
          |  FROM seg)
          |SELECT event_type, CAST(count(*) AS BIGINT) AS n_weeks,
          |       string_agg(chr(CAST(96 + q AS INTEGER)), '' ORDER BY widx) AS sax_word
          |FROM sym GROUP BY 1 ORDER BY 1""".stripMargin,

      // exact integer Σ(price·qty) / Σqty, one division per row
      "q_vwap" ->
        """WITH r AS (
          |  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
          |         CAST(round(value * 100) AS BIGINT) AS p,
          |         event_id % 7 + 1 AS q
          |  FROM events)
          |SELECT event_type, day,
          |       CAST(sum(q) AS BIGINT) AS qty,
          |       round(sum(p * q) / (100.0 * sum(q)), 6) AS vwap
          |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

      // three raters per doc (gold, full-text lang-id, 16-token
      // lang-id); every kappa term an exact long — the
      // Inference.fleissKappa clearing
      "q_fleiss_kappa" ->
        s"""WITH toks AS (SELECT doc_id, lang, $sqlTokens AS l FROM documents),
           |r2 AS (
           |  SELECT doc_id, (${sqlLangVotes("en")}) AS en,
           |         (${sqlLangVotes("es")}) AS es, (${sqlLangVotes("fr")}) AS fr
           |  FROM toks),
           |t16 AS (SELECT doc_id, lang, l[1:16] AS l FROM toks),
           |r3 AS (
           |  SELECT doc_id, (${sqlLangVotes("en")}) AS en,
           |         (${sqlLangVotes("es")}) AS es, (${sqlLangVotes("fr")}) AS fr
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

      // q_common_neighbors' wedge CTEs with the apex 1/ln(deg) weight
      // carried and summed; float sum rounded at 6 both sides
      "q_adamic_adar" ->
        s"""WITH ${sqlCoPurchaseCtes(2)},
           |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1),
           |ke AS (SELECT e.src AS u, e.dst AS v,
           |              CAST(1.0 AS DOUBLE) / ln(CAST(deg.deg AS DOUBLE)) AS w_apex
           |       FROM e JOIN deg ON e.src = deg.src WHERE deg.deg <= 60),
           |cn AS (
           |  SELECT a.v AS id1, b.v AS id2, CAST(count(*) AS BIGINT) AS cn,
           |         sum(a.w_apex) AS aa_raw
           |  FROM ke a JOIN ke b ON a.u = b.u AND a.v < b.v
           |  GROUP BY 1, 2 HAVING count(*) >= 2),
           |nonadj AS (
           |  SELECT id1, id2, cn, aa_raw FROM cn WHERE NOT EXISTS (
           |    SELECT 1 FROM e WHERE e.src = cn.id1 AND e.dst = cn.id2))
           |SELECT id1, id2, cn, round(aa_raw, 6) AS aa FROM nonadj
           |ORDER BY aa DESC, id1, id2 LIMIT 40""".stripMargin,

      // clipped multiset n-gram recall, unigrams and the l[i:i+1]
      // bigram form; zero-overlap pairs kept by the pair-list join-back
      "q_rouge_overlap" ->
        s"""WITH toks AS (SELECT doc_id, $sqlTokens AS l FROM documents),
           |pairs AS (
           |  SELECT a.doc_id AS cand_id, b.doc_id AS ref_id
           |  FROM documents a JOIN documents b ON a.doc_id = b.doc_id + 1
           |  WHERE a.doc_id % 2 = 1),
           |uc AS (
           |  SELECT doc_id AS d, g, CAST(count(*) AS BIGINT) AS c FROM (
           |    SELECT doc_id, unnest(l) AS g FROM toks) GROUP BY 1, 2),
           |bc AS (
           |  SELECT doc_id AS d, g, CAST(count(*) AS BIGINT) AS c FROM (
           |    SELECT doc_id,
           |           unnest([array_to_string(l[i:i+1], ' ') for i in range(1, len(l))]) AS g
           |    FROM toks) GROUP BY 1, 2),
           |ut AS (SELECT d AS ref_id, CAST(sum(c) AS BIGINT) AS ref_uni FROM uc GROUP BY 1),
           |bt AS (SELECT d AS ref_id, CAST(sum(c) AS BIGINT) AS ref_bi FROM bc GROUP BY 1),
           |ov1 AS (
           |  SELECT p.cand_id, p.ref_id, CAST(sum(least(cu.c, ru.c)) AS BIGINT) AS ov1
           |  FROM pairs p JOIN uc cu ON cu.d = p.cand_id
           |               JOIN uc ru ON ru.d = p.ref_id AND ru.g = cu.g
           |  GROUP BY 1, 2),
           |ov2 AS (
           |  SELECT p.cand_id, p.ref_id, CAST(sum(least(cb.c, rb.c)) AS BIGINT) AS ov2
           |  FROM pairs p JOIN bc cb ON cb.d = p.cand_id
           |               JOIN bc rb ON rb.d = p.ref_id AND rb.g = cb.g
           |  GROUP BY 1, 2)
           |SELECT p.cand_id, p.ref_id,
           |       coalesce(ut.ref_uni, 0) AS ref_uni, coalesce(ov1.ov1, 0) AS ov1,
           |       CASE WHEN coalesce(ut.ref_uni, 0) > 0
           |            THEN round(CAST(coalesce(ov1.ov1, 0) AS DOUBLE) / CAST(ut.ref_uni AS DOUBLE), 6)
           |       END AS rouge1,
           |       coalesce(bt.ref_bi, 0) AS ref_bi, coalesce(ov2.ov2, 0) AS ov2,
           |       CASE WHEN coalesce(bt.ref_bi, 0) > 0
           |            THEN round(CAST(coalesce(ov2.ov2, 0) AS DOUBLE) / CAST(bt.ref_bi AS DOUBLE), 6)
           |       END AS rouge2
           |FROM pairs p LEFT JOIN ov1 USING (cand_id, ref_id)
           |             LEFT JOIN ov2 USING (cand_id, ref_id)
           |             LEFT JOIN ut USING (ref_id)
           |             LEFT JOIN bt USING (ref_id)
           |ORDER BY cand_id""".stripMargin,

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

      // six exact-long frame sums -> one float tower; same ROWS frame
      "q_rolling_corr" ->
        """WITH grid AS (
          |  SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS ord,
          |         CAST(sum(CASE WHEN event_type = 'click'
          |                       THEN CAST(floor(value * 100) AS BIGINT)
          |                       ELSE 0 END) AS BIGINT) AS a,
          |         CAST(sum(CASE WHEN event_type = 'purchase'
          |                       THEN CAST(floor(value * 100) AS BIGINT)
          |                       ELSE 0 END) AS BIGINT) AS b
          |  FROM events GROUP BY 1),
          |w AS (
          |  SELECT ord,
          |         count(*) OVER win AS n_win,
          |         sum(a) OVER win AS sa, sum(b) OVER win AS sb,
          |         sum(a * a) OVER win AS saa, sum(b * b) OVER win AS sbb,
          |         sum(a * b) OVER win AS sab
          |  FROM grid
          |  WINDOW win AS (ORDER BY ord ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
          |SELECT ord, CAST(n_win AS BIGINT) AS n_win,
          |       CASE WHEN (n_win * saa - sa * sa) > 0 AND (n_win * sbb - sb * sb) > 0
          |            THEN round(CAST(n_win * sab - sa * sb AS DOUBLE) /
          |                 (sqrt(CAST(n_win * saa - sa * sa AS DOUBLE)) *
          |                  sqrt(CAST(n_win * sbb - sb * sb AS DOUBLE))), 6)
          |       END AS corr
          |FROM w ORDER BY ord""".stripMargin,

      // scaled-long component sums; cosine of SUM vectors == centroid
      // cosine (scale invariance); every gated float one fixed tower
      "q_label_centroids" ->
        """WITH comps AS (
          |  SELECT label, idx,
          |         CAST(floor(CAST(embedding[idx + 1] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS q
          |  FROM (SELECT label, embedding, unnest(range(len(embedding))) AS idx
          |        FROM embeddings)),
          |cent AS (SELECT label, idx, sum(q) AS sq FROM comps GROUP BY 1, 2),
          |norms AS (SELECT label, sum(sq * sq) AS nrm FROM cent GROUP BY 1),
          |cnts AS (SELECT label, count(*) AS n FROM embeddings GROUP BY 1),
          |pair AS (
          |  SELECT a.label AS label_a, b.label AS label_b, sum(a.sq * b.sq) AS dt
          |  FROM cent a JOIN cent b ON a.idx = b.idx AND a.label < b.label
          |  GROUP BY 1, 2)
          |SELECT p.label_a, p.label_b,
          |       CAST(ca.n AS BIGINT) AS n_a, CAST(cb.n AS BIGINT) AS n_b,
          |       round(CAST(p.dt AS DOUBLE) /
          |             (sqrt(CAST(na.nrm AS DOUBLE)) * sqrt(CAST(nb.nrm AS DOUBLE))), 6)
          |         AS centroid_cos
          |FROM pair p
          |JOIN norms na ON na.label = p.label_a
          |JOIN norms nb ON nb.label = p.label_b
          |JOIN cnts ca ON ca.label = p.label_a
          |JOIN cnts cb ON cb.label = p.label_b
          |ORDER BY label_a, label_b""".stripMargin,

      // same tokenize CTE as q_dup_spans; bigram strings via the
      // 2-element list slice; conditional margin = c12 grouped by the
      // first word. Docs with < 2 tokens emit no rows on either engine.
      "q_bigram_surprisal" ->
        """WITH toks AS (
          |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS l
          |  FROM documents),
          |big AS (
          |  SELECT doc_id, unnest([array_to_string(l[i:i+1], ' ') for i in range(1, len(l))]) AS bg
          |  FROM toks),
          |c12 AS (SELECT bg, count(*) AS n12 FROM big GROUP BY 1),
          |c1 AS (SELECT split_part(bg, ' ', 1) AS w1, sum(n12) AS n1
          |       FROM c12 GROUP BY 1)
          |SELECT doc_id, count(*) AS n_bigrams,
          |       round(avg(ln(CAST(n1 AS DOUBLE)) - ln(CAST(n12 AS DOUBLE))), 4)
          |         AS bigram_surprisal
          |FROM big
          |JOIN c12 USING (bg)
          |JOIN c1 ON split_part(bg, ' ', 1) = c1.w1
          |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

      // Kneser–Ney continuation counts: distinct left contexts per word
      // and the continuation probability vs distinct bigram types, as
      // exact integer parts-per-billion
      "q_kn_continuation" ->
        """WITH toks AS (
          |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS l
          |  FROM documents),
          |big AS (
          |  SELECT doc_id, unnest([array_to_string(l[i:i+1], ' ') for i in range(1, len(l))]) AS bg
          |  FROM toks),
          |pairs AS (SELECT split_part(bg, ' ', 1) AS w1, split_part(bg, ' ', 2) AS w2 FROM big),
          |types AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_tok FROM pairs GROUP BY 1, 2),
          |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_types FROM types),
          |cont AS (SELECT w2 AS w, CAST(count(*) AS BIGINT) AS n_ctx,
          |                CAST(sum(n_tok) AS BIGINT) AS n_tok
          |         FROM types GROUP BY 1)
          |SELECT w, n_ctx, n_tok, (n_ctx * 1000000000) // n_types AS cont_ppb
          |FROM cont, tot WHERE n_ctx >= 5 ORDER BY w""".stripMargin,

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

      // bounded single-batch run ⇒ within-watermark dedup == exact
      // distinct (same oracle as q_stream_dedup; the state contract
      // differs, not the bounded result)
      "q_stream_dedup_wm" ->
        """SELECT event_type, count(DISTINCT user_id) AS n_users
          |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

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

      // integer-scaled idf ((N*1000) // df — no ln), exact integer
      // dot/norms, one final IEEE tower: bit-identical to Spark
      "q_tfidf_pairs" ->
        """WITH toks AS (
          |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')) AS term
          |  FROM documents),
          |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
          |dfr AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
          |nd AS (SELECT count(*) AS n_docs FROM documents),
          |wt AS (
          |  SELECT doc_id, tf.term, tf * ((n_docs * 1000) // df) AS w
          |  FROM tf JOIN dfr USING (term) CROSS JOIN nd
          |  WHERE df >= 2 AND df <= n_docs * 0.1),
          |norms AS (SELECT doc_id, sum(w * w) AS ssq FROM wt GROUP BY 1),
          |pairs AS (
          |  SELECT wa.doc_id AS a, wb.doc_id AS b,
          |         sum(wa.w * wb.w) AS dot, count(*) AS n_shared
          |  FROM wt wa JOIN wt wb ON wa.term = wb.term AND wa.doc_id < wb.doc_id
          |  GROUP BY 1, 2),
          |scored AS (
          |  SELECT a, b, CAST(n_shared AS BIGINT) AS n_shared,
          |         round(CAST(dot AS DOUBLE) /
          |               (sqrt(CAST(na.ssq AS DOUBLE)) * sqrt(CAST(nb.ssq AS DOUBLE))), 6) AS cos_r
          |  FROM pairs JOIN norms na ON pairs.a = na.doc_id
          |             JOIN norms nb ON pairs.b = nb.doc_id)
          |SELECT a, b, n_shared, cos_r FROM scored
          |WHERE cos_r >= 0.25
          |ORDER BY cos_r DESC, a, b LIMIT 50""".stripMargin,

      // classifier-score CTE chain shared with q_calibration; decile
      // rank over (r DESC, doc_id) is a total order, so ntile matches
      "q_lift_table" ->
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
          |rk AS (
          |  SELECT s.doc_id, r, pos,
          |         ntile(10) OVER (ORDER BY r DESC, s.doc_id) AS bucket
          |  FROM s JOIN lab USING (doc_id)),
          |pb AS (
          |  SELECT bucket, count(*) AS n, CAST(sum(pos) AS BIGINT) AS n_pos
          |  FROM rk GROUP BY 1),
          |c AS (
          |  SELECT bucket, n, n_pos,
          |         sum(n) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS cum_n,
          |         sum(n_pos) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS cum_pos,
          |         sum(n) OVER () AS tot_n, sum(n_pos) OVER () AS tot_pos
          |  FROM pb)
          |SELECT CAST(bucket AS INTEGER) AS bucket, n, n_pos,
          |       CAST(cum_n AS BIGINT) AS cum_n, CAST(cum_pos AS BIGINT) AS cum_pos,
          |       round(CAST(cum_pos AS DOUBLE) / CAST(cum_n AS DOUBLE), 6) AS cum_precision,
          |       CASE WHEN tot_pos > 0
          |            THEN round(CAST(cum_pos * tot_n AS DOUBLE) / CAST(cum_n * tot_pos AS DOUBLE), 6)
          |       END AS lift
          |FROM c ORDER BY bucket""".stripMargin,

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

      // recursive twin of the Spark fold; l' appears verbatim inside
      // b' on both sides so the IEEE op sequences are identical
      "q_holt" ->
        """WITH RECURSIVE daily AS (
          |  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
          |         round(sum(value), 2) AS day_total,
          |         CAST(row_number() OVER (PARTITION BY event_type ORDER BY date_trunc('day', ts)) AS INTEGER) AS rn
          |  FROM events GROUP BY 1, date_trunc('day', ts)),
          |holt(event_type, day, day_total, rn, l, b) AS (
          |  SELECT event_type, day, day_total, rn, day_total, CAST(0.0 AS DOUBLE)
          |  FROM daily WHERE rn = 1
          |  UNION ALL
          |  SELECT d.event_type, d.day, d.day_total, d.rn,
          |         0.5 * d.day_total + 0.5 * (h.l + h.b),
          |         0.3 * ((0.5 * d.day_total + 0.5 * (h.l + h.b)) - h.l) + 0.7 * h.b
          |  FROM holt h JOIN daily d
          |    ON d.event_type = h.event_type AND d.rn = h.rn + 1)
          |SELECT event_type, day, day_total,
          |       round(l, 6) AS level, round(b, 6) AS trend,
          |       round(l + b, 6) AS forecast_next
          |FROM holt ORDER BY event_type, day""".stripMargin,

      // same bucket CTE as the ANN family; both argmax directions rank
      // on the rounded cosine with the neighbor id tie-break
      "q_reciprocal_match" ->
        s"""WITH b AS (
           |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
           |         CAST(${sqlHyperplaneBucket("embedding")} AS INTEGER) AS bucket
           |  FROM embeddings),
           |p AS (
           |  SELECT a.vec_id AS src, bb.vec_id AS dst,
           |         round(list_cosine_similarity(a.v, bb.v), 6) AS c
           |  FROM b a JOIN b bb ON a.bucket = bb.bucket AND a.vec_id <> bb.vec_id),
           |best AS (
           |  SELECT src, dst, c FROM (
           |    SELECT src, dst, c,
           |           row_number() OVER (PARTITION BY src ORDER BY c DESC, dst) AS r
           |    FROM p) WHERE r = 1)
           |SELECT f.src AS id1, f.dst AS id2, f.c AS cosine
           |FROM best f JOIN best g ON f.src = g.dst AND f.dst = g.src
           |WHERE f.src < f.dst
           |ORDER BY id1""".stripMargin,

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

      "q_rank_functions" ->
        """WITH spend AS (
          |  SELECT o_custkey,
          |         CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS spend
          |  FROM orders GROUP BY 1),
          |g AS (
          |  SELECT c_nationkey, c_custkey, spend
          |  FROM customer JOIN spend ON c_custkey = o_custkey),
          |r AS (
          |  SELECT c_nationkey, c_custkey, spend,
          |         CAST(dense_rank() OVER w AS INTEGER) AS drank,
          |         round(percent_rank() OVER w, 6) AS pct_rank,
          |         round(cume_dist() OVER w, 6) AS cume,
          |         CAST(ntile(4) OVER (PARTITION BY c_nationkey
          |           ORDER BY spend DESC, c_custkey) AS INTEGER) AS quartile
          |  FROM g WINDOW w AS (PARTITION BY c_nationkey ORDER BY spend DESC))
          |SELECT * FROM r WHERE drank <= 3
          |ORDER BY c_nationkey, spend DESC, c_custkey""".stripMargin,

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
           |         (${sqlLangVotes("en")}) AS en,
           |         (${sqlLangVotes("es")}) AS es,
           |         (${sqlLangVotes("fr")}) AS fr
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

      // isodow(day)-1 == Spark weekday (Monday=0); 7×detrended stays
      // integer so only the final index divides
      "q_seasonal_decompose" ->
        """WITH daily AS (
          |  SELECT event_type, date_trunc('day', ts) AS day,
          |         CAST(floor(round(sum(value), 2) * 100 + 0.5) AS BIGINT) AS cents
          |  FROM events GROUP BY 1, 2),
          |w AS (
          |  SELECT event_type, day, cents,
          |         sum(cents) OVER (PARTITION BY event_type ORDER BY day
          |           ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS sum7,
          |         count(*) OVER (PARTITION BY event_type ORDER BY day
          |           ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS n7
          |  FROM daily),
          |d AS (
          |  SELECT event_type, isodow(day) - 1 AS dow, cents * 7 - sum7 AS d7
          |  FROM w WHERE n7 = 7)
          |SELECT event_type, CAST(dow AS INTEGER) AS dow, count(*) AS n_days,
          |       round(CAST(sum(d7) AS DOUBLE) / CAST(count(*) * 7 AS DOUBLE) / 100.0, 4) AS seasonal_idx
          |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

      "q_partition_layout" ->
        """WITH ev AS (
          |  SELECT event_type AS v1, strftime(ts, '%Y-%m-%d') AS v2,
          |         CAST(user_id % 64 AS VARCHAR) AS v3
          |  FROM events),
          |st AS (
          |  SELECT 'day' AS cand, v2 AS v FROM ev
          |  UNION ALL SELECT 'event_type', v1 FROM ev
          |  UNION ALL SELECT 'user_mod64', v3 FROM ev),
          |g AS (SELECT cand, v, count(*) AS n FROM st GROUP BY 1, 2)
          |SELECT cand, count(*) AS n_partitions,
          |       CAST(max(n) AS BIGINT) AS max_rows,
          |       CAST(min(n) AS BIGINT) AS min_rows,
          |       CAST(sum(n) AS BIGINT) AS n_rows,
          |       CAST((max(n) * count(*) * 100) // sum(n) AS BIGINT) AS skew_x100,
          |       (count(*) BETWEEN 5 AND 10000
          |        AND (max(n) * count(*) * 100) // sum(n) < 300) AS recommended
          |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,

      // same md5 split-bucket mirror as q_group_split; fingerprint =
      // md5 of whitespace-normalized lowercased text
      "q_split_leakage" ->
        """WITH d AS (
          |  SELECT doc_id,
          |         CASE WHEN b < 13 THEN 'train' WHEN b < 15 THEN 'val' ELSE 'test' END AS split,
          |         md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
          |  FROM (SELECT doc_id, text,
          |          instr('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS b
          |        FROM documents)),
          |f AS (SELECT fp, count(DISTINCT split) AS n_splits FROM d GROUP BY 1)
          |SELECT split, count(*) AS n_docs,
          |       count(CASE WHEN n_splits > 1 THEN 1 END) AS n_leaky_docs,
          |       count(DISTINCT CASE WHEN n_splits > 1 THEN fp END) AS n_leaky_fps
          |FROM d JOIN f USING (fp)
          |GROUP BY 1 ORDER BY 1""".stripMargin,

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

      // high bits of the Knuth multiplicative hash; ·8 then >>32 is an
      // exact power-of-two division, integer end to end
      "q_shard_assign" ->
        """WITH b AS (
          |  SELECT *, ((((doc_id * 2654435761) % 4294967296) * 8) >> 32) AS shard
          |  FROM documents)
          |SELECT shard, count(*) AS n_docs,
          |       CAST(sum(n_chars) AS BIGINT) AS n_chars_total,
          |       count(DISTINCT lang) AS n_langs,
          |       CAST(min(doc_id) AS BIGINT) AS min_doc,
          |       CAST(max(doc_id) AS BIGINT) AS max_doc
          |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,

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

      // positional self-join mirror of the narrow zip_with generation:
      // unnest-with-subscripts, pairs at index distance 1..2
      "q_skipgram" ->
        s"""WITH toks AS (SELECT doc_id, $sqlTokens AS l FROM documents),
           |u AS (
           |  SELECT doc_id, unnest(l) AS w, generate_subscripts(l, 1) AS i
           |  FROM toks),
           |p AS (
           |  SELECT a.w AS w1, b.w AS w2, CAST(b.i - a.i AS INTEGER) AS dist
           |  FROM u a JOIN u b
           |    ON a.doc_id = b.doc_id AND b.i - a.i BETWEEN 1 AND 2),
           |c AS (SELECT w1, w2, dist, count(*) AS n FROM p GROUP BY 1, 2, 3)
           |SELECT w1, w2, dist, CAST(n AS BIGINT) AS n FROM c
           |ORDER BY n DESC, w1, w2, dist LIMIT 30""".stripMargin,

      "q_grid_join" ->
        s"""WITH $sqlGridCtes,
           |j AS (
           |  SELECT greatest(abs(ax - b.x), abs(ay - b.y)) AS dist
           |  FROM pr JOIN g b ON pr.ncx = b.cx AND pr.ncy = b.cy
           |                  AND pr.id_a < b.event_id
           |  WHERE greatest(abs(ax - b.x), abs(ay - b.y)) <= 8)
           |SELECT dist, count(*) AS n_pairs FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

      // directional join (id_a <> id_b) gives the symmetric candidate
      // set directly; argmin by the (dist, id) total order
      "q_spatial_nn" ->
        s"""WITH $sqlGridCtes,
           |j AS (
           |  SELECT id_a, b.event_id AS id_b,
           |         greatest(abs(ax - b.x), abs(ay - b.y)) AS dist
           |  FROM pr JOIN g b ON pr.ncx = b.cx AND pr.ncy = b.cy
           |                  AND pr.id_a <> b.event_id
           |  WHERE greatest(abs(ax - b.x), abs(ay - b.y)) <= 8),
           |n AS (
           |  SELECT id_a, id_b, dist,
           |         row_number() OVER (PARTITION BY id_a ORDER BY dist, id_b) AS rn
           |  FROM j)
           |SELECT id_a AS id, id_b AS nn_id, CAST(dist AS BIGINT) AS nn_dist
           |FROM n WHERE rn = 1 ORDER BY id""".stripMargin,

      // cell-level DBSCAN: same md5 points, 200-cell quantization, core
      // at >= 6, recursive-CTE min-label components over 8-neighbor core
      // cells, cell-level border adoption, noise = -1
      "q_dbscan_grid" ->
        """WITH RECURSIVE c AS (
          |  SELECT event_id,
          |         CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 AS x,
          |         CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR)), 9, 8)) AS BIGINT) % 10000 AS y
          |  FROM events),
          |g AS (SELECT event_id, x // 200 AS cx, y // 200 AS cy FROM c),
          |cells AS (SELECT cx, cy, count(*) AS n FROM g GROUP BY 1, 2),
          |core AS (SELECT cx * 1000000 + cy AS k, cx, cy FROM cells WHERE n >= 6),
          |edge AS (SELECT a.k AS src, b.k AS dst FROM core a JOIN core b
          |         ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1),
          |r(k, lbl) AS (
          |  SELECT src, src FROM edge
          |  UNION
          |  SELECT e.src, r.lbl FROM edge e JOIN r ON e.dst = r.k),
          |lab AS (SELECT k, min(lbl) AS cluster_id FROM r GROUP BY 1),
          |border AS (
          |  SELECT nc.cx, nc.cy, min(lab.cluster_id) AS cluster_id
          |  FROM (SELECT cx, cy FROM cells WHERE n < 6) nc
          |  JOIN core ON abs(nc.cx - core.cx) <= 1 AND abs(nc.cy - core.cy) <= 1
          |  JOIN lab ON lab.k = core.k
          |  GROUP BY 1, 2),
          |pt AS (
          |  SELECT g.event_id, g.cx, g.cy,
          |         CASE WHEN lab.cluster_id IS NOT NULL THEN lab.cluster_id
          |              WHEN border.cluster_id IS NOT NULL THEN border.cluster_id
          |              ELSE -1 END AS cluster_id,
          |         CASE WHEN lab.cluster_id IS NOT NULL THEN 1 ELSE 0 END AS is_core
          |  FROM g
          |  LEFT JOIN lab ON lab.k = g.cx * 1000000 + g.cy
          |  LEFT JOIN border ON border.cx = g.cx AND border.cy = g.cy)
          |SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_points,
          |       CAST(sum(is_core) AS BIGINT) AS n_core_points,
          |       CAST(count(DISTINCT cx * 1000000 + cy) AS BIGINT) AS n_cells
          |FROM pt GROUP BY 1 ORDER BY cluster_id""".stripMargin,

      "q_max_concurrency_chunked" ->
        s"""WITH $sqlSessionCtes,
           |dd AS (
           |  SELECT session_start AS t, 1 AS d FROM sess
           |  UNION ALL SELECT session_end, -1 FROM sess),
           |r AS (
           |  SELECT t, d,
           |         sum(d) OVER (ORDER BY t ASC, d DESC ROWS UNBOUNDED PRECEDING) AS running
           |  FROM dd)
           |SELECT strftime(t, '%Y-%m-%d') AS day,
           |       CAST(sum(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_starts,
           |       CAST(max(running) AS BIGINT) AS peak_concurrency
           |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

      "q_max_concurrency" ->
        s"""WITH $sqlSessionCtes,
           |dd AS (
           |  SELECT session_start AS t, 1 AS d FROM sess
           |  UNION ALL SELECT session_end, -1 FROM sess),
           |r AS (
           |  SELECT t, d,
           |         sum(d) OVER (ORDER BY t ASC, d DESC ROWS UNBOUNDED PRECEDING) AS running
           |  FROM dd)
           |SELECT strftime(t, '%Y-%m-%d') AS day,
           |       CAST(sum(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_starts,
           |       CAST(max(running) AS BIGINT) AS peak_concurrency
           |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

      // the oracle recomputes the two-generation split from the live
      // table: generation 1 (l_linenumber=1) has no disc_c, so its
      // rows contribute null to the merged column
      "q_schema_evolution" ->
        """SELECT l_returnflag AS rflag, count(*) AS n,
          |       count(CASE WHEN l_linenumber = 2 THEN 1 END) AS n_with_disc,
          |       CAST(sum(floor(l_quantity)) AS BIGINT) AS sum_qty,
          |       CAST(sum(CASE WHEN l_linenumber = 2
          |                     THEN floor(l_discount * 100) END) AS BIGINT) AS sum_disc
          |FROM lineitem WHERE l_linenumber IN (1, 2)
          |GROUP BY 1 ORDER BY 1""".stripMargin,

      // step decay: weights are exact powers of two (1 << steps), the
      // nano-quantized terms exact doubles — no libm anywhere
      "q_decayed_count" ->
        """WITH daily AS (
          |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
          |  FROM events GROUP BY 1, 2),
          |m AS (SELECT max(day) AS max_day FROM daily),
          |w AS (
          |  SELECT event_type, n, least((max_day - day) // 7, 62) AS steps
          |  FROM daily, m),
          |q AS (
          |  SELECT event_type, n,
          |         CAST(floor(CAST(n AS DOUBLE) * 1e9 /
          |              CAST(1 << steps AS DOUBLE)) AS BIGINT) AS w_nano
          |  FROM w)
          |SELECT event_type, CAST(sum(n) AS BIGINT) AS n_total,
          |       round(CAST(sum(w_nano) AS DOUBLE) / 1e9, 6) AS decayed_count
          |FROM q GROUP BY 1 ORDER BY 1""".stripMargin,

      // same apex cap, wedge grouping, anti-join, and (cn, id) total
      // order as Graph.commonNeighbors
      "q_common_neighbors" ->
        s"""WITH ${sqlCoPurchaseCtes(2)},
           |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
           |keep AS (SELECT src FROM deg WHERE deg <= 60),
           |ke AS (SELECT e.src AS u, e.dst AS v FROM e
           |       JOIN keep k ON e.src = k.src),
           |cn AS (
           |  SELECT a.v AS id1, b.v AS id2, count(*) AS cn
           |  FROM ke a JOIN ke b ON a.u = b.u AND a.v < b.v
           |  GROUP BY 1, 2 HAVING count(*) >= 2),
           |nonadj AS (
           |  SELECT cn.id1, cn.id2, cn.cn FROM cn WHERE NOT EXISTS (
           |    SELECT 1 FROM e WHERE e.src = cn.id1 AND e.dst = cn.id2))
           |SELECT id1, id2, CAST(cn AS BIGINT) AS cn FROM nonadj
           |ORDER BY cn DESC, id1, id2 LIMIT 40""".stripMargin,

      "q_full_outer_recon" ->
        """WITH a AS (
          |  SELECT o_custkey, count(*) AS n_a,
          |         CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents_a
          |  FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01' GROUP BY 1),
          |b AS (
          |  SELECT o_custkey, count(*) AS n_b,
          |         CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents_b
          |  FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01' GROUP BY 1),
          |j AS (
          |  SELECT CASE WHEN a.o_custkey IS NULL THEN 'right_only'
          |              WHEN b.o_custkey IS NULL THEN 'left_only'
          |              ELSE 'changed' END AS status,
          |         COALESCE(cents_b, 0) - COALESCE(cents_a, 0) AS delta_cents
          |  FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey)
          |SELECT status, count(*) AS n_customers,
          |       CAST(sum(delta_cents) AS BIGINT) AS total_delta_cents
          |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

      "q_url_parse" ->
        """WITH u AS (
          |  SELECT 'https://' || source || '.example.com/docs/' || lang || '/'
          |           || doc_id || '?ref=r' || (n_chars % 7) AS url
          |  FROM documents),
          |p AS (
          |  SELECT regexp_extract(url, '^https?://([^/?#]+)', 1) AS host,
          |         regexp_extract(url, '^https?://[^/?#]+/[^/?#]+/([^/?#]+)', 1) AS seg2,
          |         regexp_extract(url, '[?&]ref=([^&#]*)', 1) AS ref
          |  FROM u)
          |SELECT host, count(*) AS n_urls,
          |       CAST(count(DISTINCT ref) AS BIGINT) AS n_refs,
          |       CAST(count(DISTINCT seg2) AS BIGINT) AS n_langs
          |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,

      // DuckDB decorrelates the same way; the avg is engine-stable
      // (integral doubles sum exactly in any order)
      "q_tpch_q17ish" ->
        """SELECT count(*) AS n_rows,
          |       CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) // 7
          |         AS avg_weekly_cents
          |FROM lineitem JOIN part ON p_partkey = l_partkey
          |WHERE p_partkey % 5 = 0
          |  AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
          |                    WHERE l2.l_partkey = p_partkey)
          |ORDER BY n_rows""".stripMargin,

      "q_audience_overlap" ->
        """WITH au AS (
          |  SELECT event_type, user_id FROM events
          |  GROUP BY 1, 2 HAVING count(*) >= 15),
          |sz AS (SELECT event_type, count(*) AS n FROM au GROUP BY 1),
          |inter AS (
          |  SELECT a.event_type AS t1, b.event_type AS t2, count(*) AS n_both
          |  FROM au a JOIN au b ON a.user_id = b.user_id AND a.event_type < b.event_type
          |  GROUP BY 1, 2)
          |SELECT t1, t2, sa.n AS n_a, sb.n AS n_b, n_both,
          |       round(CAST(n_both AS DOUBLE) / (sa.n + sb.n - n_both), 6) AS jaccard
          |FROM inter JOIN sz sa ON sa.event_type = t1
          |JOIN sz sb ON sb.event_type = t2
          |ORDER BY t1, t2""".stripMargin,

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

      // PQ mirrored stage-for-stage: one global int8 scale, codebook =
      // sub-vectors of rows vec_id<16, integer-L2 argmin assignment
      // (ties to smallest code), integer ADC lookup sums
      "q_pq_topk" ->
        """WITH base AS (
          |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
          |sc AS (
          |  SELECT max(list_max(list_transform(v, x -> abs(x)))) / 127.0 AS scale FROM base),
          |q8 AS (
          |  SELECT vec_id,
          |         CASE WHEN sc.scale = 0 THEN [CAST(0 AS BIGINT) for x in v]
          |              ELSE [CAST(round(x / sc.scale) AS BIGINT) for x in v] END AS q
          |  FROM base, sc),
          |sub AS (
          |  SELECT vec_id, j, list_slice(q, j * (len(q) // 4) + 1,
          |                               (j + 1) * (len(q) // 4)) AS s
          |  FROM q8, range(0, 4) r(j)),
          |cb AS (SELECT vec_id AS code_id, j, s AS c FROM sub WHERE vec_id < 16),
          |assign AS (
          |  SELECT vec_id, j, code_id,
          |         list_sum([(s[i] - c[i]) * (s[i] - c[i])
          |                   for i in range(1, len(s) + 1)]) AS dist
          |  FROM sub JOIN cb USING (j)),
          |codes AS (
          |  SELECT vec_id, j, code_id FROM assign
          |  QUALIFY row_number() OVER (PARTITION BY vec_id, j ORDER BY dist, code_id) = 1),
          |lut AS (
          |  SELECT qs.vec_id AS query_id, qs.j, cb.code_id,
          |         CAST(list_sum([qs.s[i] * cb.c[i]
          |                        for i in range(1, len(qs.s) + 1)]) AS BIGINT) AS d
          |  FROM sub qs JOIN cb ON qs.j = cb.j WHERE qs.vec_id < 8),
          |score AS (
          |  SELECT l.query_id, c.vec_id AS neighbor_id, CAST(sum(l.d) AS BIGINT) AS adc
          |  FROM codes c JOIN lut l ON l.j = c.j AND l.code_id = c.code_id
          |  WHERE c.vec_id <> l.query_id
          |  GROUP BY 1, 2)
          |SELECT query_id,
          |       CAST(row_number() OVER (PARTITION BY query_id
          |                               ORDER BY adc DESC, neighbor_id) AS INTEGER) AS rank,
          |       neighbor_id, adc
          |FROM score QUALIFY rank <= 3 ORDER BY query_id, rank""".stripMargin,

      // md5 over the identical "c_p" string reproduces the draw
      "q_neg_sample" ->
        """WITH inter AS (
          |  SELECT DISTINCT o_custkey AS c, l_partkey AS p
          |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
          |pop AS (
          |  SELECT l_partkey AS p FROM lineitem GROUP BY 1
          |  ORDER BY count(*) DESC, l_partkey LIMIT 50),
          |cand AS (SELECT c_custkey AS c, pop.p FROM customer CROSS JOIN pop),
          |neg AS (
          |  SELECT c, p FROM cand
          |  WHERE NOT EXISTS (SELECT 1 FROM inter i WHERE i.c = cand.c AND i.p = cand.p))
          |SELECT c AS c_custkey,
          |       CAST(row_number() OVER (PARTITION BY c
          |            ORDER BY md5(c || '_' || p), p) AS INTEGER) AS rank,
          |       p AS p_partkey
          |FROM neg QUALIFY rank <= 5 ORDER BY c_custkey, rank""".stripMargin,

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

      // same pair threshold, symmetrize, and 3 unrolled PR rounds as
      // the q_pagerank oracle, over the word co-occurrence edges
      "q_textrank" ->
        """WITH toks AS (
          |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS l
          |  FROM documents),
          |bg AS (
          |  SELECT unnest([array_to_string(l[i:i+1], ' ') for i in range(1, len(l))]) AS bgm
          |  FROM toks),
          |sp AS (SELECT string_split(bgm, ' ') AS w FROM bg),
          |p AS (
          |  SELECT w[1] AS src, w[2] AS dst FROM sp WHERE w[1] < w[2]
          |  GROUP BY 1, 2 HAVING count(*) >= 35),
          |e AS (SELECT src, dst FROM p UNION ALL SELECT dst, src FROM p),
          |deg AS (SELECT src, count(*) AS out_deg FROM e GROUP BY 1),
          |nodes AS (SELECT DISTINCT src AS id FROM e),
          |nn AS (SELECT count(*) AS n FROM nodes),
          |pr0 AS (SELECT id, CAST(1.0 AS DOUBLE) / nn.n AS pr FROM nodes CROSS JOIN nn),
          |pr1 AS (
          |  SELECT nodes.id, CAST(0.15 AS DOUBLE) / nn.n
          |         + CAST(0.85 AS DOUBLE) * COALESCE(i1.inflow, CAST(0.0 AS DOUBLE)) AS pr
          |  FROM nodes CROSS JOIN nn
          |  LEFT JOIN (SELECT e.dst AS id, sum(pp.pr / CAST(d.out_deg AS DOUBLE)) AS inflow
          |             FROM e JOIN pr0 pp ON pp.id = e.src JOIN deg d ON d.src = e.src
          |             GROUP BY 1) i1 ON i1.id = nodes.id),
          |pr2 AS (
          |  SELECT nodes.id, CAST(0.15 AS DOUBLE) / nn.n
          |         + CAST(0.85 AS DOUBLE) * COALESCE(i2.inflow, CAST(0.0 AS DOUBLE)) AS pr
          |  FROM nodes CROSS JOIN nn
          |  LEFT JOIN (SELECT e.dst AS id, sum(pp.pr / CAST(d.out_deg AS DOUBLE)) AS inflow
          |             FROM e JOIN pr1 pp ON pp.id = e.src JOIN deg d ON d.src = e.src
          |             GROUP BY 1) i2 ON i2.id = nodes.id),
          |pr3 AS (
          |  SELECT nodes.id, CAST(0.15 AS DOUBLE) / nn.n
          |         + CAST(0.85 AS DOUBLE) * COALESCE(i3.inflow, CAST(0.0 AS DOUBLE)) AS pr
          |  FROM nodes CROSS JOIN nn
          |  LEFT JOIN (SELECT e.dst AS id, sum(pp.pr / CAST(d.out_deg AS DOUBLE)) AS inflow
          |             FROM e JOIN pr2 pp ON pp.id = e.src JOIN deg d ON d.src = e.src
          |             GROUP BY 1) i3 ON i3.id = nodes.id)
          |SELECT id AS word, round(pr, 6) AS score FROM pr3
          |ORDER BY score DESC, word LIMIT 20""".stripMargin,

      "q_gopher_rules" ->
        """WITH toks AS (
          |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS l
          |  FROM documents),
          |m AS (
          |  SELECT doc_id, CAST(len(l) AS BIGINT) AS n,
          |         -- COALESCE: DuckDB list_sum([]) is NULL while Spark's
          |         -- aggregate seeds 0, so a zero-token doc must sum to 0
          |         -- on both sides (rules then pass vacuously on both)
          |         COALESCE(list_sum(list_transform(l, w -> CAST(length(w) AS BIGINT))), 0) AS sumlen,
          |         COALESCE(list_sum(list_transform(l, w ->
          |           CASE WHEN regexp_matches(w, '[a-z]') THEN 1 ELSE 0 END)), 0) AS nalpha,
          |         ((CASE WHEN list_contains(l, 'the') THEN 1 ELSE 0 END)
          |          + (CASE WHEN list_contains(l, 'a') THEN 1 ELSE 0 END)
          |          + (CASE WHEN list_contains(l, 'of') THEN 1 ELSE 0 END)
          |          + (CASE WHEN list_contains(l, 'to') THEN 1 ELSE 0 END)
          |          + (CASE WHEN list_contains(l, 'and') THEN 1 ELSE 0 END)) AS nstop
          |  FROM toks),
          |r AS (
          |  SELECT 'alpha_words' AS rule, (nalpha * 5 >= n * 4) AS pass FROM m
          |  UNION ALL SELECT 'mean_word_len', (sumlen >= 3 * n AND sumlen <= 10 * n) FROM m
          |  UNION ALL SELECT 'stopwords', (nstop >= 2) FROM m
          |  UNION ALL SELECT 'word_count', (n BETWEEN 5 AND 10000) FROM m)
          |SELECT rule, count(*) AS n_docs,
          |       CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
          |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

      // the two covering starts of a 2h-window/1h-slide grid
      "q_stream_sliding" ->
        """WITH w AS (
          |  SELECT event_type,
          |         unnest([date_trunc('hour', ts),
          |                 date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS ws
          |  FROM events)
          |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS w_start, event_type,
          |       count(*) AS n_events
          |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

      // batch time-range self-join — bounded-input streaming interval
      // join must converge to exactly this
      "q_stream_interval_join" ->
        """SELECT v.user_id, c.event_id AS click_id, v.event_id AS view_id,
          |       CAST(epoch_us(c.ts) - epoch_us(v.ts) AS BIGINT) AS lag_us
          |FROM events v JOIN events c
          |  ON v.user_id = c.user_id
          | AND v.event_type = 'view' AND c.event_type = 'click'
          | AND v.ts <= c.ts AND v.ts >= c.ts - INTERVAL 240 MINUTE
          |ORDER BY click_id, view_id""".stripMargin,

      "q_cdc_tombstone" ->
        """WITH ops AS (
          |  SELECT user_id, event_id, ts, event_type, value,
          |         CASE WHEN event_id % 10 = 0 THEN 'D' ELSE 'U' END AS op
          |  FROM events),
          |last AS (
          |  SELECT user_id, event_type, value, op,
          |         row_number() OVER (PARTITION BY user_id
          |                            ORDER BY ts DESC, event_id DESC) AS rn
          |  FROM ops)
          |SELECT user_id, event_type, value FROM last
          |WHERE rn = 1 AND op <> 'D' ORDER BY user_id""".stripMargin,

      // the same integer cross-multiplied 2-sigma identity
      "q_rolling_anomaly" ->
        """WITH daily AS (
          |  SELECT n_name, CAST(o_orderdate AS DATE) AS day,
          |         CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
          |  FROM orders JOIN customer ON o_custkey = c_custkey
          |  JOIN nation ON c_nationkey = n_nationkey
          |  GROUP BY 1, 2),
          |w AS (
          |  SELECT n_name, day, cents,
          |         count(*) OVER win AS n,
          |         CAST(sum(cents) OVER win AS BIGINT) AS s,
          |         CAST(sum(cents * cents) OVER win AS BIGINT) AS q
          |  FROM daily
          |  WINDOW win AS (PARTITION BY n_name ORDER BY day
          |                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
          |fl AS (
          |  SELECT n_name,
          |         (n = 7 AND (7 * cents - s) * (7 * cents - s)
          |                    > 4 * (7 * q - s * s)) AS anom
          |  FROM w)
          |SELECT n_name, count(*) AS n_days,
          |       CAST(sum(CASE WHEN anom THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
          |FROM fl GROUP BY 1 ORDER BY 1""".stripMargin,

      "q_seq_gaps" ->
        """WITH g AS (
          |  SELECT l_orderkey, count(*) AS n, min(l_linenumber) AS mn,
          |         max(l_linenumber) AS mx
          |  FROM lineitem GROUP BY 1)
          |SELECT count(*) AS n_orders,
          |       CAST(count(CASE WHEN mn <> 1 OR mx <> n THEN 1 END) AS BIGINT) AS n_gappy,
          |       CAST(sum(mx - n) AS BIGINT) AS n_missing
          |FROM g ORDER BY n_orders""".stripMargin
    )
  }
}
