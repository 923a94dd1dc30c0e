package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.qcew.{NaicsAgg, Resample, Series}
import graft.ext.{Affinity, AsofJoin, Bloom, Corpus, Dedup, EventsStream, Forecast, Graph, Inference, Multimodal, Privacy, Quantiles, ScaleOps, Sessionize, Similarity, Sketch, Spatial, StatefulOps, TextStats, TimeFill}

/** QCEW-lineage relational core: scans, fixed-width, joins, aggregates, windows, set ops, reshape, TPC-H-ish marts.
  *
  * One registry shard of [[SparkEntry]] (split in round 9 —
  * the single 11k-line object was the repo's one
  * maintainability hazard). Entries are verbatim; the shared
  * helpers live in [[QueryShared]]. SparkEntry concatenates
  * all shards and unit gates assert name uniqueness and
  * query/oracle set equality.
  */
private[graft] object QueriesCore {
  import QueryShared._

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(

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
  )

  val oracles: Seq[(String, String)] = Seq(

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


      "q_distinct_picklist" ->
        """SELECT DISTINCT '(N' || p_brand || ') ' || p_type AS label
          |FROM part ORDER BY label""".stripMargin,


      "q_time_period" ->
        """SELECT CAST(year(o_orderdate) AS VARCHAR) || '-q' || CAST(quarter(o_orderdate) AS VARCHAR) AS time_period,
          |       count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_amt
          |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,


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


      "q_range_frame" ->
        """WITH daily AS (
          |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d, count(*) AS n
          |  FROM events GROUP BY 1, 2)
          |SELECT event_type, d, n,
          |       CAST(sum(n) OVER (PARTITION BY event_type ORDER BY d
          |            RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW) AS BIGINT) AS n_7d
          |FROM daily ORDER BY event_type, d""".stripMargin,


      "q_scalar_subquery" ->
        """SELECT o_orderkey, o_totalprice FROM orders
          |WHERE o_totalprice >= CAST(0.9 AS DOUBLE) * (SELECT max(o_totalprice) FROM orders)
          |ORDER BY o_orderkey""".stripMargin,


      "q_filter_nulls" ->
        """SELECT c_mktsegment, count(*) AS n, round(avg(c_acctbal), 4) AS avg_bal
          |FROM customer
          |WHERE c_acctbal IS NOT NULL AND c_mktsegment <> 'BUILDING'
          |  AND trim(CAST(c_name AS VARCHAR)) <> ''
          |GROUP BY 1 ORDER BY 1""".stripMargin,


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


      // The oracle is the semantic definition (inequality BETWEEN
      // join); the Spark side is the binned equi-join rewrite.
      "q_range_join" ->
        s"""WITH $sqlSessionCtes
           |SELECT ev.event_id, ev.user_id, sess.sess_id
           |FROM events ev JOIN sess
           |  ON ev.user_id = sess.user_id
           | AND ev.ts BETWEEN sess.session_start AND sess.session_end
           |ORDER BY event_id""".stripMargin,


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


      "q_setops_all" ->
        """WITH ordered AS (SELECT o_custkey AS c_custkey FROM orders),
          |prio AS (SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
          |ex AS (SELECT c_custkey FROM ordered EXCEPT ALL SELECT c_custkey FROM prio),
          |ia AS (SELECT c_custkey FROM ordered INTERSECT ALL SELECT c_custkey FROM prio)
          |SELECT 'except_all' AS op, c_custkey, count(*) AS n FROM ex GROUP BY 2
          |UNION ALL
          |SELECT 'intersect_all' AS op, c_custkey, count(*) AS n FROM ia GROUP BY 2
          |ORDER BY op, c_custkey""".stripMargin,


      "q_tpch_q18ish" ->
        """WITH big AS (
          |  SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
          |  FROM lineitem GROUP BY 1
          |  HAVING sum(CAST(l_quantity AS BIGINT)) > 300)
          |SELECT o_orderkey, o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
          |       round(o_totalprice, 2) AS o_totalprice, total_qty
          |FROM orders JOIN big ON o_orderkey = l_orderkey
          |ORDER BY total_qty DESC, o_orderkey LIMIT 20""".stripMargin,


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
  )
}
