package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.qcew.{NaicsAgg, Resample, Series}
import graft.ext.{Affinity, AsofJoin, Bloom, Corpus, Dedup, EventsStream, Forecast, Graph, Inference, Multimodal, Privacy, Quantiles, ScaleOps, Sessionize, Similarity, Sketch, Spatial, StatefulOps, TextStats, TimeFill}

/** Structured Streaming twins + event/session/funnel analytics.
  *
  * One registry shard of [[SparkEntry]] (split in round 9 —
  * the single 11k-line object was the repo's one
  * maintainability hazard). Entries are verbatim; the shared
  * helpers live in [[QueryShared]]. SparkEntry concatenates
  * all shards and unit gates assert name uniqueness and
  * query/oracle set equality.
  */
private[graft] object QueriesStream {
  import QueryShared._

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(

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


    // streaming dedup with BOUNDED state: dropDuplicatesWithinWatermark
    // evicts key state as the watermark passes — the unbounded-key
    // production form of q_stream_dedup. Bounded single-batch run ⇒
    // surviving keys == exact distinct (the oracle); the state-size
    // contract is the difference at scale.
    "q_stream_dedup_wm" -> ((s, dir) => {
      EventsStream.runDedupWithinWatermarkOnce(s, s"$dir/events.parquet")
        .orderBy("event_type")
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


    // sampling: recency-weighted popularity — step-decay halving per
    // 7 elapsed days keeps every weight a power of two (no libm), so
    // the score is exact integer arithmetic end to end.
    "q_decayed_count" -> ((s, dir) => {
      ScaleOps.decayedCounts(EventsStream.readEvents(s, s"$dir/events.parquet"),
          Seq("event_type"), col("ts"), halfLifeDays = 7)
        .orderBy("event_type")
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
    }),

    // behavioral entropy per active user: Shannon entropy of the
    // event-type mix, the bot/monoculture detector (a scripted actor
    // does one thing; humans mix). The q_zipf_fit micro-nat trick
    // makes it drift-free: H·n·10⁶ = n·L(n) − Σc·L(c) with
    // L(x) = round(ln x · 10⁶) accumulates as EXACT LONGS — the only
    // float is the final rescale. Shuffle = (user, type) counts.
    "q_session_entropy" -> ((s, dir) => {
      def lmicro(x: Column): Column =
        round(log(x.cast("double")) * 1e6).cast("long")
      EventsStream.readEvents(s, s"$dir/events.parquet")
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
        .groupBy("user_id")
        .agg(sum("c").as("n"), count(lit(1)).as("n_types"),
          sum(col("c") * lmicro(col("c"))).as("clc"))
        .filter(col("n") >= 20)
        .select(col("user_id"), col("n"), col("n_types"),
          round((col("n") * lmicro(col("n")) - col("clc")).cast("double") /
            (col("n").cast("double") * 1e6), 6).as("entropy_nats"))
        .orderBy("user_id")
    }),
  )

  val oracles: Seq[(String, String)] = Seq(

      "q_events_hourly" -> eventsHourlySql,

      "q_events_stream" -> eventsHourlySql,


      "q_stream_enrich" ->
        """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
          |       upper(event_type) AS label,
          |       CAST(length(event_type) AS INTEGER) AS type_weight,
          |       count(*) AS n_events,
          |       CAST(sum(user_id % 100) AS BIGINT) AS user_checksum
          |FROM events GROUP BY 1, 2, 3 ORDER BY 1, 2""".stripMargin,


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


      // full recompute — proves the streaming-maintained partials
      // merge to the same answer (same oracle shape as q_incr_agg)
      "q_stream_rollup" ->
        """SELECT event_type, count(*) AS n_events,
          |       round(sum(value), 4) AS total_value,
          |       round(sum(value) / count(*), 4) AS avg_value
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,


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


      // the stream's final per-key state must equal the batch groupBy
      "q_stream_stateful_totals" ->
        """SELECT user_id, count(*) AS n_purchases,
          |       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
          |FROM events WHERE event_type = 'purchase'
          |GROUP BY 1 ORDER BY user_id""".stripMargin,


      // bounded single-batch run ⇒ within-watermark dedup == exact
      // distinct (same oracle as q_stream_dedup; the state contract
      // differs, not the bounded result)
      "q_stream_dedup_wm" ->
        """SELECT event_type, count(DISTINCT user_id) AS n_users
          |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,


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


      "q_seq_gaps" ->
        """WITH g AS (
          |  SELECT l_orderkey, count(*) AS n, min(l_linenumber) AS mn,
          |         max(l_linenumber) AS mx
          |  FROM lineitem GROUP BY 1)
          |SELECT count(*) AS n_orders,
          |       CAST(count(CASE WHEN mn <> 1 OR mx <> n THEN 1 END) AS BIGINT) AS n_gappy,
          |       CAST(sum(mx - n) AS BIGINT) AS n_missing
          |FROM g ORDER BY n_orders""".stripMargin,

      // micro-nat integer entropy mirrored term for term
      "q_session_entropy" ->
        """WITH c AS (
          |  SELECT user_id, event_type, count(*) AS c
          |  FROM events GROUP BY 1, 2),
          |u AS (
          |  SELECT user_id, CAST(sum(c) AS BIGINT) AS n,
          |         CAST(count(*) AS BIGINT) AS n_types,
          |         CAST(sum(c * CAST(round(ln(CAST(c AS DOUBLE)) * 1e6) AS BIGINT)) AS BIGINT) AS clc
          |  FROM c GROUP BY 1)
          |SELECT user_id, n, n_types,
          |       round(CAST(n * CAST(round(ln(CAST(n AS DOUBLE)) * 1e6) AS BIGINT) - clc AS DOUBLE)
          |             / (n * 1e6), 6) AS entropy_nats
          |FROM u WHERE n >= 20 ORDER BY user_id""".stripMargin,
  )
}
