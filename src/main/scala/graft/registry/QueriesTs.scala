package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.qcew.{NaicsAgg, Resample, Series}
import graft.ext.{Affinity, AsofJoin, Bloom, Corpus, Dedup, EventsStream, Forecast, Graph, Inference, Multimodal, Privacy, Quantiles, ScaleOps, Sessionize, Similarity, Sketch, Spatial, StatefulOps, TextStats, TimeFill}

/** time series: smoothing folds + chunked twins, forecasting, drift/anomaly, resampling, financial rollups.
  *
  * One registry shard of [[SparkEntry]] (split in round 9 —
  * the single 11k-line object was the repo's one
  * maintainability hazard). Entries are verbatim; the shared
  * helpers live in [[QueryShared]]. SparkEntry concatenates
  * all shards and unit gates assert name uniqueness and
  * query/oracle set equality.
  */
private[graft] object QueriesTs {
  import QueryShared._

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(

    // ext ts: Wald–Wolfowitz runs test on the daily-total diff signs
    // per event type — the distribution-free randomness screen over
    // the 30-day grid (Forecast.runsTest scaladoc: both windows share
    // one grid exchange, exact run/sign counts, one z float tower).
    "q_runs_test" -> ((s, dir) => {
      val daily = spread(EventsStream.readEvents(s, s"$dir/events.parquet"))
        .groupBy(col("event_type"),
          datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
            .as("day"))
        .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      Forecast.runsTest(daily, Seq("event_type"), col("day"), col("cents"))
        .orderBy("event_type")
    }),


    // ext ts: view→purchase lead–lag cross-correlation over the daily
    // grid, lags −3..3 — "does A lead B or B lead A, and by how much?"
    // The SYMMETRIC complement to q_xcorr_lag (Inference.crossCorr:
    // one-sided lags 0..k via lead() windows on one series); negative
    // lags answer the reverse-direction question, and the plan shape
    // differs (lag-expanded grid equi-join vs per-lag window columns).
    // Forecast.leadLagCorr scaladoc: per-lag exact power sums.
    "q_lead_lag" -> ((s, dir) => {
      val cents = round(col("value") * 100).cast("long")
      val daily = spread(EventsStream.readEvents(s, s"$dir/events.parquet"))
        .filter(col("event_type").isin("view", "purchase"))
        .groupBy(datediff(col("ts").cast("date"),
          lit("1970-01-01").cast("date")).as("day"))
        .agg(
          sum(when(col("event_type") === "view", cents).otherwise(0L)).as("a"),
          sum(when(col("event_type") === "purchase", cents).otherwise(0L))
            .as("b"))
      Forecast.leadLagCorr(daily, col("day"), col("a"), col("b"), maxLag = 3)
        .orderBy("lag")
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


    // Yule–Walker AR(2) fit + one-step forecast per event type on the
    // daily count series — the "is a real model worth it?" rung above
    // q_seasonal_naive: φ₁/φ₂ from the first two sample
    // autocorrelations (each one division of exact longs), forecast
    // from the series' last two observations via max_by on the same
    // aggregate (Forecast.ar2Forecast scaladoc).
    "q_ar2_forecast" -> ((s, dir) => {
      // spread BEFORE the row-scale groupBy: the date-trunc+format on
      // every event is the CPU-dense stage and inherits the single
      // input split without it (30× sweep: 6.6 s → fan-out)
      val days = spread(EventsStream.readEvents(s, s"$dir/events.parquet"))
        .groupBy(col("event_type"),
          date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("y"))
      Forecast.ar2Forecast(days, keys = Seq("event_type"),
          ord = col("day"), y = col("y"))
        .orderBy("event_type")
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

    // rescaled-range (R/S) Hurst estimate per event type — long-range
    // dependence vs mean reversion of the daily-total series, the
    // memory diagnostic behind "is this metric trending or noise?".
    // Two-scale form: H = (ln RS_full − mean ln RS_half) / ln 2, each
    // segment's R/S from ITS OWN mean. Exactness: the whole R/S core
    // is integer — deviations scale by the segment length m (d = m·c −
    // Σc), the cumulative-deviation range and m·Σc² − (Σc)² stay exact
    // longs — so each segment costs ONE sqrt and one division; series
    // are whole-dollar quantized to keep 30×-scale sums far from 2⁶³.
    // Windows run over the bounded daily grid, segments in parallel.
    "q_hurst_rs" -> ((s, dir) => {
      val daily = EventsStream.readEvents(s, s"$dir/events.parquet")
        .groupBy(col("event_type"),
          date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
        .agg(round(sum("value")).cast("long").as("c"))
      val wType = Window.partitionBy("event_type")
      val base = daily
        .withColumn("n_all", count(lit(1)).over(wType))
        .withColumn("rn", row_number().over(
          Window.partitionBy("event_type").orderBy("day")))
        .withColumn("half",
          when(col("rn") * 2 <= col("n_all"), 1).otherwise(2))
      val segs = base.select(col("event_type"), lit(0).as("seg"),
          col("day"), col("c"))
        .unionAll(base.select(col("event_type"), col("half").as("seg"),
          col("day"), col("c")))
      val wSeg = Window.partitionBy("event_type", "seg")
      val wOrd = Window.partitionBy("event_type", "seg").orderBy("day")
      val rs = segs
        .withColumn("m", count(lit(1)).over(wSeg))
        .withColumn("sc", sum("c").over(wSeg))
        .withColumn("ssq", sum(col("c") * col("c")).over(wSeg))
        .withColumn("t", row_number().over(wOrd))
        .withColumn("cumc", sum("c").over(
          wOrd.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("cumdev", col("m") * col("cumc") - col("t") * col("sc"))
        .groupBy("event_type", "seg")
        .agg(max("m").as("m"),
          (max("cumdev") - min("cumdev")).as("r_scaled"),
          max(col("m") * col("ssq") - col("sc") * col("sc")).as("var_scaled"))
        .select(col("event_type"), col("seg"), col("m"),
          when(col("var_scaled") > 0,
            col("r_scaled").cast("double") /
              sqrt(col("var_scaled").cast("double"))).as("rs"))
      rs.groupBy("event_type")
        .agg(max(when(col("seg") === 0, col("m"))).as("n_days"),
          max(when(col("seg") === 0, col("rs"))).as("rsf"),
          max(when(col("seg") === 1, col("rs"))).as("rs1"),
          max(when(col("seg") === 2, col("rs"))).as("rs2"))
        .select(col("event_type"), col("n_days"),
          round(col("rsf"), 6).as("rs_full"),
          round(col("rs1"), 6).as("rs_half1"),
          round(col("rs2"), 6).as("rs_half2"),
          when(col("rsf") > 0 && col("rs1") > 0 && col("rs2") > 0,
            round((log(col("rsf")) -
              (log(col("rs1")) + log(col("rs2"))) / lit(2.0)) /
              log(lit(2.0)), 6)).as("hurst"))
        .orderBy("event_type")
    }),

    // partial autocorrelation (lags 1–3) per event type via the
    // Durbin–Levinson recursion in CLOSED FORM — the AR-order
    // diagnostic ACF alone can't give (PACF cuts off at the true AR
    // order). The ACF inputs are exact-integer rationals: deviations
    // scale by n (d = n·y − Σy), so every Σ d·d_lag and Σ d² is an
    // exact long and r_k is ONE IEEE division; φ11/φ22/φ33 are then
    // the same literal rational expressions in both engines. One
    // bounded-grid window per type, lags as plain column lags.
    "q_pacf" -> ((s, dir) => {
      val daily = EventsStream.readEvents(s, s"$dir/events.parquet")
        .groupBy(col("event_type"),
          date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("y"))
      val wType = Window.partitionBy("event_type")
      val wOrd = Window.partitionBy("event_type").orderBy("day")
      val sums = daily
        .withColumn("n", count(lit(1)).over(wType))
        .withColumn("sy", sum("y").over(wType))
        .withColumn("d", col("n") * col("y") - col("sy"))
        .withColumn("d1", lag("d", 1).over(wOrd))
        .withColumn("d2", lag("d", 2).over(wOrd))
        .withColumn("d3", lag("d", 3).over(wOrd))
        .groupBy("event_type")
        .agg(max("n").as("n_days"), sum(col("d") * col("d")).as("dd"),
          sum(col("d") * col("d1")).as("n1"),
          sum(col("d") * col("d2")).as("n2"),
          sum(col("d") * col("d3")).as("n3"))
      val r1 = col("n1").cast("double") / col("dd").cast("double")
      val r2 = col("n2").cast("double") / col("dd").cast("double")
      val r3 = col("n3").cast("double") / col("dd").cast("double")
      val phi22 = (r2 - r1 * r1) / (lit(1.0) - r1 * r1)
      val phi21 = r1 - phi22 * r1
      val phi33 = (r3 - phi21 * r2 - phi22 * r1) /
        (lit(1.0) - phi21 * r1 - phi22 * r2)
      sums.select(col("event_type"), col("n_days"),
          round(r1, 6).as("pacf1"), round(phi22, 6).as("pacf2"),
          round(phi33, 6).as("pacf3"))
        .orderBy("event_type")
    }),
  )

  val oracles: Seq[(String, String)] = Seq(

      // same day grid, lag windows, and exact counts; the z tower
      // mirrors Forecast.runsTest op for op
      "q_runs_test" ->
        """WITH daily AS (
          |  SELECT event_type,
          |         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
          |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
          |           AS cents
          |  FROM events GROUP BY 1, 2),
          |d AS (
          |  SELECT event_type, day,
          |         cents - lag(cents) OVER (PARTITION BY event_type
          |                                  ORDER BY day) AS diff
          |  FROM daily),
          |sg AS (
          |  SELECT event_type, day, CASE WHEN diff > 0 THEN 1 ELSE -1 END AS s
          |  FROM d WHERE diff IS NOT NULL AND diff <> 0),
          |rr AS (
          |  SELECT event_type, s,
          |         CASE WHEN lag(s) OVER (PARTITION BY event_type ORDER BY day)
          |                   IS NULL
          |                OR lag(s) OVER (PARTITION BY event_type ORDER BY day)
          |                   <> s
          |              THEN 1 ELSE 0 END AS newrun
          |  FROM sg),
          |a AS (
          |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
          |         CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT)
          |           AS n_plus,
          |         CAST(sum(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT)
          |           AS n_minus,
          |         CAST(sum(newrun) AS BIGINT) AS runs
          |  FROM rr GROUP BY 1),
          |h AS (
          |  SELECT event_type, n, n_plus, n_minus, runs,
          |         2.0 * CAST(n_plus AS DOUBLE) * CAST(n_minus AS DOUBLE)
          |           / CAST(n AS DOUBLE) + 1.0 AS mu
          |  FROM a)
          |SELECT event_type, n, n_plus, n_minus, runs,
          |       CASE WHEN n_plus >= 1 AND n_minus >= 1 AND n >= 3
          |                 AND (mu - 1.0) * (mu - 2.0)
          |                     / (CAST(n AS DOUBLE) - 1.0) > 0
          |            THEN round((CAST(runs AS DOUBLE) - mu)
          |                       / sqrt((mu - 1.0) * (mu - 2.0)
          |                              / (CAST(n AS DOUBLE) - 1.0)), 6)
          |       END AS z
          |FROM h ORDER BY event_type""".stripMargin,


      // same daily two-series grid and lag expansion; first-order sums
      // exact, squared/cross sums accumulate as DOUBLES (the int64-
      // overflow-proof hhi convention); both series min-shifted before
      // the power sums (round 14 — kills the n·saa − sa² cancellation
      // for near-constant series) — mirrors Forecast.leadLagCorr
      // term for term
      "q_lead_lag" ->
        """WITH daily0 AS (
          |  SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
          |         CAST(sum(CASE WHEN event_type = 'view'
          |                       THEN CAST(round(value * 100) AS BIGINT)
          |                       ELSE 0 END) AS BIGINT) AS a,
          |         CAST(sum(CASE WHEN event_type = 'purchase'
          |                       THEN CAST(round(value * 100) AS BIGINT)
          |                       ELSE 0 END) AS BIGINT) AS b
          |  FROM events WHERE event_type IN ('view', 'purchase')
          |  GROUP BY 1),
          |off AS (SELECT min(a) AS oa, min(b) AS ob FROM daily0),
          |daily AS (SELECT day, a - oa AS a, b - ob AS b FROM daily0, off),
          |lags AS (SELECT CAST(i AS BIGINT) AS lag FROM range(-3, 4) r(i)),
          |j AS (
          |  SELECT l.lag AS lag, s1.a AS a, s2.b AS b
          |  FROM lags l
          |  JOIN daily s1 ON true
          |  JOIN daily s2 ON s2.day = s1.day + l.lag),
          |g AS (
          |  SELECT lag, CAST(count(*) AS BIGINT) AS n,
          |         CAST(sum(a) AS BIGINT) AS sa, CAST(sum(b) AS BIGINT) AS sb,
          |         sum(CAST(a AS DOUBLE) * CAST(a AS DOUBLE)) AS saa,
          |         sum(CAST(b AS DOUBLE) * CAST(b AS DOUBLE)) AS sbb,
          |         sum(CAST(a AS DOUBLE) * CAST(b AS DOUBLE)) AS sab
          |  FROM j GROUP BY 1),
          |h AS (
          |  SELECT lag, n,
          |         CAST(n AS DOUBLE) * sab
          |           - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE) AS covn,
          |         CAST(n AS DOUBLE) * saa
          |           - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) AS van,
          |         CAST(n AS DOUBLE) * sbb
          |           - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) AS vbn
          |  FROM g)
          |SELECT lag, n AS n_overlap,
          |       CASE WHEN n >= 2 AND van > 0 AND vbn > 0
          |            THEN round(covn / (sqrt(van) * sqrt(vbn)), 6) END AS xcorr
          |FROM h ORDER BY lag""".stripMargin,

      "q_moving_avg" ->
        """WITH rev AS (
          |  SELECT l_returnflag, strftime(l_shipdate, '%Y-%m') AS ym,
          |         CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)) AS BIGINT)) AS BIGINT) AS rev
          |  FROM lineitem GROUP BY 1, 2)
          |SELECT l_returnflag, ym, rev,
          |       round(avg(rev) OVER (PARTITION BY l_returnflag ORDER BY ym
          |                            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS rev_ma3
          |FROM rev ORDER BY l_returnflag, ym""".stripMargin,


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


      // same exact-long moment sums as q_autocorr's oracle, two lags,
      // plus arg_max last-observation pulls; the φ/forecast float
      // tower mirrors Forecast.ar2Forecast op for op
      "q_ar2_forecast" ->
        """WITH d AS (
          |  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d')
          |           AS day,
          |         count(*)::BIGINT AS y
          |  FROM events GROUP BY 1, 2),
          |l AS (
          |  SELECT event_type, day, y,
          |         lag(y, 1) OVER w AS y1, lag(y, 2) OVER w AS y2
          |  FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day)),
          |s AS (
          |  SELECT event_type, count(*)::BIGINT AS n,
          |         CAST(sum(y) AS BIGINT) AS s, CAST(sum(y*y) AS BIGINT) AS ss,
          |         CAST(count(y1) AS BIGINT) AS c1,
          |         CAST(sum(y*y1) AS BIGINT) AS sab1,
          |         CAST(sum(CASE WHEN y1 IS NOT NULL THEN y END) AS BIGINT)
          |           AS sa1,
          |         CAST(sum(y1) AS BIGINT) AS sb1,
          |         CAST(count(y2) AS BIGINT) AS c2,
          |         CAST(sum(y*y2) AS BIGINT) AS sab2,
          |         CAST(sum(CASE WHEN y2 IS NOT NULL THEN y END) AS BIGINT)
          |           AS sa2,
          |         CAST(sum(y2) AS BIGINT) AS sb2,
          |         arg_max(y, day) AS yt,
          |         arg_max(y1, CASE WHEN y1 IS NOT NULL THEN day END) AS yt1
          |  FROM l GROUP BY 1),
          |r AS (
          |  SELECT event_type, n, yt, yt1, n*ss - s*s AS varn,
          |         CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS m,
          |         CAST(n*n*sab1 - n*s*(sa1 + sb1) + c1*s*s AS DOUBLE)
          |           / CAST(n*(n*ss - s*s) AS DOUBLE) AS r1,
          |         CAST(n*n*sab2 - n*s*(sa2 + sb2) + c2*s*s AS DOUBLE)
          |           / CAST(n*(n*ss - s*s) AS DOUBLE) AS r2
          |  FROM s),
          |f AS (SELECT *, 1.0 - r1*r1 AS den FROM r)
          |SELECT event_type, n,
          |       CASE WHEN varn > 0 THEN round(r1, 6) END AS r1,
          |       CASE WHEN varn > 0 THEN round(r2, 6) END AS r2,
          |       CASE WHEN n >= 3 AND varn > 0 AND abs(den) > 1e-12
          |            THEN round(r1*(1.0 - r2)/den, 6) END AS phi1,
          |       CASE WHEN n >= 3 AND varn > 0 AND abs(den) > 1e-12
          |            THEN round((r2 - r1*r1)/den, 6) END AS phi2,
          |       CASE WHEN n >= 3 AND varn > 0 AND abs(den) > 1e-12
          |            THEN round(m + r1*(1.0 - r2)/den
          |                         * (CAST(yt AS DOUBLE) - m)
          |                       + (r2 - r1*r1)/den
          |                         * (CAST(yt1 AS DOUBLE) - m), 6)
          |       END AS forecast
          |FROM f ORDER BY event_type""".stripMargin,


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

      // integer R/S core mirrored: seg 0 = full series, 1/2 = halves,
      // each segment's cumulative deviation m·cumc − t·sc exact
      "q_hurst_rs" ->
        """WITH daily AS (
          |  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
          |         CAST(round(sum(value)) AS BIGINT) AS c
          |  FROM events GROUP BY 1, date_trunc('day', ts)),
          |base AS (
          |  SELECT event_type, day, c,
          |         count(*) OVER (PARTITION BY event_type) AS n_all,
          |         row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
          |  FROM daily),
          |segs AS (
          |  SELECT event_type, 0 AS seg, day, c FROM base
          |  UNION ALL
          |  SELECT event_type, CASE WHEN rn * 2 <= n_all THEN 1 ELSE 2 END,
          |         day, c FROM base),
          |w AS (
          |  SELECT event_type, seg, c,
          |         count(*) OVER (PARTITION BY event_type, seg) AS m,
          |         sum(c) OVER (PARTITION BY event_type, seg) AS sc,
          |         sum(c * c) OVER (PARTITION BY event_type, seg) AS ssq,
          |         row_number() OVER (PARTITION BY event_type, seg ORDER BY day) AS t,
          |         sum(c) OVER (PARTITION BY event_type, seg ORDER BY day
          |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumc
          |  FROM segs),
          |rs AS (
          |  SELECT event_type, seg, max(m) AS m,
          |         CASE WHEN max(m * ssq - sc * sc) > 0 THEN
          |           CAST(max(m * cumc - t * sc) - min(m * cumc - t * sc) AS DOUBLE)
          |             / sqrt(CAST(max(m * ssq - sc * sc) AS DOUBLE))
          |         END AS rs
          |  FROM w GROUP BY 1, 2),
          |piv AS (
          |  SELECT event_type,
          |         max(CASE WHEN seg = 0 THEN m END) AS n_days,
          |         max(CASE WHEN seg = 0 THEN rs END) AS rsf,
          |         max(CASE WHEN seg = 1 THEN rs END) AS rs1,
          |         max(CASE WHEN seg = 2 THEN rs END) AS rs2
          |  FROM rs GROUP BY 1)
          |SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
          |       round(rsf, 6) AS rs_full,
          |       round(rs1, 6) AS rs_half1, round(rs2, 6) AS rs_half2,
          |       CASE WHEN rsf > 0 AND rs1 > 0 AND rs2 > 0 THEN
          |         round((ln(rsf) - (ln(rs1) + ln(rs2)) / 2.0) / ln(2.0), 6)
          |       END AS hurst
          |FROM piv ORDER BY event_type""".stripMargin,

      // exact-integer ACF rationals + the closed-form Durbin–Levinson
      // expressions, literal for literal
      "q_pacf" ->
        """WITH daily AS (
          |  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
          |         count(*) AS y
          |  FROM events GROUP BY 1, date_trunc('day', ts)),
          |dev AS (
          |  SELECT event_type, day,
          |         count(*) OVER (PARTITION BY event_type) * y -
          |           sum(y) OVER (PARTITION BY event_type) AS d,
          |         count(*) OVER (PARTITION BY event_type) AS n
          |  FROM daily),
          |lagged AS (
          |  SELECT event_type, n, d,
          |         lag(d, 1) OVER (PARTITION BY event_type ORDER BY day) AS d1,
          |         lag(d, 2) OVER (PARTITION BY event_type ORDER BY day) AS d2,
          |         lag(d, 3) OVER (PARTITION BY event_type ORDER BY day) AS d3
          |  FROM dev),
          |s AS (
          |  SELECT event_type, max(n) AS n_days,
          |         CAST(sum(d * d) AS DOUBLE) AS dd,
          |         CAST(sum(d * d1) AS DOUBLE) AS n1,
          |         CAST(sum(d * d2) AS DOUBLE) AS n2,
          |         CAST(sum(d * d3) AS DOUBLE) AS n3
          |  FROM lagged GROUP BY 1),
          |r AS (SELECT event_type, n_days, n1 / nullif(dd, 0) AS r1,
          |             n2 / nullif(dd, 0) AS r2,
          |             n3 / nullif(dd, 0) AS r3 FROM s),
          |p2 AS (SELECT *, (r2 - r1 * r1) / nullif(1.0 - r1 * r1, 0) AS phi22 FROM r),
          |p3 AS (SELECT *, r1 - phi22 * r1 AS phi21 FROM p2)
          |SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
          |       round(r1, 6) AS pacf1, round(phi22, 6) AS pacf2,
          |       round((r3 - phi21 * r2 - phi22 * r1) /
          |             nullif(1.0 - phi21 * r1 - phi22 * r2, 0), 6) AS pacf3
          |FROM p3 ORDER BY event_type""".stripMargin,
  )
}
