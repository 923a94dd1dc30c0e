package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Baseline time-series forecasting: the seasonal-naive backtest.
  *
  * Seasonal naive (ŷ_t = y_{t−season}) is the forecast every serious
  * pipeline measures candidates AGAINST — producing it and its error
  * profile is a one-window operation, so it belongs in the engine while
  * model fitting does not. The window is keyed by the series id: one
  * shuffle on a (usually high-cardinality) series key, per-key sort
  * over the series' periods — the same scale shape as the lag/diff
  * series operators in [[graft.qcew.Series]].
  *
  * Callers hand in an integral measure (quantize floats first), so
  * errors and their sums are exact longs; MAE/MAPE become single
  * divisions of exact sums, rounded once.
  */
object Forecast {

  /** Per-period forecast rows: actual, seasonal-naive forecast, and
    * absolute error, for periods where a forecast exists (t ≥ season).
    * `period` must be an integral, gap-free period index within each
    * series (e.g. year·4 + quarter).
    */
  def seasonalNaive(df: DataFrame, series: Seq[String], period: Column,
      y: Column, season: Int): DataFrame = {
    val w = Window.partitionBy(series.map(col): _*).orderBy("period")
    df.select(series.map(col) :+ period.cast("long").as("period")
        :+ y.cast("long").as("y"): _*)
      .withColumn("forecast", lag("y", season).over(w))
      .filter(col("forecast").isNotNull)
      .withColumn("abs_err", abs(col("y") - col("forecast")))
  }

  /** CUSUM mean-shift changepoint detection over ONE global integral
    * series: the cumulative-sum statistic C_t = S_t − t·(S/N) (the
    * running deviation of the prefix sum from its expected share)
    * peaks at the point where the series mean shifts; the argmax of
    * |C_t| is the classic single-changepoint estimate. Multiplying by
    * N clears the division: emitted `cusum_n` = N·S_t − t·S is EXACT
    * integer arithmetic end to end, so the argmax (|cusum_n| desc,
    * then ord asc — a total tie-break) is bit-deterministic on any
    * engine or partitioning. `mean_shifted` = C_t/N in series units is
    * the one final division.
    *
    * Scale shape: caller aggregates to the series grid first; one
    * global-window prefix sum over grid cells (the [[Inference.ksTest]]
    * CDF shape) + a broadcast one-row total. Overflow: N·S_t < 2⁶³ —
    * with S ≤ N·y_max that is N²·y_max, safe past a 10⁶-cell grid of
    * 10⁹-sized values.
    */
  def cusumChangepoint(series: DataFrame, ord: Column, y: Column): DataFrame = {
    val base = series.select(ord.as("ord"), y.cast("long").as("y"))
    val wCum = Window.orderBy("ord")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = base.agg(count(lit(1)).as("n"), sum("y").as("s"))
    base
      .select(col("ord"),
        row_number().over(Window.orderBy("ord")).cast("long").as("t"),
        sum("y").over(wCum).as("st"))
      .crossJoin(broadcast(totals))
      .select(col("ord"), col("t"), col("n"),
        (col("n") * col("st") - col("t") * col("s")).as("cusum_n"))
      .withColumn("mean_dev",
        round(col("cusum_n").cast("double") / col("n").cast("double"), 6))
      .orderBy(abs(col("cusum_n")).desc, col("ord").asc)
      .limit(1)
  }

  /** Backtest summary per series: evaluation count, MAE, and MAPE (in
    * percent, over periods with nonzero actuals) of the seasonal-naive
    * forecast. One additional map-side-combined aggregate over
    * [[seasonalNaive]] output.
    */
  def seasonalNaiveBacktest(df: DataFrame, series: Seq[String], period: Column,
      y: Column, season: Int): DataFrame =
    seasonalNaive(df, series, period, y, season)
      .groupBy(series.map(col): _*)
      .agg(count(lit(1)).as("n_eval"),
        round(sum("abs_err").cast("double") / count(lit(1)).cast("double"), 6)
          .as("mae"),
        round(avg(when(col("y") =!= 0,
          col("abs_err").cast("double") / abs(col("y")).cast("double") * 100)), 6)
          .as("mape_pct"))

  /** Theil–Sen robust trend estimator per series: the (discrete lower)
    * median of all pairwise slopes (y_j − y_i)/(x_j − x_i), i < j — the
    * classic outlier-resistant alternative to least-squares slope
    * (breakdown point ≈ 29%, vs 0 for OLS: one corrupted period cannot
    * move it). Inputs are integral by contract (quantize floats first),
    * so every slope is ONE IEEE division of exact longs — bit-identical
    * cross-engine — and the median is an actual data value picked by a
    * total order (slope, x1, x2), never an interpolation: drift-free.
    *
    * Scale shape: the caller aggregates the fact table to the per-series
    * grid FIRST (same contract as [[cusumChangepoint]] /
    * [[Inference.autocorr]]), so the O(m²) pair space is over grid
    * cells (m = periods per series, bounded), not rows. The self-join
    * and the ranking window share the series-key partitioning: one
    * shuffle. For very long series (m > ~10⁴) sample pairs per series
    * (Theil's incomplete estimator) — the median of a uniform pair
    * sample converges at the same rate.
    */
  def theilSen(series: DataFrame, keys: Seq[String], x: Column, y: Column): DataFrame = {
    val base = series.select(keys.map(col) :+ x.cast("long").as("x")
      :+ y.cast("long").as("y"): _*)
    val a = base.select(keys.map(col) :+ col("x").as("x1") :+ col("y").as("y1"): _*)
    val b = base.select(keys.map(k => col(k).as(s"${k}_b"))
      :+ col("x").as("x2") :+ col("y").as("y2"): _*)
    val cond = keys.map(k => col(k) === col(s"${k}_b")).reduce(_ && _) &&
      col("x1") < col("x2")
    val pairs = a.join(b, cond)
      .select(keys.map(col) :+ col("x1") :+ col("x2")
        :+ ((col("y2") - col("y1")).cast("double") /
            (col("x2") - col("x1")).cast("double")).as("slope"): _*)
    val wRank = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("slope"), col("x1"), col("x2"))
    val wAll = Window.partitionBy(keys.map(col): _*)
    pairs
      .withColumn("rn", row_number().over(wRank))
      .withColumn("np", count(lit(1)).over(wAll))
      .filter(col("rn") === ((col("np") + lit(1)) / lit(2)).cast("long"))
      .select(keys.map(col) :+ col("np").as("n_pairs")
        :+ round(col("slope"), 6).as("ts_slope"): _*)
  }
}
