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
}
