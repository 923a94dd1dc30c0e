package graft.qcew

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Quarterly→monthly/quarterly/yearly resampling (SURVEY R1, A7-A9,
  * P15; reference `data_viz.py:26-86`).
  *
  * The reference expands 3 per-quarter employment columns into a
  * monthly series with a row-at-a-time pandas loop; here it is a single
  * narrow `posexplode` — vectorized, shuffle-free, linear at any scale.
  * (The reference's quarterly resample has a groupby-key bug,
  * `data_viz.py:65`; we implement the intended semantics, SURVEY A9.)
  */
object Resample {

  /** Wide→long: one row per (year, qtr, month) with `employment` and a
    * first-of-month `date` (reference `data_viz.py:26-50`).
    * Input needs year, qtr (numeric) and the three employment columns.
    */
  def monthly(df: DataFrame,
              m1: String = "first_month_employment",
              m2: String = "second_month_employment",
              m3: String = "third_month_employment"): DataFrame =
    df.select(col("year"), col("qtr"),
        posexplode(array(col(m1), col(m2), col(m3))).as(Seq("k", "employment")))
      .withColumn("month", ((col("qtr") - 1) * 3 + col("k") + 1).cast("int"))
      .drop("k")
      .withColumn("date", make_date(col("year"), col("month"), lit(1)))

  /** Yearly mean of the monthly series (reference `data_viz.py:52-59`). */
  def yearlyMean(monthly: DataFrame): DataFrame =
    monthly.groupBy("year")
      .agg(avg("employment").as("employment"))
      .withColumn("date", make_date(col("year"), lit(1), lit(1)))

  /** Quarterly mean of the monthly series — intended semantics of
    * reference `data_viz.py:61-73`.
    */
  def quarterlyMean(monthly: DataFrame): DataFrame =
    monthly.groupBy("year", "qtr")
      .agg(avg("employment").as("employment"))
      .withColumn("date", make_date(col("year"), (col("qtr") - 1) * 3 + 1, lit(1)))
}
