package graft.qcew

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's flagship aggregate, `group_by_naics_code`
  * (jp-qcew `data_process.py:137-188`): establishment-quarter records
  * → (year, qtr, 4-digit NAICS) wages/employment/establishment-count,
  * with small-group disclosure suppression and payroll-tax
  * contribution columns.
  *
  * Spark-first design notes:
  *   - One hash aggregate = one shuffle on (year, qtr, naics4).
  *     Spark performs partial (map-side) aggregation automatically, so
  *     the shuffle carries pre-combined groups, not raw rows — the
  *     cardinality is bounded by |year×qtr×naics4| (~10^4–10^5), tiny
  *     at any scale.
  *   - The suppression filter (HAVING `dummy > 4`) stays post-agg;
  *     Catalyst will not incorrectly push it through the aggregate.
  *   - Derived columns are narrow, codegen'd expressions.
  */
object NaicsAgg {

  /** Payroll tax rates (reference `data_process.py:182-186`). */
  val FondoRate    = 0.014
  val MedicareRate = 0.0145
  val SsnRate      = 0.062

  /** Derivations applied pre-aggregation
    * (reference `data_process.py:157-170`).
    */
  def derive(records: DataFrame): DataFrame =
    records
      .withColumn("total_employment",
        (col("first_month_employment") + col("second_month_employment") +
          col("third_month_employment")) / 3.0)
      .withColumn("naics4", substring(col("naics_code"), 1, 4))
      .withColumn("dummy", lit(1L))
      .filter(col("naics4") =!= "")

  /** Aggregate + suppression + contribution columns
    * (reference `data_process.py:173-186`). `minGroupSize` keeps only
    * groups with MORE than `minGroupSize` establishments (ref: `> 4`).
    */
  def aggregate(records: DataFrame, minGroupSize: Long = 4L): DataFrame =
    derive(records)
      .groupBy("year", "qtr", "naics4")
      .agg(
        sum("total_wages").as("total_wages"),
        avg("total_employment").as("total_employment"),
        sum("dummy").as("dummy"))
      .filter(col("dummy") > minGroupSize)
      .withColumn("fondo_contributions", col("total_wages") * FondoRate)
      .withColumn("medicare_contributions", col("total_wages") * MedicareRate)
      .withColumn("ssn_contributions", col("total_wages") * SsnRate)
}
