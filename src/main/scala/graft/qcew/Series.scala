package graft.qcew

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series derivations (SURVEY W1): first difference and percent
  * change per series. The reference consumes these as precomputed CSV
  * columns (`graph.py:88-113`: `{col}_diff`, `{col}_diff_p`); this
  * engine owns the derivation with `lag` windows.
  *
  * Scale note: the window partitions by series key (e.g. NAICS code),
  * so state per partition is one row — Spark's window exec streams it;
  * no skew risk unless one series dominates, which cannot happen here
  * (series are bounded by time periods).
  */
object Series {

  /** Add `{measure}_diff` and `{measure}_diff_p` per partition key,
    * ordered by `orderCols` (must be a unique ordering within a key
    * for determinism).
    */
  def withDiffs(df: DataFrame, measure: String, partitionKeys: Seq[String],
                orderCols: Seq[String]): DataFrame = {
    val w0 = if (partitionKeys.isEmpty) Window.partitionBy(lit(1))
             else Window.partitionBy(partitionKeys.map(col): _*)
    val w = w0.orderBy(orderCols.map(col): _*)
    val prev = lag(col(measure), 1).over(w)
    df.withColumn(s"${measure}_diff", col(measure) - prev)
      .withColumn(s"${measure}_diff_p", (col(measure) - prev) / prev)
  }
}
