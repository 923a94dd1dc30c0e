package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series gap filling + forward fill (extends SURVEY §2.8's
  * resample family; reference resamples sparse quarterly series,
  * `data_viz.py:26-86`, but has no densification step — this is the
  * missing half of resampling for any downstream consumer that needs a
  * dense series: charting, window features, training-data curricula).
  *
  * Scale design — the operator is ONE window shuffle, no join:
  * instead of building a dense calendar spine and left-joining the
  * observations onto it (two shuffles: one for the join, one for the
  * forward-fill window), each observation looks up its successor with
  * `lead` and emits itself PLUS one row per missing day before that
  * successor via `sequence` + `explode`. Forward-fill is then implicit
  * — every emitted row already carries its source observation's values
  * — so no second `last(ignoreNulls)` window pass is needed. Output
  * size is the dense series (bounded by keys × days-in-range), and the
  * explode is narrow, so the plan is: shuffle by key, sort by date,
  * emit — the minimal work the semantics admit at any scale.
  *
  * The fill range per key is [min(date), max(date)] of that key's own
  * observations — leading/trailing absence is not invented.
  */
object TimeFill {

  /** Densify a per-key daily series and forward-fill the value columns.
    *
    * @param df        one row per (keys, dateCol) — aggregate first
    * @param keys      partition keys (high-cardinality keys scale best;
    *                  a handful of keys means a handful of reducers)
    * @param dateCol   a `DateType` column; the output keeps its name
    * @param valueCols columns carried forward into filled rows
    * @return keys ++ dateCol ++ valueCols ++ `is_filled` (true on rows
    *         manufactured for missing days)
    */
  def forwardFillDaily(df: DataFrame, keys: Seq[String], dateCol: String,
                       valueCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(dateCol))
    df.withColumn("_next", lead(col(dateCol), 1).over(w))
      .withColumn("_g",
        explode(sequence(
          col(dateCol),
          coalesce(date_sub(col("_next"), 1), col(dateCol)),
          expr("interval 1 day"))))
      .select(
        keys.map(col) ++
          Seq(col("_g").as(dateCol)) ++
          valueCols.map(col) :+
          (col("_g") =!= col(dateCol)).as("is_filled"): _*)
  }

  /** Densify a per-key daily series with LINEAR INTERPOLATION between
    * consecutive observations (pandas `interpolate(method="time")`
    * semantics on a daily grid). Same one-shuffle lead+explode shape as
    * [[forwardFillDaily]]: each observation also fetches its
    * successor's value, and every manufactured day computes
    * `v + (next_v - v) * elapsed/gap` — per-row scalar arithmetic, no
    * order-dependent accumulation, so results are bit-stable across
    * engines and partitionings. Trailing observations (no successor)
    * emit only themselves; output value is DoubleType.
    */
  def interpolateDaily(df: DataFrame, keys: Seq[String], dateCol: String,
                       valueCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(dateCol))
    val v = col(valueCol).cast("double")
    val nextV = col("_nv").cast("double")
    val frac = datediff(col("_g"), col(dateCol)).cast("double") /
      datediff(col("_next"), col(dateCol)).cast("double")
    df.withColumn("_next", lead(col(dateCol), 1).over(w))
      .withColumn("_nv", lead(col(valueCol), 1).over(w))
      .withColumn("_g",
        explode(sequence(
          col(dateCol),
          coalesce(date_sub(col("_next"), 1), col(dateCol)),
          expr("interval 1 day"))))
      .select(
        keys.map(col) ++
          Seq(col("_g").as(dateCol),
            when(col("_next").isNull, v)
              .otherwise(v + (nextV - v) * frac).as(valueCol)) :+
          (col("_g") =!= col(dateCol)).as("is_filled"): _*)
  }

  /** Reference implementation via the classic two-shuffle shape —
    * dense spine left-joined to the observations, then
    * `last(ignoreNulls)` over an unbounded-preceding frame. Kept as
    * the equivalence witness for the unit test (and for callers whose
    * spine comes from an external calendar table rather than the
    * data's own min..max).
    */
  private[graft] def forwardFillViaSpine(df: DataFrame, keys: Seq[String],
                                         dateCol: String,
                                         valueCols: Seq[String]): DataFrame = {
    val spine = df
      .groupBy(keys.map(col): _*)
      .agg(min(col(dateCol)).as("_d0"), max(col(dateCol)).as("_d1"))
      .select(keys.map(col) :+
        explode(sequence(col("_d0"), col("_d1"), expr("interval 1 day")))
          .as(dateCol): _*)
    val marked = df.withColumn("_obs", lit(true))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(dateCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = spine.join(marked, keys :+ dateCol, "left")
    valueCols
      .foldLeft(filled)((d, c) => d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
      .withColumn("is_filled", col("_obs").isNull)
      .drop("_obs")
  }

  /** Time-weighted average (TWAP): per key, each observation's value
    * holds until the next observation, and the average weights each
    * value by how long it held — the correct mean for irregularly
    * sampled series, where the row-mean over-weights bursts. The last
    * observation of a key has no holding interval and is excluded
    * (callers wanting a closed window append a sentinel row at the
    * window end).
    *
    * Exactness contract: `tsInt` is integral (e.g. epoch micros) and
    * `valueInt` is the caller's fixed-point integer scaling of the
    * measure, so every value×duration product and both sums are exact
    * longs — partition-order independent — and the only float op is
    * the final division. Callers must pre-aggregate equal-`tsInt`
    * observations per key: with duplicate timestamps, WHICH duplicate
    * receives the interval to the next distinct time is tie-order
    * dependent.
    *
    * Scale shape: one hash exchange + per-key sort (the lead window),
    * then a map-side-combined aggregate on the same key — reducers
    * spread with key cardinality.
    */
  def timeWeightedAvg(df: DataFrame, key: Column, tsInt: Column,
                      valueInt: Column, outScale: Double = 1.0): DataFrame = {
    val w = Window.partitionBy("k").orderBy("t")
    df.select(key.as("k"), tsInt.cast("long").as("t"), valueInt.cast("long").as("v"))
      .withColumn("_tn", lead("t", 1).over(w))
      .filter(col("_tn").isNotNull)
      .groupBy("k")
      .agg(count(lit(1)).as("n_obs"),
        sum((col("_tn") - col("t")) * col("v")).as("_vw"),
        sum(col("_tn") - col("t")).as("_dur"))
      .select(col("k"), col("n_obs"),
        round(col("_vw").cast("double") / col("_dur").cast("double") / lit(outScale), 6)
          .as("twap"))
  }
}
