package graft.qcew

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixed-width QCEW record scan + parse (SURVEY S1, P1, P2).
  *
  * Reference behavior (jp-qcew `data_process.py:97-135`): read latin-1
  * text, slice each 1060-char line into 121 trimmed string fields per
  * [[Layout]], then cast 9 fields to numerics with null-on-failure
  * semantics (`data_process.py:66-82`, Polars `strict=False`).
  *
  * Spark-first design notes:
  *   - The whole parse is ONE narrow projection of 121 codegen'd
  *     `substring`+`trim` expressions — embarrassingly parallel, no
  *     shuffle, whole-stage-codegen friendly. At 100 TB this scales
  *     linearly with input splits.
  *   - latin-1 is a single-byte charset, so after decoding, char
  *     positions equal the layout's byte positions (SURVEY §7.4). We
  *     read through the CSV reader with a non-occurring separator to
  *     get a correctly decoded single `value` column (the `text`
  *     source ignores `encoding`).
  *   - Casts use `try_cast` so behavior is identical under ANSI mode
  *     (Spark 4 default) and matches the reference's null-on-bad-input.
  */
object FixedWidth {

  /** Read raw fixed-width latin-1 lines as a single-column `value` frame. */
  def readRaw(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("encoding", "ISO-8859-1")
      .option("lineSep", "\n")
      .option("sep", "")      // does not occur in QCEW data
      .option("quote", "")           // disable quoting entirely
      .option("header", "false")
      .schema("value STRING")
      .csv(path)

  /** Slice + trim all 121 fields, then apply the reference's numeric
    * casts. Input: any frame with a string column `valueCol`.
    */
  def parse(raw: DataFrame, valueCol: String = "value"): DataFrame = {
    // CRLF tolerance: a trailing \r (from CRLF files read with \n line
    // separator) would otherwise survive `trim` (which strips spaces
    // only) and corrupt the last field.
    val v = regexp_replace(col(valueCol), "\r$", "")
    val sliced = raw.select(Layout.fields.map { case (name, pos, len) =>
      trim(substring(v, pos, len)).as(name)
    }: _*)
    cast(sliced)
  }

  /** Null-on-failure numeric casts for the 9 typed fields
    * (reference `data_process.py:66-82`).
    */
  def cast(df: DataFrame): DataFrame = {
    val withLongs = Layout.longFields.foldLeft(df) { (d, c) =>
      d.withColumn(c, expr(s"try_cast($c as bigint)"))
    }
    Layout.doubleFields.foldLeft(withLongs) { (d, c) =>
      d.withColumn(c, expr(s"try_cast($c as double)"))
    }
  }

  /** Geospatial column (SURVEY §2.12; reference README's "geospatial
    * ETL" geom): pack (longitude, latitude) into a `geom` struct — the
    * offline stand-in for `ST_Point(lon, lat)`, in (x, y) order so a
    * real spatial engine can consume it unchanged. Null when either
    * coordinate is missing, mirroring ST_Point's null propagation.
    */
  def withGeom(df: DataFrame): DataFrame =
    df.withColumn("geom",
      when(col("longitude").isNotNull && col("latitude").isNotNull,
        struct(col("longitude").as("lon"), col("latitude").as("lat"))))
}
