package graft.qcew

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.slf4j.LoggerFactory

/** ETL driver: raw fixed-width tree → partitioned parquet lake
  * (SURVEY S2-S5, A4; reference `data_process.py:35-95`).
  *
  * Reference behavior: iterate `{dir}/qcew/{year}/` files, skip files
  * whose output already exists, parse each, name the output parquet by
  * the mode of (year, qtr), log inserts/empties, then serve the union
  * of all processed files via a glob scan.
  *
  * Spark-first design notes:
  *   - The scalable path is [[ingestAll]]: ONE read over the whole glob
  *     (10^2..10^6 files — Spark's file listing is parallelized on the
  *     driver + distributed for large trees) and ONE
  *     `partitionBy(year, qtr)` write. The parse is narrow; the only
  *     wide operation is the optional repartition by partition keys to
  *     get one-file-per-partition without small-file explosion.
  *   - `partitionOverwriteMode=dynamic` gives per-(year,qtr)
  *     idempotence at the partition level — re-running a quarter
  *     replaces exactly that quarter, the Spark-native equivalent of
  *     the reference's skip-if-exists file check.
  *   - [[ingestFile]] keeps the reference's per-file granularity
  *     (mode-named output, skip-if-exists) for drip-feed ingestion.
  */
object Ingest {
  private val log = LoggerFactory.getLogger(getClass)

  /** Deterministic statistical mode of a column: most frequent value,
    * ties broken by smallest value (SURVEY A4).
    */
  def modeOf(df: DataFrame, column: String): Option[Any] =
    df.filter(col(column).isNotNull)
      .groupBy(column).count()
      .orderBy(desc("count"), asc(column))
      .limit(1).collect().headOption.map(_.get(0))

  /** Bulk path: parse every raw file under `rawGlob` and write one
    * partitioned parquet lake. Scales to arbitrary file counts.
    */
  def ingestAll(spark: SparkSession, rawGlob: String, outDir: String,
                filesPerPartition: Int = 1): DataFrame = {
    val parsed = FixedWidth.parse(FixedWidth.readRaw(spark, rawGlob))
    parsed
      // co-locate each output partition's rows; AQE coalesces small ones
      .repartition(col("year"), col("qtr"))
      .write.mode(SaveMode.Overwrite)
      // writer-level option, NOT spark.conf.set: a session-conf mutation
      // would silently flip overwrite semantics for every later write in
      // the caller's session
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("year", "qtr")
      .parquet(outDir)
    spark.read.parquet(outDir)
  }

  /** Small-file compaction: rewrite a partitioned lake so each
    * (year, qtr) partition holds `filesPerPartition` files. Streaming
    * appends and incremental ingests accumulate small files that
    * degrade scan planning (one task per file, footer reads dominate);
    * periodic compaction is the standard maintenance job. Written to a
    * FRESH directory, then swapped by the caller — compact-in-place
    * would corrupt the lake on failure midway.
    */
  def compact(spark: SparkSession, lakeDir: String, outDir: String): DataFrame = {
    spark.read.parquet(lakeDir)
      // hash-repartition on the partition keys: each (year, qtr)'s rows
      // land in one task -> one file per partition. For partitions too
      // big for one file, cap with .option("maxRecordsPerFile", n).
      .repartition(col("year"), col("qtr"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("year", "qtr")
      .parquet(outDir)
    spark.read.parquet(outDir)
  }

  /** Reference-shaped per-file path: parse one file, name output by
    * mode(year)/mode(qtr), skip if the output already exists, warn on
    * empty input (reference `data_process.py:47-91`).
    * Returns the output path if written.
    */
  def ingestFile(spark: SparkSession, file: String, processedDir: String): Option[String] = {
    val parsed = FixedWidth.parse(FixedWidth.readRaw(spark, file)).cache()
    try {
      if (parsed.isEmpty) { log.warn(s"empty input file: $file"); return None }
      val year = modeOf(parsed, "year").getOrElse("unknown")
      val qtr  = modeOf(parsed, "qtr").getOrElse("unknown")
      val out = s"$processedDir/pr-qcew-$year-$qtr.parquet"
      // Hadoop FileSystem, not java.nio: the idempotence check must see
      // HDFS/S3/GCS paths on a real cluster, where Files.exists would
      // silently always-miss and re-ingest every file.
      val outPath = new HPath(out)
      val fs = outPath.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(outPath)) {
        log.info(s"skip (exists): $out"); Some(out)
      } else {
        parsed.coalesce(1).write.mode(SaveMode.Overwrite).parquet(out)
        log.info(s"inserted: $out"); Some(out)
      }
    } finally parsed.unpersist()
  }

  /** Serve the processed lake (SURVEY S5/S6): multi-file parquet scan;
    * Catalyst prunes columns/partitions from downstream selects. Also
    * registers the frame as a temp view (SURVEY S9; reference
    * `data_viz.py:15-16` serves SQL-string consumers via
    * `spark.table("qcew")`) — pass `viewName = None` to skip.
    */
  def readProcessed(spark: SparkSession, processedDir: String,
                    viewName: Option[String] = Some("qcew")): DataFrame = {
    val df = spark.read.parquet(s"$processedDir/pr-qcew-*.parquet")
    viewName.foreach(df.createOrReplaceTempView)
    df
  }
}
