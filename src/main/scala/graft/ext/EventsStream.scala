package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Event-stream analytics (SURVEY §2.10 extension): tumbling-window
  * aggregates in both batch form (oracle-able with `date_trunc`) and
  * true Structured Streaming form (watermark + windowed state).
  *
  * Scale design: the streaming aggregate keys state by
  * (window, event_type) — bounded cardinality; the 10-minute watermark
  * bounds state retention, so executors hold O(windows-in-flight ×
  * types), independent of throughput.
  */
object EventsStream {

  /** A session clone with the nanos-as-long legacy conf enabled.
    * `newSession` shares the SparkContext and cached blocks but has its
    * own SQL conf, so the conf change is visible ONLY to reads built
    * here — a plain `spark.conf.set` would silently change the schema
    * (timestamp -> long) of every later nano-timestamp parquet read in
    * the caller's session (round-1 review finding). The conf must live
    * on the session (not save/restored around the read) because Spark
    * consults it again at physical planning time.
    */
  private def nanosSession(spark: SparkSession): SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s
  }

  /** Read the events table. The driver's parquet stores `ts` as
    * TIMESTAMP(NANOS), which Spark's reader rejects by default
    * (PARQUET_TYPE_ILLEGAL); read nanos as long (legacy conf, scoped to
    * a cloned session) and convert to a microsecond timestamp —
    * lossless at any granularity the analytics use.
    */
  def readEvents(spark: SparkSession, path: String): DataFrame =
    nanosSession(spark).read.parquet(path)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))

  /** Batch tumbling-hour aggregate — the exact batch equivalent of the
    * streaming query, expressible in DuckDB as date_trunc('hour', ts).
    */
  def hourlyStats(events: DataFrame): DataFrame =
    events
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(20,4)")).as("total_value"))
      .orderBy("hour", "event_type")

  /** Streaming parquet source for ONE file: the file source wants a
    * directory, so stream the parent glob-filtered to the file name.
    * Shared by every bounded-stream harness in this package.
    */
  private[ext] def singleFileStream(s: SparkSession, path: String): DataFrame = {
    val schema = s.read.parquet(path).schema // bounded: schema inference once
    val p = java.nio.file.Paths.get(path)
    s.readStream.schema(schema)
      .option("pathGlobFilter", p.getFileName.toString)
      .parquet(p.getParent.toString)
  }

  /** Run a bounded streaming frame to completion into a memory sink
    * and return the sink table (registered in the frame's session).
    */
  private[ext] def runToMemory(stream: org.apache.spark.sql.Dataset[_],
                               queryName: String, mode: OutputMode): DataFrame = {
    val q: StreamingQuery = stream.writeStream
      .outputMode(mode)
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    stream.sparkSession.table(queryName)
  }

  /** Streaming form: parquet source → watermark → tumbling window.
    * Built on a conf-isolated session clone (see [[nanosSession]]).
    */
  def hourlyStream(spark: SparkSession, path: String): DataFrame = {
    singleFileStream(nanosSession(spark), path)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(20,4)")).as("total_value"))
      .select(col("w.start").as("hour"), col("event_type"),
        col("n_events"), col("total_value"))
  }

  /** Run the streaming query synchronously over the (bounded) input and
    * return the completed result from the in-memory sink — the local
    * smoke harness for the streaming path.
    */
  def runStreamOnce(spark: SparkSession, path: String,
                    queryName: String = "events_hourly"): DataFrame =
    runToMemory(hourlyStream(spark, path), queryName, OutputMode.Complete())

  /** Streaming dedup: first occurrence per (user_id, event_type) via
    * stateful `dropDuplicates`. State is one entry per distinct key —
    * for an UNBOUNDED key universe switch to
    * `dropDuplicatesWithinWatermark`, which expires key state once the
    * watermark passes it (the standard bounded-state form); on this
    * bounded demo stream exact dedup keeps the oracle simple.
    */
  def dedupStream(spark: SparkSession, path: String): DataFrame =
    singleFileStream(nanosSession(spark), path)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("user_id", "event_type")

  /** Run [[dedupStream]] to completion and reduce it to its
    * deterministic summary: distinct-key counts per event_type. WHICH
    * duplicate row survives depends on micro-batch arrival order, but
    * the surviving KEY SET is exactly the distinct keys — so the
    * per-type count is the stream-order-independent (and
    * oracle-checkable) answer.
    */
  def runDedupOnce(spark: SparkSession, path: String,
                   queryName: String = "events_dedup"): DataFrame =
    runToMemory(dedupStream(spark, path), queryName, OutputMode.Append())
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_users"))
}
