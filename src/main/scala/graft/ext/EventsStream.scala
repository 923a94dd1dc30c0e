package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** A session clone; with `nanos=true` the nanos-as-long legacy conf
    * is enabled on the clone. `newSession` shares the SparkContext and
    * cached blocks but has its own SQL conf, so the conf change is
    * visible ONLY to reads built here — a plain `spark.conf.set` would
    * silently change the schema (timestamp -> long) of every later
    * nano-timestamp parquet read in the caller's session (round-1
    * review finding). The conf must live on the session (not
    * save/restored around the read) because Spark consults it again at
    * physical planning time.
    */
  private def cloneSession(spark: SparkSession, nanos: Boolean): SparkSession = {
    val s = spark.newSession()
    if (nanos) s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // newSession() rebuilds SQL conf from builder-time SparkConf,
    // silently DROPPING runtime conf.set calls on the caller — so a
    // caller that toggled ANSI, the session timezone, its parallelism,
    // or the stream state-partition knob at runtime would not see the
    // toggle apply to anything built here. Propagate those explicitly;
    // builder-time confs are inherited already.
    Seq("spark.sql.ansi.enabled", "spark.sql.session.timeZone",
        "spark.sql.shuffle.partitions")
      .foreach(key => s.conf.set(key, spark.conf.get(key)))
    spark.conf.getOption("spark.graft.stream.statePartitions")
      .foreach(v => s.conf.set("spark.graft.stream.statePartitions", v))
    s
  }

  /** Probe the stored type of `ts` without touching the caller's conf.
    * The probe session enables nanos-as-long so a legacy
    * TIMESTAMP(NANOS) file surfaces as LongType instead of throwing
    * PARQUET_TYPE_ILLEGAL; for any other encoding the conf is a no-op
    * and the real logical type comes back (TimestampNTZType for naive
    * micros, TimestampType for UTC-adjusted micros).
    */
  private def probeTsType(spark: SparkSession, path: String): org.apache.spark.sql.types.DataType = {
    val s = spark.newSession()
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(path).schema.find(_.name == "ts")
      .map(_.dataType)
      .getOrElse(org.apache.spark.sql.types.TimestampType)
  }

  /** Normalize a loaded `ts` column to TIMESTAMP (LTZ):
    *  - LongType (legacy nanos-as-long)  -> micros timestamp, lossless
    *    at any granularity the analytics use;
    *  - TIMESTAMP_NTZ (naive micros, the current testdata encoding) ->
    *    cast under the session's UTC zone, so wall-clock semantics of
    *    window/date_trunc match the DuckDB oracle's naive timestamps;
    *  - TIMESTAMP -> pass through.
    */
  private def normalizeTs(df: DataFrame, stored: org.apache.spark.sql.types.DataType): DataFrame =
    stored match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }

  /** Read the events table, schema-dispatched on the stored `ts` type
    * (the driver has shipped both INT64-nanos and naive-micros
    * encodings across testdata generations; see [[normalizeTs]]). The
    * nanos legacy conf is applied only when the file actually stores
    * nanos, and only on a session clone.
    */
  def readEvents(spark: SparkSession, path: String): DataFrame = {
    val stored = probeTsType(spark, path)
    val isNanos = stored == org.apache.spark.sql.types.LongType
    val s = if (isNanos) cloneSession(spark, nanos = true) else spark
    normalizeTs(s.read.parquet(path), stored)
  }

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

  /** Per-completed-run micro-batch accounting, keyed by sink/query
    * name: (micro-batches, Σ batchDuration ms). Populated by every
    * bounded-run harness in this package so a bench consumer
    * ([[graft.StreamProbe]]) can split a streaming query's wall time
    * into BATCH PROCESSING (this sum) and HARNESS SETUP (session
    * clone, state-store init, query start/stop — the remainder):
    * bounded local streams are dominated by the fixed cost, and
    * without the split a streaming bench row reads as if the operator
    * itself were that slow.
    */
  val lastRunStats =
    new java.util.concurrent.ConcurrentHashMap[String, (Int, Long)]()

  private[ext] def recordRun(q: StreamingQuery): Unit = {
    val ps = q.recentProgress
    lastRunStats.put(Option(q.name).getOrElse(q.id.toString),
      (ps.length, ps.map(_.batchDuration).sum))
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
    recordRun(q)
    stream.sparkSession.table(queryName)
  }

  /** Streaming build of the deterministic HLL register table — the
    * twin of [[Sketch.hllDetRegisters]]: an update-mode max-aggregate
    * per (group, bucket). The memory sink accumulates one row per
    * UPDATED key per micro-batch; registers only ever grow, so the
    * read-side max-dedup reconstructs exactly the batch register
    * table (`q_stream_hll` hash-gates this against the same SQL oracle
    * as the batch form). Why it matters at scale: streaming state is
    * groups × 2^bucketBits int registers — bounded forever — where an
    * exact streaming COUNT(DISTINCT) would hold the unbounded item
    * universe in the state store.
    */
  def hllRegistersStream(events: DataFrame, group: String, item: Column,
                         bucketBits: Int = 8,
                         sinkName: String = "hll_regs_sink"): DataFrame = {
    // the register derivation IS the batch one — one definition, so the
    // stream and batch forms cannot drift from their shared oracle
    val regs = Sketch.hllDetRegisters(events, Seq(group), item, bucketBits)
    runToMemory(regs, sinkName, OutputMode.Update())
      .groupBy(group, "bucket").agg(max("reg").as("reg"))
  }

  /** The streaming twin of [[readEvents]]: bounded parquet stream over
    * the events file, schema-dispatched on the stored `ts` type exactly
    * like the batch read (nanos conf scoped to a session clone ONLY
    * when the file stores nanos), `ts` normalized to a microsecond
    * timestamp. Every streaming operator in this module starts here.
    *
    * The clone also caps `spark.sql.shuffle.partitions` (= state-store
    * instances per stateful operator) at 8 BY DEFAULT: per-micro-batch
    * fixed cost scales with state partitions, which dominates bounded
    * local streams. That cap is LOCAL-ONLY tuning, so it yields to an
    * explicit deployment knob: set `spark.graft.stream.statePartitions`
    * on the calling session and the clone uses that value verbatim, no
    * cap — a production deployment sizes it to key cardinality × state
    * size (state REPARTITIONING requires a new checkpoint, so pick it
    * before going live; StatefulTtlSpec gates the knob). Scoped to the
    * clone; batch queries keep the session's parallelism.
    */
  def readEventsStream(spark: SparkSession, path: String): DataFrame = {
    val stored = probeTsType(spark, path)
    val s = cloneSession(spark, nanos = stored == org.apache.spark.sql.types.LongType)
    val requested = s.conf.getOption("spark.graft.stream.statePartitions")
      .map(v => scala.util.Try(v.toInt).getOrElse(
        throw new IllegalArgumentException(
          s"spark.graft.stream.statePartitions must be a positive integer, got '$v'")))
    requested.foreach(n =>
      require(n > 0, s"spark.graft.stream.statePartitions must be > 0, got $n"))
    val current = s.conf.get("spark.sql.shuffle.partitions", "200").toInt
    s.conf.set("spark.sql.shuffle.partitions",
      requested.getOrElse(math.min(8, current)).toString)
    normalizeTs(singleFileStream(s, path), stored)
  }

  /** Streaming form: parquet source → watermark → tumbling window.
    * Built on a conf-isolated session clone (see [[nanosSession]]).
    */
  def hourlyStream(spark: SparkSession, path: String): DataFrame = {
    readEventsStream(spark, path)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(20,4)")).as("total_value"))
      .select(col("w.start").as("hour"), col("event_type"),
        col("n_events"), col("total_value"))
  }

  /** Stream-stream INTERVAL JOIN: each click joined to every prior view
    * by the SAME user within `lagMinutes` — the canonical two-stream
    * time-range join (click attribution). Both sides carry watermarks
    * AND the join condition includes the time range; together they let
    * Spark BOUND each side's join state to the watermark horizon and
    * evict rows whose match window has passed. Without the range
    * condition (or with only one watermark) stream-stream join state
    * grows forever — that unbounded-state cliff is the whole scale
    * contract of this operator, which is why it is expressed here as a
    * first-class form rather than left to callers to assemble.
    *
    * The self-join of one bounded source is the local harness shape; a
    * production deployment points the two legs at separate sources.
    * Returns (user_id, click_id, view_id, lag_us) — the click→view lag
    * in MICROseconds via unix_micros, the full timestamp precision —
    * in Append mode; rows emit once both watermarks pass the match
    * window.
    */
  def intervalJoinStream(spark: SparkSession, path: String,
                         lagMinutes: Int = 240): DataFrame = {
    val ev = readEventsStream(spark, path)
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", "60 minutes")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "60 minutes")
    views.join(clicks,
        col("user_id") === col("c_user") &&
          col("view_ts") <= col("click_ts") &&
          col("view_ts") >= col("click_ts") - expr(s"INTERVAL $lagMinutes MINUTES"))
      .select(col("user_id"), col("click_id"), col("view_id"),
        // exact micros, not unix_timestamp: second-floor vs the
        // oracle's epoch rounding differs by 1 on sub-second tails
        (unix_micros(col("click_ts")) - unix_micros(col("view_ts")))
          .as("lag_us"))
  }

  /** [[intervalJoinStream]] run to completion over the bounded input. */
  def runIntervalJoinOnce(spark: SparkSession, path: String,
                          lagMinutes: Int = 240): DataFrame =
    runToMemory(intervalJoinStream(spark, path, lagMinutes),
      s"events_interval_join_$lagMinutes", OutputMode.Append())

  /** Run the streaming query synchronously over the (bounded) input and
    * return the completed result from the in-memory sink — the local
    * smoke harness for the streaming path.
    */
  def runStreamOnce(spark: SparkSession, path: String,
                    queryName: String = "events_hourly"): DataFrame =
    runToMemory(hourlyStream(spark, path), queryName, OutputMode.Complete())

  /** SLIDING-window streaming aggregate — the overlapping-window shape
    * ([[hourlyStream]] is tumbling, [[sessionWindowStream]] gap-based):
    * `window(ts, "2 hours", "1 hour")` lands every event in exactly
    * two windows, so the state store keys 2× the windows-in-flight per
    * type — still bounded by the watermark, which evicts a window only
    * after BOTH its overlapping successors close. The slide/length
    * ratio is the state multiplier; that linear trade (smoother series
    * ↔ more state) is the capacity rule for sliding windows at scale.
    */
  def slidingStream(spark: SparkSession, path: String): DataFrame =
    readEventsStream(spark, path)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n_events"))

  /** Run [[slidingStream]] to completion (memory sink, complete mode). */
  def runSlidingOnce(spark: SparkSession, path: String,
                     queryName: String = "events_sliding"): DataFrame =
    runToMemory(slidingStream(spark, path), queryName, OutputMode.Complete())

  /** Declarative streaming sessionization: the built-in
    * `session_window` aggregate over a watermarked stream — Spark
    * merges overlapping per-key windows in the state store, so gap
    * sessionization needs no custom state code at all (contrast
    * [[Sessionize]]'s `flatMapGroupsWithState`, which exists for
    * session logic the declarative form can't express). State is
    * O(open sessions); the watermark finalizes and evicts sessions
    * whose gap has passed.
    *
    * Output-mode semantics matter here: Spark only supports APPEND for
    * streaming session windows, and append emits a session only once
    * the watermark passes its close — so a bounded run WITHHOLDS every
    * session still open under the final watermark (max event time −
    * delay). That is not a harness artifact to paper over; it is the
    * operator's contract, and `q_session_window_stream`'s oracle
    * encodes it: the expected rows are exactly the batch sessions
    * whose close precedes the final watermark. The withheld tail is
    * what a production pipeline sees as watermark latency.
    *
    * Boundary contract: `session_window` SPLITS a consecutive pair
    * exactly `gap` apart (windows are `[ts, ts+gap)`, strict <) where
    * the lag+cumsum batch form merges it (strict > starts a session) —
    * see the [[Sessionize]] scaladoc for the one-ulp convention and
    * when it matters (quantized timestamps).
    */
  def sessionWindowStream(spark: SparkSession, path: String,
                          gap: String = "5 minutes"): DataFrame =
    readEventsStream(spark, path)
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(min("ts").as("session_start"), max("ts").as("session_end"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"))

  /** Run [[sessionWindowStream]] to completion (memory sink, append
    * mode — the only mode Spark supports for session windows; the
    * scaladoc above explains the watermark-finalization contract).
    */
  def runSessionWindowOnce(spark: SparkSession, path: String,
                           queryName: String = "events_session_window"): DataFrame =
    runToMemory(sessionWindowStream(spark, path), queryName, OutputMode.Append())

  /** Stream-static enrichment: the streaming side joins a STATIC
    * dimension (broadcast — no state, re-resolved per micro-batch)
    * before the windowed aggregate. This is the standard "enrich the
    * firehose with reference data" topology; unlike a stream-stream
    * join it keeps zero join state, so the dimension can be swapped
    * under a running query and the only stateful operator remains the
    * windowed agg. The demo dimension derives deterministically from
    * the event types (label + a length weight) so a DuckDB batch
    * oracle can reproduce it.
    */
  def enrichStream(spark: SparkSession, path: String): DataFrame = {
    val stream = readEventsStream(spark, path)
    val s = stream.sparkSession // the conf-scoped clone owns both sides
    val dim = broadcast(
      s.read.parquet(path).select(col("event_type")).distinct()
        .withColumn("label", upper(col("event_type")))
        .withColumn("type_weight", length(col("event_type"))))
    stream.join(dim, Seq("event_type"))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 day").as("w"), col("label"), col("type_weight"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("user_id") % 100).as("user_checksum"))
      .select(col("w.start").as("day"), col("label"), col("type_weight"),
        col("n_events"), col("user_checksum"))
  }

  /** Bounded-run harness for [[enrichStream]] (memory sink). */
  def runEnrichOnce(spark: SparkSession, path: String,
                    queryName: String = "events_enriched"): DataFrame =
    runToMemory(enrichStream(spark, path), queryName, OutputMode.Complete())

  /** Streaming dedup: first occurrence per (user_id, event_type) via
    * stateful `dropDuplicates`. State is one entry per distinct key —
    * for an UNBOUNDED key universe switch to
    * `dropDuplicatesWithinWatermark`, which expires key state once the
    * watermark passes it (the standard bounded-state form); on this
    * bounded demo stream exact dedup keeps the oracle simple.
    */
  def dedupStream(spark: SparkSession, path: String): DataFrame =
    readEventsStream(spark, path)
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("user_id", "event_type")

  /** Streaming dedup with BOUNDED state: `dropDuplicatesWithinWatermark`
    * evicts a key's dedup state once the watermark passes its event
    * time — the production form for an UNBOUNDED key universe, where
    * [[dedupStream]]'s exact `dropDuplicates` state would grow without
    * limit. The semantic contract is weaker and explicit: duplicates
    * are only guaranteed suppressed if they arrive within the watermark
    * delay of the first occurrence; a duplicate arriving after eviction
    * re-emits. On the bounded demo (one file, AvailableNow → a single
    * micro-batch, no mid-run eviction) the surviving key set equals
    * exact distinct, which is what the oracle pins — the state-size
    * difference, not the result, is the point at scale.
    */
  def dedupStreamWithinWatermark(spark: SparkSession, path: String): DataFrame =
    readEventsStream(spark, path)
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** Run [[dedupStreamWithinWatermark]] to completion and reduce to the
    * order-independent per-type distinct-key summary ([[runDedupOnce]]'s
    * contract).
    */
  def runDedupWithinWatermarkOnce(spark: SparkSession, path: String,
                                  queryName: String = "events_dedup_wm"): DataFrame =
    runToMemory(dedupStreamWithinWatermark(spark, path), queryName, OutputMode.Append())
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_users"))

  /** Production file sink: `foreachBatch` writing each micro-batch to
    * a `batch_id=N` partition with overwrite — the standard idempotent
    * exactly-once-per-batch pattern. A replayed batch (restart between
    * sink write and offset commit) OVERWRITES its own partition instead
    * of appending duplicates; `partitionOverwriteMode=dynamic` at the
    * writer level (never session conf) keeps other partitions intact.
    * Returns the completed query; read the sink back with
    * `spark.read.parquet(outDir)`.
    */
  def sinkToParquetIdempotent(stream: DataFrame, outDir: String,
                              checkpointDir: String): StreamingQuery = {
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        batch.withColumn("batch_id", lit(batchId))
          .write
          .mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(outDir)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    recordRun(q)
    q
  }

  /** Streaming materialized-view maintenance: each micro-batch writes
    * its PARTIAL aggregates (n, Σ per key) to a `batch_id=K` partition
    * of a parquet state table; the served rollup is a groupBy-sum over
    * the partials ([[readRollup]]). The streaming form of the
    * `q_incr_agg` pattern, with the same idempotence mechanism as
    * [[sinkToParquetIdempotent]]: a replayed batch OVERWRITES its own
    * partition rather than double-merging — exactly-once effect on the
    * rollup without transactions, because partials are only ever
    * replaced, never read-modify-written.
    *
    * Scale: what crosses foreachBatch is one row per (key, batch) —
    * the raw events never land twice. Partials accumulate one
    * partition per batch; compact periodically (read → groupBy-sum →
    * overwrite into one `batch_id=-1` partition — same merge the
    * read path already does, so compaction never changes the served
    * answer). State stays keys × (uncompacted batches + 1).
    */
  def maintainRollup(stream: DataFrame, keys: Seq[String], valueCol: String,
                     stateDir: String, checkpointDir: String): StreamingQuery = {
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        batch.groupBy(keys.map(col): _*)
          .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("s"))
          .withColumn("batch_id", lit(batchId))
          .write
          .mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(stateDir)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    recordRun(q)
    q
  }

  /** Streaming keyed-UPSERT snapshot maintenance: each micro-batch
    * merges into a latest-row-per-key snapshot — the streaming MERGE
    * INTO, without a transactional table format. Batch k reads the
    * newest `gen=<j>` generation with j < k, unions its rows, keeps
    * the per-key max by `orderCols` ([[ScaleOps.latestByKey]] — one
    * map-side-combined max_by, no per-key sort), and writes the merged
    * snapshot as `gen=k`. Readers always see a COMPLETE generation
    * ([[readSnapshot]] picks the max) — no torn reads, because a
    * generation becomes the max only after its write finishes.
    *
    * Exactly-once comes from the generation discipline, same mechanism
    * as [[sinkToParquetIdempotent]]'s partition overwrite: a REPLAYED
    * batch k ignores its own stale `gen=k` (the `< k` filter) and
    * rewrites it from the same inputs — byte-identical, because the
    * merge is deterministic.
    *
    * Scale: each merge rewrites the SNAPSHOT (keys-sized), never the
    * event history — right when keys ≪ events (the upsert use case).
    * Old generations accumulate for time travel; prune by retention.
    * For key universes too large to rewrite per batch, hash-partition
    * the snapshot by key and overwrite only the partitions a batch
    * touches (`partitionOverwriteMode=dynamic`, the
    * [[maintainRollup]] device) — same generation rule per partition.
    */
  def maintainSnapshot(stream: DataFrame, keys: Seq[String], orderCols: Seq[String],
                       snapDir: String, checkpointDir: String): StreamingQuery = {
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val s = batch.sparkSession
        val root = new org.apache.hadoop.fs.Path(snapDir)
        val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
        val prevGen =
          if (fs.exists(root))
            fs.listStatus(root).toSeq.map(_.getPath.getName)
              .filter(_.startsWith("gen=")).map(_.stripPrefix("gen=").toLong)
              .filter(_ < batchId).sorted.lastOption
          else None
        val prev = prevGen.map(g => s.read.parquet(s"$snapDir/gen=$g"))
        val merged = ScaleOps.latestByKey(
          prev.map(_.unionByName(batch.toDF())).getOrElse(batch.toDF()),
          keys, orderCols)
        merged.write.mode("overwrite").parquet(s"$snapDir/gen=$batchId")
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    recordRun(q)
    q
  }

  /** Read the newest complete generation written by [[maintainSnapshot]]. */
  def readSnapshot(spark: SparkSession, snapDir: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(snapDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val latest = fs.listStatus(root).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("gen=")).map(_.stripPrefix("gen=").toLong).max
    spark.read.parquet(s"$snapDir/gen=$latest")
  }

  /** Serve the rollup maintained by [[maintainRollup]]: merge the
    * per-batch partials. Cheap — state is keys × batches, not events.
    */
  def readRollup(spark: SparkSession, stateDir: String, keys: Seq[String]): DataFrame =
    spark.read.parquet(stateDir)
      .groupBy(keys.map(col): _*)
      .agg(sum("n").as("n_events"), sum("s").as("s_raw"))

  /** Conversion funnel, batch form: click → purchase by the same user
    * within `windowSec`. The plan is an equi-join on the
    * high-cardinality user key with the time range as a residual
    * predicate — the exact shape Spark's stream-stream join executes,
    * so the batch result is the semantic spec for [[funnelStream]].
    * Time deltas compare `cast(ts as double)` (fractional epoch
    * seconds), the cross-engine-stable form.
    */
  def funnelBatch(events: DataFrame, windowSec: Int = 600): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
    val buys = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
    clicks.join(buys,
      col("user_id") === col("p_user") &&
        (col("purchase_ts").cast("double") - col("click_ts").cast("double"))
          .between(0, windowSec))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"))
  }

  /** Conversion funnel, stream-stream form: inner join of two streams
    * derived from the same source (a supported self-join). Both sides
    * carry watermarks and the join condition bounds purchase_ts
    * relative to click_ts, so each side's buffered state expires as
    * the watermark passes — state is O(events in the join window), not
    * O(stream). Inner joins emit exactly the batch-join rows for
    * bounded input, which the unit test asserts against
    * [[funnelBatch]].
    */
  def funnelStream(spark: SparkSession, path: String,
                   windowSec: Int = 600): DataFrame = {
    val ev = readEventsStream(spark, path)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "30 minutes")
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "30 minutes")
    clicks.join(buys,
      col("c_user") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $windowSec SECONDS"))
      .select(col("c_user").as("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"))
  }

  /** Stream-stream LEFT OUTER funnel: like [[funnelStream]], but
    * clicks with no purchase in the window are ALSO emitted (null
    * purchase) — the semantics an inner join can't give. Outer
    * emission is watermark-driven: a buffered click is declared
    * unmatched only when the watermark passes its last possible match
    * time (click_ts + window), so on a bounded run the trailing
    * clicks stay buffered and are withheld — the oracle for
    * `q_event_funnel_outer` encodes that contract exactly, as
    * `q_session_window_stream`'s does for session finalization.
    */
  def funnelStreamOuter(spark: SparkSession, path: String,
                        windowSec: Int = 600): DataFrame = {
    val ev = readEventsStream(spark, path)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "30 minutes")
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "30 minutes")
    clicks.join(buys,
        col("c_user") === col("p_user") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $windowSec SECONDS"),
        "left_outer")
      .select(col("c_user").as("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"))
  }

  /** Run [[funnelStreamOuter]] to completion (memory sink). */
  def runFunnelOuterOnce(spark: SparkSession, path: String, windowSec: Int = 600,
                         queryName: String = "events_funnel_outer"): DataFrame =
    runToMemory(funnelStreamOuter(spark, path, windowSec), queryName, OutputMode.Append())

  /** Run [[funnelStream]] to completion (memory sink). */
  def runFunnelOnce(spark: SparkSession, path: String, windowSec: Int = 600,
                    queryName: String = "events_funnel"): DataFrame =
    runToMemory(funnelStream(spark, path, windowSec), queryName, OutputMode.Append())

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
