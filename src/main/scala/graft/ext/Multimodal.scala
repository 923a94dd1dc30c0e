package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus decode / feature-extract
  * / frame-sample plumbing.
  *
  * The actual media decode is STUBBED (this container has no image or
  * audio libraries): [[FakeCodec]] is a deterministic stand-in keyed on
  * the payload bytes, clearly marked. Everything AROUND the decode —
  * schema, batch shape, partitioning, the per-partition execution model
  * a real codec plugs into — is real and tested.
  *
  * Scale design: decode runs per-partition ([[decodeBatches]] via
  * `mapPartitions`) so a real codec amortizes model/library init once
  * per task, not once per row — the Scala analogue of Arrow-batched
  * pandas UDFs. Payload columns stay opaque binary through shuffles;
  * only extracted features (small, typed) flow into joins/aggregates.
  */
object Multimodal {

  /** A media row: opaque payload + source metadata. */
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  /** Decoded metadata a real image/audio codec would return. */
  case class MediaMeta(media_id: Long, kind: String, byte_len: Long,
                       width: Int, height: Int, n_frames: Int, checksum: String)

  /** STUB CODEC — deterministic fake decode keyed on payload bytes.
    * A real deployment replaces this object with JNI/javacv bindings;
    * the Spark-side plumbing does not change.
    */
  object FakeCodec {
    def decode(payload: Array[Byte], kind: String): (Int, Int, Int) = {
      val n = payload.length
      val w = 64 + (n % 193)          // fake width
      val h = 64 + ((n * 31) % 131)   // fake height
      val frames = if (kind == "video") 1 + n % 7 else 1
      (w, h, frames)
    }
  }

  /** Wrap any table into the media schema: payload = UTF-8 bytes of a
    * text column (the testdata has no true binary payloads; this keeps
    * the plumbing honest — payload is real `BinaryType`).
    */
  def asMedia(df: DataFrame, idCol: String, textCol: String,
              kind: String = "image"): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** Pure-SQL metadata extraction (no decode): byte length + checksum.
    * Narrow, codegen'd, oracle-friendly.
    */
  def withByteMeta(media: DataFrame): DataFrame =
    media
      .withColumn("byte_len", octet_length(col("payload")))
      .withColumn("checksum", md5(col("payload")))

  /** Batched decode via mapPartitions: one codec init per partition,
    * rows streamed through it. This is where a real codec goes.
    */
  def decodeBatches(media: DataFrame): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "payload").as[MediaRow]
      .mapPartitions { rows =>
        // init ONCE per partition (the point of mapPartitions); digest()
        // resets the instance after each call, so reuse is safe
        val md5 = java.security.MessageDigest.getInstance("MD5")
        rows.map { r =>
          val (w, h, f) = FakeCodec.decode(r.payload, r.kind)
          MediaMeta(r.media_id, r.kind, r.payload.length.toLong, w, h, f,
            md5.digest(r.payload).map("%02x".format(_)).mkString)
        }
      }
  }

  /** A media row with an extracted feature vector. */
  case class MediaFeatures(media_id: Long, kind: String, features: Array[Float])

  /** Feature extraction plumbing (the embedding-model slot): batched
    * per-partition execution so a real vision/audio model loads once
    * per task and consumes rows as batches. The STUB derives a
    * deterministic `dim`-float vector from the payload's md5 bytes —
    * byte value / 256, so the fake is reproducible across runs,
    * partitionings and engines. Downstream (ANN, near-dup) consumes
    * only the small typed vector; the opaque payload never shuffles.
    */
  def extractFeatures(media: DataFrame, dim: Int = 16): Dataset[MediaFeatures] = {
    require(dim >= 1 && dim <= 16, "stub digest yields at most 16 bytes")
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "payload").as[MediaRow]
      .mapPartitions { rows =>
        val md5 = java.security.MessageDigest.getInstance("MD5") // once per task
        rows.map { r =>
          val d = md5.digest(r.payload)
          MediaFeatures(r.media_id, r.kind,
            Array.tabulate(dim)(j => (d(j) & 0xff) / 256.0f))
        }
      }
  }

  /** Resize plumbing (binary → binary transform slot): the STUB
    * truncates or cyclically pads the payload to exactly `outBytes` —
    * the shape (per-row native transform, output size fixed by target
    * dimensions) of a real image resize, without an image library.
    * Runs in the same batched per-partition model as the decode.
    */
  def resizeTo(media: DataFrame, outW: Int, outH: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    val outBytes = outW * outH
    media.select("media_id", "kind", "payload").as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val out = new Array[Byte](outBytes)
          if (r.payload.nonEmpty) {
            var i = 0
            while (i < outBytes) { out(i) = r.payload(i % r.payload.length); i += 1 }
          }
          MediaRow(r.media_id, r.kind, out)
        }
      }
  }

  /** Cheap SQL-only feature path: the first `dim` md5 bytes of the
    * payload as doubles in [0,1) — one narrow codegen'd projection, no
    * mapPartitions, bit-identical to [[extractFeatures]]'s stub
    * (unit-asserted). The form an engine uses when features are
    * hash-derived rather than model-derived.
    */
  def sqlFeatures(payload: org.apache.spark.sql.Column, dim: Int): org.apache.spark.sql.Column = {
    require(dim >= 1 && dim <= 16)
    array((0 until dim).map { j =>
      conv(substring(md5(payload), 2 * j + 1, 2), 16, 10).cast("double") / 256.0
    }: _*)
  }

  /** Frame sampling plumbing: split a binary payload into fixed-size
    * chunks ("frames"), keeping every `stride`-th — the partition/
    * explode shape of real video frame extraction, on opaque bytes.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    media
      .withColumn("n_frames_total",
        ceil(octet_length(col("payload")).cast("double") / frameBytes).cast("int"))
      .withColumn("frame_idx",
        explode(filter(
          sequence(lit(0), greatest(col("n_frames_total") - 1, lit(0))),
          i => i % stride === 0)))
      .withColumn("frame",
        substring(col("payload"), col("frame_idx") * frameBytes + 1, lit(frameBytes)))
      .select("media_id", "kind", "frame_idx", "frame")
}
