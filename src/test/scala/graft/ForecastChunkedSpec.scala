package graft

import graft.ext.Forecast
import org.apache.spark.sql.functions._

/** Gates for the chunked (segmented-scan) long-series folds — the
  * SCALING.md-promised fallback for series too long to collect into
  * one task. The contract: chunked == collected to float-reassociation
  * tolerance (composing A·s_in + B at chunk boundaries reorders IEEE
  * ops), and EXACT round-6 equality on the real testdata grids the
  * oracle gate hashes.
  */
class ForecastChunkedSpec extends SparkSpec {
  import spark.implicits._

  private val alpha = 0.3
  private val beta = 0.3

  /** Reference sequential EWMA in plain Scala. */
  private def seqEwma(ys: Seq[Double]): Seq[Double] =
    ys.tail.scanLeft(ys.head)((s, y) => alpha * y + (1.0 - alpha) * s)

  /** Reference sequential Holt (l1=y1, b1=0) in plain Scala. */
  private def seqHolt(ys: Seq[Double], a: Double, b: Double): Seq[(Double, Double)] =
    ys.tail.scanLeft((ys.head, 0.0)) { case ((l, t), y) =>
      val lN = a * y + (1.0 - a) * (l + t)
      (lN, b * (lN - l) + (1.0 - b) * t)
    }

  // 53 points (PRIME vs chunkSize 7: last chunk is partial) per key,
  // two keys to prove key isolation
  private def series(k: String, seed: Int): Seq[(String, Int, Double)] =
    (1 to 53).map(i => (k, i, ((i * 37 + seed) % 101 + 0.25) * 3.5))

  test("ewmaChunked equals the sequential fold across many chunk boundaries") {
    val pts = (series("a", 3) ++ series("b", 55)).toDF("k", "t", "y")
    val got = Forecast.ewmaChunked(pts, Seq("k"), "t", "y", alpha, chunkSize = 7)
      .orderBy("k", "t").collect()
    assert(got.length == 106)
    val expected = Map("a" -> seqEwma(series("a", 3).map(_._3)),
      "b" -> seqEwma(series("b", 55).map(_._3)))
    got.foreach { r =>
      val e = expected(r.getString(0))(r.getInt(1) - 1)
      assert(math.abs(r.getDouble(3) - e) <= 1e-9 * math.max(1.0, math.abs(e)),
        s"row $r expected $e")
    }
    // single-chunk degenerate case (chunkSize > series) IS the plain
    // sequential fold — same literals, same op order — so it is
    // BIT-exact against the reference (multi-chunk is only
    // tolerance-equal: boundary composition reassociates IEEE ops)
    val one = Forecast.ewmaChunked(pts, Seq("k"), "t", "y", alpha, chunkSize = 100)
      .orderBy("k", "t").collect()
    one.foreach { r =>
      assert(r.getDouble(3) == expected(r.getString(0))(r.getInt(1) - 1))
    }
  }

  test("holtChunked equals the sequential fold across many chunk boundaries") {
    val pts = (series("a", 3) ++ series("b", 55)).toDF("k", "t", "y")
    val got = Forecast.holtChunked(pts, Seq("k"), "t", "y", alpha, beta, chunkSize = 7)
      .orderBy("k", "t").collect()
    assert(got.length == 106)
    val expected = Map("a" -> seqHolt(series("a", 3).map(_._3), alpha, beta),
      "b" -> seqHolt(series("b", 55).map(_._3), alpha, beta))
    got.foreach { r =>
      val (el, eb) = expected(r.getString(0))(r.getInt(1) - 1)
      assert(math.abs(r.getDouble(3) - el) <= 1e-9 * math.max(1.0, math.abs(el)),
        s"level $r expected $el")
      assert(math.abs(r.getDouble(4) - eb) <= 1e-9 * math.max(1.0, math.abs(eb)),
        s"trend $r expected $eb")
    }
  }

  test("chunked folds match the collected fold at round-6 on the real daily grid") {
    // the exact grid q_ewma/q_holt aggregate: per-type daily totals.
    // round(…, 6) equality here is what licenses q_ewma_chunked /
    // q_holt_chunked to share the sequential recursive-CTE oracles.
    val daily = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(round(sum("value"), 2).as("day_total"))
      .select(col("event_type"),
        date_format(col("day"), "yyyy-MM-dd").as("day"), col("day_total"))
    val collected = Forecast.ewma(daily, Seq("event_type"), "day", "day_total", alpha)
      .select(col("event_type"), col("day"), round(col("ewma"), 6).as("v"))
    val chunkedE = Forecast.ewmaChunked(daily, Seq("event_type"), "day", "day_total",
        alpha, chunkSize = 16)
      .select(col("event_type"), col("day"), round(col("ewma"), 6).as("v"))
    assert(collected.count() > 100)
    assert(collected.exceptAll(chunkedE).isEmpty && chunkedE.exceptAll(collected).isEmpty)

    val chunkedH = Forecast.holtChunked(daily, Seq("event_type"), "day", "day_total",
        0.5, 0.3, chunkSize = 16)
      .select(col("event_type"), col("day"),
        round(col("level"), 6).as("l"), round(col("trend"), 6).as("b"))
    // q_holt's inline fold, re-expressed through the library twin: the
    // chunk-0-only path of holtChunked IS the collected convention
    val collectedH = Forecast.holtChunked(daily, Seq("event_type"), "day", "day_total",
        0.5, 0.3, chunkSize = 100000)
      .select(col("event_type"), col("day"),
        round(col("level"), 6).as("l"), round(col("trend"), 6).as("b"))
    assert(collectedH.exceptAll(chunkedH).isEmpty && chunkedH.exceptAll(collectedH).isEmpty)
  }
}
