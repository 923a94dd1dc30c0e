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

  /** Reference sequential additive Holt–Winters (l₁=y₁, b₁=0, ring 0s;
    * q_holt_winters op order) in plain Scala: returns per-point
    * (l, b, s, forecast_next).
    */
  private def seqHw(ys: Seq[Double], a: Double, b: Double, g: Double,
      period: Int): Seq[(Double, Double, Double, Double)] = {
    val init = (ys.head, 0.0, 0.0, Vector.fill(period)(0.0))
    val states = ys.tail.scanLeft(init) { case ((l, t, _, ring), y) =>
      val lN = a * (y - ring.head) + (1.0 - a) * (l + t)
      val tN = b * (lN - l) + (1.0 - b) * t
      val sN = g * (y - lN) + (1.0 - g) * ring.head
      (lN, tN, sN, ring.tail :+ sN)
    }
    states.map { case (l, t, s, ring) => (l, t, s, l + t + ring.head) }
  }

  test("holtWintersChunked: basis-propagated boundaries equal the sequential fold") {
    val (a, b, g) = (0.5, 0.3, 0.2)
    val pts = (series("a", 3) ++ series("b", 55)).toDF("k", "t", "y")
    val got = Forecast.holtWintersChunked(pts, Seq("k"), "t", "y",
        a, b, g, period = 7, chunkSize = 9) // 53 points: 6 chunks, last partial
      .orderBy("k", "t").collect()
    assert(got.length == 106)
    val expected = Map("a" -> seqHw(series("a", 3).map(_._3), a, b, g, 7),
      "b" -> seqHw(series("b", 55).map(_._3), a, b, g, 7))
    got.foreach { r =>
      val (el, et, es, ef) = expected(r.getString(0))(r.getInt(1) - 1)
      for (((gv, ev), n) <- Seq((r.getDouble(3), el), (r.getDouble(4), et),
          (r.getDouble(5), es), (r.getDouble(6), ef)).zip(
            Seq("level", "trend", "seasonal", "forecast")))
        assert(math.abs(gv - ev) <= 1e-9 * math.max(1.0, math.abs(ev)),
          s"$n of $r expected $ev")
    }
    // single-chunk degenerate case runs the plain fold: BIT-exact
    val one = Forecast.holtWintersChunked(pts, Seq("k"), "t", "y",
        a, b, g, period = 7, chunkSize = 1000)
      .orderBy("k", "t").collect()
    one.foreach { r =>
      val (el, et, es, ef) = expected(r.getString(0))(r.getInt(1) - 1)
      assert(r.getDouble(3) == el && r.getDouble(4) == et &&
        r.getDouble(5) == es && r.getDouble(6) == ef)
    }
  }

  test("cusumChunked: max-plus composition is BIT-exact vs the sequential fold") {
    // longs with sign changes and zero-clamps hitting inside AND at
    // chunk boundaries; two keys for isolation
    def devs(k: String, seed: Int): Seq[(String, Int, Long, Long)] =
      (1 to 53).map { i =>
        val d = ((i * 29 + seed) % 17 - 8).toLong * 100
        (k, i, d - 150, -d - 150)
      }
    val rows = devs("a", 1) ++ devs("b", 9)
    val pts = rows.toDF("k", "t", "dp", "dn")
    def seqCusum(ds: Seq[Long]): Seq[Long] =
      ds.scanLeft(0L)((s, d) => math.max(0L, s + d)).tail
    val expTp = Map("a" -> seqCusum(devs("a", 1).map(_._3)),
      "b" -> seqCusum(devs("b", 9).map(_._3)))
    val expTn = Map("a" -> seqCusum(devs("a", 1).map(_._4)),
      "b" -> seqCusum(devs("b", 9).map(_._4)))
    for (cs <- Seq(2, 7, 1000)) {
      val got = Forecast.cusumChunked(pts, Seq("k"), "t", "dp", "dn", cs)
        .orderBy("k", "t").collect()
      assert(got.length == 106)
      got.foreach { r =>
        assert(r.getLong(2) == expTp(r.getString(0))(r.getInt(1) - 1), s"tp $r cs=$cs")
        assert(r.getLong(3) == expTn(r.getString(0))(r.getInt(1) - 1), s"tn $r cs=$cs")
      }
    }
  }
}
