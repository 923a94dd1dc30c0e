package graft

import graft.ext.Sketch
import graft.functions.KmvAgg
import org.apache.spark.sql.functions._

/** Gates the deterministic cardinality sketches (Sketch.hllDet* /
  * kmv*): KmvAgg's distinct-bottom-k buffer algebra, register
  * correctness against an in-JVM reference computation, the
  * register-max / sketch-union merge laws the 100-TB rollup story
  * depends on, and estimator accuracy against exact counts.
  */
class SketchDetSpec extends SparkSpec {
  import spark.implicits._

  lazy val events =
    spark.read.parquet(s"${SparkSpec.sf0001}/events.parquet").cache()

  // the JVM twin of Sketch.hash60 (md5 hex, first 15 chars)
  private def hash60Ref(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString.take(15), 16)
  }

  test("kmv agg: buffer is distinct, sorted, k-bounded; merge == whole") {
    val agg = new KmvAgg(4)
    val rows = Seq(9L, 3L, 7L, 3L, 1L, 9L, 5L, 2L, 1L)
    val whole = rows.foldLeft(agg.zero)(agg.reduce)
    assert(whole == List(1L, 2L, 3L, 5L), s"got $whole")
    for (cut <- 0 to rows.size) {
      val (l, r) = rows.splitAt(cut)
      val m = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      assert(m == whole, s"merge at cut=$cut diverged: $m")
    }
  }

  test("kmv agg: property — random values+splits == sorted distinct take k") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = Gen.listOfN(60, Gen.choose(0L, 25L)) // collisions guaranteed
    for (seed <- 1L to 40L) {
      val vals = gen.apply(Gen.Parameters.default, Seed(seed)).get
      val agg = new KmvAgg(5)
      val expect = vals.distinct.sorted.take(5)
      val cut = (seed % (vals.size + 1)).toInt
      val (l, r) = vals.splitAt(cut)
      val m = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      assert(m == expect, s"seed=$seed cut=$cut: $m != $expect")
    }
  }

  test("hllDet: registers match the in-JVM reference computation") {
    val regs = Sketch.hllDetRegisters(events, Seq("event_type"),
        col("user_id"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    val ref = scala.collection.mutable.Map.empty[(String, Long), Int]
    events.select("event_type", "user_id").collect().foreach { r =>
      val h = hash60Ref(r.getLong(1).toString)
      val bucket = h >>> 52
      val w = (h & ((1L << 52) - 1)) | (1L << 52)
      val rho = java.lang.Long.numberOfTrailingZeros(w) + 1
      val k = (r.getString(0), bucket)
      ref(k) = math.max(ref.getOrElse(k, 0), rho)
    }
    assert(regs == ref.toMap, "register table diverged from reference")
  }

  test("hllDet: register-max merge of shards == build over the union") {
    val (a, b) = (events.filter(col("event_id") % 2 === 0),
      events.filter(col("event_id") % 2 === 1))
    val merged = Sketch.hllDetRegisters(a, Seq("event_type"), col("user_id"))
      .unionByName(Sketch.hllDetRegisters(b, Seq("event_type"), col("user_id")))
      .groupBy("event_type", "bucket").agg(max("reg").as("reg"))
    val whole = Sketch.hllDetRegisters(events, Seq("event_type"), col("user_id"))
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty,
      "sharded register merge != single build")
  }

  test("hllDet: estimate within the ~3x standard-error band of exact") {
    val est = Sketch.hllDetEstimate(
        Sketch.hllDetRegisters(events, Seq("event_type"), col("user_id")),
        Seq("event_type"))
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    val exact = events.groupBy("event_type")
      .agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // se ~ 1.04/sqrt(256) = 6.5%; allow 3 sigma
    exact.foreach { case (g, n) =>
      val e = est(g)
      assert(math.abs(e - n) <= math.max(3.0, 0.195 * n),
        s"$g: est $e vs exact $n outside 3-sigma")
    }
  }

  test("kmv: sketch union law + jaccard estimate near exact") {
    val k = 64
    val sk = Sketch.kmvSketch(events, "event_type", col("user_id"), k)
    // the sketch of a group IS the k smallest distinct hashes
    val refMin = events.select(col("event_type"),
        Sketch.hash60(col("user_id")).as("hv")).distinct()
      .collect().groupBy(_.getString(0))
      .map { case (g, rs) => g -> rs.map(_.getLong(1)).distinct.sorted.take(k).toSeq }
    sk.collect().foreach { r =>
      assert(r.getSeq[Long](1) == refMin(r.getString(0)),
        s"${r.getString(0)}: sketch != k smallest distinct hashes")
    }
    // estimates vs exact Jaccard: within 4/sqrt(k) absolute
    val est = Sketch.kmvOverlap(sk, "event_type", k)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(4)).toMap
    val du = events.select(col("event_type").as("g"), col("user_id").as("u"))
      .distinct().collect().groupBy(_.getString(0))
      .map { case (g, rs) => g -> rs.map(_.getLong(1)).toSet }
    est.foreach { case ((ga, gb), j) =>
      val (sa, sb) = (du(ga), du(gb))
      val exact = sa.intersect(sb).size.toDouble / sa.union(sb).size
      assert(math.abs(j - exact) <= 4.0 / math.sqrt(k),
        s"($ga,$gb): kmv $j vs exact $exact")
    }
  }
}
