package graft

import graft.ext.Quantiles
import org.apache.spark.sql.functions._

/** The scale-path quantiles must agree with Spark's exact `percentile`
  * aggregate (the memory-unbounded form they replace) on real data.
  */
class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  lazy val li = spark.read.parquet(s"${SparkSpec.sf0001}/lineitem.parquet")

  test("exactQuantiles reproduces the exact percentile aggregate bit-for-bit") {
    val ps = Seq(0.0, 0.25, 0.5, 0.95, 1.0)
    val names = ps.indices.map(i => s"q$i")
    val got = Quantiles.exactQuantiles(li, "l_extendedprice", Seq("l_returnflag"), ps, names)
      .orderBy("l_returnflag").collect()
    val want = li.groupBy("l_returnflag")
      .agg(ps.zip(names).map { case (p, n) =>
        expr(s"percentile(l_extendedprice, $p)").as(n) }.head,
        ps.zip(names).map { case (p, n) =>
          expr(s"percentile(l_extendedprice, $p)").as(n) }.tail: _*)
      .orderBy("l_returnflag").collect()
    assert(got.length == want.length && got.nonEmpty)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getString(0) == w.getString(0))
      names.indices.foreach { i =>
        assert(g.getDouble(i + 1) == w.getDouble(i + 1),
          s"quantile ${ps(i)} of ${g.getString(0)}: ${g.getDouble(i + 1)} != ${w.getDouble(i + 1)}")
      }
    }
  }

  test("exactQuantiles handles duplicate-heavy and single-value groups") {
    val d = Seq(("a", 1.0), ("a", 1.0), ("a", 1.0), ("a", 2.0),
      ("b", 7.0)).toDF("k", "v")
    val got = Quantiles.exactQuantiles(d, "v", Seq("k"), Seq(0.5), Seq("p50"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getDouble(1)))
    // a: sorted [1,1,1,2], pos=1.5 -> interpolate(1,1)=1; b: single value
    assert(got.toSeq == Seq(("a", 1.0), ("b", 7.0)))
  }

  test("approxQuantiles lands within the documented rank-error bound") {
    val ps = Seq(0.5, 0.95)
    val accuracy = 10000
    val approx = Quantiles.approxQuantiles(li, "l_extendedprice",
        Seq("l_returnflag"), ps, Seq("p50", "p95"), accuracy)
      .orderBy("l_returnflag").collect()
    val n = li.count()
    val rankTol = math.ceil(n.toDouble / accuracy).toLong + 1
    val sorted = li.select("l_returnflag", "l_extendedprice").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    approx.foreach { r =>
      val vs = sorted(r.getString(0))
      ps.zipWithIndex.foreach { case (p, i) =>
        val v = r.getDouble(i + 1)
        val targetRank = (p * (vs.length - 1)).round
        val lo = math.max(0, targetRank - rankTol).toInt
        val hi = math.min(vs.length - 1, targetRank + rankTol).toInt
        assert(v >= vs(lo) && v <= vs(hi),
          s"approx p$p=$v outside rank window [${vs(lo)}, ${vs(hi)}]")
      }
    }
  }
}
