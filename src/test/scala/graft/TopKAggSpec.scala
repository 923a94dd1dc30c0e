package graft

import graft.functions.{Scored, TopKAgg}
import org.apache.spark.sql.functions._

/** Gates the bounded top-k typed Aggregator (the window-rewrite UDAF):
  * algebraic properties of the buffer ops, equivalence with the
  * row_number() window form on real data, and the partial-aggregation
  * plan shape that makes it the scale win.
  */
class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  lazy val orders = spark.read.parquet(s"${SparkSpec.sf0001}/orders.parquet").cache()

  test("topk: buffer ops bounded, sorted, merge-associative") {
    val agg = new TopKAgg(3)
    val rows = Seq(Scored(5.0, 10L), Scored(7.0, 2L), Scored(5.0, 3L),
      Scored(1.0, 9L), Scored(7.0, 1L), Scored(9.0, 4L))
    val whole = rows.foldLeft(agg.zero)(agg.reduce)
    assert(whole.size == 3)
    assert(whole == List(Scored(9.0, 4L), Scored(7.0, 1L), Scored(7.0, 2L)))
    // merge of any split == reduce of the whole (what partial agg relies on)
    for (cut <- 0 to rows.size) {
      val (l, r) = rows.splitAt(cut)
      val m = agg.merge(l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      assert(m == whole, s"merge at cut=$cut diverged")
    }
    // ties: equal scores order by ascending id
    val tied = Seq(Scored(2.0, 7L), Scored(2.0, 1L), Scored(2.0, 4L), Scored(2.0, 2L))
      .foldLeft(agg.zero)(agg.reduce)
    assert(tied.map(_.id) == List(1L, 2L, 4L))
  }

  test("topk: property — random inputs, random splits, random merge order == sort.take(k)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val genRow = for {
      s <- Gen.frequency(3 -> Gen.choose(-10, 10).map(_.toDouble), // ties likely
                         1 -> Gen.choose(-1e6, 1e6))
      i <- Gen.choose(0L, 50L) // duplicate ids across rows exercise tie-breaks
    } yield Scored(s, i)
    for (seed <- 1L to 40L) {
      val params = Gen.Parameters.default
      val rows = Gen.listOfN(60, genRow).apply(params, Seed(seed)).get
      val k = Gen.choose(1, 8).apply(params, Seed(seed * 7 + 1)).get
      val agg = new TopKAgg(k)
      val expected = rows.sortBy(r => (-r.score, r.id)).take(k)
      // random partitioning into 1..6 chunks, folded then merged in order
      val nChunks = Gen.choose(1, 6).apply(params, Seed(seed * 13 + 2)).get
      val chunks = rows.grouped(math.max(1, rows.size / nChunks)).toList
      val merged = chunks.map(_.foldLeft(agg.zero)(agg.reduce)).reduce(agg.merge)
      assert(merged == expected, s"seed=$seed k=$k")
    }
  }

  test("topk: aggregator equals the row_number window form on orders") {
    val topk = udaf(new TopKAgg(3))
    val viaAgg = orders.groupBy("o_orderpriority")
      .agg(topk(col("o_totalprice"), col("o_orderkey")).as("top"))
      .select(col("o_orderpriority"), posexplode(col("top")))
      .select(col("o_orderpriority"), (col("pos") + 1).as("rnk"),
        col("col.score").as("score"), col("col.id").as("id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = orders
      .withColumn("rnk", row_number().over(w) - 1)
      .filter(col("rnk") < 3)
      .select(col("o_orderpriority"), col("rnk") + 1 as "rnk",
        col("o_totalprice").as("score"), col("o_orderkey").as("id"))
    assert(viaAgg.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaAgg).isEmpty)
  }

  test("topk: plan does partial aggregation before the exchange") {
    val topk = udaf(new TopKAgg(3))
    val plan = orders.repartition(8).groupBy("o_orderpriority")
      .agg(topk(col("o_totalprice"), col("o_orderkey")).as("top"))
      .queryExecution.executedPlan.toString
    // ObjectHashAggregate runs twice: partial (map-side, before the
    // shuffle) and final — the k-bounded buffer is what crosses the wire
    assert(plan.contains("ObjectHashAggregate"))
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      s"expected partial+final object hash aggregate, got:\n$plan")
  }

  test("bitmap distinct: equals count_distinct under any partitioning; domain guard fires") {
    val agg = new graft.functions.BitmapDistinct(256)
    // buffer algebra by hand: dup ids set one bit; merge is OR
    val b1 = Seq(3L, 9L, 3L).foldLeft(agg.zero)(agg.reduce)
    val b2 = Seq(9L, 200L).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(agg.merge(b1, b2)) === 3L)
    intercept[IllegalArgumentException](agg.reduce(agg.zero, 256L))
    intercept[IllegalArgumentException](agg.reduce(agg.zero, -1L))
    intercept[IllegalArgumentException](new graft.functions.BitmapDistinct(0))
    // real data, shuffled across partitions: must equal count(DISTINCT)
    val ev = spark.read.parquet(s"${SparkSpec.sf0001}/events.parquet")
      .repartition(7)
    val bd = udaf(new graft.functions.BitmapDistinct(1 << 16))
    val got = ev.groupBy("event_type").agg(bd(col("user_id")).as("n"))
      .orderBy("event_type").collect().map(r => r.getString(0) -> r.getLong(1))
    val want = ev.groupBy("event_type")
      .agg(countDistinct("user_id").as("n"))
      .orderBy("event_type").collect().map(r => r.getString(0) -> r.getLong(1))
    assert(got.toSeq === want.toSeq && got.nonEmpty)
  }
}
