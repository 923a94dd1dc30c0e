package graft

import graft.ext.ScaleOps
import org.apache.spark.sql.functions._

/** Skew-salting and bucketed co-location: outputs must equal the naive
  * forms while the physical plan shows the changed shuffle layout.
  */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  lazy val li = spark.read.parquet(s"${SparkSpec.sf0001}/lineitem.parquet")
    .select("l_returnflag", "l_quantity")

  test("saltedJoin: output equals plain join; salt in the join keys") {
    val dim = li.select("l_returnflag").distinct()
      .withColumn("flag_label", concat(lit("F_"), $"l_returnflag"))
    val salted = ScaleOps.saltedJoin(li, dim, "l_returnflag", salts = 8)
      .groupBy("flag_label").agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
    val plain = li.join(dim, "l_returnflag")
      .groupBy("flag_label").agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
    assert(salted.orderBy("flag_label").collect().toSeq ==
      plain.orderBy("flag_label").collect().toSeq)
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("_salt"), "salt column absent from the physical join")
    assert(!plan.contains("BroadcastHashJoin"),
      "dim was broadcast — the salted shuffle never happened")
  }

  test("saltedJoin: left join keeps unmatched fact rows exactly once") {
    val fact = Seq(("a", 1), ("a", 2), ("b", 3), ("c", 4)).toDF("k", "v")
    val dim = Seq(("a", "A"), ("b", "B")).toDF("k", "lbl")
    val got = ScaleOps.saltedJoin(fact, dim, "k", salts = 4, joinType = "left")
      .orderBy("k", "v").collect()
      .map(r => (r.getString(0), r.getInt(1), Option(r.getString(2))))
    assert(got.toSeq == Seq(("a", 1, Some("A")), ("a", 2, Some("A")),
      ("b", 3, Some("B")), ("c", 4, None)))
  }

  test("bucketed tables join with zero exchanges") {
    val orders = spark.read.parquet(s"${SparkSpec.sf0001}/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    val items = spark.read.parquet(s"${SparkSpec.sf0001}/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    ScaleOps.writeBucketed(orders, "b_orders", "o_orderkey", 8)
    ScaleOps.writeBucketed(items.withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_items", "o_orderkey", 8)
    try {
      // merge hint: at this toy SF Spark would broadcast instead; the
      // bucketed co-location shows with the join strategy big-big
      // tables get
      val joined = spark.table("b_orders").hint("merge")
        .join(spark.table("b_items").hint("merge"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n${plan.take(800)}")
      assert(joined.count() ==
        orders.join(items, orders("o_orderkey") === items("l_orderkey")).count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_items")
    }
  }
}
