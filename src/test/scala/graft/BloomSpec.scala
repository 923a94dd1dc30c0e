package graft

import graft.ext.Bloom
import org.apache.spark.sql.functions._

/** Bloom prefilter: the one-sided contract (zero false negatives,
  * bounded false positives), the join-free plan shape of the
  * definitely-new path, and agreement with the exact anti-join.
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("bloom: zero false negatives over every inserted item") {
    val corpus = spark.range(0, 5000).select(concat(lit("k"), col("id")).as("k"))
    val bits = Bloom.build(corpus, col("k"), expectedItems = 5000, fpp = 0.01).get
    val misses = corpus.filter(!Bloom.mightContain(bits, col("k"))).count()
    assert(misses == 0L, "a bloom filter must never reject an inserted item")
  }

  test("bloom: false-positive rate on a disjoint probe set stays near fpp") {
    val corpus = spark.range(0, 5000).select(concat(lit("k"), col("id")).as("k"))
    val bits = Bloom.build(corpus, col("k"), expectedItems = 5000, fpp = 0.01).get
    val probes = spark.range(1000000, 1020000).select(concat(lit("p"), col("id")).as("k"))
    val fp = probes.filter(Bloom.mightContain(bits, col("k"))).count()
    // 20k disjoint probes at fpp=1% → expect ~200; 3x headroom kills flake
    assert(fp <= 600, s"false-positive rate ${fp / 20000.0} far above the 0.01 design point")
  }

  test("bloom: empty corpus builds no filter; prefilter passes the whole batch") {
    val corpus = spark.range(0, 10).select(col("id")).filter(col("id") < 0)
    assert(Bloom.build(corpus, col("id"), expectedItems = 10).isEmpty)
    val batch = spark.range(0, 7).select(col("id"))
    val (defNew, maybe) = Bloom.prefilterNew(batch, corpus, col("id"), expectedItems = 10)
    assert(defNew.count() == 7L && maybe.count() == 0L)
  }

  test("bloom: prefilter + exact check agrees with the plain anti-join") {
    val corpus = Seq("a", "b", "c", "d").toDF("k")
    val batch = Seq("b", "d", "x", "y", "z").toDF("k")
    val (defNew, maybe) = Bloom.prefilterNew(batch, corpus, col("k"), expectedItems = 100)
    // new = definitely-new ∪ (admitted sliver minus true corpus hits)
    val got = defNew.unionByName(maybe.join(corpus, Seq("k"), "left_anti"))
      .as[String].collect().sorted
    val want = batch.join(corpus, Seq("k"), "left_anti").as[String].collect().sorted
    assert(got.sameElements(want))
  }

  test("bloom: the definitely-new path plans with no join") {
    // range sources (not local Seqs): ConvertToLocalRelation would
    // otherwise evaluate the probe at optimize time and fold the plan
    // away to a LocalTableScan
    val corpus = spark.range(0, 100).select(concat(lit("k"), col("id")).as("k"))
    val batch = spark.range(50, 150).select(concat(lit("k"), col("id")).as("k"))
    val (defNew, _) = Bloom.prefilterNew(batch, corpus, col("k"), expectedItems = 100)
    val plan = defNew.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"),
      s"probe must be a narrow filter, not a join:\n$plan")
    assert(plan.contains("might_contain"), s"expected the bloom probe in:\n$plan")
  }
}
