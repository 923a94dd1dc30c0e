package graft

import graft.ext.{Graph, Inference}
import org.apache.spark.sql.functions._

/** Hand-computable pins for the round-11 k-sample / experimentation /
  * category-graph operators — the oracle gate proves engine AGREEMENT;
  * these prove the STATISTICS are the textbook ones (the round-11
  * Friedman denominator bug — a stray ·n that both engines mirrored,
  * so the oracle stayed green while the statistic was χ²/n — is the
  * regression class this suite exists for).
  */
class KSampleSpec extends SparkSpec {
  import spark.implicits._

  test("friedmanT1: perfect 2-block agreement gives the classic chi2 = 4") {
    // blocks b1, b2 each rank the three treatments identically:
    // ranks 1,2,3 twice -> R_j = 2,4,6; classic Friedman
    // 12/(n k (k+1)) * sum R^2 - 3 n (k+1) = 28 - 24 = 4
    val d = Seq(("b1", "t1", 10L), ("b1", "t2", 20L), ("b1", "t3", 30L),
        ("b2", "t1", 1L), ("b2", "t2", 2L), ("b2", "t3", 3L))
      .toDF("b", "trt", "y")
    val got = Inference.friedmanT1(d, col("b"), col("trt"), col("y"))
      .orderBy("trt").collect()
    assert(got.length == 3)
    got.foreach(r => assert(r.getAs[Double]("friedman_chi2") == 4.0))
    assert(got.map(_.getAs[Double]("mean_rank")).toSeq == Seq(1.0, 2.0, 3.0))
  }

  test("friedmanT1: incomplete blocks drop; all-tied blocks yield null") {
    val incomplete = Seq(("b1", "t1", 1L), ("b1", "t2", 2L),
        ("b2", "t1", 5L), ("b2", "t2", 6L), ("b2", "t3", 7L))
      .toDF("b", "trt", "y")
    // b1 lacks t3 (k = 3 measured from data) -> only b2 survives
    val got = Inference.friedmanT1(incomplete, col("b"), col("trt"), col("y"))
      .orderBy("trt").collect()
    assert(got.forall(_.getAs[Long]("n_blocks") == 1L))
    val tied = Seq(("b1", "t1", 5L), ("b1", "t2", 5L), ("b1", "t3", 5L))
      .toDF("b", "trt", "y")
    val g2 = Inference.friedmanT1(tied, col("b"), col("trt"), col("y")).collect()
    assert(g2.forall(_.isNullAt(g2.head.fieldIndex("friedman_chi2"))))
  }

  test("anovaF: two groups with known sums give the textbook F") {
    // g1 = {1,2,3}, g2 = {4,5,6}: SSB = 13.5, SSW = 4, F = 13.5/(4/4) = 13.5
    val d = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 4L), ("b", 5L), ("b", 6L))
      .toDF("g", "x")
    val r = Inference.anovaF(d, Seq("g"), col("x")).head()
    assert(r.getAs[Double]("f_stat") == 13.5)
    assert(r.getAs[Double]("eta_sq") == math.rint(13.5 / 17.5 * 1e6) / 1e6)
  }

  test("grubbsMax: suspect side decided by the exact integer compare") {
    // mean = 3, max-dev side is the max (9): n*(mx+mn) = 5*10 = 50 >= 2s = 30
    val d = Seq(("g", 1L), ("g", 1L), ("g", 2L), ("g", 2L), ("g", 9L))
      .toDF("g", "x")
    val r = Inference.grubbsMax(d, Seq("g"), col("x")).head()
    assert(r.getAs[Long]("suspect_val") == 9L)
    // symmetric data ties the compare -> max side wins deterministically
    val sym = Seq(("g", 1L), ("g", 3L), ("g", 5L)).toDF("g", "x")
    assert(Inference.grubbsMax(sym, Seq("g"), col("x")).head()
      .getAs[Long]("suspect_val") == 5L)
  }

  test("diffInDiff: constructed 2x2 recovers the planted effect") {
    // ctrl: 10 -> 12 (slope 2); treat: 20 -> 27 (slope 7); DiD = 5
    val d = Seq((0, 0, 10L), (0, 1, 12L), (1, 0, 20L), (1, 1, 27L))
      .toDF("tr", "po", "y")
    val r = Inference.diffInDiff(d, col("tr"), col("po"), col("y")).head()
    assert(r.getAs[Double]("slope_ctrl") == 2.0)
    assert(r.getAs[Double]("slope_treat") == 7.0)
    assert(r.getAs[Double]("did") == 5.0)
  }

  test("cupedAdjust: perfectly correlated covariate removes all variance") {
    // y = 2x per unit -> theta = 2, rho^2 = 1, adjusted diff = 0
    val d = Seq((1L, 0, 10L, 20L), (2L, 0, 20L, 40L),
        (3L, 1, 30L, 60L), (4L, 1, 40L, 80L))
      .toDF("u", "arm", "x", "y")
    val r = Inference.cupedAdjust(d, col("u"), col("arm"), col("x"), col("y"))
      .head()
    assert(r.getAs[Double]("theta") == 2.0)
    assert(r.getAs[Double]("rho_sq") == 1.0)
    assert(r.getAs[Double]("diff_cuped") == 0.0)
  }

  test("sccLabels: cycle + tail condense to the known components") {
    // 1->2->3->1 is one SCC; 3->4, 4->5, 5->4: {4,5} the second
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L), (5L, 4L))
      .toDF("src", "dst")
    val got = Graph.sccLabels(e).orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (4L, 4L, 2L), (5L, 4L, 2L)))
    spark.catalog.clearCache()
  }

  test("bipartiteComponents: even cycle true, odd cycle false") {
    // square 1-2-3-4-1 (bipartite) and triangle 5-6-7 (not)
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L),
        (5L, 6L), (6L, 7L), (7L, 5L)).toDF("src", "dst")
    val got = Graph.bipartiteComponents(e).orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(got == Seq((1L, 1L, true), (2L, 1L, true), (3L, 1L, true),
      (4L, 1L, true), (5L, 5L, false), (6L, 5L, false), (7L, 5L, false)))
    spark.catalog.clearCache()
  }

  test("giniSplitScan: planted perfect split is flagged best with gini 0") {
    // label true iff v > 2: threshold 2 separates perfectly
    val d = Seq((1L, false), (2L, false), (3L, true), (4L, true))
      .toDF("v", "lab")
    val got = Inference.giniSplitScan(d, col("v"), col("lab"))
      .orderBy("threshold").collect()
    val best = got.filter(_.getAs[Boolean]("is_best"))
    assert(best.length == 1 && best.head.getAs[Long]("threshold") == 2L)
    assert(best.head.getAs[Double]("gini_split") == 0.0)
  }

  test("kruskalWallisH: identical groups give H = 0 under full ties") {
    val d = Seq(("a", 1L), ("a", 2L), ("b", 1L), ("b", 2L)).toDF("g", "x")
    val r = Inference.kruskalWallisH(d, Seq("g"), col("x")).head()
    assert(r.getAs[Double]("h_corrected") == 0.0)
  }
}
