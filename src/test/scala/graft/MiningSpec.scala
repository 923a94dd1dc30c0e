package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.{Affinity, Corpus, Dedup, Forecast, Graph, Inference, Privacy, ScaleOps, Sessionize, Similarity}

/** Specs for the round-4 mining/inference operators: gaps-and-islands,
  * association rules / PMI, Welch t, linear fit, mutual information,
  * fixed-iteration PageRank, seasonal-naive backtest. Fixtures are
  * hand-computable so every assertion is an exact expected value.
  */
class MiningSpec extends SparkSpec {
  import spark.implicits._

  test("islands: consecutive slots collapse; gaps split; duplicates ignored") {
    val df = Seq(("a", 1L), ("a", 2L), ("a", 2L), ("a", 3L), ("a", 7L),
        ("a", 8L), ("b", 5L))
      .toDF("k", "slot")
    val out = Sessionize.activityIslands(df, "k", col("slot"))
      .orderBy("k", "island_start").collect()
    assert(out.toSeq === Seq(Row("a", 1L, 3L, 3L), Row("a", 7L, 8L, 2L),
      Row("b", 5L, 5L, 1L)))
  }

  test("association rules: counts, support, confidence, lift by hand") {
    // 4 baskets; x in all 4, y in 2 (both with x), z in 1 (filtered by minItemCount=2)
    val df = Seq((1, "x"), (1, "y"), (2, "x"), (2, "y"), (3, "x"), (4, "x"),
        (4, "z"), (1, "x")) // duplicate (1,x) must not double-count
      .toDF("b", "i")
    val out = Affinity.associationRules(df, col("b"), col("i"),
        minItemCount = 2, minPairCount = 1).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[String]("item1") === "x" && r.getAs[String]("item2") === "y")
    assert(r.getAs[Long]("n_pair") === 2 && r.getAs[Long]("n1") === 4 &&
      r.getAs[Long]("n2") === 2)
    assert(r.getAs[Double]("support") === 0.5)     // 2/4
    assert(r.getAs[Double]("conf_1to2") === 0.5)   // 2/4
    assert(r.getAs[Double]("conf_2to1") === 1.0)   // 2/2
    assert(r.getAs[Double]("lift") === 1.0)        // 2*4/(4*2)
  }

  test("pmi: independent pair has pmi 0; perfectly-coupled pair positive") {
    // docs 1..4: p,q together in 2 of 4 docs and alone in one each →
    // P(p)=P(q)=3/4, P(p,q)=1/2, pmi = ln(8/9) < 0; r,s always together
    // in 2 docs → pmi = ln(2*4/(2*2)) = ln 2 > 0
    val df = Seq((1, "p"), (1, "q"), (2, "p"), (2, "q"), (3, "p"), (4, "q"),
        (5, "r"), (5, "s"), (6, "r"), (6, "s"))
      .toDF("d", "t")
    val out = Affinity.pmiPairs(df, col("d"), col("t"),
        minTermCount = 1, minPairCount = 1)
      .orderBy("term1").collect()
    val pq = out.find(r => r.getString(0) == "p").get
    val rs = out.find(r => r.getString(0) == "r").get
    assert(pq.getAs[Double]("pmi") === math.BigDecimal(math.log(2.0 * 6 / 9))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(rs.getAs[Double]("pmi") === math.BigDecimal(math.log(2.0 * 6 / 4))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("welch t: equal samples give t=0; known two-sample case matches") {
    // arm0 = {1,2,3}, arm1 = {4,5,6}: means 2 and 5, var 1 each,
    // se² = 1/3+1/3, t = 3/sqrt(2/3), df = (2/3)²/(2·(1/9)/2) = 4
    val df = Seq((0, 1L), (0, 2L), (0, 3L), (1, 4L), (1, 5L), (1, 6L))
      .toDF("arm", "x").withColumn("g", lit("m"))
    val r = Inference.welchT(df, Seq("g"), col("arm"), col("x")).collect().head
    assert(r.getAs[Double]("mean_diff") === 3.0)
    val expT = 3.0 / math.sqrt(2.0 / 3.0)
    assert(math.abs(r.getAs[Double]("t_stat") - expT) < 1e-6)
    assert(r.getAs[Double]("welch_df") === 4.0)
  }

  test("linear fit: exact line is recovered with r2 = 1") {
    val df = (1L to 10L).map(x => (x, 3 * x + 7)).toDF("x", "y")
      .withColumn("g", lit("m"))
    val r = Inference.linearFit(df, Seq("g"), col("x"), col("y")).collect().head
    assert(r.getAs[Double]("slope") === 3.0)
    assert(r.getAs[Double]("intercept") === 7.0)
    assert(r.getAs[Double]("r2") === 1.0)
  }

  test("mutual information: independent columns give ~0; copy gives H(X)") {
    val ind = Seq(("a", "u"), ("a", "v"), ("b", "u"), ("b", "v"))
      .toDF("xc", "yc")
    val mi0 = Inference.mutualInfo(ind, "xc", "yc")
      .agg(sum("mi_part")).collect().head.getDouble(0)
    assert(math.abs(mi0) < 1e-9)
    val dep = Seq(("a", "u"), ("a", "u"), ("b", "v"), ("b", "v"))
      .toDF("xc", "yc")
    val mi1 = Inference.mutualInfo(dep, "xc", "yc")
      .agg(sum("mi_part")).collect().head.getDouble(0)
    assert(math.abs(mi1 - math.log(2)) < 1e-6) // H(X) = ln 2 for the fair binary
  }

  test("pagerank: ranks sum to 1 and symmetry gives equal ranks") {
    // triangle graph — perfectly symmetric, so pr = 1/3 for each node
    // at every iteration
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("id1", "id2")
    val pr = Graph.pageRank(Graph.symmetrize(pairs), iters = 3).collect()
    assert(pr.forall(r => math.abs(r.getAs[Double]("pr") - 1.0 / 3) < 1e-6))
    // star graph: center out-ranks leaves, total mass ≈ 1
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("id1", "id2")
    val ranks = Graph.pageRank(Graph.symmetrize(star), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ranks(0L) > ranks(1L))
    assert(math.abs(ranks.values.sum - 1.0) < 1e-3)
  }

  test("bpe merges: pair counts weighted by word frequency; 1-char words skipped") {
    // "abab abab ab c" → words: abab ×2, ab ×1, c (skipped).
    // pairs: abab → ab,ba,ab (×2 each occurrence), ab → ab.
    // ab: 2·2+1 = 5, ba: 2
    val df = Seq("abab abab ab c").toDF("text")
    val out = Corpus.bpeMergeCandidates(df, topK = 10).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("ab" -> 5L, "ba" -> 2L))
  }

  test("ks test: identical arms give D=0; disjoint arms give D=1") {
    val same = Seq((0, 1L), (1, 1L), (0, 2L), (1, 2L)).toDF("arm", "v")
    val r0 = Inference.ksTest(same, col("arm"), col("v")).collect().head
    assert(r0.getAs[Double]("ks_stat") === 0.0)
    assert(!r0.getAs[Boolean]("reject_05"))
    val disj = Seq((0, 1L), (0, 2L), (1, 10L), (1, 11L)).toDF("arm", "v")
    val r1 = Inference.ksTest(disj, col("arm"), col("v")).collect().head
    assert(r1.getAs[Double]("ks_stat") === 1.0)
  }

  test("chi2: balanced table gives 0; perfect 2x2 association gives chi2=n, V=1") {
    val ind = Seq(("a", "u"), ("a", "v"), ("b", "u"), ("b", "v"))
      .flatMap(Seq.fill(5)(_)).toDF("xc", "yc")
    val r0 = Inference.chi2(ind, "xc", "yc").collect().head
    assert(r0.getAs[Double]("chi2_stat") === 0.0)
    assert(r0.getAs[Double]("cramers_v") === 0.0)
    assert(r0.getAs[Long]("dof") === 1L)
    // perfect association: only (a,u) and (b,v) observed — the two
    // ABSENT cells contribute E each, so chi2 = n exactly (textbook
    // 2x2 identity) and V = 1; an observed-cells-only sum would say 5
    val dep = Seq.fill(5)(("a", "u")) ++ Seq.fill(5)(("b", "v"))
    val r1 = Inference.chi2(dep.toDF("xc", "yc"), "xc", "yc").collect().head
    assert(r1.getAs[Long]("n") === 10L)
    assert(r1.getAs[Double]("chi2_stat") === 10.0)
    assert(r1.getAs[Double]("cramers_v") === 1.0)
  }

  test("autocorr: alternating series has exact negative lag-1, positive lag-2 ACF") {
    // y = 1,2,1,2,1,2: N=6 S=9 SS=15.
    // k=1: c=5 Σab=10 Σa=8 Σb=7 → num = 36·10−6·9·15+5·81 = −45,
    //      den = 6·(6·15−81) = 54 → r1 = −45/54 = −0.833333
    // k=2: c=4 Σab=10 Σa=6 Σb=6 → num = 360−648+324 = 36 → r2 = 36/54
    val s = Seq(1L, 2L, 1L, 2L, 1L, 2L).zipWithIndex
      .map { case (y, i) => (i.toLong, y) }.toDF("ord", "y")
    val out = Inference.autocorr(s, col("ord"), col("y"), maxLag = 2)
      .collect().map(r => r.getAs[Int]("lag") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Double]("acf"))).toMap
    assert(out(1) === ((5L, -0.833333)))
    assert(out(2) === ((4L, 0.666667)))
  }

  test("mann-whitney: separated arms give U=n0*n1, AUC=1; all-tied gives AUC=.5, null z") {
    // arm0 = {1,2,3}, arm1 = {4,5,6}: no ties, R1 = 15, U1 = 9 = n0·n1
    val sep = Seq((0, 1L), (0, 2L), (0, 3L), (1, 4L), (1, 5L), (1, 6L))
      .toDF("arm", "v")
    val r = Inference.mannWhitney(sep, col("arm"), col("v")).collect().head
    assert(r.getAs[Double]("u1") === 9.0)
    assert(r.getAs[Double]("auc") === 1.0)
    val expZ = 4.5 / math.sqrt(9.0 * 7 / 12) // no ties: var = n0·n1·(N+1)/12
    assert(math.abs(r.getAs[Double]("z") - expZ) < 1e-6)
    // every value identical: midrank machinery gives U1 = n0·n1/2,
    // AUC exactly .5, and the tie-corrected variance collapses to 0
    val tied = Seq((0, 7L), (0, 7L), (1, 7L), (1, 7L)).toDF("arm", "v")
    val rt = Inference.mannWhitney(tied, col("arm"), col("v")).collect().head
    assert(rt.getAs[Double]("u1") === 2.0)
    assert(rt.getAs[Double]("auc") === 0.5)
    assert(rt.isNullAt(rt.fieldIndex("z")))
  }

  test("cusum changepoint: level shift is located exactly with integer stat") {
    // y = 1,1,1,5,5,5: N·S_t − t·S peaks (in |·|) at t=3: 6·3−3·18 = −36
    val s = (1L to 6L).map(t => (t, if (t <= 3) 1L else 5L)).toDF("ord", "y")
    val r = Forecast.cusumChangepoint(s, col("ord"), col("y")).collect().head
    assert(r.getAs[Long]("ord") === 3L)
    assert(r.getAs[Long]("t") === 3L)
    assert(r.getAs[Long]("cusum_n") === -36L)
    assert(r.getAs[Double]("mean_dev") === -6.0)
    // constant series: every stat is 0; the tie-break picks the first ord
    val flat = (1L to 4L).map((_, 7L)).toDF("ord", "y")
    val rf = Forecast.cusumChangepoint(flat, col("ord"), col("y")).collect().head
    assert(rf.getAs[Long]("cusum_n") === 0L)
    assert(rf.getAs[Long]("ord") === 1L)
  }

  test("source overlap: shared fingerprints counted once; jaccard exact") {
    // s1 = {A,B,C}, s2 = {B,C,D}, s3 = {E}: s1∩s2 = 2, J = 2/4
    val df = Seq(("s1", "A"), ("s1", "B"), ("s1", "C"), ("s2", "B"),
        ("s2", "C"), ("s2", "D"), ("s2", "D"), ("s3", "E"))
      .toDF("source", "text")
    val out = Dedup.sourceOverlap(df, fp = col("text")).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[String]("source1") === "s1" && r.getAs[String]("source2") === "s2")
    assert(r.getAs[Long]("n_shared") === 2L && r.getAs[Long]("n1") === 3L &&
      r.getAs[Long]("n2") === 3L)
    assert(r.getAs[Double]("jaccard") === 0.5)
  }

  test("random projection: JL scaling preserves the norm of a plane-aligned vector") {
    import graft.ext.Similarity
    // one plane = e0: projection of x keeps exactly x(0)/√1, so the
    // scaled projected norm of (5,0,...) is 5 — zero distortion
    val planes = Seq(Seq(1.0, 0.0, 0.0, 0.0))
    val df = Seq(Tuple1(Array(5.0f, 0.0f, 0.0f, 0.0f))).toDF("v")
    val p = df.select(Similarity.projectRandom(col("v"), planes).as("proj"))
      .selectExpr("proj[0] AS p0").collect().head.getDouble(0)
    assert(p === 5.0)
  }

  test("inverted index: positions 0-based and sorted; df band drops terms before assembly") {
    import graft.ext.TextStats
    val df = Seq((1L, "a b a"), (2L, "b c"), (3L, "b")).toDF("doc_id", "text")
    val all = TextStats.invertedIndex(df).orderBy("term").collect()
    val byTerm = all.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getSeq[Row](3))).toMap
    assert(byTerm("a")._1 === 1L && byTerm("a")._2 === 2L)
    val aPost = byTerm("a")._3.head
    assert(aPost.getLong(0) === 1L && aPost.getLong(1) === 2L)
    assert(aPost.getSeq[Int](2) === Seq(0, 2)) // 0-based, sorted
    assert(byTerm("b")._1 === 3L)
    // stopword cap: b (df=3) assembles no postings row
    val capped = TextStats.invertedIndex(df, maxDf = 2L).collect().map(_.getString(0))
    assert(capped.toSet === Set("a", "c"))
  }

  test("attribution: strictly-earlier touch wins; equal-ts touch is NOT credited") {
    import graft.ext.Affinity
    // user 1: view@1, click@5, purchase@9  -> click
    // user 2: purchase@3 with view@3 (equal ts)  -> direct (strictly earlier only)
    // user 3: purchase@2, view@4 (touch after)   -> direct
    val df = Seq((1L, 1L, "view"), (1L, 5L, "click"), (1L, 9L, "purchase"),
        (2L, 3L, "view"), (2L, 3L, "purchase"), (3L, 2L, "purchase"), (3L, 4L, "view"))
      .toDF("u", "t", "et")
    val out = Affinity.lastTouchAttribution(df, col("u"), col("t"), col("et"),
        isConversion = col("et") === "purchase",
        isTouch = col("et").isin("view", "click"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("click" -> 1L, "direct" -> 2L))
  }

  test("linear attribution: equal ppb split inside window; out-of-window is direct") {
    import graft.ext.Affinity
    // user 1: view@10, click@20, purchase@30 (window 100) -> 1/2 each
    // user 2: view@1, purchase@200 (window 100, touch too old) -> direct
    val df = Seq((1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
        (2L, 1L, "view"), (2L, 200L, "purchase")).toDF("u", "t", "et")
    val out = Affinity.linearAttribution(df, col("u"), col("t"), col("et"),
        isConversion = col("et") === "purchase",
        isTouch = col("et").isin("view", "click"), windowT = 100L)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(out === Map("view" -> (0.5, 1L), "click" -> (0.5, 1L), "direct" -> (1.0, 0L)))
  }

  test("woe/iv: perfectly separating bins get opposite-sign woe; counts exact") {
    import graft.ext.Inference
    // bin 0 all label-1 (3 rows), bin 1 all label-0 (3 rows)
    val df = Seq((0L, true), (0L, true), (0L, true),
        (1L, false), (1L, false), (1L, false)).toDF("bin", "y")
    val rows = Inference.woeIv(df, col("bin"), col("y")).orderBy("bin").collect()
    val woe0 = rows(0).getAs[Double]("woe")
    val woe1 = rows(1).getAs[Double]("woe")
    assert(rows(0).getAs[Long]("g") === 3L && rows(0).getAs[Long]("b") === 0L)
    assert(woe0 > 0 && woe1 < 0)
    // symmetric construction -> symmetric woe, both iv parts positive
    assert(math.abs(woe0 + woe1) < 1e-9)
    assert(rows.forall(_.getAs[Double]("iv_part") > 0))
  }

  test("twap: holding durations weight values; last observation excluded") {
    import graft.ext.TimeFill
    // v=10 holds 1..5 (4 ticks), v=30 holds 5..9 (4): twap = 20
    val df = Seq(("u", 1L, 10L), ("u", 5L, 30L), ("u", 9L, 99L)).toDF("k", "t", "v")
    val r = TimeFill.timeWeightedAvg(df, col("k"), col("t"), col("v")).collect().head
    assert(r.getAs[Long]("n_obs") === 2L)
    assert(r.getAs[Double]("twap") === 20.0)
  }

  test("linkage score: agreement/disagreement weights sum in field-name order") {
    import graft.ext.Dedup
    val pairs = Seq(("x", "x", 1L, 1L), ("x", "y", 1L, 2L)).toDF("a_f", "b_f", "a_g", "b_g")
    val out = Dedup.linkageScore(pairs,
        Map("f" -> (0.9, 0.1), "g" -> (0.8, 0.2)), threshold = 2.0)
      .orderBy(desc("score")).collect()
    val full = math.log(0.9 / 0.1) + math.log(0.8 / 0.2)
    assert(out(0).getAs[Double]("score") ===
      BigDecimal(full).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out(0).getAs[Boolean]("is_link"))
    assert(!out(1).getAs[Boolean]("is_link"))
  }

  test("kaplan-meier: textbook product-limit values; terminal row survives as exact 0") {
    import graft.ext.Inference
    // durations: 1, 2, 2, 4 → S(1)=3/4, S(2)=3/4·1/3=1/4, S(4)=0
    val df = Seq(1L, 2L, 2L, 4L).toDF("dur")
    val rows = Inference.kaplanMeier(df, col("dur")).orderBy("d").collect()
    val s = rows.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(s(1L) === ((4L, 1L, 0.75)))
    assert(s(2L) === ((3L, 2L, 0.25)))
    assert(s(4L) === ((1L, 1L, 0.0)))
  }

  test("table checksum: partitioning-invariant; any cell change flips it") {
    import graft.ext.ScaleOps
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    def sum(df: org.apache.spark.sql.DataFrame) =
      ScaleOps.tableChecksum(df, Seq(col("id"), col("v"))).collect().head
    val r1 = sum(base.repartition(7))
    val r2 = sum(base.repartition(1))
    assert(r1 === r2)
    val changed = sum(Seq((1L, "a"), (2L, "B"), (3L, "c")).toDF("id", "v"))
    assert(changed.getAs[Long]("xor_checksum") !== r1.getAs[Long]("xor_checksum"))
    assert(changed.getAs[Long]("n_rows") === 3L)
  }

  test("table checksum: length-prefixed render separates NULL-skip and embedded-separator collisions") {
    import graft.ext.ScaleOps
    def digest(rows: Seq[(String, Option[String])]) =
      ScaleOps.tableChecksum(rows.toDF("a", "b"), Seq(col("a"), col("b")))
        .collect().head.getAs[Long]("xor_checksum")
    // ('a|b', NULL) vs ('a', 'b'): concat_ws would render both 'a|b'
    assert(digest(Seq(("a|b", None))) !== digest(Seq(("a", Some("b")))))
    // ('a|', 'b') vs ('a', '|b'): embedded separator vs real separator
    assert(digest(Seq(("a|", Some("b")))) !== digest(Seq(("a", Some("|b")))))
  }

  test("seasonal naive: lag-4 forecast and exact MAE") {
    // one series, 8 periods with y = period; forecast(p) = p-4 → abs_err 4
    val df = (1L to 8L).map(p => ("s", p, p)).toDF("k", "period", "y")
    val rows = Forecast.seasonalNaive(df, Seq("k"), col("period"), col("y"), 4)
      .orderBy("period").collect()
    assert(rows.length === 4)
    assert(rows.forall(_.getAs[Long]("abs_err") === 4L))
    val bt = Forecast.seasonalNaiveBacktest(df, Seq("k"), col("period"), col("y"), 4)
      .collect().head
    assert(bt.getAs[Long]("n_eval") === 4L && bt.getAs[Double]("mae") === 4.0)
  }

  test("theil-sen: exact line recovered; one wild outlier cannot move the slope") {
    // y = 3x on 5 points → every pairwise slope is 3
    val clean = (1L to 5L).map(x => ("s", x, 3 * x)).toDF("k", "x", "y")
    val r0 = Forecast.theilSen(clean, Seq("k"), col("x"), col("y")).collect().head
    assert(r0.getAs[Long]("n_pairs") === 10L && r0.getAs[Double]("ts_slope") === 3.0)
    // corrupt one point to y=1000: 4 of 15 pair slopes go wild, but the
    // median pair slope is still 3 (breakdown resistance — OLS would not be)
    val dirty = ((1L to 5L).map(x => ("s", x, 3 * x)) :+ (("s", 6L, 1000L)))
      .toDF("k", "x", "y")
    val r1 = Forecast.theilSen(dirty, Seq("k"), col("x"), col("y")).collect().head
    assert(r1.getAs[Long]("n_pairs") === 15L && r1.getAs[Double]("ts_slope") === 3.0)
  }

  test("mann-kendall: monotone series saturate S; ties zero out; tau truncates toward zero") {
    import spark.implicits._
    // strictly increasing (5 pts): S = 10 = n_pairs -> tau 1.0 exactly
    val up = (1L to 5L).map(x => ("u", x, x * 7)).toDF("k", "x", "y")
    val r = Forecast.mannKendall(up, Seq("k"), col("x"), col("y")).collect().head
    assert(r.getAs[Long]("s_stat") === 10L &&
      r.getAs[Long]("tau_ppb") === 1000000000L &&
      r.getAs[String]("trend") === "increasing")
    // down-trend with one tie pair: y = (9,9,7,5): pairs (1,2) tie ->
    // 0, rest negative => S = -5 of 6 pairs; -5e9 div 6 truncates
    val down = Seq(("d", 1L, 9L), ("d", 2L, 9L), ("d", 3L, 7L), ("d", 4L, 5L))
      .toDF("k", "x", "y")
    val r2 = Forecast.mannKendall(down, Seq("k"), col("x"), col("y")).collect().head
    assert(r2.getAs[Long]("n_points") === 4L && r2.getAs[Long]("s_stat") === -5L)
    assert(r2.getAs[Long]("tau_ppb") === -5000000000L / 6L) // -833333333
    assert(r2.getAs[String]("trend") === "decreasing")
  }

  test("benford: grid complete, counts exact, conformant digits get ~0 terms") {
    // 30/18/12/10/8/7/6/5/4 first-digit counts over n=100 ≈ Benford
    val counts = Seq(30, 18, 12, 10, 8, 7, 6, 5, 4)
    val vals = counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)((i + 1) * 100L + 7L) // e.g. digit 3 -> value 307
    } ++ Seq(-5L, 0L) // non-positive values must be ignored
    val out = Inference.benford(vals.toDF("v"), col("v")).collect()
    assert(out.length === 9)
    assert(out.map(_.getAs[Int]("digit")).toSeq === (1 to 9))
    assert(out.map(_.getAs[Long]("n_obs")).toSeq === counts.map(_.toLong))
    assert(out.forall(_.getAs[Long]("n") === 100L))
    // digit 1: E = 30.103, O = 30 → chi2 term (O-E)²/E ≈ 0.00035
    val d1 = out.head
    assert(d1.getAs[Double]("expected_p") === math.log10(2.0))
    assert(math.abs(d1.getAs[Long]("chi2_nano")) < 1000000L) // < 0.001
  }

  test("rolling corr: coupled series pins +1, inverted pins -1, flat is null") {
    // b = 2a + 5 exactly → corr +1 once the frame has 2+ distinct points
    val up = (1L to 6L).map(t => (t, t, 2 * t + 5)).toDF("d", "a", "b")
    val r = Inference.rollingCorr(up, col("d"), col("a"), col("b"), 3).collect()
    assert(r.head.getAs[Long]("n_win") === 1L && r.head.isNullAt(2)) // 1-pt frame
    assert(r.last.getAs[Double]("corr") === 1.0)
    val down = (1L to 6L).map(t => (t, t, 100 - 4 * t)).toDF("d", "a", "b")
    val rd = Inference.rollingCorr(down, col("d"), col("a"), col("b"), 3).collect()
    assert(rd.last.getAs[Double]("corr") === -1.0)
    // constant b → zero variance → null, never a division blowup
    val flat = (1L to 4L).map(t => (t, t, 9L)).toDF("d", "a", "b")
    val rf = Inference.rollingCorr(flat, col("d"), col("a"), col("b"), 3).collect()
    assert(rf.forall(_.isNullAt(2)))
  }

  test("label centroids: identical direction gives cos 1, orthogonal gives 0") {
    val vecs = Seq(
      (0, Seq(1.0f, 0.0f)), (0, Seq(2.0f, 0.0f)),   // label 0 along e1
      (1, Seq(0.0f, 1.0f)), (1, Seq(0.0f, 3.0f)),   // label 1 along e2
      (2, Seq(4.0f, 0.0f))                          // label 2 along e1 too
    ).toDF("label", "embedding")
    val out = Similarity.labelCentroidSims(vecs)
      .orderBy("label_a", "label_b").collect()
    assert(out.length === 3) // (0,1) (0,2) (1,2)
    val m = out.map(r => ((r.getInt(0), r.getInt(1)), r)).toMap
    assert(m((0, 1)).getAs[Double]("centroid_cos") === 0.0)
    assert(m((0, 2)).getAs[Double]("centroid_cos") === 1.0)
    assert(m((1, 2)).getAs[Double]("centroid_cos") === 0.0)
    assert(m((0, 2)).getAs[Long]("n_a") === 2L &&
      m((0, 2)).getAs[Long]("n_b") === 1L)
  }

  test("jackknife SE: textbook leave-one-out value from the integer form") {
    // g: x = 1..5 → S=15, n=5; pseudo-means (S-x)/4 = 3.5,3.25,3,2.75,2.5
    // → var_jack = (4/5)·0.625 = 0.5, SE = √0.5 ≈ 0.7071; mean 3.0.
    // integer form: Q = Σ(15−5x)² = 100+25+0+25+100 = 250,
    // SE = √(250·4/5)/(5·4) = √200/20 — same number, exact path
    val df = (1L to 5L).map(x => ("g", x)).toDF("k", "x")
    val r = Inference.jackknifeSE(df, Seq("k"), col("x")).collect().head
    assert(r.getAs[Long]("n_periods") === 5L)
    assert(r.getAs[Double]("mean_x") === 3.0)
    assert(r.getAs[Double]("jack_se") ===
      math.BigDecimal(math.sqrt(200.0) / 20.0)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // constant series → zero SE
    val c = (1L to 4L).map(_ => ("g", 7L)).toDF("k", "x")
    assert(Inference.jackknifeSE(c, Seq("k"), col("x"))
      .collect().head.getAs[Double]("jack_se") === 0.0)
  }

  test("privacy: pseudonym is stable per id, distinct across ids, id-free") {
    val df = Seq(101L, 101L, 202L).toDF("uid")
      .select(Privacy.pseudonymize(col("uid"), "pep").as("tok"))
    val toks = df.as[String].collect()
    assert(toks(0) === toks(1))
    assert(toks(0) !== toks(2))
    assert(toks.forall(t => t.length === 32 && !t.contains("101")))
    // a different pepper severs the linkage (rotation = crypto-shred)
    val rot = Seq(101L).toDF("uid")
      .select(Privacy.pseudonymize(col("uid"), "pep2").as("tok")).as[String].head()
    assert(rot !== toks(0), "pepper rotation must change tokens")
  }

  test("privacy: k-anonymity flags exactly the groups below k") {
    val df = Seq(("a", "x"), ("a", "x"), ("a", "x"), ("b", "x"), ("b", "y"))
      .toDF("qi1", "qi2")
    val out = Privacy.kAnonymityGroups(df, Seq(col("qi1"), col("qi2")), k = 3)
      .orderBy("qi1", "qi2").collect()
    assert(out.map(r => (r.getString(0), r.getString(1), r.getLong(2),
      r.getBoolean(3))).toSeq ===
      Seq(("a", "x", 3L, false), ("b", "x", 1L, true), ("b", "y", 1L, true)))
  }

  test("privacy: l-diversity flags the k-anonymous group with a uniform sensitive value") {
    // group "a": 3 members but ONE sensitive value -> violates l=2
    // group "b": 2 members, two sensitive values -> ok
    val df = Seq(("a", "hiv"), ("a", "hiv"), ("a", "hiv"),
        ("b", "flu"), ("b", "ok"))
      .toDF("qi", "diag")
    val out = Privacy.lDiversityGroups(df, Seq(col("qi")), col("diag"), l = 2)
      .orderBy("qi").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getBoolean(3))).toSeq ===
      Seq(("a", 3L, 1L, true), ("b", 2L, 2L, false)))
  }

  test("lift table: exact counts, cumulative precision, and lift by hand") {
    // 8 rows, scores descending 0.8..0.1; positives at the top 3 ranks
    // and one at rank 6. buckets=4 -> 2 rows each.
    val df = Seq((1L, 0.8, 1), (2L, 0.7, 1), (3L, 0.6, 1), (4L, 0.5, 0),
        (5L, 0.4, 0), (6L, 0.3, 1), (7L, 0.2, 0), (8L, 0.1, 0))
      .toDF("id", "r", "pos")
    val out = Inference.liftTable(df, col("id"), col("r"), col("pos"), buckets = 4)
      .collect()
    // bucket1: n=2 pos=2 cum 2/2 prec 1.0 lift (2*8)/(2*4)=2.0
    assert(out(0).getAs[Long]("n_pos") === 2L &&
      out(0).getAs[Double]("cum_precision") === 1.0 &&
      out(0).getAs[Double]("lift") === 2.0)
    // bucket2: cum 4 rows, 3 pos -> prec .75, lift (3*8)/(4*4)=1.5
    assert(out(1).getAs[Long]("cum_pos") === 3L &&
      out(1).getAs[Double]("lift") === 1.5)
    // last bucket: base rate -> lift exactly 1
    assert(out(3).getAs[Long]("cum_pos") === 4L &&
      out(3).getAs[Double]("lift") === 1.0)
  }

  test("lift table: zero positives leaves lift null, counts intact") {
    val df = Seq((1L, 0.9, 0), (2L, 0.1, 0)).toDF("id", "r", "pos")
    val out = Inference.liftTable(df, col("id"), col("r"), col("pos"), buckets = 2)
      .collect()
    assert(out.forall(_.isNullAt(out.head.fieldIndex("lift"))))
    assert(out.map(_.getAs[Long]("n")).sum === 2L)
  }

  test("pareto frontier: dominated points drop, x-ties collapse to best y, rep is min id") {
    import graft.ext.ScaleOps
    // (10,1) frontier; (8,5) frontier; (8,3) dominated by same-x (8,5);
    // (5,5) dominated by (8,5); (3,9) frontier; ids 30/31 tie on (8,5) -> rep 30
    val df = Seq((10L, 10L, 1L), (30L, 8L, 5L), (31L, 8L, 5L), (40L, 8L, 3L),
        (50L, 5L, 5L), (60L, 3L, 9L))
      .toDF("id", "x", "y")
    val out = ScaleOps.paretoFrontier(df, "id", "x", "y")
      .orderBy(desc("x")).collect()
    assert(out.map(r => (r.getAs[Long]("rep_id"), r.getAs[Long]("x"),
      r.getAs[Long]("y"))).toSeq ===
      Seq((10L, 10L, 1L), (30L, 8L, 5L), (60L, 3L, 9L)))
  }

  test("tfidf cosine pairs: near-identical docs score ~1, df band prunes corpus-wide terms") {
    import graft.ext.TextStats
    // "common" appears in ALL 6 docs -> df=6 > 0.5*6=3 -> pruned, so
    // docs sharing ONLY "common" never pair. Docs 1/2 share their full
    // banded vocabulary with equal tf -> cosine exactly 1.
    val docs = Seq(
      (1L, "common alpha beta"), (2L, "common alpha beta"),
      (3L, "common alpha gamma"), (4L, "common delta epsilon"),
      (5L, "common zeta eta"), (6L, "common theta iota"))
      .toDF("doc_id", "text")
    val out = TextStats.tfidfCosinePairs(docs, minDf = 2, maxDfFrac = 0.5)
      .orderBy("a", "b").collect()
    // banded vocab: alpha (df=3 <= 3); beta (df=2); gamma..iota df=1 (pruned)
    assert(out.map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSeq ===
      Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    val c12 = out.find(r => r.getAs[Long]("a") == 1L && r.getAs[Long]("b") == 2L).get
    assert(math.abs(c12.getAs[Double]("cosine") - 1.0) < 1e-12)
    assert(c12.getAs[Long]("n_shared") === 2L)
    // 1-3 share only alpha of {alpha,beta} x {alpha,gamma}: cos = w_a^2/(|w|*|w|) < 1
    val c13 = out.find(r => r.getAs[Long]("a") == 1L && r.getAs[Long]("b") == 3L).get
    assert(c13.getAs[Double]("cosine") < 1.0 && c13.getAs[Double]("cosine") > 0.0)
    assert(c13.getAs[Long]("n_shared") === 1L)
  }

  test("reciprocal best match: only mutually-best pairs survive; the hub loses its satellites") {
    import graft.ext.Similarity
    // one plane, all vectors in the +x half-space -> one bucket.
    // a~b are each other's best; c's best is b, but b's best is a ->
    // c is excluded (exactly the hub failure mode the filter targets).
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)), (3L, Array(0.1f, 0.9f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.reciprocalBestMatch(vecs, Seq(Seq(1.0, 0.0)))
      .collect()
    assert(out.map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"))).toSeq ===
      Seq((1L, 2L)))
    assert(out.head.getAs[Double]("cosine") > 0.99)
  }

  test("poisson bootstrap: deterministic draw, exact counts, ordered CI inside the data range") {
    val df = (1L to 40L).map(v => ("g", v, v * 100)).toDF("k", "id", "cents")
    def run() = Inference.poissonBootstrapCI(df, Seq("k"),
      rowKey = col("id"), x = col("cents"), reps = 10).collect().head
    val r1 = run(); val r2 = run()
    assert(r1 === r2, "hash-drawn weights must be a pure function of the data")
    assert(r1.getAs[Long]("n_rows") === 40L)
    assert(r1.getAs[Double]("point_mean") === 2050.0) // mean of 100..4000
    val (lo, hi) = (r1.getAs[Double]("ci_lo"), r1.getAs[Double]("ci_hi"))
    assert(lo < hi && lo > 100.0 && hi < 4000.0)
  }

  test("poisson bootstrap: weight cutpoints reproduce Poisson(1) frequencies roughly") {
    // 4000 (row, rep) draws: P(w=0)=e^-1~.368 -> expect ~1471; a gross
    // deviation means the inverse-CDF ladder is wrong
    val df = (1L to 400L).map(v => ("g", v, 1L)).toDF("k", "id", "x")
    val out = Inference.poissonBootstrapCI(df, Seq("k"),
      rowKey = col("id"), x = col("x"), reps = 10).collect().head
    // indirect: with unit x the replicate mean is exactly 1 whenever
    // sw > 0, so point/lo/hi are all 1.0 — pins sum/count plumbing
    assert(out.getAs[Double]("ci_lo") === 1.0 && out.getAs[Double]("ci_hi") === 1.0)
  }

  test("cohen kappa: perfect agreement gives 1, independence gives 0, textbook 2x2 matches") {
    val perfect = Seq(("a", "a"), ("b", "b"), ("a", "a")).toDF("xc", "yc")
    assert(Inference.cohenKappa(perfect, "xc", "yc")
      .collect().head.getAs[Double]("kappa") === 1.0)
    val indep = Seq(("a", "a"), ("a", "b"), ("b", "a"), ("b", "b")).toDF("xc", "yc")
    assert(Inference.cohenKappa(indep, "xc", "yc")
      .collect().head.getAs[Double]("kappa") === 0.0)
    // hand case: n=100, agree=70, both marginals (60,40):
    // pe_num = 60*60+40*40 = 5200 -> kappa = (7000-5200)/(10000-5200) = 0.375
    val conf = Seq.fill(45)(("y", "y")) ++ Seq.fill(25)(("n", "n")) ++
      Seq.fill(15)(("y", "n")) ++ Seq.fill(15)(("n", "y"))
    val r = Inference.cohenKappa(conf.toDF("xc", "yc"), "xc", "yc").collect().head
    assert(r.getAs[Long]("n_tot") === 100L && r.getAs[Long]("n_agree") === 70L)
    assert(r.getAs[Double]("p_observed") === 0.7)
    assert(r.getAs[Double]("kappa") === 0.375)
  }

  test("kappa grids self-unpersist: no cache entry survives the operator call") {
    // round-14 verdict item 3: the persisted confusion/cell grids must
    // not outlive the operator — a library consumer composing many
    // operators in one session must not need a clearCache convention.
    // The unpersist rides a QueryExecutionListener (async listener
    // bus), so poll the cache manager with a timeout.
    spark.catalog.clearCache()
    val cm = spark.sharedState.cacheManager
    val two = Seq(("a", "a"), ("a", "b"), ("b", "a"), ("b", "b")).toDF("xc", "yc")
    assert(Inference.cohenKappa(two, "xc", "yc")
      .collect().head.getAs[Double]("kappa") === 0.0)
    val ratings = Seq((1L, "a"), (1L, "a"), (1L, "a"), (2L, "b"), (2L, "b"),
      (2L, "b")).toDF("i", "cat")
    assert(Inference.fleissKappa(ratings, col("i"), col("cat"), 3)
      .collect().head.getAs[Double]("kappa") === 1.0)
    val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
    while (!cm.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
    assert(cm.isEmpty,
      "kappa grid persist leaked: cache manager non-empty 15 s after both results materialized")
  }

  test("peakConcurrency: sweep line counts inclusive overlap; day split; exact peaks") {
    // day 1: s1 [10:00,10:30], s2 [10:15,10:45], s3 [10:45,11:00] —
    // s2/s3 touch at 10:45 (inclusive -> concurrent): peak 2, 3 starts;
    // day 2: one session: peak 1
    val sessions = Seq(
      ("2024-01-01 10:00:00", "2024-01-01 10:30:00"),
      ("2024-01-01 10:15:00", "2024-01-01 10:45:00"),
      ("2024-01-01 10:45:00", "2024-01-01 11:00:00"),
      ("2024-01-02 09:00:00", "2024-01-02 09:10:00"))
      .toDF("st", "en")
      .select(col("st").cast("timestamp").as("session_start"),
        col("en").cast("timestamp").as("session_end"))
    val out = Sessionize.peakConcurrency(sessions).orderBy("day").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq(("2024-01-01", 3L, 2L), ("2024-01-02", 1L, 1L)))
  }

  test("peakConcurrencyChunked: equals the one-pass sweep on real sessions and tiny chunks") {
    // real sessionized data at sf0.001, chunked at 1 day — maximal
    // chunk-boundary crossings — and at 7 days
    val sessions = Sessionize.sessionizeBatch(
      graft.ext.EventsStream.readEvents(spark, s"${SparkSpec.sf0001}/events.parquet"),
      gapSeconds = 300, keyCol = "user_id")
    val one = Sessionize.peakConcurrency(sessions)
    for (cd <- Seq(1, 7)) {
      val chunked = Sessionize.peakConcurrencyChunked(sessions, chunkDays = cd)
      assert(one.exceptAll(chunked).isEmpty && chunked.exceptAll(one).isEmpty,
        s"chunked sweep diverged at chunkDays=$cd")
    }
  }

  test("overlapPairCounts: sweep equals hand-counted pairs; inclusive touch; zero-pair key") {
    // key A: [1,5] [3,8] [5,6] [10,12] -> pairs (1,2) (1,3 touch at 5)
    // (2,3); interval 4 isolated => 3 pairs. key B: one interval => 0.
    val iv = Seq(("A", 1L, 1L, 5L), ("A", 2L, 3L, 8L), ("A", 3L, 5L, 6L),
      ("A", 4L, 10L, 12L), ("B", 9L, 2L, 4L))
      .toDF("k", "rid", "s", "e")
    val out = Sessionize.overlapPairCounts(iv, "k", "s", "e", "rid")
      .orderBy("k").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out === Map("A" -> (4L, 3L), "B" -> (1L, 0L)))
    // cross-check the combinatorial identity against brute force
    val rows = Seq((1L, 5L), (3L, 8L), (5L, 6L), (10L, 12L), (2L, 4L), (4L, 9L))
    val brute = rows.combinations(2).count {
      case Seq((s1, e1), (s2, e2)) => s1 <= e2 && s2 <= e1 }
    val one = rows.zipWithIndex.map { case ((s, e), i) => ("X", i.toLong, s, e) }
      .toDF("k", "rid", "s", "e")
    assert(Sessionize.overlapPairCounts(one, "k", "s", "e", "rid")
      .collect().head.getLong(2) === brute.toLong)
  }

  test("spearman: perfect monotone gives 1, reversal -1, ties take midranks") {
    val mono = Seq(("g", 1L, 10L), ("g", 2L, 40L), ("g", 3L, 90L)).toDF("k", "x", "y")
    assert(Inference.spearman(mono, Seq("k"), col("x"), col("y"))
      .collect().head.getAs[Double]("rho") === 1.0)
    val rev = Seq(("g", 1L, 9L), ("g", 2L, 5L), ("g", 3L, 1L)).toDF("k", "x", "y")
    assert(Inference.spearman(rev, Seq("k"), col("x"), col("y"))
      .collect().head.getAs[Double]("rho") === -1.0)
    // hand case with a tie: x = (1,2,2,3) -> midranks (1, 2.5, 2.5, 4);
    // y = (10,20,30,40) -> ranks (1,2,3,4); scipy spearmanr = 0.9486833
    val tied = Seq(("g", 1L, 10L), ("g", 2L, 20L), ("g", 2L, 30L), ("g", 3L, 40L))
      .toDF("k", "x", "y")
    val rho = Inference.spearman(tied, Seq("k"), col("x"), col("y"))
      .collect().head.getAs[Double]("rho")
    assert(rho === 0.948683)
  }

  test("spearman: grid form equals the row-window form on random tied data") {
    // the production implementation ranks via the distinct-value grid
    // (2·midrank = 2·cum(<v) + c + 1); this pins it to the textbook
    // row-window form (rank() + peers-inclusive count) on data with
    // heavy ties and several groups
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(400)(i =>
      (s"g${i % 3}", rnd.nextInt(8).toLong, rnd.nextInt(12).toLong))
    val df = rows.toDF("k", "x", "y")
    val wg = Window.partitionBy(col("k"))
    def doubledRank(v: String) =
      rank().over(wg.orderBy(v)) +
        count(lit(1)).over(wg.orderBy(v)
          .rangeBetween(Window.unboundedPreceding, Window.currentRow))
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val ranked = df.select(col("k"), doubledRank("x").as("rx"), doubledRank("y").as("ry"))
    val sums = ranked.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("rx").as("sx"), sum("ry").as("sy"),
        sum(dec(col("rx")) * dec(col("ry"))).as("sxy"),
        sum(dec(col("rx")) * dec(col("rx"))).as("sxx"),
        sum(dec(col("ry")) * dec(col("ry"))).as("syy"))
    val n = dec(col("n"))
    val num = (n * col("sxy") - dec(col("sx")) * dec(col("sy"))).cast("double")
    val da = (n * col("sxx") - dec(col("sx")) * dec(col("sx"))).cast("double")
    val db = (n * col("syy") - dec(col("sy")) * dec(col("sy"))).cast("double")
    val windowForm = sums.select(col("k"), col("n"),
        when(da > 0 && db > 0, round(num / (sqrt(da) * sqrt(db)), 6)).as("rho"))
      .orderBy("k").collect().map(_.toString).toSeq
    val gridForm = Inference.spearman(df, Seq("k"), col("x"), col("y"))
      .orderBy("k").collect().map(_.toString).toSeq
    assert(gridForm === windowForm)
  }

  test("corr matrix: exact pair grid — identity 1, anti-identity -1, constant null") {
    val df = Seq((1L, 2L, -1L, 5L), (2L, 4L, -2L, 5L), (3L, 6L, -3L, 5L))
      .toDF("a", "b", "c", "d")
    val out = Inference.corrMatrix(df, Seq(
        "a" -> col("a"), "b" -> col("b"), "c" -> col("c"), "d" -> col("d")))
      .orderBy("col_a", "col_b").collect()
    assert(out.length === 6)
    val m = out.map(r => (r.getString(0), r.getString(1)) -> r.get(3)).toMap
    assert(m(("a", "b")) === 1.0 && m(("a", "c")) === -1.0 && m(("b", "c")) === -1.0)
    // zero-variance column d: every cell involving it is null, not NaN
    assert(m(("a", "d")) === null && m(("b", "d")) === null && m(("c", "d")) === null)
    assert(out.forall(_.getLong(2) === 3L))
  }

  test("shardOf: deterministic, in range, balanced-ish, and matches the closed form") {
    val keys = (0L until 1000L)
    val expected = keys.map(k => ((k * 2654435761L % 4294967296L) * 8) >> 32)
    val df = keys.toDF("k").withColumn("s", graft.ext.ScaleOps.shardOf(col("k"), 8))
    val got = df.orderBy("k").collect().map(_.getAs[Long]("s"))
    assert(got.toSeq === expected)
    assert(got.forall(s => s >= 0 && s < 8))
    // multiplicative high-bits should spread 1000 sequential keys well:
    // every shard populated, none holding more than 2x the fair share
    val byShard = got.groupBy(identity).view.mapValues(_.size)
    assert(byShard.size === 8 && byShard.values.forall(n => n > 0 && n < 250))
    intercept[IllegalArgumentException](graft.ext.ScaleOps.shardOf(col("k"), 1))
  }

  test("target encoding: LOO mean excludes own row; singleton category is null") {
    val df = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L), (4L, "b", 7L))
      .toDF("id", "cat", "t")
    val out = Inference.targetEncodeLOO(df, "cat", col("id"), col("t"))
      .orderBy("id").collect()
    // cat a: S=60, n=3 -> LOO for t=10 is (60-10)/2 = 25
    assert(out(0).getAs[Double]("loo_mean") === 25.0)
    assert(out(1).getAs[Double]("loo_mean") === 20.0)
    assert(out(2).getAs[Double]("loo_mean") === 15.0)
    assert(out(3).get(out(3).fieldIndex("loo_mean")) === null)
    assert(out(0).getAs[Long]("n_cat") === 3L)
  }

  test("frequent triples: nested-HOF expansion counts ordered triples by hand") {
    // baskets: 1={a,b,c,d}, 2={a,b,c}, 3={a,b}, 4={a,c,d,d} (dup d once)
    val df = Seq((1, "a"), (1, "b"), (1, "c"), (1, "d"),
        (2, "a"), (2, "b"), (2, "c"), (3, "a"), (3, "b"),
        (4, "a"), (4, "c"), (4, "d"), (4, "d"))
      .toDF("b", "i")
    val out = Affinity.frequentTriples(df, col("b"), col("i"),
        minItemCount = 1, minTripleCount = 1)
      .orderBy("item1", "item2", "item3").collect()
    // (a,b,c): baskets 1,2 -> 2; (a,b,d)/(b,c,d): basket 1; (a,c,d):
    // baskets 1,4 -> 2 (the duplicate d in basket 4 counts once)
    assert(out.map(r => (r.getString(0), r.getString(1), r.getString(2),
      r.getLong(3))).toSeq ===
      Seq(("a", "b", "c", 2L), ("a", "b", "d", 1L), ("a", "c", "d", 2L),
        ("b", "c", "d", 1L)))
    // support over 4 baskets
    assert(out.head.getDouble(4) === 0.5)
    // the item prune cascades into triples: minItemCount=3 keeps only
    // {a: 4, b: 3, c: 3}, so the abc triple survives alone
    val pruned = Affinity.frequentTriples(df, col("b"), col("i"),
        minItemCount = 3, minTripleCount = 1).collect()
    assert(pruned.map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSeq === Seq(("a", "b", "c")))
  }

  test("bfsHops: min distance wins on the shortcut; hop bound truncates; seeds are 0") {
    // path 1-2-3-4-5 plus shortcut 1-3: node 3 is hop 1, not 2
    val edges = Graph.symmetrize(
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 3L)).toDF("id1", "id2"))
    val seeds = Seq(1L).toDF("id")
    val out = Graph.bfsHops(edges, seeds, maxHops = 2)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    // hop 2 reaches 4 (via 3); 5 is beyond the bound and absent
    assert(out === Seq((1L, 0), (2L, 1), (3L, 1), (4L, 2)))
    // maxHops = 0 returns exactly the seed layer
    assert(Graph.bfsHops(edges, seeds, 0).collect().toSeq === Seq(Row(1L, 0)))
  }

  test("kCorePeel: pendant drops in one round; chain cascades to empty") {
    // triangle {1,2,3} + pendant 4: k=2 drops 4, triangle survives at deg 2
    val tri = Graph.symmetrize(
      Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L)).toDF("id1", "id2"))
    val out = Graph.kCorePeel(tri, k = 2, rounds = 1)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out === Seq((1L, 2L), (2L, 2L), (3L, 2L)))
    // chain 1-2-3-4-5 under k=2: endpoints peel first, cascade empties
    // the graph in 2 rounds (1,5 then 2,4 — leaving 3 edgeless)
    val chain = Graph.symmetrize(
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("id1", "id2"))
    assert(Graph.kCorePeel(chain, k = 2, rounds = 2).count() === 0L)
  }

  test("item cosine top-k: Ochiai values by hand; both directions ranked; k cuts") {
    // baskets: {x,y} ×2, {x,z} ×1, {x} ×1 -> n_x=4, n_y=2, n_z=1;
    // cos(x,y) = 2/√8, cos(x,z) = 1/√4
    val df = Seq((1, "x"), (1, "y"), (2, "x"), (2, "y"), (3, "x"), (3, "z"),
        (4, "x")).toDF("b", "i")
    val out = Affinity.itemCosineTopK(df, col("b"), col("i"),
        minItemCount = 1, minPairCount = 1, k = 2)
      .orderBy("item1", "rank").collect()
    val m = out.map(r => (r.getString(0), r.getInt(1)) ->
      (r.getString(2), r.getDouble(4))).toMap
    assert(m(("x", 1)) === (("y", 0.707107))) // 2/√8 rounded
    assert(m(("x", 2)) === (("z", 0.5)))
    assert(m(("y", 1)) === (("x", 0.707107))) // reverse direction present
    assert(m(("z", 1)) === (("x", 0.5)))
    assert(out.length === 4)
  }

  test("fdViolations: key FD passes, violated FD counted, null rhs is a value") {
    val df = Seq((1, "a", "p"), (2, "a", "p"), (3, "b", "q"), (3, "b", "q"),
        (4, null, "q")).toDF("k", "v", "w")
    // k -> v: group 4 has only null v (counts as 1 value) -> no violation
    val kv = graft.ext.ScaleOps.fdViolations(df, "k", "v").collect().head
    assert(kv.getString(0) === "k->v" && kv.getLong(1) === 4L &&
      kv.getLong(2) === 0L && kv.getLong(4) === 0L)
    // v -> w: 'a'->{p}, 'b'->{q}; null determinants excluded -> holds
    assert(graft.ext.ScaleOps.fdViolations(df, "v", "w")
      .collect().head.getLong(2) === 0L)
    // w -> v: 'p'->{a}, 'q'->{b, null} = 2 values -> 1 of 2 violating
    val wv = graft.ext.ScaleOps.fdViolations(df, "w", "v").collect().head
    assert(wv.getLong(1) === 2L && wv.getLong(2) === 1L &&
      wv.getLong(3) === 2L && wv.getLong(4) === 5000L)
  }

  test("personalized PageRank: mass concentrates at the seed; unreachable stays 0") {
    // path 1-2-3 plus isolated pair 4-5; seed = {1}
    val g = Graph.symmetrize(
      Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id1", "id2"))
    val out = Graph.personalizedPageRank(g, Seq(1L).toDF("id"), iters = 3)
      .orderBy("id").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // walk mass stays in the seed's component (on an odd iteration of
    // a 3-path most mass sits on the middle node); the 2-hop node
    // always trails the 1-hop one
    assert(out(2L) > out(1L) && out(1L) > out(3L) && out(3L) > 0.0)
    // the disconnected component receives exactly zero mass
    assert(out(4L) === 0.0 && out(5L) === 0.0)
    // hand-rolled round 1: pr0 = {1: 1.0};
    // pr1(1) = 0.15·1 + 0 = 0.15 (node 2 had no rank yet)... then
    // iterated — instead pin the closed first-round value for node 2:
    // pr1(2) = 0.85 · (1.0 / deg(1)=1) = 0.85
    val one = Graph.personalizedPageRank(g, Seq(1L).toDF("id"), iters = 1)
      .orderBy("id").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(one(1L) === 0.15 && one(2L) === 0.85 && one(3L) === 0.0)
    // seed outside the graph -> require fires
    intercept[IllegalArgumentException](
      Graph.personalizedPageRank(g, Seq(99L).toDF("id"), 1))
  }

  test("globalTransitivity: triangle+pendant by hand; oriented count finds each once") {
    // triangle {1,2,3} + pendant 4 on node 1: T=1; degrees (3,2,2,1)
    // give Σ deg(deg−1)/2 = 3+1+1+0 = 5 wedges; C = 3/5
    val g = Graph.symmetrize(
      Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L)).toDF("id1", "id2"))
    val r = Graph.globalTransitivity(g).collect().head
    assert(r.getLong(0) === 1L && r.getLong(1) === 5L && r.getDouble(2) === 0.6)
    // two triangles sharing edge {1,2}: K4 minus edge {3,4}
    val g2 = Graph.symmetrize(
      Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L)).toDF("id1", "id2"))
    val r2 = Graph.globalTransitivity(g2).collect().head
    // degrees (3,3,2,2): wedges 3+3+1+1 = 8; T = 2; C = 6/8
    assert(r2.getLong(0) === 2L && r2.getLong(1) === 8L && r2.getDouble(2) === 0.75)
  }

  test("labelPropagation: plurality-with-min-tie converges a triangle; deterministic oscillation on a pair") {
    // triangle {1,2,3}: r1 sends every node its neighbors' min id; by
    // r3 all three carry label 1. Disconnected pair {10,11}: sync LPA
    // oscillates (bipartite), but DETERMINISTICALLY — after 3 rounds
    // each holds the other's id. Both follow from the pure update rule.
    val g = Graph.symmetrize(Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L)).toDF("id1", "id2"))
    val before = spark.sparkContext.getPersistentRDDs.size
    val out = Graph.labelPropagation(g, rounds = 3)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out === Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 11L), (11L, 10L)))
    // storage contract: only the returned label snapshot may remain
    // cached — the internal edge-list persist must be released on exit
    // (a long-lived session must not strand one edge cache per call)
    assert(spark.sparkContext.getPersistentRDDs.size <= before + 1,
      "labelPropagation must unpersist its edge cache before returning")
  }

  test("edgeSupport: K4 minus an edge — shared edge support 2, rest 1; pendant 0") {
    // K4 minus {3,4}: triangles {1,2,3} and {1,2,4} share edge {1,2}
    val g2 = Graph.symmetrize(
      Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L)).toDF("id1", "id2"))
    val sup = Graph.edgeSupport(g2).orderBy("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(sup === Map((1L, 2L) -> 2L, (1L, 3L) -> 1L, (1L, 4L) -> 1L,
      (2L, 3L) -> 1L, (2L, 4L) -> 1L))
    // triangle + pendant: the pendant edge closes no triangle → 0
    val g3 = Graph.symmetrize(
      Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("id1", "id2"))
    val sup3 = Graph.edgeSupport(g3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(sup3 === Map((1L, 2L) -> 1L, (1L, 3L) -> 1L, (2L, 3L) -> 1L,
      (3L, 4L) -> 0L))
  }

  test("kTrussPeel: cascade removes the whole K4-minus-edge at k=4; k=3 keeps the triangle") {
    val g2 = Graph.symmetrize(
      Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L)).toDF("id1", "id2"))
    // k=4 (support ≥ 2): round 1 keeps only {1,2}; round 2 recomputes
    // support over the lone survivor → 0 → empty (the CASCADE k-core
    // can't see: every NODE has degree ≥ 2 after round 1)
    assert(Graph.kTrussPeel(g2, k = 4, rounds = 2).count() === 0L)
    // k=3 (support ≥ 1): everything survives round 1, early fixpoint
    val t3 = Graph.kTrussPeel(g2, k = 3, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(t3 === Map((1L, 2L) -> 2L, (1L, 3L) -> 1L, (1L, 4L) -> 1L,
      (2L, 3L) -> 1L, (2L, 4L) -> 1L))
    // pendant pruning: triangle + tail — k=3 drops the tail edge only
    val g3 = Graph.symmetrize(
      Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("id1", "id2"))
    val t4 = Graph.kTrussPeel(g3, k = 3, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(t4 === Map((1L, 2L) -> 1L, (1L, 3L) -> 1L, (2L, 3L) -> 1L))
  }

  test("diameterDoubleBfs: exact on a chain; eccentricities capped at maxHops") {
    // chain 0–12: seed = 0 (min id), ecc 12, farthest = 12, second
    // walk from 12 gives the true diameter 12 (double-BFS is exact on
    // trees)
    val chain = Graph.symmetrize(
      (0L until 12L).map(i => (i, i + 1)).toDF("id1", "id2"))
    val r = Graph.diameterDoubleBfs(chain, maxHops = 20).head
    assert((r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)) ===
      ((0L, 12L, 12, 12)))
    // bound engaged: both walks stop at 5, so the estimate reads 5 —
    // the documented "raise maxHops" signal, never a silent overread
    val b = Graph.diameterDoubleBfs(chain, maxHops = 5).head
    assert((b.getLong(1), b.getInt(2), b.getInt(3)) === ((5L, 5, 5)))
  }

  test("conductance: two triangles + one bridge — cut 1, vol 7 each side") {
    val g = Graph.symmetrize(Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("id1", "id2"))
    val labels = Seq((1L, "A"), (2L, "A"), (3L, "A"),
      (4L, "B"), (5L, "B"), (6L, "B")).toDF("id", "community")
    val out = Graph.conductance(g, labels).orderBy("community").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    // 2m = 14 directed; vol = 7 per side; min(7, 14−7) = 7; cut = 1
    assert(out === Seq(("A", 7L, 1L, 0.142857), ("B", 7L, 1L, 0.142857)))
  }

  test("orientByDegree: hub-star wedge work capped — every out-degree ≤ 1") {
    // star: hub 0 with 200 leaves. A naive (unoriented) wedge
    // enumeration would emit C(200,2) = 19900 wedge rows at the hub;
    // degree orientation directs every edge leaf→hub (leaf degree
    // 1 < 200), so the hub's OUT-degree is 0, every leaf's is 1, and
    // the edge-iterator's per-row intersection arrays are ≤ 1 element.
    // This is the skew bound the triangle kernels rely on at 100 TB.
    val star = Graph.symmetrize(
      (1L to 200L).map(i => (0L, i)).toDF("id1", "id2"))
    val (_, oriented, _) = Graph.orientByDegree(star)
    assert(oriented.count() === 200L) // each undirected edge exactly once
    val outDeg = oriented.groupBy("src").agg(count(lit(1)).as("od"))
    assert(outDeg.agg(max("od")).head().getLong(0) === 1L)
    assert(oriented.filter(col("src") === 0L).count() === 0L) // hub emits none
    // downstream kernels on the star: zero triangles, hub-only wedges
    val r = Graph.globalTransitivity(star).collect().head
    assert(r.getLong(0) === 0L && r.getLong(1) === 19900L
      && r.getDouble(2) === 0.0)
    // and orientation still finds triangles THROUGH a hub: add one
    // leaf-leaf edge -> exactly one triangle (0,1,2), corners credited
    val starTri = Graph.symmetrize(
      ((1L to 200L).map(i => (0L, i)) :+ (1L, 2L)).toDF("id1", "id2"))
    val r2 = Graph.globalTransitivity(starTri).collect().head
    assert(r2.getLong(0) === 1L)
    val lcc = Graph.localClustering(starTri)
      .filter(col("id").isin(0L, 1L, 2L, 3L))
      .orderBy("id").collect()
      .map(x => (x.getLong(0), x.getAs[Long]("n_tri"))).toSeq
    assert(lcc === Seq((0L, 1L), (1L, 1L), (2L, 1L), (3L, 0L)))
  }

  test("commonNeighbors: adjacency excluded, apex cap drops hubs, (cn,id) order") {
    // path 1-2-3: the only 2-hop non-adjacent pair is (1,3) through 2
    val path = Graph.symmetrize(Seq((1L, 2L), (2L, 3L)).toDF("id1", "id2"))
    val r = Graph.commonNeighbors(path, maxApexDegree = 10, minCommon = 1, topK = 10)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(r.toSeq === Seq((1L, 3L, 1L)))
    // triangle: every 2-hop pair is already an edge -> empty
    val tri = Graph.symmetrize(Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("id1", "id2"))
    assert(Graph.commonNeighbors(tri, 10, 1, 10).count() === 0L)
    // star center 0, leaves 1..4: six leaf pairs share only the hub;
    // capping the apex degree below 4 removes the hub -> no candidates
    val star = Graph.symmetrize(
      Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("id1", "id2"))
    assert(Graph.commonNeighbors(star, 10, 1, 10).count() === 6L)
    assert(Graph.commonNeighbors(star, 3, 1, 10).count() === 0L)
    // two shared neighbors rank above one; ties break on (id1, id2)
    val g = Graph.symmetrize(Seq(
      (1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L), // (1,2) via 10 and 11
      (3L, 10L), (4L, 11L)                        // (1,3),(2,3) via 10 …
    ).toDF("id1", "id2"))
    val top = Graph.commonNeighbors(g, 10, 1, 3)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(top.head === ((1L, 2L, 2L)))
    assert(top.toSeq === top.toSeq.sortBy(t => (-t._3, t._1, t._2)))
    intercept[IllegalArgumentException](Graph.commonNeighbors(g, 0, 1, 1))
  }

  test("degreeAssortativity: path is perfectly disassortative; regular graph is undefined") {
    // path 1-2-3: every edge joins deg-1 to deg-2 -> r = −1
    val path = Graph.symmetrize(Seq((1L, 2L), (2L, 3L)).toDF("id1", "id2"))
    val r = Graph.degreeAssortativity(path).collect().head
    assert(r.getLong(0) === 4L && r.getDouble(1) === -1.0)
    // triangle: all degrees equal -> zero variance -> null (undefined),
    // never an ANSI divide-by-zero
    val tri = Graph.symmetrize(Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("id1", "id2"))
    assert(Graph.degreeAssortativity(tri).collect().head.get(1) === null)
  }

  test("burstiness: regular stream pins −1; a burst pushes B positive; minGaps filters") {
    def ev(uid: Long, ms: Seq[Long]) = ms.zipWithIndex.map { case (m, i) =>
      (uid, i.toLong, m)
    }
    // user 1: perfectly regular 1s grid; user 2: three quick + one huge
    // gap; user 3: too few gaps for minGaps = 3
    val df = (ev(1L, Seq(0L, 1000L, 2000L, 3000L, 4000L)) ++
        ev(2L, Seq(0L, 1L, 2L, 3L, 10000L)) ++ ev(3L, Seq(0L, 500L)))
      .toDF("user_id", "event_id", "ms")
      .select(col("user_id"), col("event_id"),
        timestamp_millis(col("ms")).as("ts"))
    val out = Sessionize.burstiness(df, "user_id", Seq("ts", "event_id"), minGaps = 3)
      .orderBy("user_id").collect()
    assert(out.length === 2)
    assert(out(0).getLong(0) === 1L && out(0).getDouble(2) === 1000.0 &&
      out(0).getDouble(3) === 0.0 && out(0).getDouble(4) === -1.0)
    val b2 = out(1).getDouble(4)
    assert(out(1).getLong(0) === 2L && b2 > 0.0 && b2 < 1.0)
  }

  test("conformal interval: matches a straight-line reimplementation over the hash split") {
    val df = (1L to 200L).map(k => ("g", k, k * 10L)).toDF("grp", "k", "y")
    // independently recompute: split each key with the same hash rule,
    // then floor-mean / disc-quantile / coverage in plain Scala
    val splits = df.select(col("k"),
        graft.ext.ScaleOps.splitByKey(col("k")).as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val y = (k: Long) => k * 10L
    val train = (1L to 200L).filter(splits(_) == "train").map(y)
    val cal = (1L to 200L).filter(splits(_) == "val").map(y)
    val test = (1L to 200L).filter(splits(_) == "test").map(y)
    val yHat = train.sum / train.size
    val scores = cal.map(v => math.abs(v - yHat)).sorted
    val qHat = scores(math.ceil(0.9 * scores.size).toInt - 1)
    val covered = test.count(v => math.abs(v - yHat) <= qHat)
    val out = Inference.conformalInterval(df, Seq("grp"), col("k"), col("y"))
      .collect().head
    assert(out.getAs[Long]("n_train") === train.size.toLong)
    assert(out.getAs[Long]("y_hat") === yHat)
    assert(out.getAs[Long]("qhat") === qHat)
    assert(out.getAs[Long]("n_test") === test.size.toLong)
    assert(out.getAs[Long]("covered") === covered.toLong)
    assert(out.getAs[Long]("coverage_bp") === covered.toLong * 10000L / test.size)
  }

  test("crossCorr: lag-1-shifted series is exact 1.0 at lag 1; lag 0 by hand; zero variance null") {
    // y_{t+1} = x_t: lag-1 pairs (1,1),(3,3),(1,1),(3,3) -> r=1; lag-0
    // pairs by hand: c=5 Σx=9 Σy=17 Σx²=21 Σy²=101 Σxy=21 →
    // num = 5·21−9·17 = −48, vx = 24, vy = 216 → −48/√5184 = −2/3
    val s = Seq((0L, 1L, 9L), (1L, 3L, 1L), (2L, 1L, 3L), (3L, 3L, 1L),
      (4L, 1L, 3L)).toDF("ord", "x", "y")
    val out = Inference.crossCorr(s, col("ord"), col("x"), col("y"), maxLag = 1)
      .collect().map(r => r.getAs[Int]("lag") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Double]("xcf"))).toMap
    assert(out(0) === ((5L, -0.666667)))
    assert(out(1) === ((4L, 1.0)))
    // constant x: vx = 0 at every lag -> null xcf, n_pairs still real
    val flat = Seq((0L, 7L, 1L), (1L, 7L, 2L), (2L, 7L, 3L)).toDF("ord", "x", "y")
    val r0 = Inference.crossCorr(flat, col("ord"), col("x"), col("y"), 0)
      .collect().head
    assert(r0.getAs[Long]("n_pairs") === 3L)
    assert(r0.isNullAt(r0.fieldIndex("xcf")))
  }

  test("privacy: t-closeness EMD is exact — disjoint groups 0.5, global-matching group 0") {
    // groups over sv∈{0,1}: A=(2,0), B=(0,2), C=(1,1); global (3,3), N=6, m=2
    // A: Σ|cumg·N−cumG·n| = |2·6−3·2|+|2·6−6·2| = 6 → t = 6/(2·6·1) = .5
    // C: cum (1,2) tracks the global halves exactly → t = 0
    val df = Seq(("A", 0L), ("A", 0L), ("B", 1L), ("B", 1L), ("C", 0L), ("C", 1L))
      .toDF("qi", "sv")
    val out = Privacy.tClosenessGroups(df, Seq(col("qi")), col("sv"))
      .orderBy("q0").collect()
    assert(out.map(r => (r.getString(0), r.getAs[Long]("n"),
      r.getAs[Long]("t_num"), r.getAs[Double]("t"))).toSeq ===
      Seq(("A", 2L, 6L, 0.5), ("B", 2L, 6L, 0.5), ("C", 2L, 0L, 0.0)))
  }

  test("longestPathLayers: longest (not shortest) path wins; maxRounds truncates; early exit") {
    // 1→2→3 and the 1→3 shortcut: node 3's level is 2 (the LONG way);
    // 4→3 leaves 4 a source at level 0
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 3L)).toDF("src", "dst")
    val out = Graph.longestPathLayers(e, maxRounds = 8)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("level"))).toSeq
    assert(out === Seq((1L, 0L), (2L, 1L), (3L, 2L), (4L, 0L)))
    // one round only: 3 has seen just one relaxation, so it sits at 1
    val trunc = Graph.longestPathLayers(e, maxRounds = 1)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getAs[Long]("level")))
    assert(trunc.toSeq === Seq((1L, 0L), (2L, 1L), (3L, 1L), (4L, 0L)))
  }

  test("localClustering: triangle corners score 1, hub with pendant fractional, leaf null") {
    // triangle 1-2-3 plus pendant 4 on 3: deg = 2,2,3,1; one triangle
    // credits corners 1,2,3 -> lcc 1, 1, 2/(3·2)=.333333, null for 4
    val e = Graph.symmetrize(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
      .toDF("id1", "id2"))
    val out = Graph.localClustering(e).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("degree"),
        r.getAs[Long]("n_tri"),
        if (r.isNullAt(3)) null else r.getAs[Double]("lcc"))).toSeq
    assert(out === Seq((1L, 2L, 1L, 1.0), (2L, 2L, 1L, 1.0),
      (3L, 3L, 1L, 0.333333), (4L, 1L, 0L, null)))
  }

  test("zoneMapPruning: skip iff max<lo or min>hi; rows accounted exactly") {
    val df = Seq(("A", 1L), ("A", 5L), ("A", 10L), ("B", 20L), ("B", 25L))
      .toDF("f", "v")
    val out = ScaleOps.zoneMapPruning(df, col("f"), col("v"),
        Seq(("all", 0L, 100L), ("inA", 0L, 15L), ("none", 100L, 200L)))
      .orderBy("pred").collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_files"),
        r.getAs[Long]("n_skipped"), r.getAs[Long]("rows_skipped"),
        r.getAs[Long]("rows_scanned"))).toSeq
    assert(out === Seq(("all", 2L, 0L, 0L, 5L), ("inA", 2L, 1L, 2L, 3L),
      ("none", 2L, 2L, 5L, 0L)))
  }

  test("blocklistFilter: word-boundary exact, phrase+doc normalized, anchor join complete") {
    val docs = Seq(
      (1L, "The FAST   Table is fast"),     // hits after normalization
      (2L, "breakfast tables everywhere"),  // substring trap: must NOT hit
      (3L, "spark data spark"),
      (4L, "data spark")                    // reversed order: no hit
    ).toDF("doc_id", "text")
    val out = Corpus.blocklistFilter(docs, Seq("Fast  TABLE", "spark data"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out === Seq((1L, "fast table"), (3L, "spark data")))
  }

  test("fleissKappa: perfect agreement 1; hand case -1/3; partial items dropped") {
    // 2 items x 3 raters, all agree: P̄=1, Pe=.5 -> kappa 1
    val perfect = Seq((1L, "a"), (1L, "a"), (1L, "a"), (2L, "b"), (2L, "b"),
      (2L, "b")).toDF("i", "cat")
    val p = Inference.fleissKappa(perfect, col("i"), col("cat"), 3).collect().head
    assert(p.getAs[Long]("n_items") === 2L && p.getAs[Double]("kappa") === 1.0)
    // (a,a,b) and (a,b,b): Σn²=10, A=4 -> P̄=1/3; B=18, Pe=.5 -> κ=-1/3.
    // Item 3 has only 2 ratings -> excluded entirely (also from B).
    val mixed = Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"),
      (2L, "b"), (3L, "a"), (3L, "a")).toDF("i", "cat")
    val m = Inference.fleissKappa(mixed, col("i"), col("cat"), 3).collect().head
    assert(m.getAs[Long]("n_items") === 2L)
    assert(m.getAs[Double]("p_bar") === 0.333333)
    assert(m.getAs[Double]("p_e") === 0.5)
    assert(m.getAs[Double]("kappa") === -0.333333)
  }

  test("wilcoxonSignedRank: zero diffs drop, tie midranks in half units, z by hand") {
    // diffs +1, -2, +3, +3, 0(dropped): rank2 = 2,4,7,7 ->
    // W+ = 8 (16/2), W- = 2; W+ + W- = n(n+1)/2 = 10.
    // z = (32-20)·√3/√(2·4·5·9 - 6) = 12√3/√354 = 1.10469
    val pairs = Seq((10L, 11L), (10L, 8L), (5L, 8L), (1L, 4L), (9L, 9L))
      .toDF("x", "y")
    val r = Inference.wilcoxonSignedRank(pairs, col("x"), col("y"))
      .collect().head
    assert(r.getAs[Long]("n") === 4L)
    assert(r.getAs[Long]("w_plus2") === 16L)
    assert(r.getAs[Long]("w_minus2") === 4L)
    assert(r.getAs[Double]("z") === 1.10469)
    // all diffs equal: one tie group spanning everything still has
    // radicand 2n(n+1)(2n+1) - (n³-n) > 0 for n >= 2 -> z defined;
    // single pair n=1 -> radicand 2·1·2·3 - 0 = 12 > 0, z = 2/√12
    val one = Seq((1L, 2L)).toDF("x", "y")
    val o = Inference.wilcoxonSignedRank(one, col("x"), col("y")).collect().head
    assert(o.getAs[Long]("n") === 1L && o.getAs[Long]("w_plus2") === 2L)
  }

  test("kendallTauB: hand-counted concordance with an x-tie; constant series null") {
    // x=1,2,2,3; y=1,3,2,4 over 4 cells: C=5, D=0, ties_x=1 ->
    // tau_b = 5/√(5·6) = 0.912871
    val s = Seq((1L, 1L, 1L), (2L, 2L, 3L), (3L, 2L, 2L), (4L, 3L, 4L))
      .toDF("o", "x", "y")
    val r = Inference.kendallTauB(s, col("o"), col("x"), col("y"))
      .collect().head
    assert(r.getAs[Long]("n_pairs") === 6L)
    assert(r.getAs[Long]("concordant") === 5L)
    assert(r.getAs[Long]("discordant") === 0L)
    assert(r.getAs[Long]("ties_x") === 1L)
    assert(r.getAs[Double]("tau_b") === 0.912871)
    // constant y: every pair ties on y -> denominator factor 0 -> null
    val flat = Seq((1L, 1L, 7L), (2L, 2L, 7L), (3L, 3L, 7L)).toDF("o", "x", "y")
    val f = Inference.kendallTauB(flat, col("o"), col("x"), col("y"))
      .collect().head
    assert(f.isNullAt(f.fieldIndex("tau_b")))
  }

  test("adamicAdar: 4-cycle scores 2/ln2 for both diagonals; hub apex capped out") {
    // cycle 1-2-3-4-1: non-adjacent (1,3) via apexes 2,4; (2,4) via 1,3;
    // every apex deg 2 -> aa = 2/ln(2) = 2.88539, cn = 2
    val e = Graph.symmetrize(Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))
      .toDF("id1", "id2"))
    val out = Graph.adamicAdar(e, maxApexDegree = 10, minCommon = 2, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("cn"),
        r.getAs[Double]("aa"))).toSeq
    assert(out === Seq((1L, 3L, 2L, 2.88539), (2L, 4L, 2L, 2.88539)))
    // add hub 9 adjacent to all four: cycle degrees become 3, hub 6.
    // Cap 3 excludes ONLY the hub apex, so each diagonal keeps its two
    // cycle apexes, now weighted 1/ln(3): aa = 2/ln3 = 1.820478 —
    // and the would-be (x,9) candidates are adjacent, anti-joined out.
    val hubbed = Graph.symmetrize(Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L),
      (9L, 1L), (9L, 2L), (9L, 3L), (9L, 4L), (9L, 5L), (9L, 6L))
      .toDF("id1", "id2"))
    val capped = Graph.adamicAdar(hubbed, maxApexDegree = 3, minCommon = 2,
        topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("aa")))
    assert(capped.toSeq === Seq((1L, 3L, 1.820478), (2L, 4L, 1.820478)))
  }

  test("nodeJaccard: exact ppb order key; pentagon 1/3, square 1; adjacency excluded") {
    // pentagon: each diagonal pair shares exactly 1 neighbor, degs 2:
    // J = 1/(2+2-1) = 1/3 -> ppb 333333333
    val penta = Graph.symmetrize(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (5L, 1L)).toDF("id1", "id2"))
    val out = Graph.nodeJaccard(penta, maxApexDegree = 10, minCommon = 1,
        topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Long]("jaccard_ppb"), r.getAs[Double]("jaccard"))).toSeq
    assert(out.length === 5) // the 5 diagonals
    assert(out.forall { case (_, _, ppb, j) => ppb == 333333333L && j == 0.333333 })
    // square diagonals share BOTH neighbors: J = 2/(2+2-2) = 1
    val sq = Graph.symmetrize(Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))
      .toDF("id1", "id2"))
    val sqOut = Graph.nodeJaccard(sq, 10, 1, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("jaccard"))).toSeq
    assert(sqOut === Seq((1L, 3L, 1.0), (2L, 4L, 1.0)))
  }

  test("harmonicCloseness2: path scores by hand; mid cap removes hub paths") {
    // path 1-2-3-4: ends see 1 neighbor + 1 two-hop = 6+3 = 9;
    // middles see 2 + 1 = 15
    val path = Graph.symmetrize(Seq((1L, 2L), (2L, 3L), (3L, 4L))
      .toDF("id1", "id2"))
    val out = Graph.harmonicCloseness2(path, maxMidDegree = 10)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("harmonic6"))).toSeq
    assert(out === Seq((1L, 9L), (2L, 15L), (3L, 15L), (4L, 9L)))
    // star 0-{1,2,3}: center deg 3; cap 2 kills every 2-hop (all go
    // through the center) -> leaves n1 only
    val star = Graph.symmetrize(Seq((0L, 1L), (0L, 2L), (0L, 3L))
      .toDF("id1", "id2"))
    val capped = Graph.harmonicCloseness2(star, maxMidDegree = 2)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n2"))).toSeq
    assert(capped === Seq((0L, 0L), (1L, 0L), (2L, 0L), (3L, 0L)))
  }

  test("modularity: two triangles + bridge = 35/196 each; one community = 0") {
    val tri2 = Graph.symmetrize(Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L),
      (5L, 6L), (4L, 6L), (3L, 4L)).toDF("id1", "id2"))
    val labels = Seq((1L, "A"), (2L, "A"), (3L, "A"), (4L, "B"), (5L, "B"),
      (6L, "B")).toDF("id", "community")
    val out = Graph.modularity(tri2, labels).orderBy("community").collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_nodes"),
        r.getAs[Long]("e2_in"), r.getAs[Long]("d_tot"),
        r.getAs[Long]("q_num"), r.getAs[Double]("contrib"))).toSeq
    // m=7, M2=14; per triangle e2=6, d_tot=7 -> 6*14-49 = 35; 35/196
    assert(out === Seq(("A", 3L, 6L, 7L, 35L, 0.178571),
      ("B", 3L, 6L, 7L, 35L, 0.178571)))
    // everything in one community: Q = e2*M2 - d^2 = 14*14-14^2 = 0
    val one = Graph.modularity(tri2,
      labels.select(col("id"), lit("all").as("community"))).collect().head
    assert(one.getAs[Long]("q_num") === 0L && one.getAs[Double]("contrib") === 0.0)
  }

  test("stratifiedK: exact k per stratum, short strata whole, deterministic") {
    val df = (1L to 10L).map(i => ("big", i)) :+ (("small", 11L))
    val d = df.toDF("g", "k")
    val out = ScaleOps.stratifiedK(d, Seq("g"), col("k"), k = 3)
      .orderBy("g", "rn").collect()
      .map(r => (r.getString(0), r.getAs[Long]("sample_key"), r.getAs[Int]("rn")))
    assert(out.count(_._1 == "big") === 3)
    assert(out.filter(_._1 == "small").map(x => (x._2, x._3)).toSeq ===
      Seq((11L, 1)))
    // determinism: a second run picks the identical keys
    val again = ScaleOps.stratifiedK(d, Seq("g"), col("k"), k = 3)
      .orderBy("g", "rn").collect()
      .map(r => (r.getString(0), r.getAs[Long]("sample_key"), r.getAs[Int]("rn")))
    assert(out.toSeq === again.toSeq)
  }

  test("hits: alternating-walk counts by hand; sinks/sources zeroed") {
    // directed: 1→2, 3→2, 2→4. h0≡1;
    // a1 = in-sums (2:2, 4:1); h1 = out-sums of a1 (1:2, 3:2, 2:1);
    // a2 = (2: h1(1)+h1(3) = 4, 4: h1(2) = 1); h2 = (1:4, 3:4, 2:1, 4:0)
    val e = Seq((1L, 2L), (3L, 2L), (2L, 4L)).toDF("src", "dst")
    val out = Graph.hits(e, iters = 2).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getAs[Double]("hub"),
        r.getAs[Double]("auth"))).toSeq
    assert(out === Seq((1L, 1.0, 0.0), (2L, 0.25, 1.0), (3L, 1.0, 0.0),
      (4L, 0.0, 0.25)))
  }

  test("sssp: weighted relaxation beats direct edge; hop bound binds; unreachable absent") {
    // triangle 1-2 (w1), 2-3 (w5), 1-3 (w10) + detached 4-5
    val pairs = Seq((1L, 2L, 1L), (2L, 3L, 5L), (1L, 3L, 10L), (4L, 5L, 2L))
      .toDF("id1", "id2", "w")
    val e = pairs.select(col("id1").as("src"), col("id2").as("dst"), col("w"))
      .unionAll(pairs.select(col("id2").as("src"), col("id1").as("dst"),
        col("w")))
    val seeds = Seq(1L).toDF("id")
    val out2 = Graph.sssp(e, seeds, maxHops = 2).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("dist"))).toSeq
    assert(out2 === Seq((1L, 0L), (2L, 1L), (3L, 6L))) // 2-hop 1+5 beats 10
    val out1 = Graph.sssp(e, seeds, maxHops = 1).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("dist"))).toSeq
    assert(out1 === Seq((1L, 0L), (2L, 1L), (3L, 10L))) // bound binds
  }

  test("rocAuc: tie-aware rank-sum by hand (half credit on the tied pair)") {
    // pos scores {3, 2}, neg {1, 2}: pairs (3,1)+(3,2)+(2,1) win, (2,2)
    // ties -> U = 3.5, AUC = 0.875, u2 = 7
    val df = Seq(("g", 3L, true), ("g", 2L, true), ("g", 1L, false),
      ("g", 2L, false)).toDF("grp", "s", "y")
    val out = Inference.rocAuc(df, Seq("grp"), col("s"), col("y")).collect().head
    assert(out.getAs[Long]("n_pos") === 2L && out.getAs[Long]("n_neg") === 2L)
    assert(out.getAs[Long]("u2") === 7L)
    assert(out.getAs[Double]("auc") === 0.875)
  }

  test("prCurve: cumulative-from-top sweep by hand") {
    val df = Seq(("g", 2L, true), ("g", 1L, true), ("g", 1L, false),
      ("g", 0L, false)).toDF("grp", "b", "y")
    val out = Inference.prCurve(df, Seq("grp"), col("b"), col("y"))
      .orderBy(col("bucket").desc).collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("tp"),
        r.getAs[Long]("fp"), r.getAs[Double]("precision"),
        r.getAs[Double]("recall"))).toSeq
    assert(out === Seq((2L, 1L, 0L, 1.0, 0.5), (1L, 2L, 1L, 0.666667, 1.0),
      (0L, 2L, 2L, 0.5, 1.0)))
  }

  test("bhAdjust: reversed running min, clamp at 1, reject from rounded p_adj") {
    val df = Seq(("a", 0.01), ("b", 0.04), ("c", 0.03), ("d", 0.9))
      .toDF("h", "pv")
    val out = Inference.bhAdjust(df, Seq("h"), col("pv")).orderBy("rank")
      .collect()
      .map(r => (r.getString(0), r.getAs[Int]("rank"),
        r.getAs[Double]("p_adj"), r.getAs[Boolean]("reject"))).toSeq
    // sorted p: .01 .03 .04 .9 -> m·p/i: .04 .06 .053333 .9 -> revmin:
    // .04 .053333 .053333 .9
    assert(out === Seq(("a", 1, 0.04, true), ("c", 2, 0.053333, false),
      ("b", 3, 0.053333, false), ("d", 4, 0.9, false)))
  }

  test("krippendorffAlpha: mixed agreement 0; perfect agreement 1; singleton dropped") {
    // u1: A,A agree; u2: A,B disagree; u3 singleton (excluded)
    val r = Seq((1L, "r1", "A"), (1L, "r2", "A"), (2L, "r1", "A"),
      (2L, "r2", "B"), (3L, "r1", "A")).toDF("u", "rt", "cat")
    val out = Inference.krippendorffAlpha(r, col("u"), col("rt"), col("cat"))
      .collect().head
    assert(out.getAs[Long]("n_units") === 2L && out.getAs[Long]("n") === 4L)
    // D_o_scaled = 24; (n−1)·24 = 72 = 12·(16−10) -> alpha 0
    assert(out.getAs[Double]("alpha") === 0.0)
    val perfect = Seq((1L, "r1", "A"), (1L, "r2", "A"), (2L, "r1", "B"),
      (2L, "r2", "B")).toDF("u", "rt", "cat")
    val p = Inference.krippendorffAlpha(perfect, col("u"), col("rt"),
      col("cat")).collect().head
    assert(p.getAs[Double]("alpha") === 1.0)
  }

  test("naiveBayes: Laplace-smoothed scores by hand; absent terms hit the class floor") {
    import graft.ext.TextStats
    // X: docs 1,3 (tokens a:3 b:2, tot 5); Y: doc 2 (b:1 c:1, tot 2); V=3
    val docs = Seq((1L, "a a b", "X"), (2L, "b c", "Y"), (3L, "a b", "X"))
      .toDF("doc_id", "text", "lang")
    val out = TextStats.naiveBayes(docs, col("doc_id"), col("text"),
        col("lang"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getAs[Long]("score_nano"),
        r.getAs[Boolean]("correct"))).toSeq
    assert(out.map(_._2) === Seq("X", "Y", "X"))
    assert(out.forall(_._4))
    // doc 1 under X: prior ln(2/3) + 2·ln(4/8) + ln(3/8), each term
    // nano-quantized BEFORE the rollup
    def nano(x: Double): Long = math.round(math.log(x) * 1e9)
    assert(out.head._3 === nano(2.0 / 3) + 2 * nano(4.0 / 8) + nano(3.0 / 8))
  }

  test("dpCounts: deterministic key-seeded noise; exact n; clamp after rounding") {
    val df = Seq(("a", 1), ("a", 2), ("a", 3), ("b", 1)).toDF("g", "x")
    val out = Privacy.dpCounts(df, Seq("g"), epsilon = 1.0)
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getAs[Long]("n"),
        r.getAs[Double]("noise"), r.getAs[Double]("dp_n"),
        r.getAs[Double]("dp_n_clamped"))).toSeq
    assert(out.map(x => (x._1, x._2)) === Seq(("a", 3L), ("b", 1L)))
    // dp_n is the rounded sum; the clamp floors at 0 and never lifts
    out.foreach { case (_, n, noise, dpn, cl) =>
      assert(dpn === BigDecimal(n + noise).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(cl === math.max(dpn, 0.0))
    }
    val again = Privacy.dpCounts(df, Seq("g"), epsilon = 1.0)
      .orderBy("g").collect().map(r => r.getAs[Double]("noise")).toSeq
    assert(again === out.map(_._3)) // same keys -> same noise, always
  }

  test("criticalPath: max-plus costs by hand; heavier direct edge beats cheap detour") {
    // 1→2 (w5), 1→3 (w1), 3→2 (w1), 2→4 (w2): cost 2 = max(5, 1+1) = 5
    val e = Seq((1L, 2L, 5L), (1L, 3L, 1L), (3L, 2L, 1L), (2L, 4L, 2L))
      .toDF("src", "dst", "w")
    val out = Graph.criticalPath(e, maxRounds = 8).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("cost"))).toSeq
    assert(out === Seq((1L, 0L), (2L, 5L), (3L, 1L), (4L, 7L)))
  }

  test("rougeOverlap: clipped multiset counts; zero-overlap row kept; empty ref null") {
    val docs = Seq((0L, "a b a c"), (1L, "a a a b"), (2L, "q"), (3L, "z z"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 0L), (3L, 2L)).toDF("cand_id", "ref_id")
    val out = Corpus.rougeOverlap(docs, pairs).orderBy("cand_id").collect()
    val r0 = out(0) // ref unigrams a:2 b:1 c:1; clipped 2+1=3 -> 3/4;
    assert(r0.getAs[Long]("ref_uni") === 4L && r0.getAs[Long]("ov1") === 3L)
    assert(r0.getAs[Double]("rouge1") === 0.75)
    // ref bigrams "a b","b a","a c"; cand "a a","a a","a b" -> clip 1 -> 1/3
    assert(r0.getAs[Long]("ref_bi") === 3L && r0.getAs[Long]("ov2") === 1L)
    assert(r0.getAs[Double]("rouge2") === 0.333333)
    val r1 = out(1) // no shared grams; 1-token ref has no bigrams -> null
    assert(r1.getAs[Long]("ov1") === 0L && r1.getAs[Double]("rouge1") === 0.0)
    assert(r1.getAs[Long]("ref_bi") === 0L)
    assert(r1.isNullAt(r1.fieldIndex("rouge2")))
  }
}
