package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Round-15 interleaved kernel A/B probe (the ProbeR14 / SCALING.md
  * measurement discipline): named variants run INTERLEAVED in one JVM
  * (A, B, C, A, B, C, ...) so JIT state and host drift hit every
  * variant equally; each rep is a noop-sink write; min and median
  * print per variant. Edited in place per experiment; results land in
  * OPTIMIZATION_r15.md tables.
  *
  * Round-15 experiments (VERDICT r14 "next round" items 3-5, 7):
  *   boot_*  — q_bootstrap_ci mixer hoist: keep or revert (item 3)
  *   qsk_*   — q_quantile_sketch keyed fan-out: keep or revert (item 3)
  *   ar_*    — q_assoc_rules bi/freq persist vs recompute (item 4)
  *   pmi_*   — q_pmi_cooccur bi/freq persist vs recompute (item 4)
  *   prd_*   — pageRankDirected per-round barrier composition (item 5)
  *   aa_*    — q_adamic_adar stage split: edges vs full (item 5)
  *   rcte    — q_recursive_cte quiet re-measure (item 7)
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *          runMain graft.ProbeR15 [reps] [variantFilter,...]
  */
object ProbeR15 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val filt = args.drop(1).headOption.map(_.split(',').map(_.trim).toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Log.silenceNoisyWarnings()
    spark.range(1000000).selectExpr("sum(id)").collect()

    import QueryShared.{spread, spreadBy, t}

    // ---- experiment 1: q_bootstrap_ci — mixer hoisted vs inline ------
    // (VERDICT #3: claimed 2.39→~1.9, driver measured 2.67; settle with
    // a quiet interleaved full-query A/B, keep only a reproduced delta)
    val cuts: Seq[Long] = { // Poisson(1) CDF in micro-units, k = 0..9
      val e = math.exp(-1.0)
      var c = 0.0; var f = 1.0
      (0 to 9).map { k =>
        if (k > 0) f *= k
        c += e / f
        math.min(999999L, math.round(c * 1e6))
      }
    }
    def bootQuery(hoist: Boolean): DataFrame = {
      val reps50 = 50
      val loRank = (0.025 * reps50).toInt + 1
      val hiRank = reps50 - (0.025 * reps50).toInt
      val base = t(spark, sfDir, "lineitem")
        .select(col("l_returnflag"),
          concat(col("l_orderkey"), lit("-"), col("l_linenumber"))
            .cast("string").as("rk"),
          floor(col("l_extendedprice") * 100).cast("long").as("xc"))
        .withColumn("h", conv(substring(md5(col("rk")), 1, 8), 16, 10).cast("long"))
      def mixU: Column = {
        val s = (col("h") + col("rep") * lit(2654435761L)) % lit(4294967296L)
        val u1 = (s * lit(1597334677L)) % lit(4294967296L)
        ((u1 * lit(1812433253L)) % lit(4294967296L)) % lit(1000000L)
      }
      def foldW(u: Column): Column = cuts.zipWithIndex
        .foldRight(lit(cuts.length.toLong)) { case ((cut, k), rest) =>
          when(u < cut, k.toLong).otherwise(rest)
        }
      val exploded = base
        .select(col("l_returnflag"), col("rk"), col("xc"), col("h"),
          explode(sequence(lit(0), lit(reps50 - 1))).as("rep"))
      val withW =
        if (hoist) exploded.withColumn("_u", mixU).withColumn("w", foldW(col("_u")))
        else exploded.withColumn("w", foldW(mixU))
      val repMeans = withW
        .groupBy(col("l_returnflag"), col("rep"))
        .agg(sum(col("w") * col("xc")).as("swx"), sum("w").as("sw"))
        .withColumn("m", col("swx").cast("double") / col("sw").cast("double"))
      val ranked = repMeans.withColumn("rn", row_number().over(
        Window.partitionBy(col("l_returnflag")).orderBy(col("m"), col("rep"))))
      val point = base.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"), sum("xc").as("sx"))
      point
        .join(ranked.filter(col("rn") === loRank)
          .select(col("l_returnflag"), col("m").as("lo")), Seq("l_returnflag"))
        .join(ranked.filter(col("rn") === hiRank)
          .select(col("l_returnflag"), col("m").as("hi")), Seq("l_returnflag"))
        .select(col("l_returnflag"), col("n_rows"),
          round(col("sx").cast("double") / col("n_rows").cast("double"), 6)
            .as("point_mean"),
          round(col("lo"), 6).as("ci_lo"), round(col("hi"), 6).as("ci_hi"))
        .orderBy("l_returnflag")
    }

    // ---- experiment 2: q_quantile_sketch — keyed vs RR vs no fan-out -
    def qskQuery(fanout: String): DataFrame = {
      val cents0 = t(spark, sfDir, "lineitem")
        .select(col("l_returnflag"),
          floor(col("l_extendedprice") * 100).cast("long").as("c"))
      val cents = fanout match {
        case "keyed" => spreadBy(cents0, col("l_returnflag"), col("c").cast("double"))
        case "rr" => spread(cents0)
        case _ => cents0
      }
      val bins = cents
        .groupBy(col("l_returnflag"), expr("c DIV 8192").as("bin"))
        .agg(count(lit(1)).as("bn"))
      val wCum = Window.partitionBy("l_returnflag").orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
      val wAll = Window.partitionBy("l_returnflag")
      val est = bins
        .withColumn("cum", sum("bn").over(wCum))
        .withColumn("n", sum("bn").over(wAll))
        .groupBy("l_returnflag")
        .agg(max("n").as("n"),
          min(when(col("cum") * 2 >= col("n"), (col("bin") + 1) * 8192))
            .as("p50_est"),
          min(when(col("cum") * 20 >= col("n") * 19, (col("bin") + 1) * 8192))
            .as("p95_est"))
      val exact = graft.ext.Quantiles.exactQuantilesDisc(cents, "c",
        Seq("l_returnflag"), Seq(0.5, 0.95), Seq("p50_exact", "p95_exact"))
      est.join(exact, "l_returnflag")
        .select(col("l_returnflag"), col("n"),
          col("p50_est"), col("p50_exact").cast("long").as("p50_exact"),
          (col("p50_est") - col("p50_exact").cast("long")).as("p50_err"),
          col("p95_est"), col("p95_exact").cast("long").as("p95_exact"),
          (col("p95_est") - col("p95_exact").cast("long")).as("p95_err"))
        .orderBy("l_returnflag")
    }

    // ---- experiment 3: assoc_rules / pmi_cooccur persist vs recompute
    // (VERDICT #4: driver-flat at 32c while 8c quiet rows support the
    // persist; A/B at 32c decides)
    def arQuery(persist: Boolean): DataFrame = {
      import graft.ext.Affinity._
      val df = spread(t(spark, sfDir, "lineitem"))
      val bi0 = basketItems(df, col("l_orderkey"), col("l_suppkey"))
      val bi = if (persist) bi0.persist() else bi0
      val freq0 = frequentItems(bi, 50)
      val freq = if (persist) freq0.persist() else freq0
      val total = bi.select(countDistinct(col("basket")).as("n_baskets"))
      val out = pairCounts(bi, freq)
        .filter(col("n_pair") >= 10)
        .join(broadcast(freq.withColumnRenamed("item", "item1")
          .withColumnRenamed("n_item", "n1")), "item1")
        .join(broadcast(freq.withColumnRenamed("item", "item2")
          .withColumnRenamed("n_item", "n2")), "item2")
        .crossJoin(broadcast(total))
        .select(col("item1"), col("item2"), col("n_pair"), col("n1"), col("n2"),
          round(col("n_pair").cast("double") / col("n_baskets").cast("double"), 6)
            .as("support"),
          round(col("n_pair").cast("double") / col("n1").cast("double"), 6)
            .as("conf_1to2"),
          round(col("n_pair").cast("double") / col("n2").cast("double"), 6)
            .as("conf_2to1"),
          round(col("n_pair").cast("double") * col("n_baskets").cast("double") /
            (col("n1") * col("n2")).cast("double"), 6).as("lift"))
        .orderBy("item1", "item2")
      out
    }
    def pmiQuery(persist: Boolean): DataFrame = {
      import graft.ext.Affinity._
      val toks = spread(t(spark, sfDir, "documents"))
        .select(col("doc_id"), explode(graft.ext.TextStats.tokens(col("text"))).as("term"))
      val bi0 = basketItems(toks, col("doc_id"), col("term"))
      val bi = if (persist) bi0.persist() else bi0
      val freq0 = frequentItems(bi, 20)
      val freq = if (persist) freq0.persist() else freq0
      val total = bi.select(countDistinct(col("basket")).as("n_docs"))
      pairCounts(bi, freq)
        .filter(col("n_pair") >= 10)
        .join(broadcast(freq.withColumnRenamed("item", "item1")
          .withColumnRenamed("n_item", "n1")), "item1")
        .join(broadcast(freq.withColumnRenamed("item", "item2")
          .withColumnRenamed("n_item", "n2")), "item2")
        .crossJoin(broadcast(total))
        .select(col("item1").as("term1"), col("item2").as("term2"),
          col("n_pair"), col("n1"), col("n2"),
          round(log(col("n_pair").cast("double") * col("n_docs").cast("double") /
            (col("n1") * col("n2")).cast("double")), 6).as("pmi"))
        .orderBy("term1", "term2")
    }

    // ---- experiment 4: pageRankDirected round-barrier composition ----
    // current: localCheckpoint per round (UnknownPartitioning — every
    // round re-exchanges pr for the contrib join AND the spine join).
    // variant: persist+count per round — keeps hashpartitioning(id) so
    // the spine join needs no exchange and the 1-row dangling scalar
    // carries an explicit broadcast hint.
    def prdEdges(): DataFrame = graft.ext.ScaleOps.sizedEdges(
      QueryShared.coPurchasePairs(spark, sfDir, minCount = 2)
        .select(col("id1").as("src"), col("id2").as("dst")))
    def prdVariant(mode: String): DataFrame = {
      val iters = 3; val d = 0.85
      val e = prdEdges()
      val deg = e.groupBy("src").agg(count(lit(1)).as("out_deg"))
      val nodes = e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id"))).distinct()
      val spine0 = nodes.join(deg.withColumnRenamed("src", "id"), Seq("id"), "left")
        .select(col("id"), coalesce(col("out_deg"), lit(0L)).as("out_deg"))
      val spine = mode match {
        case "persist" =>
          val s = spine0.repartition(col("id")).persist(); s.count(); s
        case _ => spine0
      }
      val n = nodes.count()
      var pr = spine.withColumn("pr", lit(1.0 / n))
      val kept = scala.collection.mutable.Buffer.empty[DataFrame]
      for (_ <- 1 to iters) {
        val dangling0 = pr.filter(col("out_deg") === 0L)
          .agg(coalesce(sum("pr"), lit(0.0)).as("dm"))
        val dangling = if (mode == "persist") broadcast(dangling0) else dangling0
        val contrib = e
          .join(pr.withColumnRenamed("id", "src"), "src")
          .groupBy(col("dst").as("id"))
          .agg(sum(col("pr") / col("out_deg").cast("double")).as("inflow"))
        pr = spine
          .join(contrib, Seq("id"), "left")
          .crossJoin(dangling)
          .select(col("id"), col("out_deg"),
            (lit((1.0 - d) / n) + lit(d) *
              (coalesce(col("inflow"), lit(0.0)) + col("dm") / n)).as("pr"))
        pr = mode match {
          case "persist" =>
            val p = pr.persist(StorageLevel.MEMORY_AND_DISK_SER)
            p.count(); kept += p; p
          case _ => pr.localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
        }
      }
      val out = pr.select(col("id"), round(col("pr"), 6).as("pr")).orderBy("id")
      out
    }

    // ---- experiment 5: adamic_adar stage split ------------------------
    def aaEdges(): DataFrame = QueryShared.coPurchaseEdges(spark, sfDir, minCount = 2)
    def aaFull(): DataFrame = {
      val e = aaEdges().persist()
      val (cap, mc) = graft.ext.Graph.linkPredictionParams(e)
      graft.ext.Graph.adamicAdar(e, maxApexDegree = cap, minCommon = mc, topK = 40)
    }

    // ---- experiment 6: q_vocab_overlap — st has THREE consumers that
    // prune/key differently (vs aggregate by source; two term-keyed
    // self-join legs, which ReusedExchange already dedupes between
    // themselves) — candidate for the round-14 diverging-consumer
    // persist pattern (VERDICT #8)
    def vocabQuery(persist: Boolean): DataFrame = {
      val st0 = spread(t(spark, sfDir, "documents"))
        .select(col("source"), explode(graft.ext.TextStats.tokens(col("text"))).as("term"))
        .distinct()
      val st = if (persist) st0.persist() else st0
      val vs = st.groupBy("source").agg(count(lit(1)).as("v"))
      st.as("a").join(st.as("b"),
          col("a.term") === col("b.term") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("s1"), col("b.source").as("s2"))
        .agg(count(lit(1)).as("n_common"))
        .join(vs.select(col("source").as("s1"), col("v").as("v1")), "s1")
        .join(vs.select(col("source").as("s2"), col("v").as("v2")), "s2")
        .select(col("s1"), col("s2"), col("v1"), col("v2"), col("n_common"),
          round(col("n_common").cast("double") /
            (col("v1") + col("v2") - col("n_common")).cast("double"), 6)
            .as("jaccard"))
        .orderBy("s1", "s2")
    }

    // ---- experiment 7 (round 2): quantile family keyed-vs-none fan-out
    // qsk_none won by ~0.9 s; test whether the spreadBy on the rest of
    // the family is similarly redundant (the grid aggregate inserts its
    // own exchange either way; the fan-out's value is only moving the
    // partial aggregate off the single input split)
    def wmQuery(fan: String): DataFrame = {
      val li0 = t(spark, sfDir, "lineitem")
        .select(col("l_returnflag"), col("l_extendedprice"), col("l_quantity"))
      val li = if (fan == "keyed") spreadBy(li0, col("l_returnflag"), col("l_extendedprice")) else li0
      graft.ext.Quantiles.exactWeightedQuantilesDisc(li,
          "l_extendedprice", "l_quantity", Seq("l_returnflag"),
          Seq(0.5, 0.9), Seq("wp50", "wp90"))
        .orderBy("l_returnflag")
    }
    def pdQuery(fan: String): DataFrame = {
      val li0 = t(spark, sfDir, "lineitem")
        .select(col("l_returnflag"), col("l_extendedprice"))
      val li = if (fan == "keyed") spreadBy(li0, col("l_returnflag"), col("l_extendedprice")) else li0
      graft.ext.Quantiles.exactQuantilesDisc(li, "l_extendedprice",
          Seq("l_returnflag"), Seq(0.5, 0.95), Seq("p50_disc", "p95_disc"))
        .orderBy("l_returnflag")
    }
    def qnQuery(fan: String): DataFrame = {
      val li0 = t(spark, sfDir, "lineitem").select(col("l_returnflag"),
        col("l_linestatus"), floor(col("l_extendedprice") * 100).as("cents"))
      val li = if (fan == "keyed")
        spreadBy(li0, col("l_returnflag"), col("l_linestatus"), col("cents"))
      else li0
      val grid = li.groupBy("l_returnflag", "l_linestatus", "cents")
        .agg(count(lit(1)).as("c"))
      val wLt = Window.partitionBy("l_returnflag").orderBy("cents")
        .rangeBetween(Window.unboundedPreceding, -1)
      grid
        .withColumn("rk", coalesce(sum("c").over(wLt), lit(0L)) + lit(1L))
        .withColumn("ng", sum("c").over(Window.partitionBy("l_returnflag")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum("c").as("n_rows"),
          sum(col("c") * col("rk")).as("sum_rank"), max("ng").as("ng"))
        .select(col("l_returnflag"), col("l_linestatus"), col("n_rows"),
          round(col("sum_rank").cast("double") /
            (col("n_rows") * (col("ng") + 1)).cast("double"), 6)
            .as("mean_qnorm"))
        .orderBy("l_returnflag", "l_linestatus")
    }
    def spQuery(fan: String): DataFrame = {
      val raw = t(spark, sfDir, "lineitem")
        .select(col("l_returnflag").as("g"),
          col("l_quantity").cast("long").as("xv"),
          floor(col("l_extendedprice") * 100).cast("long").as("yv"))
      val base = if (fan == "keyed") spreadBy(raw, col("g"), col("xv"), col("yv")) else raw
      val grid = base.groupBy("g", "xv", "yv").agg(count(lit(1)).as("_c"))
      def withRank(d: DataFrame, vcol: String, out: String): DataFrame = {
        val wLt = Window.partitionBy(col("g")).orderBy(col(vcol))
          .rangeBetween(Window.unboundedPreceding, -1)
        val wEq = Window.partitionBy(col("g")).orderBy(col(vcol))
          .rangeBetween(Window.currentRow, Window.currentRow)
        d.withColumn(out,
          lit(2L) * coalesce(sum(col("_c")).over(wLt), lit(0L)) +
            sum(col("_c")).over(wEq) + lit(1L))
      }
      withRank(withRank(grid, "xv", "rx"), "yv", "ry")
        .groupBy("g")
        .agg(sum("_c").as("n"),
          sum(col("_c") * col("rx")).as("sx"),
          sum(col("_c") * col("ry")).as("sy"),
          sum(col("_c") * col("rx") * col("ry")).as("sxy"),
          sum(col("_c") * col("rx") * col("rx")).as("sxx"),
          sum(col("_c") * col("ry") * col("ry")).as("syy"))
    }
    // pmi refined: freq persisted (tiny, 3 consumers), bi recomputed
    def pmiFreqOnly(): DataFrame = {
      import graft.ext.Affinity._
      val toks = spread(t(spark, sfDir, "documents"))
        .select(col("doc_id"), explode(graft.ext.TextStats.tokens(col("text"))).as("term"))
      val bi = basketItems(toks, col("doc_id"), col("term"))
      val freq = frequentItems(bi, 20).persist()
      val total = bi.select(countDistinct(col("basket")).as("n_docs"))
      pairCounts(bi, freq)
        .filter(col("n_pair") >= 10)
        .join(broadcast(freq.withColumnRenamed("item", "item1")
          .withColumnRenamed("n_item", "n1")), "item1")
        .join(broadcast(freq.withColumnRenamed("item", "item2")
          .withColumnRenamed("n_item", "n2")), "item2")
        .crossJoin(broadcast(total))
        .select(col("item1").as("term1"), col("item2").as("term2"),
          col("n_pair"), col("n1"), col("n2"),
          round(log(col("n_pair").cast("double") * col("n_docs").cast("double") /
            (col("n1") * col("n2")).cast("double")), 6).as("pmi"))
        .orderBy("term1", "term2")
    }
    // prd with ONLY the broadcast hint on the dangling scalar (ckpt kept)
    def prdBcast(): DataFrame = {
      val iters = 3; val d = 0.85
      val e = prdEdges()
      val deg = e.groupBy("src").agg(count(lit(1)).as("out_deg"))
      val nodes = e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id"))).distinct()
      val spine = nodes.join(deg.withColumnRenamed("src", "id"), Seq("id"), "left")
        .select(col("id"), coalesce(col("out_deg"), lit(0L)).as("out_deg"))
      val n = nodes.count()
      var pr = spine.withColumn("pr", lit(1.0 / n))
      for (_ <- 1 to iters) {
        val dangling = broadcast(pr.filter(col("out_deg") === 0L)
          .agg(coalesce(sum("pr"), lit(0.0)).as("dm")))
        val contrib = e
          .join(pr.withColumnRenamed("id", "src"), "src")
          .groupBy(col("dst").as("id"))
          .agg(sum(col("pr") / col("out_deg").cast("double")).as("inflow"))
        pr = spine
          .join(contrib, Seq("id"), "left")
          .crossJoin(dangling)
          .select(col("id"), col("out_deg"),
            (lit((1.0 - d) / n) + lit(d) *
              (coalesce(col("inflow"), lit(0.0)) + col("dm") / n)).as("pr"))
        pr = pr.localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
      }
      pr.select(col("id"), round(col("pr"), 6).as("pr")).orderBy("id")
    }

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "wm_keyed" -> (() => wmQuery("keyed")),
      "wm_none" -> (() => wmQuery("none")),
      "pd_keyed" -> (() => pdQuery("keyed")),
      "pd_none" -> (() => pdQuery("none")),
      "qn_keyed" -> (() => qnQuery("keyed")),
      "qn_none" -> (() => qnQuery("none")),
      "sp_keyed" -> (() => spQuery("keyed")),
      "sp_none" -> (() => spQuery("none")),
      "pmi_freqonly" -> (() => pmiFreqOnly()),
      "prd_bcast" -> (() => prdBcast()),
      "boot_hoist" -> (() => bootQuery(hoist = true)),
      "boot_inline" -> (() => bootQuery(hoist = false)),
      "qsk_keyed" -> (() => qskQuery("keyed")),
      "qsk_rr" -> (() => qskQuery("rr")),
      "qsk_none" -> (() => qskQuery("none")),
      "ar_persist" -> (() => arQuery(persist = true)),
      "ar_nopersist" -> (() => arQuery(persist = false)),
      "pmi_persist" -> (() => pmiQuery(persist = true)),
      "pmi_nopersist" -> (() => pmiQuery(persist = false)),
      "prd_ckpt" -> (() => prdVariant("ckpt")),
      "prd_persist" -> (() => prdVariant("persist")),
      "aa_edges" -> (() => aaEdges()),
      "aa_full" -> (() => aaFull()),
      "rcte" -> (() => SparkEntry.queries("q_recursive_cte")(spark, sfDir)),
      "vo_persist" -> (() => vocabQuery(persist = true)),
      "vo_nopersist" -> (() => vocabQuery(persist = false)),
      "nb_current" -> (() => SparkEntry.queries("q_naive_bayes")(spark, sfDir)),
    ).filter { case (n, _) => filt.forall(_.exists(n.startsWith)) }

    val times = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    (1 to reps).foreach { r =>
      variants.foreach { case (name, mk) =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        times(name) = times(name) :+ dt
        System.err.println(f"[probe] rep $r $name%-14s $dt%.3f s")
      }
    }
    println("== results (min / median over " + reps + " reps) ==")
    variants.foreach { case (name, _) =>
      val xs = times(name).sorted
      println(f"$name%-14s min ${xs.head}%.3f  med ${xs(xs.size / 2)}%.3f")
    }
    spark.stop()
  }
}
