package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.Caching

/** Round-14 interleaved kernel A/B probe (the SCALING.md round-13
  * measurement discipline): named variants of one query's stages run
  * INTERLEAVED in a single JVM (A, B, C, A, B, C, ...) so JIT state
  * and host drift hit every variant equally; each rep is a noop-sink
  * write; min and median of the reps print per variant. Edited
  * in place per experiment — the committed state documents the last
  * experiment run; results land in OPTIMIZATION_r14.md tables.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.ProbeR14 [reps]
  */
object ProbeR14 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
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

    import QueryShared.{spread, t}

    // ---- experiment: q_spearman stage isolation ----------------------
    def base = spread(t(spark, sfDir, "lineitem"))
      .select(col("l_returnflag").as("g"),
        col("l_quantity").cast("long").as("xv"),
        floor(col("l_extendedprice") * 100).cast("long").as("yv"))
    def grid = base.groupBy("g", "xv", "yv").agg(count(lit(1)).as("_c"))
    def ranked = {
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
    }
    def sumsDec = {
      val dec = (c: Column) => c.cast("decimal(38,0)")
      val cDec = dec(col("_c"))
      ranked.groupBy("g")
        .agg(sum("_c").as("n"),
          sum(cDec * dec(col("rx"))).cast("decimal(38,0)").as("sx"),
          sum(cDec * dec(col("ry"))).cast("decimal(38,0)").as("sy"),
          sum(cDec * dec(col("rx")) * dec(col("ry"))).as("sxy"),
          sum(cDec * dec(col("rx")) * dec(col("rx"))).as("sxx"),
          sum(cDec * dec(col("ry")) * dec(col("ry"))).as("syy"))
    }
    def sumsLong = ranked.groupBy("g")
      .agg(sum("_c").as("n"),
        sum(col("_c") * col("rx")).as("sx"),
        sum(col("_c") * col("ry")).as("sy"),
        sum(col("_c") * col("rx") * col("ry")).as("sxy"),
        sum(col("_c") * col("rx") * col("rx")).as("sxx"),
        sum(col("_c") * col("ry") * col("ry")).as("syy"))

    // keyed fan-out: the RR spread exchange is pure overhead ahead of
    // the grid's own hash exchange (the spreadBy lesson)
    def baseK = {
      val raw = t(spark, sfDir, "lineitem")
        .select(col("l_returnflag").as("g"),
          col("l_quantity").cast("long").as("xv"),
          floor(col("l_extendedprice") * 100).cast("long").as("yv"))
      QueryShared.spreadBy(raw, col("g"), col("xv"), col("yv"))
    }
    def gridK = baseK.groupBy("g", "xv", "yv").agg(count(lit(1)).as("_c"))
    def rankedK = {
      def withRank(d: DataFrame, vcol: String, out: String): DataFrame = {
        val wLt = Window.partitionBy(col("g")).orderBy(col(vcol))
          .rangeBetween(Window.unboundedPreceding, -1)
        val wEq = Window.partitionBy(col("g")).orderBy(col(vcol))
          .rangeBetween(Window.currentRow, Window.currentRow)
        d.withColumn(out,
          lit(2L) * coalesce(sum(col("_c")).over(wLt), lit(0L)) +
            sum(col("_c")).over(wEq) + lit(1L))
      }
      withRank(withRank(gridK, "xv", "rx"), "yv", "ry")
    }
    def sumsLongK = rankedK.groupBy("g")
      .agg(sum("_c").as("n"),
        sum(col("_c") * col("rx")).as("sx"),
        sum(col("_c") * col("ry")).as("sy"),
        sum(col("_c") * col("rx") * col("ry")).as("sxy"),
        sum(col("_c") * col("rx") * col("rx")).as("sxx"),
        sum(col("_c") * col("ry") * col("ry")).as("syy"))
    // asymmetric: ry via ONE window on the grid; rx via the tiny
    // (g, xv) axis (150 rows) joined back broadcast
    def asym = {
      val g1 = gridK
      val wLt = Window.partitionBy(col("g")).orderBy(col("yv"))
        .rangeBetween(Window.unboundedPreceding, -1)
      val wEq = Window.partitionBy(col("g")).orderBy(col("yv"))
        .rangeBetween(Window.currentRow, Window.currentRow)
      val ry = g1.withColumn("ry",
        lit(2L) * coalesce(sum(col("_c")).over(wLt), lit(0L)) +
          sum(col("_c")).over(wEq) + lit(1L))
      val ax = g1.groupBy("g", "xv").agg(sum("_c").as("_ac"))
      val wCum = Window.partitionBy(col("g")).orderBy(col("xv"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val rx = ax.withColumn("_end", sum(col("_ac")).over(wCum))
        .select(col("g"), col("xv"),
          (lit(2L) * (col("_end") - col("_ac")) + col("_ac") + lit(1L)).as("rx"))
      ry.join(broadcast(rx), Seq("g", "xv"))
        .groupBy("g")
        .agg(sum("_c").as("n"),
          sum(col("_c") * col("rx")).as("sx"),
          sum(col("_c") * col("ry")).as("sy"),
          sum(col("_c") * col("rx") * col("ry")).as("sxy"),
          sum(col("_c") * col("rx") * col("rx")).as("sxx"),
          sum(col("_c") * col("ry") * col("ry")).as("syy"))
    }

    // ---- experiment 2: q_rouge_overlap stage isolation ---------------
    def docs = spread(t(spark, sfDir, "documents"))
    def rougePairs = docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id").as("cand_id"), (col("doc_id") - 1).as("ref_id"))
      .join(docs.select(col("doc_id").as("ref_id")), "ref_id")
    def rougeToks = docs.select(col("doc_id").as("d"),
      graft.ext.TextStats.tokens(col("text")).as("l"))
    def rougeGrams = rougeToks.select(col("d"), explode(expr(
        """concat(
          |  transform(l, x -> struct(1 AS o, x AS g)),
          |  zip_with(slice(l, 1, greatest(size(l) - 1, 0)),
          |           slice(l, 2, greatest(size(l) - 1, 0)),
          |           (x, y) -> struct(2 AS o, concat(x, ' ', y) AS g)))""".stripMargin))
        .as("og"))
      .select(col("d"), col("og.o").as("o"), col("og.g").as("g"))
      .groupBy("d", "o", "g").agg(count(lit(1)).as("c"))
    def rougeFull = graft.ext.Corpus.rougeOverlap(docs, rougePairs)

    // ---- experiment 3 (VERDICT #6): poisson-bootstrap when-chain fold —
    // does the 26-branch foldRight over the computed mixer `u`
    // re-evaluate u per branch (the round-12 reduce(when) trap), or
    // does codegen CSE hoist it? A/B: inline fold (current library
    // shape) vs u materialized once in a prior projection.
    def bootBase = t(spark, sfDir, "lineitem")
      .select(col("l_returnflag"),
        concat(col("l_orderkey"), lit("-"), col("l_linenumber")).as("rk"),
        floor(col("l_extendedprice") * 100).cast("long").as("xc"))
      .withColumn("h", conv(substring(md5(col("rk")), 1, 8), 16, 10).cast("long"))
      .select(col("l_returnflag"), col("xc"), col("h"),
        explode(sequence(lit(0), lit(49))).as("rep"))
    val cuts: Seq[Long] = { // Poisson(1) CDF in micro-units, k = 0..9
      val e = math.exp(-1.0)
      var c = 0.0; var f = 1.0
      (0 to 9).map { k =>
        if (k > 0) f *= k
        c += e / f
        math.min(999999L, math.round(c * 1e6))
      }
    }
    def mixU: Column = {
      val s = (col("h") + col("rep") * lit(2654435761L)) % lit(4294967296L)
      val u1 = (s * lit(1597334677L)) % lit(4294967296L)
      ((u1 * lit(1812433253L)) % lit(4294967296L)) % lit(1000000L)
    }
    def foldW(u: Column): Column = cuts.zipWithIndex
      .foldRight(lit(cuts.length.toLong)) { case ((cut, k), rest) =>
        when(u < cut, k.toLong).otherwise(rest)
      }
    def bootInline = bootBase.withColumn("w", foldW(mixU))
      .groupBy("l_returnflag", "rep")
      .agg(sum(col("w") * col("xc")).as("swx"), sum("w").as("sw"))
    def bootHoisted = bootBase.withColumn("u", mixU)
      .withColumn("w", foldW(col("u")))
      .groupBy("l_returnflag", "rep")
      .agg(sum(col("w") * col("xc")).as("swx"), sum("w").as("sw"))

    // ---- experiment 4: q_kcore stage isolation ------------------------
    def kcoreEdges = QueryShared.coPurchaseEdges(spark, sfDir, minCount = 1)
    def kcoreFull = {
      val e = kcoreEdges.persist()
      val out = graft.ext.Graph.kCorePeel(e, k = 90, rounds = 3)
      Caching.unpersistAfterUse(out, e)
    }

    // ---- experiment 5: spread() RR vs deterministic-hash fan-out ------
    // RoundRobinPartitioning pays a local sort of the whole (single-
    // split) input before splitting (SPARK-23207, sortBeforeRepartition
    // — needed so retried tasks reproduce the assignment); a
    // deterministic hash of the row needs no sort and is retry-safe by
    // construction (guide §2.5). A/B over lineitem and events.
    def li600k = t(spark, sfDir, "lineitem")
    def evts = t(spark, sfDir, "events")
    def rrSpread(df: DataFrame) =
      df.repartition(spark.sparkContext.defaultParallelism)
    def hashSpread(df: DataFrame) =
      df.repartition(spark.sparkContext.defaultParallelism,
        xxhash64(df.columns.map(col): _*))
    def aggAfter(df: DataFrame) = df.groupBy("l_returnflag")
      .agg(count(lit(1)), sum("l_quantity"))
    def aggAfterE(df: DataFrame) = df.groupBy("event_type")
      .agg(count(lit(1)), sum("value"))

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "li_rr" -> (() => aggAfter(rrSpread(li600k))),
      "li_hash" -> (() => aggAfter(hashSpread(li600k))),
      "ev_rr" -> (() => aggAfterE(rrSpread(evts))),
      "ev_hash" -> (() => aggAfterE(hashSpread(evts))),
      "kcore_full" -> (() => kcoreFull))

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
