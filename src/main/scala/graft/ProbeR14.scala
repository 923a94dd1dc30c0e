package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "docs_scan" -> (() => docs),
      "pairs" -> (() => rougePairs),
      "toks" -> (() => rougeToks),
      "grams" -> (() => rougeGrams),
      "rouge_full" -> (() => rougeFull),
      "spearman_full" -> (() => sumsDec))

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
