package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Baseline time-series forecasting: the seasonal-naive backtest.
  *
  * Seasonal naive (ŷ_t = y_{t−season}) is the forecast every serious
  * pipeline measures candidates AGAINST — producing it and its error
  * profile is a one-window operation, so it belongs in the engine while
  * model fitting does not. The window is keyed by the series id: one
  * shuffle on a (usually high-cardinality) series key, per-key sort
  * over the series' periods — the same scale shape as the lag/diff
  * series operators in [[graft.qcew.Series]].
  *
  * Callers hand in an integral measure (quantize floats first), so
  * errors and their sums are exact longs; MAE/MAPE become single
  * divisions of exact sums, rounded once.
  */
object Forecast {

  /** Per-period forecast rows: actual, seasonal-naive forecast, and
    * absolute error, for periods where a forecast exists (t ≥ season).
    * `period` must be an integral, gap-free period index within each
    * series (e.g. year·4 + quarter).
    */
  def seasonalNaive(df: DataFrame, series: Seq[String], period: Column,
      y: Column, season: Int): DataFrame = {
    val w = Window.partitionBy(series.map(col): _*).orderBy("period")
    df.select(series.map(col) :+ period.cast("long").as("period")
        :+ y.cast("long").as("y"): _*)
      .withColumn("forecast", lag("y", season).over(w))
      .filter(col("forecast").isNotNull)
      .withColumn("abs_err", abs(col("y") - col("forecast")))
  }

  /** CUSUM mean-shift changepoint detection over ONE global integral
    * series: the cumulative-sum statistic C_t = S_t − t·(S/N) (the
    * running deviation of the prefix sum from its expected share)
    * peaks at the point where the series mean shifts; the argmax of
    * |C_t| is the classic single-changepoint estimate. Multiplying by
    * N clears the division: emitted `cusum_n` = N·S_t − t·S is EXACT
    * integer arithmetic end to end, so the argmax (|cusum_n| desc,
    * then ord asc — a total tie-break) is bit-deterministic on any
    * engine or partitioning. `mean_dev` = C_t/N in series units is
    * the one final division.
    *
    * Output: one row (ord, t, n, cusum_n, mean_dev) — t = the 1-based
    * position of the argmax, n = the series length N (kept so a caller
    * can recover C_t = cusum_n/n without a second pass).
    *
    * Scale shape: caller aggregates to the series grid first; one
    * global-window prefix sum over grid cells (the [[Inference.ksTest]]
    * CDF shape) + a broadcast one-row total. Overflow: N·S_t < 2⁶³ —
    * with S ≤ N·y_max that is N²·y_max, safe past a 10⁶-cell grid of
    * 10⁹-sized values.
    */
  def cusumChangepoint(series: DataFrame, ord: Column, y: Column): DataFrame = {
    val base = series.select(ord.as("ord"), y.cast("long").as("y"))
    val wCum = Window.orderBy("ord")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = base.agg(count(lit(1)).as("n"), sum("y").as("s"))
    base
      .select(col("ord"),
        row_number().over(Window.orderBy("ord")).cast("long").as("t"),
        sum("y").over(wCum).as("st"))
      .crossJoin(broadcast(totals))
      .select(col("ord"), col("t"), col("n"),
        (col("n") * col("st") - col("t") * col("s")).as("cusum_n"))
      .withColumn("mean_dev",
        round(col("cusum_n").cast("double") / col("n").cast("double"), 6))
      .orderBy(abs(col("cusum_n")).desc, col("ord").asc)
      .limit(1)
  }

  /** Backtest summary per series: evaluation count, MAE, and MAPE (in
    * percent, over periods with nonzero actuals) of the seasonal-naive
    * forecast. One additional map-side-combined aggregate over
    * [[seasonalNaive]] output.
    */
  def seasonalNaiveBacktest(df: DataFrame, series: Seq[String], period: Column,
      y: Column, season: Int): DataFrame =
    seasonalNaive(df, series, period, y, season)
      .groupBy(series.map(col): _*)
      .agg(count(lit(1)).as("n_eval"),
        round(sum("abs_err").cast("double") / count(lit(1)).cast("double"), 6)
          .as("mae"),
        round(avg(when(col("y") =!= 0,
          col("abs_err").cast("double") / abs(col("y")).cast("double") * 100)), 6)
          .as("mape_pct"))

  /** Theil–Sen robust trend estimator per series: the (discrete lower)
    * median of all pairwise slopes (y_j − y_i)/(x_j − x_i), i < j — the
    * classic outlier-resistant alternative to least-squares slope
    * (breakdown point ≈ 29%, vs 0 for OLS: one corrupted period cannot
    * move it). Inputs are integral by contract (quantize floats first),
    * so every slope is ONE IEEE division of exact longs — bit-identical
    * cross-engine — and the median is an actual data value picked by a
    * total order (slope, x1, x2), never an interpolation: drift-free.
    *
    * Scale shape: the caller aggregates the fact table to the per-series
    * grid FIRST (same contract as [[cusumChangepoint]] /
    * [[Inference.autocorr]]), so the O(m²) pair space is over grid
    * cells (m = periods per series, bounded), not rows. The self-join
    * and the ranking window share the series-key partitioning: one
    * shuffle. For very long series (m > ~10⁴) sample pairs per series
    * (Theil's incomplete estimator) — the median of a uniform pair
    * sample converges at the same rate.
    */
  def theilSen(series: DataFrame, keys: Seq[String], x: Column, y: Column): DataFrame = {
    val base = series.select(keys.map(col) :+ x.cast("long").as("x")
      :+ y.cast("long").as("y"): _*)
    val a = base.select(keys.map(col) :+ col("x").as("x1") :+ col("y").as("y1"): _*)
    val b = base.select(keys.map(k => col(k).as(s"${k}_b"))
      :+ col("x").as("x2") :+ col("y").as("y2"): _*)
    val cond = keys.map(k => col(k) === col(s"${k}_b")).reduce(_ && _) &&
      col("x1") < col("x2")
    val pairs = a.join(b, cond)
      .select(keys.map(col) :+ col("x1") :+ col("x2")
        :+ ((col("y2") - col("y1")).cast("double") /
            (col("x2") - col("x1")).cast("double")).as("slope"): _*)
    val wRank = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("slope"), col("x1"), col("x2"))
    val wAll = Window.partitionBy(keys.map(col): _*)
    pairs
      .withColumn("rn", row_number().over(wRank))
      .withColumn("np", count(lit(1)).over(wAll))
      .filter(col("rn") === ((col("np") + lit(1)) / lit(2)).cast("long"))
      .select(keys.map(col) :+ col("np").as("n_pairs")
        :+ round(col("slope"), 6).as("ts_slope"): _*)
  }

  /** Mann–Kendall trend test per series: S = Σ_{i<j} sign(y_j − y_i)
    * over the time-ordered grid — the nonparametric companion to
    * [[theilSen]] (same pair space; M-K answers IS there a monotone
    * trend, Theil–Sen answers how steep). S and the pair count are
    * exact longs; Kendall's tau-a ships as integer parts-per-billion
    * (truncated division — matching the oracle's `//` on the same
    * operands), so the gate carries no float at all. Ties contribute
    * sign 0, the standard tau-a treatment.
    *
    * Scale contract: callers pass the AGGREGATED series grid
    * ([[cusumChangepoint]] / [[Inference.autocorr]] contract), so the
    * O(m²) pair space is over bounded grid cells; the self-join and
    * both aggregates share the series-key partitioning. For very long
    * series, the same incomplete-pair sampling note as [[theilSen]]
    * applies — and it binds HARD here: `tau_ppb` computes
    * `s_stat · 10⁹` in long arithmetic, which wraps past |S| ≈ 9.2·10⁹
    * (a ~135k-point series), so grids must stay below that — far past
    * any calendar grid, and the O(m²) pair join is prohibitive well
    * before the overflow anyway.
    */
  def mannKendall(series: DataFrame, keys: Seq[String], x: Column, y: Column): DataFrame = {
    val base = series.select(keys.map(col) :+ x.cast("long").as("x")
      :+ y.cast("long").as("y"): _*)
    val a = base.select(keys.map(col) :+ col("x").as("x1") :+ col("y").as("y1"): _*)
    val b = base.select(keys.map(k => col(k).as(s"${k}_b"))
      :+ col("x").as("x2") :+ col("y").as("y2"): _*)
    val cond = keys.map(k => col(k) === col(s"${k}_b")).reduce(_ && _) &&
      col("x1") < col("x2")
    val sgn = when(col("y2") > col("y1"), 1L)
      .when(col("y2") < col("y1"), -1L).otherwise(0L)
    val s = a.join(b, cond)
      .select(keys.map(col) :+ sgn.as("sgn"): _*)
      .groupBy(keys.map(col): _*)
      .agg(sum("sgn").as("s_stat"), count(lit(1)).as("n_pairs"))
    val n = base.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n_points"))
    n.join(s, keys)
      .select(keys.map(col) :+ col("n_points") :+ col("s_stat") :+
        expr("(s_stat * CAST(1000000000 AS BIGINT)) div n_pairs").as("tau_ppb") :+
        when(col("s_stat") > 0, "increasing")
          .when(col("s_stat") < 0, "decreasing")
          .otherwise("none").as("trend"): _*)
  }

  // ====================================================================
  // Chunked (segmented-scan) folds for LONG sequential-state series.
  //
  // The collected fold (q_ewma/q_holt: collect_list + aggregate HOF)
  // holds ONE WHOLE SERIES per task — fine for daily grids, fatal for a
  // years-long per-key series at second resolution (SCALING.md's stated
  // limit). These variants decompose the linear recurrence into the
  // classic two-level scan:
  //
  //   1. split each series into chunks of `chunkSize` consecutive
  //      points (one row_number window: sorted, SPILLABLE — never
  //      collected whole);
  //   2. summarize each chunk as the AFFINE MAP the recurrence applies
  //      to incoming state (EWMA: s_out = A·s_in + B with
  //      A = (1−α)^n; Holt: 2×2 matrix + 2-vector), computed by one
  //      in-chunk fold;
  //   3. fold the per-series chunk summaries in order (len/C structs)
  //      to get each chunk's incoming boundary state;
  //   4. join boundaries back (co-partitioned on key+chunk) and re-run
  //      the plain sequential fold INSIDE each chunk from its boundary
  //      state, emitting per-point values.
  //
  // Per-task memory is O(chunkSize) for steps 2/4 and O(len/chunkSize)
  // for step 3 — √len when chunkSize ≈ √len — instead of O(len). The
  // price is bit-exactness: composing A·s_in + B reassociates the IEEE
  // op sequence at chunk boundaries, so values can differ from the
  // collected fold in the last ~couple of ulps (ForecastChunkedSpec
  // gates agreement to 1e-9 relative and round-6 equality on the real
  // testdata). Works for ANY recurrence linear in its state; the
  // first-element init convention (s₁=y₁; Holt l₁=y₁, b₁=0) is kept by
  // folding chunk 0 directly with the plain convention.
  // ====================================================================

  import org.apache.spark.sql.types._

  private def emptyAcc(fields: (String, DataType)*): Column =
    array().cast(ArrayType(StructType(
      fields.map { case (n, t) => StructField(n, t) })))

  /** [[ewmaChunked]]'s collected-form twin, for callers and the
    * equivalence gate: the q_ewma fold (s₁=y₁; sᵢ=α·yᵢ+(1−α)·sᵢ₋₁) as
    * a library function. One shuffle on `keys`; holds one series per
    * task. Returns keys ++ (ord, y, ewma), ewma unrounded.
    */
  def ewma(points: DataFrame, keys: Seq[String], ordCol: String, yCol: String,
           alpha: Double): DataFrame = {
    val ordType = points.schema(ordCol).dataType
    val kcols = keys.map(col)
    val merge = (acc: Column, p: Column) => array_append(acc, struct(
      p.getField("o").as("o"), p.getField("y").as("y"),
      when(size(acc) === 0, p.getField("y"))
        .otherwise(lit(alpha) * p.getField("y") +
          lit(1.0 - alpha) * element_at(acc, -1).getField("s")).as("s")))
    points
      .groupBy(kcols: _*)
      .agg(sort_array(collect_list(struct(
        col(ordCol).as("o"), col(yCol).cast("double").as("y")))).as("pts"))
      .select(kcols :+ explode(aggregate(col("pts"),
        emptyAcc("o" -> ordType, "y" -> DoubleType, "s" -> DoubleType),
        merge)).as("r"): _*)
      .select(kcols ++ Seq(col("r.o").as(ordCol), col("r.y").as(yCol),
        col("r.s").as("ewma")): _*)
  }

  /** Chunked EWMA — the long-series fallback (see the section comment
    * above for the decomposition and memory bound). Same contract as
    * [[ewma]]; `chunkSize` bounds per-task array length. A deployment
    * sizes chunkSize ≈ √(max series length); the q_ewma_chunked gate
    * runs it at a chunkSize small enough that every series spans many
    * chunks, so the boundary-composition path is what's being graded.
    */
  def ewmaChunked(points: DataFrame, keys: Seq[String], ordCol: String,
                  yCol: String, alpha: Double, chunkSize: Int): DataFrame = {
    require(chunkSize >= 2, "chunkSize must be at least 2")
    val a = alpha; val om = 1.0 - alpha
    val ordType = points.schema(ordCol).dataType
    val kcols = keys.map(col)
    // tie-break on the value too: chunk MEMBERSHIP must follow the
    // exact (o, y) total order sort_array gives the per-chunk fold, or
    // duplicate ords could split a tie group across chunks in
    // run-dependent order and diverge from the collected twin
    val w = Window.partitionBy(kcols: _*)
      .orderBy(col(ordCol), col("_y"))
    // row_number is int and non-negative, so truncating div == floor div
    val chunked = points
      .select(kcols ++ Seq(col(ordCol),
        col(yCol).cast("double").as("_y")): _*)
      .withColumn("_chunk",
        ((row_number().over(w) - 1) / chunkSize).cast("long"))

    // step 2: per-chunk sorted points + affine summary (A, B).
    // Chunk 0 has no incoming state: A=0 and B = the plain fold with
    // the s₁=y₁ convention, so the uniform rule s_out = A·s_in + B
    // holds for every chunk.
    val foldStep = (acc: Column, p: Column) =>
      lit(a) * p.getField("y") + lit(om) * acc
    val chunks = chunked
      .groupBy((kcols :+ col("_chunk")): _*)
      .agg(sort_array(collect_list(
        struct(col(ordCol).as("o"), col("_y").as("y")))).as("pts"))
    val summaries = chunks.select(kcols ++ Seq(col("_chunk"),
      when(col("_chunk") === 0, lit(0.0))
        .otherwise(pow(lit(om), size(col("pts")))).as("_A"),
      when(col("_chunk") === 0,
        aggregate(slice(col("pts"), lit(2), size(col("pts")) - 1),
          element_at(col("pts"), 1).getField("y"), foldStep))
        .otherwise(aggregate(col("pts"), lit(0.0), foldStep)).as("_B")): _*)

    // step 3: per-series ordered fold over the len/C chunk summaries →
    // each chunk's incoming boundary state
    val boundMerge = (acc: Column, p: Column) => {
      val sPrev = when(size(acc) === 0, lit(0.0))
        .otherwise(element_at(acc, -1).getField("sout"))
      array_append(acc, struct(
        p.getField("c").as("c"), sPrev.as("sin"),
        (p.getField("a") * sPrev + p.getField("b")).as("sout")))
    }
    val bounds = summaries
      .groupBy(kcols: _*)
      .agg(sort_array(collect_list(struct(col("_chunk").as("c"),
        col("_A").as("a"), col("_B").as("b")))).as("cs"))
      .select(kcols :+ explode(aggregate(col("cs"),
        emptyAcc("c" -> LongType, "sin" -> DoubleType, "sout" -> DoubleType),
        boundMerge)).as("bd"): _*)
      .select(kcols ++ Seq(col("bd.c").as("_chunk"),
        col("bd.sin").as("_sin")): _*)

    // step 4: boundary states join back on (keys, chunk) — both sides
    // just shuffled on key-derived columns — and the plain sequential
    // fold re-runs inside each chunk from its boundary state
    val emitMerge = (acc: Column, p: Column) => array_append(acc, struct(
      p.getField("o").as("o"), p.getField("y").as("y"),
      when(size(acc) === 0,
        when(col("_chunk") === 0, p.getField("y"))
          .otherwise(lit(a) * p.getField("y") + lit(om) * col("_sin")))
        .otherwise(lit(a) * p.getField("y") +
          lit(om) * element_at(acc, -1).getField("s")).as("s")))
    chunks.join(bounds, keys :+ "_chunk")
      .select(kcols :+ explode(aggregate(col("pts"),
        emptyAcc("o" -> ordType, "y" -> DoubleType, "s" -> DoubleType),
        emitMerge)).as("r"): _*)
      .select(kcols ++ Seq(col("r.o").as(ordCol), col("r.y").as(yCol),
        col("r.s").as("ewma")): _*)
  }

  /** Chunked Holt double exponential smoothing (level + trend) — the
    * 2-state instance of the segmented-scan decomposition. Per step
    * the state is affine: [l,b]' = M·[l,b] + y·v with
    * M = [[1−α, 1−α], [−αβ, 1−αβ]], v = [α, αβ]; a chunk composes to
    * one (2×2 matrix, 2-vector) pair folded element-by-element
    * ((M,c) ← (S·M, S·c + y·v)), boundaries fold over those, and the
    * plain q_holt recurrence re-runs inside each chunk from its
    * boundary (l, b). Init convention l₁=y₁, b₁=0 lives in chunk 0
    * exactly as [[ewmaChunked]] handles s₁=y₁.
    *
    * Returns keys ++ (ord, y, level, trend), unrounded.
    */
  def holtChunked(points: DataFrame, keys: Seq[String], ordCol: String,
                  yCol: String, alpha: Double, beta: Double,
                  chunkSize: Int): DataFrame = {
    require(chunkSize >= 2, "chunkSize must be at least 2")
    val ordType = points.schema(ordCol).dataType
    val kcols = keys.map(col)
    // (o, y) tie order for chunk membership — same reason as ewmaChunked
    val w = Window.partitionBy(kcols: _*)
      .orderBy(col(ordCol), col("_y"))
    val chunked = points
      .select(kcols ++ Seq(col(ordCol),
        col(yCol).cast("double").as("_y")): _*)
      .withColumn("_chunk",
        ((row_number().over(w) - 1) / chunkSize).cast("long"))
    val chunks = chunked
      .groupBy((kcols :+ col("_chunk")): _*)
      .agg(sort_array(collect_list(
        struct(col(ordCol).as("o"), col("_y").as("y")))).as("pts"))

    // step matrix entries (literals folded at plan time)
    val (m11, m12) = (lit(1.0 - alpha), lit(1.0 - alpha))
    val (m21, m22) = (lit(-alpha * beta), lit(1.0 - alpha * beta))
    val (v1, v2) = (lit(alpha), lit(alpha * beta))

    // chunk summary: compose per-element affine steps into (M, c);
    // identity seed. For chunk 0, fold (l, b) directly with the
    // l₁=y₁, b₁=0 convention — its summary is the CONSTANT map
    // (M=0, c=final state).
    val affSeed = struct(lit(1.0).as("a11"), lit(0.0).as("a12"),
      lit(0.0).as("a21"), lit(1.0).as("a22"),
      lit(0.0).as("c1"), lit(0.0).as("c2"))
    val affMerge = (acc: Column, p: Column) => {
      val y = p.getField("y")
      struct(
        (m11 * acc.getField("a11") + m12 * acc.getField("a21")).as("a11"),
        (m11 * acc.getField("a12") + m12 * acc.getField("a22")).as("a12"),
        (m21 * acc.getField("a11") + m22 * acc.getField("a21")).as("a21"),
        (m21 * acc.getField("a12") + m22 * acc.getField("a22")).as("a22"),
        (m11 * acc.getField("c1") + m12 * acc.getField("c2") + y * v1).as("c1"),
        (m21 * acc.getField("c1") + m22 * acc.getField("c2") + y * v2).as("c2"))
    }
    // the q_holt per-step recurrence on a (l, b) struct accumulator,
    // shared by the chunk-0 summary and the per-point emission
    def holtStep(lPrev: Column, bPrev: Column, y: Column): (Column, Column) = {
      val lNew = lit(alpha) * y + lit(1.0 - alpha) * (lPrev + bPrev)
      val bNew = lit(beta) * (lNew - lPrev) + lit(1.0 - beta) * bPrev
      (lNew, bNew)
    }
    val lbSeed = struct(lit(0.0).as("l"), lit(0.0).as("b"),
      lit(false).as("init"))
    val lbMerge = (acc: Column, p: Column) => {
      val (lN, bN) = holtStep(acc.getField("l"), acc.getField("b"),
        p.getField("y"))
      struct(
        when(!acc.getField("init"), p.getField("y")).otherwise(lN).as("l"),
        when(!acc.getField("init"), lit(0.0)).otherwise(bN).as("b"),
        lit(true).as("init"))
    }
    val zeroMap = Seq("a11", "a12", "a21", "a22")
      .map(n => lit(0.0).as(n))
    val summaries = chunks.select(kcols ++ Seq(col("_chunk"),
      when(col("_chunk") === 0, {
        val lb = aggregate(col("pts"), lbSeed, lbMerge)
        struct(zeroMap ++ Seq(lb.getField("l").as("c1"),
          lb.getField("b").as("c2")): _*)
      }).otherwise(aggregate(col("pts"), affSeed, affMerge)).as("_m")): _*)

    // boundary fold: out = M·in + c per chunk, in order
    val boundMerge = (acc: Column, p: Column) => {
      val m = p.getField("m")
      val lin = when(size(acc) === 0, lit(0.0))
        .otherwise(element_at(acc, -1).getField("lout"))
      val bin = when(size(acc) === 0, lit(0.0))
        .otherwise(element_at(acc, -1).getField("bout"))
      array_append(acc, struct(
        p.getField("c").as("c"), lin.as("lin"), bin.as("bin"),
        (m.getField("a11") * lin + m.getField("a12") * bin +
          m.getField("c1")).as("lout"),
        (m.getField("a21") * lin + m.getField("a22") * bin +
          m.getField("c2")).as("bout")))
    }
    val bounds = summaries
      .groupBy(kcols: _*)
      .agg(sort_array(collect_list(struct(col("_chunk").as("c"),
        col("_m").as("m")))).as("cs"))
      .select(kcols :+ explode(aggregate(col("cs"),
        emptyAcc("c" -> LongType, "lin" -> DoubleType, "bin" -> DoubleType,
          "lout" -> DoubleType, "bout" -> DoubleType),
        boundMerge)).as("bd"): _*)
      .select(kcols ++ Seq(col("bd.c").as("_chunk"),
        col("bd.lin").as("_lin"), col("bd.bin").as("_bin")): _*)

    // per-point emission from the boundary state
    val emitMerge = (acc: Column, p: Column) => {
      val first = size(acc) === 0
      val lPrev = when(first, col("_lin"))
        .otherwise(element_at(acc, -1).getField("l"))
      val bPrev = when(first, col("_bin"))
        .otherwise(element_at(acc, -1).getField("b"))
      val (lN, bN) = holtStep(lPrev, bPrev, p.getField("y"))
      array_append(acc, struct(
        p.getField("o").as("o"), p.getField("y").as("y"),
        when(first && col("_chunk") === 0, p.getField("y"))
          .otherwise(lN).as("l"),
        when(first && col("_chunk") === 0, lit(0.0))
          .otherwise(bN).as("b")))
    }
    chunks.join(bounds, keys :+ "_chunk")
      .select(kcols :+ explode(aggregate(col("pts"),
        emptyAcc("o" -> ordType, "y" -> DoubleType,
          "l" -> DoubleType, "b" -> DoubleType),
        emitMerge)).as("r"): _*)
      .select(kcols ++ Seq(col("r.o").as(ordCol), col("r.y").as(yCol),
        col("r.l").as("level"), col("r.b").as("trend")): _*)
  }

  /** One additive Holt–Winters step on the flat state array
    * [l, b, r1..r_period] (ring head at index 3, tail = the
    * just-updated seasonal): the exact op order of the q_holt_winters
    * fold and its oracle —
    *   l' = α(y − r1) + (1−α)(l + b);  b' = β(l' − l) + (1−β)b;
    *   s' = γ(y − l') + (1−γ)r1;      ring' = [r2.., s'].
    */
  private def hwStep(st: Column, y: Column, alpha: Double, beta: Double,
      gamma: Double, period: Int): Column = {
    val l = element_at(st, 1); val b = element_at(st, 2)
    val r1 = element_at(st, 3)
    val lN = lit(alpha) * (y - r1) + lit(1.0 - alpha) * (l + b)
    val bN = lit(beta) * (lN - l) + lit(1.0 - beta) * b
    val sN = lit(gamma) * (y - lN) + lit(1.0 - gamma) * r1
    concat(array(lN, bN), slice(st, 4, period - 1), array(sN))
  }

  /** Chunked additive Holt–Winters (level + trend + seasonal ring) —
    * the (period+2)-state instance of the segmented-scan decomposition,
    * closing the fold-family's last collect-whole-series hole
    * (round-8 verdict item 3). Unlike [[holtChunked]]'s hand-written
    * 2×2 matrix, the chunk summary here is computed by BASIS
    * PROPAGATION: the per-step map is affine (state' = M·state + y·v),
    * so one in-chunk fold carries d+1 = period+3 state vectors — the
    * image of the zero state under the real inputs (the constant term)
    * plus the homogeneous (y = 0) images of the d basis vectors (the
    * columns of the chunk's composed matrix). Boundary states then
    * fold over len/C summaries via out = c + Σ inᵢ·Mᵢ, and the plain
    * sequential recurrence re-runs INSIDE each chunk from its boundary
    * — identical shuffle/memory shape to [[ewmaChunked]]: O(chunkSize·
    * period) per task for steps 2/4, O(period²·len/chunkSize) for the
    * boundary fold. Init convention (l₁=y₁, b₁=0, ring=0s) lives in
    * chunk 0 whose summary is the constant map. Same reassociation
    * caveat as the section comment; ForecastChunkedSpec gates 1e-9
    * relative agreement with the sequential fold.
    *
    * Returns keys ++ (ord, y, level, trend, seasonal, forecast_next)
    * unrounded, forecast_next = l + b + ring head (the q_holt_winters
    * display contract).
    */
  def holtWintersChunked(points: DataFrame, keys: Seq[String], ordCol: String,
      yCol: String, alpha: Double, beta: Double, gamma: Double,
      period: Int, chunkSize: Int): DataFrame = {
    require(chunkSize >= 2, "chunkSize must be at least 2")
    require(period >= 2, "period must be at least 2")
    val d = period + 2
    val ordType = points.schema(ordCol).dataType
    val kcols = keys.map(col)
    val w = Window.partitionBy(kcols: _*)
      .orderBy(col(ordCol), col("_y")) // (o, y) tie order, as ewmaChunked
    val chunked = points
      .select(kcols ++ Seq(col(ordCol),
        col(yCol).cast("double").as("_y")): _*)
      .withColumn("_chunk",
        ((row_number().over(w) - 1) / chunkSize).cast("long"))
    val chunks = chunked
      .groupBy((kcols :+ col("_chunk")): _*)
      .agg(sort_array(collect_list(
        struct(col(ordCol).as("o"), col("_y").as("y")))).as("pts"))

    def step(st: Column, y: Column): Column =
      hwStep(st, y, alpha, beta, gamma, period)
    def initState(y: Column): Column =
      concat(array(y, lit(0.0)), array_repeat(lit(0.0), period))

    // chunk summary: element 1 = constant term (zero state folded with
    // the real inputs), elements 2..d+1 = homogeneous basis images
    val basisSeed: Column = concat(
      array(array_repeat(lit(0.0), d)),
      transform(sequence(lit(1), lit(d)), i =>
        transform(sequence(lit(1), lit(d)), j =>
          when(j === i, lit(1.0)).otherwise(lit(0.0)))))
    val sumMerge = (acc: Column, p: Column) =>
      transform(acc, (st, i) =>
        when(i === 0, step(st, p.getField("y")))
          .otherwise(step(st, lit(0.0))))
    val zeroBasis = transform(sequence(lit(1), lit(d)),
      _ => array_repeat(lit(0.0), d))
    val summaries = chunks.select(kcols ++ Seq(col("_chunk"),
      when(col("_chunk") === 0, concat(
        array(aggregate(slice(col("pts"), lit(2), size(col("pts")) - 1),
          initState(element_at(col("pts"), 1).getField("y")),
          (st: Column, p: Column) => step(st, p.getField("y")))),
        zeroBasis))
        .otherwise(aggregate(col("pts"), basisSeed, sumMerge)).as("_m")): _*)

    // boundary fold: out = c + Σ in_i · column_i, element by element
    def applyAff(sm: Column, in: Column): Column =
      transform(sequence(lit(1), lit(d)), j =>
        element_at(element_at(sm, 1), j) +
          aggregate(sequence(lit(1), lit(d)), lit(0.0),
            (acc: Column, i: Column) =>
              acc + element_at(in, i) * element_at(element_at(sm, i + 1), j)))
    val boundMerge = (acc: Column, p: Column) => {
      val prev = when(size(acc) === 0, array_repeat(lit(0.0), d))
        .otherwise(element_at(acc, -1).getField("sout"))
      array_append(acc, struct(p.getField("c").as("c"), prev.as("sin"),
        applyAff(p.getField("m"), prev).as("sout")))
    }
    val bounds = summaries
      .groupBy(kcols: _*)
      .agg(sort_array(collect_list(struct(col("_chunk").as("c"),
        col("_m").as("m")))).as("cs"))
      .select(kcols :+ explode(aggregate(col("cs"),
        emptyAcc("c" -> LongType, "sin" -> ArrayType(DoubleType),
          "sout" -> ArrayType(DoubleType)),
        boundMerge)).as("bd"): _*)
      .select(kcols ++ Seq(col("bd.c").as("_chunk"),
        col("bd.sin").as("_sin")): _*)

    // per-point emission: sequential recurrence from the boundary state
    val emitMerge = (acc: Column, p: Column) => {
      val first = size(acc) === 0
      val st = when(first,
          when(col("_chunk") === 0, initState(p.getField("y")))
            .otherwise(step(col("_sin"), p.getField("y"))))
        .otherwise(step(element_at(acc, -1).getField("st"),
          p.getField("y")))
      array_append(acc, struct(p.getField("o").as("o"),
        p.getField("y").as("y"), st.as("st")))
    }
    chunks.join(bounds, keys :+ "_chunk")
      .select(kcols :+ explode(aggregate(col("pts"),
        emptyAcc("o" -> ordType, "y" -> DoubleType,
          "st" -> ArrayType(DoubleType)),
        emitMerge)).as("r"): _*)
      .select(kcols ++ Seq(col("r.o").as(ordCol), col("r.y").as(yCol),
        element_at(col("r.st"), 1).as("level"),
        element_at(col("r.st"), 2).as("trend"),
        element_at(col("r.st"), d).as("seasonal"),
        (element_at(col("r.st"), 1) + element_at(col("r.st"), 2) +
          element_at(col("r.st"), 3)).as("forecast_next")): _*)
  }

  /** Chunked two-sided CUSUM over EXACT LONG per-step deviations — the
    * long-series fallback for the q_cusum fold, and the one member of
    * the chunked family that is BIT-exact (no IEEE reassociation):
    * the per-step map s ↦ max(0, s + d) lives in the max-plus
    * semiring, where maps of the form s ↦ max(A, s + B) compose
    * CLOSED — (A₁,B₁) then (A₂,B₂) = (max(A₂, A₁+B₂), B₁+B₂) — so a
    * chunk summarizes to one exact (A, B) long pair per statistic,
    * boundaries fold via s_out = max(A, s_in + B), and the plain
    * recurrence re-runs inside each chunk. Chunk 0 needs no special
    * case: the start state is 0 and the composed map applied to 0 IS
    * the fold. Same O(√len) memory shape as [[ewmaChunked]].
    *
    * Input: one row per step with long columns `dPosCol` / `dNegCol`
    * (the already-scaled S⁺/S⁻ increments). Returns keys ++ (ord, tp,
    * tn) — exact longs, equal bit-for-bit to the sequential fold.
    */
  def cusumChunked(points: DataFrame, keys: Seq[String], ordCol: String,
      dPosCol: String, dNegCol: String, chunkSize: Int): DataFrame = {
    require(chunkSize >= 2, "chunkSize must be at least 2")
    val ordType = points.schema(ordCol).dataType
    val kcols = keys.map(col)
    val w = Window.partitionBy(kcols: _*)
      .orderBy(col(ordCol), col("_dp"), col("_dn"))
    val chunked = points
      .select(kcols ++ Seq(col(ordCol),
        col(dPosCol).cast("long").as("_dp"),
        col(dNegCol).cast("long").as("_dn")): _*)
      .withColumn("_chunk",
        ((row_number().over(w) - 1) / chunkSize).cast("long"))
    val chunks = chunked
      .groupBy((kcols :+ col("_chunk")): _*)
      .agg(sort_array(collect_list(struct(col(ordCol).as("o"),
        col("_dp").as("dp"), col("_dn").as("dn")))).as("pts"))

    // chunk summary: fold (A, B) per statistic, seeded by the first
    // element's step map (A = 0, B = d)
    val sumMerge = (acc: Column, p: Column) => struct(
      greatest(lit(0L), acc.getField("ap") + p.getField("dp")).as("ap"),
      (acc.getField("bp") + p.getField("dp")).as("bp"),
      greatest(lit(0L), acc.getField("an") + p.getField("dn")).as("an"),
      (acc.getField("bn") + p.getField("dn")).as("bn"))
    val summaries = chunks.select(kcols ++ Seq(col("_chunk"),
      aggregate(slice(col("pts"), lit(2), size(col("pts")) - 1),
        struct(lit(0L).as("ap"),
          element_at(col("pts"), 1).getField("dp").as("bp"),
          lit(0L).as("an"),
          element_at(col("pts"), 1).getField("dn").as("bn")),
        sumMerge).as("_m")): _*)

    // boundary fold: s_out = max(A, s_in + B), start state 0
    val boundMerge = (acc: Column, p: Column) => {
      val m = p.getField("m")
      val pin = when(size(acc) === 0, lit(0L))
        .otherwise(element_at(acc, -1).getField("pout"))
      val nin = when(size(acc) === 0, lit(0L))
        .otherwise(element_at(acc, -1).getField("nout"))
      array_append(acc, struct(
        p.getField("c").as("c"), pin.as("pin"), nin.as("nin"),
        greatest(m.getField("ap"), pin + m.getField("bp")).as("pout"),
        greatest(m.getField("an"), nin + m.getField("bn")).as("nout")))
    }
    val bounds = summaries
      .groupBy(kcols: _*)
      .agg(sort_array(collect_list(struct(col("_chunk").as("c"),
        col("_m").as("m")))).as("cs"))
      .select(kcols :+ explode(aggregate(col("cs"),
        emptyAcc("c" -> LongType, "pin" -> LongType, "nin" -> LongType,
          "pout" -> LongType, "nout" -> LongType),
        boundMerge)).as("bd"): _*)
      .select(kcols ++ Seq(col("bd.c").as("_chunk"),
        col("bd.pin").as("_pin"), col("bd.nin").as("_nin")): _*)

    // per-point emission from the boundary state
    val emitMerge = (acc: Column, p: Column) => {
      val first = size(acc) === 0
      val tpPrev = when(first, col("_pin"))
        .otherwise(element_at(acc, -1).getField("tp"))
      val tnPrev = when(first, col("_nin"))
        .otherwise(element_at(acc, -1).getField("tn"))
      array_append(acc, struct(p.getField("o").as("o"),
        greatest(lit(0L), tpPrev + p.getField("dp")).as("tp"),
        greatest(lit(0L), tnPrev + p.getField("dn")).as("tn")))
    }
    chunks.join(bounds, keys :+ "_chunk")
      .select(kcols :+ explode(aggregate(col("pts"),
        emptyAcc("o" -> ordType, "tp" -> LongType, "tn" -> LongType),
        emitMerge)).as("r"): _*)
      .select(kcols ++ Seq(col("r.o").as(ordCol),
        col("r.tp").as("tp"), col("r.tn").as("tn")): _*)
  }

  /** Yule–Walker AR(2) fit + one-step forecast per series — the
    * cheapest model that captures both momentum AND mean reversion,
    * and the standard "is a real model worth it?" rung above
    * [[seasonalNaive]]: fit φ₁, φ₂ from the first two sample
    * autocorrelations (φ₁ = r₁(1−r₂)/(1−r₁²), φ₂ = (r₂−r₁²)/(1−r₁²))
    * and forecast x̂_{T+1} = m + φ₁(x_T − m) + φ₂(x_{T−1} − m).
    *
    * Determinism: the caller aggregates to an integral series grid
    * (the [[Inference.autocorr]] contract), so every moment the fit
    * needs — n, Σy, Σy², the lag-1/lag-2 cross sums and their boundary
    * sums — is an exact long from ONE aggregate; r₁ and r₂ are each a
    * single division of exact longs ([[Inference.autocorr]]'s
    * N²-cleared numerator), so the φ tower is bit-identical
    * cross-engine, rounded at 6. The last two observations come from
    * max_by over the same aggregate (no second scan; ties impossible —
    * ord is a grid). Null when n < 3, the series variance is 0, or
    * 1−r₁² = 0 (a perfectly alternating series).
    *
    * Scale shape: two lag windows + one aggregate per series, all over
    * grid cells; output is one row per series.
    */
  def ar2Forecast(series: DataFrame, keys: Seq[String], ord: Column,
      y: Column): DataFrame = {
    val kc = keys.map(col)
    val w = Window.partitionBy(kc: _*).orderBy("ord")
    val base = series.select(kc ++ Seq(ord.as("ord"),
      y.cast("long").as("y")): _*)
    val lagged = base
      .withColumn("y1", lag("y", 1).over(w))
      .withColumn("y2", lag("y", 2).over(w))
    val sums = lagged.groupBy(kc: _*).agg(
      count(lit(1)).as("n"), sum("y").as("s"),
      sum(col("y") * col("y")).as("ss"),
      count(col("y1")).as("c1"),
      sum(col("y") * col("y1")).as("sab1"),
      sum(when(col("y1").isNotNull, col("y"))).as("sa1"),
      sum("y1").as("sb1"),
      count(col("y2")).as("c2"),
      sum(col("y") * col("y2")).as("sab2"),
      sum(when(col("y2").isNotNull, col("y"))).as("sa2"),
      sum("y2").as("sb2"),
      max_by(col("y"), col("ord")).as("yt"),
      max_by(col("y1"), when(col("y1").isNotNull, col("ord"))).as("yt1"))
    def rk(k: Int): Column = {
      val num = col("n") * col("n") * col(s"sab$k") -
        col("n") * col("s") * (col(s"sa$k") + col(s"sb$k")) +
        col(s"c$k") * col("s") * col("s")
      num.cast("double") /
        (col("n") * (col("n") * col("ss") - col("s") * col("s"))).cast("double")
    }
    val r1 = rk(1)
    val r2 = rk(2)
    val denom = lit(1.0) - r1 * r1
    val phi1 = r1 * (lit(1.0) - r2) / denom
    val phi2 = (r2 - r1 * r1) / denom
    val m = col("s").cast("double") / col("n").cast("double")
    val fc = m + phi1 * (col("yt").cast("double") - m) +
      phi2 * (col("yt1").cast("double") - m)
    val varOk = col("n") * col("ss") - col("s") * col("s") > 0
    val ok = col("n") >= 3L && varOk && abs(denom) > lit(1e-12)
    sums.select(kc ++ Seq(col("n"),
      when(varOk, round(r1, 6)).as("r1"),
      when(varOk, round(r2, 6)).as("r2"),
      when(ok, round(phi1, 6)).as("phi1"),
      when(ok, round(phi2, 6)).as("phi2"),
      when(ok, round(fc, 6)).as("forecast")): _*)
  }

  /** Wald–Wolfowitz runs test on the SIGNS of successive differences
    * per series — "are the ups and downs random, or does the series
    * trend/oscillate?", the distribution-free randomness screen run
    * before any autocorrelation model is trusted. Zero differences
    * drop (the standard treatment); a run is a maximal block of equal
    * signs; z compares the observed run count to its exact null mean
    * μ = 2·n₊·n₋/n + 1 and variance (μ−1)(μ−2)/(n−1).
    *
    * Scale shape: callers hand in an already-aggregated series (a day
    * grid, a period grid), so both windows — the lag-diff and the
    * run-boundary flag — share ONE series-keyed exchange+sort over
    * grid rows, and everything after is exact longs; the z tower is
    * the only float, rounded at 6 (null when either sign is absent or
    * the variance is 0).
    */
  def runsTest(series: DataFrame, keys: Seq[String], t: Column,
      y: Column): DataFrame = {
    val kc = keys.map(col)
    val w = Window.partitionBy(kc: _*).orderBy("t")
    val signs = series.select(kc ++ Seq(t.as("t"), y.cast("long").as("y")): _*)
      .withColumn("diff", col("y") - lag("y", 1).over(w))
      .filter(col("diff").isNotNull && col("diff") =!= 0L)
      // not signum: the same two-branch CASE exists verbatim in the
      // oracle (diff = 0 is already filtered)
      .withColumn("s", when(col("diff") > 0L, 1).otherwise(-1))
    val flagged = signs.withColumn("newrun",
      when(lag("s", 1).over(w).isNull || lag("s", 1).over(w) =!= col("s"), 1L)
        .otherwise(0L))
    val g = flagged.groupBy(kc: _*)
      .agg(count(lit(1)).as("n"),
        sum(when(col("s") === 1, 1L).otherwise(0L)).as("n_plus"),
        sum(when(col("s") === -1, 1L).otherwise(0L)).as("n_minus"),
        sum("newrun").as("runs"))
    val nD = col("n").cast("double")
    val mu = lit(2.0) * col("n_plus").cast("double") *
      col("n_minus").cast("double") / nD + lit(1.0)
    val v = (mu - 1.0) * (mu - 2.0) / (nD - 1.0)
    g.select(kc ++ Seq(col("n"), col("n_plus"), col("n_minus"), col("runs"),
      when(col("n_plus") >= 1L && col("n_minus") >= 1L && col("n") >= 3L
          && v > 0,
        round((col("runs").cast("double") - mu) / sqrt(v), 6)).as("z")): _*)
  }

  /** Cross-correlation lead–lag table between two aligned integral
    * series: for every lag in [−maxLag, maxLag], the Pearson
    * correlation of (a_t, b_{t+lag}) over the overlapping index range —
    * "does A lead B, and by how much?" (the argmax row), the screen
    * run before any cross-series regression. `t` must be an integral,
    * gap-meaningful index (epoch day, period number).
    *
    * Scale shape: callers hand in the ALIGNED GRID (two measures on
    * one time index — a day grid, never raw rows), so the lag
    * expansion is grid × (2·maxLag+1) rows, the shifted join is an
    * equi-join on the grid; first-order sums stay exact longs, while
    * the squared/cross terms accumulate as DOUBLES (the hhi/varC
    * convention: a² at values ~3·10⁹ — plausible daily cent totals at
    * higher sf — silently overflows an int64 sum), mirrored
    * term-for-term in the oracle. Both series are pre-shifted by their
    * exact integer MIN (round 14, ADVICE: the n·saa − sa² tower
    * cancels catastrophically for near-constant large-magnitude
    * series, where Spark's partition-order double sums and DuckDB's
    * can diverge past the 1e-6 rounding; Pearson is shift-invariant,
    * min is order-independent and engine-exact, and the centered
    * magnitudes keep every squared term — integers in double — below
    * 2⁵³ for realistic grids, making the sums themselves exact). Costs
    * one extra scalar-agg pass over the caller's grid (broadcast
    * 1-row join), not over the lag expansion. Rounded at 6 (null when
    * either side is constant over the overlap).
    */
  def leadLagCorr(series: DataFrame, t: Column, a: Column, b: Column,
      maxLag: Int): DataFrame = {
    val s0 = series.select(t.cast("long").as("t"), a.cast("long").as("a"),
      b.cast("long").as("b"))
    val off = s0.agg(min("a").as("oa"), min("b").as("ob"))
    val s = s0.crossJoin(broadcast(off))
      .select(col("t"), (col("a") - col("oa")).as("a"),
        (col("b") - col("ob")).as("b"))
    val la = s.select(explode(typedLit((-maxLag to maxLag).map(_.toLong)))
      .as("lag"), col("t"), col("a"))
    val sb = s.select(col("t").as("tb"), col("b"))
    val j = la.join(sb, col("tb") === col("t") + col("lag"))
    val aD = col("a").cast("double")
    val bD = col("b").cast("double")
    val g = j.groupBy("lag")
      .agg(count(lit(1)).as("n"), sum("a").as("sa"), sum("b").as("sb"),
        sum(aD * aD).as("saa"),
        sum(bD * bD).as("sbb"),
        sum(aD * bD).as("sab"))
    val nD = col("n").cast("double")
    val covN = nD * col("sab").cast("double") -
      col("sa").cast("double") * col("sb").cast("double")
    val vaN = nD * col("saa").cast("double") -
      col("sa").cast("double") * col("sa").cast("double")
    val vbN = nD * col("sbb").cast("double") -
      col("sb").cast("double") * col("sb").cast("double")
    g.select(col("lag"), col("n").as("n_overlap"),
      when(col("n") >= 2L && vaN > 0 && vbN > 0,
        round(covN / (sqrt(vaN) * sqrt(vbN)), 6)).as("xcorr"))
  }
}
