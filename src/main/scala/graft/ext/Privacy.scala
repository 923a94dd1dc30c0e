package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Privacy operators for a shared data platform: deterministic keyed
  * pseudonymization (remove the raw identifier, keep referential
  * integrity) and k-anonymity auditing (find quasi-identifier groups
  * small enough to re-identify). Both are single-pass, exact-count
  * operators — the privacy layer must not be the scale bottleneck of
  * the pipeline it protects.
  */
object Privacy {

  /** Deterministic keyed pseudonym for an identifier column:
    * `hash(pepper || ":" || id)`. Determinism is the point — the same
    * id maps to the same token everywhere, so joins, group-bys, and
    * sessionization still work across tables with the raw identifier
    * gone; rotating the pepper severs every old linkage at once
    * (crypto-shredding by key destruction). `md5` stands in for a
    * keyed MAC (HMAC-SHA256 in production — same expression shape,
    * swap the hash); the pepper must come from a secret store, never
    * the plan text, in a real deployment.
    *
    * Scale: a narrow per-row expression (codegen'd) — zero shuffle,
    * zero state.
    */
  def pseudonymize(idCol: Column, pepper: String): Column =
    md5(concat(lit(pepper + ":"), idCol.cast("string")))

  /** Per-group sizes of the quasi-identifier combination with a
    * `violates_k` flag: a row's group smaller than `k` means an
    * attacker who knows the quasi-identifiers can narrow a subject to
    * fewer than k candidates — the k-anonymity re-identification
    * test. One map-side-combined aggregate; shuffle = distinct
    * quasi-id combinations, never rows.
    */
  def kAnonymityGroups(df: DataFrame, quasiIds: Seq[Column], k: Long): DataFrame = {
    require(k >= 2, "k must be >= 2")
    df.groupBy(quasiIds: _*).agg(count(lit(1)).as("n"))
      .withColumn("violates_k", col("n") < k)
  }

  /** l-diversity audit — the attribute-disclosure complement to
    * [[kAnonymityGroups]]: a quasi-identifier group can satisfy k
    * (many candidate subjects) and still leak, if every subject in it
    * shares the SAME sensitive value. Per group: size `n`, distinct
    * sensitive values `l`, and `violates_l` when l < `l` threshold —
    * an attacker narrowing a subject to that group learns the
    * sensitive attribute outright (or to < l candidates).
    *
    * Scale: one aggregate keyed by the quasi-id combination;
    * `countDistinct` expands to the standard two-phase distinct-agg
    * Expand plan, map-side-combined — shuffle is (group × distinct
    * sensitive) rows, never the table.
    */
  def lDiversityGroups(df: DataFrame, quasiIds: Seq[Column], sensitive: Column,
                       l: Long): DataFrame = {
    require(l >= 2, "l must be >= 2")
    df.groupBy(quasiIds: _*)
      .agg(count(lit(1)).as("n"), countDistinct(sensitive).as("l"))
      .withColumn("violates_l", col("l") < l)
  }

  /** t-closeness audit — the distribution-skew complement to
    * [[lDiversityGroups]]: a group can hold many DISTINCT sensitive
    * values (passes l-diversity) and still leak, if its distribution
    * over them is far from the table's — e.g. a group that is 95%
    * "high" in an attribute that is 10% "high" globally tells an
    * attacker a lot. Per quasi-identifier group this computes the Earth
    * Mover's Distance between the group's and the global distribution
    * over an ORDINAL sensitive attribute (the t-closeness paper's
    * ordered-attribute form): with the m distinct values in order,
    *   EMD = Σⱼ |cumPg(j) − cumPG(j)| / (m−1).
    * Cleared of denominators, the numerator Σⱼ |cumgⱼ·N − cumGⱼ·n_g| is
    * EXACT integer arithmetic over counts (cumg = group cumulative
    * count, cumG = global, N = table rows, n_g = group rows); one final
    * division by n_g·N·(m−1) produces t. Overflow bound: the products
    * are ≤ n_g·N < 2⁶³ up to ~3·10⁹ rows; shard the audit beyond that.
    *
    * Scale design: one aggregate to (group × value) cells — shuffle is
    * cells, never rows — then everything downstream (value grid, global
    * marginals, zero-filled cumulative windows) runs on the cell table,
    * whose size is bounded by |groups|·m. The per-group cumulative
    * window partitions on the group key, so the sort spreads across
    * reducers; the m-row value grid and the two scalars broadcast.
    *
    * Returns one row per group: the quasi-id columns, `n` (group
    * size), `t_num` (the exact integer numerator), and `t` (rounded
    * at 6).
    */
  def tClosenessGroups(df: DataFrame, quasiIds: Seq[Column],
                       sensitiveOrd: Column): DataFrame = {
    val qNames = quasiIds.indices.map(i => s"q$i")
    val cells = df
      .select(quasiIds.zip(qNames).map { case (c, n) => c.as(n) } :+
        sensitiveOrd.cast("long").as("sv"): _*)
      .groupBy(qNames.map(col) :+ col("sv"): _*)
      .agg(count(lit(1)).as("cnt"))
    // Global marginals over the ordered value domain (m rows, broadcast)
    val globalCum = cells.groupBy("sv").agg(sum("cnt").as("gcnt"))
      .withColumn("gcum", sum("gcnt").over(
        Window.orderBy("sv").rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("sv"), col("gcum"))
    val totals = cells.agg(sum("cnt").as("big_n"),
      countDistinct("sv").as("m"))
    // Zero-filled (group × value) grid so cumulative counts carry across
    // values a group never takes
    val groups = cells.groupBy(qNames.map(col): _*).agg(sum("cnt").as("n"))
    val grid = groups
      .join(broadcast(globalCum.select(col("sv"))))
      .join(cells, qNames :+ "sv", "left")
      .na.fill(0L, Seq("cnt"))
      .withColumn("gcum_grp", sum("cnt").over(
        Window.partitionBy(qNames.map(col): _*).orderBy("sv")
          .rowsBetween(Window.unboundedPreceding, 0)))
    grid
      .join(broadcast(globalCum), Seq("sv"))
      .crossJoin(broadcast(totals))
      .groupBy(qNames.map(col) :+ col("n") :+ col("big_n") :+ col("m"): _*)
      .agg(sum(abs(col("gcum_grp") * col("big_n") - col("gcum") * col("n")))
        .as("t_num"))
      .select(qNames.map(col) :+ col("n") :+ col("t_num") :+
        round(col("t_num").cast("double") /
          (col("n") * col("big_n") * (col("m") - 1)).cast("double"), 6)
          .as("t"): _*)
  }

  /** Differentially-private group counts via the Laplace mechanism —
    * the ε-DP release shape for histogram queries (count sensitivity
    * 1, noise scale b = 1/ε). The noise here is DETERMINISTIC by
    * construction: u ∈ (0,1) derives from the md5 of the group key
    * ((hash₅₂ + 0.5)/2⁵², never exactly 0 or 1/2 or 1), pushed through
    * the Laplace inverse CDF −b·sgn(u−½)·ln(1−2|u−½|). A real privacy
    * deployment MUST swap in cryptographic randomness — a key-seeded
    * noise stream is a pseudo-random stand-in that makes the release
    * reproducible and hash-verifiable, which is the property this
    * pipeline gates on (and what a unit test can assert); the
    * mechanism's plumbing (sensitivity, scale, post-processing clamp)
    * is the deliverable.
    *
    * Scale: one map-side-combined count aggregate (shuffle = distinct
    * groups), then a narrow per-group expression — the privacy layer
    * stays off the critical path.
    *
    * Returns (keys…, n, noise, dp_n, dp_n_clamped) with the noisy
    * values rounded at 6 and the clamp applied AFTER rounding (both
    * engines branch on the same rounded value).
    */
  def dpCounts(df: DataFrame, keys: Seq[String], epsilon: Double): DataFrame = {
    require(epsilon > 0, "epsilon must be positive")
    val g = keys.map(col)
    val u = (conv(substring(md5(concat_ws("\u0001", g: _*)), 1, 13), 16, 10)
      .cast("long").cast("double") + 0.5) / math.pow(2.0, 52)
    val noise = lit(-1.0 / epsilon) * signum(u - 0.5) *
      log(lit(1.0) - lit(2.0) * abs(u - 0.5))
    // dp_n adds the RAW noise and rounds ONCE at the end — the display
    // `noise` column is rounded separately. Round-8 advice: the earlier
    // round(n + round(noise, 6), 6) double-rounding diverged from the
    // oracle's round(n + raw_noise, 6) closed form at a 7th-decimal
    // boundary; now both engines evaluate the identical expression.
    df.groupBy(g: _*).agg(count(lit(1)).as("n"))
      .select(g ++ Seq(col("n"), round(noise, 6).as("noise"),
        round(col("n") + noise, 6).as("dp_n"),
        greatest(round(col("n") + noise, 6), lit(0.0))
          .as("dp_n_clamped")): _*)
  }
}
