package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
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
}
