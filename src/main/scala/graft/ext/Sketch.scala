package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch, Spark-first: the sketch is not an opaque binary
  * blob but a TINY AGGREGATED TABLE of (row, bucket, count) — depth×width
  * rows total, regardless of input size. That representation keeps every
  * sketch property and gains the engine's machinery for free:
  *
  *  - build is one map-side-combined aggregate: shuffle volume is
  *    bounded by depth × width × tasks, never the corpus;
  *  - merge is `unionByName` + re-aggregate (counters are additive) —
  *    the mergeability that makes CMS work across partitions/days;
  *  - estimates are a broadcast join + `min` — no driver round-trip;
  *  - everything is deterministic (md5-derived bucket hashing), so a
  *    SQL oracle can reproduce the sketch bit-for-bit — unusual for a
  *    "probabilistic" structure and exactly why this hashing was chosen.
  *
  * Estimates carry the classic CMS guarantee: never an underestimate,
  * and overestimate ≤ ε·N with probability 1−δ for width ≥ e/ε,
  * depth ≥ ln(1/δ). Use for heavy-hitter counts over unbounded key
  * universes where exact per-key aggregation would blow memory.
  */
object Sketch {

  /** A built sketch: the counter table plus the (depth, width) it was
    * hashed with. Carrying the parameters in the type makes a
    * build/probe geometry mismatch — which would silently break the
    * never-underestimate guarantee (probe buckets mod a different
    * width hit wrong counters) — unrepresentable. Merge sketches of
    * EQUAL geometry by unioning tables and re-summing counters.
    */
  final case class CmsSketch(table: DataFrame, depth: Int, width: Int) {
    /** Counter-wise sum with another sketch of the same geometry. */
    def merge(other: CmsSketch): CmsSketch = {
      require(depth == other.depth && width == other.width,
        s"geometry mismatch: ${depth}x$width vs ${other.depth}x${other.width}")
      copy(table = table.unionByName(other.table)
        .groupBy("r", "bucket").agg(sum("c").as("c")))
    }
  }

  /** Row-`r` bucket for an item: the first 8 md5 hex chars of
    * `"r:item"` as an integer, mod `width`. Deterministic, uniform
    * enough, and reproducible in any engine with md5 + hex parsing.
    */
  def cmsBucket(r: Int, item: Column, width: Int): Column =
    conv(substring(md5(concat(lit(r.toString), lit(":"), item.cast("string"))), 1, 8), 16, 10)
      .cast("long") % width

  /** Build the sketch table (`r`, `bucket`, `c`) for `depth` hash rows
    * of `width` buckets each. Missing (r, bucket) combinations are
    * zero counters (the estimate join treats absence as 0).
    */
  def countMin(df: DataFrame, item: Column, depth: Int = 4, width: Int = 256): CmsSketch = {
    require(depth >= 1 && width >= 2, "need depth >= 1, width >= 2")
    CmsSketch(
      df.select(posexplode(
          array((0 until depth).map(r => cmsBucket(r, item, width)): _*))
          .as(Seq("r", "bucket")))
        .groupBy("r", "bucket")
        .agg(count(lit(1)).as("c")),
      depth, width)
  }

  /** Distinct-count (HLL) sketches per group, as a keyed sketch TABLE —
    * the cardinality companion to [[countMin]]'s frequency table. Built
    * on Spark's DataSketches-backed `hll_sketch_agg`: one map-side-
    * combined aggregate, shuffle volume ≤ groups × 2^lgK bytes
    * regardless of input size. The output is a durable artifact: write
    * it per day/partition, then [[hllMerge]] rolls windows up WITHOUT
    * re-reading the raw data — the mergeability exact `count(distinct)`
    * fundamentally lacks (its shuffle carries every distinct value, and
    * two day-level exact counts cannot be combined at all).
    * Register-max merge is lossless: merging shards yields the SAME
    * estimate as one build over the union (unit-gated in ExtSpec).
    * Standard error ≈ 1.04/√2^lgK (~0.8 % at the default lgK=12).
    */
  def hllByKey(df: DataFrame, keys: Seq[String], item: Column, lgK: Int = 12): DataFrame = {
    require(lgK >= 4 && lgK <= 21, "DataSketches HLL wants lgK in [4, 21]")
    df.groupBy(keys.map(col): _*)
      .agg(hll_sketch_agg(item, lit(lgK)).as("hll"))
  }

  /** Roll up keyed sketch tables (same lgK) into one sketch per key. */
  def hllMerge(tables: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(tables.nonEmpty, "nothing to merge")
    tables.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(hll_union_agg(col("hll"), lit(false)).as("hll"))
  }

  /** Read the estimate off a keyed sketch table. */
  def hllEstimate(sketches: DataFrame, keys: Seq[String]): DataFrame =
    sketches.select(keys.map(col) :+
      hll_sketch_estimate(col("hll")).cast("long").as("approx_ndv"): _*)

  /** Sliding-window distinct count, EXACT form: deduplicate to
    * (keys, day, item), explode each survivor to the `windowDays`
    * window-ends it participates in, count distinct per window. A
    * window function cannot express sliding COUNT(DISTINCT) at all —
    * this explode-to-ends rewrite is the standard exact formulation.
    *
    * Scale: shuffle = distinct (keys, day, item) triples × windowDays.
    * Exact is right while the per-day item universe is modest; when
    * items ~ corpus (distinct users at 100 TB), switch to
    * [[slidingDistinctHll]] — same window shape over mergeable daily
    * sketches, shuffle ≤ (keys, day) × 2^lgK bytes, independent of
    * item count.
    */
  def slidingDistinctExact(df: DataFrame, keys: Seq[String], item: Column,
                           dateCol: Column, windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, "windowDays must be >= 1")
    df.select(keys.map(col) :+ dateCol.as("_d") :+ item.as("_item"): _*)
      .distinct()
      .select(keys.map(col) :+ col("_item") :+
        explode(expr(s"sequence(_d, date_add(_d, ${windowDays - 1}), interval 1 day)"))
          .as("window_end"): _*)
      .groupBy(keys.map(col) :+ col("window_end"): _*)
      .agg(countDistinct(col("_item")).as("n_distinct"))
  }

  /** Sliding-window distinct count over MERGEABLE daily HLL sketches:
    * build one sketch per (keys, day) — the durable per-partition
    * artifact — then union-merge each window's days and read the
    * estimate. Never re-touches raw data per window; the unit gate
    * asserts agreement with [[slidingDistinctExact]] on the fixture.
    */
  def slidingDistinctHll(df: DataFrame, keys: Seq[String], item: Column,
                         dateCol: Column, windowDays: Int = 7,
                         lgK: Int = 12): DataFrame = {
    require(windowDays >= 1, "windowDays must be >= 1")
    val daily = df.withColumn("_d", dateCol)
    hllByKey(daily, keys :+ "_d", item, lgK)
      .select(keys.map(col) :+ col("hll") :+
        explode(expr(s"sequence(_d, date_add(_d, ${windowDays - 1}), interval 1 day)"))
          .as("window_end"): _*)
      .groupBy(keys.map(col) :+ col("window_end"): _*)
      .agg(hll_union_agg(col("hll"), lit(false)).as("hll"))
      .select(keys.map(col) :+ col("window_end") :+
        hll_sketch_estimate(col("hll")).cast("long").as("n_distinct"): _*)
  }

  /** Point-query the sketch: for each probe row's `item`, the minimum
    * counter across the item's `depth` buckets. The sketch side is
    * depth×width rows — always broadcastable.
    */
  def cmsEstimate(cms: CmsSketch, probes: DataFrame, item: Column): DataFrame = {
    val exploded = probes.select(probes.columns.map(col) :+ posexplode(
      array((0 until cms.depth).map(r => cmsBucket(r, item, cms.width)): _*))
      .as(Seq("r", "bucket")): _*)
    exploded
      .join(broadcast(cms.table), Seq("r", "bucket"), "left")
      .groupBy(probes.columns.map(col): _*)
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
  }
}
