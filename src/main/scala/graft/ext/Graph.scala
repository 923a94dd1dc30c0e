package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph propagation over an edge list: fixed-iteration
  * PageRank. Complements the connected-components resolution in
  * [[Dedup]] and the degree/triangle statistics in q_graph_stats.
  *
  * Scale design: ranks live in a (node, pr) frame re-derived each
  * round by ONE join + ONE aggregate over the edge list — the standard
  * distributed formulation where the shuffle is bounded by |E| per
  * iteration and no adjacency ever materializes per node. The iteration
  * count is FIXED (a pipeline hyper-parameter, not a convergence loop),
  * so by default the driver issues no per-round actions at all: the
  * loop merely stacks plan layers and the whole computation runs as one
  * job (plan depth is linear in the handful of iterations). For deep
  * iteration counts, `truncateLineage = true` cuts the plan with an
  * eager `localCheckpoint` per round — the same trade
  * [[Dedup.connectedComponents]] documents, with the same caveat that a
  * real cluster wanting fault-tolerant truncation should use reliable
  * `checkpoint` storage instead.
  */
object Graph {

  /** Symmetrize an (id1, id2) pair list into a directed edge list with
    * both orientations — the input shape [[pageRank]] expects for an
    * undirected graph.
    */
  def symmetrize(pairs: DataFrame): DataFrame =
    pairs.select(col("id1").as("src"), col("id2").as("dst"))
      .unionAll(pairs.select(col("id2").as("src"), col("id1").as("dst")))

  /** Multi-source BFS: minimum hop distance from any seed, bounded at
    * `maxHops`. Frontier formulation — each round joins ONLY the
    * just-reached frontier against the edge list, anti-joins the
    * already-visited set, and unions the new layer in; a node is
    * therefore labeled the first round it appears, which IS its
    * minimum distance, with no per-node min aggregate needed.
    *
    * Scale design: the per-round shuffle is |frontier ⋈ edges| — at
    * most |E| and typically far less — and the visited set only ever
    * grows by the new layer, so total work across k rounds is O(k·|E|)
    * worst-case with no all-pairs stage. Each frontier is persisted
    * (it is consumed twice: the union and the next round's join) and
    * the hop bound makes the plan depth fixed, so no lineage
    * truncation is needed for the shallow exploration depths
    * (3–6 hops) this targets. Nodes unreachable within `maxHops` are
    * absent from the output — the caller distinguishes "far" from
    * "disconnected" by raising the bound.
    *
    * Returns (id, hop) with hop in [0, maxHops].
    */
  def bfsHops(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 0, "maxHops must be non-negative")
    val e = edges.select(col("src"), col("dst"))
    var visited = seeds.select(col("id")).distinct()
      .withColumn("hop", lit(0)).persist()
    var frontier = visited
    for (h <- 1 to maxHops) {
      val next = frontier
        .join(e, frontier("id") === e("src"))
        .select(col("dst").as("id")).distinct()
        .join(visited, Seq("id"), "left_anti")
        .withColumn("hop", lit(h))
        .persist()
      visited = visited.unionAll(next)
      frontier = next
    }
    visited
  }

  /** Fixed-round k-core peeling: each round drops every node with
    * degree < `k` and restricts the edge list to surviving endpoints;
    * the cascade (removals lower neighbors' degrees) is what the next
    * round sees. `rounds` is a pipeline hyper-parameter, not a
    * convergence loop — after r rounds the survivors are a superset of
    * the true k-core that shrinks monotonically toward it, and a
    * caller wanting the fixpoint raises `rounds` (the observe-metric
    * loop in [[Dedup.connectedComponents]] shows the alternative).
    *
    * Scale design: one degree aggregate + two semi-join-shaped edge
    * restrictions per round, all shuffling on the node key — O(|E|)
    * per round, no adjacency materialization. The surviving edge list
    * is persisted per round because the next round reads it twice
    * (degree pass + restriction).
    *
    * Input edges must be symmetrized ([[symmetrize]]); returns
    * (id, degree) for nodes with ≥ 1 surviving edge after the final
    * round, degree counted over the surviving edge list.
    */
  def kCorePeel(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1, "k and rounds must be positive")
    var e = edges.select(col("src"), col("dst"))
    for (_ <- 1 to rounds) {
      val keep = e.groupBy("src").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select(col("src").as("id"))
      e = e.join(keep.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
        .join(keep.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
        .select(col("src"), col("dst"))
        .persist()
    }
    e.groupBy(col("src").as("id")).agg(count(lit(1)).as("degree"))
  }

  /** PageRank with damping `d` for a fixed `iters` rounds over a
    * directed edge list (src, dst). Nodes are those appearing in the
    * edge list; every node here has out-degree ≥ 1 (symmetrized
    * undirected input), so there is no dangling-mass term. Returns
    * (id, pr) with pr rounded at 6 for cross-engine comparison.
    */
  def pageRank(edges: DataFrame, iters: Int, d: Double = 0.85,
      truncateLineage: Boolean = false): DataFrame = {
    val deg = edges.groupBy("src").agg(count(lit(1)).as("out_deg"))
    val nodes = edges.select(col("src").as("id")).distinct()
    val n = nodes.count()
    var pr = nodes.withColumn("pr", lit(1.0 / n))
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(pr.withColumnRenamed("id", "src"), "src")
        .join(deg, "src")
        .groupBy(col("dst").as("id"))
        .agg(sum(col("pr") / col("out_deg").cast("double")).as("inflow"))
      pr = nodes.join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit((1.0 - d) / n) + lit(d) * coalesce(col("inflow"), lit(0.0))).as("pr"))
      if (truncateLineage) pr = pr.localCheckpoint(true)
    }
    pr.select(col("id"), round(col("pr"), 6).as("pr"))
  }
}
