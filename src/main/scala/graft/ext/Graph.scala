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
