package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grid-blocked spatial operators: proximity self-joins over 2-D
  * integer coordinates without a distance index. The device is the
  * standard spatial-blocking trick — quantize points to grid cells of
  * side `cellSize`, replicate only the PROBE side to its 3×3 cell
  * neighborhood, and equi-join on the cell key — so the all-pairs
  * distance test never materializes: candidate pairs are bounded by
  * per-cell density, and the join is an ordinary hash join Spark can
  * partition both sides of.
  */
object Spatial {

  /** All unordered point pairs within Chebyshev distance `radius`,
    * via 3×3 grid-cell blocking. Requires `radius <= cellSize` — that
    * is what makes the 3×3 neighborhood COMPLETE (a point's match at
    * distance ≤ cellSize lies in an adjacent cell by construction),
    * so the result is exact, not approximate. Each qualifying pair is
    * emitted exactly once (`id_a < id_b`; the probe's 9 neighbor cells
    * are distinct, and the build point lives in exactly one of them).
    *
    * Scale shape: the probe side explodes ×9 (narrow, pre-shuffle);
    * the join is an equi-join on the (cx, cy) cell key — shuffle is
    * 10× points, never points². Pair work is Σ_cell density² — the
    * cell size is the knob: pick it ≈ radius (smallest complete
    * neighborhood) so dense data costs what its true pair count
    * costs, not more. Coordinates are caller-quantized integers (the
    * [[graft.ext.Inference]] exactness contract): every distance is
    * exact integer arithmetic, so the radius cut is engine-exact.
    */
  def gridNeighborPairs(points: DataFrame, id: String, x: Column, y: Column,
                        cellSize: Int, radius: Int): DataFrame = {
    require(cellSize >= 1, "cellSize must be positive")
    require(radius >= 0 && radius <= cellSize,
      "radius must be in [0, cellSize] for the 3x3 neighborhood to be complete")
    val pts = points
      .select(col(id).as("pid"), x.cast("long").as("px"), y.cast("long").as("py"))
      // floor(x / cell) in double is exact while |x| < 2^53 / cell —
      // far past any quantized coordinate grid
      .withColumn("cx", floor(col("px").cast("double") / cellSize).cast("long"))
      .withColumn("cy", floor(col("py").cast("double") / cellSize).cast("long"))
    val build = pts.select(col("pid").as("id_b"), col("px").as("bx"),
      col("py").as("by"), col("cx"), col("cy"))
    val offsets = typedLit(for { dx <- -1 to 1; dy <- -1 to 1 } yield (dx, dy))
    val probe = pts
      .select(col("pid").as("id_a"), col("px").as("ax"), col("py").as("ay"),
        col("cx").as("acx"), col("cy").as("acy"))
      .withColumn("o", explode(offsets))
      .select(col("id_a"), col("ax"), col("ay"),
        (col("acx") + col("o._1")).as("ncx"), (col("acy") + col("o._2")).as("ncy"))
    probe.join(build,
        col("ncx") === col("cx") && col("ncy") === col("cy") &&
          col("id_a") < col("id_b") &&
          greatest(abs(col("ax") - col("bx")), abs(col("ay") - col("by"))) <= radius)
      .select(col("id_a"), col("id_b"),
        greatest(abs(col("ax") - col("bx")), abs(col("ay") - col("by"))).as("dist"))
  }

  /** Each point's nearest neighbor within Chebyshev `radius` (points
    * with no neighbor in range emit nothing — the caller decides what
    * isolation means). Built on [[gridNeighborPairs]]: symmetrize the
    * unordered pairs (cheap: pair count ≪ point count after the radius
    * cut), then one per-point argmin by the total order (dist, id) —
    * deterministic under ties.
    *
    * Scale: the argmin window partitions on the point id — maximal
    * key cardinality, so the sort spreads across all reducers and
    * each group is the handful of in-radius candidates. This is the
    * geometric twin of the ANN top-k in [[graft.ext.Similarity]]:
    * blocking by cell instead of by hash bucket.
    */
  def nearestNeighbors(points: DataFrame, id: String, x: Column, y: Column,
                       cellSize: Int, radius: Int): DataFrame = {
    val pairs = gridNeighborPairs(points, id, x, y, cellSize, radius)
    val sym = pairs.unionAll(pairs.select(col("id_b").as("id_a"),
      col("id_a").as("id_b"), col("dist")))
    sym
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("id_a").orderBy(col("dist"), col("id_b"))))
      .filter(col("rn") === 1)
      .select(col("id_a").as("id"), col("id_b").as("nn_id"),
        col("dist").as("nn_dist"))
  }
}
