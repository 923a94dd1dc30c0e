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

  /** Eager per-round snapshot for the iterative algorithms below: a
    * round's result whose plan references the previous round's MORE
    * THAN ONCE (BFS: union + anti-join; k-core: degree pass + two
    * restrictions) grows the LOGICAL PLAN geometrically if merely
    * persisted — persist caches data, not the plan, and analysis cost
    * explodes long before the data does. `localCheckpoint` materializes
    * the round AND truncates lineage to a scan of the cached blocks, so
    * plan depth stays O(1) per round — the same trade
    * [[Dedup.connectedComponents]] documents (a real cluster wanting
    * fault-tolerant truncation uses reliable `checkpoint` storage).
    *
    * Storage is MEMORY_AND_DISK_SER, not the deserialized default:
    * checkpoint blocks are scanned once-per-round sequentially, so
    * decode cost is trivial, while deserialized row objects are 3-5×
    * the serialized bytes ON HEAP. The 30× scale sweep made this
    * concrete: k-core's per-round edge snapshots as live Java objects
    * blew a 16 GiB heap (OOM → context shutdown) where the serialized
    * form fits comfortably — and lost-block recompute is not an option
    * for a localCheckpoint, whose lineage is truncated by design.
    */
  private def snapshot(df: DataFrame): DataFrame =
    df.localCheckpoint(eager = true,
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)

  /** Release the storage behind a [[snapshot]] (or any
    * `localCheckpoint`ed frame) deterministically. Spark's public API
    * gives no handle to a checkpoint's blocks — they linger until the
    * driver GC collects the RDD — so iterative rounds release each
    * superseded snapshot through this, and callers of [[bfsHops]] /
    * [[kCorePeel]] can release the RETURNED frame once consumed.
    * Only a frame whose plan root IS the checkpoint scan (the shape
    * `localCheckpoint` returns) is released; anything else — including
    * frames DERIVED from a snapshot, whose inner LogicalRDDs may still
    * back other live frames — is a no-op. Release the original
    * snapshot handle, not a projection of it.
    */
  def release(df: DataFrame): Unit =
    org.apache.spark.sql.graft.ColumnBridge.checkpointedRdd(df)
      .foreach(_.unpersist(blocking = false))

  /** Size gate for the local propagation fast paths ([[bfsHops]],
    * [[sssp]], [[longestPathLayers]], [[criticalPath]]): when the
    * MEASURED edge count is at most this (default 2 M) and ids are
    * integral, the relaxation runs as a driver-side synchronous loop
    * over collected edges — the [[Dedup.connectedComponents]]
    * broadcast-style size switch. Rationale: these kernels are
    * EXACT-INTEGER recurrences (hop counts, long weights), so a
    * driver replay of the same synchronous rounds is bit-identical,
    * while each distributed round is a full job whose fixed cost
    * (scheduling + eager checkpoint) dominates small graphs — the
    * round-10 CC profile measured ~0.4 s/round against milliseconds
    * of actual relaxation work. Set `spark.graft.graph.localEdges`
    * to 0 to force the distributed loops (their per-round
    * snapshot/release discipline is what scales past the gate).
    */
  private def localEdgeCap(spark: org.apache.spark.sql.SparkSession): Long =
    spark.conf.get("spark.graft.graph.localEdges", "2000000").toLong

  private def integralType(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt == org.apache.spark.sql.types.LongType ||
      dt == org.apache.spark.sql.types.IntegerType

  /** Materialize the edge projection ONCE (eager [[snapshot]]) and
    * measure it for the [[localEdgeCap]] gate. The previous gate ran
    * `count()` directly on the caller's frame — a full extra execution
    * of a possibly-expensive, possibly-unpersisted edge derivation —
    * and below the cap the driver `collect()` then executed it AGAIN
    * (round-10 ADVICE, medium). Snapshotting first bounds the cost at
    * one serialized write of the projected edges; the sizing count,
    * the fast-path collect, and every distributed round then read the
    * materialized blocks. Callers must [[release]] the snapshot once
    * their own result is materialized — all four gate users return
    * eager snapshots / local relations, so it never escapes.
    */
  private def sizedEdgeSnapshot(e: DataFrame): (DataFrame, Long) = {
    val snap = snapshot(e)
    (snap, snap.count())
  }

  /** Driver-side SYNCHRONOUS relaxation — the shared local kernel:
    * each round computes candidates from the PREVIOUS round's state
    * only (matching the distributed rounds exactly, including the
    * partial result when `rounds` stops short of the fixpoint) and
    * ends early when a round changes nothing. `better(cand, incumbent)`
    * picks max-plus (longest path) or min-plus (BFS/shortest path).
    */
  private def localRelax(edges: Array[(Long, Long, Long)],
      init: scala.collection.mutable.LongMap[Long], rounds: Int,
      better: (Long, Long) => Boolean): scala.collection.mutable.LongMap[Long] = {
    var cur = init
    var r = 0
    var changed = true
    while (r < rounds && changed) {
      changed = false
      val next = cur.clone()
      edges.foreach { case (u, v, w) =>
        cur.get(u).foreach { du =>
          val cand = du + w
          val keep = next.get(v).forall(inc => better(cand, inc))
          if (keep && !next.get(v).contains(cand)) {
            next(v) = cand
            changed = true
          }
        }
      }
      cur = next
      r += 1
    }
    cur
  }

  /** Materialize a local relaxation result as (id, `valueCol`).
    * RDD-backed, not a LocalRelation: a Seq-backed toDF embeds every
    * row into the LOGICAL plan and re-serializes it into each
    * consuming plan — at the 2 M-edge gate that is megabytes of plan
    * per consumer (the round-10 Dedup.localMinLabelComponents ADVICE;
    * same fix here).
    */
  private def localLabels(spark: org.apache.spark.sql.SparkSession,
      state: scala.collection.mutable.LongMap[Long],
      idType: org.apache.spark.sql.types.DataType,
      valueCol: String,
      valueType: org.apache.spark.sql.types.DataType): DataFrame = {
    import spark.implicits._
    val out = state.toArray
    val parts = math.max(1, math.min(spark.sparkContext.defaultParallelism,
      1 + out.length / 500000))
    spark.sparkContext.parallelize(out.toIndexedSeq, parts)
      .toDF("id", valueCol)
      .select(col("id").cast(idType).as("id"),
        col(valueCol).cast(valueType).as(valueCol))
  }

  /** Degree totals + the degree-ORIENTED edge list the triangle kernels
    * share: each undirected edge kept once, directed from its
    * (degree, id)-smaller endpoint to the larger, so every node's
    * OUT-degree is O(√|E|) regardless of its real degree — a hub's
    * edges nearly all point INTO it (the orientation bound
    * OrientationSpec gates on a hub-star fixture). Input is the
    * symmetrized edge list; returns (deg, oriented).
    */
  private[graft] def orientByDegree(edges: DataFrame)
      : (DataFrame, DataFrame, DataFrame) = {
    // Persist BOTH frames: the caller's edge list is typically an
    // expensive derivation (q_transitivity's edges are a lineitem
    // self-join + pair aggregate), and without a persist every
    // reference — deg here, the orientation join here, deg again in
    // the caller's denominator — re-runs that derivation from scratch
    // (the 30× sweep measured the self-join recomputing 3×, dwarfing
    // the triangle kernel itself). Serialized storage for the same
    // reason as [[snapshot]]; Bench/Verify clearCache() between
    // queries bounds the lifetime.
    val e = edges.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val oriented = e
      .join(deg.select(col("src"), col("deg").as("dsrc")), "src")
      .join(deg.select(col("src").as("dst"), col("deg").as("ddst")), "dst")
      .filter(col("dsrc") < col("ddst") ||
        (col("dsrc") === col("ddst") && col("src") < col("dst")))
      .select(col("src"), col("dst"))
      .persist( // read twice by edgeTriangles (adjacency + edge join)
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    // the third element hands the edge cache back so LOOPING callers
    // (kTrussPeel) can unpersist both frames once a round materializes;
    // single-shot callers leave them to the clearCache contract
    (deg, oriented, e)
  }

  /** Per-oriented-edge triangle closure — the EDGE-ITERATOR kernel both
    * triangle statistics run on: collect each node's oriented
    * out-neighborhood (array length O(√|E|) by [[orientByDegree]]),
    * annotate every oriented edge (u, v) with both endpoint arrays, and
    * intersect. Each triangle {a,b,c} oriented a→b, a→c, b→c appears
    * exactly once, at edge (a, b) with c in the intersection. The
    * Σ out² wedge work happens INSIDE `array_intersect` (codegen'd,
    * per-row) instead of materializing Σ out² wedge rows through a
    * shuffle and a closing semi-join — the round-8 scale sweep's one
    * superlinear residue, now gone: shuffled volume is O(|E|) edge
    * rows carrying O(√|E|) arrays plus one O(|E|)-row aggregate.
    *
    * Returns one row per oriented edge: (u, v, ws) with ws = the
    * closing third corners (possibly empty).
    */
  private def edgeTriangles(oriented: DataFrame): DataFrame = {
    val adj = oriented.groupBy("src").agg(collect_list("dst").as("nb"))
    oriented
      .join(adj.select(col("src").as("u"), col("nb").as("nbu")),
        col("src") === col("u"))
      .join(adj.select(col("src").as("v"), col("nb").as("nbv")),
        col("dst") === col("v"))
      .select(col("u"), col("v"),
        array_intersect(col("nbu"), col("nbv")).as("ws"))
  }

  /** Global transitivity (clustering coefficient) by degree-oriented
    * EDGE-ITERATOR triangle counting ([[orientByDegree]] +
    * [[edgeTriangles]]) — the formulation that survives skew: a hub
    * with a million neighbors contributes almost no out-wedges because
    * nearly all its edges point INTO it, and the intersection work
    * never leaves the row.
    *
    * Returns one row: n_triangles, n_wedges (open+closed,
    * Σ deg·(deg−1)/2 on the undirected graph), and transitivity =
    * 3·triangles / wedges (rounded at 6; the two counts are exact
    * longs).
    *
    * Storage contract: the returned frame is LAZY and caches the edge
    * list + orientation while alive (see [[orientByDegree]]); call
    * `spark.catalog.clearCache()` (or unpersist via the catalog) once
    * consumed — a long-lived session that loops over graphs without it
    * accumulates edge caches.
    */
  def globalTransitivity(edges: DataFrame): DataFrame = {
    val (deg, oriented, _) = orientByDegree(edges)
    val tri = edgeTriangles(oriented)
      .agg(coalesce(sum(size(col("ws"))), lit(0)).cast("long")
        .as("n_triangles"))
    val openW = deg.agg((sum(col("deg") * (col("deg") - 1)) / 2)
      .cast("long").as("n_wedges"))
    tri.crossJoin(openW) // two 1-row scalar aggregates
      .select(col("n_triangles"), col("n_wedges"),
        round(lit(3.0) * col("n_triangles").cast("double") /
          col("n_wedges").cast("double"), 6).as("transitivity"))
  }

  /** Per-node local clustering coefficient — how close each node's
    * neighborhood is to a clique: lcc(v) = 2·tri(v) / (deg(v)·(deg(v)−1)),
    * the node-level refinement of [[globalTransitivity]] (community
    * cohesion scoring, spam/bot neighborhood detection). Same
    * [[edgeTriangles]] kernel — each undirected triangle detected
    * exactly once, intersection work in-row, Σ out² = O(|E|^1.5)
    * regardless of hubs — but the per-edge closure list is kept and
    * credited to all three corners. Per-node output is |V| rows; the
    * only explode is ONE row per triangle (the closing corner), the
    * two endpoint credits aggregate without exploding.
    *
    * Returns (id, degree, n_tri, lcc) for every node with ≥ 1 edge;
    * degree-1 nodes get null lcc (undefined), exact long counts
    * otherwise, lcc rounded at 6.
    *
    * Storage contract: as in [[globalTransitivity]], the returned
    * frame is lazy and holds edge/orientation/triangle caches while
    * alive — `spark.catalog.clearCache()` once consumed.
    */
  def localClustering(edges: DataFrame): DataFrame = {
    val (deg, oriented, _) = orientByDegree(edges)
    // credit each detected triangle (edge (u,v), closing corner w ∈ ws)
    // to ALL THREE corners: u and v get size(ws) WITHOUT exploding
    // (two map-side-combined aggregates over the |E| edge rows); only
    // the w credits explode, and that explode is exactly one row per
    // triangle — a third of the previous 3-rows-per-triangle explode.
    // persist KEPT by measurement (round-10 A/B: min-of-7 3.74 s
    // persisted vs 4.29/5.93 s without on a quiet host): the three
    // credit aggregates below key on DIFFERENT columns (u, v, exploded
    // w), so only the exchanges FEEDING the triangle join are reusable
    // — the join probe and the Σout² array_intersect would re-execute
    // per consumer without the cache
    val tris = edgeTriangles(oriented)
      .filter(size(col("ws")) > 0)
      .persist() // read 3×: u-credits, v-credits, w-credits
    val uCred = tris.groupBy(col("u").as("id"))
      .agg(sum(size(col("ws"))).as("c"))
    val vCred = tris.groupBy(col("v").as("id"))
      .agg(sum(size(col("ws"))).as("c"))
    val wCred = tris.select(explode(col("ws")).as("id"))
      .groupBy("id").agg(count(lit(1)).cast("long").as("c"))
    val perNode = uCred.unionAll(vCred).unionAll(wCred)
      .groupBy("id").agg(sum("c").as("n_tri"))
    deg.select(col("src").as("id"), col("deg").as("degree"))
      .join(perNode, Seq("id"), "left")
      .na.fill(0L, Seq("n_tri"))
      .select(col("id"), col("degree"), col("n_tri"),
        when(col("degree") >= 2,
          round(lit(2.0) * col("n_tri").cast("double") /
            (col("degree") * (col("degree") - 1)).cast("double"), 6))
          .as("lcc"))
  }

  /** Degree assortativity: the Pearson correlation of endpoint degrees
    * over the directed (symmetrized) edge list — positive when hubs
    * attach to hubs. One degree aggregate, two joins to annotate the
    * edges, then a single map-side-combined power-sum pass (Σx, Σy,
    * Σxy, Σx², Σy² as exact longs); the only floats are the final
    * closed-form division. Returns one row (n_edges, r).
    */
  def degreeAssortativity(edges: DataFrame): DataFrame = {
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val xy = edges
      .join(deg.select(col("src"), col("deg").as("x")), "src")
      .join(deg.select(col("src").as("dst"), col("deg").as("y")), "dst")
    val sums = xy.agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    val n = col("n").cast("double")
    val cov = col("sxy").cast("double") - col("sx").cast("double") * col("sy").cast("double") / n
    val vx = col("sxx").cast("double") - col("sx").cast("double") * col("sx").cast("double") / n
    val vy = col("syy").cast("double") - col("sy").cast("double") * col("sy").cast("double") / n
    // zero endpoint-degree variance (a regular graph) leaves r
    // undefined: emit null, never a divide-by-zero (ANSI) or NaN
    sums.select(col("n").as("n_edges"),
      when(vx > 0 && vy > 0, round(cov / sqrt(vx * vy), 6)).as("assortativity"))
  }

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
    * Cache discipline (the [[Dedup.connectedComponents]] pattern): each
    * round takes ONE eager [[snapshot]] of the grown visited set —
    * materializing the round and truncating lineage so plan depth stays
    * O(1) — and [[release]]s the previous snapshot, so at most the live
    * snapshot plus the one being built are ever cached, no matter the
    * hop bound. A round that reaches no new node ends the walk early
    * (the remaining rounds could only re-derive the same set). The
    * RETURNED frame is the final snapshot; callers iterating many BFS
    * runs in one session should [[release]] it when consumed.
    *
    * The edge projection is snapshotted ONCE up front and released
    * before returning (as are [[longestPathLayers]], [[criticalPath]]
    * and [[sssp]]): the size gate's measurement, the fast-path
    * collect, and every frontier round read the materialized blocks,
    * so callers need not persist the edge frame for THIS call —
    * persist it only when several graph operators share it.
    *
    * Returns (id, hop) with hop in [0, maxHops].
    */
  def bfsHops(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 0, "maxHops must be non-negative")
    val idType = edges.schema("src").dataType
    val (e, nEdges) = sizedEdgeSnapshot(edges.select(col("src"), col("dst")))
    if (integralType(idType) && nEdges <= localEdgeCap(e.sparkSession)) {
      // size-gated driver fast path (see [[localEdgeCap]]): min-hop
      // relaxation in exact ints is bit-identical to the frontier loop
      val arr = e.select(col("src").cast("long"), col("dst").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1), 1L))
      release(e)
      val init = scala.collection.mutable.LongMap.empty[Long]
      seeds.select(col("id").cast("long")).distinct().collect()
        .foreach(r => init(r.getLong(0)) = 0L)
      val res = localRelax(arr, init, maxHops, _ < _)
      return localLabels(edges.sparkSession, res, idType, "hop",
        org.apache.spark.sql.types.IntegerType)
    }
    var visited = snapshot(seeds.select(col("id")).distinct()
      .withColumn("hop", lit(0)))
    var reached = visited.count() // trivial: scans the eager snapshot
    var frontier = visited
    var h = 1
    while (h <= maxHops && frontier != null) {
      val next = frontier
        .join(e, frontier("id") === e("src"))
        .select(col("dst").as("id")).distinct()
        .join(visited, Seq("id"), "left_anti")
        .withColumn("hop", lit(h))
      val grown = snapshot(visited.unionAll(next)) // the round's ONE action
      val total = grown.count()
      release(visited) // superseded — every later read hits `grown`
      frontier =
        if (total == reached) null // empty frontier: nothing left to expand
        else grown.filter(col("hop") === lit(h)) // narrow read of the snapshot
      visited = grown
      reached = total
      h += 1
    }
    release(e) // every round is materialized into the final snapshot
    visited
  }

  /** Bounded DOUBLE-BFS diameter estimate — the standard cheap lower
    * bound: BFS from the minimum node id, take the farthest node
    * reached (ties → smallest id), BFS again from it; the second
    * walk's maximum hop is a diameter lower bound that is exact on
    * trees and empirically tight on real graphs. This is the probe a
    * pipeline runs BEFORE choosing an iterative algorithm's round
    * budget ([[Dedup.connectedComponents]]'s maxIter = diameter, LPA
    * round counts) — mis-sizing those is the classic silent-wrong-
    * result trap this measures away. Both walks are [[bfsHops]]
    * (size-gated local fast path included); the two scalar decisions
    * between them (min id, argmax hop) are deliberate 1-row driver
    * actions, the same bounded-scalar pattern as the A4 mode.
    *
    * Both eccentricities are BOUNDED at `maxHops` — on a graph whose
    * diameter exceeds the bound the result reads `maxHops` (raise it),
    * mirroring the [[bfsHops]] contract. Input must be symmetrized.
    * Returns one row: (seed_id, far_id, ecc_seed, diameter_lb).
    */
  def diameterDoubleBfs(edges: DataFrame, maxHops: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col("src"), col("dst"))
    val seedRow = e.agg(min(col("src")).cast("long")).head
    // empty edge frame: min(src) is null and getLong would NPE on the
    // null primitive (round-10 ADVICE) — the honest answer is an empty
    // result with the contract schema, not an exception
    if (seedRow.isNullAt(0))
      return spark.emptyDataFrame // 0 rows: literal select keeps arity 0
        .select(lit(0L).as("seed_id"), lit(0L).as("far_id"),
          lit(0).as("ecc_seed"), lit(0).as("diameter_lb"))
    val seed0 = seedRow.getLong(0)
    val b1 = bfsHops(e, Seq(seed0).toDF("id"), maxHops)
    val far = b1.orderBy(col("hop").desc, col("id").asc).limit(1)
      .select(col("id").cast("long"), col("hop").cast("int")).head
    val (farId, ecc1) = (far.getLong(0), far.getInt(1))
    bfsHops(e, Seq(farId).toDF("id"), maxHops)
      .agg(max(col("hop")).cast("int").as("diameter_lb"))
      .select(lit(seed0).as("seed_id"), lit(farId).as("far_id"),
        lit(ecc1).as("ecc_seed"), col("diameter_lb"))
  }

  /** Longest-path layering of a DAG — assign every node the length of
    * the longest directed path ending at it (sources get 0), the
    * classic topological "level" used for dependency scheduling, lineage
    * depth reports, and DAG visualization. Iterative max-propagation
    * (distributed Bellman-Ford on −1 weights):
    *   L₀(v) = 0;  L_{r+1}(v) = max(L_r(v), max_{(u,v)∈E} L_r(u)+1)
    * which reaches the fixpoint after `depth` rounds, where depth is the
    * longest path length in the graph. Σ L is strictly monotone until
    * the fixpoint, so an unchanged sum ends the loop early; `maxRounds`
    * bounds it for callers who know their depth (a banded DAG whose
    * edges only go from band b to band b+1 has depth < #bands).
    *
    * The input MUST be acyclic: a cycle makes the recurrence diverge,
    * so the loop would only stop at `maxRounds` with levels that keep
    * growing — this operator does not detect cycles (run it with
    * `maxRounds` = |V| and a still-changing sum as a cheap cycle test).
    *
    * Scale design: per round one edge⋈level join (shuffle on src) and
    * one max-aggregate (shuffle on dst) — O(|E|) per round, map-side
    * combined, no adjacency materialization; one eager [[snapshot]] per
    * round keeps plan depth O(1) and the superseded round is
    * [[release]]d, so at most two level frames (|V| rows each) are ever
    * cached. Returns (id, level).
    */
  def longestPathLayers(edges: DataFrame, maxRounds: Int): DataFrame = {
    require(maxRounds >= 1, "maxRounds must be positive")
    val idType = edges.schema("src").dataType
    val (e, nEdges) = sizedEdgeSnapshot(edges.select(col("src"), col("dst")))
    if (integralType(idType) && nEdges <= localEdgeCap(e.sparkSession)) {
      // size-gated driver fast path (see [[localEdgeCap]]): max-plus
      // over exact longs, synchronous rounds — bit-identical
      val arr = e.select(col("src").cast("long"), col("dst").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1), 1L))
      release(e)
      val init = scala.collection.mutable.LongMap.empty[Long]
      arr.foreach { case (u, v, _) =>
        init.getOrElseUpdate(u, 0L); init.getOrElseUpdate(v, 0L) }
      val res = localRelax(arr, init, maxRounds, _ > _)
      return localLabels(edges.sparkSession, res, idType, "level",
        org.apache.spark.sql.types.LongType)
    }
    val nodes = e.select(col("src").as("id"))
      .unionAll(e.select(col("dst").as("id"))).distinct()
    var lvl = snapshot(nodes.withColumn("level", lit(0L)))
    var levelSum = 0L // Σ L after round 0 (all zero)
    var r = 0
    var fixpoint = false
    while (r < maxRounds && !fixpoint) {
      val relaxed = e.join(lvl, e("src") === lvl("id"))
        .select(col("dst").as("id"), (col("level") + 1L).as("level"))
      val next = snapshot( // the round's materialization
        lvl.unionAll(relaxed).groupBy("id").agg(max("level").as("level")))
      val s = next.agg(coalesce(sum("level"), lit(0L))).head.getLong(0)
      release(lvl) // superseded — every later read hits `next`
      fixpoint = s == levelSum // Σ L monotone: unchanged == converged
      levelSum = s
      lvl = next
      r += 1
    }
    release(e) // final level snapshot is materialized; edges consumed
    lvl
  }

  /** Weighted longest-path cost to every node of a DAG — the CRITICAL
    * PATH kernel (project scheduling, pipeline-latency attribution,
    * lineage cost): cost(v) = max over directed paths ending at v of
    * Σ edge weights, sources 0. The max-plus twin of
    * [[longestPathLayers]] (same fixed-round max-propagation, same
    * Σ-monotone early exit — the sum of per-node maxima strictly grows
    * until fixpoint, so an unchanged sum ends the loop), with LONG
    * weights so every cost is exact. Same acyclicity contract as
    * [[longestPathLayers]]: cycles make the recurrence diverge and are
    * not detected here. Weights must be non-negative.
    *
    * Scale: per round one edge⋈cost join (shuffle on src) + one
    * max-aggregate (shuffle on dst), O(|E|) each, map-side combinable;
    * snapshot/release keeps plan depth O(1) per round.
    *
    * Returns (id, cost) for every node.
    */
  def criticalPath(edges: DataFrame, maxRounds: Int): DataFrame = {
    require(maxRounds >= 1, "maxRounds must be positive")
    val idType = edges.schema("src").dataType
    val (e, nEdges) = sizedEdgeSnapshot(
      edges.select(col("src"), col("dst"), col("w").cast("long").as("w")))
    if (integralType(idType) && nEdges <= localEdgeCap(e.sparkSession)) {
      // size-gated driver fast path (see [[localEdgeCap]])
      val arr = e.select(col("src").cast("long"), col("dst").cast("long"),
          col("w")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      release(e)
      val init = scala.collection.mutable.LongMap.empty[Long]
      arr.foreach { case (u, v, _) =>
        init.getOrElseUpdate(u, 0L); init.getOrElseUpdate(v, 0L) }
      val res = localRelax(arr, init, maxRounds, _ > _)
      return localLabels(edges.sparkSession, res, idType, "cost",
        org.apache.spark.sql.types.LongType)
    }
    val nodes = e.select(col("src").as("id"))
      .unionAll(e.select(col("dst").as("id"))).distinct()
    var cost = snapshot(nodes.withColumn("cost", lit(0L)))
    var costSum = 0L
    var r = 0
    var fixpoint = false
    while (r < maxRounds && !fixpoint) {
      val relaxed = e.join(cost, e("src") === cost("id"))
        .select(col("dst").as("id"), (col("cost") + col("w")).as("cost"))
      val next = snapshot(
        cost.unionAll(relaxed).groupBy("id").agg(max("cost").as("cost")))
      val s = next.agg(coalesce(sum("cost"), lit(0L))).head.getLong(0)
      release(cost)
      fixpoint = s == costSum
      costSum = s
      cost = next
      r += 1
    }
    release(e) // final cost snapshot is materialized; edges consumed
    cost
  }

  /** Per-edge triangle SUPPORT — for every undirected edge {u, v}, the
    * number of triangles through it (= |N(u) ∩ N(v)|), the quantity
    * k-truss peeling filters on and the strongest cheap edge-strength
    * signal (an edge inside a community closes many triangles; a
    * spurious co-occurrence closes none). Same skew-proof
    * [[orientByDegree]] + [[edgeTriangles]] kernel as
    * [[globalTransitivity]]: each triangle {a,b,c} is detected exactly
    * once (at its oriented edge (a,b), closing corner c) and then
    * credits ALL THREE of its edges — one explode row per edge per
    * triangle, output-proportional, never Σdeg² wedge rows. Edges in
    * no triangle surface with support 0 via the left join back to the
    * oriented edge list.
    *
    * Input must be symmetrized ([[symmetrize]]); returns one row per
    * undirected edge: (id1, id2, support) with id1 < id2 ordering of
    * the endpoints NOT guaranteed (id1/id2 are the degree-oriented
    * pair normalized by least/greatest), support an exact long.
    *
    * Storage contract: the returned frame's plan READS the two
    * orientation frames [[orientByDegree]] persists (they are its
    * lineage), so they cannot be unpersisted here without re-deriving
    * them at every consumption. Long-lived sessions that loop over
    * many graphs should `spark.catalog.clearCache()` once the result
    * is consumed — the [[globalTransitivity]]/[[localClustering]]
    * convention.
    */
  def edgeSupport(edges: DataFrame): DataFrame = edgeSupportCore(edges)._1

  /** [[edgeSupport]] plus the two frames [[orientByDegree]] persisted,
    * so LOOPING callers ([[kTrussPeel]]) can unpersist each round's
    * caches once the round's result materializes. */
  private def edgeSupportCore(edges: DataFrame): (DataFrame, Seq[DataFrame]) = {
    val (_, oriented, e) = orientByDegree(edges)
    val tris = edgeTriangles(oriented).filter(size(col("ws")) > 0)
    // one row per (triangle, edge): the detected edge plus the two
    // corner edges, all normalized to (least, greatest)
    val credits = tris.select(explode(col("ws")).as("w"), col("u"), col("v"))
      .select(array(
        struct(least(col("u"), col("v")).as("a"),
          greatest(col("u"), col("v")).as("b")),
        struct(least(col("u"), col("w")).as("a"),
          greatest(col("u"), col("w")).as("b")),
        struct(least(col("v"), col("w")).as("a"),
          greatest(col("v"), col("w")).as("b"))).as("es"))
      .select(explode(col("es")).as("e"))
      .groupBy(col("e.a").as("id1"), col("e.b").as("id2"))
      .agg(count(lit(1)).as("support"))
    val out = oriented
      .select(least(col("src"), col("dst")).as("id1"),
        greatest(col("src"), col("dst")).as("id2"))
      .join(credits, Seq("id1", "id2"), "left")
      .na.fill(0L, Seq("support"))
    (out, Seq(oriented, e))
  }

  /** Fixed-round k-TRUSS peeling — the edge-level refinement of
    * [[kCorePeel]]: each round recomputes per-edge triangle support
    * over the CURRENT edge set and drops every edge with support
    * < k − 2 (the k-truss condition); dropping an edge lowers its
    * neighbors' supports, which the next round sees. As in
    * [[kCorePeel]], `rounds` is the pipeline contract: after r rounds
    * the surviving edges are a monotone-shrinking superset of the true
    * k-truss. A round that removes no edge ends the peel early.
    *
    * Scale: each round is one [[edgeSupport]] pass over the surviving
    * edges — O(|E|^1.5) intersection work in-row, shuffle
    * output-proportional — plus a semi-join restriction; the surviving
    * undirected edge list is snapshotted per round and its predecessor
    * [[release]]d (plan depth O(1)).
    *
    * Input must be symmetrized; returns the surviving undirected edges
    * with their support over the FINAL surviving set:
    * (id1, id2, support), id1 < id2.
    *
    * Storage contract (round-10 ADVICE): per-ROUND caches are released
    * as each round materializes, but the returned frame's lineage
    * still holds the final round's survivor snapshot plus the closing
    * [[edgeSupport]]'s orientation persists — releasing those here
    * would re-derive the whole peel at every consumption. Library
    * callers looping over many graphs in one session should
    * `spark.catalog.clearCache()` (or [[release]] the returned frame)
    * once the result is consumed, exactly as for [[edgeSupport]].
    */
  def kTrussPeel(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 2 && rounds >= 1, "k must be >= 2 and rounds positive")
    var und = snapshot(edges
      .select(least(col("src"), col("dst")).as("id1"),
        greatest(col("src"), col("dst")).as("id2"))
      .distinct())
    var remaining = -1L
    var r = 0
    var fixpoint = false
    while (r < rounds && !fixpoint) {
      val sym = und.select(col("id1").as("src"), col("id2").as("dst"))
        .unionAll(und.select(col("id2").as("src"), col("id1").as("dst")))
      val (sup, caches) = edgeSupportCore(sym)
      val keep = sup.filter(col("support") >= k - 2)
        .select(col("id1"), col("id2"))
      val next = snapshot(und.join(keep, Seq("id1", "id2"), "left_semi"))
      val n = next.count()
      // the round's orientation caches are fully consumed by `next`
      caches.foreach(_.unpersist(blocking = false))
      release(und)
      und = next
      fixpoint = n == remaining
      remaining = n
      r += 1
    }
    edgeSupport(und.select(col("id1").as("src"), col("id2").as("dst"))
        .unionAll(und.select(col("id2").as("src"), col("id1").as("dst"))))
      .select(col("id1"), col("id2"), col("support"))
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
    * Scale design — DELTA peeling (round-10 rewrite of the
    * restrict-and-reaggregate loop): the per-round state is the
    * NODE-degree frame, not the edge list. A round removes nodes with
    * degree < k, then decrements each still-alive node's degree by its
    * edge count INTO the just-removed set — only edges incident to
    * removed nodes are touched (the symmetrized input guarantees the
    * alive side of every dying edge sees it as an out-edge). The edge
    * list is scanned once per round from the caller's frame (persist
    * it — multi-action consumer) but never re-materialized: the old
    * loop snapshot-wrote O(|E|) surviving edges AND re-aggregated full
    * degrees every round, which dominated the query (13 s cold at
    * sf0.1); the per-round shuffle here is the delta aggregate, sized
    * by the removal cascade, plus a node-sized degree update. Each
    * round snapshots the (node, degree) state and [[release]]s its
    * predecessor, so plan depth stays O(1) and at most one superseded
    * frame is held. A round that removes no node ends the peel early
    * (further rounds are identities).
    *
    * Input edges must be symmetrized ([[symmetrize]]); returns
    * (id, degree) for nodes with ≥ 1 surviving edge after the final
    * round, degree counted over the surviving edge list — identical
    * output to the restrict-based formulation, round for round.
    */
  def kCorePeel(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1, "k and rounds must be positive")
    val e = edges.select(col("src"), col("dst"))
    var deg = snapshot(e.groupBy("src").agg(count(lit(1)).as("deg"))
      .select(col("src").as("id"), col("deg")))
    // Alive-node count carried across rounds: an unchanged count means
    // no node fell below k — the fixpoint. It is read from an observe
    // metric filled by the SAME action that materializes the round
    // (the [[Dedup.connectedComponents]] discipline), so each round is
    // exactly ONE driver action; the old loop paid a second one to
    // snapshot-and-test the removed set (round-10 verdict item 4b).
    // The initial count scans the already-materialized degree snapshot.
    var nAlive = deg.count()
    var r = 0
    var done = nAlive == 0L
    while (r < rounds && !done) {
      val obs = org.apache.spark.sql.Observation(s"kcore_round_$r")
      // both filters are narrow reads of the degree snapshot — no
      // separate materialization of the removed set is needed
      val removed = deg.filter(col("deg") < k).select(col("id"))
      val alive = deg.filter(col("deg") >= k)
      // edges from a still-alive src into a just-removed dst lower
      // src's degree; edges between two removed nodes die unobserved
      // (neither endpoint remains to count them)
      val delta = e
        .join(removed.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
        .join(alive.select(col("id").as("src")), Seq("src"), "left_semi")
        .groupBy(col("src").as("id")).agg(count(lit(1)).as("d"))
      val next = snapshot( // the round's ONE action; fills the metric
        alive.join(delta, Seq("id"), "left")
          .select(col("id"),
            (col("deg") - coalesce(col("d"), lit(0L))).as("deg"))
          .observe(obs, count(lit(1)).as("n_alive")))
      val n = obs.get("n_alive").asInstanceOf[Long]
      release(deg)
      deg = next
      done = n == nAlive // nothing removed: further rounds are identities
      nAlive = n
      r += 1
    }
    deg.filter(col("deg") >= 1).select(col("id"), col("deg").as("degree"))
  }

  /** Personalized PageRank: teleportation goes to the SEED set (mass
    * 1/|seeds| each) instead of uniformly everywhere — the random walk
    * restarts at the seeds, so scores measure proximity TO the seeds
    * and the result is the classic graph-recommendation / related-
    * entities kernel. Same fixed-iteration distributed shape as
    * [[pageRank]]: one edge⋈rank join + one aggregate per round,
    * shuffle bounded by |E|, no per-round driver actions; the teleport
    * vector is a broadcast-sized (seed, 1/|seeds|) frame re-joined
    * each round. Non-seed nodes unreachable from the seeds keep rank
    * exactly 0. Returns (id, ppr) rounded at 6.
    */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame, iters: Int,
      d: Double = 0.85): DataFrame = {
    val deg = edges.groupBy("src").agg(count(lit(1)).as("out_deg"))
    val nodes = edges.select(col("src").as("id")).distinct()
    val seedSet = nodes.join(seeds.select(col("id")).distinct(), Seq("id"), "left_semi")
      .persist()
    val nSeeds = seedSet.count()
    require(nSeeds > 0, "personalized PageRank needs at least one seed in the graph")
    val tele = seedSet.withColumn("t", lit(1.0 / nSeeds))
    var pr = tele.select(col("id"), col("t").as("pr"))
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(pr.withColumnRenamed("id", "src"), "src")
        .join(deg, "src")
        .groupBy(col("dst").as("id"))
        .agg(sum(col("pr") / col("out_deg").cast("double")).as("inflow"))
      pr = nodes
        .join(contrib, Seq("id"), "left")
        .join(tele, Seq("id"), "left")
        .select(col("id"),
          (lit(1.0 - d) * coalesce(col("t"), lit(0.0)) +
            lit(d) * coalesce(col("inflow"), lit(0.0))).as("pr"))
    }
    pr.select(col("id"), round(col("pr"), 6).as("ppr"))
  }

  /** Link-prediction parameters derived from the MEASURED degree
    * distribution — the [[graft.ext.Similarity.planesForCount]]
    * discipline applied to [[commonNeighbors]]/[[adamicAdar]]/
    * [[nodeJaccard]]: a fixed `maxApexDegree`/`minCommon` pair is
    * tuned to ONE graph density and silently goes vacuous when the
    * density moves (the round-10 verdict's exact finding — the
    * co-purchase graph gets SPARSER per node at larger scale, so a
    * fixed minCommon = 2 returns an empty answer while still paying
    * the full wedge cost).
    *
    *  - `maxApexDegree = max(8, 20 · ⌊|rows| / |nodes|⌋)`: the hub/IDF
    *    cut scales with mean degree — an apex is "hub" relative to the
    *    graph it lives in, not to an absolute constant.
    *  - `minCommon = max(1, ⌊mean⌋ / 2)`: under the degree-random null
    *    a pair's expected common-neighbor count grows with density, so
    *    the noise floor rises with the mean; on a sparse graph
    *    (mean < 4) a single shared neighbor is already signal.
    *
    * All arithmetic is exact-integer floor division so a DuckDB oracle
    * replays the identical derivation from the same edge list. The one
    * measurement is a single count/count-distinct aggregate over the
    * (symmetrized) edge frame — callers that persist the edges (the
    * registry does; loops re-read them anyway) pay one cached scan.
    * On an empty edge frame the floors (8, 1) come back and the
    * operators return empty results without dividing by zero.
    */
  def linkPredictionParams(edges: DataFrame): (Long, Long) = {
    val row = edges.agg(count(lit(1)).as("n_rows"),
      countDistinct(col("src")).as("n_nodes")).head
    val nRows = row.getLong(0)
    val nNodes = row.getLong(1)
    val mean = if (nNodes == 0L) 0L else nRows / nNodes
    (math.max(8L, 20L * mean), math.max(1L, mean / 2L))
  }

  /** Common-neighbor link prediction: for every NON-adjacent node pair
    * reachable in two hops, the number of shared neighbors — the
    * classic "people you may know" / related-items candidate score.
    * Wedges are generated by grouping the symmetrized edge list on the
    * shared apex (u→v, u→w with v < w ⇒ candidate (v, w)), so each
    * common neighbor contributes exactly one wedge and the per-pair
    * count IS the common-neighbor count; existing edges are removed by
    * one anti-join so only genuinely-new links remain.
    *
    * Scale design: exact CN counting is inherently Σ deg(apex)² wedge
    * work, and that sum is dominated by hubs — so the skew control is
    * `maxApexDegree`: apexes above it are EXCLUDED before the wedge
    * self-join (one degree aggregate + one semi-join). That is not just
    * a performance cap; it is the IDF principle — a neighbor shared
    * with everyone carries no link signal — which is why production
    * link-prediction systems (and the oracle, which applies the same
    * filter) drop hub apexes rather than sampling them. After the cap,
    * wedge work is ≤ |E_kept| · maxApexDegree, linear in edges. The
    * final TopK orders by (cn DESC, v, w) — a deterministic total
    * order, taken with TakeOrderedAndProject (no global sort).
    *
    * Input must be symmetrized ([[symmetrize]]); returns (id1, id2, cn)
    * with id1 < id2.
    */
  def commonNeighbors(edges: DataFrame, maxApexDegree: Long, minCommon: Long,
      topK: Int): DataFrame = {
    require(maxApexDegree >= 1 && minCommon >= 1 && topK >= 1,
      "maxApexDegree, minCommon and topK must be positive")
    // Sampled symmetry guard: the degree cap, the wedge grouping and
    // the final anti-join all assume BOTH orientations of every edge
    // are present — a directed input silently returns wrong counts.
    // Probing a handful of edges for their reverses costs one
    // early-stopping limit plus one scan with a pushed-down predicate;
    // it catches the common mistake (caller forgot [[symmetrize]])
    // without the O(|E|) shuffle a full except-based check would pay.
    // NOTE this makes the operator EAGER at call time (two jobs run
    // before any action on the result). Null-keyed rows are excluded
    // from the probe — `lit(null) === x` never matches, so probing
    // them would fail a legitimately symmetrized list with a
    // misleading "not symmetrized" message (they also generate no
    // wedges downstream: the equi-joins drop null keys).
    val probe = edges.select(col("src"), col("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .limit(16).collect()
    if (probe.nonEmpty) {
      val rev = probe.map(r => (r.get(1), r.get(0))).distinct
      val cond = rev.map { case (s0, d0) =>
          col("src") === lit(s0) && col("dst") === lit(d0) }
        .reduce(_ || _)
      val found = edges.filter(cond).select(col("src"), col("dst"))
        .distinct().count()
      require(found == rev.length,
        s"commonNeighbors requires a symmetrized edge list (Graph.symmetrize): " +
          s"only $found of ${rev.length} probed reverse edges exist")
    }
    val keepApex = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      .filter(col("deg") <= maxApexDegree)
      .select(col("src"))
    val kept = edges.join(keepApex, Seq("src"), "left_semi")
      .select(col("src").as("u"), col("dst").as("v"))
      .persist() // both wedge legs read it
    val cn = kept
      .join(kept.select(col("u"), col("v").as("w")), Seq("u"))
      .filter(col("v") < col("w"))
      .groupBy(col("v").as("id1"), col("w").as("id2"))
      .agg(count(lit(1)).as("cn"))
      .filter(col("cn") >= minCommon)
    // materialize the (≤ topK rows) result eagerly so the wedge-leg
    // cache can be RELEASED before returning — library callers get no
    // accumulating storage across calls (the Dedup persist/unpersist
    // discipline); lineage truncation is a free side effect.
    val out = cn.join(edges.select(col("src").as("id1"), col("dst").as("id2")),
        Seq("id1", "id2"), "left_anti")
      .orderBy(col("cn").desc, col("id1"), col("id2"))
      .limit(topK)
      .localCheckpoint(eager = true, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    kept.unpersist()
    out
  }

  /** Neighborhood Jaccard similarity: [[commonNeighbors]] candidates
    * rescored as cn / (deg(v) + deg(w) − cn) — |N∩N| / |N∪N|, the
    * normalized node-similarity used for item-item recommendation and
    * entity-merge candidates, where raw cn favors high-degree nodes.
    * The ORDER is exact-integer: `jaccard_ppb` = cn·10⁹ DIV union —
    * no float enters the top-k cut; the rounded double is cosmetic.
    *
    * Semantics under the cap: cn counts wedges through apexes with
    * deg ≤ `maxApexDegree` (the [[commonNeighbors]] IDF cap) while the
    * union term uses TRUE degrees — so the score is a LOWER bound on
    * the uncapped Jaccard, exact when no apex exceeds the cap
    * (equality is unit-gated on such a graph). Scale is the
    * commonNeighbors argument verbatim.
    *
    * Input must be symmetrized ([[symmetrize]]); returns (id1, id2,
    * cn, d1, d2, jaccard_ppb, jaccard) with id1 < id2, non-adjacent
    * pairs only, top `topK` by (jaccard_ppb DESC, id1, id2).
    */
  def nodeJaccard(edges: DataFrame, maxApexDegree: Long, minCommon: Long,
      topK: Int): DataFrame = {
    require(maxApexDegree >= 1 && minCommon >= 1 && topK >= 1,
      "maxApexDegree, minCommon and topK must be positive")
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val kept = edges
      .join(deg.filter(col("deg") <= maxApexDegree).select("src"),
        Seq("src"), "left_semi")
      .select(col("src").as("u"), col("dst").as("v"))
      .persist() // both wedge legs read it
    val out = kept
      .join(kept.select(col("u"), col("v").as("w")), Seq("u"))
      .filter(col("v") < col("w"))
      .groupBy(col("v").as("id1"), col("w").as("id2"))
      .agg(count(lit(1)).as("cn"))
      .filter(col("cn") >= minCommon)
      .join(edges.select(col("src").as("id1"), col("dst").as("id2")),
        Seq("id1", "id2"), "left_anti")
      .join(deg.select(col("src").as("id1"), col("deg").as("d1")), "id1")
      .join(deg.select(col("src").as("id2"), col("deg").as("d2")), "id2")
      .select(col("id1"), col("id2"), col("cn"), col("d1"), col("d2"),
        expr("cn * CAST(1000000000 AS BIGINT) DIV (d1 + d2 - cn)")
          .as("jaccard_ppb"),
        round(col("cn").cast("double") /
          (col("d1") + col("d2") - col("cn")).cast("double"), 6).as("jaccard"))
      .orderBy(col("jaccard_ppb").desc, col("id1"), col("id2"))
      .limit(topK)
      .localCheckpoint(eager = true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    kept.unpersist()
    out
  }

  /** 2-bounded harmonic centrality: for every node, Σ_{w≠v} 1/d(v,w)
    * truncated at distance 2 — the "how many nodes are NEAR me"
    * influence score that, unlike closeness, is defined on disconnected
    * graphs (unreachable nodes contribute 0, not ∞). With hop counts
    * n1 = |N(v)| and n2 = |{w : d(v,w) = 2}|, the score is n1 + n2/2 —
    * carried as the EXACT integer `harmonic6` = 6·n1 + 3·n2 (the
    * rounded double is cosmetic).
    *
    * Scale: n2 requires the DISTINCT 2-hop pair set — the inherent
    * Σ deg(mid)² wedge bound ([[globalTransitivity]]'s shape, plus one
    * dedup shuffle on the pair set). `maxMidDegree` caps the midpoint
    * like [[commonNeighbors]]' apex cap: the result is exact iff every
    * midpoint degree ≤ the cap (unit-gated); above it, paths through
    * mega-hubs are ignored — the standard approximation, since a hub
    * puts ~everything at distance 2 and the score saturates. Returns
    * (id, n1, n2, harmonic6, harmonic) for every node with an edge.
    */
  def harmonicCloseness2(edges: DataFrame, maxMidDegree: Long): DataFrame = {
    require(maxMidDegree >= 1, "maxMidDegree must be positive")
    val deg = edges.groupBy("src").agg(count(lit(1)).as("n1"))
    // one leg per (endpoint, midpoint) with the MIDPOINT capped; by
    // symmetry the second leg is the same frame renamed, so the cap
    // applies to the shared mid node on both legs
    val leg = edges.select(col("src").as("u"), col("dst").as("x"))
      .join(deg.filter(col("n1") <= maxMidDegree).select(col("src").as("x")),
        Seq("x"), "left_semi")
    val twoHop = leg
      .join(leg.select(col("u").as("u2"), col("x")), Seq("x"))
      .filter(col("u") =!= col("u2"))
      .select(col("u"), col("u2")).distinct()
      .join(edges.select(col("src").as("u"), col("dst").as("u2")),
        Seq("u", "u2"), "left_anti")
      .groupBy(col("u").as("id")).agg(count(lit(1)).as("n2"))
    deg.select(col("src").as("id"), col("n1"))
      .join(twoHop, Seq("id"), "left")
      .na.fill(0L, Seq("n2"))
      .select(col("id"), col("n1"), col("n2"),
        (col("n1") * 6 + col("n2") * 3).as("harmonic6"),
        round((col("n1") * 6 + col("n2") * 3).cast("double") / 6.0, 6)
          .as("harmonic"))
  }

  /** Newman modularity of a given node partition: per community c,
    * contribution Q_c = e_c/m − (d_c/2m)², where e_c = within-community
    * edges, d_c = total degree in c, m = undirected edge count; Q = ΣQ_c
    * measures how much denser communities are than a random graph with
    * the same degrees (> ~0.3 = real structure). All terms are carried
    * in DOUBLED form over the symmetrized edge list (M2 = 2m directed
    * rows, e2_c = within-c directed rows), so the cleared contribution
    *   q_num_c = e2_c·M2 − d_c²,  Q_c = q_num_c / M2²
    * is exact long arithmetic with one final division. Overflow binds
    * at M2² < 2⁶³ (m ≈ 1.5·10⁹ edges; shard by community past that).
    *
    * Scale: one degree aggregate, two broadcast-sized label joins onto
    * the edge list (labels are |V| rows — co-partitioned joins at
    * 100 TB), one count to |communities| cells; everything downstream
    * is community-grid-sized. Nodes missing from `labels` are dropped
    * from d_c and their edges from e_c — label completeness is the
    * caller's contract. Returns one row per community: (community,
    * n_nodes, e2_in, d_tot, q_num, contrib).
    */
  def modularity(edges: DataFrame, labels: DataFrame): DataFrame = {
    val lab = labels.select(col("id"), col("community"))
    // everything — degrees, m, e_c — is over the LABELED subgraph, so
    // incomplete labels shrink the graph consistently instead of
    // skewing d_c against m
    val labeled = edges
      .join(lab.select(col("id").as("src"), col("community").as("c_src")), "src")
      .join(lab.select(col("id").as("dst"), col("community").as("c_dst")), "dst")
    val within = labeled.filter(col("c_src") === col("c_dst"))
      .groupBy(col("c_src").as("community")).agg(count(lit(1)).as("e2_in"))
    val dTot = labeled.groupBy(col("src"), col("c_src").as("community"))
      .agg(count(lit(1)).as("deg"))
      .groupBy("community")
      .agg(count(lit(1)).as("n_nodes"), sum("deg").as("d_tot"))
    val m2 = labeled.agg(count(lit(1)).as("m2"))
    dTot.join(within, Seq("community"), "left")
      .na.fill(0L, Seq("e2_in"))
      .crossJoin(broadcast(m2)) // 1-row scalar
      .select(col("community"), col("n_nodes"), col("e2_in"), col("d_tot"),
        (col("e2_in") * col("m2") - col("d_tot") * col("d_tot")).as("q_num"),
        round((col("e2_in") * col("m2") - col("d_tot") * col("d_tot"))
          .cast("double") / (col("m2") * col("m2")).cast("double"), 6)
          .as("contrib"))
  }

  /** Adamic–Adar link prediction: [[commonNeighbors]] with each shared
    * neighbor DOWN-WEIGHTED by its popularity — score(v,w) =
    * Σ_{u ∈ N(v)∩N(w)} 1/ln(deg(u)) — the classic refinement where a
    * neighbor shared with half the graph counts for almost nothing but
    * a rare shared contact counts for a lot. Same wedge machinery (one
    * degree aggregate, apex cap, one wedge self-join, one anti-join
    * against existing edges, deterministic top-K), with the apex's
    * 1/ln(deg) carried on the wedge leg and SUMMED per candidate pair.
    * An apex has deg ≥ 2 by construction (it touches both endpoints),
    * so ln(deg) > 0 always.
    *
    * Determinism note: the per-pair score is a sum of ≤ maxApexDegree
    * doubles, so it carries FP addition-order sensitivity like
    * [[pageRank]]'s inflow sums — rounded at 6 for the cross-engine
    * gate (the integer `cn` column is exact). Scale is the
    * [[commonNeighbors]] argument verbatim: wedge work ≤ |E_kept| ·
    * maxApexDegree after the cap, and the cap IS the model (hub apexes
    * carry no signal).
    *
    * Input must be symmetrized ([[symmetrize]]); returns (id1, id2, cn,
    * aa) with id1 < id2, ordered by (aa DESC, id1, id2), top `topK`.
    */
  def adamicAdar(edges: DataFrame, maxApexDegree: Long, minCommon: Long,
      topK: Int): DataFrame = {
    require(maxApexDegree >= 2 && minCommon >= 1 && topK >= 1,
      "maxApexDegree must be >= 2; minCommon and topK must be positive")
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    // deg-1 apexes can't close a wedge AND would divide by ln(1)=0
    // under ANSI — drop them before the weight is computed
    val kept = edges
      .join(deg.filter(col("deg") >= 2 && col("deg") <= maxApexDegree), "src")
      .select(col("src").as("u"), col("dst").as("v"),
        (lit(1.0) / log(col("deg").cast("double"))).as("w_apex"))
      .persist() // both wedge legs read it
    val out = kept
      .join(kept.select(col("u"), col("v").as("w")), Seq("u"))
      .filter(col("v") < col("w"))
      .groupBy(col("v").as("id1"), col("w").as("id2"))
      .agg(count(lit(1)).as("cn"), sum("w_apex").as("aa_raw"))
      .filter(col("cn") >= minCommon)
      .join(edges.select(col("src").as("id1"), col("dst").as("id2")),
        Seq("id1", "id2"), "left_anti")
      .select(col("id1"), col("id2"), col("cn"),
        round(col("aa_raw"), 6).as("aa"))
      .orderBy(col("aa").desc, col("id1"), col("id2"))
      .limit(topK)
      .localCheckpoint(eager = true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    kept.unpersist()
    out
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
      if (truncateLineage) pr = pr.localCheckpoint(true, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    }
    pr.select(col("id"), round(col("pr"), 6).as("pr"))
  }

  /** PageRank over a genuinely DIRECTED edge list, with the
    * dangling-mass term [[pageRank]] deliberately omits: sink nodes
    * (out-degree 0 — they exist in any directed graph, never in a
    * symmetrized one) contribute their whole rank, damped, as a
    * uniform redistribution, so total rank mass stays exactly 1 every
    * round instead of leaking out at the sinks — the classic web-graph
    * correction.
    *
    * Scale shape: per round, ONE |E|-bounded contribution join +
    * aggregate (out-degree rides along in the rank frame, so no extra
    * join) plus a 1-ROW dangling-rank scalar cross-joined back — a
    * broadcast of one double, not a shuffle. Node spine = src ∪ dst.
    * Fixed iteration count, no per-round driver actions;
    * `truncateLineage` cuts the plan per round for deep counts (the
    * rank frame is referenced twice per round — dangling scalar +
    * contribution — so plan size doubles per round without it).
    *
    * Returns (id, pr) rounded at 6.
    */
  def pageRankDirected(edges: DataFrame, iters: Int, d: Double = 0.85,
      truncateLineage: Boolean = false): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    val deg = e.groupBy("src").agg(count(lit(1)).as("out_deg"))
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val spine = nodes.join(deg.withColumnRenamed("src", "id"), Seq("id"), "left")
      .select(col("id"), coalesce(col("out_deg"), lit(0L)).as("out_deg"))
    val n = nodes.count()
    var pr = spine.withColumn("pr", lit(1.0 / n))
    for (_ <- 1 to iters) {
      val dangling = pr.filter(col("out_deg") === 0L)
        .agg(coalesce(sum("pr"), lit(0.0)).as("dm")) // 1-row scalar
      val contrib = e
        .join(pr.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(sum(col("pr") / col("out_deg").cast("double")).as("inflow"))
      pr = spine
        .join(contrib, Seq("id"), "left")
        .crossJoin(dangling) // one row: the broadcastable dangling mass
        .select(col("id"), col("out_deg"),
          (lit((1.0 - d) / n) + lit(d) *
            (coalesce(col("inflow"), lit(0.0)) + col("dm") / n)).as("pr"))
      if (truncateLineage) pr = pr.localCheckpoint(true, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    }
    pr.select(col("id"), round(col("pr"), 6).as("pr"))
  }

  /** HITS (hubs & authorities, Kleinberg) over a DIRECTED edge list,
    * in the INTEGER-EXACT unnormalized form: with h₀ ≡ 1,
    *   aₖ(v) = Σ_{(u,v)∈E} hₖ₋₁(u),   hₖ(u) = Σ_{(u,v)∈E} aₖ(v),
    * every intermediate is an exact long (aₖ/hₖ count directed
    * alternating walks of length 2k−1 / 2k ending/starting at the
    * node), and the single normalization happens ONCE at the end
    * (score / max score), so no per-iteration float normalization
    * order can diverge between engines. The eigenvector limit is the
    * same either way — normalization placement only rescales.
    *
    * Overflow bound: scores grow like D^(2·iters) for max total degree
    * D, so the default iters=2 is safe for any graph with D < ~55 000
    * (D⁴ < 2⁶³); deeper iteration on hub-heavy graphs should divide
    * scores by their max each round (and accept float rounding) — this
    * exact form deliberately doesn't.
    *
    * Scale shape: per half-iteration ONE |E|-bounded join + sum
    * aggregate (shuffle keyed by dst then src), snapshotted
    * ([[snapshot]]/[[release]]) so plan depth stays O(1) per step and
    * the node spine materializes once instead of re-running its
    * distinct at every of the 2·iters+1 references. Nodes with no
    * in-edges get authority 0, no out-edges get hub 0 (the spine
    * left-join). Callers should persist the edge frame — every
    * half-step re-reads it.
    *
    * Returns (id, hub, auth) with both scores max-normalized to [0,1]
    * and rounded at 6.
    */
  def hits(edges: DataFrame, iters: Int = 2): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val e = edges.select(col("src"), col("dst"))
    // the spine is re-joined 2·iters times + once at the output —
    // materialize it once instead of re-running the distinct each time
    val nodes = snapshot(e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct())
    var h = nodes.withColumn("h", lit(1L))
    var a = nodes.withColumn("a", lit(0L))
    for (_ <- 1 to iters) {
      val aAgg = e.join(h.select(col("id").as("src"), col("h")), "src")
        .groupBy(col("dst").as("id")).agg(sum("h").as("a"))
      val aNext = snapshot(nodes.join(aAgg, Seq("id"), "left")
        .select(col("id"), coalesce(col("a"), lit(0L)).as("a")))
      release(a) // superseded (no-op on the round-0 derived frame)
      a = aNext
      val hAgg = e.join(a.select(col("id").as("dst"), col("a")), "dst")
        .groupBy(col("src").as("id")).agg(sum("a").as("h"))
      val hNext = snapshot(nodes.join(hAgg, Seq("id"), "left")
        .select(col("id"), coalesce(col("h"), lit(0L)).as("h")))
      release(h)
      h = hNext
    }
    // Materialize the joined scores ONCE: both consumers below (the
    // 1-row maxima and the normalized output) would otherwise replay
    // the final join — then release every internal snapshot it
    // supersedes.
    val ha = h.join(a, "id").localCheckpoint(true,
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    release(h); release(a); release(nodes)
    // one-row maxima, broadcast back — the scalar-attach pattern every
    // share-of-total query uses (BroadcastNestedLoop on a 1-row side)
    val maxes = ha.agg(max("h").as("mh"), max("a").as("ma"))
    ha.crossJoin(maxes)
      .select(col("id"),
        round(col("h").cast("double") / nullif(col("mh"), lit(0L)).cast("double"), 6).as("hub"),
        round(col("a").cast("double") / nullif(col("ma"), lit(0L)).cast("double"), 6).as("auth"))
  }

  /** Bounded-hop weighted single-source shortest paths (multi-source):
    * distₖ(v) = min total weight over paths of ≤ `maxHops` edges from
    * any seed — distributed Bellman-Ford, the weighted generalization
    * of [[bfsHops]]. Weights are LONGS (callers quantize float costs),
    * so every distance is exact and the result hashes identically on
    * any engine. Weights MUST be non-negative (not validated — that
    * would cost an eager scan): with a hop bound the recurrence still
    * terminates on negative weights, but "shortest within k hops"
    * stops being monotone in k, which is never what a caller means.
    *
    * Per round: ONE frontier⋈edges relaxation (shuffle ≤ |E|) + ONE
    * min-aggregate over (old dists ∪ relaxed candidates) — map-side
    * combinable, keyed by node. The dist frame is referenced TWICE per
    * round (union branch + join branch), so each round is snapshotted
    * ([[snapshot]]) to keep plan depth O(1) and the superseded round
    * released — the BFS/k-core discipline. Fixed `maxHops` rounds, one
    * eager action per round (the checkpoint itself).
    *
    * Returns (id, dist) for every node reachable within `maxHops`
    * hops; unreachable nodes are absent (the BFS contract).
    */
  def sssp(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 0, "maxHops must be non-negative")
    val idType = edges.schema("src").dataType
    val (e, nEdges) = sizedEdgeSnapshot(edges.select(col("src"), col("dst"),
      col("w").cast("long").as("w")))
    if (integralType(idType) && nEdges <= localEdgeCap(e.sparkSession)) {
      // size-gated driver fast path (see [[localEdgeCap]]): min-plus
      // over exact longs; with non-negative weights a no-change round
      // is the fixpoint, so early exit equals the fixed-round result
      val arr = e.select(col("src").cast("long"), col("dst").cast("long"),
          col("w")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      release(e)
      val init = scala.collection.mutable.LongMap.empty[Long]
      seeds.select(col("id").cast("long")).distinct().collect()
        .foreach(r => init(r.getLong(0)) = 0L)
      val res = localRelax(arr, init, maxHops, _ < _)
      return localLabels(edges.sparkSession, res, idType, "dist",
        org.apache.spark.sql.types.LongType)
    }
    var dist = snapshot(seeds.select(col("id")).distinct()
      .withColumn("dist", lit(0L)))
    for (_ <- 1 to maxHops) {
      val relaxed = dist.join(e, dist("id") === e("src"))
        .select(col("dst").as("id"), (col("dist") + col("w")).as("dist"))
      val next = snapshot(dist.unionAll(relaxed)
        .groupBy("id").agg(min("dist").as("dist")))
      release(dist)
      dist = next
    }
    release(e) // final dist snapshot is materialized; edges consumed
    dist
  }

  /** Synchronous label propagation (fixed `rounds`) — the cheap
    * community detector: every node starts as its own label and each
    * round adopts its neighbors' PLURALITY label, ties broken by the
    * SMALLEST label, so the update is a pure deterministic function of
    * the previous round (no RNG, no visit order — the properties a
    * cross-engine oracle needs; classic async LPA is neither). Fixed
    * round count is the pipeline contract, as in [[pageRank]].
    *
    * Scale: per round ONE |E|-bounded join + a (node, label) count +
    * one per-node argmax — all map-side combinable; each round
    * snapshots (plan depth O(1)) and releases its predecessor. Input
    * is the symmetrized edge list; isolated nodes never appear (an
    * edge list defines them away). Returns (id, community).
    */
  def labelPropagation(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    // the caller's edge list is typically an expensive derivation and
    // is re-read every round — persist it once (the orientByDegree
    // lesson: unpersisted, the co-purchase self-join recomputed per
    // round and dominated the query)
    val e = edges.select(col("src"), col("dst")).persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    var lbl = snapshot(e.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id")))
    for (_ <- 1 to rounds) {
      val votes = e.join(lbl.select(col("id").as("src"), col("lbl")), "src")
        .groupBy(col("dst").as("id"), col("lbl"))
        .agg(count(lit(1)).as("c"))
      // argmax by (count, −label): lexicographic struct max = plurality
      // with min-label ties — the deterministic update rule
      val next = snapshot(votes
        .groupBy("id")
        .agg(max(struct(col("c"), (-col("lbl")).as("nl"))).as("best"))
        .select(col("id"), (-col("best.nl")).as("lbl")))
      release(lbl)
      lbl = next
    }
    // lbl is an EAGER localCheckpoint (its blocks hold the labels; the
    // plan no longer references e), so the edge cache can be released
    // before returning — otherwise every call strands an edge-list's
    // storage until driver GC (round-9 verdict finding #1)
    e.unpersist(blocking = false)
    lbl.select(col("id"), col("lbl").as("community"))
  }

  /** Conductance of a labeled partition: for every community c,
    * φ(c) = cut(c) / min(vol(c), 2m − vol(c)) — how leaky the
    * community boundary is (the quality score that complements
    * [[modularity]]: modularity rewards density, conductance punishes
    * escape mass). Over the symmetrized edge list each undirected cut
    * edge contributes exactly one (src ∈ c, dst ∉ c) row per side, so
    * cut, vol (= Σ directed degree inside) and 2m are all exact longs
    * from ONE doubly-labeled edge pass; the division is the only
    * float. Unlabeled endpoints shrink the graph consistently, as in
    * [[modularity]]. Returns (community, vol, cut, conductance).
    */
  def conductance(edges: DataFrame, labels: DataFrame): DataFrame = {
    val lab = labels.select(col("id"), col("community"))
    val labeled = edges
      .join(lab.select(col("id").as("src"), col("community").as("c_src")), "src")
      .join(lab.select(col("id").as("dst"), col("community").as("c_dst")), "dst")
    // NO persist: both consumers (the per-community aggregate and the
    // 2m scalar) sit in one job above identical join exchanges, which
    // ReusedExchange dedupes — the round-10 A/B measured 1.80 s
    // persisted vs 1.54 s without (min-of-5/7, quiet host)
    val m2 = labeled.agg(count(lit(1)).as("m2"))
    labeled
      .groupBy(col("c_src").as("community"))
      .agg(count(lit(1)).as("vol"),
        sum((col("c_src") =!= col("c_dst")).cast("long")).as("cut"))
      .crossJoin(broadcast(m2)) // 1-row scalar total
      .select(col("community"), col("vol"), col("cut"),
        when(least(col("vol"), col("m2") - col("vol")) > 0,
          round(col("cut").cast("double") /
            least(col("vol"), col("m2") - col("vol")).cast("double"), 6))
          .as("conductance"))
  }

  /** Strongly-connected-component labels of a CATEGORY-LEVEL digraph
    * by reachability-closure squaring: R ← R ∪ R∘R doubles the covered
    * path length each round (log₂(longest path) joins, early exit at
    * the count fixpoint), then scc(u) = min over {v : R(u,v) ∧ R(v,u)}
    * ∪ {u} — node u and v share a label iff they reach each other.
    * Returns (node, scc_id, scc_size), scc_id the smallest member.
    *
    * Scale contract — this is NOT the per-row-entity SCC: the closure
    * is |V|²-bounded, so the input must be a graph whose vertex set is
    * a CATEGORY cardinality (event-type transition digraphs, state
    * machines, category co-movement graphs — the condensation
    * consumers), where |V|² is thousands, not billions. The row-scale
    * work is the caller's edge derivation (one windowed pass over the
    * fact table); everything here is grid-sized. Each round snapshots
    * the grown closure and releases the superseded one (the
    * [[bfsHops]] cache discipline); the returned frame is a final
    * snapshot — `spark.catalog.clearCache()` once consumed.
    */
  def sccLabels(edges: DataFrame, maxDoublings: Int = 6): DataFrame = {
    val base = snapshot(edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst")).distinct())
    val nodes = snapshot(base.select(col("src").as("id"))
      .unionAll(base.select(col("dst").as("id"))).distinct())
    var r = base
    var n = r.count()
    var fixed = n == 0L
    var i = 0
    while (!fixed && i < maxDoublings) {
      val grown = snapshot(
        r.as("x").join(r.as("y"), col("x.dst") === col("y.src"))
          .select(col("x.src").as("src"), col("y.dst").as("dst"))
          .unionAll(r).distinct())
      val m = grown.count()
      fixed = m == n
      release(r)
      r = grown
      n = m
      i += 1
    }
    // fail LOUDLY on truncation: an unconverged closure silently merges
    // fewer nodes than the true SCCs (wrong labels), and nothing
    // downstream can tell converged from truncated — a graph exceeding
    // the category-level contract must error, not mislabel
    if (!fixed) {
      release(r); release(nodes)
      throw new IllegalStateException(
        s"sccLabels: reachability closure not at fixpoint after " +
        s"$maxDoublings doublings (walks up to ${1 << maxDoublings}); " +
        s"input exceeds the category-level contract — raise maxDoublings")
    }
    val mutual = r.as("f").join(
      r.select(col("dst").as("rsrc"), col("src").as("rdst")).as("b"),
      col("f.src") === col("rsrc") && col("f.dst") === col("rdst"))
      .select(col("f.src").as("id"), col("f.dst").as("peer"))
    val out = snapshot(nodes.join(mutual, Seq("id"), "left")
      .groupBy("id").agg(min("peer").as("mp"))
      .select(col("id").as("node"),
        least(col("id"), coalesce(col("mp"), col("id"))).as("scc_id"))
      .withColumn("scc_size",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy("scc_id"))))
    release(r)
    release(nodes)
    out
  }

  /** Bipartiteness check per connected component of a CATEGORY-LEVEL
    * graph (input symmetrized here): closure squaring as in
    * [[sccLabels]] but carrying walk PARITY — a component contains an
    * odd cycle (is non-2-colorable) iff any node closes an odd walk to
    * itself, the classic two-sides-or-not question for interaction
    * graphs (buyer/seller, query/document) where an odd cycle means
    * the two-role model is violated. Returns
    * (node, comp_id, comp_bipartite), comp_id the smallest member.
    *
    * Same |V|²-bounded scale contract, cache discipline, and
    * count-fixpoint loop as [[sccLabels]] (states here are
    * (src, dst, parity) — at most 2|V|²); the returned frame is a
    * final snapshot — `spark.catalog.clearCache()` once consumed.
    */
  def bipartiteComponents(edges: DataFrame,
      maxDoublings: Int = 6): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val sym = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst")).distinct()
    val base = snapshot(sym.withColumn("p", lit(1)))
    val nodes = snapshot(base.select(col("src").as("id")).distinct())
    var r = base
    var n = r.count()
    var fixed = n == 0L
    var i = 0
    while (!fixed && i < maxDoublings) {
      val grown = snapshot(
        r.as("x").join(r.as("y"), col("x.dst") === col("y.src"))
          .select(col("x.src").as("src"), col("y.dst").as("dst"),
            pmod(col("x.p") + col("y.p"), lit(2)).as("p"))
          .unionAll(r).distinct())
      val m = grown.count()
      fixed = m == n
      release(r)
      r = grown
      n = m
      i += 1
    }
    // same loud-truncation contract as [[sccLabels]]: an unconverged
    // parity closure can miss the odd cycle and call a component
    // bipartite that is not
    if (!fixed) {
      release(r); release(nodes)
      throw new IllegalStateException(
        s"bipartiteComponents: parity closure not at fixpoint after " +
        s"$maxDoublings doublings (walks up to ${1 << maxDoublings}); " +
        s"input exceeds the category-level contract — raise maxDoublings")
    }
    val lab = nodes
      .join(r.select(col("src").as("id"), col("dst").as("peer")),
        Seq("id"), "left")
      .groupBy("id").agg(min("peer").as("mp"))
      .select(col("id").as("node"),
        least(col("id"), coalesce(col("mp"), col("id"))).as("comp_id"))
    val odd = r.filter(col("src") === col("dst") && col("p") === 1)
      .select(col("src").as("node")).distinct().withColumn("o", lit(1))
    val out = snapshot(lab.join(odd, Seq("node"), "left")
      .withColumn("comp_bipartite",
        max(coalesce(col("o"), lit(0)))
          .over(w.partitionBy("comp_id")) === 0)
      .select(col("node"), col("comp_id"), col("comp_bipartite")))
    release(r)
    release(nodes)
    out
  }

  /** Stationary distribution of a CATEGORY-LEVEL Markov chain by fixed
    * power iteration: π ← πP for `iters` rounds from uniform, with
    * P(i,j) the observed transition fraction (exact counts, one
    * division) — "where does the behavior process settle?", the
    * equilibrium complement to the raw transition table (a state can
    * be rare in transitions yet heavy at equilibrium if it RETAINS).
    * Dangling states (no outgoing edge) redistribute uniformly (the
    * PageRank convention, no damping).
    *
    * Scale contract as [[sccLabels]]: the chain lives on a CATEGORY
    * vertex set, so every iteration is a k-row join + k-row aggregate.
    * The dangling mass is folded INTO the transition matrix up front
    * (each dangling state gets k uniform out-edges), so a round reads
    * the previous π exactly ONCE — π feeding two consumers per round
    * would embed the previous round's plan twice, a 2^iters tree that
    * hangs the ANALYZER before a byte of data moves (measured: the
    * two-consumer lazy form never finished planning). The iteration
    * itself runs as ONE higher-order-function fold over the collected
    * k²-entry matrix (the Forecast chunked-scan pattern): per-round
    * DataFrame joins paid one scheduled stage per round in fixed
    * latency alone. The row-scale work is the caller's one windowed
    * transition pass, materialized once into a k²-row snapshot. The
    * fold's float sums run in sorted-entry order; cross-engine the
    * oracle sums in its own order — both land within ~1e-13 at
    * category cardinalities, far below the 1e-6 rounding. Emits one
    * row per state: (state, n_out, round(pi, 6));
    * `spark.catalog.clearCache()` once consumed.
    */
  def stationaryDistribution(transitions: DataFrame,
      iters: Int = 12): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    // ONE row-scale pass: everything downstream (P, the state set, the
    // out-degrees, every iteration) derives from this k²-row snapshot —
    // without it the transition aggregate (and the caller's windowed
    // row pass under it) re-derives once per consumer (the
    // q_tukey_pairs lesson). clearCache once consumed.
    val cnt = snapshot(transitions.select(col("src"), col("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("n")))
    val p = cnt
      .withColumn("rowtot", sum("n").over(
        org.apache.spark.sql.expressions.Window.partitionBy("src")))
      .withColumn("p", col("n").cast("double") / col("rowtot").cast("double"))
      .select(col("src"), col("dst"), col("p"))
    val states = cnt.select(col("src").as("state"))
      .unionAll(cnt.select(col("dst").as("state"))).distinct()
    val k = states.count() // one bounded action: the category count
    // fold dangling states into P as k uniform out-edges each, so a
    // round reads π exactly once (scaladoc)
    val dangling = states
      .join(p.select(col("src")).distinct(),
        states("state") === col("src"), "left_anti")
      .select(col("state").as("src"))
    val pAug = p.unionByName(dangling
      .crossJoin(broadcast(states.select(col("state").as("dst"))))
      .withColumn("p", lit(1.0) / lit(k.toDouble)))
    // the whole power iteration as ONE higher-order-function fold over
    // the collected k²-entry matrix (the Forecast *Chunked pattern):
    // k² is category-bounded by contract, so the matrix fits one row
    // and 12 rounds run in a single narrow task — the per-round
    // join+aggregate form paid one scheduled stage PER ROUND on k-row
    // frames (measured 5.6 s at sf0.1 vs ~2 s for this form, all of it
    // fixed stage latency, not data)
    val matRow = pAug.agg(sort_array(collect_list(
      struct(col("src"), col("dst"), col("p")))).as("mat"))
    val statesRow = states.agg(sort_array(collect_list(col("state")))
      .as("sts"))
    val out = matRow.crossJoin(broadcast(statesRow)) // two 1-row scalars
      .select(col("sts"), expr(
        s"""aggregate(
           |  sequence(1, $iters),
           |  map_from_arrays(sts,
           |    transform(sts, s -> 1.0D / CAST($k AS DOUBLE))),
           |  (acc, it) -> map_from_arrays(sts, transform(sts, j ->
           |    aggregate(filter(mat, e -> e.dst = j), 0.0D,
           |      (m, e) -> m + element_at(acc, e.src) * e.p))))""".stripMargin)
        .as("pim"))
      .select(explode(col("sts")).as("state"), col("pim"))
      .select(col("state"), element_at(col("pim"), col("state")).as("pi"))
    val nOut = cnt.groupBy(col("src").as("state"))
      .agg(sum("n").as("n_out"))
    out.join(nOut, Seq("state"), "left")
      .select(col("state"), coalesce(col("n_out"), lit(0L)).as("n_out"),
        round(col("pi"), 6).as("pi"))
  }
}
