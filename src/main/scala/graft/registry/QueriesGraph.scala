package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.qcew.{NaicsAgg, Resample, Series}
import graft.ext.{Affinity, AsofJoin, Bloom, Corpus, Dedup, EventsStream, Forecast, Graph, Inference, Multimodal, Privacy, Quantiles, ScaleOps, Sessionize, Similarity, Sketch, Spatial, StatefulOps, TextStats, TimeFill}

/** graph algorithms + spatial + recommendation affinity.
  *
  * One registry shard of [[SparkEntry]] (split in round 9 —
  * the single 11k-line object was the repo's one
  * maintainability hazard). Entries are verbatim; the shared
  * helpers live in [[QueryShared]]. SparkEntry concatenates
  * all shards and unit gates assert name uniqueness and
  * query/oracle set equality.
  */
private[graft] object QueriesGraph {
  import QueryShared._

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(

    // SQL surface: RECURSIVE CTE (Spark 4 native) — capped running sum
    // with reset, a stateful scan a window function cannot express
    // (each row's value depends on the POST-RESET accumulator of the
    // previous row). Drift-free: the addition chain order is pinned by
    // the recursion itself, so both engines execute the identical
    // IEEE sequence. Depth = max orders per kept customer (≤20 at
    // sf0.1, probed) — far under spark.sql.cteRecursionLevelLimit.
    // The ranked anchor is PERSISTED: the recursive term executes once
    // per recursion level, and an inlined CTE would re-scan and
    // re-window the orders table every level (measured 57 s warm at
    // sf0.1 — the whole bench's worst query; cached it's one scan).
    // At 100 TB the recursion shape itself is wrong anyway: depth ×
    // join passes over a cached relation. The linear-scale form is one
    // repartition(key) + sortWithinPartitions + per-partition
    // sequential fold — O(n log n) in one pass, no iteration. The CTE
    // stays as the SQL-surface demo at demo depth (≤20 levels).
    "q_recursive_cte" -> ((s, dir) => {
      t(s, dir, "orders").filter(col("o_custkey") % 50 === 0)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(
            Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey"))
            .cast("int").as("rn"))
        .persist()
        .createOrReplaceTempView("ranked_v")
      s.sql("""WITH RECURSIVE walk(o_custkey, o_orderkey, rn, acc) AS (
              |  SELECT o_custkey, o_orderkey, rn, o_totalprice FROM ranked_v WHERE rn = 1
              |  UNION ALL
              |  SELECT r.o_custkey, r.o_orderkey, r.rn,
              |         CASE WHEN w.acc + r.o_totalprice > 300000 THEN r.o_totalprice
              |              ELSE w.acc + r.o_totalprice END
              |  FROM walk w JOIN ranked_v r ON r.o_custkey = w.o_custkey AND r.rn = w.rn + 1)
              |SELECT o_custkey, o_orderkey, rn, round(acc, 2) AS acc
              |FROM walk ORDER BY o_custkey, rn""".stripMargin)
    }),


    // graph analytics over the embedding near-dup pair graph: degree,
    // per-node triangle count (ordered two-path + closing-edge join —
    // the standard distributed triangle enumeration; intermediate size
    // Σ deg², bounded by the near-dup thresholds), and local
    // clustering coefficient (two FP ops over exact ints, bit-stable).
    "q_graph_stats" -> ((s, dir) => {
      val e = Similarity.embeddingNearDupPairs(
          spread(t(s, dir, "embeddings")), threshold = 0.2, planes = annPlanes)
        .select("id1", "id2").persist()
      val deg = e.select(col("id1").as("id"))
        .unionAll(e.select(col("id2").as("id")))
        .groupBy("id").agg(count(lit(1)).as("degree"))
      val tri = e.as("ab").join(e.as("bc"), col("ab.id2") === col("bc.id1"))
        .select(col("ab.id1").as("a"), col("ab.id2").as("b"), col("bc.id2").as("c"))
        .join(e.as("ac"), col("a") === col("ac.id1") && col("c") === col("ac.id2"))
        .select("a", "b", "c")
      val triPerNode = tri
        .select(explode(array(col("a"), col("b"), col("c"))).as("id"))
        .groupBy("id").agg(count(lit(1)).as("n_tri"))
      deg.join(triPerNode, Seq("id"), "left")
        .withColumn("n_tri", coalesce(col("n_tri"), lit(0L)))
        .withColumn("lcc", when(col("degree") > 1,
            col("n_tri").cast("double") * lit(2.0) /
              (col("degree") * (col("degree") - 1)).cast("double"))
          .otherwise(lit(0.0)))
        .select("id", "degree", "n_tri", "lcc")
        .orderBy("id")
    }),


    // market-basket association rules over order baskets (items =
    // suppliers feeding the order): support / confidence both ways /
    // lift per co-occurring pair. The frequent-item prune runs BEFORE
    // any pairing (Apriori pass one, Affinity scaladoc) so a
    // pathological mega-basket can't go quadratic. Counts exact;
    // ratios rounded once.
    "q_assoc_rules" -> ((s, dir) => {
      Affinity.associationRules(spread(t(s, dir, "lineitem")),
          basket = col("l_orderkey"), item = col("l_suppkey"),
          minItemCount = 50, minPairCount = 10)
        .orderBy("item1", "item2")
    }),


    // item-item collaborative filtering: top-3 cosine (Ochiai)
    // neighbors per supplier from order co-baskets — the "also bought"
    // kernel; rank on (rounded cosine DESC, id) so ties are engine-
    // and retry-stable (Affinity.itemCosineTopK scaladoc).
    "q_item_cosine" -> ((s, dir) => {
      Affinity.itemCosineTopK(spread(t(s, dir, "lineitem")),
          basket = col("l_orderkey"), item = col("l_suppkey"),
          minItemCount = 50, minPairCount = 10, k = 3)
        .orderBy("item1", "rank")
    }),


    // slope-one recommender training: per-brand-pair average rating
    // deviation over customers who bought both (rating = total
    // quantity) — the classic CF baseline's entire model table in one
    // user-keyed shuffle (pairCounts' array-lambda expansion, no
    // self-join; pair space bounded by the brand catalog, never rows).
    "q_slope_one" -> ((s, dir) => {
      // pre-aggregate to (order, brand) BEFORE the orders join: the
      // broadcast brand join is shuffle-free, the map-side-combined
      // sum shrinks the rows entering the orderkey exchange, and the
      // post-join (customer, brand) aggregate rolls up the already-
      // combined partials (30× A/B: never worse, 3× better under
      // memory pressure — the big-row join was the spill site)
      val perOB = spreadBy(t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"),
            floor(col("l_quantity")).cast("long").as("qty")), col("l_orderkey"))
        .join(broadcast(t(s, dir, "part").select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_orderkey"), col("p_brand"))
        .agg(sum("qty").as("qty"))
      val ratings = perOB
        .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
      Affinity.slopeOneDeviations(ratings, user = col("o_custkey"),
          item = col("p_brand"), rating = col("qty"), minCo = 20,
          // brand vocabulary from the DIMENSION, not the fact pipeline:
          // the dictionary pass must not re-run the joins above
          itemDict = Some(t(s, dir, "part").select(col("p_brand").as("i"))))
        .orderBy("item_i", "item_j")
    }),


    // A-priori stage 3: frequent supplier TRIPLES per order basket —
    // the nested-HOF expansion over each basket's sorted item set, so
    // the Spark side needs NO self-join at all (one basket-keyed
    // shuffle + one triple-keyed count; Affinity.tripleCounts
    // scaladoc). The oracle stages pair→triple joins explicitly —
    // a single 3-way SQL join misplans into an inequality-first
    // explosion on DuckDB, which is the point of the array form.
    "q_itemsets3" -> ((s, dir) => {
      Affinity.frequentTriples(spread(t(s, dir, "lineitem")),
          basket = col("l_orderkey"), item = col("l_suppkey"),
          minItemCount = 50, minTripleCount = 2)
        .orderBy("item1", "item2", "item3")
    }),


    // token-pair PMI over documents — which terms co-occur more than
    // their document frequencies predict. Same pruned-pair skeleton as
    // q_assoc_rules, over the tokenize-once token sets.
    "q_pmi_cooccur" -> ((s, dir) => {
      val toks = spread(t(s, dir, "documents"))
        .select(col("doc_id"), explode(TextStats.tokens(col("text"))).as("term"))
      Affinity.pmiPairs(toks, doc = col("doc_id"), term = col("term"),
          minTermCount = 20, minPairCount = 10)
        .orderBy("term1", "term2")
    }),


    // fixed-iteration PageRank over the ANN near-dup graph — which
    // documents sit at the center of duplicate neighborhoods (dedup
    // triage ranks them first). Three rounds, each ONE join + ONE
    // aggregate bounded by |E|, stacked into a single job — no
    // per-round driver actions (Graph scaladoc).
    "q_pagerank" -> ((s, dir) => {
      // persist the edge list: every iteration re-reads it (contrib
      // join + degree + node spine) — unpersisted, the bucketed
      // near-dup self-join would replay once per reference
      val pairs = Similarity.embeddingNearDupPairs(
          spread(t(s, dir, "embeddings")), threshold = 0.2, planes = annPlanes)
        .select("id1", "id2")
      // MEASURED partition sizing (ScaleOps.sizedEdges): an LSH-survivor
      // graph iterates on O(1) tasks, while a pair graph that grows with
      // the data gets tasks proportional to its edges — no literal
      // partition count (the CC small-graph discipline)
      Graph.pageRank(ScaleOps.sizedEdges(Graph.symmetrize(pairs)), iters = 3)
        .orderBy("id")
    }),


    // multi-source BFS over the sparse (co-ordered ≥ 2×) part graph:
    // min hop distance from the seed parts, bounded at 4 — the
    // "blast radius" query every recall/contamination audit runs on an
    // entity graph. Frontier joins only (Graph.bfsHops scaladoc), so
    // per-round shuffle ≤ |E|; edges persisted — every round re-reads
    // them and the pair self-join must not replay.
    "q_bfs_hops" -> ((s, dir) => {
      val e = coPurchaseEdges(s, dir, minCount = 2).persist()
      val seeds = e.filter(col("src") % 97 === 0).select(col("src").as("id"))
      Graph.bfsHops(e, seeds, maxHops = 4).orderBy("id")
    }),


    // graph sizing probe: bounded double-BFS diameter lower bound over
    // the co-purchase graph — BFS from the min node, re-BFS from the
    // farthest reached (tie → min id). The number that sizes every
    // iterative round budget (CC maxIter = diameter; LPA rounds)
    // BEFORE running it, so non-convergence is a measured decision,
    // not a surprise (Graph.diameterDoubleBfs scaladoc). Exact ints.
    "q_graph_diameter" -> ((s, dir) => {
      Graph.diameterDoubleBfs(coPurchaseEdges(s, dir, minCount = 2)
          .persist(), maxHops = 12)
        .orderBy("seed_id")
    }),


    // fixed-round k-core peeling (k=90, 3 rounds) over the dense
    // co-purchase graph: the high-degree backbone left after the
    // peeling cascade — the graph-hygiene pass that separates hub
    // structure from incidental co-occurrence. Each round is one
    // degree aggregate + two semi-join restrictions, O(|E|) shuffle
    // (Graph.kCorePeel scaladoc).
    "q_kcore" -> ((s, dir) => {
      Graph.kCorePeel(coPurchaseEdges(s, dir, minCount = 1).persist(),
          k = 90, rounds = 3)
        .orderBy("id")
    }),


    // personalized PageRank from the seed parts over the sparse
    // co-purchase graph — random-walk-with-restart proximity, the
    // related-items recommendation kernel; same |E|-bounded rounds as
    // q_pagerank with teleport pinned to the seeds
    // (Graph.personalizedPageRank scaladoc).
    "q_ppr" -> ((s, dir) => {
      // measured edge sizing, not a literal — see q_pagerank
      val e = ScaleOps.sizedEdges(coPurchaseEdges(s, dir, minCount = 2))
      val seeds = e.filter(col("src") % 97 === 0).select(col("src").as("id"))
      Graph.personalizedPageRank(e, seeds, iters = 3).orderBy("id")
    }),


    // PageRank on the genuinely DIRECTED co-purchase pair graph
    // (id1 < id2 orientation kept, NOT symmetrized) — every component's
    // max-id part is a sink, so the dangling-mass redistribution
    // pageRankDirected adds is load-bearing: total rank mass stays
    // exactly 1 instead of leaking at the sinks. Complements
    // q_pagerank, whose symmetrized input makes the dangling term
    // vacuous by construction.
    "q_pagerank_directed" -> ((s, dir) => {
      val e = ScaleOps.sizedEdges(
        coPurchasePairs(s, dir, minCount = 2)
          .select(col("id1").as("src"), col("id2").as("dst")))
      // truncateLineage: the rank frame is referenced TWICE per round
      // (dangling scalar + contribution join), so without per-round
      // snapshots the pr subtree re-executes 2^iters times; three
      // node-sized checkpoints are far cheaper (measured 4.6 → 3.5 s
      // at sf0.1, and the gap widens with iters)
      Graph.pageRankDirected(e, iters = 3, truncateLineage = true).orderBy("id")
    }),


    // HITS hubs & authorities on the DIRECTED co-purchase pair graph
    // (id1 < id2 orientation — same input as q_pagerank_directed):
    // which parts point AT the popular parts (hubs) vs which parts ARE
    // pointed at (authorities). Integer-exact unnormalized iteration —
    // each score is a directed alternating-walk COUNT (an exact long),
    // normalized once at the end — so the oracle hashes bit-for-bit
    // with no per-round float drift (Graph.hits scaladoc has the
    // D^(2·iters) overflow bound that pins iters=2 here).
    "q_hits" -> ((s, dir) => {
      val e = coPurchasePairs(s, dir, minCount = 2)
        .select(col("id1").as("src"), col("id2").as("dst"))
        .persist() // 2×iters half-steps + node spine re-read the pair
                   // self-join (the q_bfs_hops persist discipline)
      Graph.hits(e, iters = 2).orderBy("id")
    }),


    // bounded-hop WEIGHTED shortest path (multi-source Bellman-Ford)
    // over the co-purchase graph with affinity-derived integer costs
    // (frequent co-purchase = cheap hop: w = 11 − min(m, 10)) — the
    // weighted generalization of q_bfs_hops: "how cheaply can demand
    // reach each part from the seed skus within 4 substitution hops".
    // Long weights keep every distance exact (Graph.sssp scaladoc);
    // per-round shuffle ≤ |E| with snapshot/release plan discipline.
    "q_sssp" -> ((s, dir) => {
      val p = coPurchaseWeightedPairs(s, dir, minCount = 2)
      val e = p.select(col("id1").as("src"), col("id2").as("dst"), col("w"))
        .unionAll(p.select(col("id2").as("src"), col("id1").as("dst"), col("w")))
        .persist() // every relaxation round re-reads the pair self-join
      val seeds = e.filter(col("src") % 97 === 0).select(col("src").as("id"))
      Graph.sssp(e, seeds, maxHops = 4).orderBy("id")
    }),


    // global clustering coefficient by degree-ORIENTED triangle
    // counting over the sparse co-purchase graph — the skew-proof
    // triangle algorithm (out-degree bounded by orientation; wedge
    // join Σout², not Σdeg²; Graph.globalTransitivity scaladoc).
    "q_transitivity" -> ((s, dir) => {
      Graph.globalTransitivity(coPurchaseEdges(s, dir, minCount = 2))
    }),


    // per-edge triangle SUPPORT over the sparse co-purchase graph —
    // the edge-strength signal k-truss filters on (an edge inside a
    // community closes many triangles; incidental co-occurrence closes
    // none). Same oriented edge-iterator kernel as q_transitivity;
    // each triangle credits its three edges with ONE explode row each
    // (output-proportional, never Σdeg² wedges; Graph.edgeSupport
    // scaladoc). Zero-support edges kept via the left join back.
    "q_edge_support" -> ((s, dir) => {
      Graph.edgeSupport(coPurchaseEdges(s, dir, minCount = 2))
        .orderBy("id1", "id2")
    }),


    // graph hygiene one level above q_kcore: fixed-round k-TRUSS peel
    // (k=3, 2 rounds) — every surviving edge sits in ≥ 1 triangle of
    // the surviving set after each round's cascade; the classic
    // community-backbone extractor that node-degree filters can't
    // express (a hub with many weak edges survives k-core but not
    // k-truss). Support recompute per round is the q_edge_support
    // kernel; edge list snapshot/released per round
    // (Graph.kTrussPeel scaladoc). Output: surviving edges with their
    // final-set support.
    "q_ktruss" -> ((s, dir) => {
      Graph.kTrussPeel(coPurchaseEdges(s, dir, minCount = 2), k = 3,
          rounds = 2)
        .orderBy("id1", "id2")
    }),


    // degree assortativity of the co-purchase graph: do hub parts
    // co-sell with other hubs? One degree pass + two edge annotations
    // + exact power sums (Graph.degreeAssortativity scaladoc).
    "q_degree_assort" -> ((s, dir) => {
      Graph.degreeAssortativity(coPurchaseEdges(s, dir, minCount = 2))
    }),


    // DAG scheduling: longest-path layering of the band-restricted
    // co-purchase DAG (edges only from part band b to band b+1 — the
    // band filter is what guarantees acyclicity, so depth < 8 by
    // construction and the generic fixpoint loop exits early).
    // Iterative max-propagation, O(|E|) per round (Graph
    // .longestPathLayers scaladoc); the oracle unrolls the same 7
    // relaxation steps.
    "q_dag_layers" -> ((s, dir) => {
      val e = coPurchasePairs(s, dir, minCount = 1)
        .select((col("id1") % 200).as("src"), (col("id2") % 200).as("dst"))
        .filter(floor(col("dst") / 25) === floor(col("src") / 25) + 1)
        .distinct()
        .persist() // 8 propagation rounds re-read the pair self-join:
                   // unpersisted, each round replays it (measured
                   // 14.1 s → 1.3 s at sf0.1)
      Graph.longestPathLayers(e, maxRounds = 8).orderBy("id")
    }),


    // graph: per-node local clustering coefficient — the node-level
    // refinement of q_transitivity on the same co-purchase graph; the
    // oriented wedge join enumerates each triangle once, an explode
    // credits all three corners (Graph.localClustering scaladoc).
    "q_local_clustering" -> ((s, dir) => {
      Graph.localClustering(coPurchaseEdges(s, dir, minCount = 2))
        .orderBy("id")
    }),


    // popularity-weighted link prediction: Adamic–Adar over the same
    // co-purchase graph as q_common_neighbors — shared neighbors
    // down-weighted by 1/ln(degree), so a rare shared part outranks a
    // commodity one; same measured-distribution cap/floor derivation
    // and deterministic top-k (Graph.adamicAdar /
    // Graph.linkPredictionParams scaladoc).
    "q_adamic_adar" -> ((s, dir) => {
      val e = coPurchaseEdges(s, dir, minCount = 2).persist()
      val (cap, mc) = Graph.linkPredictionParams(e)
      Graph.adamicAdar(e, maxApexDegree = cap, minCommon = mc, topK = 40)
    }),


    // normalized node similarity: neighborhood Jaccard over the
    // co-purchase graph — cn/(d1+d2−cn), ORDERED by the exact integer
    // ppb so no float touches the top-k cut (Graph.nodeJaccard
    // scaladoc); cap/floor measured, not fixed
    // (Graph.linkPredictionParams scaladoc).
    "q_node_jaccard" -> ((s, dir) => {
      val e = coPurchaseEdges(s, dir, minCount = 2).persist()
      val (cap, mc) = Graph.linkPredictionParams(e)
      Graph.nodeJaccard(e, maxApexDegree = cap, minCommon = mc, topK = 40)
    }),


    // influence scoring: 2-bounded harmonic centrality — n1 + n2/2
    // carried as the exact integer 6·n1 + 3·n2; the distinct 2-hop
    // pair set is the Σdeg² wedge bound with the midpoint capped
    // (Graph.harmonicCloseness2 scaladoc).
    "q_harmonic_centrality" -> ((s, dir) => {
      Graph.harmonicCloseness2(coPurchaseEdges(s, dir, minCount = 2),
          maxMidDegree = 60)
        .orderBy("id")
    }),


    // community QA: Newman modularity of the brand partition over the
    // co-purchase graph — is same-brand co-purchase denser than the
    // degree-random baseline? Exact doubled-form clearing, one
    // division per community (Graph.modularity scaladoc).
    "q_modularity" -> ((s, dir) => {
      val labels = t(s, dir, "part")
        .select(col("p_partkey").as("id"), col("p_brand").as("community"))
      Graph.modularity(coPurchaseEdges(s, dir, minCount = 2), labels)
        .orderBy("community")
    }),

    // community detection by synchronous label propagation (3 rounds,
    // plurality label with min-label ties — the deterministic LPA
    // variant a cross-engine oracle can replay round for round;
    // Graph.labelPropagation scaladoc). Per-node community output.
    "q_lpa" -> ((s, dir) => {
      Graph.labelPropagation(coPurchaseEdges(s, dir, minCount = 2),
          rounds = 3)
        .orderBy("id")
    }),

    // community-boundary quality: conductance of the brand partition
    // over the co-purchase graph — cut / min(vol, 2m−vol) per
    // community, all counts exact from one doubly-labeled edge pass
    // (Graph.conductance scaladoc; the leakiness twin of q_modularity).
    "q_conductance" -> ((s, dir) => {
      val labels = t(s, dir, "part")
        .select(col("p_partkey").as("id"), col("p_brand").as("community"))
      Graph.conductance(coPurchaseEdges(s, dir, minCount = 2), labels)
        .orderBy("community")
    }),


    // strongly connected components of the event-type LIFT digraph
    // (edges kept where observed transitions beat independence:
    // n·T > rowtot·coltot, an exact long compare) — which behavior
    // states form recurrent loops vs one-way funnels. Category-level
    // SCC: the closure is |types|²-bounded, the row-scale work is one
    // windowed pass (Graph.sccLabels scaladoc).
    "q_scc" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val steps = spread(EventsStream.readEvents(s, s"$dir/events.parquet"))
        .select(col("user_id"), col("event_type").as("src"),
          lead(col("event_type"), 1).over(w).as("dst"))
        .filter(col("dst").isNotNull && col("dst") =!= col("src"))
      val cnt = steps.groupBy("src", "dst").agg(count(lit(1)).as("n"))
      val lifted = cnt
        .withColumn("na", sum("n").over(Window.partitionBy("src")))
        .withColumn("nb", sum("n").over(Window.partitionBy("dst")))
        .withColumn("t", sum("n").over(Window.partitionBy()))
        .filter(col("n") * col("t") > col("na") * col("nb"))
      Graph.sccLabels(lifted.select("src", "dst"))
        .orderBy("node")
    }),


    // equilibrium of the behavior chain: π ← πP for 12 fixed rounds
    // from uniform over the full consecutive-event transition table
    // (self-transitions kept — retention IS the equilibrium driver);
    // dangling states redistribute uniformly. k-row iterations composed
    // lazily (Graph.stationaryDistribution scaladoc).
    "q_markov_stationary" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val steps = spread(EventsStream.readEvents(s, s"$dir/events.parquet"))
        .select(col("event_type").as("src"),
          lead(col("event_type"), 1).over(w).as("dst"))
        .filter(col("dst").isNotNull)
      Graph.stationaryDistribution(steps).orderBy("state")
    }),


    // is the q_scc lift graph (symmetrized) 2-colorable? Parity-
    // carrying closure squaring detects any odd cycle per component —
    // the "does a two-role model fit this interaction graph?" gate
    // (Graph.bipartiteComponents scaladoc; |types|²-bounded closure).
    "q_bipartite" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val steps = spread(EventsStream.readEvents(s, s"$dir/events.parquet"))
        .select(col("user_id"), col("event_type").as("src"),
          lead(col("event_type"), 1).over(w).as("dst"))
        .filter(col("dst").isNotNull && col("dst") =!= col("src"))
      val cnt = steps.groupBy("src", "dst").agg(count(lit(1)).as("n"))
      val lifted = cnt
        .withColumn("na", sum("n").over(Window.partitionBy("src")))
        .withColumn("nb", sum("n").over(Window.partitionBy("dst")))
        .withColumn("t", sum("n").over(Window.partitionBy()))
        .filter(col("n") * col("t") > col("na") * col("nb"))
      Graph.bipartiteComponents(lifted.select("src", "dst"))
        .orderBy("node")
    }),


    // scheduling: weighted CRITICAL PATH over the banded co-purchase
    // DAG (the q_dag_layers input with deterministic integer stage
    // costs w = 1 + (src·7 + dst) % 5) — cost(v) = the most expensive
    // dependency chain ending at v, the number every pipeline latency
    // budget starts from. Max-plus propagation in exact longs with the
    // Σ-monotone early exit (Graph.criticalPath scaladoc).
    "q_critical_path" -> ((s, dir) => {
      val e = coPurchasePairs(s, dir, minCount = 1)
        .select((col("id1") % 200).as("src"), (col("id2") % 200).as("dst"))
        .filter(floor(col("dst") / 25) === floor(col("src") / 25) + 1)
        .distinct()
        .withColumn("w", lit(1L) + (col("src") * 7L + col("dst")) % 5L)
        .persist() // 8 max-plus rounds re-read the pair self-join
      Graph.criticalPath(e, maxRounds = 8).orderBy("id")
    }),


    // embedding class geometry: pairwise cosine between per-label
    // centroids from exact scaled-long component sums (cosine of the
    // SUM vector ≡ cosine of the centroid — scale invariance), k·d
    // shuffle and a k² pair table, corpus never pairwise-joined.
    "q_label_centroids" -> ((s, dir) => {
      Similarity.labelCentroidSims(t(s, dir, "embeddings"))
        .orderBy("label_a", "label_b")
    }),


    // model-eval gain table: rank by classifier score, cut into
    // deciles, report exact counts + cumulative precision and lift —
    // the "top-10% is k× richer" number a selection pipeline quotes.
    "q_lift_table" -> ((s, dir) => {
      val docs = spread(t(s, dir, "documents"))
      val scored = TextStats.classifierScore(
          docs, TextStats.hashedModel(s, 1024), dim = 1024)
        .select(col("doc_id"), round(col("score"), 6).as("r"))
      val lab = t(s, dir, "documents")
        .select(col("doc_id"), (col("lang") === "en").cast("int").as("pos"))
      Inference.liftTable(scored.join(lab, "doc_id"),
        col("doc_id"), col("r"), col("pos"), buckets = 10)
    }),


    // entity matching: reciprocal best match among LSH-bucket
    // candidates — each side's argmax ranks on (rounded cosine, id),
    // and only mutually-best pairs survive.
    "q_reciprocal_match" -> ((s, dir) => {
      Similarity.reciprocalBestMatch(spread(t(s, dir, "embeddings")), annPlanes)
        .orderBy("id1")
    }),


    // spatial: grid-blocked proximity self-join — synthetic uniform
    // coordinates from two independent 32-bit halves of md5(event_id)
    // (a multiplicative hash would put both coords on one lattice
    // line: linear in the id), all pairs within Chebyshev distance 8
    // via 3x3 cell blocking, reduced to the distance histogram. The
    // join is an equi-join on the cell key; pair work is bounded by
    // per-cell density.
    "q_grid_join" -> ((s, dir) => {
      Spatial.gridNeighborPairs(eventPoints(s, dir), "event_id",
          col("x"), col("y"), cellSize = 8, radius = 8)
        .groupBy("dist").agg(count(lit(1)).as("n_pairs"))
        .orderBy("dist")
    }),


    // spatial: per-point nearest neighbor within radius — cell-blocked
    // argmin (the geometric twin of ANN top-k); isolated points emit
    // nothing.
    "q_spatial_nn" -> ((s, dir) => {
      Spatial.nearestNeighbors(eventPoints(s, dir), "event_id",
          col("x"), col("y"), cellSize = 8, radius = 8)
        .orderBy("id")
    }),


    // ext: grid-density clustering (cell-level DBSCAN) over the hashed
    // event points — cells of side 200, core at >= 6 points, clusters =
    // 8-neighbor components of core cells labeled by min packed cell
    // key, border points adopt the min-labeled adjacent cluster, rest
    // is noise (-1). Every decision is integer cell arithmetic; the
    // component search runs on the CELL graph (bounded by grid area),
    // so the pattern holds at any corpus size. The DuckDB oracle
    // mirrors the min-label fixpoint with a recursive CTE.
    "q_dbscan_grid" -> ((s, dir) => {
      Spatial.gridDensityClusters(eventPoints(s, dir), "event_id",
          col("x"), col("y"), cellSize = 200, minPts = 6)
        .orderBy("cluster_id")
    }),


    // common-neighbor link prediction over the co-purchase graph:
    // non-adjacent part pairs ranked by shared neighbors — the
    // "related items you don't sell together YET" candidate set. Hub
    // apexes are excluded BEFORE the wedge join (the IDF principle
    // doubling as the skew bound; Graph.commonNeighbors scaladoc), and
    // both the apex cap and the noise floor are DERIVED from the
    // measured degree distribution (Graph.linkPredictionParams —
    // round-10 verdict: the fixed (60, 2) pair went vacuous at sf0.1
    // because the graph gets sparser per node, not denser).
    // Deterministic (cn DESC, id1, id2) top-k.
    "q_common_neighbors" -> ((s, dir) => {
      val e = coPurchaseEdges(s, dir, minCount = 2).persist()
      val (cap, mc) = Graph.linkPredictionParams(e)
      Graph.commonNeighbors(e, maxApexDegree = cap, minCommon = mc, topK = 40)
    }),


    // audience-overlap matrix: pairwise Jaccard between event-type
    // audiences (users with ≥ 15 events of the type). The per-user
    // self-join fans out at most |types|² per user — bounded — and
    // sizes/intersections stay exact longs until one final division.
    "q_audience_overlap" -> ((s, dir) => {
      val au = EventsStream.readEvents(s, s"$dir/events.parquet")
        .groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("n_ev"))
        .filter(col("n_ev") >= 15)
        .select("event_type", "user_id")
        .persist() // sizes + both intersection legs
      val sz = au.groupBy("event_type").agg(count(lit(1)).as("n"))
      au.select(col("event_type").as("t1"), col("user_id"))
        .join(au.select(col("event_type").as("t2"), col("user_id")), Seq("user_id"))
        .filter(col("t1") < col("t2"))
        .groupBy("t1", "t2").agg(count(lit(1)).as("n_both"))
        .join(broadcast(sz.select(col("event_type").as("t1"), col("n").as("n_a"))), Seq("t1"))
        .join(broadcast(sz.select(col("event_type").as("t2"), col("n").as("n_b"))), Seq("t2"))
        .select(col("t1"), col("t2"), col("n_a"), col("n_b"), col("n_both"),
          round(col("n_both").cast("double") /
            (col("n_a") + col("n_b") - col("n_both")).cast("double"), 6).as("jaccard"))
        .orderBy("t1", "t2")
    }),


    // TextRank keyword extraction: PageRank over the word co-occurrence
    // graph (adjacent-word pairs above a support threshold — the
    // sparsification that gives the graph degree structure), top-20
    // words by score. Composition of two already-oracled kernels:
    // Dedup.shingles bigrams → pair support → Graph.pageRank. The
    // co-occurrence aggregate map-side-combines to the vocab²-bounded
    // pair grid; the graph is vocab-sized, tiny next to the corpus.
    "q_textrank" -> ((s, dir) => {
      val pairs = spread(t(s, dir, "documents"))
        .select(explode(Dedup.shingles(col("text"), 2)).as("bg"))
        .select(split(col("bg"), " ").as("w"))
        .select(col("w").getItem(0).as("id1"), col("w").getItem(1).as("id2"))
        .filter(col("id1") < col("id2"))
        .groupBy("id1", "id2").agg(count(lit(1)).as("m"))
        .filter(col("m") >= 35)
        .select("id1", "id2")
      Graph.pageRank(Graph.symmetrize(pairs).persist(), iters = 3)
        .select(col("id").as("word"), col("pr").as("score"))
        .orderBy(desc("score"), asc("word")).limit(20)
    }),
  )

  val oracles: Seq[(String, String)] = Seq(

      "q_recursive_cte" ->
        """WITH RECURSIVE ranked AS (
          |  SELECT o_custkey, o_orderkey, o_totalprice,
          |         CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INTEGER) AS rn
          |  FROM orders WHERE o_custkey % 50 = 0),
          |walk(o_custkey, o_orderkey, rn, acc) AS (
          |  SELECT o_custkey, o_orderkey, rn, o_totalprice FROM ranked WHERE rn = 1
          |  UNION ALL
          |  SELECT r.o_custkey, r.o_orderkey, r.rn,
          |         CASE WHEN w.acc + r.o_totalprice > 300000 THEN r.o_totalprice
          |              ELSE w.acc + r.o_totalprice END
          |  FROM walk w JOIN ranked r ON r.o_custkey = w.o_custkey AND r.rn = w.rn + 1)
          |SELECT o_custkey, o_orderkey, rn, round(acc, 2) AS acc
          |FROM walk ORDER BY o_custkey, rn""".stripMargin,


      "q_graph_stats" ->
        s"""WITH eb AS (
           |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
           |         CAST(${sqlHyperplaneBucket("embedding")} AS INTEGER) AS bucket
           |  FROM embeddings),
           |p AS (
           |  SELECT a.vec_id AS id1, bb.vec_id AS id2
           |  FROM eb a JOIN eb bb ON a.bucket = bb.bucket AND a.vec_id < bb.vec_id
           |  WHERE list_cosine_similarity(a.v, bb.v) >= 0.2),
           |deg AS (
           |  SELECT id, count(*) AS degree
           |  FROM (SELECT id1 AS id FROM p UNION ALL SELECT id2 FROM p)
           |  GROUP BY id),
           |tri AS (
           |  SELECT ab.id1 AS a, ab.id2 AS b, bc.id2 AS c
           |  FROM p ab
           |  JOIN p bc ON ab.id2 = bc.id1
           |  JOIN p ac ON ac.id1 = ab.id1 AND ac.id2 = bc.id2),
           |tpn AS (
           |  SELECT id, count(*) AS n_tri
           |  FROM (SELECT a AS id FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri)
           |  GROUP BY id)
           |SELECT d.id, d.degree, COALESCE(t.n_tri, 0) AS n_tri,
           |       CASE WHEN d.degree > 1
           |            THEN CAST(COALESCE(t.n_tri, 0) AS DOUBLE) * 2.0 /
           |                 CAST(d.degree * (d.degree - 1) AS DOUBLE)
           |            ELSE 0.0 END AS lcc
           |FROM deg d LEFT JOIN tpn t ON t.id = d.id
           |ORDER BY d.id""".stripMargin,


      // exact-long deviation numerators over customer×brand ratings;
      // the self-join form is the oracle's — the Spark side expands
      // pairs from each user's sorted item array (identical pair set:
      // ordered pairs item_i < item_j, one rating per (user, item))
      "q_slope_one" ->
        """WITH r AS (
          |  SELECT o_custkey AS u, p_brand AS i,
          |         CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS r
          |  FROM lineitem
          |  JOIN orders ON l_orderkey = o_orderkey
          |  JOIN part ON l_partkey = p_partkey
          |  GROUP BY 1, 2),
          |p AS (
          |  SELECT a.i AS item_i, b.i AS item_j,
          |         CAST(count(*) AS BIGINT) AS n_co,
          |         CAST(sum(a.r - b.r) AS BIGINT) AS dev_num
          |  FROM r a JOIN r b ON a.u = b.u AND a.i < b.i
          |  GROUP BY 1, 2)
          |SELECT item_i, item_j, n_co, dev_num,
          |       round(CAST(dev_num AS DOUBLE) / CAST(n_co AS DOUBLE), 6) AS dev
          |FROM p WHERE n_co >= 20
          |ORDER BY item_i, item_j""".stripMargin,


      "q_assoc_rules" ->
        """WITH bi AS (
          |  SELECT DISTINCT l_orderkey AS basket, l_suppkey AS item FROM lineitem),
          |freq AS (
          |  SELECT item, count(*) AS n_item FROM bi GROUP BY 1 HAVING count(*) >= 50),
          |total AS (SELECT count(DISTINCT basket) AS n_baskets FROM bi),
          |kept AS (SELECT bi.basket, bi.item FROM bi JOIN freq USING (item)),
          |pc AS (
          |  SELECT a.item AS item1, b.item AS item2, count(*) AS n_pair
          |  FROM kept a JOIN kept b ON a.basket = b.basket AND a.item < b.item
          |  GROUP BY 1, 2 HAVING count(*) >= 10)
          |SELECT item1, item2, n_pair, f1.n_item AS n1, f2.n_item AS n2,
          |       round(CAST(n_pair AS DOUBLE) / CAST(n_baskets AS DOUBLE), 6) AS support,
          |       round(CAST(n_pair AS DOUBLE) / CAST(f1.n_item AS DOUBLE), 6) AS conf_1to2,
          |       round(CAST(n_pair AS DOUBLE) / CAST(f2.n_item AS DOUBLE), 6) AS conf_2to1,
          |       round(CAST(n_pair AS DOUBLE) * CAST(n_baskets AS DOUBLE)
          |             / CAST(f1.n_item * f2.n_item AS DOUBLE), 6) AS lift
          |FROM pc JOIN freq f1 ON f1.item = pc.item1
          |        JOIN freq f2 ON f2.item = pc.item2
          |        CROSS JOIN total
          |ORDER BY item1, item2""".stripMargin,


      "q_item_cosine" ->
        """WITH bi AS (
          |  SELECT DISTINCT l_orderkey AS basket, l_suppkey AS item FROM lineitem),
          |freq AS (
          |  SELECT item, count(*) AS n_item FROM bi GROUP BY 1 HAVING count(*) >= 50),
          |kept AS (SELECT bi.basket, bi.item FROM bi JOIN freq USING (item)),
          |pc AS (
          |  SELECT a.item AS item1, b.item AS item2, count(*) AS n_pair
          |  FROM kept a JOIN kept b ON a.basket = b.basket AND a.item < b.item
          |  GROUP BY 1, 2 HAVING count(*) >= 10),
          |dirs AS (
          |  SELECT item1, item2, n_pair FROM pc
          |  UNION ALL SELECT item2, item1, n_pair FROM pc),
          |scored AS (
          |  SELECT item1, item2, n_pair,
          |         round(CAST(n_pair AS DOUBLE)
          |               / sqrt(CAST(f1.n_item * f2.n_item AS DOUBLE)), 6) AS cosine
          |  FROM dirs JOIN freq f1 ON f1.item = dirs.item1
          |            JOIN freq f2 ON f2.item = dirs.item2),
          |ranked AS (
          |  SELECT item1,
          |         CAST(row_number() OVER (PARTITION BY item1
          |                                 ORDER BY cosine DESC, item2) AS INTEGER) AS rank,
          |         item2, n_pair, cosine
          |  FROM scored)
          |SELECT item1, rank, item2, n_pair, cosine
          |FROM ranked WHERE rank <= 3 ORDER BY item1, rank""".stripMargin,


      // staged pair→triple joins: a single 3-way join misplans on
      // DuckDB (inequality-first explosion)
      "q_itemsets3" ->
        """WITH bi AS (
          |  SELECT DISTINCT l_orderkey AS basket, l_suppkey AS item FROM lineitem),
          |freq AS (
          |  SELECT item FROM bi GROUP BY 1 HAVING count(*) >= 50),
          |total AS (SELECT count(DISTINCT basket) AS n_baskets FROM bi),
          |kept AS (SELECT bi.basket, bi.item FROM bi JOIN freq USING (item)),
          |pr AS (
          |  SELECT a.basket, a.item AS item1, b.item AS item2
          |  FROM kept a JOIN kept b ON a.basket = b.basket AND a.item < b.item),
          |tr AS (
          |  SELECT p.item1, p.item2, d.item AS item3, count(*) AS n_triple
          |  FROM pr p JOIN kept d ON p.basket = d.basket AND p.item2 < d.item
          |  GROUP BY 1, 2, 3 HAVING count(*) >= 2)
          |SELECT item1, item2, item3, n_triple,
          |       round(CAST(n_triple AS DOUBLE) / CAST(n_baskets AS DOUBLE), 6) AS support
          |FROM tr CROSS JOIN total
          |ORDER BY item1, item2, item3""".stripMargin,


      "q_pmi_cooccur" ->
        s"""WITH tok AS (
           |  SELECT doc_id, unnest($sqlTokens) AS term FROM documents),
           |bi AS (SELECT DISTINCT doc_id AS basket, term AS item FROM tok),
           |freq AS (
           |  SELECT item, count(*) AS n_item FROM bi GROUP BY 1 HAVING count(*) >= 20),
           |total AS (SELECT count(DISTINCT basket) AS n_docs FROM bi),
           |kept AS (SELECT bi.basket, bi.item FROM bi JOIN freq USING (item)),
           |pc AS (
           |  SELECT a.item AS item1, b.item AS item2, count(*) AS n_pair
           |  FROM kept a JOIN kept b ON a.basket = b.basket AND a.item < b.item
           |  GROUP BY 1, 2 HAVING count(*) >= 10)
           |SELECT item1 AS term1, item2 AS term2, n_pair,
           |       f1.n_item AS n1, f2.n_item AS n2,
           |       round(ln(CAST(n_pair AS DOUBLE) * CAST(n_docs AS DOUBLE)
           |                / CAST(f1.n_item * f2.n_item AS DOUBLE)), 6) AS pmi
           |FROM pc JOIN freq f1 ON f1.item = pc.item1
           |        JOIN freq f2 ON f2.item = pc.item2
           |        CROSS JOIN total
           |ORDER BY term1, term2""".stripMargin,


      "q_pagerank" ->
        s"""WITH eb AS (
           |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
           |         CAST(${sqlHyperplaneBucket("embedding")} AS INTEGER) AS bucket
           |  FROM embeddings),
           |p AS (
           |  SELECT a.vec_id AS id1, bb.vec_id AS id2
           |  FROM eb a JOIN eb bb ON a.bucket = bb.bucket AND a.vec_id < bb.vec_id
           |  WHERE list_cosine_similarity(a.v, bb.v) >= 0.2),
           |e AS (SELECT id1 AS src, id2 AS dst FROM p
           |      UNION ALL SELECT id2, id1 FROM p),
           |deg AS (SELECT src, count(*) AS out_deg FROM e GROUP BY 1),
           |nodes AS (SELECT DISTINCT src AS id FROM e),
           |nn AS (SELECT count(*) AS n FROM nodes),
           |pr0 AS (SELECT id, CAST(1.0 AS DOUBLE) / n AS pr FROM nodes CROSS JOIN nn),
           |pr1 AS (
           |  SELECT nodes.id,
           |         CAST(0.15 AS DOUBLE) / nn.n
           |           + CAST(0.85 AS DOUBLE) * COALESCE(i1.inflow, CAST(0.0 AS DOUBLE)) AS pr
           |  FROM nodes CROSS JOIN nn
           |  LEFT JOIN (SELECT e.dst AS id, sum(pp.pr / CAST(d.out_deg AS DOUBLE)) AS inflow
           |             FROM e JOIN pr0 pp ON pp.id = e.src JOIN deg d ON d.src = e.src
           |             GROUP BY 1) i1 ON i1.id = nodes.id),
           |pr2 AS (
           |  SELECT nodes.id,
           |         CAST(0.15 AS DOUBLE) / nn.n
           |           + CAST(0.85 AS DOUBLE) * COALESCE(i2.inflow, CAST(0.0 AS DOUBLE)) AS pr
           |  FROM nodes CROSS JOIN nn
           |  LEFT JOIN (SELECT e.dst AS id, sum(pp.pr / CAST(d.out_deg AS DOUBLE)) AS inflow
           |             FROM e JOIN pr1 pp ON pp.id = e.src JOIN deg d ON d.src = e.src
           |             GROUP BY 1) i2 ON i2.id = nodes.id),
           |pr3 AS (
           |  SELECT nodes.id,
           |         CAST(0.15 AS DOUBLE) / nn.n
           |           + CAST(0.85 AS DOUBLE) * COALESCE(i3.inflow, CAST(0.0 AS DOUBLE)) AS pr
           |  FROM nodes CROSS JOIN nn
           |  LEFT JOIN (SELECT e.dst AS id, sum(pp.pr / CAST(d.out_deg AS DOUBLE)) AS inflow
           |             FROM e JOIN pr2 pp ON pp.id = e.src JOIN deg d ON d.src = e.src
           |             GROUP BY 1) i3 ON i3.id = nodes.id)
           |SELECT id, round(pr, 6) AS pr FROM pr3 ORDER BY id""".stripMargin,


      "q_bfs_hops" ->
        s"""WITH RECURSIVE ${sqlCoPurchaseCtes(2)},
           |seeds AS (SELECT DISTINCT src AS id FROM e WHERE src % 97 = 0),
           |walk(id, hop) AS (
           |  SELECT id, 0 AS hop FROM seeds
           |  UNION
           |  SELECT e.dst, w.hop + 1 FROM walk w JOIN e ON e.src = w.id
           |  WHERE w.hop < 4)
           |SELECT id, CAST(min(hop) AS INTEGER) AS hop
           |FROM walk GROUP BY id ORDER BY id""".stripMargin,


      // double BFS, both walks bounded at 12 as the Spark side; far =
      // argmax(hop) with the (hop DESC, id ASC) total tie-break
      "q_graph_diameter" ->
        s"""WITH RECURSIVE ${sqlCoPurchaseCtes(2)},
           |s0 AS (SELECT CAST(min(src) AS BIGINT) AS id FROM e),
           |w1(id, hop) AS (
           |  SELECT id, 0 AS hop FROM s0
           |  UNION
           |  SELECT e.dst, w1.hop + 1 FROM w1 JOIN e ON e.src = w1.id
           |  WHERE w1.hop < 12),
           |b1 AS (SELECT id, min(hop) AS hop FROM w1 GROUP BY id),
           |far AS (SELECT id, hop FROM b1 ORDER BY hop DESC, id ASC LIMIT 1),
           |w2(id, hop) AS (
           |  SELECT id, 0 AS hop FROM far
           |  UNION
           |  SELECT e.dst, w2.hop + 1 FROM w2 JOIN e ON e.src = w2.id
           |  WHERE w2.hop < 12),
           |b2 AS (SELECT id, min(hop) AS hop FROM w2 GROUP BY id)
           |SELECT s0.id AS seed_id, far.id AS far_id,
           |       CAST(far.hop AS INTEGER) AS ecc_seed,
           |       (SELECT CAST(max(hop) AS INTEGER) FROM b2) AS diameter_lb
           |FROM s0 CROSS JOIN far ORDER BY seed_id""".stripMargin,


      "q_kcore" ->
        s"""WITH ${sqlCoPurchaseCtes(1)},
           |d1 AS (SELECT src FROM e GROUP BY src HAVING count(*) >= 90),
           |e1 AS (SELECT e.src, e.dst FROM e
           |       JOIN d1 a ON e.src = a.src JOIN d1 b ON e.dst = b.src),
           |d2 AS (SELECT src FROM e1 GROUP BY src HAVING count(*) >= 90),
           |e2 AS (SELECT e1.src, e1.dst FROM e1
           |       JOIN d2 a ON e1.src = a.src JOIN d2 b ON e1.dst = b.src),
           |d3 AS (SELECT src FROM e2 GROUP BY src HAVING count(*) >= 90),
           |e3 AS (SELECT e2.src, e2.dst FROM e2
           |       JOIN d3 a ON e2.src = a.src JOIN d3 b ON e2.dst = b.src)
           |SELECT src AS id, count(*) AS degree
           |FROM e3 GROUP BY src ORDER BY id""".stripMargin,


      // teleport mass pinned to the seeds; three unrolled rounds over
      // the same left-join spine as the Spark side
      "q_ppr" ->
        s"""WITH ${sqlCoPurchaseCtes(2)},
           |deg AS (SELECT src, count(*) AS out_deg FROM e GROUP BY 1),
           |nodes AS (SELECT DISTINCT src AS id FROM e),
           |seeds AS (SELECT DISTINCT src AS id FROM e WHERE src % 97 = 0),
           |ns AS (SELECT count(*) AS n FROM seeds),
           |tele AS (SELECT id, CAST(1.0 AS DOUBLE) / ns.n AS t FROM seeds CROSS JOIN ns),
           |pr0 AS (SELECT id, t AS pr FROM tele),
           |pr1 AS (
           |  SELECT nodes.id,
           |         CAST(0.15 AS DOUBLE) * COALESCE(tl.t, CAST(0.0 AS DOUBLE))
           |           + CAST(0.85 AS DOUBLE) * COALESCE(i1.inflow, CAST(0.0 AS DOUBLE)) AS pr
           |  FROM nodes LEFT JOIN tele tl ON tl.id = nodes.id
           |  LEFT JOIN (SELECT e.dst AS id, sum(pp.pr / CAST(d.out_deg AS DOUBLE)) AS inflow
           |             FROM e JOIN pr0 pp ON pp.id = e.src JOIN deg d ON d.src = e.src
           |             GROUP BY 1) i1 ON i1.id = nodes.id),
           |pr2 AS (
           |  SELECT nodes.id,
           |         CAST(0.15 AS DOUBLE) * COALESCE(tl.t, CAST(0.0 AS DOUBLE))
           |           + CAST(0.85 AS DOUBLE) * COALESCE(i2.inflow, CAST(0.0 AS DOUBLE)) AS pr
           |  FROM nodes LEFT JOIN tele tl ON tl.id = nodes.id
           |  LEFT JOIN (SELECT e.dst AS id, sum(pp.pr / CAST(d.out_deg AS DOUBLE)) AS inflow
           |             FROM e JOIN pr1 pp ON pp.id = e.src JOIN deg d ON d.src = e.src
           |             GROUP BY 1) i2 ON i2.id = nodes.id),
           |pr3 AS (
           |  SELECT nodes.id,
           |         CAST(0.15 AS DOUBLE) * COALESCE(tl.t, CAST(0.0 AS DOUBLE))
           |           + CAST(0.85 AS DOUBLE) * COALESCE(i3.inflow, CAST(0.0 AS DOUBLE)) AS pr
           |  FROM nodes LEFT JOIN tele tl ON tl.id = nodes.id
           |  LEFT JOIN (SELECT e.dst AS id, sum(pp.pr / CAST(d.out_deg AS DOUBLE)) AS inflow
           |             FROM e JOIN pr2 pp ON pp.id = e.src JOIN deg d ON d.src = e.src
           |             GROUP BY 1) i3 ON i3.id = nodes.id)
           |SELECT id, round(pr, 6) AS ppr FROM pr3 ORDER BY id""".stripMargin,


      // DIRECTED pair graph (no symmetrizing union), node spine
      // src ∪ dst, and the per-round dangling-mass scalar dg_i summed
      // over out-degree-0 sinks — three unrolled rounds mirroring
      // Graph.pageRankDirected term for term
      "q_pagerank_directed" ->
        """WITH p AS (
          |  SELECT a.l_partkey AS src, b.l_partkey AS dst
          |  FROM lineitem a JOIN lineitem b
          |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          |  GROUP BY 1, 2 HAVING count(*) >= 2),
          |e AS (SELECT src, dst FROM p),
          |deg AS (SELECT src, count(*) AS out_deg FROM e GROUP BY 1),
          |nodes AS (SELECT DISTINCT id FROM
          |  (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
          |nn AS (SELECT count(*) AS n FROM nodes),
          |nd AS (SELECT nodes.id, COALESCE(d.out_deg, 0) AS out_deg
          |       FROM nodes LEFT JOIN deg d ON d.src = nodes.id),
          |pr0 AS (SELECT id, out_deg, CAST(1.0 AS DOUBLE) / nn.n AS pr
          |        FROM nd CROSS JOIN nn),
          |dg0 AS (SELECT COALESCE(sum(pr), CAST(0.0 AS DOUBLE)) AS dm
          |        FROM pr0 WHERE out_deg = 0),
          |pr1 AS (
          |  SELECT nd.id, nd.out_deg,
          |         CAST(0.15 AS DOUBLE) / nn.n + CAST(0.85 AS DOUBLE) *
          |           (COALESCE(i1.inflow, CAST(0.0 AS DOUBLE)) + dg0.dm / nn.n) AS pr
          |  FROM nd CROSS JOIN nn CROSS JOIN dg0
          |  LEFT JOIN (SELECT e.dst AS id, sum(pp.pr / CAST(pp.out_deg AS DOUBLE)) AS inflow
          |             FROM e JOIN pr0 pp ON pp.id = e.src GROUP BY 1) i1
          |    ON i1.id = nd.id),
          |dg1 AS (SELECT COALESCE(sum(pr), CAST(0.0 AS DOUBLE)) AS dm
          |        FROM pr1 WHERE out_deg = 0),
          |pr2 AS (
          |  SELECT nd.id, nd.out_deg,
          |         CAST(0.15 AS DOUBLE) / nn.n + CAST(0.85 AS DOUBLE) *
          |           (COALESCE(i2.inflow, CAST(0.0 AS DOUBLE)) + dg1.dm / nn.n) AS pr
          |  FROM nd CROSS JOIN nn CROSS JOIN dg1
          |  LEFT JOIN (SELECT e.dst AS id, sum(pp.pr / CAST(pp.out_deg AS DOUBLE)) AS inflow
          |             FROM e JOIN pr1 pp ON pp.id = e.src GROUP BY 1) i2
          |    ON i2.id = nd.id),
          |dg2 AS (SELECT COALESCE(sum(pr), CAST(0.0 AS DOUBLE)) AS dm
          |        FROM pr2 WHERE out_deg = 0),
          |pr3 AS (
          |  SELECT nd.id, nd.out_deg,
          |         CAST(0.15 AS DOUBLE) / nn.n + CAST(0.85 AS DOUBLE) *
          |           (COALESCE(i3.inflow, CAST(0.0 AS DOUBLE)) + dg2.dm / nn.n) AS pr
          |  FROM nd CROSS JOIN nn CROSS JOIN dg2
          |  LEFT JOIN (SELECT e.dst AS id, sum(pp.pr / CAST(pp.out_deg AS DOUBLE)) AS inflow
          |             FROM e JOIN pr2 pp ON pp.id = e.src GROUP BY 1) i3
          |    ON i3.id = nd.id)
          |SELECT id, round(pr, 6) AS pr FROM pr3 ORDER BY id""".stripMargin,


      // integer-exact unnormalized HITS: two authority/hub rounds of
      // exact walk-count sums over the directed pair graph, one
      // max-normalization at the very end — mirrors Graph.hits term
      // for term (h0 ≡ 1 folds the first authority round into an
      // in-degree-style sum)
      "q_hits" ->
        s"""WITH ${sqlCoPurchaseCtes(2)},
           |de AS (SELECT src, dst FROM p),
           |nd AS (SELECT src AS id FROM de UNION SELECT dst AS id FROM de),
           |a1 AS (SELECT nd.id, COALESCE(x.a, 0) AS a FROM nd
           |       LEFT JOIN (SELECT dst AS id, count(*) AS a
           |                  FROM de GROUP BY 1) x ON x.id = nd.id),
           |h1 AS (SELECT nd.id, COALESCE(x.h, 0) AS h FROM nd
           |       LEFT JOIN (SELECT de.src AS id, sum(a1.a) AS h
           |                  FROM de JOIN a1 ON a1.id = de.dst GROUP BY 1) x
           |         ON x.id = nd.id),
           |a2 AS (SELECT nd.id, COALESCE(x.a, 0) AS a FROM nd
           |       LEFT JOIN (SELECT de.dst AS id, sum(h1.h) AS a
           |                  FROM de JOIN h1 ON h1.id = de.src GROUP BY 1) x
           |         ON x.id = nd.id),
           |h2 AS (SELECT nd.id, COALESCE(x.h, 0) AS h FROM nd
           |       LEFT JOIN (SELECT de.src AS id, sum(a2.a) AS h
           |                  FROM de JOIN a2 ON a2.id = de.dst GROUP BY 1) x
           |         ON x.id = nd.id),
           |mx AS (SELECT max(h2.h) AS mh, max(a2.a) AS ma
           |       FROM h2 JOIN a2 ON a2.id = h2.id)
           |SELECT h2.id,
           |       round(CAST(h2.h AS DOUBLE) / CAST(nullif(mx.mh, 0) AS DOUBLE), 6) AS hub,
           |       round(CAST(a2.a AS DOUBLE) / CAST(nullif(mx.ma, 0) AS DOUBLE), 6) AS auth
           |FROM h2 JOIN a2 ON a2.id = h2.id CROSS JOIN mx
           |ORDER BY h2.id""".stripMargin,


      // bounded-hop weighted shortest path: recursive walk carrying
      // exact integer path cost, capped at 4 hops, min per node —
      // exactly the set Bellman-Ford minimizes over after 4 relaxation
      // rounds. Weight w = 11 − min(m, 10) mirrors
      // coPurchaseWeightedPairs; edges symmetrized with the shared w.
      "q_sssp" ->
        """WITH RECURSIVE pw AS (
          |  SELECT a.l_partkey AS id1, b.l_partkey AS id2,
          |         11 - least(count(*), 10) AS w
          |  FROM lineitem a JOIN lineitem b
          |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          |  GROUP BY 1, 2 HAVING count(*) >= 2),
          |ew AS (SELECT id1 AS src, id2 AS dst, w FROM pw
          |       UNION ALL SELECT id2, id1, w FROM pw),
          |seeds AS (SELECT DISTINCT src AS id FROM ew WHERE src % 97 = 0),
          |walk(id, dist, hop) AS (
          |  SELECT id, CAST(0 AS BIGINT) AS dist, 0 AS hop FROM seeds
          |  UNION
          |  SELECT ew.dst, w2.dist + ew.w, w2.hop + 1
          |  FROM walk w2 JOIN ew ON ew.src = w2.id
          |  WHERE w2.hop < 4)
          |SELECT id, min(dist) AS dist
          |FROM walk GROUP BY id ORDER BY id""".stripMargin,


      // degree-oriented triangle closure, staged exactly as the Spark
      // side: orient small→large by (deg, id), pair out-neighbors in
      // orientation order, close with a semi-join
      "q_transitivity" ->
        s"""WITH ${sqlCoPurchaseCtes(2)},
           |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
           |orient AS (
           |  SELECT e.src, e.dst, dd.deg AS ddst
           |  FROM e JOIN deg ds ON e.src = ds.src JOIN deg dd ON e.dst = dd.src
           |  WHERE ds.deg < dd.deg OR (ds.deg = dd.deg AND e.src < e.dst)),
           |wedge AS (
           |  SELECT a.dst AS v, b.dst AS w
           |  FROM orient a JOIN orient b ON a.src = b.src
           |  WHERE a.ddst < b.ddst OR (a.ddst = b.ddst AND a.dst < b.dst)),
           |tri AS (
           |  SELECT count(*) AS n_triangles
           |  FROM wedge WHERE EXISTS (
           |    SELECT 1 FROM orient o WHERE o.src = wedge.v AND o.dst = wedge.w)),
           |ow AS (SELECT CAST(sum(deg * (deg - 1)) / 2 AS BIGINT) AS n_wedges FROM deg)
           |SELECT n_triangles, n_wedges,
           |       round(3.0 * CAST(n_triangles AS DOUBLE) / CAST(n_wedges AS DOUBLE), 6)
           |         AS transitivity
           |FROM tri CROSS JOIN ow ORDER BY n_triangles""".stripMargin,


      // support(u,v) = |N(u) ∩ N(v)| counted directly on the
      // symmetrized edge set (the brute-force definition — the Spark
      // side's oriented single-detection + 3-edge credit must agree);
      // zero-support edges kept via the left join
      "q_edge_support" ->
        s"""WITH ${sqlCoPurchaseCtes(2)},
           |und AS (SELECT src AS id1, dst AS id2 FROM p),
           |sup AS (
           |  SELECT u.id1, u.id2, count(*) AS s
           |  FROM und u
           |  JOIN e a ON a.src = u.id1
           |  JOIN e b ON b.src = u.id2 AND b.dst = a.dst
           |  GROUP BY 1, 2)
           |SELECT u.id1 AS id1, u.id2 AS id2,
           |       CAST(COALESCE(sup.s, 0) AS BIGINT) AS support
           |FROM und u LEFT JOIN sup ON sup.id1 = u.id1 AND sup.id2 = u.id2
           |ORDER BY u.id1, u.id2""".stripMargin,


      // two unrolled peel rounds (support >= k-2 = 1 on the CURRENT
      // set), then the final-set support — mirrors Graph.kTrussPeel
      // round for round; an edge absent from a support CTE has support
      // 0 and the inner join drops it, matching the < k-2 drop
      "q_ktruss" ->
        s"""WITH ${sqlCoPurchaseCtes(2)},
           |u0 AS (SELECT src AS id1, dst AS id2 FROM p),
           |s0 AS (
           |  SELECT u.id1, u.id2, count(*) AS s
           |  FROM u0 u
           |  JOIN e a ON a.src = u.id1
           |  JOIN e b ON b.src = u.id2 AND b.dst = a.dst
           |  GROUP BY 1, 2),
           |u1 AS (SELECT u0.id1, u0.id2 FROM u0
           |       JOIN s0 ON s0.id1 = u0.id1 AND s0.id2 = u0.id2 AND s0.s >= 1),
           |e1 AS (SELECT id1 AS src, id2 AS dst FROM u1
           |       UNION ALL SELECT id2, id1 FROM u1),
           |s1 AS (
           |  SELECT u.id1, u.id2, count(*) AS s
           |  FROM u1 u
           |  JOIN e1 a ON a.src = u.id1
           |  JOIN e1 b ON b.src = u.id2 AND b.dst = a.dst
           |  GROUP BY 1, 2),
           |u2 AS (SELECT u1.id1, u1.id2 FROM u1
           |       JOIN s1 ON s1.id1 = u1.id1 AND s1.id2 = u1.id2 AND s1.s >= 1),
           |e2 AS (SELECT id1 AS src, id2 AS dst FROM u2
           |       UNION ALL SELECT id2, id1 FROM u2),
           |s2 AS (
           |  SELECT u.id1, u.id2, count(*) AS s
           |  FROM u2 u
           |  JOIN e2 a ON a.src = u.id1
           |  JOIN e2 b ON b.src = u.id2 AND b.dst = a.dst
           |  GROUP BY 1, 2)
           |SELECT u.id1 AS id1, u.id2 AS id2,
           |       CAST(COALESCE(s2.s, 0) AS BIGINT) AS support
           |FROM u2 u LEFT JOIN s2 ON s2.id1 = u.id1 AND s2.id2 = u.id2
           |ORDER BY u.id1, u.id2""".stripMargin,


      "q_degree_assort" ->
        s"""WITH ${sqlCoPurchaseCtes(2)},
           |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
           |xy AS (
           |  SELECT dx.deg AS x, dy.deg AS y
           |  FROM e JOIN deg dx ON e.src = dx.src JOIN deg dy ON e.dst = dy.src),
           |s AS (
           |  SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
           |         CAST(sum(x * y) AS BIGINT) AS sxy,
           |         CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy
           |  FROM xy)
           |SELECT n AS n_edges,
           |       round((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
           |             / sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
           |                    * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))), 6)
           |         AS assortativity
           |FROM s ORDER BY n_edges""".stripMargin,


      // the same 7 max-relaxation steps the engine's fixpoint loop
      // converges in (band-DAG depth < 8), unrolled
      "q_dag_layers" -> {
        val steps = (1 to 7).map { k =>
          s"""l$k AS (
             |  SELECT c.id,
             |         CASE WHEN r.m IS NULL OR c.lvl >= r.m THEN c.lvl ELSE r.m END AS lvl
             |  FROM l${k - 1} c LEFT JOIN (
             |    SELECT d.dst AS id, max(c2.lvl) + 1 AS m
             |    FROM d JOIN l${k - 1} c2 ON c2.id = d.src GROUP BY d.dst) r
             |  USING (id))""".stripMargin
        }.mkString(",\n")
        s"""WITH ${sqlCoPurchaseCtes(1)},
           |d AS (SELECT DISTINCT src % 200 AS src, dst % 200 AS dst FROM p
           |      WHERE (dst % 200) // 25 = (src % 200) // 25 + 1),
           |n0 AS (SELECT src AS id FROM d UNION SELECT dst AS id FROM d),
           |l0 AS (SELECT id, CAST(0 AS BIGINT) AS lvl FROM n0),
           |$steps
           |SELECT id, lvl AS level FROM l7 ORDER BY id""".stripMargin
      },


      // the q_transitivity oriented-wedge machinery, but the closing
      // EXISTS keeps (u,v,w) and credits every corner
      "q_local_clustering" ->
        s"""WITH ${sqlCoPurchaseCtes(2)},
           |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1),
           |orient AS (
           |  SELECT e.src, e.dst, dd.deg AS ddst
           |  FROM e JOIN deg ds ON e.src = ds.src JOIN deg dd ON e.dst = dd.src
           |  WHERE ds.deg < dd.deg OR (ds.deg = dd.deg AND e.src < e.dst)),
           |wedge AS (
           |  SELECT a.src AS u, a.dst AS v, b.dst AS w
           |  FROM orient a JOIN orient b ON a.src = b.src
           |  WHERE a.ddst < b.ddst OR (a.ddst = b.ddst AND a.dst < b.dst)),
           |tri AS (
           |  SELECT u, v, w FROM wedge WHERE EXISTS (
           |    SELECT 1 FROM orient o WHERE o.src = wedge.v AND o.dst = wedge.w)),
           |corners AS (SELECT u AS id FROM tri
           |            UNION ALL SELECT v FROM tri
           |            UNION ALL SELECT w FROM tri),
           |pern AS (SELECT id, CAST(count(*) AS BIGINT) AS n_tri
           |         FROM corners GROUP BY id)
           |SELECT d.src AS id, d.deg AS degree,
           |       CAST(coalesce(p.n_tri, 0) AS BIGINT) AS n_tri,
           |       CASE WHEN d.deg >= 2 THEN
           |         round(2.0 * CAST(coalesce(p.n_tri, 0) AS DOUBLE) /
           |               CAST(d.deg * (d.deg - 1) AS DOUBLE), 6) END AS lcc
           |FROM deg d LEFT JOIN pern p ON p.id = d.src
           |ORDER BY id""".stripMargin,


      // q_common_neighbors' wedges rescored cn/(d1+d2-cn); the order
      // key is the exact integer ppb — no float in the cut; cap/floor
      // measured (sqlLinkPredParams)
      "q_node_jaccard" ->
        s"""WITH ${sqlCoPurchaseCtes(2)},
           |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1),
           |$sqlLinkPredParams,
           |keep AS (SELECT src FROM deg WHERE deg <= (SELECT cap FROM prm)),
           |ke AS (SELECT e.src AS u, e.dst AS v FROM e
           |       JOIN keep k ON e.src = k.src),
           |cn AS (
           |  SELECT a.v AS id1, b.v AS id2, CAST(count(*) AS BIGINT) AS cn
           |  FROM ke a JOIN ke b ON a.u = b.u AND a.v < b.v
           |  GROUP BY 1, 2 HAVING count(*) >= (SELECT mc FROM prm)),
           |nonadj AS (
           |  SELECT cn.id1, cn.id2, cn.cn FROM cn WHERE NOT EXISTS (
           |    SELECT 1 FROM e WHERE e.src = cn.id1 AND e.dst = cn.id2))
           |SELECT n.id1, n.id2, n.cn, d1.deg AS d1, d2.deg AS d2,
           |       n.cn * CAST(1000000000 AS BIGINT) // (d1.deg + d2.deg - n.cn) AS jaccard_ppb,
           |       round(CAST(n.cn AS DOUBLE) / CAST(d1.deg + d2.deg - n.cn AS DOUBLE), 6) AS jaccard
           |FROM nonadj n JOIN deg d1 ON n.id1 = d1.src
           |              JOIN deg d2 ON n.id2 = d2.src
           |ORDER BY jaccard_ppb DESC, id1, id2 LIMIT 40""".stripMargin,


      // distinct capped-mid 2-hop pairs minus direct edges; the score
      // is the exact integer 6*n1 + 3*n2
      "q_harmonic_centrality" ->
        s"""WITH ${sqlCoPurchaseCtes(2)},
           |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS n1 FROM e GROUP BY 1),
           |leg AS (SELECT e.src AS u, e.dst AS x FROM e
           |        JOIN deg d ON e.dst = d.src WHERE d.n1 <= 60),
           |hop2 AS (
           |  SELECT DISTINCT a.u, b.u AS u2
           |  FROM leg a JOIN leg b ON a.x = b.x AND a.u <> b.u),
           |far AS (
           |  SELECT h.u AS id, CAST(count(*) AS BIGINT) AS n2 FROM hop2 h
           |  WHERE NOT EXISTS (
           |    SELECT 1 FROM e WHERE e.src = h.u AND e.dst = h.u2)
           |  GROUP BY 1)
           |SELECT deg.src AS id, deg.n1, coalesce(far.n2, 0) AS n2,
           |       deg.n1 * 6 + coalesce(far.n2, 0) * 3 AS harmonic6,
           |       round(CAST(deg.n1 * 6 + coalesce(far.n2, 0) * 3 AS DOUBLE) / 6.0, 6) AS harmonic
           |FROM deg LEFT JOIN far ON deg.src = far.id
           |ORDER BY id""".stripMargin,


      // doubled-form clearing over the labeled subgraph: q_num =
      // e2_in * M2 - d_tot^2, one division per community
      "q_modularity" ->
        s"""WITH ${sqlCoPurchaseCtes(2)},
           |lab AS (SELECT p_partkey AS id, p_brand AS community FROM part),
           |le AS (
           |  SELECT e.src, e.dst, ls.community AS c_src, ld.community AS c_dst
           |  FROM e JOIN lab ls ON e.src = ls.id JOIN lab ld ON e.dst = ld.id),
           |m2 AS (SELECT CAST(count(*) AS BIGINT) AS m2 FROM le),
           |w AS (SELECT c_src AS community, CAST(count(*) AS BIGINT) AS e2_in
           |      FROM le WHERE c_src = c_dst GROUP BY 1),
           |dt AS (
           |  SELECT community, CAST(count(*) AS BIGINT) AS n_nodes,
           |         CAST(sum(deg) AS BIGINT) AS d_tot FROM (
           |    SELECT src, c_src AS community, CAST(count(*) AS BIGINT) AS deg
           |    FROM le GROUP BY 1, 2) GROUP BY 1)
           |SELECT dt.community, dt.n_nodes, coalesce(w.e2_in, 0) AS e2_in,
           |       dt.d_tot,
           |       coalesce(w.e2_in, 0) * m2.m2 - dt.d_tot * dt.d_tot AS q_num,
           |       round(CAST(coalesce(w.e2_in, 0) * m2.m2 - dt.d_tot * dt.d_tot AS DOUBLE) /
           |             CAST(m2.m2 * m2.m2 AS DOUBLE), 6) AS contrib
           |FROM dt LEFT JOIN w USING (community) CROSS JOIN m2
           |ORDER BY community""".stripMargin,

      // three synchronous LPA rounds unrolled; per round a (node,
      // label) vote count then plurality-with-min-label — the exact
      // deterministic update the Spark side's struct-argmax encodes
      "q_lpa" ->
        s"""WITH ${sqlCoPurchaseCtes(2)},
           |l0 AS (SELECT DISTINCT src AS id FROM e),
           |v1 AS (
           |  SELECT e.dst AS id, l.id AS lbl, count(*) AS c
           |  FROM e JOIN l0 l ON e.src = l.id GROUP BY 1, 2),
           |m1 AS (
           |  SELECT id, min(CASE WHEN c = mc THEN lbl END) AS lbl FROM (
           |    SELECT id, lbl, c, max(c) OVER (PARTITION BY id) AS mc FROM v1)
           |  GROUP BY id),
           |v2 AS (
           |  SELECT e.dst AS id, l.lbl, count(*) AS c
           |  FROM e JOIN m1 l ON e.src = l.id GROUP BY 1, 2),
           |m2 AS (
           |  SELECT id, min(CASE WHEN c = mc THEN lbl END) AS lbl FROM (
           |    SELECT id, lbl, c, max(c) OVER (PARTITION BY id) AS mc FROM v2)
           |  GROUP BY id),
           |v3 AS (
           |  SELECT e.dst AS id, l.lbl, count(*) AS c
           |  FROM e JOIN m2 l ON e.src = l.id GROUP BY 1, 2),
           |m3 AS (
           |  SELECT id, min(CASE WHEN c = mc THEN lbl END) AS lbl FROM (
           |    SELECT id, lbl, c, max(c) OVER (PARTITION BY id) AS mc FROM v3)
           |  GROUP BY id)
           |SELECT id, lbl AS community FROM m3 ORDER BY id""".stripMargin,

      // recursive-CTE transitive closure on the same lift-filtered
      // edge set (exact long lift compare); scc = min over the mutual
      // reach set, sizes via the same scc-keyed window
      "q_scc" ->
        """WITH RECURSIVE sq AS (
          |  SELECT user_id, event_type AS src,
          |         lead(event_type, 1) OVER (PARTITION BY user_id
          |                                   ORDER BY ts, event_id) AS dst
          |  FROM events),
          |tr AS (SELECT src, dst FROM sq
          |       WHERE dst IS NOT NULL AND dst <> src),
          |cnt AS (SELECT src, dst, count(*)::BIGINT AS n
          |        FROM tr GROUP BY 1, 2),
          |lf AS (
          |  SELECT src, dst, n,
          |         CAST(sum(n) OVER (PARTITION BY src) AS BIGINT) AS na,
          |         CAST(sum(n) OVER (PARTITION BY dst) AS BIGINT) AS nb,
          |         CAST(sum(n) OVER () AS BIGINT) AS t
          |  FROM cnt),
          |e AS (SELECT src, dst FROM lf WHERE n * t > na * nb),
          |reach AS (
          |  SELECT src AS a, dst AS b FROM e
          |  UNION
          |  SELECT r.a, e.dst FROM reach r JOIN e ON r.b = e.src),
          |mutual AS (
          |  SELECT f.a AS id, f.b AS peer
          |  FROM reach f JOIN reach b ON f.a = b.b AND f.b = b.a),
          |nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
          |lab AS (
          |  SELECT n.id, least(n.id, coalesce(min(m.peer), n.id)) AS scc_id
          |  FROM nodes n LEFT JOIN mutual m ON m.id = n.id GROUP BY n.id)
          |SELECT id AS node, scc_id,
          |       CAST(count(*) OVER (PARTITION BY scc_id) AS BIGINT)
          |         AS scc_size
          |FROM lab ORDER BY node""".stripMargin,


      // 12 unrolled power-iteration CTEs (the q_bpe_train pattern —
      // DuckDB forbids aggregates over a recursive reference); each
      // mirrors Graph.stationaryDistribution's
      // coalesce(moved, 0) + dangling/k op for op
      "q_markov_stationary" -> {
        val iters = (1 to 12).map { i =>
          val prev = s"pi${i - 1}"
          // AS MATERIALIZED: without it DuckDB may inline the chain and
          // re-derive every earlier round per reference
          s"""pi$i AS MATERIALIZED (
             |  SELECT st.state, COALESCE(m.m, 0.0) AS pi
             |  FROM states st
             |  LEFT JOIN (SELECT pa.dst AS state, sum(prev.pi * pa.p) AS m
             |             FROM $prev prev JOIN pa ON prev.state = pa.src
             |             GROUP BY 1) m USING (state))""".stripMargin
        }.mkString(",\n")
        s"""WITH steps AS (
           |  SELECT event_type AS src,
           |         lead(event_type, 1) OVER (PARTITION BY user_id
           |                                   ORDER BY ts, event_id) AS dst
           |  FROM events),
           |cnt AS MATERIALIZED (
           |  SELECT src, dst, count(*)::BIGINT AS n
           |  FROM steps WHERE dst IS NOT NULL GROUP BY 1, 2),
           |p AS MATERIALIZED (
           |  SELECT src, dst,
           |         CAST(n AS DOUBLE)
           |           / CAST(sum(n) OVER (PARTITION BY src) AS DOUBLE) AS p
           |  FROM cnt),
           |pa AS MATERIALIZED (
           |  SELECT src, dst, p FROM p
           |  UNION ALL
           |  SELECT d.src, st.state AS dst, 1.0 / kk.k AS p
           |  FROM (SELECT state AS src FROM states
           |        WHERE state NOT IN (SELECT src FROM p)) d
           |  CROSS JOIN states st CROSS JOIN kk),
           |states AS MATERIALIZED (SELECT src AS state FROM cnt
           |           UNION SELECT dst FROM cnt),
           |kk AS (SELECT CAST(count(*) AS DOUBLE) AS k FROM states),
           |pi0 AS MATERIALIZED (
           |  SELECT state, 1.0 / kk.k AS pi FROM states CROSS JOIN kk),
           |$iters,
           |no AS (SELECT src AS state, CAST(sum(n) AS BIGINT) AS n_out
           |       FROM cnt GROUP BY 1)
           |SELECT s.state, COALESCE(no.n_out, 0) AS n_out,
           |       round(pi12.pi, 6) AS pi
           |FROM states s JOIN pi12 ON pi12.state = s.state
           |LEFT JOIN no ON no.state = s.state
           |ORDER BY s.state""".stripMargin
      },


      // same lift-filtered edges symmetrized; the recursive closure
      // carries walk parity, odd self-walks mark non-bipartite
      // components (mirrors Graph.bipartiteComponents)
      "q_bipartite" ->
        """WITH RECURSIVE sq AS (
          |  SELECT user_id, event_type AS src,
          |         lead(event_type, 1) OVER (PARTITION BY user_id
          |                                   ORDER BY ts, event_id) AS dst
          |  FROM events),
          |tr AS (SELECT src, dst FROM sq
          |       WHERE dst IS NOT NULL AND dst <> src),
          |cnt AS (SELECT src, dst, count(*)::BIGINT AS n
          |        FROM tr GROUP BY 1, 2),
          |lf AS (
          |  SELECT src, dst, n,
          |         CAST(sum(n) OVER (PARTITION BY src) AS BIGINT) AS na,
          |         CAST(sum(n) OVER (PARTITION BY dst) AS BIGINT) AS nb,
          |         CAST(sum(n) OVER () AS BIGINT) AS t
          |  FROM cnt),
          |e0 AS (SELECT src, dst FROM lf WHERE n * t > na * nb),
          |se AS (
          |  SELECT src, dst FROM e0 WHERE src <> dst
          |  UNION SELECT dst, src FROM e0 WHERE src <> dst),
          |reach AS (
          |  SELECT src AS a, dst AS b, 1 AS p FROM se
          |  UNION
          |  SELECT r.a, se.dst, (r.p + 1) % 2 FROM reach r
          |  JOIN se ON r.b = se.src),
          |nodes AS (SELECT src AS id FROM se UNION SELECT dst FROM se),
          |lab AS (
          |  SELECT n.id, least(n.id, coalesce(min(r.b), n.id)) AS comp_id
          |  FROM nodes n LEFT JOIN reach r ON r.a = n.id GROUP BY n.id),
          |odd AS (SELECT DISTINCT a AS id FROM reach
          |        WHERE a = b AND p = 1),
          |fl AS (
          |  SELECT l.id, l.comp_id,
          |         CASE WHEN o.id IS NULL THEN 0 ELSE 1 END AS o
          |  FROM lab l LEFT JOIN odd o ON o.id = l.id)
          |SELECT id AS node, comp_id,
          |       max(o) OVER (PARTITION BY comp_id) = 0 AS comp_bipartite
          |FROM fl ORDER BY node""".stripMargin,


      "q_conductance" ->
        s"""WITH ${sqlCoPurchaseCtes(2)},
           |lab AS (SELECT p_partkey AS id, p_brand AS community FROM part),
           |le AS (
           |  SELECT e.src, e.dst, ls.community AS c_src, ld.community AS c_dst
           |  FROM e JOIN lab ls ON e.src = ls.id JOIN lab ld ON e.dst = ld.id),
           |m2 AS (SELECT CAST(count(*) AS BIGINT) AS m2 FROM le),
           |g AS (
           |  SELECT c_src AS community, CAST(count(*) AS BIGINT) AS vol,
           |         CAST(sum(CASE WHEN c_src <> c_dst THEN 1 ELSE 0 END) AS BIGINT) AS cut
           |  FROM le GROUP BY 1)
           |SELECT community, vol, cut,
           |       CASE WHEN least(vol, m2.m2 - vol) > 0 THEN
           |         round(CAST(cut AS DOUBLE) / least(vol, m2.m2 - vol), 6)
           |       END AS conductance
           |FROM g CROSS JOIN m2 ORDER BY community""".stripMargin,


      // the q_dag_layers unrolled max-propagation with max(cost + w)
      // instead of max(lvl) + 1 — same 7-step fixpoint on the 8-band
      // DAG, deterministic integer stage costs
      "q_critical_path" -> {
        val steps = (1 to 7).map { k =>
          s"""c$k AS (
             |  SELECT c.id,
             |         CASE WHEN r.m IS NULL OR c.cost >= r.m THEN c.cost ELSE r.m END AS cost
             |  FROM c${k - 1} c LEFT JOIN (
             |    SELECT d.dst AS id, max(c2.cost + d.w) AS m
             |    FROM d JOIN c${k - 1} c2 ON c2.id = d.src GROUP BY d.dst) r
             |  USING (id))""".stripMargin
        }.mkString(",\n")
        s"""WITH ${sqlCoPurchaseCtes(1)},
           |d AS (SELECT src, dst, 1 + (src * 7 + dst) % 5 AS w FROM (
           |        SELECT DISTINCT src % 200 AS src, dst % 200 AS dst FROM p
           |        WHERE (dst % 200) // 25 = (src % 200) // 25 + 1)),
           |n0 AS (SELECT src AS id FROM d UNION SELECT dst AS id FROM d),
           |c0 AS (SELECT id, CAST(0 AS BIGINT) AS cost FROM n0),
           |$steps
           |SELECT id, CAST(cost AS BIGINT) AS cost FROM c7 ORDER BY id""".stripMargin
      },


      // q_common_neighbors' wedge CTEs with the apex 1/ln(deg) weight
      // carried and summed; float sum rounded at 6 both sides;
      // cap/floor measured (sqlLinkPredParams)
      "q_adamic_adar" ->
        s"""WITH ${sqlCoPurchaseCtes(2)},
           |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1),
           |$sqlLinkPredParams,
           |ke AS (SELECT e.src AS u, e.dst AS v,
           |              CAST(1.0 AS DOUBLE) / ln(CAST(deg.deg AS DOUBLE)) AS w_apex
           |       FROM e JOIN deg ON e.src = deg.src
           |       WHERE deg.deg <= (SELECT cap FROM prm)),
           |cn AS (
           |  SELECT a.v AS id1, b.v AS id2, CAST(count(*) AS BIGINT) AS cn,
           |         sum(a.w_apex) AS aa_raw
           |  FROM ke a JOIN ke b ON a.u = b.u AND a.v < b.v
           |  GROUP BY 1, 2 HAVING count(*) >= (SELECT mc FROM prm)),
           |nonadj AS (
           |  SELECT id1, id2, cn, aa_raw FROM cn WHERE NOT EXISTS (
           |    SELECT 1 FROM e WHERE e.src = cn.id1 AND e.dst = cn.id2))
           |SELECT id1, id2, cn, round(aa_raw, 6) AS aa FROM nonadj
           |ORDER BY aa DESC, id1, id2 LIMIT 40""".stripMargin,


      // scaled-long component sums; cosine of SUM vectors == centroid
      // cosine (scale invariance); every gated float one fixed tower
      "q_label_centroids" ->
        """WITH comps AS (
          |  SELECT label, idx,
          |         CAST(floor(CAST(embedding[idx + 1] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS q
          |  FROM (SELECT label, embedding, unnest(range(len(embedding))) AS idx
          |        FROM embeddings)),
          |cent AS (SELECT label, idx, sum(q) AS sq FROM comps GROUP BY 1, 2),
          |norms AS (SELECT label, sum(sq * sq) AS nrm FROM cent GROUP BY 1),
          |cnts AS (SELECT label, count(*) AS n FROM embeddings GROUP BY 1),
          |pair AS (
          |  SELECT a.label AS label_a, b.label AS label_b, sum(a.sq * b.sq) AS dt
          |  FROM cent a JOIN cent b ON a.idx = b.idx AND a.label < b.label
          |  GROUP BY 1, 2)
          |SELECT p.label_a, p.label_b,
          |       CAST(ca.n AS BIGINT) AS n_a, CAST(cb.n AS BIGINT) AS n_b,
          |       round(CAST(p.dt AS DOUBLE) /
          |             (sqrt(CAST(na.nrm AS DOUBLE)) * sqrt(CAST(nb.nrm AS DOUBLE))), 6)
          |         AS centroid_cos
          |FROM pair p
          |JOIN norms na ON na.label = p.label_a
          |JOIN norms nb ON nb.label = p.label_b
          |JOIN cnts ca ON ca.label = p.label_a
          |JOIN cnts cb ON cb.label = p.label_b
          |ORDER BY label_a, label_b""".stripMargin,


      // classifier-score CTE chain shared with q_calibration; decile
      // rank over (r DESC, doc_id) is a total order, so ntile matches
      "q_lift_table" ->
        """WITH toks AS (
          |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS l
          |  FROM documents),
          |f AS (
          |  SELECT doc_id,
          |         CAST(('0x' || substring(md5('f:' || t), 1, 8)) AS BIGINT) % 1024 AS bucket
          |  FROM (SELECT doc_id, unnest(l) AS t FROM toks)),
          |m AS (
          |  SELECT i AS bucket,
          |         (CAST(('0x' || substring(md5('w:' || CAST(i AS VARCHAR)), 1, 8)) AS BIGINT) % 2001 - 1000) / 1000.0 AS w
          |  FROM range(1024) r(i)),
          |z AS (
          |  SELECT doc_id, sum(w) / count(*) AS mean_w
          |  FROM f JOIN m USING (bucket) GROUP BY 1),
          |s AS (
          |  SELECT t.doc_id,
          |         round(1.0 / (1.0 + exp(-8.0 * coalesce(z.mean_w, 0.0))), 6) AS r
          |  FROM toks t LEFT JOIN z USING (doc_id)),
          |lab AS (
          |  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
          |  FROM documents),
          |rk AS (
          |  SELECT s.doc_id, r, pos,
          |         ntile(10) OVER (ORDER BY r DESC, s.doc_id) AS bucket
          |  FROM s JOIN lab USING (doc_id)),
          |pb AS (
          |  SELECT bucket, count(*) AS n, CAST(sum(pos) AS BIGINT) AS n_pos
          |  FROM rk GROUP BY 1),
          |c AS (
          |  SELECT bucket, n, n_pos,
          |         sum(n) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS cum_n,
          |         sum(n_pos) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS cum_pos,
          |         sum(n) OVER () AS tot_n, sum(n_pos) OVER () AS tot_pos
          |  FROM pb)
          |SELECT CAST(bucket AS INTEGER) AS bucket, n, n_pos,
          |       CAST(cum_n AS BIGINT) AS cum_n, CAST(cum_pos AS BIGINT) AS cum_pos,
          |       round(CAST(cum_pos AS DOUBLE) / CAST(cum_n AS DOUBLE), 6) AS cum_precision,
          |       CASE WHEN tot_pos > 0
          |            THEN round(CAST(cum_pos * tot_n AS DOUBLE) / CAST(cum_n * tot_pos AS DOUBLE), 6)
          |       END AS lift
          |FROM c ORDER BY bucket""".stripMargin,


      // same bucket CTE as the ANN family; both argmax directions rank
      // on the rounded cosine with the neighbor id tie-break
      "q_reciprocal_match" ->
        s"""WITH b AS (
           |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
           |         CAST(${sqlHyperplaneBucket("embedding")} AS INTEGER) AS bucket
           |  FROM embeddings),
           |p AS (
           |  SELECT a.vec_id AS src, bb.vec_id AS dst,
           |         round(list_cosine_similarity(a.v, bb.v), 6) AS c
           |  FROM b a JOIN b bb ON a.bucket = bb.bucket AND a.vec_id <> bb.vec_id),
           |best AS (
           |  SELECT src, dst, c FROM (
           |    SELECT src, dst, c,
           |           row_number() OVER (PARTITION BY src ORDER BY c DESC, dst) AS r
           |    FROM p) WHERE r = 1)
           |SELECT f.src AS id1, f.dst AS id2, f.c AS cosine
           |FROM best f JOIN best g ON f.src = g.dst AND f.dst = g.src
           |WHERE f.src < f.dst
           |ORDER BY id1""".stripMargin,


      "q_grid_join" ->
        s"""WITH $sqlGridCtes,
           |j AS (
           |  SELECT greatest(abs(ax - b.x), abs(ay - b.y)) AS dist
           |  FROM pr JOIN g b ON pr.ncx = b.cx AND pr.ncy = b.cy
           |                  AND pr.id_a < b.event_id
           |  WHERE greatest(abs(ax - b.x), abs(ay - b.y)) <= 8)
           |SELECT dist, count(*) AS n_pairs FROM j GROUP BY 1 ORDER BY 1""".stripMargin,


      // directional join (id_a <> id_b) gives the symmetric candidate
      // set directly; argmin by the (dist, id) total order
      "q_spatial_nn" ->
        s"""WITH $sqlGridCtes,
           |j AS (
           |  SELECT id_a, b.event_id AS id_b,
           |         greatest(abs(ax - b.x), abs(ay - b.y)) AS dist
           |  FROM pr JOIN g b ON pr.ncx = b.cx AND pr.ncy = b.cy
           |                  AND pr.id_a <> b.event_id
           |  WHERE greatest(abs(ax - b.x), abs(ay - b.y)) <= 8),
           |n AS (
           |  SELECT id_a, id_b, dist,
           |         row_number() OVER (PARTITION BY id_a ORDER BY dist, id_b) AS rn
           |  FROM j)
           |SELECT id_a AS id, id_b AS nn_id, CAST(dist AS BIGINT) AS nn_dist
           |FROM n WHERE rn = 1 ORDER BY id""".stripMargin,


      // cell-level DBSCAN: same md5 points, 200-cell quantization, core
      // at >= 6, recursive-CTE min-label components over 8-neighbor core
      // cells, cell-level border adoption, noise = -1
      "q_dbscan_grid" ->
        """WITH RECURSIVE c AS (
          |  SELECT event_id,
          |         CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 AS x,
          |         CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR)), 9, 8)) AS BIGINT) % 10000 AS y
          |  FROM events),
          |g AS (SELECT event_id, x // 200 AS cx, y // 200 AS cy FROM c),
          |cells AS (SELECT cx, cy, count(*) AS n FROM g GROUP BY 1, 2),
          |core AS (SELECT cx * 1000000 + cy AS k, cx, cy FROM cells WHERE n >= 6),
          |edge AS (SELECT a.k AS src, b.k AS dst FROM core a JOIN core b
          |         ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1),
          |r(k, lbl) AS (
          |  SELECT src, src FROM edge
          |  UNION
          |  SELECT e.src, r.lbl FROM edge e JOIN r ON e.dst = r.k),
          |lab AS (SELECT k, min(lbl) AS cluster_id FROM r GROUP BY 1),
          |border AS (
          |  SELECT nc.cx, nc.cy, min(lab.cluster_id) AS cluster_id
          |  FROM (SELECT cx, cy FROM cells WHERE n < 6) nc
          |  JOIN core ON abs(nc.cx - core.cx) <= 1 AND abs(nc.cy - core.cy) <= 1
          |  JOIN lab ON lab.k = core.k
          |  GROUP BY 1, 2),
          |pt AS (
          |  SELECT g.event_id, g.cx, g.cy,
          |         CASE WHEN lab.cluster_id IS NOT NULL THEN lab.cluster_id
          |              WHEN border.cluster_id IS NOT NULL THEN border.cluster_id
          |              ELSE -1 END AS cluster_id,
          |         CASE WHEN lab.cluster_id IS NOT NULL THEN 1 ELSE 0 END AS is_core
          |  FROM g
          |  LEFT JOIN lab ON lab.k = g.cx * 1000000 + g.cy
          |  LEFT JOIN border ON border.cx = g.cx AND border.cy = g.cy)
          |SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_points,
          |       CAST(sum(is_core) AS BIGINT) AS n_core_points,
          |       CAST(count(DISTINCT cx * 1000000 + cy) AS BIGINT) AS n_cells
          |FROM pt GROUP BY 1 ORDER BY cluster_id""".stripMargin,


      // same MEASURED apex cap / noise floor (sqlLinkPredParams),
      // wedge grouping, anti-join, and (cn, id) total order as
      // Graph.commonNeighbors + linkPredictionParams
      "q_common_neighbors" ->
        s"""WITH ${sqlCoPurchaseCtes(2)},
           |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
           |$sqlLinkPredParams,
           |keep AS (SELECT src FROM deg WHERE deg <= (SELECT cap FROM prm)),
           |ke AS (SELECT e.src AS u, e.dst AS v FROM e
           |       JOIN keep k ON e.src = k.src),
           |cn AS (
           |  SELECT a.v AS id1, b.v AS id2, count(*) AS cn
           |  FROM ke a JOIN ke b ON a.u = b.u AND a.v < b.v
           |  GROUP BY 1, 2 HAVING count(*) >= (SELECT mc FROM prm)),
           |nonadj AS (
           |  SELECT cn.id1, cn.id2, cn.cn FROM cn WHERE NOT EXISTS (
           |    SELECT 1 FROM e WHERE e.src = cn.id1 AND e.dst = cn.id2))
           |SELECT id1, id2, CAST(cn AS BIGINT) AS cn FROM nonadj
           |ORDER BY cn DESC, id1, id2 LIMIT 40""".stripMargin,


      "q_audience_overlap" ->
        """WITH au AS (
          |  SELECT event_type, user_id FROM events
          |  GROUP BY 1, 2 HAVING count(*) >= 15),
          |sz AS (SELECT event_type, count(*) AS n FROM au GROUP BY 1),
          |inter AS (
          |  SELECT a.event_type AS t1, b.event_type AS t2, count(*) AS n_both
          |  FROM au a JOIN au b ON a.user_id = b.user_id AND a.event_type < b.event_type
          |  GROUP BY 1, 2)
          |SELECT t1, t2, sa.n AS n_a, sb.n AS n_b, n_both,
          |       round(CAST(n_both AS DOUBLE) / (sa.n + sb.n - n_both), 6) AS jaccard
          |FROM inter JOIN sz sa ON sa.event_type = t1
          |JOIN sz sb ON sb.event_type = t2
          |ORDER BY t1, t2""".stripMargin,


      // same pair threshold, symmetrize, and 3 unrolled PR rounds as
      // the q_pagerank oracle, over the word co-occurrence edges
      "q_textrank" ->
        """WITH toks AS (
          |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS l
          |  FROM documents),
          |bg AS (
          |  SELECT unnest([array_to_string(l[i:i+1], ' ') for i in range(1, len(l))]) AS bgm
          |  FROM toks),
          |sp AS (SELECT string_split(bgm, ' ') AS w FROM bg),
          |p AS (
          |  SELECT w[1] AS src, w[2] AS dst FROM sp WHERE w[1] < w[2]
          |  GROUP BY 1, 2 HAVING count(*) >= 35),
          |e AS (SELECT src, dst FROM p UNION ALL SELECT dst, src FROM p),
          |deg AS (SELECT src, count(*) AS out_deg FROM e GROUP BY 1),
          |nodes AS (SELECT DISTINCT src AS id FROM e),
          |nn AS (SELECT count(*) AS n FROM nodes),
          |pr0 AS (SELECT id, CAST(1.0 AS DOUBLE) / nn.n AS pr FROM nodes CROSS JOIN nn),
          |pr1 AS (
          |  SELECT nodes.id, CAST(0.15 AS DOUBLE) / nn.n
          |         + CAST(0.85 AS DOUBLE) * COALESCE(i1.inflow, CAST(0.0 AS DOUBLE)) AS pr
          |  FROM nodes CROSS JOIN nn
          |  LEFT JOIN (SELECT e.dst AS id, sum(pp.pr / CAST(d.out_deg AS DOUBLE)) AS inflow
          |             FROM e JOIN pr0 pp ON pp.id = e.src JOIN deg d ON d.src = e.src
          |             GROUP BY 1) i1 ON i1.id = nodes.id),
          |pr2 AS (
          |  SELECT nodes.id, CAST(0.15 AS DOUBLE) / nn.n
          |         + CAST(0.85 AS DOUBLE) * COALESCE(i2.inflow, CAST(0.0 AS DOUBLE)) AS pr
          |  FROM nodes CROSS JOIN nn
          |  LEFT JOIN (SELECT e.dst AS id, sum(pp.pr / CAST(d.out_deg AS DOUBLE)) AS inflow
          |             FROM e JOIN pr1 pp ON pp.id = e.src JOIN deg d ON d.src = e.src
          |             GROUP BY 1) i2 ON i2.id = nodes.id),
          |pr3 AS (
          |  SELECT nodes.id, CAST(0.15 AS DOUBLE) / nn.n
          |         + CAST(0.85 AS DOUBLE) * COALESCE(i3.inflow, CAST(0.0 AS DOUBLE)) AS pr
          |  FROM nodes CROSS JOIN nn
          |  LEFT JOIN (SELECT e.dst AS id, sum(pp.pr / CAST(d.out_deg AS DOUBLE)) AS inflow
          |             FROM e JOIN pr2 pp ON pp.id = e.src JOIN deg d ON d.src = e.src
          |             GROUP BY 1) i3 ON i3.id = nodes.id)
          |SELECT id AS word, round(pr, 6) AS score FROM pr3
          |ORDER BY score DESC, word LIMIT 20""".stripMargin,
  )
}
