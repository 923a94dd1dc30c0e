package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants that need no SparkSession. A query
  * without an oracle silently downgrades to a rows-only check in the
  * driver's correctness gate — this spec turns that drift into a test
  * failure at build time.
  */
class ContractSpec extends AnyFunSuite {

  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(q.diff(o).isEmpty, s"queries missing oracles: ${q.diff(o).toSeq.sorted}")
    assert(o.diff(q).isEmpty, s"orphan oracles: ${o.diff(q).toSeq.sorted}")
  }

  test("query names follow the q_ convention and are non-empty SQL") {
    assert(SparkEntry.queries.keys.forall(_.startsWith("q_")))
    assert(SparkEntry.oracleSql.values.forall(_.trim.toUpperCase.contains("SELECT")))
  }

  test("oracle SQL ends in a total ORDER BY (determinism discipline)") {
    // every oracle must impose an output order — the driver compare
    // hashes rows in sequence
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.toUpperCase.contains("ORDER BY"), s"$name oracle has no ORDER BY")
    }
  }

  test("registry shards: disjoint names, census equals the aggregated maps") {
    // the round-9 split of the 11k-line SparkEntry into per-domain
    // shards must never silently drop or shadow an entry: a duplicate
    // name across shards would vanish inside toMap
    val shards = Seq(
      "core" -> QueriesCore.queries, "lake" -> QueriesLake.queries,
      "stream" -> QueriesStream.queries, "text" -> QueriesText.queries,
      "sim" -> QueriesSim.queries, "graph" -> QueriesGraph.queries,
      "stats" -> QueriesStats.queries, "ts" -> QueriesTs.queries)
    shards.foreach { case (n, qs) => assert(qs.nonEmpty, s"empty shard $n") }
    val names = shards.flatMap(_._2.map(_._1))
    assert(names.distinct.size == names.size,
      "duplicate query across shards: " +
        names.diff(names.distinct).distinct.mkString(", "))
    assert(names.toSet == SparkEntry.queries.keySet)
    // ratchet: equals the declared surface — bump in the SAME commit
    // that adds a query, so a shard-merge error can never silently
    // drop entries (round-9 verdict item 5)
    assert(names.size >= 358, s"query census shrank to ${names.size}")
    val oracleNames = Seq(QueriesCore.oracles, QueriesLake.oracles,
      QueriesStream.oracles, QueriesText.oracles, QueriesSim.oracles,
      QueriesGraph.oracles, QueriesStats.oracles, QueriesTs.oracles)
      .flatMap(_.map(_._1))
    assert(oracleNames.distinct.size == oracleNames.size)
    assert(oracleNames.toSet == SparkEntry.oracleSql.keySet)
  }

  test("oracle LSH bucket-cap literal matches lshCandidatePairs' admission formula") {
    // the five LSH oracles hardcode `BETWEEN 2 AND <cap>`; the Spark
    // side computes the cap as lshAdmissionCap(maxBucketSize,
    // maxPairsPerBucket). Pin the literal to the formula so a default
    // change on either side fails here instead of at the driver gate.
    val cap = graft.ext.Dedup.lshAdmissionCap(1000, 50000L)
    assert(cap == 316L, s"admission formula moved: $cap")
    val users = Seq("q_lsh_pairs", "q_dedup_clusters", "q_dedup_keep_best",
      "q_dedup_ensemble", "q_minhash_eval")
    val withCap = SparkEntry.oracleSql.filter(_._2.contains(s"BETWEEN 2 AND $cap")).keySet
    users.foreach { q =>
      assert(withCap.contains(q),
        s"$q oracle bucket cap does not match lshAdmissionCap = $cap")
    }
    assert(SparkEntry.oracleSql.forall { case (n, s) =>
      !s.contains("BETWEEN 2 AND 1000") },
      "stale 1000-doc bucket cap survives in an oracle")
  }
}
