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
