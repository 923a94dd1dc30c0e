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
}
