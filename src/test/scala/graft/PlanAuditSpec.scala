package graft

/** Whole-contract plan hygiene: every one of the ~165 queries is
  * planned at sf0.001 and audited for the one shape that is never
  * acceptable at 100 TB — a non-broadcast cartesian product
  * (`CartesianProductExec`: |left|×|right| rows through one task pair,
  * quadratic shuffle-free blowup). Broadcast nested-loop joins are
  * allowed: the tiny-side-broadcast non-equi joins (`q_range_lookup`,
  * the one-row totals cross joins) are deliberate, documented shapes.
  *
  * This is the global companion to `PlanSpec`'s per-query pins: a new
  * query that accidentally drops a join key or hints nothing gets
  * caught at build time, not in a 100-TB bill.
  */
class PlanAuditSpec extends SparkSpec {

  test("no query plans a CartesianProduct") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      // building the frame runs any inline setup (file writes, CC
      // rounds, stream drains) at sf0.001 — cheap, and exactly what
      // the planner would see in production
      val plan = fn(spark, SparkSpec.sf0001).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) Some(name) else None
    }
    // building 321 queries registers every builder-side .persist() in
    // the CacheManager (registration happens at analysis, not action);
    // left in place they SUBSTITUTE InMemoryRelations into plans built
    // by later suites on the shared session, breaking their scan/cache
    // assertions (PlanSpec's q_lsh_pairs no-cache pin found this)
    spark.catalog.clearCache()
    assert(offenders.isEmpty, s"cartesian products planned by: $offenders")
  }
}
