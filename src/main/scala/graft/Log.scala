package graft

/** Logging hygiene for the Bench/Verify mains.
  *
  * WindowExec logs "No Partition Defined for Window operation!" at WARN
  * once per TASK. The handful of global windows in this library are
  * individually audited (each carries a scaladoc contract that its
  * input is a grid-sized aggregate — day grids, vocab tables, score
  * deciles — and PlanAuditSpec walks every plan), so the per-task
  * repeat carries no information; at 346 queries x 32 tasks it flooded
  * the round-11 driver bench's captured stdout tail and made the
  * partial artifact unreadable (BENCH_r11.json's tail was nothing but
  * this line). Raise that one logger to ERROR in the bench/verify
  * entrypoints — library code never touches global log config.
  */
object Log {
  def silenceNoisyWarnings(): Unit = {
    try {
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.sql.execution.window.WindowExec",
        org.apache.logging.log4j.Level.ERROR)
      // same per-task repetition, same audited-pattern story: single-
      // partition warnings from coalesce(1) writes in Verify
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.sql.execution.window.WindowGroupLimitExec",
        org.apache.logging.log4j.Level.ERROR)
      // "RDD was locally checkpointed, its lineage has been truncated"
      // fires once per RDD on every snapshot/release cycle — the
      // release discipline is deliberate (Graph/Dedup scaladoc
      // contracts) and the warning repeats hundreds of times across a
      // full bench run
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.rdd.MapPartitionsRDD",
        org.apache.logging.log4j.Level.ERROR)
    } catch { case _: Throwable => () } // logging config must never fail a run
  }
}
