package graft

import org.apache.spark.sql.functions._

/** ORC datasource coverage: the other first-class columnar lake format
  * (Spark ships the reader/writer built in — no extra dependency).
  * Everything the parquet path relies on must hold here too: lossless
  * roundtrip, predicate pushdown to the scan, and column pruning.
  */
class OrcSpec extends SparkSpec {

  test("orc: lossless roundtrip of a mixed-type frame") {
    val src = spark.read.parquet(s"${SparkSpec.sf0001}/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString
    src.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == src.schema, "schema drifted through ORC")
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty,
      "rows drifted through ORC")
  }

  test("orc: filter pushdown and column pruning reach the scan") {
    val src = spark.read.parquet(s"${SparkSpec.sf0001}/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString
    src.write.mode("overwrite").orc(dir)
    val q = spark.read.orc(dir)
      .filter(col("n_chars") > 500)
      .select("doc_id", "lang")
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(n_chars), GreaterThan(n_chars,500)"),
      s"ORC filter not pushed:\n$p")
    assert(!p.contains("text"), "unprojected text column still read from ORC")
  }
}
