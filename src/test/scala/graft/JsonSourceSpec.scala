package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON-lines source coverage: schema'd reads (never inference at
  * scale — it costs a full extra pass), write/read fidelity, and
  * malformed-row tolerance. At 100 TB a single corrupt line must not
  * kill the job (PERMISSIVE + corrupt-record column quarantines it),
  * but FAILFAST is the right mode when the producer is trusted.
  */
class JsonSourceSpec extends SparkSpec {

  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  test("jsonl roundtrip: write then schema'd read is lossless") {
    val dir = Files.createTempDirectory("graft-jsonl").toString + "/docs"
    val src = spark.read.parquet(s"${SparkSpec.sf0001}/documents.parquet")
      .select("doc_id", "text", "lang")
    src.write.mode("overwrite").json(dir)
    val back = spark.read.schema(schema).json(dir)
    assert(back.count() == src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("PERMISSIVE quarantines malformed lines in a corrupt-record column") {
    val dir = Files.createTempDirectory("graft-jsonl-bad").toString
    Files.writeString(java.nio.file.Paths.get(dir, "part-0.json"),
      """{"doc_id": 1, "text": "ok", "lang": "en"}
        |{"doc_id": 2, "text": "also ok"
        |{"doc_id": 3, "text": "fine", "lang": "fr"}
        |""".stripMargin)
    val withCorrupt = StructType(schema.fields :+
      StructField("_bad", StringType))
    val rows = spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_bad")
      .json(dir)
      .cache()
    assert(rows.count() == 3)
    assert(rows.filter(col("_bad").isNotNull).select("_bad")
      .as[String].collect().toSeq == Seq("{\"doc_id\": 2, \"text\": \"also ok\""))
    assert(rows.filter(col("_bad").isNull).select("doc_id")
      .as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    rows.unpersist()
  }

  test("FAILFAST raises on the malformed line") {
    val dir = Files.createTempDirectory("graft-jsonl-ff").toString
    Files.writeString(java.nio.file.Paths.get(dir, "part-0.json"),
      "{\"doc_id\": 1}\nnot json at all\n")
    val ex = intercept[Exception] {
      spark.read.schema(schema).option("mode", "FAILFAST").json(dir).collect()
    }
    assert(ex.getMessage != null)
  }
}
