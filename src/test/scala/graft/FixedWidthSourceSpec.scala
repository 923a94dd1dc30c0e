package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.qcew.Layout

/** DataSource V2 fixed-width source (graft-fixedwidth): splittable
  * offset-math scan + column pruning that reaches the byte decode.
  */
class FixedWidthSourceSpec extends SparkSpec {
  import spark.implicits._

  private def writeLatin1(dir: Path, name: String, s: String): Unit =
    Files.write(dir.resolve(name), s.getBytes("ISO-8859-1"))

  private val layout3 = "a:1:4,b:5:6,num:11:5"
  private val recLen = 15

  private def read(path: String, extra: Map[String, String] = Map.empty) = {
    val base = spark.read.format("graft-fixedwidth")
      .option("layout", layout3).option("recordLength", recLen)
    extra.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }.load(path)
  }

  test("reads records, trims fields, resolves by short name") {
    val dir = Files.createTempDirectory("fw-src")
    writeLatin1(dir, "a.fw", "ab  cdcdcd  123\nzz  yyyyyy 45  \n")
    val rows = read(dir.toString).orderBy("a").collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("ab", "zz"))
    assert(rows.map(_.getString(2)).toSeq === Seq("123", "45"))
  }

  test("last record without trailing separator is read; bad length fails loudly") {
    val dir = Files.createTempDirectory("fw-nosep")
    writeLatin1(dir, "a.fw", "ab  cdcdcd  123\nzz  yyyyyy 45  ") // no final \n
    assert(read(dir.toString).count() === 2)
    val bad = Files.createTempDirectory("fw-bad")
    writeLatin1(bad, "a.fw", "short\n")
    val e = intercept[Exception](read(bad.toString).count())
    assert(e.getMessage != null)
  }

  test("latin-1 bytes decode at exact positions") {
    val dir = Files.createTempDirectory("fw-latin")
    // ñ (0xF1) inside field b; single-byte charset keeps num aligned
    writeLatin1(dir, "a.fw", "ab  cñdcdñ  123\n")
    val r = read(dir.toString).collect().head
    assert(r.getString(1) === "cñdcdñ")
    assert(r.getString(2) === "123")
  }

  test("splits are record-aligned: tiny maxSplitBytes yields many partitions, same rows") {
    val dir = Files.createTempDirectory("fw-split")
    val lines = (0 until 97).map(i => f"r$i%03d${"x" * 6}$i%5d").mkString("", "\n", "\n")
    writeLatin1(dir, "a.fw", lines)
    val whole = read(dir.toString).as[(String, String, String)].collect().toSet
    val split = read(dir.toString, Map("maxSplitBytes" -> "64"))
    assert(split.rdd.getNumPartitions > 10)
    assert(split.as[(String, String, String)].collect().toSet === whole)
    assert(whole.size === 97)
  }

  test("column pruning reaches the scan's read schema") {
    val dir = Files.createTempDirectory("fw-prune")
    writeLatin1(dir, "a.fw", "ab  cdcdcd  123\n")
    val df = read(dir.toString).select("num")
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b
    }.getOrElse(fail("no BatchScanExec in plan"))
    assert(scan.scan.readSchema().fieldNames.toSeq === Seq("num"))
    assert(df.collect().map(_.getString(0)).toSeq === Seq("123"))
  }

  test("statistics report exact row count and pruned size") {
    val dir = Files.createTempDirectory("fw-stats")
    writeLatin1(dir, "a.fw", "ab  cdcdcd  123\nzz  yyyyyy 45  \n")
    val scan = read(dir.toString).select("a").queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan
    }.get.asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
    val st = scan.estimateStatistics()
    assert(st.numRows().getAsLong === 2L)
    assert(st.sizeInBytes().getAsLong === 2L * 4) // field a only
  }

  test("QCEW layout via Layout.spec round-trips a fixture record") {
    val dir = Files.createTempDirectory("fw-qcew")
    val rec = QcewFixtures.record(2024, 1, "541511", "10", "11", "12", "500000")
    writeLatin1(dir, "q.fw", rec + "\n")
    val df = spark.read.format("graft-fixedwidth")
      .option("layout", Layout.spec)
      .option("recordLength", Layout.recordWidth)
      .load(dir.toString)
      .select("year", "qtr", "naics_code", "total_wages")
    val r = df.collect().head
    assert(r.getString(0) === "2024" && r.getString(1) === "1")
    assert(r.getString(2) === "541511" && r.getString(3) === "500000")
  }

  test("parity with the csv-reader path on the QCEW flagship parse") {
    val dir = Files.createTempDirectory("fw-parity")
    val recs = (0 until 25).map(i =>
      QcewFixtures.record(2020 + i % 3, 1 + i % 4, f"54151$i%01d",
        (10 + i).toString, (11 + i).toString, (12 + i).toString,
        (100000 + 7 * i).toString))
    writeLatin1(dir, "q.fw", recs.mkString("", "\n", "\n"))
    val viaDsv2 = graft.qcew.FixedWidth.cast(
      spark.read.format("graft-fixedwidth")
        .option("layout", Layout.spec)
        .option("recordLength", Layout.recordWidth)
        .load(dir.toString))
    val viaCsv = graft.qcew.FixedWidth.parse(
      graft.qcew.FixedWidth.readRaw(spark, dir.toString))
    assert(viaDsv2.schema === viaCsv.schema)
    val key = Seq("year", "qtr", "naics_code", "total_wages", "first_month_employment")
    assert(viaDsv2.select(key.map(col): _*).collect().toSet ===
      viaCsv.select(key.map(col): _*).collect().toSet)
  }
}
