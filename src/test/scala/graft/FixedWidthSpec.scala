package graft

import graft.qcew.{FixedWidth, Layout, NaicsAgg}
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets
import java.nio.file.Files

class FixedWidthSpec extends SparkSpec {
  import spark.implicits._

  test("layout is contiguous and 1060 wide with 121 fields") {
    assert(Layout.fields.size == 121)
    assert(Layout.recordWidth == 1060)
    val sorted = Layout.fields.sortBy(_._2)
    sorted.sliding(2).foreach {
      case Seq((_, p1, l1), (_, p2, _)) => assert(p1 + l1 == p2)
      case _ =>
    }
  }

  test("parse slices, trims and casts; non-numeric junk becomes null") {
    val lines = Seq(
      QcewFixtures.record(2023, 1, "541511", "10", "12", "14", "123456"),
      QcewFixtures.record(2023, 1, "541511", "junk", "x", "", "oops"),
      QcewFixtures.record(2200, 4, "111419", "5", "5", "5", "999") // dirty year survives
    )
    val df = FixedWidth.parse(lines.toDF("value"))
    assert(df.columns.length == 121)
    val rows = df.select("year", "qtr", "naics_code",
      "first_month_employment", "total_wages", "latitude").collect()
    assert(rows(0).getLong(0) == 2023L)
    assert(rows(0).getString(2) == "541511")
    assert(rows(0).getLong(3) == 10L)
    assert(rows(0).getLong(4) == 123456L)
    assert(math.abs(rows(0).getDouble(5) - 18.22083) < 1e-9)
    assert(rows(1).isNullAt(3) && rows(1).isNullAt(4)) // junk -> null, no throw
    assert(rows(2).getLong(0) == 2200L)                // dirty year retained
  }

  test("latin-1 bytes before position-sensitive fields keep alignment") {
    // ñ (0xF1) inside leg_corp_name (pos 63) must not shift naics_code (pos 591)
    val l = QcewFixtures.record(2023, 2, "722511", "3", "3", "3", "777",
      name = "PANADERÍA LA ÑAPA")
    val tmp = Files.createTempDirectory("fw")
    Files.write(tmp.resolve("a.txt"), (l + "\n").getBytes(StandardCharsets.ISO_8859_1))
    val df = FixedWidth.parse(FixedWidth.readRaw(spark, tmp.toString))
    val r = df.select("leg_corp_name", "naics_code", "total_wages").head()
    assert(r.getString(0) == "PANADERÍA LA ÑAPA")
    assert(r.getString(1) == "722511")
    assert(r.getLong(2) == 777L)
  }

  test("flagship aggregate: suppression keeps >4 groups, drops <=4, blank naics filtered") {
    val big = (1 to 6).map(i =>
      QcewFixtures.record(2023, 1, "541511", "10", "12", "14", "1000"))
    val small = (1 to 3).map(i =>
      QcewFixtures.record(2023, 1, "111419", "2", "2", "2", "500"))
    val blank = Seq(QcewFixtures.record(2023, 1, "", "1", "1", "1", "100"))
    val df = FixedWidth.parse((big ++ small ++ blank).toDF("value"))
    val agg = NaicsAgg.aggregate(df).collect()
    assert(agg.length == 1)
    val r = agg(0)
    assert(r.getAs[String]("naics4") == "5415")
    assert(r.getAs[Long]("total_wages") == 6000L)
    assert(math.abs(r.getAs[Double]("total_employment") - 12.0) < 1e-9)
    assert(r.getAs[Long]("dummy") == 6L)
    assert(math.abs(r.getAs[Double]("fondo_contributions") - 6000 * 0.014) < 1e-9)
    assert(math.abs(r.getAs[Double]("medicare_contributions") - 6000 * 0.0145) < 1e-9)
    assert(math.abs(r.getAs[Double]("ssn_contributions") - 6000 * 0.062) < 1e-9)
  }

  test("empty input yields empty output, no throw") {
    val df = FixedWidth.parse(Seq.empty[String].toDF("value"))
    assert(df.isEmpty)
    assert(NaicsAgg.aggregate(df).isEmpty)
  }
}
