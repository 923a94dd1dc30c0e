package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.qcew.Wages
import graft.sources.Xlsx

/** Tests the zero-dependency XLSX source against a workbook built
  * by hand (zip of OOXML parts), covering shared strings (plain and
  * rich-text), inline strings, raw numbers, interior cell gaps, and
  * multi-sheet selection — then the Wages dim flow end-to-end.
  */
class XlsxSpec extends SparkSpec {

  private val sharedStrings =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="4" uniqueCount="4">
      |<si><t>naics_code</t></si>
      |<si><t>naics_desc</t></si>
      |<si><r><t>Computer </t></r><r><t>Systems</t></r></si>
      |<si><t>naics_data</t></si>
      |</sst>""".stripMargin

  private val sheet1 =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
      |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="inlineStr"><is><t>note</t></is></c></row>
      |<row r="2"><c r="A2"><v>5415</v></c><c r="B2" t="s"><v>2</v></c></row>
      |<row r="3"><c r="A3"><v>1114</v></c><c r="B3" t="inlineStr"><is><t>Greenhouse</t></is></c><c r="C3"><v>7</v></c></row>
      |<row r="4"><c r="A4"><v>9999</v></c><c r="B4" s="1"/><c r="C4"><v>8</v></c></row>
      |</sheetData></worksheet>""".stripMargin

  private val sheet2 =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
      |<row r="1"><c r="A1" t="s"><v>3</v></c></row>
      |<row r="2"><c r="A2"><v>1114</v></c></row>
      |</sheetData></worksheet>""".stripMargin

  private lazy val xlsxPath: String = {
    val p = Files.createTempFile("naics_codes", ".xlsx")
    val zip = new ZipOutputStream(Files.newOutputStream(p))
    def put(name: String, content: String): Unit = {
      zip.putNextEntry(new ZipEntry(name))
      zip.write(content.getBytes(StandardCharsets.UTF_8))
      zip.closeEntry()
    }
    put("xl/sharedStrings.xml", sharedStrings)
    put("xl/worksheets/sheet1.xml", sheet1)
    put("xl/worksheets/sheet2.xml", sheet2)
    zip.close()
    p.toString
  }

  test("xlsx: cell types, rich text, gaps, header schema") {
    val df = Xlsx.read(spark, xlsxPath, sheetId = 1)
    assert(df.columns.toSeq == Seq("naics_code", "naics_desc", "note"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows(0) == (("5415", "Computer Systems", null)))  // shared + rich text
    assert(rows(1) == (("1114", "Greenhouse", "7")))         // inline string + number
    assert(rows(2) == (("9999", null, "8")))                 // styled blank -> null
  }

  test("xlsx: second sheet addressable; missing sheet fails loudly") {
    val df = Xlsx.read(spark, xlsxPath, sheetId = 2)
    assert(df.columns.toSeq == Seq("naics_data"))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("1114"))
    intercept[IllegalArgumentException](Xlsx.read(spark, xlsxPath, sheetId = 3))
  }

  test("xlsx: column ref arithmetic (A, Z, AA, AB2)") {
    assert(Xlsx.colOf("A1").contains(0))
    assert(Xlsx.colOf("Z9").contains(25))
    assert(Xlsx.colOf("AA1").contains(26))
    assert(Xlsx.colOf("AB2").contains(27))
    assert(Xlsx.colOf("").isEmpty)
  }

  test("xlsx: Wages dim flow end-to-end (sheet 1 dim, sheet 2 invalid)") {
    import spark.implicits._
    val wages = Seq(("541511", 100.0), ("111419", 50.0), ("999901", 7.0))
      .toDF("naics_code", "total_wages")
    val enriched = Wages.enrich(wages,
      Wages.readNaicsDimXlsx(spark, xlsxPath),
      Wages.readInvalidCodesXlsx(spark, xlsxPath))
    val rows = enriched.select("naics_4digit", "naics_desc").collect()
      .map(r => (r.getString(0), Option(r.getString(1)))).toSet
    // 1114 excluded by sheet-2 anti-join; 5415 labeled; 9999 unmatched
    assert(rows == Set(("5415", Some("Computer Systems")), ("9999", None)))
  }
}
