package graft.sources

import java.io.InputStream
import java.util.zip.ZipInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import scala.collection.mutable

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Minimal zero-dependency XLSX source (SURVEY S7; reference
  * `data_process.py:194-198` reads `naics_codes.xlsx` sheets 1 and 2).
  *
  * An .xlsx is a zip of XML parts; this reads `xl/sharedStrings.xml`
  * and `xl/worksheets/sheet{id}.xml` with the JDK's zip + StAX — no
  * third-party dependency, which the offline build cannot resolve.
  *
  * Scope (deliberate): the reference's Excel inputs are tiny dimension
  * sheets (NAICS descriptions, invalid-code picklist), so parsing is
  * DRIVER-side through the Hadoop FileSystem (works on HDFS/S3 too) and
  * the result is a small local DataFrame — the broadcast side of every
  * join it participates in. Row 1 is the header; every cell surfaces as
  * a string (callers cast); missing cells are null. Supported cell
  * types: shared strings (t="s"), inline strings (t="inlineStr"),
  * formula strings (t="str"), booleans (t="b"), and raw numbers.
  */
object Xlsx {

  def read(spark: SparkSession, path: String, sheetId: Int = 1): DataFrame = {
    val rows = readRows(spark, path, sheetId)
    require(rows.nonEmpty, s"xlsx sheet $sheetId of $path is empty")
    val header = rows.head.map(h => Option(h).getOrElse("").trim)
    val width = header.length
    val schema = StructType(header.map(StructField(_, StringType, nullable = true)))
    val data = rows.tail.map { r =>
      Row.fromSeq(r.padTo(width, null).take(width).toSeq)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data.toSeq, 1), schema)
  }

  /** Raw cell grid of one sheet: one Array[String] per row (ragged;
    * absent trailing cells are simply not present, interior gaps are
    * null).
    */
  def readRows(spark: SparkSession, path: String,
               sheetId: Int): Vector[Array[String]] = {
    val shared = collectEntry(spark, path, "xl/sharedStrings.xml")
      .map(parseSharedStrings).getOrElse(Vector.empty)
    collectEntry(spark, path, s"xl/worksheets/sheet$sheetId.xml") match {
      case Some(bytes) => parseSheet(bytes, shared)
      case None => throw new IllegalArgumentException(
        s"$path has no sheet$sheetId (xl/worksheets/sheet$sheetId.xml missing)")
    }
  }

  /** Pull one zip entry's bytes via the Hadoop FileSystem. */
  private def collectEntry(spark: SparkSession, path: String,
                           entry: String): Option[Array[Byte]] = {
    val p = new HPath(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(p)
    try {
      val zin = new ZipInputStream(in)
      Iterator.continually(zin.getNextEntry)
        .takeWhile(_ != null)
        .collectFirst { case e if e.getName == entry => zin.readAllBytes() }
    } finally in.close()
  }

  /** sharedStrings.xml: each <si> is one string — concatenate its <t>
    * runs (plain and rich-text cells alike).
    */
  private def parseSharedStrings(bytes: Array[Byte]): Vector[String] = {
    val out = Vector.newBuilder[String]
    val sb = new StringBuilder
    var inT = false
    foreachEvent(bytes) { r =>
      r.getEventType match {
        case XMLStreamConstants.START_ELEMENT =>
          if (r.getLocalName == "si") sb.clear()
          if (r.getLocalName == "t") inT = true
        case XMLStreamConstants.CHARACTERS if inT =>
          sb.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          if (r.getLocalName == "t") inT = false
          if (r.getLocalName == "si") out += sb.toString
        case _ =>
      }
    }
    out.result()
  }

  /** One worksheet: <row><c r="B3" t="s"><v>idx</v></c>…</row>. */
  private def parseSheet(bytes: Array[Byte],
                         shared: Vector[String]): Vector[Array[String]] = {
    val rows = Vector.newBuilder[Array[String]]
    val cells = mutable.ArrayBuffer.empty[String]
    var colIdx = -1
    var cellType = ""
    var inV = false
    var inIs = false
    var sawValue = false
    val sb = new StringBuilder
    def put(idx: Int, value: String): Unit = {
      while (cells.length <= idx) cells += null
      cells(idx) = value
    }
    def flushCell(): Unit = {
      if (colIdx >= 0) {
        val raw = sb.toString
        val v =
          if (!sawValue) null // styled blank (<c s="1"/>): no value part
          else cellType match {
            case "s" => shared.lift(raw.trim.toInt).orNull
            case _ => raw
          }
        put(colIdx, v)
      }
      colIdx = -1; cellType = ""; sawValue = false; sb.clear()
    }
    foreachEvent(bytes) { r =>
      r.getEventType match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "row" => cells.clear()
          case "c" =>
            colIdx = colOf(Option(r.getAttributeValue(null, "r")).getOrElse(""))
              .getOrElse(cells.length)
            cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
            sb.clear()
          case "is" => inIs = true
          case "v" => inV = true; sawValue = true
          case "t" if inIs => inV = true; sawValue = true
          case _ =>
        }
        case XMLStreamConstants.CHARACTERS if inV =>
          sb.append(r.getText)
        case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
          case "v" => inV = false
          case "t" if inIs => inV = false
          case "is" => inIs = false
          case "c" => flushCell()
          case "row" => rows += cells.toArray
          case _ =>
        }
        case _ =>
      }
    }
    rows.result()
  }

  /** "B3" → 0-based column index 1; None for missing refs. */
  private[graft] def colOf(ref: String): Option[Int] = {
    val letters = ref.takeWhile(_.isLetter).toUpperCase
    if (letters.isEmpty) None
    else Some(letters.foldLeft(0)((a, ch) => a * 26 + (ch - 'A' + 1)) - 1)
  }

  private def foreachEvent(bytes: Array[Byte])(
      f: javax.xml.stream.XMLStreamReader => Unit): Unit = {
    val factory = XMLInputFactory.newInstance()
    factory.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    factory.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    val reader = factory.createXMLStreamReader(
      new java.io.ByteArrayInputStream(bytes))
    try while (reader.hasNext) { reader.next(); f(reader) }
    finally reader.close()
  }
}
