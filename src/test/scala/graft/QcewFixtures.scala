package graft

import graft.qcew.Layout

/** Synthesizes QCEW fixed-width raw lines per FIXTURES.md §1:
  * one record = one 1060-char latin-1 line, fields space-padded to
  * their exact (position, length) slots.
  */
object QcewFixtures {

  private val layout: Map[String, (Int, Int)] =
    Layout.fields.map { case (n, p, l) => n -> (p, l) }.toMap

  /** Build one record line from a (field -> value) map; unspecified
    * fields are blank. Values are left-aligned and space-padded/truncated
    * to the field width.
    */
  def line(values: Map[String, String]): String = {
    val buf = Array.fill(Layout.recordWidth)(' ')
    values.foreach { case (name, v) =>
      val (pos, len) = layout(name)
      val s = v.take(len)
      s.copyToArray(buf, pos - 1)
    }
    new String(buf)
  }

  /** A plausible establishment record. */
  def record(year: Int, qtr: Int, naics: String, m1: String, m2: String,
             m3: String, wages: String, name: String = "ACME CORP"): String =
    line(Map(
      "trans_code" -> "A",
      "state_fips" -> "72",
      "year" -> year.toString,
      "qtr" -> qtr.toString,
      "leg_corp_name" -> name,
      "naics_code" -> naics,
      "first_month_employment" -> m1,
      "second_month_employment" -> m2,
      "third_month_employment" -> m3,
      "total_wages" -> wages,
      "taxable_wages" -> wages,
      "latitude" -> "18.22083",
      "longitude" -> "-66.59015"
    ))
}
