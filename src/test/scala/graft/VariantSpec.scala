package graft

import org.apache.spark.sql.functions._

import graft.ext.EventsStream

/** The VARIANT ingestion invariants that q_variant_extract's oracle
  * cannot gate: DuckDB has no VARIANT, and an engine-RENDERED schema
  * string is not a stable cross-version oracle value — so the rendered
  * shape is pinned here instead, against this Spark version.
  */
class VariantSpec extends SparkSpec {

  test("parse_json(props) sees the uniform OBJECT<k: BIGINT> shape on every event") {
    val schemas = EventsStream
      .readEvents(spark, s"${SparkSpec.sf0001}/events.parquet")
      .select(expr("schema_of_variant(parse_json(props))").as("vschema"))
      .distinct()
      .collect()
      .map(_.getString(0))
    assert(schemas.toSeq == Seq("OBJECT<k: BIGINT>"),
      s"props payload schema drifted: ${schemas.mkString(", ")}")
  }

  test("variant_get typed-path extraction matches raw-JSON extraction") {
    import spark.implicits._
    val ev = EventsStream.readEvents(spark, s"${SparkSpec.sf0001}/events.parquet")
    val mismatches = ev
      .select(
        expr("variant_get(parse_json(props), '$.k', 'long')").as("via_variant"),
        get_json_object(col("props"), "$.k").cast("long").as("via_json"))
      .filter(!(col("via_variant") <=> col("via_json")))
      .count()
    assert(mismatches == 0L)
  }
}
