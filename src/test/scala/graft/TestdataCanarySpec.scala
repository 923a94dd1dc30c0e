package graft

/** Testdata schema-drift canary.
  *
  * The driver regenerates `/root/testdata` between rounds and has
  * already changed a column's physical type in place once (round 5:
  * `events.ts` went from INT64-nanos to naive-micros TIMESTAMP_NTZ,
  * silently breaking 47 queries and 19 tests until diagnosed). This
  * suite pins the EXPECTED logical type of every column of every
  * table at sf0.001 and fails with a message naming the drifted
  * column — so the next upstream change costs one readable test
  * failure instead of a round.
  *
  * `events.ts` is allowed either historical encoding (probed the same
  * way `EventsStream.readEvents` dispatches); everything else is
  * exact.
  */
class TestdataCanarySpec extends SparkSpec {

  private val expected: Map[String, Map[String, String]] = Map(
    "region" -> Map(
      "r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Map(
      "n_nationkey" -> "int", "n_name" -> "string", "n_regionkey" -> "int"),
    "customer" -> Map(
      "c_custkey" -> "bigint", "c_name" -> "string", "c_nationkey" -> "int",
      "c_acctbal" -> "double", "c_mktsegment" -> "string"),
    "supplier" -> Map(
      "s_suppkey" -> "bigint", "s_name" -> "string", "s_nationkey" -> "int",
      "s_acctbal" -> "double"),
    "part" -> Map(
      "p_partkey" -> "bigint", "p_name" -> "string", "p_brand" -> "string",
      "p_type" -> "string", "p_size" -> "int", "p_retailprice" -> "double"),
    "orders" -> Map(
      "o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp_ntz|timestamp",
      "o_orderpriority" -> "string"),
    "lineitem" -> Map(
      "l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp_ntz|timestamp"),
    "events" -> Map(
      "event_id" -> "bigint",
      // both driver-shipped encodings are legal; readEvents dispatches
      "ts" -> "bigint|timestamp_ntz|timestamp",
      "user_id" -> "bigint", "event_type" -> "string",
      "value" -> "double", "props" -> "string"),
    "documents" -> Map(
      "doc_id" -> "bigint", "text" -> "string", "lang" -> "string",
      "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Map(
      "vec_id" -> "bigint", "embedding" -> "array<float>", "label" -> "int")
  )

  test("testdata canary: every table's column types match the pinned contract") {
    // probe with nanos-as-long on a session clone so a legacy
    // INT64-nanos events file reads (as bigint) instead of throwing
    val probe = spark.newSession()
    probe.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val drift = scala.collection.mutable.ArrayBuffer.empty[String]
    expected.foreach { case (table, cols) =>
      val path = s"${SparkSpec.sf0001}/$table.parquet"
      if (!new java.io.File(path).exists()) {
        drift += s"$table: file missing at $path"
      } else {
        val actual = probe.read.parquet(path).schema
          .map(f => f.name -> f.dataType.simpleString).toMap
        cols.foreach { case (name, allowed) =>
          actual.get(name) match {
            case None =>
              drift += s"$table.$name: column MISSING (have: ${actual.keys.toSeq.sorted.mkString(", ")})"
            case Some(t) if !allowed.split('|').contains(t) =>
              drift += s"$table.$name: type drifted to `$t` (expected one of: $allowed)"
            case _ => ()
          }
        }
        (actual.keySet -- cols.keySet).toSeq.sorted.foreach { extra =>
          drift += s"$table.$extra: NEW column `${actual(extra)}` not in the pinned contract"
        }
      }
    }
    assert(drift.isEmpty,
      s"\nTESTDATA SCHEMA DRIFT — the driver regenerated testdata with a " +
        s"new schema; update the affected readers AND this contract:\n  " +
        drift.mkString("\n  "))
  }
}
