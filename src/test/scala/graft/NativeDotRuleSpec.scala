package graft

import graft.ext.Similarity
import graft.plans.{GraftExtensions, NativeDotRule}
import org.apache.spark.sql.functions._

/** The HOF→kernel rewrite must fire only where it is bit-safe, and the
  * rewritten plan must produce exactly the interpreted HOF's results.
  */
class NativeDotRuleSpec extends SparkSpec {
  import spark.implicits._

  // typed Array[Float] encoders give array<float> with containsNull=false
  // — the shape the rule requires
  // repartition keeps the projection a real executed plan —
  // ConvertToLocalRelation would otherwise evaluate the expression at
  // optimization time and leave nothing to rewrite
  private lazy val vecs = Seq(
    (1, Array(1.0f, 2.0f, 3.0f), Array(0.5f, -1.5f, 2.0f)),
    (2, Array(0.1f, 0.2f, 0.3f), Array(1.0f, 0.0f, -1.0f)),
    (3, Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f)) // length mismatch -> null
  ).toDF("id", "a", "b").repartition(2)

  private def withRule[T](body: => T): T = {
    spark.experimental.extraOptimizations = Seq(NativeDotRule)
    try body finally { spark.experimental.extraOptimizations = Nil }
  }

  test("HOF dot rewrites to the native kernel; results bit-equal incl. null") {
    def run(df: org.apache.spark.sql.DataFrame): Map[Int, Option[Double]] =
      df.select($"id", Similarity.dot($"a", $"b").as("d")).collect()
        .map(r => r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
        .toMap
    val interpreted = run(vecs)
    withRule {
      val q2 = vecs.select($"id", Similarity.dot($"a", $"b").as("d"))
      assert(q2.queryExecution.executedPlan.toString.contains("dot_f32"),
        "rule did not rewrite the HOF dot")
      val native = run(vecs)
      assert(native == interpreted)
      assert(native(3).isEmpty, "length mismatch must stay null")
    }
  }

  test("nullable-element arrays are NOT rewritten (semantics guard)") {
    // transform with a when() makes elements nullable -> containsNull=true
    val nullable = vecs.select(
      transform($"a", x => when(x > 0.0f, x)).as("a2"), $"b")
    withRule {
      val q = nullable.select(Similarity.dot($"a2", $"b").as("d"))
      assert(!q.queryExecution.executedPlan.toString.contains("dot_f32"),
        "rule must not fire on nullable elements")
    }
  }

  test("extensions entry point registers without error") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // smoke: injectOptimizerRule accepted
  }

  test("dot_f32 is callable from SQL strings in an extensions session") {
    val s = org.apache.spark.sql.graft.ColumnBridge
      .sessionWithExtensions(spark, new GraftExtensions().apply)
    val r = s.sql(
      """SELECT dot_f32(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |               array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d""".stripMargin)
      .collect().head.getDouble(0)
    assert(r == 11.0)
    // arity is rejected at registration, not at runtime
    intercept[Exception] {
      s.sql("SELECT dot_f32(array(CAST(1.0 AS FLOAT)))").collect()
    }
    // the base session (no extensions) must NOT see the function —
    // injection is session-scoped, not a global registry mutation
    intercept[Exception] {
      spark.sql("SELECT dot_f32(array(CAST(1.0 AS FLOAT)), array(CAST(1.0 AS FLOAT)))").collect()
    }
  }
}
