package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression bridge for graft's native expressions
  * (e.g. [[graft.functions.DotFloat]]).
  *
  * Spark 4 hides the classic converters behind `private[sql]`, so this
  * object lives in an `org.apache.spark.sql` subpackage to reach them —
  * the established pattern for libraries shipping custom catalyst
  * expressions without forcing users to install SparkSessionExtensions
  * on every session. This is the ONLY file outside the `graft` package.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The persisted RDD backing a `localCheckpoint`ed DataFrame, if any.
    *
    * `Dataset.localCheckpoint` truncates lineage by swapping the plan
    * for a [[org.apache.spark.sql.execution.LogicalRDD]] over an
    * internally-persisted RDD — but exposes no handle to release those
    * blocks, so iterative algorithms that snapshot each round
    * (connected components, BFS, k-core) would otherwise hold every
    * superseded round's storage until the driver GC happens to collect
    * the RDD reference. This accessor lets [[graft.ext.Graph]] release
    * a superseded snapshot deterministically.
    */
  def checkpointedRdd(df: org.apache.spark.sql.DataFrame)
      : Option[org.apache.spark.rdd.RDD[_]] =
    // Root-node-only match: `localCheckpoint` returns a frame whose
    // analyzed plan IS a LogicalRDD (the checkpoint scan). Matching
    // deeper would find LogicalRDDs that merely feed a derived frame —
    // checkpointed inputs composed under projections/joins, or a
    // user-created RDD-backed frame — and unpersisting those could
    // yank storage still backing other live frames. Derived frames are
    // therefore NOT releasable through this; release the original
    // snapshot handle instead.
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => Some(l.rdd)
      case _ => None
    }

  /** A sibling session on the same SparkContext/SharedState with the
    * given [[org.apache.spark.sql.SparkSessionExtensions]] applied.
    *
    * The supported production path is
    * `spark.sql.extensions=graft.plans.GraftExtensions` at application
    * start; extensions are fixed per session at construction, so an
    * already-running application (or a test harness sharing one
    * session) cannot retrofit them through the public builder. This
    * constructor-level door — accessible because the classic session
    * constructor is `private[sql]` — is for embedding and tests.
    */
  def sessionWithExtensions(
      spark: org.apache.spark.sql.SparkSession,
      configure: org.apache.spark.sql.SparkSessionExtensions => Unit)
      : org.apache.spark.sql.SparkSession = {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    configure(ext)
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    // the full constructor is Scala-private to the classic package
    // (bytecode-public): reached reflectively, and only here
    val ctor = classOf[org.apache.spark.sql.classic.SparkSession].getConstructor(
      classOf[org.apache.spark.SparkContext], classOf[Option[_]], classOf[Option[_]],
      classOf[org.apache.spark.sql.SparkSessionExtensions],
      classOf[scala.collection.immutable.Map[_, _]],
      classOf[scala.collection.immutable.Map[_, _]])
    ctor.newInstance(classic.sparkContext, Some(classic.sharedState), None, ext,
      Map.empty[String, String], Map.empty[String, String])
  }
}
