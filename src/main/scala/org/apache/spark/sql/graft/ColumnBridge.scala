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
}
