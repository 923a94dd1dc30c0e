package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the float-vector dot product — the
  * per-PAIR kernel of every similarity operator.
  *
  * Why an Expression and not Column algebra: at dim=64 the alternatives
  * both lose. The `aggregate(zip_with(...))` higher-order form
  * evaluates interpreted (no codegen), and a statically unrolled
  * 64-term `element_at` sum generates a method so large that HotSpot's
  * JIT bails out, leaving it running in the bytecode interpreter
  * (measured: unrolled is ~2x SLOWER than the HOF form at dim 64).
  * `doGenCode` here emits a tight primitive loop instead — a small,
  * JIT- and SIMD-friendly method, ~10x the HOF form on pair joins.
  *
  * Accumulation is strictly left-to-right in double, identical to the
  * HOF form (bit-equality unit-asserted), so cross-engine oracle parity
  * is unaffected.
  *
  * Assumes non-null array ELEMENTS (embedding vectors); a null element
  * contributes its slot's raw bytes, as `getFloat` does not null-check
  * — callers with nullable elements must pre-clean.
  */
case class DotFloat(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, array<float>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_f32"

  // mismatched lengths -> null, matching the HOF form (zip_with pads
  // the shorter array with nulls, which nulls the aggregate) — a
  // truncated partial dot would be a plausible-looking WRONG similarity
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var s = 0.0
      var i = 0
      while (i < n) {
        s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotFloat =
    copy(left = newLeft, right = newRight)
}

/** Native dot of a float vector with a CONSTANT double plane — the
  * per-row kernel of hyperplane-LSH bucketing ([[graft.ext.Similarity
  * .hyperplaneBucket]]).
  *
  * Why: the Column-algebra form (64 `element_at(...).cast * lit` terms
  * per plane, 4+ planes) builds an expression tree big enough that
  * codegen degrades and evaluation runs effectively interpreted —
  * measured ~200 µs/row at dim 64 × 4 planes, which taxes EVERY ANN
  * query (bucket assignment touches the whole corpus). This loop is
  * the same arithmetic — `(double) vec[i] * plane[i]`, accumulated
  * strictly left-to-right in double — so results are bit-identical to
  * the spec form (unit-asserted) and DuckDB oracle parity is
  * unaffected.
  *
  * Null semantics match the `element_at` spec form with ANSI off: a
  * vector SHORTER than the plane yields null (element_at past the end
  * is null, nulling the sum); extra trailing elements are ignored.
  * Elements themselves are not null-checked (embedding vectors),
  * exactly like [[DotFloat]].
  */
case class PlaneDot(child: Expression, plane: Seq[Double])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>, got $t")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "plane_dot"

  private val planeArr: Array[Double] = plane.toArray

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() < planeArr.length) null
    else {
      var s = 0.0
      var i = 0
      while (i < planeArr.length) {
        s += x.getFloat(i).toDouble * planeArr(i)
        i += 1
      }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planeRef = ctx.addReferenceObj("plane", planeArr, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |if ($a.numElements() < $planeRef.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $planeRef.length; $i++) {
         |    $s += (double) $a.getFloat($i) * $planeRef[$i];
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PlaneDot =
    copy(child = newChild)
}
