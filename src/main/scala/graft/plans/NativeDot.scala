package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Cast,
  Expression, LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.DotFloat

/** Optimizer rule: rewrite the portable higher-order-function dot
  * product — `aggregate(zip_with(a, b, (x, y) => double(x) * double(y)),
  * 0.0d, (acc, v) => acc + v)`, the declarative form
  * [[graft.ext.Similarity.dot]] emits — into the native codegen kernel
  * [[graft.functions.DotFloat]].
  *
  * Why a Rule and not "just call dotNative": users (and the library's
  * own spec-form code) write the engine-portable HOF expression; HOFs
  * evaluate interpreted, ~10x slower on pair joins. The rule keeps the
  * API declarative and moves the kernel choice into the engine — the
  * Catalyst analogue of an expression-level strategy pick.
  *
  * The match is deliberately conservative — it requires:
  *   - both zip inputs are `array<float>` with NON-nullable elements
  *     (a null element makes the HOF form return null; the kernel reads
  *     raw slots — rewriting would change semantics),
  *   - the lambda is exactly `double(x) * double(y)` over the two zip
  *     variables, the zero is bit-exact +0.0, the merge is `acc + v` in
  *     that order, and the finish is the identity.
  * Anything else is left untouched. On a match the kernel is bit-equal
  * to the HOF form (strict left-to-right double accumulation,
  * unit-asserted), including null-on-length-mismatch.
  *
  * Activate per session via `spark.experimental.extraOptimizations` or
  * globally with `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
object NativeDotRule extends Rule[LogicalPlan] {

  private def isFloatArrayNoNullElems(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, containsNull) => !containsNull
    case _ => false
  }

  private def isCastToDoubleOf(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case c: Cast if c.dataType == DoubleType =>
      c.child match {
        case x: NamedLambdaVariable => x.exprId == v.exprId
        case _ => false
      }
    case _ => false
  }

  private def rewritable(agg: ArrayAggregate): Boolean = agg.argument match {
    case zw: ZipWith
        if isFloatArrayNoNullElems(zw.left) && isFloatArrayNoNullElems(zw.right) =>
      val mulOk = zw.function match {
        case LambdaFunction(m: Multiply,
            Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
          isCastToDoubleOf(m.left, x) && isCastToDoubleOf(m.right, y)
        case _ => false
      }
      val zeroOk = agg.zero match {
        // bit-exact +0.0 only: a -0.0 seed can flip the sign of an
        // all-negative-zero sum, which the kernel (seeded +0.0) would not
        case Literal(v: Double, DoubleType) =>
          java.lang.Double.doubleToLongBits(v) == 0L
        case _ => false
      }
      val mergeOk = agg.merge match {
        case LambdaFunction(a: Add,
            Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _) =>
          (a.left, a.right) match {
            case (l: NamedLambdaVariable, r: NamedLambdaVariable) =>
              l.exprId == acc.exprId && r.exprId == v.exprId
            case _ => false
          }
        case _ => false
      }
      val finishOk = agg.finish match {
        case LambdaFunction(out: NamedLambdaVariable,
            Seq(arg: NamedLambdaVariable), _) => out.exprId == arg.exprId
        case _ => false
      }
      mulOk && zeroOk && mergeOk && finishOk
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case agg: ArrayAggregate if rewritable(agg) =>
      val zw = agg.argument.asInstanceOf[ZipWith]
      DotFloat(zw.left, zw.right)
  }
}

/** `spark.sql.extensions` entry point: registers [[NativeDotRule]] in
  * every session of the application, and exposes the kernel to SQL
  * strings as `dot_f32(a, b)` — so `spark.sql("... dot_f32(u, v) ...")`
  * users reach the same codegen loop the DataFrame API gets.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => NativeDotRule)
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("dot_f32"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[DotFloat].getName, "dot_f32"),
      (args: Seq[Expression]) => {
        if (args.length != 2) {
          throw new IllegalArgumentException(
            s"dot_f32 expects exactly 2 arguments (array<float>, array<float>), got ${args.length}")
        }
        DotFloat(args.head, args(1))
      }))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("sliding_chunks"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.SlidingChunks].getName, "sliding_chunks"),
      (args: Seq[Expression]) => {
        def foldInt(e: Expression, what: String): Int = e match {
          case lit if lit.foldable =>
            lit.eval(null) match {
              case i: Int => i
              case l: Long => l.toInt
              case other => throw new IllegalArgumentException(
                s"sliding_chunks $what must be an integer literal, got $other")
            }
          case _ => throw new IllegalArgumentException(
            s"sliding_chunks $what must be a literal")
        }
        if (args.length != 3) {
          throw new IllegalArgumentException(
            s"sliding_chunks expects (array<string>, chunkTokens, stride), got ${args.length} args")
        }
        graft.functions.SlidingChunks(args.head,
          foldInt(args(1), "chunkTokens"), foldInt(args(2), "stride"))
      }))
  }
}
