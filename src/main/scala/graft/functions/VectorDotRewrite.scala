package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the interpreted higher-order-function dot
  * product
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x) }}}
  * into the whole-stage-codegen'd [[VectorDot]] expression.
  *
  * Why a `Rule[LogicalPlan]` and not just a registered function: users
  * porting SQL from engines without a native dot product write the
  * `aggregate(zip_with(...))` fold — which Spark executes with an
  * interpreted lambda per element, allocating lambda-variable slots in
  * the innermost loop of every similarity scan. This rule lets that SQL
  * keep its portable spelling while executing the tight generated loop;
  * at 100 TB the difference is the dominant per-row cost of every
  * brute-force or verify-stage cosine.
  *
  * Safety argument (exact, not approximate):
  *  - summation order: `aggregate` is a sequential ascending-index left
  *    fold; [[VectorDot]] sums the same order — bit-identical doubles.
  *  - length mismatch: `zip_with` pads the shorter side with null, the
  *    product and fold go null; [[VectorDot]] returns null. Identical.
  *  - null elements: the fold yields null; the rewrite emits the
  *    null-aware [[VectorDot]] variant whenever either array's type
  *    admits null elements, which yields null the same way. When both
  *    sides are `containsNull = false` the branch-free dense variant is
  *    emitted instead.
  *  - commuted operands (`y * x`, `x + acc`) are accepted: IEEE-754
  *    multiplication and addition are commutative (associativity, which
  *    is NOT assumed, is what the fixed fold order preserves).
  *  - only `DoubleType` arrays match; ANSI vs legacy eval mode is
  *    irrelevant for double arithmetic (never throws, never overflows
  *    to an error).
  *
  * Injected via [[GraftExtensions]] (`injectOptimizerRule`) so any
  * session built with `spark.sql.extensions=graft.functions.GraftExtensions`
  * gets it; tests can also attach it through
  * `spark.experimental.extraOptimizations`.
  */
object VectorDotRewrite extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** Foldable zero literal of the accumulator (`0D`, `CAST(0 AS DOUBLE)`
    * pre-folding, ...). */
  private def isZeroD(e: Expression): Boolean =
    e.foldable && e.dataType == DoubleType && {
      e.eval() match {
        case d: java.lang.Double => d.doubleValue() == 0.0 && !(1.0 / d < 0) // reject -0.0
        case _ => false
      }
    }

  /** The two operands are exactly the two lambda variables, in either
    * order (both ops are IEEE-commutative). */
  private def usesBothVars(opA: Expression, opB: Expression,
                           v1: NamedExpression, v2: NamedExpression): Boolean =
    (opA, opB) match {
      case (a: NamedLambdaVariable, b: NamedLambdaVariable) =>
        Set(a.exprId, b.exprId) == Set(v1.exprId, v2.exprId) &&
          v1.exprId != v2.exprId
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
        ZipWith(l, r,
          LambdaFunction(Multiply(mx, my, _), Seq(xv: NamedLambdaVariable, yv: NamedLambdaVariable), _)),
        zero,
        LambdaFunction(Add(al, ar, _), Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
        LambdaFunction(fin: NamedLambdaVariable, Seq(fv: NamedLambdaVariable), _))
      if isDoubleArray(l) && isDoubleArray(r) && isZeroD(zero) &&
        usesBothVars(mx, my, xv, yv) && usesBothVars(al, ar, acc, el) &&
        fin.exprId == fv.exprId =>
      VectorDot(l, r) // null-awareness is schema-derived inside VectorDot
  }
}
