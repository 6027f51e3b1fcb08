package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** `vector_dot(a, b)` — the dot product of two double arrays as a native
  * Catalyst expression with whole-stage codegen.
  *
  * Motivation (the one place built-ins genuinely fall short): the
  * embedding similarity operators need `Σ aᵢ·bᵢ` in their innermost
  * loop, and Spark's higher-order functions (`aggregate(zip_with(...))`)
  * are INTERPRETED — every element allocates lambda-variable slots.
  * This expression generates a tight Java `for` loop inside the stage,
  * keeping the cosine math in compiled code. Summation is sequential
  * ascending-index — bit-identical to the left-fold the oracle mirrors.
  *
  * Elements are assumed non-null (embeddings are dense); a null array
  * yields null via the default null-safe path, and MISMATCHED lengths
  * also yield null — the same detectable signal the
  * `aggregate(zip_with(...))` fold produces (zip_with pads with null),
  * rather than a plausible-looking truncated dot product.
  *
  * When either input's element type admits nulls the evaluation is
  * additionally null-aware — any null ELEMENT yields null, the exact
  * semantics of the `aggregate(zip_with(a,b,(x,y)->x*y), 0D,
  * (acc,x)->acc+x)` fold over `containsNull` arrays. This is derived
  * from the RESOLVED INPUT TYPES (not a constructor flag) so every
  * construction path — the [[VectorDotRewrite]] optimizer rule, the SQL
  * registry, the extension injection — gets the same semantics for the
  * same schema; dense `containsNull=false` schemas keep the hot
  * embedding path branch-free.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  /** Null elements possible ⇒ per-element checks; resolved-schema-derived. */
  lazy val nullAware: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => false
  })

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vector_dot expects (array<double>, array<double>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_dot"

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var s = 0.0
      var i = 0
      while (i < n) {
        if (nullAware && (x.isNullAt(i) || y.isNullAt(i))) return null
        s += x.getDouble(i) * y.getDouble(i)
        i += 1
      }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val elemNullCheck =
        if (nullAware)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $elemNullCheck
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {
  /** Register `vector_dot` in the session's function registry (idempotent)
    * so `expr("vector_dot(a, b)")` resolves — the per-session equivalent
    * of [[GraftExtensions]] for sessions built without the extensions
    * config (e.g. the driver-contract queries, which receive the session). */
  def ensureRegistered(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vector_dot", exprs => VectorDot(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vector_l2sq", exprs => VectorL2SqLong(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingle_ids", exprs => ShingleIds(exprs.head), "built-in")
  }
}

/** `spark.sql.extensions`-style injection:
  * {{{
  * SparkSession.builder().config("spark.sql.extensions", "graft.functions.GraftExtensions")
  * }}} */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => VectorDotRewrite)
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("vector_dot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[VectorDot].getCanonicalName, "vector_dot"),
      (children: Seq[Expression]) => VectorDot(children.head, children(1))))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("vector_l2sq"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[VectorL2SqLong].getCanonicalName, "vector_l2sq"),
      (children: Seq[Expression]) => VectorL2SqLong(children.head, children(1))))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("shingle_ids"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[ShingleIds].getCanonicalName, "shingle_ids"),
      (children: Seq[Expression]) => ShingleIds(children.head)))
  }
}
