package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `vector_l2sq(a, b)` — the squared L2 distance Σ (aᵢ−bᵢ)² of two
  * BIGINT arrays as a native Catalyst expression with whole-stage
  * codegen: the integer twin of [[VectorDot]].
  *
  * Motivation (guide §4 "eliminate non-codegen Expressions in the hot
  * path"): every trained-quantizer operator (v5/v20–v30 Lloyd
  * assignment, PQ encode, ADC table build) runs
  * `aggregate(zip_with(u, cent, (a,b) -> (a-b)*(a-b)), 0L, (acc,x) -> acc+x)`
  * in its innermost loop — and Spark's higher-order functions are
  * CodegenFallback: every element pays interpreted lambda-variable
  * slots plus a per-row `zip_with` array allocation, times 16 cells
  * (or 8×16 sub-codes) per row. This expression generates one tight
  * Java `for` loop per distance inside the stage.
  *
  * Exactness: the fold it replaces is a sequential ascending-index sum
  * of exact longs — Java `long` arithmetic here is the identical
  * (wrapping) arithmetic in the identical order, so results are
  * bit-equal, not just numerically close. (The engine's quantized
  * domains bound every |a−b| ≤ ~4e6, so Σ over 64 dims is ≤ ~1e15 —
  * far from overflow either way.)
  *
  * Null semantics mirror the fold exactly: null array → null;
  * mismatched lengths → null (`zip_with` pads with null and the sum
  * goes null); and when either input's element type admits nulls, any
  * null ELEMENT yields null (schema-derived, like [[VectorDot]], so
  * dense `containsNull=false` columns keep the branch-free loop).
  */
case class VectorL2SqLong(left: Expression, right: Expression)
    extends BinaryExpression {

  /** Null elements possible ⇒ per-element checks; resolved-schema-derived. */
  lazy val nullAware: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => false
  })

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vector_l2sq expects (array<bigint>, array<bigint>), got ($l, $r)")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "vector_l2sq"

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var s = 0L
      var i = 0
      while (i < n) {
        if (nullAware && (x.isNullAt(i) || y.isNullAt(i))) return null
        val d = x.getLong(i) - y.getLong(i)
        s += d * d
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
      val d = ctx.freshName("d")
      val elemNullCheck =
        if (nullAware)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $elemNullCheck
         |    long $d = $a.getLong($i) - $b.getLong($i);
         |    $s += $d * $d;
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorL2SqLong =
    copy(left = newLeft, right = newRight)
}
