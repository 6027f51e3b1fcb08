package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.unsafe.types.UTF8String

/** `shingle_ids(text)` — the distinct word-3-gram shingle hashes of
  * lowercased `text`, as a native Catalyst expression.
  *
  * Semantically identical (bit-for-bit, not just set-equal) to the
  * composed built-ins it replaces on the dedup hot path:
  * {{{
  * array_distinct(transform(sequence(0, size(w)-3),
  *   i -> xxhash64(w[i], w[i+1], w[i+2])))   // w = split(lower(text), ' ')
  * }}}
  * — same split-on-space semantics (empty words from consecutive/trailing
  * delimiters included), same UTF8String lowercasing, and the same
  * seed-42 XXH64 chain per word that the multi-arg `xxhash64` computes —
  * but in one compiled pass over the string's bytes: no per-element
  * lambda interpretation, no word-array materialization, no string
  * allocation at all (each word hashes in place via its byte range).
  * Higher-order functions are interpreted per element, which made this
  * projection the largest remaining cost of the MinHash/PPJoin operators.
  *
  * Fewer than 3 words ⇒ empty array; null text ⇒ null (null-safe path).
  */
case class ShingleIds(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_ids expects string, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_ids"
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    ShingleIds.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleIds.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): ShingleIds =
    copy(child = newChild)
}

object ShingleIds {

  private final val Seed = 42L // XxHash64's default seed

  /** One pass: lowercase, scan the bytes for space-delimited word ranges,
    * hash each 3-word window with the same chained XXH64 the multi-arg
    * `xxhash64` uses, dedup preserving first occurrence. */
  def compute(text: UTF8String): ArrayData = {
    val lowered = text.toLowerCase
    val base = lowered.getBaseObject
    val off = lowered.getBaseOffset
    val n = lowered.numBytes()
    // word boundaries: starts(i) .. ends(i) (exclusive), split on 0x20 —
    // identical to split(lower(text), ' ') with empties kept
    var words = 1
    var i = 0
    while (i < n) { if (lowered.getByte(i) == ' '.toByte) words += 1; i += 1 }
    if (words < 3) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val starts = new Array[Int](words)
    val ends = new Array[Int](words)
    var w = 0; var s = 0; i = 0
    while (i < n) {
      if (lowered.getByte(i) == ' '.toByte) { starts(w) = s; ends(w) = i; w += 1; s = i + 1 }
      i += 1
    }
    starts(w) = s; ends(w) = n
    val out = new Array[Long](words - 2)
    val seen = new java.util.HashSet[java.lang.Long](words * 2)
    var k = 0
    i = 0
    while (i <= words - 3) {
      var h = Seed
      var j = i
      while (j <= i + 2) {
        h = XXH64.hashUnsafeBytes(base, off + starts(j), ends(j) - starts(j), h)
        j += 1
      }
      if (seen.add(h)) { out(k) = h; k += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (k == out.length) out else java.util.Arrays.copyOf(out, k))
  }
}
