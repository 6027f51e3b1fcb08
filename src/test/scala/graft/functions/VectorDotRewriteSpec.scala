package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The `aggregate(zip_with(...))` → [[VectorDot]] optimizer rule: that it
  * fires on the canonical fold (and commuted spellings), that it does NOT
  * fire on folds with different semantics, and that rewritten plans
  * produce bit-identical results — including null elements, where the
  * null-aware variant must be emitted. */
class VectorDotRewriteSpec extends SparkSpec {
  import spark.implicits._

  private val HofDot =
    "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"

  private def withRule[T](f: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ VectorDotRewrite
    // The fixtures are LocalRelations; without this exclusion the
    // optimizer evaluates the whole projection at plan time and there is
    // no plan left to inspect. Real scans (parquet) are unaffected.
    val prevExcluded = spark.conf.getOption("spark.sql.optimizer.excludedRules")
    spark.conf.set("spark.sql.optimizer.excludedRules",
      "org.apache.spark.sql.catalyst.optimizer.ConvertToLocalRelation")
    try f
    finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == VectorDotRewrite)
      prevExcluded match {
        case Some(v) => spark.conf.set("spark.sql.optimizer.excludedRules", v)
        case None => spark.conf.unset("spark.sql.optimizer.excludedRules")
      }
    }
  }

  private def rewroteToVectorDot(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.expressions
      .exists(_.find(_.isInstanceOf[VectorDot]).isDefined)

  private def dense = Seq(
    (1L, Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
    (2L, Seq(0.5, -0.5), Seq(2.0, 2.0))).toDF("id", "a", "b")

  test("rewrites the canonical fold to vector_dot; results bit-identical") {
    withRule {
      val df = dense.select(col("id"), expr(HofDot).as("d"))
      assert(rewroteToVectorDot(df),
        s"expected VectorDot in:\n${df.queryExecution.optimizedPlan}")
      val got = df.orderBy("id").as[(Long, Double)].collect().toSeq
      assert(got == Seq((1L, 32.0), (2L, 0.0)))
    }
  }

  test("accepts commuted operands (y*x, x+acc)") {
    withRule {
      val df = dense.select(expr(
        "aggregate(zip_with(a, b, (x, y) -> y * x), 0D, (acc, x) -> x + acc)"))
      assert(rewroteToVectorDot(df))
    }
  }

  test("null elements: rewritten fold still yields null (null-aware variant)") {
    // Array built via CASE so the element type is containsNull = true.
    val src = Seq((1L, 0), (2L, 1)).toDF("id", "flag")
      .select(col("id"),
        expr("array(1D, CASE WHEN flag = 1 THEN CAST(NULL AS DOUBLE) ELSE 2D END)").as("a"),
        expr("array(3D, 4D)").as("b"))
    val plain = src.select(col("id"), expr(HofDot).as("d"))
      .orderBy("id").collect().map(r => if (r.isNullAt(1)) None else Some(r.getDouble(1)))
    val rewritten = withRule {
      val df = src.select(col("id"), expr(HofDot).as("d"))
      assert(rewroteToVectorDot(df))
      df.orderBy("id").collect().map(r => if (r.isNullAt(1)) None else Some(r.getDouble(1)))
    }
    assert(plain.toSeq == Seq(Some(11.0), None))
    assert(rewritten.toSeq == plain.toSeq)
  }

  test("mismatched lengths: rewritten fold yields null like zip_with padding") {
    withRule {
      val df = Seq((Seq(1.0, 2.0, 3.0), Seq(1.0))).toDF("a", "b")
        .select(expr(HofDot))
      assert(rewroteToVectorDot(df))
      assert(df.head().isNullAt(0))
    }
  }

  test("does NOT fire on folds with different semantics") {
    withRule {
      // different combine op (sum of sums, not a dot product)
      val add = dense.select(expr(
        "aggregate(zip_with(a, b, (x, y) -> x + y), 0D, (acc, x) -> acc + x)"))
      assert(!rewroteToVectorDot(add))
      // non-zero seed changes the result
      val seeded = dense.select(expr(
        "aggregate(zip_with(a, b, (x, y) -> x * y), 1D, (acc, x) -> acc + x)"))
      assert(!rewroteToVectorDot(seeded))
      // -0.0 seed: 'aggregate' of two empty arrays returns -0.0, vector_dot 0.0
      val negZero = dense.select(expr(
        "aggregate(zip_with(a, b, (x, y) -> x * y), -0D, (acc, x) -> acc + x)"))
      assert(!rewroteToVectorDot(negZero))
      // integer arrays: overflow semantics differ from double
      val ints = Seq((Seq(1, 2), Seq(3, 4))).toDF("a", "b").select(expr(
        "aggregate(zip_with(a, b, (x, y) -> x * y), 0, (acc, x) -> acc + x)"))
      assert(!rewroteToVectorDot(ints))
      // finish lambda that is not identity
      val finished = dense.select(expr(
        "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x, acc -> acc / 2)"))
      assert(!rewroteToVectorDot(finished))
    }
  }

  test("dense non-null schema gets the branch-free (not null-aware) variant") {
    withRule {
      // toDF on Seq[Double] yields containsNull = false element types
      val df = dense.select(expr(HofDot))
      val v = df.queryExecution.optimizedPlan.expressions
        .flatMap(_.collect { case v: VectorDot => v }).headOption
      assert(v.isDefined && !v.get.nullAware)
    }
  }
}
