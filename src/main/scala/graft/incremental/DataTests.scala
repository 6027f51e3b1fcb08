package graft.incremental

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** E2: `dbt test` as a first-class library feature — the declarative data
  * tests the reference attaches to every model in
  * `models/deepbook_margin/schema.yml` (`not_null` throughout, e.g.
  * `schema.yml:14-32`), generalized to dbt's four built-in generic tests.
  * dbt compiles each declaration to a SELECT returning the failing rows
  * and fails the test when that count is > 0 (`README.md:49`); this module
  * compiles the same declarations to Catalyst plans.
  *
  * Scale design: dbt submits ONE warehouse query per test. Here every
  * [[DataTest.NotNull]] and [[DataTest.AcceptedValues]] on a model fuses
  * into a SINGLE column-pruned aggregate pass (`count(when(cond, 1))` per
  * test — map-side-combined conditional counts, one scan per model no
  * matter how many tests), which at 100 TB is the difference between N
  * full scans and one. [[DataTest.Unique]] is inherently a groupBy (one
  * hash shuffle on the key — the same shuffle the model's own merge
  * performs); [[DataTest.Relationships]] is a left-anti join whose parent
  * side is a key projection (broadcastable whenever the dimension is).
  */
object DataTests {

  /** One declared test on one model — dbt's generic-test vocabulary. */
  sealed trait DataTest {
    /** dbt's test name as it appears in `schema.yml`. */
    def testName: String
    /** Column label in the summary (composite keys comma-joined). */
    def columnLabel: String
  }
  object DataTest {
    /** `tests: [not_null]` (`schema.yml:14-32` et al.). */
    final case class NotNull(column: String) extends DataTest {
      def testName = "not_null"; def columnLabel = column
    }
    /** dbt `unique` (single column) / dbt_utils
      * `unique_combination_of_columns` (composite — the test every
      * `unique_key` config block implies, e.g.
      * `deepbook_margin_loan_borrowed.sql:1-8`). Failures = number of
      * distinct key values appearing more than once. */
    final case class Unique(columns: Seq[String]) extends DataTest {
      def testName = "unique"; def columnLabel = columns.mkString(",")
    }
    /** dbt `accepted_values`. NULLs never fail (SQL `NOT IN` semantics —
      * dbt's compiled test has the same behavior), and failures count
      * DISTINCT offending VALUES, not rows — dbt compiles the test as a
      * `GROUP BY column` over the violators and counts the resulting
      * rows, so a bad value repeated a million times is one failure. */
    final case class AcceptedValues(column: String, values: Seq[String]) extends DataTest {
      def testName = "accepted_values"; def columnLabel = column
    }
    /** dbt `relationships`: every non-NULL child value must exist in
      * `toModel.toColumn`. Failures = failing child ROWS (dbt parity). */
    final case class Relationships(column: String, toModel: String, toColumn: String)
        extends DataTest {
      def testName = "relationships"; def columnLabel = column
    }
  }
  import DataTest._

  /** Summary row vocabulary: (model, column_name, test, failures, pass). */
  private val SummaryCols =
    Seq("model", "column_name", "test", "failures", "pass")

  /** Typed `dbt test` failure — message lists every red test. */
  final class DataTestFailedException(val failed: Seq[(String, String, String, Long)])
      extends RuntimeException(
        "data tests failed: " + failed.map { case (m, c, t, n) =>
          s"$m.$c $t ($n failures)"
        }.mkString("; "))

  /** Run `tests` against one model's rows. `ref` resolves the parent
    * model of a [[Relationships]] test (same contract as dbt's `ref()`).
    * Returns one summary row per test. */
  def forModel(model: String, df: DataFrame, tests: Seq[DataTest],
               ref: String => DataFrame = n =>
                 sys.error(s"relationships test needs ref('$n')")): DataFrame = {
    require(tests.nonEmpty, s"no tests declared for $model")
    // fused single-pass conditional counts (AcceptedValues stays out:
    // its dbt-parity count is DISTINCT values, and mixing a distinct
    // aggregate into the fused agg would force the whole pass through
    // expand + a sort-based fallback — the k1 lesson)
    val fused: Seq[(DataTest, Column)] = tests.collect {
      case t @ NotNull(c) => t -> col(c).isNull
    }
    val fusedDf: Option[DataFrame] =
      if (fused.isEmpty) None
      else {
        val aggs = fused.zipWithIndex.map { case ((_, cond), i) =>
          count(when(cond, lit(1))).as(s"_f$i")
        }
        val one = df.agg(aggs.head, aggs.tail: _*)
        val stackArgs = fused.zipWithIndex.map { case ((t, _), i) =>
          s"'${t.columnLabel}', '${t.testName}', _f$i"
        }.mkString(", ")
        Some(one.selectExpr(
          s"'$model' as model",
          s"stack(${fused.size}, $stackArgs) as (column_name, test, failures)"))
      }
    val rest: Seq[DataFrame] = tests.collect {
      case t @ AcceptedValues(c, v) =>
        // dbt's compiled shape: violators grouped by the column, failures
        // = resulting row count. The NOT IN filter is selective, so the
        // distinct runs over (usually zero) violators only.
        df.filter(!col(c).isin(v: _*)).select(col(c)).distinct()
          .agg(count(lit(1)).as("failures"))
          .select(lit(model).as("model"), lit(t.columnLabel).as("column_name"),
            lit(t.testName).as("test"), col("failures"))
      case t @ Unique(cols) =>
        // dbt: single-column unique ignores NULL keys; composite
        // (dbt_utils.unique_combination_of_columns) does not filter
        val base = if (cols.size == 1) df.filter(col(cols.head).isNotNull) else df
        base.groupBy(cols.map(col): _*).agg(count(lit(1)).as("_n"))
          .filter(col("_n") > 1)
          .agg(count(lit(1)).as("failures"))
          .select(lit(model).as("model"), lit(t.columnLabel).as("column_name"),
            lit(t.testName).as("test"), col("failures"))
      case t @ Relationships(c, toModel, toCol) =>
        // distinct parent keys: anti-join semantics are unchanged, the
        // build side shrinks from table-sized to key-domain-sized
        df.select(col(c)).filter(col(c).isNotNull)
          .join(ref(toModel).select(col(toCol).as(c)).distinct(), Seq(c), "left_anti")
          .agg(count(lit(1)).as("failures"))
          .select(lit(model).as("model"), lit(t.columnLabel).as("column_name"),
            lit(t.testName).as("test"), col("failures"))
    }
    (fusedDf.toSeq ++ rest)
      .reduce(_.unionByName(_))
      .withColumn("pass", col("failures") === 0L)
      .select(SummaryCols.map(col): _*)
  }

  /** Run a whole suite — dbt test over the project. `tables` resolves each
    * model's rows (a [[Runner.tableDir]]-backed reader, or in-memory model
    * outputs under test). Result: one row per declared test, ordered. */
  def run(tables: String => DataFrame,
          suite: Seq[(String, Seq[DataTest])]): DataFrame =
    suite.map { case (m, tests) => forModel(m, tables(m), tests, tables) }
      .reduce(_.unionByName(_))
      .orderBy("model", "test", "column_name")

  /** dbt's exit contract: evaluate the suite and THROW a
    * [[DataTestFailedException]] naming every failing test if any test
    * has failures; silent success otherwise. */
  def check(tables: String => DataFrame,
            suite: Seq[(String, Seq[DataTest])]): Unit = {
    val failed = run(tables, suite).filter(!col("pass"))
      .collect() // summary-sized: one row per FAILING declared test
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    if (failed.nonEmpty) throw new DataTestFailedException(failed.toSeq)
  }
}
