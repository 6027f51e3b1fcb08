package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every key in [[queries]] is one operator from SURVEY.md §2 (or a
  * north-star training-data-pipeline operator) expressed over the driver's
  * stand-in tables; [[oracleSql]] carries the DuckDB-checkable twin.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The A1 daily-aggregate shape — the heart of the reference's daily fact
    * (`fct_deepbook_margin_pool_daily.sql:27-76`). */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.a1DailyAgg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2, plus the
    * training-data-pipeline operators over documents/embeddings. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.all ++ PipelineQueries.all ++ CorpusPrep.all ++ DagQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalOracles.all ++ PipelineOracles.all ++ DagOracles.all
}
