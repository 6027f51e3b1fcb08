package graft.models

import graft.SparkSpec
import graft.fixtures.DeepbookFixtures
import graft.incremental.{RunContext, RunMode, Runner}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Ports the reference's declarative tests (`models/deepbook_margin/
  * schema.yml` not_null sets) onto a full-refresh DAG run over the
  * fixtures, strengthened with merge-key uniqueness (which the reference
  * relies on but never tests) and golden spot-checks of the daily fact. */
class ModelContractSpec extends SparkSpec {

  private lazy val dagRoot: String = {
    val root = Files.createTempDirectory("graft-dag").toString
    val ctx = RunContext(spark, DeepbookFixtures.sources(spark),
      RunMode.FullRefresh, DeepbookFixtures.now)
    DeepbookPipeline.runner(root).run(ctx)
    root
  }
  private lazy val tables: Map[String, DataFrame] = {
    val root = dagRoot
    DeepbookPipeline.models
      .map(m => m.name -> graft.incremental.SnapshotStore.read(spark, s"$root/${m.name}").get)
      .toMap
  }

  /** `schema.yml` not_null column sets (line-ranges per model in §5). */
  private val notNull: Map[String, Seq[String]] = Map(
    "deepbook_margin_deposit_collateral" ->
      Seq("transaction_digest", "event_index", "timestamp_ms", "margin_manager_id", "amount"),
    "deepbook_margin_loan_borrowed" ->
      Seq("transaction_digest", "event_index", "timestamp_ms", "loan_amount"),
    "deepbook_margin_loan_repaid" ->
      Seq("transaction_digest", "event_index", "timestamp_ms"),
    "deepbook_margin_pool_asset_supplied" ->
      Seq("transaction_digest", "event_index", "timestamp_ms"),
    "deepbook_margin_pool_asset_withdrawn" ->
      Seq("transaction_digest", "event_index", "timestamp_ms"),
    "stg_deepbook_margin_pool_object" -> Seq("object_id", "version"),
    "fct_deepbook_margin_pool_daily" -> Seq("snapshot_date", "margin_pool_id"))

  for ((model, cols) <- notNull)
    test(s"not_null: $model(${cols.mkString(", ")})") {
      val df = tables(model)
      for (c <- cols)
        assert(df.filter(col(c).isNull).isEmpty, s"$model.$c has NULLs")
    }

  for (m <- DeepbookPipeline.models)
    test(s"unique_key: ${m.name}(${m.uniqueKey.mkString(", ")})") {
      val df = tables(m.name)
      val dups = df.groupBy(m.uniqueKey.map(col): _*).count().filter(col("count") > 1)
      assert(dups.isEmpty, s"${m.name} merge key is not unique")
    }

  test("golden: fct has one row per (pool, day) and honors the peg/price rules") {
    val fct = tables("fct_deepbook_margin_pool_daily")
    assert(fct.count() == 40) // 4 pools × 10 days
    // stablecoin peg overrides the 0.99 market price
    assert(fct.filter(col("coin_symbol") === "USDC" && col("price_usd") =!= 1.0).isEmpty)
    // SUI day 5 has no price row → coalesce to 0
    assert(fct.filter(col("coin_symbol") === "SUI" &&
      col("snapshot_date") === lit(java.sql.Date.valueOf("2026-01-05")))
      .select("price_usd").head().getDouble(0) == 0.0)
    // last price of the day wins the W2 dedup: SUI day 1 → (325+1)/100
    assert(fct.filter(col("coin_symbol") === "SUI" &&
      col("snapshot_date") === lit(java.sql.Date.valueOf("2026-01-01")))
      .select("price_usd").head().getDouble(0) == 3.26)
    // unknown asset defaults: UNKNOWN symbol, price 0
    assert(fct.filter(col("coin_symbol") === "UNKNOWN" && col("price_usd") =!= 0.0).isEmpty)
    // utilization else-0 day (pool3, day 4 has zero supply)
    assert(fct.filter(col("margin_pool_id") === "0xpool03mys" &&
      col("snapshot_date") === lit(java.sql.Date.valueOf("2026-01-04")))
      .select("utilization_rate").head().getDouble(0) == 0.0)
  }

  test("E3: ad-hoc consumption SQL over registered views (README.md:77-120 shapes)") {
    DeepbookPipeline.registerViews(spark, dagRoot)
    // TVL-style rollup over the daily fact
    val tvl = spark.sql("""
      SELECT coin_symbol, round(sum(total_supply_usd), 2) AS tvl_usd
      FROM fct_deepbook_margin_pool_daily
      WHERE snapshot_date = DATE '2026-01-10'
      GROUP BY coin_symbol ORDER BY tvl_usd DESC""")
    assert(tvl.count() == 4)
    // loan activity over the raw event model (from_unixtime + 1e6 scaling)
    val loans = spark.sql("""
      SELECT date(from_unixtime(timestamp_ms / 1000)) AS day,
             round(sum(loan_amount) / 1e6, 2) AS borrowed_m
      FROM deepbook_margin_loan_borrowed
      GROUP BY 1 ORDER BY 1""")
    assert(loans.count() == 10)
  }

  test("events older than the 30-day backfill bound are excluded") {
    val lb = tables("deepbook_margin_loan_borrowed")
    assert(lb.filter(col("transaction_digest") === "0xtoldbor").isEmpty)
    val sup = tables("deepbook_margin_pool_asset_supplied")
    assert(sup.filter(col("transaction_digest") === "0xtoldsup").isEmpty)
  }

  test("malformed JSON numerics try_cast to NULL without dropping the row") {
    val rep = tables("deepbook_margin_loan_repaid")
    val bad = rep.filter(col("transaction_digest") === "0xtr2d6")
    assert(bad.count() == 1 && bad.select("repay_shares").head().isNullAt(0))
  }
}
