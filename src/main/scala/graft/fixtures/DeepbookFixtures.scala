package graft.fixtures

import graft.Sources
import graft.models.EventModels
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import java.nio.file.{Files, Paths}
import java.sql.Timestamp
import java.time.Instant

/** Deterministic DeepBook source fixtures (FIXTURES.md §1-3): ten days of
  * events/objects/prices for four margin pools, written once to
  * `/root/repo/fixtures/` so the DAG oracle SQL can `read_parquet` the
  * same bytes the Spark DAG reads.
  *
  * Determinism rules:
  *  - all JSON numerics are integer strings ⇒ `try_cast` doubles are exact
  *    and every downstream sum is order-independent;
  *  - the clock is the fixed [[now]]; the 30-day backfill bound is a
  *    literal both sides share;
  *  - malformed numerics appear only in columns WITHOUT a `not_null`
  *    declaration in the reference `schema.yml` (pyth_price, repay_shares,
  *    supply_shares).
  *
  * Coverage per FIXTURES.md: all five event shapes incl. nested
  * `$.asset.name` / `$.asset_type.name` paths; noise event types (P1
  * filters); events older than the backfill bound (P4); the SUI short-form
  * asset (J1 CASE canonicalization); an unknown asset (UNKNOWN/9
  * defaults); multi-version object days (W1 dedup); zero shares / zero
  * supply (share-price NULL and utilization else-0 guards); duplicate
  * prices per day (W2 dedup); a missing SUI price day (coalesce→0); a
  * stablecoin price ≠ 1.0 (peg override wins); off-chain noise rows.
  */
object DeepbookFixtures {

  val now: Instant = Instant.parse("2026-01-15T00:00:00Z")
  val fixturesDir = "/root/repo/fixtures"

  val pkg: String = EventModels.pkg
  private val usdcType =
    "0xdba34672e30cb065b1f93e3ab55318768fd6fef66c15942c9f7cb846e2f900e7::usdc::USDC"
  private val deepType =
    "0xdeeb7a4662eec9f2f3def03fb937a663dddaa2e215b8078a284d026b7946c270::deep::DEEP"
  private val mysType =
    "0xbad0000000000000000000000000000000000000000000000000000000000bad::mys::MYS"

  final case class Pool(idx: Int, poolId: String, assetType: String)
  val pools: Seq[Pool] = Seq(
    Pool(0, "0xpool00usdc", usdcType),
    Pool(1, "0xpool01sui", "0x2::sui::SUI"),
    Pool(2, "0xpool02deep", deepType),
    Pool(3, "0xpool03mys", mysType))

  private def dayStartMs(d: Int): Long =
    Instant.parse(f"2026-01-$d%02dT00:00:00Z").toEpochMilli
  private val oldMs = Instant.parse("2025-12-01T00:00:00Z").toEpochMilli

  // ---- sui.events ----------------------------------------------------------

  def eventRows: Seq[Row] = {
    val rows = Seq.newBuilder[Row]
    def ev(digest: String, idx: Long, ts: Long, et: String, json: String): Unit =
      rows += Row(digest, idx, ts, "0xsender1", et, json)

    for (p <- pools; d <- 1 to 10) {
      val base = dayStartMs(d) + p.idx * 3600000L
      // AssetSupplied — daily, all pools; one malformed supply_shares
      val sAmt = 1000000L * (d + p.idx + 1)
      val sShares = if (p.idx == 3 && d == 9) "xx" else (sAmt - 10000L).toString
      ev(s"0xts${p.idx}d$d", 0L, base + 600000L,
        s"$pkg::margin_pool::AssetSupplied",
        s"""{"margin_pool_id":"${p.poolId}","supplier_cap_id":"0xcap${p.idx}","asset_type":{"name":"${p.assetType}"},"supply_amount":"$sAmt","supply_shares":"$sShares","timestamp":"${base + 600000L}"}""")
      // AssetWithdrawn — even days
      if (d % 2 == 0) {
        val wAmt = 400000L * (d + p.idx)
        ev(s"0xtw${p.idx}d$d", 1L, base + 1200000L,
          s"$pkg::margin_pool::AssetWithdrawn",
          s"""{"margin_pool_id":"${p.poolId}","supplier_cap_id":"0xcap${p.idx}","asset_type":{"name":"${p.assetType}"},"withdraw_amount":"$wAmt","withdraw_shares":"${wAmt - 3000L}","timestamp":"${base + 1200000L}"}""")
      }
      // LoanBorrowed — daily
      val bAmt = 300000L * (d + p.idx + 1)
      ev(s"0xtb${p.idx}d$d", 2L, base + 1800000L,
        s"$pkg::margin_manager::LoanBorrowedEvent",
        s"""{"loan_amount":"$bAmt","loan_shares":"${bAmt - 5000L}","margin_manager_id":"0xmgr${p.idx}","margin_pool_id":"${p.poolId}","timestamp":"${base + 1800000L}"}""")
      // LoanRepaid — every third day; one malformed repay_shares
      if (d % 3 == 0) {
        val rAmt = 150000L * (d + p.idx)
        val rShares = if (p.idx == 2 && d == 6) "oops" else (rAmt - 2000L).toString
        ev(s"0xtr${p.idx}d$d", 3L, base + 2400000L,
          s"$pkg::margin_manager::LoanRepaidEvent",
          s"""{"margin_manager_id":"0xmgr${p.idx}","margin_pool_id":"${p.poolId}","repay_amount":"$rAmt","repay_shares":"$rShares","timestamp":"${base + 2400000L}"}""")
      }
      // DepositCollateral — pools 0-2; one malformed pyth_price
      if (p.idx < 3) {
        val cAmt = 250000L * (d + 1)
        val pyth = if (p.idx == 1 && d == 7) "n/a" else (99000000L + d * 1000L).toString
        ev(s"0xtd${p.idx}d$d", 4L, base + 3000000L,
          s"$pkg::margin_manager::DepositCollateralEvent",
          s"""{"amount":"$cAmt","asset":{"name":"${p.assetType}"},"margin_manager_id":"0xmgr${p.idx}","pyth_decimals":"8","pyth_price":"$pyth","timestamp":"${base + 3000000L}"}""")
      }
    }
    // noise event types — filtered by P1
    for (d <- 1 to 10)
      ev(s"0xtnd$d", 5L, dayStartMs(d) + 60000L, "0xother::mod::NoiseEvent", """{"x":"1"}""")
    // events older than the 30-day backfill bound — excluded by P4
    ev("0xtoldsup", 0L, oldMs, s"$pkg::margin_pool::AssetSupplied",
      s"""{"margin_pool_id":"${pools.head.poolId}","supplier_cap_id":"0xcap0","asset_type":{"name":"$usdcType"},"supply_amount":"999999","supply_shares":"999000","timestamp":"$oldMs"}""")
    ev("0xtoldbor", 2L, oldMs, s"$pkg::margin_manager::LoanBorrowedEvent",
      s"""{"loan_amount":"888888","loan_shares":"888000","margin_manager_id":"0xmgr0","margin_pool_id":"${pools.head.poolId}","timestamp":"$oldMs"}""")
    rows.result()
  }

  // ---- sui.objects ---------------------------------------------------------

  def objectRows: Seq[Row] = {
    val rows = Seq.newBuilder[Row]
    for (p <- pools; d <- 1 to 10) {
      val nVersions = if (p.idx == 0 && d == 3) 2 else 1 // W1 dedup day
      for (i <- 0 until nVersions) {
        val ts = dayStartMs(d) + 6 * 3600000L + i * 3600000L
        val version = (d * 100 + p.idx * 10 + i).toLong
        val zeroDay = p.idx == 3 && d == 4   // utilization else-0 guard
        val zeroShares = p.idx == 3 && d == 2 // share-price NULL guard
        val totalSupply = if (zeroDay) 0L else 1000000000000L + d * 10000000000L + p.idx * 7000000L
        val totalBorrow = if (zeroDay) 0L else 200000000000L + d * 5000000000L + p.idx * 3000000L
        val supplyShares = if (zeroShares) 0L else totalSupply - 2000000L
        val borrowShares = if (zeroShares) 0L else totalBorrow - 1000000L
        val enabled = p.idx % 2 == 0
        val json =
          s"""{"id":{"id":"${p.poolId}"},""" +
            s""""state":{"total_borrow":"$totalBorrow","total_supply":"$totalSupply","borrow_shares":"$borrowShares","supply_shares":"$supplyShares","last_update_timestamp":"${ts - 1000L}"},""" +
            s""""vault":"${50000000000L + d * 1000000L}",""" +
            s""""protocol_fees":{"fees_per_share":"${12L + d}","maintainer_fees":"${3400L + d}","protocol_fees":"${8100L + d}","total_shares":"$supplyShares","referrals":{"size":"2"}},""" +
            s""""positions":{"positions":{"size":"${10L + d}","id":{"id":"0xtbl${p.idx}"}}},""" +
            s""""config":{"interest_config":{"base_rate":"10000000","base_slope":"50000000","excess_slope":"900000000","optimal_utilization":"800000000"},""" +
            s""""margin_pool_config":{"max_utilization_rate":"950000000","min_borrow":"1000000","protocol_spread":"100000000","supply_cap":"5000000000000","rate_limit_enabled":"$enabled","rate_limit_capacity":"100000000000"}},""" +
            s""""rate_limiter":{"available":"${90000000000L - d * 1000000L}","capacity":"100000000000","enabled":$enabled,"last_updated_ms":"${ts - 500L}"},""" +
            s""""allowed_deepbook_pools":{"contents":["0xdbp1","0xdbp2"]}}"""
        rows += Row(p.poolId, version, s"$pkg::margin_pool::MarginPool<${p.assetType}>",
          "Exists", json, ts)
      }
    }
    // noise type — filtered by P2's LIKE
    rows += Row("0xother1", 1L, s"$pkg::other::Thing<X>", "Exists", """{"x":"1"}""",
      dayStartMs(2) + 1000L)
    // older than the backfill bound — excluded
    rows += Row(pools.head.poolId, 1L,
      s"$pkg::margin_pool::MarginPool<$usdcType>", "Exists",
      s"""{"id":{"id":"${pools.head.poolId}"},"state":{"total_borrow":"1","total_supply":"2","borrow_shares":"1","supply_shares":"2","last_update_timestamp":"$oldMs"}}""",
      oldMs)
    rows.result()
  }

  // ---- prices.day ----------------------------------------------------------

  def priceRows: Seq[Row] = {
    val rows = Seq.newBuilder[Row]
    def ts(d: Int, h: Int) = Timestamp.from(Instant.ofEpochMilli(dayStartMs(d) + h * 3600000L))
    for (d <- 1 to 10) {
      if (d != 5) { // missing SUI price day 5 → coalesce(price,0)
        rows += Row("sui", "SUI", ts(d, 10), (320 + d) / 100.0)
        rows += Row("sui", "SUI", ts(d, 20), (325 + d) / 100.0) // later row wins W2
      }
      rows += Row("sui", "USDC", ts(d, 12), 0.99) // peg override must win
      rows += Row("sui", "DEEP", ts(d, 2), 0.14)
      rows += Row("sui", "DEEP", ts(d, 12), (150 + d) / 1000.0)
      rows += Row("ethereum", "SUI", ts(d, 12), 99.9) // wrong chain — filtered
      rows += Row("sui", "BTC", ts(d, 12), 50000.0)   // wrong symbol — filtered
    }
    rows.result()
  }

  // ---- materialization -----------------------------------------------------

  def events(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(eventRows, 2), Sources.suiEventsSchema)
  def objects(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(objectRows, 2), Sources.suiObjectsSchema)
  def prices(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(priceRows, 1), Sources.pricesDaySchema)

  /** In-memory resolver for tests. */
  def sources(spark: SparkSession): Sources = Sources.inMemory(Map(
    "sui.events" -> events(spark),
    "sui.objects" -> objects(spark),
    "prices.day" -> prices(spark)))

  /** Write the three fixture tables under `dir` (one parquet dir each). */
  def writeTo(spark: SparkSession, dir: String): Unit = {
    events(spark).coalesce(1).write.mode("overwrite").parquet(s"$dir/sui_events.parquet")
    objects(spark).coalesce(1).write.mode("overwrite").parquet(s"$dir/sui_objects.parquet")
    prices(spark).coalesce(1).write.mode("overwrite").parquet(s"$dir/prices_day.parquet")
  }

  /** Content digest of the generated rows — stored in the marker so an
    * edit to any generator forces regeneration of the committed parquet
    * (existence-only markers let generator code and files drift apart). */
  def contentDigest: String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    (eventRows ++ objectRows ++ priceRows)
      .foreach(r => md.update(r.mkString("|").getBytes("UTF-8")))
    md.digest().map(b => f"$b%02x").mkString
  }

  /** Idempotently materialize the fixtures at [[fixturesDir]] (the path the
    * oracle SQL reads) and return a file-backed resolver over them. */
  def ensureWritten(spark: SparkSession): Sources = synchronized {
    val marker = Paths.get(fixturesDir, "_FIXTURES_OK")
    val digest = contentDigest
    if (!Files.exists(marker) || Files.readString(marker).trim != digest) {
      writeTo(spark, fixturesDir)
      Files.createDirectories(marker.getParent)
      Files.writeString(marker, digest)
    }
    Sources.sui(spark, fixturesDir)
  }
}
