package graft.models

import graft.TrinoFns._
import graft.incremental.{Model, RunContext, RunMode}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** `fct_deepbook_margin_pool_daily` — end-of-day pool metrics with USD
  * valuations (`models/deepbook_margin/daily/fct_deepbook_margin_pool_daily.sql`).
  *
  * Shape: 4 per-(day, pool) volume aggregates (A1) → FULL OUTER join chain
  * with coalesced keys (J2) → window-dedup of pool state to last mutation per
  * day (W1) → last price per symbol per day (W2) → left joins (J3/J4) → USD
  * and day-over-day lag metrics (W3) → global sort (O1).
  *
  * Grain: one row per (margin_pool_id, snapshot_date); merges on that key
  * (`:1-8`) with a trailing 7-day re-aggregation window per incremental run
  * (`:33-35`) so late events revise recently closed days.
  *
  * Faithful quirk: the reference computes the W3 lag deltas over the
  * lookback-FILTERED state (`:112-114` feeds `:190-196`), so every
  * incremental run re-NULLs `daily_*_change` on the window's first day
  * (no predecessor inside the window) and the merge overwrites the
  * previously correct value. Reproduced as-is — see IncrementalEquivSpec.
  *
  * Scale notes: the four upstream aggregates each shuffle on
  * (snapshot_date, margin_pool_id) — the same key the FOJ chain and the J3
  * join use, so AQE reuses one exchange layout; the daily-prices side is
  * tiny (≤ symbols × days) and broadcast; the lag window repartitions by
  * margin_pool_id only (few pools ⇒ rows/pool is small because grain is
  * daily). The lookback bound keeps every incremental scan O(7 days).
  */
object PoolDailyFct extends Model {

  val name = "fct_deepbook_margin_pool_daily"
  val uniqueKey: Seq[String] = Seq("margin_pool_id", "snapshot_date")
  /** The merge key contains the partition date itself. */
  override val partitionDate: Option[Column] = Some(col("snapshot_date"))
  /** The DAG's only non-root: joins the 4 volume extractors + staging
    * (`fct_deepbook_margin_pool_daily.sql` ref() calls). */
  override val refs: Seq[String] = Seq(
    "deepbook_margin_pool_asset_supplied",
    "deepbook_margin_pool_asset_withdrawn",
    "deepbook_margin_loan_borrowed",
    "deepbook_margin_loan_repaid",
    "stg_deepbook_margin_pool_object")

  private val stablecoins = Seq("USDC", "USDT", "AUSD")

  def build(ctx: RunContext, existing: Option[DataFrame],
            ref: String => DataFrame): DataFrame = {
    // P5: trailing-7-day lookback anchor (`:33-35`)
    val lookbackFrom: Option[java.sql.Date] = (ctx.mode, existing) match {
      case (RunMode.Incremental, Some(prev)) =>
        Option(prev.agg(date_add(max(col("snapshot_date")), -ctx.lookbackDays))
          .head().getDate(0))
      case _ => None
    }
    def lookback(dateCol: Column): Column =
      lookbackFrom.map(d => dateCol >= lit(d)).getOrElse(lit(true))

    // A1 ×4: daily volumes (`:27-76`)
    def volume(model: String, amount: String, as: String): DataFrame =
      ref(model)
        .filter(lookback(msToDate(col("timestamp_ms"))))
        .groupBy(msToDate(col("timestamp_ms")).as("snapshot_date"),
                 col("margin_pool_id"))
        .agg(sum(col(amount)).as(as))

    val s = volume("deepbook_margin_pool_asset_supplied", "supply_amount", "supply_volume")
    val w = volume("deepbook_margin_pool_asset_withdrawn", "withdraw_amount", "withdraw_volume")
    val b = volume("deepbook_margin_loan_borrowed", "loan_amount", "borrow_volume")
    val r = volume("deepbook_margin_loan_repaid", "repay_amount", "repay_volume")

    // J2: FOJ chain with coalesced keys (`:78-90`)
    val sw = s.join(w,
      s("snapshot_date") === w("snapshot_date") && s("margin_pool_id") === w("margin_pool_id"),
      "full_outer")
      .select(
        coalesce(s("snapshot_date"), w("snapshot_date")).as("snapshot_date"),
        coalesce(s("margin_pool_id"), w("margin_pool_id")).as("margin_pool_id"),
        s("supply_volume"), w("withdraw_volume"))
    val swb = sw.join(b,
      sw("snapshot_date") === b("snapshot_date") && sw("margin_pool_id") === b("margin_pool_id"),
      "full_outer")
      .select(
        coalesce(sw("snapshot_date"), b("snapshot_date")).as("snapshot_date"),
        coalesce(sw("margin_pool_id"), b("margin_pool_id")).as("margin_pool_id"),
        sw("supply_volume"), sw("withdraw_volume"), b("borrow_volume"))
    val v = swb.join(r,
      swb("snapshot_date") === r("snapshot_date") && swb("margin_pool_id") === r("margin_pool_id"),
      "full_outer")
      .select(
        coalesce(swb("snapshot_date"), r("snapshot_date")).as("snapshot_date"),
        coalesce(swb("margin_pool_id"), r("margin_pool_id")).as("margin_pool_id"),
        coalesce(swb("supply_volume"), lit(0.0)).as("supply_volume"),
        coalesce(swb("withdraw_volume"), lit(0.0)).as("withdraw_volume"),
        coalesce(swb("borrow_volume"), lit(0.0)).as("borrow_volume"),
        coalesce(r("repay_volume"), lit(0.0)).as("repay_volume"))

    // W1 + P8: last object mutation per (pool, day) (`:92-119`)
    val rankW = Window.partitionBy(col("margin_pool_id"), col("snapshot_date"))
      .orderBy(col("timestamp_ms").desc, col("version").desc)
    val p = ref("stg_deepbook_margin_pool_object")
      .filter(lookback(col("snapshot_date")))
      .select(col("snapshot_date"), col("margin_pool_id"), col("asset_type"),
        col("coin_symbol"), col("coin_decimals"),
        col("total_borrow_normalized"), col("total_supply_normalized"),
        col("utilization_rate"), col("available_liquidity_normalized"),
        col("active_positions_count"), col("timestamp_ms"), col("version"))
      .withColumn("rn", row_number().over(rankW))
      .filter(col("rn") === 1).drop("rn")
      .withColumnRenamed("version", "last_object_version")

    // W2: last price per (day, symbol) (`:121-135`)
    val priceW = Window.partitionBy(to_date(col("timestamp")), col("symbol"))
      .orderBy(col("timestamp").desc)
    val pr = ctx.sources("prices.day")
      .filter(col("blockchain") === "sui" && col("symbol").isin("SUI", "USDC", "DEEP"))
      .select(to_date(col("timestamp")).as("price_date"), col("symbol"),
        col("price").as("price_usd"),
        row_number().over(priceW).as("rn"))
      .filter(col("rn") === 1).drop("rn")

    // Stablecoin peg (`:150-153`): 1.0 for pegged symbols, else price or 0.
    val peg: Column =
      when(upper(p("coin_symbol")).isin(stablecoins.map(lit): _*), lit(1.0))
        .otherwise(coalesce(pr("price_usd"), lit(0.0)))
    def normVol(c: Column): Column = c / pow10(coalesce(p("coin_decimals"), lit(9)))

    // W3: day-over-day deltas (`:187-196`)
    val lagW = Window.partitionBy(p("margin_pool_id")).orderBy(p("snapshot_date"))
    def dod(c: Column): Column = c - lag(c, 1).over(lagW)

    p.join(v, v("snapshot_date") === p("snapshot_date") &&
        v("margin_pool_id") === p("margin_pool_id"), "left")
      .join(pr, pr("price_date") === p("snapshot_date") &&
        upper(pr("symbol")) === upper(p("coin_symbol")), "left")
      .select(
        p("snapshot_date"), p("margin_pool_id"), p("coin_symbol"),
        p("total_supply_normalized"), p("total_borrow_normalized"),
        p("available_liquidity_normalized"), p("utilization_rate"),
        p("active_positions_count"),
        peg.as("price_usd"),
        (p("total_supply_normalized") * peg).as("total_supply_usd"),
        (p("total_borrow_normalized") * peg).as("total_borrow_usd"),
        normVol(coalesce(v("supply_volume"), lit(0.0))).as("daily_supply_volume"),
        normVol(coalesce(v("withdraw_volume"), lit(0.0))).as("daily_withdraw_volume"),
        normVol(coalesce(v("borrow_volume"), lit(0.0))).as("daily_borrow_volume"),
        normVol(coalesce(v("repay_volume"), lit(0.0))).as("daily_repay_volume"),
        (normVol(coalesce(v("supply_volume"), lit(0.0))) * peg).as("daily_supply_volume_usd"),
        (normVol(coalesce(v("withdraw_volume"), lit(0.0))) * peg).as("daily_withdraw_volume_usd"),
        (normVol(coalesce(v("borrow_volume"), lit(0.0))) * peg).as("daily_borrow_volume_usd"),
        (normVol(coalesce(v("repay_volume"), lit(0.0))) * peg).as("daily_repay_volume_usd"),
        dod(p("total_supply_normalized")).as("daily_supply_change"),
        dod(p("total_borrow_normalized")).as("daily_borrow_change"),
        dod(p("utilization_rate")).as("daily_utilization_change"),
        p("asset_type"),
        lit(java.sql.Timestamp.from(ctx.now)).as("updated_at"))
      // O1 (`:210`)
      .orderBy(col("snapshot_date").desc, col("total_supply_normalized").desc_nulls_last)
  }
}
