package graft.models

import graft.{CoinMetadata, TrinoFns}
import graft.TrinoFns._
import graft.incremental.{Model, RunContext, RunMode}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** `stg_deepbook_margin_pool_object` — margin-pool object state flattened
  * from `sui.objects` and joined to the coin-metadata seed
  * (`models/deepbook_margin/objects/stg_deepbook_margin_pool_object.sql`).
  *
  * Grain: one row per object mutation (version change); merges on
  * (object_id, version) (`:1-8`).
  */
object PoolObjectStg extends Model {

  val name = "stg_deepbook_margin_pool_object"
  val uniqueKey: Seq[String] = Seq("object_id", "version")
  /** An (object_id, version) pair has a fixed timestamp ⇒ partition-stable. */
  override val partitionDate: Option[Column] = Some(col("snapshot_date"))

  private val typePrefix = s"${EventModels.pkg}::margin_pool::MarginPool<"

  /** `$..` extraction spec: (output column, path, cast target or None).
    * `private[graft]` so the DAG oracle SQL is generated from the same
    * metadata (no spec drift between engine and oracle). */
  private[graft] val jsonFields: Seq[(String, String, Option[DataType])] = Seq(
    ("margin_pool_id", "$.id.id", None),
    ("total_borrow", "$.state.total_borrow", Some(DoubleType)),
    ("total_supply", "$.state.total_supply", Some(DoubleType)),
    ("borrow_shares", "$.state.borrow_shares", Some(DoubleType)),
    ("supply_shares", "$.state.supply_shares", Some(DoubleType)),
    ("last_update_timestamp_ms", "$.state.last_update_timestamp", Some(LongType)),
    ("vault_balance", "$.vault", Some(DoubleType)),
    ("fees_per_share", "$.protocol_fees.fees_per_share", Some(DoubleType)),
    ("maintainer_fees", "$.protocol_fees.maintainer_fees", Some(DoubleType)),
    ("protocol_fees", "$.protocol_fees.protocol_fees", Some(DoubleType)),
    ("protocol_fee_total_shares", "$.protocol_fees.total_shares", Some(DoubleType)),
    ("referrals_count", "$.protocol_fees.referrals.size", Some(LongType)),
    ("active_positions_count", "$.positions.positions.size", Some(LongType)),
    ("positions_table_id", "$.positions.positions.id.id", None),
    ("interest_base_rate", "$.config.interest_config.base_rate", Some(DoubleType)),
    ("interest_base_slope", "$.config.interest_config.base_slope", Some(DoubleType)),
    ("interest_excess_slope", "$.config.interest_config.excess_slope", Some(DoubleType)),
    ("interest_optimal_utilization", "$.config.interest_config.optimal_utilization", Some(DoubleType)),
    ("max_utilization_rate", "$.config.margin_pool_config.max_utilization_rate", Some(DoubleType)),
    ("min_borrow", "$.config.margin_pool_config.min_borrow", Some(DoubleType)),
    ("protocol_spread", "$.config.margin_pool_config.protocol_spread", Some(DoubleType)),
    ("supply_cap", "$.config.margin_pool_config.supply_cap", Some(DoubleType)),
    ("rate_limit_enabled", "$.config.margin_pool_config.rate_limit_enabled", Some(BooleanType)),
    ("rate_limit_capacity", "$.config.margin_pool_config.rate_limit_capacity", Some(DoubleType)),
    ("rate_limiter_available", "$.rate_limiter.available", Some(DoubleType)),
    ("rate_limiter_capacity", "$.rate_limiter.capacity", Some(DoubleType)),
    ("rate_limiter_enabled", "$.rate_limiter.enabled", Some(BooleanType)),
    ("rate_limiter_last_updated_ms", "$.rate_limiter.last_updated_ms", Some(LongType)))

  def build(ctx: RunContext, existing: Option[DataFrame],
            ref: String => DataFrame): DataFrame = {
    val objects = ctx.sources("sui.objects")

    // P2 + P3/P4 (`stg_...object.sql:94-101`)
    val bound: Column = (ctx.mode, existing) match {
      case (RunMode.Incremental, Some(prev)) =>
        val hwm = prev.agg(coalesce(max(col("timestamp_ms")), lit(0L))).head().getLong(0)
        col("timestamp_ms") >= lit(hwm)
      case _ =>
        col("timestamp_ms") >= lit(backfillBoundMs(ctx.now, ctx.backfillDays))
    }

    val extracted = jsonFields.map { case (n, path, castTo) =>
      val scalar = jsonScalar(col("object_json"), path)
      castTo.fold(scalar)(scalar.try_cast).as(n)
    }

    // P9: wide flatten (`stg_...object.sql:36-92`)
    val m = objects
      .filter(col("type_").like(typePrefix + "%") && bound)
      .select(Seq(
        col("object_id").cast(StringType).as("object_id"),
        col("version"),
        col("type_").as("type"),
        col("object_status"),
        col("timestamp_ms"),
        regexpExtractNullable(col("type_"), "<(.+)>$", 1).as("asset_type"),
        jsonFormatExtract(col("object_json"), "$.allowed_deepbook_pools.contents")
          .as("allowed_deepbook_pools_json")) ++ extracted: _*)

    // J1: broadcast seed join with CASE-canonicalized key (`:202-209`)
    val cm = broadcast(CoinMetadata.seed(ctx.spark))
    val joined = m.join(cm,
      CoinMetadata.canonicalCoinType(m("asset_type")) === cm("coin_type"), "left")

    // P10: derived metrics (`:104-200`)
    joined.select(
      m("timestamp_ms"),
      msToTs(m("timestamp_ms")).as("block_timestamp"),
      msToDate(m("timestamp_ms")).as("snapshot_date"),
      m("object_id"), m("version"), m("type"), m("object_status"),
      m("margin_pool_id"), m("asset_type"),
      coalesce(cm("coin_symbol"), lit("UNKNOWN")).as("coin_symbol"),
      coalesce(cm("coin_decimals"), lit(9)).as("coin_decimals"),
      coalesce(cm("coin_name"), lit("Unknown")).as("coin_name"),
      m("total_borrow"), m("total_supply"), m("borrow_shares"), m("supply_shares"),
      m("last_update_timestamp_ms"),
      msToTs(m("last_update_timestamp_ms")).as("last_update_timestamp"),
      m("vault_balance"),
      TrinoFns.normalize(m("total_borrow"), cm("coin_decimals")).as("total_borrow_normalized"),
      TrinoFns.normalize(m("total_supply"), cm("coin_decimals")).as("total_supply_normalized"),
      TrinoFns.normalize(m("vault_balance"), cm("coin_decimals")).as("vault_balance_normalized"),
      ratioOrNull(m("total_supply"), m("supply_shares")).as("supply_share_price"),
      ratioOrNull(m("total_borrow"), m("borrow_shares")).as("borrow_share_price"),
      // else-0, NOT else-NULL (`:154-157`; SURVEY.md §7.5 #5)
      ratioOrZero(m("total_borrow"), m("total_supply")).as("utilization_rate"),
      (m("total_supply") - m("total_borrow")).as("available_liquidity"),
      TrinoFns.normalize(m("total_supply") - m("total_borrow"), cm("coin_decimals"))
        .as("available_liquidity_normalized"),
      m("fees_per_share"), m("maintainer_fees"), m("protocol_fees"),
      m("protocol_fee_total_shares"), m("referrals_count"),
      m("active_positions_count"), m("positions_table_id"),
      m("interest_base_rate"), m("interest_base_slope"),
      m("interest_excess_slope"), m("interest_optimal_utilization"),
      m("max_utilization_rate"), m("min_borrow"), m("protocol_spread"),
      m("supply_cap"), m("rate_limit_enabled"), m("rate_limit_capacity"),
      m("rate_limiter_available"), m("rate_limiter_capacity"),
      m("rate_limiter_enabled"), m("rate_limiter_last_updated_ms"),
      msToTs(m("rate_limiter_last_updated_ms")).as("rate_limiter_last_updated_timestamp"),
      m("allowed_deepbook_pools_json"),
      lit(java.sql.Timestamp.from(ctx.now)).as("updated_at"))
  }
}
