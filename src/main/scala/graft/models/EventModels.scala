package graft.models

import graft.TrinoFns._
import graft.incremental.{Model, RunContext, RunMode}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The five incremental event extractors
  * (the five files under `models/deepbook_margin/events/`), expressed as one parameterized
  * model: scan `sui.events`, filter to a single `event_type` constant (P1),
  * bound the scan by watermark / 30-day backfill (P3/P4), flatten the JSON
  * payload into typed scalars (P9, F1, F3), and stamp `updated_at` (F7).
  *
  * Each instance merges on (transaction_digest, event_index)
  * (`deepbook_margin_loan_borrowed.sql:1-8`).
  */
object EventModels {

  val pkg = "0x97d9473771b01f77b0940c589484184b49f6444627ec121314fae6a6d36fb86b"

  /** One extracted column: name, JSONPath into event_json, and the type
    * it is try_cast to (None ⇒ raw string scalar). */
  final case class Field(name: String, path: String, castTo: Option[DataType] = None)

  final case class EventModel(name: String, eventType: String, fields: Seq[Field])
      extends Model {
    val uniqueKey: Seq[String] = Seq("transaction_digest", "event_index")
    /** Daily snapshot partitions — a key's timestamp is immutable, so
      * re-delivered duplicates always land in the same partition. */
    override val partitionDate: Option[Column] = Some(msToDate(col("timestamp_ms")))

    /** P1 + P9: the type filter and JSON flatten, shared verbatim by the
      * batch build and the Structured Streaming ingest (the expressions
      * are stateless, so the same plan runs over a streaming source). */
    def project(events: DataFrame, now: java.time.Instant): DataFrame = {
      val raw = events
        .filter(col("event_type") === lit(eventType))
        .select("transaction_digest", "event_index", "timestamp_ms",
          "sender", "event_type", "event_json")
      val extracted = fields.map { f =>
        val scalar = jsonScalar(col("event_json"), f.path)
        f.castTo.fold(scalar)(scalar.try_cast).as(f.name)
      }
      raw.select(
        Seq(col("transaction_digest"), col("event_index"), col("timestamp_ms"),
          col("sender"), col("event_type")) ++ extracted :+
          lit(java.sql.Timestamp.from(now)).as("updated_at"): _*)
    }

    def build(ctx: RunContext, existing: Option[DataFrame],
              ref: String => DataFrame): DataFrame = {
      val events = ctx.sources("sui.events")
      // P3 / P4: inclusive watermark on prior materialization, else a
      // 30-day cold-start bound (`deepbook_margin_loan_borrowed.sql:20-25`).
      val bound: Column = (ctx.mode, existing) match {
        case (RunMode.Incremental, Some(prev)) =>
          val hwm = prev.agg(coalesce(max(col("timestamp_ms")), lit(0L)))
            .head().getLong(0)
          col("timestamp_ms") >= lit(hwm)
        case _ =>
          col("timestamp_ms") >= lit(backfillBoundMs(ctx.now, ctx.backfillDays))
      }
      project(events.filter(bound), ctx.now)
    }
  }

  /** `deepbook_margin_loan_borrowed.sql:28-40` */
  val loanBorrowed: EventModel = EventModel(
    "deepbook_margin_loan_borrowed",
    s"$pkg::margin_manager::LoanBorrowedEvent",
    Seq(
      Field("loan_amount", "$.loan_amount", Some(DoubleType)),
      Field("loan_shares", "$.loan_shares", Some(DoubleType)),
      Field("margin_manager_id", "$.margin_manager_id"),
      Field("margin_pool_id", "$.margin_pool_id"),
      Field("event_timestamp", "$.timestamp", Some(LongType))))

  /** `deepbook_margin_loan_repaid.sql:28-41` */
  val loanRepaid: EventModel = EventModel(
    "deepbook_margin_loan_repaid",
    s"$pkg::margin_manager::LoanRepaidEvent",
    Seq(
      Field("margin_manager_id", "$.margin_manager_id"),
      Field("margin_pool_id", "$.margin_pool_id"),
      Field("repay_amount", "$.repay_amount", Some(DoubleType)),
      Field("repay_shares", "$.repay_shares", Some(DoubleType)),
      Field("event_timestamp", "$.timestamp", Some(LongType))))

  /** `deepbook_margin_deposit_collateral.sql:28-41` — nested `$.asset.name`. */
  val depositCollateral: EventModel = EventModel(
    "deepbook_margin_deposit_collateral",
    s"$pkg::margin_manager::DepositCollateralEvent",
    Seq(
      Field("amount", "$.amount", Some(DoubleType)),
      Field("asset_name", "$.asset.name"),
      Field("margin_manager_id", "$.margin_manager_id"),
      Field("pyth_decimals", "$.pyth_decimals", Some(LongType)),
      Field("pyth_price", "$.pyth_price", Some(DoubleType)),
      Field("event_timestamp", "$.timestamp", Some(LongType))))

  /** `deepbook_margin_pool_asset_supplied.sql:30-43` — nested `$.asset_type.name`. */
  val assetSupplied: EventModel = EventModel(
    "deepbook_margin_pool_asset_supplied",
    s"$pkg::margin_pool::AssetSupplied",
    Seq(
      Field("margin_pool_id", "$.margin_pool_id"),
      Field("supplier_cap_id", "$.supplier_cap_id"),
      Field("asset_type", "$.asset_type.name"),
      Field("supply_amount", "$.supply_amount", Some(DoubleType)),
      Field("supply_shares", "$.supply_shares", Some(DoubleType)),
      Field("event_timestamp", "$.timestamp", Some(LongType))))

  /** `deepbook_margin_pool_asset_withdrawn.sql:30-43` */
  val assetWithdrawn: EventModel = EventModel(
    "deepbook_margin_pool_asset_withdrawn",
    s"$pkg::margin_pool::AssetWithdrawn",
    Seq(
      Field("margin_pool_id", "$.margin_pool_id"),
      Field("supplier_cap_id", "$.supplier_cap_id"),
      Field("asset_type", "$.asset_type.name"),
      Field("withdraw_amount", "$.withdraw_amount", Some(DoubleType)),
      Field("withdraw_shares", "$.withdraw_shares", Some(DoubleType)),
      Field("event_timestamp", "$.timestamp", Some(LongType))))

  val all: Seq[EventModel] =
    Seq(loanBorrowed, loanRepaid, depositCollateral, assetSupplied, assetWithdrawn)
}
