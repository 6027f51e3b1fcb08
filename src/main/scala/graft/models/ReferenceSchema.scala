package graft.models

import graft.incremental.DataTests.DataTest
import graft.incremental.DataTests.DataTest._

/** The reference's `schema.yml` test declarations as data
  * (`models/deepbook_margin/schema.yml` — `not_null` on the event models'
  * key/timestamp/amount columns `:14-32,36-53,55-72` etc., on the stg
  * model's `(object_id, version)` `:138-146`, and on the fct model's
  * `(snapshot_date, margin_pool_id)` `:176-184`), plus the uniqueness and
  * referential tests those models' own config blocks imply:
  *
  *  - every incremental model declares a merge `unique_key`
  *    (`deepbook_margin_loan_borrowed.sql:1-8` `[transaction_digest,
  *    event_index]`, `stg_..._pool_object.sql:1-8` `[object_id, version]`,
  *    `fct_..._pool_daily.sql:1-8` `[margin_pool_id, snapshot_date]`) —
  *    a composite-unique test per model pins the assumption the MERGE
  *    relies on;
  *  - the fct's `margin_pool_id` comes from the stg model
  *    (`fct_deepbook_margin_pool_daily.sql` `ref()` join), so a
  *    `relationships` test pins the lineage, and its `coin_symbol` is the
  *    seed's closed vocabulary + the `'UNKNOWN'` default
  *    (`stg_..._pool_object.sql:102`) — an `accepted_values` test.
  *
  * [[auditSuite]] extends the declared surface with `not_null` on every
  * JSON-extracted event column — the columns schema.yml deliberately does
  * NOT protect, where the fixtures plant malformed numerics (TRY_CAST →
  * NULL). Their failure counts are nonzero by construction, so the
  * `dag_data_tests` gate pins real counting, not an all-zeros vacuity.
  */
object ReferenceSchema {

  private val eventKeyCols = Seq("transaction_digest", "event_index", "timestamp_ms")

  private def eventDeclared(m: EventModels.EventModel): Seq[DataTest] = {
    val extra: Seq[String] = m.name match {
      case "deepbook_margin_deposit_collateral" => Seq("margin_manager_id", "amount")
      case "deepbook_margin_loan_borrowed"      => Seq("loan_amount")
      case _                                    => Nil
    }
    (eventKeyCols ++ extra).map(NotNull.apply) :+
      Unique(Seq("transaction_digest", "event_index"))
  }

  /** One entry per model, ordered as the DAG builds them. */
  val suite: Seq[(String, Seq[DataTest])] =
    EventModels.all.map(m => m.name -> eventDeclared(m)) ++ Seq(
      PoolObjectStg.name -> Seq(
        NotNull("object_id"), NotNull("version"),
        Unique(Seq("object_id", "version"))),
      PoolDailyFct.name -> Seq(
        NotNull("snapshot_date"), NotNull("margin_pool_id"),
        Unique(Seq("margin_pool_id", "snapshot_date")),
        AcceptedValues("coin_symbol", Seq("SUI", "USDC", "DEEP", "UNKNOWN")),
        Relationships("margin_pool_id", PoolObjectStg.name, "margin_pool_id")))

  /** The declared suite ∪ `not_null` on every extracted event column not
    * already covered — the nonzero-count rows of the gate. */
  val auditSuite: Seq[(String, Seq[DataTest])] = suite.map { case (name, declared) =>
    val covered = declared.collect { case NotNull(c) => c }.toSet
    val audit: Seq[DataTest] = EventModels.all.find(_.name == name) match {
      case Some(m) => m.fields.map(_.name).filterNot(covered).map(NotNull.apply)
      case None    => Nil
    }
    name -> (declared ++ audit)
  }
}
