package graft.queries

import graft.CoinMetadata
import graft.TrinoFns
import graft.fixtures.DeepbookFixtures
import graft.incremental.DataTests.DataTest
import graft.models.{EventModels, PoolDailyFct, PoolObjectStg, ReferenceSchema}
import org.apache.spark.sql.types._

/** DuckDB oracle SQL for [[DagQueries]] — independent re-computation of
  * every DeepBook model from the raw fixture parquet, translated from the
  * reference SQL under `models/deepbook_margin/`. Extraction specs are
  * generated from the SAME metadata the Spark models use
  * ([[EventModels.EventModel.fields]], [[PoolObjectStg.jsonFields]]), so
  * the two sides cannot drift.
  *
  * All fixture numerics are integer-valued ⇒ double sums are exact and
  * order-independent; ratios/products are single IEEE ops identical across
  * engines — no rounding needed anywhere.
  */
object DagOracles {

  private val fix = DeepbookFixtures.fixturesDir
  private val pkg = EventModels.pkg
  private val bound = TrinoFns.backfillBoundMs(DeepbookFixtures.now, 30)

  private val eventsSrc = s"read_parquet('$fix/sui_events.parquet/*.parquet')"
  private val objectsSrc = s"read_parquet('$fix/sui_objects.parquet/*.parquet')"
  private val pricesSrc = s"read_parquet('$fix/prices_day.parquet/*.parquet')"

  private def duckType(t: DataType): String = t match {
    case DoubleType  => "DOUBLE"
    case LongType    => "BIGINT"
    case BooleanType => "BOOLEAN"
    case other       => sys.error(s"no duck type mapping for $other")
  }

  private def extract(json: String, path: String, cast: Option[DataType], as: String): String =
    cast match {
      case Some(t) => s"TRY_CAST(json_extract_string($json, '$path') AS ${duckType(t)}) AS $as"
      case None    => s"json_extract_string($json, '$path') AS $as"
    }

  /** `date(from_unixtime(ms/1000))` with Trino integer division (F5+F8). */
  private def msToDate(ms: String): String =
    s"CAST(make_timestamp(($ms // 1000) * 1000000) AS DATE)"

  // ---- event models (P1 + P3/P4 + P9 + F1/F3) ------------------------------

  /** Model body minus ORDER BY, shared by the standalone oracle and the
    * fct CTEs. */
  private def eventBody(m: EventModels.EventModel): String = {
    val ex = m.fields.map(f => extract("event_json", f.path, f.castTo, f.name))
      .mkString(",\n             ")
    s"""SELECT transaction_digest, event_index, timestamp_ms, sender, event_type,
       |             $ex
       |      FROM $eventsSrc
       |      WHERE event_type = '${m.eventType}' AND timestamp_ms >= $bound""".stripMargin
  }

  /** `dag_bloom_lookup`: the loan_borrowed body filtered to its minimum
    * digest — what the bloom-skipping point lookup must return. */
  private def bloomLookupOracle: String = {
    val body = eventBody(EventModels.loanBorrowed)
    s"""WITH b AS (
       |        $body)
       |      SELECT * FROM b
       |      WHERE transaction_digest = (SELECT min(transaction_digest) FROM b)
       |      ORDER BY transaction_digest, event_index""".stripMargin
  }

  private def eventOracle(m: EventModels.EventModel): String =
    s"""${eventBody(m)}
       |      ORDER BY transaction_digest, event_index""".stripMargin

  // ---- stg model (P2 + P9 + J1 + P10) --------------------------------------

  private val seedValues = CoinMetadata.coins
    .map(c => s"('${c.coin_type}', '${c.coin_symbol}', ${c.coin_decimals}, '${c.coin_name}')")
    .mkString(",\n        ")

  private val stgExtracts = PoolObjectStg.jsonFields
    .map { case (n, p, t) => extract("object_json", p, t, n) }
    .mkString(",\n               ")

  private val canonKey =
    s"CASE WHEN m.asset_type = '${CoinMetadata.suiShortForm}' " +
      s"THEN '${CoinMetadata.suiLongForm}' ELSE m.asset_type END"

  private def norm(x: String): String =
    s"CASE WHEN s.coin_decimals IS NOT NULL THEN ($x) / power(10, s.coin_decimals) END"

  /** stg body minus ORDER BY (reused as the fct `stg` CTE). */
  private val stgBody =
    s"""WITH seed(coin_type, coin_symbol, coin_decimals, coin_name) AS (VALUES
       |        $seedValues),
       |      m AS (
       |        SELECT CAST(object_id AS VARCHAR) AS object_id, version, type_ AS type,
       |               object_status, timestamp_ms,
       |               NULLIF(regexp_extract(type_, '<(.+)>$$', 1), '') AS asset_type,
       |               json_extract_string(object_json, '$$.allowed_deepbook_pools.contents')
       |                 AS allowed_deepbook_pools_json,
       |               $stgExtracts
       |        FROM $objectsSrc
       |        WHERE type_ LIKE '$pkg::margin_pool::MarginPool<%'
       |          AND timestamp_ms >= $bound)
       |      SELECT m.timestamp_ms,
       |             ${msToDate("m.timestamp_ms")} AS snapshot_date,
       |             m.object_id, m.version, m.type, m.object_status,
       |             m.margin_pool_id, m.asset_type,
       |             coalesce(s.coin_symbol, 'UNKNOWN') AS coin_symbol,
       |             coalesce(s.coin_decimals, 9) AS coin_decimals,
       |             coalesce(s.coin_name, 'Unknown') AS coin_name,
       |             m.total_borrow, m.total_supply, m.borrow_shares, m.supply_shares,
       |             m.last_update_timestamp_ms, m.vault_balance,
       |             ${norm("m.total_borrow")} AS total_borrow_normalized,
       |             ${norm("m.total_supply")} AS total_supply_normalized,
       |             ${norm("m.vault_balance")} AS vault_balance_normalized,
       |             CASE WHEN m.supply_shares > 0 THEN m.total_supply / m.supply_shares END
       |               AS supply_share_price,
       |             CASE WHEN m.borrow_shares > 0 THEN m.total_borrow / m.borrow_shares END
       |               AS borrow_share_price,
       |             CASE WHEN m.total_supply > 0 THEN m.total_borrow / m.total_supply
       |                  ELSE 0.0 END AS utilization_rate,
       |             m.total_supply - m.total_borrow AS available_liquidity,
       |             ${norm("m.total_supply - m.total_borrow")} AS available_liquidity_normalized,
       |             m.fees_per_share, m.maintainer_fees, m.protocol_fees,
       |             m.protocol_fee_total_shares, m.referrals_count,
       |             m.active_positions_count, m.positions_table_id,
       |             m.interest_base_rate, m.interest_base_slope,
       |             m.interest_excess_slope, m.interest_optimal_utilization,
       |             m.max_utilization_rate, m.min_borrow, m.protocol_spread,
       |             m.supply_cap, m.rate_limit_enabled, m.rate_limit_capacity,
       |             m.rate_limiter_available, m.rate_limiter_capacity,
       |             m.rate_limiter_enabled, m.rate_limiter_last_updated_ms,
       |             m.allowed_deepbook_pools_json
       |      FROM m LEFT JOIN seed s ON ($canonKey) = s.coin_type""".stripMargin

  private val stgOracle = s"$stgBody\n      ORDER BY m.object_id, m.version"

  // ---- fct model (A1×4 + J2 FOJ + W1/W2 + J3/J4 + W3 + O1) -----------------

  private val pegSql =
    "CASE WHEN upper(p.coin_symbol) IN ('USDC','USDT','AUSD') THEN 1.0 " +
      "ELSE coalesce(pr.price_usd, 0.0) END"

  private def volCte(alias: String, body: String, amount: String, out: String): String =
    s"""$alias AS (
       |        SELECT ${msToDate("timestamp_ms")} AS snapshot_date, margin_pool_id,
       |               sum($amount) AS $out
       |        FROM ($body) GROUP BY 1, 2)""".stripMargin

  private def normVol(v: String): String =
    s"coalesce($v, 0.0) / power(10, coalesce(p.coin_decimals, 9))"

  private def dod(x: String): String =
    s"$x - lag($x) OVER (PARTITION BY p.margin_pool_id ORDER BY p.snapshot_date)"

  private def fctOracle(includeLags: Boolean) = {
    val lagSelect = if (includeLags)
      s"""${dod("p.total_supply_normalized")} AS daily_supply_change,
         |             ${dod("p.total_borrow_normalized")} AS daily_borrow_change,
         |             ${dod("p.utilization_rate")} AS daily_utilization_change,
         |             """.stripMargin
    else ""
    val sup = eventBody(EventModels.assetSupplied)
    val wdr = eventBody(EventModels.assetWithdrawn)
    val bor = eventBody(EventModels.loanBorrowed)
    val rep = eventBody(EventModels.loanRepaid)
    s"""WITH
       |      ${volCte("sv", sup, "supply_amount", "supply_volume")},
       |      ${volCte("wv", wdr, "withdraw_amount", "withdraw_volume")},
       |      ${volCte("bv", bor, "loan_amount", "borrow_volume")},
       |      ${volCte("rv", rep, "repay_amount", "repay_volume")},
       |      v AS (
       |        SELECT
       |          coalesce(sv.snapshot_date, wv.snapshot_date, bv.snapshot_date, rv.snapshot_date)
       |            AS snapshot_date,
       |          coalesce(sv.margin_pool_id, wv.margin_pool_id, bv.margin_pool_id, rv.margin_pool_id)
       |            AS margin_pool_id,
       |          coalesce(sv.supply_volume, 0.0) AS supply_volume,
       |          coalesce(wv.withdraw_volume, 0.0) AS withdraw_volume,
       |          coalesce(bv.borrow_volume, 0.0) AS borrow_volume,
       |          coalesce(rv.repay_volume, 0.0) AS repay_volume
       |        FROM sv
       |        FULL OUTER JOIN wv ON sv.snapshot_date = wv.snapshot_date
       |                          AND sv.margin_pool_id = wv.margin_pool_id
       |        FULL OUTER JOIN bv ON coalesce(sv.snapshot_date, wv.snapshot_date) = bv.snapshot_date
       |                          AND coalesce(sv.margin_pool_id, wv.margin_pool_id) = bv.margin_pool_id
       |        FULL OUTER JOIN rv ON coalesce(sv.snapshot_date, wv.snapshot_date, bv.snapshot_date) = rv.snapshot_date
       |                          AND coalesce(sv.margin_pool_id, wv.margin_pool_id, bv.margin_pool_id) = rv.margin_pool_id),
       |      stg AS ($stgBody),
       |      p AS (
       |        SELECT * EXCLUDE (rn) FROM (
       |          SELECT snapshot_date, margin_pool_id, asset_type, coin_symbol, coin_decimals,
       |                 total_borrow_normalized, total_supply_normalized, utilization_rate,
       |                 available_liquidity_normalized, active_positions_count, timestamp_ms,
       |                 version AS last_object_version,
       |                 row_number() OVER (PARTITION BY margin_pool_id, snapshot_date
       |                                    ORDER BY timestamp_ms DESC, version DESC) AS rn
       |          FROM stg) x WHERE rn = 1),
       |      pr AS (
       |        SELECT * EXCLUDE (rn) FROM (
       |          SELECT CAST("timestamp" AS DATE) AS price_date, symbol, price AS price_usd,
       |                 row_number() OVER (PARTITION BY CAST("timestamp" AS DATE), symbol
       |                                    ORDER BY "timestamp" DESC) AS rn
       |          FROM $pricesSrc
       |          WHERE blockchain = 'sui' AND symbol IN ('SUI','USDC','DEEP')) x
       |        WHERE rn = 1)
       |      SELECT p.snapshot_date, p.margin_pool_id, p.coin_symbol,
       |             p.total_supply_normalized, p.total_borrow_normalized,
       |             p.available_liquidity_normalized, p.utilization_rate,
       |             p.active_positions_count,
       |             $pegSql AS price_usd,
       |             p.total_supply_normalized * ($pegSql) AS total_supply_usd,
       |             p.total_borrow_normalized * ($pegSql) AS total_borrow_usd,
       |             ${normVol("v.supply_volume")} AS daily_supply_volume,
       |             ${normVol("v.withdraw_volume")} AS daily_withdraw_volume,
       |             ${normVol("v.borrow_volume")} AS daily_borrow_volume,
       |             ${normVol("v.repay_volume")} AS daily_repay_volume,
       |             (${normVol("v.supply_volume")}) * ($pegSql) AS daily_supply_volume_usd,
       |             (${normVol("v.withdraw_volume")}) * ($pegSql) AS daily_withdraw_volume_usd,
       |             (${normVol("v.borrow_volume")}) * ($pegSql) AS daily_borrow_volume_usd,
       |             (${normVol("v.repay_volume")}) * ($pegSql) AS daily_repay_volume_usd,
       |             ${lagSelect}p.asset_type
       |      FROM p
       |      LEFT JOIN v ON v.snapshot_date = p.snapshot_date
       |                 AND v.margin_pool_id = p.margin_pool_id
       |      LEFT JOIN pr ON pr.price_date = p.snapshot_date
       |                  AND upper(pr.symbol) = upper(p.coin_symbol)
       |      ORDER BY p.snapshot_date, p.margin_pool_id""".stripMargin
  }

  // ---- data tests (E2: dbt test) -------------------------------------------

  /** `dag_data_tests` oracle: each model body becomes one CTE (referenced
    * by every test on it — DuckDB evaluates shared CTEs once), and the
    * suite compiles to the same per-test counting SQL dbt would generate:
    * `count(*) FILTER (WHERE col IS NULL)` for not_null, a
    * `GROUP BY ... HAVING count(*) > 1` subquery count for unique, a
    * `NOT IN`-filtered DISTINCT-value count for accepted_values (NULLs
    * never fail — SQL three-valued logic, both engines; distinct values,
    * not rows, is what dbt's compiled GROUP BY test counts), and a
    * `NOT EXISTS` anti-join row
    * count for relationships. Generated from the SAME
    * [[ReferenceSchema.auditSuite]] the Spark side runs, so the two
    * suites cannot drift. */
  private def dataTestsOracle: String = {
    val bodies: Seq[(String, String)] =
      EventModels.all.map(m => m.name -> eventBody(m)) ++ Seq(
        PoolObjectStg.name -> stgBody,
        PoolDailyFct.name -> fctOracle(includeLags = true))
    val cte = bodies.map { case (n, _) => n -> s"t_$n" }.toMap
    val ctes = bodies.map { case (n, b) => s"${cte(n)} AS (\n$b)" }
      .mkString(",\n      ")
    def testSql(model: String, t: DataTest): String = {
      val from = cte(model)
      def row(label: String, test: String, cnt: String) =
        s"SELECT '$model' AS model, '$label' AS column_name, '$test' AS test, $cnt AS failures"
      t match {
        case DataTest.NotNull(c) =>
          s"${row(c, "not_null", s"count(*) FILTER (WHERE $c IS NULL)")} FROM $from"
        case DataTest.Unique(cols) =>
          val nullGuard =
            if (cols.size == 1) s" WHERE ${cols.head} IS NOT NULL" else ""
          s"""${row(cols.mkString(","), "unique", "count(*)")} FROM (
             |          SELECT 1 AS one FROM $from$nullGuard
             |          GROUP BY ${cols.mkString(", ")} HAVING count(*) > 1)""".stripMargin
        case DataTest.AcceptedValues(c, vs) =>
          // dbt parity: distinct offending VALUES (the compiled test
          // groups violators by the column and counts resulting rows)
          val list = vs.map(v => s"'$v'").mkString(", ")
          s"${row(c, "accepted_values",
            s"count(DISTINCT $c) FILTER (WHERE $c NOT IN ($list))")} FROM $from"
        case DataTest.Relationships(c, toModel, toCol) =>
          s"""${row(c, "relationships", "count(*)")} FROM $from c
             |        WHERE c.$c IS NOT NULL AND NOT EXISTS (
             |          SELECT 1 FROM ${cte(toModel)} p WHERE p.$toCol = c.$c)""".stripMargin
      }
    }
    val unioned = ReferenceSchema.auditSuite.flatMap { case (m, tests) =>
      tests.map(testSql(m, _))
    }.mkString("\n        UNION ALL\n        ")
    s"""WITH $ctes
       |      SELECT model, column_name, test, failures, failures = 0 AS pass
       |      FROM (
       |        $unioned)
       |      ORDER BY model, test, column_name""".stripMargin
  }

  val all: Map[String, String] =
    EventModels.all.map(m =>
      s"dag_${m.name.stripPrefix("deepbook_margin_")}" -> eventOracle(m)).toMap ++
      Map(
        "dag_stg_pool_object" -> stgOracle,
        "dag_data_tests" -> dataTestsOracle,
        // insert_overwrite converges to the clean full model — the model's
        // own oracle IS the gate (a merge would keep the planted stale row
        // and break the hash)
        "dag_insert_overwrite" -> eventOracle(EventModels.loanBorrowed),
        // microbatch windows converge to the clean full model too
        "dag_microbatch" -> eventOracle(EventModels.loanBorrowed),
        // the CDC-synced derived table = the producer's post-delete state
        "dag_cdc_apply" -> {
          val day3 = java.time.Instant.parse("2026-01-03T00:00:00Z").toEpochMilli
          s"""SELECT * FROM (${eventBody(EventModels.loanBorrowed)}) b
             |      WHERE timestamp_ms >= $day3
             |      ORDER BY transaction_digest, event_index""".stripMargin
        },
        // source freshness = max(loaded_at) age vs the declared horizons,
        // the same strictly-greater CASE on both sides
        "dag_source_freshness" -> {
          val nowMs = DeepbookFixtures.now.toEpochMilli
          val day = 86400000L
          def row(name: String, src: String, loadedAt: String,
                  warn: Long, err: Long) =
            s"""SELECT '$name' AS source_name, max($loadedAt) AS max_loaded_at_ms,
               |       $nowMs - max($loadedAt) AS age_ms,
               |       CASE WHEN max($loadedAt) IS NULL
               |              OR $nowMs - max($loadedAt) > $err THEN 'error'
               |            WHEN $nowMs - max($loadedAt) > $warn THEN 'warn'
               |            ELSE 'pass' END AS status
               |      FROM $src""".stripMargin
          Seq(
            row("prices.day", pricesSrc, "epoch_ms(\"timestamp\")", day, 3 * day),
            row("sui.events", eventsSrc, "timestamp_ms", 7 * day, 14 * day),
            row("sui.objects", objectsSrc, "timestamp_ms", 3 * day, 14 * day))
            .mkString("", "\n      UNION ALL\n      ", "\n      ORDER BY source_name")
        },
        // drift audit = the same volume/null/NDV metrics over the two
        // declarative states, flags by integer cross-multiplication
        "dag_drift_audit" -> {
          val cols = DagQueries.DriftAuditCols
          def prof(src: String, sfx: String) = cols.map { c =>
            s"""SELECT '$c' AS column_name, count(*) AS n_$sfx,
               |       count(*) FILTER (WHERE $c IS NULL) AS nulls_$sfx,
               |       count(DISTINCT $c) AS ndv_$sfx FROM $src""".stripMargin
          }.mkString("\n        UNION ALL\n        ")
          s"""WITH full_t AS (${eventBody(EventModels.loanRepaid)}),
             |      prev_t AS (SELECT * FROM full_t
             |                 WHERE timestamp_ms <= ${DagQueries.AppendCutoffMs}),
             |      pp AS (
             |        ${prof("prev_t", "prev")}),
             |      cc AS (
             |        ${prof("full_t", "curr")})
             |      SELECT pp.column_name, n_prev, n_curr, nulls_prev, nulls_curr,
             |             ndv_prev, ndv_curr,
             |             n_curr < n_prev AS volume_shrank,
             |             nulls_curr * n_prev > 2 * nulls_prev * n_curr AS null_rate_spike,
             |             ndv_curr < ndv_prev AS ndv_dropped
             |      FROM pp JOIN cc ON pp.column_name = cc.column_name
             |      ORDER BY pp.column_name""".stripMargin
        },
        // live table after rollback = the pre-cutoff slice, exactly
        "dag_restore" ->
          s"""SELECT * FROM (${eventBody(EventModels.loanBorrowed)}) b
             |      WHERE timestamp_ms <= ${DagQueries.AppendCutoffMs}
             |      ORDER BY transaction_digest, event_index""".stripMargin,
        // dbt run_results: per-model status + materialized cardinality,
        // each count recomputed from the model's declarative body
        "dag_run_results" -> {
          val eventRows = EventModels.all.map(m =>
            s"""SELECT '${m.name}' AS model, 'success' AS status,
               |  (SELECT CAST(count(*) AS BIGINT) FROM (${eventBody(m)})) AS n_rows""".stripMargin)
          val stgRow =
            s"""SELECT '${PoolObjectStg.name}' AS model, 'success' AS status,
               |  (SELECT CAST(count(*) AS BIGINT) FROM ($stgBody)) AS n_rows""".stripMargin
          val fctRow =
            s"""SELECT '${PoolDailyFct.name}' AS model, 'success' AS status,
               |  (SELECT CAST(count(*) AS BIGINT) FROM (${fctOracle(includeLags = false)})) AS n_rows""".stripMargin
          (eventRows :+ stgRow :+ fctRow)
            .mkString("SELECT model, status, n_rows FROM (\n", "\nUNION ALL\n",
              "\n) ORDER BY model")
        },
        // E3 consumption SQL (README "Sample Queries"): the same SELECTs
        // over the declaratively recomputed fct / loan model
        "dag_show_pool_tvl" ->
          s"""SELECT snapshot_date, coin_symbol, total_supply_usd AS tvl_usd,
             |       total_borrow_usd, utilization_rate
             |FROM (${fctOracle(includeLags = false)})
             |WHERE coin_symbol = 'USDC'
             |ORDER BY snapshot_date, margin_pool_id""".stripMargin,
        "dag_show_total_tvl" ->
          s"""SELECT snapshot_date,
             |       CAST(sum(CAST(floor(total_supply_usd * 1000000.0 + 0.5) AS BIGINT))
             |            AS BIGINT) AS total_tvl_usd_e6,
             |       CAST(sum(CAST(floor(total_borrow_usd * 1000000.0 + 0.5) AS BIGINT))
             |            AS BIGINT) AS total_borrowed_usd_e6
             |FROM (${fctOracle(includeLags = false)})
             |GROUP BY 1
             |ORDER BY 1 DESC""".stripMargin,
        // E3 served from the store AFTER incremental merge + lookback
        // re-aggregation: must equal the declarative recomputation — the
        // merge protocol is invisible to the consumption surface
        "dag_show_tvl_incremental" ->
          s"""SELECT snapshot_date,
             |       CAST(sum(CAST(floor(total_supply_usd * 1000000.0 + 0.5) AS BIGINT))
             |            AS BIGINT) AS total_tvl_usd_e6,
             |       CAST(sum(CAST(floor(total_borrow_usd * 1000000.0 + 0.5) AS BIGINT))
             |            AS BIGINT) AS total_borrowed_usd_e6
             |FROM (${fctOracle(includeLags = false)})
             |GROUP BY 1
             |ORDER BY 1 DESC""".stripMargin,
        "dag_show_borrow_volume" ->
          s"""SELECT snapshot_date, coin_symbol,
             |       daily_borrow_volume_usd, daily_repay_volume_usd
             |FROM (${fctOracle(includeLags = false)})
             |ORDER BY snapshot_date DESC, margin_pool_id""".stripMargin,
        "dag_show_recent_loans" ->
          s"""SELECT make_timestamp((timestamp_ms // 1000) * 1000000) AS time,
             |       margin_pool_id, loan_amount / 1e6 AS loan_amount_normalized
             |FROM (${eventBody(EventModels.loanBorrowed)})
             |ORDER BY timestamp_ms DESC, transaction_digest, event_index""".stripMargin,
        "dag_fct_pool_daily" -> fctOracle(includeLags = true),
        // lag columns excluded: the reference's own incremental runs
        // re-NULL them at the lookback boundary (see DagQueries)
        "dag_fct_incremental" -> fctOracle(includeLags = false),
        // the selective state:modified rerun must land on the same
        // content as the clean full DAG — the fct oracle, verbatim
        "dag_state_modified" -> fctOracle(includeLags = false),
        "dag_bloom_lookup" -> bloomLookupOracle,
        // same oracle with maintenance (OPTIMIZE+VACUUM) post-hooks on:
        // compaction/retention must be invisible to readers
        "dag_fct_maintenance" -> fctOracle(includeLags = false),
        // the data-skipping reader under a pushed date filter: file-level
        // stats pruning must be invisible too
        "dag_fct_skipread" ->
          s"""SELECT * FROM (${fctOracle(includeLags = false)})
             |WHERE snapshot_date >= DATE '2026-01-05'
             |ORDER BY snapshot_date, margin_pool_id""".stripMargin,
        // S7 blind append: two overlapping batches, so the overlap appears
        // TWICE — append must never dedup, and batch-1 files must survive
        // the second snapshot's hard-link
        "dag_append_log" ->
          s"""${eventBody(EventModels.loanBorrowed)}
             |      UNION ALL
             |      SELECT * FROM (${eventBody(EventModels.loanBorrowed)}) b1
             |      WHERE timestamp_ms <= ${DagQueries.AppendCutoffMs}
             |      ORDER BY transaction_digest, event_index""".stripMargin,
        // Stream-stream interval join: the watermarked loan-lifecycle
        // self-join must converge to the one-shot declarative join of the
        // two loan models (equality on manager+pool, repay within 3 days
        // of the borrow) — cross-micro-batch matches exercise the engine's
        // join state retention
        "dag_stream_join" ->
          s"""WITH b AS (${eventBody(EventModels.loanBorrowed)}),
             |     r AS (${eventBody(EventModels.loanRepaid)})
             |SELECT b.transaction_digest AS borrow_digest,
             |       b.event_index AS borrow_index,
             |       r.transaction_digest AS repay_digest,
             |       r.event_index AS repay_index,
             |       b.margin_manager_id, b.margin_pool_id,
             |       b.loan_amount, r.repay_amount,
             |       b.timestamp_ms AS borrow_ts, r.timestamp_ms AS repay_ts
             |FROM b JOIN r
             |  ON b.margin_manager_id = r.margin_manager_id
             | AND b.margin_pool_id = r.margin_pool_id
             | AND r.timestamp_ms >= b.timestamp_ms
             | AND r.timestamp_ms <= b.timestamp_ms + ${3L * 86400000L}
             |ORDER BY borrow_digest, borrow_index,
             |         repay_digest, repay_index""".stripMargin,
        // LEFT OUTER stream-stream join: unmatched borrows must surface
        // exactly once with NULL repay columns, emitted only after the
        // watermark proved no repay can still arrive
        "dag_stream_outer_join" ->
          s"""WITH b AS (${eventBody(EventModels.loanBorrowed)}),
             |     r AS (${eventBody(EventModels.loanRepaid)})
             |SELECT b.transaction_digest AS borrow_digest,
             |       b.event_index AS borrow_index,
             |       r.transaction_digest AS repay_digest,
             |       r.event_index AS repay_index,
             |       b.margin_manager_id, b.margin_pool_id,
             |       b.loan_amount, r.repay_amount,
             |       b.timestamp_ms AS borrow_ts, r.timestamp_ms AS repay_ts
             |FROM b LEFT JOIN r
             |  ON b.margin_manager_id = r.margin_manager_id
             | AND b.margin_pool_id = r.margin_pool_id
             | AND r.timestamp_ms >= b.timestamp_ms
             | AND r.timestamp_ms <= b.timestamp_ms + ${3L * 86400000L}
             |ORDER BY borrow_digest, borrow_index,
             |         repay_digest, repay_index""".stripMargin,
        // Change data feed: commit 1 (the pre-cutoff slice into an empty
        // table) is all-insert; commit 2 (the full model, redelivering
        // every slice row) emits a pre-/post-image pair per matched key
        // and insert for the post-cutoff tail. Keys are timestamp-stable,
        // so "matched in commit 2" is exactly "timestamp <= cutoff".
        "dag_cdc_feed" ->
          s"""WITH m AS (${eventBody(EventModels.loanBorrowed)}),
             |     b1 AS (SELECT * FROM m
             |            WHERE timestamp_ms <= ${DagQueries.AppendCutoffMs})
             |SELECT *, 'insert' AS _change_type,
             |       CAST(1 AS BIGINT) AS _commit_version FROM b1
             |UNION ALL
             |SELECT *, 'update_preimage', CAST(2 AS BIGINT) FROM b1
             |UNION ALL
             |SELECT *, 'update_postimage', CAST(2 AS BIGINT) FROM m
             |WHERE timestamp_ms <= ${DagQueries.AppendCutoffMs}
             |UNION ALL
             |SELECT *, 'insert', CAST(2 AS BIGINT) FROM m
             |WHERE timestamp_ms > ${DagQueries.AppendCutoffMs}
             |ORDER BY _commit_version, _change_type,
             |         transaction_digest, event_index""".stripMargin,
        // Row-level DELETE (retention): survivors tagged live + the feed's
        // delete retractions tagged deleted must equal the declarative
        // split of the model at the cutoff
        "dag_delete_retention" ->
          s"""WITH m AS (${eventBody(EventModels.loanBorrowed)})
             |SELECT *, 'live' AS _state FROM m
             |WHERE timestamp_ms > ${DagQueries.AppendCutoffMs}
             |UNION ALL
             |SELECT *, 'deleted' FROM m
             |WHERE timestamp_ms <= ${DagQueries.AppendCutoffMs}
             |ORDER BY _state, transaction_digest, event_index""".stripMargin,
        // Time travel: generation 1 must still serve the exact pre-cutoff
        // state after generation 2 superseded it (immutable hard-linked
        // snapshots); generation 2 is the full model
        "dag_time_travel" ->
          s"""WITH m AS (${eventBody(EventModels.loanBorrowed)})
             |SELECT *, CAST(1 AS BIGINT) AS _version FROM m
             |WHERE timestamp_ms <= ${DagQueries.AppendCutoffMs}
             |UNION ALL
             |SELECT *, CAST(2 AS BIGINT) FROM m
             |ORDER BY _version, transaction_digest, event_index""".stripMargin,
        // §2.9 streaming: three MemoryStream micro-batches (overlap
        // redelivered) through the foreachBatch merge sink must converge
        // to the same declarative model recomputation as the batch path
        "dag_stream_ingest" -> eventOracle(EventModels.loanBorrowed),
        // Streaming CDC: the same three-batch replay with the feed on.
        // Batch boundaries are positions in the deterministic
        // (timestamp, digest, index) replay order over the RAW event log
        // (the model's type/bound filters apply after slicing, exactly as
        // the stream filters per micro-batch); the redelivered positions
        // third-9..third surface as update pre-/post-image pairs in
        // commit 2
        "dag_stream_cdc" -> {
          val n = DeepbookFixtures.eventRows.size
          val third = n / 3
          s"""WITH pos AS (
             |        SELECT transaction_digest, event_index,
             |               row_number() OVER (ORDER BY timestamp_ms,
             |                 transaction_digest, event_index) AS p
             |        FROM $eventsSrc),
             |     m0 AS (${eventBody(EventModels.loanBorrowed)}),
             |     m AS (SELECT m0.*, pos.p FROM m0
             |           JOIN pos ON m0.transaction_digest = pos.transaction_digest
             |                   AND m0.event_index = pos.event_index)
             |SELECT * EXCLUDE (p), 'insert' AS _change_type,
             |       CAST(1 AS BIGINT) AS _commit_version
             |FROM m WHERE p <= $third
             |UNION ALL
             |SELECT * EXCLUDE (p), 'update_preimage', CAST(2 AS BIGINT)
             |FROM m WHERE p BETWEEN ${third - 9} AND $third
             |UNION ALL
             |SELECT * EXCLUDE (p), 'update_postimage', CAST(2 AS BIGINT)
             |FROM m WHERE p BETWEEN ${third - 9} AND $third
             |UNION ALL
             |SELECT * EXCLUDE (p), 'insert', CAST(2 AS BIGINT)
             |FROM m WHERE p > $third AND p <= ${2 * third}
             |UNION ALL
             |SELECT * EXCLUDE (p), 'insert', CAST(3 AS BIGINT)
             |FROM m WHERE p > ${2 * third}
             |ORDER BY _commit_version, _change_type,
             |         transaction_digest, event_index""".stripMargin
        },
        // streaming SCD2 fold (hwm-guarded micro-batches) vs the one-shot
        // declarative type-2 history over the whole fixture event log;
        // the tiebreaker eid is derived from the unique event identity
        // the same way on both sides
        "dag_stream_scd2" ->
          s"""WITH e AS (
             |        SELECT sender AS k, timestamp_ms AS ts,
             |               row_number() OVER (ORDER BY transaction_digest, event_index)
             |                 AS eid,
             |               event_type AS st
             |        FROM $eventsSrc),
             |      r AS (SELECT k, ts, eid, st,
             |                   lag(st) OVER (PARTITION BY k ORDER BY ts, eid) AS prev
             |            FROM e),
             |      s AS (SELECT k, ts, eid, st FROM r
             |            WHERE prev IS NULL OR prev != st),
             |      d AS (SELECT k, st, ts,
             |                   lead(ts) OVER (PARTITION BY k ORDER BY ts, eid) AS vt,
             |                   row_number() OVER (PARTITION BY k ORDER BY ts, eid)
             |                     AS version
             |            FROM s)
             |      SELECT k, version, st, ts AS valid_from_ms, vt AS valid_to_ms
             |      FROM d ORDER BY k, version""".stripMargin,
        // streaming watermarked dropDuplicates vs the raw fixture log: the
        // fixture events are unique on (transaction_digest, event_index),
        // so exactly-once emission under redelivery means the sink equals
        // the log itself — one extra or missing row breaks the hash
        "dag_stream_dedup" ->
          s"""SELECT transaction_digest, event_index, timestamp_ms, sender,
             |       event_type, event_json
             |FROM $eventsSrc
             |ORDER BY transaction_digest, event_index""".stripMargin,
        // watermarked tumbling-window streaming agg vs the one-shot batch
        // aggregation of the raw log: every real window must have flushed
        // (the sentinel advanced the watermark past them), and fixture
        // numerics are integer-valued so the double sums are exact
        "dag_stream_daily" ->
          s"""SELECT ${msToDate("timestamp_ms")} AS snapshot_date, event_type,
             |       sum(coalesce(TRY_CAST(json_extract_string(event_json,
             |             '$$.supply_amount') AS DOUBLE), 0.0)) AS volume,
             |       count(*) AS n_events
             |FROM $eventsSrc
             |GROUP BY 1, 2
             |ORDER BY snapshot_date, event_type""".stripMargin,
        // flatMapGroupsWithState running position vs the one-shot per-pool
        // fold: last emitted state per pool == total fold; fixture amounts
        // are integer-valued so the double sum is exact
        "dag_stream_position" ->
          s"""WITH x AS (
             |        SELECT json_extract_string(event_json, '$$.margin_pool_id')
             |                 AS margin_pool_id,
             |               CASE WHEN event_type = '$pkg::margin_pool::AssetSupplied'
             |                    THEN TRY_CAST(json_extract_string(event_json,
             |                           '$$.supply_amount') AS DOUBLE)
             |                    ELSE -TRY_CAST(json_extract_string(event_json,
             |                           '$$.withdraw_amount') AS DOUBLE) END AS delta
             |        FROM $eventsSrc
             |        WHERE event_type IN ('$pkg::margin_pool::AssetSupplied',
             |                             '$pkg::margin_pool::AssetWithdrawn'))
             |SELECT margin_pool_id, sum(delta) AS net_supplied,
             |       count(*) AS n_events
             |FROM x GROUP BY margin_pool_id ORDER BY margin_pool_id""".stripMargin,
        // additive schema evolution: rows merged before the event_type
        // column existed read back as NULL; later rows carry it
        "dag_schema_evolve" -> {
          val cut = java.time.Instant.parse("2026-01-08T00:00:00Z").toEpochMilli
          s"""SELECT transaction_digest, event_index, timestamp_ms, sender,
             |       CASE WHEN timestamp_ms > $cut THEN event_type
             |            ELSE NULL END AS event_type
             |FROM $eventsSrc
             |ORDER BY transaction_digest, event_index""".stripMargin
        },
        // type widening (int->long, float->double): the widened read of the
        // table — early partitions still physically int/float, hard-linked —
        // must equal the natural wide projection of the raw log; amounts are
        // ts % 1000, exact in float, so no rounding enters
        "dag_schema_widen" ->
          s"""SELECT transaction_digest, CAST(event_index AS BIGINT) AS event_index,
             |       timestamp_ms, CAST(timestamp_ms % 1000 AS DOUBLE) AS amount
             |FROM $eventsSrc
             |ORDER BY transaction_digest, event_index""".stripMargin,
        // stream-side evolution converges to the same table as the batch
        // path — identical oracle to dag_schema_evolve
        "dag_stream_evolve" -> {
          val cut = java.time.Instant.parse("2026-01-08T00:00:00Z").toEpochMilli
          s"""SELECT transaction_digest, event_index, timestamp_ms, sender,
             |       CASE WHEN timestamp_ms > $cut THEN event_type
             |            ELSE NULL END AS event_type
             |FROM $eventsSrc
             |ORDER BY transaction_digest, event_index""".stripMargin
        })
}
