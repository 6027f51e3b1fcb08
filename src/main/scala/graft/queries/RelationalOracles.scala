package graft.queries

/** DuckDB oracle SQL for [[RelationalQueries]] — same table names, column
  * aliases, rounding, and ORDER BY as the Spark side (driver contract in
  * `SparkEntry.oracleSql`). */
object RelationalOracles {

  val all: Map[String, String] = Map(

    "j5_asof_join" -> """
      SELECT c.event_id, c.user_id, CAST(c.ts AS DATE) AS event_date,
             round(c.value, 2) AS click_value,
             round(p.value, 2) AS asof_value
      FROM (SELECT * FROM events WHERE event_type = 'click') c
      ASOF JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        ON c.user_id = p.user_id AND c.ts >= p.ts
      ORDER BY c.event_id""",

    "j6_range_join" -> """
      WITH campaigns AS (
        SELECT i AS campaign_id,
               DATE '1996-01-01' + INTERVAL (i * 70) DAY AS start_date,
               DATE '1996-01-01' + INTERVAL (i * 70 + 13) DAY AS end_date
        FROM (SELECT unnest(range(0, 10)) AS i))
      SELECT c.campaign_id, count(*) AS n_orders,
             CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      FROM orders o
      JOIN campaigns c
        ON CAST(o.o_orderdate AS DATE) BETWEEN c.start_date AND c.end_date
      GROUP BY c.campaign_id ORDER BY c.campaign_id""",

    "j7_semi_anti" -> """
      WITH open AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
      SELECT c_custkey,
             CASE WHEN EXISTS (SELECT 1 FROM open WHERE o_custkey = c_custkey)
                  THEN 'HAS_OPEN' ELSE 'NO_OPEN' END AS status
      FROM customer ORDER BY c_custkey""",

    "w5_sliding" -> """
      WITH assigned AS (
        SELECT unnest([CAST(ts AS DATE) - 1, CAST(ts AS DATE)]) AS window_start,
               event_type, value
        FROM events)
      SELECT window_start, event_type,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
             count(*) AS n_events
      FROM assigned GROUP BY 1, 2 ORDER BY 1, 2""",

    "w6_sessions" -> """
      WITH ordered AS (
        SELECT user_id, epoch_ms(ts) AS ms,
               CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts))
                      OVER (PARTITION BY user_id ORDER BY ts) >= 30*60*1000
                    THEN 1 ELSE 0 END AS new_session
        FROM events),
      islands AS (
        SELECT user_id, ms,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ms
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM ordered)
      SELECT user_id, min(ms) AS session_start_ms, max(ms) AS session_last_ms,
             count(*) AS n_events
      FROM islands GROUP BY user_id, session_id
      ORDER BY user_id, session_start_ms""",

    // w6's sessionization recomputed one-shot in exact epoch-µs — the
    // Spark side must reproduce it through three STREAMING micro-batches
    // (session_window state merged across batches, watermark-flushed)
    "s14_stream_session" -> """
      WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
      o AS (
        SELECT user_id, us,
               CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
                      OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
                         >= 43200000000
                    THEN 1 ELSE 0 END AS ns
        FROM e),
      s AS (
        SELECT user_id, us,
               sum(ns) OVER (PARTITION BY user_id ORDER BY us
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM o)
      SELECT user_id, min(us) AS session_start_us,
             max(us) + 43200000000 AS session_end_us,
             count(*) AS n_events
      FROM s GROUP BY user_id, sid
      ORDER BY user_id, session_start_us""",

    // one-shot declarative SCD2 over the full log — the Spark side must
    // reproduce it through two incremental batches + the snapshot merge
    "s12_scd2" -> """
      WITH e AS (SELECT user_id, ts, event_id, event_type AS state FROM events),
      r AS (SELECT user_id, ts, event_id, state,
                   lag(state) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     AS prev
            FROM e),
      s AS (SELECT user_id, ts, event_id, state FROM r
            WHERE prev IS NULL OR prev != state),
      d AS (SELECT user_id, state, ts,
                   lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     AS vt,
                   row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     AS version
            FROM s)
      SELECT user_id, version, state, epoch_ms(ts) AS valid_from_ms,
             epoch_ms(vt) AS valid_to_ms
      FROM d ORDER BY user_id, version""",

    "a3_distinct_agg" -> """
      SELECT l_returnflag,
             count(DISTINCT l_partkey) AS n_parts,
             count(DISTINCT l_suppkey) AS n_supps,
             count(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "a4_rollup" -> """
      SELECT c_mktsegment, c_nationkey % 5 AS nation_band,
             count(*) AS n_customers,
             CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
      FROM customer
      GROUP BY ROLLUP (c_mktsegment, nation_band)
      ORDER BY c_mktsegment ASC NULLS FIRST, nation_band ASC NULLS FIRST""",

    "a6_cube" -> """
      SELECT c_mktsegment, c_nationkey % 5 AS nation_band,
             count(*) AS n_customers,
             CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
      FROM customer
      GROUP BY CUBE (c_mktsegment, nation_band)
      ORDER BY c_mktsegment ASC NULLS FIRST, nation_band ASC NULLS FIRST""",

    "a7_grouping_sets" -> """
      SELECT c_mktsegment, c_nationkey % 5 AS nation_band,
             GROUPING(c_mktsegment) AS g_seg,
             GROUPING(c_nationkey % 5) AS g_band,
             count(*) AS n_customers,
             CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
      FROM customer
      GROUP BY GROUPING SETS ((c_mktsegment), (nation_band))
      ORDER BY c_mktsegment ASC NULLS FIRST, nation_band ASC NULLS FIRST""",

    "w7_analytic" -> """
      SELECT user_id, event_id,
             ntile(4) OVER w AS quartile,
             CAST(floor(percent_rank() OVER w * 1000000.0 + 0.5) AS BIGINT) AS pct_rank_e6,
             CAST(floor(cume_dist() OVER w * 1000000.0 + 0.5) AS BIGINT) AS cume_e6,
             last_value(CASE WHEN event_type = 'error' THEN NULL ELSE value END
                        IGNORE NULLS) OVER w AS last_known_value
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY user_id, event_id""",

    "a5_percentiles" -> """
      SELECT l_returnflag,
             round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_price,
             round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
             round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    // deterministic ground truth hashed exactly; the sketch estimates enter
    // only as bounded-error booleans whose oracle twin asserts TRUE — a
    // sketch drifting outside its published envelope flips the boolean and
    // fails the hash, without the hash ever depending on estimate digits
    // n_mh_est replays the engine's 128-slot MinHash distinct estimator
    // bit-for-bit: ONE md5 per row (first 48 bits mod the prime
    // p = 2^31−1), then per slot i the affine permutation
    // (aᵢ·h + bᵢ) mod p with aᵢ = (i+1)·2654435761 mod p,
    // bᵢ = (i·1013904223 + 12345) mod p — the same constants
    // RelationalQueries.mhSlotExpr derives — and
    // K·p // (Σ+1) − 1 in integer arithmetic. The estimate itself is
    // hash-graded; only the Datasketches HLL stays a bounded-error
    // boolean (its internals are engine-specific)
    "k1_sketches" -> """
      WITH x AS (SELECT event_type,
                        count(DISTINCT user_id) AS n_exact,
                        round(quantile_cont(value, 0.5), 6) AS p50_exact
                 FROM events GROUP BY event_type),
      h AS (SELECT event_type,
                   ('0x' || substr(md5(user_id::VARCHAR), 1, 12))::BIGINT
                     % 2147483647 AS h
            FROM events),
      m AS (SELECT event_type, s.i,
                   MIN(((((s.i + 1)::BIGINT * 2654435761) % 2147483647) * h
                        + ((s.i::BIGINT * 1013904223 + 12345) % 2147483647))
                       % 2147483647) AS v
            FROM h CROSS JOIN (SELECT unnest(range(0, 128)) AS i) s
            GROUP BY event_type, s.i),
      e AS (SELECT event_type,
                   128::BIGINT * 2147483647 // (SUM(v) + 1) - 1 AS est
            FROM m GROUP BY event_type)
      SELECT x.event_type, x.n_exact, x.p50_exact,
             TRUE AS hll_within_5pct,
             TRUE AS p50_within_eps,
             CAST(e.est AS BIGINT) AS n_mh_est,
             CAST(abs(e.est - x.n_exact) * 1000000 // x.n_exact AS BIGINT)
               AS mh_err_ppm
      FROM x JOIN e USING (event_type)
      ORDER BY x.event_type""",

    "k2_table_stats" -> """
      WITH o AS (SELECT o_custkey, o_orderstatus,
                        CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice,
                        CAST(o_orderdate AS DATE) AS o_orderdate,
                        o_orderpriority
                 FROM orders)
      SELECT * FROM (
        SELECT 'o_custkey' AS column_name, count(*) AS n_rows,
               CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
               count(DISTINCT o_custkey) AS n_distinct,
               CAST(min(o_custkey) AS VARCHAR) AS min_repr,
               CAST(max(o_custkey) AS VARCHAR) AS max_repr FROM o
        UNION ALL
        SELECT 'o_orderdate', count(*),
               CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               count(DISTINCT o_orderdate),
               CAST(min(o_orderdate) AS VARCHAR),
               CAST(max(o_orderdate) AS VARCHAR) FROM o
        UNION ALL
        SELECT 'o_orderpriority', count(*),
               CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               count(DISTINCT o_orderpriority),
               CAST(min(o_orderpriority) AS VARCHAR),
               CAST(max(o_orderpriority) AS VARCHAR) FROM o
        UNION ALL
        SELECT 'o_orderstatus', count(*),
               CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               count(DISTINCT o_orderstatus),
               CAST(min(o_orderstatus) AS VARCHAR),
               CAST(max(o_orderstatus) AS VARCHAR) FROM o
        UNION ALL
        SELECT 'o_totalprice', count(*),
               CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               count(DISTINCT o_totalprice),
               CAST(min(o_totalprice) AS VARCHAR),
               CAST(max(o_totalprice) AS VARCHAR) FROM o)
      ORDER BY column_name""",

    "w4_frames" -> """
      WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS event_date,
               sum(CAST(value AS DECIMAL(18,2))) AS dv
        FROM events GROUP BY 1, 2)
      SELECT event_type, event_date,
             CAST(dv AS DOUBLE) AS daily_value,
             CAST(sum(dv) OVER (PARTITION BY event_type ORDER BY event_date
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS running_value,
             CAST(first_value(dv) OVER (PARTITION BY event_type ORDER BY event_date
                    ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS DOUBLE)
               AS prev_or_self,
             CAST(last_value(dv) OVER (PARTITION BY event_type ORDER BY event_date
                    ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS DOUBLE)
               AS next_or_self
      FROM daily ORDER BY event_type, event_date""",

    "p7_pivot" -> """
      SELECT CAST(ts AS DATE) AS event_date,
             coalesce(CAST(sum(CASE WHEN event_type = 'purchase'
               THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE), 0.0) AS purchase,
             coalesce(CAST(sum(CASE WHEN event_type = 'view'
               THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE), 0.0) AS view,
             coalesce(CAST(sum(CASE WHEN event_type = 'click'
               THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE), 0.0) AS click,
             coalesce(CAST(sum(CASE WHEN event_type = 'signup'
               THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE), 0.0) AS signup,
             coalesce(CAST(sum(CASE WHEN event_type = 'error'
               THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE), 0.0) AS error
      FROM events GROUP BY 1 ORDER BY 1""",

    "u2_set_ops" -> """
      WITH building AS (
        SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'),
      rich AS (SELECT c_nationkey FROM customer WHERE c_acctbal > 8000)
      SELECT c_nationkey, 'BOTH' AS which
      FROM (SELECT c_nationkey FROM building INTERSECT SELECT c_nationkey FROM rich) t
      UNION ALL
      SELECT c_nationkey, 'BUILDING_ONLY' AS which
      FROM (SELECT c_nationkey FROM building EXCEPT SELECT c_nationkey FROM rich) t
      ORDER BY which, c_nationkey""",

    "s1_event_scan" -> """
      SELECT event_id, user_id, CAST(ts AS DATE) AS event_date,
             round(value, 2) AS value,
             TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
      FROM events WHERE event_type = 'purchase'
      ORDER BY event_id""",

    "p2_like_scan" -> """
      SELECT p_partkey, p_name, p_type FROM part
      WHERE p_name LIKE '%widget%' ORDER BY p_partkey""",

    "p6_in_list" -> """
      SELECT c_custkey, c_mktsegment, round(c_acctbal, 2) AS acctbal
      FROM customer
      WHERE upper(c_mktsegment) IN ('BUILDING', 'AUTOMOBILE') AND 1 = 1
      ORDER BY c_custkey""",

    "p3_watermark" -> """
      SELECT event_id, event_type FROM events
      WHERE ts >= (SELECT max(ts) - INTERVAL 7 DAY FROM events)
      ORDER BY event_id""",

    "p4_backfill_bound" -> """
      SELECT count(*) AS n_rows, round(sum(value), 2) AS sum_value
      FROM events
      WHERE ts >= (SELECT max(ts) - INTERVAL 14 DAY FROM events)""",

    "a2_hwm_scalar" -> """
      SELECT coalesce(max(event_id), 0) AS hwm_event_id,
             coalesce(round(max(value), 2), 0.0) AS max_value
      FROM events WHERE event_type = 'purchase'""",

    "a1_daily_agg" -> """
      SELECT CAST(ts AS DATE) AS event_date, event_type,
             round(sum(value), 2) AS sum_value, count(*) AS n_events
      FROM events GROUP BY 1, 2 ORDER BY 1, 2""",

    "s5_seed_join" -> """
      WITH seed(type_key, category, factor) AS (
        VALUES ('purchase', 'revenue', 1.0), ('click', 'engagement', 0.1),
               ('signup', 'growth', 2.0), ('error', 'ops', -1.0)),
      daily AS (
        SELECT CAST(ts AS DATE) AS event_date, event_type,
               sum(CAST(value AS DECIMAL(18,2))) AS sum_value
        FROM events GROUP BY 1, 2)
      SELECT d.event_date, d.event_type,
             coalesce(s.category, 'UNKNOWN') AS category,
             CAST(d.sum_value AS DOUBLE) AS sum_value,
             CAST(round(d.sum_value * CAST(coalesce(s.factor, 0.0) AS DECIMAL(4,1)), 2) AS DOUBLE) AS weighted_value
      FROM daily d
      LEFT JOIN seed s
        ON (CASE WHEN d.event_type = 'view' THEN 'click' ELSE d.event_type END) = s.type_key
      ORDER BY d.event_date, d.event_type""",

    "j2_foj_chain" -> """
      WITH ev AS (
        SELECT CAST(ts AS DATE) AS event_date, user_id % 3 AS pool_id,
               event_type, value FROM events),
      s AS (SELECT event_date, pool_id, sum(value) AS supply_v FROM ev
            WHERE event_type = 'purchase' GROUP BY 1, 2),
      w AS (SELECT event_date, pool_id, sum(value) AS withdraw_v FROM ev
            WHERE event_type = 'view' GROUP BY 1, 2),
      b AS (SELECT event_date, pool_id, sum(value) AS borrow_v FROM ev
            WHERE event_type = 'click' GROUP BY 1, 2),
      r AS (SELECT event_date, pool_id, sum(value) AS repay_v FROM ev
            WHERE event_type = 'signup' GROUP BY 1, 2)
      SELECT
        coalesce(s.event_date, w.event_date, b.event_date, r.event_date) AS event_date,
        coalesce(s.pool_id, w.pool_id, b.pool_id, r.pool_id) AS pool_id,
        round(coalesce(s.supply_v, 0), 2) AS supply_v,
        round(coalesce(w.withdraw_v, 0), 2) AS withdraw_v,
        round(coalesce(b.borrow_v, 0), 2) AS borrow_v,
        round(coalesce(r.repay_v, 0), 2) AS repay_v
      FROM s
      FULL OUTER JOIN w ON s.event_date = w.event_date AND s.pool_id = w.pool_id
      FULL OUTER JOIN b ON coalesce(s.event_date, w.event_date) = b.event_date
                       AND coalesce(s.pool_id, w.pool_id) = b.pool_id
      FULL OUTER JOIN r ON coalesce(s.event_date, w.event_date, b.event_date) = r.event_date
                       AND coalesce(s.pool_id, w.pool_id, b.pool_id) = r.pool_id
      ORDER BY 1, 2""",

    "j3_left_join" -> """
      SELECT coalesce(c.c_mktsegment, 'NONE') AS segment,
             count(*) AS n_orders,
             round(sum(o.o_totalprice), 2) AS total_price
      FROM orders o
      LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 5000) c
        ON o.o_custkey = c.c_custkey
      GROUP BY 1 ORDER BY 1""",

    "j4_expr_key_join" -> """
      WITH daily AS (
        SELECT CAST(ts AS DATE) AS event_date, event_type, sum(value) AS volume
        FROM events GROUP BY 1, 2),
      prices AS (
        SELECT price_date, symbol, last_value FROM (
          SELECT CAST(ts AS DATE) AS price_date, upper(event_type) AS symbol,
                 value AS last_value,
                 row_number() OVER (PARTITION BY CAST(ts AS DATE), upper(event_type)
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events) x WHERE rn = 1)
      SELECT d.event_date, d.event_type, round(d.volume, 2) AS volume,
             round(coalesce(p.last_value, 0.0), 2) AS last_value
      FROM daily d
      LEFT JOIN prices p
        ON p.price_date = d.event_date AND p.symbol = upper(d.event_type)
      ORDER BY d.event_date, d.event_type""",

    "w1_dedup_last" -> """
      SELECT user_id, event_date, event_id, event_type, round(value, 2) AS value
      FROM (
        SELECT user_id, CAST(ts AS DATE) AS event_date, event_id, event_type, value,
               row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) x
      WHERE rn = 1 ORDER BY user_id, event_date""",

    "w3_lag_delta" -> """
      WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS event_date, sum(value) AS sum_value
        FROM events GROUP BY 1, 2)
      SELECT event_type, event_date, round(sum_value, 2) AS sum_value,
             round(sum_value - lag(sum_value) OVER (PARTITION BY event_type ORDER BY event_date), 2) AS dod_change
      FROM daily ORDER BY event_type, event_date""",

    "o2_topk_per_group" -> """
      SELECT o_orderpriority, rk, o_orderkey, total_price FROM (
        SELECT o_orderpriority, o_orderkey, round(o_totalprice, 2) AS total_price,
               row_number() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rk
        FROM orders) x
      WHERE rk <= 3 ORDER BY o_orderpriority, rk""",

    "o1_sort_nulls" -> """
      SELECT s_suppkey, s_name,
             CASE WHEN s_acctbal < 0 THEN NULL ELSE round(s_acctbal, 2) END AS acctbal
      FROM supplier
      ORDER BY acctbal DESC NULLS LAST, s_suppkey""",

    "u1_union_seed" -> """
      SELECT coin_type, coin_symbol, CAST(coin_decimals AS BIGINT) AS coin_decimals, coin_name
      FROM (
        SELECT '0x0000000000000000000000000000000000000000000000000000000000000002::sui::SUI' AS coin_type, 'SUI' AS coin_symbol, 9 AS coin_decimals, 'Sui' AS coin_name
        UNION ALL SELECT '0x2::sui::SUI', 'SUI', 9, 'Sui'
        UNION ALL SELECT '0xdba34672e30cb065b1f93e3ab55318768fd6fef66c15942c9f7cb846e2f900e7::usdc::USDC', 'USDC', 6, 'USD Coin'
        UNION ALL SELECT '0x5d4b302506645c37ff133b98c4b50a5ae14841659738d6d733d59d0d217a93bf::coin::COIN', 'wUSDC', 6, 'Wormhole USDC'
        UNION ALL SELECT '0xdeeb7a4662eec9f2f3def03fb937a663dddaa2e215b8078a284d026b7946c270::deep::DEEP', 'DEEP', 6, 'DeepBook Token') t
      ORDER BY coin_type""",

    "f_scalar_fns" -> """
      SELECT c_custkey,
             TRY_CAST(NULLIF(regexp_extract(c_name, 'Customer#(\d+)', 1), '') AS BIGINT) AS cust_num,
             NULLIF(regexp_extract(c_name, 'NOPE#(\d+)', 1), '') AS no_match,
             upper(c_mktsegment) AS segment,
             power(10, c_nationkey % 4) AS pow10,
             CASE WHEN c_acctbal > 0 THEN 'POS' ELSE 'NONPOS' END AS bal_flag,
             TRY_CAST(c_name AS DOUBLE) AS bad_cast
      FROM customer ORDER BY c_custkey""",

    "f_time_fns" -> """
      SELECT event_id, ms,
             CAST(make_timestamp((ms // 1000) * 1000000) AS DATE) AS snapshot_date,
             CAST(make_timestamp((ms // 1000) * 1000000) AS DATE) - 7 AS week_ago
      FROM (SELECT event_id, epoch_ms(ts) AS ms FROM events) x
      ORDER BY event_id""",

    // q1/q3/q5: the compared surface is pinned byte-for-byte to the
    // round-2 decimal formulation the driver's channel accepted
    // (CORRECTNESS_r02 green); the exact-integer twins live under
    // q1_cents/q3_cents/q5_cents with pure-BIGINT outputs below.
    "q1_pricing_summary" -> """
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 2) AS sum_qty,
             round(sum(l_extendedprice), 2) AS sum_base_price,
             CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_disc_price,
             CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_charge,
             round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 2) AS avg_qty,
             round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 2) AS avg_price,
             round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_disc,
             count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",

    "q3_shipping_priority" -> """
      SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS orderdate, o.o_orderpriority,
             CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_mktsegment = 'BUILDING'
        AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
      GROUP BY 1, 2, 3
      ORDER BY revenue DESC, o.o_orderkey
      LIMIT 10""",

    "q5_region_revenue" -> """
      SELECT n.n_name,
             CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'ASIA'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY n.n_name
      ORDER BY revenue DESC, n.n_name""",

    // The exact-integer twins: every money figure mirrored in the integer
    // domain (cents / hundredths / 1e-4 / 1e-6 units, HALF_UP via
    // (x+half) // unit) and OUTPUT as BIGINT — no doubles anywhere in the
    // compared surface, so no engine's rounding/format/decimal policy can
    // move a digit. sum(BIGINT) is exact HUGEINT in DuckDB, hi/lo-split
    // long in Spark; both cast the same exact integer to BIGINT.
    "q1_cents" -> """
      WITH c AS (
        SELECT l_returnflag, l_linestatus,
               CAST(round(l_quantity * 100) AS BIGINT) AS qty_c,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS ep_c,
               CAST(round(l_discount * 100) AS BIGINT) AS disc_h,
               CAST(round(l_tax * 100) AS BIGINT) AS tax_h
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00')
      SELECT l_returnflag, l_linestatus,
             CAST(sum(qty_c) AS BIGINT) AS sum_qty_c,
             CAST(sum(ep_c) AS BIGINT) AS sum_base_price_c,
             CAST((sum(ep_c * (100 - disc_h)) + 50) // 100 AS BIGINT) AS sum_disc_price_c,
             CAST((sum(ep_c * (100 - disc_h) * (100 + tax_h)) + 5000) // 10000 AS BIGINT) AS sum_charge_c,
             CAST((2 * sum(qty_c) + count(*)) // (2 * count(*)) AS BIGINT) AS avg_qty_c,
             CAST((2 * sum(ep_c) + count(*)) // (2 * count(*)) AS BIGINT) AS avg_price_c,
             CAST((2 * sum(disc_h) * 100 + count(*)) // (2 * count(*)) AS BIGINT) AS avg_disc_bp,
             count(*) AS count_order
      FROM c
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",

    "q3_cents" -> """
      SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS orderdate, o.o_orderpriority,
             CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_e4
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_mktsegment = 'BUILDING'
        AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
      GROUP BY 1, 2, 3
      ORDER BY revenue_e4 DESC, o.o_orderkey
      LIMIT 10""",

    "q5_cents" -> """
      SELECT n.n_name,
             CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_e4
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'ASIA'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY n.n_name
      ORDER BY revenue_e4 DESC, n.n_name""",

    "fct_daily_standin" -> """
      WITH ev AS (
        SELECT event_id, ts, CAST(ts AS DATE) AS event_date, user_id % 3 AS pool_id,
               event_type, value FROM events),
      s AS (SELECT event_date, pool_id, sum(value) AS supply_v FROM ev
            WHERE event_type = 'purchase' GROUP BY 1, 2),
      w AS (SELECT event_date, pool_id, sum(value) AS withdraw_v FROM ev
            WHERE event_type = 'view' GROUP BY 1, 2),
      b AS (SELECT event_date, pool_id, sum(value) AS borrow_v FROM ev
            WHERE event_type = 'click' GROUP BY 1, 2),
      r AS (SELECT event_date, pool_id, sum(value) AS repay_v FROM ev
            WHERE event_type = 'signup' GROUP BY 1, 2),
      v AS (
        SELECT
          coalesce(s.event_date, w.event_date, b.event_date, r.event_date) AS event_date,
          coalesce(s.pool_id, w.pool_id, b.pool_id, r.pool_id) AS pool_id,
          coalesce(s.supply_v, 0) AS supply_v, coalesce(w.withdraw_v, 0) AS withdraw_v,
          coalesce(b.borrow_v, 0) AS borrow_v, coalesce(r.repay_v, 0) AS repay_v
        FROM s
        FULL OUTER JOIN w ON s.event_date = w.event_date AND s.pool_id = w.pool_id
        FULL OUTER JOIN b ON coalesce(s.event_date, w.event_date) = b.event_date
                         AND coalesce(s.pool_id, w.pool_id) = b.pool_id
        FULL OUTER JOIN r ON coalesce(s.event_date, w.event_date, b.event_date) = r.event_date
                         AND coalesce(s.pool_id, w.pool_id, b.pool_id) = r.pool_id),
      state AS (
        SELECT event_date, pool_id, value AS eod_value FROM (
          SELECT event_date, pool_id, value,
                 row_number() OVER (PARTITION BY pool_id, event_date
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM ev) x WHERE rn = 1),
      prices AS (
        SELECT event_date AS price_date, value AS price FROM (
          SELECT event_date, value,
                 row_number() OVER (PARTITION BY event_date
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM ev WHERE event_type = 'purchase') x WHERE rn = 1)
      SELECT st.event_date, st.pool_id,
             round(st.eod_value, 2) AS eod_value,
             round(CASE WHEN st.pool_id = 0 THEN 1.0 ELSE coalesce(p.price, 0.0) END, 2) AS price_usd,
             CAST(round(CAST(st.eod_value AS DECIMAL(18,2)) * CAST(CASE WHEN st.pool_id = 0 THEN 1.0 ELSE coalesce(p.price, 0.0) END AS DECIMAL(18,2)), 2) AS DOUBLE) AS eod_value_usd,
             round(coalesce(v.supply_v, 0), 2) AS supply_v,
             round(coalesce(v.withdraw_v, 0), 2) AS withdraw_v,
             round(coalesce(v.borrow_v, 0), 2) AS borrow_v,
             round(coalesce(v.repay_v, 0), 2) AS repay_v,
             round(st.eod_value - lag(st.eod_value) OVER (PARTITION BY st.pool_id ORDER BY st.event_date), 2) AS eod_change
      FROM state st
      LEFT JOIN v ON v.event_date = st.event_date AND v.pool_id = st.pool_id
      LEFT JOIN prices p ON p.price_date = st.event_date
      ORDER BY st.event_date DESC, st.pool_id""")
}
