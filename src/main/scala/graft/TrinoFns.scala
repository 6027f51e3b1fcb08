package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Trino-semantics shims (SURVEY.md §2.8 F-table).
  *
  * The reference models are Trino SQL; a handful of Trino built-ins differ
  * from their Spark namesakes in return type, argument order, or NULL
  * behavior. Centralizing them here keeps every model expression
  * oracle-exact. Citations are reference `path:line` per function.
  */
object TrinoFns {

  /** F1: Trino `json_extract_scalar(j, path)`.
    *
    * Spark's `get_json_object` returns the serialized JSON text when the
    * path lands on an object/array where Trino would return NULL; every
    * reference path targets a scalar so results match
    * (`models/deepbook_margin/events/deepbook_margin_loan_borrowed.sql:34-38`).
    */
  def jsonScalar(j: Column, path: String): Column = get_json_object(j, path)

  /** F2: Trino `json_format(json_extract(j, path))` — serialize a non-scalar
    * subtree to JSON text (`stg_deepbook_margin_pool_object.sql:92`).
    * Spark's `get_json_object` already returns serialized JSON for
    * non-scalars, so the two-step dance collapses to one call.
    */
  def jsonFormatExtract(j: Column, path: String): Column = get_json_object(j, path)

  /** F3: `try_cast(x as double)` — NULL on malformed input in both engines. */
  def tryCastDouble(c: Column): Column = c.try_cast(DoubleType)
  def tryCastLong(c: Column): Column = c.try_cast(LongType)
  def tryCastBoolean(c: Column): Column = c.try_cast(BooleanType)

  /** F5: Trino `from_unixtime(timestamp_ms / 1000)`.
    *
    * Two traps (`stg_deepbook_margin_pool_object.sql:106`):
    *  - Trino `bigint / bigint` truncates (integer division); Spark `/`
    *    returns DOUBLE → truncate explicitly.
    *  - Spark's own `from_unixtime` returns a STRING; Trino's returns a
    *    timestamp → use `timestamp_seconds`.
    */
  def msToTs(ms: Column): Column = timestamp_seconds((ms / lit(1000L)).cast(LongType))

  /** F5+F8: `date(from_unixtime(ms / 1000))` in UTC
    * (`fct_deepbook_margin_pool_daily.sql:29`). */
  def msToDate(ms: Column): Column = to_date(msToTs(ms))

  /** F6: `cast(to_unixtime(now - interval 'n' day) * 1000 as bigint)`
    * (`deepbook_margin_loan_borrowed.sql:23-25`). Millisecond-precise like
    * Trino's fractional `to_unixtime` — no truncation to whole seconds.
    * Clock injected — never `now()` in library code (SURVEY.md §7.5 #4). */
  def backfillBoundMs(now: java.time.Instant, days: Int): Long =
    now.toEpochMilli - days.toLong * 86400000L

  /** F9: Trino `date_add('day', -n, d)` → Spark `date_add(d, -n)` —
    * argument order differs (`fct_deepbook_margin_pool_daily.sql:34`). */
  def dateAddDays(d: Column, n: Int): Column = date_add(d, n)

  /** F11: Trino `regexp_extract` returns NULL on no-match; Spark returns ""
    * (`stg_deepbook_margin_pool_object.sql:45`). */
  def regexpExtractNullable(c: Column, pattern: String, group: Int): Column =
    nullif(regexp_extract(c, pattern, group), lit(""))

  /** `power(10, decimals)` normalization denominator
    * (`stg_deepbook_margin_pool_object.sql:133-143`). */
  def pow10(decimals: Column): Column = pow(lit(10.0), decimals)

  /** Normalized token amount: `raw / power(10, decimals)` guarded by
    * decimals-not-null (`stg_deepbook_margin_pool_object.sql:132-143`). */
  def normalize(raw: Column, decimals: Column): Column =
    when(decimals.isNotNull, raw / pow10(decimals)).otherwise(lit(null).cast(DoubleType))

  /** Guarded ratio returning NULL on zero denominator — the share-price
    * shape (`stg_deepbook_margin_pool_object.sql:146-153`). */
  def ratioOrNull(num: Column, den: Column): Column =
    when(den > lit(0.0), num / den).otherwise(lit(null).cast(DoubleType))

  /** Guarded ratio returning 0 on zero denominator — utilization_rate's
    * deliberate else-0 asymmetry (`stg_deepbook_margin_pool_object.sql:154-157`,
    * SURVEY.md §7.5 #5). */
  def ratioOrZero(num: Column, den: Column): Column =
    when(den > lit(0.0), num / den).otherwise(lit(0.0))
}
