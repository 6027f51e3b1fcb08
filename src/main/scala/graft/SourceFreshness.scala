package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import java.time.Instant

/** `dbt source freshness` — the last of the reference user's everyday dbt
  * commands (run/test/build/retry are [[graft.incremental.Runner]] +
  * [[graft.incremental.DataTests]]): each declared source carries a
  * `loaded_at` expression and warn/error staleness horizons, and the
  * check reports `pass` / `warn` / `error` by the age of the newest row
  * (dbt's `max(loaded_at_field)` vs `warn_after`/`error_after`,
  * strictly-greater comparisons).
  *
  * Scale: one scalar `max` aggregate per source — the same
  * metadata-sized scan-bound probe as the incremental watermark (P3);
  * with parquet footer statistics a max over a partition-pruned column
  * never reads data pages. The clock is INJECTED (`now`), never
  * `now()`, so the check is deterministic under test — the same rule
  * every model build follows. */
object SourceFreshness {

  /** One source's freshness contract. `loadedAt` yields epoch-ms. */
  final case class Spec(source: String, loadedAt: Column,
                        warnAfterMs: Long, errorAfterMs: Long) {
    require(warnAfterMs < errorAfterMs,
      s"$source: warn_after must precede error_after")
  }

  /** One row per spec: (source_name, max_loaded_at_ms, age_ms, status),
    * ordered by source name. A source with NO rows is `error` (dbt:
    * freshness over an empty source cannot pass). */
  def check(sources: Sources, specs: Seq[Spec], now: Instant): DataFrame = {
    require(specs.nonEmpty, "no freshness specs declared")
    val nowMs = now.toEpochMilli
    specs.map { s =>
      sources(s.source)
        .agg(max(s.loadedAt).as("max_loaded_at_ms"))
        .select(
          lit(s.source).as("source_name"),
          col("max_loaded_at_ms"),
          (lit(nowMs) - col("max_loaded_at_ms")).as("age_ms"),
          when(col("max_loaded_at_ms").isNull ||
            lit(nowMs) - col("max_loaded_at_ms") > s.errorAfterMs, "error")
            .when(lit(nowMs) - col("max_loaded_at_ms") > s.warnAfterMs, "warn")
            .otherwise("pass").as("status"))
    }.reduce(_.unionByName(_)).orderBy("source_name")
  }
}
