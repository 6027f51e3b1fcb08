package graft.incremental

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** dbt 1.9's `incremental_strategy='microbatch'` — the newest dbt
  * incremental mode: an event-time range splits into fixed periods, each
  * period's batch is built with its own time-window filters and REPLACES
  * the matching partitions (insert_overwrite under the hood, exactly as
  * dbt-on-Spark compiles it). Properties the strategy exists for, all
  * held here:
  *
  *   - per-batch idempotency: re-running any window rewrites the same
  *     partitions to the same content (a failed backfill resumes at the
  *     failed window, never re-merging the world);
  *   - bounded work: each batch reads only its window (the builder gets
  *     [start, end) and pushes it down) and writes only its partitions;
  *   - ordering freedom: windows touch disjoint partitions when the
  *     period is a multiple of the partition grain, so any subset can
  *     be re-run later without key semantics.
  *
  * Batches run SEQUENTIALLY (dbt's default; the snapshot store's
  * generation fencing makes concurrent same-table writers refuse rather
  * than corrupt — parallel microbatching would target a pool of tables
  * or shard by range). */
object Microbatch {

  /** Run the range `[fromMs, toMs)` in `periodMs` windows. `buildBatch`
    * receives each window's bounds and returns that batch's rows;
    * `partitionDate` is the model's date expression (the same column
    * [[SnapshotStore.merge]] partitions by). Returns the window bounds
    * that were run.
    *
    * Window starts are TRUNCATED to the epoch-anchored `periodMs` grid
    * (dbt's microbatch truncates batch boundaries to the declared
    * period): every run of the same period — today's increment, a later
    * backfill, a retry — lands on one global grid, so re-runs replace
    * exactly the partitions the original run wrote. Without the
    * truncation, a retry launched from an off-grid `fromMs` would
    * wholesale-replace partitions straddling its shifted boundaries —
    * silent data loss. `periodMs` must still be a multiple of the
    * `partitionDate` grain (e.g. whole days for a daily grain) so a
    * window's partitions are touched by no other window; that part of the
    * contract cannot be checked here because the grain is an opaque
    * expression. The first window may therefore begin before `fromMs` —
    * `buildBatch` receives the widened bound and must filter by event
    * time, which also makes the widening harmless (whole-period batches
    * are exactly dbt's semantics). */
  def run(spark: SparkSession, root: String,
          buildBatch: (Long, Long) => DataFrame,
          partitionDate: Column, fromMs: Long, toMs: Long,
          periodMs: Long): Seq[(Long, Long)] = {
    require(periodMs > 0 && toMs > fromMs, "empty microbatch range")
    val from0 = Math.floorDiv(fromMs, periodMs) * periodMs
    val windows = Iterator.iterate(from0)(_ + periodMs)
      .takeWhile(_ < toMs).map(s => (s, s + periodMs)).toSeq
    windows.foreach { case (s, e) =>
      val batch = buildBatch(s, e)
      // an empty window publishes nothing — replaying it stays a no-op
      if (!batch.isEmpty)
        SnapshotStore.insertOverwrite(spark, root, batch, partitionDate)
    }
    windows
  }
}
