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
    * that were run. */
  def run(spark: SparkSession, root: String,
          buildBatch: (Long, Long) => DataFrame,
          partitionDate: Column, fromMs: Long, toMs: Long,
          periodMs: Long): Seq[(Long, Long)] = {
    require(periodMs > 0 && toMs > fromMs, "empty microbatch range")
    val windows = Iterator.iterate(fromMs)(_ + periodMs)
      .takeWhile(_ < toMs).map(s => (s, math.min(s + periodMs, toMs))).toSeq
    windows.foreach { case (s, e) =>
      val batch = buildBatch(s, e)
      // an empty window publishes nothing — replaying it stays a no-op
      if (!batch.isEmpty)
        SnapshotStore.insertOverwrite(spark, root, batch, partitionDate)
    }
    windows
  }
}
