package graft.incremental

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) maintenance over an event log — the
  * dimension-history pattern every warehouse pairs with incremental fact
  * merges (the reference's merge sink covers facts; this covers the
  * dimension side: dbt snapshots / Delta `MERGE ... WHEN MATCHED UPDATE`
  * with validity intervals).
  *
  * From a stream of `(key, ts, tie, state)` events it maintains one row per
  * state RUN: `(key, version, state, valid_from, valid_to)` where
  * consecutive equal states collapse, `valid_to` is the next run's start
  * (NULL for the open run) and `version` numbers runs 1..n per key.
  *
  * Scale design: [[build]] is per-key windows only (parallel across keys,
  * memory bounded by one key's events). [[mergeBatch]] touches ONLY the
  * open rows of keys present in the batch (a semi-join against the
  * batch's key set), re-runs the run computation over `open ∪ batch` —
  * batch-sized, not history-sized — and upserts through
  * [[SnapshotStore.merge]] keyed `(key, version)`, so closed history
  * is never read or rewritten. Version numbers are stable under the
  * strict-append contract (closed runs never renumber; the rebuilt slice
  * offsets by the open run's version), which makes `(key, version)` the
  * unique row identity — `valid_from` is NOT unique: two same-`ts`
  * events with different states are distinct tie-broken runs sharing a
  * `valid_from`. Batches must arrive strictly after all previously
  * ingested events (the same append-log contract the watermarked fact
  * models use); within a batch, order is free.
  */
object Scd2 {

  /** One-shot SCD2 build. `tie` breaks equal-`ts` orderings (an event
    * id). */
  def build(events: DataFrame, key: String, ts: String, tie: String,
            state: String): DataFrame = {
    val byEvent = Window.partitionBy(col(key)).orderBy(col(ts), col(tie))
    val runStarts = events
      .withColumn("__prev", lag(col(state), 1).over(byEvent))
      .filter(col("__prev").isNull || col("__prev") =!= col(state))
    val byRun = Window.partitionBy(col(key)).orderBy(col(ts), col(tie))
    runStarts
      .withColumn("valid_to", lead(col(ts), 1).over(byRun))
      .withColumn("version", row_number().over(byRun))
      .select(col(key), col("version"), col(state).as("state"),
        col(ts).as("valid_from"), col("valid_to"))
  }

  /** Ingest one batch of events (all strictly later than anything already
    * ingested) into the SCD2 table at `root`. */
  def mergeBatch(spark: SparkSession, root: String, batch: DataFrame,
                 key: String, ts: String, tie: String, state: String): Unit = {
    val events = batch.select(col(key), col(ts), col(tie), col(state))
    val out = SnapshotStore.read(spark, root) match {
      case None => build(events, key, ts, tie, state)
      case Some(prev) =>
        // open rows of keys the batch touches — everything else is settled
        // history and stays untouched on disk
        val open = prev.filter(col("valid_to").isNull)
          .join(events.select(col(key)).distinct(), Seq(key), "left_semi")
        // seed each affected key's slice with its open run as a pseudo-event
        // (ts = valid_from sorts first under the strict-append contract), so
        // the run collapse naturally extends it when the batch continues the
        // same state and closes it when the state changes
        val seed = open.select(col(key), col("valid_from").as(ts),
          lit(-1L).as(tie), col("state").as(state))
        val rebuilt = build(events.unionByName(seed), key, ts, tie, state)
        val base = open.select(col(key), (col("version") - 1).as("__base"))
        rebuilt.join(broadcast(base), Seq(key), "left")
          .withColumn("version", col("version") + coalesce(col("__base"), lit(0)))
          .drop("__base")
    }
    SnapshotStore.merge(spark, root, out, Seq(key, "version"))
  }
}
