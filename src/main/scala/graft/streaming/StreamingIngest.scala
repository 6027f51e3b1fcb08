package graft.streaming

import graft.incremental.SnapshotStore
import graft.models.EventModels
import graft.models.EventModels.EventModel
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import java.time.Instant

/** Structured Streaming variants of the incremental protocol (§2.9).
  *
  * The reference's incremental runs are micro-batches; Structured
  * Streaming gives the same semantics continuously:
  *  - [[ingest]] = the event-extractor path (`deepbook_margin_*.sql`):
  *    `readStream` → the SAME projection the batch model uses →
  *    `foreachBatch` → [[SnapshotStore.merge]]. The merge-on-key sink
  *    makes redelivered and late rows idempotent upserts — exactly the
  *    dbt `incremental_strategy='merge'` contract, so no watermark-based
  *    dedup state is needed for the stateless extract.
  *  - [[dailyVolumes]] = the A1 daily-aggregate shape as a watermarked
  *    tumbling window: late events beyond the allowed lateness are
  *    dropped by the engine; within it, updated aggregates flow to the
  *    sink (the batch fct's 7-day lookback is the same revision window,
  *    expressed with state instead of recomputation).
  *
  * Scale notes: foreachBatch merges are partition-scoped (only dates in
  * the micro-batch rewrite); watermark state is bounded by
  * (#keys × allowed lateness), not by stream length.
  */
object StreamingIngest {

  /** Continuous ingest of one event model into its snapshot table.
    * `onSchemaChange` flows through to the per-micro-batch merge, so a
    * mid-stream projection evolution (a model gaining a column) follows
    * the same dbt `on_schema_change` policy the batch path uses. */
  def ingest(model: EventModel, streamingEvents: DataFrame, root: String,
             checkpointDir: String, now: Instant,
             onSchemaChange: graft.incremental.OnSchemaChange =
               graft.incremental.OnSchemaChange.Ignore,
             changeFeed: Boolean = false): StreamingQuery =
    model.project(streamingEvents, now)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        SnapshotStore.merge(batch.sparkSession, root, batch,
          model.uniqueKey, model.partitionDate,
          onSchemaChange = onSchemaChange, changeFeed = changeFeed)
      }
      .start()

  /** Watermarked streaming dedup (§2.9 "late/duplicate data"): exact
    * once-per-key emission with state bounded by the lateness horizon —
    * the upstream guard that keeps re-delivered events from ever reaching
    * a sink (the merge sink stays idempotent regardless; this bounds the
    * work, not the correctness). */
  def dedupEvents(streamingEvents: DataFrame, lateness: String = "1 day"): DataFrame =
    streamingEvents
      .withColumn("event_time", timestamp_millis(col("timestamp_ms")))
      .withWatermark("event_time", lateness)
      .dropDuplicates("transaction_digest", "event_index")

  final case class PoolPosition(margin_pool_id: String,
                                net_supplied: Double, n_events: Long)

  /** Arbitrary stateful streaming (`flatMapGroupsWithState`): a running
    * net supplied position per margin pool, folded across micro-batches.
    * State is one (sum, count) pair per pool — bounded by #pools, not
    * stream length — and each batch emits the pools it touched (Update
    * mode). The continuous counterpart of the fct's cumulative state. */
  def runningNetPosition(streamingEvents: DataFrame): Dataset[PoolPosition] = {
    val spark = streamingEvents.sparkSession
    import spark.implicits._
    val supplied = s"${EventModels.pkg}::margin_pool::AssetSupplied"
    val withdrawn = s"${EventModels.pkg}::margin_pool::AssetWithdrawn"
    streamingEvents
      .filter(col("event_type").isin(supplied, withdrawn))
      .select(
        get_json_object(col("event_json"), "$.margin_pool_id").as("pool"),
        when(col("event_type") === supplied,
          get_json_object(col("event_json"), "$.supply_amount").try_cast("double"))
          .otherwise(-get_json_object(col("event_json"), "$.withdraw_amount")
            .try_cast("double")).as("delta"))
      .as[(String, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (pool: String, rows: Iterator[(String, Double)],
         state: GroupState[(Double, Long)]) =>
          val (sum0, n0) = state.getOption.getOrElse((0.0, 0L))
          var s = sum0; var n = n0
          rows.foreach { r => s += r._2; n += 1 }
          state.update((s, n))
          Iterator(PoolPosition(pool, s, n))
      }
  }

  /** Stream-stream interval join (§2.9): match every LoanBorrowedEvent to
    * the LoanRepaidEvents of the same (margin_manager, margin_pool) within
    * `horizonDays` after the borrow — the loan-lifecycle pairing of the
    * reference's two loan models (`deepbook_margin_loan_borrowed.sql`,
    * `deepbook_margin_loan_repaid.sql`) as one continuous operator. Both
    * legs reuse the batch models' OWN projections (same filter + JSON
    * flatten, stateless ⇒ streaming-safe), both carry an event-time
    * watermark, and the join condition is equality on the manager/pool
    * keys plus a bounded time range — which is exactly what lets Spark
    * evict join state: a borrow is held only until the watermark passes
    * `borrow_time + horizonDays`, so state is O(horizon × rate), not
    * O(stream). Inner join ⇒ every match is emitted as soon as both sides
    * have arrived (append mode needs no window flush). Both legs may
    * branch from the SAME source stream (a self-join on event type).
    *
    * `joinType = "left_outer"` additionally emits every borrow with NO
    * repay inside the horizon, with NULL repay columns — and it is the
    * WATERMARK that proves the negative: the engine may only emit the
    * null-matched row once the watermark has passed
    * `borrow_time + horizon` (no matching repay can still arrive), an
    * emission rule no batch join exercises. */
  def loanLifecycle(borrowedEvents: DataFrame, repaidEvents: DataFrame,
                    now: Instant, horizonDays: Int = 3,
                    joinType: String = "inner"): DataFrame = {
    val b = EventModels.loanBorrowed.project(borrowedEvents, now)
      .select(col("transaction_digest").as("borrow_digest"),
        col("event_index").as("borrow_index"),
        col("margin_manager_id"), col("margin_pool_id"),
        col("loan_amount"),
        col("timestamp_ms").as("borrow_ts"),
        timestamp_millis(col("timestamp_ms")).as("borrow_time"))
      .withWatermark("borrow_time", "1 day")
    val r = repaidEvents.transform(EventModels.loanRepaid.project(_, now))
      .select(col("transaction_digest").as("repay_digest"),
        col("event_index").as("repay_index"),
        col("margin_manager_id").as("r_mgr"),
        col("margin_pool_id").as("r_pool"),
        col("repay_amount"),
        col("timestamp_ms").as("repay_ts"),
        timestamp_millis(col("timestamp_ms")).as("repay_time"))
      .withWatermark("repay_time", "1 day")
    b.join(r,
        col("margin_manager_id") === col("r_mgr") &&
          col("margin_pool_id") === col("r_pool") &&
          col("repay_time") >= col("borrow_time") &&
          col("repay_time") <= col("borrow_time") +
            expr(s"interval $horizonDays days"),
        joinType)
      .select("borrow_digest", "borrow_index", "repay_digest", "repay_index",
        "margin_manager_id", "margin_pool_id", "loan_amount", "repay_amount",
        "borrow_ts", "repay_ts")
  }

  /** Streaming near-duplicate detection — the incremental form of the
    * batch MinHash/LSH operator (d2): each micro-batch of documents is
    * shingled (native `shingle_ids`), signed, banded, candidate-joined
    * against the ACCUMULATED band-bucket index, verified by exact Jaccard
    * against stored shingle sets of bucket-colliding partners only, and
    * then merged into the index itself.
    *
    * Scale shape: signatures are computed once per document ever; a batch
    * joins only its own bucket keys against the index (an equi-join on
    * (band, bucket) — never batch × corpus); all three tables (buckets,
    * shingle sets, discovered pairs) go through the partition-agnostic
    * merge sink, so redelivered documents re-derive the same rows and the
    * whole pipeline stays idempotent. Pairs are canonicalized a_id < b_id
    * and each pair involves ≥1 batch document, so a pair is discovered in
    * exactly the first batch that completes it. */
  def nearDupIngest(streamingDocs: DataFrame, root: String,
                    checkpointDir: String, thresholdPpm: Long = 500000L): StreamingQuery =
    streamingDocs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) => nearDupBatch(batch, root, thresholdPpm) }
      .start()

  /** k7's Count-Min grid through REAL Structured Streaming: per
    * micro-batch, arriving docs dedup against a seen-doc_id state table
    * (an ADDITIVE sketch must not double-count an at-least-once
    * redelivery — the one hazard `+`-mergeability doesn't cover), the
    * batch's partial D×W grid computes map-side from fresh docs only,
    * and the running grid updates cell-wise (`+` IS the sketch's merge
    * operator). The final grid is bit-identical to the one-shot batch
    * grid, which is what lets k7's DuckDB oracle grade a STREAMING
    * sketch. Scale shape: state is the D×W grid (constant) plus the
    * seen-key table the admission layer needs anyway; a batch's work is
    * batch-sized — the corpus is never re-read. */
  def countMinIngest(streamingDocs: DataFrame, root: String,
                     checkpointDir: String): StreamingQuery =
    streamingDocs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) => countMinBatch(batch, root, id) }
      .start()

  /** One micro-batch (or one incremental run) of [[countMinIngest]].
    *
    * The grid is persisted as PER-BATCH DELTAS keyed by
    * `(batch_id, r, b)`, not as a running sum, so the sketch advances in
    * ONE store commit. The seen-table only covers source-level
    * redelivery (the same doc arriving in a LATER batch); a checkpointed
    * foreachBatch RE-EXECUTION of the same batch — crash after the grid
    * commit, before the seen commit — replays with `cm_seen` unchanged,
    * recomputes the identical `fresh` set, and the keyed merge UPSERTS
    * the same delta rows instead of re-adding them. A replay after both
    * commits sees `fresh` empty and upserts nothing, leaving the
    * already-committed delta intact. Either way the additive sketch
    * never double-counts. The delta merge must run BEFORE the seen
    * merge: the reverse order would make a mid-crash replay see its own
    * ids in `cm_seen` and drop the batch (undercount). Readers sum the
    * deltas cell-wise via [[countMinGrid]] — `+` is the sketch's merge
    * operator, so the summed grid is bit-identical to the one-shot one.
    *
    * `commitSeen = false` is the spec's crash-injection seam: it stops
    * the batch exactly inside the hazard window (grid committed, seen
    * not), so `StreamingIngestSpec` can prove the subsequent replay
    * upserts rather than double-counts. Production callers never pass
    * it. */
  def countMinBatch(batch: DataFrame, root: String, batchId: Long,
                    commitSeen: Boolean = true): Unit = {
    import graft.queries.PipelineQueries
    val spark = batch.sparkSession
    val ids = batch.select(col("doc_id")).distinct()
    val fresh = SnapshotStore.read(spark, s"$root/cm_seen")
      .map(s => ids.join(s, Seq("doc_id"), "left_anti")).getOrElse(ids)
      .localCheckpoint() // frozen BEFORE the seen merge moves the store
    val toks = batch.join(fresh, Seq("doc_id"), "left_semi")
      .select(explode(split(lower(col("text")), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    val delta = PipelineQueries.cmCells(toks)
      .withColumn("batch_id", lit(batchId))
      .select(col("batch_id"), col("r"), col("b"), col("cell"))
    SnapshotStore.merge(spark, s"$root/cm_grid", delta, Seq("batch_id", "r", "b"))
    if (commitSeen)
      SnapshotStore.merge(spark, s"$root/cm_seen", fresh, Seq("doc_id"))
  }

  /** The Count-Min grid as readers consume it: the per-batch deltas
    * summed cell-wise. None until the first batch commits. */
  def countMinGrid(spark: SparkSession, root: String): Option[DataFrame] =
    SnapshotStore.read(spark, s"$root/cm_grid").map(
      _.groupBy(col("r"), col("b")).agg(sum(col("cell")).as("cell")))

  /** k8's HLL register grid through REAL Structured Streaming: per
    * micro-batch the batch's partial grid computes map-side and folds
    * into the running grid by per-bucket MAX. The deliberate contrast
    * with [[countMinIngest]]: MAX is IDEMPOTENT as well as
    * commutative/associative, so an at-least-once source redelivery OR
    * a checkpointed foreachBatch re-execution at ANY crash point simply
    * re-applies maxima the grid already holds — no seen-doc state, no
    * per-batch deltas, no commit-ordering discipline; the sketch
    * algebra itself absorbs every replay hazard the additive Count-Min
    * needed machinery for. The streamed grid must hash-match the
    * one-shot k8 grid (a streaming sketch graded bit-for-bit). Scale
    * shape: state is the m-row grid, a batch's work is batch-sized, the
    * corpus is never re-read. */
  def hllIngest(streamingDocs: DataFrame, root: String,
                checkpointDir: String): StreamingQuery =
    streamingDocs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) => hllBatch(batch, root) }
      .start()

  /** One micro-batch (or one incremental run) of [[hllIngest]]: merge
    * the batch's partial grid into the stored one by per-bucket max.
    * Calling this twice with the same batch is a no-op the second time
    * — the idempotence [[graft.streaming.StreamingIngestSpec]] pins. */
  def hllBatch(batch: DataFrame, root: String): Unit = {
    val spark = batch.sparkSession
    val toks = batch
      .select(explode(split(lower(col("text")), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    val partial = graft.queries.PipelineQueries.hllGrid(spark, toks)
    val merged = SnapshotStore.read(spark, s"$root/hll_grid")
      .map(prev => partial.unionByName(prev)
        .groupBy(col("bucket")).agg(max(col("register")).as("register")))
      .getOrElse(partial)
      .localCheckpoint() // frozen BEFORE the merge moves the store
    SnapshotStore.merge(spark, s"$root/hll_grid", merged, Seq("bucket"))
  }

  /** k9's DDSketch grid accumulated through REAL Structured Streaming —
    * the third streaming sketch, closing the family 3-for-3: the
    * per-(source, bucket) COUNT grid is ADDITIVE (per-bucket count-SUM
    * is the merge operator), i.e. exactly [[countMinIngest]]'s hazard
    * class, so it reuses the per-batch-delta + seen-doc discipline
    * VERBATIM — deltas keyed `(batch_id, g, e, key)` advance the sketch
    * in one store commit, the seen-table absorbs source-level
    * redelivery, and a checkpointed foreachBatch re-execution upserts
    * the identical delta instead of re-adding it (the k7s argument,
    * commit order included: delta before seen). Readers SUM the deltas
    * bucket-wise via [[ddSketchGrid]] — the summed grid is bit-identical
    * to the one-shot k9 grid, so the gate is graded exactly, not
    * bounded-error. Scale shape: a batch's work is batch-sized, state is
    * grid-sized (≤ groups × 8·octaves buckets per batch), the corpus is
    * never re-read. */
  def ddSketchIngest(streamingDocs: DataFrame, root: String,
                     checkpointDir: String): StreamingQuery =
    streamingDocs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) => ddSketchBatch(batch, root, id) }
      .start()

  /** One micro-batch (or one incremental run) of [[ddSketchIngest]].
    * `commitSeen = false` is the spec's crash-injection seam (see
    * [[countMinBatch]] — same hazard, same discipline, same seam). */
  def ddSketchBatch(batch: DataFrame, root: String, batchId: Long,
                    commitSeen: Boolean = true): Unit = {
    import graft.queries.PipelineQueries
    val spark = batch.sparkSession
    val ids = batch.select(col("doc_id")).distinct()
    val fresh = SnapshotStore.read(spark, s"$root/dd_seen")
      .map(s => ids.join(s, Seq("doc_id"), "left_anti")).getOrElse(ids)
      .localCheckpoint() // frozen BEFORE the seen merge moves the store
    val vals = batch.join(fresh, Seq("doc_id"), "left_semi")
      .filter(col("n_chars") >= 1)
      .select(col("source").as("g"), col("n_chars").as("v"))
    val delta = PipelineQueries.ddGrid(spark, vals)
      .withColumn("batch_id", lit(batchId))
      .select(col("batch_id"), col("g"), col("e"), col("key"), col("cnt"))
    SnapshotStore.merge(spark, s"$root/dd_grid", delta,
      Seq("batch_id", "g", "e", "key"))
    if (commitSeen)
      SnapshotStore.merge(spark, s"$root/dd_seen", fresh, Seq("doc_id"))
  }

  /** The DDSketch grid as readers consume it: the per-batch deltas
    * summed bucket-wise. None until the first batch commits. */
  def ddSketchGrid(spark: SparkSession, root: String): Option[DataFrame] =
    SnapshotStore.read(spark, s"$root/dd_grid").map(
      _.groupBy(col("g"), col("e"), col("key")).agg(sum(col("cnt")).as("cnt")))

  /** k10's priority sample maintained through REAL Structured Streaming —
    * the THIRD streaming replay class, completing the algebra triptych:
    * k7s/k9s are ADDITIVE (need per-batch deltas + seen-doc state),
    * k8s is UNBOUNDED-IDEMPOTENT (max-merge, no machinery), and k10s is
    * BOUNDED-STATE IDEMPOTENT: the state is each source's top-(k+1)
    * priority rows, and top-(k+1) is min-k-mergeable —
    * top(A ∪ B) = top(top(A) ∪ B) — so a batch folds into k-bounded
    * state and ANY redelivery or foreachBatch re-execution re-derives
    * identical rows that the (g, rk)-keyed merge upserts in place. No
    * seen-table, no deltas; the sample algebra absorbs every replay
    * hazard while holding only (sources × (k+1)) rows regardless of
    * corpus size. The served sample must hash-match the one-shot k10. */
  def prioritySampleIngest(streamingDocs: DataFrame, root: String,
                           checkpointDir: String): StreamingQuery =
    streamingDocs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) => prioritySampleBatch(batch, root) }
      .start()

  /** One micro-batch (or one incremental run) of [[prioritySampleIngest]]:
    * candidates = stored top-(k+1) rows ∪ the batch's hashed rows,
    * deduped (a redelivered doc re-derives the identical row), re-ranked,
    * merged keyed (g, rk) — every live rank of a touched source is
    * overwritten, so a row falling out of the top never lingers. */
  def prioritySampleBatch(batch: DataFrame, root: String): Unit = {
    import graft.queries.PipelineQueries
    val spark = batch.sparkSession
    val cand = batch.filter(col("n_chars") >= 1)
      .select(col("source").as("g"), col("doc_id"), col("n_chars").as("wt"))
      .withColumn("h", PipelineQueries.k10Hash)
    val all = SnapshotStore.read(spark, s"$root/k10_sample")
      .map(s => cand.unionByName(s.select(col("g"), col("doc_id"),
        col("wt"), col("h"))))
      .getOrElse(cand)
      .distinct() // a redelivered doc's row is bit-identical — set union
    val top = PipelineQueries.k10Ranked(all)
      .select(col("g"), col("doc_id"), col("wt"), col("h"), col("rk"))
      .localCheckpoint() // frozen BEFORE the merge moves the store
    SnapshotStore.merge(spark, s"$root/k10_sample", top, Seq("g", "rk"))
  }

  def thetaSketchIngest(streamingDocs: DataFrame, root: String,
                        checkpointDir: String): StreamingQuery =
    streamingDocs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) => thetaSketchBatch(batch, root) }
      .start()

  /** One micro-batch (or one incremental run) of [[thetaSketchIngest]]:
    * candidates = stored min-k rows ∪ the batch's distinct shingle
    * hashes, set-deduped (a redelivered doc re-derives identical
    * hashes), re-ranked, merged keyed (g, rk) — min-k union is the
    * sketch's merge law, so per-source state stays ≤ k rows and a value
    * that belongs in the sketch can never be lost. Same bounded-state
    * idempotent replay class as [[prioritySampleBatch]]. */
  def thetaSketchBatch(batch: DataFrame, root: String): Unit = {
    import graft.queries.PipelineQueries
    val spark = batch.sparkSession
    val cand = PipelineQueries.k11BatchValues(batch)
    val all = SnapshotStore.read(spark, s"$root/k11_sketch")
      .map(s => cand.unionByName(s.select(col("g"), col("h"))))
      .getOrElse(cand)
      .distinct()
    val top = PipelineQueries.k11Sketch(all)
      .select(col("g"), col("rk"), col("h"))
      .localCheckpoint() // frozen BEFORE the merge moves the store
    SnapshotStore.merge(spark, s"$root/k11_sketch", top, Seq("g", "rk"))
  }

  /** k12's day-partial build as a stream: each micro-batch of EVENTS
    * folds into the (g, day, rk)-keyed partial table. */
  def dailyRollupIngest(streamingEvents: DataFrame, root: String,
                        checkpointDir: String): StreamingQuery =
    streamingEvents.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) => dailyRollupBatch(batch, root) }
      .start()

  /** One micro-batch of [[dailyRollupIngest]]: candidates = stored
    * per-cell min-k rows ∪ the batch's distinct (type, day, hash)
    * triples, set-deduped (a redelivered event re-derives the identical
    * triple), re-ranked per cell, merged keyed (g, day, rk) —
    * [[thetaSketchBatch]]'s bounded-state idempotent replay class with
    * the day in the cell key. Per-CELL state stays ≤ k rows; the table
    * grows only with the (type, day) domain — which is the product: the
    * daily sketch job IS this stream. */
  def dailyRollupBatch(batch: DataFrame, root: String): Unit = {
    import graft.queries.PipelineQueries
    val spark = batch.sparkSession
    val cand = PipelineQueries.k12DailyValues(batch)
    val all = SnapshotStore.read(spark, s"$root/k12_partials")
      .map(s => cand.unionByName(s.select(col("g"), col("day"), col("h"))))
      .getOrElse(cand)
      .distinct()
    val top = PipelineQueries.k12DaySketch(all)
      .select(col("g"), col("day"), col("rk"), col("h"))
      .localCheckpoint() // frozen BEFORE the merge moves the store
    SnapshotStore.merge(spark, s"$root/k12_partials", top, Seq("g", "day", "rk"))
  }

  /** One micro-batch (or one incremental run) of [[nearDupIngest]].
    * `thresholdPpm` is the Jaccard threshold in exact parts-per-million
    * (500000 = 1/2) — integer so the keep predicate and the emitted
    * score live entirely in the exact integer domain. */
  def nearDupBatch(batch: DataFrame, root: String, thresholdPpm: Long = 500000L): Unit = {
    import graft.queries.PipelineQueries._
    val spark = batch.sparkSession
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val sh = batch
      .select(col("doc_id"), expr("shingle_ids(text)").as("ids"))
      .select(col("doc_id"), col("ids"), size(col("ids")).as("n"))
      .localCheckpoint()
    val ex = sh.select(col("doc_id"), explode(col("ids")).as("sid"))
      .withColumn("x", expr(s"sid & $MinhashP"))
    val minAggs = (0 until NumHashes).map(k =>
      min(pmod(lit(hashA(k)) * col("x") + lit(hashB(k)), lit(MinhashP))).as(s"m$k"))
    val sig = ex.groupBy(col("doc_id")).agg(minAggs.head, minAggs.tail: _*)
    val bandCols = (0 until Bands).map(b =>
      xxhash64(lit(b), col(s"m${4 * b}"), col(s"m${4 * b + 1}"),
        col(s"m${4 * b + 2}"), col(s"m${4 * b + 3}")))
    val batchBuckets = sig.select(col("doc_id"), posexplode(array(bandCols: _*)))
      .toDF("doc_id", "band", "bucket").localCheckpoint()
    val allBuckets = SnapshotStore.read(spark, s"$root/nd_buckets")
      .map(_.unionByName(batchBuckets)).getOrElse(batchBuckets)
    val allShingles = SnapshotStore.read(spark, s"$root/nd_shingles")
      .map(_.unionByName(sh)).getOrElse(sh)
    // ≥1 side of every pair is in the batch; canonicalize so batch-batch
    // pairs (matched in both directions) collapse under distinct
    val cand = allBuckets.as("x").join(batchBuckets.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") =!= col("y.doc_id"))
      .select(least(col("x.doc_id"), col("y.doc_id")).as("a_id"),
        greatest(col("x.doc_id"), col("y.doc_id")).as("b_id"))
      .distinct()
    val a = allShingles.select(col("doc_id").as("a_id"), col("ids").as("sa"), col("n").as("na"))
    val b = allShingles.select(col("doc_id").as("b_id"), col("ids").as("sb"), col("n").as("nb"))
    val pairs = cand.join(a, "a_id").join(b, "b_id")
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("uni", col("na") + col("nb") - col("inter"))
      // exact integer domain (d2's discipline): J ≥ t ⇔ |∩|·1e6 ≥ t_ppm·|∪|
      .filter(expr(s"cast(inter as bigint) * 1000000 >= $thresholdPpm * cast(uni as bigint)"))
      .select(col("a_id"), col("b_id"),
        expr("cast(inter as bigint) * 1000000 div uni").as("jaccard_ppm"))
    SnapshotStore.merge(spark, s"$root/nd_pairs", pairs, Seq("a_id", "b_id"))
    SnapshotStore.merge(spark, s"$root/nd_buckets", batchBuckets, Seq("doc_id", "band"))
    SnapshotStore.merge(spark, s"$root/nd_shingles", sh, Seq("doc_id"))
  }

  /** Continuous maintenance of the persisted IVF-PQ ANN index (v15's
    * table) from an embeddings stream: each micro-batch computes its own
    * `(vec_id, cell, code)` index rows — per-vector arithmetic over
    * literal centroids/codebook, no cross-batch state — and MERGES them
    * on vec_id, so redelivered vectors upsert idempotently and the index
    * converges to exactly the full-corpus build regardless of batch
    * boundaries. The serving tier reads the snapshot table between
    * merges; nothing here ever touches the driver.
    *
    * Scale shape: per batch, O(batch) encode work + a keyed merge that
    * rewrites only matched partitions — the continuous version of the
    * nightly index refresh, at ~12 B of persisted index per vector. */
  def annIndexIngest(streamingEmbeddings: DataFrame, root: String,
                     checkpointDir: String): StreamingQuery =
    streamingEmbeddings.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        graft.functions.GraftFunctions.ensureRegistered(spark)
        SnapshotStore.merge(spark, s"$root/ann_index",
          graft.queries.PipelineQueries.ivfpqIndexRows(batch), Seq("vec_id"))
      }
      .start()

  /** Continuous SCD2 dimension maintenance: each micro-batch folds into
    * the type-2 history via [[graft.incremental.Scd2.mergeBatch]]. A
    * stored high-water mark enforces Scd2's strict-append contract
    * against what streaming actually delivers: redelivered micro-batches
    * (failure replay) and rows older than anything ingested are dropped
    * before the fold — the streaming analog of the watermarked-dedup
    * guard, persisted so it survives restarts.
    *
    * Scale shape: per batch, one metadata-sized high-water-mark read +
    * 1-row write; the fold itself touches only open rows of batch-touched
    * keys (see Scd2). */
  def scd2Ingest(streamingEvents: DataFrame, root: String, checkpointDir: String,
                 key: String, ts: String, tie: String, state: String): StreamingQuery =
    streamingEvents.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        scd2Batch(batch, root, key, ts, tie, state)
      }
      .start()

  /** One micro-batch (or one incremental run) of [[scd2Ingest]]. */
  def scd2Batch(batch: DataFrame, root: String, key: String, ts: String,
                tie: String, state: String): Unit = {
    val spark = batch.sparkSession
    val fresh = (SnapshotStore.read(spark, s"$root/hwm") match {
      case Some(h) => batch.crossJoin(broadcast(h))
        .filter(col(ts) > col("__hwm")).drop("__hwm")
      case None => batch
    }).localCheckpoint() // feeds the null-check, the fold and the new mark
    if (!fresh.agg(max(col(ts))).head().isNullAt(0)) {
      graft.incremental.Scd2.mergeBatch(spark, s"$root/dim", fresh,
        key, ts, tie, state)
      SnapshotStore.merge(spark, s"$root/hwm",
        fresh.agg(max(col(ts)).as("__hwm")).withColumn("__k", lit(1)),
        Seq("__k"))
    }
  }

  /** Continuous test-set decontamination — a STREAM-STATIC join: incoming
    * documents explode to 8-gram hashes (stateless, stays in the stream's
    * scan stage) and meet the static eval-set gram table as a BROADCAST
    * hash join inside the continuous query; newly contaminated
    * (train, eval) pairs are emitted append-only.
    *
    * Scale shape: the static side is benchmark-sized, broadcast once per
    * (re)plan; per-micro-batch work is linear in the batch; the only
    * streaming state is the dedup over DISCOVERED pairs — bounded by
    * actual contamination, not the corpus. */
  def decontaminateStream(streamingDocs: DataFrame, evalDocs: DataFrame): DataFrame = {
    import graft.queries.PipelineQueries.decontGrams
    decontGrams(streamingDocs, "train_id")
      .join(broadcast(decontGrams(evalDocs, "eval_id")), "g")
      .select(col("train_id"), col("eval_id"))
      .dropDuplicates("train_id", "eval_id")
  }

  /** Watermarked tumbling daily aggregate over a raw event stream:
    * `sum(value) group by (1-day window, event_type)` with `lateness`
    * allowed out-of-order arrival (§2.9 "window re-aggregation"). */
  def dailyVolumes(streamingEvents: DataFrame, valueExpr: String,
                   lateness: String = "2 days"): DataFrame =
    streamingEvents
      .withColumn("event_time", timestamp_millis(col("timestamp_ms")))
      .withWatermark("event_time", lateness)
      .groupBy(window(col("event_time"), "1 day").as("day"), col("event_type"))
      .agg(sum(expr(valueExpr)).as("volume"), count(lit(1)).as("n_events"))
      .select(to_date(col("day.start")).as("snapshot_date"),
        col("event_type"), col("volume"), col("n_events"))

  /** Event-time SESSIONIZATION over a raw event stream — the gap-closed
    * activity-session shape (funnel/engagement analytics) via Spark's
    * native `session_window`: per-key windows `[t, t+gap)` that MERGE
    * whenever they overlap, across micro-batch boundaries, carried in the
    * streaming state store. In append mode a session is emitted exactly
    * once — when the watermark proves no event can extend it. Input
    * carries epoch-µs longs (`ts_us`) because the driver's events table
    * is µs-grained; all boundary arithmetic stays in integer µs so the
    * batch oracle can reproduce it exactly. State is O(open sessions per
    * key), bounded by (#keys × lateness) — never stream length. */
  def userSessions(streamingEvents: DataFrame, gap: String = "12 hours",
                   lateness: String = "2 days"): DataFrame =
    streamingEvents
      .withColumn("event_time", timestamp_micros(col("ts_us")))
      .withWatermark("event_time", lateness)
      .groupBy(session_window(col("event_time"), gap).as("s"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("s.start")).as("session_start_us"),
        unix_micros(col("s.end")).as("session_end_us"),
        col("n_events"))
}
