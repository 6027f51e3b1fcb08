package graft.streaming

import graft.SparkSpec
import graft.fixtures.DeepbookFixtures
import graft.incremental.SnapshotStore
import graft.models.EventModels
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.Sources
import java.nio.file.Files

/** §2.9 streaming semantics: the foreachBatch merge ingest is idempotent
  * under redelivery and converges to the batch projection; the
  * watermarked daily window aggregates match the batch group-by. */
class StreamingIngestSpec extends SparkSpec {

  private val model = EventModels.loanBorrowed
  private lazy val fixtureEvents =
    DeepbookFixtures.events(spark).collect().toSeq

  private def rowStream(): MemoryStream[Row] = {
    implicit val enc: ExpressionEncoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(Sources.suiEventsSchema))
    new MemoryStream[Row](42, spark)
  }

  test("streaming ingest: merge sink converges to the batch projection, dedup under redelivery") {
    val root = Files.createTempDirectory("graft-stream").toString
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val input = rowStream()
    val q = StreamingIngest.ingest(model, input.toDF(), root, ckpt, DeepbookFixtures.now)
    try {
      val (early, late) = fixtureEvents.splitAt(fixtureEvents.size / 2)
      input.addData(early)
      q.processAllAvailable()
      // redeliver an overlap plus the remainder — merge must dedup
      input.addData(early.takeRight(10) ++ late)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = SnapshotStore.read(spark, root).get
      .drop("updated_at").collect().map(_.toSeq.map(String.valueOf)).toSet
    val batch = model
      .project(DeepbookFixtures.events(spark), DeepbookFixtures.now)
      .drop("updated_at").collect().map(_.toSeq.map(String.valueOf)).toSet
    assert(streamed == batch)
  }

  test("streaming scd2: redeliveries and too-late rows drop; result equals the one-shot build") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-scd2stream").toString
    def batch(rows: Seq[(Long, Long, Long, String)]) =
      StreamingIngest.scd2Batch(rows.toDF("k", "ts", "eid", "st"),
        root, "k", "ts", "eid", "st")
    batch(Seq((1L, 10L, 0L, "a"), (1L, 20L, 1L, "b")))
    // replay of (1,20,b), a too-late (1,5) and genuinely new rows
    batch(Seq((1L, 20L, 1L, "b"), (1L, 5L, 9L, "z"),
      (2L, 30L, 2L, "x"), (1L, 40L, 3L, "c")))
    // an entire redelivered micro-batch must be a no-op
    batch(Seq((2L, 30L, 2L, "x"), (1L, 40L, 3L, "c")))
    val got = SnapshotStore.read(spark, s"$root/dim").get
      .as[(Long, Int, String, Long, Option[Long])].collect().toSet
    val oneShot = graft.incremental.Scd2.build(
      Seq((1L, 10L, 0L, "a"), (1L, 20L, 1L, "b"), (2L, 30L, 2L, "x"),
        (1L, 40L, 3L, "c")).toDF("k", "ts", "eid", "st"), "k", "ts", "eid", "st")
      .as[(Long, Int, String, Long, Option[Long])].collect().toSet
    assert(got == oneShot)
    assert(got == Set((1L, 1, "a", 10L, Some(20L)), (1L, 2, "b", 20L, Some(40L)),
      (1L, 3, "c", 40L, None), (2L, 1, "x", 30L, None)))
  }

  test("streaming near-dup finds within-batch, cross-batch and redelivered pairs exactly once") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-nd").toString
    val ckpt = Files.createTempDirectory("graft-nd-ckpt").toString
    val base = "the quick brown fox jumps over the lazy dog and keeps running far away"
    val docs = Seq(
      1L -> base,                                  // batch 1
      2L -> (base + " tail"),                      // batch 1: near-dup of 1
      3L -> "completely different words about spark catalyst tungsten codegen stages",
      4L -> (base + " extra"),                     // batch 2: near-dup of 1 AND 2
      5L -> "another unrelated document mentioning parquet row groups and shuffles")
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(
      new org.apache.spark.sql.types.StructType()
        .add("doc_id", "long").add("text", "string")))
    val input = new MemoryStream[Row](43, spark)
    val q = StreamingIngest.nearDupIngest(input.toDF(), root, ckpt)
    try {
      input.addData(docs.take(3).map(d => Row(d._1, d._2)))
      q.processAllAvailable()
      // batch 2 includes a REDELIVERY of doc 2 — pairs must not duplicate
      input.addData((docs.drop(3) :+ docs(1)).map(d => Row(d._1, d._2)))
      q.processAllAvailable()
    } finally q.stop()
    val pairs = SnapshotStore.read(spark, s"$root/nd_pairs").get
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 4L), (2L, 4L)), pairs)
    // and the pair values match the batch d2 semantics on the full corpus
    val jacPpm = SnapshotStore.read(spark, s"$root/nd_pairs").get
      .filter(col("a_id") === 1 && col("b_id") === 2)
      .select("jaccard_ppm").head().getLong(0)
    assert(jacPpm >= 500000L && jacPpm <= 1000000L)
  }

  test("stream-static decontamination flags exactly the docs sharing a gram with the eval set") {
    val sharedA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val sharedB = "one two three four five six seven eight nine ten eleven"
    val evalDocs = Seq(100L -> sharedA, 101L -> sharedB)
    val streamDocs = Seq(
      1L -> (sharedA + " tail words here"),       // batch 1: contaminated by 100
      2L -> "clean text with plenty of original words nobody else wrote today",
      3L -> ("prefix words " + sharedB),          // batch 2: contaminated by 101
      4L -> "another clean document long enough to produce several grams overall")
    val schema = new org.apache.spark.sql.types.StructType()
      .add("doc_id", "long").add("text", "string")
    implicit val enc: ExpressionEncoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(schema))
    val input = new MemoryStream[Row](44, spark)
    val evalDf = spark.createDataFrame(
      spark.sparkContext.parallelize(evalDocs.map(d => Row(d._1, d._2))), schema)
    val q = StreamingIngest.decontaminateStream(input.toDF(), evalDf)
      .writeStream.format("memory").queryName("decont")
      .outputMode("append").start()
    try {
      input.addData(streamDocs.take(2).map(d => Row(d._1, d._2)))
      q.processAllAvailable()
      // batch 2 REDELIVERS doc 1 — the pair must not be emitted again
      input.addData((streamDocs.drop(2) :+ streamDocs.head).map(d => Row(d._1, d._2)))
      q.processAllAvailable()
    } finally q.stop()
    val hits = spark.table("decont").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(hits.size == hits.distinct.size, "pair emitted twice")
    assert(hits.toSet == Set((1L, 100L), (3L, 101L)), hits.toString)
  }

  test("watermarked streaming dedup emits each (digest, index) exactly once") {
    val input = rowStream()
    val q = StreamingIngest.dedupEvents(input.toDF())
      .select("transaction_digest", "event_index")
      .writeStream.format("memory").queryName("dedup_ev")
      .outputMode("append").start()
    try {
      val (b1, b2) = fixtureEvents.splitAt(fixtureEvents.size / 2)
      input.addData(b1)
      q.processAllAvailable()
      input.addData(b1.takeRight(20) ++ b2) // redeliver an overlap
      q.processAllAvailable()
    } finally q.stop()
    val emitted = spark.table("dedup_ev").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(emitted.size == emitted.distinct.size, "duplicates emitted")
    assert(emitted.toSet ==
      fixtureEvents.map(r => (r.getString(0), r.getLong(1))).toSet)
  }

  test("flatMapGroupsWithState running position folds state across batches") {
    val input = rowStream()
    val q = StreamingIngest.runningNetPosition(input.toDF())
      .writeStream.format("memory").queryName("net_pos")
      .outputMode("update").start()
    try {
      val (b1, b2) = fixtureEvents.splitAt(fixtureEvents.size / 2)
      input.addData(b1)
      q.processAllAvailable()
      input.addData(b2)
      q.processAllAvailable()
    } finally q.stop()
    // final state per pool (last update wins) must equal the batch fold
    val finalState = spark.table("net_pos")
      .groupBy("margin_pool_id")
      .agg(max(struct(col("n_events"), col("net_supplied"))).as("s"))
      .select(col("margin_pool_id"), col("s.net_supplied"), col("s.n_events"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val sup = s"${EventModels.pkg}::margin_pool::AssetSupplied"
    val wdr = s"${EventModels.pkg}::margin_pool::AssetWithdrawn"
    val expected = DeepbookFixtures.events(spark)
      .filter(col("event_type").isin(sup, wdr))
      .select(get_json_object(col("event_json"), "$.margin_pool_id").as("pool"),
        when(col("event_type") === sup,
          get_json_object(col("event_json"), "$.supply_amount").try_cast("double"))
          .otherwise(-get_json_object(col("event_json"), "$.withdraw_amount")
            .try_cast("double")).as("delta"))
      .groupBy("pool").agg(sum("delta").as("net"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(finalState == expected)
  }

  test("watermarked daily window aggregate matches the batch group-by") {
    val input = rowStream()
    val agg = StreamingIngest.dailyVolumes(input.toDF(),
      "try_cast(get_json_object(event_json, '$.loan_amount') as double)")
    val q = agg.writeStream.format("memory").queryName("daily_vol")
      .outputMode("complete").start()
    try {
      input.addData(fixtureEvents)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("daily_vol")
      .collect().map(_.toSeq.map(String.valueOf)).toSet
    val batch = DeepbookFixtures.events(spark)
      .groupBy(to_date(timestamp_millis(col("timestamp_ms"))).as("snapshot_date"),
        col("event_type"))
      .agg(sum(expr("try_cast(get_json_object(event_json, '$.loan_amount') as double)"))
        .as("volume"), count(lit(1)).as("n_events"))
      .collect().map(_.toSeq.map(String.valueOf)).toSet
    assert(streamed == batch)
  }

  test("ingest restarts from its checkpoint: committed work not reprocessed, nothing lost") {
    val src = Files.createTempDirectory("graft-restart-src").toString
    val root = Files.createTempDirectory("graft-restart-tbl").toString
    val ckpt = Files.createTempDirectory("graft-restart-ckpt").toString
    val (a, b) = fixtureEvents.splitAt(fixtureEvents.size / 2)
    def writeSlice(rows: Seq[Row]): Unit =
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
        Sources.suiEventsSchema).coalesce(1).write.mode("append").parquet(src)
    def startQuery() = StreamingIngest.ingest(model,
      spark.readStream.schema(Sources.suiEventsSchema).parquet(src),
      root, ckpt, DeepbookFixtures.now)
    // run 1: first half, committed, query STOPPED (simulated shutdown)
    writeSlice(a)
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    val gensAfterRun1 = SnapshotStore.snapshots(root).size
    assert(gensAfterRun1 >= 1)
    // run 2: a NEW query on the same checkpoint — the file source's
    // committed offsets must make it process ONLY the new file
    writeSlice(b)
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    assert(SnapshotStore.snapshots(root).size == gensAfterRun1 + 1,
      "restart must resume at the committed offset: exactly one new " +
        "micro-batch (a replay of run 1's files would add more merges)")
    val streamed = SnapshotStore.read(spark, root).get
      .drop("updated_at").collect().map(_.toSeq.map(String.valueOf)).toSet
    val batch = model
      .project(DeepbookFixtures.events(spark), DeepbookFixtures.now)
      .drop("updated_at").collect().map(_.toSeq.map(String.valueOf)).toSet
    assert(streamed == batch, "post-restart table must equal the batch build")
  }

  test("stream-stream loan-lifecycle join equals the batch join and spans micro-batches") {
    val ckpt = Files.createTempDirectory("graft-sjoin-ckpt").toString
    val out = Files.createTempDirectory("graft-sjoin-out").toString
    val bound = graft.TrinoFns.backfillBoundMs(DeepbookFixtures.now, 30)
    val rows = fixtureEvents.sortBy(r => (r.getLong(2), r.getString(0), r.getLong(1)))
    val third = rows.size / 3
    val input = rowStream()
    val bounded = input.toDF().filter(col("timestamp_ms") >= bound)
    val joined = StreamingIngest.loanLifecycle(bounded, bounded, DeepbookFixtures.now)
    val q = joined.writeStream.format("parquet")
      .option("path", s"$out/pairs").option("checkpointLocation", ckpt).start()
    try {
      input.addData(rows.take(third)); q.processAllAvailable()
      input.addData(rows.slice(third, 2 * third)); q.processAllAvailable()
      input.addData(rows.drop(2 * third)); q.processAllAvailable()
    } finally q.stop()
    def key(r: Row) = (r.getAs[String]("borrow_digest"), r.getAs[Long]("borrow_index"),
      r.getAs[String]("repay_digest"), r.getAs[Long]("repay_index"))
    val streamed = spark.read.parquet(s"$out/pairs").collect().map(key).toSet
    // the one-shot batch join with the same keys and range
    val ev = DeepbookFixtures.events(spark).filter(col("timestamp_ms") >= bound)
    val b = EventModels.loanBorrowed.project(ev, DeepbookFixtures.now)
    val r = EventModels.loanRepaid.project(ev, DeepbookFixtures.now)
      .select(col("transaction_digest").as("r_digest"), col("event_index").as("r_index"),
        col("margin_manager_id").as("r_mgr"), col("margin_pool_id").as("r_pool"),
        col("timestamp_ms").as("r_ts"))
    val expected = b.join(r,
        col("margin_manager_id") === col("r_mgr") &&
          col("margin_pool_id") === col("r_pool") &&
          col("r_ts") >= col("timestamp_ms") &&
          col("r_ts") <= col("timestamp_ms") + lit(3L * 86400000L))
      .select(col("transaction_digest"), col("event_index"),
        col("r_digest"), col("r_index"))
      .collect().map(x => (x.getString(0), x.getLong(1), x.getString(2), x.getLong(3)))
      .toSet
    assert(expected.nonEmpty && streamed == expected)
    // NON-VACUITY of the dag_stream_join gate: at least one match must pair
    // a borrow and a repay delivered in DIFFERENT micro-batches — i.e. the
    // engine held join state across a batch boundary. If a fixture change
    // ever makes every pair co-batch, the gate stops testing state; fail here.
    val batchOf = rows.zipWithIndex.map { case (e, i) =>
      (e.getString(0), e.getLong(1)) -> (if (i < third) 0 else if (i < 2 * third) 1 else 2)
    }.toMap
    val spanning = expected.count { case (bd, bi, rd, ri) =>
      batchOf((bd, bi)) != batchOf((rd, ri))
    }
    assert(spanning > 0, "no matched pair spans micro-batches - gate is vacuous")
  }

  test("count-min commit is idempotent under foreachBatch re-execution " +
      "(crash between grid and seen commits must not double-count)") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-cmcrash").toString
    val docs = Seq(
      (1L, "alpha beta beta gamma"), (2L, "beta gamma delta"),
      (3L, "alpha alpha epsilon"), (4L, "gamma gamma gamma zeta"),
      (5L, "delta epsilon zeta eta")).toDF("doc_id", "text")
    val b0 = docs.filter(col("doc_id") <= 2)
    // batch 1 REDELIVERS doc 2 (source-level replay: the seen-table's job)
    val b1 = docs.filter(col("doc_id") >= 2)
    StreamingIngest.countMinBatch(b0, root, 0L)
    // crash-injection: batch 1 commits its grid delta, dies BEFORE the
    // seen commit — then the checkpointed sink re-executes the batch
    StreamingIngest.countMinBatch(b1, root, 1L, commitSeen = false)
    StreamingIngest.countMinBatch(b1, root, 1L)
    // and a full post-commit replay (checkpoint not yet advanced)
    StreamingIngest.countMinBatch(b1, root, 1L)
    val streamed = StreamingIngest.countMinGrid(spark, root).get
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val oneShot = graft.queries.PipelineQueries.cmCells(
      docs.select(explode(split(lower(col("text")), " ")).as("tok"))
        .filter(length(col("tok")) > 0))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed == oneShot,
      "replayed batch must upsert its delta, not re-add it")
  }

  test("ddsketch commit is idempotent under foreachBatch re-execution " +
      "(crash between grid and seen commits must not double-count)") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-ddcrash").toString
    val docs = Seq(
      (1L, "s1", 7L), (2L, "s1", 200L), (3L, "s2", 15L),
      (4L, "s2", 16L), (5L, "s1", 4096L)).toDF("doc_id", "source", "n_chars")
    val b0 = docs.filter(col("doc_id") <= 2)
    // batch 1 REDELIVERS doc 2 (source-level replay: the seen-table's job)
    val b1 = docs.filter(col("doc_id") >= 2)
    StreamingIngest.ddSketchBatch(b0, root, 0L)
    // crash-injection: batch 1 commits its grid delta, dies BEFORE the
    // seen commit — then the checkpointed sink re-executes the batch
    StreamingIngest.ddSketchBatch(b1, root, 1L, commitSeen = false)
    StreamingIngest.ddSketchBatch(b1, root, 1L)
    // and a full post-commit replay (checkpoint not yet advanced)
    StreamingIngest.ddSketchBatch(b1, root, 1L)
    val streamed = StreamingIngest.ddSketchGrid(spark, root).get
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    val oneShot = graft.queries.PipelineQueries.ddGrid(spark,
      docs.filter(col("n_chars") >= 1)
        .select(col("source").as("g"), col("n_chars").as("v")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)) -> r.getLong(4)).toMap
    assert(streamed == oneShot,
      "replayed batch must upsert its delta, not re-add it")
  }

  test("streamed priority sample is replay-proof by algebra: bounded-state " +
      "min-k merge makes redelivery and re-execution no-ops") {
    import spark.implicits._
    import graft.queries.PipelineQueries
    val root = Files.createTempDirectory("graft-k10crash").toString
    // 24 docs in source s1 (> k+1 = 17, so τ exists and rows FALL OUT of
    // the top), 3 in s2 (≤ k: τ = 0, estimates exact)
    val docs = (1L to 24L).map(i => (i, "s1", 10L * i))
      .++(Seq((100L, "s2", 7L), (101L, "s2", 9L), (102L, "s2", 11L)))
      .toDF("doc_id", "source", "n_chars")
    val b0 = docs.filter(col("doc_id") <= 12)
    // batch 1 REDELIVERS docs 10-12 — and unlike count-min, NOTHING
    // guards it: the deduped min-k union is the whole replay story
    val b1 = docs.filter(col("doc_id") >= 10)
    StreamingIngest.prioritySampleBatch(b0, root)
    StreamingIngest.prioritySampleBatch(b1, root)
    // full post-commit re-executions (checkpoint not yet advanced)
    StreamingIngest.prioritySampleBatch(b1, root)
    StreamingIngest.prioritySampleBatch(b1, root)
    val served = PipelineQueries.k10Serve(
      graft.incremental.SnapshotStore.read(spark, s"$root/k10_sample").get)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(5))).toSet
    val rows = docs.select(col("source").as("g"), col("doc_id"),
      col("n_chars").as("wt")).withColumn("h", PipelineQueries.k10Hash)
    val oneShot = PipelineQueries.k10Serve(
      PipelineQueries.k10Ranked(rows)
        .select(col("g"), col("doc_id"), col("wt"), col("h"), col("rk")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(5))).toSet
    assert(served == oneShot,
      "replayed/redelivered batches must leave the min-k state at the one-shot sample")
    // the small source's estimates are EXACT (τ = 0 ⇒ ŵ = w), pinned in
    // 1e-6 units; the large source's τ > 0 so its sample is genuinely
    // bounded (16 of 24 rows)
    val s2 = served.filter(_._1 == "s2")
    assert(s2.size == 3 && s2.forall { case (_, _, _, w, est) => est == w * 1000000L })
    assert(served.count(_._1 == "s1") == PipelineQueries.K10k)
  }

  test("streamed HLL is replay-proof by algebra: max-merge makes any re-execution a no-op") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-hllcrash").toString
    val docs = Seq(
      (1L, "alpha beta beta gamma"), (2L, "beta gamma delta"),
      (3L, "alpha alpha epsilon"), (4L, "gamma gamma gamma zeta"),
      (5L, "delta epsilon zeta eta")).toDF("doc_id", "text")
    val b0 = docs.filter(col("doc_id") <= 2)
    // batch 1 REDELIVERS doc 2 — and unlike count-min, NOTHING guards it:
    // the idempotent max-merge is the whole replay story
    val b1 = docs.filter(col("doc_id") >= 2)
    StreamingIngest.hllBatch(b0, root)
    StreamingIngest.hllBatch(b1, root)
    // full post-commit re-executions (checkpoint not yet advanced) —
    // every crash point is the same case because there is only ONE commit
    StreamingIngest.hllBatch(b1, root)
    StreamingIngest.hllBatch(b1, root)
    val streamed = graft.incremental.SnapshotStore.read(spark, s"$root/hll_grid").get
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val oneShot = graft.queries.PipelineQueries.hllGrid(spark,
      docs.select(explode(split(lower(col("text")), " ")).as("tok"))
        .filter(length(col("tok")) > 0))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == oneShot,
      "re-executed batches must leave the max-merged grid unchanged")
  }

  test("streamed day partials are replay-proof by algebra: per-cell min-k merge " +
      "makes redelivery and re-execution no-ops, and the filled cell stays k-bounded") {
    import spark.implicits._
    import graft.queries.PipelineQueries
    val root = Files.createTempDirectory("graft-k12crash").toString
    // 12 users on day-1/type-A (> k = 8: that cell FILLS and values fall
    // out of the min-k), 3 on day-2/type-A, 4 on day-1/type-B
    val ts1 = java.sql.Timestamp.valueOf("2024-01-05 10:00:00")
    val ts2 = java.sql.Timestamp.valueOf("2024-01-06 10:00:00")
    val events = ((1L to 12L).map(u => (u, ts1, u, "A")) ++
      (21L to 23L).map(u => (100L + u, ts2, u, "A")) ++
      (31L to 34L).map(u => (200L + u, ts1, u, "B")))
      .toDF("event_id", "ts", "user_id", "event_type")
    val b0 = events.filter(col("event_id") <= 6)
    // batch 1 REDELIVERS events 4-6; then two full post-commit
    // re-executions (checkpoint not yet advanced) — nothing guards any
    // of it except the per-cell min-k union itself
    val b1 = events.filter(col("event_id") >= 4)
    StreamingIngest.dailyRollupBatch(b0, root)
    StreamingIngest.dailyRollupBatch(b1, root)
    StreamingIngest.dailyRollupBatch(b1, root)
    StreamingIngest.dailyRollupBatch(b1, root)
    val served = SnapshotStore.read(spark, s"$root/k12_partials").get
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getInt(2), r.getLong(3))).toSet
    val oneShot = PipelineQueries.k12DaySketch(
        PipelineQueries.k12DailyValues(events))
      .select(col("g"), col("day"), col("rk"), col("h"))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getInt(2), r.getLong(3))).toSet
    assert(served == oneShot,
      "replayed/redelivered batches must leave the partial table at the one-shot sketch")
    assert(served.count(t => t._1 == "A" && t._2 == "2024-01-05")
      == PipelineQueries.K12k, "the over-full cell must hold exactly k rows")
    assert(served.count(t => t._1 == "A" && t._2 == "2024-01-06") == 3,
      "the small cell is its own value set (exact mode)")
  }
}
