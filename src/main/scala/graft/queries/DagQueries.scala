package graft.queries

import graft.Sources
import graft.fixtures.DeepbookFixtures
import graft.incremental.{RunContext, RunMode, SnapshotStore}
import graft.models.{DeepbookPipeline, EventModels, PoolDailyFct, PoolObjectStg}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The REAL DeepBook model DAG run full-refresh over the deterministic
  * fixtures (`/root/repo/fixtures`), exposed as oracle-checkable driver
  * queries — one entry per dbt model in the reference
  * (`models/deepbook_margin/` events, objects and daily SQL files).
  *
  * The `sfDir` argument is ignored: these queries run on the DAG fixtures
  * (FIXTURES.md), not the TPC-H stand-ins, so the oracle SQL reads the
  * same fixture parquet via absolute `read_parquet` paths.
  *
  * Non-deterministic/derived-timestamp columns (`updated_at` — F7 — and
  * the `msToTs` convenience timestamps, whose semantics are already
  * oracle-covered by `f_time_fns`) are projected out; epoch-ms and DATE
  * columns stay in.
  */
object DagQueries {

  type Q = (SparkSession, String) => DataFrame

  private def ctx(spark: SparkSession): RunContext =
    RunContext(spark, DeepbookFixtures.ensureWritten(spark),
      RunMode.FullRefresh, DeepbookFixtures.now)

  private def noRef(name: String): DataFrame =
    sys.error(s"unexpected ref('$name') in a root model")

  private def eventQ(m: EventModels.EventModel): Q = (spark, _) =>
    m.build(ctx(spark), None, noRef)
      .drop("updated_at")
      .orderBy("transaction_digest", "event_index")

  val stgQ: Q = (spark, _) =>
    PoolObjectStg.build(ctx(spark), None, noRef)
      .drop("updated_at", "block_timestamp", "last_update_timestamp",
        "rate_limiter_last_updated_timestamp")
      .orderBy("object_id", "version")

  val fctQ: Q = (spark, _) => {
    val c = ctx(spark)
    val upstream: Map[String, DataFrame] =
      (EventModels.all.map(m => m.name -> m.build(c, None, noRef)) :+
        (PoolObjectStg.name -> PoolObjectStg.build(c, None, noRef))).toMap
    PoolDailyFct.build(c, None, upstream.apply)
      .drop("updated_at")
      .orderBy("snapshot_date", "margin_pool_id")
  }

  /** The DAG run INCREMENTALLY — two watermarked batches through the real
    * Runner + partition-scoped merge sink (S6/P3/P5/§2.9) — emitting the
    * final fct. Oracle = the declarative fct recomputation, minus the
    * `daily_*_change` lag columns, which the reference itself re-NULLs at
    * the lookback-window boundary on every incremental run (see
    * PoolDailyFct scaladoc + IncrementalEquivSpec); everything else must
    * match the full-refresh result exactly. Puts the merge protocol
    * itself inside the driver's correctness gate. */
  private def incrementalQ(maintenance: Boolean, skipRead: Boolean = false): Q =
    (spark, _) => {
    val full = DeepbookFixtures.ensureWritten(spark)
    val cutoffMs = java.time.Instant.parse("2026-01-06T23:59:59Z").toEpochMilli
    val slice = Sources { name =>
      val df = full(name)
      val tsCol = if (name == "prices.day") unix_millis(col("timestamp"))
                  else col("timestamp_ms")
      df.filter(tsCol <= cutoffMs)
    }
    // unique tree per invocation (concurrent verify sessions must not
    // corrupt each other's snapshots), deleted before returning — the
    // result is materialized off it first via localCheckpoint
    val root = java.nio.file.Files.createTempDirectory("graft-daginc").toString
    try {
      val runner = DeepbookPipeline.runner(root, maintenance)
      runner.run(RunContext(spark, slice, RunMode.Incremental, DeepbookFixtures.now))
      runner.run(RunContext(spark, full, RunMode.Incremental, DeepbookFixtures.now))
      val table = s"$root/${PoolDailyFct.name}"
      val base =
        if (skipRead) {
          // the data-skipping reader over the maintenance run's sidecar;
          // the snapshot_date filter is a pushed data filter resolved
          // against per-file min/max stats, not just _dt partition pruning
          val (df, idx) = SnapshotStore.readSkipping(spark, table).get
          require(idx.nonEmpty,
            "maintenance run must have produced a stats sidecar")
          df.filter(col("snapshot_date") >= lit(java.sql.Date.valueOf("2026-01-05")))
        } else SnapshotStore.read(spark, table).get
      base
        .drop("updated_at",
          "daily_supply_change", "daily_borrow_change", "daily_utilization_change")
        .localCheckpoint()
        .orderBy("snapshot_date", "margin_pool_id")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  val fctIncrementalQ: Q = incrementalQ(maintenance = false)

  /** E3 under INCREMENTAL state: the README "Total TVL Across All Pools"
    * consumption query (`/root/reference/README.md:77-98`) served from
    * the STORE table AFTER two watermarked incremental runs — merge +
    * 7-day-lookback re-aggregation through the real Runner, then the
    * exact `dbt show` SQL over the published snapshot. This is the state
    * a real Dune user queries (the other `dag_show_*` gates run over
    * full-refresh builds). Oracle = the same SQL over the declaratively
    * recomputed fct: the merge protocol must be INVISIBLE to the
    * consumption surface. The TVL query touches no lag column, so the
    * lookback-boundary re-NULLing that exempts the lag trio from the
    * incremental oracle (see [[incrementalQ]]) cannot leak in here. */
  val showTvlIncrementalQ: Q = (spark, _) => {
    val full = DeepbookFixtures.ensureWritten(spark)
    val cutoffMs = java.time.Instant.parse("2026-01-06T23:59:59Z").toEpochMilli
    val slice = Sources { name =>
      val df = full(name)
      val tsCol = if (name == "prices.day") unix_millis(col("timestamp"))
                  else col("timestamp_ms")
      df.filter(tsCol <= cutoffMs)
    }
    val root = java.nio.file.Files.createTempDirectory("graft-dagtvl").toString
    try {
      val runner = DeepbookPipeline.runner(root)
      runner.run(RunContext(spark, slice, RunMode.Incremental, DeepbookFixtures.now))
      runner.run(RunContext(spark, full, RunMode.Incremental, DeepbookFixtures.now))
      SnapshotStore.read(spark, s"$root/${PoolDailyFct.name}").get
        .createOrReplaceTempView("fct_pool_daily_store")
      spark.sql(
        """SELECT snapshot_date,
          |       sum(CAST(floor(total_supply_usd * 1000000.0 + 0.5) AS BIGINT))
          |         AS total_tvl_usd_e6,
          |       sum(CAST(floor(total_borrow_usd * 1000000.0 + 0.5) AS BIGINT))
          |         AS total_borrowed_usd_e6
          |FROM fct_pool_daily_store
          |GROUP BY 1
          |ORDER BY 1 DESC""".stripMargin)
        .localCheckpoint() // materialized before the temp tree is deleted
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  /** The Bloom file-skipping index inside the hard gate: the
    * loan_borrowed model materializes through the merge sink (one file
    * per event date), [[SnapshotStore.analyzeBloom]] indexes
    * `transaction_digest`, and a point lookup of the (deterministic)
    * minimum digest must return exactly the model's rows for that digest
    * — through the skipping reader, with the index REQUIRED to have
    * pruned files (digest [min,max] ranges span every file, so only the
    * Bloom layer can; partition pruning is idle, the filter is not on
    * the date). Oracle = the model body filtered to the same digest. */
  val bloomLookupQ: Q = (spark, _) => {
    val full = DeepbookFixtures.ensureWritten(spark)
    val model = EventModels.loanBorrowed
      .build(RunContext(spark, full, RunMode.FullRefresh, DeepbookFixtures.now),
        None, noRef)
      .drop("updated_at")
    val root = java.nio.file.Files.createTempDirectory("graft-dagbloom").toString
    try {
      val pd = expr("to_date(timestamp_seconds(timestamp_ms div 1000))")
      SnapshotStore.merge(spark, s"$root/tbl", model, Seq("transaction_digest",
        "event_index"), Some(pd))
      SnapshotStore.analyze(spark, s"$root/tbl", Seq("transaction_digest"))
      SnapshotStore.analyzeBloom(spark, s"$root/tbl", "transaction_digest")
      val target = model.agg(min(col("transaction_digest"))).head.getString(0)
      val (df, idx) = SnapshotStore.readSkipping(spark, s"$root/tbl").get
      val out = df.filter(col("transaction_digest") === target)
        .localCheckpoint() // materialized before the temp tree is deleted
        .orderBy("transaction_digest", "event_index")
      require(idx.exists(_.lastSkipped > 0),
        "the bloom index must prune digest-free files")
      out
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  /** dbt slim CI (`--select state:modified+`) inside the hard gate: the
    * full DAG builds and records its state artifact, an UNCHANGED project
    * must select nothing, then ONE root model's logic is touched (a
    * plan-visible, value-identical rewrite of `loan_amount`) and the
    * state diff must select EXACTLY that model plus its downstream fct —
    * nothing else. The selective rerun must republish exactly the
    * selected tables (sibling generations unchanged), carry the fct's
    * lookback-exterior partitions through by file identity, and land on
    * content equal to the full model DAG (the fct oracle, reused). */
  val stateModifiedQ: Q = (spark, _) => {
    import graft.incremental.{Manifest, Model, Runner, RunContext, RunMode}
    val full = DeepbookFixtures.ensureWritten(spark)
    val root = java.nio.file.Files.createTempDirectory("graft-dagstate").toString
    try {
      val c = RunContext(spark, full, RunMode.Incremental, DeepbookFixtures.now)
      val runner = DeepbookPipeline.runner(root)
      runner.run(c)
      runner.writeState(c, s"$root/_state")
      require(runner.stateModified(c, s"$root/_state").isEmpty,
        "an unchanged project must select nothing")
      // touch ONE root model's logic: plan-visible, value-identical
      // (x * 1.0 == x for every double, but the analyzed plan differs)
      val base = EventModels.loanBorrowed
      val touched: Model = new Model {
        def name = base.name
        def uniqueKey = base.uniqueKey
        override def partitionDate = base.partitionDate
        override def clusterBy = base.clusterBy
        override def refs = base.refs
        def build(bctx: RunContext, existing: Option[DataFrame],
                  ref: String => DataFrame): DataFrame =
          base.build(bctx, existing, ref)
            .withColumn("loan_amount", col("loan_amount") * lit(1.0))
      }
      val models2 = DeepbookPipeline.models
        .map(m => if (m.name == base.name) touched else m)
      val runner2 = new Runner(root, models2)
      val sel = runner2.stateModified(c, s"$root/_state")
      require(sel.map(_.name).toSet == Set(base.name, graft.models.PoolDailyFct.name),
        s"selection must be exactly the touched subtree, got ${sel.map(_.name)}")
      def gen(n: String): String =
        SnapshotStore.currentSnapshot(s"$root/$n").get
      def fctFiles(): Map[String, String] = {
        val fn = graft.models.PoolDailyFct.name
        Manifest.read(java.nio.file.Paths.get(s"$root/$fn", gen(fn))).get
          .files.map(f => f.path -> f.partitionValue.getOrElse("")).toMap
      }
      val gensBefore = models2.map(m => m.name -> gen(m.name)).toMap
      val fctBefore = fctFiles()
      new Runner(root, sel).run(c)
      val selNames = sel.map(_.name).toSet
      models2.foreach { m =>
        if (selNames(m.name))
          require(gen(m.name) != gensBefore(m.name), s"${m.name} must republish")
        else require(gen(m.name) == gensBefore(m.name),
          s"${m.name} is outside the selection and must be untouched")
      }
      // lookback-exterior fct partitions carry by FILE IDENTITY (the
      // incremental merge rewrites only the trailing window)
      val fctAfter = fctFiles()
      val minPart = fctBefore.values.filter(_.nonEmpty).min
      require(fctBefore.filter(_._2 == minPart).keySet.subsetOf(fctAfter.keySet),
        s"the earliest fct partition ($minPart) must carry through unrewritten")
      SnapshotStore.read(spark, s"$root/${graft.models.PoolDailyFct.name}").get
        .drop("updated_at",
          "daily_supply_change", "daily_borrow_change", "daily_utilization_change")
        .localCheckpoint() // materialized before the temp tree is deleted
        .orderBy("snapshot_date", "margin_pool_id")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  /** Watermark the two append batches split on (shared with the oracle). */
  private[queries] val AppendCutoffMs =
    java.time.Instant.parse("2026-01-06T23:59:59Z").toEpochMilli

  /** S7 inside the hard gate: the blind-append sink
    * (`incremental_strategy='append'`, `DEVELOPMENT.md:134-142`). Two
    * OVERLAPPING batches of the loan_borrowed event model are appended into
    * a date-partitioned log table — batch 1 is the pre-cutoff slice, batch
    * 2 the full model — and the read-back must contain the overlap TWICE:
    * append never dedups (that's merge's job), and every batch-1 file must
    * survive the second append via the snapshot hard-link. Oracle = the
    * model UNION ALL its pre-cutoff slice. */
  val appendLogQ: Q = (spark, _) => {
    val full = DeepbookFixtures.ensureWritten(spark)
    val model = EventModels.loanBorrowed
      .build(RunContext(spark, full, RunMode.FullRefresh, DeepbookFixtures.now),
        None, noRef)
      .drop("updated_at")
    val root = java.nio.file.Files.createTempDirectory("graft-dagappend").toString
    try {
      val pd = expr("to_date(timestamp_seconds(timestamp_ms div 1000))")
      SnapshotStore.append(spark, s"$root/log",
        model.filter(col("timestamp_ms") <= AppendCutoffMs), Some(pd))
      SnapshotStore.append(spark, s"$root/log", model, Some(pd))
      SnapshotStore.read(spark, s"$root/log").get
        .localCheckpoint() // materialized before the temp tree is deleted
        .orderBy("transaction_digest", "event_index")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  /** Change-data-feed inside the hard gate: two merges of the
    * loan_borrowed model (the pre-cutoff slice, then the full model —
    * batch 2 REDELIVERS every batch-1 row and adds the post-cutoff tail)
    * with `changeFeed = true`, then the full feed read back via
    * [[SnapshotStore.changes]]. Commit 1 must be all-`insert`; commit 2
    * must emit pre-/post-image pairs for every redelivered key (Delta
    * CDF's merge semantics: matched ⇒ update, content-diffing is the
    * consumer's concern) and `insert` for the genuinely new tail. Oracle =
    * the same three slices recomputed declaratively from the raw fixture
    * log. Gates that the feed is complete, correctly typed per commit,
    * and versioned — a partition-scoped merge that missed a matched key
    * (or double-counted one) breaks the hash. */
  val cdcFeedQ: Q = (spark, _) => {
    val full = DeepbookFixtures.ensureWritten(spark)
    val model = EventModels.loanBorrowed
      .build(RunContext(spark, full, RunMode.FullRefresh, DeepbookFixtures.now),
        None, noRef)
      .drop("updated_at")
    val root = java.nio.file.Files.createTempDirectory("graft-dagcdc").toString
    try {
      val pd = expr("to_date(timestamp_seconds(timestamp_ms div 1000))")
      val keys = Seq("transaction_digest", "event_index")
      SnapshotStore.merge(spark, s"$root/tbl",
        model.filter(col("timestamp_ms") <= AppendCutoffMs), keys, Some(pd),
        changeFeed = true)
      SnapshotStore.merge(spark, s"$root/tbl", model, keys, Some(pd),
        changeFeed = true)
      SnapshotStore.changes(spark, s"$root/tbl").get
        .localCheckpoint() // materialized before the temp tree is deleted
        .orderBy("_commit_version", "_change_type",
          "transaction_digest", "event_index")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  /** Row-level DELETE inside the hard gate: the full loan model is merged,
    * then a retention sweep deletes everything at or before the cutoff
    * (`changeFeed = true`). The output is the surviving table tagged
    * `live` UNION the feed's `delete` rows tagged `deleted` — so BOTH the
    * partition-scoped rewrite and the retraction feed must match DuckDB's
    * declarative split of the model at the cutoff. A row lost by the
    * rewrite, a survivor double-kept via a stale hard link, or a feed row
    * missing/duplicated all break the hash. */
  val deleteRetentionQ: Q = (spark, _) => {
    val full = DeepbookFixtures.ensureWritten(spark)
    val model = EventModels.loanBorrowed
      .build(RunContext(spark, full, RunMode.FullRefresh, DeepbookFixtures.now),
        None, noRef)
      .drop("updated_at")
    val root = java.nio.file.Files.createTempDirectory("graft-dagdel").toString
    try {
      val pd = expr("to_date(timestamp_seconds(timestamp_ms div 1000))")
      SnapshotStore.merge(spark, s"$root/tbl", model,
        Seq("transaction_digest", "event_index"), Some(pd))
      SnapshotStore.delete(spark, s"$root/tbl",
        col("timestamp_ms") <= AppendCutoffMs, changeFeed = true)
      val live = SnapshotStore.read(spark, s"$root/tbl").get
        .withColumn("_state", lit("live"))
      val deleted = SnapshotStore.changesFor(spark, s"$root/tbl", "snap-0000002").get
        .filter(col("_change_type") === "delete")
        .drop("_change_type", "_commit_version")
        .withColumn("_state", lit("deleted"))
      live.unionByName(deleted)
        .localCheckpoint() // materialized before the temp tree is deleted
        .orderBy("_state", "transaction_digest", "event_index")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  /** Time travel inside the hard gate: the same two merges, then BOTH
    * generations read back via [[SnapshotStore.readAt]] and unioned under
    * a version tag. Generation 1 must still be exactly the pre-cutoff
    * state after generation 2 superseded it — hard-linked carryover makes
    * an old snapshot a complete immutable view, and the second merge's
    * partition rewrites must not have leaked into it. Oracle = the slice
    * and the full model, each recomputed declaratively and tagged. */
  val timeTravelQ: Q = (spark, _) => {
    val full = DeepbookFixtures.ensureWritten(spark)
    val model = EventModels.loanBorrowed
      .build(RunContext(spark, full, RunMode.FullRefresh, DeepbookFixtures.now),
        None, noRef)
      .drop("updated_at")
    val root = java.nio.file.Files.createTempDirectory("graft-dagtt").toString
    try {
      val pd = expr("to_date(timestamp_seconds(timestamp_ms div 1000))")
      val keys = Seq("transaction_digest", "event_index")
      SnapshotStore.merge(spark, s"$root/tbl",
        model.filter(col("timestamp_ms") <= AppendCutoffMs), keys, Some(pd))
      SnapshotStore.merge(spark, s"$root/tbl", model, keys, Some(pd))
      val v1 = SnapshotStore.readAt(spark, s"$root/tbl", "snap-0000001").get
        .withColumn("_version", lit(1L))
      val v2 = SnapshotStore.readAt(spark, s"$root/tbl", "snap-0000002").get
        .withColumn("_version", lit(2L))
      v1.unionByName(v2)
        .localCheckpoint() // materialized before the temp tree is deleted
        .orderBy("_version", "transaction_digest", "event_index")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  /** S7/S8/S9 inside the hard gate: the same two-batch incremental run,
    * but with the prod target's maintenance post-hooks on — OPTIMIZE file
    * compaction + VACUUM retention after every model build
    * (`macros/dune_dbt_overrides/optimize_table.sql:1-5`,
    * `vacuum_table.sql:1-5`, `DEVELOPMENT.md:134-142`). Hash-matching the
    * same oracle as [[fctIncrementalQ]] proves compaction and retention
    * never corrupt what readers see. */
  val fctMaintenanceQ: Q = incrementalQ(maintenance = true)

  /** The data-skipping reader (`SnapshotStore.readSkipping` +
    * `_graft_stats.json` sidecar + `SkippingFileIndex`) inside the hard
    * gate: the maintenance run's table is read back through the pruning
    * index under a pushed `snapshot_date` filter and must hash-match the
    * declaratively recomputed oracle with the same WHERE — proof the
    * file-level pruning layer never changes what readers see. */
  val fctSkipReadQ: Q = incrementalQ(maintenance = true, skipRead = true)

  private def shortName(full: String): String =
    full.stripPrefix("deepbook_margin_")

  /** State-store parallelism for the fixture-fed streaming gates. The
    * stream-stream joins open FOUR state stores per partition per
    * micro-batch (left/right × keyToNumValues/keyWithIndexToValue), and
    * every stateful gate replays 3-7 micro-batches (data + watermark
    * sentinels + no-data batches), so at the session's 32 shuffle
    * partitions a single gate pays hundreds of HDFS-backed store
    * open/commit cycles to process a few thousand fixture rows — pure
    * fixed overhead, measured at ~60% of dag_stream_outer_join's wall
    * time. Partition count is a deployment dial, not semantics (state is
    * hash-partitioned by key; the checkpoint is fresh per run), so the
    * gates run at 4 and a production feed would size it to volume. */
  val StreamGatePartitions = 4

  /** Runs `body` with `spark.sql.shuffle.partitions` dialed to
    * [[StreamGatePartitions]], restoring the session value after — the
    * conf is read at streaming-query start and pinned into the fresh
    * checkpoint, so the override must bracket the whole build+drain.
    * NOT reentrant: the bracket mutates the SHARED session conf, so two
    * stream gates on one session must run sequentially (Verify/Bench
    * do). Concurrent gates would need a cloned `spark.newSession()`
    * per gate — but a clone's conf is NOT read by streams started from
    * frames built on the parent session, so the serialization below is
    * the deliberate choice: `synchronized` makes the constraint
    * structural instead of conventional. The monitor is a PRIVATE lock
    * owned by this object, not the session itself — foreign code using
    * the shared SparkSession as a monitor must never contend with (or
    * deadlock against) the gate bracket. */
  private val streamGateLock = new Object
  private def withStreamGateConf[A](spark: SparkSession)(body: => A): A =
    streamGateLock.synchronized {
      val key = "spark.sql.shuffle.partitions"
      val prev = spark.conf.get(key)
      spark.conf.set(key, StreamGatePartitions.toString)
      try body finally spark.conf.set(key, prev)
    }

  /** §2.9's Structured Streaming ingest inside the hard gate: the fixture
    * event stream replays as THREE MemoryStream micro-batches — with a
    * redelivered overlap between batches 1 and 2 — through
    * [[graft.streaming.StreamingIngest.ingest]] (`readStream` → the batch
    * model's projection → `foreachBatch` → [[SnapshotStore.merge]]), and
    * the final snapshot must hash-match the DuckDB recomputation of the
    * model from the raw fixture parquet: the streaming sink converges to
    * the declarative batch result, and redelivery is invisible. The
    * driver-side collect feeds the stream source only (fixture-sized, the
    * MemoryStream seam); all processing runs through the engine. */
  val streamIngestQ: Q = (spark, _) => withStreamGateConf(spark) {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rows = DeepbookFixtures.events(spark).collect().toSeq
    val root = java.nio.file.Files.createTempDirectory("graft-dagstream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-dagstream-ckpt").toString
    try {
      implicit val enc: ExpressionEncoder[Row] =
        ExpressionEncoder(RowEncoder.encoderFor(Sources.suiEventsSchema))
      val input = new MemoryStream[Row](60, spark)
      // the 30-day cold-start bound the batch `build` applies, expressed on
      // the stream itself (a stateless filter in the continuous plan)
      val bounded = input.toDF().filter(col("timestamp_ms") >=
        graft.TrinoFns.backfillBoundMs(DeepbookFixtures.now, 30))
      val q = graft.streaming.StreamingIngest.ingest(
        EventModels.loanBorrowed, bounded, s"$root/tbl", ckpt,
        DeepbookFixtures.now)
      try {
        // Redelivery must be non-degenerate or the dedup gate passes
        // vacuously: with < 30 events `third - 10` would clamp to 0
        // (replaying ALL of batch 1) and with < 3 events the overlap is
        // empty — either way the state store goes unexercised. Fail loud.
        require(rows.size >= 30,
          s"stream-ingest gate needs >= 30 fixture events, got ${rows.size}")
        val third = rows.size / 3
        input.addData(rows.take(third))
        q.processAllAvailable()
        // batch 2 REDELIVERS the tail of batch 1 — merge must dedup
        input.addData(rows.slice(third - 10, 2 * third))
        q.processAllAvailable()
        input.addData(rows.drop(2 * third))
        q.processAllAvailable()
      } finally q.stop()
      SnapshotStore.read(spark, s"$root/tbl").get
        .drop("updated_at")
        .localCheckpoint() // materialized before the temp trees are deleted
        .orderBy("transaction_digest", "event_index")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    }
  }

  /** Streaming CHANGE DATA FEED inside the hard gate: the same
    * three-micro-batch replay as [[streamIngestQ]] (batch 2 REDELIVERS
    * the tail of batch 1) but with `changeFeed = true` on every
    * per-micro-batch merge, and the result is the FEED, not the table.
    * Commit 1 must be all-`insert`; commit 2 must show every redelivered
    * key as an update pre-/post-image pair (the feed is where redelivery
    * becomes VISIBLE — the table itself converges identically either
    * way) plus inserts for the new tail; commit 3 is all-insert again.
    * The batch boundaries are derived from the deterministic
    * (timestamp, digest, index) replay order on both sides, so DuckDB
    * recomputes each commit's expected changes declaratively. Gates that
    * CDC versioning, typing and completeness survive the streaming path
    * end to end. */
  val streamCdcQ: Q = (spark, _) => withStreamGateConf(spark) {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rows = DeepbookFixtures.events(spark).collect().toSeq
      .sortBy(r => (r.getLong(2), r.getString(0), r.getLong(1)))
    val root = java.nio.file.Files.createTempDirectory("graft-dagscdc").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-dagscdc-ckpt").toString
    try {
      implicit val enc: ExpressionEncoder[Row] =
        ExpressionEncoder(RowEncoder.encoderFor(Sources.suiEventsSchema))
      val input = new MemoryStream[Row](68, spark)
      val bounded = input.toDF().filter(col("timestamp_ms") >=
        graft.TrinoFns.backfillBoundMs(DeepbookFixtures.now, 30))
      val q = graft.streaming.StreamingIngest.ingest(
        EventModels.loanBorrowed, bounded, s"$root/tbl", ckpt,
        DeepbookFixtures.now, changeFeed = true)
      try {
        require(rows.size >= 30,
          s"stream-cdc gate needs >= 30 fixture events, got ${rows.size}")
        val third = rows.size / 3
        input.addData(rows.take(third))
        q.processAllAvailable()
        // batch 2 REDELIVERS the tail of batch 1 — the feed must show it
        input.addData(rows.slice(third - 10, 2 * third))
        q.processAllAvailable()
        input.addData(rows.drop(2 * third))
        q.processAllAvailable()
      } finally q.stop()
      SnapshotStore.changes(spark, s"$root/tbl").get
        .drop("updated_at")
        .localCheckpoint() // materialized before the temp trees are deleted
        .orderBy("_commit_version", "_change_type",
          "transaction_digest", "event_index")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    }
  }

  /** Streaming SCD2 maintenance inside the hard gate: the fixture events
    * fold through [[graft.streaming.StreamingIngest.scd2Ingest]] as three
    * time-ordered micro-batches (key = sender, state = event_type), with
    * batch 2 REDELIVERING the tail of batch 1 — the persisted high-water
    * mark must drop the replay — and the resulting dimension history must
    * hash-match DuckDB's one-shot declarative SCD2 (lag-filter +
    * lead/row_number over the whole log). The order tiebreaker is
    * `row_number() OVER (ORDER BY transaction_digest, event_index)`,
    * derived identically on both sides from the unique event identity, so
    * same-timestamp events order deterministically in either engine. */
  val streamScd2Q: Q = (spark, _) => withStreamGateConf(spark) {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.expressions.{Window => W}
    import org.apache.spark.sql.types._
    val feedSchema = StructType(Seq(
      StructField("k", StringType), StructField("ts", LongType),
      StructField("eid", LongType), StructField("st", StringType)))
    val feed = DeepbookFixtures.events(spark)
      .withColumn("eid", row_number().over(
        W.orderBy(col("transaction_digest"), col("event_index"))).cast(LongType))
      .select(col("sender").as("k"), col("timestamp_ms").as("ts"),
        col("eid"), col("event_type").as("st"))
      .collect().toSeq
      .sortBy(r => (r.getLong(1), r.getLong(2)))
    // strict ts boundaries: scd2's high-water guard drops ts <= hwm, so a
    // batch may only carry timestamps strictly above the previous batch's
    val cut1 = dayStartOf(6); val cut2 = dayStartOf(10)
    val b1 = feed.filter(_.getLong(1) <= cut1)
    val b2 = feed.filter(r => r.getLong(1) > cut1 && r.getLong(1) <= cut2)
    val b3 = feed.filter(_.getLong(1) > cut2)
    val root = java.nio.file.Files.createTempDirectory("graft-dagscd2s").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-dagscd2s-ckpt").toString
    try {
      implicit val enc: ExpressionEncoder[Row] =
        ExpressionEncoder(RowEncoder.encoderFor(feedSchema))
      val input = new MemoryStream[Row](61, spark)
      val q = graft.streaming.StreamingIngest.scd2Ingest(
        input.toDF(), root, ckpt, "k", "ts", "eid", "st")
      try {
        input.addData(b1)
        q.processAllAvailable()
        // replay the tail of batch 1 — the persisted hwm must drop it
        input.addData(b1.takeRight(10) ++ b2)
        q.processAllAvailable()
        input.addData(b3)
        q.processAllAvailable()
      } finally q.stop()
      SnapshotStore.read(spark, s"$root/dim").get
        .select(col("k"), col("version"), col("state").as("st"),
          col("valid_from").as("valid_from_ms"), col("valid_to").as("valid_to_ms"))
        .localCheckpoint() // materialized before the temp trees are deleted
        .orderBy(col("k"), col("version"))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    }
  }

  /** Watermarked streaming dedup inside the hard gate: the fixture events
    * replay time-ordered as three MemoryStream micro-batches — batch 2
    * REDELIVERS the tail of batch 1 — through
    * [[graft.streaming.StreamingIngest.dedupEvents]] (event-time watermark
    * + stateful `dropDuplicates` on the event key) into Spark's native
    * parquet streaming file sink. The sink output must contain every
    * fixture event EXACTLY once: the redelivered rows sit inside the
    * 1-day lateness horizon, so the dedup state drops them before they
    * reach the sink. This gates the state-store dedup surface itself —
    * unlike dag_stream_ingest, no downstream merge is there to absorb a
    * duplicate the operator lets through. */
  val streamDedupQ: Q = (spark, _) => withStreamGateConf(spark) {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // time-ordered feed: the watermark advances monotonically across
    // batches, so the only rows behind it are the deliberate redeliveries
    val rows = DeepbookFixtures.events(spark).collect().toSeq
      .sortBy(r => (r.getLong(2), r.getString(0), r.getLong(1)))
    val root = java.nio.file.Files.createTempDirectory("graft-dagdedup").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-dagdedup-ckpt").toString
    try {
      implicit val enc: ExpressionEncoder[Row] =
        ExpressionEncoder(RowEncoder.encoderFor(Sources.suiEventsSchema))
      val input = new MemoryStream[Row](62, spark)
      val q = graft.streaming.StreamingIngest.dedupEvents(input.toDF())
        .drop("event_time")
        .writeStream
        .format("parquet")
        .option("path", s"$root/log")
        .option("checkpointLocation", ckpt)
        .start()
      try {
        // below 30 events the redelivery overlap degenerates (negative
        // slice start clamps to 0, or third == 0 empties it) and the gate
        // would pass without ever exercising the dedup state — fail loudly
        // instead of testing nothing
        require(rows.size >= 30,
          s"stream-dedup gate needs >= 30 fixture events, got ${rows.size}")
        val third = rows.size / 3
        input.addData(rows.take(third))
        q.processAllAvailable()
        // batch 2 redelivers the tail of batch 1 — the dedup state, not a
        // sink merge, must swallow the duplicates
        input.addData(rows.slice(math.max(0, third - 10), 2 * third))
        q.processAllAvailable()
        input.addData(rows.drop(2 * third))
        q.processAllAvailable()
      } finally q.stop()
      spark.read.schema(Sources.suiEventsSchema).parquet(s"$root/log")
        .localCheckpoint() // materialized before the temp trees are deleted
        .orderBy("transaction_digest", "event_index")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    }
  }

  /** The `volume` expression [[streamDailyQ]] aggregates — integer-valued
    * in the fixtures, so double sums are exact in any engine (the
    * DagOracles rule). Events without the field contribute 0. */
  private val dailyValueExpr =
    "coalesce(try_cast(get_json_object(event_json, '$.supply_amount') as double), 0.0d)"

  /** Stream-stream interval join inside the hard gate: the fixture events
    * replay time-ordered as three micro-batches into ONE MemoryStream,
    * whose two filtered legs (borrow / repaid — the batch models' own
    * projections) self-join through
    * [[graft.streaming.StreamingIngest.loanLifecycle]] (watermarks both
    * sides, equality on manager+pool, bounded time range) in append mode
    * into the parquet sink. Matches that SPAN micro-batches (a borrow in
    * batch 1 repaid in batch 2) only appear if the engine held the borrow
    * in join state across the boundary — the part no batch join
    * exercises — and the final sink must hash-match DuckDB's one-shot
    * declarative join of the two models with the same keys and range. */
  val streamJoinQ: Q = (spark, _) => withStreamGateConf(spark) {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rows = DeepbookFixtures.events(spark).collect().toSeq
      .sortBy(r => (r.getLong(2), r.getString(0), r.getLong(1)))
    val root = java.nio.file.Files.createTempDirectory("graft-dagsjoin").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-dagsjoin-ckpt").toString
    try {
      implicit val enc: ExpressionEncoder[Row] =
        ExpressionEncoder(RowEncoder.encoderFor(Sources.suiEventsSchema))
      val input = new MemoryStream[Row](66, spark)
      // the 30-day cold-start bound, as in the batch models' build
      val bounded = input.toDF().filter(col("timestamp_ms") >=
        graft.TrinoFns.backfillBoundMs(DeepbookFixtures.now, 30))
      val joined = graft.streaming.StreamingIngest.loanLifecycle(
        bounded, bounded, DeepbookFixtures.now)
      val q = joined.writeStream
        .format("parquet")
        .option("path", s"$root/pairs")
        .option("checkpointLocation", ckpt)
        .start()
      try {
        val third = rows.size / 3
        input.addData(rows.take(third))
        q.processAllAvailable()
        input.addData(rows.slice(third, 2 * third))
        q.processAllAvailable()
        input.addData(rows.drop(2 * third))
        q.processAllAvailable()
      } finally q.stop()
      spark.read.parquet(s"$root/pairs")
        .localCheckpoint() // materialized before the temp trees are deleted
        .orderBy("borrow_digest", "borrow_index", "repay_digest", "repay_index")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    }
  }

  /** Stream-stream LEFT OUTER interval join inside the hard gate: same
    * feed as [[streamJoinQ]] but `left_outer` — every borrow with NO
    * repay inside the horizon must appear exactly once with NULL repay
    * columns, and the engine may emit such a row only after the WATERMARK
    * has proven the negative (passed `borrow_time + horizon`). Two
    * far-future sentinel batches advance the watermark past every real
    * borrow's horizon and force the extra micro-batch in which the
    * null-matched rows are evaluated (outer emission uses the watermark
    * updated at the END of the previous batch). The sentinels carry
    * unmatchable manager keys and their own rows can never flush (the
    * watermark never passes them), so they are absent from the sink by
    * the operator's own semantics. Oracle = the declarative LEFT JOIN. */
  val streamOuterJoinQ: Q = (spark, _) => withStreamGateConf(spark) {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rows = DeepbookFixtures.events(spark).collect().toSeq
      .sortBy(r => (r.getLong(2), r.getString(0), r.getLong(1)))
    val maxTs = rows.map(_.getLong(2)).max
    def sentinels(daysAhead: Int): Seq[Row] = {
      val ts = maxTs + daysAhead.toLong * 24 * 3600 * 1000
      Seq(
        Row(s"graft-sentinel-b$daysAhead", 0L, ts, "sentinel",
          s"${EventModels.pkg}::margin_manager::LoanBorrowedEvent",
          s"""{"loan_amount":"1","loan_shares":"1","margin_manager_id":"0xsentinel_b","margin_pool_id":"0xsentinel_b","timestamp":"$ts"}"""),
        Row(s"graft-sentinel-r$daysAhead", 0L, ts, "sentinel",
          s"${EventModels.pkg}::margin_manager::LoanRepaidEvent",
          s"""{"margin_manager_id":"0xsentinel_r","margin_pool_id":"0xsentinel_r","repay_amount":"1","repay_shares":"1","timestamp":"$ts"}"""))
    }
    val root = java.nio.file.Files.createTempDirectory("graft-dagsoj").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-dagsoj-ckpt").toString
    try {
      implicit val enc: ExpressionEncoder[Row] =
        ExpressionEncoder(RowEncoder.encoderFor(Sources.suiEventsSchema))
      val input = new MemoryStream[Row](67, spark)
      val bounded = input.toDF().filter(col("timestamp_ms") >=
        graft.TrinoFns.backfillBoundMs(DeepbookFixtures.now, 30))
      val joined = graft.streaming.StreamingIngest.loanLifecycle(
        bounded, bounded, DeepbookFixtures.now, joinType = "left_outer")
      val q = joined.writeStream
        .format("parquet")
        .option("path", s"$root/pairs")
        .option("checkpointLocation", ckpt)
        .start()
      try {
        val third = rows.size / 3
        input.addData(rows.take(third))
        q.processAllAvailable()
        input.addData(rows.slice(third, 2 * third))
        q.processAllAvailable()
        input.addData(rows.drop(2 * third))
        q.processAllAvailable()
        // +10d advances the watermark past every REAL borrow's horizon;
        // +11d forces the next micro-batch in which those outer rows
        // evaluate, while keeping the watermark (+10d after it) short of
        // the first sentinel borrow's own horizon end (+13d) — a wider
        // gap here would flush the sentinel itself as a 41st null-match
        input.addData(sentinels(10))
        q.processAllAvailable()
        input.addData(sentinels(11))
        q.processAllAvailable()
      } finally q.stop()
      spark.read.parquet(s"$root/pairs")
        .localCheckpoint() // materialized before the temp trees are deleted
        .orderBy("borrow_digest", "borrow_index", "repay_digest", "repay_index")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    }
  }

  /** Watermarked tumbling-window aggregation inside the hard gate: the
    * fixture events replay time-ordered as three micro-batches through
    * [[graft.streaming.StreamingIngest.dailyVolumes]] (event-time
    * watermark, 1-day windows, append mode into the parquet file sink).
    * Append mode only emits a window once the watermark passes its end —
    * the part no batch query exercises — so a fourth, single-row SENTINEL
    * batch (far-future timestamp, synthetic event_type) advances the
    * watermark past every real window's end + lateness; the sentinel's
    * own window can never flush (the watermark never passes it), so it
    * is absent from the sink by the operator's own semantics, not by a
    * filter. The flushed windows must hash-match DuckDB's one-shot
    * day × event_type aggregation of the raw fixture log. */
  val streamDailyQ: Q = (spark, _) => withStreamGateConf(spark) {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rows = DeepbookFixtures.events(spark).collect().toSeq
      .sortBy(r => (r.getLong(2), r.getString(0), r.getLong(1)))
    val sentinel = Row("graft-watermark-sentinel", 0L,
      rows.map(_.getLong(2)).max + 10L * 24 * 3600 * 1000,
      "sentinel", "graft_sentinel", "{}")
    val root = java.nio.file.Files.createTempDirectory("graft-dagdaily").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-dagdaily-ckpt").toString
    try {
      implicit val enc: ExpressionEncoder[Row] =
        ExpressionEncoder(RowEncoder.encoderFor(Sources.suiEventsSchema))
      val input = new MemoryStream[Row](63, spark)
      val q = graft.streaming.StreamingIngest.dailyVolumes(input.toDF(), dailyValueExpr)
        .writeStream
        .format("parquet")
        .option("path", s"$root/daily")
        .option("checkpointLocation", ckpt)
        .start()
      try {
        val third = rows.size / 3
        input.addData(rows.take(third))
        q.processAllAvailable()
        input.addData(rows.slice(third, 2 * third))
        q.processAllAvailable()
        input.addData(rows.drop(2 * third))
        q.processAllAvailable()
        input.addData(Seq(sentinel)) // advances the watermark; never flushes
        q.processAllAvailable()
      } finally q.stop()
      spark.read.parquet(s"$root/daily")
        .localCheckpoint() // materialized before the temp trees are deleted
        .orderBy("snapshot_date", "event_type")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    }
  }

  /** Arbitrary-stateful streaming inside the hard gate: the fixture events
    * replay time-ordered as three micro-batches through
    * [[graft.streaming.StreamingIngest.runningNetPosition]]
    * (`flatMapGroupsWithState`, one (sum, count) state per margin pool,
    * Update mode) with each batch's emissions UPSERTED into the snapshot
    * sink keyed by pool — so the final table is the LAST emitted state per
    * pool, which must hash-match DuckDB's one-shot per-pool fold of the
    * whole log. Gates the custom-state surface itself: a state dropped,
    * double-applied or emitted stale between micro-batches shifts a pool's
    * cumulative sum and breaks the hash. */
  val streamPositionQ: Q = (spark, _) => withStreamGateConf(spark) {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rows = DeepbookFixtures.events(spark).collect().toSeq
      .sortBy(r => (r.getLong(2), r.getString(0), r.getLong(1)))
    val root = java.nio.file.Files.createTempDirectory("graft-dagpos").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-dagpos-ckpt").toString
    try {
      implicit val enc: ExpressionEncoder[Row] =
        ExpressionEncoder(RowEncoder.encoderFor(Sources.suiEventsSchema))
      val input = new MemoryStream[Row](64, spark)
      val q = graft.streaming.StreamingIngest.runningNetPosition(input.toDF())
        .toDF()
        .writeStream
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          SnapshotStore.merge(batch.sparkSession, s"$root/pos", batch,
            Seq("margin_pool_id"))
        }
        .start()
      try {
        val third = rows.size / 3
        input.addData(rows.take(third))
        q.processAllAvailable()
        input.addData(rows.slice(third, 2 * third))
        q.processAllAvailable()
        input.addData(rows.drop(2 * third))
        q.processAllAvailable()
      } finally q.stop()
      SnapshotStore.read(spark, s"$root/pos").get
        .drop("updated_at")
        .localCheckpoint() // materialized before the temp trees are deleted
        .orderBy("margin_pool_id")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    }
  }

  /** Additive schema evolution through the merge sink inside the hard
    * gate (dbt `on_schema_change='append_new_columns'`): batch 1 merges
    * the early fixture events under the BASE projection, batch 2 merges
    * the later events with a NEW `event_type` column — the sink must
    * widen the table (union schema, NULL fill for pre-evolution rows)
    * rather than throw or drop history, and the mergeSchema read must
    * present the union even though early files physically lack the
    * column. Oracle: the raw log with `event_type` nulled before the
    * evolution point. */
  val schemaEvolveQ: Q = (spark, _) => {
    val events = DeepbookFixtures.events(spark)
    val cut = dayStartOf(8)
    val root = java.nio.file.Files.createTempDirectory("graft-dagevolve").toString
    try {
      SnapshotStore.merge(spark, s"$root/tbl",
        events.filter(col("timestamp_ms") <= cut)
          .select(col("transaction_digest"), col("event_index"),
            col("timestamp_ms"), col("sender")),
        Seq("transaction_digest", "event_index"))
      SnapshotStore.merge(spark, s"$root/tbl",
        events.filter(col("timestamp_ms") > cut)
          .select(col("transaction_digest"), col("event_index"),
            col("timestamp_ms"), col("sender"), col("event_type")),
        Seq("transaction_digest", "event_index"),
        onSchemaChange = graft.incremental.OnSchemaChange.AppendNewColumns)
      SnapshotStore.read(spark, s"$root/tbl").get
        .localCheckpoint() // materialized before the temp tree is deleted
        .orderBy("transaction_digest", "event_index")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }

  /** Type-widening schema evolution through the merge sink inside the
    * hard gate (the OTHER evolution dbt users hit — int→long,
    * float→double): batch 1 merges the early events with event_index
    * NARROWED to int and a float-typed amount, batch 2 merges the later
    * events with the natural long/double types under
    * `AppendNewColumns` — the sink must widen the TABLE schema while the
    * early partitions' int/float files stay hard-linked on disk and widen
    * at scan time (partition-scoped merge: only late dates rewrite).
    * Amounts are `timestamp_ms % 1000` — exact in float (< 2^24), so the
    * widened values hash-match DuckDB bit-for-bit. */
  val schemaWidenQ: Q = (spark, _) => {
    val events = DeepbookFixtures.events(spark)
    val cut = dayStartOf(8)
    val root = java.nio.file.Files.createTempDirectory("graft-dagwiden").toString
    def proj(df: org.apache.spark.sql.DataFrame, narrow: Boolean) = {
      val idx = if (narrow) col("event_index").cast("int") else col("event_index")
      val amt = pmod(col("timestamp_ms"), lit(1000L))
      df.select(col("transaction_digest"), idx.as("event_index"),
        col("timestamp_ms"),
        (if (narrow) amt.cast("float") else amt.cast("double")).as("amount"))
    }
    val pd = Some(to_date(timestamp_millis(col("timestamp_ms"))))
    val keys = Seq("transaction_digest", "event_index")
    try {
      SnapshotStore.merge(spark, s"$root/tbl",
        proj(events.filter(col("timestamp_ms") <= cut), narrow = true), keys, pd)
      SnapshotStore.merge(spark, s"$root/tbl",
        proj(events.filter(col("timestamp_ms") > cut), narrow = false), keys, pd,
        onSchemaChange = graft.incremental.OnSchemaChange.AppendNewColumns)
      SnapshotStore.read(spark, s"$root/tbl").get
        .localCheckpoint() // materialized before the temp tree is deleted
        .orderBy("transaction_digest", "event_index")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }

  /** STREAM-side schema evolution inside the hard gate: the table is
    * bootstrapped by a batch merge of the pre-evolution history under the
    * base projection (no `event_type`), then the projection gains the
    * column and the REMAINING events arrive as two streaming
    * micro-batches — the second REDELIVERING the first's tail — through
    * `foreachBatch` → merge(`AppendNewColumns`). The streaming sink must
    * evolve the live table exactly like the batch path: pre-evolution
    * rows read back with NULL `event_type`, every event exactly once.
    * Same oracle shape as `dag_schema_evolve`. */
  val streamEvolveQ: Q = (spark, _) => withStreamGateConf(spark) {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val cut = dayStartOf(8)
    val late = DeepbookFixtures.events(spark)
      .filter(col("timestamp_ms") > cut).collect().toSeq
      .sortBy(r => (r.getLong(2), r.getString(0), r.getLong(1)))
    val root = java.nio.file.Files.createTempDirectory("graft-dagsevolve").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-dagsevolve-ckpt").toString
    try {
      SnapshotStore.merge(spark, s"$root/tbl",
        DeepbookFixtures.events(spark).filter(col("timestamp_ms") <= cut)
          .select(col("transaction_digest"), col("event_index"),
            col("timestamp_ms"), col("sender")),
        Seq("transaction_digest", "event_index"))
      implicit val enc: ExpressionEncoder[Row] =
        ExpressionEncoder(RowEncoder.encoderFor(Sources.suiEventsSchema))
      val input = new MemoryStream[Row](65, spark)
      val q = input.toDF()
        .select(col("transaction_digest"), col("event_index"),
          col("timestamp_ms"), col("sender"), col("event_type"))
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          SnapshotStore.merge(batch.sparkSession, s"$root/tbl", batch,
            Seq("transaction_digest", "event_index"),
            onSchemaChange = graft.incremental.OnSchemaChange.AppendNewColumns)
        }
        .start()
      try {
        val half = late.size / 2
        input.addData(late.take(half))
        q.processAllAvailable()
        // redelivered overlap: evolution + upsert must both hold
        input.addData(late.drop(math.max(0, half - 10)))
        q.processAllAvailable()
      } finally q.stop()
      SnapshotStore.read(spark, s"$root/tbl").get
        .localCheckpoint() // materialized before the temp trees are deleted
        .orderBy("transaction_digest", "event_index")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    }
  }

  /** Fixture day-start epoch-ms (mirrors DeepbookFixtures.dayStartMs). */
  private def dayStartOf(d: Int): Long =
    java.time.Instant.parse(f"2026-01-$d%02dT00:00:00Z").toEpochMilli

  /** RESTORE inside the hard gate: two merges of the loan_borrowed model
    * (pre-cutoff slice, then the full model), then
    * [[SnapshotStore.restore]] back to generation 1 — the rollback a bad
    * backfill needs. The LIVE table must hash-match the pre-cutoff slice
    * (the oracle), while the rolled-back generation 2 must stay readable
    * via time travel and the restore must have published a THIRD
    * generation (history-preserving, not a pointer rewind) — both pinned
    * by in-gate requires. */
  val restoreQ: Q = (spark, _) => {
    val full = DeepbookFixtures.ensureWritten(spark)
    val model = EventModels.loanBorrowed
      .build(RunContext(spark, full, RunMode.FullRefresh, DeepbookFixtures.now),
        None, noRef)
      .drop("updated_at")
    val root = java.nio.file.Files.createTempDirectory("graft-dagrestore").toString
    try {
      val pd = expr("to_date(timestamp_seconds(timestamp_ms div 1000))")
      val keys = Seq("transaction_digest", "event_index")
      SnapshotStore.merge(spark, s"$root/tbl",
        model.filter(col("timestamp_ms") <= AppendCutoffMs), keys, Some(pd))
      SnapshotStore.merge(spark, s"$root/tbl", model, keys, Some(pd))
      SnapshotStore.restore(spark, s"$root/tbl", "snap-0000001")
      require(SnapshotStore.currentSnapshot(s"$root/tbl").contains("snap-0000003"),
        "restore must publish a new generation, not rewind the pointer")
      val gen2 = SnapshotStore.readAt(spark, s"$root/tbl", "snap-0000002").get
      require(gen2.count() == model.count(),
        "the rolled-back generation must stay readable via time travel")
      SnapshotStore.read(spark, s"$root/tbl").get
        .localCheckpoint() // materialized before the temp tree is deleted
        .orderBy("transaction_digest", "event_index")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  /** Columns the drift audit monitors on the loan_repaid model — shared
    * with the oracle generator so the two sides cannot drift.
    * `repay_shares` carries the fixtures' planted malformed numeric
    * (TRY_CAST → NULL), so the null-rate metrics are nonzero. */
  private[queries] val DriftAuditCols =
    Seq("transaction_digest", "margin_pool_id", "repay_amount", "repay_shares")

  /** dbt-spark `insert_overwrite` inside the hard gate: batch 1 is the
    * full loan_borrowed model PLUS a planted stale row in the day-5
    * partition; batch 2 recomputes days ≥ 5 wholesale. Partition
    * replacement must DROP the stale row (a keyed merge would have kept
    * it — unmatched keys survive a merge), while days 1-4 carry across
    * by hard link, so the live table equals the clean full model and the
    * gate reuses the model's own oracle. */
  val insertOverwriteQ: Q = (spark, _) => {
    val full = DeepbookFixtures.ensureWritten(spark)
    val model = EventModels.loanBorrowed
      .build(RunContext(spark, full, RunMode.FullRefresh, DeepbookFixtures.now),
        None, noRef)
      .drop("updated_at")
    val root = java.nio.file.Files.createTempDirectory("graft-dagiow").toString
    try {
      val pd = expr("to_date(timestamp_seconds(timestamp_ms div 1000))")
      val stale = model.orderBy("transaction_digest", "event_index").limit(1)
        .withColumn("transaction_digest", lit("0xstale"))
        .withColumn("event_index", lit(999L))
        .withColumn("timestamp_ms", lit(dayStartOf(5) + 1L))
      SnapshotStore.insertOverwrite(spark, s"$root/tbl",
        model.unionByName(stale), pd)
      SnapshotStore.insertOverwrite(spark, s"$root/tbl",
        model.filter(col("timestamp_ms") >= dayStartOf(5)), pd)
      val out = SnapshotStore.read(spark, s"$root/tbl").get
      require(out.filter(col("transaction_digest") === "0xstale").isEmpty,
        "insert_overwrite must replace the recomputed partition wholesale")
      out.localCheckpoint() // materialized before the temp tree is deleted
        .orderBy("transaction_digest", "event_index")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  /** CDC CONSUMER inside the hard gate: a producer table publishes three
    * feed commits (two merges, then a row-level DELETE of days 1-2), and
    * a DERIVED table syncs from the feed alone via
    * [[SnapshotStore.applyChanges]] — called mid-stream (watermark
    * advances, resume exercised) and again after the delete (the keyed
    * retraction path). The derived table must hash-match the producer's
    * post-delete state recomputed declaratively — proving the feed is a
    * complete, replayable description of the table's evolution. */
  val cdcApplyQ: Q = (spark, _) => {
    val full = DeepbookFixtures.ensureWritten(spark)
    val model = EventModels.loanBorrowed
      .build(RunContext(spark, full, RunMode.FullRefresh, DeepbookFixtures.now),
        None, noRef)
      .drop("updated_at")
    val root = java.nio.file.Files.createTempDirectory("graft-dagcdca").toString
    try {
      val pd = expr("to_date(timestamp_seconds(timestamp_ms div 1000))")
      val keys = Seq("transaction_digest", "event_index")
      SnapshotStore.merge(spark, s"$root/src",
        model.filter(col("timestamp_ms") <= AppendCutoffMs), keys, Some(pd),
        changeFeed = true)
      SnapshotStore.merge(spark, s"$root/src", model, keys, Some(pd),
        changeFeed = true)
      val v1 = SnapshotStore.applyChanges(spark, s"$root/src", s"$root/dst",
        keys, pd)
      require(v1 == 2L, s"watermark after two producer commits must be 2, got $v1")
      SnapshotStore.delete(spark, s"$root/src",
        col("timestamp_ms") < dayStartOf(3), changeFeed = true)
      val v2 = SnapshotStore.applyChanges(spark, s"$root/src", s"$root/dst",
        keys, pd)
      require(v2 == 3L, s"watermark after the delete commit must be 3, got $v2")
      SnapshotStore.read(spark, s"$root/dst").get
        .localCheckpoint() // materialized before the temp tree is deleted
        .orderBy("transaction_digest", "event_index")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  /** dbt `microbatch` inside the hard gate: the loan_borrowed model's
    * fixture range replays as 2-day event-time windows, each batch
    * filtered to its window and applied by partition replacement
    * ([[graft.incremental.Microbatch]]), then one middle window is
    * RE-RUN — the retry a failed backfill needs — and the table must be
    * unchanged (per-batch idempotency, required in-gate). The final
    * table must equal the clean full model, so the gate reuses the
    * model's own oracle. */
  val microbatchQ: Q = (spark, _) => {
    val full = DeepbookFixtures.ensureWritten(spark)
    val model = EventModels.loanBorrowed
      .build(RunContext(spark, full, RunMode.FullRefresh, DeepbookFixtures.now),
        None, noRef)
      .drop("updated_at")
      .localCheckpoint() // one build, many window filters
    val root = java.nio.file.Files.createTempDirectory("graft-dagmb").toString
    try {
      val pd = expr("to_date(timestamp_seconds(timestamp_ms div 1000))")
      def batch(s: Long, e: Long) =
        model.filter(col("timestamp_ms") >= s && col("timestamp_ms") < e)
      val day = 86400000L
      val from = dayStartOf(1) - 30 * day // cover the backfill-bound rows
      val to = dayStartOf(10) + day
      graft.incremental.Microbatch.run(spark, s"$root/tbl", batch,
        pd, from, to, periodMs = 2 * day)
      val before = SnapshotStore.read(spark, s"$root/tbl").get
        .localCheckpoint()
      // retry one middle window: content must not change
      graft.incremental.Microbatch.run(spark, s"$root/tbl", batch,
        pd, dayStartOf(5), dayStartOf(7), periodMs = 2 * day)
      val after = SnapshotStore.read(spark, s"$root/tbl").get.localCheckpoint()
      require(after.exceptAll(before).isEmpty && before.exceptAll(after).isEmpty,
        "a replayed microbatch window must leave the table unchanged")
      after.orderBy("transaction_digest", "event_index")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  /** `dbt source freshness` inside the hard gate: the three declared
    * sources checked against the fixtures' fixed clock with horizons
    * chosen so all three statuses occur (events ~4.9 d old vs 7 d warn ⇒
    * pass; objects ~4.8 d vs 3 d warn ⇒ warn; prices ~4.2 d vs 3 d
    * error ⇒ error). Oracle = the same max/age/CASE in SQL. */
  val sourceFreshnessQ: Q = (spark, _) => {
    import graft.SourceFreshness.{Spec, check}
    val day = 86400000L
    check(DeepbookFixtures.ensureWritten(spark), Seq(
      Spec("sui.events", col("timestamp_ms"), 7 * day, 14 * day),
      Spec("sui.objects", col("timestamp_ms"), 3 * day, 14 * day),
      Spec("prices.day", unix_millis(col("timestamp")), 1 * day, 3 * day)),
      DeepbookFixtures.now)
  }

  /** K4 inside the hard gate: the cross-generation drift audit. Two
    * merges of the loan_repaid model (pre-cutoff slice, then the full
    * model), then [[graft.incremental.TableAudit.drift]] compares the
    * PREVIOUS generation (via time travel) against the live table —
    * volume/null-rate/NDV monitors with exact integer flags. Oracle =
    * the same metrics recomputed from the two declarative slices. */
  val driftAuditQ: Q = (spark, _) => {
    val full = DeepbookFixtures.ensureWritten(spark)
    val model = EventModels.loanRepaid
      .build(RunContext(spark, full, RunMode.FullRefresh, DeepbookFixtures.now),
        None, noRef)
      .drop("updated_at")
    val root = java.nio.file.Files.createTempDirectory("graft-dagdrift").toString
    try {
      val pd = expr("to_date(timestamp_seconds(timestamp_ms div 1000))")
      val keys = Seq("transaction_digest", "event_index")
      SnapshotStore.merge(spark, s"$root/tbl",
        model.filter(col("timestamp_ms") <= AppendCutoffMs), keys, Some(pd))
      SnapshotStore.merge(spark, s"$root/tbl", model, keys, Some(pd))
      val prev = SnapshotStore.readAt(spark, s"$root/tbl", "snap-0000001").get
      val curr = SnapshotStore.read(spark, s"$root/tbl").get
      graft.incremental.TableAudit.drift(prev, curr, DriftAuditCols)
        .localCheckpoint() // materialized before the temp tree is deleted
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  /** E2 inside the hard gate: `dbt test` over the whole DAG. Every model
    * builds full-refresh, then the reference's schema.yml suite (plus the
    * not_null audit over the columns schema.yml leaves unprotected — see
    * [[graft.models.ReferenceSchema]]) compiles to fused conditional
    * counts / key groupBys / anti-joins and emits one row per test. The
    * audit rows have NONZERO failure counts (fixtures plant malformed
    * numerics exactly there), so the oracle pins real counting. */
  val dataTestsQ: Q = (spark, _) => {
    val c = ctx(spark)
    val upstream: Map[String, DataFrame] =
      (EventModels.all.map(m => m.name -> m.build(c, None, noRef)) :+
        (PoolObjectStg.name -> PoolObjectStg.build(c, None, noRef))).toMap
    val tables = upstream +
      (PoolDailyFct.name -> PoolDailyFct.build(c, None, upstream.apply))
    graft.incremental.DataTests.run(tables.apply,
      graft.models.ReferenceSchema.auditSuite)
  }

  // ---- E3: ad-hoc consumption SQL over the built models ("dbt show") -------

  /** E3 (`SURVEY.md §3`): the reference README's four "Sample Queries"
    * (`/root/reference/README.md:77-120`) run over the BUILT models — the
    * Dune-UI / `dbt show` consumption surface. The real DAG builds the
    * models, registers them as temp views, and the README SQL runs through
    * `spark.sql` in its Spark-dialect rendering: the `dune.sui__tmp_.`
    * catalog prefix becomes the view name, and Trino's truncating
    * `from_unixtime(ms / 1000)` becomes `timestamp_seconds(ms div 1000)`
    * (F5 — Spark `/` on bigints is a double, Spark `from_unixtime` returns
    * a string). Determinism: every query gets a total ORDER BY (pool-id /
    * digest tiebreaks on the reference's non-total sorts); the one
    * aggregate query sums exact micro-USD integers — per-row
    * `floor(x·1e6+0.5)` is a single-expression fold both engines compute
    * identically (the fixed-point discipline), so no float summation
    * order sits on the hashed surface. */
  private def showQ(views: Map[String, Q], sql: String): Q = (spark, dir) => {
    views.foreach { case (n, q) => q(spark, dir).createOrReplaceTempView(n) }
    spark.sql(sql)
  }

  /** README "Pool TVL Over Time (USD)". */
  val showPoolTvlQ: Q = showQ(Map("fct_deepbook_margin_pool_daily" -> fctQ),
    """SELECT snapshot_date, coin_symbol, total_supply_usd AS tvl_usd,
      |       total_borrow_usd, utilization_rate
      |FROM fct_deepbook_margin_pool_daily
      |WHERE coin_symbol = 'USDC'
      |ORDER BY snapshot_date, margin_pool_id""".stripMargin)

  /** README "Total TVL Across All Pools" (sums in exact micro-USD). */
  val showTotalTvlQ: Q = showQ(Map("fct_deepbook_margin_pool_daily" -> fctQ),
    """SELECT snapshot_date,
      |       sum(CAST(floor(total_supply_usd * 1000000.0 + 0.5) AS BIGINT))
      |         AS total_tvl_usd_e6,
      |       sum(CAST(floor(total_borrow_usd * 1000000.0 + 0.5) AS BIGINT))
      |         AS total_borrowed_usd_e6
      |FROM fct_deepbook_margin_pool_daily
      |GROUP BY 1
      |ORDER BY 1 DESC""".stripMargin)

  /** README "Daily Borrow Volume by Pool (USD)". */
  val showBorrowVolumeQ: Q = showQ(Map("fct_deepbook_margin_pool_daily" -> fctQ),
    """SELECT snapshot_date, coin_symbol,
      |       daily_borrow_volume_usd, daily_repay_volume_usd
      |FROM fct_deepbook_margin_pool_daily
      |ORDER BY snapshot_date DESC, margin_pool_id""".stripMargin)

  /** README "Recent Loan Events". */
  val showRecentLoansQ: Q = showQ(
    Map("deepbook_margin_loan_borrowed" -> eventQ(EventModels.loanBorrowed)),
    """SELECT timestamp_seconds(timestamp_ms div 1000) AS time,
      |       margin_pool_id, loan_amount / 1e6 AS loan_amount_normalized
      |FROM deepbook_margin_loan_borrowed
      |ORDER BY timestamp_ms DESC, transaction_digest, event_index""".stripMargin)

  /** dbt's `run_results.json` artifact as a hard gate: one full DAG run
    * through the real Runner + store, emitting per-model (status, rows
    * materialized) — the completion of the dbt artifact triple the
    * engine now serves (catalog/manifest = [[graft.incremental.Docs]],
    * state = slim-CI's `_graft_state.json`, run results = this). The
    * timing fields dbt also records are deliberately NOT on the hashed
    * surface (wall-clock is not replayable); statuses and row counts
    * are, and the oracle recomputes each model's cardinality
    * declaratively. The assembly is a |models|-sized driver fold —
    * run_results is a driver artifact in dbt too. */
  val runResultsQ: Q = (spark, _) => {
    import spark.implicits._
    val full = DeepbookFixtures.ensureWritten(spark)
    val root = java.nio.file.Files.createTempDirectory("graft-runres").toString
    try {
      val report = DeepbookPipeline.runner(root)
        .runReport(RunContext(spark, full, RunMode.FullRefresh, DeepbookFixtures.now))
      val rows = report.statuses.toSeq.sortBy(_._1).map { case (m, st) =>
        val status = st match {
          case graft.incremental.ModelStatus.Success => "success"
          case _: graft.incremental.ModelStatus.Error => "error"
          case _: graft.incremental.ModelStatus.Skipped => "skipped"
        }
        (m, status, report.tables.get(m).map(_.count()).getOrElse(0L))
      }
      rows.toDF("model", "status", "n_rows").orderBy("model")
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  val all: Map[String, Q] =
    EventModels.all.map(m => s"dag_${shortName(m.name)}" -> eventQ(m)).toMap ++
      Map("dag_show_pool_tvl" -> showPoolTvlQ,
        "dag_run_results" -> runResultsQ,
        "dag_show_total_tvl" -> showTotalTvlQ,
        "dag_show_tvl_incremental" -> showTvlIncrementalQ,
        "dag_show_borrow_volume" -> showBorrowVolumeQ,
        "dag_show_recent_loans" -> showRecentLoansQ) ++
      Map("dag_stg_pool_object" -> stgQ, "dag_fct_pool_daily" -> fctQ,
        "dag_fct_incremental" -> fctIncrementalQ,
        "dag_fct_maintenance" -> fctMaintenanceQ,
        "dag_fct_skipread" -> fctSkipReadQ,
        "dag_append_log" -> appendLogQ,
        "dag_cdc_feed" -> cdcFeedQ,
        "dag_time_travel" -> timeTravelQ,
        "dag_delete_retention" -> deleteRetentionQ,
        "dag_stream_ingest" -> streamIngestQ,
        "dag_stream_scd2" -> streamScd2Q,
        "dag_stream_dedup" -> streamDedupQ,
        "dag_stream_join" -> streamJoinQ,
        "dag_stream_outer_join" -> streamOuterJoinQ,
        "dag_stream_cdc" -> streamCdcQ,
        "dag_stream_daily" -> streamDailyQ,
        "dag_stream_position" -> streamPositionQ,
        "dag_data_tests" -> dataTestsQ,
        "dag_restore" -> restoreQ,
        "dag_drift_audit" -> driftAuditQ,
        "dag_source_freshness" -> sourceFreshnessQ,
        "dag_insert_overwrite" -> insertOverwriteQ,
        "dag_microbatch" -> microbatchQ,
        "dag_state_modified" -> stateModifiedQ,
        "dag_bloom_lookup" -> bloomLookupQ,
        "dag_cdc_apply" -> cdcApplyQ,
        "dag_schema_evolve" -> schemaEvolveQ,
        "dag_schema_widen" -> schemaWidenQ,
        "dag_stream_evolve" -> streamEvolveQ)
}
