package graft.incremental

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** S6-S9 sink contract: merge idempotency/upsert, partition-scoped rewrite
  * with hard-linked untouched partitions, append, optimize, vacuum. */
class SnapshotStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmpRoot(): String =
    Files.createTempDirectory("graft-snap").toString

  private def rows(k: Seq[(Long, String, String)]): DataFrame =
    k.toDF("id", "dt", "payload")

  private val pd = Some(to_date(col("dt")))

  private def readAll(root: String): Set[(Long, String, String)] =
    SnapshotStore.read(spark, root).get
      .select("id", "dt", "payload").as[(Long, String, String)].collect().toSet

  private def inodesByPartition(root: String): Map[String, Map[String, Long]] = {
    val snap = Paths.get(root, SnapshotStore.currentSnapshot(root).get)
    Files.list(snap).iterator().asScala
      .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith("_dt="))
      .map { dir =>
        val files = Files.list(dir).iterator().asScala
          .filter(p => p.getFileName.toString.endsWith(".parquet"))
          .map(p => p.getFileName.toString ->
            Files.getAttribute(p, "unix:ino").asInstanceOf[Long])
          .toMap
        dir.getFileName.toString -> files
      }.toMap
  }

  /** Carryover assertion valid under BOTH [[FileIO]] strategies: the
    * carried file NAMES are identical either way; hard links share
    * inodes, object-store-style copies must NOT (independent bytes). */
  private def assertCarried(before: Map[String, Long], after: Map[String, Long],
                            what: String): Unit = {
    assert(after.keySet == before.keySet, s"$what: carried file set changed")
    if (FileIO.get == FileIO.HardLink)
      assert(after == before, s"$what must carry by hard link")
    else before.foreach { case (n, ino) =>
      assert(after(n) != ino, s"$what: copy mode must produce an independent inode for $n")
    }
  }

  test("merge bootstrap + upsert: new rows win, unmatched old rows survive") {
    val root = tmpRoot()
    SnapshotStore.merge(spark, root, rows(Seq(
      (1L, "2026-01-01", "a"), (2L, "2026-01-02", "b"))), Seq("id"), pd)
    SnapshotStore.merge(spark, root, rows(Seq(
      (2L, "2026-01-02", "b2"), (3L, "2026-01-03", "c"))), Seq("id"), pd)
    assert(readAll(root) == Set(
      (1L, "2026-01-01", "a"), (2L, "2026-01-02", "b2"), (3L, "2026-01-03", "c")))
  }

  test("merge is idempotent: run-twice ≡ run-once (flat and partitioned)") {
    for (p <- Seq(None, pd)) {
      val root = tmpRoot()
      val batch = rows(Seq((1L, "2026-01-01", "a"), (2L, "2026-01-02", "b")))
      SnapshotStore.merge(spark, root, batch, Seq("id"), p)
      val once = readAll(root)
      SnapshotStore.merge(spark, root, batch, Seq("id"), p)
      assert(readAll(root) == once, s"partitionDate=$p")
    }
  }

  test("merge collapses in-batch duplicate keys") {
    val root = tmpRoot()
    SnapshotStore.merge(spark, root, rows(Seq(
      (1L, "2026-01-01", "a"), (1L, "2026-01-01", "a"))), Seq("id"), pd)
    assert(SnapshotStore.read(spark, root).get.count() == 1)
  }

  test("partition-scoped merge rewrites ONLY touched partitions; untouched files hard-link") {
    val root = tmpRoot()
    SnapshotStore.merge(spark, root, rows(Seq(
      (1L, "2026-01-01", "a"), (2L, "2026-01-02", "b"), (3L, "2026-01-03", "c"))),
      Seq("id"), pd)
    val before = inodesByPartition(root)
    // second merge touches only 2026-01-02
    SnapshotStore.merge(spark, root, rows(Seq((2L, "2026-01-02", "b2"))), Seq("id"), pd)
    val after = inodesByPartition(root)
    assert(after.keySet == Set("_dt=2026-01-01", "_dt=2026-01-02", "_dt=2026-01-03"))
    // untouched partitions: identical file names; inode sharing per FileIO
    for (dt <- Seq("_dt=2026-01-01", "_dt=2026-01-03"))
      assertCarried(before(dt), after(dt), dt)
    // touched partition: fully rewritten (no file survives)
    assert(after("_dt=2026-01-02").keySet.intersect(
      before("_dt=2026-01-02").keySet).isEmpty)
    assert(readAll(root) == Set(
      (1L, "2026-01-01", "a"), (2L, "2026-01-02", "b2"), (3L, "2026-01-03", "c")))
  }

  test("cell-valued partitions: a _dt filter prunes the manifest-routed scan (v18's layout)") {
    val root = tmpRoot()
    // partition values are CELL IDS, not dates — the v18 ANN-index layout
    SnapshotStore.merge(spark, root,
      Seq((1L, 1L, "a"), (2L, 2L, "b"), (3L, 3L, "c"), (4L, 2L, "d"))
        .toDF("id", "cell", "payload"),
      Seq("id"), Some(col("cell").cast("string")))
    val snap = Paths.get(root, SnapshotStore.currentSnapshot(root).get)
    def filesUnder(dt: String): Long =
      Files.list(snap.resolve(s"_dt=$dt")).iterator().asScala
        .count(_.getFileName.toString.endsWith(".parquet"))
    val total = (1 to 3).map(c => filesUnder(c.toString)).sum
    val df = SnapshotStore.readWithPartition(spark, root).get
      .filter(col(SnapshotStore.PartCol) === "2")
    val scan = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    // collect THIS df (same queryExecution instance) so the captured
    // scan node's metrics are the ones that ran
    val got = df.collect().map(r =>
      (r.getAs[Long]("id"), r.getAs[String]("payload"))).toSet
    assert(got == Set((2L, "b"), (4L, "d")))
    // the scan read ONLY partition _dt=2's files — static partition
    // pruning works through ManifestFileIndex with non-date values
    assert(scan.metrics("numFiles").value == filesUnder("2"),
      s"scan must touch only the filtered cell's files (total files: $total)")
    assert(filesUnder("2") < total)
  }

  test("flat→partitioned migration: first partitioned merge keeps every prior row") {
    val root = tmpRoot()
    // bootstrap WITHOUT a partitionDate → flat snapshot layout
    SnapshotStore.merge(spark, root, rows(Seq(
      (1L, "2026-01-01", "a"), (2L, "2026-01-02", "b"))), Seq("id"), None)
    // later the model gains a partitionDate: must migrate, not truncate
    SnapshotStore.merge(spark, root, rows(Seq(
      (2L, "2026-01-02", "b2"), (3L, "2026-01-03", "c"))), Seq("id"), pd)
    assert(readAll(root) == Set(
      (1L, "2026-01-01", "a"), (2L, "2026-01-02", "b2"), (3L, "2026-01-03", "c")))
    // and the table is now partitioned — the next merge is dir-scoped
    assert(inodesByPartition(root).keySet ==
      Set("_dt=2026-01-01", "_dt=2026-01-02", "_dt=2026-01-03"))
  }

  test("null partition dates upsert correctly (no duplicate keys in the null dir)") {
    val root = tmpRoot()
    val pdNullable = Some(when(col("dt") === "bad", lit(null)).otherwise(to_date(col("dt"))))
    SnapshotStore.merge(spark, root, rows(Seq(
      (1L, "bad", "a"), (2L, "2026-01-02", "b"))), Seq("id"), pdNullable)
    SnapshotStore.merge(spark, root, rows(Seq((1L, "bad", "a2"))), Seq("id"), pdNullable)
    assert(readAll(root) == Set((1L, "bad", "a2"), (2L, "2026-01-02", "b")))
  }

  test("append refuses a layout mismatch instead of corrupting the table") {
    val root = tmpRoot()
    SnapshotStore.append(spark, root, rows(Seq((1L, "2026-01-01", "a"))), pd)
    intercept[IllegalArgumentException] {
      SnapshotStore.append(spark, root, rows(Seq((2L, "2026-01-02", "b"))), None)
    }
  }

  test("S7 append: no key semantics, prior files carried by hard link") {
    val root = tmpRoot()
    SnapshotStore.append(spark, root, rows(Seq((1L, "2026-01-01", "a"))), pd)
    SnapshotStore.append(spark, root, rows(Seq((1L, "2026-01-01", "dup"))), pd)
    val all = SnapshotStore.read(spark, root).get
    assert(all.count() == 2) // both rows kept — append, not merge
    val inos = inodesByPartition(root)("_dt=2026-01-01")
    assert(inos.size >= 2)
  }

  test("S8 optimize compacts to one file per partition dir") {
    val root = tmpRoot()
    val batch = rows((1L to 40L).map(i => (i, f"2026-01-${i % 2 + 1}%02d", s"p$i")))
      .repartition(8) // force many small files
    SnapshotStore.merge(spark, root, batch, Seq("id"), pd)
    SnapshotStore.optimize(spark, root, filesPerPartition = 1)
    val files = inodesByPartition(root)
    assert(files.keySet == Set("_dt=2026-01-01", "_dt=2026-01-02"))
    assert(files.values.forall(_.size == 1), s"got ${files.view.mapValues(_.size).toMap}")
    assert(SnapshotStore.read(spark, root).get.count() == 40)
  }

  test("S8 optimize clusterBy sorts rows inside each compacted file; content unchanged") {
    val root = tmpRoot()
    val ids = scala.util.Random.shuffle((1L to 40L).toList)
    val batch = rows(ids.map(i => (i, f"2026-01-${i % 2 + 1}%02d", s"p$i")))
      .repartition(8)
    SnapshotStore.merge(spark, root, batch, Seq("id"), pd)
    SnapshotStore.optimize(spark, root, filesPerPartition = 1, clusterBy = Seq("id"))
    // every physical file individually carries ascending ids → parquet
    // row-group min/max stats on id are disjoint and selective
    val snap = Paths.get(root, SnapshotStore.currentSnapshot(root).get)
    val parquetFiles = Files.walk(snap).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
    assert(parquetFiles.nonEmpty)
    parquetFiles.foreach { f =>
      val fileIds = spark.read.parquet(f.toString)
        .select("id").collect().map(_.getLong(0)).toSeq
      assert(fileIds == fileIds.sorted, s"file $f not clustered: $fileIds")
    }
    assert(SnapshotStore.read(spark, root).get
      .select("id").collect().map(_.getLong(0)).sorted.toSeq == (1L to 40L))
  }

  test("S9 vacuum drops superseded snapshots, table stays readable") {
    val root = tmpRoot()
    for (i <- 1 to 4)
      SnapshotStore.merge(spark, root,
        rows(Seq((i.toLong, "2026-01-01", s"v$i"))), Seq("id"), pd)
    SnapshotStore.vacuum(root, keep = 1)
    val snaps = Files.list(Paths.get(root)).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("snap-")).toSet
    assert(snaps == Set("snap-0000003", "snap-0000004"))
    assert(readAll(root).size == 4)
  }

  test("time travel: readAt serves each published snapshot until vacuum drops it") {
    val root = Files.createTempDirectory("graft-tt").toString
    (1 to 3).foreach { i =>
      SnapshotStore.merge(spark, root,
        rows(Seq((1L, "2026-01-01", s"v$i"))), Seq("id"))
    }
    assert(SnapshotStore.snapshots(root) ==
      Seq("snap-0000001", "snap-0000002", "snap-0000003"))
    // each snapshot is the table as of that merge
    (1 to 3).foreach { i =>
      val df = SnapshotStore.readAt(spark, root, f"snap-$i%07d").get
      assert(df.collect().map(_.getString(2)).toSeq == Seq(s"v$i"), s"snap $i")
    }
    SnapshotStore.vacuum(root, keep = 1)
    assert(SnapshotStore.readAt(spark, root, "snap-0000001").isEmpty) // vacuumed
    assert(SnapshotStore.readAt(spark, root, "snap-0000002").get
      .collect().map(_.getString(2)).toSeq == Seq("v2")) // kept generation
    assert(SnapshotStore.snapshots(root) == Seq("snap-0000002", "snap-0000003"))
  }

  test("change feed: versioned insert/update images per commit, vacuumed with its snapshot") {
    val root = tmpRoot()
    def feed(since: Long = 0L): Set[(Long, String, String, String, Long)] =
      SnapshotStore.changes(spark, root, since).get
        .select("id", "dt", "payload", "_change_type", "_commit_version")
        .as[(Long, String, String, String, Long)].collect().toSet
    assert(SnapshotStore.changes(spark, root).isEmpty) // no feed yet
    SnapshotStore.merge(spark, root, rows(Seq(
      (1L, "2026-01-01", "a"), (2L, "2026-01-02", "b"))), Seq("id"), pd,
      changeFeed = true)
    val v1 = Set(
      (1L, "2026-01-01", "a", "insert", 1L),
      (2L, "2026-01-02", "b", "insert", 1L))
    assert(feed() == v1, "bootstrap commit is all-insert")
    // commit 2: one matched key (2 -> b2, a partition-scoped rewrite of
    // _dt=2026-01-02 only) and one new key
    SnapshotStore.merge(spark, root, rows(Seq(
      (2L, "2026-01-02", "b2"), (3L, "2026-01-03", "c"))), Seq("id"), pd,
      changeFeed = true)
    val v2 = Set(
      (2L, "2026-01-02", "b", "update_preimage", 2L),
      (2L, "2026-01-02", "b2", "update_postimage", 2L),
      (3L, "2026-01-03", "c", "insert", 2L))
    assert(feed() == v1 ++ v2)
    assert(feed(since = 1L) == v2, "sinceVersion is exclusive")
    assert(SnapshotStore.changesFor(spark, root, "snap-0000001").get.count() == 2)
    // flat (unpartitioned) tables feed too
    val flat = tmpRoot()
    SnapshotStore.merge(spark, flat, rows(Seq((1L, "2026-01-01", "a"))),
      Seq("id"), changeFeed = true)
    SnapshotStore.merge(spark, flat, rows(Seq((1L, "2026-01-01", "a2"))),
      Seq("id"), changeFeed = true)
    assert(SnapshotStore.changes(spark, flat, sinceVersion = 1L).get
      .select("payload", "_change_type").as[(String, String)].collect().toSet ==
      Set(("a", "update_preimage"), ("a2", "update_postimage")))
    // vacuum drops the feed with its generation
    SnapshotStore.vacuum(root, keep = 0)
    assert(SnapshotStore.changesFor(spark, root, "snap-0000001").isEmpty)
    assert(feed() == v2, "surviving generation keeps its feed")
  }

  test("bin-packing optimize compacts only small files; compact files carry by hard link") {
    val root = tmpRoot()
    // day 1 starts with one COMPACT file (wide payloads push it past the
    // small-file threshold), then accumulates three 1-row appends; day 2
    // gets two 1-row appends. Every append hard-links prior files, so the
    // live snapshot ends with day1 = 1 big + 3 small, day2 = 2 small.
    val big = (1 to 500).map(i => (i.toLong, "2026-01-01", f"payload-$i%05d-" + "x" * 64))
      .toDF("id", "dt", "payload").repartition(1)
    SnapshotStore.append(spark, root, big, pd)
    for (i <- 1 to 3)
      SnapshotStore.append(spark, root,
        rows(Seq((1000L + i, "2026-01-01", s"s$i"))).repartition(1), pd)
    for (i <- 1 to 2)
      SnapshotStore.append(spark, root,
        rows(Seq((2000L + i, "2026-01-02", s"t$i"))).repartition(1), pd)
    val before = inodesByPartition(root)
    assert(before("_dt=2026-01-01").size == 4 && before("_dt=2026-01-02").size == 2)
    val expected = readAll(root)
    val bigFile = {
      val snap = Paths.get(root, SnapshotStore.currentSnapshot(root).get)
      Files.list(snap.resolve("_dt=2026-01-01")).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .maxBy(Files.size)
    }
    assert(Files.size(bigFile) >= 4096, "fixture big file must exceed the threshold")
    SnapshotStore.optimizeBinPack(spark, root, targetFileBytes = 8192)
    val after = inodesByPartition(root)
    // day 1: the compact file survives UNREAD (same name, same inode);
    // its three small files are packed into one
    val bigName = bigFile.getFileName.toString
    assertCarried(before("_dt=2026-01-01").view.filterKeys(_ == bigName).toMap,
      after("_dt=2026-01-01").view.filterKeys(_ == bigName).toMap,
      "compact file (carried, never rewritten)")
    assert(after("_dt=2026-01-01").size == 2, "3 small files must pack into 1")
    assert(after("_dt=2026-01-02").size == 1, "2 small files must pack into 1")
    assert(readAll(root) == expected, "compaction must not change contents")
    // idempotent: nothing left to compact => no new snapshot published
    val gen = SnapshotStore.currentSnapshot(root)
    SnapshotStore.optimizeBinPack(spark, root, targetFileBytes = 8192)
    assert(SnapshotStore.currentSnapshot(root) == gen,
      "a table with nothing to compact must publish nothing")
  }

  test("delete: partition-scoped, untouched partitions hard-link, delete rows feed CDC") {
    val root = tmpRoot()
    SnapshotStore.merge(spark, root, rows(Seq(
      (1L, "2026-01-01", "a"), (2L, "2026-01-02", "b"),
      (22L, "2026-01-02", "b2"), (3L, "2026-01-03", "c"))), Seq("id"), pd)
    val before = inodesByPartition(root)
    SnapshotStore.delete(spark, root, col("id") === 2L, changeFeed = true)
    val after = inodesByPartition(root)
    for (dt <- Seq("_dt=2026-01-01", "_dt=2026-01-03"))
      assertCarried(before(dt), after(dt), dt)
    assert(after("_dt=2026-01-02") != before("_dt=2026-01-02"))
    assert(readAll(root) == Set(
      (1L, "2026-01-01", "a"), (22L, "2026-01-02", "b2"), (3L, "2026-01-03", "c")))
    assert(SnapshotStore.changes(spark, root).get
      .select("id", "_change_type", "_commit_version")
      .as[(Long, String, Long)].collect().toSet == Set((2L, "delete", 2L)))
    // a whole-partition delete makes the partition disappear
    SnapshotStore.delete(spark, root, col("dt") === "2026-01-03")
    assert(!inodesByPartition(root).contains("_dt=2026-01-03"))
    assert(readAll(root) == Set((1L, "2026-01-01", "a"), (22L, "2026-01-02", "b2")))
    // no matches (incl. NULL predicate rows) => nothing published
    val gen = SnapshotStore.currentSnapshot(root)
    SnapshotStore.delete(spark, root, col("id") === 99L)
    SnapshotStore.delete(spark, root, when(col("id") === 1L, lit(null)).otherwise(lit(false)).cast("boolean"))
    assert(SnapshotStore.currentSnapshot(root) == gen,
      "no-match / NULL-predicate deletes must publish nothing")
  }

  test("deleteKeys: frame-driven anti-join delete — partition-scoped, CDC retractions, NULL keys kept, replay is a no-op") {
    val root = tmpRoot()
    SnapshotStore.merge(spark, root, rows(Seq(
      (1L, "2026-01-01", "a"), (2L, "2026-01-02", "b"),
      (22L, "2026-01-02", "b2"), (3L, "2026-01-03", "c"))), Seq("id"), pd)
    val before = inodesByPartition(root)
    // the doomed keys arrive as a FRAME (an upstream computation, never a
    // literal); a NULL key must match nothing (SQL IN semantics)
    val doomed = Seq(Some(2L), None, Some(99L)).toDF("id")
    SnapshotStore.deleteKeys(spark, root, Seq("id"), doomed, changeFeed = true)
    val after = inodesByPartition(root)
    for (dt <- Seq("_dt=2026-01-01", "_dt=2026-01-03"))
      assertCarried(before(dt), after(dt), dt)
    assert(after("_dt=2026-01-02") != before("_dt=2026-01-02"))
    assert(readAll(root) == Set(
      (1L, "2026-01-01", "a"), (22L, "2026-01-02", "b2"), (3L, "2026-01-03", "c")))
    assert(SnapshotStore.changes(spark, root).get
      .select("id", "_change_type", "_commit_version")
      .as[(Long, String, Long)].collect().toSet == Set((2L, "delete", 2L)))
    // replay (at-least-once redelivery of the takedown batch): the keys
    // are already gone, so nothing matches and nothing is published
    val gen = SnapshotStore.currentSnapshot(root)
    SnapshotStore.deleteKeys(spark, root, Seq("id"), doomed, changeFeed = true)
    assert(SnapshotStore.currentSnapshot(root) == gen,
      "a replayed keyed delete must publish nothing")
    // composite key: only the exact (id, payload) pair dies
    SnapshotStore.deleteKeys(spark, root, Seq("id", "payload"),
      Seq((22L, "WRONG"), (3L, "c")).toDF("id", "payload"))
    assert(readAll(root) == Set(
      (1L, "2026-01-01", "a"), (22L, "2026-01-02", "b2")))
  }

  test("deleteKeys on a flat (unpartitioned) table") {
    val root = tmpRoot()
    SnapshotStore.merge(spark, root, rows(Seq(
      (1L, "2026-01-01", "a"), (2L, "2026-01-02", "b"))), Seq("id"))
    SnapshotStore.deleteKeys(spark, root, Seq("id"), Seq(1L).toDF("id"))
    assert(readAll(root) == Set((2L, "2026-01-02", "b")))
  }

  test("applyChanges on an empty in-range feed is a no-op, not an NPE") {
    val src = tmpRoot(); val dst = tmpRoot()
    SnapshotStore.merge(spark, src, rows(Seq((1L, "2026-01-01", "a"))),
      Seq("id"), pd, changeFeed = true)
    val v1 = SnapshotStore.applyChanges(spark, src, dst, Seq("id"), to_date(col("dt")))
    assert(v1 == 1L)
    // a merge of a ZERO-ROW batch still publishes a feed commit — the
    // state a watermark-filtered incremental run with no new rows leaves
    SnapshotStore.merge(spark, src, rows(Seq()), Seq("id"), pd, changeFeed = true)
    val v2 = SnapshotStore.applyChanges(spark, src, dst, Seq("id"), to_date(col("dt")))
    assert(v2 == v1, s"empty feed must leave the watermark at $v1, got $v2")
    assert(readAll(dst) == Set((1L, "2026-01-01", "a")))
  }

  test("microbatch: off-grid window starts truncate to the period grid — retries never straddle") {
    val root = tmpRoot()
    val day = 86400000L
    val base = java.time.LocalDate.parse("2026-01-01")
    def ms(d: Int) = base.plusDays(d).atStartOfDay(java.time.ZoneOffset.UTC)
      .toInstant.toEpochMilli
    val data = (0 until 8).map(d => (d.toLong, base.plusDays(d).toString, s"p$d"))
    def batch(s: Long, e: Long) =
      rows(data).filter(unix_millis(to_timestamp(col("dt"))) >= s &&
        unix_millis(to_timestamp(col("dt"))) < e)
    // main run on 2-day windows from an off-grid start (mid-day offset):
    // starts must floor onto the epoch-anchored grid
    val wins = Microbatch.run(spark, root, batch, to_date(col("dt")),
      ms(0) + 3 * 3600 * 1000L, ms(8), periodMs = 2 * day)
    assert(wins.forall { case (st, en) => st % (2 * day) == 0 && en == st + 2 * day },
      s"windows must sit on the epoch 2-day grid: $wins")
    val before = readAll(root)
    assert(before == data.toSet)
    // a retry launched from a DIFFERENT off-grid bound lands on the same
    // grid and must leave the table unchanged (this is the silent-loss
    // case when starts are not truncated: a straddling window would
    // wholesale-replace a partition with only its half of the rows)
    Microbatch.run(spark, root, batch, to_date(col("dt")),
      ms(3) + 7 * 3600 * 1000L, ms(5), periodMs = 2 * day)
    assert(readAll(root) == before, "a replayed off-grid window lost rows")
  }

  test("reads are manifest-committed: a file on disk but not in the manifest is invisible") {
    val root = tmpRoot()
    SnapshotStore.merge(spark, root, rows(Seq(
      (1L, "2026-01-01", "a"), (2L, "2026-01-02", "b"))), Seq("id"), pd)
    // plant a rogue parquet file inside the live snapshot dir — a
    // listing-based read would absorb its rows; the manifest read must not
    val snap = Paths.get(root, SnapshotStore.currentSnapshot(root).get)
    val rogueDir = snap.resolve("_dt=2026-01-09")
    rows(Seq((99L, "2026-01-09", "rogue"))).drop("dt")
      .write.parquet(rogueDir.resolve("tmp").toString)
    Files.list(rogueDir.resolve("tmp")).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .foreach(p => Files.move(p, rogueDir.resolve("rogue.parquet")))
    assert(readAll(root) == Set((1L, "2026-01-01", "a"), (2L, "2026-01-02", "b")))
    assert(SnapshotStore.readSkipping(spark, root).get._1.count() == 2)
  }

  test("manifest carries file stats across merges for hard-linked untouched partitions") {
    val root = tmpRoot()
    SnapshotStore.merge(spark, root, rows(Seq(
      (1L, "2026-01-01", "a"), (2L, "2026-01-02", "b"))), Seq("id"), pd)
    SnapshotStore.optimize(spark, root, filesPerPartition = 1, clusterBy = Seq("id"))
    // touch only 2026-01-02: the untouched partition's files (and their
    // stats, keyed by stable relative path) must survive into the new
    // manifest, so skipping keeps working without a re-analyze
    SnapshotStore.merge(spark, root, rows(Seq((2L, "2026-01-02", "b2"))), Seq("id"), pd)
    val snap = Paths.get(root, SnapshotStore.currentSnapshot(root).get)
    val m = Manifest.read(snap).get
    val carried = m.files.filter(_.partitionValue.contains("2026-01-01"))
    assert(carried.nonEmpty && carried.forall(_.stats.isDefined))
    // rewritten partition: fresh files, no (stale) stats
    val rewritten = m.files.filter(_.partitionValue.contains("2026-01-02"))
    assert(rewritten.nonEmpty && rewritten.forall(_.stats.isEmpty))
  }

  test("schema drift: default (ignore) fails fast on a missing column, drops extras") {
    val root = tmpRoot()
    SnapshotStore.merge(spark, root, rows(Seq((1L, "2026-01-01", "a"))), Seq("id"), pd)
    // batch WITHOUT `payload` — accidental drift must be loud, not NULL-fill
    intercept[SchemaDriftException] {
      SnapshotStore.merge(spark, root,
        Seq((2L, "2026-01-02")).toDF("id", "dt"), Seq("id"), pd)
    }
    // batch with an extra column: dropped silently (dbt ignore parity)
    SnapshotStore.merge(spark, root,
      Seq((2L, "2026-01-02", "b", "x")).toDF("id", "dt", "payload", "extra"),
      Seq("id"), pd)
    assert(SnapshotStore.read(spark, root).get.columns.sorted.toSeq ==
      Seq("dt", "id", "payload"))
  }

  test("schema drift: Fail refuses any change; non-widenable retype refuses everywhere") {
    val root = tmpRoot()
    SnapshotStore.merge(spark, root, rows(Seq((1L, "2026-01-01", "a"))), Seq("id"), pd)
    intercept[SchemaDriftException] {
      SnapshotStore.merge(spark, root,
        Seq((2L, "2026-01-02", "b", "x")).toDF("id", "dt", "payload", "extra"),
        Seq("id"), pd, onSchemaChange = OnSchemaChange.Fail)
    }
    // a retype with no lossless direction (long vs boolean — note string
    // absorbs atomics under Spark's up-cast rules, so it can't refuse):
    // refuse even under the permissive evolution mode
    val root2 = tmpRoot()
    SnapshotStore.merge(spark, root2,
      Seq((1L, "2026-01-01", 7L)).toDF("id", "dt", "n"), Seq("id"), pd)
    intercept[SchemaDriftException] {
      SnapshotStore.merge(spark, root2,
        Seq((2L, "2026-01-02", true)).toDF("id", "dt", "n"),
        Seq("id"), pd, onSchemaChange = OnSchemaChange.AppendNewColumns)
    }
  }

  test("type widening: int->long and float->double merge through AppendNewColumns") {
    val root = tmpRoot()
    SnapshotStore.merge(spark, root,
      Seq((1, "2026-01-01", 1.5f), (2, "2026-01-02", 2.5f))
        .toDF("id", "dt", "v"), Seq("id"), pd)
    // batch arrives widened; only 2026-01-02 is touched, so 2026-01-01's
    // int/float files are hard-linked UNREAD and must widen at scan time
    SnapshotStore.merge(spark, root,
      Seq((2L, "2026-01-02", 9.5d), (3L, "2026-01-03", 3.5d))
        .toDF("id", "dt", "v"), Seq("id"), pd,
      onSchemaChange = OnSchemaChange.AppendNewColumns)
    val df = SnapshotStore.read(spark, root).get
    assert(df.schema("id").dataType == org.apache.spark.sql.types.LongType)
    assert(df.schema("v").dataType == org.apache.spark.sql.types.DoubleType)
    assert(df.select("id", "v").as[(Long, Double)].collect().toSet ==
      Set((1L, 1.5), (2L, 9.5), (3L, 3.5)))
    // narrower batch after widening: upcast on write, table stays wide
    SnapshotStore.merge(spark, root,
      Seq((4, "2026-01-04", 4.5f)).toDF("id", "dt", "v"), Seq("id"), pd,
      onSchemaChange = OnSchemaChange.AppendNewColumns)
    val df2 = SnapshotStore.read(spark, root).get
    assert(df2.schema("id").dataType == org.apache.spark.sql.types.LongType)
    assert(df2.filter(col("id") === 4).select("v").as[Double].head() == 4.5)
  }

  test("SyncAllColumns: batch schema wins — removed column dropped, new added") {
    val root = tmpRoot()
    SnapshotStore.merge(spark, root, rows(Seq((1L, "2026-01-01", "a"))), Seq("id"), pd)
    SnapshotStore.merge(spark, root,
      Seq((2L, "2026-01-02", 7L)).toDF("id", "dt", "n"), Seq("id"), pd,
      onSchemaChange = OnSchemaChange.SyncAllColumns)
    val df = SnapshotStore.read(spark, root).get
    assert(df.columns.sorted.toSeq == Seq("dt", "id", "n"))
    assert(df.filter(col("id") === 1).select("n").head().isNullAt(0))
  }

  test("generation fencing: a claimed next-snapshot name refuses a second writer, table unharmed") {
    val root = tmpRoot()
    SnapshotStore.merge(spark, root, rows(Seq((1L, "2026-01-01", "a"))), Seq("id"), pd)
    // a concurrent writer (or a crashed one's orphan) already claimed the
    // next generation — this merge must fail BEFORE writing anything
    Files.createDirectory(Paths.get(root, "snap-0000002"))
    intercept[ConcurrentWriteException] {
      SnapshotStore.merge(spark, root, rows(Seq((2L, "2026-01-02", "b"))), Seq("id"), pd)
    }
    assert(readAll(root) == Set((1L, "2026-01-01", "a")))
    // recovery: drop the orphan, the next merge proceeds normally
    Files.delete(Paths.get(root, "snap-0000002"))
    SnapshotStore.merge(spark, root, rows(Seq((2L, "2026-01-02", "b"))), Seq("id"), pd)
    assert(readAll(root) == Set((1L, "2026-01-01", "a"), (2L, "2026-01-02", "b")))
  }

  test("insert_overwrite replaces touched partitions wholesale; untouched hard-link") {
    val root = tmpRoot()
    SnapshotStore.insertOverwrite(spark, root, rows(Seq(
      (1L, "2026-01-01", "keep"), (2L, "2026-01-02", "stale"),
      (3L, "2026-01-02", "stale2"))), to_date(col("dt")))
    val before = inodesByPartition(root)
    // recompute day 2 only: both stale rows must vanish even though their
    // keys don't collide with the batch (no key semantics at all)
    SnapshotStore.insertOverwrite(spark, root, rows(Seq(
      (9L, "2026-01-02", "fresh"))), to_date(col("dt")))
    assert(readAll(root) == Set((1L, "2026-01-01", "keep"), (9L, "2026-01-02", "fresh")))
    // day 1 carried — zero bytes moved under hard links, an independent
    // copy under the object-store mapping
    val after = inodesByPartition(root)
    assertCarried(before("_dt=2026-01-01"), after("_dt=2026-01-01"), "_dt=2026-01-01")
    // a keyed merge of the same batch would have KEPT the stale rows —
    // the two strategies genuinely differ on this input
    val root2 = tmpRoot()
    SnapshotStore.merge(spark, root2, rows(Seq(
      (1L, "2026-01-01", "keep"), (2L, "2026-01-02", "stale"),
      (3L, "2026-01-02", "stale2"))), Seq("id"), pd)
    SnapshotStore.merge(spark, root2, rows(Seq((9L, "2026-01-02", "fresh"))),
      Seq("id"), pd)
    assert(readAll(root2).size == 4)
  }

  test("shallow clone: zero-copy independent table; divergence never crosses") {
    val src = tmpRoot(); val dst = tmpRoot() + "/clone"
    SnapshotStore.merge(spark, src, rows(Seq(
      (1L, "2026-01-01", "a"), (2L, "2026-01-02", "b"))), Seq("id"), pd)
    SnapshotStore.clone(spark, src, dst)
    assert(SnapshotStore.read(spark, dst).get
      .select("id", "dt", "payload").as[(Long, String, String)].collect().toSet ==
      readAll(src))
    // hard-link mode: zero-copy, the cloned day-1 file IS the source's
    // (same inode); copy mode: a deep clone with independent bytes
    assertCarried(inodesByPartition(src)("_dt=2026-01-01"),
      inodesByPartition(dst)("_dt=2026-01-01"), "cloned _dt=2026-01-01")
    // diverge both sides; neither sees the other's writes
    SnapshotStore.merge(spark, dst, rows(Seq((3L, "2026-01-03", "c"))), Seq("id"), pd)
    SnapshotStore.merge(spark, src, rows(Seq((2L, "2026-01-02", "B2"))), Seq("id"), pd)
    assert(readAll(src) == Set((1L, "2026-01-01", "a"), (2L, "2026-01-02", "B2")))
    assert(SnapshotStore.read(spark, dst).get
      .select("id", "dt", "payload").as[(Long, String, String)].collect().toSet ==
      Set((1L, "2026-01-01", "a"), (2L, "2026-01-02", "b"), (3L, "2026-01-03", "c")))
    // vacuuming the source never invalidates the clone's hard links
    SnapshotStore.vacuum(src, keep = 0)
    assert(SnapshotStore.read(spark, dst).get.count() == 3)
    // cloning onto an existing table refuses
    intercept[IllegalArgumentException] {
      SnapshotStore.clone(spark, src, dst)
    }
  }

  test("vacuum retention window spares young snapshots regardless of keep") {
    val root = tmpRoot()
    SnapshotStore.merge(spark, root, rows(Seq((1L, "2026-01-01", "a"))), Seq("id"), pd)
    SnapshotStore.merge(spark, root, rows(Seq((2L, "2026-01-02", "b"))), Seq("id"), pd)
    SnapshotStore.merge(spark, root, rows(Seq((3L, "2026-01-03", "c"))), Seq("id"), pd)
    // all three generations are seconds old: a 1-hour retention window
    // must refuse to drop ANY of them even with keep = 0
    SnapshotStore.vacuum(root, keep = 0, retainMs = 3600L * 1000)
    assert(SnapshotStore.snapshots(root).size == 3)
    // with the window elapsed (0), generation-count retention applies
    SnapshotStore.vacuum(root, keep = 0)
    assert(SnapshotStore.snapshots(root) == Seq("snap-0000003"))
  }

  test("restore: rollback publishes a new generation by hard link; history intact") {
    val root = tmpRoot()
    SnapshotStore.merge(spark, root, rows(Seq(
      (1L, "2026-01-01", "a"), (2L, "2026-01-02", "b"))), Seq("id"), pd)
    SnapshotStore.merge(spark, root, rows(Seq(
      (2L, "2026-01-02", "CORRUPT"), (3L, "2026-01-03", "c"))), Seq("id"), pd)
    val before = inodesByPartition(root) // gen 2's files, keyed by partition
    SnapshotStore.restore(spark, root, "snap-0000001")
    // live = gen 1's contents; the restore is generation 3, not a rewind
    assert(readAll(root) == Set((1L, "2026-01-01", "a"), (2L, "2026-01-02", "b")))
    assert(SnapshotStore.currentSnapshot(root).contains("snap-0000003"))
    // hard-link mode: pure metadata, gen 3's untouched _dt=2026-01-01
    // file IS gen 1/2's (same inode); copy mode: re-materialized bytes
    val after = inodesByPartition(root)
    assertCarried(before("_dt=2026-01-01"), after("_dt=2026-01-01"),
      "restored _dt=2026-01-01")
    // the bad generation stays time-travelable until vacuum
    val gen2 = SnapshotStore.readAt(spark, root, "snap-0000002").get
      .select("id", "dt", "payload").as[(Long, String, String)].collect().toSet
    assert(gen2 == Set((1L, "2026-01-01", "a"), (2L, "2026-01-02", "CORRUPT"),
      (3L, "2026-01-03", "c")))
    // restoring the restore (back to gen 2) also works — gen 4
    SnapshotStore.restore(spark, root, "snap-0000002")
    assert(readAll(root) == gen2)
    // restore-to-current is a no-op: no generation published
    SnapshotStore.restore(spark, root, "snap-0000004")
    assert(SnapshotStore.snapshots(root).size == 4)
    // a vacuumed target refuses loudly
    SnapshotStore.vacuum(root, keep = 0)
    intercept[IllegalArgumentException] {
      SnapshotStore.restore(spark, root, "snap-0000001")
    }
  }

  test("S10 target schema naming follows the get_custom_schema macro") {
    def dir(t: Target) = new Runner("/w", Nil, target = Some(t)).tableDir("fct")
    // prod → team schema verbatim
    assert(dir(Target("prod", "deepbook")) == "/w/deepbook/fct")
    // dev without suffix → trailing underscore kept (the macro's default)
    assert(dir(Target("dev", "deepbook")) == "/w/deepbook__tmp_/fct")
    // dev with suffix (CI sets the PR number), whitespace trimmed
    assert(dir(Target("dev", "deepbook", " 123 ")) == "/w/deepbook__tmp_123/fct")
    // no target → flat legacy layout
    assert(new Runner("/w", Nil).tableDir("fct") == "/w/fct")
  }
}

/** The ENTIRE SnapshotStore contract re-run under the object-store
  * carryover ([[FileIO.Copy]]): every test above executes with per-file
  * copies instead of hard links, proving the store assumes no link
  * support anywhere — the posture it needs where the reference's 100 TB
  * actually lives (Delta tables on object storage). Physical assertions
  * flip inside [[SnapshotStoreSpec.assertCarried]]; clone and restore
  * become deep (independent bytes) with identical visibility semantics. */
class SnapshotStoreCopyModeSpec extends SnapshotStoreSpec {
  override protected def withFixture(test: NoArgTest): org.scalatest.Outcome =
    FileIO.withIO(FileIO.Copy)(super.withFixture(test))
}
