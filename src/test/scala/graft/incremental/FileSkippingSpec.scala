package graft.incremental

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** File-level data skipping: sidecar round-trip, pruning correctness
  * (results identical to the plain read under every modeled predicate
  * shape), pruning EFFECTIVENESS on a range-clustered layout, and the
  * conservative fallbacks that make a stale or absent sidecar safe. */
class FileSkippingSpec extends SparkSpec {
  import spark.implicits._

  private def tmpRoot(): String =
    Files.createTempDirectory("graft-skip").resolve("t").toString

  /** 400 rows, ids 1..400, text labels, a nullable col null for ids > 300. */
  private def table(): org.apache.spark.sql.DataFrame =
    spark.range(1, 401).toDF("id")
      .withColumn("label", concat(lit("item-"), format_string("%03d", col("id"))))
      .withColumn("maybe", when(col("id") <= 300, col("id") * 2))
      .withColumn("day", when(col("id") <= 200, "2026-01-01").otherwise("2026-01-02"))

  test("optimize(clusterBy) records sound per-file ranges in the manifest") {
    val root = tmpRoot()
    SnapshotStore.merge(spark, root, table(), Seq("id"))
    SnapshotStore.optimize(spark, root, filesPerPartition = 8, clusterBy = Seq("id"))
    val snap = Paths.get(root, SnapshotStore.currentSnapshot(root).get)
    val stats = Manifest.read(snap).get.statsMap
    assert(stats.nonEmpty)
    // every file's id range is present, and ranges are pairwise disjoint
    // (the repartitionByRange layout — what makes skipping selective)
    val ranges = stats.values.toSeq
      .map(fs => (fs.cols("id").min.get.toLong, fs.cols("id").max.get.toLong))
      .sortBy(_._1)
    assert(ranges.size >= 4, s"expected several files, got $ranges")
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) => assert(hi < lo2, s"overlap in $ranges")
      case _ => ()
    }
    assert(ranges.map(_._1).min == 1 && ranges.map(_._2).max == 400)
  }

  test("point lookup touches one file; results identical to the plain read") {
    val root = tmpRoot()
    SnapshotStore.merge(spark, root, table(), Seq("id"))
    SnapshotStore.optimize(spark, root, filesPerPartition = 8, clusterBy = Seq("id"))
    val (df, Some(idx)) = SnapshotStore.readSkipping(spark, root).get
    val got = df.filter(col("id") === 137).collect()
    assert(got.map(_.getAs[Long]("id")).toSeq == Seq(137L))
    assert(got.head.getAs[String]("label") == "item-137")
    assert(idx.lastKept == 1, s"kept=${idx.lastKept} skipped=${idx.lastSkipped}")
    assert(idx.lastSkipped >= 4)
    // range predicate: only the covering files survive
    val n = df.filter(col("id") > 350).count()
    assert(n == 50)
    assert(idx.lastSkipped >= 4)
  }

  test("every modeled predicate shape matches the plain read") {
    val root = tmpRoot()
    SnapshotStore.merge(spark, root, table(), Seq("id"))
    SnapshotStore.optimize(spark, root, filesPerPartition = 8,
      clusterBy = Seq("id", "label", "maybe"))
    val (df, _) = SnapshotStore.readSkipping(spark, root).get
    val plain = SnapshotStore.read(spark, root).get
    val predicates = Seq(
      col("id") === 1, col("id") === 400, col("id") === 9999,
      col("id") > 390, col("id") >= 390, col("id") < 11, col("id") <= 11,
      col("id").isin(5, 205, 405),
      col("label") === "item-250", col("label").startsWith("item-39"),
      col("label") < "item-010",
      col("maybe").isNull, col("maybe").isNotNull,
      col("maybe") === 100, col("maybe") === 999,
      col("id") > 100 && col("id") < 110,
      col("id") < 5 || col("id") > 395)
    predicates.foreach { p =>
      val a = df.filter(p).orderBy("id").collect().map(_.toSeq).toSeq
      val b = plain.filter(p).orderBy("id").collect().map(_.toSeq).toSeq
      assert(a == b, s"mismatch under $p")
    }
  }

  test("partitioned table: partition pruning composes with file skipping") {
    val root = tmpRoot()
    SnapshotStore.merge(spark, root, table(), Seq("id"), Some(col("day")))
    SnapshotStore.optimize(spark, root, filesPerPartition = 4, clusterBy = Seq("id"))
    val (df, Some(idx)) = SnapshotStore.readSkipping(spark, root).get
    val got = df.filter(col("id") === 42).select("label").as[String].collect()
    assert(got.toSeq == Seq("item-042"))
    assert(idx.lastSkipped > 0)
    val both = df.filter(col("id") <= 210).count()
    assert(both == 210)
  }

  test("no sidecar -> plain read; unmodeled predicates keep every file") {
    val root = tmpRoot()
    SnapshotStore.merge(spark, root, table(), Seq("id"))
    // no optimize: no sidecar
    val (df, idx) = SnapshotStore.readSkipping(spark, root).get
    assert(idx.isEmpty)
    assert(df.filter(col("id") === 7).count() == 1)
    // with a sidecar but filtering on an un-profiled column: no skipping
    SnapshotStore.optimize(spark, root, filesPerPartition = 8, clusterBy = Seq("id"))
    val (df2, Some(idx2)) = SnapshotStore.readSkipping(spark, root).get
    assert(df2.filter(col("label") === "item-123").count() == 1)
    assert(idx2.lastSkipped == 0)
  }

  test("analyze refreshes stats for new columns without rewriting data") {
    val root = tmpRoot()
    SnapshotStore.merge(spark, root, table(), Seq("id"))
    SnapshotStore.optimize(spark, root, filesPerPartition = 8, clusterBy = Seq("id"))
    SnapshotStore.analyze(spark, root, Seq("id", "label", "maybe"))
    val snap = Paths.get(root, SnapshotStore.currentSnapshot(root).get)
    val stats = Manifest.read(snap).get.statsMap
    assert(stats.values.forall(_.cols.keySet == Set("id", "label", "maybe")))
    // all-null files for `maybe` are skippable under equality but kept
    // under isNull
    val (df, Some(idx)) = SnapshotStore.readSkipping(spark, root).get
    assert(df.filter(col("maybe") === 42).count() == 1)
    assert(df.filter(col("maybe").isNull).count() == 100)
  }

  test("zorder makes BOTH cluster columns skippable; lexicographic only the first") {
    // a full 128x128 grid: for any x-slice, y spans the whole domain (and
    // vice versa) — genuinely independent keys. (A modular-product pair
    // like (i mod p, 7919 i mod p) is NOT independent: y is a constant
    // function of x for fixed residue, which silently hands the
    // lexicographic layout y-selectivity too.)
    val data = spark.range(0, 16384).toDF("i")
      .withColumn("x", col("i") % 128)
      .withColumn("y", (col("i") / 128).cast("long") % 128)
      .withColumnRenamed("i", "id")
    def build(zorder: Boolean): String = {
      val root = tmpRoot()
      SnapshotStore.merge(spark, root, data, Seq("id"))
      SnapshotStore.optimize(spark, root, filesPerPartition = 64,
        clusterBy = Seq("x", "y"), zorder = zorder)
      root
    }
    val lex = build(zorder = false)
    val zed = build(zorder = true)
    def probe(root: String, pred: org.apache.spark.sql.Column): (Long, Int, Int) = {
      val (df, Some(idx)) = SnapshotStore.readSkipping(spark, root).get
      val n = df.filter(pred).count()
      (n, idx.lastKept, idx.lastSkipped)
    }
    // identical answers under every probe — layout must never change results
    val expectedY = data.filter(col("y") === 17).count()
    val (ny1, _, skipLexY) = probe(lex, col("y") === 17)
    val (ny2, keptZedY, skipZedY) = probe(zed, col("y") === 17)
    assert(ny1 == expectedY && ny2 == expectedY)
    // lexicographic (x, y) layout: every file spans the whole y domain —
    // a y-only predicate prunes (almost) nothing
    assert(skipLexY <= 2, s"lex layout unexpectedly skipped $skipLexY files on y")
    // z-order: each file covers a hypercube => y-only predicates prune most
    assert(skipZedY >= (keptZedY + skipZedY) / 2,
      s"zorder skipped only $skipZedY of ${keptZedY + skipZedY} files on y")
    // and x stays skippable under z-order too
    val expectedX = data.filter(col("x") === 17).count()
    val (nx, keptZedX, skipZedX) = probe(zed, col("x") === 17)
    assert(nx == expectedX)
    assert(skipZedX >= (keptZedX + skipZedX) / 2,
      s"zorder skipped only $skipZedX of ${keptZedX + skipZedX} files on x")
  }
}
