package graft

import org.apache.spark.sql.functions._

/** SURVEY §4 "bucketing for co-located joins": writing both join sides
  * bucketed on the join key lets the sort-merge join read buckets
  * directly — zero shuffle exchanges in the executed plan. The
  * pre-partitioning pattern that turns the biggest recurring join of a
  * 100 TB pipeline from O(table) network into local disk reads. */
class BucketedJoinSpec extends SparkSpec {

  test("bucketBy(join key) removes both shuffle exchanges from the join") {
    val dir = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")
    spark.read.parquet(s"$dir/orders.parquet")
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("orders_b")
    spark.read.parquet(s"$dir/customer.parquet")
      .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("customer_b")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(500))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n${plan.take(1500)}")
      // and it still computes the right thing
      val viaBuckets = joined.count()
      val viaPlain = spark.read.parquet(s"$dir/orders.parquet")
        .join(spark.read.parquet(s"$dir/customer.parquet"),
          col("o_custkey") === col("c_custkey")).count()
      assert(viaBuckets == viaPlain && viaBuckets > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("snapshot-store bucketed layout: declared once, zero-exchange join, " +
      "survives merge and optimize") {
    import graft.incremental.{Manifest, SnapshotStore}
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-bucketstore").toString
    val dir = "/root/testdata/sf0.001"
    val bk = Some(Manifest.Buckets(8, Seq("k"), Seq("k")))
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey").as("k"), col("o_totalprice"))
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey").as("k"), col("c_mktsegment"))
    SnapshotStore.merge(spark, s"$root/orders", orders, Seq("o_orderkey"), bucketBy = bk)
    SnapshotStore.merge(spark, s"$root/cust", cust, Seq("k"), bucketBy = bk)
    // layout recorded and every data file carries a parseable bucket id
    assert(SnapshotStore.liveBuckets(s"$root/orders") == bk)
    val m = Manifest.read(java.nio.file.Paths.get(s"$root/orders",
      SnapshotStore.currentSnapshot(s"$root/orders").get)).get
    assert(m.files.nonEmpty && m.files.forall { f =>
      val n = f.path.split('/').last
      org.apache.spark.sql.execution.datasources.BucketingUtils
        .getBucketId(n).exists(b => b >= 0 && b < 8)
    }, s"every file needs a bucket suffix: ${m.files.map(_.path).take(3)}")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    def joined() = SnapshotStore.read(spark, s"$root/orders").get
      .join(SnapshotStore.read(spark, s"$root/cust").get, Seq("k"))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = joined().queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(500))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"store-bucketed join must not shuffle:\n${plan.take(1500)}")
      val expected = orders.join(cust, Seq("k")).count()
      assert(joined().count() == expected && expected > 0)

      // a later merge preserves the layout without re-declaring it —
      // and the rewritten files keep bucket ids (rows move buckets never)
      SnapshotStore.merge(spark, s"$root/orders",
        orders.limit(10).withColumn("o_totalprice", col("o_totalprice") + 1),
        Seq("o_orderkey"))
      assert(SnapshotStore.liveBuckets(s"$root/orders") == bk)
      assert(joined().count() == expected)
      assert(!joined().queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"))

      // OPTIMIZE keeps the layout (bucket = compaction unit); binPack
      // delegates rather than mixing buckets
      SnapshotStore.optimize(spark, s"$root/orders")
      assert(SnapshotStore.liveBuckets(s"$root/orders") == bk)
      assert(joined().count() == expected)
      SnapshotStore.optimizeBinPack(spark, s"$root/cust")
      assert(SnapshotStore.liveBuckets(s"$root/cust") == bk)
      assert(joined().count() == expected)
      assert(!joined().queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"))

      // re-declaring a DIFFERENT layout on a live table is refused
      intercept[IllegalArgumentException] {
        SnapshotStore.merge(spark, s"$root/cust", cust, Seq("k"),
          bucketBy = Some(Manifest.Buckets(4, Seq("k"), Nil)))
      }

      // bucket PRUNING: a point filter on the bucket column confines the
      // scan to ONE of the 8 buckets (Spark's optionalBucketSet — free
      // once the BucketSpec is exposed; at 100 TB a keyed point lookup
      // reads 1/n of the table before any file/row-group pruning).
      // DisableUnnecessaryBucketedScan keeps bare scans un-bucketed for
      // parallelism (same as catalog tables); opt out to pin the pruning.
      val prevAuto =
        spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
      try {
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        val pointPlan = SnapshotStore.read(spark, s"$root/cust").get
          .filter(col("k") === 42).queryExecution.executedPlan.toString
        assert(pointPlan.contains("SelectedBucketsCount: 1 out of 8"),
          s"point lookup must prune to one bucket:\n${pointPlan.take(1200)}")
      } finally spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", prevAuto)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }

  test("iterative consumer: a bucketed edge table feeds every PageRank-style " +
      "iteration without ever shuffling the edges") {
    // g1/SCALE.md claim, plan-pinned: the BIG static side of an iterative
    // graph loop (edges) persists bucketed on the join key; each
    // iteration's rank⋈edges join then reads co-located buckets — only
    // the (small) per-iteration rank aggregate shuffles, the edge table
    // never moves. The edges scan appearing under an Exchange in ANY
    // iteration is a regression.
    import graft.incremental.{Manifest, SnapshotStore}
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-bucketiter").toString
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      val n = 1000L
      val edges = spark.range(n).toDF("src")
        .select(col("src"), explode(array(
          (col("src") * 7 + 1) % n, (col("src") * 11 + 3) % n)).as("dst"))
      SnapshotStore.merge(spark, root, edges, Seq("src", "dst"),
        bucketBy = Some(Manifest.Buckets(8, Seq("src"), Seq("src"))))
      val edgeT = SnapshotStore.read(spark, root).get
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      var ranks = spark.range(n).toDF("src").withColumn("r", lit(1000000L))
      (1 to 3).foreach { _ =>
        val contrib = edgeT.join(ranks.repartition(8, col("src")), Seq("src"))
          .select(col("dst").as("src"), (col("r") / 2).cast("long").as("c"))
        ranks = contrib.groupBy(col("src")).agg(sum(col("c")).as("r"))
          .localCheckpoint()
      }
      val planStr = {
        // re-derive one more iteration WITHOUT checkpointing so the whole
        // join subtree is visible in a single plan
        val it = edgeT.join(ranks.repartition(8, col("src")), Seq("src"))
          .groupBy(col("dst")).agg(sum(col("r")).as("r"))
        it.queryExecution.executedPlan.toString
      }
      // the scan side must join bucket-aligned: no exchange may sit
      // between the parquet scan of the edge table and the join
      val scanToJoin = planStr.split("SortMergeJoin")
      assert(planStr.contains("SortMergeJoin"), planStr.take(800))
      assert(scanToJoin.last.contains("FileScan parquet"), planStr.take(1500))
      // exactly two exchanges: the RANK side's repartition and the
      // post-join sum-by-dst aggregate — never a third for the edges
      val exchanges = "Exchange hashpartitioning".r.findAllIn(planStr).length
      assert(exchanges == 2,
        s"only the rank side and the dst aggregate may shuffle, found " +
          s"$exchanges exchanges:\n${planStr.take(2000)}")
      // and the edges branch is Sort-over-FileScan directly (no exchange
      // between the bucketed scan and the join)
      val edgesBranch = planStr.substring(planStr.indexOf("SortMergeJoin"))
        .linesIterator.takeWhile(!_.contains("Exchange hashpartitioning"))
        .mkString("\n")
      assert(edgesBranch.contains("FileScan parquet"),
        s"edges scan must sit under the join with no exchange:\n$edgesBranch")
      assert(ranks.agg(sum(col("r"))).head.getLong(0) > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }

  test("partitioned AND bucketed store table: partition-scoped merge keeps " +
      "both layouts; reads stay correct") {
    import graft.incremental.{Manifest, SnapshotStore}
    val root = java.nio.file.Files.createTempDirectory("graft-pb").toString
    try {
      val dir = "/root/testdata/sf0.001"
      val bk = Some(Manifest.Buckets(4, Seq("k"), Seq("k")))
      val orders = spark.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey").as("k"),
          col("o_orderdate").cast("date").as("d"), col("o_totalprice"))
      SnapshotStore.merge(spark, root, orders, Seq("o_orderkey"),
        partitionDate = Some(col("d")), bucketBy = bk)
      val m = Manifest.read(java.nio.file.Paths.get(root,
        SnapshotStore.currentSnapshot(root).get)).get
      assert(m.partitioned && m.buckets == bk)
      // every file sits in a _dt dir AND carries a bucket suffix
      assert(m.files.nonEmpty && m.files.forall { f =>
        f.partitionValue.isDefined &&
          org.apache.spark.sql.execution.datasources.BucketingUtils
            .getBucketId(f.path.split('/').last).exists(b => b >= 0 && b < 4)
      }, m.files.map(_.path).take(3).toString)
      val before = SnapshotStore.read(spark, root).get.count()
      assert(before == orders.count())
      // partition-scoped rewrite: touched partitions re-bucket, the
      // carried files keep their suffixes, the whole table still reads
      val one = orders.limit(1)
      SnapshotStore.merge(spark, root,
        one.withColumn("o_totalprice", col("o_totalprice") + 1),
        Seq("o_orderkey"), partitionDate = Some(col("d")))
      assert(SnapshotStore.liveBuckets(root) == bk)
      val after = SnapshotStore.read(spark, root).get
      assert(after.count() == before)
      val m2 = Manifest.read(java.nio.file.Paths.get(root,
        SnapshotStore.currentSnapshot(root).get)).get
      assert(m2.files.forall { f =>
        org.apache.spark.sql.execution.datasources.BucketingUtils
          .getBucketId(f.path.split('/').last).isDefined
      })
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  test("d15-shaped state join: bucketed LSH state never shuffles — only the " +
      "arriving batch exchanges") {
    // d15's scale claim, plan-pinned: the corpus-sized bucket state
    // persists bucketed on the full (band, bucket) join key
    // (co-partitioning requires ALL cluster keys by default) — the state
    // scan sits under the join with NO exchange, the (small) batch side
    // re-partitions to match. At 10^10 docs that is the difference
    // between re-shuffling 160 GB of state per arrival batch and
    // shuffling just the batch.
    import graft.incremental.{Manifest, SnapshotStore}
    val root = java.nio.file.Files.createTempDirectory("graft-d15bucket").toString
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      val n = 2000L
      val state = spark.range(n).toDF("doc_id")
        .select(col("doc_id"), explode(sequence(lit(0), lit(3))).as("band"))
        .withColumn("bucket", xxhash64(col("doc_id") % 40, col("band")))
      SnapshotStore.merge(spark, root, state, Seq("doc_id", "band"),
        bucketBy = Some(Manifest.Buckets(8, Seq("band", "bucket"),
          Seq("band", "bucket"))))
      val stateT = SnapshotStore.read(spark, root).get
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val batch = spark.range(n, n + 100).toDF("doc_id")
        .select(col("doc_id"), explode(sequence(lit(0), lit(3))).as("band"))
        .withColumn("bucket", xxhash64(col("doc_id") % 40, col("band")))
      val cand = stateT.as("x").join(batch.as("y"),
          col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket"))
        .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      val p = cand.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p.take(800))
      val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
      assert(exchanges == 1,
        s"only the batch side may shuffle, found $exchanges exchanges:\n${p.take(2000)}")
      // the state branch is Sort-over-FileScan with no exchange between
      val stateBranch = p.substring(p.indexOf("SortMergeJoin"))
        .linesIterator.takeWhile(!_.contains("Exchange hashpartitioning"))
        .mkString("\n")
      assert(stateBranch.contains("FileScan parquet"),
        s"state scan must sit under the join with no exchange:\n$stateBranch")
      assert(cand.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }
}
