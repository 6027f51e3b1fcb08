package graft.incremental

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The per-file Bloom index ([[SnapshotStore.analyzeBloom]]): the
  * point-lookup skipping layer for high-cardinality keys, where every
  * file's [min, max] covers every literal and range stats prune nothing.
  * Pins: (1) min/max alone skips ZERO files on such a key — the gap the
  * index exists for; (2) with the index, a present-key lookup returns
  * exactly the plain read's rows while skipping files; (3) an absent key
  * skips EVERY file (the no-I/O negative lookup); (4) IN-lists probe per
  * value; (5) the index survives a later merge's stats carryover for
  * untouched files. */
class BloomSkippingSpec extends SparkSpec {
  import spark.implicits._

  private def digest(i: Int): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s"doc-$i".getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("bloom index: point lookups prune files min/max cannot, losslessly") {
    val root = Files.createTempDirectory("graft-bloom").toString
    // 2 date partitions × 4 files, keys are md5 digests: every file's
    // [min, max] spans essentially the whole key space
    val rows = (0 until 400).map(i => (digest(i), s"2026-01-0${i % 2 + 1}", s"p$i"))
    val df = rows.toDF("k", "dt", "payload").repartition(4, col("k"))
    SnapshotStore.merge(spark, root, df, Seq("k"), Some(to_date(col("dt"))))
    SnapshotStore.analyze(spark, root, Seq("k"))

    val present = digest(137)
    def lookup(): (Set[String], Int, Int) = {
      val (sdf, idx) = SnapshotStore.readSkipping(spark, root).get
      val got = sdf.filter(col("k") === present)
        .select("payload").as[String].collect().toSet
      (got, idx.get.lastKept, idx.get.lastSkipped)
    }
    // (1) range stats alone: digests overlap — nothing skips
    val (got0, kept0, skipped0) = lookup()
    assert(got0 == Set("p137"))
    assert(skipped0 == 0 && kept0 == 8,
      s"overlapping digest ranges must defeat min/max skipping ($kept0/$skipped0)")

    SnapshotStore.analyzeBloom(spark, root, "k")

    // (2) present key: same rows, most files proven key-free and skipped
    val (got1, kept1, skipped1) = lookup()
    assert(got1 == Set("p137"))
    assert(skipped1 > 0, "the bloom index must prune key-free files")
    assert(kept1 < 8, s"expected < 8 files kept, got $kept1")

    // (3) absent key: every file proves absence — zero files read
    val (sdf, idx) = SnapshotStore.readSkipping(spark, root).get
    assert(sdf.filter(col("k") === digest(99999)).count() == 0)
    assert(idx.get.lastKept == 0,
      s"an absent key must skip every file, kept ${idx.get.lastKept}")

    // (4) IN-list: probes per value; both rows found
    val wanted = Seq(digest(5), digest(390))
    val inGot = SnapshotStore.readSkipping(spark, root).get._1
      .filter(col("k").isin(wanted: _*)).select("payload").as[String].collect().toSet
    assert(inGot == Set("p5", "p390"))

    // (5) a later merge touching ONE partition carries the other
    // partition's stats (bloom included) through the manifest; lookups
    // on carried files still prune
    SnapshotStore.merge(spark, root,
      Seq((digest(10001), "2026-01-02", "new")).toDF("k", "dt", "payload"),
      Seq("k"), Some(to_date(col("dt"))))
    val (sdf2, idx2) = SnapshotStore.readSkipping(spark, root).get
    assert(sdf2.filter(col("k") === present).select("payload")
      .as[String].collect().toSet == Set("p137"))
    assert(idx2.get.lastSkipped > 0,
      "carried files must keep their bloom stats after an unrelated merge")
  }

  test("analyzeBloom never fabricates a null count: IS NULL after indexing " +
      "a stats-less column keeps every row") {
    val root = Files.createTempDirectory("graft-bloom-isnull").toString
    // `extra` is null for half the rows; footer stats are collected for
    // `k` ONLY, so analyzeBloom on `extra` attaches a bloom to files whose
    // stats never recorded that column. The fabricated ColStats must read
    // as "null count unknown" — an IS NULL scan afterwards may not prune.
    val rows = (0 until 200).map(i =>
      (digest(i), "2026-01-01", if (i % 2 == 0) null else s"e$i"))
    SnapshotStore.merge(spark, root,
      rows.toDF("k", "dt", "extra").repartition(4, col("k")),
      Seq("k"), Some(to_date(col("dt"))))
    SnapshotStore.analyze(spark, root, Seq("k")) // stats for k, NOT extra
    SnapshotStore.analyzeBloom(spark, root, "extra")
    val (sdf, _) = SnapshotStore.readSkipping(spark, root).get
    assert(sdf.filter(col("extra").isNull).count() == 100,
      "IS NULL over bloom-only stats must not prune rows")
    assert(sdf.filter(col("extra").isNotNull).count() == 100)
    // the bloom itself still serves point lookups on the indexed column
    val (sdf2, idx2) = SnapshotStore.readSkipping(spark, root).get
    assert(sdf2.filter(col("extra") === "e7").count() == 1)
    assert(idx2.get.lastSkipped > 0, "bloom must still prune point lookups")
  }

  test("bloom keys survive percent-encoding partition dir names") {
    val root = Files.createTempDirectory("graft-bloom-enc").toString
    // a partition VALUE with a space: Spark escapes it in the dir name and
    // input_file_name() percent-encodes the URI — a raw string relativize
    // would miss the manifest path, hand the file the empty bloom, and
    // "prove" every key absent. The lookup below must still find its row.
    val rows = (0 until 120).map(i => (digest(i), s"part ${i % 2}", s"p$i"))
    SnapshotStore.merge(spark, root,
      rows.toDF("k", "pv", "payload").repartition(3, col("k")),
      Seq("k"), Some(col("pv")))
    SnapshotStore.analyzeBloom(spark, root, "k")
    val (sdf, idx) = SnapshotStore.readSkipping(spark, root).get
    assert(sdf.filter(col("k") === digest(57)).select("payload")
      .as[String].collect().toSet == Set("p57"),
      "encoded partition dirs must not break bloom keying")
    assert(idx.get.lastSkipped > 0, "bloom should still prune other files")
    // absent key still proves absence everywhere (empty blooms are only
    // given to files the scan actually visited)
    val (sdf3, idx3) = SnapshotStore.readSkipping(spark, root).get
    assert(sdf3.filter(col("k") === digest(99999)).count() == 0)
    assert(idx3.get.lastKept == 0)
  }

  test("parseBloom rejects truncated or malformed payloads conservatively") {
    import org.json4s.jackson.JsonMethods.parse
    val good = java.util.Base64.getEncoder.encodeToString(new Array[Byte](16))
    assert(FileSkipping.parseBloom(
      parse(s"""{"m":128,"k":4,"b64":"$good"}""")).isDefined)
    // truncated bit array (8 bytes for m=128) → no bloom, keep the file
    val short = java.util.Base64.getEncoder.encodeToString(new Array[Byte](8))
    assert(FileSkipping.parseBloom(
      parse(s"""{"m":128,"k":4,"b64":"$short"}""")).isEmpty)
    // degenerate shapes
    assert(FileSkipping.parseBloom(
      parse(s"""{"m":0,"k":4,"b64":""}""")).isEmpty)
    assert(FileSkipping.parseBloom(
      parse(s"""{"m":124,"k":4,"b64":"$good"}""")).isEmpty) // m not ×8
    assert(FileSkipping.parseBloom(
      parse(s"""{"m":128,"k":0,"b64":"$good"}""")).isEmpty)
    assert(FileSkipping.parseBloom(
      parse("""{"m":128,"k":4,"b64":"%%not-base64%%"}""")).isEmpty)
  }

  test("timestamp bloom probe matches build under a non-UTC session timezone") {
    val prior = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      val root = Files.createTempDirectory("graft-bloom-tz").toString
      val rows = (0 until 96).map(i => (digest(i), 1735689600000L + i * 3600000L))
      val df = rows.toDF("k", "ms")
        .select(col("k"), (col("ms") / 1000).cast("timestamp").as("ts"))
        .repartition(3, col("k"))
      SnapshotStore.merge(spark, root, df, Seq("k"), None)
      SnapshotStore.analyzeBloom(spark, root, "ts")
      val want = new java.sql.Timestamp(1735689600000L + 37 * 3600000L)
      val (sdf, _) = SnapshotStore.readSkipping(spark, root).get
      assert(sdf.filter(col("ts") === lit(want)).count() == 1,
        "probe-side canonicalization must use the session timezone, like the build")
    } finally spark.conf.set("spark.sql.session.timeZone", prior)
  }

  test("timestamp bloom probe under a DIFFERENT session timezone than the " +
      "build uses the persisted build zone") {
    val prior = spark.conf.get("spark.sql.session.timeZone")
    val root = Files.createTempDirectory("graft-bloom-xtz").toString
    try {
      // build the index under Tokyo ...
      spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
      val rows = (0 until 96).map(i => (digest(i), 1735689600000L + i * 3600000L))
      val df = rows.toDF("k", "ms")
        .select(col("k"), (col("ms") / 1000).cast("timestamp").as("ts"))
        .repartition(3, col("k"))
      SnapshotStore.merge(spark, root, df, Seq("k"), None)
      SnapshotStore.analyzeBloom(spark, root, "ts")
      // ... probe under New York: the canonical string of the SAME instant
      // differs by zone, so without the persisted build zone the probe
      // would hash a different string and falsely prove the row absent
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val want = new java.sql.Timestamp(1735689600000L + 37 * 3600000L)
      val (sdf, _) = SnapshotStore.readSkipping(spark, root).get
      assert(sdf.filter(col("ts") === lit(want)).count() == 1,
        "cross-session probe must canonicalize with the BUILD timezone")
    } finally spark.conf.set("spark.sql.session.timeZone", prior)
  }

  test("legacy pre-sentinel index (fabricated nulls=0) no longer prunes IS NULL") {
    val root = Files.createTempDirectory("graft-bloom-legacy").toString
    val rows = (0 until 200).map(i =>
      (digest(i), "2026-01-01", if (i % 2 == 0) null else s"e$i"))
    SnapshotStore.merge(spark, root,
      rows.toDF("k", "dt", "extra").repartition(4, col("k")),
      Seq("k"), Some(to_date(col("dt"))))
    SnapshotStore.analyzeBloom(spark, root, "extra")
    // simulate the OLD analyzeBloom vintage, which fabricated nulls = 0
    // instead of the -1 sentinel for files whose footer never recorded
    // the column — rewrite the manifest in place
    val snapDir = java.nio.file.Paths.get(root,
      SnapshotStore.currentSnapshot(root).get)
    val mf = snapDir.resolve(Manifest.ManifestName)
    Files.writeString(mf,
      Files.readString(mf).replace("\"nulls\":-1", "\"nulls\":0"))
    val (sdf, _) = SnapshotStore.readSkipping(spark, root).get
    // bloom present + no min/max + nulls=0 is exactly the legacy
    // signature: IS NULL must treat it as unknown and keep every file
    assert(sdf.filter(col("extra").isNull).count() == 100,
      "legacy fabricated zero null-counts must not prune IS NULL")
    // point lookups on the legacy index still prune
    val (sdf2, idx2) = SnapshotStore.readSkipping(spark, root).get
    assert(sdf2.filter(col("extra") === "e7").count() == 1)
    assert(idx2.get.lastSkipped > 0)
  }

  test("bloom canonical/hash round-trip: probe hashing equals the build SQL's") {
    // the probe evaluates Catalyst expressions; the build side runs SQL —
    // any drift here silently turns skipping lossy, so pin the identity
    val vals = Seq("abc", "ÜTF-8 ✓", "", "0", "-17")
    val sqlH = vals.map { v =>
      spark.sql(s"SELECT xxhash64(cast('${v.replace("'", "''")}' as string)), " +
          s"xxhash64(cast('${v.replace("'", "''")}' as string), '${FileSkipping.BloomSalt}')")
        .head match { case r => (r.getLong(0), r.getLong(1)) }
    }
    val probeH = vals.map(v => (FileSkipping.bloomH1(v), FileSkipping.bloomH2(v)))
    assert(sqlH == probeH)
    // long keys canonicalize identically too
    import org.apache.spark.sql.catalyst.expressions.Literal
    assert(FileSkipping.bloomCanonical(Literal(42L)).contains("42"))
    assert(FileSkipping.bloomCanonical(Literal.create(null, org.apache.spark.sql.types.StringType)).isEmpty)
  }
}
