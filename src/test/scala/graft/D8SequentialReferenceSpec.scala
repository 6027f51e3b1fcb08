package graft

import graft.queries.PipelineQueries
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** d8's semantics against a sequential reference, under varied shuffle
  * partitioning: mark every [[PipelineQueries.DupSpanGram]]-gram start
  * occurring ≥ 2 times corpus-wide, union the per-doc intervals with a
  * sorted sweep. The DuckDB oracle pins the values at the driver tiers;
  * this pins the SEMANTICS on adversarial seeded corpora (shared phrases
  * across docs, self-repeats within a doc, overlap chains) and that the
  * result is identical under 1 / 7 / 32 shuffle partitions — the window
  * is per-doc, so no partition boundary may show through. */
class D8SequentialReferenceSpec extends SparkSpec {

  private val G = PipelineQueries.DupSpanGram

  // corpora built from a small phrase pool so cross-doc and within-doc
  // G-gram repeats (and overlapping marked spans) occur at every draw
  private val phrases: Vector[Vector[String]] = Vector(
    "a b c d e f g h i j".split(' ').toVector,
    "k l m n o p q r s t".split(' ').toVector,
    "u v w x y z aa bb cc dd".split(' ').toVector)
  private val corpus: Gen[List[(Long, Vector[String])]] = Gen.nonEmptyListOf(for {
    id <- Gen.choose(0L, 60L)
    k <- Gen.choose(1, 3)
    ps <- Gen.listOfN(k, Gen.choose(0, phrases.size - 1))
    extra <- Gen.listOf(Gen.oneOf("x1", "x2", "x3", "x4", "x5", "x6", "x7", "x8"))
  } yield (id, ps.flatMap(phrases).toVector ++ extra.toVector))
    .map(_.groupMapReduce(_._1)(identity)((a, _) => a).values.toList)

  private def reference(docs: Seq[(Long, Vector[String])]): Map[Long, (Long, Long, Long, Long)] = {
    val grams = docs.flatMap { case (id, w) =>
      if (w.size < G) Nil
      else (0 to w.size - G).map(i => (id, i, w.slice(i, i + G).mkString(" ")))
    }
    val occ = grams.groupBy(_._3).filter(_._2.size >= 2).keySet
    grams.filter(g => occ(g._3)).groupBy(_._1).map { case (id, ms) =>
      val starts = ms.map(_._2).sorted
      var prevEnd = 0L; var spans = 0L; var covered = 0L
      starts.foreach { i =>
        val c = (i + G) - math.max(i, prevEnd)
        if (c == G) spans += 1
        covered += c
        prevEnd = math.max(prevEnd, i + G)
      }
      val nWords = docs.find(_._1 == id).get._2.size.toLong
      id -> (nWords - G + 1, starts.size.toLong, spans, covered)
    }
  }

  test("d8 ≡ sequential sweep, identical under 1 / 7 / 32 shuffle partitions (5 seeded cases)") {
    val schema = new StructType()
      .add("doc_id", "long").add("text", "string")
      .add("lang", "string").add("source", "string").add("n_chars", "long")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try (1 to 5).foreach { i =>
      val docs = corpus(Gen.Parameters.default, Seed(800L + i)).get
      val tmp = java.nio.file.Files.createTempDirectory("graft-d8-prop").toString
      val rows = docs.map { case (id, w) =>
        Row(id, w.mkString(" "), "en", "s0", w.mkString(" ").length.toLong)
      }
      spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val expected = reference(docs)
      assert(expected.nonEmpty, s"case $i drew a corpus with no repeats — not an interesting case")
      for (parts <- Seq("1", "7", "32")) {
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        val got = PipelineQueries.d8SubstringDedup(spark, tmp).collect()
          .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
          .toMap
        assert(got == expected,
          s"case $i, $parts partitions: marked spans diverged from the sequential sweep")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("d16 cut text ≡ sequential reference (kept words at uncovered positions), partition-invariant") {
    val schema = new StructType()
      .add("doc_id", "long").add("text", "string")
      .add("lang", "string").add("source", "string").add("n_chars", "long")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try (1 to 5).foreach { i =>
      val docs = corpus(Gen.Parameters.default, Seed(900L + i)).get
      val tmp = java.nio.file.Files.createTempDirectory("graft-d16-prop").toString
      val rows = docs.map { case (id, w) =>
        Row(id, w.mkString(" "), "en", "s0", w.mkString(" ").length.toLong)
      }
      spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      // sequential cut: covered = union of [i, i+G) over repeated-gram starts
      val grams = docs.flatMap { case (id, w) =>
        if (w.size < G) Nil
        else (0 to w.size - G).map(j => (id, j, w.slice(j, j + G).mkString(" ")))
      }
      val occ = grams.groupBy(_._3).filter(_._2.size >= 2).keySet
      val coveredBy = grams.filter(g => occ(g._3))
        .groupBy(_._1)
        .map { case (id, ms) => id -> ms.flatMap(m => m._2 until m._2 + G).toSet }
      val expected = docs.map { case (id, w) =>
        val cov = coveredBy.getOrElse(id, Set.empty[Int])
        val keptW = w.zipWithIndex.filter { case (_, p) => !cov(p) }.map(_._1)
        id -> (w.size.toLong, keptW.size.toLong,
          (w.size - keptW.size).toLong, md5hex(keptW.mkString(" ")))
      }.toMap
      assert(expected.values.exists(_._3 > 0), s"case $i drew a corpus with no cuts")
      for (parts <- Seq("1", "7", "32")) {
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        val got = PipelineQueries.d16SubstringCut(spark, tmp).collect()
          .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
          .toMap
        assert(got == expected,
          s"case $i, $parts partitions: cut text diverged from the sequential reference")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("d17: a later arrival RETROACTIVELY re-cuts an earlier doc (the non-monotone case)") {
    // three docs = three single-doc batches (tercile split of ids 0/1/2):
    // doc 0 and doc 2 share an 8-gram, doc 1 is unrelated. When doc 0
    // arrives its gram count is 1 — nothing to cut. Doc 2's arrival in
    // the LAST batch completes the repeat; d17 must re-open doc 0's
    // report and cut it, converging to d16's one-shot answer.
    val schema = new StructType()
      .add("doc_id", "long").add("text", "string")
      .add("lang", "string").add("source", "string").add("n_chars", "long")
    val shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    val d0 = shared + " tail0 tail1"
    val d1 = "u1 u2 u3 u4 u5 u6 u7 u8 u9"
    val d2 = "head0 " + shared
    val rows = Seq(
      Row(0L, d0, "en", "s0", d0.length.toLong),
      Row(1L, d1, "en", "s0", d1.length.toLong),
      Row(2L, d2, "en", "s0", d2.length.toLong))
    val tmp = java.nio.file.Files.createTempDirectory("graft-d17-retro").toString
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val inc = PipelineQueries.d17IncrementalCut(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getString(4))).toMap
    val oneShot = PipelineQueries.d16SubstringCut(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(inc == oneShot, s"incremental $inc != one-shot $oneShot")
    // and the retroactive cut actually happened: doc 0 lost the 8 shared
    // words it carried cut-free through the first two batches
    assert(inc(0L)._2 == 8L, s"doc 0 must be retroactively cut: ${inc(0L)}")
    assert(inc(1L)._2 == 0L)
    assert(inc(2L)._2 == 8L)
  }

  test("d16: a FULLY-covered doc reports kept=0 / md5(''), an untouched doc its full canonical text") {
    val schema = new StructType()
      .add("doc_id", "long").add("text", "string")
      .add("lang", "string").add("source", "string").add("n_chars", "long")
    val dup = "a b c d e f g h" // exactly G words, repeated verbatim in two docs
    val uniq = "q w e r t y u i o p z x" // no repeated 8-gram anywhere
    val rows = Seq(
      Row(0L, dup, "en", "s0", dup.length.toLong),
      Row(1L, dup, "en", "s0", dup.length.toLong),
      Row(2L, uniq, "en", "s0", uniq.length.toLong))
    val tmp = java.nio.file.Files.createTempDirectory("graft-d16-full").toString
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = PipelineQueries.d16SubstringCut(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(got(0L) == ((0L, 8L, md5hex(""))), s"doc 0: ${got(0L)}")
    assert(got(1L) == ((0L, 8L, md5hex(""))), s"doc 1: ${got(1L)}")
    assert(got(2L) == ((12L, 0L, md5hex(uniq))), s"doc 2: ${got(2L)}")
  }
}
