package graft

import org.apache.spark.sql.functions._
import graft.queries.PipelineQueries

/** m7 frame-sampled video near-dup: fixed-stride sampling must pair
  * identical and tail-edited clips (earlier frame offsets untouched),
  * while a HEAD insertion desyncs every downstream frame — the
  * documented trade-off vs m6's shift-robust CDC. The box walk, not the
  * sampler, must find the stream: a clip is parsed through real nested
  * ISO-BMFF sizes. */
class VideoFingerprintSpec extends SparkSpec {

  private val W = PipelineQueries.M7FrameW
  private val Hop = PipelineQueries.M7FrameHop

  private def run(dir: String) =
    PipelineQueries.m7VideoFingerprint(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("m7: exact and tail-edited clips pair; head-inserted clips desync; short clips carry no fingerprint") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-vfp").toString
    // long enough for several frames; words keep it shingle-friendly
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      1L -> base,                      // reference clip
      2L -> base,                      // exact duplicate → hamming 0
      3L -> (base + " tail extra"),    // tail append → shared prefix frames
      4L -> ("xx " + base),            // HEAD insertion → all frames shift
      5L -> "short")                   // < W chars → no fingerprint
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = run(dir)
    assert(pairs.contains((1L, 2L)) && pairs.contains((2L, 3L)),
      s"exact + tail-edit pairs must link: $pairs")
    assert(pairs.contains((1L, 3L)), s"tail append shares prefix frames: $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      s"head insertion must desync fixed-stride frames: $pairs")
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L),
      s"sub-window clip must carry no fingerprint: $pairs")
  }

  test("m7: frame features come from the mdat located by the BOX WALK, not a fixed offset") {
    import spark.implicits._
    // two docs whose mdat contents are IDENTICAL but whose box layouts
    // differ (doc 1: 2 traks; doc 3: 1 trak — nTraks = 1 + doc_id % 3,
    // and mvhd timescale/duration fields differ too) — the pair links
    // only if the walker hops the differently-sized moov correctly
    val dir = java.nio.file.Files.createTempDirectory("graft-vfp2").toString
    val base = (1 to 40).map(i => s"v$i").mkString(" ")
    Seq(1L -> base, 3L -> base)
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = run(dir)
    assert(pairs.contains((1L, 3L)),
      s"identical streams behind different box layouts must pair: $pairs")
  }
}
