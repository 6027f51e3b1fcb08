package graft

import graft.queries.PipelineQueries
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test of the two-level distributed prefix sum
  * ([[PipelineQueries.distributedCumsum]]): for ANY sparse set of
  * doc_ids with arbitrary non-negative token counts — including ids that
  * straddle, fill, or skip whole [[PipelineQueries.PackBlock]] blocks —
  * the blocked cumulative sum equals the sequential scan. Draws are
  * seeded: adversarial shapes, deterministic in CI. */
class CumsumPropertySpec extends SparkSpec {
  import spark.implicits._

  // sparse ids up to several blocks wide; token counts incl. zero
  private val rows: Gen[List[(Long, Long)]] = Gen.nonEmptyListOf(for {
    id <- Gen.choose(0L, PipelineQueries.PackBlock * 5)
    tok <- Gen.choose(0L, 500L)
  } yield (id, tok)).map(_.groupMapReduce(_._1)(_._2)((a, _) => a).toList)

  test("two-level cumsum ≡ sequential scan over sparse ids (8 seeded cases)") {
    (1 to 8).foreach { i =>
      val data = rows(Gen.Parameters.default, Seed(4100L + i)).get.sortBy(_._1)
      val df = data.toDF("doc_id", "tokens")
      val got = PipelineQueries
        .distributedCumsum(df, "tokens", Seq(col("doc_id")))
        .select(col("doc_id"), col("cum_tokens"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      var run = 0L
      data.foreach { case (id, tok) =>
        run += tok
        assert(got(id) == run, s"case $i: id $id expected $run got ${got(id)}")
      }
    }
  }

  test("hash-block cumsum (t31's blkExpr) ≡ sequential scan in hash order, " +
      "for any partition count") {
    // ids scattered, positions = salted 60-bit hashes (t31's discipline):
    // the block axis is pos div 2^50, NOT doc_id ranges — the cumsum must
    // follow the (pos, doc_id) total order exactly, at any parallelism
    val data = (1 to 400).map(i => (i * 37L % 1009L, (i % 7L) + 1L)).distinct
    val df = data.toDF("doc_id", "tokens")
      .withColumn("pos", expr(
        "cast(conv(substring(md5(concat('t31:', cast(doc_id as string))),1,15),16,10) as bigint)"))
    for (parts <- Seq(1, 3, 32)) {
      val got = PipelineQueries
        .distributedCumsum(df.repartition(parts), "tokens",
          Seq(col("pos"), col("doc_id")),
          blkExpr = s"pos div ${PipelineQueries.T31PosBlock}")
        .select(col("doc_id"), col("pos"), col("cum_tokens"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // sequential reference in (pos, doc_id) order
      val seq = got.sortBy(t => (t._2, t._1))
      var run = 0L
      val tok = data.toMap
      seq.foreach { case (id, _, cum) =>
        run += tok(id)
        assert(cum == run, s"parts=$parts: id $id expected $run got $cum")
      }
    }
  }
}
