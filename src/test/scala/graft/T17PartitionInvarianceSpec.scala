package graft

import graft.queries.PipelineQueries
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The load-bearing determinism claim of t17 (and pipe2's tercile stage):
  * the score-ordered prefix sum — and therefore every bucket — is defined
  * by the (lm_xent, doc_id) TOTAL ORDER, not by where the range-partition
  * boundaries happen to fall. Re-runs [[PipelineQueries.pplBuckets]] under
  * forced 1 / 3 / 32 range partitions on adversarial seeded draws
  * (duplicate scores, zero token counts, skewed mass) and asserts the
  * bucket assignment is identical everywhere and equals the sequential
  * scan. */
class T17PartitionInvarianceSpec extends SparkSpec {
  import spark.implicits._

  // duplicate lm_xent values on purpose: ties must resolve by doc_id alone
  private val rows: Gen[List[(Long, Long, Long)]] = Gen.nonEmptyListOf(for {
    id <- Gen.choose(0L, 400L)
    tok <- Gen.choose(0L, 300L)            // zero-token docs included
    xent <- Gen.choose(1L, 12L).map(_ * 250000L) // coarse grid => heavy ties
  } yield (id, tok, xent)).map(_.groupMapReduce(_._1)(identity)((a, _) => a).values.toList)

  private def sequential(data: Seq[(Long, Long, Long)]): Map[Long, String] = {
    val tot = data.map(_._2).sum
    var cum = 0L
    data.sortBy(d => (d._3, d._1)).map { case (id, tok, _) =>
      val before = cum; cum += tok
      id -> (if (3 * before < tot) "head"
             else if (3 * before < 2 * tot) "middle" else "tail")
    }.toMap
  }

  test("t17 buckets are identical under 1 / 3 / 32 range partitions and equal the sequential scan (6 seeded cases)") {
    (1 to 6).foreach { i =>
      val data = rows(Gen.Parameters.default, Seed(1700L + i)).get
      val df = data.toDF("doc_id", "n_tokens", "lm_xent_e6")
      val expected = sequential(data)
      for (parts <- Seq(1, 3, 32)) {
        val got = PipelineQueries.pplBuckets(df, parts)
          .select("doc_id", "ppl_bucket")
          .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
        assert(got == expected,
          s"case $i, $parts partitions: buckets diverged from the total-order scan")
      }
    }
  }
}
