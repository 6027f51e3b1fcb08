package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test of v8's fixed-point BM25 arithmetic: the Long-typed SQL
  * expressions the query evaluates (`div` truncation and all) must equal
  * an arbitrary-precision BigInt reference everywhere inside the
  * documented overflow envelope (tf·T < 2e11, N < 4e9). A Long overflow
  * anywhere in idf6/tfn6/contrib6 would wrap and diverge from BigInt, so
  * agreement on adversarial draws at the envelope edge is an overflow
  * proof as well as a semantics pin. */
class Bm25FixedPointSpec extends SparkSpec {
  import spark.implicits._

  private val S = 1000000L

  // draws pushed to the envelope edge: N to 1e7 docs, avg dl to 20,
  // tf to 1000 => tf·T <= 2e11 and the tfn6 numerator 44·tf·T·1e6 sits
  // just under 2^63
  private val cases: Gen[(Long, Long, Long, Long, Long)] = for {
    n  <- Gen.choose(1L, 10000000L)
    t  <- Gen.choose(n, n * 20L)
    df <- Gen.choose(1L, n)
    dl <- Gen.choose(1L, 5000L)
    tf <- Gen.choose(1L, math.min(dl, 1000L))
  } yield (n, t, df, dl, tf)

  private def reference(n: BigInt, t: BigInt, df: BigInt, dl: BigInt, tf: BigInt): (Long, Long, Long) = {
    val idf6 = (2 * n - 2 * df + 1) * S / (2 * df + 1)
    val tfn6 = 44 * tf * t * S / (20 * tf * t + 6 * t + 18 * dl * n)
    val contrib6 = idf6 * tfn6 / S
    (idf6.toLong, tfn6.toLong, contrib6.toLong)
  }

  test("v8's Long div arithmetic ≡ BigInt reference across the envelope (40 seeded cases)") {
    val data = (1 to 40).map(i => cases(Gen.Parameters.default, Seed(2500L + i)).get)
    val got = data.toDF("n_docs", "t_tokens", "df", "dl", "tf")
      .selectExpr(
        // the exact expressions v8Bm25 evaluates
        s"((2 * n_docs - 2 * df + 1) * ${S}L) div (2 * df + 1) as idf6",
        s"(44 * tf * t_tokens * ${S}L) div (20 * tf * t_tokens + 6 * t_tokens + 18 * dl * n_docs) as tfn6")
      .selectExpr("idf6", "tfn6", s"(idf6 * tfn6) div ${S}L as contrib6")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    data.zip(got).zipWithIndex.foreach { case (((n, t, df, dl, tf), g), i) =>
      val exp = reference(n, t, df, dl, tf)
      assert(g == exp, s"case $i (n=$n t=$t df=$df dl=$dl tf=$tf): got $g expected $exp")
    }
  }
}
