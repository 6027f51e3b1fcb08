package graft

import graft.queries.PipelineQueries

/** m8's alignment semantics, pinned in isolation: the planted payload
  * identity means an INTACT caption that covers its whole document must
  * align perfectly THROUGH the binary decode + grid embedding (cosine
  * exactly 1e6) — the gate's built-in `parse ∘ plant ≡ id` proof — while
  * the planted reversed captions (doc_id % 5 = 0) must score measurably
  * below intact ones and actually fail the threshold somewhere. */
class ClipFilterSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("m8: intact full-coverage captions score exactly 1e6 through the real " +
      "decode; reversed captions score below intact on average and get dropped; " +
      "keep is the threshold predicate") {
    val nWords = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "size(split(lower(text), ' ')) AS nw").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = PipelineQueries.m8ClipFilter(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, cos, keep) = (r.getLong(0), r.getLong(3), r.getBoolean(4))
      assert(keep == (cos >= PipelineQueries.M8Threshold), s"doc $id keep flag")
      if (id % 5 != 0 && nWords(id) <= PipelineQueries.M8CaptionWords)
        assert(cos == 1000000L,
          s"doc $id: intact caption covering the whole payload must score 1e6, got $cos")
    }
    val rev = rows.filter(_.getLong(0) % 5 == 0).map(_.getLong(3))
    val fwd = rows.filter(_.getLong(0) % 5 != 0).map(_.getLong(3))
    assert(rev.nonEmpty && fwd.nonEmpty)
    assert(rev.sum / rev.length < fwd.sum / fwd.length,
      "reversed captions must score below intact ones on average")
    assert(rows.exists(r => r.getLong(0) % 5 == 0 && !r.getBoolean(4)),
      "the planted misalignment must drop at least one document")
    assert(rows.exists(r => r.getLong(0) % 5 != 0 && r.getBoolean(4)),
      "intact pairs must survive the threshold somewhere")
  }
}
