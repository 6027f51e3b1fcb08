package graft

import graft.queries.PipelineQueries

/** v19 binary-quantized Hamming retrieval: the two-word sign-bit codes,
  * the Hamming shortlist, and the exact-cosine rerank are recomputed
  * brute-force in Scala on sf0.001 and compared row-for-row. */
class BinaryAnnSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("v19 equals the brute-force two-stage reference (codes, Hamming top-16, cosine top-5)") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) AS v")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)

    def code(v: Array[Double], lo: Int): Long =
      (0 until 32).map(j => if (v(j + lo) > 0d) 1L << j else 0L).sum
    val codes = vecs.map { case (id, v) => id -> (code(v, 0), code(v, 32)) }.toMap
    def ham(a: (Long, Long), b: (Long, Long)): Long =
      (java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)).toLong
    def cosE6(a: Array[Double], b: Array[Double]): Long = {
      val dot = a.indices.map(i => a(i) * b(i)).sum
      val na = math.sqrt(a.map(x => x * x).sum); val nb = math.sqrt(b.map(x => x * x).sum)
      math.floor(dot / (na * nb) * 1e6 + 0.5).toLong
    }

    val expected = vecs.filter(_._1 < 5).flatMap { case (qId, qv) =>
      val shortlist = vecs.filter(_._1 != qId)
        .map { case (id, _) => (id, ham(codes(id), codes(qId))) }
        .sortBy { case (id, h) => (h, id) }.take(PipelineQueries.BinShortlist)
      shortlist
        .map { case (id, h) => (id, h, cosE6(vecs(id.toInt)._2, qv)) }
        .sortBy { case (id, _, c) => (-c, id) }.take(PipelineQueries.BinK)
        .zipWithIndex
        .map { case ((id, h, c), i) => (qId, (i + 1).toLong, id, h, c) }
    }.toSeq

    val got = PipelineQueries.v19BinaryAnn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == expected)
  }

  test("v30 equals the brute-force trained-SQ reference " +
      "(per-dim bounds, 8-bit codes, integer ADC top-20, cosine top-10)") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) AS v")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    val dim = PipelineQueries.SqDim
    val us = vecs.map { case (id, v) =>
      id -> v.map(x => math.floor(x * 1e4 + 0.5).toLong) }
    val mn = (0 until dim).map(d => us.map(_._2(d)).min).toArray
    val mx = (0 until dim).map(d => us.map(_._2(d)).max).toArray
    def r510(u: Array[Long]): Array[Long] =
      (0 until dim).map { d =>
        val span = mx(d) - mn(d)
        val c = ((u(d) - mn(d)) * 255L) / math.max(span, 1L)
        510L * mn(d) + (2L * c + 1L) * span
      }.toArray
    val recon = us.map { case (id, u) => id -> r510(u) }.toMap
    def adc(qu: Array[Long], r: Array[Long]): Long =
      (0 until dim).map { d =>
        val diff = 510L * qu(d) - r(d); diff * diff }.sum
    def cosE6(a: Array[Double], b: Array[Double]): Long = {
      val dot = a.indices.map(i => a(i) * b(i)).sum
      val na = math.sqrt(a.map(x => x * x).sum); val nb = math.sqrt(b.map(x => x * x).sum)
      math.floor(dot / (na * nb) * 1e6 + 0.5).toLong
    }
    val byId = vecs.toMap
    val expected = us.filter(_._1 < 5).flatMap { case (qId, qu) =>
      val shortlist = us.filter(_._1 != qId)
        .map { case (id, _) => (id, adc(qu, recon(id))) }
        .sortBy { case (id, a) => (a, id) }.take(PipelineQueries.SqShortlist)
      shortlist
        .map { case (id, a) => (id, a, cosE6(byId(id), byId(qId))) }
        .sortBy { case (id, _, c) => (-c, id) }.take(PipelineQueries.SqK)
        .zipWithIndex
        .map { case ((id, a, c), i) => (qId, (i + 1).toLong, id, a, c) }
    }.toSeq
    val got = PipelineQueries.v30TrainedSq(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == expected)
  }
}
