package graft.functions

import graft.SparkSpec
import graft.queries.PipelineQueries
import org.apache.spark.sql.functions._

/** The typed Aggregator path must reproduce the window-based cosine
  * top-k (v1) exactly — same pairs, same order — proving the bounded
  * O(k) buffer is a drop-in for the ranking window. */
class TopKAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("groupByKey + TopKAggregator ≡ window-based v1_cosine_topk") {
    val dir = "/root/testdata/sf0.001"
    val viaWindow = PipelineQueries.v1CosineTopk(spark, dir)
      .select("q_id", "rk", "vec_id", "cos_e6")
      .as[(Long, Int, Long, Long)].collect().toSeq

    GraftFunctions.ensureRegistered(spark)
    val e = graft.Sources.testdata(spark, dir)("embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("nrm", expr("sqrt(vector_dot(v, v))"))
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"),
        col("vec_id"),
        floor((expr("vector_dot(v, qv)") / (col("nrm") * col("qn"))) * lit(1e6)
          + lit(0.5)).as("cos_e6"))
      .as[(Long, Long, Long)]
    val topk = new TopKAggregator(10).toColumn
    val viaAgg = scored
      .groupByKey(_._1)
      // e6 longs ride the Double score slot exactly (|cos_e6| < 2^53)
      .mapValues { case (_, id, cos) => (id, cos.toDouble) }
      .agg(topk.name("topk"))
      .flatMap { case (qId, hits) =>
        hits.zipWithIndex.map { case ((id, cos), i) => (qId, i + 1, id, cos.toLong) }
      }
      .collect().toSeq.sortBy(r => (r._1, r._2))

    assert(viaAgg == viaWindow.sortBy(r => (r._1, r._2)))
  }
}
