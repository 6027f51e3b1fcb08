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
      .select("q_id", "rk", "vec_id", "cosine")
      .as[(Long, Int, Long, Double)].collect().toSeq

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
        round(expr("vector_dot(v, qv)") / (col("nrm") * col("qn")), 6).as("cosine"))
      .as[(Long, Long, Double)]
    val topk = new TopKAggregator(10).toColumn
    val viaAgg = scored
      .groupByKey(_._1)
      .mapValues { case (_, id, cos) => (id, cos) }
      .agg(topk.name("topk"))
      .flatMap { case (qId, hits) =>
        hits.zipWithIndex.map { case ((id, cos), i) => (qId, i + 1, id, cos) }
      }
      .collect().toSeq.sortBy(r => (r._1, r._2))

    assert(viaAgg == viaWindow.sortBy(r => (r._1, r._2)))
  }
}
