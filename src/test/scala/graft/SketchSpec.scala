package graft

import graft.queries.RelationalQueries
import org.apache.spark.sql.functions._

/** Gates for the sketch layer (k1) — the properties an approximate
  * operator must hold since no DuckDB oracle can reproduce sketch
  * internals: bounded error against the exact answer, and the merge
  * identity that makes sketches usable at scale (partial sketches union
  * into exactly the sketch of the union). */
class SketchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("k1: HLL estimates within 5% of exact; approx median within 2% of exact") {
    val rows = RelationalQueries.k1Sketches(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      assert(math.abs(est - exact).toDouble / exact < 0.05,
        s"${r.getString(0)}: hll $est vs exact $exact")
      val (p50e, p50a) = (r.getDouble(3), r.getDouble(4))
      assert(math.abs(p50a - p50e) <= 0.02 * math.max(1.0, math.abs(p50e)),
        s"${r.getString(0)}: approx p50 $p50a vs exact $p50e")
    }
  }

  test("k1: per-partition HLL sketches union into exactly the global estimate") {
    val ev = Sources.testdata(spark, dir)("events")
    val direct = ev
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 14))")).head.getLong(0)
    val merged = ev
      .withColumn("p", spark_partition_id())
      .groupBy(col("p")).agg(expr("hll_sketch_agg(user_id, 14)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))")).head.getLong(0)
    assert(direct == merged, s"direct=$direct merged=$merged")
    // and the estimate is itself deterministic across re-plans
    val again = ev.repartition(7)
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 14))")).head.getLong(0)
    assert(direct == again)
  }
}
