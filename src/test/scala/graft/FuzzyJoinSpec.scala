package graft

import org.apache.spark.sql.functions._
import graft.queries.PipelineQueries

/** d14 fuzzy record-linkage join: the SymSpell deletion-neighborhood
  * block must be exactly as complete as an all-pairs Levenshtein ≤ 1
  * scan — recall is structural (any true pair shares a neighborhood
  * member), precision comes from the fused thresholded verify. */
class FuzzyJoinSpec extends SparkSpec {

  private def run(dir: String) =
    PipelineQueries.d14FuzzyJoin(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("d14: each edit kind links; a shared deletion alone does not") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-fuzzy").toString
    // 1/2 identical; 3 deletes a char; 4 substitutes one; 5/6 are the
    // classic distance-2 pair that still SHARES a deletion member ("bc")
    // — the verify must drop it; 7 is far from everything
    Seq(1L -> "order", 2L -> "order", 3L -> "ordr", 4L -> "ordxr",
        5L -> "abc", 6L -> "bcd", 7L -> "zzzzz")
      .toDF("c_custkey", "c_name")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    assert(run(dir) === Set(
      (1L, 2L, 0L), (1L, 3L, 1L), (1L, 4L, 1L),
      (2L, 3L, 1L), (2L, 4L, 1L), (3L, 4L, 1L)))
  }

  test("d14: blocking is complete — identical to all-pairs brute force") {
    val dir = "/root/testdata/sf0.001"
    val cust = Sources.testdata(spark, dir)("customer")
      .select(col("c_custkey").as("id"), col("c_name").as("name"))
    val brute = cust.as("a").join(cust.as("b"), col("a.id") < col("b.id"))
      .withColumn("dist", levenshtein(col("a.name"), col("b.name")))
      .filter(col("dist") <= 1)
      .select(col("a.id"), col("b.id"), col("dist").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(brute.nonEmpty, "fixture must exercise the operator")
    assert(run(dir) === brute)
  }
}
