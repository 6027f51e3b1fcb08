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

  private def runK2(dir: String) =
    PipelineQueries.d14bFuzzyJoinK2(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet

  test("d14b: every ≤2-edit composition links; far strings sharing 2-deletion members do not") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-fuzzy2").toString
    // vs "linker": 2 dup ids; one sub (1); two subs (2); del+sub (2);
    // two inserts (2); transposition = two subs (2); and "nkerzz" — a
    // DISTANCE-4 string that still shares the 2-deletion member "nker"
    // with "linker" (both delete 2), so blocking surfaces it and the
    // verify must drop it; plus an unrelated far string. Group sizes
    // feed n_id_pairs.
    Seq(1L -> "linker", 2L -> "linker", 3L -> "lirker", 4L -> "lixkey",
        5L -> "likkr", 6L -> "linkers!", 7L -> "linkre",
        8L -> "nkerzz", 9L -> "qqqqqq")
      .toDF("c_custkey", "c_name")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val got = runK2(dir)
    // brute-force twin over distinct names (the oracle's shape, in Spark)
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey").as("id"), col("c_name").as("name"))
    val g = cust.groupBy(col("name"))
      .agg(min(col("id")).as("rid"), count(lit(1)).as("n"))
    val brute = g.as("a").join(g.as("b"), col("a.rid") < col("b.rid"))
      .withColumn("dist", levenshtein(col("a.name"), col("b.name")))
      .filter(col("dist") <= 2)
      .select(col("a.rid"), col("b.rid"), col("dist").cast("long"),
        col("a.n"), col("b.n"), (col("a.n") * col("b.n")).as("nip"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(got === brute)
    // non-vacuity: the planted set must exercise link + reject cases
    assert(got.exists(_._3 == 1L) && got.exists(_._3 == 2L))
    assert(!got.exists(p => p._1 == 1L && p._2 == 8L),
      "distance-4 pair sharing a 2-deletion member must be verified away")
    assert(got.exists(p => p._1 == 1L && p._6 == 2L),
      "group size 2 must flow into n_id_pairs")
  }

  test("d14b: blocking is complete at lev ≤ 2 — identical to all-pairs brute force over distinct names") {
    val dir = "/root/testdata/sf0.001"
    val cust = Sources.testdata(spark, dir)("customer")
      .select(col("c_custkey").as("id"), col("c_name").as("name"))
    val g = cust.groupBy(col("name"))
      .agg(min(col("id")).as("rid"), count(lit(1)).as("n"))
    val brute = g.as("a").join(g.as("b"), col("a.rid") < col("b.rid"))
      .withColumn("dist", levenshtein(col("a.name"), col("b.name")))
      .filter(col("dist") <= 2)
      .select(col("a.rid"), col("b.rid"), col("dist").cast("long"),
        col("a.n"), col("b.n"), (col("a.n") * col("b.n")).as("nip"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(brute.exists(_._3 == 2L), "fixture must contain distance-2 pairs")
    assert(runK2(dir) === brute)
  }

  test("d14b: member-sharing property — any lev ≤ 2 pair of prefix-bounded strings shares a ≤2-deletion member") {
    // the structural-recall claim, checked directly on adversarial short
    // strings (repeats, transposition-like shapes, boundary deletes)
    def dels(s: String): Set[String] = {
      val one = (0 until s.length).map(i => s.take(i) + s.drop(i + 1))
      (Set(s) ++ one ++ one.flatMap(t =>
        (0 until t.length).map(i => t.take(i) + t.drop(i + 1)))).toSet
    }
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val words = Seq("abcde", "abde", "abd", "aacde", "xbcde", "abcdezz",
      "aaaaa", "aaaba", "bacde", "abdce", "ab", "a", "", "abcba", "zbcbz")
    for (a <- words; b <- words if a != b && lev(a, b) <= 2)
      assert((dels(a) & dels(b)).nonEmpty,
        s"lev(${a}, ${b}) = ${lev(a, b)} but neighborhoods are disjoint")
  }

  private def runExpand(dir: String) =
    PipelineQueries.d14cFuzzyExpand(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("d14c: capped id expansion — cap bites on replicated groups, channels are disjoint") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-fuzzy3").toString
    // "linker" ×5 (group OVER the cap of 3), "lirker" ×2 (under), one
    // far string. Cross pairs expand capped(3) × capped(2); same-name
    // pairs only among each group's capped members.
    Seq(1L -> "linker", 2L -> "linker", 3L -> "linker", 4L -> "linker",
        5L -> "linker", 6L -> "lirker", 7L -> "lirker", 8L -> "qqqqqq")
      .toDF("c_custkey", "c_name")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val expected =
      // same-name, capped to ids {1,2,3} and {6,7}
      Set((1L, 2L, 0L), (1L, 3L, 0L), (2L, 3L, 0L), (6L, 7L, 0L)) ++
      // cross linker×lirker (dist 1): {1,2,3} × {6,7}
      (for (a <- Seq(1L, 2L, 3L); b <- Seq(6L, 7L)) yield (a, b, 1L)).toSet
    assert(runExpand(dir) === expected)
    // the cap genuinely bit: ids 4/5 appear nowhere
    assert(!runExpand(dir).exists(p => p._1 >= 4L && p._1 <= 5L))
  }

  test("d14c: expansion matches brute-force capped expansion on real data") {
    val dir = "/root/testdata/sf0.001"
    val cust = Sources.testdata(spark, dir)("customer")
      .select(col("c_custkey").as("id"), col("c_name").as("name"))
    val capped = cust
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("name")).orderBy(col("id"))))
      .filter(col("rn") <= PipelineQueries.D14cCap)
      .select(col("name"), col("id"))
    val brute = capped.as("a").join(capped.as("b"), col("a.id") < col("b.id"))
      .withColumn("dist", levenshtein(col("a.name"), col("b.name")))
      .filter(col("dist") <= 2)
      .select(col("a.id"), col("b.id"), col("dist").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(brute.nonEmpty, "fixture must exercise the operator")
    assert(runExpand(dir) === brute)
  }
}
