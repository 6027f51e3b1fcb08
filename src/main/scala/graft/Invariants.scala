package graft

import graft.queries.{CorpusPrep, PipelineQueries}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Tier-agnostic invariant gate for the operators whose DuckDB oracles
  * embed the all-pairs join (d6, pipe_corpus_prep) and are therefore
  * infeasible past sf0.01: checks the structural properties that define
  * them against independently-computed stage outputs at ANY scale.
  * Prints one OK/FAIL line per property; exits 1 on any failure.
  * Usage: Invariants [sfDir]
  */
object Invariants {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var failures = 0
    def check(name: String)(cond: => Boolean): Unit = {
      val ok = try cond catch { case e: Throwable =>
        System.err.println(s"  [$name] threw: ${e.getMessage}"); false }
      println(f"  $name%-52s ${if (ok) "OK" else "FAIL"}")
      if (!ok) failures += 1
    }

    // ---- d6: cluster assignment vs the pair graph ----
    val pairs = PipelineQueries.d2MinhashLsh(spark, sfDir)
      .select(col("a_id"), col("b_id")).collect().map(r => (r.getLong(0), r.getLong(1)))
    val lab = PipelineQueries.d6DedupClusters(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val members = lab.groupBy(_._2._1)
    check("d6: every pair's endpoints share a cluster") {
      pairs.forall { case (a, b) => lab(a)._1 == lab(b)._1 }
    }
    check("d6: canonical is the min member and a member itself") {
      members.forall { case (c, m) => m.keys.min == c && m.contains(c) }
    }
    check("d6: cluster_size equals the member count") {
      members.forall { case (_, m) => m.values.map(_._2).toSet == Set(m.size.toLong) }
    }

    // ---- pipe: composition vs standalone stages ----
    val out = CorpusPrep.pipeCorpusPrep(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3), r.getLong(4)))
    val survivors = out.map(_._1).distinct.toSet
    val nonCanonical = lab.filter { case (d, (c, _)) => d != c }.keySet
    val contaminated = PipelineQueries.t8Decontaminate(spark, sfDir).collect()
      .map(_.getLong(0)).toSet
    check("pipe: emits at least one chunk")(out.nonEmpty)
    check("pipe: no dedup loser is chunked")(survivors.intersect(nonCanonical).isEmpty)
    check("pipe: no contaminated doc is chunked")(survivors.intersect(contaminated).isEmpty)
    check("pipe: no eval-slice doc is chunked") {
      survivors.forall(_ % PipelineQueries.DecontMod != 0)
    }
    check("pipe: chunk digests equal the standalone chunker's") {
      val t5 = PipelineQueries.t5Chunk(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getInt(1)) -> r.getString(3)).toMap
      out.forall { case (doc, idx, _, md5v, _) => t5((doc, idx)) == md5v }
    }
    check("pipe: shard ids advance by at most one per chunk") {
      val shards = out.sortBy(c => (c._1, c._2)).map(_._5)
      shards.zip(shards.tail).forall { case (a, b) => b == a || b == a + 1 }
    }
    check("pipe: no shard but the last exceeds budget + one chunk") {
      out.groupBy(_._5).view.mapValues(_.map(_._3.toLong).sum)
        .toSeq.sortBy(_._1).dropRight(1)
        .forall(_._2 <= PipelineQueries.ShardBudget + PipelineQueries.ChunkSize)
    }

    println(s"${if (failures == 0) "PASS" else "FAIL"} ($failures failures) at $sfDir")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
