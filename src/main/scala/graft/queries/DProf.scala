package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only piecewise profiler for the d2Pairs/connectedComponents
  * consumer cluster (k5, pipe_corpus_prep, d19, d13, d6, t21 — guide §1:
  * attribute before changing). Usage: DProf [sfDir] [reps] */
object DProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "30s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed(label: String)(f: => Unit): Double = {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      val t0 = System.nanoTime()
      f
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sqlContext.clearCache()
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => before.contains(id) }
        .values.foreach(_.unpersist(blocking = true))
      System.gc()
      println(f"[dprof] $label%-34s $sec%8.3f s")
      sec
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    try graft.SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    import PipelineQueries._
    for (r <- 1 to reps) {
      println(s"---- rep $r ----")
      timed("d2Pairs (build ckpts only)") { d2Pairs(spark, sfDir); () }
      timed("d6Labels noop") { noop(d6Labels(spark, sfDir)) }
      timed("cc alone (pairs prebuilt)") {
        val p = d2Pairs(spark, sfDir).select(col("a_id"), col("b_id"))
        noop(connectedComponents(p))
      }
      timed("k5 full") { noop(k5CurationFunnel(spark, sfDir)) }
      timed("pipe_corpus_prep full") { noop(CorpusPrep.pipeCorpusPrep(spark, sfDir)) }
      timed("d19 full") { noop(d19CanonicalPick(spark, sfDir)) }
      timed("d13 full") { noop(d13DedupEval(spark, sfDir)) }
    }
    spark.stop()
  }
}
