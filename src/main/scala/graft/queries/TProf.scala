package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only piecewise profiler for k11 (sketch vs exact-eval halves) and
  * the BPE training loop's checkpoint cadence (guide §1). Interleaved
  * variants, per-run block release. Usage: TProf [sfDir] [reps] */
object TProf {
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
      println(f"[tprof] $label%-34s $sec%8.3f s")
      sec
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    try graft.SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    import PipelineQueries._
    for (r <- 1 to reps) {
      println(s"---- rep $r ----")
      timed("k11: values ckpt only") { k11Values(spark, sfDir).localCheckpoint(); () }
      timed("k11: values+kept ckpts") {
        val v = k11Values(spark, sfDir).localCheckpoint()
        k11Sketch(v).localCheckpoint(); ()
      }
      timed("k11: exact half (given values)") {
        val v = k11Values(spark, sfDir).localCheckpoint()
        noop(v.as("x").join(v.as("y"),
            col("x.h") === col("y.h") && col("x.g") < col("y.g"))
          .groupBy(col("x.g").as("a"), col("y.g").as("b"))
          .agg(count(lit(1)).as("exact_inter")))
      }
      timed("k11 full") { noop(k11ThetaSketch(spark, sfDir)) }
      timed("t27b ckptEvery=1 (current)") {
        noop(bpeTrainLoop(spark, sfDir, T27bMerges, 1)._1
          .reduce(_ unionByName _).orderBy(col("iter")))
      }
      timed("t27b ckptEvery=3") {
        noop(bpeTrainLoop(spark, sfDir, T27bMerges, 3)._1
          .reduce(_ unionByName _).orderBy(col("iter")))
      }
      timed("t27b ckptEvery=99 (lazy)") {
        noop(bpeTrainLoop(spark, sfDir, T27bMerges, 99)._1
          .reduce(_ unionByName _).orderBy(col("iter")))
      }
      timed("t28 ckptEvery=1 (current)") { noop(t28BpeEncode(spark, sfDir)) }
    }
    spark.stop()
  }
}
