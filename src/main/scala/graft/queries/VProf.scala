package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only piece-wise profiler for the v26/v27 serving loops (guide §1:
  * find where the time actually sits before changing anything). Times
  * each building block of the two queries separately — quantize pass,
  * Lloyd iterations, PQ training, encode, serve — plus planning-only
  * time for the full queries, inside one JVM. Not part of the driver
  * contract. Usage: VProf [sfDir] [reps] */
object VProf {
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
      println(f"[vprof] $label%-34s $sec%8.3f s")
      sec
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warmup
    try graft.SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    import PipelineQueries._
    for (r <- 1 to reps) {
      println(s"---- rep $r ----")
      // full queries, for reference
      timed("v26 full")(noop(v26ConvergedIvfServe(spark, sfDir)))
      timed("v27 full")(noop(v27ResidualPq(spark, sfDir)))
      // v26 pieces
      timed("v26: kmQuantized ckpt") { kmQuantized(spark, sfDir) }
      timed("v26: quantize+4 lloydNext") {
        val u = kmQuantized(spark, sfDir)
        var state = kmSeedState
        for (_ <- 1 to V25Iters) state = lloydNext(u, state)
      }
      timed("v26: pqTrainLloyd") { pqTrainLloyd(spark, sfDir) }
      timed("v26: encode ckpt (after train)") {
        val u = kmQuantized(spark, sfDir)
        var state = kmSeedState
        for (_ <- 1 to V25Iters) state = lloydNext(u, state)
        val (_, byM) = pqTrainLloyd(spark, sfDir)
        val (_, encode) = quantEncoder(state, byM)
        noop(encode(fanOut(spark, spark.read.parquet(s"$sfDir/embeddings.parquet")))
          .drop("u", "p"))
      }
      // planning-only cost of the serve tails: executedPlan forces
      // analysis+optimization+physical planning+codegen prep, no jobs for
      // the FINAL stage (upstream eager checkpoints still run)
      timed("v26 plan-only (after build)") {
        val df = v26ConvergedIvfServe(spark, sfDir)
        df.queryExecution.executedPlan
        ()
      }
      timed("v27 plan-only (after build)") {
        val df = v27ResidualPq(spark, sfDir)
        df.queryExecution.executedPlan
        ()
      }
    }
    spark.stop()
  }
}
