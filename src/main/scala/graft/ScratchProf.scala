package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev-only same-session A/B harness for optimization work (guide §1):
  * alternates variant shapes of a hot query inside one JVM, round-robin,
  * so host phase drift cannot masquerade as a win. Not part of the driver
  * contract.
  *
  * r15 matrix: the d14b/d14c checkpoint placements (the r14 driver
  * measured d14c's double-barrier shape as a 1.6× regression — VERDICT.md
  * "Next round" #1). Variants run INTERLEAVED (a full round of all
  * variants, repeated), per-run block release, median reported.
  *
  * Usage: ScratchProf [sfDir] [reps] */
object ScratchProf {
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

    def run(label: String)(f: => DataFrame): Double = {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.setJobDescription(null)
      spark.sqlContext.clearCache()
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => before.contains(id) }
        .values.foreach(_.unpersist(blocking = true))
      System.gc()
      println(f"[scratch] $label%-28s $sec%8.3f s")
      sec
    }

    import graft.queries.PipelineQueries
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "d14c_np1_tail1" -> (() => PipelineQueries.d14cImpl(spark, sfDir, npCkpt = true, tailCkpt = true)),
      "d14c_np1_tail0" -> (() => PipelineQueries.d14cImpl(spark, sfDir, npCkpt = true, tailCkpt = false)),
      "d14c_np0_tail1" -> (() => PipelineQueries.d14cImpl(spark, sfDir, npCkpt = false, tailCkpt = true)),
      "d14c_np0_tail0" -> (() => PipelineQueries.d14cImpl(spark, sfDir, npCkpt = false, tailCkpt = false)),
      "d14b_np1" -> (() => PipelineQueries.d14bImpl(spark, sfDir, npCkpt = true)),
      "d14b_np0" -> (() => PipelineQueries.d14bImpl(spark, sfDir, npCkpt = false)))

    // warmup (same as Bench): classloading + codegen off the first timing
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // one untimed warm pass of each variant so codegen compilation of the
    // shared shapes is not charged to whichever variant runs first
    variants.foreach { case (l, f) => run(s"warm:$l")(f()) }

    val times = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    for (r <- 1 to reps; (l, f) <- variants)
      times(l) = times(l) :+ run(s"rep$r:$l")(f())
    println("---- medians ----")
    for ((l, _) <- variants) {
      val ts = times(l).sorted
      val med = ts(ts.size / 2)
      println(f"[scratch] MEDIAN $l%-22s $med%8.3f s  runs=${times(l).map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
