package graft
import org.apache.spark.sql.SparkSession

/** Dev-only subset timer for optimization work (guide §1): times the named
  * queries with exactly [[Bench]]'s methodology (noop sink, median of N
  * runs, per-run block release) without paying for the other ~140 queries.
  * Used for same-boot before/after pairs; the canonical ledger stays
  * [[Bench]]. Usage: ProfSubset [sfDir] [reps] [name...] */
object ProfSubset {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val names = args.drop(2).toSeq
    require(names.nonEmpty, "usage: ProfSubset sfDir reps name...")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "30s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warmup (same as Bench): classloading + codegen off the first timing
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    val res = names.map { name =>
      val times = (1 to reps).map { _ =>
        val before = spark.sparkContext.getPersistentRDDs.keySet
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        spark.sqlContext.clearCache()
        spark.sparkContext.getPersistentRDDs
          .filterNot { case (id, _) => before.contains(id) }
          .values.foreach(_.unpersist(blocking = true))
        System.gc()
        sec
      }
      val med = times.sorted.apply(times.size / 2)
      println(f"[prof] $name%-28s median=$med%8.3f  runs=${times.map(t => f"$t%.2f").mkString(",")}")
      name -> med
    }
    println("{" + res.map { case (k, v) => "\"" + k + "\":" + v }.mkString(",") + "}")
    spark.stop()
  }
}
