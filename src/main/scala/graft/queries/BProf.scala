package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only stage attribution for d14b at rehearsal tiers (VERDICT r14
  * "Next round" #4: verify the output-bound floor claim at sf1). Times
  * each segment of the SymSpell k=2 pipeline separately and counts the
  * stream sizes once. Usage: BProf [sfDir] [reps] */
object BProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft-sf1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "30s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import PipelineQueries._

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
      println(f"[bprof] $label%-40s $sec%8.3f s")
      sec
    }

    try graft.SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    val D = D14bPrefix
    def cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey").as("id"), col("c_name").as("name"))
    def repsDf = cust.groupBy(col("name"))
      .agg(min(col("id")).as("rid"), count(lit(1)).as("n"))
      .localCheckpoint()
    def nbOf(r: DataFrame) = r.select(col("rid"), explode(expr(
        s"""concat(
           |  array(name),
           |  CASE WHEN length(name) >= 1 THEN
           |    transform(sequence(1, least(length(name), $D)),
           |      i -> concat(substring(name, 1, i - 1), substring(name, i + 1)))
           |  ELSE array() END,
           |  CASE WHEN least(length(name), $D) >= 2 THEN
           |    flatten(transform(sequence(1, least(length(name), $D) - 1),
           |      i -> transform(sequence(i + 1, least(length(name), $D)),
           |        j -> concat(substring(name, 1, i - 1),
           |                    substring(name, i + 1, j - i - 1),
           |                    substring(name, j + 1)))))
           |  ELSE array() END)""".stripMargin)).as("v"),
        length(col("name")).as("len"))
      .select(col("rid"), xxhash64(col("v")).as("vh"), col("len"))
      .distinct()
      .localCheckpoint()

    // stream sizes, once
    val r0 = repsDf
    val nb0 = nbOf(r0)
    val nDistinct = r0.count()
    val nNb = nb0.count()
    val cand0 = nb0.as("x").join(nb0.as("y"),
        col("x.vh") === col("y.vh") && col("x.rid") < col("y.rid") &&
          abs(col("x.len") - col("y.len")) <= 2)
      .select(col("x.rid").as("a_id"), col("y.rid").as("b_id"))
    val nHits = cand0.count()
    val nCand = cand0.distinct().count()
    val np0 = d14bNamePairs(spark, sfDir)
    val nVerified = np0.count()
    println(s"[bprof] sizes: distinct_names=$nDistinct nb_rows=$nNb hits=$nHits " +
      s"cand_pairs=$nCand verified=$nVerified")
    spark.sqlContext.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))

    for (r <- 1 to reps) {
      println(s"---- rep $r ----")
      timed("1 reps ckpt") { repsDf; () }
      timed("2 reps+nb ckpts") { nbOf(repsDf); () }
      timed("3 ..+cand join+distinct (noop)") {
        val nb = nbOf(repsDf)
        nb.as("x").join(nb.as("y"),
            col("x.vh") === col("y.vh") && col("x.rid") < col("y.rid") &&
              abs(col("x.len") - col("y.len")) <= 2)
          .select(col("x.rid").as("a_id"), col("y.rid").as("b_id"))
          .distinct()
          .write.format("noop").mode("overwrite").save()
      }
      timed("4 full verify (np ckpt build)") { d14bNamePairs(spark, sfDir); () }
      timed("5 d14b full (verify + sort)") {
        d14bImpl(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
