package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.LongType

/** Dev-only same-session A/B harness for optimization work (guide §1):
  * alternates OLD and NEW shapes of a hot query inside one JVM so host
  * phase drift cannot masquerade as a win. Not part of the driver
  * contract. Usage: ScratchProf [sfDir] [reps] */
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
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sqlContext.clearCache()
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => before.contains(id) }
        .values.foreach(_.unpersist(blocking = true))
      System.gc()
      println(f"[scratch] $label%-28s $sec%8.3f s")
      sec
    }

    // ---- OLD d14c shape (pre-r14-opt): no checkpoints around the sort ----
    val D14bPrefix = graft.queries.PipelineQueries.D14bPrefix
    val D14cCap = graft.queries.PipelineQueries.D14cCap
    def oldNamePairs(): DataFrame = {
      val cust = spark.read.parquet(s"$sfDir/customer.parquet")
        .select(col("c_custkey").as("id"), col("c_name").as("name"))
      val reps0 = cust.groupBy(col("name"))
        .agg(min(col("id")).as("rid"), count(lit(1)).as("n"))
        .localCheckpoint()
      val maxLen = reps0.agg(max(length(col("name")))).head.getInt(0)
      require(maxLen <= D14bPrefix)
      val nb = reps0.select(col("rid"), explode(expr(
          s"""concat(
             |  array(name),
             |  CASE WHEN length(name) >= 1 THEN
             |    transform(sequence(1, least(length(name), $D14bPrefix)),
             |      i -> concat(substring(name, 1, i - 1), substring(name, i + 1)))
             |  ELSE array() END,
             |  CASE WHEN least(length(name), $D14bPrefix) >= 2 THEN
             |    flatten(transform(sequence(1, least(length(name), $D14bPrefix) - 1),
             |      i -> transform(sequence(i + 1, least(length(name), $D14bPrefix)),
             |        j -> concat(substring(name, 1, i - 1),
             |                    substring(name, i + 1, j - i - 1),
             |                    substring(name, j + 1)))))
             |  ELSE array() END)""".stripMargin)).as("v"), length(col("name")).as("len"))
        .select(col("rid"), xxhash64(col("v")).as("vh"), col("len"))
        .distinct()
        .localCheckpoint()
      nb.as("x").join(nb.as("y"),
          col("x.vh") === col("y.vh") && col("x.rid") < col("y.rid") &&
            abs(col("x.len") - col("y.len")) <= 2)
        .select(col("x.rid").as("a_id"), col("y.rid").as("b_id"))
        .distinct()
        .join(reps0.select(col("rid").as("a_id"), col("name").as("a_name"),
          col("n").as("a_n")), "a_id")
        .join(reps0.select(col("rid").as("b_id"), col("name").as("b_name"),
          col("n").as("b_n")), "b_id")
        .withColumn("dist", expr("levenshtein(a_name, b_name, 2)"))
        .filter(col("dist") >= 0)
    }
    def oldD14b(): DataFrame =
      oldNamePairs()
        .select(col("a_id"), col("b_id"), col("dist").cast("long").as("dist"),
          col("a_n"), col("b_n"), (col("a_n") * col("b_n")).as("n_id_pairs"))
        .orderBy(col("a_id"), col("b_id"))
    def oldD14c(): DataFrame = {
      val cust = spark.read.parquet(s"$sfDir/customer.parquet")
        .select(col("c_custkey").as("id"), col("c_name").as("name"))
      val capped = cust
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("name")).orderBy(col("id"))))
        .withColumn("rid", min(col("id")).over(Window.partitionBy(col("name"))))
        .filter(col("rn") <= D14cCap)
        .select(col("rid"), col("id"))
        .localCheckpoint()
      val np = oldNamePairs()
      val cross = np
        .join(capped.select(col("rid").as("a_id"), col("id").as("ia")), "a_id")
        .join(capped.select(col("rid").as("b_id"), col("id").as("ib")), "b_id")
        .select(least(col("ia"), col("ib")).as("a_id"),
          greatest(col("ia"), col("ib")).as("b_id"),
          col("dist").cast("long").as("dist"))
      val same = capped.as("x").join(capped.as("y"),
          col("x.rid") === col("y.rid") && col("x.id") < col("y.id"))
        .select(col("x.id").as("a_id"), col("y.id").as("b_id"),
          lit(0L).as("dist"))
      cross.unionByName(same).orderBy(col("a_id"), col("b_id"))
    }

    // warmup
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    val res = scala.collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    (1 to reps).foreach { r =>
      println(s"== round $r ==")
      res("old d14b") ::= run("old d14b")(oldD14b())
      res("new d14b") ::= run("new d14b")(
        SparkEntry.queries("d14b_fuzzy_join_k2")(spark, sfDir))
      res("old d14c") ::= run("old d14c")(oldD14c())
      res("new d14c") ::= run("new d14c")(
        SparkEntry.queries("d14c_fuzzy_expand")(spark, sfDir))
    }
    println("== medians ==")
    res.toSeq.sortBy(_._1).foreach { case (k, v) =>
      val m = v.sorted.apply(v.size / 2)
      println(f"[scratch] $k%-12s median=$m%7.3f  runs=${v.reverse.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
