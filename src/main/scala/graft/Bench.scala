package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main — runs every SparkEntry query on
  * `sys.env("SPARK_GRAFT_SF_DIR")` and prints ONE JSON metric line.
  *
  * Each query is fully materialized through the `noop` sink: a bare
  * `count()` would let Catalyst eliminate final global sorts and all
  * column projections, systematically undertiming sort/projection-heavy
  * queries. The noop sink evaluates every row of every column and
  * discards the bytes — pure execution cost, no disk noise.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def materialize(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sqlContext.clearCache() // drop per-query persists between runs
      sec
    }
    // JVM/codegen warmup on the tiny flagship so the first measured query
    // isn't charged for classloading and whole-stage-codegen compilation.
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // dag_fct_incremental is a pipeline-protocol check (two full DAG runs
    // through the disk-based merge sink — ~14 write/read cycles of fixed
    // overhead on tiny fixtures), not a query; it stays in the
    // correctness gate but would only measure sink fsync here.
    val results = (SparkEntry.queries - "dag_fct_incremental")
      .keys.toSeq.sorted.map(n => n -> materialize(n))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
