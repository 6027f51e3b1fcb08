package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Sort}
import org.apache.spark.sql.classic.{DataFrame => CDataFrame, Dataset, SparkSession => CSparkSession}

/** Dev-only measurement harness for the r14 optimization round (guide §1):
  * for each named query, times three same-JVM variants —
  *   full      the declared query as-is,
  *   nosort    the declared query with its final global Sort stripped
  *             (isolates what the query costs without the range
  *             exchange + sampling job),
  *   ckptsort  the final Sort re-applied on top of a localCheckpoint of
  *             its child (what the checkpoint-before-sort rewrite would
  *             make the query cost)
  * so the double-execution cost of the range-partitioner's sampling job
  * is measured per query instead of guessed. Lives in org.apache.spark.sql
  * only for Dataset.ofRows access; never part of the driver contract. */
object GraftSortProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val names = args.drop(2).toSeq
    require(names.nonEmpty, "usage: GraftSortProf sfDir reps name...")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "30s")
      .getOrCreate().asInstanceOf[CSparkSession]
    spark.sparkContext.setLogLevel("ERROR")

    def time(f: => CDataFrame): Double = {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sqlContext.clearCache()
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => before.contains(id) }
        .values.foreach(_.unpersist(blocking = true))
      System.gc()
      sec
    }

    def stripSort(lp: LogicalPlan): Option[(LogicalPlan, Sort)] = lp match {
      case s @ Sort(_, true, child, _) => Some((child, s))
      case _ => None
    }

    try graft.SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    val rows = names.map { n =>
      def full: CDataFrame = graft.SparkEntry.queries(n)(spark, sfDir).asInstanceOf[CDataFrame]
      val probe = full.queryExecution.logical
      val strippable = stripSort(probe).isDefined
      // NOTE each variant builds the query INSIDE the timer — the
      // pipeline queries run eager localCheckpoints at construction, and
      // excluding construction would untime them (first version of this
      // harness had exactly that bug)
      val fs = (1 to reps).map(_ => time(full)).sorted.apply(reps / 2)
      val (ns, cs) = if (strippable) {
        val noSec = (1 to reps).map { _ =>
          time(Dataset.ofRows(spark,
            stripSort(full.queryExecution.logical).get._1))
        }.sorted.apply(reps / 2)
        val ckSec = (1 to reps).map { _ =>
          time {
            val (child, s) = stripSort(full.queryExecution.logical).get
            val ck = Dataset.ofRows(spark, child).localCheckpoint()
            Dataset.ofRows(spark,
              Sort(s.order, global = true, ck.queryExecution.logical))
          }
        }.sorted.apply(reps / 2)
        (noSec, ckSec)
      } else (-1.0, -1.0)
      println(f"[sortprof] $n%-28s full=$fs%7.3f nosort=$ns%7.3f ckptsort=$cs%7.3f")
      (n, fs, ns, cs)
    }
    println("== summary (sorted by full-ckptsort gain) ==")
    rows.sortBy(r => -(r._2 - r._4)).foreach { case (n, f, s, c) =>
      println(f"[sortprof] $n%-28s full=$f%7.3f ckptsort=$c%7.3f gain=${f - c}%7.3f")
    }
    spark.stop()
  }
}
