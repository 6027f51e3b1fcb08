package graft.incremental

import graft.SparkSpec
import graft.fixtures.DeepbookFixtures
import graft.models.DeepbookPipeline
import org.apache.spark.sql.DataFrame
import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, TimeUnit}
import scala.jdk.CollectionConverters._

/** E1 concurrency (reference parity: dbt `threads: 4`, `profiles.yml:14`):
  * the concurrent scheduler must change WHEN models build, never WHAT they
  * build — a 4-thread run produces tables identical to the sequential
  * walk, independent models genuinely overlap, a dependent model never
  * starts before its declared upstreams land, and a cyclic DAG fails fast
  * instead of deadlocking. */
class RunnerSpec extends SparkSpec {
  import spark.implicits._

  private def ctx(mode: RunMode) =
    RunContext(spark, DeepbookFixtures.sources(spark), mode, DeepbookFixtures.now)

  private def rowsOf(df: DataFrame): Set[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  test("4-thread run ≡ sequential run: identical tables, schemas and snapshot history") {
    val seqRoot = Files.createTempDirectory("graft-run-seq").toString
    val parRoot = Files.createTempDirectory("graft-run-par").toString
    val models = DeepbookPipeline.models
    // two batches each (bootstrap + incremental re-run) so the merge path
    // is exercised concurrently too, not just the bootstrap write
    val seqR = new Runner(seqRoot, models, threads = 1)
    val parR = new Runner(parRoot, models, threads = 4)
    seqR.run(ctx(RunMode.FullRefresh)); seqR.run(ctx(RunMode.Incremental))
    parR.run(ctx(RunMode.FullRefresh)); parR.run(ctx(RunMode.Incremental))
    for (m <- models) {
      val a = SnapshotStore.read(spark, s"$seqRoot/${m.name}").get
      val b = SnapshotStore.read(spark, s"$parRoot/${m.name}").get
      assert(a.schema == b.schema, s"${m.name}: schema diverged")
      assert(rowsOf(a) == rowsOf(b), s"${m.name}: contents diverged")
      assert(SnapshotStore.snapshots(s"$seqRoot/${m.name}") ==
        SnapshotStore.snapshots(s"$parRoot/${m.name}"),
        s"${m.name}: snapshot history diverged")
    }
  }

  /** A tiny synthetic model for scheduler-shape tests. */
  private def model(n: String, deps: Seq[String] = Nil)
                   (body: (String => DataFrame) => DataFrame): Model = new Model {
    val name = n
    val uniqueKey = Seq("id")
    override val refs: Seq[String] = deps
    def build(c: RunContext, existing: Option[DataFrame],
              ref: String => DataFrame): DataFrame = body(ref)
  }

  test("independent models genuinely overlap under threads >= 2") {
    // each root blocks until it has seen the OTHER start — only a
    // concurrent schedule can finish (sequential would deadlock, so the
    // awaits carry timeouts and the assertions fail loudly instead)
    val aStarted = new CountDownLatch(1)
    val bStarted = new CountDownLatch(1)
    val a = model("ov_a") { _ =>
      aStarted.countDown()
      assert(bStarted.await(60, TimeUnit.SECONDS), "b never started while a ran")
      Seq((1L, "a")).toDF("id", "v")
    }
    val b = model("ov_b") { _ =>
      bStarted.countDown()
      assert(aStarted.await(60, TimeUnit.SECONDS), "a never started while b ran")
      Seq((1L, "b")).toDF("id", "v")
    }
    val root = Files.createTempDirectory("graft-run-ov").toString
    val out = new Runner(root, Seq(a, b), threads = 2).run(ctx(RunMode.FullRefresh))
    assert(out.keySet == Set("ov_a", "ov_b"))
  }

  test("a dependent model starts only after its declared upstreams complete") {
    val order = java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
    val slowRoot = model("dep_root") { _ =>
      Thread.sleep(300) // let the scheduler TRY to run the leaf early
      order.add("root_done")
      Seq((1L, 10L), (2L, 20L)).toDF("id", "v")
    }
    val leaf = model("dep_leaf", deps = Seq("dep_root")) { ref =>
      order.add("leaf_start")
      // ref() must serve the completed upstream, not error or see a stub
      val n = ref("dep_root").count()
      Seq((1L, n)).toDF("id", "n")
    }
    val root = Files.createTempDirectory("graft-run-dep").toString
    val out = new Runner(root, Seq(leaf, slowRoot), threads = 4).run(ctx(RunMode.FullRefresh))
    assert(order.toArray.toSeq == Seq("root_done", "leaf_start"))
    assert(out("dep_leaf").select("n").as[Long].head() == 2L)
  }

  test("a failed model skips its subtree; independent models still build (dbt run semantics)") {
    for (t <- Seq(1, 4)) {
      val bad = model("fl_bad")(_ => sys.error("boom"))
      val child = model("fl_child", deps = Seq("fl_bad")) { ref =>
        ref("fl_bad"); Seq((1L, 1L)).toDF("id", "v")
      }
      val grandchild = model("fl_grand", deps = Seq("fl_child")) { ref =>
        ref("fl_child"); Seq((1L, 1L)).toDF("id", "v")
      }
      val ok = model("fl_ok")(_ => Seq((1L, 7L)).toDF("id", "v"))
      val okChild = model("fl_ok_child", deps = Seq("fl_ok")) { ref =>
        Seq((1L, ref("fl_ok").count())).toDF("id", "n")
      }
      val root = Files.createTempDirectory("graft-run-fl").toString
      val runner = new Runner(root, Seq(bad, child, grandchild, ok, okChild), threads = t)
      val report = runner.runReport(ctx(RunMode.FullRefresh))
      assert(report.statuses("fl_bad").isInstanceOf[ModelStatus.Error], s"threads=$t")
      assert(report.statuses("fl_child") == ModelStatus.Skipped(Seq("fl_bad")), s"threads=$t")
      assert(report.statuses("fl_grand") == ModelStatus.Skipped(Seq("fl_child")),
        s"threads=$t: skip must propagate transitively without attempting the model")
      assert(report.statuses("fl_ok") == ModelStatus.Success, s"threads=$t")
      assert(report.statuses("fl_ok_child") == ModelStatus.Success,
        s"threads=$t: the independent subtree must be unharmed")
      assert(report.tables.keySet == Set("fl_ok", "fl_ok_child"), s"threads=$t")
      assert(!report.ok)
      // run() throws AFTER building what it could, with the full report
      val root2 = Files.createTempDirectory("graft-run-fl2").toString
      val e = intercept[RunFailedException] {
        new Runner(root2, Seq(bad, child, ok), threads = t).run(ctx(RunMode.FullRefresh))
      }
      assert(e.report.tables.keySet == Set("fl_ok"), s"threads=$t")
      assert(e.getMessage.contains("SKIPPED") && e.getMessage.contains("ERROR"))
    }
  }

  test("retry rebuilds only the failed subtree; successes are not re-run (dbt retry)") {
    val builds = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val flaky = new java.util.concurrent.atomic.AtomicBoolean(true)
    def counted(n: String, deps: Seq[String] = Nil)(rows: => org.apache.spark.sql.DataFrame) =
      model(n, deps) { _ => builds.add(n); rows }
    val bad = counted("rt_bad") {
      if (flaky.getAndSet(false)) sys.error("transient boom")
      Seq((1L, 1L)).toDF("id", "v")
    }
    val child = counted("rt_child", deps = Seq("rt_bad")) { Seq((2L, 2L)).toDF("id", "v") }
    val ok = counted("rt_ok") { Seq((3L, 3L)).toDF("id", "v") }
    val root = Files.createTempDirectory("graft-run-rt").toString
    val runner = new Runner(root, Seq(bad, child, ok), threads = 2)
    val first = runner.runReport(ctx(RunMode.FullRefresh))
    assert(first.statuses("rt_bad").isInstanceOf[ModelStatus.Error])
    assert(first.statuses("rt_child") == ModelStatus.Skipped(Seq("rt_bad")))
    assert(first.statuses("rt_ok") == ModelStatus.Success)
    builds.clear()
    val second = runner.retry(ctx(RunMode.FullRefresh), first)
    assert(second.ok, second.summary)
    // only the failed subtree was attempted; the success was NOT rebuilt
    assert(builds.asScala == Set("rt_bad", "rt_child"))
    assert(second.tables.keySet == Set("rt_bad", "rt_child", "rt_ok"))
    // a fully-green report retries to itself without touching anything
    builds.clear()
    assert(runner.retry(ctx(RunMode.FullRefresh), second) eq second)
    assert(builds.isEmpty)
  }

  test("a cyclic refs graph fails fast instead of deadlocking") {
    val x = model("cyc_x", deps = Seq("cyc_y"))(_ => Seq((1L, 1L)).toDF("id", "v"))
    val y = model("cyc_y", deps = Seq("cyc_x"))(_ => Seq((1L, 1L)).toDF("id", "v"))
    val root = Files.createTempDirectory("graft-run-cyc").toString
    val e = intercept[RuntimeException] {
      new Runner(root, Seq(x, y), threads = 4).run(ctx(RunMode.FullRefresh))
    }
    assert(e.getMessage.contains("cycle"))
  }
}
