package graft.incremental

import graft.SparkSpec
import graft.incremental.DataTests.{DataTest, DataTestFailedException}
import org.apache.spark.sql.DataFrame
import java.nio.file.Files

/** E2 (`dbt test`, `README.md:49` + `schema.yml` declarations): each of
  * dbt's four generic tests compiles to the documented count, the fused
  * single-pass plan stays one scan per model, `check` throws dbt's exit
  * contract, and a Runner with attached tests has `dbt build` semantics
  * (red test fails the model, skips downstream, spares siblings). */
class DataTestsSpec extends SparkSpec {
  import spark.implicits._
  import DataTest._

  private def docs: DataFrame = Seq(
    (1L, Option("a"), Option("en"), Option("p1")),
    (2L, Option("b"), Option("en"), Option("p1")),
    (3L, None, Option("xx"), Option("p2")),          // null text, bad lang
    (4L, Option("d"), None, Option("p3")),           // null lang, dangling parent
    (4L, Option("e"), Option("de"), Option("p2")))   // duplicate id
    .toDF("id", "text", "lang", "parent")

  private def parents: DataFrame = Seq("p1", "p2").toDF("pid")

  private val suite = Seq(
    NotNull("text"), NotNull("lang"),
    Unique(Seq("id")),
    AcceptedValues("lang", Seq("en", "de")),
    Relationships("parent", "dim", "pid"))

  test("the four generic tests count failures exactly as dbt compiles them") {
    val got = DataTests
      .forModel("docs", docs, suite, Map("dim" -> parents).apply)
      .collect().map(r => (r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    assert(got(("text", "not_null")) == 1)
    assert(got(("lang", "not_null")) == 1)
    // one duplicated id value (4 appears twice) — dbt unique counts values
    assert(got(("id", "unique")) == 1)
    // 'xx' fails; the NULL lang does NOT (SQL NOT IN three-valued logic)
    assert(got(("lang", "accepted_values")) == 1)
    // one dangling child ROW (p3); NULLs would be exempt
    assert(got(("parent", "relationships")) == 1)
  }

  test("composite unique counts duplicated key combinations") {
    val df = Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "a"), (2L, "a"))
      .toDF("k1", "k2")
    val got = DataTests.forModel("t", df, Seq(Unique(Seq("k1", "k2"))))
      .collect().head
    assert(got.getLong(3) == 2) // (1,a) and (2,a)
    assert(!got.getBoolean(4))
  }

  test("not_null tests fuse into ONE aggregate pass over the model") {
    val plan = DataTests.forModel("docs", docs,
      Seq(NotNull("text"), NotNull("lang")))
      .queryExecution.optimizedPlan
    val scans = plan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }
    assert(scans.size == 1, s"fused tests must scan once, got ${scans.size}")
  }

  test("accepted_values counts DISTINCT offending values, not rows (dbt's GROUP BY compile)") {
    val df = Seq("xx", "xx", "xx", "yy", "en", null.asInstanceOf[String])
      .toDF("lang")
    val got = DataTests.forModel("t", df, Seq(AcceptedValues("lang", Seq("en", "de"))))
      .collect().head
    // 4 bad ROWS but only 2 bad VALUES (xx, yy); NULL never fails
    assert(got.getLong(3) == 2, s"expected 2 distinct failing values, got ${got.getLong(3)}")
  }

  test("check throws dbt's exit contract naming every red test") {
    val e = intercept[DataTestFailedException] {
      DataTests.check(
        n => if (n == "dim") parents else docs,
        Seq("docs" -> suite))
    }
    assert(e.failed.size == 5)
    assert(e.getMessage.contains("docs.id unique"))
    // a green suite is silent
    DataTests.check(n => if (n == "dim") parents else docs.filter($"id" < 3),
      Seq("docs" -> Seq(NotNull("text"), Unique(Seq("id")))))
  }

  test("dbt build on the real pipeline: the reference suite passes through the Runner") {
    val root = Files.createTempDirectory("graft-build-real").toString
    val report = graft.models.DeepbookPipeline.runner(root, withTests = true)
      .runReport(RunContext(spark,
        graft.fixtures.DeepbookFixtures.sources(spark),
        RunMode.FullRefresh, graft.fixtures.DeepbookFixtures.now))
    assert(report.ok, report.summary)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  test("Runner with tests: red test fails the model, skips downstream, spares siblings") {
    val root = Files.createTempDirectory("graft-dbt-build").toString
    def m(n: String, deps: Seq[String] = Nil)(rows: => DataFrame): Model = new Model {
      val name = n
      val uniqueKey = Seq("id")
      override val refs: Seq[String] = deps
      def build(c: RunContext, e: Option[DataFrame], ref: String => DataFrame) = rows
    }
    val bad = m("bad") { Seq((1L, Option.empty[String])).toDF("id", "v") }
    val down = m("down", Seq("bad")) { Seq((1L, "x")).toDF("id", "v") }
    val sibling = m("sib") { Seq((1L, "y")).toDF("id", "v") }
    val r = new Runner(root, Seq(bad, down, sibling), threads = 2,
      tests = Map("bad" -> Seq(NotNull("v")), "sib" -> Seq(NotNull("v"))))
    val report = r.runReport(RunContext(spark, graft.Sources(Map.empty),
      RunMode.FullRefresh, java.time.Instant.EPOCH))
    assert(report.statuses("sib") == ModelStatus.Success)
    report.statuses("bad") match {
      case ModelStatus.Error(e: DataTestFailedException) =>
        assert(e.failed.map(_._1) == Seq("bad"))
      case other => fail(s"expected a data-test Error, got $other")
    }
    assert(report.statuses("down") == ModelStatus.Skipped(Seq("bad")))
    // dbt parity: the failing model still MATERIALIZED (tests run after
    // the merge), its downstream just never consumed it
    assert(SnapshotStore.read(spark, s"$root/bad").nonEmpty)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }
}
