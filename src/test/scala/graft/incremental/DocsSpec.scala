package graft.incremental

import graft.SparkSpec
import graft.fixtures.DeepbookFixtures
import graft.models.{DeepbookPipeline, EventModels, PoolDailyFct, ReferenceSchema}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** dbt `docs generate` parity: the catalog document must carry the whole
  * DAG (all 7 reference models), both edge directions, plan-derived
  * column schemas that match what the models actually BUILD, and the
  * schema.yml test suite — deterministically, without executing a job. */
class DocsSpec extends SparkSpec {

  private def ctx =
    RunContext(spark, DeepbookFixtures.sources(spark),
      RunMode.FullRefresh, DeepbookFixtures.now)

  private lazy val doc: List[JValue] = {
    val json = Docs.catalog(ctx, DeepbookPipeline.models,
      ReferenceSchema.suite.toMap)
    JsonMethods.parse(json).asInstanceOf[JArray].arr
  }

  private def model(name: String): JValue =
    doc.find(m => (m \ "model") == JString(name))
      .getOrElse(fail(s"model $name missing from catalog"))

  private def names(v: JValue): Seq[String] =
    v.asInstanceOf[JArray].arr.map(_.asInstanceOf[JString].s)

  test("catalog lists every pipeline model exactly once, alphabetically") {
    val listed = doc.map(m => (m \ "model").asInstanceOf[JString].s)
    assert(listed == listed.sorted)
    assert(listed.toSet == DeepbookPipeline.models.map(_.name).toSet)
    assert(listed.size == 7)
  }

  test("lineage edges match the declared DAG in both directions") {
    val fct = model(PoolDailyFct.name)
    assert(names(fct \ "depends_on").toSet == PoolDailyFct.refs.toSet)
    assert(names(fct \ "referenced_by").isEmpty)
    PoolDailyFct.refs.foreach { up =>
      assert(names(model(up) \ "referenced_by") == Seq(PoolDailyFct.name),
        s"$up must list the fct as its only downstream")
    }
  }

  test("plan-derived columns equal the schema of the actually-built model") {
    val c = ctx
    val noRef: String => org.apache.spark.sql.DataFrame =
      n => sys.error(s"unexpected ref('$n')")
    val built = EventModels.loanBorrowed.build(c, None, noRef).schema
    val cols = (model(EventModels.loanBorrowed.name) \ "columns")
      .asInstanceOf[JArray].arr
    assert(cols.map(col => (col \ "name").asInstanceOf[JString].s)
      == built.fields.map(_.name).toSeq)
    assert(cols.map(col => (col \ "type").asInstanceOf[JString].s)
      == built.fields.map(_.dataType.simpleString).toSeq)
  }

  test("the schema.yml suite rides along per model") {
    val fctTests = (model(PoolDailyFct.name) \ "tests").asInstanceOf[JArray].arr
    assert(fctTests.nonEmpty)
    val expected = ReferenceSchema.suite.toMap.apply(PoolDailyFct.name)
      .map(t => (t.testName, t.columnLabel)).toSet
    val got = fctTests.map(t => ((t \ "test").asInstanceOf[JString].s,
      (t \ "column").asInstanceOf[JString].s)).toSet
    assert(got == expected)
  }

  test("the document is byte-stable across generations") {
    val a = Docs.catalog(ctx, DeepbookPipeline.models, ReferenceSchema.suite.toMap)
    val b = Docs.catalog(ctx, DeepbookPipeline.models, ReferenceSchema.suite.toMap)
    assert(a == b)
  }

  test("config block records key, partitioning and clustering") {
    val fct = model(PoolDailyFct.name)
    assert(names(fct \ "config" \ "unique_key") == PoolDailyFct.uniqueKey)
    assert((fct \ "config" \ "partitioned") == JBool(PoolDailyFct.partitionDate.isDefined))
  }
}
