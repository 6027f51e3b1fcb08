package graft.incremental

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.StructType
import java.time.Instant

/** dbt `docs generate` — the documentation artifact of the reference's
  * workflow (dbt-core emits `catalog.json` + `manifest.json`; lineage
  * views read the edges from it). One deterministic JSON document
  * carrying, per model: the materialization config (`unique_key`,
  * partitioning, `cluster_by`), the DAG edges in BOTH directions
  * (`depends_on` = the declared `refs`; `referenced_by` derived), the
  * column catalog, and the `schema.yml` test suite attached to the model
  * ([[graft.models.ReferenceSchema]] mirrors the reference's
  * `models/deepbook_margin/schema.yml`).
  *
  * Column schemas come from PLAN CONSTRUCTION ONLY: each model's
  * full-refresh build is analyzed against schema-only ref stand-ins in
  * topological order (the [[State]] fingerprint mechanism — epoch-pinned
  * clock, no prior materialization, so no watermark scalar ever
  * executes). Docs generation therefore reads source parquet FOOTERS but
  * never runs a job and never requires a materialized table — exactly
  * dbt's compile-time manifest, and O(metadata) at any corpus size.
  */
object Docs {

  /** The catalog document. `models` must be topologically ordered (as
    * [[graft.models.DeepbookPipeline.models]] is) so every `ref()`
    * resolves to an already-derived schema; output model order is
    * alphabetical and every list inside a model is sorted or
    * declaration-ordered, so the document is byte-stable across runs. */
  def catalog(ctx: RunContext, models: Seq[Model],
              tests: Map[String, Seq[DataTests.DataTest]] = Map.empty): String = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val fpCtx = ctx.copy(mode = RunMode.FullRefresh, now = Instant.EPOCH)
    val schemas = scala.collection.mutable.Map[String, StructType]()
    models.foreach { m =>
      val standIn: String => DataFrame = name =>
        ctx.spark.createDataFrame(new java.util.ArrayList[Row](),
          schemas.getOrElse(name, sys.error(
            s"docs: ref('$name') has no derived schema — models must be topologically ordered")))
      schemas(m.name) = m.build(fpCtx, None, standIn).schema
    }
    val referencedBy: Map[String, Seq[String]] =
      models.flatMap(m => m.refs.map(_ -> m.name))
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val doc = JArray(models.sortBy(_.name).map { m =>
      JObject(
        "model" -> JString(m.name),
        "config" -> JObject(
          "unique_key" -> JArray(m.uniqueKey.map(JString(_)).toList),
          "partitioned" -> JBool(m.partitionDate.isDefined),
          "cluster_by" -> JArray(m.clusterBy.map(JString(_)).toList)),
        "depends_on" -> JArray(m.refs.sorted.map(JString(_)).toList),
        "referenced_by" -> JArray(
          referencedBy.getOrElse(m.name, Nil).map(JString(_)).toList),
        "columns" -> JArray(schemas(m.name).fields.map(f =>
          JObject(
            "name" -> JString(f.name),
            "type" -> JString(f.dataType.simpleString),
            "nullable" -> JBool(f.nullable))).toList),
        "tests" -> JArray(tests.getOrElse(m.name, Nil).map(t =>
          JObject(
            "test" -> JString(t.testName),
            "column" -> JString(t.columnLabel))).toList))
    }.toList)
    JsonMethods.compact(JsonMethods.render(doc))
  }
}
