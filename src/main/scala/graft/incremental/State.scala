package graft.incremental

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{DataType, StructType}
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}
import java.time.Instant
import scala.jdk.CollectionConverters._

/** dbt slim-CI state comparison (`dbt run --select state:modified+`,
  * dbt-core's "defer to state" workflow): a run records each model's
  * DEFINITION FINGERPRINT into a state dir; a later run diffs its models
  * against that artifact and rebuilds only what changed, plus the
  * downstream closure — the CI move that turns "rebuild the project" into
  * "rebuild the one touched subtree".
  *
  * dbt fingerprints the compiled SQL text. A model here is a Scala build
  * FUNCTION, so the faithful analog is the canonicalized ANALYZED plan of
  * the model's full-refresh build: logic changes (filters, projections,
  * expressions, new columns) change the plan; renamed Scala locals,
  * comments, or re-compiled-but-identical code do not. Fingerprinting is
  * plan construction only — nothing executes:
  *
  *  - full-refresh mode with no prior materialization, so the
  *    watermark-scalar `.head()` branches (which would run jobs AND embed
  *    data-dependent literals) never fire;
  *  - refs resolve to EMPTY schema-only stand-ins (LocalRelation), so the
  *    plan never embeds upstream SNAPSHOT paths — those advance on every
  *    run and would false-positive every downstream model;
  *  - the clock is pinned (epoch), so `now()` audit literals are
  *    constant.
  *
  * Source scans DO embed their (stable) source paths: moving the raw
  * data is correctly treated as "everything modified".
  */
object State {

  private val FileName = "_graft_state.json"

  /** Definition fingerprint of one model. `refSchema` supplies the
    * schema a `ref()` stand-in should carry (the persisted table's, or
    * the schema recorded in a prior state). */
  def fingerprint(ctx: RunContext, m: Model,
                  refSchema: String => StructType): String = {
    val fpCtx = ctx.copy(mode = RunMode.FullRefresh, now = Instant.EPOCH)
    val standIn: String => DataFrame = name =>
      ctx.spark.createDataFrame(new java.util.ArrayList[Row](), refSchema(name))
    val plan = m.build(fpCtx, None, standIn).queryExecution.analyzed.canonicalized
    // key + partitioning are definition too (dbt: config changes select)
    val config = s"key=${m.uniqueKey.mkString(",")};refs=${m.refs.mkString(",")}"
    java.security.MessageDigest.getInstance("SHA-256")
      .digest((plan.toString + "\n" + config).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  /** One model's recorded state: fingerprint + output schema (the schema
    * lets a later comparison build ref stand-ins without the tables). */
  final case class ModelState(fingerprint: String, schemaJson: String) {
    def schema: StructType = DataType.fromJson(schemaJson).asInstanceOf[StructType]
  }

  /** Write the state artifact (atomic move, like every store pointer). */
  def write(stateDir: String, states: Map[String, ModelState]): Unit = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    Files.createDirectories(Paths.get(stateDir))
    val json = JsonMethods.compact(JsonMethods.render(
      JArray(states.toSeq.sortBy(_._1).map { case (n, s) =>
        JObject(
          "model" -> JString(n),
          "fingerprint" -> JString(s.fingerprint),
          "schema" -> JsonMethods.parse(s.schemaJson))
      }.toList)))
    val tmp = Paths.get(stateDir, s".$FileName.tmp.${System.nanoTime()}")
    Files.writeString(tmp, json, StandardOpenOption.CREATE,
      StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, Paths.get(stateDir, FileName),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Read a prior run's state artifact; None if the dir has none (first
    * run — every model counts as modified). */
  def read(stateDir: String): Option[Map[String, ModelState]] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val p = Paths.get(stateDir, FileName)
    if (!Files.exists(p)) None
    else JsonMethods.parse(Files.readString(p)) match {
      case JArray(items) =>
        Some(items.map { o =>
          val JString(n) = o \ "model"
          val JString(fp) = o \ "fingerprint"
          n -> ModelState(fp, JsonMethods.compact(JsonMethods.render(o \ "schema")))
        }.toMap)
      case other => sys.error(s"malformed state artifact at $p: $other")
    }
  }
}
