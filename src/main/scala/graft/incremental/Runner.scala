package graft.incremental

import graft.Sources
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import java.time.Instant

/** Run mode of a model build — dbt `is_incremental()` resolved to a value
  * (`deepbook_margin_loan_borrowed.sql:20-25`; SURVEY.md §2.10). */
sealed trait RunMode
object RunMode {
  case object FullRefresh extends RunMode
  case object Incremental extends RunMode
}

/** Everything a model function needs, with the clock injected so the
  * 30-day backfill bound (`deepbook_margin_loan_borrowed.sql:23-25`) and
  * `updated_at` audit columns are deterministic under test
  * (SURVEY.md §7.5 #4).
  *
  * @param lookbackDays  trailing re-aggregation window of the daily fact
  *                      (`fct_deepbook_margin_pool_daily.sql:33-35`)
  * @param backfillDays  cold-start scan bound (`..._loan_borrowed.sql:23-25`)
  */
final case class RunContext(
    spark: SparkSession,
    sources: Sources,
    mode: RunMode,
    now: Instant,
    lookbackDays: Int = 7,
    backfillDays: Int = 30)

/** A dbt model reborn as a Scala value: a name, a merge key, and a build
  * function from (context, prior materialization, upstream refs). */
trait Model {
  def name: String
  /** Composite merge key (dbt `unique_key`). */
  def uniqueKey: Seq[String]
  /** Date expression over this model's output rows used to partition its
    * snapshots — enables partition-scoped merges in [[SnapshotStore]]
    * (only batch-touched dates are rewritten; the rest hard-link).
    * None ⇒ whole-snapshot merge (small dimension-like tables only). */
  def partitionDate: Option[Column] = None
  /** Columns the maintenance OPTIMIZE clusters each compacted file by
    * (row-group min/max data skipping for readers filtering on them);
    * defaults to the merge key. Empty ⇒ compaction only. */
  def clusterBy: Seq[String] = uniqueKey
  /** Upstream model names this build `ref()`s — the DAG edges dbt derives
    * by parsing `ref()` calls, declared here. Drives the concurrent
    * scheduler: a model starts once every listed upstream (that is part
    * of the run) has finished. Names not in the run resolve from their
    * on-disk materialization, as before. */
  def refs: Seq[String] = Nil
  def build(ctx: RunContext, existing: Option[DataFrame],
            ref: String => DataFrame): DataFrame
}

/** S10: dbt target → output namespace, mirroring the reference's schema
  * macro (`macros/dune_dbt_overrides/get_custom_schema.sql:9-24`):
  *   - `prod`            → `{schema}` (the team schema, verbatim)
  *   - anything else     → `{schema}__tmp_{suffix}` — suffix trimmed; an
  *     empty suffix keeps the trailing underscore (the macro's default-dev
  *     branch; the reference's CI sets the suffix to the PR number). */
final case class Target(name: String, schema: String, devSuffix: String = "") {
  def resolvedSchema: String =
    if (name == "prod") schema else s"${schema}__tmp_${devSuffix.trim}"
}

/** Per-model outcome of one DAG run — dbt's run-result vocabulary. */
sealed trait ModelStatus
object ModelStatus {
  case object Success extends ModelStatus
  /** The model's own build/merge threw. */
  final case class Error(cause: Throwable) extends ModelStatus
  /** Not attempted: a (transitive) upstream did not succeed — dbt's
    * SKIP. `upstream` names the directly failing/skipped refs. */
  final case class Skipped(upstream: Seq[String]) extends ModelStatus
}

/** Outcome of [[Runner.runReport]]: per-model statuses plus the tables of
  * every model that DID build (dbt: one error fails its subtree, never
  * the siblings — independent models always complete). */
final case class RunReport(statuses: Map[String, ModelStatus],
                           tables: Map[String, DataFrame]) {
  def ok: Boolean = statuses.values.forall(_ == ModelStatus.Success)
  def summary: String = statuses.toSeq.sortBy(_._1).map {
    case (n, ModelStatus.Success)    => s"$n: OK"
    case (n, ModelStatus.Error(e))   => s"$n: ERROR ${e.getMessage}"
    case (n, ModelStatus.Skipped(u)) => s"$n: SKIPPED (upstream ${u.mkString(",")})"
  }.mkString("; ")
}

/** Typed failure of [[Runner.run]]; `report` has the full picture. */
final class RunFailedException(val report: RunReport, cause: Throwable)
  extends RuntimeException(s"DAG run failed: ${report.summary}", cause)

/** E1: the dbt DAG runner. Each model's output is merged into its table
  * via [[SnapshotStore]] and becomes available to downstream models
  * through `ref` — exactly dbt's `ref()`/`source()` contract
  * (`SURVEY.md §3 E1`).
  *
  * Independent models build CONCURRENTLY on `threads` worker threads —
  * the reference runs dbt with `threads: 4` (`profiles.yml:14,29`), and
  * the 5 event extractors + object staging are mutually independent
  * roots, so a backfill builds them 4-at-a-time. Safe because: each model
  * owns its table directory (snapshot writes never collide), the pointer
  * swap is atomic, a model starts only after every declared [[Model.refs]]
  * upstream completes, and Spark explicitly supports concurrent job
  * submission from multiple threads within one application. `threads = 1`
  * degenerates to the old strictly-sequential walk; outputs are
  * identical either way (RunnerSpec pins this).
  *
  * `maintenance = true` reproduces the prod post-hooks: S8 OPTIMIZE
  * (file compaction, `macros/dune_dbt_overrides/optimize_table.sql:1-5`)
  * and S9 VACUUM (retention, `vacuum_table.sql:1-5`) after each model
  * build — off by default like the reference's dev target.
  *
  * `tests` attaches each model's `schema.yml` data tests
  * ([[graft.models.ReferenceSchema]] carries the reference's own
  * declarations) and gives the run `dbt build` semantics: a model's tests
  * run right after its merge, a red test fails THAT model
  * ([[DataTests.DataTestFailedException]] → [[ModelStatus.Error]]) and
  * skips its downstream, while independent siblings keep building. */
final class Runner(root: String, models: Seq[Model], maintenance: Boolean = false,
                   target: Option[Target] = None, threads: Int = 4,
                   tests: Map[String, Seq[DataTests.DataTest]] = Map.empty) {
  require(threads >= 1, s"threads must be >= 1, got $threads")

  /** Tables live under the target-resolved schema namespace when a
    * [[Target]] is set (dev and prod runs of the same DAG never collide —
    * the reference's environment-switching convention); flat under `root`
    * otherwise. */
  def tableDir(name: String): String =
    target.fold(s"$root/$name")(t => s"$root/${t.resolvedSchema}/$name")

  /** Build one model: read prior state, run the model function, merge,
    * optional maintenance, publish into `built`. */
  private def buildOne(ctx: RunContext, m: Model,
                       built: java.util.concurrent.ConcurrentMap[String, DataFrame]): DataFrame = {
    val dir = tableDir(m.name)
    val existing = SnapshotStore.read(ctx.spark, dir)
    val mode = if (existing.isDefined) ctx.mode else RunMode.FullRefresh
    val out = m.build(ctx.copy(mode = mode), existing,
      name => Option(built.get(name)).getOrElse(
        SnapshotStore.read(ctx.spark, tableDir(name)).getOrElse(
          sys.error(s"ref('$name') not built and no materialization at ${tableDir(name)}"))))
    SnapshotStore.merge(ctx.spark, dir, out, m.uniqueKey, m.partitionDate)
    if (maintenance) {
      SnapshotStore.optimize(ctx.spark, dir, clusterBy = m.clusterBy)
      SnapshotStore.vacuum(dir)
    }
    val res = SnapshotStore.read(ctx.spark, dir).get
    tests.get(m.name).foreach { ts =>
      // relationships tests resolve their parent like ref() does: this
      // run's build if present, the on-disk materialization otherwise
      DataTests.check(
        name =>
          if (name == m.name) res
          else Option(built.get(name)).getOrElse(
            SnapshotStore.read(ctx.spark, tableDir(name)).getOrElse(
              sys.error(s"relationships ref('$name') has no materialization"))),
        Seq(m.name -> ts))
    }
    built.put(m.name, res)
    res
  }

  /** Runs the full DAG once; returns each model's post-merge table.
    * Throws [[RunFailedException]] if ANY model errored or was skipped —
    * but only after every model that COULD build has built (dbt's exit
    * contract: nonzero status, siblings unharmed). */
  def run(ctx: RunContext): Map[String, DataFrame] = {
    val report = runReport(ctx)
    if (!report.ok) {
      val firstCause = report.statuses.values
        .collectFirst { case ModelStatus.Error(e) => e }.orNull
      throw new RunFailedException(report, firstCause)
    }
    report.tables
  }

  /** `dbt retry`: re-run ONLY the models that did not succeed in a prior
    * [[RunReport]] (Error or Skipped — dbt's retry set), leaving every
    * successful model's materialization untouched. The retried sub-DAG
    * keeps its edges; upstreams that succeeded last time resolve from
    * their on-disk tables through the normal `ref` fallback. Returns the
    * merged report: prior successes carried forward, retried statuses
    * replacing their old Error/Skipped entries. */
  def retry(ctx: RunContext, previous: RunReport): RunReport = {
    val failed = previous.statuses.collect {
      case (n, s) if s != ModelStatus.Success => n
    }.toSet
    if (failed.isEmpty) previous
    else {
      val sub = new Runner(root, models.filter(m => failed(m.name)),
        maintenance, target, threads, tests)
      val r = sub.runReport(ctx)
      RunReport(previous.statuses ++ r.statuses, previous.tables ++ r.tables)
    }
  }

  /** Record the dbt slim-CI state artifact for this project into
    * `stateDir`: each model's definition fingerprint + output schema.
    * Run AFTER a successful [[run]] (the schemas come from the
    * materialized tables). See [[State]]. */
  def writeState(ctx: RunContext, stateDir: String): Unit = {
    val schemas = scala.collection.mutable.Map[String, StructType]()
    def tableSchema(name: String): StructType =
      schemas.getOrElseUpdate(name,
        SnapshotStore.read(ctx.spark, tableDir(name))
          .getOrElse(sys.error(s"state: '$name' has no materialization")).schema)
    State.write(stateDir, models.map { m =>
      m.name -> State.ModelState(
        State.fingerprint(ctx, m, tableSchema), tableSchema(m.name).json)
    }.toMap)
  }

  /** dbt `--select state:modified+`: the models whose DEFINITION differs
    * from the state recorded at `stateDir` (new models, or
    * fingerprint-changed ones), plus their downstream closure — the slim
    * CI selection that rebuilds exactly the touched subtree. Ref
    * stand-ins take their schemas from the state ARTIFACT, so the
    * comparison reads no tables at all (dbt's manifest-vs-manifest
    * diff); untouched upstreams later resolve from their on-disk
    * materializations through the Runner's normal `ref` fallback.
    * No prior state ⇒ everything is modified (first CI run). */
  def stateModified(ctx: RunContext, stateDir: String): Seq[Model] = {
    val prior = State.read(stateDir).getOrElse(Map.empty)
    def refSchema(name: String): StructType =
      prior.get(name).map(_.schema).getOrElse(
        sys.error(s"state: no recorded schema for ref('$name')"))
    val changed = models.filter { m =>
      prior.get(m.name) match {
        case None => true // new model
        case Some(st) =>
          m.refs.exists(r => !prior.contains(r)) ||
            State.fingerprint(ctx, m, refSchema) != st.fingerprint
      }
    }.map(_.name)
    if (changed.isEmpty) Seq.empty
    else Selector.select(models, changed.map(_ + "+").mkString(" "))
  }

  /** Runs the full DAG once, never throwing for a model failure: a model
    * that errors gets [[ModelStatus.Error]], its (transitive) downstream
    * is [[ModelStatus.Skipped]] without being attempted, and every
    * independent model still builds — dbt's run semantics (one bad model
    * must not take down an unrelated subtree's backfill). */
  def runReport(ctx: RunContext): RunReport = {
    import scala.jdk.CollectionConverters._
    import scala.util.control.NonFatal
    val built = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
    val inRun = models.map(_.name).toSet
    // DAG sanity up front: refs must be acyclic over the models in this
    // run (a cycle would deadlock the scheduler / recurse forever)
    locally {
      val deps = models.map(m => m.name -> m.refs.toSet.intersect(inRun)).toMap
      val seen = scala.collection.mutable.Set[String]()
      val onPath = scala.collection.mutable.Set[String]()
      def visit(n: String): Unit = {
        if (onPath(n)) sys.error(s"model DAG cycle through '$n'")
        if (!seen(n)) {
          onPath += n; deps(n).foreach(visit); onPath -= n; seen += n
        }
      }
      inRun.foreach(visit)
    }
    def attempt(m: Model, upstreamBad: Seq[String]): ModelStatus =
      if (upstreamBad.nonEmpty) ModelStatus.Skipped(upstreamBad)
      else try { buildOne(ctx, m, built); ModelStatus.Success }
      catch { case NonFatal(e) => ModelStatus.Error(e) }
    val statuses: Map[String, ModelStatus] =
      if (threads == 1) {
        val acc = scala.collection.mutable.Map[String, ModelStatus]()
        models.foreach { m =>
          val bad = m.refs.filter(inRun)
            .filter(n => acc.get(n).exists(_ != ModelStatus.Success))
          acc(m.name) = attempt(m, bad)
        }
        acc.toMap
      } else {
        import scala.concurrent.{Await, ExecutionContext, Future}
        import scala.concurrent.duration.Duration
        val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
        implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
        try {
          // One future per model, gated on its upstream futures — the
          // completion-driven schedule: a model starts the moment its last
          // dependency lands, not when a whole "wave" drains. Statuses are
          // VALUES, so one model's error never fails the future graph —
          // siblings keep building; only its own downstream sees it.
          val futures = scala.collection.mutable.Map[String, Future[(String, ModelStatus)]]()
          def futureOf(name: String): Future[(String, ModelStatus)] =
            futures.getOrElseUpdate(name, {
              val m = models.find(_.name == name).get
              val upstream = m.refs.filter(inRun).map(futureOf)
              Future.sequence(upstream).map { ups =>
                name -> attempt(m, ups.collect {
                  case (n, s) if s != ModelStatus.Success => n
                })
              }
            })
          // materialize the map on this thread (futures is not thread-safe;
          // getOrElseUpdate recursion stays on the caller)
          val all = models.map(m => futureOf(m.name))
          Await.result(Future.sequence(all), Duration.Inf).toMap
        } finally pool.shutdown()
      }
    RunReport(statuses, built.asScala.toMap)
  }
}
