package graft.models

import graft.incremental.{Model, Runner, SnapshotStore}
import org.apache.spark.sql.SparkSession

/** The reference's model DAG in topological order (SURVEY.md §0):
  * 5 event extractors + object staging (roots) → daily fact (leaf).
  * `dbt run --select +fct_deepbook_margin_pool_daily` ≡ `runner(root).run(ctx)`.
  */
object DeepbookPipeline {
  val models: Seq[Model] = EventModels.all ++ Seq(PoolObjectStg, PoolDailyFct)
  /** `maintenance` = prod target's optimize/vacuum post-hooks.
    * `withTests` = `dbt build`: the reference's schema.yml suite
    * ([[ReferenceSchema.suite]]) runs after each model's merge; a red
    * test fails the model and skips its downstream. */
  /** Scheduler width of the fixture-gate DAG runs — overridable for the
    * protocol-floor attribution experiments (SCALE.md §7o): the Runner's
    * completion-driven pool is provably output-equivalent at any width,
    * so the knob can only move WALL time, never hashes. */
  private def gateThreads: Int =
    sys.env.get("GRAFT_RUNNER_THREADS").map(_.toInt).getOrElse(4)

  def runner(root: String, maintenance: Boolean = false,
             withTests: Boolean = false): Runner =
    new Runner(root, models, maintenance, threads = gateThreads,
      tests = if (withTests) ReferenceSchema.suite.toMap else Map.empty)

  /** E3 (SURVEY §3): register every materialized model as a temp view so
    * `spark.sql` serves the same ad-hoc consumption queries the reference
    * runs on Dune (`README.md:77-120`). */
  def registerViews(spark: SparkSession, root: String): Unit =
    models.foreach { m =>
      SnapshotStore.read(spark, s"$root/${m.name}")
        .foreach(_.createOrReplaceTempView(m.name))
    }
}
