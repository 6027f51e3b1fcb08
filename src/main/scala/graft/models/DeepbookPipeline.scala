package graft.models

import graft.incremental.{Model, Runner}

/** The reference's model DAG in topological order (SURVEY.md §0):
  * 5 event extractors + object staging (roots) → daily fact (leaf).
  * `dbt run --select +fct_deepbook_margin_pool_daily` ≡ `runner(root).run(ctx)`.
  */
object DeepbookPipeline {
  val models: Seq[Model] = EventModels.all ++ Seq(PoolObjectStg, PoolDailyFct)
  /** `maintenance` = prod target's optimize/vacuum post-hooks. */
  def runner(root: String, maintenance: Boolean = false): Runner =
    new Runner(root, models, maintenance)
}
