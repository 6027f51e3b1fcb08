package graft.models

import graft.incremental.{Model, Runner}

/** The reference's model DAG in topological order (SURVEY.md §0):
  * 5 event extractors + object staging (roots) → daily fact (leaf).
  * `dbt run --select +fct_deepbook_margin_pool_daily` ≡ `runner(root).run(ctx)`.
  */
object DeepbookPipeline {
  val models: Seq[Model] = EventModels.all ++ Seq(PoolObjectStg, PoolDailyFct)
  def runner(root: String): Runner = new Runner(root, models)
}
