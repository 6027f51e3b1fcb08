package graft.incremental

/** dbt node selection — the `--select` graph operators every dbt CLI run
  * uses (`dbt run --select +fct_deepbook_margin_pool_daily`, the
  * reference's own documented invocation, `README.md:46`):
  *
  *   - `model`    the node itself
  *   - `+model`   the node and its ANCESTORS (upstream closure)
  *   - `model+`   the node and its DESCENDANTS (downstream closure)
  *   - `+model+`  both closures
  *   - `@model`   the node, its descendants, and ALL ancestors of those
  *                descendants (dbt's @-operator: everything needed to
  *                build the subtree from scratch)
  *
  * Multiple whitespace-separated terms union. The result preserves the
  * caller's model order (the Runner schedules by `refs`, so order only
  * affects determinism of reporting). Selection is pure graph math over
  * [[Model.refs]] — the same edges the scheduler uses, so a selected
  * subset always has its in-run dependencies either included or
  * resolvable from their on-disk materializations (the Runner's normal
  * `ref` fallback). */
object Selector {

  def select(models: Seq[Model], spec: String): Seq[Model] = {
    val byName = models.map(m => m.name -> m).toMap
    val children: Map[String, Seq[String]] = models
      .flatMap(m => m.refs.filter(byName.contains).map(_ -> m.name))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    def closure(start: String, step: String => Seq[String]): Set[String] = {
      val seen = scala.collection.mutable.Set(start)
      val queue = scala.collection.mutable.Queue(start)
      while (queue.nonEmpty)
        step(queue.dequeue()).foreach(n => if (seen.add(n)) queue.enqueue(n))
      seen.toSet
    }
    def parents(n: String): Seq[String] = byName(n).refs.filter(byName.contains)
    def kids(n: String): Seq[String] = children.getOrElse(n, Nil)
    val terms = spec.trim.split("\\s+").filter(_.nonEmpty)
    require(terms.nonEmpty, "empty selection spec")
    val picked: Set[String] = terms.flatMap { term =>
      val at = term.startsWith("@")
      val plusLeft = term.startsWith("+")
      val plusRight = term.endsWith("+")
      val name = term.stripPrefix("@").stripPrefix("+").stripSuffix("+")
      require(byName.contains(name), s"unknown model '$name' in selector '$term'")
      if (at) {
        val down = closure(name, kids)
        down ++ down.flatMap(closure(_, parents))
      } else {
        Set(name) ++
          (if (plusLeft) closure(name, parents) else Set.empty) ++
          (if (plusRight) closure(name, kids) else Set.empty)
      }
    }.toSet
    models.filter(m => picked(m.name))
  }
}
