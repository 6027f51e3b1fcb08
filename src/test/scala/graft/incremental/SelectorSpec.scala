package graft.incremental

import graft.Sources
import graft.fixtures.DeepbookFixtures
import graft.models.DeepbookPipeline
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame

/** dbt `--select` graph operators over a diamond DAG, plus the real
  * pipeline's documented invocation (`+fct` pulls every upstream). */
class SelectorSpec extends AnyFunSuite {

  private def m(n: String, deps: String*): Model = new Model {
    val name = n
    val uniqueKey = Seq("id")
    override val refs: Seq[String] = deps
    def build(c: RunContext, e: Option[DataFrame], ref: String => DataFrame) =
      sys.error("never built in this spec")
  }

  //   a      e (disconnected)
  //  / \
  // b   c
  //  \ /
  //   d
  private val dag = Seq(m("a"), m("b", "a"), m("c", "a"), m("d", "b", "c"), m("e"))

  private def names(spec: String) = Selector.select(dag, spec).map(_.name)

  test("bare name selects only the node") { assert(names("b") == Seq("b")) }

  test("+model selects ancestors") {
    assert(names("+d") == Seq("a", "b", "c", "d"))
    assert(names("+b") == Seq("a", "b"))
  }

  test("model+ selects descendants") {
    assert(names("a+") == Seq("a", "b", "c", "d"))
    assert(names("b+") == Seq("b", "d"))
  }

  test("+model+ selects both closures") { assert(names("+b+") == Seq("a", "b", "d")) }

  test("@model adds the ancestors of every descendant") {
    // @b: b, d (descendant), and d's ancestors a, c — NOT e
    assert(names("@b") == Seq("a", "b", "c", "d"))
  }

  test("terms union; order follows the input model sequence") {
    assert(names("e +b") == Seq("a", "b", "e"))
  }

  test("unknown names refuse loudly") {
    val e = intercept[IllegalArgumentException](names("nope+"))
    assert(e.getMessage.contains("nope"))
  }

  test("the reference's documented invocation selects the fct's upstream closure") {
    // dbt run --select +fct_deepbook_margin_pool_daily (README.md:46):
    // the fct refs the 4 volume extractors + the stg — deposit_collateral
    // is a sibling OUTSIDE the closure (the fct never joins deposits)
    val all = DeepbookPipeline.models
    val got = Selector.select(all, "+fct_deepbook_margin_pool_daily").map(_.name)
    assert(got.toSet ==
      all.map(_.name).toSet - "deepbook_margin_deposit_collateral")
    assert(got.size == 6)
  }
}
