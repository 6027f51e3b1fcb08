package graft

import graft.queries.RelationalQueries
import org.apache.spark.sql.functions._

/** Pins `exactPctls` (the codegen'd cumulative-count percentile) to Spark's
  * own `percentile()` aggregate on adversarial shapes the driver fixtures
  * don't exercise: 1-row and 2-row groups (no `hi` value at the top rank),
  * heavy ties (the weighted path must step WHOLE tied runs at once), and
  * positions landing exactly on integers. */
class PercentileSpec extends SparkSpec {

  private val ps = Seq(0.5 -> "p50", 0.9 -> "p90", 0.25 -> "p25")

  private def compare(rows: Seq[(String, Double)]): Unit = {
    import spark.implicits._
    val df = rows.toDF("k", "v")
    val got = RelationalQueries.exactPctls(df, "k", "v", ps)
      .orderBy("k").collect().map(r => (r.getString(0),
        r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    val exp = df.groupBy(col("k"))
      .agg(round(expr("percentile(v, 0.5)"), 4).as("p50"),
        round(expr("percentile(v, 0.9)"), 4).as("p90"),
        round(expr("percentile(v, 0.25)"), 4).as("p25"))
      .orderBy("k").collect().map(r => (r.getString(0),
        r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(got.length == exp.length)
    got.zip(exp).foreach { case (g, e) =>
      assert(g._1 == e._1)
      // percentile() interpolates lo*(hi-pos)+hi*(pos-lo); exactPctls uses
      // lo+frac*(hi-lo) — identical to ~1 ULP, so compare at 1e-9
      assert(math.abs(g._2 - e._2) < 1e-9, s"p50 for ${g._1}: $g vs $e")
      assert(math.abs(g._3 - e._3) < 1e-9, s"p90 for ${g._1}: $g vs $e")
      assert(math.abs(g._4 - e._4) < 1e-9, s"p25 for ${g._1}: $g vs $e")
    }
  }

  test("singleton and pair groups (no hi value at the top rank)") {
    compare(Seq("a" -> 5.0, "b" -> 1.0, "b" -> 2.0, "c" -> 7.25, "c" -> 7.25))
  }

  test("heavy ties: runs of equal values spanning the rank positions") {
    compare(Seq.fill(37)("t" -> 3.0) ++ Seq.fill(13)("t" -> 9.0) ++
      Seq.fill(50)("u" -> 1.5) ++ Seq("u" -> 2.5))
  }

  test("positions landing exactly on integer ranks (frac = 0 must not interpolate)") {
    // 11 distinct values: p50 → pos 5.0 exactly, p25 → 2.5
    compare((1 to 11).map(i => "z" -> i.toDouble))
  }

  test("NULL values are ignored exactly as percentile() ignores them") {
    import spark.implicits._
    val df = Seq[(String, Option[Double])](
      "k" -> None, "k" -> Some(1.0), "k" -> Some(3.0), "k" -> None,
      "m" -> Some(2.0), "m" -> None).toDF("k", "v")
    val got = RelationalQueries.exactPctls(df, "k", "v", ps)
      .orderBy("k").collect().map(r => (r.getString(0), r.getDouble(1)))
    // percentile(v, 0.5) over (1.0, 3.0) = 2.0; over (2.0) = 2.0
    assert(got.toSeq == Seq("k" -> 2.0, "m" -> 2.0))
  }

  test("seeded random groups match percentile() everywhere") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 2000).map { _ =>
      (s"g${rnd.nextInt(7)}", math.floor(rnd.nextDouble() * 10000) / 100.0)
    }
    compare(rows)
  }
}
