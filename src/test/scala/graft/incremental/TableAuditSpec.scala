package graft.incremental

import graft.SparkSpec

/** K4 drift monitors: the three anomaly flags fire on exactly the planted
  * drifts and stay quiet on healthy growth; rate math is integer
  * cross-multiplication, so a doubling null rate is the exact boundary. */
class TableAuditSpec extends SparkSpec {
  import spark.implicits._

  test("drift flags fire on planted anomalies only") {
    val prev = Seq((1L, Option("a"), Option("x")), (2L, Option("b"), Option("y")),
      (3L, Option("c"), Option("z")), (4L, None, Option("w")))
      .toDF("id", "k", "v")
    // curr: grew to 6 rows (healthy), k nulls 1→3 of 6 (rate 25%→50%, spike),
    // v collapsed to one distinct value (ndv 4→1, dropped)
    val curr = Seq((1L, Option("a"), Option("x")), (2L, None, Option("x")),
      (3L, Option("c"), Option("x")), (4L, None, Option("x")),
      (5L, Option("e"), Option("x")), (6L, None, Option("x")))
      .toDF("id", "k", "v")
    val got = TableAudit.drift(prev, curr, Seq("id", "k", "v")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getBoolean(7), r.getBoolean(8), r.getBoolean(9))).toMap
    assert(got("id") == (4L, 6L, 0L, 0L, 4L, 6L, false, false, false))
    // k: 1/4 -> 3/6: 3*4=12 > 2*1*6=12 is FALSE — exactly-doubled is the
    // boundary and must NOT fire (strict inequality)
    assert(got("k") == (4L, 6L, 1L, 3L, 3L, 3L, false, false, false))
    assert(got("v") == (4L, 6L, 0L, 0L, 4L, 1L, false, false, true))
    // shrink + a genuine spike (1/4 -> 4/6): 4*4=16 > 2*1*6=12 fires
    val shrunk = Seq((1L, Option("a"), Option("x")), (2L, None, Option("y")),
      (3L, Option.empty[String], Option("z")))
      .toDF("id", "k", "v")
    val got2 = TableAudit.drift(curr, shrunk, Seq("id", "k")).collect()
      .map(r => r.getString(0) -> (r.getBoolean(7), r.getBoolean(8))).toMap
    assert(got2("id") == (true, false))
    // k: 3/6 -> 2/3: 2*6=12 > 2*3*3=18 false
    assert(got2("k") == (true, false))
  }
}
