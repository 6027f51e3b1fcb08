package graft

import graft.TrinoFns._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** F-table semantic traps (SURVEY.md §7.5 #1): the Trino↔Spark deltas that
  * silently flip oracle hashes. */
class TrinoFnsSpec extends SparkSpec {
  import spark.implicits._

  test("F5: msToTs truncates like Trino integer division") {
    // 1999 ms / 1000 must be 1 s, not 1.999 s
    val r = Seq(1999L, 2000L, 2001L).toDF("ms")
      .select(unix_timestamp(msToTs(col("ms"))).as("s")).as[Long].collect()
    assert(r.toSeq == Seq(1L, 2L, 2L))
  }

  test("F5+F8: msToDate lands on the UTC calendar day") {
    // 2026-01-07 23:59:59.999 UTC stays Jan 7; +1ms rolls to Jan 8
    val jan8 = java.time.Instant.parse("2026-01-08T00:00:00Z").toEpochMilli
    val r = Seq(jan8 - 1, jan8).toDF("ms")
      .select(msToDate(col("ms")).cast("string")).as[String].collect()
    assert(r.toSeq == Seq("2026-01-07", "2026-01-08"))
  }

  test("F9: dateAddDays(-7) subtracts days (Trino arg order shimmed)") {
    val r = Seq("2026-01-08").toDF("d")
      .select(dateAddDays(to_date(col("d")), -7).cast("string")).as[String].head()
    assert(r == "2026-01-01")
  }

  test("F6: backfillBoundMs keeps millisecond precision") {
    val now = java.time.Instant.parse("2026-01-15T00:00:00.123Z")
    assert(backfillBoundMs(now, 30) == now.toEpochMilli - 30L * 86400000L)
    assert(backfillBoundMs(now, 30) % 1000 == 123L)
  }

  test("F11: regexpExtractNullable returns NULL (not \"\") on no-match") {
    val df = Seq("MarginPool<0x2::sui::SUI>", "nomatch").toDF("s")
      .select(regexpExtractNullable(col("s"), "<(.+)>$", 1).as("x"))
    assert(df.collect().toSeq == Seq(Row("0x2::sui::SUI"), Row(null)))
  }

  test("F1: jsonScalar extracts scalars incl. nested paths") {
    val j = """{"a":{"name":"coin::USDC"},"n":"42","b":true}"""
    val df = Seq(j).toDF("j").select(
      jsonScalar(col("j"), "$.a.name").as("nested"),
      jsonScalar(col("j"), "$.n").try_cast("bigint").as("n"),
      jsonScalar(col("j"), "$.b").try_cast("boolean").as("b"),
      jsonScalar(col("j"), "$.missing").as("m"))
    assert(df.collect().head == Row("coin::USDC", 42L, true, null))
  }

  test("F2: jsonFormatExtract serializes non-scalar subtrees to JSON text") {
    val j = """{"contents":["0xdbp1","0xdbp2"]}"""
    val r = Seq(j).toDF("j")
      .select(jsonFormatExtract(col("j"), "$.contents")).as[String].head()
    assert(r == """["0xdbp1","0xdbp2"]""")
  }

  test("F3: try_cast yields NULL on malformed numerics and parses booleans") {
    val df = Seq(("abc", "true"), ("1.5", "false"), ("", "nope")).toDF("d", "b")
      .select(tryCastDouble(col("d")).as("d"), tryCastBoolean(col("b")).as("b"))
    assert(df.collect().toSeq ==
      Seq(Row(null, true), Row(1.5, false), Row(null, null)))
  }

  test("P10 guards: normalize NULL-decimals, share-price NULL, utilization 0") {
    val df = Seq((100.0, null.asInstanceOf[java.lang.Double], 0.0))
      .toDF("raw", "dec", "den")
      .select(
        normalize(col("raw"), col("dec")).as("norm"),
        ratioOrNull(col("raw"), col("den")).as("share_price"),
        ratioOrZero(col("raw"), col("den")).as("util"))
    // else-NULL vs else-0 asymmetry (`stg_...object.sql:146-157`)
    assert(df.collect().head == Row(null, null, 0.0))
  }

  test("F12: pow10 matches power(10, d)") {
    val r = Seq(0, 6, 9).toDF("d").select(pow10(col("d"))).as[Double].collect()
    assert(r.toSeq == Seq(1.0, 1e6, 1e9))
  }
}
