package graft

import graft.fixtures.DeepbookFixtures
import org.apache.spark.sql.DataFrame
import java.nio.file.Files

/** Multi-format source parity: the same logical `sui.events` table
  * round-trips through parquet, ORC, JSON-lines and CSV with identical
  * contents under the declared schema — so the whole DAG can ingest
  * whatever format the edge delivers. (Timestamps ride as epoch-ms
  * BIGINTs in these tables, so even CSV is lossless.) */
class SourceFormatsSpec extends SparkSpec {

  private def rowsOf(df: DataFrame): Set[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  test("events round-trip identically through parquet / orc / json / csv") {
    val dir = Files.createTempDirectory("graft-fmt").toString
    val events = DeepbookFixtures.events(spark)
    val expected = rowsOf(events)
    for (fmt <- Seq("parquet", "orc", "json", "csv")) {
      val path = s"$dir/sui_events.$fmt"
      val w = events.coalesce(1).write.mode("overwrite")
      fmt match {
        case "parquet" => w.parquet(path)
        case "orc"     => w.orc(path)
        case "json"    => w.json(path)
        case "csv"     => w.option("header", "true").csv(path)
      }
      val back = Sources.suiAs(spark, dir, fmt)("sui.events")
      assert(rowsOf(back) == expected, s"format $fmt diverged")
    }
  }

  test("readEvents reads INT64-nanos and timestamp[us] events files identically") {
    // The round-5 regression in one test: the driver's events.ts physical
    // type changed from INT64 nanos to timestamp[us] between data drops,
    // and a reader hard-wired to either shape silently corrupts the other
    // (already-µs values re-divided by 1000 collapse into Jan 1970). The
    // footer-branching shim must yield the SAME rows from both vintages.
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft-tsunit").toString
    val base = spark.range(100).select(
      col("id").as("event_id"),
      // ts spread over ~11 days of 2024, second granularity
      (lit(1704067200000000L) + col("id") * 10000000000L).as("us"),
      (col("id") % 7).as("user_id"),
      concat(lit("t"), col("id") % 3).as("event_type"),
      (col("id") * 1.5).as("value"),
      lit("{}").as("props"))
    base.select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/as_ts/events.parquet")
    base.select(col("event_id"), (col("us") * 1000L).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/as_ns/events.parquet")
    val fromTs = Sources.testdata(spark, s"$dir/as_ts")("events")
    val fromNs = Sources.testdata(spark, s"$dir/as_ns")("events")
    assert(fromTs.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(fromTs.schema == fromNs.schema)
    assert(rowsOf(fromTs) == rowsOf(fromNs),
      "the two physical vintages must decode to identical rows")
    // and the values are real 2024 instants, not a silent 1970 collapse
    assert(fromNs.agg(min(year(col("ts")))).head.getInt(0) == 2024)
  }
}
