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
}
