package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Source-table resolution (SURVEY.md §2.1 S1-S4).
  *
  * The reference points every `source()` at one catalog via a macro
  * (`macros/dune_dbt_overrides/source.sql:1-5`); here a `Sources` value maps
  * logical table name → DataFrame. Two concrete resolvers:
  *
  *  - [[Sources.testdata]]: the driver's TPC-H-ish stand-in tables under an
  *    sf dir (`/root/repo/TESTDATA.md`).
  *  - [[Sources.sui]]: DeepBook-shaped tables (events/objects/prices) read
  *    from parquet with the explicit schemas below — used by the model DAG
  *    and fabricated by the test fixtures (FIXTURES.md).
  *
  * Schemas are declared, never inferred (`models/sources/_sources.yml:4-10`
  * declares names only; column shapes per FIXTURES.md §1-3).
  */
final case class Sources(resolve: String => DataFrame) {
  def apply(name: String): DataFrame = resolve(name)
}

object Sources {

  /** `sui.events` — append-only event log keyed (transaction_digest,
    * event_index), ordered by timestamp_ms (FIXTURES.md §1). */
  val suiEventsSchema: StructType = StructType(Seq(
    StructField("transaction_digest", StringType),
    StructField("event_index", LongType),
    StructField("timestamp_ms", LongType),
    StructField("sender", StringType),
    StructField("event_type", StringType),
    StructField("event_json", StringType)))

  /** `sui.objects` — one row per object mutation, keyed (object_id, version)
    * (FIXTURES.md §2). */
  val suiObjectsSchema: StructType = StructType(Seq(
    StructField("object_id", StringType),
    StructField("version", LongType),
    StructField("type_", StringType),
    StructField("object_status", StringType),
    StructField("object_json", StringType),
    StructField("timestamp_ms", LongType)))

  /** `prices.day` — daily token prices, multiple rows/day allowed
    * (FIXTURES.md §3; `fct_deepbook_margin_pool_daily.sql:122-135`). */
  val pricesDaySchema: StructType = StructType(Seq(
    StructField("blockchain", StringType),
    StructField("symbol", StringType),
    StructField("timestamp", TimestampType),
    StructField("price", DoubleType)))

  /** Raw shape of `events` when the file carries ts as a physical INT64 of
    * nanoseconds since epoch (a TIMESTAMP(NANOS) parquet column Spark's
    * µs TimestampType cannot read directly). */
  private[graft] val eventsRawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // nanos since epoch
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Type-aware `events` reader. The driver's testdata has shipped ts as
    * both INT64 nanos (rounds 1-4) and timestamp[us] (round 5+); forcing
    * either shape onto the other silently corrupts every timestamp (µs
    * values re-divided by 1000 collapse into Jan 1970). Branch on the
    * parquet footer's physical type — never guess:
    *  - INT64            → read raw, truncate ns → µs (exact at ms grain);
    *  - timestamp[us/ns-adjusted] → read directly, cast to TimestampType
    *    (identity under the UTC session timezone whether the footer is
    *    inferred as TIMESTAMP or TIMESTAMP_NTZ).
    *
    * A third vintage exists in the wild: INT64 *annotated* TIMESTAMP(NANOS).
    * Spark's schema inference rejects that footer outright ("Illegal Parquet
    * type") before any branch here runs, so inference failure itself is the
    * signal: fall back to the raw INT64-nanos read, which ignores the
    * logical annotation and goes through the same ns → µs truncation. */
  private[graft] def readEvents(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val footer =
      try spark.read.parquet(path).schema
      catch {
        case _: Exception => eventsRawSchema // annotated-nanos vintage
      }
    footer("ts").dataType match {
      case LongType =>
        spark.read.schema(eventsRawSchema).parquet(path)
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: TimestampType | _: TimestampNTZType =>
        spark.read.schema(footer).parquet(path)
          .withColumn("ts", col("ts").cast(TimestampType))
      case other =>
        sys.error(s"events.ts has unsupported physical type $other at $path")
    }
  }

  /** Driver stand-in tables: `<dir>/<name>.parquet`. */
  def testdata(spark: SparkSession, dir: String): Sources =
    Sources {
      case "events" => readEvents(spark, s"$dir/events.parquet")
      case name     => spark.read.parquet(s"$dir/$name.parquet")
    }

  /** DeepBook-shaped sources rooted at `dir`, schema-enforced. */
  def sui(spark: SparkSession, dir: String): Sources = {
    val schemas = Map(
      "sui.events" -> suiEventsSchema,
      "sui.objects" -> suiObjectsSchema,
      "prices.day" -> pricesDaySchema)
    Sources { name =>
      val path = s"$dir/${name.replace('.', '_')}.parquet"
      schemas.get(name) match {
        case Some(s) => spark.read.schema(s).parquet(path)
        case None    => spark.read.parquet(path)
      }
    }
  }

  /** In-memory resolver for tests. */
  def inMemory(tables: Map[String, DataFrame]): Sources = Sources(tables.apply)

  /** Format-agnostic schema-enforced reader: the same logical tables can
    * arrive as parquet, ORC, JSON-lines or CSV (chain ingests are rarely
    * columnar at the edge). Schema is always declared — never inferred —
    * so a malformed file fails loudly instead of silently retyping
    * columns; JSON/CSV get explicit null handling via PERMISSIVE mode. */
  def read(spark: SparkSession, format: String, path: String,
           schema: StructType): DataFrame = format match {
    case "parquet" => spark.read.schema(schema).parquet(path)
    case "orc"     => spark.read.schema(schema).orc(path)
    case "json"    => spark.read.schema(schema)
      .option("mode", "PERMISSIVE").json(path)
    case "csv"     => spark.read.schema(schema)
      .option("header", "true").option("mode", "PERMISSIVE").csv(path)
    case other => sys.error(s"unsupported source format: $other")
  }

  /** DeepBook-shaped sources in any supported format:
    * `<dir>/<table>.<ext>`. */
  def suiAs(spark: SparkSession, dir: String, format: String): Sources = {
    val schemas = Map(
      "sui.events" -> suiEventsSchema,
      "sui.objects" -> suiObjectsSchema,
      "prices.day" -> pricesDaySchema)
    Sources { name =>
      val path = s"$dir/${name.replace('.', '_')}.$format"
      read(spark, format, path, schemas(name))
    }
  }
}
