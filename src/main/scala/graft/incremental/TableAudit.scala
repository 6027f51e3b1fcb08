package graft.incremental

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** K4: cross-generation drift audit — the data-observability check a
  * production pipeline runs after every incremental build (volume,
  * null-rate and cardinality monitors over a table's history, the
  * Monte-Carlo/elementary-style monitors dbt users bolt on). Time travel
  * ([[SnapshotStore.readAt]]) supplies the prior state for free — the
  * audit is a pure query over two generations, no extra bookkeeping.
  *
  * Scale design (the k2 lessons): row count and EVERY per-column null
  * count fuse into ONE column-pruned conditional-count pass per side;
  * each NDV runs as its OWN two-phase hash aggregate over a one-column
  * projection (packing different-column DISTINCTs into one agg plans as
  * a valueSet SortAggregate — the k2-documented scale cliff). All
  * metrics are integers, so the drift flags are exact in any engine:
  * `null_rate_spike` cross-multiplies (nulls_curr·n_prev >
  * 2·nulls_prev·n_curr) instead of dividing.
  */
object TableAudit {

  /** Per-column profile: (column_name, n_rows, n_nulls, ndv).
    * `ndv` counts distinct non-null values (SQL COUNT(DISTINCT)). */
  def profile(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "profile needs at least one column")
    val aggs = count(lit(1)).as("_n") +:
      columns.map(c => count(when(col(c).isNull, lit(1))).as(s"_null_$c"))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = columns.map(c => s"'$c', _null_$c").mkString(", ")
    val nulls = one.selectExpr("_n as n_rows",
      s"stack(${columns.size}, $stackArgs) as (column_name, n_nulls)")
    val ndvs = columns.map { c =>
      df.select(col(c)).agg(count_distinct(col(c)).as("ndv"))
        .select(lit(c).as("column_name"), col("ndv"))
    }.reduce(_.unionByName(_))
    nulls.join(ndvs, "column_name")
      .select(col("column_name"), col("n_rows"), col("n_nulls"), col("ndv"))
  }

  /** Drift between two states of one table (prev generation → current):
    * one row per column with both profiles side by side and exact
    * anomaly flags — `volume_shrank` (rows disappeared from an
    * append-mostly table), `null_rate_spike` (null fraction more than
    * doubled), `ndv_dropped` (cardinality fell — a join key collapsing). */
  def drift(prev: DataFrame, curr: DataFrame, columns: Seq[String]): DataFrame = {
    val p = profile(prev, columns)
      .withColumnsRenamed(Map("n_rows" -> "n_prev", "n_nulls" -> "nulls_prev",
        "ndv" -> "ndv_prev"))
    val c = profile(curr, columns)
      .withColumnsRenamed(Map("n_rows" -> "n_curr", "n_nulls" -> "nulls_curr",
        "ndv" -> "ndv_curr"))
    p.join(c, "column_name")
      .withColumn("volume_shrank", col("n_curr") < col("n_prev"))
      .withColumn("null_rate_spike",
        col("nulls_curr") * col("n_prev") > lit(2) * col("nulls_prev") * col("n_curr"))
      .withColumn("ndv_dropped", col("ndv_curr") < col("ndv_prev"))
      .select("column_name", "n_prev", "n_curr", "nulls_prev", "nulls_curr",
        "ndv_prev", "ndv_curr", "volume_shrank", "null_rate_spike", "ndv_dropped")
      .orderBy("column_name")
  }
}
