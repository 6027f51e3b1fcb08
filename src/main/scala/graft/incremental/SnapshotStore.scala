package graft.incremental

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** S6: the incremental MERGE sink — dbt `incremental_strategy='merge'` on a
  * composite `unique_key` (`deepbook_margin_loan_borrowed.sql:1-8`,
  * `DEVELOPMENT.md:123-132`) rebuilt without a Delta jar.
  *
  * Layout:
  * {{{
  *   <root>/_CURRENT                       // pointer: name of live snapshot
  *   <root>/snap-0000001/                  // immutable snapshot
  *     _dt=2026-01-07/part-*.parquet       // partitioned models (daily dirs)
  *     part-*.parquet                      // unpartitioned models (flat)
  * }}}
  *
  * Merge = upsert: rows of the new batch win on key collision, unmatched old
  * rows survive (`newDf ∪ (old ⟕anti newDf)`), written to a fresh snapshot
  * dir and published by an atomic pointer swap — run-twice ≡ run-once.
  *
  * Scale design (100 TB): when a `partitionDate` expression is given, the
  * merge is partition-scoped — only the date partitions present in the new
  * batch are read for the anti-join and rewritten; every untouched
  * `_dt=` directory is carried into the new snapshot by **hard link**
  * (O(files) metadata ops, zero bytes moved, zero shuffle). An incremental
  * run over a 7-day lookback therefore rewrites 7 partitions, not the
  * table. This relies on keys being partition-stable (a re-delivered key
  * lands in the same date partition — true for all models: event keys
  * carry a fixed timestamp, the fct key contains snapshot_date itself),
  * which is the same contract Delta's replaceWhere/partition-merge uses.
  *
  * S7 (append, `DEVELOPMENT.md:134-142`) = [[append]]: batch written next
  * to hard-linked prior files, no key semantics. S8 (OPTIMIZE,
  * `macros/dune_dbt_overrides/optimize_table.sql:1-5`) = [[optimize]]:
  * compacting snapshot rewrite. S9 (VACUUM, `vacuum_table.sql:1-5`) =
  * [[vacuum]]: drop superseded snapshot dirs (hard links make this safe —
  * deleting an old dir never invalidates files shared with newer ones).
  */
object SnapshotStore {

  /** Hidden partition column materialized from a model's `partitionDate`. */
  val PartCol = "_dt"

  private def pointer(root: String) = Paths.get(root, "_CURRENT")

  def currentSnapshot(root: String): Option[String] = {
    val p = pointer(root)
    if (Files.exists(p)) Some(Files.readString(p).trim).filter(_.nonEmpty) else None
  }

  /** Live table contents (partition column stripped). */
  def read(spark: SparkSession, root: String): Option[DataFrame] =
    currentSnapshot(root).map { s =>
      // mergeSchema: after an additive schema evolution, files written
      // before the new column appeared lack it; the union schema (with
      // NULL fill) is the correct read, and a single-footer guess is not
      val df = spark.read.option("mergeSchema", "true").parquet(s"$root/$s")
      if (df.columns.contains(PartCol)) df.drop(PartCol) else df
    }

  private def nextSnapshotName(root: String): String = {
    val n = currentSnapshot(root)
      .map(_.stripPrefix("snap-").toLong).getOrElse(0L) + 1
    f"snap-$n%07d"
  }

  /** Atomic publish: write pointer to a temp file, rename over _CURRENT. */
  private def publish(root: String, snap: String): Unit = {
    val tmp = Paths.get(root, s"._CURRENT.tmp.${System.nanoTime()}")
    Files.writeString(tmp, snap, StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, pointer(root), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Directory value Spark uses for a null partition key. */
  private val NullPart = "__HIVE_DEFAULT_PARTITION__"

  private def withList[T](dir: Path)(f: Iterator[Path] => T): T = {
    val s = Files.list(dir)
    try f(s.iterator().asScala) finally s.close()
  }

  /** `_dt=<value>` partition directories of a snapshot. */
  private def partitionDirs(snapDir: Path): Seq[(String, Path)] =
    if (!Files.isDirectory(snapDir)) Seq.empty
    else withList(snapDir)(_.toSeq)
      .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith(s"$PartCol="))
      .map(p => (p.getFileName.toString.stripPrefix(s"$PartCol="), p))
      .sortBy(_._1)

  /** Hard-link every data file under `src` into the same relative location
    * under `dst` — carries immutable parquet between snapshots with
    * O(files) metadata work and zero data movement. */
  private def linkInto(src: Path, dst: Path): Unit = {
    Files.createDirectories(dst)
    val walk = Files.walk(src)
    try walk.iterator().asScala
      .filter(Files.isRegularFile(_))
      .filterNot { p =>
        val n = p.getFileName.toString
        n.startsWith("_") || n.startsWith(".")
      }
      .foreach { p =>
        val rel = src.relativize(p)
        val target = dst.resolve(rel)
        Files.createDirectories(target.getParent)
        Files.createLink(target, p)
      }
    finally walk.close()
  }

  private def writeSnapshot(root: String, df: DataFrame, partitioned: Boolean,
                            compactTo: Option[Int],
                            clusterBy: Seq[String] = Nil): String = {
    val snap = nextSnapshotName(root)
    val arranged = (partitioned, compactTo) match {
      // clustered compaction RANGE-partitions on the cluster keys so each
      // output file covers a disjoint key interval — that is what makes
      // file-level min/max stats (FileSkipping) selective; a round-robin
      // repartition would interleave every key into every file and min/max
      // would span the whole domain
      case (true, Some(n)) if clusterBy.nonEmpty =>
        df.repartitionByRange(n, (PartCol +: clusterBy).map(col): _*)
      case (false, Some(n)) if clusterBy.nonEmpty =>
        df.repartitionByRange(n, clusterBy.map(col): _*)
      // shuffle by partition value so each _dt dir gets few, large files
      case (true, Some(n))  => df.repartition(n, col(PartCol))
      case (true, None)     => df
      case (false, Some(n)) => df.repartition(n)
      case (false, None)    => df
    }
    // cluster within the output files so parquet row-group min/max stats
    // become selective on the cluster keys (the reader's pushed predicates
    // then skip row groups, not just partitions). The partition column
    // leads the sort when partitioned: it satisfies the parquet writer's
    // required ordering, so Spark does NOT stack its own non-stable sort
    // on _dt on top — which would both re-sort every row and, on spill,
    // scramble the clustering this exists to create.
    val clusterCols =
      if (clusterBy.isEmpty) Nil
      else if (partitioned) PartCol +: clusterBy
      else clusterBy
    val clustered =
      if (clusterCols.isEmpty) arranged
      else arranged.sortWithinPartitions(clusterCols.map(col): _*)
    val w = clustered.write.mode(SaveMode.Overwrite)
    (if (partitioned) w.partitionBy(PartCol) else w).parquet(s"$root/$snap")
    snap
  }

  /** Upsert `batch` into the table at `root` on composite key `keys`.
    *
    * In-batch duplicate keys are collapsed (last-write-wins is undefined in
    * Trino MERGE; we keep one arbitrary row, matching dbt's assumption that
    * the model SELECT is already key-unique). With `partitionDate`, only
    * batch-touched date partitions are read/rewritten; the rest hard-link.
    */
  def merge(spark: SparkSession, root: String, batch: DataFrame,
            keys: Seq[String], partitionDate: Option[Column] = None,
            compactTo: Option[Int] = None): Unit = {
    Files.createDirectories(Paths.get(root))
    val newDf = batch.dropDuplicates(keys)
    val cur = currentSnapshot(root)
    (cur, partitionDate) match {
      case (None, None) =>
        publish(root, writeSnapshot(root, newDf, partitioned = false, compactTo))

      case (None, Some(pd)) =>
        val batchP = newDf.withColumn(PartCol, pd.cast(StringType))
        publish(root, writeSnapshot(root, batchP, partitioned = true, compactTo))

      case (Some(c), None) =>
        // Unpartitioned fallback: whole-table rewrite (only sensible for
        // small dimension-like tables; every DAG model declares a date).
        val prev = spark.read.option("mergeSchema", "true").parquet(s"$root/$c")
        val survivors = prev.join(newDf.select(keys.map(col): _*), keys, "left_anti")
        // additive schema evolution (dbt on_schema_change=append_new_columns):
        // the output schema is the UNION of batch and snapshot columns, with
        // NULL fill on whichever side lacks one — a widened batch must not
        // throw, and a narrowed batch must not silently drop history
        val merged = newDf.unionByName(survivors, allowMissingColumns = true)
        publish(root, writeSnapshot(root, merged, partitioned = false, compactTo))

      case (Some(c), Some(pd)) =>
        val snapDir = Paths.get(root, c)
        val batchP = newDf.withColumn(PartCol, pd.cast(StringType))
        if (partitionDirs(snapDir).isEmpty) {
          // Migration path: the live snapshot is unpartitioned (e.g.
          // bootstrapped without a partitionDate). A dir-scoped merge
          // would see zero `_dt=` dirs and silently drop every prior
          // row — instead fall back to one whole-table rewrite that
          // PRODUCES the partitioned layout; subsequent merges are
          // partition-scoped.
          val prev = spark.read.option("mergeSchema", "true").parquet(snapDir.toString)
          val survivors = prev.join(newDf.select(keys.map(col): _*), keys, "left_anti")
            .withColumn(PartCol, pd.cast(StringType))
          val merged = batchP.unionByName(survivors, allowMissingColumns = true)
          publish(root, writeSnapshot(root, merged, partitioned = true, compactTo))
        } else {
          // The touched-partition list is tiny (bounded by the lookback /
          // backfill window — days, not rows); collecting it to the driver
          // is the same metadata-sized step a table format's commit log
          // does. A null date lands in Spark's null-partition dir.
          val touched = batchP.select(PartCol).distinct().collect()
            .map(r => if (r.isNullAt(0)) NullPart else r.getString(0)).toSet
          val (affectedDirs, untouchedDirs) =
            partitionDirs(snapDir).partition { case (v, _) => touched(v) }
          // Read ONLY touched partitions (explicit file-level pruning).
          val affectedOld = affectedDirs.map { case (v, p) =>
            val dtVal = if (v == NullPart) lit(null).cast(StringType) else lit(v)
            spark.read.parquet(p.toString).withColumn(PartCol, dtVal)
          }.reduceOption(_.unionByName(_, allowMissingColumns = true))
          val out = affectedOld match {
            case None => batchP
            case Some(old) =>
              val survivors = old.join(batchP.select(keys.map(col): _*), keys, "left_anti")
              batchP.unionByName(survivors, allowMissingColumns = true)
          }
          val snap = writeSnapshot(root, out, partitioned = true, compactTo)
          untouchedDirs.foreach { case (v, p) =>
            linkInto(p, Paths.get(root, snap, s"$PartCol=$v"))
          }
          publish(root, snap)
        }
    }
  }

  /** S7: `incremental_strategy='append'` (`DEVELOPMENT.md:134-142`) — blind
    * append for pure logs: the batch is written into a fresh snapshot and
    * every prior file is hard-linked alongside. No keys, no anti-join. */
  def append(spark: SparkSession, root: String, batch: DataFrame,
             partitionDate: Option[Column] = None,
             compactTo: Option[Int] = None): Unit = {
    Files.createDirectories(Paths.get(root))
    val cur = currentSnapshot(root)
    // Mixing layouts in one snapshot is unreadable (flat files next to
    // `_dt=` dirs ⇒ "conflicting directory structures"), and writing flat
    // into a partitioned table would partitionBy a missing column — fail
    // fast instead of corrupting the table.
    val curPartitioned = cur.exists(c => partitionDirs(Paths.get(root, c)).nonEmpty)
    require(cur.isEmpty || curPartitioned == partitionDate.isDefined,
      s"append layout mismatch at $root: table is " +
        s"${if (curPartitioned) "partitioned" else "flat"} but partitionDate is " +
        s"${if (partitionDate.isDefined) "set" else "absent"}")
    val out = partitionDate match {
      case Some(pd) => batch.withColumn(PartCol, pd.cast(StringType))
      case None     => batch
    }
    val snap = writeSnapshot(root, out, partitionDate.isDefined, compactTo)
    cur.foreach(c => linkInto(Paths.get(root, c), Paths.get(root, snap)))
    publish(root, snap)
  }

  /** S8: OPTIMIZE — compact the live snapshot's small files into
    * `filesPerPartition` files per date dir (or total, if unpartitioned),
    * published as a new snapshot. `clusterBy` additionally sorts rows
    * within each output file (Delta's `OPTIMIZE ... ZORDER BY` for the
    * single-key case): scans filtered on those keys then skip whole row
    * groups via parquet min/max stats instead of reading every compacted
    * file — the difference between O(partition) and O(matching row
    * groups) for point lookups at 100 TB. */
  def optimize(spark: SparkSession, root: String, filesPerPartition: Int = 1,
               clusterBy: Seq[String] = Nil): Unit =
    currentSnapshot(root).foreach { c =>
      val partitioned = partitionDirs(Paths.get(root, c)).nonEmpty
      val df = spark.read.option("mergeSchema", "true").parquet(s"$root/$c")
      val snap =
        writeSnapshot(root, df, partitioned, Some(filesPerPartition), clusterBy)
      // file-level min/max sidecar for the cluster keys, from footers only
      // (O(files) metadata); written BEFORE the pointer swap so a published
      // snapshot is never observed without its stats
      if (clusterBy.nonEmpty)
        FileSkipping.writeSidecar(Paths.get(root, snap),
          FileSkipping.collectStats(
            spark.sparkContext.hadoopConfiguration, Paths.get(root, snap),
            clusterBy.toSet))
      publish(root, snap)
    }

  /** ANALYZE-style stats refresh: (re)collect the file-level min/max/null
    * sidecar of the LIVE snapshot for `columns` — footer reads only, no
    * data bytes. Readers via [[readSkipping]] prune immediately after. */
  def analyze(spark: SparkSession, root: String, columns: Seq[String]): Unit =
    currentSnapshot(root).foreach { c =>
      val snapDir = Paths.get(root, c)
      FileSkipping.writeSidecar(snapDir,
        FileSkipping.collectStats(
          spark.sparkContext.hadoopConfiguration, snapDir, columns.toSet))
    }

  /** Live table contents through the file-skipping reader: pushed data
    * filters prune whole FILES against the `_graft_stats.json` sidecar
    * before any parquet footer is opened (partition pruning on `_dt` still
    * happens first, as with [[read]]). Falls back to the plain read when
    * no sidecar exists. Returns the DataFrame and the index, whose
    * `lastKept`/`lastSkipped` counters expose the most recent scan's
    * pruning decision for audits. */
  def readSkipping(spark: SparkSession, root: String)
      : Option[(DataFrame, Option[FileSkipping.SkippingFileIndex])] =
    currentSnapshot(root).map { c =>
      val snapDir = Paths.get(root, c)
      FileSkipping.readSidecar(snapDir) match {
        case None => (read(spark, root).get, None)
        case Some(stats) =>
          import org.apache.spark.sql.execution.datasources._
          import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
          // NB: Path(URI) keeps a directory URI's trailing slash, and a
          // trailing-slash root lists no leaf files — build from the
          // slash-stripped string form
          val path = new org.apache.hadoop.fs.Path(
            snapDir.toUri.toString.stripSuffix("/"))
          val inner = new InMemoryFileIndex(
            spark, Seq(path), Map.empty[String, String], None,
            FileStatusCache.getOrCreate(spark), None, None)
          val probe = spark.read.parquet(snapDir.toString)
          val partCols = inner.partitionSchema.fieldNames.toSet
          val dataSchema = org.apache.spark.sql.types.StructType(
            probe.schema.fields.filterNot(f => partCols.contains(f.name)))
          val idx = new FileSkipping.SkippingFileIndex(
            inner, spark, stats, dataSchema, snapDir.toUri)
          val relation = HadoopFsRelation(
            idx, inner.partitionSchema, dataSchema, None,
            new ParquetFileFormat, Map.empty[String, String])(spark)
          val df = spark.baseRelationToDataFrame(relation)
          val out = if (df.columns.contains(PartCol)) df.drop(PartCol) else df
          (out, Some(idx))
      }
    }

  /** Snapshot names present under `root`, oldest → newest. */
  def snapshots(root: String): Seq[String] =
    if (!Files.isDirectory(Paths.get(root))) Seq.empty
    else withList(Paths.get(root))(_.toSeq)
      .map(_.getFileName.toString).filter(_.startsWith("snap-")).sorted

  /** Time travel: read table contents as of a specific snapshot (every
    * merge/append/optimize publishes one — [[snapshots]] lists what's
    * still on disk). Hard-linked carryover means an old snapshot is a
    * complete, immutable view at O(files) metadata cost, readable until
    * [[vacuum]] drops it; None once it has been. */
  def readAt(spark: SparkSession, root: String, snap: String): Option[DataFrame] =
    if (!Files.isDirectory(Paths.get(root, snap))) None
    else Some {
      val df = spark.read.option("mergeSchema", "true").parquet(s"$root/$snap")
      if (df.columns.contains(PartCol)) df.drop(PartCol) else df
    }

  /** S9: VACUUM — drop snapshot dirs superseded for more than `keep`
    * generations. Hard links make deletion safe for newer snapshots. */
  def vacuum(root: String, keep: Int = 1): Unit = currentSnapshot(root).foreach { cur =>
    val curN = cur.stripPrefix("snap-").toLong
    withList(Paths.get(root))(_.toSeq)
      .filter(p => p.getFileName.toString.startsWith("snap-"))
      .filter(p => p.getFileName.toString.stripPrefix("snap-").toLong <= curN - keep - 1)
      .foreach(deleteRecursively)
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) withList(p)(_.toSeq).foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}
