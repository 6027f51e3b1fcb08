package graft.incremental

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.Cast
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** How a merge reacts when the batch's schema drifts from the live table's
  * — dbt's `on_schema_change` semantics
  * (`deepbook_margin_loan_borrowed.sql:1-8` relies on the dbt default).
  * All modes refuse lossy type changes; widenings (int→long, float→double,
  * anything `Cast.canUpCast` proves lossless) are applied by casting the
  * narrow side up. */
sealed trait OnSchemaChange
object OnSchemaChange {
  /** dbt's default: the live schema wins. Batch-only columns are dropped
    * (with a warning); a batch MISSING a live column is a hard error —
    * accidental drift fails fast instead of being NULL-absorbed. */
  case object Ignore extends OnSchemaChange
  /** Any drift is a hard [[SchemaDriftException]]. */
  case object Fail extends OnSchemaChange
  /** dbt `append_new_columns`: new batch columns join the table (NULL for
    * pre-evolution rows); columns the batch dropped survive (NULL for new
    * rows); common columns may widen losslessly. */
  case object AppendNewColumns extends OnSchemaChange
  /** dbt `sync_all_columns`: the batch schema becomes the table schema —
    * adds and REMOVES columns; common columns may widen but never narrow
    * (a long history is not truncated back to int). */
  case object SyncAllColumns extends OnSchemaChange
}

/** Typed refusal for schema drift a mode does not permit. */
final class SchemaDriftException(msg: String) extends RuntimeException(msg)

/** Typed refusal when two writers race the same table generation. */
final class ConcurrentWriteException(msg: String) extends RuntimeException(msg)

/** S6: the incremental MERGE sink — dbt `incremental_strategy='merge'` on a
  * composite `unique_key` (`deepbook_margin_loan_borrowed.sql:1-8`,
  * `DEVELOPMENT.md:123-132`) rebuilt without a Delta jar.
  *
  * Layout:
  * {{{
  *   <root>/_CURRENT                       // pointer: name of live snapshot
  *   <root>/snap-0000001/                  // immutable snapshot
  *     _graft_manifest.json                // file list + schema + stats
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
  * Metadata is manifest-routed ([[Manifest]]): every publish writes the
  * snapshot's file list + schema + file stats into one JSON object, and
  * reads (plain, time-travel, skipping, and the merge's own
  * touched-partition reads) are served from it — no directory listing, no
  * `mergeSchema` footer sweep. Directory walks remain only on the WRITE
  * path (enumerating just-written output) and as a fallback for
  * pre-manifest snapshots.
  *
  * S7 (append, `DEVELOPMENT.md:134-142`) = [[append]]: batch written next
  * to hard-linked prior files, no key semantics. S8 (OPTIMIZE,
  * `macros/dune_dbt_overrides/optimize_table.sql:1-5`) = [[optimize]]:
  * compacting snapshot rewrite. S9 (VACUUM, `vacuum_table.sql:1-5`) =
  * [[vacuum]]: drop superseded snapshot dirs (hard links make this safe —
  * deleting an old dir never invalidates files shared with newer ones).
  */
object SnapshotStore {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Hidden partition column materialized from a model's `partitionDate`. */
  val PartCol = "_dt"

  /** Change-data-feed columns (Delta CDF's `_change_type` /
    * `_commit_version` vocabulary; merge never deletes, so the types are
    * `insert` / `update_preimage` / `update_postimage`). */
  val ChangeTypeCol = "_change_type"
  val CommitVersionCol = "_commit_version"
  private val ChangesDir = "_changes"

  private def pointer(root: String) = Paths.get(root, "_CURRENT")

  def currentSnapshot(root: String): Option[String] = {
    val p = pointer(root)
    if (Files.exists(p)) Some(Files.readString(p).trim).filter(_.nonEmpty) else None
  }

  /** Live table contents (partition column stripped). */
  def read(spark: SparkSession, root: String): Option[DataFrame] =
    currentSnapshot(root).map { s =>
      val df = snapshotDf(spark, Paths.get(root, s))._1
      if (df.columns.contains(PartCol)) df.drop(PartCol) else df
    }

  /** [[read]] with the partition column KEPT (`_dt`, string) — for
    * readers that prune on it: a filter or join key on `_dt` reaches the
    * manifest file index as a partition filter (static or Spark's dynamic
    * partition pruning), so the scan lists only matching partitions.
    * The cell-partitioned ANN index serves through this (v18): probed
    * cells are partition values, and the serving scan touches
    * probes/cells of the table's files. */
  def readWithPartition(spark: SparkSession, root: String): Option[DataFrame] =
    currentSnapshot(root).map(s => snapshotDf(spark, Paths.get(root, s))._1)

  /** The snapshot's DataFrame (partition column KEPT) + whether it is
    * partitioned. Manifest-routed (no listing, no footer sweep); falls
    * back to the legacy `mergeSchema` listing read for pre-manifest
    * snapshots. */
  private def snapshotDf(spark: SparkSession, snapDir: Path): (DataFrame, Boolean) =
    Manifest.read(snapDir) match {
      case Some(m) =>
        (Manifest.toDataFrame(spark, snapDir, m, skipping = false)._1, m.partitioned)
      case None =>
        // mergeSchema: after an additive schema evolution, files written
        // before the new column appeared lack it; the union schema (with
        // NULL fill) is the correct read, and a single-footer guess is not
        val df = spark.read.option("mergeSchema", "true").parquet(snapDir.toString)
        (df, df.columns.contains(PartCol))
    }

  /** Live table schema (PartCol forced to its logical StringType). */
  private def liveSchema(spark: SparkSession, snapDir: Path): StructType =
    Manifest.read(snapDir).map(_.schema).getOrElse {
      val s = spark.read.option("mergeSchema", "true").parquet(snapDir.toString).schema
      StructType(s.fields.map(f =>
        if (f.name == PartCol) StructField(PartCol, StringType) else f))
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

  /** Manifest-then-pointer commit: enumerate the just-written snapshot
    * (write-side walk — O(new files), once per commit), attach fresh stats
    * and stats carried from the prior manifest (hard-linked carryover
    * keeps relative paths AND contents stable, so old entries stay valid;
    * rewritten files get fresh part-file names, so stale hits are
    * impossible), write the manifest, swap the pointer. A published
    * snapshot is therefore never observed without its manifest. */
  private def commit(root: String, snap: String, schema: StructType,
                     partitioned: Boolean,
                     freshStats: Map[String, FileSkipping.FileStats] = Map.empty,
                     buckets: Option[Manifest.Buckets] = None): Unit = {
    val snapDir = Paths.get(root, snap)
    val carried: Map[String, FileSkipping.FileStats] =
      currentSnapshot(root) // still the PRIOR pointer — not yet swapped
        .flatMap(c => Manifest.read(Paths.get(root, c))).map(_.statsMap)
        .getOrElse(Map.empty)
    val files = Manifest.collectFiles(snapDir).map { case (rel, size, mtime) =>
      Manifest.FileEntry(rel, size, mtime,
        freshStats.get(rel).orElse(carried.get(rel)))
    }
    Manifest.write(snapDir, schema, partitioned, files, buckets)
    publish(root, snap)
  }

  /** The LIVE table's declared bucket layout, if any — every write path
    * reads this so a layout declared once (merge `bucketBy`) is
    * preserved by all subsequent merges/deletes/compactions, the same
    * once-per-table contract as partitioning. */
  def liveBuckets(root: String): Option[Manifest.Buckets] =
    currentSnapshot(root)
      .flatMap(c => Manifest.read(Paths.get(root, c))).flatMap(_.buckets)

  /** Directory value Spark uses for a null partition key. */
  private val NullPart = "__HIVE_DEFAULT_PARTITION__"

  private def withList[T](dir: Path)(f: Iterator[Path] => T): T = {
    val s = Files.list(dir)
    try f(s.iterator().asScala) finally s.close()
  }

  /** `_dt=<value>` partition directories of a snapshot (legacy listing —
    * used only for pre-manifest snapshots and append's layout check). */
  private def partitionDirs(snapDir: Path): Seq[(String, Path)] =
    if (!Files.isDirectory(snapDir)) Seq.empty
    else withList(snapDir)(_.toSeq)
      .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith(s"$PartCol="))
      .map(p => (p.getFileName.toString.stripPrefix(s"$PartCol="), p))
      .sortBy(_._1)

  /** Whether the live snapshot is partitioned — manifest-first. */
  private def isPartitioned(snapDir: Path): Boolean =
    Manifest.read(snapDir).map(_.partitioned)
      .getOrElse(partitionDirs(snapDir).nonEmpty)

  /** Carry every data file under `src` into the same relative location
    * under `dst` via the configured [[FileIO]] — hard links (O(files)
    * metadata, zero data movement) or object-store-style per-file copies.
    * Legacy listing walk: manifest-era snapshots use [[linkFromManifest]]. */
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
        FileIO.get.carry(p, target)
      }
    finally walk.close()
  }

  /** Carry exactly the manifest-listed files of the partitions in
    * `values` from `src` into `dst` — the listing-free carryover. Under
    * [[FileIO.Copy]] this IS the object-store path: per-file server-side
    * copies issued straight off the manifest's list. */
  private def linkFromManifest(m: Manifest.TableManifest, values: Set[String],
                               src: Path, dst: Path): Unit =
    m.files.filter(_.partitionValue.exists(values)).foreach { f =>
      val target = dst.resolve(f.path)
      Files.createDirectories(target.getParent)
      FileIO.get.carry(src.resolve(f.path), target)
    }

  /** Bits of z-resolution per cluster column (256 quantile buckets). */
  private val ZBits = 8

  /** Z-ORDER key: each cluster column is quantile-bucketed into 2^ZBits
    * ranks by `repartitionByRange` + `spark_partition_id()` — Spark's own
    * RangePartitioner does the reservoir sampling, so ANY orderable type
    * (string, date, numeric) buckets correctly with no per-type code and
    * no skew from a uniform-width assumption (Delta's
    * `range_partition_id` approach). The per-column ranks then interleave
    * bitwise (bit `i` of column `j` → z-bit `k*i + (k-1-j)`) into one
    * LONG via codegen'd bit arithmetic — no UDF. Sorting by that key
    * gives every output file a small HYPERCUBE of the cluster-key space
    * instead of a thin slice of the first column, so per-file min/max
    * stats are selective on EVERY cluster column at once. Costs one extra
    * shuffle per cluster column (sampling + rank materialization) — a
    * maintenance-path price, same as Delta's OPTIMIZE ZORDER. */
  private def zOrdered(df: DataFrame, clusterBy: Seq[String], n: Int,
                       partitioned: Boolean): DataFrame = {
    val k = clusterBy.size
    var tmp = df
    clusterBy.zipWithIndex.foreach { case (c, j) =>
      tmp = tmp.repartitionByRange(1 << ZBits, col(c))
        .withColumn(s"_zb$j", spark_partition_id())
    }
    val z = (0 until ZBits).flatMap { i =>
      clusterBy.indices.map { j =>
        shiftleft(shiftright(col(s"_zb$j"), i).bitwiseAND(lit(1)),
          k * i + (k - 1 - j)).cast("long")
      }
    }.reduce(_.bitwiseOR(_))
    val keyed = tmp.withColumn("_zval", z)
    val parts =
      if (partitioned) Seq(col(PartCol), col("_zval")) else Seq(col("_zval"))
    keyed.repartitionByRange(n, parts: _*)
      .sortWithinPartitions(parts: _*)
      .drop(clusterBy.indices.map(j => s"_zb$j") :+ "_zval": _*)
  }

  /** Transient directory column carrying each row's bucket id through
    * the write (never part of the data schema — partitionBy columns are
    * not stored in the files). */
  private val BucketCol = "_bucket"

  /** Move every data file out of its transient `_bucket=<b>` directory
    * into the parent, renamed with the `_<b>%05d` suffix
    * `BucketingUtils.getBucketId` parses on the read side, and drop the
    * emptied dirs. The bucket id comes from the DIRECTORY name — i.e.
    * from the row-level `pmod(hash(cols), n)` column partitionBy grouped
    * on — never from task indices, which the planner is free to rewire
    * (an upstream shuffle on the same keys elides the repartition
    * exchange, and AQE may coalesce what remains; both break any
    * "task index == bucket id" assumption). */
  private def promoteBucketDirs(snapDir: Path, n: Int): Unit = {
    val walk = Files.walk(snapDir)
    val bucketDirs =
      try walk.iterator().asScala.filter(p => Files.isDirectory(p) &&
        p.getFileName.toString.startsWith(s"$BucketCol=")).toVector
      finally walk.close()
    bucketDirs.foreach { d =>
      val bid = d.getFileName.toString.stripPrefix(s"$BucketCol=").toInt
      require(bid >= 0 && bid < n, s"bucket dir $d outside range 0..${n - 1}")
      withList(d)(_.toVector)
        .filter(f => Files.isRegularFile(f) &&
          f.getFileName.toString.endsWith(".parquet"))
        .foreach { f =>
          val stamped = f.getFileName.toString.stripSuffix(".parquet") +
            f"_$bid%05d.parquet"
          Files.move(f, d.getParent.resolve(stamped))
        }
      deleteRecursively(d)
    }
  }

  private def writeSnapshot(root: String, df: DataFrame, partitioned: Boolean,
                            compactTo: Option[Int],
                            clusterBy: Seq[String] = Nil,
                            zorder: Boolean = false,
                            buckets: Option[Manifest.Buckets] = None): String = {
    require(buckets.isEmpty || (clusterBy.isEmpty && !zorder),
      "bucketed layout and clusterBy/zorder are mutually exclusive")
    val snap = nextSnapshotName(root)
    // Generation fencing: the snapshot name is claimed ATOMICALLY before
    // any data is written, so two writers that both read the same
    // _CURRENT cannot both produce snap-N — the loser fails HERE, before
    // spending a write and before either can clobber the other's files
    // (the same putIfAbsent idea as a commit log's version file). The
    // parallel DAG runner never races (one table per model); this guards
    // accidental same-table concurrency. A dir left by a CRASHED writer
    // also lands here: it is unpublished (the pointer never moved), so
    // deleting it is the safe recovery.
    try Files.createDirectory(Paths.get(root, snap))
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new ConcurrentWriteException(
          s"snapshot generation $snap at $root already exists: concurrent " +
            "writer, or the orphan of a crashed one (unpublished - safe to delete)")
    }
    // Bucketed layout: each row's bucket id is computed EXPLICITLY as
    // `pmod(hash(cols), n)` — the same Murmur3(seed 42) id
    // `HashPartitioning(cols, n).partitionIdExpression` derives, which is
    // what lets the manifest's BucketSpec claim HashPartitioning on read
    // — and written as a transient partitionBy directory, then promoted
    // into the bucket-suffixed file names. Grouping by DIRECTORY makes
    // the id row-accurate by construction; it never depends on task
    // indices (which an elided/coalesced exchange rewires — see
    // promoteBucketDirs). The explicit repartition on the bucket keys is
    // only a file-count optimization: it aligns tasks with buckets so
    // each bucket dir gets ~one file instead of one per task.
    buckets.foreach { bk =>
      val withB = df.withColumn(BucketCol,
        pmod(hash(bk.cols.map(col): _*), lit(bk.n)))
      val dirCols = if (partitioned) Seq(PartCol, BucketCol) else Seq(BucketCol)
      // directory columns lead the sort (satisfies the writer's required
      // ordering so Spark stacks no non-stable sort of its own — same
      // reasoning as the clusterBy sort below), then the declared
      // within-file sort order
      val sorted = withB.repartition(bk.n, bk.cols.map(col): _*)
        .sortWithinPartitions((dirCols ++ bk.sortCols).map(col): _*)
      sorted.write.mode(SaveMode.Overwrite)
        .partitionBy(dirCols: _*).parquet(s"$root/$snap")
      promoteBucketDirs(Paths.get(root, snap), bk.n)
      return snap
    }
    val arranged = (partitioned, compactTo) match {
      // z-order: interleaved quantile ranks — each file gets a hypercube
      // of the cluster-key space, selective on EVERY cluster column
      case (p, Some(n)) if zorder && clusterBy.size >= 2 =>
        val out = zOrdered(df, clusterBy, n, p)
        val w0 = out.write.mode(SaveMode.Overwrite)
        (if (p) w0.partitionBy(PartCol) else w0).parquet(s"$root/$snap")
        return snap
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

  // ---- schema evolution ---------------------------------------------------

  /** The output schema a merge must produce, given the batch's and the
    * live table's schemas and the drift policy. Equal shapes (names +
    * types, order-insensitive) short-circuit to the live schema; any
    * drift is logged, then resolved or refused per `mode`. */
  private[incremental] def resolveTarget(batch: StructType, live: StructType,
                                         mode: OnSchemaChange): StructType = {
    val b = batch.fields.map(f => f.name -> f.dataType).toMap
    val l = live.fields.map(f => f.name -> f.dataType).toMap
    if (b == l) return live
    val added = batch.fieldNames.filterNot(l.contains)
    val removed = live.fieldNames.filterNot(b.contains)
    val retyped = live.fields.collect {
      case f if b.get(f.name).exists(_ != f.dataType) =>
        s"${f.name}: ${f.dataType.simpleString}->${b(f.name).simpleString}"
    }
    val drift = s"schema drift vs live table (mode=$mode): " +
      s"added=[${added.mkString(",")}] removed=[${removed.mkString(",")}] " +
      s"retyped=[${retyped.mkString(", ")}]"
    log.warn(drift)
    // lossless resolution of a common column's type: equal, or widen the
    // narrow side up (int->long, float->double, ... — whatever canUpCast
    // proves). History is never narrowed.
    def widened(name: String, liveT: DataType, batchT: DataType): DataType =
      if (liveT == batchT) liveT
      else if (Cast.canUpCast(liveT, batchT)) batchT
      else if (Cast.canUpCast(batchT, liveT)) liveT
      else throw new SchemaDriftException(
        s"column '$name' cannot evolve ${liveT.simpleString} -> " +
          s"${batchT.simpleString} losslessly; $drift")
    // Every drift-path target is fully nullable: evolution means SOME file
    // lacks SOME column, and the vectorized parquet reader refuses to
    // NULL-fill a missing column declared non-nullable.
    def nullable(s: StructType): StructType =
      StructType(s.fields.map(_.copy(nullable = true)))
    mode match {
      case OnSchemaChange.Fail => throw new SchemaDriftException(drift)
      case OnSchemaChange.Ignore =>
        if (removed.nonEmpty) throw new SchemaDriftException(
          s"batch lacks live column(s) [${removed.mkString(",")}] and " +
            s"on_schema_change=ignore refuses to NULL-absorb the gap; $drift")
        // batch-side types must fit the live schema (upcast on write only)
        live.fields.foreach { f =>
          b.get(f.name).foreach { bt =>
            if (bt != f.dataType && !Cast.canUpCast(bt, f.dataType))
              throw new SchemaDriftException(
                s"column '${f.name}' batch type ${bt.simpleString} does not " +
                  s"fit live ${f.dataType.simpleString} under ignore; $drift")
          }
        }
        live // added columns silently dropped (dbt parity) — warned above
      case OnSchemaChange.AppendNewColumns =>
        nullable(StructType(live.fields.map { f =>
          b.get(f.name) match {
            case Some(bt) => StructField(f.name, widened(f.name, f.dataType, bt))
            case None     => f // dropped by batch: survives, NULL for new rows
          }
        } ++ batch.fields.filterNot(f => l.contains(f.name))))
      case OnSchemaChange.SyncAllColumns =>
        nullable(StructType(batch.fields.map { f =>
          l.get(f.name) match {
            case Some(lt) => StructField(f.name, widened(f.name, lt, f.dataType))
            case None     => f
          }
        })) // live-only columns dropped — sync means the batch schema wins
    }
  }

  /** Project `df` onto `target`: present columns cast (lossless by
    * construction — [[resolveTarget]] refused anything else), missing
    * columns NULL-filled. */
  private def conform(df: DataFrame, target: StructType): DataFrame = {
    val present = df.columns.toSet
    df.select(target.fields.toSeq.map { f =>
      if (present(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
  }

  // ---- change data feed ---------------------------------------------------

  /** The change rows one merge commit produces, both sides already
    * conformed to the commit's target schema. `oldC` is the prior rows the
    * merge actually read — for a partition-scoped merge, the touched
    * partitions only, which is COMPLETE for change capture because keys
    * are partition-stable (the same contract the merge itself relies on:
    * a re-delivered key lands in the same `_dt`, so a batch key can never
    * collide with a row in an untouched partition). Matched keys emit the
    * pre- and post-image (Delta CDF's merge semantics: every matched row
    * is an update, content-diffing is the consumer's concern); unmatched
    * batch keys emit `insert`. */
  private def changeRows(newC: DataFrame, oldC: Option[DataFrame],
                         keys: Seq[String]): DataFrame = oldC match {
    case None => newC.withColumn(ChangeTypeCol, lit("insert"))
    case Some(old) =>
      val oldKeys = old.select(keys.map(col): _*)
      old.join(newC.select(keys.map(col): _*), keys, "left_semi")
        .withColumn(ChangeTypeCol, lit("update_preimage"))
        .unionByName(newC.join(oldKeys, keys, "left_semi")
          .withColumn(ChangeTypeCol, lit("update_postimage")))
        .unionByName(newC.join(oldKeys, keys, "left_anti")
          .withColumn(ChangeTypeCol, lit("insert")))
  }

  /** Persist a commit's change rows under `<root>/_changes/<snap>/` —
    * a SIBLING of the snapshot dirs, so data reads (manifest file lists,
    * legacy directory reads, hard-link carryover) never see them. Written
    * after the snapshot's data files and before the pointer swap: a
    * published generation always has its feed; a crashed writer's orphan
    * feed sits next to its unpublished snapshot dir and shares its
    * recovery (delete both). Overwrite mode makes the retry safe. */
  private def writeChanges(root: String, snap: String, changes: DataFrame): Unit =
    changes.drop(PartCol)
      .withColumn(CommitVersionCol, lit(snap.stripPrefix("snap-").toLong))
      .write.mode(SaveMode.Overwrite).parquet(s"$root/$ChangesDir/$snap")

  /** The change feed of one published generation, if it was merged with
    * `changeFeed = true` and [[vacuum]] has not dropped it. */
  def changesFor(spark: SparkSession, root: String, snap: String): Option[DataFrame] = {
    val dir = Paths.get(root, ChangesDir, snap)
    if (Files.isDirectory(dir)) Some(spark.read.parquet(dir.toString)) else None
  }

  /** All change rows with `_commit_version > sinceVersion`, oldest feed's
    * schema widened to the newest by name (additive evolution mid-feed
    * NULL-fills the old commits) — the incremental-consumer read
    * (`table_changes(t, since)` in Delta terms). None when no generation
    * in range published a feed. */
  def changes(spark: SparkSession, root: String,
              sinceVersion: Long = 0L): Option[DataFrame] = {
    val dir = Paths.get(root, ChangesDir)
    if (!Files.isDirectory(dir)) return None
    val feeds = withList(dir)(_.toSeq)
      .map(_.getFileName.toString).filter(_.startsWith("snap-")).sorted
      .filter(_.stripPrefix("snap-").toLong > sinceVersion)
      .map(s => spark.read.parquet(dir.resolve(s).toString))
    feeds.reduceOption(_.unionByName(_, allowMissingColumns = true))
  }

  // ---- merge --------------------------------------------------------------

  /** Upsert `batch` into the table at `root` on composite key `keys`.
    *
    * In-batch duplicate keys are collapsed (last-write-wins is undefined in
    * Trino MERGE; we keep one arbitrary row, matching dbt's assumption that
    * the model SELECT is already key-unique). With `partitionDate`, only
    * batch-touched date partitions are read/rewritten; the rest hard-link.
    * `onSchemaChange` governs schema drift (default mirrors dbt's
    * `ignore`: live schema wins, missing columns fail fast — intended
    * evolution passes [[OnSchemaChange.AppendNewColumns]] or
    * [[OnSchemaChange.SyncAllColumns]] explicitly). `changeFeed = true`
    * additionally publishes the commit's row-level changes (Delta CDF
    * analog) readable via [[changesFor]]/[[changes]]; off by default —
    * the feed costs one extra key join over the touched partitions.
    * `bucketBy` declares a persistent bucket layout at BOOTSTRAP (first
    * merge); thereafter the live manifest's layout wins and every write
    * path preserves it (see [[liveBuckets]]) — re-declaring a different
    * layout on an existing table is refused rather than silently mixing
    * bucket functions across files.
    */
  /** Opt-in phase timing for the store-tax ledger (`GRAFT_STORE_TIMING=1`
    * in the env): prints per-phase wall seconds to stderr so the
    * protocol-ledger constant can be attributed (SCALE.md §7n). Zero
    * cost when unset. */
  private val timingOn = sys.env.get("GRAFT_STORE_TIMING").contains("1")
  private def phase[A](name: String)(body: => A): A =
    if (!timingOn) body
    else {
      val t0 = System.nanoTime()
      val r = body
      System.err.println(
        f"[store-timing] $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
  /** Timing-mode companion: file count of a just-written snapshot. */
  private def reportFiles(root: String, snap: String): Unit =
    if (timingOn) {
      val walk = java.nio.file.Files.walk(Paths.get(root, snap))
      val n = try walk.filter(p => p.toString.endsWith(".parquet")).count()
              finally walk.close() // walk holds directory handles until closed
      System.err.println(s"[store-files] $snap $n files")
    }

  def merge(spark: SparkSession, root: String, batch: DataFrame,
            keys: Seq[String], partitionDate: Option[Column] = None,
            compactTo: Option[Int] = None,
            onSchemaChange: OnSchemaChange = OnSchemaChange.Ignore,
            changeFeed: Boolean = false,
            bucketBy: Option[Manifest.Buckets] = None): Unit = {
    Files.createDirectories(Paths.get(root))
    val live = liveBuckets(root)
    require(bucketBy.isEmpty || live.isEmpty || bucketBy == live,
      s"table at $root already has bucket layout $live; cannot re-declare as $bucketBy")
    val bk = live.orElse(bucketBy)
    val cur = currentSnapshot(root)
    // MATERIALIZE THE SOURCE once whenever the merge will consume the
    // batch lineage more than once (every non-bootstrap path re-reads it
    // for the touched-partition collect / survivor anti-join / change
    // rows; a change-feed bootstrap reads it twice) — the same
    // materialize-source step Delta's MERGE performs, for the same two
    // reasons: (a) an expensive upstream build otherwise re-executes per
    // consumer — measured at ~40% of the fixture-scale merge constant
    // (SCALE.md §7n) — and (b) a non-deterministic batch evaluated twice
    // could commit rows its own change feed never saw. Bootstrap without
    // a feed stays lazy: single consumer, a checkpoint would only add
    // cost. Blocks are GC-released when the frame dies (ContextCleaner).
    val newDf0 = batch.dropDuplicates(keys)
    val newDf =
      if (cur.nonEmpty || changeFeed)
        phase("merge.materialize-source")(newDf0.localCheckpoint())
      else newDf0
    (cur, partitionDate) match {
      case (None, None) =>
        val snap = writeSnapshot(root, newDf, partitioned = false, compactTo,
          buckets = bk)
        if (changeFeed) writeChanges(root, snap, changeRows(newDf, None, keys))
        commit(root, snap, newDf.schema, partitioned = false, buckets = bk)

      case (None, Some(pd)) =>
        val batchP = newDf.withColumn(PartCol, pd.cast(StringType))
        val snap = phase("merge.bootstrap-write") {
          writeSnapshot(root, batchP, partitioned = true, compactTo,
            buckets = bk)
        }
        reportFiles(root, snap)
        if (changeFeed) writeChanges(root, snap, changeRows(batchP, None, keys))
        commit(root, snap, batchP.schema, partitioned = true, buckets = bk)

      case (Some(c), None) =>
        // Unpartitioned fallback: whole-table rewrite (only sensible for
        // small dimension-like tables; every DAG model declares a date).
        val snapDir = Paths.get(root, c)
        val prev = snapshotDf(spark, snapDir)._1
        val target = resolveTarget(newDf.schema, liveSchema(spark, snapDir),
          onSchemaChange)
        val survivors = prev.join(newDf.select(keys.map(col): _*), keys, "left_anti")
        val merged = conform(newDf, target).unionByName(conform(survivors, target))
        val snap = writeSnapshot(root, merged, partitioned = false, compactTo,
          buckets = bk)
        if (changeFeed) writeChanges(root, snap,
          changeRows(conform(newDf, target), Some(conform(prev, target)), keys))
        commit(root, snap, target, partitioned = false, buckets = bk)

      case (Some(c), Some(pd)) =>
        val snapDir = Paths.get(root, c)
        val batchP = newDf.withColumn(PartCol, pd.cast(StringType))
        val manifestOpt = Manifest.read(snapDir).filter(_.partitioned)
        val partVals: Seq[String] = manifestOpt match {
          case Some(m) => m.partitionValues
          case None    => partitionDirs(snapDir).map(_._1)
        }
        if (partVals.isEmpty) {
          // Migration path: the live snapshot is unpartitioned (e.g.
          // bootstrapped without a partitionDate). A dir-scoped merge
          // would see zero `_dt=` dirs and silently drop every prior
          // row — instead fall back to one whole-table rewrite that
          // PRODUCES the partitioned layout; subsequent merges are
          // partition-scoped.
          val prev = snapshotDf(spark, snapDir)._1
          val target = resolveTarget(batchP.schema,
            liveSchema(spark, snapDir).add(StructField(PartCol, StringType)),
            onSchemaChange)
          val survivors = prev.join(newDf.select(keys.map(col): _*), keys, "left_anti")
            .withColumn(PartCol, pd.cast(StringType))
          val merged = conform(batchP, target).unionByName(conform(survivors, target))
          val snap = writeSnapshot(root, merged, partitioned = true, compactTo,
            buckets = bk)
          if (changeFeed) {
            val prevP = prev.withColumn(PartCol, pd.cast(StringType))
            writeChanges(root, snap,
              changeRows(conform(batchP, target), Some(conform(prevP, target)), keys))
          }
          commit(root, snap, target, partitioned = true, buckets = bk)
        } else {
          val target = resolveTarget(batchP.schema, liveSchema(spark, snapDir),
            onSchemaChange)
          // The touched-partition list is tiny (bounded by the lookback /
          // backfill window — days, not rows); collecting it to the driver
          // is the same metadata-sized step a table format's commit log
          // does. A null date lands in Spark's null-partition dir.
          val touched = phase("merge.touched-collect") {
            batchP.select(PartCol).distinct().collect()
              .map(r => if (r.isNullAt(0)) NullPart else r.getString(0)).toSet
          }
          val (affectedVals, untouchedVals) = partVals.partition(touched)
          // Read ONLY touched partitions — explicit manifest file lists
          // (zero listing) when available, per-dir reads otherwise.
          val affectedOld = affectedVals.map { v =>
            val dtVal = if (v == NullPart) lit(null).cast(StringType) else lit(v)
            val df = manifestOpt match {
              case Some(m) =>
                val dataSchema = StructType(
                  m.schema.fields.filterNot(_.name == PartCol))
                val paths = m.filesOfPartition(v)
                  .map(f => snapDir.resolve(f.path).toString)
                spark.read.schema(dataSchema).parquet(paths: _*)
              case None =>
                spark.read.parquet(snapDir.resolve(s"$PartCol=$v").toString)
            }
            df.withColumn(PartCol, dtVal)
          }.reduceOption(_.unionByName(_, allowMissingColumns = true))
          val out = affectedOld match {
            case None => conform(batchP, target)
            case Some(old) =>
              val survivors = old.join(batchP.select(keys.map(col): _*), keys, "left_anti")
              conform(batchP, target).unionByName(conform(survivors, target))
          }
          val snap = phase("merge.write-snapshot") {
            writeSnapshot(root, out, partitioned = true, compactTo,
              buckets = bk)
          }
          if (changeFeed) phase("merge.write-changes") {
            writeChanges(root, snap,
              changeRows(conform(batchP, target),
                affectedOld.map(conform(_, target)), keys))
          }
          phase("merge.links") {
            manifestOpt match {
              case Some(m) =>
                linkFromManifest(m, untouchedVals.toSet, snapDir, Paths.get(root, snap))
              case None =>
                untouchedVals.foreach { v =>
                  linkInto(snapDir.resolve(s"$PartCol=$v"),
                    Paths.get(root, snap, s"$PartCol=$v"))
                }
            }
          }
          phase("merge.commit") {
            commit(root, snap, target, partitioned = true, buckets = bk)
          }
        }
    }
  }

  /** Row-level DELETE — the retention/GDPR operation the reference
    * delegates to Delta (`DELETE FROM t WHERE ...`). Partition-scoped like
    * [[merge]]: one scan finds the `_dt` partitions holding matches, only
    * those rewrite (survivors = `filter(!predicate)`), every untouched
    * partition hard-links across, and a predicate with NO matches
    * publishes nothing. With `changeFeed = true` the matched rows are
    * published as `delete` change rows (Delta CDF's third change type),
    * so a downstream consumer can retract them instead of diffing
    * snapshots. At 100 TB a retention sweep bounded to a date range
    * costs O(matching partitions), not O(table). NULL-predicate rows are
    * KEPT (SQL DELETE semantics: only `true` deletes). */
  def delete(spark: SparkSession, root: String, predicate: Column,
             changeFeed: Boolean = false): Unit = {
    val keep = !coalesce(predicate, lit(false))
    deleteWhere(spark, root,
      matchedOf = _.filter(coalesce(predicate, lit(false))),
      survivorsOf = _.filter(keep),
      changeFeed)
  }

  /** KEYED row-level DELETE — `DELETE FROM t WHERE (keys) IN (SELECT keys
    * FROM keyFrame)`, the frame-driven takedown a right-to-be-forgotten
    * sweep needs at scale: the doomed rows are named by a DataFrame (an
    * upstream computation — retired documents, isolated vertices, a legal
    * hold list), never collected to the driver or re-encoded as an
    * `isin` literal whose expression tree grows with the batch. Matched
    * rows come from a distributed LEFT SEMI join against the key frame,
    * survivors from the LEFT ANTI twin; everything else — touched-partition
    * scoping, hard-link carry of untouched partitions, CDC `delete`
    * retractions, no-match ⇒ publish nothing — is [[delete]]'s machinery
    * verbatim (one shared body, no drift). The key frame is deduped and
    * materialized ONCE up front: it feeds the matched scan, the survivor
    * anti-join and (with a feed) the change rows, and a non-deterministic
    * key frame evaluated per-consumer could delete rows its own change
    * feed never saw — merge's materialize-source argument.
    * NULL key semantics follow SQL IN: a NULL key never matches (those
    * rows are KEPT), mirroring [[delete]]'s NULL-predicate rule. */
  def deleteKeys(spark: SparkSession, root: String, keys: Seq[String],
                 keyFrame: DataFrame, changeFeed: Boolean = false): Unit = {
    require(keys.nonEmpty, "deleteKeys needs at least one key column")
    val kf = keyFrame.select(keys.map(col): _*).na.drop("any")
      .dropDuplicates(keys).localCheckpoint()
    deleteWhere(spark, root,
      matchedOf = _.join(kf, keys, "left_semi"),
      survivorsOf = _.join(kf, keys, "left_anti"),
      changeFeed)
  }

  /** Shared body of [[delete]] / [[deleteKeys]]: `matchedOf` names the
    * doomed rows of a frame, `survivorsOf` its keepers — the two must be
    * complementary over non-NULL rows (matched rows feed the touched-
    * partition scope and the CDC retractions; survivors rewrite the
    * affected partitions). */
  private def deleteWhere(spark: SparkSession, root: String,
                          matchedOf: DataFrame => DataFrame,
                          survivorsOf: DataFrame => DataFrame,
                          changeFeed: Boolean): Unit =
    currentSnapshot(root).foreach { c =>
      val snapDir = Paths.get(root, c)
      val (df, partitioned) = snapshotDf(spark, snapDir)
      val schema = liveSchema(spark, snapDir)
      val bk = liveBuckets(root)
      if (!partitioned) {
        val matched = matchedOf(df)
        if (matched.limit(1).count() > 0) {
          val snap = writeSnapshot(root, survivorsOf(df), partitioned = false, None,
            buckets = bk)
          if (changeFeed) writeChanges(root, snap,
            matched.withColumn(ChangeTypeCol, lit("delete")))
          commit(root, snap, schema, partitioned = false, buckets = bk)
        }
      } else {
        val matched = matchedOf(df)
        // touched-partition list: metadata-sized (bounded by the predicate's
        // date footprint — a retention sweep touches old days only)
        val touched = matched.select(PartCol).distinct().collect()
          .map(r => if (r.isNullAt(0)) NullPart else r.getString(0)).toSet
        if (touched.nonEmpty) {
          val manifestOpt = Manifest.read(snapDir).filter(_.partitioned)
          val partVals: Seq[String] = manifestOpt match {
            case Some(m) => m.partitionValues
            case None    => partitionDirs(snapDir).map(_._1)
          }
          val (affectedVals, untouchedVals) = partVals.partition(touched)
          val affected = affectedVals.map { v =>
            val dtVal = if (v == NullPart) lit(null).cast(StringType) else lit(v)
            val part = manifestOpt match {
              case Some(m) =>
                val dataSchema = StructType(
                  m.schema.fields.filterNot(_.name == PartCol))
                val paths = m.filesOfPartition(v)
                  .map(f => snapDir.resolve(f.path).toString)
                spark.read.schema(dataSchema).parquet(paths: _*)
              case None =>
                spark.read.parquet(snapDir.resolve(s"$PartCol=$v").toString)
            }
            part.withColumn(PartCol, dtVal)
          }.reduce(_.unionByName(_, allowMissingColumns = true))
          val snap = writeSnapshot(root, survivorsOf(affected),
            partitioned = true, None, buckets = bk)
          manifestOpt match {
            case Some(m) =>
              linkFromManifest(m, untouchedVals.toSet, snapDir, Paths.get(root, snap))
            case None =>
              untouchedVals.foreach { v =>
                linkInto(snapDir.resolve(s"$PartCol=$v"),
                  Paths.get(root, snap, s"$PartCol=$v"))
              }
          }
          if (changeFeed) writeChanges(root, snap,
            matched.withColumn(ChangeTypeCol, lit("delete")))
          commit(root, snap, schema, partitioned = true, buckets = bk)
        }
      }
    }

  /** dbt-spark's `incremental_strategy='insert_overwrite'` — the THIRD
    * strategy beside merge (S6) and append (S7), and dbt-on-Spark's
    * default: every date partition present in the batch is replaced
    * WHOLESALE (stale rows in a recomputed partition disappear — no key
    * semantics, no anti-join), untouched partitions hard-link across.
    * The right sink when the model RECOMPUTES whole partitions (the
    * daily-fact lookback shape): it skips merge's read + anti-join of
    * the touched partitions entirely, making the incremental write
    * O(batch) instead of O(batch + touched-partition history). Schema
    * drift follows the same [[OnSchemaChange]] policy as merge, resolved
    * against the live schema. */
  def insertOverwrite(spark: SparkSession, root: String, batch: DataFrame,
                      partitionDate: Column, compactTo: Option[Int] = None,
                      onSchemaChange: OnSchemaChange = OnSchemaChange.Ignore): Unit = {
    Files.createDirectories(Paths.get(root))
    val bk = liveBuckets(root)
    val batchP = batch.withColumn(PartCol, partitionDate.cast(StringType))
    currentSnapshot(root) match {
      case None =>
        val snap = writeSnapshot(root, batchP, partitioned = true, compactTo,
          buckets = bk)
        commit(root, snap, batchP.schema, partitioned = true, buckets = bk)
      case Some(c) =>
        val snapDir = Paths.get(root, c)
        require(isPartitioned(snapDir),
          s"insert_overwrite needs a partitioned table at $root")
        val target = resolveTarget(batchP.schema, liveSchema(spark, snapDir),
          onSchemaChange)
        // touched-partition list: metadata-sized, same collect as merge
        val touched = batchP.select(PartCol).distinct().collect()
          .map(r => if (r.isNullAt(0)) NullPart else r.getString(0)).toSet
        val snap = writeSnapshot(root, conform(batchP, target),
          partitioned = true, compactTo, buckets = bk)
        val manifestOpt = Manifest.read(snapDir).filter(_.partitioned)
        val untouched = (manifestOpt match {
          case Some(m) => m.partitionValues
          case None    => partitionDirs(snapDir).map(_._1)
        }).filterNot(touched)
        manifestOpt match {
          case Some(m) =>
            linkFromManifest(m, untouched.toSet, snapDir, Paths.get(root, snap))
          case None =>
            untouched.foreach { v =>
              linkInto(snapDir.resolve(s"$PartCol=$v"),
                Paths.get(root, snap, s"$PartCol=$v"))
            }
        }
        commit(root, snap, target, partitioned = true, buckets = bk)
    }
  }

  /** Union of two schemas by name — `b` wins on type, `a`-only fields keep
    * their place (append's manifest must keep hard-linked pre-existing
    * columns readable). */
  private def schemaUnion(a: StructType, b: StructType): StructType = {
    val bByName = b.fields.map(f => f.name -> f).toMap
    val aNames = a.fieldNames.toSet
    StructType(a.fields.map(f => bByName.getOrElse(f.name, f)) ++
      b.fields.filterNot(f => aNames(f.name)))
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
    val curPartitioned = cur.exists(c => isPartitioned(Paths.get(root, c)))
    require(cur.isEmpty || curPartitioned == partitionDate.isDefined,
      s"append layout mismatch at $root: table is " +
        s"${if (curPartitioned) "partitioned" else "flat"} but partitionDate is " +
        s"${if (partitionDate.isDefined) "set" else "absent"}")
    val out = partitionDate match {
      case Some(pd) => batch.withColumn(PartCol, pd.cast(StringType))
      case None     => batch
    }
    // bucketed append: the NEW batch's files are bucketed and stamped by
    // writeSnapshot (which runs before the prior files link in, so the
    // stamping walk sees only them); each append adds one file per
    // non-empty bucket — multi-file buckets are valid reads, and
    // OPTIMIZE re-compacts to one per bucket
    val bk = liveBuckets(root)
    val snap = writeSnapshot(root, out, partitionDate.isDefined, compactTo,
      buckets = bk)
    cur.foreach(c => linkInto(Paths.get(root, c), Paths.get(root, snap)))
    val schema = cur.map(c => schemaUnion(liveSchema(spark, Paths.get(root, c)),
      out.schema)).getOrElse(out.schema)
    commit(root, snap, schema, partitionDate.isDefined, buckets = bk)
  }

  /** S8: OPTIMIZE — compact the live snapshot's small files into
    * `filesPerPartition` files per date dir (or total, if unpartitioned),
    * published as a new snapshot. `clusterBy` additionally sorts rows
    * within each output file (Delta's `OPTIMIZE ... ZORDER BY` for the
    * single-key case): scans filtered on those keys then skip whole row
    * groups via parquet min/max stats instead of reading every compacted
    * file — the difference between O(partition) and O(matching row
    * groups) for point lookups at 100 TB. With `zorder = true` and two or
    * more cluster keys, files are laid out along the Z-curve of the keys'
    * quantile ranks ([[zOrdered]]) instead of lexicographically — per-file
    * stats become selective on EVERY cluster column, not just a prefix
    * (Delta's `OPTIMIZE ... ZORDER BY`). */
  def optimize(spark: SparkSession, root: String, filesPerPartition: Int = 1,
               clusterBy: Seq[String] = Nil, zorder: Boolean = false): Unit =
    currentSnapshot(root).foreach { c =>
      val snapDir = Paths.get(root, c)
      val (df, partitioned) = snapshotDf(spark, snapDir)
      // a bucketed table's compaction unit IS the bucket: re-hash into n
      // bucket files (collapsing any multi-file buckets appends left) and
      // keep the declared layout; clusterBy/zorder stay refused on it
      val bk = liveBuckets(root)
      require(bk.isEmpty || (clusterBy.isEmpty && !zorder),
        s"table at $root is bucketed; clusterBy/zorder would destroy its layout")
      val snap =
        writeSnapshot(root, df, partitioned, Some(filesPerPartition), clusterBy,
          zorder, buckets = bk)
      // file-level min/max stats for the cluster keys, from footers only
      // (O(files) metadata), straight into the new snapshot's manifest
      val fresh =
        if (clusterBy.isEmpty) Map.empty[String, FileSkipping.FileStats]
        else FileSkipping.collectStats(
          spark.sparkContext.hadoopConfiguration, Paths.get(root, snap),
          clusterBy.toSet)
      commit(root, snap, df.schema, partitioned, fresh, buckets = bk)
    }

  /** S8 variant: BIN-PACKING compaction — Delta's plain `OPTIMIZE` (no
    * ZORDER) semantics. Only files smaller than `targetFileBytes / 2` are
    * rewritten, coalesced per partition into ~`targetFileBytes` outputs;
    * every already-compact file is carried into the new snapshot by hard
    * link WITH its manifest stats (same relative path ⇒ the commit's
    * stats carryover stays valid). Cost is therefore O(small-file bytes),
    * not O(table): at 100 TB, a nightly compaction pass after a day of
    * micro-batch appends touches the day's small files and never rewrites
    * the compacted history — the property that makes frequent OPTIMIZE
    * affordable at all. A partition with fewer than two small files is
    * left alone; a table with nothing to compact publishes nothing.
    * Full-rewrite clustering (`clusterBy`) stays on [[optimize]] — global
    * clustering is inherently O(partition), so the two modes are distinct
    * on purpose, as in Delta. Pre-manifest snapshots fall back to the
    * full rewrite (no per-file sizes to plan from). */
  def optimizeBinPack(spark: SparkSession, root: String,
                      targetFileBytes: Long = 128L << 20): Unit =
    currentSnapshot(root).foreach { c =>
      val snapDir = Paths.get(root, c)
      // bin-packing coalesces arbitrary small files together, which would
      // mix rows across bucket ids — a bucketed table compacts via
      // [[optimize]] instead, whose unit is the bucket
      if (liveBuckets(root).isDefined) { optimize(spark, root); return }
      Manifest.read(snapDir) match {
        case None => optimize(spark, root)
        case Some(m) =>
          val minBytes = targetFileBytes / 2
          val dataSchema = StructType(m.schema.fields.filterNot(_.name == PartCol))
          val carried = Seq.newBuilder[Manifest.FileEntry]
          val rewrites = Seq.newBuilder[DataFrame]
          m.files.groupBy(_.partitionValue).foreach { case (pv, files) =>
            val (small, big) = files.partition(_.size < minBytes)
            if (small.size >= 2) {
              val n = math.max(1, math.ceil(
                small.map(_.size).sum.toDouble / targetFileBytes).toInt)
              val df = spark.read.schema(dataSchema)
                .parquet(small.map(f => snapDir.resolve(f.path).toString): _*)
                .repartition(n)
              rewrites += (pv match {
                case Some(v) =>
                  val dtVal = if (v == NullPart) lit(null).cast(StringType) else lit(v)
                  df.withColumn(PartCol, dtVal)
                case None => df
              })
              carried ++= big
            } else carried ++= files
          }
          val toRewrite = rewrites.result()
          if (toRewrite.nonEmpty) {
            // per-group repartition then union: each task holds one
            // partition value's rows, so the partitioned write emits the
            // planned file count per `_dt` (a global repartition would
            // re-interleave values and re-fragment)
            val out = toRewrite.reduce(_.unionByName(_))
            val snap = writeSnapshot(root, out, m.partitioned, compactTo = None)
            carried.result().foreach { f =>
              val target = Paths.get(root, snap).resolve(f.path)
              Files.createDirectories(target.getParent)
              FileIO.get.carry(snapDir.resolve(f.path), target)
            }
            commit(root, snap, m.schema, m.partitioned)
          }
      }
    }

  /** ANALYZE-style stats refresh: (re)collect the file-level min/max/null
    * stats of the LIVE snapshot for `columns` — footer reads only, no
    * data bytes — into its manifest (or the legacy sidecar for
    * pre-manifest snapshots). Readers via [[readSkipping]] prune
    * immediately after. */
  def analyze(spark: SparkSession, root: String, columns: Seq[String]): Unit =
    currentSnapshot(root).foreach { c =>
      val snapDir = Paths.get(root, c)
      val fresh = FileSkipping.collectStats(
        spark.sparkContext.hadoopConfiguration, snapDir, columns.toSet)
      Manifest.read(snapDir) match {
        case Some(m) =>
          Manifest.write(snapDir, m.schema, m.partitioned,
            m.files.map(f => f.copy(stats = fresh.get(f.path).orElse(f.stats))),
            m.buckets)
        case None =>
          FileSkipping.writeSidecar(snapDir, fresh)
      }
    }

  /** Build a per-file BLOOM FILTER index over `column` for the live
    * snapshot — Delta's "Bloom filter index" analog, the point-lookup
    * layer min/max stats cannot provide (a digest/id column's [min, max]
    * spans every literal in every file, so range skipping prunes
    * nothing; a Bloom bit PROVES absence). One distributed pass over the
    * table: per (file, value) the k double-hashed bit positions
    * (`xxhash64` of the canonical string — the probe side re-evaluates
    * the identical Catalyst expressions), collapsed to distinct
    * (file, bit) pairs executor-side, so what reaches the driver is at
    * most files × min(k·ndv, m) POSITIONS — index metadata, not data
    * (production would fold bitsets executor-side via a binary
    * aggregate; the positions form keeps this dependency-free). Files
    * with no non-null values get the empty filter: every probe on them
    * proves absence. Stored in the manifest (or legacy sidecar)
    * alongside min/max; readers via [[readSkipping]] prune immediately.
    * Conservative like all skipping: a dropped/absent filter only costs
    * I/O, never rows. */
  def analyzeBloom(spark: SparkSession, root: String, column: String,
                   bits: Int = 8192, hashes: Int = 6): Unit =
    currentSnapshot(root).foreach { c =>
      require(bits % 8 == 0 && bits > 0, s"bits must be a positive multiple of 8")
      val snapDir = Paths.get(root, c)
      val (df, _) = snapshotDf(spark, snapDir)
      require(df.columns.contains(column), s"no column '$column' to index")
      // input_file_name() yields a URL-ENCODED URI; partition dir names
      // come from arbitrary data (partitionDate cast to string), so any
      // char that percent-encodes would make a raw string relativize miss
      // the manifest path. Decode via java.net.URI → Path before
      // relativizing, so the key is a real filesystem-relative path.
      val absSnap = snapDir.toAbsolutePath.normalize()
      def relKey(uriStr: String): String = {
        val p = scala.util.Try(Paths.get(java.net.URI.create(uriStr)))
          .getOrElse(Paths.get(uriStr))
        absSnap.relativize(p.toAbsolutePath.normalize()).toString
      }
      val rows = df.filter(col(column).isNotNull)
        .select(input_file_name().as("_f"),
          expr(s"xxhash64(cast(`$column` as string))").as("h1"),
          expr(s"xxhash64(cast(`$column` as string), '${FileSkipping.BloomSalt}')").as("h2"))
        // modular double-hashing: (h1 + i·h2) mod m computed as
        // ((h1 mod m) + i·(h2 mod m)) mod m — overflow-free under ANSI
        // arithmetic and identical to the probe's floorMod form
        .select(col("_f"), explode(expr(
          s"transform(sequence(0, ${hashes - 1})," +
            s" i -> pmod(pmod(h1, ${bits}L) + i * pmod(h2, ${bits}L), ${bits}L))")).as("bit"))
        .distinct()
        .collect() // (file, bit) positions — index-metadata-sized (see doc)
      // The set of files the scan actually visited (independent of the
      // isNotNull filter): ONLY these may receive the empty "proves every
      // key absent" filter — a file the scan never touched (or whose key
      // failed to resolve) gets NO bloom, never the empty one.
      val scanned: Set[String] = df.select(input_file_name().as("_f"))
        .distinct().collect().map(r => relKey(r.getString(0))).toSet
      val byFile: Map[String, Array[Byte]] = rows
        .groupBy(r => relKey(r.getString(0)))
        .map { case (rel, rs) =>
          val arr = new Array[Byte](bits / 8)
          rs.foreach { r =>
            val b = r.getLong(1).toInt
            arr(b >> 3) = (arr(b >> 3) | (1 << (b & 7))).toByte
          }
          rel -> arr
        }
      // The build SQL's `cast(col as string)` resolves under THIS
      // session's timezone — persist it in the index so a probe under a
      // different session zone canonicalizes timestamp literals with the
      // build zone, not its own (ADVICE r9: unrecorded TZ made
      // cross-session probes falsely prove present timestamps absent).
      val buildTz = spark.sessionState.conf.sessionLocalTimeZone
      def withBloom(st: Option[FileSkipping.FileStats], path: String)
          : Option[FileSkipping.FileStats] = {
        val bloomOpt = byFile.get(path).orElse(
          // scanned but produced no non-null value → empty filter is a
          // PROOF of absence; unscanned/unmatched → no bloom (keep file)
          if (scanned.contains(path)) Some(new Array[Byte](bits / 8)) else None)
          .map(FileSkipping.BloomBits(bits, hashes, _, Some(buildTz)))
        bloomOpt match {
          case None => st
          case Some(bloom) =>
            // Fabricated stats use the nulls = -1 "unknown" sentinel: the
            // IsNull/IsNotNull pruning cases must treat a file whose
            // footer never counted this column as unknown (keep), while
            // point lookups still use the bloom. A real ColStats keeps
            // its footer-counted null count.
            val base = st.getOrElse(FileSkipping.FileStats(0L, Map.empty))
            val cs = base.cols.getOrElse(column,
              FileSkipping.ColStats(None, None, nulls = -1L))
            Some(base.copy(cols =
              base.cols.updated(column, cs.copy(bloom = Some(bloom)))))
        }
      }
      Manifest.read(snapDir) match {
        case Some(m) =>
          // every scanned key must resolve to a manifest path — a miss
          // means the URI→path decode diverged and the bloom layout is
          // unsound; fail the ANALYZE rather than persist wrong pruning
          val known = m.files.map(_.path).toSet
          val orphans = scanned -- known
          require(orphans.isEmpty,
            s"analyzeBloom: scanned file keys missing from manifest: " +
              orphans.take(3).mkString(", "))
          Manifest.write(snapDir, m.schema, m.partitioned,
            m.files.map(f => f.copy(stats = withBloom(f.stats, f.path))),
            m.buckets)
        case None =>
          val prior = FileSkipping.readSidecar(snapDir).getOrElse(Map.empty)
          val listed = Manifest.collectFiles(snapDir).map(_._1)
          val orphans = scanned -- listed.toSet
          require(orphans.isEmpty,
            s"analyzeBloom: scanned file keys missing from listing: " +
              orphans.take(3).mkString(", "))
          FileSkipping.writeSidecar(snapDir, listed.map { p =>
            p -> withBloom(prior.get(p), p)
              .getOrElse(FileSkipping.FileStats(0L, Map.empty))
          }.toMap)
      }
    }

  /** Live table contents through the file-skipping reader: pushed data
    * filters prune whole FILES against the manifest's per-file stats
    * before any parquet footer is opened (partition pruning on `_dt` still
    * happens first, as with [[read]]). Falls back to the plain read when
    * no stats exist. Returns the DataFrame and the index, whose
    * `lastKept`/`lastSkipped` counters expose the most recent scan's
    * pruning decision for audits. */
  def readSkipping(spark: SparkSession, root: String)
      : Option[(DataFrame, Option[FileSkipping.SkippingFileIndex])] =
    currentSnapshot(root).map { c =>
      val snapDir = Paths.get(root, c)
      Manifest.read(snapDir) match {
        case Some(m) =>
          val (df, idx) = Manifest.toDataFrame(spark, snapDir, m, skipping = true)
          val out = if (df.columns.contains(PartCol)) df.drop(PartCol) else df
          (out, idx)
        case None => legacyReadSkipping(spark, root, snapDir)
      }
    }

  /** Pre-manifest snapshots: sidecar stats + a listing file index. */
  private def legacyReadSkipping(spark: SparkSession, root: String, snapDir: Path)
      : (DataFrame, Option[FileSkipping.SkippingFileIndex]) =
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

  /** Snapshot names present under `root`, oldest → newest. (The root dir
    * is the commit log — enumerating snapshots lists it, the same way
    * Delta lists `_delta_log/`; data files are never listed.) */
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
      val df = snapshotDf(spark, Paths.get(root, snap))._1
      if (df.columns.contains(PartCol)) df.drop(PartCol) else df
    }

  /** Consumer-side version watermark of [[applyChanges]]. */
  private def appliedVersion(dstRoot: String): Long = {
    val p = Paths.get(dstRoot, "_APPLIED")
    if (Files.exists(p)) Files.readString(p).trim.toLong else 0L
  }

  private def writeAppliedVersion(dstRoot: String, v: Long): Unit = {
    val tmp = Paths.get(dstRoot, s"._APPLIED.tmp.${System.nanoTime()}")
    Files.writeString(tmp, v.toString, StandardOpenOption.CREATE,
      StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, Paths.get(dstRoot, "_APPLIED"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** The CDC CONSUMER closing the change-feed loop: fold every change of
    * the table at `srcRoot` with `_commit_version` above the consumer's
    * own watermark into the derived table at `dstRoot` — inserts and
    * update POST-images upsert, `delete` rows retract, pre-images are
    * informational. Per key, only the LATEST change in the range applies
    * (a key updated in v2 and deleted in v3 ends deleted); application
    * is the same partition-scoped rewrite as [[merge]], with the delete
    * keys riding the SAME anti-join the upsert keys do — a distributed
    * frame-based keyed delete, no driver-side key list. The watermark
    * (`_APPLIED`, written atomically AFTER publish) makes the consumer
    * resumable; replaying the same range is idempotent, so a crash
    * between publish and watermark is safe. Returns the new watermark.
    * This is how a downstream table syncs from a 100 TB source at
    * O(changes) instead of diffing snapshots. */
  def applyChanges(spark: SparkSession, srcRoot: String, dstRoot: String,
                   keys: Seq[String], partitionDate: Column): Long = {
    val since = appliedVersion(dstRoot)
    changes(spark, srcRoot, since) match {
      case None => since
      case Some(feed) =>
        // an empty feed in range (e.g. a merge of a zero-row batch still
        // publishes a feed commit) advances nothing: max() is NULL
        val maxRow = feed.agg(max(col(CommitVersionCol))).head
        if (maxRow.isNullAt(0)) return since
        val latestVer = maxRow.getLong(0)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(keys.map(col): _*)
          .orderBy(col(CommitVersionCol).desc,
            // within one commit an updated key carries pre- AND
            // post-image: the actionable row wins the tie
            (col(ChangeTypeCol) === "update_preimage").asc)
        val latest = feed.withColumn("_rk", row_number().over(w))
          .filter(col("_rk") === 1)
        val upserts = latest
          .filter(col(ChangeTypeCol).isin("insert", "update_postimage"))
          .drop(ChangeTypeCol, CommitVersionCol, "_rk")
        val dels = latest.filter(col(ChangeTypeCol) === "delete")
          .drop(ChangeTypeCol, CommitVersionCol, "_rk")
        Files.createDirectories(Paths.get(dstRoot))
        val upP = upserts.withColumn(PartCol, partitionDate.cast(StringType))
        val delP = dels.withColumn(PartCol, partitionDate.cast(StringType))
        val bk = liveBuckets(dstRoot)
        currentSnapshot(dstRoot) match {
          case None =>
            // bootstrap: nothing to retract from yet
            val snap = writeSnapshot(dstRoot, upP, partitioned = true, None,
              buckets = bk)
            commit(dstRoot, snap, upP.schema, partitioned = true, buckets = bk)
          case Some(c) =>
            val snapDir = Paths.get(dstRoot, c)
            val target = resolveTarget(upP.schema, liveSchema(spark, snapDir),
              OnSchemaChange.AppendNewColumns)
            val touched = upP.select(PartCol).unionByName(delP.select(PartCol))
              .distinct().collect()
              .map(r => if (r.isNullAt(0)) NullPart else r.getString(0)).toSet
            val manifestOpt = Manifest.read(snapDir).filter(_.partitioned)
            val partVals: Seq[String] = manifestOpt match {
              case Some(m) => m.partitionValues
              case None    => partitionDirs(snapDir).map(_._1)
            }
            val (affectedVals, untouchedVals) = partVals.partition(touched)
            val affectedOld = affectedVals.map { v =>
              val dtVal = if (v == NullPart) lit(null).cast(StringType) else lit(v)
              val df = manifestOpt match {
                case Some(m) =>
                  val dataSchema = StructType(
                    m.schema.fields.filterNot(_.name == PartCol))
                  spark.read.schema(dataSchema).parquet(
                    m.filesOfPartition(v).map(f => snapDir.resolve(f.path).toString): _*)
                case None =>
                  spark.read.parquet(snapDir.resolve(s"$PartCol=$v").toString)
              }
              df.withColumn(PartCol, dtVal)
            }.reduceOption(_.unionByName(_, allowMissingColumns = true))
            val changedKeys = upP.select(keys.map(col): _*)
              .unionByName(delP.select(keys.map(col): _*))
            val out = affectedOld match {
              case None => conform(upP, target)
              case Some(old) =>
                val survivors = old.join(changedKeys, keys, "left_anti")
                conform(upP, target).unionByName(conform(survivors, target))
            }
            val snap = writeSnapshot(dstRoot, out, partitioned = true, None,
              buckets = bk)
            manifestOpt match {
              case Some(m) =>
                linkFromManifest(m, untouchedVals.toSet, snapDir,
                  Paths.get(dstRoot, snap))
              case None =>
                untouchedVals.foreach { v =>
                  linkInto(snapDir.resolve(s"$PartCol=$v"),
                    Paths.get(dstRoot, snap, s"$PartCol=$v"))
                }
            }
            commit(dstRoot, snap, target, partitioned = true, buckets = bk)
        }
        writeAppliedVersion(dstRoot, latestVer)
        latestVer
    }
  }

  /** Delta `RESTORE TABLE ... TO VERSION` analog: re-publish the table AS
    * OF `snap` as a NEW generation — the rollback after a bad merge.
    * History-preserving: the rolled-back generations stay on disk (and
    * readable via [[readAt]]) until [[vacuum]], and the restore itself is
    * one more commit, so a restore can itself be restored away. Pure
    * metadata: every data file of the target snapshot hard-links into the
    * new generation straight off its manifest (file list, schema, stats
    * all carried — no listing, no footer reads, no Spark job), so a
    * 100 TB rollback costs O(files) metadata ops and zero data movement.
    * Restoring the CURRENT snapshot is a no-op. No change feed is
    * synthesized for the restore commit (Delta RESTORE likewise breaks
    * CDF continuity) — incremental consumers diff snapshots across a
    * restore. Throws if `snap` is not on disk (already vacuumed). */
  def restore(spark: SparkSession, root: String, snap: String): Unit = {
    if (currentSnapshot(root).contains(snap)) return
    val srcDir = Paths.get(root, snap)
    require(Files.isDirectory(srcDir),
      s"cannot restore $root to $snap: snapshot not on disk (vacuumed?)")
    val next = nextSnapshotName(root)
    val nextDir = Paths.get(root, next)
    try Files.createDirectory(nextDir)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new ConcurrentWriteException(
          s"snapshot generation $next at $root already exists: concurrent " +
            "writer, or the orphan of a crashed one (unpublished - safe to delete)")
    }
    Manifest.read(srcDir) match {
      case Some(m) =>
        m.files.foreach { f =>
          val target = nextDir.resolve(f.path)
          Files.createDirectories(target.getParent)
          FileIO.get.carry(srcDir.resolve(f.path), target)
        }
        Manifest.write(nextDir, m.schema, m.partitioned, m.files, m.buckets)
        publish(root, next)
      case None => // pre-manifest target: link all, commit enumerates
        linkInto(srcDir, nextDir)
        commit(root, next, liveSchema(spark, srcDir), isPartitioned(srcDir))
    }
  }

  /** Delta `SHALLOW CLONE` analog: materialize the live state of the
    * table at `srcRoot` as a brand-new INDEPENDENT table at `dstRoot` —
    * the zero-copy dev/test copy (run an experiment against production
    * data without touching it). Pure metadata off the source manifest:
    * hard-linked files, carried schema/partitioning/stats, generation
    * counter restarted at 1. The clone's history begins at the clone —
    * subsequent merges/optimizes/vacuums on either table never affect
    * the other (hard links share immutable bytes, never visibility).
    * Refuses a destination that is already a table. */
  def clone(spark: SparkSession, srcRoot: String, dstRoot: String): Unit = {
    val src = currentSnapshot(srcRoot).getOrElse(
      sys.error(s"nothing to clone: no published table at $srcRoot"))
    require(currentSnapshot(dstRoot).isEmpty,
      s"clone destination $dstRoot is already a table")
    val srcDir = Paths.get(srcRoot, src)
    Files.createDirectories(Paths.get(dstRoot))
    val snap = "snap-0000001"
    val dstDir = Paths.get(dstRoot, snap)
    Files.createDirectory(dstDir)
    Manifest.read(srcDir) match {
      case Some(m) =>
        m.files.foreach { f =>
          val target = dstDir.resolve(f.path)
          Files.createDirectories(target.getParent)
          FileIO.get.carry(srcDir.resolve(f.path), target)
        }
        Manifest.write(dstDir, m.schema, m.partitioned, m.files, m.buckets)
        publish(dstRoot, snap)
      case None =>
        linkInto(srcDir, dstDir)
        commit(dstRoot, snap, liveSchema(spark, srcDir), isPartitioned(srcDir))
    }
  }

  /** S9: VACUUM — drop snapshot dirs superseded for more than `keep`
    * generations, and their change feeds with them (a feed outliving its
    * snapshot would promise history [[readAt]] can no longer serve).
    * Hard links make deletion safe for newer snapshots. Manifest-listed
    * files are deleted first (on an object store that list IS the delete
    * batch); the recursive sweep afterwards is local-FS hygiene for empty
    * dirs, pre-manifest snapshots and stray files.
    *
    * `retainMs` is Delta's `RETAIN n HOURS` safety: a snapshot PUBLISHED
    * within the window is never dropped regardless of `keep` — the guard
    * that keeps an in-flight reader (or a restore about to target the
    * generation) from having files deleted underneath it. Age is the
    * snapshot dir's own mtime (set at write, before publish — so the
    * measured age is ≥ the published age, erring on retention). Defaults
    * to 0 (generation-count retention only, the reference's vacuum). */
  def vacuum(root: String, keep: Int = 1, retainMs: Long = 0L): Unit =
    currentSnapshot(root).foreach { cur =>
    val curN = cur.stripPrefix("snap-").toLong
    val cutoff = System.currentTimeMillis() - retainMs
    withList(Paths.get(root))(_.toSeq)
      .filter(p => p.getFileName.toString.startsWith("snap-"))
      .filter(p => p.getFileName.toString.stripPrefix("snap-").toLong <= curN - keep - 1)
      .filter(p => retainMs <= 0L ||
        Files.getLastModifiedTime(p).toMillis <= cutoff)
      .foreach { p =>
        Manifest.read(p).foreach(_.files.foreach(f =>
          Files.deleteIfExists(p.resolve(f.path))))
        deleteRecursively(p)
        val feed = Paths.get(root, ChangesDir, p.getFileName.toString)
        if (Files.isDirectory(feed)) deleteRecursively(feed)
      }
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) withList(p)(_.toSeq).foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}
