package graft.incremental

import org.apache.hadoop.fs.{FileStatus, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, PartitionSpec, PartitioningAwareFileIndex}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{DataType, StructType}
import java.nio.file.{Files, Path}
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Object-store-shaped snapshot metadata: one `_graft_manifest.json` per
  * snapshot, written at publish time, holding the complete data-file list
  * (relative path, size, mtime), the table's logical schema, and the
  * per-file min/max/null statistics that used to live in the
  * `_graft_stats.json` sidecar.
  *
  * Why it exists at 100 TB: [[SnapshotStore]]'s original discovery was
  * directory listing + `mergeSchema` footer reads — correct on a local FS,
  * but on S3/GCS listing is O(files) round trips on EVERY read and there
  * are no cheap recursive walks. A manifest turns a read into ONE metadata
  * object fetch, exactly the move Delta's commit log / Iceberg's manifest
  * files make (their design, public in both projects' specs). Readers get:
  *
  *  - the file list without any LIST call ([[ManifestFileIndex]] serves
  *    `FileStatus`es straight from the manifest);
  *  - the schema without any footer read (stored logical schema — also
  *    what makes additive evolution and type widening cheap: the manifest
  *    carries the evolved schema, old files are read up to it);
  *  - file-skipping stats without a second sidecar fetch.
  *
  * The write side still walks the snapshot directory it just wrote — a
  * writer enumerating its own output is O(new files) and happens once per
  * commit, which is how the real table formats do it too.
  */
object Manifest {

  val ManifestName = "_graft_manifest.json"

  /** One data file. `path` is RELATIVE to the snapshot dir (hard-linked
    * carryover keeps relative paths stable across snapshots, so stats
    * entries stay valid for carried files). */
  final case class FileEntry(path: String, size: Long, mtime: Long,
                             stats: Option[FileSkipping.FileStats]) {
    /** `_dt=...` partition value encoded in the path, if any. */
    def partitionValue: Option[String] = {
      val slash = path.indexOf('/')
      if (slash < 0) None
      else {
        val head = path.substring(0, slash)
        if (head.startsWith(s"${SnapshotStore.PartCol}="))
          Some(head.stripPrefix(s"${SnapshotStore.PartCol}=")) else None
      }
    }
  }

  /** Persistent bucket layout of a table (Delta liquid-clustering /
    * Hive-bucketing analog, declared once and preserved by every
    * subsequent write): `n` buckets over `cols`, bucket id =
    * `pmod(murmur3(cols), n)` — Spark's own HashPartitioning id, so a
    * scan can expose `HashPartitioning(cols, n)` and a big-big join of
    * two tables bucketed the same way needs NO shuffle exchange on
    * either side. `sortCols` are the within-file sort (claimable as
    * output ordering when each bucket has one file — then the
    * sort-merge join needs no sort either). */
  final case class Buckets(n: Int, cols: Seq[String], sortCols: Seq[String])

  final case class TableManifest(schema: StructType, partitioned: Boolean,
                                 files: Seq[FileEntry],
                                 buckets: Option[Buckets] = None) {
    def statsMap: Map[String, FileSkipping.FileStats] =
      files.flatMap(f => f.stats.map(f.path -> _)).toMap
    /** Distinct `_dt` partition values present (directory-name-encoded). */
    def partitionValues: Seq[String] =
      files.flatMap(_.partitionValue).distinct.sorted
    def filesOfPartition(v: String): Seq[FileEntry] =
      files.filter(_.partitionValue.contains(v))
  }

  // ---- write-side collection (the ONLY walk — over just-written output) ---

  /** Enumerate the data files of a freshly-written snapshot dir:
    * (relative path, size, mtime). Write-path only. */
  def collectFiles(snapDir: Path): Seq[(String, Long, Long)] = {
    val walk = Files.walk(snapDir)
    try walk.iterator().asScala
      .filter(p => Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet") &&
        !p.getFileName.toString.startsWith("_") &&
        !p.getFileName.toString.startsWith("."))
      .map { p =>
        (snapDir.relativize(p).toString,
          Files.size(p), Files.getLastModifiedTime(p).toMillis)
      }.toVector.sortBy(_._1)
    finally walk.close()
  }

  // ---- manifest IO --------------------------------------------------------

  /** Atomic write (temp + rename), same protocol as the pointer swap: a
    * published snapshot must never be observed with a torn manifest. */
  def write(snapDir: Path, schema: StructType, partitioned: Boolean,
            files: Seq[FileEntry], buckets: Option[Buckets] = None): Unit = {
    import FileSkipping.{jq, statsBodyJson}
    val bucketsJson = buckets.map { b =>
      s""","buckets":{"n":${b.n},"cols":[${b.cols.map(jq).mkString(",")}],""" +
        s""""sort":[${b.sortCols.map(jq).mkString(",")}]}"""
    }.getOrElse("")
    val body = files.map { f =>
      val base = s"""{"path":${jq(f.path)},"size":${f.size},"mtime":${f.mtime}"""
      f.stats match {
        case Some(st) => base + "," + statsBodyJson(st) + "}"
        case None     => base + "}"
      }
    }.mkString(
      s"""{"version":1,"partitioned":$partitioned$bucketsJson,""" +
        s""""schema":${schema.json},"files":[""",
      ",", "]}")
    val tmp = snapDir.resolve(ManifestName + ".tmp." + java.util.UUID.randomUUID)
    try {
      Files.writeString(tmp, body)
      Files.move(tmp, snapDir.resolve(ManifestName),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } finally Files.deleteIfExists(tmp)
  }

  /** A malformed/absent manifest degrades to the legacy listing read in
    * [[SnapshotStore]] rather than failing the scan. */
  def read(snapDir: Path): Option[TableManifest] =
    scala.util.Try(readUnsafe(snapDir)).toOption.flatten

  private def readUnsafe(snapDir: Path): Option[TableManifest] = {
    val p = snapDir.resolve(ManifestName)
    if (!Files.exists(p)) None
    else {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      val parsed = JsonMethods.parse(Files.readString(p))
      val schema = DataType.fromJson(
        JsonMethods.compact(JsonMethods.render(parsed \ "schema")))
        .asInstanceOf[StructType]
      val partitioned = (parsed \ "partitioned") match {
        case JBool(b) => b
        case _        => false
      }
      def asLong(v: JValue): Long = v match {
        case JInt(n)  => n.toLong
        case JLong(n) => n
        case _        => 0L
      }
      val files = (parsed \ "files") match {
        case JArray(fs) => fs.map { f =>
          val JString(path) = (f \ "path"): @unchecked
          FileEntry(path, asLong(f \ "size"), asLong(f \ "mtime"),
            FileSkipping.parseFileStats(f))
        }
        case _ => Nil
      }
      def strList(v: JValue): Seq[String] = v match {
        case JArray(xs) => xs.collect { case JString(s) => s }
        case _          => Nil
      }
      val buckets = (parsed \ "buckets") match {
        case JObject(_) =>
          val n = asLong(parsed \ "buckets" \ "n").toInt
          val cols = strList(parsed \ "buckets" \ "cols")
          if (n > 0 && cols.nonEmpty)
            Some(Buckets(n, cols, strList(parsed \ "buckets" \ "sort")))
          else None
        case _ => None
      }
      Some(TableManifest(schema, partitioned, files, buckets))
    }
  }

  // ---- the listing-free FileIndex -----------------------------------------

  /** A [[PartitioningAwareFileIndex]] whose leaf files come from the
    * manifest instead of filesystem listing: `listFiles` never touches the
    * filesystem (Spark's partition inference + pruning machinery runs over
    * manifest-served `FileStatus`es). A file present on disk but absent
    * from the manifest is INVISIBLE — manifest-committed state is the
    * table, exactly the Delta/Iceberg contract. */
  final class ManifestFileIndex(spark: SparkSession, snapDir: Path,
                                m: TableManifest)
    extends PartitioningAwareFileIndex(
      spark,
      Map("basePath" -> snapDir.toUri.toString.stripSuffix("/")),
      Some(m.schema)) {

    private val rootHPath = new HPath(snapDir.toUri.toString.stripSuffix("/"))

    private val statuses: Seq[FileStatus] = m.files.map { f =>
      new FileStatus(f.size, false, 1, 128L << 20, f.mtime,
        new HPath(rootHPath, f.path))
    }

    override def rootPaths: Seq[HPath] = Seq(rootHPath)

    override protected val leafFiles: mutable.LinkedHashMap[HPath, FileStatus] = {
      val lm = mutable.LinkedHashMap.empty[HPath, FileStatus]
      statuses.foreach(s => lm(s.getPath) = s)
      lm
    }

    override protected val leafDirToChildrenFiles: Map[HPath, Array[FileStatus]] =
      statuses.groupBy(_.getPath.getParent).view.mapValues(_.toArray).toMap

    override def refresh(): Unit = ()

    override def partitionSpec(): PartitionSpec =
      if (m.partitioned) inferPartitioning() else PartitionSpec.emptySpec
  }

  // ---- DataFrame assembly -------------------------------------------------

  /** Build the snapshot's DataFrame from the manifest alone. With
    * `skipping = true` and stats present, wraps the index in
    * [[FileSkipping.SkippingFileIndex]] so pushed data filters prune whole
    * files before any footer is opened. Returns the skip index (when
    * active) for pruning audits. A manifest-declared bucket layout is
    * surfaced as the relation's `BucketSpec`, so the scan reports
    * `HashPartitioning(bucketCols, n)` and joins/aggregations keyed on
    * the bucket columns plan with NO shuffle exchange — the layout's
    * whole point. */
  def toDataFrame(spark: SparkSession, snapDir: Path, m: TableManifest,
                  skipping: Boolean)
      : (DataFrame, Option[FileSkipping.SkippingFileIndex]) = {
    val inner = new ManifestFileIndex(spark, snapDir, m)
    val dataSchema = StructType(
      m.schema.fields.filterNot(f => m.partitioned && f.name == SnapshotStore.PartCol))
    val stats = if (skipping) m.statsMap else Map.empty[String, FileSkipping.FileStats]
    val (idx, skipIdx) =
      if (stats.nonEmpty) {
        val s = new FileSkipping.SkippingFileIndex(
          inner, spark, stats, dataSchema, snapDir.toUri)
        (s: org.apache.spark.sql.execution.datasources.FileIndex, Some(s))
      } else (inner, None)
    val bucketSpec = m.buckets.map(b =>
      org.apache.spark.sql.catalyst.catalog.BucketSpec(b.n, b.cols, b.sortCols))
    val relation = HadoopFsRelation(
      idx, inner.partitionSchema, dataSchema, bucketSpec,
      new ParquetFileFormat, Map.empty[String, String])(spark)
    (spark.baseRelationToDataFrame(relation), skipIdx)
  }
}
