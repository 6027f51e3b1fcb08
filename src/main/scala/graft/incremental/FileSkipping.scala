package graft.incremental

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** File-level data skipping for the snapshot store — the Delta-style layer
  * between partition pruning and parquet row-group pruning.
  *
  * Why it exists at 100 TB: partition pruning gets a query down to a date
  * directory, but a hot date can hold thousands of files, and row-group
  * pruning still costs one FOOTER READ per file (an object-store round
  * trip each). This module collects each file's per-column min/max/null
  * statistics ONCE — from the parquet footers, O(files) metadata, zero
  * data bytes — into a sidecar (`_graft_stats.json`) in the snapshot dir,
  * and a [[SkippingFileIndex]] then prunes the file LIST against pushed
  * data filters before any footer is opened. With OPTIMIZE's range-
  * clustered layout (disjoint per-file key ranges) a point lookup touches
  * one file instead of a partition.
  *
  * Everything is conservative: a file with no sidecar entry, a column
  * with no stats, or a predicate shape we don't model keeps the file.
  * Skipping can therefore never change results — only avoid I/O — and a
  * stale or missing sidecar degrades to the plain read.
  */
object FileSkipping {

  /** A per-file Bloom filter over one column's non-null values — the
    * Delta "Bloom filter index" analog, the skipping layer min/max cannot
    * provide: high-cardinality point lookups (digests, ids) where every
    * file's [min, max] overlaps every literal. `m` bits, `k` probes,
    * double hashing `g_i = (h1 mod m + i·(h2 mod m)) mod m` over xxhash64 of the value's
    * CANONICAL STRING (`cast(col as string)`) with Spark's default seed —
    * the read side re-evaluates the identical Catalyst expression on the
    * literal, so write and probe can never hash differently. `tz` is the
    * BUILD session's timezone, persisted because the canonical string of
    * a timestamp depends on it: a table analyzed under TZ A and probed
    * under TZ B would otherwise hash different strings and falsely prove
    * present timestamps absent. The probe uses the recorded zone; a
    * legacy index without one falls back to the probe session's zone
    * (the pre-persistence behavior, correct for same-session use).
    * Absence of a set bit PROVES the value absent from the file; a set
    * bit proves nothing (classic Bloom), so skipping stays conservative. */
  case class BloomBits(m: Int, k: Int, bits: Array[Byte],
                       tz: Option[String] = None) {
    def mightContain(h1: Long, h2: Long): Boolean = {
      val m1 = java.lang.Math.floorMod(h1, m.toLong)
      val m2 = java.lang.Math.floorMod(h2, m.toLong)
      (0 until k).forall { i =>
        val bit = java.lang.Math.floorMod(m1 + i * m2, m.toLong).toInt
        (bits(bit >> 3) & (1 << (bit & 7))) != 0
      }
    }
  }

  /** Per-column stats of one file. min/max are canonical strings (numeric
    * `toString`, UTF-8 text verbatim); None when parquet recorded no
    * non-null values (all-null chunk or suppressed stats). `bloom` is
    * populated by [[SnapshotStore.analyzeBloom]] only. */
  case class ColStats(min: Option[String], max: Option[String], nulls: Long,
                      bloom: Option[BloomBits] = None)

  case class FileStats(rows: Long, cols: Map[String, ColStats])

  val SidecarName = "_graft_stats.json"

  // ---- collection (footers only — no data pages) --------------------------

  /** Read per-file stats for `columns` from every parquet footer under
    * `snapDir`, keyed by path RELATIVE to it (hard-linked carryover keeps
    * relative paths stable across snapshots). */
  def collectStats(conf: Configuration, snapDir: Path,
                   columns: Set[String]): Map[String, FileStats] = {
    val walk = Files.walk(snapDir)
    val files =
      try walk.iterator().asScala.filter(p =>
        Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet")).toVector
      finally walk.close()
    files.map { p =>
      val rel = snapDir.relativize(p).toString
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new HPath(p.toUri), conf))
      try {
        val footer = reader.getFooter
        val blocks = footer.getBlocks.asScala.toSeq
        val rows = blocks.map(_.getRowCount).sum
        // (column, chunkStats, rowsInChunk) for every row group
        val chunks = blocks.flatMap(b => b.getColumns.asScala
          .filter(c => columns.contains(c.getPath.toDotString))
          .map(c => (c.getPath.toDotString, c.getStatistics, b.getRowCount)))
        val cols = chunks.groupBy(_._1).flatMap { case (name, cs) =>
          // Every chunk must carry SOUND stats: either real min/max, or a
          // null count proving the chunk is entirely null. One chunk with
          // suppressed stats poisons the whole column — a partial min/max
          // would be an unsound bound, silently wrong, not merely loose.
          val sound = cs.forall { case (_, s, chunkRows) =>
            s != null && s.isNumNullsSet &&
              (s.hasNonNullValue || s.getNumNulls == chunkRows)
          }
          if (!sound) None
          else {
            val nulls = cs.map(_._2.getNumNulls).sum
            val nonEmpty = cs.map(_._2).filter(_.hasNonNullValue)
            if (nonEmpty.isEmpty) Some(name -> ColStats(None, None, nulls))
            else {
              val mins = nonEmpty.map(s => statString(s.genericGetMin.asInstanceOf[AnyRef]))
              val maxs = nonEmpty.map(s => statString(s.genericGetMax.asInstanceOf[AnyRef]))
              val ord = statOrdering(nonEmpty.head.genericGetMin.asInstanceOf[AnyRef])
              Some(name -> ColStats(Some(mins.min(ord)), Some(maxs.max(ord)), nulls))
            }
          }
        }
        rel -> FileStats(rows, cols)
      } finally reader.close()
    }.toMap
  }

  /** Canonical string for a parquet statistics value. */
  private def statString(v: AnyRef): String = v match {
    case b: Binary => b.toStringUsingUTF8
    case other => other.toString
  }

  /** Ordering matching the value domain: numeric by value, text by
    * unsigned UTF-8 bytes (parquet's and Spark's string order). */
  private def statOrdering(sample: AnyRef): Ordering[String] = sample match {
    case _: java.lang.Long | _: Integer => Ordering.by((s: String) => s.toLong)
    case _: java.lang.Double | _: java.lang.Float => Ordering.by((s: String) => s.toDouble)
    case _ => utf8Ordering
  }

  private val utf8Ordering: Ordering[String] = (a: String, b: String) =>
    java.util.Arrays.compareUnsigned(a.getBytes(UTF_8), b.getBytes(UTF_8))

  // ---- sidecar IO ---------------------------------------------------------

  private[incremental] def jq(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** `"rows":N,"cols":{...}` — the stats body shared by the legacy sidecar
    * and the per-file entries of [[Manifest]] (which absorbed it). */
  private[incremental] def statsBodyJson(fs: FileStats): String = {
    val cols = fs.cols.toSeq.sortBy(_._1).map { case (c, cs) =>
      val bloomJson = cs.bloom.map { b =>
        val b64 = java.util.Base64.getEncoder.encodeToString(b.bits)
        val tzJson = b.tz.map(z => s""","tz":${jq(z)}""").getOrElse("")
        s""","bloom":{"m":${b.m},"k":${b.k}$tzJson,"b64":${jq(b64)}}"""
      }.getOrElse("")
      s"${jq(c)}:{" +
        cs.min.map(m => s""""min":${jq(m)},""").getOrElse("") +
        cs.max.map(m => s""""max":${jq(m)},""").getOrElse("") +
        s""""nulls":${cs.nulls}$bloomJson}"""
    }.mkString(",")
    s""""rows":${fs.rows},"cols":{$cols}"""
  }

  /** Parse a `{"rows":..,"cols":{..}}`-shaped JValue (also the shape of a
    * manifest file entry, which carries the same keys inline); None when
    * the node has no stats. */
  private[incremental] def parseFileStats(v: org.json4s.JValue): Option[FileStats] = {
    import org.json4s._
    def asLong(x: JValue): Long = x match {
      case JInt(n) => n.toLong
      case JLong(n) => n
      case _ => 0L
    }
    (v \ "cols") match {
      case JObject(obj) =>
        val cols = obj.map { case (c, cv) =>
          def str(k: String): Option[String] = cv \ k match {
            case JString(s) => Some(s); case _ => None
          }
          c -> ColStats(str("min"), str("max"), asLong(cv \ "nulls"),
            parseBloom(cv \ "bloom"))
        }.toMap
        Some(FileStats(asLong(v \ "rows"), cols))
      case _ => None
    }
  }

  private[incremental] def parseBloom(v: org.json4s.JValue): Option[BloomBits] = {
    import org.json4s._
    (v \ "m", v \ "k", v \ "b64") match {
      case (JInt(m), JInt(k), JString(b64)) =>
        // A truncated/hand-edited payload must degrade to "no bloom, keep
        // the file", not throw inside mightContain at planning time: the
        // bit array length must match m exactly and m/k must be sane.
        val tz = (v \ "tz") match { case JString(z) => Some(z); case _ => None }
        scala.util.Try(java.util.Base64.getDecoder.decode(b64)).toOption
          .filter(bits => m > 0 && m % 8 == 0 && k > 0 &&
            bits.length == m.toInt / 8)
          .map(bits => BloomBits(m.toInt, k.toInt, bits, tz))
      case _ => None
    }
  }

  def writeSidecar(snapDir: Path, stats: Map[String, FileStats]): Unit = {
    val body = stats.toSeq.sortBy(_._1).map { case (f, fs) =>
      s"${jq(f)}:{${statsBodyJson(fs)}}"
    }.mkString("{", ",", "}")
    // temp file + ATOMIC_MOVE (same protocol as SnapshotStore.publish): a
    // crash mid-write or a concurrent analyze must never leave a torn
    // sidecar that readers then choke on
    val tmp = snapDir.resolve(SidecarName + ".tmp." + java.util.UUID.randomUUID)
    try {
      Files.writeString(tmp, body)
      Files.move(tmp, snapDir.resolve(SidecarName),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } finally
      // a failed write/move must not leak the temp file into the snapshot
      // dir, where later hard-link compaction passes would propagate it
      Files.deleteIfExists(tmp)
  }

  def readSidecar(snapDir: Path): Option[Map[String, FileStats]] =
    // a malformed/truncated sidecar degrades to the plain (no-skipping) read
    // rather than failing the scan — skipping is an optimization, never a
    // correctness dependency
    scala.util.Try(readSidecarUnsafe(snapDir)).toOption.flatten

  private def readSidecarUnsafe(snapDir: Path): Option[Map[String, FileStats]] = {
    val p = snapDir.resolve(SidecarName)
    if (!Files.exists(p)) None
    else {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      val parsed = JsonMethods.parse(Files.readString(p))
      def asLong(v: JValue): Long = v match {
        case JInt(n) => n.toLong
        case JLong(n) => n
        case _ => 0L
      }
      Some(parsed.asInstanceOf[JObject].obj.map { case (file, v) =>
        val o = v.asInstanceOf[JObject]
        val cols = (o \ "cols").asInstanceOf[JObject].obj.map { case (c, cv) =>
          def str(k: String): Option[String] = cv \ k match {
            case JString(s) => Some(s); case _ => None
          }
          c -> ColStats(str("min"), str("max"), asLong(cv \ "nulls"),
            parseBloom(cv \ "bloom"))
        }.toMap
        file -> FileStats(asLong(o \ "rows"), cols)
      }.toMap)
    }
  }

  // ---- bloom hashing (shared by analyzeBloom's SQL and the probe) ---------

  /** The literal's canonical string — Catalyst `Cast(_, StringType)`, the
    * same expression the build side's `cast(col as string)` evaluates.
    * The cast timezone is the BUILD session's zone as recorded in the
    * index ([[BloomBits.tz]] — analyzeBloom persists it next to m/k),
    * because that is what the build side's SQL `cast(col as string)`
    * resolved under: probing a timestamp column under a different
    * session zone with the probe's own zone would hash a different
    * canonical string and falsely prove present values absent. A legacy
    * index with no recorded zone falls back to the probe session's zone
    * (the pre-persistence behavior — correct when build and probe share
    * a session). None for NULL or a cast-unsupported type (probe keeps
    * the file). */
  private[incremental] def bloomCanonical(l: Literal,
                                          buildTz: Option[String] = None): Option[String] =
    if (l.value == null) None
    else scala.util.Try(
      Cast(l, StringType,
        Some(buildTz.getOrElse(
          org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)))
        .eval(null).asInstanceOf[UTF8String].toString
    ).toOption

  private def xxh(args: Seq[Expression]): Long =
    new XxHash64(args).eval(null).asInstanceOf[Long]

  private[incremental] val BloomSalt = "graft-bloom"

  private[incremental] def bloomH1(s: String): Long =
    xxh(Seq(Literal(UTF8String.fromString(s), StringType)))

  private[incremental] def bloomH2(s: String): Long =
    xxh(Seq(Literal(UTF8String.fromString(s), StringType),
      Literal(UTF8String.fromString(BloomSalt), StringType)))

  // ---- the pruning index --------------------------------------------------

  /** Wraps any [[FileIndex]] and drops files whose stats PROVE no row can
    * satisfy the pushed data filters. Partition pruning stays with the
    * inner index; this adds the file-granular layer. `keyFor` maps a
    * listed file path to the sidecar key (path relative to the snapshot
    * root). Counters expose the last listing's skip decision for tests
    * and plan audits. */
  class SkippingFileIndex(inner: FileIndex, spark: SparkSession,
                          stats: Map[String, FileStats],
                          dataSchema: StructType,
                          snapRootUri: java.net.URI) extends FileIndex {
    @volatile var lastKept = 0
    @volatile var lastSkipped = 0

    override def rootPaths = inner.rootPaths
    override def inputFiles: Array[String] = inner.inputFiles
    override def refresh(): Unit = inner.refresh()
    override def sizeInBytes: Long = inner.sizeInBytes
    override def partitionSchema: StructType = inner.partitionSchema

    private val types: Map[String, DataType] =
      dataSchema.fields.map(f => f.name.toLowerCase -> f.dataType).toMap

    private def keyFor(file: org.apache.hadoop.fs.Path): Option[String] =
      scala.util.Try(
        Paths.get(snapRootUri).relativize(Paths.get(file.toUri)).toString).toOption

    override def listFiles(partitionFilters: Seq[Expression],
                           dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
      val base = inner.listFiles(partitionFilters, dataFilters)
      if (dataFilters.isEmpty || stats.isEmpty) base
      else {
        var kept = 0; var skipped = 0
        val pruned = base.map { pd =>
          val files = pd.files.filter { f =>
            val keep = keyFor(f.getPath).flatMap(stats.get)
              .forall(fs => dataFilters.forall(e => mayMatch(e, fs)))
            if (keep) kept += 1 else skipped += 1
            keep
          }
          PartitionDirectory(pd.values, files)
        }
        lastKept = kept; lastSkipped = skipped
        pruned.filter(_.files.nonEmpty)
      }
    }

    /** Three-valued-logic-safe: TRUE means "a matching row may exist". */
    private def mayMatch(e: Expression, fs: FileStats): Boolean = e match {
      case And(l, r) => mayMatch(l, fs) && mayMatch(r, fs)
      case Or(l, r) => mayMatch(l, fs) || mayMatch(r, fs)
      case EqualTo(a: AttributeReference, l: Literal) => pointHas(a, l, fs)
      case EqualTo(l: Literal, a: AttributeReference) => pointHas(a, l, fs)
      case EqualNullSafe(a: AttributeReference, l: Literal) if l.value != null =>
        pointHas(a, l, fs)
      case EqualNullSafe(l: Literal, a: AttributeReference) if l.value != null =>
        pointHas(a, l, fs)
      case GreaterThan(a: AttributeReference, l: Literal) => maxAbove(a, l, fs, strict = true)
      case LessThan(l: Literal, a: AttributeReference) => maxAbove(a, l, fs, strict = true)
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) => maxAbove(a, l, fs, strict = false)
      case LessThanOrEqual(l: Literal, a: AttributeReference) => maxAbove(a, l, fs, strict = false)
      case LessThan(a: AttributeReference, l: Literal) => minBelow(a, l, fs, strict = true)
      case GreaterThan(l: Literal, a: AttributeReference) => minBelow(a, l, fs, strict = true)
      case LessThanOrEqual(a: AttributeReference, l: Literal) => minBelow(a, l, fs, strict = false)
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) => minBelow(a, l, fs, strict = false)
      case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        vs.exists(v => pointHas(a, v.asInstanceOf[Literal], fs))
      case InSet(a: AttributeReference, vs) =>
        // InSet carries INTERNAL values (UTF8String, Long, ...) — wrap with
        // the internal-value Literal constructor, not Literal.create
        vs.exists(v => pointHas(a, Literal(v, a.dataType), fs))
      // nulls < 0 is the "unknown" sentinel (stats fabricated by
      // analyzeBloom for a file whose footer stats never recorded the
      // column) — both null tests must then keep the file: only a REAL
      // footer-counted zero may prune `col IS NULL`. Sidecars written by
      // the PRE-sentinel analyzeBloom fabricated nulls = 0: that vintage
      // is recognizable (bloom present, no min/max — real footer stats
      // with zero nulls always carry min/max unless the file is empty)
      // and treated as unknown too, so an old index cannot keep
      // incorrectly pruning `col IS NULL` until re-analyzed.
      case IsNull(a: AttributeReference) =>
        colStats(a, fs).forall(cs => cs.nulls != 0L ||
          (cs.min.isEmpty && cs.max.isEmpty && cs.bloom.isDefined))
      case IsNotNull(a: AttributeReference) =>
        colStats(a, fs).forall(cs =>
          cs.nulls < 0L || fs.rows == 0 || cs.nulls < fs.rows)
      case StartsWith(a: AttributeReference, Literal(p: UTF8String, StringType)) =>
        // Any s with prefix p satisfies s >= p AND s's first |p| bytes
        // equal p. So skip iff max < p, or min truncated to |p| bytes
        // already exceeds p. (No "p + 0xFF" sentinel: ￿ encodes as
        // EF BF BF in UTF-8, which is NOT high in unsigned byte order.)
        colStats(a, fs).forall { cs =>
          !allNull(cs, fs) && ((cs.min, cs.max) match {
            case (Some(mn), Some(mx)) =>
              val pb = p.getBytes
              val mxb = mx.getBytes(UTF_8)
              val mnb = mn.getBytes(UTF_8)
              val minPrefix = java.util.Arrays.copyOf(mnb, math.min(mnb.length, pb.length))
              java.util.Arrays.compareUnsigned(mxb, pb) >= 0 &&
                java.util.Arrays.compareUnsigned(minPrefix, pb) <= 0
            case _ => true
          })
        }
      case _ => true
    }

    private def colStats(a: AttributeReference, fs: FileStats): Option[ColStats] =
      fs.cols.get(a.name).orElse(
        fs.cols.collectFirst { case (k, v) if k.equalsIgnoreCase(a.name) => v })

    private def allNull(cs: ColStats, fs: FileStats): Boolean =
      fs.rows > 0 && cs.nulls == fs.rows

    /** sign(stat − lit), or None when the type isn't modeled. */
    private def cmp(a: AttributeReference, stat: String, lit: Any): Option[Int] =
      types.get(a.name.toLowerCase).flatMap {
        case LongType | IntegerType | ShortType | ByteType | DateType |
             TimestampType | TimestampNTZType =>
          lit match {
            case n: Number => Some(java.lang.Long.compare(stat.toLong, n.longValue()))
            case _ => None
          }
        case DoubleType | FloatType =>
          lit match {
            // NaN literal: Spark's ordering puts NaN above every real and
            // NaN = NaN is TRUE, but parquet min/max only describe the
            // real-valued rows — a chunk holding NaN rows still reports
            // real min/max, so no range test can prove NaN-absence. Keep
            // the file.
            case n: Number if java.lang.Double.isNaN(n.doubleValue()) => None
            case n: Number => Some(java.lang.Double.compare(stat.toDouble, n.doubleValue()))
            case _ => None
          }
        case StringType =>
          lit match {
            case s: UTF8String =>
              Some(java.util.Arrays.compareUnsigned(stat.getBytes(UTF_8), s.getBytes))
            case _ => None
          }
        case _ => None
      }

    private def withRange(a: AttributeReference, l: Literal, fs: FileStats)
                         (f: (String, String) => Boolean): Boolean =
      if (l.value == null) false // comparison with NULL matches no row
      else colStats(a, fs).forall { cs =>
        if (allNull(cs, fs)) false
        else (cs.min, cs.max) match {
          case (Some(mn), Some(mx)) => f(mn, mx)
          case _ => true
        }
      }

    /** Point-equality test: the min/max range AND (when present) the
      * Bloom filter must both admit the literal — bloom catches the
      * high-cardinality case where every file's range covers every key. */
    private def pointHas(a: AttributeReference, l: Literal, fs: FileStats): Boolean =
      rangeHas(a, l, fs) && bloomHas(a, l, fs)

    /** False ⇒ the value is PROVEN absent from the file. Canonicalization
      * and hashing re-evaluate the IDENTICAL Catalyst expressions
      * [[SnapshotStore.analyzeBloom]]'s SQL used on the write side
      * (`cast(col as string)` then `xxhash64`), so probe and build can
      * never disagree; unmodeled literals keep the file. */
    private def bloomHas(a: AttributeReference, l: Literal, fs: FileStats): Boolean =
      colStats(a, fs).forall(_.bloom.forall { b =>
        FileSkipping.bloomCanonical(l, b.tz).forall { s =>
          b.mightContain(FileSkipping.bloomH1(s), FileSkipping.bloomH2(s))
        }
      })

    private def rangeHas(a: AttributeReference, l: Literal, fs: FileStats): Boolean =
      withRange(a, l, fs) { (mn, mx) =>
        (cmp(a, mn, l.value), cmp(a, mx, l.value)) match {
          case (Some(lo), Some(hi)) => lo <= 0 && hi >= 0
          case _ => true
        }
      }

    private def maxAbove(a: AttributeReference, l: Literal, fs: FileStats,
                         strict: Boolean): Boolean =
      withRange(a, l, fs) { (_, mx) =>
        cmp(a, mx, l.value).forall(c => if (strict) c > 0 else c >= 0)
      }

    private def minBelow(a: AttributeReference, l: Literal, fs: FileStats,
                         strict: Boolean): Boolean =
      withRange(a, l, fs) { (mn, _) =>
        cmp(a, mn, l.value).forall(c => if (strict) c < 0 else c <= 0)
      }
  }
}
