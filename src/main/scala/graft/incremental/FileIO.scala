package graft.incremental

import java.nio.file.{Files, Path, StandardCopyOption}

/** The file-carryover I/O seam of the snapshot store (SCALE.md §7e): every
  * snapshot publication carries the previous generation's untouched
  * immutable data files forward, and HOW a file is carried is the only
  * filesystem capability the store assumes beyond write-new-file and the
  * atomic pointer move:
  *
  *  - [[FileIO.HardLink]] — POSIX `link(2)`: O(1) metadata per file, zero
  *    bytes moved. Local disk, NFS — anything POSIX.
  *  - [[FileIO.Copy]] — per-file copy driven by the manifest's explicit
  *    file list: the OBJECT-STORE mapping, where the reference's storage
  *    actually lives (Delta on object storage,
  *    `/root/reference/macros/dune_dbt_overrides/source.sql:1`). S3
  *    `CopyObject` / GCS `rewrite` are server-side per-object operations
  *    fed by exactly this (src, dst) pair stream — no directory walks, no
  *    link support assumed, no data bytes through the client. Locally
  *    modeled as `Files.copy`; a production build binds this same seam to
  *    the store SDK's copy call. Carryover cost becomes O(carried files)
  *    server-side calls — the cost profile Delta/Iceberg pay for the same
  *    operation on object storage.
  *
  * Contract: `carry(src, dst)` makes `dst` exist with `src`'s bytes,
  * never mutates `src`, and fails if `dst` already exists (snapshot
  * layouts are immutable — a double carry is a bug, not a race to win).
  * Data files are immutable once published, so either implementation
  * preserves every store semantic (merge carryover, optimize, vacuum,
  * restore, clone, CDC apply). The only observable difference is
  * physical: under Copy, restore and clone are deep (independent bytes)
  * rather than shared-inode shallow — visibility semantics are identical
  * because visibility was never carried by the links, only by the
  * manifest + pointer.
  */
trait FileIO {
  def carry(src: Path, dst: Path): Unit
  def name: String
}

object FileIO {

  /** POSIX hard link: zero-copy carryover for link-capable filesystems. */
  object HardLink extends FileIO {
    def carry(src: Path, dst: Path): Unit = Files.createLink(dst, src)
    def name = "hardlink"
  }

  /** Manifest-driven per-file copy: the object-store carryover. */
  object Copy extends FileIO {
    def carry(src: Path, dst: Path): Unit =
      Files.copy(src, dst, StandardCopyOption.COPY_ATTRIBUTES)
    def name = "copy"
  }

  /** Process-wide strategy. Defaults to hard links; `-Dgraft.fileio=copy`
    * switches the entire store to the object-store mapping — the full
    * SnapshotStore suite must stay green under BOTH (FileIOCopyModeSpec
    * runs the lifecycle that way in-process). */
  @volatile private var current: FileIO =
    if (sys.props.get("graft.fileio").contains("copy")) Copy else HardLink

  def get: FileIO = current

  /** Run `body` under `io`, restoring the prior strategy after. Test-only
    * by intent; production picks one strategy per process. */
  def withIO[A](io: FileIO)(body: => A): A = {
    val prev = current
    current = io
    try body finally current = prev
  }
}
