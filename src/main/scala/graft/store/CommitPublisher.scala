package graft.store

import java.nio.channels.FileChannel
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, StandardCopyOption, StandardOpenOption}

/** The single atomicity primitive the commit protocol requires of its
  * storage layer — the seam that replaces the reference's FoundationDB
  * transaction boundary (fdb/FdbFactAppender.kt:33-45) in a way that is
  * portable across deployment filesystems.
  *
  * The protocol's storage needs decompose into exactly two operations:
  *
  *  - `putIfAbsent(target, content)`: publish a small, whole-object
  *    metadata record (commit, checkpoint, catalog entry) iff nothing
  *    exists at `target`; atomic and exactly-one-winner across processes,
  *    with whole-object read visibility (a reader never observes a
  *    partially-written record). This is the CAS every log seq, checkpoint
  *    seq, and store name is arbitrated by.
  *  - `alias(target, src)`: make an already-committed data file
  *    additionally visible at `target` (the `stream/` tail view);
  *    idempotent create-if-absent, losers are silent.
  *
  * Everything else the store writes — parquet data files, entry-index
  * sidecars, compaction buckets — goes to WRITER-UNIQUE names (UUIDs), so
  * it needs no arbitration at all: visibility is conferred solely by the
  * metadata CAS that references those names. Reads on the hot path probe
  * EXACT keys derived from commit seqs (`commitsAfter` never lists a
  * directory), which is also the access pattern object stores serve
  * efficiently; the two listing consumers (latest-checkpoint discovery and
  * the janitor) tolerate stale listings by construction — an older
  * checkpoint plus a longer commit suffix is the same snapshot, and the
  * janitor's grace period out-waits any listing lag.
  *
  * Deployment mapping of `putIfAbsent`:
  *  - POSIX / NFSv4+: hard-link CAS ([[PosixLinkPublisher]] — link(2) is
  *    atomic create-if-absent, content fully staged before the link).
  *  - S3 / GCS / object stores: conditional PUT (`If-None-Match: *`) —
  *    natively atomic, whole-object, exactly-one-winner.
  *  - HDFS / ABFS: `FileSystem.create(path, overwrite = false)` (namenode-
  *    atomic create) or single-file atomic rename-if-absent.
  * [[ConditionalPutPublisher]] emulates the object-store profile on local
  * disk so the whole protocol test suite (including the multi-process
  * race) can run against those semantics: no hard links anywhere — stream
  * aliases COPY (the analogue of server-side COPY) — and put-if-absent as
  * the only arbitration primitive the protocol sees.
  */
trait CommitPublisher {
  def name: String

  /** Atomically publish `content` at `target` iff absent; true iff this
    * writer won. Losers leave no trace. Readers of `target` see either
    * nothing or the complete content, never a partial write. */
  def putIfAbsent(target: Path, content: String): Boolean

  /** Make committed data file `src` additionally visible at `target`
    * (create-if-absent, idempotent; concurrent publishers of the same
    * target are all satisfied by whichever copy lands). */
  def alias(target: Path, src: Path): Unit
}

object CommitPublisher {
  /** Publisher selection for stores opened without an explicit choice:
    * `-Dgraft.commit.publisher=posix|conditional-put` (the knob the
    * multi-process race spec uses to point a child JVM at the same
    * publisher as its parent). Defaults to the POSIX hard-link CAS. */
  def default: CommitPublisher =
    forName(System.getProperty("graft.commit.publisher", PosixLinkPublisher.name))

  def forName(name: String): CommitPublisher = name match {
    case PosixLinkPublisher.name => PosixLinkPublisher
    case ConditionalPutPublisher.name => ConditionalPutPublisher
    case other => throw new IllegalArgumentException(
      s"unknown commit publisher '$other' (expected '${PosixLinkPublisher.name}' " +
        s"or '${ConditionalPutPublisher.name}')")
  }
}

/** POSIX profile: stage content in a same-directory temp file, then
  * `link(2)` it to the target — atomic create-if-absent with whole-object
  * visibility (the content exists in full before the name does). The
  * store's original commit primitive, now behind the seam. */
object PosixLinkPublisher extends CommitPublisher {
  val name = "posix"

  override def putIfAbsent(target: Path, content: String): Boolean = {
    val dir = target.getParent
    Files.createDirectories(dir)
    val tmp = dir.resolve(s".tmp-${java.util.UUID.randomUUID()}")
    Files.writeString(tmp, content, UTF_8)
    try {
      Files.createLink(target, tmp)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    } finally Files.deleteIfExists(tmp)
  }

  override def alias(target: Path, src: Path): Unit = {
    Files.createDirectories(target.getParent)
    try Files.createLink(target, src)
    catch { case _: java.nio.file.FileAlreadyExistsException => () }
  }
}

/** Object-store profile, emulated on local disk: the protocol sees ONLY
  * conditional-PUT semantics — put-if-absent with whole-object visibility,
  * no hard links (aliases copy bytes, the stand-in for server-side COPY),
  * no rename exposed to the protocol.
  *
  * Emulation mechanics (internal to this test double, invisible to the
  * protocol, standing in for the store service's own concurrency control —
  * S3's conditional-PUT arbitration, HDFS's namenode create lock): an
  * advisory `FileChannel.lock` on a per-directory `.cas-arbiter` file
  * serializes check-then-publish across processes, and the publish itself
  * is a same-directory ATOMIC_MOVE of fully-staged content so readers get
  * the whole-object guarantee a real conditional PUT provides. A crashed
  * holder's flock is released by the OS; staged `.tmp-*` files are
  * janitor-collected — no burned sequence numbers, no partial records. */
object ConditionalPutPublisher extends CommitPublisher {
  val name = "conditional-put"

  // JVM FileLock throws OverlappingFileLockException on same-process
  // re-entry, so in-JVM contenders serialize on a monitor first. Monitors
  // are a FIXED stripe array keyed by the arbiter path's hash — bounded
  // memory for a long-running server publishing to unboundedly many store
  // directories (a per-directory map grew one Object per directory ever
  // touched, never evicted). Two directories sharing a stripe merely
  // serialize a little coarser in-JVM; same directory always maps to the
  // same stripe, which is all correctness needs.
  private val monitorStripes = Array.fill(128)(new Object)

  private def withDirLock[A](dir: Path)(body: => A): A = {
    val arbiter = dir.resolve(".cas-arbiter")
    val key = arbiter.toAbsolutePath.normalize.toString
    val monitor = monitorStripes(math.floorMod(key.hashCode, monitorStripes.length))
    monitor.synchronized {
      val ch = FileChannel.open(arbiter,
        StandardOpenOption.CREATE, StandardOpenOption.WRITE)
      try {
        val lock = ch.lock()
        try body finally lock.release()
      } finally ch.close()
    }
  }

  override def putIfAbsent(target: Path, content: String): Boolean = {
    val dir = target.getParent
    Files.createDirectories(dir)
    val tmp = dir.resolve(s".tmp-${java.util.UUID.randomUUID()}")
    Files.writeString(tmp, content, UTF_8)
    try withDirLock(dir) {
      if (Files.exists(target)) false
      else {
        Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
        true
      }
    } finally Files.deleteIfExists(tmp)
  }

  override def alias(target: Path, src: Path): Unit =
    if (!Files.exists(target)) {
      val dir = target.getParent
      Files.createDirectories(dir)
      val tmp = dir.resolve(s".tmp-${java.util.UUID.randomUUID()}")
      Files.copy(src, tmp)
      try withDirLock(dir) {
        if (!Files.exists(target))
          Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
      } finally Files.deleteIfExists(tmp)
    }
}
