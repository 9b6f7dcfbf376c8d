package graft.store

import java.nio.channels.FileChannel
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, StandardCopyOption, StandardOpenOption}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}

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
  *  - HDFS / ABFS: stage fully to a writer-unique temp name, then a
  *    namenode-atomic `rename` that FAILS when the target exists
  *    ([[HadoopFsPublisher]] — rename-if-absent gives both exactly-one-
  *    winner and whole-object visibility; a bare
  *    `create(path, overwrite = false)` is create-atomic but lets readers
  *    observe a half-written record).
  * [[ConditionalPutPublisher]] emulates the object-store profile on local
  * disk so the whole protocol test suite (including the multi-process
  * race) can run against those semantics: no hard links anywhere — stream
  * aliases COPY (the analogue of server-side COPY) — and put-if-absent as
  * the only arbitration primitive the protocol sees. [[HadoopFsPublisher]]
  * does the same for the HDFS profile, running every byte through the
  * Hadoop [[FileSystem]] client.
  */
trait CommitPublisher {
  def name: String

  /** Atomically publish `content` at `target` iff absent; true iff this
    * writer won. Losers leave no trace. Readers of `target` see either
    * nothing or the complete content, never a partial write. */
  def putIfAbsent(target: HPath, content: String): Boolean

  /** Make committed data file `src` additionally visible at `target`
    * (create-if-absent, idempotent; concurrent publishers of the same
    * target are all satisfied by whichever copy lands). */
  def alias(target: HPath, src: HPath): Unit

  /** `java.nio` bridges for local-path callers. */
  final def putIfAbsent(target: Path, content: String): Boolean =
    putIfAbsent(new HPath(target.toString), content)
  final def alias(target: Path, src: Path): Unit =
    alias(new HPath(target.toString), new HPath(src.toString))
}

object CommitPublisher {
  /** Publisher selection for stores opened without an explicit choice:
    * `-Dgraft.commit.publisher=posix|conditional-put|hadoop` (the knob the
    * multi-process race spec uses to point a child JVM at the same
    * publisher as its parent). Defaults to the POSIX hard-link CAS. */
  def default: CommitPublisher =
    forName(System.getProperty("graft.commit.publisher", PosixLinkPublisher.name))

  def forName(name: String): CommitPublisher = name match {
    case PosixLinkPublisher.name => PosixLinkPublisher
    case ConditionalPutPublisher.name => ConditionalPutPublisher
    case HadoopFsPublisher.name => HadoopFsPublisher.default
    case other => throw new IllegalArgumentException(
      s"unknown commit publisher '$other' (expected '${PosixLinkPublisher.name}', " +
        s"'${ConditionalPutPublisher.name}', or '${HadoopFsPublisher.name}')")
  }
}

/** Per-directory advisory-lock arbiter shared by the emulation profiles.
  *
  * Stands in, ON LOCAL DISK ONLY, for the store service's own concurrency
  * control — S3's conditional-PUT arbitration, the HDFS namenode's atomic
  * rename: an advisory `FileChannel.lock` on a per-directory
  * `.cas-arbiter` file serializes check-then-publish across processes. A
  * crashed holder's flock is released by the OS. JVM FileLock throws
  * OverlappingFileLockException on same-process re-entry, so in-JVM
  * contenders serialize on a monitor first; monitors are a FIXED stripe
  * array keyed by the arbiter path's hash — bounded memory for a
  * long-running server publishing to unboundedly many store directories
  * (a per-directory map grew one Object per directory ever touched, never
  * evicted). Two directories sharing a stripe merely serialize a little
  * coarser in-JVM; same directory always maps to the same stripe, which
  * is all correctness needs. */
private[store] object DirArbiter {
  private val monitorStripes = Array.fill(128)(new Object)

  def withDirLock[A](dir: Path)(body: => A): A = {
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
}

/** POSIX profile: stage content in a same-directory temp file, then
  * `link(2)` it to the target — atomic create-if-absent with whole-object
  * visibility (the content exists in full before the name does). The
  * store's original commit primitive, now behind the seam. Local paths
  * only. */
object PosixLinkPublisher extends CommitPublisher {
  val name = "posix"

  override def putIfAbsent(target: HPath, content: String): Boolean = {
    val t = VfsPaths.toNio(target)
    val dir = t.getParent
    Files.createDirectories(dir)
    val tmp = dir.resolve(s".tmp-${java.util.UUID.randomUUID()}")
    Files.writeString(tmp, content, UTF_8)
    try {
      Files.createLink(t, tmp)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    } finally Files.deleteIfExists(tmp)
  }

  override def alias(target: HPath, src: HPath): Unit = {
    val t = VfsPaths.toNio(target)
    Files.createDirectories(t.getParent)
    try Files.createLink(t, VfsPaths.toNio(src))
    catch { case _: java.nio.file.FileAlreadyExistsException => () }
  }
}

/** Object-store profile, emulated on local disk: the protocol sees ONLY
  * conditional-PUT semantics — put-if-absent with whole-object visibility,
  * no hard links (aliases copy bytes, the stand-in for server-side COPY),
  * no rename exposed to the protocol.
  *
  * Emulation mechanics (internal to this test double, invisible to the
  * protocol): [[DirArbiter]] serializes check-then-publish across
  * processes, and the publish itself is a same-directory ATOMIC_MOVE of
  * fully-staged content so readers get the whole-object guarantee a real
  * conditional PUT provides. Staged `.tmp-*` files are janitor-collected —
  * no burned sequence numbers, no partial records. */
object ConditionalPutPublisher extends CommitPublisher {
  val name = "conditional-put"

  override def putIfAbsent(target: HPath, content: String): Boolean = {
    val t = VfsPaths.toNio(target)
    val dir = t.getParent
    Files.createDirectories(dir)
    val tmp = dir.resolve(s".tmp-${java.util.UUID.randomUUID()}")
    Files.writeString(tmp, content, UTF_8)
    try DirArbiter.withDirLock(dir) {
      if (Files.exists(t)) false
      else {
        Files.move(tmp, t, StandardCopyOption.ATOMIC_MOVE)
        true
      }
    } finally Files.deleteIfExists(tmp)
  }

  override def alias(target: HPath, src: HPath): Unit = {
    val t = VfsPaths.toNio(target)
    if (!Files.exists(t)) {
      val dir = t.getParent
      Files.createDirectories(dir)
      val tmp = dir.resolve(s".tmp-${java.util.UUID.randomUUID()}")
      Files.copy(VfsPaths.toNio(src), tmp)
      try DirArbiter.withDirLock(dir) {
        if (!Files.exists(t))
          Files.move(tmp, t, StandardCopyOption.ATOMIC_MOVE)
      } finally Files.deleteIfExists(tmp)
    }
  }
}

/** HDFS/ABFS profile over the Hadoop [[FileSystem]] client: stage the
  * record fully at a writer-unique `.tmp-*` name, then publish via
  * rename-if-absent. On real HDFS the rename is namenode-atomic and fails
  * when the target exists — exactly-one-winner AND whole-object visibility
  * in one primitive, with no lock anywhere. Aliases copy bytes (no hard
  * links on HDFS); losers' staging files are deleted inline, crashed
  * writers' by the janitor.
  *
  * Local emulation caveat (this sandbox has no namenode): for `file:`
  * URIs, `RawLocalFileSystem.rename` is POSIX rename — it silently
  * OVERWRITES an existing target — so on local filesystems only, the
  * check-then-rename runs under the same [[DirArbiter]] flock that stands
  * in for S3 in the conditional-put profile; here it stands in for the
  * namenode. On any non-local scheme the arbiter is skipped and the
  * filesystem's own rename contract is the arbitration, exactly as the
  * seam's deployment table documents. */
final class HadoopFsPublisher(conf: Configuration) extends CommitPublisher {
  val name: String = HadoopFsPublisher.name

  // raw local FS for file: paths — LocalFileSystem's checksum sidecars are
  // pure noise next to CAS-published metadata records (real HDFS has none)
  private def fsOf(p: HPath): FileSystem = p.getFileSystem(conf) match {
    case l: org.apache.hadoop.fs.LocalFileSystem => l.getRaw
    case f => f
  }

  private def renameIfAbsent(fs: FileSystem, tmp: HPath, target: HPath): Boolean =
    if (VfsPaths.isLocal(target))
      DirArbiter.withDirLock(VfsPaths.toNio(target.getParent)) {
        !fs.exists(target) && fs.rename(tmp, target)
      }
    else !fs.exists(target) && fs.rename(tmp, target) // HDFS: rename is the CAS

  override def putIfAbsent(target: HPath, content: String): Boolean = {
    val fs = fsOf(target)
    val dir = target.getParent
    fs.mkdirs(dir)
    if (fs.exists(target)) return false // cheap loser fast path, no staging
    val tmp = new HPath(dir, s".tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write(content.getBytes(UTF_8)) finally out.close()
    try renameIfAbsent(fs, tmp, target)
    finally if (fs.exists(tmp)) fs.delete(tmp, false) // loser cleanup
  }

  override def alias(target: HPath, src: HPath): Unit = {
    val fs = fsOf(target)
    if (!fs.exists(target)) {
      val dir = target.getParent
      fs.mkdirs(dir)
      val tmp = new HPath(dir, s".tmp-${java.util.UUID.randomUUID()}")
      val in = fsOf(src).open(src)
      val out = fs.create(tmp, false)
      try {
        val buf = new Array[Byte](1 << 16)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      } finally { in.close(); out.close() }
      try { renameIfAbsent(fs, tmp, target); () }
      finally if (fs.exists(tmp)) fs.delete(tmp, false)
    }
  }
}

object HadoopFsPublisher {
  val name = "hadoop"
  /** Default instance over a vanilla Configuration (resolves `file:` and,
    * on a cluster, whatever core-site.xml declares). Deployments with
    * credentials pass `spark.sparkContext.hadoopConfiguration` to the
    * class constructor instead. */
  lazy val default: HadoopFsPublisher = new HadoopFsPublisher(new Configuration())
}
