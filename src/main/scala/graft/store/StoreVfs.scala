package graft.store

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files => JFiles, Path => JPath, Paths => JPaths, StandardCopyOption}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** The filesystem surface the store layer needs, factored so a store can
  * physically live on any Hadoop-supported filesystem (HDFS, S3A, ABFS,
  * GCS — the 100 TB deployment targets) while plain local roots keep the
  * direct `java.nio` fast path the latency-critical append relies on.
  *
  * Division of labor with [[CommitPublisher]]: the publisher owns the ONE
  * arbitration primitive (put-if-absent) plus stream aliasing; this trait
  * owns everything that needs no arbitration — reads of already-published
  * metadata, listings, deletes, mkdirs, and writer-unique renames (targets
  * are UUID-named, so visibility is conferred solely by the commit CAS
  * that references them, never by the rename itself).
  *
  * Path convention: the store layer addresses everything as
  * `org.apache.hadoop.fs.Path`. Roots constructed from a plain
  * `java.nio.file.Path` produce scheme-less paths whose string form is a
  * plain absolute path (byte-identical behavior with the pre-VFS layout);
  * URI roots (`file://...`, `hdfs://...`) keep their scheme end to end, so
  * every derived path string handed to Spark / parquet-mr is itself a
  * valid URI on the same filesystem.
  *
  * The reference delegates this entire concern to FoundationDB + blob
  * ranges (fdb/FdbFactAppender.kt:33-45); here it is the filesystem
  * binding the deployment chooses.
  */
trait StoreVfs {
  def readString(p: HPath): String
  def exists(p: HPath): Boolean
  def isDirectory(p: HPath): Boolean
  def mkdirs(p: HPath): Unit
  /** Delete a single file if present; true iff something was deleted. */
  def deleteIfExists(p: HPath): Boolean
  /** Recursive delete of a file or directory tree (missing = no-op). */
  def deleteTree(p: HPath): Unit
  /** Child FILE/DIR names of `dir` (empty if `dir` is missing). */
  def listNames(dir: HPath): Seq[String]
  /** Child paths of `dir` (empty if `dir` is missing). */
  def listPaths(dir: HPath): Seq[HPath]
  def size(p: HPath): Long
  def modifiedMillis(p: HPath): Long
  /** Move a writer-unique artifact into place (same filesystem). Never an
    * arbitration point — the target name is unique by construction. */
  def rename(src: HPath, dst: HPath): Unit
}

/** Path bridging between the store layer's Hadoop paths and `java.nio`. */
private[graft] object VfsPaths {
  /** Local `java.nio` view of `p`; defined only for scheme-less and
    * `file:` paths (the profiles that may legally touch the local disk). */
  def toNio(p: HPath): JPath = {
    val uri = p.toUri
    uri.getScheme match {
      case null => JPaths.get(uri.getPath)
      case "file" => JPaths.get(uri)
      case other => throw new IllegalArgumentException(
        s"path $p has scheme '$other' — not a local filesystem path")
    }
  }

  def isLocal(p: HPath): Boolean = {
    val s = p.toUri.getScheme
    s == null || s == "file"
  }
}

object StoreVfs {
  /** Root dispatch: scheme-less strings are plain local paths (nio fast
    * path, today's exact on-disk behavior); anything with a URI scheme —
    * including `file:` — runs through the Hadoop [[FileSystem]] client, so
    * the whole store stack can be exercised against the cluster-filesystem
    * API with no cluster present (the same emulation discipline as the
    * conditional-put publisher profile). */
  def forRoot(root: String, conf: Configuration = new Configuration()): (HPath, StoreVfs) = {
    val p = new HPath(root)
    if (p.toUri.getScheme == null) (p, NioVfs) else (p, new HadoopVfs(conf))
  }
}

/** Direct `java.nio` implementation for local roots — zero new overhead on
  * the single-digit-ms append fast path. */
object NioVfs extends StoreVfs {
  import VfsPaths.toNio

  override def readString(p: HPath): String = JFiles.readString(toNio(p), UTF_8)
  override def exists(p: HPath): Boolean = JFiles.exists(toNio(p))
  override def isDirectory(p: HPath): Boolean = JFiles.isDirectory(toNio(p))
  override def mkdirs(p: HPath): Unit = { JFiles.createDirectories(toNio(p)); () }
  override def deleteIfExists(p: HPath): Boolean = JFiles.deleteIfExists(toNio(p))
  override def deleteTree(p: HPath): Unit = DirStreams.deleteTree(toNio(p))
  override def listNames(dir: HPath): Seq[String] = {
    val d = toNio(dir)
    if (!JFiles.exists(d)) Seq.empty
    else DirStreams.listNames(d)(_.toSeq)
  }
  override def listPaths(dir: HPath): Seq[HPath] = {
    val d = toNio(dir)
    if (!JFiles.exists(d)) Seq.empty
    else DirStreams.listPaths(d)(_.map(p => new HPath(p.toString)).toSeq)
  }
  override def size(p: HPath): Long = JFiles.size(toNio(p))
  override def modifiedMillis(p: HPath): Long =
    JFiles.getLastModifiedTime(toNio(p)).toMillis
  override def rename(src: HPath, dst: HPath): Unit = {
    JFiles.move(toNio(src), toNio(dst), StandardCopyOption.ATOMIC_MOVE); ()
  }
}

/** Hadoop [[FileSystem]]-backed implementation: the binding that puts a
  * store on HDFS/S3A/ABFS. Instances are cheap — `Path.getFileSystem`
  * resolves through Hadoop's per-(scheme, authority) client cache — and
  * `conf` carries the deployment's credentials/endpoints (pass
  * `spark.sparkContext.hadoopConfiguration` on a real cluster so the
  * store sees the same filesystems as Spark's own reads). */
final class HadoopVfs(conf: Configuration) extends StoreVfs {
  private def fs(p: HPath): FileSystem = p.getFileSystem(conf)

  override def readString(p: HPath): String = {
    val in = fs(p).open(p)
    try new String(in.readAllBytes(), UTF_8) finally in.close()
  }
  override def exists(p: HPath): Boolean = fs(p).exists(p)
  override def isDirectory(p: HPath): Boolean = {
    val f = fs(p)
    f.exists(p) && f.getFileStatus(p).isDirectory
  }
  override def mkdirs(p: HPath): Unit = { fs(p).mkdirs(p); () }
  override def deleteIfExists(p: HPath): Boolean =
    try fs(p).delete(p, false)
    catch { case _: java.io.FileNotFoundException => false }
  override def deleteTree(p: HPath): Unit = {
    val f = fs(p)
    if (f.exists(p)) { f.delete(p, true); () }
  }
  override def listNames(dir: HPath): Seq[String] =
    listPaths(dir).map(_.getName)
  override def listPaths(dir: HPath): Seq[HPath] = {
    val f = fs(dir)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq.map(_.getPath)
  }
  override def size(p: HPath): Long = fs(p).getFileStatus(p).getLen
  override def modifiedMillis(p: HPath): Long =
    fs(p).getFileStatus(p).getModificationTime
  override def rename(src: HPath, dst: HPath): Unit = {
    if (!fs(src).rename(src, dst))
      throw new java.io.IOException(s"rename $src -> $dst failed")
  }
}
