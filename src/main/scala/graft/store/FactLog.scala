package graft.store

import java.nio.file.{Files, Path => JPath}
import scala.jdk.CollectionConverters._
import scala.collection.mutable
import scala.util.Using

import org.apache.hadoop.fs.{Path => HPath}

/** Directory-stream helpers that always close the underlying JDK stream
  * (Files.list/walk leak a file descriptor per call otherwise — fatal in a
  * long-running server process). */
private[graft] object DirStreams {
  def listNames[A](dir: JPath)(f: Iterator[String] => A): A =
    Using.resource(Files.list(dir))(s => f(s.iterator().asScala.map(_.getFileName.toString)))
  def listPaths[A](dir: JPath)(f: Iterator[JPath] => A): A =
    Using.resource(Files.list(dir))(s => f(s.iterator().asScala))
  /** Depth-first delete of a file or directory tree. */
  def deleteTree(p: JPath): Unit =
    if (Files.exists(p)) {
      if (Files.isDirectory(p))
        Using.resource(Files.walk(p)) { s =>
          s.sorted(java.util.Comparator.reverseOrder[JPath]())
            .forEach(f => Files.deleteIfExists(f))
        }
      else Files.deleteIfExists(p)
    }
}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** One committed append batch. The commit log is the source of truth for
  * what is visible: a data file is part of the store iff a commit record
  * references it. Commit metadata doubles as a file-level index (position and
  * ingestion-time ranges per file), which finders use to prune files before
  * Spark ever lists them — the scale-path analogue of the reference's
  * secondary indexes (SURVEY §2 #22-24).
  */
final case class CommitRecord(
    seq: Long,
    firstPosition: Long,
    lastPosition: Long,
    appendedAtNanos: Long,
    idempotencyKey: String,
    files: Seq[String], // relative to store dir
    bloom: Option[Array[Byte]] = None // Blooms over id/type/subject/tag entries
)

/** Per compacted file: path + metadata ranges, attribute bloom for pruning
  * (range cuts for position/time, bloom for type/subject/tags), and the
  * optional entry-index sidecar (exact per-entry count/max-position/last-id,
  * written sorted so probes answer from one parquet page — the bloom's
  * false positives stop costing a bucket scan). */
final case class FileMeta(path: String, minPos: Long, maxPos: Long,
    minNanos: Long, maxNanos: Long, bloom: Option[Array[Byte]] = None,
    index: Option[String] = None)

/** A committed data file (or directory) + its pruning bloom + entry index. */
final case class FileRef(path: String, bloom: Option[Array[Byte]],
    index: Option[String] = None)

/** A checkpoint at seq K supersedes commit records 1..K: the facts live in
  * few position-bucketed compacted files and the idempotency-key set is
  * carried forward. Published with the same put-if-absent CAS as commits, so
  * exactly one checkpoint exists per seq and readers switch atomically.
  * This caps both file count and commit-log length — the knob that keeps a
  * store with millions of appends readable at 100 TB. */
final case class Checkpoint(seq: Long, lastPosition: Long, appendedAtNanos: Long,
    idempotencyKeys: Set[String], files: Seq[FileMeta])

/** The writer's view of the log head (continues across checkpoints). */
final case class HeadState(seq: Long, lastPosition: Long, appendedAtNanos: Long)

/** Per-store append-only log with an optimistic single-winner commit
  * protocol, replacing the reference's FoundationDB serializable
  * transactions (fdb/FdbFactAppender.kt:33-122):
  *
  *   1. read head (last commit or checkpoint)
  *   2. caller evaluates idempotency + conditions against the committed log
  *   3. write data file(s) with positions head+1..head+N (uncommitted)
  *   4. atomically publish commit record `seq = head.seq+1` via the
  *      [[CommitPublisher]] put-if-absent CAS (hard link on POSIX,
  *      conditional PUT on object stores, rename-if-absent on HDFS) —
  *      exactly one writer wins a given seq; losers delete their data file
  *      and retry, re-evaluating conditions (mirrors FDB's retry loop,
  *      making the exactly-one-winner concurrency contract hold)
  *
  * Readers take the latest checkpoint plus the contiguous committed suffix
  * after it, so they see an atomic, snapshot-isolated view regardless of
  * in-flight writers or compactions.
  *
  * All metadata/data IO goes through the [[StoreVfs]] the store root was
  * opened with: plain local roots use the direct `java.nio` fast path;
  * URI roots (`file://`, `hdfs://`, `s3a://`) run through the Hadoop
  * FileSystem client, so the same log physically lives on cluster storage.
  */
final class FactLog(val storeDir: HPath, val vfs: StoreVfs,
    val publisher: CommitPublisher) {

  def this(storeDir: JPath, publisher: CommitPublisher) =
    this(new HPath(storeDir.toString), NioVfs, publisher)
  def this(storeDir: JPath) = this(storeDir, CommitPublisher.default)
  def this(storeDir: HPath, vfs: StoreVfs) =
    this(storeDir, vfs, CommitPublisher.default)

  private val commitsDir = new HPath(storeDir, "commits")
  private val dataDir = new HPath(storeDir, "data")
  private val checkpointsDir = new HPath(storeDir, "checkpoints")
  vfs.mkdirs(commitsDir)
  vfs.mkdirs(dataDir)

  // cache: commits already parsed (append-only and immutable once written,
  // so caching by seq is always safe — even across vacuums)
  private val cache = mutable.LongMap[CommitRecord]()

  private def commitPath(seq: Long): HPath = new HPath(commitsDir, f"$seq%020d.commit")

  /** Contiguous committed records with seq > `after` (stops at first gap). */
  def commitsAfter(after: Long): Seq[CommitRecord] = synchronized {
    val out = mutable.ArrayBuffer[CommitRecord]()
    var seq = after + 1
    var more = true
    while (more) {
      cache.get(seq) match {
        case Some(r) => out += r; seq += 1
        case None =>
          val p = commitPath(seq)
          if (vfs.exists(p)) {
            val r = parse(vfs.readString(p))
            cache(seq) = r
            out += r
            seq += 1
          } else more = false
      }
    }
    out.toSeq
  }

  /** Latest checkpoint (if any) + commit records after it — the atomic read
    * view every reader uses. */
  def snapshot(): (Option[Checkpoint], Seq[CommitRecord]) = {
    val ckpt = latestCheckpoint()
    (ckpt, commitsAfter(ckpt.map(_.seq).getOrElse(0L)))
  }

  /** Writer head: last commit if any, else the checkpoint, else origin. */
  def headState(): HeadState = {
    val (ckpt, recs) = snapshot()
    recs.lastOption
      .map(r => HeadState(r.seq, r.lastPosition, r.appendedAtNanos))
      .orElse(ckpt.map(c => HeadState(c.seq, c.lastPosition, c.appendedAtNanos)))
      .getOrElse(HeadState(0L, 0L, Long.MinValue))
  }

  def headPosition(): Long = headState().lastPosition

  def idempotencyKeys(): Set[String] = {
    val (ckpt, recs) = snapshot()
    ckpt.map(_.idempotencyKeys).getOrElse(Set.empty) ++ recs.iterator.map(_.idempotencyKey)
  }

  /** Attempt to publish `record` (with the given seq). True iff this writer
    * won the CAS for that seq. */
  def tryCommit(record: CommitRecord): Boolean =
    publisher.putIfAbsent(commitPath(record.seq), render(record))

  /** Fresh uncommitted data-file path (relative name returned). */
  def newDataFileName(): String = s"${java.util.UUID.randomUUID()}.parquet"
  def resolveData(rel: String): HPath = new HPath(dataDir, rel)
  def resolve(rel: String): HPath = new HPath(storeDir, rel)

  /** Absolute paths of all committed data files, optionally pruned by
    * position range and/or appendedAt-nanos range (both inclusive bounds on
    * overlap). Pruning uses only commit/checkpoint metadata — no file
    * listing, no footer reads — so a 100 TB store scoped to a replay cursor
    * or time window touches only the overlapping files. */
  def committedFiles(
      minPos: Long = Long.MinValue, maxPos: Long = Long.MaxValue,
      minNanos: Long = Long.MinValue, maxNanos: Long = Long.MaxValue): Seq[String] =
    committedFileRefs(minPos, maxPos, minNanos, maxNanos).map(_.path)

  /** Same, with each file's attribute bloom for probe pruning. */
  def committedFileRefs(
      minPos: Long = Long.MinValue, maxPos: Long = Long.MaxValue,
      minNanos: Long = Long.MinValue, maxNanos: Long = Long.MaxValue): Seq[FileRef] = {
    val (ckpt, incremental) = snapshot()
    val base = ckpt.toSeq.flatMap(_.files.collect {
      case f if f.maxPos >= minPos && f.minPos <= maxPos &&
        f.maxNanos >= minNanos && f.minNanos <= maxNanos =>
        FileRef(new HPath(storeDir, f.path).toString, f.bloom,
          f.index.map(i => new HPath(storeDir, i).toString))
    })
    // appendedAtNanos is monotonic non-decreasing across commits (assigned in
    // the single-writer critical section), so both prunings are range cuts.
    val inc = incremental.filter { c =>
      c.lastPosition >= minPos && c.firstPosition <= maxPos &&
      c.appendedAtNanos >= minNanos && c.appendedAtNanos <= maxNanos
    }.flatMap(c => c.files.map(f => FileRef(new HPath(storeDir, f).toString, c.bloom)))
    base ++ inc
  }

  // --- checkpoints (log compaction) -----------------------------------------

  private def checkpointPath(seq: Long): HPath =
    new HPath(checkpointsDir, f"$seq%020d.ckpt")
  private val ckptCache = mutable.LongMap[Checkpoint]() // immutable per seq

  private def checkpointSeqs(): Seq[Long] =
    vfs.listNames(checkpointsDir).filter(_.endsWith(".ckpt"))
      .map(_.stripSuffix(".ckpt").toLong)

  def latestCheckpoint(): Option[Checkpoint] =
    checkpointSeqs().sorted.lastOption.map(sq =>
      synchronized(ckptCache.getOrElseUpdate(sq, readCheckpoint(sq))))

  private def readCheckpoint(seq: Long): Checkpoint = {
    val lines = vfs.readString(checkpointPath(seq)).linesIterator.toSeq
    val h = lines.head.split('\t')
    val keys = lines.tail.iterator.filter(_.startsWith("k\t")).map(_.drop(2)).toSet
    val files = lines.tail.iterator.filter(_.startsWith("f\t")).map { l =>
      val a = l.split('\t')
      FileMeta(a(1), a(2).toLong, a(3).toLong, a(4).toLong, a(5).toLong,
        if (a.length > 6 && a(6) != "-") Some(java.util.Base64.getDecoder.decode(a(6))) else None,
        if (a.length > 7 && a(7) != "-") Some(a(7)) else None)
    }.toSeq
    Checkpoint(h(0).toLong, h(1).toLong, h(2).toLong, keys, files)
  }

  /** CAS-publish a checkpoint; true iff this writer won. */
  def tryPublishCheckpoint(c: Checkpoint): Boolean = {
    vfs.mkdirs(checkpointsDir)
    val body = new StringBuilder
    body.append(s"${c.seq}\t${c.lastPosition}\t${c.appendedAtNanos}\n")
    c.idempotencyKeys.toSeq.sorted.foreach(k => body.append(s"k\t$k\n"))
    c.files.foreach { f =>
      val b = f.bloom.map(java.util.Base64.getEncoder.encodeToString).getOrElse("-")
      val ix = f.index.getOrElse("-")
      body.append(s"f\t${f.path}\t${f.minPos}\t${f.maxPos}\t${f.minNanos}\t${f.maxNanos}\t$b\t$ix\n")
    }
    publisher.putIfAbsent(checkpointPath(c.seq), body.toString)
  }

  /** Delete commit records with seq <= `seq` and their data files — they are
    * superseded by a checkpoint. Opt-in: a concurrent reader still holding a
    * pre-checkpoint snapshot would lose its files. `stream/` aliases
    * survive (same inodes on POSIX, independent copies on object-store
    * profiles), so live subscribers are unaffected. */
  def vacuum(seq: Long): Unit = {
    commitsAfter(0L).takeWhile(_.seq <= seq).foreach { c =>
      c.files.foreach(rel => vfs.deleteTree(resolve(rel)))
      vfs.deleteIfExists(commitPath(c.seq))
    }
  }

  /** Metadata-only retention: delete all but the newest `n` checkpoint
    * FILES. Readers only ever open the latest checkpoint; the short kept
    * tail covers snapshot holders that resolved theirs just before a
    * publish. Data files are never touched — slices referenced only by a
    * dropped checkpoint become janitor-collectable after its grace
    * period. */
  def vacuumCheckpointsKeepLast(n: Int): Unit =
    checkpointSeqs().sorted.dropRight(n)
      .foreach(sq => vfs.deleteIfExists(checkpointPath(sq)))

  /** Delete checkpoint records older than `keepSeq`. With `deleteFiles`
    * their compacted files go too (full compaction rewrote everything);
    * without it only the metadata goes (incremental compaction's new
    * checkpoint still references the old buckets).
    *
    * Scope note: this only sees checkpoints whose METADATA still exists.
    * `vacuumCheckpointsKeepLast` runs after every publish and bounds that
    * metadata to a short tail, so data files referenced exclusively by an
    * already-dropped checkpoint (tier-merged-away slices) are invisible
    * here even with `deleteFiles = true`. That is by design: the janitor
    * is the sole reclaimer of tier-superseded slices — it diffs the
    * directory listing against everything any live commit/checkpoint
    * references, so it needs no metadata for the orphans, and its grace
    * period protects in-flight snapshot holders. The cost is reclaim
    * latency (up to the janitor grace period), never correctness. */
  def vacuumCheckpoints(keepSeq: Long, deleteFiles: Boolean): Unit = {
    checkpointSeqs().filter(_ < keepSeq).foreach { seq =>
      if (deleteFiles) {
        val c = readCheckpoint(seq)
        c.files.foreach { f =>
          vfs.deleteTree(resolve(f.path))
          f.index.foreach(i => vfs.deleteTree(resolve(i)))
        }
      }
      vfs.deleteIfExists(checkpointPath(seq))
    }
  }

  /** Janitor: delete store artifacts nothing references — data files/dirs
    * of crashed writers (written before a commit CAS that never happened or
    * was lost), tmp-compact directories of crashed compactions, and stale
    * `.tmp-*` CAS staging files. The happy paths clean up inline; this
    * covers process death between write and CAS.
    *
    * Safety: the referenced set is the union over EVERY commit record (by
    * directory listing — `commitsAfter(0)` would stop at the vacuum gap and
    * miss the live suffix) and EVERY checkpoint (older checkpoints' buckets
    * can be carried forward by newer incremental ones). Anything uncommitted
    * but in-flight is younger than `olderThanMillis` — the grace period is
    * the correctness knob, not an optimization: a writer stages its data
    * file strictly before its CAS, so "unreferenced AND old" is provably
    * abandoned. Returns the number of artifacts removed. */
  def janitor(olderThanMillis: Long = 3600000L): Int = {
    val cutoff = System.currentTimeMillis() - olderThanMillis
    def oldEnough(p: HPath): Boolean = vfs.modifiedMillis(p) < cutoff
    val referenced = mutable.Set[String]()
    vfs.listNames(commitsDir).filter(_.endsWith(".commit"))
      .map(_.stripSuffix(".commit").toLong).foreach { seq =>
      val rec = synchronized(cache.getOrElseUpdate(seq,
        parse(vfs.readString(commitPath(seq)))))
      rec.files.foreach(f => referenced += new HPath(storeDir, f).toString)
    }
    checkpointSeqs().foreach { seq =>
      val c = synchronized(ckptCache.getOrElseUpdate(seq, readCheckpoint(seq)))
      c.files.foreach { f =>
        referenced += new HPath(storeDir, f.path).toString
        f.index.foreach(i => referenced += new HPath(storeDir, i).toString)
      }
    }
    var removed = 0
    vfs.listPaths(dataDir).foreach { p =>
      if (!referenced.contains(p.toString) && oldEnough(p)) {
        vfs.deleteTree(p); removed += 1
      }
    }
    for (d <- Seq(commitsDir, checkpointsDir))
      vfs.listPaths(d).filter(_.getName.startsWith(".tmp-")).foreach { p =>
        if (oldEnough(p) && vfs.deleteIfExists(p)) removed += 1
      }
    removed
  }

  // --- streaming view -------------------------------------------------------
  // `stream/` holds aliases (hard links on POSIX, copies on object-store
  // and HDFS profiles) of COMMITTED data files only, created after the
  // commit CAS is won. Spark's file-source streaming can therefore tail it
  // safely: uncommitted or CAS-losing files never appear, and aliases
  // appear atomically. (Batch readers never list directories — they read
  // exact paths from commit records — so they don't need this.)
  private val streamDir = new HPath(storeDir, "stream")

  def streamPath: HPath = streamDir

  /** Link the files of a freshly committed record into `stream/`. */
  def publishToStream(rec: CommitRecord): Unit = {
    vfs.mkdirs(streamDir)
    rec.files.zipWithIndex.foreach { case (rel, i) =>
      val src = resolve(rel)
      val parts: Seq[HPath] =
        if (vfs.isDirectory(src))
          vfs.listPaths(src).filter(_.getName.endsWith(".parquet")).sortBy(_.toString)
        else Seq(src)
      parts.zipWithIndex.foreach { case (p, j) =>
        val target = new HPath(streamDir, f"${rec.seq}%020d-$i-$j.parquet")
        publisher.alias(target, p)
      }
    }
  }

  /** Idempotent backfill: make `stream/` reflect every not-yet-vacuumed
    * committed record (covers stores written before a subscriber first
    * attaches; post-commit `publishToStream` is the primary path). */
  def ensureStreamLinks(): Unit = commitsAfter(0L).foreach(publishToStream)

  // --- serialization: one line, tab-separated (ids are UUIDs, names are
  //     UUID-based — no tabs/newlines possible) -------------------------------
  private def render(r: CommitRecord): String = {
    val b = r.bloom.map(java.util.Base64.getEncoder.encodeToString).getOrElse("-")
    s"${r.seq}\t${r.firstPosition}\t${r.lastPosition}\t${r.appendedAtNanos}\t${r.idempotencyKey}\t${r.files.mkString(",")}\t$b\n"
  }
  private def parse(s: String): CommitRecord = {
    val a = s.trim.split('\t')
    CommitRecord(a(0).toLong, a(1).toLong, a(2).toLong, a(3).toLong, a(4),
      if (a.length > 5 && a(5).nonEmpty) a(5).split(',').toSeq else Seq.empty,
      if (a.length > 6 && a(6) != "-") Some(java.util.Base64.getDecoder.decode(a(6))) else None)
  }
}

/** Root-layout resolution shared by [[SparkFactStore]] and the DataSource
  * V2 provider (graft.sources.GraftDataSource): catalog filenames are the
  * SHA-256 of the store name (same name -> same file, so the put-if-absent
  * CAS enforces uniqueness and 255-char names can't exceed filename
  * limits), and each store's log lives under `stores/{storeId}`. */
private[graft] object StoreLayout {
  def catalogPath(root: HPath, name: String): HPath = {
    val h = java.security.MessageDigest.getInstance("SHA-256")
      .digest(name.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    new HPath(new HPath(root, "catalog"), s"$h.store")
  }

  /** The store's log directory, if the store exists. */
  def storeDir(root: HPath, vfs: StoreVfs, name: String): Option[HPath] = {
    val p = catalogPath(root, name)
    if (!vfs.exists(p)) None
    else Some(new HPath(new HPath(root, "stores"),
      vfs.readString(p).trim.split('\t')(0)))
  }
}

object FactLog {
  /** Canonical on-disk fact schema (SURVEY §1.3). `appended_at` is Spark
    * microsecond TimestampType; `appended_at_nanos` preserves the
    * reference's nanosecond precision (SerializableFdbFact.kt:13-14) for
    * exact half-open time-range boundaries. */
  val schema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("fact_type", StringType, nullable = false),
    StructField("subject", StringType, nullable = false),
    StructField("position", LongType, nullable = false),
    StructField("appended_at", TimestampType, nullable = false),
    StructField("appended_at_nanos", LongType, nullable = false),
    StructField("payload_data", BinaryType, nullable = true),
    StructField("payload_format", StringType, nullable = true),
    StructField("payload_schema", StringType, nullable = true),
    StructField("metadata", MapType(StringType, StringType), nullable = true),
    StructField("tags", MapType(StringType, StringType), nullable = true)
  ))

  /** Read a set of committed files as a DataFrame (empty DF if none). */
  def read(spark: SparkSession, files: Seq[String]): DataFrame =
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(files: _*)
}
