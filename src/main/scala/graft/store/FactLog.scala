package graft.store

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets.UTF_8
import scala.jdk.CollectionConverters._
import scala.collection.mutable

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
    files: Seq[String] // relative to store dir
)

/** Per-store append-only log with an optimistic single-winner commit
  * protocol, replacing the reference's FoundationDB serializable
  * transactions (fdb/FdbFactAppender.kt:33-122):
  *
  *   1. read head (last commit)
  *   2. caller evaluates idempotency + conditions against the committed log
  *   3. write data file(s) with positions head+1..head+N (uncommitted)
  *   4. atomically publish commit record `seq = head.seq+1` via hard-link
  *      CAS — exactly one writer wins a given seq; losers delete their data
  *      file and retry, re-evaluating conditions (mirrors FDB's retry loop,
  *      making the exactly-one-winner concurrency contract hold)
  *
  * Readers take the contiguous committed prefix, so they see an atomic,
  * snapshot-isolated view regardless of in-flight writers.
  */
final class FactLog(val storeDir: Path) {
  private val commitsDir = storeDir.resolve("commits")
  private val dataDir = storeDir.resolve("data")
  Files.createDirectories(commitsDir)
  Files.createDirectories(dataDir)

  // cache: commits already parsed (append-only, so safe to cache by seq)
  private val cache = mutable.LongMap[CommitRecord]()
  private var cachedUpTo = 0L

  private def commitPath(seq: Long): Path = commitsDir.resolve(f"$seq%020d.commit")

  /** Contiguous committed prefix, seq 1..K. */
  def commits(): Seq[CommitRecord] = synchronized {
    var seq = cachedUpTo + 1
    var more = true
    while (more) {
      val p = commitPath(seq)
      if (Files.exists(p)) {
        cache(seq) = parse(Files.readString(p, UTF_8))
        cachedUpTo = seq
        seq += 1
      } else more = false
    }
    (1L to cachedUpTo).map(cache)
  }

  def head(): Option[CommitRecord] = commits().lastOption
  def headPosition(): Long = head().map(_.lastPosition).getOrElse(0L)

  def idempotencyKeys(): Set[String] = commits().iterator.map(_.idempotencyKey).toSet

  /** Attempt to publish `record` (with the given seq). True iff this writer
    * won the CAS for that seq. */
  def tryCommit(record: CommitRecord): Boolean = {
    val target = commitPath(record.seq)
    val tmp = commitsDir.resolve(s".tmp-${java.util.UUID.randomUUID()}")
    Files.writeString(tmp, render(record), UTF_8)
    try {
      Files.createLink(target, tmp) // atomic create-if-absent on POSIX
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    } finally Files.deleteIfExists(tmp)
  }

  /** Fresh uncommitted data-file path (relative name returned). */
  def newDataFileName(): String = s"${java.util.UUID.randomUUID()}.parquet"
  def resolveData(rel: String): Path = dataDir.resolve(rel)

  // --- streaming view -------------------------------------------------------
  // `stream/` holds hard links to COMMITTED data files only, created after
  // the commit CAS is won. Spark's file-source streaming can therefore tail
  // it safely: uncommitted or CAS-losing files never appear, and links
  // appear atomically. (Batch readers never list directories — they read
  // exact paths from commit records — so they don't need this.)
  private val streamDir = storeDir.resolve("stream")

  def streamPath: Path = streamDir

  /** Link the files of a freshly committed record into `stream/`. */
  def publishToStream(rec: CommitRecord): Unit = {
    Files.createDirectories(streamDir)
    rec.files.zipWithIndex.foreach { case (rel, i) =>
      val src = storeDir.resolve(rel)
      val parts: Seq[Path] =
        if (Files.isDirectory(src))
          Files.list(src).iterator().asScala
            .filter(_.getFileName.toString.endsWith(".parquet")).toSeq.sortBy(_.toString)
        else Seq(src)
      parts.zipWithIndex.foreach { case (p, j) =>
        val target = streamDir.resolve(f"${rec.seq}%020d-$i-$j.parquet")
        try Files.createLink(target, p)
        catch { case _: java.nio.file.FileAlreadyExistsException => () }
      }
    }
  }

  /** Idempotent backfill: make `stream/` reflect every committed record
    * (covers stores written before a subscriber first attaches). */
  def ensureStreamLinks(): Unit = commits().foreach(publishToStream)

  /** Absolute paths of all committed data files, optionally pruned by
    * position range and/or appendedAt-nanos range (both inclusive bounds on
    * overlap). Pruning uses only commit metadata — no file listing, no
    * footer reads — so a 100 TB store scoped to a replay cursor or time
    * window touches only the overlapping files. */
  def committedFiles(
      minPos: Long = Long.MinValue, maxPos: Long = Long.MaxValue,
      minNanos: Long = Long.MinValue, maxNanos: Long = Long.MaxValue): Seq[String] = {
    val cs = commits()
    // appendedAtNanos is monotonic non-decreasing across commits (assigned in
    // the single-writer critical section), so both prunings are range cuts.
    cs.filter { c =>
      c.lastPosition >= minPos && c.firstPosition <= maxPos &&
      c.appendedAtNanos >= minNanos && c.appendedAtNanos <= maxNanos
    }.flatMap(_.files).map(f => storeDir.resolve(f).toString)
  }

  // --- serialization: one line, tab-separated (ids are UUIDs, names are
  //     UUID-based — no tabs/newlines possible) -------------------------------
  private def render(r: CommitRecord): String =
    s"${r.seq}\t${r.firstPosition}\t${r.lastPosition}\t${r.appendedAtNanos}\t${r.idempotencyKey}\t${r.files.mkString(",")}\n"
  private def parse(s: String): CommitRecord = {
    val a = s.trim.split('\t')
    CommitRecord(a(0).toLong, a(1).toLong, a(2).toLong, a(3).toLong, a(4),
      if (a.length > 5 && a(5).nonEmpty) a(5).split(',').toSeq else Seq.empty)
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
