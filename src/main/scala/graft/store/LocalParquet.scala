package graft.store

import java.nio.file.{Files => JFiles, Path => JPath}
import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport, GroupWriteSupport}
import org.apache.parquet.hadoop.api.ReadSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.schema.{MessageType, MessageTypeParser}

import graft.core.{Fact, TagQuery, TagQueryItem}

/** Small-append fast path: direct parquet-mr I/O for the latency-critical
  * store operations, bypassing Spark job scheduling entirely.
  *
  * The reference's single-fact append is one FoundationDB transaction
  * (sub-ms); paying two Spark jobs (~100-300 ms each) per append made the
  * 10-writer conditional-append p90 ~13x over BASELINE's 500 ms target.
  * Writing the handful of rows with ParquetWriter and evaluating limit-1
  * condition probes with a projected local scan brings a small append to
  * single-digit ms while staying byte-compatible with the Spark readers
  * (same column names/logical types as FactLog.schema; Spark's vectorized
  * reader consumes these files unchanged, and the local scanner reads
  * Spark-written files). Large scans still go through Spark — callers
  * switch on total pruned-file bytes.
  */
object LocalParquet {

  /** Local scans performed (test observability: lets the contract suite
    * assert that replay/subscribe page incrementally — one scan per window —
    * instead of materializing a whole range in one read). */
  private[graft] val scanCount = new java.util.concurrent.atomic.AtomicLong(0)

  /** parquet-mr rendering of FactLog.schema (STRING = UTF8 annotation;
    * appended_at is INT64 TIMESTAMP micros, UTC-adjusted, matching what
    * Spark writes for TimestampType with outputTimestampType=MICROS).
    * Every field is `optional` to match Spark's writer convention —
    * parquet-mr's read-projection check wants repetition levels to agree
    * with the file, and store files come from both writers. */
  val MessageSchema: MessageType = MessageTypeParser.parseMessageType(
    """message fact {
      |  optional binary id (STRING);
      |  optional binary fact_type (STRING);
      |  optional binary subject (STRING);
      |  optional int64 position;
      |  optional int64 appended_at (TIMESTAMP(MICROS, true));
      |  optional int64 appended_at_nanos;
      |  optional binary payload_data;
      |  optional binary payload_format (STRING);
      |  optional binary payload_schema (STRING);
      |  optional group metadata (MAP) {
      |    repeated group key_value {
      |      required binary key (STRING);
      |      optional binary value (STRING);
      |    }
      |  }
      |  optional group tags (MAP) {
      |    repeated group key_value {
      |      required binary key (STRING);
      |      optional binary value (STRING);
      |    }
      |  }
      |}""".stripMargin)

  // Configurations are built once: `new Configuration()` parses XML
  // resources (~10 ms) — too slow for the per-append path.
  private lazy val writeConf = {
    val c = new Configuration()
    GroupWriteSupport.setSchema(MessageSchema, c)
    c
  }
  // shared by every footer open (partPosRange / projectionForFile): the
  // tail fast path opens each NEWLY COMMITTED file once, so a fresh
  // Configuration per open put ~2×10 ms of XML parsing on every live
  // delivery — measured by TailBench before this was shared
  private lazy val footerConf = new Configuration()
  private lazy val projConfs = new java.util.concurrent.ConcurrentHashMap[String, Configuration]()
  private def confFor(projection: String): Configuration =
    projConfs.computeIfAbsent(projection, p => {
      val c = new Configuration()
      c.set(ReadSupport.PARQUET_READ_SCHEMA, p)
      c
    })

  /** Write fact rows to one parquet file without Spark. The target is a
    * Hadoop path, so the same writer serves local stores and URI-rooted
    * ones (parquet-mr resolves the FileSystem from the path's scheme). */
  def write(target: HPath, rows: Seq[FactRow]): Unit = {
    val conf = writeConf
    val factory = new SimpleGroupFactory(MessageSchema)
    val writer = ExampleParquetWriter.builder(target)
      .withConf(conf)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
    try rows.foreach { r =>
      val g = factory.newGroup()
      g.add("id", r.id)
      g.add("fact_type", r.fact_type)
      g.add("subject", r.subject)
      g.add("position", r.position)
      g.add("appended_at", Math.floorDiv(r.appended_at_nanos, 1000L)) // micros
      g.add("appended_at_nanos", r.appended_at_nanos)
      if (r.payload_data != null)
        g.add("payload_data", org.apache.parquet.io.api.Binary.fromConstantByteArray(r.payload_data))
      r.payload_format.foreach(g.add("payload_format", _))
      r.payload_schema.foreach(g.add("payload_schema", _))
      addMap(g, "metadata", r.metadata)
      addMap(g, "tags", r.tags)
      writer.write(g)
    } finally writer.close()
  }

  private def addMap(g: Group, field: String, m: Map[String, String]): Unit =
    if (m != null && m.nonEmpty) {
      val mg = g.addGroup(field)
      m.foreach { case (k, v) =>
        val kv = mg.addGroup("key_value")
        kv.add("key", k)
        kv.add("value", v)
      }
    }

  // --- local scans -----------------------------------------------------------

  /** Projection WITHOUT appended_at: sidesteps INT96 variance in files
    * written by differently-configured Spark sessions; `Fact.appendedAt`
    * derives from appended_at_nanos anyway. */
  private val FullProjection =
    """message fact {
      |  optional binary id (STRING);
      |  optional binary fact_type (STRING);
      |  optional binary subject (STRING);
      |  optional int64 position;
      |  optional int64 appended_at_nanos;
      |  optional binary payload_data;
      |  optional binary payload_format (STRING);
      |  optional binary payload_schema (STRING);
      |  optional group metadata (MAP) {
      |    repeated group key_value {
      |      required binary key (STRING);
      |      optional binary value (STRING);
      |    }
      |  }
      |  optional group tags (MAP) {
      |    repeated group key_value {
      |      required binary key (STRING);
      |      optional binary value (STRING);
      |    }
      |  }
      |}""".stripMargin

  private val ProbeProjection =
    """message fact {
      |  optional binary id (STRING);
      |  optional binary fact_type (STRING);
      |  optional binary subject (STRING);
      |  optional int64 position;
      |  optional group tags (MAP) {
      |    repeated group key_value {
      |      required binary key (STRING);
      |      optional binary value (STRING);
      |    }
      |  }
      |}""".stripMargin

  /** A file path or a directory of part files — expand to parquet parts.
    * Strings are store paths: plain absolute paths take the `java.nio`
    * fast path; URI paths (`file:`, `hdfs:`, ...) list through the Hadoop
    * FileSystem client. */
  private[graft] def parts(s: String): Seq[String] =
    if (s.startsWith("/")) { // plain local path
      val p = JPath.of(s)
      if (JFiles.isDirectory(p))
        DirStreams.listPaths(p)(
          _.map(_.toString).filter(_.endsWith(".parquet")).toSeq.sorted)
      else Seq(s)
    } else {
      val p = new HPath(s)
      val fs = p.getFileSystem(footerConf)
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).iterator.map(_.getPath.toString)
          .filter(_.endsWith(".parquet")).toSeq.sorted
      else Seq(s)
    }

  private def sizeOf(s: String): Long =
    if (s.startsWith("/")) JFiles.size(JPath.of(s))
    else { val p = new HPath(s); p.getFileSystem(footerConf).getFileStatus(p).getLen }

  /** Total bytes of the given files/dirs — the local-vs-Spark switch. */
  def totalBytes(files: Seq[String]): Long =
    files.iterator.flatMap(parts).map(sizeOf).sum

  // Committed files are immutable, so the per-file pruned read schema can be
  // cached forever (footer read once per file per process).
  private val fileProjectionCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  // Per-part position min/max from footer row-group statistics, cached
  // forever (immutable files): lets a windowed replay open only the 1-2
  // parts overlapping each window instead of every part of the commit.
  private val partPosRangeCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()

  private def partPosRange(p: String): (Long, Long) =
    partPosRangeCache.computeIfAbsent(p, { _ =>
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(new HPath(p), footerConf))
      try {
        var mn = Long.MaxValue
        var mx = Long.MinValue
        reader.getFooter.getBlocks.forEach { block =>
          block.getColumns.forEach { c =>
            if (c.getPath.toDotString == "position") {
              val st = c.getStatistics
              if (st != null && st.hasNonNullValue) {
                mn = math.min(mn, st.genericGetMin.asInstanceOf[java.lang.Long])
                mx = math.max(mx, st.genericGetMax.asInstanceOf[java.lang.Long])
              }
            }
          }
        }
        if (mn == Long.MaxValue) (Long.MinValue, Long.MaxValue) else (mn, mx)
      } finally reader.close()
    })

  /** Projection pruned AGAINST THE FILE'S OWN SCHEMA: parquet-mr's
    * projection check requires repetition levels (required vs optional) to
    * match the file, and store files come from two writers — this writer
    * (all-optional) and Spark (non-nullable columns become `required`,
    * e.g. bulkAppend's generated ids). Copying the file's own field types
    * keeps both readable with one code path. */
  private def projectionForFile(p: String, projectionKey: String, wanted: MessageType): String =
    fileProjectionCache.computeIfAbsent((p, projectionKey), { _ =>
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(new HPath(p), footerConf))
      try {
        val fileSchema = reader.getFooter.getFileMetaData.getSchema
        val kept = new java.util.ArrayList[org.apache.parquet.schema.Type]()
        wanted.getFields.forEach { f =>
          if (fileSchema.containsField(f.getName))
            kept.add(fileSchema.getFields.get(fileSchema.getFieldIndex(f.getName)))
        }
        new MessageType("fact", kept).toString
      } finally reader.close()
    })

  private def scan[A](files: Seq[String], projection: String,
      posRange: Option[(Long, Long)] = None)(
      consume: Iterator[Group] => A): A = {
    scanCount.incrementAndGet()
    val wanted = MessageTypeParser.parseMessageType(projection)
    // Position-window pushdown: a real parquet filter lets the reader skip
    // whole row groups via column statistics, so a batch-sized replay
    // window over a large multi-row-group commit reads O(window) — not
    // O(commit) — bytes. (Files are written in position order, so row-group
    // min/max stats cut precisely.)
    val filter = posRange.map { case (lo, hi) =>
      import org.apache.parquet.filter2.predicate.FilterApi._
      org.apache.parquet.filter2.compat.FilterCompat.get(
        and(gtEq(longColumn("position"), java.lang.Long.valueOf(lo)),
          ltEq(longColumn("position"), java.lang.Long.valueOf(hi))))
    }
    val it = files.iterator.flatMap(parts)
      .filter(p => posRange.forall { case (lo, hi) =>
        val (mn, mx) = partPosRange(p)
        mx >= lo && mn <= hi // skip parts wholly outside the window
      })
      .flatMap { p =>
      val conf = confFor(projectionForFile(p, projection, wanted))
      val builder = ParquetReader.builder(new GroupReadSupport(), new HPath(p))
        .withConf(conf)
      val reader = filter.fold(builder)(builder.withFilter).build()
      new Iterator[Group] {
        private var nextG = reader.read()
        override def hasNext: Boolean = {
          if (nextG == null) reader.close()
          nextG != null
        }
        override def next(): Group = { val g = nextG; nextG = reader.read(); g }
      }
    }
    consume(it)
  }

  private def readMap(g: Group, field: String): Map[String, String] = {
    if (g.getFieldRepetitionCount(field) == 0) return Map.empty
    val mg = g.getGroup(field, 0)
    val n = mg.getFieldRepetitionCount("key_value")
    val b = mutable.Map[String, String]()
    var i = 0
    while (i < n) {
      val kv = mg.getGroup("key_value", i)
      b(kv.getString("key", 0)) =
        if (kv.getFieldRepetitionCount("value") > 0) kv.getString("value", 0) else ""
      i += 1
    }
    b.toMap
  }

  private def optString(g: Group, field: String): Option[String] =
    if (g.getFieldRepetitionCount(field) > 0) Some(g.getString(field, 0)) else None

  /** Full facts in [minPos, maxPos], sorted by position. */
  def readFacts(files: Seq[String], minPos: Long = Long.MinValue,
      maxPos: Long = Long.MaxValue): Seq[Fact] =
    scan(files, FullProjection,
      posRange = if (minPos != Long.MinValue || maxPos != Long.MaxValue)
        Some((minPos, maxPos)) else None) { it =>
      it.flatMap { g =>
        val pos = g.getLong("position", 0)
        if (pos < minPos || pos > maxPos) None
        else Some(Fact(
          id = g.getString("id", 0),
          factType = g.getString("fact_type", 0),
          subject = g.getString("subject", 0),
          position = pos,
          appendedAt = Timestamps.fromNanos(g.getLong("appended_at_nanos", 0)),
          payloadData =
            if (g.getFieldRepetitionCount("payload_data") > 0)
              g.getBinary("payload_data", 0).getBytes
            else Array.emptyByteArray,
          payloadFormat = optString(g, "payload_format"),
          payloadSchema = optString(g, "payload_schema"),
          metadata = readMap(g, "metadata"),
          tags = readMap(g, "tags")))
      }.toSeq.sortBy(_.position)
    }

  /** Position of a fact id (early exit). */
  def positionOfId(files: Seq[String], factId: String): Option[Long] =
    scan(files, ProbeProjection) { it =>
      it.collectFirst { case g if g.getString("id", 0) == factId => g.getLong("position", 0) }
    }

  /** Last (max-position) fact id for a subject. */
  def lastIdOfSubject(files: Seq[String], subject: String): Option[String] =
    lastPosIdOfSubject(files, subject).map(_._2)

  /** Last (position, id) for a subject — position kept so callers can take a
    * max across index-answered and scanned file sets. */
  def lastPosIdOfSubject(files: Seq[String], subject: String): Option[(Long, String)] = {
    scan(files, ProbeProjection) { it =>
      var best: Option[(Long, String)] = None
      it.foreach { g =>
        if (g.getString("subject", 0) == subject) {
          val pos = g.getLong("position", 0)
          if (best.forall(_._1 < pos)) best = Some(pos -> g.getString("id", 0))
        }
      }
      best
    }
  }

  // --- entry-index sidecars ---------------------------------------------------
  // A compacted bucket's index has one row per distinct bloom entry
  // ("i:<id>" / "t:<type>" / "s:<subject>" / "g:<k>=<v>"): (entry, n,
  // max_pos, last_id), written SORTED by entry. Lookups push an equality
  // filter so parquet's column indexes skip to the one matching page —
  // probe cost is O(footer + page), independent of bucket row count.

  private val IndexProjection =
    """message idx {
      |  optional binary entry (STRING);
      |  optional int64 n;
      |  optional int64 max_pos;
      |  optional binary last_id (STRING);
      |}""".stripMargin

  /** One index row, if the entry occurs in the bucket. */
  final case class IndexHit(n: Long, maxPos: Long, lastId: String)

  /** Exact (count, max position, id at max position) for `entry` across the
    * given index files/dirs — one row per bucket the entry occurs in. */
  def indexLookup(indexFiles: Seq[String], entry: String): Seq[IndexHit] = {
    scanCount.incrementAndGet()
    val wanted = MessageTypeParser.parseMessageType(IndexProjection)
    val filter = {
      import org.apache.parquet.filter2.predicate.{FilterApi => FA}
      org.apache.parquet.filter2.compat.FilterCompat.get(
        FA.eq(FA.binaryColumn("entry"), org.apache.parquet.io.api.Binary.fromString(entry)))
    }
    indexFiles.iterator.flatMap(parts).flatMap { p =>
      val conf = confFor(projectionForFile(p, "idx", wanted))
      val reader = ParquetReader.builder(new GroupReadSupport(), new HPath(p))
        .withConf(conf).withFilter(filter).build()
      try {
        var out: Option[IndexHit] = None
        var g = reader.read()
        while (g != null && out.isEmpty) {
          // filter2 prunes pages; confirm the record match explicitly
          if (g.getString("entry", 0) == entry)
            out = Some(IndexHit(g.getLong("n", 0), g.getLong("max_pos", 0),
              g.getString("last_id", 0)))
          else g = reader.read()
        }
        out
      } finally reader.close()
    }.toSeq
  }

  /** Does any fact with position > afterPos match the query? (early exit) */
  def existsMatching(files: Seq[String], afterPos: Long, q: TagQuery): Boolean =
    scan(files, ProbeProjection) { it =>
      it.exists { g =>
        g.getLong("position", 0) > afterPos && {
          val ft = g.getString("fact_type", 0)
          lazy val tags = readMap(g, "tags")
          q.items.exists {
            case TagQueryItem.TagOnly(t) =>
              t.forall { case (k, v) => tags.get(k).contains(v) }
            case TagQueryItem.TagType(types, t) =>
              types.contains(ft) && t.forall { case (k, v) => tags.get(k).contains(v) }
          }
        }
      }
    }
}
