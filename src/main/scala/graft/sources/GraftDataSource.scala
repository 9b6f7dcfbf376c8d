package graft.sources

import java.nio.ByteBuffer
import java.nio.ByteOrder.LITTLE_ENDIAN
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetReader}
import org.apache.parquet.hadoop.api.ReadSupport
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, PrimitiveType}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.store.{CommitPublisher, CommitRecord, FactLog, LocalParquet, StoreLayout, StoreVfs}

/** DataSource V2 provider for fact stores: the "not my process" consumer
  * surface — any external Spark job can read a store with
  *
  * {{{
  *   spark.read.format("graft").option("root", dir).option("store", name).load()
  *   spark.readStream.format("graft")...load()   // micro-batch tail
  * }}}
  *
  * without linking the SparkFactStore facade, the Spark-idiomatic analogue
  * of the reference's client libraries (factstore-client-kotlin). The scan
  * preserves the facade's scale path end to end:
  *
  *  - '''File pruning from commit metadata''': pushed `position` /
  *    `appended_at_nanos` range filters cut the committed-file list using
  *    only commit/checkpoint records — no directory listing, no footer
  *    reads — exactly like `FactLog.committedFiles` (SURVEY §2 #24). The
  *    scan description renders `files=<kept>/<total>` so plans audit it.
  *  - '''Column pruning to the IO layer''': the pruned schema is projected
  *    into the parquet read schema, so unread columns never leave disk.
  *  - '''Snapshot isolation''': the file list derives from the latest
  *    checkpoint + contiguous commit suffix, the same atomic read view
  *    every facade reader uses; uncommitted or CAS-losing files are
  *    invisible by construction.
  *
  * Streaming offsets are commit sequence numbers (the log's native
  * cursor): micro-batch N..M reads exactly the files of commits N+1..M, so
  * re-planning a batch after recovery yields the identical file set —
  * exactly-once without a write-ahead log of its own. Partition
  * granularity is one reader per data file (append batches and compaction
  * buckets are both bounded by the store's knobs), each decoding parquet
  * via parquet-mr directly — executors never touch driver state.
  */
final class GraftDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FactLog.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val (dir, vfs) = GraftDataSource.resolveStoreDir(properties)
    new GraftTable(dir, vfs, properties.getOrDefault("store", "?"))
  }
}

object GraftDataSource {
  /** Resolve root+store options to the store's log dir (typed errors
    * before any query runs — the DSv2 rendering of the facade's
    * pre-flight `StoreNotFound`). `path` is accepted as an alias of
    * `root` so `.load(dir)` works too. Roots may be plain local paths or
    * filesystem URIs (`file://`, `hdfs://`, `s3a://`) — URI roots run all
    * metadata reads through the Hadoop FileSystem client, same dispatch
    * as [[graft.store.SparkFactStore.at]]. */
  private[sources] def resolveStoreDir(props: JMap[String, String]): (HPath, StoreVfs) = {
    val root = Option(props.get("root")).orElse(Option(props.get("path")))
      .getOrElse(throw new IllegalArgumentException(
        "graft: missing required option 'root' (the store root directory)"))
    val store = Option(props.get("store")).getOrElse(
      throw new IllegalArgumentException(
        "graft: missing required option 'store' (the store name)"))
    val (rootPath, vfs) = StoreVfs.forRoot(root)
    val dir = StoreLayout.storeDir(rootPath, vfs, store).getOrElse(
      throw new IllegalArgumentException(
        s"graft: store '$store' not found under root '$root'"))
    (dir, vfs)
  }
}

private[sources] final class GraftTable(storeDir: HPath, vfs: StoreVfs,
    storeName: String)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft:$storeName"
  override def schema(): StructType = FactLog.schema
  // ACCEPT_ANY_SCHEMA: writers provide the append-INPUT schema (the table
  // schema minus store-assigned id/position/appended_at*) — the write
  // builder validates it with typed errors (GraftWrite.resolveColumns).
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(
      TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.ACCEPT_ANY_SCHEMA)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(storeDir, vfs, storeName, options)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftWriteBuilder(storeDir, vfs, storeName, info)
}

/** Pushdown state: range filters on `position` / `appended_at_nanos`
  * tighten the commit-metadata pruning bounds; every filter is ALSO
  * returned as a post-scan filter (file-level pruning is conservative —
  * Spark re-applies the row-level predicate, like the built-in file
  * sources do). */
private[sources] final class GraftScanBuilder(storeDir: HPath, vfs: StoreVfs,
    storeName: String, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var minPos = Long.MinValue
  private var maxPos = Long.MaxValue
  private var minNanos = Long.MinValue
  private var maxNanos = Long.MaxValue
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = FactLog.schema

  private def lit(v: Any): Option[Long] = v match {
    case n: Number => Some(n.longValue)
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val usable = filters.filter {
      case GreaterThan("position", v) =>
        lit(v).exists { n => minPos = math.max(minPos, n + 1); true }
      case GreaterThanOrEqual("position", v) =>
        lit(v).exists { n => minPos = math.max(minPos, n); true }
      case LessThan("position", v) =>
        lit(v).exists { n => maxPos = math.min(maxPos, n - 1); true }
      case LessThanOrEqual("position", v) =>
        lit(v).exists { n => maxPos = math.min(maxPos, n); true }
      case EqualTo("position", v) =>
        lit(v).exists { n =>
          minPos = math.max(minPos, n); maxPos = math.min(maxPos, n); true }
      case GreaterThan("appended_at_nanos", v) =>
        lit(v).exists { n => minNanos = math.max(minNanos, n + 1); true }
      case GreaterThanOrEqual("appended_at_nanos", v) =>
        lit(v).exists { n => minNanos = math.max(minNanos, n); true }
      case LessThan("appended_at_nanos", v) =>
        lit(v).exists { n => maxNanos = math.min(maxNanos, n - 1); true }
      case LessThanOrEqual("appended_at_nanos", v) =>
        lit(v).exists { n => maxNanos = math.min(maxNanos, n); true }
      case EqualTo("appended_at_nanos", v) =>
        lit(v).exists { n =>
          minNanos = math.max(minNanos, n); maxNanos = math.min(maxNanos, n); true }
      case _ => false
    }
    pushed = usable
    filters // all filters re-applied post-scan (pruning is file-level only)
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new GraftScan(storeDir, vfs, storeName, required,
      minPos, maxPos, minNanos, maxNanos,
      Option(options.get("startseq")).map(_.toLong).getOrElse(0L))
}

private[sources] final class GraftScan(storeDir: HPath, vfs: StoreVfs,
    storeName: String,
    required: StructType, minPos: Long, maxPos: Long,
    minNanos: Long, maxNanos: Long, startSeq: Long) extends Scan {

  override def readSchema(): StructType = required

  // kept/total from ONE snapshot, computed once however many times the
  // plan is rendered (description() is called per explain/UI render; an
  // O(commit log) metadata read each time adds up on long-lived stores)
  private lazy val fileCounts: (Int, Int) = {
    val log = new FactLog(storeDir, vfs)
    val total = log.committedFiles().size // parsed records cached in `log`
    val kept = log.committedFiles(minPos, maxPos, minNanos, maxNanos).size
    (kept, total)
  }

  override def description(): String = {
    val (kept, total) = fileCounts
    s"graft store=$storeName files=$kept/$total pos=[$minPos,$maxPos] " +
      s"nanos=[$minNanos,$maxNanos] columns=${required.fieldNames.mkString(",")}"
  }

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      val log = new FactLog(storeDir, vfs)
      GraftScan.expandParts(log.committedFiles(minPos, maxPos, minNanos, maxNanos))
        .map(p => GraftInputPartition(p): InputPartition).toArray
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new GraftReaderFactory(required.fieldNames)
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftMicroBatchStream(storeDir, vfs, required.fieldNames, startSeq)
}

private[sources] object GraftScan {
  /** Bulk-append batches and compaction buckets are directories; expand to
    * their part files (driver-side, tiny listings of bounded dirs; plain
    * paths list via java.nio, URI paths via the Hadoop client). */
  def expandParts(paths: Seq[String]): Seq[String] =
    paths.flatMap(LocalParquet.parts)
}

private[sources] final case class GraftInputPartition(path: String)
    extends InputPartition

private[sources] final class GraftReaderFactory(columns: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GraftPartitionReader(
      partition.asInstanceOf[GraftInputPartition].path, columns)
}

/** Micro-batch tail of the commit log. Offsets are commit seqs; batch
  * (start, end] reads exactly the data files those commit records
  * reference, so recovery re-plans byte-identical batches. `latestOffset`
  * is the contiguous committed head — an in-flight writer's unpublished
  * seq is invisible, exactly like the facade's readers. */
private[sources] final class GraftMicroBatchStream(storeDir: HPath,
    vfs: StoreVfs, columns: Array[String], startSeq: Long) extends MicroBatchStream {

  private val log = new FactLog(storeDir, vfs)

  override def initialOffset(): Offset = GraftOffset(startSeq)
  // Head via headState(): checkpoint-aware (latest checkpoint + contiguous
  // commit suffix AFTER it). Walking commits from seq 0 would stop at the
  // gap a vacuum leaves and pin the offset at the checkpoint forever —
  // silently stalling any stream attached to a compacted+vacuumed store.
  override def latestOffset(): Offset =
    GraftOffset(math.max(log.headState().seq, startSeq))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftOffset].seq
    val e = end.asInstanceOf[GraftOffset].seq
    val recs = log.commitsAfter(s).takeWhile(_.seq <= e)
    val covered = recs.map(_.seq).toSet
    val missing = ((s + 1) to e).filterNot(covered)
    if (missing.nonEmpty)
      throw new IllegalStateException(
        s"graft stream: commits ${missing.mkString(",")} are no longer " +
          "readable (vacuumed past this cursor); restart from a startSeq at " +
          "or after the latest checkpoint")
    recs.flatMap(r => GraftScan.expandParts(r.files.map(f =>
        new HPath(storeDir, f).toString)))
      .map(p => GraftInputPartition(p): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftReaderFactory(columns)

  override def deserializeOffset(json: String): Offset = GraftOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] final case class GraftOffset(seq: Long) extends Offset {
  override def json(): String = seq.toString
}

/** Executor-side parquet decode via parquet-mr (no SparkSession, no driver
  * state): the file footer supplies the schema, the required columns are
  * projected into the read schema (true IO-level column pruning), and each
  * Group converts to an InternalRow of exactly the pruned columns. An
  * EMPTY projection (count(*) pushdown shape) short-circuits to the
  * footer's row count — zero data pages read. */
private[sources] final class GraftPartitionReader(path: String,
    columns: Array[String]) extends PartitionReader[InternalRow] {

  private val hPath = new org.apache.hadoop.fs.Path(path)
  private val conf = new Configuration()

  private var reader: ParquetReader[Group] = _
  private var emptyRowsLeft: Long = 0L
  private var current: Group = _

  if (columns.isEmpty) {
    val in = ParquetFileReader.open(HadoopInputFile.fromPath(hPath, conf))
    try emptyRowsLeft = in.getRecordCount finally in.close()
  } else {
    val in = ParquetFileReader.open(HadoopInputFile.fromPath(hPath, conf))
    val fileSchema =
      try in.getFooter.getFileMetaData.getSchema finally in.close()
    val projected = new MessageType(fileSchema.getName,
      columns.map(c => fileSchema.getType(fileSchema.getFieldIndex(c))): _*)
    conf.set(ReadSupport.PARQUET_READ_SCHEMA, projected.toString)
    reader = ParquetReader.builder(new GroupReadSupport(), hPath)
      .withConf(conf).build()
  }

  override def next(): Boolean =
    if (columns.isEmpty) {
      if (emptyRowsLeft <= 0) false else { emptyRowsLeft -= 1; true }
    } else {
      current = reader.read()
      current != null
    }

  override def get(): InternalRow =
    if (columns.isEmpty) new GenericInternalRow(Array.empty[Any])
    else convert(current)

  override def close(): Unit = if (reader != null) reader.close()

  private def convert(g: Group): InternalRow = {
    val t = g.getType
    val vals = new Array[Any](columns.length)
    var i = 0
    while (i < columns.length) {
      val name = columns(i)
      val idx = t.getFieldIndex(name)
      vals(i) =
        if (g.getFieldRepetitionCount(idx) == 0) null
        else name match {
          case "position" | "appended_at_nanos" =>
            java.lang.Long.valueOf(g.getLong(idx, 0))
          case "appended_at" =>
            java.lang.Long.valueOf(
              timestampMicros(g, idx, t.getType(idx).asPrimitiveType()))
          case "payload_data" => g.getBinary(idx, 0).getBytes
          case "metadata" | "tags" => mapData(g.getGroup(idx, 0))
          case _ => UTF8String.fromString(g.getString(idx, 0))
        }
      i += 1
    }
    new GenericInternalRow(vals)
  }

  /** Spark's default parquet timestamp is INT96 (julian day + nanos of
    * day); INT64 TIMESTAMP(MILLIS/MICROS/NANOS) handled for completeness. */
  private def timestampMicros(g: Group, idx: Int, prim: PrimitiveType): Long =
    prim.getPrimitiveTypeName match {
      case PrimitiveType.PrimitiveTypeName.INT96 =>
        val buf = ByteBuffer.wrap(g.getInt96(idx, 0).getBytes).order(LITTLE_ENDIAN)
        val nanosOfDay = buf.getLong
        val julianDay = buf.getInt
        (julianDay - 2440588).toLong * 86400L * 1000000L + nanosOfDay / 1000L
      case _ =>
        val v = g.getLong(idx, 0)
        prim.getLogicalTypeAnnotation match {
          case ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            ts.getUnit match {
              case LogicalTypeAnnotation.TimeUnit.MILLIS => v * 1000L
              case LogicalTypeAnnotation.TimeUnit.MICROS => v
              case LogicalTypeAnnotation.TimeUnit.NANOS => v / 1000L
            }
          case _ => v // bare INT64: assume micros
        }
    }

  private def mapData(mg: Group): ArrayBasedMapData = {
    val kvIdx = mg.getType.getFieldIndex("key_value")
    val n = mg.getFieldRepetitionCount(kvIdx)
    val keys = new Array[Any](n)
    val values = new Array[Any](n)
    var i = 0
    while (i < n) {
      val kv = mg.getGroup(kvIdx, i)
      keys(i) = UTF8String.fromString(kv.getString("key", 0))
      values(i) =
        if (kv.getFieldRepetitionCount("value") == 0) null
        else UTF8String.fromString(kv.getString("value", 0))
      i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(values))
  }
}
