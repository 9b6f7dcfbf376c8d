package graft.sources

import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.schema.{MessageType, MessageTypeParser}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.functions.{broadcast, col, expr, lit}
import org.apache.spark.sql.types._

import graft.core.AppendResult
import graft.store.{BulkCommit, CommitPublisher, FactLog, HadoopFsPublisher,
  HadoopVfs, StoreVfs, Timestamps}

/** DataSource V2 WRITE path: external Spark jobs append to a store with
  *
  * {{{
  *   df.write.format("graft").option("root", dir).option("store", name)
  *     .mode("append").save()                          // one atomic commit
  *   df.writeStream.format("graft")...start()          // exactly-once sink
  * }}}
  *
  * completing the "not my process" story the read provider started — the
  * Spark-idiomatic analogue of the reference client's append rpcs
  * (factstore-v1.proto:204-238). Every batch routes through the SAME
  * commit protocol as the facade:
  *
  *  - '''Executors stage, the driver commits.''' Each partition writes its
  *    rows to a writer-unique staged parquet file (parquet-mr, no driver
  *    state), recording a partition-local row index. Nothing staged is
  *    visible: visibility comes only from the commit CAS.
  *  - '''bulkAppend's position discipline, two-phase.''' Commit messages
  *    carry per-partition row counts; the driver prefix-sums them into
  *    per-partition offsets and materializes the final batch with
  *    contiguous positions `head+1..head+n` in (partition, row) order —
  *    the same order contract as the facade's `bulkAppend`, computed with
  *    one broadcast join (no shuffle, no global sort) at any scale.
  *  - '''One shared commit loop.''' The positioned batch goes through
  *    [[graft.store.BulkCommit]] — idempotency re-check, distributed
  *    bloom, CAS publish, loser cleanup and retry — byte-identical
  *    semantics to the facade, exactly-one-winner against ANY concurrent
  *    writer (facade, CLI, another DSv2 job, another process).
  *  - '''Streaming sink is epoch-idempotent.''' Each epoch commits with
  *    the idempotency key `dsv2-stream-<queryId>-<epochId>`; a
  *    re-delivered epoch after recovery lands on `AlreadyApplied` and
  *    becomes a no-op — the Sink contract that makes the pipeline
  *    end-to-end exactly-once.
  *
  * Crash safety: staged files live under the store's `data/` in a
  * `dsv2-stage-*` directory; an abort deletes them inline, a crashed
  * driver leaves them to the janitor's unreferenced-and-old sweep — the
  * same reclaim path as any crashed facade writer. */
private[sources] object GraftWrite {
  /** The append-input schema (FactLog.schema minus the store-assigned
    * id/position/appended_at columns) — what `bulkAppend` takes. */
  val InputSchema: StructType = StructType(Seq(
    StructField("fact_type", StringType, nullable = false),
    StructField("subject", StringType, nullable = false),
    StructField("payload_data", BinaryType, nullable = true),
    StructField("payload_format", StringType, nullable = true),
    StructField("payload_schema", StringType, nullable = true),
    StructField("metadata", MapType(StringType, StringType), nullable = true),
    StructField("tags", MapType(StringType, StringType), nullable = true)
  ))

  /** Staged rows = input columns + partition id + partition-local index. */
  val StagedSchema: StructType =
    InputSchema.add("__part_id", LongType).add("__pos_local", LongType)

  val StagedMessage: MessageType = MessageTypeParser.parseMessageType(
    """message staged {
      |  optional binary fact_type (STRING);
      |  optional binary subject (STRING);
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
      |  optional int64 __part_id;
      |  optional int64 __pos_local;
      |}""".stripMargin)

  // one parsed Configuration per executor JVM (XML parse is ~10 ms)
  lazy val stagedWriteConf: Configuration = {
    val c = new Configuration()
    GroupWriteSupport.setSchema(StagedMessage, c)
    c
  }

  /** Nullability-insensitive type comparison (a caller's
    * `map('k','v')` literal types as valueContainsNull=false; the store
    * accepts it like any other MAP<STRING,STRING>). */
  private def stripNull(t: DataType): DataType = t match {
    case MapType(k, v, _) => MapType(stripNull(k), stripNull(v))
    case ArrayType(e, _) => ArrayType(stripNull(e))
    case StructType(fs) =>
      StructType(fs.map(f => StructField(f.name, stripNull(f.dataType))))
    case other => other
  }

  /** Column indexes of the input schema's fields in the caller's schema,
    * with typed errors for anything missing or mistyped (the DSv2
    * rendering of the facade's input validation). */
  def resolveColumns(provided: StructType): Array[Int] =
    InputSchema.fields.map { f =>
      val i = provided.fieldNames.indexOf(f.name)
      if (i < 0) throw new IllegalArgumentException(
        s"graft: write input is missing column '${f.name}' " +
          s"(required: ${InputSchema.fieldNames.mkString(", ")})")
      val t = provided.fields(i).dataType
      if (stripNull(t) != stripNull(f.dataType)) throw new IllegalArgumentException(
        s"graft: write input column '${f.name}' has type ${t.simpleString}, " +
          s"expected ${f.dataType.simpleString}")
      i
    }

  /** Publisher for the write side: mirrors [[graft.store.SparkFactStore.at]]
    * dispatch, overridable by name via the `publisher` option. */
  def publisherFor(vfs: StoreVfs, byName: Option[String]): CommitPublisher =
    byName.map(CommitPublisher.forName).getOrElse(vfs match {
      case _: HadoopVfs => HadoopFsPublisher.default
      case _ => CommitPublisher.default
    })
}

private[sources] final class GraftWriteBuilder(storeDir: HPath, vfs: StoreVfs,
    storeName: String, info: LogicalWriteInfo) extends WriteBuilder {

  override def build(): Write = {
    val cols = GraftWrite.resolveColumns(info.schema()) // typed pre-flight
    val pubName = Option(info.options.get("publisher"))
    val idemKey = Option(info.options.get("idempotencyKey"))
    new GraftWriteImpl(storeDir, vfs, storeName, info.queryId(), cols,
      pubName, idemKey)
  }
}

private[sources] final class GraftWriteImpl(storeDir: HPath, vfs: StoreVfs,
    storeName: String, queryId: String, cols: Array[Int],
    publisherName: Option[String], idemKey: Option[String]) extends Write {

  override def toBatch: BatchWrite =
    new GraftBatchWrite(storeDir, vfs, storeName, queryId, cols,
      publisherName, idemKey)
  override def toStreaming: StreamingWrite =
    new GraftStreamingWrite(storeDir, vfs, storeName, queryId, cols,
      publisherName)
}

/** One staged parquet file per partition (empty partitions stage nothing). */
private[sources] final case class GraftStagedFile(partitionId: Long,
    path: String, rows: Long) extends WriterCommitMessage

/** Driver-side commit shared by the batch and streaming writes. */
private[sources] object GraftCommit {
  def commitStaged(storeDir: HPath, vfs: StoreVfs,
      publisherName: Option[String], stageDir: HPath,
      messages: Seq[GraftStagedFile], idempotencyKey: String): Unit = {
    val spark = SparkSession.active
    val files = messages.filter(_.rows > 0).sortBy(_.partitionId)
    try {
      if (files.nonEmpty) {
        val log = new FactLog(storeDir, vfs,
          GraftWrite.publisherFor(vfs, publisherName))
        // per-partition position offsets: prefix sums of the staged counts
        val offsets = files.map(_.rows).scanLeft(0L)(_ + _)
        val offRows = files.zip(offsets).map { case (f, off) =>
          Row(f.partitionId, off) }
        val offSchema = StructType(Seq(
          StructField("__part_id", LongType), StructField("__offset", LongType)))
        val result = BulkCommit.run(spark, log, vfs, idempotencyKey,
          (firstPos, atNanos) => {
            val ts = java.sql.Timestamp.from(Timestamps.fromNanos(atNanos))
            val staged = spark.read.schema(GraftWrite.StagedSchema)
              .parquet(files.map(_.path): _*)
            val off = spark.createDataFrame(
              spark.sparkContext.parallelize(offRows, 1), offSchema)
            staged.join(broadcast(off), "__part_id")
              .withColumn("position",
                col("__pos_local") + col("__offset") + lit(firstPos))
              .withColumn("id", expr("uuid()"))
              .withColumn("appended_at", lit(ts))
              .withColumn("appended_at_nanos", lit(atNanos))
              .select(FactLog.schema.fieldNames.map(col): _*)
          })
        result match {
          case _: AppendResult.Appended | AppendResult.AlreadyApplied => ()
          case other => throw new java.io.IOException(
            s"graft: DSv2 commit failed: $other")
        }
      }
    } finally vfs.deleteTree(stageDir)
  }
}

private[sources] final class GraftBatchWrite(storeDir: HPath, vfs: StoreVfs,
    storeName: String, queryId: String, cols: Array[Int],
    publisherName: Option[String], idemKey: Option[String]) extends BatchWrite {

  // staged under data/ so a crashed driver's files are janitor-collectable
  private val stageDir =
    new HPath(new HPath(storeDir, "data"), s"dsv2-stage-${UUID.randomUUID()}")

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new GraftWriterFactory(stageDir.toString, cols)

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    GraftCommit.commitStaged(storeDir, vfs, publisherName, stageDir,
      messages.toSeq.map(_.asInstanceOf[GraftStagedFile]),
      idemKey.getOrElse(s"dsv2-batch-$queryId-${UUID.randomUUID()}"))

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    vfs.deleteTree(stageDir)
}

/** Micro-batch streaming sink: one staged directory and one idempotent
  * commit per epoch. */
private[sources] final class GraftStreamingWrite(storeDir: HPath, vfs: StoreVfs,
    storeName: String, queryId: String, cols: Array[Int],
    publisherName: Option[String]) extends StreamingWrite {

  private def stageDir(epochId: Long): HPath =
    new HPath(new HPath(storeDir, "data"), s"dsv2-stage-$queryId-$epochId")

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new GraftStreamingWriterFactory(
      new HPath(storeDir, "data").toString, queryId, cols)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    GraftCommit.commitStaged(storeDir, vfs, publisherName, stageDir(epochId),
      messages.toSeq.map(_.asInstanceOf[GraftStagedFile]),
      s"dsv2-stream-$queryId-$epochId") // re-delivered epoch -> AlreadyApplied

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    vfs.deleteTree(stageDir(epochId))
}

private[sources] final class GraftWriterFactory(stageDir: String,
    cols: Array[Int]) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftDataWriter(
      new HPath(stageDir, f"part-$partitionId%05d-$taskId.parquet"),
      partitionId, cols)
}

private[sources] final class GraftStreamingWriterFactory(dataDir: String,
    queryId: String, cols: Array[Int]) extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new GraftDataWriter(
      new HPath(s"$dataDir/dsv2-stage-$queryId-$epochId",
        f"part-$partitionId%05d-$taskId.parquet"),
      partitionId, cols)
}

/** Executor-side staging writer: InternalRow -> parquet-mr Group at a
  * writer-unique path (speculative task attempts write distinct files;
  * only the attempt whose commit message Spark accepts is ever read). */
private[sources] final class GraftDataWriter(path: HPath, partitionId: Int,
    cols: Array[Int]) extends DataWriter[InternalRow] {

  private val factory = new SimpleGroupFactory(GraftWrite.StagedMessage)
  private val writer = ExampleParquetWriter.builder(path)
    .withConf(GraftWrite.stagedWriteConf)
    .withCompressionCodec(CompressionCodecName.SNAPPY)
    .build()
  private var rows = 0L

  private def addMap(g: org.apache.parquet.example.data.Group, field: String,
      row: InternalRow, i: Int): Unit =
    if (!row.isNullAt(i)) {
      val m = row.getMap(i)
      if (m.numElements() > 0) {
        val mg = g.addGroup(field)
        val keys = m.keyArray()
        val vals = m.valueArray()
        var j = 0
        while (j < m.numElements()) {
          val kv = mg.addGroup("key_value")
          kv.add("key", keys.getUTF8String(j).toString)
          if (!vals.isNullAt(j)) kv.add("value", vals.getUTF8String(j).toString)
          j += 1
        }
      }
    }

  override def write(row: InternalRow): Unit = {
    val g = factory.newGroup()
    g.add("fact_type", row.getUTF8String(cols(0)).toString)
    g.add("subject", row.getUTF8String(cols(1)).toString)
    if (!row.isNullAt(cols(2)))
      g.add("payload_data",
        org.apache.parquet.io.api.Binary.fromConstantByteArray(row.getBinary(cols(2))))
    if (!row.isNullAt(cols(3))) g.add("payload_format", row.getUTF8String(cols(3)).toString)
    if (!row.isNullAt(cols(4))) g.add("payload_schema", row.getUTF8String(cols(4)).toString)
    addMap(g, "metadata", row, cols(5))
    addMap(g, "tags", row, cols(6))
    g.add("__part_id", partitionId.toLong)
    g.add("__pos_local", rows)
    writer.write(g)
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    writer.close()
    GraftStagedFile(partitionId.toLong, path.toString, rows)
  }

  override def abort(): Unit = {
    writer.close()
    val fs = path.getFileSystem(GraftWrite.stagedWriteConf)
    if (fs.exists(path)) fs.delete(path, false)
  }

  override def close(): Unit = ()
}
