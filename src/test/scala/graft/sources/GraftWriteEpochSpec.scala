package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkTestSession
import graft.core._
import graft.store.{NioVfs, SparkFactStore}

/** The streaming Sink contract, pinned at the connector level: committing
  * the SAME epoch twice (Spark re-delivers an epoch when a query restarts
  * between sink commit and source-offset checkpoint) must be a no-op the
  * second time — the epoch-derived idempotency key lands on
  * AlreadyApplied before any staged byte is read. */
class GraftWriteEpochSpec extends AnyFunSuite {

  test("re-delivered epoch commits exactly once") {
    val spark = SparkTestSession.spark
    val root = Files.createTempDirectory("graft-epoch-")
    val fs = new SparkFactStore(spark, root)
    assert(fs.createStore("ep").isInstanceOf[CreateStoreResult.Created])
    val props = new java.util.HashMap[String, String]()
    props.put("root", root.toString)
    props.put("store", "ep")
    val (storeDir, vfs) = GraftDataSource.resolveStoreDir(props)
    assert(vfs eq NioVfs)

    val write = new GraftStreamingWrite(storeDir, vfs, "ep", "query-7",
      Array.tabulate(GraftWrite.InputSchema.size)(identity), None)
    val epoch = 3L

    // stage one row the way an executor task would
    val factory = write.createStreamingWriterFactory(null)
    val writer = factory.createWriter(0, 11L, epoch)
    writer.write(InternalRow(
      UTF8String.fromString("EPOCH_FACT"), UTF8String.fromString("subj"),
      Array[Byte](7, 7), null, null, null, null))
    val msg = writer.commit()

    write.commit(epoch, Array(msg))
    // re-delivery of the same epoch (staged files are already gone; the
    // idempotency key short-circuits before anything is read)
    write.commit(epoch, Array(msg))

    val FindResult.Found(got) = fs.findInTimeRange("ep", TimeRange.unbounded): @unchecked
    assert(got.size == 1, s"epoch re-delivery duplicated facts: ${got.size}")
    assert(got.head.factType == "EPOCH_FACT")
    assert(got.head.payloadData.toSeq == Seq[Byte](7, 7))

    // a LATER epoch with the same query id commits normally
    val w2 = factory.createWriter(0, 12L, 4L)
    w2.write(InternalRow(
      UTF8String.fromString("NEXT"), UTF8String.fromString("subj"),
      null, null, null, null, null))
    write.commit(4L, Array(w2.commit()))
    val FindResult.Found(all) = fs.findInTimeRange("ep", TimeRange.unbounded): @unchecked
    assert(all.map(_.factType) == Seq("EPOCH_FACT", "NEXT"))
  }
}
