package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.core._
import graft.store.SparkFactStore

/** The exactly-once foundation of the DSv2 stream: a batch (start, end]
  * re-plans a byte-identical input-partition list however many times and
  * from however many independent stream instances it is planned — that is
  * what lets recovery re-run the last uncommitted batch without a
  * write-ahead log. Also pinned: offsets survive JSON round-trips, and a
  * non-vacuum compaction does not change what an old offset range plans
  * (the commit records it references still exist). */
class GraftOffsetsReplanSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark

  private def plans(stream: GraftMicroBatchStream, s: Long, e: Long): Seq[String] =
    stream.planInputPartitions(GraftOffset(s), GraftOffset(e))
      .map(_.asInstanceOf[GraftInputPartition].path).toSeq

  test("the same offset range plans byte-identical partitions across " +
      "independent stream instances, and across a non-vacuum compaction") {
    val root = Files.createTempDirectory("graft-replan-")
    val fs = new SparkFactStore(spark, root)
    assert(fs.createStore("rp").isInstanceOf[CreateStoreResult.Created])
    (1 to 5).foreach { i =>
      assert(fs.append("rp", FactInput(s"T$i", "s", Array[Byte](i.toByte)))
        .isInstanceOf[AppendResult.Appended])
    }
    // a multi-file commit too (bulk append -> directory of parts)
    assert(fs.append(AppendRequest("rp", (6 to 8).map(i =>
      FactInput(s"T$i", "bulk", Array[Byte](i.toByte)))))
      .isInstanceOf[AppendResult.Appended])

    val props = new java.util.HashMap[String, String]()
    props.put("root", root.toString)
    props.put("store", "rp")
    val (dir, vfs) = GraftDataSource.resolveStoreDir(props)
    val cols = graft.store.FactLog.schema.fieldNames

    val a = new GraftMicroBatchStream(dir, vfs, cols, 0L)
    val b = new GraftMicroBatchStream(dir, vfs, cols, 0L)
    val head = a.latestOffset().asInstanceOf[GraftOffset].seq
    assert(head == 6L)

    for ((s, e) <- Seq((0L, 3L), (3L, 6L), (0L, 6L), (5L, 6L))) {
      val pa = plans(a, s, e)
      val pb = plans(b, s, e)
      assert(pa == pb, s"($s, $e] diverged across instances:\n$pa\nvs\n$pb")
      assert(pa.nonEmpty)
    }

    // offsets survive their JSON round-trip exactly
    val off = a.latestOffset()
    assert(a.deserializeOffset(off.json()) == off)

    // non-vacuum compaction keeps old ranges re-plannable and identical
    val before = plans(a, 2L, 6L)
    assert(fs.compact("rp") > 0)
    val c = new GraftMicroBatchStream(dir, vfs, cols, 0L)
    assert(plans(c, 2L, 6L) == before,
      "compaction changed what an old offset range plans")
    // and the head keeps advancing past the checkpoint (no stall)
    assert(fs.append("rp", FactInput("T9", "s", Array[Byte](9)))
      .isInstanceOf[AppendResult.Appended])
    assert(c.latestOffset().asInstanceOf[GraftOffset].seq == 7L)
  }
}
