package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.FactStateStreams

/** Streaming Bloom first-seen: when events arrive in batch okey order
  * (ts µs · 2^24 + event_id — the shared decision order), the cumulative
  * max-seq census per shard must equal the batch
  * `events_bloom_first_seen` rows column-for-column under ANY batch
  * split, because shard, positions, and order are one shared definition
  * (Sketches.FsPerms/ShardPerm/SegBits + the squared mixing). */
class StreamingBloomFsSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("final streamed census equals batch events_bloom_first_seen under " +
      "uneven ordered splits") {
    val s = spark
    import s.implicits._
    val evs = s.read.parquet(s"$sf/events.parquet")
      .selectExpr("user_id", "unix_micros(CAST(ts AS TIMESTAMP)) AS ts_us",
        "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy { case (_, ts, eid) => (BigInt(ts) * 16777216 + eid) }.toSeq
    // ordered arrival, 4 uneven batches (order across batches preserved —
    // the streaming contract; order WITHIN a batch is restored by the face)
    val batches = Seq(
      evs.take(3), evs.slice(3, evs.size / 3),
      evs.slice(evs.size / 3, evs.size - 5), evs.takeRight(5))
      .filter(_.nonEmpty)
      // adversarial within-batch shuffle: the face must re-sort by okey
      .map(_.reverse)

    val input = MemoryStream[(Long, Long, Long)](s)
    val out = FactStateStreams.bloomFirstSeen(
      s, input.toDF().toDF("user_id", "ts_us", "event_id")
        .selectExpr("user_id", "timestamp_micros(ts_us) AS ts", "event_id"))
    val dir = java.nio.file.Files.createTempDirectory("stream-bloomfs").toString
    val name = s"bloomfs_${System.nanoTime()}"
    val q = out.writeStream
      .format("memory").queryName(name)
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", s"$dir/cp")
      .trigger(Trigger.ProcessingTime(20))
      .start()
    val rows =
      try {
        batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
        s.table(name)
          .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
      } finally q.stop()

    val got = rows.groupBy(_._1).map { case (shard, rs) =>
      val last = rs.maxBy(_._2)
      shard -> ((last._3, last._4, last._5))
    }
    val expected = graft.operators.Sketches
      .queries("events_bloom_first_seen")(s, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == expected, s"got $got\nexpected $expected")
    // set-bit count never exceeds the segment width — the state is a
    // saturating SegBits-bit filter, not a growing set
    rows.foreach { r =>
      assert(r._6 <= graft.operators.Sketches.SegBits, s"segment overflow: $r")
    }
    // per-shard update count bounded by batches that carried its events
    rows.groupBy(_._1).foreach { case (shard, rs) =>
      assert(rs.map(_._2).max <= batches.size.toLong,
        s"shard $shard emitted more updates than batches")
    }
  }
}
