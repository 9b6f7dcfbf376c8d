package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.FactStateStreams

/** Streaming Markov transitions: each event must emit exactly the
  * (prev → current) pair it completes, with one string of state per user,
  * across micro-batch boundaries — so a downstream count over this stream
  * equals the batch lead() census over the same prefix. */
class StreamingTransitionsSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark

  private val T0 = 1700000000000000L

  private def run(batches: Seq[Seq[(Long, String, Long)]]): Seq[(Long, String, String, Long)] = {
    val s = spark
    import s.implicits._
    val input = MemoryStream[(Long, String, Long, Long)](s)
    val events = input.toDF().toDF("user_id", "event_type", "ts_us", "event_id")
      .selectExpr("user_id", "event_type", "timestamp_micros(ts_us) AS ts", "event_id")
    val out = FactStateStreams.transitions(s, events)
    val dir = java.nio.file.Files.createTempDirectory("stream-trans").toString
    val name = s"trans_${System.nanoTime()}"
    val q = out.writeStream
      .format("memory").queryName(name)
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", s"$dir/cp")
      .trigger(Trigger.ProcessingTime(50))
      .start()
    try {
      // event_id = feed order (the log position of the subscribe contract)
      var seq = 0L
      batches.foreach { b =>
        input.addData(b.map { case (u, ty, ts) => seq += 1; (u, ty, ts, seq) }: _*)
        q.processAllAvailable()
      }
      s.table(name).as[(Long, String, String, Long)].collect().toSeq
        .sortBy(r => (r._1, r._4))
    } finally q.stop()
  }

  test("emits exactly the consecutive pairs of each user's stream") {
    val got = run(Seq(Seq(
      (1L, "view", T0), (1L, "click", T0 + 1), (1L, "purchase", T0 + 2),
      (2L, "view", T0 + 3))))
    assert(got == Seq(
      (1L, "view", "click", T0 + 1),
      (1L, "click", "purchase", T0 + 2)), s"got $got")
  }

  test("state carries the last type across micro-batches (no lost or doubled pairs)") {
    val oneBatch = run(Seq(Seq(
      (3L, "a", T0), (3L, "b", T0 + 1), (3L, "c", T0 + 2), (3L, "a", T0 + 3))))
    val multiBatch = run(Seq(
      Seq((3L, "a", T0)),
      Seq((3L, "b", T0 + 1), (3L, "c", T0 + 2)),
      Seq((3L, "a", T0 + 3))))
    assert(oneBatch == multiBatch && oneBatch.size == 3,
      s"one=$oneBatch multi=$multiBatch")
  }

  test("aggregating the stream reproduces the batch census on the same data") {
    val events = Seq(
      (1L, "view", T0), (1L, "click", T0 + 1), (1L, "view", T0 + 2),
      (2L, "view", T0 + 3), (2L, "click", T0 + 4),
      (3L, "error", T0 + 5))
    val got = run(Seq(events))
      .groupBy(t => (t._2, t._3)).view.mapValues(_.size).toMap
    // batch lead() census computed by hand
    assert(got == Map(
      ("view", "click") -> 2,
      ("click", "view") -> 1), s"got $got")
  }

  test("equal timestamps fold in event_id (position) order, stable across batch splits") {
    // Three events share one ts; the feed order (= event_id) is a, b, c.
    // A (ts, type)-sorted fold would emit a→b, b→c only by the accident
    // of alphabetical order — shuffle the types so position order and
    // type order disagree, and check batch-boundary invariance too.
    val tied = Seq((7L, "c", T0), (7L, "a", T0), (7L, "b", T0))
    val oneBatch = run(Seq(tied))
    val multiBatch = run(tied.map(Seq(_)))
    assert(oneBatch == Seq(
      (7L, "c", "a", T0), (7L, "a", "b", T0)), s"got $oneBatch")
    assert(oneBatch == multiBatch, s"one=$oneBatch multi=$multiBatch")
  }
}
