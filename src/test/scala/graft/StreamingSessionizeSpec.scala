package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.FactStateStreams

/** Streaming gap sessionization: sessions close on in-stream gaps AND on
  * event-time timeout (watermark passing end + gap), matching the batch
  * `events_sessionize` gap rule. */
class StreamingSessionizeSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark

  private val GapUs = 1800L * 1000000
  private val T0 = 1700000000000000L // epoch micros

  private def run(batches: Seq[Seq[(Long, String, Long)]]): Seq[(Long, Long, Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    val input = MemoryStream[(Long, String, Long)](s)
    val events = input.toDF().toDF("user_id", "event_type", "ts_us")
      .selectExpr("user_id", "event_type", "timestamp_micros(ts_us) AS ts")
      .withWatermark("ts", "0 seconds")
    val out = FactStateStreams.sessionize(s, events)
    val dir = java.nio.file.Files.createTempDirectory("stream-sess").toString
    val name = s"sessions_${System.nanoTime()}"
    val q = out.writeStream
      .format("memory").queryName(name)
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", s"$dir/cp")
      .trigger(Trigger.ProcessingTime(50))
      .start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      s.table(name).as[(Long, Long, Long, Long, Long)].collect().toSeq.sorted
    } finally q.stop()
  }

  test("a gap inside the stream closes the earlier session immediately") {
    val got = run(Seq(
      Seq((1L, "view", T0), (1L, "click", T0 + 1000L)),
      // same user, past the gap: closes session 1 in this batch, opens a new one
      Seq((1L, "view", T0 + 1000L + GapUs + 1))))
    assert(got.contains((1L, T0, T0 + 1000L, 2L, 2L)),
      s"first session not closed by the in-stream gap: $got")
  }

  test("watermark passing end+gap flushes an idle user's session via timeout") {
    val got = run(Seq(
      Seq((1L, "view", T0)),
      // OTHER user's much-later event advances the watermark past user 1's
      // session end + gap; only the timeout can flush user 1
      Seq((2L, "view", T0 + 3 * GapUs)),
      // one more batch so the timeout callback fires after the watermark update
      Seq((2L, "click", T0 + 3 * GapUs + 1000L))))
    assert(got.contains((1L, T0, T0, 1L, 1L)),
      s"idle user's session never flushed by event-time timeout: $got")
  }

  test("exactly-at-gap events extend the session (batch-rule parity)") {
    val got = run(Seq(
      Seq((1L, "view", T0), (1L, "click", T0 + GapUs)), // exactly at gap: same session
      Seq((2L, "view", T0 + 10 * GapUs)),
      Seq((2L, "click", T0 + 10 * GapUs + 1))))
    assert(got.contains((1L, T0, T0 + GapUs, 2L, 2L)),
      s"exactly-at-gap event split the session: $got")
    assert(!got.exists(r => r._1 == 1L && r._4 == 1L),
      s"session was split at the exact gap boundary: $got")
  }
}
