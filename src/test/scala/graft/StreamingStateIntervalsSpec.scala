package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.FactStateStreams

/** Streaming SCD2 state intervals: a state transition emits the closed
  * interval with the batch operator's lead() semantics (valid_to = the
  * successor's valid_from); the current interval stays open in state. */
class StreamingStateIntervalsSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark

  private val T0 = 1700000000000000L // epoch micros

  private def run(batches: Seq[Seq[(Long, String, Long)]]): Seq[(Long, String, Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    val input = MemoryStream[(Long, String, Long)](s)
    val events = input.toDF().toDF("user_id", "event_type", "ts_us")
      .selectExpr("user_id", "event_type", "timestamp_micros(ts_us) AS ts")
    val out = FactStateStreams.stateIntervals(s, events)
    val dir = java.nio.file.Files.createTempDirectory("stream-scd2").toString
    val name = s"intervals_${System.nanoTime()}"
    val q = out.writeStream
      .format("memory").queryName(name)
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", s"$dir/cp")
      .trigger(Trigger.ProcessingTime(50))
      .start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      s.table(name).as[(Long, String, Long, Long, Long)].collect().toSeq.sorted
    } finally q.stop()
  }

  test("a transition closes the prior run with lead() semantics; same-state events extend it") {
    val got = run(Seq(Seq(
      (1L, "view", T0), (1L, "view", T0 + 1000L), (1L, "click", T0 + 2000L))))
    // the view-run closes at the click's valid_from, carrying 2 events;
    // the click interval is open and must NOT be emitted
    assert(got == Seq((1L, "view", T0, T0 + 2000L, 2L)), got.toString)
  }

  test("transitions across micro-batches use the carried open interval") {
    val got = run(Seq(
      Seq((1L, "view", T0)),
      Seq((1L, "purchase", T0 + 5000L)),
      Seq((1L, "view", T0 + 9000L))))
    assert(got == Seq(
      (1L, "purchase", T0 + 5000L, T0 + 9000L, 1L),
      (1L, "view", T0, T0 + 5000L, 1L)), got.toString)
  }

  test("users are independent; an idle user's open interval never emits") {
    val got = run(Seq(
      Seq((1L, "view", T0), (2L, "click", T0)),
      Seq((2L, "view", T0 + 1000L))))
    // user 1 never transitions: nothing emitted for them
    assert(got == Seq((2L, "click", T0, T0 + 1000L, 1L)), got.toString)
  }
}
