package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.FactStateStreams

/** Streaming windowed funnel: the three-long state chain must enforce the
  * 24 h conversion windows, fire each stage at most once, and agree with
  * the batch min-chain on in-order feeds across micro-batch boundaries. */
class StreamingFunnelSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark

  private val DayUs = 86400L * 1000000
  private val T0 = 1700000000000000L

  private def run(batches: Seq[Seq[(Long, String, Long)]]): Seq[(Long, String, Long)] = {
    val s = spark
    import s.implicits._
    val input = MemoryStream[(Long, String, Long, Long)](s)
    val events = input.toDF().toDF("user_id", "event_type", "ts_us", "event_id")
      .selectExpr("user_id", "event_type", "timestamp_micros(ts_us) AS ts", "event_id")
    val out = FactStateStreams.funnelStages(s, events)
    val dir = java.nio.file.Files.createTempDirectory("stream-funnel").toString
    val name = s"funnel_${System.nanoTime()}"
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
      s.table(name).as[(Long, String, Long)].collect().toSeq
        .sortBy(r => (r._1, r._3))
    } finally q.stop()
  }

  test("full in-window chain fires all three stages exactly once") {
    val got = run(Seq(Seq(
      (1L, "view", T0),
      (1L, "view", T0 + 500L),              // later view: no second emission
      (1L, "click", T0 + 1000L),
      (1L, "click", T0 + 2000L),            // later click: no second emission
      (1L, "purchase", T0 + 3000L))))
    assert(got == Seq(
      (1L, "view", T0),
      (1L, "click_24h", T0 + 1000L),
      (1L, "purchase_24h", T0 + 3000L)), s"got $got")
  }

  test("click outside the 24h window never fires (and blocks the purchase)") {
    val got = run(Seq(Seq(
      (2L, "view", T0),
      (2L, "click", T0 + DayUs + 1),        // 24h + 1us: outside
      (2L, "purchase", T0 + DayUs + 2))))
    assert(got == Seq((2L, "view", T0)), s"got $got")
  }

  test("exactly-at-24h click converts (closed upper bound, batch parity)") {
    val got = run(Seq(Seq(
      (3L, "view", T0),
      (3L, "click", T0 + DayUs))))
    assert(got == Seq((3L, "view", T0), (3L, "click_24h", T0 + DayUs)), s"got $got")
  }

  test("chain state persists across micro-batches") {
    val oneBatch = run(Seq(Seq(
      (4L, "view", T0), (4L, "click", T0 + 1000L), (4L, "purchase", T0 + 2000L))))
    val multiBatch = run(Seq(
      Seq((4L, "view", T0)),
      Seq((4L, "click", T0 + 1000L)),
      Seq((4L, "purchase", T0 + 2000L))))
    assert(oneBatch == multiBatch, s"one=$oneBatch multi=$multiBatch")
  }

  test("purchase before any click is ignored (strict stage order)") {
    val got = run(Seq(Seq(
      (5L, "view", T0), (5L, "purchase", T0 + 1000L))))
    assert(got == Seq((5L, "view", T0)), s"got $got")
  }

  test("out-of-order earlier view is dropped: anchors fire once and never move") {
    // An earlier-ts view arriving AFTER the anchor view must not re-emit
    // 'view' or move the anchor (which would silently invalidate the
    // already-emitted click_24h qualification) — late events fall to the
    // batch repair path, same discipline as dailyAutocorr.
    val got = run(Seq(
      Seq((6L, "view", T0 + 1000L), (6L, "click", T0 + 2000L)),
      Seq((6L, "view", T0)),                      // late: dropped
      Seq((6L, "purchase", T0 + 3000L))))         // still qualifies off T0+2000
    assert(got == Seq(
      (6L, "view", T0 + 1000L),
      (6L, "click_24h", T0 + 2000L),
      (6L, "purchase_24h", T0 + 3000L)), s"got $got")
  }
}
