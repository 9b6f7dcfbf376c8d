package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.FactStateStreams

/** Streaming inter-arrival face (seventeenth face): the final emission
  * over an in-order feed must equal the batch
  * `events_interarrival_stats` row for row — including the day-bucket
  * reset (cross-midnight gaps excluded) — across any micro-batch split,
  * and a type with no completed gap emits nothing. */
class StreamingInterarrivalSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** Run the face over (type, ts_us, event_id) batches; collect updates. */
  private def run(batches: Seq[Seq[(String, Long, Long)]]): Seq[FactStateStreams.GapUpdate] = {
    val s = spark
    import s.implicits._
    val input = MemoryStream[(String, Long, Long)](s)
    val events = input.toDF().toDF("event_type", "ts_us", "event_id")
      .selectExpr("event_type", "timestamp_micros(ts_us) AS ts", "event_id")
    val out = FactStateStreams.interarrivalStats(s, events)
    val dir = java.nio.file.Files.createTempDirectory("stream-gap").toString
    val name = s"gaps_${System.nanoTime()}"
    val q = out.writeStream
      .format("memory").queryName(name)
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", s"$dir/cp")
      .trigger(Trigger.ProcessingTime(50))
      .start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      s.table(name).as[FactStateStreams.GapUpdate].collect().toSeq
    } finally q.stop()
  }

  /** Last (= running-final) update per type. */
  private def finalPer(rows: Seq[FactStateStreams.GapUpdate]): Map[String, (Long, Long, Long, Long, Option[Long])] =
    rows.groupBy(_.eventType).map { case (t, rs) =>
      val last = rs.maxBy(_.nGaps)
      t -> ((last.nGaps, last.meanGapUs, last.minGapUs, last.maxGapUs, last.dispersionPpm))
    }

  test("final stream state equals the batch operator on the sf0.001 corpus " +
      "under adversarial micro-batch splits") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val feed = graft.operators.EventFinders.normalizeTs(
        s.read.parquet(s"$sf/events.parquet"))
      .selectExpr("event_type", "ts div 1000 AS ts_us", "event_id")
      .orderBy("event_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // in-order feed (the subscribe contract), split across 5 micro-batches
    val got = finalPer(run(feed.grouped(math.max(feed.size / 5, 1)).toSeq))
    val want = graft.operators.Timeseries.queries("events_interarrival_stats")(s, sf)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getLong(5))))).toMap
    assert(got == want, s"stream $got\nbatch  $want")
    graft.operators.CacheScope.releaseAll()
  }

  test("rows fold in (ts, event_id) order and a late event across a batch " +
      "boundary is dropped, never folded as a negative gap") {
    // within one batch: event_ids arrive against ts order — the fold must
    // sort by ts (the batch lag window's sort), giving gaps 10ms and 20ms
    val inBatch = run(Seq(Seq(("a", 30000L, 1L), ("a", 0L, 2L), ("a", 10000L, 3L))))
    val a = inBatch.maxBy(_.nGaps)
    assert((a.nGaps, a.minGapUs, a.maxGapUs) == ((2L, 10000L, 20000L)), s"$inBatch")
    // across batches: an event behind the cursor is dropped (late-event
    // discipline), state stays valid and later in-order events still fold
    val late = run(Seq(
      Seq(("b", 100000L, 1L)),
      Seq(("b", 40000L, 2L)),             // late: behind the cursor — dropped
      Seq(("b", 160000L, 3L))))           // folds against the 100ms cursor
    val b = late.maxBy(_.nGaps)
    assert((b.nGaps, b.minGapUs, b.maxGapUs) == ((1L, 60000L, 60000L)), s"$late")
  }

  test("cross-midnight gap is excluded and a gapless type emits nothing") {
    val DayUs = 86400L * 1000000
    val got = run(Seq(Seq(
      ("a", 1000L, 1L), ("a", 61000L, 2L),          // one 60ms gap on day 0
      ("a", DayUs + 500L, 3L),                       // day 1: cursor reset, no gap yet
      ("b", 42L, 4L))))                              // single event: no output
    assert(got.map(_.eventType).toSet == Set("a"))
    val a = got.maxBy(_.nGaps)
    assert((a.nGaps, a.meanGapUs, a.minGapUs, a.maxGapUs) == ((1L, 60000L, 60000L, 60000L)))
  }
}
