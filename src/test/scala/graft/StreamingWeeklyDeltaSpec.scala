package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.FactStateStreams

/** Streaming week-over-week type delta (twenty-first face): one
  * (open week, last closed week) cursor per type whose closed-week
  * emissions must equal the batch `events_type_weekly_delta` rows over
  * the same closed prefix — including the NULL-on-gap adjacency rule
  * and truncating negative deltas.
  */
class StreamingWeeklyDeltaSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark

  /** (event_type, week) inputs -> emitted (type, week, n, prevN, deltaPpm). */
  private def run(batches: Seq[Seq[(String, Long)]]): Seq[(String, Long, Long, Option[Long], Option[Long])] = {
    val s = spark
    import s.implicits._
    val input = MemoryStream[(String, Long)](s)
    val events = input.toDF().toDF("event_type", "week")
      .selectExpr("event_type", "timestamp_micros(week * 604800000000) AS ts")
    val out = FactStateStreams.typeWeeklyDelta(s, events)
    val dir = java.nio.file.Files.createTempDirectory("stream-wkd").toString
    val name = s"wkd_${System.nanoTime()}"
    val q = out.writeStream
      .format("memory").queryName(name)
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", s"$dir/cp")
      .trigger(Trigger.ProcessingTime(50))
      .start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      s.table(name)
        .as[(String, Long, Long, Option[Long], Option[Long])].collect().toSeq
        .sortBy(r => (r._1, r._2))
    } finally q.stop()
  }

  test("adjacent weeks delta; gap weeks emit NULLs; negatives truncate toward zero") {
    // 'A': w0 n=8, w1 n=5 (delta (5-8)*1e6/8 = -375000), then a GAP to w3
    // (prev NULL), sentinel w4 closes w3.
    val got = run(Seq(
      Seq.fill(8)(("A", 0L)) ++ Seq.fill(5)(("A", 1L)) ++
        Seq.fill(2)(("A", 3L)) :+ (("A", 4L))))
    assert(got == Seq(
      ("A", 0L, 8L, None, None),
      ("A", 1L, 5L, Some(8L), Some(-375000L)),
      ("A", 3L, 2L, None, None)), s"got $got")
  }

  test("truncation (not floor) on a negative non-divisible delta") {
    // (2-7)*1e6/7 = -714285.7…: truncation -714285, floor would be -714286
    val got = run(Seq(
      Seq.fill(7)(("t", 0L)) ++ Seq.fill(2)(("t", 1L)) :+ (("t", 2L))))
    assert(got.map(_._5) == Seq(None, Some(-714285L)), s"got $got")
  }

  test("closed-prefix emissions equal the batch events_type_weekly_delta rows") {
    val s = spark
    import s.implicits._
    val rows = Seq.fill(9)(("x", 0L)) ++ Seq.fill(4)(("x", 1L)) ++
      Seq.fill(11)(("x", 2L)) ++ Seq.fill(3)(("y", 1L)) ++ Seq.fill(8)(("y", 4L))
    val dir = java.nio.file.Files.createTempDirectory("wkd-parity").toFile
    dir.deleteOnExit()
    rows.zipWithIndex.map { case ((t, week), i) =>
      (i.toLong, week * 604800000000L, 1L, t, 1.0, "{}")
    }.toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .selectExpr("event_id", "CAST(timestamp_micros(ts_us) AS TIMESTAMP_NTZ) AS ts",
        "user_id", "event_type", "value", "props")
      .write.mode("overwrite")
      .parquet(new java.io.File(dir, "events.parquet").toString)
    val batch = graft.operators.Timeseries.queries("events_type_weekly_delta")(s, dir.toString)
      .selectExpr("event_type", "week", "n", "prev_n", "delta_ppm")
      .as[(String, Long, Long, Option[Long], Option[Long])].collect().toSeq
      .sortBy(r => (r._1, r._2))
    // a sentinel week closes every observed week, so stream = batch exactly
    val streamed = run(Seq(rows ++ Seq(("x", 9L), ("y", 9L))))
      .filterNot(_._2 == 9L)
    assert(streamed == batch,
      s"stream weekly delta diverged from batch:\n stream=$streamed\n batch=$batch")
  }

  test("micro-batch boundaries do not change the emissions") {
    val one = run(Seq(
      Seq.fill(5)(("c", 0L)) ++ Seq.fill(3)(("c", 1L)) ++
        Seq.fill(6)(("c", 3L)) :+ (("c", 5L))))
    val multi = run(Seq(
      Seq.fill(5)(("c", 0L)), Seq.fill(3)(("c", 1L)),
      Seq.fill(6)(("c", 3L)), Seq(("c", 5L))))
    assert(one == multi, s"batch split changed output:\n one=$one\n multi=$multi")
  }
}
