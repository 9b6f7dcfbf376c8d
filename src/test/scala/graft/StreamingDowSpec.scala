package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.FactStateStreams

/** Streaming day-of-week profile (sixteenth face): fixed seven-slot state
  * whose final census must equal the batch `events_dow_seasonality`
  * (n_days, n_events, mean) columns over the same closed prefix.
  */
class StreamingDowSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark

  private def run(batches: Seq[Seq[(String, Long)]]): Seq[(String, Long, Long, Long, Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    val input = MemoryStream[(String, Long)](s)
    val events = input.toDF().toDF("event_type", "day")
      .selectExpr("event_type", "timestamp_micros(day * 86400000000) AS ts")
    val out = FactStateStreams.dowProfile(s, events)
    val dir = java.nio.file.Files.createTempDirectory("stream-dow").toString
    val name = s"dow_${System.nanoTime()}"
    val q = out.writeStream
      .format("memory").queryName(name)
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", s"$dir/cp")
      .trigger(Trigger.ProcessingTime(50))
      .start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      s.table(name)
        .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
        .sortBy(r => (r._1, r._2))
    } finally q.stop()
  }

  test("every grid day counts from the first; quiet days accrue to their dow") {
    // 'A': 10 events day0 (dow 4), 6 day3 (dow 0), 20 day7 (dow 4),
    // day8 sentinel. Closed days 0..7: dow4 gets days {0, 7}.
    val got = run(Seq(
      Seq.fill(10)(("A", 0L)) ++ Seq.fill(6)(("A", 3L)) ++
        Seq.fill(20)(("A", 7L)) :+ (("A", 8L))))
    assert(got.size == 8, s"expected 8 closed grid days: $got")
    assert(got.head == (("A", 0L, 4L, 10L, 1L, 10L, 1000L)), s"day0: ${got.head}")
    // day7 is dow4's SECOND day: 30 events over 2 days -> mean 1500
    assert(got.last == (("A", 7L, 4L, 20L, 2L, 30L, 1500L)), s"day7: ${got.last}")
    // quiet day 1 (dow 5) emitted with zero count
    assert(got(1) == (("A", 1L, 5L, 0L, 1L, 0L, 0L)), s"day1: ${got(1)}")
  }

  test("final slot census equals the batch events_dow_seasonality on the prefix") {
    val s = spark
    import s.implicits._
    val rows = Seq.fill(10)(("x", 0L)) ++ Seq.fill(6)(("x", 3L)) ++
      Seq.fill(20)(("x", 7L)) ++ Seq.fill(4)(("y", 2L)) ++ Seq.fill(9)(("y", 5L))
    val dir = java.nio.file.Files.createTempDirectory("dow-parity").toFile
    dir.deleteOnExit()
    rows.zipWithIndex.map { case ((t, day), i) =>
      (i.toLong, day * 86400000000L, 1L, t, 1.0, "{}")
    }.toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .selectExpr("event_id", "CAST(timestamp_micros(ts_us) AS TIMESTAMP_NTZ) AS ts",
        "user_id", "event_type", "value", "props")
      .write.mode("overwrite")
      .parquet(new java.io.File(dir, "events.parquet").toString)
    val batch = graft.operators.Timeseries.queries("events_dow_seasonality")(s, dir.toString)
      .selectExpr("event_type", "dow", "n_days", "n_events", "mean_e2")
      .as[(String, Long, Long, Long, Long)].collect().toSeq.sortBy(r => (r._1, r._2))
    val streamed = run(Seq(rows ++ Seq(("x", 8L), ("y", 6L))))
    // last emission per (type, dow) carries that slot's final census
    val finals = streamed.groupBy(r => (r._1, r._3)).toSeq
      .map { case ((t, dw), rs) =>
        val last = rs.maxBy(_._2)
        (t, dw, last._5, last._6, last._7)
      }.sortBy(r => (r._1, r._2))
    assert(finals == batch,
      s"stream dow census diverged from batch:\n stream=$finals\n batch=$batch")
  }

  test("micro-batch boundaries do not change the census") {
    val one = run(Seq(
      Seq.fill(5)(("c", 0L)) ++ Seq.fill(3)(("c", 2L)) :+ (("c", 4L))))
    val multi = run(Seq(
      Seq.fill(5)(("c", 0L)), Seq.fill(3)(("c", 2L)), Seq(("c", 4L))))
    assert(one == multi, s"batch split changed output:\n one=$one\n multi=$multi")
  }
}
