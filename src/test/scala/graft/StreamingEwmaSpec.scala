package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.FactStateStreams

/** Streaming EWMA anomaly detection (fourteenth face): the two-integer
  * recursion must agree row-for-row with the batch `events_ewma_anomaly`
  * fold — including zero-filled quiet days — and must be invariant to
  * micro-batch boundaries.
  */
class StreamingEwmaSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark

  /** Feed (event_type, day) batches; returns emitted rows sorted. */
  private def run(batches: Seq[Seq[(String, Long)]]): Seq[(String, Long, Long, Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    val input = MemoryStream[(String, Long)](s)
    val events = input.toDF().toDF("event_type", "day")
      .selectExpr("event_type", "timestamp_micros(day * 86400000000) AS ts")
    val out = FactStateStreams.ewmaAnomaly(s, events)
    val dir = java.nio.file.Files.createTempDirectory("stream-ewma").toString
    val name = s"ewma_${System.nanoTime()}"
    val q = out.writeStream
      .format("memory").queryName(name)
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", s"$dir/cp")
      .trigger(Trigger.ProcessingTime(50))
      .start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      s.table(name)
        .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
        .sortBy(r => (r._1, r._2))
    } finally q.stop()
  }

  test("hand fixture: level and deviation recursion match the batch arithmetic") {
    // 'a': 8 events day0, 40 day1, 8 day2; day3 sentinel closes day2.
    //   seed e=8 v=0
    //   day1 n=40: dev=32 > 3*0 and > 3 -> anomaly; e=(40+24)/4=16, v=8
    //   day2 n=8:  dev=8  <= 3*8        -> quiet;  rows end here
    val got = run(Seq(
      Seq.fill(8)(("a", 0L)) ++ Seq.fill(40)(("a", 1L)) ++
        Seq.fill(8)(("a", 2L)) :+ (("a", 3L))))
    assert(got == Seq(
      ("a", 1L, 40L, 8L, 32L, 1L),
      ("a", 2L, 8L, 16L, 8L, 0L)), s"recursion diverged: $got")
  }

  test("quiet days are grid rows: a gap emits one row per zero day") {
    // 'b': 16 events day0, then one day4 (sentinel closes nothing more).
    //   seed e=16 v=0
    //   day1 n=0: dev=16 anomaly; e=12, v=4
    //   day2 n=0: dev=12 <= 12 quiet BUT dev > 3... 12 > 3*4=12 false -> 0
    //             e=9, v=(12+12)/4=6
    //   day3 n=0: dev=9 <= 18 quiet; e=6, v=(9+18)/4=6
    val got = run(Seq(Seq(("b", 0L)) ++ Seq.fill(15)(("b", 0L)) :+ (("b", 4L))))
    assert(got == Seq(
      ("b", 1L, 0L, 16L, 16L, 1L),
      ("b", 2L, 0L, 12L, 12L, 0L),
      ("b", 3L, 0L, 9L, 9L, 0L)), s"zero-run rows diverged: $got")
  }

  test("micro-batch boundaries do not change the fold") {
    val one = run(Seq(
      Seq.fill(8)(("c", 0L)) ++ Seq.fill(40)(("c", 1L)) ++
        Seq.fill(4)(("c", 3L)) :+ (("c", 5L))))
    val multi = run(Seq(
      Seq.fill(8)(("c", 0L)),
      Seq.fill(40)(("c", 1L)),
      Seq.fill(4)(("c", 3L)) :+ (("c", 5L))))
    assert(one == multi, s"batch split changed output:\n one=$one\n multi=$multi")
  }

  test("batch parity: stream prefix + sentinel equals events_ewma_anomaly on the prefix") {
    val s = spark
    import s.implicits._
    // irregular multi-type fixture
    val rows = Seq.fill(6)(("x", 0L)) ++ Seq.fill(2)(("x", 1L)) ++
      Seq.fill(30)(("x", 3L)) ++ Seq.fill(7)(("x", 4L)) ++
      Seq.fill(3)(("y", 1L)) ++ Seq.fill(3)(("y", 2L)) ++ Seq.fill(25)(("y", 5L))
    // batch side: same rows as an events.parquet fixture
    val dir = java.nio.file.Files.createTempDirectory("ewma-parity").toFile
    dir.deleteOnExit()
    rows.zipWithIndex.map { case ((t, day), i) =>
      (i.toLong, day * 86400000000L, 1L, t, 1.0, "{}")
    }.toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .selectExpr("event_id", "CAST(timestamp_micros(ts_us) AS TIMESTAMP_NTZ) AS ts",
        "user_id", "event_type", "value", "props")
      .write.mode("overwrite")
      .parquet(new java.io.File(dir, "events.parquet").toString)
    val batch = graft.operators.Timeseries.queries("events_ewma_anomaly")(s, dir.toString)
      .selectExpr("event_type", "day", "n", "ewma_prev", "dev", "is_anomaly")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
      .sortBy(r => (r._1, r._2))
    // stream side: sentinels one day past each type's max close every
    // real grid day without adding any
    val streamed = run(Seq(rows ++ Seq(("x", 5L), ("y", 6L))))
    assert(streamed == batch,
      s"stream diverged from batch fold:\n stream=$streamed\n batch=$batch")
  }
}
