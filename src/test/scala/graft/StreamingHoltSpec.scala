package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.FactStateStreams

/** Streaming Holt forecast (fifteenth face): the four-integer level/trend
  * fold must agree with the batch `events_holt_winters` recursion over any
  * prefix — signed trends included — and must be invariant to micro-batch
  * boundaries.
  */
class StreamingHoltSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark

  private def run(batches: Seq[Seq[(String, Long)]]): Seq[(String, Long, Long, Long, Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    val input = MemoryStream[(String, Long)](s)
    val events = input.toDF().toDF("event_type", "day")
      .selectExpr("event_type", "timestamp_micros(day * 86400000000) AS ts")
    val out = FactStateStreams.holtForecast(s, events)
    val dir = java.nio.file.Files.createTempDirectory("stream-holt").toString
    val name = s"holt_${System.nanoTime()}"
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

  test("hand fixture: rising series matches the batch fold step-for-step") {
    // 'A': 40/80/120 on days 0/1/2 — the batch spec's fixture:
    //   seed l=40 t=0; day1: l=50 t=1 f=51 mae=400000;
    //   day2: l=68 t=3 f=71 mae=545000
    val got = run(Seq(
      Seq.fill(40)(("A", 0L)) ++ Seq.fill(80)(("A", 1L)) ++
        Seq.fill(120)(("A", 2L)) :+ (("A", 3L))))
    assert(got == Seq(
      ("A", 1L, 80L, 50L, 1L, 51L, 400000L),
      ("A", 2L, 120L, 68L, 3L, 71L, 545000L)), s"fold diverged: $got")
  }

  test("declining series keeps a negative trend (truncation toward zero)") {
    // 'B': 120/40 on days 0/1: l=100, t=-20/8=-2, forecast 98
    val got = run(Seq(
      Seq.fill(120)(("B", 0L)) ++ Seq.fill(40)(("B", 1L)) :+ (("B", 2L))))
    assert(got == Seq(("B", 1L, 40L, 100L, -2L, 98L, 800000L)),
      s"signed trend diverged: $got")
  }

  test("micro-batch boundaries do not change the fold") {
    val rows = Seq.fill(40)(("c", 0L)) ++ Seq.fill(80)(("c", 1L)) ++
      Seq.fill(10)(("c", 4L)) :+ (("c", 6L))
    val one = run(Seq(rows))
    val multi = run(Seq(
      Seq.fill(40)(("c", 0L)), Seq.fill(80)(("c", 1L)),
      Seq.fill(10)(("c", 4L)) :+ (("c", 6L))))
    assert(one == multi, s"batch split changed output:\n one=$one\n multi=$multi")
  }

  test("batch parity: final streamed state equals events_holt_winters on the prefix") {
    val s = spark
    import s.implicits._
    val rows = Seq.fill(12)(("x", 0L)) ++ Seq.fill(40)(("x", 1L)) ++
      Seq.fill(3)(("x", 3L)) ++ Seq.fill(25)(("x", 5L)) ++
      Seq.fill(30)(("y", 2L)) ++ Seq.fill(6)(("y", 3L)) ++ Seq.fill(2)(("y", 4L))
    val dir = java.nio.file.Files.createTempDirectory("holt-parity").toFile
    dir.deleteOnExit()
    rows.zipWithIndex.map { case ((t, day), i) =>
      (i.toLong, day * 86400000000L, 1L, t, 1.0, "{}")
    }.toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .selectExpr("event_id", "CAST(timestamp_micros(ts_us) AS TIMESTAMP_NTZ) AS ts",
        "user_id", "event_type", "value", "props")
      .write.mode("overwrite")
      .parquet(new java.io.File(dir, "events.parquet").toString)
    // batch declares (level, trend, mae_e4) of the final fold state,
    // repeated across horizons — take the h=1 row per type
    val batch = graft.operators.Timeseries.queries("events_holt_winters")(s, dir.toString)
      .filter("horizon = 1")
      .selectExpr("event_type", "level", "trend", "mae_e4")
      .as[(String, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    val streamed = run(Seq(rows ++ Seq(("x", 6L), ("y", 5L))))
    val finals = streamed.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, rs) =>
      val last = rs.maxBy(_._2)
      (t, last._4, last._5, last._7)
    }
    assert(finals == batch,
      s"stream final state diverged from batch fold:\n stream=$finals\n batch=$batch")
  }
}
