package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.FactStateStreams

/** Streaming one-sided CUSUM chart (twenty-second face): 14-day warm-up
  * freezes μ₀, then each closing grid day advances
  * S⁺ = max(0, S⁺ + (n·100 − μ₀ − μ₀/10)) and emits the chart row. The
  * emissions must equal the batch `events_cusum_alarms` rows (which
  * compute the same recursion through the prefix-min window identity)
  * over the same closed prefix.
  */
class StreamingCusumSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark

  private def run(batches: Seq[Seq[(String, Long)]]): Seq[(String, Long, Long, Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    val input = MemoryStream[(String, Long)](s)
    val events = input.toDF().toDF("event_type", "day")
      .selectExpr("event_type", "timestamp_micros(day * 86400000000) AS ts")
    val out = FactStateStreams.cusumAlarms(s, events)
    val dir = java.nio.file.Files.createTempDirectory("stream-cusum").toString
    val name = s"cusum_${System.nanoTime()}"
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

  /** Bursty series: 3/day for the 14 warm-up days (μ₀ = 300 e2), then a
    * sustained surge that must trip the 5μ₀ alarm. */
  private def surge(t: String): Seq[(String, Long)] =
    (0L until 14L).flatMap(d => Seq.fill(3)((t, d))) ++
      (14L until 22L).flatMap(d => Seq.fill(9)((t, d)))

  test("warm-up emits nothing; the surge accrues S+ and trips the 5·mu0 alarm") {
    val got = run(Seq(surge("A") :+ (("A", 22L))))
    // 8 post-warm-up closed days (14..21)
    assert(got.size == 8, s"got $got")
    assert(got.forall(_._4 == 300L), s"mu0 drifted: $got")
    // dev per surge day = 900 - 300 - 30 = 570
    got.zipWithIndex.foreach { case ((_, day, n, _, sp, alarm), i) =>
      assert(day == 14L + i && n == 9L && sp == 570L * (i + 1), s"row $i: $got")
      assert(alarm == (if (sp >= 1500L) 1L else 0L), s"alarm at day $day")
    }
    assert(got.count(_._6 == 1L) == 6, s"alarm days: $got")
  }

  test("S+ clamps at zero through quiet stretches (zero-filled grid days)") {
    // warm-up at 3/day, then nothing until day 20 — the gap closes as
    // zero-count days whose negative deviations must clamp, not go deep
    val got = run(Seq(
      (0L until 14L).flatMap(d => Seq.fill(3)(("q", d))) :+ (("q", 20L)) :+ (("q", 21L))))
    val byDay = got.map(r => r._2 -> r._5).toMap
    // days 14..19 close with n=0: dev = -330 each, S+ stays 0
    (14L to 19L).foreach(d => assert(byDay(d) == 0L, s"day $d: $got"))
  }

  test("emissions equal the batch events_cusum_alarms rows on the closed prefix") {
    val s = spark
    import s.implicits._
    val rows = surge("x") ++ (0L until 20L).flatMap(d =>
      Seq.fill((d % 5 + 1).toInt)(("y", d)))
    val dir = java.nio.file.Files.createTempDirectory("cusum-parity").toFile
    dir.deleteOnExit()
    rows.zipWithIndex.map { case ((t, day), i) =>
      (i.toLong, day * 86400000000L, 1L, t, 1.0, "{}")
    }.toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .selectExpr("event_id", "CAST(timestamp_micros(ts_us) AS TIMESTAMP_NTZ) AS ts",
        "user_id", "event_type", "value", "props")
      .write.mode("overwrite")
      .parquet(new java.io.File(dir, "events.parquet").toString)
    val batch = graft.operators.Timeseries.queries("events_cusum_alarms")(s, dir.toString)
      .selectExpr("event_type", "day", "n", "mu0_e2", "s_plus_e2", "alarm")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
      .sortBy(r => (r._1, r._2))
    graft.operators.CacheScope.releaseAll()
    // sentinels close every observed day in the stream; the zero-filled
    // run-out to the sentinel has no batch counterpart (each type's batch
    // grid ends at its own max observed day) — compare on the batch keys
    val batchKeys = batch.map(r => (r._1, r._2)).toSet
    val streamed = run(Seq(rows ++ Seq(("x", 99L), ("y", 99L))))
      .filter(r => batchKeys.contains((r._1, r._2)))
    assert(streamed == batch,
      s"stream cusum diverged from batch:\n stream=$streamed\n batch=$batch")
  }

  test("micro-batch boundaries do not change the chart") {
    val rows = surge("c")
    val one = run(Seq(rows :+ (("c", 30L))))
    val multi = run(rows.grouped(17).toSeq :+ Seq(("c", 30L)))
    assert(one == multi, s"batch split changed output:\n one=$one\n multi=$multi")
  }
}
