package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.FactStateStreams

/** Streaming lag-1 autocorrelation: the O(1)-state moment fold must agree
  * with the batch `events_autocorr` semantics — including the closed-form
  * zero-run folding for quiet days — and must persist state across
  * micro-batches.
  */
class StreamingAutocorrSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark

  private val DayUs = 86400L * 1000000

  /** Feed (event_type, day) batches; returns emitted update rows. */
  private def run(batches: Seq[Seq[(String, Long)]]): Seq[(String, Long, Long, Long, Long, Option[Long])] = {
    val s = spark
    import s.implicits._
    val input = MemoryStream[(String, Long)](s)
    val events = input.toDF().toDF("event_type", "day")
      .selectExpr("event_type", "timestamp_micros(day * 86400000000) AS ts")
    val out = FactStateStreams.dailyAutocorr(s, events)
    val dir = java.nio.file.Files.createTempDirectory("stream-ac").toString
    val name = s"autocorr_${System.nanoTime()}"
    val q = out.writeStream
      .format("memory").queryName(name)
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", s"$dir/cp")
      .trigger(Trigger.ProcessingTime(50))
      .start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      s.table(name)
        .as[(String, Long, Long, Long, Long, Option[Long])].collect().toSeq
        .sortBy(r => (r._1, r._2))
    } finally q.stop()
  }

  test("alternating series with gaps converges to the batch answer (r = -1)") {
    // one event on each of days 0, 2, 4, 6 (days 1/3/5 are zero-filled
    // gaps), day 7 sentinel closes day 6 — the batch fixture: series
    // 1,0,1,0,1,0,1 -> 6 lag-1 pairs, cov_num = -9, r = -1.000000
    val got = run(Seq(Seq(
      ("click", 0L), ("click", 2L), ("click", 4L), ("click", 6L), ("click", 7L))))
    val last = got.last
    assert(last == (("click", 6L, 1L, 6L, -9L, Some(-1000000L))),
      s"final moments diverge from the batch fixture: $got")
  }

  test("state persists across micro-batches (same moments as single-batch)") {
    val oneBatch = run(Seq(Seq(
      ("a", 0L), ("a", 2L), ("a", 4L), ("a", 6L), ("a", 7L))))
    val multiBatch = run(Seq(
      Seq(("a", 0L)), Seq(("a", 2L)), Seq(("a", 4L)), Seq(("a", 6L), ("a", 7L))))
    assert(oneBatch == multiBatch,
      s"batch boundaries changed the fold:\n one=$oneBatch\n multi=$multiBatch")
  }

  test("zero-run closed form: a long quiet period only moves n_pairs/sy/syy") {
    // days 0 (2 events) then 10: the 9 quiet days contribute one (0,2)
    // pair and eight (0,0) pairs; closing day 0 emits n_pairs = 9
    val got = run(Seq(Seq(("b", 0L), ("b", 0L), ("b", 10L))))
    assert(got.size == 1)
    val (typ, day, n, nPairs, covNum, r) = got.head
    assert(typ == "b" && day == 0L && n == 2L)
    assert(nPairs == 9L, s"zero run folded wrong pair count: $got")
    // sx = 0, sy = 2 -> cov_num = 9*0 - 0*2 = 0; var_x = 0 -> r undefined
    assert(covNum == 0L && r.isEmpty, s"zero-run moments wrong: $got")
  }

  test("constant daily counts yield zero variance and no r") {
    val got = run(Seq(Seq(("c", 0L), ("c", 1L), ("c", 2L), ("c", 3L))))
    // closes days 0,1,2 -> after day 2 closes: pairs (1,1),(1,1); var = 0
    val last = got.last
    assert(last._4 == 2L && last._5 == 0L && last._6.isEmpty,
      s"constant series must have undefined r: $got")
  }
}
