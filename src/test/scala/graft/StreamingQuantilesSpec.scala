package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.FactStateStreams

/** Streaming bucketed-quantile face: the emitted p50/p90/p99 are EXACT over
  * the floor-bucketed domain (full-histogram state, not a sketch), so the
  * final update per type must equal a plain-Scala recompute with the shared
  * rank rule (smallest bucket with cum·100 ≥ n·q) on the sf0.001 events —
  * under adversarial arrival order and arbitrary micro-batch splits. */
class StreamingQuantilesSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val arrivals: Seq[(String, Double)] =
    spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq

  private def run(batches: Seq[Seq[(String, Double)]]): Seq[(String, Long, Long, Long, Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    val input = MemoryStream[(String, Double)](s)
    val events = input.toDF().toDF("event_type", "value")
    val out = FactStateStreams.valueQuantiles(s, events)
    val dir = java.nio.file.Files.createTempDirectory("stream-quant").toString
    val name = s"quant_${System.nanoTime()}"
    val q = out.writeStream
      .format("memory").queryName(name)
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", s"$dir/cp")
      .trigger(Trigger.ProcessingTime(50))
      .start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      s.table(name).as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    } finally q.stop()
  }

  private def bucket(v: Double): Long =
    math.min(math.max(math.floor(v), 0.0), (FactStateStreams.QuantBuckets - 1).toDouble).toLong

  /** Exact bucketed percentiles with the shared rank rule. */
  private def exact(vals: Seq[Double]): (Long, Long, Long, Long) = {
    val bs = vals.map(bucket).sorted
    val n = bs.size.toLong
    def pct(q: Long): Long = {
      var cum = 0L
      for (b <- bs.distinct) {
        cum = bs.count(_ <= b)
        if (cum * 100 >= n * q) return b
      }
      bs.last
    }
    (pct(50), pct(90), pct(99), bs.max)
  }

  test("final quantiles equal the exact bucketed recompute on sf0.001 events") {
    // adversarial order: descending by value, 4 micro-batches
    val shuffled = arrivals.sortBy(-_._2)
    val batches = shuffled.grouped(math.max(shuffled.size / 4, 1)).toSeq
    val rows = run(batches)
    val got = rows.groupBy(_._1).map { case (t, rs) =>
      val last = rs.maxBy(_._2)
      t -> ((last._3, last._4, last._5, last._6, last._7))
    }
    val want = arrivals.groupBy(_._1).map { case (t, vs) =>
      val (p50, p90, p99, mx) = exact(vs.map(_._2))
      t -> ((vs.size.toLong, p50, p90, p99, mx))
    }
    assert(got == want, s"got $got\nwant $want")
    // percentiles are ordered and within the bucket domain on EVERY update
    rows.foreach { r =>
      assert(r._4 <= r._5 && r._5 <= r._6 && r._6 <= r._7,
        s"percentiles out of order: $r")
      assert(r._7 < FactStateStreams.QuantBuckets)
    }
    // seq gapless per type
    rows.groupBy(_._1).foreach { case (t, rs) =>
      val seqs = rs.map(_._2).distinct.sorted
      assert(seqs == (1L to seqs.size.toLong), s"$t: seq gaps $seqs")
    }
  }

  test("final face state equals the batch events_value_percentiles twin") {
    val batch = graft.operators.Timeseries.queries("events_value_percentiles")(spark, sf)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val rows = run(Seq(arrivals))
    val got = rows.groupBy(_._1).map { case (t, rs) =>
      val last = rs.maxBy(_._2)
      t -> ((last._3, last._4, last._5, last._6, last._7))
    }
    assert(got == batch, s"face $got\nbatch $batch")
  }

  test("values above the bucket domain clamp into the top bucket") {
    val rows = run(Seq(Seq(("t", 10.0), ("t", 99999.0))))
    val last = rows.maxBy(_._2)
    assert(last._7 == (FactStateStreams.QuantBuckets - 1).toLong)
    assert(last._3 == 2L)
  }
}
