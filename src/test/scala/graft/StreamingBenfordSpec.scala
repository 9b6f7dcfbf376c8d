package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.FactStateStreams

/** Streaming Benford census: the per-type max-seq emission after any batch
  * split must equal the batch `events_value_benford` rows column-for-column
  * (digit extraction is one shared definition — DataQuality
  * .benfordEventSelect — so any divergence is a counter-fold bug), and the
  * per-type update count is bounded by the number of batches that carried
  * events for that type (state is 9 counters, never stream-sized). */
class StreamingBenfordSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("final streamed census equals batch events_value_benford under adversarial splits") {
    val s = spark
    import s.implicits._
    val evs = s.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    // adversarial arrival: reversed order, 5 uneven batches
    val shuffled = evs.reverse
    val batches = Seq(
      shuffled.take(1), shuffled.slice(1, 7),
      shuffled.slice(7, evs.size / 2), shuffled.slice(evs.size / 2, evs.size - 3),
      shuffled.takeRight(3)).filter(_.nonEmpty)

    val input = MemoryStream[(String, Double)](s)
    val out = FactStateStreams.benfordCensus(
      s, input.toDF().toDF("event_type", "value"))
    val dir = java.nio.file.Files.createTempDirectory("stream-benford").toString
    val name = s"benford_${System.nanoTime()}"
    val q = out.writeStream
      .format("memory").queryName(name)
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", s"$dir/cp")
      .trigger(Trigger.ProcessingTime(20))
      .start()
    val rows =
      try {
        batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
        s.table(name)
          .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
      } finally q.stop()

    // max-seq emission per type = final census
    val got = rows.groupBy(_._1).flatMap { case (typ, rs) =>
      val last = rs.map(_._2).max
      rs.filter(_._2 == last).map(r => (typ, r._3) -> ((r._4, r._5, r._6, r._7)))
    }
    val expected = graft.operators.DataQuality.queries("events_value_benford")(s, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == expected, s"got $got\nexpected $expected")
    // per-type seq counts only batches that carried events for that type
    rows.groupBy(_._1).foreach { case (typ, rs) =>
      assert(rs.map(_._2).max <= batches.size.toLong,
        s"$typ emitted more updates than batches")
    }
  }
}
