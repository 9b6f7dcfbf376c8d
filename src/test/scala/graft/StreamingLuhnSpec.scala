package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.FactStateStreams

/** Streaming Luhn census: the per-source final state after any batch split
  * must equal the batch `pii_luhn_stats` row column-for-column (the
  * extraction + checksum fold is one shared definition, so any divergence
  * is a state-fold bug), and a batch with no docs for a source must emit
  * nothing for it. */
class StreamingLuhnSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("final streamed counters equal batch pii_luhn_stats under adversarial splits") {
    val s = spark
    import s.implicits._
    val docs = s.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    // adversarial arrival: reversed doc order, 5 uneven batches
    val shuffled = docs.reverse
    val batches = Seq(
      shuffled.take(1), shuffled.slice(1, 7),
      shuffled.slice(7, docs.size / 2), shuffled.slice(docs.size / 2, docs.size - 3),
      shuffled.takeRight(3)).filter(_.nonEmpty)

    val input = MemoryStream[(Long, String, String)](s)
    val out = FactStateStreams.piiLuhnCensus(
      s, input.toDF().toDF("doc_id", "source", "text"))
    val dir = java.nio.file.Files.createTempDirectory("stream-luhn").toString
    val name = s"luhn_${System.nanoTime()}"
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

    // max-seq emission per source = final state
    val got = rows.groupBy(_._1).map { case (src, rs) =>
      val last = rs.maxBy(_._2)
      src -> ((last._3, last._4, last._5, last._6, last._7))
    }
    val expected = graft.operators.Pii.queries("pii_luhn_stats")(s, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    // batch columns: n_docs, docs_with_cand, n_candidates, n_luhn_valid, docs_with_valid
    assert(got == expected, s"got $got\nexpected $expected")
    // per-source seq counts only batches that carried docs for that source
    val maxSeq = rows.groupBy(_._1).view.mapValues(_.map(_._2).max)
    maxSeq.foreach { case (src, sq) =>
      assert(sq <= batches.size.toLong, s"$src emitted more updates than batches")
    }
  }
}
