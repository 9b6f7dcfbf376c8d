package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.FactStateStreams

/** Streaming deterministic reservoir: the per-language k smallest
  * (coin, doc_id) slots must equal the batch sample_reservoir over the
  * same prefix regardless of arrival order or micro-batch boundaries,
  * and a batch that does not change a reservoir must emit nothing. */
class StreamingReservoirSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** (lang, seq, rank, docId, coin, nTokens) rows from a full run. */
  private def run(batches: Seq[Seq[(Long, String, Long)]], k: Int): Seq[(String, Long, Long, Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    val input = MemoryStream[(Long, String, Long)](s)
    val docs = input.toDF().toDF("doc_id", "lang", "n_tokens")
    val out = FactStateStreams.reservoirSample(s, docs, k)
    val dir = java.nio.file.Files.createTempDirectory("stream-res").toString
    val name = s"res_${System.nanoTime()}"
    val q = out.writeStream
      .format("memory").queryName(name)
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", s"$dir/cp")
      .trigger(Trigger.ProcessingTime(50))
      .start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      s.table(name).as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    } finally q.stop()
  }

  /** Final reservoir = the max-seq emission per language. */
  private def finalReservoir(rows: Seq[(String, Long, Long, Long, Long, Long)]): Map[String, Seq[(Long, Long)]] =
    rows.groupBy(_._1).map { case (lang, rs) =>
      val last = rs.map(_._2).max
      lang -> rs.filter(_._2 == last).sortBy(_._3).map(r => (r._4, r._5))
    }

  test("stream reservoir equals the batch sample_reservoir on the sf0.001 corpus") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "lang",
        "CAST(size(filter(split(text, ' '), t -> t != '')) AS BIGINT) AS n_tokens")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    // adversarial arrival order: descending doc_id, split across 3 batches
    val shuffled = docs.sortBy(-_._1)
    val batches = shuffled.grouped(math.max(shuffled.size / 3, 1)).toSeq
    val got = finalReservoir(run(batches, 5))
    val batchRows = graft.operators.TrainingPipeline
      .queries("sample_reservoir")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = batchRows.groupBy(_._1).map { case (lang, rs) =>
      lang -> rs.sortBy(_._2).map(r => (r._3, r._4)).toSeq
    }
    assert(got == expected, s"got $got\nexpected $expected")
    graft.operators.CacheScope.releaseAll()
  }

  test("a batch that cannot displace any slot emits nothing (seq stays put)") {
    // doc 1 and 2 fill a k=1 reservoir; whichever lost can never win later
    val first = run(Seq(Seq((1L, "en", 10L), (2L, "en", 20L))), 1)
    val winner = finalReservoir(first)("en").head._1
    val loser = if (winner == 1L) 2L else 1L
    val again = run(Seq(
      Seq((1L, "en", 10L), (2L, "en", 20L)),
      Seq((loser, "en", 99L))), 1)
    assert(finalReservoir(again)("en") == finalReservoir(first)("en"))
    // the losing re-delivery must not have bumped seq
    assert(again.map(_._2).max == first.map(_._2).max,
      s"non-displacing batch re-emitted: $again")
  }
}
