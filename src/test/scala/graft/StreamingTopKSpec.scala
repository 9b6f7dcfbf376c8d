package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.FactStateStreams

/** Streaming space-saving top-k face: the final summary must equal a plain
  * Scala reference fold over the same position-ordered arrivals, and the
  * space-saving certificates must hold against exact counts — every
  * estimate bounds its item's true frequency (true ≤ est ≤ true + maxErr)
  * and every item with true frequency > N/k is present in the summary. */
class StreamingTopKSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private val K = 8

  private val P = 1000000007L
  private def charHash(s: String): Long =
    s.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % P)

  /** (lang, hash, pos) arrivals from the sf0.001 corpus in doc order. */
  private lazy val arrivals: Seq[(String, Long, Long)] = {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "lang", "text").collect()
      .sortBy(_.getLong(0))
    docs.iterator.flatMap { r =>
      r.getString(2).split(' ').filter(_.nonEmpty)
        .map(t => (r.getString(1), charHash(t)))
    }.zipWithIndex.map { case ((lang, h), i) => (lang, h, i.toLong) }.toSeq
  }

  private def run(batches: Seq[Seq[(String, Long, Long)]]): Seq[(String, Long, Long, Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    val input = MemoryStream[(String, Long, Long)](s)
    val hashes = input.toDF().toDF("lang", "h", "pos")
    val out = FactStateStreams.spaceSavingTopK(s, hashes, K)
    val dir = java.nio.file.Files.createTempDirectory("stream-topk").toString
    val name = s"topk_${System.nanoTime()}"
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

  /** Reference space-saving fold: same eviction and tie-break semantics. */
  private def reference(seq: Seq[(String, Long, Long)]): Map[String, Seq[(Long, Long, Long)]] =
    seq.groupBy(_._1).map { case (lang, rows) =>
      var m = Map.empty[Long, (Long, Long)]
      rows.sortBy(_._3).foreach { case (_, h, _) =>
        m.get(h) match {
          case Some((n, err)) => m = m.updated(h, (n + 1L, err))
          case None if m.size < K => m = m.updated(h, (1L, 0L))
          case None =>
            val (eh, (en, _)) = m.minBy { case (hh, (nn, _)) => (nn, hh) }
            m = (m - eh).updated(h, (en + 1L, en))
        }
      }
      lang -> m.toSeq.map { case (h, (n, err)) => (h, n, err) }
        .sortBy(e => (-e._2, e._1))
    }

  /** Final (max-seq) summary per language from the stream output. */
  private def finalSummary(rows: Seq[(String, Long, Long, Long, Long, Long)]): Map[String, Seq[(Long, Long, Long)]] =
    rows.groupBy(_._1).map { case (lang, rs) =>
      val last = rs.map(_._2).max
      lang -> rs.filter(_._2 == last).sortBy(_._3).map(r => (r._4, r._5, r._6))
    }

  test("final summary equals the reference fold; certificates hold vs exact counts") {
    // split into 5 micro-batches at arbitrary boundaries (position order
    // preserved within batches, as the store's subscribe stream delivers)
    val batches = arrivals.grouped(math.max(arrivals.size / 5, 1)).toSeq
    val got = finalSummary(run(batches))
    val want = reference(arrivals)
    assert(got == want, s"stream summary diverged from reference fold")

    val exact = arrivals.groupBy(a => (a._1, a._2)).view.mapValues(_.size.toLong).toMap
    val totals = arrivals.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    for ((lang, entries) <- got) {
      assert(entries.size <= K)
      for ((h, est, err) <- entries) {
        val c = exact((lang, h))
        assert(c <= est, s"$lang/$h: est $est under-counts true $c")
        assert(est - err <= c, s"$lang/$h: est $est − err $err exceeds true $c")
      }
      // guaranteed coverage: true frequency > N/k must be tracked
      val present = entries.map(_._1).toSet
      for (((l, h), c) <- exact if l == lang && c > totals(lang) / K)
        assert(present.contains(h), s"$lang/$h: frequency $c > N/k missing from summary")
    }
  }

  test("state is bounded at k entries and seq advances monotonically per language") {
    val batches = arrivals.grouped(math.max(arrivals.size / 3, 1)).toSeq
    val rows = run(batches)
    for ((lang, rs) <- rows.groupBy(_._1)) {
      for ((_, perSeq) <- rs.groupBy(_._2))
        assert(perSeq.size <= K, s"$lang: summary larger than k")
      val seqs = rs.map(_._2).distinct.sorted
      assert(seqs == (1L to seqs.size.toLong), s"$lang: seq gaps: $seqs")
    }
  }
}
