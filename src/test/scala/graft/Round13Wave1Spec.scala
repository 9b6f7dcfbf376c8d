package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.FactStateStreams

/** Round-13 hardening of the degenerate-input paths the round-12 advisor
  * flagged: driver-side greedies on pools smaller than their pick count
  * (crash vs the oracle's silent shorter output), zero-norm vectors in the
  * streaming cosine faces (NaN folded as a fabricated 0), and re-appended
  * vec_ids in knnMaintenance (duplicate neighborhood slots). */
class Round13Wave1Spec extends AnyFunSuite {

  private def spark = SparkTestSession.spark

  /** Temp table dir with only a tiny documents.parquet. */
  private def tinyCorpus(docs: Seq[(Long, String, String, String, Long)]): String = {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-tiny").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("retrieval_mmr_rerank emits a shorter pick list (oracle's empty p_k " +
      "behavior) when a query has fewer than MmrPicks candidates") {
    val dir = tinyCorpus(Seq(
      (1L, "spark table join", "en", "web", 16L),
      (2L, "spark fast scan", "en", "web", 15L)))
    val rows = graft.operators.Retrieval
      .queries("retrieval_mmr_rerank")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // query 1 (spark table join) matches both docs -> 2 picks;
    // query 2 (fast scan) matches only doc 2 -> 1 pick;
    // query 3 (window agg value) matches nothing -> absent
    val byQ = rows.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(byQ.keySet == Set(1L, 2L))
    assert(byQ(1L) == Seq(1L, 2L), s"query 1 picks: ${byQ(1L)}")
    assert(byQ(2L) == Seq(1L), s"query 2 picks: ${byQ(2L)}")
    assert(rows.filter(r => r._1 == 2L && r._2 == 1L).map(_._3).toSeq == Seq(2L))
  }

  test("sample_coverage_greedy stops at pool exhaustion instead of an " +
      "empty-minBy crash when the corpus has fewer than CovPicks docs") {
    val dir = tinyCorpus(Seq(
      (1L, "alpha beta gamma", "en", "web", 16L),
      (2L, "alpha delta", "en", "web", 11L),
      (3L, "epsilon", "en", "web", 7L)))
    val rows = graft.operators.Mining
      .queries("sample_coverage_greedy")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 3L), s"got $rows")
    // greedy order: doc1 (gain 3), doc2 (+delta), doc3 (+epsilon)
    assert(rows.map(_._2).toSeq == Seq(1L, 2L, 3L))
    assert(rows.map(_._3).toSeq == Seq(3L, 1L, 1L))
    assert(rows.last._4 == 5L)
  }

  test("embeddingDriftMonitor rejects zero-norm vectors instead of folding " +
      "floor(NaN) = 0 into the drift moments") {
    val s = spark
    import s.implicits._
    val input = MemoryStream[(Long, Seq[Float])](s)
    val out = FactStateStreams.embeddingDriftMonitor(
      s, input.toDF().toDF("vec_id", "embedding"),
      panel = Seq((10L, Array(1.0, 0.0))))
    val dir = java.nio.file.Files.createTempDirectory("stream-drift0").toString
    val name = s"drift0_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", s"$dir/cp")
      .trigger(Trigger.ProcessingTime(20)).start()
    val rows =
      try {
        input.addData((1L, Seq(0f, 0f)), (2L, Seq(1f, 0f)))
        q.processAllAvailable()
        s.table(name).as[(Long, Long, Long, Long, Long, Long, Long)]
          .collect().toSeq
      } finally q.stop()
    val last = rows.filter(_._1 == 10L).maxBy(_._2)
    // only the unit vector reaches the fold: n = 1, mean = min = max = 1e6
    assert(last._3 == 1L, s"zero-norm vector was folded: $last")
    assert(last._4 == 1000000L && last._6 == 1000000L && last._7 == 1000000L)
  }

  test("knnMaintenance skips zero-norm vectors and collapses a re-appended " +
      "vec_id to its single best-cos neighborhood slot") {
    val s = spark
    import s.implicits._
    val input = MemoryStream[(Long, Seq[Float])](s)
    val out = FactStateStreams.knnMaintenance(
      s, input.toDF().toDF("vec_id", "embedding"),
      probes = Seq((10L, Array(1.0, 0.0))), k = 3)
    val dir = java.nio.file.Files.createTempDirectory("stream-knn0").toString
    val name = s"knn0_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", s"$dir/cp")
      .trigger(Trigger.ProcessingTime(20)).start()
    val rows =
      try {
        input.addData((1L, Seq(1f, 0f)), (2L, Seq(0f, 0f)))
        q.processAllAvailable()
        // id 1 re-appended with a rotated embedding (cos 0.6) + a fresh id 3
        input.addData((1L, Seq(0.6f, 0.8f)), (3L, Seq(0f, 1f)))
        q.processAllAvailable()
        s.table(name).as[(Long, Long, Long, Seq[Long], Seq[Long])]
          .collect().toSeq
      } finally q.stop()
    val last = rows.filter(_._1 == 10L).maxBy(_._2)
    assert(last._3 == 3L, s"zero-norm vector reached the fold: $last")
    assert(last._4 == Seq(1L, 3L), s"duplicate or missing neighbor ids: $last")
    assert(last._5 == Seq(1000000L, 0L), s"best-cos entry not kept: $last")
  }
}
