package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.FactStateStreams

/** Streaming MinHash near-dup detection: candidates surface across
  * micro-batches from band-bucket state, exact dups estimate ~1.0, and
  * unrelated docs never pair. */
class StreamingDedupSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark

  private val textA =
    "the quick brown fox jumps over the lazy dog while the cat watches from the warm windowsill nearby today"
  private val textB =
    "completely different subject matter entirely about distributed query engines shuffling partitioned columnar data across executor nodes"

  test("near-dup candidates across micro-batches; no cross-talk between unrelated docs") {
    val s = spark
    import s.implicits._
    val input = MemoryStream[(Long, String)](s)
    val docs = input.toDF().toDF("doc_id", "text")
    val out = FactStateStreams.nearDupCandidates(s, docs)

    val dir = java.nio.file.Files.createTempDirectory("stream-dedup").toString
    val q = out.writeStream
      .format("memory").queryName("neardup_candidates")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", s"$dir/cp")
      .trigger(Trigger.ProcessingTime(50))
      .start()
    try {
      // batch 1: two unrelated docs — no candidates
      input.addData((1L, textA), (2L, textB))
      q.processAllAvailable()
      assert(s.table("neardup_candidates").count() == 0,
        "unrelated docs must not surface as candidates")

      // batch 2: doc 3 repeats doc 1's text — candidate (1,3) at est 1.0,
      // found against STATE from the earlier batch
      input.addData((3L, textA))
      q.processAllAvailable()
      val pairs = s.table("neardup_candidates")
        .as[(Long, Long, Long)].collect().toSeq.distinct
      assert(pairs.nonEmpty, "exact dup never surfaced from band state")
      assert(pairs.forall { case (a, b, _) => (a, b) == (1L, 3L) },
        s"unexpected pairs: $pairs")
      assert(pairs.exists(_._3 == 10000L),
        s"identical docs should estimate Jaccard 1.0, got: $pairs")

      // batch 3: near-dup of A (one word changed) pairs with BOTH 1 and 3
      input.addData((4L, textA.replace("lazy", "sleepy")))
      q.processAllAvailable()
      val all = s.table("neardup_candidates")
        .as[(Long, Long, Long)].collect().toSeq.distinct
      val withFour = all.collect { case (a, b, est) if b == 4L => (a, est) }
      assert(withFour.map(_._1).toSet == Set(1L, 3L),
        s"near-dup should pair with both prior copies, got: $all")
      assert(withFour.forall(_._2 >= 5000L),
        s"near-dup estimate unexpectedly low: $withFour")
    } finally {
      q.stop()
    }
  }
}
