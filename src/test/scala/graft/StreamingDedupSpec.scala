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

  test("verified stream: exact-Jaccard stage confirms true dups and kills borderline candidates") {
    val s = spark
    import s.implicits._
    // corpus: 1 and 3 identical (exact J = 1.0); 5 one word appended
    // (J = 17/18 ≈ 0.944 — must pass); 4 one word changed + one appended
    // (J = 14/21 ≈ 0.667 — close enough for its MinHash bands to collide,
    // but BELOW the 0.7 exact bar: the pair the verifier must kill);
    // 2 unrelated
    val corpusRows = Seq(
      (1L, textA), (2L, textB), (3L, textA),
      (4L, textA.replace("lazy", "sleepy") + " alpha"), (5L, textA + " extra"))
    val corpus = corpusRows.toDF("doc_id", "text")

    val inputC = MemoryStream[(Long, String)](s)
    val inputV = MemoryStream[(Long, String)](s)
    val cands = FactStateStreams.nearDupCandidates(s, inputC.toDF().toDF("doc_id", "text"))
    val out = FactStateStreams.verifiedNearDups(s, inputV.toDF().toDF("doc_id", "text"), corpus)

    val dir = java.nio.file.Files.createTempDirectory("stream-dedup-v").toString
    val qc = cands.writeStream
      .format("memory").queryName("neardup_cands_v")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", s"$dir/cpc")
      .trigger(Trigger.ProcessingTime(50))
      .start()
    val qv = out.writeStream
      .format("memory").queryName("neardup_verified")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", s"$dir/cpv")
      .trigger(Trigger.ProcessingTime(50))
      .start()
    try {
      inputC.addData(corpusRows: _*)
      inputV.addData(corpusRows: _*)
      qc.processAllAvailable()
      qv.processAllAvailable()
      val candPairs = s.table("neardup_cands_v")
        .as[(Long, Long, Long)].collect().toSeq.map(p => (p._1, p._2)).distinct
      val verified = s.table("neardup_verified")
        .as[(Long, Long, Long)].collect().toSeq.distinct.sorted
      // the borderline pair MUST have surfaced as a candidate — otherwise
      // the kill assertion below would be vacuous
      assert(candPairs.contains((1L, 4L)) || candPairs.contains((3L, 4L)),
        s"borderline near-dup never became a candidate: $candPairs")
      // exact expected set from shingle arithmetic: (1,3) identical at
      // 10000 bp; (1,5)/(3,5) at floor(17/18·10⁴) = 9444 bp; every pair
      // involving 4 is sub-bar (6666 bp) and 2 never matches anything
      assert(verified == Seq((1L, 3L, 10000L), (1L, 5L, 9444L), (3L, 5L, 9444L)),
        s"verified pairs wrong: $verified")
      assert(!verified.exists(p => p._1 == 4L || p._2 == 4L),
        "borderline candidate (J≈0.667) leaked past the exact verifier")
    } finally {
      qc.stop()
      qv.stop()
    }
  }
}
