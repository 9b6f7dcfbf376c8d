package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.CrossHash._
import graft.operators.Similarity

/** Recall guardrails for the approximate candidate generators, measured
  * against exact bruteforce ground truth on the sf0.1 corpus. The point is
  * not a target recall — it is that the NEXT parameter change (planes,
  * blocks, hamming radius) shows up as a measured recall delta here
  * instead of silently destroying candidate quality. Numbers are recorded
  * in PLANS.md §recall. */
class LshRecallSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.1"
  private lazy val spark = {
    val s = SparkTestSession.spark
    graft.functions.VectorFunctions.register(s)
    graft.functions.TextHashFunctions.register(s)
    s
  }

  test("ann_lsh_pairs: same-bucket recall vs bruteforce at 8 and 10 planes") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "embedding AS v", "vec_norm2(embedding) AS n2",
        s"${Similarity.lshBucketSparkExpr("embedding", 8)} AS b8",
        s"${Similarity.lshBucketSparkExpr("embedding", 10)} AS b10")
      .persist()
    val pairs = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .selectExpr(
        "CAST(floor(vec_dot(a.v, b.v) / (sqrt(a.n2) * sqrt(b.n2)) * 1000000) AS BIGINT) AS cos_ppm",
        "a.b8 = b.b8 AS same8", "a.b10 = b.b10 AS same10")
      .persist()

    def recallAt(minPpm: Long): (Long, Double, Double) = {
      val r = pairs.filter(col("cos_ppm") >= minPpm)
        .agg(count(lit(1)), sum(when(col("same8"), 1L).otherwise(0L)),
          sum(when(col("same10"), 1L).otherwise(0L)))
        .head()
      val truth = r.getLong(0)
      (truth, r.getLong(1).toDouble / truth, r.getLong(2).toDouble / truth)
    }

    val (truth1, r8at1, r10at1) = recallAt(100000) // operator threshold 0.1
    val (truth4, r8at4, r10at4) = recallAt(400000) // dedup-grade 0.4
    info(f"cos>=0.1: truth=$truth1 recall(8 planes)=$r8at1%.3f recall(10)=$r10at1%.3f")
    info(f"cos>=0.4: truth=$truth4 recall(8 planes)=$r8at4%.3f recall(10)=$r10at4%.3f")
    e.unpersist(); pairs.unpersist()

    // guardrails: more planes must not INCREASE recall (finer buckets), and
    // the default configuration must keep finding high-similarity pairs
    assert(truth1 > 0 && truth4 > 0, "corpus has no similar pairs — spec is vacuous")
    assert(r8at1 >= r10at1 - 1e-9, "more planes should narrow buckets, not widen recall")
    assert(r8at4 > 0.0, "default planes find no dedup-grade pairs at all")
  }

  test("dedup_simhash: block-LSH recall is exactly 1.0 within the guaranteed radius") {
    val sigs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id",
        s"array_distinct(${shingleHashesSpark(wordHashesSpark("text"))}) AS sh")
      .filter("size(sh) > 0")
      .selectExpr("doc_id", "simhash60(sh) AS sig")
      .persist()

    val ham = sigs.as("a").join(sigs.as("b"), col("a.doc_id") < col("b.doc_id"))
      .selectExpr("a.doc_id AS da", "b.doc_id AS db",
        "bit_count(a.sig ^ b.sig) AS hamming",
        // same 4 x 15-bit block layout as the operator
        (0 until SimhashBlocks).map(i =>
          s"(shiftright(a.sig, ${i * SimhashBlockBits}) & ${(1 << SimhashBlockBits) - 1}) = " +
          s"(shiftright(b.sig, ${i * SimhashBlockBits}) & ${(1 << SimhashBlockBits) - 1})")
          .mkString("(", " OR ", ") AS candidate"))
      .persist()

    def recallAt(maxHam: Int): (Long, Long) = {
      val r = ham.filter(col("hamming") <= maxHam)
        .agg(count(lit(1)), sum(when(col("candidate"), 1L).otherwise(0L))).head()
      (r.getLong(0), r.getLong(1))
    }

    val (truth3, found3) = recallAt(3)
    val (truth5, found5) = recallAt(5)
    info(s"hamming<=3: truth=$truth3 found=$found3 (pigeonhole-guaranteed)")
    info(f"hamming<=5: truth=$truth5 found=$found5 recall=${found5.toDouble / truth5}%.3f (beyond guarantee)")
    ham.unpersist(); sigs.unpersist()

    assert(truth3 > 0, "no hamming<=3 pairs in corpus — spec is vacuous")
    // 4 blocks, <=3 differing bits: at least one block must be identical
    assert(found3 == truth3, "pigeonhole guarantee broken — block layout changed?")
  }
}
