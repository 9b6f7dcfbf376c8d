package graft

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import org.scalatest.funsuite.AnyFunSuite

/** The LINEAR regime of cell-blocked embedding near-dup, measured. The
  * sf0.01→sf0.1 ratio table (PLANS.md) shows 3.2× at 10× rows for this
  * family — the K-FLOOR regime: below n=1000 the learned-cell count floors
  * at 10, so cell size itself grew 80→400 across exactly that pair. Past
  * the floor the schedule (K = max(10, n/100), Similarity.blockingCellCount)
  * pins cell size at ~100 and the candidate stream grows linearly in n.
  * That claim had one measured point; this spec adds the second: a 10×
  * replica of the sf0.1 embeddings (20k vectors → K = 200) must hold
  *
  *  - near-linear wall-clock (measured 1.7× at 10× rows; the pair stream
  *    at 10× rows under a FIXED-cardinality block key would be ~100×), and
  *  - DECISION recall ≥ 0.9 vs the EXACT all-pairs cosine ≥ 0.4 truth at
  *    20k, computed honestly over the replicated corpus itself (measured
  *    0.98). Pair-level recall is reported but NOT pinned: the truth set
  *    is quadratic in n (fixed clusters densify — pairs/n grows ~linearly
  *    in the real corpus too), so no linear-work candidate generator can
  *    emit 90% of it; what dedup needs is that every vector with at least
  *    one exact near-dup appears in at least one emitted pair.
  *
  * Replication discipline (the round-7 document replicator's
  * constant-density rule): replica k applies a coordinate rotation —
  * orthogonal, so within-replica cosines are preserved — which
  * decorrelates replicas, keeping near-dup DENSITY constant while volume
  * grows 10×. The truth kernel below replays vec_dot/vec_norm2 semantics
  * exactly (double accumulation over float elements in index order,
  * floor-ppm at 400000), so recall is measured against the operator's own
  * declared pair definition, not an approximation of it. */
class EmbeddingBlockingScaleSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.1"
  private val Reps = 10

  private def exactTruth(rows: Array[(Long, Array[Float])]): Set[(Long, Long)] = {
    val n = rows.length
    val norm2 = rows.map { case (_, v) =>
      var acc = 0.0; var i = 0
      while (i < v.length) { acc += v(i).toDouble * v(i).toDouble; i += 1 }
      acc
    }
    val out = new ConcurrentLinkedQueue[(Long, Long)]()
    java.util.stream.IntStream.range(0, n).parallel().forEach { a =>
      val va = rows(a)._2
      var b = a + 1
      while (b < n) {
        val vb = rows(b)._2
        var acc = 0.0; var i = 0
        while (i < va.length) { acc += va(i).toDouble * vb(i).toDouble; i += 1 }
        val ppm = math.floor(acc / (math.sqrt(norm2(a)) * math.sqrt(norm2(b))) * 1000000).toLong
        if (ppm >= 400000L) {
          val (ia, ib) = (rows(a)._1, rows(b)._1)
          out.add((math.min(ia, ib), math.max(ia, ib)))
        }
        b += 1
      }
    }
    import scala.jdk.CollectionConverters._
    out.asScala.toSet
  }

  test("10x embeddings (K=200, past the floor): near-linear wall-clock, recall >= 0.9") {
    val s = SparkTestSession.spark
    val base = s.read.parquet(s"$sf/embeddings.parquet")
    val n = base.count()
    val dim = base.selectExpr("size(embedding)").head().getInt(0)

    // 1x control in a FRESH dir: the verified-pair and codebook caches are
    // keyed by corpus dir, so timing sf0.1 directly could serve another
    // suite's cached artifact and measure nothing
    val dir1 = Files.createTempDirectory("emb-scale-1x-").toString
    base.write.mode("overwrite").parquet(s"$dir1/embeddings.parquet")
    val dir10 = Files.createTempDirectory("emb-scale-10x-").toString
    (0 until Reps).map { k =>
      base.selectExpr(s"vec_id + ${k * n}L AS vec_id",
        s"transform(sequence(0, ${dim - 1}), i -> embedding[(i + ${7 * k}) % $dim]) AS embedding",
        "label")
    }.reduce(_.unionAll(_))
      .coalesce(8).write.mode("overwrite").parquet(s"$dir10/embeddings.parquet")

    def timedPairs(dir: String): (Double, Set[(Long, Long)]) = {
      val t0 = System.nanoTime()
      val got = graft.operators.Dedup.queries("dedup_embedding_cosine")(s, dir)
        .select("vec_a", "vec_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      ((System.nanoTime() - t0) / 1e9, got)
    }
    val (t1, p1) = timedPairs(dir1)
    val (t10, p10) = timedPairs(dir10)
    info(f"1x (n=$n): $t1%.2f s, ${p1.size} pairs; 10x (n=${n * Reps}): $t10%.2f s, ${p10.size} pairs")

    // near-linear wall-clock: 10x rows in <= 4x wall (fixed overhead still
    // amortizes at this size; a quadratic pair stream would be ~100x). The
    // sf0.01->sf0.1 step measured 3.2x ONLY because of the K floor; this
    // pins the post-floor regime.
    val ratio = t10 / t1
    info(f"wall-clock ratio: $ratio%.2fx")
    assert(ratio <= 4.0, f"wall-clock ratio $ratio%.1fx at 10x rows - not near-linear")

    // exact truth OF THE 20k CORPUS (driver-side all-pairs, same
    // float->double dot and floor-ppm as the Catalyst kernels)
    val rows = s.read.parquet(s"$dir10/embeddings.parquet")
      .selectExpr("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val truth = exactTruth(rows)
    assert(p10.subsetOf(truth),
      s"operator emitted non-near-dup pairs: ${p10.diff(truth).take(5)}")
    val pairRecall = p10.size.toDouble / truth.size
    // the truth itself is QUADRATIC in n here (pairs/n grows ~linearly in
    // the real corpus too: 0.12 at 500 vectors, 0.46 at 2000 — fixed label
    // clusters densify), so a linear-candidate generator cannot hold
    // pair-level recall at scale BY CONSTRUCTION: emitting 0.9 of a
    // quadratic set is quadratic work. The scale-meaningful recall for the
    // SemDeDup product is DECISION recall — a vector with at least one
    // exact near-dup must appear in at least one emitted pair (else dedup
    // keeps a duplicate it should drop); that set is linear-sized.
    val truthVecs = truth.flatMap(p => Seq(p._1, p._2))
    val gotVecs = p10.flatMap(p => Seq(p._1, p._2))
    val decisionRecall = (gotVecs & truthVecs).size.toDouble / truthVecs.size
    info(f"pair recall at 10x: $pairRecall%.3f (${p10.size}/${truth.size}); " +
      f"decision recall: $decisionRecall%.3f (${(gotVecs & truthVecs).size}/${truthVecs.size})")
    assert(decisionRecall >= 0.9,
      f"decision recall $decisionRecall%.3f below 0.9 at K=200")
    graft.operators.CacheScope.releaseAll()
  }
}
