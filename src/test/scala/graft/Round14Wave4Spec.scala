package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.CrossHash

/** Round-14 wave 4: the blocking-reliability gauge and its decoy-quantile
  * yardstick, recomputed independently in plain Scala — sample coin, exact
  * pair cosines, band census, recall arithmetic, and type-1 quantiles all
  * re-derived from the raw parquet with simple loops; the blocked side
  * re-derives candidate pairs from the production cell assignment but with
  * independent pair/containment logic (the assignment itself IS the
  * semantics under test — "blocked" = shares an assigned cell). */
class Round14Wave4Spec extends AnyFunSuite {

  private def spark = SparkTestSession.spark
  private val P = CrossHash.P
  private val Scramble = CrossHash.CoinScramble

  private def load(sf: String): Map[Long, Array[Float]] =
    spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap

  private def cosPpm(a: Array[Float], b: Array[Float]): Long = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 1000000).toLong
  }

  private def sampleIds(all: Seq[Long], n: Long): Seq[Long] = {
    val rate = math.min(10000L, 500L * 10000 / n)
    all.filter(id => (id % P) * Scramble % P % 10000 < rate).sorted
  }

  for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"dedup_blocking_reliability at $sf: bands, hits, and recall " +
        "arithmetic match a plain-Scala recomputation") {
      val vecs = load(sf)
      val ids = sampleIds(vecs.keys.toSeq, vecs.size.toLong)
      val truth = for {
        i <- ids.indices; j <- (i + 1) until ids.size
        c = cosPpm(vecs(ids(i)), vecs(ids(j)))
        if c >= 400000
      } yield ((ids(i), ids(j)), math.min(c / 100000, 7L))
      // candidate containment from the production assignment relation,
      // independent pair logic (set intersection, not a join)
      val k = graft.operators.Similarity.blockingCellCount(vecs.size.toLong)
      val cells = graft.operators.Similarity
        .coarseCells(sf, spark.read.parquet(s"$sf/embeddings.parquet"),
          assignK = 4, cells = k)
        .collect().map(r => (r.getLong(0), r.getInt(1)))
        .groupBy(_._1).map { case (v, cs) => v -> cs.map(_._2).toSet }
      val hits = truth.filter { case ((a, b), _) =>
        (cells(a) & cells(b)).nonEmpty }
      val wantTruth = truth.groupBy(_._2).map { case (b, t) => b -> t.size.toLong }
      val wantHit = hits.groupBy(_._2).map { case (b, t) => b -> t.size.toLong }
      val got = graft.operators.Dedup.queries("dedup_blocking_reliability")(spark, sf)
        .collect().map(r => (r.getLong(0) / 100000, r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3)))
      assert(got.map(_._1).toSeq == Seq(4L, 5L, 6L, 7L), "band rows")
      got.foreach { case (band, nTruth, nHit, recall) =>
        assert(nTruth == wantTruth.getOrElse(band, 0L), s"band $band truth")
        assert(nHit == wantHit.getOrElse(band, 0L), s"band $band hit")
        val want = if (nTruth == 0) -1L else nHit * 1000000 / nTruth
        assert(recall == want, s"band $band recall")
      }
    }

    test(s"embedding_decoy_quantiles at $sf: type-1 quantiles of the " +
        "sampled pair-cosine distribution match a plain-Scala sort") {
      val vecs = load(sf)
      val ids = sampleIds(vecs.keys.toSeq, vecs.size.toLong)
      val cos = (for {
        i <- ids.indices; j <- (i + 1) until ids.size
      } yield cosPpm(vecs(ids(i)), vecs(ids(j)))).sorted
      val n = cos.size.toLong
      def q(pctBp: Long): Long = {
        // min v with cum·10⁴ ≥ pct·tot == value at 1-based position
        // ceil(pct·n / 10⁴)
        val pos = (pctBp * n + 9999) / 10000
        cos((pos - 1).toInt)
      }
      val got = graft.operators.Dedup.queries("embedding_decoy_quantiles")(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got.keySet == Set(5000L, 9000L, 9900L, 9990L))
      for ((p, v) <- got) assert(v == q(p), s"quantile p$p")
    }
  }
}
