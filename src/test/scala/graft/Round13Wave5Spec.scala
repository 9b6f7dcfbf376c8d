package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DataQuality, Similarity, TextAnalysis}

/** Independent recomputation / invariant pinning for the round-13 wave-5
  * operators. */
class Round13Wave5Spec extends AnyFunSuite {

  private def spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("dq_iqr_outliers equals a plain-Scala census with type-1 quartiles " +
      "and doubled-integer Tukey fences") {
    val rows = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_type", "CAST(floor(value) AS BIGINT) AS v")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (g, vs) =>
      val census = vs.map(_._2).groupBy(identity).view.mapValues(_.size.toLong)
        .toSeq.sortBy(_._1)
      val n = vs.size.toLong
      def quant(k: Long): Long = {
        var cum = 0L
        census.foreach { case (v, c) =>
          cum += c; if (cum * 4 >= n * k) return v }
        census.last._1
      }
      val (q1, q3) = (quant(1), quant(3))
      val lo = census.filter { case (v, _) => 2 * v < 2 * q1 - 3 * (q3 - q1) }
        .map(_._2).sum
      val hi = census.filter { case (v, _) => 2 * v > 2 * q3 + 3 * (q3 - q1) }
        .map(_._2).sum
      (g, n, q1, q3, q3 - q1, lo, hi)
    }
    val got = DataQuality.queries("dq_iqr_outliers")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == expected)
    // the screen is live on this corpus: the heavy tail trips the fence
    assert(got.map(_._7).sum > 0, "no high outliers found — screen is inert")
  }

  test("tokenizer_vocab_overlap equals plain-Scala set algebra over " +
      "per-language vocabularies") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(' ').filter(_.nonEmpty).toSet))
    val vocab = docs.groupBy(_._1).view
      .mapValues(_.iterator.flatMap(_._2).toSet).toMap
    val langs = vocab.keys.toSeq.sorted
    val expected = for {
      i <- langs.indices; j <- (i + 1) until langs.size
      (a, b) = (langs(i), langs(j))
      sh = (vocab(a) intersect vocab(b)).size.toLong
    } yield (a, b, vocab(a).size.toLong, vocab(b).size.toLong, sh,
      sh * 1000000L / (vocab(a).size + vocab(b).size - sh))
    val got = TextAnalysis.queries("tokenizer_vocab_overlap")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected.toSeq)
  }

  test("ann_ivf_imbalance: assignment count, bounds, and Gini stay " +
      "internally consistent with the corpus") {
    val nVecs = spark.read.parquet(s"$sf/embeddings.parquet").count()
    val r = Similarity.queries("ann_ivf_imbalance")(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    val (nCells, nAssign, mn, mx, hot, gini) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
        row.getLong(4), row.getLong(5))
    // 2-cell multi-assignment: every vector lands in exactly two cells
    assert(nAssign == 2 * nVecs, s"assignments $nAssign vs 2x$nVecs vectors")
    assert(mn >= 1 && mn <= mx && mx <= nAssign)
    // hot factor >= 1e6 (max >= mean) with equality iff perfectly balanced
    assert(hot >= 1000000L, s"hot=$hot")
    assert(hot == mx * nCells * 1000000L / nAssign)
    assert(gini >= 0 && gini < 1000000L, s"gini=$gini")
  }
}
