package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-14 wave 7: retrieval_ndcg_eval recomputed independently — the
  * discount table re-derived from first principles (floor(1e9/log2(r+1))
  * via strictMath, proving the pinned literals ARE the function they
  * claim), and DCG/IDCG/ndcg re-summed from the composed channel and
  * fusion outputs with plain BigInt arithmetic. */
class Round14Wave7Spec extends AnyFunSuite {

  private def spark = SparkTestSession.spark

  test("the pinned DCG discount table equals floor(1e9 / log2(r+1))") {
    // StrictMath (fdlibm) is bit-deterministic across JVMs, so the
    // offline formula re-evaluates to the same integers everywhere;
    // the BigDecimal cross-check bounds the true real quotient to show
    // the floor landed on the right integer (log2 via 60-term atanh
    // series on BigDecimal — converges fast for these arguments)
    val pinned = Seq(1000000000L, 630929753L, 500000000L, 430676558L,
      386852807L, 356207187L, 333333333L, 315464876L, 301029995L, 289064826L)
    val derived = (1 to 10).map(r =>
      (1e9 / (StrictMath.log(r + 1.0) / StrictMath.log(2.0))).toLong)
    assert(derived == pinned, s"table drifted: $derived")
    import java.math.{BigDecimal => BD, MathContext}
    val mc = new MathContext(50)
    def ln(x: BD): BD = { // atanh series: ln x = 2·Σ z^(2k+1)/(2k+1)
      val z = x.subtract(BD.ONE, mc).divide(x.add(BD.ONE, mc), mc)
      val z2 = z.multiply(z, mc)
      var term = z; var sum = z
      for (k <- 1 to 60) {
        term = term.multiply(z2, mc)
        sum = sum.add(term.divide(new BD(2 * k + 1), mc), mc)
      }
      sum.add(sum, mc)
    }
    val ln2 = ln(new BD(2))
    (1 to 10).zip(pinned).foreach { case (r, w) =>
      // w = floor(1e9 / log2(r+1))  ⇔  w·ln(r+1) ≤ 1e9·ln2 < (w+1)·ln(r+1)
      val lnr = ln(new BD(r + 1))
      val target = new BD(1000000000L).multiply(ln2, mc)
      assert(new BD(w).multiply(lnr, mc).compareTo(target) <= 0,
        s"rank $r: pinned $w too large")
      assert(new BD(w + 1).multiply(lnr, mc).compareTo(target) > 0,
        s"rank $r: pinned $w too small")
    }
  }

  for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"retrieval_ndcg_eval at $sf: DCG sums and ndcg arithmetic match " +
        "a BigInt recomputation from the composed channels") {
      val s = spark
      val pinned = Seq(1000000000L, 630929753L, 500000000L, 430676558L,
        386852807L, 356207187L, 333333333L, 315464876L, 301029995L, 289064826L)
      val pool = graft.operators.Retrieval.queries("retrieval_rrf_fusion")(s, sf)
        .filter("rank <= 5").select("query_id", "doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val bm = graft.operators.Retrieval.queries("text_bm25_topk")(s, sf)
        .select("query_id", "doc_id", "rank").collect()
        .map(r => ("bm25", r.getLong(0), r.getLong(1), r.getLong(2)))
      val qids = bm.map(_._2).distinct.toSet
      val cs = graft.operators.Similarity.queries("ann_bruteforce_topk")(s, sf)
        .select("query_id", "neighbor_id", "rank").collect()
        .map(r => ("cosine", r.getLong(0), r.getLong(1), r.getLong(2)))
        .filter(t => qids.contains(t._2))
      val want = (bm ++ cs).groupBy(t => (t._2, t._1)).map { case ((q, src), ts) =>
        val hits = ts.filter(t => pool.contains((t._2, t._3)))
        val dcg = hits.map(t => BigInt(pinned(t._4.toInt - 1))).sum
        (q, src) -> ((hits.size.toLong, dcg,
          dcg * 1000000 / BigInt(pinned.take(5).sum)))
      }
      val got = graft.operators.Retrieval.queries("retrieval_ndcg_eval")(s, sf)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
      assert(got.nonEmpty && got.map(t => (t._1, t._2)).toSet ==
        qids.flatMap(q => Seq((q, "bm25"), (q, "cosine"))))
      got.foreach { case (q, src, nRel, dcg, ndcg) =>
        val (wN, wD, wNd) = want.getOrElse((q, src), (0L, BigInt(0), BigInt(0)))
        assert(nRel == wN, s"($q,$src) n_rel")
        assert(BigInt(dcg) == wD, s"($q,$src) dcg")
        assert(BigInt(ndcg) == wNd, s"($q,$src) ndcg")
      }
    }
  }
}
