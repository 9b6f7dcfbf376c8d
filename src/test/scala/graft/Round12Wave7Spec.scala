package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Similarity}

/** Round-12 wave 7/8 pins: channel agreement, multiprobe dominance, and
  * the quantization Pareto — each recomputed from the outputs of the
  * queries they compose (the composition itself is what these operators
  * add; the composed sources carry their own oracles). */
class Round12Wave7Spec extends AnyFunSuite {

  private def spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("dedup_channel_agreement equals the set algebra of its two " +
      "composed pair queries") {
    val tx = Dedup.queries("dedup_minhash_lsh")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sm = Dedup.queries("dedup_embedding_cosine")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val row = Dedup.queries("dedup_channel_agreement")(spark, sf).collect().head
    assert(row.getLong(0) == tx.size.toLong, "n_textual")
    assert(row.getLong(1) == sm.size.toLong, "n_semantic")
    assert(row.getLong(2) == (tx & sm).size.toLong, "n_both")
    assert(row.getLong(3) == (tx | sm).size.toLong, "n_union")
    assert(row.getLong(4) ==
      (tx & sm).size.toLong * 10000 / math.max((tx | sm).size.toLong, 1L))
  }

  test("multiprobe candidates strictly contain probe1's and recall never " +
      "decreases per query") {
    val rows = Similarity.queries("ann_lsh_multiprobe_recall_eval")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    val p1 = rows.filter(_._1 == "probe1").map(r => r._2 -> ((r._3, r._4))).toMap
    val pm = rows.filter(_._1.startsWith("multiprobe"))
      .map(r => r._2 -> ((r._3, r._4))).toMap
    assert(pm.nonEmpty)
    p1.foreach { case (q, (n1, rec1)) =>
      val (nm, recm) = pm(q)
      assert(nm >= n1, s"q$q: multiprobe candidates shrank")
      assert(recm >= rec1, s"q$q: multiprobe recall decreased")
    }
  }

  test("ann_quantization_pareto equals the per-method means of its " +
      "composed tier evals") {
    val sq8 = Similarity.queries("ann_sq8_recall_eval")(spark, sf).collect()
      .map(_.getLong(3))
    val ivf = Similarity.queries("ann_recall_eval")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(4)))
    val mat = Similarity.queries("embedding_matryoshka_eval")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(4)))
    def mean(xs: Seq[Long]): Long = xs.sum / xs.size
    val got = Similarity.queries("ann_quantization_pareto")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got("full_f32") == ((256L, 5L, 10000L)))
    assert(got("sq8") == ((64L, 5L, mean(sq8.toSeq))))
    assert(got("ivf_pq")._3 == mean(ivf.filter(_._1 == "ivf_pq").map(_._2).toSeq))
    assert(got("ivf_pq_refined")._3 ==
      mean(ivf.filter(_._1 == "ivf_pq_refined").map(_._2).toSeq))
    Seq(8L, 16L, 32L).foreach { d =>
      assert(got(s"matryoshka$d") ==
        ((d * 4, 5L, mean(mat.filter(_._1 == d).map(_._2).toSeq))),
        s"matryoshka$d")
    }
    // the dashboard's reason to exist: bytes ordering is a real tradeoff —
    // at least one cheaper tier must beat a more expensive one
    val byBytes = got.values.toSeq.sortBy(_._1)
    assert(byBytes.sliding(2).exists { case Seq(a, b) => a._3 > b._3 },
      "no Pareto structure — dashboard degenerate")
  }
}
