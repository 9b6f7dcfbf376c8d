package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Round-12 wave 16 pins: filtered search, post-filter loss, isotropy —
  * each recomputed brute-force in plain Scala on sf0.001. */
class Round12Wave16Spec extends AnyFunSuite {

  private def spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def vecs: Array[(Long, Int, Array[Float])] =
    spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))

  private def cosPpm(a: Array[Float], b: Array[Float]): Long = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < 64) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 1000000).toLong
  }

  test("ann_filtered_topk equals a brute-force filtered recomputation") {
    val vs = vecs
    val expected = vs.filter(_._1 < 5).flatMap { case (qid, qlab, qv) =>
      vs.filter(v => v._2 == qlab && v._1 != qid)
        .map(v => (v._1, cosPpm(qv, v._3)))
        .sortBy { case (id, c) => (-c, id) }.take(5).zipWithIndex
        .map { case ((id, c), i) => (qid, qlab.toLong, i + 1L, id, c) }
    }.toSet
    val got = Similarity.queries("ann_filtered_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected)
  }

  test("ann_postfilter_recall_eval equals a brute-force recomputation and " +
      "post-filtering never beats the exact filtered truth") {
    val vs = vecs
    val expected = vs.filter(_._1 < 5).map { case (qid, qlab, qv) =>
      val scored = vs.filter(_._1 != qid)
        .map(v => (v._1, v._2, cosPpm(qv, v._3)))
        .sortBy { case (id, _, c) => (-c, id) }
      val post = scored.take(15).filter(_._2 == qlab).take(5).map(_._1).toSet
      val truth = scored.filter(_._2 == qlab).take(5).map(_._1).toSet
      val hits = (post & truth).size.toLong
      (qid, qlab.toLong, post.size.toLong, hits, hits * 10000 / 5)
    }.toSet
    val got = Similarity.queries("ann_postfilter_recall_eval")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == expected)
    got.foreach { case (_, _, nAfter, hits, bp) =>
      assert(nAfter <= 5 && hits <= nAfter && bp <= 10000)
    }
  }

  test("embedding_isotropy equals a brute-force pair recomputation") {
    val panel = vecs.filter(_._1 < 64).sortBy(_._1)
    val cs = for {
      i <- panel.indices; j <- (i + 1) until panel.length
    } yield cosPpm(panel(i)._3, panel(j)._3)
    val n = cs.length.toLong
    val expected = (n, cs.sum / n, cs.map(math.abs).sum / n, cs.min, cs.max)
    val row = Similarity.queries("embedding_isotropy")(spark, sf).collect().head
    val got = (row.getLong(0), row.getLong(1), row.getLong(2),
      row.getLong(3), row.getLong(4))
    assert(got == expected)
  }
}
