package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Retrieval, Similarity, Stats, TextAnalysis}

/** Independent plain-Scala/BigInt recomputation of the round-13 wave-3
  * operators (the dual-pinning discipline: the DuckDB oracle checks the
  * declared SQL semantics; these check the arithmetic from first
  * principles on raw table reads / composed source outputs). */
class Round13Wave3Spec extends AnyFunSuite {

  private def spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("stats_mann_whitney equals a plain-Scala BigInt midrank recomputation") {
    val rows = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_orderpriority",
        "CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT) AS e4")
      .collect().map(r => (r.getString(0), r.getLong(1) / 10000000L))
    val buckets = rows.groupBy(_._2).view
      .mapValues(_.groupBy(_._1).view.mapValues(_.length.toLong).toMap).toMap
    val bucketTotals = buckets.view.mapValues(_.values.sum).toMap
    val ordered = bucketTotals.keys.toSeq.sorted
    var cum = 0L
    val midrank2 = ordered.map { b =>
      val m = 2 * cum + bucketTotals(b) + 1; cum += bucketTotals(b); b -> m
    }.toMap
    val nAll = rows.length.toLong
    val expected = rows.map(_._1).distinct.sorted.toSeq.map { p =>
      val nG = rows.count(_._1 == p).toLong
      val r2 = ordered.map(b =>
        BigInt(buckets(b).getOrElse(p, 0L)) * midrank2(b)).sum
      val u2 = r2 - BigInt(nG) * (nG + 1)
      (p, nG, nAll - nG, u2.toString,
        (u2 * 1000000 / (BigInt(2) * nG * (nAll - nG))).toLong)
    }
    val got = Stats.queries("stats_mann_whitney")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4))).toSeq
    assert(got == expected)
    // AUC sanity: each group's probability-of-superiority is a probability
    got.foreach { case (p, _, _, _, auc) =>
      assert(auc >= 0 && auc <= 1000000, s"$p auc=$auc") }
  }

  test("text_lang_diversity equals a plain-Scala census (Simpson on BigInt, " +
      "hapax on frequency-1 types)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(' ').filter(_.nonEmpty)))
    val expected = docs.groupBy(_._1).toSeq.sortBy(_._1).map { case (lang, ds) =>
      val tf = ds.flatMap(_._2).groupBy(identity).view.mapValues(_.length.toLong)
      val n = tf.values.sum
      val sumSq = tf.values.map(v => BigInt(v) * v).sum
      val hapax = tf.values.count(_ == 1L).toLong
      (lang, tf.size.toLong, n, hapax,
        hapax * 1000000L / tf.size,
        (BigInt(1000000) - sumSq * 1000000 / (BigInt(n) * n)).toLong)
    }
    val got = TextAnalysis.queries("text_lang_diversity")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
  }

  test("retrieval_rank_correlation equals plain-Scala set/pair counting " +
      "over the two composed source rankings") {
    val bm = Retrieval.queries("text_bm25_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(1))) // (q, doc, rank)
    val cs = Similarity.queries("ann_bruteforce_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(1)))
      .filter(r => Set(1L, 2L, 3L)(r._1))
    val expected = Seq(1L, 2L, 3L).map { q =>
      val a = bm.filter(_._1 == q).map(t => t._2 -> t._3).toMap
      val b = cs.filter(_._1 == q).map(t => t._2 -> t._3).toMap
      val common = a.keySet intersect b.keySet
      val pairs = common.toSeq.sorted.combinations(2).toSeq
      val conc = pairs.count { case Seq(x, y) =>
        (a(x) - a(y)) * (b(x) - b(y)) > 0 }
      val jac = if (a.isEmpty && b.isEmpty) None
        else Some(common.size.toLong * 1000000L / (a.size + b.size - common.size))
      val tau = if (pairs.isEmpty) None
        else Some((2L * conc - pairs.size) * 1000000L / pairs.size)
      (q, a.size.toLong, b.size.toLong, common.size.toLong, jac,
        if (pairs.isEmpty) None else Some(pairs.size.toLong),
        if (pairs.isEmpty) None else Some(conc.toLong), tau)
    }
    val got = Retrieval.queries("retrieval_rank_correlation")(spark, sf)
      .collect().map { r =>
        def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          opt(4), opt(5), opt(6), opt(7))
      }.toSeq
    assert(got == expected)
  }

  test("retrieval_source_eval equals plain-Scala precision/MRR against the " +
      "composed fusion top-5") {
    val rel = Retrieval.queries("retrieval_rrf_fusion")(spark, sf).collect()
      .filter(_.getLong(1) <= 5).map(r => (r.getLong(0), r.getLong(2))).toSet
    val bm = Retrieval.queries("text_bm25_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), "bm25", r.getLong(2), r.getLong(1)))
    val cs = Similarity.queries("ann_bruteforce_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), "cosine", r.getLong(2), r.getLong(1)))
      .filter(r => Set(1L, 2L, 3L)(r._1))
    val expected = (bm ++ cs).filter(r => rel((r._1, r._3)))
      .groupBy(r => (r._1, r._2)).toSeq.sortBy(_._1).map { case ((q, src), hits) =>
        val h5 = hits.count(_._4 <= 5).toLong
        val first = hits.map(_._4).min
        (q, src, hits.length.toLong, h5, h5 * 1000000L / 5,
          first, 1000000L / first)
      }
    val got = Retrieval.queries("retrieval_source_eval")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == expected)
  }
}
