package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Graph, Retrieval, Similarity}

/** Round-12 wave 6: synchronous label propagation, the triplet-margin
  * eval, and PRF query expansion — plain-Scala recomputations over the
  * collected sf0.001 tables (the third leg next to Spark + DuckDB). */
class Round12Wave6Spec extends AnyFunSuite {

  private def spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** Co-purchase edges recomputed naively: parts sharing ≥2 distinct
    * orders (the Graph module's census, brute-forced). */
  private def edgeSet: Set[(Long, Long)] = {
    val rows = spark.read.parquet(s"$sf/lineitem.parquet")
      .selectExpr("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    rows.toSeq.groupBy(_._1).values.toSeq
      .flatMap { items =>
        val ps: Seq[Long] = items.map(_._2).distinct.sorted
        for (a <- ps; b <- ps if a < b) yield (a, b)
      }
      // keySet, NOT .collect{...=> e}.toSet: collect on a Map with a
      // tuple-valued function rebuilds a MAP, silently collapsing pairs
      // by their first element
      .groupBy(identity).filter(_._2.size >= 2).keySet
  }

  test("graph_label_propagation equals 3 synchronous min-tiebreak rounds " +
      "over the brute-forced edge set") {
    val es = edgeSet
    val adj = (es.toSeq.map { case (u, v) => (u, v) } ++
      es.toSeq.map { case (u, v) => (v, u) }).groupBy(_._1)
      .view.mapValues(_.map(_._2)).toMap
    var lab: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
    (1 to 3).foreach { _ =>
      lab = adj.map { case (n, nbrs) =>
        val votes = nbrs.groupBy(lab).view.mapValues(_.size).toSeq
        n -> votes.minBy { case (l, c) => (-c, l) }._1
      }
    }
    val expected = lab.groupBy(_._2).map { case (c, ns) =>
      (c, ns.size.toLong, ns.keys.min, ns.keys.max)
    }.toSeq.sortBy(_._1)
    val got = Graph.queries("graph_label_propagation")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected, s"got ${got.take(8)}…\nexpected ${expected.take(8)}…")
    // LPA must be at least as fine as connected components: more (or as
    // many) communities than components
    assert(got.nonEmpty)
  }

  test("embedding_triplet_eval equals a hardest-positive/negative margin " +
      "recomputation (exact doubles, shared cosine fold)") {
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong,
        r.getSeq[Float](2).map(_.toDouble).toArray)).sortBy(_._1)
    def cosPpm(a: Array[Double], b: Array[Double]): Long = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 1000000).toLong
    }
    val margins = embs.filter(_._1 < 100).flatMap { case (q, ql, qv) =>
      val scored = embs.filter(_._1 != q)
        .map { case (v, l, xv) => (v, l, cosPpm(qv, xv)) }
      val pos = scored.filter(_._2 == ql)
      val neg = scored.filter(_._2 != ql)
      if (pos.isEmpty || neg.isEmpty) None
      else {
        val p = pos.minBy(t => (-t._3, t._1))._3
        val n = neg.minBy(t => (-t._3, t._1))._3
        Some((ql, p - n))
      }
    }
    val expected = margins.groupBy(_._1).map { case (l, ms) =>
      val wins = ms.count(_._2 > 0).toLong
      (l, ms.length.toLong, wins, wins * 10000 / ms.length,
        ms.map(_._2).sum / ms.length)
    }.toSeq.sortBy(_._1)
    val got = Similarity.queries("embedding_triplet_eval")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected, s"got $got\nexpected $expected")
  }

  test("retrieval_prf_expansion: expansion terms are top-3-doc terms not " +
      "in the original query; the weighted round-2 ranking equals a BigInt " +
      "recomputation from the chosen terms") {
    val terms = Retrieval.queries("retrieval_prf_terms")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(2))).toSeq
    assert(terms.groupBy(_._1).forall(_._2.size <= 2))
    val orig = Map(
      1L -> Set("spark", "table", "join"),
      2L -> Set("fast", "scan"),
      3L -> Set("window", "agg", "value"))
    terms.foreach { case (q, t) =>
      assert(!orig(q).contains(t), s"expansion $t repeats an original term of q$q")
    }
    // every expansion term occurs in at least one of the query's top-3 docs
    val top3 = Retrieval.queries("text_bm25_topk")(spark, sf).collect()
      .filter(_.getLong(1) <= 3).map(r => (r.getLong(0), r.getLong(2)))
    val docTok = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(' ').filter(_.nonEmpty).toSet)
      .toMap
    terms.foreach { case (q, t) =>
      assert(top3.filter(_._1 == q).exists(d => docTok(d._2).contains(t)),
        s"expansion $t not in q$q's top-3 docs")
    }
    // full BigInt recomputation of the weighted round-2 ranking from the
    // CHOSEN expansion terms (weights: originals 2, expansions 1)
    val docSeqTok = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(' ').filter(_.nonEmpty).toSeq)
      .toSeq.sortBy(_._1)
    val n = BigInt(docSeqTok.size)
    val sumDl = BigInt(docSeqTok.map(_._2.size.toLong).sum)
    val e6 = BigInt(1000000)
    val qt2: Map[Long, Seq[(String, Long)]] =
      (orig.toSeq.flatMap { case (q, ts) => ts.toSeq.map(t => (q, t, 2L)) } ++
        terms.map { case (q, t) => (q, t, 1L) })
        .groupBy(_._1).view.mapValues(_.map(x => (x._2, x._3))).toMap
    val expected = qt2.toSeq.flatMap { case (q, wterms) =>
      val scores = docSeqTok.flatMap { case (id, toks) =>
        val dl = BigInt(toks.size)
        val s = wterms.map { case (t, w) =>
          val tf = BigInt(toks.count(_ == t))
          if (tf == 0) BigInt(0)
          else {
            val df = BigInt(docSeqTok.count(_._2.contains(t)))
            val idf = ((n * 2 - df * 2 + 1) * e6) / (df * 2 + 1)
            val tfc = (BigInt(22) * tf * sumDl * e6) /
              (BigInt(10) * sumDl * tf + BigInt(3) * sumDl + BigInt(9) * dl * n)
            BigInt(w) * ((idf * tfc) / e6)
          }
        }.sum
        if (wterms.exists { case (t, _) => toks.contains(t) }) Some((id, s.toLong))
        else None
      }
      scores.sortBy { case (id, s) => (-s, id) }.take(10).zipWithIndex.map {
        case ((id, s), i) => (q, (i + 1).toLong, id, s)
      }
    }.sortBy(t => (t._1, t._2))
    val got = Retrieval.queries("retrieval_prf_expansion")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected, s"got ${got.take(12)}\nexpected ${expected.take(12)}")
    assert(got.size == 30)
  }
}
