package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Market, Mining, Retrieval, Similarity, TextAnalysis}

/** Round-12 waves 10–11 pins: plain-Scala recomputations (independent of
  * both engines' SQL) on sf0.001, plus composition identities against the
  * operators each new query extends. */
class Round12Wave11Spec extends AnyFunSuite {

  private def spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def tokens(text: String): Array[String] =
    text.split(' ').filter(_.nonEmpty)

  test("text_token_burstiness equals a plain-Scala cf/df recomputation") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("lang", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val occ = docs.flatMap { case (l, _, t) => tokens(t).map(tok => (l, tok)) }
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val df = docs.flatMap { case (l, id, t) => tokens(t).distinct.map(tok => (l, id, tok)) }
      .map { case (l, _, tok) => (l, tok) }
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val expected = occ.collect {
      case ((l, tok), cf) if df((l, tok)) >= 5 =>
        (l, tok, cf, df((l, tok)), cf * 10000 / df((l, tok)))
    }.toSeq.groupBy(_._1).flatMap { case (_, rows) =>
      rows.sortBy(r => (-r._5, r._2)).take(10).zipWithIndex
        .map { case (r, i) => (r._1, r._2, r._3, r._4, r._5, i + 1L) }
    }.toSet
    val got = Mining.queries("text_token_burstiness")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == expected)
  }

  test("curation_gate_overlap equals a plain-Scala gate+md5 recomputation " +
      "and its lang shares sum to ~10000 bp") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("lang", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val allStop = TextAnalysis.StopLists.flatMap(_._2).distinct.toSet
    def gate(text: String): Long = {
      val tk = tokens(text)
      val n = tk.length.toLong
      val meanX10 = if (n == 0) 0L else tk.map(_.length.toLong).sum * 10 / math.max(n, 1L)
      val alphaBp = if (n == 0) 0L
        else tk.count(_.exists(c => c.isLetter && c < 128.toChar)).toLong * 10000 / math.max(n, 1L)
      val stops = tk.count(allStop.contains).toLong
      if (n >= 10 && n <= 100000 && meanX10 >= 30 && meanX10 <= 100 &&
        alphaBp >= 7000 && stops >= 2) 1L else 0L
    }
    def md5(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val byHash = docs.groupBy { case (_, _, t) => md5(t) }
    val perDoc = docs.map { case (l, id, t) =>
      val grp = byHash(md5(t))
      val redundant = if (grp.length > 1 && id != grp.map(_._2).min) 1L else 0L
      (l, gate(t), redundant)
    }
    val grid = perDoc.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val langTot = perDoc.groupBy(_._1).map { case (l, v) => l -> v.length.toLong }
    val expected = grid.map { case ((l, g, r), n) =>
      (l, g, r, n, n * 10000 / langTot(l))
    }.toSet
    val got = Mining.queries("curation_gate_overlap")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected)
    got.groupBy(_._1).foreach { case (l, rows) =>
      val bp = rows.toSeq.map(_._5).sum
      assert(bp >= 10000 - rows.size && bp <= 10000, s"$l shares: $bp")
    }
  }

  test("text_code_switch equals a plain-Scala stoplist recomputation") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expected = docs.map { case (l, t) =>
      val tk = tokens(t)
      val scores = TextAnalysis.StopLists
        .map { case (_, ws) => tk.count(ws.toSet).toLong }.sorted.reverse
      (l, if (scores(1) * 2 >= scores(0) && scores(1) >= 2) 1L else 0L)
    }.groupBy(_._1).map { case (l, v) =>
      val n = v.length.toLong; val sw = v.map(_._2).sum
      (l, n, sw, sw * 10000 / n)
    }.toSet
    val got = TextAnalysis.queries("text_code_switch")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected)
  }

  test("basket_lift equals a plain-Scala market-basket recomputation") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val orders = li.groupBy(_._1).view
      .mapValues(_.map(_._2).sorted.toSeq).toMap
    val nOrders = orders.size.toLong
    val marg = li.map(_._2).groupBy(identity).map { case (p, v) => p -> v.length.toLong }
    val pairs = orders.values.toSeq.flatMap { items =>
      for (a <- items; b <- items if a < b) yield (a, b)
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      .filter(_._2 >= 2)
    val expected = pairs.map { case ((a, b), nab) =>
      (a, b, nab, marg(a), marg(b), nab * nOrders * 10000 / (marg(a) * marg(b)))
    }.toSeq.sortBy(r => (-r._6, r._1, r._2)).take(50)
    // map columns by name (the join reorders pa/pb in the raw output)
    val gotByName = Market.queries("basket_lift")(spark, sf)
      .selectExpr("pa", "pb", "n_ab", "n_a", "n_b", "lift_e4").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(gotByName == expected, s"got $gotByName\nexpected $expected")
  }

  test("ann_knn_calibration is consistent with ann_knn_label_eval: " +
      "bucket totals equal the per-label maj5 totals") {
    val cal = Similarity.queries("ann_knn_calibration")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val lab = Similarity.queries("ann_knn_label_eval")(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(3)))
    assert(cal.map(_._2).sum == lab.map(_._1).sum, "query totals differ")
    assert(cal.map(_._3).sum == lab.map(_._2).sum, "maj5-correct totals differ")
    cal.foreach { case (votes, n, correct, conf, acc) =>
      assert(votes >= 1 && votes <= 5 && conf == votes * 2000)
      assert(acc == correct * 10000 / n)
    }
  }

  test("retrieval_mmr_rerank equals a plain-Scala greedy recomputation " +
      "and always re-ranks (a pick order differing from pure BM25 exists)") {
    val bm = Retrieval.queries("text_bm25_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val candDocs = bm.map(_._3).distinct.toSet
    val tokSets = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .filter(r => candDocs.contains(r.getLong(0)))
      .map(r => r.getLong(0) -> tokens(r.getString(1)).distinct.toSet).toMap
    def sim(a: Long, b: Long): Long = {
      val (sa, sb) = (tokSets(a), tokSets(b))
      val inter = (sa & sb).size.toLong
      if (inter == 0) 0L else inter * 1000000 / (sa.size + sb.size - inter)
    }
    val expected = bm.groupBy(_._1).toSeq.flatMap { case (q, rows) =>
      val cand = rows.sortBy(_._2).map { case (_, rank, doc) =>
        (doc, (11 - rank) * 100000) }
      var selected = Vector(cand.head._1)
      var out = Vector((q, 1L, cand.head._1, cand.head._2, 0L, 7 * cand.head._2 / 10))
      for (k <- 2 to 5) {
        val rem = cand.filterNot(c => selected.contains(c._1))
        val scored = rem.map { case (doc, rel) =>
          val ms = selected.map(s => sim(doc, s)).max
          (doc, rel, ms, (7 * rel - 3 * ms) / 10)
        }
        val pick = scored.sortBy(r => (-r._4, r._1)).head
        selected :+= pick._1
        out :+= ((q, k.toLong, pick._1, pick._2, pick._3, pick._4))
      }
      out
    }.toSet
    val got = Retrieval.queries("retrieval_mmr_rerank")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == expected)
    // diversity actually engaged: some query's pick order differs from
    // the BM25 order, or a positive maxsim was subtracted somewhere
    assert(got.exists(_._5 > 0), "degenerate: no candidate similarity seen")
  }
}
