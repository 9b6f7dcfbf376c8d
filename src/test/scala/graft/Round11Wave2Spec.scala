package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Curation, DataQuality, Dedup, Graph, Similarity, TextAnalysis, Timeseries}

/** Round-11 second wave: each operator recomputed independently in plain
  * Scala over the collected sf0.001 tables (the third leg next to the Spark
  * expressions and the DuckDB oracle, which must all agree exactly). */
class Round11Wave2Spec extends AnyFunSuite {

  private def spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private val DayUs = 86400L * 1000000

  private lazy val corpusDocs: Seq[(Long, String, String)] =
    spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

  private lazy val events: Seq[(Long, String, Long)] =
    spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("user_id", "event_type",
        s"unix_micros(CAST(ts AS TIMESTAMP)) div ${DayUs}L AS day")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq

  test("graph_bipartite_similarity matches a plain-Scala projection") {
    val ut = events.map(e => (e._1, e._2)).distinct
    val deg = ut.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val pairs = ut.groupBy(_._1).values.toSeq
      .flatMap { ts =>
        val sorted = ts.map(_._2).distinct.sorted
        for (i <- sorted.indices; j <- i + 1 until sorted.size)
          yield (sorted(i), sorted(j))
      }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = pairs.map { case ((a, b), nBoth) =>
      val (da, db) = (deg(a), deg(b))
      val cos = math.floor(nBoth.toDouble * 1000000.0 /
        math.sqrt((BigInt(da) * BigInt(db)).toDouble)).toLong
      (a, b) -> (da, db, nBoth, cos)
    }
    val got = Graph.queries("graph_bipartite_similarity")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    graft.operators.CacheScope.releaseAll()
    assert(got == expected, s"got $got\nexpected $expected")
  }

  test("events_forecast_backtest matches a plain-Scala Holt fold") {
    val expected = events.groupBy(_._2).flatMap { case (tpe, es) =>
      val counts = es.groupBy(_._3).view.mapValues(_.size.toLong).toMap
      val (d0, d1) = (counts.keys.min, counts.keys.max)
      val grid = (d0 to d1).map(d => counts.getOrElse(d, 0L))
      if (grid.size < 9) Nil
      else {
        val train = grid.dropRight(7)
        val test = grid.takeRight(7)
        var (l, t) = (train.head, 0L)
        for (x <- train.tail) {
          // Scala `/` truncates toward zero — the same semantics as Spark
          // `div` and DuckDB `//` on the signed trend recursion
          val l2 = (x + 3 * (l + t)) / 4
          val t2 = ((l2 - l) + 7 * t) / 8
          l = l2; t = t2
        }
        (1 to 7).map { h =>
          val fc = l + h * t
          (tpe, h.toLong) -> (fc, test(h - 1), math.abs(fc - test(h - 1)))
        }
      }
    }
    val got = Timeseries.queries("events_forecast_backtest")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    graft.operators.CacheScope.releaseAll()
    assert(got == expected.toMap, s"got $got\nexpected $expected")
  }

  test("dq_chi2_independence matches a plain-Scala contingency recompute") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val grid = docs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rTot = docs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val cTot = docs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val n = docs.size.toLong
    val expected = grid.map { case ((lang, src), cnt) =>
      val oPpm = cnt * 1000000L / n
      val ePpm = (BigInt(rTot(lang)) * cTot(src) * 1000000 / (BigInt(n) * n)).toLong
      val d = oPpm - ePpm
      (lang, src) -> (cnt, oPpm, ePpm, d, d * d / math.max(ePpm, 1L))
    }
    val got = DataQuality.queries("dq_chi2_independence")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(got == expected, s"got $got\nexpected $expected")
  }

  test("text_langid_confusion is the exact aggregate of text_langid") {
    val langid = TextAnalysis.queries("text_langid")(spark, sf)
      .selectExpr("labeled_lang", "pred_lang").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val cells = langid.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rowTot = langid.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val expected = cells.map { case ((lab, pred), nd) =>
      (lab, pred) -> (nd, nd * 10000 / rowTot(lab))
    }
    val got = TextAnalysis.queries("text_langid_confusion")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got == expected, s"got $got\nexpected $expected")
    assert(cells.values.sum ==
      spark.read.parquet(s"$sf/documents.parquet").count())
  }

  test("dedup_provenance is consistent with dedup_clusters and the pair evidence") {
    val clusters = Dedup.queries("dedup_clusters")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val prov = Dedup.queries("dedup_provenance")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    graft.operators.CacheScope.releaseAll()
    val byCluster = clusters.groupBy(_._2).toSeq
    // exactly the non-keepers, each pointing at its cluster's min doc
    val expected = byCluster.flatMap { case (cid, members) =>
      val keeper = members.map(_._1).min
      members.filter(_._1 != keeper).map(m => (m._1, keeper, cid, members.size.toLong))
    }.toSet
    assert(prov.map(p => (p._1, p._2, p._3, p._4)).toSet == expected)
    // evidence bound: every dropped doc's best pair clears the verify bar
    assert(prov.forall(_._5 >= 7000L), "best_jaccard_bp below the 0.7 verify bar")
  }

  test("sample_epoch_plan matches a plain-Scala budget planner") {
    val langTokens = corpusDocs.groupBy(_._2).view
      .mapValues(_.map(d => d._3.split(' ').count(_.nonEmpty).toLong).sum).toMap
    val w = Map("de" -> 1250L, "en" -> 5000L, "es" -> 1250L, "fr" -> 1250L, "zh" -> 1250L)
    val corpus = langTokens.values.sum
    val expected = langTokens.map { case (lang, avail) =>
      val target = 2L * ((corpus / 10000) * w(lang) + ((corpus % 10000) * w(lang)) / 10000)
      val e4 =
        if (target >= 4 * avail) 40000L
        else (target / avail) * 10000 + (BigInt(target % avail) * 10000 / avail).toLong
      val achieved = (avail / 10000) * e4 + ((avail % 10000) * e4) / 10000
      lang -> (avail, w(lang), target, e4, achieved,
        math.max(target - achieved, 0L), e4 == 40000L)
    }
    val got = Curation.queries("sample_epoch_plan")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getBoolean(7))).toMap
    assert(got == expected, s"got $got\nexpected $expected")
  }

  test("ann_range_search is sound (no pair below the bar, none fabricated)") {
    val tau = 200000L
    val ranged = Similarity.queries("ann_range_search")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    graft.operators.CacheScope.releaseAll()
    assert(ranged.forall(_._3 >= tau), "emitted pair below the similarity bar")
    // exact truth over the query set (tiny: 5 × n) — every emitted pair
    // must carry the exact cosine, and the result must be a SUBSET of the
    // exact threshold set (probing can miss a cell, never invent a pair)
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cosPpm(a: Array[Float], b: Array[Float]): Long = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 1000000).toLong
    }
    for ((q, nb, got) <- ranged) {
      val exact = cosPpm(vecs(q), vecs(nb))
      assert(got == exact, s"pair ($q,$nb): emitted $got, exact $exact")
    }
  }
}
