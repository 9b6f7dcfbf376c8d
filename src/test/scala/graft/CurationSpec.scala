package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Curation

/** Curation-scoring operators: each query is recomputed independently in
  * plain Scala over the collected sf0.001 corpus (separate from both the
  * Spark expressions and the DuckDB oracle SQL, which share their
  * renderings) and the aggregates must agree exactly. */
class CurationSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private val P = 1000000007L
  private val Scramble = 2654435761L

  private def tokens(text: String): Seq[String] =
    text.split(' ').filter(_.nonEmpty).toSeq

  private def charHash(s: String): Long =
    s.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % P)

  private lazy val corpus: Seq[(Long, String, String, String, Long)] =
    spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "text", "lang", "source", "n_chars")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq

  test("text_quality_classifier matches a plain-Scala hashed-linear scorer") {
    val expected = corpus
      .map { case (_, text, lang, _, _) =>
        val wh = tokens(text).map(charHash)
        (lang, wh.foldLeft(0L)((a, h) => a + ((h % 4096) * Scramble % P % 2001 - 1000)), wh.size.toLong)
      }
      .filter(_._3 > 0)
      .map { case (lang, sw, n) => (lang, sw * 1000 / n) }
      .groupBy(_._1)
      .map { case (lang, ms) =>
        val means = ms.map(_._2)
        lang -> (means.size.toLong, means.count(_ >= 0).toLong, means.min, means.max)
      }
    val got = Curation.queries("text_quality_classifier")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(5), r.getLong(6)))
      .toMap
    assert(got == expected, s"got $got\nexpected $expected")
  }

  test("text_lm_surprisal matches a plain-Scala unigram LM") {
    val toks = corpus.flatMap { case (id, text, lang, _, _) =>
      tokens(text).map(t => (id, lang, t))
    }
    val freq = toks.groupBy(t => (t._2, t._3)).view.mapValues(_.size.toLong).toMap
    val langTot = freq.groupBy(_._1._1).map { case (lang, fs) =>
      lang -> (fs.values.sum, fs.size.toLong)
    }
    def log2(q: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(q)
    val perDoc = toks.groupBy(t => (t._1, t._2)).toSeq.map { case ((_, lang), ts) =>
      val (t, v) = langTot(lang)
      val sb = ts.map { case (_, l, tok) => log2((t + v) / (freq((l, tok)) + 1)) }.sum
      (lang, sb * 10000 / ts.size.toLong)
    }
    val expected = perDoc.groupBy { case (lang, bp) => (lang, bp / 10000) }
      .map { case (k, vs) => k -> vs.size.toLong }
    val got = Curation.queries("text_lm_surprisal")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expected, s"got $got\nexpected $expected")
  }

  test("text_dup_span_coverage matches a plain-Scala interval-union census") {
    val K = 8
    val spans = corpus.map { case (id, text, lang, _, _) =>
      val wh = tokens(text).map(charHash)
      val sh = wh.sliding(K).filter(_.size == K)
        .map(_.reduceLeft((a, b) => (a * 31 + b) % P)).toVector
      (id, lang, sh)
    }.filter(_._3.nonEmpty)
    val df = spans.flatMap { case (id, _, sh) => sh.distinct.map(v => (v, id)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    val cov = spans.map { case (id, lang, sh) =>
      val starts = sh.zipWithIndex.collect { case (v, i) if df(v) >= 2 => i }
      var covered = 0L
      var prevEnd = 0L
      starts.foreach { i =>
        covered += math.max((i + K).toLong - math.max(i.toLong, prevEnd), 0L)
        prevEnd = math.max(prevEnd, (i + K).toLong)
      }
      (lang, covered * 10000 / (sh.size.toLong + (K - 1)))
    }
    val expected = cov.groupBy(_._1).map { case (lang, cs) =>
      lang -> (cs.size.toLong, cs.count(_._2 > 0).toLong,
        cs.count(_._2 >= 5000).toLong, cs.map(_._2).max)
    }
    val got = Curation.queries("text_dup_span_coverage")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5)))
      .toMap
    assert(got == expected, s"got $got\nexpected $expected")
  }

  test("text_lm_bigram_surprisal matches a plain-Scala bigram LM") {
    def log2(q: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(q)
    val docBi = corpus.map { case (id, text, lang, _, _) =>
      (id, lang, tokens(text).map(charHash).sliding(2).filter(_.size == 2)
        .map(p => (p(0), p(1))).toSeq)
    }.filter(_._3.nonEmpty)
    val bfreq = docBi.flatMap { case (_, lang, bs) => bs.map(b => (lang, b)) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val pfreq = bfreq.groupBy { case ((lang, (a, _)), _) => (lang, a) }
      .map { case (k, m) => k -> m.values.sum }
    val vocab = corpus.flatMap { case (_, text, lang, _, _) =>
      tokens(text).map(charHash).map(h => (lang, h))
    }.distinct.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val perDoc = docBi.map { case (_, lang, bs) =>
      val sb = bs.map { case (a, b) =>
        log2((pfreq((lang, a)) + vocab(lang)) / (bfreq((lang, (a, b))) + 1))
      }.sum
      (lang, sb * 10000 / bs.size.toLong)
    }
    val expected = perDoc.groupBy { case (lang, bp) => (lang, bp / 10000) }
      .map { case (k, vs) => k -> vs.size.toLong }
    val got = Curation.queries("text_lm_bigram_surprisal")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expected, s"got $got\nexpected $expected")
    graft.operators.CacheScope.releaseAll()
  }

  test("mixture_token_plan matches a plain-Scala budget computation") {
    val weights = Map("de" -> 1250L, "en" -> 5000L, "es" -> 1250L, "fr" -> 1250L, "zh" -> 1250L)
    val avail = corpus.groupBy(_._3).view
      .mapValues(_.map { case (_, text, _, _, _) => tokens(text).size.toLong }.sum).toMap
    val budget = avail.map { case (lang, a) => a * 10000 / weights(lang) }.min
    val expected = avail.map { case (lang, a) =>
      val w = weights(lang)
      val planned = (budget / 10000) * w + (budget % 10000) * w / 10000
      lang -> (a, w, budget, planned, planned * 10000 / a,
        a * 10000 / w == budget)
    }
    val got = Curation.queries("mixture_token_plan")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6))).toMap
    assert(got == expected, s"got $got\nexpected $expected")
  }

  test("source_scorecard matches a plain-Scala per-source census") {
    def contentHash(t: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val hashes = corpus.map { case (_, text, _, _, _) => contentHash(text) }
    val dupCounts = hashes.groupBy(identity).view.mapValues(_.size).toMap
    val expected = corpus.zip(hashes).groupBy(_._1._4).map { case (src, rows) =>
      val n = rows.size.toLong
      val dup = rows.count { case (_, h) => dupCounts(h) >= 2 }.toLong
      src -> (n, rows.map(_._1._3).distinct.size.toLong,
        rows.map(_._1._5).sum, dup * 10000 / n)
    }
    val got = Curation.queries("source_scorecard")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5)))
      .toMap
    assert(got == expected, s"got $got\nexpected $expected")
  }

  test("curation_dsir_weights matches a plain-Scala two-model scorer") {
    val B = 4096L
    val occ = corpus.flatMap { case (id, text, lang, src, _) =>
      tokens(text).map(t => (id, lang, src, charHash(t) % B))
    }
    val fR = occ.groupBy(_._4).view.mapValues(_.size.toLong).toMap
    val tgt = occ.filter(_._2 == "en")
    val fT = tgt.groupBy(_._4).view.mapValues(_.size.toLong).toMap
    val nR = occ.size.toLong
    val nT = tgt.size.toLong
    // linearized log-ratio in ppm, exact BigInt floor division
    def wPpm(b: Long): Long =
      ((BigInt(fT.getOrElse(b, 0L) + 1) * (nR + B) * 1000000) /
        (BigInt(fR(b) + 1) * (nT + B)) - 1000000).toLong
    val perDoc = corpus.map { case (id, text, lang, src, _) =>
      val ws = tokens(text).map(t => wPpm(charHash(t) % B))
      (src, lang, ws.sum, ws.size.toLong)
    }
    val wTot = perDoc.map(_._3).sum
    val nTot = perDoc.map(_._4).sum
    def isKeep(w: Long, n: Long): Boolean = BigInt(w) * nTot >= BigInt(wTot) * n
    val expected = perDoc.groupBy(_._1).map { case (src, rows) =>
      val w = rows.map(_._3)
      val keep = rows.count(r => isKeep(r._3, r._4)).toLong
      src -> (rows.size.toLong, keep, keep * 10000 / rows.size, w.sum, w.min, w.max)
    }
    val got = Curation.queries("curation_dsir_weights")(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    assert(got == expected, s"got $got\nexpected $expected")
    // the weighting must separate: the keep set is a strict, non-empty
    // subset, and the target slice (en — the corpus the target model was
    // trained on) keeps at a strictly higher rate than the rest —
    // otherwise the two models degenerated into one and the operator is
    // a no-op
    val keepAll = expected.values.map(_._2).sum * 10000 / expected.values.map(_._1).sum
    assert(keepAll > 0 && keepAll < 10000, s"degenerate keep rate $keepAll")
    val (enKeep, enN) = (perDoc.filter(_._2 == "en").count(r => isKeep(r._3, r._4)),
      perDoc.count(_._2 == "en"))
    val (otKeep, otN) = (perDoc.filter(_._2 != "en").count(r => isKeep(r._3, r._4)),
      perDoc.count(_._2 != "en"))
    assert(enKeep.toLong * 10000 / enN > otKeep.toLong * 10000 / otN,
      s"target slice not preferred: en $enKeep/$enN vs other $otKeep/$otN")
  }
}
