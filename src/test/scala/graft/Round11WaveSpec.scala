package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Curation, Dedup, Sessions, Similarity}

/** Round-11 continuation wave: each operator recomputed independently in
  * plain Scala over the collected sf0.001 tables (the third leg next to the
  * Spark expressions and the DuckDB oracle, which must all agree exactly). */
class Round11WaveSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private val P = 1000000007L
  private val Scramble = 2654435761L
  private val DayUs = 86400L * 1000000
  private val GapUs = 1800L * 1000000

  private def tokens(text: String): Seq[String] =
    text.split(' ').filter(_.nonEmpty).toSeq

  private def charHash(s: String): Long =
    s.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % P)

  private def log2(q: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(q)

  private lazy val corpus: Seq[(Long, String, String)] =
    spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

  test("source_lm_divergence matches a plain-Scala two-model scorer") {
    val srcTok = corpus.flatMap { case (_, text, src) =>
      tokens(text).map(t => (src, charHash(t)))
    }
    val srcFreq = srcTok.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val corpFreq = srcFreq.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val t = corpFreq.values.sum
    val v = corpFreq.size.toLong
    val bySrc = srcFreq.groupBy(_._1._1)
    val expected = bySrc.map { case (src, fs) =>
      val ts = fs.values.sum
      val vs = fs.size.toLong
      val sbSelf = fs.map { case ((_, _), f) => f * log2((ts + vs) / (f + 1)) }.sum
      val sbCorp = fs.map { case ((_, h), f) => f * log2((t + v) / (corpFreq(h) + 1)) }.sum
      src -> (ts, vs, sbSelf * 10000 / ts, sbCorp * 10000 / ts,
        (sbCorp - sbSelf) * 10000 / ts)
    }
    val got = Curation.queries("source_lm_divergence")(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got == expected, s"got $got\nexpected $expected")
  }

  test("sample_curriculum matches a plain-Scala curriculum planner") {
    val scored = corpus.flatMap { case (_, text, _) =>
      val wh = tokens(text).map(charHash)
      if (wh.isEmpty) None
      else {
        val sw = wh.foldLeft(0L)((a, h) => a + ((h % 4096) * Scramble % P % 2001 - 1000))
        val meanMb = sw * 1000 / wh.size
        Some((math.min(math.max((meanMb + 1000) / 200, 0L), 9L), wh.size.toLong))
      }
    }
    val census = scored.groupBy(_._1).view
      .mapValues(xs => (xs.size.toLong, xs.map(_._2).sum)).toMap
    val total = census.values.map(_._2).sum
    var cum = 0L
    val expected = census.toSeq.sortBy(-_._1).map { case (bin, (nDocs, toks)) =>
      cum += toks
      val phase = if (cum * 3 <= total) 1L else if (cum * 3 <= total * 2) 2L else 3L
      (bin, nDocs, toks, cum, cum * 10000 / total, phase)
    }
    val got = Curation.queries("sample_curriculum")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected, s"got $got\nexpected $expected")
  }

  test("events_peak_concurrency matches a plain-Scala single-level sweep") {
    // the two-level (hour carry + within-hour) decomposition must equal a
    // flat per-day sweep — ordering by (ts, delta) is identical because ts
    // determines the hour monotonically
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val evN = graft.operators.EventFinders.normalizeTs(ev)
      .selectExpr("user_id", "event_id", "ts div 1000 AS ts_us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val spans = evN.groupBy(_._1).values.flatMap { rows =>
      val sorted = rows.toSeq.sortBy(r => (r._3, r._2)).map(_._3)
      val sessions = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      for (ts <- sorted) {
        if (sessions.nonEmpty && ts - sessions.last._2 <= GapUs)
          sessions(sessions.size - 1) = (sessions.last._1, ts)
        else sessions += ((ts, ts))
      }
      sessions.map { case (a, b) => (a, b + 1) }
    }.toSeq
    val segs = spans.flatMap { case (start, end) =>
      (start / DayUs to (end - 1) / DayUs).map { day =>
        (day, math.max(start, day * DayUs), math.min(end, (day + 1) * DayUs))
      }
    }
    val expected = segs.groupBy(_._1).view.mapValues { ss =>
      val eps = ss.flatMap(s => Seq((s._2, 1L), (s._3, -1L))).sortBy(identity)
      var run = 0L; var peak = Long.MinValue
      for ((_, d) <- eps) { run += d; peak = math.max(peak, run) }
      (ss.size.toLong, peak)
    }.toMap
    val got = Sessions.queries("events_peak_concurrency")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected, s"got $got\nexpected $expected")
  }

  test("dedup_minhash_recall_eval matches a plain-Scala eval harness") {
    val shingled = corpus.map { case (id, text, _) =>
      val wh = tokens(text).map(charHash)
      val sh = (0 to wh.size - 3).map(i =>
        ((wh(i) * 31 + wh(i + 1)) % P * 31 + wh(i + 2)) % P)
      id -> sh.distinct
    }.filter(_._2.nonEmpty)
    val nAll = shingled.size.toLong
    val rate = math.min(10000L, 500L * 10000 / nAll)
    val sample = shingled.filter { case (id, _) =>
      (id % P) * Scramble % P % 10000 < rate
    }
    val pairs = for {
      (Seq((ida, sa), (idb, sb))) <- sample.sortBy(_._1).combinations(2).toSeq
    } yield {
      val nc = sa.toSet.intersect(sb.toSet).size.toLong
      (ida, idb, nc, sa.size + sb.size - nc)
    }
    val truth = pairs.collect {
      case (a, b, nc, nu) if nu > 0 && nc * 10000 / nu >= 7000 => (a, b)
    }.toSet
    val perms = (0 until 16).map { j =>
      val a = ((j * 2654435761L + 1234567L) % (P - 1)) + 1
      val b = (j * 40503L * 65537L + 9176L) % P
      (a, b)
    }
    val sigs = sample.map { case (id, sh) =>
      id -> perms.map { case (a, b) => sh.map(x => (a * x + b) % P).min }
    }
    val buckets = sigs.flatMap { case (id, sig) =>
      (0 until 4).map { band =>
        val key = (1 to 4).map(r => sig(4 * band + r - 1)).reduce((x, y) => x * 31 + y)
        ((band, key), id)
      }
    }
    val cand = buckets.groupBy(_._1).values.flatMap { ids =>
      ids.map(_._2).sorted.combinations(2).map(s => (s(0), s(1)))
    }.toSet
    val nHit = cand.intersect(truth).size.toLong
    val expected = (sample.size.toLong, truth.size.toLong, cand.size.toLong, nHit,
      if (truth.isEmpty) null else (nHit * 1000000 / truth.size): Any,
      if (cand.isEmpty) null else (nHit * 1000000 / cand.size): Any)
    val r = Dedup.queries("dedup_minhash_recall_eval")(spark, sf).collect().head
    val got = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.get(4), r.get(5))
    assert(got == expected, s"got $got\nexpected $expected")
  }

  test("embedding_outlier_scores matches a plain-Scala outlier ranker") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong,
        r.getSeq[Float](2).map(x => math.floor(x.toDouble * 10000).toLong)))
    val byLabel = vecs.groupBy(_._2).toSeq
    val expected = byLabel.flatMap { case (label, vs) =>
      val dim = vs.head._3.size
      val cent = (0 until dim).map(i => vs.map(_._3(i)).sum / vs.size)
      val dists = vs.map { case (id, _, q) =>
        id -> (0 until dim).map(i => (q(i) - cent(i)) * (q(i) - cent(i))).sum
      }
      val mean = math.max(dists.map(_._2).sum / dists.size, 1L)
      dists.map { case (id, d2) => (id, d2, d2 * 10000 / mean) }
        .sortBy { case (id, _, s) => (-s, id) }
        .take(5).zipWithIndex
        .map { case ((id, d2, s), k) => (label, k + 1L, id, d2, s) }
    }.toSet
    val got = Similarity.queries("embedding_outlier_scores")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == expected, s"got $got\nexpected $expected")
  }
}
