package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DataQuality, Dedup, Multimodal, Similarity, Timeseries}

/** Round-12 wave 4: Theil–Sen trend, per-type Benford census,
  * leakage-safe split, matryoshka truncation eval, and the real audio
  * decode — each recomputed independently in plain Scala over the
  * collected sf0.001 tables (the third leg next to the Spark expressions
  * and the DuckDB oracle, which must all agree exactly). */
class Round12Wave4Spec extends AnyFunSuite {

  private def spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private val P = 1000000007L
  private val DayUs = 86400L * 1000000

  private def charHash(s: String): Long =
    s.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % P)

  /** Mathematical floor division (both engines' pinned semantics for the
    * Theil–Sen slope: (a - pmod(a,b)) over exact divisibility). */
  private def floorDiv(a: Long, b: Long): Long = Math.floorDiv(a, b)

  private def eventDays: Seq[(String, Long)] =
    spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_type", "unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000 AS day")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  test("events_theil_sen_trend equals a brute-force pairwise-slope median") {
    val byType = eventDays.groupBy(_._1)
    val expected = byType.toSeq.map { case (t, xs) =>
      val counts = xs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val d0 = counts.keys.min; val d1 = counts.keys.max
      val grid = (d0 to d1).map(d => (d - d0, counts.getOrElse(d, 0L)))
      val slopes = (for {
        (ti, ni) <- grid; (tj, nj) <- grid if tj > ti
      } yield floorDiv((nj - ni) * 1000000L, tj - ti)).sorted
      val slope = slopes((slopes.size + 1) / 2 - 1)
      val ics = grid.map { case (tt, n) => n * 1000000L - slope * tt }.sorted
      val ic = ics((ics.size + 1) / 2 - 1)
      (t, grid.size.toLong, slopes.size.toLong, slope, ic)
    }.sortBy(_._1)
    val got = Timeseries.queries("events_theil_sen_trend")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected, s"got $got\nexpected $expected")
    assert(got.nonEmpty)
  }

  test("events_value_benford equals a plain first-digit census per type") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val digits = ev.map { case (t, v) =>
      (t, math.floor(v * 100).toLong.toString.charAt(0).asDigit.toLong)
    }.filter(d => d._2 >= 1 && d._2 <= 9)
    val expPpm = Map(1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L,
      5 -> 79181L, 6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L)
    val expected = digits.groupBy(_._1).toSeq.flatMap { case (t, xs) =>
      val total = xs.size.toLong
      xs.groupBy(_._2).toSeq.map { case (d, ds) =>
        val n = ds.size.toLong
        val obs = n * 1000000L / total
        val e = expPpm(d.toInt)
        (t, d, n, obs, e, obs - e)
      }
    }.sortBy(x => (x._1, x._2))
    val got = DataQuality.queries("events_value_benford")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected, s"got $got\nexpected $expected")
    assert(got.nonEmpty)
  }

  test("sample_leakage_safe_split equals a recompute from cluster labels AND never splits a cluster") {
    // per-doc cluster labels from the already-pinned dedup_clusters query
    val labels = Dedup.queries("dedup_clusters")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def splitOf(groupKey: Long): String = {
      val b = charHash(groupKey.toString) % 100
      if (b < 90) "train" else if (b < 95) "val" else "test"
    }
    val assigned = docs.map { case (id, nc) =>
      val gk = labels.getOrElse(id, id)
      (splitOf(gk), gk, labels.contains(id), nc)
    }
    // the leakage guarantee itself: every cluster lands in exactly one split
    labels.groupBy(_._2).foreach { case (cid, members) =>
      val splits = members.keys.map(id => splitOf(labels(id))).toSet
      assert(splits.size == 1, s"cluster $cid straddles splits $splits")
    }
    val expected = assigned.groupBy(_._1).toSeq.map { case (sp, xs) =>
      (sp, xs.size.toLong, xs.map(_._2).distinct.size.toLong,
        xs.count(_._3).toLong, xs.map(_._4).sum)
    }.sortBy(_._1)
    val got = Dedup.queries("sample_leakage_safe_split")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected, s"got $got\nexpected $expected")
    assert(got.map(_._2).sum == docs.length.toLong)
  }

  test("embedding_matryoshka_eval equals a brute-force truncated-cosine recall") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def dot(a: Array[Float], b: Array[Float], k: Int): Double = {
      var acc = 0.0; var i = 0
      while (i < k) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    def top10(qid: Long, qv: Array[Float], k: Int): Seq[Long] =
      vecs.filter(_._1 != qid).map { case (id, v) =>
        (math.floor(dot(qv, v, k) / (math.sqrt(dot(qv, qv, k)) * math.sqrt(dot(v, v, k))) * 1000000).toLong, id)
      }.sortBy(t => (-t._1, t._2)).take(10).map(_._2).toSeq
    val probes = vecs.filter(_._1 < 5)
    val expected = Seq(8, 16, 32).flatMap { dims =>
      probes.map { case (qid, qv) =>
        val truth = top10(qid, qv, 64).toSet
        val hits = top10(qid, qv, dims).count(truth)
        (dims.toLong, qid, 10L, hits.toLong, hits * 10000L / 10L)
      }
    }.sortBy(x => (x._1, x._2))
    val got = Similarity.queries("embedding_matryoshka_eval")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected, s"got $got\nexpected $expected")
    // the eval must show monotone-ish degradation headroom: full-width
    // truth recall at 32 dims should be at least that at 8 dims on average
    val mean = got.groupBy(_._1).view.mapValues(xs => xs.map(_._5).sum / xs.size).toMap
    assert(mean(32L) >= mean(8L), s"recall not improving with width: $mean")
  }

  test("media_audio_decode matches the closed-form waveform (codec round-trip is lossless)") {
    val ids = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id").collect().map(_.getLong(0)).toSeq
    val expected = ids.map { id =>
      val (n, sr) = Multimodal.audioSpec(id)
      val s = (0 until n).map(i => Multimodal.sampleAt(id, i))
      val zc = s.sliding(2).count(p => p.head.toLong * p(1) < 0)
      (id, sr.toLong, n.toLong,
        s.map(x => math.abs(x).toLong).max,
        s.map(x => math.abs(x).toLong).sum,
        s.map(x => x.toLong * x).sum, zc.toLong)
    }.sortBy(_._1)
    val got = Multimodal.queries("media_audio_decode")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("media_audio_windows matches the closed-form framed energy profile") {
    val ids = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id").collect().map(_.getLong(0)).toSeq
    val expected = ids.flatMap { id =>
      val (n, _) = Multimodal.audioSpec(id)
      val len = n / 4
      (0 until 4).map { w =>
        val s = (w * len until (w + 1) * len).map(i => Multimodal.sampleAt(id, i))
        (id, w.toLong, len.toLong, s.map(x => x.toLong * x).sum,
          s.map(x => math.abs(x).toLong).max)
      }
    }.sortBy(x => (x._1, x._2))
    val got = Multimodal.queries("media_audio_windows")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
  }
}
