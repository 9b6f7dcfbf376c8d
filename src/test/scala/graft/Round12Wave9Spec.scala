package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Mining, Timeseries}

/** Round-12 wave 9 pins: each operator recomputed from first principles in
  * plain Scala (BigInt / double) on sf0.001 — independent of BOTH engines'
  * SQL, on top of the DuckDB oracle the driver runs. */
class Round12Wave9Spec extends AnyFunSuite {

  private def spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private val P = 1000000007L

  private def hash(w: String): Long =
    w.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % P)

  test("text_kn_bigram_prob equals a plain-Scala BigInt Kneser-Ney " +
      "recomputation (top-3 per prefix, exact e6 values)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val bigrams = docs.flatMap { case (lang, text) =>
      val wh = text.split(' ').filter(_.nonEmpty).map(hash)
      if (wh.length < 2) Seq.empty
      else wh.sliding(2).map(p => ((lang, p(0), p(1)), 1L)).toSeq
    }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    val c1 = bigrams.groupBy { case ((l, a, _), _) => (l, a) }
      .map { case (k, m) => k -> m.values.sum }
    val n1fwd = bigrams.groupBy { case ((l, a, _), _) => (l, a) }
      .map { case (k, m) => k -> m.size.toLong }
    val cont2 = bigrams.groupBy { case ((l, _, b), _) => (l, b) }
      .map { case (k, m) => k -> m.size.toLong }
    val ndd = bigrams.groupBy { case ((l, _, _), _) => l }
      .map { case (k, m) => k -> m.size.toLong }
    val expected = bigrams.map { case ((l, a, b), c12) =>
      val nd = BigInt(ndd(l))
      val num = BigInt(1000000) * ((BigInt(4) * c12 - 3) * nd +
        BigInt(3) * n1fwd((l, a)) * cont2((l, b)))
      val den = BigInt(4) * c1((l, a)) * nd
      (l, a, b, c12, (num / den).toLong)
    }.toSeq
    val expTop = expected.groupBy(r => (r._1, r._2)).toSeq.flatMap {
      case (_, rows) =>
        rows.sortBy(r => (-r._5, r._3)).take(3).zipWithIndex
          .map { case (r, i) => (r._1, r._2, r._3, r._4, r._5, i + 1L) }
    }.toSet
    val got = Mining.queries("text_kn_bigram_prob")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == expTop)
    // smoothing sanity: every probability strictly inside (0, 1e6)
    assert(got.forall(r => r._5 > 0 && r._5 < 1000000L))
  }

  test("embedding_bitext_mining equals a plain-Scala ratio-margin " +
      "recomputation (brute-force both directions)") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .toMap
    def cosPpm(a: Array[Float], b: Array[Float]): Long = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < 64) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 1000000).toLong
    }
    val srcIds = vecs.keys.filter(_ % 2 == 0).toSeq.sorted
    val tgtIds = vecs.keys.filter(_ % 2 == 1).toSeq.sorted
    val probes = srcIds.filter(_ < 40)
    def topK(from: Array[Float], pool: Seq[Long]): Seq[(Long, Long)] =
      pool.map(id => id -> cosPpm(from, vecs(id)))
        .sortBy { case (id, c) => (-c, id) }.take(4)
    val fwd = probes.map(p => p -> topK(vecs(p), tgtIds)).toMap
    val expected = probes.flatMap { p =>
      val sumFwd = fwd(p).map(_._2).sum
      fwd(p).take(2).zipWithIndex.map { case ((tid, c), i) =>
        val sumBwd = topK(vecs(tid), srcIds).map(_._2).sum
        val denom = sumFwd + sumBwd
        val margin =
          if (denom <= 0) None
          else Some(c * 8L * 1000000L / denom)
        (p, tid, i + 1L, c, margin,
          if (margin.exists(_ >= 1060000L)) 1L else 0L)
      }
    }.toSet
    val got = Mining.queries("embedding_bitext_mining")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getLong(5))).toSet
    assert(got == expected)
  }

  test("graph_trade_reciprocity: mutual flows symmetric, per-pair and " +
      "global shares recompute from the emitted flows") {
    val rows = Mining.queries("graph_trade_reciprocity")(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (BigInt(r.getString(2)), BigInt(r.getString(3)), r.getLong(4), r.getLong(5))))
    val byPair = rows.toMap
    assert(rows.nonEmpty)
    val globals = rows.map(_._2._4).distinct
    assert(globals.length == 1, "global share must be one scalar")
    var tFlow = BigInt(0); var tMut = BigInt(0)
    rows.foreach { case ((srcN, dstN), (flow, mutual, pairBp, _)) =>
      val back = byPair.get((dstN, srcN)).map(_._1).getOrElse(BigInt(0))
      assert(mutual == flow.min(back), s"mutual != min for $srcN->$dstN")
      assert(pairBp == (mutual * 10000 / flow).toLong)
      tFlow += flow; tMut += mutual
    }
    assert(globals.head == (tMut * 10000 / tFlow).toLong)
  }

  test("events_cross_correlation equals a plain-Scala moment recomputation " +
      "over the zero-filled day grids") {
    val days = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_type",
        "unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000 AS day")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val counts = days.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val series: Map[String, Map[Long, Long]] = days.map(_._1).distinct.map { t =>
      val ds = counts.collect { case ((`t`, d), n) => d -> n }
      val (d0, d1) = (ds.keys.min, ds.keys.max)
      t -> (d0 to d1).map(d => d -> ds.getOrElse(d, 0L)).toMap
    }.toMap
    val types = series.keys.toSeq.sorted
    val expected = (for {
      a <- types; b <- types if a != b; lag <- Seq(0L, 1L, 7L)
    } yield {
      val sa = series(a); val sb = series(b)
      val pairs = sa.keys.filter(d => sb.contains(d + lag)).toSeq
        .map(d => (sa(d), sb(d + lag)))
      val n = pairs.length.toLong
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val vx = n * sxx - sx * sx; val vy = n * syy - sy * sy
      val r = if (vx == 0 || vy == 0) None
        else Some(math.floor((n * sxy - sx * sy).toDouble * 1000000.0 /
          math.sqrt(vx.toDouble * vy.toDouble)).toLong)
      (a, b, lag, n, r)
    }).toSet
    val got = Timeseries.queries("events_cross_correlation")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSet
    assert(got == expected)
    // lag-0 is the symmetric correlation matrix
    got.filter(_._3 == 0L).foreach { case (a, b, _, n, r) =>
      val mirror = got.find(g => g._1 == b && g._2 == a && g._3 == 0L).get
      assert(mirror._4 == n && mirror._5 == r, s"lag-0 asymmetry $a/$b")
    }
  }
}
