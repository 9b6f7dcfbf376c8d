package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Graph, TextAnalysis}

/** Round-12 wave 13 pins: plain-Scala recomputations on sf0.001. */
class Round12Wave13Spec extends AnyFunSuite {

  private def spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("graph_rich_club equals a plain-Scala recomputation from the " +
      "co-purchase edge definition") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val edges = li.groupBy(_._1).values.toSeq
      .flatMap { items =>
        val ps = items.map(_._2).sorted.toSeq
        for (a <- ps; b <- ps if a < b) yield (a, b)
      }
      // NOT `.collect { case (e, v) if … => e }`: collect with a
      // tuple-valued function on a Map REBUILDS a Map and collapses by
      // first endpoint (the wave-6 under-count, 2324 → 87)
      .groupBy(identity).filter(_._2.size >= 2).keySet.toSeq
    val deg = edges.flatMap { case (u, v) => Seq(u, v) }
      .groupBy(identity).map { case (n, v) => n -> v.size.toLong }
    val expected = Seq(2L, 4L, 8L, 16L).flatMap { k =>
      val nodes = deg.filter(_._2 >= k).keySet
      if (nodes.isEmpty) None
      else {
        val nK = nodes.size.toLong
        val eK = edges.count { case (u, v) => nodes(u) && nodes(v) }.toLong
        val phi = if (nK < 2) None else Some(eK * 2 * 10000 / (nK * (nK - 1)))
        Some((k, nK, eK, phi))
      }
    }.toSet
    val got = Graph.queries("graph_rich_club")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
    assert(got == expected, s"got $got\nexpected $expected")
    // rich-club density is monotone non-decreasing in k on this corpus
    // only if the hubs interconnect — do not pin monotonicity, but pin
    // that the k=2 row exists and every density is a valid bp
    assert(got.exists(_._1 == 2L))
    got.foreach { case (_, _, _, phi) =>
      phi.foreach(p => assert(p >= 0 && p <= 10000))
    }
  }

  test("source_vocab_drift equals a plain-Scala half-split recomputation") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("source", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    def tokens(t: String) = t.split(' ').filter(_.nonEmpty)
    val expected = docs.groupBy(_._1).map { case (src, ds) =>
      val (d0, d1) = (ds.map(_._2).min, ds.map(_._2).max)
      def half(id: Long): Long = (id - d0) * 2 / (d1 - d0 + 1)
      val toks = ds.flatMap { case (_, id, t) => tokens(t).map(tok => (half(id), tok)) }
      val census = toks.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
      val top32 = census.groupBy(_._1._2)
        .map { case (tok, m) => tok -> m.values.sum }
        .toSeq.sortBy { case (tok, f) => (-f, tok) }.take(32).map(_._1)
      val t1 = toks.count(_._1 == 0L).toLong
      val t2 = toks.count(_._1 == 1L).toLong
      val drift = top32.map { tok =>
        val c1 = census.getOrElse((0L, tok), 0L)
        val c2 = census.getOrElse((1L, tok), 0L)
        math.abs(c1 * 10000 / t1 - c2 * 10000 / t2)
      }.sum
      (src, ds.length.toLong, t1, t2, drift)
    }.toSet
    val got = TextAnalysis.queries("source_vocab_drift")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected, s"got $got\nexpected $expected")
    got.foreach { case (_, _, _, _, d) => assert(d >= 0 && d <= 20000) }
  }
}
