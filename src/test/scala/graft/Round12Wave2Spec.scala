package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Analytics2, Graph, TextAnalysis}

/** Round-12 wave 2: skyline, Zipf fit, and local clustering coefficient,
  * each recomputed independently in plain Scala (brute force where the
  * operator is clever) — the third leg next to the Spark expressions and
  * the DuckDB oracle. */
class Round12Wave2Spec extends AnyFunSuite {

  private def spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def tokens(s: String): Seq[String] =
    s.split(" ", -1).toSeq.filter(_.nonEmpty)

  test("orders_pareto_front equals O(n²) dominance over every order") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_orderpriority AS priority", "o_orderkey",
        "CAST(datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') AS BIGINT) AS day",
        "CAST(CAST(o_totalprice AS DECIMAL(18,4)) * CAST(10000 AS DECIMAL(5,0)) AS BIGINT) AS price_e4")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // brute force: o dominated iff some same-priority o' has day <= and
    // price >= with at least one strict
    val expected = orders.filter { case (p, _, d, v) =>
      !orders.exists { case (p2, _, d2, v2) =>
        p2 == p && d2 <= d && v2 >= v && (d2 < d || v2 > v)
      }
    }.map(o => (o._1, o._3, o._2, o._4)).sortBy(identity).toSeq
    val got = Analytics2.queries("orders_pareto_front")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected, s"got ${got.size} rows, expected ${expected.size}")
    assert(got.nonEmpty)
  }

  test("text_zipf_fit equals a BigInt least-squares over the sorted census") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    def ilog2(q: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(q)
    val expected = docs.flatMap { case (lang, t) => tokens(t).map((lang, _)) }
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case ((lang, tok), f) => (lang, tok, f) }
      .groupBy(_._1).toSeq.map { case (lang, ts) =>
        val ranked = ts.sortBy(t => (-t._3, t._2)).zipWithIndex
          .map { case ((_, _, f), i) => (ilog2(i + 1L), ilog2(f)) }
        val n = BigInt(ranked.size)
        val sx = ranked.map(r => BigInt(r._1)).sum
        val sy = ranked.map(r => BigInt(r._2)).sum
        val sxx = ranked.map(r => BigInt(r._1) * r._1).sum
        val sxy = ranked.map(r => BigInt(r._1) * r._2).sum
        val num = n * sxy - sx * sy
        val den = n * sxx - sx * sx
        // truncating division toward zero, exactly the engines' div // //
        val slope = if (den == 0) None
          else Some(((num * 1000000) / den).toLong) // BigInt / truncates toward zero
        (lang, ranked.size.toLong, slope)
      }.sortBy(_._1)
    val got = TextAnalysis.queries("text_zipf_fit")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq
    assert(got == expected, s"got $got\nexpected $expected")
    // natural-language sanity: every slope is negative (freq falls with rank)
    got.foreach { case (lang, _, s) => assert(s.exists(_ < 0L), s"lang $lang: $s") }
  }

  test("graph_clustering_coeff equals a brute-force per-node census") {
    // rebuild the co-purchase edges exactly as Graph.edgesBuild declares:
    // per order, sorted distinct parts capped at 64; pair support >= 2
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .selectExpr("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pairs = li.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val items = xs.map(_._2).distinct.sorted.take(64)
      for (i <- items.indices; j <- (i + 1) until items.size)
        yield (items(i), items(j))
    }
    // NB: not Map.collect — a pf yielding tuples would rebuild a Map
    // keyed by u and silently collapse every (u, *) edge to one entry
    val edges = pairs.groupBy(identity).filter(_._2.size >= 2).keySet
    val adj = edges.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def ilog2(q: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(q)
    val expected = adj.toSeq.collect { case (node, nbrs) if nbrs.size >= 2 =>
      val nbrSeq = nbrs.toSeq.sorted
      val tri = (for (i <- nbrSeq.indices; j <- (i + 1) until nbrSeq.size
        if edges.contains((nbrSeq(i), nbrSeq(j)))) yield 1).size.toLong
      val deg = nbrs.size.toLong
      (ilog2(deg), tri, tri * 2 * 10000 / (deg * (deg - 1)))
    }.groupBy(_._1).toSeq.map { case (bucket, ns) =>
      (bucket, ns.size.toLong, ns.map(_._2).sum, ns.map(_._3).sum / ns.size)
    }.sortBy(_._1)
    val got = Graph.queries("graph_clustering_coeff")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected, s"got $got\nexpected $expected")
    assert(got.map(_._2).sum >= 2, "census unexpectedly empty")
  }
}
