package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Analytics2, Graph, Similarity, TextAnalysis, Timeseries}

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

  test("ann_knn_label_eval equals a brute-force leave-one-out 5-NN vote") {
    // vec_dot / vec_norm2 accumulate left-to-right in Double over Float
    // lanes — this fold is the bit-exact mirror
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong,
        r.getSeq[Float](2).toArray))
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    def n2(a: Array[Float]): Double = dot(a, a)
    val probes = vecs.filter(_._1 < 100)
    val perQuery = probes.map { case (qid, qlabel, qv) =>
      val top5 = vecs.filter(_._1 != qid).map { case (id, l, v) =>
        (math.floor(dot(qv, v) / (math.sqrt(n2(qv)) * math.sqrt(n2(v))) * 1000000).toLong, id, l)
      }.sortBy(t => (-t._1, t._2)).take(5)
      val t1 = if (top5.head._3 == qlabel) 1L else 0L
      val vlabel = top5.groupBy(_._3).view.mapValues(_.size).toSeq
        .sortBy { case (l, nv) => (-nv, l) }.head._1
      (qlabel, t1, if (vlabel == qlabel) 1L else 0L)
    }
    val expected = perQuery.groupBy(_._1).toSeq.map { case (label, qs) =>
      val n = qs.length.toLong
      val t1 = qs.map(_._2).sum; val m5 = qs.map(_._3).sum
      (label, n, t1, m5, t1 * 10000 / n, m5 * 10000 / n)
    }.sortBy(_._1)
    val got = Similarity.queries("ann_knn_label_eval")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected, s"got $got\nexpected $expected")
  }

  test("events_seasonal_decompose equals a plain-Scala dow-model residual census") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_type", "unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000 AS day")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byType = ev.groupBy(_._1)
    val expected = byType.toSeq.flatMap { case (t, xs) =>
      val counts = xs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val grid = (counts.keys.min to counts.keys.max)
        .map(day => (day, counts.getOrElse(day, 0L)))
      val model = grid.groupBy { case (day, _) => (day + 4) % 7 }.view
        .mapValues { ds => ds.map(_._2).sum * 100 / ds.size }.toMap
      grid.map { case (day, n) =>
        val dow = (day + 4) % 7
        (t, day, dow, n, model(dow), n * 100 - model(dow))
      }.sortBy(r => (-math.abs(r._6), r._2)).take(5).zipWithIndex
        .map { case ((t2, day, dow, n, m, res), i) =>
          (t2, i + 1L, day, dow, n, m, res) }
    }.sortBy(r => (r._1, r._2))
    val got = Timeseries.queries("events_seasonal_decompose")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    graft.operators.CacheScope.releaseAll()
    assert(got == expected, s"got $got\nexpected $expected")
  }
}
