package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Retrieval, Similarity, Sketches}

/** Round-12 wave 5: rational BM25, RRF hybrid fusion, SQ8 ADC, and the
  * relational Bloom filter — each recomputed independently in plain Scala
  * (BigInt / IEEE doubles) over the collected sf0.001 tables, the third
  * leg next to the Spark expressions and the DuckDB oracle. */
class Round12Wave5Spec extends AnyFunSuite {

  private def spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private val P61 = BigInt(2305843009213693951L)

  /** The squared-affine Bloom mixing (Sketches.bloomPosArray semantics). */
  private def mix(key: Long, perm: (Long, Long)): BigInt = {
    val t = (BigInt(key) * perm._1 + perm._2) mod P61
    (t * t) mod P61
  }

  private def docTokens: Seq[(Long, Seq[String])] =
    spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(' ').filter(_.nonEmpty).toSeq))
      .toSeq

  // pinned term queries (Retrieval.Bm25Queries literals)
  private val Queries: Seq[(Long, Seq[String])] = Seq(
    1L -> Seq("spark", "table", "join"),
    2L -> Seq("fast", "scan"),
    3L -> Seq("window", "agg", "value"))

  /** BigInt BM25 recomputation: rational idf × fraction-cleared tf
    * saturation, exactly the committed closed form. */
  private def bm25Expected: Seq[(Long, Long, Long, Long)] = {
    val docs = docTokens
    val n = BigInt(docs.size)
    val sumDl = BigInt(docs.map(_._2.size.toLong).sum)
    val e6 = BigInt(1000000)
    Queries.flatMap { case (qid, terms) =>
      val scores = docs.flatMap { case (id, toks) =>
        val dl = BigInt(toks.size)
        val s = terms.map { t =>
          val tf = BigInt(toks.count(_ == t))
          if (tf == 0) BigInt(0)
          else {
            val df = BigInt(docs.count(_._2.contains(t)))
            val idf = ((n * 2 - df * 2 + 1) * e6) / (df * 2 + 1)
            val tfc = (BigInt(22) * tf * sumDl * e6) /
              (BigInt(10) * sumDl * tf + BigInt(3) * sumDl + BigInt(9) * dl * n)
            (idf * tfc) / e6
          }
        }.sum
        // a doc enters the posting-list census iff ANY query term occurs —
        // even a score flooring to 0 keeps the row (engine semantics)
        if (terms.exists(toks.contains)) Some((id, s.toLong)) else None
      }
      scores.sortBy { case (id, s) => (-s, id) }.take(10).zipWithIndex.map {
        case ((id, s), i) => (qid, (i + 1).toLong, id, s)
      }
    }
  }

  test("text_bm25_topk equals a BigInt recomputation of the closed form") {
    val got = Retrieval.queries("text_bm25_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val expected = bm25Expected
    assert(got == expected, s"got $got\nexpected $expected")
    assert(got.size == 30)
  }

  test("retrieval_rrf_fusion equals the fused rank recomputation from its " +
      "two source queries") {
    val bm = Retrieval.queries("text_bm25_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(1))) // (q, doc, rank)
    val cs = Similarity.queries("ann_bruteforce_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(1)))
      .filter(t => Queries.exists(_._1 == t._1))
    val pts = (bm ++ cs).map { case (q, doc, rank) =>
      ((q, doc), 1000000L / (60L + rank))
    }
    val fused = pts.groupBy(_._1).map { case ((q, doc), xs) =>
      (q, doc, xs.map(_._2).sum, xs.size.toLong)
    }.toSeq
    val expected = fused.groupBy(_._1).toSeq.flatMap { case (q, xs) =>
      xs.sortBy(x => (-x._3, x._2)).take(10).zipWithIndex.map {
        case ((_, doc, s, ns), i) => (q, (i + 1).toLong, doc, s, ns)
      }
    }.sortBy(t => (t._1, t._2))
    val got = Retrieval.queries("retrieval_rrf_fusion")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected, s"got $got\nexpected $expected")
    // both channels must actually contribute somewhere
    assert(got.exists(_._5 == 2L), "no doc was returned by both sources")
  }

  test("ann_sq8_adc equals a plain-Scala quantize + ADC recomputation") {
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1)
    val dim = embs.head._2.length
    val mn = (0 until dim).map(i => embs.map(_._2(i)).min).toArray
    val mx = (0 until dim).map(i => embs.map(_._2(i)).max).toArray
    def code(x: Double, i: Int): Long =
      if (mx(i) == mn(i)) 0L
      else math.min(255L, math.max(0L,
        math.floor(((x - mn(i)) * 255.0) / (mx(i) - mn(i))).toLong))
    def term(qx: Double, c: Long, i: Int): Long = {
      val deq = mn(i) + (((c.toDouble + 0.5) * (mx(i) - mn(i))) / 255.0)
      math.floor(((qx - deq) * (qx - deq)) * 1.0e8).toLong
    }
    val expected = embs.filter(_._1 < 5).flatMap { case (q, qv) =>
      val scored = embs.filter(_._1 != q).map { case (v, xv) =>
        (v, (0 until dim).map(i => term(qv(i), code(xv(i), i), i)).sum)
      }
      scored.sortBy { case (v, s) => (s, v) }.take(10).zipWithIndex.map {
        case ((v, s), i) => (q, (i + 1).toLong, v, s)
      }
    }.toSeq
    val got = Similarity.queries("ann_sq8_adc")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected, s"got ${got.take(12)}\nexpected ${expected.take(12)}")
    assert(got.size == 50)
  }

  test("text_bloom_fpr_eval equals a BigInt bit-set recomputation and the " +
      "measured FPR sits near density^k") {
    val keys = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id").collect().map(_.getLong(0)).distinct.sorted
    val perms = graft.functions.CrossHash.MinhashPerms.slice(4, 9)
    val m = keys.length * 8L
    val maxKey = keys.max
    val bits = keys.flatMap(k => perms.map(p => (mix(k, p) % m).toLong)).toSet
    val probes = keys.map(_ + maxKey + 1)
    val fp = probes.count(p => perms.forall(pm => bits((mix(p, pm) % m).toLong)))
    val row = Sketches.queries("text_bloom_fpr_eval")(spark, sf).collect().head
    assert(row.getLong(0) == keys.length.toLong)
    assert(row.getLong(1) == m)
    assert(row.getLong(3) == bits.size.toLong, "n_set_bits")
    assert(row.getLong(6) == fp.toLong, "n_false_pos")
    val fprBp = row.getLong(7); val expBp = row.getLong(8)
    // the squared mixing must land within sampling noise of theory
    // (the affine map measured 5.8× theory before the fix)
    assert(fprBp <= expBp * 4 + 200, s"measured $fprBp bp vs theory $expBp bp")
  }

  test("events_bloom_first_seen equals a sequential per-shard replay") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("user_id", "unix_micros(CAST(ts AS TIMESTAMP)) AS ts_us",
        "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val segBits = Sketches.SegBits
    val byShard = ev.groupBy { case (u, _, _) =>
      (mix(u, Sketches.ShardPerm) % Sketches.FsShards).toLong
    }
    val expected = byShard.toSeq.map { case (shard, evs) =>
      val bits = scala.collection.mutable.Set[Long]()
      var nDup = 0L
      evs.sortBy { case (_, ts, eid) => BigInt(ts) * 16777216 + eid }
        .foreach { case (u, _, _) =>
          val ps = Sketches.FsPerms.map(p => (mix(u, p) % segBits).toLong)
          if (ps.forall(bits.contains)) nDup += 1
          ps.foreach(bits.add)
        }
      (shard, evs.size.toLong, evs.size - nDup, nDup)
    }.sortBy(_._1)
    val got = Sketches.queries("events_bloom_first_seen")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected, s"got $got\nexpected $expected")
    // sf0.001 carries ~15 distinct users — every one must land in its own
    // shard at this sparsity (the squared mixing spreads contiguous ids;
    // the affine map folded them onto half the shard space)
    assert(got.size == byShard.size && got.nonEmpty)
  }
}
