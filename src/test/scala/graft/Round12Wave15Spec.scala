package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Mining

/** Round-12 wave 15 pins: plain-Scala recomputations on sf0.001. */
class Round12Wave15Spec extends AnyFunSuite {

  private def spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def tokens(t: String) = t.split(' ').filter(_.nonEmpty)

  test("sample_coverage_greedy equals a plain-Scala submodular greedy " +
      "and its gains are non-increasing (submodularity witness)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val pool = docs.sortBy { case (id, _, nc) => (-nc, id) }.take(40)
      .map { case (id, t, _) => id -> tokens(t).distinct.toSet }.toMap
    var covered = Set.empty[String]
    var remaining = pool.keySet
    val expected = (1 to 8).map { k =>
      val (pick, gain) = remaining.toSeq
        .map(id => (id, (pool(id) -- covered).size.toLong))
        .minBy { case (id, g) => (-g, id) }
      covered ++= pool(pick)
      remaining -= pick
      (k.toLong, pick, gain, covered.size.toLong)
    }
    val got = Mining.queries("sample_coverage_greedy")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      .sortBy(_._1)
    assert(got == expected, s"got $got\nexpected $expected")
    // lazy-greedy correctness witness: marginal gains never increase
    val gains = got.map(_._3)
    assert(gains.zip(gains.tail).forall { case (a, b) => b <= a },
      s"gains increased: $gains")
    // coverage is the running sum of gains
    assert(got.map(_._3).sum == got.last._4)
  }

  test("text_coverage_curve equals a plain-Scala prefix-mass recomputation " +
      "and is monotone in k") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expected = docs.groupBy(_._1).flatMap { case (lang, ds) =>
      val freq = ds.flatMap(d => tokens(d._2)).groupBy(identity)
        .map { case (t, v) => t -> v.length.toLong }
      val total = freq.values.sum
      val ranked = freq.toSeq.sortBy { case (t, f) => (-f, t) }
      Seq(1, 2, 4, 8, 16, 32).filter(_ <= ranked.size).map { k =>
        val cum = ranked.take(k).map(_._2).sum
        (lang, k.toLong, cum, cum * 10000 / total)
      }
    }.toSet
    val got = Mining.queries("text_coverage_curve")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected)
    got.groupBy(_._1).foreach { case (_, rows) =>
      val byK = rows.toSeq.sortBy(_._2).map(_._4)
      assert(byK.zip(byK.tail).forall { case (a, b) => b >= a })
    }
  }
}
