package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, TextAnalysis, Timeseries}

/** Round-12 wave 12 pins: the v4 funnel against its composed stages and a
  * plain-Scala dispersion recomputation. */
class Round12Wave12Spec extends AnyFunSuite {

  private def spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("corpus_pipeline_v4 equals v3 with the code-switch stage spliced " +
      "in front: per-lang totals reconcile exactly") {
    // v4's stages after `mixed` are v3's verbatim, so for each language:
    //   v4.n_docs == v3.n_docs
    //   v4 rows with mixed docs removed must redistribute v3's buckets:
    //   every doc v4 drops as mixed was counted SOMEWHERE in v3, and all
    //   non-mixed docs land in the same stage in both funnels. We verify
    //   via the strongest cheap identity: total conservation per funnel
    //   and v4.n_dropped_mixed == the text_code_switch census.
    val v3 = Dedup.queries("corpus_pipeline_v3")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    val v4 = Dedup.queries("corpus_pipeline_v4")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    val cs = TextAnalysis.queries("text_code_switch")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(v4.keySet == v3.keySet)
    v4.foreach { case (lang, (n, mixed, q, soft, cont, kept, _)) =>
      assert(n == v3(lang)._1, s"$lang: corpus size differs")
      assert(mixed + q + soft + cont + kept == n,
        s"$lang: v4 funnel does not conserve docs")
      assert(mixed == cs(lang), s"$lang: mixed count != code_switch census")
      val (n3, q3, s3, c3, k3, _) = v3(lang)
      assert(q3 + s3 + c3 + k3 == n3, s"$lang: v3 funnel does not conserve")
      // the monolingual gate only removes docs, never adds survivors
      assert(kept <= k3, s"$lang: v4 kept more than v3")
    }
  }

  test("events_dispersion_index equals a plain-Scala moment recomputation " +
      "over the zero-filled day grid") {
    val days = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_type",
        "unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000 AS day")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val counts = days.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val expected = days.map(_._1).distinct.map { t =>
      val ds = counts.collect { case ((`t`, d), n) => d -> n }
      val (d0, d1) = (ds.keys.min, ds.keys.max)
      val grid = (d0 to d1).map(d => ds.getOrElse(d, 0L))
      val nDays = grid.length.toLong
      val sn = grid.sum
      val snn = grid.map(n => n * n).sum
      val disp =
        if (sn == 0) None
        else Some(((BigInt(nDays) * snn - BigInt(sn) * sn) * 10000 /
          (BigInt(nDays) * sn)).toLong)
      (t, nDays, sn, sn * 10000 / nDays, disp,
        if (disp.exists(_ > 10000)) 1L else 0L)
    }.toSet
    val got = Timeseries.queries("events_dispersion_index")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4)),
        r.getLong(5))).toSet
    assert(got == expected)
  }
}
