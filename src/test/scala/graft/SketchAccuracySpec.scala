package graft

import org.scalatest.funsuite.AnyFunSuite

/** Accuracy guards for the sketch operators (the LshRecallSpec pattern:
  * approximation quality is measured, not assumed). The DuckDB oracle pins
  * that both engines compute the same values; these tests pin that the
  * values are USEFUL — an estimator that drifted into a degenerate regime
  * (e.g. raw HLL under 2.5·m distinct values) would still hash-match. */
class SketchAccuracySpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"
  private def spark = SparkTestSession.spark

  test("HLL distinct-shingle estimate within 20% of exact per language") {
    val rows = SparkEntry.queries("text_hll_distinct")(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val exact = r.getAs[Long]("n_exact").toDouble
      val est = r.getAs[Long]("hll_est_e4") / 10000.0
      assert(exact > 640, // 2.5·m — below this the raw estimator is invalid
        s"${r.getString(0)}: $exact distinct shingles is inside the " +
          "small-range regime; the input domain degenerated")
      val rel = math.abs(est / exact - 1.0)
      assert(rel < 0.20, s"${r.getString(0)}: |$est/$exact - 1| = $rel >= 0.20")
    }
  }

  test("CMS estimates only over-count, and within 2x of exact for the top-20") {
    val rows = SparkEntry.queries("text_cms_heavy_hitters")(spark, sf).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val exact = r.getAs[Long]("n_exact")
      val over = r.getAs[Long]("overcount")
      assert(over >= 0, s"token ${r.getLong(0)}: CMS under-counted by ${-over}")
      // heavy hitters dominate their cells: collisions add only light mass
      assert(over <= exact, s"token ${r.getLong(0)}: overcount $over > exact $exact")
    }
  }

  test("histogram quantile sketch brackets the exact percentile, one-bin error") {
    import org.apache.spark.sql.functions._
    val s = spark
    val sketch = SparkEntry.queries("price_quantile_sketch")(s, sf).collect()
      .map(r => r.getAs[Long]("pct") -> (r.getAs[Long]("lo_e4"), r.getAs[Long]("hi_e4"))).toMap
    assert(sketch.keySet == Set(50L, 90L, 99L))
    // exact percentile by full sort — the expensive truth the sketch replaces
    val vals = s.read.parquet(s"$sf/lineitem.parquet")
      .selectExpr("CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(10000 AS DECIMAL(5,0)) AS BIGINT) AS e4")
      .orderBy(col("e4")).collect().map(_.getLong(0))
    for (pct <- Seq(50L, 90L, 99L)) {
      val exact = vals(((vals.length * pct + 99) / 100 - 1).toInt)
      val (lo, hi) = sketch(pct)
      assert(exact >= lo && exact < hi,
        s"p$pct: exact $exact outside sketch bin [$lo, $hi)")
    }
  }

  test("CMS merge law: grid(A) + grid(B) cell-wise equals grid(A ∪ B)") {
    import org.apache.spark.sql.functions._
    val s = spark
    graft.functions.TextHashFunctions.register(s)
    val docs = s.read.parquet(s"$sf/documents.parquet")
    def hashes(df: org.apache.spark.sql.DataFrame) =
      df.select(explode(expr("word_hashes(text)")).as("h"))
    // two disjoint "executors": even and odd doc_ids
    val a = graft.operators.Sketches.sketchOf(hashes(docs.filter("doc_id % 2 = 0")))
    val b = graft.operators.Sketches.sketchOf(hashes(docs.filter("doc_id % 2 = 1")))
    val merged = a.unionByName(b)
      .groupBy("depth", "cell").agg(sum("n").as("n"))
    val whole = graft.operators.Sketches.sketchOf(hashes(docs))
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty,
      "cell-wise addition of partial grids diverged from the whole-corpus grid")
  }

  test("HLL merge law: register-wise max of halves equals whole-corpus registers") {
    import org.apache.spark.sql.functions._
    val s = spark
    val tok = graft.operators.Sketches.langShingleHashes(s, sf)
    val a = graft.operators.Sketches.hllRegistersOf(tok.filter("h % 2 = 0"))
    val b = graft.operators.Sketches.hllRegistersOf(tok.filter("h % 2 = 1"))
    val merged = a.unionByName(b)
      .groupBy("lang", "j").agg(max("m").as("m"))
    val whole = graft.operators.Sketches.hllRegistersOf(tok)
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty,
      "register-wise max of partial register sets diverged from the whole")
  }

  test("CMS sketch mass is identical across depths (every token lands once per row)") {
    val rows = SparkEntry.queries("text_cms_sketch")(spark, sf).collect()
    assert(rows.length == 4)
    assert(rows.map(_.getAs[Long]("total_count")).distinct.length == 1,
      "per-depth total mass diverged — a token missed a row of the grid")
  }

  test("sampling coin is uniform and the mixture sampler hits its target shares") {
    // the raw short-id char-fold is NOT uniform mod 10000 (measured span
    // [6498, 9669] — it silently zeroed a 30% acceptance rate before the
    // CoinScramble multiply); this pins the fix statistically
    val spark0 = spark
    import graft.functions.CrossHash
    graft.functions.TextHashFunctions.register(spark0)
    val coins = spark0.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .selectExpr(s"${CrossHash.coinSpark("concat('m|', CAST(doc_id AS STRING))")} AS c")
      .collect().map(_.getLong(0))
    assert(coins.min < 1000 && coins.max > 9000, "coin span collapsed")
    val mean = coins.sum.toDouble / coins.length
    assert(mean > 4000 && mean < 6000, s"coin mean $mean far from 5000")

    val m = SparkEntry.queries("sample_mixture")(spark0, "/root/testdata/sf0.01")
      .collect()
    graft.operators.CacheScope.releaseAll()
    val evenTokens = m.filter(_.getAs[Long]("w_bp") == 250L)
      .map(_.getAs[Long]("tokens_kept")).sum.toDouble
    val total = m.map(_.getAs[Long]("tokens_kept")).sum.toDouble
    // 10 even sources at 2.5% each = 25% target; allow sampling noise
    assert(math.abs(evenTokens / total - 0.25) < 0.06,
      s"realized even-source share ${evenTokens / total} far from 0.25")
  }

  test("HLL set algebra: union dominates both sides; intersection tracks exact overlap") {
    val rows = SparkEntry.queries("text_hll_set_algebra")(spark, sf).collect()
    graft.operators.CacheScope.releaseAll()
    assert(rows.length == 10, s"expected C(5,2)=10 language pairs, got ${rows.length}")
    rows.foreach { r =>
      val a = r.getAs[Long]("hll_a_e4"); val b = r.getAs[Long]("hll_b_e4")
      val u = r.getAs[Long]("hll_union_e4")
      // theorem, not heuristic: union registers are register-wise >= each
      // side's, so the raw estimate cannot shrink
      assert(u >= math.max(a, b),
        s"union estimate below a side: $r")
      // inclusion-exclusion error budget: raw-HLL relative error at m=256
      // is ~6.5% per sketch; three sketches compound. Bound the
      // intersection miss by 20% of the UNION estimate (scale-relative).
      val exact = r.getAs[Long]("n_common_exact").toDouble
      val inter = r.getAs[Long]("hll_inter_e4") / 10000.0
      assert(math.abs(inter - exact) <= 0.20 * (u / 10000.0) + 1,
        s"intersection estimate off by more than 20% of union scale: $r")
    }
  }
}
