package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.functions.CrossHash

/** corpus_pipeline_v5: the plain-Scala funnel recomputation (the
  * PipelineWaveSpec discipline — stage composition, IQR fences, coins and
  * strong-source set all re-derived outside Spark from the component
  * operators' outputs) plus the v4 reconciliation identities. */
class Round14PipelineSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def polyHash(s: String): Long =
    s.codePoints().toArray.foldLeft(0L)((a, cp) => (a * 31 + cp) % CrossHash.P)

  private def coin(key: String, mod: Long): Boolean =
    polyHash(key) * CrossHash.CoinScramble % CrossHash.P % mod == 0

  test("corpus_pipeline_v5 matches a plain-Scala funnel built from its " +
      "component operators and the round-13 eval signals") {
    val s = spark
    import s.implicits._
    val clusterSize = Dedup.queries("dedup_clusters")(spark, sf)
      .select("doc_id", "cluster_size").as[(Long, Long)].collect().toMap
    val flagged = TrainingPipeline.queries("decontaminate_minhash")(spark, sf)
      .select("doc_id").as[Long].collect().toSet
    val strongSources = Retrieval.queries("retrieval_rrf_fusion")(spark, sf)
      .filter("rank <= 5").select("doc_id").as[Long].collect().toSet
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang", "source", "text")
      .as[(Long, String, String, String)].collect().toSeq
    val srcOf = docs.map(d => d._1 -> d._3).toMap
    val strong = strongSources.map(srcOf)

    def toks(text: String): Array[String] = text.split(" ", -1).filter(_.nonEmpty)

    // the dq_iqr fences, recomputed from scratch over the global census
    val lengths = docs.map(d => toks(d._4).length.toLong)
    val census = lengths.groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
      .toSeq.sortBy(_._1)
    val tot = lengths.size.toLong
    val cums = census.scanLeft((0L, 0L)) { case ((_, c), (v, n)) => (v, c + n) }.tail
    val q1 = cums.collectFirst { case (v, c) if c * 4 >= tot => v }.get
    val q3 = cums.collectFirst { case (v, c) if c * 4 >= tot * 3 => v }.get

    val m = TrainingPipeline.FuzzyBenchMod
    val expected = docs.groupBy(_._2).toSeq.sortBy(_._1).map { case (lang, ds) =>
      val staged = ds.map { case (id, _, source, text) =>
        val ts = toks(text)
        val nTokens = ts.length.toLong
        // code-switch rule: second-best stoplist score doubles past best
        val scores = TextAnalysis.StopLists.map { case (_, ws) =>
          ts.count(ws.contains).toLong }.sorted
        val mixed = scores(3) * 2 >= scores(4) && scores(3) >= 2
        val ttr = ts.distinct.length.toLong * 10000 / math.max(ts.length, 1)
        val infence = 2 * nTokens >= 2 * q1 - 3 * (q3 - q1) &&
          2 * nTokens <= 2 * q3 + 3 * (q3 - q1)
        val csize = clusterSize.getOrElse(id, 1L)
        val s1 = !mixed
        val s2 = s1 && ttr >= 5000
        val s3 = s2 && (infence || coin(s"o:$id", 4))
        val s4 = s3 && (strong.contains(source) || coin(s"w:$id", 2))
        val s5 = s4 && coin(id.toString, csize)
        val s6 = s5 && id % m != 0 && !flagged.contains(id)
        (nTokens, s1, s2, s3, s4, s5, s6)
      }
      (lang, staged.size.toLong,
        staged.count(!_._2).toLong,
        staged.count(r => r._2 && !r._3).toLong,
        staged.count(r => r._3 && !r._4).toLong,
        staged.count(r => r._4 && !r._5).toLong,
        staged.count(r => r._5 && !r._6).toLong,
        staged.count(r => r._6 && !r._7).toLong,
        staged.count(_._7).toLong,
        staged.filter(_._7).map(_._1).sum)
    }
    val got = Dedup.queries("corpus_pipeline_v5")(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    CacheScope.releaseAll()
    assert(got == expected)
  }

  test("v5 reconciles with v4: same corpus and leading stages, the new " +
      "evidence stages only remove, and every funnel conserves its docs") {
    val s = spark
    import s.implicits._
    val v4 = Dedup.queries("corpus_pipeline_v4")(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val v5 = Dedup.queries("corpus_pipeline_v5")(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    CacheScope.releaseAll()
    assert(v5.keySet == v4.keySet)
    v5.foreach { case (lang,
        (_, n, mixed, q, outlier, weak, soft, cont, kept, tokensKept)) =>
      val (_, n4, mixed4, q4, _, _, kept4, tokens4) = v4(lang)
      assert(n == n4, s"$lang: corpus size differs")
      // stages BEFORE the new evidence gates are v4's verbatim
      assert(mixed == mixed4 && q == q4,
        s"$lang: leading stages diverged from v4")
      assert(mixed + q + outlier + weak + soft + cont + kept == n,
        s"$lang: v5 funnel does not conserve docs")
      // down-weights only remove: v5 survivors are a subset of v4's
      assert(kept <= kept4 && tokensKept <= tokens4,
        s"$lang: v5 kept more than v4")
    }
  }
}
