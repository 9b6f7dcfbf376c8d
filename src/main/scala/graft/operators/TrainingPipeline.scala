package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.CrossHash._

/** Training-data pipeline operators beyond the dedup/quality wave: the
  * dataset-engineering steps between a cleaned corpus and a training run.
  *
  *  - `pack_sequences`: contiguous token-budget packing — the "sequence
  *    packing" step that turns documents into fixed-size context windows.
  *  - `decontaminate`: n-gram overlap against a benchmark set (eval
  *    contamination scan) reusing the dedup shingle machinery.
  *  - `decontaminate_minhash`: fuzzy decontamination — MinHash-band
  *    candidates, exact benchmark-shingle containment verify.
  *  - `sample_split`: deterministic hash-based train/val/test assignment
  *    (split decisions must be reproducible across engines and runs — no
  *    rand()).
  *  - `shard_stats`: hash-sharding for distributed training + balance
  *    report.
  *
  * Scale notes: packing is one window cumsum per language partition
  * (single shuffle on lang); decontamination joins the exploded corpus
  * index against a benchmark shingle set (broadcast when small, shuffle
  * otherwise); split/shard are pure map-side hash projections + one
  * aggregation.
  */
object TrainingPipeline {

  /** Token budget per packed context window. */
  val PackBudget = 2048L
  /** Docs per packing segment: the window cumsum runs per (lang, segment),
    * so no reducer ever sees more than one segment — partitioning by lang
    * alone would put an entire language (terabytes) on one task. Packing
    * restarts at segment boundaries by design (embarrassingly parallel;
    * at most one under-filled bin per segment). */
  val PackSegmentDocs = 4096L
  /** Minimum shared distinct shingles to flag contamination. */
  val ContaminationMinOverlap = 3L
  /** Fuzzy decontamination: minimum benchmark-shingle containment (bp). */
  val FuzzyContainmentMinBp = 5000L
  /** Fuzzy decontamination's benchmark split (doc_id % mod == 0). Wider
    * than the exact scan's 1/97 so the declared result is non-vacuous at
    * verification scale — the testdata's near-dup pairs are ~5% of docs,
    * and a 1% bench sample misses all of them at sf0.01. The asymmetric
    * broadcast design only needs bench ≪ corpus, which 1/11 still is. */
  val FuzzyBenchMod = 11L
  /** Training shard count. */
  val NShards = 32L

  private def docs(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.TextHashFunctions.register(spark)
    spark.read.parquet(s"$dir/documents.parquet")
  }

  /** doc_id, lang, n_tokens (whitespace tokens, BIGINT on both engines). */
  private def tokenized(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).selectExpr("doc_id", "lang",
      s"CAST(size(${tokensSpark("text")}) AS BIGINT) AS n_tokens")

  /** Shingle relation — the same logical plan as Dedup's persisted one, so
    * the cache manager reuses its materialization when both run in one
    * session. */
  private def shingled(spark: SparkSession, dir: String): DataFrame = {
    val par = spark.sparkContext.defaultParallelism
    docs(spark, dir).repartition(par)
      .selectExpr("doc_id", "lang",
        s"array_distinct(${shingleHashesSpark(wordHashesSpark("text"))}) AS sh")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Contiguous sequence packing: docs in doc_id order fill fixed
    // token-budget bins; bin id = exclusive-prefix-sum div budget. The
    // cumsum window runs per (lang, segment) — bounded partitions, so the
    // plan parallelizes at any corpus size (per-lang windows would put a
    // whole language on one reducer).
    "pack_sequences" -> ((s, d) => {
      val w = Window.partitionBy(col("lang"), col("segment")).orderBy(asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tokenized(s, d)
        .selectExpr("lang", "doc_id", "n_tokens",
          s"doc_id div ${PackSegmentDocs}L AS segment")
        .withColumn("cum", sum(col("n_tokens")).over(w))
        .selectExpr("lang", "segment", "doc_id", "n_tokens",
          s"(cum - n_tokens) div ${PackBudget}L AS bin")
        .groupBy(col("lang"), col("segment"), col("bin"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).cast("bigint").as("bin_tokens"))
        .selectExpr("lang", "segment", "bin", "n_docs", "bin_tokens",
          s"(bin_tokens * 10000) div ${PackBudget}L AS fill_bp")
        .orderBy(asc("lang"), asc("segment"), asc("bin"))
    }),

    // Eval-set contamination scan: corpus docs sharing >= K distinct
    // shingles with the benchmark set (doc_id % 97 == 0 stands in for the
    // benchmark). The benchmark shingle set is small -> broadcast side of
    // an equi-join on (lang, shingle); overlap counted by shuffle.
    "decontaminate" -> ((s, d) => {
      val sh = CacheScope.persist(shingled(s, d))
      val bench = sh.filter(col("doc_id") % 97 === 0)
        .selectExpr("lang", "explode(sh) AS shv").distinct()
      val corpus = sh.filter(col("doc_id") % 97 =!= 0)
        .selectExpr("doc_id", "lang", "explode(sh) AS shv")
      corpus.join(broadcast(bench), Seq("lang", "shv"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_overlap")) // shv distinct per doc already
        .filter(col("n_overlap") >= ContaminationMinOverlap)
        .orderBy(asc("doc_id"))
    }),

    // Fuzzy decontamination (the frontier-model-report discipline, e.g.
    // GPT-3 appendix C / Llama 2 A.6): a training doc is flagged when it
    // CONTAINS most of an eval doc's shingle set — near-duplicate and
    // paraphrase-adjacent leakage that the exact-overlap scan's fixed
    // MIN-COUNT rule underweights for short eval docs. Candidates come
    // from the SAME MinHash band index the dedup family uses, asymmetric:
    // the benchmark side is a small fraction of the corpus, so its band index and
    // shingle sets ride broadcast joins and candidate generation is one
    // map-side hash probe per corpus band row — the corpus is never
    // shuffled by value, never self-joined. Exact set containment
    // |C ∩ B| / |B| (basis points) verifies each candidate.
    "decontaminate_minhash" -> ((s, d) => {
      val sig = CacheScope.persist(shingled(s, d)
        .filter(expr("size(sh) > 0"))
        .selectExpr("doc_id", "sh", s"${minhashSigSpark("sh")} AS sig"))
      def bandsOf(df: DataFrame): DataFrame =
        df.selectExpr("doc_id",
          s"""explode(transform(sequence(0, ${Bands - 1}),
              b -> struct(b AS band, ${bandKeySpark("sig", "b")} AS bkey))) AS e""")
          .selectExpr("doc_id", "e.band AS band", "e.bkey AS bkey")
      val bench = sig.filter(col("doc_id") % FuzzyBenchMod === 0)
      val corpus = sig.filter(col("doc_id") % FuzzyBenchMod =!= 0)
      val cand = bandsOf(corpus).as("c")
        .join(broadcast(bandsOf(bench)).as("b"),
          col("c.band") === col("b.band") && col("c.bkey") === col("b.bkey"))
        .select(col("c.doc_id").as("cd"), col("b.doc_id").as("bd")).distinct()
      cand
        .join(corpus.select(col("doc_id"), col("sh")).as("l"), col("cd") === col("l.doc_id"))
        .join(broadcast(bench.select(col("doc_id"), col("sh"))).as("r"), col("bd") === col("r.doc_id"))
        .selectExpr("cd AS doc_id", "bd AS bench_id",
          "CAST(size(array_intersect(l.sh, r.sh)) AS BIGINT) AS n_common",
          "CAST(size(r.sh) AS BIGINT) AS n_bench",
          "(CAST(size(array_intersect(l.sh, r.sh)) AS BIGINT) * 10000) div size(r.sh) AS containment_bp")
        .filter(col("containment_bp") >= FuzzyContainmentMinBp)
        .orderBy(asc("doc_id"), asc("bench_id"))
    }),

    // Per-benchmark-item leakage report — the view an eval owner reads:
    // for every benchmark doc, how many training docs leak it (fuzzy
    // containment ≥ threshold), the worst containment, and whether the
    // eval item is compromised at all. LEFT join from the bench split so
    // clean eval items appear with zero counts — absence of evidence is
    // part of the declared answer. Same asymmetric band-probe machinery
    // as decontaminate_minhash; the report aggregation runs on the
    // flagged-pair relation (candidate-sized).
    "decontaminate_report" -> ((s, d) => {
      val flagged = queries("decontaminate_minhash")(s, d)
      val bench = docs(s, d)
        .filter(col("doc_id") % FuzzyBenchMod === 0)
        .selectExpr("doc_id AS bench_id",
          s"CAST(size(array_distinct(${shingleHashesSpark(wordHashesSpark("text"))})) AS BIGINT) AS n_shingles")
      bench.join(
          flagged.groupBy(col("bench_id"))
            .agg(count(lit(1)).as("n_leaks"),
              max(col("containment_bp")).as("max_containment_bp")),
          Seq("bench_id"), "left")
        .na.fill(0L, Seq("n_leaks", "max_containment_bp"))
        .selectExpr("bench_id", "n_shingles", "n_leaks", "max_containment_bp",
          "CAST(CASE WHEN n_leaks > 0 THEN 1 ELSE 0 END AS BIGINT) AS is_compromised")
        .orderBy(asc("bench_id"))
    }),

    // Deterministic train/val/test split: bucket = content-independent
    // doc_id hash mod 100 -> 90/5/5. Pure projection + one aggregation;
    // identical assignment on any engine (no rand()).
    "sample_split" -> ((s, d) =>
      tokenized(s, d)
        .selectExpr("n_tokens",
          s"${charHashSpark("CAST(doc_id AS STRING)")} % 100 AS bucket")
        .selectExpr("n_tokens",
          "CASE WHEN bucket < 90 THEN 'train' WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split")
        .groupBy(col("split"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).cast("bigint").as("total_tokens"))
        .orderBy(asc("split"))),

    // Deterministic k-fold assignment census (cross-validation splits for
    // the curation classifiers): fold = content-independent doc_id hash
    // mod 5, reported as the fold × language balance sheet with each
    // fold's share of its language's docs in basis points — the "are the
    // folds actually balanced per language" check run before trusting a
    // CV estimate. Same no-rand() discipline as sample_split; one
    // map-side projection + a grid-sized aggregate + a grid window.
    "sample_kfold" -> ((s, d) =>
      tokenized(s, d)
        .selectExpr("lang", "n_tokens",
          s"${charHashSpark("CAST(doc_id AS STRING)")} % 5 AS fold")
        .groupBy(col("fold"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).cast("bigint").as("total_tokens"))
        .withColumn("lang_docs",
          sum(col("n_docs")).over(Window.partitionBy(col("lang"))))
        .selectExpr("fold", "lang", "n_docs", "total_tokens",
          "(n_docs * 10000) div lang_docs AS fold_share_bp")
        .orderBy(asc("fold"), asc("lang"))),

    // Stratified downsampling with per-language keep rates (the standard
    // "rebalance the language mix" curation step): deterministic keep
    // decision from the same content-independent doc_id hash as
    // sample_split — no rand(), identical selection on any engine or
    // cluster size. Pure map-side filter + projection; returns the kept
    // rows so downstream stages chain off it directly.
    "sample_stratified" -> ((s, d) =>
      tokenized(s, d)
        .selectExpr("doc_id", "lang", "n_tokens",
          s"${charHashSpark("CAST(doc_id AS STRING)")} % 100 AS bucket")
        .filter(
          "bucket < CASE lang WHEN 'en' THEN 25 WHEN 'zh' THEN 50 ELSE 100 END")
        .selectExpr("doc_id", "lang", "n_tokens", "bucket")
        .orderBy(asc("doc_id"))),

    // Quality-aware dedup: within each exact-duplicate group keep the doc
    // with the best lexical-diversity score (ties: lowest doc_id) — the
    // "keep best, not first" variant of keep-one-per-group. One groupBy-
    // free window per content hash; per-lang kept/dropped yield report.
    "dedup_keep_best" -> ((s, d) => {
      val scored = docs(s, d).selectExpr(
        "doc_id", "lang", "md5(text) AS h",
        s"""(CAST(size(array_distinct(${tokensSpark("text")})) AS BIGINT) * 10000)
            div greatest(size(${tokensSpark("text")}), 1) AS ttr_bp""")
      val ranked = scored.withColumn("rk",
        row_number().over(Window.partitionBy(col("h"))
          .orderBy(desc("ttr_bp"), asc("doc_id"))))
      ranked.groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("rk") === 1, 1L).otherwise(0L)).cast("bigint").as("n_kept"),
          sum(when(col("rk") =!= 1, 1L).otherwise(0L)).cast("bigint").as("n_dropped"))
        .orderBy(asc("lang"))
    }),

    // Per-dimension int8-quantization calibration over the embedding
    // corpus: min/max (exact — no float summation) and the resulting scale
    // per dimension. One explode + one aggregation; the standard
    // calibration pass before quantized ANN serving.
    "embedding_quant_stats" -> ((s, d) => {
      graft.functions.VectorFunctions.register(s)
      s.read.parquet(s"$d/embeddings.parquet")
        .select(posexplode(col("embedding")))
        .selectExpr("CAST(pos + 1 AS BIGINT) AS dim", "CAST(col AS DOUBLE) AS x")
        .groupBy(col("dim"))
        .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
        .selectExpr("dim",
          "CAST(floor(mn * 1000000) AS BIGINT) AS min_ppm",
          "CAST(floor(mx * 1000000) AS BIGINT) AS max_ppm",
          "CAST(floor((mx - mn) / 255 * 1000000000) AS BIGINT) AS scale_ppb")
        .orderBy(asc("dim"))
    }),

    // Quality-weighted deterministic sampling: accept each doc with
    // probability proportional to its lexical-diversity score — a salted
    // uniform hash coin (`w|` prefix decorrelates it from
    // sample_stratified's bucket; the CoinScramble multiply is what makes
    // a short-id coin actually uniform — see CrossHash.CoinScramble) under
    // the ttr_bp threshold. rand()-free, so the sample is reproducible
    // across engines, runs, and cluster sizes; pure map-side projection +
    // filter at any scale.
    "sample_weighted" -> ((s, d) =>
      docs(s, d).selectExpr(
        "doc_id", "lang",
        s"""(CAST(size(array_distinct(${tokensSpark("text")})) AS BIGINT) * 10000)
            div greatest(size(${tokensSpark("text")}), 1) AS ttr_bp""",
        s"${coinSpark("concat('w|', CAST(doc_id AS STRING))")} AS coin")
        .filter("coin < ttr_bp")
        .orderBy(asc("doc_id"))),

    // Mixture sampling: hit target per-source token weights by downsampling
    // over-represented sources — the data-mixing step that sets a training
    // run's source proportions. K = min_s floor(T_s·10⁴ / w_s) is the max
    // achievable total under downsampling-only; each source keeps docs at
    // rate w_s·K / T_s via the salted hash coin (`m|` prefix decorrelates
    // from the other sampling ops). Integer-exact throughout (w·K needs
    // int64 headroom — fine to ~10¹⁴ tokens per source; beyond that,
    // compute K in decimal). Shape: one tiny per-source aggregate, rates
    // broadcast back, then a map-side filter — one shuffle at any scale.
    "sample_mixture" -> ((s, d) => {
      val base = docs(s, d).selectExpr(
          "doc_id", "source",
          s"CAST(size(${tokensSpark("text")}) AS BIGINT) AS n_tokens",
          "CASE WHEN CAST(substring(source, 4) AS INT) % 2 = 1 THEN 750L ELSE 250L END AS w_bp",
          s"${coinSpark("concat('m|', CAST(doc_id AS STRING))")} AS coin")
        .transform(CacheScope.persist)
      val rates = base.groupBy(col("source"), col("w_bp"))
        .agg(sum(col("n_tokens")).as("t_s"))
        .withColumn("k", min(expr("(t_s * 10000) div w_bp")).over(Window.partitionBy()))
        .selectExpr("source", "t_s", "least((w_bp * k) div t_s, 10000) AS rate_bp")
      base.join(broadcast(rates), Seq("source"))
        .filter(col("coin") < col("rate_bp"))
        .groupBy(col("source"), col("w_bp"), col("t_s"), col("rate_bp"))
        .agg(count(lit(1)).as("n_kept"), sum(col("n_tokens")).as("tokens_kept"))
        .orderBy(asc("source"))
    }),

    // Hash-sharding for distributed training + balance report: per-shard
    // doc/token volume. The shard key is the same deterministic hash, so
    // re-running assignment is stable across engines and cluster sizes.
    "shard_stats" -> ((s, d) =>
      tokenized(s, d)
        .selectExpr("n_tokens",
          s"${charHashSpark("CAST(doc_id AS STRING)")} % $NShards AS shard")
        .groupBy(col("shard"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).cast("bigint").as("shard_tokens"))
        .orderBy(asc("shard"))),

    // Deterministic k-per-group reservoir: the 5 docs per language with
    // the smallest scrambled hash coins — a reproducible uniform sample
    // (any engine, any run, any cluster size) for eyeballing/eval sets.
    // The scramble decorrelates the coin from sample_split's bucket; the
    // per-lang rank is WindowGroupLimit-pruned, so no reducer ever sorts
    // more than its top-k.
    "sample_reservoir" -> ((s, d) =>
      tokenized(s, d)
        .selectExpr("doc_id", "lang", "n_tokens",
          s"${coinSpark("CAST(doc_id AS STRING)")} AS coin")
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("lang")).orderBy(asc("coin"), asc("doc_id"))))
        .filter(col("rank") <= 5)
        .selectExpr("lang", "CAST(rank AS BIGINT) AS rank", "doc_id", "coin", "n_tokens")
        .orderBy(asc("lang"), asc("rank"))),

    // Shingle novelty: per doc, the share of its distinct word-3-gram
    // shingles that occur in NO other document — the "how much of this is
    // new text" curation signal (high novelty = unique content; near-zero
    // = boilerplate/copies). Inverted-index shape: one explode, one
    // map-side-combined df census on the shingle hash, one join back on
    // the hash (vocabulary-sized build side), one per-doc rollup — the
    // same linear skeleton as the Jaccard census, no pairwise anything.
    "text_shingle_novelty" -> ((s, d) => {
      val ex = shingled(s, d).select(col("doc_id"), explode(col("sh")).as("h"))
      val df = ex.groupBy(col("h")).agg(count(lit(1)).as("df"))
      ex.join(df, Seq("h"))
        .groupBy(col("doc_id"))
        .agg(
          count(lit(1)).as("n_shingles"),
          sum(when(col("df") === 1L, 1L).otherwise(0L)).as("n_unique"))
        .selectExpr("doc_id", "n_shingles", "n_unique",
          "(n_unique * 10000) div n_shingles AS novelty_bp")
        .orderBy(asc("doc_id"))
    }),

    // Temperature sampling (α = 0.5): re-balance the source mixture toward
    // p_s ∝ t_s^α — the standard multilingual/multi-source rebalancing
    // trick (big sources are downsampled at rate √(t_min/t_s), the
    // smallest keeps everything; no upsampling, so it composes with the
    // single-epoch pipeline). sqrt is IEEE-exact and the rate formula's
    // evaluation order is pinned, so the basis-point rates — and therefore
    // every hash-coin keep decision — are bit-identical across engines.
    // Shape: one tiny per-source aggregate, rates broadcast back, map-side
    // filter, one rollup — identical scaling to sample_mixture.
    "sample_temperature" -> ((s, d) => {
      val base = docs(s, d).selectExpr(
          "doc_id", "source",
          s"CAST(size(${tokensSpark("text")}) AS BIGINT) AS n_tokens",
          s"${coinSpark("concat('t|', CAST(doc_id AS STRING))")} AS coin")
        .transform(CacheScope.persist)
      val rates = base.groupBy(col("source"))
        .agg(sum(col("n_tokens")).as("t_s"))
        .withColumn("t_min", min(col("t_s")).over(Window.partitionBy()))
        .selectExpr("source", "t_s",
          """least(10000L, CAST(floor(sqrt(CAST(t_min AS DOUBLE)) /
             sqrt(CAST(t_s AS DOUBLE)) * 10000.0) AS BIGINT)) AS rate_bp""")
      base.join(broadcast(rates), Seq("source"))
        .filter(col("coin") < col("rate_bp"))
        .groupBy(col("source"), col("t_s"), col("rate_bp"))
        .agg(count(lit(1)).as("n_kept"), sum(col("n_tokens")).as("tokens_kept"))
        .orderBy(asc("source"))
    })
  )

  def oracles: Map[String, String] = {
    val toks = tokensDuck("text")
    val sh = s"list_distinct(${shingleHashesDuck(wordHashesDuck(toks))})"
    val docHash = charHashDuck("CAST(doc_id AS VARCHAR)")
    // shared by decontaminate_minhash and decontaminate_report (the report
    // embeds this as a derived table so the two can never drift)
    val deconMinhashSql =
      s"WITH shingled AS (SELECT doc_id, $sh AS sh FROM documents), " +
        s"sigs AS (SELECT doc_id, sh, ${minhashSigDuck("sh")} AS sig FROM shingled WHERE len(sh) > 0), " +
        s"bands AS (SELECT doc_id, r.range AS band, ${bandKeyDuck("sig", "r.range")} AS bkey " +
        s"FROM sigs CROSS JOIN range(0, $Bands) r), " +
        "cand AS (SELECT DISTINCT c.doc_id AS cd, b.doc_id AS bd FROM bands c " +
        "JOIN bands b ON c.band = b.band AND c.bkey = b.bkey " +
        s"AND c.doc_id % $FuzzyBenchMod <> 0 AND b.doc_id % $FuzzyBenchMod = 0) " +
        "SELECT cd AS doc_id, bd AS bench_id, " +
        "len(list_intersect(l.sh, r.sh)) AS n_common, len(r.sh) AS n_bench, " +
        "(len(list_intersect(l.sh, r.sh)) * 10000) // len(r.sh) AS containment_bp " +
        "FROM cand JOIN sigs l ON cd = l.doc_id JOIN sigs r ON bd = r.doc_id " +
        s"WHERE (len(list_intersect(l.sh, r.sh)) * 10000) // len(r.sh) >= $FuzzyContainmentMinBp " +
        "ORDER BY doc_id, bench_id"
    Map(
      "pack_sequences" ->
        (s"WITH t AS (SELECT doc_id, lang, CAST(len($toks) AS BIGINT) AS n_tokens, " +
          s"doc_id // $PackSegmentDocs AS segment FROM documents), " +
          "c AS (SELECT lang, segment, doc_id, n_tokens, " +
          "sum(n_tokens) OVER (PARTITION BY lang, segment ORDER BY doc_id " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM t), " +
          s"b AS (SELECT lang, segment, doc_id, n_tokens, CAST((cum - n_tokens) // $PackBudget AS BIGINT) AS bin FROM c), " +
          "g AS (SELECT lang, segment, bin, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS bin_tokens " +
          "FROM b GROUP BY lang, segment, bin) " +
          s"SELECT lang, segment, bin, n_docs, bin_tokens, (bin_tokens * 10000) // $PackBudget AS fill_bp " +
          "FROM g ORDER BY lang, segment, bin"),
      "decontaminate" ->
        (s"WITH sh AS (SELECT doc_id, lang, $sh AS sh FROM documents), " +
          "bench AS (SELECT DISTINCT lang, unnest(sh) AS shv FROM sh WHERE doc_id % 97 = 0), " +
          "corpus AS (SELECT doc_id, lang, unnest(sh) AS shv FROM sh WHERE doc_id % 97 <> 0) " +
          "SELECT c.doc_id AS doc_id, count(*) AS n_overlap " +
          "FROM corpus c JOIN bench b ON c.lang = b.lang AND c.shv = b.shv " +
          s"GROUP BY c.doc_id HAVING count(*) >= $ContaminationMinOverlap ORDER BY doc_id"),
      "decontaminate_minhash" -> deconMinhashSql,
      "decontaminate_report" ->
        (s"WITH fl AS (SELECT bench_id, containment_bp FROM ($deconMinhashSql) _f), " +
          s"bench AS (SELECT doc_id AS bench_id, CAST(len($sh) AS BIGINT) AS n_shingles " +
          s"FROM documents WHERE doc_id % $FuzzyBenchMod = 0), " +
          "ag AS (SELECT bench_id, count(*) AS n_leaks, " +
          "CAST(max(containment_bp) AS BIGINT) AS max_containment_bp FROM fl GROUP BY bench_id) " +
          "SELECT b.bench_id AS bench_id, b.n_shingles, " +
          "CAST(COALESCE(ag.n_leaks, 0) AS BIGINT) AS n_leaks, " +
          "CAST(COALESCE(ag.max_containment_bp, 0) AS BIGINT) AS max_containment_bp, " +
          "CAST(CASE WHEN COALESCE(ag.n_leaks, 0) > 0 THEN 1 ELSE 0 END AS BIGINT) AS is_compromised " +
          "FROM bench b LEFT JOIN ag ON b.bench_id = ag.bench_id ORDER BY b.bench_id"),
      "sample_split" ->
        (s"WITH t AS (SELECT CAST(len($toks) AS BIGINT) AS n_tokens, " +
          s"$docHash % 100 AS bucket FROM documents), " +
          "s AS (SELECT n_tokens, CASE WHEN bucket < 90 THEN 'train' WHEN bucket < 95 THEN 'val' " +
          "ELSE 'test' END AS split FROM t) " +
          "SELECT split, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens " +
          "FROM s GROUP BY split ORDER BY split"),
      "sample_kfold" ->
        (s"WITH t AS (SELECT lang, CAST(len($toks) AS BIGINT) AS n_tokens, " +
          s"$docHash % 5 AS fold FROM documents), " +
          "g AS (SELECT fold, lang, count(*) AS n_docs, " +
          "CAST(sum(n_tokens) AS BIGINT) AS total_tokens FROM t GROUP BY fold, lang) " +
          "SELECT fold, lang, n_docs, total_tokens, " +
          "(n_docs * 10000) // CAST(sum(n_docs) OVER (PARTITION BY lang) AS BIGINT) AS fold_share_bp " +
          "FROM g ORDER BY fold, lang"),
      "sample_stratified" ->
        (s"WITH t AS (SELECT doc_id, lang, CAST(len($toks) AS BIGINT) AS n_tokens, " +
          s"$docHash % 100 AS bucket FROM documents) " +
          "SELECT doc_id, lang, n_tokens, bucket FROM t " +
          "WHERE bucket < CASE lang WHEN 'en' THEN 25 WHEN 'zh' THEN 50 ELSE 100 END " +
          "ORDER BY doc_id"),
      "dedup_keep_best" ->
        (s"WITH scored AS (SELECT doc_id, lang, md5(text) AS h, " +
          s"(len(list_distinct($toks)) * 10000) // greatest(len($toks), 1) AS ttr_bp " +
          "FROM documents), " +
          "ranked AS (SELECT lang, row_number() OVER (PARTITION BY h " +
          "ORDER BY ttr_bp DESC, doc_id) AS rk FROM scored) " +
          "SELECT lang, count(*) AS n_docs, " +
          "CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept, " +
          "CAST(sum(CASE WHEN rk <> 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped " +
          "FROM ranked GROUP BY lang ORDER BY lang"),
      "embedding_quant_stats" ->
        ("WITH x AS (SELECT r.range AS dim, list_extract(embedding, r.range)::DOUBLE AS x " +
          "FROM embeddings CROSS JOIN range(1, 65) r), " +
          "g AS (SELECT dim, min(x) AS mn, max(x) AS mx FROM x GROUP BY dim) " +
          "SELECT dim, CAST(floor(mn * 1000000) AS BIGINT) AS min_ppm, " +
          "CAST(floor(mx * 1000000) AS BIGINT) AS max_ppm, " +
          "CAST(floor((mx - mn) / 255 * 1000000000) AS BIGINT) AS scale_ppb " +
          "FROM g ORDER BY dim"),
      "sample_mixture" ->
        (s"WITH base AS (SELECT doc_id, source, CAST(len($toks) AS BIGINT) AS n_tokens, " +
          "CAST(CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 1 THEN 750 ELSE 250 END AS BIGINT) AS w_bp, " +
          s"${coinDuck("'m|' || CAST(doc_id AS VARCHAR)")} AS coin FROM documents), " +
          "tot AS (SELECT source, w_bp, CAST(sum(n_tokens) AS BIGINT) AS t_s " +
          "FROM base GROUP BY source, w_bp), " +
          "kk AS (SELECT min((t_s * 10000) // w_bp) AS k FROM tot), " +
          "rates AS (SELECT source, t_s, least((w_bp * kk.k) // t_s, 10000) AS rate_bp " +
          "FROM tot, kk) " +
          "SELECT b.source, b.w_bp, r.t_s, r.rate_bp, count(*) AS n_kept, " +
          "CAST(sum(b.n_tokens) AS BIGINT) AS tokens_kept " +
          "FROM base b JOIN rates r ON b.source = r.source WHERE b.coin < r.rate_bp " +
          "GROUP BY b.source, b.w_bp, r.t_s, r.rate_bp ORDER BY b.source"),
      "shard_stats" ->
        (s"WITH t AS (SELECT CAST(len($toks) AS BIGINT) AS n_tokens, " +
          s"$docHash % $NShards AS shard FROM documents) " +
          "SELECT shard, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS shard_tokens " +
          "FROM t GROUP BY shard ORDER BY shard"),
      "sample_weighted" ->
        (s"WITH t AS (SELECT doc_id, lang, " +
          s"(len(list_distinct($toks)) * 10000) // greatest(len($toks), 1) AS ttr_bp, " +
          s"${coinDuck("'w|' || CAST(doc_id AS VARCHAR)")} AS coin " +
          "FROM documents) " +
          "SELECT doc_id, lang, ttr_bp, coin FROM t WHERE coin < ttr_bp ORDER BY doc_id"),
      "sample_reservoir" ->
        (s"WITH t AS (SELECT doc_id, lang, CAST(len($toks) AS BIGINT) AS n_tokens, " +
          s"${coinDuck("CAST(doc_id AS VARCHAR)")} AS coin FROM documents), " +
          "r AS (SELECT *, row_number() OVER " +
          "(PARTITION BY lang ORDER BY coin, doc_id) AS rank FROM t) " +
          "SELECT lang, rank, doc_id, coin, n_tokens " +
          "FROM r WHERE rank <= 5 ORDER BY lang, rank"),
      "text_shingle_novelty" ->
        (s"WITH ex AS (SELECT doc_id, unnest($sh) AS h FROM documents), " +
          "df AS (SELECT h, count(*) AS df FROM ex GROUP BY h) " +
          "SELECT ex.doc_id, count(*) AS n_shingles, " +
          "CAST(sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique, " +
          "CAST((sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) * 10000) // count(*) AS BIGINT) AS novelty_bp " +
          "FROM ex JOIN df ON ex.h = df.h GROUP BY ex.doc_id ORDER BY ex.doc_id"),
      "sample_temperature" ->
        (s"WITH base AS (SELECT doc_id, source, CAST(len($toks) AS BIGINT) AS n_tokens, " +
          s"${coinDuck("'t|' || CAST(doc_id AS VARCHAR)")} AS coin FROM documents), " +
          "tot AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS t_s FROM base GROUP BY source), " +
          "mn AS (SELECT min(t_s) AS t_min FROM tot), " +
          "rates AS (SELECT source, t_s, least(CAST(10000 AS BIGINT), " +
          "CAST(floor(sqrt(CAST(mn.t_min AS DOUBLE)) / sqrt(CAST(t_s AS DOUBLE)) * 10000.0) AS BIGINT)) AS rate_bp " +
          "FROM tot, mn) " +
          "SELECT b.source, r.t_s, r.rate_bp, count(*) AS n_kept, " +
          "CAST(sum(b.n_tokens) AS BIGINT) AS tokens_kept " +
          "FROM base b JOIN rates r ON b.source = r.source WHERE b.coin < r.rate_bp " +
          "GROUP BY b.source, r.t_s, r.rate_bp ORDER BY b.source")
    )
  }
}
