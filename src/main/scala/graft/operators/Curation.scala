package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.CrossHash._

/** Corpus-curation scoring operators — the model-shaped filters a
  * large-scale training-data pipeline runs between raw crawl and
  * tokenization (the reference stores the facts; these are the analytics a
  * curation deployment layers on the same corpus):
  *
  *  - `text_quality_classifier`: hashed-bag-of-words linear classifier
  *    (fastText shape — the CCNet / FineWeb-style learned quality filter),
  *    with pinned integer bucket weights so both engines score
  *    bit-identically.
  *  - `text_lm_surprisal`: unigram language-model scoring trained on the
  *    corpus itself (the KenLM-filter shape): per-language token
  *    frequencies → add-one-smoothed integer surprisal bits per token →
  *    per-document mean, reported as a per-language histogram.
  *  - `text_dup_span_coverage`: duplicated-substring census — the fraction
  *    of each document covered by word-3-gram spans that also occur in
  *    another document (the span metric behind suffix-array dedup in Lee
  *    et al., "Deduplicating Training Data Makes Language Models Better").
  *  - `curation_dsir_weights`: DSIR importance weights (Xie et al.,
  *    NeurIPS 2023) — p_target/p_raw under hashed-unigram models as an
  *    exact linearized-log ppm ratio, keep anchored at the corpus mean,
  *    rolled up to a per-source keep-share scorecard.
  *  - `source_scorecard`: per-source (domain analogue) curation scorecard
  *    — volume, language spread, exact-dup share, quality-gate pass share.
  *
  * Every ratio is exact integer arithmetic (basis points / millibits), all
  * hashes are the shared CrossHash kernels, so the DuckDB oracle
  * hash-matches bit-for-bit.
  */
object Curation {

  private def docs(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.TextHashFunctions.register(spark) // codegen'd hash kernels
    spark.read.parquet(s"$dir/documents.parquet")
  }

  /** Classifier geometry: hashed bag-of-words into `Buckets` weight
    * buckets; weight(b) = scrambled(b) mod 2001 − 1000 ∈ [−1000, 1000] —
    * a pinned pseudo-random projection standing in for trained weights
    * (production swaps in a learned table broadcast the same way; the
    * plan shape — one codegen'd map pass, zero joins — is identical). */
  private val Buckets = 4096L

  private def bucketWeightSpark(h: String): String =
    s"((($h % $Buckets) * $CoinScramble) % $P) % 2001 - 1000"
  private def bucketWeightDuck(h: String): String =
    s"((($h % $Buckets) * $CoinScramble) % $P) % 2001 - 1000"

  /** floor(log2(q)) for q >= 1 as the engine-neutral binary digit count —
    * the base-2 twin of the digit-count log10 idiom (both engines render
    * bin() without leading zeros). */
  private def log2Spark(q: String): String = s"(length(bin($q)) - 1)"
  private def log2Duck(q: String): String = s"(length(bin($q)) - 1)"

  /** DSIR target-domain stand-in: the `en` slice plays the curated seed
    * corpus (production swaps in a real seed set the same way the
    * classifier swaps in learned weights). */
  private val DsirTargetLang = "en"

  /** Span window for the duplicated-substring census: 8 tokens. The
    * 3-gram dedup shingles are too short here — on a small vocabulary
    * every 3-gram occurs in many documents by chance and the metric
    * saturates; 8-token windows (vocab⁸ space) only collide on genuinely
    * copied text, which is the suffix-array-dedup semantics this census
    * approximates. (Lee et al. use 50-token windows at web scale — same
    * construction, one constant.) */
  private val SpanK = 8

  /** sample_epoch_plan knobs: train-token budget = EpochBudgetX × corpus,
    * per-language repetition cap = EpochCap epochs. */
  private val EpochBudgetX = 2
  private val EpochCap = 4

  /** Rolling ((…(w_i·31 + w_{i+1}) % P)·31 + …) window hash over SpanK
    * word hashes — the native codegen'd span kernel
    * (TextHashExpressions.SpanHashes): the HOF rendering re-evaluated
    * its input per element (no CSE inside lambdas) and cost 7.5 s of a
    * 9.8 s sf0.1 query. */
  private def spanHashesSpark(wh: String): String =
    s"span_hashes($wh, $SpanK)"

  private def spanHashesDuck(wh: String): String = {
    val comb = (1 until SpanK).foldLeft(s"list_extract($wh, i)") { (acc, k) =>
      s"($acc * 31 + list_extract($wh, i + $k)) % $P"
    }
    s"list_transform(range(1, greatest(len($wh) - ${SpanK - 1}, 0) + 1), i -> $comb)"
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Linear quality classifier over hashed token buckets. Pure map-side:
    // tokenize + hash + weight-sum is ONE whole-stage-codegen projection
    // per document (the weight is a formula of the hash, so there is no
    // weight-table join at all); the per-language census is a map-side
    // combined groupBy over ~|langs| keys. At 100 TB this is the cheapest
    // possible filter shape — exactly why hashed linear classifiers are
    // the curation workhorse.
    "text_quality_classifier" -> ((s, d) =>
      docs(s, d)
        .selectExpr("lang", s"${wordHashesSpark("text")} AS wh")
        .selectExpr("lang",
          s"aggregate(wh, 0L, (a, h) -> a + ${bucketWeightSpark("h")}) AS sw",
          "CAST(size(wh) AS BIGINT) AS n")
        .filter(col("n") > 0)
        .selectExpr("lang", "(sw * 1000) div n AS mean_mb")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("mean_mb") >= 0, 1L).otherwise(0L)).as("kept_docs"),
          min(col("mean_mb")).as("min_mb"),
          max(col("mean_mb")).as("max_mb"),
          sum(col("mean_mb")).as("sum_mb"))
        .selectExpr("lang", "n_docs", "kept_docs",
          "(kept_docs * 10000) div n_docs AS kept_bp",
          "sum_mb div n_docs AS avg_mb", "min_mb", "max_mb")
        .orderBy(asc("lang"))),

    // Unigram LM surprisal, trained on the corpus itself. Two corpus
    // passes: (1) the (lang, token) frequency census — map-side combined,
    // vocabulary-sized output; (2) per-document scoring via a join AT
    // VOCABULARY GRANULARITY: each doc first collapses to its distinct
    // (token, count) multiset rows, so the join input is corpus tokens
    // deduplicated per doc, and repeated tokens cost one row. Surprisal
    // is integer: bits = floor(log2((T_lang + V_lang) div (freq + 1)))
    // (add-one smoothing), document score = token-count-weighted mean in
    // basis points of a bit. Output: per-language histogram over integer
    // mean bits — constant-width regardless of corpus size.
    "text_lm_surprisal" -> ((s, d) => {
      val toks = docs(s, d)
        .selectExpr("doc_id", "lang", s"explode(${tokensSpark("text")}) AS tok")
      val perDoc = toks.groupBy(col("doc_id"), col("lang"), col("tok"))
        .agg(count(lit(1)).as("c"))
        .transform(CacheScope.persist)
      val freq = perDoc.groupBy(col("lang"), col("tok"))
        .agg(sum(col("c")).as("f"))
      val langTot = freq.groupBy(col("lang"))
        .agg(sum(col("f")).as("t"), count(lit(1)).as("v"))
      val scored = perDoc
        .join(freq, Seq("lang", "tok"))
        .join(broadcast(langTot), Seq("lang"))
        .selectExpr("doc_id", "lang", "c",
          s"CAST(${log2Spark("(t + v) div (f + 1)")} AS BIGINT) AS bits")
        .groupBy(col("doc_id"), col("lang"))
        .agg(sum(expr("c * bits")).as("sb"), sum(col("c")).as("n"))
        .selectExpr("lang", "(sb * 10000) div n AS mean_bits_bp")
      scored
        .groupBy(col("lang"), expr("mean_bits_bp div 10000").as("bits_bucket"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("mean_bits_bp")).as("min_bp"),
          max(col("mean_bits_bp")).as("max_bp"))
        .orderBy(asc("lang"), asc("bits_bucket"))
    }),

    // Duplicated-substring coverage. SpanK-token window hashes carry
    // their token position (array index), so a span shared with ANOTHER
    // document marks tokens [i, i+SpanK) as duplicated; the per-doc
    // covered-token count is the union length of those intervals —
    // gaps-and-islands over a window partitioned by doc (per-doc width,
    // never corpus-wide). The cross-doc test is a distinct-doc-count >= 2
    // census on the span hash — one map-side-combined shuffle — joined
    // back at span granularity. At 100 TB both shuffles key on the span
    // hash (uniform by construction); nothing is quadratic.
    "text_dup_span_coverage" -> ((s, d) => {
      val sh = docs(s, d)
        .selectExpr("doc_id", "lang",
          s"${spanHashesSpark(wordHashesSpark("text"))} AS sh")
        .filter(expr("size(sh) > 0"))
        .transform(CacheScope.persist)
      val nTok = sh.selectExpr("doc_id", "lang",
        s"CAST(size(sh) + ${SpanK - 1} AS BIGINT) AS n_tokens")
      val pos = sh.selectExpr("doc_id", "posexplode(sh) AS (i, shv)")
      val dup = pos.groupBy(col("shv"))
        .agg(countDistinct(col("doc_id")).as("df"))
        .filter(col("df") >= 2)
        .select(col("shv"))
      val w = Window.partitionBy(col("doc_id")).orderBy(asc("i"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val covered = pos.join(dup, Seq("shv"), "left_semi")
        .withColumn("prev_end", max(col("i") + SpanK).over(w))
        .selectExpr("doc_id",
          s"greatest(CAST(i + $SpanK AS BIGINT) - greatest(CAST(i AS BIGINT), coalesce(prev_end, 0L)), 0L) AS contrib")
        .groupBy(col("doc_id"))
        .agg(sum(col("contrib")).as("covered"))
      nTok.join(covered, Seq("doc_id"), "left")
        .selectExpr("lang",
          "(coalesce(covered, 0L) * 10000) div n_tokens AS cov_bp")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("cov_bp") > 0, 1L).otherwise(0L)).as("dup_docs"),
          sum(when(col("cov_bp") >= 5000, 1L).otherwise(0L)).as("heavy_docs"),
          sum(col("cov_bp")).as("sum_bp"),
          max(col("cov_bp")).as("max_bp"))
        .selectExpr("lang", "n_docs", "dup_docs", "heavy_docs",
          "sum_bp div n_docs AS avg_bp", "max_bp")
        .orderBy(asc("lang"))
    }),

    // Bigram LM surprisal — the conditional next-token version of
    // text_lm_surprisal: bits = floor(log2((f(prev) + V_lang) div
    // (f(prev, cur) + 1))), add-one smoothing against the per-language
    // vocabulary. Same two-pass scale shape: bigram/unigram censuses are
    // map-side combined to vocabulary² / vocabulary size, documents join
    // at their DISTINCT-bigram granularity (repeated bigrams cost one
    // row), and the output is a constant-width per-language histogram.
    // Word hashes (not strings) key every shuffle.
    "text_lm_bigram_surprisal" -> ((s, d) => {
      val wh = docs(s, d)
        .selectExpr("doc_id", "lang", s"${wordHashesSpark("text")} AS wh")
        .filter(expr("size(wh) >= 2"))
      val bi = wh
        .selectExpr("doc_id", "lang",
          "explode(transform(sequence(2, size(wh)), i -> struct(element_at(wh, i - 1) AS a, element_at(wh, i) AS b))) AS p")
        .selectExpr("doc_id", "lang", "p.a AS a", "p.b AS b")
        .groupBy(col("doc_id"), col("lang"), col("a"), col("b"))
        .agg(count(lit(1)).as("c"))
        .transform(CacheScope.persist)
      val bfreq = bi.groupBy(col("lang"), col("a"), col("b"))
        .agg(sum(col("c")).as("fb"))
      val pfreq = bfreq.groupBy(col("lang"), col("a"))
        .agg(sum(col("fb")).as("fp"))
      val vocab = docs(s, d)
        .selectExpr("lang", s"explode(${wordHashesSpark("text")}) AS h")
        .groupBy(col("lang")).agg(countDistinct(col("h")).as("v"))
      bi.join(bfreq, Seq("lang", "a", "b"))
        .join(pfreq, Seq("lang", "a"))
        .join(broadcast(vocab), Seq("lang"))
        .selectExpr("doc_id", "lang", "c",
          s"CAST(${log2Spark("(fp + v) div (fb + 1)")} AS BIGINT) AS bits")
        .groupBy(col("doc_id"), col("lang"))
        .agg(sum(expr("c * bits")).as("sb"), sum(col("c")).as("n"))
        .selectExpr("lang", "(sb * 10000) div n AS mean_bits_bp")
        .groupBy(col("lang"), expr("mean_bits_bp div 10000").as("bits_bucket"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("mean_bits_bp")).as("min_bp"),
          max(col("mean_bits_bp")).as("max_bp"))
        .orderBy(asc("lang"), asc("bits_bucket"))
    }),

    // Data-mixing token budget planner: given the tokens available per
    // language and target mixture weights (pinned here; production
    // passes a learned/chosen table), find the largest total budget the
    // corpus can serve at those weights — the binding language is the one
    // with the smallest avail/weight ratio — and each language's sampling
    // rate against its pool. This is the mixture table every multi-source
    // training run plans with. All integer (basis points); the budget
    // scalar is a 1-row broadcast join, never a window over the corpus.
    "mixture_token_plan" -> ((s, d) => {
      val weights = "map('de', 1250, 'en', 5000, 'es', 1250, 'fr', 1250, 'zh', 1250)"
      val avail = docs(s, d)
        .selectExpr("lang", s"CAST(size(${tokensSpark("text")}) AS BIGINT) AS n")
        .groupBy(col("lang")).agg(sum(col("n")).as("avail_tokens"))
        // try_element_at + NOT NULL filter: a language outside the weight
        // map is deterministically EXCLUDED from the plan in both engines
        // (plain element_at throws MAP_KEY_DOES_NOT_EXIST under ANSI mode
        // while the oracle's ELSE-less CASE yields a NULL row — divergent)
        .selectExpr("lang", "avail_tokens",
          s"CAST(try_element_at($weights, lang) AS BIGINT) AS weight_bp")
        .filter(col("weight_bp").isNotNull)
      val budget = avail
        .selectExpr("(avail_tokens * 10000) div weight_bp AS cap")
        .agg(min(col("cap")).as("budget_tokens"))
      // planned = budget·weight_bp/10000, split exactly as
      // (b div 1e4)·w + ((b mod 1e4)·w) div 1e4 so the product never
      // exceeds ~budget·1 — a direct b·w would overflow int64 once the
      // budget passes ~1.8e15 tokens (a real 100 TB corpus)
      avail.crossJoin(broadcast(budget))
        .selectExpr("lang", "avail_tokens", "weight_bp", "budget_tokens",
          "(budget_tokens div 10000) * weight_bp + ((budget_tokens % 10000) * weight_bp) div 10000 AS planned_tokens")
        .selectExpr("lang", "avail_tokens", "weight_bp", "budget_tokens",
          "planned_tokens",
          "(planned_tokens * 10000) div avail_tokens AS rate_bp")
        .withColumn("is_binding",
          expr("(avail_tokens * 10000) div weight_bp = budget_tokens"))
        .orderBy(asc("lang"))
    }),

    // Multi-EPOCH budget plan — the question mixture_token_plan's
    // downsampling-only feasibility can't answer: given a training budget
    // of BudgetX× the corpus (the data-constrained regime where sources
    // REPEAT), how many epochs of each language does the target mixture
    // imply, capped at EpochCap epochs (the repetition bar beyond which
    // marginal value collapses — Muennighoff et al., "Scaling
    // Data-Constrained Language Models", NeurIPS 2023), and how many
    // target tokens go unmet where the cap binds? Epochs are e4
    // fixed-point; every product rides the overflow-safe split idiom or
    // DECIMAL(38,0) (a direct target·10⁴ wraps int64 on a 100 TB
    // corpus). Corpus-scale work is the one token census; the plan is a
    // |langs|-row computation.
    "sample_epoch_plan" -> ((s, d) => {
      val weights = "map('de', 1250, 'en', 5000, 'es', 1250, 'fr', 1250, 'zh', 1250)"
      val avail = docs(s, d)
        .selectExpr("lang", s"CAST(size(${tokensSpark("text")}) AS BIGINT) AS n")
        .groupBy(col("lang")).agg(sum(col("n")).as("avail_tokens"))
        // try_element_at + NOT NULL filter — see mixture_token_plan
        .selectExpr("lang", "avail_tokens",
          s"CAST(try_element_at($weights, lang) AS BIGINT) AS weight_bp")
        .filter(col("weight_bp").isNotNull)
      val tot = avail.agg(sum(col("avail_tokens")).as("corpus_tokens"))
      avail.crossJoin(broadcast(tot))
        .selectExpr("lang", "avail_tokens", "weight_bp",
          s"$EpochBudgetX * ((corpus_tokens div 10000) * weight_bp + " +
            "((corpus_tokens % 10000) * weight_bp) div 10000) AS target_tokens")
        .selectExpr("lang", "avail_tokens", "weight_bp", "target_tokens",
          s"""CASE WHEN target_tokens >= $EpochCap * avail_tokens THEN ${EpochCap * 10000}L
             ELSE (target_tokens div avail_tokens) * 10000 +
                  CAST((CAST(target_tokens % avail_tokens AS DECIMAL(38,0)) * 10000)
                       div avail_tokens AS BIGINT)
             END AS epochs_e4""")
        .selectExpr("lang", "avail_tokens", "weight_bp", "target_tokens", "epochs_e4",
          "(avail_tokens div 10000) * epochs_e4 + " +
            "((avail_tokens % 10000) * epochs_e4) div 10000 AS achieved_tokens")
        .selectExpr("lang", "avail_tokens", "weight_bp", "target_tokens",
          "epochs_e4", "achieved_tokens",
          "greatest(target_tokens - achieved_tokens, 0L) AS deficit_tokens",
          s"epochs_e4 = ${EpochCap * 10000}L AS is_capped")
        .orderBy(asc("lang"))
    }),

    // DSIR importance weights (Xie et al., "Data Selection for Language
    // Models via Importance Resampling", NeurIPS 2023): score every
    // document by p_target(x)/p_raw(x) under two hashed-unigram
    // bag-of-words models — the target model trained on the seed domain
    // (here the `en` slice stands in for a curated seed corpus; production
    // swaps the filter), the raw model on the whole corpus. The per-token
    // weight is the LINEARIZED log-ratio in exact integer ppm,
    // (p_t/p_r − 1)·10⁶ = ((f_t+1)(N_r+B)·10⁶) div ((f_r+1)(N_t+B)) − 10⁶
    // (first-order-equal to ln p_t/p_r for the near-1 ratios unigram
    // models produce, and computable exactly — whole-bit floor-log2 would
    // quantize every proportional-vocabulary token to 0). Add-one
    // smoothing deflates p̂_t more than p̂_r on small corpora, so the
    // resample-keep rule self-calibrates at the corpus mean rather than
    // at 0: keep iff w_doc·N_occ ≥ W_total·n_doc (per-token mean above
    // global mean, cross-multiplied in DECIMAL(38,0) — exact at any
    // corpus size; w_doc itself is ≤ ~10⁹ ppm per token so int64 holds to
    // ~10⁹ tokens per doc). Scale shape: ONE corpus-scale explode feeds
    // map-side-combined bucket censuses of fixed width (B = 4096 rows,
    // broadcast everywhere after), the per-doc sum rides a broadcast join
    // + one doc-keyed groupBy (map-side combined — a doc's tokens explode
    // inside its input partition), the mean anchor is a 1-row broadcast,
    // and the scorecard is |sources| rows. No shuffle ever carries more
    // than corpus-token rows once.
    "curation_dsir_weights" -> ((s, d) => {
      val base = docs(s, d)
      val occ = CacheScope.persist(base
        .selectExpr("doc_id", "lang",
          s"explode(transform(${wordHashesSpark("text")}, h -> h % $Buckets)) AS b"))
      val fr = occ.groupBy(col("b")).agg(count(lit(1)).as("f_r"))
      val ft = occ.filter(col("lang") === DsirTargetLang)
        .groupBy(col("b")).agg(count(lit(1)).as("f_t"))
      val nr = occ.agg(count(lit(1)).as("n_r"))
      val nt = occ.filter(col("lang") === DsirTargetLang)
        .agg(count(lit(1)).as("n_t"))
      val delta = fr.join(ft, Seq("b"), "left").na.fill(0L, Seq("f_t"))
        .crossJoin(broadcast(nr)).crossJoin(broadcast(nt))
        .selectExpr("b",
          s"CAST((CAST(f_t + 1 AS DECIMAL(38,0)) * (n_r + $Buckets) * 1000000) div " +
            s"(CAST(f_r + 1 AS DECIMAL(38,0)) * (n_t + $Buckets)) - 1000000 AS BIGINT) AS w_ppm")
      val perDoc = occ.join(broadcast(delta), Seq("b"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_toks"), sum(col("w_ppm")).as("w"))
      val tot = perDoc.agg(sum(col("w")).as("w_tot"), sum(col("n_toks")).as("n_tot"))
      base.select(col("doc_id"), col("source"))
        .join(perDoc, Seq("doc_id"), "left").na.fill(0L, Seq("w", "n_toks"))
        .crossJoin(broadcast(tot))
        .withColumn("is_keep", expr(
          "CASE WHEN CAST(w AS DECIMAL(38,0)) * n_tot >= CAST(w_tot AS DECIMAL(38,0)) * n_toks " +
            "THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("is_keep")).as("n_keep"),
          sum(col("w")).as("sum_w_ppm"),
          min(col("w")).as("min_w_ppm"),
          max(col("w")).as("max_w_ppm"))
        .selectExpr("source", "n_docs", "n_keep",
          "(n_keep * 10000) div n_docs AS keep_bp",
          "sum_w_ppm", "min_w_ppm", "max_w_ppm")
        .orderBy(asc("source"))
    }),

    // Cross-source content overlap — "how much of source A's vocabulary of
    // shingles also appears in source B" (directional containment, bp):
    // the inter-source leakage census a mixture designer consults before
    // weighting sources (two crawls of the same sites would light up
    // here). Plan: the corpus collapses ONCE to the distinct
    // (shingle, source) census — vocabulary × sources sized, never
    // document sized — then each shingle's source set (bounded by the
    // source count, a catalog-scale constant) explodes to its in-set
    // pairs, so the pair stream is census-linear with constant fan-out;
    // per-source shingle totals attach by broadcast. Both directions are
    // reported per unordered pair; top-20 by containment.
    "source_shingle_overlap" -> ((s, d) => {
      val census = docs(s, d)
        .selectExpr("source",
          s"explode(array_distinct(${shingleHashesSpark(wordHashesSpark("text"))})) AS sh")
        .distinct()
      val perSource = census.groupBy(col("source"))
        .agg(count(lit(1)).as("n_shingles"))
      val pairs = census.groupBy(col("sh"))
        .agg(sort_array(collect_set(col("source"))).as("srcs"))
        .filter(size(col("srcs")) >= 2)
        .selectExpr("explode(srcs) AS src_a", "srcs")
        .selectExpr("src_a", "explode(srcs) AS src_b")
        .filter(col("src_a") < col("src_b"))
        .groupBy(col("src_a"), col("src_b"))
        .agg(count(lit(1)).as("n_common"))
      pairs
        .join(broadcast(perSource.selectExpr("source AS src_a", "n_shingles AS sh_a")), Seq("src_a"))
        .join(broadcast(perSource.selectExpr("source AS src_b", "n_shingles AS sh_b")), Seq("src_b"))
        .selectExpr("src_a", "src_b", "n_common",
          "(n_common * 10000) div sh_a AS a_in_b_bp",
          "(n_common * 10000) div sh_b AS b_in_a_bp")
        .orderBy(desc("n_common"), asc("src_a"), asc("src_b"))
        .limit(20)
    }),

    // Per-source curation scorecard: the per-domain table every curation
    // run publishes (volume, language spread, exact-dup share, gate pass
    // share). One scan; the exact-dup flag is a content-hash window count
    // (the dedup_exact key), everything else folds in the same groupBy.
    "source_scorecard" -> ((s, d) => {
      val base = docs(s, d)
        .selectExpr("doc_id", "source", "lang", "n_chars", "md5(text) AS h",
          s"${tokensSpark("text")} AS toks")
        .selectExpr("doc_id", "source", "lang", "n_chars", "h",
          "CAST(size(toks) AS BIGINT) AS n_tokens",
          s"${TextAnalysis.qualityOkSpark("toks")} AS ok_q")
      base
        .withColumn("dup_n", count(lit(1)).over(Window.partitionBy(col("h"))))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("lang")).as("n_langs"),
          sum(col("n_chars")).as("total_chars"),
          sum(col("n_tokens")).as("total_tokens"),
          sum(when(col("dup_n") >= 2, 1L).otherwise(0L)).as("dup_docs"),
          sum(when(col("ok_q"), 1L).otherwise(0L)).as("ok_docs"))
        .selectExpr("source", "n_docs", "n_langs", "total_chars",
          "total_tokens",
          "(dup_docs * 10000) div n_docs AS dup_bp",
          "(ok_docs * 10000) div n_docs AS ok_bp")
        .orderBy(asc("source"))
    }),

    // Per-source distribution divergence — an integer-bits KL proxy:
    // KL(source ‖ corpus) estimated as the difference between each
    // source's token-weighted cross-entropy under the CORPUS unigram LM
    // and its entropy under its OWN unigram LM, both in the whole-bit
    // add-one-smoothed floor-log2 discipline of text_lm_surprisal (so the
    // quantization bias mostly cancels in the difference; the residual is
    // declared — this is a ranking signal, not a calibrated nat count).
    // The mixture designer's "which sources are off-distribution" table.
    // Scale shape: ONE corpus-scale tokenize/explode feeds a map-side-
    // combined (source, token) census; the corpus census, totals, and all
    // scoring joins run at VOCABULARY granularity (census rows, never
    // document rows); per-source and corpus totals attach by broadcast.
    "source_lm_divergence" -> ((s, d) => {
      val srcFreq = docs(s, d)
        .selectExpr("source", s"explode(${wordHashesSpark("text")}) AS h")
        .groupBy(col("source"), col("h"))
        .agg(count(lit(1)).as("fs"))
        .transform(CacheScope.persist)
      val corpFreq = srcFreq.groupBy(col("h")).agg(sum(col("fs")).as("f"))
      val corpTot = corpFreq.agg(sum(col("f")).as("t"), count(lit(1)).as("v"))
      val srcTot = srcFreq.groupBy(col("source"))
        .agg(sum(col("fs")).as("ts"), count(lit(1)).as("vs"))
      srcFreq
        .join(corpFreq, Seq("h"))
        .join(broadcast(srcTot), Seq("source"))
        .crossJoin(broadcast(corpTot))
        .selectExpr("source", "fs", "ts", "vs",
          s"CAST(${log2Spark("(ts + vs) div (fs + 1)")} AS BIGINT) AS bits_self",
          s"CAST(${log2Spark("(t + v) div (f + 1)")} AS BIGINT) AS bits_corpus")
        .groupBy(col("source"))
        .agg(max(col("ts")).as("n_tokens"), max(col("vs")).as("vocab"),
          sum(expr("fs * bits_self")).as("sb_self"),
          sum(expr("fs * bits_corpus")).as("sb_corpus"))
        .selectExpr("source", "n_tokens", "vocab",
          "(sb_self * 10000) div n_tokens AS h_self_bp",
          "(sb_corpus * 10000) div n_tokens AS h_cross_bp",
          "((sb_corpus - sb_self) * 10000) div n_tokens AS kl_bp")
        .orderBy(desc("kl_bp"), asc("source"))
    }),

    // Quality-curriculum token plan: documents bucketed by their hashed-
    // linear quality score into 10 fixed bins (score ∈ [−1000, 1000] mb →
    // bin 0..9), served highest-quality-first with cumulative token
    // accounting and a 3-phase curriculum assignment at thirds of the
    // total budget — the "anneal on the best slice last" schedule every
    // curriculum trainer plans with. Scale shape: scoring is the same
    // zero-join codegen'd map pass as text_quality_classifier; the census
    // groupBy is map-side combined to ≤10 rows; the cumulative window and
    // phase math run on that fixed grid. The bin key is score-derived
    // (bounded domain), never rank-derived — an ntile would need a global
    // sort of the corpus.
    "sample_curriculum" -> ((s, d) =>
      docs(s, d)
        .selectExpr(s"${wordHashesSpark("text")} AS wh")
        .selectExpr(
          s"aggregate(wh, 0L, (a, h) -> a + ${bucketWeightSpark("h")}) AS sw",
          "CAST(size(wh) AS BIGINT) AS n")
        .filter(col("n") > 0)
        .selectExpr("n", "(sw * 1000) div n AS mean_mb")
        .selectExpr("n",
          "least(greatest((mean_mb + 1000) div 200, 0L), 9L) AS bin")
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("tokens"))
        .withColumn("cum_tokens", sum(col("tokens")).over(
          Window.orderBy(desc("bin"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("total_tokens", sum(col("tokens")).over(
          Window.partitionBy()))
        .selectExpr("bin", "n_docs", "tokens", "cum_tokens",
          "(cum_tokens * 10000) div total_tokens AS cum_share_bp",
          "CASE WHEN (cum_tokens * 3) <= total_tokens THEN 1L " +
            "WHEN (cum_tokens * 3) <= total_tokens * 2 THEN 2L " +
            "ELSE 3L END AS phase")
        .orderBy(desc("bin")))
  )

  def oracles: Map[String, String] = Map(
    "text_quality_classifier" ->
      (s"WITH wh AS (SELECT lang, ${wordHashesDuck(tokensDuck("text"))} AS wh FROM documents), " +
        "sc AS (SELECT lang, " +
        s"list_reduce(list_prepend(0::BIGINT, list_transform(wh, h -> CAST(${bucketWeightDuck("h")} AS BIGINT))), (a, x) -> a + x) AS sw, " +
        "CAST(len(wh) AS BIGINT) AS n FROM wh WHERE len(wh) > 0), " +
        "m AS (SELECT lang, (sw * 1000) // n AS mean_mb FROM sc) " +
        "SELECT lang, count(*) AS n_docs, " +
        "sum(CASE WHEN mean_mb >= 0 THEN 1 ELSE 0 END)::BIGINT AS kept_docs, " +
        "(sum(CASE WHEN mean_mb >= 0 THEN 1 ELSE 0 END)::BIGINT * 10000) // count(*) AS kept_bp, " +
        "sum(mean_mb)::BIGINT // count(*) AS avg_mb, " +
        "min(mean_mb) AS min_mb, max(mean_mb) AS max_mb " +
        "FROM m GROUP BY lang ORDER BY lang"),
    "text_lm_surprisal" ->
      (s"WITH tk AS (SELECT doc_id, lang, unnest(${tokensDuck("text")}) AS tok FROM documents), " +
        "pd AS (SELECT doc_id, lang, tok, count(*)::BIGINT AS c FROM tk GROUP BY 1, 2, 3), " +
        "fr AS (SELECT lang, tok, sum(c)::BIGINT AS f FROM pd GROUP BY 1, 2), " +
        "lt AS (SELECT lang, sum(f)::BIGINT AS t, count(*)::BIGINT AS v FROM fr GROUP BY 1), " +
        "sc AS (SELECT doc_id, pd.lang, " +
        s"sum(c * CAST(${log2Duck("(t + v) // (f + 1)")} AS BIGINT))::BIGINT AS sb, " +
        "sum(c)::BIGINT AS n " +
        "FROM pd JOIN fr USING (lang, tok) JOIN lt USING (lang) GROUP BY 1, 2), " +
        "m AS (SELECT lang, (sb * 10000) // n AS mean_bits_bp FROM sc) " +
        "SELECT lang, mean_bits_bp // 10000 AS bits_bucket, count(*) AS n_docs, " +
        "min(mean_bits_bp) AS min_bp, max(mean_bits_bp) AS max_bp " +
        "FROM m GROUP BY 1, 2 ORDER BY lang, bits_bucket"),
    "text_dup_span_coverage" ->
      (s"WITH sh AS (SELECT doc_id, lang, ${spanHashesDuck(wordHashesDuck(tokensDuck("text")))} AS sh FROM documents), " +
        "nz AS (SELECT * FROM sh WHERE len(sh) > 0), " +
        s"nt AS (SELECT doc_id, lang, CAST(len(sh) + ${SpanK - 1} AS BIGINT) AS n_tokens FROM nz), " +
        "pos0 AS (SELECT doc_id, unnest(list_transform(sh, (x, i) -> {'i': i - 1, 'shv': x})) AS u FROM nz), " +
        "pos AS (SELECT doc_id, u.i AS i, u.shv AS shv FROM pos0), " +
        "dup AS (SELECT shv FROM (SELECT shv, count(DISTINCT doc_id) AS df FROM pos GROUP BY 1) _ WHERE df >= 2), " +
        "dp AS (SELECT doc_id, i FROM pos WHERE shv IN (SELECT shv FROM dup)), " +
        s"isl AS (SELECT doc_id, greatest(CAST(i + $SpanK AS BIGINT) - greatest(CAST(i AS BIGINT), " +
        s"coalesce(max(i + $SpanK) OVER (PARTITION BY doc_id ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT), 0::BIGINT) AS contrib FROM dp), " +
        "cov AS (SELECT doc_id, sum(contrib)::BIGINT AS covered FROM isl GROUP BY 1), " +
        "pc AS (SELECT lang, (coalesce(covered, 0) * 10000) // n_tokens AS cov_bp " +
        "FROM nt LEFT JOIN cov USING (doc_id)) " +
        "SELECT lang, count(*) AS n_docs, " +
        "sum(CASE WHEN cov_bp > 0 THEN 1 ELSE 0 END)::BIGINT AS dup_docs, " +
        "sum(CASE WHEN cov_bp >= 5000 THEN 1 ELSE 0 END)::BIGINT AS heavy_docs, " +
        "sum(cov_bp)::BIGINT // count(*) AS avg_bp, max(cov_bp) AS max_bp " +
        "FROM pc GROUP BY lang ORDER BY lang"),
    "text_lm_bigram_surprisal" ->
      (s"WITH wh AS (SELECT doc_id, lang, ${wordHashesDuck(tokensDuck("text"))} AS wh FROM documents), " +
        "nz AS (SELECT * FROM wh WHERE len(wh) >= 2), " +
        "bi0 AS (SELECT doc_id, lang, unnest(list_transform(range(2, len(wh) + 1), " +
        "i -> {'a': list_extract(wh, i - 1), 'b': list_extract(wh, i)})) AS p FROM nz), " +
        "bi AS (SELECT doc_id, lang, p.a AS a, p.b AS b, count(*)::BIGINT AS c FROM bi0 GROUP BY 1, 2, 3, 4), " +
        "bf AS (SELECT lang, a, b, sum(c)::BIGINT AS fb FROM bi GROUP BY 1, 2, 3), " +
        "pf AS (SELECT lang, a, sum(fb)::BIGINT AS fp FROM bf GROUP BY 1, 2), " +
        "vc AS (SELECT lang, count(DISTINCT h)::BIGINT AS v FROM " +
        s"(SELECT lang, unnest(${wordHashesDuck(tokensDuck("text"))}) AS h FROM documents) _ GROUP BY 1), " +
        "sc AS (SELECT doc_id, bi.lang, " +
        s"sum(c * CAST(${log2Duck("(fp + v) // (fb + 1)")} AS BIGINT))::BIGINT AS sb, sum(c)::BIGINT AS n " +
        "FROM bi JOIN bf USING (lang, a, b) JOIN pf USING (lang, a) JOIN vc USING (lang) GROUP BY 1, 2), " +
        "m AS (SELECT lang, (sb * 10000) // n AS mean_bits_bp FROM sc) " +
        "SELECT lang, mean_bits_bp // 10000 AS bits_bucket, count(*) AS n_docs, " +
        "min(mean_bits_bp) AS min_bp, max(mean_bits_bp) AS max_bp " +
        "FROM m GROUP BY 1, 2 ORDER BY lang, bits_bucket"),
    "mixture_token_plan" ->
      ("WITH av AS (SELECT lang, sum(n)::BIGINT AS avail_tokens FROM " +
        s"(SELECT lang, CAST(len(${tokensDuck("text")}) AS BIGINT) AS n FROM documents) _ GROUP BY lang), " +
        // out-of-map languages excluded, matching Spark's try_element_at
        // + NOT NULL filter (an ELSE-less CASE would keep a NULL row)
        "aw AS (SELECT lang, avail_tokens, weight_bp FROM (SELECT lang, avail_tokens, " +
        "CAST(CASE lang WHEN 'de' THEN 1250 WHEN 'en' THEN 5000 " +
        "WHEN 'es' THEN 1250 WHEN 'fr' THEN 1250 WHEN 'zh' THEN 1250 END AS BIGINT) AS weight_bp " +
        "FROM av) _w WHERE weight_bp IS NOT NULL), " +
        "bd AS (SELECT min((avail_tokens * 10000) // weight_bp)::BIGINT AS budget_tokens FROM aw), " +
        "pl AS (SELECT lang, avail_tokens, weight_bp, budget_tokens, " +
        "(budget_tokens // 10000) * weight_bp + ((budget_tokens % 10000) * weight_bp) // 10000 AS planned_tokens " +
        "FROM aw CROSS JOIN bd) " +
        "SELECT lang, avail_tokens, weight_bp, budget_tokens, planned_tokens, " +
        "(planned_tokens * 10000) // avail_tokens AS rate_bp, " +
        "(avail_tokens * 10000) // weight_bp = budget_tokens AS is_binding " +
        "FROM pl ORDER BY lang"),
    "sample_epoch_plan" ->
      ("WITH av AS (SELECT lang, sum(n)::BIGINT AS avail_tokens FROM " +
        s"(SELECT lang, CAST(len(${tokensDuck("text")}) AS BIGINT) AS n FROM documents) _ GROUP BY lang), " +
        // out-of-map exclusion — see mixture_token_plan
        "aw AS (SELECT lang, avail_tokens, weight_bp FROM (SELECT lang, avail_tokens, " +
        "CAST(CASE lang WHEN 'de' THEN 1250 WHEN 'en' THEN 5000 " +
        "WHEN 'es' THEN 1250 WHEN 'fr' THEN 1250 WHEN 'zh' THEN 1250 END AS BIGINT) AS weight_bp " +
        "FROM av) _w WHERE weight_bp IS NOT NULL), " +
        "tt AS (SELECT CAST(sum(avail_tokens) AS BIGINT) AS corpus_tokens FROM aw), " +
        s"tg AS (SELECT lang, avail_tokens, weight_bp, $EpochBudgetX * " +
        "((corpus_tokens // 10000) * weight_bp + ((corpus_tokens % 10000) * weight_bp) // 10000) " +
        "AS target_tokens FROM aw CROSS JOIN tt), " +
        s"ep AS (SELECT lang, avail_tokens, weight_bp, target_tokens, " +
        s"CASE WHEN target_tokens >= $EpochCap * avail_tokens THEN CAST(${EpochCap * 10000} AS BIGINT) " +
        // HUGEINT, not DECIMAL: DuckDB's `//` on a DECIMAL operand degrades
        // to double division and the BIGINT cast ROUNDS — HUGEINT `//` is
        // true integer division, matching Spark's DECIMAL(38,0) div
        "ELSE (target_tokens // avail_tokens) * 10000 + " +
        "CAST((CAST(target_tokens % avail_tokens AS HUGEINT) * 10000) // avail_tokens AS BIGINT) " +
        "END AS epochs_e4 FROM tg), " +
        "ac AS (SELECT lang, avail_tokens, weight_bp, target_tokens, epochs_e4, " +
        "(avail_tokens // 10000) * epochs_e4 + ((avail_tokens % 10000) * epochs_e4) // 10000 " +
        "AS achieved_tokens FROM ep) " +
        "SELECT lang, avail_tokens, weight_bp, target_tokens, epochs_e4, achieved_tokens, " +
        "greatest(target_tokens - achieved_tokens, CAST(0 AS BIGINT)) AS deficit_tokens, " +
        s"epochs_e4 = ${EpochCap * 10000} AS is_capped " +
        "FROM ac ORDER BY lang"),
    "curation_dsir_weights" ->
      (s"WITH tokh AS (SELECT doc_id, lang, source, " +
        s"list_transform(${wordHashesDuck(tokensDuck("text"))}, h -> h % $Buckets) AS bs FROM documents), " +
        "occ AS MATERIALIZED (SELECT doc_id, lang, unnest(bs) AS b FROM tokh), " +
        "fr AS (SELECT b, count(*) AS f_r FROM occ GROUP BY b), " +
        s"ft AS (SELECT b, count(*) AS f_t FROM occ WHERE lang = '$DsirTargetLang' GROUP BY b), " +
        "nr AS (SELECT count(*) AS n_r FROM occ), " +
        s"nt AS (SELECT count(*) AS n_t FROM occ WHERE lang = '$DsirTargetLang'), " +
        "delta AS (SELECT fr.b, CAST(((coalesce(f_t, 0) + 1)::HUGEINT * " +
        s"(n_r + $Buckets) * 1000000) // ((f_r + 1)::HUGEINT * (n_t + $Buckets)) " +
        "- 1000000 AS BIGINT) AS w_ppm " +
        "FROM fr LEFT JOIN ft ON ft.b = fr.b CROSS JOIN nr CROSS JOIN nt), " +
        "pd AS (SELECT o.doc_id, count(*) AS n_toks, CAST(sum(d.w_ppm) AS BIGINT) AS w " +
        "FROM occ o JOIN delta d ON d.b = o.b GROUP BY o.doc_id), " +
        "tot AS (SELECT CAST(sum(w) AS BIGINT) AS w_tot, CAST(sum(n_toks) AS BIGINT) AS n_tot FROM pd), " +
        "ad AS (SELECT dd.source, coalesce(pd.w, 0) AS w, coalesce(pd.n_toks, 0) AS n_toks " +
        "FROM documents dd LEFT JOIN pd ON pd.doc_id = dd.doc_id) " +
        "SELECT source, count(*) AS n_docs, " +
        "CAST(sum(CASE WHEN w::HUGEINT * t.n_tot >= t.w_tot::HUGEINT * n_toks THEN 1 ELSE 0 END) AS BIGINT) AS n_keep, " +
        "(CAST(sum(CASE WHEN w::HUGEINT * t.n_tot >= t.w_tot::HUGEINT * n_toks THEN 1 ELSE 0 END) AS BIGINT) * 10000) // count(*) AS keep_bp, " +
        "CAST(sum(w) AS BIGINT) AS sum_w_ppm, CAST(min(w) AS BIGINT) AS min_w_ppm, " +
        "CAST(max(w) AS BIGINT) AS max_w_ppm " +
        "FROM ad CROSS JOIN tot t GROUP BY source ORDER BY source"),

    "source_shingle_overlap" ->
      (s"WITH census AS (SELECT DISTINCT source, " +
        s"unnest(list_distinct(${shingleHashesDuck(wordHashesDuck(tokensDuck("text")))})) AS sh " +
        "FROM documents), " +
        "per_source AS (SELECT source, count(*) AS n_shingles FROM census GROUP BY source), " +
        "p AS (SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_common " +
        "FROM census a JOIN census b ON a.sh = b.sh AND a.source < b.source " +
        "GROUP BY src_a, src_b) " +
        "SELECT src_a, src_b, n_common, " +
        "(n_common * 10000) // pa.n_shingles AS a_in_b_bp, " +
        "(n_common * 10000) // pb.n_shingles AS b_in_a_bp " +
        "FROM p JOIN per_source pa ON pa.source = src_a " +
        "JOIN per_source pb ON pb.source = src_b " +
        "ORDER BY n_common DESC, src_a, src_b LIMIT 20"),

    "source_scorecard" ->
      (s"WITH b AS (SELECT doc_id, source, lang, n_chars, md5(text) AS h, ${tokensDuck("text")} AS toks FROM documents), " +
        "b2 AS (SELECT doc_id, source, lang, n_chars, h, CAST(len(toks) AS BIGINT) AS n_tokens, " +
        s"${TextAnalysis.qualityOkDuck("toks")} AS ok_q FROM b), " +
        "b3 AS (SELECT *, count(*) OVER (PARTITION BY h) AS dup_n FROM b2) " +
        "SELECT source, count(*) AS n_docs, count(DISTINCT lang) AS n_langs, " +
        "sum(n_chars)::BIGINT AS total_chars, sum(n_tokens)::BIGINT AS total_tokens, " +
        "(sum(CASE WHEN dup_n >= 2 THEN 1 ELSE 0 END)::BIGINT * 10000) // count(*) AS dup_bp, " +
        "(sum(CASE WHEN ok_q THEN 1 ELSE 0 END)::BIGINT * 10000) // count(*) AS ok_bp " +
        "FROM b3 GROUP BY source ORDER BY source"),

    "source_lm_divergence" ->
      (s"WITH tk AS (SELECT source, unnest(${wordHashesDuck(tokensDuck("text"))}) AS h FROM documents), " +
        "sf AS (SELECT source, h, count(*)::BIGINT AS fs FROM tk GROUP BY 1, 2), " +
        "cf AS (SELECT h, sum(fs)::BIGINT AS f FROM sf GROUP BY 1), " +
        "ct AS (SELECT sum(f)::BIGINT AS t, count(*)::BIGINT AS v FROM cf), " +
        "st AS (SELECT source, sum(fs)::BIGINT AS ts, count(*)::BIGINT AS vs FROM sf GROUP BY 1), " +
        "sc AS (SELECT sf.source, max(ts)::BIGINT AS n_tokens, max(vs)::BIGINT AS vocab, " +
        s"sum(fs * CAST(${log2Duck("(ts + vs) // (fs + 1)")} AS BIGINT))::BIGINT AS sb_self, " +
        s"sum(fs * CAST(${log2Duck("(t + v) // (f + 1)")} AS BIGINT))::BIGINT AS sb_corpus " +
        "FROM sf JOIN cf USING (h) JOIN st USING (source) CROSS JOIN ct GROUP BY 1) " +
        "SELECT source, n_tokens, vocab, " +
        "(sb_self * 10000) // n_tokens AS h_self_bp, " +
        "(sb_corpus * 10000) // n_tokens AS h_cross_bp, " +
        "((sb_corpus - sb_self) * 10000) // n_tokens AS kl_bp " +
        "FROM sc ORDER BY kl_bp DESC, source"),

    "sample_curriculum" ->
      (s"WITH wh AS (SELECT ${wordHashesDuck(tokensDuck("text"))} AS wh FROM documents), " +
        "sc AS (SELECT " +
        s"list_reduce(list_prepend(0::BIGINT, list_transform(wh, h -> CAST(${bucketWeightDuck("h")} AS BIGINT))), (a, x) -> a + x) AS sw, " +
        "CAST(len(wh) AS BIGINT) AS n FROM wh WHERE len(wh) > 0), " +
        "bn AS (SELECT n, least(greatest(((sw * 1000) // n + 1000) // 200, 0), 9) AS bin FROM sc), " +
        "cs AS (SELECT bin, count(*) AS n_docs, sum(n)::BIGINT AS tokens FROM bn GROUP BY bin), " +
        "w AS (SELECT *, CAST(sum(tokens) OVER (ORDER BY bin DESC " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens, " +
        "CAST(sum(tokens) OVER () AS BIGINT) AS total_tokens FROM cs) " +
        "SELECT bin, n_docs, tokens, cum_tokens, " +
        "(cum_tokens * 10000) // total_tokens AS cum_share_bp, " +
        "CAST(CASE WHEN cum_tokens * 3 <= total_tokens THEN 1 " +
        "WHEN cum_tokens * 3 <= total_tokens * 2 THEN 2 ELSE 3 END AS BIGINT) AS phase " +
        "FROM w ORDER BY bin DESC")
  )
}
