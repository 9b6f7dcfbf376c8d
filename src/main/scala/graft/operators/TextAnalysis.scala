package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.CrossHash._

/** Text-analysis operators for a training-data pipeline, over `documents`:
  * token statistics, quality scoring, n-gram language ID, and document
  * fingerprinting. All pure codegen'd Spark SQL expressions (no UDFs);
  * every ratio is emitted as an exact integer (basis points via integer
  * division) so the DuckDB oracle hash-matches bit-for-bit.
  *
  * Scale: each query is a single narrow scan + project (no shuffle except
  * the final order for the oracle); at 100 TB this is the map-side of the
  * corpus pipeline.
  */
object TextAnalysis {

  private def docs(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.TextHashFunctions.register(spark) // codegen'd char_hash
    spark.read.parquet(s"$dir/documents.parquet")
  }

  /** Tiny per-language stopword lists for the n-gram/stopword language-ID
    * heuristic (shared literal lists with the oracle SQL). */
  val StopLists: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "zu", "ist"),
    "en" -> Seq("the", "a", "of", "and", "to", "is"),
    "es" -> Seq("el", "la", "de", "y", "que", "es"),
    "fr" -> Seq("le", "la", "de", "et", "les", "est"),
    "zh" -> Seq("de", "shi", "le", "zai", "you", "wo")
  )

  private val EnStop = StopLists.toMap.apply("en")

  /** The Gopher-gate pass/fail decision as ONE boolean over a token-array
    * expression — the same four integer-exact rules text_quality_gate
    * reports per language, factored so the training_data_factory funnel
    * applies the identical decision (one rendering per engine, like the
    * top-k and e10-means idioms). */
  private[operators] def qualityOkSpark(toks: String): String = {
    val allStop = StopLists.flatMap(_._2).distinct.sorted
    s"((CAST(size($toks) AS BIGINT) BETWEEN 10 AND 100000) AND " +
      s"(((aggregate($toks, 0L, (a, t) -> a + length(t)) * 10) div greatest(size($toks), 1)) BETWEEN 30 AND 100) AND " +
      s"(((CAST(size(filter($toks, t -> t rlike '[a-zA-Z]')) AS BIGINT) * 10000) div greatest(size($toks), 1)) >= 7000) AND " +
      s"(CAST(size(filter($toks, t -> t IN (${allStop.map("'" + _ + "'").mkString(",")}))) AS BIGINT) >= 2))"
  }

  /** The code-switch decision as ONE boolean over a token-array
    * expression — second-best stoplist score ≥ half the best and ≥ 2 hits
    * (the text_code_switch rule, factored so corpus_pipeline_v4 applies
    * the identical decision; one rendering per engine). */
  private[operators] def codeSwitchedSpark(toks: String): String = {
    val arr = StopLists.map { case (_, ws) =>
      s"CAST(size(filter($toks, t -> t IN (${ws.map("'" + _ + "'").mkString(",")}))) AS BIGINT)"
    }.mkString("array(", ", ", ")")
    s"(element_at(array_sort($arr), 4) * 2 >= element_at(array_sort($arr), 5) " +
      s"AND element_at(array_sort($arr), 4) >= 2)"
  }

  /** DuckDB twin of [[codeSwitchedSpark]]. */
  private[operators] def codeSwitchedDuck(toks: String): String = {
    val arr = StopLists.map { case (_, ws) =>
      s"CAST(len(list_filter($toks, t -> t IN (${ws.map("'" + _ + "'").mkString(",")}))) AS BIGINT)"
    }.mkString("[", ", ", "]")
    s"(list_extract(list_sort($arr), 4) * 2 >= list_extract(list_sort($arr), 5) " +
      s"AND list_extract(list_sort($arr), 4) >= 2)"
  }

  /** DuckDB twin of [[qualityOkSpark]] (identical rules and arithmetic). */
  private[operators] def qualityOkDuck(toks: String): String = {
    val allStop = StopLists.flatMap(_._2).distinct.sorted
    s"((CAST(len($toks) AS BIGINT) BETWEEN 10 AND 100000) AND " +
      s"(((list_reduce(list_prepend(0::BIGINT, list_transform($toks, t -> length(t)::BIGINT)), (a, x) -> a + x) * 10) // greatest(len($toks), 1)) BETWEEN 30 AND 100) AND " +
      s"(((len(list_filter($toks, t -> regexp_matches(t, '[a-zA-Z]'))) * 10000) // greatest(len($toks), 1)) >= 7000) AND " +
      s"(CAST(len(list_filter($toks, t -> t IN (${allStop.map("'" + _ + "'").mkString(",")}))) AS BIGINT) >= 2))"
  }

  /** Shard fan-out for the two-level per-language top-k. A single
    * `row_number() OVER (PARTITION BY lang)` funnels a language's ENTIRE
    * scored vocabulary through one reducer — at 100 TB English alone is one
    * straggler. Level 1 ranks within (lang, hash-shard) — each reducer sees
    * vocab/Shards rows; level 2 merges the ≤ Shards·k survivors per
    * language with a collect_list + array_sort + slice (no lang-only window
    * anywhere). Top-k of the union of per-shard top-k IS the global top-k,
    * so results are bit-identical to the single-window rendering and the
    * shard hash never crosses the engine boundary. Size this ~ cluster
    * parallelism in production. */
  private val TopKShards = 32

  /** The two-level top-k itself, shared by the three per-language rank
    * queries. `sortKey` is a struct whose LEXICOGRAPHIC ASCENDING order is
    * the desired rank order (negate numeric fields for descending) — the
    * same struct drives the shard-local window AND the merge sort, so the
    * two levels cannot disagree. Returns (lang, pos, col = sortKey struct)
    * with pos 0-based within the per-language top-k. */
  private def topKPerLang(df: DataFrame, k: Int,
      shardKey: org.apache.spark.sql.Column,
      sortKey: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.withColumn("__key", sortKey)
      .withColumn("__shard", pmod(xxhash64(shardKey), lit(TopKShards)).cast("int"))
      .withColumn("__srk", row_number().over(
        Window.partitionBy(col("lang"), col("__shard")).orderBy(asc("__key"))))
      .filter(col("__srk") <= k)
      .groupBy(col("lang"))
      .agg(collect_list(col("__key")).as("cand"))
      .select(col("lang"), posexplode(expr(s"slice(array_sort(cand), 1, $k)")))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Per-language lexical diversity without logarithms: Gini-Simpson
    // index 1 − Σp² (the entropy stand-in that stays integer-exact:
    // simpson_e6 = 1e6 − (Σn²·1e6) div N², Σn² on DECIMAL(38,0)/HUGEINT —
    // ≤ 1e30 at a 1e12-token corpus, inside the ceiling) plus hapax
    // legomena rate (share of the vocabulary seen exactly once — the
    // classic "how much tail does this corpus have" curation signal).
    // One map-side token census collapsed to vocabulary size; the final
    // aggregate is langs-sized. No corpus window, no second scan.
    "text_lang_diversity" -> ((s, d) => {
      val tf = docs(s, d)
        .selectExpr("lang", s"explode(${tokensSpark("text")}) AS term")
        .groupBy(col("lang"), col("term")).agg(count(lit(1)).as("n"))
      tf.groupBy(col("lang"))
        .agg(count(lit(1)).as("vocab"), sum(col("n")).as("n_tokens"),
          sum(expr("CAST(n AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0))")).as("sum_sq"),
          sum(when(col("n") === 1L, 1L).otherwise(0L)).as("hapax"))
        .selectExpr("lang", "CAST(vocab AS BIGINT) AS vocab",
          "CAST(n_tokens AS BIGINT) AS n_tokens",
          "CAST(hapax AS BIGINT) AS hapax",
          "(CAST(hapax AS BIGINT) * 1000000) div vocab AS hapax_rate_e6",
          "CAST(1000000 - (sum_sq * 1000000) div " +
            "(CAST(n_tokens AS DECIMAL(38,0)) * CAST(n_tokens AS DECIMAL(38,0))) AS BIGINT) AS simpson_e6")
        .orderBy(asc("lang"))
    }),

    // Cross-language vocabulary overlap: per lang pair, both vocab sizes,
    // shared-type count, and Jaccard e6 — the "can these corpora share a
    // tokenizer" decision grid. One distinct (lang, term) census; the
    // self-join keys on term (each term contributes ≤ langs² pair rows,
    // so the join output is vocabulary-sized); pair grid built from the
    // langs-sized size relation so zero-overlap pairs still emit.
    "tokenizer_vocab_overlap" -> ((s, d) => {
      val vocab = docs(s, d)
        .selectExpr("lang", s"explode(array_distinct(${tokensSpark("text")})) AS term")
        .distinct()
        .transform(CacheScope.persist)
      val sizes = vocab.groupBy(col("lang")).agg(count(lit(1)).as("v"))
      val shared = vocab.alias("a")
        .join(vocab.alias("b"),
          col("a.term") === col("b.term") && col("a.lang") < col("b.lang"))
        .groupBy(col("a.lang").as("lang_a"), col("b.lang").as("lang_b"))
        .agg(count(lit(1)).as("shared"))
      sizes.alias("x")
        .join(sizes.alias("y"), col("x.lang") < col("y.lang"))
        .select(col("x.lang").as("lang_a"), col("y.lang").as("lang_b"),
          col("x.v").as("vocab_a"), col("y.v").as("vocab_b"))
        .join(shared, Seq("lang_a", "lang_b"), "left")
        .selectExpr("lang_a", "lang_b",
          "CAST(vocab_a AS BIGINT) AS vocab_a",
          "CAST(vocab_b AS BIGINT) AS vocab_b",
          "CAST(coalesce(shared, 0) AS BIGINT) AS shared",
          "(CAST(coalesce(shared, 0) AS BIGINT) * 1000000) div " +
            "(vocab_a + vocab_b - coalesce(shared, 0)) AS jaccard_e6")
        .orderBy(asc("lang_a"), asc("lang_b"))
    }),

    // Token counting: whitespace tokens + a BPE-ish sub-word proxy
    // (4-char chunks, the standard chars-per-token heuristic).
    "text_token_count" -> ((s, d) =>
      docs(s, d).selectExpr(
        "doc_id",
        // BIGINT on both engines: Spark size()/length() return INT where
        // DuckDB len()/length() return BIGINT
        s"CAST(size(${tokensSpark("text")}) AS BIGINT) AS n_tokens",
        s"CAST(size(array_distinct(${tokensSpark("text")})) AS BIGINT) AS n_uniq_tokens",
        "CAST(length(text) AS BIGINT) AS n_chars_measured",
        // ceil-division in pure integer math: (len + 3) div 4
        "(length(text) + 3) div 4 AS n_bpe_ish_tokens"
      ).orderBy(asc("doc_id"))),

    // Quality scoring: structural ratios as exact basis points.
    "text_quality" -> ((s, d) =>
      docs(s, d).selectExpr(
        "doc_id",
        s"CAST(size(${tokensSpark("text")}) AS BIGINT) AS n_tokens",
        // mean token length in basis points
        s"(length(text) * 10000) div greatest(size(${tokensSpark("text")}), 1) AS avg_token_len_bp",
        // type-token ratio (lexical diversity) in bp
        s"""(CAST(size(array_distinct(${tokensSpark("text")})) AS BIGINT) * 10000)
            div greatest(size(${tokensSpark("text")}), 1) AS ttr_bp""",
        // stopword ratio in bp
        s"""(size(filter(${tokensSpark("text")},
             t -> t IN (${EnStop.map("'" + _ + "'").mkString(",")}))) * 10000)
            div greatest(size(${tokensSpark("text")}), 1) AS stopword_bp""",
        // punctuation + digit counts via regexp strip
        "CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '')) AS BIGINT) AS n_punct",
        "CAST(length(text) - length(regexp_replace(text, '[0-9]', '')) AS BIGINT) AS n_digits"
      ).orderBy(asc("doc_id"))),

    // Language ID: score per stoplist, argmax with pinned tiebreak order.
    "text_langid" -> ((s, d) => {
      val withScores = StopLists.foldLeft(docs(s, d)) { case (df, (lang, words)) =>
        df.withColumn(s"s_$lang", expr(
          s"""CAST(size(filter(${tokensSpark("text")},
              t -> t IN (${words.map("'" + _ + "'").mkString(",")}))) AS BIGINT)"""))
      }
      val langs = StopLists.map(_._1)
      // first maximal score in alphabetical language order wins
      val pred = langs.map { l =>
        val geAll = langs.map(o => s"s_$l >= s_$o").mkString(" AND ")
        s"WHEN $geAll THEN '$l'"
      }.mkString("CASE ", " ", " ELSE 'und' END")
      withScores.selectExpr(
        Seq("doc_id", "lang AS labeled_lang") ++ langs.map(l => s"s_$l") :+
          s"$pred AS pred_lang": _*)
        .withColumn("label_match", (col("pred_lang") === col("labeled_lang")).cast("int"))
        .orderBy(asc("doc_id"))
    }),

    // Language-ID confusion grid: the langid relation aggregated to
    // (labeled, predicted) counts with each row's share of its labeled
    // language — the mislabeled-corpus diagnostic a curation run reads
    // before trusting declared langs. Composes text_langid verbatim (the
    // ann_recall_eval discipline: an eval that embeds the thing it
    // evaluates can't drift from it); the grid is ≤ (langs+1)² rows, so
    // the share window is grid-sized — the corpus-scale work is the one
    // scored projection inside text_langid.
    "text_langid_confusion" -> ((s, d) =>
      queries("text_langid")(s, d)
        .groupBy(col("labeled_lang"), col("pred_lang"))
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("row_share_bp",
          expr("(n_docs * 10000) div sum(n_docs) OVER (PARTITION BY labeled_lang)"))
        .orderBy(asc("labeled_lang"), asc("pred_lang"))),

    // Document fingerprinting: full-content polynomial hash + winnowing-ish
    // minimum over 8-char rolling windows (stride 4).
    "text_fingerprint" -> ((s, d) =>
      docs(s, d).selectExpr(
        "doc_id",
        s"${charHashSpark("text")} AS content_hash",
        s"""array_min(transform(
             sequence(1, greatest((length(text) - 7 + 3) div 4, 1)),
             i -> ${charHashSpark("substring(text, (i - 1) * 4 + 1, 8)")}
           )) AS window_fingerprint"""
      ).orderBy(asc("doc_id"))),

    // Gopher-style repetition signals: top-token share, top-bigram count,
    // duplicate-token share — the standard "is this doc degenerate
    // boilerplate" curation filters. Shape: explode -> two-level agg
    // (inverted-index shuffle on (doc_id, token), bounded by vocab per
    // doc); a per-doc HOF would be O(tokens^2) and shuffle-free but
    // quadratic — wrong trade at 100 TB document sizes.
    "text_repetition" -> ((s, d) => {
      val base = docs(s, d).selectExpr("doc_id", s"${tokensSpark("text")} AS toks")
        .selectExpr("doc_id", "toks",
          // guard: sequence(1, 0) in Spark descends — emit no bigrams
          // for single-token docs instead
          """CASE WHEN size(toks) < 2 THEN array()
             ELSE transform(sequence(1, size(toks) - 1),
               i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))
             END AS bigrams""")
      val tokStats = base.select(col("doc_id"), explode(col("toks")).as("tok"))
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(max(col("c")).as("top_token_count"),
          count(lit(1)).as("n_distinct_tokens"),
          sum(col("c")).as("n_tokens"))
      val biStats = base.select(col("doc_id"), explode(col("bigrams")).as("bg"))
        .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id")).agg(max(col("c")).as("top_bigram_count"))
      tokStats.join(biStats, Seq("doc_id"), "left")
        .selectExpr("doc_id",
          "CAST(n_tokens AS BIGINT) AS n_tokens",
          "CAST(n_distinct_tokens AS BIGINT) AS n_distinct_tokens",
          "CAST(top_token_count AS BIGINT) AS top_token_count",
          "(top_token_count * 10000) div greatest(n_tokens, 1) AS top_token_bp",
          "CAST(coalesce(top_bigram_count, 0) AS BIGINT) AS top_bigram_count",
          "((n_tokens - n_distinct_tokens) * 10000) div greatest(n_tokens, 1) AS dup_token_bp")
        .orderBy(asc("doc_id"))
    }),

    // Per-language top-5 vocabulary: count desc, token asc tiebreak. The
    // token count shuffles on (lang, token) — the inverted-index shape —
    // then the two-level top-k (see TopKShards): shard-local rank windows,
    // lang-level merge over ≤ Shards·5 rows via sorted-slice, so no
    // reducer ever holds a language's whole vocabulary.
    "text_top_tokens" -> ((s, d) => {
      val counts = docs(s, d)
        .select(col("lang"), explode(expr(tokensSpark("text"))).as("tok"))
        .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("n"))
      topKPerLang(counts, 5, col("tok"),
          struct(negate(col("n")).as("nn"), col("tok")))
        .selectExpr("lang", "col.tok AS tok", "CAST(-col.nn AS BIGINT) AS n",
          "CAST(pos + 1 AS BIGINT) AS rank")
        .orderBy(asc("lang"), asc("rank"))
    }),

    // Zipf's-law fit per language: the least-squares slope of
    // log2(freq) against log2(rank) over the full token-frequency
    // census — the one-number "does this corpus look like natural
    // language" diagnostic (natural text sits near slope −1; boilerplate
    // and spam flatten or steepen it). Everything is integer-exact: both
    // logs are the engine-neutral binary digit count (length(bin(q))−1,
    // the lm_surprisal idiom), the rank window runs over the VOCABULARY
    // census (freq DESC, tok ASC — never the corpus), the five regression
    // moments are one map-side-combined groupBy, and the closing ratio
    // rides DECIMAL(38,0)/HUGEINT with sign-guarded division (n·Σxy is
    // corpus-vocabulary-sized — past int64 at extreme vocabularies; the
    // quotient must truncate toward zero identically in both engines).
    // A degenerate census (all ranks in one log2 bucket) emits NULL.
    "text_zipf_fit" -> ((s, d) => {
      val census = docs(s, d)
        .select(col("lang"), explode(expr(tokensSpark("text"))).as("tok"))
        .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("f"))
      census
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("lang")).orderBy(desc("f"), asc("tok"))))
        .selectExpr("lang",
          "CAST(length(bin(rank)) - 1 AS BIGINT) AS x",
          "CAST(length(bin(f)) - 1 AS BIGINT) AS y")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(expr("x * x")).as("sxx"), sum(expr("x * y")).as("sxy"))
        .selectExpr("lang", "CAST(n AS BIGINT) AS n_types",
          "CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS num",
          "CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS den")
        .selectExpr("lang", "n_types",
          """CAST(CASE WHEN den = 0 THEN NULL
                       WHEN num < 0 THEN -(((-num) * 1000000) div den)
                       ELSE (num * 1000000) div den END AS BIGINT) AS slope_ppm""")
        .orderBy(asc("lang"))
    }),

    // Collocation mining: per-language top-20 bigrams by lift — the
    // association score kept integer-exact as basis points
    // (n_ab·N·10⁴ ÷ (n_a·n_b), all counts, no logs — PMI's log only
    // reorders monotonically at fixed N so lift ranks identically), with
    // min support n_ab ≥ 5. Two-level shape: one groupBy builds the bigram
    // counts, unigram margins re-aggregate FROM those counts (never from
    // the raw token stream), so the expensive pass over the corpus happens
    // exactly once. Magnitude bound: n_ab·N·10⁴ needs int64 headroom —
    // fine to ~10⁷ bigrams per language partition; shard the lang key
    // before that (the scores are per-partition exact either way).
    "text_bigram_lift" -> ((s, d) => {
      val ab = docs(s, d)
        .selectExpr("lang", s"${tokensSpark("text")} AS toks")
        .filter(expr("size(toks) >= 2"))
        .selectExpr("lang",
          """explode(transform(sequence(1, size(toks) - 1),
             i -> struct(element_at(toks, i) AS w1, element_at(toks, i + 1) AS w2))) AS e""")
        .selectExpr("lang", "e.w1 AS w1", "e.w2 AS w2")
        .groupBy(col("lang"), col("w1"), col("w2")).agg(count(lit(1)).as("n_ab"))
        .transform(CacheScope.persist)
      val wa = ab.groupBy(col("lang"), col("w1")).agg(sum("n_ab").as("n_a"))
      val wb = ab.groupBy(col("lang"), col("w2")).agg(sum("n_ab").as("n_b"))
      // per-lang total as a tiny aggregate broadcast back — a
      // Window.partitionBy(lang) here would funnel a language's entire
      // bigram table through one reducer just to attach one scalar
      val totals = ab.groupBy(col("lang")).agg(sum("n_ab").as("n_total"))
      ab.join(broadcast(totals), Seq("lang"))
        .join(wa, Seq("lang", "w1"))
        .join(wb, Seq("lang", "w2"))
        .filter(col("n_ab") >= 5)
        .selectExpr("lang", "w1", "w2", "n_ab",
          "(n_ab * n_total * 10000) div (n_a * n_b) AS lift_bp")
        // two-level top-20 (see topKPerLang / TopKShards)
        .transform(scored => topKPerLang(scored, 20, concat(col("w1"), lit(" "), col("w2")),
          struct(negate(col("lift_bp")).as("nl"), negate(col("n_ab")).as("nn"),
            col("w1"), col("w2"))))
        .selectExpr("lang", "col.w1 AS w1", "col.w2 AS w2",
          "CAST(-col.nn AS BIGINT) AS n_ab", "CAST(-col.nl AS BIGINT) AS lift_bp",
          "CAST(pos + 1 AS BIGINT) AS rank")
        .orderBy(asc("lang"), asc("rank"))
    }),

    // Fluency proxy (the integer-exact stand-in for an LM-perplexity
    // filter): a doc whose bigrams are common in its language's corpus
    // reads as fluent; degenerate or shuffled text hits rare bigrams.
    // Score = mean corpus frequency of the doc's bigrams, ×10⁴. One
    // corpus pass builds the bigram relation (persisted), the counts
    // aggregate over it, and the join back is an equi-join on the hashed
    // (lang, bigram) key — the inverted-index shape, near-linear at 100 TB.
    "text_fluency" -> ((s, d) => {
      // the persisted relation is corpus-sized (one row per bigram
      // OCCURRENCE), so it carries a 64-bit xxhash of (lang, w1, w2)
      // instead of the strings — the downstream groupBy and join-back
      // only ever use the bigram as an opaque key, so results are
      // identical (xxhash64 collisions at corpus vocab sizes are ~2^-40
      // and the oracle hash gate would catch one), while the cached
      // footprint and both shuffles drop from ~2 strings/row to 16 bytes
      val bg = docs(s, d)
        .selectExpr("doc_id", "lang", s"${tokensSpark("text")} AS toks")
        .filter(expr("size(toks) >= 2"))
        .selectExpr("doc_id",
          """explode(transform(sequence(1, size(toks) - 1),
             i -> xxhash64(lang, element_at(toks, i), element_at(toks, i + 1)))) AS bgh""")
        .transform(CacheScope.persist)
      val counts = bg.groupBy(col("bgh")).agg(count(lit(1)).as("n_bg"))
      bg.join(counts, Seq("bgh"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"), sum(col("n_bg")).as("sum_bg"))
        .selectExpr("doc_id", "n_bigrams",
          "(sum_bg * 10000) div n_bigrams AS avg_bigram_freq_e4")
        .orderBy(asc("doc_id"))
    }),

    // Corpus-level TF-IDF: per-language top-5 terms by tf·idf, kept
    // integer-exact — idf is scaled reciprocal document frequency
    // ((N·10⁶) div df, monotone in the usual log(N/df) so ranks at fixed N
    // are idf-faithful for the high-idf terms this surfaces), score =
    // tf·idf_e6. One corpus pass builds (lang, term) → (tf, df); the
    // per-lang doc totals are a tiny aggregate broadcast back (same
    // no-window-scalar discipline as text_bigram_lift). Ties break on
    // term asc in both engines.
    "text_tfidf_top_terms" -> ((s, d) => {
      val stats = docs(s, d)
        .select(col("lang"), col("doc_id"), explode(expr(tokensSpark("text"))).as("tok"))
        .groupBy(col("lang"), col("tok"))
        .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
      val nd = docs(s, d).groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"))
      stats.join(broadcast(nd), Seq("lang"))
        // tf·idf rides DECIMAL(38,0): the idf factor grows linearly with
        // n_docs (~10¹⁷ for a hapax at 10¹¹ docs), so a high-tf low-df
        // token pushes the BIGINT product past 2^63 — same overflow class
        // as part_revenue_concentration's bin sums. Emitted as STRING
        // integer digits (hash- and version-stable in every engine).
        // idf itself stays inside int64 up to ~9·10¹² docs per language
        // (Spark's div on decimals returns BIGINT and throws past that).
        .selectExpr("lang", "tok", "tf", "df",
          "CAST(tf AS DECIMAL(38,0)) * ((CAST(n_docs AS DECIMAL(38,0)) * 1000000) div df) AS tfidf_e6")
        // two-level top-5 (see topKPerLang / TopKShards)
        .transform(scored => topKPerLang(scored, 5, col("tok"),
          struct(negate(col("tfidf_e6")).as("nt"), col("tok"), col("tf"), col("df"))))
        .selectExpr("lang", "col.tok AS tok", "col.tf AS tf", "col.df AS df",
          "CAST(-col.nt AS STRING) AS tfidf_e6", "CAST(pos + 1 AS BIGINT) AS rank")
        .orderBy(asc("lang"), asc("rank"))
    }),

    // Per-DOCUMENT keywords: each doc's top-3 tokens by doc-tf × language
    // idf — the doc-level twin of text_tfidf_top_terms (which ranks at
    // corpus level), i.e. the tag/routing signal a retrieval or
    // clustering stage attaches per document. One exploded census to
    // (doc, lang, tok, tf); df re-aggregates FROM that census (each row
    // is one distinct (doc, tok), so a count is the doc frequency — no
    // second corpus scan); idf attaches by a vocabulary-keyed equi-join
    // (vocab-sized, deliberately NOT broadcast); the rank window
    // partitions by doc_id — million-fold parallel, each partition the
    // size of one doc's vocabulary. Per-doc tf is bounded by doc length,
    // but the idf factor grows linearly with n_docs (n_docs·10⁶ for a
    // hapax ≈ 10¹⁷ at 10¹¹ docs), so the product rides DECIMAL(38,0) and
    // emits as STRING digits — the same overflow class and the same fix
    // as the corpus-level text_tfidf_top_terms above.
    "text_doc_keywords" -> ((s, d) => {
      val doctf = docs(s, d)
        .select(col("doc_id"), col("lang"), explode(expr(tokensSpark("text"))).as("tok"))
        .groupBy(col("doc_id"), col("lang"), col("tok"))
        .agg(count(lit(1)).as("tf"))
        .transform(CacheScope.persist)
      val df = doctf.groupBy(col("lang"), col("tok"))
        .agg(count(lit(1)).as("df"))
      val nd = docs(s, d).groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
      doctf.join(df, Seq("lang", "tok"))
        .join(broadcast(nd), Seq("lang"))
        .selectExpr("doc_id", "tok", "tf", "df",
          "CAST(tf AS DECIMAL(38,0)) * ((CAST(n_docs AS DECIMAL(38,0)) * 1000000) div df) AS score_e6")
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("doc_id"))
            .orderBy(desc("score_e6"), asc("tok"))))
        .filter(col("rank") <= 3)
        .selectExpr("doc_id", "CAST(rank AS BIGINT) AS rank", "tok", "tf",
          "df", "CAST(score_e6 AS STRING) AS score_e6")
        .orderBy(asc("doc_id"), asc("rank"))
    }),

    // Per-document n-gram NOVELTY: the share of a doc's distinct 3-word
    // shingles not seen in any earlier doc (by doc_id order) — the
    // "how much genuinely new text does each document add" signal that
    // drives dedup-aware sampling and curriculum ordering. One distinct-
    // shingle explode; the first-seen census is vocabulary-sized
    // (min(doc_id) per shingle, map-side combined); novelty attaches by
    // a vocabulary-keyed equi-join. Docs under 3 words have no shingles
    // and drop out in both engines identically.
    "text_ngram_novelty" -> ((s, d) => {
      val sh = docs(s, d).selectExpr("doc_id", "lang",
        s"explode(array_distinct(${shingleHashesSpark(wordHashesSpark("text"))})) AS h")
        .transform(CacheScope.persist)
      val first = sh.groupBy(col("h")).agg(min(col("doc_id")).as("first_doc"))
      sh.join(first, Seq("h"))
        .groupBy(col("doc_id"), col("lang"))
        .agg(count(lit(1)).as("n_shingles"),
          sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
        .selectExpr("doc_id", "lang", "n_shingles", "n_novel",
          "(n_novel * 10000) div n_shingles AS novelty_bp")
        .orderBy(asc("doc_id"))
    }),

    // Gopher-style rule gate: the classic pre-training document filter as
    // four integer-exact rules — word count in [10, 10⁵], mean word length
    // in [3.0, 10.0] chars, ≥ 70% of words containing a letter, ≥ 2
    // stopword hits (union stoplist across languages). One narrow scan,
    // per-language fail accounting — the map-side decision a 100 TB
    // curation pass applies before anything expensive runs.
    "text_quality_gate" -> ((s, d) => {
      val allStop = StopLists.flatMap(_._2).distinct.sorted
      docs(s, d)
        .selectExpr("lang", s"${tokensSpark("text")} AS toks")
        .selectExpr("lang",
          "CAST(size(toks) AS BIGINT) AS n_words",
          // mean word length ×10 in pure integer math
          """(aggregate(toks, 0L, (a, t) -> a + length(t)) * 10)
             div greatest(size(toks), 1) AS mean_len_x10""",
          // CAST before the multiply: Spark size() is INT and ANSI mode
          // makes the 32-bit overflow throw on a >2^31/10^4-token doc
          // (DuckDB len() is BIGINT — divergent either way)
          "(CAST(size(filter(toks, t -> t rlike '[a-zA-Z]')) AS BIGINT) * 10000) div greatest(size(toks), 1) AS alpha_bp",
          s"CAST(size(filter(toks, t -> t IN (${allStop.map("'" + _ + "'").mkString(",")}))) AS BIGINT) AS n_stop")
        .selectExpr("lang",
          "CAST(n_words BETWEEN 10 AND 100000 AS INT) AS ok_words",
          "CAST(mean_len_x10 BETWEEN 30 AND 100 AS INT) AS ok_meanlen",
          "CAST(alpha_bp >= 7000 AS INT) AS ok_alpha",
          "CAST(n_stop >= 2 AS INT) AS ok_stop")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(expr("1 - ok_words")).as("n_fail_words"),
          sum(expr("1 - ok_meanlen")).as("n_fail_meanlen"),
          sum(expr("1 - ok_alpha")).as("n_fail_alpha"),
          sum(expr("1 - ok_stop")).as("n_fail_stop"),
          sum(expr("ok_words * ok_meanlen * ok_alpha * ok_stop")).as("n_kept"))
        .orderBy(asc("lang"))
    }),

    // Corpus rollup: per (lang, source) token totals — the reduce side.
    "text_corpus_stats" -> ((s, d) =>
      docs(s, d)
        .selectExpr("lang", "source", "n_chars",
          s"size(${tokensSpark("text")}) AS n_tokens")
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).cast("bigint").as("total_tokens"),
          sum(col("n_chars")).cast("bigint").as("total_chars"),
          max(col("n_tokens")).cast("bigint").as("max_tokens"))
        .orderBy(asc("lang"), asc("source"))),

    // Vocabulary growth curve (Heaps' law): split the corpus into 10
    // deterministic doc_id deciles, count each decile's tokens and the
    // token TYPES first seen there, and report the cumulative
    // type/token ratio — the saturation diagnostic that tells a curation
    // run whether more crawl still buys vocabulary or only repetition
    // (a flattening curve is the data-side signal dedup thresholds act
    // on). Work is census-shaped: one exploded-token pass to (type →
    // first decile) and (decile → token count); everything after is a
    // 10-row grid with a cumulative window. The decile key derives from
    // doc_id against the broadcast max — content-independent and exact
    // on both engines.
    "text_vocab_growth" -> ((s, d) => {
      val toks = docs(s, d)
        .selectExpr("doc_id", s"explode(${tokensSpark("text")}) AS tok")
      val mx = docs(s, d).agg(max(col("doc_id")).as("max_doc"))
      // persisted: BOTH aggregations below (by-token first-decile and
      // by-decile token count) consume this relation — unshared, each
      // would re-read and re-tokenize the whole corpus
      val b = CacheScope.persist(toks.crossJoin(broadcast(mx))
        .selectExpr("tok", "(doc_id * 10) div (max_doc + 1) AS decile"))
      val newTypes = b.groupBy(col("tok"))
        .agg(min(col("decile")).as("decile"))
        .groupBy(col("decile")).agg(count(lit(1)).as("new_types"))
      val tokCount = b.groupBy(col("decile")).agg(count(lit(1)).as("n_tokens"))
      val w = Window.orderBy(asc("decile"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tokCount.join(newTypes, Seq("decile"), "left")
        .selectExpr("decile", "n_tokens", "ifnull(new_types, 0L) AS new_types")
        .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
        .withColumn("cum_types", sum(col("new_types")).over(w))
        .selectExpr("decile", "n_tokens", "new_types", "cum_tokens", "cum_types",
          "(cum_types * 10000) div cum_tokens AS ttr_bp")
        .orderBy(asc("decile"))
    }),

    // Code-switch / mixed-language detector: a doc whose SECOND-best
    // stoplist score is at least half its best (and ≥ 2 absolute hits)
    // carries two languages' function words — the docs a single-label
    // langid mislabels and a monolingual filter should route to review.
    // Census per labeled language: n_docs, n_switched, switch_bp. Same
    // stoplist scores as text_langid (shared literal lists); the top-2 of
    // the 5 scores comes from one 5-element array sort — constant work
    // per row, pure map-side scan + grid census.
    "text_code_switch" -> ((s, d) =>
      docs(s, d)
        .selectExpr("lang",
          s"CAST(CASE WHEN ${codeSwitchedSpark(tokensSpark("text"))} " +
            "THEN 1 ELSE 0 END AS BIGINT) AS switched")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("switched")).as("n_switched"))
        .selectExpr("lang", "n_docs", "n_switched",
          "(n_switched * 10000) div n_docs AS switch_bp")
        .orderBy(asc("lang"))),

    // Out-of-vocabulary census per language against the top-16 unigram
    // vocabulary — the SentencePiece "character coverage" analogue at word
    // granularity: what fraction of token OCCURRENCES (and of distinct
    // TYPES) would a 16-entry per-language vocab leave unencodable? (16,
    // not a production 32k: the synthetic corpus has ~31 types/lang, and
    // the budget must bind for the census to carry signal.) The
    // operational knob for vocab sizing before a tokenizer train. Vocab
    // membership is (freq desc, token asc)-ranked — fully deterministic.
    // Scale: one map-side-combined (lang, token) census; the rank window
    // runs on the vocabulary-sized census (WindowGroupLimit), never the
    // corpus; output is |langs| rows.
    "text_oov_rate" -> ((s, d) => {
      val freq = docs(s, d)
        .selectExpr("lang", s"explode(${tokensSpark("text")}) AS tok")
        .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("f"))
        .transform(CacheScope.persist)
      val ranked = freq.withColumn("rk", row_number().over(
        Window.partitionBy(col("lang")).orderBy(desc("f"), asc("tok"))))
      val inv = ranked.filter(col("rk") <= 16)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("vocab_size"), sum(col("f")).as("in_occ"))
      freq.groupBy(col("lang"))
        .agg(sum(col("f")).as("n_tokens"), count(lit(1)).as("n_types"))
        .join(inv, Seq("lang"))
        .selectExpr("lang", "n_tokens", "n_types", "vocab_size",
          "n_tokens - in_occ AS oov_tokens",
          "((n_tokens - in_occ) * 10000) div n_tokens AS oov_bp",
          "n_types - vocab_size AS oov_types",
          "((n_types - vocab_size) * 10000) div n_types AS type_oov_bp")
        .orderBy(asc("lang"))
    }),

    // Within-source vocabulary drift: L1 distance (bp) between a source's
    // FIRST-half and SECOND-half term-share distributions over the
    // source's top-32 terms — the crawl-drift / pipeline-regression gauge
    // (a source whose early and late halves disagree sharply changed
    // scraper, seed list, or upstream content; 0 = stationary, 2e4 =
    // disjoint). Halves split the per-source doc_id span in two (the
    // text_vocab_growth decile idiom, deterministic); shares are exact bp
    // of each half's token total. Scale: one token scan → (source, half,
    // term) census (map-side combined); ranking and the drift sum run on
    // the vocabulary-sized census; output is |sources| rows.
    "source_vocab_drift" -> ((s, d) => {
      val bounds = docs(s, d).groupBy(col("source"))
        .agg(min(col("doc_id")).as("d0"), max(col("doc_id")).as("d1"),
          count(lit(1)).as("n_docs"))
      // ONE corpus pass straight to the vocabulary-sized census; only the
      // census is persisted. (The previous shape cached the exploded token
      // stream TWICE — corpus-sized materializations, one consumed exactly
      // once — and recounted the stream for the half totals, which are
      // just the census re-aggregated.)
      val census = docs(s, d)
        .selectExpr("source", "doc_id", s"explode(${tokensSpark("text")}) AS tok")
        .join(broadcast(bounds), Seq("source"))
        .selectExpr("source", "tok",
          "((doc_id - d0) * 2) div (d1 - d0 + 1) AS half")
        .groupBy(col("source"), col("half"), col("tok"))
        .agg(count(lit(1)).as("c"))
        .transform(CacheScope.persist)
      val top32 = census.groupBy(col("source"), col("tok"))
        .agg(sum(col("c")).as("f"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("source")).orderBy(desc("f"), asc("tok"))))
        .filter(col("rk") <= 32)
        .select(col("source"), col("tok"))
      val totals = census.groupBy(col("source"), col("half"))
        .agg(sum(col("c")).as("t"))
      val t0 = totals.filter(col("half") === 0)
        .select(col("source"), col("t").as("t1_tokens"))
      val t1 = totals.filter(col("half") === 1)
        .select(col("source"), col("t").as("t2_tokens"))
      val c0 = census.filter(col("half") === 0)
        .select(col("source"), col("tok"), col("c").as("c1"))
      val c1 = census.filter(col("half") === 1)
        .select(col("source"), col("tok"), col("c").as("c2"))
      top32
        .join(c0, Seq("source", "tok"), "left").na.fill(0L, Seq("c1"))
        .join(c1, Seq("source", "tok"), "left").na.fill(0L, Seq("c2"))
        .join(broadcast(t0), Seq("source"))
        .join(broadcast(t1), Seq("source"))
        .selectExpr("source", "t1_tokens", "t2_tokens",
          "abs((c1 * 10000) div t1_tokens - (c2 * 10000) div t2_tokens) AS dterm")
        .groupBy(col("source"), col("t1_tokens"), col("t2_tokens"))
        .agg(sum(col("dterm")).as("drift_bp"))
        .join(broadcast(bounds.select(col("source"), col("n_docs"))), Seq("source"))
        .select(col("source"), col("n_docs"), col("t1_tokens"),
          col("t2_tokens"), col("drift_bp"))
        .orderBy(asc("source"))
    }),

    // Flesch reading-ease readability, integer-exact: words = whitespace
    // tokens, sentences = [.!?]+ runs, syllables ≈ vowel-group runs (the
    // standard heuristic). The score 206.835 − 1.015·W/S − 84.6·Y/W is
    // brought over the common denominator S·W so the milli-score is ONE
    // integer division — no float ever enters, and clamping the numerator
    // at 0 (scores below 0 carry no signal) keeps truncating and flooring
    // division identical across engines. Pure map-side scan + final order,
    // like every per-doc scorer here.
    "text_readability" -> ((s, d) =>
      docs(s, d)
        .selectExpr("doc_id",
          s"CAST(greatest(size(${tokensSpark("text")}), 1) AS BIGINT) AS n_words",
          "CAST(greatest(size(regexp_extract_all(text, '[.!?]+', 0)), 1) AS BIGINT) AS n_sentences",
          "CAST(size(regexp_extract_all(lower(text), '[aeiouy]+', 0)) AS BIGINT) AS n_syllables")
        .selectExpr("doc_id", "n_words", "n_sentences", "n_syllables",
          """greatest(0L, 206835L * n_sentences * n_words
             - 1015L * n_words * n_words
             - 84600L * n_syllables * n_sentences)
             div (n_sentences * n_words) AS flesch_me3""")
        .selectExpr("doc_id", "n_words", "n_sentences", "n_syllables", "flesch_me3",
          """CASE WHEN flesch_me3 >= 90000 THEN 'very_easy'
             WHEN flesch_me3 >= 60000 THEN 'standard'
             WHEN flesch_me3 >= 30000 THEN 'difficult'
             ELSE 'very_confusing' END AS band""")
        .orderBy(asc("doc_id"))),

    // Per-language document-length histogram in decimal-magnitude buckets
    // (digit count of the token length — the integer-exact log10 both
    // engines render identically, the part_revenue_concentration idiom),
    // with per-bucket and cumulative doc shares. The sequence-packing
    // planner reads this to size context windows; the grid after the one
    // map-side-combined groupBy is |langs|·|digit buckets| ≤ a few dozen
    // rows, so the share windows never touch corpus-scale data.
    "doc_length_histogram" -> ((s, d) => {
      val byLang = Window.partitionBy(col("lang"))
      docs(s, d)
        .selectExpr("lang",
          s"CAST(greatest(size(${tokensSpark("text")}), 1) AS BIGINT) AS n_tokens")
        .selectExpr("lang", "n_tokens",
          "CAST(length(CAST(n_tokens AS STRING)) AS BIGINT) AS bucket")
        .groupBy(col("lang"), col("bucket"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tokens"))
        .withColumn("lang_docs", sum(col("n_docs")).over(byLang))
        .withColumn("cum_docs", sum(col("n_docs")).over(
          byLang.orderBy(asc("bucket"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .selectExpr("lang", "bucket",
          "CAST(power(10, bucket - 1) AS BIGINT) AS lo_tokens",
          "CAST(power(10, bucket) AS BIGINT) - 1 AS hi_tokens",
          "n_docs", "tokens",
          "(n_docs * 10000) div lang_docs AS doc_share_bp",
          "(cum_docs * 10000) div lang_docs AS cum_share_bp")
        .orderBy(asc("lang"), asc("bucket"))
    }),

    // Frequency-of-frequencies census (the Zipf/Good-Turing profile): how
    // many distinct token types occur k times, k in decimal-magnitude
    // buckets. Vocabulary pruning and smoothing both read this shape. Two
    // map-side-combined groupBys — corpus → per-(lang, token) tf
    // (vocabulary-sized), then tf digit-bucket census (|langs|·19 rows).
    "text_freq_of_freq" -> ((s, d) =>
      docs(s, d)
        .select(col("lang"), explode(expr(tokensSpark("text"))).as("tok"))
        .groupBy(col("lang"), col("tok"))
        .agg(count(lit(1)).as("tf"))
        .selectExpr("lang", "tf",
          "CAST(length(CAST(tf AS STRING)) AS BIGINT) AS bucket")
        .groupBy(col("lang"), col("bucket"))
        .agg(count(lit(1)).as("n_types"), sum(col("tf")).as("occurrences"))
        .withColumn("vocab", sum(col("n_types")).over(Window.partitionBy(col("lang"))))
        .selectExpr("lang", "bucket",
          "CAST(power(10, bucket - 1) AS BIGINT) AS lo_tf",
          "CAST(power(10, bucket) AS BIGINT) - 1 AS hi_tf",
          "n_types", "occurrences",
          "(n_types * 10000) div vocab AS type_share_bp")
        .orderBy(asc("lang"), asc("bucket")))
  )

  /** The langid scored relation as standalone SQL — shared verbatim by the
    * text_langid oracle and the confusion-grid oracle built over it.
    * UNORDERED: DuckDB does not eliminate an ORDER BY inside a CTE that
    * feeds an aggregate, so the consumer that needs doc order (the
    * standalone text_langid entry) appends it itself. */
  private lazy val langidOracle: String = {
    val toks = tokensDuck("text")
    val langs = StopLists.map(_._1)
    val scoreCols = StopLists.map { case (lang, words) =>
      s"len(list_filter($toks, t -> t IN (${words.map("'" + _ + "'").mkString(",")}))) AS s_$lang"
    }.mkString(", ")
    val pred = langs.map { l =>
      val geAll = langs.map(o => s"s_$l >= s_$o").mkString(" AND ")
      s"WHEN $geAll THEN '$l'"
    }.mkString("CASE ", " ", " ELSE 'und' END")
    s"SELECT doc_id, labeled_lang, ${langs.map(l => s"s_$l").mkString(", ")}, " +
      s"$pred AS pred_lang, " +
      s"CAST($pred = labeled_lang AS INT) AS label_match FROM " +
      s"(SELECT doc_id, lang AS labeled_lang, $scoreCols FROM documents) scored"
  }

  def oracles: Map[String, String] = {
    val toks = tokensDuck("text")
    Map(
      "text_lang_diversity" ->
        (s"WITH tf AS (SELECT lang, term, count(*) AS n FROM " +
          s"(SELECT lang, unnest($toks) AS term FROM documents) _ " +
          "GROUP BY lang, term) " +
          "SELECT lang, count(*)::BIGINT AS vocab, " +
          "CAST(sum(n) AS BIGINT) AS n_tokens, " +
          "CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax, " +
          "(CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) * 1000000) " +
          "// count(*) AS hapax_rate_e6, " +
          "CAST(1000000 - (sum(CAST(n AS HUGEINT) * CAST(n AS HUGEINT)) * 1000000) " +
          "// (CAST(sum(n) AS HUGEINT) * CAST(sum(n) AS HUGEINT)) AS BIGINT) AS simpson_e6 " +
          "FROM tf GROUP BY lang ORDER BY lang"),

      "tokenizer_vocab_overlap" ->
        (s"WITH vocab AS (SELECT DISTINCT lang, term FROM " +
          s"(SELECT lang, unnest($toks) AS term FROM documents) _), " +
          "sizes AS (SELECT lang, count(*)::BIGINT AS v FROM vocab GROUP BY lang), " +
          "shared AS (SELECT a.lang AS lang_a, b.lang AS lang_b, " +
          "count(*)::BIGINT AS shared FROM vocab a JOIN vocab b " +
          "ON a.term = b.term AND a.lang < b.lang GROUP BY 1, 2) " +
          "SELECT x.lang AS lang_a, y.lang AS lang_b, x.v AS vocab_a, " +
          "y.v AS vocab_b, COALESCE(shared, 0) AS shared, " +
          "(COALESCE(shared, 0) * 1000000) // (x.v + y.v - COALESCE(shared, 0)) AS jaccard_e6 " +
          "FROM sizes x JOIN sizes y ON x.lang < y.lang " +
          "LEFT JOIN shared ON shared.lang_a = x.lang AND shared.lang_b = y.lang " +
          "ORDER BY lang_a, lang_b"),

      "text_token_count" ->
        (s"SELECT doc_id, len($toks) AS n_tokens, " +
          s"len(list_distinct($toks)) AS n_uniq_tokens, " +
          "length(text) AS n_chars_measured, " +
          "(length(text) + 3) // 4 AS n_bpe_ish_tokens " +
          "FROM documents ORDER BY doc_id"),
      "text_quality" ->
        (s"SELECT doc_id, len($toks) AS n_tokens, " +
          s"(length(text) * 10000) // greatest(len($toks), 1) AS avg_token_len_bp, " +
          s"(len(list_distinct($toks)) * 10000) // greatest(len($toks), 1) AS ttr_bp, " +
          s"(len(list_filter($toks, t -> t IN (${EnStop.map("'" + _ + "'").mkString(",")}))) * 10000) " +
          s"// greatest(len($toks), 1) AS stopword_bp, " +
          "length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct, " +
          "length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digits " +
          "FROM documents ORDER BY doc_id"),
      "text_langid" -> (langidOracle + " ORDER BY doc_id"),
      // confusion grid embedded over the SAME langid derived table, so the
      // classifier and its evaluation cannot drift
      "text_langid_confusion" ->
        (s"WITH l AS ($langidOracle) " +
          "SELECT labeled_lang, pred_lang, count(*) AS n_docs, " +
          "CAST((count(*) * 10000) // sum(count(*)) OVER (PARTITION BY labeled_lang) AS BIGINT) AS row_share_bp " +
          "FROM l GROUP BY labeled_lang, pred_lang " +
          "ORDER BY labeled_lang, pred_lang"),
      "text_fingerprint" ->
        (s"SELECT doc_id, ${charHashDuck("text")} AS content_hash, " +
          "list_min(list_transform(range(1, greatest((length(text) - 7 + 3) // 4, 1) + 1), " +
          s"i -> ${charHashDuck("substring(text, (i - 1) * 4 + 1, 8)")})) AS window_fingerprint " +
          "FROM documents ORDER BY doc_id"),
      "text_repetition" ->
        (s"WITH base AS (SELECT doc_id, $toks AS toks FROM documents), " +
          "tok AS (SELECT doc_id, unnest(toks) AS tok FROM base), " +
          "tc AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY doc_id, tok), " +
          "tstats AS (SELECT doc_id, max(c) AS top_token_count, " +
          "count(*) AS n_distinct_tokens, CAST(sum(c) AS BIGINT) AS n_tokens " +
          "FROM tc GROUP BY doc_id), " +
          "bge AS (SELECT doc_id, unnest(CASE WHEN len(toks) < 2 THEN [] " +
          "ELSE list_transform(range(1, len(toks)), " +
          "i -> list_extract(toks, i) || ' ' || list_extract(toks, i + 1)) END) AS bg " +
          "FROM base), " +
          "bc AS (SELECT doc_id, bg, count(*) AS c FROM bge GROUP BY doc_id, bg), " +
          "bstats AS (SELECT doc_id, max(c) AS top_bigram_count FROM bc GROUP BY doc_id) " +
          "SELECT t.doc_id, t.n_tokens, t.n_distinct_tokens, t.top_token_count, " +
          "(t.top_token_count * 10000) // greatest(t.n_tokens, 1) AS top_token_bp, " +
          "coalesce(b.top_bigram_count, 0) AS top_bigram_count, " +
          "((t.n_tokens - t.n_distinct_tokens) * 10000) // greatest(t.n_tokens, 1) AS dup_token_bp " +
          "FROM tstats t LEFT JOIN bstats b USING (doc_id) ORDER BY doc_id"),
      "text_top_tokens" ->
        (s"WITH tok AS (SELECT lang, unnest($toks) AS tok FROM documents), " +
          "c AS (SELECT lang, tok, count(*) AS n FROM tok GROUP BY lang, tok), " +
          "r AS (SELECT lang, tok, n, row_number() OVER " +
          "(PARTITION BY lang ORDER BY n DESC, tok ASC) AS rank FROM c) " +
          "SELECT lang, tok, n, rank FROM r WHERE rank <= 5 ORDER BY lang, rank"),

      "text_zipf_fit" ->
        (s"WITH tok AS (SELECT lang, unnest($toks) AS tok FROM documents), " +
          "c AS (SELECT lang, tok, count(*) AS f FROM tok GROUP BY lang, tok), " +
          "r AS (SELECT lang, f, row_number() OVER " +
          "(PARTITION BY lang ORDER BY f DESC, tok ASC) AS rank FROM c), " +
          "b AS (SELECT lang, CAST(length(bin(rank)) - 1 AS BIGINT) AS x, " +
          "CAST(length(bin(f)) - 1 AS BIGINT) AS y FROM r), " +
          "m AS (SELECT lang, count(*) AS n, sum(x) AS sx, sum(y) AS sy, " +
          "sum(x * x) AS sxx, sum(x * y) AS sxy FROM b GROUP BY lang), " +
          "s AS (SELECT lang, CAST(n AS BIGINT) AS n_types, " +
          "CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS num, " +
          "CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS den FROM m) " +
          "SELECT lang, n_types, CAST(CASE WHEN den = 0 THEN NULL " +
          "WHEN num < 0 THEN -(((-num) * 1000000) // den) " +
          "ELSE (num * 1000000) // den END AS BIGINT) AS slope_ppm " +
          "FROM s ORDER BY lang"),

      "text_bigram_lift" ->
        (s"WITH base AS (SELECT lang, $toks AS toks FROM documents), " +
          "bge AS (SELECT lang, list_extract(toks, t.i) AS w1, " +
          "list_extract(toks, t.i + 1) AS w2 " +
          "FROM base, unnest(range(1, len(toks))) AS t(i)), " +
          "ab AS (SELECT lang, w1, w2, count(*) AS n_ab FROM bge GROUP BY lang, w1, w2), " +
          "tot AS (SELECT lang, CAST(sum(n_ab) AS BIGINT) AS n_total FROM ab GROUP BY lang), " +
          "wa AS (SELECT lang, w1, CAST(sum(n_ab) AS BIGINT) AS n_a FROM ab GROUP BY lang, w1), " +
          "wb AS (SELECT lang, w2, CAST(sum(n_ab) AS BIGINT) AS n_b FROM ab GROUP BY lang, w2), " +
          "sc AS (SELECT ab.lang, ab.w1, ab.w2, ab.n_ab, " +
          "(ab.n_ab * t.n_total * 10000) // (wa.n_a * wb.n_b) AS lift_bp " +
          "FROM ab JOIN tot t ON ab.lang = t.lang " +
          "JOIN wa ON ab.lang = wa.lang AND ab.w1 = wa.w1 " +
          "JOIN wb ON ab.lang = wb.lang AND ab.w2 = wb.w2 " +
          "WHERE ab.n_ab >= 5), " +
          "r AS (SELECT lang, w1, w2, n_ab, lift_bp, row_number() OVER " +
          "(PARTITION BY lang ORDER BY lift_bp DESC, n_ab DESC, w1, w2) AS rank FROM sc) " +
          "SELECT lang, w1, w2, n_ab, lift_bp, rank FROM r WHERE rank <= 20 " +
          "ORDER BY lang, rank"),
      "text_fluency" ->
        (s"WITH base AS (SELECT doc_id, lang, $toks AS toks FROM documents), " +
          "bg AS (SELECT doc_id, lang, " +
          "list_extract(toks, t.i) || ' ' || list_extract(toks, t.i + 1) AS bg " +
          "FROM base, unnest(range(1, len(toks))) AS t(i) WHERE len(toks) >= 2), " +
          "counts AS (SELECT lang, bg, count(*) AS n_bg FROM bg GROUP BY lang, bg) " +
          "SELECT doc_id, count(*) AS n_bigrams, " +
          "(CAST(sum(n_bg) AS BIGINT) * 10000) // count(*) AS avg_bigram_freq_e4 " +
          "FROM bg JOIN counts USING (lang, bg) GROUP BY doc_id ORDER BY doc_id"),
      "text_doc_keywords" ->
        (s"WITH tok AS (SELECT doc_id, lang, unnest($toks) AS tok FROM documents), " +
          "doctf AS (SELECT doc_id, lang, tok, count(*) AS tf FROM tok GROUP BY 1, 2, 3), " +
          "df AS (SELECT lang, tok, count(*) AS df FROM doctf GROUP BY lang, tok), " +
          "nd AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang), " +
          // tf·idf in HUGEINT (the BIGINT product overflows for a high-tf
          // hapax at corpus scale), emitted as VARCHAR integer digits —
          // matches the Spark side's DECIMAL(38,0)→STRING emission
          "sc AS (SELECT t.doc_id, t.tok, t.tf, df.df, " +
          "CAST(t.tf AS HUGEINT) * ((CAST(nd.n_docs AS HUGEINT) * 1000000) // df.df) AS score_e6 " +
          "FROM doctf t JOIN df ON t.lang = df.lang AND t.tok = df.tok " +
          "JOIN nd ON t.lang = nd.lang), " +
          "rk AS (SELECT doc_id, tok, tf, df, score_e6, " +
          "row_number() OVER (PARTITION BY doc_id ORDER BY score_e6 DESC, tok) AS rank FROM sc) " +
          "SELECT doc_id, rank, tok, tf, df, CAST(score_e6 AS VARCHAR) AS score_e6 " +
          "FROM rk WHERE rank <= 3 ORDER BY doc_id, rank"),
      "text_tfidf_top_terms" ->
        (s"WITH tok AS (SELECT lang, doc_id, unnest($toks) AS tok FROM documents), " +
          "stats AS (SELECT lang, tok, count(*) AS tf, count(DISTINCT doc_id) AS df " +
          "FROM tok GROUP BY lang, tok), " +
          "nd AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang), " +
          // HUGEINT product + VARCHAR emission: see text_doc_keywords
          "sc AS (SELECT s.lang, s.tok, s.tf, s.df, " +
          "CAST(s.tf AS HUGEINT) * ((CAST(nd.n_docs AS HUGEINT) * 1000000) // s.df) AS tfidf_e6 " +
          "FROM stats s JOIN nd ON s.lang = nd.lang), " +
          "r AS (SELECT lang, tok, tf, df, tfidf_e6, row_number() OVER " +
          "(PARTITION BY lang ORDER BY tfidf_e6 DESC, tok ASC) AS rank FROM sc) " +
          "SELECT lang, tok, tf, df, CAST(tfidf_e6 AS VARCHAR) AS tfidf_e6, rank " +
          "FROM r WHERE rank <= 5 ORDER BY lang, rank"),
      "text_ngram_novelty" ->
        (s"WITH sh AS (SELECT doc_id, lang, " +
          s"unnest(list_distinct(${shingleHashesDuck(wordHashesDuck(toks))})) AS h FROM documents), " +
          "f AS (SELECT h, min(doc_id) AS first_doc FROM sh GROUP BY h) " +
          "SELECT doc_id, lang, count(*) AS n_shingles, " +
          "CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel, " +
          "(CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT) * 10000) " +
          "// count(*) AS novelty_bp " +
          "FROM sh JOIN f USING (h) GROUP BY doc_id, lang ORDER BY doc_id"),
      "text_quality_gate" -> {
        val allStop = StopLists.flatMap(_._2).distinct.sorted
        s"WITH base AS (SELECT lang, $toks AS toks FROM documents), " +
          "m AS (SELECT lang, CAST(len(toks) AS BIGINT) AS n_words, " +
          "(list_reduce(list_prepend(0::BIGINT, list_transform(toks, t -> length(t)::BIGINT)), " +
          "(a, x) -> a + x) * 10) // greatest(len(toks), 1) AS mean_len_x10, " +
          "(len(list_filter(toks, t -> regexp_matches(t, '[a-zA-Z]'))) * 10000) " +
          "// greatest(len(toks), 1) AS alpha_bp, " +
          s"CAST(len(list_filter(toks, t -> t IN (${allStop.map("'" + _ + "'").mkString(",")}))) AS BIGINT) AS n_stop " +
          "FROM base), " +
          "f AS (SELECT lang, " +
          "CAST(n_words BETWEEN 10 AND 100000 AS INT) AS ok_words, " +
          "CAST(mean_len_x10 BETWEEN 30 AND 100 AS INT) AS ok_meanlen, " +
          "CAST(alpha_bp >= 7000 AS INT) AS ok_alpha, " +
          "CAST(n_stop >= 2 AS INT) AS ok_stop FROM m) " +
          "SELECT lang, count(*) AS n_docs, " +
          "CAST(sum(1 - ok_words) AS BIGINT) AS n_fail_words, " +
          "CAST(sum(1 - ok_meanlen) AS BIGINT) AS n_fail_meanlen, " +
          "CAST(sum(1 - ok_alpha) AS BIGINT) AS n_fail_alpha, " +
          "CAST(sum(1 - ok_stop) AS BIGINT) AS n_fail_stop, " +
          "CAST(sum(ok_words * ok_meanlen * ok_alpha * ok_stop) AS BIGINT) AS n_kept " +
          "FROM f GROUP BY lang ORDER BY lang"
      },
      "text_corpus_stats" ->
        (s"SELECT lang, source, count(*) AS n_docs, " +
          s"CAST(sum(len($toks)) AS BIGINT) AS total_tokens, " +
          "CAST(sum(n_chars) AS BIGINT) AS total_chars, max(len(" + toks + ")) AS max_tokens " +
          "FROM documents GROUP BY lang, source ORDER BY lang, source"),
      "text_vocab_growth" ->
        (s"WITH tk AS (SELECT doc_id, unnest($toks) AS tok FROM documents), " +
          "mx AS (SELECT max(doc_id) AS max_doc FROM documents), " +
          "b AS (SELECT tok, (doc_id * 10) // (max_doc + 1) AS decile FROM tk CROSS JOIN mx), " +
          "nt AS (SELECT decile, count(*) AS new_types FROM " +
          "(SELECT tok, min(decile) AS decile FROM b GROUP BY tok) GROUP BY decile), " +
          "tc AS (SELECT decile, count(*) AS n_tokens FROM b GROUP BY decile), " +
          "g AS (SELECT tc.decile, n_tokens, COALESCE(new_types, 0) AS new_types " +
          "FROM tc LEFT JOIN nt ON tc.decile = nt.decile), " +
          "c AS (SELECT decile, n_tokens, new_types, " +
          "CAST(sum(n_tokens) OVER (ORDER BY decile) AS BIGINT) AS cum_tokens, " +
          "CAST(sum(new_types) OVER (ORDER BY decile) AS BIGINT) AS cum_types FROM g) " +
          "SELECT decile, n_tokens, new_types, cum_tokens, cum_types, " +
          "(cum_types * 10000) // cum_tokens AS ttr_bp FROM c ORDER BY decile"),

      "text_code_switch" ->
        (s"WITH f AS (SELECT lang, CAST(CASE WHEN ${codeSwitchedDuck(toks)} " +
          "THEN 1 ELSE 0 END AS BIGINT) AS switched FROM documents) " +
          "SELECT lang, count(*)::BIGINT AS n_docs, CAST(sum(switched) AS BIGINT) AS n_switched, " +
          "(CAST(sum(switched) AS BIGINT) * 10000) // count(*) AS switch_bp " +
          "FROM f GROUP BY lang ORDER BY lang"),

      "text_oov_rate" ->
        (s"WITH f AS (SELECT lang, tok, count(*)::BIGINT AS f FROM " +
          s"(SELECT lang, unnest($toks) AS tok FROM documents) _ GROUP BY lang, tok), " +
          "r AS (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY f DESC, tok) AS rk FROM f), " +
          "iv AS (SELECT lang, count(*)::BIGINT AS vocab_size, CAST(sum(f) AS BIGINT) AS in_occ " +
          "FROM r WHERE rk <= 16 GROUP BY lang), " +
          "tot AS (SELECT lang, CAST(sum(f) AS BIGINT) AS n_tokens, count(*)::BIGINT AS n_types " +
          "FROM f GROUP BY lang) " +
          "SELECT lang, n_tokens, n_types, vocab_size, " +
          "n_tokens - in_occ AS oov_tokens, " +
          "((n_tokens - in_occ) * 10000) // n_tokens AS oov_bp, " +
          "n_types - vocab_size AS oov_types, " +
          "((n_types - vocab_size) * 10000) // n_types AS type_oov_bp " +
          "FROM tot JOIN iv USING (lang) ORDER BY lang"),

      "source_vocab_drift" ->
        (s"WITH tk AS (SELECT source, doc_id, unnest($toks) AS tok FROM documents), " +
          "bd AS (SELECT source, min(doc_id) AS d0, max(doc_id) AS d1, " +
          "count(*)::BIGINT AS n_docs FROM documents GROUP BY source), " +
          "th AS (SELECT tk.source, tok, ((doc_id - d0) * 2) // (d1 - d0 + 1) AS half " +
          "FROM tk JOIN bd ON bd.source = tk.source), " +
          "cen AS (SELECT source, half, tok, count(*)::BIGINT AS c FROM th GROUP BY 1, 2, 3), " +
          "top32 AS (SELECT source, tok FROM (SELECT source, tok, " +
          "row_number() OVER (PARTITION BY source ORDER BY sum(c) DESC, tok) AS rk " +
          "FROM cen GROUP BY source, tok) _ WHERE rk <= 32), " +
          "tot AS (SELECT source, half, count(*)::BIGINT AS t FROM th GROUP BY 1, 2), " +
          "j AS (SELECT t32.source, t32.tok, " +
          "COALESCE(c0.c, CAST(0 AS BIGINT)) AS c1, COALESCE(c1h.c, CAST(0 AS BIGINT)) AS c2 " +
          "FROM top32 t32 " +
          "LEFT JOIN cen c0 ON c0.source = t32.source AND c0.tok = t32.tok AND c0.half = 0 " +
          "LEFT JOIN cen c1h ON c1h.source = t32.source AND c1h.tok = t32.tok AND c1h.half = 1), " +
          "tt AS (SELECT j.source, j.tok, " +
          "abs((j.c1 * 10000) // t0.t - (j.c2 * 10000) // t1.t) AS dterm, " +
          "t0.t AS t1_tokens, t1.t AS t2_tokens FROM j " +
          "JOIN tot t0 ON t0.source = j.source AND t0.half = 0 " +
          "JOIN tot t1 ON t1.source = j.source AND t1.half = 1) " +
          "SELECT tt.source, bd.n_docs, tt.t1_tokens, tt.t2_tokens, " +
          "CAST(sum(dterm) AS BIGINT) AS drift_bp " +
          "FROM tt JOIN bd ON bd.source = tt.source " +
          "GROUP BY tt.source, bd.n_docs, tt.t1_tokens, tt.t2_tokens " +
          "ORDER BY tt.source"),

      "text_readability" ->
        (s"WITH c AS (SELECT doc_id, " +
          s"CAST(greatest(len($toks), 1) AS BIGINT) AS n_words, " +
          "CAST(greatest(len(regexp_extract_all(text, '[.!?]+', 0)), 1) AS BIGINT) AS n_sentences, " +
          "CAST(len(regexp_extract_all(lower(text), '[aeiouy]+', 0)) AS BIGINT) AS n_syllables " +
          "FROM documents), " +
          "f AS (SELECT doc_id, n_words, n_sentences, n_syllables, " +
          "greatest(CAST(0 AS BIGINT), 206835 * n_sentences * n_words " +
          "- 1015 * n_words * n_words " +
          "- 84600 * n_syllables * n_sentences) " +
          "// (n_sentences * n_words) AS flesch_me3 FROM c) " +
          "SELECT doc_id, n_words, n_sentences, n_syllables, flesch_me3, " +
          "CASE WHEN flesch_me3 >= 90000 THEN 'very_easy' " +
          "WHEN flesch_me3 >= 60000 THEN 'standard' " +
          "WHEN flesch_me3 >= 30000 THEN 'difficult' " +
          "ELSE 'very_confusing' END AS band " +
          "FROM f ORDER BY doc_id"),
      "doc_length_histogram" ->
        (s"WITH t AS (SELECT lang, CAST(greatest(len($toks), 1) AS BIGINT) AS n_tokens FROM documents), " +
          "b AS (SELECT lang, n_tokens, CAST(length(CAST(n_tokens AS VARCHAR)) AS BIGINT) AS bucket FROM t), " +
          "g AS (SELECT lang, bucket, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS tokens " +
          "FROM b GROUP BY lang, bucket), " +
          "w AS (SELECT *, CAST(sum(n_docs) OVER (PARTITION BY lang) AS BIGINT) AS lang_docs, " +
          "CAST(sum(n_docs) OVER (PARTITION BY lang ORDER BY bucket " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_docs FROM g) " +
          "SELECT lang, bucket, CAST(power(10, bucket - 1) AS BIGINT) AS lo_tokens, " +
          "CAST(power(10, bucket) AS BIGINT) - 1 AS hi_tokens, n_docs, tokens, " +
          "(n_docs * 10000) // lang_docs AS doc_share_bp, " +
          "(cum_docs * 10000) // lang_docs AS cum_share_bp " +
          "FROM w ORDER BY lang, bucket"),
      "text_freq_of_freq" ->
        (s"WITH tok AS (SELECT lang, unnest($toks) AS tok FROM documents), " +
          "tf AS (SELECT lang, tok, count(*) AS tf FROM tok GROUP BY lang, tok), " +
          "b AS (SELECT lang, tf, CAST(length(CAST(tf AS VARCHAR)) AS BIGINT) AS bucket FROM tf), " +
          "g AS (SELECT lang, bucket, count(*) AS n_types, CAST(sum(tf) AS BIGINT) AS occurrences " +
          "FROM b GROUP BY lang, bucket), " +
          "w AS (SELECT *, CAST(sum(n_types) OVER (PARTITION BY lang) AS BIGINT) AS vocab FROM g) " +
          "SELECT lang, bucket, CAST(power(10, bucket - 1) AS BIGINT) AS lo_tf, " +
          "CAST(power(10, bucket) AS BIGINT) - 1 AS hi_tf, n_types, occurrences, " +
          "(n_types * 10000) // vocab AS type_share_bp " +
          "FROM w ORDER BY lang, bucket")
    )
  }
}
