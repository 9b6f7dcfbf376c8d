package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.CrossHash._

/** Tokenizer-pipeline operators over `documents`: fixed-window document
  * chunking (the pre-embedding / context-window split every RAG and
  * pre-training pipeline runs before anything vectorized) and BPE merge
  * candidate statistics (the pair-counting step of tokenizer induction).
  * Reference scope: factstore stores and scans opaque payloads
  * (`Fact.kt:21-38`); chunking/tokenization is what its users run on those
  * payloads before model training, so the engine ships them as first-class
  * operators alongside the dedup/quality family.
  *
  * Determinism contract: chunk boundaries are pure integer char arithmetic
  * (both engines substring by code point), chunk identity is the shared
  * polynomial [[CrossHash]] char-fold, counts are BIGINT, and every top-k
  * pins its tiebreak (count desc, key asc).
  *
  * Scale (100 TB):
  *   - `doc_chunks` is a narrow scan + generate — zero shuffles except the
  *     oracle's final order; chunk rows scale linearly with corpus bytes and
  *     never concentrate (a doc's chunks stay in its input partition).
  *   - `bpe_encode_census` re-derives the trained vocabulary and encodes
  *     the corpus against it at DISTINCT-(lang, token) granularity — the
  *     per-language compression audit of the learned merge table; repeated
  *     tokens cost one census row, so encoding cost tracks vocabulary, not
  *     corpus bytes.
  *   - `bpe_pair_stats` aggregates the corpus to its VOCABULARY first (one
  *     map-side-combined groupBy — the only corpus-sized pass), then explodes
  *     character pairs from vocab rows only: pair counting costs
  *     O(vocab · avg token length), independent of how often each token
  *     repeats across 100 TB. The final top-20 is TakeOrderedAndProject
  *     (per-partition heads + driver merge), never a global sort.
  */
object Tokenize {

  private def docs(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.TextHashFunctions.register(spark) // codegen'd char_hash
    spark.read.parquet(s"$dir/documents.parquet")
  }

  /** Unrolled BPE training rounds for `bpe_train_merges`. */
  val BpeRounds = 3

  /** One exact BPE merge round on a vocab relation (tok, freq, syms):
    * global best adjacent pair by weighted count (ties: pair asc), then
    * greedy LEFT-TO-RIGHT non-overlapping application — the textbook
    * trainer semantics, done relationally. Overlap runs (e.g. "aaa" under
    * (a,a)) are resolved by run-parity: match positions sharing a
    * `pos − index` group are a consecutive run, and every other member
    * starting from the first is applied. Returns (best-pair 1-row
    * relation, merged vocab). Everything here is vocabulary-sized — the
    * corpus was collapsed to (tok, freq) before round 1. */
  private def bpeRound(v: DataFrame): (DataFrame, DataFrame) = {
    val best = v.filter(expr("size(syms) >= 2"))
      .selectExpr("freq",
        """explode(transform(sequence(1, size(syms) - 1),
           i -> struct(element_at(syms, i) AS a, element_at(syms, i + 1) AS b))) AS p""")
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("pair_weight"))
      .orderBy(desc("pair_weight"), asc("a"), asc("b")).limit(1)
    val applied = v.crossJoin(broadcast(best))
      .selectExpr("tok", "freq", "syms",
        """CASE WHEN size(syms) >= 2 THEN
             filter(sequence(1, size(syms) - 1),
               i -> element_at(syms, i) = a AND element_at(syms, i + 1) = b)
           ELSE array() END AS mpos""")
      // pos − 0-based-index is constant within a consecutive match run
      .selectExpr("tok", "freq", "syms", "mpos",
        "transform(mpos, (x, i) -> x - i) AS mgrp")
      // keep every other member of each run, starting at its first
      .selectExpr("tok", "freq", "syms",
        """filter(mpos, (x, k) ->
           ((k - (array_position(mgrp, element_at(mgrp, k + 1)) - 1)) % 2) = 0) AS sel""")
      .selectExpr("tok", "freq",
        """filter(transform(sequence(1, size(syms)), p ->
             CASE WHEN array_contains(sel, p)
                    THEN concat(element_at(syms, p), element_at(syms, p + 1))
                  WHEN array_contains(sel, p - 1) THEN CAST(NULL AS STRING)
                  ELSE element_at(syms, p) END),
           x -> x IS NOT NULL) AS syms""")
    (best, applied)
  }

  /** Chunk geometry: 256-char windows every 192 chars (64-char overlap so a
    * sentence cut by one boundary is whole in the neighbor — the standard
    * retrieval-chunking discipline). A doc of length L yields
    * ((L-1) div Stride) + 1 chunks; the last may be short. */
  val ChunkChars = 256
  val Stride = 192

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Fixed-window chunking with overlap: one generated row per chunk with
    // its position, measured length, token count, and content hash — the
    // relation an embedding or packing stage consumes. Pure map-side
    // generate; the chunk text itself stays out of the output (hash
    // identity only) to keep the result narrow.
    "doc_chunks" -> ((s, d) =>
      docs(s, d)
        .selectExpr("doc_id", "CAST(length(text) AS BIGINT) AS doc_len",
          s"""explode(transform(
               sequence(0, CAST((greatest(length(text), 1) - 1) div $Stride AS INT)),
               i -> struct(i AS idx, substring(text, i * $Stride + 1, $ChunkChars) AS chunk))) AS c""")
        .selectExpr("doc_id", "doc_len",
          "CAST(c.idx AS BIGINT) AS chunk_idx",
          s"CAST(c.idx * $Stride + 1 AS BIGINT) AS start_pos",
          "CAST(length(c.chunk) AS BIGINT) AS chunk_len",
          s"CAST(size(${tokensSpark("c.chunk")}) AS BIGINT) AS n_tokens",
          s"${charHashSpark("c.chunk")} AS chunk_hash")
        .orderBy(asc("doc_id"), asc("chunk_idx"))),

    // BPE merge candidates: adjacent-character-pair counts weighted by word
    // frequency — the argmax of n_occ is the first merge a BPE trainer
    // performs. Corpus → vocab (the one big aggregate), vocab → pairs
    // (explode over vocab rows only), top-20 by occurrences with types
    // (distinct words containing the pair) reported alongside.
    "bpe_pair_stats" -> ((s, d) =>
      docs(s, d)
        .select(explode(expr(tokensSpark("text"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
        .filter(expr("length(tok) >= 2"))
        .selectExpr("tok", "freq",
          "explode(transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))) AS pair")
        .groupBy(col("pair"))
        .agg(sum(col("freq")).as("n_occ"), countDistinct(col("tok")).as("n_types"))
        .orderBy(desc("n_occ"), asc("pair")).limit(20)),

    // BPE TRAINING, not just pair stats: BpeRounds exact merge rounds
    // (argmax pair → greedy non-overlapping application → recount),
    // unrolled. Output is the learned merge table with the corpus-wide
    // symbol count before/after each round — the compression trajectory a
    // tokenizer build monitors. The only corpus-scale step is the initial
    // (tok, freq) collapse; every round runs on the vocabulary, so 100 TB
    // of repeated text trains at vocab cost (the bpe_pair_stats argument,
    // iterated). Each round's vocab is persisted — the next round's pair
    // census AND the symbol counters share it.
    "bpe_train_merges" -> ((s, d) => {
      var v = CacheScope.persist(docs(s, d)
        .select(explode(expr(tokensSpark("text"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
        .selectExpr("tok", "freq", "filter(split(tok, ''), x -> x != '') AS syms"))
      val rows = (1 to BpeRounds).map { r =>
        val (best, applied) = bpeRound(v)
        val before = v.agg(sum(expr("freq * size(syms)")).as("sb"))
        val nv = CacheScope.persist(applied)
        val after = nv.agg(sum(expr("freq * size(syms)")).as("sa"))
        v = nv
        best.crossJoin(broadcast(before)).crossJoin(broadcast(after))
          .selectExpr(s"CAST($r AS BIGINT) AS round", "a AS sym_a", "b AS sym_b",
            "concat(a, b) AS merged", "pair_weight",
            "CAST(sb AS BIGINT) AS symbols_before", "CAST(sa AS BIGINT) AS symbols_after")
      }
      rows.reduce(_.union(_)).orderBy(asc("round"))
    }),

    // ENCODING under the learned tokenizer: re-run the BpeRounds merge
    // rounds to their final vocabulary, then measure what the trained
    // merges buy per language — token occurrences, distinct vocabulary,
    // symbols before (characters) and after the merges, and the exact
    // compression ratio in basis points. This is the apply-side of
    // bpe_train_merges: a tokenizer build trains globally and then audits
    // compression per language slice to catch a merge table that only
    // serves the dominant language. ONE corpus-scale pass (the (lang,
    // tok) census); the global vocab folds from that census, every merge
    // round is vocabulary-sized, and the encode itself is a vocab⨝census
    // join at distinct-token granularity — repeated tokens cost one row,
    // so 100 TB of repeated text encodes at vocab cost.
    "bpe_encode_census" -> ((s, d) => {
      val lc = CacheScope.persist(docs(s, d)
        .select(col("lang"), explode(expr(tokensSpark("text"))).as("tok"))
        .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("freq")))
      var v = CacheScope.persist(lc
        .groupBy(col("tok")).agg(sum(col("freq")).as("freq"))
        .selectExpr("tok", "freq", "filter(split(tok, ''), x -> x != '') AS syms"))
      for (_ <- 1 to BpeRounds) v = CacheScope.persist(bpeRound(v)._2)
      lc.join(v.selectExpr("tok", "CAST(size(syms) AS BIGINT) AS n_syms"), Seq("tok"))
        .groupBy(col("lang"))
        .agg(sum(col("freq")).as("n_token_occ"),
          count(lit(1)).as("vocab_size"),
          sum(expr("freq * length(tok)")).as("symbols_before"),
          sum(expr("freq * n_syms")).as("symbols_after"))
        .selectExpr("lang", "n_token_occ", "vocab_size",
          "symbols_before", "symbols_after",
          "(symbols_after * 10000) div symbols_before AS compression_bp")
        .orderBy(asc("lang"))
    }),

    // Tokenizer FERTILITY sliced by word length: occurrence-weighted BPE
    // tokens per whitespace word (the standard multilingual-tokenizer
    // equity metric — a merge table trained on the dominant language
    // shows fertility climbing with word length everywhere else) and
    // chars per emitted BPE token, per (language, word-length bucket,
    // capped at 10+). The lang-level encode census can't recover this
    // slice: fertility hides inside its symbols_after rollup. Same scale
    // shape as bpe_encode_census — ONE corpus pass to the (lang, tok)
    // census, vocabulary-sized merge rounds, vocab⨝census encode; the
    // output is langs × 10 buckets. Weighted sums stay BIGINT (corpus
    // token occurrences × 10⁴ — the encode census's own bound).
    "tokenizer_fertility" -> ((s, d) => {
      val lc = CacheScope.persist(docs(s, d)
        .select(col("lang"), explode(expr(tokensSpark("text"))).as("tok"))
        .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("freq")))
      var v = CacheScope.persist(lc
        .groupBy(col("tok")).agg(sum(col("freq")).as("freq"))
        .selectExpr("tok", "freq", "filter(split(tok, ''), x -> x != '') AS syms"))
      for (_ <- 1 to BpeRounds) v = CacheScope.persist(bpeRound(v)._2)
      lc.join(v.selectExpr("tok", "CAST(size(syms) AS BIGINT) AS n_syms"), Seq("tok"))
        .selectExpr("lang",
          "least(CAST(length(tok) AS BIGINT), CAST(10 AS BIGINT)) AS word_len",
          "freq", "n_syms", "CAST(length(tok) AS BIGINT) AS chars")
        .groupBy(col("lang"), col("word_len"))
        .agg(count(lit(1)).as("n_types"),
          sum(col("freq")).as("n_occ"),
          sum(expr("freq * n_syms")).as("tok_occ"),
          sum(expr("freq * chars")).as("char_occ"))
        .selectExpr("lang", "word_len", "n_types", "n_occ",
          "(tok_occ * 10000) div n_occ AS fertility_bp",
          "(char_occ * 10000) div tok_occ AS chars_per_token_bp")
        .orderBy(asc("lang"), asc("word_len"))
    })
  )

  def oracles: Map[String, String] = {
    val toks = tokensDuck("chunk")
    Map(
      "doc_chunks" ->
        (s"WITH g AS (SELECT doc_id, length(text) AS doc_len, t.i AS chunk_idx, " +
          s"substring(text, (t.i * $Stride + 1)::INT, $ChunkChars) AS chunk " +
          s"FROM documents, unnest(range(0, (greatest(length(text), 1) - 1) // $Stride + 1)) AS t(i)) " +
          "SELECT doc_id, doc_len, chunk_idx, " +
          s"chunk_idx * $Stride + 1 AS start_pos, " +
          "length(chunk) AS chunk_len, " +
          s"len($toks) AS n_tokens, " +
          s"${charHashDuck("chunk")} AS chunk_hash " +
          "FROM g ORDER BY doc_id, chunk_idx"),

      "bpe_pair_stats" ->
        (s"WITH tok AS (SELECT unnest(${tokensDuck("text")}) AS tok FROM documents), " +
          "v AS (SELECT tok, count(*) AS freq FROM tok GROUP BY tok), " +
          "p AS (SELECT substring(v.tok, t.i::INT, 2) AS pair, v.freq, v.tok " +
          "FROM v, unnest(range(1, length(v.tok))) AS t(i) WHERE length(v.tok) >= 2) " +
          "SELECT pair, CAST(sum(freq) AS BIGINT) AS n_occ, " +
          "count(DISTINCT tok) AS n_types " +
          "FROM p GROUP BY pair ORDER BY n_occ DESC, pair LIMIT 20"),

      "bpe_train_merges" -> bpeTrainOracle,

      // the trained-vocab CTE chain, then encode = census ⨝ final vocab
      "bpe_encode_census" ->
        (s"WITH $bpeVocabChain, " +
          s"lt AS (SELECT lang, unnest(${tokensDuck("text")}) AS tok FROM documents), " +
          "lc AS MATERIALIZED (SELECT lang, tok, count(*) AS freq FROM lt GROUP BY lang, tok) " +
          "SELECT lang, CAST(sum(lc.freq) AS BIGINT) AS n_token_occ, " +
          "count(*) AS vocab_size, " +
          "CAST(sum(lc.freq * length(lc.tok)) AS BIGINT) AS symbols_before, " +
          s"CAST(sum(lc.freq * len(v$BpeRounds.syms)) AS BIGINT) AS symbols_after, " +
          s"(CAST(sum(lc.freq * len(v$BpeRounds.syms)) AS BIGINT) * 10000) // " +
          "CAST(sum(lc.freq * length(lc.tok)) AS BIGINT) AS compression_bp " +
          s"FROM lc JOIN v$BpeRounds ON v$BpeRounds.tok = lc.tok " +
          "GROUP BY lang ORDER BY lang"),

      "tokenizer_fertility" ->
        (s"WITH $bpeVocabChain, " +
          s"lt AS (SELECT lang, unnest(${tokensDuck("text")}) AS tok FROM documents), " +
          "lc AS MATERIALIZED (SELECT lang, tok, count(*) AS freq FROM lt GROUP BY lang, tok), " +
          "j AS (SELECT lc.lang, " +
          "least(CAST(length(lc.tok) AS BIGINT), CAST(10 AS BIGINT)) AS word_len, " +
          s"lc.freq, CAST(len(v$BpeRounds.syms) AS BIGINT) AS n_syms, " +
          "CAST(length(lc.tok) AS BIGINT) AS chars " +
          s"FROM lc JOIN v$BpeRounds ON v$BpeRounds.tok = lc.tok) " +
          "SELECT lang, word_len, count(*) AS n_types, " +
          "CAST(sum(freq) AS BIGINT) AS n_occ, " +
          "(CAST(sum(freq * n_syms) AS BIGINT) * 10000) // CAST(sum(freq) AS BIGINT) AS fertility_bp, " +
          "(CAST(sum(freq * chars) AS BIGINT) * 10000) // CAST(sum(freq * n_syms) AS BIGINT) AS chars_per_token_bp " +
          "FROM j GROUP BY lang, word_len ORDER BY lang, word_len")
    )
  }

  /** DuckDB twin of the unrolled BPE vocabulary chain (tok census → v0 →
    * per-round argmax/apply CTEs p/b/m/g/s/v) — every stage MATERIALIZED
    * (the PCA-oracle lesson: inlined CTEs re-expand the chain
    * exponentially across rounds). DuckDB lambda indexes are 1-based where
    * Spark's are 0-based; the `i - 1` shifts below pin the same values.
    * Shared by the trainer and encoder oracles. */
  private def bpeVocabChain: String = {
    val rounds = (1 to BpeRounds).map { r =>
      val pv = s"v${r - 1}"
      s"p$r AS MATERIALIZED (SELECT list_extract(syms, i.i::INT) AS a, " +
        s"list_extract(syms, i.i::INT + 1) AS b, CAST(sum(freq) AS BIGINT) AS pair_weight " +
        s"FROM $pv, unnest(range(1, len(syms))) AS i(i) GROUP BY 1, 2), " +
        s"b$r AS MATERIALIZED (SELECT a, b, pair_weight FROM p$r " +
        "ORDER BY pair_weight DESC, a, b LIMIT 1), " +
        s"m$r AS MATERIALIZED (SELECT tok, freq, syms, " +
        s"list_filter(range(1, len(syms)), i -> list_extract(syms, i::INT) = b$r.a " +
        s"AND list_extract(syms, i::INT + 1) = b$r.b) AS mpos FROM $pv, b$r), " +
        s"g$r AS MATERIALIZED (SELECT *, list_transform(mpos, (x, i) -> x - (i - 1)) AS mgrp FROM m$r), " +
        s"s$r AS MATERIALIZED (SELECT tok, freq, syms, " +
        "list_filter(mpos, (x, k) -> ((k - 1) - (list_position(mgrp, list_extract(mgrp, k::INT)) - 1)) % 2 = 0) AS sel " +
        s"FROM g$r), " +
        s"v$r AS MATERIALIZED (SELECT tok, freq, " +
        "list_filter(list_transform(range(1, len(syms) + 1), p -> " +
        "CASE WHEN list_contains(sel, p) THEN list_extract(syms, p::INT) || list_extract(syms, p::INT + 1) " +
        "WHEN list_contains(sel, p - 1) THEN NULL " +
        s"ELSE list_extract(syms, p::INT) END), x -> x IS NOT NULL) AS syms FROM s$r)"
    }.mkString(", ")
    s"tok AS (SELECT unnest(${tokensDuck("text")}) AS tok FROM documents), " +
      "v0 AS MATERIALIZED (SELECT tok, count(*) AS freq, " +
      "list_filter(string_split(tok, ''), x -> x != '') AS syms FROM tok GROUP BY tok), " +
      rounds
  }

  /** Trainer oracle: the vocab chain plus per-round symbol counters and
    * the merge-table projection. */
  private def bpeTrainOracle: String = {
    val counters = (1 to BpeRounds).map { r =>
      val pv = s"v${r - 1}"
      s"sb$r AS MATERIALIZED (SELECT CAST(sum(freq * len(syms)) AS BIGINT) AS sb FROM ${pv}), " +
        s"sa$r AS MATERIALIZED (SELECT CAST(sum(freq * len(syms)) AS BIGINT) AS sa FROM v$r), " +
        s"r$r AS (SELECT CAST($r AS BIGINT) AS round, b$r.a AS sym_a, b$r.b AS sym_b, " +
        s"b$r.a || b$r.b AS merged, b$r.pair_weight, sb$r.sb AS symbols_before, " +
        s"sa$r.sa AS symbols_after FROM b$r, sb$r, sa$r)"
    }.mkString(", ")
    val unioned = (1 to BpeRounds).map(r => s"SELECT * FROM r$r").mkString(" UNION ALL ")
    s"WITH $bpeVocabChain, $counters " +
      s"SELECT * FROM ($unioned) ORDER BY round"
  }
}
