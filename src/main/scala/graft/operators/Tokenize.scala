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
        .orderBy(desc("n_occ"), asc("pair")).limit(20))
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
          "FROM p GROUP BY pair ORDER BY n_occ DESC, pair LIMIT 20")
    )
  }
}
