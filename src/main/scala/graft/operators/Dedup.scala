package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.CrossHash._

/** Deduplication operators for a training-data pipeline, over `documents`
  * and `embeddings`: exact (content-hash groupBy), MinHash+LSH
  * (shingle → signature → band-bucket join → exact-Jaccard verify),
  * SimHash (bit-block LSH → Hamming verify), n-gram Jaccard with
  * same-language blocking, and embedding-cosine near-dup.
  *
  * Scale design: every variant is blocked — candidates come from an
  * equi-join on a bucket key (LSH band, SimHash block, language), never
  * from an unblocked cross join, so the candidate set stays near-linear at
  * 100 TB and the expensive exact verify runs only on candidates. All
  * hashes are CrossHash polynomial folds → the DuckDB oracle reproduces
  * them bit-for-bit.
  */
object Dedup {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
  private def embeddings(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  /** doc_id + distinct word-3gram shingle hashes. */
  private def shingled(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).selectExpr(
      "doc_id", "lang",
      s"array_distinct(${shingleHashesSpark(wordHashesSpark(tokensSpark("text")))}) AS sh")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup: content-hash groupBy; histogram of group sizes is the
    // dedup report (keep-one-per-group is a trivial min(doc_id) on top).
    "dedup_exact" -> ((s, d) =>
      docs(s, d)
        .selectExpr("md5(text) AS h", "doc_id")
        .groupBy(col("h")).agg(count(lit(1)).as("dup_count"))
        .groupBy(col("dup_count")).agg(count(lit(1)).as("n_groups"))
        .orderBy(asc("dup_count"))),

    // MinHash + LSH: 16-perm signature, 8 bands x 2 rows; pairs sharing a
    // band bucket are candidates; exact Jaccard >= 0.7 confirms.
    "dedup_minhash_lsh" -> ((s, d) => {
      val sig = shingled(s, d)
        .selectExpr("doc_id", "sh", s"${minhashSigSpark("sh")} AS sig")
      val bands = sig.selectExpr("doc_id",
        s"""explode(transform(sequence(0, ${Bands - 1}),
            b -> struct(b AS band,
              element_at(sig, 2 * b + 1) * $P + element_at(sig, 2 * b + 2) AS bkey)
            )) AS e""")
        .selectExpr("doc_id", "e.band AS band", "e.bkey AS bkey")
      val cand = bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("da"), col("b.doc_id").as("db")).distinct()
      val sh = sig.select(col("doc_id"), col("sh"))
      cand.join(sh.as("l"), col("da") === col("l.doc_id"))
        .join(sh.as("r"), col("db") === col("r.doc_id"))
        .selectExpr("da AS doc_a", "db AS doc_b",
          "size(array_intersect(l.sh, r.sh)) AS n_common",
          "size(l.sh) + size(r.sh) - size(array_intersect(l.sh, r.sh)) AS n_union")
        .selectExpr("doc_a", "doc_b", "n_common", "n_union",
          "(n_common * 10000) div n_union AS jaccard_bp")
        .filter(col("jaccard_bp") >= 7000)
        .orderBy(asc("doc_a"), asc("doc_b"))
    }),

    // SimHash: 32-bit signature, 4 byte-blocks as LSH (pigeonhole: hamming
    // <= 3 pairs must agree on >= 1 of 4 blocks); verify popcount(xor) <= 3.
    "dedup_simhash" -> ((s, d) => {
      val sig = docs(s, d).selectExpr("doc_id",
        s"${simhashSpark(wordHashesSpark(tokensSpark("text")))} AS simhash")
      val blocks = sig.selectExpr("doc_id", "simhash",
        """explode(transform(sequence(0, 3),
           b -> struct(b AS blk, shiftright(simhash, b * 8) & 255 AS bval))) AS e""")
        .selectExpr("doc_id", "simhash", "e.blk AS blk", "e.bval AS bval")
      blocks.as("a").join(blocks.as("b"),
          col("a.blk") === col("b.blk") && col("a.bval") === col("b.bval") &&
            col("a.doc_id") < col("b.doc_id"))
        .selectExpr("a.doc_id AS doc_a", "b.doc_id AS doc_b",
          "bit_count(a.simhash ^ b.simhash) AS hamming")
        .distinct()
        .filter(col("hamming") <= 3)
        .orderBy(asc("doc_a"), asc("doc_b"))
    }),

    // N-gram Jaccard with same-language blocking: exact set similarity on
    // word 3-grams within a language partition.
    "dedup_ngram_jaccard" -> ((s, d) => {
      val sh = shingled(s, d)
      sh.as("l").join(sh.as("r"),
          col("l.lang") === col("r.lang") && col("l.doc_id") < col("r.doc_id"))
        .selectExpr("l.doc_id AS doc_a", "r.doc_id AS doc_b",
          "size(array_intersect(l.sh, r.sh)) AS n_common",
          "size(l.sh) + size(r.sh) - size(array_intersect(l.sh, r.sh)) AS n_union")
        .selectExpr("doc_a", "doc_b", "n_common", "n_union",
          "(n_common * 10000) div n_union AS jaccard_bp")
        .filter(col("jaccard_bp") >= 5000)
        .orderBy(asc("doc_a"), asc("doc_b"))
    }),

    // Embedding-cosine near-dup: double-precision ordered-fold cosine in
    // exact ppm. Pairwise here (the corpus fits); the LSH-bucketed scale
    // path for 100 TB is Similarity's ann_lsh_buckets.
    "dedup_embedding_cosine" -> ((s, d) => {
      val e = embeddings(s, d).selectExpr("vec_id", "label", "embedding AS v",
        s"${norm2Spark("embedding", 64)} AS n2")
      e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
        .selectExpr("a.vec_id AS vec_a", "b.vec_id AS vec_b",
          s"""CAST(floor(${dotSpark("a.v", "b.v", 64)}
              / (sqrt(a.n2) * sqrt(b.n2)) * 1000000) AS BIGINT) AS cos_ppm""")
        .filter(col("cos_ppm") >= 450000)
        .orderBy(asc("vec_a"), asc("vec_b"))
    })
  )

  def oracles: Map[String, String] = {
    val sh = s"list_distinct(${shingleHashesDuck(wordHashesDuck(tokensDuck("text")))})"
    val shingledSql = s"SELECT doc_id, lang, $sh AS sh FROM documents"
    Map(
      "dedup_exact" ->
        ("WITH g AS (SELECT md5(text) AS h, count(*) AS dup_count FROM documents GROUP BY h) " +
          "SELECT dup_count, count(*) AS n_groups FROM g GROUP BY dup_count ORDER BY dup_count"),
      "dedup_minhash_lsh" ->
        (s"WITH shingled AS ($shingledSql), " +
          s"sigs AS (SELECT doc_id, sh, ${minhashSigDuck("sh")} AS sig FROM shingled), " +
          s"bands AS (SELECT doc_id, r.range AS band, " +
          s"list_extract(sig, 2 * r.range + 1) * $P + list_extract(sig, 2 * r.range + 2) AS bkey " +
          s"FROM sigs CROSS JOIN range(0, $Bands) r), " +
          "cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db FROM bands a " +
          "JOIN bands b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id), " +
          "verified AS (SELECT da AS doc_a, db AS doc_b, " +
          "len(list_intersect(l.sh, r.sh)) AS n_common, " +
          "len(l.sh) + len(r.sh) - len(list_intersect(l.sh, r.sh)) AS n_union " +
          "FROM cand JOIN sigs l ON da = l.doc_id JOIN sigs r ON db = r.doc_id) " +
          "SELECT doc_a, doc_b, n_common, n_union, (n_common * 10000) // n_union AS jaccard_bp " +
          "FROM verified WHERE (n_common * 10000) // n_union >= 7000 ORDER BY doc_a, doc_b"),
      "dedup_simhash" ->
        (s"WITH sigs AS (SELECT doc_id, " +
          s"${simhashDuck(wordHashesDuck(tokensDuck("text")))} AS simhash FROM documents), " +
          "blocks AS (SELECT doc_id, simhash, r.range AS blk, " +
          "(simhash >> (r.range * 8)) & 255 AS bval FROM sigs CROSS JOIN range(0, 4) r), " +
          "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
          "bit_count(xor(a.simhash, b.simhash)) AS hamming FROM blocks a " +
          "JOIN blocks b ON a.blk = b.blk AND a.bval = b.bval AND a.doc_id < b.doc_id) " +
          "SELECT doc_a, doc_b, hamming FROM cand WHERE hamming <= 3 ORDER BY doc_a, doc_b"),
      "dedup_ngram_jaccard" ->
        (s"WITH shingled AS ($shingledSql) " +
          "SELECT l.doc_id AS doc_a, r.doc_id AS doc_b, " +
          "len(list_intersect(l.sh, r.sh)) AS n_common, " +
          "len(l.sh) + len(r.sh) - len(list_intersect(l.sh, r.sh)) AS n_union, " +
          "(len(list_intersect(l.sh, r.sh)) * 10000) // " +
          "(len(l.sh) + len(r.sh) - len(list_intersect(l.sh, r.sh))) AS jaccard_bp " +
          "FROM shingled l JOIN shingled r ON l.lang = r.lang AND l.doc_id < r.doc_id " +
          "WHERE (len(list_intersect(l.sh, r.sh)) * 10000) // " +
          "(len(l.sh) + len(r.sh) - len(list_intersect(l.sh, r.sh))) >= 5000 " +
          "ORDER BY doc_a, doc_b"),
      "dedup_embedding_cosine" ->
        (s"WITH e AS (SELECT vec_id, embedding AS v, ${norm2Duck("embedding", 64)} AS n2 " +
          "FROM embeddings) " +
          "SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, " +
          s"CAST(floor(${dotDuck("a.v", "b.v", 64)} / (sqrt(a.n2) * sqrt(b.n2)) * 1000000) AS BIGINT) AS cos_ppm " +
          "FROM e a JOIN e b ON a.vec_id < b.vec_id " +
          s"WHERE CAST(floor(${dotDuck("a.v", "b.v", 64)} / (sqrt(a.n2) * sqrt(b.n2)) * 1000000) AS BIGINT) >= 450000 " +
          "ORDER BY vec_a, vec_b")
    )
  }
}
