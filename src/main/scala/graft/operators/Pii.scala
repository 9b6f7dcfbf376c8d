package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.CrossHash.charHashDuck

/** PII detection and redaction over the documents corpus — the compliance
  * pass every training-data pipeline runs before anything else sees the
  * text (emails, IPv4 addresses, phone numbers here; the pattern table is
  * the extension point for more classes).
  *
  * The synthetic corpus contains no PII, so each query first augments the
  * text with deterministically doc_id-derived PII spans — BOTH engines run
  * the identical construction, so the regex machinery is exercised on real
  * matches with per-doc varying counts rather than trivially passing on
  * zeros. Patterns are written in the Java-regex ∩ RE2 common subset
  * (char classes, bounded repeats, \d, \b) so Spark and DuckDB agree.
  *
  * Scale: regexp_extract_all / regexp_replace are codegen'd row-local
  * string expressions — no shuffle at all until the final per-lang
  * aggregation (map-side partial), so the pass is embarrassingly parallel
  * over 100 TB; the redaction variant is a pure projection.
  */
object Pii {

  /** Shared regexes (single-backslash form; escaped per engine below). */
  val EmailRe = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  val Ipv4Re = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""
  val PhoneRe = """\+1-555-\d{4}"""

  /** Spark SQL string literals process backslash escapes; DuckDB's don't. */
  private def sparkLit(re: String): String = "'" + re.replace("\\", "\\\\") + "'"
  private def duckLit(re: String): String = "'" + re + "'"

  /** Deterministic PII augmentation: ~1/3 of docs get an email, ~1/5 an
    * IPv4, ~1/7 a phone number, all derived from doc_id. */
  private val augSpark =
    "concat(text," +
      " CASE WHEN doc_id % 3 = 0 THEN concat(' contact user', CAST(doc_id % 97 AS STRING)," +
      " '@mail', CAST(doc_id % 7 AS STRING), '.example') ELSE '' END," +
      " CASE WHEN doc_id % 5 = 0 THEN concat(' host ', CAST(doc_id % 223 + 1 AS STRING)," +
      " '.', CAST(doc_id % 251 AS STRING), '.', CAST(doc_id % 241 AS STRING)," +
      " '.', CAST(doc_id % 254 + 1 AS STRING)) ELSE '' END," +
      " CASE WHEN doc_id % 7 = 0 THEN concat(' call +1-555-'," +
      " lpad(CAST(doc_id % 10000 AS STRING), 4, '0')) ELSE '' END)"

  private val augDuck =
    "text" +
      " || CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id % 97 AS VARCHAR)" +
      " || '@mail' || CAST(doc_id % 7 AS VARCHAR) || '.example' ELSE '' END" +
      " || CASE WHEN doc_id % 5 = 0 THEN ' host ' || CAST(doc_id % 223 + 1 AS VARCHAR)" +
      " || '.' || CAST(doc_id % 251 AS VARCHAR) || '.' || CAST(doc_id % 241 AS VARCHAR)" +
      " || '.' || CAST(doc_id % 254 + 1 AS VARCHAR) ELSE '' END" +
      " || CASE WHEN doc_id % 7 = 0 THEN ' call +1-555-'" +
      " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END"

  /** 13-19 digit runs, word-bounded (RE2 ∩ Java subset). */
  val LuhnRunRe = """\b\d{13,19}\b"""

  /** ~1/4 of docs get a deterministic 16-digit run; validity incidental. */
  private val luhnAugSpark =
    "concat(text, CASE WHEN doc_id % 4 = 0 THEN concat(' card ', " +
      "lpad(CAST((doc_id * 1000003 + 123456789) % 10000000000000000 AS STRING), 16, '0')) " +
      "ELSE '' END)"
  private val luhnAugDuck =
    "text || CASE WHEN doc_id % 4 = 0 THEN ' card ' || " +
      "lpad(CAST((doc_id * 1000003 + 123456789) % 10000000000000000 AS VARCHAR), 16, '0') " +
      "ELSE '' END"

  /** Per-doc candidate/valid counts from a (doc_id, source, text) relation —
    * shared by the batch census and the streaming face (identical
    * extraction+fold in both guarantees stream/batch parity). */
  private[graft] def luhnCountsSelect: Seq[String] = Seq(
    "source",
    s"CAST(size(regexp_extract_all($luhnAugSpark, ${sparkLit(LuhnRunRe)}, 0)) AS BIGINT) AS n_cands",
    s"CAST(size(filter(regexp_extract_all($luhnAugSpark, ${sparkLit(LuhnRunRe)}, 0), " +
      s"c -> $luhnValidSpark)) AS BIGINT) AS n_valid")

  /** Luhn fold over the candidate string `c` (Spark lambda body): sum the
    * reversed digits, doubling every second one and folding >9 back. */
  private val luhnValidSpark =
    """aggregate(sequence(0, length(c) - 1), CAST(0 AS BIGINT), (acc, i) ->
       acc + CASE WHEN i % 2 = 1
         THEN CASE WHEN CAST(substring(reverse(c), i + 1, 1) AS BIGINT) * 2 > 9
           THEN CAST(substring(reverse(c), i + 1, 1) AS BIGINT) * 2 - 9
           ELSE CAST(substring(reverse(c), i + 1, 1) AS BIGINT) * 2 END
         ELSE CAST(substring(reverse(c), i + 1, 1) AS BIGINT) END) % 10 = 0"""

  /** The same fold in DuckDB list form. */
  private[operators] val luhnValidDuck =
    "list_reduce(list_prepend(0::BIGINT, list_transform(range(0, length(c)), i -> " +
      "CASE WHEN i % 2 = 1 " +
      "THEN CASE WHEN CAST(substring(reverse(c), CAST(i + 1 AS INT), 1) AS BIGINT) * 2 > 9 " +
      "THEN CAST(substring(reverse(c), CAST(i + 1 AS INT), 1) AS BIGINT) * 2 - 9 " +
      "ELSE CAST(substring(reverse(c), CAST(i + 1 AS INT), 1) AS BIGINT) * 2 END " +
      "ELSE CAST(substring(reverse(c), CAST(i + 1 AS INT), 1) AS BIGINT) END)), " +
      "(a, x) -> a + x) % 10 = 0"

  private def docs(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.TextHashFunctions.register(spark) // char_hash for the redaction fingerprint
    spark.read.parquet(s"$dir/documents.parquet")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Per-language PII census: how many docs carry each class, and how many
    // spans total — the numbers a compliance report is built from.
    "pii_stats" -> ((s, d) =>
      docs(s, d)
        .selectExpr("lang", s"$augSpark AS t")
        .selectExpr("lang",
          s"CAST(size(regexp_extract_all(t, ${sparkLit(EmailRe)}, 0)) AS BIGINT) AS e",
          s"CAST(size(regexp_extract_all(t, ${sparkLit(Ipv4Re)}, 0)) AS BIGINT) AS i",
          s"CAST(size(regexp_extract_all(t, ${sparkLit(PhoneRe)}, 0)) AS BIGINT) AS p")
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("e") > 0, 1L).otherwise(0L)).as("docs_with_email"),
          sum(col("e")).as("n_emails"),
          sum(when(col("i") > 0, 1L).otherwise(0L)).as("docs_with_ip"),
          sum(col("i")).as("n_ips"),
          sum(when(col("p") > 0, 1L).otherwise(0L)).as("docs_with_phone"),
          sum(col("p")).as("n_phones"))
        .orderBy(asc("lang"))),

    // Redaction: replace every PII span with a class token and emit the
    // per-doc span counts plus a cross-engine fingerprint of the redacted
    // text (proves the REPLACED text is identical, not just the counts).
    "pii_redact" -> ((s, d) =>
      docs(s, d)
        .selectExpr("doc_id", s"$augSpark AS t")
        .selectExpr("doc_id",
          s"CAST(size(regexp_extract_all(t, ${sparkLit(EmailRe)}, 0)) AS BIGINT) AS n_emails",
          s"CAST(size(regexp_extract_all(t, ${sparkLit(Ipv4Re)}, 0)) AS BIGINT) AS n_ips",
          s"CAST(size(regexp_extract_all(t, ${sparkLit(PhoneRe)}, 0)) AS BIGINT) AS n_phones",
          s"""char_hash(regexp_replace(regexp_replace(regexp_replace(t,
              ${sparkLit(EmailRe)}, '<EMAIL>'),
              ${sparkLit(Ipv4Re)}, '<IP>'),
              ${sparkLit(PhoneRe)}, '<PHONE>')) AS redacted_hash""")
        .orderBy(asc("doc_id"))),

    // Luhn-validated card-number detection: digit runs of 13-19 are only
    // PII when the Luhn checksum holds (the filter that separates card
    // numbers from order ids / timestamps — without it a numeric corpus
    // drowns the report in false positives). The checksum is an explicit
    // integer fold over the reversed digits in BOTH engines (no builtin:
    // DuckDB has none, and an explicit fold pins the semantics). ~1/4 of
    // docs get a deterministic 16-digit augmentation; its Luhn validity
    // varies with doc_id, so valid and invalid candidates both occur.
    // Row-local regex + fold, one map-side census — no shuffle until the
    // |sources|-row rollup.
    "pii_luhn_stats" -> ((s, d) =>
      docs(s, d)
        .selectExpr("source", s"$luhnAugSpark AS t")
        .selectExpr("source",
          s"regexp_extract_all(t, ${sparkLit(LuhnRunRe)}, 0) AS cands")
        .selectExpr("source",
          "CAST(size(cands) AS BIGINT) AS n_cands",
          s"""CAST(size(filter(cands, c -> $luhnValidSpark)) AS BIGINT) AS n_valid""")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("n_cands") > 0, 1L).otherwise(0L)).as("docs_with_cand"),
          sum(col("n_cands")).as("n_candidates"),
          sum(col("n_valid")).as("n_luhn_valid"),
          sum(when(col("n_valid") > 0, 1L).otherwise(0L)).as("docs_with_valid"))
        .orderBy(asc("source"))),

    // k-anonymity audit over the customer quasi-identifiers, at two
    // generalization levels: (nation, segment) and the coarsened
    // (region, segment). Each level is one map-side-combined groupBy to
    // the equivalence-class census followed by a constant-width rollup;
    // the nation→region coarsening joins two broadcast dims. k = the
    // smallest class size; risky = classes below k=5.
    "pii_k_anonymity" -> ((s, d) => {
      def level(classes: DataFrame, name: String): DataFrame =
        classes.agg(
            sum(col("cnt")).as("n_rows"),
            count(lit(1)).as("n_classes"),
            min(col("cnt")).as("k_anonymity"),
            sum(when(col("cnt") < 5L, 1L).otherwise(0L)).as("n_risky_classes"),
            sum(when(col("cnt") < 5L, col("cnt")).otherwise(0L)).as("n_risky_rows"))
          .selectExpr(s"'$name' AS level", "n_rows", "n_classes", "k_anonymity",
            "n_risky_classes", "n_risky_rows",
            "(n_risky_rows * 10000) div n_rows AS risky_bp")
      val cust = Tables.read(s, d, "customer")
      val nation = Tables.read(s, d, "nation")
      val region = Tables.read(s, d, "region")
      val fine = cust.groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("cnt"))
      val coarse = cust
        .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
        .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
        .groupBy(col("r_regionkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("cnt"))
      level(fine, "nation_segment")
        .union(level(coarse, "region_segment"))
        .orderBy(asc("level"))
    })
  )

  def oracles: Map[String, String] = {
    val redactedDuck =
      s"regexp_replace(regexp_replace(regexp_replace(t, ${duckLit(EmailRe)}, '<EMAIL>', 'g'), " +
        s"${duckLit(Ipv4Re)}, '<IP>', 'g'), ${duckLit(PhoneRe)}, '<PHONE>', 'g')"
    Map(
      "pii_stats" ->
        (s"WITH aug AS (SELECT lang, $augDuck AS t FROM documents), " +
          s"cnt AS (SELECT lang, " +
          s"len(regexp_extract_all(t, ${duckLit(EmailRe)})) AS e, " +
          s"len(regexp_extract_all(t, ${duckLit(Ipv4Re)})) AS i, " +
          s"len(regexp_extract_all(t, ${duckLit(PhoneRe)})) AS p FROM aug) " +
          "SELECT lang, count(*) AS n_docs, " +
          "CAST(sum(CASE WHEN e > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_email, " +
          "CAST(sum(e) AS BIGINT) AS n_emails, " +
          "CAST(sum(CASE WHEN i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_ip, " +
          "CAST(sum(i) AS BIGINT) AS n_ips, " +
          "CAST(sum(CASE WHEN p > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_phone, " +
          "CAST(sum(p) AS BIGINT) AS n_phones " +
          "FROM cnt GROUP BY lang ORDER BY lang"),
      "pii_redact" ->
        (s"WITH aug AS (SELECT doc_id, $augDuck AS t FROM documents) " +
          "SELECT doc_id, " +
          s"len(regexp_extract_all(t, ${duckLit(EmailRe)})) AS n_emails, " +
          s"len(regexp_extract_all(t, ${duckLit(Ipv4Re)})) AS n_ips, " +
          s"len(regexp_extract_all(t, ${duckLit(PhoneRe)})) AS n_phones, " +
          s"${charHashDuck(redactedDuck)} AS redacted_hash " +
          "FROM aug ORDER BY doc_id"),
      "pii_luhn_stats" ->
        (s"WITH aug AS (SELECT source, $luhnAugDuck AS t FROM documents), " +
          s"cand AS (SELECT source, regexp_extract_all(t, ${duckLit(LuhnRunRe)}) AS cands FROM aug), " +
          "cnt AS (SELECT source, len(cands) AS n_cands, " +
          s"len(list_filter(cands, c -> $luhnValidDuck)) AS n_valid FROM cand) " +
          "SELECT source, count(*) AS n_docs, " +
          "CAST(sum(CASE WHEN n_cands > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_cand, " +
          "CAST(sum(n_cands) AS BIGINT) AS n_candidates, " +
          "CAST(sum(n_valid) AS BIGINT) AS n_luhn_valid, " +
          "CAST(sum(CASE WHEN n_valid > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_valid " +
          "FROM cnt GROUP BY source ORDER BY source"),
      "pii_k_anonymity" -> {
        def levelSql(classSql: String, name: String) =
          s"SELECT '$name' AS level, CAST(sum(cnt) AS BIGINT) AS n_rows, " +
            "count(*) AS n_classes, CAST(min(cnt) AS BIGINT) AS k_anonymity, " +
            "CAST(sum(CASE WHEN cnt < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_risky_classes, " +
            "CAST(sum(CASE WHEN cnt < 5 THEN cnt ELSE 0 END) AS BIGINT) AS n_risky_rows, " +
            "CAST((sum(CASE WHEN cnt < 5 THEN cnt ELSE 0 END) * 10000) // sum(cnt) AS BIGINT) AS risky_bp " +
            s"FROM ($classSql)"
        val fine = "SELECT c_nationkey, c_mktsegment, count(*) AS cnt " +
          "FROM customer GROUP BY c_nationkey, c_mktsegment"
        val coarse = "SELECT r_regionkey, c_mktsegment, count(*) AS cnt " +
          "FROM customer JOIN nation ON c_nationkey = n_nationkey " +
          "JOIN region ON n_regionkey = r_regionkey " +
          "GROUP BY r_regionkey, c_mktsegment"
        levelSql(fine, "nation_segment") + " UNION ALL " +
          levelSql(coarse, "region_segment") + " ORDER BY level"
      }
    )
  }
}
