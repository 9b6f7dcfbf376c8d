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
