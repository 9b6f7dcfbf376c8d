package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.CrossHash._

/** Multimodal-column plumbing for a training-data pipeline: media payloads
  * travel as opaque `binary` columns with typed metadata structs; decode /
  * feature-extract / frame-sample run batch-wise over partitions.
  *
  * The actual codec step is STUBBED (this environment has no image/audio
  * libraries): `decodeStub` derives deterministic fake dimensions from the
  * byte content. Everything around the stub — the binary schema, the
  * partition-batched invocation shape (the Scala analogue of
  * `mapInPandas`), the metadata struct, and the pruned-column scan — is
  * real and oracle-tested. The driver tables carry no binary column, so
  * the oracle queries derive the bytes from `documents.text` (ASCII ⇒
  * byte i == char code i, which keeps DuckDB bit-exact).
  */
object Multimodal {

  private def docs(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.TextHashFunctions.register(spark) // codegen'd char_hash
    spark.read.parquet(s"$dir/documents.parquet")
  }

  /** Typed result of the (stubbed) decode step. */
  final case class MediaMeta(
      doc_id: Long, n_bytes: Int, header_code: Int, checksum: Long,
      width: Int, height: Int, format: String)

  /** Deterministic fake decode of one payload — the `???` seam where a real
    * codec (libjpeg/ffmpeg/...) would plug in. Pure function of the bytes. */
  def decodeOne(docId: Long, payload: Array[Byte]): MediaMeta = {
    var h = 0L
    payload.foreach { b => h = (h * 31 + (b & 0xff)) % P }
    MediaMeta(
      doc_id = docId,
      n_bytes = payload.length,
      header_code = if (payload.nonEmpty) payload(0) & 0xff else 0,
      checksum = h,
      width = (16 + h % 64).toInt,
      height = (16 + (h / 64) % 64).toInt,
      format = (h % 3) match { case 0 => "jpeg"; case 1 => "png"; case _ => "webp" })
  }

  /** Batch decode over partitions: one JVM-side pass per partition, rows
    * streamed — the batch shape a Pandas-UDF/`mapInPandas` decode would
    * have. Input must carry (doc_id: Long, payload: Binary). */
  def decodeStub(spark: SparkSession, withPayload: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    withPayload.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeOne(id, bytes) })
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Metadata extraction: payload envelope -> typed columns, all derived
    // from the bytes with exact integer arithmetic.
    "media_metadata" -> ((s, d) =>
      docs(s, d).selectExpr(
        "doc_id",
        // BIGINT to match DuckDB's octet_length result type
        "CAST(octet_length(encode(text, 'UTF-8')) AS BIGINT) AS n_bytes",
        "ascii(substring(text, 1, 1)) AS header_code",
        s"${charHashSpark("text")} AS checksum",
        s"CAST(16 + ${charHashSpark("text")} % 64 AS INT) AS width",
        s"CAST(16 + (${charHashSpark("text")} div 64) % 64 AS INT) AS height",
        s"CASE ${charHashSpark("text")} % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format"
      ).orderBy(asc("doc_id"))),

    // Frame sampling: every 16th byte (video-frame subsampling analogue);
    // emits the sampled "frame track" length and content hash.
    "media_frame_sample" -> ((s, d) =>
      docs(s, d).selectExpr(
        "doc_id",
        "CAST((length(text) + 15) div 16 AS BIGINT) AS n_frames",
        s"""${charHashSpark(
            "array_join(transform(sequence(1, (length(text) + 15) div 16), i -> substring(text, (i - 1) * 16 + 1, 1)), '')")}
           AS track_hash"""
      ).orderBy(asc("doc_id"))),

    // Format routing: fake-decoded format buckets -> per-format volumes
    // (the partition/routing step of a multimodal ingest job).
    "media_format_stats" -> ((s, d) =>
      docs(s, d).selectExpr("doc_id",
          "octet_length(encode(text, 'UTF-8')) AS n_bytes",
          s"CASE ${charHashSpark("text")} % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format")
        .groupBy(col("format"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_bytes")).cast("bigint").as("total_bytes"))
        .orderBy(asc("format"))),

    // Content-hash dedup census per format — the "drop byte-identical
    // images before decode" step every multimodal pipeline runs first.
    // Two map-side-combined groupBys: payloads shard by content hash (the
    // canonical exact-dedup shuffle — at 100 TB this is hash-partitioned
    // binary, nothing compares payload bytes pairwise), then the per-hash
    // groups collapse to a per-format savings report. A real pipeline uses
    // a 128-bit digest; the 30-bit stub hash stands in behind the same
    // plan shape, so `grp_bytes - keep_bytes` (not `(copies-1)·bytes`) is
    // used deliberately — it stays correct even when distinct payloads
    // collide on the hash.
    "media_dedup_report" -> ((s, d) =>
      docs(s, d).selectExpr(
          "CAST(octet_length(encode(text, 'UTF-8')) AS BIGINT) AS n_bytes",
          s"${charHashSpark("text")} AS checksum",
          s"CASE ${charHashSpark("text")} % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format")
        .groupBy(col("format"), col("checksum"))
        .agg(count(lit(1)).as("copies"),
          sum(col("n_bytes")).as("grp_bytes"),
          max(col("n_bytes")).as("keep_bytes"))
        .groupBy(col("format"))
        .agg(sum(col("copies")).as("n_payloads"),
          count(lit(1)).as("n_distinct"),
          sum(expr("copies - 1")).as("dup_docs"),
          sum(expr("grp_bytes - keep_bytes")).as("bytes_saved"))
        .selectExpr("format", "n_payloads", "n_distinct", "dup_docs",
          "(dup_docs * 10000) div n_payloads AS dup_bp", "bytes_saved")
        .orderBy(asc("format"))),

    // Resize planning: fit the fake-decoded (width, height) into a 224-max
    // box preserving aspect ratio — pure integer math (floor division), so
    // the plan an actual resampling kernel would execute is oracle-pinned
    // even though the pixel work itself lives behind the codec seam.
    "media_resize_plan" -> ((s, d) =>
      docs(s, d).selectExpr(
          "doc_id",
          s"CAST(16 + ${charHashSpark("text")} % 64 AS INT) AS width",
          s"CAST(16 + (${charHashSpark("text")} div 64) % 64 AS INT) AS height")
        .selectExpr("doc_id", "width", "height",
          "CAST(CASE WHEN width >= height THEN 224 ELSE (width * 224) div height END AS INT) AS out_w",
          "CAST(CASE WHEN width >= height THEN (height * 224) div width ELSE 224 END AS INT) AS out_h")
        .orderBy(asc("doc_id"))),

    // Feature extraction stub: 4-bucket byte-class histogram over the
    // payload bytes (the shape a real embedding/feature kernel would have:
    // one narrow scan, fixed-width integer vector out per item).
    "media_feature_extract" -> ((s, d) =>
      docs(s, d).selectExpr(
          "doc_id",
          "CAST(length(text) - length(regexp_replace(text, '[a-z]', '')) AS BIGINT) AS n_lower",
          "CAST(length(text) - length(regexp_replace(text, '[A-Z]', '')) AS BIGINT) AS n_upper",
          "CAST(length(text) - length(regexp_replace(text, '[0-9]', '')) AS BIGINT) AS n_digit",
          "CAST(length(text) AS BIGINT) AS n_total")
        .selectExpr("doc_id", "n_lower", "n_upper", "n_digit",
          "n_total - n_lower - n_upper - n_digit AS n_other")
        .orderBy(asc("doc_id"))),

    // The mapPartitions decode stub itself. The operator shape is not
    // SQL-expressible, but its stub arithmetic IS deterministic integer
    // math, so the oracle below replays it column-for-column in DuckDB.
    "media_decode_stub" -> ((s, d) => {
      val payloads = docs(s, d)
        .selectExpr("doc_id", "encode(text, 'UTF-8') AS payload")
      decodeStub(s, payloads).toDF().orderBy(asc("doc_id"))
    })
  )

  def oracles: Map[String, String] = Map(
    "media_metadata" ->
      (s"SELECT doc_id, octet_length(encode(text)) AS n_bytes, " +
        "unicode(substring(text, 1, 1)) AS header_code, " +
        s"${charHashDuck("text")} AS checksum, " +
        s"CAST(16 + ${charHashDuck("text")} % 64 AS INT) AS width, " +
        s"CAST(16 + (${charHashDuck("text")} // 64) % 64 AS INT) AS height, " +
        s"CASE ${charHashDuck("text")} % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format " +
        "FROM documents ORDER BY doc_id"),
    "media_frame_sample" ->
      (s"SELECT doc_id, CAST((length(text) + 15) // 16 AS BIGINT) AS n_frames, " +
        s"${charHashDuck("list_aggregate(list_transform(range(1, (length(text) + 15) // 16 + 1), " +
          "i -> substring(text, (i - 1) * 16 + 1, 1)), 'string_agg', '')")} AS track_hash " +
        "FROM documents ORDER BY doc_id"),
    "media_resize_plan" ->
      (s"WITH m AS (SELECT doc_id, " +
        s"CAST(16 + ${charHashDuck("text")} % 64 AS INT) AS width, " +
        s"CAST(16 + (${charHashDuck("text")} // 64) % 64 AS INT) AS height " +
        "FROM documents) " +
        "SELECT doc_id, width, height, " +
        "CAST(CASE WHEN width >= height THEN 224 ELSE (width * 224) // height END AS INT) AS out_w, " +
        "CAST(CASE WHEN width >= height THEN (height * 224) // width ELSE 224 END AS INT) AS out_h " +
        "FROM m ORDER BY doc_id"),
    "media_feature_extract" ->
      ("WITH m AS (SELECT doc_id, " +
        "length(text) - length(regexp_replace(text, '[a-z]', '', 'g')) AS n_lower, " +
        "length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS n_upper, " +
        "length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit, " +
        "length(text) AS n_total FROM documents) " +
        "SELECT doc_id, n_lower, n_upper, n_digit, " +
        "n_total - n_lower - n_upper - n_digit AS n_other FROM m ORDER BY doc_id"),
    "media_format_stats" ->
      (s"WITH m AS (SELECT doc_id, octet_length(encode(text)) AS n_bytes, " +
        s"CASE ${charHashDuck("text")} % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format " +
        "FROM documents) " +
        "SELECT format, count(*) AS n_docs, CAST(sum(n_bytes) AS BIGINT) AS total_bytes " +
        "FROM m GROUP BY format ORDER BY format"),
    "media_dedup_report" ->
      (s"WITH m AS (SELECT CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, " +
        s"${charHashDuck("text")} AS checksum, " +
        s"CASE ${charHashDuck("text")} % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format " +
        "FROM documents), " +
        "g AS (SELECT format, checksum, count(*) AS copies, " +
        "CAST(sum(n_bytes) AS BIGINT) AS grp_bytes, max(n_bytes) AS keep_bytes " +
        "FROM m GROUP BY format, checksum) " +
        "SELECT format, CAST(sum(copies) AS BIGINT) AS n_payloads, " +
        "count(*) AS n_distinct, CAST(sum(copies - 1) AS BIGINT) AS dup_docs, " +
        "(CAST(sum(copies - 1) AS BIGINT) * 10000) // CAST(sum(copies) AS BIGINT) AS dup_bp, " +
        "CAST(sum(grp_bytes - keep_bytes) AS BIGINT) AS bytes_saved " +
        "FROM g GROUP BY format ORDER BY format"),
    // The decode seam is a mapPartitions operator, but its arithmetic is
    // deterministic integer math over the payload bytes (ASCII ⇒ byte i ==
    // char code i), so DuckDB can replay every derived column: length,
    // first byte, char-fold checksum, checksum-derived width/height/format.
    // Types follow MediaMeta exactly (n_bytes/header_code/width/height INT).
    "media_decode_stub" ->
      (s"SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n_bytes, " +
        "unicode(substring(text, 1, 1)) AS header_code, " +
        s"${charHashDuck("text")} AS checksum, " +
        s"CAST(16 + ${charHashDuck("text")} % 64 AS INT) AS width, " +
        s"CAST(16 + (${charHashDuck("text")} // 64) % 64 AS INT) AS height, " +
        s"CASE ${charHashDuck("text")} % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format " +
        "FROM documents ORDER BY doc_id")
  )
}
