package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's finder surface (SURVEY §2 #13-18, #20) expressed against
  * the driver's `events` table, which is shaped like a fact log:
  * `event_id` = position, `user_id` = subject, `event_type` = fact type,
  * `ts` = appendedAt, `props` = tags. Each query is the same
  * filter → orderBy(position) → direction → limit pipeline the real
  * `FactFinders` uses, so the DuckDB oracle checks the exact finder
  * semantics (half-open time ranges, backward+limit on intersections,
  * OR-of-AND tag queries) on neutral data.
  *
  * Determinism contract with the oracle: timestamps are projected as epoch
  * micros (`unix_micros`), row order is always total (unique `event_id`
  * tiebreak), and no floating-point aggregation is emitted raw.
  */
object EventFinders {

  /** Temp store roots created by gate/bench queries (fs_dsv2_roundtrip),
    * deleted on JVM exit via one shared shutdown hook. The result
    * DataFrame is lazy over the store's files, so deletion can only happen
    * once the process is done evaluating — repeated runs within one JVM
    * are bounded by run count and reclaimed at exit instead of
    * accumulating full copies of the events table in the system temp dir
    * forever. */
  private val tempRoots = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  private lazy val cleanupHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      tempRoots.forEach(r =>
        try graft.store.DirStreams.deleteTree(r) catch { case _: Exception => () })))

  private[operators] def cleanupAtExit(root: java.nio.file.Path): Unit = {
    cleanupHook
    tempRoots.add(root)
  }

  /** Single choke point for reading the events table, adaptive to the
    * physical `ts` encoding (the driver has shipped both INT64
    * TIMESTAMP(NANOS) and timestamp[us] across rounds — see VERDICT r8):
    *
    *   - INT64 TIMESTAMP(NANOS): Spark's reader rejects it by default;
    *     `nanosAsLong` surfaces it as nanos-since-epoch LongType, passed
    *     through unchanged.
    *   - timestamp[us]/[ms]: resolves to TimestampType or TimestampNTZType;
    *     normalized to nanos LongType via `unix_micros(ts) * 1000` (exact —
    *     micros fit a Long until year ~2262 at nanos).
    *
    * Downstream every consumer sees the same contract: `ts` is nanos
    * LongType. This is a schema inspection (footer read only), not a data
    * scan, so it adds no per-query cost.
    */
  private[operators] def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(spark.read.parquet(s"$dir/events.parquet"))
  }

  /** Normalize a `ts` column of any supported encoding to nanos LongType. */
  private[graft] def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", unix_micros(col("ts").cast("timestamp")) * lit(1000L))
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported type $other; expected LongType(nanos) or a timestamp type")
    }

  /** `ts` is nanos (LongType); `div` keeps the µs projection exact. */
  private val tsUs: Column = expr("ts div 1000")

  /** props is `{"k": N}`; extract N. regexp keeps the oracle engine-neutral
    * (no JSON extension needed). */
  private val kVal: Column = regexp_extract(col("props"), "(\\d+)", 1).cast("long")

  private def envelope(df: DataFrame): DataFrame =
    df.select(
      col("event_id"), col("event_type"), col("user_id"),
      tsUs.as("ts_us"), col("value"), kVal.as("k_val"))

  private val envelopeSql =
    "event_id, event_type, user_id, epoch_us(ts) AS ts_us, value, " +
      "CAST(regexp_extract(props, '(\\d+)', 1) AS BIGINT) AS k_val"

  // ts bounds as epoch micros (UTC) — numeric on both engines, no tz games.
  private val T0 = 1704412800000000L // 2024-01-05T00:00:00Z
  private val T1 = 1704672000000000L // 2024-01-08T00:00:00Z

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // findById: point lookup by unique id (reference FactFinder.kt:20)
    "fs_find_by_id" -> ((s, d) =>
      envelope(events(s, d).filter(col("event_id") === 4242L))),

    // existsById: limit-1 existence probe (reference FactFinder.kt:27)
    "fs_exists_by_id" -> ((s, d) =>
      events(s, d).select(
        (count(when(col("event_id") === 4242L, 1)) > 0).as("exists_flag"),
        (count(when(col("event_id") === 99999999L, 1)) > 0).as("missing_flag"))),

    // findBySubject: full per-entity history in append order (FactFinder.kt:41)
    "fs_find_by_subject" -> ((s, d) =>
      envelope(events(s, d).filter(col("user_id") === 7L))
        .orderBy(asc("event_id"))),

    // findBySubject Backward + limit: the two newest first
    "fs_find_by_subject_back" -> ((s, d) =>
      envelope(events(s, d).filter(col("user_id") === 7L))
        .orderBy(desc("event_id")).limit(10)),

    // findByTags: AND of tag predicates + Backward + limit on the
    // intersection path (reference AbstractFactStoreTest.kt:704-751)
    "fs_find_by_tags_back" -> ((s, d) =>
      envelope(events(s, d).filter(col("event_type") === "click" && kVal >= 50L))
        .orderBy(desc("event_id")).limit(100)),

    // findByTagQuery: OR across items, AND within; global append order
    // (reference TagQuery.kt:12-78)
    "fs_tag_query" -> ((s, d) =>
      envelope(events(s, d).filter(
        (col("event_type").isin("click", "view") && kVal < 20L) ||
          col("event_type") === "error"))
        .orderBy(asc("event_id"))),

    // findInTimeRange: half-open [start, end) (reference TimeRange.kt:24-53)
    "fs_time_range" -> ((s, d) =>
      envelope(events(s, d).filter(
        tsUs >= T0 && tsUs < T1))
        .orderBy(asc("event_id"))),

    // time range, Backward + limit
    "fs_time_range_back" -> ((s, d) =>
      envelope(events(s, d).filter(
        tsUs >= T0 && tsUs < T1))
        .orderBy(desc("event_id")).limit(50)),

    // replay: bounded position window (afterPos, pinnedHead] (FactReplayer)
    "fs_replay_window" -> ((s, d) =>
      envelope(events(s, d).filter(col("event_id") > 500L && col("event_id") <= 900L))
        .orderBy(asc("event_id"))),

    // TRUE end-to-end store roundtrip ON the correctness gate, through the
    // DataSource V2 surface: the events rows are bulk-appended into a
    // fresh store (positions = event_id order by the input-order
    // contract), then read back via spark.read.format("graft") with a
    // pushed position range — so every run exercises the commit protocol,
    // the commit-metadata pruning, and the provider's parquet decode, and
    // the DuckDB oracle replays the same window from the raw events
    // table. Nondeterministic store fields (uuid ids, appendedAt) are
    // deliberately NOT emitted.
    "fs_dsv2_roundtrip" -> ((s, d) => {
      val root = java.nio.file.Files.createTempDirectory("graft-dsv2-rt")
      EventFinders.cleanupAtExit(root) // result DF stays lazy over the store
      val fs = new graft.store.SparkFactStore(s, root)
      fs.createStore("rt")
      val facts = events(s, d).orderBy(asc("event_id"))
        .selectExpr("event_type AS fact_type",
          "CAST(user_id AS STRING) AS subject",
          "CAST(props AS BINARY) AS payload_data",
          "CAST(NULL AS STRING) AS payload_format",
          "CAST(NULL AS STRING) AS payload_schema",
          "CAST(NULL AS MAP<STRING,STRING>) AS metadata",
          "CAST(NULL AS MAP<STRING,STRING>) AS tags")
      fs.bulkAppend("rt", facts)
      s.read.format("graft")
        .option("root", root.toString).option("store", "rt").load()
        .filter(col("position") >= 101L && col("position") <= 900L)
        .selectExpr("position", "fact_type", "subject",
          "CAST(length(payload_data) AS BIGINT) AS payload_len")
        .orderBy(asc("position"))
    }),

    // TRUE end-to-end WRITE roundtrip through the DataSource V2 surface:
    // the events rows are appended via df.write.format("graft") — executor
    // staging, prefix-sum positions, the shared BulkCommit CAS — then read
    // back through the facade-equivalent DSv2 scan with a pushed position
    // range. Positions follow (partition, row) order of the
    // orderBy(event_id) input, so the oracle replays row_number() over
    // event_id, exactly like the bulkAppend roundtrip above.
    "fs_dsv2_write_roundtrip" -> ((s, d) => {
      val root = java.nio.file.Files.createTempDirectory("graft-dsv2-wrt")
      EventFinders.cleanupAtExit(root)
      val fs = new graft.store.SparkFactStore(s, root)
      fs.createStore("wrt")
      events(s, d).orderBy(asc("event_id"))
        .selectExpr("event_type AS fact_type",
          "CAST(user_id AS STRING) AS subject",
          "CAST(props AS BINARY) AS payload_data",
          "CAST(NULL AS STRING) AS payload_format",
          "CAST(NULL AS STRING) AS payload_schema",
          "CAST(NULL AS MAP<STRING,STRING>) AS metadata",
          "CAST(NULL AS MAP<STRING,STRING>) AS tags")
        .write.format("graft")
        .option("root", root.toString).option("store", "wrt")
        .mode("append").save()
      s.read.format("graft")
        .option("root", root.toString).option("store", "wrt").load()
        .filter(col("position") >= 151L && col("position") <= 950L)
        .selectExpr("position", "fact_type", "subject",
          "CAST(length(payload_data) AS BIGINT) AS payload_len")
        .orderBy(asc("position"))
    }),

    // head pointer: max(position) without a scan-and-sort (SURVEY §2 #23)
    "fs_head_position" -> ((s, d) =>
      events(s, d).select(
        max(col("event_id")).as("head_position"), count(lit(1)).as("n_facts"))),

    // per-type stats: the store's type index as an aggregation
    "fs_type_stats" -> ((s, d) =>
      events(s, d).groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum((col("value").cast("decimal(18,4)") *
            lit(10000).cast("decimal(5,0)")).cast("bigint")).cast("bigint").as("sum_value_e4"),
          min(col("event_id")).as("first_position"),
          max(col("event_id")).as("last_position"))
        .orderBy(asc("event_type")))
  )

  def oracles: Map[String, String] = Map(
    "fs_find_by_id" ->
      s"SELECT $envelopeSql FROM events WHERE event_id = 4242",
    "fs_exists_by_id" ->
      ("SELECT count(*) FILTER (WHERE event_id = 4242) > 0 AS exists_flag, " +
        "count(*) FILTER (WHERE event_id = 99999999) > 0 AS missing_flag FROM events"),
    "fs_find_by_subject" ->
      s"SELECT $envelopeSql FROM events WHERE user_id = 7 ORDER BY event_id",
    "fs_find_by_subject_back" ->
      s"SELECT $envelopeSql FROM events WHERE user_id = 7 ORDER BY event_id DESC LIMIT 10",
    "fs_find_by_tags_back" ->
      (s"SELECT $envelopeSql FROM events WHERE event_type = 'click' AND " +
        "CAST(regexp_extract(props, '(\\d+)', 1) AS BIGINT) >= 50 " +
        "ORDER BY event_id DESC LIMIT 100"),
    "fs_tag_query" ->
      (s"SELECT $envelopeSql FROM events WHERE " +
        "(event_type IN ('click','view') AND CAST(regexp_extract(props, '(\\d+)', 1) AS BIGINT) < 20) " +
        "OR event_type = 'error' ORDER BY event_id"),
    "fs_time_range" ->
      (s"SELECT $envelopeSql FROM events WHERE epoch_us(ts) >= $T0 AND epoch_us(ts) < $T1 " +
        "ORDER BY event_id"),
    "fs_time_range_back" ->
      (s"SELECT $envelopeSql FROM events WHERE epoch_us(ts) >= $T0 AND epoch_us(ts) < $T1 " +
        "ORDER BY event_id DESC LIMIT 50"),
    "fs_replay_window" ->
      s"SELECT $envelopeSql FROM events WHERE event_id > 500 AND event_id <= 900 ORDER BY event_id",
    "fs_head_position" ->
      "SELECT max(event_id) AS head_position, count(*) AS n_facts FROM events",
    "fs_dsv2_roundtrip" ->
      ("WITH ordered AS (SELECT event_type, CAST(user_id AS VARCHAR) AS subject, " +
        "props, row_number() OVER (ORDER BY event_id) AS position FROM events) " +
        "SELECT position, event_type AS fact_type, subject, " +
        "CAST(length(props) AS BIGINT) AS payload_len FROM ordered " +
        "WHERE position BETWEEN 101 AND 900 ORDER BY position"),
    "fs_dsv2_write_roundtrip" ->
      ("WITH ordered AS (SELECT event_type, CAST(user_id AS VARCHAR) AS subject, " +
        "props, row_number() OVER (ORDER BY event_id) AS position FROM events) " +
        "SELECT position, event_type AS fact_type, subject, " +
        "CAST(length(props) AS BIGINT) AS payload_len FROM ordered " +
        "WHERE position BETWEEN 151 AND 950 ORDER BY position"),
    "fs_type_stats" ->
      ("SELECT event_type, count(*) AS n, " +
        "CAST(sum(CAST(CAST(value AS DECIMAL(18,4)) * CAST(10000 AS DECIMAL(5,0)) AS BIGINT)) AS BIGINT) AS sum_value_e4, " +
        "min(event_id) AS first_position, max(event_id) AS last_position " +
        "FROM events GROUP BY event_type ORDER BY event_type")
  )
}
