package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Session-level event analytics: gap sessionization, ordered funnel
  * conversion, and cohort retention — the three questions every event-log
  * consumer asks right after the finder queries (reference scope: factstore
  * stores per-subject histories, `Fact.kt:37-47`; its users reconstruct
  * sessions/funnels downstream, so the engine ships them as first-class
  * operators over the same per-subject ordering the store guarantees).
  *
  * All three share one physical skeleton — a single hash exchange on
  * `user_id` — and everything after that exchange either stays inside the
  * same partitioning or reduces to a grid bounded by days/stages:
  *
  *  - '''sessionize''': per-user gap detection (30 min) is lag + running
  *    sum over one (user_id)-partitioned window; the per-session rollup
  *    groups by (user_id, session_idx), whose clustering is already
  *    satisfied by the window's hash partitioning (a superset of the
  *    partition key never re-shuffles), so the whole operator is ONE
  *    exchange + one sort at any scale.
  *  - '''funnel''': stage-reach times are three chained running mins over
  *    the SAME window spec (one sort, three Window operators, zero joins),
  *    then a two-level count-distinct-free aggregate to a single row.
  *  - '''retention''': first-seen day per user is a full-partition window
  *    min; (user, day) dedup again re-uses the user_id clustering; only the
  *    final cohort×offset rollup (days² rows at most) crosses the wire.
  *
  * Determinism contract (house rules): epoch-micro timestamps, unique
  * window order keys (ts_us, event_id), integer-exact shares in basis
  * points via `div`, total output order.
  */
object Sessions {

  /** Session gap: 30 minutes, in epoch micros. */
  private val GapUs = 1800L * 1000000

  private val DayUs = 86400L * 1000000

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Gap-based sessionization: a new session starts when a user is idle
    // >30 min. Emits one row per session with its span and size. lag +
    // conditional running sum; the rollup reuses the window's exchange.
    "events_session_spans" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(asc("ts_us"), asc("event_id"))
      EventFinders.events(s, d)
        .selectExpr("user_id", "event_id", "event_type", "ts div 1000 AS ts_us")
        .withColumn("new_sess",
          when(col("ts_us") - lag(col("ts_us"), 1).over(w) > GapUs || lag(col("ts_us"), 1).over(w).isNull, 1L)
            .otherwise(0L))
        .withColumn("session_idx",
          sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_idx"))
        .agg(
          count(lit(1)).as("n_events"),
          min(col("ts_us")).as("start_us"),
          max(col("ts_us")).as("end_us"),
          countDistinct(col("event_type")).as("n_types"))
        .selectExpr("user_id", "session_idx", "n_events",
          "start_us", "end_us", "end_us - start_us AS duration_us", "n_types")
        .orderBy(asc("user_id"), asc("session_idx"))
    }),

    // Ordered funnel view -> click -> purchase: a stage counts only if it
    // happens at-or-after the previous stage's first reach (order pinned by
    // (ts_us, event_id)). Three chained running mins over one window spec,
    // then one global rollup row with conversion in basis points.
    "events_funnel_conversion" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(asc("ts_us"), asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val base = EventFinders.events(s, d)
        .filter(col("event_type").isin("view", "click", "purchase"))
        .selectExpr("user_id", "event_id", "event_type", "ts div 1000 AS ts_us")
        .withColumn("v_ts",
          min(when(col("event_type") === "view", col("ts_us"))).over(w))
        .withColumn("c_ts",
          min(when(col("event_type") === "click" && col("v_ts").isNotNull, col("ts_us"))).over(w))
        .withColumn("p_ts",
          min(when(col("event_type") === "purchase" && col("c_ts").isNotNull, col("ts_us"))).over(w))
      base
        .groupBy(col("user_id"))
        .agg(
          max(col("v_ts").isNotNull.cast("long")).as("r1"),
          max(col("c_ts").isNotNull.cast("long")).as("r2"),
          max(col("p_ts").isNotNull.cast("long")).as("r3"))
        .agg(
          count(lit(1)).as("n_users"),
          sum(col("r1")).as("n_view"),
          sum(col("r2")).as("n_view_click"),
          sum(col("r3")).as("n_view_click_purchase"))
        .selectExpr("n_users", "n_view", "n_view_click", "n_view_click_purchase",
          "CASE WHEN n_view = 0 THEN NULL ELSE (n_view_click * 10000) div n_view END AS click_conv_bp",
          "CASE WHEN n_view_click = 0 THEN NULL ELSE (n_view_click_purchase * 10000) div n_view_click END AS purchase_conv_bp")
    }),

    // Cohort retention: users grouped by first-seen day; for each cohort,
    // how many come back k days later, as exact basis points of cohort
    // size. ONE corpus-scale shuffle: per-user (cohort_day, active-day set)
    // by a map-side-combined groupBy — the set is bounded by the retention
    // horizon in days, not by events. Everything after (explode, the
    // cohort×offset rollup, the cohort-size window) runs on grids bounded
    // by days², never touching the corpus again.
    "events_retention" -> ((s, d) => {
      val perUser = EventFinders.events(s, d)
        .selectExpr("user_id", s"(ts div 1000) div ${DayUs}L AS day")
        .groupBy(col("user_id"))
        .agg(min(col("day")).as("cohort_day"), collect_set(col("day")).as("days"))
      val cells = perUser
        .select(col("cohort_day"), explode(col("days")).as("day"))
        .select(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
        .groupBy(col("cohort_day"), col("day_offset"))
        .agg(count(lit(1)).as("n_users"))
      // cohort size = the offset-0 cell (every user is active on their own
      // cohort day), read via a window over the tiny grid — no re-scan.
      cells
        .withColumn("cohort_size",
          max(when(col("day_offset") === 0L, col("n_users")))
            .over(Window.partitionBy(col("cohort_day"))))
        .selectExpr("cohort_day", "day_offset", "n_users", "cohort_size",
          "(n_users * 10000) div cohort_size AS retained_bp")
        .orderBy(asc("cohort_day"), asc("day_offset"))
    }),

    // First-order Markov next-step model of the behavior log: the top-3
    // most likely next event types per current type, with exact
    // basis-point conditional probabilities. One user_id exchange builds
    // the (type, next) transition census (map-side combined); totals,
    // ranks and probabilities all run on the |types|² grid. The rank
    // window is WindowGroupLimit-prunable (rank ≤ 3). Complements
    // events_transition_rank (walk centrality) with the conditional
    // distribution a sequence model actually consumes.
    "events_markov_next" -> ((s, d) => {
      val byUser = Window.partitionBy(col("user_id")).orderBy(asc("event_id"))
      val pairs = EventFinders.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"))
        .withColumn("next_type", lead(col("event_type"), 1).over(byUser))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type"), col("next_type"))
        .agg(count(lit(1)).as("n"))
      val byType = Window.partitionBy(col("event_type"))
      pairs
        .withColumn("total", sum(col("n")).over(byType))
        .withColumn("rank", row_number().over(
          byType.orderBy(desc("n"), asc("next_type"))))
        .filter(col("rank") <= 3)
        .selectExpr("event_type", "CAST(rank AS BIGINT) AS rank", "next_type",
          "n", "(n * 10000) div total AS p_bp")
        .orderBy(asc("event_type"), asc("rank"))
    }),

    // Peak concurrent sessions per day — the capacity-planning number
    // (simultaneous live users) — by sweep-line over session endpoints,
    // never a self-join of intervals. Sessions are the 30-min-gap spans
    // (same build as events_session_spans), made half-open [start, end+1µs)
    // and CLIPPED at midnight into per-day segments (sequence explode; a
    // span crossing midnight re-opens as a day-start segment, so each
    // day's sweep starts at zero and days are independent). Each segment
    // yields a +1/−1 endpoint pair; ties at one instant process −1 before
    // +1 (ORDER BY ts, delta) so back-to-back sessions never overlap.
    // Scale shape: the endpoint stream is session-sized (events already
    // collapsed by the gap rollup) and the sweep is TWO-LEVEL — per-
    // (day, hour) delta sums roll up to a ≤24-row-per-day hour grid whose
    // cumulative sum is each hour's carry-in, and the running count
    // window partitions by (day, hour), so no single task ever sorts more
    // than one hour of one day's endpoints. A one-level day window is the
    // classic sweep-line skew trap at 100 TB (the busiest day lands on
    // one task); the hour grid carry removes it for the price of one
    // grid-sized broadcast join.
    "events_peak_concurrency" -> ((s, d) => {
      val dayUs = 86400L * 1000000
      val hourUs = 3600L * 1000000
      val w = Window.partitionBy(col("user_id")).orderBy(asc("ts_us"), asc("event_id"))
      val spans = EventFinders.events(s, d)
        .selectExpr("user_id", "event_id", "ts div 1000 AS ts_us")
        .withColumn("new_sess",
          when(col("ts_us") - lag(col("ts_us"), 1).over(w) > GapUs || lag(col("ts_us"), 1).over(w).isNull, 1L)
            .otherwise(0L))
        .withColumn("session_idx",
          sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_idx"))
        .agg(min(col("ts_us")).as("start_us"), (max(col("ts_us")) + 1L).as("end_us"))
      val endpoints = spans
        .withColumn("day", explode(expr(s"sequence(start_us div ${dayUs}L, (end_us - 1) div ${dayUs}L)")))
        .selectExpr("day",
          s"greatest(start_us, day * ${dayUs}L) AS seg_start",
          s"least(end_us, (day + 1) * ${dayUs}L) AS seg_end")
        .selectExpr("day",
          "explode(array(struct(seg_start AS ts, 1L AS delta), struct(seg_end AS ts, -1L AS delta))) AS e")
        .selectExpr("day", "e.ts AS ts", "e.delta AS delta",
          s"(e.ts - day * ${dayUs}L) div ${hourUs}L AS hour")
        .transform(CacheScope.persist)
      val hourCarry = endpoints.groupBy(col("day"), col("hour"))
        .agg(sum(col("delta")).as("hd"))
        .withColumn("carry_in",
          coalesce(sum(col("hd")).over(Window.partitionBy(col("day")).orderBy(asc("hour"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("day", "hour", "carry_in")
      val sweep = Window.partitionBy(col("day"), col("hour"))
        .orderBy(asc("ts"), asc("delta"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      endpoints.join(broadcast(hourCarry), Seq("day", "hour"))
        .withColumn("running", col("carry_in") + sum(col("delta")).over(sweep))
        .groupBy(col("day"))
        .agg(sum(when(col("delta") === 1L, 1L).otherwise(0L)).as("n_segments"),
          max(col("running")).as("peak_concurrent"))
        .orderBy(asc("day"))
    })
  )

  def oracles: Map[String, String] = Map(
    "events_session_spans" ->
      ("WITH b AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events), " +
        "m AS (SELECT *, CASE WHEN ts_us - lag(ts_us) OVER w > 1800000000 " +
        "OR lag(ts_us) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess " +
        "FROM b WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)), " +
        "sx AS (SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx FROM m) " +
        "SELECT user_id, session_idx, count(*) AS n_events, " +
        "min(ts_us) AS start_us, max(ts_us) AS end_us, " +
        "max(ts_us) - min(ts_us) AS duration_us, " +
        "CAST(count(DISTINCT event_type) AS BIGINT) AS n_types " +
        "FROM sx GROUP BY user_id, session_idx ORDER BY user_id, session_idx"),

    "events_funnel_conversion" ->
      ("WITH b AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us " +
        "FROM events WHERE event_type IN ('view','click','purchase')), " +
        "s1 AS (SELECT *, min(CASE WHEN event_type='view' THEN ts_us END) OVER w AS v_ts " +
        "FROM b WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), " +
        "s2 AS (SELECT *, min(CASE WHEN event_type='click' AND v_ts IS NOT NULL THEN ts_us END) OVER w AS c_ts " +
        "FROM s1 WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), " +
        "s3 AS (SELECT *, min(CASE WHEN event_type='purchase' AND c_ts IS NOT NULL THEN ts_us END) OVER w AS p_ts " +
        "FROM s2 WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), " +
        "u AS (SELECT user_id, max(CASE WHEN v_ts IS NOT NULL THEN 1 ELSE 0 END) AS r1, " +
        "max(CASE WHEN c_ts IS NOT NULL THEN 1 ELSE 0 END) AS r2, " +
        "max(CASE WHEN p_ts IS NOT NULL THEN 1 ELSE 0 END) AS r3 FROM s3 GROUP BY user_id) " +
        "SELECT count(*) AS n_users, CAST(sum(r1) AS BIGINT) AS n_view, " +
        "CAST(sum(r2) AS BIGINT) AS n_view_click, " +
        "CAST(sum(r3) AS BIGINT) AS n_view_click_purchase, " +
        "CASE WHEN sum(r1) = 0 THEN NULL ELSE CAST((sum(r2) * 10000) // sum(r1) AS BIGINT) END AS click_conv_bp, " +
        "CASE WHEN sum(r2) = 0 THEN NULL ELSE CAST((sum(r3) * 10000) // sum(r2) AS BIGINT) END AS purchase_conv_bp " +
        "FROM u"),

    "events_retention" ->
      ("WITH ud AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events), " +
        "c AS (SELECT *, min(day) OVER (PARTITION BY user_id) AS cohort_day FROM ud), " +
        "cells AS (SELECT cohort_day, day - cohort_day AS day_offset, count(*) AS n_users " +
        "FROM c GROUP BY cohort_day, day_offset), " +
        "w AS (SELECT *, max(CASE WHEN day_offset = 0 THEN n_users END) " +
        "OVER (PARTITION BY cohort_day) AS cohort_size FROM cells) " +
        "SELECT cohort_day, day_offset, n_users, cohort_size, " +
        "(n_users * 10000) // cohort_size AS retained_bp " +
        "FROM w ORDER BY cohort_day, day_offset"),

    "events_markov_next" ->
      ("WITH b AS (SELECT user_id, event_id, event_type FROM events), " +
        "l AS (SELECT event_type, lead(event_type) OVER " +
        "(PARTITION BY user_id ORDER BY event_id) AS next_type FROM b), " +
        "p AS (SELECT event_type, next_type, count(*) AS n FROM l " +
        "WHERE next_type IS NOT NULL GROUP BY event_type, next_type), " +
        "w AS (SELECT *, CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS total, " +
        "row_number() OVER (PARTITION BY event_type ORDER BY n DESC, next_type) AS rank FROM p) " +
        "SELECT event_type, CAST(rank AS BIGINT) AS rank, next_type, n, " +
        "(n * 10000) // total AS p_bp " +
        "FROM w WHERE rank <= 3 ORDER BY event_type, rank"),

    "events_peak_concurrency" ->
      ("WITH b AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events), " +
        "m AS (SELECT *, CASE WHEN ts_us - lag(ts_us) OVER w > 1800000000 " +
        "OR lag(ts_us) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess " +
        "FROM b WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)), " +
        "sx AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx FROM m), " +
        "spans AS (SELECT user_id, session_idx, min(ts_us) AS start_us, " +
        "max(ts_us) + 1 AS end_us FROM sx GROUP BY user_id, session_idx), " +
        "seg AS (SELECT unnest(range(start_us // 86400000000, (end_us - 1) // 86400000000 + 1)) AS day, " +
        "start_us, end_us FROM spans), " +
        "segc AS (SELECT day, greatest(start_us, day * 86400000000) AS seg_start, " +
        "least(end_us, (day + 1) * 86400000000) AS seg_end FROM seg), " +
        "ep0 AS (SELECT day, unnest([{'ts': seg_start, 'delta': 1::BIGINT}, " +
        "{'ts': seg_end, 'delta': (-1)::BIGINT}]) AS e FROM segc), " +
        "ep AS (SELECT day, e.ts AS ts, e.delta AS delta, " +
        "(e.ts - day * 86400000000) // 3600000000 AS hour FROM ep0), " +
        "hc AS (SELECT day, hour, coalesce(sum(hd) OVER (PARTITION BY day ORDER BY hour " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS carry_in FROM " +
        "(SELECT day, hour, sum(delta) AS hd FROM ep GROUP BY day, hour) _), " +
        "run AS (SELECT ep.day, delta, carry_in + sum(delta) OVER " +
        "(PARTITION BY ep.day, ep.hour ORDER BY ts, delta " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running " +
        "FROM ep JOIN hc ON hc.day = ep.day AND hc.hour = ep.hour) " +
        "SELECT day, sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END)::BIGINT AS n_segments, " +
        "CAST(max(running) AS BIGINT) AS peak_concurrent " +
        "FROM run GROUP BY day ORDER BY day")
  )
}
