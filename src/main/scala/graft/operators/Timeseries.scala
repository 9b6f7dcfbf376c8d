package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators over the event log: rolling activity, robust
  * (median/MAD) daily anomaly detection, hour-of-day load profiles, and
  * week-over-week type-mix drift. Reference scope: factstore's
  * findInTimeRange / subscribe surface exists to feed exactly these
  * monitoring questions; the engine ships them as batch operators with the
  * same integer-exact discipline as the rest of the inventory.
  *
  * Physical discipline — every operator reduces to a grid FIRST:
  *
  *  - '''rolling_week''': the only corpus-scale step is one map-side-
  *    combined groupBy to (user, day); the rolling 7-day frame is a RANGE
  *    window over the user×day grid (≤ users·days rows), partitioned by
  *    user — never a per-event window.
  *  - '''daily_anomaly''': reduces to the (type, day) grid, then computes
  *    the per-type LOWER MEDIAN and MAD by rank windows on that grid
  *    (types·days rows). Integer deviations; a day is anomalous when
  *    |n − median| > 3·MAD. No floats, no approx-percentile.
  *  - '''hourly_profile''': (type, hour-of-day) histogram with exact
  *    shares and a per-type peak flag — two combine-friendly aggregates
  *    and a 120-row window.
  *  - '''type_drift''': weekly type-mix shares, then L1 drift between
  *    consecutive weeks via a lag window on the weeks×types grid.
  *
  * Determinism contract: epoch-micro integer time arithmetic (`div`),
  * lower-median (rank (n+1) div 2) instead of interpolated percentiles,
  * shares in exact basis points, total output order.
  */
object Timeseries {

  private val DayUs = 86400L * 1000000
  private val HourUs = 3600L * 1000000

  /** events with ts normalized to epoch-day / epoch-hour integers. */
  private def byDay(s: SparkSession, d: String): DataFrame =
    EventFinders.events(s, d).selectExpr(
      "user_id", "event_type", "value",
      s"(ts div 1000) div ${DayUs}L AS day",
      s"((ts div 1000) div ${HourUs}L) % 24 AS hour")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Rolling 7-day activity per user: events and active days in the
    // trailing week, emitted per (user, active day). One corpus-scale
    // groupBy; the RANGE frame runs on the user×day grid.
    "events_rolling_week" -> ((s, d) => {
      val grid = byDay(s, d)
        .groupBy(col("user_id"), col("day"))
        .agg(count(lit(1)).as("n_events"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rangeBetween(-6, 0)
      grid
        .withColumn("n_7d", sum(col("n_events")).over(w))
        .withColumn("active_days_7d", count(lit(1)).over(w))
        .orderBy(asc("user_id"), asc("day"))
    }),

    // Robust daily anomaly detection per event type: lower median and MAD
    // of the daily counts, flag days where |n - med| > 3*MAD. All ranking
    // happens on the (type, day) grid.
    "events_daily_anomaly" -> ((s, d) => {
      val grid = byDay(s, d)
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n"))
      val byType = Window.partitionBy(col("event_type"))
      // lower median of n: value at rank (cnt+1) div 2 ordered by (n, day)
      val med = grid
        .withColumn("rk", row_number().over(byType.orderBy(asc("n"), asc("day"))))
        .withColumn("cnt", count(lit(1)).over(byType))
        .withColumn("med", max(when(col("rk") === expr("(cnt + 1) div 2"), col("n"))).over(byType))
      // MAD: lower median of |n - med|, same rank trick on the deviations
      val mad = med
        .withColumn("dev", abs(col("n") - col("med")))
        .withColumn("drk", row_number().over(byType.orderBy(asc("dev"), asc("day"))))
        .withColumn("mad", max(when(col("drk") === expr("(cnt + 1) div 2"), col("dev"))).over(byType))
      mad
        .selectExpr("event_type", "day", "n", "med", "mad",
          "CASE WHEN dev > 3 * mad THEN 1L ELSE 0L END AS is_anomaly")
        .orderBy(asc("event_type"), asc("day"))
    }),

    // Hour-of-day load profile per event type with exact share and the
    // per-type peak hour flagged (ties broken by earlier hour).
    "events_hourly_profile" -> ((s, d) => {
      val hist = byDay(s, d)
        .groupBy(col("event_type"), col("hour"))
        .agg(count(lit(1)).as("n"))
      val byType = Window.partitionBy(col("event_type"))
      hist
        .withColumn("type_total", sum(col("n")).over(byType))
        .withColumn("rk", row_number().over(byType.orderBy(desc("n"), asc("hour"))))
        .selectExpr("event_type", "hour", "n",
          "(n * 10000) div type_total AS share_bp",
          "CASE WHEN rk = 1 THEN 1L ELSE 0L END AS is_peak")
        .orderBy(asc("event_type"), asc("hour"))
    }),

    // Week-over-week type-mix drift: weekly shares per type in basis
    // points, per-type delta to the previous week, and each week's total
    // L1 drift — all on the weeks×types grid after one corpus-scale
    // groupBy.
    "events_type_drift" -> ((s, d) => {
      val grid = byDay(s, d)
        .selectExpr("event_type", "day div 7 AS week")
        .groupBy(col("week"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val byWeek = Window.partitionBy(col("week"))
      val byType = Window.partitionBy(col("event_type")).orderBy(asc("week"))
      grid
        .withColumn("week_total", sum(col("n")).over(byWeek))
        .withColumn("share_bp", expr("(n * 10000) div week_total"))
        .withColumn("prev_share_bp", lag(col("share_bp"), 1).over(byType))
        .withColumn("delta_bp",
          when(col("prev_share_bp").isNull, lit(null).cast("long"))
            .otherwise(col("share_bp") - col("prev_share_bp")))
        .withColumn("week_l1_drift_bp", sum(abs(col("delta_bp"))).over(byWeek))
        .selectExpr("week", "event_type", "n", "share_bp", "delta_bp", "week_l1_drift_bp")
        .orderBy(asc("week"), asc("event_type"))
    })
  )

  def oracles: Map[String, String] = {
    val base = "SELECT user_id, event_type, value, " +
      "epoch_us(ts) // 86400000000 AS day, " +
      "(epoch_us(ts) // 3600000000) % 24 AS hour FROM events"
    Map(
      "events_rolling_week" ->
        (s"WITH b AS ($base), " +
          "g AS (SELECT user_id, day, count(*) AS n_events FROM b GROUP BY user_id, day) " +
          "SELECT user_id, day, n_events, " +
          "CAST(sum(n_events) OVER w AS BIGINT) AS n_7d, " +
          "CAST(count(*) OVER w AS BIGINT) AS active_days_7d " +
          "FROM g WINDOW w AS (PARTITION BY user_id ORDER BY day " +
          "RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) " +
          "ORDER BY user_id, day"),

      "events_daily_anomaly" ->
        (s"WITH b AS ($base), " +
          "g AS (SELECT event_type, day, count(*) AS n FROM b GROUP BY event_type, day), " +
          "r AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY n, day) AS rk, " +
          "count(*) OVER (PARTITION BY event_type) AS cnt FROM g), " +
          "m AS (SELECT *, max(CASE WHEN rk = (cnt + 1) // 2 THEN n END) " +
          "OVER (PARTITION BY event_type) AS med FROM r), " +
          "dv AS (SELECT *, abs(n - med) AS dev, row_number() OVER " +
          "(PARTITION BY event_type ORDER BY abs(n - med), day) AS drk FROM m), " +
          "md AS (SELECT *, max(CASE WHEN drk = (cnt + 1) // 2 THEN dev END) " +
          "OVER (PARTITION BY event_type) AS mad FROM dv) " +
          "SELECT event_type, day, n, med, mad, " +
          "CAST(CASE WHEN dev > 3 * mad THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly " +
          "FROM md ORDER BY event_type, day"),

      "events_hourly_profile" ->
        (s"WITH b AS ($base), " +
          "g AS (SELECT event_type, hour, count(*) AS n FROM b GROUP BY event_type, hour), " +
          "w AS (SELECT *, CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS type_total, " +
          "row_number() OVER (PARTITION BY event_type ORDER BY n DESC, hour) AS rk FROM g) " +
          "SELECT event_type, hour, n, (n * 10000) // type_total AS share_bp, " +
          "CAST(CASE WHEN rk = 1 THEN 1 ELSE 0 END AS BIGINT) AS is_peak " +
          "FROM w ORDER BY event_type, hour"),

      "events_type_drift" ->
        (s"WITH b AS ($base), " +
          "g AS (SELECT week, event_type, count(*) AS n FROM " +
          "(SELECT event_type, day // 7 AS week FROM b) GROUP BY week, event_type), " +
          "sh AS (SELECT *, CAST(sum(n) OVER (PARTITION BY week) AS BIGINT) AS week_total FROM g), " +
          "s2 AS (SELECT *, (n * 10000) // week_total AS share_bp FROM sh), " +
          "lg AS (SELECT *, lag(share_bp) OVER (PARTITION BY event_type ORDER BY week) AS prev_share_bp FROM s2), " +
          "dl AS (SELECT *, CASE WHEN prev_share_bp IS NULL THEN NULL " +
          "ELSE share_bp - prev_share_bp END AS delta_bp FROM lg) " +
          "SELECT week, event_type, n, share_bp, delta_bp, " +
          "CAST(sum(abs(delta_bp)) OVER (PARTITION BY week) AS BIGINT) AS week_l1_drift_bp " +
          "FROM dl ORDER BY week, event_type")
    )
  }
}
