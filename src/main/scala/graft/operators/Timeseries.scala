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

  /** Zero-filled per-type daily-count grid over each type's [min, max] day
    * span. Days with no events must appear as n=0 — autocorrelation and
    * change-point statistics are wrong on a gappy series. One corpus-scale
    * groupBy builds the counts; the span aggregate is |types| rows, and the
    * filled calendar (types×days) joins back to the counts grid — all
    * grid-sized work after the single big shuffle. */
  private def dayGrid(s: SparkSession, d: String): DataFrame = {
    // persisted: the span aggregate AND the zero-fill join both consume the
    // counts grid — without sharing, each re-scans the corpus
    val counts = CacheScope.persist(byDay(s, d)
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n")))
    val calendar = counts.groupBy(col("event_type"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("event_type"), explode(expr("sequence(d0, d1)")).as("day"))
    calendar.join(counts, Seq("event_type", "day"), "left")
      .na.fill(0L, Seq("n"))
  }

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
    // Inter-arrival statistics per event type, DAY-BUCKETED: gaps between
    // consecutive events of a type within one epoch day (ts order,
    // event_id tiebreak; cross-midnight gaps excluded by construction —
    // the declared semantics, mirrored in the oracle). The day bucket is
    // the skew guard: a lag window partitioned by type alone puts a whole
    // event type — terabytes — on one task, while (type, day) partitions
    // are bounded by daily volume. Gap moments are exact integers; the
    // squared-gap sum rides DECIMAL(38,0) and the dispersion term
    // quantizes gaps to MILLIS first (n·Σx²·10⁶ then provably fits
    // 38 digits at any n, since per-day Σgap ≤ 86 400 000 ms). The gap
    // index of dispersion (n·Σx²/(Σx)², ppm) separates Poisson-like
    // arrivals from bursty clumping — the inter-arrival complement of
    // events_burstiness's count-based dispersion.
    "events_interarrival_stats" -> ((s, d) => {
      val w = Window.partitionBy(col("event_type"), col("day"))
        .orderBy(asc("ts_us"), asc("event_id"))
      EventFinders.events(s, d)
        .selectExpr("event_type", "event_id", "ts div 1000 AS ts_us",
          s"(ts div 1000) div ${DayUs}L AS day")
        .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
        .filter(col("prev_us").isNotNull)
        .selectExpr("event_type", "ts_us - prev_us AS gap",
          "CAST((ts_us - prev_us) div 1000 AS DECIMAL(38,0)) AS gap_ms")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_gaps"),
          sum(col("gap")).as("sg"),
          min(col("gap")).as("min_gap_us"),
          max(col("gap")).as("max_gap_us"),
          sum(col("gap_ms")).as("sg_ms"),
          sum(expr("gap_ms * gap_ms")).as("sgg_ms"))
        .selectExpr("event_type", "n_gaps",
          "sg div n_gaps AS mean_gap_us",
          "min_gap_us", "max_gap_us",
          """CASE WHEN sg_ms = 0 THEN CAST(NULL AS BIGINT)
             ELSE CAST((n_gaps * sgg_ms * 1000000) div (sg_ms * sg_ms) AS BIGINT)
             END AS dispersion_ppm""")
        .orderBy(asc("event_type"))
    }),

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
    }),

    // Week-over-week per-type volume delta — the COUNT-space companion of
    // events_type_drift's share-space L1 (a type can hold its share while
    // the whole stream doubles; this catches that). One corpus-scale
    // groupBy to the weeks×types grid, then a lag window per type on the
    // grid. delta_ppm is exact integer division against the prior week;
    // the first observed week emits NULLs. This is the batch twin of the
    // typeWeeklyDelta streaming face (state = one (week, count) pair per
    // type), so the drift monitor has identical semantics live and in
    // backfill.
    "events_type_weekly_delta" -> ((s, d) => {
      val grid = byDay(s, d)
        .selectExpr("event_type", "day div 7 AS week")
        .groupBy(col("event_type"), col("week"))
        .agg(count(lit(1)).as("n"))
      val byType = Window.partitionBy(col("event_type")).orderBy(asc("week"))
      grid
        .withColumn("prev_week", lag(col("week"), 1).over(byType))
        .withColumn("prev_n", lag(col("n"), 1).over(byType))
        .selectExpr("week", "event_type", "n",
          // a gap in the weekly grid means "no prior ADJACENT week":
          // deltas against a non-adjacent week would understate burst
          // shapes, so they emit NULL exactly like the first week
          "CASE WHEN prev_week = week - 1 THEN prev_n ELSE CAST(NULL AS BIGINT) END AS prev_n")
        .withColumn("delta_ppm",
          expr("""CASE WHEN prev_n IS NULL OR prev_n = 0 THEN CAST(NULL AS BIGINT)
                  ELSE ((n - prev_n) * 1000000) div prev_n END"""))
        .orderBy(asc("week"), asc("event_type"))
    }),

    // Lag-1 / lag-7 autocorrelation of the per-type daily count series on
    // the ZERO-FILLED day grid (a gappy series biases r upward). Moment
    // sums are exact integers; only the final Pearson ratio touches
    // doubles, with a pinned evaluation order shared with the oracle so
    // floor(r·10⁶) is bit-identical. Work after the one corpus-scale
    // groupBy is grid-sized: a lag window + one combine-friendly aggregate
    // per (type, lag).
    "events_autocorr" -> ((s, d) => {
      val w = Window.partitionBy(col("event_type")).orderBy(asc("day"))
      dayGrid(s, d)
        .withColumn("y1", lag(col("n"), 1).over(w))
        .withColumn("y7", lag(col("n"), 7).over(w))
        .selectExpr("event_type", "n",
          "stack(2, 1L, y1, 7L, y7) AS (lag, y)")
        .filter(col("y").isNotNull)
        .groupBy(col("event_type"), col("lag"))
        .agg(
          count(lit(1)).as("n_pairs"),
          sum(col("n")).as("sx"), sum(col("y")).as("sy"),
          sum(expr("n * n")).as("sxx"), sum(expr("y * y")).as("syy"),
          sum(expr("n * y")).as("sxy"))
        .selectExpr("event_type", "lag", "n_pairs",
          "n_pairs * sxy - sx * sy AS cov_num",
          "n_pairs * sxx - sx * sx AS var_x_num",
          "n_pairs * syy - sy * sy AS var_y_num")
        .selectExpr("event_type", "lag", "n_pairs", "cov_num",
          """CASE WHEN var_x_num = 0 OR var_y_num = 0 THEN CAST(NULL AS BIGINT)
             ELSE CAST(floor(CAST(cov_num AS DOUBLE) * 1000000.0 /
               sqrt(CAST(var_x_num AS DOUBLE) * CAST(var_y_num AS DOUBLE))) AS BIGINT)
             END AS r_ppm""")
        .orderBy(asc("event_type"), asc("lag"))
    }),

    // Variance-to-mean dispersion index per event type over the
    // zero-filled day grid — the day-granularity burstiness gauge: D ≈ 1
    // is Poisson-compatible arrivals, D ≫ 1 is bursty/clumped traffic
    // (retries, batch jobs, incidents), D < 1 is super-regular (rate
    // limiting, schedulers). D = var/mean = (d·Σn² − (Σn)²)/(d·Σn),
    // e4-exact; the moment products are corpus-count-squared-sized so
    // they ride DECIMAL(38,0)/HUGEINT (the events_user_gini discipline).
    // Scale: the corpus collapses to the day grid; output is |types|.
    "events_dispersion_index" -> ((s, d) => {
      dayGrid(s, d)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          sum(col("n")).as("sn"),
          sum(expr("n * n")).as("snn"))
        .selectExpr("event_type", "n_days", "sn AS n_events",
          "(sn * 10000) div n_days AS mean_e4",
          """CASE WHEN sn = 0 THEN CAST(NULL AS BIGINT)
             ELSE CAST(((CAST(n_days AS DECIMAL(38,0)) * snn - CAST(sn AS DECIMAL(38,0)) * sn)
               * 10000) div (CAST(n_days AS DECIMAL(38,0)) * sn) AS BIGINT)
             END AS dispersion_e4""")
        .selectExpr("event_type", "n_days", "n_events", "mean_e4", "dispersion_e4",
          "CAST(CASE WHEN dispersion_e4 > 10000 THEN 1 ELSE 0 END AS BIGINT) AS overdispersed")
        .orderBy(asc("event_type"))
    }),

    // Lead-lag cross-correlation between event-TYPE daily series (does
    // `error` lead a `purchase` drop?) — the pairwise extension of
    // events_autocorr: r(x_t of type_a, y_{t+lag} of type_b) for lags
    // {0, 1, 7} over the shared zero-filled day grids. lag 0 appears in
    // both orientations (the matrix rendering); positive lags measure
    // type_a LEADING type_b. Same exact-moment discipline: integer
    // Σx/Σy/Σxy on the grid, one double sqrt at emission (IEEE sqrt is
    // correctly rounded, engine-agnostic), zero-variance → NULL. Scale:
    // the corpus collapses to the |types|×|days| grid before the pair
    // join; everything after is grid²-sized (types², not days²).
    "events_cross_correlation" -> ((s, d) => {
      val grid = dayGrid(s, d)
      val lags = Seq(0L, 1L, 7L)
      val x = grid.select(col("event_type").as("type_a"),
        col("day").as("dx"), col("n").as("nx"))
      val y = grid.select(col("event_type").as("type_b"),
        col("day").as("dy"), col("n").as("ny"))
      x.crossJoin(broadcast(s.createDataFrame(lags.map(Tuple1(_))).toDF("lag")))
        .join(y, col("dy") === col("dx") + col("lag") &&
          col("type_a") =!= col("type_b"))
        .groupBy(col("type_a"), col("type_b"), col("lag"))
        .agg(
          count(lit(1)).as("n_days"),
          sum(col("nx")).as("sx"), sum(col("ny")).as("sy"),
          sum(expr("nx * nx")).as("sxx"), sum(expr("ny * ny")).as("syy"),
          sum(expr("nx * ny")).as("sxy"))
        .selectExpr("type_a", "type_b", "lag", "n_days",
          "n_days * sxy - sx * sy AS cov_num",
          "n_days * sxx - sx * sx AS var_x_num",
          "n_days * syy - sy * sy AS var_y_num")
        .selectExpr("type_a", "type_b", "lag", "n_days",
          """CASE WHEN var_x_num = 0 OR var_y_num = 0 THEN CAST(NULL AS BIGINT)
             ELSE CAST(floor(CAST(cov_num AS DOUBLE) * 1000000.0 /
               sqrt(CAST(var_x_num AS DOUBLE) * CAST(var_y_num AS DOUBLE))) AS BIGINT)
             END AS r_ppm""")
        .orderBy(asc("type_a"), asc("type_b"), asc("lag"))
    }),

    // Integer EWMA anomaly detection per event type — the adaptive-
    // threshold twin of the median/MAD detector: level e and mean absolute
    // deviation v track the series recursively (e_d = (n_d + 3·e_{d-1})
    // div 4, v_d = (|n_d − e_{d-1}| + 3·v_{d-1}) div 4 — α = 1/4 in exact
    // integer arithmetic), and a day is anomalous when its deviation from
    // the PRIOR level exceeds 3·v_{d-1} (and a floor of 3, so a flat
    // series doesn't alarm on noise of ±1). The recursion runs as ONE
    // codegen'd `aggregate` HOF over each type's sorted day array: after
    // the single corpus-scale groupBy the per-type state is the zero-
    // filled day span (calendar-sized, bounded by the corpus's time range,
    // NOT its row count), so 100 TB of events still folds |days| elements
    // per type. First day seeds the level and emits nothing.
    "events_ewma_anomaly" -> ((s, d) => {
      val g = dayGrid(s, d)
        .groupBy(col("event_type"))
        .agg(array_sort(collect_list(struct(col("day"), col("n")))).as("ds"))
      g.filter(expr("size(ds) >= 2"))
        .selectExpr("event_type",
          """aggregate(
               slice(ds, 2, size(ds) - 1),
               named_struct(
                 'e', element_at(ds, 1).n,
                 'v', CAST(0 AS BIGINT),
                 'rows', CAST(array() AS ARRAY<STRUCT<day: BIGINT, n: BIGINT,
                   ewma_prev: BIGINT, dev: BIGINT, is_anomaly: BIGINT>>)),
               (acc, x) -> named_struct(
                 'e', (x.n + 3 * acc.e) div 4,
                 'v', (abs(x.n - acc.e) + 3 * acc.v) div 4,
                 'rows', concat(acc.rows, array(named_struct(
                   'day', x.day, 'n', x.n, 'ewma_prev', acc.e,
                   'dev', abs(x.n - acc.e),
                   'is_anomaly', CASE WHEN abs(x.n - acc.e) > 3 * acc.v
                                       AND abs(x.n - acc.e) > 3
                                      THEN 1L ELSE 0L END)))),
               acc -> acc.rows) AS rows""")
        .select(col("event_type"), explode(col("rows")).as("r"))
        .selectExpr("event_type", "r.day AS day", "r.n AS n",
          "r.ewma_prev AS ewma_prev", "r.dev AS dev",
          "r.is_anomaly AS is_anomaly")
        .orderBy(asc("event_type"), asc("day"))
    }),

    // Holt's linear-trend forecast per event type, integer-exact: level
    // l_d = (n_d + 3(l+t)) div 4 (α=1/4) and trend t_d = ((l_d − l) + 7t)
    // div 8 (β=1/8) fold over the zero-filled day grid (both engines
    // truncate integer division toward zero, so signed trends are safe);
    // the declared result is the NEXT WEEK's volume forecast per type
    // (f_{T+h} = l_T + h·t_T, h = 1..7) plus the one-step backtest MAE
    // ×10⁴ over the observed span — forecast quality and the forecast
    // itself in one 7·|types|-row answer. The fold carries four integers
    // (no per-day row accumulation), so per-type state is O(1) and the
    // only corpus-scale work is dayGrid's single groupBy.
    "events_holt_winters" -> ((s, d) => {
      val g = dayGrid(s, d)
        .groupBy(col("event_type"))
        .agg(array_sort(collect_list(struct(col("day"), col("n")))).as("ds"))
      g.filter(expr("size(ds) >= 2"))
        .selectExpr("event_type",
          """aggregate(
               slice(ds, 2, size(ds) - 1),
               named_struct(
                 'l', element_at(ds, 1).n,
                 't', CAST(0 AS BIGINT),
                 'sae', CAST(0 AS BIGINT),
                 'cnt', CAST(0 AS BIGINT)),
               (acc, x) -> named_struct(
                 'l', (x.n + 3 * (acc.l + acc.t)) div 4,
                 't', (((x.n + 3 * (acc.l + acc.t)) div 4 - acc.l) + 7 * acc.t) div 8,
                 'sae', acc.sae + abs(x.n - (acc.l + acc.t)),
                 'cnt', acc.cnt + 1L),
               acc -> acc) AS st""")
        .selectExpr("event_type", "st.l AS level", "st.t AS trend",
          "(st.sae * 10000) div st.cnt AS mae_e4")
        .selectExpr("event_type", "explode(sequence(1, 7)) AS h",
          "level", "trend", "mae_e4")
        .selectExpr("event_type", "CAST(h AS BIGINT) AS horizon",
          "level + h * trend AS forecast", "level", "trend", "mae_e4")
        .orderBy(asc("event_type"), asc("horizon"))
    }),

    // Forecast BACKTEST: hold out each type's final week, train the same
    // integer Holt fold on everything before it, and score the h=1..7
    // forecasts against the held-out actuals — per-horizon absolute error,
    // not the one-step in-sample MAE events_holt_winters reports. This is
    // the ann_recall_eval discipline applied to forecasting: the eval
    // replays the EXACT production fold (same α/β integer recursions), so
    // both engines must agree on every forecast AND every error, and a
    // fold change shows up here one round before it corrupts the served
    // forecast. Corpus-scale work is dayGrid's single groupBy; the fold
    // carries two integers per type and the horizon explode is 7 rows.
    "events_forecast_backtest" -> ((s, d) => {
      val g = dayGrid(s, d)
        .groupBy(col("event_type"))
        .agg(array_sort(collect_list(struct(col("day"), col("n")))).as("ds"))
      // ≥2 train points + 7 test days
      g.filter(expr("size(ds) >= 9"))
        .selectExpr("event_type",
          "slice(ds, 1, size(ds) - 7) AS train",
          "slice(ds, size(ds) - 6, 7) AS test")
        .selectExpr("event_type", "test",
          """aggregate(
               slice(train, 2, size(train) - 1),
               named_struct('l', element_at(train, 1).n, 't', CAST(0 AS BIGINT)),
               (acc, x) -> named_struct(
                 'l', (x.n + 3 * (acc.l + acc.t)) div 4,
                 't', (((x.n + 3 * (acc.l + acc.t)) div 4 - acc.l) + 7 * acc.t) div 8),
               acc -> acc) AS st""")
        .selectExpr("event_type", "st", "posexplode(test) AS (pos, a)")
        .selectExpr("event_type",
          "CAST(pos + 1 AS BIGINT) AS horizon",
          "st.l + (pos + 1) * st.t AS forecast",
          "a.n AS actual")
        .selectExpr("event_type", "horizon", "forecast", "actual",
          "abs(forecast - actual) AS abs_err")
        .orderBy(asc("event_type"), asc("horizon"))
    }),

    // Exact bucketed value percentiles per event type — the BATCH twin of
    // the valueQuantiles streaming face (same 512-bucket floor domain,
    // same bounded-domain rank rule as lineitem_delay_percentiles), so
    // stream and batch answer the same question with pinned-identical
    // semantics. One map-side-combined groupBy to the (type × ≤512)
    // histogram grid; the cumulative window and percentile picks run on
    // the grid. QuantBuckets is the SHARED constant with the face —
    // a drift would break StreamingQuantilesSpec's parity leg.
    "events_value_percentiles" -> ((s, d) => {
      val nb = graft.streaming.FactStateStreams.QuantBuckets
      val hist = EventFinders.events(s, d)
        .selectExpr("event_type",
          s"CAST(least(greatest(floor(value), 0.0), ${nb - 1}.0) AS BIGINT) AS bucket")
        .groupBy(col("event_type"), col("bucket"))
        .agg(count(lit(1)).as("n"))
      val byType = Window.partitionBy(col("event_type"))
      hist
        .withColumn("cum", sum(col("n")).over(
          byType.orderBy(asc("bucket"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("total", sum(col("n")).over(byType))
        .groupBy(col("event_type"))
        .agg(max(col("total")).cast("bigint").as("n_events"),
          min(when(expr("cum * 100 >= total * 50"), col("bucket"))).as("p50"),
          min(when(expr("cum * 100 >= total * 90"), col("bucket"))).as("p90"),
          min(when(expr("cum * 100 >= total * 99"), col("bucket"))).as("p99"),
          max(col("bucket")).as("max_bucket"))
        .orderBy(asc("event_type"))
    }),

    // Burstiness census per event type: the Fano factor (variance/mean of
    // the zero-filled daily counts, ×10⁶) — the dispersion diagnostic
    // that separates Poisson-like steady traffic (F ≈ 1e6) from bursty
    // arrivals (F ≫ 1e6); a quiet-day-heavy type can't hide because the
    // zero-filled grid is the population. Exact cross-multiplied
    // integers: F = (n·Σx² − (Σx)²) / (n·Σx); the wide products ride
    // DECIMAL(38,0)/HUGEINT (Σx² ≈ 3e20 at 100 TB). One grid-sized
    // aggregate over the shared dayGrid cache.
    "events_burstiness" -> ((s, d) => {
      dayGrid(s, d)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          sum(col("n")).as("sx"),
          sum(expr("CAST(n AS DECIMAL(38,0)) * n")).as("sxx"))
        .selectExpr("event_type",
          "CAST(n_days AS BIGINT) AS n_days",
          "CAST(sx AS BIGINT) AS n_events",
          "(sx * 100) div n_days AS mean_e2",
          """CASE WHEN sx = 0 THEN CAST(NULL AS BIGINT) ELSE
             CAST(((CAST(n_days AS DECIMAL(38,0)) * sxx -
                    CAST(sx AS DECIMAL(38,0)) * CAST(sx AS DECIMAL(38,0))) * 1000000)
             div (CAST(n_days AS DECIMAL(38,0)) * CAST(sx AS DECIMAL(38,0))) AS BIGINT)
             END AS fano_e6""")
        .orderBy(asc("event_type"))
    }),

    // Day-of-week seasonality profile per event type: the zero-filled
    // grid folds to a 7-row-per-type dow census (dow = (epochday + 4) % 7,
    // 0 = Sunday — pure integer arithmetic, no date functions to disagree
    // across engines), with exact per-dow mean (×100), share (ppm of the
    // type's events) and peak rank. The weekly-periodicity twin of
    // events_hourly_profile: grid days with NO events count toward the
    // dow's day denominator, so a type active only on weekdays shows true
    // zero-mean weekends rather than a survivor-biased flat profile.
    // Corpus-scale work is dayGrid's single groupBy; everything here runs
    // on the 7×|types| grid.
    "events_dow_seasonality" -> ((s, d) => {
      val g = dayGrid(s, d)
        .selectExpr("event_type", "pmod(day + 4, 7) AS dow", "n")
        .groupBy(col("event_type"), col("dow"))
        .agg(count(lit(1)).as("n_days"), sum(col("n")).as("n_events"))
      val byType = Window.partitionBy(col("event_type"))
      g.withColumn("tot", sum(col("n_events")).over(byType))
        .selectExpr("event_type", "dow", "n_days", "n_events",
          "(n_events * 100) div n_days AS mean_e2",
          "(n_events * 1000000) div tot AS share_ppm")
        .withColumn("peak_rank", row_number().over(
          byType.orderBy(desc("mean_e2"), asc("dow"))).cast("bigint"))
        .orderBy(asc("event_type"), asc("dow"))
    }),

    // CUSUM change-point per event type: on the zero-filled grid, the
    // drift statistic G_d = |cumsum_d·N − T·d| (cross-multiplied — exact
    // integers, no T/N fraction) peaks at the most likely level shift;
    // ties break earliest. Means either side of the split are exact e4
    // fixed-point. Everything after the corpus groupBy is two windows and
    // a rank-1 filter on the grid.
    // Seasonal decomposition (day-of-week model) with the top-5 anomalous
    // residuals per type: each grid day's count minus its type's same-dow
    // mean — the "was Tuesday big for a Tuesday" question that raw spike
    // detection (events_spike_days: global mean) and the dow census
    // (events_dow_seasonality: no residuals) each miss. Zero-filled grid
    // (a quiet Tuesday must pull the Tuesday mean down); the dow model is
    // a 7-slot census per type; the residual rank window runs on the day
    // grid partitioned by type. All integer: means e2-scaled with div,
    // residual_e2 = n·100 − mean_e2 exact.
    "events_seasonal_decompose" -> ((s, d) => {
      val g = dayGrid(s, d).withColumn("dow", expr("(day + 4) % 7"))
      val model = g.groupBy(col("event_type"), col("dow"))
        .agg(count(lit(1)).as("nd"), sum(col("n")).as("sd"))
        .selectExpr("event_type", "dow", "(sd * 100) div nd AS dow_mean_e2")
      g.join(model, Seq("event_type", "dow"))
        .selectExpr("event_type", "day", "dow", "n", "dow_mean_e2",
          "n * 100 - dow_mean_e2 AS residual_e2")
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("event_type"))
            .orderBy(abs(col("residual_e2")).desc, asc("day"))))
        .filter(col("rank") <= 5)
        .select(col("event_type"), col("rank").cast("bigint").as("rank"),
          col("day"), col("dow"), col("n"), col("dow_mean_e2"),
          col("residual_e2"))
        .orderBy(asc("event_type"), asc("rank"))
    }),

    // Sequential (one-sided, upper) CUSUM control chart per type — the
    // CAUSAL companion of events_cusum's retrospective argmax: reference
    // μ₀ is fixed from the first 14 closed grid days (warm-up), then
    // S⁺_t = max(0, S⁺_{t-1} + (n_t − μ₀ − μ₀/10)) accrues day by day and
    // alarms at 5μ₀. The recursive max(0,·) fold is window-expressible
    // through the prefix identity S⁺_t = P_t − min(0, min_{j≤t} P_j) with
    // P the plain prefix sum of deviations — so the batch plan is one
    // grid groupBy + two grid-sized windows, and the SAME fold runs live
    // as the cusumAlarms streaming face (one (warm, μ₀, S⁺) cursor per
    // type), pinned to this query by StreamingCusumSpec. Types with ≤14
    // grid days emit nothing (still in warm-up). All integer e2
    // arithmetic; both engines truncate μ₀ identically.
    "events_cusum_alarms" -> ((s, d) => {
      val byType = Window.partitionBy(col("event_type"))
      val byDayW = byType.orderBy(asc("day"))
      val run = byDayW.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val g = dayGrid(s, d)
        .withColumn("idx", row_number().over(byDayW))
      val warm = g.filter(col("idx") <= 14)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("wd"), sum(col("n")).as("ws"))
        .filter(col("wd") === 14)
        .selectExpr("event_type", "(ws * 100) div 14 AS mu0_e2")
      g.filter(col("idx") > 14)
        .join(warm, Seq("event_type"))
        .withColumn("dev_e2",
          expr("n * 100 - mu0_e2 - (mu0_e2 div 10)"))
        .withColumn("p", sum(col("dev_e2")).over(run))
        .withColumn("s_plus_e2",
          expr("p - least(CAST(0 AS BIGINT), min(p) OVER (PARTITION BY event_type ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))"))
        .selectExpr("event_type", "day", "n", "mu0_e2", "s_plus_e2",
          "CASE WHEN s_plus_e2 >= 5 * mu0_e2 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS alarm")
        .orderBy(asc("event_type"), asc("day"))
    }),

    "events_cusum" -> ((s, d) => {
      val byType = Window.partitionBy(col("event_type"))
      val run = byType.orderBy(asc("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      dayGrid(s, d)
        .withColumn("idx", row_number().over(byType.orderBy(asc("day"))))
        .withColumn("cum", sum(col("n")).over(run))
        .withColumn("n_days", count(lit(1)).over(byType))
        .withColumn("total", sum(col("n")).over(byType))
        .withColumn("g", abs(expr("cum * n_days - total * idx")))
        .withColumn("rk", row_number().over(byType.orderBy(desc("g"), asc("day"))))
        .filter(col("rk") === 1)
        .selectExpr("event_type", "day AS change_day", "g AS g_max",
          "n_days", "total",
          "(cum * 10000) div idx AS mean_before_e4",
          """CASE WHEN idx = n_days THEN CAST(NULL AS BIGINT)
             ELSE ((total - cum) * 10000) div (n_days - idx) END AS mean_after_e4""")
        .orderBy(asc("event_type"))
    }),

    // Theil–Sen robust trend per type: the median of all pairwise slopes
    // over the zero-filled day grid — the outlier-immune answer to "is
    // this event family growing" (OLS is wrecked by one spike day; the
    // breakdown point here is 29%). Slopes are exact e6 integers under
    // FLOOR division — Spark's `div` truncates toward zero and DuckDB's
    // `//` floors, so both engines compute (a - pmod(a, dd)) / dd, which
    // is exactly divisible and therefore identical under either rounding.
    // Medians are lower medians by rank — the daily_anomaly discipline.
    // Scale: one corpus-scale groupBy builds the grid; the pair self-join
    // is days²/2 PER TYPE (grid-sized, never corpus-sized) and the median
    // windows run on that pair grid. Intercept = median of per-point
    // residual intercepts at the type's first grid day.
    "events_theil_sen_trend" -> ((s, d) => {
      val byType = Window.partitionBy(col("event_type"))
      val g = CacheScope.persist(
        dayGrid(s, d)
          .withColumn("d0", min(col("day")).over(byType))
          .selectExpr("event_type", "day - d0 AS t", "n"))
      val a = g.selectExpr("event_type", "t AS ti", "n AS ni")
      val b = g.selectExpr("event_type", "t AS tj", "n AS nj")
      val slopes = a.join(b, Seq("event_type")).filter(col("tj") > col("ti"))
        .selectExpr("event_type",
          "(nj - ni) * 1000000 AS num", "tj - ti AS dd")
        .selectExpr("event_type", "(num - pmod(num, dd)) div dd AS slope_e6")
      val slopeMed = slopes
        .withColumn("rk", row_number().over(byType.orderBy(asc("slope_e6"))))
        .withColumn("cnt", count(lit(1)).over(byType))
        .filter(expr("rk = (cnt + 1) div 2"))
        .selectExpr("event_type", "cnt AS n_pairs", "slope_e6")
      // the residual intercept itself is count-sized (fits BIGINT), but the
      // slope_e6·t product can pass 2^63 at 1e9-events/day scale — the
      // advisor's overflow class — so the arithmetic rides DECIMAL(38,0)
      val icept = g.join(slopeMed, Seq("event_type"))
        .selectExpr("event_type",
          "CAST(CAST(n AS DECIMAL(38,0)) * 1000000 - CAST(slope_e6 AS DECIMAL(38,0)) * t AS BIGINT) AS ic_e6")
        .withColumn("rk", row_number().over(byType.orderBy(asc("ic_e6"))))
        .withColumn("cnt", count(lit(1)).over(byType))
        .filter(expr("rk = (cnt + 1) div 2"))
        .selectExpr("event_type", "cnt AS n_days", "ic_e6 AS intercept_e6")
      slopeMed.join(icept, Seq("event_type"))
        .select(col("event_type"), col("n_days"), col("n_pairs"),
          col("slope_e6"), col("intercept_e6"))
        .orderBy(asc("event_type"))
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

      "events_interarrival_stats" ->
        ("WITH b AS (SELECT event_type, event_id, epoch_us(ts) AS ts_us, " +
          "epoch_us(ts) // 86400000000 AS day FROM events), " +
          "l AS (SELECT event_type, ts_us - lag(ts_us, 1) OVER " +
          "(PARTITION BY event_type, day ORDER BY ts_us, event_id) AS gap FROM b), " +
          "g AS (SELECT event_type, gap, gap // 1000 AS gap_ms FROM l WHERE gap IS NOT NULL) " +
          "SELECT event_type, count(*) AS n_gaps, " +
          "CAST(sum(gap) // count(*) AS BIGINT) AS mean_gap_us, " +
          "min(gap) AS min_gap_us, max(gap) AS max_gap_us, " +
          "CASE WHEN sum(gap_ms) = 0 THEN CAST(NULL AS BIGINT) " +
          "ELSE CAST((count(*) * sum(gap_ms * gap_ms) * 1000000) // " +
          "(sum(gap_ms) * sum(gap_ms)) AS BIGINT) END AS dispersion_ppm " +
          "FROM g GROUP BY event_type ORDER BY event_type"),

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
          "FROM dl ORDER BY week, event_type"),

      "events_type_weekly_delta" ->
        (s"WITH b AS ($base), " +
          "g AS (SELECT event_type, day // 7 AS week, count(*) AS n FROM b GROUP BY event_type, week), " +
          "l AS (SELECT week, event_type, n, " +
          "lag(week) OVER w AS prev_week, lag(n) OVER w AS prev_n0 " +
          "FROM g WINDOW w AS (PARTITION BY event_type ORDER BY week)), " +
          "a AS (SELECT week, event_type, n, " +
          "CASE WHEN prev_week = week - 1 THEN prev_n0 ELSE NULL END AS prev_n FROM l) " +
          "SELECT week, event_type, n, prev_n, " +
          "CASE WHEN prev_n IS NULL OR prev_n = 0 THEN NULL " +
          "ELSE ((n - prev_n) * 1000000) // prev_n END AS delta_ppm " +
          "FROM a ORDER BY week, event_type"),

      "events_autocorr" ->
        (s"WITH b AS ($base), $zeroFilledGrid, " +
          "l AS (SELECT event_type, day, n, lag(n, 1) OVER w AS y1, lag(n, 7) OVER w AS y7 " +
          "FROM z WINDOW w AS (PARTITION BY event_type ORDER BY day)), " +
          "u AS (SELECT event_type, n, CAST(1 AS BIGINT) AS lag, y1 AS y FROM l " +
          "UNION ALL SELECT event_type, n, CAST(7 AS BIGINT), y7 FROM l), " +
          "a AS (SELECT event_type, lag, count(*) AS n_pairs, " +
          "CAST(sum(n) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy, " +
          "CAST(sum(n * n) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy, " +
          "CAST(sum(n * y) AS BIGINT) AS sxy FROM u WHERE y IS NOT NULL GROUP BY event_type, lag), " +
          "m AS (SELECT event_type, lag, n_pairs, " +
          "n_pairs * sxy - sx * sy AS cov_num, " +
          "n_pairs * sxx - sx * sx AS var_x_num, " +
          "n_pairs * syy - sy * sy AS var_y_num FROM a) " +
          "SELECT event_type, lag, n_pairs, cov_num, " +
          "CASE WHEN var_x_num = 0 OR var_y_num = 0 THEN NULL " +
          "ELSE CAST(floor(CAST(cov_num AS DOUBLE) * 1000000.0 / " +
          "sqrt(CAST(var_x_num AS DOUBLE) * CAST(var_y_num AS DOUBLE))) AS BIGINT) END AS r_ppm " +
          "FROM m ORDER BY event_type, lag"),

      "events_dispersion_index" ->
        (s"WITH b AS ($base), $zeroFilledGrid, " +
          "a AS (SELECT event_type, count(*) AS n_days, " +
          "CAST(sum(n) AS BIGINT) AS sn, CAST(sum(n * n) AS BIGINT) AS snn " +
          "FROM z GROUP BY event_type) " +
          "SELECT event_type, n_days, sn AS n_events, " +
          "(sn * 10000) // n_days AS mean_e4, " +
          "CASE WHEN sn = 0 THEN CAST(NULL AS BIGINT) " +
          "ELSE CAST(((CAST(n_days AS HUGEINT) * snn - CAST(sn AS HUGEINT) * sn) " +
          "* 10000) // (CAST(n_days AS HUGEINT) * sn) AS BIGINT) END AS dispersion_e4, " +
          "CAST(CASE WHEN (CASE WHEN sn = 0 THEN CAST(NULL AS BIGINT) " +
          "ELSE CAST(((CAST(n_days AS HUGEINT) * snn - CAST(sn AS HUGEINT) * sn) " +
          "* 10000) // (CAST(n_days AS HUGEINT) * sn) AS BIGINT) END) > 10000 " +
          "THEN 1 ELSE 0 END AS BIGINT) AS overdispersed " +
          "FROM a ORDER BY event_type"),

      "events_cross_correlation" ->
        (s"WITH b AS ($base), $zeroFilledGrid, " +
          "lg(lag) AS (VALUES (CAST(0 AS BIGINT)), (CAST(1 AS BIGINT)), (CAST(7 AS BIGINT))), " +
          "j AS (SELECT x.event_type AS type_a, y.event_type AS type_b, lg.lag, " +
          "x.n AS nx, y.n AS ny FROM z x CROSS JOIN lg JOIN z y " +
          "ON y.day = x.day + lg.lag AND x.event_type <> y.event_type), " +
          "a AS (SELECT type_a, type_b, lag, count(*) AS n_days, " +
          "CAST(sum(nx) AS BIGINT) AS sx, CAST(sum(ny) AS BIGINT) AS sy, " +
          "CAST(sum(nx * nx) AS BIGINT) AS sxx, CAST(sum(ny * ny) AS BIGINT) AS syy, " +
          "CAST(sum(nx * ny) AS BIGINT) AS sxy FROM j GROUP BY type_a, type_b, lag), " +
          "m AS (SELECT type_a, type_b, lag, n_days, " +
          "n_days * sxy - sx * sy AS cov_num, " +
          "n_days * sxx - sx * sx AS var_x_num, " +
          "n_days * syy - sy * sy AS var_y_num FROM a) " +
          "SELECT type_a, type_b, lag, n_days, " +
          "CASE WHEN var_x_num = 0 OR var_y_num = 0 THEN NULL " +
          "ELSE CAST(floor(CAST(cov_num AS DOUBLE) * 1000000.0 / " +
          "sqrt(CAST(var_x_num AS DOUBLE) * CAST(var_y_num AS DOUBLE))) AS BIGINT) END AS r_ppm " +
          "FROM m ORDER BY type_a, type_b, lag"),

      "events_ewma_anomaly" ->
        // the EWMA recursion as a recursive CTE stepping day+1 on the
        // zero-filled grid; rec rows carry (e, v) AND the prior (e, v),
        // so the emitted deviation/flag is against the PRE-update level,
        // matching the Spark fold
        (s"WITH RECURSIVE b AS ($base), $zeroFilledGrid, " +
          "rec(event_type, day, n, e, v, prev_e, prev_v, d1) AS (" +
          "SELECT z.event_type, z.day, z.n, z.n, CAST(0 AS BIGINT), " +
          "CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), s.d1 " +
          "FROM z JOIN span s ON s.event_type = z.event_type AND z.day = s.d0 " +
          "UNION ALL " +
          "SELECT r.event_type, z.day, z.n, " +
          "(z.n + 3 * r.e) // 4, (abs(z.n - r.e) + 3 * r.v) // 4, " +
          "r.e, r.v, r.d1 " +
          "FROM rec r JOIN z ON z.event_type = r.event_type AND z.day = r.day + 1 " +
          "WHERE r.day < r.d1) " +
          "SELECT event_type, day, n, prev_e AS ewma_prev, " +
          "abs(n - prev_e) AS dev, " +
          "CAST(CASE WHEN abs(n - prev_e) > 3 * prev_v " +
          "AND abs(n - prev_e) > 3 THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly " +
          "FROM rec WHERE prev_e IS NOT NULL ORDER BY event_type, day"),

      "events_holt_winters" ->
        // the Holt (level, trend, sum-abs-err) fold as a recursive CTE on
        // the zero-filled grid; both engines truncate integer division
        // toward zero, so the signed trend recursion agrees exactly
        (s"WITH RECURSIVE b AS ($base), $zeroFilledGrid, " +
          "rec(event_type, day, l, t, sae, cnt, d1) AS (" +
          "SELECT z.event_type, z.day, z.n, CAST(0 AS BIGINT), " +
          "CAST(0 AS BIGINT), CAST(0 AS BIGINT), s.d1 " +
          "FROM z JOIN span s ON s.event_type = z.event_type AND z.day = s.d0 " +
          "UNION ALL " +
          "SELECT r.event_type, z.day, " +
          "(z.n + 3 * (r.l + r.t)) // 4, " +
          "(((z.n + 3 * (r.l + r.t)) // 4 - r.l) + 7 * r.t) // 8, " +
          "r.sae + abs(z.n - (r.l + r.t)), r.cnt + 1, r.d1 " +
          "FROM rec r JOIN z ON z.event_type = r.event_type AND z.day = r.day + 1 " +
          "WHERE r.day < r.d1) " +
          "SELECT event_type, h.horizon AS horizon, l + h.horizon * t AS forecast, " +
          "l AS level, t AS trend, (sae * 10000) // cnt AS mae_e4 " +
          "FROM rec, unnest(range(1, 8)) AS h(horizon) " +
          "WHERE day = d1 AND cnt > 0 ORDER BY event_type, horizon"),

      "events_forecast_backtest" ->
        // same Holt recursion trained only to d1 − 7, forecasts joined
        // back to the held-out week's zero-filled actuals
        (s"WITH RECURSIVE b AS ($base), $zeroFilledGrid, " +
          "rec(event_type, day, l, t, dcut) AS (" +
          "SELECT z.event_type, z.day, z.n, CAST(0 AS BIGINT), s.d1 - 7 " +
          "FROM z JOIN span s ON s.event_type = z.event_type AND z.day = s.d0 " +
          "WHERE s.d1 - s.d0 >= 8 " +
          "UNION ALL " +
          "SELECT r.event_type, z.day, " +
          "(z.n + 3 * (r.l + r.t)) // 4, " +
          "(((z.n + 3 * (r.l + r.t)) // 4 - r.l) + 7 * r.t) // 8, r.dcut " +
          "FROM rec r JOIN z ON z.event_type = r.event_type AND z.day = r.day + 1 " +
          "WHERE r.day < r.dcut), " +
          "fc AS (SELECT event_type, day, l, t FROM rec WHERE day = dcut), " +
          "ex AS (SELECT event_type, day, l, t, h.horizon AS horizon " +
          "FROM fc, unnest(range(1, 8)) AS h(horizon)) " +
          "SELECT ex.event_type AS event_type, ex.horizon AS horizon, " +
          "ex.l + ex.horizon * ex.t AS forecast, " +
          "z.n AS actual, abs(ex.l + ex.horizon * ex.t - z.n) AS abs_err " +
          "FROM ex JOIN z ON z.event_type = ex.event_type AND z.day = ex.day + ex.horizon " +
          "ORDER BY ex.event_type, ex.horizon"),

      "events_value_percentiles" -> {
        val nb = graft.streaming.FactStateStreams.QuantBuckets
        s"WITH b AS ($base), " +
          s"h AS (SELECT event_type, CAST(least(greatest(floor(value), 0.0), ${nb - 1}.0) AS BIGINT) AS bucket, " +
          "count(*) AS n FROM b GROUP BY 1, 2), " +
          "c AS (SELECT event_type, bucket, " +
          "CAST(sum(n) OVER (PARTITION BY event_type ORDER BY bucket " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum, " +
          "CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS total FROM h) " +
          "SELECT event_type, max(total) AS n_events, " +
          "min(CASE WHEN cum * 100 >= total * 50 THEN bucket END) AS p50, " +
          "min(CASE WHEN cum * 100 >= total * 90 THEN bucket END) AS p90, " +
          "min(CASE WHEN cum * 100 >= total * 99 THEN bucket END) AS p99, " +
          "max(bucket) AS max_bucket " +
          "FROM c GROUP BY event_type ORDER BY event_type"
      },

      "events_burstiness" ->
        (s"WITH b AS ($base), $zeroFilledGrid, " +
          "a AS (SELECT event_type, count(*) AS n_days, CAST(sum(n) AS BIGINT) AS sx, " +
          "sum(CAST(n AS HUGEINT) * n) AS sxx FROM z GROUP BY event_type) " +
          "SELECT event_type, n_days, sx AS n_events, (sx * 100) // n_days AS mean_e2, " +
          "CASE WHEN sx = 0 THEN CAST(NULL AS BIGINT) ELSE " +
          "CAST(((CAST(n_days AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx) * 1000000) " +
          "// (CAST(n_days AS HUGEINT) * sx) AS BIGINT) END AS fano_e6 " +
          "FROM a ORDER BY event_type"),

      "events_dow_seasonality" ->
        (s"WITH b AS ($base), $zeroFilledGrid, " +
          "gg AS (SELECT event_type, (day + 4) % 7 AS dow, count(*) AS n_days, " +
          "CAST(sum(n) AS BIGINT) AS n_events FROM z GROUP BY event_type, dow), " +
          "p AS (SELECT event_type, dow, n_days, n_events, " +
          "(n_events * 100) // n_days AS mean_e2, " +
          "(n_events * 1000000) // CAST(sum(n_events) OVER (PARTITION BY event_type) AS BIGINT) AS share_ppm " +
          "FROM gg) " +
          "SELECT event_type, dow, n_days, n_events, mean_e2, share_ppm, " +
          "row_number() OVER (PARTITION BY event_type ORDER BY mean_e2 DESC, dow) AS peak_rank " +
          "FROM p ORDER BY event_type, dow"),

      "events_seasonal_decompose" ->
        (s"WITH b AS ($base), $zeroFilledGrid, " +
          "zd AS (SELECT event_type, day, (day + 4) % 7 AS dow, n FROM z), " +
          "m AS (SELECT event_type, dow, " +
          "CAST((sum(n) * 100) // count(*) AS BIGINT) AS dow_mean_e2 " +
          "FROM zd GROUP BY event_type, dow), " +
          "r AS (SELECT zd.event_type, zd.day, zd.dow, zd.n, m.dow_mean_e2, " +
          "zd.n * 100 - m.dow_mean_e2 AS residual_e2 " +
          "FROM zd JOIN m ON m.event_type = zd.event_type AND m.dow = zd.dow), " +
          "k AS (SELECT *, row_number() OVER (PARTITION BY event_type " +
          "ORDER BY abs(residual_e2) DESC, day) AS rank FROM r) " +
          "SELECT event_type, rank, day, dow, n, dow_mean_e2, residual_e2 " +
          "FROM k WHERE rank <= 5 ORDER BY event_type, rank"),

      "events_cusum_alarms" ->
        (s"WITH b AS ($base), $zeroFilledGrid, " +
          "zi AS (SELECT event_type, day, n, " +
          "CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS idx FROM z), " +
          "warm AS (SELECT event_type, CAST((sum(n) * 100) // 14 AS BIGINT) AS mu0_e2 " +
          "FROM zi WHERE idx <= 14 GROUP BY event_type HAVING count(*) = 14), " +
          "post AS (SELECT zi.event_type, zi.day, zi.n, warm.mu0_e2, " +
          "zi.n * 100 - warm.mu0_e2 - (warm.mu0_e2 // 10) AS dev_e2 " +
          "FROM zi JOIN warm ON warm.event_type = zi.event_type WHERE zi.idx > 14), " +
          "pp AS (SELECT *, CAST(sum(dev_e2) OVER w AS BIGINT) AS p FROM post " +
          "WINDOW w AS (PARTITION BY event_type ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), " +
          "sp AS (SELECT event_type, day, n, mu0_e2, " +
          "p - least(CAST(0 AS BIGINT), CAST(min(p) OVER w AS BIGINT)) AS s_plus_e2 FROM pp " +
          "WINDOW w AS (PARTITION BY event_type ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) " +
          "SELECT event_type, day, n, mu0_e2, s_plus_e2, " +
          "CASE WHEN s_plus_e2 >= 5 * mu0_e2 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS alarm " +
          "FROM sp ORDER BY event_type, day"),

      "events_cusum" ->
        (s"WITH b AS ($base), $zeroFilledGrid, " +
          "w AS (SELECT event_type, day, n, " +
          "CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS idx, " +
          "CAST(sum(n) OVER (PARTITION BY event_type ORDER BY day " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum, " +
          "CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_days, " +
          "CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS total FROM z), " +
          "gg AS (SELECT *, abs(cum * n_days - total * idx) AS g FROM w), " +
          "r AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY g DESC, day) AS rk FROM gg) " +
          "SELECT event_type, day AS change_day, g AS g_max, n_days, total, " +
          "(cum * 10000) // idx AS mean_before_e4, " +
          "CASE WHEN idx = n_days THEN NULL " +
          "ELSE ((total - cum) * 10000) // (n_days - idx) END AS mean_after_e4 " +
          "FROM r WHERE rk = 1 ORDER BY event_type"),

      // floor-division replay: (a - ((a % dd + dd) % dd)) is exactly
      // divisible by dd, so DuckDB's truncating // equals Spark's
      // truncating div on it — both yield the mathematical floor.
      // Intercept products ride HUGEINT (the DECIMAL(38,0) twin).
      "events_theil_sen_trend" ->
        (s"WITH b AS ($base), $zeroFilledGrid, " +
          "rel AS (SELECT z.event_type, z.day - s.d0 AS t, z.n " +
          "FROM z JOIN span s ON s.event_type = z.event_type), " +
          "pr AS (SELECT a.event_type, (b2.n - a.n) * 1000000 AS num, b2.t - a.t AS dd " +
          "FROM rel a JOIN rel b2 ON b2.event_type = a.event_type AND b2.t > a.t), " +
          "sl AS (SELECT event_type, " +
          "CAST((num - ((num % dd + dd) % dd)) // dd AS BIGINT) AS slope_e6 FROM pr), " +
          "sm AS (SELECT event_type, slope_e6, " +
          "row_number() OVER (PARTITION BY event_type ORDER BY slope_e6) AS rk, " +
          "count(*) OVER (PARTITION BY event_type) AS cnt FROM sl), " +
          "smed AS (SELECT event_type, CAST(cnt AS BIGINT) AS n_pairs, slope_e6 " +
          "FROM sm WHERE rk = (cnt + 1) // 2), " +
          "ic AS (SELECT r.event_type, " +
          "CAST(r.n::HUGEINT * 1000000 - smed.slope_e6::HUGEINT * r.t AS BIGINT) AS ic_e6 " +
          "FROM rel r JOIN smed ON smed.event_type = r.event_type), " +
          "im AS (SELECT event_type, ic_e6, " +
          "row_number() OVER (PARTITION BY event_type ORDER BY ic_e6) AS rk, " +
          "count(*) OVER (PARTITION BY event_type) AS cnt FROM ic), " +
          "imed AS (SELECT event_type, CAST(cnt AS BIGINT) AS n_days, ic_e6 AS intercept_e6 " +
          "FROM im WHERE rk = (cnt + 1) // 2) " +
          "SELECT s2.event_type, imed.n_days, s2.n_pairs, s2.slope_e6, imed.intercept_e6 " +
          "FROM smed s2 JOIN imed ON imed.event_type = s2.event_type " +
          "ORDER BY s2.event_type")
    )
  }

  /** DuckDB twin of [[dayGrid]]'s zero-fill (CTEs `g`/`span`/`cal`/`z`;
    * expects a `b` CTE with event_type/day in scope). */
  private val zeroFilledGrid: String =
    "g AS (SELECT event_type, day, count(*) AS n FROM b GROUP BY event_type, day), " +
      "span AS (SELECT event_type, min(day) AS d0, max(day) AS d1 FROM g GROUP BY event_type), " +
      "cal AS (SELECT event_type, d0 + t.i AS day FROM span, unnest(range(0, d1 - d0 + 1)) AS t(i)), " +
      "z AS (SELECT c.event_type, c.day, CAST(coalesce(g.n, 0) AS BIGINT) AS n " +
      "FROM cal c LEFT JOIN g ON c.event_type = g.event_type AND c.day = g.day)"
}
