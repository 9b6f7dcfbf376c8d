package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical-model operators over the fact tables: integer-exact
  * least-squares regression (covariance / slope) and per-period modal
  * category — the "fit a trend" and "what is typical" questions an
  * analytics engine answers after the plain aggregates. Reference scope:
  * factstore exposes append/scan/aggregate; its users run exactly these
  * model-ish reductions downstream, so the engine ships them as first-class
  * one-pass operators.
  *
  * Determinism contract: all moments are integer sums (money at ×10⁴, the
  * classic scaled-bigint discipline of this inventory). Overflow headroom,
  * stated exactly: the accumulated cross-moments Σx² and Σx·y_e4 are summed
  * in DECIMAL(38,0) on Spark / HUGEINT in DuckDB (exact to ≥1e38 — at 100 TB
  * Σx·y_e4 ≈ 2e21, far beyond BIGINT but 17 orders below the DECIMAL(38,0)
  * ceiling); the emitted sums Σx and Σy_e4 stay BIGINT, which is exact
  * through sf1000 (Σy_e4 ≈ 1e18 < 2⁶³) — a 100 TB deployment widens those
  * two output columns to DECIMAL(38,0), nothing else changes. Every
  * division is sign-guarded integral division (sign(a)·(|a| div b)) so the
  * two engines cannot disagree on negative-quotient rounding (Spark `div`
  * truncates toward zero; floor-vs-truncate only differs on negatives), and
  * a degenerate group (constant x → varn = 0) yields a NULL slope rather
  * than a division error on either engine.
  *
  * Scale (100 TB): both operators are one map-side-combined groupBy over a
  * narrow projection — the moment vector (n, Σx, Σy, Σx², Σxy) is a
  * constant-width mergeable state, the same shape as the sketch kernels.
  * The mode's rank window runs on the aggregated (period × priority)
  * relation (bounded: periods/months × 5 priorities), never on raw rows.
  */
object Stats {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(spark, dir, name)

  /** Money as scale-4 BIGINT (see Analytics). */
  private def e4Sql(inner: String) =
    s"CAST(CAST($inner AS DECIMAL(18,4)) * CAST(10000 AS DECIMAL(5,0)) AS BIGINT)"

  /** 30-day epoch period for the mode query — calendar-free integer day
    * arithmetic both engines render identically. */
  private val PeriodDays = 30L

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Mann-Whitney U / probability-of-superiority (AUC) of order value per
    // priority, one-vs-rest, on a BUCKETED value domain ($1000 steps —
    // declared semantics, what keeps the rank computation grid-sized): a
    // (bucket × priority) census, cumulative midranks on the ≤ ~600-row
    // bucket grid (doubled so ties' half-ranks stay integers), rank-sums
    // per group, U₂ = 2R − n_g(n_g+1) exact on DECIMAL(38,0) (corpus-sized
    // rank-sums overflow int64 at ~1e10 rows → digit-STRING emission),
    // auc_e6 = U·1e6/(n_g·n_rest) — the "is URGENT actually bigger?"
    // question as a distribution-free effect size. No corpus sort, no
    // corpus window: the only shuffle is the grid census.
    "stats_mann_whitney" -> ((s, d) => {
      val b = t(s, d, "orders").selectExpr("o_orderpriority AS priority",
        s"${e4Sql("o_totalprice")} div 10000000 AS bucket")
      val cell = b.groupBy(col("bucket"), col("priority"))
        .agg(count(lit(1)).as("n"))
      val tot = cell.groupBy(col("bucket")).agg(sum(col("n")).as("n_total"))
        .withColumn("cum_before", coalesce(sum(col("n_total")).over(
          Window.orderBy(col("bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .selectExpr("bucket", "n_total",
          "2 * cum_before + n_total + 1 AS midrank2")
      val grand = tot.agg(sum(col("n_total")).as("n_all"))
      cell.join(tot.select(col("bucket"), col("midrank2")), Seq("bucket"))
        .groupBy(col("priority"))
        .agg(sum(col("n")).as("n_g"),
          sum(expr("CAST(n AS DECIMAL(38,0)) * CAST(midrank2 AS DECIMAL(38,0))"))
            .as("r2"))
        .crossJoin(broadcast(grand))
        .selectExpr("priority", "CAST(n_g AS BIGINT) AS n_g",
          "CAST(n_all - n_g AS BIGINT) AS n_rest",
          "CAST(r2 - CAST(n_g AS DECIMAL(38,0)) * (CAST(n_g AS DECIMAL(38,0)) + 1) AS STRING) AS u2",
          "CAST(((r2 - CAST(n_g AS DECIMAL(38,0)) * (CAST(n_g AS DECIMAL(38,0)) + 1)) * 1000000) " +
            "div (CAST(2 AS DECIMAL(38,0)) * n_g * (n_all - n_g)) AS BIGINT) AS auc_e6")
        .orderBy(asc("priority"))
    }),

    // Two-sample Kolmogorov–Smirnov per priority, one-vs-rest, on the SAME
    // bucketed value domain as stats_mann_whitney (the companion test: MW
    // reads stochastic dominance, KS reads the worst-case CDF gap and
    // WHERE it opens). All arithmetic exact: the statistic's numerator is
    // max over grid buckets of |cum_g·n_rest − cum_rest·n_g| carried in
    // DECIMAL(38,0) (≈1e22 at 100 TB, 16 orders under the ceiling) and
    // emitted as a digit STRING; d_e6 = numerator·10⁶ div (n_g·n_rest) is
    // the bounded scaled statistic; ks_bucket is the smallest bucket
    // attaining the max (deterministic tie-break). The only corpus-sized
    // work is the census shuffle; every window runs on the bucket grid.
    "stats_ks_test" -> ((s, d) => {
      val b = t(s, d, "orders").selectExpr("o_orderpriority AS priority",
        s"${e4Sql("o_totalprice")} div 10000000 AS bucket")
      val cell = b.groupBy(col("bucket"), col("priority"))
        .agg(count(lit(1)).as("n"))
        .transform(CacheScope.persist)
      val tot = cell.groupBy(col("bucket")).agg(sum(col("n")).as("n_total"))
        .withColumn("cum_all", sum(col("n_total")).over(
          Window.orderBy(col("bucket"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val pr = cell.groupBy(col("priority")).agg(sum(col("n")).as("n_g"))
      val grand = cell.agg(sum(col("n")).as("n_all"))
      val grid = tot.crossJoin(broadcast(pr))
        .join(cell, Seq("bucket", "priority"), "left")
        .withColumn("cum_g", coalesce(sum(col("n")).over(
          Window.partitionBy(col("priority")).orderBy(col("bucket"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)), lit(0L)))
        .crossJoin(broadcast(grand))
        .selectExpr("priority", "bucket", "n_g", "n_all - n_g AS n_rest",
          "abs(CAST(cum_g AS DECIMAL(38,0)) * (n_all - n_g) " +
            "- CAST(cum_all - cum_g AS DECIMAL(38,0)) * n_g) AS dd")
        .transform(CacheScope.persist)
      val mx = grid.groupBy(col("priority"), col("n_g"), col("n_rest"))
        .agg(max(col("dd")).as("d_num"))
      mx.join(grid.select(col("priority"), col("bucket"), col("dd")),
          Seq("priority"))
        .filter(col("dd") === col("d_num"))
        .groupBy(col("priority"), col("n_g"), col("n_rest"), col("d_num"))
        .agg(min(col("bucket")).as("ks_bucket"))
        .selectExpr("priority", "CAST(n_g AS BIGINT) AS n_g",
          "CAST(n_rest AS BIGINT) AS n_rest",
          "CAST(d_num AS STRING) AS d_num",
          "CAST((d_num * 1000000) div (CAST(n_g AS DECIMAL(38,0)) * n_rest) AS BIGINT) AS d_e6",
          "ks_bucket")
        .orderBy(asc("priority"))
    }),

    // Gini concentration of order value per priority on the SAME bucketed
    // domain (declared semantics: mass at the bucket index, so the census
    // stays grid-sized — the exact same reason stats_mann_whitney buckets).
    // Numerator via the census identity Σ v·c·(2·cum_before + c − n)
    // (positions B+1..B+c of the sorted sequence contribute
    // Σ(2i − n − 1) = c·(2B + c − n) each at value v) — one grid window,
    // no entity sort; G_e6 = numerator·10⁶ div (n · Σ v·c), both sides
    // DECIMAL(38,0)-exact. The "is revenue concentrated in few orders?"
    // screen, distribution-free and reproducible digit-for-digit.
    "stats_gini_concentration" -> ((s, d) => {
      val cell = t(s, d, "orders")
        .selectExpr("o_orderpriority AS priority",
          s"${e4Sql("o_totalprice")} div 10000000 AS v")
        .groupBy(col("priority"), col("v")).agg(count(lit(1)).as("c"))
      val cum = cell.withColumn("cb", coalesce(sum(col("c")).over(
        Window.partitionBy(col("priority")).orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      cum.groupBy(col("priority"))
        .agg(sum(col("c")).as("n"),
          sum(expr("CAST(v AS DECIMAL(38,0)) * c")).as("sv"),
          sum(expr("CAST(v AS DECIMAL(38,0)) * c * (2 * CAST(cb AS DECIMAL(38,0)) + c)"))
            .as("svr"))
        .selectExpr("priority", "CAST(n AS BIGINT) AS n",
          "CAST(sv AS STRING) AS sum_buckets",
          "CASE WHEN sv = 0 THEN CAST(NULL AS BIGINT) ELSE " +
            "CAST(((svr - sv * CAST(n AS DECIMAL(38,0))) * 1000000) " +
            "div (CAST(n AS DECIMAL(38,0)) * sv) AS BIGINT) END AS gini_e6")
        .orderBy(asc("priority"))
    }),

    // Integer-exact OLS of extendedprice on quantity per returnflag: one
    // narrow scan -> five-moment aggregate -> closed-form slope. The whole
    // regression is ONE map-side-combined shuffle of 5 longs per group;
    // at 100 TB this is the cheapest possible "fit a line" plan.
    // Bounds: x <= 50, y_e4 <= ~1e9; the wide cross-moments (DECIMAL(38,0))
    // carry Sxy/Sxx exactly to 100 TB — see the contract in the class doc.
    "stats_qty_price_regression" -> ((s, d) =>
      t(s, d, "lineitem")
        .selectExpr(
          "l_returnflag",
          "CAST(l_quantity AS BIGINT) AS x", // integral in TPC-H data
          s"${e4Sql("l_extendedprice")} AS y_e4")
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("x")).as("sx"),
          sum(col("y_e4")).as("sy_e4"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * y_e4")).as("sxy"))
        .selectExpr(
          "l_returnflag", "n", "sx AS sum_qty", "sy_e4 AS sum_price_e4",
          "CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * CAST(sy_e4 AS DECIMAL(38,0)) AS covn",
          "CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * CAST(sx AS DECIMAL(38,0)) AS varn")
        .selectExpr(
          "l_returnflag", "n", "sum_qty", "sum_price_e4",
          // cov(x, y_e4) = covn / n²; sign-guarded integral division
          "CAST((CASE WHEN covn < 0 THEN -1 ELSE 1 END) * (abs(covn) div (CAST(n AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0)))) AS BIGINT) AS cov_qp_e4",
          // slope = covn / varn, in price-per-unit-qty at 1e4·1e6 = 1e10;
          // NULL for degenerate groups (constant x) instead of a div error
          "CASE WHEN varn = 0 THEN CAST(NULL AS BIGINT) ELSE " +
            "CAST((CASE WHEN covn < 0 THEN -1 ELSE 1 END) * ((abs(covn) * CAST(1000000 AS DECIMAL(38,0))) div varn) AS BIGINT) END AS slope_e10")
        .orderBy(asc("l_returnflag"))),

    // Per-30-day-period modal order priority + its share: aggregate to the
    // (period, priority) grid first (the only corpus-sized work, one
    // combine-friendly groupBy), then rank within the tiny grid. Share is
    // exact basis points against the period total.
    "stats_priority_mode" -> ((s, d) => {
      val dayUs = 86400L * 1000000
      val grid = t(s, d, "orders")
        .selectExpr(
          s"unix_micros(CAST(o_orderdate AS TIMESTAMP)) div ${dayUs}L div $PeriodDays AS period",
          "o_orderpriority")
        .groupBy(col("period"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val tot = grid.groupBy(col("period")).agg(sum(col("n")).as("total"))
      grid.join(broadcast(tot), Seq("period"))
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("period"))
            .orderBy(desc("n"), asc("o_orderpriority"))))
        .filter(col("rank") === 1)
        .selectExpr("period", "o_orderpriority AS mode_priority", "n",
          "(n * 10000) div total AS share_bp")
        .orderBy(asc("period"))
    })
  )

  def oracles: Map[String, String] = Map(
    // Bucketed-value census → cumulative midranks on the bucket GRID →
    // rank-sums per group: the window never touches raw rows.
    "stats_mann_whitney" ->
      (s"WITH b AS (SELECT o_orderpriority AS priority, " +
        s"${e4Sql("o_totalprice")} // 10000000 AS bucket FROM orders), " +
        "cell AS (SELECT bucket, priority, count(*) AS n FROM b GROUP BY 1, 2), " +
        "tot AS (SELECT bucket, CAST(sum(n) AS BIGINT) AS n_total FROM cell GROUP BY 1), " +
        "mr AS (SELECT bucket, n_total, 2 * COALESCE(sum(n_total) OVER " +
        "(ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) " +
        "+ n_total + 1 AS midrank2 FROM tot), " +
        "g AS (SELECT priority, CAST(sum(n) AS BIGINT) AS n_g, " +
        "sum(CAST(n AS HUGEINT) * CAST(midrank2 AS HUGEINT)) AS r2 " +
        "FROM cell JOIN mr USING (bucket) GROUP BY 1), " +
        "alln AS (SELECT CAST(sum(n_total) AS BIGINT) AS n_all FROM tot) " +
        "SELECT priority, n_g, CAST(n_all - n_g AS BIGINT) AS n_rest, " +
        "CAST(r2 - CAST(n_g AS HUGEINT) * (CAST(n_g AS HUGEINT) + 1) AS VARCHAR) AS u2, " +
        "CAST(((r2 - CAST(n_g AS HUGEINT) * (CAST(n_g AS HUGEINT) + 1)) * 1000000) " +
        "// (CAST(2 AS HUGEINT) * n_g * (n_all - n_g)) AS BIGINT) AS auc_e6 " +
        "FROM g CROSS JOIN alln ORDER BY priority"),

    // Same census/grid-window shape; the numerator max runs on the grid.
    "stats_ks_test" ->
      (s"WITH b AS (SELECT o_orderpriority AS priority, " +
        s"${e4Sql("o_totalprice")} // 10000000 AS bucket FROM orders), " +
        "cell AS MATERIALIZED (SELECT bucket, priority, count(*) AS n FROM b GROUP BY 1, 2), " +
        "tot AS (SELECT bucket, CAST(sum(n) AS BIGINT) AS n_total FROM cell GROUP BY 1), " +
        "ca AS (SELECT bucket, n_total, sum(n_total) OVER (ORDER BY bucket " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_all FROM tot), " +
        "pr AS (SELECT priority, CAST(sum(n) AS BIGINT) AS n_g FROM cell GROUP BY 1), " +
        "alln AS (SELECT CAST(sum(n) AS BIGINT) AS n_all FROM cell), " +
        "grid AS MATERIALIZED (SELECT priority, bucket, n_g, n_all - n_g AS n_rest, " +
        "abs(CAST(COALESCE(sum(n) OVER (PARTITION BY priority ORDER BY bucket " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS HUGEINT) * (n_all - n_g) " +
        "- CAST(cum_all - COALESCE(sum(n) OVER (PARTITION BY priority ORDER BY bucket " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS HUGEINT) * n_g) AS dd " +
        "FROM ca CROSS JOIN pr LEFT JOIN cell USING (bucket, priority) CROSS JOIN alln), " +
        "mx AS (SELECT priority, n_g, n_rest, max(dd) AS d_num FROM grid GROUP BY 1, 2, 3) " +
        "SELECT m.priority, m.n_g, CAST(m.n_rest AS BIGINT) AS n_rest, " +
        "CAST(m.d_num AS VARCHAR) AS d_num, " +
        "CAST((m.d_num * 1000000) // (CAST(m.n_g AS HUGEINT) * m.n_rest) AS BIGINT) AS d_e6, " +
        "min(g.bucket) AS ks_bucket " +
        "FROM mx m JOIN grid g ON g.priority = m.priority AND g.dd = m.d_num " +
        "GROUP BY 1, 2, 3, 4, 5 ORDER BY m.priority"),

    "stats_gini_concentration" ->
      (s"WITH cell AS (SELECT o_orderpriority AS priority, " +
        s"${e4Sql("o_totalprice")} // 10000000 AS v, count(*) AS c FROM orders GROUP BY 1, 2), " +
        "cum AS (SELECT priority, v, c, COALESCE(sum(c) OVER (PARTITION BY priority " +
        "ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb FROM cell), " +
        "g AS (SELECT priority, CAST(sum(c) AS BIGINT) AS n, " +
        "sum(CAST(v AS HUGEINT) * c) AS sv, " +
        "sum(CAST(v AS HUGEINT) * c * (2 * CAST(cb AS HUGEINT) + c)) AS svr FROM cum GROUP BY 1) " +
        "SELECT priority, n, CAST(sv AS VARCHAR) AS sum_buckets, " +
        "CASE WHEN sv = 0 THEN CAST(NULL AS BIGINT) ELSE " +
        "CAST(((svr - sv * CAST(n AS HUGEINT)) * 1000000) " +
        "// (CAST(n AS HUGEINT) * sv) AS BIGINT) END AS gini_e6 " +
        "FROM g ORDER BY priority"),

    "stats_qty_price_regression" ->
      ("WITH b AS (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x, " +
        s"${e4Sql("l_extendedprice")} AS y_e4 FROM lineitem), " +
        "g AS (SELECT l_returnflag, count(*) AS n, CAST(sum(x) AS BIGINT) AS sx, " +
        "CAST(sum(y_e4) AS BIGINT) AS sy_e4, sum(x * x) AS sxx, " +
        "sum(x * y_e4) AS sxy FROM b GROUP BY l_returnflag), " +
        "c AS (SELECT l_returnflag, n, sx, sy_e4, " +
        "CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy_e4 AS covn, " +
        "CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS varn FROM g) " +
        "SELECT l_returnflag, n, sx AS sum_qty, sy_e4 AS sum_price_e4, " +
        "CAST((CASE WHEN covn < 0 THEN -1 ELSE 1 END) * (abs(covn) // (CAST(n AS HUGEINT) * n)) AS BIGINT) AS cov_qp_e4, " +
        "CASE WHEN varn = 0 THEN CAST(NULL AS BIGINT) ELSE " +
        "CAST((CASE WHEN covn < 0 THEN -1 ELSE 1 END) * ((abs(covn) * 1000000) // varn) AS BIGINT) END AS slope_e10 " +
        "FROM c ORDER BY l_returnflag"),

    "stats_priority_mode" ->
      (s"WITH grid AS (SELECT epoch_us(o_orderdate) // 86400000000 // $PeriodDays AS period, " +
        "o_orderpriority, count(*) AS n FROM orders GROUP BY period, o_orderpriority), " +
        "tot AS (SELECT period, CAST(sum(n) AS BIGINT) AS total FROM grid GROUP BY period), " +
        "r AS (SELECT g.period, g.o_orderpriority, g.n, t.total, row_number() OVER " +
        "(PARTITION BY g.period ORDER BY g.n DESC, g.o_orderpriority ASC) AS rank " +
        "FROM grid g JOIN tot t ON g.period = t.period) " +
        "SELECT period, o_orderpriority AS mode_priority, n, " +
        "(n * 10000) // total AS share_bp FROM r WHERE rank = 1 ORDER BY period")
  )
}
