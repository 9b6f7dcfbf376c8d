package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.CrossHash._

/** Second analytics wave: patterns that exercise distinct Catalyst
  * machinery — Expand (ROLLUP), subquery decorrelation (min-per-group join
  * back), sequential funnels over event streams, pivot-style conditional
  * aggregation, and an end-to-end training-corpus pipeline composite. */
object Analytics2 {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(spark, dir, name)

  private val dec = "decimal(18,4)"

  /** Modulus shared by the bloom-semijoin hash pair (CrossHash.P). */
  private val BloomP = graft.functions.CrossHash.P

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Per-type user-concentration census: the exact Gini coefficient of
    // per-user activity — the "is our data coming from everyone or from
    // ten power users" number a pipeline monitors before trusting
    // engagement-weighted sampling. Exact integer rank formula
    // G = (2W − (n+1)S) / (nS) with W = Σ i·x_(i) over users sorted by
    // activity ascending — computed WITHOUT a global per-user sort: users
    // collapse to a count-of-counts histogram (distinct activity levels —
    // vocabulary-sized), a run of f users at level x occupying ranks
    // cum_before+1..cum_before+f contributes x·(f·cum_before + f(f+1)/2)
    // to W in closed form, and the rank window runs over the HISTOGRAM
    // (partitioned by type, ordered by level), never over the entity set.
    // Wide cross-products ride DECIMAL(38,0)/HUGEINT (the Stats moment
    // discipline: n·S ≈ 1e21 at 100 TB — beyond int64, 17 orders below
    // the decimal ceiling); declared outputs downcast to BIGINT.
    "events_user_gini" -> ((s, d) => {
      val ux = EventFinders.events(s, d)
        .groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("x"))
      val hist = ux.groupBy(col("event_type"), col("x"))
        .agg(count(lit(1)).as("f"))
      val byType = Window.partitionBy(col("event_type")).orderBy(asc("x"))
      hist
        .withColumn("cumf", sum(col("f")).over(byType))
        .selectExpr("event_type", "x", "f", "cumf - f AS cum_before")
        .groupBy(col("event_type"))
        .agg(
          sum(col("f")).as("n_users"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * f")).as("s"),
          sum(expr("""CAST(x AS DECIMAL(38,0)) *
            (CAST(f AS DECIMAL(38,0)) * cum_before +
             (CAST(f AS DECIMAL(38,0)) * (f + 1)) div 2)""")).as("w"))
        .selectExpr("event_type",
          "CAST(n_users AS BIGINT) AS n_users",
          "CAST(s AS BIGINT) AS n_events",
          """CAST(((2 * w - (CAST(n_users AS DECIMAL(38,0)) + 1) * s) * 1000000)
             div (CAST(n_users AS DECIMAL(38,0)) * s) AS BIGINT) AS gini_ppm""")
        .orderBy(asc("event_type"))
    }),

    // Revenue-concentration Gini across customers, per market segment —
    // the continuous-value companion to events_user_gini. The histogram
    // closed form needs DISCRETE levels, so per-customer revenue (exact
    // e4 integer) is quantized to 3 significant digits as part of the
    // DECLARED semantics: ≤900 levels per decade ≈ a few thousand levels
    // total at ANY corpus size, which is what keeps the level histogram
    // (and its ordering window) bounded where raw e4 values would be
    // near-unique and degenerate back into an entity-sized sort. The
    // quantization perturbs each value < 0.1%, far under Gini's
    // measurement noise. Fact side collapses to per-customer sums before
    // the dim join (the referential-integrity discipline); customers
    // without orders are out of scope (no revenue rank).
    "orders_value_gini" -> ((s, d) => {
      val e4 = "CAST(CAST(o_totalprice AS DECIMAL(18,4)) * CAST(10000 AS DECIMAL(5,0)) AS BIGINT)"
      val pw = (0 to 16).map(i => s"WHEN $i THEN ${"1" + "0" * i}L")
        .mkString("CASE greatest(length(CAST(x AS STRING)) - 3, 0) ", " ", " ELSE 1L END")
      val cust = t(s, d, "orders").selectExpr("o_custkey", s"$e4 AS v")
        .groupBy(col("o_custkey")).agg(sum(col("v")).cast("bigint").as("x"))
        .join(t(s, d, "customer").selectExpr("c_custkey", "c_mktsegment AS segment"),
          col("o_custkey") === col("c_custkey"))
      val hist = cust.selectExpr("segment", s"(x div ($pw)) * ($pw) AS q")
        .groupBy(col("segment"), col("q")).agg(count(lit(1)).as("f"))
      val bySeg = Window.partitionBy(col("segment")).orderBy(asc("q"))
      hist
        .withColumn("cumf", sum(col("f")).over(bySeg))
        .selectExpr("segment", "q", "f", "cumf - f AS cum_before")
        .groupBy(col("segment"))
        .agg(
          sum(col("f")).as("n_customers"),
          sum(expr("CAST(q AS DECIMAL(38,0)) * f")).as("s"),
          sum(expr("""CAST(q AS DECIMAL(38,0)) *
            (CAST(f AS DECIMAL(38,0)) * cum_before +
             (CAST(f AS DECIMAL(38,0)) * (f + 1)) div 2)""")).as("w"))
        .selectExpr("segment",
          "CAST(n_customers AS BIGINT) AS n_customers",
          "CAST(s AS BIGINT) AS total_rev_e4",
          """CAST(((2 * w - (CAST(n_customers AS DECIMAL(38,0)) + 1) * s) * 1000000)
             div (CAST(n_customers AS DECIMAL(38,0)) * s) AS BIGINT) AS gini_ppm""")
        .orderBy(asc("segment"))
    }),

    // ROLLUP over (lang, source): the Expand operator; grand totals
    // included. COALESCE pins the null grouping rows for the oracle sort.
    "rollup_corpus" -> ((s, d) =>
      t(s, d, "documents")
        .rollup(col("lang"), col("source"))
        // sum output pinned to BIGINT on both engines (DuckDB widens to HUGEINT)
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).cast("bigint").as("total_chars"))
        .select(
          coalesce(col("lang"), lit("<all>")).as("lang"),
          coalesce(col("source"), lit("<all>")).as("source"),
          col("n_docs"), col("total_chars"))
        .orderBy(asc("lang"), asc("source"))),

    // CUBE over (status, priority): all four grouping combinations in one
    // Expand pass — the slice-and-dice companion to rollup_corpus. Money
    // leaves as e4-scaled BIGINT; COALESCE pins the null grouping rows.
    "cube_order_status" -> ((s, d) =>
      t(s, d, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          sum((col("o_totalprice").cast(dec) * lit(10000).cast("decimal(5,0)"))
            .cast("bigint")).cast("bigint").as("total_value_e4"))
        .select(
          coalesce(col("o_orderstatus"), lit("<all>")).as("o_orderstatus"),
          coalesce(col("o_orderpriority"), lit("<all>")).as("o_orderpriority"),
          col("n_orders"), col("total_value_e4"))
        .orderBy(asc("o_orderstatus"), asc("o_orderpriority"))),

    // Explicit GROUPING SETS — (status), (priority), () — the third Expand
    // shape after rollup/cube: named aggregation levels in ONE pass, no
    // per-level re-scan. The level label is derived from which key is
    // non-null (engine-agnostic, unlike GROUPING_ID bit orders).
    "orders_grouping_sets" -> ((s, d) =>
      t(s, d, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          sum((col("o_totalprice").cast(dec) * lit(10000).cast("decimal(5,0)"))
            .cast("bigint")).cast("bigint").as("total_value_e4"))
        .selectExpr(
          "CASE WHEN o_orderstatus IS NOT NULL THEN 'by_status' " +
            "WHEN o_orderpriority IS NOT NULL THEN 'by_priority' ELSE 'grand' END AS level",
          "coalesce(o_orderstatus, '<all>') AS o_orderstatus",
          "coalesce(o_orderpriority, '<all>') AS o_orderpriority",
          "n_orders", "total_value_e4")
        .orderBy(asc("level"), asc("o_orderstatus"), asc("o_orderpriority"))),

    // ntile quartiles over customer lifetime value. The window has no
    // PARTITION BY — that is safe ONLY because its input is the per-
    // customer aggregate (customer-count-sized, already reduced), never
    // the raw orders; the deterministic tiebreak (value desc, custkey)
    // pins tile membership on both engines.
    "customer_value_quartiles" -> ((s, d) => {
      val cv = t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum((col("o_totalprice").cast(dec) * lit(10000).cast("decimal(5,0)"))
          .cast("bigint")).cast("bigint").as("value_e4"))
      cv.withColumn("quartile", ntile(4).over(
          Window.orderBy(desc("value_e4"), asc("o_custkey"))))
        .groupBy(col("quartile"))
        .agg(count(lit(1)).as("n_customers"),
          min(col("value_e4")).as("min_value_e4"),
          max(col("value_e4")).as("max_value_e4"))
        .selectExpr("CAST(quartile AS BIGINT) AS quartile", "n_customers",
          "min_value_e4", "max_value_e4")
        .orderBy(asc("quartile"))
    }),

    // Correlated-subquery shape: parts priced at their type's minimum
    // (decorrelates to an aggregate + join back on the group key).
    "q2_cheapest_per_type" -> ((s, d) => {
      val part = t(s, d, "part")
      val minPer = part.groupBy(col("p_type").as("t"))
        .agg(min(col("p_retailprice")).as("min_price"))
      part.join(broadcast(minPer),
          col("p_type") === col("t") && col("p_retailprice") === col("min_price"))
        .select(col("p_type"), col("p_partkey"), col("p_brand"), col("p_retailprice"))
        .orderBy(asc("p_type"), asc("p_partkey"))
    }),

    // Funnel: users who view, then click after the view, then purchase
    // after the click (strict temporal order). Single scan of events:
    // three chained per-user window aggregates share one partitioning on
    // user_id (one Exchange, no self-joins — the round-1 variant scanned
    // events three times and joined the branches).
    "events_funnel" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
      val e = EventFinders.events(s, d)
        .withColumn("ts_us", expr("ts div 1000"))
        .withColumn("mv",
          min(when(col("event_type") === "view", col("ts_us"))).over(w))
        .withColumn("mc",
          min(when(col("event_type") === "click" && col("ts_us") > col("mv"),
            col("ts_us"))).over(w))
        .withColumn("mp",
          min(when(col("event_type") === "purchase" && col("ts_us") > col("mc"),
            col("ts_us"))).over(w))
      e.groupBy(col("user_id"))
        .agg(max(col("mv")).as("mv"), max(col("mc")).as("mc"), max(col("mp")).as("mp"))
        .agg(
          count(col("mv")).as("n_viewed"),
          count(col("mc")).as("n_clicked"),
          count(col("mp")).as("n_purchased"))
    }),

    // Multi-metric supplier scorecard: exact revenue, return share, and
    // p90 ship delay per supplier, graded and top-20 by revenue. The
    // delay percentile reuses the bounded-domain histogram pattern —
    // per-supplier (delay → n) cells are an entity-keyed grid (linear in
    // suppliers, NOT in lineitems), so the percentile never sorts fact
    // rows; revenue/returns ride the same grid cells. Supplier names
    // attach by broadcast; the final top-20 is a TakeOrderedAndProject.
    "supplier_scorecard" -> ((s, d) => {
      val rev = "CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * " +
        "(CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4))) AS DECIMAL(28,8)) * " +
        "CAST(100000000 AS DECIMAL(9,0)) AS BIGINT)"
      val li = t(s, d, "lineitem")
        .join(t(s, d, "orders").select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .selectExpr("l_suppkey", s"$rev AS rev_e8",
          "CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END AS ret",
          "CAST(datediff(CAST(l_shipdate AS DATE), CAST(o_orderdate AS DATE)) AS BIGINT) AS delay")
      val hist = li.groupBy(col("l_suppkey"), col("delay"))
        .agg(count(lit(1)).as("n"), sum(col("rev_e8")).as("rev_e8"),
          sum(col("ret")).as("n_ret"))
      val run = Window.partitionBy(col("l_suppkey")).orderBy(asc("delay"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val scored = hist
        .withColumn("cum", sum(col("n")).over(run))
        .withColumn("total", sum(col("n")).over(Window.partitionBy(col("l_suppkey"))))
        .groupBy(col("l_suppkey"))
        .agg(max(col("total")).as("n_items"),
          sum(col("rev_e8")).as("revenue_e8"),
          sum(col("n_ret")).as("n_returns"),
          min(when(expr("cum * 10 >= total * 9"), col("delay"))).as("p90_delay_days"))
      scored
        .join(broadcast(t(s, d, "supplier").selectExpr("s_suppkey", "s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .selectExpr("s_suppkey", "s_name", "n_items", "revenue_e8",
          "(n_returns * 10000) div n_items AS return_bp", "p90_delay_days",
          """CASE WHEN (n_returns * 10000) div n_items <= 2500 AND p90_delay_days <= 100 THEN 'A'
             WHEN (n_returns * 10000) div n_items <= 3500 THEN 'B'
             ELSE 'C' END AS grade""")
        .orderBy(desc("revenue_e8"), asc("s_suppkey")).limit(20)
    }),

    // Bloom-filter runtime semijoin, measured: build a compact bit filter
    // over the urgent-order keys, broadcast it, pre-filter lineitem rows
    // BEFORE any join, and report the filter's exact effectiveness
    // (pass / true-match / false-positive counts). This is the analytics
    // twin of the store's bloom+page-index probe path and the pattern
    // that prunes a 100 TB probe side down to ~the matching rows before
    // the shuffle join. The filter is deterministic integer hashing
    // (pinned (a·k+b) mod P pair) packed 63 bits/word — the sign bit
    // stays clear so shifted words never overflow on either engine. The
    // exact semijoin here is MEASUREMENT (it prices the fp rate); a
    // production plan applies the bloom as a map-side filter and lets
    // the real join handle survivors.
    "orders_bloom_semijoin" -> ((s, d) => {
      val M = 65520L // 1040 words × 63 usable bits
      def h(c: String, a: Long, b: Long) =
        s"(((($c) % ${BloomP}L) * ${a}L + ${b}L) % ${BloomP}L) % ${M}L"
      // persisted: the key set feeds the word build AND the exact-check
      // set — without sharing, each consumer re-scans orders
      val build = CacheScope.persist(t(s, d, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .selectExpr("o_orderkey AS k"))
      val words = build
        .selectExpr(s"stack(2, ${h("k", 2654435761L, 97L)}, ${h("k", 982451653L, 541L)}) AS (pos)")
        .selectExpr("pos div 63 AS w", "shiftleft(1L, CAST(pos % 63 AS INT)) AS b")
        .groupBy(col("w")).agg(expr("bit_or(b)").as("bits"))
      val probe = t(s, d, "lineitem").selectExpr("l_orderkey AS k",
        s"${h("k", 2654435761L, 97L)} AS p1", s"${h("k", 982451653L, 541L)} AS p2")
      val w1 = words.selectExpr("w AS w1", "bits AS bits1")
      val w2 = words.selectExpr("w AS w2", "bits AS bits2")
      probe
        .join(broadcast(w1), expr("p1 div 63 = w1"), "left")
        .join(broadcast(w2), expr("p2 div 63 = w2"), "left")
        .selectExpr("k",
          """CASE WHEN bits1 IS NOT NULL AND (bits1 & shiftleft(1L, CAST(p1 % 63 AS INT))) != 0
                   AND bits2 IS NOT NULL AND (bits2 & shiftleft(1L, CAST(p2 % 63 AS INT))) != 0
             THEN 1L ELSE 0L END AS pass""")
        .join(broadcast(build.distinct().selectExpr("k AS bk")),
          col("k") === col("bk"), "left")
        .selectExpr("pass", "CASE WHEN bk IS NOT NULL THEN 1L ELSE 0L END AS is_match")
        .agg(count(lit(1)).as("n_probe_rows"),
          sum(col("pass")).as("n_bloom_pass"),
          sum(col("is_match")).as("n_exact_match"),
          sum(expr("pass * (1 - is_match)")).as("n_false_pos"))
        .selectExpr("n_probe_rows", "n_bloom_pass", "n_exact_match", "n_false_pos",
          "(n_false_pos * 10000) div greatest(n_probe_rows - n_exact_match, 1L) AS fp_bp")
    }),

    // Open-order backlog over time: +1 on the order date, −1 on the
    // order's LAST ship date, cumulative sum = orders in flight. Two
    // corpus-scale map-side-combined groupBys (orders→day; lineitem→per-
    // order last ship, co-partitioned with orders on the key at scale),
    // then the delta stream collapses to the ~active-days grid before the
    // single running-sum window. Emits only days with activity — the
    // backlog value at those days is exact regardless.
    "orders_backlog_timeline" -> ((s, d) => {
      val epoch = "DATE'1970-01-01'"
      val opened = t(s, d, "orders")
        .selectExpr(s"CAST(datediff(CAST(o_orderdate AS DATE), $epoch) AS BIGINT) AS day")
        .groupBy(col("day")).agg(count(lit(1)).as("n_opened"))
      val closed = t(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(max(expr(s"CAST(datediff(CAST(l_shipdate AS DATE), $epoch) AS BIGINT)")).as("day"))
        .groupBy(col("day")).agg(count(lit(1)).as("n_closed"))
      val run = Window.orderBy(asc("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      opened.join(closed, Seq("day"), "full_outer")
        .na.fill(0L, Seq("n_opened", "n_closed"))
        .withColumn("open_backlog",
          sum(col("n_opened") - col("n_closed")).over(run))
        .selectExpr("day", "n_opened", "n_closed", "open_backlog")
        .orderBy(asc("day"))
    }),

    // Funnel with CONVERSION WINDOWS: click must land within 24 h of the
    // first view, purchase within 24 h of that click — the attribution-
    // window semantics real funnels carry (the unbounded variant above
    // overcounts conversions that happen weeks later). Same single-scan
    // shape: three chained conditional window aggregates over ONE user_id
    // partitioning, zero self-joins.
    "events_funnel_windowed" -> ((s, d) => {
      val DayUsL = 86400L * 1000000
      val w = Window.partitionBy(col("user_id"))
      val e = EventFinders.events(s, d)
        .withColumn("ts_us", expr("ts div 1000"))
        .withColumn("mv",
          min(when(col("event_type") === "view", col("ts_us"))).over(w))
        .withColumn("mc",
          min(when(col("event_type") === "click" &&
            col("ts_us") > col("mv") && col("ts_us") <= col("mv") + DayUsL,
            col("ts_us"))).over(w))
        .withColumn("mp",
          min(when(col("event_type") === "purchase" &&
            col("ts_us") > col("mc") && col("ts_us") <= col("mc") + DayUsL,
            col("ts_us"))).over(w))
      e.groupBy(col("user_id"))
        .agg(max(col("mv")).as("mv"), max(col("mc")).as("mc"), max(col("mp")).as("mp"))
        .agg(
          count(col("mv")).as("n_viewed"),
          count(col("mc")).as("n_clicked_24h"),
          count(col("mp")).as("n_purchased_24h"))
    }),

    // Pivot-style conditional aggregation: order-status counts as columns
    // per market segment (portable across engines, no PIVOT syntax).
    // (no broadcast hint: customer scales with SF — AQE decides)
    "orders_status_pivot" -> ((s, d) =>
      t(s, d, "orders").join(t(s, d, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          count(when(col("o_orderstatus") === "F", 1)).as("n_f"),
          count(when(col("o_orderstatus") === "O", 1)).as("n_o"),
          count(when(col("o_orderstatus") === "P", 1)).as("n_p"),
          sum((when(col("o_orderstatus") === "F", col("o_totalprice")).cast(dec) *
            lit(10000).cast("decimal(5,0)")).cast("bigint"))
            .cast("bigint").as("sum_f_e4"))
        .orderBy(asc("c_mktsegment"))),

    // Exact empirical deciles of line price per return flag. Decimal-exact
    // values: the quantile VALUE at a fixed rank is deterministic even when
    // row_number breaks price ties arbitrarily. The per-group total sort is
    // inherent to exact quantiles (3 reducer partitions here — one per
    // flag); at petabyte scale the play is two-pass histogram refinement or
    // percentile_approx, neither of which is oracle-stable, so the exact
    // operator is the pinned contract.
    "lineitem_quantiles" -> ((s, d) => {
      val l = t(s, d, "lineitem")
        .select(col("l_returnflag").as("flag"),
          col("l_extendedprice").cast(dec).as("price"))
      val ranked = l.withColumn("rn",
        row_number().over(Window.partitionBy(col("flag")).orderBy(asc("price"))))
      val targets = l.groupBy(col("flag")).agg(count(lit(1)).as("n"))
        .select(col("flag"), col("n"), explode(expr("sequence(0, 10)")).as("q"))
        .selectExpr("flag", "CAST(q AS BIGINT) AS q",
          "CAST((q * (n - 1)) div 10 + 1 AS BIGINT) AS idx")
      targets.join(ranked,
          targets("flag") === ranked("flag") && col("idx") === col("rn"))
        .select(targets("flag"), col("q"),
          (col("price") * lit(10000).cast("decimal(5,0)")).cast("bigint").as("price_e4"))
        .orderBy(asc("flag"), asc("q"))
    }),

    // Exact ship-delay percentiles per order priority WITHOUT sorting
    // the corpus: delay-in-days is a small bounded integer domain, so the
    // (priority, delay) histogram — one co-partitioned equi-join plus
    // one map-side-combined groupBy — carries full distribution
    // information. Nearest-rank p50/p90/p99 read off the cumulative counts
    // of that few-hundred-row grid with integer cross-multiplication
    // (cum·100 ≥ total·q). The usual per-group percentile window would
    // sort every lineitem of a priority class on one reducer at 100 TB; this shape's
    // only corpus-scale steps are the join and the histogram reduction.
    "lineitem_delay_percentiles" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"))
      val ord = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderdate"))
      val hist = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .selectExpr("o_orderpriority AS priority",
          "CAST(datediff(CAST(l_shipdate AS DATE), CAST(o_orderdate AS DATE)) AS BIGINT) AS delay_days")
        .groupBy(col("priority"), col("delay_days"))
        .agg(count(lit(1)).as("n"))
      val run = Window.partitionBy(col("priority")).orderBy(asc("delay_days"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      hist
        .withColumn("cum", sum(col("n")).over(run))
        .withColumn("total", sum(col("n")).over(Window.partitionBy(col("priority"))))
        .groupBy(col("priority"))
        .agg(max(col("total")).as("n_items"),
          min(when(expr("cum * 100 >= total * 50"), col("delay_days"))).as("p50_days"),
          min(when(expr("cum * 100 >= total * 90"), col("delay_days"))).as("p90_days"),
          min(when(expr("cum * 100 >= total * 99"), col("delay_days"))).as("p99_days"),
          max(col("delay_days")).as("max_days"))
        .orderBy(asc("priority"))
    }),

    // End-to-end training-corpus pipeline: exact-dedup keep-first ->
    // quality gate (token count + stopword ratio) -> per-lang yield.
    // Revenue concentration (Lorenz curve) WITHOUT a global rank window:
    // per-part revenue (the only corpus-scale shuffle, map-side combined),
    // parts binned by the DIGIT COUNT of their revenue — an integer-exact
    // log10 bucket both engines render identically — then cumulative
    // shares from the richest bin down over the <= 19-row bin table (the
    // one single-partition window, on a relation bounded by bigint's digit
    // count, never by the corpus). The naive "top-k% of parts" global
    // sort+cumsum this replaces would single-partition 2e10 parts at
    // 100 TB; the histogram shape keeps every corpus-scale step
    // combine-friendly and the answer exact per bin.
    "part_revenue_concentration" -> ((s, d) => {
      val perPart = t(s, d, "lineitem")
        .selectExpr("l_partkey",
          "CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * " +
            "(CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4))) AS DECIMAL(28,8)) * " +
            "CAST(100000000 AS DECIMAL(9,0)) AS BIGINT) AS r8")
        .groupBy(col("l_partkey"))
        .agg(sum(col("r8")).cast("bigint").as("rev_e8"))
      val bins = perPart
        // BIGINT to match DuckDB's length() (Spark's is INT)
        .selectExpr("CAST(length(CAST(rev_e8 AS STRING)) AS BIGINT) AS rev_digits", "rev_e8")
        .groupBy(col("rev_digits"))
        // bin/total/cumulative revenue ride DECIMAL(38,0): per-PART e8
        // revenue fits bigint at any scale (rows-per-part is corpus-
        // invariant), but the BIN and grand sums are corpus-sized —
        // Σrev·10⁸ passed 2^63 at the 10×-of-sf0.1 gate (ANSI overflow,
        // caught there) and is ~10²¹ at 100 TB
        .agg(count(lit(1)).as("n_parts"),
          sum(col("rev_e8").cast("decimal(38,0)")).as("bin_rev_e8"))
      val tot = bins.agg(sum(col("n_parts")).cast("bigint").as("t_parts"),
        sum(col("bin_rev_e8")).as("t_rev"))
      val w = Window.orderBy(desc("rev_digits"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      bins.crossJoin(broadcast(tot))
        .withColumn("cum_parts", sum(col("n_parts")).over(w).cast("bigint"))
        .withColumn("cum_rev_e8", sum(col("bin_rev_e8")).over(w))
        // the two corpus-sized sums emit as STRING integers: r11's
        // DECIMAL(38,0) emission hash-mismatched in the driver harness
        // despite byte-equal values under DuckDB 1.0.0 — a decimal
        // canonicalization/version sensitivity this sidesteps entirely
        // (digit strings render identically in every engine version)
        .selectExpr("rev_digits", "n_parts",
          "CAST(bin_rev_e8 AS STRING) AS bin_rev_e8", "cum_parts",
          "CAST(cum_rev_e8 AS STRING) AS cum_rev_e8",
          "CAST((CAST(cum_parts AS DECIMAL(38,0)) * 10000) div t_parts AS BIGINT) AS cum_parts_bp",
          "CAST((cum_rev_e8 * 10000) div t_rev AS BIGINT) AS cum_rev_bp")
        .orderBy(desc("rev_digits"))
    }),

    // Skyline (Pareto front) per order priority: the orders no other
    // same-priority order dominates in (earlier date, higher price) —
    // multi-objective dominance, a query class none of the rank/top-k
    // operators covers. 2-D dominance only depends on the per-day MAX
    // price, so the corpus collapses with one groupBy to the
    // priorities×days grid (grid-sized at any corpus: TPC-H spans ~2.4k
    // days), the strictly-increasing-prefix-max scan runs as a window on
    // THAT grid (partitioned by priority — never a corpus sort), and the
    // surviving (priority, day, max price) triples join back to orders to
    // recover the order keys — front-sized, broadcast-able. Price ties on
    // a front day are all on the front (dominance needs one strict
    // coordinate); later days matching an earlier max are NOT (earlier
    // date is strict). Prices compare as exact e4 integers.
    "orders_pareto_front" -> ((s, d) => {
      val e4 = "CAST(CAST(o_totalprice AS DECIMAL(18,4)) * CAST(10000 AS DECIMAL(5,0)) AS BIGINT)"
      val o = t(s, d, "orders").selectExpr(
        "o_orderpriority AS priority", "o_orderkey",
        "CAST(datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') AS BIGINT) AS day",
        s"$e4 AS price_e4")
      val dayMax = o.groupBy(col("priority"), col("day"))
        .agg(max(col("price_e4")).as("day_max"))
      val prior = Window.partitionBy(col("priority")).orderBy(asc("day"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val front = dayMax
        .withColumn("prev_max", max(col("day_max")).over(prior))
        .filter(col("prev_max").isNull || col("day_max") > col("prev_max"))
        .select(col("priority").as("f_priority"), col("day").as("f_day"),
          col("day_max"))
      o.join(broadcast(front),
          col("priority") === col("f_priority") && col("day") === col("f_day") &&
            col("price_e4") === col("day_max"))
        .select(col("priority"), col("day"), col("o_orderkey"), col("price_e4"))
        .orderBy(asc("priority"), asc("day"), asc("o_orderkey"))
    }),

    "corpus_pipeline" -> ((s, d) => {
      val toks = tokensSpark("text")
      val scored = t(s, d, "documents").selectExpr(
        "doc_id", "lang", "md5(text) AS h",
        s"size($toks) AS n_tokens",
        s"(size(filter($toks, t -> t IN ('the','a','of','and','to','is'))) * 10000) " +
          s"div greatest(size($toks), 1) AS stopword_bp")
      val keepFirst = scored.withColumn("rk",
          row_number().over(Window.partitionBy(col("h")).orderBy(asc("doc_id"))))
        .filter(col("rk") === 1)
      keepFirst
        .withColumn("passes", (col("n_tokens") >= 20 && col("stopword_bp") < 2000).cast("int"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("passes")).cast("bigint").as("n_kept"),
          sum(when(col("passes") === 1, col("n_tokens")).otherwise(0L)).cast("bigint").as("kept_tokens"))
        .orderBy(asc("lang"))
    })
  )

  def oracles: Map[String, String] = {
    val toks = tokensDuck("text")
    Map(
      "orders_value_gini" -> {
        val pwDuck = (0 to 16).map(i => s"WHEN $i THEN ${"1" + "0" * i}")
          .mkString("CASE greatest(length(CAST(x AS VARCHAR)) - 3, 0) ", " ", " ELSE 1 END")
        "WITH cust AS (SELECT o_custkey, CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * " +
          "CAST(10000 AS DECIMAL(5,0)) AS BIGINT)) AS BIGINT) AS x FROM orders GROUP BY o_custkey), " +
          "seg AS (SELECT c.c_mktsegment AS segment, " +
          s"(cust.x // ($pwDuck)) * ($pwDuck) AS q " +
          "FROM cust JOIN customer c ON cust.o_custkey = c.c_custkey), " +
          "h AS (SELECT segment, q, count(*) AS f FROM seg GROUP BY segment, q), " +
          "e AS (SELECT segment, q, f, " +
          "CAST(sum(f) OVER (PARTITION BY segment ORDER BY q) AS BIGINT) - f AS cum_before FROM h), " +
          "a AS (SELECT segment, CAST(sum(f) AS BIGINT) AS n_customers, " +
          "sum(CAST(q AS HUGEINT) * f) AS s, " +
          "sum(CAST(q AS HUGEINT) * (CAST(f AS HUGEINT) * cum_before + " +
          "(CAST(f AS HUGEINT) * (f + 1)) // 2)) AS w FROM e GROUP BY segment) " +
          "SELECT segment, n_customers, CAST(s AS BIGINT) AS total_rev_e4, " +
          "CAST(((2 * w - (CAST(n_customers AS HUGEINT) + 1) * s) * 1000000) " +
          "// (CAST(n_customers AS HUGEINT) * s) AS BIGINT) AS gini_ppm " +
          "FROM a ORDER BY segment"
      },
      "events_user_gini" ->
        ("WITH ux AS (SELECT event_type, user_id, count(*) AS x FROM events " +
          "GROUP BY event_type, user_id), " +
          "h AS (SELECT event_type, x, count(*) AS f FROM ux GROUP BY event_type, x), " +
          "e AS (SELECT event_type, x, f, " +
          "CAST(sum(f) OVER (PARTITION BY event_type ORDER BY x) AS BIGINT) - f AS cum_before FROM h), " +
          "a AS (SELECT event_type, CAST(sum(f) AS BIGINT) AS n_users, " +
          "sum(CAST(x AS HUGEINT) * f) AS s, " +
          "sum(CAST(x AS HUGEINT) * (CAST(f AS HUGEINT) * cum_before + " +
          "(CAST(f AS HUGEINT) * (f + 1)) // 2)) AS w FROM e GROUP BY event_type) " +
          "SELECT event_type, n_users, CAST(s AS BIGINT) AS n_events, " +
          "CAST(((2 * w - (CAST(n_users AS HUGEINT) + 1) * s) * 1000000) " +
          "// (CAST(n_users AS HUGEINT) * s) AS BIGINT) AS gini_ppm " +
          "FROM a ORDER BY event_type"),
      "rollup_corpus" ->
        ("SELECT COALESCE(lang, '<all>') AS lang, COALESCE(source, '<all>') AS source, " +
          "count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars " +
          "FROM documents GROUP BY ROLLUP(lang, source) ORDER BY lang, source"),
      "cube_order_status" ->
        ("SELECT COALESCE(o_orderstatus, '<all>') AS o_orderstatus, " +
          "COALESCE(o_orderpriority, '<all>') AS o_orderpriority, " +
          "count(*) AS n_orders, " +
          "CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * " +
          "CAST(10000 AS DECIMAL(5,0)) AS BIGINT)) AS BIGINT) AS total_value_e4 " +
          "FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority) " +
          "ORDER BY o_orderstatus, o_orderpriority"),
      "orders_grouping_sets" ->
        ("WITH g AS (SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders, " +
          "CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * " +
          "CAST(10000 AS DECIMAL(5,0)) AS BIGINT)) AS BIGINT) AS total_value_e4 " +
          "FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())) " +
          "SELECT CASE WHEN o_orderstatus IS NOT NULL THEN 'by_status' " +
          "WHEN o_orderpriority IS NOT NULL THEN 'by_priority' ELSE 'grand' END AS level, " +
          "COALESCE(o_orderstatus, '<all>') AS o_orderstatus, " +
          "COALESCE(o_orderpriority, '<all>') AS o_orderpriority, " +
          "n_orders, total_value_e4 FROM g " +
          "ORDER BY level, o_orderstatus, o_orderpriority"),
      "customer_value_quartiles" ->
        ("WITH cv AS (SELECT o_custkey, " +
          "CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * " +
          "CAST(10000 AS DECIMAL(5,0)) AS BIGINT)) AS BIGINT) AS value_e4 " +
          "FROM orders GROUP BY o_custkey), " +
          "q AS (SELECT value_e4, ntile(4) OVER " +
          "(ORDER BY value_e4 DESC, o_custkey) AS quartile FROM cv) " +
          "SELECT quartile, count(*) AS n_customers, min(value_e4) AS min_value_e4, " +
          "max(value_e4) AS max_value_e4 FROM q GROUP BY quartile ORDER BY quartile"),
      "q2_cheapest_per_type" ->
        ("SELECT p_type, p_partkey, p_brand, p_retailprice FROM part " +
          "WHERE p_retailprice = (SELECT min(p2.p_retailprice) FROM part p2 " +
          "WHERE p2.p_type = part.p_type) ORDER BY p_type, p_partkey"),
      "events_funnel" ->
        ("WITH v AS (SELECT user_id, min(epoch_us(ts)) AS first_view FROM events " +
          "WHERE event_type = 'view' GROUP BY user_id), " +
          "c AS (SELECT v.user_id, v.first_view, min(epoch_us(e.ts)) AS first_click_after_view " +
          "FROM v JOIN events e ON e.user_id = v.user_id AND e.event_type = 'click' " +
          "AND epoch_us(e.ts) > v.first_view GROUP BY v.user_id, v.first_view), " +
          "p AS (SELECT c.user_id, min(epoch_us(e.ts)) AS first_purchase_after_click " +
          "FROM c JOIN events e ON e.user_id = c.user_id AND e.event_type = 'purchase' " +
          "AND epoch_us(e.ts) > c.first_click_after_view GROUP BY c.user_id) " +
          "SELECT (SELECT count(*) FROM v) AS n_viewed, (SELECT count(*) FROM c) AS n_clicked, " +
          "(SELECT count(*) FROM p) AS n_purchased"),
      "supplier_scorecard" ->
        ("WITH li AS (SELECT l_suppkey, " +
          "CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * " +
          "(CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4))) AS DECIMAL(28,8)) * " +
          "CAST(100000000 AS DECIMAL(9,0)) AS BIGINT) AS rev_e8, " +
          "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS ret, " +
          "CAST(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS BIGINT) AS delay " +
          "FROM lineitem JOIN orders ON l_orderkey = o_orderkey), " +
          "h AS (SELECT l_suppkey, delay, count(*) AS n, CAST(sum(rev_e8) AS BIGINT) AS rev_e8, " +
          "CAST(sum(ret) AS BIGINT) AS n_ret FROM li GROUP BY l_suppkey, delay), " +
          "c AS (SELECT *, CAST(sum(n) OVER (PARTITION BY l_suppkey ORDER BY delay " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum, " +
          "CAST(sum(n) OVER (PARTITION BY l_suppkey) AS BIGINT) AS total FROM h), " +
          "sc AS (SELECT l_suppkey, max(total) AS n_items, CAST(sum(rev_e8) AS BIGINT) AS revenue_e8, " +
          "CAST(sum(n_ret) AS BIGINT) AS n_returns, " +
          "min(CASE WHEN cum * 10 >= total * 9 THEN delay END) AS p90_delay_days " +
          "FROM c GROUP BY l_suppkey) " +
          "SELECT s_suppkey, s_name, n_items, revenue_e8, " +
          "(n_returns * 10000) // n_items AS return_bp, p90_delay_days, " +
          "CASE WHEN (n_returns * 10000) // n_items <= 2500 AND p90_delay_days <= 100 THEN 'A' " +
          "WHEN (n_returns * 10000) // n_items <= 3500 THEN 'B' ELSE 'C' END AS grade " +
          "FROM sc JOIN supplier ON l_suppkey = s_suppkey " +
          "ORDER BY revenue_e8 DESC, s_suppkey LIMIT 20"),

      "orders_bloom_semijoin" -> {
        val M = 65520L
        def h(c: String, a: Long, b: Long) =
          s"(((($c) % ${BloomP}) * $a + $b) % ${BloomP}) % $M"
        s"WITH build AS (SELECT o_orderkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'), " +
          s"pos AS (SELECT ${h("k", 2654435761L, 97L)} AS pos FROM build " +
          s"UNION ALL SELECT ${h("k", 982451653L, 541L)} FROM build), " +
          "words AS (SELECT pos // 63 AS w, bit_or(CAST(1 AS BIGINT) << CAST(pos % 63 AS INT)) AS bits " +
          "FROM pos GROUP BY pos // 63), " +
          s"probe AS (SELECT l_orderkey AS k, ${h("l_orderkey", 2654435761L, 97L)} AS p1, " +
          s"${h("l_orderkey", 982451653L, 541L)} AS p2 FROM lineitem), " +
          "px AS (SELECT p.k, CASE WHEN w1.bits IS NOT NULL " +
          "AND (w1.bits & (CAST(1 AS BIGINT) << CAST(p.p1 % 63 AS INT))) != 0 " +
          "AND w2.bits IS NOT NULL " +
          "AND (w2.bits & (CAST(1 AS BIGINT) << CAST(p.p2 % 63 AS INT))) != 0 " +
          "THEN 1 ELSE 0 END AS pass FROM probe p " +
          "LEFT JOIN words w1 ON p.p1 // 63 = w1.w " +
          "LEFT JOIN words w2 ON p.p2 // 63 = w2.w), " +
          "bs AS (SELECT DISTINCT k FROM build), " +
          "j AS (SELECT px.pass, CASE WHEN bs.k IS NOT NULL THEN 1 ELSE 0 END AS is_match " +
          "FROM px LEFT JOIN bs ON px.k = bs.k) " +
          "SELECT count(*) AS n_probe_rows, CAST(sum(pass) AS BIGINT) AS n_bloom_pass, " +
          "CAST(sum(is_match) AS BIGINT) AS n_exact_match, " +
          "CAST(sum(pass * (1 - is_match)) AS BIGINT) AS n_false_pos, " +
          "(CAST(sum(pass * (1 - is_match)) AS BIGINT) * 10000) // " +
          "greatest(count(*) - CAST(sum(is_match) AS BIGINT), 1) AS fp_bp FROM j"
      },

      "orders_backlog_timeline" ->
        ("WITH o AS (SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS day FROM orders), " +
          "op AS (SELECT day, count(*) AS n_opened FROM o GROUP BY day), " +
          "ls AS (SELECT l_orderkey, max(CAST(date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS BIGINT)) AS day " +
          "FROM lineitem GROUP BY l_orderkey), " +
          "cl AS (SELECT day, count(*) AS n_closed FROM ls GROUP BY day), " +
          "j AS (SELECT coalesce(op.day, cl.day) AS day, " +
          "CAST(coalesce(n_opened, 0) AS BIGINT) AS n_opened, " +
          "CAST(coalesce(n_closed, 0) AS BIGINT) AS n_closed " +
          "FROM op FULL OUTER JOIN cl ON op.day = cl.day) " +
          "SELECT day, n_opened, n_closed, " +
          "CAST(sum(n_opened - n_closed) OVER (ORDER BY day " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS open_backlog " +
          "FROM j ORDER BY day"),

      "events_funnel_windowed" ->
        ("WITH v AS (SELECT user_id, min(epoch_us(ts)) AS first_view FROM events " +
          "WHERE event_type = 'view' GROUP BY user_id), " +
          "c AS (SELECT v.user_id, min(epoch_us(e.ts)) AS first_click_24h " +
          "FROM v JOIN events e ON e.user_id = v.user_id AND e.event_type = 'click' " +
          "AND epoch_us(e.ts) > v.first_view " +
          "AND epoch_us(e.ts) <= v.first_view + 86400000000 " +
          "GROUP BY v.user_id), " +
          "p AS (SELECT c.user_id, min(epoch_us(e.ts)) AS first_purchase_24h " +
          "FROM c JOIN events e ON e.user_id = c.user_id AND e.event_type = 'purchase' " +
          "AND epoch_us(e.ts) > c.first_click_24h " +
          "AND epoch_us(e.ts) <= c.first_click_24h + 86400000000 " +
          "GROUP BY c.user_id) " +
          "SELECT (SELECT count(*) FROM v) AS n_viewed, " +
          "(SELECT count(*) FROM c) AS n_clicked_24h, " +
          "(SELECT count(*) FROM p) AS n_purchased_24h"),
      "orders_status_pivot" ->
        ("SELECT c_mktsegment, " +
          "count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f, " +
          "count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o, " +
          "count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p, " +
          "CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * CAST(10000 AS DECIMAL(5,0)) AS BIGINT)) " +
          "FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS sum_f_e4 " +
          "FROM orders JOIN customer ON o_custkey = c_custkey " +
          "GROUP BY c_mktsegment ORDER BY c_mktsegment"),
      "lineitem_quantiles" ->
        ("WITH l AS (SELECT l_returnflag AS flag, " +
          "CAST(l_extendedprice AS DECIMAL(18,4)) AS price FROM lineitem), " +
          "r AS (SELECT flag, price, row_number() OVER " +
          "(PARTITION BY flag ORDER BY price) AS rn FROM l), " +
          "c AS (SELECT flag, count(*) AS n FROM l GROUP BY flag), " +
          "t AS (SELECT flag, q, (q * (n - 1)) // 10 + 1 AS idx " +
          "FROM c, (SELECT unnest(range(0, 11)) AS q) qs) " +
          "SELECT t.flag, t.q, " +
          "CAST(r.price * CAST(10000 AS DECIMAL(5,0)) AS BIGINT) AS price_e4 " +
          "FROM t JOIN r ON r.flag = t.flag AND r.rn = t.idx " +
          "ORDER BY t.flag, t.q"),
      "lineitem_delay_percentiles" ->
        ("WITH j AS (SELECT o_orderpriority AS priority, " +
          "CAST(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS BIGINT) AS delay_days " +
          "FROM lineitem JOIN orders ON l_orderkey = o_orderkey), " +
          "h AS (SELECT priority, delay_days, count(*) AS n FROM j GROUP BY priority, delay_days), " +
          "c AS (SELECT *, CAST(sum(n) OVER (PARTITION BY priority ORDER BY delay_days " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum, " +
          "CAST(sum(n) OVER (PARTITION BY priority) AS BIGINT) AS total FROM h) " +
          "SELECT priority, max(total) AS n_items, " +
          "min(CASE WHEN cum * 100 >= total * 50 THEN delay_days END) AS p50_days, " +
          "min(CASE WHEN cum * 100 >= total * 90 THEN delay_days END) AS p90_days, " +
          "min(CASE WHEN cum * 100 >= total * 99 THEN delay_days END) AS p99_days, " +
          "max(delay_days) AS max_days " +
          "FROM c GROUP BY priority ORDER BY priority"),

      "part_revenue_concentration" ->
        ("WITH pp AS (SELECT l_partkey, CAST(sum(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * " +
          "(CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4))) AS DECIMAL(28,8)) * " +
          "CAST(100000000 AS DECIMAL(9,0)) AS BIGINT)) AS BIGINT) AS rev_e8 " +
          "FROM lineitem GROUP BY l_partkey), " +
          // bin/cum/total revenue in HUGEINT internally (the corpus-sized
          // e8 sums pass 2^63 — caught at the 10×-of-sf0.1 gate), EMITTED
          // AS VARCHAR integer strings: version- and hash-stable in every
          // DuckDB/driver canonicalization (r11's DECIMAL(38,0) emission
          // was driver-red while byte-equal under DuckDB 1.0.0)
          "b AS (SELECT length(CAST(rev_e8 AS VARCHAR)) AS rev_digits, count(*) AS n_parts, " +
          "sum(CAST(rev_e8 AS HUGEINT)) AS bin_rev_e8 FROM pp GROUP BY rev_digits), " +
          "t AS (SELECT CAST(sum(n_parts) AS BIGINT) AS t_parts, " +
          "sum(bin_rev_e8) AS t_rev FROM b), " +
          "c AS (SELECT rev_digits, n_parts, bin_rev_e8, " +
          "CAST(sum(n_parts) OVER w AS BIGINT) AS cum_parts, " +
          "sum(bin_rev_e8) OVER w AS cum_rev_e8 FROM b " +
          "WINDOW w AS (ORDER BY rev_digits DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) " +
          "SELECT rev_digits, n_parts, CAST(bin_rev_e8 AS VARCHAR) AS bin_rev_e8, " +
          "cum_parts, CAST(cum_rev_e8 AS VARCHAR) AS cum_rev_e8, " +
          "CAST((CAST(cum_parts AS HUGEINT) * 10000) // t_parts AS BIGINT) AS cum_parts_bp, " +
          "CAST((cum_rev_e8 * 10000) // t_rev AS BIGINT) AS cum_rev_bp " +
          "FROM c, t ORDER BY rev_digits DESC"),

      "orders_pareto_front" ->
        ("WITH o AS (SELECT o_orderpriority AS priority, o_orderkey, " +
          "CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS day, " +
          "CAST(CAST(o_totalprice AS DECIMAL(18,4)) * CAST(10000 AS DECIMAL(5,0)) AS BIGINT) AS price_e4 " +
          "FROM orders), " +
          "dm AS (SELECT priority, day, max(price_e4) AS day_max FROM o GROUP BY priority, day), " +
          "f AS (SELECT priority, day, day_max, max(day_max) OVER " +
          "(PARTITION BY priority ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max " +
          "FROM dm) " +
          "SELECT o.priority, o.day, o.o_orderkey, o.price_e4 " +
          "FROM o JOIN f ON o.priority = f.priority AND o.day = f.day AND o.price_e4 = f.day_max " +
          "WHERE f.prev_max IS NULL OR f.day_max > f.prev_max " +
          "ORDER BY o.priority, o.day, o.o_orderkey"),

      "corpus_pipeline" ->
        (s"WITH scored AS (SELECT doc_id, lang, md5(text) AS h, len($toks) AS n_tokens, " +
          s"(len(list_filter($toks, t -> t IN ('the','a','of','and','to','is'))) * 10000) " +
          s"// greatest(len($toks), 1) AS stopword_bp FROM documents), " +
          "kept AS (SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rk FROM scored), " +
          "gated AS (SELECT lang, n_tokens, " +
          "CASE WHEN n_tokens >= 20 AND stopword_bp < 2000 THEN 1 ELSE 0 END AS passes " +
          "FROM kept WHERE rk = 1) " +
          "SELECT lang, count(*) AS n_docs, CAST(sum(passes) AS BIGINT) AS n_kept, " +
          "CAST(sum(CASE WHEN passes = 1 THEN n_tokens ELSE 0 END) AS BIGINT) AS kept_tokens " +
          "FROM gated GROUP BY lang ORDER BY lang")
    )
  }
}
