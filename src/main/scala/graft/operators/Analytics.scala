package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational analytics over the TPC-H-ish star schema — the general-purpose
  * query layer of the engine (aggregation, multi-way joins, window
  * functions, sessionization). Written Spark-first: broadcast hints on the
  * dimension sides, decimal arithmetic for cross-engine-exact aggregation,
  * and total output ordering for the oracle hash-compare.
  *
  * At 100 TB the fact tables (lineitem/orders/events) are the scan side;
  * region/nation/customer/supplier/part are broadcast dims, so none of
  * these plans shuffles more than one fact table.
  */
object Analytics {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(spark, dir, name)

  /** TPC-H date columns load as TIMESTAMP_NTZ; epoch under the UTC session
    * tz matches DuckDB's epoch_us on naive timestamps. */
  private def epochUs(c: org.apache.spark.sql.Column) = unix_micros(c.cast("timestamp"))

  private val dec = "decimal(18,4)"
  // Output contract: no DECIMAL-typed column ever leaves a query. Decimal
  // arithmetic stays internal (exactness), but every money/measure sum is
  // emitted as a scaled integer — per-row the decimal is shifted to an
  // exactly-integral value (×10⁴ for scale-4 money, ×10⁸ for scale-8
  // revenue), cast to BIGINT, summed, and the sum cast to BIGINT again on
  // BOTH engines (Spark sum(bigint)=bigint, DuckDB=HUGEINT). Decimal
  // renderings diverge between hashers; scaled BIGINTs cannot. The `_e4` /
  // `_e8` suffix documents the scale. (The scaling is part of the
  // oracle-rendering contract only; a production caller gets the decimal
  // by dividing, and internal aggregation never narrows.)
  private def e4(c: org.apache.spark.sql.Column) =
    (c * lit(10000).cast("decimal(5,0)")).cast("bigint")
  private def e8row(c: org.apache.spark.sql.Column) =
    (c * lit(100000000).cast("decimal(9,0)")).cast("bigint")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-style pricing summary: single-pass partial-agg-friendly scan.
    "q1_pricing_summary" -> ((s, d) => {
      val l = t(s, d, "lineitem")
      val qty = col("l_quantity").cast(dec)
      val price = col("l_extendedprice").cast(dec)
      val discFactor = (lit(1).cast("decimal(5,4)") - col("l_discount").cast("decimal(5,4)"))
      l.filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(e4(qty)).cast("bigint").as("sum_qty_e4"),
          sum(e4(price)).cast("bigint").as("sum_base_price_e4"),
          sum(e8row((price * discFactor).cast("decimal(28,8)"))).cast("bigint").as("sum_disc_price_e8"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // TPC-H Q3-style: top-10 orders by discounted revenue for one segment.
    // Scale shape: only the filtered CUSTOMER dim is broadcast (into
    // orders); lineitem ⨝ orders is fact ⨝ fact and must shuffle on
    // l_orderkey — broadcasting an orders-derived set would OOM executors
    // at 100 TB. AQE can still convert to broadcast at tiny SFs.
    "q3_top_revenue" -> ((s, d) => {
      val cust = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = t(s, d, "orders")
      val li = t(s, d, "lineitem")
      li.join(ord.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
            .select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), epochUs(col("o_orderdate")).as("o_orderdate_us"))
        .agg(sum(e8row((col("l_extendedprice").cast(dec) *
          (lit(1).cast("decimal(5,4)") - col("l_discount").cast("decimal(5,4)")))
          .cast("decimal(28,8)"))).cast("bigint").as("revenue_e8"))
        .orderBy(desc("revenue_e8"), asc("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5-style: revenue per nation through a 5-way join. True dims
    // (supplier/nation) broadcast; orders and customer are fact-scale at
    // 100 TB, so lineitem ⨝ orders ⨝ customer are shuffle joins on their
    // keys (AQE may downgrade to broadcast at small SFs — that's its call,
    // not a hint that pins fact tables into executor memory).
    // TPC-H Q6-style forecast-revenue-change: the canonical scan-filter-sum
    // — zero joins, zero shuffles beyond the final single-row aggregate;
    // every predicate (shipdate year, discount band, quantity cap) must
    // reach the parquet scan as a pushed filter. The price×discount product
    // stays decimal internally and leaves as an e8-scaled BIGINT.
    "q6_revenue_change" -> ((s, d) => {
      val l = t(s, d, "lineitem")
      val price = col("l_extendedprice").cast(dec)
      val disc = col("l_discount").cast("decimal(5,4)")
      l.filter(
          col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
          col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
          disc >= lit("0.05").cast("decimal(5,4)") &&
          disc <= lit("0.07").cast("decimal(5,4)") &&
          col("l_quantity") < 24)
        .agg(
          sum(e8row((price * disc).cast("decimal(28,8)"))).cast("bigint").as("revenue_e8"),
          count(lit(1)).as("n_rows"))
    }),

    // TPC-H Q4-style: order counts by priority for orders with at least
    // one qualifying line — the LEFT SEMI join shape (existence, no fact
    // fan-out: a matching order contributes once no matter how many lines
    // qualify). At 100 TB the semi-join shuffles both fact sides on
    // l_orderkey but materializes only the orders side — Spark's semi
    // build keeps the probe relation out of the result entirely.
    "q4_priority_semijoin" -> ((s, d) => {
      val o = t(s, d, "orders").filter(
        col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
        col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1996-07-01 00:00:00")))
      val l = t(s, d, "lineitem")
        .filter(col("l_discount").cast("decimal(5,4)") >= lit("0.08").cast("decimal(5,4)"))
        .select(col("l_orderkey"))
      o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(asc("o_orderpriority"))
    }),

    // TPC-H Q13-style: orders-per-customer distribution — LEFT OUTER join
    // preserving zero-order customers, then the two-level count-of-counts.
    // The histogram's second aggregation is tiny (distinct order counts),
    // so the only corpus-sized shuffle is the c_custkey join + first agg.
    "q13_order_distribution" -> ((s, d) => {
      val c = t(s, d, "customer").select(col("c_custkey"))
      val o = t(s, d, "orders").select(col("o_custkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_custkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(desc("custdist"), desc("c_count"))
    }),

    // TPC-H Q14-style promo revenue share: ratio of conditional sums over
    // one month of the part ⨝ lineitem join, emitted as exact basis
    // points of the e8-scaled sums (integer division — no float ratio
    // crosses the engine boundary). Part is the true dim and broadcasts.
    "q14_promo_share" -> ((s, d) => {
      val l = t(s, d, "lineitem").filter(
        col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1996-03-01 00:00:00")) &&
        col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1996-04-01 00:00:00")))
      val p = t(s, d, "part").select(col("p_partkey"), col("p_type"))
      val price = col("l_extendedprice").cast(dec)
      val discFactor = (lit(1).cast("decimal(5,4)") - col("l_discount").cast("decimal(5,4)"))
      val rev = e8row((price * discFactor).cast("decimal(28,8)"))
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0L))).cast("bigint").as("promo_rev_e8"),
          sum(rev).cast("bigint").as("total_rev_e8"))
        // both sums pre-scale down by 1e4 before the ratio: promo_e8·10⁴
        // overflows int64 once monthly revenue passes ~9·10¹⁴ (already at
        // sf0.1) — the identical expression on both engines keeps the bp
        // result deterministic
        // greatest(…, 1) guards the degenerate all-zero-revenue month:
        // DuckDB raises on integer division by zero while non-ANSI Spark
        // yields NULL — the identical guard keeps both engines total
        .selectExpr("promo_rev_e8", "total_rev_e8",
          "((promo_rev_e8 div 10000) * 10000) div greatest(total_rev_e8 div 10000, 1) AS promo_bp")
    }),

    // TPC-H Q7-style volume shipping: the join-ORDER probe — lineitem ⨝
    // supplier ⨝ orders ⨝ customer ⨝ nation×nation with a DISJUNCTIVE
    // nation-pair predicate. The two nation uses pre-filter their join
    // sides to the 2-nation superset (pushdown below the joins), while the
    // exact pair disjunction is the residual filter after the last join —
    // the shape that tests whether the optimizer keeps the cheap dims
    // broadcast (supplier⨝nation rides into lineitem map-side) and
    // shuffles only the two fact⨝fact joins (orderkey, then custkey).
    "q7_volume_shipping" -> ((s, d) => {
      val n = t(s, d, "nation")
        .filter(col("n_name").isin("NATION_1", "NATION_2"))
        .select(col("n_nationkey"), col("n_name"))
      val sup = t(s, d, "supplier").join(broadcast(n),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cust = t(s, d, "customer").join(broadcast(n),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      val o = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
      t(s, d, "lineitem")
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
                (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("bigint").as("l_year"))
        .agg(sum(e8row((col("l_extendedprice").cast(dec) *
          (lit(1).cast("decimal(5,4)") - col("l_discount").cast("decimal(5,4)")))
          .cast("decimal(28,8)"))).cast("bigint").as("revenue_e8"))
        .orderBy(asc("supp_nation"), asc("cust_nation"), asc("l_year"))
    }),

    // TPC-H Q16-style supplier counts: the anti-join + count-distinct
    // probe. The part-supplier association is derived from lineitem (this
    // schema has no partsupp): broadcast the filtered part dim INTO the
    // fact scan FIRST so the dedup shuffle only carries qualifying pairs,
    // anti-join the (tiny, broadcast) negative-balance supplier set — the
    // NOT IN shape — then count distinct suppliers per part group.
    "q16_supplier_cnt" -> ((s, d) => {
      val p = t(s, d, "part")
        .filter(col("p_brand") =!= "Brand#15" && col("p_type") =!= "MEDIUM" &&
          col("p_size").isin(1, 4, 7, 10, 14, 23, 25, 45))
        .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
      val bad = t(s, d, "supplier").filter(col("s_acctbal") < 0).select(col("s_suppkey"))
      t(s, d, "lineitem").select(col("l_partkey"), col("l_suppkey"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"), col("l_suppkey"),
          col("p_brand"), col("p_type"), col("p_size"))
        .distinct()
        .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(desc("supplier_cnt"), asc("p_brand"), asc("p_type"), asc("p_size"))
    }),

    // TPC-H Q9-style product-type profit: the multi-fact SNOWFLAKE probe —
    // lineitem ⨝ part ⨝ supplier ⨝ nation ⨝ orders, profit measure mixing
    // columns from three relations, grouped by nation × order-year. (This
    // schema has no partsupp, so the cost leg is retailprice·qty·0.6 —
    // kept integer-exact: retail_e4 · qty · 6000 ≡ (retail·qty·0.6)·10⁸,
    // no decimal re-scaling anywhere near the engine boundary.) Part and
    // the supplier→nation arm broadcast; the two fact joins (orderkey) and
    // the group-by are the only shuffles.
    "q9_product_profit" -> ((s, d) => {
      val p = t(s, d, "part").filter(col("p_name").like("%red%"))
        .select(col("p_partkey"), col("p_retailprice"))
      val sup = t(s, d, "supplier").select(col("s_suppkey"), col("s_nationkey"))
      val n = t(s, d, "nation").select(col("n_nationkey"), col("n_name"))
      val o = t(s, d, "orders").select(col("o_orderkey"), col("o_orderdate"))
      val price = col("l_extendedprice").cast(dec)
      val discFactor = lit(1).cast("decimal(5,4)") - col("l_discount").cast("decimal(5,4)")
      val rev = e8row((price * discFactor).cast("decimal(28,8)"))
      t(s, d, "lineitem")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(sup.join(broadcast(n), col("s_nationkey") === col("n_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name"), year(col("o_orderdate")).cast("bigint").as("o_year"))
        .agg(sum(rev - e4(col("p_retailprice").cast(dec)) * col("l_quantity").cast("bigint") * lit(6000L))
          .cast("bigint").as("profit_e8"))
        .orderBy(asc("n_name"), desc("o_year"))
    }),

    // TPC-H Q20-style nested existence: suppliers who shipped an EXCESS
    // volume of the filtered parts inside one year — a semi-join against
    // an aggregated-with-HAVING subquery (the IN-(SELECT..GROUP BY..
    // HAVING) shape). The aggregate runs first and qualifies a tiny
    // supplier set; supplier then semi-joins it and the nation dim
    // broadcasts — no fact data survives past the HAVING.
    "q20_excess_suppliers" -> ((s, d) => {
      val p = t(s, d, "part").filter(col("p_name").like("small%")).select(col("p_partkey"))
      val qual = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")) &&
          col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1999-01-01 00:00:00")))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_suppkey"), col("l_partkey"))
        .agg(sum(col("l_quantity").cast("bigint")).as("q"))
        .filter(col("q") > 60L)
        .select(col("l_suppkey"))
      t(s, d, "supplier")
        .join(qual, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_name"), col("n_name"))
        .orderBy(asc("s_name"))
    }),

    // RFM segmentation — the classic customer-value cube for a marketing /
    // training-data pipeline: per-customer recency (last order day) /
    // frequency (order count) / monetary (e4-scaled spend), each scored
    // into quartiles by a deterministic ntile (ties broken on c_custkey),
    // then the 4×4×4 segment histogram. One orders shuffle builds the
    // per-customer base; the three ntile windows rank the CUSTOMER-sized
    // relation (not the fact table) — same single-reducer caveat and
    // remedy as customer_value_quartiles at extreme scale.
    "customer_rfm_segments" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val base = t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(max(epochUs(col("o_orderdate"))).as("last_us"),
          count(lit(1)).as("frequency"),
          sum(e4(col("o_totalprice").cast(dec))).cast("bigint").as("monetary_e4"))
      base
        .withColumn("r_q", ntile(4).over(Window.orderBy(desc("last_us"), asc("o_custkey"))).cast("bigint"))
        .withColumn("f_q", ntile(4).over(Window.orderBy(desc("frequency"), asc("o_custkey"))).cast("bigint"))
        .withColumn("m_q", ntile(4).over(Window.orderBy(desc("monetary_e4"), asc("o_custkey"))).cast("bigint"))
        .groupBy(col("r_q"), col("f_q"), col("m_q"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("monetary_e4")).cast("bigint").as("segment_monetary_e4"))
        .orderBy(asc("r_q"), asc("f_q"), asc("m_q"))
    }),

    // TPC-H Q12-style shipping-lateness report (this schema has no
    // shipmode/commitdate, so lateness = shipdate more than 60 days after
    // the order date): conditional counts per order priority, with the
    // day-difference computed as exact integer µs arithmetic — identical
    // `(ship_us - order_us) div 86400000000` on both engines, no
    // date-function semantics crossing the boundary.
    "q12_late_shipments" -> ((s, d) => {
      val o = t(s, d, "orders").select(col("o_orderkey"), col("o_orderpriority"),
        epochUs(col("o_orderdate")).as("order_us"))
      t(s, d, "lineitem")
        .select(col("l_orderkey"), epochUs(col("l_shipdate")).as("ship_us"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .selectExpr("o_orderpriority",
          "CAST((ship_us - order_us) div 86400000000 > 60 AS INT) AS is_late")
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("is_late")).cast("bigint").as("late_count"),
          count(lit(1)).as("n_lines"))
        .orderBy(asc("o_orderpriority"))
    }),

    // TPC-H Q10-style returned-item ranking: who costs us returns — the
    // two-fact-join + dim + top-N report shape. The returnflag filter
    // pushes to the lineitem scan, customer joins AFTER the orders join
    // keyed on custkey, nation broadcasts, and the top-20 is
    // TakeOrderedAndProject over the grouped relation.
    "q10_returned_items" -> ((s, d) => {
      val l = t(s, d, "lineitem").filter(col("l_returnflag") === "R")
      val o = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
      val c = t(s, d, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"), col("c_acctbal"))
      val n = t(s, d, "nation").select(col("n_nationkey"), col("n_name"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"),
          e4(col("c_acctbal").cast(dec)).as("acctbal_e4"))
        .agg(sum(e8row((col("l_extendedprice").cast(dec) *
          (lit(1).cast("decimal(5,4)") - col("l_discount").cast("decimal(5,4)")))
          .cast("decimal(28,8)"))).cast("bigint").as("revenue_e8"))
        .orderBy(desc("revenue_e8"), asc("c_custkey"))
        .limit(20)
    }),

    // TPC-H Q17-style small-quantity revenue: the CORRELATED-subquery
    // probe, decorrelated by hand the way Catalyst would — the per-part
    // average becomes a groupBy aggregate joined back to the fact rows.
    // The fractional comparison qty < avg/5 is kept integer-exact:
    // 5·qty·cnt < sum(qty) per part (the e4 scales cancel), so no float
    // division crosses the engine boundary.
    "q17_small_qty_revenue" -> ((s, d) => {
      val p = t(s, d, "part").filter(col("p_type") === "SMALL").select(col("p_partkey"))
      val l = t(s, d, "lineitem")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"), e4(col("l_quantity").cast(dec)).as("q4"),
          e4(col("l_extendedprice").cast(dec)).as("p4"))
      val stats = l.groupBy(col("l_partkey"))
        .agg(sum(col("q4")).cast("bigint").as("sum_q4"), count(lit(1)).as("cnt"))
      l.join(stats, Seq("l_partkey"))
        .filter(lit(5L) * col("q4") * col("cnt") < col("sum_q4"))
        .agg(sum(col("p4")).cast("bigint").as("revenue_e4"),
          count(lit(1)).as("n_rows"))
    }),

    // TPC-H Q11-style important parts: the SCALAR-subquery probe — the
    // corpus-wide total value is a one-row aggregate broadcast back, and
    // the HAVING fraction (value > total/2000) is an exact integer
    // cross-multiplication.
    "q11_important_parts" -> ((s, d) => {
      val v = t(s, d, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(sum(e4(col("l_extendedprice").cast(dec))).cast("bigint").as("value_e4"))
      val total = v.agg(sum(col("value_e4")).cast("bigint").as("total_e4"))
      v.crossJoin(broadcast(total))
        .filter(col("value_e4") * 2000L > col("total_e4"))
        .select(col("l_partkey"), col("value_e4"))
        .orderBy(desc("value_e4"), asc("l_partkey"))
    }),

    // First/last-touch attribution — the marketing-analytics join shape
    // over the event log: each converting user's first-ever event type
    // and the last event type strictly before their first purchase
    // ('none' when the purchase opens the history). All extrema are
    // min/max over (ts, event_id[, type]) structs — (ts, event_id) is a
    // total order, so the carried type never influences comparisons and
    // both engines pick identical rows.
    "events_attribution" -> ((s, d) => {
      // events.parquet carries INT64 TIMESTAMP(NANOS) — EventFinders.events
      // reads ts as nanos LongType; `div 1000` is the exact µs projection
      // matching the oracle's epoch_us
      val ev = EventFinders.events(s, d)
        .selectExpr("user_id", "event_id", "event_type", "ts div 1000 AS ts_us")
      val fp = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(min(struct(col("ts_us"), col("event_id"))).as("fp"))
      val fe = ev.groupBy(col("user_id"))
        .agg(min(struct(col("ts_us"), col("event_id"), col("event_type"))).as("fe"))
      val le = ev.join(fp, Seq("user_id"))
        .filter(struct(col("ts_us"), col("event_id")) < col("fp"))
        .groupBy(col("user_id"))
        .agg(max(struct(col("ts_us"), col("event_id"), col("event_type"))).as("le"))
      fp.join(fe, Seq("user_id"))
        .join(le, Seq("user_id"), "left")
        .selectExpr("fe.event_type AS first_touch",
          "coalesce(le.event_type, 'none') AS last_touch")
        .groupBy(col("first_touch"), col("last_touch"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(asc("first_touch"), asc("last_touch"))
    }),

    // TPC-H Q18-style large-volume orders: HAVING over a fact aggregate,
    // then join the survivors back to orders/customer. The aggregate runs
    // FIRST and the join sees only qualifying orderkeys — at 100 TB the
    // having-filtered set is tiny, so the back-join broadcasts while the
    // only corpus-sized shuffle is the groupBy(l_orderkey).
    "q18_large_orders" -> ((s, d) => {
      val big = t(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(e4(col("l_quantity").cast(dec))).cast("bigint").as("sum_qty_e4"))
        .filter(col("sum_qty_e4") > 1500000L)
      val o = t(s, d, "orders")
      val c = t(s, d, "customer")
      big.join(o, big("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .selectExpr("o_orderkey", "c_custkey", "sum_qty_e4",
          s"${"CAST(CAST(o_totalprice AS DECIMAL(18,4)) * CAST(10000 AS DECIMAL(5,0)) AS BIGINT)"} AS total_price_e4")
        .orderBy(desc("sum_qty_e4"), asc("o_orderkey"))
        .limit(20)
    }),

    // TPC-H Q19-style disjunctive predicate: OR of brand×quantity-band
    // conjunctions over part ⨝ lineitem. Catalyst pushes the common
    // p_brand IN (...) superset below the join and keeps the exact
    // disjunction as the post-join filter — the shape that tests OR
    // pushdown rather than simple conjunctive pruning.
    "q19_disjunctive_revenue" -> ((s, d) => {
      val l = t(s, d, "lineitem")
      val p = t(s, d, "part")
      val price = col("l_extendedprice").cast(dec)
      val discFactor = (lit(1).cast("decimal(5,4)") - col("l_discount").cast("decimal(5,4)"))
      l.join(p, col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#15" && col("l_quantity").between(1, 15)) ||
          (col("p_brand") === "Brand#23" && col("l_quantity").between(10, 25)))
        .agg(
          sum(e8row((price * discFactor).cast("decimal(28,8)"))).cast("bigint").as("revenue_e8"),
          count(lit(1)).as("n_rows"))
    }),

    // TPC-H Q8-style national market share: one target nation's slice of a
    // region's market per order year — the widest snowflake in the suite
    // (lineitem ⨝ part ⨝ supplier→nation ⨝ orders ⨝ customer→nation→region).
    // Part and the supplier arm broadcast into the lineitem scan; the
    // customer→region qualifier is a semi-join (no customer columns are
    // needed downstream, so the optimizer keeps it key-only). The share is
    // the q14 integer-exact basis-point rendering — no doubles cross the
    // engine boundary.
    "q8_market_share" -> ((s, d) => {
      val p = t(s, d, "part").filter(col("p_type") === "ECONOMY").select(col("p_partkey"))
      val supNat = t(s, d, "supplier")
        .join(broadcast(t(s, d, "nation").select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), (col("n_name") === "NATION_1").as("is_target"))
      val regionCust = t(s, d, "customer")
        .join(broadcast(t(s, d, "nation").select(col("n_nationkey"), col("n_regionkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region").filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"))
      val o = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val rev = e8row((col("l_extendedprice").cast(dec) *
        (lit(1).cast("decimal(5,4)") - col("l_discount").cast("decimal(5,4)")))
        .cast("decimal(28,8)"))
      t(s, d, "lineitem")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(supNat), col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(regionCust, col("o_custkey") === col("c_custkey"), "left_semi")
        .groupBy(year(col("o_orderdate")).cast("bigint").as("o_year"))
        .agg(
          sum(when(col("is_target"), rev).otherwise(lit(0L))).cast("bigint").as("nation_rev_e8"),
          sum(rev).cast("bigint").as("total_rev_e8"))
        .selectExpr("o_year", "nation_rev_e8", "total_rev_e8",
          "((nation_rev_e8 div 10000) * 10000) div greatest(total_rev_e8 div 10000, 1) AS share_bp")
        .orderBy(asc("o_year"))
    }),

    // TPC-H Q15-style top supplier: revenue view over one quarter, then the
    // scalar-max subquery selecting the supplier(s) AT the max — the
    // aggregate-of-an-aggregate shape. The quarter filter pushes to the
    // scan; the per-supplier rollup is the only fact shuffle; the 1-row max
    // broadcasts back over the supplier-sized view (an equi-join, not a
    // nested loop).
    "q15_top_supplier" -> ((s, d) => {
      val rev = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
          col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1996-04-01 00:00:00")))
        .groupBy(col("l_suppkey"))
        .agg(sum(e8row((col("l_extendedprice").cast(dec) *
          (lit(1).cast("decimal(5,4)") - col("l_discount").cast("decimal(5,4)")))
          .cast("decimal(28,8)"))).cast("bigint").as("total_rev_e8"))
      val top = rev.agg(max(col("total_rev_e8")).as("max_rev_e8"))
      rev.join(broadcast(top), col("total_rev_e8") === col("max_rev_e8"))
        .join(broadcast(t(s, d, "supplier").select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_rev_e8"))
        .orderBy(asc("s_suppkey"))
    }),

    // TPC-H Q21-style waiting suppliers (this schema has no receipt/commit
    // dates, so "kept the order waiting" = shipped more than 60 days after
    // the order date): for FINISHED multi-supplier orders, suppliers who
    // were the ONLY late shipper — the EXISTS + NOT-EXISTS dual-correlation,
    // expressed as one per-(order,supplier) rollup plus per-order window
    // counts instead of two correlated re-scans of lineitem. One orderkey
    // shuffle feeds both the rollup and the window; supplier broadcasts.
    "q21_waiting_suppliers" -> ((s, d) => {
      val o = t(s, d, "orders").filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate"))
      val lateUs = 60L * 86400L * 1000000L
      val perPair = t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .withColumn("late",
          when(epochUs(col("l_shipdate")) - epochUs(col("o_orderdate")) > lateUs, 1L)
            .otherwise(0L))
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max(col("late")).as("late"))
      val perOrder = Window.partitionBy(col("l_orderkey"))
      perPair
        .withColumn("n_supp", count(lit(1)).over(perOrder))
        .withColumn("n_late", sum(col("late")).over(perOrder))
        .filter(col("late") === 1L && col("n_supp") > 1 && col("n_late") === 1L)
        .join(broadcast(t(s, d, "supplier").select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(desc("numwait"), asc("s_name"))
        .limit(20)
    }),

    // TPC-H Q22-style dormant high-balance accounts (every customer here has
    // SOME order, so "no orders" becomes "no orders since 2000-01-01"):
    // customers above the average POSITIVE balance with no recent orders,
    // rolled up per nation. The average is never divided — the filter is the
    // cross-multiplied integer comparison acctbal·n > sum, replayed exactly
    // in DuckDB — and the 1-row stats broadcast over customer; the recent
    // buyer set anti-joins on custkey.
    "q22_dormant_balances" -> ((s, d) => {
      val cust = t(s, d, "customer")
        .select(col("c_custkey"), col("c_nationkey"),
          e4(col("c_acctbal").cast(dec)).as("acctbal_e4"))
      val pos = cust.filter(col("acctbal_e4") > 0)
        .agg(count(lit(1)).as("n_pos"), sum(col("acctbal_e4")).cast("bigint").as("sum_pos_e4"))
      val recent = t(s, d, "orders")
        .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("2000-01-01 00:00:00")))
        .select(col("o_custkey"))
      cust.crossJoin(broadcast(pos))
        .filter(col("acctbal_e4") * col("n_pos") > col("sum_pos_e4"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey").cast("bigint").as("nationkey"))
        .agg(count(lit(1)).as("numcust"),
          sum(col("acctbal_e4")).cast("bigint").as("totacctbal_e4"))
        .orderBy(asc("nationkey"))
    }),

    "q5_nation_revenue" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val ord = t(s, d, "orders")
      val cust = t(s, d, "customer")
      val sup = t(s, d, "supplier")
      val nat = t(s, d, "nation")
      li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          sum(e8row((col("l_extendedprice").cast(dec) *
            (lit(1).cast("decimal(5,4)") - col("l_discount").cast("decimal(5,4)")))
            .cast("decimal(28,8)"))).cast("bigint").as("revenue_e8"),
          count(lit(1)).as("n_items"))
        .orderBy(asc("n_name"))
    }),

    // Window function: top-3 customers per nation by account balance.
    "w_top_customers_per_nation" -> ((s, d) => {
      val cust = t(s, d, "customer")
      val nat = t(s, d, "nation")
      val w = Window.partitionBy(col("n_name"))
        .orderBy(desc("c_acctbal"), asc("c_custkey"))
      cust.join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("n_name"), col("rk").cast("bigint").as("rk"),
          col("c_custkey"), col("c_name"), col("c_acctbal"))
        .orderBy(asc("n_name"), asc("rk"))
    }),

    // Sessionization: 30-minute inactivity gap splits a user's event stream
    // into sessions — lag + conditional cumsum, one shuffle on user_id.
    "events_sessionize" -> ((s, d) => {
      val ev = EventFinders.events(s, d)
      val byUser = Window.partitionBy(col("user_id")).orderBy(asc("event_id"))
      val gapUs = 30L * 60 * 1000000
      val withGap = ev
        .withColumn("ts_us", expr("ts div 1000"))
        .withColumn("prev_ts", lag(col("ts_us"), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev_ts").isNull || col("ts_us") - col("prev_ts") > gapUs, 1L)
            .otherwise(0L))
        .withColumn("sess_id", sum(col("new_sess")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      withGap.groupBy(col("user_id"), col("sess_id"))
        .agg(count(lit(1)).as("sess_events"))
        .groupBy(col("user_id"))
        .agg(
          max(col("sess_id")).cast("bigint").as("n_sessions"),
          sum(col("sess_events")).cast("bigint").as("n_events"),
          max(col("sess_events")).as("longest_session"))
        .orderBy(asc("user_id"))
    }),

    // Tumbling 1-hour window aggregate — the batch analogue of the
    // streaming windowed agg (integer epoch division keeps it exact).
    "events_hourly_rollup" -> ((s, d) => {
      val ev = EventFinders.events(s, d)
      val hourUs = 3600L * 1000000
      // `div` = exact integer division (double `/` could round x.9999→x+1)
      ev.withColumn("window_start_us",
          expr(s"(ts div 1000) div ${hourUs}L") * hourUs)
        .groupBy(col("window_start_us"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(e4(col("value").cast(dec))).cast("bigint").as("sum_value_e4"))
        .orderBy(asc("window_start_us"), asc("event_type"))
    }),

    // Latest-state snapshot: one row per user = their most recent event —
    // the materialized "current state" view every event-sourced system
    // derives. TakeOrdered-per-key via row_number over (user_id, ts desc,
    // event_id desc): one shuffle, rank-pruned by WindowGroupLimit.
    "events_latest_state" -> ((s, d) => {
      val ev = EventFinders.events(s, d)
        .withColumn("ts_us", expr("ts div 1000"))
      // rank on the µs projection, not raw nanos: the oracle's timestamp
      // comparison happens at µs precision, so both engines must break
      // sub-µs ties the same way (event_id desc)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(desc("ts_us"), desc("event_id"))
      ev.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .selectExpr("user_id", "event_id AS last_event_id",
          "event_type AS last_type", "ts_us AS last_ts_us")
        .orderBy(asc("user_id"))
    }),

    // Trailing 7-day activity: per-day totals then a RANGE frame over the
    // integer day index — the two-level shape (pre-aggregate to one row
    // per day, THEN the sliding window) keeps the window input tiny; a
    // row-level 7-day frame would sort the whole event log inside every
    // frame at corpus scale.
    "events_trailing_7d" -> ((s, d) => {
      val dayUs = 86400L * 1000000
      val daily = EventFinders.events(s, d)
        .selectExpr(s"(ts div 1000) div ${dayUs}L AS day",
          "user_id", "value")
        .groupBy(col("day"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          sum(e4(col("value").cast(dec))).cast("bigint").as("sum_value_e4"))
      val trailing = Window.orderBy(col("day")).rangeBetween(-6, 0)
      daily
        .withColumn("n_events_7d", sum(col("n_events")).over(trailing))
        .withColumn("sum_value_e4_7d", sum(col("sum_value_e4")).over(trailing))
        .orderBy(asc("day"))
    }),

    // Cohort retention: users grouped by first-activity day, distinct
    // actives at each day offset — the product-analytics staple. One
    // user_id shuffle (window min computes the cohort inline; no
    // aggregate-and-join-back), then the (cohort, offset) rollup.
    "events_cohort_retention" -> ((s, d) => {
      val dayUs = 86400L * 1000000
      val ev = EventFinders.events(s, d)
        .selectExpr("user_id", s"(ts div 1000) div ${dayUs}L AS day")
      ev.withColumn("cohort_day",
          min(col("day")).over(Window.partitionBy(col("user_id"))))
        .selectExpr("cohort_day", "day - cohort_day AS offset_days", "user_id")
        .filter(col("offset_days") <= 7)
        .groupBy(col("cohort_day"), col("offset_days"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(asc("cohort_day"), asc("offset_days"))
    }),

    // Join + rollup on orders: segment x status matrix. customer scales
    // with SF (fact-adjacent), so no broadcast hint — size estimation/AQE
    // broadcasts at small SFs and shuffles at 100 TB.
    "orders_segment_status" -> ((s, d) => {
      val ord = t(s, d, "orders")
      val cust = t(s, d, "customer")
      ord.join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          sum(e4(col("o_totalprice").cast(dec))).cast("bigint").as("sum_total_e4"))
        .orderBy(asc("c_mktsegment"), asc("o_orderstatus"))
    }),

    // Anti-join: customers with no FINISHED orders (set difference at
    // scale — broadcast the distinct keys of the smaller side).
    "customers_without_orders" -> ((s, d) => {
      val ord = t(s, d, "orders").filter(col("o_orderstatus") === "F")
      val cust = t(s, d, "customer")
      cust.join(ord.select(col("o_custkey")).distinct(),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(asc("c_custkey"))
    }),

    // Semi-join + existence: parts that ship in any lineitem with qty > 45.
    "parts_high_qty" -> ((s, d) => {
      val li = t(s, d, "lineitem").filter(col("l_quantity") > 45.0)
      val part = t(s, d, "part")
      part.join(li.select(col("l_partkey")).distinct(),
          col("p_partkey") === col("l_partkey"), "left_semi")
        .select(col("p_partkey"), col("p_brand"), col("p_type"))
        .orderBy(asc("p_partkey"))
    })
  )

  // Per-row scaled-BIGINT renderings mirroring e4/e8row exactly: shift the
  // decimal to an integral value, cast BIGINT per row, sum, cast the sum.
  private def e4Sql(inner: String) =
    s"CAST(CAST($inner AS DECIMAL(18,4)) * CAST(10000 AS DECIMAL(5,0)) AS BIGINT)"
  private val revenueE8Sql =
    "CAST(sum(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * " +
      "(CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4))) AS DECIMAL(28,8)) * " +
      "CAST(100000000 AS DECIMAL(9,0)) AS BIGINT)) AS BIGINT)"

  def oracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      ("SELECT l_returnflag, l_linestatus, " +
        s"CAST(sum(${e4Sql("l_quantity")}) AS BIGINT) AS sum_qty_e4, " +
        s"CAST(sum(${e4Sql("l_extendedprice")}) AS BIGINT) AS sum_base_price_e4, " +
        s"$revenueE8Sql AS sum_disc_price_e8, " +
        "count(*) AS count_order FROM lineitem " +
        "WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' " +
        "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"),
    "q3_top_revenue" ->
      ("SELECT l_orderkey, epoch_us(o_orderdate) AS o_orderdate_us, " +
        s"$revenueE8Sql AS revenue_e8 " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "WHERE c_mktsegment = 'BUILDING' " +
        "GROUP BY l_orderkey, o_orderdate_us ORDER BY revenue_e8 DESC, l_orderkey LIMIT 10"),
    "q14_promo_share" -> {
      val rev = "CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * " +
        "(CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4))) AS DECIMAL(28,8)) * " +
        "CAST(100000000 AS DECIMAL(9,0)) AS BIGINT)"
      s"WITH agg AS (SELECT " +
        s"CAST(sum(CASE WHEN p_type = 'PROMO' THEN $rev ELSE 0 END) AS BIGINT) AS promo_rev_e8, " +
        s"CAST(sum($rev) AS BIGINT) AS total_rev_e8 " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey " +
        "WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01') " +
        "SELECT promo_rev_e8, total_rev_e8, " +
        "((promo_rev_e8 // 10000) * 10000) // greatest(total_rev_e8 // 10000, 1) AS promo_bp FROM agg"
    },
    "q18_large_orders" ->
      (s"WITH big AS (SELECT l_orderkey, CAST(sum(${e4Sql("l_quantity")}) AS BIGINT) AS sum_qty_e4 " +
        "FROM lineitem GROUP BY l_orderkey HAVING CAST(sum(" + e4Sql("l_quantity") + ") AS BIGINT) > 1500000) " +
        "SELECT o_orderkey, c_custkey, sum_qty_e4, " +
        "CAST(CAST(o_totalprice AS DECIMAL(18,4)) * CAST(10000 AS DECIMAL(5,0)) AS BIGINT) AS total_price_e4 " +
        "FROM big JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "ORDER BY sum_qty_e4 DESC, o_orderkey LIMIT 20"),
    "q19_disjunctive_revenue" ->
      (s"SELECT $revenueE8Sql AS revenue_e8, count(*) AS n_rows " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey " +
        "WHERE (p_brand = 'Brand#15' AND l_quantity BETWEEN 1 AND 15) " +
        "OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 25)"),
    "q4_priority_semijoin" ->
      ("SELECT o_orderpriority, count(*) AS order_count FROM orders o " +
        "WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01' " +
        "AND EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey " +
        "AND CAST(l.l_discount AS DECIMAL(5,4)) >= CAST('0.08' AS DECIMAL(5,4))) " +
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"),
    "q13_order_distribution" ->
      ("WITH co AS (SELECT c_custkey, count(o_custkey) AS c_count " +
        "FROM customer LEFT JOIN orders ON c_custkey = o_custkey GROUP BY c_custkey) " +
        "SELECT c_count, count(*) AS custdist FROM co " +
        "GROUP BY c_count ORDER BY custdist DESC, c_count DESC"),
    "q6_revenue_change" ->
      ("SELECT CAST(sum(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * " +
        "CAST(l_discount AS DECIMAL(5,4)) AS DECIMAL(28,8)) * " +
        "CAST(100000000 AS DECIMAL(9,0)) AS BIGINT)) AS BIGINT) AS revenue_e8, " +
        "count(*) AS n_rows FROM lineitem " +
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01' " +
        "AND CAST(l_discount AS DECIMAL(5,4)) >= CAST('0.05' AS DECIMAL(5,4)) " +
        "AND CAST(l_discount AS DECIMAL(5,4)) <= CAST('0.07' AS DECIMAL(5,4)) " +
        "AND l_quantity < 24"),
    "q7_volume_shipping" ->
      ("SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, " +
        "CAST(year(l_shipdate) AS BIGINT) AS l_year, " +
        s"$revenueE8Sql AS revenue_e8 " +
        "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey " +
        "JOIN nation n1 ON s_nationkey = n1.n_nationkey " +
        "JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation n2 ON c_nationkey = n2.n_nationkey " +
        "WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') " +
        "OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1') " +
        "GROUP BY supp_nation, cust_nation, l_year " +
        "ORDER BY supp_nation, cust_nation, l_year"),
    "q12_late_shipments" ->
      ("SELECT o_orderpriority, " +
        "CAST(sum(CAST((epoch_us(l_shipdate) - epoch_us(o_orderdate)) // 86400000000 > 60 AS INT)) AS BIGINT) AS late_count, " +
        "count(*) AS n_lines " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"),
    "q10_returned_items" ->
      ("SELECT c_custkey, c_name, n_name, " +
        s"${e4Sql("c_acctbal")} AS acctbal_e4, " +
        s"$revenueE8Sql AS revenue_e8 " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "WHERE l_returnflag = 'R' " +
        "GROUP BY c_custkey, c_name, n_name, acctbal_e4 " +
        "ORDER BY revenue_e8 DESC, c_custkey LIMIT 20"),
    "q17_small_qty_revenue" ->
      ("WITH l AS (SELECT l_partkey, " +
        s"${e4Sql("l_quantity")} AS q4, ${e4Sql("l_extendedprice")} AS p4 " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey WHERE p_type = 'SMALL'), " +
        "st AS (SELECT l_partkey, CAST(sum(q4) AS BIGINT) AS sum_q4, count(*) AS cnt " +
        "FROM l GROUP BY l_partkey) " +
        "SELECT CAST(sum(p4) AS BIGINT) AS revenue_e4, count(*) AS n_rows " +
        "FROM l JOIN st USING (l_partkey) WHERE 5 * q4 * cnt < sum_q4"),
    "q11_important_parts" ->
      ("WITH v AS (SELECT l_partkey, " +
        s"CAST(sum(${e4Sql("l_extendedprice")}) AS BIGINT) AS value_e4 " +
        "FROM lineitem GROUP BY l_partkey), " +
        "t AS (SELECT CAST(sum(value_e4) AS BIGINT) AS total_e4 FROM v) " +
        "SELECT l_partkey, value_e4 FROM v, t WHERE value_e4 * 2000 > total_e4 " +
        "ORDER BY value_e4 DESC, l_partkey"),
    "events_attribution" ->
      ("WITH ev AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events), " +
        "fp AS (SELECT user_id, ts_us, event_id FROM (SELECT user_id, ts_us, event_id, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS rk " +
        "FROM ev WHERE event_type = 'purchase') _f WHERE rk = 1), " +
        "fe AS (SELECT user_id, first_touch FROM (SELECT user_id, event_type AS first_touch, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS rk FROM ev) _e WHERE rk = 1), " +
        "le AS (SELECT user_id, last_touch FROM (SELECT e.user_id, e.event_type AS last_touch, " +
        "row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts_us DESC, e.event_id DESC) AS rk " +
        "FROM ev e JOIN fp ON e.user_id = fp.user_id " +
        "AND (e.ts_us < fp.ts_us OR (e.ts_us = fp.ts_us AND e.event_id < fp.event_id))) _l WHERE rk = 1) " +
        "SELECT first_touch, coalesce(last_touch, 'none') AS last_touch, count(*) AS n_users " +
        "FROM fp JOIN fe USING (user_id) LEFT JOIN le USING (user_id) " +
        "GROUP BY first_touch, coalesce(last_touch, 'none') " +
        "ORDER BY first_touch, last_touch"),
    "q9_product_profit" ->
      ("SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year, " +
        "CAST(sum(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * " +
        "(CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4))) AS DECIMAL(28,8)) * " +
        "CAST(100000000 AS DECIMAL(9,0)) AS BIGINT) " +
        "- CAST(CAST(p_retailprice AS DECIMAL(18,4)) * CAST(10000 AS DECIMAL(5,0)) AS BIGINT) " +
        "* CAST(l_quantity AS BIGINT) * 6000) AS BIGINT) AS profit_e8 " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey " +
        "JOIN supplier ON l_suppkey = s_suppkey " +
        "JOIN nation ON s_nationkey = n_nationkey " +
        "JOIN orders ON l_orderkey = o_orderkey " +
        "WHERE p_name LIKE '%red%' " +
        "GROUP BY n_name, o_year ORDER BY n_name, o_year DESC"),
    "q20_excess_suppliers" ->
      ("WITH qual AS (SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey " +
        "WHERE p_name LIKE 'small%' " +
        "AND l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '1999-01-01' " +
        "GROUP BY l_suppkey, l_partkey HAVING sum(CAST(l_quantity AS BIGINT)) > 60) " +
        "SELECT s_name, n_name FROM supplier " +
        "JOIN nation ON s_nationkey = n_nationkey " +
        "WHERE s_suppkey IN (SELECT l_suppkey FROM qual) ORDER BY s_name"),
    "customer_rfm_segments" ->
      ("WITH base AS (SELECT o_custkey, max(epoch_us(o_orderdate)) AS last_us, " +
        "count(*) AS frequency, " +
        s"CAST(sum(${e4Sql("o_totalprice")}) AS BIGINT) AS monetary_e4 " +
        "FROM orders GROUP BY o_custkey), " +
        "scored AS (SELECT monetary_e4, " +
        "ntile(4) OVER (ORDER BY last_us DESC, o_custkey) AS r_q, " +
        "ntile(4) OVER (ORDER BY frequency DESC, o_custkey) AS f_q, " +
        "ntile(4) OVER (ORDER BY monetary_e4 DESC, o_custkey) AS m_q FROM base) " +
        "SELECT r_q, f_q, m_q, count(*) AS n_customers, " +
        "CAST(sum(monetary_e4) AS BIGINT) AS segment_monetary_e4 " +
        "FROM scored GROUP BY r_q, f_q, m_q ORDER BY r_q, f_q, m_q"),
    "q16_supplier_cnt" ->
      ("WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey, p_brand, p_type, p_size " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey " +
        "WHERE p_brand <> 'Brand#15' AND p_type <> 'MEDIUM' " +
        "AND p_size IN (1, 4, 7, 10, 14, 23, 25, 45)) " +
        "SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt " +
        "FROM ps WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) " +
        "GROUP BY p_brand, p_type, p_size " +
        "ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"),
    "q8_market_share" -> {
      val rev = "CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * " +
        "(CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4))) AS DECIMAL(28,8)) * " +
        "CAST(100000000 AS DECIMAL(9,0)) AS BIGINT)"
      "WITH agg AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, " +
        s"CAST(sum(CASE WHEN n1.n_name = 'NATION_1' THEN $rev ELSE 0 END) AS BIGINT) AS nation_rev_e8, " +
        s"CAST(sum($rev) AS BIGINT) AS total_rev_e8 " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY' " +
        "JOIN supplier ON l_suppkey = s_suppkey " +
        "JOIN nation n1 ON s_nationkey = n1.n_nationkey " +
        "JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation n2 ON c_nationkey = n2.n_nationkey " +
        "JOIN region ON n2.n_regionkey = r_regionkey " +
        "WHERE r_name = 'ASIA' GROUP BY o_year) " +
        "SELECT o_year, nation_rev_e8, total_rev_e8, " +
        "((nation_rev_e8 // 10000) * 10000) // greatest(total_rev_e8 // 10000, 1) AS share_bp " +
        "FROM agg ORDER BY o_year"
    },
    "q15_top_supplier" ->
      (s"WITH rev AS (SELECT l_suppkey, $revenueE8Sql AS total_rev_e8 " +
        "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' " +
        "AND l_shipdate < TIMESTAMP '1996-04-01' GROUP BY l_suppkey) " +
        "SELECT s_suppkey, s_name, total_rev_e8 FROM rev " +
        "JOIN supplier ON l_suppkey = s_suppkey " +
        "WHERE total_rev_e8 = (SELECT max(total_rev_e8) FROM rev) ORDER BY s_suppkey"),
    "q21_waiting_suppliers" ->
      ("WITH ls AS (SELECT l_orderkey, l_suppkey, " +
        "max(CASE WHEN epoch_us(l_shipdate) - epoch_us(o_orderdate) > 5184000000000 THEN 1 ELSE 0 END) AS late " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "WHERE o_orderstatus = 'F' GROUP BY l_orderkey, l_suppkey), " +
        "per AS (SELECT l_suppkey, late, " +
        "count(*) OVER (PARTITION BY l_orderkey) AS n_supp, " +
        "CAST(sum(late) OVER (PARTITION BY l_orderkey) AS BIGINT) AS n_late FROM ls) " +
        "SELECT s_name, count(*) AS numwait FROM per " +
        "JOIN supplier ON l_suppkey = s_suppkey " +
        "WHERE late = 1 AND n_supp > 1 AND n_late = 1 " +
        "GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20"),
    "q22_dormant_balances" ->
      (s"WITH c AS (SELECT c_custkey, c_nationkey, ${e4Sql("c_acctbal")} AS acctbal_e4 FROM customer), " +
        "pos AS (SELECT count(*) AS n_pos, CAST(sum(acctbal_e4) AS BIGINT) AS sum_pos_e4 " +
        "FROM c WHERE acctbal_e4 > 0) " +
        "SELECT CAST(c_nationkey AS BIGINT) AS nationkey, count(*) AS numcust, " +
        "CAST(sum(acctbal_e4) AS BIGINT) AS totacctbal_e4 " +
        "FROM c, pos WHERE acctbal_e4 * n_pos > sum_pos_e4 " +
        "AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01') " +
        "GROUP BY nationkey ORDER BY nationkey"),
    "q5_nation_revenue" ->
      (s"SELECT n_name, $revenueE8Sql AS revenue_e8, count(*) AS n_items " +
        "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey " +
        "JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey " +
        "JOIN nation ON s_nationkey = n_nationkey " +
        "GROUP BY n_name ORDER BY n_name"),
    "w_top_customers_per_nation" ->
      ("SELECT n_name, rk, c_custkey, c_name, c_acctbal FROM (" +
        "SELECT n_name, c_custkey, c_name, c_acctbal, " +
        "row_number() OVER (PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey) AS rk " +
        "FROM customer JOIN nation ON c_nationkey = n_nationkey) " +
        "WHERE rk <= 3 ORDER BY n_name, rk"),
    "events_sessionize" ->
      ("WITH g AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, " +
        "lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_ts FROM events), " +
        "m AS (SELECT user_id, event_id, " +
        "CASE WHEN prev_ts IS NULL OR ts_us - prev_ts > 1800000000 THEN 1 ELSE 0 END AS new_sess FROM g), " +
        "sess AS (SELECT user_id, event_id, sum(new_sess) OVER (PARTITION BY user_id ORDER BY event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id FROM m), " +
        "per AS (SELECT user_id, sess_id, count(*) AS sess_events FROM sess GROUP BY user_id, sess_id) " +
        "SELECT user_id, CAST(max(sess_id) AS BIGINT) AS n_sessions, " +
        "CAST(sum(sess_events) AS BIGINT) AS n_events, " +
        "max(sess_events) AS longest_session FROM per GROUP BY user_id ORDER BY user_id"),
    "events_hourly_rollup" ->
      ("SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS window_start_us, event_type, " +
        s"count(*) AS n, CAST(sum(${e4Sql("value")}) AS BIGINT) AS sum_value_e4 " +
        "FROM events GROUP BY window_start_us, event_type ORDER BY window_start_us, event_type"),
    "events_latest_state" ->
      ("WITH r AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) AS rk " +
        "FROM events) " +
        "SELECT user_id, event_id AS last_event_id, event_type AS last_type, " +
        "ts_us AS last_ts_us FROM r WHERE rk = 1 ORDER BY user_id"),
    "events_trailing_7d" ->
      ("WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS n_events, " +
        "count(DISTINCT user_id) AS n_users, " +
        s"CAST(sum(${e4Sql("value")}) AS BIGINT) AS sum_value_e4 FROM events GROUP BY day) " +
        "SELECT day, n_events, n_users, sum_value_e4, " +
        "CAST(sum(n_events) OVER w AS BIGINT) AS n_events_7d, " +
        "CAST(sum(sum_value_e4) OVER w AS BIGINT) AS sum_value_e4_7d " +
        "FROM daily WINDOW w AS (ORDER BY day RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) " +
        "ORDER BY day"),
    "events_cohort_retention" ->
      ("WITH ev AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events), " +
        "w AS (SELECT user_id, day, min(day) OVER (PARTITION BY user_id) AS cohort_day FROM ev) " +
        "SELECT cohort_day, day - cohort_day AS offset_days, " +
        "count(DISTINCT user_id) AS n_users FROM w WHERE day - cohort_day <= 7 " +
        "GROUP BY cohort_day, offset_days ORDER BY cohort_day, offset_days"),
    "orders_segment_status" ->
      ("SELECT c_mktsegment, o_orderstatus, count(*) AS n_orders, " +
        s"CAST(sum(${e4Sql("o_totalprice")}) AS BIGINT) AS sum_total_e4 " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "GROUP BY c_mktsegment, o_orderstatus ORDER BY c_mktsegment, o_orderstatus"),
    "customers_without_orders" ->
      ("SELECT c_custkey, c_name, c_mktsegment FROM customer " +
        "WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F') " +
        "ORDER BY c_custkey"),
    "parts_high_qty" ->
      ("SELECT p_partkey, p_brand, p_type FROM part " +
        "WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 45.0) " +
        "ORDER BY p_partkey")
  )
}
