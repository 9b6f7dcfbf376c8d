package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-evolution operators: the jobs a curation platform runs BETWEEN
  * pipeline versions — snapshot-to-snapshot change audit, one-pass column
  * profiling, and graph centrality over the behavior log. Reference scope:
  * factstore keeps an immutable fact log (`factstore-spec` append/replay
  * semantics), so "what changed between two cuts of the log" and "what
  * does the data look like now" are first-class questions its users answer
  * downstream; these operators answer them engine-side.
  *
  * Scale notes (100 TB):
  * - `snapshot_diff` aggregates both snapshots from ONE scan (the older
  *   cutoff is a filter inside the same pass, not a second read), then
  *   diffs per-key states with a single co-partitioned full-outer join on
  *   the aggregate (post-shuffle size = |keys|, not |rows|). Output is the
  *   per-change-class summary — O(3) rows, the audit artifact.
  * - `profile_columns` unpivots k columns into (col, value) pairs BEFORE
  *   aggregating, so exact per-column distinct counts come from one
  *   shuffle of narrow pairs — NOT k independent count(distinct) over the
  *   wide row (Catalyst would Expand the scan k-fold). Values render as
  *   zero-padded fixed-width strings so lexicographic min/max equals
  *   numeric min/max and both engines hash identically. (At 100 TB the
  *   exact distinct swaps for the HLL kernel in Sketches — same unpivot
  *   shape, mergeable registers instead of a distinct shuffle.)
  * - `events_transition_rank` is the log→graph→iterate pattern: the only
  *   corpus-scale work is one user_id-shuffled lag + a groupBy that
  *   collapses 100 TB of events into a |types|² edge table; the damped
  *   random-walk iterations then run on the tiny aggregated graph
  *   (broadcast joins, integer-exact floor arithmetic both engines
  *   replay).
  */
object Evolution {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(spark, dir, name)

  /** Money as scale-4 BIGINT per row (see Analytics: no DECIMAL leaves a
    * query; scaled integers hash identically across engines). */
  private def e4(c: Column) =
    (c.cast("decimal(18,4)") * lit(10000).cast("decimal(5,0)")).cast("bigint")
  private def e4Sql(inner: String) =
    s"CAST(CAST($inner AS DECIMAL(18,4)) * CAST(10000 AS DECIMAL(5,0)) AS BIGINT)"

  /** Snapshot cutoffs for the CDC diff (orders span 1995-01..2001-08). */
  val CutOld = "1999-01-01 00:00:00"
  val CutNew = "2000-01-01 00:00:00"

  /** Damped-walk fixed point scale and iteration count, pinned. */
  val RankScale = 1000000000000L // 1e12
  val RankIters = 4

  /** Columns profiled by `profile_columns`: (output name, Spark rendering,
    * DuckDB rendering). Renderings are non-negative integers (or short
    * uppercase flags) lpad'ed to 20, so string order == numeric order. */
  private val profileCols: Seq[(String, String, String)] = Seq(
    ("l_orderkey", "CAST(l_orderkey AS STRING)", "CAST(l_orderkey AS VARCHAR)"),
    ("l_partkey", "CAST(l_partkey AS STRING)", "CAST(l_partkey AS VARCHAR)"),
    ("l_suppkey", "CAST(l_suppkey AS STRING)", "CAST(l_suppkey AS VARCHAR)"),
    ("l_linenumber", "CAST(l_linenumber AS STRING)", "CAST(l_linenumber AS VARCHAR)"),
    ("l_quantity_e4", s"CAST(${e4Sql("l_quantity")} AS STRING)",
      s"CAST(${e4Sql("l_quantity")} AS VARCHAR)"),
    ("l_extendedprice_e4", s"CAST(${e4Sql("l_extendedprice")} AS STRING)",
      s"CAST(${e4Sql("l_extendedprice")} AS VARCHAR)"),
    ("l_returnflag", "l_returnflag", "l_returnflag"),
    ("l_linestatus", "l_linestatus", "l_linestatus"),
    ("l_shipdate_us", "CAST(unix_micros(CAST(l_shipdate AS TIMESTAMP)) AS STRING)",
      "CAST(epoch_us(l_shipdate) AS VARCHAR)"))

  /** The numeric seven of [[profileCols]] as native BIGINT renderings —
    * the engine aggregates these un-padded (HashAggregate-friendly long
    * buffers) and pads only the final one-row-per-column min/max; the
    * padding is order-isomorphic on non-negative integers (the invariant
    * [[profileCols]] documents), so min/max/distinct are unchanged. */
  private val profileColsNum: Seq[(String, String)] = Seq(
    ("l_orderkey", "l_orderkey"),
    ("l_partkey", "l_partkey"),
    ("l_suppkey", "l_suppkey"),
    ("l_linenumber", "CAST(l_linenumber AS BIGINT)"),
    ("l_quantity_e4", e4Sql("l_quantity")),
    ("l_extendedprice_e4", e4Sql("l_extendedprice")),
    ("l_shipdate_us", "unix_micros(CAST(l_shipdate AS TIMESTAMP))"))

  /** The two flag columns keep the padded-string carrier end-to-end. */
  private val profileColsStr: Seq[(String, String)] = Seq(
    ("l_returnflag", "l_returnflag"),
    ("l_linestatus", "l_linestatus"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Snapshot CDC: per-customer order state (count, spend) at two log
    // cutoffs, full-outer diffed, summarized per change class. The log is
    // append-only, so 'removed' is structurally impossible — the operator
    // still models it (full outer + null handling both ways) because a
    // compacted/vacuumed store can drop keys.
    "snapshot_diff" -> ((s, d) => {
      val o = t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderdate"), col("o_totalprice"))
        .filter(col("o_orderdate") < lit(java.sql.Timestamp.valueOf(CutNew)))
      // one scan: the older snapshot is a conditional aggregate of the newer
      val st = o.groupBy(col("o_custkey")).agg(
        sum(when(col("o_orderdate") < lit(java.sql.Timestamp.valueOf(CutOld)), 1L)
          .otherwise(0L)).as("n_old"),
        sum(when(col("o_orderdate") < lit(java.sql.Timestamp.valueOf(CutOld)),
          e4(col("o_totalprice"))).otherwise(0L)).as("spend_old_e4"),
        count(lit(1)).as("n_new"),
        sum(e4(col("o_totalprice"))).as("spend_new_e4"))
      st.select(
          when(col("n_old") === 0L, lit("added"))
            .when(col("n_new") =!= col("n_old"), lit("changed"))
            .otherwise(lit("unchanged")).as("change_type"),
          col("n_new"), col("n_old"), col("spend_new_e4"), col("spend_old_e4"))
        .groupBy(col("change_type"))
        .agg(
          count(lit(1)).as("n_customers"),
          sum(col("n_new") - col("n_old")).as("orders_delta"),
          sum(col("spend_new_e4") - col("spend_old_e4")).as("spend_delta_e4"))
        .orderBy(asc("change_type"))
    }),

    // MERGE/upsert maintenance: apply a deterministic delta (repriced
    // updates for keys ≡3 mod 10, synthetic inserts for keys ≡7 mod 100)
    // to the orders snapshot with latest-wins semantics, and report the
    // merge audit (inserted/updated/unchanged + the merged checksum). ONE
    // key equi-join of snapshot ⨝ delta — the canonical co-located merge
    // that a bucketed layout runs exchange-free; the delta derivation is a
    // pure projection both engines compute identically.
    "snapshot_upsert" -> ((s, d) => {
      val base = t(s, d, "orders")
        .select(col("o_orderkey").as("k"), e4(col("o_totalprice")).as("price_e4"))
      val delta = t(s, d, "orders")
        .selectExpr("o_orderkey", s"${e4Sql("o_totalprice")} AS p")
        .selectExpr(
          // updates: +1.0000 on the price; inserts: fresh negative keys
          "CASE WHEN o_orderkey % 100 = 7 THEN -o_orderkey ELSE o_orderkey END AS k",
          "CASE WHEN o_orderkey % 100 = 7 THEN p ELSE p + 10000 END AS new_price_e4")
        .filter("o_orderkey % 10 = 3 OR o_orderkey % 100 = 7")
      base.join(delta, Seq("k"), "full_outer")
        .selectExpr(
          "CASE WHEN price_e4 IS NULL THEN 'insert' " +
            "WHEN new_price_e4 IS NULL THEN 'unchanged' ELSE 'update' END AS op",
          "coalesce(new_price_e4, price_e4) AS merged_e4")
        .groupBy(col("op"))
        .agg(count(lit(1)).as("n_rows"), sum(col("merged_e4")).as("sum_merged_e4"))
        .orderBy(asc("op"))
    }),

    // One-pass exact column profile of the widest fact table: row count,
    // null count, exact distinct count, min/max per column — the
    // data-quality dashboard every ingest run publishes.
    "profile_columns" -> ((s, d) => {
      // Two-level distinct census with NATIVE carriers: min(string)/max
      // (string) aggregation buffers are immutable in Spark, so the
      // previous single-pass string rendering fell back to SortAggregate —
      // three full sorts of the 9×|lineitem| padded-string relation. The
      // numeric seven now aggregate as BIGINT (HashAggregate end-to-end,
      // map-side combined on the (col, value) grid) and render to the
      // padded strings only after collapsing to one row per column; the
      // two flag columns keep the string carrier, whose level-2 input is
      // catalog-sized. Values and the oracle are unchanged — lpad on
      // non-negative integers is order-isomorphic (see profileColsNum).
      def twoLevel(df: DataFrame): DataFrame =
        df.groupBy(col("col_name"), col("v"))
          .agg(count(lit(1)).as("cnt"))
          .groupBy(col("col_name"))
          .agg(
            sum(col("cnt")).as("n_rows"),
            (sum(col("cnt")) -
              sum(when(col("v").isNotNull, col("cnt")).otherwise(0L))).as("n_nulls"),
            count(col("v")).as("n_distinct"),
            min(col("v")).as("min_v0"),
            max(col("v")).as("max_v0"))
      val stackN = profileColsNum.map { case (n, e) => s"'$n', $e" }.mkString(", ")
      val num = twoLevel(t(s, d, "lineitem")
          .selectExpr(s"stack(${profileColsNum.size}, $stackN) AS (col_name, v)"))
        .selectExpr("col_name", "n_rows", "n_nulls", "n_distinct",
          "lpad(CAST(min_v0 AS STRING), 20, '0') AS min_v",
          "lpad(CAST(max_v0 AS STRING), 20, '0') AS max_v")
      val stackS = profileColsStr
        .map { case (n, e) => s"'$n', lpad($e, 20, '0')" }.mkString(", ")
      val str = twoLevel(t(s, d, "lineitem")
          .selectExpr(s"stack(${profileColsStr.size}, $stackS) AS (col_name, v)"))
        .selectExpr("col_name", "n_rows", "n_nulls", "n_distinct",
          "min_v0 AS min_v", "max_v0 AS max_v")
      num.union(str).orderBy(asc("col_name"))
    }),

    // Damped random-walk centrality over the event-type transition graph:
    // which states of the behavior log attract the walk. Log→graph is the
    // scale step (one user_id shuffle); the RankIters power iterations run
    // DRIVER-SIDE on the collected |types|² edge grid (≤ catalog² rows,
    // corpus-INDEPENDENT — the MMR/PRF bounded-collect discipline): the
    // DataFrame rendering re-planned 4 unrolled join+agg rounds over a
    // ≤5-row relation, ~70 exchanges of pure scheduling overhead with zero
    // distribution benefit. Floor-division arithmetic identical to the
    // oracle's (all operands positive; multiplyExact keeps the fail-loud
    // overflow contract both engines share).
    "events_transition_rank" -> ((s, d) => {
      val ev = EventFinders.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"))
      val byUser = Window.partitionBy(col("user_id")).orderBy(asc("event_id"))
      // ONE corpus-scale pass: user-sessionized lag → (src, dst, w) census
      val edges = ev
        .withColumn("src", lag(col("event_type"), 1).over(byUser))
        .filter(col("src").isNotNull)
        .groupBy(col("src"), col("event_type").as("dst"))
        .agg(count(lit(1)).as("w"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      // nodes come from the log, not the edge endpoints: an event type seen
      // only in single-event histories has no edges but is still a state
      val nodes = ev.select(col("event_type")).distinct()
        .collect().map(_.getString(0)).sorted
      val outw = edges.groupBy(_._1).map { case (src, es) => src -> es.map(_._3).sum }
      val n = nodes.length.toLong
      val base = (15L * RankScale) / (100L * n)
      var pr = nodes.map(_ -> RankScale / n).toMap
      for (_ <- 1 to RankIters) {
        val inflow = edges.groupBy(_._2).map { case (dst, es) =>
          dst -> es.map { case (src, _, w) =>
            Math.multiplyExact(pr(src), w) / outw(src) }.sum
        }
        pr = nodes.map(nd =>
          nd -> (base + Math.multiplyExact(85L, inflow.getOrElse(nd, 0L)) / 100L)).toMap
      }
      val out = nodes.map(nd => (nd, pr(nd))).sortBy { case (t, r) => (-r, t) }
      s.createDataFrame(out.toIndexedSeq).toDF("event_type", "rank_e12")
    })
  )

  def oracles: Map[String, String] = Map(
    "snapshot_diff" ->
      (s"WITH st AS (SELECT o_custkey, " +
        "CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '" + CutOld + "' THEN 1 ELSE 0 END) AS BIGINT) AS n_old, " +
        s"CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '$CutOld' THEN ${e4Sql("o_totalprice")} ELSE 0 END) AS BIGINT) AS spend_old_e4, " +
        "count(*) AS n_new, " +
        s"CAST(sum(${e4Sql("o_totalprice")}) AS BIGINT) AS spend_new_e4 " +
        s"FROM orders WHERE o_orderdate < TIMESTAMP '$CutNew' GROUP BY o_custkey), " +
        "cls AS (SELECT CASE WHEN n_old = 0 THEN 'added' " +
        "WHEN n_new != n_old THEN 'changed' ELSE 'unchanged' END AS change_type, " +
        "n_new, n_old, spend_new_e4, spend_old_e4 FROM st) " +
        "SELECT change_type, count(*) AS n_customers, " +
        "CAST(sum(n_new - n_old) AS BIGINT) AS orders_delta, " +
        "CAST(sum(spend_new_e4 - spend_old_e4) AS BIGINT) AS spend_delta_e4 " +
        "FROM cls GROUP BY change_type ORDER BY change_type"),

    "snapshot_upsert" ->
      (s"WITH base AS (SELECT o_orderkey AS k, ${e4Sql("o_totalprice")} AS price_e4 FROM orders), " +
        s"raw AS (SELECT o_orderkey, ${e4Sql("o_totalprice")} AS p FROM orders " +
        "WHERE o_orderkey % 10 = 3 OR o_orderkey % 100 = 7), " +
        "delta AS (SELECT CASE WHEN o_orderkey % 100 = 7 THEN -o_orderkey ELSE o_orderkey END AS k, " +
        "CASE WHEN o_orderkey % 100 = 7 THEN p ELSE p + 10000 END AS new_price_e4 FROM raw), " +
        "m AS (SELECT CASE WHEN b.price_e4 IS NULL THEN 'insert' " +
        "WHEN d.new_price_e4 IS NULL THEN 'unchanged' ELSE 'update' END AS op, " +
        "COALESCE(d.new_price_e4, b.price_e4) AS merged_e4 " +
        "FROM base b FULL OUTER JOIN delta d ON b.k = d.k) " +
        "SELECT op, count(*) AS n_rows, CAST(sum(merged_e4) AS BIGINT) AS sum_merged_e4 " +
        "FROM m GROUP BY op ORDER BY op"),

    "profile_columns" -> {
      val union = profileCols
        .map { case (n, _, du) => s"SELECT '$n' AS col_name, lpad($du, 20, '0') AS v FROM lineitem" }
        .mkString(" UNION ALL ")
      s"WITH u AS ($union) " +
        "SELECT col_name, count(*) AS n_rows, " +
        "CAST(count(*) - count(v) AS BIGINT) AS n_nulls, " +
        "CAST(count(DISTINCT v) AS BIGINT) AS n_distinct, " +
        "min(v) AS min_v, max(v) AS max_v " +
        "FROM u GROUP BY col_name ORDER BY col_name"
    },

    "events_transition_rank" -> {
      val iters = (1 to RankIters).map { k =>
        val prev = if (k == 1) "i0" else s"i${k - 1}"
        s"i$k AS (SELECT n.node, b.base + (85 * coalesce(s.inflow, 0)) // 100 AS pr " +
          "FROM nodes n CROSS JOIN b LEFT JOIN (" +
          "SELECT e.dst AS node, CAST(sum((p.pr * e.w) // o.outw) AS BIGINT) AS inflow " +
          s"FROM $prev p JOIN edges e ON e.src = p.node JOIN outw o ON o.src = e.src " +
          "GROUP BY e.dst) s ON s.node = n.node)"
      }.mkString(", ")
      "WITH seq AS (SELECT user_id, event_id, event_type, " +
        "lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS src FROM events), " +
        "edges AS (SELECT src, event_type AS dst, count(*) AS w FROM seq " +
        "WHERE src IS NOT NULL GROUP BY src, event_type), " +
        "outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS outw FROM edges GROUP BY src), " +
        "nodes AS (SELECT DISTINCT event_type AS node FROM events), " +
        "nn AS (SELECT count(*) AS c FROM nodes), " +
        s"b AS (SELECT (15 * ${RankScale}) // (100 * c) AS base, ${RankScale} // c AS pr0 FROM nn), " +
        "i0 AS (SELECT n.node, b.pr0 AS pr FROM nodes n CROSS JOIN b), " +
        iters + " " +
        s"SELECT node AS event_type, CAST(pr AS BIGINT) AS rank_e12 FROM i$RankIters " +
        "ORDER BY rank_e12 DESC, event_type"
    }
  )
}
