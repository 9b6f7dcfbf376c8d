package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Constraint-audit operators — the data-quality gate a 100 TB ingest runs
  * before anything downstream is allowed to read a snapshot. Reference
  * scope: factstore validates its own invariants at append time (typed
  * append errors, `AppendCondition.kt`); a relational engine extends the
  * same idea to whole-corpus audits: key uniqueness, referential
  * integrity, domain/range rules, and cross-table temporal consistency.
  *
  * Physical discipline, per operator:
  *
  *  - '''uniqueness''': one map-side-combined `groupBy(key)` per table,
  *    then a constant-width rollup of the per-key counts. Never sorts,
  *    never materializes duplicates.
  *  - '''referential integrity''': the fact side is aggregated to
  *    `(fk, cnt)` FIRST (map-side combine collapses repeats), so the
  *    existence join probes distinct keys — cardinality of the key space,
  *    not of the 100 TB fact table. The dim side is a key-only projection.
  *  - '''value rules''': one scan, all rules as conditional sums in a
  *    single aggregate; the rule→row unpivot happens on the 1-row result.
  *  - '''temporal consistency''': the one fact⨝fact join (lineitem⨝orders
  *    on orderkey) — the canonical co-located join that a bucketed layout
  *    runs exchange-free at scale (BucketingSpec proves the zero-Exchange
  *    plan for exactly this key).
  *
  * Determinism contract (house rules): counts are BIGINT, shares are exact
  * basis points via integral `div`, date arithmetic is epoch-day integer
  * math, output order is total.
  */
object DataQuality {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(spark, dir, name)

  private val DayUs = 86400L * 1000000

  /** Per-key multiplicity rollup: one groupBy + constant-width aggregate. */
  private[operators] def uniq(df: DataFrame, table: String, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("cnt"))
      .agg(
        sum(col("cnt")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        sum(when(col("cnt") > 1, 1L).otherwise(0L)).as("n_dup_keys"),
        sum(when(col("cnt") > 1, col("cnt") - 1L).otherwise(0L)).as("n_excess_rows"),
        max(col("cnt")).as("max_multiplicity"))
      .select(lit(table).as("table_name"), col("n_rows"), col("n_keys"),
        col("n_dup_keys"), col("n_excess_rows"), col("max_multiplicity"))

  /** One FK edge: aggregate fact to (key, cnt), left-join the dim's key
    * projection, roll up orphan rows/keys. The join input is distinct fact
    * keys — bounded by key cardinality at any corpus size. */
  private[operators] def fkEdge(fact: DataFrame, fk: String, dim: DataFrame, pk: String,
                     edge: String): DataFrame = {
    val keyAgg = fact.groupBy(col(fk).cast("long").as("k"))
      .agg(count(lit(1)).as("cnt"))
    val dimKeys = dim.select(col(pk).cast("long").as("pk")).distinct()
    keyAgg.join(dimKeys, col("k") === col("pk"), "left")
      .agg(
        sum(col("cnt")).as("n_rows"),
        sum(when(col("pk").isNull, col("cnt")).otherwise(0L)).as("n_orphan_rows"),
        sum(when(col("pk").isNull, 1L).otherwise(0L)).as("n_orphan_keys"))
      .select(lit(edge).as("fk_edge"), col("n_rows"), col("n_orphan_rows"),
        col("n_orphan_keys"),
        expr("(n_orphan_rows * 10000) div n_rows").as("orphan_bp"))
  }

  /** Benford first-digit expectations, log10(1+1/d) in exact ppm — pinned
    * integer constants so both engines compare against the same table.
    * `private[graft]`: the streaming Benford face shares the table. */
  private[graft] val BenfordPpm: Seq[(Int, Long)] = Seq(
    1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L, 5 -> 79181L,
    6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L)

  /** First-digit extraction from an events row — shared verbatim by the
    * batch `events_value_benford` twin and the streaming `benfordCensus`
    * face (one definition is the stream/batch parity guarantee). Floor to
    * cents first (Spark's double→BIGINT cast truncates, DuckDB's rounds),
    * then the leading digit of the decimal digit string. */
  private[graft] def benfordEventSelect: Seq[String] = Seq(
    "event_type",
    "CAST(substring(CAST(CAST(floor(value * 100) AS BIGINT) AS STRING), 1, 1) AS BIGINT) AS digit")

  /** exp_ppm lookup by digit, rendered once for every consumer. */
  private[graft] val benfordExpMap: String =
    "map(" + BenfordPpm.map { case (k, v) => s"$k, ${v}L" }.mkString(", ") + ")"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Tukey-fence outlier census of event value (whole units, explicit
    // floor BEFORE the BIGINT cast — DuckDB's double→BIGINT rounds, the
    // benford lesson) per event type: exact type-1 quartiles from a
    // bounded-domain value census (values span a few hundred integer
    // units — the window runs on that grid, never on raw rows), fences
    // at 1.5·IQR carried as DOUBLED integers so the half never rounds,
    // outlier counts re-read from the same census. The declared quartile
    // semantics (min v with 4·cum ≥ k·n) are engine-independent by
    // construction — no percentile_cont/quantile builtin drift. The
    // value distribution is heavy-tailed, so the high fence actually
    // fires — the screen a pipeline runs before trusting a value column.
    "dq_iqr_outliers" -> ((s, d) => {
      val census = t(s, d, "events")
        .selectExpr("event_type AS grp", "CAST(floor(value) AS BIGINT) AS v")
        .groupBy(col("grp"), col("v")).agg(count(lit(1)).as("n"))
        .transform(graft.operators.CacheScope.persist)
      val cum = census.withColumn("cum", sum(col("n")).over(
        Window.partitionBy(col("grp")).orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val tot = census.groupBy(col("grp")).agg(sum(col("n")).as("tot"))
      val j = cum.join(tot, Seq("grp"))
      val q1 = j.filter(col("cum") * 4 >= col("tot"))
        .groupBy(col("grp")).agg(min(col("v")).as("q1"))
      val q3 = j.filter(col("cum") * 4 >= col("tot") * 3)
        .groupBy(col("grp")).agg(min(col("v")).as("q3"))
      census.join(q1, Seq("grp")).join(q3, Seq("grp"))
        .selectExpr("grp", "q1", "q3", "n",
          "CASE WHEN 2 * v < 2 * q1 - 3 * (q3 - q1) THEN n ELSE 0 END AS lo",
          "CASE WHEN 2 * v > 2 * q3 + 3 * (q3 - q1) THEN n ELSE 0 END AS hi")
        .groupBy(col("grp"), col("q1"), col("q3"))
        .agg(sum(col("n")).as("nn"), sum(col("lo")).as("nlo"),
          sum(col("hi")).as("nhi"))
        .selectExpr("grp AS event_type", "CAST(nn AS BIGINT) AS n",
          "q1", "q3", "q3 - q1 AS iqr",
          "CAST(nlo AS BIGINT) AS n_low", "CAST(nhi AS BIGINT) AS n_high")
        .orderBy(asc("event_type"))
    }),

    // Benford's-law audit of the order-value distribution: the classic
    // fabricated-data screen (a synthetic or manipulated money column
    // deviates from log10(1+1/d) first-digit mass). Digit extraction is
    // integer-exact — floor to cents first (Spark CAST(double AS BIGINT)
    // truncates while DuckDB's rounds, so the floor is explicit), then
    // the leading digit of the digit string. One narrow scan, 9-row
    // output; the deviation column is observed−expected in exact ppm.
    "dq_benford_test" -> ((s, d) => {
      val digits = t(s, d, "orders")
        .selectExpr("CAST(substring(CAST(CAST(floor(o_totalprice * 100) AS BIGINT) AS STRING), 1, 1) AS BIGINT) AS digit")
        .filter(col("digit").between(1, 9))
        .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      val tot = digits.agg(sum(col("n")).as("total"))
      val expMap = "map(" + BenfordPpm.map { case (k, v) => s"$k, ${v}L" }.mkString(", ") + ")"
      digits.crossJoin(broadcast(tot))
        .selectExpr("digit", "n",
          "(n * 1000000) div total AS obs_ppm",
          s"element_at($expMap, CAST(digit AS INT)) AS exp_ppm")
        .selectExpr("digit", "n", "obs_ppm", "exp_ppm",
          "obs_ppm - exp_ppm AS dev_ppm")
        .orderBy(asc("digit"))
    }),

    // Benford audit of the event VALUE stream, per event type — the batch
    // twin of the streaming `benfordCensus` face (identical extraction via
    // benfordEventSelect; the face folds the same digits into 9 counters
    // per type). Per-type expectations make this the "which event family's
    // money column looks fabricated" census rather than one global test.
    // One narrow scan, map-side-combined groupBy to the 45-row
    // (type × digit) grid; per-type totals are a grid window.
    "events_value_benford" -> ((s, d) => {
      val digits = t(s, d, "events")
        .selectExpr(benfordEventSelect: _*)
        .filter(col("digit").between(1, 9))
        .groupBy(col("event_type"), col("digit"))
        .agg(count(lit(1)).as("n"))
      val byType = Window.partitionBy(col("event_type"))
      digits
        .withColumn("total", sum(col("n")).over(byType))
        .selectExpr("event_type", "digit", "n",
          "(n * 1000000) div total AS obs_ppm",
          s"element_at($benfordExpMap, CAST(digit AS INT)) AS exp_ppm")
        .selectExpr("event_type", "digit", "n", "obs_ppm", "exp_ppm",
          "obs_ppm - exp_ppm AS dev_ppm")
        .orderBy(asc("event_type"), asc("digit"))
    }),
    // Primary-key uniqueness audit across every table in the layout. Each
    // table is ONE map-side-combined shuffle on its key; the union rows are
    // 8 constant-width summaries.
    "dq_key_uniqueness" -> ((s, d) => {
      Seq(
        uniq(t(s, d, "customer"), "customer", Seq("c_custkey")),
        uniq(t(s, d, "documents"), "documents", Seq("doc_id")),
        uniq(t(s, d, "embeddings"), "embeddings", Seq("vec_id")),
        uniq(t(s, d, "events"), "events", Seq("event_id")),
        uniq(t(s, d, "lineitem"), "lineitem", Seq("l_orderkey", "l_linenumber")),
        uniq(t(s, d, "orders"), "orders", Seq("o_orderkey")),
        uniq(t(s, d, "part"), "part", Seq("p_partkey")),
        uniq(t(s, d, "supplier"), "supplier", Seq("s_suppkey"))
      ).reduce(_ union _).orderBy(asc("table_name"))
    }),

    // Referential-integrity audit over the schema's six FK edges. Fact
    // sides collapse to distinct keys before any join; dims are key-only
    // projections (and broadcastable when genuinely small).
    "dq_referential_integrity" -> ((s, d) => {
      val orders = t(s, d, "orders"); val li = t(s, d, "lineitem")
      Seq(
        fkEdge(t(s, d, "customer"), "c_nationkey", t(s, d, "nation"), "n_nationkey",
          "customer.c_nationkey->nation"),
        fkEdge(li, "l_orderkey", orders, "o_orderkey", "lineitem.l_orderkey->orders"),
        fkEdge(li, "l_partkey", t(s, d, "part"), "p_partkey", "lineitem.l_partkey->part"),
        fkEdge(li, "l_suppkey", t(s, d, "supplier"), "s_suppkey", "lineitem.l_suppkey->supplier"),
        fkEdge(t(s, d, "nation"), "n_regionkey", t(s, d, "region"), "r_regionkey",
          "nation.n_regionkey->region"),
        fkEdge(orders, "o_custkey", t(s, d, "customer"), "c_custkey", "orders.o_custkey->customer")
      ).reduce(_ union _).orderBy(asc("fk_edge"))
    }),

    // Domain/range rule audit over lineitem: spec bounds (expected clean)
    // plus distribution-tail warnings (expected non-zero), all in ONE scan
    // — every rule is a conditional sum in a single aggregate; the
    // rule→row unpivot runs on the 1-row result.
    "dq_value_rules" -> ((s, d) => {
      val agg = t(s, d, "lineitem").agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("l_quantity") < 1.0 || col("l_quantity") > 50.0, 1L).otherwise(0L)).as("v_qty_range"),
        sum(when(col("l_discount") < 0.0 || col("l_discount") > 0.10, 1L).otherwise(0L)).as("v_discount_range"),
        sum(when(col("l_tax") < 0.0 || col("l_tax") > 0.08, 1L).otherwise(0L)).as("v_tax_range"),
        sum(when(col("l_extendedprice") <= 0.0, 1L).otherwise(0L)).as("v_price_positive"),
        sum(when(!col("l_returnflag").isin("A", "N", "R"), 1L).otherwise(0L)).as("v_returnflag_domain"),
        sum(when(!col("l_linestatus").isin("O", "F"), 1L).otherwise(0L)).as("v_linestatus_domain"),
        sum(when(col("l_quantity") > 45.0, 1L).otherwise(0L)).as("v_qty_tail_gt45"),
        sum(when(col("l_discount") > 0.08, 1L).otherwise(0L)).as("v_discount_tail_gt8pct"))
      agg.selectExpr("n_rows", "stack(8, " +
          "'discount_range', v_discount_range, " +
          "'discount_tail_gt8pct', v_discount_tail_gt8pct, " +
          "'linestatus_domain', v_linestatus_domain, " +
          "'price_positive', v_price_positive, " +
          "'qty_range', v_qty_range, " +
          "'qty_tail_gt45', v_qty_tail_gt45, " +
          "'returnflag_domain', v_returnflag_domain, " +
          "'tax_range', v_tax_range) AS (rule, n_violations)")
        .selectExpr("rule", "n_rows", "n_violations",
          "(n_violations * 10000) div n_rows AS viol_bp")
        .orderBy(asc("rule"))
    }),

    // Distribution-drift audit between two eras of the order stream (the
    // "did the upstream distribution shift under us" gate a training
    // pipeline runs before mixing a new crawl into an old corpus). Two
    // bin families — categorical priority and order-value decimal-digit
    // magnitude — are censused per era in ONE scan (the 2× bin fan-out is
    // an in-row explode, so corpus-scale work is a single map-side-
    // combined groupBy to the family×bin×era grid); proportions and the
    // per-bin quadratic drift score are exact integer ppm arithmetic on
    // the grid, with per-family totals attached by a grid-sized window.
    // The digit-magnitude binning (length of the truncated integer part)
    // is engine-neutral exact where any log-based binning would not be.
    "dq_distribution_drift" -> ((s, d) => {
      // era boundary: 1998-01-01 UTC, as epoch micros — integer compare,
      // no timezone or date-type coupling
      val cutUs = 883612800000000L
      val binned = t(s, d, "orders")
        .selectExpr(
          s"CAST(unix_micros(CAST(o_orderdate AS TIMESTAMP)) < ${cutUs}L AS INT) AS era_a",
          "o_orderpriority",
          "length(CAST(CAST(floor(o_totalprice) AS BIGINT) AS STRING)) AS pd")
        .selectExpr("era_a",
          "explode(array(" +
            "struct('priority' AS family, o_orderpriority AS bin), " +
            "struct('price_digits' AS family, concat('digits_', pd) AS bin))) AS fb")
        .selectExpr("fb.family AS family", "fb.bin AS bin", "era_a")
      val grid = binned.groupBy(col("family"), col("bin"))
        .agg(sum(col("era_a")).cast("long").as("n_a"),
          sum(expr("1 - era_a")).cast("long").as("n_b"))
      val byFamily = org.apache.spark.sql.expressions.Window.partitionBy(col("family"))
      grid
        .withColumn("tot_a", sum(col("n_a")).over(byFamily))
        .withColumn("tot_b", sum(col("n_b")).over(byFamily))
        .selectExpr("family", "bin", "n_a", "n_b",
          // zero-guarded: on a corpus entirely on one side of the era
          // cutoff a family total is 0 — Spark's `div` would yield NULL
          // while DuckDB's `//` raises, so make the NULL explicit in BOTH
          // engines (see the mirrored CASE in the oracle)
          "CASE WHEN tot_a = 0 THEN NULL ELSE (n_a * 1000000) div tot_a END AS p_a_ppm",
          "CASE WHEN tot_b = 0 THEN NULL ELSE (n_b * 1000000) div tot_b END AS p_b_ppm")
        .selectExpr("family", "bin", "n_a", "n_b", "p_a_ppm", "p_b_ppm",
          "p_a_ppm - p_b_ppm AS delta_ppm",
          "(p_a_ppm - p_b_ppm) * (p_a_ppm - p_b_ppm) AS drift_ppm2")
        .orderBy(asc("family"), asc("bin"))
    }),

    // Categorical-independence audit: the chi-square contribution grid of
    // lang × source over the documents corpus — "is language mix the same
    // across sources, or does one crawl skew?" — the stratification check
    // run before trusting a per-source sample plan. Declared semantics:
    // chi-square on the PPM-PROPORTION grid (observed o_ppm vs expected
    // e_ppm = row·col/N², contribution (o−e)²/e in ppm), which keeps every
    // intermediate bounded (≤10¹²) at ANY corpus size — the raw-count
    // statistic's (O·N−R·C)² needs N⁴ width and dies past DECIMAL(38).
    // One map-side-combined groupBy to the langs×sources grid; the margin
    // windows and arithmetic are grid-sized. Wide margin products ride
    // DECIMAL(38,0) (burstiness discipline).
    "dq_chi2_independence" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
      t(s, d, "documents")
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n"))
        .withColumn("r_tot", sum(col("n")).over(w.partitionBy(col("lang"))))
        .withColumn("c_tot", sum(col("n")).over(w.partitionBy(col("source"))))
        .withColumn("n_tot", sum(col("n")).over(w.partitionBy()))
        .selectExpr("lang", "source", "n",
          "(n * 1000000) div n_tot AS o_ppm",
          """CAST((CAST(r_tot AS DECIMAL(38,0)) * c_tot * 1000000)
             div (CAST(n_tot AS DECIMAL(38,0)) * n_tot) AS BIGINT) AS e_ppm""")
        .selectExpr("lang", "source", "n", "o_ppm", "e_ppm",
          "o_ppm - e_ppm AS delta_ppm",
          "((o_ppm - e_ppm) * (o_ppm - e_ppm)) div greatest(e_ppm, 1L) AS chi2_contrib_ppm")
        .orderBy(asc("lang"), asc("source"))
    }),

    // Cross-table temporal consistency: a lineitem must not ship before
    // its order is placed. One orderkey equi-join (co-located under a
    // bucketed layout), integer epoch-day lag arithmetic, constant-width
    // rollup.
    "dq_temporal_consistency" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .selectExpr("l_orderkey", s"unix_micros(CAST(l_shipdate AS TIMESTAMP)) div ${DayUs}L AS ship_day")
      val ord = t(s, d, "orders")
        .selectExpr("o_orderkey", s"unix_micros(CAST(o_orderdate AS TIMESTAMP)) div ${DayUs}L AS order_day")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .selectExpr("ship_day - order_day AS lag_days")
        .agg(
          count(lit(1)).as("n_lineitems"),
          sum(when(col("lag_days") < 0L, 1L).otherwise(0L)).as("n_ship_before_order"),
          min(col("lag_days")).as("min_lag_days"),
          max(col("lag_days")).as("max_lag_days"))
        .selectExpr("n_lineitems", "n_ship_before_order",
          "(n_ship_before_order * 10000) div n_lineitems AS viol_bp",
          "min_lag_days", "max_lag_days")
    })
  )

  def oracles: Map[String, String] = {
    def uniqSql(table: String, keys: String) =
      s"""SELECT '$table' AS table_name, CAST(sum(cnt) AS BIGINT) AS n_rows,
          count(*) AS n_keys,
          CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_keys,
          CAST(sum(CASE WHEN cnt > 1 THEN cnt - 1 ELSE 0 END) AS BIGINT) AS n_excess_rows,
          CAST(max(cnt) AS BIGINT) AS max_multiplicity
          FROM (SELECT $keys, count(*) AS cnt FROM $table GROUP BY $keys)"""
    def fkSql(edge: String, fact: String, fk: String, dim: String, pk: String) =
      s"""SELECT '$edge' AS fk_edge, CAST(sum(cnt) AS BIGINT) AS n_rows,
          CAST(sum(CASE WHEN d.pk IS NULL THEN cnt ELSE 0 END) AS BIGINT) AS n_orphan_rows,
          CAST(sum(CASE WHEN d.pk IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphan_keys,
          CAST((sum(CASE WHEN d.pk IS NULL THEN cnt ELSE 0 END) * 10000) // sum(cnt) AS BIGINT) AS orphan_bp
          FROM (SELECT CAST($fk AS BIGINT) AS k, count(*) AS cnt FROM $fact GROUP BY 1) f
          LEFT JOIN (SELECT DISTINCT CAST($pk AS BIGINT) AS pk FROM $dim) d ON f.k = d.pk"""
    Map(
      "dq_iqr_outliers" ->
        ("WITH census AS (SELECT event_type AS grp, " +
          "CAST(floor(value) AS BIGINT) AS v, count(*) AS n " +
          "FROM events GROUP BY 1, 2), " +
          "c AS (SELECT grp, v, n, sum(n) OVER (PARTITION BY grp ORDER BY v " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM census), " +
          "tt AS (SELECT grp, sum(n) AS tot FROM census GROUP BY 1), " +
          "q1 AS (SELECT c.grp, min(v) AS q1 FROM c JOIN tt USING (grp) " +
          "WHERE cum * 4 >= tot GROUP BY 1), " +
          "q3 AS (SELECT c.grp, min(v) AS q3 FROM c JOIN tt USING (grp) " +
          "WHERE cum * 4 >= tot * 3 GROUP BY 1) " +
          "SELECT grp AS event_type, CAST(sum(n) AS BIGINT) AS n, q1, q3, " +
          "q3 - q1 AS iqr, " +
          "CAST(sum(CASE WHEN 2 * v < 2 * q1 - 3 * (q3 - q1) THEN n ELSE 0 END) AS BIGINT) AS n_low, " +
          "CAST(sum(CASE WHEN 2 * v > 2 * q3 + 3 * (q3 - q1) THEN n ELSE 0 END) AS BIGINT) AS n_high " +
          "FROM census JOIN q1 USING (grp) JOIN q3 USING (grp) " +
          "GROUP BY grp, q1, q3 ORDER BY event_type"),

      "dq_benford_test" -> {
        val expCase = "CASE digit " + BenfordPpm.map { case (k, v) =>
          s"WHEN $k THEN CAST($v AS BIGINT)" }.mkString(" ") + " END"
        // explicit floor before the BIGINT cast: DuckDB's double→BIGINT
        // cast ROUNDS while Spark's truncates
        "WITH dg AS (SELECT CAST(substring(CAST(CAST(floor(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit " +
          "FROM orders), " +
          "c AS (SELECT digit, count(*) AS n FROM dg WHERE digit BETWEEN 1 AND 9 GROUP BY digit), " +
          "t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c) " +
          "SELECT digit, n, (n * 1000000) // total AS obs_ppm, " +
          s"$expCase AS exp_ppm, " +
          s"(n * 1000000) // total - $expCase AS dev_ppm " +
          "FROM c, t ORDER BY digit"
      },
      "events_value_benford" -> {
        val expCase = "CASE digit " + BenfordPpm.map { case (k, v) =>
          s"WHEN $k THEN CAST($v AS BIGINT)" }.mkString(" ") + " END"
        "WITH dg AS (SELECT event_type, " +
          "CAST(substring(CAST(CAST(floor(value * 100) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit " +
          "FROM events), " +
          "c AS (SELECT event_type, digit, count(*) AS n FROM dg " +
          "WHERE digit BETWEEN 1 AND 9 GROUP BY event_type, digit), " +
          "w AS (SELECT *, CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS total FROM c) " +
          "SELECT event_type, digit, n, (n * 1000000) // total AS obs_ppm, " +
          s"$expCase AS exp_ppm, " +
          s"(n * 1000000) // total - $expCase AS dev_ppm " +
          "FROM w ORDER BY event_type, digit"
      },
      "dq_key_uniqueness" -> Seq(
        uniqSql("customer", "c_custkey"),
        uniqSql("documents", "doc_id"),
        uniqSql("embeddings", "vec_id"),
        uniqSql("events", "event_id"),
        uniqSql("lineitem", "l_orderkey, l_linenumber"),
        uniqSql("orders", "o_orderkey"),
        uniqSql("part", "p_partkey"),
        uniqSql("supplier", "s_suppkey")
      ).mkString("", " UNION ALL ", " ORDER BY table_name"),

      "dq_referential_integrity" -> Seq(
        fkSql("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        fkSql("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        fkSql("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
        fkSql("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        fkSql("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
        fkSql("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey")
      ).mkString("", " UNION ALL ", " ORDER BY fk_edge"),

      "dq_value_rules" ->
        ("""WITH a AS (SELECT count(*) AS n_rows,
            sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS v_qty_range,
            sum(CASE WHEN l_discount < 0 OR l_discount > 0.10 THEN 1 ELSE 0 END) AS v_discount_range,
            sum(CASE WHEN l_tax < 0 OR l_tax > 0.08 THEN 1 ELSE 0 END) AS v_tax_range,
            sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS v_price_positive,
            sum(CASE WHEN l_returnflag NOT IN ('A','N','R') THEN 1 ELSE 0 END) AS v_returnflag_domain,
            sum(CASE WHEN l_linestatus NOT IN ('O','F') THEN 1 ELSE 0 END) AS v_linestatus_domain,
            sum(CASE WHEN l_quantity > 45 THEN 1 ELSE 0 END) AS v_qty_tail_gt45,
            sum(CASE WHEN l_discount > 0.08 THEN 1 ELSE 0 END) AS v_discount_tail_gt8pct
            FROM lineitem),
          u AS (
            SELECT 'discount_range' AS rule, n_rows, v_discount_range AS n_violations FROM a
            UNION ALL SELECT 'discount_tail_gt8pct', n_rows, v_discount_tail_gt8pct FROM a
            UNION ALL SELECT 'linestatus_domain', n_rows, v_linestatus_domain FROM a
            UNION ALL SELECT 'price_positive', n_rows, v_price_positive FROM a
            UNION ALL SELECT 'qty_range', n_rows, v_qty_range FROM a
            UNION ALL SELECT 'qty_tail_gt45', n_rows, v_qty_tail_gt45 FROM a
            UNION ALL SELECT 'returnflag_domain', n_rows, v_returnflag_domain FROM a
            UNION ALL SELECT 'tax_range', n_rows, v_tax_range FROM a)
          SELECT rule, n_rows, CAST(n_violations AS BIGINT) AS n_violations,
            CAST((n_violations * 10000) // n_rows AS BIGINT) AS viol_bp
          FROM u ORDER BY rule"""),

      "dq_distribution_drift" ->
        ("""WITH b AS (SELECT
              CASE WHEN epoch_us(o_orderdate) < 883612800000000 THEN 1 ELSE 0 END AS era_a,
              o_orderpriority,
              length(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR)) AS pd
            FROM orders),
          u AS (
            SELECT 'priority' AS family, o_orderpriority AS bin, era_a FROM b
            UNION ALL
            SELECT 'price_digits', 'digits_' || pd, era_a FROM b),
          g AS (SELECT family, bin,
              CAST(sum(era_a) AS BIGINT) AS n_a,
              CAST(sum(1 - era_a) AS BIGINT) AS n_b
            FROM u GROUP BY family, bin),
          p AS (SELECT family, bin, n_a, n_b,
              CASE WHEN sum(n_a) OVER (PARTITION BY family) = 0 THEN NULL
                ELSE (n_a * 1000000) // CAST(sum(n_a) OVER (PARTITION BY family) AS BIGINT) END AS p_a_ppm,
              CASE WHEN sum(n_b) OVER (PARTITION BY family) = 0 THEN NULL
                ELSE (n_b * 1000000) // CAST(sum(n_b) OVER (PARTITION BY family) AS BIGINT) END AS p_b_ppm
            FROM g)
          SELECT family, bin, n_a, n_b, p_a_ppm, p_b_ppm,
            p_a_ppm - p_b_ppm AS delta_ppm,
            (p_a_ppm - p_b_ppm) * (p_a_ppm - p_b_ppm) AS drift_ppm2
          FROM p ORDER BY family, bin"""),

      "dq_chi2_independence" ->
        ("""WITH g AS (SELECT lang, source, count(*) AS n FROM documents GROUP BY 1, 2),
          m AS (SELECT lang, source, n,
              CAST(sum(n) OVER (PARTITION BY lang) AS BIGINT) AS r_tot,
              CAST(sum(n) OVER (PARTITION BY source) AS BIGINT) AS c_tot,
              CAST(sum(n) OVER () AS BIGINT) AS n_tot
            FROM g),
          p AS (SELECT lang, source, n,
              CAST((n * 1000000) // n_tot AS BIGINT) AS o_ppm,
              -- HUGEINT, not DECIMAL: DuckDB's `//` on a DECIMAL operand
              -- degrades to double division and the BIGINT cast ROUNDS,
              -- diverging from Spark's truncating div on any non-exact cell
              CAST((CAST(r_tot AS HUGEINT) * c_tot * 1000000) // (CAST(n_tot AS HUGEINT) * n_tot) AS BIGINT) AS e_ppm
            FROM m)
          SELECT lang, source, n, o_ppm, e_ppm,
            o_ppm - e_ppm AS delta_ppm,
            ((o_ppm - e_ppm) * (o_ppm - e_ppm)) // greatest(e_ppm, 1) AS chi2_contrib_ppm
          FROM p ORDER BY lang, source"""),

      "dq_temporal_consistency" ->
        ("""WITH j AS (SELECT epoch_us(l_shipdate) // 86400000000 - epoch_us(o_orderdate) // 86400000000 AS lag_days
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
          SELECT count(*) AS n_lineitems,
            CAST(sum(CASE WHEN lag_days < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ship_before_order,
            CAST((sum(CASE WHEN lag_days < 0 THEN 1 ELSE 0 END) * 10000) // count(*) AS BIGINT) AS viol_bp,
            min(lag_days) AS min_lag_days, max(lag_days) AS max_lag_days
          FROM j""")
    )
  }
}
