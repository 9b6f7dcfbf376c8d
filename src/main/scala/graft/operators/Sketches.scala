package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.CrossHash

/** Count-min sketch over the document token stream — the brief's third
  * custom-operator example ("a novel sketch"), built as pure relational
  * algebra so it is oracle-checkable and mergeable:
  *
  *  - The sketch is a fixed `Depth × Width` grid of counters. Each token
  *    occurrence increments one cell per row: `cell_i = ((a_i·h + b_i) mod
  *    P) mod Width`, with `(a_i, b_i)` the pinned [[CrossHash]] permutation
  *    constants (exact int64 on both engines — `a·h < 2^60`).
  *  - As a Spark plan that is `explode(Depth cells) → groupBy(depth, cell)
  *    → count`: partial aggregation makes every executor's contribution the
  *    same fixed grid, and merging partials is cell-wise addition — the
  *    property that lets a 1000-executor cluster summarize an unbounded
  *    token stream in `Depth × Width` integers of driver memory. No state
  *    grows with corpus size except the vocab-bounded occupied-cell count.
  *  - `text_cms_heavy_hitters` closes the loop: the CMS estimate of a
  *    token's count is `min_i sketch[i][cell_i(h)]`, which can only
  *    over-count (collisions add, never subtract). The query emits the
  *    exact top-20 tokens with both exact and estimated counts; the
  *    `overcount >= 0` invariant and the exact estimate values are pinned
  *    by the DuckDB oracle hash.
  *
  * Output contract: the sketch query emits a 4-row per-depth digest
  * (occupancy, total mass, hottest cell) rather than all `Depth × Width`
  * cells — `total_count` must be identical across depths (every token lands
  * in exactly one cell per row), so the digest pins the grid's mass
  * distribution without a 32k-row result.
  */
object Sketches {

  private val P = CrossHash.P
  private val Depth = 4
  private val Width = 8192L
  /** Row-hash constants: the first `Depth` pinned MinHash permutations. */
  private val Perms: Seq[(Long, Long)] = CrossHash.MinhashPerms.take(Depth)

  private def docs(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.TextHashFunctions.register(spark)
    spark.read.parquet(s"$dir/documents.parquet")
  }

  /** One row per token occurrence: the pinned polynomial hash in [0, P). */
  private def tokenHashes(s: SparkSession, d: String): DataFrame =
    docs(s, d).select(
      explode(expr(CrossHash.wordHashesSpark("text"))).as("h"))

  private def cellCol(i: Int): Column = {
    val (a, b) = Perms(i)
    expr(s"((${a}L * h + ${b}L) % ${P}L) % ${Width}L")
  }

  /** One (depth, cell) pair per row of the grid touched by each `h` — the
    * map side of the sketch, shared with the streaming CMS
    * (graft.streaming.FactStateStreams.hotSubjectCells). */
  private[graft] def cellPairs(hashes: DataFrame): DataFrame =
    hashes
      .select(explode(array((0 until Depth).map(i =>
        struct(lit(i.toLong).as("depth"), cellCol(i).as("cell"))): _*)).as("dc"))
      .select(col("dc.depth").as("depth"), col("dc.cell").as("cell"))

  /** Driver-side twin of [[cellCol]] for tests/estimates. */
  private[graft] def cellOf(i: Int, h: Long): Long = {
    val (a, b) = Perms(i)
    ((a * h + b) % P) % Width
  }
  private[graft] def depthCount: Int = Depth

  /** depth×cell → count grid over any `h`-column relation (occupied cells
    * only). Package-visible so the merge law — grid(A ∪ B) = cell-wise
    * grid(A) + grid(B) — is pinned by a test, not assumed. */
  private[graft] def sketchOf(hashes: DataFrame): DataFrame =
    cellPairs(hashes)
      .groupBy(col("depth"), col("cell"))
      .agg(count(lit(1)).as("n"))

  private def sketch(s: SparkSession, d: String): DataFrame =
    sketchOf(tokenHashes(s, d))

  /** Pre-aggregation (lang, j, r) projection over any (lang, h) relation —
    * register index + rank per hash, shared verbatim by the batch registers
    * below and the streaming HLL face (FactStateStreams.hllDistinct), so
    * stream/batch parity is by construction, not by duplicated CASE chains. */
  private[graft] def hllJR(langHashes: DataFrame): DataFrame =
    langHashes
      .select(col("lang"), expr(s"h % $HllM").as("j"),
        expr(rankCase(s"(h div $HllM)")).as("r"))

  /** Per-(lang, register) max-rank relation for HLL over any (lang, h)
    * relation. Package-visible for the merge-law test: registers(A ∪ B) =
    * register-wise max of registers(A), registers(B). */
  private[graft] def hllRegistersOf(langHashes: DataFrame): DataFrame =
    hllJR(langHashes)
      .groupBy(col("lang"), col("j")).agg(max(col("r")).as("m"))

  /** The documents→(lang, shingle-hash) stream the HLL query estimates. */
  private[graft] def langShingleHashes(s: SparkSession, d: String): DataFrame =
    docs(s, d).select(col("lang"),
      explode(expr(CrossHash.shingleHashesSpark(
        CrossHash.wordHashesSpark("text")))).as("h"))

  // ---- HyperLogLog (raw estimator) --------------------------------------
  // 256 registers; register = h mod 256, rank = CLZ of (h div 256) in its
  // 22-bit field + 1 (h < P < 2^30 so h div 256 < 2^22). Every float op is
  // an IEEE basic op (+,-,*,/ are correctly rounded, so bit-identical on
  // both engines): ranks come from an integer CASE chain (no log2), the
  // 2^-M terms are exact power-of-two literals (no libm pow), and their sum
  // is exact in double (multiples of 2^-23 bounded by 256 need 31 mantissa
  // bits), hence order-independent across Spark's parallel aggregation.
  // No small-range correction — it needs ln(), which is not cross-engine
  // bit-stable; the raw estimator is the oracle-pinned contract.
  private[graft] val HllM = 256
  private[graft] val HllAlphaM2: Double = 0.7213 / (1.0 + 1.079 / HllM) * HllM * HllM

  /** CLZ-based rank of the 22-bit field, as a CASE chain valid in both
    * Spark SQL and DuckDB. v in [2^i, 2^(i+1)) has rank 22-i; v=0 → 23. */
  private def rankCase(v: String): String =
    (21 to 0 by -1).map(i => s"WHEN $v >= ${1L << i} THEN ${22 - i}")
      .mkString("CASE ", " ", " ELSE 23 END")

  /** 2^-M as exact literals keyed by the register max-rank (1..23). */
  private def termCase(m: String): String =
    (1 to 23).map(r => s"WHEN $r THEN ${java.lang.Double.toString(math.pow(2.0, -r))}")
      .mkString(s"CASE $m ", " ", " END")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // HLL set algebra across sketches: for every language PAIR, the union
    // estimate from register-wise max-merge and the intersection estimate
    // by inclusion-exclusion (est_A + est_B − est_A∪B) — the overlap
    // answer a sketch-only pipeline can give WITHOUT revisiting the data,
    // next to the exact |A∩B| so the error is part of the declared,
    // oracle-pinned result. Everything past the shared per-lang registers
    // runs on the registers×pairs grid (≤ langs²·256 rows); the exact
    // intersection is an equi-join on the hash over the distinct
    // (lang, h) relation — at most |langs| rows per key, so no skew.
    "text_hll_set_algebra" -> ((s, d) => {
      val tok = CacheScope.persist(langShingleHashes(s, d))
      val regs = CacheScope.persist(hllRegistersOf(tok))
      def estFrom(df: DataFrame, keys: Seq[String], out: String): DataFrame = df
        .groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("present"), sum(expr(termCase("m"))).as("s_present"))
        .selectExpr(keys :+ (s"CAST(floor(($HllAlphaM2 / (s_present + " +
          s"CAST($HllM - present AS DOUBLE))) * 10000.0) AS BIGINT) AS $out"): _*)
      val langs = regs.select(col("lang")).distinct()
      val pairs = langs.as("x").join(langs.as("y"), col("x.lang") < col("y.lang"))
        .select(col("x.lang").as("la"), col("y.lang").as("lb"))
      val uni = pairs.join(regs, col("la") === col("lang"))
        .select(col("la"), col("lb"), col("j"), col("m"))
        .union(pairs.join(regs, col("lb") === col("lang"))
          .select(col("la"), col("lb"), col("j"), col("m")))
        .groupBy(col("la"), col("lb"), col("j")).agg(max(col("m")).as("m"))
      val estU = estFrom(uni, Seq("la", "lb"), "hll_union_e4")
      val estL = estFrom(regs, Seq("lang"), "est_e4")
      val dx = tok.select(col("lang"), col("h")).distinct()
      val exact = dx.as("p").join(dx.as("q"),
          col("p.h") === col("q.h") && col("p.lang") < col("q.lang"))
        .groupBy(col("p.lang").as("la"), col("q.lang").as("lb"))
        .agg(count(lit(1)).as("n_common_exact"))
      pairs
        .join(exact, Seq("la", "lb"), "left").na.fill(0L, Seq("n_common_exact"))
        .join(estL.select(col("lang").as("la"), col("est_e4").as("hll_a_e4")), Seq("la"))
        .join(estL.select(col("lang").as("lb"), col("est_e4").as("hll_b_e4")), Seq("lb"))
        .join(estU, Seq("la", "lb"))
        .selectExpr("la AS lang_a", "lb AS lang_b", "n_common_exact",
          "hll_a_e4", "hll_b_e4", "hll_union_e4",
          "hll_a_e4 + hll_b_e4 - hll_union_e4 AS hll_inter_e4")
        .orderBy(asc("lang_a"), asc("lang_b"))
    }),

    // Distinct-shingle cardinality per language: the corpus vocabulary is a
    // fixed 31 tokens at every SF, but 3-gram shingles number in the
    // thousands per language — real HLL territory (raw estimator needs
    // n >> 2.5·m). Shingle hashes are already ~uniform on [0, P).
    "text_hll_distinct" -> ((s, d) => {
      val tok = langShingleHashes(s, d)
      val regs = hllRegistersOf(tok)
      val est = regs
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("present"), sum(expr(termCase("m"))).as("s_present"))
        // absent registers contribute 2^0 = 1 each; all exact in double
        .withColumn("s_all",
          col("s_present") + (lit(HllM) - col("present")).cast("double"))
        .select(col("lang"),
          expr(s"CAST(floor(($HllAlphaM2 / s_all) * 10000.0) AS BIGINT)").as("hll_est_e4"))
      val exact = tok.groupBy(col("lang"))
        .agg(countDistinct(col("h")).as("n_exact"))
      exact.join(est, Seq("lang"))
        .select(col("lang"), col("n_exact"), col("hll_est_e4"))
        .orderBy(asc("lang"))
    }),

    // The distributed-combine law, demonstrated as a query: shard the
    // hash stream 8 ways (decorrelated from the register index by the
    // coin scramble), build per-shard HLL registers, max-merge them, and
    // show the merged estimate EQUALS the single-pass global estimate —
    // the property that lets 1000 executors sketch independently and
    // combine losslessly at 100 TB. merge_exact is part of the oracle'd
    // output, so a regression in mergeability fails the hash gate, not
    // just a unit test.
    "text_hll_shard_merge" -> ((s, d) => {
      val tok = langShingleHashes(s, d)
        .withColumn("shard", expr(s"h * ${CrossHash.CoinScramble} % $P % 8"))
      val perShard = tok
        .select(col("lang"), col("shard"), expr(s"h % $HllM").as("j"),
          expr(rankCase(s"(h div $HllM)")).as("r"))
        .groupBy(col("lang"), col("shard"), col("j"))
        .agg(max(col("r")).as("m"))
      def estimate(regs: DataFrame): DataFrame = regs
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("present"), sum(expr(termCase("m"))).as("s_present"))
        .selectExpr("lang",
          s"CAST(floor(($HllAlphaM2 / (s_present + CAST($HllM - present AS DOUBLE))) * 10000.0) AS BIGINT) AS est_e4")
      val merged = estimate(
        perShard.groupBy(col("lang"), col("j")).agg(max(col("m")).as("m")))
        .withColumnRenamed("est_e4", "merged_est_e4")
      val global = estimate(hllRegistersOf(tok.select(col("lang"), col("h"))))
        .withColumnRenamed("est_e4", "global_est_e4")
      val shards = tok.groupBy(col("lang"))
        .agg(countDistinct(col("shard")).as("n_shards"))
      shards.join(merged, Seq("lang")).join(global, Seq("lang"))
        .selectExpr("lang", "n_shards", "merged_est_e4", "global_est_e4",
          "CASE WHEN merged_est_e4 = global_est_e4 THEN 1L ELSE 0L END AS merge_exact")
        .orderBy(asc("lang"))
    }),

    "text_cms_sketch" -> ((s, d) =>
      sketch(s, d)
        .groupBy(col("depth"))
        .agg(count(lit(1)).as("occupied_cells"),
          sum(col("n")).cast("bigint").as("total_count"),
          max(col("n")).as("max_cell"))
        .orderBy(asc("depth"))),

    // Histogram quantile sketch over lineitem prices — the constant-memory
    // percentile pattern for a 100 TB fact table (the exact twin,
    // `lineitem_quantiles`, sorts per group; this one never sorts data):
    // values bucket into fixed e4-integer-width bins, the bin-count grid is
    // the sketch (map-side combinable, bounded by value range / width, NOT
    // by row count), and p50/p90/p99 resolve to the first bin whose
    // cumulative count reaches ceil(n·q) — error bounded by one bin width.
    // The cumsum window runs over the GRID (≤ ~1k rows), not the corpus;
    // the only corpus pass is the bucket groupBy. All integer arithmetic:
    // rank = (n·pct + 99) div 100, replayed exactly in DuckDB.
    "price_quantile_sketch" -> ((s, d) => {
      val W = 1000000L // e4-scale bin width = 100.00 price units
      val e4 = "CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(10000 AS DECIMAL(5,0)) AS BIGINT)"
      val grid = Tables.read(s, d, "lineitem")
        .selectExpr(s"$e4 div ${W}L AS bucket")
        .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
      val cum = grid.withColumn("cum",
        sum(col("cnt")).over(org.apache.spark.sql.expressions.Window
          .orderBy(col("bucket"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)))
      val n = grid.agg(sum(col("cnt")).cast("bigint").as("n"))
      cum.crossJoin(broadcast(n))
        .agg(
          max(col("n")).as("n"),
          min(when(col("cum") >= expr("(n * 50 + 99) div 100"), col("bucket"))).as("b50"),
          min(when(col("cum") >= expr("(n * 90 + 99) div 100"), col("bucket"))).as("b90"),
          min(when(col("cum") >= expr("(n * 99 + 99) div 100"), col("bucket"))).as("b99"))
        .selectExpr("stack(3, " +
          "50L, (n * 50 + 99) div 100, b50, " +
          "90L, (n * 90 + 99) div 100, b90, " +
          "99L, (n * 99 + 99) div 100, b99) AS (pct, rank, bucket)")
        .selectExpr("pct", "rank", "bucket",
          s"bucket * ${W}L AS lo_e4", s"(bucket + 1) * ${W}L AS hi_e4")
        .orderBy(asc("pct"))
    }),

    "text_cms_heavy_hitters" -> ((s, d) => {
      val top = tokenHashes(s, d)
        .groupBy(col("h")).agg(count(lit(1)).as("n_exact"))
        .orderBy(desc("n_exact"), asc("h")).limit(20)
      val probes = top.select(col("h"), col("n_exact"),
        explode(array((0 until Depth).map(i =>
          struct(lit(i.toLong).as("depth"), cellCol(i).as("cell"))): _*)).as("dc"))
        .select(col("h"), col("n_exact"), col("dc.depth").as("depth"), col("dc.cell").as("cell"))
      probes.join(sketch(s, d), Seq("depth", "cell"))
        .groupBy(col("h"), col("n_exact"))
        .agg(min(col("n")).as("n_est"))
        .select(col("h").as("token_hash"), col("n_exact"), col("n_est"),
          (col("n_est") - col("n_exact")).as("overcount"))
        .orderBy(desc("n_exact"), asc("token_hash"))
    }),

    // Bloom filter as a relation + its measured false-positive rate — the
    // third sketch family (CMS counts, HLL cardinality, Bloom membership;
    // the store's own metadata pruning runs on Bloom filters, Blooms.scala,
    // so the engine ships the sketch's accuracy dashboard as a query).
    // The filter is DECLARATIVE: the bit set is `distinct (hash_j(key)
    // mod m)` over k pinned hash rows, a probe is a false positive iff all
    // of ITS OWN distinct positions are present — pure relational algebra,
    // so both engines recompute the exact same filter and the oracle pins
    // the measured FPR bit-for-bit. m adapts to the key count (8 bits/key,
    // k = 5 → theoretical FPR ≈ 2.2%); the probe set is the key set
    // shifted above max_key (guaranteed absent, corpus-sized). The hash
    // rides DECIMAL(38,0)/HUGEINT ((key·a + b) mod (2^61−1) mod m) so keys
    // of ANY int64 magnitude hash without overflow. Scale: bits and probe
    // positions are k·n-row censuses (map-side combined distinct), the
    // membership check is one join on pos, and every scalar is a 1-row
    // broadcast attach — no windows, no driver state.
    "text_bloom_fpr_eval" -> ((s, d) => {
      val keys = docs(s, d).select(col("doc_id").cast("bigint").as("key")).distinct()
      val scal = keys.agg(count(lit(1)).cast("bigint").as("n_keys"),
        max(col("key")).as("max_key"))
      val kb = CacheScope.persist(keys.crossJoin(broadcast(scal))
        .selectExpr("key", "n_keys", "max_key", s"n_keys * ${BloomBitsPerKey}L AS m"))
      val bits = kb.select(
        explode(expr(bloomPosArray("key", "m", FprPerms))).as("pos")).distinct()
      val probePos = kb
        .selectExpr("key + max_key + 1 AS pkey", "m")
        .select(col("pkey"),
          explode(expr(bloomPosArray("pkey", "m", FprPerms))).as("pos"))
        .distinct()
      val perProbe = probePos
        .join(bits.withColumn("hit", lit(1L)), Seq("pos"), "left")
        .groupBy(col("pkey"))
        .agg(count(lit(1)).as("n_pos"), sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      val probeAgg = perProbe.agg(count(lit(1)).cast("bigint").as("n_probes"),
        sum(expr("IF(n_hit = n_pos, 1L, 0L)")).as("n_false_pos"))
      val bitsAgg = bits.agg(count(lit(1)).cast("bigint").as("n_set_bits"))
      scal.selectExpr("n_keys", s"n_keys * ${BloomBitsPerKey}L AS m_bits",
        s"CAST(${FprPerms.size} AS BIGINT) AS k_hashes")
        .crossJoin(broadcast(bitsAgg)).crossJoin(broadcast(probeAgg))
        .selectExpr("n_keys", "m_bits", "k_hashes", "n_set_bits",
          "(n_set_bits * 10000) div m_bits AS density_bp",
          "n_probes", "n_false_pos",
          "(n_false_pos * 10000) div n_probes AS fpr_bp",
          // theoretical FPR ≈ density^k in bp, pure integers via the wide
          // product (density_bp ≤ 1e4 → bp^5 ≤ 1e20, inside DECIMAL(38,0))
          """CAST((CAST((n_set_bits * 10000) div m_bits AS DECIMAL(38,0))
              * ((n_set_bits * 10000) div m_bits) * ((n_set_bits * 10000) div m_bits)
              * ((n_set_bits * 10000) div m_bits) * ((n_set_bits * 10000) div m_bits))
              div 10000000000000000 AS BIGINT) AS expected_fpr_bp""")
    }),

    // First-seen / maybe-duplicate census through a sharded Bloom filter —
    // the BATCH TWIN of the bloomFirstSeen streaming face (one shared
    // semantics: an event is maybe-seen iff every one of its k bit
    // positions was set by a strictly earlier event in its shard; everyone
    // sets its bits after checking). The order key is the exact (ts µs,
    // event_id) pair packed into a DECIMAL(38,0) — NO corpus-wide window.
    // Physical shape: okey0 = min(okey) participates over every (shard,
    // pos) INCLUDING the probing event's own row, so okey0 ≤ okey always
    // and the per-event verdict `min(okey0 < okey) = 0` holds exactly when
    // the event's own okey IS a first-setter at one of its positions
    // (winners of a position carry that position by construction, and
    // events are grouped by (shard, okey), so okey-collided events merge
    // identically in both renderings). The winner set is bounded by the
    // filter GEOMETRY — FsShards × SegBits rows at ANY corpus — so the
    // verdict is a broadcast probe of that grid instead of the former
    // k·n self-join + k·n re-aggregation; the k·n position census itself
    // collapses map-side to the same grid bound.
    "events_bloom_first_seen" -> ((s, d) => {
      val ev = EventFinders.events(s, d).selectExpr(
        "user_id",
        "CAST(ts div 1000 AS DECIMAL(38,0)) * 16777216 + event_id AS okey",
        s"${shardSpark("user_id")} AS shard")
      val winners = ev.select(col("shard"), col("okey"),
          explode(expr(bloomPosArray("user_id", SegBits.toString, FsPerms))).as("pos"))
        .groupBy(col("shard"), col("pos"))
        .agg(min(col("okey")).as("okey0"))
        .select(col("shard"), col("okey0").as("okey")).distinct()
        .withColumn("won", lit(1L))
      ev.select(col("shard"), col("okey")).distinct()
        .join(broadcast(winners), Seq("shard", "okey"), "left")
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_events"),
          sum(expr("CASE WHEN won IS NULL THEN 1L ELSE 0L END")).as("n_maybe_dup"))
        .selectExpr("shard", "n_events",
          "n_events - n_maybe_dup AS n_first", "n_maybe_dup")
        .orderBy(asc("shard"))
    })
  )

  /** Bloom geometry + pinned hash rows (distinct MinhashPerms slices per
    * consumer so the sketches stay independent). */
  private val BloomBitsPerKey = 8L
  private val P61 = 2305843009213693951L // 2^61 − 1, prime
  private val FprPerms: Seq[(Long, Long)] = CrossHash.MinhashPerms.slice(4, 9)
  /** Streaming-face geometry — shared with FactStateStreams.bloomFirstSeen. */
  val FsShards = 64L
  val SegBits = 1024L
  val FsPerms: Seq[(Long, Long)] = CrossHash.MinhashPerms.slice(9, 12)
  val ShardPerm: (Long, Long) = CrossHash.MinhashPerms(12)

  /** `array(pos_0, …, pos_{k−1})` for `key`: the affine image t = (key·a
    * + b) mod (2^61−1) is SQUARED mod p before the final mod m. The square
    * is load-bearing: for keys below p/a the affine map never wraps, so
    * its positions mod m are an arithmetic progression — measured FPR ran
    * 5.8× theory (9.8% vs 1.7%) on contiguous keys, and the affine shard
    * map reached only half the shards. t² mod p is non-linear in the key,
    * and the measured FPR lands on density^k (2.8% vs 2.4% at 500
    * probes). t² ≤ (2^61)² ≈ 5.3e36 stays inside DECIMAL(38,0)/HUGEINT.
    * Spark rendering. */
  private def bloomPosArray(key: String, m: String, perms: Seq[(Long, Long)]): String =
    perms.map { case (a, b) =>
      val t = s"((CAST($key AS DECIMAL(38,0)) * ${a}L + ${b}L) % ${P61}L)"
      s"CAST((($t * $t) % ${P61}L) % $m AS BIGINT)"
    }.mkString("array(", ", ", ")")

  /** DuckDB twin of [[bloomPosArray]] (HUGEINT). */
  private def bloomPosListDuck(key: String, m: String, perms: Seq[(Long, Long)]): String =
    perms.map { case (a, b) =>
      val t = s"((CAST($key AS HUGEINT) * $a + $b) % $P61)"
      s"CAST((($t * $t) % $P61) % $m AS BIGINT)"
    }.mkString("[", ", ", "]")

  /** Squared-mix shard id (same non-linearity as the positions — the
    * affine map left half the shards empty on contiguous user ids). */
  private[graft] def shardSpark(key: String): String = {
    val t = s"((CAST($key AS DECIMAL(38,0)) * ${ShardPerm._1}L + ${ShardPerm._2}L) % ${P61}L)"
    s"CAST((($t * $t) % ${P61}L) % ${FsShards}L AS BIGINT)"
  }

  private def shardDuck(key: String): String = {
    val t = s"((CAST($key AS HUGEINT) * ${ShardPerm._1} + ${ShardPerm._2}) % $P61)"
    s"CAST((($t * $t) % $P61) % $FsShards AS BIGINT)"
  }

  def oracles: Map[String, String] = {
    val wh = CrossHash.wordHashesDuck(CrossHash.tokensDuck("text"))
    val tok = s"SELECT unnest($wh) AS h FROM documents"
    val cells = (0 until Depth).map { i =>
      val (a, b) = Perms(i)
      s"SELECT CAST($i AS BIGINT) AS depth, (($a * h + $b) % $P) % $Width AS cell FROM tok"
    }.mkString(" UNION ALL ")
    val probeCells = (0 until Depth).map { i =>
      val (a, b) = Perms(i)
      s"SELECT h, n_exact, CAST($i AS BIGINT) AS depth, " +
        s"(($a * h + $b) % $P) % $Width AS cell FROM top"
    }.mkString(" UNION ALL ")
    val langTok = "SELECT lang, unnest(" +
      CrossHash.shingleHashesDuck(wh) + ") AS h FROM documents"
    Map(
      "text_hll_set_algebra" ->
        (s"WITH tok AS ($langTok), " +
          s"regs AS (SELECT lang, h % $HllM AS j, ${rankCase(s"(h // $HllM)")} AS r FROM tok), " +
          "mx AS (SELECT lang, j, max(r) AS m FROM regs GROUP BY lang, j), " +
          "langs AS (SELECT DISTINCT lang FROM mx), " +
          "pairs AS (SELECT x.lang AS la, y.lang AS lb FROM langs x JOIN langs y ON x.lang < y.lang), " +
          "uni AS (SELECT la, lb, j, max(m) AS m FROM (" +
          "SELECT la, lb, j, m FROM pairs JOIN mx ON la = mx.lang " +
          "UNION ALL SELECT la, lb, j, m FROM pairs JOIN mx ON lb = mx.lang) " +
          "GROUP BY la, lb, j), " +
          s"ue0 AS (SELECT la, lb, count(*) AS present, sum(${termCase("m")}) AS s_present " +
          "FROM uni GROUP BY la, lb), " +
          s"ue AS (SELECT la, lb, CAST(floor(($HllAlphaM2 / " +
          s"(s_present + CAST($HllM - present AS DOUBLE))) * 10000.0) AS BIGINT) AS hll_union_e4 FROM ue0), " +
          s"le0 AS (SELECT lang, count(*) AS present, sum(${termCase("m")}) AS s_present " +
          "FROM mx GROUP BY lang), " +
          s"le AS (SELECT lang, CAST(floor(($HllAlphaM2 / " +
          s"(s_present + CAST($HllM - present AS DOUBLE))) * 10000.0) AS BIGINT) AS est_e4 FROM le0), " +
          "dx AS (SELECT DISTINCT lang, h FROM tok), " +
          "ex AS (SELECT p.lang AS la, q.lang AS lb, count(*) AS n_common_exact " +
          "FROM dx p JOIN dx q ON p.h = q.h AND p.lang < q.lang GROUP BY p.lang, q.lang) " +
          "SELECT pairs.la AS lang_a, pairs.lb AS lang_b, " +
          "CAST(COALESCE(ex.n_common_exact, 0) AS BIGINT) AS n_common_exact, " +
          "a.est_e4 AS hll_a_e4, b.est_e4 AS hll_b_e4, ue.hll_union_e4, " +
          "a.est_e4 + b.est_e4 - ue.hll_union_e4 AS hll_inter_e4 " +
          "FROM pairs LEFT JOIN ex ON pairs.la = ex.la AND pairs.lb = ex.lb " +
          "JOIN le a ON a.lang = pairs.la JOIN le b ON b.lang = pairs.lb " +
          "JOIN ue ON ue.la = pairs.la AND ue.lb = pairs.lb " +
          "ORDER BY lang_a, lang_b"),
      "text_hll_distinct" ->
        (s"WITH tok AS ($langTok), " +
          s"regs AS (SELECT lang, h % $HllM AS j, ${rankCase(s"(h // $HllM)")} AS r FROM tok), " +
          "mx AS (SELECT lang, j, max(r) AS m FROM regs GROUP BY lang, j), " +
          s"est AS (SELECT lang, count(*) AS present, sum(${termCase("m")}) AS s_present " +
          "FROM mx GROUP BY lang), " +
          s"e AS (SELECT lang, CAST(floor(($HllAlphaM2 / " +
          s"(s_present + CAST($HllM - present AS DOUBLE))) * 10000.0) AS BIGINT) " +
          "AS hll_est_e4 FROM est), " +
          "x AS (SELECT lang, count(DISTINCT h) AS n_exact FROM tok GROUP BY lang) " +
          "SELECT x.lang, x.n_exact, e.hll_est_e4 FROM x JOIN e USING (lang) ORDER BY lang"),
      "text_hll_shard_merge" ->
        (s"WITH tok AS ($langTok), " +
          s"sh AS (SELECT lang, h, h * ${CrossHash.CoinScramble} % $P % 8 AS shard FROM tok), " +
          s"ps AS (SELECT lang, shard, h % $HllM AS j, max(${rankCase(s"(h // $HllM)")}) AS m " +
          "FROM sh GROUP BY lang, shard, h % " + HllM + "), " +
          "mg AS (SELECT lang, j, max(m) AS m FROM ps GROUP BY lang, j), " +
          s"me AS (SELECT lang, count(*) AS present, sum(${termCase("m")}) AS s_present FROM mg GROUP BY lang), " +
          s"merged AS (SELECT lang, CAST(floor(($HllAlphaM2 / " +
          s"(s_present + CAST($HllM - present AS DOUBLE))) * 10000.0) AS BIGINT) AS merged_est_e4 FROM me), " +
          s"gr AS (SELECT lang, h % $HllM AS j, max(${rankCase(s"(h // $HllM)")}) AS m " +
          s"FROM tok GROUP BY lang, h % $HllM), " +
          s"ge AS (SELECT lang, count(*) AS present, sum(${termCase("m")}) AS s_present FROM gr GROUP BY lang), " +
          s"gest AS (SELECT lang, CAST(floor(($HllAlphaM2 / " +
          s"(s_present + CAST($HllM - present AS DOUBLE))) * 10000.0) AS BIGINT) AS global_est_e4 FROM ge), " +
          "ns AS (SELECT lang, count(DISTINCT shard) AS n_shards FROM sh GROUP BY lang) " +
          "SELECT ns.lang, ns.n_shards, merged.merged_est_e4, gest.global_est_e4, " +
          "CAST(CASE WHEN merged_est_e4 = global_est_e4 THEN 1 ELSE 0 END AS BIGINT) AS merge_exact " +
          "FROM ns JOIN merged USING (lang) JOIN gest USING (lang) ORDER BY ns.lang"),
      "text_cms_sketch" ->
        (s"WITH tok AS ($tok), cells AS ($cells), " +
          "grid AS (SELECT depth, cell, count(*) AS n FROM cells GROUP BY depth, cell) " +
          "SELECT depth, count(*) AS occupied_cells, CAST(sum(n) AS BIGINT) AS total_count, " +
          "max(n) AS max_cell FROM grid GROUP BY depth ORDER BY depth"),
      "price_quantile_sketch" ->
        ("WITH v AS (SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * " +
          "CAST(10000 AS DECIMAL(5,0)) AS BIGINT) AS e4 FROM lineitem), " +
          "g AS (SELECT e4 // 1000000 AS bucket, count(*) AS cnt FROM v GROUP BY bucket), " +
          "c AS (SELECT bucket, CAST(sum(cnt) OVER (ORDER BY bucket " +
          "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM g), " +
          "n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM g), " +
          "q AS (SELECT * FROM (VALUES (50), (90), (99)) t(pct)), " +
          "r AS (SELECT pct, (n * pct + 99) // 100 AS rank FROM q, n), " +
          "sel AS (SELECT r.pct, r.rank, min(c.bucket) AS bucket " +
          "FROM r JOIN c ON c.cum >= r.rank GROUP BY r.pct, r.rank) " +
          "SELECT CAST(pct AS BIGINT) AS pct, CAST(rank AS BIGINT) AS rank, bucket, " +
          "bucket * 1000000 AS lo_e4, (bucket + 1) * 1000000 AS hi_e4 " +
          "FROM sel ORDER BY pct"),
      "text_cms_heavy_hitters" ->
        (s"WITH tok AS ($tok), cells AS ($cells), " +
          "grid AS (SELECT depth, cell, count(*) AS n FROM cells GROUP BY depth, cell), " +
          "top AS (SELECT h, count(*) AS n_exact FROM tok GROUP BY h " +
          "ORDER BY n_exact DESC, h LIMIT 20), " +
          s"probes AS ($probeCells) " +
          "SELECT p.h AS token_hash, p.n_exact, min(g.n) AS n_est, " +
          "min(g.n) - p.n_exact AS overcount " +
          "FROM probes p JOIN grid g USING (depth, cell) " +
          "GROUP BY p.h, p.n_exact ORDER BY p.n_exact DESC, p.h"),
      "text_bloom_fpr_eval" ->
        ("WITH keys AS (SELECT DISTINCT CAST(doc_id AS BIGINT) AS key FROM documents), " +
          "scal AS (SELECT CAST(count(*) AS BIGINT) AS n_keys, max(key) AS max_key, " +
          s"CAST(count(*) AS BIGINT) * $BloomBitsPerKey AS m FROM keys), " +
          "bits AS (SELECT DISTINCT pos FROM (SELECT " +
          s"unnest(${bloomPosListDuck("key", "m", FprPerms)}) AS pos " +
          "FROM keys CROSS JOIN scal) _b), " +
          "ppos AS (SELECT DISTINCT pkey, pos FROM (SELECT key + max_key + 1 AS pkey, " +
          s"unnest(${bloomPosListDuck("(key + max_key + 1)", "m", FprPerms)}) AS pos " +
          "FROM keys CROSS JOIN scal) _p), " +
          "pp AS (SELECT pkey, count(*) AS n_pos, " +
          "CAST(sum(CASE WHEN b.pos IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit " +
          "FROM ppos LEFT JOIN bits b USING (pos) GROUP BY pkey), " +
          "pa AS (SELECT CAST(count(*) AS BIGINT) AS n_probes, " +
          "CAST(sum(CASE WHEN n_hit = n_pos THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos FROM pp), " +
          "ba AS (SELECT CAST(count(*) AS BIGINT) AS n_set_bits FROM bits) " +
          s"SELECT n_keys, m AS m_bits, CAST(${FprPerms.size} AS BIGINT) AS k_hashes, " +
          "n_set_bits, (n_set_bits * 10000) // m AS density_bp, " +
          "n_probes, n_false_pos, (n_false_pos * 10000) // n_probes AS fpr_bp, " +
          "CAST((CAST((n_set_bits * 10000) // m AS HUGEINT) " +
          "* ((n_set_bits * 10000) // m) * ((n_set_bits * 10000) // m) " +
          "* ((n_set_bits * 10000) // m) * ((n_set_bits * 10000) // m)) " +
          "// 10000000000000000 AS BIGINT) AS expected_fpr_bp " +
          "FROM scal CROSS JOIN ba CROSS JOIN pa"),
      "events_bloom_first_seen" ->
        ("WITH ev AS (SELECT user_id, " +
          "CAST(epoch_us(ts) AS HUGEINT) * 16777216 + event_id AS okey, " +
          s"${shardDuck("user_id")} AS shard " +
          "FROM events), " +
          "posr AS (SELECT shard, okey, " +
          s"unnest(${bloomPosListDuck("user_id", SegBits.toString, FsPerms)}) AS pos FROM ev), " +
          "firstset AS (SELECT shard, pos, min(okey) AS okey0 FROM posr GROUP BY shard, pos), " +
          "seen AS (SELECT p.shard, p.okey, " +
          "min(CASE WHEN f.okey0 < p.okey THEN 1 ELSE 0 END) AS dup " +
          "FROM posr p JOIN firstset f ON f.shard = p.shard AND f.pos = p.pos " +
          "GROUP BY p.shard, p.okey) " +
          "SELECT shard, count(*) AS n_events, " +
          "count(*) - CAST(sum(dup) AS BIGINT) AS n_first, " +
          "CAST(sum(dup) AS BIGINT) AS n_maybe_dup " +
          "FROM seen GROUP BY shard ORDER BY shard")
    )
  }
}
