package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.CrossHash._

/** Corpus-mining operators: cross-corpus parallel-pair mining, smoothed
  * language-model estimation, and cross-entity flow reciprocity — the
  * operators that turn a curated corpus into *derived* training signal
  * (mined bitext pairs, an n-gram LM usable as a quality filter, entity
  * flow structure). Reference scope: factstore's finders retrieve facts;
  * these mine relationships BETWEEN retrieved populations, the third stage
  * of the reference's ingest → query → analyze pipeline.
  *
  *  - '''embedding_bitext_mining''': ratio-margin parallel-pair mining
  *    (the CCMatrix/LASER shape: score(x, y) = cos(x, y) / mean of the
  *    two sides' k-NN cosines — a pair is accepted when it is mutually
  *    much closer than either side's neighborhood baseline, which plain
  *    cosine thresholds cannot express). The two "languages" are the even
  *    and odd vec_id halves of `embeddings` (the test-corpus stand-in for
  *    two aligned monolingual embedding spaces). margin_e6 =
  *    cos·2k / (Σ_k fwd + Σ_k bwd) computed entirely in ppm integers; the
  *    1.06 acceptance threshold of the literature becomes 1 060 000.
  *
  *  - '''text_kn_bigram_prob''': interpolated Kneser–Ney bigram
  *    probabilities (discount d = 3/4), the smoothing every production
  *    n-gram LM quality filter uses where the existing
  *    `text_lm_bigram_surprisal` uses add-one. Fraction-cleared to pure
  *    integers: with c12 ≥ 1 observed, 4·max(c12 − 3/4, 0) = 4c12 − 3, so
  *    P_KN·1e6 = 1e6·((4c12 − 3)·Ndd + 3·n1fwd·cont2) div (4·c1·Ndd)
  *    where c1 = Σ_b c12 (prefix count), n1fwd = |{b : c(a,b) > 0}|
  *    (distinct successors — the interpolation weight numerator), cont2 =
  *    |{a : c(a,b) > 0}| (continuation count), Ndd = distinct bigram
  *    types. At a 1e13-token / 1e10-bigram-type corpus the numerator
  *    reaches ~4e29 — rides DECIMAL(38,0)/HUGEINT, emits BIGINT (ppm is
  *    bounded by 1e6).
  *
  *  - '''graph_trade_reciprocity''': weighted directed reciprocity of the
  *    nation-level trade graph (customer nation → supplier nation revenue
  *    flows; Squartini–Garlaschelli r = Σ min(w_ij, w_ji) / Σ w_ij). The
  *    corpus collapses to a ≤ nations² flow grid in one pass; flows are
  *    exact e8-scaled revenue integers (the part_revenue_concentration
  *    arithmetic), corpus-sized sums ride DECIMAL(38,0)/HUGEINT and EMIT
  *    AS DIGIT STRINGS per the round-12 version-stable emission policy;
  *    reciprocity shares are bounded basis points (BIGINT).
  *
  * Scale designs (100 TB):
  *  - bitext mining: the forward pass is |probes| × corpus with the
  *    codegen'd `vec_dot` kernel — the `ann_bruteforce_topk` baseline
  *    shape, and deliberately tier-agnostic: the margin arithmetic
  *    consumes (pair, cos, k-NN sums) from ANY neighbor tier, so at scale
  *    the scan swaps for `ann_ivf_probe`/`ann_sq8_adc` candidates without
  *    touching the scoring. The backward pass is bounded by accepted
  *    candidates (≤ 2·probes), never corpus².
  *  - KN LM: one bigram census (map-side combined, hash keys), then
  *    everything is vocabulary- or vocabulary²-sized; Ndd is a 1-row
  *    broadcast attach; top-3 per prefix via rank-pushdown window.
  *  - trade reciprocity: dims broadcast; the single corpus-scale join
  *    (lineitem ⨝ orders) shuffles on the join key once and collapses to
  *    the nation grid in the same stage (partial aggregation); the mirror
  *    join and global scalar act on grid-sized relations.
  */
object Mining {

  private val Dim = 64

  /** Forward/backward neighborhood size for the margin denominator. */
  private val MarginK = 4

  /** Probe side: even vec_ids below this bound. */
  private val ProbeMax = 40L

  /** Candidates kept per probe (top forward neighbors). */
  private val CandPerProbe = 2

  /** Acceptance threshold: margin ≥ 1.06 (e6). */
  private val AcceptE6 = 1060000L

  /** Top bigram continuations emitted per (lang, prefix). */
  private val KnTopK = 3

  private def emb(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    s.read.parquet(s"$dir/embeddings.parquet")
  }

  private def docs(s: SparkSession, dir: String): DataFrame = {
    graft.functions.TextHashFunctions.register(s)
    s.read.parquet(s"$dir/documents.parquet")
  }

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(s, dir, name)

  /** cos(a, b) in ppm, floor semantics — the Similarity rendering. */
  private def cosPpm(a: String, an2: String, b: String, bn2: String): String =
    s"CAST(floor(vec_dot($a, $b) / (sqrt($an2) * sqrt($bn2)) * 1000000) AS BIGINT)"

  private def cosPpmDuck(a: String, b: String): String =
    s"CAST(floor(${dotDuck(a, b, Dim)} / (sqrt(${norm2Duck(a, Dim)}) * " +
      s"sqrt(${norm2Duck(b, Dim)})) * 1000000) AS BIGINT)"

  /** Exact e8-scaled revenue per lineitem row (the shared revenue idiom). */
  private val RevE8 =
    "CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * " +
      "(CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4))) AS DECIMAL(28,8)) * " +
      "CAST(100000000 AS DECIMAL(9,0)) AS BIGINT)"

  private val RevE8Duck =
    "CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * " +
      "(CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4))) AS DECIMAL(28,8)) * " +
      "CAST(100000000 AS DECIMAL(9,0)) AS BIGINT)"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "embedding_bitext_mining" -> ((s, d) => {
      val e = emb(s, d)
        .selectExpr("vec_id", "embedding AS v", "vec_norm2(embedding) AS n2")
      val src = e.filter(expr("vec_id % 2 = 0"))
      val tgt = e.filter(expr("vec_id % 2 = 1"))
      val probes = src.filter(col("vec_id") < ProbeMax)
        .selectExpr("vec_id AS src_id", "v AS pv", "n2 AS pn2")
      // forward: probes × target corpus, one codegen'd scan
      val fwd = tgt.crossJoin(broadcast(probes))
        .selectExpr("src_id", "vec_id AS tgt_id",
          s"${cosPpm("pv", "pn2", "v", "n2")} AS cos_ppm")
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("src_id"))
            .orderBy(desc("cos_ppm"), asc("tgt_id"))))
        .filter(col("rk") <= MarginK)
        .transform(CacheScope.persist)
      val sumFwd = fwd.groupBy(col("src_id"))
        .agg(sum(col("cos_ppm")).as("sum_fwd"))
      val cands = fwd.filter(col("rk") <= CandPerProbe)
        .select(col("src_id"), col("tgt_id"), col("cos_ppm"), col("rk"))
      // backward: candidate targets (≤ 2·probes) × source half
      val candVecs = cands.select(col("tgt_id")).distinct()
        .join(tgt, col("tgt_id") === col("vec_id"))
        .selectExpr("tgt_id", "v AS cv", "n2 AS cn2")
      val sumBwd = src.crossJoin(broadcast(candVecs))
        .selectExpr("tgt_id", "vec_id AS back_id",
          s"${cosPpm("cv", "cn2", "v", "n2")} AS bcos")
        .withColumn("brk", row_number().over(
          Window.partitionBy(col("tgt_id"))
            .orderBy(desc("bcos"), asc("back_id"))))
        .filter(col("brk") <= MarginK)
        .groupBy(col("tgt_id"))
        .agg(sum(col("bcos")).as("sum_bwd"))
      cands
        .join(broadcast(sumFwd), Seq("src_id"))
        .join(broadcast(sumBwd), Seq("tgt_id"))
        .selectExpr("src_id", "tgt_id", "rk", "cos_ppm",
          // 2k·cos/(Σfwd + Σbwd); denominator can be ≤ 0 on an
          // adversarial corpus (negative neighborhoods) → NULL, not ÷0
          s"""CASE WHEN sum_fwd + sum_bwd <= 0 THEN CAST(NULL AS BIGINT)
              ELSE (cos_ppm * ${2L * MarginK} * 1000000) div (sum_fwd + sum_bwd)
              END AS margin_e6""")
        .selectExpr("src_id", "tgt_id", "CAST(rk AS BIGINT) AS rk", "cos_ppm",
          "margin_e6",
          s"CAST(CASE WHEN margin_e6 >= $AcceptE6 THEN 1 ELSE 0 END AS BIGINT) AS accepted")
        .orderBy(asc("src_id"), asc("rk"))
    }),

    "text_kn_bigram_prob" -> ((s, d) => {
      val wh = docs(s, d)
        .selectExpr("lang", s"${wordHashesSpark("text")} AS wh")
        .filter(expr("size(wh) >= 2"))
      val bi = wh
        .selectExpr("lang",
          "explode(transform(sequence(2, size(wh)), i -> struct(element_at(wh, i - 1) AS a, element_at(wh, i) AS b))) AS p")
        .groupBy(col("lang"), expr("p.a").as("a"), expr("p.b").as("b"))
        .agg(count(lit(1)).as("c12"))
        .transform(CacheScope.persist)
      val prefix = bi.groupBy(col("lang"), col("a"))
        .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1fwd"))
      val cont = bi.groupBy(col("lang"), col("b"))
        .agg(count(lit(1)).as("cont2"))
      val ndd = bi.groupBy(col("lang")).agg(count(lit(1)).as("ndd"))
      bi
        .join(prefix, Seq("lang", "a"))
        .join(cont, Seq("lang", "b"))
        .join(broadcast(ndd), Seq("lang"))
        .selectExpr("lang", "a", "b", "c12",
          """CAST((CAST(1000000 AS DECIMAL(38,0)) *
               ((CAST(4 AS DECIMAL(38,0)) * c12 - 3) * ndd
                + CAST(3 AS DECIMAL(38,0)) * n1fwd * cont2))
             div (CAST(4 AS DECIMAL(38,0)) * c1 * ndd) AS BIGINT) AS pkn_e6""")
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("lang"), col("a"))
            .orderBy(desc("pkn_e6"), asc("b"))))
        .filter(col("rk") <= KnTopK)
        .selectExpr("lang", "a", "b", "c12", "pkn_e6", "CAST(rk AS BIGINT) AS rk")
        .orderBy(asc("lang"), asc("a"), asc("rk"))
    }),

    "graph_trade_reciprocity" -> ((s, d) => {
      val custNation = t(s, d, "customer")
        .join(t(s, d, "nation"), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("src_nation"))
      val suppNation = t(s, d, "supplier")
        .join(t(s, d, "nation"), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("dst_nation"))
      val flows = t(s, d, "lineitem")
        // shuffle-hash: sort-merge would SORT both fact relations (1.6 GB
        // spilled at the 100× probe); hashing the orders side per
        // partition never sorts either
        .join(t(s, d, "orders").hint("shuffle_hash"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(custNation), col("o_custkey") === col("c_custkey"))
        .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
        .selectExpr("src_nation", "dst_nation", s"$RevE8 AS r8")
        .groupBy(col("src_nation"), col("dst_nation"))
        // corpus-sized e8 sums: DECIMAL(38,0) internally (the r11 10×
        // overflow class), digit-string emission (round-12 policy)
        .agg(sum(col("r8").cast("decimal(38,0)")).as("flow_e8"))
        .transform(CacheScope.persist)
      val mirror = flows.select(
        col("src_nation").as("dst_nation"), col("dst_nation").as("src_nation"),
        col("flow_e8").as("back_e8"))
      val paired = flows.join(mirror, Seq("src_nation", "dst_nation"), "left")
        .selectExpr("src_nation", "dst_nation", "flow_e8",
          "CASE WHEN back_e8 IS NULL THEN CAST(0 AS DECIMAL(38,0)) " +
            "WHEN back_e8 < flow_e8 THEN back_e8 ELSE flow_e8 END AS mutual_e8")
        .transform(CacheScope.persist)
      val global = paired.agg(
        sum(col("flow_e8")).as("t_flow"), sum(col("mutual_e8")).as("t_mutual"))
      paired.crossJoin(broadcast(global))
        .selectExpr("src_nation", "dst_nation",
          "CAST(flow_e8 AS STRING) AS flow_e8",
          "CAST(mutual_e8 AS STRING) AS mutual_e8",
          "CAST((mutual_e8 * 10000) div flow_e8 AS BIGINT) AS pair_recip_bp",
          "CAST((t_mutual * 10000) div t_flow AS BIGINT) AS global_recip_bp")
        .orderBy(asc("src_nation"), asc("dst_nation"))
    }),

    // Joint census of the Gopher quality-gate decision × exact-redundancy
    // status per language — the curation diagnostic every pipeline wants
    // before wiring gate→dedup→sample: are the docs dedup would drop
    // disproportionately the ones the gate would keep? A doc is
    // `redundant` when its exact content group (md5, the dedup_exact
    // grouping) has >1 member and the doc is not the keeper (min doc_id —
    // the dedup_keep_best convention). The gate bit is the SHARED
    // qualityOk rendering (one decision expression per engine, same as
    // training_data_factory). Scale: one content-hash census (the
    // dedup_exact shuffle) + a grid-sized share attach; output ≤ langs×4.
    "curation_gate_overlap" -> ((s, d) => {
      val perDoc = docs(s, d)
        .selectExpr("lang", "doc_id", "md5(text) AS h",
          s"CAST(CASE WHEN ${TextAnalysis.qualityOkSpark(tokensSpark("text"))} " +
            "THEN 1 ELSE 0 END AS BIGINT) AS gate_pass")
      val groups = perDoc.groupBy(col("h"))
        .agg(count(lit(1)).as("grp_n"), min(col("doc_id")).as("keeper"))
      val grid = perDoc.join(groups, Seq("h"))
        .selectExpr("lang", "gate_pass",
          "CAST(CASE WHEN grp_n > 1 AND doc_id != keeper THEN 1 ELSE 0 END AS BIGINT) AS redundant")
        .groupBy(col("lang"), col("gate_pass"), col("redundant"))
        .agg(count(lit(1)).as("n_docs"))
        .transform(CacheScope.persist)
      val tot = grid.groupBy(col("lang")).agg(sum(col("n_docs")).as("lang_docs"))
      grid.join(broadcast(tot), Seq("lang"))
        .selectExpr("lang", "gate_pass", "redundant", "n_docs",
          "(n_docs * 10000) div lang_docs AS share_bp")
        .orderBy(asc("lang"), asc("gate_pass"), asc("redundant"))
    }),

    // Cross-detector anomaly agreement (the dedup_channel_agreement
    // discipline applied to the time-series detectors): per event type,
    // the pairwise Jaccard of the day sets flagged by the median/MAD
    // detector, the EWMA detector, and the top-3 spike census — the
    // diagnostic that tells an alerting pipeline whether its detectors
    // vote together (redundant) or disjointly (complementary / one is
    // broken). Composes the three queries VERBATIM in both engines
    // (derived tables in the oracle), so the census can never drift from
    // the detectors it summarizes. Scale: each detector is day-grid-
    // sized; the agreement join runs on flagged-day sets.
    "events_anomaly_agreement" -> ((s, d) => {
      val mad = Timeseries.queries("events_daily_anomaly")(s, d)
        .filter(col("is_anomaly") === 1)
        .select(col("event_type"), col("day"), lit("mad").as("det"))
      val ew = Timeseries.queries("events_ewma_anomaly")(s, d)
        .filter(col("is_anomaly") === 1)
        .select(col("event_type"), col("day"), lit("ewma").as("det"))
      val sp = Temporal.queries("events_spike_days")(s, d)
        .select(col("event_type"), col("day"), lit("spike").as("det"))
      val all = mad.union(ew).union(sp).transform(CacheScope.persist)
      val counts = all.groupBy(col("event_type"), col("det"))
        .agg(count(lit(1)).as("n"))
      val inter = all.alias("a")
        .join(all.alias("b"),
          col("a.event_type") === col("b.event_type") &&
            col("a.day") === col("b.day") && col("a.det") < col("b.det"))
        .groupBy(col("a.event_type").as("event_type"),
          col("a.det").as("det_a"), col("b.det").as("det_b"))
        .agg(count(lit(1)).as("n_both"))
      val pairDf = s.createDataFrame(
        Seq(("ewma", "mad"), ("ewma", "spike"), ("mad", "spike")))
        .toDF("det_a", "det_b")
      all.select(col("event_type")).distinct()
        .crossJoin(broadcast(pairDf))
        .join(counts.select(col("event_type"), col("det").as("det_a"),
          col("n").as("raw_a")), Seq("event_type", "det_a"), "left")
        .join(counts.select(col("event_type"), col("det").as("det_b"),
          col("n").as("raw_b")), Seq("event_type", "det_b"), "left")
        .join(inter, Seq("event_type", "det_a", "det_b"), "left")
        .selectExpr("event_type", "det_a", "det_b",
          "ifnull(raw_a, 0L) AS n_a", "ifnull(raw_b, 0L) AS n_b",
          "ifnull(n_both, 0L) AS n_both")
        .selectExpr("event_type", "det_a", "det_b", "n_a", "n_b", "n_both",
          """CASE WHEN n_a + n_b - n_both = 0 THEN CAST(NULL AS BIGINT)
             ELSE (n_both * 10000) div (n_a + n_b - n_both) END AS jaccard_bp""")
        .orderBy(asc("event_type"), asc("det_a"), asc("det_b"))
    }),

    // Facility-location / coverage-greedy subset selection: from the
    // CovPool longest documents, greedily pick CovPicks docs maximizing
    // NEW vocabulary covered at each step (gain = |tokens(doc) −
    // covered|, ties to smallest doc_id) — the submodular
    // diverse-subset-selection shape behind coreset construction and
    // few-shot exemplar picking. The greedy state is pool-sized
    // (CovPool token sets — corpus-INDEPENDENT), so it runs driver-side
    // on a bounded collect (the MMR/codebook discipline); the
    // corpus-scale work is the candidate scan + the pruned token pass.
    // The oracle unrolls the same greedy as CTEs from the same loop
    // bounds. Emits (pick, doc_id, gain, covered) — the coverage curve
    // of the selection itself.
    "sample_coverage_greedy" -> ((s, d) => {
      val cand = docs(s, d)
        .withColumn("rk", row_number().over(
          Window.orderBy(desc("n_chars"), asc("doc_id"))))
        .filter(col("rk") <= CovPool)
        .select(col("doc_id"))
      val ct = docs(s, d)
        .join(broadcast(cand), Seq("doc_id"))
        .selectExpr("doc_id", s"explode(array_distinct(${tokensSpark("text")})) AS term")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      val byDoc = ct.groupBy(_._1).map { case (id, v) => id -> v.map(_._2).toSet }
      var covered = Set.empty[String]
      var remaining = byDoc.keySet
      // a candidate pool smaller than CovPicks yields a shorter pick list
      // (the unrolled oracle's empty p_k behavior) — never an empty minBy
      val out = (1 to CovPicks).iterator.takeWhile(_ => remaining.nonEmpty).map { k =>
        val (pick, gain) = remaining.toSeq
          .map(id => (id, (byDoc(id) -- covered).size.toLong))
          .minBy { case (id, g) => (-g, id) }
        covered ++= byDoc(pick)
        remaining -= pick
        (k.toLong, pick, gain, covered.size.toLong)
      }.toSeq
      s.createDataFrame(out).toDF("pick", "doc_id", "gain", "covered")
    }),

    // Cumulative token-mass coverage of the top-k vocabulary per
    // language, k ∈ {1,2,4,8,16,32} — the Zipf-curve rendering a
    // tokenizer budget decision actually reads ("how much of the corpus
    // do 16 types cover?"). One map-side census; ranking and prefix
    // sums run on the vocabulary; output is langs×6.
    "text_coverage_curve" -> ((s, d) => {
      val ks = Seq(1L, 2L, 4L, 8L, 16L, 32L)
      val freq = docs(s, d)
        .selectExpr("lang", s"explode(${tokensSpark("text")}) AS tok")
        .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("f"))
        .transform(CacheScope.persist)
      val tot = freq.groupBy(col("lang")).agg(sum(col("f")).as("total"))
      val ranked = freq.withColumn("rk", row_number().over(
          Window.partitionBy(col("lang")).orderBy(desc("f"), asc("tok"))))
        .filter(col("rk") <= 32)
        .withColumn("cum", sum(col("f")).over(
          Window.partitionBy(col("lang")).orderBy(asc("rk"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      ranked.filter(col("rk").isin(ks: _*))
        .join(broadcast(tot), Seq("lang"))
        .selectExpr("lang", "CAST(rk AS BIGINT) AS k", "cum AS top_k_tokens",
          "(cum * 10000) div total AS coverage_bp")
        .orderBy(asc("lang"), asc("k"))
    }),

    // Herfindahl–Hirschman revenue-concentration index per supplier
    // nation: HHI = Σ share² over each nation's suppliers (shares in bp,
    // HHI re-normalized to bp: Σ share_bp² div 10⁴ ∈ [0, 10⁴]) — the
    // standard concentration gauge (10⁴ = monopoly, → 0 = atomized), the
    // supply-chain-risk twin of part_revenue_concentration's Lorenz
    // bins. Exact integers: e8 revenue on DECIMAL(38,0) (corpus-sized
    // sums), shares truncating bp, HHI from bp shares. Scale: one
    // corpus pass to a supplier-sized census (supplier dim broadcast);
    // nation rollup is grid-sized.
    "supplier_hhi" -> ((s, d) => {
      val suppNation = t(s, d, "supplier")
        .join(t(s, d, "nation"), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("nation"))
      val perSupp = t(s, d, "lineitem")
        .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
        .selectExpr("nation", "l_suppkey", s"$RevE8 AS r8")
        .groupBy(col("nation"), col("l_suppkey"))
        .agg(sum(col("r8").cast("decimal(38,0)")).as("rev_e8"))
        .transform(CacheScope.persist)
      perSupp
        .groupBy(col("nation"))
        .agg(count(lit(1)).as("n_suppliers"),
          sum(col("rev_e8")).as("nat_rev"))
        .join(perSupp, Seq("nation"))
        .selectExpr("nation", "n_suppliers",
          "CAST((rev_e8 * 10000) div nat_rev AS BIGINT) AS share_bp")
        .groupBy(col("nation"), col("n_suppliers"))
        .agg(max(col("share_bp")).as("top_share_bp"),
          sum(expr("share_bp * share_bp")).as("sq"))
        .selectExpr("nation", "n_suppliers", "top_share_bp",
          "sq div 10000 AS hhi_bp")
        .orderBy(asc("nation"))
    }),

    // Church–Gale token burstiness per language: burstiness = cf/df (mean
    // occurrences per CONTAINING doc, in bp) — a bursty token concentrates
    // in few docs (boilerplate, navigation chrome, code); a well-behaved
    // content word tracks its document frequency. The standard cheap
    // boilerplate detector at corpus scale. df floor of 5 kills hapax
    // noise; top-10 per language by (burstiness desc, token asc). Scale:
    // TWO map-side-combined censuses (occurrences; per-doc-distinct for
    // df) joined at vocabulary size; rank via WindowGroupLimit.
    "text_token_burstiness" -> ((s, d) => {
      val toks = docs(s, d)
        .selectExpr("lang", "doc_id", s"explode(${tokensSpark("text")}) AS tok")
        .transform(CacheScope.persist)
      val cf = toks.groupBy(col("lang"), col("tok"))
        .agg(count(lit(1)).as("cf"))
      val df = toks.select(col("lang"), col("doc_id"), col("tok")).distinct()
        .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("df"))
      cf.join(df, Seq("lang", "tok"))
        .filter(col("df") >= 5)
        .selectExpr("lang", "tok", "cf", "df", "(cf * 10000) div df AS burst_bp")
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("lang"))
            .orderBy(desc("burst_bp"), asc("tok"))))
        .filter(col("rk") <= 10)
        .selectExpr("lang", "tok", "cf", "df", "burst_bp", "CAST(rk AS BIGINT) AS rk")
        .orderBy(asc("lang"), asc("rk"))
    })
  )

  /** Coverage-greedy pool size and picks (shared by query + oracle). */
  private val CovPool = 40
  private val CovPicks = 8

  def oracles: Map[String, String] = Map(

    "sample_coverage_greedy" -> {
      val base =
        s"WITH cand AS MATERIALIZED (SELECT doc_id FROM (SELECT doc_id, row_number() OVER " +
          "(ORDER BY n_chars DESC, doc_id) AS rk FROM documents) _ " +
          s"WHERE rk <= $CovPool), " +
          "ct AS MATERIALIZED (SELECT DISTINCT doc_id, term FROM " +
          s"(SELECT d.doc_id, unnest(${tokensDuck("d.text")}) AS term " +
          "FROM documents d JOIN cand ON cand.doc_id = d.doc_id) _t), " +
          "g1 AS MATERIALIZED (SELECT doc_id, count(*)::BIGINT AS gain FROM ct GROUP BY doc_id), " +
          "p1 AS MATERIALIZED (SELECT doc_id, gain, CAST(1 AS BIGINT) AS pick, gain AS covered FROM " +
          "(SELECT *, row_number() OVER (ORDER BY gain DESC, doc_id) AS prk FROM g1) _ " +
          "WHERE prk = 1), " +
          "sel1 AS MATERIALIZED (SELECT doc_id FROM p1), " +
          "cov1 AS MATERIALIZED (SELECT DISTINCT term FROM ct JOIN sel1 USING (doc_id))"
      val steps = (2 to CovPicks).map { k =>
        s"rem$k AS MATERIALIZED (SELECT c.doc_id FROM cand c LEFT JOIN sel${k - 1} s " +
          "ON s.doc_id = c.doc_id WHERE s.doc_id IS NULL), " +
          s"g$k AS MATERIALIZED (SELECT r.doc_id, count(ct.term) FILTER (WHERE cv.term IS NULL)::BIGINT AS gain " +
          s"FROM rem$k r JOIN ct ON ct.doc_id = r.doc_id " +
          s"LEFT JOIN cov${k - 1} cv ON cv.term = ct.term GROUP BY r.doc_id), " +
          s"p$k AS MATERIALIZED (SELECT doc_id, gain, CAST($k AS BIGINT) AS pick, " +
          s"(SELECT covered FROM p${k - 1}) + gain AS covered FROM " +
          s"(SELECT *, row_number() OVER (ORDER BY gain DESC, doc_id) AS prk FROM g$k) _ " +
          "WHERE prk = 1), " +
          s"sel$k AS MATERIALIZED (SELECT doc_id FROM sel${k - 1} UNION ALL SELECT doc_id FROM p$k), " +
          s"cov$k AS MATERIALIZED (SELECT DISTINCT term FROM ct JOIN sel$k USING (doc_id))"
      }.mkString(", ")
      val union = (1 to CovPicks)
        .map(k => s"SELECT pick, doc_id, gain, covered FROM p$k")
        .mkString(" UNION ALL ")
      s"$base, $steps SELECT * FROM ($union) _u ORDER BY pick"
    },

    "embedding_bitext_mining" -> {
      val cos = cosPpmDuck("p.embedding", "t.embedding")
      val bcos = cosPpmDuck("c.embedding", "u.embedding")
      s"WITH fwd AS (SELECT p.vec_id AS src_id, t.vec_id AS tgt_id, $cos AS cos_ppm, " +
        s"row_number() OVER (PARTITION BY p.vec_id ORDER BY $cos DESC, t.vec_id) AS rk " +
        s"FROM embeddings p, embeddings t WHERE p.vec_id % 2 = 0 AND p.vec_id < $ProbeMax " +
        "AND t.vec_id % 2 = 1), " +
        s"topf AS (SELECT * FROM fwd WHERE rk <= $MarginK), " +
        "sf AS (SELECT src_id, CAST(sum(cos_ppm) AS BIGINT) AS sum_fwd FROM topf GROUP BY src_id), " +
        s"cand AS (SELECT src_id, tgt_id, cos_ppm, rk FROM topf WHERE rk <= $CandPerProbe), " +
        "cv AS (SELECT DISTINCT tgt_id FROM cand), " +
        s"bwd AS (SELECT c.vec_id AS tgt_id, u.vec_id AS back_id, $bcos AS bcos, " +
        s"row_number() OVER (PARTITION BY c.vec_id ORDER BY $bcos DESC, u.vec_id) AS brk " +
        "FROM cv JOIN embeddings c ON c.vec_id = cv.tgt_id " +
        "CROSS JOIN embeddings u WHERE u.vec_id % 2 = 0), " +
        s"sb AS (SELECT tgt_id, CAST(sum(bcos) AS BIGINT) AS sum_bwd FROM bwd WHERE brk <= $MarginK GROUP BY tgt_id), " +
        "m AS (SELECT src_id, tgt_id, rk, cos_ppm, " +
        "CASE WHEN sum_fwd + sum_bwd <= 0 THEN CAST(NULL AS BIGINT) " +
        s"ELSE CAST((CAST(cos_ppm AS BIGINT) * ${2L * MarginK} * 1000000) // (sum_fwd + sum_bwd) AS BIGINT) END AS margin_e6 " +
        "FROM cand JOIN sf USING (src_id) JOIN sb USING (tgt_id)) " +
        "SELECT src_id, tgt_id, CAST(rk AS BIGINT) AS rk, cos_ppm, margin_e6, " +
        s"CAST(CASE WHEN margin_e6 >= $AcceptE6 THEN 1 ELSE 0 END AS BIGINT) AS accepted " +
        "FROM m ORDER BY src_id, rk"
    },

    "text_kn_bigram_prob" ->
      (s"WITH wh AS (SELECT lang, ${wordHashesDuck(tokensDuck("text"))} AS wh FROM documents), " +
        "nz AS (SELECT * FROM wh WHERE len(wh) >= 2), " +
        "bi0 AS (SELECT lang, unnest(list_transform(range(2, len(wh) + 1), " +
        "i -> {'a': list_extract(wh, i - 1), 'b': list_extract(wh, i)})) AS p FROM nz), " +
        "bi AS (SELECT lang, p.a AS a, p.b AS b, count(*)::BIGINT AS c12 FROM bi0 GROUP BY 1, 2, 3), " +
        "pf AS (SELECT lang, a, CAST(sum(c12) AS BIGINT) AS c1, count(*)::BIGINT AS n1fwd FROM bi GROUP BY 1, 2), " +
        "ct AS (SELECT lang, b, count(*)::BIGINT AS cont2 FROM bi GROUP BY 1, 2), " +
        "nd AS (SELECT lang, count(*)::BIGINT AS ndd FROM bi GROUP BY 1), " +
        "p AS (SELECT lang, a, b, c12, " +
        "CAST((CAST(1000000 AS HUGEINT) * ((CAST(4 AS HUGEINT) * c12 - 3) * ndd " +
        "+ CAST(3 AS HUGEINT) * n1fwd * cont2)) " +
        "// (CAST(4 AS HUGEINT) * c1 * ndd) AS BIGINT) AS pkn_e6 " +
        "FROM bi JOIN pf USING (lang, a) JOIN ct USING (lang, b) JOIN nd USING (lang)), " +
        "r AS (SELECT *, row_number() OVER (PARTITION BY lang, a ORDER BY pkn_e6 DESC, b) AS rk FROM p) " +
        s"SELECT lang, a, b, c12, pkn_e6, CAST(rk AS BIGINT) AS rk FROM r WHERE rk <= $KnTopK " +
        "ORDER BY lang, a, rk"),

    "graph_trade_reciprocity" ->
      (s"WITH cn AS (SELECT c_custkey, n_name AS src_nation FROM customer " +
        "JOIN nation ON c_nationkey = n_nationkey), " +
        "sn AS (SELECT s_suppkey, n_name AS dst_nation FROM supplier " +
        "JOIN nation ON s_nationkey = n_nationkey), " +
        s"f AS (SELECT src_nation, dst_nation, sum(CAST($RevE8Duck AS HUGEINT)) AS flow_e8 " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN cn ON o_custkey = c_custkey JOIN sn ON l_suppkey = s_suppkey " +
        "GROUP BY src_nation, dst_nation), " +
        "p AS (SELECT a.src_nation, a.dst_nation, a.flow_e8, " +
        "CASE WHEN b.flow_e8 IS NULL THEN CAST(0 AS HUGEINT) " +
        "WHEN b.flow_e8 < a.flow_e8 THEN b.flow_e8 ELSE a.flow_e8 END AS mutual_e8 " +
        "FROM f a LEFT JOIN f b ON a.src_nation = b.dst_nation AND a.dst_nation = b.src_nation), " +
        "g AS (SELECT CAST(sum(flow_e8) AS HUGEINT) AS t_flow, " +
        "CAST(sum(mutual_e8) AS HUGEINT) AS t_mutual FROM p) " +
        "SELECT src_nation, dst_nation, " +
        "CAST(flow_e8 AS VARCHAR) AS flow_e8, CAST(mutual_e8 AS VARCHAR) AS mutual_e8, " +
        "CAST((mutual_e8 * 10000) // flow_e8 AS BIGINT) AS pair_recip_bp, " +
        "CAST((t_mutual * 10000) // t_flow AS BIGINT) AS global_recip_bp " +
        "FROM p CROSS JOIN g ORDER BY src_nation, dst_nation"),

    "events_anomaly_agreement" -> {
      val madO = Timeseries.oracles("events_daily_anomaly")
      val ewO = Timeseries.oracles("events_ewma_anomaly")
      val spO = Temporal.oracles("events_spike_days")
      s"WITH md AS (SELECT event_type, day FROM ($madO) _m WHERE is_anomaly = 1), " +
        s"ew AS (SELECT event_type, day FROM ($ewO) _e WHERE is_anomaly = 1), " +
        s"sp AS (SELECT event_type, day FROM ($spO) _s), " +
        "al AS (SELECT event_type, day, 'mad' AS det FROM md " +
        "UNION ALL SELECT event_type, day, 'ewma' FROM ew " +
        "UNION ALL SELECT event_type, day, 'spike' FROM sp), " +
        "cn AS (SELECT event_type, det, count(*)::BIGINT AS n FROM al GROUP BY 1, 2), " +
        "ins AS (SELECT a.event_type, a.det AS det_a, b.det AS det_b, count(*)::BIGINT AS n_both " +
        "FROM al a JOIN al b ON a.event_type = b.event_type AND a.day = b.day " +
        "AND a.det < b.det GROUP BY 1, 2, 3), " +
        "pr(det_a, det_b) AS (VALUES ('ewma', 'mad'), ('ewma', 'spike'), ('mad', 'spike')), " +
        "ty AS (SELECT DISTINCT event_type FROM al), " +
        "g AS (SELECT ty.event_type, pr.det_a, pr.det_b, " +
        "COALESCE(ca.n, CAST(0 AS BIGINT)) AS n_a, " +
        "COALESCE(cb.n, CAST(0 AS BIGINT)) AS n_b, " +
        "COALESCE(ins.n_both, CAST(0 AS BIGINT)) AS n_both " +
        "FROM ty CROSS JOIN pr " +
        "LEFT JOIN cn ca ON ca.event_type = ty.event_type AND ca.det = pr.det_a " +
        "LEFT JOIN cn cb ON cb.event_type = ty.event_type AND cb.det = pr.det_b " +
        "LEFT JOIN ins ON ins.event_type = ty.event_type " +
        "AND ins.det_a = pr.det_a AND ins.det_b = pr.det_b) " +
        "SELECT event_type, det_a, det_b, n_a, n_b, n_both, " +
        "CASE WHEN n_a + n_b - n_both = 0 THEN CAST(NULL AS BIGINT) " +
        "ELSE (n_both * 10000) // (n_a + n_b - n_both) END AS jaccard_bp " +
        "FROM g ORDER BY event_type, det_a, det_b"
    },

    "text_coverage_curve" ->
      (s"WITH f AS (SELECT lang, tok, count(*)::BIGINT AS f FROM " +
        s"(SELECT lang, unnest(${tokensDuck("text")}) AS tok FROM documents) _ GROUP BY 1, 2), " +
        "tot AS (SELECT lang, CAST(sum(f) AS BIGINT) AS total FROM f GROUP BY lang), " +
        "r AS (SELECT lang, f, row_number() OVER (PARTITION BY lang ORDER BY f DESC, tok) AS rk FROM f), " +
        "c AS (SELECT lang, rk, CAST(sum(f) OVER (PARTITION BY lang ORDER BY rk) AS BIGINT) AS cum " +
        "FROM r WHERE rk <= 32) " +
        "SELECT lang, CAST(rk AS BIGINT) AS k, cum AS top_k_tokens, " +
        "(cum * 10000) // total AS coverage_bp " +
        "FROM c JOIN tot USING (lang) WHERE rk IN (1, 2, 4, 8, 16, 32) " +
        "ORDER BY lang, k"),

    "supplier_hhi" ->
      (s"WITH sn AS (SELECT s_suppkey, n_name AS nation FROM supplier " +
        "JOIN nation ON s_nationkey = n_nationkey), " +
        s"ps AS (SELECT nation, l_suppkey, sum(CAST($RevE8Duck AS HUGEINT)) AS rev_e8 " +
        "FROM lineitem JOIN sn ON l_suppkey = s_suppkey GROUP BY nation, l_suppkey), " +
        "nt AS (SELECT nation, count(*)::BIGINT AS n_suppliers, " +
        "CAST(sum(rev_e8) AS HUGEINT) AS nat_rev FROM ps GROUP BY nation), " +
        "sh AS (SELECT ps.nation, nt.n_suppliers, " +
        "CAST((ps.rev_e8 * 10000) // nt.nat_rev AS BIGINT) AS share_bp " +
        "FROM ps JOIN nt ON nt.nation = ps.nation) " +
        "SELECT nation, n_suppliers, CAST(max(share_bp) AS BIGINT) AS top_share_bp, " +
        "CAST(sum(share_bp * share_bp) AS BIGINT) // 10000 AS hhi_bp " +
        "FROM sh GROUP BY nation, n_suppliers ORDER BY nation"),

    "curation_gate_overlap" ->
      (s"WITH pd AS (SELECT lang, doc_id, md5(text) AS h, " +
        s"CAST(CASE WHEN ${TextAnalysis.qualityOkDuck(tokensDuck("text"))} " +
        "THEN 1 ELSE 0 END AS BIGINT) AS gate_pass FROM documents), " +
        "g AS (SELECT h, count(*) AS grp_n, min(doc_id) AS keeper FROM pd GROUP BY h), " +
        "x AS (SELECT lang, gate_pass, " +
        "CAST(CASE WHEN grp_n > 1 AND doc_id != keeper THEN 1 ELSE 0 END AS BIGINT) AS redundant " +
        "FROM pd JOIN g USING (h)), " +
        "grid AS (SELECT lang, gate_pass, redundant, count(*)::BIGINT AS n_docs " +
        "FROM x GROUP BY 1, 2, 3), " +
        "t AS (SELECT lang, CAST(sum(n_docs) AS BIGINT) AS lang_docs FROM grid GROUP BY lang) " +
        "SELECT lang, gate_pass, redundant, n_docs, " +
        "(n_docs * 10000) // lang_docs AS share_bp " +
        "FROM grid JOIN t USING (lang) ORDER BY lang, gate_pass, redundant"),

    "text_token_burstiness" ->
      (s"WITH tk AS (SELECT lang, doc_id, unnest(${tokensDuck("text")}) AS tok FROM documents), " +
        "cf AS (SELECT lang, tok, count(*)::BIGINT AS cf FROM tk GROUP BY 1, 2), " +
        "df AS (SELECT lang, tok, count(*)::BIGINT AS df FROM " +
        "(SELECT DISTINCT lang, doc_id, tok FROM tk) _ GROUP BY 1, 2), " +
        "b AS (SELECT lang, tok, cf, df, (cf * 10000) // df AS burst_bp " +
        "FROM cf JOIN df USING (lang, tok) WHERE df >= 5), " +
        "r AS (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY burst_bp DESC, tok) AS rk FROM b) " +
        "SELECT lang, tok, cf, df, burst_bp, CAST(rk AS BIGINT) AS rk " +
        "FROM r WHERE rk <= 10 ORDER BY lang, rk")
  )
}
