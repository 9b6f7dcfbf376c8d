package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over the co-purchase part graph — degree structure,
  * degree-oriented triangle census, and fixed-iteration integer PageRank.
  * Reference scope: factstore's per-subject histories are routinely
  * projected into entity graphs downstream (who-bought-with-what,
  * who-follows-whom); the engine ships the three canonical structural
  * queries over such a projection as first-class operators.
  *
  * The graph: nodes are parts, an edge connects two parts co-purchased in
  * ≥2 distinct orders (same census as `Market.basket_pairs`, kept in full
  * rather than top-k). Built ONCE per (session, corpus) and eagerly
  * localCheckpointed — the offline-index discipline of the ANN codebooks
  * and the verified-pair cache, so the three queries share one build.
  *
  * Scale designs (100 TB):
  *
  *  - '''edge build''': join-free — per-order item sets by one map-side-
  *    combined groupBy, pairs by a bounded in-row double explode (cap²,
  *    cap=64), pair census by a second combine-friendly groupBy. The edge
  *    set is support-thresholded, so it grows with genuine co-purchase
  *    structure, not with corpus size.
  *  - '''triangles''': degree-ordered orientation — every edge points from
  *    its (degree, id)-smaller endpoint, making the orientation acyclic, so
  *    each triangle has exactly ONE vertex with two out-edges and is
  *    counted once. Wedge generation fans out by OUT-degree, which
  *    orientation bounds by O(√|E|) on any graph (the arboricity bound),
  *    versus hub-degree² for the naive plan. The closing-edge probe is an
  *    equi-join on the canonical edge key.
  *  - '''k-core''': unrolled peel rounds (degree census → keep ≥ k →
  *    induce), each a node-sized aggregate + two semi-joins on the
  *    SHRINKING edge relation — cost decreases per round, and the round
  *    trajectory is itself the declared (oracle-checked) result.
  *  - '''jaccard links''': common-neighbor Jaccard over non-adjacent
  *    2-hop pairs (link prediction); wedge enumeration capped at
  *    deg ≤ WedgeCap centers, so the pair stream is bounded per node.
  *  - '''pagerank''': ranks are a NODE-sized relation; each of the 5
  *    iterations is one edge⨝rank hash join (partitioned by source) + one
  *    map-side-combined groupBy(dst), with the adjacency (+ out-degree)
  *    persisted once and ranks eagerly localCheckpointed per round to keep
  *    lineage flat — the `dedup_clusters` loop shape. Integer e12-scale
  *    arithmetic (`rank div deg`, `(85·Σ) div 100`) is exact and
  *    engine-agnostic; no floats anywhere.
  *
  * Determinism: integer arithmetic only, total output order with unique-id
  * tiebreaks, shares in exact basis points.
  */
object Graph {

  /** In-row pair-generation cap, same bound as Market.ItemCap. */
  private val ItemCap = 64

  /** PageRank scale (1e12) and 5 fixed iterations at damping 85/100. */
  private val Scale = 1000000000000L
  private val Iters = 5

  /** k-core threshold and unrolled peel rounds. Peeling halves the
    * sub-threshold fringe geometrically on census-built graphs; KCoreSpec
    * pins that 6 rounds reach the fixpoint on the testdata, and the round
    * trajectory itself is the declared result, so an unconverged corpus
    * yields a well-defined (and oracle-identical) answer rather than a
    * wrong one. */
  private val CoreK = 3
  private val PeelRounds = 6

  /** Wedge-center degree cap for graph_jaccard_links (see its comment). */
  private val WedgeCap = 64

  /** Unrolled synchronous label-propagation rounds. */
  private val LpaRounds = 3

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(spark, dir, name)

  private val edgeCache = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  /** Canonical co-purchase edges (u < v, support ≥ 2), built once per
    * (session, corpus) and eagerly checkpointed. */
  private def edges(s: SparkSession, d: String): DataFrame =
    edgeCache.computeIfAbsent(s"${System.identityHashCode(s)}#$d",
      _ => edgesBuild(s, d).localCheckpoint(true))

  private def edgesBuild(s: SparkSession, d: String): DataFrame = {
    // scale-aware wide exchanges (Exchanges.widenForAgg): the 100× probe
    // spilled 28 GB in this collect_set (object-agg sort fallback) and
    // 12 GB in the pair census; small scans keep Spark's default plan
    val items = Exchanges.widenForAgg(
        t(s, d, "lineitem").select(col("l_orderkey"), col("l_partkey")),
        col("l_orderkey"))
      .groupBy(col("l_orderkey"))
      .agg(slice(array_sort(collect_set(col("l_partkey"))), 1, ItemCap).as("items"))
      .filter(size(col("items")) >= 2)
    // co-purchase pairs are MOSTLY UNIQUE (support ≥ 2 is the rare case),
    // so map-side combine cannot shrink this shuffle anyway
    Exchanges.widenForAgg(
        items
          .select(explode(col("items")).as("u"), col("items"))
          .select(col("u"), explode(col("items")).as("v"))
          .filter(col("u") < col("v")),
        col("u"), col("v"))
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= 2L)
      .select(col("u"), col("v"))
  }

  /** Both-direction adjacency with each arc's source out-degree attached. */
  private def adjWithDeg(e: DataFrame): (DataFrame, DataFrame) = {
    val adj = e.select(col("u").as("src"), col("v").as("dst"))
      .union(e.select(col("v").as("src"), col("u").as("dst")))
    val deg = adj.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
    (adj, deg)
  }

  /** Every triangle exactly once, as (w, cu, cv) with cu < cv: edges are
    * oriented from their (degree, id)-smaller endpoint, so each node's
    * out-degree is O(√m) and wedge generation — the only superlinear
    * step — is bounded regardless of hub degrees; each triangle closes
    * exactly one (src; a<b) out-wedge. Shared by the global census
    * (graph_triangles) and the per-node coefficient
    * (graph_clustering_coeff). */
  private def closedTriangles(e: DataFrame, deg: DataFrame): DataFrame = {
    val du = deg.select(col("node").as("u"), col("deg").as("deg_u"))
    val dv = deg.select(col("node").as("v"), col("deg").as("deg_v"))
    val oriented = e.join(du, Seq("u")).join(dv, Seq("v"))
      .selectExpr(
        "CASE WHEN deg_u < deg_v OR (deg_u = deg_v AND u < v) THEN u ELSE v END AS src",
        "CASE WHEN deg_u < deg_v OR (deg_u = deg_v AND u < v) THEN v ELSE u END AS dst")
    val wedges = oriented.as("a").join(oriented.as("b"),
        col("a.src") === col("b.src") && col("a.dst") < col("b.dst"))
      .selectExpr("a.src AS w", "least(a.dst, b.dst) AS cu", "greatest(a.dst, b.dst) AS cv")
    wedges.join(e, col("cu") === col("u") && col("cv") === col("v"))
      .select(col("w"), col("cu"), col("cv"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Degree histogram of the co-purchase graph: how many parts have k
    // co-purchase partners, with exact node-share in basis points. Node-
    // sized aggregation after the shared edge build.
    "graph_degree_stats" -> ((s, d) => {
      val (_, deg) = adjWithDeg(edges(s, d))
      val hist = deg.groupBy(col("deg").as("degree"))
        .agg(count(lit(1)).as("n_nodes"))
      val tot = hist.agg(sum(col("n_nodes")).as("total_nodes"))
      hist.join(broadcast(tot))
        .selectExpr("degree", "n_nodes", "(n_nodes * 10000) div total_nodes AS node_share_bp")
        .orderBy(asc("degree"))
    }),

    // Global triangle census: nodes, edges, wedges (paths of length 2),
    // triangles via degree-ordered orientation, and the global clustering
    // coefficient 3·T/W in exact basis points.
    "graph_triangles" -> ((s, d) => {
      val e = edges(s, d)
      val (_, deg) = adjWithDeg(e)
      val tri = closedTriangles(e, deg).agg(count(lit(1)).as("n_triangles"))
      val counts = deg.agg(
        count(lit(1)).as("n_nodes"),
        (sum(col("deg")) / 2).cast("long").as("n_edges"),
        sum(expr("(deg * (deg - 1)) div 2")).as("n_wedges"))
      counts.join(broadcast(tri))
        .selectExpr("n_nodes", "n_edges", "n_wedges", "n_triangles",
          "CASE WHEN n_wedges = 0 THEN NULL ELSE (3 * n_triangles * 10000) div n_wedges END AS clustering_bp")
    }),

    // Component-size census: min-label connected components (the
    // dedup_clusters pointer-jumping machinery, O(log d) rounds on the
    // vertex-sized label table) over the co-purchase graph, rolled up to
    // a size histogram with exact node shares.
    "graph_components" -> ((s, d) => {
      val comps = Dedup.connectedComponents(
        edges(s, d).selectExpr("u AS doc_a", "v AS doc_b"))
      val sizes = comps.groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("size"))
      val hist = sizes.groupBy(col("size"))
        .agg(count(lit(1)).as("n_components"))
      val tot = hist.agg(
        sum(expr("size * n_components")).as("total_nodes"))
      hist.join(broadcast(tot))
        .selectExpr("size", "n_components",
          "(size * n_components * 10000) div total_nodes AS node_share_bp")
        .orderBy(asc("size"))
    }),

    // Community detection by SYNCHRONOUS label propagation (3 unrolled
    // rounds): every node starts as its own label; each round it adopts
    // the most frequent label among its neighbors, ties to the SMALLEST
    // label — fully deterministic, unlike the async/random-order LPA of
    // the literature, so the DuckDB oracle replays it exactly. Communities
    // are finer than connected components (graph_components) — they cut
    // weakly-linked clusters apart, the projection used for co-purchase
    // category discovery. Scale: each round is one arcs⨝labels hash join
    // (node-sized right side) + a map-side-combined (node, label) vote
    // census + a node-partitioned argmax window on the vote grid; labels
    // are eagerly localCheckpointed per round (the pagerank loop shape),
    // so lineage stays flat at any round count.
    "graph_label_propagation" -> ((s, d) => {
      val (adj, deg) = adjWithDeg(edges(s, d))
      var lab = deg.select(col("node"), col("node").as("label"))
      (1 to LpaRounds).foreach { _ =>
        // majority label via max_by over struct(n, -label) — identical
        // tie-break to the oracle's (n DESC, label ASC) row_number, but a
        // HASH aggregation instead of a sort window: the windowed rendering
        // sorted the arc-sized (src, label, n) relation every round and
        // spilled 28 GB at the 100× probe (labels are node ids ≥ 1, so
        // -label is safe)
        // shuffle-hash hint: sort-merge would SORT the arc relation every
        // round (the other 28 GB of the probe's spill); hashing the
        // node-sized label side partition-wise never sorts arcs
        lab = adj
          .join(lab.withColumnRenamed("node", "dst").hint("shuffle_hash"),
            Seq("dst"))
          .groupBy(col("src"), col("label"))
          .agg(count(lit(1)).as("n"))
          .groupBy(col("src"))
          .agg(expr("max_by(label, struct(n, -label))").as("label"))
          .select(col("src").as("node"), col("label"))
          .localCheckpoint(true)
      }
      lab.groupBy(col("label").as("community"))
        .agg(count(lit(1)).as("n_nodes"),
          min(col("node")).as("min_node"), max(col("node")).as("max_node"))
        .orderBy(asc("community"))
    }),

    // 3-core peeling trajectory: each round recomputes degrees on the
    // surviving subgraph, keeps nodes with degree ≥ k, and induces the
    // edge set on the keep set; one row per round reports how many nodes
    // and edges survive. The stable tail is the k-core — the densely
    // co-purchased kernel recommendation/affinity models train on; the
    // trajectory (how fast the fringe peels) is the diagnostic. Scale:
    // every round is a node-sized degree census + two semi-joins on the
    // shrinking edge relation, eagerly checkpointed (the pagerank loop
    // discipline); per-round stats are 1-row aggregates, unioned — no
    // driver-side counting.
    "graph_kcore" -> ((s, d) => {
      var g = edges(s, d)
      val rows = (1 to PeelRounds).map { r =>
        val deg = adjWithDeg(g)._2
        val keep = deg.filter(col("deg") >= CoreK).select(col("node"))
        g = g.join(keep.withColumnRenamed("node", "u"), Seq("u"), "left_semi")
          .join(keep.withColumnRenamed("node", "v"), Seq("v"), "left_semi")
          .select(col("u"), col("v"))
          .localCheckpoint(true)
        val nk = keep.agg(count(lit(1)).as("nodes_remaining"))
        val ne = g.agg(count(lit(1)).as("edges_remaining"))
        nk.crossJoin(broadcast(ne))
          .selectExpr(s"CAST($r AS BIGINT) AS round", "nodes_remaining",
            "edges_remaining")
      }
      rows.reduce(_.union(_)).orderBy(asc("round"))
    }),

    // Link prediction by neighbor-set Jaccard: for every non-adjacent
    // 2-hop pair, |N(u) ∩ N(v)| / |N(u) ∪ N(v)| in basis points, top-20 —
    // the classic "customers who bought these also bought" candidate
    // generator. Common neighbors are counted by wedge enumeration, and
    // wedges fan out from CENTERS, so the cost driver is Σ deg(w)²; the
    // declared semantics cap wedge centers at deg ≤ WedgeCap (mirrored in
    // the oracle) — a super-hub's wedges are both quadratic to enumerate
    // and near-zero Jaccard signal (its degree inflates every union), so
    // the cap is the standard mitigation, same bound class as ItemCap at
    // the order level. Top-20 via orderBy+limit = TakeOrdered (per-
    // partition heaps + driver merge of 20-row heads, never a full sort).
    "graph_jaccard_links" -> ((s, d) => {
      val e = edges(s, d)
      val (adj, deg) = adjWithDeg(e)
      val centers = deg.filter(col("deg") <= WedgeCap)
        .select(col("node").as("src"))
      val cadj = adj.join(centers, Seq("src"), "left_semi")
      val w = cadj.as("x").join(cadj.as("y"),
          col("x.src") === col("y.src") && col("x.dst") < col("y.dst"))
        .groupBy(col("x.dst").as("u"), col("y.dst").as("v"))
        .agg(count(lit(1)).as("n_common"))
      w.join(e, Seq("u", "v"), "left_anti")
        .join(deg.select(col("node").as("u"), col("deg").as("deg_u")), Seq("u"))
        .join(deg.select(col("node").as("v"), col("deg").as("deg_v")), Seq("v"))
        .selectExpr("u", "v", "n_common",
          "deg_u + deg_v - n_common AS n_union",
          // `capped` in the name because the ASYMMETRY is deliberate:
          // n_common only counts wedges through centers with deg <=
          // WedgeCap, while the union denominator uses full degrees — a
          // pair whose shared neighbors are all hubs scores 0. That bias
          // is the point (hub co-neighbors carry near-zero signal), but
          // it means this is NOT true Jaccard, and the column says so.
          "(n_common * 10000) div (deg_u + deg_v - n_common) AS jaccard_capped_bp")
        .orderBy(desc("jaccard_capped_bp"), desc("n_common"), asc("u"), asc("v"))
        .limit(20)
    }),

    // Fixed-point PageRank, 5 iterations at damping 0.85, e12-scaled
    // integer arithmetic; top-20 parts by rank with total tiebreak. The
    // converged rank relation is an offline index (same artifact
    // discipline as the ANN codebooks / verified-pair cache): built once
    // per (session, corpus), node-sized, eagerly checkpointed.
    "graph_pagerank" -> ((s, d) => {
      ranks(s, d)
        .orderBy(desc("rank_e12"), asc("part_key"))
        .limit(20)
    }),

    // Degree assortativity: Pearson r over the directed arcs of
    // (deg(src), deg(dst)) — do hubs link to hubs (r > 0, social shape)
    // or to leaves (r < 0, hub-and-spoke)? One arc-sized join attaches
    // both endpoint degrees, then the five moment sums are ONE map-side-
    // combined aggregate; products run on DECIMAL(38,0) (arc counts ×
    // squared degrees overflow int64 at corpus scale) and only the final
    // r collapses to the autocorr float discipline (floor ppm over one
    // sqrt of an exact integer product). Arcs are both orientations of
    // each edge, so sx = sy by symmetry — kept separate anyway so the
    // output is self-evidently the textbook formula.
    "graph_assortativity" -> ((s, d) => {
      val (adj, deg) = adjWithDeg(edges(s, d))
      adj
        .join(deg.select(col("node").as("src"), col("deg").as("dx")), Seq("src"))
        .join(deg.select(col("node").as("dst"), col("deg").as("dy")), Seq("dst"))
        .selectExpr("CAST(dx AS DECIMAL(38,0)) AS dx", "CAST(dy AS DECIMAL(38,0)) AS dy")
        .agg(
          count(lit(1)).cast("decimal(38,0)").as("n_arcs"),
          sum(col("dx")).as("sx"), sum(col("dy")).as("sy"),
          sum(expr("dx * dy")).as("sxy"),
          sum(expr("dx * dx")).as("sxx"), sum(expr("dy * dy")).as("syy"))
        .selectExpr("CAST(n_arcs AS BIGINT) AS n_arcs",
          "CAST(n_arcs * sxy - sx * sy AS DECIMAL(38,0)) AS cov_num",
          "CAST(n_arcs * sxx - sx * sx AS DECIMAL(38,0)) AS var_x_num",
          "CAST(n_arcs * syy - sy * sy AS DECIMAL(38,0)) AS var_y_num")
        // only bounded columns leave the query: the raw moment cross
        // products stay DECIMAL(38,0) internals (they overflow int64 at
        // corpus scale), r is ppm-bounded by construction
        .selectExpr("n_arcs",
          """CASE WHEN var_x_num = 0 OR var_y_num = 0 THEN CAST(NULL AS BIGINT)
             ELSE CAST(floor(CAST(cov_num AS DOUBLE) * 1000000.0 /
               sqrt(CAST(var_x_num AS DOUBLE) * CAST(var_y_num AS DOUBLE))) AS BIGINT)
             END AS r_ppm""")
    }),

    // Bipartite projection similarity: the user↔event-type bipartite graph
    // projected onto types, scored by co-occurrence cosine
    // n_ab / √(d_a·d_b) — which behaviors share an audience, normalized so
    // a dominant type can't top every pair by raw count alone. The only
    // corpus-scale work is ONE distinct to (user, type); pairs are
    // generated IN-ROW from each user's type set (fan-out ≤ |type
    // catalog|², a constant — never a corpus self-join), and the pair
    // census is a second map-side-combined groupBy. Degrees ride the same
    // distinct relation; the degree product runs DECIMAL(38,0) (10⁹ users
    // per side squares past int64) and collapses through the one-sqrt
    // floor-ppm float discipline shared with graph_assortativity.
    "graph_bipartite_similarity" -> ((s, d) => {
      val ut = t(s, d, "events")
        .select(col("user_id"), col("event_type")).distinct()
        .transform(CacheScope.persist)
      val pairs = ut
        .groupBy(col("user_id"))
        .agg(array_sort(collect_set(col("event_type"))).as("types"))
        .filter(size(col("types")) >= 2)
        .select(explode(col("types")).as("ta"), col("types"))
        .select(col("ta"), explode(col("types")).as("tb"))
        .filter(col("ta") < col("tb"))
        .groupBy(col("ta"), col("tb"))
        .agg(count(lit(1)).as("n_both"))
      val deg = ut.groupBy(col("event_type")).agg(count(lit(1)).as("d"))
      pairs
        .join(broadcast(deg.select(col("event_type").as("ta"), col("d").as("da"))), Seq("ta"))
        .join(broadcast(deg.select(col("event_type").as("tb"), col("d").as("db"))), Seq("tb"))
        .selectExpr("ta AS type_a", "tb AS type_b", "da AS n_users_a",
          "db AS n_users_b", "n_both",
          """CAST(floor(CAST(n_both AS DOUBLE) * 1000000.0 /
             sqrt(CAST(CAST(da AS DECIMAL(38,0)) * db AS DOUBLE))) AS BIGINT) AS cos_ppm""")
        .orderBy(desc("cos_ppm"), asc("type_a"), asc("type_b"))
    }),

    // Per-node LOCAL clustering coefficient, rolled up to a log2-degree-
    // bucket census: avg of cc = 2·t(v) / (deg·(deg−1)) over nodes in the
    // bucket (deg ≥ 2; cc undefined below). The global census
    // (graph_triangles) can't see this — strong global clustering can hide
    // hubs whose neighborhoods are wide open, which is exactly what the
    // degree slices expose. Same bounded machinery: closedTriangles'
    // degree-ordered orientation caps wedge fan-out at O(√m) per node, the
    // per-node triangle census is node-sized (each triangle explodes to
    // its 3 corners), the bucket rollup is ≤64 rows at ANY corpus. The
    // cc ratio rides DECIMAL(38,0)/HUGEINT — t(v)·2·10⁴ passes int64 once
    // hub degree passes ~2×10⁷, the ADVICE overflow class — and each
    // node's cc truncates to bp BEFORE the bucket average (declared
    // semantics; both engines identical).
    "graph_clustering_coeff" -> ((s, d) => {
      val e = edges(s, d)
      val (_, deg) = adjWithDeg(e)
      val triNodes = closedTriangles(e, deg)
        .selectExpr("explode(array(w, cu, cv)) AS node")
        .groupBy(col("node")).agg(count(lit(1)).as("tri"))
      deg.filter(col("deg") >= 2)
        .join(triNodes, Seq("node"), "left")
        .na.fill(0L, Seq("tri"))
        .selectExpr("CAST(length(bin(deg)) - 1 AS BIGINT) AS deg_bucket", "tri",
          """CAST((CAST(tri AS DECIMAL(38,0)) * 2 * 10000)
             div (CAST(deg AS DECIMAL(38,0)) * (deg - 1)) AS BIGINT) AS cc_bp""")
        .groupBy(col("deg_bucket"))
        .agg(count(lit(1)).as("n_nodes"),
          sum(col("tri")).cast("bigint").as("n_tri"),
          expr("CAST(sum(cc_bp) div count(1) AS BIGINT)").as("avg_cc_bp"))
        .orderBy(asc("deg_bucket"))
    }),

    // Rich-club coefficient φ(k) = 2·E_k / (N_k·(N_k−1)) for k ∈
    // {2,4,8,16}: the edge density among nodes of degree ≥ k — rising
    // φ(k) means the hubs of the co-purchase graph preferentially
    // connect to EACH OTHER (a rich club), the structure that makes
    // hub-targeted caching/partitioning pay off; flat-or-falling means
    // hub links spread into the periphery. Both endpoints' degrees come
    // from the shared census-built edge artifact; each k is a semi-join
    // of the (vertex-sized) qualifying set against the edge relation —
    // graph-sized work, 4-row output, exact bp.
    "graph_rich_club" -> ((s, d) => {
      val e = edges(s, d)
      val (_, deg) = adjWithDeg(e)
      val ks = Seq(2L, 4L, 8L, 16L)
      val kdf = s.createDataFrame(ks.map(Tuple1(_))).toDF("k")
      val nodesK = deg.crossJoin(broadcast(kdf))
        .filter(col("deg") >= col("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("n_k"))
      val withDegs = e
        .join(deg.select(col("node").as("u"), col("deg").as("du")), Seq("u"))
        .join(deg.select(col("node").as("v"), col("deg").as("dv")), Seq("v"))
      val edgesK = withDegs.crossJoin(broadcast(kdf))
        .filter(col("du") >= col("k") && col("dv") >= col("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("e_k"))
      nodesK.join(edgesK, Seq("k"), "left")
        .na.fill(0L, Seq("e_k"))
        .selectExpr("k", "n_k", "e_k",
          """CASE WHEN n_k < 2 THEN CAST(NULL AS BIGINT)
             ELSE (e_k * 2 * 10000) div (n_k * (n_k - 1)) END AS phi_bp""")
        .orderBy(asc("k"))
    })
  )

  private val rankCache = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  /** Converged (5-iteration) rank relation, cached per (session, corpus). */
  private def ranks(s: SparkSession, d: String): DataFrame =
    rankCache.computeIfAbsent(s"${System.identityHashCode(s)}#$d",
      _ => ranksBuild(s, d).localCheckpoint(true))

  private def ranksBuild(s: SparkSession, d: String): DataFrame = {
    val (adjRaw, deg) = adjWithDeg(edges(s, d))
    val adj = adjRaw.join(deg, adjRaw("src") === deg("node"))
      .select(col("src"), col("dst"), col("deg"))
    // n is a bounded scalar (node count) — same artifact discipline as
    // the ANN codebooks; base = (15·(Scale div n)) div 100, truncating
    // integer division on both engines.
    val n = deg.count()
    val r0 = Scale / n
    val base = (15L * r0) / 100L
    var rk = deg.select(col("node"), lit(r0).as("rank"))
    for (_ <- 1 to Iters) {
      rk = adj.join(rk, adj("src") === rk("node"))
        .groupBy(col("dst"))
        .agg(sum(expr("rank div deg")).as("contrib"))
        .select(col("dst").as("node"),
          (lit(base) + expr("(85 * contrib) div 100")).as("rank"))
        .localCheckpoint(true)
    }
    rk.join(deg.select(col("node"), col("deg")), Seq("node"))
      .selectExpr("node AS part_key", "deg AS degree", "rank AS rank_e12")
  }

  /** Shared oracle CTE prefix: the same census-built canonical edge set. */
  private val edgeCte =
    "WITH ip AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), " +
      "pc AS (SELECT a.l_partkey AS u, b.l_partkey AS v, count(*) AS n FROM ip a " +
      "JOIN ip b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey " +
      "GROUP BY u, v), " +
      "e AS (SELECT u, v FROM pc WHERE n >= 2), " +
      "adj AS (SELECT u AS src, v AS dst FROM e UNION ALL SELECT v, u FROM e), " +
      "deg AS (SELECT src AS node, count(*) AS deg FROM adj GROUP BY src)"

  /** [[edgeCte]] with every relation MATERIALIZED — required by the
    * unrolled pagerank oracle, whose rank CTEs chain 5 deep: DuckDB
    * inlines plain CTEs by default, so each r_k re-inlines the whole
    * prefix INCLUDING the pair-explosion `pc`, and the replay count grows
    * exponentially with iterations — at the 100× replica that exhausted
    * DuckDB's temp disk (round-13 finding). Materialized, `pc` is
    * computed once and every r_k is node-sized. Values are identical —
    * materialization is purely physical. */
  private val edgeCteMat =
    "WITH ip AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), " +
      "pc AS MATERIALIZED (SELECT a.l_partkey AS u, b.l_partkey AS v, count(*) AS n FROM ip a " +
      "JOIN ip b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey " +
      "GROUP BY u, v), " +
      "e AS MATERIALIZED (SELECT u, v FROM pc WHERE n >= 2), " +
      "adj AS MATERIALIZED (SELECT u AS src, v AS dst FROM e UNION ALL SELECT v, u FROM e), " +
      "deg AS MATERIALIZED (SELECT src AS node, count(*) AS deg FROM adj GROUP BY src)"

  /** One unrolled PageRank iteration as an oracle CTE (MATERIALIZED —
    * node-sized; see [[edgeCteMat]]). */
  private def prIter(k: Int): String =
    s"r$k AS MATERIALIZED (SELECT a.dst AS node, " +
      s"CAST((15 * (${Scale} // nn.n)) // 100 + (85 * sum(r.rank // d.deg)) // 100 AS BIGINT) AS rank " +
      s"FROM adj a JOIN r${k - 1} r ON r.node = a.src " +
      "JOIN deg d ON d.node = a.src CROSS JOIN nn GROUP BY a.dst, nn.n)"

  /** One unrolled peel round as oracle CTEs (e0/deg0 alias the base
    * edge/degree relations from [[edgeCte]]). */
  private def kcoreRound(r: Int): String = {
    val pe = if (r == 1) "e" else s"e${r - 1}"
    val pd = if (r == 1) "deg" else s"deg${r - 1}"
    s"k$r AS MATERIALIZED (SELECT node FROM $pd WHERE deg >= $CoreK), " +
      s"e$r AS MATERIALIZED (SELECT x.u, x.v FROM $pe x " +
      s"JOIN k$r a ON a.node = x.u JOIN k$r b ON b.node = x.v), " +
      s"adj$r AS (SELECT u AS src, v AS dst FROM e$r UNION ALL SELECT v, u FROM e$r), " +
      s"deg$r AS (SELECT src AS node, count(*) AS deg FROM adj$r GROUP BY src), " +
      s"row$r AS (SELECT CAST($r AS BIGINT) AS round, " +
      s"(SELECT count(*) FROM k$r) AS nodes_remaining, " +
      s"(SELECT count(*) FROM e$r) AS edges_remaining)"
  }

  /** One unrolled synchronous LPA round as an oracle CTE: vote census over
    * neighbor labels, argmax with (n DESC, label ASC) tiebreak. */
  private def lpaRound(r: Int): String =
    s"v$r AS (SELECT a.src, l.label, count(*) AS n FROM adj a " +
      s"JOIN lab${r - 1} l ON l.node = a.dst GROUP BY a.src, l.label), " +
      s"lab$r AS (SELECT src AS node, label FROM (SELECT src, label, " +
      "row_number() OVER (PARTITION BY src ORDER BY n DESC, label) AS rk " +
      s"FROM v$r) _ WHERE rk = 1)"

  def oracles: Map[String, String] = Map(
    "graph_label_propagation" ->
      (edgeCte + ", lab0 AS (SELECT node, node AS label FROM deg), " +
        (1 to LpaRounds).map(lpaRound).mkString(", ") + " " +
        s"SELECT label AS community, count(*) AS n_nodes, " +
        "min(node) AS min_node, max(node) AS max_node " +
        s"FROM lab$LpaRounds GROUP BY label ORDER BY community"),

    "graph_kcore" ->
      (edgeCte +
        (1 to PeelRounds).map(kcoreRound).mkString(", ", ", ", " ") +
        "SELECT * FROM (" +
        (1 to PeelRounds).map(r => s"SELECT * FROM row$r").mkString(" UNION ALL ") +
        ") ORDER BY round"),

    "graph_jaccard_links" ->
      (edgeCte +
        s", cadj AS (SELECT a.src, a.dst FROM adj a JOIN deg c ON c.node = a.src AND c.deg <= $WedgeCap), " +
        "w AS (SELECT x.dst AS u, y.dst AS v, count(*) AS n_common FROM cadj x " +
        "JOIN cadj y ON x.src = y.src AND x.dst < y.dst GROUP BY u, v), " +
        "na AS (SELECT w.u, w.v, n_common FROM w LEFT JOIN e ON e.u = w.u AND e.v = w.v " +
        "WHERE e.u IS NULL), " +
        "j AS (SELECT na.u, na.v, n_common, du.deg + dv.deg - n_common AS n_union, " +
        "(n_common * 10000) // (du.deg + dv.deg - n_common) AS jaccard_capped_bp " +
        "FROM na JOIN deg du ON du.node = na.u JOIN deg dv ON dv.node = na.v) " +
        "SELECT u, v, n_common, n_union, jaccard_capped_bp FROM j " +
        "ORDER BY jaccard_capped_bp DESC, n_common DESC, u, v LIMIT 20"),

    "graph_assortativity" ->
      (edgeCte + ", arcs AS (SELECT CAST(du.deg AS DECIMAL(38,0)) AS dx, " +
        "CAST(dv.deg AS DECIMAL(38,0)) AS dy FROM adj " +
        "JOIN deg du ON du.node = adj.src JOIN deg dv ON dv.node = adj.dst), " +
        "m AS (SELECT CAST(count(*) AS DECIMAL(38,0)) AS n_arcs, " +
        "sum(dx) AS sx, sum(dy) AS sy, sum(dx * dy) AS sxy, " +
        "sum(dx * dx) AS sxx, sum(dy * dy) AS syy FROM arcs), " +
        "nums AS (SELECT CAST(n_arcs AS BIGINT) AS n_arcs, " +
        "CAST(n_arcs * sxy - sx * sy AS DECIMAL(38,0)) AS cov_num, " +
        "CAST(n_arcs * sxx - sx * sx AS DECIMAL(38,0)) AS var_x_num, " +
        "CAST(n_arcs * syy - sy * sy AS DECIMAL(38,0)) AS var_y_num FROM m) " +
        "SELECT n_arcs, CASE WHEN var_x_num = 0 OR var_y_num = 0 THEN CAST(NULL AS BIGINT) " +
        "ELSE CAST(floor(CAST(cov_num AS DOUBLE) * 1000000.0 / " +
        "sqrt(CAST(var_x_num AS DOUBLE) * CAST(var_y_num AS DOUBLE))) AS BIGINT) " +
        "END AS r_ppm FROM nums"),

    // projection pairs via a user-keyed self-join (equivalent semantics to
    // the engine's in-row pair explode — DuckDB has no fan-out concern at
    // gate scale)
    "graph_bipartite_similarity" ->
      ("WITH ut AS MATERIALIZED (SELECT DISTINCT user_id, event_type FROM events), " +
        "pairs AS (SELECT a.event_type AS type_a, b.event_type AS type_b, " +
        "count(*) AS n_both FROM ut a JOIN ut b ON a.user_id = b.user_id " +
        "AND a.event_type < b.event_type GROUP BY 1, 2), " +
        "deg AS (SELECT event_type, count(*) AS d FROM ut GROUP BY event_type) " +
        "SELECT type_a, type_b, da.d AS n_users_a, db.d AS n_users_b, n_both, " +
        "CAST(floor(CAST(n_both AS DOUBLE) * 1000000.0 / " +
        "sqrt(CAST(CAST(da.d AS DECIMAL(38,0)) * db.d AS DOUBLE))) AS BIGINT) AS cos_ppm " +
        "FROM pairs JOIN deg da ON da.event_type = type_a " +
        "JOIN deg db ON db.event_type = type_b " +
        "ORDER BY cos_ppm DESC, type_a, type_b"),

    "graph_clustering_coeff" ->
      (edgeCte +
        ", od AS (SELECT e.u, e.v, du.deg AS deg_u, dv.deg AS deg_v FROM e " +
        "JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v), " +
        "o AS (SELECT CASE WHEN deg_u < deg_v OR (deg_u = deg_v AND u < v) THEN u ELSE v END AS src, " +
        "CASE WHEN deg_u < deg_v OR (deg_u = deg_v AND u < v) THEN v ELSE u END AS dst FROM od), " +
        "w AS (SELECT a.src AS w, least(a.dst, b.dst) AS cu, greatest(a.dst, b.dst) AS cv " +
        "FROM o a JOIN o b ON a.src = b.src AND a.dst < b.dst), " +
        "tr AS (SELECT w.w, w.cu, w.cv FROM w JOIN e ON e.u = w.cu AND e.v = w.cv), " +
        "tn AS (SELECT node, count(*) AS tri FROM " +
        "(SELECT w AS node FROM tr UNION ALL SELECT cu FROM tr UNION ALL SELECT cv FROM tr) " +
        "GROUP BY node), " +
        "cc AS (SELECT CAST(length(bin(deg)) - 1 AS BIGINT) AS deg_bucket, " +
        "coalesce(tri, 0) AS tri, " +
        "CAST((CAST(coalesce(tri, 0) AS HUGEINT) * 2 * 10000) // " +
        "(CAST(deg AS HUGEINT) * (deg - 1)) AS BIGINT) AS cc_bp " +
        "FROM deg LEFT JOIN tn ON tn.node = deg.node WHERE deg >= 2) " +
        "SELECT deg_bucket, count(*) AS n_nodes, CAST(sum(tri) AS BIGINT) AS n_tri, " +
        "CAST(sum(cc_bp) // count(*) AS BIGINT) AS avg_cc_bp " +
        "FROM cc GROUP BY deg_bucket ORDER BY deg_bucket"),

    "graph_rich_club" ->
      (edgeCte +
        ", ks(k) AS (VALUES (CAST(2 AS BIGINT)), (CAST(4 AS BIGINT)), " +
        "(CAST(8 AS BIGINT)), (CAST(16 AS BIGINT))), " +
        "nk AS (SELECT k, count(*)::BIGINT AS n_k FROM deg CROSS JOIN ks " +
        "WHERE deg >= k GROUP BY k), " +
        "wd AS (SELECT e.u, e.v, du.deg AS du, dv.deg AS dv FROM e " +
        "JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v), " +
        "ek AS (SELECT k, count(*)::BIGINT AS e_k FROM wd CROSS JOIN ks " +
        "WHERE du >= k AND dv >= k GROUP BY k) " +
        "SELECT k, n_k, COALESCE(e_k, CAST(0 AS BIGINT)) AS e_k, " +
        "CASE WHEN n_k < 2 THEN CAST(NULL AS BIGINT) " +
        "ELSE (COALESCE(e_k, CAST(0 AS BIGINT)) * 2 * 10000) // (n_k * (n_k - 1)) END AS phi_bp " +
        "FROM nk LEFT JOIN ek USING (k) ORDER BY k"),

    "graph_degree_stats" ->
      (edgeCte + ", hist AS (SELECT deg AS degree, count(*) AS n_nodes FROM deg GROUP BY deg), " +
        "tot AS (SELECT CAST(sum(n_nodes) AS BIGINT) AS total_nodes FROM hist) " +
        "SELECT degree, n_nodes, (n_nodes * 10000) // total_nodes AS node_share_bp " +
        "FROM hist CROSS JOIN tot ORDER BY degree"),

    "graph_triangles" ->
      (edgeCte + ", tri AS (SELECT count(*) AS n_triangles FROM e a " +
        "JOIN e b ON b.u = a.v JOIN e c ON c.u = a.u AND c.v = b.v), " +
        "agg AS (SELECT count(*) AS n_nodes, CAST(sum(deg) / 2 AS BIGINT) AS n_edges, " +
        "CAST(sum((deg * (deg - 1)) // 2) AS BIGINT) AS n_wedges FROM deg) " +
        "SELECT n_nodes, n_edges, n_wedges, n_triangles, " +
        "CASE WHEN n_wedges = 0 THEN NULL ELSE (3 * n_triangles * 10000) // n_wedges END AS clustering_bp " +
        "FROM agg CROSS JOIN tri"),

    "graph_components" ->
      // reachability-min closure: exact on the support-thresholded edge
      // set (sparse — the census-built graph, not the corpus)
      ("WITH RECURSIVE " + edgeCte.stripPrefix("WITH ") +
        ", r(node, reach) AS (SELECT node, node FROM deg " +
        "UNION SELECT a.dst, r.reach FROM r JOIN adj a ON a.src = r.node), " +
        "cc AS (SELECT node, min(reach) AS comp FROM r GROUP BY node), " +
        "sizes AS (SELECT comp, count(*) AS size FROM cc GROUP BY comp), " +
        "hist AS (SELECT size, count(*) AS n_components FROM sizes GROUP BY size), " +
        "tot AS (SELECT CAST(sum(size * n_components) AS BIGINT) AS total_nodes FROM hist) " +
        "SELECT size, n_components, " +
        "(size * n_components * 10000) // total_nodes AS node_share_bp " +
        "FROM hist CROSS JOIN tot ORDER BY size"),

    "graph_pagerank" ->
      (edgeCteMat + ", nn AS MATERIALIZED (SELECT count(*) AS n FROM deg), " +
        s"r0 AS MATERIALIZED (SELECT node, ${Scale} // nn.n AS rank FROM deg CROSS JOIN nn)" +
        (1 to Iters).map(prIter).mkString(", ", ", ", " ") +
        s"SELECT r.node AS part_key, d.deg AS degree, r.rank AS rank_e12 " +
        s"FROM r$Iters r JOIN deg d ON d.node = r.node " +
        "ORDER BY rank_e12 DESC, part_key LIMIT 20")
  )
}
