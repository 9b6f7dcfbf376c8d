package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.CrossHash._

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`Array[Float]`, 64-dim). Three tiers:
  *
  *  - `ann_bruteforce_topk`: exact cosine top-k — the correctness baseline.
  *  - `ann_lsh_buckets`: random-hyperplane LSH sign buckets — candidates
  *    share a bucket, so the join is equi- not cross-; the 100 TB path.
  *  - `ann_ivf_probe`: IVF-style — coarse centroids (per label), queries
  *    probe the nearest 2 cells, exact rerank inside probed cells only.
  *
  * Determinism: cosine is a strict index-ordered double fold (CrossHash),
  * scores are emitted as exact-floor ppm integers, ranks tie-break on
  * vec_id, and the LSH hyperplanes are integer-arithmetic pseudo-random
  * (identical literals in both engines).
  */
object Similarity {

  private def emb(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorFunctions.register(spark) // codegen'd vec_dot/vec_norm2
    spark.read.parquet(s"$dir/embeddings.parquet")
  }

  private val Dim = 64

  /** Pseudo-random hyperplane component for (plane j, dim i): integer LCG
    * mapped to [-0.5, 0.5) in exact double arithmetic. */
  private def hyper(j: Int, i: Int): Double =
    (((j * 1009L + i) * 2654435761L % 1048576L + 1048576L) % 1048576L) / 1048576.0 - 0.5

  /** Hyperplane count — the bucket-granularity knob. 2^NPlanes buckets:
    * 8 planes = 256 buckets fits the test corpus (~5k vectors at sf0.1 →
    * ~20/bucket); a production corpus sizes this as
    * ceil(log2(n / targetBucketSize)) — e.g. 1B vectors at ~1k/bucket →
    * 20 planes. Everything downstream (bucket id, pair join, oracle SQL)
    * derives from this one constant; the hyperplanes themselves are pinned
    * integer-LCG literals, so any two engines agree for any NPlanes. */
  private val NPlanes: Int = {
    val raw = sys.env.get("SPARK_GRAFT_ANN_PLANES")
    val n = raw match {
      case None => 8
      case Some(s) =>
        val p =
          try s.trim.toInt
          catch {
            case _: NumberFormatException => throw new IllegalArgumentException(
              s"SPARK_GRAFT_ANN_PLANES must be an integer in [1, 30], got '$s'")
          }
        if (p < 1 || p > 30) throw new IllegalArgumentException(
          s"SPARK_GRAFT_ANN_PLANES must be in [1, 30] (2^planes buckets), got $p")
        p
    }
    // Log the effective knob so bench/correctness runs record which bucket
    // granularity produced their result shapes.
    if (raw.isDefined)
      System.err.println(s"[graft] ann_lsh planes = $n (SPARK_GRAFT_ANN_PLANES)")
    n
  }

  /** Sign-bit bucket id for `v` under `nPlanes` pinned hyperplanes (Spark).
    * Parameterized (package-visible) so LshRecallSpec can measure recall at
    * alternative plane counts against the same hyperplane literals without
    * re-deriving them. */
  private[graft] def lshBucketSparkExpr(v: String, nPlanes: Int): String =
    (0 until nPlanes).map { j =>
      val dot = s"vec_dot($v, array(" +
        (1 to Dim).map(i => s"cast(${hyper(j, i)} as double)").mkString(",") + "))"
      s"if($dot > 0, ${1L << j}L, 0L)"
    }.mkString("(", " + ", ")")

  private def lshBucketSpark(v: String): String = lshBucketSparkExpr(v, NPlanes)

  /** Same bucket id on the DuckDB side (identical literals). */
  private def lshBucketDuck(v: String): String =
    (0 until NPlanes).map { j =>
      val dot = "list_reduce(list_prepend(0.0::DOUBLE, list_transform(" +
        s"range(1, ${Dim + 1}), i -> list_extract($v, i)::DOUBLE * list_extract([" +
        (1 to Dim).map(i => s"${hyper(j, i)}::DOUBLE").mkString(",") + "], i))), (acc, x) -> acc + x)"
      s"(CASE WHEN $dot > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** Whole-stage-codegen cosine via the native VecDot/VecNorm2 expressions
    * (identical index-order double accumulation as the CrossHash folds, so
    * the DuckDB oracle — which uses the folds — still hash-matches). */
  private def cosPpmSpark(a: String, b: String): String =
    s"CAST(floor(vec_dot($a, $b) / (sqrt(vec_norm2($a)) * " +
      s"sqrt(vec_norm2($b))) * 1000000) AS BIGINT)"

  private def cosPpmDuck(a: String, b: String): String =
    s"CAST(floor(${dotDuck(a, b, Dim)} / (sqrt(${norm2Duck(a, Dim)}) * " +
      s"sqrt(${norm2Duck(b, Dim)})) * 1000000) AS BIGINT)"

  // ---------------------------------------------------------------------
  // Shared PQ codebook: 8 subspaces × 256 sign-orthant cells. The code of
  // a subvector is its 8-bit sign pattern; the codebook entry is the mean
  // of the cell's members (integer-e10 component sums → double, so both
  // engines agree exactly). Deterministic by construction — no iterative
  // k-means — yet adaptive (cell means), which measured 6× the recall of
  // the earlier label-derived 10-entry codebook (IvfPqRecallSpec: 0.24 vs
  // 0.04 @ top-10 against exact L2). One byte per subspace code = 8 bytes
  // per vector vs 256 raw — the memory ratio that makes 100 TB ANN fit.
  // ---------------------------------------------------------------------

  private def orthantSpark(xs: String): String =
    (0 until 8).map(i =>
      s"if(element_at($xs, ${i + 1}) > cast(0.0 as float), ${1 << i}, 0)")
      .mkString("(", " + ", ")")

  private def orthantDuck(sv: String): String =
    (0 until 8).map(i =>
      s"(CASE WHEN list_extract($sv, ${i + 1}) > 0 THEN ${1 << i} ELSE 0 END)")
      .mkString("(", " + ", ")")

  /** (vec_id, cell = IVF label, m, xs = 8-dim subvector) for every vector. */
  private def subvectors(e: DataFrame): DataFrame =
    e.select(col("vec_id"), col("label").as("cell"), col("embedding"),
        explode(expr("sequence(0, 7)")).as("m"))
      .selectExpr("vec_id", "cell", "m", "slice(embedding, m * 8 + 1, 8) AS xs")

  /** Codebook (m, ccode, cv): per-(subspace, orthant) mean subvector. */
  private def pqCodebook(xsub: DataFrame): DataFrame =
    xsub.withColumn("ocode", expr(orthantSpark("xs")))
      .select(col("m"), col("ocode"), posexplode(col("xs")))
      .selectExpr("m", "ocode", "pos",
        "CAST(floor(CAST(col AS DOUBLE) * 10000000000) AS BIGINT) AS xe10")
      .groupBy(col("m"), col("ocode"), col("pos"))
      .agg(sum(col("xe10")).as("sxe10"), count(lit(1)).as("cnt"))
      .groupBy(col("m"), col("ocode"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, sxe10, cnt))), " +
        "p -> cast(p.sxe10 as double) / (10000000000D * p.cnt)) AS cv"))
      .withColumnRenamed("ocode", "ccode")

  /** Encode: nearest codebook entry per (vector, subspace) — the cell key
    * rides along for the IVF probe join. The argmin is a `min_by` over the
    * (dist, ccode) pair, NOT a window rank: the window rendering shuffles
    * every (subvector × code) scored row (n·8·256 at corpus scale) just to
    * rank them, where min_by partial-aggregates map-side and shuffles one
    * row per (vector, subspace). Tie semantics are identical to the
    * oracle's `row_number ... ORDER BY dist, ccode` (lexicographic pair
    * min) and the dist doubles are the same pinned kernels both sides. */
  private def pqEncode(xsub: DataFrame, cent: DataFrame): DataFrame =
    xsub.join(broadcast(cent), Seq("m"))
      .selectExpr("vec_id", "cell", "m", "ccode",
        "vec_norm2(xs) - 2 * vec_dot(xs, cv) + vec_norm2(cv) AS dist")
      .groupBy(col("vec_id"), col("cell"), col("m"))
      .agg(min_by(col("ccode"), struct(col("dist"), col("ccode"))).as("code"))
      .select(col("vec_id"), col("cell"), col("m"), col("code"))

  /** Per-query ADC lookup table (query_id, m, code, qd_e10), e10-fixed —
    * the same subvector slicing as [[subvectors]], restricted to the query
    * set. */
  private def pqQueryTable(e: DataFrame, cent: DataFrame): DataFrame =
    subvectors(e.filter(col("vec_id") < 5))
      .join(broadcast(cent), Seq("m"))
      .selectExpr("vec_id AS query_id", "m", "ccode AS code",
        "CAST(floor((vec_norm2(xs) - 2 * vec_dot(xs, cv) + vec_norm2(cv)) " +
          "* 10000000000) AS BIGINT) AS qd_e10")

  /** DuckDB twin of subvectors → codebook → encode → query table, as a CTE
    * chain ending in `codes` (vec_id, cell, m, code) and `qtab`. */
  private def pqDuckCtes: String = {
    val l2 = s"${norm2Duck("sv", 8)} - 2 * ${dotDuck("sv", "cv", 8)} + ${norm2Duck("cv", 8)}"
    "xsub AS (SELECT vec_id, label AS cell, ms.range AS m, " +
      "list_slice(embedding, ms.range * 8 + 1, ms.range * 8 + 8) AS sv " +
      "FROM embeddings CROSS JOIN range(0, 8) ms), " +
      s"xo AS (SELECT vec_id, cell, m, sv, ${orthantDuck("sv")} AS ocode FROM xsub), " +
      "comp AS (SELECT m, ocode, p.range AS pos, " +
      "CAST(sum(CAST(floor(list_extract(sv, p.range)::DOUBLE * 10000000000) AS BIGINT)) AS BIGINT) AS sxe10, " +
      "count(*) AS cnt FROM xo CROSS JOIN range(1, 9) p GROUP BY m, ocode, p.range), " +
      "cent0 AS (SELECT m, ocode, list_transform(list(sxe10 ORDER BY pos), " +
      "s -> s::DOUBLE) AS svec, max(cnt) AS cnt FROM comp GROUP BY m, ocode), " +
      "cent AS (SELECT m, ocode AS ccode, list_transform(svec, s -> s / (10000000000.0 * cnt)) AS cv FROM cent0), " +
      s"scored AS (SELECT vec_id, cell, x.m AS m, ccode, $l2 AS dist, " +
      s"row_number() OVER (PARTITION BY vec_id, x.m ORDER BY $l2 ASC, ccode) AS rk " +
      "FROM xo x JOIN cent c ON c.m = x.m), " +
      "codes AS (SELECT vec_id, cell, m, ccode AS code FROM scored WHERE rk = 1), " +
      "qsub AS (SELECT vec_id AS query_id, ms.range AS m, " +
      "list_slice(embedding, ms.range * 8 + 1, ms.range * 8 + 8) AS sv " +
      "FROM embeddings CROSS JOIN range(0, 8) ms WHERE vec_id < 5), " +
      "qtab AS (SELECT query_id, q2.m AS m, ccode AS code, " +
      s"CAST(floor(($l2) * 10000000000) AS BIGINT) AS qd_e10 " +
      "FROM qsub q2 JOIN cent c ON c.m = q2.m)"
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact cosine top-10 for 5 query vectors — the rerank/baseline kernel.
    // Norms are precomputed once per vector (sqrt(vec_norm2(x)) is the same
    // IEEE double either way, so the oracle still hash-matches); computing
    // them inside the join would redo 2/3 of the kernel work per pair.
    "ann_bruteforce_topk" -> ((s, d) => {
      val e = emb(s, d).selectExpr("vec_id", "embedding AS v", "vec_norm2(embedding) AS n2")
      val q = e.filter(col("vec_id") < 5)
        .selectExpr("vec_id AS query_id", "v AS qv", "n2 AS qn2")
      q.join(e, col("query_id") =!= col("vec_id"))
        .selectExpr("query_id", "vec_id AS neighbor_id",
          "CAST(floor(vec_dot(qv, v) / (sqrt(qn2) * sqrt(n2)) * 1000000) AS BIGINT) AS cos_ppm")
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
            .orderBy(desc("cos_ppm"), asc("neighbor_id"))))
        .filter(col("rank") <= 10)
        // rank as BIGINT: Spark row_number() is INT, DuckDB's is BIGINT
        .select(col("query_id"), col("rank").cast("bigint").as("rank"),
          col("neighbor_id"), col("cos_ppm"))
        .orderBy(asc("query_id"), asc("rank"))
    }),

    // LSH bucketing: per-vector sign bucket + per-bucket stats. Candidates
    // for any query are its bucket only — the equi-join scale path.
    "ann_lsh_buckets" -> ((s, d) =>
      emb(s, d)
        .selectExpr("vec_id", "label", s"${lshBucketSpark("embedding")} AS bucket")
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_vectors"),
          min(col("vec_id")).as("min_vec_id"),
          max(col("vec_id")).as("max_vec_id"),
          countDistinct(col("label")).as("n_labels"))
        .orderBy(asc("bucket"))),

    // LSH-bucketed near-neighbor pairs: exact cosine only within buckets.
    "ann_lsh_pairs" -> ((s, d) => {
      val b = emb(s, d).selectExpr("vec_id", "embedding AS v",
        "vec_norm2(embedding) AS n2",
        s"${lshBucketSpark("embedding")} AS bucket")
      b.as("a").join(b.as("b"),
          col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
        .selectExpr("a.vec_id AS vec_a", "b.vec_id AS vec_b",
          "CAST(floor(vec_dot(a.v, b.v) / (sqrt(a.n2) * sqrt(b.n2)) * 1000000) AS BIGINT) AS cos_ppm")
        .filter(col("cos_ppm") >= 100000)
        .orderBy(asc("vec_a"), asc("vec_b"))
    }),

    // IVF: coarse quantizer = per-label centroid (decimal component sums —
    // scale-invariant under cosine, so no division); queries probe the 2
    // nearest cells and rerank exactly inside them.
    "ann_ivf_probe" -> ((s, d) => {
      val e = emb(s, d)
      // centroid sum-vectors via e10-scaled integer sums — not decimals:
      // Spark FLOAT->DECIMAL rounds the float's shortest decimal repr,
      // DuckDB rounds the exact binary value, a ~1e-9 divergence that ppm
      // flooring only mostly masks. Integer sums match by construction;
      // the e10 scale is irrelevant under cosine (scale-invariant).
      val cent = e.select(col("label"), posexplode(col("embedding")))
        .selectExpr("label", "pos",
          "CAST(floor(CAST(col AS DOUBLE) * 10000000000) AS BIGINT) AS xe10")
        .groupBy(col("label"), col("pos"))
        .agg(sum(col("xe10")).as("sx"))
        .groupBy(col("label"))
        .agg(expr("transform(array_sort(collect_list(struct(pos, sx))), p -> cast(p.sx as double)) AS cv"))
      val q = e.filter(col("vec_id") < 5).selectExpr("vec_id AS query_id",
        "embedding AS qv", "vec_norm2(embedding) AS qn2")
      val probed = q.crossJoin(broadcast(cent))
        .selectExpr("query_id", "qv", "qn2", "label",
          s"${cosPpmSpark("qv", "cv")} AS cell_cos")
        .withColumn("cell_rank", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
            .orderBy(desc("cell_cos"), asc("label"))))
        .filter(col("cell_rank") <= 2)
        .select(col("query_id"), col("qv"), col("qn2"), col("label"))
      // rerank kernel reuses precomputed norms (IEEE-identical values)
      probed.join(e.selectExpr("vec_id", "label", "embedding AS v",
            "vec_norm2(embedding) AS n2"), Seq("label"))
        .filter(col("query_id") =!= col("vec_id"))
        .selectExpr("query_id", "vec_id AS neighbor_id",
          "CAST(floor(vec_dot(qv, v) / (sqrt(qn2) * sqrt(n2)) * 1000000) AS BIGINT) AS cos_ppm")
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
            .orderBy(desc("cos_ppm"), asc("neighbor_id"))))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("rank").cast("bigint").as("rank"),
          col("neighbor_id"), col("cos_ppm"))
        .orderBy(asc("query_id"), asc("rank"))
    }),

    // Product quantization + asymmetric distance (ADC) — the memory-bound
    // ANN scale path: vectors compress to M=8 one-byte codes (argmin over
    // the 256-entry sign-orthant codebook per 8-dim subspace), queries
    // score candidates via a per-query lookup table, never touching the
    // raw vectors. Distances are L2 via the pinned vec_norm2/vec_dot
    // kernels, fixed-point-scaled to e10 BIGINTs so the 8-subspace ADC sum
    // is exact integer math — order-independent on any engine. At 100 TB:
    // codebook and query tables broadcast, the codes relation is the big
    // side and never collects, ADC is a map-side join + small aggregation.
    "ann_pq_adc" -> ((s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val e = emb(s, d)
      val xsub = subvectors(e)
      // persisted: the codebook feeds both the encode join and the
      // per-query table — without the barrier each consumer re-aggregates
      // the full corpus
      val cent = CacheScope.persist(pqCodebook(xsub))
      val codes = pqEncode(xsub, cent).drop("cell")
      val qtab = pqQueryTable(e, cent)
      codes.join(broadcast(qtab), Seq("m", "code"))
        .filter(col("query_id") =!= col("vec_id"))
        .groupBy(col("query_id"), col("vec_id"))
        .agg(sum(col("qd_e10")).as("adc_e10"))
        .withColumn("rank", row_number().over(
          W.partitionBy(col("query_id")).orderBy(asc("adc_e10"), asc("vec_id"))))
        .filter(col("rank") <= 10)
        .selectExpr("query_id", "CAST(rank AS BIGINT) AS rank",
          "vec_id AS neighbor_id", "CAST(adc_e10 AS BIGINT) AS adc_e10")
        .orderBy(asc("query_id"), asc("rank"))
    }),

    // IVF + PQ/ADC composed — the production ANN shape at 100 TB: queries
    // probe the 2 nearest coarse cells (per-label centroids, the same
    // integer-e10 discipline as ann_ivf_probe), and candidates inside the
    // probed cells are scored from their 8-subspace PQ codes via the
    // per-query ADC table (same codebook/ADC kernel as ann_pq_adc) — the
    // raw vectors are never touched after encoding. Plan: codes ⨝ probed
    // cells is the only corpus-sized join and it's an equi-join on the
    // cell key with the tiny probed/qtab sides broadcast; memory per
    // executor is codes (M bytes per vector) not vectors (4·dim bytes).
    "ann_ivf_pq" -> ((s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val e = emb(s, d)
      // coarse quantizer: per-label centroid sum-vectors (scale-invariant
      // under cosine, integer sums so both engines agree exactly)
      val coarse = e.select(col("label"), posexplode(col("embedding")))
        .selectExpr("label", "pos",
          "CAST(floor(CAST(col AS DOUBLE) * 10000000000) AS BIGINT) AS xe10")
        .groupBy(col("label"), col("pos"))
        .agg(sum(col("xe10")).as("sx"))
        .groupBy(col("label"))
        .agg(expr("transform(array_sort(collect_list(struct(pos, sx))), p -> cast(p.sx as double)) AS cv"))
      val q = e.filter(col("vec_id") < 5)
        .selectExpr("vec_id AS query_id", "embedding AS qv")
      val probed = q.crossJoin(broadcast(coarse))
        .selectExpr("query_id", "label", s"${cosPpmSpark("qv", "cv")} AS cell_cos")
        .withColumn("cell_rank", row_number().over(
          W.partitionBy(col("query_id")).orderBy(desc("cell_cos"), asc("label"))))
        .filter(col("cell_rank") <= 2)
        .select(col("query_id"), col("label").as("cell"))
      // shared sign-orthant PQ codebook; the vector's IVF cell rides along
      // in the codes relation so the probe join below is an equi-join
      val xsub = subvectors(e)
      val cent = CacheScope.persist(pqCodebook(xsub))
      val codes = pqEncode(xsub, cent)
      val qtab = pqQueryTable(e, cent)
      codes.join(broadcast(probed), Seq("cell"))
        .join(broadcast(qtab), Seq("query_id", "m", "code"))
        .filter(col("query_id") =!= col("vec_id"))
        .groupBy(col("query_id"), col("vec_id"))
        .agg(sum(col("qd_e10")).as("adc_e10"))
        .withColumn("rank", row_number().over(
          W.partitionBy(col("query_id")).orderBy(asc("adc_e10"), asc("vec_id"))))
        .filter(col("rank") <= 10)
        .selectExpr("query_id", "CAST(rank AS BIGINT) AS rank",
          "vec_id AS neighbor_id", "CAST(adc_e10 AS BIGINT) AS adc_e10")
        .orderBy(asc("query_id"), asc("rank"))
    }),

    // Per-vector norms + per-label norm envelope (no float summation —
    // min/max only, deterministic).
    "vector_stats" -> ((s, d) =>
      emb(s, d)
        .selectExpr("label",
          s"CAST(floor(sqrt(${norm2Spark("embedding", Dim)}) * 1000000) AS BIGINT) AS norm_ppm")
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"),
          min(col("norm_ppm")).as("min_norm_ppm"),
          max(col("norm_ppm")).as("max_norm_ppm"))
        .orderBy(asc("label")))
  )

  def oracles: Map[String, String] = Map(
    "ann_bruteforce_topk" ->
      ("WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5), " +
        "scored AS (SELECT query_id, e.vec_id AS neighbor_id, " +
        s"${cosPpmDuck("qv", "e.embedding")} AS cos_ppm, " +
        s"row_number() OVER (PARTITION BY query_id ORDER BY ${cosPpmDuck("qv", "e.embedding")} DESC, e.vec_id) AS rank " +
        "FROM q JOIN embeddings e ON e.vec_id <> query_id) " +
        "SELECT query_id, rank, neighbor_id, cos_ppm FROM scored WHERE rank <= 10 " +
        "ORDER BY query_id, rank"),
    "ann_lsh_buckets" ->
      (s"WITH b AS (SELECT vec_id, label, CAST(${lshBucketDuck("embedding")} AS BIGINT) AS bucket FROM embeddings) " +
        "SELECT bucket, count(*) AS n_vectors, min(vec_id) AS min_vec_id, " +
        "max(vec_id) AS max_vec_id, count(DISTINCT label) AS n_labels " +
        "FROM b GROUP BY bucket ORDER BY bucket"),
    "ann_lsh_pairs" ->
      (s"WITH b AS (SELECT vec_id, embedding AS v, ${lshBucketDuck("embedding")} AS bucket FROM embeddings) " +
        s"SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b, ${cosPpmDuck("a.v", "b2.v")} AS cos_ppm " +
        "FROM b AS a JOIN b AS b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id " +
        s"WHERE ${cosPpmDuck("a.v", "b2.v")} >= 100000 ORDER BY vec_a, vec_b"),
    "ann_ivf_probe" ->
      ("WITH comp AS (SELECT label, r.range AS pos, " +
        "CAST(sum(CAST(floor(list_extract(embedding, r.range)::DOUBLE * 10000000000) AS BIGINT)) AS BIGINT) AS sx " +
        "FROM embeddings CROSS JOIN range(1, 65) r GROUP BY label, r.range), " +
        "cent AS (SELECT label, list_transform(list(sx ORDER BY pos), x -> x::DOUBLE) AS cv " +
        "FROM comp GROUP BY label), " +
        "q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5), " +
        "cells AS (SELECT query_id, qv, label, " +
        s"row_number() OVER (PARTITION BY query_id ORDER BY ${cosPpmDuck("qv", "cv")} DESC, label) AS cell_rank " +
        "FROM q CROSS JOIN cent), " +
        "probed AS (SELECT query_id, qv, label FROM cells WHERE cell_rank <= 2), " +
        "scored AS (SELECT query_id, e.vec_id AS neighbor_id, " +
        s"${cosPpmDuck("qv", "e.embedding")} AS cos_ppm, " +
        s"row_number() OVER (PARTITION BY query_id ORDER BY ${cosPpmDuck("qv", "e.embedding")} DESC, e.vec_id) AS rank " +
        "FROM probed JOIN embeddings e USING (label) WHERE e.vec_id <> query_id) " +
        "SELECT query_id, rank, neighbor_id, cos_ppm FROM scored WHERE rank <= 5 " +
        "ORDER BY query_id, rank"),
    "ann_pq_adc" ->
      (s"WITH $pqDuckCtes, " +
        "adc AS (SELECT query_id, vec_id, CAST(sum(qd_e10) AS BIGINT) AS adc_e10 " +
        "FROM codes JOIN qtab USING (m, code) WHERE query_id <> vec_id " +
        "GROUP BY query_id, vec_id), " +
        "ranked AS (SELECT query_id, vec_id, adc_e10, row_number() OVER " +
        "(PARTITION BY query_id ORDER BY adc_e10 ASC, vec_id) AS rank FROM adc) " +
        "SELECT query_id, rank, vec_id AS neighbor_id, adc_e10 " +
        "FROM ranked WHERE rank <= 10 ORDER BY query_id, rank"),
    "ann_ivf_pq" ->
      (s"WITH comp2 AS (SELECT label, r.range AS pos, " +
        "CAST(sum(CAST(floor(list_extract(embedding, r.range)::DOUBLE * 10000000000) AS BIGINT)) AS BIGINT) AS sx " +
        "FROM embeddings CROSS JOIN range(1, 65) r GROUP BY label, r.range), " +
        "coarse AS (SELECT label, list_transform(list(sx ORDER BY pos), x -> x::DOUBLE) AS ccv " +
        "FROM comp2 GROUP BY label), " +
        "q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5), " +
        "cells AS (SELECT query_id, label, " +
        s"row_number() OVER (PARTITION BY query_id ORDER BY ${cosPpmDuck("qv", "ccv")} DESC, label) AS cell_rank " +
        "FROM q CROSS JOIN coarse), " +
        "probed AS (SELECT query_id, label AS cell FROM cells WHERE cell_rank <= 2), " +
        s"$pqDuckCtes, " +
        "adc AS (SELECT p.query_id, k.vec_id, CAST(sum(t.qd_e10) AS BIGINT) AS adc_e10 " +
        "FROM codes k JOIN probed p ON k.cell = p.cell " +
        "JOIN qtab t ON t.query_id = p.query_id AND t.m = k.m AND t.code = k.code " +
        "WHERE p.query_id <> k.vec_id GROUP BY p.query_id, k.vec_id), " +
        "ranked AS (SELECT query_id, vec_id, adc_e10, row_number() OVER " +
        "(PARTITION BY query_id ORDER BY adc_e10 ASC, vec_id) AS rank FROM adc) " +
        "SELECT query_id, rank, vec_id AS neighbor_id, adc_e10 " +
        "FROM ranked WHERE rank <= 10 ORDER BY query_id, rank"),
    "vector_stats" ->
      (s"SELECT label, count(*) AS n, " +
        s"min(CAST(floor(sqrt(${norm2Duck("embedding", Dim)}) * 1000000) AS BIGINT)) AS min_norm_ppm, " +
        s"max(CAST(floor(sqrt(${norm2Duck("embedding", Dim)}) * 1000000) AS BIGINT)) AS max_norm_ppm " +
        "FROM embeddings GROUP BY label ORDER BY label")
  )
}
