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
  *  - `ann_ivf_probe`: IVF with a LEARNED coarse quantizer (hash-seeded
  *    k-means), queries probe the nearest 2 cells, exact rerank inside
  *    probed cells only.
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

  /** Leading dimensions covered by the declared covariance query (the full
    * Dim-wide Gram matrix is the same plan with Dim² constant-width
    * partials; 16 keeps the oracle output readable at 136 pairs). */
  private val CovDims = 16

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

  /** n-ADAPTIVE plane count for the lsh_buckets/lsh_pairs pair: the
    * smallest p ≥ NPlanes with 2^p ≥ n/100, so bucket population pins at
    * ~100 as the corpus grows and the in-bucket pair stream stays LINEAR
    * in n. A fixed plane count is a fixed-cardinality block key — bucket
    * size n/2^NPlanes, pair stream n²/2^NPlanes, the same quadratic shape
    * the dedup blocking killed in round 10 (measured: 10× rows grew the
    * per-vector pair yield 10× at fixed planes). Engine-neutral integer
    * formula: bit length of (n−1) div 100 — `length(bin(q))` in BOTH SQL
    * dialects (unpadded in Spark and DuckDB), mirrored in the oracle as a
    * scalar subquery over the same table. Identical to the fixed default
    * at every test SF (planes = 8 up to n = 25 600), so this is purely
    * the at-scale schedule. */
  private[graft] def lshPlanesFor(n: Long): Int = {
    val q = (n - 1) / 100
    math.max(NPlanes, if (q <= 0) 1 else 64 - java.lang.Long.numberOfLeadingZeros(q))
  }

  private val lshPlanesCache = new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  /** The adaptive plane count for a corpus, memoized per (session, dir) —
    * deriving it at query-construction time runs a count() job, and an
    * uncached one would fire on every construction (plan audits, each
    * verify run) for a value that cannot change under the immutable-
    * corpus-dir contract the other per-dir artifacts already assume. */
  private def lshPlanesOf(s: SparkSession, d: String): Int =
    lshPlanesCache.computeIfAbsent(s"${System.identityHashCode(s)}#$d",
      _ => Integer.valueOf(lshPlanesFor(emb(s, d).count()))).intValue

  /** Oracle-side structural plane budget: terms above the scalar-subquery
    * plane count are CASE'd to 0, so one static SQL string follows the
    * adaptive schedule up to 2^24 buckets (n ≈ 1.6e9 at ~100/bucket). */
  private val MaxOraclePlanes = 24

  private def lshDotDuck(v: String, j: Int): String =
    "list_reduce(list_prepend(0.0::DOUBLE, list_transform(" +
      s"range(1, ${Dim + 1}), i -> list_extract($v, i)::DOUBLE * list_extract([" +
      (1 to Dim).map(i => s"${hyper(j, i)}::DOUBLE").mkString(",") + "], i))), (acc, x) -> acc + x)"

  /** Adaptive-plane bucket id — same bucket on the DuckDB side (identical
    * hyperplane literals): `np` must be a column in scope (see
    * [[lshPlanesDuckCte]]). */
  private def lshBucketDuckAdaptive(v: String): String =
    (0 until MaxOraclePlanes).map { j =>
      s"(CASE WHEN $j < np AND ${lshDotDuck(v, j)} > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** One-row CTE exposing the adaptive plane count as `np` — the oracle
    * twin of [[lshPlanesFor]]. */
  private def lshPlanesDuckCte: String =
    s"npc AS (SELECT greatest($NPlanes, " +
      "length(bin(greatest(1, (SELECT (count(*) - 1) // 100 FROM embeddings))))) AS np)"

  /** DuckDB cosine-ppm twin of the inline vec_dot/vec_norm2 renderings
    * (identical index-order double accumulation, so floor-ppm matches). */
  private def cosPpmDuck(a: String, b: String): String =
    s"CAST(floor(${dotDuck(a, b, Dim)} / (sqrt(${norm2Duck(a, Dim)}) * " +
      s"sqrt(${norm2Duck(b, Dim)})) * 1000000) AS BIGINT)"

  // ---------------------------------------------------------------------
  // Learned quantizers (round 7). Both the IVF coarse partitioner and the
  // PQ sub-quantizer codebooks are trained with unrolled Lloyd (k-means)
  // iterations from hash-seeded starting points — nothing is derived from
  // the `label` column any more. Determinism discipline (so the DuckDB
  // oracle replays training bit-exactly):
  //  - seeds are the K vectors with the smallest (vec_id·scramble mod P,
  //    vec_id) — a top-K, integer-exact on both engines;
  //  - every mean is integer e10-floored component sums / (1e10 · count),
  //    so memberships (integers) fully determine the centroid doubles;
  //  - every distance is the pinned vec_norm2/vec_dot double kernels with
  //    identical evaluation order, and every argmin tie-breaks on the
  //    (dist, id) pair — min_by(struct) here, row_number(ORDER BY dist,
  //    id) there;
  //  - a cluster that loses all members simply drops out (both engines).
  // Measured at sf0.1 (IvfPqRecallSpec, top-10 vs exact L2): pq_adc
  // 0.24 → ~0.6, ivf_pq 0.14 → ~0.6. Memory: PqM bytes of codes per
  // vector vs 256 raw — the ratio that makes 100 TB ANN fit.
  // ---------------------------------------------------------------------

  /** PQ geometry: 16 subspaces × 4 dims, 128 learned entries each, 2 Lloyd
    * refinements. 16×4 halves the per-subspace volume vs the round-6 8×8
    * split — measured +0.3 recall for 2× code bytes (16 vs 8 per vector). */
  private val PqM = 16
  private val PqSubDim = Dim / PqM
  private val PqK = 128
  private val PqIters = 2
  /** IVF coarse geometry: 10 learned cells, 2 Lloyd refinements; every
    * vector is indexed under its 2 nearest cells (multi-assignment — 2×
    * the codes relation buys back the neighbors that straddle a cell
    * boundary, the classic IVF recall failure), queries probe 2 cells. */
  private val CoarseK = 10
  private val CoarseIters = 2
  private val MultiAssign = 2
  private val ProbeCells = 2

  /** Similarity bar for ann_range_search (cos ≥ 0.2): radius semantics —
    * all matches above the bar, no fixed k. */
  private val RangeTauPpm = 200000L

  /** Probe depth for the range tier — wider than top-k's probe-2 because a
    * LOW similarity bar spreads true matches across many cells (measured:
    * probe-2 recall 0.42-0.93 per query at sf0.1; probe-4 is the
    * accuracy/cost point the declared semantics pin, and
    * ann_range_recall_eval keeps the number on the dashboard). */
  private val RangeProbeCells = 4
  // The Spark side renders best-k via NearestTwoCodes/NearestKCodes while
  // the oracle renders `rk <= k` / `[1:N]` from these constants — any
  // depth change must move BOTH renderings (probedCells + the CTE
  // parameters) or the engines diverge and surface only as an opaque gate
  // hash mismatch. The top-k tiers' fast path stays pinned at 2.
  require(MultiAssign == 2 && ProbeCells == 2,
    "the top-k tiers' multi-assign/probe are pinned at 2 (NearestTwoCodes fast path); " +
      "deeper probes must go through probedCells(k)/coarseDuckCtes(probeK)")

  private def l2DistSpark(v: String, c: String): String =
    s"vec_norm2($v) - 2 * vec_dot($v, $c) + vec_norm2($c)"
  private def l2DistDuck(v: String, c: String, dim: Int): String =
    s"${norm2Duck(v, dim)} - 2 * ${dotDuck(v, c, dim)} + ${norm2Duck(c, dim)}"
  /** Shifted assignment score: n2(c) − 2·⟨x,c⟩. The n2(x) term is constant
    * within one vector's argmin, so dropping it preserves the ordering —
    * but IEEE addition is not exact, so BOTH engines must drop it (they
    * do: this builder and its Duck twin are the only assignment scores). */
  private def shiftDistDuck(v: String, c: String, dim: Int): String =
    s"${norm2Duck(c, dim)} - 2 * ${dotDuck(v, c, dim)}"
  private def scrambleSql = s"(vec_id * $CoinScramble) % $P"

  // Assignment/encode runs as the native codegen'd quantizer expressions
  // (functions/QuantizerExpressions.scala): the codebook — bounded by M·K
  // entries, the same smallness argument as a broadcast build — is
  // collected once per Lloyd round and embedded in the expression, so a
  // round is ONE tight map pass over the corpus plus the tiny mean
  // re-aggregation. Interpreted HOF folds and (row × entry) broadcast
  // joins both measured 3-5× slower here.
  import graft.functions.QuantizerCodebook.Entries

  private def nearestCode(vec: org.apache.spark.sql.Column,
      m: org.apache.spark.sql.Column, cb: Entries): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftColumns.of(graft.functions.NearestCode(
      org.apache.spark.sql.GraftColumns.expr(vec),
      org.apache.spark.sql.GraftColumns.expr(m), cb))

  private def nearestTwo(vec: org.apache.spark.sql.Column, cb: Entries): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftColumns.of(graft.functions.NearestTwoCodes(
      org.apache.spark.sql.GraftColumns.expr(vec),
      org.apache.spark.sql.GraftColumns.expr(lit(0)), cb))

  private def nearestK(vec: org.apache.spark.sql.Column, cb: Entries,
      k: Int): org.apache.spark.sql.Column =
    if (k == 2) nearestTwo(vec, cb) // identical semantics; shared codegen
    else org.apache.spark.sql.GraftColumns.of(graft.functions.NearestKCodes(
      org.apache.spark.sql.GraftColumns.expr(vec),
      org.apache.spark.sql.GraftColumns.expr(lit(0)), cb, k))

  /** The e10-floored mean re-aggregation — the ONE arithmetic the
    * cross-engine training determinism rests on (integer component sums
    * fully determine the centroid doubles), shared by the coarse and PQ
    * Lloyd rounds. Input must carry `keys` + a vector column; output is
    * keys + `cv`. */
  private def e10Means(asn: DataFrame, vecCol: String, keys: Seq[String]): DataFrame =
    asn.select(keys.map(col) :+ posexplode(col(vecCol)): _*)
      .selectExpr(keys ++ Seq("pos",
        "CAST(floor(CAST(col AS DOUBLE) * 10000000000) AS BIGINT) AS xe10"): _*)
      .groupBy((keys :+ "pos").map(col): _*)
      .agg(sum(col("xe10")).as("sx"), count(lit(1)).as("cnt"))
      .groupBy(keys.map(col): _*)
      .agg(expr("transform(array_sort(collect_list(struct(pos, sx, cnt))), " +
        "p -> CAST(p.sx AS DOUBLE) / (10000000000D * p.cnt)) AS cv"))

  /** DuckDB twin of [[e10Means]] as a 3-CTE block `<pfx>agg/<pfx>c0/
    * <pfx>cent$i`; `joinSrc` must expose the key columns, `pos`, `xe10`. */
  private def duckMeanCtes(pfx: String, i: Int, keyCols: String, joinSrc: String): String =
    s"${pfx}agg$i AS (SELECT $keyCols, pos, CAST(sum(xe10) AS BIGINT) AS sx, count(*) AS cnt " +
      s"FROM $joinSrc GROUP BY $keyCols, pos), " +
      s"${pfx}c0$i AS (SELECT $keyCols, list_transform(list(sx ORDER BY pos), s -> s::DOUBLE) AS svec, " +
      s"max(cnt) AS cnt FROM ${pfx}agg$i GROUP BY $keyCols), " +
      s"${pfx}cent$i AS (SELECT $keyCols, list_transform(svec, s -> s / (10000000000.0 * cnt)) AS cv " +
      s"FROM ${pfx}c0$i), "

  /** Pack (id, centroid) rows into codebook entries: ids ascending, flat
    * code-major centroids, squared norms via the SAME index-ordered fold
    * as vec_norm2 / the oracle's list_reduce. */
  private def packEntries(rows: Seq[Array[(Int, Array[Double])]], subDim: Int): Entries = {
    val sorted = rows.map(_.sortBy(_._1))
    Entries(
      codes = sorted.map(_.map(_._1)).toArray,
      cvs = sorted.map(_.flatMap(_._2)).toArray,
      n2s = sorted.map(_.map { case (_, cv) =>
        var a = 0.0; var i = 0
        while (i < cv.length) { a += cv(i) * cv(i); i += 1 }
        a
      }).toArray,
      subDim = subDim)
  }

  /** Collect a (cell, cv) frame into a single-subspace codebook. */
  private def collectCoarse(df: DataFrame): Entries =
    packEntries(Seq(df.collect().map(r => (r.getInt(0), r.getSeq[Double](1).toArray))), Dim)

  /** Collect an (m, code, cv) frame into the per-subspace codebook. */
  private def collectPq(df: DataFrame): Entries = {
    val rows = df.collect().map(r => (r.getInt(0), (r.getInt(1), r.getSeq[Double](2).toArray)))
    packEntries((0 until PqM).map(m => rows.filter(_._1 == m).map(_._2)), PqSubDim)
  }

  // ---------------------------------------------------------------------
  // Trained-artifact cache: IVF cells and PQ codebooks are INDEX artifacts
  // — in production they are built offline (once per corpus snapshot) and
  // served to every query; only the assignment/encode/ADC passes are
  // query-time work. Training here is fully deterministic (hash seeds,
  // e10-integer means), so two builds over the same corpus dir are
  // bit-identical and caching them is semantics-free. Keyed by corpus dir
  // + geometry; a production deployment would key by snapshot/content
  // hash instead of path. Entries are tiny driver-side arrays (≤ M·K·subDim
  // doubles), never DataFrames — nothing here pins a SparkSession.
  // ---------------------------------------------------------------------
  private val artifactCache = new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()
  private def cachedArtifact[T <: AnyRef](key: String)(build: => T): T =
    artifactCache.computeIfAbsent(key, _ => build).asInstanceOf[T]
  /** Test hook: force cold builds (IvfPqRecallSpec timing, cache hygiene). */
  private[graft] def clearArtifacts(): Unit = artifactCache.clear()

  private[graft] def coarseFor(dir: String, e: DataFrame): Entries =
    cachedArtifact(s"$dir#coarse-$CoarseK-$CoarseIters")(coarseCentroids(e))

  /** Corpus-sized cell count for near-dup BLOCKING: K = max(10, n div
    * TargetCellVectors). This is the knob that makes the pair stream
    * linear — at fixed K, 10× the vectors means 10× the cell size and
    * 100× the within-cell pairs (measured: the 3.7× wall ratio in the
    * round-10 scaling table before this); with K ∝ n the expected cell
    * size is CONSTANT and candidates grow as k·n·cellSize. The SAME
    * formula is rendered into the oracle as a scalar subquery, so both
    * engines derive K from the data. ANN keeps the fixed CoarseK probe
    * geometry — its recall floor is enforced by the exact rerank tier. */
  private[graft] val TargetCellVectors = 100L
  private[graft] def blockingCellCount(n: Long): Int =
    math.max(10L, n / TargetCellVectors).toInt
  private[graft] def blockingCellCountDuck: String =
    s"greatest(10, (SELECT count(*) // $TargetCellVectors FROM embeddings))"

  private[graft] def coarseForK(dir: String, e: DataFrame, k: Int): Entries =
    cachedArtifact(s"$dir#coarse-$k-$CoarseIters")(coarseCentroids(e, k))

  /** Corpus-side (vec_id, cell) under the learned coarse quantizer with
    * `assignK`-cell multi-assignment — the blocking relation Dedup's
    * embedding near-dup shares (SemDeDup shape: candidate pairs live
    * within a cell; multi-assignment buys back pairs straddling a cell
    * boundary — the dedup consumer uses depth 3, measured 0.71 → 0.93
    * recall of the exact near-dup truth at sf0.1; ANN keeps best-two).
    * `e` must expose `vec_id` + `embedding`. The codebook is the same
    * cached offline artifact the ann_ivf_* family serves from — blocking
    * costs one codegen'd best-k pass over the corpus, no extra training. */
  private[graft] def coarseCells(dir: String, e: DataFrame,
      assignK: Int = MultiAssign, cells: Int = CoarseK): DataFrame = {
    val cb = if (cells == CoarseK) coarseFor(dir, e) else coarseForK(dir, e, cells)
    e.select(col("vec_id"),
      explode(nearestK(col("embedding"), cb, assignK)).as("cell"))
  }

  /** Oracle twin of [[coarseCells]]: CTE chain whose `cassign` member is
    * the (vec_id, cell) multi-assignment at depth `assignK` over `kSql`
    * cells (a SQL expression — constant or scalar subquery; also defines
    * `qprob`, unused by blocking-only callers — DuckDB prunes
    * unreferenced CTEs). */
  private[graft] def coarseCellsDuckCtes(assignK: Int = MultiAssign,
      kSql: String = CoarseK.toString): String =
    coarseDuckCtes(assignK, kSql)

  // --- integer power-iteration PCA ---------------------------------------

  /** Unrolled matvec+rescale rounds (mirrored as CTE stages in the oracle). */
  private val PcaIters = 12

  /** 10^max(digits(maxAbs)−6, 0): the uniform decimal rescale that keeps
    * every matvec term inside int64. Digit count is the engine-neutral
    * integer log10 (same idiom as doc_length_histogram); 10^k is an exact
    * double well past any k reachable here, so the CAST is exact. */
  private def rescaleFactor(maxAbs: Long): Long = {
    val excess = math.max(maxAbs.toString.length - 6, 0)
    math.pow(10, excess.toDouble).toLong
  }

  /** Leading principal direction of the e4-quantized embeddings as a
    * Dim-long integer vector (magnitude ≤ ~10⁶). Deterministic: fixed ones
    * start vector, truncate-toward-zero divisions (Java `/`, matching the
    * oracle's sign-split `//`), order-free integer sums — so two builds,
    * or the DuckDB twin, produce identical components. Cached per corpus
    * dir like the IVF/PQ artifacts. */
  private def pcaDirection(dir: String, e: DataFrame): Array[Long] =
    cachedArtifact(s"$dir#pca-$Dim-$PcaIters") {
      val rows = e
        .select(col("embedding").as("v"))
        .select(col("v"), posexplode(col("v")).as(Seq("i", "vi")))
        .select(col("i"),
          expr("CAST(floor(CAST(vi AS DOUBLE) * 10000) AS BIGINT) AS xi"),
          posexplode(col("v")).as(Seq("j", "vj")))
        .filter(col("j") >= col("i"))
        .selectExpr("i", "j", "xi",
          "CAST(floor(CAST(vj AS DOUBLE) * 10000) AS BIGINT) AS xj")
        .groupBy(col("i"), col("j"))
        .agg(count(lit(1)).as("n"), sum(col("xi")).as("sxi"),
          sum(col("xj")).as("sxj"), sum(expr("xi * xj")).as("sxixj"))
        .collect()
      // Loud-overflow guard on the documented ~7·10⁵-vector headroom: the
      // moment SUMS are int64-safe to ~10¹¹ vectors, but the scatter
      // products n·S_ij and S_i·S_j grow with n² — beyond headroom a
      // plain `*` wraps silently under non-ANSI arithmetic and the
      // direction is garbage with no error (while the DuckDB twin would
      // raise, breaking parity asymmetrically). multiplyExact/
      // subtractExact turn that wrap into an immediate ArithmeticException
      // pointing at the DECIMAL(38,0) migration path.
      def exact(n: Long, sxixj: Long, sxi: Long, sxj: Long): Long =
        try Math.subtractExact(Math.multiplyExact(n, sxixj), Math.multiplyExact(sxi, sxj))
        catch {
          case e: ArithmeticException => throw new ArithmeticException(
            s"pcaDirection scatter entry exceeds int64 at n=$n vectors — " +
              "re-aggregate the moments as DECIMAL(38,0) (see headroom note): " + e.getMessage)
        }
      val m = Array.ofDim[Long](Dim, Dim)
      rows.foreach { r =>
        val (i, j) = (r.getInt(0), r.getInt(1))
        val entry = exact(r.getLong(2), r.getLong(5), r.getLong(3), r.getLong(4))
        m(i)(j) = entry; m(j)(i) = entry // scatter matrix is symmetric
      }
      val sM = rescaleFactor(m.flatten.map(math.abs).max)
      for (i <- 0 until Dim; j <- 0 until Dim) m(i)(j) /= sM
      var v = Array.fill(Dim)(1L)
      for (_ <- 1 to PcaIters) {
        val u = Array.tabulate(Dim)(i => (0 until Dim).map(j => m(i)(j) * v(j)).sum)
        val sU = rescaleFactor(u.map(math.abs).max)
        v = u.map(_ / sU)
      }
      v
    }

  /** DuckDB twin of the full pcaDirection + projection pipeline — moments,
    * scatter matrix, uniform rescale, PcaIters matvec rounds, projection —
    * entirely in SQL (each round is one join + groupBy CTE pair). The
    * sign-split `//` reproduces truncate-toward-zero on negatives. */
  private def pcaOracleSql: String = {
    def tdiv(x: String, s: String) =
      s"CASE WHEN $x < 0 THEN -((-($x)) // $s) ELSE ($x) // $s END"
    def scaleOf(col: String) =
      s"CAST(power(10, greatest(length(CAST(max(abs($col)) AS VARCHAR)) - 6, 0)) AS BIGINT) AS s"
    val iters = (1 to PcaIters).map { t =>
      val pv = if (t == 1) "v0" else s"v${t - 1}"
      s"u$t AS MATERIALIZED (SELECT m1.i AS k, CAST(sum(m1.m * $pv.v) AS BIGINT) AS u " +
        s"FROM m1 JOIN $pv ON m1.j = $pv.k GROUP BY m1.i), " +
        s"s$t AS MATERIALIZED (SELECT ${scaleOf("u")} FROM u$t), " +
        s"v$t AS MATERIALIZED (SELECT k, ${tdiv("u", "s")} AS v FROM u$t, s$t)"
    }.mkString(", ")
    s"WITH q AS (SELECT pi.i AS i, pj.j AS j, " +
      "CAST(floor(list_extract(embedding, pi.i + 1)::DOUBLE * 10000) AS BIGINT) AS xi, " +
      "CAST(floor(list_extract(embedding, pj.j + 1)::DOUBLE * 10000) AS BIGINT) AS xj " +
      s"FROM embeddings, range(0, $Dim) pi(i), range(0, $Dim) pj(j)), " +
      "mom AS MATERIALIZED (SELECT i, j, count(*) AS n, CAST(sum(xi) AS BIGINT) AS si, " +
      "CAST(sum(xj) AS BIGINT) AS sj, CAST(sum(xi * xj) AS BIGINT) AS sij " +
      "FROM q GROUP BY i, j), " +
      "m0 AS MATERIALIZED (SELECT i, j, n * sij - si * sj AS m FROM mom), " +
      s"msc AS MATERIALIZED (SELECT ${scaleOf("m")} FROM m0), " +
      s"m1 AS MATERIALIZED (SELECT i, j, ${tdiv("m", "s")} AS m FROM m0, msc), " +
      s"v0 AS MATERIALIZED (SELECT t.k AS k, CAST(1 AS BIGINT) AS v FROM range(0, $Dim) t(k)), " +
      iters + ", " +
      s"proj AS (SELECT e.label, e.vec_id, CAST(sum(v$PcaIters.v * " +
      s"CAST(floor(list_extract(e.embedding, v$PcaIters.k + 1)::DOUBLE * 10000) AS BIGINT)) AS BIGINT) AS score " +
      s"FROM embeddings e, v$PcaIters GROUP BY e.label, e.vec_id) " +
      "SELECT CAST(label AS BIGINT) AS label, count(*) AS n_vecs, " +
      "min(score) AS min_score, max(score) AS max_score, " +
      "CAST(sum(score) AS BIGINT) AS sum_score " +
      "FROM proj GROUP BY label ORDER BY label"
  }

  private def pqFor(dir: String, e: DataFrame, xsub: DataFrame): Entries =
    cachedArtifact(s"$dir#pq-$PqM-$PqK-$PqIters")(pqCodebookEntries(e, xsub))

  /** K hash-seed rows (vec_id, id ∈ [0, k)) — the k smallest scrambled
    * vec_ids. orderBy+limit plans as TakeOrderedAndProject (a distributed
    * top-K, no global sort); the row_number window only ranks the k
    * survivors. */
  private def hashSeeds(e: DataFrame, k: Int, idCol: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window.orderBy(col("h"), col("vec_id"))
    e.selectExpr("vec_id", s"$scrambleSql AS h")
      .orderBy(col("h"), col("vec_id")).limit(k)
      .withColumn(idCol, row_number().over(W) - 1)
      .select(col("vec_id"), col(idCol))
  }

  /** Learned IVF coarse quantizer: CoarseK centroids, hash-seeded, refined
    * by CoarseIters Lloyd rounds over the full corpus. Each round is one
    * codegen'd map pass (native argmin over the embedded codebook) + the
    * tiny mean re-aggregation, collected into the next round's codebook —
    * plan depth stays O(1) without checkpoints. At 100 TB the standard
    * refinement is to train on a hash-coin sample and assign the full
    * corpus once — same code path with a sampled `e`. */
  private def coarseCentroids(e: DataFrame, k: Int = CoarseK): Entries = {
    var cb = collectCoarse(hashSeeds(e, k, "cell")
      .join(e.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .selectExpr("cell", "transform(embedding, x -> CAST(x AS DOUBLE)) AS cv"))
    for (_ <- 1 to CoarseIters) {
      val asn = e.select(nearestCode(col("embedding"), lit(0), cb).as("cell"),
        col("embedding"))
      cb = collectCoarse(e10Means(asn, "embedding", Seq("cell")))
    }
    cb
  }

  /** Multi-assignment: each vector indexed under its MultiAssign (= 2)
    * nearest cells — one codegen'd best-two pass, no scored relation, no
    * shuffle. */
  private def coarseAssign(e: DataFrame, cb: Entries): DataFrame =
    e.select(col("vec_id"), explode(nearestTwo(col("embedding"), cb)).as("cell"))

  /** Query-side probe: the k nearest cells per query (default ProbeCells
    * = 2 for the top-k tiers; the range tier passes RangeProbeCells), by
    * the same (shifted-)L2 metric the ADC scoring uses (metric-consistent
    * probing — the round-6 cosine probe paid recall for nothing). The ONE
    * place the query-set predicate and probe shape live — tiers must not
    * inline their own copy or the engines' probe depths can silently
    * diverge from the oracle's `rk <= k`. */
  private def probedCells(e: DataFrame, cb: Entries,
      k: Int = ProbeCells): DataFrame =
    e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"),
        explode(nearestK(col("embedding"), cb, k)).as("cell"))

  /** Probed IVF member list (query_id, vec_id), persisted per invocation
    * (CacheScope). The plan is identical wherever it's built, so the
    * session cache manager canonicalizes and dedupes: when a composed
    * eval (ann_recall_eval, ann_quantization_pareto) runs several tiers
    * in ONE invocation, the assignment+probe pass runs once — previously
    * each tier re-ran the corpus argmin. distinct: a vector whose 2
    * assigned cells are BOTH probed must not double its score. */
  private def ivfMember(s: SparkSession, d: String): DataFrame =
    CacheScope.persistKeyed(s"ivfMember#${System.identityHashCode(s)}#$d", () => {
      val e = emb(s, d)
      val coarse = coarseFor(d, e)
      coarseAssign(e, coarse)
        .join(broadcast(probedCells(e, coarse)), Seq("cell"))
        .select(col("query_id"), col("vec_id")).distinct()
    })

  /** The IVF+PQ ADC rank relation (query_id, vec_id, adc_e10, rank ≤ 50),
    * persisted per invocation — the shared prefix of ann_ivf_pq (rank ≤
    * 10 with scores) and ann_ivf_pq_refined (rank ≤ 50 shortlist): one
    * codes ⨝ member ⨝ qtab pass instead of two when both tiers run in
    * one composed eval. row_number semantics identical to both former
    * inline copies (asc adc_e10, asc vec_id). */
  private def ivfAdcRanked(s: SparkSession, d: String): DataFrame =
    CacheScope.persistKeyed(s"ivfAdcRanked#${System.identityHashCode(s)}#$d", () => {
      val W = org.apache.spark.sql.expressions.Window
      val e = emb(s, d)
      val xsub = CacheScope.persistKeyed(
        s"xsub#${System.identityHashCode(s)}#$d", () => subvectors(e))
      val cb = pqFor(d, e, xsub)
      pqEncode(xsub, cb)
        .join(broadcast(ivfMember(s, d)), Seq("vec_id"))
        .join(broadcast(pqQueryTable(xsub, centFrame(s, cb))), Seq("query_id", "m", "code"))
        .filter(col("query_id") =!= col("vec_id"))
        .groupBy(col("query_id"), col("vec_id"))
        .agg(sum(col("qd_e10")).as("adc_e10"))
        .withColumn("rank", row_number().over(
          W.partitionBy(col("query_id")).orderBy(asc("adc_e10"), asc("vec_id"))))
        .filter(col("rank") <= 50)
    })

  /** Exact cosine top-10 truth, persisted per invocation — every recall
    * eval composed into one query invocation reads ONE materialization of
    * the probe×corpus kernel (released by the caller's releaseAll). */
  private def bruteTruth(s: SparkSession, d: String): DataFrame =
    CacheScope.persistKeyed(s"bruteTruth#${System.identityHashCode(s)}#$d",
      () => queries("ann_bruteforce_topk")(s, d))

  /** (vec_id, m, xs = PqSubDim-dim subvector) for every vector. */
  private def subvectors(e: DataFrame): DataFrame =
    e.select(col("vec_id"), col("embedding"),
        explode(expr(s"sequence(0, ${PqM - 1})")).as("m"))
      .selectExpr("vec_id", "m", s"slice(embedding, m * $PqSubDim + 1, $PqSubDim) AS xs")

  /** Learned PQ codebook: PqK entries per subspace, seeded from one shared
    * hash-selected seed-vector list (each seed contributes its m-th
    * subvector to subspace m) and refined by PqIters Lloyd rounds — same
    * pass structure and scale notes as [[coarseCentroids]]. Returns the
    * packed codebook plus the equivalent (m, code, cv) frame (rebuilt from
    * the collected values, zero recompute) for the ADC query table. */
  private def pqCodebookEntries(e: DataFrame, xsub: DataFrame): Entries = {
    var cb = collectPq(hashSeeds(e, PqK, "code")
      .join(xsub, Seq("vec_id"))
      .selectExpr("m", "code", "transform(xs, x -> CAST(x AS DOUBLE)) AS cv"))
    for (_ <- 1 to PqIters) {
      val asn = xsub.select(col("m"), col("xs"),
        nearestCode(col("xs"), col("m"), cb).as("code"))
      cb = collectPq(e10Means(asn, "xs", Seq("m", "code")))
    }
    cb
  }

  /** (m, code, cv) frame rebuilt from packed entries (zero recompute) —
    * the ADC query table's centroid side. Per-session by construction, so
    * the cached [[Entries]] never pins a SparkSession. */
  private def centFrame(spark: SparkSession, cb: Entries): DataFrame = {
    import spark.implicits._
    val centRows = for (m <- 0 until PqM; j <- cb.codes(m).indices) yield
      (m, cb.codes(m)(j), cb.cvs(m).slice(j * PqSubDim, (j + 1) * PqSubDim).toSeq)
    centRows.toDF("m", "code", "cv")
  }

  /** Encode: nearest codebook entry per (vector, subspace) — one
    * codegen'd map pass, no shuffle (a window or min_by rendering would
    * materialize and move n·M·K scored rows at corpus scale). Tie
    * semantics match the oracle's `row_number ... ORDER BY dist, code`
    * (strict < in ascending code order). */
  private def pqEncode(xsub: DataFrame, cb: Entries): DataFrame =
    xsub.select(col("vec_id"), col("m"),
      nearestCode(col("xs"), col("m"), cb).as("code"))

  /** Per-query ADC lookup table (query_id, m, code, qd_e10), e10-fixed —
    * the full M × K distance grid for each query vector (FULL L2 here:
    * this is the output-contract distance, not an argmin). */
  private def pqQueryTable(xsub: DataFrame, cent: DataFrame): DataFrame =
    xsub.filter(col("vec_id") < 5)
      .join(broadcast(cent), Seq("m"))
      .selectExpr("vec_id AS query_id", "m", "code",
        s"CAST(floor((${l2DistSpark("xs", "cv")}) * 10000000000) AS BIGINT) AS qd_e10")

  /** DuckDB twin of the learned coarse quantizer: seeds → CoarseIters
    * unrolled Lloyd rounds → final centroids, plus the corpus-side
    * 2-nearest multi-assignment (`cassign`) and the query-side probe
    * (`qprob`). */
  private def coarseDuckCtes(assignK: Int = MultiAssign,
      kSql: String = CoarseK.toString, probeK: Int = ProbeCells): String = {
    val sb = new StringBuilder
    sb ++= s"cseed AS (SELECT row_number() OVER (ORDER BY $scrambleSql, vec_id) - 1 AS cell, " +
      "list_transform(embedding, x -> x::DOUBLE) AS cv FROM embeddings " +
      s"ORDER BY $scrambleSql, vec_id LIMIT ($kSql)), "
    sb ++= "ccmp AS MATERIALIZED (SELECT vec_id, p.range AS pos, " +
      "CAST(floor(list_extract(embedding, p.range)::DOUBLE * 10000000000) AS BIGINT) AS xe10 " +
      s"FROM embeddings CROSS JOIN range(1, ${Dim + 1}) p), "
    var prev = "cseed"
    for (i <- 1 to CoarseIters) {
      sb ++= s"casn$i AS MATERIALIZED (SELECT vec_id, cell FROM (SELECT vec_id, cell, " +
        "row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rk FROM " +
        s"(SELECT e.vec_id, c.cell, ${shiftDistDuck("e.embedding", "c.cv", Dim)} AS dist " +
        s"FROM embeddings e CROSS JOIN $prev c) _s$i) _r$i WHERE rk = 1), "
      sb ++= duckMeanCtes("c", i, "cell", s"casn$i JOIN ccmp USING (vec_id)")
      prev = s"ccent$i"
    }
    sb ++= "cassign AS MATERIALIZED (SELECT vec_id, unnest(cells) AS cell FROM (SELECT vec_id, " +
      s"(list(cell ORDER BY dist, cell))[1:$assignK] AS cells FROM " +
      s"(SELECT e.vec_id, c.cell, ${shiftDistDuck("e.embedding", "c.cv", Dim)} AS dist " +
      s"FROM embeddings e CROSS JOIN $prev c) _sa GROUP BY vec_id) _ga), "
    sb ++= "qprob AS (SELECT query_id, cell FROM (SELECT query_id, cell, " +
      "row_number() OVER (PARTITION BY query_id ORDER BY dist, cell) AS rk FROM " +
      s"(SELECT e.vec_id AS query_id, c.cell, ${shiftDistDuck("e.embedding", "c.cv", Dim)} AS dist " +
      s"FROM embeddings e CROSS JOIN $prev c WHERE e.vec_id < 5) _sq) _rq WHERE rk <= $probeK)"
    sb.toString
  }

  /** DuckDB twin of subvectors → learned codebook → encode → query table,
    * a CTE chain ending in `codes` (vec_id, m, code) and `qtab`. */
  private def pqDuckCtes: String = {
    val sb = new StringBuilder
    sb ++= s"pseed AS (SELECT row_number() OVER (ORDER BY $scrambleSql, vec_id) - 1 AS code, vec_id " +
      s"FROM embeddings ORDER BY $scrambleSql, vec_id LIMIT $PqK), "
    sb ++= s"xsub AS (SELECT vec_id, ms.range AS m, " +
      s"list_slice(embedding, ms.range * $PqSubDim + 1, ms.range * $PqSubDim + $PqSubDim) AS sv " +
      s"FROM embeddings CROSS JOIN range(0, $PqM) ms), "
    sb ++= s"xcmp AS (SELECT vec_id, m, p.range AS pos, " +
      "CAST(floor(list_extract(sv, p.range)::DOUBLE * 10000000000) AS BIGINT) AS xe10 " +
      s"FROM xsub CROSS JOIN range(1, ${PqSubDim + 1}) p), "
    sb ++= "pcent0 AS (SELECT m, code, list_transform(sv, x -> x::DOUBLE) AS cv " +
      "FROM pseed JOIN xsub USING (vec_id)), "
    var prev = "pcent0"
    for (i <- 1 to PqIters) {
      sb ++= s"pasn$i AS (SELECT vec_id, m, code FROM (SELECT vec_id, m, code, " +
        "row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, code) AS rk FROM " +
        s"(SELECT x.vec_id, x.m AS m, c.code, ${shiftDistDuck("x.sv", "c.cv", PqSubDim)} AS dist " +
        s"FROM xsub x JOIN $prev c ON c.m = x.m) _ps$i) _pr$i WHERE rk = 1), "
      sb ++= duckMeanCtes("p", i, "m, code", s"pasn$i JOIN xcmp USING (vec_id, m)")
      prev = s"pcent$i"
    }
    sb ++= "codes AS (SELECT vec_id, m, code FROM (SELECT vec_id, m, code, " +
      "row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, code) AS rk FROM " +
      s"(SELECT x.vec_id, x.m AS m, c.code, ${shiftDistDuck("x.sv", "c.cv", PqSubDim)} AS dist " +
      s"FROM xsub x JOIN $prev c ON c.m = x.m) _fs) _fr WHERE rk = 1), "
    sb ++= s"qtab AS (SELECT x.vec_id AS query_id, x.m AS m, c.code, " +
      s"CAST(floor((${l2DistDuck("x.sv", "c.cv", PqSubDim)}) * 10000000000) AS BIGINT) AS qd_e10 " +
      s"FROM xsub x JOIN $prev c ON c.m = x.m WHERE x.vec_id < 5)"
    sb.toString
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
        .selectExpr("vec_id", "label",
          s"${lshBucketSparkExpr("embedding", lshPlanesOf(s, d))} AS bucket")
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_vectors"),
          min(col("vec_id")).as("min_vec_id"),
          max(col("vec_id")).as("max_vec_id"),
          countDistinct(col("label")).as("n_labels"))
        .orderBy(asc("bucket"))),

    // LSH-bucketed near-neighbor pairs: exact cosine only within buckets,
    // plane count on the n-adaptive schedule (lshPlanesFor) so bucket
    // population — and with it the per-vector pair yield — pins as the
    // corpus grows instead of tracking n/2^planes.
    "ann_lsh_pairs" -> ((s, d) => {
      val b = emb(s, d).selectExpr("vec_id", "embedding AS v",
        "vec_norm2(embedding) AS n2",
        s"${lshBucketSparkExpr("embedding", lshPlanesOf(s, d))} AS bucket")
      b.as("a").join(b.as("b"),
          col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
        .selectExpr("a.vec_id AS vec_a", "b.vec_id AS vec_b",
          "CAST(floor(vec_dot(a.v, b.v) / (sqrt(a.n2) * sqrt(b.n2)) * 1000000) AS BIGINT) AS cos_ppm")
        .filter(col("cos_ppm") >= 100000)
        .orderBy(asc("vec_a"), asc("vec_b"))
    }),

    // IVF probe with the LEARNED coarse quantizer (round 7 — no label-
    // derived partitioner anywhere any more): same hash-seeded k-means
    // cells, 2-cell multi-assignment, and L2 probe-2 as ann_ivf_pq, but
    // the probed candidates are reranked EXACTLY (full cosine over the
    // raw vectors) instead of ADC-scored — the accuracy-over-memory end
    // of the IVF family. The member list is tiny (queries × probe × cell
    // size) and broadcasts into the corpus-sized rerank join.
    // IVF index-health census: per-cell assignment sizes reduced to the
    // imbalance facts an index operator actually watches — hot-cell factor
    // (max cell · n_cells / total, 1e6 = perfectly balanced) and the Gini
    // coefficient of cell sizes (0 = uniform). A skewed coarse quantizer
    // silently turns probes into scans; this is the eval that catches it.
    // One assignment pass (the shared cassign artifact), then everything
    // runs on the CELLS grid — the rank window sorts ≤ n_cells rows.
    // Wide products ride DECIMAL(38,0)/HUGEINT (cells × corpus overflows
    // int64 at ~1e10 assignments).
    "ann_ivf_imbalance" -> ((s, d) => {
      val e = emb(s, d)
      val sizes = coarseAssign(e, coarseFor(d, e))
        .groupBy(col("cell")).agg(count(lit(1)).as("sz"))
      sizes
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(asc("sz"), asc("cell"))))
        .agg(count(lit(1)).as("nc"), sum(col("sz")).as("tot"),
          min(col("sz")).as("mn"), max(col("sz")).as("mx"),
          sum(expr("CAST(2 * rk AS DECIMAL(38,0)) * sz")).as("wsum"))
        .selectExpr(
          "CAST(nc AS BIGINT) AS n_cells",
          "CAST(tot AS BIGINT) AS n_assign",
          "CAST(mn AS BIGINT) AS min_cell",
          "CAST(mx AS BIGINT) AS max_cell",
          "(CAST(mx AS BIGINT) * nc * 1000000) div tot AS hot_factor_e6",
          "CAST(((wsum - CAST(nc + 1 AS DECIMAL(38,0)) * tot) * 1000000) " +
            "div (CAST(nc AS DECIMAL(38,0)) * tot) AS BIGINT) AS gini_e6")
    }),

    "ann_ivf_probe" -> ((s, d) => {
      val e = emb(s, d)
      val member = ivfMember(s, d)
      val q = e.filter(col("vec_id") < 5).selectExpr("vec_id AS query_id",
        "embedding AS qv", "vec_norm2(embedding) AS qn2")
      // rerank kernel reuses precomputed norms (IEEE-identical values)
      e.selectExpr("vec_id", "embedding AS v", "vec_norm2(embedding) AS n2")
        .join(broadcast(member), Seq("vec_id"))
        .join(broadcast(q), Seq("query_id"))
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

    // Radius (range) search — the retrieval mode top-k can't express:
    // return EVERY neighbor above a similarity bar (cos ≥ RangeTauPpm),
    // however many there are. Same learned-IVF layout as ann_ivf_probe
    // (2-cell multi-assignment corpus side) but a DEEPER metric-consistent
    // probe-4 query side (RangeProbeCells — a radius query's matches
    // spread across cells and no rerank tier sits behind this one), exact
    // cosine verify inside probed cells only — so the scan cost is the
    // probed-cell population, not the corpus, and the emission is bounded
    // by the true match count instead of a fixed k. No window anywhere: a
    // top-k rank over an unbounded match set would re-shuffle what the
    // threshold filter already bounded.
    "ann_range_search" -> ((s, d) => {
      val e = emb(s, d)
      val coarse = coarseFor(d, e)
      val member = coarseAssign(e, coarse)
        .join(broadcast(probedCells(e, coarse, RangeProbeCells)), Seq("cell"))
        .select(col("query_id"), col("vec_id")).distinct()
      val q = e.filter(col("vec_id") < 5).selectExpr("vec_id AS query_id",
        "embedding AS qv", "vec_norm2(embedding) AS qn2")
      e.selectExpr("vec_id", "embedding AS v", "vec_norm2(embedding) AS n2")
        .join(broadcast(member), Seq("vec_id"))
        .join(broadcast(q), Seq("query_id"))
        .filter(col("query_id") =!= col("vec_id"))
        .selectExpr("query_id", "vec_id AS neighbor_id",
          "CAST(floor(vec_dot(qv, v) / (sqrt(qn2) * sqrt(n2)) * 1000000) AS BIGINT) AS cos_ppm")
        .filter(col("cos_ppm") >= RangeTauPpm)
        .orderBy(asc("query_id"), asc("neighbor_id"))
    }),

    // Recall dashboard for the RANGE tier: ann_range_search's result
    // scored against the exact threshold truth (brute force over the
    // 5-query set only — linear ×|Q|, never all-pairs). Range retrieval
    // has no rank cutoff to hide behind, so the one number that matters
    // is what fraction of true above-bar neighbors the probed cells
    // surfaced; the probed result is a SUBSET of the truth by
    // construction (exact verify inside cells), so spurious pairs are
    // structurally impossible and recall_bp is the whole story. Composes
    // ann_range_search verbatim (the ann_recall_eval embed discipline).
    "ann_range_recall_eval" -> ((s, d) => {
      val found = queries("ann_range_search")(s, d)
        .select(col("query_id"), col("neighbor_id")).withColumn("hit", lit(1L))
      val e = emb(s, d)
      val q = e.filter(col("vec_id") < 5).selectExpr("vec_id AS query_id",
        "embedding AS qv", "vec_norm2(embedding) AS qn2")
      val truth = e.selectExpr("vec_id AS neighbor_id", "embedding AS v",
          "vec_norm2(embedding) AS n2")
        .crossJoin(broadcast(q))
        .filter(col("neighbor_id") =!= col("query_id"))
        .selectExpr("query_id", "neighbor_id",
          "CAST(floor(vec_dot(qv, v) / (sqrt(qn2) * sqrt(n2)) * 1000000) AS BIGINT) AS cos_ppm")
        .filter(col("cos_ppm") >= RangeTauPpm)
      truth.join(found, Seq("query_id", "neighbor_id"), "left")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_truth"),
          sum(coalesce(col("hit"), lit(0L))).as("n_found"))
        .selectExpr("query_id", "n_truth", "n_found",
          "(n_found * 10000) div n_truth AS recall_bp")
        .orderBy(asc("query_id"))
    }),

    // Product quantization + asymmetric distance (ADC) — the memory-bound
    // ANN scale path: vectors compress to M=16 one-byte codes (argmin over
    // a 128-entry LEARNED codebook per 4-dim subspace — hash-seeded, 2
    // Lloyd refinements), queries score candidates via a per-query lookup
    // table, never touching the raw vectors. Distances are L2 via the
    // pinned vec_norm2/vec_dot kernels, fixed-point-scaled to e10 BIGINTs
    // so the M-subspace ADC sum is exact integer math — order-independent
    // on any engine. At 100 TB: codebook and query tables broadcast, the
    // codes relation is the big side and never collects, ADC is a
    // map-side join + small aggregation.
    "ann_pq_adc" -> ((s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val e = emb(s, d)
      // persisted: the subvector relation feeds every Lloyd round, the
      // final encode, and the query table (keyed — shared with any
      // composed tier in the same scope)
      val xsub = CacheScope.persistKeyed(
        s"xsub#${System.identityHashCode(s)}#$d", () => subvectors(e))
      val cb = pqFor(d, e, xsub)
      val codes = pqEncode(xsub, cb)
      val qtab = pqQueryTable(xsub, centFrame(s, cb))
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

    // IVF + PQ/ADC composed — the production ANN shape at 100 TB: the
    // coarse partitioner is LEARNED (hash-seeded k-means, 2 Lloyd rounds),
    // every vector is indexed under its 2 nearest cells (multi-assignment),
    // queries probe their 2 nearest cells by the same L2 metric ADC ranks
    // with, and candidates are scored from their 16-subspace PQ codes via
    // the per-query ADC table (same learned codebook/ADC kernel as
    // ann_pq_adc) — the raw vectors are never touched after encoding.
    // Plan: the probe resolves to a tiny (query_id, vec_id) member list
    // (≤ queries × probe × cell size), so the only corpus-sized join is
    // codes ⨝ broadcast(member) + broadcast(qtab); memory per executor is
    // codes (M bytes per vector) not vectors (4·dim bytes).
    "ann_ivf_pq" -> ((s, d) => {
      ivfAdcRanked(s, d)
        .filter(col("rank") <= 10)
        .selectExpr("query_id", "CAST(rank AS BIGINT) AS rank",
          "vec_id AS neighbor_id", "CAST(adc_e10 AS BIGINT) AS adc_e10")
        .orderBy(asc("query_id"), asc("rank"))
    }),

    // IVF+PQ with exact refinement — the full production retrieval stack:
    // ADC ranks a 50-candidate shortlist from the codes (memory-bound
    // pass, raw vectors untouched), then ONLY the shortlist is reranked
    // with the exact cosine kernel (compute-bound pass over queries×50
    // rows). Recall approaches exact while the corpus-scale work stays
    // the ADC join; the rerank join's build side is the tiny shortlist.
    "ann_ivf_pq_refined" -> ((s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val e = emb(s, d)
      val shortlist = ivfAdcRanked(s, d)
        .select(col("query_id"), col("vec_id"))
      val q = e.filter(col("vec_id") < 5).selectExpr("vec_id AS query_id",
        "embedding AS qv", "vec_norm2(embedding) AS qn2")
      e.selectExpr("vec_id", "embedding AS v", "vec_norm2(embedding) AS n2")
        .join(broadcast(shortlist), Seq("vec_id"))
        .join(broadcast(q), Seq("query_id"))
        .selectExpr("query_id", "vec_id AS neighbor_id",
          "CAST(floor(vec_dot(qv, v) / (sqrt(qn2) * sqrt(n2)) * 1000000) AS BIGINT) AS cos_ppm")
        .withColumn("rank", row_number().over(
          W.partitionBy(col("query_id")).orderBy(desc("cos_ppm"), asc("neighbor_id"))))
        .filter(col("rank") <= 10)
        .select(col("query_id"), col("rank").cast("bigint").as("rank"),
          col("neighbor_id"), col("cos_ppm"))
        .orderBy(asc("query_id"), asc("rank"))
    }),

    // Lloyd training trajectory as a declared, oracle-checked result (the
    // "training as a query" pattern bpe_train_merges set): per refinement
    // round, each cell's population and its exact e10-integer component
    // mass Σ_members Σ_pos floor(x·10¹⁰) — the un-normalized centroid
    // numerator, the integer that fully determines the next round's
    // centroid doubles. An engine drifting on tie-break or mean
    // arithmetic diverges HERE first, one round before it would corrupt
    // the served ANN artifacts — this is the cross-engine regression
    // canary for the whole learned-quantizer family. Each round is one
    // codegen'd argmin map pass + a map-side-combined census; only K-row
    // codebooks ever reach the driver, so the trajectory costs the same
    // as the IVF build it mirrors (at 100 TB: train on a hash-coin
    // sample, same code path).
    "embedding_kmeans_rounds" -> ((s, d) => {
      val e = emb(s, d)
      var cb = collectCoarse(hashSeeds(e, CoarseK, "cell")
        .join(e.select(col("vec_id"), col("embedding")), Seq("vec_id"))
        .selectExpr("cell", "transform(embedding, x -> CAST(x AS DOUBLE)) AS cv"))
      val rounds = (1 to CoarseIters).map { r =>
        val asn = CacheScope.persist(e.select(
          nearestCode(col("embedding"), lit(0), cb).as("cell"), col("embedding")))
        val census = asn
          .select(col("cell"), posexplode(col("embedding")))
          .selectExpr("cell",
            "CAST(floor(CAST(col AS DOUBLE) * 10000000000) AS BIGINT) AS xe10")
          .groupBy(col("cell"))
          .agg(expr(s"count(1) div ${Dim}L").as("n_members"),
            sum(col("xe10")).as("mass_e10"))
          .selectExpr(s"CAST($r AS BIGINT) AS round",
            "CAST(cell AS BIGINT) AS cell", "n_members", "mass_e10")
        cb = collectCoarse(e10Means(asn, "embedding", Seq("cell")))
        census
      }
      rounds.reduce(_.union(_)).orderBy(asc("round"), asc("cell"))
    }),

    // Index-quality evaluation as a query: each ANN tier's returned
    // neighbor set scored against the exact top-10 truth — overlap count
    // and hit rate per (tier, query). This is the "recall dashboard" a
    // production vector index ships alongside itself; declaring it as an
    // oracle-checked query means BOTH engines recompute the whole
    // tier-vs-truth comparison and must agree on every count. Composes
    // the existing tier queries verbatim (same artifacts, same caches),
    // so the eval can never drift from the tiers it measures. Truth and
    // tier results are 5×10-row relations — every join here is
    // driver-trivial; the corpus-scale work happens inside the tier
    // queries themselves, whose plans are audited separately.
    "ann_recall_eval" -> ((s, d) => {
      val truth = bruteTruth(s, d)
        .select(col("query_id"), col("neighbor_id"))
      val methods = Seq("ivf_probe" -> "ann_ivf_probe", "ivf_pq" -> "ann_ivf_pq",
        "ivf_pq_refined" -> "ann_ivf_pq_refined")
      methods.map { case (label, name) =>
        queries(name)(s, d).select(col("query_id"), col("neighbor_id"))
          .join(truth.withColumn("hit", lit(1L)),
            Seq("query_id", "neighbor_id"), "left")
          .groupBy(col("query_id"))
          .agg(count(lit(1)).as("n_returned"),
            sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
          .selectExpr(s"'$label' AS method", "query_id", "n_returned", "n_hits",
            "(n_hits * 10000) div n_returned AS hit_bp")
      }.reduce(_ union _).orderBy(asc("method"), asc("query_id"))
    }),

    // Leave-one-out k-NN LABEL eval: does the embedding space actually
    // separate the labels? For a probe set (vec_id < 100), exact cosine
    // top-5 (self excluded), then per true label: top-1 agreement and
    // 5-NN majority-vote agreement in basis points — the label-purity
    // diagnostic run before trusting embedding-space dedup or curation
    // decisions. Majority ties break (votes DESC, label ASC) —
    // deterministic in both engines. Scale: probe×corpus with the probe
    // side broadcast (the bruteforce-tier shape — the production path
    // swaps in the IVF tier, whose recall ann_recall_eval already pins);
    // all vote/rank windows are probe-sized (100×5 rows).
    "ann_knn_label_eval" -> ((s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val e = emb(s, d).selectExpr("vec_id", "label",
        "embedding AS v", "vec_norm2(embedding) AS n2")
      val q = e.filter(col("vec_id") < 100)
        .selectExpr("vec_id AS query_id", "label AS qlabel",
          "v AS qv", "n2 AS qn2")
      val top5 = q.join(e, col("query_id") =!= col("vec_id"))
        .selectExpr("query_id", "qlabel", "label", "vec_id",
          "CAST(floor(vec_dot(qv, v) / (sqrt(qn2) * sqrt(n2)) * 1000000) AS BIGINT) AS cos_ppm")
        .withColumn("rank", row_number().over(
          W.partitionBy(col("query_id")).orderBy(desc("cos_ppm"), asc("vec_id"))))
        .filter(col("rank") <= 5)
      val top1 = top5.filter(col("rank") === 1)
        .selectExpr("query_id", "qlabel",
          "CASE WHEN label = qlabel THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS t1")
      val maj5 = top5.groupBy(col("query_id"), col("label"))
        .agg(count(lit(1)).as("nv"))
        .withColumn("vrk", row_number().over(
          W.partitionBy(col("query_id")).orderBy(desc("nv"), asc("label"))))
        .filter(col("vrk") === 1)
        .select(col("query_id"), col("label").as("vlabel"))
      top1.join(maj5, Seq("query_id"))
        .selectExpr("qlabel", "t1",
          "CASE WHEN vlabel = qlabel THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS m5")
        .groupBy(col("qlabel"))
        .agg(count(lit(1)).as("n_queries"),
          sum(col("t1")).cast("bigint").as("n_top1_correct"),
          sum(col("m5")).cast("bigint").as("n_maj5_correct"))
        .selectExpr("CAST(qlabel AS BIGINT) AS label", "n_queries",
          "n_top1_correct", "n_maj5_correct",
          "(n_top1_correct * 10000) div n_queries AS top1_acc_bp",
          "(n_maj5_correct * 10000) div n_queries AS maj5_acc_bp")
        .orderBy(asc("label"))
    }),

    // Calibration of the 5-NN vote as a confidence signal — the
    // reliability-diagram census behind ECE: bucket queries by the
    // winning label's vote count (1..5 of 5; confidence = votes/5 in bp)
    // and report realized accuracy per bucket. A well-calibrated vote has
    // acc_bp tracking conf_bp; the gap per bucket is what an
    // expected-calibration-error monitor integrates. Same probe set and
    // top-5 shape as ann_knn_label_eval (one broadcast probe scan); the
    // census is ≤ 5 rows.
    "ann_knn_calibration" -> ((s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val e = emb(s, d).selectExpr("vec_id", "label",
        "embedding AS v", "vec_norm2(embedding) AS n2")
      val q = e.filter(col("vec_id") < 100)
        .selectExpr("vec_id AS query_id", "label AS qlabel",
          "v AS qv", "n2 AS qn2")
      val top5 = q.join(e, col("query_id") =!= col("vec_id"))
        .selectExpr("query_id", "qlabel", "label", "vec_id",
          "CAST(floor(vec_dot(qv, v) / (sqrt(qn2) * sqrt(n2)) * 1000000) AS BIGINT) AS cos_ppm")
        .withColumn("rank", row_number().over(
          W.partitionBy(col("query_id")).orderBy(desc("cos_ppm"), asc("vec_id"))))
        .filter(col("rank") <= 5)
      top5.groupBy(col("query_id"), col("qlabel"), col("label"))
        .agg(count(lit(1)).as("nv"))
        .withColumn("vrk", row_number().over(
          W.partitionBy(col("query_id")).orderBy(desc("nv"), asc("label"))))
        .filter(col("vrk") === 1)
        .selectExpr("nv AS votes",
          "CASE WHEN label = qlabel THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS ok")
        .groupBy(col("votes"))
        .agg(count(lit(1)).as("n_queries"), sum(col("ok")).cast("bigint").as("n_correct"))
        .selectExpr("votes", "n_queries", "n_correct",
          "votes * 2000 AS conf_bp",
          "(n_correct * 10000) div n_queries AS acc_bp")
        .orderBy(asc("votes"))
    }),

    // Matryoshka truncation eval: recall@10 of TRUNCATED-dimension exact
    // cosine against full-dimension truth, per probe (vec_id < 5) and
    // prefix width ∈ {8, 16, 32} — the measurement behind "can we serve
    // ANN from the first k dims and rerank full-width only at the end"
    // (MRL-style costed retrieval: a 32/64 prefix halves scan bytes AND
    // index memory if recall holds). vec_dot folds min(len) index-ordered,
    // so slice()-ing both sides reproduces the oracle's range(1, k+1)
    // double fold bit-exactly. Scale: probes broadcast against the corpus
    // once (the cached probe×corpus relation feeds all four scorings);
    // rank windows are probe-sized. The production path swaps the scan
    // tier for IVF — this query pins the quality side of that trade.
    "embedding_matryoshka_eval" -> ((s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val e = emb(s, d).selectExpr("vec_id", "embedding AS v")
      val q = e.filter(col("vec_id") < 5)
        .selectExpr("vec_id AS query_id", "v AS qv")
      val joined = CacheScope.persist(
        q.join(e, col("query_id") =!= col("vec_id")))
      def topk(dims: Int): DataFrame = {
        val (qe, ve) =
          if (dims == Dim) ("qv", "v")
          else (s"slice(qv, 1, $dims)", s"slice(v, 1, $dims)")
        joined.selectExpr("query_id", "vec_id",
            s"CAST(floor(vec_dot($qe, $ve) / (sqrt(vec_norm2($qe)) * sqrt(vec_norm2($ve))) * 1000000) AS BIGINT) AS cos_ppm")
          .withColumn("rank", row_number().over(
            W.partitionBy(col("query_id")).orderBy(desc("cos_ppm"), asc("vec_id"))))
          .filter(col("rank") <= 10)
          .select(col("query_id"), col("vec_id"))
      }
      val truth = topk(Dim).withColumn("hit", lit(1L))
      Seq(8, 16, 32).map { dims =>
        topk(dims)
          .join(truth, Seq("query_id", "vec_id"), "left")
          .groupBy(col("query_id"))
          .agg(count(lit(1)).as("n_returned"),
            sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
          .selectExpr(s"CAST($dims AS BIGINT) AS dims", "query_id",
            "n_returned", "n_hits",
            "(n_hits * 10000) div n_returned AS recall_bp")
      }.reduce(_ union _).orderBy(asc("dims"), asc("query_id"))
    }),

    // Per-vector norms + per-label norm envelope (no float summation —
    // min/max only, deterministic).
    // Label-FILTERED exact top-k (the "tenant filter" / metadata-predicate
    // vector search every production store ships): the predicate is pushed
    // BEFORE scoring, so the scan only pays cosine for label-matching
    // vectors — at scale this is the pre-filter strategy (vs post-filter,
    // whose loss ann_postfilter_recall_eval measures). Probes vec_id < 5,
    // filter = same label as the query.
    "ann_filtered_topk" -> ((s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val e = emb(s, d).selectExpr("vec_id", "label",
        "embedding AS v", "vec_norm2(embedding) AS n2")
      val q = e.filter(col("vec_id") < 5)
        .selectExpr("vec_id AS query_id", "label AS qlabel",
          "v AS qv", "n2 AS qn2")
      e.join(broadcast(q),
          col("label") === col("qlabel") && col("query_id") =!= col("vec_id"))
        .selectExpr("query_id", "CAST(qlabel AS BIGINT) AS qlabel", "vec_id",
          "CAST(floor(vec_dot(qv, v) / (sqrt(qn2) * sqrt(n2)) * 1000000) AS BIGINT) AS cos_ppm")
        .withColumn("rank", row_number().over(
          W.partitionBy(col("query_id")).orderBy(desc("cos_ppm"), asc("vec_id"))))
        .filter(col("rank") <= 5)
        .selectExpr("query_id", "qlabel", "CAST(rank AS BIGINT) AS rank",
          "vec_id AS neighbor_id", "cos_ppm")
        .orderBy(asc("query_id"), asc("rank"))
    }),

    // Post-filter loss measurement: retrieve an UNFILTERED top-15
    // (3·k candidate budget), filter to the query's label, keep 5 — the
    // strategy a filter-unaware index forces — and score its recall
    // against the exact filtered top-5. Low recall_bp per query is the
    // operational argument for filter-aware (pre-filter / label-
    // partitioned) indexing at scale; the eval composes the same scan
    // and the ann_filtered_topk truth verbatim.
    "ann_postfilter_recall_eval" -> ((s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val e = emb(s, d).selectExpr("vec_id", "label",
        "embedding AS v", "vec_norm2(embedding) AS n2")
      val q = e.filter(col("vec_id") < 5)
        .selectExpr("vec_id AS query_id", "label AS qlabel",
          "v AS qv", "n2 AS qn2")
      val unfiltered = e.join(broadcast(q), col("query_id") =!= col("vec_id"))
        .selectExpr("query_id", "CAST(qlabel AS BIGINT) AS qlabel",
          "CAST(label AS BIGINT) AS label", "vec_id",
          "CAST(floor(vec_dot(qv, v) / (sqrt(qn2) * sqrt(n2)) * 1000000) AS BIGINT) AS cos_ppm")
        .withColumn("rank", row_number().over(
          W.partitionBy(col("query_id")).orderBy(desc("cos_ppm"), asc("vec_id"))))
        .filter(col("rank") <= 15)
        .transform(CacheScope.persist)
      val post = unfiltered.filter(col("label") === col("qlabel"))
        .withColumn("prk", row_number().over(
          W.partitionBy(col("query_id")).orderBy(asc("rank"))))
        .filter(col("prk") <= 5)
        .select(col("query_id"), col("qlabel"), col("vec_id"))
      val truth = queries("ann_filtered_topk")(s, d)
        .select(col("query_id"), col("neighbor_id").as("vec_id"))
      // start from the QUERY panel: a query whose candidate budget holds
      // zero label matches must emit a recall-0 row, not vanish (caught
      // by the sf0.001 recompute — query 1 had no same-label candidate
      // in its top-15)
      q.selectExpr("query_id", "CAST(qlabel AS BIGINT) AS qlabel")
        .join(post.groupBy(col("query_id"))
            .agg(count(lit(1)).as("raw_after")),
          Seq("query_id"), "left")
        .join(post.join(truth, Seq("query_id", "vec_id"))
            .groupBy(col("query_id")).agg(count(lit(1)).as("raw_hits")),
          Seq("query_id"), "left")
        .selectExpr("query_id", "qlabel",
          "ifnull(raw_after, 0L) AS n_after_filter",
          "ifnull(raw_hits, 0L) AS n_hits")
        .selectExpr("query_id", "qlabel", "n_after_filter", "n_hits",
          "(n_hits * 10000) div 5 AS recall_bp")
        .orderBy(asc("query_id"))
    }),

    // Isotropy diagnostic over a pinned 64-probe panel: mean / mean-|·| /
    // extreme pairwise cosines (2016 exact-ppm pairs). An anisotropic
    // embedding space (mean cosine ≫ 0 — the "narrow cone" pathology)
    // degrades every cosine-based operator above; this is the 1-row
    // health gauge to watch across embedding-model upgrades. Pure
    // broadcast self-pairing of a bounded panel — corpus-independent.
    "embedding_isotropy" -> ((s, d) => {
      val e = emb(s, d).filter(col("vec_id") < 64)
        .selectExpr("vec_id", "embedding AS v", "vec_norm2(embedding) AS n2")
      val pairs = e.alias("a")
        .join(broadcast(e.alias("b")), col("a.vec_id") < col("b.vec_id"))
        .selectExpr(
          "CAST(floor(vec_dot(a.v, b.v) / (sqrt(a.n2) * sqrt(b.n2)) * 1000000) AS BIGINT) AS cos_ppm")
      pairs.agg(
          count(lit(1)).as("n_pairs"),
          sum(col("cos_ppm")).as("sc"),
          sum(expr("abs(cos_ppm)")).as("sa"),
          min(col("cos_ppm")).as("min_cos_ppm"),
          max(col("cos_ppm")).as("max_cos_ppm"))
        .selectExpr("n_pairs",
          "sc div n_pairs AS mean_cos_ppm",
          "sa div n_pairs AS mean_abs_cos_ppm",
          "min_cos_ppm", "max_cos_ppm")
    }),

    "vector_stats" -> ((s, d) =>
      emb(s, d)
        .selectExpr("label",
          s"CAST(floor(sqrt(${norm2Spark("embedding", Dim)}) * 1000000) AS BIGINT) AS norm_ppm")
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"),
          min(col("norm_ppm")).as("min_norm_ppm"),
          max(col("norm_ppm")).as("max_norm_ppm"))
        .orderBy(asc("label"))),

    // Embedding-space cluster quality: per-label cohesion (mean member→
    // centroid L2, e10-floored integer mean) vs separation (L2 to the
    // nearest OTHER centroid) — the SemDeDup-era signal for pruning or
    // re-clustering a degenerate embedding region before semantic dedup
    // trusts it. One corpus pass builds the e10-exact centroids, one
    // broadcast join scores members; the pairwise centroid table is
    // |labels|² and never touches the corpus.
    "embedding_cluster_quality" -> ((s, d) => {
      val e = emb(s, d)
      val cent = CacheScope.persist(e10Means(e, "embedding", Seq("label")))
      val memb = e.join(broadcast(cent), Seq("label"))
        .selectExpr("label",
          s"CAST(floor((${l2DistSpark("embedding", "cv")}) * 10000000000) AS BIGINT) AS de10")
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_vecs"),
          expr("sum(de10) div count(1)").as("cohesion_e10"))
      val other = cent.select(col("label").as("olabel"), col("cv").as("ocv"))
      val W = org.apache.spark.sql.expressions.Window
        .partitionBy(col("label")).orderBy(col("se10"), col("olabel"))
      val sep = cent.join(broadcast(other), col("label") =!= col("olabel"))
        .selectExpr("label", "olabel",
          s"CAST(floor((${l2DistSpark("cv", "ocv")}) * 10000000000) AS BIGINT) AS se10")
        .withColumn("rk", row_number().over(W))
        .filter(col("rk") === 1)
        .select(col("label"), col("olabel").as("nn_label"), col("se10").as("nn_sep_e10"))
      memb.join(sep, Seq("label"))
        // guarded denominator: identical rendering on both engines so a
        // degenerate zero-separation corpus can't diverge (DuckDB raises,
        // Spark yields NULL)
        .selectExpr("label", "n_vecs", "cohesion_e10", "nn_label", "nn_sep_e10",
          "(cohesion_e10 * 10000) div greatest(nn_sep_e10, 1L) AS compactness_bp")
        .orderBy(asc("label"))
    }),

    // Per-cluster embedding outliers — the top-5 members farthest from
    // their cluster centroid, scored as basis points of the cluster's mean
    // squared distance (so the cutoff is scale-free across clusters of
    // different radii). The quality-filter pass every embedding corpus
    // runs before trusting semantic dedup / retrieval: a member at 5-10×
    // the cluster mean is a mis-embedding or mis-assignment. All integer:
    // coordinates e4-quantize to BIGINT, the centroid is a truncating
    // integer mean per (label, dim), distances are exact integer sums —
    // both engines agree bit-for-bit with no float summation anywhere.
    // Scale shape: one posexplode pass feeds a map-side-combined
    // (label, dim) centroid grid (clusters × Dim rows, broadcast back);
    // the per-vector distance is a map-side-combined groupBy on vec_id;
    // the rank window is per-label and WindowGroupLimit-prunable (≤ 5).
    "embedding_outlier_scores" -> ((s, d) => {
      val q = emb(s, d)
        .select(col("vec_id"), col("label"), posexplode(col("embedding")).as(Seq("i", "x")))
        .selectExpr("vec_id", "label", "i",
          "CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT) AS q")
        .transform(CacheScope.persist)
      val cent = q.groupBy(col("label"), col("i"))
        .agg(expr("sum(q) div count(1)").as("c"))
      val dist = q.join(broadcast(cent), Seq("label", "i"))
        .selectExpr("vec_id", "label", "(q - c) * (q - c) AS t")
        .groupBy(col("vec_id"), col("label"))
        .agg(sum(col("t")).as("d2"))
      val stats = dist.groupBy(col("label"))
        .agg(expr("sum(d2) div count(1)").as("mean_d2"))
      val W = org.apache.spark.sql.expressions.Window
        .partitionBy(col("label")).orderBy(desc("score_bp"), asc("vec_id"))
      dist.join(broadcast(stats), Seq("label"))
        .selectExpr("label", "vec_id", "d2",
          "(d2 * 10000) div greatest(mean_d2, 1L) AS score_bp")
        .withColumn("rank", row_number().over(W))
        .filter(col("rank") <= 5)
        .selectExpr("CAST(label AS BIGINT) AS label", "CAST(rank AS BIGINT) AS rank",
          "vec_id", "d2", "score_bp")
        .orderBy(asc("label"), asc("rank"))
    }),

    // Leading-principal-direction projection (PCA axis 1) — INTEGER power
    // iteration, so the direction is bit-identical across engines and the
    // whole operator is oracle-checkable in SQL (no float matvec whose
    // summation order could drift). Pipeline: exact e4-quantized moment
    // sums → integer scatter matrix M = n·S_ij − S_i·S_j → uniform
    // decimal-magnitude rescale (digit-count, the engine-neutral log10) →
    // PcaIters unrolled matvec+rescale rounds from the fixed ones vector →
    // per-vector projection score = Σ v_k·x_k (exact BIGINT, order-free).
    // The moment pass is the only corpus-scale step (map-side combined to
    // Dim² groups); M and v are tiny driver artifacts cached per corpus
    // (the IVF/PQ offline-index discipline), and the projection is one
    // codegen'd 64-term map expression. Headroom: BIGINT moments are exact
    // to ~7·10⁵ vectors at |x|≤0.6; beyond that the moment aggregation
    // moves to DECIMAL(38,0) with the same downstream integers.
    "embedding_pca_project" -> ((s, d) => {
      val e = emb(s, d)
      val v = pcaDirection(d, e)
      val terms = (0 until Dim).map(k =>
        s"${v(k)}L * CAST(floor(CAST(element_at(embedding, ${k + 1}) AS DOUBLE) * 10000) AS BIGINT)")
        .mkString(" + ")
      e.selectExpr("label", s"($terms) AS score")
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_vecs"),
          min(col("score")).as("min_score"),
          max(col("score")).as("max_score"),
          sum(col("score")).cast("bigint").as("sum_score"))
        .selectExpr("CAST(label AS BIGINT) AS label", "n_vecs",
          "min_score", "max_score", "sum_score")
        .orderBy(asc("label"))
    }),

    // Covariance matrix of the leading CovDims embedding dimensions — the
    // PCA/whitening precursor (dimension-collapse detection, quantizer
    // design). Components are e4-quantized so every moment sum is an exact
    // BIGINT; only the final per-pair normalization cov = num/n² touches a
    // double (pinned formula both engines). Plan shape: the upper-triangle
    // pair stream is generated row-locally from a sliced array (k² rows
    // per vector, whole-stage codegen) and collapses to k(k+1)/2 groups by
    // map-side combine BEFORE the only shuffle — partials per task are
    // k²-sized, independent of corpus rows, which is exactly how a Gram
    // matrix must be computed at 100 TB (the N·k² multiply-adds are
    // inherent; the exchange stays constant-width).
    "embedding_covariance" -> ((s, d) =>
      emb(s, d)
        .select(expr(s"slice(embedding, 1, $CovDims)").as("v"))
        .select(col("v"), posexplode(col("v")).as(Seq("i", "vi")))
        .select(col("i"),
          expr("CAST(floor(CAST(vi AS DOUBLE) * 10000) AS BIGINT) AS xi"),
          posexplode(col("v")).as(Seq("j", "vj")))
        .filter(col("j") >= col("i"))
        .selectExpr("i", "j", "xi",
          "CAST(floor(CAST(vj AS DOUBLE) * 10000) AS BIGINT) AS xj")
        .groupBy(col("i"), col("j"))
        .agg(count(lit(1)).as("n"),
          sum(col("xi")).as("sxi"), sum(col("xj")).as("sxj"),
          sum(expr("xi * xj")).as("sxixj"))
        // int64 guard on the n²-growing products (runs on k(k+1)/2 group
        // rows, not the corpus): each |term| must fit in int64/2 so the
        // difference cannot wrap either. Beyond the headroom Spark's
        // non-ANSI `*` wraps SILENTLY while the DuckDB twin raises —
        // raise_error here makes the failure loud and symmetric; the
        // migration path is DECIMAL(38,0) moments (same downstream ints).
        .selectExpr("i", "j", "n", "sxi", "sxj", "sxixj",
          """CASE WHEN abs(sxixj) <= 4611686018427387903L div greatest(n, 1L)
                   AND abs(sxi) <= 4611686018427387903L div greatest(abs(sxj), 1L)
             THEN true
             ELSE raise_error('embedding_covariance: moment product exceeds int64 — re-aggregate moments as DECIMAL(38,0)')
             END AS _ok""")
        .selectExpr("CAST(i AS BIGINT) AS i", "CAST(j AS BIGINT) AS j",
          "n", "sxi", "sxj", "sxixj",
          "IF(_ok, n * sxixj - sxi * sxj, NULL) AS cov_num_e8",
          """CAST(floor(CAST(IF(_ok, n * sxixj - sxi * sxj, NULL) AS DOUBLE) /
             (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS BIGINT) AS cov_e8""")
        .orderBy(asc("i"), asc("j"))),

    // SQ8 scalar quantization + ADC — the third quantizer tier alongside
    // PQ and matryoshka truncation. Each dimension is independently
    // affine-quantized to an 8-bit code against the corpus per-dim
    // [min, max] (64 bytes/vector — a 4× compression over float32 with no
    // training step, the standard first rung before PQ). Query-time
    // distance is asymmetric (full-precision query vs dequantized
    // mid-bucket corpus code) via a per-(query, dim, code) ADC lookup
    // table, exactly the ann_pq_adc shape. Determinism: min/max of floats
    // are exact; every per-dim term is e8-floored to BIGINT BEFORE the
    // sum, so accumulation order cannot matter; the dequant expression is
    // one pinned parenthesization in both engines. Plan: per-dim stats are
    // a 64-row broadcast, the ADC table is queries×64×256 rows broadcast,
    // and the corpus-side join input is the code relation (codes, not
    // vectors) — at 100 TB the scan carries 1 byte/dim, the shuffle is the
    // (query, vec) partial-sum census, and nothing corpus-sized is ever
    // collected or windowed (the rank window runs on queries×corpus
    // partial sums reduced to top-10 per query by the aggregate first).
    "ann_sq8_adc" -> ((s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val dims = sq8Dims(emb(s, d))
      val stats = dims.groupBy(col("i"))
        .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      val codes = dims.join(broadcast(stats), Seq("i"))
        .selectExpr("vec_id", "i", sq8CodeSpark)
      val qtab = dims.filter(col("vec_id") < 5)
        .selectExpr("vec_id AS query_id", "i", "x AS qx")
        .join(broadcast(stats), Seq("i"))
        .select(col("query_id"), col("i"), col("qx"), col("mn"), col("mx"),
          explode(expr("sequence(CAST(0 AS BIGINT), CAST(255 AS BIGINT))")).as("code"))
        .selectExpr("query_id", "i", "code", s"$sq8TermSpark AS term_e8")
      codes.join(broadcast(qtab), Seq("i", "code"))
        .filter(col("query_id") =!= col("vec_id"))
        .groupBy(col("query_id"), col("vec_id"))
        .agg(sum(col("term_e8")).as("adc_e8"))
        .withColumn("rank", row_number().over(
          W.partitionBy(col("query_id")).orderBy(asc("adc_e8"), asc("vec_id"))))
        .filter(col("rank") <= 10)
        .selectExpr("query_id", "CAST(rank AS BIGINT) AS rank",
          "vec_id AS neighbor_id", "CAST(adc_e8 AS BIGINT) AS adc_e8")
        .orderBy(asc("query_id"), asc("rank"))
    }),

    // The memory/recall PARETO dashboard — every quantization tier the
    // engine ships (full float32, matryoshka 8/16/32-dim prefixes, SQ8,
    // IVF+PQ with and without exact refinement) on one axis pair:
    // bytes-stored-per-vector vs mean recall@10 over the probe set. This
    // is the table an index designer actually reads when sizing a
    // 100 TB vector tier; declaring it as an oracle-checked query means
    // the whole tradeoff surface is recomputed and agreed by BOTH
    // engines. Composes the tier evals verbatim (same caches), so the
    // dashboard can never drift from the tiers it summarizes. The
    // bytes column counts what the SERVING tier must hold per vector:
    // 4·dims for float32 prefixes, 1·dims for SQ8 codes, PqM for PQ
    // codes, PqM + 4·Dim for PQ-with-refinement (codes + the exact
    // vectors the re-rank touches).
    "ann_quantization_pareto" -> ((s, d) => {
      // The tier evals are collected CONCURRENTLY (guide §2.6: actions are
      // only sequential because driver code calls them sequentially) and
      // rolled up driver-side: every branch output is queries×tiers ≤ 35
      // rows (corpus-INDEPENDENT — the bounded-collect discipline), while
      // the single-union rendering re-planned a 129-exchange composite per
      // run whose planning floor exceeded its execution. The shared
      // persisted artifacts (bruteTruth, ivfMember, ivfAdcRanked, xsub)
      // still canonicalize across the branches, so concurrent first
      // accessors block on the same cache fill instead of recomputing.
      // Rollup arithmetic is the exact integer twin of the former
      // `sum_bp div n_queries` (positive longs, truncating division).
      def branches: Seq[() => Array[(String, Long, Long, Long)]] = Seq(
        () => bruteTruth(s, d)
          .groupBy(col("query_id")).agg(count(lit(1)).as("n"))
          .select(col("query_id")).collect()
          .map(r => ("full_f32", 4L * Dim, r.getLong(0), 10000L)),
        () => queries("ann_sq8_recall_eval")(s, d)
          .select(col("query_id"), col("hit_bp")).collect()
          .map(r => ("sq8", Dim.toLong, r.getLong(0), r.getLong(1))),
        () => queries("ann_recall_eval")(s, d)
          .filter(col("method").isin("ivf_pq", "ivf_pq_refined"))
          .select(col("method"), col("query_id"), col("hit_bp")).collect()
          .map { r =>
            val m = r.getString(0)
            val bytes = if (m == "ivf_pq") PqM.toLong else (PqM + 4L * Dim)
            (m, bytes, r.getLong(1), r.getLong(2))
          },
        () => queries("embedding_matryoshka_eval")(s, d)
          .select(col("dims"), col("query_id"), col("recall_bp")).collect()
          .map(r => (s"matryoshka${r.getLong(0)}", r.getLong(0) * 4L,
            r.getLong(1), r.getLong(2))))
      import scala.concurrent.{Await, Future, ExecutionContext}
      import scala.concurrent.duration.Duration
      implicit val ec: ExecutionContext = ExecutionContext.global
      // finite timeout (a hung branch must fail the query, not block the
      // builder forever) and branch failures unwrapped to their cause with
      // the branch's context attached. NOTE the builder EXECUTES the tier
      // evals eagerly at DataFrame-construction time (like
      // events_transition_rank's bounded collect) — plan-only consumers
      // (PlanDump) pay the bounded eval.
      val rows =
        try Await.result(
          Future.sequence(branches.map(b => Future(b()))),
          Duration(600, "s")).flatten
        catch {
          case e: java.util.concurrent.ExecutionException =>
            throw new RuntimeException(
              s"ann_quantization_pareto tier branch failed: ${e.getCause}",
              e.getCause)
        }
      val out = rows.groupBy(r => (r._1, r._2)).toSeq
        .map { case ((method, bytes), rs) =>
          (method, bytes, rs.length.toLong, rs.map(_._4).sum / rs.length) }
        .sortBy { case (method, bytes, _, _) => (bytes, method) }
      s.createDataFrame(out)
        .toDF("method", "bytes_per_vector", "n_queries", "mean_recall_bp")
    }),

    // Multiprobe LSH: the classic recall lever that needs NO extra index —
    // each query probes its own sign-bucket PLUS the np buckets at Hamming
    // distance 1 (one hyperplane flipped), the buckets a near-neighbor
    // most likely fell into when it landed just the other side of one
    // plane. Declared as a recall eval against the exact top-10 truth for
    // BOTH probe schedules, so the lever's value (probe1 vs multiprobe
    // recall, candidate cost) is an oracle-pinned number, not a claim.
    // Scale: probes are a ≤ queries×(np+1) broadcast; candidates resolve
    // by one bucket equi-join; recall joins are 5×10-row relations.
    "ann_lsh_multiprobe_recall_eval" -> ((s, d) => {
      val np = lshPlanesOf(s, d)
      val b = CacheScope.persist(emb(s, d).selectExpr(
        "vec_id", s"CAST(${lshBucketSparkExpr("embedding", np)} AS BIGINT) AS bucket"))
      val qb = b.filter(col("vec_id") < 5)
        .selectExpr("vec_id AS query_id", "bucket AS qbucket")
      val truth = bruteTruth(s, d)
        .select(col("query_id"), col("neighbor_id").as("vec_id"))
        .withColumn("hit", lit(1L))
      def evalFor(label: String, probes: DataFrame): DataFrame =
        b.join(broadcast(probes), col("bucket") === col("pb"))
          .filter(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id")).distinct()
          .join(truth, Seq("query_id", "vec_id"), "left")
          .groupBy(col("query_id"))
          .agg(count(lit(1)).as("n_candidates"),
            sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
          .selectExpr(s"'$label' AS method", "query_id", "n_candidates",
            "n_hits", "(n_hits * 10000) div 10 AS recall_bp")
      val p1 = qb.select(col("query_id"), col("qbucket").as("pb"))
      val pm = qb.selectExpr("query_id",
        s"explode(array(qbucket, ${(0 until np).map(j => s"qbucket ^ ${1L << j}L").mkString(", ")})) AS pb")
      evalFor("probe1", p1).union(evalFor(s"multiprobe${np + 1}", pm))
        .orderBy(asc("method"), asc("query_id"))
    }),

    // Metric-learning triplet evaluation: for each anchor (vec_id < 100),
    // the hardest positive (nearest same-label) and hardest negative
    // (nearest different-label) by exact cosine; per true label — does the
    // space rank the positive above the negative (win rate), and by what
    // margin? This is the separation diagnostic behind contrastive /
    // triplet-loss training data: a label whose win_bp is low means its
    // region is entangled and label-conditioned sampling from it is
    // unreliable. Scale: probe×corpus with the probe side broadcast (the
    // knn-label-eval shape); the argmax windows run on probe-sized
    // partitions; margins are exact ppm integers, the mean uses the
    // toward-zero integer division both engines share.
    "embedding_triplet_eval" -> ((s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val e = emb(s, d).selectExpr("vec_id", "label",
        "embedding AS v", "vec_norm2(embedding) AS n2")
      val q = e.filter(col("vec_id") < 100)
        .selectExpr("vec_id AS query_id", "label AS qlabel",
          "v AS qv", "n2 AS qn2")
      val top = q.join(e, col("query_id") =!= col("vec_id"))
        .selectExpr("query_id", "qlabel", "vec_id",
          "CAST(floor(vec_dot(qv, v) / (sqrt(qn2) * sqrt(n2)) * 1000000) AS BIGINT) AS cos_ppm",
          "CASE WHEN label = qlabel THEN 1 ELSE 0 END AS same")
        .withColumn("rk", row_number().over(
          W.partitionBy(col("query_id"), col("same"))
            .orderBy(desc("cos_ppm"), asc("vec_id"))))
        .filter(col("rk") === 1)
      val pos = top.filter(col("same") === 1)
        .select(col("query_id"), col("qlabel"), col("cos_ppm").as("pos_ppm"))
      val neg = top.filter(col("same") === 0)
        .select(col("query_id"), col("cos_ppm").as("neg_ppm"))
      pos.join(neg, Seq("query_id"))
        .selectExpr("qlabel", "pos_ppm - neg_ppm AS margin_ppm")
        .groupBy(col("qlabel"))
        .agg(count(lit(1)).as("n_anchors"),
          sum(expr("CASE WHEN margin_ppm > 0 THEN 1L ELSE 0L END")).as("n_wins"),
          sum(col("margin_ppm")).as("sum_margin"))
        .selectExpr("CAST(qlabel AS BIGINT) AS label", "n_anchors", "n_wins",
          "(n_wins * 10000) div n_anchors AS win_bp",
          "sum_margin div n_anchors AS mean_margin_ppm")
        .orderBy(asc("label"))
    }),

    // SQ8 recall dashboard: the sq8 tier's top-10 scored against the exact
    // cosine truth, same contract as ann_recall_eval (composes the tier
    // queries verbatim so the eval cannot drift from what it measures).
    // Note the metric mismatch is intentional: sq8 ADC is L2 on quantized
    // coordinates while truth is exact cosine — the eval measures what a
    // user of the index experiences, not quantization error in isolation.
    "ann_sq8_recall_eval" -> ((s, d) => {
      val truth = bruteTruth(s, d)
        .select(col("query_id"), col("neighbor_id"))
      queries("ann_sq8_adc")(s, d)
        .select(col("query_id"), col("neighbor_id"))
        .join(truth.withColumn("hit", lit(1L)),
          Seq("query_id", "neighbor_id"), "left")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_returned"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
        .selectExpr("query_id", "n_returned", "n_hits",
          "(n_hits * 10000) div n_returned AS hit_bp")
        .orderBy(asc("query_id"))
    })
  )

  /** (vec_id, i [1-based], x DOUBLE) per-dimension relation — the SQ8
    * working set. Floats widen to DOUBLE exactly, so both engines see
    * identical coordinates. */
  private def sq8Dims(e: DataFrame): DataFrame =
    e.select(col("vec_id"), posexplode(col("embedding")).as(Seq("i0", "xf")))
      .selectExpr("vec_id", "CAST(i0 + 1 AS BIGINT) AS i", "CAST(xf AS DOUBLE) AS x")

  /** Affine 8-bit code; the clamp is belt-and-braces (x ∈ [mn, mx] by
    * construction) and the degenerate constant dimension maps to code 0.
    * One pinned parenthesization, mirrored textually in the oracle. */
  private val sq8CodeSpark: String =
    "CASE WHEN mx = mn THEN CAST(0 AS BIGINT) ELSE " +
      "least(CAST(255 AS BIGINT), greatest(CAST(0 AS BIGINT), " +
      "CAST(floor(((x - mn) * CAST(255 AS DOUBLE)) / (mx - mn)) AS BIGINT))) END AS code"

  /** Per-(query, dim, code) ADC term: squared distance from the full-
    * precision query coordinate to the mid-bucket dequantized value,
    * e8-floored to BIGINT so the 64-term sum is order-free. Max term
    * ≈ (coordinate range)²·1e8 ≪ int64/64. */
  private val sq8TermSpark: String = {
    // the dequantized mid-bucket value, every operand pinned to DOUBLE
    // (DuckDB parses a bare `0.5` literal as DECIMAL — the cast keeps the
    // two engines in the same IEEE arithmetic)
    val deq = "(mn + (((CAST(code AS DOUBLE) + CAST(0.5 AS DOUBLE)) * (mx - mn)) / CAST(255 AS DOUBLE)))"
    s"CAST(floor(((qx - $deq) * (qx - $deq)) * CAST(100000000 AS DOUBLE)) AS BIGINT)"
  }

  def oracles: Map[String, String] =
    baseOracles + ("ann_recall_eval" -> annRecallEvalOracle) +
      ("ann_range_recall_eval" -> annRangeRecallEvalOracle) +
      ("ann_sq8_recall_eval" -> annSq8RecallEvalOracle) +
      ("ann_lsh_multiprobe_recall_eval" -> annMultiprobeOracle) +
      ("ann_quantization_pareto" -> annParetoOracle)

  /** Memory/recall Pareto, every tier eval embedded as a derived table —
    * the dashboard moves in lockstep with the tiers it summarizes. */
  private lazy val annParetoOracle: String =
    "WITH fl AS (SELECT 'full_f32' AS method, " +
      s"CAST(${4 * Dim} AS BIGINT) AS bytes_per_vector, query_id, " +
      "CAST(10000 AS BIGINT) AS recall_bp FROM " +
      s"(${baseOracles("ann_bruteforce_topk")}) _f GROUP BY query_id), " +
      s"s8 AS (SELECT 'sq8' AS method, CAST($Dim AS BIGINT) AS bytes_per_vector, " +
      s"query_id, hit_bp AS recall_bp FROM ($annSq8RecallEvalOracle) _s), " +
      "iv AS (SELECT method, CAST(CASE WHEN method = 'ivf_pq' THEN " +
      s"$PqM ELSE ${PqM + 4 * Dim} END AS BIGINT) AS bytes_per_vector, " +
      s"query_id, hit_bp AS recall_bp FROM ($annRecallEvalOracle) _i " +
      "WHERE method IN ('ivf_pq', 'ivf_pq_refined')), " +
      "mt AS (SELECT 'matryoshka' || CAST(dims AS VARCHAR) AS method, " +
      "dims * 4 AS bytes_per_vector, query_id, recall_bp FROM " +
      s"(${baseOracles("embedding_matryoshka_eval")}) _m), " +
      "u AS (SELECT * FROM fl UNION ALL SELECT * FROM s8 " +
      "UNION ALL SELECT * FROM iv UNION ALL SELECT * FROM mt) " +
      "SELECT method, bytes_per_vector, count(*) AS n_queries, " +
      "CAST(sum(recall_bp) AS BIGINT) // count(*) AS mean_recall_bp " +
      "FROM u GROUP BY method, bytes_per_vector " +
      "ORDER BY bytes_per_vector, method"

  /** Multiprobe-vs-single-bucket recall, the truth embedded as a derived
    * table; Hamming-1 probes generated by a static 24-flip grid CASE'd to
    * the adaptive plane count (the lshBucketDuckAdaptive discipline). */
  private lazy val annMultiprobeOracle: String =
    s"WITH $lshPlanesDuckCte, " +
      s"b AS (SELECT vec_id, CAST(${lshBucketDuckAdaptive("embedding")} AS BIGINT) AS bucket " +
      "FROM embeddings CROSS JOIN npc), " +
      "qb AS (SELECT vec_id AS query_id, bucket AS qbucket FROM b WHERE vec_id < 5), " +
      "p1 AS (SELECT query_id, qbucket AS pb FROM qb), " +
      s"pm AS (SELECT query_id, pb FROM (SELECT query_id, " +
      s"CASE WHEN r.j < np THEN xor(qbucket, (CAST(1 AS BIGINT) << r.j)) END AS pb " +
      s"FROM qb CROSS JOIN npc CROSS JOIN range(0, $MaxOraclePlanes) r(j)) _f " +
      "WHERE pb IS NOT NULL UNION ALL SELECT query_id, pb FROM p1), " +
      "truth AS (SELECT query_id, neighbor_id AS vec_id FROM " +
      s"(${baseOracles("ann_bruteforce_topk")}) _t), " +
      "c1 AS (SELECT DISTINCT p.query_id, b.vec_id FROM b " +
      "JOIN p1 p ON b.bucket = p.pb WHERE b.vec_id <> p.query_id), " +
      "cm AS (SELECT DISTINCT p.query_id, b.vec_id FROM b " +
      "JOIN pm p ON b.bucket = p.pb WHERE b.vec_id <> p.query_id), " +
      "s1 AS (SELECT 'probe1' AS method, c1.query_id, count(*) AS n_candidates, " +
      "CAST(sum(CASE WHEN t.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits " +
      "FROM c1 LEFT JOIN truth t ON t.query_id = c1.query_id AND t.vec_id = c1.vec_id " +
      "GROUP BY c1.query_id), " +
      "sm AS (SELECT 'multiprobe' || CAST(np + 1 AS VARCHAR) AS method, cm.query_id, " +
      "count(*) AS n_candidates, " +
      "CAST(sum(CASE WHEN t.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits " +
      "FROM cm LEFT JOIN truth t ON t.query_id = cm.query_id AND t.vec_id = cm.vec_id " +
      "CROSS JOIN npc GROUP BY cm.query_id, np) " +
      "SELECT method, query_id, n_candidates, n_hits, (n_hits * 10000) // 10 AS recall_bp " +
      "FROM (SELECT * FROM s1 UNION ALL SELECT * FROM sm) _u " +
      "ORDER BY method, query_id"

  /** SQ8-tier recall vs exact cosine truth, both embedded as derived
    * tables (the ann_recall_eval lockstep discipline). */
  private lazy val annSq8RecallEvalOracle: String =
    "WITH truth AS (SELECT query_id, neighbor_id FROM " +
      s"(${baseOracles("ann_bruteforce_topk")}) _t), " +
      "s8 AS (SELECT query_id, neighbor_id FROM " +
      s"(${baseOracles("ann_sq8_adc")}) _s) " +
      "SELECT s8.query_id AS query_id, count(*) AS n_returned, " +
      "CAST(sum(CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits, " +
      "(CAST(sum(CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) * 10000) " +
      "// count(*) AS hit_bp " +
      "FROM s8 LEFT JOIN truth t ON t.query_id = s8.query_id " +
      "AND t.neighbor_id = s8.neighbor_id " +
      "GROUP BY s8.query_id ORDER BY query_id"

  /** Range-tier recall vs exact threshold truth, the range oracle embedded
    * as a derived table so the eval moves in lockstep with the tier. */
  private lazy val annRangeRecallEvalOracle: String =
    "WITH f AS (SELECT query_id, neighbor_id FROM " +
      s"(${baseOracles("ann_range_search")}) _f), " +
      "q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5), " +
      "t AS (SELECT query_id, e.vec_id AS neighbor_id FROM q " +
      "JOIN embeddings e ON e.vec_id <> query_id " +
      s"WHERE ${cosPpmDuck("qv", "e.embedding")} >= $RangeTauPpm) " +
      "SELECT t.query_id AS query_id, count(*) AS n_truth, " +
      "CAST(sum(CASE WHEN f.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_found, " +
      "(CAST(sum(CASE WHEN f.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) * 10000) " +
      "// count(*) AS recall_bp " +
      "FROM t LEFT JOIN f ON t.query_id = f.query_id AND t.neighbor_id = f.neighbor_id " +
      "GROUP BY t.query_id ORDER BY t.query_id"

  /** Index-quality evaluation as a query: the ANN tiers scored against the
    * exact top-10 truth they approximate. Built by embedding the tier
    * oracles as derived tables so the eval can NEVER drift from the tiers
    * it measures — a change to any tier's oracle changes this one in
    * lockstep. */
  private lazy val annRecallEvalOracle: String = {
    def sub(name: String, alias: String) =
      s"$alias AS (SELECT query_id, neighbor_id FROM (${baseOracles(name)}) _$alias)"
    def scored(label: String, rel: String) =
      s"SELECT '$label' AS method, $rel.query_id AS query_id, " +
        "count(*) AS n_returned, " +
        "CAST(sum(CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits " +
        s"FROM $rel LEFT JOIN truth t ON $rel.query_id = t.query_id " +
        s"AND $rel.neighbor_id = t.neighbor_id GROUP BY $rel.query_id"
    "WITH " + Seq(
      sub("ann_bruteforce_topk", "truth"),
      sub("ann_ivf_probe", "rp"),
      sub("ann_ivf_pq", "rq"),
      sub("ann_ivf_pq_refined", "rr2")).mkString(", ") + ", " +
      "sc AS (" + Seq(
        scored("ivf_probe", "rp"),
        scored("ivf_pq", "rq"),
        scored("ivf_pq_refined", "rr2")).mkString(" UNION ALL ") + ") " +
      "SELECT method, query_id, n_returned, n_hits, " +
      "(n_hits * 10000) // n_returned AS hit_bp " +
      "FROM sc ORDER BY method, query_id"
  }

  private lazy val baseOracles: Map[String, String] = Map(
    "ann_bruteforce_topk" ->
      ("WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5), " +
        "scored AS (SELECT query_id, e.vec_id AS neighbor_id, " +
        s"${cosPpmDuck("qv", "e.embedding")} AS cos_ppm, " +
        s"row_number() OVER (PARTITION BY query_id ORDER BY ${cosPpmDuck("qv", "e.embedding")} DESC, e.vec_id) AS rank " +
        "FROM q JOIN embeddings e ON e.vec_id <> query_id) " +
        "SELECT query_id, rank, neighbor_id, cos_ppm FROM scored WHERE rank <= 10 " +
        "ORDER BY query_id, rank"),
    "ann_knn_label_eval" ->
      ("WITH q AS (SELECT vec_id AS query_id, label AS qlabel, embedding AS qv " +
        "FROM embeddings WHERE vec_id < 100), " +
        "scored AS (SELECT query_id, qlabel, e.label, e.vec_id, " +
        s"row_number() OVER (PARTITION BY query_id ORDER BY ${cosPpmDuck("qv", "e.embedding")} DESC, e.vec_id) AS rank " +
        "FROM q JOIN embeddings e ON e.vec_id <> query_id), " +
        "t5 AS (SELECT * FROM scored WHERE rank <= 5), " +
        "t1 AS (SELECT query_id, qlabel, " +
        "CASE WHEN label = qlabel THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS t1 " +
        "FROM t5 WHERE rank = 1), " +
        "votes AS (SELECT query_id, label, count(*) AS nv FROM t5 GROUP BY query_id, label), " +
        "mj AS (SELECT query_id, label AS vlabel, " +
        "row_number() OVER (PARTITION BY query_id ORDER BY nv DESC, label) AS vrk FROM votes), " +
        "m5 AS (SELECT query_id, vlabel FROM mj WHERE vrk = 1), " +
        "j AS (SELECT t1.qlabel, t1.t1, " +
        "CASE WHEN m5.vlabel = t1.qlabel THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS m5 " +
        "FROM t1 JOIN m5 ON m5.query_id = t1.query_id) " +
        "SELECT CAST(qlabel AS BIGINT) AS label, count(*) AS n_queries, " +
        "CAST(sum(t1) AS BIGINT) AS n_top1_correct, CAST(sum(m5) AS BIGINT) AS n_maj5_correct, " +
        "(CAST(sum(t1) AS BIGINT) * 10000) // count(*) AS top1_acc_bp, " +
        "(CAST(sum(m5) AS BIGINT) * 10000) // count(*) AS maj5_acc_bp " +
        "FROM j GROUP BY qlabel ORDER BY label"),
    "ann_knn_calibration" ->
      ("WITH q AS (SELECT vec_id AS query_id, label AS qlabel, embedding AS qv " +
        "FROM embeddings WHERE vec_id < 100), " +
        "scored AS (SELECT query_id, qlabel, e.label, e.vec_id, " +
        s"row_number() OVER (PARTITION BY query_id ORDER BY ${cosPpmDuck("qv", "e.embedding")} DESC, e.vec_id) AS rank " +
        "FROM q JOIN embeddings e ON e.vec_id <> query_id), " +
        "t5 AS (SELECT * FROM scored WHERE rank <= 5), " +
        "votes AS (SELECT query_id, qlabel, label, count(*)::BIGINT AS nv " +
        "FROM t5 GROUP BY 1, 2, 3), " +
        "w AS (SELECT query_id, qlabel, label, nv, row_number() OVER " +
        "(PARTITION BY query_id ORDER BY nv DESC, label) AS vrk FROM votes), " +
        "b AS (SELECT nv AS votes, " +
        "CASE WHEN label = qlabel THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS ok " +
        "FROM w WHERE vrk = 1) " +
        "SELECT votes, count(*)::BIGINT AS n_queries, CAST(sum(ok) AS BIGINT) AS n_correct, " +
        "votes * 2000 AS conf_bp, " +
        "(CAST(sum(ok) AS BIGINT) * 10000) // count(*) AS acc_bp " +
        "FROM b GROUP BY votes ORDER BY votes"),
    "embedding_matryoshka_eval" -> {
      // dims-parameterized twin of cosPpmDuck: the same range(1, k+1)
      // index-ordered double fold Spark's slice()+vec_dot produces
      def cosK(a: String, b: String, k: Int): String =
        s"CAST(floor(${dotDuck(a, b, k)} / (sqrt(${norm2Duck(a, k)}) * " +
          s"sqrt(${norm2Duck(b, k)})) * 1000000) AS BIGINT)"
      def topkCte(name: String, k: Int): String =
        s"$name AS (SELECT query_id, vec_id FROM (" +
          "SELECT query_id, e.vec_id AS vec_id, " +
          s"row_number() OVER (PARTITION BY query_id ORDER BY ${cosK("qv", "e.embedding", k)} DESC, e.vec_id) AS rank " +
          "FROM q JOIN embeddings e ON e.vec_id <> query_id) s WHERE rank <= 10)"
      def evalSel(name: String, dims: Int): String =
        s"SELECT CAST($dims AS BIGINT) AS dims, c.query_id, count(*) AS n_returned, " +
          "CAST(sum(CASE WHEN t.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits, " +
          "(CAST(sum(CASE WHEN t.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) * 10000) // count(*) AS recall_bp " +
          s"FROM $name c LEFT JOIN truth t ON t.query_id = c.query_id AND t.vec_id = c.vec_id " +
          "GROUP BY c.query_id"
      "WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5), " +
        s"${topkCte("truth", Dim)}, ${topkCte("k8", 8)}, ${topkCte("k16", 16)}, ${topkCte("k32", 32)} " +
        s"${evalSel("k8", 8)} UNION ALL ${evalSel("k16", 16)} UNION ALL ${evalSel("k32", 32)} " +
        "ORDER BY dims, query_id"
    },
    "ann_lsh_buckets" ->
      (s"WITH $lshPlanesDuckCte, " +
        s"b AS (SELECT vec_id, label, CAST(${lshBucketDuckAdaptive("embedding")} AS BIGINT) AS bucket " +
        "FROM embeddings CROSS JOIN npc) " +
        "SELECT bucket, count(*) AS n_vectors, min(vec_id) AS min_vec_id, " +
        "max(vec_id) AS max_vec_id, count(DISTINCT label) AS n_labels " +
        "FROM b GROUP BY bucket ORDER BY bucket"),
    "ann_lsh_pairs" ->
      (s"WITH $lshPlanesDuckCte, " +
        s"b AS (SELECT vec_id, embedding AS v, ${lshBucketDuckAdaptive("embedding")} AS bucket " +
        "FROM embeddings CROSS JOIN npc) " +
        s"SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b, ${cosPpmDuck("a.v", "b2.v")} AS cos_ppm " +
        "FROM b AS a JOIN b AS b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id " +
        s"WHERE ${cosPpmDuck("a.v", "b2.v")} >= 100000 ORDER BY vec_a, vec_b"),
    "ann_ivf_imbalance" ->
      (s"WITH ${coarseDuckCtes()}, " +
        "sizes AS (SELECT cell, count(*) AS sz FROM cassign GROUP BY cell), " +
        "r AS (SELECT sz, row_number() OVER (ORDER BY sz, cell) AS rk FROM sizes) " +
        "SELECT count(*)::BIGINT AS n_cells, CAST(sum(sz) AS BIGINT) AS n_assign, " +
        "CAST(min(sz) AS BIGINT) AS min_cell, CAST(max(sz) AS BIGINT) AS max_cell, " +
        "(CAST(max(sz) AS BIGINT) * count(*) * 1000000) // CAST(sum(sz) AS BIGINT) AS hot_factor_e6, " +
        "CAST(((sum(CAST(2 * rk AS HUGEINT) * sz) - CAST(count(*) + 1 AS HUGEINT) * sum(sz)) " +
        "* 1000000) // (CAST(count(*) AS HUGEINT) * sum(sz)) AS BIGINT) AS gini_e6 " +
        "FROM r"),
    "ann_ivf_probe" ->
      (s"WITH ${coarseDuckCtes()}, " +
        "member AS (SELECT DISTINCT p.query_id, a.vec_id FROM cassign a " +
        "JOIN qprob p ON a.cell = p.cell), " +
        "q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5), " +
        "scored AS (SELECT mb.query_id, e.vec_id AS neighbor_id, " +
        s"${cosPpmDuck("qv", "e.embedding")} AS cos_ppm, " +
        s"row_number() OVER (PARTITION BY mb.query_id ORDER BY ${cosPpmDuck("qv", "e.embedding")} DESC, e.vec_id) AS rank " +
        "FROM member mb JOIN embeddings e ON e.vec_id = mb.vec_id " +
        "JOIN q ON q.query_id = mb.query_id WHERE e.vec_id <> mb.query_id) " +
        "SELECT query_id, rank, neighbor_id, cos_ppm FROM scored WHERE rank <= 5 " +
        "ORDER BY query_id, rank"),
    "ann_range_search" ->
      (s"WITH ${coarseDuckCtes(probeK = RangeProbeCells)}, " +
        "member AS (SELECT DISTINCT p.query_id, a.vec_id FROM cassign a " +
        "JOIN qprob p ON a.cell = p.cell), " +
        "q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5) " +
        "SELECT mb.query_id AS query_id, e.vec_id AS neighbor_id, " +
        s"${cosPpmDuck("qv", "e.embedding")} AS cos_ppm " +
        "FROM member mb JOIN embeddings e ON e.vec_id = mb.vec_id " +
        "JOIN q ON q.query_id = mb.query_id WHERE e.vec_id <> mb.query_id " +
        s"AND ${cosPpmDuck("qv", "e.embedding")} >= $RangeTauPpm " +
        "ORDER BY query_id, neighbor_id"),
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
      (s"WITH ${coarseDuckCtes()}, " +
        s"$pqDuckCtes, " +
        "member AS (SELECT DISTINCT p.query_id, a.vec_id FROM cassign a " +
        "JOIN qprob p ON a.cell = p.cell), " +
        "adc AS (SELECT mb.query_id, k.vec_id, CAST(sum(t.qd_e10) AS BIGINT) AS adc_e10 " +
        "FROM codes k JOIN member mb ON k.vec_id = mb.vec_id " +
        "JOIN qtab t ON t.query_id = mb.query_id AND t.m = k.m AND t.code = k.code " +
        "WHERE mb.query_id <> k.vec_id GROUP BY mb.query_id, k.vec_id), " +
        "ranked AS (SELECT query_id, vec_id, adc_e10, row_number() OVER " +
        "(PARTITION BY query_id ORDER BY adc_e10 ASC, vec_id) AS rank FROM adc) " +
        "SELECT query_id, rank, vec_id AS neighbor_id, adc_e10 " +
        "FROM ranked WHERE rank <= 10 ORDER BY query_id, rank"),
    "ann_ivf_pq_refined" ->
      (s"WITH ${coarseDuckCtes()}, " +
        s"$pqDuckCtes, " +
        "member AS (SELECT DISTINCT p.query_id, a.vec_id FROM cassign a " +
        "JOIN qprob p ON a.cell = p.cell), " +
        "adc AS (SELECT mb.query_id, k.vec_id, CAST(sum(t.qd_e10) AS BIGINT) AS adc_e10 " +
        "FROM codes k JOIN member mb ON k.vec_id = mb.vec_id " +
        "JOIN qtab t ON t.query_id = mb.query_id AND t.m = k.m AND t.code = k.code " +
        "WHERE mb.query_id <> k.vec_id GROUP BY mb.query_id, k.vec_id), " +
        "short AS (SELECT query_id, vec_id FROM (SELECT query_id, vec_id, row_number() OVER " +
        "(PARTITION BY query_id ORDER BY adc_e10 ASC, vec_id) AS rank0 FROM adc) WHERE rank0 <= 50), " +
        "qq AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5), " +
        "rr AS (SELECT s.query_id, e.vec_id AS neighbor_id, " +
        s"${cosPpmDuck("qq.qv", "e.embedding")} AS cos_ppm, " +
        s"row_number() OVER (PARTITION BY s.query_id ORDER BY ${cosPpmDuck("qq.qv", "e.embedding")} DESC, e.vec_id) AS rank " +
        "FROM short s JOIN embeddings e ON e.vec_id = s.vec_id " +
        "JOIN qq ON qq.query_id = s.query_id) " +
        "SELECT query_id, rank, neighbor_id, cos_ppm FROM rr WHERE rank <= 10 " +
        "ORDER BY query_id, rank"),
    // the Lloyd chain unrolled (seed → assign → e10-mean), emitting each
    // round's per-cell census from the SAME cagg relation the next
    // centroid is folded from
    "embedding_kmeans_rounds" -> {
      val sb = new StringBuilder("WITH ")
      sb ++= s"cseed AS (SELECT row_number() OVER (ORDER BY $scrambleSql, vec_id) - 1 AS cell, " +
        "list_transform(embedding, x -> x::DOUBLE) AS cv FROM embeddings " +
        s"ORDER BY $scrambleSql, vec_id LIMIT $CoarseK), "
      sb ++= "ccmp AS MATERIALIZED (SELECT vec_id, p.range AS pos, " +
        "CAST(floor(list_extract(embedding, p.range)::DOUBLE * 10000000000) AS BIGINT) AS xe10 " +
        s"FROM embeddings CROSS JOIN range(1, ${Dim + 1}) p), "
      var prev = "cseed"
      for (i <- 1 to CoarseIters) {
        sb ++= s"casn$i AS MATERIALIZED (SELECT vec_id, cell FROM (SELECT vec_id, cell, " +
          "row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rk FROM " +
          s"(SELECT e.vec_id, c.cell, ${shiftDistDuck("e.embedding", "c.cv", Dim)} AS dist " +
          s"FROM embeddings e CROSS JOIN $prev c) _s$i) _r$i WHERE rk = 1), "
        sb ++= duckMeanCtes("c", i, "cell", s"casn$i JOIN ccmp USING (vec_id)")
        prev = s"ccent$i"
      }
      val unions = (1 to CoarseIters).map(i =>
        s"SELECT CAST($i AS BIGINT) AS round, CAST(cell AS BIGINT) AS cell, " +
          s"max(cnt) AS n_members, CAST(sum(sx) AS BIGINT) AS mass_e10 " +
          s"FROM cagg$i GROUP BY cell").mkString(" UNION ALL ")
      sb ++= s"fin AS ($unions) " +
        "SELECT round, cell, n_members, mass_e10 FROM fin ORDER BY round, cell"
      sb.toString
    },

    "ann_filtered_topk" ->
      ("WITH q AS (SELECT vec_id AS query_id, label AS qlabel, embedding AS qv " +
        "FROM embeddings WHERE vec_id < 5), " +
        "scored AS (SELECT query_id, CAST(qlabel AS BIGINT) AS qlabel, e.vec_id, " +
        s"${cosPpmDuck("qv", "e.embedding")} AS cos_ppm, " +
        s"row_number() OVER (PARTITION BY query_id ORDER BY ${cosPpmDuck("qv", "e.embedding")} DESC, e.vec_id) AS rank " +
        "FROM q JOIN embeddings e ON e.label = q.qlabel AND e.vec_id <> query_id) " +
        "SELECT query_id, qlabel, rank, vec_id AS neighbor_id, cos_ppm " +
        "FROM scored WHERE rank <= 5 ORDER BY query_id, rank"),

    "ann_postfilter_recall_eval" ->
      ("WITH q AS (SELECT vec_id AS query_id, label AS qlabel, embedding AS qv " +
        "FROM embeddings WHERE vec_id < 5), " +
        "unf AS (SELECT query_id, CAST(qlabel AS BIGINT) AS qlabel, " +
        "CAST(e.label AS BIGINT) AS label, e.vec_id, " +
        s"row_number() OVER (PARTITION BY query_id ORDER BY ${cosPpmDuck("qv", "e.embedding")} DESC, e.vec_id) AS rank " +
        "FROM q JOIN embeddings e ON e.vec_id <> query_id), " +
        "c15 AS (SELECT * FROM unf WHERE rank <= 15), " +
        "post AS (SELECT query_id, qlabel, vec_id FROM (SELECT *, " +
        "row_number() OVER (PARTITION BY query_id ORDER BY rank) AS prk " +
        "FROM c15 WHERE label = qlabel) _ WHERE prk <= 5), " +
        "tf AS (SELECT query_id, vec_id FROM (SELECT query_id, e.vec_id, " +
        s"row_number() OVER (PARTITION BY query_id ORDER BY ${cosPpmDuck("qv", "e.embedding")} DESC, e.vec_id) AS rank " +
        "FROM q JOIN embeddings e ON e.label = q.qlabel AND e.vec_id <> query_id) _ " +
        "WHERE rank <= 5), " +
        "nf AS (SELECT query_id, count(*)::BIGINT AS n_after_filter FROM post GROUP BY 1), " +
        "h AS (SELECT post.query_id, count(*)::BIGINT AS n_hits FROM post " +
        "JOIN tf ON tf.query_id = post.query_id AND tf.vec_id = post.vec_id GROUP BY 1) " +
        // every panel query emits a row — zero label matches in the
        // budget is recall 0, not an absent row
        "SELECT q.query_id, CAST(q.qlabel AS BIGINT) AS qlabel, " +
        "COALESCE(nf.n_after_filter, CAST(0 AS BIGINT)) AS n_after_filter, " +
        "COALESCE(h.n_hits, CAST(0 AS BIGINT)) AS n_hits, " +
        "(COALESCE(h.n_hits, CAST(0 AS BIGINT)) * 10000) // 5 AS recall_bp " +
        "FROM q LEFT JOIN nf ON nf.query_id = q.query_id " +
        "LEFT JOIN h ON h.query_id = q.query_id ORDER BY q.query_id"),

    "embedding_isotropy" ->
      ("WITH p AS (SELECT a.vec_id AS ai, " +
        s"${cosPpmDuck("a.embedding", "b.embedding")} AS cos_ppm " +
        "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id " +
        "WHERE a.vec_id < 64 AND b.vec_id < 64) " +
        "SELECT count(*)::BIGINT AS n_pairs, " +
        "CAST(sum(cos_ppm) AS BIGINT) // count(*) AS mean_cos_ppm, " +
        "CAST(sum(abs(cos_ppm)) AS BIGINT) // count(*) AS mean_abs_cos_ppm, " +
        "CAST(min(cos_ppm) AS BIGINT) AS min_cos_ppm, " +
        "CAST(max(cos_ppm) AS BIGINT) AS max_cos_ppm FROM p"),

    "vector_stats" ->
      (s"SELECT label, count(*) AS n, " +
        s"min(CAST(floor(sqrt(${norm2Duck("embedding", Dim)}) * 1000000) AS BIGINT)) AS min_norm_ppm, " +
        s"max(CAST(floor(sqrt(${norm2Duck("embedding", Dim)}) * 1000000) AS BIGINT)) AS max_norm_ppm " +
        "FROM embeddings GROUP BY label ORDER BY label"),

    "embedding_cluster_quality" ->
      ("WITH ecmp AS (SELECT label, vec_id, p.range AS pos, " +
        "CAST(floor(list_extract(embedding, p.range)::DOUBLE * 10000000000) AS BIGINT) AS xe10 " +
        s"FROM embeddings CROSS JOIN range(1, ${Dim + 1}) p), " +
        duckMeanCtes("gq", 1, "label", "ecmp") +
        "memb AS (SELECT e.label, " +
        s"CAST(floor((${l2DistDuck("e.embedding", "c.cv", Dim)}) * 10000000000) AS BIGINT) AS de10 " +
        "FROM embeddings e JOIN gqcent1 c USING (label)), " +
        "coh AS (SELECT label, count(*) AS n_vecs, " +
        "CAST(sum(de10) // count(*) AS BIGINT) AS cohesion_e10 FROM memb GROUP BY label), " +
        "pairs AS (SELECT a.label, b.label AS olabel, " +
        s"CAST(floor((${l2DistDuck("a.cv", "b.cv", Dim)}) * 10000000000) AS BIGINT) AS se10 " +
        "FROM gqcent1 a JOIN gqcent1 b ON a.label != b.label), " +
        "sep AS (SELECT label, olabel AS nn_label, se10 AS nn_sep_e10 FROM (" +
        "SELECT label, olabel, se10, row_number() OVER " +
        "(PARTITION BY label ORDER BY se10, olabel) AS rk FROM pairs) _ WHERE rk = 1) " +
        "SELECT coh.label, n_vecs, cohesion_e10, nn_label, nn_sep_e10, " +
        "CAST((cohesion_e10 * 10000) // greatest(nn_sep_e10, 1) AS BIGINT) AS compactness_bp " +
        "FROM coh JOIN sep ON coh.label = sep.label ORDER BY coh.label"),

    "embedding_outlier_scores" ->
      ("WITH q AS (SELECT vec_id, label, p.range AS i, " +
        "CAST(floor(list_extract(embedding, p.range + 1)::DOUBLE * 10000) AS BIGINT) AS q " +
        s"FROM embeddings CROSS JOIN range(0, $Dim) p), " +
        "cent AS (SELECT label, i, CAST(sum(q) // count(*) AS BIGINT) AS c " +
        "FROM q GROUP BY label, i), " +
        "dist AS (SELECT vec_id, q.label, CAST(sum((q - c) * (q - c)) AS BIGINT) AS d2 " +
        "FROM q JOIN cent ON cent.label = q.label AND cent.i = q.i GROUP BY vec_id, q.label), " +
        "st AS (SELECT label, CAST(sum(d2) // count(*) AS BIGINT) AS mean_d2 " +
        "FROM dist GROUP BY label), " +
        "r AS (SELECT dist.label, vec_id, d2, " +
        "(d2 * 10000) // greatest(mean_d2, 1) AS score_bp, " +
        "row_number() OVER (PARTITION BY dist.label " +
        "ORDER BY (d2 * 10000) // greatest(mean_d2, 1) DESC, vec_id) AS rank " +
        "FROM dist JOIN st USING (label)) " +
        "SELECT CAST(label AS BIGINT) AS label, CAST(rank AS BIGINT) AS rank, " +
        "vec_id, d2, score_bp FROM r WHERE rank <= 5 ORDER BY label, rank"),

    "embedding_pca_project" -> pcaOracleSql,

    "embedding_covariance" ->
      (s"WITH q AS (SELECT pi.i AS i, pj.j AS j, " +
        "CAST(floor(list_extract(embedding, pi.i + 1)::DOUBLE * 10000) AS BIGINT) AS xi, " +
        "CAST(floor(list_extract(embedding, pj.j + 1)::DOUBLE * 10000) AS BIGINT) AS xj " +
        s"FROM embeddings, range(0, $CovDims) pi(i), range(0, $CovDims) pj(j) " +
        "WHERE pj.j >= pi.i), " +
        "a AS (SELECT i, j, count(*) AS n, CAST(sum(xi) AS BIGINT) AS sxi, " +
        "CAST(sum(xj) AS BIGINT) AS sxj, CAST(sum(xi * xj) AS BIGINT) AS sxixj " +
        "FROM q GROUP BY i, j) " +
        "SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j, n, sxi, sxj, sxixj, " +
        "n * sxixj - sxi * sxj AS cov_num_e8, " +
        "CAST(floor(CAST(n * sxixj - sxi * sxj AS DOUBLE) / " +
        "(CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS BIGINT) AS cov_e8 " +
        "FROM a ORDER BY i, j"),
    "embedding_triplet_eval" ->
      ("WITH q AS (SELECT vec_id AS query_id, label AS qlabel, embedding AS qv " +
        "FROM embeddings WHERE vec_id < 100), " +
        "sc AS (SELECT query_id, qlabel, e.vec_id, " +
        s"${cosPpmDuck("qv", "e.embedding")} AS cos_ppm, " +
        "CASE WHEN e.label = qlabel THEN 1 ELSE 0 END AS same " +
        "FROM q JOIN embeddings e ON e.vec_id <> query_id), " +
        "top AS (SELECT query_id, qlabel, same, cos_ppm FROM (SELECT *, " +
        "row_number() OVER (PARTITION BY query_id, same " +
        "ORDER BY cos_ppm DESC, vec_id) AS rk FROM sc) _ WHERE rk = 1), " +
        "pr AS (SELECT p.qlabel, p.cos_ppm - n.cos_ppm AS margin_ppm " +
        "FROM top p JOIN top n ON n.query_id = p.query_id " +
        "AND p.same = 1 AND n.same = 0) " +
        "SELECT CAST(qlabel AS BIGINT) AS label, count(*) AS n_anchors, " +
        "CAST(sum(CASE WHEN margin_ppm > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_wins, " +
        "(CAST(sum(CASE WHEN margin_ppm > 0 THEN 1 ELSE 0 END) AS BIGINT) * 10000) " +
        "// count(*) AS win_bp, " +
        "CAST(sum(margin_ppm) AS BIGINT) // count(*) AS mean_margin_ppm " +
        "FROM pr GROUP BY qlabel ORDER BY label"),
    "ann_sq8_adc" ->
      (s"WITH $sq8DuckCtes, " +
        "adc AS (SELECT query_id, vec_id, CAST(sum(term_e8) AS BIGINT) AS adc_e8 " +
        "FROM codes JOIN qtab USING (i, code) WHERE query_id <> vec_id " +
        "GROUP BY query_id, vec_id), " +
        "ranked AS (SELECT query_id, vec_id, adc_e8, row_number() OVER " +
        "(PARTITION BY query_id ORDER BY adc_e8, vec_id) AS rank FROM adc) " +
        "SELECT query_id, rank, vec_id AS neighbor_id, adc_e8 " +
        "FROM ranked WHERE rank <= 10 ORDER BY query_id, rank")
  )

  /** DuckDB twins of the SQ8 per-dim relation, per-dim stats, code
    * relation, and ADC lookup table — textually the same pinned
    * arithmetic as sq8CodeSpark/sq8TermSpark. */
  private lazy val sq8DuckCtes: String = {
    val deq = "(s.mn + (((CAST(c.code AS DOUBLE) + CAST(0.5 AS DOUBLE)) * (s.mx - s.mn)) / CAST(255 AS DOUBLE)))"
    s"dims AS (SELECT vec_id, r.i AS i, list_extract(embedding, r.i)::DOUBLE AS x " +
      s"FROM embeddings CROSS JOIN range(1, ${Dim + 1}) r(i)), " +
      "stats AS (SELECT i, min(x) AS mn, max(x) AS mx FROM dims GROUP BY i), " +
      "codes AS (SELECT d.vec_id, d.i, " +
      "CASE WHEN s.mx = s.mn THEN CAST(0 AS BIGINT) ELSE " +
      "least(CAST(255 AS BIGINT), greatest(CAST(0 AS BIGINT), " +
      "CAST(floor(((d.x - s.mn) * CAST(255 AS DOUBLE)) / (s.mx - s.mn)) AS BIGINT))) END AS code " +
      "FROM dims d JOIN stats s ON s.i = d.i), " +
      "q AS (SELECT vec_id AS query_id, i, x AS qx FROM dims WHERE vec_id < 5), " +
      "qtab AS (SELECT q.query_id, q.i, c.code, " +
      s"CAST(floor(((q.qx - $deq) * (q.qx - $deq)) * CAST(100000000 AS DOUBLE)) AS BIGINT) AS term_e8 " +
      "FROM q JOIN stats s ON s.i = q.i CROSS JOIN range(0, 256) c(code))"
  }
}
