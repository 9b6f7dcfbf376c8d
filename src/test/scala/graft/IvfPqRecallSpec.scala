package graft

import org.scalatest.funsuite.AnyFunSuite

/** Recall guardrail for the compressed-domain ANN tiers at sf0.1,
  * decomposing the loss against METRIC-CONSISTENT ground truth: the ADC
  * operators rank by L2, so they are measured against exact L2 top-10
  * (measuring them against the cosine bruteforce conflates metric
  * disagreement with quantization error — measured, that mixture reads
  * 0.04 and says nothing about the codes). ann_pq_adc then differs from
  * exact L2 only by PQ quantization; ann_ivf_pq adds 2-of-10-cell probing
  * on top. A codebook/probing parameter change shows up here as a
  * measured recall delta (same contract as LshRecallSpec). Numbers are
  * recorded in PLANS.md §recall. */
class IvfPqRecallSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.1"
  private lazy val spark = {
    val s = SparkTestSession.spark
    graft.functions.VectorFunctions.register(s)
    s
  }

  private def topSet(name: String): Map[Long, Set[Long]] =
    SparkEntry.queries(name)(spark, sf)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rows) =>
        q -> rows.map(_.getLong(1)).toSet
      }

  test("ann_pq_adc / ann_ivf_pq: top-10 recall vs exact-L2 ground truth") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "embedding AS v", "vec_norm2(embedding) AS n2")
    val q = e.filter(col("vec_id") < 5)
      .selectExpr("vec_id AS query_id", "v AS qv", "n2 AS qn2")
    val truth = q.join(e, col("query_id") =!= col("vec_id"))
      .selectExpr("query_id", "vec_id",
        "qn2 - 2 * vec_dot(qv, v) + n2 AS l2")
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(asc("l2"), asc("vec_id"))))
      .filter(col("rank") <= 10)
      .select("query_id", "vec_id").collect()
      .groupBy(_.getLong(0)).map { case (qid, rows) =>
        qid -> rows.map(_.getLong(1)).toSet
      }
    val pq = topSet("ann_pq_adc")
    val ivfpq = topSet("ann_ivf_pq")
    graft.operators.CacheScope.releaseAll()

    def recall(approx: Map[Long, Set[Long]]): Double = {
      val hits = truth.map { case (k, t) => (approx.getOrElse(k, Set.empty) & t).size }.sum
      hits.toDouble / truth.values.map(_.size).sum
    }
    val rPq = recall(pq)
    val rIvfPq = recall(ivfpq)
    info(f"recall@10 vs exact L2: pq_adc=$rPq%.3f ivf_pq=$rIvfPq%.3f")

    assert(truth.size == 5 && truth.values.forall(_.size == 10),
      "exact-L2 ground truth incomplete — spec is vacuous")
    // round-7 learned quantizers (hash-seeded Lloyd codebooks, learned
    // coarse cells + 2-cell multi-assignment): measured 0.64 / 0.62 —
    // floors pinned at 0.5 (deterministic pipeline, so these are stable,
    // not flaky; a parameter or kernel regression trips them)
    assert(rPq >= 0.5, f"PQ quantization recall collapsed: $rPq%.3f")
    assert(rIvfPq >= 0.5, f"IVF+PQ probed recall collapsed: $rIvfPq%.3f")
    // NOTE: no rIvfPq <= rPq assertion — probing restricts the CANDIDATE
    // set, but top-10-of-a-subset is not a subset of top-10-of-the-
    // superset (excluding unprobed-cell false positives can let a true
    // neighbor into the probed top-10), so recall@k monotonicity is not a
    // theorem. Only floors are pinned; the relation is recorded above.
    assert(rIvfPq > 0.0, "probed-cell ADC finds no true neighbors at all")
  }

  test("ann_ivf_pq_refined: exact rerank recovers most of the quantization loss") {
    // the refined tier ranks by COSINE, so its ground truth is the exact
    // cosine top-10 — which is exactly ann_bruteforce_topk's output
    val truth = topSet("ann_bruteforce_topk")
    val refined = topSet("ann_ivf_pq_refined")
    graft.operators.CacheScope.releaseAll()
    val hits = truth.map { case (k, t) => (refined.getOrElse(k, Set.empty) & t).size }.sum
    val r = hits.toDouble / truth.values.map(_.size).sum
    info(f"recall@10 vs exact cosine: ivf_pq_refined=$r%.3f")
    // measured 0.70: the binding loss is the 2-of-10-cell PROBE (a true
    // cosine neighbor in an unprobed cell is unrecoverable by any rerank),
    // plus L2-vs-cosine disagreement in the ADC shortlist for unnormalized
    // vectors. The rerank itself is exact — raising recall means probing
    // more cells (the documented knob), not a bigger shortlist. Floor
    // pinned above the compressed tiers' 0.62-0.64.
    assert(r >= 0.65, f"refined recall lost the rerank benefit: $r%.3f")
  }

  test("ann_recall_eval matches set-arithmetic recomputation of tier-vs-truth overlap") {
    val truth = topSet("ann_bruteforce_topk")
    val methods = Seq("ivf_probe" -> "ann_ivf_probe", "ivf_pq" -> "ann_ivf_pq",
      "ivf_pq_refined" -> "ann_ivf_pq_refined")
    val expected = methods.flatMap { case (label, name) =>
      val res = topSet(name)
      res.toSeq.sortBy(_._1).map { case (q, set) =>
        val hits = (set & truth(q)).size.toLong
        (label, q, set.size.toLong, hits, hits * 10000 / set.size)
      }
    }.sortBy(r => (r._1, r._2))
    val got = SparkEntry.queries("ann_recall_eval")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    graft.operators.CacheScope.releaseAll()
    assert(got == expected, s"eval drifted from set arithmetic:\n got=$got\n exp=$expected")
    // the declared dashboard must agree with the recall floors pinned above
    val refined = got.filter(_._1 == "ivf_pq_refined")
    val overall = refined.map(_._4).sum * 10000 / refined.map(_._3).sum
    assert(overall >= 6000, s"refined overall hit_bp $overall below floor")
  }
}
