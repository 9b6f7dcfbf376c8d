package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The round-9 verdict's one scale flag: embedding near-dup candidates
  * must NOT come from a fixed-cardinality block key (label blocks grow
  * linearly with the corpus → quadratic pair stream). This spec pins the
  * replacement's two obligations at sf0.1:
  *
  *  - recall: learned-IVF-cell blocking (2-nearest multi-assignment)
  *    must recover ≥ 90% of the EXACT all-pairs cosine ≥ 0.4 truth set;
  *  - precision: every emitted pair is exact-cosine verified, so the
  *    blocked result must be a strict subset of the truth set.
  */
class EmbeddingBlockingRecallSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.1"

  test("cell-blocked near-dup pairs: exact precision, >=90% recall of all-pairs truth") {
    val s = SparkTestSession.spark
    graft.functions.VectorFunctions.register(s)
    val e = s.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "embedding AS v", "vec_norm2(embedding) AS n2")
    // ground truth: unblocked all-pairs with the same pinned kernels +
    // threshold (2k vectors at sf0.1 → 2M pairs; fine in-test, quadratic
    // at scale — which is exactly why production blocks by learned cell)
    val truth = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .selectExpr("a.vec_id AS va", "b.vec_id AS vb",
        """CAST(floor(vec_dot(a.v, b.v)
            / (sqrt(a.n2) * sqrt(b.n2)) * 1000000) AS BIGINT) AS cos_ppm""")
      .filter(col("cos_ppm") >= 400000)
      .select("va", "vb").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = graft.operators.Dedup.queries("dedup_embedding_cosine")(s, sf)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked.subsetOf(truth),
      s"blocking emitted non-near-dup pairs: ${blocked.diff(truth).take(5)}")
    assert(truth.nonEmpty, "degenerate corpus: no near-dup pairs at sf0.1")
    val recall = blocked.size.toDouble / truth.size
    assert(recall >= 0.9,
      s"cell blocking recall $recall (${blocked.size}/${truth.size}) below 0.9")
    graft.operators.CacheScope.releaseAll()
  }
}
