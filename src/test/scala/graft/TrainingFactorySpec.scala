package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic pins for `training_data_factory` — the one-pass curation
  * funnel. The oracle gate proves cross-engine agreement; this spec pins
  * the properties that make the numbers a funnel at all. */
class TrainingFactorySpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  private lazy val rows = {
    val spark = SparkTestSession.spark
    val out = SparkEntry.queries("training_data_factory")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    graft.operators.CacheScope.releaseAll()
    out
  }

  test("six stages in order, named") {
    assert(rows.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L, 4L, 5L))
    assert(rows.map(_._2).toSeq ==
      Seq("all", "quality", "exact_dedup", "near_dedup", "decontaminated", "sampled"))
  }

  test("stage 0 counts the whole corpus") {
    val spark = SparkTestSession.spark
    val n = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.head._3 == n)
  }

  test("docs and tokens are monotone non-increasing down the funnel") {
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 <= a._3, s"docs grew ${a._1}->${b._1}")
      assert(b._4 <= a._4, s"tokens grew ${a._1}->${b._1}")
    }
  }

  test("every surviving stage keeps at least one doc and sampling keeps some") {
    assert(rows.last._3 > 0, "sampled stage emptied the corpus at sf0.001")
    // the 80% hash-coin must actually drop something vs the decontaminated stage
    assert(rows.last._3 < rows(4)._3 || rows(4)._3 == 0)
  }
}
