package graft

import org.scalatest.funsuite.AnyFunSuite

/** The sampled-truth gates at sf0.1, inside the suite — the same code the
  * standalone SampledTruthProbe runs at the 100× replica, so the gate
  * logic itself is continuously exercised (a probe that only runs by hand
  * rots). See SampledTruthProbe for the discipline. */
class SampledTruthSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.1"

  test("pair-heavy families clear their sampled-truth gates at sf0.1: " +
      "minhash/embedding precision+recall, ANN brute==exact, IVF floors") {
    val spark = SparkTestSession.spark
    val mg = SampledTruthProbe.minhashGate(spark, sf, 1000L)
    info(mg.render)
    val eg = SampledTruthProbe.embeddingGate(spark, sf, 1000L)
    info(eg.render)
    val ag = SampledTruthProbe.annGate(spark, sf)
    info(ag.render)
    graft.operators.CacheScope.releaseAll()
    val errs = SampledTruthProbe.assertGates(mg, eg, ag)
    assert(errs.isEmpty, errs.mkString("; "))
  }
}
