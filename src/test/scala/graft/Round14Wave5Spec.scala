package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-14 wave 5: the KS and Gini census operators recomputed with
  * plain-Scala BigInt arithmetic straight off the parquet — bucketing,
  * CDF gaps, argmax tie-break, and the Gini census identity re-derived
  * independently of the Spark plan. */
class Round14Wave5Spec extends AnyFunSuite {

  private def spark = SparkTestSession.spark

  private def buckets(sf: String): Seq[(String, Long)] =
    spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_orderpriority",
        "CAST(CAST(o_totalprice AS DECIMAL(18,4)) * CAST(10000 AS DECIMAL(5,0)) AS BIGINT) div 10000000 AS b")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"stats_ks_test at $sf: max CDF gap, scaling, and argmax match a " +
        "BigInt recomputation") {
      val rows = buckets(sf)
      val nAll = rows.size.toLong
      val grid = rows.map(_._2).distinct.sorted
      val byP = rows.groupBy(_._1)
      val got = graft.operators.Stats.queries("stats_ks_test")(spark, sf)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          BigInt(r.getString(3)), r.getLong(4), r.getLong(5))).toSeq
      assert(got.map(_._1) == byP.keys.toSeq.sorted)
      got.foreach { case (p, nG, nRest, dNum, dE6, ksB) =>
        val mine = byP(p).map(_._2)
        assert(nG == mine.size.toLong && nRest == nAll - nG)
        val gaps = grid.map { b =>
          val cg = BigInt(mine.count(_ <= b))
          val ca = BigInt(rows.count(_._2 <= b))
          (b, ((cg * nRest) - (ca - cg) * nG).abs)
        }
        val dMax = gaps.map(_._2).max
        assert(dNum == dMax, s"$p d_num")
        assert(dE6 == dMax * 1000000 / (BigInt(nG) * nRest), s"$p d_e6")
        assert(ksB == gaps.filter(_._2 == dMax).map(_._1).min, s"$p ks_bucket")
      }
    }

    test(s"stats_gini_concentration at $sf: census-identity numerator " +
        "equals the definitional sorted-rank sum (BigInt)") {
      val rows = buckets(sf)
      val got = graft.operators.Stats.queries("stats_gini_concentration")(spark, sf)
        .collect().map(r => (r.getString(0), r.getLong(1),
          BigInt(r.getString(2)), if (r.isNullAt(3)) null else r.getLong(3).asInstanceOf[AnyRef]))
      got.foreach { case (p, n, sumB, giniE6) =>
        val xs = rows.filter(_._1 == p).map(_._2).sorted
        assert(n == xs.size.toLong)
        assert(sumB == xs.map(BigInt(_)).sum)
        // definitional: G·n·Σx = Σ (2i − n − 1)·x_(i), 1-based i
        val num = xs.zipWithIndex.map { case (x, i0) =>
          BigInt(2 * (i0 + 1) - n - 1) * x }.sum
        if (sumB == 0) assert(giniE6 == null)
        else assert(BigInt(giniE6.asInstanceOf[Long]) ==
          num * 1000000 / (BigInt(n) * sumB), s"$p gini")
      }
    }
  }
}
