package graft.operators

import java.nio.file.Files

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** Value-level oracle for the Stats operators: the regression moments are
  * recomputed independently in-test with BigInt (exact, no Spark), and the
  * degenerate-group guard (constant x → varn = 0 → NULL slope, not a
  * division error) is pinned on a synthetic fixture.
  */
class StatsSpec extends AnyFunSpec with Matchers {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  describe("stats_qty_price_regression") {
    it("matches an exact BigInt recomputation of the closed-form OLS") {
      // Independent oracle: pull (returnflag, qty, price) once, fold the five
      // moments in BigInt, apply the same sign-guarded integral divisions.
      val raw = spark.read.parquet(s"$sf/lineitem.parquet")
        .selectExpr(
          "l_returnflag",
          "CAST(l_quantity AS BIGINT) AS x",
          "CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(10000 AS DECIMAL(5,0)) AS BIGINT) AS y")
        .as[(String, Long, Long)].collect()

      val expected = raw.groupBy(_._1).map { case (flag, rows) =>
        val n = BigInt(rows.length)
        val sx = rows.map(r => BigInt(r._2)).sum
        val sy = rows.map(r => BigInt(r._3)).sum
        val sxx = rows.map(r => BigInt(r._2) * r._2).sum
        val sxy = rows.map(r => BigInt(r._2) * r._3).sum
        val covn = n * sxy - sx * sy
        val varn = n * sxx - sx * sx
        def idiv(a: BigInt, b: BigInt): Long =
          (if (a.sign < 0) -(a.abs / b) else a.abs / b).toLong
        val cov = idiv(covn, n * n)
        val slope = if (varn == 0) None else Some(idiv(covn * 1000000, varn))
        flag -> ((n.toLong, sx.toLong, sy.toLong, cov, slope))
      }

      val got = Stats.queries("stats_qty_price_regression")(spark, sf)
        .collect().map { r =>
          r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
            if (r.isNullAt(5)) None else Some(r.getLong(5))))
        }.toMap

      got.keySet shouldBe expected.keySet
      got.keySet shouldBe Set("A", "N", "R")
      for ((flag, exp) <- expected) got(flag) shouldBe exp
    }

    it("yields NULL slope (no division error) for a constant-x group") {
      val dir = Files.createTempDirectory("stats-degenerate").toFile
      dir.deleteOnExit()
      // one group all-constant quantity (varn = 0), one regular group
      Seq(
        ("A", 5.0, 100.0), ("A", 5.0, 200.0), ("A", 5.0, 300.0),
        ("B", 1.0, 10.0), ("B", 2.0, 20.0), ("B", 3.0, 30.0))
        .toDF("l_returnflag", "l_quantity", "l_extendedprice")
        .write.mode("overwrite").parquet(new java.io.File(dir, "lineitem.parquet").toString)

      val rows = Stats.queries("stats_qty_price_regression")(spark, dir.toString)
        .collect().map(r => r.getString(0) -> r).toMap
      rows("A").isNullAt(5) shouldBe true   // degenerate: slope NULL
      rows("B").isNullAt(5) shouldBe false
      // B is exactly y = 10x (in e4 money): slope_e10 = 10 * 1e4 * 1e6
      rows("B").getLong(5) shouldBe 10L * 10000L * 1000000L
      // covariance of A is 0 by constant x
      rows("A").getLong(4) shouldBe 0L
    }
  }

  describe("stats_priority_mode") {
    it("picks the true per-period modal priority with exact share") {
      val got = Stats.queries("stats_priority_mode")(spark, sf).collect()
      got should not be empty
      // independent recomputation of the (period, priority) grid
      val grid = spark.read.parquet(s"$sf/orders.parquet")
        .selectExpr(
          "unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000L div 30 AS period",
          "o_orderpriority")
        .as[(Long, String)].collect()
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
      val byPeriod = grid.groupBy(_._1._1)
      for (r <- got) {
        val period = r.getLong(0); val mode = r.getString(1)
        val n = r.getLong(2); val shareBp = r.getLong(3)
        val counts = byPeriod(period).map { case ((_, p), c) => p -> c }
        val best = counts.toSeq.sortBy { case (p, c) => (-c, p) }.head
        (mode, n) shouldBe best
        val total = counts.values.sum
        shareBp shouldBe (n * 10000L) / total
        shareBp should be <= 10000L
      }
    }
  }
}
