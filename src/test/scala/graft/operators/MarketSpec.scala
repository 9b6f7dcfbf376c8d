package graft.operators

import java.nio.file.Files

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** Value-level oracle for the market analytics on hand-built fixtures whose
  * pair/bucket/cohort structure is known by construction: within-order
  * duplicate items count once, RFM buckets land on their documented
  * boundaries, and LTV cumulative curves add up per cohort.
  */
class MarketSpec extends AnyFunSpec with Matchers {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val DayUs = 86400L * 1000000

  private def dirWith(table: String, df: org.apache.spark.sql.DataFrame): String = {
    val dir = Files.createTempDirectory("market-fixture").toFile
    dir.deleteOnExit()
    df.write.mode("overwrite").parquet(new java.io.File(dir, s"$table.parquet").toString)
    dir.toString
  }

  describe("basket_pairs") {
    it("counts a pair once per order, ignoring duplicate lines and singletons") {
      val d = dirWith("lineitem", Seq(
        // order 1: parts 10, 20, 20 (dup line), 30 -> pairs (10,20),(10,30),(20,30)
        (1L, 10L), (1L, 20L), (1L, 20L), (1L, 30L),
        // order 2: parts 10, 20 -> pair (10,20) again
        (2L, 10L), (2L, 20L),
        // order 3: single part -> no pairs
        (3L, 10L),
        // order 4: parts 10, 30 -> (10,30) again
        (4L, 10L), (4L, 30L)
      ).toDF("l_orderkey", "l_partkey"))
      val got = Market.queries("basket_pairs")(spark, d)
        .as[(Long, Long, Long)].collect().toSeq
      // support >= 2 only: (10,20) x2, (10,30) x2; (20,30) x1 filtered out
      got shouldBe Seq((10L, 20L, 2L), (10L, 30L, 2L))
    }
  }

  describe("rfm_segments") {
    it("buckets recency in 30-day steps, caps frequency at 5, sizes money by digits") {
      val maxDay = 20000L
      def order(cust: Long, day: Long, price: Double) = (cust, day * DayUs, price)
      val rows =
        // cust 1: one order ON the max day, price 50 -> r=0, f=1, m_digits=2
        Seq(order(1L, maxDay, 50.0)) ++
        // cust 2: six orders (f capped to 5), last 31 days back -> r_bucket=1,
        // total 6000 -> 4 digits
        (0 until 6).map(i => order(2L, maxDay - 31 - i, 1000.0)) ++
        // cust 3: last order 30 days back exactly -> r_bucket = 1 (30 div 30)
        Seq(order(3L, maxDay - 30, 9.0)) // m = 9 -> 1 digit
      val d = dirWith("orders", rows.toDF("o_custkey", "ts_us", "o_totalprice")
        .selectExpr("o_custkey", "CAST(timestamp_micros(ts_us) AS TIMESTAMP_NTZ) AS o_orderdate",
          "o_totalprice"))
      val got = Market.queries("rfm_segments")(spark, d)
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
      got shouldBe Seq(
        (0L, 1L, 2L, 1L, 500000L, 1L),    // cust 1
        (1L, 1L, 1L, 1L, 90000L, 1L),     // cust 3
        (1L, 5L, 4L, 1L, 60000000L, 6L))  // cust 2: f capped at 5, 6 orders kept in seg_orders
    }
  }

  describe("ltv_cohort") {
    it("accumulates each cohort's revenue curve over month offsets") {
      def order(cust: Long, month: Long, price: Double) =
        (cust, month * 30 * DayUs + DayUs, price) // +1 day: safely inside the period
      val rows = Seq(
        // cohort month 100: cust 1 active months 100, 101; cust 2 month 100 only
        order(1L, 100L, 10.0), order(1L, 100L, 5.0), order(1L, 101L, 20.0),
        order(2L, 100L, 7.0),
        // cohort month 101: cust 3
        order(3L, 101L, 1.0))
      val d = dirWith("orders", rows.toDF("o_custkey", "ts_us", "o_totalprice")
        .selectExpr("o_custkey", "CAST(timestamp_micros(ts_us) AS TIMESTAMP_NTZ) AS o_orderdate",
          "o_totalprice"))
      val got = Market.queries("ltv_cohort")(spark, d)
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
      got shouldBe Seq(
        (100L, 0L, 2L, 220000L, 220000L), // 10+5+7 at offset 0
        (100L, 1L, 1L, 200000L, 420000L), // cust 1's month-101 spend, cumulative
        (101L, 0L, 1L, 10000L, 10000L))
    }
  }
}
