package graft.operators

import java.nio.file.Files

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** Value-level oracle for the constraint-audit operators on hand-built
  * fixtures whose violations are known by construction: duplicate keys,
  * orphaned foreign keys, out-of-range values, and ship-before-order rows.
  */
class DataQualitySpec extends AnyFunSpec with Matchers {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def dirWith(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = Files.createTempDirectory("dq-fixture").toFile
    dir.deleteOnExit()
    tables.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(new java.io.File(dir, s"$name.parquet").toString)
    }
    dir.toString
  }

  describe("uniq (key-multiplicity rollup)") {
    it("counts duplicate keys, excess rows and max multiplicity") {
      // keys: 1 (x3), 2 (x1), 3 (x2) -> 6 rows, 3 keys, 2 dup keys,
      // 3 excess rows, max multiplicity 3
      val df = Seq(1L, 1L, 1L, 2L, 3L, 3L).toDF("k")
      val got = DataQuality.uniq(df, "t", Seq("k"))
        .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
      got shouldBe Seq(("t", 6L, 3L, 2L, 3L, 3L))
    }

    it("treats a composite key as one key") {
      // (1, 1) x2 is the only duplicate; (1, 2) is a distinct key
      val df = Seq((1L, 1L), (1L, 1L), (1L, 2L)).toDF("a", "b")
      val got = DataQuality.uniq(df, "t", Seq("a", "b"))
        .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
      got shouldBe Seq(("t", 3L, 2L, 1L, 1L, 2L))
    }
  }

  describe("fkEdge (referential-integrity rollup)") {
    it("counts orphan rows and orphan keys against the dim key set") {
      // fact keys: 1 (x2, matched), 2 (x1, matched), 9 (x3, orphan),
      // 8 (x1, orphan) -> 7 rows, 4 orphan rows, 2 orphan keys
      val fact = Seq(1L, 1L, 2L, 9L, 9L, 9L, 8L).toDF("fk")
      val dim = Seq(1L, 2L, 3L).toDF("pk")
      val got = DataQuality.fkEdge(fact, "fk", dim, "pk", "f->d")
        .as[(String, Long, Long, Long, Long)].collect().toSeq
      // orphan_bp = 4*10000 div 7 = 5714
      got shouldBe Seq(("f->d", 7L, 4L, 2L, 5714L))
    }
  }

  describe("dq_value_rules") {
    it("flags exactly the constructed out-of-range rows") {
      val li = Seq(
        // clean row
        (1L, 1, 10.0, 100.0, 0.05, 0.04, "N", "O"),
        // qty out of range (also > 45 tail)
        (1L, 2, 55.0, 100.0, 0.05, 0.04, "N", "O"),
        // discount out of range (also > 8% tail)
        (2L, 1, 10.0, 100.0, 0.20, 0.04, "A", "F"),
        // bad domain values + non-positive price
        (2L, 2, 10.0, 0.0, 0.05, 0.04, "X", "Z")
      ).toDF("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax", "l_returnflag", "l_linestatus")
      val d = dirWith("lineitem" -> li)
      val got = DataQuality.queries("dq_value_rules")(spark, d)
        .as[(String, Long, Long, Long)].collect().toMap2
      got("qty_range") shouldBe (4L, 1L, 2500L)
      got("discount_range") shouldBe (4L, 1L, 2500L)
      got("tax_range") shouldBe (4L, 0L, 0L)
      got("price_positive") shouldBe (4L, 1L, 2500L)
      got("returnflag_domain") shouldBe (4L, 1L, 2500L)
      got("linestatus_domain") shouldBe (4L, 1L, 2500L)
      got("qty_tail_gt45") shouldBe (4L, 1L, 2500L)
      got("discount_tail_gt8pct") shouldBe (4L, 1L, 2500L)
    }
  }

  describe("dq_temporal_consistency") {
    it("counts lineitems shipped before their order date with exact day lags") {
      val dayUs = 86400L * 1000000
      def ts(day: Long) = java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(day * 86400))
      val orders = Seq((1L, ts(100L)), (2L, ts(200L)))
        .toDF("o_orderkey", "o_orderdate")
      val li = Seq(
        (1L, ts(105L)), // +5 ok
        (1L, ts(95L)),  // -5 violation
        (2L, ts(200L)), // 0 ok (same day)
        (2L, ts(230L))  // +30 ok
      ).toDF("l_orderkey", "l_shipdate")
      val d = dirWith("orders" -> orders, "lineitem" -> li)
      val got = DataQuality.queries("dq_temporal_consistency")(spark, d)
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
      got shouldBe Seq((4L, 1L, 2500L, -5L, 30L))
    }
  }

  describe("dq_distribution_drift") {
    it("computes exact ppm proportions and quadratic drift per bin on a constructed shift") {
      def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
      // era A (<1998): URGENT x3 / LOW x1; price digits 3 x2, 4 x2
      // era B (>=1998): URGENT x1 / LOW x3; price digits 3 x3, 4 x1
      val a = ts("1997-06-01T00:00:00Z"); val b = ts("1999-06-01T00:00:00Z")
      val orders = Seq(
        (1L, a, "1-URGENT", 999.9), (2L, a, "1-URGENT", 999.9),
        (3L, a, "1-URGENT", 1000.0), (4L, a, "5-LOW", 1000.0),
        (5L, b, "1-URGENT", 999.9), (6L, b, "5-LOW", 999.9),
        (7L, b, "5-LOW", 999.9), (8L, b, "5-LOW", 1000.0)
      ).toDF("o_orderkey", "o_orderdate", "o_orderpriority", "o_totalprice")
      val got = DataQuality.queries("dq_distribution_drift")(spark, dirWith("orders" -> orders))
        .as[(String, String, Long, Long, Long, Long, Long, Long)].collect().toSeq
      got shouldBe Seq(
        ("price_digits", "digits_3", 2L, 3L, 500000L, 750000L, -250000L, 62500000000L),
        ("price_digits", "digits_4", 2L, 1L, 500000L, 250000L, 250000L, 62500000000L),
        ("priority", "1-URGENT", 3L, 1L, 750000L, 250000L, 500000L, 250000000000L),
        ("priority", "5-LOW", 1L, 3L, 250000L, 750000L, -500000L, 250000000000L))
    }
  }

  private implicit class RuleRows(rows: Array[(String, Long, Long, Long)]) {
    def toMap2: Map[String, (Long, Long, Long)] =
      rows.map { case (r, a, b, c) => r -> (a, b, c) }.toMap
  }
}
