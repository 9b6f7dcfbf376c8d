package graft.operators

import java.nio.file.Files

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** Value-level oracle for the graph operators on a hand-built co-purchase
  * fixture whose structure is known by construction: a triangle {1,2,3}
  * with a pendant node 4, every edge supported by exactly two orders. Also
  * recomputes the 5-iteration integer PageRank independently in-test (a
  * driver-side reference loop) and asserts exact rank equality.
  */
class GraphSpec extends AnyFunSpec with Matchers {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  /** Each pair listed twice (support 2): triangle 1-2, 2-3, 1-3 plus
    * pendant edge 1-4; plus one singleton order and one unsupported pair
    * (5,6) that must NOT become an edge. */
  private lazy val fixtureDir: String = {
    val pairs = Seq((1L, 2L), (1L, 2L), (2L, 3L), (2L, 3L),
      (1L, 3L), (1L, 3L), (1L, 4L), (1L, 4L), (5L, 6L))
    val rows = pairs.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq((i.toLong + 1, a), (i.toLong + 1, b))
    } ++ Seq((100L, 7L)) // singleton order
    val dir = Files.createTempDirectory("graph-fixture").toFile
    dir.deleteOnExit()
    rows.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite")
      .parquet(new java.io.File(dir, "lineitem.parquet").toString)
    dir.toString
  }

  /** The expected edge set (u < v). */
  private val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L))

  describe("graph_degree_stats") {
    it("builds the support-2 graph and histograms degrees with exact shares") {
      val got = Graph.queries("graph_degree_stats")(spark, fixtureDir)
        .as[(Long, Long, Long)].collect().toSeq
      // degrees: node1=3, node2=2, node3=2, node4=1 -> hist 1:1, 2:2, 3:1
      got shouldBe Seq((1L, 1L, 2500L), (2L, 2L, 5000L), (3L, 1L, 2500L))
    }
  }

  describe("graph_triangles") {
    it("counts the single triangle once via the degree orientation") {
      val got = Graph.queries("graph_triangles")(spark, fixtureDir)
        .as[(Long, Long, Long, Long, Option[Long])].collect().toSeq
      // wedges = sum d(d-1)/2 = 3 + 1 + 1 + 0 = 5; clustering = 3*1*1e4/5
      got shouldBe Seq((4L, 4L, 5L, 1L, Some(6000L)))
    }
  }

  describe("graph_components") {
    it("rolls the single 4-node component into the size histogram") {
      val got = Graph.queries("graph_components")(spark, fixtureDir)
        .as[(Long, Long, Long)].collect().toSeq
      got shouldBe Seq((4L, 1L, 10000L))
    }
  }

  describe("graph_pagerank") {
    it("matches an independent integer PageRank recomputation exactly") {
      val got = Graph.queries("graph_pagerank")(spark, fixtureDir)
        .as[(Long, Long, Long)].collect().toSeq

      // independent reference loop: same integer arithmetic, plain Scala
      val adj = edges.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      val deg = adj.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
      val n = deg.size.toLong
      val scale = 1000000000000L
      val base = (15L * (scale / n)) / 100L
      var rank = deg.keys.map(_ -> scale / n).toMap
      for (_ <- 1 to 5) {
        val contrib = adj.groupBy(_._2).map { case (dst, es) =>
          dst -> es.map { case (src, _) => rank(src) / deg(src) }.sum
        }
        rank = contrib.map { case (node, s) => node -> (base + (85L * s) / 100L) }
      }
      val expected = rank.toSeq
        .map { case (node, r) => (node, deg(node), r) }
        .sortBy { case (node, _, r) => (-r, node) }
      got shouldBe expected

      // structural sanity: hub outranks the pendant, ranks sum ≈ scale
      val byNode = got.map { case (node, _, r) => node -> r }.toMap
      byNode(1L) should be > byNode(4L)
      val total = byNode.values.sum
      total should be <= scale
      total should be > (scale * 95) / 100
    }
  }

  describe("graph_kcore") {
    it("peels the pendant-plus-triangle fixture to nothing under k=3") {
      // degrees 1:3, 2:2, 3:2, 4:1 — only node 1 survives round 1's
      // degree test, no induced edges remain, round 2 empties the core
      val got = Graph.queries("graph_kcore")(spark, fixtureDir)
        .as[(Long, Long, Long)].collect().toSeq
      got shouldBe Seq((1L, 1L, 0L), (2L, 0L, 0L), (3L, 0L, 0L),
        (4L, 0L, 0L), (5L, 0L, 0L), (6L, 0L, 0L))
    }

    it("keeps a K4 core stable after shedding its pendant") {
      // complete graph on {1,2,3,4} (every pair in two orders) plus a
      // support-2 pendant edge 1-5: round 1 drops node 5 (degree 1) and
      // keeps all of K4 (degrees ≥ 3); from round 2 the trajectory is the
      // fixpoint (4 nodes, 6 edges) — the 3-core
      val pairs = (for {
        a <- 1L to 4L; b <- (a + 1) to 4L
      } yield (a, b)) ++ Seq((1L, 5L))
      val rows = pairs.zipWithIndex.flatMap { case ((a, b), i) =>
        Seq((2 * i.toLong + 1, a), (2 * i.toLong + 1, b),
          (2 * i.toLong + 2, a), (2 * i.toLong + 2, b))
      }
      val dir = Files.createTempDirectory("kcore-fixture").toFile
      dir.deleteOnExit()
      rows.toDF("l_orderkey", "l_partkey")
        .write.mode("overwrite")
        .parquet(new java.io.File(dir, "lineitem.parquet").toString)
      val got = Graph.queries("graph_kcore")(spark, dir.toString)
        .as[(Long, Long, Long)].collect().toSeq
      got.head shouldBe ((1L, 4L, 6L))
      got.tail shouldBe (2L to 6L).map(r => (r, 4L, 6L))
    }

    it("reaches its fixpoint within the unrolled rounds on testdata") {
      val got = Graph.queries("graph_kcore")(spark, "/root/testdata/sf0.001")
        .as[(Long, Long, Long)].collect().toSeq
      got should have size 6
      // the trajectory the oracle unrolls must have stabilized — PeelRounds
      // is enough for the census-built graph, and the tail IS the 3-core
      got(4)._2 shouldBe got(5)._2
      got(4)._3 shouldBe got(5)._3
    }
  }

  describe("graph_jaccard_links") {
    it("predicts the non-adjacent 2-hop pairs with exact Jaccard") {
      // wedges through node 1 (nbrs 2,3,4): (2,3) is adjacent — excluded;
      // (2,4) and (3,4) share exactly neighbor 1. deg(2)=deg(3)=2,
      // deg(4)=1 → union 2, jaccard 5000 bp for both. No other pair has a
      // common neighbor (centers 2/3 wedge only the adjacent (1,3)/(1,2)).
      val got = Graph.queries("graph_jaccard_links")(spark, fixtureDir)
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
      got shouldBe Seq((2L, 4L, 1L, 2L, 5000L), (3L, 4L, 1L, 2L, 5000L))
    }
  }

  describe("graph_assortativity") {
    it("computes the exact arc-degree Pearson r (hand-checked)") {
      // degrees: 1→3, 2→2, 3→2, 4→1; the 8 directed arcs give
      // n=8, sx=sy=18, sxy=38, sxx=syy=44
      // cov = 8·38 − 18² = −20; var = 8·44 − 18² = 28
      // r = −20/28 → floor(−20·10⁶/28) = −714286 ppm (hub-and-spoke < 0)
      val got = Graph.queries("graph_assortativity")(spark, fixtureDir)
        .as[(Long, Long)].collect().toSeq
      got shouldBe Seq((8L, -714286L))
    }
  }
}
