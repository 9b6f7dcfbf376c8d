package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{CacheScope, Dedup}

/** Pins the connected-components kernel behind dedup_clusters on graph
  * shapes the LSH pair graph doesn't naturally produce: long chains (many
  * propagation rounds — exercises pointer jumping), multiple components,
  * reversed edge orientation, and a singleton-free contract (vertices only
  * enter via edges). The sf-data path is hash-checked against the DuckDB
  * recursive-CTE oracle by the driver gate; this spec is the adversarial
  * complement. */
class DedupClustersSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def components(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val df = pairs.toDF("doc_a", "doc_b")
    val out = Dedup.connectedComponents(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    CacheScope.releaseAll()
    out
  }

  /** Reference union-find, the in-test oracle. */
  private def ufComponents(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(v => v -> find(v)).toMap
  }

  test("a 50-vertex chain collapses to one component labeled by its min") {
    // worst case for plain propagation (diameter 49); pointer jumping must
    // converge it in far fewer than the 64-round cap
    val chain = (1L until 50L).map(i => (i, i + 1))
    val got = components(chain)
    assert(got.size == 50 && got.values.toSet == Set(1L))
  }

  test("multiple components get independent min labels") {
    val pairs = Seq((10L, 11L), (11L, 12L), (20L, 21L), (30L, 31L), (31L, 32L), (32L, 30L))
    val got = components(pairs)
    assert(got == ufComponents(pairs))
    assert(got(12L) == 10L && got(21L) == 20L && got(32L) == 30L)
  }

  test("edge orientation is irrelevant (higher id first)") {
    val pairs = Seq((5L, 1L), (3L, 5L), (2L, 9L))
    val got = components(pairs)
    assert(got == ufComponents(pairs))
    assert(got(5L) == 1L && got(3L) == 1L && got(9L) == 2L)
  }

  test("random graphs match union-find") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 3) {
      val pairs = Seq.fill(60)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      assert(components(pairs) == ufComponents(pairs))
    }
  }
}
