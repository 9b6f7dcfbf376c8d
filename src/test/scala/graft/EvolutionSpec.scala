package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Evolution

/** Semantic invariants for the dataset-evolution operators, beyond the
  * cross-engine hash gate: the CDC classes partition the key space, the
  * profile agrees with directly-computed per-column stats, and the
  * transition rank is a proper distribution that favors the states the
  * raw edge counts favor. */
class EvolutionSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private def spark = SparkTestSession.spark

  test("snapshot_diff classes partition the newer snapshot's key space") {
    val diff = Evolution.queries("snapshot_diff")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val newKeys = orders
      .filter(col("o_orderdate") < lit(java.sql.Timestamp.valueOf(Evolution.CutNew)))
      .select("o_custkey").distinct().count()
    val oldOrders = orders
      .filter(col("o_orderdate") < lit(java.sql.Timestamp.valueOf(Evolution.CutOld)))
      .count()
    val newOrders = orders
      .filter(col("o_orderdate") < lit(java.sql.Timestamp.valueOf(Evolution.CutNew)))
      .count()
    assert(diff.values.map(_._1).sum == newKeys,
      "n_customers over all classes must equal distinct keys in the newer snapshot")
    assert(diff.values.map(_._2).sum == newOrders - oldOrders,
      "orders_delta over all classes must equal the order-count delta between cuts")
    // unchanged customers contribute zero delta by construction
    diff.get("unchanged").foreach { case (_, od, sd) =>
      assert(od == 0L && sd == 0L)
    }
  }

  test("profile_columns matches directly-computed stats") {
    val prof = Evolution.queries("profile_columns")(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val nRows = li.count()
    assert(prof.size == 9)
    for ((_, r) <- prof) {
      assert(r.getLong(1) == nRows)
      assert(r.getLong(2) == 0L, "synthetic lineitem has no nulls")
    }
    val okDistinct = li.select(countDistinct(col("l_orderkey"))).head().getLong(0)
    assert(prof("l_orderkey").getLong(3) == okDistinct)
    assert(prof("l_returnflag").getLong(3) ==
      li.select(countDistinct(col("l_returnflag"))).head().getLong(0))
    // zero-padded rendering keeps lexicographic == numeric order
    val minKey = li.select(min(col("l_orderkey"))).head().getLong(0)
    assert(prof("l_orderkey").getString(4).toLong == minKey)
  }

  test("embedding_cluster_quality: labels partition the corpus, neighbor is a different label") {
    val q = SparkEntry.queries("embedding_cluster_quality")(spark, sf).collect()
    try {
      val nVectors = spark.read.parquet(s"$sf/embeddings.parquet").count()
      assert(q.map(_.getLong(1)).sum == nVectors, "per-label counts must partition the corpus")
      assert(q.forall(r => r.getInt(0) != r.getInt(3)), "nearest centroid must be another label")
      assert(q.forall(_.getLong(2) > 0L), "cohesion must be positive on a non-degenerate corpus")
      assert(q.forall(_.getLong(4) > 0L), "separation must be positive for distinct centroids")
    } finally graft.operators.CacheScope.releaseAll()
  }

  test("events_transition_rank is a near-unit distribution ranking in-flow") {
    val pr = Evolution.queries("events_transition_rank")(spark, sf).collect()
    assert(pr.length == 5)
    val total = pr.map(_.getLong(1)).sum
    // floor arithmetic only loses mass: total <= SCALE, within 1% of it
    assert(total <= Evolution.RankScale)
    assert(total > Evolution.RankScale * 99L / 100L,
      s"rank mass $total lost more than 1% of scale")
    // ranks are strictly positive and ordered descending in the output
    assert(pr.forall(_.getLong(1) > 0L))
    assert(pr.map(_.getLong(1)).toSeq == pr.map(_.getLong(1)).toSeq.sortBy(-_))
  }
}
