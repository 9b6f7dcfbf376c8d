package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query must at least plan, execute, and produce a stable
  * schema at sf0.001 — the in-build smoke twin of the driver's DuckDB gate
  * (which checks values at sf0.01). Also pins the contract that every
  * query has an oracle unless explicitly exempted. */
class QueryInventorySpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  // Round 7 closed the last exemption (media_decode_stub's stub decode is
  // deterministic integer math DuckDB replays) — EVERY query now carries
  // an oracle, and this test keeps it that way.
  test("no query name is declared by two modules (Map-merge would silently drop one)") {
    assert(SparkEntry.duplicateQueryNames.isEmpty,
      s"cross-module name collisions: ${SparkEntry.duplicateQueryNames.mkString(", ")}")
  }

  test("every query has an oracle") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
    val orphaned = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphaned.isEmpty, s"oracles without query: $orphaned")
  }

  test("flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(SparkTestSession.spark).count() > 0)
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"query executes at sf0.001: $name") {
      val df = fn(SparkTestSession.spark, sf)
      val n = df.count()
      assert(n >= 0)
      assert(df.schema.fieldNames.nonEmpty)
      graft.operators.CacheScope.releaseAll()
    }
  }

  test("operator caches are released: cache manager empty after a full sweep") {
    val spark = SparkTestSession.spark
    // run the heaviest persisting queries, release after each (the Bench /
    // Verify protocol), then assert nothing is left cached in the session
    for (name <- Seq("dedup_minhash_lsh", "dedup_simhash", "dedup_ngram_jaccard",
        "dedup_embedding_cosine", "decontaminate")) {
      SparkEntry.queries(name)(spark, sf).count()
      graft.operators.CacheScope.releaseAll()
    }
    assert(spark.sharedState.cacheManager.isEmpty,
      "persisted intermediates leaked past CacheScope.releaseAll()")
  }
}
