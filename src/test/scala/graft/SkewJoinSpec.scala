package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.SkewJoin

/** Salted skewed join: identical results to the plain join, with the hot
  * key's rows actually spread across reducers instead of pinned to one. */
class SkewJoinSpec extends AnyFunSuite {
  private def spark = SparkTestSession.spark

  test("salted join equals plain join and spreads the hot key across partitions") {
    val s = spark
    import s.implicits._
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevCoalesce = s.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
    // keep the 4 shuffle partitions observable — AQE would coalesce this
    // tiny test shuffle into one partition and hide the distribution
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      // 50k BYTE-IDENTICAL rows on ONE key + a uniform tail: the classic
      // straggler shape, in its hardest form — duplicate rows mean a
      // row-content hash alone would give every hot row the same salt
      val big = s.range(0, 50000).selectExpr("CAST(0 AS BIGINT) AS k", "CAST(7 AS BIGINT) AS payload")
        .union(s.range(0, 10000).selectExpr("(id % 97) + 1 AS k", "id AS payload"))
      val dim = s.range(0, 98).selectExpr("id AS k", "concat('d', id) AS label")

      val plain = big.join(dim, "k")
      val salted = SkewJoin.saltedEquiJoin(big, dim, "k", salts = 4)

      // exact result equality (count + keyed checksum)
      assert(salted.count() == plain.count())
      val sum1 = plain.agg(sum(col("payload"))).head().getLong(0)
      val sum2 = salted.agg(sum(col("payload"))).head().getLong(0)
      assert(sum1 == sum2)
      assert(salted.columns.count(_ == "k") == 1, "duplicate join column leaked")

      // distribution, measured on the joins' OWN output partitioning (the
      // shuffle the join actually performed — k for plain, (k, __salt) for
      // salted): unsalted, the hot key pins >= 50k rows on one reducer;
      // salted, no reducer may hold much more than a quarter of the hot
      // key (4 salts) plus tail
      val plainMax = SkewJoin.partitionSizes(plain).max
      val saltedMax = SkewJoin.partitionSizes(salted).max
      assert(plainMax >= 50000L, s"hot key not pinned without salting ($plainMax)")
      assert(saltedMax < 30000L, s"salting left a straggler partition ($saltedMax)")

      // the join itself shuffles on (k, __salt): verify via the salted plan
      val plan = salted.queryExecution.executedPlan.toString
      assert(plan.contains("__salt"), "salt column not part of the join keys")
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prevCoalesce)
    }
  }
}
