package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bucketed tables = the storage-level shuffle eliminator: writing both
  * join sides bucketed (and sorted) by the join key pre-shuffles the data
  * once at write time, so every subsequent join on that key runs with ZERO
  * Exchange — at 100 TB that turns the recurring fact⨝fact shuffle into a
  * one-time layout cost. This spec proves the property end-to-end on the
  * real tables: orders ⨝ lineitem on the order key, bucketed 8 ways.
  *
  * The write also sorts within buckets (one file per bucket via a
  * repartition on the bucket key). Spark only consumes that sort order
  * when `spark.sql.legacy.bucketedTableScan.outputOrdering` is on
  * (SPARK-33399 turned it off by default because multiple files per
  * bucket silently break the assumption) — asserted separately below.
  */
class BucketingSpec extends AnyFunSuite with org.scalatest.BeforeAndAfterAll {
  private val sf = "/root/testdata/sf0.001"
  private def spark = SparkTestSession.spark

  override def beforeAll(): Unit = {
    val s = spark
    s.sql("DROP TABLE IF EXISTS b_orders")
    s.sql("DROP TABLE IF EXISTS b_lineitem")
    // one file per bucket (repartition on the bucket key): required for
    // the sorted-scan assertion, and the layout a compacted table would
    // have in production
    s.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .repartition(8, org.apache.spark.sql.functions.col("o_orderkey"))
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    s.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
      .repartition(8, org.apache.spark.sql.functions.col("l_orderkey"))
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")
  }

  override def afterAll(): Unit = {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }

  private def withConf(kvs: (String, String)*)(body: => Unit): Unit = {
    val s = spark
    val prev = kvs.map { case (k, _) => k -> s.conf.getOption(k) }
    kvs.foreach { case (k, v) => s.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
  }

  private def bucketedJoin = {
    val s = spark
    s.table("b_orders").join(s.table("b_lineitem"),
      s.table("b_orders")("o_orderkey") === s.table("b_lineitem")("l_orderkey"))
  }

  test("co-bucketed orders/lineitem join plans with zero Exchange") {
    val s = spark
    // force the sort-merge path: with broadcast available the tiny SF
    // would dodge the very shuffle this test is about
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val plan = bucketedJoin.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketing did not eliminate the shuffle:\n$plan")

      // and the answer is still right
      val n = bucketedJoin.count()
      val expected = s.read.parquet(s"$sf/orders.parquet")
        .join(s.read.parquet(s"$sf/lineitem.parquet"),
          org.apache.spark.sql.functions.col("o_orderkey") ===
            org.apache.spark.sql.functions.col("l_orderkey")).count()
      assert(n == expected)
    }
  }

  test("bucket sort order removes the per-task Sort under the sorted-scan flag") {
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.legacy.bucketedTableScan.outputOrdering" -> "true") {
      val plan = bucketedJoin.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
      assert(!plan.contains("Exchange"), s"shuffle reappeared:\n$plan")
      assert(!plan.linesIterator.exists(_.trim.matches("""[+:]- Sort \[.*""")),
        s"bucket sort order not exploited:\n$plan")
      assert(bucketedJoin.count() > 0)
    }
  }
}
