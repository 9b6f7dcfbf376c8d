package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.functions._

import graft.streaming.FactStateStreams

/** Parity for the tradeFlowCensus face: the final streamed per-pair flow
  * census must equal the batch `graph_trade_reciprocity` flow column
  * under adversarially reversed, uneven arrival (the fold is a
  * commutative exact sum, so order cannot matter — this pins it). */
class StreamingTradeFlowSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** The dims-enriched flow rows the face ingests, from the same
    * relational definition the batch operator uses. */
  private def flowRows: Seq[(String, String, Long)] = {
    val s = spark
    val cn = s.read.parquet(s"$sf/customer.parquet")
      .join(s.read.parquet(s"$sf/nation.parquet"),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("src_nation"))
    val sn = s.read.parquet(s"$sf/supplier.parquet")
      .join(s.read.parquet(s"$sf/nation.parquet"),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("dst_nation"))
    s.read.parquet(s"$sf/lineitem.parquet")
      .join(s.read.parquet(s"$sf/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .join(cn, col("o_custkey") === col("c_custkey"))
      .join(sn, col("l_suppkey") === col("s_suppkey"))
      .selectExpr("src_nation", "dst_nation",
        "CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * " +
          "(CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4))) AS DECIMAL(28,8)) * " +
          "CAST(100000000 AS DECIMAL(9,0)) AS BIGINT) AS rev_e8")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
  }

  test("final streamed flow census equals the batch reciprocity flows " +
      "under reversed uneven arrival; state rows stay = occupied pairs") {
    val s = spark
    import s.implicits._
    val rows = flowRows.reverse
    val batches = Seq(
      rows.take(3), rows.slice(3, 40), rows.slice(40, rows.length / 2),
      rows.slice(rows.length / 2, rows.length - 7), rows.takeRight(7))
      .filter(_.nonEmpty)
    val obs = graft.streaming.StateObservatory.attach(s)
    val input = MemoryStream[(String, String, Long)](s)
    val out = FactStateStreams.tradeFlowCensus(
      s, input.toDF().toDF("src_nation", "dst_nation", "rev_e8"))
    val dir = java.nio.file.Files.createTempDirectory("stream-flow").toString
    val name = s"flow_${System.nanoTime()}"
    val q = out.writeStream
      .format("memory").queryName(name)
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", s"$dir/cp")
      .trigger(Trigger.ProcessingTime(20))
      .start()
    val (got, st) =
      try {
        batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
        val rs = s.table(name)
          .as[(String, String, Long, Long, String)].collect().toSeq
        (rs, obs.awaitBatches(name, batches.size.toLong))
      } finally { q.stop(); s.streams.removeListener(obs) }

    val fin = got.groupBy(r => (r._1, r._2)).map { case (pair, rs) =>
      pair -> BigInt(rs.maxBy(_._3)._5)
    }
    val batch = graft.operators.Mining
      .queries("graph_trade_reciprocity")(s, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> BigInt(r.getString(2)))
      .toMap
    assert(fin == batch, s"pairs ${fin.size} vs ${batch.size}")
    // commutative-sum sanity: row counts across pairs sum to the feed
    val nRows = got.groupBy(r => (r._1, r._2))
      .map { case (_, rs) => rs.maxBy(_._3)._4 }.sum
    assert(nRows == rows.length.toLong)
    // state bound: one row per occupied pair, never per stream row
    assert(st.maxRows == batch.size.toLong,
      s"state keys ${st.maxRows} != ${batch.size} pairs (leak)")
  }
}
