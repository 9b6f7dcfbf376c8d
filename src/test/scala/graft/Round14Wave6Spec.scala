package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.FactStateStreams

/** The ksMonitor face (31st): streamed one-vs-rest order expansions must
  * reproduce the batch stats_ks_test rows exactly (d_num digit string,
  * d_e6, argmax bucket) under reversed uneven arrival; weighted deltas
  * fold like unit rows; an empty side is an explicit None, not an error;
  * and a checkpoint restart resumes the two-sided census. */
class Round14Wave6Spec extends AnyFunSuite {

  private def spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** Each order row expanded one-vs-rest: for key p the row is side 0
    * when its priority IS p, else side 1 — the exact population split
    * stats_ks_test computes per priority. */
  private def ksRows: Seq[(String, Long, Long, Long)] = {
    val rows = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_orderpriority",
        "CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT) div 10000000 AS bucket")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val keys = rows.map(_._1).distinct.sorted
    for { (p, b) <- rows; k <- keys }
      yield (k, if (p == k) 0L else 1L, b, 1L)
  }

  private def batchRows: Seq[(String, Long, Long, String, Long, Long)] =
    graft.operators.Stats.queries("stats_ks_test")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4), r.getLong(5))).toSeq

  private def runStream(batches: Seq[Seq[(String, Long, Long, Long)]],
      cp: String): Seq[FactStateStreams.KsUpdate] = {
    val s = spark
    import s.implicits._
    val name = s"ks_${System.nanoTime()}"
    val input = MemoryStream[(String, Long, Long, Long)](s)
    val q = FactStateStreams.ksMonitor(s,
        input.toDF().toDF("key", "side", "v", "w"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", cp)
      .trigger(Trigger.ProcessingTime(20)).start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      s.table(name).as[FactStateStreams.KsUpdate].collect().toSeq
    } finally q.stop()
  }

  private def fin(out: Seq[FactStateStreams.KsUpdate]) =
    out.groupBy(_.key).map { case (_, v) => v.maxBy(_.seq) }.toSeq
      .sortBy(_.key)
      .map(u => (u.key, u.n_a, u.n_b, u.d_num, u.d_e6.get, u.ks_v.get))

  test("final streamed KS rows equal batch stats_ks_test under reversed " +
      "uneven arrival") {
    val rows = ksRows.reverse
    val batches = Seq(rows.take(11), rows.slice(11, 500),
      rows.slice(500, rows.length / 2), rows.drop(rows.length / 2))
      .filter(_.nonEmpty)
    val out = runStream(batches,
      java.nio.file.Files.createTempDirectory("ks-cp").toString + "/cp")
    assert(fin(out) == batchRows, s"streamed ${fin(out)}\nbatch    $batchRows")
  }

  test("weighted census deltas fold identically to unit rows; an empty " +
      "side reports None explicitly") {
    val rows = ksRows
    def reduced(xs: Seq[(String, Long, Long, Long)]) =
      xs.groupBy(t => (t._1, t._2, t._3)).map { case ((k, sd, v), ts) =>
        (k, sd, v, ts.map(_._4).sum) }.toSeq
    val (h1, h2) = rows.splitAt(rows.length / 3)
    val out = runStream(Seq(reduced(h1), reduced(h2)),
      java.nio.file.Files.createTempDirectory("ks-cpw").toString + "/cp")
    assert(fin(out) == batchRows,
      "pre-reduced weighted deltas diverged from unit-row folding")
    // one-sided key: side B never arrives → explicit undefined, not error
    val oneSided = runStream(Seq(Seq(("solo", 0L, 5L, 3L), ("solo", 0L, 9L, 1L))),
      java.nio.file.Files.createTempDirectory("ks-cp1").toString + "/cp")
    val u = oneSided.maxBy(_.seq)
    assert(u.n_a == 4L && u.n_b == 0L && u.d_num == "0" &&
      u.d_e6.isEmpty && u.ks_v.isEmpty, s"one-sided: $u")
  }

  test("checkpoint restart mid-stream resumes the two-sided census") {
    val s = spark
    import s.implicits._
    val rows = ksRows
    val dir = java.nio.file.Files.createTempDirectory("ks-files").toString
    val cp = s"$dir/cp"
    val sink = new java.util.concurrent.ConcurrentLinkedQueue[
      FactStateStreams.KsUpdate]()
    def drain(): Unit = {
      val in = s.readStream
        .schema("key STRING, side BIGINT, v BIGINT, w BIGINT")
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$dir/in")
      val q = FactStateStreams.ksMonitor(s, in).writeStream
        .option("checkpointLocation", cp)
        .outputMode(OutputMode.Update())
        .trigger(Trigger.AvailableNow())
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[FactStateStreams.KsUpdate], _: Long) =>
            b.collect().foreach(sink.add)
        }.start()
      assert(q.awaitTermination(180000), "drain did not terminate")
    }
    def write(batch: Seq[(String, Long, Long, Long)]): Unit =
      batch.toDF("key", "side", "v", "w").coalesce(1)
        .write.mode("append").parquet(s"$dir/in")
    write(rows.take(100)); write(rows.slice(100, 2000))
    drain()
    write(rows.drop(2000))
    drain()
    import scala.jdk.CollectionConverters._
    val out = sink.asScala.toSeq
    assert(fin(out) == batchRows,
      s"restart lost or double-counted arrivals:\n${fin(out)}\n$batchRows")
    assert(out.map(_.seq).max == 3L, "seq did not accumulate across the restart")
  }
}
