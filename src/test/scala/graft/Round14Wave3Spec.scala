package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.FactStateStreams

/** The iqrMonitor face (30th): final per-group rows must equal the batch
  * dq_iqr_outliers fences on the same events — under reversed, uneven
  * arrival (the fold is a commutative weighted census) — weighted deltas
  * must fold identically to unit rows (the 100 TB ingest contract), the
  * state stays value-domain-bounded, and a checkpoint restart resumes
  * the census instead of restarting it. */
class Round14Wave3Spec extends AnyFunSuite {

  private def spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** (grp, floor(value), 1) unit rows — the same projection the batch
    * operator censuses. */
  private def eventRows: Seq[(String, Long, Long)] =
    spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_type", "CAST(floor(value) AS BIGINT) AS v")
      .collect().map(r => (r.getString(0), r.getLong(1), 1L)).toSeq

  private def batchRows: Seq[(String, Long, Long, Long, Long, Long, Long)] =
    graft.operators.DataQuality.queries("dq_iqr_outliers")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq

  private def runStream(batches: Seq[Seq[(String, Long, Long)]],
      cp: String): Seq[FactStateStreams.IqrUpdate] = {
    val s = spark
    import s.implicits._
    val name = s"iqr_${System.nanoTime()}"
    val input = MemoryStream[(String, Long, Long)](s)
    val q = FactStateStreams.iqrMonitor(s, input.toDF().toDF("grp", "v", "w"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", cp)
      .trigger(Trigger.ProcessingTime(20)).start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      s.table(name).as[FactStateStreams.IqrUpdate].collect().toSeq
    } finally q.stop()
  }

  private def fin(out: Seq[FactStateStreams.IqrUpdate]) =
    out.groupBy(_.grp).map { case (_, v) => v.maxBy(_.seq) }.toSeq
      .sortBy(_.grp).map(u => (u.grp, u.n, u.q1, u.q3, u.iqr, u.n_low, u.n_high))

  test("final streamed fences equal batch dq_iqr_outliers under reversed " +
      "uneven arrival") {
    val rows = eventRows.reverse
    val batches = Seq(rows.take(7), rows.slice(7, 100),
      rows.slice(100, rows.length / 2), rows.drop(rows.length / 2))
      .filter(_.nonEmpty)
    val out = runStream(batches,
      java.nio.file.Files.createTempDirectory("iqr-cp").toString + "/cp")
    assert(fin(out) == batchRows, s"streamed ${fin(out)}\nbatch    $batchRows")
  }

  test("weighted deltas fold identically to unit rows, and the state is " +
      "value-domain-bounded") {
    val rows = eventRows
    // pre-reduced census deltas: one (grp, v, count) row per cell per half
    def reduced(xs: Seq[(String, Long, Long)]): Seq[(String, Long, Long)] =
      xs.groupBy(t => (t._1, t._2)).map { case ((g, v), ts) =>
        (g, v, ts.map(_._3).sum) }.toSeq
    val (h1, h2) = rows.splitAt(rows.length / 2)
    val out = runStream(Seq(reduced(h1), reduced(h2)),
      java.nio.file.Files.createTempDirectory("iqr-cpw").toString + "/cp")
    assert(fin(out) == batchRows,
      "pre-reduced weighted deltas diverged from unit-row folding")
    // state ceiling: per-group census cells <= the value DOMAIN size
    val domain = rows.map(t => (t._1, t._2)).distinct.groupBy(_._1)
      .values.map(_.size).max
    assert(out.forall(_.n >= 1) && domain <= 2000,
      s"value domain unexpectedly unbounded: $domain cells in one group")
  }

  test("checkpoint restart mid-stream resumes the census: same final rows " +
      "as batch, cumulative seq") {
    val s = spark
    import s.implicits._
    val rows = eventRows
    val dir = java.nio.file.Files.createTempDirectory("iqr-files").toString
    val cp = s"$dir/cp"
    val sink = new java.util.concurrent.ConcurrentLinkedQueue[
      FactStateStreams.IqrUpdate]()
    def drain(): Unit = {
      val in = s.readStream
        .schema("grp STRING, v BIGINT, w BIGINT")
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$dir/in")
      val q = FactStateStreams.iqrMonitor(s, in).writeStream
        .option("checkpointLocation", cp)
        .outputMode(OutputMode.Update())
        .trigger(Trigger.AvailableNow())
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[FactStateStreams.IqrUpdate], _: Long) =>
            b.collect().foreach(sink.add)
        }.start()
      assert(q.awaitTermination(180000), "drain did not terminate")
    }
    def write(batch: Seq[(String, Long, Long)]): Unit =
      batch.toDF("grp", "v", "w").coalesce(1)
        .write.mode("append").parquet(s"$dir/in")
    write(rows.take(50)); write(rows.slice(50, 300))
    drain()
    write(rows.drop(300))
    drain()
    import scala.jdk.CollectionConverters._
    val out = sink.asScala.toSeq
    assert(fin(out) == batchRows,
      s"restart lost or double-counted arrivals:\n${fin(out)}\n$batchRows")
    assert(out.map(_.seq).max == 3L, "seq did not accumulate across the restart")
  }
}
