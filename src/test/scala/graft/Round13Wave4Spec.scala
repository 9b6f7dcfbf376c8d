package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.FactStateStreams

/** The aucMonitor face: final per-priority rows must equal the batch
  * stats_mann_whitney output on the same orders — under adversarially
  * reversed, uneven arrival (the fold is a commutative weighted census) —
  * the state stays grid-bounded, and a checkpoint restart resumes the
  * fold instead of restarting it. */
class Round13Wave4Spec extends AnyFunSuite {

  private def spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def orderRows: Seq[(String, Long, Long)] =
    spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_orderpriority",
        "CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT) div 10000000 AS bucket")
      .collect().map(r => (r.getString(0), r.getLong(1), 1L)).toSeq

  private def runStream(batches: Seq[Seq[(String, Long, Long)]],
      cp: String, restartAfter: Option[Int] = None): Seq[(String, Long, Long, Long, String, Long)] = {
    val s = spark
    import s.implicits._
    val name = s"auc_${System.nanoTime()}"
    def start(input: MemoryStream[(String, Long, Long)], sink: String) =
      FactStateStreams.aucMonitor(s, input.toDF().toDF("priority", "bucket", "w"))
        .writeStream.format("memory").queryName(sink)
        .outputMode(OutputMode.Update())
        .option("checkpointLocation", cp)
        .trigger(Trigger.ProcessingTime(20)).start()
    val input = MemoryStream[(String, Long, Long)](s)
    var q = start(input, name)
    try {
      batches.zipWithIndex.foreach { case (b, i) =>
        restartAfter.foreach { k =>
          if (i == k) { q.stop(); q = start(input, name) }
        }
        input.addData(b: _*)
        q.processAllAvailable()
      }
      s.table(name).as[(String, Long, Long, Long, String, Long)]
        .collect().toSeq
    } finally q.stop()
  }

  test("final streamed AUC rows equal batch stats_mann_whitney under " +
      "reversed uneven arrival") {
    val rows = orderRows.reverse
    val batches = Seq(rows.take(1), rows.slice(1, 13),
      rows.slice(13, rows.length / 2), rows.drop(rows.length / 2))
      .filter(_.nonEmpty)
    val out = runStream(batches,
      java.nio.file.Files.createTempDirectory("auc-cp").toString + "/cp")
    val fin = out.groupBy(_._1).map { case (p, v) => v.maxBy(_._2) }.toSeq
      .sortBy(_._1).map(r => (r._1, r._3, r._4, r._5, r._6))
    val batch = graft.operators.Stats.queries("stats_mann_whitney")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(fin == batch, s"streamed $fin\nbatch    $batch")
  }

  test("checkpoint restart mid-stream resumes the census (same final rows " +
      "as batch, cumulative seq) and state stays grid-bounded") {
    val s = spark
    import s.implicits._
    val rows = orderRows
    val dir = java.nio.file.Files.createTempDirectory("auc-files").toString
    val cp = s"$dir/cp"
    val sink = new java.util.concurrent.ConcurrentLinkedQueue[
      (String, Long, Long, Long, String, Long)]()
    def drain(): Unit = {
      val in = s.readStream
        .schema("priority STRING, bucket BIGINT, w BIGINT")
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$dir/in")
      val q = FactStateStreams.aucMonitor(s, in).writeStream
        .option("checkpointLocation", cp)
        .outputMode(OutputMode.Update())
        .trigger(Trigger.AvailableNow())
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[FactStateStreams.AucUpdate], _: Long) =>
            b.collect().foreach(u => sink.add(
              (u.priority, u.seq, u.n_g, u.n_rest, u.u2, u.auc_e6)))
        }.start()
      assert(q.awaitTermination(180000), "drain did not terminate")
    }
    def write(batch: Seq[(String, Long, Long)]): Unit =
      batch.toDF("priority", "bucket", "w").coalesce(1)
        .write.mode("append").parquet(s"$dir/in")
    // phase 1: two files drained (two micro-batches), then a clean stop
    write(rows.take(40)); write(rows.slice(40, 200))
    drain()
    // phase 2: rest of the corpus, RESTART from the same checkpoint
    write(rows.drop(200))
    drain()
    import scala.jdk.CollectionConverters._
    val out = sink.asScala.toSeq
    val fin = out.groupBy(_._1).map { case (_, v) => v.maxBy(_._2) }.toSeq
      .sortBy(_._1).map(r => (r._1, r._3, r._4, r._5, r._6))
    val batch = graft.operators.Stats.queries("stats_mann_whitney")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(fin == batch, s"restart lost or double-counted arrivals:\n$fin\n$batch")
    assert(out.map(_._2).max == 3L, "seq did not accumulate across the restart")
    // grid bound: distinct buckets x priorities is the state ceiling —
    // the $1000 bucketing caps buckets at the price DOMAIN (~600 for
    // TPC-H's <= $600k totals), independent of row count
    val nPrios = rows.map(_._1).distinct.size
    val nBuckets = rows.map(_._2).distinct.size
    assert(nPrios.toLong * nBuckets <= 5L * 650,
      s"state grid exceeded the price-domain ceiling: $nPrios x $nBuckets")
  }

  test("weighted deltas fold identically to unit rows (the 100 TB ingest " +
      "contract: pre-reduced censuses per micro-batch)") {
    val rows = orderRows
    val reduced = rows.groupBy(r => (r._1, r._2)).toSeq
      .map { case ((p, b), v) => (p, b, v.map(_._3).sum) }
    val a = runStream(Seq(rows),
      java.nio.file.Files.createTempDirectory("auc-cp3").toString + "/cp")
    val b = runStream(Seq(reduced),
      java.nio.file.Files.createTempDirectory("auc-cp4").toString + "/cp")
    def fin(o: Seq[(String, Long, Long, Long, String, Long)]) =
      o.groupBy(_._1).map { case (_, v) => v.maxBy(_._2) }.toSeq
        .sortBy(_._1).map(r => (r._1, r._3, r._4, r._5, r._6))
    assert(fin(a) == fin(b))
  }
}
