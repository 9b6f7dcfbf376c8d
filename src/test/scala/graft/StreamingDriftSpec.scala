package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.FactStateStreams

/** Parity for the embeddingDriftMonitor face: final per-probe moments must
  * equal a plain-Scala recomputation under reversed uneven arrival, and
  * state stays panel-sized. */
class StreamingDriftSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def cosPpm(p: Array[Double], v: Array[Float]): Long = {
    var dot = 0.0; var np = 0.0; var nv = 0.0; var i = 0
    while (i < p.length) {
      val x = v(i).toDouble
      dot += p(i) * x; np += p(i) * p(i); nv += x * x; i += 1
    }
    math.floor(dot / (math.sqrt(np) * math.sqrt(nv)) * 1000000).toLong
  }

  test("final streamed moments equal a plain-Scala recomputation under " +
      "reversed uneven arrival; state rows stay = panel size") {
    val s = spark
    import s.implicits._
    val vecs = s.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val panel = vecs.take(4)
      .map { case (id, v) => (id, v.map(_.toDouble).toArray) }.toSeq
    val stream = vecs.slice(4, 34).reverse.toSeq
    val batches = Seq(stream.take(2), stream.slice(2, 11),
      stream.slice(11, 23), stream.drop(23)).filter(_.nonEmpty)

    val obs = graft.streaming.StateObservatory.attach(s)
    val input = MemoryStream[(Long, Seq[Float])](s)
    val out = FactStateStreams.embeddingDriftMonitor(
      s, input.toDF().toDF("vec_id", "embedding"), panel)
    val dir = java.nio.file.Files.createTempDirectory("stream-drift").toString
    val name = s"drift_${System.nanoTime()}"
    val q = out.writeStream
      .format("memory").queryName(name)
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", s"$dir/cp")
      .trigger(Trigger.ProcessingTime(20))
      .start()
    val (rows, st) =
      try {
        batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
        (s.table(name)
          .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq,
          obs.awaitBatches(name, batches.size.toLong))
      } finally { q.stop(); s.streams.removeListener(obs) }

    val got = rows.groupBy(_._1).map { case (pid, rs) =>
      val last = rs.maxBy(_._2)
      pid -> ((last._3, last._4, last._5, last._6, last._7))
    }
    val expected = panel.map { case (pid, pv) =>
      val cs = stream.map { case (_, v) => cosPpm(pv, v.toArray) }
      val n = cs.length.toLong
      pid -> ((n, cs.sum / n, cs.map(math.abs).sum / n, cs.min, cs.max))
    }.toMap
    assert(got == expected, s"got $got\nexpected $expected")
    assert(st.maxRows == panel.size.toLong,
      s"state keys ${st.maxRows} != ${panel.size} probes (leak)")
    assert(st.maxBytes < 8L * 1024 * 1024)
  }
}
