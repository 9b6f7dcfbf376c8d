package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.FactStateStreams

/** Parity for the knnMaintenance face (live top-k neighborhoods): the
  * final per-probe neighborhood must equal both a plain-Scala brute-force
  * recomputation AND the batch `embedding_bitext_mining` forward rows —
  * under adversarially reversed, uneven arrival (the top-k set-merge is
  * order-free by construction; this pins it). */
class StreamingKnnSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def corpus: Array[(Long, Array[Float])] =
    spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

  private def cosPpm(p: Array[Double], v: Array[Float]): Long = {
    var dot = 0.0; var np = 0.0; var nv = 0.0; var i = 0
    while (i < p.length) {
      val x = v(i).toDouble
      dot += p(i) * x; np += p(i) * p(i); nv += x * x; i += 1
    }
    math.floor(dot / (math.sqrt(np) * math.sqrt(nv)) * 1000000).toLong
  }

  test("final streamed neighborhoods equal brute force and the batch " +
      "bitext forward pass under reversed uneven arrival") {
    val s = spark
    import s.implicits._
    val vecs = corpus
    val probes = vecs.filter(v => v._1 % 2 == 0 && v._1 < 40)
      .map { case (id, v) => (id, v.map(_.toDouble)) }.toSeq
    val pool = vecs.filter(_._1 % 2 == 1)
      .map { case (id, v) => (id, v.toSeq) }.reverse.toSeq
    val batches = Seq(
      pool.take(1), pool.slice(1, 7), pool.slice(7, pool.length / 2),
      pool.slice(pool.length / 2, pool.length - 3), pool.takeRight(3))
      .filter(_.nonEmpty)

    val input = MemoryStream[(Long, Seq[Float])](s)
    val out = FactStateStreams.knnMaintenance(
      s, input.toDF().toDF("vec_id", "embedding"), probes, k = 4)
    val dir = java.nio.file.Files.createTempDirectory("stream-knn").toString
    val name = s"knn_${System.nanoTime()}"
    val q = out.writeStream
      .format("memory").queryName(name)
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", s"$dir/cp")
      .trigger(Trigger.ProcessingTime(20))
      .start()
    val rows =
      try {
        batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
        s.table(name)
          .as[(Long, Long, Long, Seq[Long], Seq[Long])].collect().toSeq
      } finally q.stop()

    val got = rows.groupBy(_._1).map { case (pid, rs) =>
      val last = rs.maxBy(_._2); pid -> ((last._3, last._4, last._5))
    }
    // (a) plain-Scala brute force over the same pool
    val poolArr = vecs.filter(_._1 % 2 == 1)
    val expected = probes.map { case (pid, pv) =>
      val top = poolArr.map { case (id, v) => (cosPpm(pv, v), id) }
        .sortBy { case (c, i) => (-c, i) }.take(4)
      pid -> ((poolArr.length.toLong, top.map(_._2).toSeq, top.map(_._1).toSeq))
    }.toMap
    assert(got == expected, s"got $got\nexpected $expected")
    // (b) the batch bitext forward rows (rk <= 2) are a prefix of the
    // face's neighborhoods, cosine-for-cosine
    val bitext = graft.operators.Mining
      .queries("embedding_bitext_mining")(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2).toInt, r.getLong(1), r.getLong(3)))
    assert(bitext.nonEmpty)
    bitext.foreach { case (pid, rk, tgt, cos) =>
      val (_, ids, cs) = got(pid)
      assert(ids(rk - 1) == tgt && cs(rk - 1) == cos,
        s"probe $pid rank $rk: face ${ids(rk - 1)}/${cs(rk - 1)} vs batch $tgt/$cos")
    }
    // (c) nSeen is cumulative, never key-count-dependent
    assert(got.values.forall(_._1 == poolArr.length.toLong))
  }
}
