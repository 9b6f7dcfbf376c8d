package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.FactStateStreams

/** Streaming LSH bucket census: all four statistics are commutative
  * merges, so under ANY arrival order / batch split the final (max-seq)
  * per-bucket census must equal the batch `ann_lsh_buckets` rows
  * column-for-column (the bucket expression is one shared rendering). */
class StreamingLshBucketsSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("final streamed census equals batch ann_lsh_buckets under " +
      "adversarial splits and reversed arrival") {
    val s = spark
    import s.implicits._
    val vecs = s.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2)))
    // adversarial arrival: reversed, uneven batches
    val shuffled = vecs.reverse.toSeq
    val batches = Seq(
      shuffled.take(1), shuffled.slice(1, 9),
      shuffled.slice(9, vecs.length / 2),
      shuffled.slice(vecs.length / 2, vecs.length - 4),
      shuffled.takeRight(4)).filter(_.nonEmpty)

    val input = MemoryStream[(Long, Int, Seq[Float])](s)
    val out = FactStateStreams.lshBucketCensus(
      s, input.toDF().toDF("vec_id", "label", "embedding"))
    val dir = java.nio.file.Files.createTempDirectory("stream-lshb").toString
    val name = s"lshb_${System.nanoTime()}"
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
          .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
      } finally q.stop()

    val got = rows.groupBy(_._1).map { case (bucket, rs) =>
      val last = rs.maxBy(_._2)
      bucket -> ((last._3, last._4, last._5, last._6))
    }
    val expected = graft.operators.Similarity
      .queries("ann_lsh_buckets")(s, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got == expected, s"got $got\nexpected $expected")
    // per-bucket update count bounded by batches carrying its vectors
    rows.groupBy(_._1).foreach { case (bucket, rs) =>
      assert(rs.map(_._2).max <= batches.size.toLong,
        s"bucket $bucket emitted more updates than batches")
    }
  }
}
