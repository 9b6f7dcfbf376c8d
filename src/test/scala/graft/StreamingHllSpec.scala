package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.FactStateStreams

/** Streaming HLL face: per-language register state after any prefix must
  * equal the batch `hllRegistersOf` over that prefix (pinned through the
  * full-register FNV fingerprint, not just the estimate), the emitted
  * estimate must equal the batch `text_hll_distinct` hll_est_e4
  * bit-for-bit, and a re-delivered batch that raises no register must
  * emit nothing. */
class StreamingHllSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** (lang, seq, present, estE4, regsFnv) rows from a full run. */
  private def run(batches: Seq[Seq[(String, Long)]]): Seq[(String, Long, Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    val input = MemoryStream[(String, Long)](s)
    val hashes = input.toDF().toDF("lang", "h")
    val out = FactStateStreams.hllDistinct(s, hashes)
    val dir = java.nio.file.Files.createTempDirectory("stream-hll").toString
    val name = s"hll_${System.nanoTime()}"
    val q = out.writeStream
      .format("memory").queryName(name)
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", s"$dir/cp")
      .trigger(Trigger.ProcessingTime(50))
      .start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      s.table(name).as[(String, Long, Long, Long, Long)].collect().toSeq
    } finally q.stop()
  }

  /** Max-seq emission per language. */
  private def finalState(rows: Seq[(String, Long, Long, Long, Long)]): Map[String, (Long, Long, Long)] =
    rows.groupBy(_._1).map { case (lang, rs) =>
      val last = rs.maxBy(_._2)
      lang -> ((last._3, last._4, last._5))
    }

  /** Batch truth: full 256-register array per language from hllRegistersOf. */
  private def batchRegs(hashes: Seq[(String, Long)]): Map[String, Array[Long]] = {
    val s = spark
    import s.implicits._
    val df = hashes.toDF("lang", "h")
    val rows = graft.operators.Sketches.hllRegistersOf(df).collect()
    rows.groupBy(_.getString(0)).map { case (lang, rs) =>
      val regs = Array.fill(graft.operators.Sketches.HllM)(0L)
      // j is BIGINT (h % 256) but the rank CASE chain yields INT
      rs.foreach(r => regs(r.getLong(1).toInt) = r.getAs[Number](2).longValue)
      lang -> regs
    }
  }

  private def fnv(regs: Array[Long]): Long =
    regs.foldLeft(-3750763034362895579L)((a, m) => (a ^ m) * 1099511628211L)

  test("stream registers + estimate equal the batch HLL on the sf0.001 corpus") {
    val s = spark
    val hashes = graft.operators.Sketches.langShingleHashes(s, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // adversarial arrival: reversed, split across 4 batches
    val batches = hashes.reverse.grouped(math.max(hashes.size / 4, 1)).toSeq
    val got = finalState(run(batches))
    val regs = batchRegs(hashes)
    val est = graft.operators.Sketches.queries("text_hll_distinct")(s, sf)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got.keySet == regs.keySet)
    got.foreach { case (lang, (present, estE4, regsFnv)) =>
      assert(present == regs(lang).count(_ > 0).toLong, s"present mismatch for $lang")
      assert(estE4 == est(lang), s"estimate mismatch for $lang: $estE4 vs ${est(lang)}")
      assert(regsFnv == fnv(regs(lang)), s"register-state mismatch for $lang")
    }
    graft.operators.CacheScope.releaseAll()
  }

  test("a re-delivered batch that raises no register emits nothing") {
    val hs = Seq(("en", 12345L), ("en", 987654321L), ("de", 5550123L))
    val once = run(Seq(hs))
    val twice = run(Seq(hs, hs)) // exact re-delivery: every max already held
    assert(finalState(twice) == finalState(once))
    assert(twice.size == once.size, s"re-delivery re-emitted: $twice")
  }

  test("arrival order and batch boundaries cannot change the final state") {
    val hs = (1 to 400).map(i => (if (i % 3 == 0) "de" else "en", i * 2654435761L % 1000000007L))
    val a = finalState(run(Seq(hs)))
    val b = finalState(run(hs.reverse.grouped(37).toSeq))
    assert(a == b)
  }
}
