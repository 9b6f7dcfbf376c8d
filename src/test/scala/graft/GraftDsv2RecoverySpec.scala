package graft

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.store.SparkFactStore
import graft.streaming.FactStateStreams
import graft.streaming.FactStateStreams.{CmsCell, SubjectState}

/** Checkpoint recovery for stateful faces driven through the DataSource V2
  * source — the external-job rendering of StreamingRecoverySpec: an
  * arbitrary Spark job attaches with `readStream.format("graft")`, folds
  * managed state over the fact tail, is stopped between micro-batches,
  * and restarts from its checkpoint. Because DSv2 offsets are commit
  * seqs and a batch (start, end] re-plans exactly those commits' files,
  * recovery must lose NEITHER the source cursor NOR the state behind it —
  * no facade, no subscribeStream, just the connector.
  *
  * Two faces spanning the state shapes:
  *   - subjectStates  — one state entry per subject (per-key fold)
  *   - hotSubjectCells — fixed-grid CMS cells (sketch state)
  *
  * Each scenario appends across the restart boundary so the post-restart
  * output is only correct if the pre-restart state survived, and asserts
  * the final state equals an uninterrupted run's. */
class GraftDsv2RecoverySpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark

  private def newStore(): (SparkFactStore, String, String) = {
    val root = Files.createTempDirectory("graft-dsv2rec-")
    val fs = new SparkFactStore(spark, root)
    fs.createStore("s")
    (fs, root.toString, "s")
  }

  private def dsv2Stream(root: String, store: String): DataFrame =
    spark.readStream.format("graft")
      .option("root", root).option("store", store).load()

  /** One run segment: start from `ckpt`, drain everything available,
    * stop. Output rows are collected via foreachBatch. */
  private def drain[T](root: String, store: String, ckpt: String)(
      face: DataFrame => Dataset[T]): Seq[T] = {
    val out = new ConcurrentLinkedQueue[T]()
    val q = face(dsv2Stream(root, store)).writeStream
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Update())
      .trigger(Trigger.ProcessingTime(20))
      .foreachBatch { (b: Dataset[T], _: Long) => b.collect().foreach(out.add) }
      .start()
    try q.processAllAvailable() finally q.stop()
    out.asScala.toSeq
  }

  private def facts(tag: String, n: Int): Seq[FactInput] =
    (1 to n).map(i => FactInput(s"$tag-$i", s"subj-${i % 3}", Array[Byte](i.toByte)))

  test("subjectStates recovers per-subject state across a DSv2 restart: " +
      "post-restart counts include pre-restart facts") {
    val (fs, root, store) = newStore()
    val ckpt = Files.createTempDirectory("graft-dsv2rec-ck-").toString
    facts("P1", 6).foreach(f => assert(fs.append(store, f).isInstanceOf[AppendResult.Appended]))
    val out1 = drain(root, store, ckpt)(FactStateStreams.subjectStates(spark, _))
    assert(out1.nonEmpty)
    facts("P2", 6).foreach(f => assert(fs.append(store, f).isInstanceOf[AppendResult.Appended]))
    val out2 = drain(root, store, ckpt)(FactStateStreams.subjectStates(spark, _))

    // final state per subject from the interrupted run
    def finalStates(xs: Seq[SubjectState]): Map[String, SubjectState] =
      xs.groupBy(_.subject).map { case (k, v) => k -> v.maxBy(_.lastPosition) }
    val interrupted = finalStates(out1 ++ out2)

    // uninterrupted twin
    val (fsU, rootU, storeU) = newStore()
    (facts("P1", 6) ++ facts("P2", 6)).foreach(f =>
      assert(fsU.append(storeU, f).isInstanceOf[AppendResult.Appended]))
    val ckptU = Files.createTempDirectory("graft-dsv2rec-cku-").toString
    val uninterrupted =
      finalStates(drain(rootU, storeU, ckptU)(FactStateStreams.subjectStates(spark, _)))

    assert(interrupted == uninterrupted,
      s"restart diverged:\n$interrupted\nvs\n$uninterrupted")
    // the recovery was real: each subject's count spans BOTH phases
    assert(interrupted.values.forall(_.nFacts == 4L),
      s"pre-restart facts lost from state: $interrupted")
    // and the post-restart segment did not re-deliver phase-1 facts
    assert(out2.forall(_.lastPosition > 6L),
      s"phase-1 positions re-emitted after restart: $out2")
  }

  test("hotSubjectCells recovers its CMS grid across a DSv2 restart: " +
      "final cell counts equal the uninterrupted sketch") {
    val (fs, root, store) = newStore()
    val ckpt = Files.createTempDirectory("graft-dsv2rec-ck2-").toString
    facts("A", 8).foreach(f => assert(fs.append(store, f).isInstanceOf[AppendResult.Appended]))
    val out1 = drain(root, store, ckpt)(FactStateStreams.hotSubjectCells(spark, _))
    assert(out1.nonEmpty)
    facts("B", 8).foreach(f => assert(fs.append(store, f).isInstanceOf[AppendResult.Appended]))
    val out2 = drain(root, store, ckpt)(FactStateStreams.hotSubjectCells(spark, _))

    def grid(xs: Seq[CmsCell]): Map[(Long, Long), Long] =
      xs.groupBy(c => (c.depth, c.cell)).map { case (k, v) => k -> v.map(_.n).max }
    val interrupted = grid(out1 ++ out2)

    val (fsU, rootU, storeU) = newStore()
    (facts("A", 8) ++ facts("B", 8)).foreach(f =>
      assert(fsU.append(storeU, f).isInstanceOf[AppendResult.Appended]))
    val ckptU = Files.createTempDirectory("graft-dsv2rec-cku2-").toString
    val uninterrupted =
      grid(drain(rootU, storeU, ckptU)(FactStateStreams.hotSubjectCells(spark, _)))

    assert(interrupted == uninterrupted,
      "CMS grid diverged across the restart")
    // counters kept counting from recovered values, not from zero: the 16
    // facts split 3 ways by subject (6/5/5... per i%3: 4/6/6), so a grid
    // that reset at the restart could show at most the phase-2 maximum (3);
    // continued counting reaches a subject's full two-phase total (6)
    assert(interrupted.values.max >= 6L,
      s"cell counters reset across restart: max=${interrupted.values.max}")
  }

  test("iqrMonitor (round-14 census face) recovers across a DSv2 restart: " +
      "the post-restart fence decision needs the pre-restart census") {
    val (fs, root, store) = newStore()
    val ckpt = Files.createTempDirectory("graft-dsv2rec-ck3-").toString
    def iqrFact(g: String, v: Long) =
      FactInput("e", s"$g|$v", Array[Byte](1),
        tags = Map("g" -> g, "v" -> v.toString))
    def face(df: DataFrame) =
      FactStateStreams.iqrMonitor(spark, df.selectExpr(
        "tags['g'] AS grp", "CAST(tags['v'] AS BIGINT) AS v",
        "CAST(1 AS BIGINT) AS w"))
    // phase 1: a tight 1..8 ramp (q1=2, q3=6, high fence at 2v > 2*6+3*4)
    val p1 = (1L to 8L).map(iqrFact("A", _))
    // phase 2: one far outlier + one in-fence value — the outlier trips
    // ONLY against the recovered phase-1 census (a reset state seeing
    // {5, 100} alone fences nothing)
    val p2 = Seq(iqrFact("A", 100L), iqrFact("A", 5L))
    p1.foreach(f => assert(fs.append(store, f).isInstanceOf[AppendResult.Appended]))
    val out1 = drain(root, store, ckpt)(face)
    assert(out1.nonEmpty)
    p2.foreach(f => assert(fs.append(store, f).isInstanceOf[AppendResult.Appended]))
    val out2 = drain(root, store, ckpt)(face)
    def fin(xs: Seq[FactStateStreams.IqrUpdate]) =
      xs.groupBy(_.grp).map { case (g, v) =>
        val l = v.maxBy(_.seq); g -> ((l.n, l.q1, l.q3, l.n_low, l.n_high)) }
    val interrupted = fin(out1 ++ out2)
    val (fsU, rootU, storeU) = newStore()
    (p1 ++ p2).foreach(f => assert(fsU.append(storeU, f).isInstanceOf[AppendResult.Appended]))
    val ckptU = Files.createTempDirectory("graft-dsv2rec-cku3-").toString
    val uninterrupted = fin(drain(rootU, storeU, ckptU)(face))
    assert(interrupted == uninterrupted,
      s"restart diverged:\n$interrupted\nvs\n$uninterrupted")
    assert(interrupted("A")._5 == 1L,
      s"the high fence needs the recovered census: ${interrupted("A")}")
    assert(out2.map(_.seq).max > out1.map(_.seq).max,
      "seq did not accumulate across the DSv2 restart")
  }
}
