package graft

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.store.SparkFactStore
import graft.streaming.FactStateStreams

/** Round-14 extension of the committed streaming-checkpoint fixture: the
  * TWO new state shapes this round introduced — IqrState (a Seq of
  * (value, count) census cells per group key) and KsState (a Seq of
  * (value, nA, nB) two-sided cells) — get their own committed
  * checkpoints, generated once and resumed by the compat spec forever
  * after. All inputs are code literals (no testdata reads), same
  * append-frozen policy as stream_ckpt_v11/v12/v13 (SURVEY §8). */
object StreamCkptFixtureV14 {

  val sentinel: Path = Paths.get("/tmp/graft-stream-ckpt-fixture-v14")
  val resource: Path = Paths.get("src/test/resources/fixtures/stream_ckpt_v14")

  def iqrFact(g: String, v: Long): FactInput =
    FactInput("e", s"$g|$v", Array[Byte](1),
      tags = Map("g" -> g, "v" -> v.toString))

  def ksFact(k: String, side: Long, v: Long): FactInput =
    FactInput("e", s"$k|$side|$v", Array[Byte](1),
      tags = Map("k" -> k, "s" -> side.toString, "v" -> v.toString))

  /** Phase 1 for the KS face: key X side-A a 1..6 ramp, side-B the same
    * ramp shifted +2 (a real gap); key Y side-A only (one-sided → None). */
  val ksPhase1: Seq[FactInput] =
    (1L to 6L).map(ksFact("X", 0L, _)) ++
      (3L to 8L).map(ksFact("X", 1L, _)) ++
      Seq(10L, 20L).map(ksFact("Y", 0L, _))

  /** Phase 2 after the frozen checkpoint: B mass for Y (its KS becomes
    * defined only if the frozen one-sided census survived) and one more
    * A cell for X. */
  val ksPhase2: Seq[FactInput] =
    Seq(ksFact("Y", 1L, 30L), ksFact("X", 0L, 7L))

  def ksFace(df: DataFrame): Dataset[FactStateStreams.KsUpdate] =
    FactStateStreams.ksMonitor(SparkTestSession.spark, df.selectExpr(
      "tags['k'] AS key", "CAST(tags['s'] AS BIGINT) AS side",
      "CAST(tags['v'] AS BIGINT) AS v", "CAST(1 AS BIGINT) AS w"))

  /** Phase 1: group A a tight 1..8 ramp (q1=2, q3=6), B a sparse decade
    * ladder — two distinct census shapes under one checkpoint. */
  val iqrPhase1: Seq[FactInput] =
    (1L to 8L).map(iqrFact("A", _)) ++
      Seq(10L, 20L, 30L, 40L).map(iqrFact("B", _))

  /** Phase 2 after the frozen checkpoint: a high outlier for A (100 is
    * far past A's 2·q3 + 3·IQR = 24 fence — it only trips if the frozen
    * census survived), one in-fence A value, one B extension. */
  val iqrPhase2: Seq[FactInput] =
    Seq(iqrFact("A", 100L), iqrFact("A", 5L), iqrFact("B", 50L))

  def iqrFace(df: DataFrame): Dataset[FactStateStreams.IqrUpdate] =
    FactStateStreams.iqrMonitor(SparkTestSession.spark, df.selectExpr(
      "tags['g'] AS grp", "CAST(tags['v'] AS BIGINT) AS v",
      "CAST(1 AS BIGINT) AS w"))
}

/** One-shot generator — run once, commit the resulting fixture tree. */
object StreamCkptFixtureV14Gen {
  import StreamCkptFixture.{copyTree, deleteTree, drain}
  import StreamCkptFixtureV14._

  def main(args: Array[String]): Unit = {
    deleteTree(sentinel)
    Files.createDirectories(sentinel)
    val fs = new SparkFactStore(SparkTestSession.spark, sentinel.resolve("store"))
    require(fs.createStore("iqr").isInstanceOf[CreateStoreResult.Created])
    iqrPhase1.foreach(fs.append("iqr", _))
    val out = drain(fs, "iqr", sentinel.resolve("ckpt-iqr").toString, "update")(iqrFace)
    require(out.nonEmpty, "phase 1 emitted nothing")
    require(fs.createStore("ks").isInstanceOf[CreateStoreResult.Created])
    ksPhase1.foreach(fs.append("ks", _))
    val outKs = drain(fs, "ks", sentinel.resolve("ckpt-ks").toString, "update")(ksFace)
    require(outKs.nonEmpty, "ks phase 1 emitted nothing")
    deleteTree(resource)
    Files.createDirectories(resource.getParent)
    copyTree(sentinel, resource)
    println(s"fixture written: $resource (${Files.walk(resource).count()} entries)")
  }
}

/** Compat gate: current code must resume the committed v14 checkpoint. */
class StreamingCkptCompatV14Spec extends AnyFunSuite {
  import StreamCkptFixture.{copyTree, deleteTree, drain}
  import StreamCkptFixtureV14._

  private def restored(): SparkFactStore = {
    assert(Files.exists(resource),
      s"missing fixture $resource — run StreamCkptFixtureV14Gen")
    deleteTree(sentinel)
    copyTree(resource, sentinel)
    new SparkFactStore(SparkTestSession.spark, sentinel.resolve("store"))
  }

  test("iqrMonitor resumes the committed checkpoint: the census-cell state " +
      "decodes, fences keep accumulating, and the final rows match an " +
      "uninterrupted run") {
    val fs = restored()
    iqrPhase2.foreach(fs.append("iqr", _))
    val resumed = drain(fs, "iqr",
      sentinel.resolve("ckpt-iqr").toString, "update")(iqrFace)
    assert(resumed.nonEmpty, "resume emitted nothing")
    assert(resumed.forall(_.seq >= 2), s"state was reset: $resumed")
    val tmp = Files.createTempDirectory("ckpt-v14-iqr-")
    val fsU = new SparkFactStore(SparkTestSession.spark, tmp)
    fsU.createStore("iqr")
    (iqrPhase1 ++ iqrPhase2).foreach(fsU.append("iqr", _))
    val full = drain(fsU, "iqr", tmp.resolve("ckpt").toString, "update")(iqrFace)
    def fin(rows: Seq[FactStateStreams.IqrUpdate]) =
      rows.groupBy(_.grp).map { case (g, rs) =>
        val last = rs.maxBy(_.seq)
        g -> ((last.n, last.q1, last.q3, last.iqr, last.n_low, last.n_high))
      }
    assert(fin(resumed) == fin(full), s"${fin(resumed)} vs ${fin(full)}")
    // the outlier only fires against the RESUMED census: a reset state
    // would see {5, 100} and fence nothing
    assert(fin(resumed)("A")._6 == 1L, s"A high-fence: ${fin(resumed)("A")}")
  }

  test("ksMonitor resumes the committed checkpoint: the two-sided census " +
      "decodes, a one-sided key's KS becomes defined from the FROZEN " +
      "side-A mass, and final rows match an uninterrupted run") {
    val fs = restored()
    ksPhase2.foreach(fs.append("ks", _))
    val resumed = drain(fs, "ks",
      sentinel.resolve("ckpt-ks").toString, "update")(ksFace)
    assert(resumed.nonEmpty, "resume emitted nothing")
    assert(resumed.forall(_.seq >= 2), s"state was reset: $resumed")
    val tmp = Files.createTempDirectory("ckpt-v14-ks-")
    val fsU = new SparkFactStore(SparkTestSession.spark, tmp)
    fsU.createStore("ks")
    (ksPhase1 ++ ksPhase2).foreach(fsU.append("ks", _))
    val full = drain(fsU, "ks", tmp.resolve("ckpt").toString, "update")(ksFace)
    def fin(rows: Seq[FactStateStreams.KsUpdate]) =
      rows.groupBy(_.key).map { case (k, rs) =>
        val last = rs.maxBy(_.seq)
        k -> ((last.n_a, last.n_b, last.d_num, last.d_e6, last.ks_v))
      }
    assert(fin(resumed) == fin(full), s"${fin(resumed)} vs ${fin(full)}")
    // Y had ONLY frozen side-A mass; phase 2 adds side B — a reset state
    // would see n_a = 0 and stay undefined
    val y = fin(resumed)("Y")
    assert(y._1 == 2L && y._2 == 1L && y._4.nonEmpty, s"Y resumed: $y")
  }
}
