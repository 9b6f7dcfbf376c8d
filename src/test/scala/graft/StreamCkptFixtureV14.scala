package graft

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.store.SparkFactStore
import graft.streaming.FactStateStreams

/** Round-14 extension of the committed streaming-checkpoint fixture: the
  * one NEW state shape this round introduced — IqrState (a Seq of
  * (value, count) census cells per group key) — gets its own committed
  * checkpoint, generated once and resumed by the compat spec forever
  * after. All inputs are code literals (no testdata reads), same
  * append-frozen policy as stream_ckpt_v11/v12/v13 (SURVEY §8). */
object StreamCkptFixtureV14 {

  val sentinel: Path = Paths.get("/tmp/graft-stream-ckpt-fixture-v14")
  val resource: Path = Paths.get("src/test/resources/fixtures/stream_ckpt_v14")

  def iqrFact(g: String, v: Long): FactInput =
    FactInput("e", s"$g|$v", Array[Byte](1),
      tags = Map("g" -> g, "v" -> v.toString))

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
}
