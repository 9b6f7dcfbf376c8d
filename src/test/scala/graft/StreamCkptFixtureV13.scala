package graft

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.store.SparkFactStore
import graft.streaming.FactStateStreams

/** Round-13 extension of the committed streaming-checkpoint fixture: the
  * one NEW state shape this round introduced — AucGridState (a Seq of
  * (priority, bucket, count) grid cells under a single grid key) — gets
  * its own committed checkpoint, generated once and resumed by the compat
  * spec forever after. All inputs are code literals (no testdata reads),
  * same append-frozen policy as stream_ckpt_v11/v12 (SURVEY §8). */
object StreamCkptFixtureV13 {

  val sentinel: Path = Paths.get("/tmp/graft-stream-ckpt-fixture-v13")
  val resource: Path = Paths.get("src/test/resources/fixtures/stream_ckpt_v13")

  def aucFact(p: String, b: Long): FactInput =
    FactInput("o", s"$p|$b", Array[Byte](1),
      tags = Map("p" -> p, "b" -> b.toString))

  /** Phase 1: URGENT skews high, LOW skews low — a non-trivial AUC. */
  val aucPhase1: Seq[FactInput] = Seq(
    aucFact("U", 9), aucFact("U", 8), aucFact("U", 7), aucFact("U", 9),
    aucFact("L", 1), aucFact("L", 2), aucFact("L", 1), aucFact("L", 3),
    aucFact("M", 5), aucFact("M", 5))

  /** Phase 2 after the frozen checkpoint: reinforce + a tie bucket. */
  val aucPhase2: Seq[FactInput] = Seq(
    aucFact("U", 9), aucFact("L", 2), aucFact("M", 9), aucFact("M", 1))

  def aucFace(df: DataFrame): Dataset[FactStateStreams.AucUpdate] =
    FactStateStreams.aucMonitor(SparkTestSession.spark, df.selectExpr(
      "tags['p'] AS priority", "CAST(tags['b'] AS BIGINT) AS bucket",
      "CAST(1 AS BIGINT) AS w"))
}

/** One-shot generator — run once, commit the resulting fixture tree. */
object StreamCkptFixtureV13Gen {
  import StreamCkptFixture.{copyTree, deleteTree, drain}
  import StreamCkptFixtureV13._

  def main(args: Array[String]): Unit = {
    deleteTree(sentinel)
    Files.createDirectories(sentinel)
    val fs = new SparkFactStore(SparkTestSession.spark, sentinel.resolve("store"))
    require(fs.createStore("auc").isInstanceOf[CreateStoreResult.Created])
    aucPhase1.foreach(fs.append("auc", _))
    val out = drain(fs, "auc", sentinel.resolve("ckpt-auc").toString, "update")(aucFace)
    require(out.nonEmpty, "phase 1 emitted nothing")
    deleteTree(resource)
    Files.createDirectories(resource.getParent)
    copyTree(sentinel, resource)
    println(s"fixture written: $resource (${Files.walk(resource).count()} entries)")
  }
}

/** Compat gate: current code must resume the committed v13 checkpoint. */
class StreamingCkptCompatV13Spec extends AnyFunSuite {
  import StreamCkptFixture.{copyTree, deleteTree, drain}
  import StreamCkptFixtureV13._

  private def restored(): SparkFactStore = {
    assert(Files.exists(resource),
      s"missing fixture $resource — run StreamCkptFixtureV13Gen")
    deleteTree(sentinel)
    copyTree(resource, sentinel)
    new SparkFactStore(SparkTestSession.spark, sentinel.resolve("store"))
  }

  test("aucMonitor resumes the committed checkpoint: the grid-cell state " +
      "decodes, the census keeps accumulating, and the final rows match " +
      "an uninterrupted run") {
    val fs = restored()
    aucPhase2.foreach(fs.append("auc", _))
    val resumed = drain(fs, "auc",
      sentinel.resolve("ckpt-auc").toString, "update")(aucFace)
    assert(resumed.nonEmpty, "resume emitted nothing")
    assert(resumed.forall(_.seq >= 2), s"state was reset: $resumed")
    val tmp = Files.createTempDirectory("ckpt-v13-auc-")
    val fsU = new SparkFactStore(SparkTestSession.spark, tmp)
    fsU.createStore("auc")
    (aucPhase1 ++ aucPhase2).foreach(fsU.append("auc", _))
    val full = drain(fsU, "auc", tmp.resolve("ckpt").toString, "update")(aucFace)
    def fin(rows: Seq[FactStateStreams.AucUpdate]) =
      rows.groupBy(_.priority).map { case (p, rs) =>
        val last = rs.maxBy(_.seq)
        p -> ((last.n_g, last.n_rest, last.u2, last.auc_e6))
      }
    assert(fin(resumed) == fin(full), s"${fin(resumed)} vs ${fin(full)}")
    // the skew survives the restart: URGENT dominates, LOW is dominated
    assert(fin(resumed)("U")._4 > 900000L, s"U auc: ${fin(resumed)("U")}")
    assert(fin(resumed)("L")._4 < 100000L, s"L auc: ${fin(resumed)("L")}")
  }
}
