package graft

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.store.SparkFactStore
import graft.streaming.FactStateStreams

/** Round-12 extension of the committed streaming-checkpoint fixture: the
  * two NEW state shapes this round introduced — KnnState (Seq-valued
  * top-k lists) and FlowState (a BigInt sum carried as a digit string) —
  * get their own committed checkpoint, generated once and resumed by the
  * compat spec forever after. Everything the fixture consumes is a code
  * literal (vectors from a pinned formula, no testdata reads), so the
  * committed bytes stay valid even if the driver regenerates testdata.
  * Same append-frozen policy as stream_ckpt_v11 (SURVEY §8). */
object StreamCkptFixtureV12 {
  import StreamCkptFixture.{copyTree, deleteTree, drain}

  val sentinel: Path = Paths.get("/tmp/graft-stream-ckpt-fixture-v12")
  val resource: Path = Paths.get("src/test/resources/fixtures/stream_ckpt_v12")

  private val Dim = 8

  /** Pinned panel: 3 probes from a fixed integer formula. */
  val panel: Seq[(Long, Array[Double])] = (0 until 3).map { i =>
    (i.toLong, Array.tabulate(Dim)(j => ((i * 31 + j * 7) % 13 - 6).toDouble))
  }

  /** Pinned stream vectors (id, dim-8 floats), formula-generated. */
  private def vec(id: Long): Seq[Float] =
    Seq.tabulate(Dim)(j => ((id * 17 + j * 11) % 19 - 9).toFloat)

  def knnFact(id: Long): FactInput =
    FactInput("vec", id.toString, Array[Byte](1),
      tags = Map("emb" -> vec(id).map(_.toString).mkString(",")))

  val knnPhase1: Seq[FactInput] = (100L to 119L).map(knnFact)
  val knnPhase2: Seq[FactInput] = (120L to 131L).map(knnFact)

  def flowFact(src: String, dst: String, rev: Long): FactInput =
    FactInput("f", s"$src|$dst", Array[Byte](1),
      tags = Map("src" -> src, "dst" -> dst, "rev" -> rev.toString))

  val flowPhase1: Seq[FactInput] = Seq(
    flowFact("A", "B", 1000), flowFact("A", "B", 2500), flowFact("C", "D", 7))
  val flowPhase2: Seq[FactInput] = Seq(
    flowFact("A", "B", 4200), flowFact("E", "F", 99))

  def knnFace(df: DataFrame): Dataset[FactStateStreams.KnnUpdate] =
    FactStateStreams.knnMaintenance(SparkTestSession.spark, df.selectExpr(
      "CAST(subject AS BIGINT) AS vec_id",
      "transform(split(tags['emb'], ','), x -> CAST(x AS FLOAT)) AS embedding"),
      panel, k = 4)

  def flowFace(df: DataFrame): Dataset[FactStateStreams.FlowUpdate] =
    FactStateStreams.tradeFlowCensus(SparkTestSession.spark, df.selectExpr(
      "tags['src'] AS src_nation", "tags['dst'] AS dst_nation",
      "CAST(tags['rev'] AS BIGINT) AS rev_e8"))
}

/** One-shot generator — run once, commit the resulting fixture tree. */
object StreamCkptFixtureV12Gen {
  import StreamCkptFixture.{copyTree, deleteTree, drain}
  import StreamCkptFixtureV12._

  def main(args: Array[String]): Unit = {
    deleteTree(sentinel)
    Files.createDirectories(sentinel)
    val fs = new SparkFactStore(SparkTestSession.spark, sentinel.resolve("store"))
    require(fs.createStore("knn").isInstanceOf[CreateStoreResult.Created])
    require(fs.createStore("flow").isInstanceOf[CreateStoreResult.Created])
    knnPhase1.foreach(fs.append("knn", _))
    flowPhase1.foreach(fs.append("flow", _))
    val knnOut = drain(fs, "knn", sentinel.resolve("ckpt-knn").toString, "update")(knnFace)
    val flowOut = drain(fs, "flow", sentinel.resolve("ckpt-flow").toString, "update")(flowFace)
    require(knnOut.nonEmpty && flowOut.nonEmpty, "phase 1 emitted nothing")
    deleteTree(resource)
    Files.createDirectories(resource.getParent)
    copyTree(sentinel, resource)
    println(s"fixture written: $resource (${Files.walk(resource).count()} entries)")
  }
}

/** Compat gate: current code must resume the committed v12 checkpoint. */
class StreamingCkptCompatV12Spec extends AnyFunSuite {
  import StreamCkptFixture.{copyTree, deleteTree, drain}
  import StreamCkptFixtureV12._

  private def restored(): SparkFactStore = {
    assert(Files.exists(resource),
      s"missing fixture $resource — run StreamCkptFixtureV12Gen")
    deleteTree(sentinel)
    copyTree(resource, sentinel)
    new SparkFactStore(SparkTestSession.spark, sentinel.resolve("store"))
  }

  test("knnMaintenance resumes the committed checkpoint: Seq-valued top-k " +
      "state decodes, neighborhoods match an uninterrupted run") {
    val fs = restored()
    knnPhase2.foreach(fs.append("knn", _))
    val resumed = drain(fs, "knn",
      sentinel.resolve("ckpt-knn").toString, "update")(knnFace)
    assert(resumed.nonEmpty, "resume emitted nothing")
    assert(resumed.forall(_.seq >= 2), s"state was reset: $resumed")
    val tmp = Files.createTempDirectory("ckpt-v12-knn-")
    val fsU = new SparkFactStore(SparkTestSession.spark, tmp)
    fsU.createStore("knn")
    (knnPhase1 ++ knnPhase2).foreach(fsU.append("knn", _))
    val full = drain(fsU, "knn", tmp.resolve("ckpt").toString, "update")(knnFace)
    def fin(rows: Seq[FactStateStreams.KnnUpdate]) =
      rows.groupBy(_.probeId).map { case (p, rs) =>
        val last = rs.maxBy(_.seq)
        p -> ((last.nSeen, last.neighborIds, last.neighborCos))
      }
    assert(fin(resumed) == fin(full),
      s"${fin(resumed)} vs ${fin(full)}")
    assert(fin(resumed).values.forall(_._1 ==
      (knnPhase1.size + knnPhase2.size).toLong))
  }

  test("tradeFlowCensus resumes the committed checkpoint: digit-string " +
      "BigInt sums decode and keep accumulating") {
    val fs = restored()
    flowPhase2.foreach(fs.append("flow", _))
    val resumed = drain(fs, "flow",
      sentinel.resolve("ckpt-flow").toString, "update")(flowFace)
    assert(resumed.nonEmpty, "resume emitted nothing")
    val fin = resumed.groupBy(r => (r.srcNation, r.dstNation))
      .map { case (p, rs) =>
        val last = rs.maxBy(_.seq); p -> ((last.nRows, last.flowE8))
      }
    assert(fin(("A", "B")) == ((3L, "7700")),
      s"cross-checkpoint pair did not accumulate: $fin")
    assert(fin(("E", "F")) == ((1L, "99")))
  }
}
