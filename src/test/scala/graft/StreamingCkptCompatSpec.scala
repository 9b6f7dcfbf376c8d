package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.store.SparkFactStore
import graft.streaming.FactStateStreams.{ClosedInterval, HllUpdate}

/** Backward-compatibility gate for STREAMING CHECKPOINTS — the state-store
  * twin of FormatCompatSpec. A checkpoint generated at the round-11 state
  * shapes (StreamCkptFixtureGen: phase 1 processed, operator state
  * populated) is committed under src/test/resources; CURRENT code must
  * resume it, process phase 2, and produce exactly what an uninterrupted
  * run over both phases produces — proving the committed Encoder-encoded
  * state rows (HllState registers, OpenInterval) still decode.
  *
  * If this spec fails after editing a state case class, that edit orphans
  * every deployed checkpoint. The supported evolution policy (SURVEY §8):
  * state shapes are append-frozen — semantic changes get a NEW face (and
  * state name) beside the old one, or ship with an explicit migration
  * (drain the old checkpoint with old shapes, re-seed), after which this
  * fixture is regenerated in the same change. */
class StreamingCkptCompatSpec extends AnyFunSuite {
  import StreamCkptFixture._

  /** Restore the committed tree to the sentinel path it was generated at
    * (the file source's seen-files log holds absolute URIs). */
  private def restored(): SparkFactStore = {
    assert(Files.exists(resource), s"missing fixture $resource — run StreamCkptFixtureGen")
    deleteTree(sentinel)
    copyTree(resource, sentinel)
    new SparkFactStore(SparkTestSession.spark, sentinel.resolve("store"))
  }

  test("hllDistinct resumes the committed checkpoint: registers decode, " +
      "seq continues, final state matches an uninterrupted run") {
    val fs = restored()
    hllPhase2.foreach(fs.append("hll", _))
    val resumed = drain(fs, "hll", sentinel.resolve("ckpt-hll").toString, "update")(hllFace)
    assert(resumed.nonEmpty, "resume emitted nothing")
    // phase-1 facts must NOT re-deliver: every resumed emission's seq
    // continues past the committed state's (which processed >= 1 batch)
    assert(resumed.forall(_.seq >= 2), s"state was reset: $resumed")
    // uninterrupted truth over both phases, fresh store + checkpoint
    val tmp = Files.createTempDirectory("ckpt-compat-hll-")
    val fsU = new SparkFactStore(SparkTestSession.spark, tmp)
    fsU.createStore("hll")
    (hllPhase1 ++ hllPhase2).foreach(fsU.append("hll", _))
    val full = drain(fsU, "hll", tmp.resolve("ckpt").toString, "update")(hllFace)
    def finalPer(rows: Seq[HllUpdate]): Map[String, (Long, Long, Long)] =
      rows.groupBy(_.lang).map { case (l, rs) =>
        val last = rs.maxBy(_.seq); l -> ((last.present, last.estE4, last.regsFnv))
      }
    assert(finalPer(resumed) == finalPer(full),
      "final registers diverge from the uninterrupted run")
  }

  test("stateIntervals resumes the committed checkpoint: the open interval " +
      "decodes and closes with its pre-checkpoint start and full count") {
    val fs = restored()
    scdPhase2.foreach(fs.append("scd", _))
    val resumed = drain(fs, "scd", sentinel.resolve("ckpt-scd").toString, "append")(scdFace)
    def key(c: ClosedInterval) = (c.userId, c.state, c.validFromUs, c.validToUs, c.nEvents)
    // user 1's run of 'a' (2 events, both in the committed state) closes at
    // the phase-2 'b'; user 2's run straddles the checkpoint boundary
    assert(resumed.map(key).toSet == Set(
      (1L, "a", T0, T0 + 2000, 2L),
      (2L, "a", T0 + 500, T0 + 3000, 2L)),
      s"committed open-interval state did not decode: $resumed")
  }
}
