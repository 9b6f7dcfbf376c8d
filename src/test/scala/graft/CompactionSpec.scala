package graft

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.store.SparkFactStore

/** Log compaction: a checkpoint must be invisible to every read path and
  * preserve idempotency + position continuity; vacuum must actually
  * reclaim superseded files without breaking readers or subscribers. */
class CompactionSpec extends AnyFunSuite {

  private def newStore(): (SparkFactStore, String, Path) = {
    val root = Files.createTempDirectory("graft-compact-")
    val fs = new SparkFactStore(SparkTestSession.spark, root)
    fs.createStore("s")
    (fs, "s", root)
  }

  private def in(ft: String, subject: String = "SUBJ"): FactInput =
    FactInput(ft, subject, Array[Byte](1), tags = Map("t" -> ft))

  private def facts(r: FindResult): Seq[Fact] = r match {
    case FindResult.Found(fs) => fs
    case other => fail(s"$other")
  }

  test("reads are identical before and after compact (+ after more appends)") {
    val (fs, s, _) = newStore()
    (1 to 20).foreach(i => fs.append(s, in(s"T$i", s"subj-${i % 3}")))
    val before = facts(fs.findBySubject(s, "subj-1")).map(f => (f.position, f.factType))

    assert(fs.compact(s, rowsPerBucket = 8) == 20)
    val after = facts(fs.findBySubject(s, "subj-1")).map(f => (f.position, f.factType))
    assert(after == before)

    // appends continue with contiguous positions after the checkpoint
    fs.append(s, in("T21", "subj-1"))
    val extended = facts(fs.findBySubject(s, "subj-1"))
    assert(extended.last.position == 21L)
    assert(extended.map(f => (f.position, f.factType)).init == before)

    // tag queries + time range still see everything
    assert(facts(fs.findByTags(s, Map("t" -> "T7"))).size == 1)
    assert(facts(fs.findInTimeRange(s, TimeRange.unbounded)).size == 21)
  }

  test("idempotency keys survive compaction") {
    val (fs, s, _) = newStore()
    val req = AppendRequest(s, Seq(in("A")), idempotencyKey = "fixed")
    assert(fs.append(req).isInstanceOf[AppendResult.Appended])
    assert(fs.compact(s) == 1)
    assert(fs.append(req) == AppendResult.AlreadyApplied)
  }

  test("vacuum reclaims superseded commits and files; replay still complete") {
    val (fs, s, root) = newStore()
    (1 to 10).foreach(i => fs.append(s, in(s"T$i")))
    val storeDir = Files.list(root.resolve("stores")).iterator().next()
    def count(sub: String): Long = {
      val d = storeDir.resolve(sub)
      if (Files.exists(d)) Files.list(d).count() else 0L
    }
    assert(count("commits") == 10)
    assert(fs.compact(s, rowsPerBucket = 4, vacuum = true) == 10)
    assert(count("commits") == 0)
    assert(count("checkpoints") == 1)

    val Right(it) = fs.replay(s, ReplayStart.Beginning): @unchecked
    assert(it.flatten.map(_.factType).toSeq == (1 to 10).map(i => s"T$i"))

    // second compaction cycle: old checkpoint + dirs get vacuumed too
    (11 to 12).foreach(i => fs.append(s, in(s"T$i")))
    assert(fs.compact(s, rowsPerBucket = 4, vacuum = true) == 2)
    assert(count("checkpoints") == 1)
    val Right(it2) = fs.replay(s, ReplayStart.Beginning): @unchecked
    assert(it2.flatten.map(_.factType).toSeq == (1 to 12).map(i => s"T$i"))
  }

  test("compact on empty or missing store is a no-op") {
    val (fs, s, _) = newStore()
    assert(fs.compact(s) == 0)
    assert(fs.compact("missing") == 0)
  }

  test("conditional appends still evaluated correctly after compaction") {
    val (fs, s, _) = newStore()
    val id1 = fs.append(s, in("A", "x")) match {
      case AppendResult.Appended(ids, _) => ids.head
      case other => fail(s"$other")
    }
    fs.compact(s, vacuum = true)
    // ExpectedLastFact sees the compacted history
    assert(fs.append(AppendRequest(s, Seq(in("B", "x")),
      condition = AppendCondition.ExpectedLastFact("x", Some(id1))))
      .isInstanceOf[AppendResult.Appended])
    assert(fs.append(AppendRequest(s, Seq(in("C", "x")),
      condition = AppendCondition.ExpectedLastFact("x", Some(id1))))
      == AppendResult.AppendConditionViolated)
    // TagQueryBased probes span checkpoint + incremental commits
    assert(fs.append(AppendRequest(s, Seq(in("D", "y")),
      condition = AppendCondition.TagQueryBased(
        TagQuery(Seq(TagQueryItem.TagOnly(Map("t" -> "A")))))))
      == AppendResult.AppendConditionViolated)
  }
}
