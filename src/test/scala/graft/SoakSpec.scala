package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.store.SparkFactStore

/** Bounded in-suite twin of the `graft.StoreSoak` harness: concurrent
  * appenders (plain + self-chained ExpectedLastFact) race a LIVE
  * subscriber while auto-compaction churns underneath (threshold 16 →
  * many checkpoint cycles inside the test). The subscriber must observe
  * positions as exactly 1,2,3,… — a checkpoint swap that dropped,
  * duplicated, or reordered a position fails here, not in production.
  * The full-length (10-minute) run is `sbt "runMain graft.StoreSoak"`;
  * its latest numbers live in BENCH_STORE.md. */
class SoakSpec extends AnyFunSuite {

  test("live subscriber sees gap-free positions under concurrent appends + compaction") {
    val root = Files.createTempDirectory("graft-soak-spec-")
    val store = new SparkFactStore(SparkTestSession.spark, root, autoCompactEvery = 16)
    assert(store.createStore("soak").isInstanceOf[CreateStoreResult.Created])

    val perWriter = 40
    val nWriters = 3
    val facts = new AtomicLong(0)
    val failed = new AtomicBoolean(false)

    val subSeen = new AtomicLong(0)
    val subOk = new AtomicBoolean(true)
    val sub = store.subscribe("soak", StartPosition.Beginning, batchSize = 64)
      .fold(e => fail(e.toString), identity)
    val subThread = new Thread(() => {
      var expect = 1L
      try while (sub.hasNext) {
        sub.next().foreach { f =>
          if (f.position != expect) subOk.set(false)
          expect += 1
          subSeen.set(expect - 1)
        }
      } catch { case _: Throwable => }
    }, "soak-spec-subscriber")
    subThread.setDaemon(true)
    subThread.start()

    val writers = (0 until nWriters).map { a =>
      val t = new Thread(() => {
        val subject = s"writer-$a"
        var lastId: Option[String] = None
        try (0 until perWriter).foreach { i =>
          val batch =
            if (i % 13 == 0) Seq.tabulate(3)(j =>
              FactInput("SOAK_BATCH", subject, s"b$i-$j".getBytes(UTF_8)))
            else Seq(FactInput("SOAK_FACT", subject, s"p$i".getBytes(UTF_8)))
          val cond: AppendCondition =
            if (i % 5 == 0 && lastId.isDefined)
              AppendCondition.ExpectedLastFact(subject, lastId)
            else AppendCondition.None
          store.append(AppendRequest("soak", batch, condition = cond)) match {
            case AppendResult.Appended(ids, _) =>
              facts.addAndGet(ids.size); lastId = Some(ids.last)
            case other => failed.set(true); sys.error(s"append: $other")
          }
        } catch { case _: Throwable => failed.set(true) }
      }, s"soak-spec-writer-$a")
      t.start(); t
    }
    writers.foreach(_.join(300000))
    assert(!failed.get(), "an appender failed mid-soak")

    val head = facts.get()
    val deadline = System.nanoTime() + 60e9.toLong
    while (subSeen.get() < head && System.nanoTime() < deadline) Thread.sleep(50)
    sub.close()
    subThread.join(10000)

    assert(subOk.get(), "subscriber saw a gap or duplicate position")
    assert(subSeen.get() == head, s"subscriber drained ${subSeen.get()} of $head")
    // the soak must actually have crossed compaction boundaries
    val stats = store.storeStats("soak").get
    assert(stats.checkpointSeq.exists(_ >= 16),
      s"compaction never ran during the soak: $stats")
    assert(stats.nFacts == head)
    // replay after the dust settles agrees with the live tail
    val replayed = store.replay("soak", ReplayStart.Beginning)
      .fold(e => fail(e.toString), _.flatten.map(_.position).toSeq)
    assert(replayed == (1L to head))
  }
}
