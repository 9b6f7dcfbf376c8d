package graft

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.store.SparkFactStore

/** Two SparkFactStore handles over the same root simulate two PROCESSES:
  * the in-JVM write lock does not serialize them, so correctness rests
  * entirely on the commit-file CAS + retry loop — the property that
  * replaces FoundationDB's serializable transactions. */
class CrossInstanceSpec extends AnyFunSuite {

  test("concurrent appends from two engine instances: contiguous positions, no loss") {
    val root = Files.createTempDirectory("graft-xproc-")
    val a = new SparkFactStore(SparkTestSession.spark, root)
    val b = new SparkFactStore(SparkTestSession.spark, root)
    a.createStore("s")
    val perWriter = 20
    val pool = Executors.newFixedThreadPool(2)
    val done = new CountDownLatch(2)
    Seq(a, b).zipWithIndex.foreach { case (fs, w) =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          try (1 to perWriter).foreach { i =>
            fs.append("s", FactInput(s"W$w-$i", s"writer-$w", Array[Byte](1))) match {
              case _: AppendResult.Appended => ()
              case other => fail(s"append failed: $other")
            }
          } finally done.countDown()
        }
      })
    }
    assert(done.await(300, TimeUnit.SECONDS))
    pool.shutdown()
    val FindResult.Found(all) = a.findInTimeRange("s", TimeRange.unbounded): @unchecked
    assert(all.size == 2 * perWriter)
    assert(all.map(_.position).sorted == (1L to 2L * perWriter))
    assert(all.map(_.id).distinct.size == 2 * perWriter)
    // the other handle sees the identical committed log
    val FindResult.Found(all2) = b.findInTimeRange("s", TimeRange.unbounded): @unchecked
    assert(all2.map(f => (f.position, f.id)).sortBy(_._1) ==
      all.map(f => (f.position, f.id)).sortBy(_._1))
  }

  test("exactly one winner under ExpectedLastFact across instances") {
    val root = Files.createTempDirectory("graft-xproc2-")
    val engines = (1 to 4).map(_ => new SparkFactStore(SparkTestSession.spark, root))
    engines.head.createStore("s")
    val baseId = engines.head.append("s", FactInput("BASE", "subj", Array[Byte](1))) match {
      case AppendResult.Appended(ids, _) => ids.head
      case other => fail(s"$other")
    }
    val pool = Executors.newFixedThreadPool(engines.size)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[AppendResult]()
    val done = new CountDownLatch(engines.size)
    engines.foreach { fs =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          try results.add(fs.append(AppendRequest("s",
            Seq(FactInput("NEXT", "subj", Array[Byte](1))),
            condition = AppendCondition.ExpectedLastFact("subj", Some(baseId)))))
          finally done.countDown()
        }
      })
    }
    assert(done.await(300, TimeUnit.SECONDS))
    pool.shutdown()
    import scala.jdk.CollectionConverters._
    val rs = results.asScala.toSeq
    assert(rs.count(_.isInstanceOf[AppendResult.Appended]) == 1,
      s"exactly one winner expected, got: $rs")
    assert(rs.count(_ == AppendResult.AppendConditionViolated) == engines.size - 1)
  }
}
