package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.store.{LocalParquet, SparkFactStore}

/** Replay/subscribe must page by position windows — a replay from Beginning
  * over a store larger than one batch may never materialize the whole range
  * on the driver (VERDICT r1 item 4). Observability: LocalParquet.scanCount
  * ticks once per local window read, so incremental paging shows up as one
  * scan per consumed batch, interleaved with consumption — not one up-front
  * scan of everything. */
class ReplayPagingSpec extends AnyFunSuite {

  private def newStore() =
    new SparkFactStore(SparkTestSession.spark, Files.createTempDirectory("graft-page-"))

  private def seed(fs: SparkFactStore, store: String, n: Int): Unit = {
    fs.createStore(store)
    (1 to n).foreach { i =>
      fs.append(store, FactInput("E", s"S:${i % 7}", s"p$i".getBytes("UTF-8")))
    }
  }

  test("replay pages by bounded read-windows, lazily (batches served from the window buffer)") {
    val fs = newStore()
    seed(fs, "paged", 25)
    val Right(it) = fs.replay("paged", ReplayStart.Beginning, batchSize = 10): @unchecked

    val before = LocalParquet.scanCount.get()
    assert(it.hasNext) // iterator constructed; hasNext is metadata-only
    assert(LocalParquet.scanCount.get() == before, "replay() must not scan before next()")

    val b1 = it.next()
    val afterFirst = LocalParquet.scanCount.get()
    assert(b1.map(_.position) == (1L to 10L))
    assert(afterFirst == before + 1, "first next() = exactly one window scan")

    // 25 facts fit one read-window: later batches come from the buffer
    // (bounded by the window size), with NO further scans
    val b2 = it.next()
    assert(b2.map(_.position) == (11L to 20L))
    val b3 = it.next()
    assert(b3.map(_.position) == (21L to 25L))
    assert(LocalParquet.scanCount.get() == afterFirst, "in-window batches re-scan nothing")
    assert(!it.hasNext)
  }

  test("replay head is pinned even though windows are read lazily") {
    val fs = newStore()
    seed(fs, "pinned", 12)
    val Right(it) = fs.replay("pinned", ReplayStart.Beginning, batchSize = 5): @unchecked
    assert(it.next().map(_.position) == (1L to 5L))
    // appends landing mid-drain are excluded: head was pinned at replay()
    fs.append("pinned", FactInput("LATE", "S:9", Array[Byte]()))
    assert(it.toSeq.flatten.map(_.position) == (6L to 12L))
  }

  test("replay and subscribe read Spark-written (required-schema) bulk files locally") {
    // bulkAppend writes through Spark: non-nullable columns become
    // `required` in parquet — the local parquet-mr path must read them
    // (projection is derived from each file's own footer schema).
    val spark = SparkTestSession.spark
    val fs = newStore()
    fs.createStore("bulk")
    val df = spark.range(50).selectExpr(
      "'B' AS fact_type", "concat('s-', id % 5) AS subject",
      "cast(null as binary) AS payload_data", "cast(null as string) AS payload_format",
      "cast(null as string) AS payload_schema",
      "map('k', cast(id as string)) AS metadata", "map('m', 'v') AS tags")
    fs.bulkAppend("bulk", df)
    val Right(it) = fs.replay("bulk", ReplayStart.Beginning, batchSize = 20): @unchecked
    val all = it.toSeq.flatten
    assert(all.map(_.position) == (1L to 50L))
    assert(all.forall(_.factType == "B"))
    val Right(sub) = fs.subscribe("bulk", StartPosition.Beginning, batchSize = 20): @unchecked
    try assert(sub.next().map(_.position) == (1L to 20L))
    finally sub.close()
  }

  test("subscribe catch-up reads one window per batch, not the whole gap") {
    val fs = newStore()
    seed(fs, "gap", 30)
    val Right(sub) = fs.subscribe("gap", StartPosition.Beginning, batchSize = 10): @unchecked
    try {
      val before = LocalParquet.scanCount.get()
      val b1 = sub.next()
      assert(b1.map(_.position) == (1L to 10L))
      assert(LocalParquet.scanCount.get() == before + 1,
        "catch-up must scan exactly the first window, not the 30-fact gap")
      assert(sub.next().map(_.position) == (11L to 20L))
      assert(sub.next().map(_.position) == (21L to 30L))
    } finally sub.close()
  }
}
