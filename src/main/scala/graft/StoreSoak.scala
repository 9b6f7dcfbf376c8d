package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

import graft.core._
import graft.store.SparkFactStore

/** Sustained-ingest soak: concurrent appenders (plain + conditional) + a
  * live subscriber + auto-compaction, for `args(0)` seconds (default 600).
  * The reference's k6 latency envelope is a 30-second burst
  * (factstore-io/factstore k6/single_append_with_condition.js:10-15); a
  * durable engine has to hold that p90 for MINUTES across compaction
  * boundaries, with a tailing reader, without missing or duplicating a
  * position. Prints one JSON line:
  *   {"windows":[{"t":0,"n":...,"p50_ms":...,"p90_ms":...}...],
  *    "appends":N,"facts":N,"checkpoint_seq":K,"cond_appends":N,
  *    "sub_gap_free":true,"sub_facts":N,"p90_flat_ratio":r}
  * Gap-freedom is asserted IN-PROCESS (the subscriber walks positions
  * 1,2,3,… and any skip or repeat aborts the run), so a green soak is
  * itself the correctness witness, not just a timing report. */
object StoreSoak {
  private val WindowSec = 30

  def main(args: Array[String]): Unit = {
    val durationSec = args.headOption.map(_.toInt).getOrElse(600)
    val nAppenders = if (args.length > 1) args(1).toInt else 4
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = Files.createTempDirectory("graft-soak-")
    // low threshold => many compaction cycles inside the soak window
    val store = new SparkFactStore(spark, root, autoCompactEvery = 128)
    require(store.createStore("soak").isInstanceOf[CreateStoreResult.Created])

    val stop = new AtomicBoolean(false)
    val appends = new AtomicLong(0)
    val facts = new AtomicLong(0)
    val condAppends = new AtomicLong(0)
    // (windowIdx, latencyNanos) samples; drained once at the end
    val samples = new ConcurrentLinkedQueue[(Int, Long)]()
    val t0 = System.nanoTime()
    def window(): Int = ((System.nanoTime() - t0) / 1e9 / WindowSec).toInt

    // --- subscriber: positions must arrive as exactly 1,2,3,… -------------
    val subSeen = new AtomicLong(0)
    val subOk = new AtomicBoolean(true)
    val sub = store.subscribe("soak", StartPosition.Beginning, batchSize = 500)
      .fold(e => sys.error(e.toString), identity)
    val subThread = new Thread(() => {
      var expect = 1L
      try while (sub.hasNext) {
        sub.next().foreach { f =>
          if (f.position != expect) {
            subOk.set(false)
            sys.error(s"subscriber gap/dup: got ${f.position}, expected $expect")
          }
          expect += 1
          subSeen.set(expect - 1)
        }
      } catch { case _: InterruptedException => case _: RuntimeException => }
    }, "soak-subscriber")
    subThread.setDaemon(true)
    subThread.start()

    // --- appenders --------------------------------------------------------
    val appenders = (0 until nAppenders).map { a =>
      val t = new Thread(() => {
        val subject = s"writer-$a"
        var lastId: Option[String] = None
        var i = 0
        while (!stop.get()) {
          val batch =
            if (i % 17 == 0) Seq.tabulate(4)(j => FactInput("SOAK_BATCH", subject,
              s"b$i-$j".getBytes(UTF_8), tags = Map("w" -> subject)))
            else Seq(FactInput("SOAK_FACT", subject,
              s"p$i".getBytes(UTF_8), tags = Map("w" -> subject)))
          // every 5th append rides the conditional path: this thread is the
          // only writer for its subject, so ExpectedLastFact must hold —
          // a violation would mean the engine lost/reordered its own chain
          val cond: AppendCondition =
            if (i % 5 == 0 && lastId.isDefined)
              AppendCondition.ExpectedLastFact(subject, lastId)
            else AppendCondition.None
          val s = System.nanoTime()
          store.append(AppendRequest("soak", batch, condition = cond)) match {
            case AppendResult.Appended(ids, _) =>
              samples.add((window(), System.nanoTime() - s))
              appends.incrementAndGet(); facts.addAndGet(ids.size)
              if (cond != AppendCondition.None) condAppends.incrementAndGet()
              lastId = Some(ids.last)
            case other => sys.error(s"append failed mid-soak: $other")
          }
          i += 1
        }
      }, s"soak-appender-$a")
      t.start(); t
    }

    Thread.sleep(durationSec * 1000L)
    stop.set(true)
    appenders.foreach(_.join(60000))
    // let the subscriber drain to the final head
    val head = facts.get()
    val deadline = System.nanoTime() + 120e9.toLong
    while (subSeen.get() < head && System.nanoTime() < deadline) Thread.sleep(100)
    sub.close()

    import scala.jdk.CollectionConverters._
    val bySample = samples.asScala.toSeq.groupBy(_._1)
    def pct(xs: Seq[Long], p: Double): Double =
      if (xs.isEmpty) 0.0 else {
        val s = xs.sorted
        s(math.min(s.size - 1, math.ceil(p * s.size).toInt - 1)) / 1e6
      }
    val windows = bySample.keys.toSeq.sorted.map { w =>
      val lat = bySample(w).map(_._2)
      (w, lat.size, pct(lat, 0.5), pct(lat, 0.9))
    }
    // completed (full-length) windows only — the tail window is partial
    val fullWindows = windows.dropRight(1) match {
      case Seq() => windows
      case ws => ws
    }
    val p90s = fullWindows.map(_._4).filter(_ > 0)
    val flatRatio = if (p90s.size < 2) 1.0 else p90s.max / p90s.min
    val ckpts = store.storeStats("soak").flatMap(_.checkpointSeq).getOrElse(0L)
    val wj = windows.map { case (w, n, p50, p90) =>
      f"""{"t":${w * WindowSec},"n":$n,"p50_ms":$p50%.1f,"p90_ms":$p90%.1f}"""
    }.mkString("[", ",", "]")
    println(f"""{"windows":$wj,"appends":${appends.get()},"facts":${facts.get()},""" +
      f""""checkpoint_seq":$ckpts,"cond_appends":${condAppends.get()},""" +
      f""""sub_gap_free":${subOk.get() && subSeen.get() == head},""" +
      f""""sub_facts":${subSeen.get()},"p90_flat_ratio":$flatRatio%.2f}""")
    require(subOk.get(), "subscriber saw a gap or duplicate position")
    require(subSeen.get() == head, s"subscriber drained ${subSeen.get()} of $head")
    spark.stop()
  }
}
