package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Spark-only scale probe: run a named query list against one or more
  * scale-point dirs, recording wall clock plus the physical costs the
  * wall can hide — shuffle bytes written/read and memory/disk spill —
  * per (query, dir). No oracle: the point is plan behavior under 10×/100×
  * volume (superlinear wall, shuffle blow-ups, ANSI overflows), the bug
  * classes every previous new scale point has caught (sf0.1 int64
  * overflow r6, K-floor geometry r10, 10× bin-sum overflow r11).
  *
  * Usage: runMain graft.ScaleProbe <dir> [dir2 ...]
  * Env:   SPARK_GRAFT_ONLY=q1,q2   query filter (default: the heavy set)
  *        SPARK_GRAFT_CPUS         local parallelism (default 32)
  *
  * Output: one `[probe]` line per (dir, query) with wall/shuffle/spill,
  * then a JSON line per dir. Cross-dir ratio analysis is the caller's
  * job (scripts/scale_probe.md documents the round-12 run). */
object ScaleProbe {

  /** The heavy tail by the round-11 idle ledger, plus the overflow
    * sentinel (part_revenue_concentration carries the corpus-sized
    * decimal sums that first overflowed at a new scale point). */
  val DefaultQueries: Seq[String] = Seq(
    "text_lm_bigram_surprisal", "graph_components", "text_lm_surprisal",
    "text_bigram_lift", "bpe_train_merges", "profile_columns",
    "ann_recall_eval", "supplier_scorecard", "events_transition_rank",
    "bpe_encode_census", "dedup_edit_distance", "text_hll_set_algebra",
    "corpus_pipeline_v3", "text_doc_keywords", "training_data_factory",
    "part_revenue_concentration")

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ScaleProbe <sfDir> [sfDir2 ...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // task-metric accumulation across each query's jobs
    val shufWrite = new AtomicLong; val shufRead = new AtomicLong
    val memSpill = new AtomicLong; val diskSpill = new AtomicLong
    val peakMem = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          memSpill.addAndGet(m.memoryBytesSpilled)
          diskSpill.addAndGet(m.diskBytesSpilled)
          peakMem.accumulateAndGet(m.peakExecutionMemory, math.max)
        }
      }
    })

    val names = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).toSeq).getOrElse(DefaultQueries)
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")

    // engine warm-up
    spark.range(1000000).selectExpr("sum(id)").collect()

    args.foreach { dir =>
      val rows = names.map { name =>
        Seq(shufWrite, shufRead, memSpill, diskSpill, peakMem).foreach(_.set(0L))
        val t0 = System.nanoTime()
        val res =
          try Right(SparkEntry.queries(name)(spark, dir).count())
          catch { case e: Throwable => Left(e.toString.take(200)) }
        val wall = (System.nanoTime() - t0) / 1e9
        graft.operators.CacheScope.releaseAll()
        // listener events are async; give the bus a beat to drain before
        // snapshotting the counters (metric skew of a few tasks is noise
        // at probe granularity)
        Thread.sleep(300)
        val line = res match {
          case Right(n) =>
            f"""{"q":"$name","wall_s":$wall%.2f,"rows":$n,"shuf_write_mb":${shufWrite.get / 1e6}%.1f,"shuf_read_mb":${shufRead.get / 1e6}%.1f,"spill_mem_mb":${memSpill.get / 1e6}%.1f,"spill_disk_mb":${diskSpill.get / 1e6}%.1f,"peak_task_mem_mb":${peakMem.get / 1e6}%.1f}"""
          case Left(err) =>
            s"""{"q":"$name","error":${"\"" + err.replace("\\", "\\\\").replace("\"", "'") + "\""}}"""
        }
        System.err.println(f"[probe] $dir $name%-28s ${res.fold("ERR " + _, n => f"$wall%7.2f s  rows=$n")}")
        line
      }
      println(s"""{"dir":"$dir","cpus":$cpus,"results":[${rows.mkString(",")}]}""")
    }
    spark.stop()
  }
}
