package graft

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.store.SparkFactStore

/** Structured Streaming over the store: the committed-only `stream/` link
  * directory makes the fact log tailable by Spark's file source. */
class SparkStreamingSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark

  private def newStore(): (SparkFactStore, String) = {
    val fs = new SparkFactStore(spark, Files.createTempDirectory("graft-stream-"))
    fs.createStore("s")
    (fs, "s")
  }

  private def in(ft: String, subject: String = "SUBJ"): FactInput =
    FactInput(ft, subject, Array[Byte](1), tags = Map("k" -> "v"))

  test("replayStream with Trigger.AvailableNow drains exactly the committed facts") {
    val (fs, s) = newStore()
    (1 to 5).foreach(i => fs.append(s, in(s"T$i")))
    val Right(df) = fs.replayStream(s): @unchecked
    val seen = new ConcurrentLinkedQueue[(Long, String)]()
    val q = df.writeStream
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.select("position", "fact_type").collect()
          .foreach(r => seen.add((r.getLong(0), r.getString(1))))
      }
      .start()
    q.awaitTermination(60000)
    import scala.jdk.CollectionConverters._
    assert(seen.asScala.toSeq.sorted == (1 to 5).map(i => (i.toLong, s"T$i")))
  }

  test("subscribeStream(After) prunes up to the cursor; live appends arrive") {
    val (fs, s) = newStore()
    val ids = (1 to 3).map { i =>
      fs.append(s, in(s"T$i")) match {
        case AppendResult.Appended(fids, _) => fids.head
        case other => fail(s"$other")
      }
    }
    val Right(df) = fs.subscribeStream(s, StartPosition.After(ids(1))): @unchecked
    val seen = new ConcurrentLinkedQueue[String]()
    val q = df.writeStream
      .trigger(Trigger.ProcessingTime(100))
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.select("fact_type").collect().foreach(r => seen.add(r.getString(0)))
      }
      .start()
    try {
      // catch-up part: only T3 (cursor is after T2)
      val deadline = System.currentTimeMillis() + 30000
      while (seen.size < 1 && System.currentTimeMillis() < deadline) Thread.sleep(100)
      fs.append(s, in("T4"))
      while (seen.size < 2 && System.currentTimeMillis() < deadline) Thread.sleep(100)
    } finally q.stop()
    import scala.jdk.CollectionConverters._
    assert(seen.asScala.toSeq.sorted == Seq("T3", "T4"))
  }

  test("checkpointed restart resumes exactly where the last run stopped") {
    val (fs, s) = newStore()
    (1 to 3).foreach(i => fs.append(s, in(s"T$i")))
    val ckpt = Files.createTempDirectory("graft-ckpt-").toString
    def drain(): Seq[String] = {
      val Right(df) = fs.subscribeStream(s): @unchecked
      val seen = new ConcurrentLinkedQueue[String]()
      val q = df.writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.select("fact_type").collect().foreach(r => seen.add(r.getString(0)))
        }
        .start()
      q.awaitTermination(60000)
      import scala.jdk.CollectionConverters._
      seen.asScala.toSeq.sorted
    }
    assert(drain() == Seq("T1", "T2", "T3"))
    (4 to 5).foreach(i => fs.append(s, in(s"T$i")))
    // second run from the same checkpoint: ONLY the new facts
    assert(drain() == Seq("T4", "T5"))
  }

  test("streaming errors surface before any query starts") {
    val (fs, s) = newStore()
    assert(fs.subscribeStream("missing", StartPosition.Beginning) ==
      Left(StreamError.StoreNotFound))
    assert(fs.subscribeStream(s, StartPosition.After("nope")) ==
      Left(StreamError.FactIdNotFound("nope")))
  }

  test("mapGroupsWithState: per-subject running projection over the fact stream") {
    val (fs, s) = newStore()
    fs.append(s, in("A", "x")); fs.append(s, in("B", "x")); fs.append(s, in("C", "y"))
    val Right(df) = fs.subscribeStream(s): @unchecked
    val states = graft.streaming.FactStateStreams.subjectStates(spark, df)
    val seen = new ConcurrentLinkedQueue[(String, Long, String)]()
    val q = states.writeStream
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[graft.streaming.FactStateStreams.SubjectState], _: Long) =>
        batch.collect().foreach(st => seen.add((st.subject, st.nFacts, st.lastType)))
      }
      .start()
    q.awaitTermination(60000)
    import scala.jdk.CollectionConverters._
    val last = seen.asScala.groupBy(_._1).view.mapValues(_.maxBy(_._2)).toMap
    assert(last("x") == ("x", 2L, "B"))
    assert(last("y") == ("y", 1L, "C"))
  }

  test("streaming exact dedup: only the first occurrence per content hash is emitted") {
    val (fs, s) = newStore()
    fs.append(s, FactInput("A", "x", "p1".getBytes("UTF-8")))
    fs.append(s, FactInput("B", "x", "p2".getBytes("UTF-8")))
    fs.append(s, FactInput("C", "x", "p1".getBytes("UTF-8"))) // dup of p1
    val Right(df) = fs.subscribeStream(s): @unchecked
    val deduped = graft.streaming.FactStateStreams.firstSeenByContent(spark, df)
    val seen = new ConcurrentLinkedQueue[Long]()
    val q = deduped.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(100))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[graft.streaming.FactStateStreams.FirstSeen], _: Long) =>
        batch.collect().foreach(r => seen.add(r.position))
      }
      .start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      while (seen.size < 2 && System.currentTimeMillis() < deadline) Thread.sleep(100)
      // live phase: another p2 duplicate is dropped, fresh p3 is emitted
      fs.append(s, FactInput("D", "y", "p2".getBytes("UTF-8")))
      fs.append(s, FactInput("E", "y", "p3".getBytes("UTF-8")))
      while (seen.size < 3 && System.currentTimeMillis() < deadline) Thread.sleep(100)
    } finally q.stop()
    import scala.jdk.CollectionConverters._
    assert(seen.asScala.toSeq.sorted == Seq(1L, 2L, 5L)) // first p1, first p2, p3
  }

  test("watermarked tumbling-window aggregation over a live subscription") {
    val (fs, s) = newStore()
    (1 to 6).foreach(i => fs.append(s, in(if (i % 2 == 0) "EVEN" else "ODD")))
    val Right(df) = fs.subscribeStream(s): @unchecked
    val agg = df
      .withWatermark("appended_at", "10 seconds")
      .groupBy(window(col("appended_at"), "1 minute"), col("fact_type"))
      .agg(count(lit(1)).as("n"))
    val seen = new ConcurrentLinkedQueue[(String, Long)]()
    val q = agg.writeStream
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.select("fact_type", "n").collect()
          .foreach(r => seen.add((r.getString(0), r.getLong(1))))
      }
      .start()
    q.awaitTermination(60000)
    import scala.jdk.CollectionConverters._
    val byType = seen.asScala.groupMapReduce(_._1)(_._2)(math.max)
    assert(byType == Map("EVEN" -> 3L, "ODD" -> 3L))
  }

  test("session windows over a live subscription group facts by activity gaps") {
    // session_window: dynamic-length windows that close after a quiet gap —
    // the streaming analogue of the batch events_sessionize operator
    val (fs, s) = newStore()
    (1 to 4).foreach(i => fs.append(s, in(s"T$i", "sess-subj")))
    val Right(df) = fs.subscribeStream(s): @unchecked
    val agg = df
      .withWatermark("appended_at", "10 seconds")
      .groupBy(session_window(col("appended_at"), "30 seconds"), col("subject"))
      .agg(count(lit(1)).as("n"))
    val seen = new ConcurrentLinkedQueue[(String, Long)]()
    val q = agg.writeStream
      .outputMode("complete") // session windows reject update mode
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.select("subject", "n").collect()
          .foreach(r => seen.add((r.getString(0), r.getLong(1))))
      }
      .start()
    q.awaitTermination(60000)
    import scala.jdk.CollectionConverters._
    // all four facts appended within the 30 s gap -> exactly one session
    val byKey = seen.asScala.groupMapReduce(_._1)(_._2)(math.max)
    assert(byKey == Map("sess-subj" -> 4L))
  }

  test("stream-stream join: two stores' subscriptions correlate by subject within a time bound") {
    // the remaining Structured Streaming operator class: watermarked
    // stream-stream inner join — e.g. correlating an order stream with a
    // shipment stream per subject; state on both sides is bounded by the
    // watermark + time-range condition
    val fs = new SparkFactStore(spark, Files.createTempDirectory("graft-ssj-"))
    fs.createStore("orders")
    fs.createStore("ships")
    Seq("s1", "s2", "s3").foreach(sub => fs.append("orders", in("ORDER_PLACED", sub)))
    Seq("s2", "s3", "s4").foreach(sub => fs.append("ships", in("ORDER_SHIPPED", sub)))
    val Right(orders) = fs.subscribeStream("orders"): @unchecked
    val Right(ships) = fs.subscribeStream("ships"): @unchecked
    val left = orders.withWatermark("appended_at", "10 seconds")
      .selectExpr("subject", "appended_at AS ts_o")
    val right = ships.withWatermark("appended_at", "10 seconds")
      .selectExpr("subject AS subject_s", "appended_at AS ts_s")
    val joined = left.join(right,
      expr("""subject = subject_s AND
              ts_s BETWEEN ts_o - INTERVAL 1 MINUTE AND ts_o + INTERVAL 1 MINUTE"""))
    val seen = new ConcurrentLinkedQueue[String]()
    val q = joined.writeStream
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.select("subject").collect().foreach(r => seen.add(r.getString(0)))
      }
      .start()
    q.awaitTermination(120000)
    import scala.jdk.CollectionConverters._
    assert(seen.asScala.toSeq.sorted == Seq("s2", "s3")) // intersection only
  }

  test("store replication: subscribe -> foreachBatch re-append mirrors one store into another") {
    // the event-forwarding pattern: a subscription drained into a second
    // store via idempotent per-batch appends — micro-batch id as the
    // idempotency key makes foreachBatch's at-least-once delivery
    // exactly-once at the store boundary
    val fs = new SparkFactStore(spark, Files.createTempDirectory("graft-repl-"))
    fs.createStore("primary")
    fs.createStore("mirror")
    (1 to 5).foreach(i => fs.append("primary", in(s"T$i", s"subj-$i")))
    val Right(df) = fs.replayStream("primary"): @unchecked
    val q = df.writeStream
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val inputs = batch.select("fact_type", "subject", "payload_data")
          .collect()
          .map(r => FactInput(r.getString(0), r.getString(1), r.getAs[Array[Byte]](2)))
        if (inputs.nonEmpty) {
          val res = fs.append(AppendRequest("mirror", inputs.toIndexedSeq,
            idempotencyKey = s"repl-batch-$batchId"))
          assert(res.isInstanceOf[AppendResult.Appended] ||
            res == AppendResult.AlreadyApplied)
        }
        ()
      }
      .start()
    q.awaitTermination(60000)
    val mirrored = fs.findInTimeRange("mirror", TimeRange.unbounded) match {
      case FindResult.Found(facts) => facts
      case other => fail(s"mirror read failed: $other")
    }
    assert(mirrored.map(_.factType).sorted == (1 to 5).map(i => s"T$i"))
  }

  test("streaming CMS: bounded cell state tracks a hot subject across batches") {
    val (fs, s) = newStore()
    (1 to 6).foreach(_ => fs.append(s, in("T", "hot")))
    Seq("a", "b", "c").foreach(sub => fs.append(s, in("T", sub)))
    val Right(df) = fs.subscribeStream(s): @unchecked
    val cells = graft.streaming.FactStateStreams.hotSubjectCells(spark, df)
    // latest count per (depth, cell) — Update-mode emissions overwrite
    val latest = new java.util.concurrent.ConcurrentHashMap[(Long, Long), Long]()
    val q = cells.writeStream
      .outputMode("update")
      .trigger(Trigger.ProcessingTime(100))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[graft.streaming.FactStateStreams.CmsCell], _: Long) =>
        batch.collect().foreach(c => latest.put((c.depth, c.cell), c.n))
      }
      .start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      def massOk = {
        import scala.jdk.CollectionConverters._
        val byDepth = latest.asScala.groupBy(_._1._1).view.mapValues(_.values.sum)
        (0L to 3L).forall(d => byDepth.getOrElse(d, 0L) == 9L)
      }
      while (!massOk && System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(massOk, s"per-depth mass never reached 9: $latest")
    } finally q.stop()
    // the hot subject's probed cells each hold at least its true count
    val hotHash = spark.sql("SELECT char_hash('hot') AS h").collect()(0).getLong(0)
    (0 until graft.operators.Sketches.depthCount).foreach { i =>
      val cell = graft.operators.Sketches.cellOf(i, hotHash)
      val n = latest.getOrDefault((i.toLong, cell), 0L)
      assert(n >= 6L, s"depth $i cell $cell holds $n < 6")
    }
    // bounded state: never more cells than facts could touch
    assert(latest.size <= 9 * 4)
  }
}
