package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.core._
import graft.store.{SparkFactStore, Timestamps}

/** The DataSource V2 surface: `spark.read.format("graft")` must see exactly
  * what the facade sees (same snapshot rules, all 11 columns byte-equal,
  * across plain appends, bulk-append directories, and compacted
  * checkpoints), prune files from commit metadata when position/time
  * filters are pushed, prune columns into the parquet read schema, and
  * tail the commit log as a micro-batch stream with seq offsets. */
class GraftDataSourceSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark

  private def freshStore(): (SparkFactStore, String, String) = {
    val root = Files.createTempDirectory("graft-dsv2-")
    val fs = new SparkFactStore(spark, root)
    val name = s"dsv2-${java.util.UUID.randomUUID().toString.take(8)}"
    assert(fs.createStore(name).isInstanceOf[CreateStoreResult.Created])
    (fs, root.toString, name)
  }

  private def read(root: String, store: String) =
    spark.read.format("graft").option("root", root).option("store", store).load()

  test("batch read equals the facade view across appends, batch appends, " +
      "and compaction — all 11 columns") {
    val (fs, root, name) = freshStore()
    (1 to 5).foreach { i =>
      assert(fs.append(name, FactInput(s"T$i", s"subj-${i % 2}",
        Array[Byte](i.toByte, (i + 1).toByte),
        payloadFormat = if (i % 2 == 0) Some("JSON") else None,
        payloadSchema = if (i == 3) Some("v1") else None,
        metadata = if (i == 2) Map("m" -> "x") else Map.empty,
        tags = Map("k" -> s"v$i"))).isInstanceOf[AppendResult.Appended])
    }
    // batch append -> a multi-part directory file ref
    assert(fs.append(AppendRequest(name, (6 to 9).map(i =>
      FactInput(s"T$i", "bulk", Array[Byte](i.toByte), tags = Map("b" -> "1")))))
      .isInstanceOf[AppendResult.Appended])
    // compaction -> checkpoint with bucketed files + entry indexes
    fs.compact(name)
    assert(fs.append(name, FactInput("T10", "after", Array[Byte](10)))
      .isInstanceOf[AppendResult.Appended])

    val FindResult.Found(facts) = fs.findInTimeRange(name, TimeRange.unbounded): @unchecked
    val viaFormat = read(root, name).collect().sortBy(_.getAs[Long]("position"))
    assert(viaFormat.length == facts.length && facts.length == 10)
    facts.sortBy(_.position).zip(viaFormat).foreach { case (f, r) =>
      assert(r.getAs[String]("id") == f.id)
      assert(r.getAs[String]("fact_type") == f.factType)
      assert(r.getAs[String]("subject") == f.subject)
      assert(r.getAs[Long]("position") == f.position)
      assert(r.getAs[Long]("appended_at_nanos") == Timestamps.toNanos(f.appendedAt))
      // TimestampType is the micros floor of the same instant
      assert(r.getAs[java.sql.Timestamp]("appended_at").getTime * 1000 +
        r.getAs[java.sql.Timestamp]("appended_at").getNanos / 1000 % 1000 ==
        Timestamps.toNanos(f.appendedAt) / 1000,
        s"appended_at mismatch at position ${f.position}")
      assert(r.getAs[Array[Byte]]("payload_data").toSeq == f.payloadData.toSeq)
      assert(Option(r.getAs[String]("payload_format")) == f.payloadFormat)
      assert(Option(r.getAs[String]("payload_schema")) == f.payloadSchema)
      assert(Option(r.getAs[Map[String, String]]("metadata"))
        .getOrElse(Map.empty) == f.metadata)
      assert(Option(r.getAs[Map[String, String]]("tags"))
        .getOrElse(Map.empty) == f.tags)
    }
  }

  test("pushed position range prunes files from commit metadata (visible " +
      "in the scan description) and still returns exact rows") {
    val (fs, root, name) = freshStore()
    (1 to 8).foreach { i =>
      assert(fs.append(name, FactInput(s"T$i", "s", Array[Byte](i.toByte)))
        .isInstanceOf[AppendResult.Appended])
    }
    val df = read(root, name).filter("position > 6")
    val plan = df.queryExecution.executedPlan.toString
    val m = "files=(\\d+)/(\\d+)".r.findFirstMatchIn(plan)
    assert(m.isDefined, s"scan description missing from plan:\n$plan")
    val (kept, total) = (m.get.group(1).toInt, m.get.group(2).toInt)
    assert(total == 8 && kept == 2, s"pruning: kept=$kept total=$total")
    assert(df.collect().map(_.getAs[Long]("position")).sorted.toSeq == Seq(7L, 8L))
  }

  test("column pruning reaches the scan (only requested columns in the " +
      "read schema) and an empty projection still counts") {
    val (fs, root, name) = freshStore()
    (1 to 3).foreach { i =>
      assert(fs.append(name, FactInput(s"T$i", "s", Array[Byte](i.toByte),
        tags = Map("k" -> "v"))).isInstanceOf[AppendResult.Appended])
    }
    val df = read(root, name).select("subject", "tags")
    val plan = df.queryExecution.executedPlan.toString
    val cols = "columns=([\\w,]*)".r.findFirstMatchIn(plan).map(_.group(1))
    assert(cols.contains("subject,tags"), s"pruned columns: $cols in\n$plan")
    assert(df.collect().forall(r =>
      r.getAs[String]("subject") == "s" &&
        r.getAs[Map[String, String]]("tags") == Map("k" -> "v")))
    assert(read(root, name).count() == 3L) // empty projection: footer counts
  }

  test("micro-batch stream tails the commit log with seq offsets, " +
      "exactly once, across multiple appends") {
    val s = spark
    import s.implicits._
    val (fs, root, name) = freshStore()
    assert(fs.append(name, FactInput("T1", "s", Array[Byte](1)))
      .isInstanceOf[AppendResult.Appended])
    val cp = Files.createTempDirectory("graft-dsv2-cp").toString
    val sink = s"dsv2_${System.nanoTime()}"
    val q = spark.readStream.format("graft")
      .option("root", root).option("store", name).load()
      .select("position", "fact_type")
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", cp)
      .trigger(Trigger.ProcessingTime(20))
      .start()
    try {
      q.processAllAvailable()
      (2 to 4).foreach { i =>
        assert(fs.append(name, FactInput(s"T$i", "s", Array[Byte](i.toByte)))
          .isInstanceOf[AppendResult.Appended])
      }
      q.processAllAvailable()
      assert(fs.append(AppendRequest(name, Seq(
        FactInput("T5", "bulk", Array[Byte](5)),
        FactInput("T6", "bulk", Array[Byte](6)))))
        .isInstanceOf[AppendResult.Appended])
      q.processAllAvailable()
      val got = spark.table(sink).as[(Long, String)].collect().sorted.toSeq
      assert(got.map(_._1) == (1L to 6L), s"positions: $got")
      assert(got.map(_._2) == (1 to 6).map(i => s"T$i"), s"types: $got")
    } finally q.stop()
  }

  test("a streaming face (subjectStates) runs off the DSv2 stream: " +
      "per-subject state folds facts arriving through format(\"graft\")") {
    val s = spark
    import s.implicits._
    val (fs, root, name) = freshStore()
    val facts = spark.readStream.format("graft")
      .option("root", root).option("store", name).load()
    val out = graft.streaming.FactStateStreams.subjectStates(s, facts)
    val cp = Files.createTempDirectory("graft-dsv2-face-cp").toString
    val sink = s"dsv2_face_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", cp)
      .trigger(Trigger.ProcessingTime(20)).start()
    try {
      Seq(("a", "OPEN"), ("b", "OPEN"), ("a", "UPDATE"), ("a", "CLOSE"),
          ("b", "UPDATE")).foreach { case (subj, tp) =>
        assert(fs.append(name, FactInput(tp, subj, Array[Byte](1)))
          .isInstanceOf[AppendResult.Appended])
      }
      q.processAllAvailable()
      val last = s.table(sink).as[(String, Long, Long, String)].collect()
        .groupBy(_._1).map { case (k, v) => k -> v.maxBy(_._2) }
      assert(last("a") == (("a", 3L, 4L, "CLOSE")), s"subject a: ${last("a")}")
      assert(last("b") == (("b", 2L, 5L, "UPDATE")), s"subject b: ${last("b")}")
    } finally q.stop()
  }

  test("stream over a compacted+vacuumed store does not stall: offsets " +
      "advance past the checkpoint and post-vacuum commits are delivered") {
    val s = spark
    import s.implicits._
    val (fs, root, name) = freshStore()
    (1 to 3).foreach { i =>
      assert(fs.append(name, FactInput(s"T$i", "s", Array[Byte](i.toByte)))
        .isInstanceOf[AppendResult.Appended])
    }
    // checkpoint at seq 3, commits 1..3 + their files deleted
    fs.compact(name, vacuum = true)
    val cp = Files.createTempDirectory("graft-dsv2-vac-cp").toString
    val sink = s"dsv2_vac_${System.nanoTime()}"
    val q = spark.readStream.format("graft")
      .option("root", root).option("store", name)
      .option("startseq", "3") // at the checkpoint: tail only the live suffix
      .load()
      .select("position", "fact_type")
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", cp)
      .trigger(Trigger.ProcessingTime(20))
      .start()
    try {
      q.processAllAvailable()
      (4 to 6).foreach { i =>
        assert(fs.append(name, FactInput(s"T$i", "s", Array[Byte](i.toByte)))
          .isInstanceOf[AppendResult.Appended])
      }
      q.processAllAvailable() // pre-fix: latestOffset pinned at 0-or-ckpt -> silent stall
      val got = spark.table(sink).as[(Long, String)].collect().sorted.toSeq
      assert(got.map(_._1) == (4L to 6L), s"positions: $got")
    } finally q.stop()
  }

  test("attaching a fresh stream below a vacuumed checkpoint fails loudly " +
      "with the restart hint (not a silent stall)") {
    val (fs, root, name) = freshStore()
    (1 to 3).foreach { i =>
      assert(fs.append(name, FactInput(s"T$i", "s", Array[Byte](i.toByte)))
        .isInstanceOf[AppendResult.Appended])
    }
    fs.compact(name, vacuum = true)
    assert(fs.append(name, FactInput("T4", "s", Array[Byte](4)))
      .isInstanceOf[AppendResult.Appended])
    val cp = Files.createTempDirectory("graft-dsv2-vac2-cp").toString
    val q = spark.readStream.format("graft")
      .option("root", root).option("store", name).load() // startseq defaults to 0
      .writeStream.format("memory")
      .queryName(s"dsv2_vac2_${System.nanoTime()}")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", cp)
      .start()
    try {
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
        q.processAllAvailable())
      assert(ex.getMessage.contains("vacuumed") ||
        Option(ex.getCause).exists(_.getMessage.contains("vacuumed")),
        s"expected the vacuumed-cursor error, got: ${ex.getMessage}")
    } finally q.stop()
  }

  test("typed pre-flight errors: missing options and unknown store") {
    intercept[IllegalArgumentException](
      spark.read.format("graft").load().collect())
    val root = Files.createTempDirectory("graft-dsv2-missing").toString
    val ex = intercept[IllegalArgumentException](
      spark.read.format("graft").option("root", root)
        .option("store", "nope").load().collect())
    assert(ex.getMessage.contains("not found"))
  }
}
