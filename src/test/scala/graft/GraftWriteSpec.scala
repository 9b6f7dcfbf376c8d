package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.core._
import graft.store.SparkFactStore

/** The DataSource V2 WRITE surface: `df.write.format("graft")` must commit
  * through the same CAS protocol as the facade — contiguous input-order
  * positions via per-partition prefix sums, idempotency-key no-ops,
  * exactly-one-winner against concurrent writers — and the streaming sink
  * must deliver store-to-store exactly-once. */
class GraftWriteSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark

  private def freshStore(): (SparkFactStore, String, String) = {
    val root = Files.createTempDirectory("graft-dsv2w-")
    val fs = new SparkFactStore(spark, root)
    val name = s"w-${java.util.UUID.randomUUID().toString.take(8)}"
    assert(fs.createStore(name).isInstanceOf[CreateStoreResult.Created])
    (fs, root.toString, name)
  }

  private def inputDf(n: Int, tag: String) = {
    val s = spark
    import s.implicits._
    (1 to n).map(i => (f"T$i%04d", s"subj-$tag"))
      .toDF("fact_type", "subject")
      .selectExpr("fact_type", "subject",
        "CAST(fact_type AS BINARY) AS payload_data",
        "CAST(NULL AS STRING) AS payload_format",
        "CAST(NULL AS STRING) AS payload_schema",
        "map('src', 'dsv2') AS metadata",
        s"map('tag', '$tag') AS tags")
  }

  test("batch write commits one atomic batch: contiguous positions in " +
      "input order, full column round-trip via the facade") {
    val (fs, root, name) = freshStore()
    inputDf(250, "a").orderBy("fact_type")
      .write.format("graft").option("root", root).option("store", name)
      .mode("append").save()
    val FindResult.Found(got) = fs.findInTimeRange(name, TimeRange.unbounded): @unchecked
    assert(got.map(_.position) == (1L to 250L))
    assert(got.map(_.factType) == (1 to 250).map(i => f"T$i%04d"),
      "positions do not follow the input's (partition, row) order")
    assert(got.forall(_.metadata == Map("src" -> "dsv2")))
    assert(got.forall(_.tags == Map("tag" -> "a")))
    assert(got.forall(f => new String(f.payloadData, "UTF-8") == f.factType))
    // appends through the facade continue the chain
    assert(fs.append(name, FactInput("NEXT", "s", Array[Byte](1)))
      .isInstanceOf[AppendResult.Appended])
    assert(fs.storeStats(name).exists(_.headPosition == 251L))
  }

  test("idempotencyKey option: a re-submitted batch is a no-op") {
    val (fs, root, name) = freshStore()
    def submit(): Unit =
      inputDf(20, "idem")
        .write.format("graft").option("root", root).option("store", name)
        .option("idempotencyKey", "batch-42").mode("append").save()
    submit()
    submit() // same key: AlreadyApplied, nothing written
    val FindResult.Found(got) = fs.findInTimeRange(name, TimeRange.unbounded): @unchecked
    assert(got.size == 20, s"re-submitted batch duplicated facts: ${got.size}")
  }

  test("two concurrent DSv2 writers race the same store: both commit, " +
      "positions stay contiguous, no loss") {
    val (fs, root, name) = freshStore()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = Seq("x", "y").map { tag =>
      new Thread(() => {
        try inputDf(120, tag)
          .write.format("graft").option("root", root).option("store", name)
          .mode("append").save()
        catch { case e: Throwable => errs.add(e) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(300000))
    assert(errs.isEmpty, s"writer failed: ${errs.peek()}")
    val FindResult.Found(got) = fs.findInTimeRange(name, TimeRange.unbounded): @unchecked
    assert(got.size == 240, s"lost or duplicated facts: ${got.size}")
    assert(got.map(_.position) == (1L to 240L), "positions not contiguous")
    // each batch is atomic: its 120 facts occupy one contiguous range
    val byTag = got.groupBy(_.tags("tag"))
    assert(byTag.keySet == Set("x", "y"))
    byTag.values.foreach { fx =>
      val ps = fx.map(_.position)
      assert(ps == (ps.min to ps.max), "a batch's positions interleaved")
    }
  }

  test("typed pre-flight errors: missing and mistyped input columns") {
    val s = spark
    import s.implicits._
    val (_, root, name) = freshStore()
    val missing = intercept[Exception](
      Seq(("T", "s")).toDF("fact_type", "subject")
        .write.format("graft").option("root", root).option("store", name)
        .mode("append").save())
    assert(missing.getMessage.contains("payload_data"), missing.getMessage)
    val mistyped = intercept[Exception](
      inputDf(1, "z").withColumn("payload_data",
          org.apache.spark.sql.functions.lit("not-binary"))
        .write.format("graft").option("root", root).option("store", name)
        .mode("append").save())
    assert(mistyped.getMessage.contains("payload_data"), mistyped.getMessage)
  }

  test("store-to-store streaming: readStream from one store through the " +
      "graft sink into another — positions and payloads carried exactly-once") {
    val (src, srcRoot, srcName) = freshStore()
    val (dst, dstRoot, dstName) = freshStore()
    (1 to 3).foreach { i =>
      assert(src.append(srcName, FactInput(s"S$i", "s", Array[Byte](i.toByte)))
        .isInstanceOf[AppendResult.Appended])
    }
    val cp = Files.createTempDirectory("graft-dsv2w-cp").toString
    val q = spark.readStream.format("graft")
      .option("root", srcRoot).option("store", srcName).load()
      .selectExpr("fact_type", "subject", "payload_data",
        "payload_format", "payload_schema", "metadata",
        "map('srcpos', CAST(position AS STRING)) AS tags")
      .writeStream.format("graft")
      .option("root", dstRoot).option("store", dstName)
      .option("checkpointLocation", cp)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(20))
      .start()
    try {
      q.processAllAvailable()
      (4 to 6).foreach { i =>
        assert(src.append(srcName, FactInput(s"S$i", "s", Array[Byte](i.toByte)))
          .isInstanceOf[AppendResult.Appended])
      }
      q.processAllAvailable()
      val FindResult.Found(got) = dst.findInTimeRange(dstName, TimeRange.unbounded): @unchecked
      assert(got.size == 6, s"sink holds ${got.size} facts")
      assert(got.map(_.factType).sorted == (1 to 6).map(i => s"S$i"))
      // source positions carried through tags, each exactly once
      assert(got.map(_.tags("srcpos")).sorted == (1 to 6).map(_.toString))
    } finally q.stop()
  }

  test("Hadoop-profile write: df.write against a file: URI root commits " +
      "through the Hadoop stack") {
    val root = Files.createTempDirectory("graft-dsv2w-hfs-")
    val fs = SparkFactStore.at(spark, root.toUri.toString)
    assert(fs.createStore("uriw").isInstanceOf[CreateStoreResult.Created])
    inputDf(30, "h")
      .write.format("graft").option("root", root.toUri.toString)
      .option("store", "uriw").mode("append").save()
    val FindResult.Found(got) = fs.findInTimeRange("uriw", TimeRange.unbounded): @unchecked
    assert(got.map(_.position) == (1L to 30L))
  }
}
