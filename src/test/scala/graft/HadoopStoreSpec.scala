package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.store.{HadoopFsPublisher, SparkFactStore, Timestamps}

/** The cluster-filesystem binding beyond the contract suite: profile
  * handoff (a store written through plain POSIX java.nio opens, reads,
  * and extends through the Hadoop FileSystem stack and vice versa — the
  * on-disk format carries no IO-stack fingerprint), compaction + vacuum +
  * janitor running every byte through the Hadoop client, and the DSv2
  * provider reading a store by `file:` URI root. */
class HadoopStoreSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark

  test("a store written POSIX opens under the Hadoop profile: reads equal, " +
      "appends continue the position chain — and vice versa") {
    // POSIX-written -> Hadoop-opened
    val root = Files.createTempDirectory("graft-hfs-interop-")
    val posix = new SparkFactStore(spark, root)
    assert(posix.createStore("mix").isInstanceOf[CreateStoreResult.Created])
    (1 to 3).foreach { i =>
      assert(posix.append("mix", FactInput(s"T$i", "s", Array[Byte](i.toByte),
        tags = Map("k" -> s"v$i"))).isInstanceOf[AppendResult.Appended])
    }
    val hfs = SparkFactStore.at(spark, root.toUri.toString)
    assert(hfs.publisher.isInstanceOf[HadoopFsPublisher])
    val FindResult.Found(got) = hfs.findInTimeRange("mix", TimeRange.unbounded): @unchecked
    assert(got.map(_.position) == (1L to 3L))
    assert(got.map(_.tags("k")) == Seq("v1", "v2", "v3"))
    assert(hfs.append("mix", FactInput("T4", "s", Array[Byte](4)))
      .isInstanceOf[AppendResult.Appended])

    // Hadoop-written -> POSIX-opened (same root, plain path)
    val posix2 = new SparkFactStore(spark, root)
    val FindResult.Found(all) = posix2.findInTimeRange("mix", TimeRange.unbounded): @unchecked
    assert(all.map(_.position) == (1L to 4L),
      "posix -> hadoop -> posix handoff broke the position chain")
    assert(posix2.append("mix", FactInput("T5", "s", Array[Byte](5)))
      .isInstanceOf[AppendResult.Appended])
    val FindResult.Found(fin) = hfs.findInTimeRange("mix", TimeRange.unbounded): @unchecked
    assert(fin.map(_.position) == (1L to 5L))
  }

  test("Hadoop-profile store sustains the full lifecycle: bulk append, " +
      "compaction with entry indexes, conditional appends, vacuum, janitor") {
    val s = spark
    import s.implicits._
    val fs = SparkFactStore.at(spark,
      Files.createTempDirectory("graft-hfs-life-").toUri.toString)
    assert(fs.createStore("life").isInstanceOf[CreateStoreResult.Created])
    (1 to 6).foreach { i =>
      assert(fs.append("life", FactInput(s"T$i", s"subj-${i % 3}",
        Array[Byte](i.toByte), tags = Map("mod" -> s"${i % 2}")))
        .isInstanceOf[AppendResult.Appended])
    }
    // bulk append through Spark's writer onto the URI root
    val bulk = (7 to 10).map(i => (s"B$i", s"subj-$i")).toDF("fact_type", "subject")
      .selectExpr("fact_type", "subject",
        "CAST(fact_type AS BINARY) AS payload_data",
        "CAST(NULL AS STRING) AS payload_format",
        "CAST(NULL AS STRING) AS payload_schema",
        "CAST(NULL AS MAP<STRING,STRING>) AS metadata",
        "CAST(NULL AS MAP<STRING,STRING>) AS tags")
    assert(fs.bulkAppend("life", bulk).isInstanceOf[AppendResult.Appended])
    // compact + vacuum: checkpoint written and commits reclaimed over Hadoop IO
    assert(fs.compact("life", vacuum = true) > 0)
    val FindResult.Found(all) = fs.findInTimeRange("life", TimeRange.unbounded): @unchecked
    assert(all.map(_.position) == (1L to 10L))
    // finders over the compacted checkpoint (bloom + entry-index probes
    // through Hadoop streams)
    fs.findBySubject("life", "subj-1") match {
      case FindResult.Found(fx) => assert(fx.map(_.position) == Seq(1L, 4L))
      case other => fail(s"findBySubject: $other")
    }
    // conditional append against the compacted state
    val lastShared = all.filter(_.subject == "subj-0").last
    assert(fs.append(AppendRequest("life",
      Seq(FactInput("GEN", "subj-0", Array[Byte](1))),
      condition = AppendCondition.ExpectedLastFact("subj-0", Some(lastShared.id))))
      .isInstanceOf[AppendResult.Appended])
    assert(fs.append(AppendRequest("life",
      Seq(FactInput("GEN", "subj-0", Array[Byte](1))),
      condition = AppendCondition.ExpectedLastFact("subj-0", Some(lastShared.id))))
      == AppendResult.AppendConditionViolated)
    // janitor runs through the Hadoop listings without touching live data
    assert(fs.janitor("life", olderThanMillis = 3600000L).contains(0))
    val FindResult.Found(fin) = fs.findInTimeRange("life", TimeRange.unbounded): @unchecked
    assert(fin.size == 11)
  }

  test("DSv2 reads a store by file: URI root — pruned batch read and " +
      "micro-batch tail both through the Hadoop stack") {
    val fs = SparkFactStore.at(spark,
      Files.createTempDirectory("graft-hfs-dsv2-").toUri.toString)
    assert(fs.createStore("uri").isInstanceOf[CreateStoreResult.Created])
    (1 to 8).foreach { i =>
      assert(fs.append("uri", FactInput(s"T$i", "s", Array[Byte](i.toByte)))
        .isInstanceOf[AppendResult.Appended])
    }
    val df = spark.read.format("graft")
      .option("root", fs.rootDir.toString).option("store", "uri").load()
      .filter("position > 6")
    val plan = df.queryExecution.executedPlan.toString
    val m = "files=(\\d+)/(\\d+)".r.findFirstMatchIn(plan)
    assert(m.isDefined, s"scan description missing:\n$plan")
    assert(m.get.group(2).toInt == 8 && m.get.group(1).toInt == 2,
      s"URI-root pruning: ${m.get.group(1)}/${m.get.group(2)}")
    assert(df.collect().map(_.getAs[Long]("position")).sorted.toSeq == Seq(7L, 8L))
    // facade view equals DSv2 view, timestamps intact
    val FindResult.Found(facts) = fs.findInTimeRange("uri", TimeRange.unbounded): @unchecked
    val rows = spark.read.format("graft")
      .option("root", fs.rootDir.toString).option("store", "uri").load()
      .collect().sortBy(_.getAs[Long]("position"))
    facts.sortBy(_.position).zip(rows).foreach { case (f, r) =>
      assert(r.getAs[String]("id") == f.id)
      assert(r.getAs[Long]("appended_at_nanos") == Timestamps.toNanos(f.appendedAt))
    }
  }
}
