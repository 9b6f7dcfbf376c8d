package graft

import java.nio.file.{Files, Path}
import java.nio.file.attribute.FileTime

import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.store.SparkFactStore

/** The janitor must delete exactly the artifacts nothing references —
  * crashed-writer data files, crashed-compaction tmp dirs, stale CAS
  * staging files — and must NEVER touch live data, including carried-
  * forward checkpoint buckets and recent (grace-period) orphans. */
class JanitorSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def age(p: Path): Unit =
    Files.setLastModifiedTime(p, FileTime.fromMillis(System.currentTimeMillis() - 86400000L))

  test("janitor removes abandoned artifacts, preserves every committed fact") {
    val root = Files.createTempDirectory("graft-janitor-")
    val fs = new SparkFactStore(spark, root)
    val CreateStoreResult.Created(md) = fs.createStore("j"): @unchecked
    (1 to 40).foreach(i =>
      fs.append("j", FactInput("T", s"subj-${i % 4}", Array[Byte](i.toByte))))
    // compact half-way so live state spans checkpoint buckets + commit suffix
    assert(fs.compact("j", rowsPerBucket = 16, vacuum = true) > 0)
    (41 to 48).foreach(i =>
      fs.append("j", FactInput("T", s"subj-${i % 4}", Array[Byte](i.toByte))))

    val storeDir = root.resolve("stores").resolve(md.id)
    val dataDir = storeDir.resolve("data")
    // fake a crashed writer (data file staged, CAS never won)
    val orphan = dataDir.resolve("dead-writer.parquet")
    Files.writeString(orphan, "not really parquet")
    age(orphan)
    // fake a crashed compaction (tmp dir with content)
    val tmpCompact = dataDir.resolve("tmp-compact-deadbeef")
    Files.createDirectories(tmpCompact.resolve("bucket=0"))
    Files.writeString(tmpCompact.resolve("bucket=0").resolve("part-0.parquet"), "x")
    age(tmpCompact.resolve("bucket=0").resolve("part-0.parquet"))
    age(tmpCompact.resolve("bucket=0"))
    age(tmpCompact)
    // fake a crashed CAS staging file
    val tmpCommit = storeDir.resolve("commits").resolve(".tmp-dead")
    Files.writeString(tmpCommit, "x")
    age(tmpCommit)
    // a FRESH orphan — must survive the grace period
    val fresh = dataDir.resolve("in-flight.parquet")
    Files.writeString(fresh, "x")

    def history(subject: String): Seq[Long] =
      fs.findBySubject("j", subject, Limit.None, ReadDirection.Forward) match {
        case FindResult.Found(f) => f.map(_.position)
        case other => fail(s"findBySubject: $other")
      }
    val before = (0 until 4).map(i => history(s"subj-$i"))

    val removed = fs.janitor("j", olderThanMillis = 60000L).get
    assert(removed == 3, s"expected 3 artifacts removed, got $removed")
    assert(!Files.exists(orphan), "aged orphan data file survived")
    assert(!Files.exists(tmpCompact), "crashed compaction tmp dir survived")
    assert(!Files.exists(tmpCommit), "stale CAS staging file survived")
    assert(Files.exists(fresh), "grace period violated: fresh orphan deleted")

    // every committed fact still readable, checkpoint buckets intact
    (0 until 4).foreach(i => assert(history(s"subj-$i") == before(i),
      s"subject subj-$i history changed after janitor"))
    // a second pass finds nothing else stale
    assert(fs.janitor("j", olderThanMillis = 60000L).get == 0)
    // unknown store -> None
    assert(fs.janitor("nope").isEmpty)

    // metadata-only diagnostics agree with what we built: 40 compacted
    // facts in ceil(40/16)=3 buckets + 8 suffix commits, head at 48
    val st = fs.storeStats("j").get
    assert(st.nFacts == 48L && st.headPosition == 48L)
    assert(st.commitSuffix == 8)
    assert(st.checkpointSeq.isDefined && st.nBuckets == 3)
    assert(st.dataBytes > 0, "data footprint must be positive")
    assert(st.indexBytes > 0, "bloom + entry-index overhead must be accounted")
    assert(fs.storeStats("nope").isEmpty)
    fs.removeStore("j")
  }
}
