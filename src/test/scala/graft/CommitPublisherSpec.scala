package graft

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.store.{CommitPublisher, ConditionalPutPublisher, FactLog,
  HadoopFsPublisher, PosixLinkPublisher, SparkFactStore}

/** The CommitPublisher seam: both deployment profiles (POSIX hard-link CAS
  * and object-store conditional PUT) must provide exactly-one-winner
  * put-if-absent with whole-object visibility, and the store built on them
  * must behave identically — including a store written under one profile
  * being opened and extended under the other (the on-disk format carries
  * no publisher fingerprint). */
class CommitPublisherSpec extends AnyFunSuite {

  private val publishers =
    Seq(PosixLinkPublisher, ConditionalPutPublisher, HadoopFsPublisher.default)

  for (pub <- publishers)
  test(s"[${pub.name}] putIfAbsent: 16 simultaneous writers, exactly one " +
      "winner, winner's content intact, losers leave no trace") {
    val dir = Files.createTempDirectory("pub-race-")
    val target = dir.resolve("00000000000000000001.commit")
    val n = 16
    val pool = Executors.newFixedThreadPool(n)
    val gate = new CountDownLatch(1)
    val futures = (1 to n).map { i =>
      pool.submit(new java.util.concurrent.Callable[Boolean] {
        def call(): Boolean = { gate.await(); pub.putIfAbsent(target, s"writer-$i\n") }
      })
    }
    gate.countDown()
    val wins = futures.map(_.get(60, TimeUnit.SECONDS))
    pool.shutdown()
    assert(wins.count(identity) == 1, s"winners: ${wins.count(identity)}")
    val winner = wins.indexOf(true) + 1
    assert(Files.readString(target) == s"writer-$winner\n",
      "target content is not the winner's whole object")
    // losers' staging cleaned up: nothing but the target (+ the emulator's
    // arbiter file) remains
    import scala.jdk.CollectionConverters._
    val leftovers = Files.list(dir).iterator().asScala
      .map(_.getFileName.toString)
      .filterNot(f => f == target.getFileName.toString || f == ".cas-arbiter")
      .toSeq
    assert(leftovers.isEmpty, s"staging residue: $leftovers")
    // and a subsequent put against the published target always loses
    assert(!pub.putIfAbsent(target, "late\n"))
    assert(Files.readString(target) == s"writer-$winner\n")
  }

  for (pub <- publishers)
  test(s"[${pub.name}] alias is create-if-absent and idempotent") {
    val dir = Files.createTempDirectory("pub-alias-")
    val src = dir.resolve("src.bin")
    Files.write(src, Array[Byte](1, 2, 3))
    val target = dir.resolve("view").resolve("a.bin")
    pub.alias(target, src)
    pub.alias(target, src) // second publish is silent
    assert(Files.readAllBytes(target).toSeq == Seq[Byte](1, 2, 3))
  }

  test("conditional-put stream view: aliases are independent copies that " +
      "survive deletion of the committed data file (vacuum semantics)") {
    val dir = Files.createTempDirectory("pub-stream-")
    val src = dir.resolve("data.bin")
    Files.write(src, Array[Byte](9, 9))
    val target = dir.resolve("stream").resolve("0-0-0.bin")
    ConditionalPutPublisher.alias(target, src)
    Files.delete(src)
    assert(Files.readAllBytes(target).toSeq == Seq[Byte](9, 9))
  }

  test("a store written under POSIX links opens, reads, and extends under " +
      "conditional-put — and vice versa (no publisher fingerprint on disk)") {
    val spark = SparkTestSession.spark
    for ((first, second) <- Seq(
        (PosixLinkPublisher: CommitPublisher, ConditionalPutPublisher: CommitPublisher),
        (ConditionalPutPublisher: CommitPublisher, PosixLinkPublisher: CommitPublisher),
        (PosixLinkPublisher: CommitPublisher, HadoopFsPublisher.default: CommitPublisher),
        (HadoopFsPublisher.default: CommitPublisher, ConditionalPutPublisher: CommitPublisher))) {
      val root = Files.createTempDirectory(s"pub-interop-${first.name}-")
      val a = new SparkFactStore(spark, root, publisher = first)
      assert(a.createStore("mix").isInstanceOf[CreateStoreResult.Created])
      (1 to 3).foreach { i =>
        assert(a.append("mix", FactInput(s"T$i", "s", Array[Byte](i.toByte)))
          .isInstanceOf[AppendResult.Appended])
      }
      val b = new SparkFactStore(spark, root, publisher = second)
      val FindResult.Found(got) = b.findInTimeRange("mix", TimeRange.unbounded): @unchecked
      assert(got.map(_.position) == (1L to 3L))
      assert(b.append("mix", FactInput("T4", "s", Array[Byte](4)))
        .isInstanceOf[AppendResult.Appended])
      val FindResult.Found(all) = b.findInTimeRange("mix", TimeRange.unbounded): @unchecked
      assert(all.map(_.position) == (1L to 4L),
        s"${first.name} -> ${second.name} handoff broke the position chain")
    }
  }

  test("conditional-put stream links: committed facts tail through stream/ " +
      "as copies readable by a parquet scan") {
    val spark = SparkTestSession.spark
    val root = Files.createTempDirectory("pub-streamview-")
    val fs = new SparkFactStore(spark, root, publisher = ConditionalPutPublisher)
    assert(fs.createStore("sv").isInstanceOf[CreateStoreResult.Created])
    (1 to 3).foreach { i =>
      assert(fs.append("sv", FactInput(s"T$i", "s", Array[Byte](i.toByte)))
        .isInstanceOf[AppendResult.Appended])
    }
    val md = fs.findStoreByName("sv").get
    val log = new FactLog(root.resolve("stores").resolve(md.id), ConditionalPutPublisher)
    log.ensureStreamLinks()
    val positions = spark.read.schema(FactLog.schema)
      .parquet(log.streamPath.toString)
      .select("position").collect().map(_.getLong(0)).sorted.toSeq
    assert(positions == Seq(1L, 2L, 3L))
  }

  test("publisher selection: forName round-trips all three and rejects unknowns") {
    assert(CommitPublisher.forName("posix") eq PosixLinkPublisher)
    assert(CommitPublisher.forName("conditional-put") eq ConditionalPutPublisher)
    assert(CommitPublisher.forName("hadoop").isInstanceOf[HadoopFsPublisher])
    intercept[IllegalArgumentException](CommitPublisher.forName("s3-magic"))
  }
}
