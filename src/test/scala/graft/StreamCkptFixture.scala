package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.Trigger

import graft.core._
import graft.store.SparkFactStore
import graft.streaming.FactStateStreams

/** Shared definitions for the committed STREAMING-CHECKPOINT fixture: the
  * store layout has a format-compat gate (FormatCompatSpec), and streaming
  * checkpoints have exactly the same hazard — a field added to a managed
  * state case class (HllState, OpenInterval, …) silently orphans every
  * deployed checkpoint, because the state store holds Encoder-serialized
  * rows of the OLD shape. This object pins the inputs, faces, and paths
  * used by BOTH the one-shot generator (StreamCkptFixtureGen) and the
  * compat gate (StreamingCkptCompatSpec), so the two can never drift.
  *
  * The checkpoint is generated under a FIXED sentinel path and restored to
  * that same path at test time: the file source's seen-files log records
  * absolute URIs, so resuming from a relocated store would re-deliver
  * phase-1 files — pinning the sentinel keeps the committed bytes valid
  * verbatim. Nothing else in the fixture is machine-specific. */
object StreamCkptFixture {
  /** Fixed restore point — regenerating under any other path would bake
    * unusable URIs into the committed source log. */
  val sentinel: Path = Paths.get("/tmp/graft-stream-ckpt-fixture-v11")
  val resource: Path = Paths.get("src/test/resources/fixtures/stream_ckpt_v11")

  val T0 = 1700000000000000L

  def hllFact(lang: String, h: Long): FactInput =
    FactInput("h", lang, Array[Byte](1), tags = Map("h" -> h.toString))
  def scdFact(u: Long, ty: String, tsUs: Long): FactInput =
    FactInput(ty, u.toString, Array[Byte](1), tags = Map("ts_us" -> tsUs.toString))

  /** Phase 1 is what the committed checkpoint has already processed;
    * phase 2 is what the compat spec appends before resuming. */
  val hllPhase1: Seq[FactInput] =
    (1 to 15).map(i => hllFact("en", i * 2654435761L)) ++
      (1 to 8).map(i => hllFact("de", i * 40503L + 7))
  val hllPhase2: Seq[FactInput] =
    (16 to 24).map(i => hllFact("en", i * 2654435761L)) ++
      (9 to 12).map(i => hllFact("de", i * 40503L + 7))

  val scdPhase1: Seq[FactInput] = Seq(
    scdFact(1, "a", T0), scdFact(1, "a", T0 + 1000), scdFact(2, "a", T0 + 500))
  val scdPhase2: Seq[FactInput] = Seq(
    scdFact(1, "b", T0 + 2000),
    scdFact(2, "a", T0 + 2500), scdFact(2, "b", T0 + 3000))

  def hllFace(df: DataFrame): Dataset[FactStateStreams.HllUpdate] =
    FactStateStreams.hllDistinct(SparkTestSession.spark,
      df.selectExpr("subject AS lang", "CAST(tags['h'] AS BIGINT) AS h"))
  def scdFace(df: DataFrame): Dataset[FactStateStreams.ClosedInterval] =
    FactStateStreams.stateIntervals(SparkTestSession.spark, df.selectExpr(
      "CAST(subject AS BIGINT) AS user_id", "fact_type AS event_type",
      "timestamp_micros(CAST(tags['ts_us'] AS BIGINT)) AS ts"))

  /** AvailableNow drain through a face from a checkpoint dir (clean stop
    * between micro-batches). */
  def drain[T](fs: SparkFactStore, store: String, ckpt: String,
      mode: String)(face: DataFrame => Dataset[T]): Seq[T] = {
    val Right(df) = fs.subscribeStream(store, StartPosition.Beginning,
      maxFilesPerTrigger = Some(2)): @unchecked
    val out = new ConcurrentLinkedQueue[T]()
    val q = face(df).writeStream
      .option("checkpointLocation", ckpt)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: Dataset[T], _: Long) => b.collect().foreach(out.add) }
      .start()
    require(q.awaitTermination(180000), "drain did not terminate")
    out.asScala.toSeq
  }

  def deleteTree(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)

  def copyTree(src: Path, dst: Path): Unit =
    Files.walk(src).iterator().asScala.foreach { p =>
      val t = dst.resolve(src.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else {
        Files.createDirectories(t.getParent)
        Files.copy(p, t, StandardCopyOption.REPLACE_EXISTING)
      }
    }
}

/** One-shot generator for the committed streaming-checkpoint fixture.
  *
  * Run (only when a state case class or checkpoint layout changes
  * INTENTIONALLY, together with a written evolution/migration note):
  *   sbt "Test/runMain graft.StreamCkptFixtureGen"
  *
  * Builds two stores under the sentinel root, runs phase 1 of two
  * state-bearing faces to their checkpoints — hllDistinct (register-array
  * state, Update mode) and stateIntervals (open-interval state, Append
  * mode) — then snapshots the whole tree (store commits + stream links +
  * checkpoints incl. state store files) into src/test/resources. */
object StreamCkptFixtureGen {
  import StreamCkptFixture._

  def main(args: Array[String]): Unit = {
    deleteTree(sentinel)
    Files.createDirectories(sentinel)
    val fs = new SparkFactStore(SparkTestSession.spark, sentinel.resolve("store"))
    require(fs.createStore("hll").isInstanceOf[CreateStoreResult.Created])
    require(fs.createStore("scd").isInstanceOf[CreateStoreResult.Created])
    hllPhase1.foreach(fs.append("hll", _))
    scdPhase1.foreach(fs.append("scd", _))
    val hllOut = drain(fs, "hll", sentinel.resolve("ckpt-hll").toString, "update")(hllFace)
    val scdOut = drain(fs, "scd", sentinel.resolve("ckpt-scd").toString, "append")(scdFace)
    require(hllOut.nonEmpty, "hll phase 1 emitted nothing — bad fixture")
    require(scdOut.isEmpty, s"scd phase 1 must close nothing, got $scdOut")
    deleteTree(resource)
    Files.createDirectories(resource.getParent)
    copyTree(sentinel, resource)
    println(s"fixture written: $resource (${Files.walk(resource).count()} entries)")
  }
}
