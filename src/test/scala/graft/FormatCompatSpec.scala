package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Base64

import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.store.{SparkFactStore, Timestamps}

/** Backward-compatibility gate for the store's on-disk layout: a small
  * fixture store generated at the round-10 format (FixtureStoreGen) is
  * committed under src/test/resources; CURRENT code must open it and read
  * every fact back exactly (ids, positions, nanos timestamps, raw payload
  * bytes, metadata, tags), answer finders over it, and accept NEW appends
  * that continue its position sequence. A layout change that can't do
  * this would orphan every deployed store — it fails here first. */
class FormatCompatSpec extends AnyFunSuite {

  private val fixture = Paths.get("src/test/resources/fixtures/store_v10")

  /** Work on a copy: the committed fixture must stay byte-identical. */
  private def copied(): Path = {
    import scala.jdk.CollectionConverters._
    val dst = Files.createTempDirectory("format-compat-")
    Files.walk(fixture).iterator().asScala.foreach { p =>
      val t = dst.resolve(fixture.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else { Files.createDirectories(t.getParent)
        Files.copy(p, t, StandardCopyOption.REPLACE_EXISTING) }
    }
    dst
  }

  private case class Expected(position: Long, id: String, factType: String,
      subject: String, nanos: Long, payload: Seq[Byte],
      format: Option[String], schema: Option[String],
      metadata: Map[String, String], tags: Map[String, String])

  private def manifest(): Seq[Expected] = {
    def m(s: String): Map[String, String] =
      if (s.isEmpty) Map.empty
      else s.split(",", -1).map { kv =>
        val i = kv.indexOf('='); kv.take(i) -> kv.drop(i + 1) }.toMap
    new String(Files.readAllBytes(fixture.resolve("expected.tsv")), "UTF-8")
      .split("\n").filter(_.nonEmpty).toSeq.map { line =>
        val f = line.split("\t", -1)
        Expected(f(0).toLong, f(1), f(2), f(3), f(4).toLong,
          Base64.getDecoder.decode(f(5)).toSeq,
          if (f(6).isEmpty) None else Some(f(6)),
          if (f(7).isEmpty) None else Some(f(7)), m(f(8)), m(f(9)))
      }
  }

  // every test runs under ALL deployment profiles: the on-disk format is
  // publisher- and IO-stack-independent, so a store written with POSIX
  // hard links must open and extend under conditional-put semantics AND
  // through the Hadoop FileSystem stack (URI root + rename-if-absent CAS)
  private case class Profile(name: String, open: Path => SparkFactStore)
  private val profiles = Seq(
    Profile(graft.store.PosixLinkPublisher.name,
      root => new SparkFactStore(SparkTestSession.spark, root,
        publisher = graft.store.PosixLinkPublisher)),
    Profile(graft.store.ConditionalPutPublisher.name,
      root => new SparkFactStore(SparkTestSession.spark, root,
        publisher = graft.store.ConditionalPutPublisher)),
    Profile(graft.store.HadoopFsPublisher.name,
      root => SparkFactStore.at(SparkTestSession.spark, root.toUri.toString)))

  for (profile <- profiles)
  test(s"[${profile.name}] round-10 fixture store opens and replays exactly") {
    val store = profile.open(copied())
    val exp = manifest()
    assert(store.storeExists("orders"))
    val got = store.replay("orders", ReplayStart.Beginning)
      .fold(e => fail(e.toString), _.flatten.toSeq)
    assert(got.map(_.position) == exp.map(_.position))
    got.zip(exp).foreach { case (f, e) =>
      assert(f.id == e.id); assert(f.factType == e.factType)
      assert(f.subject == e.subject)
      assert(Timestamps.toNanos(f.appendedAt) == e.nanos)
      assert(f.payloadData.toSeq == e.payload, s"payload bytes @${e.position}")
      assert(f.payloadFormat == e.format); assert(f.payloadSchema == e.schema)
      assert(f.metadata == e.metadata); assert(f.tags == e.tags)
    }
  }

  for (profile <- profiles)
  test(s"[${profile.name}] finders answer over the fixture (indexes/sidecars readable)") {
    val store = profile.open(copied())
    val exp = manifest()
    // by id (entry-index/bloom path)
    val one = exp(4)
    store.findById("orders", one.id) match {
      case FindByIdResult.Found(f) =>
        assert(f.position == one.position && f.subject == one.subject)
      case other => fail(s"findById: $other")
    }
    def positions(r: FindResult): Seq[Long] = r match {
      case FindResult.Found(fs) => fs.map(_.position)
      case other => fail(s"finder: $other")
    }
    // by subject, position-ordered
    assert(positions(store.findBySubject("orders", "order-1")) ==
      exp.filter(_.subject == "order-1").map(_.position))
    // by tags (AND)
    assert(positions(store.findByTags("orders", Map("region" -> "emea"))) ==
      exp.filter(_.tags.get("region").contains("emea")).map(_.position))
    // time range spanning everything
    assert(positions(store.findInTimeRange("orders", TimeRange(None, None))) ==
      exp.map(_.position))
  }

  for (profile <- profiles)
  test(s"[${profile.name}] new appends continue the fixture's position sequence") {
    val store = profile.open(copied())
    val head = manifest().map(_.position).max
    val r = store.append("orders",
      FactInput("ORDER_PLACED", "order-new", "post-upgrade".getBytes("UTF-8")))
    val id = r match {
      case AppendResult.Appended(ids, _) => ids.head
      case other => fail(s"append onto fixture: $other")
    }
    store.findById("orders", id) match {
      case FindByIdResult.Found(f) => assert(f.position == head + 1)
      case other => fail(s"appended fact unreadable: $other")
    }
    // conditional append still sees the fixture's facts
    val cond = store.append(AppendRequest("orders",
      Seq(FactInput("X", "order-guard", "x".getBytes("UTF-8"))),
      condition = AppendCondition.TagQueryBased(
        TagQuery(Seq(TagQueryItem.TagOnly(Map("region" -> "emea")))))))
    assert(cond == AppendResult.AppendConditionViolated,
      "fixture's emea-tagged facts must trip the guard")
  }
}
