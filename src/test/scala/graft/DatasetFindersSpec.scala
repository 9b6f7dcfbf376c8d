package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.store.SparkFactStore

/** The Dataset-returning engine finders: same facts and order as the
  * List-returning reference API, but lazy and distributed — a tag query
  * matching an arbitrarily large slice of the store must be consumable
  * without collecting it to the driver. */
class DatasetFindersSpec extends AnyFunSuite {

  private def newStore() =
    new SparkFactStore(SparkTestSession.spark, Files.createTempDirectory("graft-ds-"))

  private def in(t: String, subj: String, tags: Map[String, String]) =
    FactInput(t, subj, Array.emptyByteArray, None, None, Map.empty, tags)

  test("findByTagQueryDataset matches findByTagQuery, without a driver collect") {
    val fs = newStore()
    fs.createStore("s")
    fs.append("s", (1 to 50).map(i =>
      in(if (i % 2 == 0) "EVEN" else "ODD", s"n/$i",
        Map("mod3" -> (i % 3).toString))))
    val q = TagQuery(Seq(
      TagQueryItem.TagType(Set("EVEN"), Map("mod3" -> "0")),
      TagQueryItem.TagOnly(Map("mod3" -> "1"))))
    val viaList = fs.findByTagQuery("s", q) match {
      case FindResult.Found(fs0) => fs0
      case other => fail(s"unexpected $other")
    }
    val ds = fs.findByTagQueryDataset("s", q).get
    // the plan is lazy — aggregate distributed, then spot-check the rows
    assert(ds.count() == viaList.size)
    val viaDs = ds.collect().toSeq
    assert(viaDs.map(_.id) == viaList.map(_.id), "same facts in the same position order")
    // Array[Byte] makes whole-Fact == reference-based; compare field-wise.
    // appendedAt goes through Spark's micros TimestampType in the encoder —
    // truncated, by documented contract.
    def micros(i: java.time.Instant) =
      i.truncatedTo(java.time.temporal.ChronoUnit.MICROS)
    assert(viaDs.map(f => (f.factType, f.subject, f.position, micros(f.appendedAt), f.tags)) ==
      viaList.map(f => (f.factType, f.subject, f.position, micros(f.appendedAt), f.tags)))
    // the columnar frame keeps the exact nanos the List API returns
    val frame = fs.findByTagQueryFrame("s", q).get
    val nanosCol = frame.select("appended_at_nanos").collect().map(_.getLong(0)).toSeq
    assert(nanosCol == viaList.map(f => graft.store.Timestamps.toNanos(f.appendedAt)))
    assert(fs.findByTagQueryDataset("missing", q).isEmpty)
  }

  test("findByTagsDataset and factsDataset round-trip facts with payload/metadata") {
    val fs = newStore()
    fs.createStore("s2")
    fs.append("s2", Seq(
      FactInput("T", "x", "payload".getBytes("UTF-8"), Some("JSON"), Some("v1"),
        Map("meta" -> "m"), Map("k" -> "v")),
      in("T", "y", Map("k" -> "other"))))
    val tagged = fs.findByTagsDataset("s2", Map("k" -> "v")).get.collect()
    assert(tagged.length == 1 && tagged.head.subject == "x")
    assert(new String(tagged.head.payloadData, "UTF-8") == "payload")
    assert(tagged.head.payloadFormat.contains("JSON") &&
      tagged.head.payloadSchema.contains("v1") &&
      tagged.head.metadata == Map("meta" -> "m"))
    assert(tagged.head.appendedAt != null && tagged.head.position == 1L)
    // empty tag map = whole store, like the List API
    assert(fs.findByTagsDataset("s2", Map.empty).get.count() == 2)
    assert(fs.factsDataset("s2").get.count() == 2)
  }
}
