package graft

import java.nio.file.Files

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.memory.MemoryFactStore
import graft.store.SparkFactStore

/** Property test the reference suite lacks (SURVEY §5): the tag-query
  * algebra (OR across items, AND within) must agree between the in-memory
  * semantic oracle and the Spark engine on random corpora and random
  * queries — including the Backward+limit interaction on intersections.
  * (Raw ScalaCheck generators driven from fixed seeds: deterministic, no
  * scalatestplus bridge needed.) */
class TagQueryPropertySpec extends AnyFunSuite {

  private val keys = Seq("role", "region", "tier")
  private val vals = Seq("a", "b", "c")
  private val types = Seq("T1", "T2", "T3")

  private val genTags: Gen[Map[String, String]] = for {
    ks <- Gen.someOf(keys)
    kvs <- Gen.sequence[Seq[(String, String)], (String, String)](
      ks.map(k => Gen.oneOf(vals).map(k -> _)))
  } yield kvs.toMap

  private val genInput: Gen[FactInput] = for {
    t <- Gen.oneOf(types)
    subj <- Gen.oneOf("s1", "s2", "s3")
    tags <- genTags
  } yield FactInput(t, subj, Array[Byte](1), tags = tags)

  private val genItem: Gen[TagQueryItem] = Gen.oneOf(
    genTags.suchThat(_.nonEmpty).map(TagQueryItem.TagOnly(_)),
    for {
      ts <- Gen.nonEmptyListOf(Gen.oneOf(types))
      tags <- genTags
    } yield TagQueryItem.TagType(ts.toSet, tags))

  private val genCase: Gen[(List[FactInput], TagQuery)] = for {
    inputs <- Gen.listOfN(40, genInput)
    items <- Gen.nonEmptyListOf(genItem)
  } yield (inputs, TagQuery(items.take(3)))

  test("tag-query algebra: Spark engine == memory oracle on random corpora") {
    val spark = SparkTestSession.spark
    for (seed <- 1L to 8L) {
      val (inputs, q) = genCase.pureApply(Gen.Parameters.default, Seed(seed))
      val mem = new MemoryFactStore
      val eng = new SparkFactStore(spark, Files.createTempDirectory("graft-prop-"))
      mem.createStore("p"); eng.createStore("p")
      mem.append("p", inputs); eng.append("p", inputs)

      def shape(r: FindResult): Seq[(String, Map[String, String], Long)] = r match {
        case FindResult.Found(fs) => fs.map(f => (f.factType, f.tags, f.position))
        case other => fail(s"$other")
      }
      assert(shape(eng.findByTagQuery("p", q)) == shape(mem.findByTagQuery("p", q)),
        s"findByTagQuery diverged for seed=$seed query=$q")

      // findByTags with Backward+limit on a random tag conjunction
      val someTags = q.items.head match {
        case TagQueryItem.TagOnly(t)    => t
        case TagQueryItem.TagType(_, t) => t
      }
      if (someTags.nonEmpty) {
        assert(
          shape(eng.findByTags("p", someTags, Limit.Of(3), ReadDirection.Backward)) ==
          shape(mem.findByTags("p", someTags, Limit.Of(3), ReadDirection.Backward)),
          s"findByTags Backward+limit diverged for seed=$seed tags=$someTags")
      }
    }
  }
}
