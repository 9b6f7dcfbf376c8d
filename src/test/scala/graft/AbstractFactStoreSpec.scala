package graft

import java.time.Instant
import java.util.UUID
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** Port of the reference's shared behavioral contract suite
  * (factstore-testing/.../AbstractFactStoreTest.kt, 51 tests) — the
  * implementation-agnostic semantics every backend must satisfy. Run
  * unchanged against the in-memory oracle and the Spark engine. */
abstract class AbstractFactStoreSpec extends AnyFunSuite {

  /** Fresh store instance per test (reference subclasses do the same). */
  def newFactStore(): FactStore

  private val DefaultStore = "default-test-store"
  private val MissingStore = "non-existing-store"

  private def input(subject: String = "USER:ALICE", factType: String = "USER_CREATED",
      tags: Map[String, String] = Map("role" -> "admin", "region" -> "eu"),
      metadata: Map[String, String] = Map.empty): FactInput =
    FactInput(factType, subject, s"""{"username":"x"}""".getBytes("UTF-8"),
      metadata = metadata, tags = tags)

  private def withStore(body: (FactStore, String) => Unit): Unit = {
    val fs = newFactStore()
    fs.createStore(DefaultStore)
    body(fs, DefaultStore)
  }

  private def appendOne(fs: FactStore, store: String, in: FactInput): String =
    fs.append(store, in) match {
      case AppendResult.Appended(ids, _) => ids.head
      case other => fail(s"append failed: $other")
    }

  private def found(r: FindResult): Seq[Fact] = r match {
    case FindResult.Found(fs) => fs
    case other => fail(s"expected Found, got $other")
  }

  // --- store lifecycle (reference :98-132, 1479-1497) -------------------------
  test("create store then find it by name") {
    val fs = newFactStore()
    fs.createStore("store-a") match {
      case CreateStoreResult.Created(md) =>
        assert(md.name == "store-a")
        assert(fs.storeExists("store-a"))
        assert(fs.findStoreByName("store-a").exists(_.id == md.id))
      case other => fail(s"$other")
    }
  }

  test("duplicate store name rejected") {
    val fs = newFactStore()
    fs.createStore("dup")
    assert(fs.createStore("dup") == CreateStoreResult.NameAlreadyExists)
  }

  test("invalid store names rejected") {
    val fs = newFactStore()
    for (bad <- Seq("", "1abc", "-x", "a" * 256, "a b", "x-")) {
      assert(fs.createStore(bad).isInstanceOf[CreateStoreResult.InvalidName],
        s"should reject '$bad'")
    }
    for (ok <- Seq("a", "A", "ab", "a1", "a-b", "a_b", "a" + "b" * 253 + "c")) {
      assert(fs.createStore(ok).isInstanceOf[CreateStoreResult.Created], s"should accept '$ok'")
    }
  }

  test("list stores returns all created") {
    val fs = newFactStore()
    fs.createStore("s1"); fs.createStore("s2")
    assert(fs.listStores().map(_.name).toSet == Set("s1", "s2"))
  }

  test("remove store drops facts and idempotency keys; recreate starts empty") {
    val fs = newFactStore()
    fs.createStore("store-to-delete")
    val key = UUID.randomUUID().toString
    fs.append(AppendRequest("store-to-delete", Seq(input()), key))
    assert(fs.removeStore("store-to-delete") == RemoveStoreResult.StoreRemoved)
    assert(fs.append(AppendRequest("store-to-delete", Seq(input()), key)) == AppendResult.StoreNotFound)
    fs.createStore("store-to-delete")
    assert(found(fs.findBySubject("store-to-delete", "USER:ALICE")).isEmpty)
    // same idempotency key must be accepted again after remove+recreate
    assert(fs.append(AppendRequest("store-to-delete", Seq(input()), key))
      .isInstanceOf[AppendResult.Appended])
  }

  test("remove missing store -> StoreNotFound") {
    assert(newFactStore().removeStore(MissingStore) == RemoveStoreResult.StoreNotFound)
  }

  test("stores are isolated") {
    val fs = newFactStore()
    fs.createStore("store-1"); fs.createStore("store-2")
    appendOne(fs, "store-1", input(subject = "USER:ALICE"))
    assert(found(fs.findBySubject("store-2", "USER:ALICE")).isEmpty)
    assert(found(fs.findBySubject("store-1", "USER:ALICE")).size == 1)
  }

  // --- append basics (reference :1452-1476) -----------------------------------
  test("append assigns id, position, appendedAt; read back by id") {
    withStore { (fs, s) =>
      val id = appendOne(fs, s, input(metadata = Map("test" -> "123", "loc" -> "world")))
      fs.findById(s, id) match {
        case FindByIdResult.Found(f) =>
          assert(f.factType == "USER_CREATED")
          assert(f.subject == "USER:ALICE")
          assert(f.position == 1L)
          assert(f.tags == Map("role" -> "admin", "region" -> "eu"))
          assert(f.metadata == Map("test" -> "123", "loc" -> "world"))
          assert(new String(f.payloadData, "UTF-8").contains("username"))
        case other => fail(s"$other")
      }
    }
  }

  test("batch append is atomic: ids in input order, one shared appendedAt") {
    withStore { (fs, s) =>
      val ins = (1 to 5).map(i => input(subject = s"USER:U$i"))
      fs.append(s, ins) match {
        case AppendResult.Appended(ids, at) =>
          assert(ids.size == 5)
          val facts = ids.map(id => fs.findById(s, id) match {
            case FindByIdResult.Found(f) => f
            case o => fail(s"$o")
          })
          assert(facts.map(_.subject) == ins.map(_.subject)) // input order
          assert(facts.map(_.appendedAt).toSet == Set(at))   // one instant
          assert(facts.map(_.position) == (1L to 5L))        // contiguous
        case other => fail(s"$other")
      }
    }
  }

  test("append to missing store -> StoreNotFound") {
    assert(newFactStore().append(MissingStore, input()) == AppendResult.StoreNotFound)
  }

  test("idempotency: same key twice -> AlreadyApplied, no second write") {
    withStore { (fs, s) =>
      val key = UUID.randomUUID().toString
      val r1 = fs.append(AppendRequest(s, Seq(input()), key))
      assert(r1.isInstanceOf[AppendResult.Appended])
      assert(fs.append(AppendRequest(s, Seq(input()), key)) == AppendResult.AlreadyApplied)
      assert(found(fs.findBySubject(s, "USER:ALICE")).size == 1)
    }
  }

  // --- conditional appends (reference :338-470) --------------------------------
  test("ExpectedLastFact: null expectation holds only on empty subject") {
    withStore { (fs, s) =>
      val c = AppendCondition.ExpectedLastFact("USER:ALICE", None)
      assert(fs.append(AppendRequest(s, Seq(input()), condition = c))
        .isInstanceOf[AppendResult.Appended])
      assert(fs.append(AppendRequest(s, Seq(input()), condition = c))
        == AppendResult.AppendConditionViolated)
    }
  }

  test("ExpectedLastFact: matches current last; stale id violated") {
    withStore { (fs, s) =>
      val id1 = appendOne(fs, s, input())
      val ok = AppendCondition.ExpectedLastFact("USER:ALICE", Some(id1))
      assert(fs.append(AppendRequest(s, Seq(input()), condition = ok))
        .isInstanceOf[AppendResult.Appended])
      // id1 is now stale
      assert(fs.append(AppendRequest(s, Seq(input()), condition = ok))
        == AppendResult.AppendConditionViolated)
    }
  }

  test("ExpectedLastFact tracks per-subject, not global last") {
    withStore { (fs, s) =>
      val idA = appendOne(fs, s, input(subject = "USER:ALICE"))
      appendOne(fs, s, input(subject = "USER:BOB"))
      val c = AppendCondition.ExpectedLastFact("USER:ALICE", Some(idA))
      assert(fs.append(AppendRequest(s, Seq(input(subject = "USER:ALICE")), condition = c))
        .isInstanceOf[AppendResult.Appended])
    }
  }

  test("concurrent ExpectedLastFact contenders: exactly one winner") {
    withStore { (fs, s) =>
      val seedId = appendOne(fs, s, input())
      val contenders = 8
      val pool = Executors.newFixedThreadPool(contenders)
      val latch = new CountDownLatch(1)
      val results = (1 to contenders).map { _ =>
        pool.submit(new java.util.concurrent.Callable[AppendResult] {
          def call(): AppendResult = {
            latch.await()
            fs.append(AppendRequest(s, Seq(input()),
              condition = AppendCondition.ExpectedLastFact("USER:ALICE", Some(seedId))))
          }
        })
      }
      latch.countDown()
      val outcomes = results.map(_.get(120, TimeUnit.SECONDS))
      pool.shutdown()
      assert(outcomes.count(_.isInstanceOf[AppendResult.Appended]) == 1)
      assert(outcomes.count(_ == AppendResult.AppendConditionViolated) == contenders - 1)
      assert(found(fs.findBySubject(s, "USER:ALICE")).size == 2)
    }
  }

  test("All condition: conjunction over multiple subjects") {
    withStore { (fs, s) =>
      val c = AppendCondition.All(Seq(
        AppendCondition.ExpectedLastFact("USER:ALICE", None),
        AppendCondition.ExpectedLastFact("USER:BOB", None)))
      assert(fs.append(AppendRequest(s,
        Seq(input(subject = "USER:ALICE"), input(subject = "USER:BOB")), condition = c))
        .isInstanceOf[AppendResult.Appended])
      assert(fs.append(AppendRequest(s, Seq(input(subject = "USER:ALICE")), condition = c))
        == AppendResult.AppendConditionViolated)
    }
  }

  test("TagQueryBased: fail if matching fact exists (DCB uniqueness)") {
    withStore { (fs, s) =>
      val unique = AppendCondition.TagQueryBased(TagQuery(Seq(
        TagQueryItem.TagType(Set("USER_CREATED"), Map("username" -> "alice")))))
      val in = input(tags = Map("username" -> "alice", "region" -> "eu"))
      assert(fs.append(AppendRequest(s, Seq(in), condition = unique))
        .isInstanceOf[AppendResult.Appended])
      assert(fs.append(AppendRequest(s, Seq(in), condition = unique))
        == AppendResult.AppendConditionViolated)
    }
  }

  test("TagQueryBased with after-cursor ignores facts at or before the cursor") {
    withStore { (fs, s) =>
      val in = input(tags = Map("username" -> "alice"))
      val id1 = appendOne(fs, s, in)
      val q = TagQuery(Seq(TagQueryItem.TagType(Set("USER_CREATED"), Map("username" -> "alice"))))
      // matching fact exists but only at the cursor -> condition holds
      assert(fs.append(AppendRequest(s, Seq(input(subject = "USER:BOB")),
        condition = AppendCondition.TagQueryBased(q, Some(id1))))
        .isInstanceOf[AppendResult.Appended])
      // without cursor it is violated
      assert(fs.append(AppendRequest(s, Seq(input(subject = "USER:BOB")),
        condition = AppendCondition.TagQueryBased(q)))
        == AppendResult.AppendConditionViolated)
    }
  }

  test("TagQueryBased with a nonexistent after-cursor is a violated condition") {
    withStore { (fs, s) =>
      appendOne(fs, s, input(tags = Map("username" -> "alice")))
      val q = TagQuery(Seq(TagQueryItem.TagType(Set("USER_CREATED"), Map("username" -> "alice"))))
      // reference MemoryFactStore rejects an unknown cursor fact id instead
      // of treating the condition as trivially satisfied
      assert(fs.append(AppendRequest(s, Seq(input(subject = "USER:BOB")),
        condition = AppendCondition.TagQueryBased(q, Some("no-such-fact-id"))))
        == AppendResult.AppendConditionViolated)
    }
  }

  test("idempotency keys with tab/newline are rejected at request construction") {
    intercept[IllegalArgumentException] {
      AppendRequest("s", Seq(input()), idempotencyKey = "bad\tkey")
    }
    intercept[IllegalArgumentException] {
      AppendRequest("s", Seq(input()), idempotencyKey = "bad\nkey")
    }
    intercept[IllegalArgumentException] {
      AppendRequest("s", Seq(input()), idempotencyKey = "")
    }
  }

  test("findByTags with an empty tag map returns all facts") {
    withStore { (fs, s) =>
      appendOne(fs, s, input(subject = "USER:ALICE", tags = Map("region" -> "eu")))
      appendOne(fs, s, input(subject = "USER:BOB")) // no tags at all
      val all = found(fs.findByTags(s, Map.empty))
      assert(all.size == 2)
      assert(all.map(_.position) == Seq(1L, 2L))
      // limit + direction still apply
      val last = found(fs.findByTags(s, Map.empty, Limit.Of(1), ReadDirection.Backward))
      assert(last.map(_.subject) == Seq("USER:BOB"))
    }
  }

  // --- finders (reference :175-335, 473-773) -----------------------------------
  test("findById / existsById outcomes") {
    withStore { (fs, s) =>
      val id = appendOne(fs, s, input())
      assert(fs.existsById(s, id) == ExistsByIdResult.Exists)
      assert(fs.existsById(s, "no-such-id") == ExistsByIdResult.DoesNotExist)
      assert(fs.findById(s, "no-such-id") == FindByIdResult.NotFound)
      assert(fs.findById(MissingStore, id) == FindByIdResult.StoreNotFound)
      assert(fs.existsById(MissingStore, id) == ExistsByIdResult.StoreNotFound)
    }
  }

  test("findBySubject returns full history in append order") {
    withStore { (fs, s) =>
      appendOne(fs, s, input(subject = "USER:ALICE", factType = "USER_CREATED"))
      appendOne(fs, s, input(subject = "USER:BOB"))
      appendOne(fs, s, input(subject = "USER:ALICE", factType = "USER_UPDATED"))
      val hist = found(fs.findBySubject(s, "USER:ALICE"))
      assert(hist.map(_.factType) == Seq("USER_CREATED", "USER_UPDATED"))
      assert(hist.map(_.position) == hist.map(_.position).sorted)
      assert(fs.findBySubject(MissingStore, "USER:ALICE") == FindResult.StoreNotFound)
    }
  }

  test("findBySubject with limit and direction") {
    withStore { (fs, s) =>
      val ids = (1 to 5).map(i => appendOne(fs, s, input(factType = s"T$i")))
      val first2 = found(fs.findBySubject(s, "USER:ALICE", Limit.Of(2)))
      assert(first2.map(_.factType) == Seq("T1", "T2"))
      val last2 = found(fs.findBySubject(s, "USER:ALICE", Limit.Of(2), ReadDirection.Backward))
      assert(last2.map(_.factType) == Seq("T5", "T4")) // newest first
      // limit larger than result set returns everything (reference :753-773)
      assert(found(fs.findBySubject(s, "USER:ALICE", Limit.Of(100))).size == 5)
    }
  }

  test("findByTags: AND semantics with limit/direction on intersection") {
    withStore { (fs, s) =>
      appendOne(fs, s, input(subject = "USER:ALICE", tags = Map("role" -> "admin", "region" -> "eu")))
      appendOne(fs, s, input(subject = "USER:BOB", tags = Map("role" -> "admin", "region" -> "us")))
      appendOne(fs, s, input(subject = "USER:CHARLIE", tags = Map("role" -> "admin", "region" -> "eu")))
      appendOne(fs, s, input(subject = "USER:DAVE", tags = Map("role" -> "user", "region" -> "eu")))
      val hits = found(fs.findByTags(s, Map("role" -> "admin", "region" -> "eu")))
      assert(hits.map(_.subject) == Seq("USER:ALICE", "USER:CHARLIE"))
      val back1 = found(fs.findByTags(s, Map("role" -> "admin", "region" -> "eu"),
        Limit.Of(1), ReadDirection.Backward))
      assert(back1.map(_.subject) == Seq("USER:CHARLIE")) // newest match first
      assert(found(fs.findByTags(s, Map("role" -> "missing"))).isEmpty)
    }
  }

  test("findByTagQuery: OR across items, AND within; ordered by position") {
    withStore { (fs, s) =>
      appendOne(fs, s, input(subject = "USER:ALICE", factType = "USER_CREATED",
        tags = Map("username" -> "alice", "region" -> "eu")))
      appendOne(fs, s, input(subject = "USER:BOB", factType = "USER_CREATED",
        tags = Map("username" -> "bob", "region" -> "us")))
      appendOne(fs, s, input(subject = "USER:CHARLIE", factType = "USER_DELETED",
        tags = Map("username" -> "charlie", "region" -> "us")))

      // TagType: type AND tags
      val q1 = TagQuery(Seq(TagQueryItem.TagType(Set("USER_CREATED"), Map("username" -> "bob"))))
      assert(found(fs.findByTagQuery(s, q1)).map(_.subject) == Seq("USER:BOB"))
      // multi-tag AND: no cross-fact match
      val q2 = TagQuery(Seq(TagQueryItem.TagOnly(Map("username" -> "bob", "region" -> "eu"))))
      assert(found(fs.findByTagQuery(s, q2)).isEmpty)
      val q3 = TagQuery(Seq(TagQueryItem.TagOnly(Map("username" -> "bob", "region" -> "us"))))
      assert(found(fs.findByTagQuery(s, q3)).map(_.subject) == Seq("USER:BOB"))
      // multi-type OR
      val q4 = TagQuery(Seq(TagQueryItem.TagType(Set("USER_CREATED", "USER_DELETED"), Map("region" -> "us"))))
      assert(found(fs.findByTagQuery(s, q4)).map(_.subject) == Seq("USER:BOB", "USER:CHARLIE"))
      // multi-item OR = union, position order
      val q5 = TagQuery(Seq(
        TagQueryItem.TagOnly(Map("username" -> "alice")),
        TagQueryItem.TagType(Set("USER_DELETED"), Map.empty)))
      assert(found(fs.findByTagQuery(s, q5)).map(_.subject) == Seq("USER:ALICE", "USER:CHARLIE"))
      // non-matching -> empty Found, never an error
      val q6 = TagQuery(Seq(TagQueryItem.TagType(Set("NOPE"), Map("x" -> "y"))))
      assert(found(fs.findByTagQuery(s, q6)).isEmpty)
      assert(fs.findByTagQuery(MissingStore, q1) == FindResult.StoreNotFound)
    }
  }

  test("findInTimeRange: half-open [start, end), open bounds, limit+direction") {
    withStore { (fs, s) =>
      def at(i: Int): Instant = {
        appendOne(fs, s, input(factType = s"T$i"))
        Thread.sleep(15)
        found(fs.findBySubject(s, "USER:ALICE", Limit.Of(1), ReadDirection.Backward)).head.appendedAt
      }
      val t1 = at(1); val t2 = at(2); val t3 = at(3)
      val hits = found(fs.findInTimeRange(s, TimeRange.between(t1, t3)))
      assert(hits.map(_.factType) == Seq("T1", "T2"), "start inclusive, end exclusive")
      assert(found(fs.findInTimeRange(s, TimeRange.from(t2))).map(_.factType) == Seq("T2", "T3"))
      assert(found(fs.findInTimeRange(s, TimeRange.until(t2))).map(_.factType) == Seq("T1"))
      assert(found(fs.findInTimeRange(s, TimeRange.unbounded)).size == 3)
      val back = found(fs.findInTimeRange(s, TimeRange.unbounded, Limit.Of(2), ReadDirection.Backward))
      assert(back.map(_.factType) == Seq("T3", "T2"))
      assert(fs.findInTimeRange(MissingStore, TimeRange.unbounded) == FindResult.StoreNotFound)
    }
  }

  // --- replay (reference :888-959) ---------------------------------------------
  test("replay from beginning drains whole store then completes") {
    withStore { (fs, s) =>
      val ids = (1 to 5).map(i => appendOne(fs, s, input(factType = s"T$i")))
      val Right(it) = fs.replay(s, ReplayStart.Beginning): @unchecked
      val all = it.flatten.toSeq
      assert(all.map(_.factType) == (1 to 5).map(i => s"T$i"))
      assert(all.map(_.id) == ids)
    }
  }

  test("replay after cursor returns only the delta") {
    withStore { (fs, s) =>
      val id1 = appendOne(fs, s, input(factType = "T1"))
      appendOne(fs, s, input(factType = "T2"))
      appendOne(fs, s, input(factType = "T3"))
      val Right(it) = fs.replay(s, ReplayStart.After(id1)): @unchecked
      assert(it.flatten.map(_.factType).toSeq == Seq("T2", "T3"))
    }
  }

  test("replay: empty store / empty delta complete immediately") {
    withStore { (fs, s) =>
      val Right(it0) = fs.replay(s, ReplayStart.Beginning): @unchecked
      assert(it0.flatten.isEmpty)
      val id = appendOne(fs, s, input())
      val Right(it1) = fs.replay(s, ReplayStart.After(id)): @unchecked
      assert(it1.flatten.isEmpty)
    }
  }

  test("replay errors: unknown cursor, missing store") {
    withStore { (fs, s) =>
      assert(fs.replay(s, ReplayStart.After("nope")) == Left(StreamError.FactIdNotFound("nope")))
      assert(fs.replay(MissingStore, ReplayStart.Beginning) == Left(StreamError.StoreNotFound))
    }
  }

  test("replay excludes facts appended after open (pinned head)") {
    withStore { (fs, s) =>
      (1 to 3).foreach(i => appendOne(fs, s, input(factType = s"T$i")))
      val Right(it) = fs.replay(s, ReplayStart.Beginning, batchSize = 1): @unchecked
      val first = it.next()
      appendOne(fs, s, input(factType = "LATE"))
      val rest = it.flatten.toSeq
      assert((first ++ rest).map(_.factType) == Seq("T1", "T2", "T3"))
    }
  }

  // --- envelope round-trips (reference :77-85 helper pattern) ------------------
  test("payload bytes, format and schema are stored verbatim (spec, not the fdb copy-bug)") {
    withStore { (fs, s) =>
      val bytes = Array.tabulate(256)(i => i.toByte)
      val id = appendOne(fs, s, FactInput("BIN", "subj", bytes,
        payloadFormat = Some("Avro"), payloadSchema = Some("schemas/v1/thing")))
      fs.findById(s, id) match {
        case FindByIdResult.Found(f) =>
          assert(f.payloadData.toSeq == bytes.toSeq)
          assert(f.payloadFormat.contains("Avro"))
          // SURVEY §2 fine print: fdb copies format into schema; the spec
          // (and we) keep them independent
          assert(f.payloadSchema.contains("schemas/v1/thing"))
        case other => fail(s"$other")
      }
    }
  }

  test("metadata map round-trips and does not affect tag queries") {
    withStore { (fs, s) =>
      val id = appendOne(fs, s, input(metadata = Map("origin" -> "import", "n" -> "42")))
      fs.findById(s, id) match {
        case FindByIdResult.Found(f) =>
          assert(f.metadata == Map("origin" -> "import", "n" -> "42"))
        case other => fail(s"$other")
      }
      // metadata keys are not tags
      assert(found(fs.findByTags(s, Map("origin" -> "import"))).isEmpty)
    }
  }

  test("presence-only tags: empty TagValue is legal and queryable") {
    withStore { (fs, s) =>
      val id = appendOne(fs, s, input(tags = Map("flagged" -> "")))
      val hits = found(fs.findByTags(s, Map("flagged" -> "")))
      assert(hits.map(_.id) == Seq(id))
    }
  }

  test("appendedAt is non-decreasing across appends") {
    withStore { (fs, s) =>
      val ats = (1 to 5).map { i =>
        fs.append(s, input(factType = s"T$i")) match {
          case AppendResult.Appended(_, at) => at
          case other => fail(s"$other")
        }
      }
      assert(ats.sliding(2).forall { case Seq(a, b) => !b.isBefore(a) })
    }
  }

  // --- limit semantics (reference :753-773) ------------------------------------
  test("limits larger than the result set return everything") {
    withStore { (fs, s) =>
      (1 to 3).foreach(i => appendOne(fs, s, input(factType = s"T$i")))
      assert(found(fs.findBySubject(s, "USER:ALICE", Limit.Of(100))).size == 3)
      assert(found(fs.findByTags(s, Map("role" -> "admin"), Limit.Of(100))).size == 3)
      assert(found(fs.findInTimeRange(s, TimeRange.unbounded, Limit.Of(100))).size == 3)
    }
  }

  // --- tag-query matrix extras (reference :969-1227) ---------------------------
  test("TagType with multiple types: OR over types, AND over tags") {
    withStore { (fs, s) =>
      appendOne(fs, s, input(factType = "A", tags = Map("x" -> "1")))
      appendOne(fs, s, input(factType = "B", tags = Map("x" -> "1")))
      appendOne(fs, s, input(factType = "C", tags = Map("x" -> "1")))
      appendOne(fs, s, input(factType = "A", tags = Map("x" -> "2")))
      val hits = found(fs.findByTagQuery(s,
        TagQuery(Seq(TagQueryItem.TagType(Set("A", "B"), Map("x" -> "1"))))))
      assert(hits.map(_.factType) == Seq("A", "B"))
    }
  }

  test("TagType with empty tags is a pure type filter") {
    withStore { (fs, s) =>
      appendOne(fs, s, input(factType = "A"))
      appendOne(fs, s, input(factType = "B"))
      val hits = found(fs.findByTagQuery(s,
        TagQuery(Seq(TagQueryItem.TagType(Set("B"), Map.empty)))))
      assert(hits.map(_.factType) == Seq("B"))
    }
  }

  test("multi-item query unions without duplicating facts matched by both items") {
    withStore { (fs, s) =>
      appendOne(fs, s, input(factType = "A", tags = Map("x" -> "1", "y" -> "2")))
      val hits = found(fs.findByTagQuery(s, TagQuery(Seq(
        TagQueryItem.TagOnly(Map("x" -> "1")),
        TagQueryItem.TagOnly(Map("y" -> "2"))))))
      assert(hits.size == 1)
    }
  }

  test("invalid FactInput is rejected at construction (validated micro-types)") {
    assertThrows[IllegalArgumentException](FactInput("", "subj", Array[Byte]()))
    assertThrows[IllegalArgumentException](FactInput("T", "", Array[Byte]()))
    assertThrows[IllegalArgumentException](FactInput("T", " padded ", Array[Byte]()))
    assertThrows[IllegalArgumentException](FactInput("T", "s", Array[Byte](), tags = Map("" -> "v")))
  }

  // --- subscribe (reference :777-879) -----------------------------------------
  private def take(sub: Subscription, n: Int, timeoutMs: Long = 20000): Seq[Fact] = {
    val out = scala.collection.mutable.ArrayBuffer[Fact]()
    val worker = new Thread(() => {
      try while (out.size < n && sub.hasNext) out.synchronized { out ++= sub.next() }
      catch { case _: NoSuchElementException => () }
    })
    worker.setDaemon(true); worker.start()
    worker.join(timeoutMs)
    sub.close()
    worker.join(2000)
    out.toSeq
  }

  test("subscribe from Beginning drains catch-up then follows live appends") {
    withStore { (fs, s) =>
      (1 to 3).foreach(i => appendOne(fs, s, input(factType = s"T$i")))
      val Right(sub) = fs.subscribe(s, StartPosition.Beginning): @unchecked
      val appender = new Thread(() => {
        Thread.sleep(200)
        (4 to 5).foreach(i => appendOne(fs, s, input(factType = s"T$i")))
      })
      appender.start()
      val got = take(sub, 5)
      appender.join()
      assert(got.map(_.factType) == (1 to 5).map(i => s"T$i"))
      assert(got.map(_.position) == (1L to 5L))
    }
  }

  test("subscribe from End sees only facts appended after open") {
    withStore { (fs, s) =>
      (1 to 3).foreach(i => appendOne(fs, s, input(factType = s"OLD$i")))
      val Right(sub) = fs.subscribe(s, StartPosition.End): @unchecked
      val appender = new Thread(() => {
        Thread.sleep(200)
        appendOne(fs, s, input(factType = "NEW"))
      })
      appender.start()
      val got = take(sub, 1)
      appender.join()
      assert(got.map(_.factType) == Seq("NEW"))
    }
  }

  test("subscribe After(factId) resumes just past the cursor") {
    withStore { (fs, s) =>
      val ids = (1 to 4).map(i => appendOne(fs, s, input(factType = s"T$i")))
      val Right(sub) = fs.subscribe(s, StartPosition.After(ids(1))): @unchecked
      val got = take(sub, 2)
      assert(got.map(_.factType) == Seq("T3", "T4"))
    }
  }

  test("subscribe errors: unknown cursor, missing store") {
    withStore { (fs, s) =>
      assert(fs.subscribe(s, StartPosition.After("nope")) ==
        Left(StreamError.FactIdNotFound("nope")))
      assert(fs.subscribe(MissingStore, StartPosition.Beginning) ==
        Left(StreamError.StoreNotFound))
    }
  }

  // --- batching + atomic visibility --------------------------------------------
  test("subscription batches respect batchSize") {
    withStore { (fs, s) =>
      (1 to 7).foreach(i => appendOne(fs, s, input(factType = s"T$i")))
      val Right(sub) = fs.subscribe(s, StartPosition.Beginning, batchSize = 3): @unchecked
      val b1 = sub.next(); val b2 = sub.next(); val b3 = sub.next()
      sub.close()
      assert(b1.size == 3 && b2.size == 3 && b3.size == 1)
      assert((b1 ++ b2 ++ b3).map(_.position) == (1L to 7L))
    }
  }

  test("batch append is all-or-nothing under a failing condition") {
    withStore { (fs, s) =>
      appendOne(fs, s, input(factType = "EXISTING", tags = Map("unique" -> "yes")))
      val r = fs.append(AppendRequest(s,
        Seq(input(factType = "N1"), input(factType = "N2")),
        condition = AppendCondition.TagQueryBased(
          TagQuery(Seq(TagQueryItem.TagOnly(Map("unique" -> "yes")))))))
      assert(r == AppendResult.AppendConditionViolated)
      // neither fact of the rejected batch is visible
      val all = found(fs.findInTimeRange(s, TimeRange.unbounded))
      assert(all.map(_.factType) == Seq("EXISTING"))
    }
  }

  // --- scale probe (reference :1230-1315, shrunk) -------------------------------
  test("scale probe: 2000 facts, tag query returns the matching half") {
    withStore { (fs, s) =>
      val inputs = (0 until 2000).map { i =>
        input(subject = s"USER:user-$i",
          tags = Map("role" -> (if (i % 2 == 0) "user" else "admin"),
                     "region" -> (if (i % 4 < 2) "us" else "eu")))
      }
      inputs.grouped(500).foreach(chunk => fs.append(s, chunk))
      appendOne(fs, s, input(subject = "USER:custom", tags = Map("role" -> "custom")))
      val q = TagQuery(Seq(TagQueryItem.TagType(Set("USER_CREATED"),
        Map("role" -> "user", "region" -> "us"))))
      val hits = found(fs.findByTagQuery(s, q))
      assert(hits.size == 500) // i%2==0 && i%4<2 -> i%4==0
      assert(hits.map(_.position) == hits.map(_.position).sorted)
    }
  }
}
