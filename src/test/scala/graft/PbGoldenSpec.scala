package graft

import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.server.grpc.{GrpcCodec, Pb}

/** Golden-bytes cross-check for the hand-rolled protobuf codec.
  *
  * PbSpec proves Pb round-trips with itself; this spec proves the bytes are
  * what an INDEPENDENT protobuf implementation produces for the
  * factstore-v1 messages. protoc is unavailable offline, so the second
  * implementation is scripts/proto_golden.py — an encoder written directly
  * from the public wire-format spec and the reference's .proto field
  * numbers (factstore-proto/factstore-v1.proto), sharing no code with
  * Pb.scala. Its output is checked in as src/test/resources/
  * proto_golden.json; regenerate with `python3 scripts/proto_golden.py`.
  *
  * Covers representative messages of all 15 rpcs: every response encoder
  * is asserted byte-for-byte, and every request decoder is fed the golden
  * bytes and must produce the exact domain values.
  */
class PbGoldenSpec extends AnyFunSuite {

  private val golden: Map[String, Array[Byte]] = {
    val in = getClass.getResourceAsStream("/proto_golden.json")
    val text = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(text)
    val it = node.properties().iterator()
    val b = Map.newBuilder[String, Array[Byte]]
    while (it.hasNext) {
      val e = it.next()
      b += e.getKey -> e.getValue.asText().grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    }
    b.result()
  }

  private def assertBytes(name: String, actual: Array[Byte]): Unit =
    assert(java.util.Arrays.equals(actual, golden(name)),
      s"$name: codec bytes ${actual.map("%02x".format(_)).mkString} != " +
        s"golden ${golden(name).map("%02x".format(_)).mkString}")

  // fixture values mirrored from scripts/proto_golden.py
  private val t0 = Instant.ofEpochSecond(1700000000L, 123456789L)
  private val fact = Fact(
    id = "f-1", factType = "ORDER_PLACED", subject = "order/1",
    position = 99L, // proto Fact has no position field — must not leak into bytes
    appendedAt = Instant.ofEpochSecond(1700000002L, 42L),
    payloadData = """{"total":42}""".getBytes("UTF-8"),
    payloadFormat = Some("json"), payloadSchema = Some("s1"),
    metadata = Map("m" -> "1"), tags = Map("b" -> "y", "a" -> "x"))

  // --- InfoService -----------------------------------------------------------

  test("ServerInfo bytes match the independent encoding") {
    assertBytes("server_info",
      GrpcCodec.serverInfoResponse("graft", "0.1.0", "spark-parquet-log"))
  }

  // --- StoreService ----------------------------------------------------------

  test("CreateStoreResponse: created + name_already_exists") {
    val md = StoreMetadata("11111111-2222-3333-4444-555555555555", "orders", t0)
    assertBytes("create_store_created",
      GrpcCodec.createStoreResponse(CreateStoreResult.Created(md)))
    assertBytes("create_store_name_exists",
      GrpcCodec.createStoreResponse(CreateStoreResult.NameAlreadyExists))
  }

  test("GetStoreResponse: found (nested StoreInfo + Timestamp) + not_found") {
    val md = StoreMetadata("id-1", "orders", t0)
    assertBytes("get_store_found", GrpcCodec.getStoreResponse(Some(md), "orders"))
    assertBytes("get_store_not_found", GrpcCodec.getStoreResponse(None, "orders"))
  }

  test("ListStoresResponse: repeated StoreInfo") {
    assertBytes("list_stores", GrpcCodec.listStoresResponse(Seq(
      StoreMetadata("id-1", "orders", t0), StoreMetadata("id-2", "parts", t0))))
  }

  test("DeleteStoreResponse + StoreExistsResponse outcomes") {
    assertBytes("delete_store_deleted",
      GrpcCodec.deleteStoreResponse(RemoveStoreResult.StoreRemoved, "orders"))
    assertBytes("store_exists_present", GrpcCodec.storeExistsResponse(true))
    assertBytes("store_exists_absent", GrpcCodec.storeExistsResponse(false))
  }

  // --- FactService responses -------------------------------------------------

  test("AppendFactsResponse: all four outcomes") {
    assertBytes("append_appended", GrpcCodec.appendResponse(
      AppendResult.Appended(Seq("f1", "f2"), Instant.ofEpochSecond(1700000001L, 5L))))
    assertBytes("append_already_applied",
      GrpcCodec.appendResponse(AppendResult.AlreadyApplied))
    assertBytes("append_condition_violated",
      GrpcCodec.appendResponse(AppendResult.AppendConditionViolated))
    assertBytes("append_store_not_found",
      GrpcCodec.appendResponse(AppendResult.StoreNotFound))
  }

  test("GetFactResponse: full Fact (payload, sorted maps, no position leak)") {
    assertBytes("get_fact_found", GrpcCodec.getFactResponse(FindByIdResult.Found(fact)))
    assertBytes("get_fact_not_found", GrpcCodec.getFactResponse(FindByIdResult.NotFound))
  }

  test("FactExistsResponse present") {
    assertBytes("fact_exists_present", GrpcCodec.factExistsResponse(ExistsByIdResult.Exists))
  }

  test("Find responses: FactsFound + StoreNotFound") {
    assertBytes("find_found", GrpcCodec.findResponse(FindResult.Found(Seq(fact)), "orders"))
    assertBytes("find_store_not_found",
      GrpcCodec.findResponse(FindResult.StoreNotFound, "orders"))
  }

  test("StreamFactsResponse: batch + store_not_found + after_fact_not_found") {
    assertBytes("stream_batch", GrpcCodec.streamBatch(Seq(fact)))
    assertBytes("stream_store_not_found", GrpcCodec.streamStoreNotFound("orders"))
    assertBytes("stream_after_fact_not_found", GrpcCodec.streamAfterFactNotFound)
  }

  // --- FactService requests: golden bytes -> domain values -------------------

  test("AppendFactsRequest parses: facts, payload, key, nested All condition") {
    val r = GrpcCodec.readAppendRequest(Pb.parse(golden("append_request")))
    assert(r.storeName == "orders")
    assert(r.idempotencyKey == "key-1")
    assert(r.facts.size == 1)
    val f = r.facts.head
    assert(f.factType == "T" && f.subject == "s")
    assert(f.payloadData.toSeq == Seq[Byte](1, 2))
    assert(f.payloadFormat.contains("json") && f.payloadSchema.isEmpty)
    assert(f.tags == Map("k" -> "v") && f.metadata.isEmpty)
    r.condition match {
      case AppendCondition.All(Seq(
        AppendCondition.ExpectedLastFact("s", Some("e-1")),
        AppendCondition.TagQueryBased(q, Some("a-1")))) =>
        assert(q.items == Seq(
          TagQueryItem.TagOnly(Map("k" -> "v")),
          TagQueryItem.TagType(Set("A", "B"), Map("t" -> "u"))))
      case other => fail(s"condition parsed as $other")
    }
  }

  test("FindFactsBySubjectRequest parses limit + BACKWARD") {
    val (store, subject, limit, dir) =
      GrpcCodec.readBySubjectRequest(Pb.parse(golden("by_subject_request")))
    assert(store == "orders" && subject == "order/1")
    assert(limit == Limit.Of(5) && dir == ReadDirection.Backward)
  }

  test("FindFactsByTagsRequest parses map, default limit + direction") {
    val (store, tags, limit, dir) =
      GrpcCodec.readByTagsRequest(Pb.parse(golden("by_tags_request")))
    assert(store == "orders" && tags == Map("k" -> "v"))
    assert(limit == Limit.None && dir == ReadDirection.Forward)
  }

  test("QueryFactsRequest parses both TagQueryItem kinds") {
    val (store, q) = GrpcCodec.readQueryFactsRequest(Pb.parse(golden("query_facts_request")))
    assert(store == "orders")
    assert(q.items == Seq(
      TagQueryItem.TagOnly(Map("k" -> "v")),
      TagQueryItem.TagType(Set("A"), Map("t" -> "u"))))
  }

  test("FindFactsInTimeRangeRequest parses bounds, limit, direction") {
    val (store, range, limit, dir) =
      GrpcCodec.readTimeRangeRequest(Pb.parse(golden("time_range_request")))
    assert(store == "orders")
    assert(range.start.contains(Instant.ofEpochSecond(1700000000L)))
    assert(range.end.contains(Instant.ofEpochSecond(1700000100L)))
    assert(limit == Limit.Of(7) && dir == ReadDirection.Backward)
  }

  test("SubscribeFactsRequest parses all three start positions") {
    def sub(name: String) = GrpcCodec.readSubscribeRequest(Pb.parse(golden(name)))
    assert(sub("subscribe_from_beginning") == ("orders", StartPosition.Beginning))
    assert(sub("subscribe_from_end") == ("orders", StartPosition.End))
    assert(sub("subscribe_after") == ("orders", StartPosition.After("f-9")))
  }

  test("ReplayFactsRequest parses both start positions") {
    def rep(name: String) = GrpcCodec.readReplayRequest(Pb.parse(golden(name)))
    assert(rep("replay_from_beginning") == ("orders", ReplayStart.Beginning))
    assert(rep("replay_after") == ("orders", ReplayStart.After("f-7")))
  }
}
