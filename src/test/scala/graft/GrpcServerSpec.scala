package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.server.grpc.{GrpcServer, Pb}
import graft.server.grpc.Pb._
import graft.store.SparkFactStore

/** gRPC integration suite mirroring the outcome variants of the reference's
  * GrpcStoreServiceTest / GrpcFactServiceTest / GrpcInfoServiceTest: every
  * oneof outcome (created / name_already_exists / found / not_found /
  * already_applied / condition_violated / store_not_found / present /
  * absent / batch / after_fact_not_found) is exercised over a real HTTP/2
  * connection with hand-decoded protobuf. */
class GrpcServerSpec extends AnyFunSuite {

  private val Svc = "/io.factstore.server.grpc"

  private def withServer(body: (graft.client.GrpcWireClient, SparkFactStore) => Unit): Unit = {
    val fs = new SparkFactStore(SparkTestSession.spark, Files.createTempDirectory("graft-grpc-"))
    val srv = new GrpcServer(fs).start()
    val client = new graft.client.GrpcWireClient("127.0.0.1", srv.boundPort)
    try body(client, fs)
    finally { client.close(); srv.stop() }
  }

  // --- request builders (field numbers per factstore-v1.proto) ---------------

  private def nameReq(name: String) = Pb.encode(_.string(1, name))

  private def factInput(w: Pb.Writer, tpe: String, subject: String,
      data: String = "", tags: Map[String, String] = Map.empty): Unit = {
    w.string(1, tpe); w.string(2, subject)
    w.msg(3, _.bytes(1, data.getBytes("UTF-8")))
    w.stringMap(5, tags)
  }

  private def appendReq(store: String, tpe: String, subject: String,
      tags: Map[String, String] = Map.empty, key: Option[String] = None,
      condition: Option[Pb.Writer => Unit] = None) =
    Pb.encode { w =>
      w.string(1, store)
      w.msg(2, factInput(_, tpe, subject, tags = tags))
      key.foreach(w.stringAlways(3, _))
      condition.foreach(c => w.msg(4, c))
    }

  private def idReq(store: String, id: String) =
    Pb.encode { w => w.string(1, store); w.string(2, id) }

  private def oneofField(bytes: Array[Byte]): Int = {
    val m = Pb.parse(bytes)
    (1 to 8).find(m.contains).getOrElse(0)
  }

  private def factsOf(responseOneof1: Array[Byte]): Vector[Fields] = {
    // FactsFound / FactBatch both carry repeated Fact in field 1
    val outcome = msgOpt(Pb.parse(responseOneof1), 1).getOrElse(Map.empty)
    outcome.getOrElse(1, Vector.empty).map(f => Pb.parse(f.bytes))
  }

  // --- StoreService -----------------------------------------------------------

  test("StoreService: create, duplicate, invalid name, get, list, delete, exists") {
    withServer { (c, _) =>
      // created (oneof field 1) with a UUID id
      val created = c.call(s"$Svc.StoreService/CreateStore", nameReq("orders"))
      assert(created.grpcStatus == 0)
      val createdMsg = msgOpt(Pb.parse(created.messages.head), 1).get
      assert(str(createdMsg, 1).length == 36)

      // duplicate -> name_already_exists (oneof field 2)
      val dup = c.call(s"$Svc.StoreService/CreateStore", nameReq("orders"))
      assert(oneofField(dup.messages.head) == 2)

      // invalid name -> INVALID_ARGUMENT status (no proto outcome for it)
      val bad = c.call(s"$Svc.StoreService/CreateStore", nameReq("1bad"))
      assert(bad.grpcStatus == 3)

      // get found: StoreInfo with matching name
      val got = c.call(s"$Svc.StoreService/GetStore", nameReq("orders"))
      val info = msgOpt(msgOpt(Pb.parse(got.messages.head), 1).get, 1).get
      assert(str(info, 2) == "orders")

      // get missing -> not_found with store_name echoed
      val miss = c.call(s"$Svc.StoreService/GetStore", nameReq("nope"))
      assert(oneofField(miss.messages.head) == 2)
      assert(str(msgOpt(Pb.parse(miss.messages.head), 2).get, 1) == "nope")

      // list contains the store
      val list = c.call(s"$Svc.StoreService/ListStores", Array.emptyByteArray)
      val names = Pb.parse(list.messages.head).getOrElse(1, Vector.empty)
        .map(f => str(Pb.parse(f.bytes), 2))
      assert(names.contains("orders"))

      // exists: present then absent after delete
      assert(oneofField(c.call(s"$Svc.StoreService/StoreExists", nameReq("orders")).messages.head) == 1)
      assert(oneofField(c.call(s"$Svc.StoreService/DeleteStore", nameReq("orders")).messages.head) == 1)
      assert(oneofField(c.call(s"$Svc.StoreService/StoreExists", nameReq("orders")).messages.head) == 2)
      assert(oneofField(c.call(s"$Svc.StoreService/DeleteStore", nameReq("orders")).messages.head) == 2)
    }
  }

  test("InfoService: GetServerInfo fields") {
    withServer { (c, _) =>
      val r = c.call(s"$Svc.InfoService/GetServerInfo", Array.emptyByteArray)
      val m = Pb.parse(r.messages.head)
      assert(str(m, 1) == "graft")
      assert(str(m, 2).nonEmpty)
      assert(str(m, 3) == "spark-parquet-log")
    }
  }

  test("unknown method -> UNIMPLEMENTED status") {
    withServer { (c, _) =>
      assert(c.call(s"$Svc.StoreService/Nope", Array.emptyByteArray).grpcStatus == 12)
    }
  }

  // --- FactService: append ----------------------------------------------------

  test("AppendFacts: appended ids + shared timestamp; already_applied; condition_violated; store_not_found") {
    withServer { (c, _) =>
      c.call(s"$Svc.StoreService/CreateStore", nameReq("s"))

      val ok = c.call(s"$Svc.FactService/AppendFacts",
        appendReq("s", "USER_CREATED", "USER:1", tags = Map("role" -> "admin"), key = Some("k1")))
      val appended = msgOpt(Pb.parse(ok.messages.head), 1).get
      assert(appended.getOrElse(1, Vector.empty).size == 1) // one fact id
      assert(msgOpt(appended, 2).isDefined)                 // appended_at set

      // same idempotency key -> already_applied (oneof field 2)
      val dup = c.call(s"$Svc.FactService/AppendFacts",
        appendReq("s", "USER_CREATED", "USER:1", key = Some("k1")))
      assert(oneofField(dup.messages.head) == 2)

      // expected_last_fact(no previous) on an occupied subject -> violated (3)
      val cond = c.call(s"$Svc.FactService/AppendFacts",
        appendReq("s", "T", "USER:1",
          condition = Some(_.msg(1, _.string(1, "USER:1")))))
      assert(oneofField(cond.messages.head) == 3)

      // missing store -> store_not_found (4)
      val nf = c.call(s"$Svc.FactService/AppendFacts", appendReq("nope", "T", "x"))
      assert(oneofField(nf.messages.head) == 4)
    }
  }

  // --- FactService: point reads ----------------------------------------------

  test("GetFact / FactExists outcome variants") {
    withServer { (c, _) =>
      c.call(s"$Svc.StoreService/CreateStore", nameReq("s"))
      val ok = c.call(s"$Svc.FactService/AppendFacts", appendReq("s", "T", "x"))
      // FactsAppended.fact_ids is repeated string field 1
      val factId = new String(msgOpt(Pb.parse(ok.messages.head), 1).get
        .getOrElse(1, Vector.empty).head.bytes, "UTF-8")

      val found = c.call(s"$Svc.FactService/GetFact", idReq("s", factId))
      val fact = msgOpt(msgOpt(Pb.parse(found.messages.head), 1).get, 1).get
      assert(str(fact, 1) == factId && str(fact, 2) == "T" && str(fact, 3) == "x")

      assert(oneofField(c.call(s"$Svc.FactService/GetFact", idReq("s", "missing")).messages.head) == 2)
      assert(oneofField(c.call(s"$Svc.FactService/GetFact", idReq("nope", factId)).messages.head) == 3)

      assert(oneofField(c.call(s"$Svc.FactService/FactExists", idReq("s", factId)).messages.head) == 1)
      assert(oneofField(c.call(s"$Svc.FactService/FactExists", idReq("s", "missing")).messages.head) == 2)
      assert(oneofField(c.call(s"$Svc.FactService/FactExists", idReq("nope", factId)).messages.head) == 3)
    }
  }

  // --- FactService: finders ---------------------------------------------------

  test("FindFactsBySubject / ByTags / QueryFacts / InTimeRange, and their store_not_found") {
    withServer { (c, _) =>
      c.call(s"$Svc.StoreService/CreateStore", nameReq("s"))
      c.call(s"$Svc.FactService/AppendFacts", appendReq("s", "A", "x", tags = Map("k" -> "v")))
      c.call(s"$Svc.FactService/AppendFacts", appendReq("s", "B", "x"))
      c.call(s"$Svc.FactService/AppendFacts", appendReq("s", "A", "y", tags = Map("k" -> "v")))

      // by subject, backward, limit 1 -> only the latest fact for x (type B)
      val bySub = c.call(s"$Svc.FactService/FindFactsBySubject",
        Pb.encode { w => w.string(1, "s"); w.string(2, "x"); w.int64Always(3, 1L); w.int32(4, 1) })
      val subFacts = factsOf(bySub.messages.head)
      assert(subFacts.map(f => str(f, 2)) == Vector("B"))

      // by tags: both k=v facts
      val byTags = c.call(s"$Svc.FactService/FindFactsByTags",
        Pb.encode { w => w.string(1, "s"); w.stringMap(2, Map("k" -> "v")) })
      assert(factsOf(byTags.messages.head).map(f => str(f, 2)) == Vector("A", "A"))

      // tag query with TagTypeItem: type B only
      val tq = c.call(s"$Svc.FactService/QueryFacts",
        Pb.encode { w =>
          w.string(1, "s")
          w.msg(2, _.msg(1, _.msg(2, { item =>
            item.string(1, "B"); item.stringMap(2, Map.empty)
          })))
        })
      assert(factsOf(tq.messages.head).map(f => str(f, 2)) == Vector("B"))

      // tag query, no match -> empty FactsFound (still oneof field 1)
      val tqNone = c.call(s"$Svc.FactService/QueryFacts",
        Pb.encode { w =>
          w.string(1, "s")
          w.msg(2, _.msg(1, _.msg(2, _.string(1, "ZZZ"))))
        })
      assert(oneofField(tqNone.messages.head) == 1 && factsOf(tqNone.messages.head).isEmpty)

      // unbounded time range covers everything
      val tr = c.call(s"$Svc.FactService/FindFactsInTimeRange", Pb.encode(_.string(1, "s")))
      assert(factsOf(tr.messages.head).size == 3)

      // store_not_found across all four finders (oneof field 2, name echoed)
      Seq(
        s"$Svc.FactService/FindFactsBySubject" -> Pb.encode { w => w.string(1, "nope"); w.string(2, "x") },
        s"$Svc.FactService/FindFactsByTags" -> Pb.encode(_.string(1, "nope")),
        s"$Svc.FactService/QueryFacts" ->
          Pb.encode { w => w.string(1, "nope"); w.msg(2, _.msg(1, _.msg(1, _.stringMap(1, Map("a" -> "b"))))) },
        s"$Svc.FactService/FindFactsInTimeRange" -> Pb.encode(_.string(1, "nope"))
      ).foreach { case (path, req) =>
        val r = c.call(path, req)
        assert(oneofField(r.messages.head) == 2, path)
        assert(str(msgOpt(Pb.parse(r.messages.head), 2).get, 1) == "nope", path)
      }
    }
  }

  // --- FactService: streams ---------------------------------------------------

  test("ReplayFacts: batches then completion; pre-stream error envelopes") {
    withServer { (c, _) =>
      c.call(s"$Svc.StoreService/CreateStore", nameReq("s"))
      (1 to 3).foreach(i =>
        c.call(s"$Svc.FactService/AppendFacts", appendReq("s", s"T$i", "x")))

      val rep = c.call(s"$Svc.FactService/ReplayFacts", Pb.encode(_.string(1, "s")))
      assert(rep.grpcStatus == 0)
      val types = rep.messages.flatMap(m => factsOf(m)).map(f => str(f, 2))
      assert(types == Vector("T1", "T2", "T3"))

      // store not found -> single typed envelope (oneof 2), normal completion
      val nf = c.call(s"$Svc.FactService/ReplayFacts", Pb.encode(_.string(1, "nope")))
      assert(nf.grpcStatus == 0 && oneofField(nf.messages.head) == 2)

      // unknown after_fact_id -> after_fact_not_found (oneof 3)
      val cursor = c.call(s"$Svc.FactService/ReplayFacts",
        Pb.encode { w => w.string(1, "s"); w.stringAlways(3, "no-such-id") })
      assert(cursor.grpcStatus == 0 && oneofField(cursor.messages.head) == 3)
    }
  }

  test("SubscribeFacts: catch-up batch, live tail, and error envelopes") {
    withServer { (c, fs) =>
      c.call(s"$Svc.StoreService/CreateStore", nameReq("s"))
      (1 to 2).foreach(i =>
        c.call(s"$Svc.FactService/AppendFacts", appendReq("s", s"T$i", "x")))

      // catch-up: first message carries the existing facts
      val catchUp = c.call(s"$Svc.FactService/SubscribeFacts",
        Pb.encode(_.string(1, "s")), expectMessages = 1)
      assert(catchUp.messages.flatMap(factsOf).map(f => str(f, 2)) == Vector("T1", "T2"))

      // live tail from end: a fact appended after opening arrives
      val appender = new Thread(() => {
        Thread.sleep(400)
        fs.append("s", FactInput("LATE", "x", Array.emptyByteArray))
      })
      appender.start()
      val live = c.call(s"$Svc.FactService/SubscribeFacts",
        Pb.encode { w => w.string(1, "s"); w.msg(3, _ => ()) }, // from_end
        expectMessages = 1)
      appender.join()
      assert(live.messages.flatMap(factsOf).map(f => str(f, 2)) == Vector("LATE"))

      // pre-stream errors as typed envelopes
      val nf = c.call(s"$Svc.FactService/SubscribeFacts", Pb.encode(_.string(1, "nope")))
      assert(oneofField(nf.messages.head) == 2)
      val cursor = c.call(s"$Svc.FactService/SubscribeFacts",
        Pb.encode { w => w.string(1, "s"); w.stringAlways(4, "no-such-id") })
      assert(oneofField(cursor.messages.head) == 3)
    }
  }
}
