package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.client.GrpcClient
import graft.core._
import graft.server.grpc.GrpcServer
import graft.store.SparkFactStore

/** Wire-mode CLI + typed-client integration: the same `graft.Cli` commands
  * a user runs locally, routed over gRPC to a live server through
  * [[graft.client.GrpcClient]] (reference capability: factstore-cli over
  * factstore-client-kotlin). No Spark on the client path — wire mode must
  * work from a machine with nothing but the jar. */
class CliWireSpec extends AnyFunSuite {

  private def withServer(body: (Int, SparkFactStore) => Unit): Unit = {
    val fs = new SparkFactStore(SparkTestSession.spark,
      Files.createTempDirectory("graft-cliwire-"))
    val srv = new GrpcServer(fs).start()
    try body(srv.boundPort, fs)
    finally srv.stop()
  }

  private def cli(args: String*): String = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out, true, "UTF-8")) {
      Cli.main(args.toArray)
    }
    out.toString("UTF-8")
  }

  test("CLI wire mode: create / list / append / find / replay / remove") {
    withServer { (port, _) =>
      val s = s"127.0.0.1:$port"
      assert(cli("--server", s, "store", "create", "wired").contains("Created"))
      assert(cli("--server", s, "store", "list").contains("wired"))
      assert(cli("--server", s, "fact", "append", "wired", "ORDER_PLACED",
        "order/1", """{"total":9}""", "env=prod").contains("Appended"))
      assert(cli("--server", s, "fact", "append", "wired", "ORDER_SHIPPED",
        "order/1", "{}", "env=prod").contains("Appended"))

      val byTags = cli("--server", s, "fact", "find-by-tags", "wired", "env=prod")
      assert(byTags.contains("ORDER_PLACED") && byTags.contains("ORDER_SHIPPED"))

      val bySubject = cli("--server", s, "fact", "find-by-subject", "wired",
        "order/1", "--limit", "1", "--direction", "backward")
      assert(bySubject.contains("ORDER_SHIPPED") && !bySubject.contains("ORDER_PLACED"))

      val replayed = cli("--server", s, "fact", "replay", "wired")
      assert(replayed.contains("ORDER_PLACED") && replayed.contains("ORDER_SHIPPED"))

      // --max bounds within a catch-up batch, not just at batch boundaries
      val capped = cli("--server", s, "fact", "subscribe", "wired", "--max", "1")
      assert(capped.linesIterator.count(_.nonEmpty) == 1 &&
        capped.contains("ORDER_PLACED"))

      assert(cli("--server", s, "store", "remove", "wired").contains("StoreRemoved"))
      assert(cli("--server", s, "store", "remove", "wired").contains("StoreNotFound"))
    }
  }

  test("GrpcClient: store results, invalid name, full metadata round-trip") {
    withServer { (port, _) =>
      val c = new GrpcClient("127.0.0.1", port)
      try {
        val created = c.createStore("orders")
        assert(created.isInstanceOf[CreateStoreResult.Created])
        val md = created.asInstanceOf[CreateStoreResult.Created].metadata
        assert(md.name == "orders" && md.id.length == 36)
        assert(c.createStore("orders") == CreateStoreResult.NameAlreadyExists)
        assert(c.createStore("1bad") == CreateStoreResult.InvalidName("1bad"))
        assert(c.storeExists("orders") && !c.storeExists("nope"))
        assert(c.findStoreByName("orders").exists(_.id == md.id))
        assert(c.listStores().map(_.name).contains("orders"))
      } finally c.close()
    }
  }

  test("GrpcClient: append outcomes — idempotency, conditions, payload round-trip") {
    withServer { (port, _) =>
      val c = new GrpcClient("127.0.0.1", port)
      try {
        c.createStore("orders")
        val a1 = c.append(AppendRequest("orders", Seq(FactInput("A", "s/1",
          "hello".getBytes("UTF-8"), payloadFormat = Some("JSON"),
          metadata = Map("m" -> "1"), tags = Map("k" -> "v"))),
          idempotencyKey = "fixed-key"))
        assert(a1.isInstanceOf[AppendResult.Appended])
        assert(c.append(AppendRequest("orders", Seq(FactInput("A", "s/1",
          Array[Byte]())), idempotencyKey = "fixed-key") ) == AppendResult.AlreadyApplied)
        assert(c.append("nope", FactInput("A", "s", Array[Byte]())) ==
          AppendResult.StoreNotFound)

        // conditional append: wrong expectation violates, right one commits
        val lastId = a1.asInstanceOf[AppendResult.Appended].factIds.head
        assert(c.append(AppendRequest("orders", Seq(FactInput("B", "s/1", Array[Byte]())),
          condition = AppendCondition.ExpectedLastFact("s/1", None))) ==
          AppendResult.AppendConditionViolated)
        assert(c.append(AppendRequest("orders", Seq(FactInput("B", "s/1", Array[Byte]())),
          condition = AppendCondition.ExpectedLastFact("s/1", Some(lastId))))
          .isInstanceOf[AppendResult.Appended])

        // payload + metadata + tags survive the round trip
        val f = c.findById("orders", lastId) match {
          case FindByIdResult.Found(x) => x
          case other => fail(s"expected Found, got $other")
        }
        assert(new String(f.payloadData, "UTF-8") == "hello")
        assert(f.payloadFormat.contains("JSON"))
        assert(f.metadata == Map("m" -> "1") && f.tags == Map("k" -> "v"))
        assert(c.existsById("orders", lastId) == ExistsByIdResult.Exists)
        assert(c.existsById("orders", "00000000-0000-0000-0000-000000000000") ==
          ExistsByIdResult.DoesNotExist)
      } finally c.close()
    }
  }

  test("GrpcClient: tag query, time range, replay stream, stream errors") {
    withServer { (port, _) =>
      val c = new GrpcClient("127.0.0.1", port)
      try {
        c.createStore("orders")
        c.append("orders", FactInput("A", "s/1", Array[Byte](), tags = Map("env" -> "prod")))
        c.append("orders", FactInput("B", "s/2", Array[Byte](), tags = Map("env" -> "dev")))

        val q = TagQuery(Seq(TagQueryItem.TagType(Set("A"), Map("env" -> "prod"))))
        val qr = c.findByTagQuery("orders", q) match {
          case FindResult.Found(fs) => fs
          case other => fail(s"expected Found, got $other")
        }
        assert(qr.map(_.factType) == Seq("A"))

        val tr = c.findInTimeRange("orders",
          TimeRange(Some(java.time.Instant.EPOCH), None)) match {
          case FindResult.Found(fs) => fs.map(_.factType)
          case other => fail(s"expected Found, got $other")
        }
        assert(tr == Seq("A", "B"))

        val batches = c.replay("orders", ReplayStart.Beginning) match {
          case Right(it) => it.toVector
          case Left(e) => fail(s"replay failed: $e")
        }
        assert(batches.flatten.map(_.factType) == Vector("A", "B"))

        assert(c.replay("nope", ReplayStart.Beginning) == Left(StreamError.StoreNotFound))
        assert(c.replay("orders", ReplayStart.After("missing-id")).isLeft)
        assert(c.subscribe("nope", StartPosition.Beginning) ==
          Left(StreamError.StoreNotFound))
        assert(c.subscribe("orders", StartPosition.After("missing-id")) ==
          Left(StreamError.FactIdNotFound("missing-id")))

        // live subscribe: catch-up batch arrives, then close
        val sub = c.subscribe("orders", StartPosition.Beginning) match {
          case Right(s) => s
          case Left(e) => fail(s"subscribe failed: $e")
        }
        try assert(sub.next().map(_.factType) == Seq("A", "B"))
        finally sub.close()

        val (app, version, backend) = c.serverInfo()
        assert(app == "graft" && version.nonEmpty && backend.nonEmpty)
      } finally c.close()
    }
  }
}
