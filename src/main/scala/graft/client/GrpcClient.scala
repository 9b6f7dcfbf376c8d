package graft.client

import java.time.Instant

import graft.core._
import graft.server.grpc.Pb
import graft.server.grpc.Pb._

/** Typed remote [[FactStore]] over the gRPC wire surface — the counterpart
  * of the reference's client library + CLI transport
  * (factstore-client-kotlin, factstore-cli command package): every FactStore
  * operation is encoded against the same factstore-v1 field numbers the
  * server adapter uses ([[graft.server.grpc.GrpcCodec]] cites them), so a
  * graft CLI can drive a remote graft server — or any reference-compatible
  * server — without Spark on the client side.
  *
  * Semantics notes:
  *  - The proto Fact carries no position (factstore-v1.proto :12-20), so
  *    facts read over the wire have `position = 0`; order is still the
  *    server's position order.
  *  - Business errors arrive as oneof outcome messages and map 1:1 onto
  *    the core result ADTs; transport-level INVALID_ARGUMENT on CreateStore
  *    maps to [[CreateStoreResult.InvalidName]] (the reference's StoreName
  *    constructor throws, surfacing the same way).
  *  - `replay` streams through a bounded queue ([[GrpcWireClient.stream]]):
  *    a replay larger than client memory is consumed batch by batch with
  *    end-to-end flow control, never fully buffered.
  */
final class GrpcClient(host: String, port: Int) extends FactStore with AutoCloseable {

  private val Svc = "/io.factstore.server.grpc"
  private val wire = new GrpcWireClient(host, port)

  override def close(): Unit = wire.close()

  // --- decoding (field numbers mirror GrpcCodec's writers) -------------------

  private def readStoreInfo(m: Fields): StoreMetadata =
    StoreMetadata(str(m, 1), str(m, 2),
      msgOpt(m, 3).map(Pb.readTimestamp).getOrElse(Instant.EPOCH))

  private def readFact(m: Fields): Fact = {
    val payload = msgOpt(m, 5)
    Fact(
      id = str(m, 1),
      factType = str(m, 2),
      subject = str(m, 3),
      position = 0L, // not on the wire (proto Fact has no position field)
      appendedAt = msgOpt(m, 4).map(Pb.readTimestamp).getOrElse(Instant.EPOCH),
      payloadData = payload.map(p => bytesOf(p, 1)).getOrElse(Array.emptyByteArray),
      payloadFormat = payload.flatMap(p => strOpt(p, 2)),
      payloadSchema = payload.flatMap(p => strOpt(p, 3)),
      metadata = stringMapOf(m, 6),
      tags = stringMapOf(m, 7))
  }

  private def factsOf(outcome: Fields): Seq[Fact] =
    msgs(outcome, 1).map(readFact)

  // --- encoding helpers ------------------------------------------------------

  private def writeFactInput(w: Pb.Writer, f: FactInput): Unit = {
    w.string(1, f.factType)
    w.string(2, f.subject)
    w.msg(3, { pw =>
      pw.bytes(1, f.payloadData)
      f.payloadFormat.foreach(pw.stringAlways(2, _))
      f.payloadSchema.foreach(pw.stringAlways(3, _))
    })
    w.stringMap(4, f.metadata)
    w.stringMap(5, f.tags)
  }

  private def writeTagQuery(w: Pb.Writer, q: TagQuery): Unit =
    q.items.foreach {
      case TagQueryItem.TagOnly(tags) =>
        w.msg(1, _.msg(1, _.stringMap(1, tags)))
      case TagQueryItem.TagType(types, tags) =>
        w.msg(1, _.msg(2, { tw =>
          types.toSeq.sorted.foreach(tw.stringAlways(1, _))
          tw.stringMap(2, tags)
        }))
    }

  private def writeCondition(w: Pb.Writer, c: AppendCondition): Unit = c match {
    case AppendCondition.None => ()
    case AppendCondition.ExpectedLastFact(subject, lastId) =>
      w.msg(1, { ew => ew.string(1, subject); lastId.foreach(ew.stringAlways(2, _)) })
    case AppendCondition.TagQueryBased(q, after) =>
      w.msg(2, { tw => tw.msg(1, writeTagQuery(_, q)); after.foreach(tw.stringAlways(2, _)) })
    case AppendCondition.All(cs) =>
      w.msg(3, aw => cs.foreach(cc => aw.msg(1, writeCondition(_, cc))))
  }

  private def limitDir(w: Pb.Writer, limitFn: Int, dirFn: Int,
      limit: Limit, dir: ReadDirection): Unit = {
    limit match {
      case Limit.Of(n) => w.int64(limitFn, n.toLong)
      case Limit.None => ()
    }
    if (dir == ReadDirection.Backward) w.int64(dirFn, 1L)
  }

  private def oneof(m: Fields): Int = (1 to 8).find(m.contains).getOrElse(0)

  private def callOne(path: String, body: Array[Byte]): (Int, Fields, Int) = {
    val r = wire.call(path, body)
    if (r.grpcStatus != 0 || r.messages.isEmpty) (r.grpcStatus, Map.empty: Fields, 0)
    else {
      val m = Pb.parse(r.messages.head)
      (0, m, oneof(m))
    }
  }

  // --- StoreService -----------------------------------------------------------

  override def createStore(name: String): CreateStoreResult = {
    val (st, m, f) = callOne(s"$Svc.StoreService/CreateStore", Pb.encode(_.string(1, name)))
    if (st == 3) CreateStoreResult.InvalidName(name)
    else if (st != 0) throw new RuntimeException(s"CreateStore failed: grpc-status $st")
    else f match {
      case 1 =>
        // CreateStoreOutcome.created carries only the id; name/createdAt
        // come from the catalog (one extra GetStore keeps the core ADT full)
        val id = str(msgOpt(m, 1).get, 1)
        val md = findStoreByName(name).getOrElse(StoreMetadata(id, name, Instant.EPOCH))
        CreateStoreResult.Created(md.copy(id = id))
      case _ => CreateStoreResult.NameAlreadyExists
    }
  }

  override def listStores(): Seq[StoreMetadata] = {
    val (st, m, _) = callOne(s"$Svc.StoreService/ListStores", Array.emptyByteArray)
    require(st == 0, s"ListStores failed: grpc-status $st")
    msgs(m, 1).map(readStoreInfo)
  }

  override def storeExists(name: String): Boolean = {
    val (st, _, f) = callOne(s"$Svc.StoreService/StoreExists", Pb.encode(_.string(1, name)))
    require(st == 0, s"StoreExists failed: grpc-status $st")
    f == 1
  }

  override def findStoreByName(name: String): Option[StoreMetadata] = {
    val (st, m, f) = callOne(s"$Svc.StoreService/GetStore", Pb.encode(_.string(1, name)))
    require(st == 0, s"GetStore failed: grpc-status $st")
    if (f == 1) msgOpt(m, 1).flatMap(msgOpt(_, 1)).map(readStoreInfo) else None
  }

  override def removeStore(name: String): RemoveStoreResult = {
    val (st, _, f) = callOne(s"$Svc.StoreService/DeleteStore", Pb.encode(_.string(1, name)))
    require(st == 0, s"DeleteStore failed: grpc-status $st")
    if (f == 1) RemoveStoreResult.StoreRemoved else RemoveStoreResult.StoreNotFound
  }

  // --- FactService: append ----------------------------------------------------

  override def append(request: AppendRequest): AppendResult = {
    val body = Pb.encode { w =>
      w.string(1, request.storeName)
      request.facts.foreach(f => w.msg(2, writeFactInput(_, f)))
      w.stringAlways(3, request.idempotencyKey)
      if (request.condition != AppendCondition.None)
        w.msg(4, writeCondition(_, request.condition))
    }
    val (st, m, f) = callOne(s"$Svc.FactService/AppendFacts", body)
    if (st == 3) throw new IllegalArgumentException("invalid append request")
    require(st == 0, s"AppendFacts failed: grpc-status $st")
    f match {
      case 1 =>
        val ok = msgOpt(m, 1).get
        AppendResult.Appended(
          ok.getOrElse(1, Vector.empty).map(p =>
            new String(p.bytes, java.nio.charset.StandardCharsets.UTF_8)),
          msgOpt(ok, 2).map(Pb.readTimestamp).getOrElse(Instant.EPOCH))
      case 2 => AppendResult.AlreadyApplied
      case 3 => AppendResult.AppendConditionViolated
      case _ => AppendResult.StoreNotFound
    }
  }

  // --- FactService: finders ---------------------------------------------------

  override def findById(store: String, factId: String): FindByIdResult = {
    val (st, m, f) = callOne(s"$Svc.FactService/GetFact",
      Pb.encode { w => w.string(1, store); w.string(2, factId) })
    require(st == 0, s"GetFact failed: grpc-status $st")
    f match {
      case 1 => FindByIdResult.Found(readFact(msgOpt(msgOpt(m, 1).get, 1).get))
      case 2 => FindByIdResult.NotFound
      case _ => FindByIdResult.StoreNotFound
    }
  }

  override def existsById(store: String, factId: String): ExistsByIdResult = {
    val (st, _, f) = callOne(s"$Svc.FactService/FactExists",
      Pb.encode { w => w.string(1, store); w.string(2, factId) })
    require(st == 0, s"FactExists failed: grpc-status $st")
    f match {
      case 1 => ExistsByIdResult.Exists
      case 2 => ExistsByIdResult.DoesNotExist
      case _ => ExistsByIdResult.StoreNotFound
    }
  }

  private def findCall(path: String, body: Array[Byte]): FindResult = {
    val (st, m, f) = callOne(path, body)
    require(st == 0, s"$path failed: grpc-status $st")
    if (f == 1) FindResult.Found(factsOf(msgOpt(m, 1).get))
    else FindResult.StoreNotFound
  }

  override def findBySubject(store: String, subject: String,
      limit: Limit, direction: ReadDirection): FindResult =
    findCall(s"$Svc.FactService/FindFactsBySubject", Pb.encode { w =>
      w.string(1, store); w.string(2, subject); limitDir(w, 3, 4, limit, direction)
    })

  override def findByTags(store: String, tags: Map[String, String],
      limit: Limit, direction: ReadDirection): FindResult =
    findCall(s"$Svc.FactService/FindFactsByTags", Pb.encode { w =>
      w.string(1, store); w.stringMap(2, tags); limitDir(w, 3, 4, limit, direction)
    })

  override def findByTagQuery(store: String, query: TagQuery): FindResult =
    findCall(s"$Svc.FactService/QueryFacts", Pb.encode { w =>
      w.string(1, store); w.msg(2, writeTagQuery(_, query))
    })

  override def findInTimeRange(store: String, range: TimeRange,
      limit: Limit, direction: ReadDirection): FindResult =
    findCall(s"$Svc.FactService/FindFactsInTimeRange", Pb.encode { w =>
      w.string(1, store)
      range.start.foreach(i => w.msg(2, Pb.writeTimestamp(_, i)))
      range.end.foreach(i => w.msg(3, Pb.writeTimestamp(_, i)))
      limitDir(w, 4, 5, limit, direction)
    })

  // --- FactService: streams ---------------------------------------------------

  /** StreamFactsResponse oneof: batch=1 | store_not_found=2 |
    * after_fact_not_found=3. */
  private def streamOutcome(bytes: Array[Byte]): Either[StreamError, Seq[Fact]] = {
    val m = Pb.parse(bytes)
    if (has(m, 2)) Left(StreamError.StoreNotFound)
    else if (has(m, 3)) Left(StreamError.FactIdNotFound(""))
    else Right(factsOf(msgOpt(m, 1).getOrElse(Map.empty)))
  }

  override def replay(store: String, start: ReplayStart,
      batchSize: Int): Either[StreamError, Iterator[Seq[Fact]]] = {
    val body = Pb.encode { w =>
      w.string(1, store)
      start match {
        case ReplayStart.Beginning => w.msg(2, _ => ())
        case ReplayStart.After(id) => w.stringAlways(3, id)
      }
    }
    val h = wire.stream(s"$Svc.FactService/ReplayFacts", body)
    h.next() match {
      case None => Right(Iterator.empty) // empty store: clean end, no batches
      case Some(first) => streamOutcome(first) match {
        case Left(e) => h.close(); Left(e)
        case Right(firstBatch) =>
          Right(new Iterator[Seq[Fact]] {
            private var pending: Option[Seq[Fact]] = Some(firstBatch)
            private def pull(): Unit = if (pending.isEmpty)
              pending = h.next().map(b => streamOutcome(b) match {
                case Right(facts) => facts
                case Left(e) => throw new IllegalStateException(s"mid-stream error: $e")
              })
            override def hasNext: Boolean = { pull(); pending.isDefined }
            override def next(): Seq[Fact] = {
              pull()
              val b = pending.getOrElse(throw new NoSuchElementException)
              pending = None
              b
            }
          })
      }
    }
  }

  override def subscribe(store: String, start: StartPosition,
      batchSize: Int): Either[StreamError, Subscription] = {
    val body = Pb.encode { w =>
      w.string(1, store)
      start match {
        case StartPosition.Beginning => w.msg(2, _ => ())
        case StartPosition.End => w.msg(3, _ => ())
        case StartPosition.After(id) => w.stringAlways(4, id)
      }
    }
    // Pre-flight the start-cursor errors with cheap unary RPCs: an idle
    // subscribe produces no first message to inspect (it blocks until a
    // fact arrives), so the error/ok decision cannot wait for stream data.
    // The server still emits error envelopes for races (store deleted
    // between check and stream) — those surface from next() as a terminal
    // IllegalStateException.
    if (!storeExists(store)) return Left(StreamError.StoreNotFound)
    start match {
      case StartPosition.After(id) if existsById(store, id) != ExistsByIdResult.Exists =>
        return Left(StreamError.FactIdNotFound(id))
      case _ => ()
    }
    val h = wire.stream(s"$Svc.FactService/SubscribeFacts", body)
    Right(new Subscription {
      @volatile private var closed = false
      override def hasNext: Boolean = !closed
      override def next(): Seq[Fact] = {
        val msg = h.next(timeoutMs = Long.MaxValue / 2)
          .getOrElse(throw new NoSuchElementException("subscription ended"))
        streamOutcome(msg) match {
          case Right(facts) => facts
          case Left(e) => close(); throw new IllegalStateException(s"stream error: $e")
        }
      }
      override def close(): Unit = { closed = true; h.close() }
    })
  }

  // --- InfoService ------------------------------------------------------------

  /** (app, version, backend) from GetServerInfo. */
  def serverInfo(): (String, String, String) = {
    val (st, m, _) = callOne(s"$Svc.InfoService/GetServerInfo", Array.emptyByteArray)
    require(st == 0, s"GetServerInfo failed: grpc-status $st")
    (str(m, 1), str(m, 2), str(m, 3))
  }
}
