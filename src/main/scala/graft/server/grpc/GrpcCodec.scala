package graft.server.grpc

import graft.core._
import Pb._

/** Encoders/decoders between the graft core model and the reference's
  * factstore-v1 protobuf messages (field numbers cite
  * factstore-proto/factstore-v1.proto). Outcomes are oneofs of typed
  * messages — business errors are data, not gRPC status codes, mirroring
  * the reference's zero-exception policy on the wire.
  */
object GrpcCodec {

  // --- common messages -------------------------------------------------------

  /** Fact (proto :12-20): id=1 type=2 subject=3 appended_at=4 payload=5
    * metadata=6 tags=7. The proto fact has no position field. */
  def writeFact(w: Writer, f: Fact): Unit = {
    w.string(1, f.id)
    w.string(2, f.factType)
    w.string(3, f.subject)
    w.msg(4, Pb.writeTimestamp(_, f.appendedAt))
    w.msg(5, { pw =>
      pw.bytes(1, f.payloadData)
      f.payloadFormat.foreach(pw.stringAlways(2, _))
      f.payloadSchema.foreach(pw.stringAlways(3, _))
    })
    w.stringMap(6, f.metadata)
    w.stringMap(7, f.tags)
  }

  /** StoreInfo (proto :29-33): id=1 name=2 created_at=3. */
  def writeStoreInfo(w: Writer, md: StoreMetadata): Unit = {
    w.string(1, md.id)
    w.string(2, md.name)
    w.msg(3, Pb.writeTimestamp(_, md.createdAt))
  }

  /** FactInput (proto :243-249): type=1 subject=2 payload=3 metadata=4 tags=5. */
  def readFactInput(m: Fields): FactInput = {
    val payload = msgOpt(m, 3)
    FactInput(
      factType = str(m, 1),
      subject = str(m, 2),
      payloadData = payload.map(p => bytesOf(p, 1)).getOrElse(Array.emptyByteArray),
      payloadFormat = payload.flatMap(p => strOpt(p, 2)),
      payloadSchema = payload.flatMap(p => strOpt(p, 3)),
      metadata = stringMapOf(m, 4),
      tags = stringMapOf(m, 5))
  }

  /** TagQuery (proto :45-65): items=1; item oneof tag_only=1 | tag_type=2. */
  def readTagQuery(m: Fields): TagQuery =
    TagQuery(msgs(m, 1).map { item =>
      (msgOpt(item, 1), msgOpt(item, 2)) match {
        case (Some(tagOnly), _) => TagQueryItem.TagOnly(stringMapOf(tagOnly, 1))
        case (_, Some(tagType)) =>
          TagQueryItem.TagType(
            types = tagType.getOrElse(1, Vector.empty)
              .map(f => new String(f.bytes, java.nio.charset.StandardCharsets.UTF_8)).toSet,
            tags = stringMapOf(tagType, 2))
        case _ => throw new IllegalArgumentException("TagQueryItem with no kind set")
      }
    })

  /** AppendCondition (proto :70-96): oneof expected_last_fact=1 |
    * tag_query_based=2 | all=3. Absent message = no condition. */
  def readCondition(m: Option[Fields]): AppendCondition = m match {
    case None => AppendCondition.None
    case Some(c) =>
      (msgOpt(c, 1), msgOpt(c, 2), msgOpt(c, 3)) match {
        case (Some(elf), _, _) =>
          AppendCondition.ExpectedLastFact(str(elf, 1), strOpt(elf, 2))
        case (_, Some(tqb), _) =>
          AppendCondition.TagQueryBased(
            readTagQuery(msgOpt(tqb, 1).getOrElse(Map.empty)), strOpt(tqb, 2))
        case (_, _, Some(all)) =>
          AppendCondition.All(msgs(all, 1).map(f => readCondition(Some(f))))
        case _ => AppendCondition.None
      }
  }

  private def readLimit(m: Fields, fn: Int): Limit =
    varintOpt(m, fn).map(_.toInt).filter(_ > 0).map(Limit.Of(_): Limit).getOrElse(Limit.None)

  private def readDirection(m: Fields, fn: Int): ReadDirection =
    if (varint(m, fn) == 1L) ReadDirection.Backward else ReadDirection.Forward

  // --- StoreService (proto :118-200) -----------------------------------------

  def createStoreResponse(r: CreateStoreResult): Array[Byte] = r match {
    case CreateStoreResult.Created(md) =>
      encode(_.msg(1, _.string(1, md.id)))
    case CreateStoreResult.NameAlreadyExists =>
      encode(_.msg(2, _ => ()))
    case CreateStoreResult.InvalidName(n) =>
      // no proto outcome for invalid names: the reference's StoreName
      // constructor throws -> surfaces as INVALID_ARGUMENT status
      throw new IllegalArgumentException(s"invalid store name: $n")
  }

  def getStoreResponse(r: Option[StoreMetadata], name: String): Array[Byte] = r match {
    case Some(md) => encode(_.msg(1, _.msg(1, writeStoreInfo(_, md))))
    case None => encode(_.msg(2, _.string(1, name)))
  }

  def listStoresResponse(stores: Seq[StoreMetadata]): Array[Byte] =
    encode(w => stores.foreach(md => w.msg(1, writeStoreInfo(_, md))))

  def deleteStoreResponse(r: RemoveStoreResult, name: String): Array[Byte] = r match {
    case RemoveStoreResult.StoreRemoved => encode(_.msg(1, _ => ()))
    case RemoveStoreResult.StoreNotFound => encode(_.msg(2, _.string(1, name)))
  }

  def storeExistsResponse(exists: Boolean): Array[Byte] =
    if (exists) encode(_.msg(1, _ => ())) else encode(_.msg(2, _ => ()))

  // --- FactService (proto :204-392) ------------------------------------------

  /** AppendFactsRequest (proto :251-256): store_name=1 facts=2
    * idempotency_key=3 condition=4. */
  def readAppendRequest(m: Fields): AppendRequest =
    AppendRequest(
      storeName = str(m, 1),
      facts = msgs(m, 2).map(readFactInput),
      idempotencyKey = strOpt(m, 3).getOrElse(java.util.UUID.randomUUID().toString),
      condition = readCondition(msgOpt(m, 4)))

  def appendResponse(r: AppendResult): Array[Byte] = r match {
    case AppendResult.Appended(ids, at) =>
      encode(_.msg(1, { w =>
        ids.foreach(w.string(1, _))
        w.msg(2, Pb.writeTimestamp(_, at))
      }))
    case AppendResult.AlreadyApplied => encode(_.msg(2, _ => ()))
    case AppendResult.AppendConditionViolated => encode(_.msg(3, _ => ()))
    case AppendResult.StoreNotFound => encode(_.msg(4, _ => ()))
  }

  def getFactResponse(r: FindByIdResult): Array[Byte] = r match {
    case FindByIdResult.Found(f) => encode(_.msg(1, _.msg(1, writeFact(_, f))))
    case FindByIdResult.NotFound => encode(_.msg(2, _ => ()))
    case FindByIdResult.StoreNotFound => encode(_.msg(3, _ => ()))
  }

  def factExistsResponse(r: ExistsByIdResult): Array[Byte] = r match {
    case ExistsByIdResult.Exists => encode(_.msg(1, _ => ()))
    case ExistsByIdResult.DoesNotExist => encode(_.msg(2, _ => ()))
    case ExistsByIdResult.StoreNotFound => encode(_.msg(3, _ => ()))
  }

  /** Shared FindResult rendering: FactsFound(facts=1) as oneof field 1,
    * StoreNotFound(store_name=1) as oneof field 2. */
  def findResponse(r: FindResult, storeName: String): Array[Byte] = r match {
    case FindResult.Found(fs) =>
      encode(_.msg(1, w => fs.foreach(f => w.msg(1, writeFact(_, f)))))
    case FindResult.StoreNotFound =>
      encode(_.msg(2, _.string(1, storeName)))
  }

  def readBySubjectRequest(m: Fields): (String, String, Limit, ReadDirection) =
    (str(m, 1), str(m, 2), readLimit(m, 3), readDirection(m, 4))

  def readByTagsRequest(m: Fields): (String, Map[String, String], Limit, ReadDirection) =
    (str(m, 1), stringMapOf(m, 2), readLimit(m, 3), readDirection(m, 4))

  def readQueryFactsRequest(m: Fields): (String, TagQuery) =
    (str(m, 1), readTagQuery(msgOpt(m, 2).getOrElse(Map.empty)))

  def readTimeRangeRequest(m: Fields): (String, TimeRange, Limit, ReadDirection) =
    (str(m, 1),
      TimeRange(msgOpt(m, 2).map(Pb.readTimestamp), msgOpt(m, 3).map(Pb.readTimestamp)),
      readLimit(m, 4), readDirection(m, 5))

  /** SubscribeFactsRequest (proto :399-408): oneof from_beginning=2 |
    * from_end=3 | after_fact_id=4. */
  def readSubscribeRequest(m: Fields): (String, StartPosition) = {
    val start =
      if (has(m, 4)) StartPosition.After(str(m, 4))
      else if (has(m, 3)) StartPosition.End
      else StartPosition.Beginning
    (str(m, 1), start)
  }

  /** ReplayFactsRequest (proto :410-419): oneof from_beginning=2 |
    * after_fact_id=3 (no from_end by design). */
  def readReplayRequest(m: Fields): (String, ReplayStart) = {
    val start =
      if (has(m, 3)) ReplayStart.After(str(m, 3))
      else ReplayStart.Beginning
    (str(m, 1), start)
  }

  /** StreamFactsResponse (proto :386-392): oneof batch=1 | store_not_found=2
    * | after_fact_not_found=3. */
  def streamBatch(facts: Seq[Fact]): Array[Byte] =
    encode(_.msg(1, w => facts.foreach(f => w.msg(1, writeFact(_, f)))))
  def streamStoreNotFound(name: String): Array[Byte] =
    encode(_.msg(2, _.string(1, name)))
  def streamAfterFactNotFound: Array[Byte] =
    encode(_.msg(3, _ => ()))

  // --- InfoService (proto :423-433) ------------------------------------------

  def serverInfoResponse(app: String, version: String, backend: String): Array[Byte] =
    encode { w => w.string(1, app); w.string(2, version); w.string(3, backend) }
}
