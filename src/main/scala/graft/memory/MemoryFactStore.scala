package graft.memory

import java.time.Instant
import java.util.UUID
import scala.collection.mutable

import graft.core._

/** In-memory reference backend — the executable semantic oracle, mirroring
  * the role of the reference's MemoryFactStore
  * (factstore-memory/.../MemoryFactStore.kt:27). Used by the shared contract
  * spec to pin down semantics the Spark engine must reproduce. */
final class MemoryFactStore extends FactStore {

  private final class Store(val metadata: StoreMetadata) {
    val facts = mutable.ArrayBuffer[Fact]()
    val idempotencyKeys = mutable.Set[String]()
  }
  private val stores = mutable.LinkedHashMap[String, Store]() // name -> store

  // -- store management ------------------------------------------------------
  override def createStore(name: String): CreateStoreResult = synchronized {
    if (!Validation.validStoreName(name)) CreateStoreResult.InvalidName(name)
    else if (stores.contains(name)) CreateStoreResult.NameAlreadyExists
    else {
      val md = StoreMetadata(UUID.randomUUID().toString, name, Instant.now())
      stores(name) = new Store(md)
      CreateStoreResult.Created(md)
    }
  }
  override def listStores(): Seq[StoreMetadata] =
    synchronized(stores.values.map(_.metadata).toSeq)
  override def storeExists(name: String): Boolean = synchronized(stores.contains(name))
  override def findStoreByName(name: String): Option[StoreMetadata] =
    synchronized(stores.get(name).map(_.metadata))
  override def removeStore(name: String): RemoveStoreResult = synchronized {
    if (stores.remove(name).isDefined) RemoveStoreResult.StoreRemoved
    else RemoveStoreResult.StoreNotFound
  }

  // -- append ----------------------------------------------------------------
  override def append(request: AppendRequest): AppendResult = synchronized {
    stores.get(request.storeName) match {
      case None => AppendResult.StoreNotFound
      case Some(st) =>
        if (st.idempotencyKeys.contains(request.idempotencyKey))
          AppendResult.AlreadyApplied
        else if (!conditionHolds(st, request.condition))
          AppendResult.AppendConditionViolated
        else {
          val appendedAt = Instant.now() // one shared instant per batch
          val base = st.facts.size.toLong
          val appended = request.facts.zipWithIndex.map { case (in, i) =>
            in.toFact(UUID.randomUUID().toString, base + i + 1, appendedAt)
          }
          st.facts ++= appended
          st.idempotencyKeys += request.idempotencyKey
          AppendResult.Appended(appended.map(_.id), appendedAt)
        }
    }
  }

  private def conditionHolds(st: Store, c: AppendCondition): Boolean = c match {
    case AppendCondition.None => true
    case AppendCondition.ExpectedLastFact(subject, expected) =>
      st.facts.reverseIterator.find(_.subject == subject).map(_.id) == expected
    case AppendCondition.All(cs) => cs.forall(conditionHolds(st, _))
    case AppendCondition.TagQueryBased(query, after) =>
      // nonexistent `after` fact id -> condition violated (reference
      // MemoryFactStore.kt:249), NOT trivially satisfied
      val afterPos: Option[Long] = after match {
        case Some(id) => st.facts.find(_.id == id).map(_.position)
        case None     => Some(0L)
      }
      afterPos.exists(p => !st.facts.exists(f => f.position > p && matchesQuery(f, query)))
  }

  private def matchesItem(f: Fact, item: TagQueryItem): Boolean = item match {
    case TagQueryItem.TagOnly(tags) =>
      tags.forall { case (k, v) => f.tags.get(k).contains(v) }
    case TagQueryItem.TagType(types, tags) =>
      types.contains(f.factType) && tags.forall { case (k, v) => f.tags.get(k).contains(v) }
  }
  private def matchesQuery(f: Fact, q: TagQuery): Boolean = q.items.exists(matchesItem(f, _))

  // -- finders ----------------------------------------------------------------
  private def finish(fs: Seq[Fact], limit: Limit, dir: ReadDirection): Seq[Fact] = {
    val ordered = dir match {
      case ReadDirection.Forward  => fs.sortBy(_.position)
      case ReadDirection.Backward => fs.sortBy(-_.position)
    }
    limit match {
      case Limit.None  => ordered
      case Limit.Of(n) => ordered.take(n)
    }
  }
  private def withStore[A](name: String, miss: A)(body: Store => A): A =
    synchronized(stores.get(name).fold(miss)(body))

  override def findById(store: String, factId: String): FindByIdResult =
    withStore(store, FindByIdResult.StoreNotFound: FindByIdResult) { st =>
      st.facts.find(_.id == factId)
        .fold(FindByIdResult.NotFound: FindByIdResult)(FindByIdResult.Found(_))
    }
  override def existsById(store: String, factId: String): ExistsByIdResult =
    withStore(store, ExistsByIdResult.StoreNotFound: ExistsByIdResult) { st =>
      if (st.facts.exists(_.id == factId)) ExistsByIdResult.Exists
      else ExistsByIdResult.DoesNotExist
    }
  override def findInTimeRange(store: String, range: TimeRange, limit: Limit,
      dir: ReadDirection): FindResult =
    withStore(store, FindResult.StoreNotFound: FindResult) { st =>
      val hits = st.facts.filter { f =>
        range.start.forall(s => !f.appendedAt.isBefore(s)) &&
        range.end.forall(e => f.appendedAt.isBefore(e)) // half-open [start, end)
      }
      FindResult.Found(finish(hits.toSeq, limit, dir))
    }
  override def findBySubject(store: String, subject: String, limit: Limit,
      dir: ReadDirection): FindResult =
    withStore(store, FindResult.StoreNotFound: FindResult) { st =>
      FindResult.Found(finish(st.facts.filter(_.subject == subject).toSeq, limit, dir))
    }
  override def findByTags(store: String, tags: Map[String, String], limit: Limit,
      dir: ReadDirection): FindResult =
    withStore(store, FindResult.StoreNotFound: FindResult) { st =>
      val hits = st.facts.filter(f => tags.forall { case (k, v) => f.tags.get(k).contains(v) })
      FindResult.Found(finish(hits.toSeq, limit, dir))
    }
  override def findByTagQuery(store: String, query: TagQuery): FindResult =
    withStore(store, FindResult.StoreNotFound: FindResult) { st =>
      FindResult.Found(st.facts.filter(matchesQuery(_, query)).sortBy(_.position).toSeq)
    }

  // -- subscribe ---------------------------------------------------------------
  override def subscribe(store: String, start: StartPosition,
      batchSize: Int): Either[StreamError, Subscription] = synchronized {
    stores.get(store) match {
      case None => Left(StreamError.StoreNotFound)
      case Some(st) =>
        val afterPos: Either[StreamError, Long] = start match {
          case StartPosition.Beginning => Right(0L)
          case StartPosition.End       => Right(st.facts.size.toLong)
          case StartPosition.After(id) =>
            st.facts.find(_.id == id).map(_.position)
              .toRight(StreamError.FactIdNotFound(id))
        }
        afterPos.map { pos =>
          new Subscription {
            private var cursor = pos
            @volatile private var closed = false
            override def hasNext: Boolean = !closed
            override def next(): Seq[Fact] = {
              while (!closed) {
                val batch = MemoryFactStore.this.synchronized {
                  stores.get(store).toSeq
                    .flatMap(_.facts.filter(_.position > cursor).take(batchSize))
                }
                if (batch.nonEmpty) { cursor = batch.last.position; return batch }
                Thread.sleep(10) // mirrors the reference memory backend's poll tail
              }
              throw new NoSuchElementException("subscription closed")
            }
            override def close(): Unit = closed = true
          }
        }
    }
  }

  // -- replay -----------------------------------------------------------------
  override def replay(store: String, start: ReplayStart,
      batchSize: Int): Either[StreamError, Iterator[Seq[Fact]]] = synchronized {
    stores.get(store) match {
      case None => Left(StreamError.StoreNotFound)
      case Some(st) =>
        val afterPos = start match {
          case ReplayStart.Beginning => Right(0L)
          case ReplayStart.After(id) =>
            st.facts.find(_.id == id).map(_.position)
              .toRight(StreamError.FactIdNotFound(id))
        }
        afterPos.map { pos =>
          // pin head at open time: facts appended during the drain are excluded
          val snapshot = st.facts.filter(_.position > pos).toSeq.sortBy(_.position)
          snapshot.grouped(batchSize)
        }
    }
  }
}
