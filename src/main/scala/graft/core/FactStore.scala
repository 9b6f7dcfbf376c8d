package graft.core

/** The complete public operator surface — union of appender, finders,
  * replayer, subscriber and store-management ops (reference
  * FactStore.kt:21-28). Implemented by the in-memory semantic oracle
  * (graft.memory.MemoryFactStore) and the Spark engine
  * (graft.store.SparkFactStore). */
trait FactStore {
  // -- store management (catalog ops, SURVEY §2 #1-5)
  def createStore(name: String): CreateStoreResult
  def listStores(): Seq[StoreMetadata]
  def storeExists(name: String): Boolean
  def findStoreByName(name: String): Option[StoreMetadata]
  def removeStore(name: String): RemoveStoreResult

  // -- append (SURVEY §2 #6-12)
  def append(store: String, fact: FactInput): AppendResult =
    append(AppendRequest(store, Seq(fact)))
  def append(store: String, facts: Seq[FactInput]): AppendResult =
    append(AppendRequest(store, facts))
  def append(request: AppendRequest): AppendResult

  // -- finders (SURVEY §2 #13-18)
  def findById(store: String, factId: String): FindByIdResult
  def existsById(store: String, factId: String): ExistsByIdResult
  def findInTimeRange(store: String, range: TimeRange,
      limit: Limit = Limit.None,
      direction: ReadDirection = ReadDirection.Forward): FindResult
  def findBySubject(store: String, subject: String,
      limit: Limit = Limit.None,
      direction: ReadDirection = ReadDirection.Forward): FindResult
  def findByTags(store: String, tags: Map[String, String],
      limit: Limit = Limit.None,
      direction: ReadDirection = ReadDirection.Forward): FindResult
  def findByTagQuery(store: String, query: TagQuery): FindResult

  // -- bounded replay (SURVEY §2 #20-21): head pinned at call time; facts
  //    appended afterwards are excluded. Returns batches in position order.
  def replay(store: String, start: ReplayStart,
      batchSize: Int = 10000): Either[StreamError, Iterator[Seq[Fact]]]

  // -- live subscription (SURVEY §2 #19): drain from `start`, then follow
  //    new appends until closed; never completes on its own (reference
  //    FactSubscriber.kt:18-59). Start-cursor errors are returned before
  //    any data flows (#21).
  def subscribe(store: String, start: StartPosition,
      batchSize: Int = 10000): Either[StreamError, Subscription]
}

/** A live tail over a store: batches of facts in position order. `hasNext`
  * is true until `close()`; `next()` blocks while the store is idle. The
  * Scala rendering of the reference's never-completing `Flow<List<Fact>>`. */
trait Subscription extends Iterator[Seq[Fact]] with AutoCloseable
