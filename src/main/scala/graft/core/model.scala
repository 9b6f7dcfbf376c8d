package graft.core

import java.time.Instant
import java.util.UUID

/** Core data model of the Spark-native fact store.
  *
  * Semantics follow the reference specification
  * (factstore-specification/src/main/kotlin/io/factstore/core/Fact.kt:37-47):
  * an immutable, append-only record with server-assigned identity and time.
  * Identity (UUID) is separate from position (monotonic per-store sequence,
  * the Spark-side replacement for FoundationDB versionstamps — see
  * docs/event_id_vs_versionstamp.txt:1-41 in the reference).
  */
final case class Fact(
    id: String,                        // server-assigned UUID
    factType: String,                  // logical classification, e.g. ORDER_PLACED
    subject: String,                   // entity/stream the fact belongs to
    position: Long,                    // monotonic per-store commit order (1-based)
    appendedAt: Instant,               // server-assigned ingestion time (one per batch)
    payloadData: Array[Byte],          // opaque bytes, never interpreted
    payloadFormat: Option[String],     // optional hint: "JSON", "Avro", ...
    payloadSchema: Option[String],     // optional schema reference
    metadata: Map[String, String],     // non-indexed auxiliary info
    tags: Map[String, String]          // indexed classification for querying
)

/** Client-submitted fact; id/appendedAt/position are assigned by the store at
  * persist time "to prevent clients from backdating facts or forging
  * identifiers" (reference FactInput.kt:9-15). */
final case class FactInput(
    factType: String,
    subject: String,
    payloadData: Array[Byte],
    payloadFormat: Option[String] = None,
    payloadSchema: Option[String] = None,
    metadata: Map[String, String] = Map.empty,
    tags: Map[String, String] = Map.empty
) {
  require(factType.nonEmpty && factType.trim == factType, s"invalid fact type: '$factType'")
  require(Validation.validSubject(subject), s"invalid subject: '$subject'")
  tags.foreach { case (k, _) => require(k.nonEmpty, "tag key must be non-blank") }

  def toFact(id: String, position: Long, appendedAt: Instant): Fact =
    Fact(id, factType, subject, position, appendedAt, payloadData,
      payloadFormat, payloadSchema, metadata, tags)
}

final case class StoreMetadata(id: String, name: String, createdAt: Instant)

object Validation {
  /** Reference StoreName.kt:4-18: 1-255 chars, letter first, alnum/_/- middle,
    * alnum last. */
  private val StoreNameRe = "^[a-zA-Z]([a-zA-Z0-9_-]{0,253}[a-zA-Z0-9])?$".r
  def validStoreName(name: String): Boolean =
    name.length >= 1 && name.length <= 255 && StoreNameRe.matches(name)
  /** Reference Fact.kt:147-154: non-blank, no leading/trailing whitespace. */
  def validSubject(s: String): Boolean = s.nonEmpty && s.trim == s
  /** Keys are serialized into tab-delimited commit records — \t/\n forbidden. */
  def validIdempotencyKey(k: String): Boolean =
    k.nonEmpty && !k.exists(c => c == '\t' || c == '\n' || c == '\r')
}

// ---------------------------------------------------------------------------
// Requests / options
// ---------------------------------------------------------------------------

/** Positive row cap or None (reference Limit.kt:11-35). */
sealed trait Limit
object Limit {
  case object None extends Limit
  final case class Of(n: Int) extends Limit { require(n > 0, "limit must be positive") }
  def apply(n: Int): Limit = Of(n)
}

/** Reference ReadDirection.kt:8-26. */
sealed trait ReadDirection
object ReadDirection {
  case object Forward extends ReadDirection   // oldest -> newest (default)
  case object Backward extends ReadDirection  // newest -> oldest
}

/** Half-open [start, end); either bound may be absent (reference
  * TimeRange.kt:24-53). */
final case class TimeRange(start: Option[Instant], end: Option[Instant]) {
  require(
    start.isEmpty || end.isEmpty || start.get.isBefore(end.get),
    "start must be strictly before end")
}
object TimeRange {
  val unbounded: TimeRange = TimeRange(None, None)
  def between(s: Instant, e: Instant): TimeRange = TimeRange(Some(s), Some(e))
  def from(s: Instant): TimeRange = TimeRange(Some(s), None)
  def until(e: Instant): TimeRange = TimeRange(None, Some(e))
}

/** Boolean tag algebra: OR across items, AND within an item (reference
  * TagQuery.kt:12-78). Spec/memory-backend semantics (the oracle), not the
  * fdb union quirk flagged in SURVEY §2 fine print. */
sealed trait TagQueryItem
object TagQueryItem {
  /** All tags must match; any fact type. */
  final case class TagOnly(tags: Map[String, String]) extends TagQueryItem {
    require(tags.nonEmpty, "TagOnly item needs at least one tag")
  }
  /** type IN types (OR) AND all tags match. */
  final case class TagType(types: Set[String], tags: Map[String, String]) extends TagQueryItem {
    require(types.nonEmpty, "TagType item needs at least one type")
  }
}
final case class TagQuery(items: Seq[TagQueryItem]) {
  require(items.nonEmpty, "tag query needs at least one item")
}

/** Optimistic-concurrency / DCB conditions (reference AppendRequest.kt:57-106). */
sealed trait AppendCondition
object AppendCondition {
  case object None extends AppendCondition
  /** Last fact id of `subject` must equal `expectedLastFactId`
    * (None = subject has no facts yet). */
  final case class ExpectedLastFact(subject: String, expectedLastFactId: Option[String])
      extends AppendCondition
  /** Logical AND over nested conditions. */
  final case class All(conditions: Seq[AppendCondition]) extends AppendCondition {
    require(conditions.nonEmpty, "All requires at least one condition")
  }
  /** Fail if any fact matching `failIfFactsMatch` exists after the optional
    * fact-id cursor. */
  final case class TagQueryBased(failIfFactsMatch: TagQuery, after: Option[String] = scala.None)
      extends AppendCondition
}

final case class AppendRequest(
    storeName: String,
    facts: Seq[FactInput],
    idempotencyKey: String = UUID.randomUUID().toString,
    condition: AppendCondition = AppendCondition.None
) {
  require(facts.nonEmpty, "append requires at least one fact")
  // The reference types idempotency keys as UUIDs; we accept any token but
  // reject whitespace control chars — the commit log serializes the key into
  // tab-delimited records, and an embedded \t or \n would shift fields on
  // parse and corrupt the store's file references. (REST maps this
  // IllegalArgumentException to a 400.)
  require(Validation.validIdempotencyKey(idempotencyKey),
    "idempotency key must be non-empty and must not contain tab or newline characters")
}

/** Stream start cursors (reference FactSubscriber.kt:18-59). */
sealed trait StartPosition
object StartPosition {
  case object Beginning extends StartPosition
  case object End extends StartPosition
  final case class After(factId: String) extends StartPosition
}
/** Bounded-replay start (reference FactReplayer.kt:21-62). */
sealed trait ReplayStart
object ReplayStart {
  case object Beginning extends ReplayStart
  final case class After(factId: String) extends ReplayStart
}

// ---------------------------------------------------------------------------
// Results — zero-exception policy: every anticipated outcome is a value
// (reference docs/design-documents/zero-exception-policy.md).
// ---------------------------------------------------------------------------

sealed trait CreateStoreResult
object CreateStoreResult {
  final case class Created(metadata: StoreMetadata) extends CreateStoreResult
  case object NameAlreadyExists extends CreateStoreResult
  final case class InvalidName(name: String) extends CreateStoreResult
}

sealed trait RemoveStoreResult
object RemoveStoreResult {
  case object StoreRemoved extends RemoveStoreResult
  case object StoreNotFound extends RemoveStoreResult
}

sealed trait AppendResult
object AppendResult {
  final case class Appended(factIds: Seq[String], appendedAt: Instant) extends AppendResult
  case object AlreadyApplied extends AppendResult
  case object AppendConditionViolated extends AppendResult
  case object StoreNotFound extends AppendResult
}

sealed trait FindByIdResult
object FindByIdResult {
  final case class Found(fact: Fact) extends FindByIdResult
  case object NotFound extends FindByIdResult
  case object StoreNotFound extends FindByIdResult
}

sealed trait ExistsByIdResult
object ExistsByIdResult {
  case object Exists extends ExistsByIdResult
  case object DoesNotExist extends ExistsByIdResult
  case object StoreNotFound extends ExistsByIdResult
}

sealed trait FindResult
object FindResult {
  final case class Found(facts: Seq[Fact]) extends FindResult
  case object StoreNotFound extends FindResult
}

sealed trait StreamError
object StreamError {
  case object StoreNotFound extends StreamError
  final case class FactIdNotFound(factId: String) extends StreamError
}
