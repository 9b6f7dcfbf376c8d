package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core._

/** The reference's six finder queries (SURVEY §2 #13-18) as pure DataFrame
  * transformations over the fact-log schema. Each is a declarative
  * filter/orderBy/limit pipeline, so Catalyst pushes predicates and limits
  * into the Parquet scan and `TakeOrderedAndProject` replaces any global
  * sort — one Catalyst boolean expression replaces the reference's ~85 LoC
  * of index set algebra (fdb/FdbFactFinder.kt:169-255). */
object FactFinders {

  /** TagQuery → Catalyst Column compiler: OR across items, AND within
    * (reference TagQuery.kt:12-78; spec/memory semantics, not the fdb union
    * quirk — SURVEY §2 fine print). */
  def tagQueryPredicate(q: TagQuery): Column =
    q.items.map(itemPredicate).reduce(_ || _)

  private def itemPredicate(item: TagQueryItem): Column = item match {
    case TagQueryItem.TagOnly(tags)        => tagsPredicate(tags)
    case TagQueryItem.TagType(types, tags) =>
      val typeP = col("fact_type").isin(types.toSeq: _*)
      if (tags.isEmpty) typeP else typeP && tagsPredicate(tags)
  }

  /** AND over `tags(k) === v` map lookups; the empty map matches everything
    * (reference findByTags with no tags returns all facts). */
  def tagsPredicate(tags: Map[String, String]): Column =
    tags.map { case (k, v) => col("tags").getItem(k) === lit(v) }
      .reduceOption(_ && _).getOrElse(lit(true))

  private def orderAndLimit(df: DataFrame, limit: Limit, dir: ReadDirection): DataFrame = {
    val ordered = dir match {
      case ReadDirection.Forward  => df.orderBy(asc("position"))
      case ReadDirection.Backward => df.orderBy(desc("position"))
    }
    limit match {
      case Limit.None  => ordered
      case Limit.Of(n) => ordered.limit(n) // -> TakeOrderedAndProject, no global sort
    }
  }

  def byId(log: DataFrame, factId: String): DataFrame =
    log.filter(col("id") === lit(factId)).limit(1)

  def bySubject(log: DataFrame, subject: String,
      limit: Limit = Limit.None, dir: ReadDirection = ReadDirection.Forward): DataFrame =
    orderAndLimit(log.filter(col("subject") === lit(subject)), limit, dir)

  def byTags(log: DataFrame, tags: Map[String, String],
      limit: Limit = Limit.None, dir: ReadDirection = ReadDirection.Forward): DataFrame =
    orderAndLimit(log.filter(tagsPredicate(tags)), limit, dir)

  def byTagQuery(log: DataFrame, q: TagQuery): DataFrame =
    log.filter(tagQueryPredicate(q)).orderBy(asc("position"))

  /** Half-open [start, end) on the nanosecond column — load-bearing
    * exactness (reference AbstractFactStoreTest.kt:203-229). */
  def inTimeRange(log: DataFrame, range: TimeRange,
      limit: Limit = Limit.None, dir: ReadDirection = ReadDirection.Forward): DataFrame = {
    val startP = range.start.map(s => col("appended_at_nanos") >= lit(Timestamps.toNanos(s)))
    val endP = range.end.map(e => col("appended_at_nanos") < lit(Timestamps.toNanos(e)))
    val pred = (startP.toSeq ++ endP.toSeq).reduceOption(_ && _).getOrElse(lit(true))
    orderAndLimit(log.filter(pred), limit, dir)
  }

  /** Bounded position window: (afterPos, pinnedHead] — replay's core filter. */
  def positionWindow(log: DataFrame, afterPos: Long, pinnedHead: Long): DataFrame =
    log.filter(col("position") > lit(afterPos) && col("position") <= lit(pinnedHead))
      .orderBy(asc("position"))
}

object Timestamps {
  def toNanos(i: java.time.Instant): Long =
    Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000000L), i.getNano.toLong)
  def fromNanos(n: Long): java.time.Instant =
    java.time.Instant.ofEpochSecond(Math.floorDiv(n, 1000000000L), Math.floorMod(n, 1000000000L))
}
