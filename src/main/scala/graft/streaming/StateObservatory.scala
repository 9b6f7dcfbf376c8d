package graft.streaming

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** State-SIZE observability for the streaming faces.
  *
  * The recovery and parity specs prove state *correctness*; nothing there
  * sees state *size*. A face whose keyspace is supposed to be bounded
  * (HLL registers per language, k counters per language, 512 histogram
  * buckets per event type, a 7-slot grid per type) can still leak state
  * through a bug in key derivation or timeout handling, and at 100 TB a
  * state leak is an executor-OOM time bomb the small-corpus output-parity
  * checks never trip over.
  *
  * This listener captures per-batch `stateOperators` totals (rows =
  * managed state KEYS, bytes = store memory) from every progress event and
  * keeps per-query-name maxima, so a harness can assert the documented
  * bound after driving a face: `maxRows` must equal the keyspace size, not
  * the stream length. Listener delivery is asynchronous (Spark posts
  * progress on the listener-bus thread), so callers should poll
  * `stats(name)` until `batches` covers the expected count — see
  * `awaitBatches`.
  */
final class StateObservatory extends StreamingQueryListener {

  /** Running per-query aggregate over all progress events seen. */
  final case class StateStats(
      batches: Long, maxRows: Long, maxBytes: Long,
      lastRows: Long, lastBytes: Long)

  private val byName = TrieMap.empty[String, StateStats]

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryIdle(e: StreamingQueryListener.QueryIdleEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val name = Option(e.progress.name).getOrElse(e.progress.id.toString)
    val ops = e.progress.stateOperators
    if (ops != null && ops.nonEmpty) {
      val rows = ops.map(_.numRowsTotal).sum
      val bytes = ops.map(_.memoryUsedBytes).sum
      byName.updateWith(name) {
        case Some(s) => Some(StateStats(s.batches + 1,
          math.max(s.maxRows, rows), math.max(s.maxBytes, bytes), rows, bytes))
        case None => Some(StateStats(1L, rows, bytes, rows, bytes))
      }
    }
  }

  def stats(name: String): Option[StateStats] = byName.get(name)
  def snapshot: Map[String, StateStats] = byName.toMap

  /** Poll until `name` has recorded at least `n` stateful batches (progress
    * events arrive asynchronously after `processAllAvailable` returns). */
  def awaitBatches(name: String, n: Long, timeoutMs: Long = 20000L): StateStats = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (System.nanoTime() < deadline) {
      stats(name) match {
        case Some(s) if s.batches >= n => return s
        case _ => Thread.sleep(50)
      }
    }
    stats(name).getOrElse(
      sys.error(s"no state progress recorded for query '$name' in ${timeoutMs}ms"))
  }
}

object StateObservatory {
  /** Attach a fresh observatory to the session's stream bus. Caller owns
    * detaching (`spark.streams.removeListener`) when done. */
  def attach(spark: SparkSession): StateObservatory = {
    val o = new StateObservatory
    spark.streams.addListener(o)
    o
  }
}
