package graft.operators

import org.apache.spark.sql.DataFrame

/** Per-query cache registry. Operator plans persist intermediates that are
  * consumed by more than one downstream branch (shingle sets feeding both
  * the LSH candidate join and the verify join); the action that finally
  * runs them happens in the CALLER (Bench counts, Verify writes parquet, a
  * service collects), so the operator function itself has no point at
  * which the cache can be dropped. Without a release path every query
  * invocation leaks its cached partitions into the session for good —
  * benign at sf0.1, eviction churn on a long-lived session at scale.
  *
  * Protocol: operators call [[persist]] instead of `df.persist()`; the
  * caller calls [[releaseAll]] once the query's job has completed (after
  * the count/write/collect). Thread-safe; releasing is idempotent and
  * non-blocking, so a release between queries costs nothing.
  */
object CacheScope {
  private val live = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
  private val keyed = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  /** Persist `df` and track it for the next [[releaseAll]]. */
  def persist(df: DataFrame): DataFrame = {
    val p = df.persist()
    live.add(p)
    p
  }

  /** Persist the frame built by `mk` exactly once per `key` within the
    * current scope: concurrent branches of a composed eval (the pareto
    * rollup's four futures) used to each call persist on plan-identical
    * frames — storage deduped via plan canonicalization, but concurrent
    * first accessors could both compute the cached subtree and each
    * duplicate enqueued a (benign) extra unpersist. The memo lives only
    * until [[releaseAll]], so every bench rep still pays its own
    * materialization.
    *
    * NOT computeIfAbsent: builders NEST (ivfAdcRanked's mk() calls
    * persistKeyed for xsub and ivfMember), and a nested update inside a
    * ConcurrentHashMap mapping function throws "Recursive update" whenever
    * the inner key lands in the bin being computed — it surfaced only at
    * the 100× probe because the bin depends on the corpus-dir string's
    * hash. get + putIfAbsent allows nesting; a rare concurrent loser just
    * issues one extra plan-identical persist (exactly the pre-memo
    * behavior: canonicalized storage, extra unpersist at release). */
  def persistKeyed(key: String, mk: () => DataFrame): DataFrame = {
    val hit = keyed.get(key)
    if (hit != null) return hit
    val built = persist(mk())
    val prev = keyed.putIfAbsent(key, built)
    if (prev != null) prev else built
  }

  /** Unpersist every tracked frame (non-blocking eviction). */
  def releaseAll(): Unit = {
    keyed.clear()
    var df = live.poll()
    while (df != null) {
      df.unpersist(blocking = false)
      df = live.poll()
    }
  }
}
