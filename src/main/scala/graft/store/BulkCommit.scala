package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.AppendResult

/** The bulk-load commit loop shared by the facade's `bulkAppend` and the
  * DataSource V2 write path (graft.sources) — ONE implementation of the
  * protocol for multi-row atomic commits, so an external Spark job writing
  * through `format("graft")` gets byte-identical semantics to the facade:
  *
  *   1. read head; re-check the idempotency key against the committed log
  *   2. materialize the positioned batch (caller-supplied: positions MUST
  *      be contiguous `firstPos..firstPos+n-1` in the batch's row order)
  *      as ONE parquet directory at a writer-unique name
  *   3. build the commit bloom over the written bytes (distributed
  *      mergeable aggregation, sized to the batch)
  *   4. CAS-publish the commit record; losers delete their files and
  *      retry with re-derived positions — exactly-one-winner per seq
  *      across processes, no lock required (the facade adds its in-JVM
  *      lock around this for same-process writers; external writers rely
  *      on the CAS alone, like the reference's cross-client FDB retry
  *      loop, FdbFactAppender.kt:33-122).
  */
private[graft] object BulkCommit {

  /** Run the loop. `positioned(firstPos, atNanos)` returns the FULL
    * fact-schema batch (FactLog.schema column order) for a head at
    * `firstPos - 1`; it is re-invoked after every lost CAS. */
  def run(spark: SparkSession, log: FactLog, vfs: StoreVfs,
      idempotencyKey: String,
      positioned: (Long, Long) => DataFrame): AppendResult = {
    var result: AppendResult = null
    while (result == null) {
      val head = log.headState()
      val headPos = head.lastPosition
      if (log.idempotencyKeys().contains(idempotencyKey)) {
        result = AppendResult.AlreadyApplied
      } else {
        val at = java.time.Instant.now()
        val atNanos = math.max(Timestamps.toNanos(at), head.appendedAtNanos)
        val withPos = positioned(headPos + 1, atNanos)
        val rel = log.newDataFileName()
        val target = log.resolveData(rel)
        withPos.write.mode("overwrite").parquet(target.toString)
        val n = spark.read.schema(FactLog.schema).parquet(target.toString).count()
        if (n == 0L) {
          vfs.deleteTree(target)
          result = AppendResult.Appended(Seq.empty, Timestamps.fromNanos(atNanos))
        } else {
          // distributed bloom over the bulk batch so probes can prune this
          // commit like any other (one mergeable-aggregate pass). Sized to
          // the batch (~4 entries/row: id, type, subject, tags) — a
          // fixed-capacity bloom saturates on a multi-M-row bulk load and
          // every later probe degrades to a full scan.
          val bloom = spark.read.schema(FactLog.schema).parquet(target.toString)
            .select("id", "fact_type", "subject", "tags").rdd
            .treeAggregate(
              org.apache.spark.util.sketch.BloomFilter.create(
                Blooms.capacityFor(n * 4), 0.03))(
              (bf, r) => {
                bf.putString(s"i:${r.getAs[String]("id")}")
                Blooms.entriesOf(r.getAs[String]("fact_type"),
                  r.getAs[String]("subject"),
                  Option(r.getAs[Map[String, String]]("tags")).getOrElse(Map.empty))
                  .foreach(bf.putString)
                bf
              },
              (a, b) => { a.mergeInPlace(b); a })
          val rec = CommitRecord(
            head.seq + 1, headPos + 1, headPos + n,
            atNanos, idempotencyKey, Seq(s"data/$rel"),
            Some(Blooms.serialize(bloom)))
          if (log.tryCommit(rec)) {
            log.publishToStream(rec)
            result = AppendResult.Appended(Seq.empty, Timestamps.fromNanos(atNanos))
          } else vfs.deleteTree(target)
        }
      }
    }
    result
  }
}
