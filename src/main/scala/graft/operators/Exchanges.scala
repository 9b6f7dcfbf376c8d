package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Scale-aware keyed exchange for aggregations whose per-task group count
  * can tip Spark's aggregate fallbacks into external sorts:
  *
  *  - OBJECT aggregates (collect_set/collect_list) fall back to sort-based
  *    execution after a tiny in-memory entry threshold, so a wide
  *    aggregation sorts its whole partition — at the 100× probe the
  *    32-partition default put ~2M groups per task and spilled 28 GB;
  *  - plain hash aggregates spill the same way once the per-task group
  *    count outgrows memory (the mostly-unique pair censuses, where
  *    map-side combine cannot shrink the shuffle anyway).
  *
  * The fix is the exchange the aggregation needs anyway, just WIDER — but
  * only when the upstream scan is actually large: at bench scale the extra
  * exchange and 8× task count cost real wall (basket_lift 1.4 → 8 s at
  * sf0.1 with an unconditional widening), so small scans keep Spark's
  * default plan (partial agg + 32-partition exchange) untouched. The width
  * heuristic is 8 aggregation tasks per scan partition (scan partitions
  * already track bytes via maxPartitionBytes), capped at 1024; on a real
  * cluster the same rule keeps per-task group counts bounded as data and
  * executors scale together. */
object Exchanges {
  def widenForAgg(df: DataFrame, keys: Column*): DataFrame =
    widenForAggBy(df, df, keys: _*)

  /** Spread a SMALL scan to the session's parallelism before expression-
    * heavy per-row work (tokenize, decimal kernels): the bench corpora are
    * single-row-group parquet files, so the scan stage — where the
    * tokenizer runs — executes on ONE core while the rest idle. The
    * repartition is conditional at plan-build time: a scan that already
    * has >= defaultParallelism splits (any real corpus) keeps its plan
    * with NO exchange added, so nothing is shuffled at scale. */
  def spreadSmallScan(df: DataFrame): DataFrame = {
    val scanParts = df.rdd.getNumPartitions
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (scanParts < par) df.repartition(par) else df
  }

  /** Same rule, but with the scale signal taken from an explicit upstream
    * scan relation — for aggregations downstream of joins/windows, whose
    * own partition count reflects the shuffle width (or AQE's runtime
    * coalescing), not the input volume. */
  def widenForAggBy(df: DataFrame, scanOf: DataFrame, keys: Column*): DataFrame = {
    val scanParts = scanOf.rdd.getNumPartitions
    val default = df.sparkSession.sparkContext.defaultParallelism
    val width = math.min(scanParts * 8, 1024)
    if (width > math.max(default, 32)) df.repartition(width, keys: _*)
    else df
  }
}
