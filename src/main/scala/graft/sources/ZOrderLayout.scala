package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-dimensional scan pruning —
  * the storage-layout lever for predicates that hive partitioning and a
  * linear sort can't both serve. A linear sort on `l_shipdate` gives
  * perfect row-group pruning on date predicates and NONE on part
  * predicates; interleaving the two dimensions' bits makes every row group
  * cover a small rectangle of the (date, part) plane, so parquet min/max
  * row-group statistics prune on EITHER dimension.
  *
  * Mechanics: each dimension is min/max-normalized to a 16-bit code by
  * exact integer arithmetic (`((v - min) * 65535) div span`), the two
  * codes are bit-interleaved into a 32-bit Morton key by the classic
  * shift-mask spread cascade (all codegen'd builtin bit ops — no UDF),
  * and the relation is range-partitioned + sorted by that key before the
  * parquet write. At 100 TB the two scans (min/max pass + write pass) and
  * the one range shuffle are the entire cost; production deployments with
  * skewed dimensions swap the linear normalization for range-id quantile
  * codes — the interleave and write path are unchanged.
  *
  * Reference scope: factstore persists per-subject streams; its users'
  * multi-tenant scans filter on (time, entity) simultaneously — exactly
  * the 2-D predicate this layout serves.
  */
object ZOrderLayout {

  /** Spread the low 16 bits of `x` to even bit positions (0,2,4,…,30). */
  private def spread16(x: Column): Column = {
    val a = x.bitwiseAND(lit(0xFFFFL))
    val b = (a.bitwiseOR(shiftleft(a, 8))).bitwiseAND(lit(0x00FF00FFL))
    val c = (b.bitwiseOR(shiftleft(b, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val d = (c.bitwiseOR(shiftleft(c, 2))).bitwiseAND(lit(0x33333333L))
    (d.bitwiseOR(shiftleft(d, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton key of two 16-bit codes (x in even bits, y in odd). */
  def morton2(xCode: Column, yCode: Column): Column =
    spread16(xCode).bitwiseOR(shiftleft(spread16(yCode), 1))

  /** Attach `zkey` for (xCol, yCol), normalizing each dimension to a
    * 16-bit code by its global min/max — exact integer arithmetic
    * (`((v − min) · 65535) div span`, span-0 safe), bounds from one 1-row
    * aggregate attached by broadcast. */
  def withZKey(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val bounds = df.agg(
      min(col(xCol).cast("long")).as("min_x"), max(col(xCol).cast("long")).as("max_x"),
      min(col(yCol).cast("long")).as("min_y"), max(col(yCol).cast("long")).as("max_y"))
    df.join(broadcast(bounds))
      .withColumn("zx", expr(
        s"((CAST($xCol AS BIGINT) - min_x) * 65535) div greatest(max_x - min_x, 1L)"))
      .withColumn("zy", expr(
        s"((CAST($yCol AS BIGINT) - min_y) * 65535) div greatest(max_y - min_y, 1L)"))
      .withColumn("zkey", morton2(col("zx"), col("zy")))
      .drop("min_x", "max_x", "min_y", "max_y", "zx", "zy")
  }

  /** Write `df` z-ordered by (xCol, yCol): range-partitioned into
    * `numFiles` parquet files, each sorted by the Morton key, so every
    * row group's min/max stats cover a compact curve segment. Ranging on
    * the CURVE CELL (the key's top ⌈log₂ numFiles⌉ bits) rather than the
    * raw key keeps file boundaries aligned to cell edges — a sampled
    * boundary inside a cell would smear that cell's rectangle across two
    * files and dilute min/max pruning on both dimensions. */
  def write(df: DataFrame, xCol: String, yCol: String,
            outDir: String, numFiles: Int): Unit = {
    val cellBits = math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(numFiles - 1L).toInt)
    val cellSpan = 1L << (32 - cellBits)
    withZKey(df, xCol, yCol)
      .withColumn("zcell", expr(s"zkey div ${cellSpan}L"))
      .repartitionByRange(numFiles, col("zcell"))
      .sortWithinPartitions(col("zkey"))
      .drop("zkey", "zcell")
      .write.mode("overwrite").parquet(outDir)
  }
}
