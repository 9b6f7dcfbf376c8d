package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.ZOrderLayout

/** Layout-key operators: the Z-order (Morton) clustering key exposed as a
  * queryable, oracle-checked computation. `ZOrderLayoutSpec` measures what
  * the key buys at the storage layer (row-group pruning on BOTH
  * dimensions); this module pins that the key itself is bit-exact and
  * engine-agnostic — the same spread-cascade integer arithmetic produces
  * identical curve cells in Spark and DuckDB.
  *
  * Scale: one 1-row min/max aggregate (broadcast), one codegen'd
  * bit-cascade projection, one map-side-combined cell census. Nothing
  * corpus-scale but the scan.
  */
object Layout {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(spark, dir, name)

  private val DayUs = 86400L * 1000000

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Morton-curve cell census of lineitem over (ship day, part key):
    // 32-bit z-keys bucketed into 64 curve cells (zkey div 2^26), with
    // per-cell row counts and the covered rectangle of each cell — the
    // compactness evidence that makes min/max pruning work on either
    // dimension.
    "zorder_cells" -> ((s, d) => {
      val base = t(s, d, "lineitem").selectExpr(
        s"unix_micros(CAST(l_shipdate AS TIMESTAMP)) div ${DayUs}L AS day",
        "l_partkey")
      ZOrderLayout.withZKey(base, "day", "l_partkey")
        .selectExpr("zkey div 67108864 AS cell", "day", "l_partkey")
        .groupBy(col("cell"))
        .agg(
          count(lit(1)).as("n_rows"),
          min(col("day")).as("min_day"), max(col("day")).as("max_day"),
          min(col("l_partkey")).as("min_part"), max(col("l_partkey")).as("max_part"))
        .orderBy(asc("cell"))
    })
  )

  /** DuckDB twin of the spread-cascade (0x00FF00FF / 0x0F0F0F0F /
    * 0x33333333 / 0x55555555 masks as decimal literals). */
  private def spreadSql(v: String): String = {
    val s1 = s"(($v & 65535) | (($v & 65535) << 8)) & 16711935"
    val s2 = s"(($s1) | (($s1) << 4)) & 252645135"
    val s3 = s"(($s2) | (($s2) << 2)) & 858993459"
    s"((($s3) | (($s3) << 1)) & 1431655765)"
  }

  def oracles: Map[String, String] = Map(
    "zorder_cells" ->
      ("WITH base AS (SELECT epoch_us(l_shipdate) // 86400000000 AS day, l_partkey FROM lineitem), " +
        "b AS (SELECT min(day) AS min_x, max(day) AS max_x, " +
        "min(l_partkey) AS min_y, max(l_partkey) AS max_y FROM base), " +
        "coded AS (SELECT day, l_partkey, " +
        "((day - min_x) * 65535) // greatest(max_x - min_x, 1) AS zx, " +
        "((l_partkey - min_y) * 65535) // greatest(max_y - min_y, 1) AS zy " +
        "FROM base CROSS JOIN b), " +
        s"keyed AS (SELECT day, l_partkey, (${spreadSql("zx")}) | ((${spreadSql("zy")}) << 1) AS zkey FROM coded) " +
        "SELECT zkey // 67108864 AS cell, count(*) AS n_rows, " +
        "min(day) AS min_day, max(day) AS max_day, " +
        "CAST(min(l_partkey) AS BIGINT) AS min_part, CAST(max(l_partkey) AS BIGINT) AS max_part " +
        "FROM keyed GROUP BY cell ORDER BY cell")
  )
}
