package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salting for skewed equi-joins — the manual complement to AQE's runtime
  * skew-join split (which only fires on sort-merge joins with statistics;
  * salting works on any shuffle join and is plannable ahead of time).
  *
  * A hot key routes ALL its rows to one reducer: a 10⁹-row key on a
  * 1000-executor cluster leaves 999 executors idle behind one straggler.
  * Salting appends a uniform salt ∈ [0, salts) to the big side's key and
  * replicates the small side once per salt value, so the hot key's rows
  * spread across `salts` reducers at the cost of `salts`× the small side's
  * shuffle volume — the right trade when the small side is dim-sized but
  * above the broadcast threshold.
  */
object SkewJoin {

  /** Inner equi-join `big ⨝ small` on `key`, salted `salts` ways.
    *
    * The big side's salt hashes the whole row PLUS its scan position
    * (monotonically_increasing_id): byte-identical duplicate rows — the
    * classic hot-key shape in an event log — get different positions and
    * therefore different salts, which a row-content hash alone would pin
    * to one reducer. The position is deterministic for a deterministic
    * scan order (same files, same splits), and correctness never depends
    * on WHICH salt a row gets — every salt value matches the one
    * small-side replica carrying it — so even a nondeterministic re-salt
    * under task retry yields the same join result. The small side
    * explodes one copy per salt value. */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val bigCols = big.columns.map(col).toIndexedSeq
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(bigCols :+ monotonically_increasing_id(): _*), lit(salts)).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(saltedSmall,
        saltedBig(key) === saltedSmall(key) &&
          saltedBig("__salt") === saltedSmall("__salt"))
      .drop(saltedSmall(key)).drop(saltedBig("__salt")).drop(saltedSmall("__salt"))
  }

  /** Per-partition row counts of a frame's current physical distribution —
    * the observable salting improves. Counts per partition directly (one
    * entry per partition, INCLUDING empty ones — a groupBy(partition_id)
    * would drop empties and overstate balance). Test observability only. */
  def partitionSizes(df: DataFrame): Seq[Long] =
    df.rdd.mapPartitions(it => Iterator.single(it.size.toLong))
      .collect().toIndexedSeq
}
