package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.ZOrderLayout

/** Storage-layout evidence for Z-order clustering (companion to
  * LayoutSpec's partition pruning and BucketingSpec's zero-Exchange
  * joins): after z-ordering lineitem by (ship day, part key), a parquet
  * scan with a part-key predicate must materialize far fewer rows than
  * the same scan over a date-sorted layout — row-group/page min/max
  * stats prune on the SECOND dimension too, which a linear sort cannot
  * do — while date predicates keep pruning. Also pins the Morton key
  * bit-for-bit against a plain-Scala reference implementation.
  */
class ZOrderLayoutSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  /** Rows materialized by the (single) parquet scan of `df`'s plan. */
  private def scanRows(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collectLeaves()
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("morton2 matches a plain-Scala bit-interleave reference") {
    def ref(x: Long, y: Long): Long = {
      def spread(v: Long): Long =
        (0 until 16).map(i => ((v >> i) & 1L) << (2 * i)).foldLeft(0L)(_ | _)
      spread(x & 0xFFFF) | (spread(y & 0xFFFF) << 1)
    }
    val s = spark
    import s.implicits._
    val samples = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (40000L, 1L), (255L, 65280L))
    val got = samples.toDF("x", "y")
      .select(ZOrderLayout.morton2(col("x"), col("y")).as("z"))
      .as[Long].collect().toSeq
    assert(got == samples.map { case (x, y) => ref(x, y) })
  }

  test("z-order layout prunes on both dimensions; linear sort only on one") {
    val s = spark
    val base = s.read.parquet(s"$sf/lineitem.parquet")
      .selectExpr(
        "unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000 AS day",
        "l_partkey", "l_quantity", "l_extendedprice")
    val dirs = Seq("linear", "zorder").map(p =>
      java.nio.file.Files.createTempDirectory(s"layout-$p").toString)
    try {
      // 64 files -> the zkey range split resolves the top 6 interleaved
      // bits (3 per dimension), so either dimension's predicate should
      // prune to ~1/8 of the files; at 100 TB the same geometry holds
      // per row group regardless of file count
      val Seq(linearDir, zorderDir) = dirs
      base.repartitionByRange(64, col("day"))
        .sortWithinPartitions(col("day"))
        .write.mode("overwrite").parquet(linearDir)
      ZOrderLayout.write(base, "day", "l_partkey", zorderDir, 64)

      val total = base.count()
      def partScan(dir: String) = scanRows(
        s.read.parquet(dir).filter(col("l_partkey").between(500, 539)))
      def dayScan(dir: String) = scanRows(
        s.read.parquet(dir).filter(col("day").between(10958, 10987)))

      // same answers either way
      val a = s.read.parquet(linearDir).filter(col("l_partkey").between(500, 539)).count()
      val b = s.read.parquet(zorderDir).filter(col("l_partkey").between(500, 539)).count()
      assert(a == b, "layouts disagree on the query answer")

      // part-key predicate: date-sorted layout cannot prune (every file
      // spans all part keys); the z-ordered one must
      val linPart = partScan(linearDir)
      val zPart = partScan(zorderDir)
      assert(linPart > (total * 9) / 10,
        s"expected no part pruning on the date-sorted layout ($linPart of $total)")
      assert(zPart * 4 < linPart,
        s"z-order pruned only to $zPart rows vs linear $linPart (need < 25%)")

      // date predicate: the z-ordered layout must still prune vs full scan
      val zDay = dayScan(zorderDir)
      assert(zDay * 4 < total,
        s"z-order lost date pruning ($zDay of $total, need < 25%)")
    } finally dirs.foreach { d =>
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(d)).iterator().asScala
        .toSeq.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}
