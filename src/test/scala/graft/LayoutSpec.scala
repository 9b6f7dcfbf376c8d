package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Storage-layout evidence for the scan-pruning levers a 100 TB corpus
  * depends on (companion to BucketingSpec's zero-Exchange joins):
  * hive-style partitioning must prune statically on a literal predicate
  * and dynamically (DPP) through a selective dim join — both visible in
  * the physical plan, both returning the same answers as the unpruned
  * layout. */
class LayoutSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  private def withTempDirs[A](prefixes: String*)(body: Seq[String] => A): A = {
    val dirs = prefixes.map(p => java.nio.file.Files.createTempDirectory(p))
    try body(dirs.map(_.toString))
    finally dirs.foreach { d =>
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(d).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("static partition pruning: literal lang filter prunes the partitioned scan") {
    val s = spark
    withTempDirs("layout-docs") { case Seq(dir) =>
      val docs = s.read.parquet(s"$sf/documents.parquet")
      docs.write.mode("overwrite").partitionBy("lang").parquet(dir)

      val q = s.read.parquet(dir).filter(col("lang") === "en")
      val plan = q.queryExecution.executedPlan.toString
      // the predicate must appear INSIDE the PartitionFilters bracket —
      // every file scan prints an (often empty) PartitionFilters list and
      // carries `lang` in its schema, so substring checks on either alone
      // are vacuous
      assert("PartitionFilters: \\[[^\\]]*lang".r.findFirstIn(plan).isDefined,
        s"lang predicate did not reach the scan as a partition filter:\n$plan")
      // pruned read returns exactly the unpartitioned filter's rows
      val expected = docs.filter(col("lang") === "en").count()
      assert(q.count() == expected && expected > 0)
    }
  }

  test("dynamic partition pruning: selective dim join prunes fact partitions at runtime") {
    val s = spark
    withTempDirs("layout-events", "layout-dim") { case Seq(dir, dimDir) =>
      // the driver's NANOS timestamps need the legacy long reading (same as
      // EventFinders.events); only key columns are rewritten partitioned
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val ev = s.read.parquet(s"$sf/events.parquet")
        .select("event_id", "user_id", "event_type", "value")
      ev.write.mode("overwrite").partitionBy("event_type").parquet(dir)

      // the selective predicate sits on an INDEPENDENT dim attribute — a
      // filter on the join key itself would propagate statically through
      // constraint inference and never need DPP. The partition-key set only
      // exists after the dim is filtered at runtime, so DPP inserts the
      // dynamicpruning subquery into the fact scan.
      import s.implicits._
      // the dim must come from a file source: a LocalRelation dim is
      // constant-folded (ConvertToLocalRelation swallows the Filter) before
      // the PartitionPruning rule looks for a selective predicate
      Seq(
        ("purchase", "revenue"), ("click", "engagement"), ("view", "engagement"),
        ("signup", "acquisition"), ("error", "ops"))
        .toDF("event_type", "category")
        .write.mode("overwrite").parquet(dimDir)
      val dim = s.read.parquet(dimDir).filter(col("category") === "revenue")
      val fact = s.read.parquet(dir)
      val joined = fact.join(dim, Seq("event_type"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("dynamicpruning"),
        "no dynamic-partition-pruning subquery on the fact scan")
      val expected = ev.filter(col("event_type") === "purchase").count()
      assert(joined.count() == expected && expected > 0)
    }
  }
}
