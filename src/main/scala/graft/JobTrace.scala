package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-JOB wall-clock trace for a named query list — the measurement tool
  * behind the action-count optimizations (guide §1: find where the time
  * goes before changing anything). One `[job]` line per Spark job with its
  * wall and description, one `[trace]` line per query with wall + job
  * count.
  *
  * Usage: runMain graft.JobTrace <name1,name2> [reps]
  * Env:   SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in Bench.
  */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').map(_.trim).toSeq
    val reps = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = new ConcurrentHashMap[Int, (Long, String)]()
    @volatile var emit = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        starts.put(j.jobId, (System.nanoTime(), desc))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val s0 = starts.remove(j.jobId)
        if (emit && s0 != null) {
          val dt = (System.nanoTime() - s0._1) / 1e9
          System.err.println(f"[job] ${j.jobId}%4d ${dt}%7.3f s  ${s0._2.take(90)}")
        }
      }
    })
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    names.foreach { name =>
      (1 to reps).foreach { r =>
        emit = r == reps // trace only the last (warm) rep
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        graft.operators.CacheScope.releaseAll()
        Thread.sleep(200)
        System.err.println(f"[trace] $name rep $r wall $wall%.2f s")
      }
    }
    spark.stop()
  }
}
