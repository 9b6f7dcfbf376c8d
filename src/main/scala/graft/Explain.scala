package graft
import org.apache.spark.sql.SparkSession
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val name = args(0); val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val df = SparkEntry.queries(name)(spark, sf)
    df.explain("formatted")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      df.count()
      println(f"run $i: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
