package graft
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    for (q <- args) {
      println(s"=== $q ===")
      println(SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
