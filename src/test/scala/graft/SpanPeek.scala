package graft
// throwaway profiling main for text_dup_span_coverage stages
object SpanPeek {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val d = "/root/testdata/sf0.1"
    import org.apache.spark.sql.functions._
    graft.functions.TextHashFunctions.register(spark)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[peek] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val P = 1000000007L
    val comb = (1 until 8).foldLeft("element_at(wh, i)") { (acc, k) =>
      s"($acc * 31 + element_at(wh, i + $k)) % $P"
    }
    val sh0 = docs.selectExpr("doc_id", "lang", "word_hashes(text) AS wh")
      .selectExpr("doc_id", "lang",
        s"if(size(wh) < 8, array(), transform(sequence(1, size(wh) - 7), i -> $comb)) AS sh")
      .filter(expr("size(sh) > 0"))
    t("sh count (cold)")(sh0.count())
    val sh = sh0.persist()
    t("sh persist")(sh.count())
    val pos = sh.selectExpr("doc_id", "posexplode(sh) AS (i, shv)")
    t("pos count")(pos.count())
    val dup = pos.groupBy(col("shv")).agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= 2).select(col("shv"))
    t("dup census")(dup.count())
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(asc("i"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val covered = pos.join(dup, Seq("shv"), "left_semi")
      .withColumn("prev_end", max(col("i") + 8).over(w))
      .selectExpr("doc_id",
        "greatest(CAST(i + 8 AS BIGINT) - greatest(CAST(i AS BIGINT), coalesce(prev_end, 0L)), 0L) AS contrib")
      .groupBy(col("doc_id")).agg(sum(col("contrib")).as("covered"))
    t("covered")(covered.count())
    t("full query")(graft.operators.Curation.queries("text_dup_span_coverage")(spark, d).count())
    graft.operators.CacheScope.releaseAll()
    spark.stop()
  }
}
