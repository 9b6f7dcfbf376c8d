package graft

import org.apache.spark.sql.SparkSession

/** SQL-surface entry point: register the corpus tables as temp views and
  * the engine's codegen'd kernels as SQL functions, so a `spark.sql` user
  * gets the full inventory's building blocks without touching the
  * DataFrame API:
  *
  * {{{
  *   graft.Corpus.registerViews(spark, "/data/corpus")
  *   spark.sql("SELECT doc_id, char_hash(text) FROM documents WHERE lang = 'en'")
  * }}}
  *
  * (Cluster deployments can get the functions config-only via
  * `spark.sql.extensions=graft.functions.GraftExtensions`; this helper
  * also covers sessions we receive already-built.) Views are lazy — no
  * scan happens at registration, and every predicate/pruning behavior the
  * operators rely on applies identically through the views.
  */
object Corpus {

  /** The driver-corpus table names (TESTDATA.md layout: one parquet per
    * table under the scale-factor dir). */
  val Tables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def registerViews(spark: SparkSession, dir: String): Unit = {
    graft.functions.TextHashFunctions.register(spark)
    graft.functions.VectorFunctions.register(spark)
    // events carries INT64 TIMESTAMP(NANOS) — same legacy read the
    // operator modules use (EventFinders.events)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.foreach { t =>
      spark.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(t)
    }
  }
}
