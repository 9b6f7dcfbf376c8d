package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Tables

/** SQL-surface entry point: register the corpus tables as temp views and
  * the engine's codegen'd kernels as SQL functions, so a `spark.sql` user
  * gets the full inventory's building blocks without touching the
  * DataFrame API:
  *
  * {{{
  *   graft.Corpus.registerViews(spark, "/data/corpus")
  *   spark.sql("SELECT doc_id, char_hash(text) FROM documents WHERE lang = 'en'")
  *   graft.Corpus.query(spark, "/data/corpus", "dedup_minhash_lsh")  // any inventory query
  * }}}
  *
  * (Cluster deployments can get the functions config-only via
  * `spark.sql.extensions=graft.functions.GraftExtensions`; this helper
  * also covers sessions we receive already-built.) Views are lazy — no
  * scan happens at registration, and every predicate/pruning behavior the
  * operators rely on applies identically through the views. Views load
  * through the encoding-resilient reader (`operators.Tables`), so
  * temporal columns surface as TIMESTAMP_NTZ whatever the physical
  * parquet encoding.
  */
object Corpus {

  /** The driver-corpus table names (TESTDATA.md layout). */
  val TableNames: Seq[String] = Tables.All

  /** Register every corpus table as a temp view + the native kernels. */
  def registerViews(spark: SparkSession, dir: String): Unit = {
    graft.functions.TextHashFunctions.register(spark)
    graft.functions.VectorFunctions.register(spark)
    Tables.All.foreach { name =>
      Tables.read(spark, dir, name).createOrReplaceTempView(name)
    }
  }

  /** All declared inventory queries, by name. */
  def queryNames: Seq[String] = SparkEntry.queries.keys.toSeq.sorted

  /** Run one inventory query against a corpus directory. */
  def query(spark: SparkSession, dir: String, name: String): DataFrame =
    SparkEntry.queries.getOrElse(name,
      throw new IllegalArgumentException(
        s"unknown query '$name'; see Corpus.queryNames"))(spark, dir)
}
