package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's declared operator inventory (SURVEY §2 plus the
  * training-data pipeline operators); every entry has a DuckDB oracle in
  * `oracleSql` unless the operation is not SQL-expressible.
  */
object SparkEntry {
  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (EventFinders.queries, EventFinders.oracles),
      (Analytics.queries, Analytics.oracles),
      (Analytics2.queries, Analytics2.oracles),
      (TextAnalysis.queries, TextAnalysis.oracles),
      (Dedup.queries, Dedup.oracles),
      (TrainingPipeline.queries, TrainingPipeline.oracles),
      (Similarity.queries, Similarity.oracles),
      (Temporal.queries, Temporal.oracles),
      (Pii.queries, Pii.oracles),
      (Sketches.queries, Sketches.oracles),
      (Multimodal.queries, Multimodal.oracles),
      (Evolution.queries, Evolution.oracles),
      (Stats.queries, Stats.oracles),
      (Tokenize.queries, Tokenize.oracles),
      (Sessions.queries, Sessions.oracles),
      (Market.queries, Market.oracles),
      (DataQuality.queries, DataQuality.oracles),
      (Graph.queries, Graph.oracles),
      (Timeseries.queries, Timeseries.oracles),
      (Layout.queries, Layout.oracles),
      (Curation.queries, Curation.oracles),
      (Retrieval.queries, Retrieval.oracles),
      (Mining.queries, Mining.oracles)
    )

  /** Query names declared by more than one module. `queries`/`oracleSql`
    * are Map-merged, so a cross-module name collision silently REPLACES the
    * earlier operator — an inventory deletion with no compile error.
    * QueryInventorySpec pins this empty. */
  private[graft] def duplicateQueryNames: Seq[String] =
    modules.flatMap(_._1.keys).groupBy(identity).collect {
      case (name, occurrences) if occurrences.size > 1 => name
    }.toSeq.sorted

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.queries("q5_nation_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.flatMap(_._1).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.iterator.flatMap(_._2).toMap
}
