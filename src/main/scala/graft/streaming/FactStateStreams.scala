package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Stateful stream processing over a fact subscription: per-subject managed
  * state with `mapGroupsWithState` — the Structured Streaming rendering of
  * an event-sourced projection (fold each subject's facts, in position
  * order, into a running aggregate). State lives in Spark's state store,
  * so a 100 TB stream shards by subject across executors and survives
  * restarts via checkpointing.
  */
object FactStateStreams {

  /** Running projection of one subject's history. */
  final case class SubjectState(
      subject: String, nFacts: Long, lastPosition: Long, lastType: String)

  /** Fold a fact stream (fact-log schema — e.g.
    * `SparkFactStore.subscribeStream`) into per-subject running state.
    * Emits the updated state for every subject touched by a micro-batch. */
  def subjectStates(spark: SparkSession, factStream: DataFrame): Dataset[SubjectState] = {
    import spark.implicits._
    factStream
      .selectExpr("subject", "position", "fact_type")
      .as[(String, Long, String)]
      .groupByKey(_._1)
      .mapGroupsWithState[SubjectState, SubjectState](GroupStateTimeout.NoTimeout) {
        (subject, rows, state) =>
          val prev = state.getOption.getOrElse(SubjectState(subject, 0L, 0L, ""))
          // facts within a batch fold in position order (append order)
          val next = rows.toSeq.sortBy(_._2).foldLeft(prev) { (st, r) =>
            SubjectState(subject, st.nFacts + 1, r._2, r._3)
          }
          state.update(next)
          next
      }
  }
}
