package graft

import java.nio.file.Paths

import org.apache.spark.sql.SparkSession

import graft.core._
import graft.store.SparkFactStore

/** Child-JVM writer for MultiProcessRaceSpec: a SECOND OS process driving
  * the same store root — plain appends on its own subject plus a
  * self-chained ExpectedLastFact loop on the shared subject. Unlike the
  * two-handle CrossInstanceSpec (which bypasses the in-JVM lock), a real
  * process boundary also exercises what the commit CAS ultimately rests
  * on: cross-process rename atomicity and directory-listing visibility on
  * the shared filesystem.
  *
  * args: ROOT STORE N_PLAIN N_COND. Every conditional fact records the id
  * it was conditioned on in tags("exp") — the parent reconstructs the
  * generation chain from the log alone, so exactly-one-winner is checked
  * from committed bytes, not in-process bookkeeping. Prints CHILD-DONE on
  * success; any unexpected result crashes the JVM (nonzero exit). */
object StoreRaceChild {
  def main(args: Array[String]): Unit = {
    val rootArg = args(0)
    val store = args(1)
    val nPlain = args(2).toInt
    val nCond = args(3).toInt
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // URI roots (file://...) take the Hadoop-FS stack, same dispatch as the
    // parent; the publisher follows -Dgraft.commit.publisher either way.
    val fs =
      if (new org.apache.hadoop.fs.Path(rootArg).toUri.getScheme != null)
        SparkFactStore.at(spark, rootArg,
          publisher = Some(graft.store.CommitPublisher.default))
      else new SparkFactStore(spark, Paths.get(rootArg))

    (1 to nPlain).foreach { i =>
      fs.append(store, FactInput(s"CHILD-$i", "child", Array[Byte](1))) match {
        case _: AppendResult.Appended => ()
        case other => sys.error(s"plain append failed: $other")
      }
    }

    var won = 0
    while (won < nCond) {
      val lastId = fs.findBySubject(store, "shared", Limit.Of(1),
          ReadDirection.Backward) match {
        case FindResult.Found(fcts) if fcts.nonEmpty => fcts.head.id
        case other => sys.error(s"head read failed: $other")
      }
      fs.append(AppendRequest(store,
        Seq(FactInput("GEN", "shared", Array[Byte](1),
          tags = Map("exp" -> lastId, "by" -> "child"))),
        condition = AppendCondition.ExpectedLastFact("shared", Some(lastId)))) match {
        case _: AppendResult.Appended => won += 1
        case AppendResult.AppendConditionViolated => () // lost this generation — retry at the new head
        case other => sys.error(s"conditional append failed: $other")
      }
    }

    println(s"CHILD-DONE plain=$nPlain cond=$won")
    spark.stop()
    sys.exit(0)
  }
}
