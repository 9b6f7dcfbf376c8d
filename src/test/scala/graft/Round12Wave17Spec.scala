package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Mining, Temporal, Timeseries}

/** Round-12 wave 17 pin: the anomaly-agreement census equals the set
  * algebra of the three detectors it composes. */
class Round12Wave17Spec extends AnyFunSuite {

  private def spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("events_anomaly_agreement equals the set algebra of its composed " +
      "detectors") {
    def daySet(rows: Array[org.apache.spark.sql.Row]): Set[(String, Long)] =
      rows.map(r => (r.getString(0), r.getLong(1))).toSet
    val mad = daySet(Timeseries.queries("events_daily_anomaly")(spark, sf)
      .filter("is_anomaly = 1").select("event_type", "day").collect())
    val ew = daySet(Timeseries.queries("events_ewma_anomaly")(spark, sf)
      .filter("is_anomaly = 1").select("event_type", "day").collect())
    val sp = daySet(Temporal.queries("events_spike_days")(spark, sf)
      .select("event_type", "day").collect())
    val sets = Map("mad" -> mad, "ewma" -> ew, "spike" -> sp)
    val types = (mad ++ ew ++ sp).map(_._1)
    val expected = (for {
      t <- types
      (a, b) <- Seq(("ewma", "mad"), ("ewma", "spike"), ("mad", "spike"))
    } yield {
      val sa = sets(a).filter(_._1 == t); val sb = sets(b).filter(_._1 == t)
      val both = (sa & sb).size.toLong
      val uni = sa.size + sb.size - both
      (t, a, b, sa.size.toLong, sb.size.toLong, both,
        if (uni == 0) None else Some(both * 10000 / uni))
    }).toSet
    val got = Mining.queries("events_anomaly_agreement")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5),
        if (r.isNullAt(6)) None else Some(r.getLong(6)))).toSet
    assert(got == expected, s"got $got\nexpected $expected")
  }
}
