package graft.operators

import java.nio.file.Files

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** Value-level oracle for the session analytics: sessionization, funnel,
  * and retention are each recomputed independently in-test with plain Scala
  * collections on a hand-built fixture whose session/funnel/cohort
  * structure is known by construction — plus boundary pins (gap exactly at
  * 30 min, funnel stage order violations, single-day cohorts) that random
  * corpus data cannot guarantee to cover.
  */
class SessionsSpec extends AnyFunSpec with Matchers {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val DayUs = 86400L * 1000000
  private val GapUs = 1800L * 1000000

  /** Write an events.parquet with micro-precision timestamps from epoch-us
    * longs (the driver's current physical encoding). */
  private def eventsDir(rows: Seq[(Long, Long, Long, String, Double, String)]): String = {
    val dir = Files.createTempDirectory("sessions-fixture").toFile
    dir.deleteOnExit()
    rows.toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .selectExpr("event_id", "timestamp_micros(ts_us) AS ts", "user_id",
        "event_type", "value", "props")
      .write.mode("overwrite").parquet(new java.io.File(dir, "events.parquet").toString)
    dir.toString
  }

  describe("events_session_spans") {
    it("splits on >30min gaps, not at exactly 30min, and counts distinct types") {
      val t0 = 1700000000000000L
      val d = eventsDir(Seq(
        // user 1: three events, gap of EXACTLY 30min (same session), then
        // 30min+1us (new session)
        (1L, t0, 1L, "view", 0.0, "{}"),
        (2L, t0 + GapUs, 1L, "click", 0.0, "{}"),
        (3L, t0 + GapUs + GapUs + 1, 1L, "view", 0.0, "{}"),
        // user 2: single event, single session
        (4L, t0, 2L, "purchase", 0.0, "{}")))
      val got = Sessions.queries("events_session_spans")(spark, d)
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
      got shouldBe Seq(
        (1L, 1L, 2L, t0, t0 + GapUs, GapUs, 2L),
        (1L, 2L, 1L, t0 + 2 * GapUs + 1, t0 + 2 * GapUs + 1, 0L, 1L),
        (2L, 1L, 1L, t0, t0, 0L, 1L))
    }

    it("matches an independent recomputation on the sf0.001 corpus") {
      val sf = "/root/testdata/sf0.001"
      val raw = EventFinders.normalizeTs(
        spark.read.parquet(s"$sf/events.parquet"))
        .selectExpr("user_id", "event_id", "event_type", "ts div 1000 AS ts_us")
        .as[(Long, Long, String, Long)].collect()
      val expected = raw.groupBy(_._1).toSeq.flatMap { case (uid, evs) =>
        val sorted = evs.sortBy(e => (e._4, e._2))
        val sessions = sorted.foldLeft(List.empty[List[(Long, Long, String, Long)]]) {
          case (acc, e) => acc match {
            case cur :: rest if e._4 - cur.head._4 <= GapUs => (e :: cur) :: rest
            case _ => List(e) :: acc
          }
        }.reverse.map(_.reverse)
        sessions.zipWithIndex.map { case (ss, i) =>
          (uid, i + 1L, ss.size.toLong, ss.map(_._4).min, ss.map(_._4).max,
            ss.map(_._4).max - ss.map(_._4).min, ss.map(_._3).distinct.size.toLong)
        }
      }.sortBy(r => (r._1, r._2))
      val got = Sessions.queries("events_session_spans")(spark, sf)
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
      got shouldBe expected
    }
  }

  describe("events_funnel") {
    it("only counts stages reached in order") {
      val t0 = 1700000000000000L
      val d = eventsDir(Seq(
        // user 1: full ordered funnel
        (1L, t0, 1L, "view", 0.0, "{}"),
        (2L, t0 + 1, 1L, "click", 0.0, "{}"),
        (3L, t0 + 2, 1L, "purchase", 0.0, "{}"),
        // user 2: purchase BEFORE click (click after view) — reaches click
        // stage only
        (4L, t0, 2L, "view", 0.0, "{}"),
        (5L, t0 + 1, 2L, "purchase", 0.0, "{}"),
        (6L, t0 + 2, 2L, "click", 0.0, "{}"),
        // user 3: click with no prior view — reaches nothing
        (7L, t0, 3L, "click", 0.0, "{}"),
        // user 4: view only
        (8L, t0, 4L, "view", 0.0, "{}")))
      val r = Sessions.queries("events_funnel_conversion")(spark, d).collect().head
      r.getLong(0) shouldBe 4L // n_users
      r.getLong(1) shouldBe 3L // n_view (users 1,2,4)
      r.getLong(2) shouldBe 2L // n_view_click (users 1,2)
      r.getLong(3) shouldBe 1L // n_view_click_purchase (user 1)
      r.getLong(4) shouldBe (2L * 10000) / 3 // click conversion bp
      r.getLong(5) shouldBe (1L * 10000) / 2 // purchase conversion bp
    }

    it("emits NULL conversions when no user enters the funnel") {
      val d = eventsDir(Seq((1L, 1700000000000000L, 1L, "error", 0.0, "{}")))
      val r = Sessions.queries("events_funnel_conversion")(spark, d).collect().head
      r.getLong(0) shouldBe 0L
      r.isNullAt(4) shouldBe true
      r.isNullAt(5) shouldBe true
    }
  }

  describe("events_retention") {
    it("computes cohort sizes and exact basis-point retention") {
      val t0 = 1700006400000000L // day D, well inside the day
      val d = eventsDir(Seq(
        // users 1,2 first seen day D; user 1 returns D+1 and D+3
        (1L, t0, 1L, "view", 0.0, "{}"),
        (2L, t0 + DayUs, 1L, "view", 0.0, "{}"),
        (3L, t0 + 3 * DayUs, 1L, "view", 0.0, "{}"),
        (4L, t0, 2L, "view", 0.0, "{}"),
        // user 3 first seen day D+1 only
        (5L, t0 + DayUs, 3L, "view", 0.0, "{}"),
        // user 1 twice more on day D: dedup within (user, day)
        (6L, t0 + 1, 1L, "view", 0.0, "{}")))
      val day0 = t0 / DayUs
      val got = Sessions.queries("events_retention")(spark, d)
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
      got shouldBe Seq(
        (day0, 0L, 2L, 2L, 10000L),      // cohort D: both users day 0
        (day0, 1L, 1L, 2L, 5000L),       // user 1 back next day
        (day0, 3L, 1L, 2L, 5000L),       // user 1 back day 3
        (day0 + 1, 0L, 1L, 1L, 10000L))  // cohort D+1: user 3
    }
  }
}
