package graft.operators

import java.nio.file.Files

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** Value-level oracle for the time-series operators on hand-built event
  * fixtures whose rolling frames, medians/MADs, peaks and drifts are known
  * by construction.
  */
class TimeseriesSpec extends AnyFunSpec with Matchers {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  /** events.parquet fixture from (user, type, day, hour) rows. */
  private def dirWith(rows: Seq[(Long, String, Long, Long)]): String = {
    val dir = Files.createTempDirectory("ts-fixture").toFile
    dir.deleteOnExit()
    rows.zipWithIndex.map { case ((u, t, day, hour), i) =>
      (i.toLong, (day * 86400L + hour * 3600L) * 1000000L, u, t, 1.0, "{}")
    }.toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .selectExpr("event_id", "CAST(timestamp_micros(ts_us) AS TIMESTAMP_NTZ) AS ts",
        "user_id", "event_type", "value", "props")
      .write.mode("overwrite")
      .parquet(new java.io.File(dir, "events.parquet").toString)
    dir.toString
  }

  describe("events_rolling_week") {
    it("sums the trailing 7-day range frame per user-day") {
      // user 1 active on days 0 (x2), 3, 7: day 7's frame is days 1..7
      val d = dirWith(Seq(
        (1L, "view", 0L, 0L), (1L, "view", 0L, 5L),
        (1L, "view", 3L, 1L), (1L, "view", 7L, 2L)))
      val got = Timeseries.queries("events_rolling_week")(spark, d)
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
      got shouldBe Seq(
        (1L, 0L, 2L, 2L, 1L),
        (1L, 3L, 1L, 3L, 2L),
        (1L, 7L, 1L, 2L, 2L))
    }
  }

  describe("events_daily_anomaly") {
    it("computes the lower median and MAD and flags the constructed spike") {
      // 7 days of 'click': six days with 1 event, one day with 4
      // median = 1, deviations = [0 x6, 3], MAD = 0, spike day flagged
      val d = dirWith(
        (0L to 5L).map(day => (1L, "click", day, 0L)) ++
          Seq.fill(4)((1L, "click", 6L, 0L)))
      val got = Timeseries.queries("events_daily_anomaly")(spark, d)
        .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
      got.take(6) shouldBe (0L to 5L).map(day => ("click", day, 1L, 1L, 0L, 0L))
      got.last shouldBe ("click", 6L, 4L, 1L, 0L, 1L)
    }
  }

  describe("events_hourly_profile") {
    it("computes exact hour shares and flags the per-type peak") {
      // 'view': 3 events in hour 1, 1 in hour 2 -> 7500/2500, peak hour 1
      val d = dirWith(Seq(
        (1L, "view", 0L, 1L), (2L, "view", 0L, 1L), (3L, "view", 1L, 1L),
        (1L, "view", 0L, 2L)))
      val got = Timeseries.queries("events_hourly_profile")(spark, d)
        .as[(String, Long, Long, Long, Long)].collect().toSeq
      got shouldBe Seq(("view", 1L, 3L, 7500L, 1L), ("view", 2L, 1L, 2500L, 0L))
    }
  }

  describe("events_type_drift") {
    it("computes weekly shares, per-type deltas, and the week L1 drift") {
      // week 0 (days 0-6): A x3, B x1 -> 7500/2500
      // week 1 (days 7-13): A x1, B x1 -> 5000/5000; deltas -2500/+2500
      val d = dirWith(Seq(
        (1L, "A", 0L, 0L), (1L, "A", 1L, 0L), (1L, "A", 2L, 0L), (1L, "B", 3L, 0L),
        (1L, "A", 8L, 0L), (1L, "B", 9L, 0L)))
      val got = Timeseries.queries("events_type_drift")(spark, d)
        .as[(Long, String, Long, Long, Option[Long], Option[Long])].collect().toSeq
      got shouldBe Seq(
        (0L, "A", 3L, 7500L, None, None),
        (0L, "B", 1L, 2500L, None, None),
        (1L, "A", 1L, 5000L, Some(-2500L), Some(5000L)),
        (1L, "B", 1L, 5000L, Some(2500L), Some(5000L)))
    }
  }

  describe("events_autocorr") {
    it("zero-fills missing days and nails a perfectly alternating series") {
      // 'click' on days 0,2,4,6 only: zero-fill makes the series
      // 1,0,1,0,1,0,1. Lag-1 pairs (n=6): sx=sy=3, sxx=syy=3, sxy=0
      // -> cov_num=-9, var=9 -> r = -1 exactly. Only 7 days, so lag-7
      // has no pairs and emits no row.
      val d = dirWith(Seq(0L, 2L, 4L, 6L).map(day => (1L, "click", day, 0L)))
      val got = Timeseries.queries("events_autocorr")(spark, d)
        .as[(String, Long, Long, Long, Option[Long])].collect().toSeq
      got shouldBe Seq(("click", 1L, 6L, -9L, Some(-1000000L)))
    }

    it("yields NULL r for a zero-variance series") {
      val d = dirWith((0L to 3L).map(day => (1L, "flat", day, 0L)))
      val got = Timeseries.queries("events_autocorr")(spark, d)
        .as[(String, Long, Long, Long, Option[Long])].collect().toSeq
      got shouldBe Seq(("flat", 1L, 3L, 0L, None))
    }
  }

  describe("events_cusum") {
    it("finds the constructed level shift with exact split means") {
      // 1/day for days 0-3 then 5/day for days 4-7: G = |cum·8 − 24·idx|
      // peaks at idx 4 (day 3) with G=64; means 1.0000 / 5.0000.
      val d = dirWith(
        (0L to 3L).map(day => (1L, "view", day, 0L)) ++
          (4L to 7L).flatMap(day => Seq.fill(5)((1L, "view", day, 0L))))
      val got = Timeseries.queries("events_cusum")(spark, d)
        .as[(String, Long, Long, Long, Long, Long, Option[Long])].collect().toSeq
      got shouldBe Seq(("view", 3L, 64L, 8L, 24L, 10000L, Some(50000L)))
    }
  }

  describe("events_ewma_anomaly") {
    it("tracks the level recursively and flags only the constructed spike") {
      // 'click': 4/day on days 0-7, a 20-event spike on day 8, 4 on day 9.
      // Seed e=4, v=0; flat days emit dev=0; day 8 deviates 16 > max(3v,3)
      // → anomaly, and pulls the level to (20+12) div 4 = 8 and v to 4;
      // day 9's dev 4 ≤ 3·4 → NOT an anomaly (the adaptive threshold
      // absorbed the spike).
      val d = dirWith(
        (0L to 7L).flatMap(day => Seq.fill(4)((1L, "click", day, 0L))) ++
          Seq.fill(20)((1L, "click", 8L, 0L)) ++
          Seq.fill(4)((1L, "click", 9L, 0L)))
      val got = Timeseries.queries("events_ewma_anomaly")(spark, d)
        .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
      got shouldBe
        (1L to 7L).map(day => ("click", day, 4L, 4L, 0L, 0L)) ++
          Seq(("click", 8L, 20L, 4L, 16L, 1L),
            ("click", 9L, 4L, 8L, 4L, 0L))
    }

    it("zero-fills gaps so an absent day reads as n=0 against the level") {
      // 'view': 8 events day 0, nothing day 1, 8 on day 2. The gap day
      // must appear with n=0, dev=8 > 3 → anomaly; its pull lowers the
      // level to (0+24) div 4 = 6 and v to 2, so day 2's dev 2 ≤ 6 passes.
      val d = dirWith(
        Seq.fill(8)((1L, "view", 0L, 0L)) ++ Seq.fill(8)((1L, "view", 2L, 0L)))
      val got = Timeseries.queries("events_ewma_anomaly")(spark, d)
        .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
      got shouldBe Seq(
        ("view", 1L, 0L, 8L, 8L, 1L),
        ("view", 2L, 8L, 6L, 2L, 0L))
    }
  }

  describe("events_burstiness") {
    it("computes the exact cross-multiplied Fano factor over the zero-filled grid") {
      // 'A': 4 events day0 + 4 day3, zero days 1-2 → n=4, Σx=8, Σx²=32,
      //   F = (4·32−64)·1e6 / (4·8) = 2e6.  'B': 2/2/2 → variance 0.
      val d = dirWith(
        Seq.fill(4)((1L, "A", 0L, 0L)) ++ Seq.fill(4)((1L, "A", 3L, 0L)) ++
          (0L to 2L).flatMap(day => Seq.fill(2)((1L, "B", day, 0L))))
      val got = Timeseries.queries("events_burstiness")(spark, d)
        .as[(String, Long, Long, Long, Long)].collect().toSeq
      got shouldBe Seq(
        ("A", 4L, 8L, 200L, 2000000L),
        ("B", 3L, 6L, 200L, 0L))
    }
  }

  describe("events_dow_seasonality") {
    it("censuses the zero-filled grid by integer day-of-week with exact means and ranks") {
      // 'A' span days 0..7 (dows 4,5,6,0,1,2,3,4): 10 events day0 + 20
      // day7 (both dow 4), 6 events day3 (dow 0); all other grid days
      // zero. tot=36. dow4: 2 days, 30 events, mean 1500, share 833333,
      // peak. dow0: 1 day, 6 events, mean 600, share 166666, rank 2.
      val d = dirWith(
        Seq.fill(10)((1L, "A", 0L, 0L)) ++ Seq.fill(6)((1L, "A", 3L, 0L)) ++
          Seq.fill(20)((1L, "A", 7L, 0L)))
      val got = Timeseries.queries("events_dow_seasonality")(spark, d)
        .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
      got shouldBe Seq(
        ("A", 0L, 1L, 6L, 600L, 166666L, 2L),
        ("A", 1L, 1L, 0L, 0L, 0L, 3L),
        ("A", 2L, 1L, 0L, 0L, 0L, 4L),
        ("A", 3L, 1L, 0L, 0L, 0L, 5L),
        ("A", 4L, 2L, 30L, 1500L, 833333L, 1L),
        ("A", 5L, 1L, 0L, 0L, 0L, 6L),
        ("A", 6L, 1L, 0L, 0L, 0L, 7L))
    }
  }

  describe("events_holt_winters") {
    it("folds the integer level/trend recursion and forecasts 7 days out") {
      // 'A': 40/80/120 events on days 0/1/2 — hand-rolled fold:
      //   seed l=40, t=0
      //   day1 n=80 : f=40, l=(80+120) div 4=50, t=(10+0) div 8=1, sae=40
      //   day2 n=120: f=51, l=(120+153) div 4=68, t=((68-50)+7) div 8=3,
      //               sae=40+69=109
      // mae_e4 = 109·10⁴ div 2 = 545000; forecasts 68+3h for h=1..7.
      val d = dirWith(
        Seq.fill(40)((1L, "A", 0L, 0L)) ++ Seq.fill(80)((1L, "A", 1L, 0L)) ++
          Seq.fill(120)((1L, "A", 2L, 0L)))
      val got = Timeseries.queries("events_holt_winters")(spark, d)
        .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
      got shouldBe (1L to 7L).map(h => ("A", h, 68L + 3 * h, 68L, 3L, 545000L))
    }

    it("keeps a declining series's trend negative (both engines truncate)") {
      // 'B': 120/40 on days 0/1: l=(40+360) div 4=100, t=(-20) div 8 = -2
      // (truncation toward zero — -2.5 floors to -3, truncates to -2),
      // sae=80, mae_e4=800000; forecasts 100-2h.
      val d = dirWith(
        Seq.fill(120)((1L, "B", 0L, 0L)) ++ Seq.fill(40)((1L, "B", 1L, 0L)))
      val got = Timeseries.queries("events_holt_winters")(spark, d)
        .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
      got shouldBe (1L to 7L).map(h => ("B", h, 100L - 2 * h, 100L, -2L, 800000L))
    }
  }

  describe("events_interarrival_stats") {
    it("day-buckets the gaps and computes the exact gap dispersion") {
      // type 'a': day 0 hours 0,1,3 → gaps 1h and 2h; day 1 hour 0 starts
      // a new bucket (the would-be 21h cross-midnight gap is excluded).
      // gaps_ms = 3.6e6, 7.2e6: n=2, Σx = 10.8e6, Σx² = 64.8e12 →
      // dispersion = floor(2·64.8e12·10⁶ / (10.8e6)²) = 1 111 111 ppm.
      // type 'b' has a single event → no gaps → no output row.
      val d = dirWith(Seq(
        (1L, "a", 0L, 0L), (2L, "a", 0L, 1L), (1L, "a", 0L, 3L),
        (1L, "a", 1L, 0L),
        (1L, "b", 0L, 0L)))
      val got = Timeseries.queries("events_interarrival_stats")(spark, d)
        .as[(String, Long, Long, Long, Long, Option[Long])].collect().toSeq
      got shouldBe Seq(
        ("a", 2L, 5400000000L, 3600000000L, 7200000000L, Some(1111111L)))
    }
  }
}
