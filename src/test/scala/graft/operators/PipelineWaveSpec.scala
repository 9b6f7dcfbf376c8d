package graft.operators

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession
import graft.functions.CrossHash

/** Value-level oracles for the round-9 continuation wave — readability,
  * embedding covariance, and temperature sampling — all recomputed
  * independently in-test (plain Scala over the sf0.001 parquet, no Spark
  * expressions), so each operator is pinned against a second implementation
  * rather than just its DuckDB rendering.
  */
class PipelineWaveSpec extends AnyFunSpec with Matchers {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def polyHash(s: String): Long =
    s.codePoints().toArray.foldLeft(0L)((a, c) => (a * 31 + c) % CrossHash.P)

  private def coin(s: String): Long =
    polyHash(s) * CrossHash.CoinScramble % CrossHash.P % 10000

  describe("text_readability") {
    it("matches an independent Scala recomputation of the Flesch pipeline") {
      val docs = spark.read.parquet(s"$sf/documents.parquet")
        .select("doc_id", "text").as[(Long, String)].collect().toSeq

      val expected = docs.sortBy(_._1).map { case (id, text) =>
        val w = math.max(text.split(" ", -1).count(_.nonEmpty), 1).toLong
        val sent = math.max("[.!?]+".r.findAllIn(text).size, 1).toLong
        val syll = "[aeiouy]+".r.findAllIn(text.toLowerCase).size.toLong
        val num = 206835L * sent * w - 1015L * w * w - 84600L * syll * sent
        val me3 = math.max(num, 0L) / (sent * w)
        val band =
          if (me3 >= 90000) "very_easy"
          else if (me3 >= 60000) "standard"
          else if (me3 >= 30000) "difficult"
          else "very_confusing"
        (id, w, sent, syll, me3, band)
      }

      val got = TextAnalysis.queries("text_readability")(spark, sf)
        .as[(Long, Long, Long, Long, Long, String)].collect().toSeq
      got shouldBe expected
    }
  }

  describe("embedding_covariance") {
    it("matches exact integer moment sums recomputed in Scala") {
      val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
        .select("embedding").as[Seq[Float]].collect().toSeq
      val k = 16
      val q = vecs.map(v => v.take(k).map(x => math.floor(x.toDouble * 10000).toLong))

      val expected = (for {
        i <- 0 until k; j <- i until k
      } yield {
        val n = q.size.toLong
        val sxi = q.map(_(i)).sum
        val sxj = q.map(_(j)).sum
        val sxixj = q.map(v => v(i) * v(j)).sum
        val num = n * sxixj - sxi * sxj
        val cov = math.floor(num.toDouble / (n.toDouble * n.toDouble)).toLong
        (i.toLong, j.toLong, n, sxi, sxj, sxixj, num, cov)
      }).toSeq

      val got = Similarity.queries("embedding_covariance")(spark, sf)
        .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
      got should have size (k * (k + 1) / 2).toLong
      got shouldBe expected
    }
  }

  describe("lineitem_delay_percentiles") {
    it("matches nearest-rank percentiles recomputed from the raw delays") {
      val li = Tables.read(spark, sf, "lineitem")
        .selectExpr("l_orderkey", "CAST(l_shipdate AS DATE) AS sd")
        .as[(Long, java.sql.Date)].collect().toSeq
      val ord = Tables.read(spark, sf, "orders")
        .selectExpr("o_orderkey", "o_orderpriority", "CAST(o_orderdate AS DATE) AS od")
        .as[(Long, String, java.sql.Date)].collect()
        .map { case (k, p, od) => k -> (p, od) }.toMap

      val delays = li.map { case (ok, sd) =>
        val (prio, od) = ord(ok)
        (prio, sd.toLocalDate.toEpochDay - od.toLocalDate.toEpochDay)
      }
      def nearestRank(sorted: Seq[Long], q: Int): Long = {
        // smallest delay whose cumulative count satisfies cum*100 >= n*q
        val n = sorted.size.toLong
        sorted.zipWithIndex.collectFirst {
          case (v, i) if (i + 1).toLong * 100 >= n * q => v
        }.get
      }
      val expected = delays.groupBy(_._1).map { case (prio, rows) =>
        val s2 = rows.map(_._2).sorted
        (prio, s2.size.toLong, nearestRank(s2, 50), nearestRank(s2, 90),
          nearestRank(s2, 99), s2.max)
      }.toSeq.sortBy(_._1)

      val got = Analytics2.queries("lineitem_delay_percentiles")(spark, sf)
        .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
      got shouldBe expected
    }
  }

  describe("doc_length_histogram") {
    it("matches digit-bucket counts and cumulative shares recomputed in Scala") {
      val docs = spark.read.parquet(s"$sf/documents.parquet")
        .select("lang", "text").as[(String, String)].collect().toSeq
      val lens = docs.map { case (lang, text) =>
        (lang, math.max(text.split(" ", -1).count(_.nonEmpty), 1).toLong)
      }
      val expected = lens.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
        case (lang, rows) =>
          val total = rows.size.toLong
          val grid = rows
            .map { case (_, n) => (n.toString.length.toLong, n) }
            .groupBy(_._1).toSeq.sortBy(_._1)
          grid.scanLeft((0L, 0L, 0L, 0L)) { case ((_, _, _, cum), (b, xs)) =>
            (b, xs.size.toLong, xs.map(_._2).sum, cum + xs.size)
          }.drop(1).map { case (b, nDocs, toks, cum) =>
            (lang, b,
              math.pow(10, (b - 1).toDouble).toLong,
              math.pow(10, b.toDouble).toLong - 1,
              nDocs, toks, nDocs * 10000 / total, cum * 10000 / total)
          }
      }
      val got = TextAnalysis.queries("doc_length_histogram")(spark, sf)
        .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
      got shouldBe expected
    }
  }

  describe("embedding_pca_project") {
    it("matches an independent Scala integer power iteration and captures the top eigendirection") {
      val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
        .select("label", "embedding").as[(Int, Seq[Float])].collect().toSeq
      val dim = 64
      val q = vecs.map { case (l, v) =>
        (l, v.map(x => math.floor(x.toDouble * 10000).toLong).toArray)
      }

      // independent integer pipeline: moments -> scatter -> rescale ->
      // 6 matvec rounds from ones
      val n = q.size.toLong
      val s1 = Array.tabulate(dim)(i => q.map(_._2(i)).sum)
      val m = Array.tabulate(dim, dim) { (i, j) =>
        n * q.map(r => r._2(i) * r._2(j)).sum - s1(i) * s1(j)
      }
      def rescale(maxAbs: Long): Long =
        math.pow(10, math.max(maxAbs.toString.length - 6, 0).toDouble).toLong
      val sM = rescale(m.flatten.map(math.abs).max)
      val ms = m.map(_.map(_ / sM))
      var v = Array.fill(dim)(1L)
      for (_ <- 1 to 12) {
        val u = Array.tabulate(dim)(i => (0 until dim).map(j => ms(i)(j) * v(j)).sum)
        val sU = rescale(u.map(math.abs).max)
        v = u.map(_ / sU)
      }
      val expected = q.groupBy(_._1).toSeq
        .map { case (l, rows) =>
          val scores = rows.map(r => (0 until dim).map(k => v(k) * r._2(k)).sum)
          (l.toLong, rows.size.toLong, scores.min, scores.max, scores.sum)
        }.sortBy(_._1)

      val got = Similarity.queries("embedding_pca_project")(spark, sf)
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
      got shouldBe expected

      // PCA quality: the integer direction's Rayleigh quotient must reach
      // >= 90% of the double-precision power-iteration eigenvalue
      val cov = Array.tabulate(dim, dim)((i, j) => m(i)(j).toDouble)
      var w = Array.fill(dim)(1.0)
      for (_ <- 1 to 50) {
        val u = Array.tabulate(dim)(i => (0 until dim).map(j => cov(i)(j) * w(j)).sum)
        val norm = math.sqrt(u.map(x => x * x).sum)
        w = u.map(_ / norm)
      }
      def rayleigh(x: Array[Double]): Double = {
        val cx = Array.tabulate(dim)(i => (0 until dim).map(j => cov(i)(j) * x(j)).sum)
        (0 until dim).map(i => x(i) * cx(i)).sum / x.map(a => a * a).sum
      }
      val vd = v.map(_.toDouble)
      rayleigh(vd) should be >= 0.9 * rayleigh(w)
    }
  }

  describe("media_dedup_report") {
    it("matches a Scala recomputation of the content-hash census") {
      val docs = spark.read.parquet(s"$sf/documents.parquet")
        .select("text").as[String].collect().toSeq
      val rows = docs.map { t =>
        val h = polyHash(t)
        val fmt = (h % 3) match { case 0 => "jpeg"; case 1 => "png"; case _ => "webp" }
        (fmt, h, t.getBytes("UTF-8").length.toLong)
      }
      val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (fmt, rs) =>
        val groups = rs.groupBy(_._2).values.toSeq
        val nPay = rs.size.toLong
        val nDist = groups.size.toLong
        val dup = nPay - nDist
        val saved = groups.map(g => g.map(_._3).sum - g.map(_._3).max).sum
        (fmt, nPay, nDist, dup, dup * 10000 / nPay, saved)
      }
      val got = Multimodal.queries("media_dedup_report")(spark, sf)
        .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
      got shouldBe expected
    }
  }

  describe("events_funnel_windowed") {
    it("matches per-user min-chain logic with 24h windows recomputed in Scala") {
      val DayUs = 86400L * 1000000
      val events = Tables.read(spark, sf, "events")
        .selectExpr("user_id", "event_type",
          "unix_micros(CAST(ts AS TIMESTAMP)) AS ts_us")
        .as[(Long, String, Long)].collect().toSeq
      val byUser = events.groupBy(_._1)
      var (nV, nC, nP) = (0L, 0L, 0L)
      byUser.values.foreach { rows =>
        val views = rows.filter(_._2 == "view").map(_._3)
        if (views.nonEmpty) {
          nV += 1
          val mv = views.min
          val clicks = rows.filter(r => r._2 == "click" && r._3 > mv && r._3 <= mv + DayUs).map(_._3)
          if (clicks.nonEmpty) {
            nC += 1
            val mc = clicks.min
            if (rows.exists(r => r._2 == "purchase" && r._3 > mc && r._3 <= mc + DayUs)) nP += 1
          }
        }
      }
      val got = Analytics2.queries("events_funnel_windowed")(spark, sf)
        .as[(Long, Long, Long)].collect().head
      got shouldBe ((nV, nC, nP))
      // the window must actually bind: strictly fewer or equal conversions
      // than the unbounded funnel, and the fixture has both kinds
      val unb = Analytics2.queries("events_funnel")(spark, sf)
        .as[(Long, Long, Long)].collect().head
      got._2 should be <= unb._2
      got._3 should be <= unb._3
    }
  }

  describe("events_markov_next") {
    it("matches transition probabilities recomputed from the raw log") {
      val ev = Tables.read(spark, sf, "events")
        .selectExpr("user_id", "event_id", "event_type")
        .as[(Long, Long, String)].collect().toSeq
      val pairs = ev.groupBy(_._1).values.flatMap { rows =>
        val sorted = rows.sortBy(_._2).map(_._3)
        sorted.zip(sorted.drop(1))
      }.toSeq
      val expected = pairs.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
        case (typ, ps) =>
          val total = ps.size.toLong
          ps.groupBy(_._2).toSeq
            .map { case (nxt, xs) => (nxt, xs.size.toLong) }
            .sortBy { case (nxt, n) => (-n, nxt) }
            .take(3).zipWithIndex
            .map { case ((nxt, n), i) =>
              (typ, (i + 1).toLong, nxt, n, n * 10000 / total)
            }
      }
      val got = Sessions.queries("events_markov_next")(spark, sf)
        .as[(String, Long, String, Long, Long)].collect().toSeq
      got shouldBe expected
    }
  }

  describe("orders_backlog_timeline") {
    it("matches a Scala recomputation and the orders-minus-shipped invariant") {
      val opened = Tables.read(spark, sf, "orders")
        .selectExpr("CAST(o_orderdate AS DATE) AS d").as[java.sql.Date].collect()
        .map(_.toLocalDate.toEpochDay)
      val lastShip = Tables.read(spark, sf, "lineitem")
        .selectExpr("l_orderkey", "CAST(l_shipdate AS DATE) AS d")
        .as[(Long, java.sql.Date)].collect().toSeq
        .groupBy(_._1).values.map(_.map(_._2.toLocalDate.toEpochDay).max).toSeq
      val deltas = (opened.map(d => (d, (1L, 0L))) ++ lastShip.map(d => (d, (0L, 1L))))
        .groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (d, xs) => (d, xs.map(_._2._1).sum, xs.map(_._2._2).sum) }
      val expected = deltas.scanLeft((0L, 0L, 0L, 0L)) {
        case ((_, _, _, cum), (d, o, c)) => (d, o, c, cum + o - c)
      }.drop(1)
      val got = Analytics2.queries("orders_backlog_timeline")(spark, sf)
        .as[(Long, Long, Long, Long)].collect().toSeq
      got shouldBe expected
      // invariant: every order eventually ships in TPC-H-ish data with
      // lineitems for all orders — final backlog is #orders − #shipped
      got.last._4 shouldBe (opened.size.toLong - lastShip.size.toLong)
    }
  }

  describe("text_freq_of_freq") {
    it("matches the Zipf census recomputed in Scala") {
      val docs = spark.read.parquet(s"$sf/documents.parquet")
        .select("lang", "text").as[(String, String)].collect().toSeq
      val tf = docs.flatMap { case (lang, text) =>
        text.split(" ", -1).filter(_.nonEmpty).map(t => (lang, t))
      }.groupBy(identity).toSeq.map { case ((lang, _), xs) => (lang, xs.size.toLong) }
      val expected = tf.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (lang, rows) =>
        val vocab = rows.size.toLong
        rows.map { case (_, f) => (f.toString.length.toLong, f) }
          .groupBy(_._1).toSeq.sortBy(_._1)
          .map { case (b, xs) =>
            (lang, b,
              math.pow(10, (b - 1).toDouble).toLong,
              math.pow(10, b.toDouble).toLong - 1,
              xs.size.toLong, xs.map(_._2).sum, xs.size.toLong * 10000 / vocab)
          }
      }
      val got = TextAnalysis.queries("text_freq_of_freq")(spark, sf)
        .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
      got shouldBe expected
    }
  }

  describe("orders_bloom_semijoin") {
    it("matches a Scala bloom recomputation; no false negatives by construction") {
      val P = CrossHash.P
      val M = 65520L
      def h(k: Long, a: Long, b: Long): Long = ((k % P) * a + b) % P % M
      val build = Tables.read(spark, sf, "orders")
        .filter("o_orderpriority = '1-URGENT'")
        .selectExpr("o_orderkey").as[Long].collect().toSeq
      val bits = scala.collection.mutable.Set[Long]()
      build.foreach { k =>
        bits += h(k, 2654435761L, 97L); bits += h(k, 982451653L, 541L)
      }
      val buildSet = build.toSet
      val probe = Tables.read(spark, sf, "lineitem")
        .selectExpr("l_orderkey").as[Long].collect().toSeq
      val pass = probe.count(k =>
        bits(h(k, 2654435761L, 97L)) && bits(h(k, 982451653L, 541L)))
      val matches = probe.count(buildSet)
      val fp = probe.count(k => !buildSet(k) &&
        bits(h(k, 2654435761L, 97L)) && bits(h(k, 982451653L, 541L)))
      val got = Analytics2.queries("orders_bloom_semijoin")(spark, sf)
        .as[(Long, Long, Long, Long, Long)].collect().head
      got shouldBe ((probe.size.toLong, pass.toLong, matches.toLong, fp.toLong,
        fp.toLong * 10000 / math.max(probe.size.toLong - matches, 1L)))
      // a bloom never loses a true match
      (got._2 >= got._3) shouldBe true
    }
  }

  describe("text_hll_shard_merge") {
    it("max-merged shard registers give EXACTLY the global estimate") {
      val got = Sketches.queries("text_hll_shard_merge")(spark, sf)
        .as[(String, Long, Long, Long, Long)].collect().toSeq
      got should not be empty
      got.foreach { case (lang, nShards, merged, global, exact) =>
        withClue(s"$lang: ") {
          nShards should be > 1L   // the shard split actually happened
          merged shouldBe global   // lossless distributed combine
          exact shouldBe 1L
        }
      }
    }
  }

  describe("dedup_threshold_sweep") {
    it("is consistent with the verified pair list it summarizes") {
      val pairs = Dedup.queries("dedup_minhash_lsh")(spark, sf)
        .selectExpr("doc_a", "doc_b", "jaccard_bp")
        .as[(Long, Long, Long)].collect().toSeq
      val expected = pairs.groupBy(_._3 / 1000).toSeq.sortBy(_._1).map {
        case (bucket, ps) =>
          val docs = (ps.map(_._1) ++ ps.map(_._2)).distinct.size.toLong
          val cum = pairs.count(_._3 / 1000 >= bucket).toLong
          (bucket, bucket * 1000, ps.size.toLong, docs, cum)
      }
      val got = Dedup.queries("dedup_threshold_sweep")(spark, sf)
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
      got shouldBe expected
      // every verified pair sits at or above the 70% verify cutoff
      got.map(_._1).min should be >= 7L
    }
  }

  describe("supplier_scorecard") {
    it("matches revenue / returns / p90 recomputed from the raw rows") {
      val li = Tables.read(spark, sf, "lineitem")
        .selectExpr("l_suppkey", "l_orderkey",
          "CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * " +
            "(CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4))) AS DECIMAL(28,8)) * " +
            "CAST(100000000 AS DECIMAL(9,0)) AS BIGINT) AS rev_e8",
          "CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END AS ret",
          "CAST(l_shipdate AS DATE) AS sd")
        .as[(Long, Long, Long, Long, java.sql.Date)].collect().toSeq
      val od = Tables.read(spark, sf, "orders")
        .selectExpr("o_orderkey", "CAST(o_orderdate AS DATE) AS od")
        .as[(Long, java.sql.Date)].collect().toMap
      val names = Tables.read(spark, sf, "supplier")
        .selectExpr("s_suppkey", "s_name").as[(Long, String)].collect().toMap

      val rows = li.map { case (sk, ok, rev, ret, sd) =>
        (sk, rev, ret, sd.toLocalDate.toEpochDay - od(ok).toLocalDate.toEpochDay)
      }
      val expected = rows.groupBy(_._1).toSeq.map { case (sk, xs) =>
        val n = xs.size.toLong
        val sorted = xs.map(_._4).sorted
        val p90 = sorted.zipWithIndex.collectFirst {
          case (v, i) if (i + 1).toLong * 10 >= n * 9 => v
        }.get
        val retBp = xs.map(_._3).sum * 10000 / n
        val grade =
          if (retBp <= 2500 && p90 <= 100) "A" else if (retBp <= 3500) "B" else "C"
        (sk, names(sk), n, xs.map(_._2).sum, retBp, p90, grade)
      }.sortBy(r => (-r._4, r._1)).take(20)

      val got = Analytics2.queries("supplier_scorecard")(spark, sf)
        .as[(Long, String, Long, Long, Long, Long, String)].collect().toSeq
      got shouldBe expected
    }
  }

  describe("sample_temperature") {
    it("keeps everything from the smallest source and matches recomputed keeps") {
      val docs = spark.read.parquet(s"$sf/documents.parquet")
        .select("doc_id", "source", "text").as[(Long, String, String)].collect().toSeq
      val toks = docs.map { case (id, src, text) =>
        (id, src, text.split(" ", -1).count(_.nonEmpty).toLong)
      }
      val totals = toks.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
      val tMin = totals.values.min
      val rates = totals.map { case (srcName, t) =>
        srcName -> math.min(
          10000L,
          math.floor(math.sqrt(tMin.toDouble) / math.sqrt(t.toDouble) * 10000.0).toLong)
      }
      val expected = toks
        .filter { case (id, src, _) => coin(s"t|$id") < rates(src) }
        .groupBy(_._2).map { case (srcName, rows) =>
          (srcName, totals(srcName), rates(srcName),
            rows.size.toLong, rows.map(_._3).sum)
        }.toSeq.sortBy(_._1)

      val got = TrainingPipeline.queries("sample_temperature")(spark, sf)
        .as[(String, Long, Long, Long, Long)].collect().toSeq
      got shouldBe expected
      // the smallest source runs at rate 10000 -> nothing dropped there
      val smallest = totals.minBy(_._2)._1
      rates(smallest) shouldBe 10000L
      got.find(_._1 == smallest).map(_._4) shouldBe
        Some(toks.count(_._2 == smallest).toLong)
    }
  }

  describe("events_user_gini") {
    it("computes the exact rank-formula Gini from the count histogram") {
      // type 'g': users with activity 1,1,2,4 → sorted W = 1+2+6+16 = 25,
      // n=4, S=8, G = (50-40)/32 = 0.3125 → 312500 ppm.
      // type 'eq': three users at 3 each → G = 0.
      val dir = java.nio.file.Files.createTempDirectory("gini-fixture").toFile
      dir.deleteOnExit()
      val rows =
        Seq((1L, "g")) ++ Seq((2L, "g")) ++ Seq.fill(2)((3L, "g")) ++ Seq.fill(4)((4L, "g")) ++
          (1 to 3).flatMap(u => Seq.fill(3)((u.toLong, "eq")))
      rows.zipWithIndex.map { case ((u, t), i) =>
        (i.toLong, i.toLong * 1000000L, u, t, 1.0, "{}")
      }.toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
        .selectExpr("event_id", "CAST(timestamp_micros(ts_us) AS TIMESTAMP_NTZ) AS ts",
          "user_id", "event_type", "value", "props")
        .write.mode("overwrite")
        .parquet(new java.io.File(dir, "events.parquet").toString)
      val got = Analytics2.queries("events_user_gini")(spark, dir.toString)
        .as[(String, Long, Long, Long)].collect().toSeq
      got shouldBe Seq(("eq", 3L, 9L, 0L), ("g", 4L, 8L, 312500L))
    }
  }

  describe("sample_soft_dedup") {
    it("matches an independent Scala recomputation of the soft-dedup coin census") {
      val clusterSize = Dedup.queries("dedup_clusters")(spark, sf)
        .select("doc_id", "cluster_size").as[(Long, Long)].collect().toMap
      val docs = spark.read.parquet(s"$sf/documents.parquet")
        .select("doc_id", "lang", "text").as[(Long, String, String)].collect().toSeq
      val expected = docs.groupBy(_._2).toSeq.sortBy(_._1).map { case (lang, ds) =>
        val rows = ds.map { case (id, _, text) =>
          val nTokens = text.split(" ", -1).count(_.nonEmpty).toLong
          val csize = clusterSize.getOrElse(id, 1L)
          val keep = polyHash(id.toString) * CrossHash.CoinScramble % CrossHash.P % csize == 0
          (nTokens, csize, keep)
        }
        (lang, rows.size.toLong,
          rows.count(_._2 > 1).toLong,
          rows.count(_._3).toLong,
          rows.count(r => r._2 > 1 && r._3).toLong,
          rows.map(_._1).sum,
          rows.filter(_._3).map(_._1).sum,
          rows.count(_._3).toLong * 10000 / rows.size)
      }
      val got = Dedup.queries("sample_soft_dedup")(spark, sf)
        .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
      CacheScope.releaseAll()
      got shouldBe expected
      // singletons (cluster size 1) always survive: h % 1 == 0
      val nDocs = got.map(_._2).sum; val nDup = got.map(_._3).sum
      got.map(_._4).sum should be >= (nDocs - nDup)
    }
  }

  describe("orders_value_gini") {
    it("quantizes per-customer revenue to 3 significant digits and applies the exact rank formula") {
      val dir = java.nio.file.Files.createTempDirectory("vgini-fixture").toFile
      dir.deleteOnExit()
      Seq((1L, "S"), (2L, "S"), (3L, "S")).toDF("c_custkey", "c_mktsegment")
        .write.mode("overwrite").parquet(new java.io.File(dir, "customer.parquet").toString)
      // e4 revenues 1000000, 1000000, 1234500 → q = 1000000, 1000000,
      // 1230000 (3-sig-digit floor). Sorted W = 1e6 + 2e6 + 3.69e6;
      // G = (2W − 4S)/(3S) = 460000/9690000 → 47471 ppm.
      Seq((10L, 1L, 100.00), (11L, 2L, 100.00), (12L, 3L, 123.45))
        .toDF("o_orderkey", "o_custkey", "o_totalprice")
        .write.mode("overwrite").parquet(new java.io.File(dir, "orders.parquet").toString)
      val got = Analytics2.queries("orders_value_gini")(spark, dir.toString)
        .as[(String, Long, Long, Long)].collect().toSeq
      got shouldBe Seq(("S", 3L, 3230000L, 47471L))
    }
  }

  describe("corpus_pipeline_v3") {
    it("matches a plain-Scala funnel built from its component operators") {
      val clusterSize = Dedup.queries("dedup_clusters")(spark, sf)
        .select("doc_id", "cluster_size").as[(Long, Long)].collect().toMap
      val flagged = TrainingPipeline.queries("decontaminate_minhash")(spark, sf)
        .select("doc_id").as[Long].collect().toSet
      val docs = spark.read.parquet(s"$sf/documents.parquet")
        .select("doc_id", "lang", "text").as[(Long, String, String)].collect().toSeq
      val m = TrainingPipeline.FuzzyBenchMod
      val expected = docs.groupBy(_._2).toSeq.sortBy(_._1).map { case (lang, ds) =>
        val staged = ds.map { case (id, _, text) =>
          val toks = text.split(" ", -1).filter(_.nonEmpty)
          val nTokens = toks.length.toLong
          val ttr = toks.distinct.length.toLong * 10000 / math.max(toks.length, 1)
          val s1 = ttr >= 5000
          val csize = clusterSize.getOrElse(id, 1L)
          val keep = polyHash(id.toString) * CrossHash.CoinScramble % CrossHash.P % csize == 0
          val clean = id % m != 0 && !flagged.contains(id)
          (nTokens, s1, s1 && keep, s1 && keep && clean)
        }
        (lang, staged.size.toLong,
          staged.count(!_._2).toLong,
          staged.count(r => r._2 && !r._3).toLong,
          staged.count(r => r._3 && !r._4).toLong,
          staged.count(_._4).toLong,
          staged.filter(_._4).map(_._1).sum)
      }
      val got = Dedup.queries("corpus_pipeline_v3")(spark, sf)
        .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
      CacheScope.releaseAll()
      got shouldBe expected
    }
  }

  describe("decontaminate_minhash") {
    it("flags the exact-copy leak on a constructed fixture and nothing else") {
      // doc 0 (id % FuzzyBenchMod == 0 → benchmark) and doc 1 (corpus) share the
      // exact text → identical shingle sets → identical signatures → every
      // band collides → candidate, and containment is exactly 10000 bp.
      // doc 2 shares no vocabulary: even if a spurious band collided, the
      // exact verify keeps it out.
      val dir = java.nio.file.Files.createTempDirectory("decon-fixture").toFile
      dir.deleteOnExit()
      val shared = (1 to 12).map(i => s"tok$i").mkString(" ")
      val other = (1 to 12).map(i => s"else$i").mkString(" ")
      Seq((0L, "en", shared), (1L, "en", shared), (2L, "en", other))
        .toDF("doc_id", "lang", "text")
        .write.mode("overwrite")
        .parquet(new java.io.File(dir, "documents.parquet").toString)
      val got = TrainingPipeline.queries("decontaminate_minhash")(spark, dir.toString)
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
      got shouldBe Seq((1L, 0L, 10L, 10L, 10000L))
      // the per-benchmark-item report over the same fixture: bench doc 0
      // has 10 distinct shingles, one leak at full containment
      val report = TrainingPipeline.queries("decontaminate_report")(spark, dir.toString)
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
      CacheScope.releaseAll()
      report shouldBe Seq((0L, 10L, 1L, 10000L, 1L))
    }

    it("contains every cross-split verified near-dup pair (containment >= jaccard)") {
      // dedup_minhash_lsh verifies jaccard >= 0.7 over the SAME band
      // candidates; for a pair straddling the benchmark split, containment
      // of the bench side >= jaccard >= 0.7 >= the 0.5 gate — so each such
      // pair MUST be flagged. (The reverse need not hold.)
      val dup = Dedup.queries("dedup_minhash_lsh")(spark, sf)
        .selectExpr("doc_a", "doc_b").as[(Long, Long)].collect().toSeq
      val m = TrainingPipeline.FuzzyBenchMod
      val cross = dup.collect {
        case (a, b) if a % m == 0 && b % m != 0 => (b, a)
        case (a, b) if a % m != 0 && b % m == 0 => (a, b)
      }
      cross should not be empty
      val flagged = TrainingPipeline.queries("decontaminate_minhash")(spark, sf)
        .selectExpr("doc_id", "bench_id").as[(Long, Long)].collect().toSet
      CacheScope.releaseAll()
      cross.foreach(p => flagged should contain(p))
    }
  }
}
