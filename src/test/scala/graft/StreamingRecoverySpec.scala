package graft

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.store.SparkFactStore
import graft.streaming.FactStateStreams
import graft.streaming.FactStateStreams._

/** Checkpoint recovery for the STATEFUL streaming faces: each face runs on
  * a live store subscription with a checkpoint dir, is stopped cleanly
  * between micro-batches (Trigger.AvailableNow terminates once caught up —
  * the store then keeps ingesting), and is restarted from the same
  * checkpoint. The contract being pinned is the reference's resumable
  * streams (factstore-server StreamResource.kt:23-63 Last-Event-ID;
  * FdbFactStreamer.kt:209-243 cursor resolution) lifted to managed
  * operator state: a restart must lose NEITHER the source cursor NOR the
  * flatMapGroupsWithState state behind it.
  *
  * Four faces spanning the state shapes:
  *   - hllDistinct        — per-key register arrays (merge-idempotent)
  *   - funnelStages       — at-most-once anchors that must never re-fire
  *   - nearDupCandidates  — band-bucket membership + caps
  *   - stateIntervals     — one open interval per key
  *
  * Every scenario is built so the post-restart output is only correct if
  * the pre-restart state actually survived (an anchor set before the stop
  * gates an emission after it), and each asserts BOTH
  *   (a) combined output across the restart == the uninterrupted run, and
  *   (b) no emission is duplicated across the restart boundary. */
class StreamingRecoverySpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark

  private def newStore(): (SparkFactStore, String) = {
    val fs = new SparkFactStore(spark, Files.createTempDirectory("graft-recover-"))
    fs.createStore("s")
    (fs, "s")
  }

  /** Drain everything committed-and-unprocessed through `face` from the
    * given checkpoint; AvailableNow stops cleanly between micro-batches.
    * maxFilesPerTrigger=2 forces multiple micro-batches per drain (one
    * commit = one stream file), so state crosses batch boundaries even
    * within a single drain. */
  private def drain[T](fs: SparkFactStore, store: String, ckpt: String,
      mode: String)(face: DataFrame => Dataset[T]): Seq[T] = {
    val Right(df) = fs.subscribeStream(store, StartPosition.Beginning,
      maxFilesPerTrigger = Some(2)): @unchecked
    val out = new ConcurrentLinkedQueue[T]()
    val q = face(df).writeStream
      .option("checkpointLocation", ckpt)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: Dataset[T], _: Long) => b.collect().foreach(out.add) }
      .start()
    assert(q.awaitTermination(180000), "drain did not terminate")
    out.asScala.toSeq
  }

  /** Run `face` interrupted (phase1 facts → drain → stop → phase2 facts →
    * restart from the same checkpoint → drain) and uninterrupted (all
    * facts, one drain), returning (phase1Out, phase2Out, uninterrupted). */
  private def runBoth[T](mode: String,
      phase1: Seq[FactInput], phase2: Seq[FactInput])(
      face: DataFrame => Dataset[T]): (Seq[T], Seq[T], Seq[T]) = {
    val (fsI, sI) = newStore()
    val ckpt = Files.createTempDirectory("graft-recover-ckpt-").toString
    phase1.foreach(fsI.append(sI, _))
    val out1 = drain(fsI, sI, ckpt, mode)(face)
    phase2.foreach(fsI.append(sI, _))
    val out2 = drain(fsI, sI, ckpt, mode)(face)
    val (fsU, sU) = newStore()
    val ckptU = Files.createTempDirectory("graft-recover-ckpt-").toString
    (phase1 ++ phase2).foreach(fsU.append(sU, _))
    val outU = drain(fsU, sU, ckptU, mode)(face)
    (out1, out2, outU)
  }

  // -- hllDistinct: register-array state ------------------------------------

  test("hllDistinct recovers its registers: estimate and register fingerprint " +
      "match the uninterrupted run, seq strictly continues") {
    // deterministic spread of hashes per language; phase 2 re-delivers a
    // phase-1 hash too (must raise nothing) plus genuinely new ones
    def hf(lang: String, h: Long) =
      FactInput("h", lang, Array[Byte](1), tags = Map("h" -> h.toString))
    val enH = (1 to 30).map(i => i * 2654435761L)
    val deH = (1 to 20).map(i => i * 40503L + 7)
    val phase1 = enH.take(15).map(hf("en", _)) ++ deH.take(10).map(hf("de", _))
    val phase2 = enH.drop(15).map(hf("en", _)) ++ deH.drop(10).map(hf("de", _)) :+
      hf("en", enH.head) // re-delivery across the restart
    val (o1, o2, oU) = runBoth("update", phase1, phase2)(df =>
      FactStateStreams.hllDistinct(spark,
        df.selectExpr("subject AS lang", "CAST(tags['h'] AS BIGINT) AS h")))
    def finalPer(rows: Seq[HllUpdate]): Map[String, (Long, Long, Long)] =
      rows.groupBy(_.lang).map { case (l, rs) =>
        val last = rs.maxBy(_.seq); l -> ((last.present, last.estE4, last.regsFnv))
      }
    // (a) final registers identical to the uninterrupted run
    assert(finalPer(o1 ++ o2) == finalPer(oU))
    // (b) seq continues across the restart — recovered state, not a reset —
    // and no (lang, seq) emission repeats
    o2.groupBy(_.lang).foreach { case (lang, rs) =>
      val before = o1.filter(_.lang == lang).map(_.seq)
      assert(before.nonEmpty && rs.map(_.seq).min > before.max,
        s"$lang: seq did not continue across restart")
    }
    val all = o1 ++ o2
    assert(all.map(u => (u.lang, u.seq)).distinct.size == all.size)
  }

  // -- funnelStages: at-most-once anchors -----------------------------------

  test("funnelStages recovers its anchors: a pre-restart view gates the " +
      "post-restart click/purchase and nothing re-fires") {
    val T0 = 1700000000000000L
    def ev(u: Long, ty: String, tsUs: Long) =
      FactInput(ty, u.toString, Array[Byte](1), tags = Map("ts_us" -> tsUs.toString))
    // user 1: anchor before the stop, conversion after — only fires if the
    //         FunnelChain state survived the restart
    // user 2: view+click before, purchase after; a second view after must
    //         NOT re-fire (at-most-once across the boundary)
    // user 3: full chain before the stop; repeats after → nothing new
    val phase1 = Seq(
      ev(1, "view", T0),
      ev(2, "view", T0), ev(2, "click", T0 + 1000),
      ev(3, "view", T0), ev(3, "click", T0 + 1000), ev(3, "purchase", T0 + 2000))
    val phase2 = Seq(
      ev(1, "click", T0 + 5000), ev(1, "purchase", T0 + 9000),
      ev(2, "view", T0 + 5000), ev(2, "purchase", T0 + 9000),
      ev(3, "click", T0 + 5000), ev(3, "purchase", T0 + 9000))
    val (o1, o2, oU) = runBoth("append", phase1, phase2)(df =>
      FactStateStreams.funnelStages(spark, df.selectExpr(
        "CAST(subject AS BIGINT) AS user_id", "fact_type AS event_type",
        "timestamp_micros(CAST(tags['ts_us'] AS BIGINT)) AS ts",
        "position AS event_id")))
    def key(f: FunnelStage) = (f.userId, f.stage, f.tsUs)
    assert((o1 ++ o2).map(key).sorted == oU.map(key).sorted)
    // the recovered-state conversions really happened after the restart
    assert(o2.map(key).contains((1L, "click_24h", T0 + 5000)))
    assert(o2.map(key).contains((2L, "purchase_24h", T0 + 9000)))
    // at-most-once: no stage fires twice for a user, across the boundary
    val all = o1 ++ o2
    assert(all.map(f => (f.userId, f.stage)).distinct.size == all.size,
      s"anchor re-fired across restart: $all")
  }

  // -- nearDupCandidates: band-bucket membership ----------------------------

  test("nearDupCandidates recovers its band buckets: a post-restart doc " +
      "pairs with pre-restart bucket members, no pair re-emits") {
    val text1 = "the quick brown fox jumps over the lazy dog near the old river bank today"
    val text3 = "completely unrelated content about distributed query engines and shuffle plans"
    def doc(id: Long, text: String) =
      FactInput("doc", id.toString, text.getBytes("UTF-8"))
    // docs 1,2 identical + 3 distinct before the stop → pair (1,2) before;
    // doc 4 identical to 1/2 after → pairs (1,4),(2,4) ONLY if the bucket
    // membership state survived the restart
    val phase1 = Seq(doc(1, text1), doc(2, text1), doc(3, text3))
    val phase2 = Seq(doc(4, text1))
    val (o1, o2, oU) = runBoth("append", phase1, phase2)(df =>
      FactStateStreams.nearDupCandidates(spark, df.selectExpr(
        "CAST(subject AS BIGINT) AS doc_id",
        "CAST(payload_data AS STRING) AS text")))
    // the same pair can surface from up to 4 band buckets — consumers dedup
    // by (docA, docB); parity and the restart boundary are asserted on the
    // deduped pair sets
    def pairs(rows: Seq[NearDupCandidate]) = rows.map(c => (c.docA, c.docB)).toSet
    assert(pairs(o1 ++ o2) == pairs(oU))
    assert(pairs(o1) == Set((1L, 2L)))
    assert(pairs(o2) == Set((1L, 4L), (2L, 4L)),
      "bucket membership did not survive the restart")
    assert((pairs(o1) & pairs(o2)).isEmpty)
    // identical docs: full signature agreement
    (o1 ++ o2).foreach(c => assert(c.estJaccardBp == 10000L))
  }

  // -- stateIntervals: one open interval per key ----------------------------

  test("stateIntervals recovers the open interval: a run spanning the " +
      "restart closes with its pre-restart start and full event count") {
    val T0 = 1700000000000000L
    def ev(u: Long, ty: String, tsUs: Long) =
      FactInput(ty, u.toString, Array[Byte](1), tags = Map("ts_us" -> tsUs.toString))
    // user 1: run of 'a' opens before the stop, closes after → the closed
    //         interval's validFrom and nEvents prove the open state survived
    // user 2: run STRADDLES the boundary ('a' before and after, then 'b')
    val phase1 = Seq(
      ev(1, "a", T0), ev(1, "a", T0 + 1000),
      ev(2, "a", T0 + 500))
    val phase2 = Seq(
      ev(1, "b", T0 + 2000),
      ev(2, "a", T0 + 2500), ev(2, "b", T0 + 3000))
    val (o1, o2, oU) = runBoth("append", phase1, phase2)(df =>
      FactStateStreams.stateIntervals(spark, df.selectExpr(
        "CAST(subject AS BIGINT) AS user_id", "fact_type AS event_type",
        "timestamp_micros(CAST(tags['ts_us'] AS BIGINT)) AS ts")))
    def key(c: ClosedInterval) = (c.userId, c.state, c.validFromUs, c.validToUs, c.nEvents)
    assert((o1 ++ o2).map(key).sorted == oU.map(key).sorted)
    assert(o1.isEmpty, s"nothing closes before the stop: $o1")
    assert(o2.map(key).toSet == Set(
      (1L, "a", T0, T0 + 2000, 2L),
      (2L, "a", T0 + 500, T0 + 3000, 2L)),
      "open-interval state did not survive the restart")
  }

  // -- cusumAlarms: frozen reference + running S+ ---------------------------

  test("cusumAlarms recovers the frozen mu0 and running S+: post-restart " +
      "chart rows continue the pre-restart accumulation") {
    val DayUs = 86400000000L
    def cf(day: Long, i: Long) =
      FactInput("e", "a", Array[Byte](1),
        tags = Map("ts_us" -> (day * DayUs + i * 1000).toString))
    // warm-up (days 0..13 at 3/day → mu0 = 300 e2) completes and day 14's
    // surge row (n=9, S+ = 570) EMITS before the stop; the post-restart
    // rows are only correct if both the frozen mu0 and S+ survived
    val phase1 = (0L until 14L).flatMap(d => (0L until 3L).map(i => cf(d, i))) ++
      (0L until 9L).map(i => cf(14L, i)) :+ cf(15L, 0L)
    val phase2 = (1L until 9L).map(i => cf(15L, i)) ++
      (0L until 9L).map(i => cf(16L, i)) ++
      (0L until 9L).map(i => cf(17L, i)) :+ cf(18L, 0L)
    val (o1, o2, oU) = runBoth("append", phase1, phase2)(df =>
      FactStateStreams.cusumAlarms(spark, df.selectExpr(
        "subject AS event_type",
        "timestamp_micros(CAST(tags['ts_us'] AS BIGINT)) AS ts")))
    def key(c: CusumUpdate) = (c.eventType, c.day, c.n, c.mu0E2, c.sPlusE2, c.alarm)
    assert((o1 ++ o2).map(key).sorted == oU.map(key).sorted,
      s"recovered chart diverged:\n i=${(o1 ++ o2).map(key).sorted}\n u=${oU.map(key).sorted}")
    assert(o1.map(key) == Seq(("a", 14L, 9L, 300L, 570L, 0L)), s"phase1: $o1")
    assert(o2.map(key).sorted == Seq(
      ("a", 15L, 9L, 300L, 1140L, 0L),
      ("a", 16L, 9L, 300L, 1710L, 1L),
      ("a", 17L, 9L, 300L, 2280L, 1L)),
      "mu0/S+ state did not survive the restart")
    // no duplicated emission across the boundary
    val all = (o1 ++ o2).map(key)
    assert(all.distinct.size == all.size, "duplicate chart rows across restart")
  }

  // -- spaceSavingTopK: bounded counter summary -----------------------------

  test("spaceSavingTopK recovers its counters: final summary matches the " +
      "uninterrupted run and seq continues") {
    def tf(lang: String, h: Long) =
      FactInput("t", lang, Array[Byte](1), tags = Map("h" -> h.toString))
    // k=3; phase 1 fills the summary and forces one eviction (item 4
    // inherits item 3's count as error); phase 2's arrivals only produce
    // the right estimates if the pre-restart counters survived
    val phase1 = Seq.fill(5)(tf("en", 1)) ++ Seq.fill(3)(tf("en", 2)) ++
      Seq.fill(2)(tf("en", 3)) :+ tf("en", 4)
    val phase2 = Seq(tf("en", 3), tf("en", 5), tf("en", 5), tf("en", 1))
    val (o1, o2, oU) = runBoth("update", phase1, phase2)(df =>
      FactStateStreams.spaceSavingTopK(spark,
        df.selectExpr("subject AS lang", "CAST(tags['h'] AS BIGINT) AS h",
          "position AS pos"), 3))
    def finalSum(rows: Seq[TopKSlot]): Map[String, Seq[(Long, Long, Long, Long)]] =
      rows.groupBy(_.lang).map { case (l, rs) =>
        val last = rs.map(_.seq).max
        l -> rs.filter(_.seq == last).sortBy(_.rank)
          .map(r => (r.rank, r.h, r.est, r.maxErr))
      }
    assert(finalSum(o1 ++ o2) == finalSum(oU),
      "recovered summary diverged from the uninterrupted run")
    val (before, after) = (o1.map(_.seq), o2.map(_.seq))
    assert(before.nonEmpty && after.nonEmpty && after.min > before.max,
      "seq did not continue across the restart")
    val all = o1 ++ o2
    assert(all.map(s => (s.lang, s.seq, s.rank)).distinct.size == all.size)
  }

  // -- valueQuantiles: full-histogram state ---------------------------------

  test("valueQuantiles recovers its histogram: post-restart percentiles " +
      "reflect pre-restart counts and match the uninterrupted run") {
    def vf(tpe: String, v: Double) =
      FactInput("v", tpe, Array[Byte](1), tags = Map("value" -> v.toString))
    // phase 1 loads the low half of the distribution; phase 2 adds the
    // high half — the final p50/p90 are only right if the phase-1 buckets
    // survived the restart (a reset state would report high-only quantiles)
    val phase1 = (1 to 40).map(i => vf("en", i.toDouble))
    val phase2 = (61 to 80).map(i => vf("en", i.toDouble))
    val (o1, o2, oU) = runBoth("update", phase1, phase2)(df =>
      FactStateStreams.valueQuantiles(spark,
        df.selectExpr("subject AS event_type",
          "CAST(tags['value'] AS DOUBLE) AS value")))
    def fin(rows: Seq[QuantUpdate]): Map[String, (Long, Long, Long, Long, Long)] =
      rows.groupBy(_.eventType).map { case (t, rs) =>
        val last = rs.maxBy(_.seq)
        t -> ((last.nEvents, last.p50, last.p90, last.p99, last.maxBucket))
      }
    assert(fin(o1 ++ o2) == fin(oU),
      "recovered histogram diverged from the uninterrupted run")
    // 60 values (1..40 ∪ 61..80): rank rule → p50 at cum·100 ≥ 60·50 is
    // bucket 30 — below the restart boundary, so it proves phase-1 state
    val last = fin(o1 ++ o2)("en")
    assert(last == ((60L, 30L, 74L, 80L, 80L)), s"unexpected quantiles: $last")
    assert(o2.map(_.seq).min > o1.map(_.seq).max)
  }

  // -- piiLuhnCensus: additive per-source counters ---------------------------

  test("piiLuhnCensus recovers its counters: totals match the uninterrupted " +
      "run and seq continues across the restart") {
    // doc texts carry explicit 16-digit runs with known Luhn validity:
    // 4539578763621486 is Luhn-valid, 4539578763621487 is not
    def doc(id: Long, source: String, text: String) =
      FactInput("doc", source, Array[Byte](1),
        tags = Map("doc_id" -> id.toString, "text" -> text))
    val phase1 = Seq(
      doc(1, "web", "pay with 4539578763621486 today"),
      doc(5, "web", "no digits here at all"),
      doc(9, "books", "ref 4539578763621487 invalid run"))
    val phase2 = Seq(
      doc(13, "web", "two runs 4539578763621486 and 4539578763621487"),
      doc(17, "books", "plain text again"))
    val (o1, o2, oU) = runBoth("update", phase1, phase2)(df =>
      FactStateStreams.piiLuhnCensus(spark,
        df.selectExpr("CAST(tags['doc_id'] AS BIGINT) AS doc_id",
          "subject AS source", "tags['text'] AS text")))
    def fin(rows: Seq[LuhnUpdate]): Map[String, (Long, Long, Long, Long, Long)] =
      rows.groupBy(_.source).map { case (s, rs) =>
        val l = rs.maxBy(_.seq)
        s -> ((l.n_docs, l.docs_with_cand, l.n_candidates, l.n_luhn_valid, l.docs_with_valid))
      }
    assert(fin(o1 ++ o2) == fin(oU), s"${fin(o1 ++ o2)} vs ${fin(oU)}")
    // the counters must reflect BOTH phases (state survived, not reset):
    // doc_ids 1..17 avoid the %4==0 augmentation, so counts come from the
    // text runs alone: web saw 3 docs / 3 candidate runs / 2 valid
    assert(fin(o1 ++ o2)("web") == ((3L, 2L, 3L, 2L, 2L)), fin(o1 ++ o2)("web").toString)
    o2.groupBy(_.source).foreach { case (s, rs) =>
      val before = o1.filter(_.source == s).map(_.seq)
      assert(before.nonEmpty && rs.map(_.seq).min > before.max,
        s"$s: seq did not continue across restart")
    }
  }

  test("benfordCensus recovers its nine counters: final census matches the " +
      "uninterrupted run and reflects both phases") {
    def ev(id: Long, typ: String, value: Double) =
      FactInput("ev", typ, Array[Byte](1),
        tags = Map("event_id" -> id.toString, "value" -> value.toString))
    // first digits: phase1 gives click {1:2, 2:1}, pay {9:1};
    // phase2 adds click {1:1, 3:1}, pay {9:1} — the final census is only
    // correct if phase1's counters survived the restart
    val phase1 = Seq(
      ev(1, "click", 1.23), ev(2, "click", 10.5), ev(3, "click", 2.0),
      ev(4, "pay", 900.0))
    val phase2 = Seq(
      ev(5, "click", 1.99), ev(6, "click", 33.0), ev(7, "pay", 9.5))
    val (o1, o2, oU) = runBoth("update", phase1, phase2)(df =>
      FactStateStreams.benfordCensus(spark,
        df.selectExpr("subject AS event_type",
          "CAST(tags['value'] AS DOUBLE) AS value")))
    def fin(rows: Seq[BenfordUpdate]): Map[(String, Long), (Long, Long)] =
      rows.groupBy(_.eventType).flatMap { case (t, rs) =>
        val last = rs.map(_.seq).max
        rs.filter(_.seq == last).map(r => (t, r.digit) -> ((r.n, r.obsPpm)))
      }
    assert(fin(o1 ++ o2) == fin(oU), s"${fin(o1 ++ o2)} vs ${fin(oU)}")
    // cross-phase counters: click digit 1 must be 3 (2 pre + 1 post)
    assert(fin(o1 ++ o2)(("click", 1L))._1 == 3L, fin(o1 ++ o2).toString)
    assert(fin(o1 ++ o2)(("pay", 9L))._1 == 2L)
    o2.groupBy(_.eventType).foreach { case (t, rs) =>
      val before = o1.filter(_.eventType == t).map(_.seq)
      assert(before.nonEmpty && rs.map(_.seq).min > before.max,
        s"$t: seq did not continue across restart")
    }
  }

  // -- bloomFirstSeen: saturating bit-array state ----------------------------

  test("bloomFirstSeen recovers its bit segments: a pre-restart user is " +
      "maybe-dup after the restart and the census matches the uninterrupted run") {
    val T0 = 1700000000000000L
    def ev(id: Long, user: Long, tsUs: Long) =
      FactInput("ev", user.toString, Array[Byte](1),
        tags = Map("ts_us" -> tsUs.toString, "eid" -> id.toString))
    // users 10/11/12 first-seen in phase 1; phase 2 re-delivers 10 and 11
    // (maybe-dup ONLY if the bit array survived — a reset state would
    // report them first-seen again) plus new users 13/14
    val phase1 = Seq(ev(1, 10, T0), ev(2, 11, T0 + 1000), ev(3, 12, T0 + 2000))
    val phase2 = Seq(ev(4, 10, T0 + 5000), ev(5, 13, T0 + 6000),
      ev(6, 11, T0 + 7000), ev(7, 14, T0 + 8000))
    val (o1, o2, oU) = runBoth("update", phase1, phase2)(df =>
      FactStateStreams.bloomFirstSeen(spark, df.selectExpr(
        "CAST(subject AS BIGINT) AS user_id",
        "timestamp_micros(CAST(tags['ts_us'] AS BIGINT)) AS ts",
        "CAST(tags['eid'] AS BIGINT) AS event_id")))
    def fin(rows: Seq[BloomFsUpdate]): Map[Long, (Long, Long, Long, Long)] =
      rows.groupBy(_.shard).map { case (sh, rs) =>
        val last = rs.maxBy(_.seq)
        sh -> ((last.nEvents, last.nFirst, last.nMaybeDup, last.nSetBits))
      }
    assert(fin(o1 ++ o2) == fin(oU), s"${fin(o1 ++ o2)} vs ${fin(oU)}")
    // exactly the 2 re-deliveries are maybe-dup (5 distinct users, sparse
    // segments → no bloom FP at this occupancy), across all shards
    val totals = fin(o1 ++ o2).values.toSeq
    assert(totals.map(_._1).sum == 7L)
    assert(totals.map(_._3).sum == 2L,
      s"expected the 2 pre-restart users to be maybe-dup: ${fin(o1 ++ o2)}")
    o2.groupBy(_.shard).foreach { case (sh, rs) =>
      val before = o1.filter(_.shard == sh).map(_.seq)
      if (before.nonEmpty)
        assert(rs.map(_.seq).min > before.max,
          s"shard $sh: seq did not continue across restart")
    }
  }

  // -- lshBucketCensus: per-bucket counters + label set ----------------------

  test("lshBucketCensus recovers its bucket censuses: post-restart vectors " +
      "extend pre-restart counts and the final census matches the " +
      "uninterrupted run") {
    val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .selectExpr("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2))).take(40).toSeq
    def vf(v: (Long, Int, Seq[Float])) =
      FactInput("vec", v._1.toString, Array[Byte](1),
        tags = Map("label" -> v._2.toString,
          "emb" -> v._3.map(_.toString).mkString(",")))
    val (phase1, phase2) = vecs.splitAt(25)
    val (o1, o2, oU) = runBoth("update", phase1.map(vf), phase2.map(vf))(df =>
      FactStateStreams.lshBucketCensus(spark, df.selectExpr(
        "CAST(subject AS BIGINT) AS vec_id",
        "CAST(tags['label'] AS INT) AS label",
        "transform(split(tags['emb'], ','), x -> CAST(x AS FLOAT)) AS embedding")))
    def fin(rows: Seq[LshBucketUpdate]): Map[Long, (Long, Long, Long, Long)] =
      rows.groupBy(_.bucket).map { case (b, rs) =>
        val last = rs.maxBy(_.seq)
        b -> ((last.nVectors, last.minVecId, last.maxVecId, last.nLabels))
      }
    assert(fin(o1 ++ o2) == fin(oU), s"${fin(o1 ++ o2)} vs ${fin(oU)}")
    // cumulative across the restart: total vectors == 40 (counters survived;
    // a reset state would recount only phase 2 in shared buckets)
    assert(fin(o1 ++ o2).values.map(_._1).sum == vecs.size.toLong)
    o2.groupBy(_.bucket).foreach { case (b, rs) =>
      val before = o1.filter(_.bucket == b).map(_.seq)
      if (before.nonEmpty)
        assert(rs.map(_.seq).min > before.max,
          s"bucket $b: seq did not continue across restart")
    }
  }

  // -- knnMaintenance: per-probe top-k list + arrival counter ---------------

  test("knnMaintenance recovers its neighborhoods: a pre-restart neighbor " +
      "that phase 2 cannot re-deliver must survive in the final top-k") {
    val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .selectExpr("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val probes = vecs.take(4)
      .map { case (id, v) => (id, v.map(_.toDouble).toArray) }.toSeq
    val pool = vecs.slice(4, 34).toSeq
    def vf(v: (Long, Seq[Float])) =
      FactInput("vec", v._1.toString, Array[Byte](1),
        tags = Map("emb" -> v._2.map(_.toString).mkString(",")))
    // phase 1 holds HALF the pool — its best neighbors exist only in
    // pre-restart state; a reset would rebuild the top-k from phase 2 only
    val (phase1, phase2) = pool.splitAt(15)
    val (o1, o2, oU) = runBoth("update", phase1.map(vf), phase2.map(vf))(df =>
      FactStateStreams.knnMaintenance(spark, df.selectExpr(
        "CAST(subject AS BIGINT) AS vec_id",
        "transform(split(tags['emb'], ','), x -> CAST(x AS FLOAT)) AS embedding"),
        probes, k = 4))
    def fin(rows: Seq[KnnUpdate]): Map[Long, (Long, Seq[Long], Seq[Long])] =
      rows.groupBy(_.probeId).map { case (p, rs) =>
        val last = rs.maxBy(_.seq)
        p -> ((last.nSeen, last.neighborIds, last.neighborCos))
      }
    assert(fin(o1 ++ o2) == fin(oU), s"${fin(o1 ++ o2)} vs ${fin(oU)}")
    // counters cumulative across the restart (phase-2-only state would
    // count 15, not 30)
    assert(fin(o1 ++ o2).values.forall(_._1 == pool.size.toLong))
    // the final neighborhoods must draw from BOTH phases' id ranges
    // somewhere, else the scenario never exercised survival
    val allNbrs = fin(o1 ++ o2).values.flatMap(_._2).toSet
    assert(allNbrs.exists(id => phase1.exists(_._1 == id)) &&
      allNbrs.exists(id => phase2.exists(_._1 == id)),
      "degenerate corpus: neighborhoods drawn from one phase only")
    o2.groupBy(_.probeId).foreach { case (p, rs) =>
      val before = o1.filter(_.probeId == p).map(_.seq)
      assert(before.nonEmpty && rs.map(_.seq).min > before.max,
        s"probe $p: seq did not continue across restart")
    }
  }

  // -- transitions: one string of Markov state per user ---------------------

  test("transitions recovers per-user last types: the cross-restart " +
      "transition emits exactly once and matches the uninterrupted run") {
    val T0 = 1700000000000000L
    def ef(uid: Long, typ: String, us: Long, eid: Long) =
      FactInput("e", uid.toString, Array[Byte](1),
        tags = Map("t" -> typ, "us" -> us.toString, "eid" -> eid.toString))
    // user 1: view(p1) -> click(p2); user 2: click,view(p1) -> purchase(p2)
    val phase1 = Seq(ef(1, "view", T0, 1), ef(2, "click", T0 + 10, 2),
      ef(2, "view", T0 + 20, 3))
    val phase2 = Seq(ef(1, "click", T0 + 30, 4), ef(2, "purchase", T0 + 40, 5))
    def face(df: DataFrame) =
      FactStateStreams.transitions(spark, df.selectExpr(
        "CAST(subject AS BIGINT) AS user_id", "tags['t'] AS event_type",
        "timestamp_micros(CAST(tags['us'] AS BIGINT)) AS ts",
        "CAST(tags['eid'] AS BIGINT) AS event_id"))
    val (o1, o2, oU) = runBoth("append", phase1, phase2)(face)
    def key(t: Transition) = (t.userId, t.prevType, t.nextType, t.tsUs)
    assert((o1 ++ o2).map(key).sorted == oU.map(key).sorted,
      s"${o1 ++ o2} vs $oU")
    // the cross-boundary transitions exist and emit in phase 2 ONLY —
    // a reset state would treat the phase-2 event as a user's first
    assert(o2.map(key).contains((1L, "view", "click", T0 + 30)))
    assert(o2.map(key).contains((2L, "view", "purchase", T0 + 40)))
    assert((o1 ++ o2).map(key).distinct.size == (o1 ++ o2).size,
      "a transition emitted twice across the restart")
  }

  // -- ewmaAnomaly: recursive (level, deviation) state ----------------------

  test("ewmaAnomaly recovers its level: a post-restart spike is judged " +
      "against the PRE-restart EWMA, not re-seeded") {
    val T0 = 1700000000000000L
    val DayUs = 86400L * 1000000
    def ef(typ: String, day: Long, i: Long) =
      FactInput("e", typ, Array[Byte](1),
        tags = Map("us" -> (T0 + day * DayUs + i * 1000).toString))
    // phase 1: 3 quiet days of 4 events; phase 2: a 20-event spike day
    // then a flush day. A reset state would SEED on the spike (no flag).
    val phase1 = (0L to 2L).flatMap(d => (1L to 4L).map(i => ef("a", d, i)))
    val phase2 = (1L to 20L).map(i => ef("a", 3, i)) :+ ef("a", 4, 1)
    def face(df: DataFrame) =
      FactStateStreams.ewmaAnomaly(spark, df.selectExpr(
        "subject AS event_type",
        "timestamp_micros(CAST(tags['us'] AS BIGINT)) AS ts"))
    val (o1, o2, oU) = runBoth("append", phase1, phase2)(face)
    def key(u: EwmaUpdate) = (u.eventType, u.day, u.n, u.ewmaPrev, u.dev, u.isAnomaly)
    assert((o1 ++ o2).map(key).sorted == oU.map(key).sorted,
      s"${o1 ++ o2} vs $oU")
    val spikeDay = (T0 + 3 * DayUs) / DayUs
    val spike = o2.find(_.day == spikeDay)
    assert(spike.exists(_.isAnomaly == 1L),
      s"spike day not flagged against the recovered level: $o2")
  }

  // -- tradeFlowCensus: exact BigInt flow sum per nation pair ---------------

  test("tradeFlowCensus recovers its pair sums: post-restart flows extend " +
      "pre-restart totals exactly (BigInt state round-trips)") {
    def ff(src: String, dst: String, rev: Long) =
      FactInput("f", s"$src|$dst", Array[Byte](1),
        tags = Map("src" -> src, "dst" -> dst, "rev" -> rev.toString))
    // pair (A,B) accumulates across the restart; (C,D) exists only before;
    // (E,F) only after — a reset state would zero (A,B)'s phase-1 mass
    val phase1 = Seq(ff("A", "B", 1000), ff("A", "B", 2500), ff("C", "D", 7))
    val phase2 = Seq(ff("A", "B", 4200), ff("E", "F", 99))
    def face(df: DataFrame) =
      FactStateStreams.tradeFlowCensus(spark, df.selectExpr(
        "tags['src'] AS src_nation", "tags['dst'] AS dst_nation",
        "CAST(tags['rev'] AS BIGINT) AS rev_e8"))
    val (o1, o2, oU) = runBoth("update", phase1, phase2)(face)
    def fin(rows: Seq[FlowUpdate]): Map[(String, String), (Long, String)] =
      rows.groupBy(r => (r.srcNation, r.dstNation)).map { case (p, rs) =>
        val last = rs.maxBy(_.seq); p -> ((last.nRows, last.flowE8))
      }
    assert(fin(o1 ++ o2) == fin(oU), s"${fin(o1 ++ o2)} vs ${fin(oU)}")
    assert(fin(o1 ++ o2)(("A", "B")) == ((3L, "7700")),
      "cross-restart pair did not accumulate")
    assert(fin(o1 ++ o2)(("C", "D")) == ((1L, "7")))
    assert(fin(o1 ++ o2)(("E", "F")) == ((1L, "99")))
    o2.filter(r => r.srcNation == "A").foreach { r =>
      val before = o1.filter(x => x.srcNation == "A").map(_.seq)
      assert(before.nonEmpty && r.seq > before.max, "seq did not continue")
    }
  }

  // -- embeddingDriftMonitor: running moment sums per panel probe -----------

  test("embeddingDriftMonitor recovers its moments: post-restart arrivals " +
      "extend pre-restart sums and extremes exactly") {
    val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .selectExpr("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val panel = vecs.take(3)
      .map { case (id, v) => (id, v.map(_.toDouble).toArray) }.toSeq
    val pool = vecs.slice(3, 27).toSeq
    def vf(v: (Long, Seq[Float])) =
      FactInput("vec", v._1.toString, Array[Byte](1),
        tags = Map("emb" -> v._2.map(_.toString).mkString(",")))
    val (phase1, phase2) = pool.splitAt(13)
    val (o1, o2, oU) = runBoth("update", phase1.map(vf), phase2.map(vf))(df =>
      FactStateStreams.embeddingDriftMonitor(spark, df.selectExpr(
        "CAST(subject AS BIGINT) AS vec_id",
        "transform(split(tags['emb'], ','), x -> CAST(x AS FLOAT)) AS embedding"),
        panel))
    def fin(rows: Seq[DriftUpdate]): Map[Long, (Long, Long, Long, Long, Long)] =
      rows.groupBy(_.probeId).map { case (p, rs) =>
        val last = rs.maxBy(_.seq)
        p -> ((last.n, last.meanCosPpm, last.meanAbsCosPpm,
          last.minCosPpm, last.maxCosPpm))
      }
    assert(fin(o1 ++ o2) == fin(oU), s"${fin(o1 ++ o2)} vs ${fin(oU)}")
    // n is cumulative across the restart — a reset would count 11 only
    assert(fin(o1 ++ o2).values.forall(_._1 == pool.size.toLong))
    o2.groupBy(_.probeId).foreach { case (p, rs) =>
      val before = o1.filter(_.probeId == p).map(_.seq)
      assert(before.nonEmpty && rs.map(_.seq).min > before.max,
        s"probe $p: seq did not continue across restart")
    }
  }

  // -- firstSeenByContent: exact-dedup bit per content hash -----------------

  test("firstSeenByContent recovers its seen-set: a pre-restart payload " +
      "re-appended after the restart must NOT re-emit") {
    def pf(tag: String, body: String) =
      FactInput("doc", tag, body.getBytes("UTF-8"))
    val phase1 = Seq(pf("a", "alpha"), pf("b", "beta"))
    // re-append alpha (new fact, same content) + a genuinely new gamma
    val phase2 = Seq(pf("c", "alpha"), pf("d", "gamma"))
    def face(df: DataFrame) = FactStateStreams.firstSeenByContent(spark, df)
    val (o1, o2, oU) = runBoth("append", phase1, phase2)(face)
    assert((o1 ++ o2).map(_.contentHash).sorted == oU.map(_.contentHash).sorted)
    assert(o2.map(_.subject).sorted == Seq("d"),
      s"phase 2 must emit only gamma (the recovered seen-set eats alpha): $o2")
    assert((o1 ++ o2).map(_.contentHash).distinct.size == 3)
  }
}
