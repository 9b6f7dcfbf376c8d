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

  /** First occurrence of each payload content hash on a live fact stream —
    * streaming exact dedup for an ingest pipeline. State is one boolean per
    * content hash in the state store, sharded by hash across executors;
    * re-deliveries and duplicate appends are dropped across micro-batches
    * (and across restarts, via checkpointing). */
  final case class FirstSeen(id: String, subject: String, position: Long, contentHash: String)

  def firstSeenByContent(spark: SparkSession, factStream: DataFrame): Dataset[FirstSeen] = {
    import spark.implicits._
    factStream
      .selectExpr("id", "subject", "position", "md5(payload_data) AS h")
      .as[(String, String, Long, String)]
      .groupByKey(_._4)
      .flatMapGroupsWithState[Boolean, FirstSeen](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) { (h, rows, state) =>
        if (state.exists) Iterator.empty
        else {
          state.update(true)
          val first = rows.minBy(_._3) // lowest position wins within a batch
          Iterator.single(FirstSeen(first._1, first._2, first._3, h))
        }
      }
  }

  /** One live counter cell of a streaming count-min sketch. */
  final case class CmsCell(depth: Long, cell: Long, n: Long)

  /** Streaming heavy-hitter tracking of subjects over a live fact tail: a
    * count-min sketch whose cells are managed stream state. Unlike
    * [[subjectStates]] (one state entry PER SUBJECT), state here is bounded
    * by the fixed grid — Depth × Width counters regardless of how many
    * distinct subjects the stream ever sees, which is the point of a sketch
    * on an unbounded stream. Each micro-batch explodes its facts into
    * (depth, cell) increments (the same pinned hash constants as the batch
    * CMS in operators/Sketches.scala, so batch and streaming sketches are
    * mergeable with each other); a subject's estimated frequency is the min
    * over its Depth probed cells, and can only over-count. Emits the
    * updated count for every cell touched by a batch (Update mode). */
  def hotSubjectCells(spark: SparkSession, factStream: DataFrame): Dataset[CmsCell] = {
    import spark.implicits._
    graft.functions.TextHashFunctions.register(spark)
    graft.operators.Sketches
      .cellPairs(factStream.selectExpr("char_hash(subject) AS h"))
      .as[(Long, Long)]
      .groupByKey(identity)
      .mapGroupsWithState[Long, CmsCell](GroupStateTimeout.NoTimeout) {
        (dc, rows, state) =>
          val next = state.getOption.getOrElse(0L) + rows.size
          state.update(next)
          CmsCell(dc._1, dc._2, next)
      }
  }

  /** A streaming near-dup candidate: two docs sharing a MinHash band
    * bucket, with the signature-agreement Jaccard estimate (matching
    * components over the pinned permutation count, in basis points). */
  final case class NearDupCandidate(docA: Long, docB: Long, estJaccardBp: Long)

  /** Streaming MinHash near-dup detection over a document stream
    * (`doc_id`, `text`) — the Structured Streaming face of the batch
    * `dedup_incremental` operator: every arriving doc is signed once
    * (codegen'd shingle/minhash kernels, same pinned constants as the
    * batch side) and checked ONLY against prior members of its 4 LSH band
    * buckets, which live as managed stream state sharded by bucket across
    * executors. Emitted pairs carry the signature-agreement estimate;
    * exact verification (or the batch verifier) runs downstream on the
    * candidate trickle, never on the stream itself. Per-bucket COMPARISON
    * membership is capped (`maxBucket`) so a degenerate bucket (boilerplate
    * corpus) bounds per-doc work instead of growing with the stream; real
    * dup buckets are far below any sane cap. Docs arriving past the cap
    * keep an id-only seen-marker in state (markers themselves capped at
    * 4×maxBucket), so an at-least-once redelivery does not re-emit their
    * pairs; past the marker cap state stops growing and redelivery may
    * re-emit — the documented trade that keeps state bounded. The same pair can
    * surface from up to 4 buckets — consumers dedup the (docA, docB) pair, which is
    * batch-local and cheap. */
  def nearDupCandidates(spark: SparkSession, docs: DataFrame,
      maxBucket: Int = 64): Dataset[NearDupCandidate] = {
    import spark.implicits._
    import graft.functions.CrossHash._
    graft.functions.TextHashFunctions.register(spark)
    docs
      .selectExpr("doc_id",
        s"array_distinct(${shingleHashesSpark(wordHashesSpark("text"))}) AS sh")
      .filter("size(sh) > 0")
      .selectExpr("doc_id", s"${minhashSigSpark("sh")} AS sig")
      .selectExpr("doc_id", "sig",
        s"""explode(transform(sequence(0, ${Bands - 1}),
            b -> struct(b AS band, ${bandKeySpark("sig", "b")} AS bkey))) AS e""")
      .selectExpr("e.band AS band", "e.bkey AS bkey", "doc_id", "sig")
      .as[(Int, Long, Long, Seq[Long])]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[Seq[(Long, Seq[Long])], NearDupCandidate](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) { (_, rows, state) =>
        // full entries (sig nonEmpty) are comparison candidates, bounded by
        // maxBucket; empty-sig entries are id-only seen-markers for docs
        // that arrived past the cap — an at-least-once redelivery of such a
        // doc in a later micro-batch must NOT re-emit its pairs. Markers
        // are THEMSELVES bounded (4 × maxBucket): past that, state stops
        // growing and a redelivered past-cap doc may re-emit — boundedness
        // is the harder invariant, so the residual at-least-once edge is
        // the documented trade, not unbounded state.
        val markerCap = 4 * maxBucket
        var members = state.getOption.getOrElse(Seq.empty)
        var nFull = members.count(_._2.nonEmpty)
        val out = Seq.newBuilder[NearDupCandidate]
        // deterministic intra-batch order: lower doc_id is "prior"
        rows.toSeq.sortBy(_._3).foreach { case (_, _, id, sig) =>
          if (!members.exists(_._1 == id)) {
            members.foreach { case (mid, msig) =>
              if (msig.nonEmpty) {
                val eq = sig.zip(msig).count { case (a, b) => a == b }
                // denominator follows the pinned permutation count — a wider
                // signature must not silently inflate the estimate
                out += NearDupCandidate(math.min(id, mid), math.max(id, mid),
                  eq.toLong * 10000 / MinhashPerms.size)
              }
            }
            if (nFull < maxBucket) { members = members :+ ((id, sig)); nFull += 1 }
            else if (members.size < maxBucket + markerCap)
              members = members :+ ((id, Seq.empty[Long]))
          }
        }
        state.update(members)
        out.result().iterator
      }
  }

  /** A CONFIRMED streaming near-duplicate: exact shingle-set Jaccard (not
    * the signature estimate) in basis points. */
  final case class VerifiedNearDup(docA: Long, docB: Long, jaccardBp: Long)

  /** Streaming dedup-on-ingest with a verify stage: [[nearDupCandidates]]
    * produces the band-bucket candidate trickle, and each candidate pair
    * is exactly verified (shingle-set Jaccard, same kernels and ≥ 0.7 bar
    * as the batch `dedup_minhash_lsh` verifier) via a STREAM-STATIC join
    * back to the corpus relation, so the stream emits confirmed duplicate
    * pairs rather than candidates. The verify join is equi on doc_id with
    * a candidate-trickle-sized stream side — at 100 TB the corpus side is
    * the store's documents table and the per-batch cost scales with the
    * candidates, not the corpus. The same pair can reach the verifier from
    * up to 4 band buckets; the exact join is deterministic, so duplicates
    * agree — consumers drop repeats by (docA, docB) as with candidates. */
  def verifiedNearDups(spark: SparkSession, docs: DataFrame, corpus: DataFrame,
      minJaccardBp: Long = 7000, maxBucket: Int = 64): Dataset[VerifiedNearDup] = {
    import spark.implicits._
    import graft.functions.CrossHash._
    import org.apache.spark.sql.functions.col
    graft.functions.TextHashFunctions.register(spark)
    // persisted: a stream-static join re-executes the static plan every
    // micro-batch — without the cache each trigger would re-shingle the
    // whole corpus (twice), breaking the per-batch-cost-scales-with-the-
    // candidates contract
    val sh = graft.operators.CacheScope.persist(corpus
      .selectExpr("doc_id",
        s"array_distinct(${shingleHashesSpark(wordHashesSpark("text"))}) AS sh")
      .filter("size(sh) > 0"))
    nearDupCandidates(spark, docs, maxBucket).toDF()
      .join(sh.as("l"), col("docA") === col("l.doc_id"))
      .join(sh.as("r"), col("docB") === col("r.doc_id"))
      .selectExpr("docA", "docB",
        "CAST(size(array_intersect(l.sh, r.sh)) AS BIGINT) AS n_common",
        "CAST(size(l.sh) + size(r.sh) - size(array_intersect(l.sh, r.sh)) AS BIGINT) AS n_union")
      .selectExpr("docA", "docB", "(n_common * 10000) div n_union AS jaccardBp")
      .filter(col("jaccardBp") >= minJaccardBp)
      .as[VerifiedNearDup]
  }

  /** A closed user session: contiguous activity with no gap above the
    * session threshold, finalized once the watermark passes its end. */
  final case class ClosedSession(
      userId: Long, startUs: Long, endUs: Long, nEvents: Long, nTypes: Long)

  /** Managed state for one in-flight session (public: the state encoder
    * needs the synthesized constructor; `types` is a distinct list because
    * the product encoder has no Set column type). */
  final case class OpenSession(
      startUs: Long, endUs: Long, nEvents: Long, types: Seq[String])

  /** Streaming gap sessionization — the live twin of the batch
    * `events_sessionize` operator (operators/Sessions.scala), and the one
    * state pattern the rest of this module doesn't exercise: EVENT-TIME
    * TIMEOUT. The open session per user is managed state; it closes either
    * when a later event from the same user arrives past the gap (emitted
    * immediately) or when the WATERMARK passes sessionEnd + gap (emitted by
    * the timeout callback — so an idle user's final session still flushes
    * without any further input from them, which `NoTimeout` state can never
    * do). State is one fixed-size record per ACTIVE user — closed sessions
    * leave the store, so state tracks concurrency, not history; sharded by
    * user across executors and restart-safe via checkpointing.
    *
    * Input: an event stream with `user_id`, `event_type`, and an event-time
    * `ts` TIMESTAMP column ALREADY watermarked by the caller (the watermark
    * bounds both lateness and timeout progress). In-batch events fold in
    * ts order; events later than an already-closed boundary open new
    * sessions exactly as the batch operator's cumulative-gap rule does.
    * The session threshold matches the batch side: 30 minutes. */
  def sessionize(spark: SparkSession, events: DataFrame,
      gapUs: Long = 1800L * 1000000): Dataset[ClosedSession] = {
    import spark.implicits._
    events
      .selectExpr("user_id", "event_type", "unix_micros(ts) AS ts_us", "ts")
      .as[(Long, String, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout) { (userId, rows, state) =>
        if (state.hasTimedOut) {
          // watermark passed end + gap: the open session can no longer be
          // extended by any non-late event — flush it
          val s = state.get
          state.remove()
          Iterator.single(ClosedSession(userId, s.startUs, s.endUs, s.nEvents, s.types.size.toLong))
        } else {
          val closed = Seq.newBuilder[ClosedSession]
          var open = state.getOption
          rows.toSeq.sortBy(_._3).foreach { case (_, typ, ts, _) =>
            open match {
              case Some(s) if ts - s.endUs <= gapUs =>
                val types = if (s.types.contains(typ)) s.types else s.types :+ typ
                open = Some(OpenSession(s.startUs, ts, s.nEvents + 1, types))
              case Some(s) =>
                closed += ClosedSession(userId, s.startUs, s.endUs, s.nEvents, s.types.size.toLong)
                open = Some(OpenSession(ts, ts, 1L, Seq(typ)))
              case None =>
                open = Some(OpenSession(ts, ts, 1L, Seq(typ)))
            }
          }
          open.foreach { s =>
            state.update(s)
            // re-arm the flush clock to this session's latest activity
            state.setTimeoutTimestamp(s.endUs / 1000 + gapUs / 1000)
          }
          closed.result().iterator
        }
      }
  }

  /** A closed SCD2 state interval: the user held `state` over
    * [validFromUs, validToUs) and then transitioned away. */
  final case class ClosedInterval(
      userId: Long, state: String, validFromUs: Long, validToUs: Long, nEvents: Long)

  /** Managed state: the user's CURRENT (open) interval. */
  final case class OpenInterval(state: String, validFromUs: Long, nEvents: Long)

  /** Streaming SCD2 state history — the live twin of the batch
    * `events_state_intervals` operator (operators/Temporal.scala): per
    * user, runs of consecutive identical event types become validity
    * intervals; an interval is EMITTED when the state transitions away
    * (its valid_to is the successor's valid_from, exactly the batch lead()
    * semantics), while the current interval deliberately stays in state —
    * it is open-ended by definition and no watermark can close it. State
    * is one fixed-width record per user ever seen; at 100 TB scale the
    * store grows with subject cardinality, not event volume, sharded by
    * user and restart-safe via checkpointing. */
  def stateIntervals(spark: SparkSession, events: DataFrame): Dataset[ClosedInterval] = {
    import spark.implicits._
    events
      .selectExpr("user_id", "event_type", "unix_micros(ts) AS ts_us")
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[OpenInterval, ClosedInterval](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) { (userId, rows, state) =>
        val closed = Seq.newBuilder[ClosedInterval]
        var open = state.getOption
        rows.toSeq.sortBy(r => (r._3, r._2)).foreach { case (_, typ, ts) =>
          open match {
            case Some(o) if o.state == typ =>
              open = Some(o.copy(nEvents = o.nEvents + 1))
            case Some(o) =>
              closed += ClosedInterval(userId, o.state, o.validFromUs, ts, o.nEvents)
              open = Some(OpenInterval(typ, ts, 1L))
            case None =>
              open = Some(OpenInterval(typ, ts, 1L))
          }
        }
        open.foreach(state.update)
        closed.result().iterator
      }
  }

  /** One closed day's autocorrelation snapshot: exact running lag-1
    * moment sums and the Pearson r they imply (ppm, floor — the same
    * pinned arithmetic as the batch `events_autocorr`). */
  final case class AutocorrUpdate(
      eventType: String, day: Long, n: Long,
      nPairs: Long, covNum: Long, rPpm: Option[Long])

  /** Streaming per-type autocorrelation state: the open (incomplete) day,
    * the previous day's closed count, and the six exact moment sums —
    * O(1) per event type regardless of stream length. */
  final case class AutocorrState(
      curDay: Long, curCount: Long, havePrev: Boolean, prev: Long,
      nPairs: Long, sx: Long, sy: Long, sxx: Long, syy: Long, sxy: Long)

  /** Streaming lag-1 autocorrelation of per-type daily event counts — the
    * live twin of the batch `events_autocorr`, with the SAME zero-fill
    * semantics: a gap of z empty days between two active days folds into
    * the moments in CLOSED FORM (the first zero day pairs with the last
    * closed count, the remaining z−1 pairs are (0,0) and only move
    * n_pairs), so state stays six integers however long the quiet period.
    * A day closes when the first event of a later day arrives; each
    * closure emits the updated moments and running r. At 100 TB/day the
    * state store shards by event type and every update is O(events in
    * batch) work + O(1) state. */
  def dailyAutocorr(spark: SparkSession, events: DataFrame): Dataset[AutocorrUpdate] = {
    import spark.implicits._
    val DayUs = 86400L * 1000000
    events
      .selectExpr("event_type", "unix_micros(ts) AS ts_us")
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[AutocorrState, AutocorrUpdate](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) { (typ, rows, state) =>
        val out = Seq.newBuilder[AutocorrUpdate]
        var st = state.getOption.orNull
        rows.toSeq.map(_._2 / DayUs).sorted.foreach { day =>
          st match {
            case null =>
              st = AutocorrState(day, 1L, havePrev = false, 0L, 0L, 0L, 0L, 0L, 0L, 0L)
            case s if day == s.curDay =>
              st = s.copy(curCount = s.curCount + 1)
            case s if day > s.curDay =>
              // close curDay: pair (x = curCount, y = prev) unless this is
              // the series' first day (batch zero-fill starts at min day)
              val c = s.curCount
              var (np, sx2, sy2, sxx2, syy2, sxy2) =
                (s.nPairs, s.sx, s.sy, s.sxx, s.syy, s.sxy)
              if (s.havePrev) {
                np += 1; sx2 += c; sy2 += s.prev
                sxx2 += c * c; syy2 += s.prev * s.prev; sxy2 += c * s.prev
              }
              // zero run curDay+1 .. day-1, folded in closed form
              val z = day - s.curDay - 1
              if (z > 0) {
                np += z      // one (0, c) pair + (z-1) (0, 0) pairs
                sy2 += c; syy2 += c * c
              }
              val prev2 = if (z == 0) c else 0L
              st = AutocorrState(day, 1L, havePrev = true, prev2,
                np, sx2, sy2, sxx2, syy2, sxy2)
              val covNum = np * sxy2 - sx2 * sy2
              val varX = np * sxx2 - sx2 * sx2
              val varY = np * syy2 - sy2 * sy2
              val r =
                if (np == 0 || varX == 0 || varY == 0) None
                else Some(math.floor(
                  covNum.toDouble * 1000000.0 /
                    math.sqrt(varX.toDouble * varY.toDouble)).toLong)
              out += AutocorrUpdate(typ, s.curDay, c, np, covNum, r)
            case s => // late event for an already-closed day: count it into
              // the open day's moments is wrong; drop it (watermark
              // discipline — the batch operator is the repair path)
              st = s
          }
        }
        if (st != null) state.update(st)
        out.result().iterator
      }
  }

  /** One closed grid day's EWMA anomaly verdict — identical columns and
    * arithmetic to a batch `events_ewma_anomaly` row. */
  final case class EwmaUpdate(
      eventType: String, day: Long, n: Long,
      ewmaPrev: Long, dev: Long, isAnomaly: Long)

  /** Streaming per-type EWMA state: the open day plus the recursion's two
    * integers (level e, mean-abs-deviation v) — O(1) per event type. */
  final case class EwmaState(
      curDay: Long, curCount: Long, seeded: Boolean, e: Long, v: Long)

  /** Live twin of the batch `events_ewma_anomaly` (fourteenth face): the
    * integer EWMA recursion e_d = (n_d + 3e) div 4, v_d = (|n_d − e| + 3v)
    * div 4 folds per event type as each grid day CLOSES (first event of a
    * later day arrives). Zero days between active days are grid rows in
    * the batch semantics, so the quiet run emits one row per zero day and
    * advances the recursion the same way — the run length is bounded by
    * the CALENDAR span, not the stream volume, and state stays two
    * integers through any quiet period. The first observed day seeds the
    * level and emits nothing (batch parity); late events for already-
    * closed days are dropped — dailyAutocorr's watermark discipline, the
    * batch operator is the repair path. All arithmetic is non-negative,
    * so Scala `/` and SQL `div` truncate identically. */
  def ewmaAnomaly(spark: SparkSession, events: DataFrame): Dataset[EwmaUpdate] = {
    import spark.implicits._
    val DayUs = 86400L * 1000000
    events
      .selectExpr("event_type", "unix_micros(ts) AS ts_us")
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[EwmaState, EwmaUpdate](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) { (typ, rows, state) =>
        val out = Seq.newBuilder[EwmaUpdate]
        var st = state.getOption.orNull
        rows.toSeq.map(_._2 / DayUs).sorted.foreach { day =>
          st match {
            case null =>
              st = EwmaState(day, 1L, seeded = false, 0L, 0L)
            case s if day == s.curDay =>
              st = s.copy(curCount = s.curCount + 1)
            case s if day > s.curDay =>
              var (e, v) = (s.e, s.v)
              var seeded = s.seeded
              if (!seeded) { e = s.curCount; v = 0L; seeded = true }
              else {
                val dev = math.abs(s.curCount - e)
                out += EwmaUpdate(typ, s.curDay, s.curCount, e, dev,
                  if (dev > 3 * v && dev > 3) 1L else 0L)
                val e2 = (s.curCount + 3 * e) / 4
                v = (dev + 3 * v) / 4
                e = e2
              }
              var zd = s.curDay + 1
              while (zd < day) { // zero grid days, in order
                val dev = e
                out += EwmaUpdate(typ, zd, 0L, e, dev,
                  if (dev > 3 * v && dev > 3) 1L else 0L)
                val e2 = (3 * e) / 4
                v = (dev + 3 * v) / 4
                e = e2
                zd += 1
              }
              st = EwmaState(day, 1L, seeded, e, v)
            case s => st = s // late event for a closed day: dropped
          }
        }
        if (st != null) state.update(st)
        out.result().iterator
      }
  }

  /** One closed grid day's Holt snapshot: the updated level/trend, the
    * one-step-ahead forecast they imply, and the running backtest MAE —
    * the same integer recursion as the batch `events_holt_winters`. */
  final case class HoltUpdate(
      eventType: String, day: Long, n: Long,
      level: Long, trend: Long, forecast: Long, maeE4: Long)

  /** Streaming per-type Holt state: the open day plus the fold's four
    * integers (level, trend, Σ|err|, day count) — O(1) per type. */
  final case class HoltState(
      curDay: Long, curCount: Long, seeded: Boolean,
      l: Long, t: Long, sae: Long, cnt: Long)

  /** Live twin of the batch `events_holt_winters` fold (fifteenth face):
    * level l = (n + 3(l+t)) div 4 and trend t = ((l' − l) + 7t) div 8
    * update as each grid day closes, emitting the refreshed one-step
    * forecast (l + t) and running backtest MAE — a forecast that is
    * always current without re-folding history. Quiet days are grid rows
    * (n = 0) exactly as in the batch zero-fill; the first observed day
    * seeds the level and emits nothing; late events for closed days are
    * dropped (batch is the repair path). Both engines' integer division
    * truncates toward zero, so signed trends agree bit-for-bit with the
    * batch fold over any prefix. */
  def holtForecast(spark: SparkSession, events: DataFrame): Dataset[HoltUpdate] = {
    import spark.implicits._
    val DayUs = 86400L * 1000000
    events
      .selectExpr("event_type", "unix_micros(ts) AS ts_us")
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[HoltState, HoltUpdate](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) { (typ, rows, state) =>
        val out = Seq.newBuilder[HoltUpdate]
        var st = state.getOption.orNull
        def fold(s: HoltState, day: Long, n: Long): HoltState = {
          // one batch-fold step for a CLOSED grid day (seeded state only)
          val l2 = (n + 3 * (s.l + s.t)) / 4
          val t2 = ((l2 - s.l) + 7 * s.t) / 8
          val sae2 = s.sae + math.abs(n - (s.l + s.t))
          val cnt2 = s.cnt + 1
          out += HoltUpdate(typ, day, n, l2, t2, l2 + t2, sae2 * 10000 / cnt2)
          s.copy(l = l2, t = t2, sae = sae2, cnt = cnt2)
        }
        rows.toSeq.map(_._2 / DayUs).sorted.foreach { day =>
          st match {
            case null =>
              st = HoltState(day, 1L, seeded = false, 0L, 0L, 0L, 0L)
            case s if day == s.curDay =>
              st = s.copy(curCount = s.curCount + 1)
            case s if day > s.curDay =>
              var cur =
                if (!s.seeded) s.copy(seeded = true, l = s.curCount, t = 0L)
                else fold(s, s.curDay, s.curCount)
              var zd = s.curDay + 1
              while (zd < day) { cur = fold(cur, zd, 0L); zd += 1 }
              st = cur.copy(curDay = day, curCount = 1L)
            case s => st = s // late event for a closed day: dropped
          }
        }
        if (st != null) state.update(st)
        out.result().iterator
      }
  }

  /** One closed grid day's updated day-of-week slot: the dow census row
    * the batch `events_dow_seasonality` would hold for this dow over the
    * closed prefix (share/rank need all seven slots and are grid-side
    * derivations; the live face emits the slot's running census). */
  final case class DowUpdate(
      eventType: String, day: Long, dow: Long, dayN: Long,
      nDaysDow: Long, nEventsDow: Long, meanE2: Long)

  /** Streaming per-type dow state: the open day plus seven fixed slots. */
  final case class DowState(
      curDay: Long, curCount: Long, days: Seq[Long], events: Seq[Long])

  /** Live twin of the batch `events_dow_seasonality` census (sixteenth
    * face): as each grid day closes — quiet days included, exactly the
    * batch zero-fill — its day-of-week slot ((epochday+4) % 7) accrues
    * one day and the day's count, and the face emits that slot's running
    * (n_days, n_events, mean). State is FIXED width (7 slots + the open
    * day) per event type; unlike the seeded folds, every grid day counts
    * from the first (the batch census has no seed day). Late events for
    * closed days are dropped (batch repairs). */
  def dowProfile(spark: SparkSession, events: DataFrame): Dataset[DowUpdate] = {
    import spark.implicits._
    val DayUs = 86400L * 1000000
    events
      .selectExpr("event_type", "unix_micros(ts) AS ts_us")
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[DowState, DowUpdate](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) { (typ, rows, state) =>
        val out = Seq.newBuilder[DowUpdate]
        var st = state.getOption.orNull
        def close(s: DowState, day: Long, n: Long): DowState = {
          val dw = ((day + 4) % 7).toInt
          val d2 = s.days.updated(dw, s.days(dw) + 1)
          val e2 = s.events.updated(dw, s.events(dw) + n)
          out += DowUpdate(typ, day, dw.toLong, n,
            d2(dw), e2(dw), e2(dw) * 100 / d2(dw))
          s.copy(days = d2, events = e2)
        }
        rows.toSeq.map(_._2 / DayUs).sorted.foreach { day =>
          st match {
            case null =>
              st = DowState(day, 1L, Seq.fill(7)(0L), Seq.fill(7)(0L))
            case s if day == s.curDay =>
              st = s.copy(curCount = s.curCount + 1)
            case s if day > s.curDay =>
              var cur = close(s, s.curDay, s.curCount)
              var zd = s.curDay + 1
              while (zd < day) { cur = close(cur, zd, 0L); zd += 1 }
              st = cur.copy(curDay = day, curCount = 1L)
            case s => st = s // late event for a closed day: dropped
          }
        }
        if (st != null) state.update(st)
        out.result().iterator
      }
  }

  /** One observed behavior-log transition (prev type → next type). */
  final case class Transition(userId: Long, prevType: String, nextType: String, tsUs: Long)

  /** Live twin of the batch `events_markov_next` census: one string of
    * state per user (the last event type); each arriving event emits the
    * (prev → current) transition it completes. Downstream, a windowed
    * count of (prevType, nextType) IS the Markov census — transitions are
    * emitted exactly once, so any aggregation over this stream matches
    * the batch lead()-census over the same prefix.
    *
    * Input must carry `event_id` — the log position of the subscribe
    * contract (storage order). Rows within a micro-batch fold in
    * event_id order, which is exactly the order a position-ordered feed
    * delivers: ts ties (or non-monotone ts per user) and micro-batch
    * boundary placement can then never reorder the transition sequence
    * vs the batch lead()-over-event_id census. */
  def transitions(spark: SparkSession, events: DataFrame): Dataset[Transition] = {
    import spark.implicits._
    events
      .selectExpr("user_id", "event_type", "unix_micros(ts) AS ts_us", "event_id")
      .as[(Long, String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[String, Transition](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) { (uid, rows, state) =>
        var prev = state.getOption.orNull
        val out = Seq.newBuilder[Transition]
        rows.toSeq.sortBy(_._4).foreach { case (_, typ, ts, _) =>
          if (prev != null) out += Transition(uid, prev, typ, ts)
          prev = typ
        }
        if (prev != null) state.update(prev)
        out.result().iterator
      }
  }

  /** Running per-type inter-arrival snapshot (see [[interarrivalStats]]). */
  final case class GapUpdate(eventType: String, nGaps: Long, meanGapUs: Long,
      minGapUs: Long, maxGapUs: Long, dispersionPpm: Option[Long])

  /** Managed state for one event type's gap moments: the current day and
    * last timestamp (the fold cursor) plus exact integer moment sums —
    * min/max seeded at Long extremes, ms-quantized square sum for the
    * dispersion term (same quantization as the batch operator). */
  final case class GapState(day: Long, lastTs: Long, n: Long, sg: Long,
      mn: Long, mx: Long, sgMs: Long, sggMs: Long)

  /** Streaming twin of the batch `events_interarrival_stats`
    * (operators/Timeseries.scala): per event type, gaps between
    * consecutive events WITHIN one epoch day (cross-midnight gaps
    * excluded — the fold resets its cursor on a day change, exactly the
    * batch day-bucketed lag window), folded into eight longs of state per
    * type. Emits each type's running snapshot whenever a micro-batch adds
    * gaps; the final emission over an in-order feed equals the batch
    * query row for row (StreamingInterarrivalSpec pins it). Rows fold in
    * (ts, event_id) order — the batch lag window's exact sort — and an
    * out-of-order LATE event (ts behind the fold cursor, possible only
    * across micro-batch boundaries) is DROPPED rather than folded: a
    * backwards gap would poison the moment sums permanently, so this
    * face keeps the same late-event discipline as dailyAutocorr and
    * funnelStages, with the batch operator as the repair path. Moment
    * sums are overflow-LOUD (add/multiplyExact — the house discipline;
    * the batch twin rides DECIMAL(38,0), and a silent Long wrap here
    * would emit garbage dispersion after ~3.4 years of day-length gaps).
    * State is fixed-width per type; 100 TB of events still holds |types|
    * records. */
  def interarrivalStats(spark: SparkSession, events: DataFrame): Dataset[GapUpdate] = {
    import spark.implicits._
    val DayUs = 86400L * 1000000
    events
      .selectExpr("event_type", "unix_micros(ts) AS ts_us", "event_id")
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[GapState, GapUpdate](
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout) { (typ, rows, state) =>
        var st = state.getOption.getOrElse(
          GapState(Long.MinValue, Long.MinValue, 0L, 0L, Long.MaxValue, Long.MinValue, 0L, 0L))
        val n0 = st.n
        rows.toSeq.sortBy(r => (r._2, r._3)).foreach { case (_, ts, _) =>
          val day = ts / DayUs
          // late event (behind the cursor): drop, never fold a negative gap
          if (st.lastTs == Long.MinValue || ts >= st.lastTs) {
            if (st.day == day && st.lastTs != Long.MinValue) {
              val gap = ts - st.lastTs
              val gapMs = gap / 1000
              st = st.copy(n = st.n + 1, sg = Math.addExact(st.sg, gap),
                mn = math.min(st.mn, gap), mx = math.max(st.mx, gap),
                sgMs = Math.addExact(st.sgMs, gapMs),
                sggMs = Math.addExact(st.sggMs, Math.multiplyExact(gapMs, gapMs)))
            }
            st = st.copy(day = day, lastTs = ts)
          }
        }
        state.update(st)
        if (st.n == n0 || st.n == 0) Iterator.empty
        else {
          // dispersion in BigInt: n·Σx²·10⁶ exceeds a long well before the
          // moment sums themselves do (the batch side rides DECIMAL(38,0))
          val disp =
            if (st.sgMs == 0) None
            else Some(((BigInt(st.n) * st.sggMs * 1000000) /
              (BigInt(st.sgMs) * st.sgMs)).toLong)
          Iterator.single(GapUpdate(typ, st.n, st.sg / st.n, st.mn, st.mx, disp))
        }
      }
  }

  /** A funnel stage completion on the live stream. */
  final case class FunnelStage(userId: Long, stage: String, tsUs: Long)

  /** Per-user funnel chain state: first-view / first-qualifying-click /
    * first-qualifying-purchase times (Long.MaxValue = not reached). */
  final case class FunnelChain(mv: Long, mc: Long, mp: Long)

  /** Streaming twin of the batch `events_funnel_windowed`: view →
    * click within 24 h of the first view → purchase within 24 h of that
    * click, evaluated live with three longs of state per user. Input must
    * carry `event_id` (log position); rows within a micro-batch fold in
    * that order — the subscribe contract's storage order — so ts ties and
    * micro-batch boundaries never reorder the chain. Parity contract:
    * per-user event-time order in the feed; an out-of-order EARLIER view
    * is dropped (anchors fire at most once and never move — re-anchoring
    * would silently invalidate an already-emitted click_24h
    * qualification), same late-event discipline as dailyAutocorr, with
    * the batch operator as the repair path. */
  def funnelStages(spark: SparkSession, events: DataFrame): Dataset[FunnelStage] = {
    import spark.implicits._
    val DayUs = 86400L * 1000000
    val U = Long.MaxValue
    events
      .selectExpr("user_id", "event_type", "unix_micros(ts) AS ts_us", "event_id")
      .as[(Long, String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelChain, FunnelStage](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) { (uid, rows, state) =>
        var st = state.getOption.getOrElse(FunnelChain(U, U, U))
        val out = Seq.newBuilder[FunnelStage]
        rows.toSeq.sortBy(_._4).foreach { case (_, typ, ts, _) =>
          typ match {
            case "view" if st.mv == U =>
              st = st.copy(mv = ts); out += FunnelStage(uid, "view", ts)
            case "click" if st.mv != U && ts > st.mv && ts <= st.mv + DayUs && ts < st.mc =>
              st = st.copy(mc = ts); out += FunnelStage(uid, "click_24h", ts)
            case "purchase" if st.mc != U && ts > st.mc && ts <= st.mc + DayUs && ts < st.mp =>
              st = st.copy(mp = ts); out += FunnelStage(uid, "purchase_24h", ts)
            case _ => ()
          }
        }
        state.update(st)
        out.result().iterator
      }
  }

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

  /** One slot of a per-language streaming reservoir (seq = that
    * language's update counter; downstream keeps the max-seq emission). */
  final case class ReservoirSlot(
      lang: String, seq: Long, rank: Long, docId: Long, coin: Long, nTokens: Long)

  // parallel Seq[Long]s rather than Seq[tuple]: nested product element
  // types break the state encoder's codegen
  final case class ResState(
      seq: Long, coins: Seq[Long], ids: Seq[Long], toks: Seq[Long]) {
    def slots: Seq[(Long, Long, Long)] =
      coins.lazyZip(ids).lazyZip(toks).map((c, i, t) => (c, i, t))
  }

  /** Streaming twin of the batch `sample_reservoir`: a DETERMINISTIC
    * k-slot reservoir per language — keep the k documents with the
    * smallest (scrambled-hash coin, doc_id). Because the keep rule is a
    * pure order statistic of a deterministic coin (not RNG), the stream
    * state after any prefix equals the batch operator over that prefix:
    * arrival order, micro-batch boundaries, and restarts cannot change
    * it, and the whole reservoir re-emits (with a bumped per-language
    * seq) only when a batch actually changes it. State is k slots per
    * language — constant width, sharded by language (stratum) across
    * executors. Input must carry `doc_id`, `lang`, `n_tokens`; the coin
    * is computed here with the shared CrossHash kernel so parity with
    * the batch query is by construction. */
  /** One per-language HLL snapshot emission (seq = that language's
    * change counter; downstream keeps the max-seq emission). `regsFnv`
    * is an FNV-1a fold over the 256 register maxima so a parity spec can
    * pin the full register STATE, not just the scalar estimate. */
  final case class HllUpdate(
      lang: String, seq: Long, present: Long, estE4: Long, regsFnv: Long)

  final case class HllState(seq: Long, regs: Seq[Long])

  /** Streaming twin of the batch `text_hll_distinct`: per-language HLL
    * registers as managed state — constant width (256 longs per
    * language), sharded by language across executors, never growing with
    * the stream. Input is any streaming (lang, h) relation; the
    * (register, rank) projection is the SAME `Sketches.hllJR` kernel the
    * batch query aggregates, and max is commutative/idempotent, so state
    * after any prefix equals the batch registers over that prefix under
    * any arrival order, micro-batch split, or at-least-once re-delivery.
    * The estimate reuses the batch float discipline — each 2^-m term is
    * an exact power of two and the 256-term sum is exact in double, so
    * the emitted estE4 equals the batch hll_est_e4 bit-for-bit. A batch
    * that raises no register emits nothing (seq stays put). */
  def hllDistinct(spark: SparkSession, langHashes: DataFrame): Dataset[HllUpdate] = {
    import spark.implicits._
    val m = graft.operators.Sketches.HllM
    val alphaM2 = graft.operators.Sketches.HllAlphaM2
    graft.operators.Sketches.hllJR(langHashes)
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[HllState, HllUpdate](
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout) { (lang, rows, state) =>
        val prev = state.getOption.getOrElse(HllState(0L, Seq.fill(m)(0L)))
        val regs = prev.regs.toArray
        var changed = false
        rows.foreach { r =>
          val j = r._2.toInt
          if (r._3 > regs(j)) { regs(j) = r._3; changed = true }
        }
        if (!changed) Iterator.empty
        else {
          val next = HllState(prev.seq + 1, regs.toSeq)
          state.update(next)
          // registers hold m ≤ 23 so 1.0/(1L<<m) is the exact 2^-m the
          // batch termCase emits; m = 0 (absent) contributes exactly 1.0
          val sAll = regs.foldLeft(0.0)((a, mm) => a + 1.0 / (1L << mm))
          val est = math.floor((alphaM2 / sAll) * 10000.0).toLong
          val fnv = regs.foldLeft(-3750763034362895579L)(
            (a, mm) => (a ^ mm) * 1099511628211L)
          Iterator.single(
            HllUpdate(lang, next.seq, regs.count(_ > 0).toLong, est, fnv))
        }
      }
  }

  def reservoirSample(spark: SparkSession, docs: DataFrame, k: Int): Dataset[ReservoirSlot] = {
    import spark.implicits._
    graft.functions.TextHashFunctions.register(spark)
    docs
      .selectExpr("doc_id", "lang", "n_tokens",
        s"${graft.functions.CrossHash.coinSpark("CAST(doc_id AS STRING)")} AS coin")
      .as[(Long, String, Long, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[ResState, ReservoirSlot](
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout) { (lang, rows, state) =>
        val prev = state.getOption.getOrElse(ResState(0L, Seq.empty, Seq.empty, Seq.empty))
        val merged = (prev.slots ++ rows.map(r => (r._4, r._1, r._3)))
          .distinct.sortBy(s => (s._1, s._2)).take(k)
        if (merged == prev.slots) Iterator.empty
        else {
          val next = ResState(prev.seq + 1,
            merged.map(_._1), merged.map(_._2), merged.map(_._3))
          state.update(next)
          merged.iterator.zipWithIndex.map { case ((coin, docId, nTok), i) =>
            ReservoirSlot(lang, next.seq, i + 1L, docId, coin, nTok)
          }
        }
      }
  }

  final case class QuantUpdate(eventType: String, seq: Long, nEvents: Long,
      p50: Long, p90: Long, p99: Long, maxBucket: Long)

  final case class QHistState(seq: Long, counts: Seq[Long])

  /** Bucket-domain width for [[valueQuantiles]] (events.value floors into
    * [0, 511]; anything above clamps into the top bucket). */
  val QuantBuckets = 512

  /** Streaming value quantiles from FIXED histogram state: per event type,
    * a 512-bucket census of floor-bucketed `value` — the state is the
    * WHOLE distribution at bucket granularity, so the emitted p50/p90/p99
    * are EXACT over the bucketed domain (not a sketch estimate), while
    * state stays 512 longs per type forever. The rank rule is the
    * lineitem_delay_percentiles one (smallest bucket with cum·100 ≥ n·q),
    * so the streaming face and the batch bounded-domain percentile
    * operators share percentile semantics. Counts are additive (same
    * at-least-once caveat as the CMS face); a batch with no arrivals for
    * a type emits nothing. */
  def valueQuantiles(spark: SparkSession, events: DataFrame): Dataset[QuantUpdate] = {
    import spark.implicits._
    events.selectExpr("event_type",
        s"CAST(least(greatest(floor(value), 0.0), ${QuantBuckets - 1}.0) AS BIGINT) AS bucket")
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[QHistState, QuantUpdate](
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout) { (tpe, rows, state) =>
        val prev = state.getOption.getOrElse(QHistState(0L, Seq.fill(QuantBuckets)(0L)))
        val c = prev.counts.toArray
        var changed = false
        rows.foreach { r => c(r._2.toInt) += 1; changed = true }
        if (!changed) Iterator.empty
        else {
          val next = QHistState(prev.seq + 1, c.toSeq)
          state.update(next)
          val n = c.sum
          def pct(q: Long): Long = {
            var cum = 0L
            var i = 0
            while (i < c.length) {
              cum += c(i)
              if (cum * 100 >= n * q) return i.toLong
              i += 1
            }
            (c.length - 1).toLong
          }
          val maxB = c.lastIndexWhere(_ > 0).toLong
          Iterator.single(QuantUpdate(tpe, next.seq, n, pct(50), pct(90), pct(99), maxB))
        }
      }
  }

  final case class TopKSlot(
      lang: String, seq: Long, rank: Long, h: Long, est: Long, maxErr: Long)

  final case class SsEntry(h: Long, n: Long, err: Long)
  final case class SsState(seq: Long, entries: Seq[SsEntry])

  /** Streaming space-saving heavy hitters (Metwally et al.): per-language
    * top-k token summary as managed state — EXACTLY k counters per
    * language regardless of vocabulary or stream length (the state shape
    * CMS can't give: CMS answers "how often is X?", this answers "which X
    * are hot?" with per-item error bars). Arrival of an untracked item
    * evicts the minimum-count entry and inherits its count as the new
    * entry's error bound, so every estimate carries its own certificate:
    * true ≤ est and est − maxErr ≤ true, and any item with true frequency
    * > N/k is guaranteed present (both pinned against exact counts in
    * StreamingTopKSpec). Rows fold in log-position order within each
    * micro-batch (the transitions/funnel discipline), so a batch-boundary
    * shift can't reorder the fold; eviction ties break on (count, hash) —
    * deterministic for any arrival history. Each state change emits the
    * full k-row summary under a bumped seq; a batch that changes nothing
    * emits nothing. */
  def spaceSavingTopK(spark: SparkSession, langHashes: DataFrame,
      k: Int): Dataset[TopKSlot] = {
    require(k > 0, s"spaceSavingTopK needs k > 0 counters, got $k")
    import spark.implicits._
    langHashes.selectExpr("lang", "h", "pos").as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SsState, TopKSlot](
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout) { (lang, rows, state) =>
        val prev = state.getOption.getOrElse(SsState(0L, Seq.empty))
        var m = prev.entries.iterator.map(e => e.h -> ((e.n, e.err))).toMap
        rows.toSeq.sortBy(_._3).foreach { case (_, h, _) =>
          m.get(h) match {
            case Some((n, err)) => m = m.updated(h, (n + 1L, err))
            case None if m.size < k => m = m.updated(h, (1L, 0L))
            case None =>
              val (eh, (en, _)) = m.minBy { case (hh, (nn, _)) => (nn, hh) }
              m = (m - eh).updated(h, (en + 1L, en))
          }
        }
        val entries = m.iterator.map { case (h, (n, err)) => SsEntry(h, n, err) }
          .toSeq.sortBy(e => (-e.n, e.h))
        if (entries == prev.entries) Iterator.empty
        else {
          val next = SsState(prev.seq + 1, entries)
          state.update(next)
          entries.iterator.zipWithIndex.map { case (e, i) =>
            TopKSlot(lang, next.seq, i + 1L, e.h, e.n, e.err)
          }
        }
      }
  }

  final case class LuhnUpdate(
      source: String, seq: Long, n_docs: Long, docs_with_cand: Long,
      n_candidates: Long, n_luhn_valid: Long, docs_with_valid: Long)

  final case class LuhnState(
      seq: Long, docs: Long, docsWithCand: Long, cands: Long,
      valid: Long, docsWithValid: Long)

  /** Streaming PII census (the pii_luhn_stats twin): per-source running
    * counters of Luhn-candidate digit runs and checksum-valid hits. The
    * extraction + checksum fold runs STATELESSLY on each arriving doc via
    * the exact batch expressions (Pii.luhnCountsSelect — one shared
    * definition is the parity guarantee); the stateful half is five
    * additive counters per source, so state is |sources|-bounded forever
    * and arrival order is irrelevant. At-least-once redelivery inflates
    * counts (the CMS-face caveat); exactly-once sinks get the seq column
    * to dedup on. A batch with no docs for a source emits nothing. */
  def piiLuhnCensus(spark: SparkSession, docs: DataFrame): Dataset[LuhnUpdate] = {
    import spark.implicits._
    docs.selectExpr(graft.operators.Pii.luhnCountsSelect: _*)
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[LuhnState, LuhnUpdate](
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout) { (src, rows, state) =>
        val prev = state.getOption.getOrElse(LuhnState(0L, 0L, 0L, 0L, 0L, 0L))
        var d = prev.docs; var dc = prev.docsWithCand; var c = prev.cands
        var v = prev.valid; var dv = prev.docsWithValid
        var any = false
        rows.foreach { r =>
          d += 1; c += r._2; v += r._3
          if (r._2 > 0) dc += 1
          if (r._3 > 0) dv += 1
          any = true
        }
        if (!any) Iterator.empty
        else {
          val next = LuhnState(prev.seq + 1, d, dc, c, v, dv)
          state.update(next)
          Iterator.single(LuhnUpdate(src, next.seq, d, dc, c, v, dv))
        }
      }
  }

  /** One closed post-warm-up day's CUSUM row — identical columns to the
    * batch `events_cusum_alarms` row for that (type, day). */
  final case class CusumUpdate(
      eventType: String, day: Long, n: Long,
      mu0E2: Long, sPlusE2: Long, alarm: Long)

  /** Streaming CUSUM state: warm-up tally (days seen, event sum) until 14
    * grid days close, then the frozen reference and the running S⁺ — all
    * constant width. `curDay` = the open grid day. */
  final case class CusumState(
      curDay: Long, curCount: Long,
      warmDays: Long, warmSum: Long, mu0E2: Long, sPlusE2: Long)

  /** Live twin of the batch `events_cusum_alarms` chart (twenty-second
    * face): each closing grid day — quiet days zero-filled, exactly the
    * batch grid — either feeds the 14-day warm-up tally or advances
    * S⁺ = max(0, S⁺ + (n·100 − μ₀ − μ₀/10)) and emits the day's chart row
    * with its 5μ₀ alarm flag. The recursion is causal, so unlike the
    * retrospective argmax face this needs no reprocessing: state is one
    * six-long cursor per type, forever. Late events for closed days are
    * dropped (batch repairs). */
  def cusumAlarms(spark: SparkSession, events: DataFrame): Dataset[CusumUpdate] = {
    import spark.implicits._
    val DayUs = 86400L * 1000000
    events
      .selectExpr("event_type", "unix_micros(ts) AS ts_us")
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[CusumState, CusumUpdate](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) { (typ, rows, state) =>
        val out = Seq.newBuilder[CusumUpdate]
        var st = state.getOption.orNull
        def close(s: CusumState, day: Long, n: Long): CusumState = {
          if (s.warmDays < 14) {
            val wd = s.warmDays + 1; val ws = s.warmSum + n
            if (wd == 14) s.copy(warmDays = wd, warmSum = ws, mu0E2 = ws * 100 / 14)
            else s.copy(warmDays = wd, warmSum = ws)
          } else {
            val dev = n * 100 - s.mu0E2 - s.mu0E2 / 10
            val sp = math.max(0L, s.sPlusE2 + dev)
            out += CusumUpdate(typ, day, n, s.mu0E2, sp,
              if (sp >= 5 * s.mu0E2) 1L else 0L)
            s.copy(sPlusE2 = sp)
          }
        }
        rows.toSeq.map(_._2 / DayUs).sorted.foreach { day =>
          st match {
            case null => st = CusumState(day, 1L, 0L, 0L, 0L, 0L)
            case s if day == s.curDay => st = s.copy(curCount = s.curCount + 1)
            case s if day > s.curDay =>
              var cur = close(s, s.curDay, s.curCount)
              var zd = s.curDay + 1
              while (zd < day) { cur = close(cur, zd, 0L); zd += 1 }
              st = cur.copy(curDay = day, curCount = 1L)
            case s => st = s // late event for a closed day: dropped
          }
        }
        if (st != null) state.update(st)
        out.result().iterator
      }
  }

  /** One CLOSED week's census row for a type — identical columns to the
    * batch `events_type_weekly_delta` row for that (week, type). */
  final case class WeeklyDelta(
      eventType: String, week: Long, n: Long,
      prevN: Option[Long], deltaPpm: Option[Long])

  /** Streaming per-type week cursor: the open week's running count plus
    * the last CLOSED week's (week, count) pair — constant width. `prevWeek`
    * = Long.MinValue until a first week closes (-1 would collide with the
    * adjacency check when the first observed week is epoch week 0). */
  final case class WeeklyState(
      curWeek: Long, curCount: Long, prevWeek: Long, prevCount: Long)

  /** Live twin of the batch `events_type_weekly_delta` census
    * (twenty-first face): as each week (epoch-day div 7) closes, emit its
    * count and the delta vs the prior ADJACENT week — a gap week yields
    * NULLs exactly like the batch's `prev_week = week - 1` guard, because
    * observed-weeks-only semantics mean a quiet week never materializes a
    * zero row in either engine. State is one (open week, count, last
    * closed week, count) quadruple per event type — |types|-bounded
    * forever. delta_ppm is the same truncating integer division the batch
    * runs (`div` on Spark, `//` on DuckDB — both truncate toward zero, so
    * negative deltas agree). Late events for closed weeks are dropped
    * (batch repairs); the open week emits nothing until a later-week
    * event closes it. */
  def typeWeeklyDelta(spark: SparkSession, events: DataFrame): Dataset[WeeklyDelta] = {
    import spark.implicits._
    val WeekUs = 7L * 86400 * 1000000
    events
      .selectExpr("event_type", "unix_micros(ts) AS ts_us")
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[WeeklyState, WeeklyDelta](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) { (typ, rows, state) =>
        val out = Seq.newBuilder[WeeklyDelta]
        var st = state.getOption.orNull
        def close(s: WeeklyState): WeeklyState = {
          val adj = s.prevWeek == s.curWeek - 1
          val prevN = if (adj) Some(s.prevCount) else None
          val delta =
            if (adj && s.prevCount != 0)
              Some((s.curCount - s.prevCount) * 1000000L / s.prevCount)
            else None
          out += WeeklyDelta(typ, s.curWeek, s.curCount, prevN, delta)
          WeeklyState(s.curWeek, 0L, s.curWeek, s.curCount)
        }
        rows.toSeq.map(_._2 / WeekUs).sorted.foreach { week =>
          st match {
            case null => st = WeeklyState(week, 1L, Long.MinValue, 0L)
            case s if week == s.curWeek => st = s.copy(curCount = s.curCount + 1)
            case s if week > s.curWeek =>
              st = close(s).copy(curWeek = week, curCount = 1L)
            case s => st = s // late event for a closed week: dropped
          }
        }
        if (st != null) state.update(st)
        out.result().iterator
      }
  }

  /** One digit row of the live Benford census — identical columns to the
    * batch `events_value_benford` row for that (type, digit). */
  final case class BenfordUpdate(
      eventType: String, seq: Long, digit: Long, n: Long,
      obsPpm: Long, expPpm: Long, devPpm: Long)

  /** Streaming Benford state: nine first-digit counters per event type —
    * constant width forever, the smallest state shape in the suite. */
  final case class BenfordState(seq: Long, counts: Seq[Long])

  /** Live twin of the batch `events_value_benford` audit (twenty-third
    * face): digit extraction runs STATELESSLY per arriving event via the
    * exact batch expressions (DataQuality.benfordEventSelect — the shared
    * definition is the parity guarantee); the stateful half is 9 additive
    * counters per type, so arrival order is irrelevant and every batch
    * re-emits the full current census (obs/exp/dev in exact ppm) for the
    * digits seen so far. The fraud screen this feeds wants the CURRENT
    * distribution, not a delta — hence Update-mode full-census emission. */
  def benfordCensus(spark: SparkSession, events: DataFrame): Dataset[BenfordUpdate] = {
    import spark.implicits._
    val expPpm = graft.operators.DataQuality.BenfordPpm.toMap
    events
      .selectExpr(graft.operators.DataQuality.benfordEventSelect: _*)
      .filter("digit BETWEEN 1 AND 9")
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[BenfordState, BenfordUpdate](
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout) { (typ, rows, state) =>
        val prev = state.getOption.getOrElse(BenfordState(0L, Seq.fill(9)(0L)))
        val counts = prev.counts.toArray
        var any = false
        rows.foreach { r => counts((r._2 - 1).toInt) += 1; any = true }
        if (!any) Iterator.empty
        else {
          val next = BenfordState(prev.seq + 1, counts.toIndexedSeq)
          state.update(next)
          val total = counts.sum
          (1 to 9).iterator.filter(d => counts(d - 1) > 0).map { d =>
            val n = counts(d - 1)
            val obs = n * 1000000L / total
            val e = expPpm(d)
            BenfordUpdate(typ, next.seq, d.toLong, n, obs, e, obs - e)
          }
        }
      }
  }

  /** One shard's cumulative first-seen census — identical columns to the
    * batch `events_bloom_first_seen` row for that shard, plus the set-bit
    * count the state-bounds spec asserts against SegBits. */
  final case class BloomFsUpdate(
      shard: Long, seq: Long, nEvents: Long, nFirst: Long,
      nMaybeDup: Long, nSetBits: Long)

  /** Streaming Bloom segment: SegBits bits as SegBits/64 longs plus two
    * counters — constant width per shard forever (the filter saturates,
    * it never grows). */
  final case class BloomFsState(
      seq: Long, nEvents: Long, nMaybeDup: Long, words: Seq[Long])

  /** One bucket's live census row — identical columns to the batch
    * `ann_lsh_buckets` row for that bucket. */
  final case class LshBucketUpdate(
      bucket: Long, seq: Long, nVectors: Long, minVecId: Long,
      maxVecId: Long, nLabels: Long)

  /** Per-bucket census cursor: counters + the distinct label set (bounded
    * by the label alphabet) — constant width per bucket. */
  final case class LshBucketState(
      seq: Long, n: Long, minId: Long, maxId: Long, labels: Seq[Int])

  /** Streaming vector-index ingestion census (twenty-fifth face): as
    * embeddings arrive, each is routed to its LSH sign-bucket (the EXACT
    * batch hyperplane expression — Similarity.lshBucketSparkExpr at the
    * pinned 8-plane default — evaluated statelessly before the fold) and
    * the per-bucket occupancy census (count, id range, distinct labels)
    * updates live. This is the freshness/balance gauge an online ANN
    * index ships: a bucket ballooning past its design population is the
    * signal to re-derive the plane schedule (the batch side's n-adaptive
    * np). All four statistics are commutative merges, so arrival order
    * and batch splits are irrelevant; the final census equals the batch
    * `ann_lsh_buckets` rows wherever the corpus fits the 8-plane default
    * (every test SF — the adaptive schedule only departs past n = 25 600).
    * State: one constant-width row per OCCUPIED bucket (≤ 2^8). */
  def lshBucketCensus(spark: SparkSession, embeddings: DataFrame): Dataset[LshBucketUpdate] = {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    val bexpr = graft.operators.Similarity.lshBucketSparkExpr("embedding", 8)
    embeddings
      .selectExpr("vec_id", "CAST(label AS INT) AS label", s"CAST($bexpr AS BIGINT) AS bucket")
      .as[(Long, Int, Long)]
      .groupByKey(_._3)
      .flatMapGroupsWithState[LshBucketState, LshBucketUpdate](
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout) { (bucket, rows, state) =>
        val prev = state.getOption.getOrElse(
          LshBucketState(0L, 0L, Long.MaxValue, Long.MinValue, Seq.empty))
        var n = prev.n; var mn = prev.minId; var mx = prev.maxId
        val labels = scala.collection.mutable.SortedSet[Int](prev.labels: _*)
        var any = false
        rows.foreach { case (id, lab, _) =>
          any = true; n += 1
          if (id < mn) mn = id
          if (id > mx) mx = id
          labels += lab
        }
        if (!any) Iterator.empty
        else {
          val next = LshBucketState(prev.seq + 1, n, mn, mx, labels.toSeq)
          state.update(next)
          Iterator.single(LshBucketUpdate(
            bucket, next.seq, n, mn, mx, labels.size.toLong))
        }
      }
  }

  /** Live first-seen / maybe-duplicate detector through a sharded Bloom
    * filter (twenty-fourth face): each event checks its k pinned bit
    * positions in its shard's segment BEFORE setting them — all set ⇒
    * maybe-seen (Bloom has no false negatives, so "first" is certain;
    * "dup" is probabilistic with the FPR text_bloom_fpr_eval measures).
    * Shard, positions, and the (ts µs, event_id) decision order are the
    * EXACT batch definitions (Sketches.FsPerms/ShardPerm/SegBits and the
    * 2^24-packed okey), so the cumulative census after any prefix equals
    * the batch `events_bloom_first_seen` over that prefix when events
    * arrive in order; within a micro-batch the group sorts by the same
    * okey, so parity holds under any batch SPLIT. State: SegBits bits +
    * 3 longs per shard — FsShards rows forever, the per-key dedup state a
    * naive exact detector would grow linearly. */
  def bloomFirstSeen(spark: SparkSession, events: DataFrame): Dataset[BloomFsUpdate] = {
    import spark.implicits._
    // geometry copied into locals: the closures below must not capture the
    // (non-serializable) Sketches module object
    val segBits = graft.operators.Sketches.SegBits
    val fsShards = graft.operators.Sketches.FsShards
    val fsPerms = graft.operators.Sketches.FsPerms
    val shardPerm = graft.operators.Sketches.ShardPerm
    val p61 = BigInt(2305843009213693951L)
    val nWords = (segBits / 64L).toInt
    // squared affine image mod p — the exact batch mixing (the square is
    // load-bearing; see Sketches.bloomPosArray)
    def mix(user: Long, perm: (Long, Long)): BigInt = {
      val t = (BigInt(user) * perm._1 + perm._2) mod p61
      (t * t) mod p61
    }
    def posOf(user: Long, perm: (Long, Long)): Int =
      (mix(user, perm) % segBits).toInt
    def shardOf(user: Long): Long =
      (mix(user, shardPerm) % fsShards).toLong
    events
      .selectExpr("user_id", "unix_micros(ts) AS ts_us", "event_id")
      .as[(Long, Long, Long)]
      .groupByKey(r => shardOf(r._1))
      .flatMapGroupsWithState[BloomFsState, BloomFsUpdate](
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout) { (shard, rows, state) =>
        val prev = state.getOption.getOrElse(
          BloomFsState(0L, 0L, 0L, Seq.fill(nWords)(0L)))
        val words = prev.words.toArray
        var nEvents = prev.nEvents
        var nDup = prev.nMaybeDup
        var any = false
        // batch-okey order: ts_us·2^24 + event_id, exact in BigInt
        rows.toSeq.sortBy(r => BigInt(r._2) * 16777216 + r._3).foreach { r =>
          any = true
          nEvents += 1
          val ps = fsPerms.map(p => posOf(r._1, p))
          if (ps.forall(p => (words(p >> 6) & (1L << (p & 63))) != 0L)) nDup += 1
          ps.foreach(p => words(p >> 6) |= (1L << (p & 63)))
        }
        if (!any) Iterator.empty
        else {
          val next = BloomFsState(prev.seq + 1, nEvents, nDup, words.toIndexedSeq)
          state.update(next)
          Iterator.single(BloomFsUpdate(shard, next.seq, nEvents,
            nEvents - nDup, nDup,
            words.map(java.lang.Long.bitCount(_).toLong).sum))
        }
      }
  }

  /** One panel probe's live similarity moments over all arrivals. */
  final case class DriftUpdate(
      probeId: Long, seq: Long, n: Long, meanCosPpm: Long,
      meanAbsCosPpm: Long, minCosPpm: Long, maxCosPpm: Long)

  /** Per-probe moment cursor: exact integer sums of ppm cosines. Σcos
    * stays inside int64 to ~9e12 arrivals (1e6 ppm ceiling per row). */
  final case class DriftState(
      seq: Long, n: Long, sc: Long, sa: Long, mn: Long, mx: Long)

  /** Live embedding-drift monitor (twenty-eighth face): every arriving
    * vector is scored against a pinned reference panel and each probe
    * keeps running cosine moments (n, mean, mean-|·|, min, max in exact
    * ppm) — the online rendering of `embedding_isotropy`'s health gauge:
    * when an upstream embedding model changes, the incoming-similarity
    * distribution shifts and the monitor shows it within a micro-batch,
    * long before any batch re-index runs. The scoring is stateless (the
    * knnMaintenance scan shape, same strict index-order IEEE cosine);
    * the fold is commutative integer sums, so arrival order and batch
    * splits are irrelevant. State: one constant-width row per panel
    * probe forever. */
  def embeddingDriftMonitor(spark: SparkSession, vectors: DataFrame,
      panel: Seq[(Long, Array[Double])]): Dataset[DriftUpdate] = {
    import spark.implicits._
    vectors
      .selectExpr("vec_id", "embedding")
      .as[(Long, Seq[Float])]
      .flatMap { case (_, v) =>
        // a zero-norm vector has no direction: cosine is 0/0 = NaN and
        // floor(NaN).toLong would silently fold a fabricated 0 into the
        // drift moments — reject the row instead
        var nv = 0.0; var j = 0
        while (j < v.length) { val x = v(j).toDouble; nv += x * x; j += 1 }
        if (nv == 0.0) Nil
        else panel.map { case (pid, pv) =>
          var dot = 0.0; var np = 0.0; var i = 0
          while (i < pv.length) {
            val x = v(i).toDouble
            dot += pv(i) * x; np += pv(i) * pv(i); i += 1
          }
          (pid,
            math.floor(dot / (math.sqrt(np) * math.sqrt(nv)) * 1000000).toLong)
        }
      }
      .groupByKey(_._1)
      .flatMapGroupsWithState[DriftState, DriftUpdate](
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout) { (pid, rows, state) =>
        val prev = state.getOption.getOrElse(
          DriftState(0L, 0L, 0L, 0L, Long.MaxValue, Long.MinValue))
        var n = prev.n; var sc = prev.sc; var sa = prev.sa
        var mn = prev.mn; var mx = prev.mx
        var any = false
        rows.foreach { case (_, c) =>
          any = true; n += 1; sc += c; sa += math.abs(c)
          if (c < mn) mn = c
          if (c > mx) mx = c
        }
        if (!any) Iterator.empty
        else {
          val next = DriftState(prev.seq + 1, n, sc, sa, mn, mx)
          state.update(next)
          Iterator.single(DriftUpdate(pid, next.seq, n, sc / n, sa / n, mn, mx))
        }
      }
  }

  /** One nation-pair's live flow row — batch graph_trade_reciprocity's
    * flow census maintained under ingestion. */
  final case class FlowUpdate(
      srcNation: String, dstNation: String, seq: Long, nRows: Long,
      flowE8: String)

  /** Per-pair cursor: row count + exact e8 flow sum (BigInt-backed as a
    * digit string — the corpus-sized-sum emission policy applies to STATE
    * too: an int64 running sum overflows at ~1e10 rows of 1e9-cent
    * flows). */
  final case class FlowState(seq: Long, n: Long, flowE8: String)

  /** Live trade-flow census (twenty-seventh face): revenue flows between
    * (customer-nation → supplier-nation) pairs accumulate as enriched
    * lineitems arrive — the streaming half of `graph_trade_reciprocity`
    * (its flow grid, maintained online; reciprocity is a grid-sized
    * read on top). The input is the dims-enriched stream (at scale the
    * nation attach is a broadcast map upstream); the fold is a
    * commutative exact sum, so arrival order and batch splits are
    * irrelevant. State: one constant-width row per nation PAIR —
    * ≤ nations² (625) rows forever. */
  def tradeFlowCensus(spark: SparkSession, flows: DataFrame): Dataset[FlowUpdate] = {
    import spark.implicits._
    flows
      .selectExpr("src_nation", "dst_nation", "CAST(rev_e8 AS BIGINT) AS rev_e8")
      .as[(String, String, Long)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[FlowState, FlowUpdate](
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout) { case ((src, dst), rows, state) =>
        val prev = state.getOption.getOrElse(FlowState(0L, 0L, "0"))
        var n = prev.n
        var sum = BigInt(prev.flowE8)
        var any = false
        rows.foreach { r => any = true; n += 1; sum += r._3 }
        if (!any) Iterator.empty
        else {
          val next = FlowState(prev.seq + 1, n, sum.toString)
          state.update(next)
          Iterator.single(FlowUpdate(src, dst, next.seq, n, next.flowE8))
        }
      }
  }

  /** One probe's live neighborhood — ids and cosines (ppm) in rank order. */
  final case class KnnUpdate(
      probeId: Long, seq: Long, nSeen: Long,
      neighborIds: Seq[Long], neighborCos: Seq[Long])

  /** Per-probe cursor: arrivals seen + the current top-k, kept sorted by
    * (cos desc, id asc) — k entries, constant width. */
  final case class KnnState(seq: Long, nSeen: Long, ids: Seq[Long], cos: Seq[Long])

  /** Live k-NN neighborhood maintenance (twenty-sixth face): a pinned
    * probe set watches a stream of arriving vectors, and each probe's
    * top-k cosine neighborhood updates as the index ingests — the online
    * half of `embedding_bitext_mining`'s forward pass (its Σ_k fwd margin
    * denominator is exactly `neighborCos.sum` here) and of any
    * streaming-recall ANN dashboard. The scan side is stateless (each
    * arrival scores against the ≤ |probes| broadcast closure — the batch
    * bruteforce shape); the fold is a commutative top-k set-merge under
    * the TOTAL order (cos desc, id asc), so arrival order and batch
    * splits cannot change the final neighborhood. Cosines ride the same
    * strict index-order IEEE accumulation as the vec_dot kernel, so the
    * final state is bit-equal to the batch ranking. State: one k-entry
    * row per probe — |probes| rows forever, independent of stream
    * length. */
  def knnMaintenance(spark: SparkSession, vectors: DataFrame,
      probes: Seq[(Long, Array[Double])], k: Int): Dataset[KnnUpdate] = {
    import spark.implicits._
    vectors
      .selectExpr("vec_id", "embedding")
      .as[(Long, Seq[Float])]
      .flatMap { case (id, v) =>
        // zero-norm guard: cosine undefined (0/0) — skip the vector rather
        // than let floor(NaN).toLong plant a spurious cos_ppm=0 neighbor
        var nv = 0.0; var j = 0
        while (j < v.length) { val x = v(j).toDouble; nv += x * x; j += 1 }
        if (nv == 0.0) Nil
        else probes.map { case (pid, pv) =>
          var dot = 0.0; var np = 0.0; var i = 0
          while (i < pv.length) {
            val x = v(i).toDouble
            dot += pv(i) * x; np += pv(i) * pv(i); i += 1
          }
          (pid, id,
            math.floor(dot / (math.sqrt(np) * math.sqrt(nv)) * 1000000).toLong)
        }
      }
      .groupByKey(_._1)
      .flatMapGroupsWithState[KnnState, KnnUpdate](
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout) { (pid, rows, state) =>
        val prev = state.getOption.getOrElse(KnnState(0L, 0L, Seq.empty, Seq.empty))
        var merged = prev.ids.zip(prev.cos).map { case (i, c) => (c, i) }
        var n = prev.nSeen; var any = false
        rows.foreach { case (_, id, c) => any = true; n += 1; merged :+= ((c, id)) }
        if (!any) Iterator.empty
        else {
          // dedup by vec_id keeping the BEST (cos desc) entry — a re-appended
          // id with a changed embedding collapses to one neighborhood slot
          // (best-cos, not latest, keeps the fold commutative: arrival order
          // and batch splits still cannot change the final state)
          val top = merged.groupBy(_._2).valuesIterator.map(_.maxBy(_._1)).toSeq
            .sortBy { case (c, i) => (-c, i) }.take(k)
          val next = KnnState(prev.seq + 1, n, top.map(_._2), top.map(_._1))
          state.update(next)
          Iterator.single(KnnUpdate(pid, next.seq, n, next.ids, next.cos))
        }
      }
  }

  /** One priority's live rank-sum row — batch `stats_mann_whitney` online
    * (u2 as a digit string: corpus-sized rank-sums ride BigInt, the
    * emission policy applied to streaming output). */
  final case class AucUpdate(priority: String, seq: Long, n_g: Long,
      n_rest: Long, u2: String, auc_e6: Long)

  /** One (priority, bucket) cell of the grid state. */
  final case class AucCell(priority: String, bucket: Long, n: Long)

  final case class AucGridState(seq: Long, cells: Seq[AucCell])

  /** Streaming Mann-Whitney / probability-of-superiority monitor — batch
    * `stats_mann_whitney` online: arrivals are (priority, value-bucket,
    * weight) deltas folded into ONE bounded grid (priorities × value
    * buckets — constant width regardless of stream length), and every
    * update re-derives each priority's doubled rank-sum U₂ (exact BigInt
    * over the grid) and AUC vs rest. The "did URGENT orders stop being
    * bigger" distribution-shift alarm, live.
    *
    * Keying: a single grid key. The honest-scale contract is the WEIGHT
    * column — a 100 TB ingest feeds per-micro-batch (priority, bucket, n)
    * deltas (pre-reduced upstream, e.g. a foreachBatch census), so the
    * volume crossing the key is grid-sized per trigger; unit-weight raw
    * rows are for tests/small streams. The fold is a commutative weighted
    * census, so arrival order and batch splits cannot change the state. */
  /** One per-group IQR-fence snapshot emission (seq = that group's change
    * counter; downstream keeps the max-seq emission). */
  final case class IqrUpdate(grp: String, seq: Long, n: Long,
      q1: Long, q3: Long, iqr: Long, n_low: Long, n_high: Long)

  final case class IqrCell(v: Long, n: Long)
  final case class IqrState(seq: Long, cells: Seq[IqrCell])

  /** Streaming twin of the batch `dq_iqr_outliers` (DataQuality.scala):
    * per-group value census as managed state, exact type-1 quartiles and
    * 1.5·IQR fences re-derived per batch — the live data-quality screen a
    * pipeline keeps on a value column while ingesting.
    *
    * Input is a weighted census-delta relation (`grp`, `v`, `w`) — the
    * aucMonitor ingest contract: upstream pre-reduces each micro-batch to
    * (value, count) deltas, so a 100 TB ingest ships value-DOMAIN-sized
    * deltas, never row-sized ones, and the fold is a commutative weighted
    * sum (arrival order, batch boundaries, and restarts cannot change the
    * census). State per group is the value census itself — bounded by the
    * value DOMAIN (the batch operator's bounded-census precondition,
    * carried into state), independent of row count. Quartile semantics
    * are the batch operator's verbatim: q_k = min v with 4·cum ≥ k·tot,
    * fences compared in DOUBLED integers so the 1.5·IQR half never
    * rounds. A batch that touches no cell of a group emits nothing. */
  def iqrMonitor(spark: SparkSession, deltas: DataFrame): Dataset[IqrUpdate] = {
    import spark.implicits._
    deltas.selectExpr("grp", "v", "w")
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[IqrState, IqrUpdate](
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout) { (grp, rows, state) =>
        val prev = state.getOption.getOrElse(IqrState(0L, Seq.empty))
        val census = scala.collection.mutable.Map[Long, Long]()
        prev.cells.foreach(c => census(c.v) = c.n)
        var any = false
        rows.foreach { case (_, v, w) =>
          any = true
          census(v) = census.getOrElse(v, 0L) + w
        }
        if (!any) Iterator.empty
        else {
          val sorted = census.toSeq.sortBy(_._1)
          val next = IqrState(prev.seq + 1,
            sorted.map { case (v, n) => IqrCell(v, n) })
          state.update(next)
          val tot = sorted.iterator.map(_._2).sum
          var cum = 0L
          var q1 = Long.MinValue; var q3 = Long.MinValue
          sorted.foreach { case (v, n) =>
            cum += n
            if (q1 == Long.MinValue && 4 * cum >= tot) q1 = v
            if (q3 == Long.MinValue && 4 * cum >= 3 * tot) q3 = v
          }
          val iqr = q3 - q1
          val nLow = sorted.iterator
            .collect { case (v, n) if 2 * v < 2 * q1 - 3 * iqr => n }.sum
          val nHigh = sorted.iterator
            .collect { case (v, n) if 2 * v > 2 * q3 + 3 * iqr => n }.sum
          Iterator.single(IqrUpdate(grp, next.seq, tot, q1, q3, iqr, nLow, nHigh))
        }
      }
  }

  /** One per-key two-sample KS snapshot (seq = change counter; downstream
    * keeps max-seq). `d_num` is the exact gap numerator max|cumₐ·n_b −
    * cum_b·nₐ| as a digit STRING (it reaches nₐ·n_b ≈ 10²² at 100 TB —
    * the u2/tradeFlow emission policy); `d_e6`/`ks_v` are None while
    * either side is empty (KS undefined, made explicit instead of a
    * division error). */
  final case class KsUpdate(key: String, seq: Long, n_a: Long, n_b: Long,
      d_num: String, d_e6: Option[Long], ks_v: Option[Long])

  final case class KsCell(v: Long, na: Long, nb: Long)
  final case class KsState(seq: Long, cells: Seq[KsCell])

  /** Streaming twin of the batch `stats_ks_test` arithmetic: per-key
    * TWO-SAMPLE drift monitor — side A vs side B value censuses as one
    * managed state, the exact Kolmogorov–Smirnov gap re-derived per batch
    * over the merged value grid (BigInt: cum·n products overflow int64 at
    * corpus scale), argmax value reported with the smallest-v tie-break.
    * The live "is the new source/era distributed like the old one?"
    * screen a pipeline keeps while ingesting.
    *
    * Input is a weighted census-delta relation (`key`, `side` ∈ {0 = A,
    * 1 = B}, `v`, `w`) — the aucMonitor ingest contract: upstream
    * pre-reduces each micro-batch to (value, count) deltas, so per-trigger
    * volume and state are value-DOMAIN-sized, and the fold is a
    * commutative weighted sum (arrival order, batch splits, restarts
    * cannot change the census). A batch touching no cell of a key emits
    * nothing for it. */
  def ksMonitor(spark: SparkSession, deltas: DataFrame): Dataset[KsUpdate] = {
    import spark.implicits._
    deltas.selectExpr("key", "side", "v", "w")
      .as[(String, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[KsState, KsUpdate](
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout) { (key, rows, state) =>
        val prev = state.getOption.getOrElse(KsState(0L, Seq.empty))
        val census = scala.collection.mutable.Map[Long, (Long, Long)]()
        prev.cells.foreach(c => census(c.v) = (c.na, c.nb))
        var any = false
        rows.foreach { case (_, side, v, w) =>
          any = true
          val (a, b) = census.getOrElse(v, (0L, 0L))
          census(v) = if (side == 0L) (a + w, b) else (a, b + w)
        }
        if (!any) Iterator.empty
        else {
          val sorted = census.toSeq.sortBy(_._1)
          val next = KsState(prev.seq + 1,
            sorted.map { case (v, (a, b)) => KsCell(v, a, b) })
          state.update(next)
          val nA = sorted.iterator.map(_._2._1).sum
          val nB = sorted.iterator.map(_._2._2).sum
          if (nA == 0 || nB == 0)
            Iterator.single(KsUpdate(key, next.seq, nA, nB, "0", None, None))
          else {
            var cumA = 0L; var cumB = 0L
            var dMax = BigInt(0); var ksV = Long.MinValue
            sorted.foreach { case (v, (a, b)) =>
              cumA += a; cumB += b
              val gap = (BigInt(cumA) * nB - BigInt(cumB) * nA).abs
              if (gap > dMax) { dMax = gap; ksV = v }
            }
            val dE6 = (dMax * 1000000 / (BigInt(nA) * nB)).toLong
            Iterator.single(KsUpdate(key, next.seq, nA, nB,
              dMax.toString, Some(dE6), Some(ksV)))
          }
        }
      }
  }

  def aucMonitor(spark: SparkSession, deltas: DataFrame): Dataset[AucUpdate] = {
    import spark.implicits._
    deltas.selectExpr("priority", "bucket", "w")
      .as[(String, Long, Long)]
      .groupByKey(_ => 0)
      .flatMapGroupsWithState[AucGridState, AucUpdate](
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout) { (_, rows, state) =>
        val prev = state.getOption.getOrElse(AucGridState(0L, Seq.empty))
        val grid = scala.collection.mutable.Map[(String, Long), Long]()
        prev.cells.foreach(c => grid((c.priority, c.bucket)) = c.n)
        var any = false
        rows.foreach { case (p, b, w) =>
          any = true
          grid((p, b)) = grid.getOrElse((p, b), 0L) + w
        }
        if (!any) Iterator.empty
        else {
          val cells = grid.toSeq.sortBy(_._1)
            .map { case ((p, b), n) => AucCell(p, b, n) }
          val next = AucGridState(prev.seq + 1, cells)
          state.update(next)
          // cumulative doubled midranks over the merged bucket grid
          val totals = grid.groupBy(_._1._2).view
            .mapValues(_.values.sum).toSeq.sortBy(_._1)
          var cum = 0L
          val midrank2 = totals.map { case (b, t) =>
            val m = 2 * cum + t + 1; cum += t; b -> m
          }.toMap
          val nAll = cum
          grid.keys.map(_._1).toSeq.distinct.sorted.iterator.map { p =>
            val nG = grid.collect { case ((q, _), n) if q == p => n }.sum
            val r2 = grid.iterator.collect { case ((q, b), n) if q == p =>
              BigInt(n) * midrank2(b) }.sum
            val u2 = r2 - BigInt(nG) * (nG + 1)
            val auc =
              if (nG == 0L || nAll == nG) 0L
              else (u2 * 1000000 / (BigInt(2) * nG * (nAll - nG))).toLong
            AucUpdate(p, next.seq, nG, nAll - nG, u2.toString, auc)
          }
        }
      }
  }
}
