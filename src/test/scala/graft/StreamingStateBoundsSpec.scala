package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.{FactStateStreams, StateObservatory}

/** State-SIZE bounds for the stateful faces: the recovery/parity specs
  * prove state survives and computes correctly; this spec proves state
  * does not GROW. Each face is driven with many micro-batches over a
  * fixed keyspace and the observatory's recorded `maxRows` (state keys)
  * must equal the keyspace size — stream length must never leak into the
  * state row count (registers, k counters, histogram buckets, and grid
  * slots all live INSIDE one row per key). That is exactly the leak class
  * an output-parity check cannot see and the class that OOMs an executor
  * at 100 TB. */
class StreamingStateBoundsSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark

  private def drive[T: org.apache.spark.sql.Encoder](
      name: String,
      batches: Seq[Seq[T]],
      face: org.apache.spark.sql.DataFrame => org.apache.spark.sql.Dataset[_],
      toDf: MemoryStream[T] => org.apache.spark.sql.DataFrame,
      mode: OutputMode = OutputMode.Update()): StateObservatory#StateStats = {
    val s = spark
    val obs = StateObservatory.attach(s)
    val input = MemoryStream[T](s)
    val out = face(toDf(input))
    val dir = java.nio.file.Files.createTempDirectory(s"bounds-$name").toString
    val q = out.writeStream
      .format("memory").queryName(s"${name}_${System.nanoTime()}")
      .outputMode(mode)
      .option("checkpointLocation", s"$dir/cp")
      .trigger(Trigger.ProcessingTime(20))
      .start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      // every batch carries data for at least one key, so at least
      // batches.size stateful progress events must eventually arrive
      obs.awaitBatches(q.name, batches.size.toLong)
    } finally {
      q.stop()
      s.streams.removeListener(obs)
    }
  }

  test("hllDistinct state rows stay = n_langs across 12 batches") {
    val s0 = spark; import s0.implicits._
    val langs = Seq("de", "en", "es", "fr", "zh")
    // 12 batches × 40 hashes across the 5 languages — 480 stream rows,
    // state must hold exactly 5 keys (256 registers each, inside the row)
    val batches = (0 until 12).map { b =>
      (0 until 40).map(i => (langs((b + i) % 5), (b * 1000 + i * 37 + 1).toLong))
    }
    val st = drive[(String, Long)]("hll", batches,
      df => FactStateStreams.hllDistinct(spark, df),
      ms => ms.toDF().toDF("lang", "h"))
    assert(st.maxRows == langs.size.toLong,
      s"state keys ${st.maxRows} != ${langs.size} languages (leak)")
    assert(st.maxBytes > 0 && st.maxBytes < 8L * 1024 * 1024, s"bytes ${st.maxBytes}")
  }

  test("spaceSavingTopK state rows stay = n_langs (k counters ride inside)") {
    val s0 = spark; import s0.implicits._
    val langs = Seq("de", "en", "es")
    var pos = 0L
    val batches = (0 until 10).map { b =>
      (0 until 60).map { i =>
        pos += 1
        // far more distinct items than k: evictions churn counters but the
        // key count must stay at the language count
        (langs(i % 3), (b * 97 + i * 13 % 41).toLong, pos)
      }
    }
    val st = drive[(String, Long, Long)]("topk", batches,
      df => FactStateStreams.spaceSavingTopK(spark, df, k = 8),
      ms => ms.toDF().toDF("lang", "h", "pos"))
    assert(st.maxRows == langs.size.toLong,
      s"state keys ${st.maxRows} != ${langs.size} languages (leak)")
    assert(st.maxBytes < 8L * 1024 * 1024)
  }

  test("valueQuantiles state rows stay = n_types (512-bucket census inside)") {
    val s0 = spark; import s0.implicits._
    val types = Seq("click", "view", "purchase", "scroll")
    val batches = (0 until 10).map { b =>
      (0 until 50).map(i => (types(i % 4), (b * 31 + i * 7 % 509).toDouble))
    }
    val st = drive[(String, Double)]("quant", batches,
      df => FactStateStreams.valueQuantiles(spark, df),
      ms => ms.toDF().toDF("event_type", "value"))
    assert(st.maxRows == types.size.toLong,
      s"state keys ${st.maxRows} != ${types.size} types (leak)")
    assert(st.maxBytes < 8L * 1024 * 1024)
  }

  test("dowProfile state rows stay = n_types (7-slot grid inside)") {
    val s0 = spark; import s0.implicits._
    val DayUs = 86400L * 1000000
    val types = Seq("click", "view")
    // 14 consecutive days per type, one batch per day — the grid closes a
    // day per batch but the key count must stay at 2
    val batches = (0 until 14).map { day =>
      types.flatMap(t => (0 to day % 3).map(i =>
        (t, day * DayUs + i * 1000000L + 1)))
    }
    val st = drive[(String, Long)]("dow", batches,
      df => FactStateStreams.dowProfile(
        spark, df.selectExpr("event_type", "timestamp_micros(ts_us) AS ts")),
      ms => ms.toDF().toDF("event_type", "ts_us"),
      mode = OutputMode.Append())
    assert(st.maxRows == types.size.toLong,
      s"state keys ${st.maxRows} != ${types.size} types (leak)")
    assert(st.maxBytes < 8L * 1024 * 1024)
  }

  test("cusumAlarms state rows stay = n_types (warm-up + S+ cursor inside)") {
    val s0 = spark; import s0.implicits._
    val DayUs = 86400L * 1000000
    val types = Seq("click", "view")
    // 30 days per type, one batch per day — warm-up freezes at day 14,
    // the chart runs on, and state holds exactly one cursor row per type
    val batches = (0 until 30).map { day =>
      types.flatMap(t => (0 to day % 4).map(i =>
        (t, day * DayUs + i * 1000000L + 1)))
    }
    val st = drive[(String, Long)]("cusum", batches,
      df => FactStateStreams.cusumAlarms(
        spark, df.selectExpr("event_type", "timestamp_micros(ts_us) AS ts")),
      ms => ms.toDF().toDF("event_type", "ts_us"),
      mode = OutputMode.Append())
    assert(st.maxRows == types.size.toLong,
      s"state keys ${st.maxRows} != ${types.size} types (leak)")
    assert(st.maxBytes < 8L * 1024 * 1024)
  }

  test("typeWeeklyDelta state rows stay = n_types (one week cursor inside)") {
    val s0 = spark; import s0.implicits._
    val WeekUs = 7L * 86400 * 1000000
    val types = Seq("click", "view", "error")
    // 20 weeks per type, one batch per week — a week closes per batch but
    // state holds exactly one cursor row per type, forever
    val batches = (0 until 20).map { wk =>
      types.flatMap(t => (0 to wk % 4).map(i =>
        (t, wk * WeekUs + i * 1000000L + 1)))
    }
    val st = drive[(String, Long)]("wkd", batches,
      df => FactStateStreams.typeWeeklyDelta(
        spark, df.selectExpr("event_type", "timestamp_micros(ts_us) AS ts")),
      ms => ms.toDF().toDF("event_type", "ts_us"),
      mode = OutputMode.Append())
    assert(st.maxRows == types.size.toLong,
      s"state keys ${st.maxRows} != ${types.size} types (leak)")
    assert(st.maxBytes < 8L * 1024 * 1024)
  }

  test("benfordCensus state rows stay = n_types (nine counters inside)") {
    val s0 = spark; import s0.implicits._
    val types = Seq("click", "view", "purchase")
    // 10 batches × 60 values spanning all nine first digits — state must
    // hold exactly one 9-counter row per type regardless of stream length
    val batches = (0 until 10).map { b =>
      (0 until 60).map(i => (types(i % 3), (1 + (b * 7 + i) % 899).toDouble))
    }
    val st = drive[(String, Double)]("benford", batches,
      df => FactStateStreams.benfordCensus(spark, df),
      ms => ms.toDF().toDF("event_type", "value"))
    assert(st.maxRows == types.size.toLong,
      s"state keys ${st.maxRows} != ${types.size} types (leak)")
    assert(st.maxBytes < 8L * 1024 * 1024)
  }

  test("bloomFirstSeen state rows stay = occupied shards (SegBits bits inside)") {
    val s0 = spark; import s0.implicits._
    val S = graft.operators.Sketches
    val p61 = BigInt(2305843009213693951L)
    def shardOf(u: Long): Long = {
      val t = (BigInt(u) * S.ShardPerm._1 + S.ShardPerm._2) mod p61
      (((t * t) mod p61) % S.FsShards).toLong
    }
    val users = (1L to 40L).toSeq
    val nShards = users.map(shardOf).distinct.size.toLong
    // 12 batches × 40 events over a fixed 40-user keyspace: the naive
    // exact detector would hold 40 user keys; the bloom face must hold
    // exactly one fixed-width segment row per OCCUPIED SHARD
    val batches = (0 until 12).map { b =>
      users.zipWithIndex.map { case (u, i) =>
        (u, 1700000000000000L + b * 1000000L + i * 1000L, (b * 40 + i).toLong)
      }
    }
    val st = drive[(Long, Long, Long)]("bloomfs", batches,
      df => FactStateStreams.bloomFirstSeen(spark, df.selectExpr(
        "user_id", "timestamp_micros(ts_us) AS ts", "event_id")),
      ms => ms.toDF().toDF("user_id", "ts_us", "event_id"))
    assert(st.maxRows == nShards,
      s"state keys ${st.maxRows} != $nShards occupied shards (leak)")
    assert(st.maxBytes < 8L * 1024 * 1024)
  }

  test("lshBucketCensus state rows stay = occupied buckets (census inside)") {
    val s0 = spark; import s0.implicits._
    // a fixed 30-vector keyspace streamed 10 times over: buckets are a
    // pure function of the vectors, so state must hold exactly the
    // occupied-bucket count no matter how long the stream runs
    val vecs = s0.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .selectExpr("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2))).take(30).toSeq
    graft.functions.VectorFunctions.register(s0)
    val nBuckets = s0.createDataFrame(vecs).toDF("vec_id", "label", "embedding")
      .selectExpr(graft.operators.Similarity.lshBucketSparkExpr("embedding", 8))
      .distinct().count()
    val batches = (0 until 10).map(_ => vecs)
    val st = drive[(Long, Int, Seq[Float])]("lshb", batches,
      df => FactStateStreams.lshBucketCensus(spark, df),
      ms => ms.toDF().toDF("vec_id", "label", "embedding"))
    assert(st.maxRows == nBuckets,
      s"state keys ${st.maxRows} != $nBuckets occupied buckets (leak)")
    assert(st.maxBytes < 8L * 1024 * 1024)
  }

  test("knnMaintenance state rows stay = n_probes (k-entry top list inside)") {
    val s0 = spark; import s0.implicits._
    val vecs = s0.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .selectExpr("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val probes = vecs.take(6)
      .map { case (id, v) => (id, v.map(_.toDouble).toArray) }.toSeq
    // 10 batches over a fixed 24-vector pool (repeats churn the candidate
    // merge): state must hold exactly |probes| keys at any stream length
    val pool = vecs.slice(6, 30).toSeq
    val batches = (0 until 10).map(b => pool.drop(b % 3))
    val st = drive[(Long, Seq[Float])]("knnm", batches,
      df => FactStateStreams.knnMaintenance(spark, df, probes, k = 4),
      ms => ms.toDF().toDF("vec_id", "embedding"))
    assert(st.maxRows == probes.size.toLong,
      s"state keys ${st.maxRows} != ${probes.size} probes (leak)")
    assert(st.maxBytes < 8L * 1024 * 1024)
  }

  test("transitions state rows stay = n_users (one last-type string each)") {
    val s0 = spark; import s0.implicits._
    val T0 = 1700000000000000L
    var eid = 0L
    // 12 batches over a fixed 7-user keyspace: state must hold exactly one
    // row per user no matter how many events stream through
    val batches = (0 until 12).map { b =>
      (0 until 21).map { i =>
        eid += 1
        ((i % 7).toLong, Seq("view", "click", "purchase")(i % 3),
          T0 + b * 1000000L + i * 1000L, eid)
      }
    }
    val st = drive[(Long, String, Long, Long)]("trans", batches,
      df => FactStateStreams.transitions(spark, df.selectExpr(
        "user_id", "event_type", "timestamp_micros(ts_us) AS ts", "event_id")),
      ms => ms.toDF().toDF("user_id", "event_type", "ts_us", "event_id"),
      OutputMode.Append())
    assert(st.maxRows == 7L, s"state keys ${st.maxRows} != 7 users (leak)")
    assert(st.maxBytes < 8L * 1024 * 1024)
  }

  test("ewmaAnomaly state rows stay = n_types (level+deviation inside)") {
    val s0 = spark; import s0.implicits._
    val T0 = 1700000000000000L
    val DayUs = 86400L * 1000000
    val types = Seq("a", "b", "c")
    // each batch advances one day per type — 14 days, state = 3 keys
    val batches = (0 until 14).map { d =>
      types.flatMap(t => (0 until 4).map(i =>
        (t, T0 + d * DayUs + i * 1000L)))
    }
    val st = drive[(String, Long)]("ewmab", batches,
      df => FactStateStreams.ewmaAnomaly(spark, df.selectExpr(
        "event_type", "timestamp_micros(ts_us) AS ts")),
      ms => ms.toDF().toDF("event_type", "ts_us"),
      OutputMode.Append())
    assert(st.maxRows == types.size.toLong,
      s"state keys ${st.maxRows} != ${types.size} types (leak)")
    assert(st.maxBytes < 8L * 1024 * 1024)
  }

  test("aucMonitor state rows stay = 1 (the whole priorities x buckets " +
      "grid lives inside the single grid key)") {
    val s0 = spark; import s0.implicits._
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    // 10 batches x 50 rows over a 5x40 value grid — state must stay ONE
    // row whose cells are bounded by the grid, not the 500 stream rows
    val batches = (0 until 10).map { b =>
      (0 until 50).map(i => (prios((b + i) % 5), ((b * 7 + i * 3) % 40).toLong, 1L))
    }
    val st = drive[(String, Long, Long)]("auc", batches,
      df => FactStateStreams.aucMonitor(spark, df),
      ms => ms.toDF().toDF("priority", "bucket", "w"))
    assert(st.maxRows == 1L, s"state keys ${st.maxRows} != 1 (leak)")
    assert(st.maxBytes < 8L * 1024 * 1024)
  }

  test("iqrMonitor/ksMonitor state rows stay = group keys; cells bounded " +
      "by the value DOMAIN, not the stream volume") {
    val s0 = spark; import s0.implicits._
    val grps = Seq("A", "B", "C")
    // 10 batches x 60 rows over a 3-group x 20-value domain
    val iqrBatches = (0 until 10).map { b =>
      (0 until 60).map(i => (grps((b + i) % 3), ((b * 11 + i * 7) % 20).toLong, 1L))
    }
    val stI = drive[(String, Long, Long)]("iqrb", iqrBatches,
      df => FactStateStreams.iqrMonitor(spark, df),
      ms => ms.toDF().toDF("grp", "v", "w"))
    assert(stI.maxRows == grps.size.toLong, s"iqr keys ${stI.maxRows} (leak)")
    assert(stI.maxBytes < 8L * 1024 * 1024)
    val ksBatches = (0 until 10).map { b =>
      (0 until 60).map(i => (grps((b + i) % 3), (i % 2).toLong,
        ((b * 13 + i * 5) % 20).toLong, 1L))
    }
    val stK = drive[(String, Long, Long, Long)]("ksb", ksBatches,
      df => FactStateStreams.ksMonitor(spark, df),
      ms => ms.toDF().toDF("key", "side", "v", "w"))
    assert(stK.maxRows == grps.size.toLong, s"ks keys ${stK.maxRows} (leak)")
    assert(stK.maxBytes < 8L * 1024 * 1024)
  }
}
