package graft

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core._
import graft.store.SparkFactStore

/** Store-level benchmark mirroring the reference's only published load
  * threshold (BASELINE.md): 10 concurrent writers issuing single-fact
  * appends with a TagQueryBased condition + fresh idempotency key, p90
  * target < 500 ms; plus bulk-load + replay throughput (>= 10k facts per
  * batch envelope) and subscribe tail latency. Prints one JSON line. */
object StoreBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // SPARK_GRAFT_STORE_PROFILE=hadoop routes every byte of store IO
    // through the Hadoop FileSystem client over a file:// root with the
    // HadoopFsPublisher commit CAS — the same latencies a cluster
    // deployment pays minus the network, so the binding's overhead is a
    // measured number, not a guess. Default stays the java.nio fast path.
    val benchRoot = Files.createTempDirectory("graft-storebench-")
    val fs = sys.env.get("SPARK_GRAFT_STORE_PROFILE") match {
      case Some("hadoop") => SparkFactStore.at(spark, s"file://$benchRoot")
      case _ => new SparkFactStore(spark, benchRoot)
    }
    fs.createStore("bench")

    // warmup: 20 appends
    (1 to 20).foreach(i => fs.append("bench", FactInput("WARM", s"w$i", Array[Byte](1))))

    // --- conditional-append latency, 10 concurrent writers (k6 shape) -------
    val vus = 10
    val perVu = 15
    val pool = Executors.newFixedThreadPool(vus)
    val latch = new CountDownLatch(vus)
    val latencies = new java.util.concurrent.ConcurrentLinkedQueue[Double]()
    val t0 = System.nanoTime()
    (1 to vus).foreach { vu =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          try (1 to perVu).foreach { i =>
            val cond = AppendCondition.TagQueryBased(
              TagQuery(Seq(TagQueryItem.TagOnly(Map("vu" -> s"$vu-$i")))))
            val req = AppendRequest("bench",
              Seq(FactInput("LOAD", s"vu-$vu", Array.fill(64)(1: Byte),
                tags = Map("vu" -> s"$vu-$i-done"))),
              condition = cond)
            val s = System.nanoTime()
            fs.append(req) match {
              case _: AppendResult.Appended => ()
              case other => System.err.println(s"unexpected: $other")
            }
            latencies.add((System.nanoTime() - s) / 1e9)
          } finally latch.countDown()
        }
      })
    }
    latch.await(600, TimeUnit.SECONDS)
    pool.shutdown()
    val wall = (System.nanoTime() - t0) / 1e9
    import scala.jdk.CollectionConverters._
    val ls = latencies.asScala.toSeq.sorted
    def pct(p: Double): Double = ls((p * (ls.size - 1)).round.toInt)
    val appendsPerSec = ls.size / wall

    // --- the SAME shape through the wire (k6 → HTTP, reference apples-to-
    // apples: the 500 ms envelope is measured at the HTTP layer,
    // k6/single_append_with_condition.js → Quarkus; above we measure the
    // engine API only) ------------------------------------------------------
    val rest = new graft.server.RestServer(fs).start()
    val httpLat = new java.util.concurrent.ConcurrentLinkedQueue[Double]()
    val httpWall0 = System.nanoTime()
    try {
      val url = java.net.URI.create(
        s"http://127.0.0.1:${rest.boundPort}/api/v1/stores/bench/facts")
      val data64 = java.util.Base64.getEncoder.encodeToString(Array.fill(64)(1: Byte))
      val pool2 = Executors.newFixedThreadPool(vus)
      val latch2 = new CountDownLatch(vus)
      (1 to vus).foreach { vu =>
        pool2.submit(new Runnable {
          override def run(): Unit = {
            val client = java.net.http.HttpClient.newHttpClient()
            try (1 to perVu).foreach { i =>
              val body =
                s"""{"facts":[{"type":"LOAD","subject":"hvu-$vu","data":"$data64",
                   |"tags":{"hvu":"$vu-$i-done"}}],
                   |"idempotencyKey":"http-$vu-$i",
                   |"condition":{"type":"tagQueryBased",
                   |"query":{"items":[{"tags":{"hvu":"$vu-$i"}}]}}}""".stripMargin
              val req = java.net.http.HttpRequest.newBuilder(url)
                .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build()
              val s = System.nanoTime()
              val resp = client.send(req,
                java.net.http.HttpResponse.BodyHandlers.ofString())
              if (resp.statusCode() != 200)
                System.err.println(s"unexpected http ${resp.statusCode()}: ${resp.body()}")
              httpLat.add((System.nanoTime() - s) / 1e9)
            } finally latch2.countDown()
          }
        })
      }
      // a failed await or a short sample set must surface as a loud error,
      // not percentiles computed over a still-growing or empty queue
      require(latch2.await(600, TimeUnit.SECONDS), "HTTP bench VUs did not finish")
      pool2.shutdown()
    } finally rest.stop()
    val httpWall = (System.nanoTime() - httpWall0) / 1e9
    val hls = httpLat.asScala.toSeq.sorted
    require(hls.size == vus * perVu,
      s"HTTP bench lost samples: ${hls.size} of ${vus * perVu} (send failures above)")
    def hpct(p: Double): Double = hls((p * (hls.size - 1)).round.toInt)
    val httpPerSec = hls.size / httpWall

    // --- bulk load + replay throughput ---------------------------------------
    val n = 200000L
    val bulk = spark.range(n).selectExpr(
      "'BULK' AS fact_type", "concat('subj-', id % 1000) AS subject",
      "cast(null as binary) AS payload_data", "cast(null as string) AS payload_format",
      "cast(null as string) AS payload_schema",
      "map('k', cast(id as string)) AS metadata", "map('m', 'v') AS tags")
    val tb0 = System.nanoTime()
    fs.bulkAppend("bench", bulk)
    val bulkSec = (System.nanoTime() - tb0) / 1e9

    val tr0 = System.nanoTime()
    val Right(it) = fs.replay("bench", ReplayStart.Beginning, batchSize = 10000): @unchecked
    var drained = 0L
    var batches = 0
    it.foreach { b => drained += b.size; batches += 1 }
    val replaySec = (System.nanoTime() - tr0) / 1e9

    // --- subscribe tail latency ----------------------------------------------
    val Right(sub) = fs.subscribe("bench", StartPosition.End): @unchecked
    val seen = new CountDownLatch(1)
    @volatile var tailNanos = 0L
    val t = new Thread(() => { sub.next(); tailNanos = System.nanoTime(); seen.countDown() })
    t.setDaemon(true); t.start()
    Thread.sleep(100)
    val ta0 = System.nanoTime()
    fs.append("bench", FactInput("TAIL", "tail", Array[Byte](1)))
    seen.await(60, TimeUnit.SECONDS)
    sub.close()
    val tailMs = (tailNanos - ta0) / 1e6

    println(
      s"""{"metric":"store","unit":"sec","cond_append":{"n":${ls.size},"vus":$vus,""" +
      s""""p50":${pct(0.5)},"p90":${pct(0.9)},"p99":${pct(0.99)},"appends_per_sec":$appendsPerSec},""" +
      s""""cond_append_http":{"n":${hls.size},"vus":$vus,""" +
      s""""p50":${hpct(0.5)},"p90":${hpct(0.9)},"p99":${hpct(0.99)},"appends_per_sec":$httpPerSec},""" +
      s""""bulk_load":{"rows":$n,"sec":$bulkSec,"rows_per_sec":${n / bulkSec}},""" +
      s""""replay":{"rows":$drained,"batches":$batches,"sec":$replaySec,"rows_per_sec":${drained / replaySec}},""" +
      s""""subscribe_tail_ms":$tailMs}""")
    spark.stop()
  }
}
