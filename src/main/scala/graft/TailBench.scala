package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files
import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch, TimeUnit}

import org.apache.spark.sql.SparkSession

import graft.core._
import graft.server.RestServer
import graft.store.SparkFactStore

/** Live-tail delivery latency, end-to-end: append → subscriber-delivery
  * p50/p90/p99 over a sustained live run, measured through BOTH surfaces —
  *
  *   (a) the engine `subscribe` iterator (50 ms idle poll against
  *       commit-log head metadata, then a pruned window read), and
  *   (b) REST SSE: an HTTP client holding a `text/event-stream`
  *       subscription against RestServer while the appends land.
  *
  * Each appended fact carries its send `System.nanoTime` in metadata; the
  * consumer stamps arrival, so a sample is one fact's full path latency
  * (same JVM ⇒ one clock). The reference's envelope is its memory
  * backend's 100 ms poll floor (MemoryFactStore.kt:231) — the target is
  * p90 at or under that floor for the local fast path.
  *
  * Usage: runMain graft.TailBench   [env: SPARK_GRAFT_TAIL_SECS=60
  *        SPARK_GRAFT_TAIL_INTERVAL_MS=100] */
object TailBench {

  private def pct(xs: Seq[Double], q: Double): Double =
    if (xs.isEmpty) -1.0
    else xs.sorted.apply(math.min(xs.size - 1, (xs.size * q).toInt))

  def main(args: Array[String]): Unit = {
    val secs = sys.env.getOrElse("SPARK_GRAFT_TAIL_SECS", "60").toInt
    val intervalMs = sys.env.getOrElse("SPARK_GRAFT_TAIL_INTERVAL_MS", "100").toLong
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = Files.createTempDirectory("tailbench")
    val fs = new SparkFactStore(spark, root)
    fs.createStore("tail")
    // a non-empty store so the tail read path exercises real pruning
    fs.append("tail", (1 to 2000).map(i =>
      FactInput("SEED", s"seed-$i", Array[Byte](1), tags = Map("seed" -> "y"))))

    val srv = new RestServer(fs).start()
    val engineLat = new ConcurrentLinkedQueue[Double]()
    val sseLat = new ConcurrentLinkedQueue[Double]()
    @volatile var done = false

    // --- consumer A: engine subscribe iterator from End ---------------------
    val Right(sub) = fs.subscribe("tail", StartPosition.End): @unchecked
    val engineReady = new CountDownLatch(1)
    val tEngine = new Thread(() => {
      engineReady.countDown()
      try while (!done) {
        sub.next().foreach { f =>
          val now = System.nanoTime()
          f.metadata.get("t").foreach(t0 =>
            engineLat.add((now - t0.toLong) / 1e6))
        }
      } catch { case _: NoSuchElementException => () }
    })
    tEngine.setDaemon(true); tEngine.start()

    // --- consumer B: REST SSE from end ---------------------------------------
    val sseReady = new CountDownLatch(1)
    val client = HttpClient.newHttpClient()
    @volatile var sseBody: java.io.InputStream = null
    val tSse = new Thread(() => {
      val req = HttpRequest.newBuilder(URI.create(
          s"http://127.0.0.1:${srv.boundPort}/api/v1/stores/tail/facts/subscribe?from=end"))
        .header("Accept", "text/event-stream").GET().build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofInputStream())
      sseBody = resp.body()
      val br = new java.io.BufferedReader(
        new java.io.InputStreamReader(sseBody, "UTF-8"))
      sseReady.countDown()
      try {
        var line = br.readLine()
        while (line != null && !done) {
          if (line.startsWith("data:")) {
            val now = System.nanoTime()
            // metadata rides the fact JSON: ..."metadata":{"t":"123..."}...
            val m = """"t"\s*:\s*"(\d+)"""".r.findFirstMatchIn(line)
            m.foreach(g => sseLat.add((now - g.group(1).toLong) / 1e6))
          }
          line = br.readLine()
        }
      } catch { case _: java.io.IOException => () }
    })
    tSse.setDaemon(true); tSse.start()

    require(engineReady.await(10, TimeUnit.SECONDS) &&
      sseReady.await(10, TimeUnit.SECONDS), "consumers failed to attach")
    Thread.sleep(500) // both tails idle at End before the first timed append

    // --- producer -------------------------------------------------------------
    val t0 = System.nanoTime()
    var n = 0L
    while ((System.nanoTime() - t0) < secs * 1000000000L) {
      fs.append(AppendRequest("tail", Seq(FactInput(
        "TAIL", s"live-$n", Array[Byte](1),
        metadata = Map("t" -> System.nanoTime().toString))),
        idempotencyKey = s"tail-$n"))
      n += 1
      Thread.sleep(intervalMs)
    }
    // let the tails drain the last appends, then stop
    Thread.sleep(2000)
    done = true
    sub.close()
    // the server's SSE handler only notices a gone client on its next
    // WRITE: close the client stream, then land one unmeasured poison
    // fact so the handler writes, gets the IOException, and its (non-
    // daemon) pool thread exits — otherwise the JVM never terminates
    Option(sseBody).foreach(s => try s.close() catch { case _: Exception => () })
    fs.append("tail", FactInput("POISON", "poison", Array[Byte](0)))
    srv.stop()

    val e = engineLat.toArray(Array.empty[java.lang.Double]).map(_.doubleValue).toSeq
    val w = sseLat.toArray(Array.empty[java.lang.Double]).map(_.doubleValue).toSeq
    def block(name: String, xs: Seq[Double]): String =
      s""""$name":{"n":${xs.size},"p50_ms":${pct(xs, 0.5)},"p90_ms":${pct(xs, 0.9)},""" +
      s""""p99_ms":${pct(xs, 0.99)},"max_ms":${if (xs.isEmpty) -1 else xs.max}}"""
    println(s"""{"metric":"tail_latency","secs":$secs,"appends":$n,""" +
      block("engine", e) + "," + block("sse", w) + "}")
    spark.stop()
  }
}
