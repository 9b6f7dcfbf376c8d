package graft.server

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.core._

/** REST adapter over the FactStore API — capability parity with the
  * reference's Quarkus HTTP surface (factstore-server/.../http/
  * StoreResource.kt, AppendResource.kt, QueryResource.kt,
  * StreamResource.kt), built on the JDK HttpServer + Jackson so it adds
  * zero dependencies:
  *
  *  - POST/GET            /api/v1/stores            create / list
  *  - GET/HEAD/DELETE     /api/v1/stores/{name}
  *  - POST                /api/v1/stores/{s}/facts  append (idempotencyKey,
  *                        condition: none|expectedLastFact|all|tagQueryBased)
  *  - GET                 /api/v1/stores/{s}/facts/{factId}
  *  - GET                 /api/v1/stores/{s}/facts?from&to&tag=k%3Dv&limit&direction
  *                        (tags XOR time range — combining is 400, like the
  *                        reference QueryResource.kt:74-78)
  *  - GET                 /api/v1/stores/{s}/subjects/{subject}/facts
  *  - POST                /api/v1/stores/{s}/facts/query  (tag query)
  *  - GET                 /api/v1/stores/{s}/facts/replay?after=  (NDJSON)
  *
  * Payload `data` is base64, like the reference (README.md:25-27). Errors
  * are structured `{"error": ..., "detail": ...}`.
  */
final class RestServer(store: FactStore, port: Int = 0) {

  private val mapper = new ObjectMapper()
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

  def boundPort: Int = server.getAddress.getPort

  // non-daemon pool: must be shut down in stop() or an embedding
  // application's JVM never exits after closing the server
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(8)

  def start(): RestServer = {
    server.createContext("/api/v1/stores", (ex: HttpExchange) => safely(ex)(route))
    server.createContext("/api/v1/info", (ex: HttpExchange) => safely(ex)(info))
    server.createContext("/", (ex: HttpExchange) => safely(ex)(explorer))
    server.setExecutor(pool)
    server.start()
    this
  }

  /** Read-only web explorer — the analogue of the reference's
    * factstore-explorer SPA (factstore-explorer/README.md: store browsing,
    * tag/subject/time queries, SSE live streaming, dark mode), served as a
    * single static asset from the jar over the same public REST API. The
    * bare "/" context only matches paths no API context claims. */
  private def explorer(ex: HttpExchange): Unit = {
    val path = ex.getRequestURI.getPath
    // HEAD mirrors GET (headers + status, no body) — health checks and load
    // balancers routinely probe HEAD / and must not see a 404.
    val head = ex.getRequestMethod == "HEAD"
    val method = if (head) "GET" else ex.getRequestMethod
    (method, path) match {
      case ("GET", "/") =>
        ex.getResponseHeaders.set("Location", "/explorer/")
        ex.sendResponseHeaders(302, -1)
      case ("GET", "/explorer" | "/explorer/" | "/explorer/index.html") =>
        serveResource(ex, "/explorer/index.html", "text/html; charset=utf-8", head)
      case ("GET", "/openapi.json" | "/q/openapi") =>
        // machine-readable API description — parity with the reference's
        // quarkus-smallrye-openapi /q/openapi (factstore-server/
        // build.gradle.kts:20); static because the surface is static
        serveResource(ex, "/openapi.json", "application/json", head)
      case ("GET", "/q/health" | "/q/health/ready") =>
        // SmallRye-Health-shaped readiness (reference deployments get
        // /q/health from the Quarkus platform for free): UP only if the
        // store catalog is reachable — the one dependency a deployment's
        // readiness gate must cover. 503 + DOWN on failure, like SmallRye.
        health(ex, ready = true, head)
      case ("GET", "/q/health/live") =>
        health(ex, ready = false, head)
      case ("GET", "/q/metrics") =>
        metrics(ex, head)
      case _ => sendError(ex, 404, "not_found", path)
    }
  }

  private val startedAtNanos = System.nanoTime()
  private val requestsTotal = new java.util.concurrent.atomic.AtomicLong(0)

  /** Prometheus text exposition (reference deployments get /q/metrics from
    * quarkus-micrometer for free): process gauges plus, when the backing
    * store is the Spark engine, the metadata-only per-store diagnostics
    * (head position, commit-suffix depth, data/index bytes — storeStats
    * never scans data, so scraping stays cheap at any store size). */
  private def metrics(ex: HttpExchange, head: Boolean): Unit = {
    val sb = new StringBuilder
    def gauge(name: String, help: String, rows: Seq[(String, Long)]): Unit = {
      sb.append(s"# HELP $name $help\n# TYPE $name gauge\n")
      rows.foreach { case (labels, v) => sb.append(s"$name$labels $v\n") }
    }
    gauge("graft_uptime_seconds", "Seconds since server start",
      Seq(("", (System.nanoTime() - startedAtNanos) / 1000000000L)))
    sb.append("# HELP graft_http_requests_total Requests handled\n")
    sb.append("# TYPE graft_http_requests_total counter\n")
    sb.append(s"graft_http_requests_total ${requestsTotal.get()}\n")
    val stores = store.listStores()
    gauge("graft_stores", "Stores in the catalog", Seq(("", stores.size.toLong)))
    store match {
      case s: graft.store.SparkFactStore =>
        val stats = stores.flatMap(md => s.storeStats(md.name).map(md.name -> _))
        def per(metric: String, help: String, f: s.StoreStats => Long): Unit =
          gauge(metric, help, stats.map { case (n, st) => (s"""{store="$n"}""", f(st)) })
        per("graft_store_head_position", "Head position (= facts stored)", _.headPosition)
        per("graft_store_commit_suffix", "Uncompacted commit records", _.commitSuffix.toLong)
        per("graft_store_buckets", "Compacted data buckets", _.nBuckets.toLong)
        per("graft_store_data_bytes", "On-disk data bytes", _.dataBytes)
        per("graft_store_index_bytes", "Bloom + entry-index bytes", _.indexBytes)
      case _ => ()
    }
    val bytes = sb.toString.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "text/plain; version=0.0.4; charset=utf-8")
    if (head) { ex.sendResponseHeaders(200, -1); () }
    else {
      ex.sendResponseHeaders(200, bytes.length.toLong)
      val os = ex.getResponseBody
      try os.write(bytes) finally os.close()
    }
  }

  /** Health report in the SmallRye/MicroProfile shape
    * ({"status","checks":[{name,status,data}]}): liveness is process-up;
    * readiness additionally probes the store catalog (listStores), the
    * backing dependency. */
  private def health(ex: HttpExchange, ready: Boolean, head: Boolean): Unit = {
    val o = mapper.createObjectNode()
    val checks = mapper.createArrayNode()
    val live = mapper.createObjectNode()
    live.put("name", "graft-server-live"); live.put("status", "UP")
    checks.add(live)
    var up = true
    if (ready) {
      val cat = mapper.createObjectNode()
      cat.put("name", "store-catalog")
      try {
        val n = store.listStores().size
        cat.put("status", "UP")
        cat.putObject("data").put("stores", n)
      } catch {
        case e: Throwable =>
          up = false
          cat.put("status", "DOWN")
          cat.putObject("data").put("error", String.valueOf(e.getMessage))
      }
      checks.add(cat)
    }
    o.put("status", if (up) "UP" else "DOWN")
    o.set[ObjectNode]("checks", checks)
    val code = if (up) 200 else 503
    if (head) { ex.sendResponseHeaders(code, -1); () }
    else send(ex, code, o)
  }

  /** Serve a classpath resource (GET body or HEAD headers-only). */
  private def serveResource(ex: HttpExchange, resource: String,
      contentType: String, head: Boolean): Unit = {
    val in = getClass.getResourceAsStream(resource)
    if (in == null) sendError(ex, 404, "not_found", resource)
    else {
      val bytes = try in.readAllBytes() finally in.close()
      ex.getResponseHeaders.set("Content-Type", contentType)
      if (head) ex.sendResponseHeaders(200, -1)
      else {
        ex.sendResponseHeaders(200, bytes.length.toLong)
        val os = ex.getResponseBody
        os.write(bytes); os.close()
      }
    }
  }

  /** Reference InfoService.GetServerInfo parity (factstore-v1.proto:423-433). */
  private def info(ex: HttpExchange): Unit = {
    val o = mapper.createObjectNode()
    o.put("app", "graft")
    o.put("version", "0.1.0")
    o.put("storage_backend", "spark-parquet-log")
    send(ex, 200, o)
  }

  def stop(): Unit = { server.stop(0); pool.shutdown() }

  // --- routing ---------------------------------------------------------------

  private def route(ex: HttpExchange): Unit = {
    val path = ex.getRequestURI.getPath.stripPrefix("/api/v1/stores")
    val segs = path.split('/').filter(_.nonEmpty).toList
    (ex.getRequestMethod, segs) match {
      case ("POST", Nil)           => createStore(ex)
      case ("GET", Nil)            => listStores(ex)
      case ("GET", name :: Nil)    => getStore(ex, name)
      case ("HEAD", name :: Nil)   => headStore(ex, name)
      case ("DELETE", name :: Nil) => deleteStore(ex, name)
      case ("POST", s :: "facts" :: Nil)          => append(ex, s)
      case ("GET", s :: "facts" :: Nil)           => queryFacts(ex, s)
      case ("POST", s :: "facts" :: "query" :: Nil) => tagQuery(ex, s)
      case ("GET", s :: "facts" :: "replay" :: Nil) => replay(ex, s)
      case ("GET", s :: "facts" :: "subscribe" :: Nil) => subscribe(ex, s)
      case ("GET", s :: "facts" :: id :: Nil)     => findById(ex, s, id)
      // subjects are routinely URI-shaped ("order/1", reference README
      // quick-start) and the JDK server decodes %2F before we split — so
      // the subject is everything between /subjects/ and the trailing /facts
      case ("GET", s :: "subjects" :: rest) if rest.length >= 2 && rest.last == "facts" =>
        bySubject(ex, s, rest.dropRight(1).mkString("/"))
      case _ => sendError(ex, 404, "not_found", path)
    }
  }

  private def safely(ex: HttpExchange)(f: HttpExchange => Unit): Unit =
    try { requestsTotal.incrementAndGet(); f(ex) }
    catch {
      case e: IllegalArgumentException => sendError(ex, 400, "invalid_request", e.getMessage)
      // an unparseable request body is the caller's error, not ours
      case e: com.fasterxml.jackson.core.JacksonException =>
        sendError(ex, 400, "invalid_request", String.valueOf(e.getOriginalMessage))
      case e: Throwable => sendError(ex, 500, "internal", String.valueOf(e.getMessage))
    } finally ex.close()

  // --- store management ------------------------------------------------------

  private def createStore(ex: HttpExchange): Unit = {
    val name = body(ex).path("name").asText("")
    store.createStore(name) match {
      case CreateStoreResult.Created(md) => send(ex, 201, storeJson(md))
      case CreateStoreResult.NameAlreadyExists => sendError(ex, 409, "name_already_exists", name)
      case CreateStoreResult.InvalidName(n) => sendError(ex, 400, "invalid_store_name", n)
    }
  }

  private def listStores(ex: HttpExchange): Unit = {
    val arr = mapper.createArrayNode()
    store.listStores().foreach(md => arr.add(storeJson(md)))
    send(ex, 200, arr)
  }

  private def getStore(ex: HttpExchange, name: String): Unit =
    store.findStoreByName(name) match {
      case Some(md) => send(ex, 200, storeJson(md))
      case None => sendError(ex, 404, "store_not_found", name)
    }

  private def headStore(ex: HttpExchange, name: String): Unit = {
    ex.sendResponseHeaders(if (store.storeExists(name)) 200 else 404, -1)
  }

  private def deleteStore(ex: HttpExchange, name: String): Unit =
    store.removeStore(name) match {
      case RemoveStoreResult.StoreRemoved => ex.sendResponseHeaders(204, -1)
      case RemoveStoreResult.StoreNotFound => sendError(ex, 404, "store_not_found", name)
    }

  // --- append ----------------------------------------------------------------

  private def append(ex: HttpExchange, storeName: String): Unit = {
    val b = body(ex)
    val facts = asSeq(b.path("facts")).map(parseFactInput)
    require(facts.nonEmpty, "facts must be a non-empty array")
    val key = Option(b.get("idempotencyKey")).map(_.asText())
      .getOrElse(java.util.UUID.randomUUID().toString)
    val condition = parseCondition(b.get("condition"))
    store.append(AppendRequest(storeName, facts, key, condition)) match {
      case AppendResult.Appended(ids, at) =>
        val o = mapper.createObjectNode()
        val arr = o.putArray("factIds"); ids.foreach(arr.add)
        o.put("appendedAt", at.toString)
        send(ex, 200, o)
      case AppendResult.AlreadyApplied => sendError(ex, 409, "already_applied", key)
      case AppendResult.AppendConditionViolated =>
        sendError(ex, 409, "append_condition_violated", "")
      case AppendResult.StoreNotFound => sendError(ex, 404, "store_not_found", storeName)
    }
  }

  private def parseFactInput(n: JsonNode): FactInput =
    FactInput(
      factType = n.path("type").asText(""),
      subject = n.path("subject").asText(""),
      payloadData = Base64.getDecoder.decode(n.path("data").asText("")),
      payloadFormat = optText(n, "format"),
      payloadSchema = optText(n, "schema"),
      metadata = asMap(n.get("metadata")),
      tags = asMap(n.get("tags")))

  /** Jackson node -> AppendCondition; `type` discriminators mirror the
    * reference's polymorphic DTOs (http/api.kt:35-77). */
  private def parseCondition(n: JsonNode): AppendCondition =
    if (n == null || n.isNull) AppendCondition.None
    else n.path("type").asText("none") match {
      case "none" => AppendCondition.None
      case "expectedLastFact" =>
        AppendCondition.ExpectedLastFact(
          n.path("subject").asText(""),
          optText(n, "expectedLastFactId"))
      case "all" =>
        AppendCondition.All(asSeq(n.path("conditions")).map(parseCondition))
      case "tagQueryBased" =>
        AppendCondition.TagQueryBased(parseTagQuery(n.path("query")), optText(n, "after"))
      case other => throw new IllegalArgumentException(s"unknown condition type: $other")
    }

  private def parseTagQuery(n: JsonNode): TagQuery =
    TagQuery(asSeq(n.path("items")).map { item =>
      val tags = asMap(item.get("tags"))
      if (item.has("types"))
        TagQueryItem.TagType(asSeq(item.path("types")).map(_.asText()).toSet, tags)
      else TagQueryItem.TagOnly(tags)
    })

  // --- queries ---------------------------------------------------------------

  private def queryFacts(ex: HttpExchange, s: String): Unit = {
    val q = params(ex)
    val tags = q.getOrElse("tag", Nil).map { t =>
      t.split("=", 2) match {
        case Array(k, v) => k -> v
        case Array(k) => k -> ""
      }
    }.toMap
    val from = q.get("from").flatMap(_.headOption).map(java.time.Instant.parse)
    val to = q.get("to").flatMap(_.headOption).map(java.time.Instant.parse)
    val limit = q.get("limit").flatMap(_.headOption).map(_.toInt)
      .filter(_ > 0).map(Limit.Of(_): Limit).getOrElse(Limit.None)
    val dir = q.get("direction").flatMap(_.headOption) match {
      case Some("backward") => ReadDirection.Backward
      case _ => ReadDirection.Forward
    }
    if (tags.nonEmpty && (from.nonEmpty || to.nonEmpty))
      // reference QueryResource.kt:74-78: combining not supported -> 400
      sendError(ex, 400, "unsupported_query",
        "combining tags with a time range is not yet supported")
    else if (tags.nonEmpty)
      sendFind(ex, s, store.findByTags(s, tags, limit, dir))
    else
      sendFind(ex, s, store.findInTimeRange(s, TimeRange(from, to), limit, dir))
  }

  private def tagQuery(ex: HttpExchange, s: String): Unit =
    sendFind(ex, s, store.findByTagQuery(s, parseTagQuery(body(ex))))

  private def findById(ex: HttpExchange, s: String, id: String): Unit =
    store.findById(s, id) match {
      case FindByIdResult.Found(f) => send(ex, 200, factJson(f))
      case FindByIdResult.NotFound => sendError(ex, 404, "fact_not_found", id)
      case FindByIdResult.StoreNotFound => sendError(ex, 404, "store_not_found", s)
    }

  private def bySubject(ex: HttpExchange, s: String, subject: String): Unit = {
    val q = params(ex)
    val limit = q.get("limit").flatMap(_.headOption).map(_.toInt)
      .filter(_ > 0).map(Limit.Of(_): Limit).getOrElse(Limit.None)
    val dir = q.get("direction").flatMap(_.headOption) match {
      case Some("backward") => ReadDirection.Backward
      case _ => ReadDirection.Forward
    }
    sendFind(ex, s, store.findBySubject(s, subject, limit, dir))
  }

  /** Streamed-fact framing: NDJSON by default; Server-Sent Events when the
    * client asks for `text/event-stream` (the reference streams SSE with
    * JSON elements, StreamResource.kt:7-8,25,43 — an `EventSource` client
    * can point here unchanged). */
  private sealed trait Framing {
    def contentType: String
    def write(os: java.io.OutputStream, id: String, json: Array[Byte]): Unit
  }
  private object NdjsonFraming extends Framing {
    val contentType = "application/x-ndjson"
    def write(os: java.io.OutputStream, id: String, json: Array[Byte]): Unit = {
      os.write(json); os.write('\n')
    }
  }
  private object SseFraming extends Framing {
    val contentType = "text/event-stream"
    /** Each event carries `id: <factId>` so an auto-reconnecting
      * EventSource client resends it as `Last-Event-ID` and resumes
      * exactly after the last fact it saw (reference SSE surface:
      * StreamResource.kt:23-63). */
    def write(os: java.io.OutputStream, id: String, json: Array[Byte]): Unit = {
      os.write("id: ".getBytes(UTF_8)); os.write(id.getBytes(UTF_8)); os.write('\n')
      os.write("data: ".getBytes(UTF_8)); os.write(json)
      os.write('\n'); os.write('\n')
    }
  }
  private def framingFor(ex: HttpExchange): Framing = {
    val accept = Option(ex.getRequestHeaders.getFirst("Accept")).getOrElse("")
    if (accept.contains("text/event-stream")) SseFraming else NdjsonFraming
  }

  private def replay(ex: HttpExchange, s: String): Unit = {
    val q = params(ex)
    val after = q.get("after").flatMap(_.headOption)
    // ?limit=N closes the stream after N facts — with `after` this is
    // cursor pagination in position order (page k+1 = after last id of
    // page k), the shape the explorer's Browse pager uses. Bounded here
    // so a page request never drains the whole log over the wire.
    val limit = q.get("limit").flatMap(_.headOption).map(_.toLong).getOrElse(Long.MaxValue)
    require(limit > 0, "limit must be positive")
    val start = after.fold(ReplayStart.Beginning: ReplayStart)(ReplayStart.After(_))
    store.replay(s, start) match {
      case Left(StreamError.StoreNotFound) => sendError(ex, 404, "store_not_found", s)
      case Left(StreamError.FactIdNotFound(id)) => sendError(ex, 404, "after_fact_not_found", id)
      case Right(batches) =>
        val framing = framingFor(ex)
        ex.getResponseHeaders.set("Content-Type", framing.contentType)
        ex.sendResponseHeaders(200, 0)
        val os = ex.getResponseBody
        var sent = 0L
        batches.takeWhile(_ => sent < limit).foreach { batch =>
          batch.foreach { f =>
            if (sent < limit) {
              framing.write(os, f.id, mapper.writeValueAsBytes(factJson(f)))
              sent += 1
            }
          }
          os.flush()
        }
        os.close()
    }
  }

  /** Live tail as chunked NDJSON (the reference's SSE subscribe,
    * StreamResource.kt:23-63). `?from=beginning|end`, `?after=factId`;
    * `?max=N` closes after N facts (otherwise streams until the client
    * disconnects, like the never-completing reference Flow). */
  private def subscribe(ex: HttpExchange, s: String): Unit = {
    val q = params(ex)
    // EventSource auto-reconnect resends the last seen `id:` as the
    // Last-Event-ID header; it wins over the original query params so a
    // reconnecting client receives exactly the delta, not a replay.
    val lastEventId = Option(ex.getRequestHeaders.getFirst("Last-Event-ID"))
      .map(_.trim).filter(_.nonEmpty)
    val start = lastEventId.map(StartPosition.After(_))
      .orElse(q.get("after").flatMap(_.headOption).map(StartPosition.After(_)))
      .getOrElse(if (q.get("from").flatMap(_.headOption).contains("end")) StartPosition.End
      else StartPosition.Beginning)
    val max = q.get("max").flatMap(_.headOption).map(_.toLong).getOrElse(Long.MaxValue)
    store.subscribe(s, start) match {
      case Left(StreamError.StoreNotFound) => sendError(ex, 404, "store_not_found", s)
      case Left(StreamError.FactIdNotFound(id)) => sendError(ex, 404, "after_fact_not_found", id)
      case Right(sub) =>
        val framing = framingFor(ex)
        ex.getResponseHeaders.set("Content-Type", framing.contentType)
        ex.sendResponseHeaders(200, 0)
        val os = ex.getResponseBody
        var sent = 0L
        try {
          while (sent < max && sub.hasNext) {
            sub.next().foreach { f =>
              if (sent < max) {
                framing.write(os, f.id, mapper.writeValueAsBytes(factJson(f)))
                sent += 1
              }
            }
            os.flush()
          }
        } catch { case _: java.io.IOException => () /* client went away */ }
        finally { sub.close(); os.close() }
    }
  }

  private def sendFind(ex: HttpExchange, s: String, r: FindResult): Unit = r match {
    case FindResult.Found(fs) =>
      val arr = mapper.createArrayNode()
      fs.foreach(f => arr.add(factJson(f)))
      send(ex, 200, arr)
    case FindResult.StoreNotFound => sendError(ex, 404, "store_not_found", s)
  }

  // --- JSON helpers ----------------------------------------------------------

  private def storeJson(md: StoreMetadata): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("id", md.id); o.put("name", md.name); o.put("createdAt", md.createdAt.toString)
    o
  }

  private def factJson(f: Fact): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("id", f.id)
    o.put("type", f.factType)
    o.put("subject", f.subject)
    o.put("position", f.position)
    o.put("appendedAt", f.appendedAt.toString)
    o.put("data", Base64.getEncoder.encodeToString(f.payloadData))
    f.payloadFormat.foreach(o.put("format", _))
    f.payloadSchema.foreach(o.put("schema", _))
    val m = o.putObject("metadata"); f.metadata.foreach { case (k, v) => m.put(k, v) }
    val t = o.putObject("tags"); f.tags.foreach { case (k, v) => t.put(k, v) }
    o
  }

  private def body(ex: HttpExchange): JsonNode =
    mapper.readTree(new String(ex.getRequestBody.readAllBytes(), UTF_8) match {
      case "" => "{}"
      case s => s
    })

  private def asSeq(n: JsonNode): Seq[JsonNode] =
    if (n == null || !n.isArray) Seq.empty
    else (0 until n.size).map(n.get)

  private def asMap(n: JsonNode): Map[String, String] =
    if (n == null || !n.isObject) Map.empty
    else {
      val it = n.properties().iterator()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asText() }
      b.result()
    }

  private def optText(n: JsonNode, field: String): Option[String] =
    Option(n.get(field)).filterNot(_.isNull).map(_.asText())

  private def params(ex: HttpExchange): Map[String, List[String]] = {
    val raw = Option(ex.getRequestURI.getRawQuery).getOrElse("")
    raw.split('&').filter(_.nonEmpty).toList
      .map { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => dec(k) -> dec(v)
          case Array(k) => dec(k) -> ""
        }
      }
      .groupMap(_._1)(_._2)
  }

  private def dec(s: String): String = java.net.URLDecoder.decode(s, UTF_8)

  private def send(ex: HttpExchange, code: Int, node: JsonNode): Unit = {
    val bytes = mapper.writeValueAsBytes(node)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    // a HEAD exchange must not carry a body: writing one makes the JDK
    // server log a warning and throw, and the throw would double-fault
    // through safely's catch into a second sendResponseHeaders
    if (ex.getRequestMethod == "HEAD") ex.sendResponseHeaders(code, -1)
    else {
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
    }
  }

  private def sendError(ex: HttpExchange, code: Int, error: String, detail: String): Unit = {
    val o = mapper.createObjectNode()
    o.put("error", error); o.put("detail", detail)
    send(ex, code, o)
  }
}
