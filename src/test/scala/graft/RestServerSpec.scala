package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files
import java.util.Base64

import org.scalatest.funsuite.AnyFunSuite

import graft.server.RestServer
import graft.store.SparkFactStore

/** HTTP integration tests mirroring the reference's server suite shapes
  * (StoreResource / AppendResource / QueryResource tests). */
class RestServerSpec extends AnyFunSuite {

  private def withServer(body: (String, HttpClient) => Unit): Unit = {
    val fs = new SparkFactStore(SparkTestSession.spark, Files.createTempDirectory("graft-rest-"))
    val srv = new RestServer(fs).start()
    try body(s"http://127.0.0.1:${srv.boundPort}/api/v1", HttpClient.newHttpClient())
    finally srv.stop()
  }

  private def post(c: HttpClient, url: String, json: String): HttpResponse[String] =
    c.send(HttpRequest.newBuilder(URI.create(url))
      .POST(HttpRequest.BodyPublishers.ofString(json)).build(),
      HttpResponse.BodyHandlers.ofString())
  private def get(c: HttpClient, url: String): HttpResponse[String] =
    c.send(HttpRequest.newBuilder(URI.create(url)).GET().build(),
      HttpResponse.BodyHandlers.ofString())
  private def delete(c: HttpClient, url: String): HttpResponse[String] =
    c.send(HttpRequest.newBuilder(URI.create(url)).DELETE().build(),
      HttpResponse.BodyHandlers.ofString())
  private def getSse(c: HttpClient, url: String): HttpResponse[String] =
    c.send(HttpRequest.newBuilder(URI.create(url))
      .header("Accept", "text/event-stream").GET().build(),
      HttpResponse.BodyHandlers.ofString())

  private def b64(s: String) = Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))

  test("store lifecycle over HTTP: create, duplicate 409, list, delete") {
    withServer { (base, c) =>
      assert(post(c, s"$base/stores", """{"name":"orders"}""").statusCode() == 201)
      assert(post(c, s"$base/stores", """{"name":"orders"}""").statusCode() == 409)
      assert(post(c, s"$base/stores", """{"name":"1bad"}""").statusCode() == 400)
      val list = get(c, s"$base/stores")
      assert(list.statusCode() == 200 && list.body().contains("\"orders\""))
      assert(get(c, s"$base/stores/orders").statusCode() == 200)
      assert(delete(c, s"$base/stores/orders").statusCode() == 204)
      assert(get(c, s"$base/stores/orders").statusCode() == 404)
    }
  }

  test("append + find by tags + by id (reference quick-start over HTTP)") {
    withServer { (base, c) =>
      post(c, s"$base/stores", """{"name":"orders"}""")
      val r = post(c, s"$base/stores/orders/facts",
        s"""{"facts":[{"type":"ORDER_PLACED","subject":"order/1",
            "data":"${b64("""{"total":99}""")}","tags":{"region":"eu"}}]}""")
      assert(r.statusCode() == 200 && r.body().contains("factIds"))
      val hits = get(c, s"$base/stores/orders/facts?tag=region%3Deu")
      assert(hits.statusCode() == 200 && hits.body().contains("ORDER_PLACED"))
      val id = hits.body().split("\"id\":\"")(1).split("\"")(0)
      val one = get(c, s"$base/stores/orders/facts/$id")
      assert(one.statusCode() == 200 && one.body().contains("order/1"))
    }
  }

  test("tags combined with time range is rejected with 400 (QueryResourceTest.kt:57-73)") {
    withServer { (base, c) =>
      post(c, s"$base/stores", """{"name":"s1"}""")
      val r = get(c, s"$base/stores/s1/facts?tag=a%3Db&from=2024-01-01T00:00:00Z")
      assert(r.statusCode() == 400 && r.body().contains("unsupported_query"))
    }
  }

  test("idempotency key and condition violations surface as 409s") {
    withServer { (base, c) =>
      post(c, s"$base/stores", """{"name":"s2"}""")
      val req = s"""{"facts":[{"type":"T","subject":"x","data":""}],"idempotencyKey":"k1"}"""
      assert(post(c, s"$base/stores/s2/facts", req).statusCode() == 200)
      val dup = post(c, s"$base/stores/s2/facts", req)
      assert(dup.statusCode() == 409 && dup.body().contains("already_applied"))
      val cond = post(c, s"$base/stores/s2/facts",
        """{"facts":[{"type":"T","subject":"x","data":""}],
           "condition":{"type":"expectedLastFact","subject":"x","expectedLastFactId":null}}""")
      assert(cond.statusCode() == 409 && cond.body().contains("append_condition_violated"))
    }
  }

  test("info endpoint and live subscribe stream with max-count") {
    withServer { (base, c) =>
      val i = get(c, base.stripSuffix("/v1") + "/v1/info")
      assert(i.statusCode() == 200 && i.body().contains("storage_backend"))
      post(c, s"$base/stores", """{"name":"s4"}""")
      (1 to 2).foreach { n =>
        post(c, s"$base/stores/s4/facts",
          s"""{"facts":[{"type":"T$n","subject":"x","data":""}]}""")
      }
      val sub = get(c, s"$base/stores/s4/facts/subscribe?max=2")
      val lines = sub.body().split('\n').filter(_.nonEmpty)
      assert(lines.length == 2)
      assert(lines(0).contains("\"type\":\"T1\"") && lines(1).contains("\"type\":\"T2\""))
      assert(get(c, s"$base/stores/s4/facts/subscribe?after=nope").statusCode() == 404)
    }
  }

  test("subject history and NDJSON replay") {
    withServer { (base, c) =>
      post(c, s"$base/stores", """{"name":"s3"}""")
      (1 to 3).foreach { i =>
        post(c, s"$base/stores/s3/facts",
          s"""{"facts":[{"type":"T$i","subject":"subj","data":""}]}""")
      }
      val hist = get(c, s"$base/stores/s3/facts?tag=missing%3Dx")
      assert(hist.statusCode() == 200 && hist.body() == "[]")
      val subj = get(c, s"$base/stores/s3/subjects/subj/facts?limit=2&direction=backward")
      // match the typed field — bare "T1" would also match ISO timestamps
      // like 2026-08-12T10:02 (a real time-of-day flake)
      assert(subj.body().indexOf("\"type\":\"T3\"") < subj.body().indexOf("\"type\":\"T2\""))
      assert(!subj.body().contains("\"type\":\"T1\""))
      val rep = get(c, s"$base/stores/s3/facts/replay")
      val lines = rep.body().split('\n').filter(_.nonEmpty)
      assert(lines.length == 3)
      assert(lines(0).contains("\"position\":1") && lines(2).contains("\"position\":3"))
      assert(get(c, s"$base/stores/s3/facts/replay?after=nope").statusCode() == 404)
      // tag query endpoint: OR of AND items
      val tq = post(c, s"$base/stores/s3/facts/query",
        """{"items":[{"types":["T1","T2"],"tags":{}}]}""")
      assert(tq.statusCode() == 200 &&
        tq.body().contains("\"type\":\"T1\"") && tq.body().contains("\"type\":\"T2\"") &&
        !tq.body().contains("\"type\":\"T3\""))
      // ?limit bounds the replay stream; with ?after it is cursor
      // pagination in position order (the explorer Browse pager protocol)
      val page1 = get(c, s"$base/stores/s3/facts/replay?limit=2")
        .body().split('\n').filter(_.nonEmpty)
      assert(page1.length == 2 && page1(1).contains("\"position\":2"))
      val cursor = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(page1(1)).path("id").asText()
      val page2 = get(c, s"$base/stores/s3/facts/replay?after=$cursor&limit=2")
        .body().split('\n').filter(_.nonEmpty)
      assert(page2.length == 1 && page2(0).contains("\"position\":3"))
      assert(get(c, s"$base/stores/s3/facts/replay?limit=0").statusCode() == 400)
    }
  }

  test("SSE framing on replay and subscribe (Accept: text/event-stream)") {
    withServer { (base, c) =>
      post(c, s"$base/stores", """{"name":"s5"}""")
      (1 to 2).foreach { i =>
        post(c, s"$base/stores/s5/facts",
          s"""{"facts":[{"type":"T$i","subject":"x","data":""}]}""")
      }
      // replay as SSE: id: + data:-prefixed JSON events, blank-line separated
      val rep = getSse(c, s"$base/stores/s5/facts/replay")
      assert(rep.statusCode() == 200)
      assert(rep.headers().firstValue("Content-Type").orElse("").startsWith("text/event-stream"))
      val events = rep.body().split("\n\n").filter(_.nonEmpty)
      assert(events.length == 2)
      assert(events.forall(e => e.startsWith("id: ") && e.contains("\ndata: ")))
      assert(events(0).contains("\"type\":\"T1\"") && events(1).contains("\"type\":\"T2\""))
      // live subscribe as SSE
      val sub = getSse(c, s"$base/stores/s5/facts/subscribe?max=2")
      assert(sub.headers().firstValue("Content-Type").orElse("").startsWith("text/event-stream"))
      val subEvents = sub.body().split("\n\n").filter(_.nonEmpty)
      assert(subEvents.length == 2 &&
        subEvents.forall(e => e.startsWith("id: ") && e.contains("\ndata: ")))
      // default stays NDJSON
      val nd = get(c, s"$base/stores/s5/facts/replay")
      assert(nd.headers().firstValue("Content-Type").orElse("").startsWith("application/x-ndjson"))
    }
  }

  test("URI-shaped subjects (order/1) resolve through the subjects route") {
    withServer { (base, c) =>
      post(c, s"$base/stores", """{"name":"s7"}""")
      post(c, s"$base/stores/s7/facts",
        s"""{"facts":[{"type":"OP","subject":"order/1","data":""},
                      {"type":"OP","subject":"order/2","data":""}]}""")
      // %2F and a literal slash both reach the same subject — the JDK
      // server decodes the escape before routing either way
      for (path <- Seq("order%2F1", "order/1")) {
        val r = get(c, s"$base/stores/s7/subjects/$path/facts")
        assert(r.statusCode() == 200, s"$path -> ${r.body()}")
        assert(r.body().contains("\"subject\":\"order/1\"") &&
          !r.body().contains("order/2"))
      }
    }
  }

  test("explorer SPA is served at /explorer/ and / redirects to it") {
    withServer { (base, c) =>
      val root = base.stripSuffix("/api/v1")
      val page = get(c, s"$root/explorer/")
      assert(page.statusCode() == 200)
      assert(page.headers().firstValue("Content-Type").orElse("").startsWith("text/html"))
      assert(page.body().contains("graft explorer") && page.body().contains("/api/v1"))
      val redir = c.send(HttpRequest.newBuilder(URI.create(s"$root/")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      // default HttpClient follows no redirects — see the 302 itself
      assert(redir.statusCode() == 302 &&
        redir.headers().firstValue("Location").orElse("") == "/explorer/")
      assert(get(c, s"$root/elsewhere").statusCode() == 404)
    }
  }

  test("HEAD mirrors GET on the explorer context (health checks at /)") {
    withServer { (base, c) =>
      val root = base.stripSuffix("/api/v1")
      def head(url: String): HttpResponse[String] =
        c.send(HttpRequest.newBuilder(URI.create(url))
          .method("HEAD", HttpRequest.BodyPublishers.noBody()).build(),
          HttpResponse.BodyHandlers.ofString())
      val h = head(s"$root/")
      assert(h.statusCode() == 302 &&
        h.headers().firstValue("Location").orElse("") == "/explorer/")
      val hp = head(s"$root/explorer/")
      assert(hp.statusCode() == 200 && hp.body().isEmpty)
      assert(hp.headers().firstValue("Content-Type").orElse("").startsWith("text/html"))
      assert(head(s"$root/elsewhere").statusCode() == 404)
    }
  }

  test("explorer page builds fact rows without innerHTML interpolation (stored-XSS guard)") {
    withServer { (base, c) =>
      val root = base.stripSuffix("/api/v1")
      val body = get(c, s"$root/explorer/").body()
      // the factRow builder must not template fact fields into markup —
      // textContent-only construction is the XSS containment line
      val factRowSrc = body.substring(body.indexOf("function factRow"),
        body.indexOf("function render"))
      assert(!factRowSrc.contains("innerHTML"))
      assert(factRowSrc.contains("textContent"))
    }
  }

  test("every 4xx/409 path returns a structured {error, detail} body (ApiError.kt shape)") {
    withServer { (base, c) =>
      post(c, s"$base/stores", """{"name":"es"}""")
      val seeded = s"""{"facts":[{"type":"T","subject":"x","data":""}],"idempotencyKey":"k1"}"""
      assert(post(c, s"$base/stores/es/facts", seeded).statusCode() == 200)

      // (how to fire it, expected status, expected machine-readable error code)
      val cases: Seq[(String, () => HttpResponse[String], Int, String)] = Seq(
        ("unknown api path", () => get(c, s"$base/nope"), 404, "not_found"),
        ("malformed create body", () => post(c, s"$base/stores", "{not json"), 400, "invalid_request"),
        ("duplicate store name", () => post(c, s"$base/stores", """{"name":"es"}"""), 409, "name_already_exists"),
        ("invalid store name", () => post(c, s"$base/stores", """{"name":"1bad"}"""), 400, "invalid_store_name"),
        ("get missing store", () => get(c, s"$base/stores/ghost"), 404, "store_not_found"),
        ("delete missing store", () => delete(c, s"$base/stores/ghost"), 404, "store_not_found"),
        ("append to missing store", () => post(c, s"$base/stores/ghost/facts", seeded), 404, "store_not_found"),
        ("replayed idempotency key", () => post(c, s"$base/stores/es/facts", seeded), 409, "already_applied"),
        ("violated append condition", () => post(c, s"$base/stores/es/facts",
          """{"facts":[{"type":"T","subject":"x","data":""}],
             "condition":{"type":"expectedLastFact","subject":"x","expectedLastFactId":null}}"""),
          409, "append_condition_violated"),
        ("tags combined with time range", () =>
          get(c, s"$base/stores/es/facts?tag=a%3Db&from=2024-01-01T00:00:00Z"), 400, "unsupported_query"),
        ("fact id not found", () => get(c, s"$base/stores/es/facts/no-such-id"), 404, "fact_not_found"),
        ("tag query on missing store", () => post(c, s"$base/stores/ghost/facts/query",
          """{"items":[{"types":["T"],"tags":{}}]}"""), 404, "store_not_found"),
        ("subscribe on missing store", () => get(c, s"$base/stores/ghost/facts/subscribe"), 404, "store_not_found"),
        ("replay on missing store", () => get(c, s"$base/stores/ghost/facts/replay"), 404, "store_not_found"),
        ("subscribe after unknown fact", () => get(c, s"$base/stores/es/facts/subscribe?after=nope"),
          404, "after_fact_not_found"),
        ("replay after unknown fact", () => get(c, s"$base/stores/es/facts/replay?after=nope"),
          404, "after_fact_not_found")
      )
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      for ((label, fire, status, code) <- cases) {
        val r = fire()
        assert(r.statusCode() == status, s"$label: status ${r.statusCode()} body ${r.body()}")
        val body = om.readTree(r.body())
        assert(body.hasNonNull("error") && body.has("detail"),
          s"$label: body not {error, detail}-shaped: ${r.body()}")
        assert(body.get("error").asText() == code,
          s"$label: error '${body.get("error").asText()}' != '$code'")
      }
    }
  }

  test("SSE reconnect with Last-Event-ID resumes exactly after the last seen fact") {
    withServer { (base, c) =>
      post(c, s"$base/stores", """{"name":"s6"}""")
      (1 to 4).foreach { i =>
        post(c, s"$base/stores/s6/facts",
          s"""{"facts":[{"type":"T$i","subject":"x","data":""}]}""")
      }
      // first connection sees the first two events, then "dies" (max=2
      // closes the stream server-side, like a network blip mid-tail)
      val first = getSse(c, s"$base/stores/s6/facts/subscribe?max=2")
      val firstEvents = first.body().split("\n\n").filter(_.nonEmpty)
      assert(firstEvents.length == 2 && firstEvents(1).contains("\"type\":\"T2\""))
      val lastSeenId = firstEvents(1).linesIterator
        .find(_.startsWith("id: ")).get.stripPrefix("id: ")
      // EventSource auto-reconnect: same URL, Last-Event-ID header set.
      // The header beats ?from=beginning — the client receives exactly the
      // delta (T3, T4), no replay of T1/T2.
      val second = c.send(HttpRequest.newBuilder(
          URI.create(s"$base/stores/s6/facts/subscribe?from=beginning&max=2"))
        .header("Accept", "text/event-stream")
        .header("Last-Event-ID", lastSeenId).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(second.statusCode() == 200)
      val delta = second.body().split("\n\n").filter(_.nonEmpty)
      assert(delta.length == 2)
      assert(delta(0).contains("\"type\":\"T3\"") && delta(1).contains("\"type\":\"T4\""))
      assert(!second.body().contains("\"type\":\"T1\"") &&
        !second.body().contains("\"type\":\"T2\""))
      // an unknown Last-Event-ID is a 404, same as ?after=nope
      val bad = c.send(HttpRequest.newBuilder(
          URI.create(s"$base/stores/s6/facts/subscribe"))
        .header("Last-Event-ID", "nope").GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(bad.statusCode() == 404 && bad.body().contains("after_fact_not_found"))
    }
  }

  test("GET /openapi.json: machine-readable API description covers every route") {
    withServer { (base, c) =>
      val root = base.stripSuffix("/api/v1")
      val r = get(c, s"$root/openapi.json")
      assert(r.statusCode() == 200)
      assert(r.headers().firstValue("Content-Type").orElse("").startsWith("application/json"))
      val doc = new com.fasterxml.jackson.databind.ObjectMapper().readTree(r.body())
      assert(doc.path("openapi").asText().startsWith("3."))
      val paths = doc.path("paths")
      // every implemented route is documented
      for (p <- Seq(
        "/api/v1/info", "/api/v1/stores", "/api/v1/stores/{name}",
        "/api/v1/stores/{name}/facts", "/api/v1/stores/{name}/facts/query",
        "/api/v1/stores/{name}/facts/replay", "/api/v1/stores/{name}/facts/subscribe",
        "/api/v1/stores/{name}/facts/{factId}",
        "/api/v1/stores/{name}/subjects/{subject}/facts"))
        assert(paths.has(p), s"openapi.json missing path $p")
      // the condition vocabulary is the full reference set
      val conds = doc.at("/components/schemas/AppendCondition/properties/type/enum")
      val vals = (0 until conds.size()).map(conds.get(_).asText()).toSet
      assert(vals == Set("none", "expectedLastFact", "tagQueryBased", "all"))
      // quarkus-style alias
      assert(get(c, s"$root/q/openapi").statusCode() == 200)
    }
  }

  test("GET /q/health: SmallRye-shaped liveness + store-catalog readiness") {
    withServer { (base, c) =>
      val root = base.stripSuffix("/api/v1")
      post(c, s"$base/stores", """{"name":"health-probe"}""")
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      val r = get(c, s"$root/q/health")
      assert(r.statusCode() == 200)
      val doc = m.readTree(r.body())
      assert(doc.path("status").asText() == "UP")
      val names = (0 until doc.path("checks").size())
        .map(doc.path("checks").get(_).path("name").asText()).toSet
      assert(names == Set("graft-server-live", "store-catalog"), s"got $names")
      val cat = (0 until doc.path("checks").size()).map(doc.path("checks").get(_))
        .find(_.path("name").asText() == "store-catalog").get
      assert(cat.path("data").path("stores").asInt() >= 1)
      // readiness alias and liveness-only endpoint
      assert(get(c, s"$root/q/health/ready").statusCode() == 200)
      val live = m.readTree(get(c, s"$root/q/health/live").body())
      assert(live.path("status").asText() == "UP" && live.path("checks").size() == 1)
      // HEAD probes (k8s-style) see status without a body
      val head = c.send(HttpRequest.newBuilder(URI.create(s"$root/q/health"))
        .method("HEAD", HttpRequest.BodyPublishers.noBody()).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(head.statusCode() == 200 && head.body().isEmpty)
    }
  }

  test("GET /q/metrics: Prometheus text gauges incl. per-store stats") {
    withServer { (base, c) =>
      val root = base.stripSuffix("/api/v1")
      post(c, s"$base/stores", """{"name":"metrics-probe"}""")
      val app = post(c, s"$base/stores/metrics-probe/facts",
        """{"facts":[{"type":"M","subject":"s","data":""}]}""")
      assert(app.statusCode() == 200, app.body())
      val r = get(c, s"$root/q/metrics")
      assert(r.statusCode() == 200)
      assert(r.headers().firstValue("Content-Type").orElse("").startsWith("text/plain"))
      val body = r.body()
      // process gauges + the counter that counted this very scrape
      assert(body.contains("# TYPE graft_uptime_seconds gauge"), body.take(400))
      assert(body.contains("# TYPE graft_http_requests_total counter"))
      val reqs = body.linesIterator
        .find(_.startsWith("graft_http_requests_total ")).get.split(" ")(1).toLong
      assert(reqs >= 3, s"requests counter $reqs") // create + append + scrape
      assert(body.linesIterator.exists(_.matches("graft_stores [0-9]+")))
      // Spark-backed store: metadata-only per-store diagnostics with labels
      assert(body.contains("""graft_store_head_position{store="metrics-probe"} 1"""), body)
      assert(body.contains("""graft_store_commit_suffix{store="metrics-probe"}"""))
      assert(body.contains("""graft_store_data_bytes{store="metrics-probe"}"""))
    }
  }
}
