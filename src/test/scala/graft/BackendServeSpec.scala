package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.util.Base64

import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.memory.MemoryFactStore
import graft.server.RestServer
import graft.server.grpc.GrpcServer

/** Config-selected storage backend behind the wire servers — the
  * reference's FactStoreProvider contract (factstore-server
  * config/FactStoreProvider.kt:23 picks memory vs FoundationDB by
  * configuration; FactStoreConfigurationTest pins it). Both servers take
  * the `FactStore` trait, so `Cli --backend memory serve` boots them on
  * the non-persistent in-JVM engine with no Spark session; this spec is
  * the smoke for that wiring — full REST/gRPC behavior coverage lives in
  * RestServerSpec/GrpcServerSpec against the Spark backend, and the
  * engines themselves share AbstractFactStoreSpec. */
class BackendServeSpec extends AnyFunSuite {

  private def b64(s: String) = Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))

  private def post(c: HttpClient, url: String, json: String): HttpResponse[String] =
    c.send(HttpRequest.newBuilder(URI.create(url))
      .POST(HttpRequest.BodyPublishers.ofString(json)).build(),
      HttpResponse.BodyHandlers.ofString())
  private def get(c: HttpClient, url: String): HttpResponse[String] =
    c.send(HttpRequest.newBuilder(URI.create(url)).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  test("REST server serves the memory backend: lifecycle, append, find, health, metrics") {
    val srv = new RestServer(new MemoryFactStore()).start()
    try {
      val c = HttpClient.newHttpClient()
      val base = s"http://127.0.0.1:${srv.boundPort}/api/v1"
      assert(post(c, s"$base/stores", """{"name":"orders"}""").statusCode() == 201)
      assert(post(c, s"$base/stores", """{"name":"orders"}""").statusCode() == 409)
      val r = post(c, s"$base/stores/orders/facts",
        s"""{"facts":[{"type":"ORDER_PLACED","subject":"order/1",
            "data":"${b64("""{"total":9}""")}","tags":{"region":"eu"}}]}""")
      assert(r.statusCode() == 200 && r.body().contains("factIds"))
      val found = get(c, s"$base/stores/orders/facts?tag=region=eu")
      assert(found.statusCode() == 200 && found.body().contains("ORDER_PLACED"))
      val health = get(c, s"http://127.0.0.1:${srv.boundPort}/q/health")
      assert(health.statusCode() == 200 && health.body().contains("\"UP\""))
      // per-store Spark gauges degrade away; the common gauges remain
      val metrics = get(c, s"http://127.0.0.1:${srv.boundPort}/q/metrics")
      assert(metrics.statusCode() == 200 && metrics.body().contains("graft_stores 1"))
      assert(!metrics.body().contains("graft_store_head_position"))
    } finally srv.stop()
  }

  test("gRPC server serves the memory backend: append + findById round-trip") {
    val srv = new GrpcServer(new MemoryFactStore()).start()
    val client = new graft.client.GrpcClient("127.0.0.1", srv.boundPort)
    try {
      assert(client.createStore("orders").isInstanceOf[CreateStoreResult.Created])
      val id = client.append("orders",
        FactInput("ORDER_PLACED", "order/1", "p".getBytes("UTF-8"))) match {
        case AppendResult.Appended(ids, _) => ids.head
        case other => fail(s"$other")
      }
      client.findById("orders", id) match {
        case FindByIdResult.Found(fact) => assert(fact.factType == "ORDER_PLACED")
        case other => fail(s"$other")
      }
    } finally { client.close(); srv.stop() }
  }
}
