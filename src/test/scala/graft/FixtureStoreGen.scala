package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths}
import java.util.Base64

import graft.core._
import graft.store.{SparkFactStore, Timestamps}

/** One-shot generator for the committed on-disk-format fixture store.
  *
  * Run (only when the layout changes INTENTIONALLY):
  *   sbt "Test/runMain graft.FixtureStoreGen"
  *
  * Writes `src/test/resources/fixtures/store_v10/` — a small store
  * exercising every physical artifact of the current layout: catalog
  * entry, commit log records (single + batch + idempotency keys),
  * checkpoint/compaction output (explicit compact after commit 7),
  * post-compaction commits, entry-index sidecars and blooms — plus
  * `expected.tsv`, the facts the store must replay, recorded at
  * generation time. FormatCompatSpec opens the fixture with CURRENT code
  * and must read it back exactly: a layout change that orphans existing
  * stores fails that spec instead of silently corrupting deployments. */
object FixtureStoreGen {
  private def b64(b: Array[Byte]): String = Base64.getEncoder.encodeToString(b)
  private def mapStr(m: Map[String, String]): String =
    m.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(",")

  def main(args: Array[String]): Unit = {
    val out = Paths.get(args.headOption.getOrElse("src/test/resources/fixtures/store_v10"))
    if (Files.exists(out)) {
      import scala.jdk.CollectionConverters._
      Files.walk(out).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
    Files.createDirectories(out)
    val spark = SparkTestSession.spark
    val store = new SparkFactStore(spark, out, autoCompactEvery = 4)

    require(store.createStore("orders").isInstanceOf[CreateStoreResult.Created])
    def in(tp: String, subj: String, payload: String,
        tags: Map[String, String] = Map.empty,
        meta: Map[String, String] = Map.empty,
        fmt: Option[String] = None): FactInput =
      FactInput(tp, subj, payload.getBytes(UTF_8), fmt, None, meta, tags)

    // 9 appends (11 facts): crosses the autoCompactEvery=4 boundary twice,
    // so the layout includes checkpointed AND post-checkpoint commits
    store.append("orders", in("ORDER_PLACED", "order-1", """{"qty":1}""",
      tags = Map("region" -> "emea", "tier" -> "gold"), fmt = Some("JSON")))
    store.append("orders", in("ORDER_PLACED", "order-2", """{"qty":2}""",
      tags = Map("region" -> "apac")))
    store.append("orders", Seq(
      in("ORDER_UPDATED", "order-1", "upd-a", meta = Map("actor" -> "svc-a")),
      in("ORDER_UPDATED", "order-1", "upd-b", meta = Map("actor" -> "svc-b"))))
    store.append("orders", in("ORDER_SHIPPED", "order-2", "ship",
      tags = Map("region" -> "apac", "carrier" -> "fast")))
    store.append("orders", FactInput("ORDER_PLACED", "order-3",
      Array[Byte](0, 1, 2, -1, 127))) // raw non-UTF8 payload bytes
    store.append("orders", in("ORDER_CANCELLED", "order-3", "cxl",
      tags = Map("region" -> "emea")))
    store.append(AppendRequest("orders",
      Seq(in("ORDER_PLACED", "order-4", "p4")), idempotencyKey = "fixture-idem-1"))
    // checkpoint NOW (async auto-compact may not fire before JVM exit) so
    // the fixture carries the compacted layout — bucketed data files,
    // entry-index sidecars, blooms — PLUS post-checkpoint commits below
    require(store.compact("orders") > 0, "fixture compaction did not run")
    store.append("orders", in("ORDER_SHIPPED", "order-1", "ship1",
      tags = Map("region" -> "emea", "carrier" -> "slow")))
    store.append("orders", in("ORDER_AUDITED", "order-4", "audit",
      meta = Map("auditor" -> "bot"), tags = Map("tier" -> "gold")))

    // manifest from a full replay — what round-N+1 code must reproduce
    val facts = store.replay("orders", ReplayStart.Beginning)
      .fold(e => sys.error(e.toString), it => it.flatten.toSeq)
    val lines = facts.map { f =>
      Seq(f.position.toString, f.id, f.factType, f.subject,
        Timestamps.toNanos(f.appendedAt).toString, b64(f.payloadData),
        f.payloadFormat.getOrElse(""), f.payloadSchema.getOrElse(""),
        mapStr(f.metadata), mapStr(f.tags)).mkString("\t")
    }
    Files.write(out.resolve("expected.tsv"),
      lines.mkString("", "\n", "\n").getBytes(UTF_8))
    // Spark leaves _SUCCESS / .crc droppings; drop them so the fixture is
    // only the format-bearing files (and prove the store doesn't need them)
    import scala.jdk.CollectionConverters._
    Files.walk(out).iterator().asScala.toSeq
      .filter(p => p.getFileName.toString == "_SUCCESS" ||
        p.getFileName.toString.endsWith(".crc"))
      .foreach(Files.delete)
    println(s"fixture written: $out (${facts.size} facts)")
  }
}
