package graft

import java.nio.file.Paths
import java.time.Instant

import org.apache.spark.sql.SparkSession

import graft.core._
import graft.store.SparkFactStore

/** Command-line surface mirroring the reference CLI
  * (factstore-cli/src/main/kotlin/io/factstore/cli/command/, README
  * defaults `--limit 100 --direction forward`):
  *
  * {{{
  *   graft.Cli --root DIR store create NAME
  *   graft.Cli --root DIR store list
  *   graft.Cli --root DIR store remove NAME
  *   graft.Cli --root DIR store compact NAME [--full]
  *   graft.Cli --root DIR store stats NAME
  *   graft.Cli --root DIR store janitor NAME [--grace-ms N]
  *   graft.Cli --root DIR fact append STORE TYPE SUBJECT DATA [k=v ...]
  *   graft.Cli --root DIR fact find-by-id STORE ID
  *   graft.Cli --root DIR fact find-by-subject STORE SUBJECT [--limit N] [--direction d]
  *   graft.Cli --root DIR fact find-by-tags STORE k=v[,k=v] [--limit N] [--direction d]
  *   graft.Cli --root DIR fact find-in-time-range STORE [--from ISO] [--to ISO] [--limit N] [--direction d]
  *   graft.Cli --root DIR fact replay STORE [--after ID]
  *   graft.Cli --root DIR fact subscribe STORE [--from beginning|end] [--after ID] [--max N]
  *   graft.Cli --root DIR serve [--http-port N] [--grpc-port N]
  *   graft.Cli --backend memory serve [...]   (non-persistent in-JVM engine, no Spark)
  *   graft.Cli analyze list
  *   graft.Cli analyze run QUERY --data DIR [--limit N] [--json]
  * }}}
  *
  * Every data command also runs in WIRE MODE against a remote server:
  * `--server host:port` replaces `--root DIR` and routes the same commands
  * over gRPC via [[graft.client.GrpcClient]] — no Spark on the client
  * (reference capability: factstore-cli over factstore-client-kotlin).
  * Positions print as 0 in wire mode (the proto Fact carries none).
  */
object Cli {

  private def fail(msg: String): Nothing = { System.err.println(msg); sys.exit(2) }

  def main(args: Array[String]): Unit = {
    val (flags, pos) = parseArgs(args.toList)
    pos match {
      // analytics surface: run any inventory query from the shell —
      //   graft.Cli analyze list
      //   graft.Cli analyze run QUERY --data DIR [--limit N] [--json]
      // (local engine only; leaves the session for the JVM shutdown hook,
      // so a shared test session is never torn down underneath its suite)
      case "analyze" :: rest =>
        analyze(rest, flags)
        return
      case _ => ()
    }
    flags.get("server") match {
      case Some(hostPort) =>
        // wire mode: drive a REMOTE graft (or reference-compatible) server
        // over gRPC — no Spark on the client side (reference capability:
        // factstore-cli + factstore-client-kotlin)
        val (host, port) = hostPort.split(":", 2) match {
          case Array(h, p) if p.forall(_.isDigit) && p.nonEmpty => (h, p.toInt)
          case _ => fail(s"--server expects host:port, got '$hostPort'")
        }
        val client = new graft.client.GrpcClient(host, port)
        try run(client, flags, pos)
        finally client.close()
      case None =>
        // config-selected storage backend, the reference's
        // FactStoreProvider shape (factstore-server config/
        // FactStoreProvider.kt:23: memory vs FoundationDB by
        // configuration, pinned by FactStoreConfigurationTest). `memory`
        // boots the non-persistent in-JVM engine with NO Spark session —
        // the wire servers take the FactStore trait, so `serve` (and any
        // data command) runs identically on either backend.
        flags.getOrElse("backend", "spark") match {
          case "memory" =>
            if (flags.contains("root"))
              System.err.println("note: --backend memory is non-persistent; --root is ignored")
            run(new graft.memory.MemoryFactStore(), flags, pos)
          case "spark" =>
            val root = flags.getOrElse("root",
              fail("--root DIR (local engine) or --server host:port (wire mode) is required"))
            val spark = SparkSession.builder()
              .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
              .config("spark.sql.shuffle.partitions", "4")
              .config("spark.sql.session.timeZone", "UTC")
              .config("spark.ui.enabled", "false")
              .getOrCreate()
            spark.sparkContext.setLogLevel("ERROR")
            val fs = new SparkFactStore(spark, Paths.get(root))
            try run(fs, flags, pos)
            finally spark.stop()
          case other => fail(s"--backend must be 'memory' or 'spark', got '$other'")
        }
    }
  }

  private def run(fs: FactStore, flags: Map[String, String], pos: List[String]): Unit = {
    val limit = flags.get("limit").map(_.toInt).filter(_ > 0)
      .map(Limit.Of(_): Limit).getOrElse(Limit.Of(100))
    val dir = flags.get("direction") match {
      case Some("backward") => ReadDirection.Backward
      case _ => ReadDirection.Forward
    }
    pos match {
      case "store" :: "create" :: name :: Nil => println(fs.createStore(name))
      case "store" :: "list" :: Nil =>
        fs.listStores().foreach(md => println(s"${md.id}\t${md.name}\t${md.createdAt}"))
      case "store" :: "remove" :: name :: Nil => println(fs.removeStore(name))
      // maintenance (local engine only — not part of the wire protocol)
      case "store" :: "compact" :: name :: Nil => fs match {
        case s: SparkFactStore =>
          val full = flags.contains("full") // rewrite carried buckets too
          println(s"compacted ${s.compact(name, vacuum = true, full = full)} commits")
        case _ => fail("store compact requires the spark backend (--root DIR)")
      }
      case "store" :: "stats" :: name :: Nil => fs match {
        case s: SparkFactStore => s.storeStats(name) match {
          case Some(st) =>
            println(s"facts=${st.nFacts} head=${st.headPosition} " +
              s"commitSuffix=${st.commitSuffix} checkpointSeq=${st.checkpointSeq.getOrElse(-1L)} " +
              s"buckets=${st.nBuckets} dataBytes=${st.dataBytes} indexBytes=${st.indexBytes}")
          case None => fail(s"store not found: $name")
        }
        case _ => fail("store stats requires the spark backend (--root DIR)")
      }
      case "store" :: "janitor" :: name :: Nil => fs match {
        case s: SparkFactStore =>
          val grace = flags.get("grace-ms").map(_.toLong).getOrElse(3600000L)
          s.janitor(name, grace) match {
            case Some(n) => println(s"removed $n abandoned artifacts")
            case None => fail(s"store not found: $name")
          }
        case _ => fail("store janitor requires the spark backend (--root DIR)")
      }
      case "fact" :: "append" :: store :: tpe :: subject :: data :: rest =>
        val tags = rest.map(kv => kv.split("=", 2) match {
          case Array(k, v) => k -> v
          case Array(k) => k -> ""
        }).toMap
        println(fs.append(store, FactInput(tpe, subject, data.getBytes("UTF-8"), tags = tags)))
      case "fact" :: "find-by-id" :: store :: id :: Nil =>
        println(render(fs.findById(store, id)))
      case "fact" :: "find-by-subject" :: store :: subject :: Nil =>
        printFacts(fs.findBySubject(store, subject, limit, dir))
      case "fact" :: "find-by-tags" :: store :: tags :: Nil =>
        val m = tags.split(',').map(kv => kv.split("=", 2) match {
          case Array(k, v) => k -> v
          case Array(k) => k -> ""
        }).toMap
        printFacts(fs.findByTags(store, m, limit, dir))
      case "fact" :: "find-in-time-range" :: store :: Nil =>
        val range = TimeRange(flags.get("from").map(Instant.parse),
          flags.get("to").map(Instant.parse))
        printFacts(fs.findInTimeRange(store, range, limit, dir))
      case "fact" :: "replay" :: store :: Nil =>
        val start = flags.get("after").fold(ReplayStart.Beginning: ReplayStart)(ReplayStart.After(_))
        fs.replay(store, start) match {
          case Left(e) => fail(e.toString)
          case Right(it) => it.foreach(_.foreach(f => println(line(f))))
        }
      case "fact" :: "subscribe" :: store :: Nil =>
        val start = flags.get("after").map(StartPosition.After(_))
          .getOrElse(if (flags.get("from").contains("end")) StartPosition.End
          else StartPosition.Beginning)
        val max = flags.get("max").map(_.toLong).getOrElse(Long.MaxValue)
        fs.subscribe(store, start) match {
          case Left(e) => fail(e.toString)
          case Right(sub) =>
            var n = 0L
            while (n < max && sub.hasNext) {
              // bound inside the batch too — a 1000-fact catch-up batch
              // must not blow through --max 5
              sub.next().foreach { f => if (n < max) { println(line(f)); n += 1 } }
            }
            sub.close()
        }
      case "serve" :: Nil =>
        // run both wire surfaces against one engine (reference server boots
        // HTTP + gRPC side by side)
        val rest = new graft.server.RestServer(fs,
          flags.get("http-port").map(_.toInt).getOrElse(8080)).start()
        val grpc = new graft.server.grpc.GrpcServer(fs,
          flags.get("grpc-port").map(_.toInt).getOrElse(9000)).start()
        println(s"graft serving REST on :${rest.boundPort} and gRPC on :${grpc.boundPort}")
        Thread.currentThread().join() // serve until interrupted
      case other => fail(s"unknown command: ${other.mkString(" ")}")
    }
  }

  private def analyze(pos: List[String], flags: Map[String, String]): Unit =
    pos match {
      case "list" :: Nil =>
        Corpus.queryNames.foreach(println)
      case "run" :: name :: Nil =>
        val dir = flags.getOrElse("data", fail("analyze run requires --data DIR"))
        if (!SparkEntry.queries.contains(name))
          fail(s"unknown query '$name' — see: graft.Cli analyze list")
        val spark = SparkSession.builder()
          .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
          .config("spark.sql.shuffle.partitions", "4")
          .config("spark.sql.session.timeZone", "UTC")
          .config("spark.ui.enabled", "false")
          .getOrCreate()
        spark.sparkContext.setLogLevel("ERROR")
        val limit = flags.get("limit").map(_.toInt).getOrElse(100)
        val out = Corpus.query(spark, dir, name).limit(limit)
        if (flags.contains("json")) out.toJSON.collect().foreach(println)
        else {
          println(out.columns.mkString("\t"))
          out.collect().foreach(r =>
            println(r.toSeq.map(v => if (v == null) "NULL" else v.toString).mkString("\t")))
        }
        graft.operators.CacheScope.releaseAll()
      case other => fail(s"unknown analyze command: ${other.mkString(" ")}")
    }

  private def render(r: FindByIdResult): String = r match {
    case FindByIdResult.Found(f) => line(f)
    case other => other.toString
  }

  private def printFacts(r: FindResult): Unit = r match {
    case FindResult.Found(fs) => fs.foreach(f => println(line(f)))
    case other => fail(other.toString)
  }

  private def line(f: Fact): String =
    s"${f.position}\t${f.id}\t${f.factType}\t${f.subject}\t${f.appendedAt}\t" +
      f.tags.map { case (k, v) => s"$k=$v" }.mkString(",")

  /** `--flag value` pairs, bare `--flag` booleans (mapped to "true"), and
    * positional args. */
  private def parseArgs(args: List[String]): (Map[String, String], List[String]) = {
    val flags = Map.newBuilder[String, String]
    val pos = List.newBuilder[String]
    var rest = args
    while (rest.nonEmpty) rest match {
      case f :: v :: tail if f.startsWith("--") && !v.startsWith("--") =>
        flags += f.drop(2) -> v; rest = tail
      case f :: tail if f.startsWith("--") => flags += f.drop(2) -> "true"; rest = tail
      case a :: tail => pos += a; rest = tail
      case Nil => ()
    }
    (flags.result(), pos.result())
  }
}
