package graft

import org.scalatest.funsuite.AnyFunSuite

/** The user-facing corpus facade: register() must yield a SQL-ready
  * catalog (views through the encoding-resilient reader, native kernels
  * registered), and the CLI analyze surface must expose the full
  * inventory. */
class CorpusSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("register: plain spark.sql works over every view, with NTZ temporal columns") {
    val s = spark
    Corpus.registerViews(s, sf)
    val joined = s.sql(
      """SELECT o_orderpriority, count(*) AS n, sum(l_quantity) AS qty
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         GROUP BY o_orderpriority""").collect()
    assert(joined.nonEmpty)
    assert(s.table("events").schema("ts").dataType.typeName == "timestamp_ntz")
    assert(s.table("orders").schema("o_orderdate").dataType.typeName == "timestamp_ntz")
    // the registered native kernels are callable from ad-hoc SQL
    val h = s.sql("SELECT char_hash(text) AS h FROM documents LIMIT 5").collect()
    assert(h.length == 5 && h.forall(!_.isNullAt(0)))
  }

  test("query: runs any inventory entry and rejects unknown names") {
    assert(Corpus.query(spark, sf, "q1_pricing_summary").count() > 0)
    val e = intercept[IllegalArgumentException](Corpus.query(spark, sf, "nope"))
    assert(e.getMessage.contains("unknown query"))
    assert(Corpus.queryNames.size == SparkEntry.queries.size)
  }

  test("CLI analyze list/run expose the inventory from the shell") {
    def captured(args: String*): String = {
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(out)) { Cli.main(args.toArray) }
      out.toString("UTF-8")
    }
    val list = captured("analyze", "list")
    assert(list.linesIterator.size == SparkEntry.queries.size)
    assert(list.contains("dedup_minhash_lsh") && list.contains("q1_pricing_summary"))

    val run = captured("analyze", "run", "q1_pricing_summary", "--data", sf, "--limit", "3")
    val lines = run.linesIterator.toSeq
    assert(lines.head.split("\t").contains("l_returnflag"), s"missing header: ${lines.head}")
    assert(lines.size >= 2 && lines.size <= 4, s"limit not applied: ${lines.size} lines")

    val json = captured("analyze", "run", "fs_head_position", "--data", sf, "--json")
    assert(json.contains("\"head_position\""), s"json mode broken: $json")
  }
}
