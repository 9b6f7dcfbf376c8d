package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface: after Corpus.registerViews, plain spark.sql can use
  * the corpus tables and the engine's native kernels together. */
class CorpusSqlSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("spark.sql over registered views with native kernels") {
    val s = spark
    Corpus.registerViews(s, sf)

    // native hash kernel through SQL
    val hashed = s.sql(
      "SELECT doc_id, char_hash(text) AS h FROM documents WHERE lang = 'en' LIMIT 5")
      .collect()
    assert(hashed.nonEmpty && hashed.forall(r => r.getLong(1) >= 0))

    // a join across views with an aggregate
    val topNations = s.sql(
      """SELECT n_name, count(*) AS n_cust
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name ORDER BY n_cust DESC, n_name LIMIT 3""").collect()
    assert(topNations.length == 3 && topNations.forall(_.getLong(1) > 0))

    // vector kernel over the embeddings view
    val norm = s.sql(
      "SELECT vec_id, vec_norm2(embedding) AS n2 FROM embeddings ORDER BY vec_id LIMIT 1")
      .collect()
    assert(norm.length == 1 && norm(0).getDouble(1) > 0.0)

    // the nanos events view is readable and filterable in SQL
    val ev = s.sql(
      "SELECT count(*) AS n FROM events WHERE event_type = 'purchase'").collect()
    assert(ev(0).getLong(0) > 0)
  }
}
