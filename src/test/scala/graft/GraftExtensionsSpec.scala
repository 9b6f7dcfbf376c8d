package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The config-injected extension must resolve vec_dot/vec_norm2 in plain
  * SQL with no imperative registration call. */
class GraftExtensionsSpec extends AnyFunSuite {
  test("spark.sql.extensions=GraftExtensions registers the vector functions") {
    val shared = SparkTestSession.spark // own the SparkContext for the run
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    // clear so getOrCreate builds a sibling session (same context) that
    // actually applies the extensions config
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // withExtensions = the programmatic twin of spark.sql.extensions
      // (the config form only applies when the SparkContext is fresh,
      // e.g. under spark-submit; tests share one context)
      val withExt = SparkSession.builder()
        .master(shared.sparkContext.master)
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      assert(withExt ne shared)
      val r = withExt.sql(
        "SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d, " +
          "vec_norm2(array(3.0D, 4.0D)) AS n").collect().head
      assert(r.getDouble(0) == 11.0)
      assert(r.getDouble(1) == 25.0)
      // text-hash kernels resolve in plain SQL too
      val t = withExt.sql(
        "SELECT char_hash('ab') AS h, size(word_hashes('a b c')) AS nw, " +
          "size(shingle_hashes(word_hashes('a b c d'))) AS ns, " +
          "simhash60(array(1L, 2L, 3L)) AS sh, size(minhash_sig(array(1L))) AS nm")
        .collect().head
      assert(t.getLong(0) == (('a'.toLong * 31 + 'b') % 1000000007L))
      assert(t.getInt(1) == 3 && t.getInt(2) == 2 && t.getInt(4) == 16)
    } finally {
      // do NOT stop the sibling (it shares the context); restore sessions
      prevDefault.fold(SparkSession.clearDefaultSession())(SparkSession.setDefaultSession)
      prevActive.fold(SparkSession.clearActiveSession())(SparkSession.setActiveSession)
    }
  }
}
