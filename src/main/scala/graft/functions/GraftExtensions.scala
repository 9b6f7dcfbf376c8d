package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Spark-native deployment hook: inject the engine's functions into any
  * session via configuration —
  *
  * {{{
  *   spark.sql.extensions=graft.functions.GraftExtensions
  * }}}
  *
  * so `SELECT vec_dot(a, b)` works in plain `spark.sql` on a cluster
  * without any imperative registration call. (`VectorFunctions.register`
  * remains for sessions we receive already-built.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (exprs: Seq[Expression]) => VecDot(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("vec_norm2"),
      new ExpressionInfo(classOf[VecNorm2].getName, "vec_norm2"),
      (exprs: Seq[Expression]) => VecNorm2(exprs.head)))
    // text-hash kernels (round 2): same codegen'd expressions the operator
    // modules register imperatively
    ext.injectFunction((
      FunctionIdentifier("char_hash"),
      new ExpressionInfo(classOf[CharHash].getName, "char_hash"),
      (exprs: Seq[Expression]) => CharHash(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("word_hashes"),
      new ExpressionInfo(classOf[WordHashes].getName, "word_hashes"),
      (exprs: Seq[Expression]) => WordHashes(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (exprs: Seq[Expression]) => ShingleHashes(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("simhash60"),
      new ExpressionInfo(classOf[Simhash60].getName, "simhash60"),
      (exprs: Seq[Expression]) => Simhash60(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinhashSig].getName, "minhash_sig"),
      (exprs: Seq[Expression]) => MinhashSig(exprs.head)))
  }
}
