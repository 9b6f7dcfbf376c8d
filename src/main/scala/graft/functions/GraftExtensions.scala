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
  }
}
