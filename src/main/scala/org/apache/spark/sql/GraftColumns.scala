package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge for building `Column`s from custom catalyst `Expression`s that
  * carry embedded (non-SQL) constructor state — e.g. a driver-collected
  * quantizer codebook. The SQL FunctionRegistry can only thread child
  * expressions through, so expressions with object state must be wrapped
  * directly; the classic converter that does this lives behind
  * `private[sql]`, hence this one-file shim in the sql package. */
object GraftColumns {
  def of(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expr(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
