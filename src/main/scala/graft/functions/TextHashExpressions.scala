package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text-hash kernels. The SQL
  * renderings (`aggregate(split(text, ''), ...)` char folds and
  * `transform(tokens, ...)` word/shingle hashing) run interpreted
  * (CodegenFallback) with no common-subexpression elimination — a
  * projection referencing the content hash four times (Multimodal's
  * metadata extraction) re-hashes the full text four times per row. These
  * expressions keep the fold in a tight generated Java loop inside
  * whole-stage codegen, with bit-identical results to the SQL/DuckDB
  * renderings (same polynomial, same mod-P discipline, code-point
  * iteration like DuckDB's `unicode()`).
  */
object TextHash {
  val P: Long = CrossHash.P

  /** Polynomial code-point fold of a whole string → [0, P). */
  def charHash(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }

  /** Whitespace-token hashes: split on single spaces, drop empties, hash
    * each token — one pass, no intermediate token array. */
  def wordHashes(s: UTF8String): ArrayData = {
    val str = s.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    val n = str.length
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || str.charAt(i) == ' ') {
        if (i > start) {
          var acc = 0L
          var j = start
          while (j < i) {
            val cp = str.codePointAt(j)
            acc = (acc * 31 + cp) % P
            j += Character.charCount(cp)
          }
          out += acc
        }
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Word-3gram shingle hashes from word hashes: ((a*31+b)*31+c) % P.
    * Values stay < 2^40 before the mod — exact in int64 (CrossHash's
    * numeric-safety envelope). Empty output for fewer than 3 words. */
  def shingleHashes(wh: ArrayData): ArrayData = {
    val n = wh.numElements()
    val m = math.max(n - 2, 0)
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      out(i) = ((wh.getLong(i) * 31 + wh.getLong(i + 1)) * 31 + wh.getLong(i + 2)) % P
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class CharHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "char_hash"
  override protected def nullSafeEval(input: Any): Any =
    TextHash.charHash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.charHash($c)")
  override protected def withNewChildInternal(newChild: Expression): CharHash =
    copy(child = newChild)
}

case class WordHashes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_hashes"
  override protected def nullSafeEval(input: Any): Any =
    TextHash.wordHashes(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.wordHashes($c)")
  override protected def withNewChildInternal(newChild: Expression): WordHashes =
    copy(child = newChild)
}

case class ShingleHashes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"
  override protected def nullSafeEval(input: Any): Any =
    TextHash.shingleHashes(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.shingleHashes($c)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object TextHashFunctions {
  /** Idempotently register the text-hash expressions (same mechanism as
    * [[VectorFunctions.register]]). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("char_hash",
      exprs => CharHash(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("word_hashes",
      exprs => WordHashes(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("shingle_hashes",
      exprs => ShingleHashes(exprs.head), "scala_udf")
  }
}
