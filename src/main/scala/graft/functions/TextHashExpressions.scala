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

  /** Rolling k-window span hashes from word hashes — the generalized
    * shingle: acc = ((…(w_i·31 + w_{i+1}) % P)·31 + …) over k words,
    * mod-P each step (same combine discipline as [[shingleHashes]], and
    * as the SQL/DuckDB span renderings). The HOF rendering
    * (`transform(sequence(...), i -> <k chained element_at>)`) runs
    * interpreted with no CSE and re-evaluates its input per element —
    * measured 7.5 s of a 9.8 s query at sf0.1; this loop is one codegen'd
    * pass. Empty output for fewer than k words. */
  def spanHashes(wh: ArrayData, k: Int): ArrayData = {
    val n = wh.numElements()
    val m = math.max(n - (k - 1), 0)
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      var acc = wh.getLong(i)
      var j = 1
      while (j < k) {
        acc = (acc * 31 + wh.getLong(i + j)) % P
        j += 1
      }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }
}

object TextHash60 {
  /** 60-bit SimHash signature straight from the shingle-hash array: per
    * feature f = h + (((A2*h + B2) mod P) << 30), count ones per bit,
    * strict majority (2*ones > n) sets the bit. One pass per doc — the
    * relational rendering (explode + 60 conditional sums) shuffles 60
    * aggregate columns; this stays inside one codegen'd projection. */
  def simhash60(sh: ArrayData): Long = {
    val n = sh.numElements()
    val counts = new Array[Int](CrossHash.SimhashBits)
    var i = 0
    while (i < n) {
      val h = sh.getLong(i)
      val f = h + (((CrossHash.Simhash2A * h + CrossHash.Simhash2B) % CrossHash.P) << 30)
      var b = 0
      while (b < CrossHash.SimhashBits) {
        counts(b) += ((f >>> b) & 1L).toInt
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < CrossHash.SimhashBits) {
      if (2 * counts(b) > n) sig |= 1L << b
      b += 1
    }
    sig
  }
}

case class Simhash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"
  override protected def nullSafeEval(input: Any): Any =
    TextHash60.simhash60(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash60.simhash60($c)")
  override protected def withNewChildInternal(newChild: Expression): Simhash60 =
    copy(child = newChild)
}

object TextHashMinhash {
  private val as: Array[Long] = CrossHash.MinhashPerms.map(_._1).toArray
  private val bs: Array[Long] = CrossHash.MinhashPerms.map(_._2).toArray

  /** 16-permutation MinHash signature in ONE pass over the shingle set.
    * The SQL rendering is 16 separate `array_min(transform(sh, ...))`
    * lambdas — 16 interpreted scans of the array with no CSE. Same pinned
    * (a*x + b) mod P permutations, so values match the oracle exactly.
    *
    * An empty shingle set has no MinHash signature — returns null rather
    * than `[Long.MaxValue × 16]`, which would silently band-match every
    * other empty document. Call sites additionally filter empty docs
    * before signing (belt and braces). */
  def minhashSig(sh: ArrayData): ArrayData = {
    val n = sh.numElements()
    if (n == 0) return null
    val k = as.length
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val x = sh.getLong(i)
      var j = 0
      while (j < k) {
        val v = (as(j) * x + bs(j)) % CrossHash.P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

case class MinhashSig(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // null for empty input, regardless of child nullability
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"
  override protected def nullSafeEval(input: Any): Any =
    TextHashMinhash.minhashSig(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.TextHashMinhash.minhashSig($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
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

case class SpanHashes(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "span_hashes"
  override protected def nullSafeEval(wh: Any, k: Any): Any =
    TextHash.spanHashes(wh.asInstanceOf[ArrayData], k.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, k) => s"graft.functions.TextHash.spanHashes($a, $k)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SpanHashes =
    copy(left = newLeft, right = newRight)
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
    reg.createOrReplaceTempFunction("span_hashes",
      exprs => SpanHashes(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("simhash60",
      exprs => Simhash60(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("minhash_sig",
      exprs => MinhashSig(exprs.head), "scala_udf")
  }
}
