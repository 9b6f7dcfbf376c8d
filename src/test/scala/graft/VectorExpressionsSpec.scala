package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions

/** VecDot/VecNorm2 unit behavior: codegen and interpreted paths agree,
  * float arrays promote to double per-element, nulls propagate, and the
  * accumulation order matches the CrossHash fold (left-to-right). */
class VectorExpressionsSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkTestSession.spark
    VectorFunctions.register(s)
    s
  }

  test("dot and norm on float arrays (exact double promotion)") {
    val r = spark.sql(
      "SELECT vec_dot(array(cast(1.5 as float), cast(2.0 as float)), " +
        "array(cast(2.0 as float), cast(0.5 as float))) AS d, " +
        "vec_norm2(array(cast(3.0 as float), cast(4.0 as float))) AS n").collect().head
    assert(r.getDouble(0) == 4.0)
    assert(r.getDouble(1) == 25.0)
  }

  test("mixed float/double operands and mismatched lengths (min-length semantics)") {
    val r = spark.sql(
      "SELECT vec_dot(array(cast(2.0 as float)), array(3.0D, 99.0D)) AS d").collect().head
    assert(r.getDouble(0) == 6.0)
  }

  test("null inputs propagate null") {
    val r = spark.sql(
      "SELECT vec_dot(cast(null as array<double>), array(1.0D)) AS a, " +
        "vec_norm2(cast(null as array<float>)) AS b").collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("minhash_sig on empty input is null, not [Long.MaxValue x 16] (codegen path)") {
    graft.functions.TextHashFunctions.register(spark)
    val r = spark.sql(
      "SELECT minhash_sig(array()) AS empty, " +
        "minhash_sig(cast(null as array<bigint>)) AS nul, " +
        "size(minhash_sig(array(7L))) AS k").collect().head
    assert(r.isNullAt(0), "empty shingle set must have no signature")
    assert(r.isNullAt(1), "null input must propagate null")
    assert(r.getInt(2) == 16)
  }

  test("minhash_sig on empty input is null (interpreted eval path)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val expr = graft.functions.MinhashSig(
      BoundReference(0, ArrayType(LongType, containsNull = false), nullable = true))
    assert(expr.nullable, "expression must declare nullability for the empty case")
    assert(expr.eval(InternalRow(new GenericArrayData(Array.empty[Long]))) == null)
    assert(expr.eval(InternalRow(null)) == null)
    val sig = expr.eval(InternalRow(new GenericArrayData(Array(7L))))
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(sig.numElements() == 16)
    assert(sig.toLongArray().forall(_ != Long.MaxValue))
  }

  test("interpreted eval matches codegen (forced via aggregation buffer path)") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    val viaSql = df.selectExpr("vec_dot(a, b) AS d").collect().head.getDouble(0)
    // same accumulation order as the CrossHash fold used by the oracles
    val expected = (1.0 * 4.0) + (2.0 * 5.0) + (3.0 * 6.0)
    assert(viaSql == expected)
    val fold = df.selectExpr(
      graft.functions.CrossHash.dotSpark("a", "b", 3) + " AS d").collect().head.getDouble(0)
    assert(fold == viaSql)
  }
}
