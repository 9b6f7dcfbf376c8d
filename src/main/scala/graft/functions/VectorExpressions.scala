package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector kernels (SURVEY §8 scale
  * notes): the ANN/dedup hot path is a dot product over `Array[Float]`
  * embeddings, which as a SQL higher-order fold runs interpreted
  * (CodegenFallback, no common-subexpression elimination). These
  * expressions generate a tight Java loop via `doGenCode`, keeping the
  * kernel inside whole-stage codegen — same strict index-order double
  * accumulation as CrossHash's fold builders, so results stay bit-identical
  * to the DuckDB oracle.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  private def get(arr: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType  => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case LongType   => arr.getLong(i).toDouble
    case IntegerType => arr.getInt(i).toDouble
    case other => throw new IllegalArgumentException(s"vec_dot: unsupported element type $other")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (aa, bb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (ta, tb) = (elemType(left), elemType(right))
    val n = math.min(aa.numElements(), bb.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += get(aa, i, ta) * get(bb, i, tb); i += 1 }
    acc
  }

  private def getterJava(t: DataType, arr: String, i: String): String = t match {
    case FloatType   => s"(double) $arr.getFloat($i)"
    case DoubleType  => s"$arr.getDouble($i)"
    case LongType    => s"(double) $arr.getLong($i)"
    case IntegerType => s"(double) $arr.getInt($i)"
    case other => throw new IllegalArgumentException(s"vec_dot: unsupported element type $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${getterJava(elemType(left), a, i)} * ${getterJava(elemType(right), b, i)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 norm — `vec_dot(a, a)` without evaluating the child twice. */
case class VecNorm2(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_norm2"

  private def elemType: DataType = child.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var acc = 0.0
    var i = 0
    elemType match {
      case FloatType  => while (i < n) { val x = arr.getFloat(i).toDouble; acc += x * x; i += 1 }
      case DoubleType => while (i < n) { val x = arr.getDouble(i); acc += x * x; i += 1 }
      case other => throw new IllegalArgumentException(s"vec_norm2: unsupported element type $other")
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      val getter = elemType match {
        case FloatType  => s"(double) $a.getFloat($i)"
        case DoubleType => s"$a.getDouble($i)"
        case other => throw new IllegalArgumentException(s"vec_norm2: unsupported element type $other")
      }
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $getter;
         |  $acc += $x * $x;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecNorm2 =
    copy(child = newChild)
}

object VectorFunctions {
  /** Idempotently register `vec_dot` / `vec_norm2` in the session's function
    * registry so `expr("vec_dot(a, b)")` resolves — callable from any query
    * builder regardless of which session the driver hands us. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("vec_dot",
      exprs => VecDot(exprs.head, exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("vec_norm2",
      exprs => VecNorm2(exprs.head), "scala_udf")
  }
}
