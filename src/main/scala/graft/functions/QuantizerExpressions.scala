package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native codegen'd nearest-centroid assignment for the learned quantizers
  * (operators/Similarity.scala). The codebook is embedded in the expression
  * (driver-collected — bounded by M·K entries, the same smallness argument
  * as a broadcast build), so assignment/encode is ONE tight generated loop
  * per row: no (row × entry) join rows, no shuffle, no interpreted
  * higher-order functions in the hot path.
  *
  * Determinism contract (shared with the DuckDB oracle):
  *  - score is the SHIFTED L2 `n2(c) − 2·⟨x,c⟩` — the n2(x) term is
  *    constant within one row's argmin and is dropped identically on both
  *    engines (IEEE addition is not exact, so both must drop it);
  *  - the dot accumulates in index order, `acc += (double)x_i · c_i` —
  *    bit-identical to the VecDot fold and to the oracle's list_reduce;
  *  - n2(c) is precomputed with the same index-ordered fold;
  *  - entries are sorted by code ascending and compared with strict `<`,
  *    so exact ties keep the lowest code — the oracle's
  *    `ORDER BY dist, code` tie-break.
  */
private[graft] object QuantizerCodebook {
  /** (codes sorted asc per subspace, code-major flattened centroids,
    * precomputed squared norms). Indexed by subspace id `m`. */
  final case class Entries(
      codes: Array[Array[Int]], cvs: Array[Array[Double]], n2s: Array[Array[Double]],
      subDim: Int)
}

private[graft] trait QuantizerCodegen { self: BinaryExpression =>
  protected def cb: QuantizerCodebook.Entries

  protected def elemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  protected def get(arr: ArrayData, i: Int): Double = elemType match {
    case FloatType  => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case other => throw new IllegalArgumentException(s"$prettyName: unsupported element type $other")
  }

  protected def getterJava(arr: String, i: String): String = elemType match {
    case FloatType  => s"(double) $arr.getFloat($i)"
    case DoubleType => s"$arr.getDouble($i)"
    case other => throw new IllegalArgumentException(s"$prettyName: unsupported element type $other")
  }

  // keep giant codebook arrays out of plan strings
  override def toString: String = s"$prettyName(${left.toString}, ${right.toString})"
  override def sql: String = s"$prettyName(${left.sql}, ${right.sql})"
}

/** Code of the nearest codebook entry for the row's (sub)vector in
  * subspace `m` (pass a literal 0 for a single-codebook quantizer). */
case class NearestCode(left: Expression, right: Expression,
    cb: QuantizerCodebook.Entries)
    extends BinaryExpression with QuantizerCodegen {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "quantizer_nearest_code"

  override protected def nullSafeEval(v: Any, m: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val mi = m.asInstanceOf[Int]
    val codes = cb.codes(mi); val cvs = cb.cvs(mi); val n2s = cb.n2s(mi)
    var best = Double.PositiveInfinity
    var bestC = -1
    var j = 0
    while (j < codes.length) {
      var acc = 0.0
      val off = j * cb.subDim
      var i = 0
      while (i < cb.subDim) { acc += get(arr, i) * cvs(off + i); i += 1 }
      val s = n2s(j) - 2 * acc
      if (s < best) { best = s; bestC = codes(j) }
      j += 1
    }
    bestC
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val codesRef = ctx.addReferenceObj("qcodes", cb.codes, "int[][]")
    val cvsRef = ctx.addReferenceObj("qcvs", cb.cvs, "double[][]")
    val n2sRef = ctx.addReferenceObj("qn2s", cb.n2s, "double[][]")
    nullSafeCodeGen(ctx, ev, (v, m) => {
      val (codes, cvs, n2s) = (ctx.freshName("codes"), ctx.freshName("cvs"), ctx.freshName("n2s"))
      val (best, bestC, j, i, acc, off, s) = (ctx.freshName("best"), ctx.freshName("bestC"),
        ctx.freshName("j"), ctx.freshName("i"), ctx.freshName("acc"), ctx.freshName("off"),
        ctx.freshName("s"))
      s"""
         |int[] $codes = $codesRef[$m]; double[] $cvs = $cvsRef[$m]; double[] $n2s = $n2sRef[$m];
         |double $best = Double.POSITIVE_INFINITY;
         |int $bestC = -1;
         |for (int $j = 0; $j < $codes.length; $j++) {
         |  double $acc = 0.0;
         |  int $off = $j * ${cb.subDim};
         |  for (int $i = 0; $i < ${cb.subDim}; $i++) {
         |    $acc += ${getterJava(v, i)} * $cvs[$off + $i];
         |  }
         |  double $s = $n2s[$j] - 2 * $acc;
         |  if ($s < $best) { $best = $s; $bestC = $codes[$j]; }
         |}
         |${ev.value} = $bestC;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCode =
    copy(left = newLeft, right = newRight)
}

/** Codes of the TWO nearest entries (multi-assignment / probe-2), ordered
  * (best, second); a single-entry codebook yields a 1-element array. Tie
  * discipline matches `ORDER BY dist, code` (strict `<` in code order). */
case class NearestTwoCodes(left: Expression, right: Expression,
    cb: QuantizerCodebook.Entries)
    extends BinaryExpression with QuantizerCodegen {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "quantizer_nearest_two"

  override protected def nullSafeEval(v: Any, m: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val mi = m.asInstanceOf[Int]
    val codes = cb.codes(mi); val cvs = cb.cvs(mi); val n2s = cb.n2s(mi)
    var d1 = Double.PositiveInfinity; var c1 = -1
    var d2 = Double.PositiveInfinity; var c2 = -1
    var j = 0
    while (j < codes.length) {
      var acc = 0.0
      val off = j * cb.subDim
      var i = 0
      while (i < cb.subDim) { acc += get(arr, i) * cvs(off + i); i += 1 }
      val s = n2s(j) - 2 * acc
      if (s < d1) { d2 = d1; c2 = c1; d1 = s; c1 = codes(j) }
      else if (s < d2) { d2 = s; c2 = codes(j) }
      j += 1
    }
    if (c2 == -1) new GenericArrayData(Array(c1)) else new GenericArrayData(Array(c1, c2))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val codesRef = ctx.addReferenceObj("qcodes", cb.codes, "int[][]")
    val cvsRef = ctx.addReferenceObj("qcvs", cb.cvs, "double[][]")
    val n2sRef = ctx.addReferenceObj("qn2s", cb.n2s, "double[][]")
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, (v, m) => {
      val (codes, cvs, n2s) = (ctx.freshName("codes"), ctx.freshName("cvs"), ctx.freshName("n2s"))
      val (d1, c1, d2, c2, j, i, acc, off, s) = (ctx.freshName("d1"), ctx.freshName("c1"),
        ctx.freshName("d2"), ctx.freshName("c2"), ctx.freshName("j"), ctx.freshName("i"),
        ctx.freshName("acc"), ctx.freshName("off"), ctx.freshName("s"))
      s"""
         |int[] $codes = $codesRef[$m]; double[] $cvs = $cvsRef[$m]; double[] $n2s = $n2sRef[$m];
         |double $d1 = Double.POSITIVE_INFINITY; int $c1 = -1;
         |double $d2 = Double.POSITIVE_INFINITY; int $c2 = -1;
         |for (int $j = 0; $j < $codes.length; $j++) {
         |  double $acc = 0.0;
         |  int $off = $j * ${cb.subDim};
         |  for (int $i = 0; $i < ${cb.subDim}; $i++) {
         |    $acc += ${getterJava(v, i)} * $cvs[$off + $i];
         |  }
         |  double $s = $n2s[$j] - 2 * $acc;
         |  if ($s < $d1) { $d2 = $d1; $c2 = $c1; $d1 = $s; $c1 = $codes[$j]; }
         |  else if ($s < $d2) { $d2 = $s; $c2 = $codes[$j]; }
         |}
         |${ev.value} = ($c2 == -1) ? new $gad(new int[]{$c1}) : new $gad(new int[]{$c1, $c2});
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestTwoCodes =
    copy(left = newLeft, right = newRight)
}

/** The k nearest codebook entries in rank order — the generalization of
  * [[NearestTwoCodes]] the round-9 verdict's dedup-blocking fix needs
  * (3-cell multi-assignment recovers boundary-straddling near-dup pairs
  * that best-two misses; measured 0.71 → 0.93 recall at sf0.1). Ties
  * resolve to the LOWER code: insertion uses strict `<` and codes are
  * scanned in ascending order, mirroring the oracle's
  * `ORDER BY dist, cell`. One codegen'd pass, k-slot insertion — k is a
  * compile-time constant embedded in the generated loop. */
case class NearestKCodes(left: Expression, right: Expression,
    cb: QuantizerCodebook.Entries, k: Int)
    extends BinaryExpression with QuantizerCodegen {
  require(k >= 1, "k must be positive")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = s"quantizer_nearest_$k"

  override protected def nullSafeEval(v: Any, m: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val mi = m.asInstanceOf[Int]
    val codes = cb.codes(mi); val cvs = cb.cvs(mi); val n2s = cb.n2s(mi)
    val bd = Array.fill(k)(Double.PositiveInfinity)
    val bc = Array.fill(k)(-1)
    var j = 0
    while (j < codes.length) {
      var acc = 0.0
      val off = j * cb.subDim
      var i = 0
      while (i < cb.subDim) { acc += get(arr, i) * cvs(off + i); i += 1 }
      val s = n2s(j) - 2 * acc
      if (s < bd(k - 1)) {
        var t = k - 1
        while (t > 0 && s < bd(t - 1)) { bd(t) = bd(t - 1); bc(t) = bc(t - 1); t -= 1 }
        bd(t) = s; bc(t) = codes(j)
      }
      j += 1
    }
    var nv = 0
    while (nv < k && bc(nv) != -1) nv += 1
    new GenericArrayData(bc.take(nv))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val codesRef = ctx.addReferenceObj("qcodes", cb.codes, "int[][]")
    val cvsRef = ctx.addReferenceObj("qcvs", cb.cvs, "double[][]")
    val n2sRef = ctx.addReferenceObj("qn2s", cb.n2s, "double[][]")
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, (v, m) => {
      val (codes, cvs, n2s) = (ctx.freshName("codes"), ctx.freshName("cvs"), ctx.freshName("n2s"))
      val (bd, bc, j, i, t, acc, off, s, nv, out) = (ctx.freshName("bd"), ctx.freshName("bc"),
        ctx.freshName("j"), ctx.freshName("i"), ctx.freshName("t"), ctx.freshName("acc"),
        ctx.freshName("off"), ctx.freshName("s"), ctx.freshName("nv"), ctx.freshName("out"))
      s"""
         |int[] $codes = $codesRef[$m]; double[] $cvs = $cvsRef[$m]; double[] $n2s = $n2sRef[$m];
         |double[] $bd = new double[$k]; int[] $bc = new int[$k];
         |for (int $t = 0; $t < $k; $t++) { $bd[$t] = Double.POSITIVE_INFINITY; $bc[$t] = -1; }
         |for (int $j = 0; $j < $codes.length; $j++) {
         |  double $acc = 0.0;
         |  int $off = $j * ${cb.subDim};
         |  for (int $i = 0; $i < ${cb.subDim}; $i++) {
         |    $acc += ${getterJava(v, i)} * $cvs[$off + $i];
         |  }
         |  double $s = $n2s[$j] - 2 * $acc;
         |  if ($s < $bd[$k - 1]) {
         |    int $t = $k - 1;
         |    while ($t > 0 && $s < $bd[$t - 1]) { $bd[$t] = $bd[$t - 1]; $bc[$t] = $bc[$t - 1]; $t--; }
         |    $bd[$t] = $s; $bc[$t] = $codes[$j];
         |  }
         |}
         |int $nv = 0;
         |while ($nv < $k && $bc[$nv] != -1) $nv++;
         |int[] $out = new int[$nv];
         |System.arraycopy($bc, 0, $out, 0, $nv);
         |${ev.value} = new $gad($out);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestKCodes =
    copy(left = newLeft, right = newRight)
}
