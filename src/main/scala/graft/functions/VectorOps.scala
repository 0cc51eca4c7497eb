package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native vector arithmetic over array<double> columns — the hot inner
  * loop of similarity search and embedding dedup (SURVEY.md §7.6).
  *
  * The `functions.aggregate`/`zip_with` lambda forms are interpreted
  * (CodegenFallback) and re-walk the array per lambda — the same class
  * of slowdown measured on shingling (Dedup.shingleRows scaladoc).
  * These expressions generate a tight primitive loop via `doGenCode`,
  * and their sequential left-to-right summation is bit-identical to
  * the DuckDB oracle's list arithmetic.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $s += $a.getDouble($i) * $b.getDouble($i);
        }
        ${ev.value} = $s;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

case class L2Norm(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2_norm"

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    var s = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) { val v = x.getDouble(i); s += v * v; i += 1 }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      s"""
        int $n = $a.numElements();
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $v = $a.getDouble($i);
          $s += $v * $v;
        }
        ${ev.value} = java.lang.Math.sqrt($s);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): L2Norm =
    copy(child = newChild)
}

/** Symmetric int8 scalar quantization round-trip: per-vector scale
  * amax/127, values rounded (ties away from zero — matching SQL ROUND
  * so the DuckDB oracle reproduces it bit-for-bit), clamped to
  * ±127, dequantized back. Models the 4×-smaller ANN index layout
  * (float32→int8) and lets the reconstruction/recall cost be measured
  * in-engine; a zero vector round-trips unchanged. One codegen'd loop
  * pair — the lambda equivalent (transform + list_max) is interpreted
  * and walks the array once per lambda.
  */
case class Int8RoundTrip(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "int8_round_trip"

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    var amax = 0.0
    var i = 0
    while (i < n) { val v = math.abs(x.getDouble(i)); if (v > amax) amax = v; i += 1 }
    val scale = amax / 127.0
    val out = new Array[Double](n)
    i = 0
    while (i < n) {
      val v = x.getDouble(i)
      out(i) = if (scale > 0.0) {
        val r = v / scale
        var q = (if (r >= 0) r + 0.5 else r - 0.5).toLong
        if (q > 127L) q = 127L
        if (q < -127L) q = -127L
        q * scale
      } else v
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val amax = ctx.freshName("amax")
      val scale = ctx.freshName("scale")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      val r = ctx.freshName("r")
      val q = ctx.freshName("q")
      s"""
        int $n = $a.numElements();
        double $amax = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $v = java.lang.Math.abs($a.getDouble($i));
          if ($v > $amax) $amax = $v;
        }
        double $scale = $amax / 127.0;
        double[] $out = new double[$n];
        for (int $i = 0; $i < $n; $i++) {
          double $v = $a.getDouble($i);
          if ($scale > 0.0) {
            double $r = $v / $scale;
            long $q = (long) ($r >= 0 ? $r + 0.5d : $r - 0.5d);
            if ($q > 127L) $q = 127L;
            if ($q < -127L) $q = -127L;
            $out[$i] = $q * $scale;
          } else {
            $out[$i] = $v;
          }
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Int8RoundTrip =
    copy(child = newChild)
}

object VectorOps {
  private def asDoubleArray(c: Column): Column = c.cast("array<double>")

  def dot_product(a: Column, b: Column): Column =
    GraftShims.column(DotProduct(
      GraftShims.expression(asDoubleArray(a)), GraftShims.expression(asDoubleArray(b))))

  def l2_norm(a: Column): Column =
    GraftShims.column(L2Norm(GraftShims.expression(asDoubleArray(a))))

  def cosine_sim(a: Column, b: Column): Column =
    dot_product(a, b) / (l2_norm(a) * l2_norm(b))

  def int8_round_trip(a: Column): Column =
    GraftShims.column(Int8RoundTrip(GraftShims.expression(asDoubleArray(a))))
}
