package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Document fingerprint: the minimum of the polynomial rolling hashes of
  * every k-byte window of the UTF-8 text — i.e. single-permutation
  * MinHash over character shingles, computed in O(n) with a true rolling
  * update (SURVEY.md §7.6; the reference's only hashing is id-level, so
  * this is a north-star operator, not parity).
  *
  * Native Catalyst expression with `doGenCode` so it stays inside
  * whole-stage codegen — no UDF boxing on the 100 TB scan path.
  */
case class RollingMinHash(child: Expression, k: Int)
    extends UnaryExpression {

  require(k > 0, "window size k must be positive")

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_min_hash"

  /** 31^(k-1) for removing the outgoing byte from the window hash. */
  private val powK1: Long = {
    var p = 1L
    var i = 1
    while (i < k) { p *= 31L; i += 1 }
    p
  }

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    if (n < k) {
      // short text: hash the whole thing once
      var h = 0L
      var i = 0
      while (i < n) { h = h * 31L + bytes(i); i += 1 }
      h
    } else {
      var h = 0L
      var i = 0
      while (i < k) { h = h * 31L + bytes(i); i += 1 }
      var min = h
      while (i < n) {
        h = (h - bytes(i - k) * powK1) * 31L + bytes(i)
        if (h < min) min = h
        i += 1
      }
      min
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val min = ctx.freshName("min")
      val i = ctx.freshName("i")
      s"""
        byte[] $bytes = $c.getBytes();
        int $n = $bytes.length;
        long $h = 0L;
        int $i = 0;
        if ($n < $k) {
          for (; $i < $n; $i++) { $h = $h * 31L + $bytes[$i]; }
          ${ev.value} = $h;
        } else {
          for (; $i < $k; $i++) { $h = $h * 31L + $bytes[$i]; }
          long $min = $h;
          for (; $i < $n; $i++) {
            $h = ($h - $bytes[$i - $k] * ${powK1}L) * 31L + $bytes[$i];
            if ($h < $min) $min = $h;
          }
          ${ev.value} = $min;
        }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): RollingMinHash =
    copy(child = newChild)
}

object RollingMinHash {
  /** Column-API facade; the cast pins the child to StringType. */
  def rolling_min_hash(c: Column, k: Int): Column =
    GraftShims.column(RollingMinHash(GraftShims.expression(c.cast("string")), k))
}
