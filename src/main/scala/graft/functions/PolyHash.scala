package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Base-31 polynomial hash of a string's UTF-8 bytes with 64-bit
  * wrap-around — the whole-string form of [[RollingMinHash]]'s window
  * hash (h ≡ Σ bᵢ·31^(n−1−i) mod 2⁶⁴, read off a signed long).
  *
  * Chosen over xxhash64 for the winnowing gram hash deliberately: the
  * winnowing scheme (Schleimer et al., SIGMOD'03) prescribes "any
  * rolling hash", and THIS one is plain modular arithmetic, so an
  * independent engine can replicate it exactly (the DuckDB oracle does,
  * in HUGEINT) — which is what lets q29/q53 carry real value-level
  * oracles instead of rows-only checks.
  *
  * Native Catalyst expression with `doGenCode` so it stays inside
  * whole-stage codegen — no UDF boxing on the 100 TB scan path.
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * 31L + bytes(i); i += 1 }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
        byte[] $bytes = $c.getBytes();
        long $h = 0L;
        for (int $i = 0; $i < $bytes.length; $i++) { $h = $h * 31L + $bytes[$i]; }
        ${ev.value} = $h;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  /** Column-API facade; the cast pins the child to StringType. */
  def poly_hash(c: Column): Column =
    GraftShims.column(PolyHash(GraftShims.expression(c.cast("string"))))
}
