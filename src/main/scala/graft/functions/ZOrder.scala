package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) key: interleave the low 31 bits of two
  * non-negative keys so that sorting by the single result column
  * clusters rows that are close in BOTH dimensions. That is the data
  * layout lever for multi-column pruning at 100 TB: a table
  * range-sorted by `z_order_key(a, b)` concentrates any (a-range,
  * b-range) query box into few files/row-groups, so parquet min/max
  * stats skip most of the table for filters on EITHER column —
  * unlike a linear sort, which only helps its leading column.
  * (Layout demo + file-skip measurement: [[graft.sources.ZOrderedTables]]
  * and ZOrderSpec.)
  *
  * Bit-spreading runs via the shift-mask ladder (public-domain
  * "Interleave bits by Binary Magic Numbers" bit hack); codegen emits
  * one static call — no fallback, O(1) generated code.
  */
case class ZOrderKey(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "z_order_key"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrderKey.interleave2(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ZOrderKey.interleave2($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderKey =
    copy(left = newLeft, right = newRight)
}

object ZOrderKey {

  /** Spread the low 32 bits of `v` into the even bit positions. */
  def part1by1(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Interleave the low 31 bits of two non-negative keys: bit i of `a`
    * lands at position 2i, bit i of `b` at 2i+1 — result stays a
    * positive long. */
  def interleave2(a: Long, b: Long): Long =
    part1by1(a & 0x7FFFFFFFL) | (part1by1(b & 0x7FFFFFFFL) << 1)

  /** Column form over two integral columns. */
  def zOrderKey(a: Column, b: Column): Column =
    GraftShims.column(ZOrderKey(
      GraftShims.expression(a.cast("long")),
      GraftShims.expression(b.cast("long"))))
}
