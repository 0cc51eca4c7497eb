package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Count-min-sketch frequency probe as a native codegen expression:
  * estimate a long key's frequency INSIDE the scan stage, against a
  * pre-built sketch.
  *
  * This is the frequency sibling of [[BloomMightContain]] (membership)
  * and completes the sketch-probe family: the CMS travels as serialized
  * bytes (≈110 KB at ε=1e-3, independent of row count), deserializes
  * once per expression instance, and codegen carries the deserialized
  * sketch as a reference object — O(1) generated code regardless of
  * sketch width. The guarantee probed here is the CMS contract: the
  * estimate NEVER under-counts, so `cms_estimate(k) >= τ` is a
  * no-false-negative pre-filter for "true count ≥ τ" — the exact
  * second pass then removes the sketch's over-count false positives
  * (the two-pass heavy-hitter shape, q55).
  */
case class CmsEstimate(child: Expression, sketch: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  @transient private lazy val cms: CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(sketch))

  override protected def nullSafeEval(input: Any): Any =
    cms.estimateCount(java.lang.Long.valueOf(input.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmSketch", cms,
      classOf[CountMinSketch].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $ref.estimateCount(java.lang.Long.valueOf($a));")
  }

  override protected def withNewChildInternal(newChild: Expression): CmsEstimate =
    copy(child = newChild)
}

object CmsEstimate {

  /** Wrap a pre-serialized sketch into a probe column. */
  def probe(sketchBytes: Array[Byte])(key: Column): Column =
    GraftShims.column(CmsEstimate(
      GraftShims.expression(key.cast("long")), sketchBytes))
}
