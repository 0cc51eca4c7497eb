package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{Column, DataFrame, GraftShims}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter semi-join pre-filter: probe a long key against a
  * pre-built dim-key sketch INSIDE the fact scan stage, so the shuffle
  * above it ships only probable matches.
  *
  * This is the runtime-filter shape for the regime where the dim's key
  * set is too large to broadcast as an exact hash relation but its
  * Bloom sketch (size set by expectedKeys × fpp, independent of fact
  * size) still fits in a task — the join itself then removes the
  * sketch's false positives, so the result is provably the plain join.
  * Static pushdown (q10), dynamic partition pruning (q73) and this
  * cover the three scan-reduction regimes: constant predicate, joined
  * partition keys, joined row keys.
  *
  * The sketch travels as serialized bytes (the case-class field, cheap
  * to ship and to compare) and is deserialized once per
  * expression instance; codegen carries the deserialized filter as a
  * reference object — O(1) generated code regardless of sketch size,
  * same pattern as [[SignProjectionBucket]]'s plane matrix.
  */
case class BloomMightContain(child: Expression, sketch: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(sketch))

  override protected def nullSafeEval(input: Any): Any =
    filter.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("bloomFilter", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $bf.mightContainLong($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {

  /** Build the dim-side key sketch (a distributed `treeAggregate` over
    * the dim — rows never reach the driver, only the fixed-size sketch
    * does) and return the fact-side probe column. `expectedKeys` sizes
    * the sketch: ~1.2 MB per million keys at fpp=0.01 — at 100 TB this
    * is cluster-conf territory (dim row-count stats), here a query
    * parameter.
    *
    * LONG-keyed contract, enforced on BOTH sides: the dim column is
    * cast to long before insertion to match the probe's cast — without
    * it a string-typed dim inserts string bytes while the probe hashes
    * longs, and the "provably a superset" guarantee silently becomes
    * an empty result.
    */
  def keyFilter(dim: DataFrame, keyCol: String, expectedKeys: Long,
      fpp: Double): Column => Column = {
    val bf = dim.select(org.apache.spark.sql.functions.col(keyCol)
        .cast("long").as(keyCol))
      .stat.bloomFilter(keyCol, expectedKeys, fpp)
    val bytes = {
      val out = new java.io.ByteArrayOutputStream()
      bf.writeTo(out)
      out.toByteArray
    }
    key => GraftShims.column(BloomMightContain(
      GraftShims.expression(key.cast("long")), bytes))
  }
}
