package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** k-lane MinHash signature in ONE aggregate — SURVEY.md §7.6.
  *
  * The first-cut signature computed k=32 separate
  * `min(xxhash64(lit(i), sh))` aggregates: 32 FULL string hashes per
  * input row (the shingle text re-hashed per lane) and a 32-column
  * aggregation buffer — the dominant cost of the MinHash+LSH query
  * after the shingle explode. Here the shingle is hashed ONCE
  * (`xxhash64(sh)` feeds the aggregate) and the k lanes are derived by
  * a splitmix64 finalizer over (base + lane·φ) — an O(1)-per-lane
  * integer mix with the same pairwise-independence-in-practice the
  * seeded-xxhash family gave. Buffer: `long[k]` element-wise min;
  * partials merge by min; shuffle carries 8k+4 bytes per
  * (group × partition).
  *
  * Lane values differ from the seeded-xxhash form (both are
  * engine-specific by nature — the catalog entry is rows-only); the LSH
  * recall property is pinned by TextSpec against the exact-Jaccard
  * ground truth, which is derivation-independent.
  */
case class MinHashAgg(
    hashExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(k > 0, "k must be positive")

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val h = hashExpr.eval(input)
    if (h != null) {
      val base = h.asInstanceOf[Long]
      var i = 0
      while (i < k) {
        var z = base + i.toLong * 0x9E3779B97F4A7C15L
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z = z ^ (z >>> 31)
        if (z < buf(i)) buf(i) = z
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(k * 8)
    var i = 0
    while (i < k) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](k)
    var i = 0
    while (i < k) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(hashExpr)
  override def prettyName: String = "min_hash_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(hashExpr = newChildren(0))
}

object MinHashAgg {
  /** Column facade: array<long> of k min-hash lanes over the group. */
  def min_hash_agg(baseHash: Column, k: Int): Column =
    GraftShims.aggColumn(MinHashAgg(GraftShims.expression(baseHash.cast("long")), k))
}
