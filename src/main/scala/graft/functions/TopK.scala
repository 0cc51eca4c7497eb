package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Exact per-group top-K as a typed imperative aggregate — SURVEY.md
  * §7.6 stretch operator (the reference's top-K, 豆瓣图书推荐.md:91, is
  * driver-side; the window row_number form shuffles and sorts EVERY
  * row).
  *
  * Each partial buffer is a bounded k-element heap, so the shuffle
  * carries at most k rows per (group × partition) — the shape that
  * survives 100 TB: map-side combine does almost all the work, and
  * skewed groups cost O(k) network instead of O(group size).
  *
  * Ordering: higher score wins; ties broken by smaller payload id
  * (matches `ORDER BY score DESC, id ASC`), so results are
  * deterministic and oracle-comparable.
  */
case class TopKByScore(
    scoreExpr: Expression,
    payloadExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k > 0, "k must be positive")

  /** "Greater" = worse (lower score, then larger id): the queue head is
    * always the eviction candidate. */
  private val worstFirst: Ordering[(Double, Long)] =
    new Ordering[(Double, Long)] {
      override def compare(x: (Double, Long), y: (Double, Long)): Int = {
        val c = java.lang.Double.compare(y._1, x._1)
        if (c != 0) c else java.lang.Long.compare(x._2, y._2)
      }
    }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](worstFirst)

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
                      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = scoreExpr.eval(input)
    val p = payloadExpr.eval(input)
    if (s != null && p != null) {
      val cand = (s.asInstanceOf[Double], p.asInstanceOf[Long])
      if (buf.size < k) buf.enqueue(cand)
      else if (worstFirst.compare(cand, buf.head) < 0) {
        buf.dequeue(); buf.enqueue(cand)
      }
    }
    buf
  }

  override def merge(a: mutable.PriorityQueue[(Double, Long)],
                     b: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    b.foreach { cand =>
      if (a.size < k) a.enqueue(cand)
      else if (worstFirst.compare(cand, a.head) < 0) {
        a.dequeue(); a.enqueue(cand)
      }
    }
    a
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val best = buf.toArray.sorted(worstFirst) // ascending = best first
    new GenericArrayData(best.map { case (s, p) =>
      InternalRow(s, p)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (s, p) => bb.putDouble(s); bb.putLong(p) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType), StructField("payload", LongType))))
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(scoreExpr, payloadExpr)
  override def prettyName: String = "top_k_by"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(scoreExpr = newChildren(0), payloadExpr = newChildren(1))
}

object TopKByScore {
  /** Column facade: array<struct<score,payload>> of the k best rows. */
  def top_k_by(score: Column, payload: Column, k: Int): Column =
    GraftShims.aggColumn(TopKByScore(
      GraftShims.expression(score.cast("double")),
      GraftShims.expression(payload.cast("long")), k))
}
