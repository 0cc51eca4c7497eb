package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** 64-bit SimHash folded into ONE aggregate — SURVEY.md §7.6.
  *
  * The first-cut plan built the per-bit ±1 votes as 64 separate
  * `sum(when(shiftright(h, b) & 1 = 1, 1, -1))` aggregates: a 64-column
  * aggregation buffer evaluated column-by-column per input row, the
  * consistently slowest query in the round-1 bench (26–52 s at sf0.1).
  * This aggregate keeps one `int[64]` vote array per group and updates
  * all 64 lanes in a single tight JIT'd loop per row; partials merge by
  * element-wise add, and the shuffle carries a 260-byte buffer per
  * (group × partition) instead of 64 separate long columns.
  *
  * eval() resolves each lane's sign: bit b of the result is set iff more
  * tokens voted 1 than −1 at position b — identical semantics to the
  * wide-aggregate form (pinned by TextSpec parity).
  */
case class SimHashAgg(
    hashExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(votes: Array[Int], input: InternalRow): Array[Int] = {
    val h = hashExpr.eval(input)
    if (h != null) {
      val v = h.asInstanceOf[Long]
      var b = 0
      while (b < 64) {
        // +1 when bit set, −1 otherwise, branch-free
        votes(b) += (((v >>> b) & 1L).toInt << 1) - 1
        b += 1
      }
    }
    votes
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(votes: Array[Int]): Any = {
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override def serialize(votes: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(64 * 4)
    var i = 0
    while (i < 64) { bb.putInt(votes(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    val votes = new Array[Int](64)
    var i = 0
    while (i < 64) { votes(i) = bb.getInt; i += 1 }
    votes
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(hashExpr)
  override def prettyName: String = "simhash_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(hashExpr = newChildren(0))
}

object SimHashAgg {
  /** Column facade: 64-bit simhash of the group's token-hash column. */
  def simhash_agg(tokenHash: Column): Column =
    GraftShims.aggColumn(SimHashAgg(GraftShims.expression(tokenHash.cast("long"))))
}
