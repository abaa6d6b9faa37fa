// Hosted under org.apache.spark.sql so the aggregate can use the
// private[sql] ExpressionUtils surface — same pattern as VecDot.scala.
// Public API re-exported from graft.functions.MinK below.
package org.apache.spark.sql.graftexpr

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bounded min-k buffer: a max-heap of at most k longs holding the k
  * smallest values seen. O(k) memory, O(log k) per update, and merges are
  * associative/commutative — the partial-aggregation shape that lets a hot
  * group's cap run map-side instead of routing the whole group through one
  * sort task.
  */
final class MinKBuffer(val k: Int) {
  val heap = new java.util.PriorityQueue[java.lang.Long](
    math.max(1, k), java.util.Collections.reverseOrder[java.lang.Long]())

  def add(v: Long): Unit =
    if (heap.size < k) heap.add(v)
    else if (v < heap.peek()) { heap.poll(); heap.add(v); () }

  def mergeFrom(other: MinKBuffer): Unit = {
    val it = other.heap.iterator()
    while (it.hasNext) add(it.next())
  }

  def sortedAsc: Array[Long] = {
    val out = new Array[Long](heap.size)
    val it = heap.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    java.util.Arrays.sort(out)
    out
  }
}

/** min_k(child, k): the k smallest non-null long values of the group as a
  * sorted ascending array. A TypedImperativeAggregate, so Spark runs it
  * through ObjectHashAggregate with map-side partials: each mapper sends at
  * most k longs per group to the shuffle, and no task ever holds or sorts
  * more than k values per group — the cap-without-sort primitive for
  * bounding hot blocking keys.
  */
case class MinKLongsAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MinKBuffer] {

  require(k > 0, "min_k requires k > 0")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "min_k"

  override def createAggregationBuffer(): MinKBuffer = new MinKBuffer(k)

  override def update(buffer: MinKBuffer, input: InternalRow): MinKBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: MinKBuffer, other: MinKBuffer): MinKBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: MinKBuffer): Any =
    new GenericArrayData(buffer.sortedAsc)

  override def serialize(buffer: MinKBuffer): Array[Byte] = {
    val vs = buffer.sortedAsc
    val bb = ByteBuffer.allocate(4 + 8 * vs.length)
    bb.putInt(vs.length)
    vs.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MinKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new MinKBuffer(k)
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinKLongsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinKLongsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinKLongsAgg =
    copy(child = newChildren.head)
}

object MinKLongsAgg {
  def column(c: Column, k: Int): Column =
    ExpressionUtils.column(
      MinKLongsAgg(ExpressionUtils.expression(c), k).toAggregateExpression())
}
