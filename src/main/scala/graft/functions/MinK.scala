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
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

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

/** Bounded min-k buffer over (key, payload) long pairs, ordered
  * lexicographically by (key, payload): a max-heap of at most k pairs.
  * Same O(k)-memory / map-side-partial shape as [[MinKBuffer]], for caps
  * that must carry a payload column alongside the ranking key (e.g. a
  * blocking group keeping its first k doc_ids WITH each doc's fingerprint,
  * so the pair-expansion step needs no join back to fetch it).
  */
final class MinKPairBuffer(val k: Int) {
  private val revOrd = new java.util.Comparator[Array[Long]] {
    override def compare(x: Array[Long], y: Array[Long]): Int = {
      val c = java.lang.Long.compare(y(0), x(0))
      if (c != 0) c else java.lang.Long.compare(y(1), x(1))
    }
  }
  val heap = new java.util.PriorityQueue[Array[Long]](math.max(1, k), revOrd)

  def add(key: Long, payload: Long): Unit =
    if (heap.size < k) { heap.add(Array(key, payload)); () }
    else {
      val top = heap.peek()
      if (key < top(0) || (key == top(0) && payload < top(1))) {
        heap.poll(); heap.add(Array(key, payload)); ()
      }
    }

  def mergeFrom(other: MinKPairBuffer): Unit = {
    val it = other.heap.iterator()
    while (it.hasNext) { val p = it.next(); add(p(0), p(1)) }
  }

  def sortedAsc: Array[Array[Long]] = {
    val out = new Array[Array[Long]](heap.size)
    val it = heap.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    java.util.Arrays.sort(out, new java.util.Comparator[Array[Long]] {
      override def compare(x: Array[Long], y: Array[Long]): Int = {
        val c = java.lang.Long.compare(x(0), y(0))
        if (c != 0) c else java.lang.Long.compare(x(1), y(1))
      }
    })
    out
  }
}

/** min_k_pairs(key, payload, k): the k lexicographically-smallest
  * (key, payload) pairs of the group as a sorted ascending
  * array<struct<k:bigint, v:bigint>>. Rows where either side is null are
  * skipped. Runs through ObjectHashAggregate with map-side partials, so a
  * hot group ships ≤ k pairs per mapper and no task ever materializes the
  * full group — the bounded `collect_list` replacement for blocked
  * near-dup probes.
  */
case class MinKPairsAgg(
    key: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MinKPairBuffer] {

  require(k > 0, "min_k_pairs requires k > 0")

  override def children: Seq[Expression] = Seq(key, payload)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("v", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "min_k_pairs"

  override def createAggregationBuffer(): MinKPairBuffer = new MinKPairBuffer(k)

  override def update(buffer: MinKPairBuffer, input: InternalRow): MinKPairBuffer = {
    val a = key.eval(input)
    val b = payload.eval(input)
    if (a != null && b != null)
      buffer.add(a.asInstanceOf[Long], b.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: MinKPairBuffer, other: MinKPairBuffer): MinKPairBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: MinKPairBuffer): Any =
    new GenericArrayData(
      buffer.sortedAsc.map(p => InternalRow(p(0), p(1)): Any))

  override def serialize(buffer: MinKPairBuffer): Array[Byte] = {
    val vs = buffer.sortedAsc
    val bb = ByteBuffer.allocate(4 + 16 * vs.length)
    bb.putInt(vs.length)
    vs.foreach { p => bb.putLong(p(0)); bb.putLong(p(1)) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MinKPairBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new MinKPairBuffer(k)
    var i = 0
    while (i < n) { buf.add(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinKPairsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinKPairsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinKPairsAgg =
    copy(key = newChildren(0), payload = newChildren(1))
}

object MinKPairsAgg {
  def column(key: Column, payload: Column, k: Int): Column =
    ExpressionUtils.column(
      MinKPairsAgg(ExpressionUtils.expression(key),
        ExpressionUtils.expression(payload), k).toAggregateExpression())
}
