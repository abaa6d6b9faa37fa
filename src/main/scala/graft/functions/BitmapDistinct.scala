// Hosted under org.apache.spark.sql so the aggregate can use the
// private[sql] ExpressionUtils surface — same pattern as MinK.scala.
// Public API re-exported from graft.functions.BitmapDistinct
// (BitmapDistinctApi.scala).
package org.apache.spark.sql.graftexpr

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{DataType, LongType}

/** Growable bitmap over a bounded non-negative integer domain: word array
  * sized to the highest bit actually set (geometric growth, capped by the
  * domain), so a group whose values stay small pays bytes proportional to
  * its own max, not the domain bound. Merge is wordwise OR — associative
  * and commutative, the map-side-partial shape.
  */
final class BitmapBuffer(val maxDomain: Long) {
  private[graftexpr] var words: Array[Long] = new Array[Long](1)

  def add(v: Long): Unit = {
    if (v < 0 || v >= maxDomain)
      throw new IllegalArgumentException(
        s"distinct_bounded: value $v outside domain [0, $maxDomain)")
    val w = (v >>> 6).toInt
    if (w >= words.length) {
      val maxWords = ((maxDomain + 63) >>> 6).toInt
      val newLen = math.min(maxWords, math.max(w + 1, words.length * 2))
      words = java.util.Arrays.copyOf(words, newLen)
    }
    words(w) |= 1L << (v & 63)
  }

  def mergeFrom(other: BitmapBuffer): Unit = {
    if (other.words.length > words.length)
      words = java.util.Arrays.copyOf(words, other.words.length)
    var i = 0
    while (i < other.words.length) { words(i) |= other.words(i); i += 1 }
  }

  def cardinality: Long = {
    var n = 0L
    var i = 0
    while (i < words.length) { n += java.lang.Long.bitCount(words(i)); i += 1 }
    n
  }
}

/** distinct_bounded(child, maxDomain): the EXACT number of distinct
  * non-null values of a long column per group, for values known to lie in
  * `[0, maxDomain)`. A plain `count(DISTINCT x)` plans as Expand(×k) plus a
  * second shuffle keyed on (group, x) — on a pair-rollup whose group count
  * is close to its row count (the near-dup shape: millions of clip pairs,
  * a handful of shared frames each) that de-dup machinery is ~4× the cost
  * of the aggregation itself. This aggregate keeps one bitmap per group
  * instead: single shuffle, O(1) update, wordwise-OR merge, and the
  * map-side partial ships ⌈observed_max/64⌉ longs per group — bounded by
  * `maxDomain/64` in the worst case and by the group's own value range in
  * the typical one.
  *
  * Values outside the domain throw (a caller contract violation, not
  * data): the caller picks `maxDomain` from the same packing bound that
  * produced the values, e.g. the 2^21 frame-index field of
  * [[graft.ext.Multimodal.keyframeClipDedup]]'s frame_uid.
  */
case class BitmapDistinctAgg(
    child: Expression,
    maxDomain: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BitmapBuffer] {

  require(maxDomain > 0, "distinct_bounded requires maxDomain > 0")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "distinct_bounded"

  override def createAggregationBuffer(): BitmapBuffer =
    new BitmapBuffer(maxDomain)

  override def update(buffer: BitmapBuffer, input: InternalRow): BitmapBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: BitmapBuffer, other: BitmapBuffer): BitmapBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: BitmapBuffer): Any = buffer.cardinality

  override def serialize(buffer: BitmapBuffer): Array[Byte] = {
    // trim trailing zero words: a small-valued group serializes small even
    // after a transient growth
    var n = buffer.words.length
    while (n > 1 && buffer.words(n - 1) == 0L) n -= 1
    val bb = ByteBuffer.allocate(4 + 8 * n)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putLong(buffer.words(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BitmapBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new BitmapBuffer(maxDomain)
    val ws = new Array[Long](n)
    var i = 0
    while (i < n) { ws(i) = bb.getLong; i += 1 }
    buf.words = ws
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapDistinctAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapDistinctAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BitmapDistinctAgg =
    copy(child = newChildren.head)
}

object BitmapDistinctAgg {
  def column(c: Column, maxDomain: Long): Column =
    ExpressionUtils.column(
      BitmapDistinctAgg(ExpressionUtils.expression(c), maxDomain)
        .toAggregateExpression())
}
