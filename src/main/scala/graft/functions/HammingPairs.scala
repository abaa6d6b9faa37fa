// Hosted under org.apache.spark.sql for the private[sql] ExpressionUtils
// surface — same pattern as VecDot.scala. Public API re-exported from
// graft.functions.HammingPairs below.
package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native pair expansion for the banded hamming probe: given one blocked
  * group's capped member array (`array<struct<k:bigint,v:bigint>>`, ids
  * with their full fingerprints, sorted ascending) and the group's block
  * index, emit every qualifying pair `(id_a, id_b, hamming)` — hamming
  * ≤ `maxDist` AND no earlier block's slices also agree (first-match
  * emission, so a pair materializes from exactly one of its agreeing
  * blocks and no distinct() shuffle is needed downstream).
  *
  * Semantically identical to the higher-order `transform`/`filter` array
  * lambda it replaces, but those evaluate an interpreted expression tree
  * and allocate a candidate struct PER CANDIDATE — O(m²) tree walks per
  * group, ~40 CPU-s on the 10× keyframe corpus. This is one eval per
  * GROUP with a primitive long loop inside (XOR + bitCount + slice
  * compares), allocating only the qualifying rows. Candidates are ordered
  * (i, j) with i < j in member order, so `id_a < id_b` exactly as before.
  */
case class HammingPairsExpr(ms: Expression, blk: Expression,
    maxDist: Int, bits: Int)
  extends Expression with ExpectsInputTypes with CodegenFallback {

  private val nBlocks = maxDist + 1
  // identical block layout to the probe's banding columns
  private val widths: Array[Int] = {
    val base = bits / nBlocks
    val extra = bits % nBlocks
    Array.tabulate(nBlocks)(b => if (b < extra) base + 1 else base)
  }
  private val shifts: Array[Int] = widths.scanLeft(0)(_ + _).init
  private val masks: Array[Long] = widths.map(w => (1L << w) - 1)

  override def children: Seq[Expression] = Seq(ms, blk)
  override def inputTypes: Seq[AbstractDataType] = Seq(
    ArrayType(StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("v", LongType, nullable = false))), containsNull = false),
    IntegerType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id_a", LongType, nullable = false),
      StructField("id_b", LongType, nullable = false),
      StructField("hamming", IntegerType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "hamming_pairs"

  override def eval(input: InternalRow): Any = {
    val arr = ms.eval(input).asInstanceOf[ArrayData]
    val b = blk.eval(input).asInstanceOf[Int]
    val m = arr.numElements()
    val ks = new Array[Long](m)
    val vs = new Array[Long](m)
    var i = 0
    while (i < m) {
      val row = arr.getStruct(i, 2)
      ks(i) = row.getLong(0)
      vs(i) = row.getLong(1)
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    i = 0
    while (i < m) {
      val vi = vs(i)
      var j = i + 1
      while (j < m) {
        val x = vi ^ vs(j)
        val ham = java.lang.Long.bitCount(x)
        if (ham <= maxDist) {
          // first-match gate: an EARLIER block whose slices agree owns
          // this pair; slices agree iff the xor has no bit in the block
          var first = true
          var bp = 0
          while (first && bp < b) {
            if (((x >>> shifts(bp)) & masks(bp)) == 0L) first = false
            bp += 1
          }
          if (first) out += InternalRow(ks(i), ks(j), ham)
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HammingPairsExpr =
    copy(ms = newChildren(0), blk = newChildren(1))
}

object HammingPairsApi {
  def column(ms: Column, blk: Column, maxDist: Int, bits: Int): Column =
    ExpressionUtils.column(HammingPairsExpr(
      ExpressionUtils.expression(ms), ExpressionUtils.expression(blk),
      maxDist, bits))
}
