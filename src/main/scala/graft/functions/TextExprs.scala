// Hosted under org.apache.spark.sql so the expressions can use the
// private[sql] ExpressionUtils surface — same pattern as VecDot.scala.
// Public API re-exported from graft.functions (TextExprsApi.scala).
package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared per-row kernels for the text expressions. A top-level Scala
  * object gets static forwarders, so generated (Java) code can call
  * `TextExprUtil.m(...)` directly — the expressions below stay inside
  * whole-stage codegen with one static call per row.
  */
object TextExprUtil {

  /** The word n-grams of `words` as space-joined strings — one gram per
    * full window, in window order. Exactly the array the interpreted
    * `transform`+`when`+`concat_ws`+`filter` spelling builds (concat_ws
    * semantics: null elements are skipped, never null output).
    */
  def wordGrams(words: ArrayData, n: Int): ArrayData = {
    val sz = words.numElements()
    val out = new Array[Any](math.max(0, sz - n + 1))
    val sep = UTF8String.fromString(" ")
    var i = 0
    while (i <= sz - n) {
      val parts = new Array[UTF8String](n)
      var k = 0
      while (k < n) {
        parts(k) = if (words.isNullAt(i + k)) null else words.getUTF8String(i + k)
        k += 1
      }
      out(i) = UTF8String.concatWs(sep, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Gram statistics in one hashed pass: (most-frequent-gram count, the
    * gram itself — ties to the binary-greatest gram — and the total
    * characters inside grams occurring more than once). Identical result
    * to sorting the gram array and folding runs (runs of equal grams ARE
    * the per-gram counts; the run fold's tie-break and dup-chars
    * accounting are reproduced here), but O(g) instead of O(g log g) and
    * no interpreted lambda per element. Empty window set → (0, null, 0),
    * which the callers' `coalesce(... , 0.0)` maps to 0 fractions.
    */
  def gramStats(words: ArrayData, n: Int): InternalRow = {
    val sz = words.numElements()
    val counts = new java.util.HashMap[UTF8String, Array[Long]]()
    val sep = UTF8String.fromString(" ")
    var i = 0
    while (i <= sz - n) {
      val parts = new Array[UTF8String](n)
      var k = 0
      while (k < n) {
        parts(k) = if (words.isNullAt(i + k)) null else words.getUTF8String(i + k)
        k += 1
      }
      val gram = UTF8String.concatWs(sep, parts: _*)
      val slot = counts.get(gram)
      if (slot == null) counts.put(gram, Array(1L)) else slot(0) += 1L
      i += 1
    }
    var bestCnt = 0L
    var bestGram: UTF8String = null
    var dup = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val g = e.getKey
      val c = e.getValue()(0)
      if (c > bestCnt || (c == bestCnt && bestGram != null && g.compareTo(bestGram) > 0)) {
        bestCnt = c; bestGram = g
      }
      if (c > 1) dup += c * g.numChars()
    }
    new GenericInternalRow(Array[Any](bestCnt, bestGram, dup))
  }

  /** |set(a) ∩ set(b)| — the size of `array_intersect(a, b)` without
    * materializing the intersection array: distinct common elements,
    * null counting as a value present in both (Spark's semantics).
    */
  def intersectSize(a: ArrayData, b: ArrayData): Int = {
    val bSet = new java.util.HashSet[UTF8String]()
    var bHasNull = false
    var i = 0
    val nb = b.numElements()
    while (i < nb) {
      if (b.isNullAt(i)) bHasNull = true else bSet.add(b.getUTF8String(i))
      i += 1
    }
    val counted = new java.util.HashSet[UTF8String]()
    var aNullCounted = false
    var n = 0
    var j = 0
    val na = a.numElements()
    while (j < na) {
      if (a.isNullAt(j)) {
        if (bHasNull && !aNullCounted) { n += 1; aNullCounted = true }
      } else {
        val v = a.getUTF8String(j)
        if (bSet.contains(v) && counted.add(v)) n += 1
      }
      j += 1
    }
    n
  }
}

/** gram_stats(words, n): struct(bestCnt, bestGram, dup) for the word
  * n-grams of a document — the per-doc kernel of the Gopher repetition
  * gates, scan-speed (no shuffle, no sort, whole-stage codegen with one
  * static call per row).
  */
case class GramStatsExpr(child: Expression, n: Int)
  extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, "gram_stats requires n >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = StructType(Seq(
    StructField("bestCnt", LongType, nullable = false),
    StructField("bestGram", StringType, nullable = true),
    StructField("dup", LongType, nullable = false)))
  override def prettyName: String = "gram_stats"

  override def nullSafeEval(a: Any): Any =
    TextExprUtil.gramStats(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graftexpr.TextExprUtil.gramStats($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): GramStatsExpr =
    copy(child = newChild)
}

object GramStatsExpr {
  def column(words: Column, n: Int): Column =
    ExpressionUtils.column(GramStatsExpr(ExpressionUtils.expression(words), n))
}

/** word_grams(words, n): the space-joined full windows as array<string> —
  * native form of the interpreted transform+filter builder, for the
  * operators that genuinely need the gram *array* (explode for
  * decontamination joins, distinct for shingle sets).
  */
case class WordGramsExpr(child: Expression, n: Int)
  extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, "word_grams requires n >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_grams"

  override def nullSafeEval(a: Any): Any =
    TextExprUtil.wordGrams(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graftexpr.TextExprUtil.wordGrams($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordGramsExpr =
    copy(child = newChild)
}

object WordGramsExpr {
  def column(words: Column, n: Int): Column =
    ExpressionUtils.column(WordGramsExpr(ExpressionUtils.expression(words), n))
}

/** intersect_size(a, b) = size(array_intersect(a, b)) without building
  * the intersection array — the per-pair kernel of blocked Jaccard.
  */
case class IntersectSizeExpr(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "intersect_size"

  override def nullSafeEval(a: Any, b: Any): Any =
    TextExprUtil.intersectSize(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graftexpr.TextExprUtil.intersectSize($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectSizeExpr =
    copy(left = newLeft, right = newRight)
}

object IntersectSizeExpr {
  def column(a: Column, b: Column): Column =
    ExpressionUtils.column(
      IntersectSizeExpr(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

/** int_dot(a, b): Σ (long)(a[i]·b[i]) over array<int> — the stage-1
  * scoring loop of quantized search. Accumulates the int product widened
  * to long, exactly like the zip_with(cast long)+aggregate fold it
  * replaces; a null element poisons the sum to null (zip_with semantics).
  */
case class IntDotExpr(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(IntegerType), ArrayType(IntegerType))
  override def dataType: DataType = LongType
  override def prettyName: String = "int_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      acc += (xs.getInt(i) * ys.getInt(i)).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $acc += (long) ($a.getInt($i) * $b.getInt($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntDotExpr =
    copy(left = newLeft, right = newRight)
}

object IntDotExpr {
  def column(a: Column, b: Column): Column =
    ExpressionUtils.column(
      IntDotExpr(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
