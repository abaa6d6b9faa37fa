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

  /** Per-thread MD5 instance for the hashing kernels below —
    * `MessageDigest.getInstance` is a JCA provider lookup + allocation,
    * far too heavy to pay once per ROW inside a codegen'd loop. Tasks are
    * thread-confined in Spark, so a ThreadLocal (reset per use by
    * `digest()` itself, which resets after computing) is safe.
    */
  private val md5Local: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  def md5(): java.security.MessageDigest = {
    val md = md5Local.get()
    md.reset()
    md
  }

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

  /** Distinct word n-grams of `words` that pass every probe of a Bloom
    * bitmap — the corpus-side test of [[graft.ext.TextAnalysis]]
    * `decontaminateBloom`, fused into one pass. Exactly the value of the
    * column spelling it replaces:
    * `size(filter(array_distinct(word_grams(ws, n)), g -> AND_i
    * bitSet((h1(md5(g)) + i·h2(md5(g))) % mBits)))` with
    * h1 = conv(substring(hex,1,15),16,10) % mBits and
    * h2 = conv(substring(hex,16,15),16,10) % mBits · 2 + 1 — the digest
    * is taken once per DISTINCT gram straight off the raw md5 bytes
    * (no hex string, no decimal re-parse), probes are plain long
    * arithmetic against the broadcast bitmap words.
    */
  def bloomGramHits(words: ArrayData, bm: ArrayData, n: Int, mBits: Int,
      k: Int): Long = {
    val sz = words.numElements()
    if (sz < n) return 0L
    val md = md5()
    val seen = new java.util.HashSet[UTF8String]()
    val sep = UTF8String.fromString(" ")
    var hits = 0L
    var i = 0
    while (i <= sz - n) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) {
        parts(j) = if (words.isNullAt(i + j)) null else words.getUTF8String(i + j)
        j += 1
      }
      val gram = UTF8String.concatWs(sep, parts: _*)
      if (seen.add(gram)) {
        md.reset()
        val digest = md.digest(gram.getBytes)
        val h1 = HashKernelUtil.digestPrefix(digest, 15) % mBits
        val h2 = HashKernelUtil.digestRange(digest, 15, 15) % mBits * 2 + 1
        var hit = true
        var p = 0
        while (hit && p < k) {
          val pos = (h1 + p * h2) % mBits
          val word = bm.getLong((pos >>> 6).toInt)
          if ((word & (1L << (pos & 63))) == 0L) hit = false
          p += 1
        }
        if (hit) hits += 1
      }
      i += 1
    }
    hits
  }

  /** Space-join `words`, wrapping every k-th (1-based) element in
    * pre/post — one pass, no interpreted lambdas. Exactly the value of
    * `array_join(transform(sequence(1, size(ws)), i -> CASE WHEN i % k = 0
    * THEN concat(pre, ws[i], post) ELSE ws[i] END), ' ')`: a null element
    * yields a null entry (concat propagates null) and array_join SKIPS
    * null entries — no doubled separator — which the `kept` guard
    * reproduces. Defined for any input; the producing fixture never holds
    * null words.
    */
  def wrapEveryK(words: ArrayData, k: Int, pre: UTF8String,
      post: UTF8String): UTF8String = {
    val n = words.numElements()
    val parts = new scala.collection.mutable.ArrayBuffer[UTF8String](n)
    var i = 0
    while (i < n) {
      if (!words.isNullAt(i)) {
        val w = words.getUTF8String(i)
        parts += (if ((i + 1) % k == 0) UTF8String.concat(pre, w, post) else w)
      }
      i += 1
    }
    UTF8String.concatWs(UTF8String.fromString(" "), parts.toSeq: _*)
  }

  /** [[intersectSize]] for ASCENDING-sorted inputs (binary UTF8String
    * order — `sort_array`'s): one merge scan, zero allocation, no hashing.
    * Same count on any sorted inputs: duplicates are adjacent (an equal
    * run is counted once via the `prev` guard), and sort_array places
    * nulls first (a null present in both sides counts once, Spark's
    * array_intersect semantics). The HashSet spelling rebuilt BOTH sides'
    * hash sets per PAIR — O(|a|+|b|) allocations and hashes for every
    * surviving pair of a block's O(n²) self join; this is the per-pair
    * floor: ≤ |a|+|b| comparisons, nothing allocated.
    */
  def intersectSizeSorted(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var aNull = false
    var bNull = false
    while (i < na && a.isNullAt(i)) { aNull = true; i += 1 }
    while (j < nb && b.isNullAt(j)) { bNull = true; j += 1 }
    var n = if (aNull && bNull) 1 else 0
    var prev: UTF8String = null
    while (i < na && j < nb) {
      val x = a.getUTF8String(i)
      val y = b.getUTF8String(j)
      val c = x.compareTo(y)
      if (c < 0) i += 1
      else if (c > 0) j += 1
      else {
        if (prev == null || !x.equals(prev)) { n += 1; prev = x }
        i += 1; j += 1
      }
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

/** bloom_gram_hits(words, bm): the count of distinct word n-grams whose k
  * Bloom probes all land in set bits of the bitmap column — the fused
  * corpus-side test of decontaminateBloom. See
  * [[TextExprUtil.bloomGramHits]] for the value contract with the
  * interpreted transform/filter spelling it replaces (parity pinned in
  * HashKernelsSpec).
  */
case class BloomGramHitsExpr(left: Expression, right: Expression,
    n: Int, mBits: Int, k: Int)
  extends BinaryExpression with ExpectsInputTypes {
  require(n >= 1 && k >= 1 && mBits % 64 == 0,
    "bloom_gram_hits requires n >= 1, k >= 1, mBits % 64 == 0")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "bloom_gram_hits"

  override def nullSafeEval(a: Any, b: Any): Any =
    TextExprUtil.bloomGramHits(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], n, mBits, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graftexpr.TextExprUtil" +
        s".bloomGramHits($a, $b, $n, $mBits, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomGramHitsExpr =
    copy(left = newLeft, right = newRight)
}

object BloomGramHitsExpr {
  def column(words: Column, bm: Column, n: Int, mBits: Int, k: Int): Column =
    ExpressionUtils.column(
      BloomGramHitsExpr(ExpressionUtils.expression(words),
        ExpressionUtils.expression(bm), n, mBits, k))
}

/** wrap_every_k(words, k, pre, post): the space-joined word list with
  * every k-th (1-based) word wrapped in pre/post, as ONE codegen'd pass —
  * the interpreted `array_join(transform(sequence(...), i -> ...))`
  * spelling it replaces paid a lambda tree per word per row. See
  * [[TextExprUtil.wrapEveryK]] for the exact value contract.
  */
case class WrapEveryKExpr(child: Expression, k: Int, pre: String, post: String)
  extends UnaryExpression with ExpectsInputTypes {
  require(k >= 1, "wrap_every_k requires k >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = StringType
  override def prettyName: String = "wrap_every_k"

  @transient private lazy val preU = UTF8String.fromString(pre)
  @transient private lazy val postU = UTF8String.fromString(post)

  override def nullSafeEval(in: Any): Any =
    TextExprUtil.wrapEveryK(in.asInstanceOf[ArrayData], k, preU, postU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val preRef = ctx.addReferenceObj("wrapPre", preU,
        classOf[UTF8String].getName)
      val postRef = ctx.addReferenceObj("wrapPost", postU,
        classOf[UTF8String].getName)
      s"${ev.value} = org.apache.spark.sql.graftexpr.TextExprUtil" +
        s".wrapEveryK($c, $k, $preRef, $postRef);"
    })

  override protected def withNewChildInternal(newChild: Expression): WrapEveryKExpr =
    copy(child = newChild)
}

object WrapEveryKExpr {
  def column(words: Column, k: Int, pre: String, post: String): Column =
    ExpressionUtils.column(
      WrapEveryKExpr(ExpressionUtils.expression(words), k, pre, post))
}

/** intersect_size_sorted(a, b) — [[IntersectSizeExpr]] for inputs the
  * caller guarantees ASCENDING-sorted (sort_array order): one merge scan
  * per pair instead of two hash-set builds. See
  * [[TextExprUtil.intersectSizeSorted]] for the exact-count contract.
  */
case class IntersectSizeSortedExpr(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "intersect_size_sorted"

  override def nullSafeEval(a: Any, b: Any): Any =
    TextExprUtil.intersectSizeSorted(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graftexpr.TextExprUtil.intersectSizeSorted($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectSizeSortedExpr =
    copy(left = newLeft, right = newRight)
}

object IntersectSizeSortedExpr {
  def column(a: Column, b: Column): Column =
    ExpressionUtils.column(
      IntersectSizeSortedExpr(
        ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

/** int_dot(a, b): Σ (long)a[i]·(long)b[i] over array<int> — the stage-1
  * scoring loop of quantized search. Each operand is widened to long
  * BEFORE multiplying, exactly like the zip_with(cast long)+aggregate
  * fold it replaces (a 32-bit product would wrap for |a·b| > 2³¹, which
  * the general array<int> surface permits even though int8 codes never
  * reach it); a null element poisons the sum to null (zip_with semantics).
  */
case class IntDotExpr(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(IntegerType), ArrayType(IntegerType))
  override def dataType: DataType = LongType
  // can produce null from non-null inputs (null element, mismatched
  // lengths) — without this override two non-nullable children would
  // claim non-nullable and nullSafeCodeGen would emit `false = true;`
  override def nullable: Boolean = true
  override def prettyName: String = "int_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    // zip_with null-pads the shorter array, poisoning the sum → null;
    // match that instead of silently truncating to min(len)
    if (xs.numElements() != ys.numElements()) return null
    val n = xs.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      acc += xs.getInt(i).toLong * ys.getInt(i)
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
         |long $acc = 0L;
         |if ($a.numElements() != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  int $n = $a.numElements();
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (long) $a.getInt($i) * (long) $b.getInt($i);
         |  }
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

/** int8_codes(emb): symmetric int8 quantization of an array<float> in ONE
  * pass — struct(codes array<int>, scale double) where
  * scale = max|x|/127 (1.0 when the max is 0) and
  * codes[i] = floor(x[i]/scale + 0.5) (round half-up, no rounding-mode
  * ambiguity — identical arithmetic to the column spelling
  * `transform(emb, x -> floor(x/scale + 0.5))` and to the DuckDB oracle).
  *
  * Exists because the column spelling embeds the full `array_max(
  * transform(emb, abs))` scale subtree inside the per-element lambda of an
  * INTERPRETED higher-order function: O(dim²) lambda invocations + a
  * fresh abs-array allocation per element, per row (measured 4× slower
  * than brute-force float scoring at sf0.1 — the quantized "fast path"
  * was the slowest query in the suite). This kernel is O(dim) with zero
  * allocations beyond the output, called once per row from whole-stage
  * codegen.
  */
object Int8Util {
  def codes(emb: ArrayData): InternalRow = {
    val n = emb.numElements()
    var mx = 0.0
    var any = false
    var i = 0
    while (i < n) {
      if (!emb.isNullAt(i)) {
        val v = math.abs(emb.getFloat(i).toDouble)
        if (v > mx) mx = v
        any = true
      }
      i += 1
    }
    if (!any && n > 0) {
      // all-null elements: array_max(abs) is null → null scale, null codes
      return new GenericInternalRow(
        Array[Any](new GenericArrayData(new Array[Any](n)), null))
    }
    val scale = if (mx == 0.0) 1.0 else mx / 127.0
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      out(i) =
        if (emb.isNullAt(i)) null
        else math.floor(emb.getFloat(i).toDouble / scale + 0.5).toInt
      i += 1
    }
    new GenericInternalRow(Array[Any](new GenericArrayData(out), scale))
  }
}

case class Int8CodesExpr(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = StructType(Seq(
    StructField("codes", ArrayType(IntegerType), nullable = false),
    StructField("scale", DoubleType, nullable = true)))
  override def prettyName: String = "int8_codes"

  override def nullSafeEval(a: Any): Any =
    Int8Util.codes(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graftexpr.Int8Util.codes($a);")

  override protected def withNewChildInternal(newChild: Expression): Int8CodesExpr =
    copy(child = newChild)
}

object Int8CodesExpr {
  def column(emb: Column): Column =
    ExpressionUtils.column(Int8CodesExpr(ExpressionUtils.expression(emb)))
}

/** simhash_words(words, bits): the SimHash fingerprint of a word array in
  * ONE pass — per word, the top `bits/4` hex chars of its md5 vote ±1 on
  * every fingerprint bit; bit b of the output is set iff its vote total
  * is ≥ 0. Bit-identical to the column spelling (md5 → conv(hex,16,10) →
  * per-bit aggregate folds) and to the DuckDB oracle CTE that replays it:
  * a null word votes −1 on every bit (null md5 → the when() otherwise
  * branch), an empty array leaves all votes at 0 → all bits set.
  *
  * Exists because the column spelling runs `bits` SEPARATE interpreted
  * aggregate folds per document — each traversing the whole word-hash
  * array with a per-element lambda — plus an interpreted transform for
  * the hashes themselves: O(words·bits) interpreted lambda invocations
  * per row. This kernel is the same O(words·bits) bit work but one
  * static call per row inside whole-stage codegen, with one md5 per word.
  */
object SimHashUtil {
  def simhash(words: ArrayData, bits: Int): Long = {
    val nBytes = bits / 8 // bits ∈ {8,16,24,32,40,48,56}: hex chars = 2·bytes
    val votes = new Array[Int](bits)
    val md = TextExprUtil.md5()
    val n = words.numElements()
    var i = 0
    while (i < n) {
      if (words.isNullAt(i)) {
        var b = 0
        while (b < bits) { votes(b) -= 1; b += 1 }
      } else {
        md.reset()
        val digest = md.digest(words.getUTF8String(i).getBytes)
        var h = 0L
        var k = 0
        while (k < nBytes) { h = (h << 8) | (digest(k) & 0xffL); k += 1 }
        var b = 0
        while (b < bits) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) { if (votes(b) >= 0) out |= (1L << b); b += 1 }
    out
  }
}

case class SimHashExpr(child: Expression, bits: Int)
  extends UnaryExpression with ExpectsInputTypes {
  require(bits >= 8 && bits <= 56 && bits % 8 == 0,
    "simhash_words requires bits in 8..56, a multiple of 8")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_words"

  override def nullSafeEval(a: Any): Any =
    SimHashUtil.simhash(a.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graftexpr.SimHashUtil.simhash($a, $bits);")

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

object SimHashExpr {
  def column(words: Column, bits: Int): Column =
    ExpressionUtils.column(SimHashExpr(ExpressionUtils.expression(words), bits))
}

/** rolling_fingerprint(words): h ← (h·31 + wordhash) mod 1000000007 folded
  * left-to-right over the word array, wordhash = the first 4 hex chars of
  * the word's md5 (order-sensitive document fingerprint). Bit-identical
  * to the interpreted spelling `aggregate(words, 0L, (acc, w) ->
  * (acc·31 + conv(substr(md5(w),1,4),16,10)) % p)` — which evaluated an
  * interpreted lambda plus a full md5→hex→conv expression tree per word,
  * per row — and to the DuckDB oracle's list_reduce replay. A null word
  * poisons the fold to null (null propagation through the lambda), which
  * this kernel reproduces.
  */
object RollingHashUtil {
  def fingerprint(words: ArrayData, hexChars: Int, mult: Long,
      mod: Long): java.lang.Long = {
    val nBytes = hexChars / 2
    val md = TextExprUtil.md5()
    var acc = 0L
    val n = words.numElements()
    var i = 0
    while (i < n) {
      if (words.isNullAt(i)) return null
      md.reset()
      val digest = md.digest(words.getUTF8String(i).getBytes)
      var h = 0L
      var k = 0
      while (k < nBytes) { h = (h << 8) | (digest(k) & 0xffL); k += 1 }
      acc = (acc * mult + h) % mod
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }
}

case class RollingHashExpr(child: Expression, hexChars: Int, mult: Long,
    mod: Long) extends UnaryExpression with ExpectsInputTypes {
  require(hexChars > 0 && hexChars % 2 == 0 && hexChars <= 14,
    "rolling_fingerprint requires an even hexChars in 2..14")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  // null from non-null input: a null word element poisons the fold
  override def nullable: Boolean = true
  override def prettyName: String = "rolling_fingerprint"

  override def nullSafeEval(a: Any): Any = {
    val r = RollingHashUtil.fingerprint(a.asInstanceOf[ArrayData], hexChars, mult, mod)
    if (r == null) null else r.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val tmp = ctx.freshName("fp")
      s"""
         |java.lang.Long $tmp = org.apache.spark.sql.graftexpr.RollingHashUtil
         |  .fingerprint($a, $hexChars, ${mult}L, ${mod}L);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHashExpr =
    copy(child = newChild)
}

object RollingHashExpr {
  def column(words: Column, hexChars: Int, mult: Long, mod: Long): Column =
    ExpressionUtils.column(
      RollingHashExpr(ExpressionUtils.expression(words), hexChars, mult, mod))
}

/** l2sq(a, b): Σ (a[i]−b[i])² with per-element double widening, folded
  * left-to-right — squared L2 distance between a float embedding and a
  * double centroid. Bit-identical to the interpreted
  * `aggregate(zip_with(a, b, (x,y) -> (x-y)²), 0.0, +)` fold it replaces
  * (the k-means inner loop evaluated that lambda chain per element per
  * vector×centroid pair) and to the DuckDB oracle's list_reduce replay.
  * Null element or length mismatch → null (zip_with null-pad semantics).
  */
case class L2SqExpr(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "l2sq"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    if (xs.numElements() != ys.numElements()) return null
    val n = xs.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      val d = xs.getFloat(i).toDouble - ys.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |double $acc = 0.0;
         |if ($a.numElements() != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  int $n = $a.numElements();
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $d = (double) $a.getFloat($i) - $b.getDouble($i);
         |    $acc += $d * $d;
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2SqExpr =
    copy(left = newLeft, right = newRight)
}

object L2SqExpr {
  def column(a: Column, b: Column): Column =
    ExpressionUtils.column(
      L2SqExpr(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

/** pq_adc(codes, lut, k): asymmetric-distance lookup for product
  * quantization — Σ_s lut[s·k + codes[s]], folded left-to-right in
  * subspace order. `codes` is a vector's per-subspace codeword ids,
  * `lut` a query's dense (m·k) table of squared sub-distances to every
  * codeword (missing codewords hold null: they are never assigned, so a
  * null read means corrupt codes and poisons the sum to null, as does an
  * out-of-range code). O(m) per pair inside whole-stage codegen — the
  * memory-bound "scan 8-byte codes, not 256-byte floats" inner loop that
  * makes PQ the 100 TB ANN shape.
  */
case class PqAdcExpr(left: Expression, right: Expression, k: Int)
  extends BinaryExpression with ExpectsInputTypes {
  require(k >= 1, "pq_adc requires k >= 1")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(IntegerType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    var acc = 0.0
    var s = 0
    while (s < m) {
      if (codes.isNullAt(s)) return null
      val idx = s * k + codes.getInt(s)
      if (idx < 0 || idx >= lut.numElements() || lut.isNullAt(idx)) return null
      acc += lut.getDouble(idx)
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      val idx = ctx.freshName("idx")
      val acc = ctx.freshName("acc")
      s"""
         |int $m = $a.numElements();
         |double $acc = 0.0;
         |for (int $s = 0; $s < $m; $s++) {
         |  if ($a.isNullAt($s)) { ${ev.isNull} = true; break; }
         |  int $idx = $s * $k + $a.getInt($s);
         |  if ($idx < 0 || $idx >= $b.numElements() || $b.isNullAt($idx)) {
         |    ${ev.isNull} = true; break;
         |  }
         |  $acc += $b.getDouble($idx);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcExpr =
    copy(left = newLeft, right = newRight)
}

object PqAdcExpr {
  def column(codes: Column, lut: Column, k: Int): Column =
    ExpressionUtils.column(
      PqAdcExpr(ExpressionUtils.expression(codes), ExpressionUtils.expression(lut), k))
}

/** A LOADED merge table for character-level greedy-merge BPE (Sennrich
  * et al. 2016, public paper; the merge loop is the GPT-2 reference
  * algorithm, also public): start from a word's code points, repeatedly
  * find the LOWEST-ranked adjacent symbol pair in the table and fuse all
  * of its occurrences left-to-right, until no listed pair remains.
  *
  * Serializable by design: an instance rides the expression tree to
  * executors (via `addReferenceObj`), so a table loaded from a real
  * trained merges.txt on the driver works on a 1000-executor cluster
  * with no shared static state — only the pair list serializes; the
  * rank index and memo cache rebuild lazily per JVM.
  */
final class BpeTable(val merges: IndexedSeq[(String, String)])
    extends Serializable {

  @transient private lazy val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    merges.zipWithIndex.foreach { case ((l, r), i) => m.put(l + " " + r, i) }
    m
  }

  /** Per-thread word→pieceCount cache (the GPT-2 implementation's `cache`
    * dict): natural-language corpora repeat words heavily, so most rows
    * skip the merge loop entirely. Bounded — cleared past 50k entries —
    * so a high-cardinality corpus can't grow executor heap unboundedly.
    */
  @transient private lazy val cache: ThreadLocal[java.util.HashMap[String, Integer]] =
    ThreadLocal.withInitial(() => new java.util.HashMap[String, Integer]())

  def pieceCount(word: String): Int = {
    if (word.isEmpty) return 0
    val c = cache.get()
    val hit = c.get(word)
    if (hit != null) return hit.intValue()
    var syms: Array[String] =
      word.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
    var merging = true
    while (merging && syms.length > 1) {
      var best = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.get(syms(i) + " " + syms(i + 1))
        if (r != null && r.intValue() < best) best = r.intValue()
        i += 1
      }
      if (best == Int.MaxValue) merging = false
      else {
        val (l, rr) = merges(best)
        // fuse ALL occurrences of the best pair, one left-to-right pass
        // over the current symbols (merged output does not re-merge this
        // round — the reference algorithm's single-pass semantics)
        val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == rr) {
            out += (l + rr); j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.toArray
      }
    }
    if (c.size() > 50000) c.clear()
    c.put(word, Integer.valueOf(syms.length))
    syms.length
  }

  /** Total BPE piece count over a word array — the per-document subword
    * budget [[graft.ext.TextAnalysis.packSequences]] can pack by.
    */
  def tokenCount(words: ArrayData): Long = {
    var total = 0L
    var i = 0
    val n = words.numElements()
    while (i < n) {
      if (!words.isNullAt(i))
        total += pieceCount(words.getUTF8String(i).toString)
      i += 1
    }
    total
  }

  override def equals(other: Any): Boolean = other match {
    case t: BpeTable => t.merges == merges
    case _ => false
  }
  override def hashCode(): Int = merges.hashCode()
}

object BpeUtil {

  /** Parse the public GPT-2 `merges.txt` format: an optional `#version`
    * header (and any other `#` comment lines), then one
    * `left<space>right` pair per line, rank = line order. This is how a
    * real deployment loads a TRAINED tokenizer's merge list; the bundled
    * fixture ([[Merges]]) is the same format.
    */
  def parseMerges(lines: Iterator[String]): IndexedSeq[(String, String)] =
    lines.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val sp = l.split(" ", 2)
        require(sp.length == 2 && sp(0).nonEmpty && sp(1).nonEmpty,
          s"malformed merges.txt line: '$l'")
        (sp(0), sp(1))
      }.toIndexedSeq

  def parseMerges(text: String): IndexedSeq[(String, String)] =
    parseMerges(text.linesIterator)

  /** The deterministic fixture table, loaded from the bundled
    * GPT-2-format `merges.txt` resource — common English letter pairs in
    * the shape a trained Sennrich merges table has. Swap in a real
    * trained file via [[parseMerges]] + [[BpeTable]].
    */
  val Merges: IndexedSeq[(String, String)] = {
    val in = getClass.getResourceAsStream("/graft/bpe/merges.txt")
    require(in != null, "bundled /graft/bpe/merges.txt resource missing")
    try parseMerges(scala.io.Source.fromInputStream(in, "UTF-8").getLines())
    finally in.close()
  }

  val Default: BpeTable = new BpeTable(Merges)
}

/** bpe_tokens(words): total greedy-merge BPE piece count of an
  * array<string> column — one codegen'd call per row against the
  * expression's own [[BpeTable]] (shipped to executors as a codegen
  * reference object, not static state).
  */
case class BpeTokensExpr(child: Expression,
    merges: Seq[(String, String)] = BpeUtil.Merges)
  extends UnaryExpression with ExpectsInputTypes {

  @transient private lazy val table: BpeTable =
    if (merges == BpeUtil.Merges) BpeUtil.Default
    else new BpeTable(merges.toIndexedSeq)

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_tokens"

  override def nullSafeEval(a: Any): Any =
    table.tokenCount(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table,
      classOf[BpeTable].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.tokenCount($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokensExpr =
    copy(child = newChild)
}

object BpeTokensExpr {
  def column(words: Column): Column =
    ExpressionUtils.column(BpeTokensExpr(ExpressionUtils.expression(words)))
  def column(words: Column, merges: Seq[(String, String)]): Column =
    ExpressionUtils.column(BpeTokensExpr(ExpressionUtils.expression(words), merges))
}

/** NFC Unicode normalization (canonical composition) of a string column —
  * the normalization pass every ingest pipeline runs before hashing or
  * dedup (decomposed `e`+U+0301 and composed U+00E9 must compare equal).
  * Fast path: `Normalizer.isNormalized` is an allocation-free scan that
  * short-circuits for already-NFC text — the overwhelming majority of a
  * real corpus — so the common row costs one pass and zero copies.
  */
object NfcUtil {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

case class NfcExpr(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(a: Any): Any =
    NfcUtil.nfc(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graftexpr.NfcUtil.nfc($a);")

  override protected def withNewChildInternal(newChild: Expression): NfcExpr =
    copy(child = newChild)
}

object NfcExpr {
  def column(text: Column): Column =
    ExpressionUtils.column(NfcExpr(ExpressionUtils.expression(text)))
}

/** scatter_longs(entries, n): dense long[n] from sparse (pos, value)
  * struct entries — out[pos] = value, everything else 0. O(entries + n),
  * the in-plan replacement for a driver-side scatter loop (an element_at
  * over a map column is a LINEAR probe per position — a dense assembly
  * spelled that way is O(n·entries), which hung at 2^17 words). Built for
  * the Bloom bitmap build side, which evaluates it once per (single-row)
  * aggregate output, so interpreted eval would suffice — codegen is
  * provided because it is two lines. Out-of-range positions are ignored
  * rather than thrown: the producer derives positions from `pos % m` so
  * they are in range by construction, and a defensive throw would turn a
  * corrupt upstream row into a query abort inside a broadcast build.
  */
object ScatterLongsUtil {
  def scatter(entries: ArrayData, n: Int): ArrayData = {
    val out = new Array[Long](n)
    val m = entries.numElements()
    var i = 0
    while (i < m) {
      if (!entries.isNullAt(i)) {
        val e = entries.getStruct(i, 2)
        val p = e.getInt(0)
        if (p >= 0 && p < n) out(p) = e.getLong(1)
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class ScatterLongsExpr(child: Expression, n: Int)
  extends UnaryExpression with ExpectsInputTypes {
  require(n > 0, "scatter_longs requires n > 0")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(
    StructType(Seq(StructField("pos", IntegerType), StructField("v", LongType)))))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "scatter_longs"

  override def nullSafeEval(a: Any): Any =
    ScatterLongsUtil.scatter(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graftexpr.ScatterLongsUtil.scatter($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): ScatterLongsExpr =
    copy(child = newChild)
}

object ScatterLongsExpr {
  def column(entries: Column, n: Int): Column =
    ExpressionUtils.column(ScatterLongsExpr(ExpressionUtils.expression(entries), n))
}
