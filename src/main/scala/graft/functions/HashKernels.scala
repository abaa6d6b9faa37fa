// Hosted under org.apache.spark.sql so the expressions can use the
// private[sql] ExpressionUtils surface — same pattern as TextExprs.scala.
// Public API re-exported from graft.functions (TextExprsApi.scala).
package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-row hashing kernels for the dedup chain (optimization r21).
  *
  * The MinHash/passage stages were spelled as interpreted higher-order
  * functions (`transform` has no codegen and no subexpression elimination):
  * per window, concat_ws built a shingle string through a lambda, md5
  * rendered a 32-char HEX STRING, substring sliced it, and conv re-parsed
  * the slice as a decimal — four allocations plus an interpreted-eval tree
  * per window, per document. These kernels compute the identical values in
  * one codegen'd call per row: the window is joined with
  * `UTF8String.concatWs` (exactly concat_ws's null-skipping semantics), the
  * digest prefix is read straight from the raw MD5 bytes, and only the
  * operator's actual output (4 signature longs / one hex string per
  * window) is allocated. Bit-identical by construction — the decimal value
  * of the first K hex chars of an md5 IS the top 4·K bits of the digest —
  * and pinned against the column spelling by HashKernelsSpec.
  */
object HashKernelUtil {

  /** Unsigned value of the first `hexChars` hex chars of `digest` —
    * identical to `conv(substring(hex, 1, hexChars), 16, 10)` for
    * hexChars <= 15 (fits signed 64-bit, always non-negative).
    */
  def digestPrefix(digest: Array[Byte], hexChars: Int): Long = {
    var h = 0L
    var c = 0
    while (c < hexChars) {
      val b = digest(c >> 1) & 0xff
      val nib = if ((c & 1) == 0) b >>> 4 else b & 0xf
      h = (h << 4) | nib
      c += 1
    }
    h
  }

  /** Unsigned value of hex chars [fromChar, fromChar+hexChars) (0-based)
    * of `digest` — identical to
    * `conv(substring(hex, fromChar + 1, hexChars), 16, 10)` for
    * hexChars <= 15.
    */
  def digestRange(digest: Array[Byte], fromChar: Int, hexChars: Int): Long = {
    var h = 0L
    var c = fromChar
    val end = fromChar + hexChars
    while (c < end) {
      val b = digest(c >> 1) & 0xff
      val nib = if ((c & 1) == 0) b >>> 4 else b & 0xf
      h = (h << 4) | nib
      c += 1
    }
    h
  }

  private val HexDigits = "0123456789abcdef".toCharArray

  /** Lowercase hex rendering of a digest — Spark's `md5()` output form. */
  def hexString(digest: Array[Byte]): UTF8String = {
    val out = new Array[Byte](digest.length * 2)
    var i = 0
    while (i < digest.length) {
      val b = digest(i) & 0xff
      out(2 * i) = HexDigits(b >>> 4).toByte
      out(2 * i + 1) = HexDigits(b & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** All MinHash signatures of the n-word shingles of `words` in ONE pass:
    * per full window, shingle = concat_ws(" ", window) (nulls skipped),
    * h = value of the first `prefixHex` hex chars of md5(shingle), and
    * sig_i = min over windows of ((h % p)·a_i + b_i) % p. Fewer than one
    * full window → all-null signatures (array_min of an empty transform).
    */
  def minhashSigs(words: ArrayData, n: Int, prefixHex: Int, p: Long,
      as: Array[Long], bs: Array[Long]): GenericInternalRow = {
    val sz = words.numElements()
    val nw = sz - n + 1
    val nSigs = as.length
    if (nw <= 0) return new GenericInternalRow(new Array[Any](nSigs))
    val md = TextExprUtil.md5()
    val sep = UTF8String.fromString(" ")
    val mins = Array.fill(nSigs)(Long.MaxValue)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < nw) {
      var k = 0
      while (k < n) {
        parts(k) = if (words.isNullAt(i + k)) null else words.getUTF8String(i + k)
        k += 1
      }
      md.reset()
      val digest = md.digest(UTF8String.concatWs(sep, parts: _*).getBytes)
      val h = digestPrefix(digest, prefixHex)
      val hp = h % p
      var s = 0
      while (s < nSigs) {
        val v = (hp * as(s) + bs(s)) % p
        if (v < mins(s)) mins(s) = v
        s += 1
      }
      i += 1
    }
    val out = new Array[Any](nSigs)
    var s = 0
    while (s < nSigs) { out(s) = mins(s); s += 1 }
    new GenericInternalRow(out)
  }

  /** The (pos, md5-hex) passage-window rows of `words`: one window of
    * `window` words every `stride` words, pos = start word index,
    * phash = md5 hex of the concat_ws(" ")-joined window. Fewer words
    * than one window → empty array.
    */
  def passageHashes(words: ArrayData, window: Int, stride: Int): ArrayData = {
    val sz = words.numElements()
    if (sz < window) return new GenericArrayData(Array.empty[Any])
    val nWins = (sz - window) / stride + 1
    val md = TextExprUtil.md5()
    val sep = UTF8String.fromString(" ")
    val parts = new Array[UTF8String](window)
    val out = new Array[Any](nWins)
    var j = 0
    while (j < nWins) {
      val start = j * stride
      var k = 0
      while (k < window) {
        parts(k) =
          if (words.isNullAt(start + k)) null else words.getUTF8String(start + k)
        k += 1
      }
      md.reset()
      val digest = md.digest(UTF8String.concatWs(sep, parts: _*).getBytes)
      out(j) = new GenericInternalRow(Array[Any](start, hexString(digest)))
      j += 1
    }
    new GenericArrayData(out)
  }

  /** The span-removal rebuild of [[graft.ext.Dedup.removeDupSpans]] in one
    * merge scan: word i is removed iff some start p in the (ASCENDING-
    * sorted) `starts` satisfies p <= i < p + window. Because starts are
    * sorted, max(p + window) over p <= i is the LAST processed start +
    * window, so one pointer sweep decides coverage in O(words + starts)
    * instead of the interpreted `filter(zip_with(...), exists(...))`'s
    * O(words × starts) lambda tree. Returns (n_kept, text_dedup) where
    * n_kept counts every kept element (nulls included — `size()`
    * semantics) and text_dedup joins kept elements with a single space,
    * skipping nulls (`concat_ws` semantics). split() never produces
    * nulls, but the parity is kept exact anyway.
    */
  def removeSpans(words: ArrayData, starts: ArrayData,
      window: Int): GenericInternalRow = {
    val n = words.numElements()
    val ns = starts.numElements()
    val keptWords = new java.util.ArrayList[UTF8String](n)
    var kept = 0
    var j = 0
    var coverEnd = -1 // exclusive end of the union of processed windows
    var i = 0
    while (i < n) {
      while (j < ns && !starts.isNullAt(j) && starts.getInt(j) <= i) {
        val e = starts.getInt(j) + window
        if (e > coverEnd) coverEnd = e
        j += 1
      }
      if (i >= coverEnd) {
        kept += 1
        keptWords.add(if (words.isNullAt(i)) null else words.getUTF8String(i))
      }
      i += 1
    }
    val sep = UTF8String.fromString(" ")
    val joined = UTF8String.concatWs(sep,
      keptWords.toArray(new Array[UTF8String](keptWords.size)): _*)
    new GenericInternalRow(Array[Any](kept, joined))
  }
}

/** remove_spans(words, starts): struct<n_kept:int, text_dedup:string> —
  * the span-removal rebuild stage of [[graft.ext.Dedup.removeDupSpans]],
  * one codegen'd merge scan per row.
  */
case class RemoveSpansExpr(left: Expression, right: Expression, window: Int)
  extends BinaryExpression with ExpectsInputTypes {
  require(window >= 1, "remove_spans requires window >= 1")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), ArrayType(IntegerType))
  override def dataType: DataType = StructType(Seq(
    StructField("n_kept", IntegerType, nullable = false),
    StructField("text_dedup", StringType, nullable = false)))
  override def prettyName: String = "remove_spans"

  override def nullSafeEval(w: Any, s: Any): Any =
    HashKernelUtil.removeSpans(w.asInstanceOf[ArrayData],
      s.asInstanceOf[ArrayData], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, s) =>
      s"""${ev.value} = org.apache.spark.sql.graftexpr.HashKernelUtil
         |  .removeSpans($w, $s, $window);""".stripMargin)

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): RemoveSpansExpr =
    copy(left = newLeft, right = newRight)
}

object RemoveSpansExpr {
  def column(words: Column, starts: Column, window: Int): Column =
    ExpressionUtils.column(RemoveSpansExpr(
      ExpressionUtils.expression(words), ExpressionUtils.expression(starts),
      window))
}

/** minhash_sigs(words): struct(sig0..sig{k-1}) — the fused
  * shingle→md5-prefix→universal-hash→min chain of
  * [[graft.ext.Dedup.minhashSignatures]], one codegen'd call per row.
  */
case class MinhashSigsExpr(child: Expression, n: Int, prefixHex: Int,
    p: Long, as: Seq[Long], bs: Seq[Long])
  extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, "minhash_sigs requires n >= 1")
  require(prefixHex >= 1 && prefixHex <= 15,
    "minhash_sigs requires prefixHex in 1..15 (signed-64 safe)")
  require(as.nonEmpty && as.length == bs.length,
    "minhash_sigs requires matching non-empty a/b parameter lists")

  @transient private lazy val asArr = as.toArray
  @transient private lazy val bsArr = bs.toArray

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = StructType(
    as.indices.map(i => StructField(s"sig$i", LongType, nullable = true)))
  override def prettyName: String = "minhash_sigs"

  override def nullSafeEval(a: Any): Any =
    HashKernelUtil.minhashSigs(a.asInstanceOf[ArrayData], n, prefixHex, p,
      asArr, bsArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("minhashAs", asArr, "long[]")
    val bsRef = ctx.addReferenceObj("minhashBs", bsArr, "long[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = org.apache.spark.sql.graftexpr.HashKernelUtil
         |  .minhashSigs($a, $n, $prefixHex, ${p}L, $asRef, $bsRef);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSigsExpr =
    copy(child = newChild)
}

object MinhashSigsExpr {
  def column(words: Column, n: Int, prefixHex: Int, p: Long,
      as: Seq[Long], bs: Seq[Long]): Column =
    ExpressionUtils.column(
      MinhashSigsExpr(ExpressionUtils.expression(words), n, prefixHex, p, as, bs))
}

/** passage_hashes(words, window, stride): array<struct<pos:int,
  * phash:string>> — the fused rolling-window md5 stage of
  * [[graft.ext.Dedup.duplicatePassages]]/[[graft.ext.Dedup.removeDupSpans]],
  * one codegen'd call per row.
  */
case class PassageHashesExpr(child: Expression, window: Int, stride: Int)
  extends UnaryExpression with ExpectsInputTypes {
  require(window >= 1 && stride >= 1,
    "passage_hashes requires window >= 1 and stride >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("phash", StringType, nullable = false))), containsNull = false)
  override def prettyName: String = "passage_hashes"

  override def nullSafeEval(a: Any): Any =
    HashKernelUtil.passageHashes(a.asInstanceOf[ArrayData], window, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = org.apache.spark.sql.graftexpr.HashKernelUtil
         |  .passageHashes($a, $window, $stride);""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): PassageHashesExpr =
    copy(child = newChild)
}

object PassageHashesExpr {
  def column(words: Column, window: Int, stride: Int): Column =
    ExpressionUtils.column(
      PassageHashesExpr(ExpressionUtils.expression(words), window, stride))
}
