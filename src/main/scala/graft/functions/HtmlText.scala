// Hosted under org.apache.spark.sql so the expression can use the
// private[sql] ExpressionUtils surface — same pattern as VecDot.scala.
// Public API re-exported from graft.functions (TextExprsApi.scala).
package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass HTML visible-text extraction — the boilerplate-strip step a
  * web-corpus pipeline runs before any curation gate sees the text
  * (WET extraction in the Common Crawl / CCNet / C4 lineage, all public).
  *
  * A single byte walk over the UTF-8 input (multi-byte sequences copy
  * through untouched — all HTML syntax is ASCII):
  *  - `<script …>…</script>` and `<style …>…</style>` blocks drop whole
  *    (tag match is ASCII-case-insensitive);
  *  - `<!-- … -->` comments drop;
  *  - every other `<…>` tag drops; each dropped region emits one word
  *    boundary; an opening `<a` tag counts toward `n_links` (the link-
  *    density signal boilerplate classifiers key on);
  *  - the six ubiquitous entities decode (`&amp; &lt; &gt; &quot; &#39;
  *    &nbsp;` — nbsp to plain space); unknown entities copy literally;
  *  - whitespace runs (space/tab/CR/LF and emitted boundaries) collapse
  *    to one space; leading/trailing space trims.
  *
  * Untrusted-input posture: never throws — an unterminated tag, comment,
  * or script block consumes to end-of-input (the conservative reading),
  * and output is bounded by input length. Equivalent for well-formed
  * input to the regex-chain spelling (strip scripts → styles → comments
  * → tags, decode entities, collapse `\s+`, trim) that the DuckDB oracle
  * replays; decoded entities are data, never re-parsed as markup, exactly
  * as the chain ordering implies.
  *
  * Scan-speed by construction: one pass, no allocation beyond the output
  * buffer, whole-stage codegen with one static call per row — where the
  * chain spelling re-scans the document once per regex (6×) per row.
  */
object HtmlTextUtil {

  private def isSpace(c: Byte): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r'

  private def lower(c: Byte): Byte =
    if (c >= 'A' && c <= 'Z') (c + 32).toByte else c

  /** True if `b[i..]` starts with ASCII `lit` case-insensitively. */
  private def matchesCi(b: Array[Byte], i: Int, lit: String): Boolean = {
    if (i + lit.length > b.length) return false
    var k = 0
    while (k < lit.length) {
      if (lower(b(i + k)) != lit.charAt(k)) return false
      k += 1
    }
    true
  }

  /** Exact (case-sensitive) ASCII prefix match — entity names are
    * case-sensitive, and the oracle's literal `replace` chain is too.
    */
  private def matchesExact(b: Array[Byte], i: Int, lit: String): Boolean = {
    if (i + lit.length > b.length) return false
    var k = 0
    while (k < lit.length) {
      if (b(i + k) != lit.charAt(k)) return false
      k += 1
    }
    true
  }

  /** Index just past the first occurrence of `lit` at/after `from`
    * (case-insensitive), or b.length if absent.
    */
  private def skipPast(b: Array[Byte], from: Int, lit: String): Int = {
    var i = from
    val last = b.length - lit.length
    while (i <= last) {
      if (matchesCi(b, i, lit)) return i + lit.length
      i += 1
    }
    b.length
  }

  /** Index just past the next `>` at/after `from`, or b.length. */
  private def pastTagEnd(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i < b.length) {
      if (b(i) == '>') return i + 1
      i += 1
    }
    b.length
  }

  private val Entities: Array[(String, Byte)] = Array(
    ("&amp;", '&'.toByte), ("&lt;", '<'.toByte), ("&gt;", '>'.toByte),
    ("&quot;", '"'.toByte), ("&#39;", '\''.toByte), ("&nbsp;", ' '.toByte))

  def extract(html: UTF8String): InternalRow = {
    val b = html.getBytes
    val n = b.length
    val buf = new Array[Byte](n)
    var o = 0
    var links = 0L
    // pending=true means "emit one space before the next visible byte" —
    // this both collapses runs and trims leading space for free
    var pending = false
    var started = false
    var i = 0
    while (i < n) {
      val c = b(i)
      if (c == '<') {
        if (matchesCi(b, i, "<!--")) i = skipPast(b, i + 4, "-->")
        else if (matchesCi(b, i, "<script"))
          i = pastTagEnd(b, skipPast(b, i + 7, "</script"))
        else if (matchesCi(b, i, "<style"))
          i = pastTagEnd(b, skipPast(b, i + 6, "</style"))
        else {
          if (i + 1 < n && lower(b(i + 1)) == 'a' &&
              (i + 2 >= n || isSpace(b(i + 2)) || b(i + 2) == '>' || b(i + 2) == '/'))
            links += 1
          i = pastTagEnd(b, i + 1)
        }
        pending = true
      } else if (c == '&') {
        var e = 0
        var hit = -1
        while (hit < 0 && e < Entities.length) {
          if (matchesExact(b, i, Entities(e)._1)) hit = e
          e += 1
        }
        if (hit >= 0) {
          val d = Entities(hit)._2
          if (d == ' ') pending = true
          else {
            if (pending && started) { buf(o) = ' '; o += 1 }
            buf(o) = d; o += 1
            pending = false; started = true
          }
          i += Entities(hit)._1.length
        } else {
          if (pending && started) { buf(o) = ' '; o += 1 }
          buf(o) = '&'; o += 1
          pending = false; started = true
          i += 1
        }
      } else if (isSpace(c)) {
        pending = true
        i += 1
      } else {
        if (pending && started) { buf(o) = ' '; o += 1 }
        buf(o) = c; o += 1
        pending = false; started = true
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](UTF8String.fromBytes(buf, 0, o), links))
  }
}

/** `html_text(html)`: struct(text, n_links) — see [[HtmlTextUtil]]. */
final case class HtmlTextExpr(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("n_links", LongType, nullable = false)))
  override def prettyName: String = "html_text"

  override def nullSafeEval(in: Any): Any =
    HtmlTextUtil.extract(in.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftexpr.HtmlTextUtil.extract($c);")

  override protected def withNewChildInternal(newChild: Expression): HtmlTextExpr =
    copy(child = newChild)
}

object HtmlTextExpr {
  def column(html: Column): Column =
    ExpressionUtils.column(HtmlTextExpr(ExpressionUtils.expression(html)))
}
