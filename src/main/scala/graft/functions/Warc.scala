// Hosted under org.apache.spark.sql so the expression can use the
// private[sql] ExpressionUtils surface — same pattern as VecDot.scala.
// Public API re-exported from graft.functions (TextExprsApi.scala).
package org.apache.spark.sql.graftexpr

import java.nio.charset.StandardCharsets
import java.util.Locale

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass parser for concatenated uncompressed WARC/1.x records — the
  * container shape of Common-Crawl-style web archives (ISO 28500): per
  * record a CRLF-terminated header block (`WARC/1.x` version line +
  * `Name: value` fields), a blank line, `Content-Length` payload bytes,
  * and a CRLF CRLF record separator.
  *
  * Untrusted-input rules (same stance as the image/audio walks): byte
  * positions advance through Long arithmetic before any bounds compare, a
  * hostile `Content-Length` (negative, non-numeric, overflowing, or past
  * the buffer) terminates the walk, payloads are capped, and a truncated
  * or malformed tail yields the records parsed so far — never a throw.
  * Records-per-blob and payload size are bounded (zip-bomb-shaped guard).
  */
object WarcUtil {

  private val MaxRecords = 4096
  private val MaxPayload = 1 << 26

  private val Fields = 5 // rec_type, uri, content_length, payload, payload_text

  // Payload bytes are UNTRUSTED and routinely non-text (Common-Crawl
  // response records carry gzip/image bodies). The raw bytes travel as
  // BinaryType; `payload_text` is the REPORT-mode UTF-8 decode — null for
  // any malformed byte — so text operators downstream never see a
  // mis-typed string that would corrupt comparisons and hashes silently.
  private val utf8 = ThreadLocal.withInitial[java.nio.charset.CharsetDecoder](() =>
    StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT))

  private def validUtf8(b: Array[Byte], off: Int, len: Int): Boolean =
    try { utf8.get().decode(java.nio.ByteBuffer.wrap(b, off, len)); true }
    catch { case _: java.nio.charset.CharacterCodingException => false }

  /** Index of the first CRLF CRLF at or after `from`, or -1. */
  private def blankLine(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  /** The complete records of `bin`, in order: array of
    * struct(rec_type, uri, content_length, payload). Empty array when the
    * blob holds no complete record.
    */
  def records(bin: Array[Byte]): ArrayData = {
    val out = new java.util.ArrayList[AnyRef]()
    val n = bin.length.toLong
    var pos = 0L
    var go = true
    while (go && out.size < MaxRecords) {
      // version line must open the record
      if (pos + 5 > n ||
        bin(pos.toInt) != 'W' || bin(pos.toInt + 1) != 'A' ||
        bin(pos.toInt + 2) != 'R' || bin(pos.toInt + 3) != 'C' ||
        bin(pos.toInt + 4) != '/') { go = false }
      else {
        val hdrEnd = blankLine(bin, pos.toInt)
        if (hdrEnd < 0) go = false
        else {
          val hdr = new String(bin, pos.toInt, hdrEnd - pos.toInt,
            StandardCharsets.UTF_8)
          var recType: UTF8String = null
          var uri: UTF8String = null
          var clen = -1L
          for (ln <- hdr.split("\r\n").iterator.drop(1)) {
            val c = ln.indexOf(':')
            if (c > 0) {
              val v = ln.substring(c + 1).trim
              ln.substring(0, c).trim.toLowerCase(Locale.ROOT) match {
                case "warc-type" => recType = UTF8String.fromString(v)
                case "warc-target-uri" => uri = UTF8String.fromString(v)
                case "content-length" =>
                  clen = try v.toLong catch {
                    case _: NumberFormatException => -1L
                  }
                case _ => ()
              }
            }
          }
          val payloadStart = hdrEnd + 4L
          if (clen < 0 || clen > MaxPayload || payloadStart + clen > n) go = false
          else {
            val payload =
              java.util.Arrays.copyOfRange(bin, payloadStart.toInt,
                (payloadStart + clen).toInt)
            val payloadText =
              if (validUtf8(bin, payloadStart.toInt, clen.toInt))
                UTF8String.fromBytes(bin, payloadStart.toInt, clen.toInt)
              else null
            out.add(new GenericInternalRow(
              Array[Any](recType, uri, clen, payload, payloadText)))
            pos = payloadStart + clen
            // the CRLF CRLF record separator must follow; a blob ending
            // mid-separator keeps the record but ends the walk
            if (pos + 4 <= n &&
              bin(pos.toInt) == '\r' && bin(pos.toInt + 1) == '\n' &&
              bin(pos.toInt + 2) == '\r' && bin(pos.toInt + 3) == '\n')
              pos += 4
            else go = false
          }
        }
      }
    }
    new GenericArrayData(out.toArray)
  }
}

/** `warc_records(bin)` — see [[WarcUtil]]. Deterministic; one static call
  * per row, so the enclosing projection stays in whole-stage codegen.
  */
final case class WarcRecordsExpr(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("rec_type", StringType, nullable = true),
    StructField("uri", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    // REPORT-mode UTF-8 decode of payload; null when the bytes are not
    // valid UTF-8 (binary bodies must not masquerade as strings)
    StructField("payload_text", StringType, nullable = true))),
    containsNull = false)
  override def prettyName: String = "warc_records"

  override def nullSafeEval(in: Any): Any =
    WarcUtil.records(in.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftexpr.WarcUtil.records($c);")

  override protected def withNewChildInternal(newChild: Expression): WarcRecordsExpr =
    copy(child = newChild)
}

object WarcRecordsExpr {
  def column(bin: Column): Column =
    ExpressionUtils.column(WarcRecordsExpr(ExpressionUtils.expression(bin)))
}
