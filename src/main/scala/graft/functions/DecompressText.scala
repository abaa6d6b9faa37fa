// Hosted under org.apache.spark.sql so the expression can use the
// private[sql] ExpressionUtils surface — same pattern as VecDot.scala.
// Public API re-exported from graft.functions (TextExprsApi.scala).
package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `decompress_text(bin)`: decode a compressed binary column to its UTF-8
  * text, inside the scan, dispatching on the frame magic — gzip (1f 8b)
  * and zstd (28 b5 2f fd), the two codecs real corpora ship. NULL on
  * unknown magic, malformed, truncated, CRC-failing, or over-`maxBytes`
  * input ([[graft.ext.Gzip.decompress]]'s zip-bomb guard) — and on a
  * frame that inflates fine but is NOT valid UTF-8: this is the *_text*
  * reader, and handing back a mis-typed byte smear would silently corrupt
  * every comparison and hash downstream (the corruption-oracle contract —
  * a bad input reads as NULL, never as plausible garbage).
  */
object DecompressTextUtil {
  private val utf8 = ThreadLocal.withInitial[java.nio.charset.CharsetDecoder](() =>
    java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT))

  def decompress(bin: Array[Byte], maxBytes: Int): UTF8String =
    graft.ext.Gzip.decompress(bin, maxBytes) match {
      case Some(b) =>
        val valid =
          try { utf8.get().decode(java.nio.ByteBuffer.wrap(b)); true }
          catch { case _: java.nio.charset.CharacterCodingException => false }
        if (valid) UTF8String.fromBytes(b) else null
      case None => null
    }
}

final case class DecompressTextExpr(child: Expression, maxBytes: Int)
  extends UnaryExpression with ExpectsInputTypes {
  require(maxBytes > 0, "decompress_text requires maxBytes > 0")

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "decompress_text"

  override def nullSafeEval(in: Any): Any =
    DecompressTextUtil.decompress(in.asInstanceOf[Array[Byte]], maxBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
        ${ev.value} = org.apache.spark.sql.graftexpr.DecompressTextUtil.decompress($c, $maxBytes);
        ${ev.isNull} = ${ev.value} == null;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): DecompressTextExpr =
    copy(child = newChild)
}

object DecompressTextExpr {
  def column(bin: Column, maxBytes: Int): Column =
    ExpressionUtils.column(DecompressTextExpr(ExpressionUtils.expression(bin), maxBytes))
}
