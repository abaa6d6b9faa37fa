// Hosted under org.apache.spark.sql so the expression can use the
// private[sql] ExpressionUtils surface — same pattern as VecDot.scala.
// Public API re-exported from graft.functions (TextExprsApi.scala).
package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled language lexicons for [[LangScoresExpr]]: word lists (scored
  * over the lowercased whitespace tokens) and character lists (scored over
  * the raw string — the CJK path). Built once, shipped to executors inside
  * the codegen reference array; the per-row work is one token walk + one
  * char walk with O(1) hash probes.
  *
  * Bit-parity contract with the Column spelling it replaces
  * (`size(filter(split(lower(text)," ",-1), isin(words)))` per language +
  * `regexp_count(text, '[chars]')` per char language):
  *  - lowercasing is `UTF8String.toLowerCase` — the exact kernel Spark's
  *    `lower()` calls, so non-ASCII case mapping is identical;
  *  - tokens split on every single space (empties can't match: the empty
  *    string is never a lexicon word);
  *  - char hits iterate UTF-16 units; lexicon chars are all BMP, and a
  *    surrogate half never equals a BMP char, so counts equal the regexp's
  *    code-point matches.
  *
  * A case class so two independently-built lexicons with the same lists
  * compare equal — expression equality is what lets Catalyst's
  * common-subexpression elimination unify repeated `lang_scores(text)`
  * calls instead of running the kernel once per reference.
  */
final case class LangLexicon(wordLists: Seq[Seq[String]], charLists: Seq[String])
  extends Serializable {

  val nLangs: Int = wordLists.length + charLists.length

  // word -> indexes of the languages listing it (a shared romance article
  // increments several scores, same as N independent isin filters)
  @transient private lazy val wordMap: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    for ((ws, li) <- wordLists.zipWithIndex; w <- ws) {
      val prev = m.get(w)
      m.put(w, if (prev == null) Array(li) else prev :+ li)
    }
    m
  }

  @transient private lazy val charMap: java.util.HashMap[Character, Array[Int]] = {
    val m = new java.util.HashMap[Character, Array[Int]]()
    for ((cs, i) <- charLists.zipWithIndex; c <- cs) {
      val li = wordLists.length + i
      val prev = m.get(c)
      m.put(c, if (prev == null) Array(li) else prev :+ li)
    }
    m
  }

  def scores(text: UTF8String): ArrayData = {
    val out = new Array[Int](nLangs)
    def bump(hits: Array[Int]): Unit = if (hits != null) {
      var k = 0
      while (k < hits.length) { out(hits(k)) += 1; k += 1 }
    }
    // token pass over the lowercased string (word languages)
    val lower = text.toLowerCase.toString
    val n = lower.length
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || lower.charAt(i) == ' ') {
        if (i > start) bump(wordMap.get(lower.substring(start, i)))
        start = i + 1
      }
      i += 1
    }
    // char pass over the RAW string (char languages)
    val raw = text.toString
    var j = 0
    while (j < raw.length) {
      bump(charMap.get(raw.charAt(j)))
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** lang_scores(text): all per-language lexicon scores in ONE pass over the
  * string, as array<int> in (wordLists ++ charLists) order. The Column
  * spelling it replaces ran an interpreted `filter` lambda chain per word
  * language (each token probed against a 40-literal isin) plus a regexp
  * scan per char language — ~10 passes with per-element virtual calls.
  * This is one codegen'd call per row; results are element-wise identical
  * (parity pinned in TextAnalysisSpec).
  */
case class LangScoresExpr(child: Expression, lexicon: LangLexicon)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "lang_scores"

  override def nullSafeEval(in: Any): Any =
    lexicon.scores(in.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val lex = ctx.addReferenceObj("langLexicon", lexicon,
        classOf[LangLexicon].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $lex.scores($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): LangScoresExpr =
    copy(child = newChild)
}

object LangScoresExpr {
  def column(text: Column, lexicon: LangLexicon): Column =
    ExpressionUtils.column(
      LangScoresExpr(ExpressionUtils.expression(text), lexicon))
}
