package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftexpr.{ExprBridge, LangLexicon, LangScoresExpr, VecDotExpr}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Session extension point: registers the library's native expressions and
  * filter DSLs in the SQL function registry, so
  * `spark.sql("... WHERE cesql('type = \\'order\\'')")` and
  * `vec_dot(a, b)` work anywhere plain SQL does. Installed via
  * `spark.sql.extensions=graft.GraftExtensions` (GraftSession does).
  *
  * The DSL functions take a string LITERAL, compile it at analysis time
  * (mirroring the reference's create-time compile), and splice the
  * resulting predicate into the plan; its attribute references resolve
  * against the enclosing query like any other expression — so pushdown
  * and codegen apply exactly as for the DataFrame form.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def literalString(e: Expression, fn: String): String = e match {
    case Literal(s: UTF8String, StringType) => s.toString
    case _ => throw new IllegalArgumentException(
      s"$fn expects a string literal expression")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDotExpr].getName, "vec_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "vec_dot expects exactly 2 arguments")
        VecDotExpr(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("cesql"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "cesql"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "cesql expects exactly 1 argument")
        ExprBridge.toExpressionEager(
          graft.cesql.CESQL.compile(literalString(children.head, "cesql")))
      }))
    ext.injectFunction((
      FunctionIdentifier("cel"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "cel"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "cel expects exactly 1 argument")
        ExprBridge.toExpressionEager(
          graft.cel.CEL.compile(literalString(children.head, "cel")))
      }))
    // lang_scores(text): the library's standard 18-language lexicon scores
    // (TextAnalysis lexicons) as array<int> in langOrder-adjacent
    // (words ++ chars) order — the SQL face of TextAnalysis.langId's kernel
    ext.injectFunction((
      FunctionIdentifier("lang_scores"),
      new ExpressionInfo(classOf[LangScoresExpr].getName, "lang_scores"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "lang_scores expects exactly 1 argument")
        LangScoresExpr(children.head, new LangLexicon(
          graft.ext.TextAnalysis.langWords.map(_._2),
          graft.ext.TextAnalysis.charLangs.map(_._2)))
      }))
  }
}
