// Hosted under org.apache.spark.sql so the expression can use the
// private[sql] ExpressionUtils surface — same pattern as VecDot.scala.
// Public API re-exported from graft.functions (TextExprsApi.scala).
package org.apache.spark.sql.graftexpr

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Memoized whole-document JSON path reader.
  *
  * The problem it solves: `FilterExec` performs NO subexpression
  * elimination — a filter predicate referencing `$data.k` five times
  * (macro-unrolled quantifiers, map-literal keys, numeric guards) evaluates
  * five independent `get_json_object` calls, each a full parse of the
  * document, and `get_json_object` is `CodegenFallback` besides. A CEL or
  * attribute filter's cost was therefore parse-count × document size.
  *
  * This kernel parses the WHOLE document once per (thread, document) into
  * a flat dotted-path → scalar-text map, memoized in a thread-local keyed
  * by document VALUE (the cached key is a defensive clone — scan buffers
  * are reused between rows). Every further path read on the same row is a
  * byte-compare plus a hash probe. Evaluation stays deterministic — the
  * memo is a pure cache of a pure function — and the expression codegens
  * (a static call), keeping the enclosing predicate inside whole-stage
  * codegen.
  *
  * Text-form parity with `get_json_object` (which both the CEL compiler's
  * lenient casts and the delivery filters rely on):
  *  - string leaf → unquoted text; boolean → `true`/`false`; integer →
  *    its digits;
  *  - JSON null → ABSENT (reads as SQL NULL), matching get_json_object
  *    and cel-go's no-such-key error → filter-false;
  *  - object/array values → their compact serialization (present, so
  *    `has($data.obj)` is true);
  *  - float leaves serialize via Jackson's canonical double text, which
  *    `get_json_object`'s generator copy also produces for the common
  *    forms; numeric CEL vars try_cast to double either way, so the text
  *    form only matters for `.(string)` reads of float fields.
  * Documented divergence: object keys that themselves contain a dot are
  * not addressable through the flat map (`{"a.b": 1}` vs `{"a":{"b":1}}`
  * collide — the nested spelling wins); nesting beyond depth 64 reads as
  * absent.
  */
object JsonDocMemo {

  private val mapper = new ObjectMapper()
  private val MaxDepth = 64

  private final class Cache {
    var key: UTF8String = _
    var map: java.util.HashMap[String, UTF8String] = _
  }
  private val tl: ThreadLocal[Cache] = ThreadLocal.withInitial(() => new Cache)

  /** The text at dotted `path`, or null (absent / malformed / non-object
    * root / JSON null — all the cases get_json_object returns NULL for).
    */
  def lookup(doc: UTF8String, path: String): UTF8String = {
    if (doc == null) return null
    val c = tl.get()
    if (c.key == null || !c.key.equals(doc)) {
      c.map = parse(doc)
      c.key = doc.clone()
    }
    if (c.map == null) null else c.map.get(path)
  }

  private def parse(doc: UTF8String): java.util.HashMap[String, UTF8String] =
    try {
      val root = mapper.readTree(doc.getBytes)
      if (root == null || !root.isObject) null
      else {
        val m = new java.util.HashMap[String, UTF8String]()
        flatten(root, "", 0, m)
        m
      }
    } catch { case _: Exception => null }

  private def flatten(node: JsonNode, prefix: String, depth: Int,
      m: java.util.HashMap[String, UTF8String]): Unit = {
    if (node.isObject) {
      if (prefix.nonEmpty)
        m.put(prefix, UTF8String.fromString(node.toString))
      if (depth < MaxDepth) {
        val it = node.fields()
        while (it.hasNext) {
          val e = it.next()
          val key = if (prefix.isEmpty) e.getKey else prefix + "." + e.getKey
          flatten(e.getValue, key, depth + 1, m)
        }
      }
    } else if (node.isNull) {
      () // JSON null reads as absent, like get_json_object
    } else if (node.isArray || node.isTextual) {
      m.put(prefix,
        UTF8String.fromString(if (node.isTextual) node.asText else node.toString))
    } else {
      m.put(prefix, UTF8String.fromString(node.asText))
    }
  }
}

/** `json_path_text(doc, path)` — see [[JsonDocMemo]]. Deterministic,
  * null-on-missing, codegen'd as one static call.
  */
final case class JsonPathTextExpr(child: Expression, path: String)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "json_path_text"

  override def nullSafeEval(in: Any): Any =
    JsonDocMemo.lookup(in.asInstanceOf[UTF8String], path)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.addReferenceObj("jsonPath", path, "java.lang.String")
    // static forwarder of the top-level object — `X.MODULE$` does NOT
    // resolve under Janino (the field lives on class `X$`), and a failed
    // compile silently drops the whole stage to interpreted eval
    nullSafeCodeGen(ctx, ev, c => {
      s"""
        ${ev.value} = org.apache.spark.sql.graftexpr.JsonDocMemo.lookup($c, $p);
        ${ev.isNull} = ${ev.value} == null;
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): JsonPathTextExpr =
    copy(child = newChild)
}

object JsonPathTextExpr {
  def column(doc: Column, path: String): Column =
    ExpressionUtils.column(JsonPathTextExpr(ExpressionUtils.expression(doc), path))
}
