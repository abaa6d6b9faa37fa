package graft.transform

import graft.json._

/** Output templates (SURVEY §2.6).
  *
  * Text templates (/root/reference/pkg/template/text/parse.go:39-112):
  * literal text + `<var>` define-lookup + `<$.json.path>` model-lookup
  * segments, `\`-escapes, missing value renders as nothing.
  *
  * JSON templates (/root/reference/pkg/template/json/, ~1200 LoC there):
  * a full JSON grammar where a hole occupying an entire value is
  * type-preserving, a hole inside a string interpolates, and an object
  * member whose value is a single missing hole is omitted.
  */
object Template {

  sealed trait Kind
  case object TextKind extends Kind
  case object JsonKind extends Kind

  /** Type recognition for unspecified type: first char `{ [ "` ⇒ JSON else
    * text (pkg/subscription.go:137-155, pre-v0.9 compat).
    */
  def sniffKind(template: String): Kind = {
    val t = template.trim
    if (t.nonEmpty && (t.head == '{' || t.head == '[' || t.head == '"')) JsonKind else TextKind
  }

  /** A resolver from hole name to value. Names are either `$.path` (model
    * lookup) or a bare define name.
    */
  type Resolver = String => Option[JValue]

  def resolver(ctx: Ctx): Resolver = { name =>
    // projection paths resolve like the reference's template segments
    // (pkg/template/json/segment.go:92-137: 0 results = miss,
    // 1 = the value, many = an array)
    def dataLookup(segs: Vector[JPath.Seg]): Option[JValue] =
      if (segs.isEmpty) Some(ctx.data)
      else if (JPath.isProjection(segs)) JPath.getAll(ctx.data, segs) match {
        case Vector() => None
        case Vector(one) => Some(one)
        case many => Some(JArr(many))
      }
      else JPath.get(ctx.data, segs)
    def parsed(p: String): Option[Vector[JPath.Seg]] =
      try Some(JPath.parse(p))
      catch { case _: IllegalArgumentException => None } // malformed = miss
    // the data branch requires a "." or "[" separator after "$.data"
    // (Arg.parse's rule): "$.dataschema" / "$.datacontenttype" are
    // ATTRIBUTE holes, and a bare startsWith("$.data") would misroute
    // them into a data-path miss. The bracket form `$.data["k"]`
    // (template_test.go "refer data of model") routes here too.
    if (name == "$.data" || name.startsWith("$.data.") ||
      name.startsWith("$.data[")) {
      val p =
        if (name == "$.data") ""
        else if (name.charAt(6) == '[') name.substring(6)
        else name.substring(7)
      if (p.isEmpty) Some(ctx.data) else parsed(p).flatMap(dataLookup)
    } else if (name.startsWith("$[")) {
      // bracket-rooted hole (<$["i"].j>, parser_test.go template): the
      // quoted root segment routes exactly like its dotted spelling —
      // 'data' into the body, a single other segment as an attribute
      parsed(name.substring(1)).flatMap {
        case JPath.Field("data") +: rest => dataLookup(rest.toVector)
        case Vector(JPath.Field(attr)) =>
          ctx.event.flatMap(_.lookupAttr(attr.toLowerCase)).map(JStr(_))
        case _ => None
      }
    } else if (name.startsWith("$.")) {
      ctx.event.flatMap(_.lookupAttr(name.substring(2).toLowerCase)).map(JStr(_))
    } else ctx.defines.get(name)
  }

  // ==== text templates ====

  sealed private trait Seg
  private final case class Lit(s: String) extends Seg
  private final case class Hole(name: String) extends Seg

  /** Index of the unquoted '>' closing a hole opened at `lt`
    * (`t(lt) == '<'`), or -1. '>' inside a '…'/"…" bracket-key segment
    * does not close the hole, and backslash escapes the quote char inside
    * one — the reference's tokenizer plan (pkg/template/json/tokenize.go;
    * parser_test.go feeds the path `$.c[2].d['e-f g\'"<>'].h` inside a
    * hole). Delegates to the one shared quote-aware scanner
    * ([[JPath.scanToUnquoted]]) so the hole lexer and the path bracket
    * lexer can never disagree on quoting.
    */
  private def holeEnd(t: String, lt: Int): Int =
    JPath.scanToUnquoted(t, lt + 1, '>')

  /** Decode one `\`-escape of a TEXT template starting at `esc`
    * (`t(esc) == '\\'`), appending the decoded character(s) to `sb`;
    * returns the index just past the escape. Reference-exact
    * ConsumeEscaped parity (lib/bytes/escape.go:67-102 with the text
    * parser's escapePlan, pkg/template/text/parse.go:30-38):
    *
    *  - self escapes: `\<  \>  \\`
    *  - control escapes: `\b  \f  \n  \r  \t`
    *  - `\uNNNN`: a UTF-16 code unit; a high surrogate MUST be followed
    *    by a second `\uNNNN` carrying the low surrogate (the escape_test.go
    *    supplementary-plane vector, U+10437); a lone low surrogate is an
    *    error
    *  - `\xNN`: one byte from two hex digits
    *  - `\NNN`: one byte from exactly three octal digits
    *  - anything else (including a trailing `\`) is a PARSE ERROR, not a
    *    literal — the reference rejects the template
    *
    * One documented deviation: the reference's low-surrogate bound check
    * is vacuous (`lowSurrogateMin < 0xDC00` in escape.go:129 is always
    * false), so it ACCEPTS a high surrogate followed by `\u` of any
    * value ≤ 0xDFFF and renders a garbage rune; this port rejects a low
    * half outside [0xDC00, 0xDFFF] — strictly tighter, never
    * silently-wrong output. escape_test.go carries no vector either way.
    *
    * Byte escapes ≥ 0x80 append the code point of the byte value (the Go
    * form emits the raw byte into a UTF-8 string; for the ASCII range the
    * two agree, which is every vector the reference tests).
    */
  private def consumeEscaped(t: String, esc: Int, sb: StringBuilder): Int = {
    def bad(what: String): Nothing =
      throw new IllegalArgumentException(s"invalid $what in text template at offset $esc")
    def hex1(j: Int): Int = {
      if (j >= t.length) bad("hexadecimal character")
      val c = t(j)
      if (c >= '0' && c <= '9') c - '0'
      else if (c >= 'a' && c <= 'f') c - 'a' + 10
      else if (c >= 'A' && c <= 'F') c - 'A' + 10
      else bad("hexadecimal character")
    }
    def hex4(j: Int): Int = (hex1(j) << 12) | (hex1(j + 1) << 8) | (hex1(j + 2) << 4) | hex1(j + 3)
    def oct1(j: Int): Int = {
      if (j >= t.length) bad("octal character")
      val c = t(j)
      if (c >= '0' && c <= '7') c - '0' else bad("octal character")
    }
    if (esc + 1 >= t.length) bad("escape character")
    t(esc + 1) match {
      case c @ ('<' | '>' | '\\') => sb.append(c); esc + 2
      case 'b' => sb.append('\b'); esc + 2
      case 'f' => sb.append('\f'); esc + 2
      case 'n' => sb.append('\n'); esc + 2
      case 'r' => sb.append('\r'); esc + 2
      case 't' => sb.append('\t'); esc + 2
      case 'x' => sb.append(((hex1(esc + 2) << 4) | hex1(esc + 3)).toChar); esc + 4
      case o if o >= '0' && o <= '7' =>
        // Go's byte arithmetic wraps mod 256: \400-\777 are one byte,
        // not a U+01xx code point (ExpectOctCharExt returns a byte)
        sb.append((((o - '0') * 64 + oct1(esc + 2) * 8 + oct1(esc + 3)) & 0xFF).toChar)
        esc + 4
      case 'u' =>
        val hi = hex4(esc + 2)
        if (hi < 0xD800 || hi > 0xDFFF) { sb.append(hi.toChar); esc + 6 }
        else if (hi > 0xDBFF) bad("unicode character") // lone low surrogate
        else {
          if (!t.startsWith("\\u", esc + 6)) bad("unicode character")
          val lo = hex4(esc + 8)
          if (lo < 0xDC00 || lo > 0xDFFF) bad("unicode character")
          sb.append(hi.toChar).append(lo.toChar)
          esc + 12
        }
      case _ => bad("escape character")
    }
  }

  private def parseSegments(t: String): Vector[Seg] = {
    val segs = Vector.newBuilder[Seg]
    val sb = new StringBuilder
    var i = 0
    while (i < t.length) {
      t(i) match {
        case '\\' => i = consumeEscaped(t, i, sb)
        case '<' =>
          val j = holeEnd(t, i)
          if (j < 0) { sb.append(t(i)); i += 1 }
          else {
            if (sb.nonEmpty) { segs += Lit(sb.toString); sb.clear() }
            segs += Hole(t.substring(i + 1, j))
            i = j + 1
          }
        case c => sb.append(c); i += 1
      }
    }
    if (sb.nonEmpty) segs += Lit(sb.toString)
    segs.result()
  }

  /** Parse-time validation of a TEXT template — the reference rejects a
    * bad escape when the template is PARSED at subscription create
    * (text/parse.go returns the error from ConsumeEscaped), not on each
    * event. [[graft.transform.Transformer.parseSpec]] calls this so a
    * stored subscription with a broken template fails fast instead of
    * mass-DLQing every event at delivery time.
    */
  def validateText(template: String): Either[String, Unit] =
    try { parseSegments(template); Right(()) }
    catch { case e: IllegalArgumentException => Left(e.getMessage) }

  /** Render a text template; missing holes render as nothing
    * (text/segment.go:25-72).
    */
  def renderText(template: String, resolve: Resolver): String =
    parseSegments(template).map {
      case Lit(s) => s
      case Hole(n) => resolve(n).flatMap(v => VCast.toText(v).toOption).getOrElse("")
    }.mkString

  // ==== JSON templates ====

  sealed trait JTNode
  private final case class JTConst(v: JValue) extends JTNode
  private final case class JTHole(name: String) extends JTNode
  private final case class JTStr(segs: Vector[Seg]) extends JTNode
  private final case class JTArr(items: Vector[JTNode]) extends JTNode
  private final case class JTObj(members: Vector[(Vector[Seg], JTNode)]) extends JTNode

  def parseJson(template: String): Either[String, JTNode] =
    try Right(new JParser(template).parseValue())
    catch { case e: Exception => Left(s"json template parse error: ${e.getMessage}") }

  private final class JParser(t: String) {
    private var i = 0
    private def ws(): Unit = while (i < t.length && t(i).isWhitespace) i += 1
    private def fail(msg: String) = throw new IllegalArgumentException(s"$msg at offset $i")

    def parseValue(): JTNode = {
      ws()
      if (i >= t.length) fail("unexpected end")
      t(i) match {
        case '{' => parseObject()
        case '[' => parseArray()
        case '"' => parseString()
        case '<' =>
          val j = holeEnd(t, i)
          if (j < 0) fail("unterminated hole")
          val name = t.substring(i + 1, j); i = j + 1
          JTHole(name)
        case 't' => expect("true"); JTConst(JBool(true))
        case 'f' => expect("false"); JTConst(JBool(false))
        case 'n' => expect("null"); JTConst(JNull)
        case c if c == '-' || c.isDigit => parseNumber()
        case c => fail(s"unexpected char '$c'")
      }
    }

    private def expect(word: String): Unit = {
      if (!t.startsWith(word, i)) fail(s"expected $word")
      i += word.length
    }

    private def parseNumber(): JTNode = {
      val j = i
      if (t(i) == '-') i += 1
      while (i < t.length && (t(i).isDigit || "+-.eE".contains(t(i)))) i += 1
      val text = t.substring(j, i)
      JTConst(
        if (text.exists(c => c == '.' || c == 'e' || c == 'E')) JDouble(text.toDouble)
        else JInt(text.toLong))
    }

    private def parseString(): JTNode = {
      i += 1 // opening quote
      val segs = Vector.newBuilder[Seg]
      val sb = new StringBuilder
      var done = false
      while (!done) {
        if (i >= t.length) fail("unterminated string")
        t(i) match {
          case '"' => done = true; i += 1
          case '\\' if i + 1 < t.length =>
            t(i + 1) match {
              case 'n' => sb.append('\n')
              case 't' => sb.append('\t')
              case 'r' => sb.append('\r')
              case 'u' if i + 5 < t.length =>
                sb.append(Integer.parseInt(t.substring(i + 2, i + 6), 16).toChar); i += 4
              case other => sb.append(other)
            }
            i += 2
          case '<' =>
            val j = holeEnd(t, i)
            if (j < 0) { sb.append('<'); i += 1 }
            else {
              if (sb.nonEmpty) { segs += Lit(sb.toString); sb.clear() }
              segs += Hole(t.substring(i + 1, j)); i = j + 1
            }
          case c => sb.append(c); i += 1
        }
      }
      if (sb.nonEmpty) segs += Lit(sb.toString)
      JTStr(segs.result())
    }

    private def parseArray(): JTNode = {
      i += 1; ws()
      val items = Vector.newBuilder[JTNode]
      if (i < t.length && t(i) == ']') { i += 1; return JTArr(Vector.empty) }
      var done = false
      while (!done) {
        items += parseValue()
        ws()
        if (i < t.length && t(i) == ',') { i += 1 }
        else if (i < t.length && t(i) == ']') { i += 1; done = true }
        else fail("expected , or ]")
      }
      JTArr(items.result())
    }

    private def parseObject(): JTNode = {
      i += 1; ws()
      val members = Vector.newBuilder[(Vector[Seg], JTNode)]
      if (i < t.length && t(i) == '}') { i += 1; return JTObj(Vector.empty) }
      var done = false
      while (!done) {
        ws()
        val key = parseString() match {
          case JTStr(segs) => segs
          case _ => fail("object key must be a string")
        }
        ws()
        if (i >= t.length || t(i) != ':') fail("expected :")
        i += 1
        val value = parseValue()
        members += key -> value
        ws()
        if (i < t.length && t(i) == ',') { i += 1 }
        else if (i < t.length && t(i) == '}') { i += 1; done = true }
        else fail("expected , or }")
      }
      JTObj(members.result())
    }
  }

  /** Render a parsed JSON template. A member whose value is a single missing
    * hole is omitted (template/json/generator.go behavior, see
    * transformer_test.go:88-110 golden).
    */
  def renderJson(node: JTNode, resolve: Resolver): JValue = {
    def renderSegs(segs: Vector[Seg]): String = segs.map {
      case Lit(s) => s
      case Hole(n) => resolve(n).flatMap(v => VCast.toText(v).toOption).getOrElse("")
    }.mkString

    def go(n: JTNode): Option[JValue] = n match {
      case JTConst(v) => Some(v)
      // a missing VARIABLE hole (`<var>`) renders null with the member
      // kept, while a missing MODEL hole (`<$.path>`) omits the member —
      // template_test.go:42-71 ("refer variables" vs "refer model")
      case JTHole(name) if !name.startsWith("$") => Some(resolve(name).getOrElse(JNull))
      case JTHole(name) => resolve(name)
      case JTStr(segs) => Some(JStr(renderSegs(segs)))
      case JTArr(items) => Some(JArr(items.map(it => go(it).getOrElse(JNull))))
      case JTObj(members) =>
        Some(JObj(scala.collection.immutable.VectorMap.from(members.flatMap {
          case (keySegs, value) => go(value).map(v => renderSegs(keySegs) -> v)
        })))
    }
    go(node).getOrElse(JNull)
  }
}
