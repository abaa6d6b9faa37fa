package graft.json

import scala.collection.immutable.VectorMap

/** JSONPath subset matching what the reference uses through ojg and its own
  * setter (/root/reference/pkg/json.go:26-41,
  * server/trigger/util/event.go:160-280):
  *
  *  - dotted fields `a.b`, numeric indexes `a[2]`, whole-array projection
  *    `a[:]` (used by RENDER_ARRAY, action/array/render.go:79-86);
  *  - `get` on a missing path yields None (never errors);
  *  - `set` auto-creates intermediate objects and null-pads arrays out to the
  *    written index (event.go:171-226);
  *  - `delete` removes object members; deleting array elements is unsupported
  *    exactly like the reference (event.go:258-280).
  */
object JPath {

  sealed trait Seg
  final case class Field(name: String) extends Seg
  final case class Index(i: Int) extends Seg
  case object AllItems extends Seg
  /** RFC 9535-style array slice `[start:end:step]` (the reference's own
    * JSONPath parser, lib/json/path/parse.go:142-203: every bound
    * optional, negatives count from the end, step defaults to 1). `[:]`
    * stays [[AllItems]] — identical selection, and the projection flag in
    * transform/Arg keys on it.
    */
  final case class Slice(start: Option[Int], end: Option[Int], step: Int) extends Seg

  /** Index of the first `end` char at/after `from` that sits OUTSIDE any
    * '…'/"…" span (backslash escapes the next char inside a span), or -1.
    * The ONE quote-aware scanner (ADVICE r15): the path bracket lexer
    * below and the template hole scanner
    * ([[graft.transform.Template]]) both delegate here, so the quoting
    * rules cannot drift apart.
    */
  private[graft] def scanToUnquoted(t: String, from: Int, end: Char): Int = {
    var i = from
    var quote: Char = 0
    var escaped = false
    while (i < t.length) {
      val c = t.charAt(i)
      if (quote != 0) {
        if (escaped) escaped = false
        else if (c == '\\') escaped = true
        else if (c == quote) quote = 0
      } else if (c == '\'' || c == '"') quote = c
      else if (c == end) return i
      i += 1
    }
    -1
  }

  /** Parse a path body ("a.b[2]", already stripped of `$.data.` / `@.`). */
  def parse(path: String): Vector[Seg] = {
    if (path.isEmpty) return Vector.empty
    val segs = Vector.newBuilder[Seg]
    val name = new StringBuilder
    def flushName(): Unit = {
      if (name.nonEmpty) { segs += Field(name.toString); name.clear() }
    }
    var i = 0
    while (i < path.length) {
      path.charAt(i) match {
        case '.' => flushName(); i += 1
        case '[' =>
          flushName()
          // quote-aware (ADVICE r15): a quoted member selector may
          // contain ']' (['a]b'] is legal in ojg/RFC 9535) and
          // backslash-escaped quotes — only an UNQUOTED ']' closes the
          // selector. An unterminated quote consumes to end-of-path and
          // parseBracket rejects the mismatched body.
          val j = scanToUnquoted(path, i + 1, ']')
          val stop = if (j < 0) path.length else j
          segs += parseBracket(path.substring(i + 1, stop))
          i = stop + 1
        case c => name.append(c); i += 1
      }
    }
    flushName()
    segs.result()
  }

  /** One bracketed selector: index, `[:]` projection, or slice. Bounds may
    * carry whitespace (parse_test.go feeds "[ 1 : 5 : 2 ]").
    */
  private def parseBracket(body: String): Seg = {
    // malformed selectors must surface as IllegalArgumentException — the
    // spec-validation layers (Transformer.parseSpec / TransformRunner)
    // wrap that into their Left/"bad transformer spec" paths, where a bare
    // NumberFormatException would escape them with a useless message
    def bad(): Nothing =
      throw new IllegalArgumentException(s"bad path selector [$body]")
    def int(s: String): Int =
      try s.toInt catch { case _: NumberFormatException => bad() }
    val trimmed = body.trim
    if (trimmed.isEmpty || trimmed == ":" || trimmed == "*") AllItems
    // ojg's quoted member selector: ['key with . ] or spaces'] / ["key"];
    // backslash un-escapes the quote char and itself, other backslashes
    // stay literal
    else if (trimmed.head == '\'' || trimmed.head == '"') {
      val q = trimmed.head
      val inner = trimmed.substring(1)
      val sb = new StringBuilder
      var i = 0
      var terminated = false
      while (i < inner.length && !terminated) {
        val c = inner.charAt(i)
        if (c == '\\' && i + 1 < inner.length &&
          (inner.charAt(i + 1) == q || inner.charAt(i + 1) == '\\')) {
          sb.append(inner.charAt(i + 1)); i += 2
        } else if (c == q) terminated = true
        else { sb.append(c); i += 1 }
      }
      // the close quote must be the selector's last character (mismatched
      // or early-terminated quotes are malformed)
      if (terminated && i == inner.length - 1) Field(sb.toString)
      else bad()
    } else if (trimmed.contains(':')) {
      // keep empty parts: "::−1" must read as (None, None, −1)
      val parts = trimmed.split(":", -1).map(_.trim)
      if (parts.length > 3) bad()
      def bound(i: Int): Option[Int] =
        if (i < parts.length && parts(i).nonEmpty) Some(int(parts(i))) else None
      val step = bound(2).getOrElse(1)
      val (st, en) = (bound(0), bound(1))
      if (st.isEmpty && en.isEmpty && step == 1) AllItems
      else Slice(st, en, step)
    } else Index(int(trimmed))
  }

  /** Is any segment multi-valued (fans out in [[getAll]], invalid in point
    * [[get]]/[[set]]/[[delete]])? The single source of truth for the
    * projection test Arg and Template share.
    */
  def isProjection(segs: Seq[Seg]): Boolean = segs.exists {
    case AllItems => true
    case Slice(_, _, _) => true
    case _ => false
  }

  /** The index sequence an RFC 9535 slice selects from a `len`-element
    * array (negatives from the end, bounds clamped, step 0 selects
    * nothing).
    */
  private[json] def sliceIndices(len: Int, start: Option[Int],
      end: Option[Int], step: Int): Seq[Int] = {
    if (step == 0 || len == 0) return Seq.empty
    def norm(i: Int): Int = if (i >= 0) i else len + i
    if (step > 0) {
      val lo = math.max(0, math.min(norm(start.getOrElse(0)), len))
      val hi = math.max(0, math.min(norm(end.getOrElse(len)), len))
      lo.until(hi, step)
    } else {
      val upper = math.min(math.max(norm(start.getOrElse(len - 1)), -1), len - 1)
      val lower = math.min(math.max(end.map(norm).getOrElse(-1), -1), len - 1)
      upper.until(lower, step)
    }
  }

  /** A read index normalized ojg-style: negatives count from the end
    * (`[-1]` is the last element). Returns -1 when out of range.
    */
  private def normIndex(i: Int, len: Int): Int = {
    val n = if (i >= 0) i else len + i
    if (n >= 0 && n < len) n else -1
  }

  /** Point lookup; None when any hop is missing/mistyped. AllItems segments
    * are not valid in point lookups (use [[getAll]]). Negative indexes
    * read from the end (ojg), but only on READS — [[set]] keeps the
    * reference setter's non-negative contract (event.go:171-226).
    */
  def get(root: JValue, segs: Seq[Seg]): Option[JValue] = segs match {
    case Seq() => Some(root)
    case Field(n) +: rest => root match {
      case o: JObj => o.get(n).flatMap(get(_, rest))
      case _ => None
    }
    case Index(i) +: rest => root match {
      case JArr(items) =>
        val n = normIndex(i, items.size)
        if (n >= 0) get(items(n), rest) else None
      case _ => None
    }
    case AllItems +: _ => None
    case Slice(_, _, _) +: _ => None
  }

  /** Projection lookup: AllItems and slices fan out (ojg `[:]`/`[a:b:c]`). */
  def getAll(root: JValue, segs: Seq[Seg]): Vector[JValue] = segs match {
    case Seq() => Vector(root)
    case Field(n) +: rest => root match {
      case o: JObj => o.get(n).map(getAll(_, rest)).getOrElse(Vector.empty)
      case _ => Vector.empty
    }
    case Index(i) +: rest => root match {
      case JArr(items) =>
        val n = normIndex(i, items.size)
        if (n >= 0) getAll(items(n), rest) else Vector.empty
      case _ => Vector.empty
    }
    case AllItems +: rest => root match {
      case JArr(items) => items.flatMap(getAll(_, rest))
      case _ => Vector.empty
    }
    case Slice(st, en, step) +: rest => root match {
      case JArr(items) =>
        sliceIndices(items.size, st, en, step).toVector
          .flatMap(i => getAll(items(i), rest))
      case _ => Vector.empty
    }
  }

  def get(root: JValue, path: String): Option[JValue] = get(root, parse(path))

  /** Set with auto-create (maps) and null-padding (arrays). Fails (Left) on
    * a type clash — writing through a scalar — mirroring event.go:171-226.
    */
  def set(root: JValue, segs: Seq[Seg], value: JValue): Either[String, JValue] = segs match {
    case Seq() => Right(value)
    case Field(n) +: rest => root match {
      case JObj(fields) =>
        val child = fields.getOrElse(n, childSeed(rest))
        set(child, rest, value).map(nv => JObj(fields.updated(n, nv)))
      case JNull => set(JObj.empty, segs, value)
      case other => Left(s"cannot set field '$n' in ${typeName(other)}")
    }
    case Index(i) +: rest =>
      if (i < 0) Left(s"negative index $i")
      else root match {
        case JArr(items) =>
          val padded = if (i < items.size) items
            else items ++ Vector.fill(i + 1 - items.size)(JNull: JValue)
          val child = if (padded(i) == JNull && rest.nonEmpty) childSeed(rest) else padded(i)
          set(child, rest, value).map(nv => JArr(padded.updated(i, nv)))
        case JNull => set(JArr(Vector.empty), segs, value)
        case other => Left(s"cannot set index [$i] in ${typeName(other)}")
      }
    case AllItems +: _ => Left("cannot set through [:]")
    case Slice(_, _, _) +: _ => Left("cannot set through a slice")
  }

  private def childSeed(rest: Seq[Seg]): JValue = rest.headOption match {
    case Some(Index(_)) => JArr(Vector.empty)
    case _ => JObj.empty
  }

  def set(root: JValue, path: String, value: JValue): Either[String, JValue] =
    set(root, parse(path), value)

  /** Delete an object member; Left if path missing or parent is an array
    * (event.go:258-280 returns an error for array deletes).
    */
  def delete(root: JValue, segs: Seq[Seg]): Either[String, JValue] = segs match {
    case Seq() => Left("empty delete path")
    case Seq(Field(n)) => root match {
      case JObj(fields) if fields.contains(n) => Right(JObj(fields.removed(n)))
      case JObj(_) => Left(s"key '$n' not found")
      case other => Left(s"cannot delete '$n' from ${typeName(other)}")
    }
    case Field(n) +: rest => root match {
      case JObj(fields) => fields.get(n) match {
        case Some(child) => delete(child, rest).map(nv => JObj(fields.updated(n, nv)))
        case None => Left(s"key '$n' not found")
      }
      case other => Left(s"cannot traverse '$n' in ${typeName(other)}")
    }
    case Index(i) +: rest => root match {
      case JArr(items) if rest.nonEmpty && i >= 0 && i < items.size =>
        delete(items(i), rest).map(nv => JArr(items.updated(i, nv)))
      case JArr(_) => Left("deleting array elements is unsupported")
      case other => Left(s"cannot traverse [$i] in ${typeName(other)}")
    }
    case AllItems +: _ => Left("cannot delete through [:]")
    case Slice(_, _, _) +: _ => Left("cannot delete through a slice")
  }

  def delete(root: JValue, path: String): Either[String, JValue] =
    delete(root, parse(path))

  def typeName(v: JValue): String = v match {
    case JNull => "null"
    case _: JBool => "bool"
    case _: JInt => "int"
    case _: JDouble => "double"
    case _: JStr => "string"
    case _: JArr => "array"
    case _: JObj => "object"
  }
}
