package graft.cesql

import graft.filters.FilterCompiler
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** CloudEvents SQL v1 expression → Catalyst [[Column]] translator.
  *
  * The reference carries this dialect via the cloudevents/sdk-go/sql
  * dependency (/root/reference/server/trigger/filter/cesql_filter.go:20-69);
  * the language itself is the public CloudEvents SQL spec: comparisons
  * `= != <> < <= > >=`, logical `AND OR XOR NOT`, integer arithmetic
  * `+ - * / %`, `LIKE` (%/_ with \ escapes), `EXISTS attr`, `x IN (...)`,
  * and functions ABS, LENGTH, CONCAT, CONCAT_WS, LOWER, UPPER, TRIM, LEFT,
  * RIGHT, SUBSTRING, INT, BOOL, STRING, IS_BOOL, IS_INT.
  *
  * Expressions address *context attributes* (stored as strings in our event
  * frame). Typing rules: CESQL's only numeric type is INTEGER, so arithmetic
  * and ordered comparisons against numeric operands run in LongType; boolean
  * casts accept 'true'/'false' text. A runtime evaluation error in the
  * reference fails the filter (cesql_filter.go:54-69) — here that surfaces
  * as SQL NULL, and [[compile]] wraps the result in coalesce(_, false).
  *
  * Parsed once per subscription into a single Catalyst expression —
  * whole-stage-codegen'd and pushdown-eligible, vs. the reference's per-event
  * tree walk.
  */
object CESQL {

  def compile(expression: String): Column = {
    // missing/error => false, spelled `p IS NOT NULL AND p` rather than
    // coalesce(p, false): identical semantics, but NullPropagation can
    // rewrite isnotnull(a = lit) to isnotnull(a), which keeps simple
    // attribute predicates pushdown-eligible at the parquet scan
    val p = toColumn(new Parser(Lexer.tokenize(expression)).parseExpression(0))
    p.isNotNull && p
  }

  // ==== AST ====
  sealed trait CType
  case object TStr extends CType
  case object TInt extends CType
  case object TBool extends CType
  /** attribute reference — string-stored, castable by context */
  case object TAttr extends CType

  sealed trait Expr { def tpe: CType }
  final case class SLit(s: String) extends Expr { val tpe = TStr }
  final case class ILit(v: Long) extends Expr { val tpe = TInt }
  final case class BLit(b: Boolean) extends Expr { val tpe = TBool }
  final case class Attr(name: String) extends Expr { val tpe = TAttr }
  final case class Un(op: String, e: Expr) extends Expr {
    val tpe: CType = if (op == "NOT") TBool else TInt
  }
  final case class Bin(op: String, l: Expr, r: Expr) extends Expr {
    val tpe: CType = op match {
      case "+" | "-" | "*" | "/" | "%" => TInt
      case _ => TBool
    }
  }
  final case class Like(e: Expr, pattern: String, negated: Boolean) extends Expr { val tpe = TBool }
  final case class InList(e: Expr, items: Seq[Expr], negated: Boolean) extends Expr { val tpe = TBool }
  final case class Exists(attr: String) extends Expr { val tpe = TBool }
  final case class Call(fn: String, args: Seq[Expr]) extends Expr {
    val tpe: CType = fn match {
      case "ABS" | "LENGTH" | "INT" => TInt
      case "BOOL" | "IS_BOOL" | "IS_INT" => TBool
      case _ => TStr
    }
  }

  // ==== Lexer ====
  sealed trait Tok
  final case class TIdent(s: String) extends Tok
  final case class TNum(v: Long) extends Tok
  final case class TStrTok(s: String) extends Tok
  final case class TOp(s: String) extends Tok
  case object TEOF extends Tok

  object Lexer {
    def tokenize(s: String): Vector[Tok] = {
      val out = Vector.newBuilder[Tok]
      var i = 0
      val n = s.length
      while (i < n) {
        val c = s(i)
        if (c.isWhitespace) i += 1
        else if (c.isDigit) {
          val j = i
          while (i < n && s(i).isDigit) i += 1
          out += TNum(s.substring(j, i).toLong)
        } else if (c.isLetter || c == '_') {
          val j = i
          while (i < n && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
          out += TIdent(s.substring(j, i))
        } else if (c == '\'' || c == '"') {
          val quote = c
          val sb = new StringBuilder
          i += 1
          while (i < n && s(i) != quote) {
            // only quotes and backslash unescape; other sequences (\% \_)
            // keep their backslash so LIKE patterns can escape wildcards
            // (cesql spec: string literals escape the quote character)
            if (s(i) == '\\' && i + 1 < n &&
              (s(i + 1) == quote || s(i + 1) == '\\')) {
              sb.append(s(i + 1)); i += 2
            } else { sb.append(s(i)); i += 1 }
          }
          require(i < n, s"unterminated string literal in CESQL: $s")
          i += 1
          out += TStrTok(sb.toString)
        } else {
          val two = if (i + 1 < n) s.substring(i, i + 2) else ""
          if (two == "!=" || two == "<>" || two == ">=" || two == "<=") { out += TOp(two); i += 2 }
          else { out += TOp(c.toString); i += 1 }
        }
      }
      out += TEOF
      out.result()
    }
  }

  // ==== Pratt parser ====
  final class Parser(toks: Vector[Tok]) {
    private var pos = 0
    private def peek: Tok = toks(pos)
    private def next(): Tok = { val t = toks(pos); pos += 1; t }
    private def expectOp(op: String): Unit = next() match {
      case TOp(`op`) =>
      case t => throw new IllegalArgumentException(s"CESQL: expected '$op', got $t")
    }
    private def kw(t: Tok, k: String): Boolean = t match {
      case TIdent(s) => s.equalsIgnoreCase(k)
      case _ => false
    }

    // recursion guard: a pathological expression (thousands of nested
    // parens / NOTs) must reject with the same create-time
    // IllegalArgumentException as any other malformed filter, not kill
    // the analysis thread with a StackOverflowError
    private var depth = 0
    private def descend[A](body: => A): A = {
      depth += 1
      if (depth > 200)
        throw new IllegalArgumentException("CESQL: expression nests too deeply")
      try body finally depth -= 1
    }

    private def prec(t: Tok): Int = t match {
      case TOp("*") | TOp("/") | TOp("%") => 60
      case TOp("+") | TOp("-") => 50
      case TOp("=") | TOp("!=") | TOp("<>") | TOp("<") | TOp("<=") | TOp(">") | TOp(">=") => 40
      case t2 if kw(t2, "LIKE") || kw(t2, "IN") => 40
      case t2 if kw(t2, "NOT") => 40 // NOT LIKE / NOT IN (infix position)
      case t2 if kw(t2, "AND") => 30
      case t2 if kw(t2, "XOR") => 25
      case t2 if kw(t2, "OR") => 20
      case _ => -1
    }

    def parseExpression(minPrec: Int): Expr = descend {
      var left = parseUnary()
      while (prec(peek) >= minPrec && prec(peek) > 0) {
        left = peek match {
          case TOp(op) => next(); Bin(op, left, parseExpression(prec(TOp(op)) + 1))
          case t if kw(t, "AND") => next(); Bin("AND", left, parseExpression(31))
          case t if kw(t, "OR") => next(); Bin("OR", left, parseExpression(21))
          case t if kw(t, "XOR") => next(); Bin("XOR", left, parseExpression(26))
          case t if kw(t, "LIKE") => next(); parseLike(left, negated = false)
          case t if kw(t, "IN") => next(); parseIn(left, negated = false)
          case t if kw(t, "NOT") =>
            next()
            if (kw(peek, "LIKE")) { next(); parseLike(left, negated = true) }
            else if (kw(peek, "IN")) { next(); parseIn(left, negated = true) }
            else throw new IllegalArgumentException("CESQL: expected LIKE or IN after infix NOT")
          case t => throw new IllegalArgumentException(s"CESQL: unexpected token $t")
        }
      }
      left
    }

    private def parseLike(left: Expr, negated: Boolean): Expr = next() match {
      case TStrTok(p) => Like(left, p, negated)
      case t => throw new IllegalArgumentException(s"CESQL: LIKE pattern must be a string literal, got $t")
    }

    private def parseIn(left: Expr, negated: Boolean): Expr = {
      expectOp("(")
      val items = Seq.newBuilder[Expr]
      items += parseExpression(0)
      while (peek == TOp(",")) { next(); items += parseExpression(0) }
      expectOp(")")
      InList(left, items.result(), negated)
    }

    private val functions = Set("ABS", "LENGTH", "CONCAT", "CONCAT_WS", "LOWER", "UPPER",
      "TRIM", "LEFT", "RIGHT", "SUBSTRING", "INT", "BOOL", "STRING", "IS_BOOL", "IS_INT")

    private def parseUnary(): Expr = descend { peek match {
      case t if kw(t, "NOT") => next(); Un("NOT", parseUnary())
      case t if kw(t, "EXISTS") =>
        next()
        next() match {
          case TIdent(a) => Exists(a.toLowerCase)
          case t2 => throw new IllegalArgumentException(s"CESQL: EXISTS expects attribute name, got $t2")
        }
      case TOp("-") => next(); Un("-", parseUnary())
      case TOp("(") => next(); val e = parseExpression(0); expectOp(")"); e
      case TNum(_) => val TNum(v) = next(); ILit(v)
      case TStrTok(_) => val TStrTok(s) = next(); SLit(s)
      case t if kw(t, "TRUE") => next(); BLit(true)
      case t if kw(t, "FALSE") => next(); BLit(false)
      case TIdent(name) =>
        next()
        if (peek == TOp("(") && functions(name.toUpperCase)) {
          next()
          val args = Seq.newBuilder[Expr]
          if (peek != TOp(")")) {
            args += parseExpression(0)
            while (peek == TOp(",")) { next(); args += parseExpression(0) }
          }
          expectOp(")")
          Call(name.toUpperCase, args.result())
        } else Attr(name.toLowerCase)
      case t => throw new IllegalArgumentException(s"CESQL: unexpected token $t")
    } }
  }

  // ==== Column generation ====

  private def asStr(e: Expr): Column = e match {
    case SLit(s) => lit(s)
    case ILit(v) => lit(v.toString)
    case BLit(b) => lit(b.toString)
    case Attr(a) => FilterCompiler.attr(a)
    case other => toColumn(other).cast("string")
  }

  // try_cast everywhere: the reference treats a failed coercion as an eval
  // error that fails the filter (cesql_filter.go:54-69) — SQL NULL here,
  // collapsed to false by the top-level coalesce. Spark 4's default ANSI cast
  // would instead abort the whole job on one malformed row.
  private def asInt(e: Expr): Column = e match {
    case ILit(v) => lit(v)
    case SLit(s) => lit(s).try_cast("bigint")
    case Attr(a) => FilterCompiler.attr(a).try_cast("bigint")
    case other => toColumn(other).try_cast("bigint")
  }

  /** 'true'/'false' text → boolean, anything else → null (eval error ⇒ fail). */
  private def asBool(e: Expr): Column = e match {
    case BLit(b) => lit(b)
    case SLit(s) => boolOfText(lit(s))
    case Attr(a) => boolOfText(FilterCompiler.attr(a))
    case other =>
      val c = toColumn(other)
      if (other.tpe == TBool) c else boolOfText(c.cast("string"))
  }

  private def boolOfText(c: Column): Column =
    when(lower(c) === "true", lit(true)).when(lower(c) === "false", lit(false))

  private def cmp(op: String, l: Expr, r: Expr): Column = {
    def ordered(f: (Column, Column) => Column): Column =
      if (l.tpe == TInt || r.tpe == TInt) f(asInt(l), asInt(r))
      else f(asStr(l), asStr(r))
    op match {
      case "=" =>
        if (l.tpe == TInt || r.tpe == TInt) asInt(l) === asInt(r)
        else if (l.tpe == TBool || r.tpe == TBool) asBool(l) === asBool(r)
        else asStr(l) === asStr(r)
      case "!=" | "<>" => !cmp("=", l, r)
      case "<" => ordered(_ < _)
      case "<=" => ordered(_ <= _)
      case ">" => ordered(_ > _)
      case ">=" => ordered(_ >= _)
    }
  }

  def toColumn(e: Expr): Column = e match {
    case SLit(s) => lit(s)
    case ILit(v) => lit(v)
    case BLit(b) => lit(b)
    case Attr(a) => FilterCompiler.attr(a)
    case Un("NOT", x) => !asBool(x)
    case Un("-", x) => -asInt(x)
    case Un(op, _) => throw new IllegalArgumentException(s"CESQL: unknown unary $op")
    case Bin(op @ ("+" | "-" | "*" | "/" | "%"), l, r) =>
      val (lc, rc) = (asInt(l), asInt(r))
      op match {
        case "+" => try_add(lc, rc)
        case "-" => try_subtract(lc, rc)
        case "*" => try_multiply(lc, rc)
        case "/" => try_divide(lc, rc).try_cast("bigint") // CESQL integer division; /0 -> null -> false
        case "%" => try_mod(lc, rc)
      }
    case Bin("AND", l, r) => asBool(l) && asBool(r)
    case Bin("OR", l, r) => asBool(l) || asBool(r)
    case Bin("XOR", l, r) => asBool(l) =!= asBool(r)
    case Bin(op, l, r) => cmp(op, l, r)
    case Like(x, p, neg) =>
      val c = asStr(x).like(p)
      if (neg) !c else c
    case InList(x, items, neg) =>
      val c = items.map(i => cmp("=", x, i)).reduce(_ || _)
      if (neg) !c else c
    case Exists(a) => FilterCompiler.attr(a).isNotNull
    case Call(fn, args) => call(fn, args)
  }

  private def call(fn: String, args: Seq[Expr]): Column = (fn, args) match {
    case ("ABS", Seq(x)) => abs(asInt(x))
    case ("LENGTH", Seq(x)) => length(asStr(x)).cast("bigint")
    case ("CONCAT", xs) => concat(xs.map(asStr): _*)
    case ("CONCAT_WS", SLit(sep) +: xs) => concat_ws(sep, xs.map(asStr): _*)
    case ("CONCAT_WS", sep +: xs) =>
      // dynamic separator: interleave manually
      xs.map(asStr).reduceLeft((a, b) => concat(a, asStr(sep), b))
    case ("LOWER", Seq(x)) => lower(asStr(x))
    case ("UPPER", Seq(x)) => upper(asStr(x))
    case ("TRIM", Seq(x)) => trim(asStr(x))
    case ("LEFT", Seq(x, n)) => substring(asStr(x), 1, Int.MaxValue).substr(lit(1), asInt(n).cast("int"))
    case ("RIGHT", Seq(x, n)) =>
      val s = asStr(x)
      val ln = asInt(n).cast("int")
      s.substr(greatest(length(s) - ln + 1, lit(1)), ln)
    case ("SUBSTRING", Seq(x, from)) => asStr(x).substr(asInt(from).cast("int"), length(asStr(x)))
    case ("SUBSTRING", Seq(x, from, len)) => asStr(x).substr(asInt(from).cast("int"), asInt(len).cast("int"))
    case ("INT", Seq(x)) => asInt(x)
    case ("BOOL", Seq(x)) => asBool(x)
    case ("STRING", Seq(x)) => asStr(x)
    case ("IS_BOOL", Seq(x)) => asBool(x).isNotNull
    case ("IS_INT", Seq(x)) => asInt(x).isNotNull
    case _ => throw new IllegalArgumentException(s"CESQL: bad call $fn/${args.size}")
  }
}
