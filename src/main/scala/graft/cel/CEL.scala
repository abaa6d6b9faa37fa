package graft.cel

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** CEL-subset filter expression → Catalyst [[Column]].
  *
  * The reference embeds Google CEL with inline-typed JSONPath variables
  * (/root/reference/pkg/cel/cel.go:44-196): `$json.path.(type)` where type ∈
  * {string, int64, uint64, bool, double}; paths are rooted at `$.` of the
  * event's *data* body (cel.go:59-106); the expression must type-check to
  * bool (cel.go:142-144); an evaluation error fails the filter
  * (cel_filter.go:42-46).
  *
  * Supported subset (covers the reference's documented/tested usage):
  * literals (int/uint/double/string/bool), typed variables, parentheses,
  * unary !/-, arithmetic + - * / %, comparisons == != < <= > >=, && and ||,
  * and the ternary `cond ? a : b`. Variable binding reproduces the lenient
  * coercions of cel.go:198-275: numeric text parses, float→int64 truncates.
  *
  * Plus the cel-spec standard string functions a power user hits first
  * (the reference exposes full CEL, so these are in its surface even if
  * its docs only show the inline-variable subset): `size(s)` (code-point
  * count), `s.contains(sub)`, `s.startsWith(p)`, `s.endsWith(p)`, and
  * `s.matches(re)` (UNANCHORED partial match, per the CEL spec — not
  * Go's anchored regexp.MatchString). All evaluate null (→ filter false)
  * when the receiver is missing, matching CEL's eval-error semantics.
  *
  * Compiled once per subscription; evaluates as a single codegen'd
  * expression with `get_json_object` doing the per-row path lookup.
  */
object CEL {

  def compile(expression: String): Column = {
    // missing/error => false via `p IS NOT NULL AND p` (see CESQL.compile)
    val p = toColumn(new Parser(Lexer.tokenize(expression)).parse())
    p.isNotNull && p
  }

  // ==== AST ====
  sealed trait Expr
  final case class VarRef(path: String, tpe: String) extends Expr
  final case class LInt(v: Long) extends Expr
  final case class LDouble(v: Double) extends Expr
  final case class LStr(s: String) extends Expr
  final case class LBool(b: Boolean) extends Expr
  final case class Un(op: String, e: Expr) extends Expr
  final case class Bin(op: String, l: Expr, r: Expr) extends Expr
  final case class Ternary(cond: Expr, t: Expr, f: Expr) extends Expr
  /** `size(arg)` (receiver None) or `recv.name(args…)` (receiver Some). */
  final case class Call(name: String, receiver: Option[Expr], args: List[Expr]) extends Expr
  /** `[e1, e2, …]` — list literal, usable as the right side of `in`. */
  final case class LList(items: List[Expr]) extends Expr

  // ==== Lexer ====
  sealed trait Tok
  final case class TVar(path: String, tpe: String) extends Tok
  final case class TInt(v: Long) extends Tok
  final case class TUInt(v: Long) extends Tok
  final case class TDouble(v: Double) extends Tok
  final case class TStr(s: String) extends Tok
  final case class TIdent(s: String) extends Tok
  final case class TOp(s: String) extends Tok
  case object TEOF extends Tok

  object Lexer {
    private val varTypes = Set("string", "int64", "uint64", "bool", "double")

    def tokenize(s: String): Vector[Tok] = {
      val out = Vector.newBuilder[Tok]
      var i = 0
      val n = s.length
      while (i < n) {
        val c = s(i)
        if (c.isWhitespace) i += 1
        else if (c == '$') {
          // $path.to.field.(type) — path chars until ".(", then typed suffix
          i += 1
          val j = i
          while (i < n && !(s(i) == '.' && i + 1 < n && s(i + 1) == '(')) i += 1
          require(i < n, s"CEL: variable missing .(type) suffix in: $s")
          val path = s.substring(j, i)
          i += 2 // skip ".("
          val k = i
          while (i < n && s(i) != ')') i += 1
          require(i < n, s"CEL: unterminated variable type in: $s")
          val tpe = s.substring(k, i)
          i += 1
          require(varTypes(tpe), s"CEL: unsupported variable type '$tpe'")
          out += TVar(path, tpe)
        } else if (c.isDigit) {
          val j = i
          while (i < n && (s(i).isDigit || s(i) == '.')) i += 1
          val text = s.substring(j, i)
          if (i < n && (s(i) == 'u' || s(i) == 'U')) { i += 1; out += TUInt(text.toLong) }
          else if (text.contains('.')) out += TDouble(text.toDouble)
          else out += TInt(text.toLong)
        } else if (c == '\'' || c == '"') {
          val quote = c
          val sb = new StringBuilder
          i += 1
          while (i < n && s(i) != quote) {
            if (s(i) == '\\' && i + 1 < n) {
              s(i + 1) match {
                case 'n' => sb.append('\n')
                case 't' => sb.append('\t')
                case other => sb.append(other)
              }
              i += 2
            } else { sb.append(s(i)); i += 1 }
          }
          require(i < n, s"CEL: unterminated string in: $s")
          i += 1
          out += TStr(sb.toString)
        } else if (c.isLetter || c == '_') {
          val j = i
          while (i < n && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
          out += TIdent(s.substring(j, i))
        } else {
          val two = if (i + 1 < n) s.substring(i, i + 2) else ""
          if (Set("==", "!=", "<=", ">=", "&&", "||")(two)) { out += TOp(two); i += 2 }
          else { out += TOp(c.toString); i += 1 }
        }
      }
      out += TEOF
      out.result()
    }
  }

  // ==== Parser (precedence climbing) ====
  final class Parser(toks: Vector[Tok]) {
    private var pos = 0
    private def peek: Tok = toks(pos)
    private def next(): Tok = { val t = toks(pos); pos += 1; t }
    private def expect(op: String): Unit = next() match {
      case TOp(`op`) =>
      case t => throw new IllegalArgumentException(s"CEL: expected '$op', got $t")
    }

    // recursion guard: a pathological expression (thousands of nested
    // parens / unary operators) must reject with the same create-time
    // IllegalArgumentException as any other malformed filter, not kill
    // the analysis thread with a StackOverflowError
    private var depth = 0
    private def descend[A](body: => A): A = {
      depth += 1
      if (depth > 200)
        throw new IllegalArgumentException("CEL: expression nests too deeply")
      try body finally depth -= 1
    }

    def parse(): Expr = {
      val e = parseTernary()
      require(peek == TEOF, s"CEL: trailing tokens at $peek")
      e
    }

    private def parseTernary(): Expr = descend {
      val cond = parseBin(0)
      if (peek == TOp("?")) {
        next()
        val t = parseTernary()
        expect(":")
        val f = parseTernary()
        Ternary(cond, t, f)
      } else cond
    }

    private def prec(t: Tok): Int = t match {
      case TOp("*") | TOp("/") | TOp("%") => 60
      case TOp("+") | TOp("-") => 50
      case TOp("<") | TOp("<=") | TOp(">") | TOp(">=") => 40
      // cel-spec puts all relops (including `in` and equality) on ONE
      // left-associative level; this grammar's split keeps C-style
      // ordering for </== but places `in` WITH equality so mixed
      // `a == b in [l]` chains associate left — ((a == b) in [l]) — as a
      // conformant CEL parser does
      case TIdent("in") => 35
      case TOp("==") | TOp("!=") => 35
      case TOp("&&") => 30
      case TOp("||") => 20
      case _ => -1
    }

    private def opOf(t: Tok): String = t match {
      case TOp(o) => o
      case TIdent("in") => "in"
      case other => throw new IllegalArgumentException(s"CEL: not an operator: $other")
    }

    private def parseBin(minPrec: Int): Expr = {
      var left = parseUnary()
      while (prec(peek) >= minPrec && prec(peek) > 0) {
        val op = opOf(next())
        val right = parseBin(prec(if (op == "in") TIdent("in") else TOp(op)) + 1)
        left = Bin(op, left, right)
      }
      left
    }

    private def parseUnary(): Expr = descend {
      peek match {
        case TOp("!") => next(); Un("!", parseUnary())
        case TOp("-") => next(); Un("-", parseUnary())
        case _ => parsePostfix(parsePrimary())
      }
    }

    private def parsePrimary(): Expr = peek match {
      case TOp("(") => next(); val e = parseTernary(); expect(")"); e
      case TVar(p, t) => next(); VarRef(p, t)
      case TInt(v) => next(); LInt(v)
      case TUInt(v) => next(); LInt(v)
      case TDouble(v) => next(); LDouble(v)
      case TStr(s) => next(); LStr(s)
      case TIdent("true") => next(); LBool(true)
      case TIdent("false") => next(); LBool(false)
      // global function call: size(expr)
      case TIdent(name) if toks(pos + 1) == TOp("(") =>
        next(); next()
        val args = parseArgs()
        Call(name, None, args)
      // list literal: [e1, e2, …]
      case TOp("[") =>
        next()
        if (peek == TOp("]")) { next(); LList(Nil) }
        else {
          val items = List.newBuilder[Expr]
          items += parseTernary()
          while (peek == TOp(",")) { next(); items += parseTernary() }
          expect("]")
          LList(items.result())
        }
      case t => throw new IllegalArgumentException(s"CEL: unexpected token $t")
    }

    /** Comma-separated args up to the closing paren (consumed). */
    private def parseArgs(): List[Expr] =
      if (peek == TOp(")")) { next(); Nil }
      else {
        val args = List.newBuilder[Expr]
        args += parseTernary()
        while (peek == TOp(",")) { next(); args += parseTernary() }
        expect(")")
        args.result()
      }

    /** Postfix method calls: recv.name(args), left-associative chains. */
    private def parsePostfix(e: Expr): Expr = peek match {
      case TOp(".") if toks(pos + 1).isInstanceOf[TIdent] && toks(pos + 2) == TOp("(") =>
        next()
        val TIdent(name) = next(): @unchecked
        next() // "("
        parsePostfix(Call(name, Some(e), parseArgs()))
      case _ => e
    }
  }

  // ==== Column generation ====

  /** Typed read of a data-body path, with the reference's lenient bind-time
    * coercions (cel.go:198-275): numeric strings parse; float text truncates
    * to int64 (double→long cast truncates toward zero, matching Go).
    */
  private def varColumn(v: VarRef): Column = {
    val raw = get_json_object(col("data"), "$." + v.path)
    // try_cast: a failed coercion is a CEL eval error, which fails the
    // filter (NULL -> coalesce false) rather than aborting the job as
    // Spark 4's default ANSI cast would.
    v.tpe match {
      case "string" => raw
      case "int64" | "uint64" => raw.try_cast("double").try_cast("bigint")
      case "double" => raw.try_cast("double")
      case "bool" =>
        when(lower(raw) === "true", lit(true)).when(lower(raw) === "false", lit(false))
    }
  }

  private def isNumeric(e: Expr): Boolean = e match {
    case _: LInt | _: LDouble => true
    case VarRef(_, t) => t != "string" && t != "bool"
    case Un(_, x) => isNumeric(x)
    case b @ Bin(op, _, _) =>
      Set("+", "-", "*", "/", "%")(op) && !isStringExpr(b) // string + string concatenates
    case Ternary(_, t, f) => isNumeric(t) || isNumeric(f)
    case Call("size", _, _) => true
    case _ => false
  }

  /** Statically string-typed subtree — drives `+`-as-concatenation
    * (cel-spec: string + string concatenates; mixed string/number + is
    * rejected at compile time as no_such_overload, see toColumn).
    */
  private def isStringExpr(e: Expr): Boolean = e match {
    case _: LStr => true
    case VarRef(_, t) => t == "string"
    case Bin("+", l, r) => isStringExpr(l) && isStringExpr(r)
    case Ternary(_, t, f) => isStringExpr(t) && isStringExpr(f)
    case _ => false
  }

  /** Statically int64-typed subtree (CEL's int64/uint64 arithmetic domain).
    * Drives integer-division semantics: CEL `/` on int64 truncates toward
    * zero (cel-spec int64_math conformance), not double division.
    */
  private def isIntExpr(e: Expr): Boolean = e match {
    case _: LInt => true
    case VarRef(_, t) => t == "int64" || t == "uint64"
    case Un("-", x) => isIntExpr(x)
    case Bin(op, l, r) => Set("+", "-", "*", "/", "%")(op) && isIntExpr(l) && isIntExpr(r)
    case Ternary(_, t, f) => isIntExpr(t) && isIntExpr(f)
    case Call("size", _, _) => true // cel-spec: size() returns int
    case _ => false
  }

  def toColumn(e: Expr): Column = e match {
    case v: VarRef => varColumn(v)
    case LInt(v) => lit(v)
    case LDouble(v) => lit(v)
    case LStr(s) => lit(s)
    case LBool(b) => lit(b)
    case Un("!", x) => !toColumn(x)
    case Un("-", x) => -toColumn(x)
    case Un(op, _) => throw new IllegalArgumentException(s"CEL: unknown unary $op")
    case Bin(op @ ("+" | "-" | "*" | "/" | "%"), l, r) =>
      val (lc, rc) = (toColumn(l), toColumn(r))
      op match {
        case "+" =>
          if (isStringExpr(l) && isStringExpr(r)) concat(lc, rc)
          // cel-spec type-checks `string + number` to no_such_overload at
          // compile time; without this check Spark's implicit string→double
          // coercion would silently evaluate it
          else if (isStringExpr(l) || isStringExpr(r))
            throw new IllegalArgumentException(
              "CEL: no_such_overload — '+' requires both sides string (concat) or both numeric")
          else try_add(lc, rc)
        case "-" => try_subtract(lc, rc)
        case "*" => try_multiply(lc, rc)
        case "/" =>
          // int64 ÷ int64 truncates toward zero in CEL; the bigint cast of
          // the double quotient truncates toward zero identically (operands
          // are far below 2^53, so the quotient is exact)
          if (isIntExpr(l) && isIntExpr(r)) try_divide(lc, rc).try_cast("bigint")
          else try_divide(lc, rc)
        case "%" => try_mod(lc, rc)
      }
    case Bin("&&", l, r) => toColumn(l) && toColumn(r)
    case Bin("||", l, r) => toColumn(l) || toColumn(r)
    case Bin("in", l, LList(items)) =>
      // cel-spec membership: `e in [a, b, …]`. array_contains over the
      // literal array; a null needle (missing var) yields null → filter
      // false, CEL's eval-error path.
      if (items.isEmpty) lit(false)
      else array_contains(array(items.map(toColumn): _*), toColumn(l))
    case Bin("in", _, r) => throw new IllegalArgumentException(
      s"CEL: right side of 'in' must be a list literal, got $r")
    case LList(_) => throw new IllegalArgumentException(
      "CEL: list literal is only supported as the right side of 'in'")
    case Bin(op, l, r) =>
      // comparisons: numeric context if either side is numeric
      val (lc, rc) =
        if (isNumeric(l) || isNumeric(r)) (toColumn(l).try_cast("double"), toColumn(r).try_cast("double"))
        else (toColumn(l), toColumn(r))
      op match {
        case "==" => lc === rc
        case "!=" => lc =!= rc
        case "<" => lc < rc
        case "<=" => lc <= rc
        case ">" => lc > rc
        case ">=" => lc >= rc
        case other => throw new IllegalArgumentException(s"CEL: unknown operator $other")
      }
    case Ternary(c, t, f) => when(toColumn(c), toColumn(t)).otherwise(toColumn(f))
    case Call(name, recv, args) => callColumn(name, recv, args)
  }

  /** cel-spec standard functions (string extensions subset). `size` is the
    * code-point count (Spark's `length` counts characters, not bytes —
    * the cel-spec string size semantics). `matches` is a PARTIAL match:
    * the cel-spec defines matches() as unanchored RE2 search, which is
    * exactly Spark's `rlike`. A null receiver/argument propagates null,
    * which [[compile]] coalesces to filter-false — CEL's eval-error path.
    */
  private def callColumn(name: String, recv: Option[Expr], args: List[Expr]): Column = {
    def arity(n: Int): Unit = require(args.length == n,
      s"CEL: $name() takes $n argument(s), got ${args.length}")
    (name, recv) match {
      case ("has", None) =>
        // cel-spec has() macro: field presence. The dialect's fields are
        // typed data-body variables, so presence = the raw JSON path
        // resolves (a JSON null reads as absent, like get_json_object).
        // Returns a real boolean — never an eval error — so !has(...)
        // works for missing paths.
        arity(1)
        args.head match {
          case v: VarRef => get_json_object(col("data"), "$." + v.path).isNotNull
          case other => throw new IllegalArgumentException(
            s"CEL: has() requires a variable argument, got $other")
        }
      case ("size", None) =>
        arity(1); length(toColumn(args.head)).cast("bigint")
      case ("contains", Some(r)) =>
        arity(1); toColumn(r).contains(toColumn(args.head))
      case ("startsWith", Some(r)) =>
        arity(1); toColumn(r).startsWith(toColumn(args.head))
      case ("endsWith", Some(r)) =>
        arity(1); toColumn(r).endsWith(toColumn(args.head))
      case ("matches", Some(r)) =>
        arity(1); regexp_like(toColumn(r), toColumn(args.head))
      case _ =>
        throw new IllegalArgumentException(
          s"CEL: unsupported function '$name' (receiver: ${recv.isDefined})")
    }
  }
}
