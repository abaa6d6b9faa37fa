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
  * count; also list length, and in receiver form), `s.contains(sub)`,
  * `s.startsWith(p)`, `s.endsWith(p)`, `s.split(sep)` (literal
  * separator), and `s.matches(re)` (UNANCHORED partial match, per the CEL
  * spec — not Go's anchored regexp.MatchString; patterns are validated
  * against the RE2 subset at compile time, see [[validateMatchPattern]]).
  * All evaluate null (→ filter false) when the receiver is missing,
  * matching CEL's eval-error semantics.
  *
  * Plus the cel-spec scalar conversions `int(x)` (truncation toward zero;
  * epoch seconds for a timestamp), `double(x)`, `string(x)` — a failed
  * parse is an eval error → filter false.
  *
  * Plus the cel-spec temporal conversions: `timestamp(s)` (RFC 3339 →
  * Spark timestamp; unparseable text is an eval error → filter false) and
  * `duration(s)` (Go duration grammar, parsed at compile time from a
  * string literal into seconds), with timestamp ± duration arithmetic,
  * timestamp − timestamp, ordering/equality on both, and the no-timezone
  * (UTC) accessors `getFullYear`/`getMonth` (0-based)/`getDate`/
  * `getDayOfMonth` (0-based)/`getDayOfWeek` (0 = Sunday)/`getHours`/
  * `getMinutes`/`getSeconds` — duration accessors return truncated totals
  * per cel-go.
  *
  * Plus map literals (`{k: v, …}` — `in` tests key membership per the
  * cel-spec, `m[k]` indexes with no_such_key → filter false; values must
  * share a Spark type), list indexing (`l[i]`, 0-based, out-of-range →
  * filter false), and bytes literals (`b'…'`, the UTF-8 encoding of the
  * quoted text; equality and size() = byte count).
  *
  * And the cel-spec comprehension macros over list values —
  * `list.exists(x, p)`, `list.all(x, p)`, `list.filter(x, p)`,
  * `list.map(x, e)` — each compiled 1:1 onto Spark's codegen'd
  * higher-order functions (`exists`/`forall`/`filter`/`transform`) with
  * the iteration variable bound as the lambda argument; all relational
  * operators (ordering, equality, `in`) share one left-associative
  * precedence level, as the cel-spec grammar associates them.
  *
  * Compiled once per subscription; evaluates as a single codegen'd
  * expression with [[graft.functions.JsonPathText]] doing the per-row
  * path lookups — one memoized document parse per row no matter how many
  * times the predicate references `$data` paths (FilterExec performs no
  * subexpression elimination, so naive per-reference `get_json_object`
  * cost multiplied with the reference count).
  */
object CEL {

  def compile(expression: String): Column = {
    // missing/error => false via `p IS NOT NULL AND p` (see CESQL.compile)
    val p = toColumn(normalize(new Parser(Lexer.tokenize(expression)).parse()))
    p.isNotNull && p
  }

  /** Compile-time macro normalization — rewrites a CEL optimizer can
    * prove, applied bottom-up before column generation:
    *
    *  - `e in L.map(x, m)`        ⇒ `L.exists(x, m == e)` — membership in
    *    a mapped list is existence of a pre-image;
    *  - `L.filter(x, p).exists(y, q)` ⇒ `L.exists(x, p ? q[y:=x] : false)`
    *    — the filter predicate folds into the quantifier body;
    *  - same fold for `all`: `L.filter(x, p).all(y, q)` ⇒
    *    `L.all(x, p ? q[y:=x] : true)` (elements failing the filter are
    *    vacuously fine). The ternary spelling — not a bare `&&`/`!∥` —
    *    keeps null-p (eval-error) elements on the HOF path's
    *    drop-the-element semantics, so the rewrite never changes a
    *    delivery verdict.
    *
    * The payoff: chains over LITERAL lists collapse into quantifiers the
    * unroller in [[callColumn]] turns into plain codegen'd boolean arms —
    * no interpreted HOF lambda dispatch per row. Conservative capture
    * guards skip any rewrite that would move an expression into a scope
    * rebinding one of its identifiers; the HOF path stays behind as the
    * always-correct fallback.
    */
  private[cel] def normalize(e: Expr): Expr = {
    def mentions(x: Expr, name: String): Boolean = x match {
      case Ident(n) => n == name
      case Un(_, a) => mentions(a, name)
      case Bin(_, l, r) => mentions(l, name) || mentions(r, name)
      case Ternary(c, t, f) =>
        mentions(c, name) || mentions(t, name) || mentions(f, name)
      case Call(_, recv, args) =>
        recv.exists(mentions(_, name)) || args.exists(mentions(_, name))
      case LList(items) => items.exists(mentions(_, name))
      case LMap(items) =>
        items.exists { case (k, v) => mentions(k, name) || mentions(v, name) }
      case Index(t, k) => mentions(t, name) || mentions(k, name)
      case _ => false
    }
    def subst(x: Expr, from: String, to: String): Expr = x match {
      case Ident(n) if n == from => Ident(to)
      case Un(op, a) => Un(op, subst(a, from, to))
      case Bin(op, l, r) => Bin(op, subst(l, from, to), subst(r, from, to))
      case Ternary(c, t, f) =>
        Ternary(subst(c, from, to), subst(t, from, to), subst(f, from, to))
      case Call(n, recv, args) =>
        // a nested macro rebinding `from` shadows it — but the capture
        // guard below only substitutes when `to` is absent from the whole
        // body, and equal-name rebinding of `from` keeps meaning (the
        // inner binder wins either way), so plain traversal is safe
        Call(n, recv.map(subst(_, from, to)), args.map(subst(_, from, to)))
      case LList(items) => LList(items.map(subst(_, from, to)))
      case LMap(items) => LMap(items.map { case (k, v) =>
        (subst(k, from, to), subst(v, from, to)) })
      case Index(t, k) => Index(subst(t, from, to), subst(k, from, to))
      case other => other
    }
    // fused bodies use the TERNARY form — p ? q : neutral — not a bare
    // &&/||: filter() treats a null predicate (eval error on that
    // element) as not-kept, so the fused quantifier must send null-p
    // elements to the neutral value exactly like the HOF path does
    // (false for exists, vacuous true for all); && / ¬∨ would yield null
    // where the HOF path yields the neutral, flipping all() verdicts.
    def step(x: Expr): Expr = x match {
      case Bin("in", needle, Call("map", Some(r), List(Ident(v), m)))
          if !mentions(needle, v) =>
        step(Call("exists", Some(r), List(Ident(v), Bin("==", m, needle))))
      case Call(q @ ("exists" | "all"),
          Some(Call("filter", Some(r2), List(Ident(v2), p))),
          List(Ident(v), body))
          if v == v2 || !mentions(body, v2) =>
        val fused =
          if (q == "exists") Ternary(p, subst(body, v, v2), LBool(false))
          else Ternary(p, subst(body, v, v2), LBool(true))
        step(Call(q, Some(r2), List(Ident(v2), fused)))
      case other => other
    }
    e match {
      case Un(op, a) => step(Un(op, normalize(a)))
      case Bin(op, l, r) => step(Bin(op, normalize(l), normalize(r)))
      case Ternary(c, t, f) =>
        step(Ternary(normalize(c), normalize(t), normalize(f)))
      case Call(n, recv, args) =>
        step(Call(n, recv.map(normalize), args.map(normalize)))
      case LList(items) => LList(items.map(normalize))
      case LMap(items) => LMap(items.map { case (k, v) =>
        (normalize(k), normalize(v)) })
      case Index(t, k) => Index(normalize(t), normalize(k))
      case other => other
    }
  }

  // ==== AST ====
  sealed trait Expr
  final case class VarRef(path: String, tpe: String) extends Expr
  final case class LInt(v: Long) extends Expr
  /** uint literal past Long.MaxValue: `bits` is the raw two's-complement
    * image of the value in [2^63, 2^64); carried as DECIMAL(20,0). */
  final case class LUInt(bits: Long) extends Expr
  final case class LDouble(v: Double) extends Expr
  final case class LStr(s: String) extends Expr
  /** `b'…'` — bytes literal: the UTF-8 encoding of the quoted text
    * (cel-spec bytes). Equality/inequality and size() (byte count) apply.
    */
  final case class LBytes(s: String) extends Expr
  final case class LBool(b: Boolean) extends Expr
  final case class Un(op: String, e: Expr) extends Expr
  final case class Bin(op: String, l: Expr, r: Expr) extends Expr
  final case class Ternary(cond: Expr, t: Expr, f: Expr) extends Expr
  /** `size(arg)` (receiver None) or `recv.name(args…)` (receiver Some). */
  final case class Call(name: String, receiver: Option[Expr], args: List[Expr]) extends Expr
  /** `[e1, e2, …]` — list literal, usable as the right side of `in`. */
  final case class LList(items: List[Expr]) extends Expr
  /** `{k1: v1, …}` — map literal; `in` tests KEY membership (cel-spec),
    * `m[k]` indexes (missing key = eval error → filter false). Values
    * must share a Spark type (cel's fully-heterogeneous maps would need
    * variant typing Spark columns don't have).
    */
  final case class LMap(items: List[(Expr, Expr)]) extends Expr
  /** `e[i]` — list (0-based) or map indexing. */
  final case class Index(target: Expr, key: Expr) extends Expr
  /** Bare identifier — only meaningful as a comprehension-macro iteration
    * variable (`list.exists(x, x > 1)`); unbound use rejects at compile.
    */
  final case class Ident(name: String) extends Expr

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
          // parseUnsignedLong admits the full [0, 2^64) literal range; the
          // raw bits travel in the token and values past Long.MaxValue
          // surface as LUInt (decimal-typed) at parse
          if (i < n && (s(i) == 'u' || s(i) == 'U')) {
            i += 1; out += TUInt(java.lang.Long.parseUnsignedLong(text))
          }
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
      // cel-spec puts ALL relops — ordering, equality, and `in` — on ONE
      // left-associative level, so mixed chains like `a in [1,2] < b`
      // parse as ((a in [1,2]) < b), exactly as a conformant CEL parser
      // associates them (a C-style split level rejected that expression:
      // the higher-binding `<` greedily consumed the list literal)
      case TOp("<") | TOp("<=") | TOp(">") | TOp(">=") => 35
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
      case TUInt(v) => next(); if (v >= 0) LInt(v) else LUInt(v)
      case TDouble(v) => next(); LDouble(v)
      case TStr(s) => next(); LStr(s)
      case TIdent("true") => next(); LBool(true)
      case TIdent("false") => next(); LBool(false)
      // bytes literal: b'…' lexes as the identifier `b` + a string token
      case TIdent("b") if toks(pos + 1).isInstanceOf[TStr] =>
        next()
        val TStr(s) = next(): @unchecked
        LBytes(s)
      // global function call: size(expr)
      case TIdent(name) if toks(pos + 1) == TOp("(") =>
        next(); next()
        val args = parseArgs()
        Call(name, None, args)
      // bare identifier: a macro iteration variable (checked at compile)
      case TIdent(name) => next(); Ident(name)
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
      // map literal: {k1: v1, k2: v2, …}
      case TOp("{") =>
        next()
        if (peek == TOp("}")) { next(); LMap(Nil) }
        else {
          val items = List.newBuilder[(Expr, Expr)]
          def entry(): Unit = {
            val k = parseTernary()
            expect(":")
            items += ((k, parseTernary()))
          }
          entry()
          while (peek == TOp(",")) { next(); entry() }
          expect("}")
          LMap(items.result())
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

    /** Postfix method calls and indexing: recv.name(args) / recv[key],
      * left-associative chains.
      */
    private def parsePostfix(e: Expr): Expr = peek match {
      case TOp(".") if toks(pos + 1).isInstanceOf[TIdent] && toks(pos + 2) == TOp("(") =>
        next()
        val TIdent(name) = next(): @unchecked
        next() // "("
        parsePostfix(Call(name, Some(e), parseArgs()))
      case TOp("[") =>
        next()
        val key = parseTernary()
        expect("]")
        parsePostfix(Index(e, key))
      case _ => e
    }
  }

  // ==== Column generation ====

  /** Typed read of a data-body path, with the reference's lenient bind-time
    * coercions (cel.go:198-275): numeric strings parse; float text truncates
    * to int64 (double→long cast truncates toward zero, matching Go).
    */
  private def varColumn(v: VarRef): Column = {
    // memoized whole-doc parse: FilterExec has no subexpression
    // elimination, so a predicate referencing N paths would otherwise
    // parse the document N times (get_json_object is CodegenFallback on
    // top) — JsonPathText parses once per (thread, row) and every
    // further reference is a hash probe
    val raw = graft.functions.JsonPathText(col("data"), v.path)
    // try_cast: a failed coercion is a CEL eval error, which fails the
    // filter (NULL -> coalesce false) rather than aborting the job as
    // Spark 4's default ANSI cast would.
    v.tpe match {
      case "string" => raw
      // bigint-first keeps integer text exact across the full int64 range
      // (the old double staging lost precision above 2^53 and nulled the
      // boundary values); float text still truncates toward zero via the
      // double fallback, matching Go's ParseInt-then-ParseFloat leniency.
      case "int64" =>
        coalesce(raw.try_cast("bigint"), raw.try_cast("double").try_cast("bigint"))
      // uint64 exceeds bigint above 2^63; DECIMAL(20,0) holds all of
      // [0, 2^64) exactly, the way cel-go carries a true uint64
      // (pkg/cel/cel.go:113-125). Integer text must be matched explicitly:
      // a string→decimal cast ROUNDS ("1.5"→2) where CEL truncates, so
      // only digit-runs take the exact path; everything else goes through
      // floor(double), and negative values are a bind error (null).
      case "uint64" =>
        val d = raw.try_cast("double")
        when(raw.rlike("^[0-9]{1,20}$"), raw.try_cast("decimal(20,0)"))
          .otherwise(when(d >= 0, floor(d).try_cast("decimal(20,0)")))
      case "double" => raw.try_cast("double")
      case "bool" =>
        when(lower(raw) === "true", lit(true)).when(lower(raw) === "false", lit(false))
    }
  }

  private def isNumeric(e: Expr): Boolean = e match {
    case _: LInt | _: LUInt | _: LDouble => true
    case VarRef(_, t) => t != "string" && t != "bool"
    case Un(_, x) => isNumeric(x)
    case b @ Bin(op, _, _) =>
      Set("+", "-", "*", "/", "%")(op) && !isStringExpr(b) // string + string concatenates
    case Ternary(_, t, f) => isNumeric(t) || isNumeric(f)
    case Call("size", _, _) => true
    case Call("int" | "double", None, _) => true
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
    case Call("string", None, _) => true
    case _ => false
  }

  /** Statically list-typed subtree — the right side of `in`, a macro
    * receiver, or a size() argument.
    */
  private def isListExpr(e: Expr): Boolean = e match {
    case _: LList => true
    case Call("filter" | "map" | "split", Some(_), _) => true
    case Ternary(_, t, f) => isListExpr(t) && isListExpr(f)
    case _ => false
  }

  /** Statically map-typed subtree — `in` over it tests key membership. */
  private def isMapExpr(e: Expr): Boolean = e match {
    case _: LMap => true
    case Ternary(_, t, f) => isMapExpr(t) && isMapExpr(f)
    case _ => false
  }

  /** Statically int64-typed subtree (CEL's int64/uint64 arithmetic domain).
    * Drives integer-division semantics: CEL `/` on int64 truncates toward
    * zero (cel-spec int64_math conformance), not double division.
    */
  private def isIntExpr(e: Expr): Boolean = e match {
    case _: LInt | _: LUInt => true
    case VarRef(_, t) => t == "int64" || t == "uint64"
    case Un("-", x) => isIntExpr(x)
    case Bin(op, l, r) => Set("+", "-", "*", "/", "%")(op) && isIntExpr(l) && isIntExpr(r)
    case Ternary(_, t, f) => isIntExpr(t) && isIntExpr(f)
    case Call("size", _, _) => true // cel-spec: size() returns int
    case Call("int", None, _) => true
    case _ => false
  }

  /** Statically timestamp-typed subtree: a `timestamp()` conversion or
    * timestamp ± duration arithmetic (cel-spec temporal operators).
    */
  private def isTimestampExpr(e: Expr): Boolean = e match {
    case Call("timestamp", None, _) => true
    case Bin("+", l, r) =>
      (isTimestampExpr(l) && isDurationExpr(r)) ||
        (isDurationExpr(l) && isTimestampExpr(r))
    case Bin("-", l, r) => isTimestampExpr(l) && isDurationExpr(r)
    case Ternary(_, t, f) => isTimestampExpr(t) && isTimestampExpr(f)
    case _ => false
  }

  /** Statically duration-typed subtree: a `duration()` conversion,
    * duration ± duration, or timestamp − timestamp. Durations are carried
    * as DOUBLE seconds (Go durations are fractional; the arithmetic and
    * comparisons below are plain numeric ops on that representation).
    */
  private def isDurationExpr(e: Expr): Boolean = e match {
    case Call("duration", None, _) => true
    case Un("-", x) => isDurationExpr(x)
    case Bin("+", l, r) => isDurationExpr(l) && isDurationExpr(r)
    case Bin("-", l, r) =>
      (isDurationExpr(l) && isDurationExpr(r)) ||
        (isTimestampExpr(l) && isTimestampExpr(r))
    case Ternary(_, t, f) => isDurationExpr(t) && isDurationExpr(f)
    case _ => false
  }

  /** Seconds-typed duration column → day-time interval for timestamp
    * arithmetic (make_dt_interval's seconds slot is DECIMAL(18,6) — µs
    * resolution, matching Spark timestamps).
    */
  private def durInterval(c: Column): Column =
    make_dt_interval(lit(0), lit(0), lit(0), c.cast("decimal(18,6)"))

  def toColumn(e: Expr): Column = toColumn(e, Map.empty)

  private def toColumn(e: Expr, env: Map[String, Column]): Column = e match {
    case v: VarRef => varColumn(v)
    case LInt(v) => lit(v)
    case LUInt(bits) =>
      lit(new java.math.BigDecimal(java.lang.Long.toUnsignedString(bits)))
    case LDouble(v) => lit(v)
    case LStr(s) => lit(s)
    case LBytes(s) => lit(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    case LBool(b) => lit(b)
    case Ident(n) => env.getOrElse(n, throw new IllegalArgumentException(
      s"CEL: unbound identifier '$n' (only macro iteration variables may appear bare)"))
    case Un("!", x) => !toColumn(x, env)
    case Un("-", x) => -toColumn(x, env)
    case Un(op, _) => throw new IllegalArgumentException(s"CEL: unknown unary $op")
    // cel-spec temporal arithmetic — matched BEFORE the numeric arms so a
    // timestamp never falls into try_add's implicit coercions:
    //   ts + dur / dur + ts / ts - dur → timestamp; ts - ts → duration
    case Bin("+", l, r) if isTimestampExpr(l) && isDurationExpr(r) =>
      toColumn(l, env) + durInterval(toColumn(r, env))
    case Bin("+", l, r) if isDurationExpr(l) && isTimestampExpr(r) =>
      toColumn(r, env) + durInterval(toColumn(l, env))
    case Bin("-", l, r) if isTimestampExpr(l) && isDurationExpr(r) =>
      toColumn(l, env) - durInterval(toColumn(r, env))
    case Bin("-", l, r) if isTimestampExpr(l) && isTimestampExpr(r) =>
      (unix_micros(toColumn(l, env)) - unix_micros(toColumn(r, env)))
        .cast("double") / 1e6
    case Bin(op @ ("+" | "-" | "*" | "/" | "%"), l, r) =>
      val (lc, rc) = (toColumn(l, env), toColumn(r, env))
      // a macro iteration variable's element type is unknown statically;
      // pairing it with a string operand means concatenation (the list's
      // elements are strings in any well-typed program)
      def untyped(x: Expr): Boolean = x.isInstanceOf[Ident]
      op match {
        case "+" =>
          if ((isStringExpr(l) || isStringExpr(r)) &&
            (isStringExpr(l) || untyped(l)) && (isStringExpr(r) || untyped(r)))
            concat(lc, rc)
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
    case Bin("&&", l, r) => toColumn(l, env) && toColumn(r, env)
    case Bin("||", l, r) => toColumn(l, env) || toColumn(r, env)
    case Bin("in", l, LList(items)) =>
      // cel-spec membership: `e in [a, b, …]`. array_contains over the
      // literal array; a null needle (missing var) yields null → filter
      // false, CEL's eval-error path.
      if (items.isEmpty) lit(false)
      else array_contains(array(items.map(toColumn(_, env)): _*), toColumn(l, env))
    case Bin("in", l, r) if isListExpr(r) =>
      // membership over a computed list (split/filter/map result)
      array_contains(toColumn(r, env), toColumn(l, env))
    case Bin("in", l, r) if isMapExpr(r) =>
      // cel-spec: `k in map` tests KEY membership
      array_contains(map_keys(toColumn(r, env)), toColumn(l, env))
    case Bin("in", _, r) => throw new IllegalArgumentException(
      s"CEL: right side of 'in' must be a list or map, got $r")
    case LList(items) =>
      // first-class list value: macro receiver, size() argument, …
      array(items.map(toColumn(_, env)): _*)
    case LMap(items) =>
      map(items.flatMap { case (k, v) =>
        Seq(toColumn(k, env), toColumn(v, env))
      }: _*)
    // Literal target + literal key folds at compile time (like the macro
    // unrolling): Spark's GetArrayItem/GetMapValue nullability fold over a
    // foldable array emits broken codegen (undeclared isNull assignment)
    // and silently drops the whole predicate to the interpreter.
    case Index(LList(items), LInt(i)) =>
      if (i >= 0 && i < items.length) toColumn(items(i.toInt), env)
      else lit(null) // cel invalid_argument → filter false
    case Index(LMap(items), k @ (LStr(_) | LInt(_) | LBool(_))) =>
      items.collectFirst { case (`k`, v) => toColumn(v, env) }
        .getOrElse(lit(null)) // cel no_such_key → filter false
    // Literal target + COMPUTED key (the unrolled-macro shape,
    // `[0, 1].exists(i, [10, 20][i] == 1)`): a when-chain over the items
    // stays inside codegen where get/element_at over a foldable array
    // does not (same undeclared-isNull bug as above).
    case Index(LList(items), k) =>
      val kc = toColumn(k, env).cast("int")
      items.zipWithIndex.foldRight(lit(null)) { case ((it, i), acc) =>
        when(kc === lit(i), toColumn(it, env)).otherwise(acc)
      }
    case Index(LMap(items), k) =>
      val kc = toColumn(k, env)
      items.foldRight(lit(null)) { case ((ke, v), acc) =>
        when(toColumn(ke, env) === kc, toColumn(v, env)).otherwise(acc)
      }
    case Index(t, k) if isListExpr(t) =>
      // cel lists are 0-based like `get`; out-of-range yields null (eval
      // error → filter false), matching cel's invalid_argument error
      // semantics under compile()'s coalesce. (try_element_at's 1-based
      // `i + 1` form trips a Spark codegen bug — ANSI addExact inside
      // ElementAt's split function — and silently falls back to the
      // interpreter, so `get` is also the fast path.)
      get(toColumn(t, env), toColumn(k, env).cast("int"))
    case Index(t, k) if isMapExpr(t) =>
      // missing key → null → filter false (cel: no_such_key error)
      try_element_at(toColumn(t, env), toColumn(k, env))
    case Index(t, _) => throw new IllegalArgumentException(
      s"CEL: indexing requires a list or map, got $t")
    case Bin(op, l, r) =>
      // comparisons: numeric context if either side is numeric. Two int64/
      // uint64 sides compare in DECIMAL(20,0) — exact over the whole
      // [−2^63, 2^64) domain where the double context rounds away the
      // >2^53 tail (both spellings of int64 min/max and every uint64 above
      // 2^53 collapsed onto their double neighbors). Mixed int/double
      // comparisons stay in double, which is cel-spec's own semantics for
      // cross-type numeric ordering.
      val (lc, rc) =
        if (isIntExpr(l) && isIntExpr(r))
          (toColumn(l, env).try_cast("decimal(20,0)"),
            toColumn(r, env).try_cast("decimal(20,0)"))
        else if (isNumeric(l) || isNumeric(r))
          (toColumn(l, env).try_cast("double"), toColumn(r, env).try_cast("double"))
        else (toColumn(l, env), toColumn(r, env))
      op match {
        case "==" => lc === rc
        case "!=" => lc =!= rc
        case "<" => lc < rc
        case "<=" => lc <= rc
        case ">" => lc > rc
        case ">=" => lc >= rc
        case other => throw new IllegalArgumentException(s"CEL: unknown operator $other")
      }
    case Ternary(c, t, f) =>
      when(toColumn(c, env), toColumn(t, env)).otherwise(toColumn(f, env))
    case Call(name, recv, args) => callColumn(name, recv, args, env)
  }

  /** cel-spec standard functions (string extensions subset). `size` is the
    * code-point count (Spark's `length` counts characters, not bytes —
    * the cel-spec string size semantics). `matches` is a PARTIAL match:
    * the cel-spec defines matches() as unanchored RE2 search, which is
    * exactly Spark's `rlike`. A null receiver/argument propagates null,
    * which [[compile]] coalesces to filter-false — CEL's eval-error path.
    */
  private def callColumn(name: String, recv: Option[Expr], args: List[Expr],
      env: Map[String, Column]): Column = {
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
          case v: VarRef => graft.functions.JsonPathText(col("data"), v.path).isNotNull
          case other => throw new IllegalArgumentException(
            s"CEL: has() requires a variable argument, got $other")
        }
      // cel-spec comprehension macros over list values: recv.exists(x, p),
      // recv.exists_one(x, p), recv.all(x, p), recv.filter(x, p),
      // recv.map(x, e). Each maps 1:1 onto Spark's codegen'd higher-order
      // functions with the iteration variable bound as the lambda argument
      // (exists_one = exactly one element satisfies p — size of the
      // filtered list equals 1, the macro's expansion in the spec).
      case ("exists" | "exists_one" | "all" | "filter" | "map", Some(r)) =>
        arity(2)
        val (v, body) = args match {
          case List(Ident(x), b) => (x, b)
          case _ => throw new IllegalArgumentException(
            s"CEL: $name(x, e) requires a bare identifier as the iteration variable")
        }
        def bodyCol(x: Column): Column = toColumn(body, env + (v -> x))
        // Spark's higher-order functions evaluate interpreted
        // (CodegenFallback) — for the common macro-over-literal-list shape
        // the quantifiers unroll at COMPILE time into plain boolean
        // chains, which stay inside whole-stage codegen and cost zero
        // lambda dispatch per row. Element expressions are literals, so
        // duplication across the unrolled arms is free. Semantics match
        // the HOF path: empty exists → false, empty all → true (vacuous),
        // and Spark's &&/|| carry CEL's commutative error absorption.
        (name, r) match {
          case ("exists", LList(items)) if items.size <= 16 =>
            if (items.isEmpty) lit(false)
            else items.map(it => bodyCol(toColumn(it, env))).reduce(_ || _)
          case ("all", LList(items)) if items.size <= 16 =>
            if (items.isEmpty) lit(true)
            else items.map(it => bodyCol(toColumn(it, env))).reduce(_ && _)
          case ("exists_one", LList(items)) if items.size <= 16 =>
            // coalesce: filter() drops null-predicate elements, so the
            // unrolled count must treat null as not-satisfied too
            if (items.isEmpty) lit(false)
            else items.map(it =>
              coalesce(bodyCol(toColumn(it, env)).cast("int"), lit(0)))
              .reduce(_ + _) === 1
          case _ =>
            val list = toColumn(r, env)
            name match {
              case "exists" => exists(list, bodyCol)
              case "exists_one" =>
                size(filter(list, (x: Column) => bodyCol(x))) === 1
              case "all" => forall(list, bodyCol)
              case "filter" => filter(list, (x: Column) => bodyCol(x))
              case "map" => transform(list, (x: Column) => bodyCol(x))
            }
        }
      case ("split", Some(r)) =>
        // cel string-extension split: LITERAL separator (quoted before it
        // reaches Spark's regex-based split), keeping empty segments like
        // the spec; the separator must be a literal so the quoting happens
        // at compile time
        arity(1)
        args.head match {
          case LStr(sep) =>
            split(toColumn(r, env), java.util.regex.Pattern.quote(sep), -1)
          case other => throw new IllegalArgumentException(
            s"CEL: split() separator must be a string literal, got $other")
        }
      case ("size", None) =>
        arity(1)
        if (isListExpr(args.head) || isMapExpr(args.head))
          size(toColumn(args.head, env)).cast("bigint")
        else length(toColumn(args.head, env)).cast("bigint")
      case ("size", Some(r)) =>
        // receiver form: s.size() / list.size() / map.size()
        arity(0)
        if (isListExpr(r) || isMapExpr(r)) size(toColumn(r, env)).cast("bigint")
        else length(toColumn(r, env)).cast("bigint")
      case ("contains", Some(r)) =>
        arity(1); toColumn(r, env).contains(toColumn(args.head, env))
      case ("startsWith", Some(r)) =>
        arity(1); toColumn(r, env).startsWith(toColumn(args.head, env))
      case ("endsWith", Some(r)) =>
        arity(1); toColumn(r, env).endsWith(toColumn(args.head, env))
      case ("matches", Some(r)) =>
        arity(1)
        args.head match {
          case LStr(p) => validateMatchPattern(p)
          case other => throw new IllegalArgumentException(
            // filters are untrusted and compiled once driver-side; a
            // computed pattern can't be pre-validated against the RE2
            // subset, so it is rejected at create time (see
            // validateMatchPattern's notes)
            s"CEL: matches() pattern must be a string literal, got $other")
        }
        regexp_like(toColumn(r, env), toColumn(args.head, env))
      // cel-spec conversions: timestamp(string) parses RFC 3339 (try_cast:
      // unparseable text is a CEL eval error → null → filter false);
      // duration(string) parses the Go duration grammar at COMPILE time
      // (literal-only, like matches()'s pattern) into double seconds.
      case ("timestamp", None) =>
        arity(1)
        toColumn(args.head, env).try_cast("timestamp")
      // cel-spec numeric/string conversions: int() truncates toward zero
      // (the bigint cast of a double truncates identically). Bigint-first:
      // integer text/decimal values convert exactly across the full int64
      // range — the old double staging lost >2^53 string parses — and
      // float text still truncates via the double fallback; int(timestamp)
      // is epoch SECONDS floored (cel-go t.Unix()); a failed parse is an
      // eval error → null → filter false.
      case ("int", None) =>
        arity(1)
        if (isTimestampExpr(args.head))
          floor(unix_micros(toColumn(args.head, env)).cast("double") / 1e6)
            .cast("bigint")
        else {
          val c = toColumn(args.head, env)
          coalesce(c.try_cast("bigint"), c.try_cast("double").try_cast("bigint"))
        }
      case ("double", None) =>
        arity(1)
        toColumn(args.head, env).try_cast("double")
      case ("string", None) =>
        arity(1)
        toColumn(args.head, env).cast("string")
      case ("duration", None) =>
        arity(1)
        args.head match {
          case LStr(s) => lit(parseGoDuration(s))
          case other => throw new IllegalArgumentException(
            s"CEL: duration() argument must be a string literal, got $other")
        }
      // cel-spec temporal accessors (no-timezone forms = UTC, which is the
      // session timezone; cel pins getMonth/getDayOfMonth 0-based and
      // getDate 1-based; getDayOfWeek 0 = Sunday)
      case ("getFullYear", Some(r)) if isTimestampExpr(r) =>
        arity(0); year(toColumn(r, env)).cast("bigint")
      case ("getMonth", Some(r)) if isTimestampExpr(r) =>
        arity(0); (month(toColumn(r, env)) - 1).cast("bigint")
      case ("getDate", Some(r)) if isTimestampExpr(r) =>
        arity(0); dayofmonth(toColumn(r, env)).cast("bigint")
      case ("getDayOfMonth", Some(r)) if isTimestampExpr(r) =>
        arity(0); (dayofmonth(toColumn(r, env)) - 1).cast("bigint")
      case ("getDayOfWeek", Some(r)) if isTimestampExpr(r) =>
        arity(0); (dayofweek(toColumn(r, env)) - 1).cast("bigint")
      case ("getHours", Some(r)) if isTimestampExpr(r) =>
        arity(0); hour(toColumn(r, env)).cast("bigint")
      case ("getMinutes", Some(r)) if isTimestampExpr(r) =>
        arity(0); minute(toColumn(r, env)).cast("bigint")
      case ("getSeconds", Some(r)) if isTimestampExpr(r) =>
        arity(0); second(toColumn(r, env)).cast("bigint")
      // duration accessors: TOTALS truncated toward zero (cel-go: a 90m
      // duration getHours() = 1, getMinutes() = 90, getSeconds() = 5400)
      case ("getHours", Some(r)) if isDurationExpr(r) =>
        arity(0); (toColumn(r, env) / 3600).cast("bigint")
      case ("getMinutes", Some(r)) if isDurationExpr(r) =>
        arity(0); (toColumn(r, env) / 60).cast("bigint")
      case ("getSeconds", Some(r)) if isDurationExpr(r) =>
        arity(0); toColumn(r, env).cast("bigint")
      case _ =>
        throw new IllegalArgumentException(
          s"CEL: unsupported function '$name' (receiver: ${recv.isDefined})")
    }
  }

  /** Go `time.ParseDuration` grammar, compile-time: optional sign, then
    * one or more `<number><unit>` terms, units h m s ms us µs ns; plain
    * "0" allowed. Returns total seconds as a double (Go durations are
    * fractional — "1.5h" is valid).
    */
  private[cel] def parseGoDuration(s: String): Double = {
    val str = s.trim
    def bad(): Nothing = throw new IllegalArgumentException(
      s"CEL: invalid duration '$s'")
    if (str.isEmpty) bad()
    var i = 0
    var sign = 1.0
    if (str(0) == '-' || str(0) == '+') {
      if (str(0) == '-') sign = -1.0
      i = 1
    }
    if (i >= str.length) bad()
    if (str.substring(i) == "0") return 0.0
    var total = 0.0
    while (i < str.length) {
      val j = i
      while (i < str.length && (str(i).isDigit || str(i) == '.')) i += 1
      if (i == j) bad()
      val num = try str.substring(j, i).toDouble catch { case _: NumberFormatException => bad() }
      // longest unit first: "ms"/"us"/"µs"/"ns" before bare "m"/"s"
      val factor =
        if (str.startsWith("ms", i)) { i += 2; 1e-3 }
        else if (str.startsWith("us", i) || str.startsWith("µs", i)) { i += 2; 1e-6 }
        else if (str.startsWith("ns", i)) { i += 2; 1e-9 }
        else if (i < str.length && str(i) == 'h') { i += 1; 3600.0 }
        else if (i < str.length && str(i) == 'm') { i += 1; 60.0 }
        else if (i < str.length && str(i) == 's') { i += 1; 1.0 }
        else bad()
      total += num * factor
    }
    sign * total
  }

  /** Driver-side guard for matches() patterns — runs once at compile()
    * (subscription create), never per row. The cel-spec pins matches() to
    * RE2 semantics: linear-time, no lookaround, no backreferences (and the
    * reference's Go stack gets this for free from regexp/RE2). Spark's
    * regexp_like evaluates on java.util.regex — a backtracking engine that
    * silently ACCEPTS Java-only constructs and goes exponential on
    * patterns RE2 runs in linear time. So, at create time:
    *   - the pattern must compile (syntax errors fail subscription
    *     creation, not every row on the executors);
    *   - Java-only constructs RE2 rejects are rejected here too:
    *     lookahead/lookbehind, atomic groups, possessive quantifiers,
    *     backreferences;
    *   - nested unbounded quantifiers ((a+)+, (a*)*, (x{2,})* …) are
    *     rejected: valid RE2, but the canonical catastrophic-backtracking
    *     fuel on Java's engine — the '(a+)+$' DoS a hostile subscription
    *     filter could plant.
    * Ambiguous quantified alternations ((a|aa)+) are NOT detected —
    * guaranteeing linear time for every accepted pattern needs an actual
    * RE2 engine, which the dependency set doesn't include; this guard
    * closes the conformance gap and the canonical DoS shapes.
    */
  private[cel] def validateMatchPattern(p: String): Unit = {
    try java.util.regex.Pattern.compile(p) catch {
      case e: java.util.regex.PatternSyntaxException =>
        throw new IllegalArgumentException(
          s"CEL: matches() pattern does not compile: ${e.getMessage}")
    }
    def bad(what: String): Nothing = throw new IllegalArgumentException(
      s"CEL: matches() pattern uses $what, outside the RE2 subset CEL specifies")
    val n = p.length
    // per open group: did its body contain an unbounded quantifier?
    val stack = scala.collection.mutable.ArrayBuffer.empty[Boolean]
    var cur = false
    // depth, not a flag: Java character classes nest ([a[b]] is a union
    // class), and closing at the FIRST ']' would misparse the remainder
    // of the pattern as live syntax (ADVICE r7 — false rejects)
    var classDepth = 0
    var i = 0
    // end index (exclusive) of an UNBOUNDED quantifier at j, else -1
    def unboundedAt(j: Int): Int =
      if (j >= n) -1
      else p(j) match {
        case '*' | '+' => j + 1
        case '{' =>
          val close = p.indexOf('}', j)
          if (close < 0) -1
          else if (p.substring(j + 1, close).endsWith(",")) close + 1 // {m,}
          else -1
        case _ => -1
      }
    // end index of ANY quantifier at j (incl. bounded/optional), else -1
    def quantAt(j: Int): Int =
      if (j >= n) -1
      else p(j) match {
        case '*' | '+' | '?' => j + 1
        case '{' =>
          val close = p.indexOf('}', j)
          if (close < 0) -1 else close + 1
        case _ => -1
      }
    while (i < n) {
      val c = p(i)
      if (classDepth > 0) {
        if (c == '\\') i += 2
        else {
          if (c == '[') classDepth += 1
          else if (c == ']') classDepth -= 1
          i += 1
        }
      } else if (c == '\\') {
        // \Q..\E quotes everything inside as a literal — skip it whole,
        // or a quoted '(a+)+' would be misread as live regex syntax
        if (i + 1 < n && p(i + 1) == 'Q') {
          val end = p.indexOf("\\E", i + 2)
          i = if (end < 0) n else end + 2
        } else {
          // \1..\9 are backreferences; \0 starts an OCTAL escape (a
          // literal character), not a backreference
          if (i + 1 < n && p(i + 1).isDigit && p(i + 1) != '0')
            bad("a backreference")
          if (i + 1 < n && p(i + 1) == 'k') bad("a named backreference")
          i += 2
        }
      } else c match {
        case '[' => classDepth = 1; i += 1
        case '(' =>
          if (p.startsWith("(?=", i) || p.startsWith("(?!", i)) bad("lookahead")
          if (p.startsWith("(?<=", i) || p.startsWith("(?<!", i)) bad("lookbehind")
          if (p.startsWith("(?>", i)) bad("an atomic group")
          stack += cur; cur = false; i += 1
        case ')' =>
          val bodyUnbounded = cur
          cur = if (stack.nonEmpty) stack.remove(stack.size - 1) else false
          val uEnd = unboundedAt(i + 1)
          val qEnd = quantAt(i + 1)
          if (qEnd >= 0 && qEnd < n && p(qEnd) == '+')
            bad("a possessive quantifier")
          if (uEnd >= 0 && bodyUnbounded)
            bad("nested unbounded quantifiers (catastrophic backtracking)")
          // a quantified group taints the enclosing scope, as does a body
          // whose own taint now sits one level up
          if (bodyUnbounded || uEnd >= 0) cur = true
          i = if (qEnd >= 0) qEnd else i + 1
        case '*' | '+' | '?' | '{' =>
          val uEnd = unboundedAt(i)
          val qEnd = quantAt(i)
          if (qEnd >= 0 && qEnd < n && p(qEnd) == '+')
            bad("a possessive quantifier")
          if (uEnd >= 0) cur = true
          i = if (qEnd >= 0) qEnd else i + 1
        case _ => i += 1
      }
    }
  }
}
