package graft.cel

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Conformance vectors re-derived from the PUBLIC CEL specification
  * (google/cel-spec: langdef.md and the simple conformance suite's
  * published categories — basic literals, int64/double math, comparisons,
  * logic with commutative error absorption, ternary), restricted to the
  * dialect subset the reference exposes (pkg/cel/cel.go:44-196: typed
  * `$path.(type)` variables over the event data body, no functions/lists).
  *
  * Two evaluation modes, matching the reference's usage:
  *  - `evals(expr)` — the raw expression value via toColumn (spec semantics
  *    for non-boolean subtrees);
  *  - `passes(expr)` — the compiled filter (error/missing ⇒ false,
  *    cel_filter.go:42-46).
  */
class CELVectorsSpec extends SparkSpec {

  // fixture: data body with one field per variable type
  lazy val ev: DataFrame = {
    import spark.implicits._
    Seq((1L, """{"k":12,"f":1.5,"s":"abc","b":true,"neg":-7,"zero":0}"""))
      .toDF("sequence_number", "data")
  }

  private def evals(expr: String): Any = {
    val c = CEL.toColumn(new CEL.Parser(CEL.Lexer.tokenize(expr)).parse())
    ev.select(c.as("v")).head.get(0)
  }

  private def passes(expr: String): Boolean =
    ev.filter(CEL.compile(expr)).count() == 1

  private def vectors(cases: (String, Boolean)*): Unit =
    cases.foreach { case (e, expected) =>
      assert(passes(e) == expected, s"vector failed: <$e> expected $expected")
    }

  test("basic literals self-evaluate (cel-spec basic)") {
    assert(evals("17") === 17L)
    assert(evals("-1") === -1L)
    assert(evals("42u") === 42L)
    assert(evals("7.5") === 7.5)
    assert(evals("'hello'") === "hello")
    assert(evals("\"hello\"") === "hello")
    assert(evals("true") === true)
    assert(evals("!false") === true)
  }

  test("int64 math (cel-spec int64_math): truncating division, Go-sign mod") {
    assert(evals("1 + 1") === 2L)
    assert(evals("64 - 11") === 53L)
    assert(evals("17 * 2") === 34L)
    assert(evals("35 / 5") === 7L)   // int ÷ int stays int64
    assert(evals("10 / 3") === 3L)   // truncation, not 3.33
    assert(evals("-10 / 3") === -3L) // toward zero, not floor
    assert(evals("15 % 4") === 3L)
    assert(evals("-15 % 4") === -3L) // dividend-sign remainder (Go/CEL)
  }

  test("double math (cel-spec double_math)") {
    assert(evals("7.0 * 2.0") === 14.0)
    assert(evals("10.0 / 4.0") === 2.5)
    assert(evals("1.0 + 2.5") === 3.5)
    // mixed int/double promotes to double
    assert(evals("3 + 0.5") === 3.5)
  }

  test("comparisons incl. cross-numeric-type equality (cel-spec comparisons)") {
    vectors(
      "1 < 2" -> true, "2 < 1" -> false,
      "2 <= 2" -> true, "3 <= 2" -> false,
      "3 > 2" -> true, "2 >= 3" -> false,
      "1 == 1" -> true, "1 != 1" -> false,
      "2 == 2.0" -> true,  // numeric equality crosses int64/double
      "1.0 < 2" -> true,
      "'a' < 'b'" -> true, // lexicographic string order
      "'abc' == 'abc'" -> true, "'abc' != 'abd'" -> true)
  }

  test("logic: commutative error absorption (cel-spec logic)") {
    vectors(
      "true && true" -> true, "true && false" -> false,
      "false || true" -> true, "false || false" -> false,
      "!true" -> false,
      // CEL's signature conformance cases: a short-circuitable side
      // absorbs an error on the other side (1/0 and bad coercions err)
      "true || ($zero.(int64) == 1/0)" -> true,
      "false && ($zero.(int64) == 1/0)" -> false,
      // non-absorbed error fails the filter (error => false)
      "$s.(int64) == 1" -> false)
  }

  test("ternary (cel-spec conditional)") {
    assert(evals("false ? 1 : 2") === 2L)
    assert(evals("true ? 1 : 2") === 1L)
    vectors(
      "($k.(int64) > 10 ? 'big' : 'small') == 'big'" -> true,
      "(false ? 1 : 2) == 2" -> true)
  }

  test("string functions (cel-spec string_ext / standard functions)") {
    // vectors from the cel-spec simple conformance suite's string
    // categories (size, contains, starts_with, ends_with, matches)
    assert(evals("size('hello')") === 5L)
    assert(evals("size('')") === 0L)
    vectors(
      "size('abc') == 3" -> true,
      "size($s.(string)) == 3" -> true,      // s = "abc"
      "size('four') + 2 == 6" -> true,       // size() joins int64 arithmetic
      "'hello mellow'.contains('mellow')" -> true,
      "'hello mellow'.contains('jello')" -> false,
      "''.contains('')" -> true,
      "$s.(string).contains('b')" -> true,
      "'hello'.startsWith('he')" -> true,
      "'hello'.startsWith('lo')" -> false,
      "'hello'.endsWith('lo')" -> true,
      "'hello'.endsWith('he')" -> false,
      "$s.(string).startsWith('ab')" -> true,
      "$s.(string).endsWith('bc')" -> true,
      // matches is UNANCHORED partial match (cel-spec), not Go's anchored
      "'hubba'.matches('ubb')" -> true,
      "'hubba'.matches('^ubb')" -> false,
      "'hubba'.matches('^hub+a$')" -> true,
      "'abc123'.matches('[0-9]+')" -> true,
      "'abc'.matches('[0-9]+')" -> false,
      // chains and composition (string + string concatenates, cel-spec)
      "('pre' + 'fix').startsWith('pre')" -> true,
      "('he' + 'llo') == 'hello'" -> true,
      "($s.(string) + 'd').endsWith('cd')" -> true)
    // mixed string/number '+' is no_such_overload at COMPILE time (the
    // reference rejects the subscription at create), never a silent coerce
    intercept[IllegalArgumentException] { CEL.compile("$s.(string) + 1 == 2") }
    vectors(
      "$missing.(string).contains('x')" -> false, // missing => filter false
      "'hello'.contains('ell') && 'hello'.endsWith('o')" -> true)
  }

  test("has() macro: field presence without eval error (cel-spec macros)") {
    vectors(
      "has($k.(int64))" -> true,
      "has($s.(string))" -> true,
      "has($nope.(string))" -> false,
      "!has($nope.(string))" -> true, // absence is testable, not an error
      "has($k.(int64)) && $k.(int64) == 12" -> true,
      "has($nope.(int64)) || $b.(bool)" -> true)
  }

  test("in operator over list literals (cel-spec lists/membership)") {
    vectors(
      "'a' in ['a', 'b', 'c']" -> true,
      "'d' in ['a', 'b', 'c']" -> false,
      "2 in [1, 2, 3]" -> true,
      "7 in [1, 2, 3]" -> false,
      "!('d' in ['a', 'b'])" -> true,
      "'x' in []" -> false,
      "$s.(string) in ['abc', 'xyz']" -> true,   // s = "abc"
      "$k.(int64) in [11, 12, 13]" -> true,      // k = 12
      "$k.(int64) + 1 in [13]" -> true,          // in binds like relations
      "1 == 1 in [true]" -> true,                // left-assoc: (1==1) in [true]
      "$missing.(string) in ['a']" -> false)     // missing => filter false
  }

  test("comprehension macros exists/all/filter/map (cel-spec macros)") {
    // vectors from the cel-spec simple conformance suite's macro
    // categories, over list literals and split results
    vectors(
      "[1, 2, 3].exists(x, x == 2)" -> true,
      "[1, 2, 3].exists(x, x > 5)" -> false,
      "[].exists(x, x == 1)" -> false,
      "[1, 2, 3].all(x, x > 0)" -> true,
      "[1, 2, 3].all(x, x > 1)" -> false,
      "[].all(x, x > 0)" -> true,               // vacuous truth
      "size([1, 2, 3].filter(x, x > 1)) == 2" -> true,
      "[1, 2, 3].filter(x, x > 9).size() == 0" -> true,
      "[1, 2, 3].map(x, x * 2).exists(x, x == 6)" -> true,
      "4 in [1, 2, 3].map(x, x + 1)" -> true,
      "[1, 2, 3].exists(x, $k.(int64) % x == 0)" -> true, // k = 12
      "['ab', 'c'].exists(s, s.size() == 2)" -> true,
      "['ab', 'c'].map(s, s + '!').all(s, s.endsWith('!'))" -> true,
      "[1, 2, 3].exists_one(x, x > 2)" -> true,
      "[1, 2, 3].exists_one(x, x > 1)" -> false, // two satisfy: not ONE
      "[1, 2, 3].exists_one(x, x > 9)" -> false,
      // nesting: inner macro sees both iteration variables
      "[1, 2].exists(a, [2, 3].exists(b, a == b))" -> true,
      "[1, 4].exists(a, [2, 3].exists(b, a == b))" -> false)
    // unbound identifier rejects at compile, not at eval
    intercept[IllegalArgumentException] { CEL.compile("x > 1") }
    intercept[IllegalArgumentException] {
      CEL.compile("[1].exists(x, y == 1)")
    }
  }

  test("macro normalization: in-over-map and exists/all-over-filter rewrites") {
    import CEL._
    def norm(s: String): Expr =
      CEL.normalize(new Parser(Lexer.tokenize(s)).parse())
    // in ∘ map ⇒ exists with a pre-image equation
    norm("1 in [1, 2].map(x, x + 0)") match {
      case Call("exists", Some(LList(_)), List(Ident("x"), Bin("==", _, LInt(1)))) =>
      case other => fail(s"in-over-map did not rewrite: $other")
    }
    // exists ∘ filter fuses the predicate into the quantifier body via
    // the ternary (p ? q : false) — null-p keeps HOF drop semantics
    norm("[1, 2].filter(x, x > 0).exists(y, y == 2)") match {
      case Call("exists", Some(LList(_)),
        List(Ident("x"), Ternary(_, _, LBool(false)))) =>
      case other => fail(s"exists-over-filter did not rewrite: $other")
    }
    // the fused body renames the quantifier variable INSIDE list
    // literals too (the subst/LList bug a review caught: an unrenamed y
    // silently resolved against an enclosing binder)
    vectors(
      "[1, 2].filter(x, x > 0).exists(y, 1 in [y, 2])" -> true,
      "[3, 4].filter(x, x > 3).exists(y, 1 in [y, 2])" -> false,
      "[100].exists(y, [1, 2].filter(x, x > 0).exists(y, 2 in [y]))" -> true,
      "[100].exists(y, [1, 2].filter(x, x > 0).exists(y, 3 in [y]))" -> false)
    // chains collapse end-to-end and KEEP the HOF semantics
    vectors(
      "1 in [0, 1].map(x, x + 0)" -> true,
      "5 in [0, 1].map(x, x + 0)" -> false,
      "[1, 2, 3].filter(x, x > 1).exists(y, y == 2)" -> true,
      "[1, 2, 3].filter(x, x > 1).exists(y, y == 1)" -> false,
      "[1, 2, 3].filter(x, x > 1).all(y, y >= 2)" -> true,
      "[1, 2, 3].filter(x, x > 1).all(y, y >= 3)" -> false,
      "40 in [10, 20, 30].filter(x, x <= $k.(int64)).map(x, x * 2)" -> false, // k=12
      "24 in [10, 12, 30].filter(x, x <= $k.(int64)).map(x, x * 2)" -> true)
    // capture guard: a needle mentioning the iteration variable skips the
    // rewrite but still evaluates correctly via the HOF path
    vectors("[1, 2].exists(x, x in [2, 3].map(y, y + 0))" -> true)
  }

  test("split (cel string extension) composes with macros and size") {
    vectors(
      "'a,b,c'.split(',').size() == 3" -> true,
      "'a,b,c'.split(',').exists(s, s == 'b')" -> true,
      "'b' in 'a,b,c'.split(',')" -> true,
      "'a..b'.split('.').size() == 3" -> true, // literal dot, not regex any
      "'a,,b'.split(',').exists(s, s == '')" -> true, // empties kept
      "$s.(string).split('b').size() == 2" -> true)   // s = "abc"
  }

  test("relational operators share one left-associative level (cel-spec syntax)") {
    vectors(
      // `in` then `<`: ((2 in [1,2]) < true) — unparseable when `<` bound
      // tighter than `in`, since `<` would consume the list literal
      "(2 in [1, 2]) != false" -> true,
      "2 in [1, 2] == true" -> true,
      "1 < 2 == true" -> true,    // (1 < 2) == true
      "true == 1 < 2" -> true)    // (true == 1) … left-assoc: (true==1)<2
  }

  test("matches() rejects non-RE2 and catastrophic patterns at compile (ADVICE r6)") {
    // accepted: plain RE2-safe patterns still work per-row
    vectors(
      "'hubba'.matches('hu(b)+a')" -> true,
      "'x42'.matches('^x[0-9]{1,3}$')" -> true,
      "'aaa'.matches('(a|b)+')" -> true)
    // rejected at COMPILE time (subscription create), never per-row
    def rejects(pattern: String): Unit =
      intercept[IllegalArgumentException] {
        CEL.compile(s"$$s.(string).matches('$pattern')")
      }
    rejects("(a+)+$")        // the canonical catastrophic-backtracking DoS
    rejects("(a*)*")
    rejects("(a{2,})+")
    rejects("(?=x)a")        // lookahead
    rejects("(?!x)a")
    rejects("(?<=x)a")       // lookbehind
    rejects("(a)\\\\1")      // backreference
    rejects("a*+")           // possessive quantifier
    rejects("(ab")           // syntax error fails create, not eval
    // dynamic patterns can't be pre-validated -> create-time reject
    intercept[IllegalArgumentException] {
      CEL.compile("$s.(string).matches($s.(string))")
    }
    // nested union classes (Java [a[b]]) must NOT confuse the scanner:
    // the first ']' doesn't end the class (ADVICE r7), so the quantified
    // suffix is still read correctly on both sides of the verdict
    CEL.compile("$s.(string).matches('[a[b]]+x')")          // accepted
    rejects("[a[b]]*([c[d]]+)+")  // nested quantifiers seen THROUGH classes
    // a ')' inside a nested class is a literal, not a group close — if the
    // scanner left the class at the first ']', this valid pattern's group
    // bookkeeping would desync
    CEL.compile("$s.(string).matches('([a[)b]]x)+')")
  }

  test("bytes literals (cel-spec basic)") {
    vectors(
      "b'abc' == b'abc'" -> true,
      "b'abc' != b'abd'" -> true,
      "size(b'abc') == 3" -> true,
      "b'é'.size() == 2" -> true) // UTF-8 encodes é as two bytes
    // a bare identifier `b` still parses as a macro variable, not bytes
    vectors("[1, 2].exists(b, b == 2)" -> true)
  }

  test("int()/double()/string() conversions (cel-spec conversions)") {
    vectors(
      "int('42') == 42" -> true,
      "int(3.9) == 3" -> true,      // truncation toward zero
      "int(-3.9) == -3" -> true,
      "int($f.(double)) == 1" -> true,   // f = 1.5
      "int(timestamp('1970-01-01T00:01:30Z')) == 90" -> true,
      "double('1.5') == 1.5" -> true,
      "double(3) == 3.0" -> true,
      "string(42) == '42'" -> true,
      "string(42) + 'x' == '42x'" -> true,  // statically string-typed
      "int('abc') == int('abc')" -> false,  // parse error -> filter false
      "int('7') / int('2') == 3" -> true)   // int()-typed -> truncating div
  }

  test("map literals, key membership, and indexing (cel-spec maps/lists)") {
    vectors(
      "'a' in {'a': 1, 'b': 2}" -> true,
      "'c' in {'a': 1, 'b': 2}" -> false,
      "$s.(string) in {'abc': 1, 'xyz': 2}" -> true,   // s = "abc"
      "{'a': 1, 'b': 2}['b'] == 2" -> true,
      "{'a': 1}['missing'] == 1" -> false,  // no_such_key -> filter false
      "{'a': 1, 'b': 2}.size() == 2" -> true,
      "size({'a': 1}) == 1" -> true,
      "{}.size() == 0" -> true,
      // list indexing is 0-based; out of range -> filter false
      "[10, 20, 30][1] == 20" -> true,
      "[10, 20][5] == 10" -> false,
      "[10, 20][$k.(int64) - 12] == 10" -> true,        // k = 12 -> index 0
      // indexing composes with arithmetic and membership
      "{'a': 10, 'b': 20}['a'] + [1, 2][1] == 12" -> true,
      // a map value keyed by a data variable
      "{'abc': 7}[$s.(string)] == 7" -> true)
    // maps/lists are the only indexable values
    intercept[IllegalArgumentException](CEL.compile("'abc'[0] == 'a'"))
    // macro iteration variables reach through indexing and map values
    // (subst/mentions traverse the new nodes)
    vectors(
      "[0, 1].exists(i, [10, 20][i] == 20)" -> true,
      "[1, 2].all(x, {'a': 1, 'b': 2}['b'] >= x)" -> true)
  }

  test("timestamp()/duration() conversions and temporal arithmetic (cel-spec timestamps)") {
    vectors(
      "timestamp('2009-02-13T23:31:30Z') == timestamp('2009-02-13T23:31:30Z')" -> true,
      "timestamp('2009-02-13T23:31:29Z') < timestamp('2009-02-13T23:31:30Z')" -> true,
      "timestamp('2009-02-13T23:31:30Z') > timestamp('2009-02-13T23:31:29Z')" -> true,
      // ts + dur, dur + ts, ts - dur
      "timestamp('2009-02-13T23:31:30Z') + duration('1m') == timestamp('2009-02-13T23:32:30Z')" -> true,
      "duration('1h') + timestamp('2009-02-13T23:31:30Z') == timestamp('2009-02-14T00:31:30Z')" -> true,
      "timestamp('2009-02-13T23:31:30Z') - duration('90s') == timestamp('2009-02-13T23:30:00Z')" -> true,
      // ts - ts is a duration
      "timestamp('2009-02-13T23:31:30Z') - timestamp('2009-02-13T23:30:30Z') == duration('60s')" -> true,
      // duration parsing: compound terms, unit equivalences, fractions
      "duration('1h') == duration('60m')" -> true,
      "duration('1h30m') > duration('89m')" -> true,
      "duration('1.5h') == duration('90m')" -> true,
      "duration('250ms') + duration('750ms') == duration('1s')" -> true,
      "duration('-30s') < duration('0s')" -> true,
      // accessors: cel pins getMonth/getDayOfMonth 0-based, getDate
      // 1-based, getDayOfWeek 0 = Sunday (2009-02-13 was a Friday)
      "timestamp('2009-02-13T23:31:30Z').getFullYear() == 2009" -> true,
      "timestamp('2009-02-13T23:31:30Z').getMonth() == 1" -> true,
      "timestamp('2009-02-13T23:31:30Z').getDate() == 13" -> true,
      "timestamp('2009-02-13T23:31:30Z').getDayOfMonth() == 12" -> true,
      "timestamp('2009-02-13T23:31:30Z').getDayOfWeek() == 5" -> true,
      "timestamp('2009-02-13T23:31:30Z').getHours() == 23" -> true,
      "timestamp('2009-02-13T23:31:30Z').getMinutes() == 31" -> true,
      "timestamp('2009-02-13T23:31:30Z').getSeconds() == 30" -> true,
      // duration accessors are truncated TOTALS (cel-go)
      "duration('90m').getHours() == 1" -> true,
      "duration('90m').getMinutes() == 90" -> true,
      "duration('90m').getSeconds() == 5400" -> true,
      // unparseable text = eval error -> filter false (even for ==)
      "timestamp('not a time') == timestamp('not a time')" -> false,
      // data-dependent: k=12 builds a valid second field
      "timestamp('2009-02-13T23:31:' + $k.(string) + 'Z').getSeconds() == 12" -> true)
    // Go grammar rejects at COMPILE time (subscription create)
    for (bad <- Seq("", "5", "s", "1x", "1h2x", "--3s"))
      intercept[IllegalArgumentException] {
        CEL.compile(s"duration('$bad') == duration('$bad')")
      }
    // computed duration strings can't be compile-time parsed -> reject
    intercept[IllegalArgumentException] {
      CEL.compile("duration($s.(string)) == duration('1s')")
    }
    assert(CEL.parseGoDuration("0") === 0.0)
    assert(CEL.parseGoDuration("1h2m3s") === 3723.0)
    assert(CEL.parseGoDuration("100ns") === 100 * 1e-9) // same fold as the parser
  }

  test("int64/uint64 exactness at the 2^53..2^64-1 boundaries") {
    import spark.implicits._
    // values chosen to be unrepresentable in a double: 2^53+1, int64 max,
    // 2^63 and 2^64-1 — the old double-staged casts rounded or nulled them
    val big = Seq((1L,
      """{"p53":9007199254740993,"i64max":9223372036854775807,""" +
        """"u63":9223372036854775808,"u64max":18446744073709551615,""" +
        """"ps":"9007199254740993","uf":2.9,"neg":-7}"""))
      .toDF("sequence_number", "data")
    def ok(e: String): Boolean = big.filter(CEL.compile(e)).count() == 1
    assert(ok("$p53.(int64) == 9007199254740993"))
    assert(!ok("$p53.(int64) == 9007199254740992")) // the double rounding
    assert(ok("$i64max.(int64) == 9223372036854775807"))
    assert(ok("$i64max.(int64) - 1 == 9223372036854775806"))
    assert(ok("$u63.(uint64) == 9223372036854775808u")) // past Long.MaxValue
    assert(ok("$u64max.(uint64) == 18446744073709551615u"))
    assert(!ok("$u64max.(uint64) == 18446744073709551614u"))
    assert(ok("$u64max.(uint64) > 9223372036854775807")) // decimal vs bigint
    assert(ok("int($ps.(string)) == 9007199254740993")) // bigint-first int()
    assert(ok("$uf.(uint64) == 2"))  // float text still truncates, not rounds
    assert(!ok("$neg.(uint64) == 0")) // negative uint bind is an eval error
    assert(!ok("$neg.(uint64) < 0"))
  }

  test("typed variables over the data body with lenient coercions (cel.go:198-275)") {
    vectors(
      "$k.(int64) == 12" -> true,
      "$k.(uint64) == 12" -> true,
      "$k.(double) == 12.0" -> true,
      "$k.(string) == '12'" -> true,   // numeric value reads as its text
      "$f.(double) == 1.5" -> true,
      "$f.(int64) == 1" -> true,       // float → int64 truncates
      "$s.(string) == 'abc'" -> true,
      "$b.(bool)" -> true,
      "$neg.(int64) == -7" -> true,
      "$k.(int64) / 4 == 3" -> true,   // typed var joins int64 division
      "$missing.(int64) == 0" -> false // missing => filter false, not error
    )
  }
}
