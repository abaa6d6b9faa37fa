package graft.filters

import graft.cel.CEL
import graft.cesql.CESQL
import org.scalatest.funsuite.AnyFunSuite

/** Create-time robustness of the user-facing filter DSL compilers: every
  * malformed or hostile input must reject with IllegalArgumentException —
  * the same create-time path the reference routes to an InvalidArgument
  * RPC error — never a StackOverflowError (fatal to the analysis thread),
  * MatchError, or index-out-of-bounds.
  */
class DslRobustnessSpec extends AnyFunSuite {

  private def rejects(label: String)(body: => Any): Unit =
    withClue(label) {
      intercept[IllegalArgumentException] { body }
      ()
    }

  test("CEL: malformed inputs reject cleanly") {
    Seq(
      "" -> "empty",
      "'abc" -> "unterminated string",
      "$k" -> "variable missing type",
      "$k.(float)" -> "unsupported variable type",
      "1 +" -> "dangling operator",
      "(1" -> "unbalanced paren",
      "1 ? 2" -> "incomplete ternary",
      "[1, 2" -> "unterminated list",
      "frob(1)" -> "unknown function",
      "'a'.frob('b')" -> "unknown method",
      "size()" -> "wrong arity",
      "has(1)" -> "has on non-variable",
      "1 in 2" -> "in without list literal",
      "$s.(string) + 1" -> "mixed concat overload",
      "1 2" -> "trailing tokens").foreach { case (e, why) =>
      rejects(s"CEL <$e> ($why)")(CEL.compile(e))
    }
  }

  test("CEL: pathological nesting rejects instead of overflowing the stack") {
    rejects("deep parens")(CEL.compile("(" * 5000 + "1" + ")" * 5000))
    rejects("deep unary")(CEL.compile("!" * 5000 + "true"))
    // at sane depth the guard must NOT fire
    assert(CEL.compile("(" * 50 + "true" + ")" * 50) != null)
  }

  test("CESQL: malformed inputs reject cleanly") {
    Seq(
      "" -> "empty",
      "type = " -> "dangling comparison",
      "(type = 'a'" -> "unbalanced paren",
      "type LIKE 5" -> "non-string LIKE pattern",
      "type IN 'a'" -> "IN without parens",
      "type NOT 5" -> "infix NOT without LIKE/IN",
      "EXISTS 5" -> "EXISTS without attribute",
      "CONCAT(" -> "unterminated call").foreach { case (e, why) =>
      rejects(s"CESQL <$e> ($why)")(CESQL.compile(e))
    }
  }

  test("CESQL: pathological nesting rejects instead of overflowing the stack") {
    rejects("deep parens")(CESQL.compile("(" * 5000 + "TRUE" + ")" * 5000))
    rejects("deep NOT")(CESQL.compile("NOT " * 5000 + "TRUE"))
    assert(CESQL.compile("(" * 50 + "TRUE" + ")" * 50) != null)
  }

  test("FilterSpec JSON round-trip: toJson is fromJson's exact inverse") {
    import graft.model.FilterSpec
    import graft.model.FilterSpec._
    // every dialect, nested — the shared-group roster persists specs
    // through this pair, so round-trip identity is load-bearing
    val trees: Seq[FilterSpec] = Seq(
      Exact(Seq("type" -> "purchase", "source" -> "s1")),
      Prefix(Seq("subject" -> "ord-")),
      Suffix(Seq("id" -> "-99")),
      Not(Exact(Seq("type" -> "x"))),
      CeSql("type = 'a' AND EXISTS k"),
      Cel("$type == 'a'"),
      All(Seq(Exact(Seq("a" -> "1")), Any(Seq(Cel("$x == 'y'"),
        Suffix(Seq("b" -> "2")))))),
      NoFilter)
    trees.foreach { t =>
      assert(FilterSpec.fromJson(FilterSpec.toJson(t)) == t, t.toString)
    }
    val list = trees.take(5)
    assert(FilterSpec.listFromJson(FilterSpec.listToJson(list).render) == list)
    // the documented non-round-trippables: duplicate pair keys collapse
    // (last wins through the JSON object form), empty values reject on
    // the way back in — both are what SharedGroup.requireJoinable screens
    val dup = Exact(Seq("k" -> "a", "k" -> "b"))
    assert(FilterSpec.fromJson(FilterSpec.toJson(dup)) == Exact(Seq("k" -> "b")))
    intercept[IllegalArgumentException] {
      FilterSpec.fromJson(FilterSpec.toJson(Exact(Seq("k" -> ""))))
    }
  }
}
