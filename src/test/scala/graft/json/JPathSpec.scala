package graft.json

import org.scalatest.funsuite.AnyFunSuite

class JPathSpec extends AnyFunSuite {
  private val doc = JValue.parse(
    """{"a": {"b": "x", "n": 5}, "arr": [1, 2, 3], "nested": [{"v": 1}, {"v": 2}]}""")

  test("hostile deep nesting rejects as malformed, never StackOverflowError") {
    // event bodies are untrusted per-row input: the reader must throw an
    // Exception the transform-error path routes to the DLQ — in practice
    // Jackson's StreamConstraintsException (its 2.15+ depth cap) fires
    // first, with JValue's own MaxDepth guard as the second line; an
    // uncatchable StackOverflowError would fail this test by propagating
    val deepArr = "[" * 5000 + "1" + "]" * 5000
    intercept[Exception] { JValue.parse(deepArr) }
    val deepObj = "{\"a\":" * 5000 + "1" + "}" * 5000
    intercept[Exception] { JValue.parse(deepObj) }
    assert(JValue.parseOpt(deepArr).isEmpty) // lenient face absorbs it too
    // sane depth unaffected
    assert(JValue.parse("[" * 100 + "1" + "]" * 100) != null)
  }

  test("parse/render round trip preserves key order and integer forms") {
    assert(doc.render == """{"a":{"b":"x","n":5},"arr":[1,2,3],"nested":[{"v":1},{"v":2}]}""")
    assert(JValue.parse("""{"f": 1.5, "g": 2.0}""").render == """{"f":1.5,"g":2}""")
  }

  test("get: dotted, indexed, missing") {
    assert(JPath.get(doc, "a.b").contains(JStr("x")))
    assert(JPath.get(doc, "arr[1]").contains(JInt(2)))
    assert(JPath.get(doc, "a.missing").isEmpty)
    assert(JPath.get(doc, "arr[9]").isEmpty)
    assert(JPath.get(doc, "a.b.c").isEmpty) // through a scalar
  }

  test("getAll: [:] projection (ojg semantics used by RENDER_ARRAY)") {
    assert(JPath.getAll(doc, JPath.parse("nested[:].v")) == Vector(JInt(1), JInt(2)))
    assert(JPath.getAll(doc, JPath.parse("arr[:]")) == Vector(JInt(1), JInt(2), JInt(3)))
  }

  test("slice selector parse vectors (lib/json/path/parse_test.go:58-67)") {
    import JPath._
    def seg(p: String): Seg = parse(p).last
    // the reference's own table, verbatim (whitespace included)
    assert(seg("a[ : ]") == AllItems) // start/end/step all default == [:]
    assert(seg("a[ : : ]") == AllItems)
    assert(seg("a[ : : -1 ]") == Slice(None, None, -1))
    assert(seg("a[ 0 : : ]") == Slice(Some(0), None, 1))
    assert(seg("a[ : 0 : ]") == Slice(None, Some(0), 1))
    assert(seg("a[ 1 : 3 ]") == Slice(Some(1), Some(3), 1))
    assert(seg("a[ 1 : 5 : 2 ]") == Slice(Some(1), Some(5), 2))
    assert(seg("a[ 5 : 1 : -2 ]") == Slice(Some(5), Some(1), -2))
    // plain index still parses as Index
    assert(seg("a[2]") == Index(2))
  }

  test("slice selection follows RFC 9535 (negatives, clamps, reverse, step 0)") {
    val arr = JValue.parse("""{"a":[10,20,30,40,50]}""")
    def sel(p: String): Vector[JValue] = JPath.getAll(arr, JPath.parse(p))
    def ints(p: String): Vector[Long] =
      sel(p).map { case JInt(v) => v; case other => fail(s"non-int $other") }
    assert(ints("a[1:3]") == Vector(20L, 30L))
    assert(ints("a[1:5:2]") == Vector(20L, 40L))
    assert(ints("a[5:1:-2]") == Vector(50L, 30L)) // start clamps to len-1
    assert(ints("a[::-1]") == Vector(50L, 40L, 30L, 20L, 10L))
    assert(ints("a[-2:]") == Vector(40L, 50L))
    assert(ints("a[:-3]") == Vector(10L, 20L))
    assert(ints("a[0:100]") == Vector(10L, 20L, 30L, 40L, 50L)) // end clamps
    assert(ints("a[3:1]") == Vector.empty) // empty forward range
    assert(ints("a[1:3:0]") == Vector.empty) // step 0 selects nothing
    // point lookup through a slice is invalid; set/delete refuse
    assert(JPath.get(arr, "a[1:3]").isEmpty)
    assert(JPath.set(arr, "a[1:3]", JInt(1)).isLeft)
    assert(JPath.delete(arr, "a[1:3]").isLeft)
  }

  test("malformed bracket selectors fail as IllegalArgumentException") {
    // NumberFormatException would escape the transformer's spec-validation
    // wrapping with a useless bare message
    for (bad <- Seq("a[1:x]", "a[x]", "a[1:2:3:4]", "a['k\"]", "a['unterminated]")) {
      val e = intercept[IllegalArgumentException] { JPath.parse(bad) }
      assert(e.getMessage.contains("bad path selector"), s"$bad -> ${e.getMessage}")
    }
  }

  test("quoted bracket keys select members with dots/spaces (ojg ['k'])") {
    val d = JValue.parse("""{"a b":1,"x.y":{"z":2},"plain":3}""")
    assert(JPath.get(d, "['a b']").contains(JInt(1)))
    assert(JPath.get(d, """["x.y"].z""").contains(JInt(2)))
    assert(JPath.set(d, "['a b']", JInt(9)).toOption
      .flatMap(JPath.get(_, "['a b']")).contains(JInt(9)))
  }

  test("quoted bracket keys may contain ']' and escaped quotes (ADVICE r15)") {
    val d = JValue.parse("""{"a]b":1,"q'k":2,"c\\d":3}""")
    // ']' inside a quoted selector does not close the bracket
    assert(JPath.parse("['a]b']") == Vector(JPath.Field("a]b")))
    assert(JPath.get(d, "['a]b']").contains(JInt(1)))
    // backslash-escaped quote of the SAME kind, and escaped backslash
    assert(JPath.parse("['q\\'k']") == Vector(JPath.Field("q'k")))
    assert(JPath.get(d, "['q\\'k']").contains(JInt(2)))
    assert(JPath.parse("['c\\\\d']") == Vector(JPath.Field("c\\d")))
    assert(JPath.get(d, "['c\\\\d']").contains(JInt(3)))
    // a quote closing EARLY (trailing junk inside the bracket) is malformed,
    // as is an unterminated quote swallowing the rest of the path
    for (bad <- Seq("['k'x]", "['a]b]", "['a\\']"))
      assert(intercept[IllegalArgumentException] { JPath.parse(bad) }
        .getMessage.contains("bad path selector"), bad)
  }

  test("negative read indexes and [*] wildcard (ojg semantics)") {
    val arr = JValue.parse("""{"a":[10,20,30]}""")
    assert(JPath.get(arr, "a[-1]").contains(JInt(30)))
    assert(JPath.get(arr, "a[-3]").contains(JInt(10)))
    assert(JPath.get(arr, "a[-4]").isEmpty) // past the front: a miss
    // [*] is the same projection as [:]
    assert(JPath.parse("a[*]") == JPath.parse("a[:]"))
    assert(JPath.getAll(arr, JPath.parse("a[*]")).size == 3)
    // the SETTER keeps the reference's non-negative contract
    assert(JPath.set(arr, "a[-1]", JInt(9)).isLeft)
  }

  test("set: auto-creates maps, null-pads arrays (event.go:171-226)") {
    val r1 = JPath.set(doc, "new.deep.key", JStr("v")).toOption.get
    assert(JPath.get(r1, "new.deep.key").contains(JStr("v")))
    val r2 = JPath.set(doc, "arr[5]", JInt(9)).toOption.get
    assert(JPath.get(r2, "arr").contains(
      JArr(Vector(JInt(1), JInt(2), JInt(3), JNull, JNull, JInt(9)))))
    assert(JPath.set(doc, "a.b.c", JStr("v")).isLeft) // through a scalar
  }

  test("delete: object members only (event.go:258-280)") {
    val r = JPath.delete(doc, "a.b").toOption.get
    assert(JPath.get(r, "a.b").isEmpty)
    assert(JPath.get(r, "a.n").contains(JInt(5)))
    assert(JPath.delete(doc, "arr[0]").isLeft)
    assert(JPath.delete(doc, "a.nope").isLeft)
  }
}
