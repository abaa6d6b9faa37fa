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
