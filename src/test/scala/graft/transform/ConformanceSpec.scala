package graft.transform

import graft.json._
import org.scalatest.funsuite.AnyFunSuite

/** The reference's OWN test vectors, ported verbatim — the de-facto
  * conformance suite (r12 VERDICT #3). Sources:
  * `pkg/transform/action/strings` (every `_test.go`),
  * `action/structs` and `action/math` test files,
  * `pkg/template/json/template_test.go`,
  * and `lib/bytes/escape_test.go` (the text template parser's
  * `\`-escape decoder — `pkg/template/text` ships no test file of its
  * own, so the escape vectors come from the library the parser calls,
  * run through the text parser's escapePlan). Each table row is
  * one reference assertion: same inputs, same expected output or error.
  * Go indexes strings by UTF-8 BYTE, so the positional splice tables
  * include multibyte vectors whose expectations are computed from Go's
  * byte-slicing semantics (strings_functions.go:87-106); rune-boundary
  * cuts are exact, and a cut INSIDE a rune is the one documented
  * divergence (JVM substitutes U+FFFD; Go keeps raw invalid bytes).
  */
class ConformanceSpec extends AnyFunSuite {

  private def ev(dataJson: String, ext: (String, String)*): Ctx =
    Ctx.of(EventValue.simple("testId", "testSource", "testType", dataJson, ext: _*))

  private def run(ctx: Ctx, cmd: String): Either[String, Ctx] =
    Actions.Command.parse(JValue.parse(cmd)).flatMap(_.execute(ctx))

  private def extOf(r: Either[String, Ctx], name: String): String =
    r.toOption.get.event.get.lookupAttr(name).getOrElse(
      fail(s"extension $name missing"))

  private def at(r: Either[String, Ctx], path: String): JValue =
    JPath.get(r.toOption.get.data, path).getOrElse(JNull)

  private def strArr(r: Either[String, Ctx], path: String): Vector[String] =
    at(r, path) match {
      case JArr(items) => items.map { case JStr(s) => s; case other => fail(s"non-string $other") }
      case other => fail(s"expected array at $path, got $other")
    }

  // ===== strings: value-transform actions ================================

  test("add_prefix / add_suffix / lower / upper vectors") {
    // add_prefix_test.go, add_suffix_test.go, lower_case_test.go, upper_case_test.go
    val rows = Seq(
      ("""["add_prefix", "$.test", "prefix"]""", "testValue", "prefixtestValue"),
      ("""["add_suffix", "$.test", "suffix"]""", "testValue", "testValuesuffix"),
      ("""["lower_case", "$.test"]""", "testValue", "testvalue"),
      ("""["upper_case", "$.test"]""", "testValue", "TESTVALUE"))
    rows.foreach { case (cmd, in, want) =>
      assert(extOf(run(ev("{}", "test" -> in), cmd), "test") == want, cmd)
    }
  }

  test("capitalize_sentence / capitalize_word vectors") {
    // capitalize_sentence_test.go:28-41; capitalize_word_test.go:28-103
    val sentence = Seq("test value" -> "Test value")
    sentence.foreach { case (in, want) =>
      assert(extOf(run(ev("{}", "test" -> in), """["capitalize_sentence", "$.test"]"""), "test") == want)
    }
    val word = Seq(
      "one two three" -> "One Two Three",
      " . one, two,   three q four 111 плюс минус  " ->
        " . One, Two,   Three Q Four 111 Плюс Минус  ",
      "" -> "",
      "♬" -> "♬",
      "a" -> "A",
      "let 'em go" -> "Let 'em Go")
    word.foreach { case (in, want) =>
      assert(extOf(run(ev("{}", "test" -> in), """["capitalize_word", "$.test"]"""), "test") == want, in)
    }
  }

  test("replace_string / replace_with_regrex vectors") {
    // replace_string_test.go: replaces EVERY occurrence
    val rows = Seq(
      ("this is the old test value", "this is the new test value"),
      ("this is the old test value (replace old)", "this is the new test value (replace new)"),
      ("this is the a test value", "this is the a test value"))
    rows.foreach { case (in, want) =>
      assert(extOf(run(ev("{}", "test" -> in),
        """["replace_string", "$.test", "old", "new"]"""), "test") == want)
    }
    // replace_with_regrex_test.go
    assert(extOf(run(ev("{}", "test" -> "a-a"),
      """["replace_with_regex", "$.test", "a", "value"]"""), "test") == "value-value")
  }

  // ===== strings: positional splices (BYTE-indexed, Go semantics) ========

  test("replace_between_positions vectors (strings_functions.go:87-106)") {
    // replace_between_positions_test.go
    val c = ev("{}", "test" -> "Hello, World!")
    assert(extOf(run(c, """["replace_between_positions", "$.test", 7, 12, "Vanus"]"""), "test")
      == "Hello, Vanus!")
    // start > len, end > len, start >= end all error and leave the value
    Seq(
      ("""["replace_between_positions", "$.test", 100, 8, "Dan"]""",
        "Start position must be less than the length of the string"),
      ("""["replace_between_positions", "$.test", 8, 60, "free to use"]""",
        "End position must be less than the length of the string"),
      ("""["replace_between_positions", "$.test", 12, 5, "Python"]""",
        "Start position must be less than end position")).foreach { case (cmd, in) =>
      assert(run(ev("{}", "test" -> in), cmd).isLeft, cmd)
    }
    // multibyte: é and ö are 2 UTF-8 bytes, so [0:3)+"X"+[6:) cuts at
    // byte offsets (h=0 é=1,2 l=3 l=4 o=5 ' '=6 w=7 ö=8,9 r=10 l=11 d=12)
    assert(extOf(run(ev("{}", "test" -> "héllo wörld"),
      """["replace_between_positions", "$.test", 3, 6, "X"]"""), "test")
      == "héX wörld")
  }

  test("extract_between_positions vectors (extract_between_positions.go:59-71)") {
    def go(src: String, start: Int, end: Int): Either[String, Ctx] =
      run(ev(s"""{"appinfoA":${JStr(src).render}}"""),
        s"""["extract_between_positions", "$$.data.appinfoA", "$$.data.appinfoB", $start, $end]""")
    assert(at(go("hello world!", 2, 4), "appinfoB") == JStr("ell"))
    assert(at(go("hello world!", 1, 12), "appinfoB") == JStr("hello world!"))
    assert(at(go("hello world!", 1, 1), "appinfoB") == JStr("h"))
    assert(go("hello world!", 13, 13).isLeft) // start > len
    assert(go("hello world!", 0, 13).isLeft)  // start < 1
    // multibyte: positions are 1-based BYTES — [2,3] is exactly é's two bytes
    assert(at(go("héllo", 2, 3), "appinfoB") == JStr("é"))
    assert(at(go("héllo", 1, 3), "appinfoB") == JStr("hé"))
  }

  test("split_between_positions vectors (split_between_positions.go:63-89)") {
    def go(src: String, start: Int, end: Int, pre: String = "{}"): Either[String, Ctx] =
      run(ev(if (pre == "{}") s"""{"appinfoA":${JStr(src).render}}"""
        else s"""{"appinfoA":${JStr(src).render},"appinfoB":""}"""),
        s"""["split_between_positions", "$$.data.appinfoA", $start, $end, "$$.data.appinfoB"]""")
    assert(strArr(go("hello world!", 2, 4), "appinfoB") == Vector("he", "ll", "o world!"))
    assert(go("hello world!", 7, 6).isLeft) // start >= end
    assert(strArr(go("hello world!", 100, 200), "appinfoB") == Vector("hello world!", "", ""))
    assert(strArr(go("hello world!", 4, 200), "appinfoB") == Vector("hell", "o world!", ""))
    assert(go("hello world!", 2, 3, pre = "exists").isLeft) // target exists
    // multibyte: cuts at bytes 3 and 10 — both rune boundaries
    assert(strArr(go("héllo wörld", 3, 10), "appinfoB") == Vector("hé", "llo wö", "rld"))
  }

  test("split_from_start vectors (split_from_start_test.go)") {
    def go(src: String, pos: Int): Either[String, Ctx] =
      run(ev("{}", "test" -> src),
        s"""["split_from_start", "$$.test", $pos, "$$.data.target"]""")
    assert(strArr(go("Hello, World!", 5), "target") == Vector("Hello", ", World!"))
    assert(strArr(go("H", 1), "target") == Vector("H", ""))
    assert(strArr(go("", 1), "target") == Vector("", ""))
    assert(strArr(go("hello", 10), "target") == Vector("hello", ""))
    assert(go("whatever", 0).isLeft) // position must be > 0
    // multibyte: byte position 3 lands after é's second byte
    assert(strArr(go("héllo", 3), "target") == Vector("hé", "llo"))
  }

  test("split_with_intervals vectors (split_with_intervals.go:63-79)") {
    def go(src: String, start: Int, interval: Int, pre: Boolean = false): Either[String, Ctx] =
      run(ev(if (pre) s"""{"appinfoA":${JStr(src).render},"appinfoB":""}"""
        else s"""{"appinfoA":${JStr(src).render}}"""),
        s"""["split_with_intervals", "$$.data.appinfoA", $start, $interval, "$$.data.appinfoB"]""")
    assert(strArr(go("hello world!", 2, 2), "appinfoB")
      == Vector("he", "ll", "o ", "wo", "rl", "d!"))
    assert(strArr(go("hello world!", 100, 2), "appinfoB") == Vector("hello world!"))
    assert(strArr(go("hello world!", 1, 3), "appinfoB")
      == Vector("h", "ell", "o w", "orl", "d!"))
    assert(go("hello world!", 2, 2, pre = true).isLeft) // target exists
    // multibyte: head = byte [0:1), then 2-byte chunks: é | ll | o
    assert(strArr(go("héllo", 1, 2), "appinfoB") == Vector("h", "é", "ll", "o"))
  }

  test("split_with_delimiter vector") {
    val r = run(ev("{}", "test" -> "one,two,three"),
      """["split_with_delimiter", "$.test", ",", "$.data.target"]""")
    assert(strArr(r, "target") == Vector("one", "two", "three"))
  }

  // ===== strings: delimiters, join, checks ===============================

  test("extract_between_delimiters vectors") {
    // extract_between_delimiters_test.go
    val ok = run(ev("{}", "test" -> "Hi welcome to &&Vanus&"),
      """["extract_between_delimiters", "$.test", "$.data.target", "&&", "&"]""")
    assert(at(ok, "target") == JStr("Vanus"))
    // only ONE delimiter present: the end delimiter is not found after it
    assert(run(ev("{}", "test" -> "Hi welcome to &Vanus friend"),
      """["extract_between_delimiters", "$.test", "$.data.target", "&", "&"]""").isLeft)
  }

  test("replace_between_delimiters vectors") {
    // replace_between_delimiters_test.go — errors leave the value untouched
    def go(src: String, sd: String, ed: String, rep: String): Either[String, Ctx] =
      run(ev("{}", "test" -> src),
        s"""["replace_between_delimiters", "$$.test", ${JStr(sd).render}, ${JStr(ed).render}, ${JStr(rep).render}]""")
    assert(extOf(go("Hello, &&World&&!", "&&", "&&", "Vanus"), "test") == "Hello, Vanus!")
    assert(extOf(go("Vanus has ^^many^^ beginner friendly open issues!", "^^", "^^", "lots of"), "test")
      == "Vanus has lots of beginner friendly open issues!")
    assert(go("Contributing to Vanus Opensource project is %%an eye opener%%!", "**", "**", "fun").isLeft)
    assert(go("I !!like&& opensource contributions", "&&", "!!", "love").isLeft)
    assert(go("FOSS is !!powered** by open communities", "&&", "**", "supported").isLeft)
  }

  test("join vectors (join_test.go)") {
    val data = """{"array":[{"key1":"value1"},{"key1":"value11"},{"key1":"value111"}]}"""
    assert(extOf(run(ev(data), """["join", "$.test1", ",", "abc"]"""), "test1") == "abc")
    assert(extOf(run(ev(data), """["join", "$.test2", ",", "abc", "123"]"""), "test2") == "abc,123")
    assert(extOf(run(ev(data), """["join", "$.array1", ",", "$.data.array[:].key1"]"""), "array1")
      == "value1,value11,value111")
    assert(extOf(run(ev(data), """["join", "$.array2", ",", "$.data.array[:].key1", "abc"]"""), "array2")
      == "value1,value11,value111,abc")
  }

  test("check_custom_values vectors (check_custom_values_test.go)") {
    val data = """{"source":"value 2"}"""
    assert(at(run(ev(data),
      """["check_custom_values", "$.data.source", "value", "$.data.target", "true", "false"]"""),
      "target") == JStr("true"))
    // case-sensitive: "Value" is not contained
    assert(at(run(ev(data),
      """["check_custom_values", "$.data.source", "Value", "$.data.target", "true", "false"]"""),
      "target") == JStr("false"))
    // replacement values keep their type
    assert(at(run(ev(data),
      """["check_custom_values", "$.data.source", "value", "$.data.target", 1, 0]"""),
      "target") == JInt(1))
    // missing source: RunArgs errors
    assert(run(ev(data),
      """["check_custom_values", "$.data.source2", "value", "$.data.target", "true", "false"]""").isLeft)
  }

  test("extract_missing vectors (extract_missing_test.go)") {
    assert(at(run(ev("""{"source":"Vanus"}"""),
      """["extract_missing", "$.data.source", "$.data.target", "true", "false"]"""),
      "target") == JStr("false"))
    assert(at(run(ev("""{"source":"Vanus"}"""),
      """["extract_missing", "$.data.source", "$.data.target", 1, 0]"""),
      "target") == JInt(0))
    assert(at(run(ev("""{"source":""}"""),
      """["extract_missing", "$.data.source", "$.data.target", "true", "false"]"""),
      "target") == JStr("true"))
  }

  // ===== math ============================================================

  test("math vectors (math_*_test.go)") {
    def num(r: Either[String, Ctx], name: String): Double =
      r.toOption.get.event.get.lookupAttr(name).get.toDouble
    assert(num(run(ev("{}"), """["math_add", "$.test", "123", "456", "321"]"""), "test") == 900.0)
    assert(num(run(ev("{}"), """["math_sub", "$.test", "456", "123"]"""), "test") == 333.0)
    assert(num(run(ev("{}"), """["math_mul", "$.test", "111", "2", "3"]"""), "test") == 666.0)
    assert(num(run(ev("{}"), """["math_div", "$.test", "333", "3"]"""), "test") == 111.0)
    assert(run(ev("{}"), """["math_div", "$.test", "333", "0"]""").isLeft)
  }

  // ===== structs =========================================================

  test("structs vectors (create/replace/delete/rename/move/duplicate_test.go)") {
    // create: target exists → error; absent → set
    assert(run(ev("{}", "test" -> "abc"), """["create", "$.test", "newValue"]""").isLeft)
    assert(extOf(run(ev("{}"), """["create", "$.test", "testValue"]"""), "test") == "testValue")
    // replace: target absent → error; exists → replaced
    assert(run(ev("{}"), """["replace", "$.test", "newValue"]""").isLeft)
    assert(extOf(run(ev("{}", "test" -> "abc"), """["replace", "$.test", "testValue"]"""), "test")
      == "testValue")
    // delete: required spec attribute refuses; extension deletes
    assert(run(ev("{}"), """["delete", "$.id"]""").isLeft)
    val deleted = run(ev("{}", "test" -> "abc"), """["delete", "$.test"]""")
    assert(deleted.toOption.get.event.get.extensions.isEmpty)
    // rename: target exists → error; else value moves
    assert(run(ev("{}", "test" -> "abc", "test2" -> "abc2"),
      """["rename", "$.test", "$.test2"]""").isLeft)
    val renamed = run(ev("{}", "test" -> "abc"), """["rename", "$.test", "$.test2"]""")
    assert(renamed.toOption.get.event.get.extensions == Map("test2" -> "abc"))
    // move: data target exists → error; else ext removed + data set
    assert(run(ev("""{"abc":{"test":"value"}}""", "test" -> "abc"),
      """["move", "$.test", "$.data.abc.test"]""").isLeft)
    val moved = run(ev("{}", "test" -> "abc"), """["move", "$.test", "$.data.abc.test"]""")
    assert(moved.toOption.get.event.get.extensions.isEmpty)
    assert(at(moved, "abc.test") == JStr("abc"))
    // duplicate: same but the source stays
    assert(run(ev("""{"abc":{"test":"value"}}""", "test" -> "abc"),
      """["duplicate", "$.test", "$.data.abc.test"]""").isLeft)
    val dup = run(ev("{}", "test" -> "abc"), """["duplicate", "$.test", "$.data.abc.test"]""")
    assert(extOf(dup, "test") == "abc")
    assert(at(dup, "abc.test") == JStr("abc"))
  }

  // ===== JSON templates (template_test.go) ===============================

  private def render(template: String, dataJson: String,
      defines: (String, JValue)*): String = {
    val ctx = Ctx.of(EventValue.simple("id", "src", "t", dataJson))
      .copy(defines = scala.collection.immutable.VectorMap(defines: _*))
    val node = Template.parseJson(template)
      .getOrElse(fail(s"template parse failed: $template"))
    Template.renderJson(node, Template.resolver(ctx)).render
  }

  test("template holes route $.dataschema/$.datacontenttype as ATTRIBUTES, not data paths") {
    // the data branch requires the "$.data." separator — a bare
    // startsWith("$.data") misrouted these into data-path misses
    val ctx = Ctx.of(EventValue.simple("id", "src", "t", """{"x":1}""")
      .copy(dataschema = Some("http://schema.com/1")))
    val node = Template.parseJson(
      """{"s": "<$.dataschema>", "ct": "<$.datacontenttype>"}""")
      .getOrElse(fail("parse"))
    assert(Template.renderJson(node, Template.resolver(ctx)).render
      == """{"s":"http://schema.com/1","ct":"application/json"}""")
    // and an unknown data*-prefixed attribute is a MISS, never the body
    val node2 = Template.parseJson("""{"k": <$.datax>}""").getOrElse(fail("parse"))
    assert(Template.renderJson(node2, Template.resolver(ctx)).render == "{}")
  }

  test("json template: array-slice variable paths (lib/json/path slices)") {
    val data = """{"arr":[10,20,30,40,50]}"""
    // multi-result projection renders as an array
    assert(render("""{"k": <$.data.arr[1:3]>}""", data) == """{"k":[20,30]}""")
    assert(render("""{"k": <$.data.arr[::-1]>}""", data)
      == """{"k":[50,40,30,20,10]}""")
    // a one-element slice collapses to the value
    // (pkg/template/json/segment.go:108-111: len(results) == 1)
    assert(render("""{"k": <$.data.arr[1:2]>}""", data) == """{"k":20}""")
    // an empty slice is a miss: the member is omitted
    assert(render("""{"k": <$.data.arr[3:1]>}""", data) == """{}""")
  }

  test("json template: empty array and empty object survive verbatim") {
    assert(render("""[{"empty array":[],"empty object":{}}]""", "{}")
      == """[{"empty array":[],"empty object":{}}]""")
  }

  test("json template: variable holes (template_test.go:42-56)") {
    val t = """{"key":<var>,"key2":"<var2>"}"""
    // missing variable: unquoted renders null (member KEPT), quoted ""
    assert(render(t, "{}") == """{"key":null,"key2":""}""")
    assert(render(t, "{}", "var" -> JNull, "var2" -> JNull)
      == """{"key":null,"key2":"null"}""")
    assert(render(t, "{}", "var" -> JStr("var"), "var2" -> JStr("var2"))
      == """{"key":"var","key2":"var2"}""")
    assert(render(t, "{}", "var" -> JDouble(123.456), "var2" -> JDouble(321.654))
      == """{"key":123.456,"key2":"321.654"}""")
    assert(render(t, "{}", "var" -> JBool(true), "var2" -> JBool(true))
      == """{"key":true,"key2":"true"}""")
  }

  test("json template: model holes (template_test.go:58-71)") {
    val t = """{"key":<$.data.var>,"key2":"<$.data.var2>"}"""
    // missing model path: unquoted member is DROPPED, quoted renders ""
    assert(render(t, "{}") == """{"key2":""}""")
    assert(render(t, """{"var":"var","var2":"var2"}""")
      == """{"key":"var","key2":"var2"}""")
    assert(render(t, """{"var":123.456,"var2":321.654}""")
      == """{"key":123.456,"key2":"321.654"}""")
    assert(render(t, """{"var":true,"var2":true}""")
      == """{"key":true,"key2":"true"}""")
  }

  test("json template: object/array values and quoted re-marshalling") {
    val t = """{"key":<var>,"key2":"<var2>"}"""
    val obj = JValue.parse("""{"str":"a\r\nb"}""")
    val obj2 = JValue.parse("""{"str2":"b\r\na"}""")
    assert(render(t, "{}", "var" -> obj, "var2" -> obj2)
      == """{"key":{"str":"a\r\nb"},"key2":"{\"str2\":\"b\\r\\na\"}"}""")
    val arr = JValue.parse("""["str",true,"a\r\nb"]""")
    val arr2 = JValue.parse("""["str2",true,"b\r\na"]""")
    assert(render(t, "{}", "var" -> arr, "var2" -> arr2)
      == """{"key":["str",true,"a\r\nb"],"key2":"[\"str2\",true,\"b\\r\\na\"]"}""")
    // string containing template-special symbols passes through
    assert(render(t, "{}", "var" -> JStr("<a\r\nb>"), "var2" -> JStr("<b\r\na>"))
      == "{\"key\":\"<a\\r\\nb>\",\"key2\":\"<b\\r\\na>\"}")
  }

  test("json template: bracket data holes (template_test.go 'refer data of model')") {
    val t = """{"key":<$.data["var"]>,"key2":"<$.data['var2']>"}"""
    // missing: unquoted member DROPPED, quoted ""
    assert(render(t, "{}") == """{"key2":""}""")
    // nil is a VALUE, not a miss: member kept as null / "null"
    assert(render(t, """{"var":null,"var2":null}""")
      == """{"key":null,"key2":"null"}""")
    assert(render(t, """{"var":"var","var2":"var2"}""")
      == """{"key":"var","key2":"var2"}""")
    assert(render(t, """{"var":123.456,"var2":321.654}""")
      == """{"key":123.456,"key2":"321.654"}""")
    assert(render(t, """{"var":true,"var2":true}""")
      == """{"key":true,"key2":"true"}""")
  }

  test("json template: nil model value is kept, missing is omitted (template_test.go)") {
    val t = """{"key":<$.data.var>,"key2":"<$.data.var2>"}"""
    assert(render(t, """{"var":null,"var2":null}""")
      == """{"key":null,"key2":"null"}""")
    assert(render(t, "{}") == """{"key2":""}""")
  }

  test("json template: the parser_test.go master template parses and renders") {
    // pkg/template/json/parser_test.go's template, verbatim: dynamic
    // string with \</br> escape, \r and \u000A escapes, a quoted bracket
    // key containing \' " < and >, a bracket-rooted hole, literals of
    // every JSON kind, a negative fraction, and an empty object
    val template =
      "{\n" +
        "  \"foo\": \"str\",\n" +
        "  \"bar\": [\n" +
        "    <var>,\n" +
        // the reference's free-form model root maps to our CE `data` body,
        // so its `$.c[2]...` spells `$.data.c[2]...` here — the path's
        // quoted-key torture (\' " < > inside a hole) is unchanged
        "    \"<a0> baz <b1> \\</br>\\r\\" + "u000A<$.data.c[2].d['e-f g\\'\"<>'].h>\",\n" +
        "    \"<h>\",\n" +
        "    \"que\",\n" +
        "    true,\n" +
        "    false,\n" +
        "    null,\n" +
        "    {},\n" +
        "    []\n" +
        "  ],\n" +
        "  \"quux\": <$[\"i\"].j>,\n" +
        "  \"num\": -0.0123,\n" +
        "  \"empty\": {\n" +
        "  }\n" +
        "}"
    val data = """{"c":[0,0,{"d":{"e-f g'\"<>":{"h":"HH"}}}]}"""
    val rendered = render(template, data,
      "a0" -> JStr("A0"), "b1" -> JStr("B1"))
    val v = JValue.parse(rendered).asInstanceOf[JObj]
    assert(JPath.get(v, "foo").contains(JStr("str")))
    val bar = JPath.get(v, "bar").get.asInstanceOf[JArr].items
    assert(bar(0) == JNull) // missing VARIABLE hole renders null
    // the dynamic string: defines, the escaped </br>, CR, LF (\ u000A),
    // and the quoted-bracket-key data path all interpolate
    assert(bar(1) == JStr("A0 baz B1 </br>\r\nHH"))
    assert(bar(2) == JStr("")) // missing define in a string: ""
    assert(bar(3) == JStr("que"))
    assert(bar.slice(4, 9) == Vector(JBool(true), JBool(false), JNull,
      JObj.empty, JArr(Vector.empty)))
    // <$["i"].j> is a missing model hole: the member is omitted
    assert(JPath.get(v, "quux").isEmpty)
    assert(JPath.get(v, "num").contains(JDouble(-0.0123)))
    assert(JPath.get(v, "empty").contains(JObj.empty))
  }

  test("json template: bracket-rooted attribute hole <$['type']>") {
    // the dotted and bracket spellings of an attribute hole agree
    assert(render("""{"k":<$["type"]>}""", "{}") == """{"k":"t"}""")
    assert(render("""{"k":<$.type>}""", "{}") == """{"k":"t"}""")
    // and the 'data' root routes into the body
    assert(render("""{"k":<$["data"].x>}""", """{"x":7}""") == """{"k":7}""")
  }

  test("text template escapes (escape_test.go through text/parse.go's escapePlan)") {
    val none: Template.Resolver = _ => None
    def txt(t: String): String = Template.renderText(t, none)
    // self escapes: backslash and the angled brackets — an escaped '<'
    // must NOT open a hole ("self" vector + escapePlan 0x3c/0x3e/0x5c)
    assert(txt("a\\\\b") == "a\\b")
    assert(txt("\\<var>") == "<var>")
    assert(txt("a\\>b") == "a>b")
    // control escapes (the 0x60 escapePlan row: \b \f \n \r \t)
    assert(txt("a\\nb\\tc\\rd\\be\\ff") == "a\nb\tc\rd\be\ff")
    // "unicode character / basic multilingual plane": € = '€'
    assert(txt("x\\u20ACy") == "x€y")
    // "unicode character / supplementary plane": 𐐷 = U+10437
    assert(txt("\\uD801\\uDC37") == new String(Character.toChars(0x10437)))
    // "hexadecimal character": \x12
    assert(txt("a\\x12b") == "a\u0012b")
    // "octal character": \123 = 'S' (ExpectOctCharExt('1', "23"))
    assert(txt("a\\123b") == "aSb")
    // Go's byte arithmetic wraps mod 256: \777 is one 0xFF byte, never
    // a U+01FF code point
    assert(txt("a\\777b") == "a\u00ffb")
    // "invalid" vectors: ConsumeEscaped ERRORS — never a silent literal
    intercept[IllegalArgumentException](txt("a\\qb")) // not in the plan
    intercept[IllegalArgumentException](txt("bad\\")) // trailing backslash
    intercept[IllegalArgumentException](txt("\\u12")) // short unicode
    intercept[IllegalArgumentException](txt("\\x1")) // short hex
    intercept[IllegalArgumentException](txt("\\12")) // short octal
    intercept[IllegalArgumentException](txt("\\18")) // non-octal digit
    intercept[IllegalArgumentException](txt("\\uDC37")) // lone low surrogate
    intercept[IllegalArgumentException](txt("\\uD801x")) // unpaired high
    intercept[IllegalArgumentException](txt("\\uD801\\uD801")) // bad low half
    // missing variable renders as NOTHING (text/segment.go:25-72), and a
    // present define renders its text — escapes compose around holes
    val defs: Template.Resolver =
      n => if (n == "var") Some(JStr("V")) else None
    assert(Template.renderText("a <var>\\n<nope> b", defs) == "a V\n b")
    // and a broken escape is a CREATE-time error: parseSpec rejects the
    // subscription (the reference's text/parse.go error path), so the
    // template never reaches per-event rendering
    assert(Transformer.parseSpec(
      """{"template_type":"text","template":"C:\\qusers"}""").isLeft)
    assert(Transformer.parseSpec(
      """{"template_type":"text","template":"id=<$.id>"}""").isRight)
  }

  // ===== trigger/util attribute semantics ================================

  test("SetAttribute vectors (server/trigger/util/event_test.go:53-113)") {
    val base = EventValue.simple("i", "s", "t", "{}")
    // spec attributes accept strings
    assert(base.setAttr("id", JStr("idV")).toOption.get.id == "idV")
    assert(base.setAttr("source", JStr("sourceV")).toOption.get.source == "sourceV")
    assert(base.setAttr("type", JStr("typeV")).toOption.get.etype == "typeV")
    assert(base.setAttr("subject", JStr("subjectV")).toOption.get.subject
      == Some("subjectV"))
    assert(base.setAttr("dataschema", JStr("http://schema.com/1"))
      .toOption.get.dataschema == Some("http://schema.com/1"))
    // time: RFC3339Nano text parses
    assert(base.setAttr("time", JStr("2024-06-01T12:00:00.000000001Z")).isRight)
    assert(base.setAttr("time", JStr("not-a-time")).isLeft)
    // datacontenttype / specversion refuse modification
    assert(base.setAttr("datacontenttype", JStr("json")).isLeft)
    assert(base.setAttr("specversion", JStr("1.0")).isLeft)
    // extensions: "Vanus" lands lowercased as "vanus"; dotted names error
    val withExt = base.setAttr("Vanus", JStr("vanusV")).toOption.get
    assert(withExt.extensions.get("vanus") == Some("vanusV"))
    assert(base.setAttr("vanus.vanus", JStr("vanusV")).isLeft)
    // the same 1..20-char name rule Arg.validate enforces (pkg/event.go:21-32)
    assert(base.setAttr("a" * 21, JStr("v")).isLeft)
    assert(base.setAttr("a" * 20, JStr("v")).isRight)
    assert(base.setAttr("", JStr("v")).isLeft)
    // delete uses the RAW key (reference asymmetry: SetExtension
    // lowercases, DeleteAttribute deletes the literal key) — deleting
    // "Vanus" after setting "Vanus" is a no-op on both sides
    assert(withExt.deleteAttr("Vanus").toOption.get.extensions.contains("vanus"))
    assert(!withExt.deleteAttr("vanus").toOption.get.extensions.contains("vanus"))
  }

  test("DeleteAttribute vectors (server/trigger/util/event_test.go:118-145)") {
    val base = EventValue.simple("idV", "sourceV", "typeV", "{}",
      "vanus" -> "vanusV")
    // the four REQUIRED spec attributes refuse deletion
    Seq("id", "source", "type", "specversion")
      .foreach(a => assert(base.deleteAttr(a).isLeft, a))
    // existing extension deletes
    val d = base.deleteAttr("vanus").toOption.get
    assert(!d.extensions.contains("vanus"))
    // deleting a MISSING extension SUCCEEDS (event.go:147-156 deletes
    // from the map unconditionally)
    assert(base.deleteAttr("van").isRight)
    assert(base.deleteAttr("van").toOption.get.extensions.contains("vanus"))
    // the quirk, preserved: subject/time/dataschema/datacontenttype are
    // NOT spec-protected and NOT extensions — delete is a silent no-op
    val withSubject = base.setAttr("subject", JStr("sub")).toOption.get
    val after = withSubject.deleteAttr("subject").toOption.get
    assert(after.subject == Some("sub"),
      "reference DeleteAttribute never clears subject — parity quirk")
  }
}
