package graft.transform

import graft.json._
import org.scalatest.funsuite.AnyFunSuite

/** Per-action vectors mirroring the reference's action tests
  * (pkg/transform/action/&lt;group&gt;/..._test.go).
  */
class ActionsSpec extends AnyFunSuite {

  private def ev(dataJson: String, ext: (String, String)*): Ctx =
    Ctx.of(EventValue.simple("testId", "testSource", "testType", dataJson, ext: _*))

  private def run(ctx: Ctx, cmd: String): Either[String, Ctx] =
    Actions.Command.parse(JValue.parse(cmd)).flatMap(_.execute(ctx))

  private def dataOf(r: Either[String, Ctx]): JObj =
    r.toOption.get.data.asInstanceOf[JObj]

  private def at(r: Either[String, Ctx], path: String): JValue =
    JPath.get(r.toOption.get.data, path).getOrElse(JNull)

  // ==== structs ====
  test("create: sets new path, errors if exists") {
    val c = ev("""{"a":1}""")
    assert(at(run(c, """["create", "$.data.b.c", "v"]"""), "b.c") == JStr("v"))
    assert(run(c, """["create", "$.data.a", 2]""").isLeft)
  }
  test("delete / replace / move / rename / duplicate") {
    val c = ev("""{"a":1,"b":"x"}""")
    assert(dataOf(run(c, """["delete", "$.data.a"]""")).get("a").isEmpty)
    assert(run(c, """["delete", "$.data.zz"]""").isLeft)
    assert(at(run(c, """["replace", "$.data.a", 9]"""), "a") == JInt(9))
    assert(run(c, """["replace", "$.data.zz", 9]""").isLeft)
    val moved = run(c, """["move", "$.data.a", "$.data.c"]""")
    assert(at(moved, "c") == JInt(1) && dataOf(moved).get("a").isEmpty)
    assert(run(c, """["move", "$.data.a", "$.data.b"]""").isLeft) // target exists
    val dup = run(c, """["duplicate", "$.data.a", "$.data.c"]""")
    assert(at(dup, "c") == JInt(1) && at(dup, "a") == JInt(1))
  }

  // ==== math (operands cast to Float; results doubles) ====
  test("math: add variadic, sub, mul, div with zero guard") {
    val c = ev("""{"n":"10","m":4}""")
    assert(at(run(c, """["math_add", "$.data.r", "$.data.n", "$.data.m", 1]"""), "r") == JDouble(15.0))
    assert(at(run(c, """["math_sub", "$.data.r", "$.data.n", 1.5]"""), "r") == JDouble(8.5))
    assert(at(run(c, """["math_mul", "$.data.r", "$.data.n", "$.data.m"]"""), "r") == JDouble(40.0))
    assert(at(run(c, """["math_div", "$.data.r", "$.data.n", 4]"""), "r") == JDouble(2.5))
    assert(run(c, """["math_div", "$.data.r", "$.data.n", 0]""").isLeft)
    assert(run(c, """["math_add", "$.data.r", "$.data.nope", 1]""").isLeft) // missing arg aborts
  }

  // ==== datetime (PHP-style formats per util/time.go:22-31) ====
  test("date_format / unix_time_format / convert_timezone") {
    val c = ev("""{"t":"2022-11-15T16:26:23.488Z","sec":1668529583,"lt":"2022-11-15 16:26:23"}""")
    assert(at(run(c, """["date_format", "$.data.t", "Y-m-d"]"""), "t") == JStr("2022-11-15"))
    assert(at(run(c, """["date_format", "$.data.t", "Y-m-d H:i:s", "Asia/Shanghai"]"""), "t")
      == JStr("2022-11-16 00:26:23"))
    assert(at(run(c, """["unix_time_format", "$.data.sec", "Y-m-d"]"""), "sec") == JStr("2022-11-15"))
    assert(at(run(c, """["convert_timezone", "$.data.lt", "UTC", "+08:00"]"""), "lt")
      == JStr("2022-11-16 00:26:23"))
  }

  test("unix_time_format reference vectors (unixtime_format_test.go:26-55)") {
    val c = ev("""{"time":1668498285}""")
    assert(at(run(c, """["unix_time_format", "$.data.time", "Y-m-d H:i:s"]"""), "time")
      == JStr("2022-11-15 07:44:45"))
    val c2 = ev("""{"time":1668498285}""")
    // EST resolves via SHORT_IDS (Go LoadLocation accepts it)
    assert(at(run(c2, """["unix_time_format", "$.data.time", "Y-m-d H:i:s", "EST"]"""), "time")
      == JStr("2022-11-15 02:44:45"))
    // escaped literal and 12-hour token
    val c3 = ev("""{"time":1668498285}""")
    assert(at(run(c3, """["unix_time_format", "$.data.time", "Y-m-dTh:i"]"""), "time")
      == JStr("2022-11-15T07:44"))
  }

  test("convert_timezone reference vectors (convert_timezone_test.go:28-55)") {
    val c = ev("""{"time":"2021-08-29 12:01:10"}""")
    assert(at(run(c, """["convert_timezone", "$.data.time", "CET", "UTC"]"""), "time")
      == JStr("2021-08-29 10:01:10"))
    val c2 = ev("""{"time":"2021-08-29 12:01:10"}""")
    assert(at(run(c2, """["convert_timezone", "$.data.time", "CET", "Asia/Kolkata"]"""), "time")
      == JStr("2021-08-29 15:31:10"))
  }

  // ==== strings ====
  test("join / case / prefix / suffix") {
    val c = ev("""{"arr":["a","b"],"s":"mid"}""")
    assert(at(run(c, """["join", "$.data.r", "-", "$.data.arr", "$.data.s"]"""), "r") == JStr("a-b-mid"))
    assert(at(run(c, """["upper_case", "$.data.s"]"""), "s") == JStr("MID"))
    assert(at(run(ev("""{"s":"MID"}"""), """["lower_case", "$.data.s"]"""), "s") == JStr("mid"))
    assert(at(run(c, """["add_prefix", "$.data.s", "pre-"]"""), "s") == JStr("pre-mid"))
    assert(at(run(c, """["add_suffix", "$.data.s", "-post"]"""), "s") == JStr("mid-post"))
  }

  test("replace family") {
    val c = ev("""{"s":"hello world hello"}""")
    assert(at(run(c, """["replace_string", "$.data.s", "hello", "hi"]"""), "s") == JStr("hi world hi"))
    assert(at(run(c, """["replace_with_regex", "$.data.s", "l+", "L"]"""), "s") == JStr("heLo worLd heLo"))
    assert(at(run(c, """["replace_between_positions", "$.data.s", 0, 5, "howdy"]"""), "s")
      == JStr("howdy world hello"))
    assert(run(c, """["replace_between_positions", "$.data.s", 5, 5, "x"]""").isLeft)
    assert(at(run(c, """["replace_between_delimiters", "$.data.s", "hello", "hello", "XX"]"""), "s")
      == JStr("XX"))
  }

  test("capitalize") {
    assert(at(run(ev("""{"s":"abc def"}"""), """["capitalize_sentence", "$.data.s"]"""), "s") == JStr("Abc def"))
    assert(at(run(ev("""{"s":"abc  def\tg"}"""), """["capitalize_word", "$.data.s"]"""), "s") == JStr("Abc  Def\tG"))
  }

  test("splits") {
    val c = ev("""{"s":"a,b,,c"}""")
    assert(at(run(c, """["split_with_delimiter", "$.data.s", ",", "$.data.r"]"""), "r")
      == JArr(Vector(JStr("a"), JStr("b"), JStr(""), JStr("c")))) // Go keeps empties
    assert(at(run(ev("""{"s":"abcdef"}"""), """["split_from_start", "$.data.s", 2, "$.data.r"]"""), "r")
      == JArr(Vector(JStr("ab"), JStr("cdef"))))
    assert(at(run(ev("""{"s":"abcdef"}"""), """["split_from_start", "$.data.s", 99, "$.data.r"]"""), "r")
      == JArr(Vector(JStr("abcdef"), JStr(""))))
    assert(run(ev("""{"s":"abc"}"""), """["split_from_start", "$.data.s", 0, "$.data.r"]""").isLeft)
    assert(at(run(ev("""{"s":"abcdef"}"""), """["split_between_positions", "$.data.s", 2, 4, "$.data.r"]"""), "r")
      == JArr(Vector(JStr("ab"), JStr("cd"), JStr("ef"))))
    assert(at(run(ev("""{"s":"abcdefg"}"""), """["split_with_intervals", "$.data.s", 1, 2, "$.data.r"]"""), "r")
      == JArr(Vector(JStr("a"), JStr("bc"), JStr("de"), JStr("fg"))))
    // error if target exists
    assert(run(ev("""{"s":"ab","r":1}"""), """["split_between_positions", "$.data.s", 1, 2, "$.data.r"]""").isLeft)
  }

  test("extracts") {
    val c = ev("""{"s":"k=[val] rest"}""")
    assert(at(run(c, """["extract_between_delimiters", "$.data.s", "$.data.r", "[", "]"]"""), "r")
      == JStr("val"))
    assert(run(c, """["extract_between_delimiters", "$.data.s", "$.data.r", "{", "}"]""").isLeft)
    assert(at(run(ev("""{"s":"abcdef"}"""), """["extract_between_positions", "$.data.s", "$.data.r", 2, 4]"""), "r")
      == JStr("bcd")) // 1-based inclusive
    assert(run(ev("""{"s":"abc"}"""), """["extract_between_positions", "$.data.s", "$.data.r", 2, 9]""").isLeft)
  }

  test("check_custom_values / extract_missing / condition_if / length") {
    val c = ev("""{"s":"has spark inside","e":"","n":60}""")
    assert(at(run(c, """["check_custom_values", "$.data.s", "spark", "$.data.r", "yes", "no"]"""), "r")
      == JStr("yes"))
    assert(at(run(c, """["extract_missing", "$.data.e", "$.data.r", "EMPTY", "FULL"]"""), "r")
      == JStr("EMPTY"))
    assert(at(run(c, """["condition_if", "$.data.r", "$.data.n", ">=", 50, "hi", "lo"]"""), "r")
      == JStr("hi"))
    assert(at(run(c, """["condition_if", "$.data.r", "$.data.s", "==", "has spark inside", 1, 0]"""), "r")
      == JInt(1))
    assert(at(run(c, """["length", "$.data.r", "$.data.s"]"""), "r") == JInt(16))
  }

  // ==== arrays ====
  test("array_foreach: nested action per element with relative paths") {
    val c = ev("""{"arr":[{"name":"ab"},{"name":"cd"}]}""")
    val r = run(c, """["array_foreach", "$.data.arr", ["upper_case", "@.name"]]""")
    assert(at(r, "arr[0].name") == JStr("AB"))
    assert(at(r, "arr[1].name") == JStr("CD"))
  }

  test("render_array: per-index template zip; length mismatch errors") {
    val c = ev("""{"users":[{"name":"a","age":1},{"name":"b","age":2}]}""")
    val r = run(c, """["render_array", "$.data.out", "$.data.users", "u=<@.name>:<@.age>"]""")
    assert(at(r, "out") == JArr(Vector(JStr("u=a:1"), JStr("u=b:2"))))
    val bad = ev("""{"users":[{"name":"a"},{"name":"b","age":2}]}""")
    assert(run(bad, """["render_array", "$.data.out", "$.data.users", "<@.name>:<@.age>"]""").isLeft)
  }

  test("unfold_array: sibling keys prefix-i") {
    val c = ev("""{"arr":[10,20]}""")
    val r = run(c, """["unfold_array", "$.data.arr", "$.data.pre"]""")
    assert(at(r, "pre-0") == JInt(10))
    assert(at(r, "pre-1") == JInt(20))
  }

  // ==== debezium ====
  test("debezium_convert_to_mongodb_sink: c/u/d shapes (FIXTURES §6)") {
    def dz(op: String) = Ctx.of(EventValue.simple("id", "src", "t",
      """{"pk":1,"v":"x"}""", "iodebeziumop" -> op))
    assert(run(dz("c"), """["debezium_convert_to_mongodb_sink", "pk"]""").toOption.get.data.render
      == """{"inserts":[{"pk":1,"v":"x"}]}""")
    assert(run(dz("u"), """["debezium_convert_to_mongodb_sink", "pk"]""").toOption.get.data.render
      == """{"updates":[{"filter":{"pk":1},"update":{"$set":{"v":"x"}}}]}""")
    assert(run(dz("d"), """["debezium_convert_to_mongodb_sink", "pk"]""").toOption.get.data.render
      == """{"deletes":[{"filter":{"pk":1}}]}""")
    assert(run(dz("x"), """["debezium_convert_to_mongodb_sink", "pk"]""").isLeft)
  }

  // ==== attribute args ====
  test("attribute read/write/delete rules (event.go:85-156)") {
    val c = ev("""{"a":1}""", "ext1" -> "v1")
    assert(at(run(c, """["create", "$.data.id", "$.id"]"""), "id") == JStr("testId"))
    assert(at(run(c, """["create", "$.data.e", "$.ext1"]"""), "e") == JStr("v1"))
    val setExt = run(c, """["create", "$.newext", 42]""")
    assert(setExt.toOption.get.event.get.extensions("newext") == "42")
    assert(run(c, """["replace", "$.specversion", "2.0"]""").isLeft) // immutable
    assert(run(c, """["delete", "$.id"]""").isLeft) // required
  }
}
