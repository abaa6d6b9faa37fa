package graft.transform

import graft.json._
import org.scalatest.funsuite.AnyFunSuite

/** Vectors from /root/reference/pkg/transform/arg/arg_test.go. */
class ArgSpec extends AnyFunSuite {

  private val ev = EventValue.simple(
    "idValue", "sourceValue", "t",
    """{"key1":"strData","key2":456.123}""")
  private def ctx = Ctx.of(ev).copy(defines =
    scala.collection.immutable.VectorMap(
      "var1" -> JStr("str"), "var2" -> JDouble(123.456), "var3" -> JBool(true)))

  test("arg classification (arg_test.go:26-75)") {
    assert(Arg.parse(JStr("$.data.key")).isInstanceOf[Arg.DataPath])
    assert(Arg.parse(JStr("$.data")).isInstanceOf[Arg.DataAll])
    assert(Arg.parse(JStr("$.source")).isInstanceOf[Arg.AttrArg])
    assert(Arg.parse(JStr("$.dataxx")).isInstanceOf[Arg.AttrArg]) // not $.data!
    assert(Arg.parse(JStr("<var>")).isInstanceOf[Arg.DefineArg])
    assert(Arg.parse(JStr("data.key")).isInstanceOf[Arg.Const])
    assert(Arg.parse(JInt(3)).isInstanceOf[Arg.Const])
    assert(Arg.parse(JBool(true)).isInstanceOf[Arg.Const])
  }

  test("invalid attribute names fail at create time (arg_test.go:47-49, pkg/event.go:21-32)") {
    assert(Arg.validate(Arg.parse(JStr("$.source_"))).isLeft)
    assert(Arg.validate(Arg.parse(JStr("$." + "a" * 21))).isLeft) // >20 chars
    assert(Arg.validate(Arg.parse(JStr("$.Source"))).isRight) // lowered first
    // spec-level: bad attr name rejects the whole transformer
    assert(Transformer.parseSpec(
      """{"pipeline":[{"command":["create","$.bad_name","v"]}]}""").isLeft)
    assert(Transformer.parseSpec(
      """{"define":{"v":"$.bad_name"},"pipeline":[]}""").isLeft)
  }

  test("arg evaluation (arg_test.go:77-160)") {
    def eval(raw: String): Either[String, JValue] = Arg.parse(JStr(raw)).evaluate(ctx)
    assert(eval("$.data.key1") == Right(JStr("strData")))
    assert(eval("$.data.key2") == Right(JDouble(456.123)))
    assert(eval("$.source") == Right(JStr("sourceValue")))
    assert(eval("$.abc").isLeft) // missing attribute
    assert(eval("<var1>") == Right(JStr("str")))
    assert(eval("<var2>") == Right(JDouble(123.456)))
    assert(eval("<var100>").isLeft) // missing define
    assert(eval("data.key") == Right(JStr("data.key"))) // constant
  }
}
