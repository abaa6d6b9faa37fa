package graft.transform

import graft.json._
import org.scalatest.funsuite.AnyFunSuite

/** Golden vectors from the reference's transformer tests
  * (server/trigger/transform/transformer_test.go:30-110, FIXTURES.md §3).
  */
class TransformerSpecTest extends AnyFunSuite {

  private val canonical = EventValue.simple(
    "testId", "testSource", "testType",
    """{"str":"strValue","number":123,"key":"value","key1":"value1"}""",
    "vanuskey" -> "vanusValue")

  test("text template golden (transformer_test.go:57-65)") {
    val spec = """{
      "define": {"dataKey": "$.data.key"},
      "pipeline": [],
      "template_type": "text",
      "template": "<dataKey> \"<$.data.key1>\" <$.data.noExist>"
    }"""
    val out = Transformer.transform(spec, canonical).toOption.get
    assert(out.body == "value \"value1\" ")
    assert(out.contentType == "text/plain")
  }

  test("JSON template golden: missing single-hole member omitted (transformer_test.go:88-110)") {
    val spec = """{
      "define": {"dataKey": "$.data.key"},
      "template_type": "json",
      "template": "{ \"define\": <dataKey>, \"data\": <$.data.key>, \"attribute\": <$.id>, \"noExist\": <$.data.noExist>, \"noExistStr\": \"<$.data.noExist>\" }"
    }"""
    val out = Transformer.transform(spec, canonical).toOption.get
    assert(out.body == """{"define":"value","data":"value","attribute":"testId","noExistStr":""}""")
    assert(out.contentType == "application/json")
  }

  test("define + pipeline + no template re-serializes mutated data") {
    val spec = """{
      "define": {"keyTest": "keyValue", "ctxId": "$.id"},
      "pipeline": [
        {"command": ["create", "$.data.added", "<keyTest>"]},
        {"command": ["math_add", "$.data.sum", "$.data.number", 1]},
        {"command": ["upper_case", "$.data.str"]}
      ]
    }"""
    val out = Transformer.transform(spec, canonical).toOption.get
    val data = JValue.parse(out.body).asInstanceOf[JObj]
    assert(data.get("added").contains(JStr("keyValue")))
    // in-memory the sum is JDouble(124.0); the body serializes Go-style as
    // bare 124, so the reparse sees an integer
    assert(data.get("sum").contains(JInt(124)))
    assert(data.get("str").contains(JStr("STRVALUE")))
    // integral double renders bare (Go json.Marshal form)
    assert(out.body.contains("\"sum\":124"))
  }

  test("per-action errors log and continue (pipeline.go:50-60)") {
    val spec = """{
      "pipeline": [
        {"command": ["create", "$.data.key", "clash"]},
        {"command": ["upper_case", "$.data.str"]}
      ]
    }"""
    val out = Transformer.transform(spec, canonical).toOption.get
    assert(out.warnings.size == 1)
    assert(out.warnings.head.contains("exists"))
    val data = JValue.parse(out.body).asInstanceOf[JObj]
    assert(data.get("key").contains(JStr("value"))) // unchanged
    assert(data.get("str").contains(JStr("STRVALUE"))) // later action still ran
  }

  test("define referencing missing path is a whole-transform error") {
    val spec = """{"define": {"bad": "$.data.missing"}, "pipeline": []}"""
    assert(Transformer.transform(spec, canonical).isLeft)
  }

  test("ValidateSubscription feishu vector (proxy_test.go:287-364)") {
    // the reference's dry-run test: a real alertmanager webhook event and a
    // pipeline that fans [:] projections into joined extension attributes
    val data = """{
      "body":{"alerts":[{"annotations":{"feishuUrls":[
        {"URL":"https://open.feishu.cn/open-apis/bot/v2/hook/xxxxx","signature":"yyyy"},
        {"URL":"https://open.feishu.cn/open-apis/bot/v2/hook/yyyyy","signature":""},
        {"URL":"https://open.feishu.cn/open-apis/bot/v2/hook/zzzzz","signature":"zzzz"}]},
        "labels":{"forward":"test-server","severity":"P1"},
        "startsAt":"2022-12-12T07:55:24.893471163Z","status":"resolved"}],
      "commonLabels":{"cluster":"test","forward":"test-server","groups":"test-bot","severity":"P1"}},
      "headers":{"Content-Type":"application/json","Host":"webhook-source.vanus:80"},
      "method":"POST","query_args":{"source":"prometheus","subject":"operator"}
    }"""
    val ev = EventValue.simple(
      "13b719a4-ada9-436a-9fb1-fc2bc82dc647", "prometheus",
      "naive-http-request", data)
    val spec = """{"pipeline":[
      {"command":["create","$.xvfeishuservice","bot"]},
      {"command":["create","$.xvfeishumsgtype","interactive"]},
      {"command":["join","$.xvfeishuboturls",",","$.data.body.alerts[0].annotations.feishuUrls[:].URL"]},
      {"command":["join","$.xvfeishubotsigns",",","$.data.body.alerts[0].annotations.feishuUrls[:].signature"]}]}"""
    val out = Transformer.transform(spec, ev).toOption.get
    val exts = out.event.extensions
    assert(exts("xvfeishuservice") == "bot")
    assert(exts("xvfeishumsgtype") == "interactive")
    assert(exts("xvfeishuboturls") ==
      "https://open.feishu.cn/open-apis/bot/v2/hook/xxxxx," +
      "https://open.feishu.cn/open-apis/bot/v2/hook/yyyyy," +
      "https://open.feishu.cn/open-apis/bot/v2/hook/zzzzz")
    assert(exts("xvfeishubotsigns") == "yyyy,,zzzz") // empty member preserved
  }

  test("a panicking action fails THAT transform as Left, never throws (transformer.go:67-74)") {
    // negative splice position: Go's slicing panics, the reference's
    // Execute recovers it into the transform's error — ours must too
    val spec = """{
      "pipeline": [
        {"command": ["split_between_positions", "$.data.str", -2, 3, "$.data.out"]}
      ]
    }"""
    val r = Transformer.transform(spec, canonical)
    assert(r.isLeft, s"expected Left, got $r")
    assert(r.swap.toOption.get.startsWith("transform panic:"))
  }
}
