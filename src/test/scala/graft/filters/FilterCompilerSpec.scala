package graft.filters

import graft.SparkSpec
import graft.model.FilterSpec
import graft.model.FilterSpec._
import org.apache.spark.sql.DataFrame

/** Test vectors ported from the reference's filter suites
  * (server/trigger/filter/exact_filter_test.go:26-50 and siblings), run
  * against the canonical event of FIXTURES.md §1.
  */
class FilterCompilerSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  lazy val canonical: DataFrame = {
    import spark.implicits._
    Seq((1L, "testID", "testSource", "1.0", "testType",
      Map("vanuskey" -> "vanusValue"),
      """{"str":"strValue","number":123,"key":"value","key1":"value1"}"""))
      .toDF("sequence_number", "id", "source", "specversion", "type", "attributes", "data")
      .withColumn("subject", lit(null).cast("string"))
      .withColumn("time", lit("2024-06-01 12:00:00").cast("timestamp"))
      .withColumn("dataschema", lit(null).cast("string"))
      .withColumn("datacontenttype", lit("application/json"))
  }

  private def passes(spec: FilterSpec): Boolean =
    canonical.filter(FilterCompiler.compile(spec)).count() == 1

  // ==== verbatim vectors from cel_filter_test.go / cesql_filter_test.go ====
  // event: id=testID, source=testSource, data {"key":"value","num":10}
  lazy val goEvent: DataFrame = {
    import spark.implicits._
    Seq((1L, "testID", "testSource", """{"key":"value","num":10}"""))
      .toDF("sequence_number", "id", "source", "data")
      .withColumn("type", lit(null).cast("string"))
      .withColumn("attributes", typedLit(Map.empty[String, String]))
  }
  private def goPasses(spec: FilterSpec): Boolean =
    goEvent.filter(FilterCompiler.compile(spec)).count() == 1

  test("cel filter pass/fail/nil (cel_filter_test.go:26-49)") {
    // NewCELFilter("") == nil and NewCELFilter("$key") (untyped var ==
    // parse error) == nil: the nil filter is dropped, i.e. passes
    assert(FilterCompiler.compileOpt(Cel("")).isEmpty)
    assert(FilterCompiler.compileOpt(Cel("$key")).isEmpty)
    assert(goPasses(Cel("")))
    assert(goPasses(Cel("$key")))
    assert(goPasses(Cel("$key.(string) == 'value' && $num.(uint64) == 10u")))
    assert(!goPasses(Cel("$key.(string) == 'value' && $num.(int64) < 10")))
  }

  test("cesql filter pass/fail/nil (cesql_filter_test.go:27-50)") {
    // NewCESQLFilter("") == nil and NewCESQLFilter("Type ==") (parse
    // error) == nil: dropped, passes
    assert(FilterCompiler.compileOpt(CeSql("")).isEmpty)
    assert(FilterCompiler.compileOpt(CeSql("Type ==")).isEmpty)
    assert(goPasses(CeSql("")))
    assert(goPasses(CeSql("Type ==")))
    assert(goPasses(CeSql("source = 'testSource'")))
    assert(!goPasses(CeSql("source = 'test'")))
  }

  test("nil-filter propagation through not/all/any (trigger_filter.go:25-66)") {
    // NewNotFilter(nil) == nil: not(unparseable) is dropped, not inverted
    assert(FilterCompiler.compileOpt(Not(Cel("$key"))).isEmpty)
    assert(goPasses(Not(Cel("$key"))))
    // an Any whose children ALL dropped collapses to nil (passes) — it
    // must NOT evaluate to constant-false
    assert(FilterCompiler.compileOpt(Any(Seq(Cel("$key"), CeSql("Type ==")))).isEmpty)
    assert(goPasses(Any(Seq(Cel("$key"), CeSql("Type ==")))))
    // a dropped child contributes nothing to a surviving any/all
    assert(goPasses(Any(Seq(Cel("$key"), Exact(Seq("id" -> "testID"))))))
    assert(!goPasses(Any(Seq(Cel("$key"), Exact(Seq("id" -> "other"))))))
    assert(goPasses(All(Seq(CeSql("Type =="), Exact(Seq("id" -> "testID"))))))
    // GetFilter over a list drops nils before AND-ing (trigger_filter.go:68-77)
    assert(goEvent.filter(FilterCompiler.compileList(
      Seq(Cel("$key"), Exact(Seq("source" -> "testSource"))))).count() == 1)
  }

  test("GetFilter over a growing filter list (trigger_filter_test.go:27-107)") {
    // the Go test appends filters one by one and re-runs GetFilter; the
    // same event (id=testID, source=testSource, data {key,num}) must pass
    // at every stage
    def passesList(json: String): Boolean =
      goEvent.filter(FilterCompiler.fromJson(json)).count() == 1
    // "no filter": empty list → nil → pass
    assert(passesList("[]"))
    // "one filter no filed": an empty filter object is nil → ignored
    assert(FilterCompiler.compileOpt(FilterSpec.fromJson(
      graft.json.JValue.parse("{}"))).isEmpty)
    assert(passesList("""[{}]"""))
    // "one filter": exact id
    assert(passesList("""[{}, {"exact":{"id":"testID"}}]"""))
    // "multi filter": the full Go list — exact, suffix, prefix, cel,
    // cesql, not(exact un), any(exact), all(exact) — AND-ed, all pass
    assert(passesList("""[
      {},
      {"exact":{"id":"testID"}},
      {"suffix":{"id":"ID"}},
      {"prefix":{"id":"test"}},
      {"cel":"$num.(int64) == 10"},
      {"sql":"source = 'testSource'"},
      {"not":{"exact":{"id":"un"}}},
      {"any":[{"exact":{"id":"testID"}}]},
      {"all":[{"exact":{"id":"testID"}}]}
    ]"""))
    // and a single failing member fails the whole list
    assert(!passesList("""[
      {"exact":{"id":"testID"}},
      {"sql":"source = 'other'"}
    ]"""))
  }

  test("cel parse vectors (pkg/cel cel_test.go:26-68)") {
    import org.apache.spark.sql.functions.lit
    // event data: {key:"test", double:3.14, int64:3, uint64:3}
    val ev = {
      import spark.implicits._
      Seq((1L, """{"key":"test","double":3.14,"int64":3,"uint64":3}"""))
        .toDF("sequence_number", "data")
        .withColumn("id", lit("x")).withColumn("source", lit("x"))
        .withColumn("type", lit(null).cast("string"))
        .withColumn("attributes", typedLit(Map.empty[String, String]))
    }
    def ok(e: String): Boolean = ev.filter(graft.cel.CEL.compile(e)).count() == 1
    assert(ok("$key.(string) == 'test'"))
    assert(ok("$double.(double) >= 3.1"))
    assert(ok("$int64.(int64) >= 3"))
    assert(ok("$uint64.(uint64) >= 3u"))
  }

  test("exact on context attribute") {
    assert(passes(Exact(Seq("source" -> "testSource"))))
    assert(!passes(Exact(Seq("source" -> "wrong"))))
  }

  test("exact on extension attribute") {
    assert(passes(Exact(Seq("vanuskey" -> "vanusValue"))))
    assert(!passes(Exact(Seq("vanuskey" -> "other"))))
  }

  test("exact on data path; numbers compare as strings") {
    assert(passes(Exact(Seq("data.str" -> "strValue"))))
    assert(passes(Exact(Seq("data.number" -> "123"))))
    assert(!passes(Exact(Seq("data.number" -> "124"))))
  }

  test("missing attribute or path fails, never errors") {
    assert(!passes(Exact(Seq("missing" -> "x"))))
    assert(!passes(Exact(Seq("data.missing" -> "x"))))
    // not(missing) passes: child failed => negation holds (not_filter.go:34-42)
    assert(passes(Not(Exact(Seq("missing" -> "x")))))
  }

  test("prefix / suffix") {
    assert(passes(Prefix(Seq("source" -> "test"))))
    assert(passes(Suffix(Seq("source" -> "Source"))))
    assert(!passes(Prefix(Seq("source" -> "Source"))))
    assert(!passes(Suffix(Seq("source" -> "test"))))
    // raw-data-bytes addressing (common.go:84-86)
    assert(passes(Prefix(Seq("data" -> "{\"str\""))))
  }

  test("all / any / no") {
    assert(passes(All(Seq(Exact(Seq("id" -> "testID")), Prefix(Seq("type" -> "test"))))))
    assert(!passes(All(Seq(Exact(Seq("id" -> "testID")), Prefix(Seq("type" -> "x"))))))
    assert(passes(Any(Seq(Exact(Seq("id" -> "no")), Prefix(Seq("type" -> "test"))))))
    assert(!passes(Any(Seq(Exact(Seq("id" -> "no")), Prefix(Seq("type" -> "x"))))))
    assert(passes(NoFilter))
  }

  test("filter list is AND-ed; empty list passes") {
    val both = Seq(Exact(Seq("id" -> "testID")), Suffix(Seq("type" -> "Type")))
    assert(canonical.filter(FilterCompiler.compileList(both)).count() == 1)
    assert(canonical.filter(FilterCompiler.compileList(Seq.empty)).count() == 1)
  }

  test("spec JSON codec honors dialect precedence") {
    val spec = FilterSpec.listFromJson(
      """[{"exact": {"type": "testType"}},
          {"any": [{"prefix": {"source": "test"}}, {"suffix": {"subject": ".png"}}]},
          {"not": {"exact": {"id": "nope"}}}]""")
    assert(canonical.filter(FilterCompiler.compileList(spec)).count() == 1)
    val sql = FilterSpec.listFromJson("""[{"sql": "source = 'testSource'"}]""")
    assert(sql == Seq(CeSql("source = 'testSource'")))
  }

  test("empty key or value is invalid at create time (common.go:42-48)") {
    intercept[IllegalArgumentException] {
      FilterSpec.listFromJson("""[{"exact": {"": "v"}}]""")
    }
    intercept[IllegalArgumentException] {
      FilterSpec.listFromJson("""[{"exact": {"k": ""}}]""")
    }
  }
}
