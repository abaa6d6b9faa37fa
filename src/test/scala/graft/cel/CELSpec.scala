package graft.cel

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Vectors from pkg/cel tests and filter_bench_test.go:48-54 usage. */
class CELSpec extends SparkSpec {

  lazy val ev: DataFrame = {
    import spark.implicits._
    Seq((1L, """{"key":"value","num":10,"pi":3.5,"flag":true,"nested":{"path":2.5},"numstr":"7"}"""))
      .toDF("sequence_number", "data")
  }

  private def passes(expr: String): Boolean =
    ev.filter(CEL.compile(expr)).count() == 1

  test("typed variables") {
    assert(passes("$key.(string) == 'value'"))
    assert(passes("$num.(int64) > 5"))
    assert(passes("$num.(uint64) == 10u"))
    assert(passes("$pi.(double) == 3.5"))
    assert(passes("$flag.(bool)"))
    assert(passes("$nested.path.(double) > 2"))
  }

  test("lenient coercions (cel.go:198-275)") {
    assert(passes("$pi.(int64) == 3"))    // float -> int64 truncates
    assert(passes("$numstr.(int64) == 7")) // numeric string parses
  }

  test("operators") {
    assert(passes("$num.(int64) + 5 == 15"))
    assert(passes("$num.(int64) * 2 - 5 == 15"))
    assert(passes("$num.(int64) % 3 == 1"))
    assert(passes("!($num.(int64) < 5)"))
    assert(passes("$num.(int64) > 5 && $key.(string) != 'x'"))
    assert(passes("$num.(int64) < 5 || $flag.(bool)"))
    assert(passes("($num.(int64) > 5 ? 'big' : 'small') == 'big'"))
  }

  test("eval error or missing path fails the filter (cel_filter.go:42-46)") {
    assert(!passes("$missing.(int64) > 0"))
    assert(!passes("$key.(int64) == 1")) // non-numeric string -> null
  }
}
