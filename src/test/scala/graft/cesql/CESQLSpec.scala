package graft.cesql

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class CESQLSpec extends SparkSpec {

  lazy val ev: DataFrame = {
    import spark.implicits._
    Seq((1L, "testID", "testSource", "1.0", "testType",
      Map("vanuskey" -> "vanusValue", "num" -> "42"),
      """{"key":"value"}"""))
      .toDF("sequence_number", "id", "source", "specversion", "type", "attributes", "data")
      .withColumn("subject", lit("sub.png"))
      .withColumn("time", lit("2024-06-01 12:00:00").cast("timestamp"))
      .withColumn("dataschema", lit(null).cast("string"))
      .withColumn("datacontenttype", lit("application/json"))
  }

  private def passes(expr: String): Boolean =
    ev.filter(CESQL.compile(expr)).count() == 1

  test("comparisons and logical operators") {
    assert(passes("source = 'testSource'"))
    assert(passes("source != 'x' AND type = 'testType'"))
    assert(passes("source = 'x' OR type = 'testType'"))
    assert(passes("NOT (source = 'x')"))
    assert(passes("(source = 'testSource') XOR (type = 'nope')"))
    assert(!passes("(source = 'testSource') XOR (type = 'testType')"))
  }

  test("numeric context: attribute text coerces to integer") {
    assert(passes("num = 42"))
    assert(passes("num > 40 AND num <= 42"))
    assert(passes("num + 8 = 50"))
    assert(passes("num % 5 = 2"))
    assert(passes("-num = -42"))
    assert(passes("num / 4 = 10")) // integer division
  }

  test("LIKE / NOT LIKE with % and _") {
    assert(passes("source LIKE 'test%'"))
    assert(passes("subject LIKE '%.png'"))
    assert(passes("source LIKE 'test_ource'"))
    assert(passes("source NOT LIKE 'x%'"))
  }

  test("EXISTS and IN") {
    assert(passes("EXISTS vanuskey"))
    assert(passes("NOT EXISTS missingattr"))
    assert(passes("type IN ('a', 'testType', 'b')"))
    assert(passes("type NOT IN ('a', 'b')"))
  }

  test("functions") {
    assert(passes("LENGTH(source) = 10"))
    assert(passes("UPPER(type) = 'TESTTYPE'"))
    assert(passes("LOWER(type) = 'testtype'"))
    assert(passes("CONCAT(source, '!') = 'testSource!'"))
    assert(passes("CONCAT_WS('-', 'a', 'b') = 'a-b'"))
    assert(passes("TRIM('  x ') = 'x'"))
    assert(passes("LEFT(source, 4) = 'test'"))
    assert(passes("RIGHT(source, 6) = 'Source'"))
    assert(passes("SUBSTRING(source, 5, 6) = 'Source'"))
    assert(passes("ABS(0 - 5) = 5"))
    assert(passes("INT('7') + 1 = 8"))
    assert(passes("BOOL('TRUE')"))
    assert(passes("IS_INT(num) AND IS_BOOL('false') AND NOT IS_INT(source)"))
    assert(passes("STRING(42) = '42'"))
  }

  test("eval error fails the filter (cesql_filter.go:54-69)") {
    assert(!passes("INT(source) > 0"))   // unparseable int -> null -> false
    assert(!passes("missingattr = 'x'")) // missing attribute -> false
  }
}
