package graft.cesql

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Conformance vectors re-derived from the PUBLIC CloudEvents SQL v1 spec
  * (cloudevents/spec: cesql.md) and the shape of the sdk-go TCK suites the
  * reference trusts via its cloudevents/sdk-go/sql/v2 dependency
  * (/root/reference/go.mod:9). Grouped by the TCK's categories: literals,
  * binary comparison / logical / math operators, case sensitivity, casting
  * functions, integer + string builtins, LIKE (with escaped wildcards),
  * EXISTS, IN, sub-expressions, and error semantics.
  *
  * Each vector is a boolean CESQL expression evaluated as a filter against
  * a fixed event; `passes` means the expression evaluates TRUE.
  */
class CESQLVectorsSpec extends SparkSpec {

  // TCK-style fixture event: lowercase context attributes, one extension
  lazy val ev: DataFrame = {
    import spark.implicits._
    Seq((1L, "myId", "mySource", "1.0", "myType",
      Map("sequence" -> "42", "myext" -> "customValue"),
      """{"k":1}"""))
      .toDF("sequence_number", "id", "source", "specversion", "type", "attributes", "data")
      .withColumn("subject", lit("mySubject"))
      .withColumn("time", lit("2024-06-01 12:00:00").cast("timestamp"))
      .withColumn("dataschema", lit(null).cast("string"))
      .withColumn("datacontenttype", lit("application/json"))
  }

  private def passes(expr: String): Boolean =
    ev.filter(CESQL.compile(expr)).count() == 1

  private def vectors(cases: (String, Boolean)*): Unit =
    cases.foreach { case (expr, expected) =>
      assert(passes(expr) == expected, s"vector failed: <$expr> expected $expected")
    }

  test("literals") {
    vectors(
      "TRUE" -> true,
      "FALSE" -> false,
      "tRuE" -> true, // keywords are case-insensitive
      "5 = 5" -> true,
      "-5 = -5" -> true,
      "'abc' = 'abc'" -> true,
      "\"abc\" = 'abc'" -> true, // single- and double-quoted strings are equal
      "'it\\'s' = \"it's\"" -> true, // quote escapes inside literals
      "\"dquoted \\\"x\\\"\" = 'dquoted \"x\"'" -> true)
  }

  test("binary comparison operators") {
    vectors(
      "1 = 1" -> true, "1 != 2" -> true, "1 <> 2" -> true,
      "1 != 1" -> false,
      "2 < 3" -> true, "3 < 2" -> false,
      "2 <= 2" -> true, "3 <= 2" -> false,
      "3 > 2" -> true, "2 > 3" -> false,
      "2 >= 2" -> true, "2 >= 3" -> false,
      "TRUE = TRUE" -> true, "TRUE != FALSE" -> true,
      "'a' != 'b'" -> true)
  }

  test("binary logical operators") {
    vectors(
      "TRUE AND TRUE" -> true, "TRUE AND FALSE" -> false,
      "FALSE AND FALSE" -> false,
      "TRUE OR FALSE" -> true, "FALSE OR FALSE" -> false,
      "TRUE XOR FALSE" -> true, "TRUE XOR TRUE" -> false,
      "FALSE XOR FALSE" -> false)
  }

  test("binary math operators (integer-only arithmetic)") {
    vectors(
      "2 + 3 = 5" -> true,
      "7 - 2 = 5" -> true,
      "4 * 3 = 12" -> true,
      "10 / 3 = 3" -> true, // integer division truncates
      "-10 / 3 = -3" -> true, // ...toward zero
      "10 % 3 = 1" -> true,
      "2 + 3 * 4 = 14" -> true, // * binds tighter than +
      "(2 + 3) * 4 = 20" -> true)
  }

  test("unary operators") {
    vectors(
      "NOT TRUE" -> false,
      "NOT FALSE" -> true,
      "NOT NOT TRUE" -> true,
      "-5 + 10 = 5" -> true,
      "-(2 + 3) = -5" -> true)
  }

  test("case sensitivity: keywords and functions no, values yes") {
    vectors(
      "not false" -> true,
      "true and not (false or false)" -> true,
      "length('ab') = 2" -> true, // function names case-insensitive
      "LeNgTh('ab') = 2" -> true,
      "'abc' = 'ABC'" -> false, // string values case-sensitive
      "exists myext" -> true)
  }

  test("casting functions") {
    vectors(
      "INT('42') = 42" -> true,
      "INT(sequence) + 1 = 43" -> true,
      "STRING(42) = '42'" -> true,
      "STRING(TRUE) = 'true'" -> true,
      "BOOL('true')" -> true,
      "BOOL('TRUE')" -> true, // boolean text parse is case-insensitive
      "BOOL('false')" -> false,
      "IS_INT('42')" -> true,
      "IS_INT('notanint')" -> false,
      "IS_INT(sequence)" -> true,
      "IS_BOOL('true')" -> true,
      "IS_BOOL('nope')" -> false)
  }

  test("integer built-in functions") {
    vectors(
      "ABS(-5) = 5" -> true,
      "ABS(5) = 5" -> true,
      "ABS(0) = 0" -> true,
      "LENGTH('') = 0" -> true,
      "LENGTH('abcde') = 5" -> true,
      "LENGTH(id) = 4" -> true)
  }

  test("string built-in functions") {
    vectors(
      "CONCAT('a', 'b', 'c') = 'abc'" -> true,
      "CONCAT('a') = 'a'" -> true,
      "CONCAT_WS(',', 'a', 'b', 'c') = 'a,b,c'" -> true,
      "LOWER('ABC') = 'abc'" -> true,
      "UPPER('abc') = 'ABC'" -> true,
      "TRIM('  x  ') = 'x'" -> true,
      "LEFT('abcde', 3) = 'abc'" -> true,
      "LEFT('ab', 5) = 'ab'" -> true, // n past the end: whole string
      "RIGHT('abcde', 3) = 'cde'" -> true,
      "RIGHT('ab', 5) = 'ab'" -> true,
      "SUBSTRING('abcdef', 2) = 'bcdef'" -> true, // 1-based, to end
      "SUBSTRING('abcdef', 2, 3) = 'bcd'" -> true)
  }

  test("LIKE expression, including escaped wildcards") {
    vectors(
      "'abc' LIKE 'abc'" -> true,
      "'abc' LIKE 'a%'" -> true,
      "'abc' LIKE '%c'" -> true,
      "'abc' LIKE 'a_c'" -> true,
      "'abc' LIKE 'a_d'" -> false,
      "'abc' NOT LIKE 'x%'" -> true,
      "id LIKE 'my%'" -> true,
      // escaped wildcards match literally
      "'100%' LIKE '100\\%'" -> true,
      "'100x' LIKE '100\\%'" -> false,
      "'a_c' LIKE 'a\\_c'" -> true,
      "'abc' LIKE 'a\\_c'" -> false)
  }

  test("EXISTS expression") {
    vectors(
      "EXISTS id" -> true,
      "EXISTS myext" -> true,
      "EXISTS definitelymissing" -> false,
      "NOT EXISTS definitelymissing" -> true)
  }

  test("IN expression") {
    vectors(
      "id IN ('myId', 'other')" -> true,
      "id IN ('a', 'b')" -> false,
      "id NOT IN ('a', 'b')" -> true,
      "3 IN (1, 2, 3)" -> true,
      "4 NOT IN (1, 2, 3)" -> true,
      "sequence IN (41, 42, 43)" -> true) // attribute coerces per item type
  }

  test("sub-expressions and attribute access") {
    vectors(
      "(TRUE)" -> true,
      "((1 + 1) = 2) AND (type = 'myType')" -> true,
      "source = 'mySource' AND subject = 'mySubject'" -> true,
      "myext = 'customValue'" -> true, // extension attribute
      "specversion = '1.0'" -> true)
  }

  test("subscriptions-API recreations (spec examples shape)") {
    vectors(
      // exact + prefix + suffix filter recreations from the spec's
      // subscription-filter mapping examples
      "type = 'myType' AND source = 'mySource'" -> true,
      "id LIKE 'my%' AND subject LIKE '%Subject'" -> true,
      "NOT (type = 'other.type')" -> true,
      "(type = 'a' OR type = 'myType') AND EXISTS myext" -> true)
  }

  test("error semantics: eval errors fail the filter (zero-value continuation)") {
    // the reference's cesql filter maps evaluation errors to fail
    // (cesql_filter.go:54-69); here errors are SQL NULLs collapsed to
    // false at the top, and a definite TRUE branch still short-circuits —
    // the spec's error-with-zero-value continuation model
    vectors(
      "1 / 0 = 0" -> false,
      "1 % 0 = 1" -> false,
      "INT('notanint') = 0" -> false,
      "missingattr = 'x'" -> false,
      "NOT (missingattr = 'x')" -> false, // error poisons NOT too
      "1 / 0 = 0 OR TRUE" -> true,
      "TRUE OR 1 / 0 = 0" -> true,
      "FALSE AND 1 / 0 = 0" -> false)
  }
}
