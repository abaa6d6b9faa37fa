package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column (whole-stage-codegen) forms of the scalar pipeline actions
  * (SURVEY §2.5, §2.8). The interpreter in graft.transform is the fidelity
  * path for full pipelines; these are the Spark-first forms used when a
  * pipeline is scalar-only — they stay inside codegen and push down, which
  * is what you want on the 100 TB path.
  *
  * Casts use try_* so a malformed row degrades to NULL (the reference's
  * per-event action error) instead of failing the job under ANSI mode.
  */
object ActionFunctions {

  private def f(c: Column): Column = c.try_cast("double")

  // == math (math_functions.go:23-68) ==
  def mathAdd(cols: Column*): Column = cols.map(f).reduce(try_add)
  def mathSub(a: Column, b: Column): Column = try_subtract(f(a), f(b))
  def mathMul(cols: Column*): Column = cols.map(f).reduce(try_multiply)
  /** division by zero is an action error ⇒ NULL here */
  def mathDiv(a: Column, b: Column): Column =
    when(f(b) === 0d, lit(null)).otherwise(try_divide(f(a), f(b)))

  // == strings (strings_functions.go) ==
  def joinArrays(sep: String, arrs: Column*): Column =
    concat_ws(sep, arrs.map(a => array_join(a, sep)): _*)
  def upperCase(c: Column): Column = upper(c)
  def lowerCase(c: Column): Column = lower(c)
  def addPrefix(c: Column, prefix: Column): Column = concat(prefix, c)
  def addSuffix(c: Column, suffix: Column): Column = concat(c, suffix)
  def replaceString(c: Column, sub: String, rep: String): Column =
    replace(c, lit(sub), lit(rep))
  def replaceWithRegex(c: Column, pattern: String, rep: String): Column =
    regexp_replace(c, pattern, rep)

  /** splice [start,end) with rep; positions 0-based; guards mirrored from
    * strings_functions.go:87-106 (out-of-bounds ⇒ action error ⇒ NULL).
    *
    * Positional note (applies to every positional op below): the COLUMN
    * forms index CHARACTERS (Spark `substring`), while the transformer
    * interpreter ([[graft.transform.Actions]]) indexes UTF-8 BYTES — Go's
    * string-slicing semantics, which the reference conformance vectors
    * pin. The two agree on single-byte (ASCII/Latin-1-subset) text, which
    * both corpora are; divergence on multibyte text is documented in the
    * README.
    */
  def replaceBetweenPositions(c: Column, start: Int, end: Int, rep: String): Column =
    when(length(c) > math.max(start, end) && lit(start) < end,
      concat(substring(c, 1, start), lit(rep), substring(c, lit(end + 1), length(c))))

  /** uppercase first char only (strings_functions.go:108-121) */
  def capitalizeSentence(c: Column): Column =
    concat(upper(substring(c, 1, 1)), substring(c, 2, Int.MaxValue))

  /** Title-case each word. Column form splits on single spaces — the
    * interpreter handles full unicode whitespace (strings_functions.go:148-167);
    * divergence documented per SURVEY §7.8.
    */
  def capitalizeWord(c: Column): Column =
    array_join(transform(split(c, " ", -1),
      w => concat(upper(substring(w, 1, 1)), substring(w, 2, Int.MaxValue))), " ")

  /** literal (non-regex) split, Go strings.Split semantics: keep empties */
  def splitWithDelimiter(c: Column, sep: String): Column =
    split(c, java.util.regex.Pattern.quote(sep), -1)

  /** [s[:pos], s[pos:]]; pos<=0 ⇒ NULL (action error) */
  def splitFromStart(c: Column, pos: Int): Column =
    if (pos <= 0) lit(null)
    else array(substring(c, 1, pos), substring(c, lit(pos + 1), length(c)))

  def splitBetweenPositions(c: Column, start: Int, end: Int): Column =
    array(substring(c, 1, start),
      substring(c, start + 1, math.max(end - start, 0)),
      substring(c, lit(end + 1), length(c)))

  /** strictly between the first `sd` and the next `ed` after it; either
    * missing ⇒ NULL. Formulated via a rest-substring so DuckDB's
    * start-position-less strpos can mirror it exactly.
    */
  def extractBetweenDelimiters(c: Column, sd: String, ed: String): Column = {
    val si = locate(sd, c) // 1-based; 0 = missing
    val rest = c.substr(si + lit(sd.length), length(c))
    val ei = locate(ed, rest)
    when(si > 0 && ei > 0, rest.substr(lit(1), ei - 1))
  }

  /** 1-based inclusive [start, end] (extract_between_positions.go:49-71) */
  def extractBetweenPositions(c: Column, start: Int, end: Int): Column =
    when(length(c) >= end && lit(start) >= 1 && lit(start) <= end,
      substring(c, start, end - start + 1))

  def checkCustomValues(c: Column, needle: String, tVal: Column, fVal: Column): Column =
    when(contains(c, lit(needle)), tVal).otherwise(fVal)

  /** tVal when the source is an EMPTY STRING, fVal otherwise */
  def extractMissing(c: Column, tVal: Column, fVal: Column): Column =
    when(c === "", tVal).otherwise(fVal)

  /** `==` compares strings; ordered ops compare floats (condition_if_action.go:56-82) */
  def conditionIf(left: Column, op: String, right: Column, tVal: Column, fVal: Column): Column = {
    val cond = op match {
      case "==" => left.cast("string") === right.cast("string")
      case ">=" => f(left) >= f(right)
      case ">" => f(left) > f(right)
      case "<=" => f(left) <= f(right)
      case "<" => f(left) < f(right)
      case other => throw new IllegalArgumentException(s"not support op [$other]")
    }
    when(cond, tVal).otherwise(fVal)
  }

  /** len of string or array (common_function.go:23-39) */
  def lengthOf(c: Column): Column = length(c)
  def sizeOf(c: Column): Column = size(c)

  // == datetime (datatime_functions.go) ==
  // formats are the reference's PHP-style tokens (Y-m-d H:i:s), converted
  // once at plan build — same dialect as the interpreter actions
  private def jfmt(fmt: String): String = graft.transform.DateFormats.phpToJava(fmt)
  def dateFormat(ts: Column, fmt: String): Column = date_format(ts, jfmt(fmt))
  def dateFormatTz(ts: Column, fmt: String, tz: String): Column =
    date_format(from_utc_timestamp(ts, tz), jfmt(fmt))
  def unixTimeFormat(sec: Column, fmt: String): Column =
    date_format(timestamp_seconds(sec.try_cast("bigint")), jfmt(fmt))
  def convertTimezone(ts: Column, fromTz: String, toTz: String): Column =
    date_format(from_utc_timestamp(to_utc_timestamp(ts, fromTz), toTz), jfmt("Y-m-d H:i:s"))

  // == arrays ==
  /** ARRAY_FOREACH with a scalar fn = higher-order transform (foreach.go) */
  def arrayForeach(arr: Column, fn: Column => Column): Column = transform(arr, fn)

  /** RENDER_ARRAY: per-element template rendering (render.go:36-113) */
  def renderArray(arr: Column, render: Column => Column): Column = transform(arr, render)
}
