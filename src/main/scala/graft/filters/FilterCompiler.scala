package graft.filters

import graft.model.FilterSpec
import graft.model.FilterSpec._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Compile a subscription filter tree into a single Catalyst [[Column]].
  *
  * This is the Spark-first replacement for the reference's per-event
  * interpreted filters (/root/reference/server/trigger/filter/): the whole
  * tree becomes one boolean expression that Catalyst constant-folds,
  * CNF-converts and pushes into the parquet scan — at 100 TB the exact/prefix
  * predicates prune row groups before any row is materialized, which the
  * reference's row-at-a-time design cannot do.
  *
  * Semantics preserved from the reference:
  *  - attribute addressing (filter/common.go:38-67): key `"data"` compares
  *    the raw JSON body bytes; `data.x.y` compares the JSONPath `$.x.y` of
  *    the parsed body (stringified); anything else is a context/extension
  *    attribute;
  *  - a missing attribute or path fails the filter — false, never null/error
  *    (common.go:72-74, 97-100) — hence the `coalesce(pred, false)` wrapper;
  *  - non-string values compare in string space (common.go:113-135):
  *    `get_json_object` already yields the JSON scalar text form.
  */
object FilterCompiler {

  private val contextAttrs =
    Set("id", "source", "specversion", "type", "subject", "time", "dataschema", "datacontenttype")

  /** Column holding the reference's stringified view of one attribute key. */
  def attr(key: String): Column = key match {
    case "data" => col("data")
    case k if k.startsWith("data.") =>
      // memoized one-parse-per-row path read (see JsonDocMemo) — a filter
      // list addressing several data.* keys parses the body once
      graft.functions.JsonPathText(col("data"), k.stripPrefix("data."))
    case "time" =>
      // CE attribute formatting is RFC3339 UTC (types.Format via
      // filter/common.go:128-135). Sub-second parts are dropped; divergence
      // from RFC3339Nano on fractional timestamps is documented in SURVEY §7.8.
      date_format(col("time"), "yyyy-MM-dd'T'HH:mm:ss'Z'")
    case k if contextAttrs(k) => col(k)
    case k => col("attributes").getItem(k)
  }

  // missing => false is expressed as `isNotNull && pred` rather than
  // `coalesce(pred, false)`: identical semantics (pred is only null when the
  // attribute is), but the conjuncts stay pushdown-eligible — with coalesce
  // the parquet scan showed the predicate under DataFilters only; with this
  // form `event_type = 'x'` lands in PushedFilters and prunes row groups.
  private def pairPred(pairs: Seq[(String, String)], f: (Column, String) => Column): Column =
    pairs.map { case (k, v) => val c = attr(k); c.isNotNull && f(c, v) }
      .reduceOption(_ && _).getOrElse(lit(true))

  /** Reference nil-filter propagation (trigger_filter.go:25-66): an empty
    * or unparseable cel/cesql expression yields a NIL filter which is
    * dropped from its enclosing list ("get filter is nil will ignore the
    * filter"), `NewNotFilter(nil)` is nil (not_filter.go:27-29), and an
    * all/any whose children all dropped is itself nil
    * (all_filter.go:23-27). None here IS that nil: dropping from an AND is
    * not `lit(true)` and dropping from an OR is not `lit(false)` when the
    * whole combinator collapses — Any(all-unparseable) must pass events,
    * not reject them.
    */
  def compileOpt(spec: FilterSpec): Option[Column] = spec match {
    case NoFilter => None
    case Exact(ps) => if (ps.isEmpty) None else Some(pairPred(ps, (c, v) => c === lit(v)))
    case Prefix(ps) => if (ps.isEmpty) None else Some(pairPred(ps, (c, v) => c.startsWith(v)))
    case Suffix(ps) => if (ps.isEmpty) None else Some(pairPred(ps, (c, v) => c.endsWith(v)))
    case Not(child) => compileOpt(child).map(!_)
    case All(cs) => cs.flatMap(compileOpt).reduceOption(_ && _)
    case Any(cs) => cs.flatMap(compileOpt).reduceOption(_ || _)
    case CeSql(e) => parseOrDrop("cesql", e)(graft.cesql.CESQL.compile)
    case Cel(e) => parseOrDrop("cel", e)(graft.cel.CEL.compile)
  }

  // parse errors are a once-per-subscription driver-side event, logged the
  // way cel_filter.go:34-37 / cesql_filter.go:47-51 log and drop them
  private def parseOrDrop(kind: String, e: String)(c: String => Column): Option[Column] =
    if (e.isEmpty) None
    else try Some(c(e)) catch { case ex: Exception =>
      System.err.println(s"[graft] parse $kind filter expression error, " +
        s"ignoring the filter: ${ex.getMessage}")
      None
    }

  /** One spec compiled standalone; a nil (dropped) filter passes everything
    * (`Run(nil, …)`, trigger_filter.go:79-82).
    */
  def compile(spec: FilterSpec): Column = compileOpt(spec).getOrElse(lit(true))

  /** A subscription's filter list is implicitly AND-ed after dropping nil
    * filters (trigger_filter.go:68-77).
    */
  def compileList(specs: Seq[FilterSpec]): Column =
    specs.flatMap(compileOpt).reduceOption(_ && _).getOrElse(lit(true))

  /** Parse a JSON filter list and compile it in one step. */
  def fromJson(json: String): Column = compileList(FilterSpec.listFromJson(json))
}
