package graft

import graft.functions.ActionFunctions._
import graft.model.EventView
import graft.transform.TransformRunner
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Catalog entries for the transform layer — one per pipeline action of
  * SURVEY §2.5 plus end-to-end interpreter pipelines (§2.4) and templates
  * (§2.6).
  *
  * Scalar actions run through [[graft.functions.ActionFunctions]] (pure
  * Column forms: codegen'd, pushdown-friendly — the 100 TB path); ordered
  * stateful pipelines (struct mutations, debezium, templates) run through
  * the [[graft.transform.TransformRunner]] interpreter, which is the
  * fidelity path. Both are exercised against DuckDB oracles.
  */
object TransformQueries {
  import Queries.Q

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
  private def events(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)

  /** EventView over the events table, fanned out to core parallelism for
    * the per-row INTERPRETER pipelines ([[TransformRunner]]): the
    * interpreter otherwise runs at the scan's file-split count (ONE task
    * at the bench SFs), and the trailing orderBy re-executes it a second
    * time for range-partition sampling — two serial single-task passes
    * (StageProbe, optimization r21: template_none = two ~0.9 s one-task
    * stages and nothing else). [[graft.Tables.fanOut]] is a no-op once
    * the input has ≥ cores splits, so a 100 TB events table pays no extra
    * shuffle. TransformRunner itself deliberately stays at the caller's
    * partitioning — micro-batches arrive pre-split (see its scale note).
    */
  private def eventView(s: SparkSession, d: String): DataFrame =
    Tables.fanOut(EventView.fromEventsTable(events(s, d)))

  /** JSON body field k as string / long / double */
  private def kStr: Column = get_json_object(col("props"), "$.k")
  private def kLong: Column = kStr.try_cast("bigint")
  private def kDouble: Column = kStr.try_cast("double")

  // ===========================================================================
  // interpreter pipelines (define → pipeline → template)
  // ===========================================================================

  /** All six struct actions in one ordered pipeline over the event body.
    * Field order in the output body follows insertion order, which the
    * oracle reproduces literally.
    */
  private val structPipeline = Q(
    "action_structs_pipeline",
    (s, d) => {
      val spec = """{
        "pipeline": [
          {"command": ["create", "$.data.added", "x"]},
          {"command": ["replace", "$.data.added", "y"]},
          {"command": ["duplicate", "$.data.added", "$.data.added2"]},
          {"command": ["rename", "$.data.added2", "$.data.addedR"]},
          {"command": ["math_add", "$.data.sum", "$.data.k", 1]},
          {"command": ["move", "$.data.k", "$.data.kk"]},
          {"command": ["delete", "$.data.added"]}
        ]
      }"""
      TransformRunner(eventView(s, d), spec)
        .select(col("sequence_number").as("event_id"), col("body"))
        .orderBy(col("event_id"))
    },
    Some("""
      SELECT event_id,
             '{"addedR":"y","sum":' || (CAST(json_extract_string(props, '$.k') AS BIGINT) + 1)
               || ',"kk":' || json_extract_string(props, '$.k') || '}' AS body
      FROM events ORDER BY event_id
    """))

  /** JSON template: type-preserving holes, string interpolation, omitted
    * missing member (template/json semantics, transformer_test.go:88-110).
    */
  private val templateJson = Q(
    "template_json",
    (s, d) => {
      val spec = """{
        "define": {"kVal": "$.data.k"},
        "template_type": "json",
        "template": "{ \"eid\": <$.id>, \"etype\": \"<$.type>\", \"k\": <kVal>, \"missing\": <$.data.nope>, \"note\": \"k=<$.data.k>\" }"
      }"""
      TransformRunner(eventView(s, d), spec)
        .select(col("sequence_number").as("event_id"), col("body"))
        .orderBy(col("event_id"))
    },
    Some("""
      SELECT event_id,
             '{"eid":"' || CAST(event_id AS VARCHAR) || '","etype":"' || event_type
               || '","k":' || json_extract_string(props, '$.k')
               || ',"note":"k=' || json_extract_string(props, '$.k') || '"}' AS body
      FROM events ORDER BY event_id
    """))

  /** text template: literal + define + model holes; missing renders nothing */
  private val templateText = Q(
    "template_text",
    (s, d) => {
      val spec = """{
        "template_type": "text",
        "template": "id=<$.id> k=<$.data.k> none=<$.data.nope>"
      }"""
      TransformRunner(eventView(s, d), spec)
        .select(col("sequence_number").as("event_id"), col("body"))
        .orderBy(col("event_id"))
    },
    Some("""
      SELECT event_id,
             'id=' || CAST(event_id AS VARCHAR) || ' k=' || json_extract_string(props, '$.k')
               || ' none=' AS body
      FROM events ORDER BY event_id
    """))

  /** Debezium CDC op → MongoDB bulk-write doc (source/convert_to_mongodb_sink.go).
    * The op comes from the `iodebeziumop` extension, synthesized from
    * event_type; the body is replaced wholesale.
    */
  private val debezium = Q(
    "action_debezium_mongodb_sink",
    (s, d) => {
      val view = eventView(s, d)
        .withColumn("attributes", map(lit("iodebeziumop"),
          when(col("type") === "purchase", "c")
            .when(col("type") === "signup", "r")
            .when(col("type") === "error", "d")
            .otherwise("u")))
      TransformRunner(view, """{"pipeline": [{"command": ["debezium_convert_to_mongodb_sink", "k"]}]}""")
        .select(col("sequence_number").as("event_id"), col("body"))
        .orderBy(col("event_id"))
    },
    Some("""
      SELECT event_id,
        CASE WHEN event_type IN ('purchase', 'signup')
               THEN '{"inserts":[{"k":' || json_extract_string(props, '$.k') || '}]}'
             WHEN event_type = 'error'
               THEN '{"deletes":[{"filter":{"k":' || json_extract_string(props, '$.k') || '}}]}'
             ELSE '{"updates":[{"filter":{"k":' || json_extract_string(props, '$.k')
                  || '},"update":{"$set":{}}}]}'
        END AS body
      FROM events ORDER BY event_id
    """))

  // ===========================================================================
  // math actions (Column forms)
  // ===========================================================================

  private val mathQ = Q(
    "action_math",
    (s, d) => events(s, d).select(
      col("event_id"),
      mathAdd(kDouble, col("value"), lit(1)).as("m_add"),
      mathSub(col("value"), kDouble).as("m_sub"),
      mathMul(kDouble, lit(2)).as("m_mul"),
      mathDiv(col("value"), lit(4)).as("m_div"),
      mathDiv(col("value"), kDouble).as("m_div_guard")).orderBy(col("event_id")),
    Some("""
      SELECT event_id,
             (CAST(json_extract_string(props, '$.k') AS DOUBLE) + value) + 1 AS m_add,
             value - CAST(json_extract_string(props, '$.k') AS DOUBLE) AS m_sub,
             CAST(json_extract_string(props, '$.k') AS DOUBLE) * 2 AS m_mul,
             value / 4 AS m_div,
             CASE WHEN CAST(json_extract_string(props, '$.k') AS DOUBLE) = 0 THEN NULL
                  ELSE value / CAST(json_extract_string(props, '$.k') AS DOUBLE) END AS m_div_guard
      FROM events ORDER BY event_id
    """))

  // ===========================================================================
  // datetime actions
  // ===========================================================================

  private val datetimeQ = Q(
    "action_datetime",
    (s, d) => events(s, d).select(
      col("event_id"),
      dateFormat(col("ts"), "Y-m-d H:i").as("dt_fmt"),
      unixTimeFormat(kLong, "Y-m-d H:i:s").as("dt_unix"),
      convertTimezone(col("ts"), "UTC", "Asia/Shanghai").as("dt_tz")).orderBy(col("event_id")),
    Some("""
      SELECT event_id,
             strftime(ts, '%Y-%m-%d %H:%M') AS dt_fmt,
             strftime(to_timestamp(CAST(json_extract_string(props, '$.k') AS BIGINT)),
                      '%Y-%m-%d %H:%M:%S') AS dt_unix,
             strftime(timezone('Asia/Shanghai', timezone('UTC', ts)),
                      '%Y-%m-%d %H:%M:%S') AS dt_tz
      FROM events ORDER BY event_id
    """))

  // ===========================================================================
  // string actions over documents
  // ===========================================================================

  private val caseQ = Q(
    "action_case",
    (s, d) => docs(s, d).select(
      col("doc_id"),
      upperCase(col("text")).as("s_upper"),
      lowerCase(upperCase(col("text"))).as("s_lower"),
      capitalizeSentence(col("text")).as("s_cap_sentence"),
      capitalizeWord(col("text")).as("s_cap_word")).orderBy(col("doc_id")),
    Some("""
      SELECT doc_id,
             UPPER(text) AS s_upper,
             LOWER(UPPER(text)) AS s_lower,
             UPPER(text[1]) || text[2:] AS s_cap_sentence,
             array_to_string(list_transform(string_split(text, ' '),
               w -> UPPER(w[1]) || w[2:]), ' ') AS s_cap_word
      FROM documents ORDER BY doc_id
    """))

  private val affixQ = Q(
    "action_affix",
    (s, d) => docs(s, d).select(
      col("doc_id"),
      addPrefix(col("text"), lit("doc: ")).as("s_prefixed"),
      addSuffix(col("text"), lit("!")).as("s_suffixed")).orderBy(col("doc_id")),
    Some("""
      SELECT doc_id, 'doc: ' || text AS s_prefixed, text || '!' AS s_suffixed
      FROM documents ORDER BY doc_id
    """))

  private val joinQ = Q(
    "action_join",
    (s, d) => docs(s, d).select(
      col("doc_id"),
      joinArrays("-", splitWithDelimiter(col("text"), " ")).as("s_joined")).orderBy(col("doc_id")),
    Some("""
      SELECT doc_id, REPLACE(text, ' ', '-') AS s_joined
      FROM documents ORDER BY doc_id
    """))

  private val replaceQ = Q(
    "action_replace",
    (s, d) => docs(s, d).select(
      col("doc_id"),
      replaceString(col("text"), "spark", "SPARK").as("s_replaced"),
      replaceWithRegex(col("text"), "[aeiou]", "_").as("s_regex")).orderBy(col("doc_id")),
    Some("""
      SELECT doc_id,
             REPLACE(text, 'spark', 'SPARK') AS s_replaced,
             regexp_replace(text, '[aeiou]', '_', 'g') AS s_regex
      FROM documents ORDER BY doc_id
    """))

  private val spliceQ = Q(
    "action_splice_positions",
    (s, d) => docs(s, d).filter(col("n_chars") > 20).select(
      col("doc_id"),
      replaceBetweenPositions(col("text"), 10, 15, "XXXXX").as("s_spliced"),
      extractBetweenPositions(col("text"), 2, 10).as("s_extracted")).orderBy(col("doc_id")),
    Some("""
      SELECT doc_id,
             substr(text, 1, 10) || 'XXXXX' || substr(text, 16) AS s_spliced,
             substr(text, 2, 9) AS s_extracted
      FROM documents WHERE n_chars > 20 ORDER BY doc_id
    """))

  /** Delimiter ops, formulated identically on both sides via a rest-substring
    * (DuckDB strpos has no start offset). Only rows where 'join' is followed
    * by 'merge' qualify.
    */
  private val delimsQ = Q(
    "action_delimiters",
    (s, d) => {
      val t = col("text")
      val si = locate("join", t) // 1-based; 0 = missing
      val rest = t.substr(si + lit(4), length(t))
      val ei = locate("merge", rest)
      docs(s, d).filter(si > 0 && ei > 0).select(
        col("doc_id"),
        rest.substr(lit(1), ei - 1).as("s_between"),
        concat(t.substr(lit(1), si - 1), lit("X"),
          rest.substr(ei + lit(5), length(rest))).as("s_repl_delims"))
        .orderBy(col("doc_id"))
    },
    Some("""
      SELECT doc_id,
             substr(rest, 1, strpos(rest, 'merge') - 1) AS s_between,
             substr(text, 1, si - 1) || 'X' || substr(rest, strpos(rest, 'merge') + 5) AS s_repl_delims
      FROM (
        SELECT doc_id, text,
               strpos(text, 'join') AS si,
               substr(text, strpos(text, 'join') + 4) AS rest
        FROM documents
      ) WHERE si > 0 AND strpos(rest, 'merge') > 0
      ORDER BY doc_id
    """))

  private val checkQ = Q(
    "action_check_extract_missing",
    (s, d) => docs(s, d).select(
      col("doc_id"),
      checkCustomValues(col("text"), "spark", lit("has"), lit("no")).as("s_check"),
      extractMissing(col("lang"), lit("EMPTY"), lit("FULL")).as("s_missing")).orderBy(col("doc_id")),
    Some("""
      SELECT doc_id,
             CASE WHEN text LIKE '%spark%' THEN 'has' ELSE 'no' END AS s_check,
             CASE WHEN lang = '' THEN 'EMPTY' ELSE 'FULL' END AS s_missing
      FROM documents ORDER BY doc_id
    """))

  private val conditionQ = Q(
    "action_condition_if",
    (s, d) => events(s, d).select(
      col("event_id"),
      conditionIf(col("value"), ">=", lit(100), lit("hi"), lit("lo")).as("c_ord"),
      conditionIf(col("event_type"), "==", lit("error"), lit(1), lit(0)).as("c_eq"))
      .orderBy(col("event_id")),
    Some("""
      SELECT event_id,
             CASE WHEN value >= 100 THEN 'hi' ELSE 'lo' END AS c_ord,
             CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS c_eq
      FROM events ORDER BY event_id
    """))

  private val lengthQ = Q(
    "action_length",
    (s, d) => docs(s, d).select(
      col("doc_id"),
      lengthOf(col("text")).cast("bigint").as("n_len"),
      sizeOf(splitWithDelimiter(col("text"), " ")).cast("bigint").as("n_words"))
      .orderBy(col("doc_id")),
    Some("""
      SELECT doc_id,
             LENGTH(text) AS n_len,
             len(string_split(text, ' ')) AS n_words
      FROM documents ORDER BY doc_id
    """))

  // ===========================================================================
  // split actions
  // ===========================================================================

  private val splitQ = Q(
    "action_split",
    (s, d) => {
      val parts = splitWithDelimiter(col("text"), " ")
      docs(s, d).select(
        col("doc_id"),
        sizeOf(parts).cast("bigint").as("n_parts"),
        element_at(parts, 1).as("s_first"),
        element_at(splitFromStart(col("text"), 5), 1).as("s_head"),
        element_at(splitFromStart(col("text"), 5), 2).as("s_tail"))
        .orderBy(col("doc_id"))
    },
    Some("""
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_parts,
             string_split(text, ' ')[1] AS s_first,
             substr(text, 1, 5) AS s_head,
             substr(text, 6) AS s_tail
      FROM documents ORDER BY doc_id
    """))

  private val splitPosQ = Q(
    "action_split_positions",
    (s, d) => {
      val p3 = splitBetweenPositions(col("text"), 3, 9)
      docs(s, d).filter(col("n_chars") > 12).select(
        col("doc_id"),
        element_at(p3, 1).as("p_a"),
        element_at(p3, 2).as("p_b"),
        element_at(p3, 3).as("p_c"),
        (lit(1) + ceil((length(col("text")) - 5).cast("double") / 7d).cast("bigint")).as("n_chunks"),
        substring(col("text"), 6, 7).as("s_chunk1")).orderBy(col("doc_id"))
    },
    Some("""
      SELECT doc_id,
             substr(text, 1, 3) AS p_a,
             substr(text, 4, 6) AS p_b,
             substr(text, 10) AS p_c,
             1 + CAST(ceil((LENGTH(text) - 5) / 7.0) AS BIGINT) AS n_chunks,
             substr(text, 6, 7) AS s_chunk1
      FROM documents WHERE n_chars > 12 ORDER BY doc_id
    """))

  // ===========================================================================
  // array actions (higher-order functions — foreach.go / render.go / unfold)
  // ===========================================================================

  private val foreachQ = Q(
    "action_array_foreach",
    // interpreted HOF (transform) over every word of every doc — the one
    // action query whose per-row cost warrants redistribution
    (s, d) => Tables.fanOut(docs(s, d)).select(
      col("doc_id"),
      array_join(arrayForeach(splitWithDelimiter(col("text"), " "), upper), " ").as("s_foreach"))
      .orderBy(col("doc_id")),
    Some("""
      SELECT doc_id, UPPER(text) AS s_foreach
      FROM documents ORDER BY doc_id
    """))

  private val renderQ = Q(
    "action_render_array",
    (s, d) => docs(s, d).select(
      col("doc_id"),
      array_join(renderArray(splitWithDelimiter(col("text"), " "),
        w => concat(lit("w="), w)), ",").as("s_rendered")).orderBy(col("doc_id")),
    Some("""
      SELECT doc_id, 'w=' || REPLACE(text, ' ', ',w=') AS s_rendered
      FROM documents ORDER BY doc_id
    """))

  private val unfoldQ = Q(
    "action_unfold_array",
    (s, d) => {
      val parts = splitWithDelimiter(col("text"), " ")
      docs(s, d).filter(sizeOf(parts) >= 3).select(
        col("doc_id"),
        element_at(parts, 1).as("u_0"),
        element_at(parts, 2).as("u_1"),
        element_at(parts, 3).as("u_2")).orderBy(col("doc_id"))
    },
    Some("""
      SELECT doc_id,
             string_split(text, ' ')[1] AS u_0,
             string_split(text, ' ')[2] AS u_1,
             string_split(text, ' ')[3] AS u_2
      FROM documents WHERE len(string_split(text, ' ')) >= 3 ORDER BY doc_id
    """))

  /** Type recognition for an unspecified template_type (pkg/subscription.go:137-155):
    * first char `{` / `[` / `"` ⇒ JSON template, anything else ⇒ text. The
    * same event set renders through both a sniffed-JSON and a sniffed-text
    * spec (neither declares template_type), through the REAL sniff path.
    */
  private val templateSniff = Q(
    "template_sniff",
    (s, d) => {
      val jsonSpec =
        """{"template": "{ \"sniffed\": \"json\", \"k\": <$.data.k> }"}"""
      val textSpec = """{"template": "sniffed text k=<$.data.k>"}"""
      val v = eventView(s, d)
      TransformRunner(v, jsonSpec)
        .select(col("sequence_number").as("event_id"), lit("json").as("sub"),
          col("body"))
        .unionAll(TransformRunner(v, textSpec)
          .select(col("sequence_number").as("event_id"), lit("text").as("sub"),
            col("body")))
        .orderBy(col("event_id"), col("sub"))
    },
    Some("""
      SELECT event_id, sub, body FROM (
        SELECT event_id, 'json' AS sub,
               '{"sniffed":"json","k":' || json_extract_string(props, '$.k') || '}' AS body
        FROM events
        UNION ALL
        SELECT event_id, 'text' AS sub,
               'sniffed text k=' || json_extract_string(props, '$.k') AS body
        FROM events
      ) ORDER BY event_id, sub
    """))

  /** No-template re-serialize (transformer.go:99-108): a transformer with
    * defines+actions but NO template emits the MUTATED data re-rendered as
    * the body. The data body is enriched with nested structure so the
    * round-trip is observable: array deletion, nested in-place string
    * mutation, appended members — preserved member order and value types
    * all sit under the hash (the last §2.4-2.6 row without an oracle,
    * VERDICT r6 #7).
    */
  private val templateNone = Q(
    "template_none",
    (s, d) => {
      val k = get_json_object(col("data"), "$.k")
      val view = eventView(s, d)
        .withColumn("data", concat(
          lit("{\"k\": "), k,
          lit(", \"tags\": [\"a\", \"b\"], \"nested\": {\"s\": \"x"), k,
          lit("\"}}")))
      val spec = """{
        "define": {"kv": "$.data.k"},
        "pipeline": [
          {"command": ["delete", "$.data.tags"]},
          {"command": ["upper_case", "$.data.nested.s"]},
          {"command": ["create", "$.data.note", "ok"]},
          {"command": ["math_add", "$.data.k2", "$.data.k", 10]}
        ]
      }"""
      TransformRunner(view, spec)
        .select(col("sequence_number").as("event_id"), col("body"))
        .orderBy(col("event_id"))
    },
    Some("""
      SELECT event_id,
             '{"k":' || json_extract_string(props, '$.k')
               || ',"nested":{"s":"X' || json_extract_string(props, '$.k')
               || '"},"note":"ok","k2":'
               || (CAST(json_extract_string(props, '$.k') AS BIGINT) + 10)
               || '}' AS body
      FROM events ORDER BY event_id
    """))

  val all: Seq[Q] = Seq(structPipeline, templateJson, templateText, templateSniff,
    templateNone, debezium,
    mathQ, datetimeQ, caseQ, affixQ, joinQ, replaceQ, spliceQ, delimsQ, checkQ,
    conditionQ, lengthQ, splitQ, splitPosQ, foreachQ, renderQ, unfoldQ)
}
