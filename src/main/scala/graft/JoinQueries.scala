package graft

import graft.ext.Joins
import org.apache.spark.sql.functions._

/** Catalog entries for the temporal join operators ([[graft.ext.Joins]]):
  * as-of join and bucketed interval join — operators Spark lacks as
  * built-ins, composed Spark-first (union+window fill; bucket equi-join).
  *
  * Oracle parity notes: timestamps are emitted as epoch MICROSECONDS
  * (bigint) — the events table's ns values are µs-aligned, so Spark's
  * unix_micros over the µs-floored column and DuckDB's epoch_us over the
  * raw ns column agree exactly. Sums follow the catalog's decimal-cast
  * convention.
  */
object JoinQueries {
  import Queries.Q

  /** As-of enrichment: every purchase joined to the same user's most
    * recent click at or before it — the canonical event-stream feature
    * join. Spark side runs the REAL [[Joins.asOf]] (single key shuffle,
    * forward-fill window); the oracle picks the match per purchase with a
    * window over an inequality join.
    */
  private val asOfQ = Q(
    "join_asof",
    (s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      Joins.asOf(purchases, clicks, key = "user_id",
        leftTime = "ts", rightTime = "ts", rightSeq = "event_id",
        payload = Seq("event_id", "ts", "value"))
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"), col("value"),
          col("asof_event_id"),
          unix_micros(col("asof_ts")).as("asof_ts_us"),
          col("asof_value"))
        .orderBy(col("event_id"))
    },
    Some("""
      WITH p AS (
        SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
      ), c AS (
        SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'
      ), j AS (
        SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us, p.value,
               c.event_id AS asof_event_id, epoch_us(c.ts) AS asof_ts_us,
               c.value AS asof_value,
               ROW_NUMBER() OVER (PARTITION BY p.event_id
                 ORDER BY c.ts DESC, c.event_id DESC) AS rn
        FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts
      )
      SELECT event_id, user_id, ts_us, value, asof_event_id, asof_ts_us, asof_value
      FROM j WHERE rn = 1 ORDER BY event_id
    """))

  /** Interval aggregation: the 20 highest-value events each open a ±30 min
    * window; count and sum all events inside each window through the REAL
    * [[Joins.rangeJoin]] (30-min buckets → exactly 2-3 buckets per
    * interval; probe side computes one bucket, never explodes). The oracle
    * is the direct inequality join.
    */
  private val rangeQ = Q(
    "join_range",
    (s, d) => {
      val ev = Tables.events(s, d)
      val intervals = ev
        .orderBy(col("value").desc, col("event_id").asc).limit(20)
        .select(col("event_id").as("interval_id"),
          (col("ts") - expr("INTERVAL 30 MINUTES")).as("start"),
          (col("ts") + expr("INTERVAL 30 MINUTES")).as("end"))
      Joins.rangeJoin(ev, "ts", intervals, bucketMicros = 30L * 60 * 1000000)
        .groupBy(col("interval_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .orderBy(col("interval_id"))
    },
    Some("""
      WITH iv AS (
        SELECT event_id AS interval_id,
               ts - INTERVAL 30 MINUTE AS st,
               ts + INTERVAL 30 MINUTE AS en
        FROM events ORDER BY value DESC, event_id ASC LIMIT 20
      )
      SELECT interval_id, COUNT(*) AS n_events,
             CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM iv JOIN events e ON e.ts >= iv.st AND e.ts < iv.en
      GROUP BY interval_id ORDER BY interval_id
    """))

  /** Salted skew join through the REAL Skew.saltedJoin: the probe side is
    * the documents table keyed on `lang` — the canonical hot key (a
    * handful of distinct values over the whole corpus) — spread across
    * the salt space against a replicated per-lang dimension. The oracle
    * is the PLAIN join: a pass proves the salt/replicate/drop mechanics
    * are result-invariant, which is the whole contract of the operator.
    */
  private val saltedQ = Q(
    "join_salted",
    (s, d) => {
      val docs = graft.Tables.documents(s, d)
      val langStats = docs.groupBy(col("lang"))
        .agg(count(lit(1)).as("lang_docs"))
      graft.ext.Skew.saltedJoin(
        docs.select("doc_id", "lang", "n_chars"), langStats,
        key = "lang", rowId = "doc_id")
        .select(col("doc_id"), col("lang"), col("n_chars"), col("lang_docs"))
        .orderBy(col("doc_id"))
    },
    Some("""
      SELECT d.doc_id, d.lang, d.n_chars, l.lang_docs
      FROM documents d
      JOIN (SELECT lang, COUNT(*) AS lang_docs FROM documents GROUP BY lang) l
        ON d.lang = l.lang
      ORDER BY d.doc_id
    """))

  val all: Seq[Q] = Seq(asOfQ, rangeQ, saltedQ)
}
