package graft

import graft.model.EventView
import graft.streaming.Backoff
import org.apache.spark.sql.functions._

/** Catalog entries for delivery semantics (SURVEY §2.7), expressed as batch
  * queries so the DuckDB oracle can check the *policies* (backoff curve,
  * delay maturity, DLQ stamping, offset reset) — the streaming wiring itself
  * is exercised in SubscriptionRunnerSpec with a real Structured Streaming
  * query.
  */
object StreamQueries {
  import Queries.Q

  /** Retry backoff curve (util.go:75-88): attempt synthesized from the
    * event body; next delivery = event second + backoff.
    */
  private val backoffQ = Q(
    "stream_retry_backoff",
    (s, d) => Tables.events(s, d).select(
      col("event_id"),
      (get_json_object(col("props"), "$.k").try_cast("bigint") % 12 + 1).as("attempt"))
      .withColumn("backoff_sec", Backoff.delaySecondsCol(col("attempt")))
      .orderBy(col("event_id")),
    Some("""
      SELECT event_id,
             CAST(json_extract_string(props, '$.k') AS BIGINT) % 12 + 1 AS attempt,
             CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) % 12 + 1 <= 1 THEN 1
                  WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) % 12 + 1 <= 3
                    THEN 5 * (CAST(json_extract_string(props, '$.k') AS BIGINT) % 12 + 1 - 1)
                  WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) % 12 + 1 <= 9
                    THEN 30 * CAST(power(2, CAST(json_extract_string(props, '$.k') AS BIGINT) % 12 + 1 - 4) AS BIGINT)
                  ELSE 3600 END AS backoff_sec
      FROM events ORDER BY event_id
    """))

  /** Delay-table release (SURVEY §7.6): deliver_at = event second + k
    * seconds; matured = deliver_at <= cutoff. Second-floor epochs agree
    * between Spark (µs) and DuckDB (ns) timestamps.
    */
  private val delayQ = Q(
    "stream_delay_release",
    (s, d) => Tables.events(s, d).select(
      col("event_id"),
      (unix_timestamp(col("ts")) +
        get_json_object(col("props"), "$.k").try_cast("bigint")).as("deliver_at_sec"))
      .filter(col("deliver_at_sec") <= lit(1704240000L)) // 2024-01-03 00:00:00 UTC
      .orderBy(col("event_id")),
    Some("""
      SELECT event_id,
             CAST(floor(epoch(ts)) AS BIGINT)
               + CAST(json_extract_string(props, '$.k') AS BIGINT) AS deliver_at_sec
      FROM events
      WHERE CAST(floor(epoch(ts)) AS BIGINT)
               + CAST(json_extract_string(props, '$.k') AS BIGINT) <= 1704240000
      ORDER BY event_id
    """))

  /** Dead-letter stamping (trigger.go:528-562): events failing delivery
    * (synthetic predicate) carry reason/last-error/subscription metadata.
    */
  private val dlqQ = Q(
    "stream_dlq_metadata",
    (s, d) => Tables.events(s, d)
      .filter(col("value") < 10)
      .select(
        col("event_id"),
        lit("delivery error code=503").as("deadletterreason"),
        lit("503").as("lastdeliveryerror"),
        lit("sub-1").as("xvanussubscriptionid"))
      .orderBy(col("event_id")),
    Some("""
      SELECT event_id,
             'delivery error code=503' AS deadletterreason,
             '503' AS lastdeliveryerror,
             'sub-1' AS xvanussubscriptionid
      FROM events WHERE value < 10 ORDER BY event_id
    """))

  /** Offset reset surface (pkg/subscription.go:66-78): earliest / latest /
    * count per eventlog (event_type as the log key stand-in).
    */
  private val offsetResetQ = Q(
    "stream_offset_reset",
    (s, d) => Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(min(col("event_id")).as("earliest_offset"),
        (max(col("event_id")) + 1).as("latest_offset"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type")),
    Some("""
      SELECT event_type,
             MIN(event_id) AS earliest_offset,
             MAX(event_id) + 1 AS latest_offset,
             COUNT(*) AS n_events
      FROM events GROUP BY event_type ORDER BY event_type
    """))

  val all: Seq[Q] = Seq(backoffQ, delayQ, dlqQ, offsetResetQ)
}
