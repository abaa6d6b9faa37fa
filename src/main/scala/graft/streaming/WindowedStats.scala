package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed statistics over a bus — the Structured Streaming
  * aggregation surface (watermark + tumbling window) the reference's
  * metrics layer approximates with in-memory counters
  * (server/trigger metrics; gateway GatewayEventReceivedCountVec). Here
  * it's a first-class query: per-type event rates per window, exact and
  * replayable from the log.
  *
  * Streaming form: watermark bounds state (late events beyond `lateness`
  * drop, windows finalize and evict — state size is O(open windows), not
  * O(stream)); partial aggregation happens map-side before the window-key
  * shuffle, so at 100 TB/day the shuffle carries one row per
  * (window, type, partition), not per event.
  */
object WindowedStats {

  /** Tumbling-window counts + value stats per event type (batch form —
    * identical expression tree to the streaming form, so the DuckDB oracle
    * checks both).
    */
  def eventRates(events: DataFrame, windowLen: String = "1 minute"): DataFrame =
    events
      .groupBy(window(col("time"), windowLen).as("w"), col("type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("attributes").getItem("xuserid")).as("n_users"))
      .select(col("w.start").as("window_start"), col("type"),
        col("n_events"), col("n_users"))

  /** Streaming form: same aggregation behind a watermark. */
  def eventRatesStream(events: DataFrame, windowLen: String = "1 minute",
      lateness: String = "5 minutes"): DataFrame =
    events.withWatermark("time", lateness)
      .groupBy(window(col("time"), windowLen).as("w"), col("type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("type"), col("n_events"))

  /** Gap-based sessionization per user: Spark's native session_window
    * merges events whose gaps stay under `gap` into one [first,
    * last + gap) session — the declarative form of what
    * flatMapGroupsWithState would hand-roll. Batch form here; streaming
    * adds a watermark exactly like [[eventRatesStream]].
    */
  def userSessionWindows(events: DataFrame, gap: String = "8 hours"): DataFrame =
    events
      .groupBy(
        col("attributes").getItem("xuserid").as("user_id"),
        session_window(col("time"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"))
}
