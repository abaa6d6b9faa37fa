package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Subscription-level ingest dedup: drop re-published copies of the same
  * CloudEvent arriving within a configured horizon, BEFORE the
  * filter/transform/deliver chain runs. The identity key is
  * (`source`, `id`) — the pair the CloudEvents v1 spec requires producers
  * to keep unique, and what the reference's consumers use for idempotency
  * (the gateway stamps `xvanuseventbusid`/CE id on ingest —
  * /root/reference/server/gateway/proxy/proxy.go events path).
  *
  * Semantics: first-arrival-wins across micro-batches; the kept copy's
  * state survives restarts via the checkpoint, so a duplicate republished
  * after a query restart is still dropped as long as it lands inside the
  * horizon. The horizon is a sliding processing-time TTL measured from the
  * key's LAST arrival ([[StreamDedup]]'s contract): once a key has been
  * quiet for `horizon`, its state ages out and the next copy is treated
  * as a fresh event. State is therefore O(distinct events within the
  * horizon) — the knob that keeps a 100 TB-scale ingest's state store
  * bounded instead of growing with the full history.
  *
  * Batch execution (each oracle fold, or a one-shot `processBatch`) never
  * times groups out, so the batch form is a plain exact dedup over the
  * fold — deterministic, which is what a single-batch oracle can replay.
  */
object IngestDedup {

  /** The CloudEvents frame row ([[graft.model.EventView.schema]]), typed so
    * the whole payload rides through the state operator — field order
    * matches the schema so the output frame is column-identical to the
    * input and downstream `processBatch` sees the same contract.
    */
  final case class Ce(
      sequence_number: Long, id: String, source: String, specversion: String,
      `type`: String, subject: Option[String],
      time: Option[java.sql.Timestamp], dataschema: Option[String],
      datacontenttype: Option[String], attributes: Map[String, String],
      data: Option[String])

  /** Per-key state: the sequence number of the copy we kept (diagnostic —
    * membership alone decides the verdict).
    */
  private def keep(ttlMs: Long)(
      key: String, rows: Iterator[Ce],
      state: GroupState[Long]): Iterator[Ce] = {
    if (state.hasTimedOut) {
      // quiet past the horizon: forget the key so the next copy is fresh;
      // timed-out invocations carry no rows
      state.remove()
      return Iterator.empty
    }
    val out =
      if (state.exists) Iterator.empty // duplicate within the horizon
      else {
        // first sight of this (source, id): keep the earliest copy in the
        // batch (deterministic under shuffle arrival order)
        val first = rows.toSeq.minBy(_.sequence_number)
        state.update(first.sequence_number)
        Iterator.single(first)
      }
    // re-arm on EVERY arrival: the horizon slides from the last copy seen
    state.setTimeoutDuration(ttlMs)
    out
  }

  /** The deduped event frame: one row per (source, id) first arrival within
    * the horizon, schema identical to the input. Stream/batch agnostic —
    * under a streaming query the state lives in the checkpoint and ages
    * out per the horizon; under batch it is one fold from empty state.
    */
  def firstArrivals(events: DataFrame, horizon: java.time.Duration): Dataset[Ce] = {
    implicit val ceEnc = Encoders.product[Ce]
    implicit val kEnc = Encoders.STRING
    implicit val sEnc = Encoders.scalaLong
    // U+001F between fields so boundary-shifted (source, id) pairs cannot
    // collide into one key (the StreamDedup digest lesson)
    events.as[Ce].groupByKey(e => e.source + "\u001f" + e.id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout())(
        keep(horizon.toMillis))
  }
}
