package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Exact dedup at INGEST time: drop (or flag) events whose content digest
  * was already seen, across micro-batches, via flatMapGroupsWithState —
  * the streaming face of [[graft.ext.Dedup.exact]]. A training-data ingest
  * keeps the first copy of each document and routes duplicates away; the
  * per-digest state (first event id, running count) survives restarts via
  * the checkpoint, and storage is O(distinct content), not O(events).
  *
  * Verdict per event: `is_first` (this event is the digest's first
  * occurrence) and `n_seen` (this event's rank within its digest,
  * 1-based) — so `filter(is_first)` is the deduped stream and `n_seen`
  * feeds duplicate-rate monitoring. Ordering semantics: WITHIN a
  * micro-batch the fold is event-time order (ties by id); ACROSS
  * micro-batches it is arrival order — first-arrival-wins, the standard
  * ingest-dedup contract (an exact event-time ordering across batches
  * would require watermark-delayed emission). Per-invocation group size is
  * bounded by the micro-batch in streaming; the batch form sees the whole
  * group, which is what the one-shot oracle replays.
  *
  * Batch form and streaming form share one update function (batch = state
  * starts empty, one fold), which is what the DuckDB oracle checks: the
  * verdicts must equal a ROW_NUMBER() OVER (PARTITION BY digest
  * ORDER BY ts, id) replay.
  *
  * At 100 TB-scale ingest the state store is the knob: `ttl` sets a
  * processing-time timeout so a digest's state ages out after that much
  * inactivity — the dedup horizon — and a re-arrival past the horizon
  * flags `is_first` again with `n_seen` restarting at 1, keeping state
  * O(distinct content within the horizon) instead of growing forever.
  * `None` (the default) keeps NoTimeout so the batch oracle stays
  * deterministic.
  */
object StreamDedup {

  final case class InEvent(digest: String, eventId: Long, atMicros: Long)
  final case class Verdict(
      digest: String, eventId: Long, isFirst: Boolean, nSeen: Long)
  final case class SeenState(firstId: Long, nSeen: Long)

  private def update(ttlMs: Option[Long])(
      key: String, rows: Iterator[InEvent],
      state: GroupState[SeenState]): Iterator[Verdict] = {
    if (state.hasTimedOut) {
      // past the dedup horizon: forget the digest so a re-arrival is
      // first again; timed-out invocations carry no rows
      state.remove()
      return Iterator.empty
    }
    var st = state.getOption.getOrElse(SeenState(Long.MinValue, 0L))
    // fold in event-time order (ties by id) so ranks are deterministic
    // regardless of shuffle arrival order
    val out = rows.toSeq.sortBy(e => (e.atMicros, e.eventId)).map { e =>
      val first = st.nSeen == 0L
      st = SeenState(if (first) e.eventId else st.firstId, st.nSeen + 1L)
      Verdict(key, e.eventId, first, st.nSeen)
    }
    state.update(st)
    ttlMs.foreach(state.setTimeoutDuration)
    out.iterator
  }

  private def asKeyed(events: DataFrame): Dataset[InEvent] = {
    implicit val enc = Encoders.product[InEvent]
    // U+001F (unit separator) between fields: without it, boundary-shifted
    // field pairs (type "ab"/props "c" vs "a"/"bc") collide into one digest
    // and the non-duplicate event is silently dropped by filter(is_first).
    // NULL fields coalesce to a U+001A sentinel BEFORE concatenation:
    // concat_ws would silently skip a NULL (making NULL indistinguishable
    // from an absent field), while the oracle's `||` would nullify the
    // whole digest — the sentinel keeps both engines agreeing and NULL
    // distinct from the empty string.
    events.select(
      md5(concat_ws("\u001f",
        coalesce(col("event_type"), lit("\u001a")),
        coalesce(col("props"), lit("\u001a")))).as("digest"),
      col("event_id").as("eventId"),
      unix_micros(col("ts")).as("atMicros"))
      .as[InEvent]
  }

  /** Batch form: one fold from empty state — the oracle surface. `ttl`
    * only has effect under a streaming query (batch execution never
    * times groups out), so the oracle path stays byte-identical.
    */
  def verdicts(events: DataFrame,
      ttl: Option[java.time.Duration] = None): Dataset[Verdict] = {
    implicit val vEnc = Encoders.product[Verdict]
    implicit val kEnc = Encoders.STRING
    implicit val sEnc = Encoders.product[SeenState]
    val timeout =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    asKeyed(events).groupByKey(_.digest)
      .flatMapGroupsWithState(
        OutputMode.Append(), timeout)(update(ttl.map(_.toMillis)))
  }

  /** Streaming form: same update function over a bus; duplicate arrivals in
    * LATER micro-batches flag is_first = false because the digest's state
    * persists in the checkpoint. Identical plan to the batch form (the
    * flatMapGroupsWithState call is stream/batch agnostic), so it
    * delegates — one body, no drift.
    */
  def verdictsStream(events: DataFrame,
      ttl: Option[java.time.Duration] = None): Dataset[Verdict] =
    verdicts(events, ttl)

  val outputMode: OutputMode = OutputMode.Append()
}
