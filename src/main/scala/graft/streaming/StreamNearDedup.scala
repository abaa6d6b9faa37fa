package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** NEAR-dup detection at INGEST time — the fuzzy face of [[StreamDedup]]:
  * flag events whose content fingerprint is within hamming `MaxDist` of
  * any EARLIER event of the same type, across micro-batches. A
  * training-data ingest uses this to route re-worded/templated duplicates
  * (which exact digests miss) away before they hit storage.
  *
  * Scale shape: the event's 32-bit SimHash is pigeonhole-split into
  * `MaxDist`+1 = 3 blocks; two fingerprints within distance 2 agree
  * exactly on ≥1 block, so the stateful lookup keys on
  * (event_type, block, value) — the same banding as the batch probe
  * ([[graft.ext.Dedup.hammingNearDupPairs]]) turned into streaming state.
  * Each group's state is the set of DISTINCT fingerprints seen (NOT the
  * member events: a 10k-wide exact-duplicate cluster is ONE state entry),
  * capped at `maxState` per group, so state is O(distinct content ×
  * 3 blocks) and the per-event probe is O(distinct fps in 3 groups).
  * At 100 TB a deployment adds a state TTL exactly as documented on
  * [[StreamDedup]]; NoTimeout keeps the oracle deterministic.
  *
  * Verdict per event: its fingerprint and `is_near_dup` (an earlier
  * same-type event within distance ≤ `MaxDist` exists — including exact
  * copies; compose with [[StreamDedup]] to separate the two). Ordering:
  * event-time (ties by id) within a batch, arrival order across batches —
  * the [[StreamDedup]] contract. Below the cap the verdicts equal the
  * brute-force "any earlier event within distance" replay, which is what
  * the DuckDB oracle checks.
  */
object StreamNearDedup {

  val Bits = 32
  val MaxDist = 2
  // pigeonhole widths for 32/3: 11, 11, 10
  private val Widths = Seq(11, 11, 10)
  private val Shifts = Widths.scanLeft(0)(_ + _).init

  final case class BlockRow(
      gk: String, eventId: Long, atMicros: Long, fp: Long)
  final case class BlockMatch(eventId: Long, fp: Long, matched: Boolean)
  final case class FpState(fps: List[Long])

  private def update(maxState: Int)(
      key: String, rows: Iterator[BlockRow],
      state: GroupState[FpState]): Iterator[BlockMatch] = {
    val set = scala.collection.mutable.LinkedHashSet.empty[Long]
    state.getOption.foreach(_.fps.foreach(set += _))
    val out = rows.toSeq.sortBy(r => (r.atMicros, r.eventId)).map { r =>
      val m = set.exists(f => java.lang.Long.bitCount(f ^ r.fp) <= MaxDist)
      if (set.size < maxState) set += r.fp
      BlockMatch(r.eventId, r.fp, m)
    }
    state.update(FpState(set.toList))
    out.iterator
  }

  /** Per-(type, block, value) stateful match stream — runs under
    * Structured Streaming unchanged (state survives via the checkpoint,
    * so later micro-batches flag against everything earlier). Each event
    * surfaces as 3 rows (one per pigeonhole block); [[verdicts]] is the
    * per-event rollup.
    */
  def blockMatches(events: DataFrame, maxState: Int = 1 << 20): Dataset[BlockMatch] = {
    implicit val rEnc = Encoders.product[BlockRow]
    implicit val mEnc = Encoders.product[BlockMatch]
    implicit val kEnc = Encoders.STRING
    implicit val sEnc = Encoders.product[FpState]
    val fp = graft.functions.SimHash(split(col("props"), " ", -1), Bits)
    val blockCols = (0 until MaxDist + 1).map { b =>
      concat_ws("\u001f", col("event_type"), lit(b),
        shiftright(col("fp"), Shifts(b))
          .bitwiseAND(lit((1L << Widths(b)) - 1)))
    }
    events
      .select(col("event_id").as("eventId"), col("event_type"),
        unix_micros(col("ts")).as("atMicros"), fp.as("fp"))
      .select(col("eventId"), col("atMicros"), col("fp"),
        explode(array(blockCols: _*)).as("gk"))
      .select(col("gk"), col("eventId"), col("atMicros"), col("fp"))
      .as[BlockRow]
      .groupByKey(_.gk)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(update(maxState))
  }

  /** Batch form (one fold from empty state — the oracle surface): roll
    * the 3 per-block rows of each event up to one verdict. A hamming-≤2
    * pair agrees on ≥1 block, so `any(matched)` is exact below the cap.
    */
  def verdicts(events: DataFrame, maxState: Int = 1 << 20): DataFrame =
    blockMatches(events, maxState).toDF()
      .groupBy(col("eventId"))
      .agg(first(col("fp")).as("simhash"),
        max(col("matched")).as("is_near_dup"))
}
