package graft.streaming

import graft.filters.FilterCompiler
import graft.model.FilterSpec
import graft.transform.{TransformRunner, Transformer}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** A subscription = filter tree + transformer + delivery config, executed as
  * source → filter(Column) → transform → foreachBatch(sink + retry/DLQ
  * routing) — the Spark shape of the reference's trigger worker pipeline
  * (server/trigger/trigger/trigger.go:304-643, SURVEY §3.2).
  *
  * Delivery semantics preserved (§2.7):
  *  - per-event filter drop commits the offset implicitly (micro-batch);
  *  - transform errors are non-retryable → straight to DLQ (util.go:59-63);
  *  - sink failures: 429/5xx retry with the backoff curve via the retry bus
  *    (stamped `xvanusdeliverytime`/`xvanusretryattempts`), other 4xx → DLQ;
  *  - retry events re-filter and re-transform with a subscription-id guard
  *    (trigger.go:256-302);
  *  - maxRetryAttempts exceeded → DLQ with dead-letter metadata
  *    (trigger.go:528-562);
  *  - ordered mode delivers sequentially and sends failures straight to DLQ
  *    (trigger.go:386-392, 428-431);
  *  - rate limiting is a per-partition token budget (leaky bucket ≈
  *    ratelimit.Take(), trigger.go:247).
  */
object SubscriptionRunner {

  /** What a sink delivers: the rendered event (HTTP sinks POST the body
    * with the content type; server/trigger/client/http.go).
    */
  final case class Deliverable(
      sequenceNumber: Long, id: String, source: String, etype: String,
      contentType: String, body: String)

  /** Delivery outcome for one event: Right = delivered; Left = status code
    * (HTTP-like; see [[Backoff.isRetryable]]).
    */
  type Sink = Deliverable => Either[Int, Unit]

  /** One sink call for a whole batch of events (the reference's gRPC batch
    * client, client/grpc.go:63-85): the result applies to every event in
    * the call.
    */
  type BatchSink = Seq[Deliverable] => Either[Int, Unit]

  /** How events reach the sink (trigger.go:342-375): per-event, or
    * accumulated to SendBatchSize then flushed in one call. The reference's
    * 500 ms time-flush maps to the micro-batch trigger interval — each
    * micro-batch always flushes its final partial chunk.
    */
  sealed trait Delivery extends Serializable
  object Delivery {
    final case class PerEvent(sink: Sink) extends Delivery
    final case class Batched(sink: BatchSink, maxBatchSize: Int) extends Delivery
  }

  /** Per-subscription knobs — the Spark analogue of the reference's
    * `SubscriptionConfig` (/root/reference/pkg/subscription.go:74-84:
    * rate limit, retry cap, dead-letter toggle, ordered delivery).
    * `dedupHorizon` adds the ingest-dedup horizon on top: when set, the
    * streaming plan drops re-published copies of the same (source, id)
    * CloudEvent arriving within the horizon ([[IngestDedup]]) before
    * filter/transform/deliver runs; state ages out past the horizon, so
    * the state store stays bounded at 100 TB-scale ingest.
    * `neardupHorizon` is the fuzzy sibling: drop events whose `data`
    * content SimHash is within hamming ≤ 2 of any earlier same-`type`
    * event inside the horizon ([[StreamNearDedup.verdictsStream]]) —
    * re-worded/templated copies that (source, id) identity misses. Same
    * bounded-state contract: per-(type, block, value) fingerprint sets
    * with a sliding TTL. Setting BOTH knobs composes them in ONE state
    * operator ([[StreamNearDedup.verdictsStreamBoth]] — Spark cannot chain
    * two flatMapGroupsWithState stages in a streaming plan, so the exact
    * identity check rides the fingerprint operator as a 4th state row per
    * event); each knob is judged against all arrivals and an event is
    * kept iff neither flags, in streaming and in pure-batch
    * `processBatch` alike.
    */
  final case class Config(
      subscriptionId: String,
      maxRetryAttempts: Int = 32,
      disableDeadLetter: Boolean = false,
      orderedEvent: Boolean = false,
      rateLimitPerSec: Int = 0,
      dedupHorizon: Option[java.time.Duration] = None,
      neardupHorizon: Option[java.time.Duration] = None)

  final case class Spec(
      filters: Seq[FilterSpec],
      transformerJson: Option[String],
      config: Config) {
    // compiled once per Spec instance, not per micro-batch: under a
    // streaming query processBatch re-reads this every trigger, and a
    // def would re-parse CEL/CESQL filters (and re-emit parse warnings)
    // per batch (ADVICE r15). @transient: the Column tree is driver-side
    // plan metadata; a deserialized Spec recompiles on first use.
    @transient lazy val predicate: Column = FilterCompiler.compileList(filters)
  }

  /** Closed books: delivered + filteredOut + toRetry + toDlq +
    * dedupDropped + neardupDropped + undeliverable = input rows — the
    * at-least-once audit a caller reconciles against batch.count().
    * `undeliverable` (r18) counts failures with NO route: no retry bus
    * (or ordered mode) AND no DLQ (or dead-letter disabled) — before r18
    * these fell out of the books entirely, so a bus-less caller's sums
    * silently under-read the input (and the attach convergence
    * accounting with a failing sink read near-zero rows for a round that
    * handled thousands).
    */
  final case class BatchResult(
      delivered: Long, filteredOut: Long, toRetry: Long, toDlq: Long,
      dedupDropped: Long = 0L, neardupDropped: Long = 0L,
      undeliverable: Long = 0L)

  private def stampAttrs(attrs: Column, kvs: (String, Column)*): Column =
    Attrs.stamp(attrs, kvs: _*)

  /** Process one micro-batch (also usable in pure batch mode): filter,
    * transform, deliver, route failures. Returns routing counts; appends
    * retry/DLQ frames to their buses.
    *
    * Scan discipline: the batch is persisted on entry and every downstream
    * frame (filter, transform, failure join) reads the cached copy, so the
    * source is scanned once per micro-batch regardless of routing fan-out.
    */
  def processBatch(
      batch: DataFrame,
      spec: Spec,
      sink: Sink,
      retryBus: Option[EventBus],
      dlqBus: Option[EventBus],
      nowEpochSec: => Long = System.currentTimeMillis() / 1000): BatchResult =
    processBatchWith(batch, spec, Delivery.PerEvent(sink), retryBus, dlqBus, nowEpochSec)

  /** processBatch generalized over the delivery mode. A configured
    * `dedupHorizon` applies here too — its deterministic batch form
    * (first arrival per (source, id) within the batch), so pure-batch and
    * streaming invocations of the same Spec agree on what gets delivered.
    * `start()` clears the knob before delegating: its stateful stage
    * already deduped the stream (WITH cross-batch state), and re-folding
    * every micro-batch would pay a shuffle for rows that are already
    * unique.
    */
  def processBatchWith(
      batch: DataFrame,
      spec: Spec,
      delivery: Delivery,
      retryBus: Option[EventBus],
      dlqBus: Option[EventBus],
      nowEpochSec: => Long = System.currentTimeMillis() / 1000): BatchResult = {
    import org.apache.spark.storage.StorageLevel
    val exactH = spec.config.dedupHorizon
    val nearH = spec.config.neardupHorizon
    if (exactH.isEmpty && nearH.isEmpty) {
      val cached = batch.persist(StorageLevel.MEMORY_AND_DISK)
      try processBatchCached(cached, spec, delivery, retryBus, dlqBus,
        nowEpochSec)
      finally { cached.unpersist(); () }
    } else if (exactH.isDefined && nearH.isDefined) {
      // BOTH knobs: the combined single-operator fold
      // ([[StreamNearDedup.verdictsStreamBoth]] — the same operator the
      // streaming plan runs), so batch and streaming agree exactly: each
      // knob judged against all arrivals, kept iff neither flags. The
      // per-event verdict frame is pinned once; the two drop counters and
      // the kept frame read it, the kept frame is pinned for the routing
      // fan-out.
      val raw = batch.persist(StorageLevel.MEMORY_AND_DISK)
      try {
        val verdicts = StreamNearDedup.rollupBoth(
          StreamNearDedup.verdictsStreamBoth(raw,
            exactTtl = exactH, nearTtl = nearH).toDF())
          .persist(StorageLevel.MEMORY_AND_DISK)
        try {
          val dc = verdicts.agg(
            count(when(col("exact_dup"), 1)),
            count(when(col("near_dup"), 1))).head
          val kept = StreamNearDedup.keptOfBoth(verdicts)
            .persist(StorageLevel.MEMORY_AND_DISK)
          try {
            val r = processBatchCached(kept, spec, delivery, retryBus,
              dlqBus, nowEpochSec)
            r.copy(dedupDropped = dc.getLong(0),
              neardupDropped = dc.getLong(1))
          } finally { kept.unpersist(); () }
        } finally { verdicts.unpersist(); () }
      } finally { raw.unpersist(); () }
    } else {
      // ONE knob: pin the RAW batch (the input count for drop accounting
      // and the dedup fold must not re-scan the source); the survivor
      // count falls out of the routing sums, no extra action
      val raw = batch.persist(StorageLevel.MEMORY_AND_DISK)
      try {
        val totalIn = raw.count()
        val staged = exactH match {
          case Some(h) => IngestDedup.firstArrivals(raw, h).toDF()
          case None => StreamNearDedup.keepFirstContent(raw, ttl = nearH)
        }
        val cached = staged.persist(StorageLevel.MEMORY_AND_DISK)
        try {
          val r = processBatchCached(cached, spec, delivery, retryBus,
            dlqBus, nowEpochSec)
          val routed = r.delivered + r.filteredOut + r.toRetry + r.toDlq +
            r.undeliverable
          if (exactH.isDefined) r.copy(dedupDropped = totalIn - routed)
          else r.copy(neardupDropped = totalIn - routed)
        } finally { cached.unpersist(); () }
      } finally { raw.unpersist(); () }
    }
  }

  private def processBatchCached(
      batch: DataFrame,
      spec: Spec,
      delivery: Delivery,
      retryBus: Option[EventBus],
      dlqBus: Option[EventBus],
      nowEpochSec: => Long): BatchResult = {
    val total = batch.count()
    val passed = batch.filter(spec.predicate)

    // transform (interpreter path keeps per-event error routing)
    val transformed = spec.transformerJson match {
      case Some(tj) => TransformRunner(passed, tj)
      case None => passed.select(
        col("sequence_number"), col("id"), col("source"), col("type"),
        col("datacontenttype"), col("data").as("body"),
        lit(null).cast("string").as("transform_error"))
    }

    // deliver per partition; collect outcomes (sequence_number, code)
    val ordered = spec.config.orderedEvent
    // the budget divisor is the DELIVERY concurrency, which the repartition
    // below makes EXACT: ordered mode funnels all sends through one task
    // (it gets the whole budget — dividing by the input partitions
    // throttled it to rate/32), and the parallel path is repartitioned to
    // precisely defaultParallelism tasks — a divisor above the real task
    // count would over-admit (N tasks × budget/cores with N > cores), one
    // below would over-throttle. Plan metadata only; the old
    // `batch.rdd.getNumPartitions` probe forced a Dataset→RDD conversion
    // per micro-batch (the fanOut lesson).
    val cores = batch.sparkSession.sparkContext.defaultParallelism
    val ratePerPartition = RateLimit.ratePerPartition(
      spec.config.rateLimitPerSec, if (ordered) 1 else cores)
    // ordered mode serializes *delivery* through one task (the reference's
    // per-subscription ordering) — repartition, not coalesce, so the
    // upstream filter/transform keep their scan parallelism, and sort so
    // the single task walks events in offset order. The parallel path
    // repartitions to exactly the core count only when it has to
    // (ADVICE r6 — this path was unconditional and shuffled every
    // transformed body even with no rate limit configured):
    //  - a rate limit NEEDS the exact partition count, because the
    //    per-task budget above is rate/cores and only sums to the
    //    configured rate when exactly `cores` tasks deliver;
    //  - an un-rate-limited batch only needs *enough* fan-out for the
    //    network-bound sends — the same metadata probe Tables.fanOut
    //    uses (inputFiles, pure plan metadata) spreads a few-split scan
    //    and leaves an already-parallel batch alone, zero shuffle.
    val toDeliver =
      if (ordered) transformed.repartition(1).sortWithinPartitions(col("sequence_number"))
      else if (spec.config.rateLimitPerSec > 0) transformed.repartition(cores)
      else if (transformed.inputFiles.nonEmpty) graft.Tables.fanOut(transformed)
      // fanOut's metadata probe no-ops on zero input files (in-memory or
      // shuffle-derived micro-batch sources, which is what foreachBatch
      // hands this path) — fall back to the ACTUAL partition count so a
      // single-partition batch still fans its network-bound sends across
      // cores (ADVICE r7). The .rdd probe is safe here: the delivery
      // subtree is narrow per-row work, so no stage executes to answer it.
      else if (transformed.rdd.getNumPartitions < cores) transformed.repartition(cores)
      else transformed
    val deliveryMode = delivery
    // rows inside mapPartitions carry no schema; resolve indices driver-side
    val schema = toDeliver.schema
    val seqIdx = schema.fieldIndex("sequence_number")
    val terrIdx = schema.fieldIndex("transform_error")
    val idIdx = schema.fieldIndex("id")
    val srcIdx = schema.fieldIndex("source")
    val typeIdx = schema.fieldIndex("type")
    val ctIdx = schema.fieldIndex("datacontenttype")
    val bodyIdx = schema.fieldIndex("body")
    implicit val enc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaInt)
    // The delivery mapPartitions below is SIDE-EFFECTING (it calls the
    // sink) — [[pinOutcomes]] pins its results as RDD blocks in exactly
    // one job so no downstream plan can ever re-execute it (the r17
    // once-only fix; see pinOutcomes' scaladoc and OnceOnlyPinSpec).
    val outcomesDs = toDeliver.mapPartitions { rows =>
      var windowStart = System.nanoTime()
      var inWindow = 0
      def rateTake(n: Int): Unit = if (ratePerPartition > 0) { // leaky bucket
        inWindow += n
        if (inWindow > ratePerPartition) {
          val elapsed = System.nanoTime() - windowStart
          if (elapsed < 1e9) Thread.sleep(((1e9 - elapsed) / 1e6).toLong)
          windowStart = System.nanoTime()
          inWindow = n
        }
      }
      def mk(row: Row): Deliverable = {
        def s(i: Int): String = if (row.isNullAt(i)) null else row.getString(i)
        Deliverable(row.getLong(seqIdx), s(idIdx), s(srcIdx), s(typeIdx), s(ctIdx), s(bodyIdx))
      }
      def asCode(r: Either[Int, Unit]): Int = r match {
        case Right(_) => 0
        case Left(c) => if (ordered) Backoff.OrderErrorCode else c
      }
      deliveryMode match {
        case Delivery.PerEvent(sinkFn) =>
          rows.map { row =>
            rateTake(1)
            val code =
              if (!row.isNullAt(terrIdx)) Backoff.TransformErrorCode
              else asCode(sinkFn(mk(row)))
            (row.getLong(seqIdx), code)
          }
        case Delivery.Batched(sinkFn, maxSize) =>
          // size-flush (trigger.go:366-372): full chunks of maxSize, the
          // iterator tail is the micro-batch's final time-flush. Transform
          // errors never reach the sink (trigger.go:326-336) and the batch
          // result applies to every event in the call.
          rows.grouped(math.max(1, maxSize)).flatMap { chunk =>
            rateTake(chunk.size)
            val (bad, ok) = chunk.partition(r => !r.isNullAt(terrIdx))
            val badOut = bad.map(r => (r.getLong(seqIdx), Backoff.TransformErrorCode))
            val okOut =
              if (ok.isEmpty) Seq.empty
              else {
                val code = asCode(sinkFn(ok.map(mk)))
                ok.map(r => (r.getLong(seqIdx), code))
              }
            badOut ++ okOut
          }
      }
    }
    val (outcomes, passedCount, deliveredCount) = pinOutcomes(outcomesDs)
    if (deliveredCount == passedCount) { // happy path: no routing work at all
      outcomes.unpersist()
      return BatchResult(deliveredCount, total - passedCount, 0L, 0L)
    }
    // ADVICE r17 low: a throw from the failure join or a retry/DLQ append
    // must not leak the pinned outcome blocks — across the failed
    // micro-batches of a long-running query that accumulates
    // block-manager storage without bound
    try {
      val failed = outcomesFrame(batch.sparkSession, outcomes)
        .filter(col("code") =!= 0)

      // failure routing. The join reads the persisted batch, not the source;
      // no broadcast — on a sink outage `failed` is the whole batch, and
      // broadcasting it is a driver OOM at scale. The key is a long, so the
      // shuffle hash join is cheap (and AQE will broadcast small sides itself).
      val failedEvents = batch.join(failed, Seq("sequence_number"))

      // attempt escalation (trigger.go:455-526): this delivery's attempt
      // number is the event's stamped count + 1; retryable failures below the
      // cap re-enter the retry bus with the next backoff, at the cap they fall
      // through to the DLQ.
      val attempt = coalesce(
        col("attributes").getItem("xvanusretryattempts").cast("int"), lit(0)) + 1
      val retryableCode = Backoff.isRetryableCol(col("code"))
      val canRetry = retryableCode && attempt <= spec.config.maxRetryAttempts

      // both routing counts in one aggregation job; appends only run when
      // their side is non-empty (failedEvents reads the persisted batch +
      // cached outcomes, so none of this re-touches the source)
      val wantRetry = retryBus.isDefined && !ordered
      val rc = failedEvents.agg(
        count(when(canRetry, 1)), count(when(!canRetry, 1))).head
      val (nCanRetry, nNoRetry) = (rc.getLong(0), rc.getLong(1))

      val now = nowEpochSec
      // REBALANCE the routed frames before their bus appends (guide §6,
      // optimization r21): the failure join broadcasts the tiny outcome
      // side, so the written frame otherwise inherits the persisted
      // batch's partitioning — one near-empty parquet file per partition,
      // PER micro-batch, which is exactly the small-file growth the bus
      // manifest/compaction machinery exists to fight (measured: an 8-row
      // retry append wrote 8 files). The AQE-managed exchange coalesces a
      // small failure set to one file and still splits an outage-scale
      // set to advisory-sized files; it moves only the failed subset.
      val retryCount = retryBus match {
        case Some(bus) if wantRetry && nCanRetry > 0 =>
          bus.append(failedEvents.hint("rebalance").filter(canRetry)
            .withColumn("attributes", stampAttrs(col("attributes"),
              "xvanusretryattempts" -> attempt.cast("string"),
              "xvanussubscriptionid" -> lit(spec.config.subscriptionId),
              "xvanusdeliverytime" ->
                timestamp_seconds(lit(now) + Backoff.delaySecondsCol(attempt)).cast("string")))
            .drop("code"))
          nCanRetry
        case _ => 0L
      }

      val (dlqSource, dlqN) =
        if (!wantRetry) (failedEvents, nCanRetry + nNoRetry)
        else (failedEvents.filter(!canRetry), nNoRetry)
      val dlqCount = dlqBus match {
        case Some(bus) if !spec.config.disableDeadLetter && dlqN > 0 =>
          bus.append(dlqSource.hint("rebalance").withColumn("attributes",
            stampAttrs(col("attributes"),
              "deadletterreason" ->
                when(retryableCode && attempt > spec.config.maxRetryAttempts,
                  lit(s"maxRetryAttempts=${spec.config.maxRetryAttempts} exceeded"))
                  .otherwise(concat(lit("delivery error code="), col("code"))),
              "lastdeliverytime" -> timestamp_seconds(lit(now)).cast("string"),
              "lastdeliveryerror" -> col("code").cast("string"),
              "xvanussubscriptionid" -> lit(spec.config.subscriptionId)))
            .drop("code"))
          dlqN
        case _ => 0L
      }
      BatchResult(deliveredCount, total - passedCount, retryCount, dlqCount,
        undeliverable =
          (passedCount - deliveredCount) - retryCount - dlqCount)
    } finally { outcomes.unpersist(); () }
  }

  /** Pin a SIDE-EFFECTING delivery-outcome dataset as RDD blocks,
    * materialized in exactly ONE job that also yields the
    * (passed, delivered) counts — micro-batch latency is driver job
    * count, so the counts ride the materializing action.
    *
    * This is the r17 once-only-delivery fix as a named seam: the delivery
    * `mapPartitions` calls the sink, so it must never sit under a plan
    * fragment Spark may evaluate more than once. A cached DataFrame gives
    * no such guarantee — AQE can re-execute the subtree when a replanned
    * stage misses the cache (observed as a whole micro-batch delivered
    * TWICE with zero task failures). Pinning the outcomes as RDD blocks
    * closes the class: every downstream frame ([[outcomesFrame]]) scans
    * the pinned RDD as its only plan leaf, so the delivery subtree is
    * unreachable from any later plan. Block loss on executor failure recomputes a
    * partition (= re-delivery), which is the at-least-once contract
    * retries already carry. OnceOnlyPinSpec pins both properties — do NOT
    * swap this back to a DataFrame `.cache()`.
    */
  private[streaming] def pinOutcomes(
      outcomes: Dataset[(Long, Int)]): (RDD[(Long, Int)], Long, Long) = {
    val rdd = outcomes.rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // a throwing sink (raw exception instead of Left) fails this job
    // BEFORE the caller receives the handle — unpersist here or every
    // failed micro-batch of a long-running query leaks the partial
    // blocks (the same class as the failure-routing finally)
    val (passed, delivered) =
      try rdd.aggregate((0L, 0L))(
        (acc, r) => (acc._1 + 1L, if (r._2 == 0) acc._2 + 1L else acc._2),
        (a, b) => (a._1 + b._1, a._2 + b._2))
      catch { case t: Throwable => rdd.unpersist(blocking = false); throw t }
    (rdd, passed, delivered)
  }

  /** The downstream view over [[pinOutcomes]]'d blocks: the pinned RDD is
    * the plan's only leaf, with NO delivery operator beneath it
    * (OnceOnlyPinSpec asserts the plan shape by RDD identity).
    */
  private[streaming] def outcomesFrame(session: SparkSession,
      outcomes: RDD[(Long, Int)]): DataFrame = {
    implicit val enc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaInt)
    session.createDataset(outcomes)(enc).toDF("sequence_number", "code")
  }

  /** Wire the streaming form: source bus → (ingest dedup when a horizon is
    * configured) → filter → transform → foreachBatch delivery with
    * retry/DLQ routing. Checkpointing gives the offset-commit semantics
    * natively — and carries the dedup state, so duplicates republished
    * across a query restart are still dropped inside the horizon.
    *
    * Termination caveat: with a `dedupHorizon` set the plan carries a
    * ProcessingTimeTimeout state operator, and Spark keeps scheduling
    * (empty) micro-batches to evaluate its timeouts — the query does NOT
    * self-terminate even under `Trigger.AvailableNow`. Drain-style
    * callers should use [[drain]], which encapsulates the
    * poll-until-quiet-then-stop recipe; a continuous subscription (the
    * production shape) runs until stopped anyway, with the idle batches
    * doing the state aging.
    */
  def start(
      spark: SparkSession,
      sourceBus: EventBus,
      spec: Spec,
      sink: Sink,
      retryBus: Option[EventBus],
      dlqBus: Option[EventBus],
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    // stream-safe compaction guard (r20): rows from a compaction output
    // stamped after this checkpoint's birth are content this stream
    // already committed, re-listed under a new path — dropped in-plan,
    // before any state operator ([[EventBus.compactBelow]])
    val floor = EventBus.compactFloor(spark, sourceBus.path, checkpoint)
    val source = sourceBus.readStream(spark)
      .filter(!EventBus.redeliveredByCompaction(floor))
    // the stateful stage (either or both knobs) dedupes with cross-batch
    // state; clear the knobs so processBatch doesn't re-fold every
    // micro-batch
    val batchSpec = spec.copy(config =
      spec.config.copy(dedupHorizon = None, neardupHorizon = None))
    val deliver = (batch: DataFrame) => {
      processBatch(batch, spec = batchSpec, sink, retryBus, dlqBus)
      ()
    }
    // horizoned plans carry versioned dedup state: refuse a checkpoint
    // written under an incompatible state-key format instead of silently
    // missing duplicates until the stale state TTLs out (ADVICE r17)
    if (spec.config.dedupHorizon.isDefined ||
        spec.config.neardupHorizon.isDefined)
      StreamNearDedup.ensureStateFormat(spark, checkpoint)
    (spec.config.dedupHorizon, spec.config.neardupHorizon) match {
      case (Some(eh), Some(nh)) =>
        // BOTH knobs in ONE state operator (the exact identity check
        // rides the fingerprint stage as a 4th state row per event —
        // Spark cannot chain two flatMapGroupsWithState stages); the
        // per-event rollup runs inside foreachBatch
        StreamNearDedup.verdictsStreamBoth(source,
          exactTtl = Some(eh), nearTtl = Some(nh)).toDF()
          .writeStream
          .option("checkpointLocation", checkpoint)
          .trigger(trigger)
          .foreachBatch { (batch: DataFrame, _: Long) =>
            deliver(StreamNearDedup.keptOfBoth(
              StreamNearDedup.rollupBoth(batch)))
          }
          .start()
      case (None, Some(h)) =>
        // near-dup stage emits 3 block rows per event (no post-state agg
        // allowed in-plan); the per-event rollup runs inside foreachBatch
        StreamNearDedup.verdictsStream(source, ttl = Some(h)).toDF()
          .writeStream
          .option("checkpointLocation", checkpoint)
          .trigger(trigger)
          .foreachBatch { (batch: DataFrame, _: Long) =>
            deliver(StreamNearDedup.rollupKept(batch))
          }
          .start()
      case (exactH, None) =>
        val deduped = exactH match {
          case Some(h) => IngestDedup.firstArrivals(source, h).toDF()
          case None => source
        }
        deduped
          .writeStream
          .option("checkpointLocation", checkpoint)
          .trigger(trigger)
          .foreachBatch { (batch: DataFrame, _: Long) => deliver(batch) }
          .start()
    }
  }

  /** Where a late-attaching subscription starts reading
    * (the reference's per-subscription offset-reset policy,
    * server/trigger/worker.go + offset/offset.go:27-139): from the bus's
    * beginning, from now, or from the first offset whose event time is at
    * or after a timestamp (QueryOffsetByTime, [[EventBus.offsetByTime]]).
    */
  sealed trait OffsetReset extends Serializable
  object OffsetReset {
    case object Earliest extends OffsetReset
    case object Latest extends OffsetReset
    final case class ByTime(ts: java.sql.Timestamp) extends OffsetReset
  }

  /** Sentinel guard of a member whose attach catch-up is still in flight:
    * shared batches skip it entirely (and `seq > Long.MaxValue` admits
    * nothing even if one raced), and the roster file never records it.
    */
  private val PendingGuard = Long.MaxValue

  /** Rows a pass handled, every route counted — the closed-books sum the
    * [[BatchResult]] scaladoc defines (equals the pass's input rows).
    */
  private def rowsOf(r: BatchResult): Long =
    r.delivered + r.filteredOut + r.toRetry + r.toDlq +
      r.dedupDropped + r.neardupDropped + r.undeliverable

  private def addResults(a: BatchResult, b: BatchResult): BatchResult =
    BatchResult(
      a.delivered + b.delivered, a.filteredOut + b.filteredOut,
      a.toRetry + b.toRetry, a.toDlq + b.toDlq,
      a.dedupDropped + b.dedupDropped,
      a.neardupDropped + b.neardupDropped,
      a.undeliverable + b.undeliverable)

  /** Shared bounded pool for concurrent member routing inside a shared
    * micro-batch ([[SharedGroup.processShared]]). Routing is driver-side
    * job orchestration (each task is a handful of Spark actions over the
    * pinned batch), so one JVM-wide pool keeps the concurrent job fan-out
    * sane across groups; tasks never submit back into the pool (no
    * starvation cycle) and never take a group lock (no deadlock — lock
    * order stays group → bus-append). FAIRNESS CAVEAT (VERDICT r18 wrong
    * #3): the pool is shared across ALL groups in the JVM — two groups
    * with 16 slow-sink members each halve each other's routing overlap
    * (correct, bounded, just slower). A multi-group deployment that needs
    * isolation should size groups so members ≤ pool width, or run groups
    * in separate drivers (which a real cluster deployment does anyway).
    */
  private lazy val memberPool = java.util.concurrent.Executors.newFixedThreadPool(
    math.min(16, math.max(2, Runtime.getRuntime.availableProcessors)),
    new java.util.concurrent.ThreadFactory {
      private val n = new java.util.concurrent.atomic.AtomicInteger
      def newThread(r: Runnable): Thread = {
        val t = new Thread(r, s"graft-shared-member-${n.incrementAndGet()}")
        t.setDaemon(true)
        t
      }
    })

  /** One persisted roster entry ([[resumeSharedGroup]]): everything a
    * group restart needs except the sink function itself (functions
    * don't serialize — the caller re-supplies them by subscription id).
    */
  final case class RosterEntry(
      spec: Spec, deliveryKind: String, maxBatchSize: Option[Int],
      guard: Long)

  /** Render the (non-pending) membership as the roster file's JSON — the
    * Spark-side analogue of the reference controller's persisted
    * subscription assignment (server/controller/trigger/). Specs persist
    * whole (filters via [[graft.model.FilterSpec.toJson]], transformer
    * JSON verbatim, config knobs); deliveries persist by KIND only.
    */
  private def rosterJson(ms: Seq[(Spec, Delivery, Long)]): String = {
    import graft.json._
    JObj.of("members" -> JArr(ms.map { case (spec, d, guard) =>
      val dj = d match {
        case Delivery.PerEvent(_) => JObj.of("kind" -> JStr("perEvent"))
        case Delivery.Batched(_, n) =>
          JObj.of("kind" -> JStr("batched"), "maxBatchSize" -> JInt(n))
      }
      JObj.of(
        "guard" -> JInt(guard),
        "delivery" -> dj,
        "spec" -> JObj.of(
          "subscriptionId" -> JStr(spec.config.subscriptionId),
          "filters" -> graft.model.FilterSpec.listToJson(spec.filters),
          // the raw transformer text as a STRING member — parsing it here
          // would make saveRoster throw on a not-quite-JSON transformer
          // that the runtime otherwise degrades to per-event transform
          // errors (and byte-exact round-trip beats a re-render anyway)
          "transformer" -> spec.transformerJson
            .map(t => JStr(t): JValue).getOrElse(JNull),
          "config" -> JObj.of(
            "maxRetryAttempts" -> JInt(spec.config.maxRetryAttempts),
            "disableDeadLetter" -> JBool(spec.config.disableDeadLetter),
            "orderedEvent" -> JBool(spec.config.orderedEvent),
            "rateLimitPerSec" -> JInt(spec.config.rateLimitPerSec)))): JValue
    }.toVector)).render
  }

  /** Parse a roster file back to its entries ([[rosterJson]]'s inverse). */
  def loadRoster(rosterPath: String): Seq[RosterEntry] = {
    import graft.json._
    val raw = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(rosterPath)),
      "UTF-8")
    def fail(msg: String) =
      throw new IllegalArgumentException(s"roster $rosterPath: $msg")
    JValue.parse(raw) match {
      case o: JObj => o.get("members") match {
        case Some(JArr(items)) => items.map {
          case m: JObj =>
            val spec = m.get("spec") match {
              case Some(sj: JObj) =>
                val cfg = sj.get("config") match {
                  case Some(c: JObj) => Config(
                    subscriptionId = sj.get("subscriptionId")
                      .collect { case JStr(s) => s }
                      .getOrElse(fail("spec.subscriptionId missing")),
                    maxRetryAttempts = c.get("maxRetryAttempts")
                      .collect { case JInt(v) => v.toInt }.getOrElse(32),
                    disableDeadLetter = c.get("disableDeadLetter")
                      .collect { case JBool(b) => b }.getOrElse(false),
                    orderedEvent = c.get("orderedEvent")
                      .collect { case JBool(b) => b }.getOrElse(false),
                    rateLimitPerSec = c.get("rateLimitPerSec")
                      .collect { case JInt(v) => v.toInt }.getOrElse(0))
                  case _ => fail("spec.config missing")
                }
                Spec(
                  filters = sj.get("filters")
                    .map(f => graft.model.FilterSpec.listFromJson(f.render))
                    .getOrElse(Seq.empty),
                  transformerJson = sj.get("transformer").collect {
                    case JStr(t) => t
                  },
                  config = cfg)
              case _ => fail("member.spec missing")
            }
            val (kind, mbs) = m.get("delivery") match {
              case Some(dj: JObj) =>
                (dj.get("kind").collect { case JStr(s) => s }
                  .getOrElse(fail("delivery.kind missing")),
                  dj.get("maxBatchSize").collect { case JInt(v) => v.toInt })
              case _ => fail("member.delivery missing")
            }
            RosterEntry(spec, kind, mbs,
              m.get("guard").collect { case JInt(v) => v }
                .getOrElse(fail("member.guard missing")))
          case _ => fail("members[] entry must be an object")
        }
        case _ => fail("members array missing")
      }
      case _ => fail("roster must be a JSON object")
    }
  }

  /** A running shared-scan fan-out group ([[startSharedGroup]]): the
    * streaming query plus the live subscription roster. [[attach]] adds a
    * subscription to the RUNNING group from its own offset-reset policy —
    * the first operational divergence from the reference's
    * reader-per-subscription model the r15 shape had (a late subscription
    * could not replay from earliest without restarting the whole group).
    *
    * Exactly-once across the attach boundary: `attach` first registers
    * the subscription as PENDING under a short group lock (a pending
    * member is skipped by every shared micro-batch — no batch between
    * registration and cutover can leak rows past it), then serves the
    * catch-up OUTSIDE the lock as BATCH reads of the bus (partition-
    * pruned parquet scans — no second streaming query): the range
    * `[reset offset, B₀]` for the boundary B₀ (on-disk high-water mark,
    * max `sequence_number` written — [[EventBus.maxSequenceFrame]], a
    * footer-stats metadata probe, exact under any partition scheme)
    * snapshotted at attach, then delta ranges `(Bᵢ₋₁, Bᵢ]` (footer-pruned
    * reads of only the files appended past Bᵢ₋₁) for whatever landed
    * while the previous chunk was delivering, looped until one round's
    * delta falls under a row threshold. Cutover happens under the lock:
    * one final (bounded — at most ~one sub-threshold round's appends)
    * catch-up read, then the member joins the shared cadence behind a
    * `seq > B_final` guard. Every event lands in exactly one range:
    * everything ≤ B_final is on disk and served by exactly one catch-up
    * chunk, everything later has seq > B_final (the bus's sequence
    * numbers are monotone — [[EventBus.append]]'s precondition). The
    * boundary deliberately sits at-or-above the group's processed offset
    * — rows the stream has not yet processed are served by the catch-up
    * and guarded off the member's stream view, which also makes attach
    * restart-safe with zero per-batch bookkeeping (a RESTARTED group's
    * checkpoint never re-emits processed history, but the catch-up read
    * does).
    *
    * Liveness (r16's one design finding): existing members' micro-batches
    * proceed WHILE an Earliest attach catches up on a deep bus — the
    * group lock is held only for the pending registration, the bounded
    * final delta, and the guard arm, never for the bulk catch-up read
    * (the reference's AddSubscription likewise never pauses other
    * subscriptions' readers, server/trigger/worker.go). The converse
    * holds too (r19, VERDICT r18 #3): batches take the group lock only
    * to SNAPSHOT the membership epoch at batch start, so
    * attach/detach registration is O(1) even while a slow micro-batch
    * is mid-delivery — membership changes take effect at the next
    * batch's snapshot. Delivery-order
    * contract: the attaching member receives its history in ascending
    * contiguous sequence ranges and only then its live rows — catch-up
    * never interleaves with the member's live deliveries, because the
    * member stays pending until cutover.
    *
    * The roster (and each member's guard) is driver memory unless a
    * roster path is configured ([[startSharedGroup]]'s `rosterPath` —
    * then membership persists across restarts and
    * [[SubscriptionRunner.resumeSharedGroup]] rebuilds the group
    * self-contained); without one, a restarted group is rebuilt by the
    * caller (initial members see nothing twice — the shared checkpoint
    * skips processed batches; re-attaching a former member should use
    * `OffsetReset.Latest` or tolerate a replayed catch-up).
    */
  final class SharedGroup private[SubscriptionRunner] (
      spark: SparkSession,
      sourceBus: EventBus,
      retryBus: Option[EventBus],
      dlqBus: Option[EventBus],
      onBatch: Map[String, BatchResult] => Unit,
      rosterPath: Option[String]) {
    import org.apache.spark.storage.StorageLevel
    // (spec, delivery, guard): rows with sequence_number <= guard are
    // skipped for this member (already served by its catch-up read).
    // guard == PendingGuard marks a member whose attach catch-up is in
    // flight: shared batches skip it entirely until cutover.
    private var members = Vector.empty[(Spec, Delivery, Long)]
    private[SubscriptionRunner] var queryRef: StreamingQuery = _
    def query: StreamingQuery = queryRef

    private[SubscriptionRunner] def addInitial(subs: Seq[(Spec, Delivery)]): Unit =
      synchronized {
        subs.foreach { case (spec, d) =>
          requireJoinable(spec)
          members :+= ((spec, d, Long.MinValue))
        }
        saveRoster()
      }

    /** Rebuild a persisted roster ([[resumeSharedGroup]]): members join
      * with their SAVED guards, so no catch-up replays — the shared
      * checkpoint already covers their history.
      */
    private[SubscriptionRunner] def addRestored(
        subs: Seq[(Spec, Delivery, Long)]): Unit =
      synchronized {
        subs.foreach { case (spec, d, guard) =>
          requireJoinable(spec)
          members :+= ((spec, d, guard))
        }
        saveRoster()
      }

    /** Persist the (non-pending) roster to the configured path, atomically
      * (write-temp + rename). Always called under the group lock, so the
      * file is a consistent snapshot of the membership.
      */
    private def saveRoster(): Unit = rosterPath.foreach { rp =>
      // IO failures are logged, not thrown: by the time this runs the
      // membership change is already live (an armed attach, a completed
      // detach), and failing the caller would report a member as dead
      // while it keeps delivering. Durability degrades; liveness doesn't.
      try {
        val json = rosterJson(members.filter(_._3 != PendingGuard))
        val p = java.nio.file.Paths.get(rp)
        Option(p.getParent).foreach { d =>
          java.nio.file.Files.createDirectories(d); ()
        }
        val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
        java.nio.file.Files.write(tmp, json.getBytes("UTF-8"))
        java.nio.file.Files.move(tmp, p,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        ()
      } catch {
        case e: Throwable =>
          System.err.println(s"[shared-group] roster write to $rp failed: $e")
      }
    }

    /** The bus's on-disk high-water mark (max sequence number), or
      * Long.MinValue on an empty/never-written bus (spark.read on a
      * nonexistent/empty parquet dir throws — nothing to catch up).
      * Metadata-bounded and partition-scheme-independent:
      * [[EventBus.maxSequenceFrame]] answers from parquet footer stats
      * (r18 — the newest-date-partition pruning undershot on
      * out-of-order event times, ADVICE r17 high).
      */
    private def boundary(): Long =
      // under the bus's append lock: a same-JVM multi-file append commits
      // files one rename at a time, and a probe landing mid-commit could
      // observe a high-seq file while a lower-seq sibling is still
      // staged — the boundary would overshoot the servable range and the
      // guard would exclude the unseen rows forever. Inside the lock an
      // append is either fully visible or not started. (Lock order is
      // always group lock -> append lock, same as a batch routing an
      // append; never the reverse, so no deadlock.)
      EventBus.appendLock(sourceBus.path).synchronized {
        try {
          val r = sourceBus.maxSequenceFrame(spark).head
          if (r.isNullAt(0)) Long.MinValue else r.getLong(0)
        } catch { case _: org.apache.spark.sql.AnalysisException => Long.MinValue }
      }

    private def requireJoinable(spec: Spec): Unit = {
      require(
        spec.config.dedupHorizon.isEmpty && spec.config.neardupHorizon.isEmpty,
        s"subscription ${spec.config.subscriptionId}: horizon knobs are " +
          "per-subscription streaming state — run it as a dedicated query")
      // a DURABLE group only admits specs its roster can round-trip:
      // duplicate Exact/Prefix/Suffix keys collapse through the JSON
      // object form (silently WIDENING the AND-of-pairs filter on
      // resume), and empty pair values fail fromJson's validation at
      // load — both must surface here, before the member is live, not
      // on the restart that tries to rebuild it
      if (rosterPath.isDefined) {
        val rt =
          try graft.model.FilterSpec.listFromJson(
            graft.model.FilterSpec.listToJson(spec.filters).render) == spec.filters
          catch { case _: IllegalArgumentException => false }
        require(rt,
          s"subscription ${spec.config.subscriptionId}: filters do not " +
            "round-trip through the roster JSON (duplicate pair keys or " +
            "empty values) — a resumed group would compile a different filter")
      }
      // ids key the per-batch results map AND the retry/DLQ stamps — a
      // duplicate would silently drop one subscription's accounting and
      // make the two indistinguishable on spool release
      require(!members.exists(_._1.config.subscriptionId == spec.config.subscriptionId),
        s"duplicate subscriptionId in shared group: ${spec.config.subscriptionId}")
    }

    /** One shared micro-batch: snapshot the membership EPOCH under a
      * short lock, pin the batch ONCE, run every snapshot member's
      * routing over the cached copy (each behind its attach guard) with
      * NO group lock held (r19, VERDICT r18 #3: the r18 shape held the
      * lock for the whole batch, so attach/detach registration queued
      * behind the longest in-flight micro-batch — with a latched slow
      * sink, minutes just to register PENDING).
      *
      * The epoch discipline keeps the attach arguments intact:
      * membership changes take effect at the NEXT batch. A PENDING
      * member (attach catch-up in flight) is absent from every snapshot
      * taken before its cutover arms the guard — nothing leaks past it,
      * its rows are the catch-up's to serve. An armed member's first
      * snapshot happens after its guard is final, so its stream view
      * starts exactly at `seq > guard`. A batch that could carry
      * rows ABOVE a cutover's boundary cannot have started before the
      * cutover armed the member: the cutover runs under this group lock
      * and probes the boundary under the bus append lock, so any such
      * row was appended after the boundary probe — and every batch
      * containing it snapshots AFTER the cutover's lock releases (the
      * snapshot takes the same lock). A detached member still finishes
      * the in-flight batch its snapshot belongs to — whole-batch or
      * nothing, never half.
      *
      * Members route CONCURRENTLY over the pinned batch (r18, VERDICT r17
      * #1): the r17 shape routed them sequentially, so shared-batch wall
      * time was the SUM of the members' delivery times and one slow sink
      * stalled every other member. The reference delivers
      * per-subscription concurrently — each subscription is its own
      * trigger worker with its own goroutine pool
      * (server/trigger/trigger/trigger.go:97,134,314). Retry/DLQ appends
      * from concurrent members are serialized by the per-path bus append
      * lock ([[EventBus.append]]). A member failure is rethrown — after
      * EVERY member's pass completes, so no straggler's sink keeps
      * delivering into a torn-down query.
      */
    private[SubscriptionRunner] def processShared(batch: DataFrame): Unit = {
        val live = synchronized { members.filter(_._3 != PendingGuard) }
        val cached = batch.persist(StorageLevel.MEMORY_AND_DISK)
        try {
          def in(guard: Long): DataFrame =
            if (guard == Long.MinValue) cached
            else cached.filter(col("sequence_number") > guard)
          def route(spec: Spec, delivery: Delivery, guard: Long): BatchResult =
            processBatchCached(in(guard), spec, delivery, retryBus, dlqBus,
              System.currentTimeMillis() / 1000)
          val results: Map[String, BatchResult] =
            if (live.sizeIs <= 1)
              live.map { case (spec, d, g) =>
                spec.config.subscriptionId -> route(spec, d, g)
              }.toMap
            else {
              val fs = live.map { case (spec, d, g) =>
                spec.config.subscriptionId -> memberPool.submit(
                  new java.util.concurrent.Callable[BatchResult] {
                    def call(): BatchResult = route(spec, d, g)
                  })
              }
              // await ALL before rethrowing the first failure
              val done = fs.map { case (id, f) =>
                id -> (try Right(f.get())
                catch {
                  case e: java.util.concurrent.ExecutionException =>
                    Left(Option(e.getCause).getOrElse(e))
                  case e: InterruptedException =>
                    // the stream thread is being torn down (query.stop
                    // interrupts the micro-batch thread). cancel(true):
                    // an un-started member never begins delivering, and
                    // an in-flight member's routing thread is
                    // interrupted — it dies at its next blocking point
                    // (a job await), submitting no further routing jobs
                    // into the torn-down query. What this CANNOT undo:
                    // executor tasks already mid-partition finish that
                    // partition (their sink calls included) — the same
                    // at-least-once surface as a crash here, and why a
                    // post-restart replay asserts set-, not
                    // count-equality (EndToEndSpec stop-drain case). The
                    // get() sweep merely observes cancellation; a
                    // cancelled FutureTask's get() returns immediately,
                    // it does not wait out the Callable.
                    fs.foreach(_._2.cancel(true))
                    fs.foreach { p =>
                      try { p._2.get(); () } catch { case _: Throwable => () }
                    }
                    Thread.currentThread().interrupt()
                    throw e
                })
              }
              done.foreach { case (_, Left(t)) => throw t; case _ => () }
              done.collect { case (id, Right(r)) => id -> r }.toMap
            }
          onBatch(results)
        } finally { cached.unpersist(); () }
    }

    /** Rows handled by the locked phase-3 delta of the most recent
      * attach (0 when cutover found nothing to serve; -1 before any
      * attach). Ops/spec observability for the liveness contract: the
      * locked delta must stay near `deltaRowThreshold`, never grow with
      * the bus append rate (AttachConvergenceSpec pins this).
      */
    @volatile private[streaming] var lastLockedDeltaRows: Long = -1L

    /** Replace the member's PENDING sentinel with its live guard. Callers
      * hold the group lock.
      */
    private def arm(id: String, guard: Long): Unit =
      members = members.map {
        case (sp, d, g) if sp.config.subscriptionId == id && g == PendingGuard =>
          (sp, d, guard)
        case m => m
      }

    /** The ByTime offset SEEK (block_seek.go:45-86), not a time filter:
      * the reset point is the FIRST offset with time >= ts; everything
      * at-or-after it (out-of-order times included) is delivered,
      * everything before it is skipped. None = no qualifying offset on
      * disk yet.
      */
    private def probeByTime(ts: java.sql.Timestamp): Option[Long] =
      try {
        val first = sourceBus.offsetByTime(spark, ts).head
        if (first.isNullAt(0)) None else Some(first.getLong(0))
      } catch { case _: org.apache.spark.sql.AnalysisException => None }

    /** [[probeByTime]] restricted to rows with `sequence_number > lo` —
      * a footer-pruned tail scan for the locked ByTime re-probe, sound
      * because the unrestricted probe already cleared everything ≤ `lo`.
      */
    private def probeByTimeAbove(ts: java.sql.Timestamp,
        lo: Long): Option[Long] =
      try {
        val first = sourceBus.readAboveSequence(spark, lo)
          .filter(col("time") >= lit(ts) && col("sequence_number") > lo)
          .agg(min(col("sequence_number"))).head
        if (first.isNullAt(0)) None else Some(first.getLong(0))
      } catch { case _: org.apache.spark.sql.AnalysisException => None }

    /** Add a subscription to the running group. Returns the catch-up
      * pass's [[BatchResult]] (zeros for `Latest`). The catch-up is
      * batch reads of the bus — `[reset offset, B]` plus bounded deltas,
      * through the full filter/transform/deliver routing — so the
      * earliest-policy subscriber sees every pre-attach event exactly
      * once, then joins the shared cadence behind a `seq > B_final`
      * guard. The bulk of the catch-up runs OUTSIDE the group lock (the
      * member is registered PENDING first — for EVERY non-Latest policy,
      * including a ByTime whose probe finds nothing yet (ADVICE r17
      * medium: the r17 shape probed ByTime before registering, so an
      * event appended and batch-processed in that gap was silently
      * lost); no shared batch can leak rows past a pending member.
      * Existing members' micro-batches proceed throughout — see the
      * class scaladoc for the exactly-once and liveness arguments.
      * Blocks the CALLING thread until catch-up completes.
      *
      * Delta convergence (VERDICT r17 #4): the outside-the-lock loop
      * keeps serving delta rounds until one round lands under
      * `deltaRowThreshold` rows, so the locked phase-3 delta is at most
      * ~one sub-threshold round's appends. A bus whose append rate
      * outpaces catch-up throughput FAILS the attach at
      * `maxCatchupRounds` (member removed, IllegalStateException) rather
      * than taking an unbounded delta under the lock — the r17 shape's
      * fixed 3-round loop did exactly that.
      */
    def attach(spec: Spec, delivery: Delivery, reset: OffsetReset,
        deltaRowThreshold: Long = 4096L,
        maxCatchupRounds: Int = 16): BatchResult = reset match {
      case OffsetReset.Latest =>
        // "from now": no history to serve — guard at the current
        // high-water mark, all under one short lock
        synchronized {
          requireJoinable(spec)
          members :+= ((spec, delivery, boundary()))
          saveRoster()
        }
        BatchResult(0L, 0L, 0L, 0L)
      case _ =>
        // phase 1 — short lock: validate + register PENDING before ANY
        // probe, so every shared batch from here on skips the member
        // (nothing can leak past an unregistered member, nothing
        // double-delivers)
        synchronized {
          requireJoinable(spec)
          members :+= ((spec, delivery, PendingGuard))
        }
        val id = spec.config.subscriptionId
        try {
          reset match {
            case OffsetReset.Earliest =>
              catchupAndCutover(id, spec, delivery, Long.MinValue,
                deltaRowThreshold, maxCatchupRounds)
            case OffsetReset.ByTime(ts) =>
              // b0 BEFORE the probe: if the probe finds nothing, every
              // qualifying row that can appear later has seq > b0
              // (monotone appends + nothing ≤ b0 qualified at probe
              // time), so the locked re-probe below scans only the
              // footer-pruned tail, never the whole bus
              val b0 = boundary()
              probeByTime(ts) match {
                case Some(s0) =>
                  catchupAndCutover(id, spec, delivery, s0,
                    deltaRowThreshold, maxCatchupRounds)
                case None =>
                  // no qualifying offset yet: cutover under the group
                  // lock with a RE-probe — between the probe above and
                  // this lock a qualifying event may have been appended
                  // (it cannot have been batch-processed past us: we are
                  // pending, so every batch snapshot taken before the
                  // arm below skips us — the r19 epoch discipline). The
                  // re-probe and the boundary must observe ONE frozen
                  // disk snapshot (bus append lock; lock order stays
                  // group → append): a commit landing between a None
                  // re-probe and the boundary would otherwise sit at or
                  // below the guard, unserved — lost.
                  synchronized {
                    val (reprobe, fin) =
                      EventBus.appendLock(sourceBus.path).synchronized {
                        (probeByTimeAbove(ts, b0), boundary())
                      }
                    val res = reprobe match {
                      case Some(s) =>
                        // serve [s, fin] from the pruned tail, bounded
                        // by the race window's appends; rows appended
                        // from here on carry seq > fin (monotone
                        // appends) and arrive via the guarded stream
                        val r = processBatchWith(
                          sourceBus.readAboveSequence(spark, b0)
                            .filter(col("sequence_number") >= s &&
                              col("sequence_number") <= fin),
                          spec, delivery, retryBus, dlqBus)
                        lastLockedDeltaRows = rowsOf(r)
                        r
                      case None =>
                        lastLockedDeltaRows = 0L
                        BatchResult(0L, 0L, 0L, 0L)
                    }
                    arm(id, fin)
                    saveRoster()
                    res
                  }
              }
            case OffsetReset.Latest =>
              throw new IllegalStateException("unreachable: Latest handled above")
          }
        } catch {
          case t: Throwable =>
            // a failed catch-up must not leave a permanently-pending
            // (skip-all) member on the roster
            synchronized {
              members = members.filterNot(m =>
                m._1.config.subscriptionId == id && m._3 == PendingGuard)
            }
            throw t
        }
    }

    /** Phases 2+3 of a history-serving attach: the unlocked catch-up
      * loop from `s0` (inclusive; Long.MinValue = Earliest) and the
      * locked cutover — see [[attach]]'s scaladoc for the convergence
      * contract. The caller has already registered the member PENDING
      * and handles failure cleanup.
      */
    private def catchupAndCutover(id: String, spec: Spec,
        delivery: Delivery, s0: Long, deltaRowThreshold: Long,
        maxCatchupRounds: Int): BatchResult = {
      // `servedUpTo == Long.MinValue` = the bulk [s0, hi] history read;
      // delta rounds read only files whose footer max exceeds the served
      // boundary ([[EventBus.readAboveSequence]] — VERDICT r17 #6: the
      // delta rows (B_{i-1}, B_i] are a recent-appends range, so a full
      // bus scan per round would be O(bus) at 100 TB)
      def chunk(servedUpTo: Long, hi: Long): BatchResult = {
        val (src, lo) =
          if (servedUpTo == Long.MinValue)
            (sourceBus.read(spark), col("sequence_number") >= s0)
          else
            (sourceBus.readAboveSequence(spark, servedUpTo),
              col("sequence_number") > servedUpTo)
        processBatchWith(src.filter(lo && col("sequence_number") <= hi),
          spec, delivery, retryBus, dlqBus)
      }
      // rows waiting in (servedUpTo, hi] — a footer-pruned count, so the
      // loop decides on what is actually LEFT, not on the previous
      // round's row count (a slow low-row round — a rate-limited sink
      // serving just under the threshold over minutes — would otherwise
      // exit the loop with minutes of appends remaining for the LOCKED
      // phase, the group-wide stall this loop exists to prevent)
      def pendingRows(servedUpTo: Long, hi: Long): Long =
        if (hi <= servedUpTo) 0L
        else sourceBus.readAboveSequence(spark, servedUpTo)
          .filter(col("sequence_number") > servedUpTo &&
            col("sequence_number") <= hi).count()
      // phase 2 — OUTSIDE the lock: serve the bulk [s0, B0], then delta
      // ranges for whatever landed while the previous chunk was
      // delivering (rows <= each boundary are immutable on disk), until
      // the MEASURED remaining delta is under the threshold or the round
      // cap fails the attach
      var acc = BatchResult(0L, 0L, 0L, 0L)
      var served = Long.MinValue
      var rounds = 0
      var target = boundary()
      if (target > served) {
        acc = addResults(acc, chunk(served, target))
        served = target
        rounds += 1
      }
      target = boundary()
      var remaining = pendingRows(served, target)
      while (remaining >= deltaRowThreshold && rounds < maxCatchupRounds) {
        acc = addResults(acc, chunk(served, target))
        served = target
        rounds += 1
        target = boundary()
        remaining = pendingRows(served, target)
      }
      if (remaining >= deltaRowThreshold)
        throw new IllegalStateException(
          s"subscription $id: attach catch-up did not converge in " +
            s"$maxCatchupRounds rounds ($remaining rows still pending >= " +
            s"threshold $deltaRowThreshold — the bus append rate " +
            "outpaces catch-up throughput); attach aborted")
      // phase 3 — cutover under the group lock: one final BOUNDED delta
      // (at most ~one sub-threshold round's appends), then arm the live
      // guard. The lock here orders the cutover against batch SNAPSHOTS
      // (r19): a batch that could carry rows above `fin` must snapshot
      // AFTER this block releases — so it sees the armed guard and
      // serves them; batches snapshotted before it skip the
      // still-pending member, whose rows ≤ fin this delta serves. Batch
      // starts queue behind this bounded delta only — never behind the
      // bulk catch-up (phase 2), and registration (phase 1) never
      // queues behind a batch at all.
      synchronized {
        val fin = boundary()
        if (fin > served) {
          val r = chunk(served, fin)
          lastLockedDeltaRows = rowsOf(r)
          acc = addResults(acc, r)
          served = fin
        } else lastLockedDeltaRows = 0L
        arm(id, served)
        saveRoster()
      }
      acc
    }

    /** Remove a subscription from the running group (the reference
      * deletes a subscription from its live trigger worker,
      * server/trigger/worker.go RemoveSubscription). Takes effect at the
      * NEXT micro-batch (r19 epoch discipline): an in-flight batch whose
      * snapshot holds the member still delivers to it WHOLE — never
      * half — and this call returns without waiting for it. Returns
      * false if no member has the id. The id becomes free for a later re-attach
      * (which starts from its own offset-reset policy, as any attach
      * does).
      */
    def detach(subscriptionId: String): Boolean = synchronized {
      // a PENDING member is mid-attach: removing it here would let the
      // attach cutover arm nothing while still returning success — the
      // caller would hold a "live" subscription that never delivers.
      // Detach it after its attach returns.
      if (members.exists(m => m._1.config.subscriptionId == subscriptionId &&
          m._3 == PendingGuard))
        throw new IllegalStateException(
          s"subscription $subscriptionId: attach in flight — detach after it completes")
      val before = members.size
      members = members.filterNot(_._1.config.subscriptionId == subscriptionId)
      val removed = members.size < before
      if (removed) saveRoster()
      removed
    }
  }

  /** One stream, N subscriptions — the fan-out shape a 100 TB bus needs:
    * a single source scan feeds every subscription's
    * filter/transform/deliver routing per micro-batch, instead of N
    * queries each re-reading the bus. The reference's trigger attaches
    * one worker (its own reader + offset) per subscription
    * (server/trigger/worker.go) — N readers of the same segments; on
    * Spark the natural plan is one scan, a pinned micro-batch, and N
    * routing passes over the cache, so bus-read I/O is constant in the
    * subscription count.
    *
    * Each subscription brings its own [[Delivery]] (per-event or batched
    * — trigger.go:342-375 applies send batching per subscription
    * regardless of how the read is shared). Horizon knobs are
    * per-subscription streaming STATE and cannot ride a shared plan —
    * such specs are rejected; run them as dedicated [[start]] queries.
    * Initial members advance together on the shared checkpoint; a
    * subscription added later via [[SharedGroup.attach]] starts from its
    * own offset-reset policy.
    *
    * `onBatch` receives every subscription's [[BatchResult]] after each
    * micro-batch, keyed by subscriptionId. `rosterPath` (optional) makes
    * the membership durable: every attach/detach atomically rewrites the
    * bus-adjacent roster file, and [[resumeSharedGroup]] rebuilds the
    * group from it after a restart — members rejoin with their saved
    * guards, no catch-up replays.
    */
  def startSharedGroup(
      spark: SparkSession,
      sourceBus: EventBus,
      subs: Seq[(Spec, Delivery)],
      retryBus: Option[EventBus],
      dlqBus: Option[EventBus],
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      onBatch: Map[String, BatchResult] => Unit = _ => (),
      rosterPath: Option[String] = None): SharedGroup = {
    require(subs.nonEmpty, "startSharedGroup needs at least one subscription")
    val group = new SharedGroup(spark, sourceBus, retryBus, dlqBus, onBatch,
      rosterPath)
    group.addInitial(subs)
    startGroupQuery(spark, sourceBus, group, checkpoint, trigger)
    group
  }

  /** Rebuild a shared group from its persisted roster — the self-contained
    * restart [[startSharedGroup]]'s `rosterPath` buys (the reference
    * persists subscription→worker assignment in the controller,
    * server/controller/trigger/). Every persisted member rejoins with its
    * SAVED guard: the shared checkpoint skips processed batches, the
    * guard keeps catch-up-served history off the stream view, so a former
    * Earliest attacher replays NOTHING. Sinks don't serialize —
    * `deliveries` re-supplies each member's [[Delivery]] by subscription
    * id, and the persisted delivery KIND is validated against it (a
    * per-event sink wired where a batched one was registered is a
    * configuration bug worth failing fast on).
    */
  def resumeSharedGroup(
      spark: SparkSession,
      sourceBus: EventBus,
      rosterPath: String,
      deliveries: String => Delivery,
      retryBus: Option[EventBus],
      dlqBus: Option[EventBus],
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      onBatch: Map[String, BatchResult] => Unit = _ => ()): SharedGroup = {
    val entries = loadRoster(rosterPath)
    require(entries.nonEmpty, s"roster $rosterPath has no members")
    val restored = entries.map { e =>
      val id = e.spec.config.subscriptionId
      val d = deliveries(id)
      val kind = d match {
        case Delivery.PerEvent(_) => "perEvent"
        case Delivery.Batched(_, _) => "batched"
      }
      require(kind == e.deliveryKind,
        s"subscription $id: roster records ${e.deliveryKind} delivery, " +
          s"caller wired $kind")
      (e.spec, d, e.guard)
    }
    val group = new SharedGroup(spark, sourceBus, retryBus, dlqBus, onBatch,
      Some(rosterPath))
    group.addRestored(restored)
    startGroupQuery(spark, sourceBus, group, checkpoint, trigger)
    group
  }

  private def startGroupQuery(
      spark: SparkSession,
      sourceBus: EventBus,
      group: SharedGroup,
      checkpoint: String,
      trigger: Trigger): Unit = {
    // same stream-safe compaction guard as [[start]] — a shared group's
    // founders (guard Long.MinValue) take initial load from the stream,
    // so a re-listed compaction output would re-deliver to every one of
    // them without this
    val floor = EventBus.compactFloor(spark, sourceBus.path, checkpoint)
    group.queryRef = sourceBus.readStream(spark)
      .filter(!EventBus.redeliveredByCompaction(floor))
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        group.processShared(batch)
        ()
      }
      .start()
  }

  /** [[startSharedGroup]] with per-event sinks and no attach handle — the
    * original r15 surface, kept for fixed-roster callers.
    */
  def startShared(
      spark: SparkSession,
      sourceBus: EventBus,
      subs: Seq[(Spec, Sink)],
      retryBus: Option[EventBus],
      dlqBus: Option[EventBus],
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      onBatch: Map[String, BatchResult] => Unit = _ => ()): StreamingQuery =
    startSharedGroup(spark, sourceBus,
      subs.map { case (spec, sink) => (spec, Delivery.PerEvent(sink)) },
      retryBus, dlqBus, checkpoint, trigger, onBatch).query

  /** One release pass over a due-time-bucketed retry spool: process every
    * fully-matured bucket (partition-pruned read — pending buckets are
    * never opened, and with nothing matured there is no Spark job at all),
    * re-deliver through the full routing (escalating attempts; next
    * generation appends back into the spool, bucketed by its new delivery
    * time — ONE write), then evict the released buckets. This is the
    * declarative form of the reference wheel's bucket flush
    * (timingwheel/bucket.go:112-136); the round-2 design instead re-wrote
    * every pending event on every trigger.
    */
  def releaseSpool(
      spark: SparkSession,
      spool: BucketedSpool,
      spec: Spec,
      sink: Sink,
      dlqBus: Option[EventBus],
      nowEpochSec: Long): BatchResult = {
    val buckets = spool.maturedBuckets(spark, nowEpochSec)
    if (buckets.isEmpty) BatchResult(0L, 0L, 0L, 0L)
    else {
      val matured = spool.readBuckets(spark, buckets)
      val res = processRetries(matured, spec, sink, Some(spool), dlqBus, nowEpochSec)
      spool.evict(spark, buckets)
      res
    }
  }

  /** Streaming retry consumer — the Spark form of the reference's timer
    * server loop (server/timer + trigger.go:256-302): a durable ticker
    * query (rate source; the rows are ignored, the trigger cadence is the
    * wheel's tick) that runs [[releaseSpool]] once per trigger. All retry
    * state lives in the spool's due-time buckets and the events' stamped
    * attempt counts, so the query survives checkpoint restarts with no
    * state of its own, and a restart resumes escalation exactly where the
    * spool left off.
    */
  /** One-shot drain: start, process everything currently on the bus, stop.
    * The SAFE counterpart to `start(..., AvailableNow)` — without a
    * dedup/near-dup horizon it is exactly that (await termination); with
    * one, the
    * ProcessingTimeTimeout state operator keeps scheduling empty batches
    * to evaluate timeouts and the query never self-terminates, so this
    * polls progress until a post-data batch reads zero input rows, then
    * stops. Callers that were open-coding the poll-and-stop recipe from
    * the `start` scaladoc should call this instead.
    */
  def drain(
      spark: SparkSession,
      sourceBus: EventBus,
      spec: Spec,
      sink: Sink,
      retryBus: Option[EventBus],
      dlqBus: Option[EventBus],
      checkpoint: String,
      timeoutMs: Long = 120000L): Unit = {
    val q = start(spark, sourceBus, spec, sink, retryBus, dlqBus, checkpoint)
    try {
      if (spec.config.dedupHorizon.isEmpty &&
          spec.config.neardupHorizon.isEmpty) {
        // propagate a partial drain the same way the horizon path does —
        // returning normally would claim the bus was fully processed
        if (!q.awaitTermination(timeoutMs))
          throw new java.util.concurrent.TimeoutException(
            s"drain did not complete within ${timeoutMs} ms")
      } else {
        val deadline = System.nanoTime + timeoutMs * 1000000L
        var done = false
        while (!done && q.isActive && System.nanoTime < deadline) {
          val p = q.lastProgress
          // batchId > 0 ⇒ at least one real batch ran before this empty one
          done = p != null && p.numInputRows == 0 && p.batchId > 0
          if (!done) Thread.sleep(50)
        }
        // a query that died mid-drain must surface ITS exception (sink
        // throw, checkpoint IO), not read as a quiesce timeout
        if (!q.isActive) { q.awaitTermination(); () }
        if (!done)
          throw new java.util.concurrent.TimeoutException(
            s"drain did not quiesce within ${timeoutMs} ms")
      }
    } finally if (q.isActive) q.stop()
  }

  def startRetries(
      spark: SparkSession,
      spool: BucketedSpool,
      spec: Spec,
      sink: Sink,
      dlqBus: Option[EventBus],
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second"),
      nowEpochSec: () => Long = () => System.currentTimeMillis() / 1000): StreamingQuery =
    spark.readStream.format("rate").option("rowsPerSecond", "1").load()
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (_: DataFrame, _: Long) =>
        releaseSpool(spark, spool, spec, sink, dlqBus, nowEpochSec())
        ()
      }
      .start()

  /** Retry-consumer pass (trigger.go:256-302): take matured retry events for
    * this subscription (delivery time due, attempts below cap), re-deliver
    * through the same routing; exceeded attempts go to DLQ.
    */
  def processRetries(
      retryBatch: DataFrame,
      spec: Spec,
      sink: Sink,
      retryBus: Option[EventBus],
      dlqBus: Option[EventBus],
      nowEpochSec: Long): BatchResult = {
    val due = retryBatch.filter(
      col("attributes").getItem("xvanussubscriptionid") === spec.config.subscriptionId &&
        col("attributes").getItem("xvanusdeliverytime").cast("timestamp") <=
          timestamp_seconds(lit(nowEpochSec)) &&
        col("attributes").getItem("xvanusretryattempts").cast("int") <= spec.config.maxRetryAttempts)
    // clear BOTH horizons for the RETRY pass: every event here was already
    // admitted through ingest dedup once; two legitimately-distinct
    // deliveries of the same (source, id) — or of near-identical content —
    // (admitted more than a horizon apart) whose retries mature in the
    // same release would otherwise collapse to one — a silently LOST
    // event, since the spool evicts the bucket after the pass
    val retrySpec = spec.copy(config =
      spec.config.copy(dedupHorizon = None, neardupHorizon = None))
    processBatch(due, retrySpec, sink, retryBus, dlqBus, nowEpochSec)
  }
}
