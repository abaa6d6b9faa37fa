package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Delivery rate limiting — the reference throttles each subscription's
  * sink calls with a token-bucket `ratelimit.Take()` before every send
  * (/root/reference/server/trigger/trigger.go:247, rate configured per
  * subscription in config.go). On Spark the budget is divided across the
  * micro-batch's delivery partitions and enforced per partition inside
  * `mapPartitions` ([[SubscriptionRunner]]'s leaky bucket: admit up to the
  * per-partition budget, then sleep to the next 1 s window).
  *
  * The wall-clock bucket is inherently untestable by a value oracle, but
  * its *admission plan* is deterministic: events leave a partition in
  * offset order, so the i-th event (1-based) of a partition is admitted in
  * window ⌊(i−1)/budget⌋. [[admissionPlan]] computes that layout
  * declaratively with the SAME budget arithmetic the runner uses
  * ([[ratePerPartition]]) — making window boundaries, per-window admitted
  * counts, and total smoothing latency oracle-checkable.
  */
object RateLimit {

  /** Per-partition admission budget: the subscription's events/sec divided
    * evenly over the delivery partitions, floored, minimum 1 (a rate below
    * the partition count must still make progress). Shared by the runner's
    * wall-clock bucket and the declarative [[admissionPlan]].
    */
  def ratePerPartition(ratePerSec: Int, numPartitions: Int): Int =
    if (ratePerSec <= 0) 0
    else math.max(1, ratePerSec / math.max(1, numPartitions))

  /** 1-based position `rn` within its partition → admission window index
    * (0 = the micro-batch's first second). budget ≤ 0 = unlimited.
    */
  def windowOf(rn: Column, budget: Int): Column =
    if (budget <= 0) lit(0L) else floor((rn - 1) / budget).cast("bigint")

  /** Per-(partition, window) admitted layout for a rate-limited batch:
    * each delivery partition (keyed by `partitionKey`, events in
    * `orderCol` order — the log stand-in, same shape as the send-batch
    * layout) admits `ratePerPartition` events per 1 s window. Returns one
    * row per (partition, window_sec) with the admitted count and the
    * first/last admitted offset — the granularity at which the wall-clock
    * bucket sleeps.
    *
    * Scale: the window function partitions by the delivery key (bounded
    * per-group state), and the aggregation is the same keys — one shuffle,
    * map-side partials on the count/min/max.
    */
  def admissionPlan(events: DataFrame, partitionKey: Column, orderCol: Column,
      ratePerSec: Int, numPartitions: Int): DataFrame = {
    val budget = ratePerPartition(ratePerSec, numPartitions)
    val w = Window.partitionBy(partitionKey).orderBy(orderCol)
    events
      .withColumn("window_sec", windowOf(row_number().over(w), budget))
      .groupBy(partitionKey.as("log"), col("window_sec"))
      .agg(count(lit(1)).as("n_admitted"),
        min(orderCol).as("first_offset"),
        max(orderCol).as("last_offset"))
  }
}
