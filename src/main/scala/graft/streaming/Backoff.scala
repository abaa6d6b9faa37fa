package graft.streaming

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Retry/backoff policy, reproduced from
  * /root/reference/server/trigger/trigger/util.go:59-88.
  */
object Backoff {

  /** calDeliveryTime curve: attempt 1 → 1 s; 2–3 → 5(n−1) s;
    * 4–9 → 30·2^(n−4) s; ≥10 → 3600 s.
    */
  def delaySeconds(attempt: Int): Long =
    if (attempt <= 1) 1L
    else if (attempt <= 3) 5L * (attempt - 1)
    else if (attempt <= 9) 30L * (1L << (attempt - 4))
    else 3600L

  /** Same curve as a Column (codegen'd; used when stamping a whole failed
    * micro-batch in one pass).
    */
  def delaySecondsCol(attempt: Column): Column =
    when(attempt <= 1, 1L)
      .when(attempt <= 3, lit(5L) * (attempt - 1))
      .when(attempt <= 9, lit(30L) * pow(lit(2), attempt - 4).cast("long"))
      .otherwise(3600L)

  /** Retryable decision (util.go:59-73): 429 and 5xx/network retry; other
    * 4xx and transform errors do not.
    */
  def isRetryable(statusCode: Int): Boolean =
    statusCode == 429 || statusCode >= 500

  /** Same decision as a Column — the spelling the delivery path uses to
    * route a whole failed micro-batch in one pass (SubscriptionRunner's
    * retry/DLQ split). Covers the gateway's 600/601 timeout codes (≥ 500)
    * and leaves transform (460) / ordered (461) failures non-retryable.
    */
  def isRetryableCol(code: Column): Column = code === 429 || code >= 500

  /** Transform errors are non-retryable (util.go:59-63). */
  val TransformErrorCode = 460
  /** Ordered-mode failures skip retry entirely (trigger.go:428-431). */
  val OrderErrorCode = 461
}
