package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the two spellings of the retry policy to each other: the Scala
  * functions (per-row sink paths) and the Column forms (whole-micro-batch
  * routing in SubscriptionRunner, oracle entries stream_retry_backoff /
  * stream_retryable). Reference curve: util.go:59-88.
  */
class BackoffSpec extends SparkSpec {
  import spark.implicits._

  test("delaySecondsCol equals delaySeconds for attempts 1..20") {
    val got = (1 to 20).toDF("attempt")
      .select(col("attempt"), Backoff.delaySecondsCol(col("attempt")).as("d"))
      .as[(Int, Long)].collect().toMap
    for (a <- 1 to 20)
      assert(got(a) === Backoff.delaySeconds(a), s"attempt $a")
  }

  test("delay curve hits the reference's published points") {
    assert(Backoff.delaySeconds(1) === 1L)
    assert(Backoff.delaySeconds(2) === 5L)
    assert(Backoff.delaySeconds(3) === 10L)
    assert(Backoff.delaySeconds(4) === 30L)
    assert(Backoff.delaySeconds(9) === 960L)
    assert(Backoff.delaySeconds(10) === 3600L)
    assert(Backoff.delaySeconds(100) === 3600L)
  }

  test("calDeliveryTime vectors, all ten attempts verbatim (trigger/util_test.go:54-77)") {
    val expect = Seq(1L, 5L, 10L, 30L, 60L, 120L, 240L, 480L, 960L, 3600L)
    expect.zipWithIndex.foreach { case (sec, i) =>
      assert(Backoff.delaySeconds(i + 1) === sec, s"attempt ${i + 1}")
    }
  }

  test("isShouldRetry vectors verbatim (trigger/util_test.go:41-52)") {
    assert(!Backoff.isRetryable(400))
    assert(!Backoff.isRetryable(403))
    assert(!Backoff.isRetryable(413))
    assert(Backoff.isRetryable(500))
  }

  test("isRetryableCol equals isRetryable for every code 100..700") {
    val got = (100 to 700).toDF("code")
      .select(col("code"), Backoff.isRetryableCol(col("code")).as("r"))
      .as[(Int, Boolean)].collect().toMap
    for (c <- 100 to 700)
      assert(got(c) === Backoff.isRetryable(c), s"code $c")
  }

  test("transform and ordered error codes are non-retryable; gateway 600/601 retry") {
    assert(!Backoff.isRetryable(Backoff.TransformErrorCode))
    assert(!Backoff.isRetryable(Backoff.OrderErrorCode))
    assert(Backoff.isRetryable(429))
    assert(Backoff.isRetryable(600))
    assert(Backoff.isRetryable(601))
    assert(!Backoff.isRetryable(404))
  }
}
