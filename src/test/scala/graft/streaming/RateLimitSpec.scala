package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RateLimitSpec extends SparkSpec {
  import spark.implicits._

  test("ratePerPartition matches the runner's budget arithmetic") {
    assert(RateLimit.ratePerPartition(0, 32) === 0)      // unlimited
    assert(RateLimit.ratePerPartition(-5, 32) === 0)
    assert(RateLimit.ratePerPartition(320, 32) === 10)   // even split
    assert(RateLimit.ratePerPartition(100, 32) === 3)    // floored
    assert(RateLimit.ratePerPartition(5, 32) === 1)      // min 1: progress
    assert(RateLimit.ratePerPartition(7, 0) === 7)       // degenerate partitions
  }

  test("admissionPlan lays out budget-sized windows in offset order") {
    // two logs: "a" with 25 events, "b" with 9; rate 40/sec over 4
    // partitions -> budget 10/partition/sec
    val events = ((1 to 25).map(i => ("a", i.toLong)) ++
      (1 to 9).map(i => ("b", 100L + i))).toDF("event_type", "event_id")
    val plan = RateLimit.admissionPlan(events, col("event_type"),
      col("event_id"), ratePerSec = 40, numPartitions = 4)
      .orderBy("log", "window_sec")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(plan === Array(
      ("a", 0L, 10L, 1L, 10L),    // full window
      ("a", 1L, 10L, 11L, 20L),   // full window
      ("a", 2L, 5L, 21L, 25L),    // remainder
      ("b", 0L, 9L, 101L, 109L))) // under budget: single window
  }

  test("unlimited rate admits everything in window 0") {
    val events = (1 to 50).map(i => ("a", i.toLong)).toDF("event_type", "event_id")
    val plan = RateLimit.admissionPlan(events, col("event_type"),
      col("event_id"), ratePerSec = 0, numPartitions = 4)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(plan === Array(("a", 0L, 50L, 1L, 50L)))
  }
}
