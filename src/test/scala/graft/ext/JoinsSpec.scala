package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Hand-computed vectors for the temporal joins: inclusive as-of matching,
  * tie-breaks, no-match nulls, bucket-boundary containment.
  */
class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asOf picks the most recent right row at or before each left row") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00"), 5.0),
      (2L, 10L, ts("2024-01-01 12:00:00"), 6.0),
      (3L, 20L, ts("2024-01-01 09:00:00"), 7.0) // user 20 has no clicks
    ).toDF("event_id", "user_id", "ts", "value")
    val right = Seq(
      (100L, 10L, ts("2024-01-01 09:30:00"), 1.0),
      (101L, 10L, ts("2024-01-01 10:00:00"), 2.0), // ties left #1 exactly
      (102L, 10L, ts("2024-01-01 11:59:59"), 3.0),
      (103L, 30L, ts("2024-01-01 08:00:00"), 4.0) // other user only
    ).toDF("event_id", "user_id", "ts", "value")

    val out = Joins.asOf(left, right, "user_id", "ts", "ts", "event_id",
      Seq("event_id", "value"))
      .select("event_id", "asof_event_id", "asof_value")
      .orderBy("event_id").collect()

    // inclusive: the 10:00:00 click matches the 10:00:00 purchase
    assert(out(0) === Row(1L, 101L, 2.0))
    assert(out(1) === Row(2L, 102L, 3.0))
    assert(out(2) === Row(3L, null, null))
  }

  test("asOf breaks right-time ties to the greatest seq") {
    val left = Seq((1L, 5L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (200L, 5L, ts("2024-01-01 09:00:00"), 1.0),
      (201L, 5L, ts("2024-01-01 09:00:00"), 2.0) // same instant, higher id
    ).toDF("event_id", "user_id", "ts", "value")
    val out = Joins.asOf(left, right, "user_id", "ts", "ts", "event_id",
      Seq("event_id", "value")).select("asof_event_id", "asof_value").collect()
    assert(out(0) === Row(201L, 2.0))
  }

  test("asOf keeps every left row and all left columns") {
    val left = Seq((1L, 5L, ts("2024-01-01 10:00:00"), "keepme"))
      .toDF("event_id", "user_id", "ts", "tag")
    val right = Seq((9L, 6L, ts("2024-01-01 09:00:00")))
      .toDF("event_id", "user_id", "ts")
    val out = Joins.asOf(left, right, "user_id", "ts", "ts", "event_id",
      Seq("event_id"))
    assert(out.columns.toSet === Set("event_id", "user_id", "ts", "tag", "asof_event_id"))
    assert(out.select("tag").as[String].collect() === Array("keepme"))
  }

  test("rangeJoin: end-exclusive containment across bucket boundaries") {
    val intervals = Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      (2L, ts("2024-01-01 10:45:00"), ts("2024-01-01 10:50:00"))
    ).toDF("interval_id", "start", "end")
    val probe = Seq(
      (10L, ts("2024-01-01 10:00:00")), // == start 1: in
      (11L, ts("2024-01-01 10:46:00")), // in both
      (12L, ts("2024-01-01 11:00:00")), // == end 1: OUT (exclusive)
      (13L, ts("2024-01-01 09:59:59")), // before: out
      (14L, ts("2024-01-01 10:59:59"))  // last µs of 1: in
    ).toDF("event_id", "ts")
    // 10-minute buckets: interval 1 spans 7 buckets, interval 2 spans 2
    val out = Joins.rangeJoin(probe, "ts", intervals, bucketMicros = 10L * 60 * 1000000)
      .select("event_id", "interval_id").orderBy("event_id", "interval_id")
      .as[(Long, Long)].collect()
    assert(out === Array((10L, 1L), (11L, 1L), (11L, 2L), (14L, 1L)))
  }

  test("rangeJoin matches each pair exactly once (no bucket-overlap dupes)") {
    val intervals = Seq((1L, ts("2024-01-01 00:00:00"), ts("2024-01-03 00:00:00")))
      .toDF("interval_id", "start", "end")
    val probe = Seq((10L, ts("2024-01-02 05:00:00"))).toDF("event_id", "ts")
    // 1-hour buckets: the interval covers 48 buckets; the probe must still
    // match exactly once
    val out = Joins.rangeJoin(probe, "ts", intervals, bucketMicros = 3600L * 1000000)
    assert(out.count() === 1)
  }
}
