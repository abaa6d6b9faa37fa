package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks as built-ins — as-of join and
  * interval (range) join — composed from existing operators per the
  * preference order in the project brief (compose > custom Expression >
  * custom SparkPlan). Both are single-shuffle designs:
  *
  *  - [[asOf]] is the union–sort–fill spelling: tag both sides, shuffle
  *    ONCE on the join key, and forward-fill the right side's payload with
  *    `last(ignoreNulls)` over a running window. No per-row probe, no
  *    range condition in a join — the sort inside each key partition does
  *    the "most recent at or before" work. At 100 TB the shuffle is keyed
  *    by (typically high-cardinality) entity id, so partitions stay small;
  *    a pathologically hot key would be salted upstream with
  *    [[Skew.saltKey]] the way the similarity top-k does.
  *  - [[rangeJoin]] buckets time: intervals explode to the fixed-width
  *    buckets they cover, probes compute their single bucket, and the join
  *    becomes an EQUI-join on bucket plus a residual containment
  *    predicate. A probe row meets an interval in exactly one bucket (the
  *    probe's own), so there is no post-join dedup. Catalyst broadcasts
  *    the interval side when it is small (the common case); with millions
  *    of intervals it degrades gracefully to a shuffled hash join on
  *    bucket — never a cartesian product (the naive spelling of a range
  *    join) and never a theta-only nested loop.
  */
object Joins {

  /** Epoch µs from a time column regardless of LTZ/NTZ flavor:
    * `unix_micros` is TIMESTAMP-only, and naive parquet reads surface
    * TIMESTAMP_NTZ. The cast is a no-op on TimestampType and reinterprets
    * NTZ wall-clock under the session timezone (pinned UTC) otherwise.
    */
  private def tsMicros(c: Column): Column =
    unix_micros(c.cast(org.apache.spark.sql.types.TimestampType))

  /** As-of join: for each left row, the most recent right row with the
    * same `key` and `right.time <= left.time` (inclusive). Ties on right
    * time break to the greatest `rightSeq`. Output = every left row (left
    * outer) plus the matched payload columns renamed `asof_<name>`
    * (null when no right row precedes the left row).
    *
    * `payload` columns must exist in `right`; null payload VALUES in a
    * matched right row are skipped by the per-column forward-fill (each
    * column independently takes its most recent non-null), which is the
    * standard fill-forward reading.
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightSeq: String,
      payload: Seq[String]): DataFrame = {
    val rightTyped = payload.map(c => c -> right.schema(c).dataType).toMap
    // left keeps all its columns; the payload slots start null and are
    // filled from preceding right rows inside the window
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__seq", lit(Long.MaxValue))
    val r = right.select(
      col(key) +: col(rightTime).as("__t") +:
        lit(0).as("__side") +: col(rightSeq).cast("long").as("__seq") +:
        payload.map(c => col(c).as(s"asof_$c")): _*)
    // unionByName(allowMissing) nulls the absent columns on each side;
    // one shuffle on `key`, then a running window per key
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t").asc, col("__side").asc, col("__seq").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(u) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"asof_$c"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1).drop("__t", "__side", "__seq")
  }

  /** Interval join: pair each probe row with every interval containing its
    * timestamp (`start <= ts < end`, end-exclusive). `intervals` must have
    * `start`/`end` timestamp columns; all its columns are carried through.
    *
    * `bucketMicros` is the time-bucket width — choose it near the typical
    * interval length so intervals explode to O(1) buckets each. The probe
    * side is NEVER exploded (it is the big side at 100 TB); each probe row
    * computes one bucket id and equi-joins.
    */
  def rangeJoin(
      probe: DataFrame,
      probeTime: String,
      intervals: DataFrame,
      bucketMicros: Long): DataFrame = {
    require(bucketMicros > 0, "bucketMicros must be positive")
    val ib = intervals.withColumn("__bucket",
      explode(sequence(
        floor(tsMicros(col("start")) / bucketMicros),
        // end-exclusive: the last covered bucket holds end - 1µs
        floor((tsMicros(col("end")) - 1) / bucketMicros))))
    val pb = probe.withColumn("__bucket",
      floor(tsMicros(col(probeTime)) / bucketMicros))
    pb.join(ib, Seq("__bucket"))
      .filter(col(probeTime) >= col("start") && col(probeTime) < col("end"))
      .drop("__bucket")
  }
}
