package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Due-time-bucketed delay spool — the write-once, declarative form of the
  * reference's timing-wheel buckets
  * (/root/reference/server/timer/timingwheel/bucket.go:112-136: an event
  * sits in its expiry bucket until the wheel reaches it, written once).
  *
  * Layout: one partition directory per `deliver_bucket =
  * floor(deliverAt / tickSeconds)`. An event is appended ONCE into its
  * bucket; nothing rewrites pending events per trigger (the round-2 design
  * re-appended every immature event on every trigger — O(interval⁻¹ ·
  * backoff) write amplification that this layout exists to kill). A
  * release pass lists fully-matured buckets (every event in a bucket
  * `b < now/tick` has `deliverAt < now`), reads ONLY those directories
  * (partition-pruned by construction — the pending buckets are never
  * opened), processes them, and deletes the directories — the bucket
  * expiry. Release precision is the tick, exactly the wheel's `tick`
  * config (timingwheel/config.go:21-28).
  *
  * Crash between process and evict re-processes the bucket: at-least-once,
  * same as the reference's wheel.
  *
  * One spool per subscription (mirroring the reference's per-subscription
  * retry state): eviction is bucket-granular, so co-spooling subscriptions
  * would drop other subscriptions' rows at release.
  */
final class BucketedSpool(path: String, val tickSeconds: Long)
  extends EventBus(path) {

  private val BucketCol = "deliver_bucket"

  def bucketOf(epochSec: Long): Long = Math.floorDiv(epochSec, tickSeconds)

  /** Append events into their due-time buckets — the ONE write an event
    * gets until it matures. Events without a delivery time land in bucket
    * 0 (immediately matured).
    */
  override def append(df: DataFrame): Unit = {
    val deliverAt = col("attributes").getItem("xvanusdeliverytime").cast("timestamp")
    val bucket = floor(coalesce(unix_timestamp(deliverAt), lit(0L)) / tickSeconds)
      .cast("long")
    // same per-path serialization as EventBus.append (the override would
    // otherwise dodge it): a shared group's catch-up and a live batch can
    // both route failures into this spool concurrently, and the shared
    // _temporary staging loses files under concurrent same-dir commits
    EventBus.appendLock(path).synchronized {
      // REBALANCE keyed on the bucket (guide §6, optimization r21): the
      // partitionBy write otherwise opens one file per (input partition ×
      // bucket) — the AQE-managed exchange clusters each bucket's rows so
      // a bucket lands as one advisory-sized file set, the hash-
      // distribution write mode of the table formats
      df.withColumn(BucketCol, bucket)
        .hint("rebalance", BucketCol)
        .write.mode("append").partitionBy(BucketCol).parquet(path)
    }
  }

  /** Buckets strictly before the current one — every event inside is due. */
  def maturedBuckets(spark: SparkSession, nowEpochSec: Long): Seq[Long] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith(s"$BucketCol="))
      .map(_.stripPrefix(s"$BucketCol=").toLong)
      .filter(_ < bucketOf(nowEpochSec))
      .sorted
  }

  /** Read exactly the given buckets' directories (never opens pending
    * buckets), with the partition column dropped back out.
    */
  def readBuckets(spark: SparkSession, buckets: Seq[Long]): DataFrame =
    spark.read.option("basePath", path)
      .parquet(buckets.map(b => s"$path/$BucketCol=$b"): _*)
      .drop(BucketCol)

  /** Delete released bucket directories — the wheel's bucket expiry. */
  def evict(spark: SparkSession, buckets: Seq[Long]): Unit = {
    val base = new Path(path)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    buckets.foreach { b =>
      fs.delete(new Path(base, s"$BucketCol=$b"), true); ()
    }
  }

  /** Data files currently in the spool (recursive; ignores markers) — the
    * write-amplification observable the write-once spec bounds.
    */
  def dataFileCount(spark: SparkSession): Int = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0
    else {
      val it = fs.listFiles(p, true)
      var n = 0
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) n += 1
      }
      n
    }
  }
}

object BucketedSpool {
  def apply(path: String, tickSeconds: Long = 60L): BucketedSpool =
    new BucketedSpool(path, tickSeconds)
}
