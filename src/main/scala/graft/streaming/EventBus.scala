package graft.streaming

import graft.model.EventView
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-backed eventbus: the batch/streaming stand-in for the reference's
  * partitioned append-only log (SURVEY §1.2).
  *
  * An eventbus is a directory of parquet; eventlogs (partitions) are Spark's
  * input splits; the offset is the `sequence_number` column; `stime` is the
  * storage-time column that QueryOffsetByTime seeks on
  * (client/pkg/api/client.go:47-54). Structured Streaming's checkpoint
  * replaces the reference's consumer-offset skiplist
  * (server/trigger/offset/offset.go:102-139) — contiguous-prefix commit is
  * native there.
  *
  * At 100 TB this directory becomes a date/bus-partitioned table; everything
  * below reads through the same two entry points and inherits partition
  * pruning.
  */
class EventBus(val path: String) extends Serializable {

  def read(spark: SparkSession): DataFrame = spark.read.parquet(path)

  def readStream(spark: SparkSession): DataFrame =
    spark.readStream.schema(EventView.schema).parquet(path)

  /** Throttled stream — the reference's pull batching + backpressure knobs
    * (PullBatchSize per pull, trigger.go:569; MaxUACKNumber blocking the
    * reader, offset/offset.go:56-72) map to bounding what each micro-batch
    * admits: in-flight work per trigger is capped, and offsets only commit
    * when the batch completes.
    */
  def readStreamThrottled(spark: SparkSession, maxFilesPerTrigger: Int): DataFrame =
    spark.readStream.schema(EventView.schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(path)

  /** Append a frame to the bus.
    *
    * PRECONDITION — monotone sequence numbers: every appended row must
    * carry a `sequence_number` strictly greater than everything already on
    * the bus (the reference's log enforces this by construction — offsets
    * are assigned at append, block/block.go). Consumers lean on it: a
    * [[SubscriptionRunner.SharedGroup]] attach boundary assumes a row
    * appended later never sorts at-or-below the on-disk high-water mark
    * (a violating row would be excluded from both the catch-up read and
    * the guarded stream view — silently lost for the attached member),
    * and [[IngestDedup]]/[[StreamNearDedup]] treat sequence order as
    * arrival order. [[Publisher.publish]] (the write path that assigns
    * sequence numbers) maintains it; hand-rolled appends must too.
    *
    * Same-JVM appends to one bus path are serialized: the Hadoop
    * FileOutputCommitter stages every in-flight write of a directory under
    * the SAME `_temporary` subdirectory, so two concurrent appends can
    * delete each other's staging on commit (lost files). One driver can
    * legitimately race two appends here — a [[SubscriptionRunner]]
    * shared-batch routing and a concurrent [[SubscriptionRunner.SharedGroup.attach]]
    * catch-up both append to the same retry/DLQ bus — hence the per-path
    * lock. Cross-driver concurrency needs a unique-staging committer
    * (cloud committers do this); out of scope for the local stand-in.
    */
  def append(df: DataFrame): Unit =
    EventBus.appendLock(path).synchronized {
      df.write.mode("append").parquet(path)
    }

  /** Partitioned append — the 100 TB layout: one directory level per
    * partition column (e.g. event date, bus name), so time/bus-scoped
    * reads prune whole directories (PartitionFilters) before any file IO.
    * Readers are unchanged: `read`/`readStream` see partition columns as
    * ordinary columns. The [[append]] monotonicity precondition applies
    * here too; with a date partition column, monotone sequences imply the
    * bus's append invariant — the max sequence always lives in the newest
    * date partition ([[maxSequenceFrame]] leans on this).
    */
  def appendPartitioned(df: DataFrame, partitionCols: String*): Unit =
    EventBus.appendLock(path).synchronized {
      df.write.mode("append").partitionBy(partitionCols: _*).parquet(path)
    }

  /** First offset with stime >= ts per eventlog — QueryOffsetByTime
    * (block_seek.go:45-86). Row-group stats give the same pruning the vsb
    * index gave.
    */
  def offsetByTime(spark: SparkSession, ts: java.sql.Timestamp): DataFrame =
    read(spark).filter(col("time") >= lit(ts))
      .agg(min(col("sequence_number")).as("first_offset"))

  /** The on-disk high-water mark `max(sequence_number)` as a 1-row frame —
    * the [[SubscriptionRunner.SharedGroup.attach]] boundary probe.
    *
    * Bounded at scale: on a date-partitioned bus (`date=YYYY-MM-DD`
    * directories — the [[appendPartitioned]] layout) only the newest date
    * partition is read, as a real partition filter (PartitionFilters in
    * the scan, pinned by PlanSpec), because the append invariant puts the
    * max sequence there — a full-listing metadata scan per attach would
    * be O(bus size) at 100 TB. A flat bus falls back to the whole-dir
    * footer-stats aggregate. Only ISO-date-shaped partition values are
    * trusted for the pruning (lexicographic max == newest day); any other
    * partition scheme (e.g. bus-name) reads everything, staying correct.
    */
  def maxSequenceFrame(spark: SparkSession): DataFrame = {
    val agg0 = (df: DataFrame) => df.agg(max(col("sequence_number")))
    val p = new org.apache.hadoop.fs.Path(path)
    val newest: Option[(String, String)] =
      try {
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val dirs = fs.listStatus(p).filter(_.isDirectory)
          .map(_.getPath.getName).filter(_.contains("="))
        val kvs = dirs.map { n => val i = n.indexOf('='); (n.take(i), n.drop(i + 1)) }
        val keys = kvs.map(_._1).distinct
        val isoDate = "\\d{4}-\\d{2}-\\d{2}".r
        if (keys.length == 1 && kvs.forall(kv => isoDate.matches(kv._2)))
          kvs.sortBy(_._2).lastOption
        else None
      } catch { case _: java.io.IOException => None }
    newest match {
      case Some((k, v)) => agg0(read(spark).filter(col(k) === lit(v)))
      case None => agg0(read(spark))
    }
  }
}

object EventBus {
  def apply(path: String): EventBus = new EventBus(path)

  // one lock object per bus path (see [[EventBus.append]]); paths are
  // few and long-lived, so the map never needs eviction. Keyed by the
  // NORMALIZED absolute path — two EventBus instances spelling the same
  // directory differently ("/data/bus" vs "/data/bus/" vs a relative
  // form) must share one lock, or the committer race reopens.
  private val appendLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private[streaming] def appendLock(path: String): Object = {
    val key =
      try java.nio.file.Paths.get(path).toAbsolutePath.normalize.toString
      catch { case _: java.nio.file.InvalidPathException => path }
    appendLocks.computeIfAbsent(key, _ => new Object)
  }
}
