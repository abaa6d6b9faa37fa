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

  def append(df: DataFrame): Unit =
    df.write.mode("append").parquet(path)

  /** Partitioned append — the 100 TB layout: one directory level per
    * partition column (e.g. event date, bus name), so time/bus-scoped
    * reads prune whole directories (PartitionFilters) before any file IO.
    * Readers are unchanged: `read`/`readStream` see partition columns as
    * ordinary columns.
    */
  def appendPartitioned(df: DataFrame, partitionCols: String*): Unit =
    df.write.mode("append").partitionBy(partitionCols: _*).parquet(path)

  /** First offset with stime >= ts per eventlog — QueryOffsetByTime
    * (block_seek.go:45-86). Row-group stats give the same pruning the vsb
    * index gave.
    */
  def offsetByTime(spark: SparkSession, ts: java.sql.Timestamp): DataFrame =
    read(spark).filter(col("time") >= lit(ts))
      .agg(min(col("sequence_number")).as("first_offset"))
}

object EventBus {
  def apply(path: String): EventBus = new EventBus(path)
}
