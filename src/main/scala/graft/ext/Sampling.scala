package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines.
  *
  * Assignment is a pure function of the row key (md5 of the id → bucket
  * 0–99), so it is stable under re-partitioning, re-runs, and engine
  * changes — the property random sampling loses at 100 TB (a retry or a
  * different partitioning would reshuffle membership). No shuffle: the
  * split column is computed in the scan stage, and a filter on it is a
  * partition-local predicate.
  */
object Sampling {

  /** Bucket 0-99 from the key's md5 (engine-agnostic arithmetic). */
  def hashBucket(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("bigint") % 100

  /** train/val/test label: [0, trainPct) → train, [trainPct,
    * trainPct+valPct) → val, rest → test.
    */
  def splitLabel(key: Column, trainPct: Int, valPct: Int): Column = {
    val b = hashBucket(key)
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }

  def assign(df: DataFrame, key: Column, trainPct: Int = 80,
      valPct: Int = 10): DataFrame =
    df.withColumn("bucket", hashBucket(key))
      .withColumn("split", splitLabel(key, trainPct, valPct))
}
