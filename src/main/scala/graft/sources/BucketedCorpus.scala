package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed corpus snapshots: the storage layout that makes REPEATED
  * key-joins over the same corpus shuffle-free.
  *
  * The cross-corpus dedup path ([[graft.ext.Dedup.dedupAgainst]]) joins
  * every incoming snapshot against the reference corpus by content digest.
  * Read as plain parquet, that join re-shuffles the reference corpus —
  * 100 TB through the network — on EVERY snapshot. Written once through
  * this layout (`bucketBy` on the digest, catalog-managed so the bucketing
  * metadata survives the session), both sides of the join arrive
  * pre-partitioned: Catalyst plans the digest join with NO Exchange on
  * either bucketed side, and per-bucket `sortBy` lets the sort-merge join
  * skip its sorts too. The shuffle is paid once at write time, amortized
  * over every later pass — the same trade the reference's segment layout
  * makes for offset scans (`BASELINE.md` read path), re-expressed as
  * Spark's native bucketing.
  *
  * Scale notes: bucket COUNT is the parallelism floor of every later scan
  * — size it to the target cluster (e.g. 4× executor count), not the test
  * corpus; both sides of a co-located join must use the SAME count (a
  * mismatch silently falls back to shuffling one side). Buckets are
  * assigned by `hash(key) pmod n`, so digest keys spread uniformly
  * regardless of corpus skew.
  */
object BucketedCorpus {

  /** Write `df` as a catalog-managed snapshot named `name`, parquet files
    * at `path`, bucketed AND per-bucket-sorted by `key` into `nBuckets`.
    * Overwrites an existing snapshot of the same name.
    */
  def writeSnapshot(df: DataFrame, name: String, path: String,
      key: String, nBuckets: Int): Unit =
    df.write.format("parquet")
      .option("path", path)
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(name)

  /** Read a snapshot back WITH its bucketing metadata (a raw
    * `spark.read.parquet(path)` would see the same rows but lose the
    * co-location guarantee — always read snapshots through the catalog).
    */
  def snapshot(spark: SparkSession, name: String): DataFrame =
    spark.table(name)
}
