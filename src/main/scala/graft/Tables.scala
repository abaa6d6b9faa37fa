package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * Every query receives `sfDir` (e.g. /root/testdata/sf0.01) and reads
  * one parquet per table. Reads are plain `spark.read.parquet` so Catalyst
  * gets full pushdown (PushedFilters / ReadSchema pruning) — at 100 TB these
  * would be partitioned/bucketed tables behind the same names, and every
  * query below would keep working unchanged because nothing here assumes
  * single-file layout.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Redistribute a frame for expression-heavy per-row compute when the
    * source produced fewer splits than the session's parallelism. The
    * local test tables are single-row-group parquet files — one scan task —
    * which serializes md5/interpreter pipelines onto one core; at
    * production scale input files far exceed cores and this is a no-op.
    * Round-robin shuffle of the raw rows, so apply only AFTER
    * pushdown-eligible predicates and column pruning have had their chance.
    *
    * The probe is `inputFiles` — pure plan metadata (the file index the
    * scan already holds). The previous `df.rdd.getNumPartitions` probe
    * forced a Dataset→RDD conversion whose DeserializeToObject subtree was
    * planned eagerly per call and de-optimized AQE coalescing downstream.
    *
    * CONTRACT: call on scan-rooted frames (scan + narrow projections /
    * filters), which is every call site in this library — for those the
    * file count IS the split ceiling. A frame whose lineage already
    * contains a shuffle has cores-many partitions regardless of its file
    * count, so fanning it out again would only down-repartition; frames
    * with no file source at all (in-memory relations) are left untouched
    * for the same reason.
    */
  def fanOut(df: DataFrame): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    val files = df.inputFiles.length
    if (files > 0 && files < cores) df.repartition(cores) else df
  }

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  /** The events table's `ts` physical type has varied across driver testdata
    * generations, so normalize every variant to a µs TimestampType (LTZ):
    *
    *  - TIMESTAMP(NANOS): Spark's reader rejects it outright; sessions set
    *    spark.sql.legacy.parquet.nanosAsLong=true (see [[GraftSession]]) so
    *    it arrives as nanos-since-epoch LongType and is floored to µs here.
    *    Floor-truncation preserves every comparison against µs-aligned
    *    literals, so oracle predicates agree between Spark (µs) and DuckDB.
    *  - naive timestamp[us] (no UTC-adjustment flag): Spark reads
    *    TIMESTAMP_NTZ, which `unix_micros`, `row.getTimestamp` and the
    *    Timestamp encoders all reject. The session timezone is pinned UTC,
    *    so casting NTZ→LTZ reinterprets the same wall-clock instant DuckDB
    *    sees — values and oracle comparisons are unchanged.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
