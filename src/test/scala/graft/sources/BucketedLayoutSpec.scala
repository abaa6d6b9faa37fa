package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The bucketed snapshot layout's whole value claim is a PLAN property:
  * a digest join between two snapshots written through
  * [[BucketedCorpus.writeSnapshot]] must carry NO shuffle exchange on
  * either bucketed side (the write-time shuffle is the only one, amortized
  * over every later pass), while a plain-parquet read of the same files
  * must NOT be trusted as bucketed. Row parity against the unbucketed join
  * pins that layout never changes answers.
  */
class BucketedLayoutSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    (0L until 600L).map(i => (i, s"doc text ${i % 97}")).toDF("doc_id", "text")
      .select(col("doc_id"), md5(col("text")).as("digest"))
  }

  private val tmp = java.nio.file.Files
    .createTempDirectory("graft_bucket_spec_").toString

  test("bucketed snapshot join plans with zero shuffle exchanges") {
    BucketedCorpus.writeSnapshot(docs.filter(col("doc_id") % 3 === 0),
      "spec_ref_snap", s"$tmp/ref", "digest", 4)
    BucketedCorpus.writeSnapshot(docs.filter(col("doc_id") % 3 =!= 0),
      "spec_new_snap", s"$tmp/new", "digest", 4)
    // broadcast would hide the co-location; at 100 TB neither side is small
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val ref = BucketedCorpus.snapshot(spark, "spec_ref_snap")
        .select(col("digest")).distinct().withColumn("exact_dup", lit(true))
      val joined = BucketedCorpus.snapshot(spark, "spec_new_snap")
        .join(ref, Seq("digest"), "left")
        .select(col("doc_id"),
          coalesce(col("exact_dup"), lit(false)).as("exact_dup"))
      val physical = joined.queryExecution.executedPlan.toString
      assert(!physical.contains("Exchange"),
        s"bucketed digest join must be shuffle-free, got:\n$physical")
      // parity: layout must not change the answer
      val expect = docs.filter(col("doc_id") % 3 =!= 0).as("n")
        .join(docs.filter(col("doc_id") % 3 === 0).select("digest").distinct()
          .withColumn("exact_dup", lit(true)), Seq("digest"), "left")
        .select(col("doc_id"),
          coalesce(col("exact_dup"), lit(false)).as("exact_dup"))
        .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSet
      val got = joined.collect()
        .map(r => (r.getLong(0), r.getBoolean(1))).toSet
      assert(got === expect)
    }
  }

  test("raw parquet read of the same files loses the bucketing guarantee") {
    // the doc contract of BucketedCorpus.snapshot: reading the snapshot
    // files WITHOUT the catalog re-shuffles — prove the guard is real
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val rawRef = spark.read.parquet(s"$tmp/ref")
        .select(col("digest")).distinct()
      val rawNew = spark.read.parquet(s"$tmp/new")
      val physical = rawNew.join(rawRef, Seq("digest"))
        .queryExecution.executedPlan.toString
      assert(physical.contains("Exchange"),
        "plain-parquet reads cannot be co-located; doc claim would be stale")
    }
  }
}
