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

  /** Near-dup-aware split: assign by the document's duplicate GROUP, not
    * the document, so near-duplicate copies can never straddle train/test
    * — the eval-leakage failure mode of per-document hashing (a test doc
    * whose re-crawl sits in train is contamination the decontaminate pass
    * can't see, because it only guards the EVAL SET's n-grams, not the
    * held-out split). `groups` is [[Dedup.duplicateGroups]] output over
    * whatever candidate-pair policy the pipeline uses (LSH, SimHash,
    * embedding); docs in no group split by their own id. One broadcast-or
    * -shuffle join against the (small) grouped subset, then the same
    * scan-stage md5 arithmetic as [[assign]] — group membership changes
    * the KEY, never the split algebra, so membership stays stable under
    * re-partitioning and re-runs at any scale.
    */
  def leakageSafeAssign(docs: DataFrame, groups: DataFrame,
      trainPct: Int = 80, valPct: Int = 10): DataFrame =
    docs.join(groups.select(col("doc_id"), col("group_id")),
        Seq("doc_id"), "left")
      .withColumn("split_key", coalesce(col("group_id"), col("doc_id")))
      .drop("group_id")
      .withColumn("bucket", hashBucket(col("split_key")))
      .withColumn("split", splitLabel(col("split_key"), trainPct, valPct))

  /** Fine-grained uniform hash in [0, 1e6) — ppm resolution for mixture
    * rates (first 12 md5 hex chars = 48 bits, exact in 64-bit arithmetic
    * in any engine).
    */
  def hashPpm(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 12), 16, 10).cast("bigint") % 1000000L

  /** Domain-mixture downsampling: each stratum (e.g. source or lang) keeps
    * a target fraction of its documents, expressed in parts-per-million so
    * the decision is integer-exact. The keep decision is a pure function of
    * the row key — stable under re-partitioning and re-runs, and requires
    * NO shuffle and NO per-stratum counts: at 100 TB this is a scan-stage
    * predicate, unlike count-then-sample designs that need a pass per
    * stratum. Rates express the corpus mixing every pre-training pipeline
    * runs (downweight a dominant crawl, upweight a curated source);
    * upsampling (rate > 1e6) is out of scope — duplication is a different
    * operator with different dedup implications.
    */
  def mixture(df: DataFrame, stratum: Column, key: Column,
      ratesPpm: Map[String, Int], defaultPpm: Int): DataFrame = {
    val rate = ratesPpm.foldLeft(lit(defaultPpm)) { case (acc, (s, r)) =>
      when(stratum === s, lit(r)).otherwise(acc)
    }
    df.withColumn("rate_ppm", rate)
      .withColumn("keep", hashPpm(key) < col("rate_ppm"))
  }

  /** 60-bit uniform key hash (first 15 md5 hex chars — always positive in
    * signed 64-bit, exact in any engine).
    */
  def hash60(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("bigint")

  /** Deterministic k-per-stratum sample (the seeded form of reservoir
    * sampling): each stratum keeps its k rows with the smallest
    * [[hash60]](key) — a uniform without-replacement draw whose membership
    * is a pure function of the stratum's key SET (stable across runs,
    * partitionings, and engines; adding rows only perturbs membership by
    * the hash order, never reshuffles it wholesale like seeded random
    * sampling does). Selection runs through the bounded [[graft.functions.MinK]]
    * aggregate: map-side partials move ≤ k hashes per stratum per mapper,
    * so a dominant stratum never funnels through one task — the window
    * spelling (`row_number over stratum order by hash`) would sort the
    * whole stratum in one partition at 100 TB. The winner set
    * (#strata × k longs) then semi-joins back; AQE broadcasts it.
    */
  def reservoir(df: DataFrame, stratum: Column, key: Column, k: Int): DataFrame = {
    val tagged = df
      .withColumn("__rsv_s", stratum)
      .withColumn("__rsv_h", hash60(key))
    val winners = tagged
      .groupBy(col("__rsv_s"))
      .agg(graft.functions.MinK.longs(col("__rsv_h"), k).as("hs"))
      .select(col("__rsv_s"), explode(col("hs")).as("__rsv_h"))
    tagged.join(winners, Seq("__rsv_s", "__rsv_h"), "left_semi")
      .drop("__rsv_s", "__rsv_h")
  }
}
