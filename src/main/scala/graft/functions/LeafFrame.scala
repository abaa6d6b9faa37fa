// In the Spark SQL namespace ON PURPOSE (like the expression kernels in
// this directory): LogicalRDD and Dataset.ofRows are private[sql], and the
// leaf re-rooting below is exactly the construction Dataset.checkpoint and
// the repo's own label-propagation loop already rely on — re-expressed so
// the pinned-frame lifecycle ([[graft.GraftCache]]) can use it without the
// Row-roundtrip `createDataFrame(df.rdd, schema)` pays.
package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Statistics
import org.apache.spark.sql.classic.{Dataset, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Compact-leaf re-rooting for an already-persisted frame.
  *
  * A pinned frame's consumers execute against the cache, but their LOGICAL
  * plans still embed the pin's entire lineage subtree — so every consumer
  * action (and every AQE re-optimization round inside it) re-walks, re-
  * analyzes and cache-lookup-compares the full tree. For the deep operator
  * chains (curation: clean→gate→dedup→LSH→components→passages→decontaminate)
  * that driver-side re-planning dominates warm wall time: StageProbe
  * measured pipeline_curate_keep_best at 6.0 s wall with only 2.6 s summed
  * executor time — the other ~3.4 s was plan bookkeeping across 45 jobs.
  *
  * [[LeafFrame.apply]] rebuilds the frame as a single [[LogicalRDD]] leaf
  * over the pinned plan's own InternalRow RDD (`queryExecution.toRdd` — the
  * InMemoryTableScan RDD, NO Row conversion), carrying the materialized
  * cache's Statistics so join-strategy decisions (broadcast thresholds) see
  * the same sizes the InMemoryRelation reported. Downstream plans become
  * O(1)-deep at the pin boundary.
  *
  * Eviction safety is preserved exactly as documented on GraftCache: the
  * leaf's RDD is the cached-scan RDD, which on missing/unpersisted blocks
  * recomputes per-partition from the captured physical plan — lineage is
  * kept, nothing re-persists (unpersist clears the storage level on the
  * buffer RDD object the leaf references), so a post-eviction consumer
  * silently recomputes, never fails and never leaks blocks.
  */
object LeafFrame {

  /** Re-root `df` (already persisted AND materialized) at a LogicalRDD
    * leaf carrying `stats`. Must be called after materialization so
    * `queryExecution.optimizedPlan` is the built InMemoryRelation and its
    * statistics are the measured ones, not estimates.
    *
    * The leaf deliberately carries NO outputPartitioning/outputOrdering
    * (ADVICE r21 asked why): none of the current pin consumers keys on a
    * pin's own shuffle layout — the curation/dedup pins are keyed by
    * content-hash or semi-join outputs while every consumer joins on
    * doc_id/vec_id, and the union-find labels pin is a single coalesced
    * partition — so threading the physical partitioning through (the
    * Dataset.checkpoint attribute-remap dance) would today preserve
    * information nothing reads. Revisit if a consumer ever
    * joins/aggregates on the exact key a pin was exchanged by.
    */
  def apply(df: DataFrame, stats: Option[Statistics]): DataFrame = {
    val qe = df.queryExecution
    val session = df.sparkSession.asInstanceOf[SparkSession]
    Dataset.ofRows(session,
      LogicalRDD(qe.analyzed.output, qe.toRdd)(session, stats, None))
  }

  /** The materialized plan's statistics (accumulator-backed for a built
    * InMemoryRelation; an estimate before materialization — callers
    * materialize first).
    */
  def statsOf(df: DataFrame): Statistics = df.queryExecution.optimizedPlan.stats

  /** The leaf's RDD id when `df` is a [[LogicalRDD]]-rooted frame — the
    * identity [[graft.GraftCache]] keys its leaf→source map by. None for
    * ordinary frames.
    */
  def leafRddId(df: DataFrame): Option[Int] =
    df.queryExecution.analyzed match {
      case l: LogicalRDD => Some(l.rdd.id)
      case _ => None
    }
}
