package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The distributed min-label propagation branch of
  * [[Dedup.duplicateGroups]] (the one that runs past the union-find edge
  * threshold — i.e. the branch that runs at 100 TB) must keep its Catalyst
  * plan O(1) deep across iterations: each iteration re-roots at an RDD
  * leaf, so a long-converging component can't grow analysis cost per
  * round. The threshold is parameterized precisely so this spec can force
  * the loop branch on a small graph.
  */
class DedupLoopLineageSpec extends SparkSpec {

  // a path graph 0-1-2-...-D: min-label propagation moves the 0 label one
  // hop per iteration, so convergence takes D iterations — the worst case
  // per edge count, which is what would blow up an unbounded plan
  private val D = 12
  private def pathPairs = {
    import spark.implicits._
    (0L until D.toLong).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
  }

  test("loop branch converges to one component with bounded plan size") {
    // unionFindMaxEdges = 0 forces every graph through the loop branch
    val result = Dedup.duplicateGroups(pathPairs, unionFindMaxEdges = 0L)
    // plan-size bound FIRST (before any action): D iterations without
    // re-rooting nest D join chains (hundreds of nodes); with the RDD-leaf
    // re-root the analyzed tree is a handful of nodes over one leaf
    var nNodes = 0
    result.queryExecution.analyzed.foreach(_ => nNodes += 1)
    assert(nNodes < 25,
      s"analyzed plan must stay O(1) across $D iterations, got $nNodes nodes")
    val rows = result.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.length === D + 1)
    assert(rows.forall(_._2 == 0L), "path graph is ONE component labeled 0")
    assert(rows.count(_._3) === 1, "exactly one keeper (doc 0)")
    graft.GraftSession.sweepPersisted(spark)
  }

  test("loop branch matches the union-find branch on a multi-component graph") {
    import spark.implicits._
    // two chains + an isolated edge: components {0..4}, {10..13}, {20,21}
    val pairs = (
      (0L until 4L).map(i => (i, i + 1)) ++
      (10L until 13L).map(i => (i, i + 1)) ++
      Seq((20L, 21L))
    ).toDF("doc_a", "doc_b")
    def run(threshold: Long) =
      Dedup.duplicateGroups(pairs, threshold).orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(run(0L) === run(2000000L),
      "distributed propagation and union-find must agree exactly")
    graft.GraftSession.sweepPersisted(spark)
  }
}
