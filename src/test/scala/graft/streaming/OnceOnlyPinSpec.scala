package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Regression pin for the r17 once-only-delivery fix (VERDICT r17 #2):
  * the side-effecting delivery `mapPartitions` must be materialized
  * exactly once and then become UNREACHABLE from every downstream plan.
  * The r17 bug: the sink-calling operator sat under a cached DataFrame
  * subtree, and AQE re-executed it on a replanned-stage cache miss — a
  * whole micro-batch delivered TWICE with zero task failures. The fix
  * pins outcomes as RDD blocks ([[SubscriptionRunner.pinOutcomes]]);
  * downstream frames ([[SubscriptionRunner.outcomesFrame]]) scan that
  * pinned RDD as their only leaf. This spec FAILS if the pin is ever swapped back to a
  * DataFrame `.cache()` — the downstream plan would then carry the
  * delivery subtree (an InMemoryRelation wrapping the mapPartitions),
  * re-executable under AQE.
  */
class OnceOnlyPinSpec extends SparkSpec {

  test("pinOutcomes materializes the side-effecting stage exactly once") {
    OnceOnlyPin.calls.set(0L)
    import spark.implicits._
    val ds = spark.range(100).repartition(8)
      .map { i =>
        OnceOnlyPin.calls.incrementAndGet()
        (i.longValue, if (i % 7 == 0) 500 else 0)
      }
    val (rdd, passed, delivered) = SubscriptionRunner.pinOutcomes(ds)
    try {
      assert(passed == 100L)
      assert(delivered == (0L until 100L).count(_ % 7 != 0))
      assert(OnceOnlyPin.calls.get == 100L,
        "the materializing aggregate must run the stage exactly once")
      // downstream consumers (the failure-routing actions) re-touch the
      // frame repeatedly — with the blocks pinned, no re-execution
      val frame = SubscriptionRunner.outcomesFrame(spark, rdd)
      assert(frame.filter(col("code") =!= 0).count() ==
        (0L until 100L).count(_ % 7 == 0))
      assert(frame.count() == 100L)
      assert(OnceOnlyPin.calls.get == 100L,
        "downstream actions must scan the pinned blocks, not re-deliver")
    } finally { rdd.unpersist(); () }
  }

  test("outcomesFrame scans the pinned RDD leaf with no delivery subtree beneath it") {
    import spark.implicits._
    val ds = spark.range(10).map(i => (i.longValue, 0))
    val (rdd, _, _) = SubscriptionRunner.pinOutcomes(ds)
    try {
      val frame = SubscriptionRunner.outcomesFrame(spark, rdd)
      val plan = frame.queryExecution.optimizedPlan
      // every leaf IS the pinned RDD (identity, not shape): nothing
      // upstream of the pin survives in the plan, so no optimizer/AQE
      // decision can ever re-execute the sink-calling stage
      val leaves = plan.collectLeaves()
      assert(leaves.nonEmpty && leaves.forall {
        // IDENTITY, not shape: a leaf over some OTHER RDD (e.g. a fresh
        // .rdd re-derivation that re-executes the delivery stage) must
        // fail — only the pinned RDD itself is a once-only scan
        case e: org.apache.spark.sql.execution.ExternalRDD[_] => e.rdd eq rdd
        case _ => false
      }, s"downstream frame must scan the pinned RDD leaf (by identity):\n$plan")
      // a `.cache()` regression would reintroduce the original subtree
      // (an InMemoryRelation wrapping the delivery mapPartitions)
      val forbidden = plan.collect {
        case n if n.nodeName.contains("MapPartitions") ||
          n.nodeName.contains("InMemoryRelation") => n.nodeName
      }
      assert(forbidden.isEmpty,
        s"delivery subtree reachable from the downstream plan: $forbidden\n$plan")
    } finally { rdd.unpersist(); () }
  }
}

/** JVM-singleton counter the executor-side closure resolves in local mode. */
object OnceOnlyPin {
  val calls = new java.util.concurrent.atomic.AtomicLong(0L)
}
