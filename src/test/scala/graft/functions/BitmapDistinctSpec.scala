package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Direct tests for the exact bounded-domain distinct-count aggregate:
  * parity with count(DISTINCT), null handling, partial merges across many
  * partitions, the serialize-trim path (a group whose observed max shrinks
  * the shipped bitmap), domain-violation rejection, and the
  * ObjectHashAggregate plan shape that keeps it single-shuffle.
  */
class BitmapDistinctSpec extends SparkSpec {
  import spark.implicits._

  test("distinct_bounded equals count(DISTINCT) per group") {
    val rows = for (g <- 0 until 9; i <- 0 until 200)
      yield (g, (i * 2654435761L + g * 97) % 5000)
    val df = rows.toDF("g", "v").repartition(16)
    val got = df.groupBy($"g")
      .agg(BitmapDistinct.longs($"v", 5000).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val want = rows.groupBy(_._1).map { case (g, vs) =>
      g -> vs.map(_._2).distinct.size.toLong
    }
    assert(got === want)
  }

  test("nulls are skipped; all-null group counts zero") {
    val df = Seq((1, Some(5L)), (1, Some(5L)), (1, None), (2, None))
      .toDF("g", "v")
    val got = df.groupBy($"g")
      .agg(BitmapDistinct.longs($"v", 64).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got === Map(1 -> 1L, 2 -> 0L))
  }

  test("identical across 1-partition and 32-partition layouts (merge path)") {
    val vs = (0 until 4000).map(i => (i * 48271L) % 1000)
    val one = vs.toDF("v").coalesce(1)
      .agg(BitmapDistinct.longs($"v", 1000)).as[Long].head()
    val many = vs.toDF("v").repartition(32)
      .agg(BitmapDistinct.longs($"v", 1000)).as[Long].head()
    assert(one === 1000L)
    assert(many === one)
  }

  test("sparse high values count exactly (growth + trailing-zero trim)") {
    // one low value plus values near the top of a wide domain: growth is
    // driven by observed max, and the merged result is still exact
    val dom = 1L << 21
    val vs = Seq(0L, dom - 1, dom - 2, dom - 1, 63L, 64L, 65L)
    val got = vs.toDF("v").repartition(7)
      .agg(BitmapDistinct.longs($"v", dom)).as[Long].head()
    assert(got === 6L)
  }

  test("out-of-domain value fails the job (caller contract)") {
    val ex = intercept[Exception] {
      Seq(5L, 64L).toDF("v")
        .agg(BitmapDistinct.longs($"v", 64)).as[Long].head()
    }
    def causes(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: causes(x.getCause))
    assert(causes(ex).exists(_.getMessage != null) &&
      causes(ex).exists(c =>
        Option(c.getMessage).exists(_.contains("outside domain"))),
      s"unexpected failure: $ex")
  }

  test("plan aggregates via ObjectHashAggregate with a partial stage") {
    val df = Seq((1, 2L)).toDF("g", "v").repartition(4)
      .groupBy($"g").agg(BitmapDistinct.longs($"v", 16))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"unexpected plan:\n$plan")
    assert(plan.contains("partial_distinct_bounded"), s"no map-side partial:\n$plan")
  }

  test("keyframe rollup shape: two bitmap distincts in one single-shuffle agg") {
    // the pair-rollup form used by Multimodal.keyframeClipDedup: both
    // sides counted in the same aggregate, exactly one exchange
    val pairs = Seq(
      (10L, 20L, (10L << 21) + 1, (20L << 21) + 3),
      (10L, 20L, (10L << 21) + 1, (20L << 21) + 4),
      (10L, 20L, (10L << 21) + 2, (20L << 21) + 3))
      .toDF("clip_a", "clip_b", "id_a", "id_b").repartition(4)
    val dom = 1L << 21
    val agg = pairs.groupBy($"clip_a", $"clip_b")
      .agg(least(
        BitmapDistinct.longs($"id_a".bitwiseAND(lit(dom - 1)), dom),
        BitmapDistinct.longs($"id_b".bitwiseAND(lit(dom - 1)), dom)).as("n_shared"))
    val rows = agg.collect()
    assert(rows.length === 1 && rows.head.getLong(2) === 2L)
    // count only the aggregation's own exchange in the executed final plan
    // (toString appends the pre-AQE "Initial Plan" section, and the input
    // repartition contributes its own round-robin exchange)
    val finalPlan = agg.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val aggExchanges = finalPlan.linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    assert(aggExchanges === 1,
      s"expected exactly one agg exchange:\n$finalPlan")
  }
}
