package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Direct tests for the bounded min-k aggregate: correctness against a
  * sort-based reference, null handling, the k >= group-size case, partial
  * merge across many input partitions (the map-side path the hot-block cap
  * depends on), and the ObjectHashAggregate plan shape.
  */
class MinKSpec extends SparkSpec {
  import spark.implicits._

  private def reference(vs: Seq[Long], k: Int): Seq[Long] =
    vs.sorted.take(k)

  test("min_k equals sorted take(k) per group") {
    val rows = for (g <- 0 until 7; i <- 0 until 50)
      yield (g, ((i * 2654435761L + g * 97) % 10000))
    val df = rows.toDF("g", "v").repartition(16)
    val got = df.groupBy($"g").agg(MinK.longs($"v", 5).as("ks"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    val want = rows.groupBy(_._1).map { case (g, vs) =>
      g -> reference(vs.map(_._2), 5)
    }
    assert(got === want)
  }

  test("groups smaller than k return every value, sorted") {
    val df = Seq((1, 9L), (1, 3L), (2, 7L)).toDF("g", "v")
    val got = df.groupBy($"g").agg(MinK.longs($"v", 100).as("ks"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(got === Map(1 -> Seq(3L, 9L), 2 -> Seq(7L)))
  }

  test("nulls are skipped; all-null group yields empty array") {
    val df = Seq((1, Some(5L)), (1, None), (2, None))
      .toDF("g", "v")
    val got = df.groupBy($"g").agg(MinK.longs($"v", 3).as("ks"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(got === Map(1 -> Seq(5L), 2 -> Seq.empty[Long]))
  }

  test("result is identical across 1-partition and 32-partition layouts") {
    val vs = (0 until 2000).map(i => (i * 48271L) % 100000)
    val one = vs.toDF("v").coalesce(1)
      .agg(MinK.longs($"v", 17)).as[Seq[Long]].head()
    val many = vs.toDF("v").repartition(32)
      .agg(MinK.longs($"v", 17)).as[Seq[Long]].head()
    assert(one === reference(vs, 17))
    assert(many === one)
  }

  test("plan aggregates via ObjectHashAggregate with a partial stage") {
    val df = Seq((1, 2L)).toDF("g", "v").repartition(4)
      .groupBy($"g").agg(MinK.longs($"v", 3))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"unexpected plan:\n$plan")
    assert(plan.contains("partial_min_k"), s"no map-side partial:\n$plan")
  }
}
