package graft.ext

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Sampling + corpus-assembly operators: split/mixture determinism, packing
  * invariants, approx-distinct accuracy.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("mixture keep rates land near their ppm targets and are deterministic") {
    val docs = (0L until 4000L).map(i => (i, if (i % 2 == 0) "en" else "xx"))
      .toDF("doc_id", "lang")
    val m = Sampling.mixture(docs, col("lang"), col("doc_id"),
      Map("en" -> 500000), defaultPpm = 100000)
    val kept = m.filter(col("keep")).groupBy(col("lang")).count()
      .as[(String, Long)].collect().toMap
    // 2000 docs per stratum; hash-uniform keeps ~50% / ~10%
    assert(math.abs(kept("en") - 1000L) < 100, s"en kept ${kept("en")}")
    assert(math.abs(kept("xx") - 200L) < 60, s"xx kept ${kept("xx")}")
    // determinism: same frame, different partitioning, same decisions
    val again = Sampling.mixture(docs.repartition(13), col("lang"), col("doc_id"),
      Map("en" -> 500000), defaultPpm = 100000)
      .filter(col("keep")).select("doc_id").as[Long].collect().toSet
    val first = m.filter(col("keep")).select("doc_id").as[Long].collect().toSet
    assert(again === first)
  }

  test("packSequences: offsets are a contiguous token layout per stream") {
    val docs = Tables.documents(spark, sf)
    val packed = TextAnalysis.packSequences(docs, budget = 512, nShards = 4)
      .select("lang", "pack_shard", "doc_id", "n_tokens", "start_offset", "seq_id",
        "offset_in_seq")
      .collect()
    val byStream = packed.groupBy(r => (r.getString(0), r.getLong(1)))
    for (((_, _), rows) <- byStream) {
      val sorted = rows.sortBy(_.getLong(2)) // doc_id order
      var expected = 0L
      for (r <- sorted) {
        assert(r.getAs[Long]("start_offset") === expected,
          s"gap/overlap at doc ${r.getLong(2)}")
        assert(r.getAs[Long]("seq_id") === expected / 512)
        assert(r.getAs[Long]("offset_in_seq") === expected % 512)
        expected += r.getAs[Long]("n_tokens")
      }
    }
    // total tokens conserved across the layout
    val total = packed.map(_.getAs[Long]("n_tokens")).sum
    val direct = docs.select(sum(size(split(col("text"), " ", -1)))).head.getLong(0)
    assert(total === direct)
  }

  test("reservoir keeps exactly k smallest-hash rows per stratum, deterministically") {
    import spark.implicits._
    val df = (1L to 200L).map(i => (i, if (i % 2 == 0) "a" else "b")).toDF("id", "s")
    val out = Sampling.reservoir(df, col("s"), col("id"), k = 7)
    val perStratum = out.groupBy("s").count().as[(String, Long)].collect().toMap
    assert(perStratum === Map("a" -> 7L, "b" -> 7L))
    // membership is the hash order's prefix: recompute independently
    val expect = df
      .withColumn("hv", Sampling.hash60(col("id")))
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("s"))
          .orderBy(col("hv"))))
      .filter(col("rn") <= 7).select("id").as[Long].collect().toSet
    assert(out.select("id").as[Long].collect().toSet === expect)
    // rerun is bit-identical (pure function of the key set)
    assert(Sampling.reservoir(df, col("s"), col("id"), 7)
      .select("id").as[Long].collect().toSet === expect)
  }

  test("leakage-safe split keeps every duplicate group on one side") {
    import spark.implicits._
    // synthetic groups: ids 0-4 one component, 10-11 another, 20 isolated
    val docs = Seq(0L, 1L, 2L, 3L, 4L, 10L, 11L, 20L).toDF("doc_id")
    val pairs = (Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)))
      .toDF("doc_a", "doc_b")
    val groups = Dedup.duplicateGroups(pairs)
    val out = Sampling.leakageSafeAssign(docs, groups)
      .select("doc_id", "split_key", "split")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byId = out.map(t => t._1 -> t).toMap
    // all members of a component share the keeper's key AND the split
    assert((0L to 4L).map(byId(_)._2).toSet === Set(0L))
    assert((0L to 4L).map(byId(_)._3).toSet.size === 1)
    assert(Seq(10L, 11L).map(byId(_)._2).toSet === Set(10L))
    assert(Seq(10L, 11L).map(byId(_)._3).toSet.size === 1)
    // ungrouped docs fall back to their own id
    assert(byId(20L)._2 === 20L)
    // split algebra identical to the plain assign on the same key
    val plain = Sampling.assign(Seq(0L, 10L, 20L).toDF("doc_id"), col("doc_id"))
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId(0L)._3 === plain(0L) && byId(10L)._3 === plain(10L) &&
      byId(20L)._3 === plain(20L))
    graft.GraftSession.sweepPersisted(spark)
  }

  test("approx_count_distinct stays within 5% of exact on events") {
    val r = Tables.events(spark, sf)
      .agg(approx_count_distinct(col("user_id")).as("a"),
        countDistinct(col("user_id")).as("e"))
      .head
    val (a, e) = (r.getLong(0), r.getLong(1))
    assert(math.abs(a - e).toDouble / e <= 0.05, s"approx $a vs exact $e")
  }
}
