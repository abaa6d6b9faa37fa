package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The LSH bucket-width cap: a hot bucket past `maxBucket` emits the
  * sorted chain instead of the O(width²) clique — same connected
  * components (the group-dedup consumer), linear pair count (the scale
  * property the 10× bench corpus's 770-doc bucket violated).
  */
class LshCapSpec extends SparkSpec {

  // 40 mutually-near-duplicate docs: one shared long base text with a tiny
  // per-doc tail, so every signature agrees on both bands → one bucket
  private def hotCorpus = {
    import spark.implicits._
    val base = Array.tabulate(200)(i => s"tok$i").mkString(" ")
    (0L until 40L).map(i => (i, s"$base tail$i")).toDF("doc_id", "text")
  }

  test("uncapped bucket emits the clique; capped emits the chain") {
    val sigs = Dedup.minhashSignatures(hotCorpus)
    val clique = Dedup.lshCandidatePairs(sigs, maxBucket = 256).count()
    assert(clique === 40L * 39L / 2,
      "below the cap the full candidate clique must be listed")
    // past the cap each bucket contributes width−1 chain pairs; with 2
    // bands × 2 bucketings the distinct union stays LINEAR in the corpus
    // (a second band's subset bucket can add a few non-consecutive links),
    // nowhere near the 780-pair clique
    val chain = Dedup.lshCandidatePairs(sigs, maxBucket = 16).count()
    assert(chain >= 39 && chain <= 2 * 40,
      s"chain mode must stay linear in bucket width, got $chain")
  }

  test("capped pairs produce the same duplicate groups as the clique") {
    val sigs = Dedup.minhashSignatures(hotCorpus)
    def groups(maxBucket: Int) =
      Dedup.duplicateGroups(Dedup.lshCandidatePairs(sigs, maxBucket))
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(groups(256) === groups(16),
      "chain degradation must preserve connected components exactly")
    val g = groups(16)
    assert(g.count(_._3) === 1 && g.forall(_._2 === 0L),
      "the hot bucket is ONE component labeled by its smallest id")
    graft.GraftSession.sweepPersisted(spark)
  }
}
