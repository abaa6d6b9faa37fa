package graft.ext

import graft.SparkSpec

/** The per-partition union-find contraction that now fronts BOTH branches
  * of [[Dedup.duplicateGroups]] must be connectivity-preserving on exactly
  * the graphs it exists for: clique-heavy candidate sets spread across many
  * partitions, with duplicate edges landing in different partitions. The
  * reference answer is a driver-side union-find over the raw pair list —
  * independent code, no shared logic with the operator under test.
  */
class DedupContractionSpec extends SparkSpec {

  /** Driver-side reference: min-label connected components over raw pairs. */
  private def referenceComponents(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    parent.keys.map(id => id -> find(id)).toMap
  }

  /** Clique-heavy multi-component graph with duplicate edges, shuffled so
    * partitions see interleaved fragments of different components — the
    * shape LSH/hamming candidate pairs take on a degenerate corpus.
    */
  private def messyPairs: Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(13)
    val cliques = Seq(0L until 9L, 100L until 140L, 200L until 203L)
      .flatMap { ids =>
        for {
          a <- ids; b <- ids if a < b
        } yield (a, b)
      }
    val chains = (300L until 330L).sliding(2).map(w => (w(0), w(1))).toSeq
    val dupes = cliques.take(60) ++ chains.take(10) // repeats, cross-partition
    rnd.shuffle(cliques ++ chains ++ dupes)
  }

  private def runGroups(pairs: Seq[(Long, Long)], threshold: Long,
      parts: Int): Map[Long, Long] = {
    import spark.implicits._
    val df = pairs.toDF("doc_a", "doc_b").repartition(parts)
    val out = Dedup.duplicateGroups(df, threshold).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.GraftSession.sweepPersisted(spark)
    out
  }

  test("contracted union-find branch matches the driver-side reference") {
    val expect = referenceComponents(messyPairs)
    assert(runGroups(messyPairs, 2000000L, 8) === expect)
  }

  test("contracted propagation-loop branch matches the reference") {
    // threshold 0 forces the distributed loop; the forest it sees came out
    // of the contraction, so this pins the contraction+loop composition
    val expect = referenceComponents(messyPairs)
    assert(runGroups(messyPairs, 0L, 8) === expect)
  }

  test("a k-clique contracts to at most (parts + k - 1) forest edges") {
    import spark.implicits._
    val k = 40
    val clique = for { a <- 0L until k; b <- 0L until k if a < b } yield (a, b)
    val df = clique.toDF("doc_a", "doc_b").repartition(4)
    val forest = Dedup.localForest(df)
    // each partition keeps at most (its distinct nodes − components) ≤ k−1
    // edges, so 4 partitions bound the forest at 4·(k−1) ≪ k²/2 raw pairs
    val n = forest.count()
    assert(n <= 4L * (k - 1),
      s"${clique.size} clique pairs must contract to ≤ ${4 * (k - 1)} edges, got $n")
    graft.GraftSession.sweepPersisted(spark)
  }

  test("dedupKeepBest keeps the best-quality member per component") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // component {0,1,2}: qualities 5, 9, 9 → keeper is 1 (best, lowest id
    // among the tie); component {10,11}: 3, 7 → keeper 11; 20 isolated
    val docs = Seq((0L, 5), (1L, 9), (2L, 9), (10L, 3), (11L, 7), (20L, 4))
      .toDF("doc_id", "q")
    val pairs = Seq((0L, 1L), (1L, 2L), (10L, 11L)).toDF("doc_a", "doc_b")
    val out = Dedup.dedupKeepBest(docs, Dedup.duplicateGroups(pairs), col("q"))
      .orderBy("doc_id")
      .select("doc_id", "group_id", "keep")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out === Array(
      (0L, 0L, false), (1L, 0L, true), (2L, 0L, false),
      (10L, 10L, false), (11L, 10L, true), (20L, 20L, true)))
    graft.GraftSession.sweepPersisted(spark)
  }

  test("self-pair names a singleton component that survives contraction") {
    val withSelf = messyPairs ++ Seq((999L, 999L))
    val expect = referenceComponents(messyPairs) + (999L -> 999L)
    val got = runGroups(withSelf, 2000000L, 8)
    assert(got === expect)
    assert(got(999L) === 999L, "isolated self-pair node keeps its own label")
  }
}
