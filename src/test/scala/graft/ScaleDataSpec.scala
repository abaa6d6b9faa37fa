package graft

import org.apache.spark.sql.functions._

/** Invariants of the N× bench synthesis (ScaleData): the scaled corpus must
  * measure *engine* scaling, so copies have to be fresh data — disjoint ids,
  * fresh sources, and text that no dedup path pairs across copies.
  */
class ScaleDataSpec extends SparkSpec {

  private lazy val outDir = {
    val d = s"${System.getProperty("java.io.tmpdir")}/graft_scale_spec"
    ScaleData.synthesize(spark, sf, d, factor = 3)
    d
  }

  private def copyOf(c: org.apache.spark.sql.Column) =
    floor(c / ScaleData.IdStride)

  test("every table has factor x rows with globally unique ids") {
    for ((name, id) <- Seq("documents" -> "doc_id", "embeddings" -> "vec_id",
        "events" -> "event_id", "lineitem" -> "l_orderkey")) {
      val base = Tables.table(spark, sf, name)
      val scaled = Tables.table(spark, outDir, name)
      assert(scaled.count() === base.count() * 3, s"$name row count")
      if (name != "lineitem") // orderkey repeats across line numbers
        assert(scaled.select(id).distinct().count() === scaled.count(),
          s"$name id uniqueness")
    }
  }

  test("copies carry fresh sources and fresh (rotated) text") {
    val docs = Tables.documents(spark, outDir)
    val baseDocs = Tables.documents(spark, sf)
    assert(docs.select("source").distinct().count() ===
      baseDocs.select("source").distinct().count() * 3)
    // same base row across copies must disagree on text (rotation != identity)
    val clashes = docs
      .select((col("doc_id") % ScaleData.IdStride).as("base_id"),
        copyOf(col("doc_id")).as("copy"), col("text"))
      .groupBy(col("base_id"))
      .agg(countDistinct(col("text")).as("n"))
      .filter(col("n") < 3)
    assert(clashes.count() === 0, "rotated copies collided")
  }

  test("no dedup path pairs documents across copies") {
    val docs = Tables.documents(spark, outDir)
    def crossCopy(pairs: org.apache.spark.sql.DataFrame): Long =
      pairs.filter(copyOf(col("doc_a")) =!= copyOf(col("doc_b"))).count()
    assert(crossCopy(Dedup2.ngram(docs)) === 0, "ngram jaccard crossed copies")
    assert(crossCopy(Dedup2.lsh(docs)) === 0, "minhash lsh crossed copies")
    // exact dedup: every content hash stays within one copy
    val cross = ext.Dedup.exact(docs).filter(col("n_copies") > 1).count()
    assert(cross === 0, "exact dedup found cross-copy duplicates")
  }

  test("embedding copies are distinct vectors") {
    val emb = Tables.embeddings(spark, outDir)
    val dup = emb
      .groupBy((col("vec_id") % ScaleData.IdStride).as("base_id"))
      .agg(countDistinct(col("embedding").cast("string")).as("n"))
      .filter(col("n") < 3)
    assert(dup.count() === 0, "embedding copies identical")
  }

  private object Dedup2 {
    def ngram(docs: org.apache.spark.sql.DataFrame) =
      ext.Dedup.ngramJaccardPairs(docs, 0.6, maxBlock = 200)
    def lsh(docs: org.apache.spark.sql.DataFrame) =
      ext.Dedup.lshCandidatePairs(ext.Dedup.minhashSignatures(docs))
  }
}
