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

  test("copies past 26 stay fresh: the 104-variant space has no text collisions") {
    // the 100x tier's precondition (r13 VERDICT #4): pure rotation
    // degenerates at copy 26 (c % 26 repeats); the case-swap and per-word
    // reversal axes must keep every copy distinct. factor=60 covers all
    // three axes (rotation wrap at 26, case swap at 26..51, reversal at
    // 52..59) on a small slice.
    val d = s"${System.getProperty("java.io.tmpdir")}/graft_scale_spec60"
    val slice = s"${System.getProperty("java.io.tmpdir")}/graft_scale_spec60_src"
    Tables.documents(spark, sf).filter(col("doc_id") < 40)
      .write.mode("overwrite").parquet(s"$slice/documents.parquet")
    ScaleData.synthesize(spark, slice, d, factor = 60,
      tables = Set("documents"))
    val docs = Tables.documents(spark, d)
    val n = docs.count()
    assert(docs.select("text").distinct().count() === n,
      "cross-copy text collision past the rotation wrap")
    // word-count statistics are invariant under all three bijections
    val stats = docs
      .select((col("doc_id") % ScaleData.IdStride).as("base_id"),
        size(split(col("text"), " ", -1)).as("nw"))
      .groupBy("base_id").agg(countDistinct(col("nw")).as("d"))
      .filter(col("d") =!= 1)
    assert(stats.count() === 0, "a copy changed word counts")
    // and copies <= 25 stay PURE rotations of copy 0 (the committed
    // 10x/26x comparability contract: those corpora must hash identically
    // round-over-round, no case-swap or reversal leaking below 26)
    val lower = "abcdefghijklmnopqrstuvwxyz"
    val upper = lower.toUpperCase
    val rot25 = lower.drop(25) + lower.take(25) + upper.drop(25) + upper.take(25)
    val c0 = docs.filter(copyOf(col("doc_id")) === 0)
      .select((col("doc_id") % ScaleData.IdStride).as("base_id"),
        translate(col("text"), lower + upper, rot25).as("expected"))
    val c25 = docs.filter(copyOf(col("doc_id")) === 25)
      .select((col("doc_id") % ScaleData.IdStride).as("base_id"),
        col("text").as("actual"))
    val mismatches = c0.join(c25, "base_id")
      .filter(col("expected") =!= col("actual")).count()
    assert(mismatches === 0,
      "copy 25 must be the pure 25-rotation of copy 0 — a transform axis leaked below 26")
  }

  test("freshenEvents: copies carry fresh props, the default repeats them verbatim") {
    // the two stream-dedup regimes (r15 VERDICT #2): the default corpus is
    // duplicate-heavy (props verbatim per copy — distinct-content count
    // constant in the factor), the freshened corpus is fresh-content
    // (distinct props scale ~linearly; cohorts and times unchanged)
    val dDup = s"${System.getProperty("java.io.tmpdir")}/graft_scale_spec_evdup"
    val dFresh = s"${System.getProperty("java.io.tmpdir")}/graft_scale_spec_evfr"
    ScaleData.synthesize(spark, sf, dDup, factor = 3, tables = Set("events"))
    ScaleData.synthesize(spark, sf, dFresh, factor = 3, tables = Set("events"),
      freshenEvents = true)
    val base = Tables.events(spark, sf)
    val dup = Tables.events(spark, dDup)
    val fresh = Tables.events(spark, dFresh)
    val baseDistinct = base.select("props").distinct().count()
    assert(dup.select("props").distinct().count() === baseDistinct,
      "default regime must repeat props verbatim")
    val freshDistinct = fresh.select("props").distinct().count()
    assert(freshDistinct > baseDistinct * 2,
      s"freshened regime must multiply distinct content ($freshDistinct vs $baseDistinct)")
    // cohort key and event times are regime-invariant: the two corpora
    // differ ONLY in content freshness
    assert(fresh.select("event_type").distinct().count() ===
      base.select("event_type").distinct().count())
    assert(fresh.count() === base.count() * 3)
    // copy 0 is the identity: its props equal the source rows'
    val c0 = fresh.filter(copyOf(col("event_id")) === 0)
      .select((col("event_id") % ScaleData.IdStride).as("base_id"), col("props"))
    val src = base.select(col("event_id").as("base_id"),
      col("props").as("expected"))
    assert(c0.join(src, "base_id")
      .filter(!(col("props") <=> col("expected"))).count() === 0,
      "copy 0 must be the identity transform")
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
