package graft.ext

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {

  test("fused curate equals the unfused operator chain") {
    val docs = Tables.documents(spark, sf)
    val evalSet = docs.filter(col("doc_id") % 97 === 0)
    val corpus = docs.filter(col("doc_id") % 97 =!= 0)
    val fused = Curation.curate(corpus, evalSet)
    // the chain the fused form replaced: each stage's output joined back
    val cleaned = TextAnalysis.clean(corpus)
      .select(col("doc_id"), col("text_clean").as("text"))
      .join(corpus.select("doc_id", "lang"), "doc_id")
    val gated = cleaned.join(
      TextAnalysis.gopherQuality(cleaned).select("doc_id", "passes_gopher"),
      "doc_id").filter(col("passes_gopher")).select("doc_id", "lang", "text")
    val unique = gated.join(
      Dedup.exact(gated).select(col("keeper_id").as("doc_id"), col("n_copies")),
      "doc_id")
    val chained = TextAnalysis.decontaminate(
      unique.select("doc_id", "lang", "text"), evalSet)
      .filter(!col("contaminated"))
      .join(unique.select("doc_id", "n_copies"), "doc_id")
      .select(col("doc_id"), col("lang"), col("n_copies"))
    assert(fused.exceptAll(chained).count() === 0)
    assert(chained.exceptAll(fused).count() === 0)
  }

  test("fused curate plan has one corpus-wide hash shuffle before the eval join") {
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") % 97 =!= 0)
    // the corpus-wide stage is the pinned clean+gate+dedup subtree: its
    // ONE hash exchange is keyed on the md5 grouping expression —
    // lang/n_copies ride columns, document text is never re-partitioned
    // by doc_id (since optimization r21 the composed operator materializes
    // this subtree behind a leaf pin, so it is asserted here directly)
    val dedupPlan = Curation.cleanGateDedup(corpus)
      .queryExecution.executedPlan.toString
    val dedupKeys = "Exchange hashpartitioning\\((\\w+)#".r
      .findAllMatchIn(dedupPlan).map(_.group(1)).toSeq
    assert(dedupKeys.contains("_groupingexpression"),
      s"dedup shuffle missing:\n$dedupPlan")
    assert(dedupKeys.toSet === Set("_groupingexpression"),
      s"unexpected shuffle keys $dedupKeys:\n$dedupPlan")
    val fused = Curation.curate(corpus, docs.filter(col("doc_id") % 97 === 0))
    fused.write.format("noop").mode("overwrite").save() // settle AQE
    val plan = fused.queryExecution.executedPlan.toString
    // the returned plan re-reads the pinned survivors (leaf scans), so the
    // only shuffles left are the id-only contaminated-set distinct — never
    // a join that re-partitions document text by doc_id, never a SMJ
    assert(plan.contains("Scan ExistingRDD"),
      s"pinned-survivor leaf scan missing:\n$plan")
    val keys = "Exchange hashpartitioning\\((\\w+)#".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(keys.toSet.subsetOf(Set("doc_id", "gram")),
      s"unexpected shuffle keys $keys:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"a corpus self-join crept back:\n$plan")
  }

  test("curateFuzzy drops near-dup tails and passage-covered docs the exact stage keeps") {
    val docs = Tables.documents(spark, sf)
    val nearText = "neardup core " + (1 to 60).map(i => s"ndword$i").mkString(" ")
    val passText = (1 to 200).map(i => s"pgword$i").mkString(" ")
    val corpus = docs.filter(col("doc_id") % 97 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 71 === 0,
          concat(lit(nearText), lit(" tail"), col("doc_id").cast("string")))
          .when(col("doc_id") % 67 === 0,
            concat(lit(passText), lit(" "), col("text")))
          .otherwise(col("text")))
    val evalSet = docs.filter(col("doc_id") % 97 === 0)
    val exact = Curation.curate(corpus, evalSet).cache()
    val fuzzy = Curation.curateFuzzy(corpus, evalSet).cache()
    // fuzzy survivors ⊂ exact survivors (the added stages only drop)
    assert(fuzzy.select("doc_id").exceptAll(exact.select("doc_id")).count() === 0)
    // the near-dup class survives exact-dedup (distinct tails) but
    // collapses to one keeper in the fuzzy pass
    val nearIds = corpus.filter(col("doc_id") % 71 === 0 &&
      col("doc_id") % 13 =!= 0).select("doc_id")
    val exactNear = exact.join(nearIds, "doc_id").count()
    val fuzzyNear = fuzzy.join(nearIds, "doc_id").count()
    assert(exactNear > 1, s"near-dup dirt should survive exact stage: $exactNear")
    assert(fuzzyNear < exactNear,
      s"LSH stage should collapse near dups: $fuzzyNear vs $exactNear")
    exact.unpersist(); fuzzy.unpersist()
  }

  test("curateKeepBest keeps the longest near-dup member; plan has no Window") {
    val docs = Tables.documents(spark, sf)
    val nearText = "neardup core " + (1 to 60).map(i => s"ndword$i").mkString(" ")
    // %71 docs share a 62-word core with per-doc tails of DIFFERENT
    // lengths: doc_id 142's "tailtail142..." beats 71's shorter tail, so
    // the min-id keeper and the longest keeper disagree on purpose
    val corpus = docs.filter(col("doc_id") % 97 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 71 === 0,
          concat(lit(nearText), lit(" tail"), col("doc_id").cast("string"),
            when(col("doc_id") % 142 === 0, lit(" extrapad")).otherwise(lit(""))))
          .otherwise(col("text")))
    val evalSet = docs.filter(col("doc_id") % 97 === 0)
    val fuzzy = Curation.curateFuzzy(corpus, evalSet).cache()
    val best = Curation.curateKeepBest(corpus, evalSet).cache()
    // same chain, same drop COUNT per near-dup component — only the
    // keeper identity changes
    assert(fuzzy.count() === best.count())
    val nearIds = corpus.filter(col("doc_id") % 71 === 0).select("doc_id")
    val fuzzyKeepers = fuzzy.join(nearIds, "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val bestKeepers = best.join(nearIds, "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(fuzzyKeepers.nonEmpty && bestKeepers.nonEmpty)
    // the padded (longer) members must win under keep-best wherever the
    // component contains one; min-id picks the smallest id instead
    assert(bestKeepers != fuzzyKeepers,
      s"policies should disagree on the padded component: $bestKeepers")
    assert(bestKeepers.forall(_ % 142 == 0),
      s"keep-best must pick the padded copies: $bestKeepers")
    // keeper policy is the argmax aggregate, never a Window sort — the
    // corpus-scale degenerate-component guarantee of PlanSpec, preserved
    // through the composed pipeline
    val plan = best.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"keeper regressed to a window:\n$plan")
    fuzzy.unpersist(); best.unpersist()
    graft.GraftSession.sweepPersisted(spark)
  }

  test("curateMedia: keeper wins, duplicates drop, corrupt twins never group") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("kind", StringType),
      StructField("content", BinaryType)))
    val img = Pixels.bmpBytes(8, 8, 7)
    // 1 and 2 are bit-identical images (near-dup pair, keeper = 1);
    // 3 is the SAME image truncated to 8 bytes — corrupt must not ride
    // its twins' duplicate group (all test images are smooth gradients,
    // which dHash deliberately judges similar, so distinct-looking
    // formula images can't serve as a negative control here)
    val media = spark.createDataFrame(java.util.Arrays.asList(
      Row(1L, "image", img), Row(2L, "image", img),
      Row(3L, "image", java.util.Arrays.copyOf(img, 8))), schema)
    val got = Curation.curateMedia(media).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getString(2)))).toMap
    assert(got(1L) === ((true, "keep")))
    assert(got(2L) === ((false, "near_dup")))
    assert(got(3L) === ((false, "corrupt")))
  }

  test("curateVideo: clip keeper wins, shared-keyframe dup drops, corrupt gates") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("kind", StringType),
      StructField("content", BinaryType)))
    // 9 frames with every-4th stss → keyframes at samples 1, 5, 9 (3 per
    // clip ≥ minShared=2); 1 and 2 are bit-identical clips, 3 is 1
    // truncated (no ftyp → unwalkable), 4 shares the dims with different
    // frame seeds — it MAY still group with 1/2 (the formula's smooth
    // gradients dHash similar, the curateMedia caveat), so it is asserted
    // walkable (never corrupt), not independent
    def clip(seed: Long) = MediaHeader.mp4BytesWithPayloads(6, 6,
      Array.tabulate(9)(i => Pixels.bmpBytes(6, 6, seed * 100 + i * 37)),
      syncEvery = 4)
    val media = spark.createDataFrame(java.util.Arrays.asList(
      Row(1L, "video", clip(7L)), Row(2L, "video", clip(7L)),
      Row(3L, "video", java.util.Arrays.copyOf(clip(7L), 8)),
      Row(4L, "video", clip(113L))), schema)
    val got = Curation.curateVideo(media).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getString(2)))).toMap
    assert(got(1L) === ((true, "keep")))
    assert(got(2L) === ((false, "near_dup")))
    assert(got(3L) === ((false, "corrupt")))
    assert(got(4L)._2 !== "corrupt", "walkable clip must never gate corrupt")
  }

  test("short-but-valid media is kept, never corrupt") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("kind", StringType),
      StructField("content", BinaryType)))
    // 1-frame WAV and 1-sample MP4: decodable but with zero delta bits —
    // a curation pass must keep them (no evidence of duplication), and
    // the zero-evidence fingerprints must not pair with each other
    val audio = spark.createDataFrame(java.util.Arrays.asList(
      Row(1L, "audio", Samples.wavPcmBytes(8000, 1, 1, 3L)),
      Row(2L, "audio", Samples.wavPcmBytes(8000, 1, 1, 9L))), schema)
    val gotA = Curation.curateAudio(audio).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getString(2)))).toMap
    assert(gotA(1L) === ((true, "keep")))
    assert(gotA(2L) === ((true, "keep")))
    val video = spark.createDataFrame(java.util.Arrays.asList(
      Row(1L, "video", MediaHeader.mp4BytesWithPayloads(6, 6,
        Array(Pixels.bmpBytes(6, 6, 3L)), syncEvery = 4)),
      Row(2L, "video", MediaHeader.mp4BytesWithPayloads(6, 6,
        Array(Pixels.bmpBytes(6, 6, 9L)), syncEvery = 4))), schema)
    val gotV = Curation.curateVideo(video).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getString(2)))).toMap
    assert(gotV(1L) === ((true, "keep")))
    assert(gotV(2L) === ((true, "keep")))
  }

  test("curateAudio: keeper wins, duplicates drop, corrupt twins never group") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("kind", StringType),
      StructField("content", BinaryType)))
    val clip = Samples.wavPcmBytes(8000, 1, 40, 7L)
    // 1 and 2 are bit-identical clips (near-dup pair, keeper = 1); 3 is
    // the same clip truncated to 8 bytes — corrupt must not ride its
    // twins' duplicate group; 4 has a DIFFERENT frame count, so the
    // n_bits cohort key must keep it out of the pair space entirely
    val media = spark.createDataFrame(java.util.Arrays.asList(
      Row(1L, "audio", clip), Row(2L, "audio", clip),
      Row(3L, "audio", java.util.Arrays.copyOf(clip, 8)),
      Row(4L, "audio", Samples.wavPcmBytes(8000, 1, 20, 7L))), schema)
    val got = Curation.curateAudio(media).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getString(2)))).toMap
    assert(got(1L) === ((true, "keep")))
    assert(got(2L) === ((false, "near_dup")))
    assert(got(3L) === ((false, "corrupt")))
    assert(got(4L) === ((true, "keep")))
  }
}
