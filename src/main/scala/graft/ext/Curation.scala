package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The composed corpus-curation pipeline — the end-to-end operator a
  * training-data run actually executes, built entirely from this library's
  * own primitives in the canonical order:
  *
  *  1. normalize ([[cleanText]], the Column form of [[TextAnalysis.clean]]:
  *     control chars → space, collapse runs, trim) — BEFORE dedup, so
  *     byte-level noise can't split identical documents into distinct
  *     hash groups;
  *  2. shape-gate ([[passesGopher]], the Column form of
  *     [[TextAnalysis.gopherQuality]]'s verdict) — drop documents failing
  *     the Gopher length/repetition gates;
  *  3. exact-dedup on the cleaned text — keep the smallest id per content
  *     hash, carrying the group size;
  *  4. ([[curateFuzzy]] only) MinHash→LSH→connected-components near-dedup
  *     over the survivors, keeping each group's smallest id
  *     ([[Dedup.lshCandidatePairs]] / [[Dedup.duplicateGroups]]);
  *  5. ([[curateFuzzy]] only) passage-level dedup
  *     ([[Dedup.duplicatePassages]]) — drop documents whose
  *     duplicated-window coverage reaches `passageFracMax` (the doc-level
  *     coverage policy from the RefinedWeb-style pipelines);
  *  6. decontaminate — drop survivors sharing 5-grams with the evaluation
  *     set (the broadcast-side check from [[TextAnalysis.decontaminate]]).
  *
  * Returns one row per SURVIVING document: (doc_id, lang, n_copies).
  *
  * Scale shape: stages 1-2 are per-row Columns on ONE frame (no self-joins
  * — an earlier version joined `clean`'s and `gopherQuality`'s outputs
  * back on doc_id, three avoidable full-corpus shuffles); stage 3 is the
  * single corpus-wide shuffle — the keeper's (id, lang, text) ride the
  * min(struct) aggregate, since doc_id is unique the struct min IS the
  * smallest-id row, so no join-back either; stages 4-5 shuffle ids/hashes
  * only and their drop sets come back as broadcast anti-joins; stage 6 is
  * a broadcast join against the (small) eval grams with the contaminated
  * ids anti-joined. Nothing quadratic, nothing driver-side.
  */
object Curation {

  /** The normalization and gate expressions are defined ONCE in
    * [[TextAnalysis]] ([[TextAnalysis.cleanCol]] /
    * [[TextAnalysis.gopherPass]]) — the composed pipeline and the
    * standalone operators can't drift apart.
    */
  def cleanText(text: Column): Column = TextAnalysis.cleanCol(text)

  def passesGopher(ws: Column): Column = TextAnalysis.gopherPass(ws)

  /** Stages 1-3 fused: clean + gate as Columns, then the one hash-keyed
    * shuffle whose min(struct) carries the keeper row and group size.
    * Output: (doc_id, lang, text, n_copies), one row per keeper.
    * `private[ext]` so CurationSpec can pin the one-corpus-shuffle shape of
    * this subtree directly — in the composed operators it executes inside
    * the pin materialization, so the returned plan no longer shows it.
    */
  private[ext] def cleanGateDedup(docs: DataFrame): DataFrame =
    graft.Tables.fanOut(docs)
      .withColumn("text", cleanText(col("text")))
      .withColumn("__ws", split(col("text"), " ", -1))
      .filter(passesGopher(col("__ws")))
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min(struct(col("doc_id"), col("lang"), col("text"))).as("k"),
        count(lit(1)).as("n_copies"))
      .select(col("k.doc_id").as("doc_id"), col("k.lang").as("lang"),
        col("k.text").as("text"), col("n_copies"))

  /** Decontaminate survivors in place: anti-join the ids that share any
    * 5-gram with the (broadcast) eval gram set — same verdict as
    * [[TextAnalysis.decontaminate]].filter(!contaminated), without
    * re-deriving lang/n_copies through a corpus join.
    */
  private def dropContaminated(survivors: DataFrame,
      evalDocs: DataFrame): DataFrame = {
    val grams = array_distinct(
      TextAnalysis.wordGrams(split(col("text"), " ", -1), 5))
    val evalGrams = evalDocs.select(explode(grams).as("gram")).distinct()
    // the .distinct() stays deliberately: besides bounding the build side
    // at O(contaminated docs), its exchange is the materialization point
    // that lets AQE size the anti-join's build side exactly (the explode's
    // own estimate is garbage) and convert it to a broadcast join
    val hitIds = graft.Tables.fanOut(survivors)
      .select(col("doc_id"), explode(grams).as("gram"))
      .join(broadcast(evalGrams), Seq("gram"))
      .select("doc_id").distinct()
    survivors.join(hitIds, Seq("doc_id"), "left_anti")
  }

  def curate(docs: DataFrame, evalDocs: DataFrame): DataFrame = {
    // pinned: dropContaminated consumes the survivors frame twice (the
    // gram-explode hit probe and the anti-join's left side), and the
    // clean+gate+dedup subtree would re-execute for each (optimization
    // r21 — the same double-consumption StageProbe attributed in the
    // fuzzy/keep-best chains)
    val unique = graft.GraftCache.pinLeaf(cleanGateDedup(docs))
    graft.GraftCache.releaseAfter(
      dropContaminated(unique, evalDocs)
        .select(col("doc_id"), col("lang"), col("n_copies")),
      unique)
  }

  /** The full fuzzy chain: [[curate]]'s stages plus MinHash-LSH near-dedup
    * and passage-level dedup between exact-dedup and decontamination — the
    * canonical "run this on your corpus" pass.
    */
  def curateFuzzy(docs: DataFrame, evalDocs: DataFrame,
      passageFracMax: Double = 0.3): DataFrame = {
    // pin the deduped survivors: duplicateGroups takes driver actions
    // (its convergence/size checks), which splits the chain into separate
    // jobs — without the pin the clean+gate+dedup subtree would re-execute
    // for the signature job, the passage job, and the final query.
    // GraftCache evicts it once an action on the returned frame completes.
    val unique = graft.GraftCache.pinLeaf(cleanGateDedup(docs))
    // The loser/drop ID frames are PINNED too (optimization r21): the
    // returned plan consumes nearDeduped twice (passage probe + kept) and
    // kept twice (decontamination probe + survivors), so WITHOUT the pins
    // the LSH→components and passage subtrees re-executed once per
    // consumer — StageProbe measured pipeline_curate_keep_best at 91 AQE
    // stage-jobs / 146 executor-seconds for a 5k-doc corpus, vs 41 jobs
    // for the fuzzy chain, all of it re-execution. The pinned frames are
    // doc_id-only (8 bytes/row — O(duplicates), never O(corpus bytes)),
    // and GraftCache releases them with the existing terminal listener.
    val nearDupLosers = graft.GraftCache.pinLeaf(Dedup.duplicateGroups(
      Dedup.lshCandidatePairs(
        Dedup.minhashSignatures(unique), distinctPairs = false))
      .filter(!col("is_keeper")).select("doc_id"))
    val nearDeduped = unique.join(nearDupLosers, Seq("doc_id"), "left_anti")
    val passageDropIds = graft.GraftCache.pinLeaf(Dedup.duplicatePassages(nearDeduped)
      .filter(col("shared_frac") >= passageFracMax).select("doc_id"))
    val kept = nearDeduped.join(passageDropIds, Seq("doc_id"), "left_anti")
    graft.GraftCache.releaseAfter(
      dropContaminated(kept, evalDocs)
        .select(col("doc_id"), col("lang"), col("n_copies")),
      unique, nearDupLosers, passageDropIds)
  }

  /** [[curateFuzzy]] with the keep-BEST keeper policy: the near-dup stage
    * keeps the highest-`quality` member of each duplicate component
    * (default: longest cleaned text; ties to smallest doc_id) instead of
    * the conventional min-id keeper — "of the re-crawls, keep the best
    * copy". The policy swap REUSES the one groups frame this chain
    * already computes: [[Dedup.dedupKeepBest]] is one argmax aggregate
    * over the groups join (map-side partials, no Window — PlanSpec's
    * degenerate-component guarantee), not a second
    * minhash→LSH→components chain like composing `dedup_keep_best` after
    * `pipeline_curation_fuzzy` by hand would cost.
    */
  def curateKeepBest(docs: DataFrame, evalDocs: DataFrame,
      passageFracMax: Double = 0.3,
      quality: Column = length(col("text"))): DataFrame = {
    val unique = graft.GraftCache.pinLeaf(cleanGateDedup(docs))
    val groups = Dedup.duplicateGroups(
      Dedup.lshCandidatePairs(
        Dedup.minhashSignatures(unique), distinctPairs = false))
    // same pin rationale as [[curateFuzzy]] — and here the loser frame
    // additionally fronts the argmax join pair of [[Dedup.dedupKeepBest]],
    // which the unpinned plan re-executed once per downstream consumer
    val nearDupLosers = graft.GraftCache.pinLeaf(
      Dedup.dedupKeepBest(unique, groups, quality)
        .filter(!col("keep")).select("doc_id"))
    val nearDeduped = unique.join(nearDupLosers, Seq("doc_id"), "left_anti")
    val passageDropIds = graft.GraftCache.pinLeaf(Dedup.duplicatePassages(nearDeduped)
      .filter(col("shared_frac") >= passageFracMax).select("doc_id"))
    val kept = nearDeduped.join(passageDropIds, Seq("doc_id"), "left_anti")
    graft.GraftCache.releaseAfter(
      dropContaminated(kept, evalDocs)
        .select(col("doc_id"), col("lang"), col("n_copies")),
      unique, nearDupLosers, passageDropIds)
  }

  /** Shared tail of the media curation passes: connected-component
    * duplicate groups over the candidate pair set, keeper = smallest id,
    * one keep/near_dup/corrupt verdict per hashed row (`fpCol` NULL marks
    * the undecodable rows the decode gate rejected). `hashed` must be
    * PINNED by the caller: [[Dedup.duplicateGroups]] takes driver actions
    * that split the chain into separate jobs, so an unpinned decode scan
    * would re-execute for the pair job, the group pass, and the verdict
    * join; the pin is released once an action on the returned frame
    * completes ([[graft.GraftCache.releaseAfter]]).
    */
  private def fingerprintVerdicts(hashed: DataFrame, fpCol: String,
      pairs: DataFrame, release: DataFrame = null): DataFrame = {
    val groups = Dedup.duplicateGroups(pairs)
      .withColumnsRenamed(Map("doc_id" -> "media_id"))
    val keeper = coalesce(col("is_keeper"), lit(true))
    graft.GraftCache.releaseAfter(
      hashed.join(groups.select(col("media_id"), col("is_keeper")),
          Seq("media_id"), "left")
        .select(col("media_id"),
          (col(fpCol).isNotNull && keeper).as("keep"),
          when(col(fpCol).isNull, "corrupt")
            .when(!keeper, "near_dup")
            .otherwise("keep").as("reason")),
      Option(release).getOrElse(hashed))
  }

  /** The image-corpus counterpart of [[curate]]: one verdict per media row
    * through the composed path a multimodal pipeline runs — decode gate
    * (undecodable bytes → dropped as `corrupt`, they can never pair),
    * perceptual dHash, banded hamming near-dup pairs, connected-component
    * grouping, keeper choice (smallest id per group). `keep` = decodable
    * and not a non-keeper duplicate; `reason` ∈ corrupt / near_dup / keep.
    * Same scale shape as the pieces: scan-local decode, one block-key
    * shuffle for pairs, the groups pass — nothing quadratic, nothing
    * driver-side.
    */
  def curateMedia(media: DataFrame, maxDist: Int = 2,
      maxBlock: Int = 256): DataFrame = {
    val hashed = graft.GraftCache.pinLeaf(Multimodal.imagePhash(media))
    fingerprintVerdicts(hashed, "phash",
      Dedup.hammingNearDupPairs(
        hashed, "media_id", "phash", maxDist, bits = 56, maxBlock = maxBlock)
        .withColumnsRenamed(Map("id_a" -> "doc_a", "id_b" -> "doc_b")))
  }

  /** The audio-corpus member of the curation triad: decode gate
    * (undecodable PCM → `corrupt`, it can never pair), energy-delta
    * fingerprint, hamming pairs cohort-blocked on (n_bits, sample_rate,
    * channels) — the [[graft.ext.Multimodal.audioFingerprint]] contract —
    * connected-component grouping, keeper = smallest id per group.
    * Decodable clips too short to carry delta evidence (n_bits = 0) are
    * KEPT and never pair: zero shared bits is no evidence of duplication,
    * and they are certainly not corrupt.
    */
  def curateAudio(media: DataFrame, maxDist: Int = 2,
      maxBlock: Int = 256): DataFrame = {
    val hashed = graft.GraftCache.pinLeaf(Multimodal.audioFingerprint(media))
    fingerprintVerdicts(hashed, "afp",
      Dedup.hammingNearDupPairs(
        hashed.filter(col("n_bits") > 0), "media_id", "afp", maxDist,
        bits = 56, maxBlock = maxBlock,
        blockBy = Seq("n_bits", "sample_rate", "channels"))
        .withColumnsRenamed(Map("id_a" -> "doc_a", "id_b" -> "doc_b")))
  }

  /** The video-corpus member of the curation triad, at CLIP granularity:
    * decode gate (a container whose sample tables don't walk → `corrupt`
    * — it exposes no frames to fingerprint), REAL keyframe extraction and
    * per-frame dHash, clip pairs from ≥ `minShared` distinct shared
    * keyframes ([[graft.ext.Multimodal.keyframeClipDedup]]),
    * connected-component clip groups, keeper = smallest id. A walkable
    * single-sample clip is KEPT (vfp = 0 with n_bits = 0, not NULL — and
    * its lone keyframe can never reach `minShared`). Same scale shape as
    * the other passes plus one extra aggregation (the frame→clip rollup
    * on the already-tiny pair set).
    */
  def curateVideo(media: DataFrame, maxDist: Int = 2, minShared: Int = 2,
      maxBlock: Int = 256): DataFrame = {
    // ONE decode pass (optimization r21): the gate's size-delta
    // fingerprint and the pair stage's keyframe hashes come off the same
    // container walk ([[Multimodal.videoWalk]]) — the split operators each
    // re-walked (and re-synthesized, when the blobs are built upstream)
    // every container for signals one walk exposes together. The pinned
    // frame is fingerprints + keyframe hashes only — never blobs.
    val walked = graft.GraftCache.pinLeaf(Multimodal.videoWalk(media))
    val gate = walked.select(col("media_id"), col("vfp"), col("n_bits"))
    val keyframes = walked
      .select(col("media_id"), explode(col("kfs")).as("k"))
      .select(col("media_id"), col("k.sample_idx").as("sample_idx"),
        col("k.time_ms").as("time_ms"), col("k.phash").as("phash"),
        col("k.width").as("width"), col("k.height").as("height"))
    fingerprintVerdicts(gate, "vfp",
      Multimodal.keyframeClipDedupFrom(keyframes, maxDist, minShared, maxBlock)
        .filter(col("near_dup"))
        .select(col("clip_a").as("doc_a"), col("clip_b").as("doc_b")),
      release = walked)
  }
}
