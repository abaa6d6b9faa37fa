package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed corpus-curation pipeline — the end-to-end operator a
  * training-data run actually executes, built entirely from this library's
  * own primitives in the canonical order:
  *
  *  1. normalize ([[TextAnalysis.clean]]: control chars → space, collapse
  *     runs, trim) — BEFORE dedup, so byte-level noise can't split
  *     identical documents into distinct hash groups;
  *  2. shape-gate ([[TextAnalysis.gopherQuality]]) — drop documents
  *     failing the Gopher length/repetition gates;
  *  3. exact-dedup ([[Dedup.exact]]) on the cleaned text — keep the
  *     smallest id per content hash, carrying the group size;
  *  4. decontaminate ([[TextAnalysis.decontaminate]]) — drop survivors
  *     sharing 5-grams with the evaluation set.
  *
  * Returns one row per SURVIVING document: (doc_id, lang, n_copies).
  * Scale shape is the sum of its parts: two scan-speed passes, one
  * digest-keyed shuffle, one broadcast join — nothing quadratic, nothing
  * driver-side.
  */
object Curation {

  def curate(docs: DataFrame, evalDocs: DataFrame): DataFrame = {
    val cleaned = TextAnalysis.clean(docs)
      .select(col("doc_id"), col("text_clean").as("text"))
      .join(docs.select("doc_id", "lang"), "doc_id")
    val gated = cleaned.join(
      TextAnalysis.gopherQuality(cleaned).select("doc_id", "passes_gopher"),
      "doc_id")
      .filter(col("passes_gopher"))
      .select("doc_id", "lang", "text")
    val unique = gated.join(
      Dedup.exact(gated).select(col("keeper_id").as("doc_id"), col("n_copies")),
      "doc_id")
    TextAnalysis.decontaminate(
      unique.select("doc_id", "lang", "text"), evalDocs)
      .filter(!col("contaminated"))
      .join(unique.select("doc_id", "n_copies"), "doc_id")
      .select(col("doc_id"), col("lang"), col("n_copies"))
  }
}
