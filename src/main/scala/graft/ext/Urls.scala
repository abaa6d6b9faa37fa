package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + URL-level exact dedup — the first dedup pass of a
  * web-scale corpus pipeline (dedup by normalized URL before any content
  * hashing: it is free, and in Common-Crawl-shaped data it removes a large
  * slice of the dup mass).
  *
  * Every rule is a codegen'd `regexp_replace`/`regexp_extract` chain using
  * RE2-safe syntax (no lookaround, no pattern backreferences) so an
  * independent engine can replay the identical normalization; the DuckDB
  * oracle does (its regex engine IS RE2).
  *
  * Scale shape: canonicalization is scan-speed (per-row expressions, no
  * shuffle); dedup is one hash-shuffled aggregation on the canonical key
  * with map-side partial counts.
  */
object Urls {

  /** Normalize a URL:
    *  1. drop the fragment;
    *  2. lowercase scheme + authority (path/query stay case-sensitive);
    *  3. strip default ports (https:443, http:80);
    *  4. strip a leading `www.`;
    *  5. drop `utm_*` tracking parameters (one pass with a repeated group
    *     so a RUN of consecutive utm params of any length collapses —
    *     a single non-repeated replacement would consume the separator of
    *     the immediately following utm param and skip it — then one pass
    *     for a trailing param, then a dangling `?`);
    *  6. strip one trailing slash.
    */
  def canonicalizeUrl(u: Column): Column = {
    val auth = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"
    val noFrag = regexp_replace(u, "#.*$", "")
    val lowered = concat(
      lower(regexp_extract(noFrag, s"($auth)", 1)),
      regexp_replace(noFrag, auth, ""))
    val noPort = regexp_replace(
      regexp_replace(lowered, "^(https://[^/?#:]+):443([/?#].*)?$", "$1$2"),
      "^(http://[^/?#:]+):80([/?#].*)?$", "$1$2")
    val noWww = regexp_replace(noPort, "^([a-z][a-z0-9+.-]*://)www\\.", "$1")
    val noUtm = regexp_replace(
      regexp_replace(
        regexp_replace(noWww, "([?&])(utm_[^&#]*&)+", "$1"),
        "[?&]utm_[^&#]*$", ""),
      "\\?$", "")
    regexp_replace(noUtm, "/$", "")
  }

  /** Exact dedup on the canonical URL: one row per distinct canonical
    * form, keeping the smallest doc_id (the conventional keeper) and the
    * duplicate count.
    */
  def dedupByUrl(docs: DataFrame, url: Column): DataFrame =
    docs.select(col("doc_id"), canonicalizeUrl(url).as("canonical_url"))
      .groupBy(col("canonical_url"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_docs"))

  /** The host of a URL, lowercased, `www.` and port stripped — the
    * domain key for per-domain policies. RE2-safe (the DuckDB oracle
    * replays it verbatim); empty string when the input is not a URL.
    */
  def hostOf(u: Column): Column =
    regexp_extract(lower(u),
      "^[a-z][a-z0-9+.-]*://(?:www\\.)?([^/?#:]+)", 1)

  /** Per-domain document cap (the RefinedWeb-style domain balancing
    * pass): keep at most `k` documents per host, chosen by the
    * deterministic min-hash draw of [[Sampling.reservoir]] — a uniform
    * without-replacement sample per domain, so one crawl-heavy site
    * cannot dominate the corpus mix.
    *
    * Scale shape: host extraction is scan-speed; selection is ONE MinK
    * aggregation with map-side partials plus a left-semi join — a
    * million-page domain costs a bounded k-slot accumulator per partial,
    * never a million-row sort partition (the `row_number` window
    * spelling would).
    */
  def domainCap(docs: DataFrame, url: Column, k: Int): DataFrame =
    Sampling.reservoir(docs.withColumn("domain", hostOf(url)),
      col("domain"), col("doc_id"), k)
}
