package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines
  * (SURVEY §7.7 / BASELINE north star). All operators are pure
  * DataFrame→DataFrame, shuffle only on their blocking/bucket keys, and keep
  * per-row work inside whole-stage codegen (higher-order functions, no UDFs).
  *
  * 100 TB design notes per operator are on each method.
  */
object Dedup {

  /** Exact dedup: hash-groupBy on content. At scale this is one shuffle on
    * the (fixed-width) digest rather than the full text — group on
    * md5(text), keep the min id as the canonical representative.
    * Map-side partial aggregation keeps the shuffle at ~1 row per distinct
    * digest per mapper.
    */
  def exact(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** Deterministic 64-bit-ish word hash both engines can reproduce:
    * decimal value of the first 8 hex chars of md5.
    */
  def wordHash(c: Column, bits: Int = 32): Column =
    conv(substring(md5(c), 1, bits / 4), 16, 10).cast("bigint")

  /** n-word shingles (n=3): the MinHash input set. */
  def shingles(words: Column, n: Int = 3): Column =
    transform(sequence(lit(1), greatest(size(words) - (n - 1), lit(0))),
      i => concat_ws(" ", (0 until n).map(k => element_at(words, i + k)): _*))

  /** One MinHash signature element: min over shingles of a seeded digest.
    * Hex strings of fixed width compare lexicographically = numerically, so
    * array_min needs no numeric parse.
    */
  def minhashSig(sh: Column, seed: Int): Column =
    array_min(transform(sh, g => substring(md5(concat(g, lit(s":$seed"))), 1, 16)))

  /** MinHash signatures (4 seeds) per document over 3-word shingles.
    * Scale: embarrassingly parallel scan; signature is 64 bytes/doc
    * regardless of document size — the shuffle for the LSH join moves
    * signatures, never documents.
    */
  def minhashSignatures(docs: DataFrame): DataFrame = {
    val words = split(col("text"), " ", -1)
    val sh = shingles(words)
    docs.filter(size(words) >= 3).select(
      col("doc_id"), minhashSig(sh, 0).as("sig0"), minhashSig(sh, 1).as("sig1"),
      minhashSig(sh, 2).as("sig2"), minhashSig(sh, 3).as("sig3"))
  }

  /** LSH banding over the signatures: 2 bands × 2 rows. Documents agreeing
    * on a whole band land in the same bucket; bucket join yields candidate
    * pairs (near-dup threshold ≈ (1/b)^(1/r)). Returned here as the band
    * histogram (band, bucket, size, id range) — the candidate-pair join is
    * `buckets.filter(n>1)` self-joined on (band, bucket), a shuffle on the
    * 16-byte bucket key only.
    */
  def lshBands(sigs: DataFrame): DataFrame = {
    val bands = sigs.select(col("doc_id"),
      explode(map(
        lit(0), concat(col("sig0"), col("sig1")),
        lit(1), concat(col("sig2"), col("sig3")))).as(Seq("band", "bucket")))
    bands.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
  }

  /** SimHash (16-bit here; width is a constant): per bit, the sign of the
    * ±1 vote sum over token hashes. One pass, no shuffle; near-dup search is
    * then a hamming-ball probe on the fingerprint (e.g. by pigeonhole split
    * into 4-bit blocks → equality join per block at scale).
    */
  def simhash(docs: DataFrame, bits: Int = 16): DataFrame = {
    val words = split(col("text"), " ", -1)
    val h = (w: Column) => conv(substring(md5(w), 1, 4), 16, 10).cast("bigint")
    val bitCols = transform(sequence(lit(0), lit(bits - 1)), b => {
      val votes = aggregate(words, lit(0L),
        (acc, w) => acc + when((floor(h(w) / pow(lit(2), b)).cast("bigint") % 2) === 1, 1L).otherwise(-1L))
      when(votes >= 0, pow(lit(2), b).cast("bigint")).otherwise(0L)
    })
    docs.select(col("doc_id"),
      aggregate(bitCols, lit(0L), (acc, v) => acc + v).as("simhash"))
  }

  /** N-gram Jaccard near-dup pairs within blocking keys (lang, source,
    * length bucket). Blocking turns the O(n²) pair space into
    * sum-of-block² — at 100 TB the blocks are the shuffle partitions and
    * each block's pair loop stays in one task. Word-set Jaccard via
    * array_distinct/intersect (codegen'd).
    */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double = 0.6): DataFrame = {
    val withSets = docs.select(
      col("doc_id"), col("lang"), col("source"),
      floor(col("n_chars") / 100.0).cast("int").as("len_bucket"),
      array_distinct(split(col("text"), " ", -1)).as("wset"))
    val a = withSets.as("a")
    val b = withSets.as("b")
    val inter = size(array_intersect(col("a.wset"), col("b.wset"))).cast("double")
    val union = size(array_union(col("a.wset"), col("b.wset"))).cast("double")
    a.join(b,
      col("a.lang") === col("b.lang") && col("a.source") === col("b.source") &&
        col("a.len_bucket") === col("b.len_bucket") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (inter / union).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
