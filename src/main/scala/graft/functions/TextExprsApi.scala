package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftexpr.{GramStatsExpr, IntDotExpr, IntersectSizeExpr, LangLexicon, LangScoresExpr, WordGramsExpr}

/** Public faces of the native text/vector expressions — see the
  * `org.apache.spark.sql.graftexpr` implementations for semantics.
  */
object GramStats {
  /** struct(bestCnt, bestGram, dup) of the word n-grams of an
    * array<string> column, one hashed pass per row.
    */
  def apply(words: Column, n: Int): Column = GramStatsExpr.column(words, n)
}

object WordGrams {
  /** Space-joined full n-gram windows of an array<string> column. */
  def apply(words: Column, n: Int): Column = WordGramsExpr.column(words, n)
}

object IntersectSize {
  /** size(array_intersect(a, b)) without materializing the array. */
  def apply(a: Column, b: Column): Column = IntersectSizeExpr.column(a, b)
}

object IntDot {
  /** Σ (long)(a[i]·b[i]) over two array<int> columns. */
  def apply(a: Column, b: Column): Column = IntDotExpr.column(a, b)
}

object LangScores {
  /** All per-language lexicon scores of a string column in one pass:
    * array<int> in (wordLists ++ charLists) order.
    */
  def apply(text: Column, wordLists: Seq[Seq[String]],
      charLists: Seq[String]): Column =
    LangScoresExpr.column(text, new LangLexicon(wordLists, charLists))
}

object Int8Codes {
  /** struct(codes: array<int>, scale: double) int8 quantization of an
    * array<float> column, one codegen'd pass per row.
    */
  def apply(emb: Column): Column =
    org.apache.spark.sql.graftexpr.Int8CodesExpr.column(emb)
}

object SimHash {
  /** SimHash fingerprint (long) of an array<string> column: md5-per-word
    * ±1 votes across `bits` fingerprint bits, one codegen'd pass per row.
    */
  def apply(words: Column, bits: Int): Column =
    org.apache.spark.sql.graftexpr.SimHashExpr.column(words, bits)
}

object RollingFingerprint {
  /** (h*mult + md5-prefix-hash(word)) % mod folded over an array<string>
    * column, one codegen'd pass per row.
    */
  def apply(words: Column, hexChars: Int = 4, mult: Long = 31L,
      mod: Long = 1000000007L): Column =
    org.apache.spark.sql.graftexpr.RollingHashExpr.column(words, hexChars, mult, mod)
}

object L2Sq {
  /** Squared L2 distance between an array<float> and an array<double>
    * column, one codegen'd pass per row.
    */
  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.graftexpr.L2SqExpr.column(a, b)
}

object PqAdc {
  /** Σ_s lut[s*k + codes[s]] — product-quantization asymmetric distance,
    * one codegen'd pass per (vector, query) pair.
    */
  def apply(codes: Column, lut: Column, k: Int): Column =
    org.apache.spark.sql.graftexpr.PqAdcExpr.column(codes, lut, k)
}

object PqLut {
  /** The dense sub-major m·k ADC lookup table of an array<float> embedding
    * column against a collected codebook set, one codegen'd pass per row —
    * see [[org.apache.spark.sql.graftexpr.PqLutExpr]] for the slot-for-slot
    * parity contract with the per-slot l2sq spelling.
    */
  def apply(emb: Column, m: Int, k: Int, subdim: Int,
      books: Seq[Seq[(Int, Seq[Double])]]): Column =
    org.apache.spark.sql.graftexpr.PqLutExpr.column(emb,
      org.apache.spark.sql.graftexpr.PqLutModel(m, k, subdim, books))
}

object IntersectSizeSorted {
  /** size(array_intersect(a, b)) for two ASCENDING-sorted array<string>
    * columns as one zero-allocation merge scan per pair — the per-pair
    * kernel of blocked Jaccard over pre-sorted word sets. Same count as
    * [[IntersectSize]] on any sorted inputs (duplicates and nulls
    * included); sortedness is the caller's contract.
    */
  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.graftexpr.IntersectSizeSortedExpr.column(a, b)
}

object BloomGramHits {
  /** Count of distinct word n-grams of an array<string> column whose k
    * double-hash Bloom probes all hit in an array<bigint> bitmap column,
    * one codegen'd pass per row — value-identical to the
    * array_distinct + word_grams + filter spelling; see
    * [[org.apache.spark.sql.graftexpr.BloomGramHitsExpr]].
    */
  def apply(words: Column, bm: Column, n: Int, mBits: Int, k: Int): Column =
    org.apache.spark.sql.graftexpr.BloomGramHitsExpr.column(words, bm, n, mBits, k)
}

object WrapEveryK {
  /** Space-join an array<string> column wrapping every k-th (1-based)
    * element in pre/post, one codegen'd pass per row — value-identical to
    * the array_join(transform(sequence(...))) spelling; see
    * [[org.apache.spark.sql.graftexpr.WrapEveryKExpr]].
    */
  def apply(words: Column, k: Int, pre: String, post: String): Column =
    org.apache.spark.sql.graftexpr.WrapEveryKExpr.column(words, k, pre, post)
}

object BpeTokens {
  /** The default merge table — loaded from the bundled GPT-2-format
    * `merges.txt` fixture resource
    * ([[org.apache.spark.sql.graftexpr.BpeUtil.Merges]]).
    */
  val merges: Seq[(String, String)] =
    org.apache.spark.sql.graftexpr.BpeUtil.Merges

  /** Parse a GPT-2-format `merges.txt` (optional `#` header lines, one
    * `left right` pair per line, rank = line order) into a merge list
    * for the two-arg apply — how a real trained tokenizer plugs in.
    */
  def parseMerges(text: String): Seq[(String, String)] =
    org.apache.spark.sql.graftexpr.BpeUtil.parseMerges(text)

  /** Total character-level greedy-merge BPE piece count of an
    * array<string> column, over the default fixture table.
    */
  def apply(words: Column): Column =
    org.apache.spark.sql.graftexpr.BpeTokensExpr.column(words)

  /** Same, over a caller-supplied merge table (e.g. a loaded trained
    * merges.txt). The table rides the expression to executors.
    */
  def apply(words: Column, merges: Seq[(String, String)]): Column =
    org.apache.spark.sql.graftexpr.BpeTokensExpr.column(words, merges)
}

object DecompressText {
  /** Decode a compressed binary column (gzip or zstd, dispatched on the
    * frame magic) to UTF-8 text inside the scan — NULL on unknown magic
    * or malformed/truncated/CRC-failing input, bounded output (zip-bomb
    * guard). See [[org.apache.spark.sql.graftexpr.DecompressTextUtil]].
    */
  def apply(bin: Column, maxBytes: Int = 1 << 24): Column =
    org.apache.spark.sql.graftexpr.DecompressTextExpr.column(bin, maxBytes)
}

object HtmlText {
  /** One-pass HTML visible-text extraction: struct(text, n_links) —
    * scripts/styles/comments/tags stripped, the six common entities
    * decoded, whitespace collapsed; `n_links` counts `<a` open tags.
    * See [[org.apache.spark.sql.graftexpr.HtmlTextUtil]].
    */
  def apply(html: Column): Column =
    org.apache.spark.sql.graftexpr.HtmlTextExpr.column(html)
}

object CeBatchEvents {
  /** Decode a gRPC-framed (or bare) CloudEvents `BatchEvent` blob into
    * struct(bus_id, events array<struct(id, source, specversion, type,
    * datacontenttype, dataschema, attributes, data, data_text)>); NULL on
    * malformed bytes. The ingestion counterpart of the gRPC batch sink —
    * covers the binary_data/text_data/proto_data payload arms. See
    * [[org.apache.spark.sql.graftexpr.CeBatchUtil]].
    */
  def apply(bin: Column): Column =
    org.apache.spark.sql.graftexpr.CeBatchEventsExpr.column(bin)
}

object CeBatchBytes {
  /** Encode one event as the gRPC-framed single-event `BatchEvent` blob
    * the batch sink posts (wire-exact [[graft.streaming.CeProto]] bytes).
    */
  def apply(busId: Column, id: Column, source: Column, etype: Column,
      ct: Column, body: Column): Column =
    org.apache.spark.sql.graftexpr.CeBatchBytesExpr.column(
      busId, id, source, etype, ct, body)
}

object WarcRecords {
  /** Parse concatenated uncompressed WARC/1.x records from a binary
    * column: array of struct(rec_type, uri, content_length, payload),
    * complete records only, bounded and throw-free on hostile input. See
    * [[org.apache.spark.sql.graftexpr.WarcUtil]].
    */
  def apply(bin: Column): Column =
    org.apache.spark.sql.graftexpr.WarcRecordsExpr.column(bin)
}

object NfcNormalize {
  /** NFC (canonical composition) Unicode normalization of a string
    * column, one codegen'd pass per row with an allocation-free fast path
    * for already-normalized text. See
    * [[org.apache.spark.sql.graftexpr.NfcExpr]].
    */
  def apply(text: Column): Column =
    org.apache.spark.sql.graftexpr.NfcExpr.column(text)
}

object JsonPathText {
  /** Memoized whole-document JSON path read — one parse per (thread, doc)
    * shared across every path reference in the same predicate; see
    * [[org.apache.spark.sql.graftexpr.JsonDocMemo]] for the
    * get_json_object text-form parity contract.
    */
  def apply(doc: Column, path: String): Column =
    org.apache.spark.sql.graftexpr.JsonPathTextExpr.column(doc, path)
}

object MinhashSigs {
  /** struct(sig0..sig{k-1}) MinHash signatures of the n-word shingles of
    * an array<string> column — fused shingle→md5-prefix→universal-hash→min,
    * one codegen'd pass per row; see
    * [[org.apache.spark.sql.graftexpr.MinhashSigsExpr]].
    */
  def apply(words: Column, n: Int, prefixHex: Int, p: Long,
      as: Seq[Long], bs: Seq[Long]): Column =
    org.apache.spark.sql.graftexpr.MinhashSigsExpr.column(
      words, n, prefixHex, p, as, bs)
}

object PassageHashes {
  /** array<struct<pos:int, phash:string>> rolling passage-window md5 rows
    * of an array<string> column, one codegen'd pass per row; see
    * [[org.apache.spark.sql.graftexpr.PassageHashesExpr]].
    */
  def apply(words: Column, window: Int, stride: Int): Column =
    org.apache.spark.sql.graftexpr.PassageHashesExpr.column(words, window, stride)
}

object RemoveSpans {
  /** struct<n_kept:int, text_dedup:string> span-removal rebuild over an
    * array<string> words column and an ASCENDING-sorted array<int> of
    * duplicate-window start positions, one codegen'd merge scan per row;
    * see [[org.apache.spark.sql.graftexpr.RemoveSpansExpr]].
    */
  def apply(words: Column, starts: Column, window: Int): Column =
    org.apache.spark.sql.graftexpr.RemoveSpansExpr.column(words, starts, window)
}

object ScatterLongs {
  /** Dense long[n] from sparse (pos, value) struct entries; see
    * [[org.apache.spark.sql.graftexpr.ScatterLongsExpr]].
    */
  def apply(entries: Column, n: Int): Column =
    org.apache.spark.sql.graftexpr.ScatterLongsExpr.column(entries, n)
}
