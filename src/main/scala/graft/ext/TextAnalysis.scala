package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (SURVEY §7.7):
  * language id, quality scoring, token counting, document fingerprinting.
  * All single-pass column expressions — no shuffle, no UDFs, fully
  * codegen'd; at 100 TB these run at scan speed.
  */
object TextAnalysis {

  /** Per-language function-word lexicons for the whitespace-token path.
    * Real function words, each distinctive of its language (shared romance
    * articles like "la" are deliberately excluded so scores don't collide).
    */
  val langWords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "that", "with"),
    "es" -> Seq("el", "los", "las", "que", "una", "es", "y"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "fr" -> Seq("le", "les", "des", "est", "et", "dans", "une"))

  /** Top Chinese function CHARACTERS (的 是 了 在 和 不 有 我). CJK text has
    * no whitespace tokenization, so zh is scored by character occurrences
    * over the raw string, not by tokens — the standard cheap CJK signal.
    */
  val zhChars = "的是了在和不有我"

  /** Tie order for the argmax CASE chain: zh first (any CJK character in
    * mixed text is a far stronger signal than one shared Latin token),
    * then list order.
    */
  val langOrder: Seq[String] = "zh" +: langWords.map(_._1)

  private def stopCount(words: Column, stops: Seq[String]): Column =
    size(filter(words, w => w.isin(stops.map(lit(_)): _*)))

  /** Language-ID: Latin languages score by lowercase function-word hits,
    * zh by function-character count; argmax with the [[langOrder]] tie
    * chain. Still one codegen'd pass, no shuffle.
    */
  def langId(docs: DataFrame): DataFrame = {
    val words = split(lower(col("text")), " ", -1)
    val scoreCols =
      langWords.map { case (l, ws) => stopCount(words, ws).as(s"score_$l") } :+
        regexp_count(col("text"), lit(s"[$zhChars]")).cast("int").as("score_zh")
    val scored = docs.select(col("doc_id") +: scoreCols: _*)
    val maxScore = greatest(langOrder.map(l => col(s"score_$l")): _*)
    val predicted = langOrder.foldRight(lit("unknown")) { case (l, els) =>
      when(col(s"score_$l") === maxScore && maxScore > 0, lit(l)).otherwise(els)
    }
    scored.withColumn("predicted_lang", predicted)
  }

  /** Quality signals: token counts, type-token ratio, stopword ratio, mean
    * word length — integer-exact numerators/denominators so the double
    * divisions agree bit-for-bit with any engine.
    */
  def quality(docs: DataFrame): DataFrame = {
    val words = split(col("text"), " ", -1)
    val nWords = size(words).cast("double")
    val nUniq = size(array_distinct(words)).cast("double")
    val stops = stopCount(words, langWords.head._2).cast("double")
    val totalLen = aggregate(words, lit(0L), (acc, w) => acc + length(w)).cast("double")
    docs.select(
      col("doc_id"),
      nWords.cast("bigint").as("n_words"),
      nUniq.cast("bigint").as("n_uniq_words"),
      (nUniq / nWords).as("type_token_ratio"),
      (stops / nWords).as("stopword_ratio"),
      (totalLen / nWords).as("mean_word_len"),
      when(nUniq / nWords < 0.2, "repetitive")
        .when(nWords < 5, "too_short")
        .otherwise("ok").as("quality_flag"))
  }

  /** Gopher-style heuristic quality gates (Rae et al. 2021 §A1.1 — public
    * paper): word-length shape, symbol load, and repetition, the standard
    * pre-training corpus filters. One codegen'd pass per document; the
    * repetition signal (top word frequency) folds over the distinct-word
    * array — O(words·distinct) per doc, still partition-local.
    */
  def gopherQuality(docs: DataFrame): DataFrame = {
    val words = split(col("text"), " ", -1)
    val nWords = size(words)
    val shortW = size(filter(words, w => length(w) <= 3))
    val longW = size(filter(words, w => length(w) >= 8))
    val symbols = length(regexp_replace(col("text"), "[a-z0-9 ]", ""))
    val topFreq = array_max(transform(array_distinct(words),
      w => size(filter(words, x => x === w))))
    // O(words·distinct) interpreted HOF per doc — redistribute few-split inputs
    graft.Tables.fanOut(docs).select(
      col("doc_id"),
      nWords.cast("bigint").as("n_words"),
      (shortW.cast("double") / nWords).as("frac_short_words"),
      (longW.cast("double") / nWords).as("frac_long_words"),
      (symbols.cast("double") / length(col("text"))).as("symbol_ratio"),
      (topFreq.cast("double") / nWords).as("top_word_freq"),
      (nWords >= 50 && nWords <= 100000 &&
        (topFreq.cast("double") / nWords) <= 0.2).as("passes_gopher"))
  }

  /** Text cleaning: drop control characters, collapse whitespace runs,
    * trim — the normalization pass before tokenize/dedup. Pure regexp
    * chain, scan speed.
    */
  def clean(docs: DataFrame): DataFrame = {
    val cleaned = trim(regexp_replace(
      regexp_replace(col("text"), "[\\x00-\\x1f]", " "), " +", " "))
    docs.select(col("doc_id"), cleaned.as("text_clean"),
      (cleaned =!= col("text")).as("was_dirty"))
  }

  /** PII redaction: emails and URLs replaced with placeholder tokens —
    * the standard scrub pass before publishing a training corpus. The
    * patterns are RE2/Java-compatible (no lookaround), so any engine
    * reproduces them; counts returned for audit.
    */
  val EmailPattern = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val UrlPattern = "https?://[^ ]+"

  def redactPii(docs: DataFrame): DataFrame = {
    val emails = regexp_count(col("text"), lit(EmailPattern))
    val urls = regexp_count(col("text"), lit(UrlPattern))
    val redacted = regexp_replace(
      regexp_replace(col("text"), UrlPattern, "<URL>"),
      EmailPattern, "<EMAIL>")
    docs.select(col("doc_id"), redacted.as("text_redacted"),
      emails.cast("int").as("n_emails"), urls.cast("int").as("n_urls"))
  }

  /** Token counting: whitespace tokens, a regex token count ([a-z]+ runs —
    * RE2/Java-compatible pattern), and a BPE-ish subword estimate
    * (ceil(len/4) per word).
    */
  def tokenCounts(docs: DataFrame): DataFrame = {
    val words = split(col("text"), " ", -1)
    docs.select(
      col("doc_id"),
      size(words).cast("bigint").as("ws_tokens"),
      regexp_count(col("text"), lit("[a-z]+")).cast("bigint").as("regex_tokens"),
      aggregate(words, lit(0L), (acc, w) => acc + ceil(length(w) / 4.0).cast("bigint"))
        .as("subword_est"))
  }

  /** Rolling-hash document fingerprint: fold h ← (h·31 + wordhash) mod p
    * over the token stream (order-sensitive, unlike the set-based dedup
    * hashes). Single pass, no shuffle.
    */
  def fingerprint(docs: DataFrame): DataFrame = {
    val words = split(col("text"), " ", -1)
    val p = 1000000007L
    val wh = (w: Column) => conv(substring(md5(w), 1, 4), 16, 10).cast("bigint")
    docs.select(col("doc_id"),
      aggregate(words, lit(0L), (acc, w) => (acc * 31 + wh(w)) % p).as("fingerprint"))
  }
}
