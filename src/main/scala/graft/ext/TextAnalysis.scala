package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (SURVEY §7.7):
  * language id, quality scoring, token counting, document fingerprinting.
  * All single-pass column expressions — no shuffle, no UDFs, fully
  * codegen'd; at 100 TB these run at scan speed.
  */
object TextAnalysis {

  /** Tiny per-language function-word lists for the n-gram/stopword
    * heuristic. Deterministic argmax with a fixed tie order (en first).
    */
  val langWords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "es" -> Seq("el", "la", "de", "y"),
    "de" -> Seq("der", "die", "das", "und"),
    "fr" -> Seq("le", "la", "de", "et"),
    "zh" -> Seq("de", "shi", "le", "he"))

  private def stopCount(words: Column, stops: Seq[String]): Column =
    size(filter(words, w => w.isin(stops.map(lit(_)): _*)))

  /** Language-ID: score each language by function-word hits, pick the max
    * (first language wins ties — the CASE chain encodes the tie order).
    */
  def langId(docs: DataFrame): DataFrame = {
    val words = split(col("text"), " ", -1)
    val scored = docs.select(
      (col("doc_id") +: langWords.map { case (l, ws) => stopCount(words, ws).as(s"score_$l") }): _*)
    val maxScore = greatest(langWords.map { case (l, _) => col(s"score_$l") }: _*)
    // left-to-right CASE: ties resolve in list order (en first)
    val predicted = langWords.foldRight(lit("unknown")) { case ((l, _), els) =>
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
