package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic N× scale-up of the driver test tables, for the larger-SF
  * bench section (VERDICT r2 directive 10). The capped/salted operator paths
  * (MinK block caps, salted top-k windows, bucketed LSH) only show their
  * value above toy scale; this synthesizes a corpus `factor`× the source SF
  * so the bench can check that no query scales super-linearly.
  *
  * Design: each copy `c` of a row gets
  *  - ids offset by `c · IdStride` (disjoint, order-preserving id spaces);
  *  - `documents.text` passed through a per-copy letter/word bijection
  *    (caesar rotation × case swap × per-word reversal — 104 distinct
  *    variants; copy 0 = identity), so every shingle/word hash differs
  *    across copies: the 10× corpus is 10× *fresh* text with identical
  *    length/word-count/punctuation statistics, not 10 near-dup copies of
  *    each document (which would grow candidate pairs quadratically and
  *    measure duplicate blowup, not engine scaling);
  *  - `documents.source` suffixed per copy — at 10× a web corpus has ~10×
  *    the distinct sources, so blocking keys (lang, source, len_bucket) keep
  *    their per-block cardinality while block count grows linearly;
  *  - `embeddings.embedding` nudged by `c/1000` per element, so no two
  *    copies are exact-duplicate vectors.
  *
  * Everything is a single scan per table: explode a 0..factor-1 sequence,
  * remap columns with codegen'd expressions, write partitioned parquet (so
  * downstream scans of the scaled dir get real input splits, unlike the
  * single-row-group source files).
  */
object ScaleData {

  /** Id offset between copies; far above any real id in the test data. */
  val IdStride = 100000000L

  private val Lower = "abcdefghijklmnopqrstuvwxyz"
  private val Upper = Lower.toUpperCase

  /** Per-copy fresh-text transform, constant-folded per copy value
    * (translate() requires literal alphabets, so this is one flat
    * CaseWhen over the factor's copy values — `factor` branches of pure
    * codegen'd expressions, no UDF). Three composable length-preserving
    * letter/word bijections give 26 × 2 × 2 = 104 distinct variants:
    *  - caesar rotation by `c % 26` (copy 0 = identity);
    *  - case swap for `(c / 26) % 2 == 1` — folded into the same single
    *    translate();
    *  - per-word character reversal for `(c / 52) % 2 == 1`
    *    (split → reverse each word → rejoin; word boundaries, lengths and
    *    whitespace statistics unchanged).
    * Every copy pair below 104 therefore hashes differently at the
    * word/shingle level (digits, punctuation and palindromic words are
    * invariant — same sporadic sharing the pure-rotation corpus already
    * had), so a 100× corpus is 100× FRESH text with identical
    * length/word-count statistics, not systematic near-dups that would
    * measure duplicate blowup instead of engine scaling.
    */
  private def rotated(text: Column, copy: Column, factor: Int): Column = {
    def variant(c: Int): Column = {
      val r = c % 26
      val swap = (c / 26) % 2 == 1
      val rev = (c / 52) % 2 == 1
      val lowTo = Lower.drop(r) + Lower.take(r)
      val upTo = Upper.drop(r) + Upper.take(r)
      val to = if (swap) upTo + lowTo else lowTo + upTo
      val t = translate(text, Lower + Upper, to)
      if (rev) array_join(transform(split(t, " ", -1), w => reverse(w)), " ")
      else t
    }
    (1 until factor)
      .foldLeft(when(copy === 0, text)) { (acc, c) =>
        acc.when(copy === c, variant(c))
      }
      .otherwise(text)
  }

  private def withCopies(df: DataFrame, factor: Int): DataFrame =
    df.withColumn("copy", explode(sequence(lit(0), lit(factor - 1))))

  private def offsetId(c: Column, copy: Column): Column =
    c + copy.cast("bigint") * lit(IdStride)

  /** Write `df` minus the copy column as multi-split parquet. */
  private def write(df: DataFrame, outDir: String, name: String): Unit = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    df.drop("copy").repartition(par)
      .write.mode("overwrite").parquet(s"$outDir/$name.parquet")
  }

  val AllTables: Set[String] = Set("documents", "embeddings", "events", "lineitem")

  /** Synthesize the factor× corpus. `tables` restricts which tables are
    * written — the 26× capped-operator bench section reads only
    * documents+embeddings, and writing a 26× lineitem (~15M rows) for
    * queries that never open it is pure synthesis wall-time.
    *
    * `freshenEvents`: by default the events copies repeat `props` verbatim
    * (only `event_id` is offset) — a 10× corpus that is 90% duplicates,
    * the regime where stream-dedup state stays FLAT. Setting it applies
    * the documents freshener to `props` (per-copy rotation × case-swap ×
    * per-word reversal), producing factor× DISTINCT content — the regime
    * where dedup state grows toward the TTL/cap bound (r15 VERDICT #2:
    * both regimes must be measured, they stress opposite halves of the
    * design). `event_type` stays unchanged so the cohort/group count is
    * constant across regimes and factors.
    */
  def synthesize(spark: SparkSession, srcDir: String, outDir: String,
      factor: Int, tables: Set[String] = AllTables,
      freshenEvents: Boolean = false): Unit = {
    require(factor >= 1 && factor <= 104,
      s"factor must be in [1, 104] (the rotation×case×reversal variant " +
        s"space degenerates past 104), got $factor")
    val copy = col("copy")

    if (tables("documents")) {
      val docs = withCopies(Tables.documents(spark, srcDir), factor)
        .withColumn("doc_id", offsetId(col("doc_id"), copy))
        .withColumn("text", rotated(col("text"), copy, factor))
        .withColumn("source", concat(col("source"), lit("_c"), copy))
      write(docs, outDir, "documents")
    }

    if (tables("embeddings")) {
      val emb = withCopies(Tables.embeddings(spark, srcDir), factor)
        .withColumn("vec_id", offsetId(col("vec_id"), copy))
        .withColumn("embedding",
          transform(col("embedding"),
            x => (x + copy.cast("float") / lit(1000.0f)).cast("float")))
      write(emb, outDir, "embeddings")
    }

    // raw read: ts stays the nanos long the source stores (nanosAsLong is a
    // session config), so the scaled table round-trips the same schema and
    // Tables.events applies the identical µs conversion on read
    if (tables("events")) {
      val base = withCopies(Tables.table(spark, srcDir, "events"), factor)
        .withColumn("event_id", offsetId(col("event_id"), copy))
      val events =
        if (freshenEvents)
          base.withColumn("props", rotated(col("props"), copy, factor))
        else base
      write(events, outDir, "events")
    }

    if (tables("lineitem")) {
      val li = withCopies(Tables.lineitem(spark, srcDir), factor)
        .withColumn("l_orderkey", offsetId(col("l_orderkey"), copy))
      write(li, outDir, "lineitem")
    }
  }
}
