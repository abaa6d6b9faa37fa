package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftexpr.BpeUtil

class BpeSpec extends SparkSpec {

  test("pieceCount replays the greedy merge loop by hand") {
    val t = BpeUtil.Default
    // "the": t h e → (t,h) is rank 0 → [th, e] → (th,e) is rank 1 → [the]
    assert(t.pieceCount("the") === 1)
    // "then": th e → the, n: (e,n) rank 7 never forms — after (th,e)
    // merges, pair is (the, n), unlisted → [the, n]
    assert(t.pieceCount("then") === 2)
    // "tt": (t,t) unlisted → stays 2 characters
    assert(t.pieceCount("tt") === 2)
    // merge-all is one left-to-right pass: "ththth" fuses every (t,h)
    // occurrence in the first round → [th, th, th], nothing else listed
    assert(t.pieceCount("ththth") === 3)
    // empty word contributes zero pieces
    assert(t.pieceCount("") === 0)
    // unmergeable symbols stay at codepoint count
    assert(t.pieceCount("xyz") === 3)
    // lowest-ranked pair wins when several are present: in "ster",
    // (s,t) rank 11 beats (t,e) 13 and (e,r) 3? no — (e,r) is rank 3,
    // the minimum: st er? round 1 merges ALL (e,r) → [s, t, er];
    // round 2: (s,t) → [st, er]; no (st,er) rule → 2 pieces
    assert(t.pieceCount("ster") === 2)
  }

  test("default table loads from the bundled GPT-2-format merges.txt") {
    // fixture sanity: rank order is line order, header line skipped
    assert(BpeUtil.Merges.head === ("t", "h"))
    assert(BpeUtil.Merges(1) === ("th", "e"))
    assert(BpeUtil.Merges.size === 32)
    // the parser handles the public format: version header, comments,
    // blank lines, multi-char symbols
    val parsed = BpeUtil.parseMerges(
      "#version: 0.2\n\nt h\nth e\n# comment\nin g\n")
    assert(parsed === IndexedSeq(("t", "h"), ("th", "e"), ("in", "g")))
    intercept[IllegalArgumentException](BpeUtil.parseMerges("justoneword\n"))
  }

  test("a caller-supplied merges table rides the expression") {
    import spark.implicits._
    // a different trained table: merges (x,y) then (xy,z) — "xyz" becomes
    // ONE piece here but stays 3 under the default table
    val custom = BpeTokens.parseMerges("#version: 0.2\nx y\nxy z\n")
    val df = Seq((1L, "xyz the")).toDF("doc_id", "text")
      .select(col("doc_id"),
        BpeTokens(split(col("text"), " ", -1)).as("default_n"),
        BpeTokens(split(col("text"), " ", -1), custom).as("custom_n"))
    val r = df.collect()(0)
    assert(r.getLong(1) === 3L + 1L) // xyz=3 under default, the=1
    assert(r.getLong(2) === 1L + 3L) // xyz=1 under custom, the=3 (t,h,e)
  }

  test("bpe token totals and pack-by-bpe wiring") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the then", "en"),
      (2L, "xyz", "en"))
      .toDF("doc_id", "text", "lang")
    val counts = graft.ext.TextAnalysis.bpeTokenCounts(docs)
      .orderBy("doc_id").collect()
    assert(counts(0).getLong(1) === 2L) // ws_tokens
    assert(counts(0).getLong(2) === 3L) // the(1) + then(2)
    assert(counts(1).getLong(2) === 3L)
    // packSequences accepts the BPE count as its token budget source
    val packed = graft.ext.TextAnalysis.packSequences(
      docs, budget = 3, nShards = 1,
      tokensOf = BpeTokens(split(col("text"), " ", -1)))
      .orderBy("doc_id").collect()
    assert(packed(0).getAs[Long]("n_tokens") === 3L)
    // real-table smoke: BPE count is bounded by character count and at
    // least the word count (every word yields >= 1 piece when non-empty)
    val real = graft.ext.TextAnalysis.bpeTokenCounts(
      Tables.documents(spark, sf))
    val bad = real
      .join(Tables.documents(spark, sf).select(col("doc_id"),
        length(col("text")).as("n_chars_t")), "doc_id")
      .filter(col("bpe_tokens") > col("n_chars_t") ||
        col("bpe_tokens") < col("ws_tokens") / 2)
      .count()
    assert(bad === 0)
  }
}
