package graft.ext

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

class DedupSimhashSpec extends SparkSpec {

  /** The interpreted column spelling the native [[graft.functions.SimHash]]
    * expression replaced — kept as the semantics oracle (the DuckDB SQL in
    * ExtQueries replays this same arithmetic).
    */
  private def columnSimhash(text: Column, bits: Int): Column = {
    val hs = transform(split(text, " ", -1),
      w => conv(substring(md5(w), 1, bits / 4), 16, 10).cast("bigint"))
    def bitVal(hsCol: Column, b: Int): Column = {
      val votes = aggregate(hsCol, lit(0L),
        (acc, h) => acc + when((floor(h / lit(math.pow(2, b))).cast("bigint") % 2) === 1, 1L)
          .otherwise(-1L))
      when(votes >= 0, lit(1L << b)).otherwise(0L)
    }
    (0 until bits).map(b => bitVal(hs, b)).reduce(_ + _)
  }

  test("native simhash bit-matches the per-bit fold spelling (16 and 32 bits)") {
    val docs = Tables.documents(spark, sf).limit(300)
    for (bits <- Seq(16, 32)) {
      val diff = docs.select(
        graft.functions.SimHash(split(col("text"), " ", -1), bits).as("nat"),
        columnSimhash(col("text"), bits).as("ref"))
        .filter(col("nat") =!= col("ref"))
      assert(diff.count() === 0, s"bits=$bits")
    }
  }

  test("near-dup probe: maxBlock cap is a no-op when groups fit, and bounds " +
      "candidate membership when they don't") {
    val docs = Tables.documents(spark, sf).limit(300)
    val uncapped = Dedup.simhashNearDupPairs(docs, maxDist = 2, bits = 32,
      maxBlock = 1000000).orderBy("doc_a", "doc_b").collect()
    val inert = Dedup.simhashNearDupPairs(docs, maxDist = 2, bits = 32,
      maxBlock = 2000).orderBy("doc_a", "doc_b").collect()
    assert(uncapped.sameElements(inert),
      "cap above every group width must not change the result")
    // Engage the cap hard: keep only the first 3 members of every (block,
    // value) group. Survivor pairs must be a subset of the uncapped pairs,
    // and membership must honor doc_id order — any pair naming a doc that
    // is not among a block's 3 smallest ids can only arise via a DIFFERENT
    // block in which it is, so every reported pair must still be uncapped-
    // valid (subset check covers it).
    val tight = Dedup.simhashNearDupPairs(docs, maxDist = 2, bits = 32,
      maxBlock = 3).collect()
    val uncSet = uncapped.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tight.forall(r => uncSet((r.getLong(0), r.getLong(1)))),
      "capped pairs must be a subset of the uncapped pairs")
    assert(tight.length < uncapped.length,
      "a cap of 3 on sf-test data must actually drop candidates")
  }

  test("simhash edge cases: empty-string word array and identical docs") {
    import spark.implicits._
    val df = Seq((1L, ""), (2L, "a b c"), (3L, "a b c")).toDF("doc_id", "text")
    val out = Dedup.simhash(df, bits = 16).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // identical text -> identical fingerprint
    assert(out(2L) === out(3L))
    // "" splits to [""], md5("") votes deterministically — just pin stability
    assert(out(1L) === Dedup.simhash(df, bits = 16).collect()
      .find(_.getLong(0) == 1L).get.getLong(1))
  }
}
