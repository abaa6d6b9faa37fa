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
