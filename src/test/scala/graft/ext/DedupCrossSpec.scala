package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Cross-corpus dedup ([[Dedup.dedupAgainst]]): verdict flags against a
  * hand-built reference/new split where every arm is known.
  */
class DedupCrossSpec extends SparkSpec {

  test("exact, near, and keep verdicts against a known reference") {
    import spark.implicits._
    val base = (1 to 30).map(i => s"word$i").mkString(" ")
    val ref = Seq(
      (0L, base),                       // near-dups 11L (tail edit)
      (2L, "ref exact copy text alpha beta gamma delta epsilon zeta eta"),
      (4L, "completely unrelated reference text " +
        (1 to 30).map(i => s"r$i").mkString(" "))
    ).toDF("doc_id", "text")
    val nw = Seq(
      (10L, "fresh new document " + (1 to 30).map(i => s"n$i").mkString(" ")),
      (11L, s"$base tailedit"),         // shares LSH buckets with 0L
      (12L, "ref exact copy text alpha beta gamma delta epsilon zeta eta")
    ).toDF("doc_id", "text")
    val got = Dedup.dedupAgainst(nw, ref).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2), r.getBoolean(3)))
    assert(got.length === 3)
    val byId = got.map(t => t._1 -> t).toMap
    assert(byId(10L) === ((10L, false, false, true)), "fresh doc must keep")
    assert(byId(11L)._3 === true, "tail-edited copy must flag near_dup")
    assert(byId(11L)._4 === false)
    // an exact copy has identical signatures too, so both flags fire
    assert(byId(12L) === ((12L, true, true, false)),
      "verbatim copy must flag exact_dup (and near via identical bands)")
  }

  test("reference-only duplication never flags: dedup is one-directional") {
    import spark.implicits._
    val t = "shared inside reference only " +
      (1 to 30).map(i => s"s$i").mkString(" ")
    val ref = Seq((0L, t), (1L, t)).toDF("doc_id", "text")
    val nw = Seq((10L, "unrelated new " +
      (1 to 30).map(i => s"u$i").mkString(" "))).toDF("doc_id", "text")
    val got = Dedup.dedupAgainst(nw, ref).collect()
    assert(got.length === 1 && got(0).getBoolean(3),
      "duplication WITHIN the reference must not affect new-corpus verdicts")
  }
}
