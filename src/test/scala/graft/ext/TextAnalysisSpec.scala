package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {

  test("repetition: hand-computed fractions on a repetitive document") {
    import spark.implicits._
    // "a b a b a b": 2-grams = [a b, b a, a b, b a, a b] -> top "a b" x3,
    // text length 11, gram length 3 -> top2 = 9/11
    val docs = Seq((1L, "a b a b a b")).toDF("doc_id", "text")
    val r = TextAnalysis.repetition(docs).head
    assert(math.abs(r.getAs[Double]("top2_frac") - 9.0 / 11) < 1e-12)
    // 3-grams: [a b a, b a b, a b a, b a b] -> top x2, len 5 -> 10/11
    assert(math.abs(r.getAs[Double]("top3_frac") - 10.0 / 11) < 1e-12)
    // 5-grams: [a b a b a, b a b a b] -> all unique -> dup5 = 0
    assert(r.getAs[Double]("dup5_frac") === 0.0)
    assert(!r.getAs[Boolean]("passes_repetition"))
  }

  test("repetition: docs shorter than n words get zero fractions, not errors") {
    import spark.implicits._
    val docs = Seq((1L, "one"), (2L, "one two"), (3L, "x y x y x y x y x y"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.repetition(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Double]("top2_frac") === 0.0)
    assert(out(1L).getAs[Double]("dup5_frac") === 0.0)
    assert(out(2L).getAs[Double]("top2_frac") > 0.0) // exactly one 2-gram
    assert(out(3L).getAs[Double]("dup5_frac") > 0.0) // repeated 5-grams
  }

  test("repetition: non-repetitive text passes the gates") {
    import spark.implicits._
    val text = (1 to 60).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val r = TextAnalysis.repetition(docs).head
    assert(r.getAs[Boolean]("passes_repetition"))
    assert(r.getAs[Double]("dup5_frac") === 0.0)
  }

  test("langId classifies genuine sentences incl. CJK (VERDICT r1 #9)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat and looked out of the window"),
      (2L, "el perro corre por las calles y es muy rápido que los gatos"),
      (3L, "der Hund ist nicht klein und das Haus ist groß"),
      (4L, "le chien est dans les rues et mange des croissants"),
      (5L, "我今天在图书馆看了一本书，这本书是我朋友的，内容很有意思"),
      (6L, "qwerty asdf zxcv")).toDF("doc_id", "text")
    val out = TextAnalysis.langId(docs)
      .select("doc_id", "predicted_lang").as[(Long, String)].collect().toMap
    assert(out(1L) == "en")
    assert(out(2L) == "es")
    assert(out(3L) == "de")
    assert(out(4L) == "fr")
    assert(out(5L) == "zh") // char-based path: no whitespace tokens needed
    assert(out(6L) == "unknown")
  }

  test("zh scoring counts function characters, not tokens") {
    import spark.implicits._
    val docs = Seq((1L, "他说的是真的")).toDF("doc_id", "text")
    val row = TextAnalysis.langId(docs).select("score_zh", "predicted_lang").head
    assert(row.getInt(0) == 3) // 的 ×2 + 是 ×1
    assert(row.getString(1) == "zh")
  }

  test("case-insensitive latin matching (The/Der capitalized sentence starts)") {
    import spark.implicits._
    val docs = Seq((1L, "The house And the tree Of life")).toDF("doc_id", "text")
    val row = TextAnalysis.langId(docs).select("score_en", "predicted_lang").head
    assert(row.getInt(0) == 4 && row.getString(1) == "en")
  }
}
