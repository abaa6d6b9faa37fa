package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Hand-computed vectors for passage-level exact-substring dedup. */
class DedupPassagesSpec extends SparkSpec {
  import spark.implicits._

  private def words(n: Int, tag: String): String =
    (0 until n).map(i => s"$tag$i").mkString(" ")

  test("shared windows are counted per doc; unique and short docs are clean") {
    // doc 1 and 2 share their full 20-word text → 1 window each, shared.
    // doc 3 is 20 distinct words → 1 window, unshared.
    // doc 4 is 19 words → no windows at all.
    val shared = words(20, "s")
    val docs = Seq(
      (1L, shared), (2L, shared), (3L, words(20, "u")), (4L, words(19, "v"))
    ).toDF("doc_id", "text")
    val out = Dedup.duplicatePassages(docs, window = 20, stride = 10)
      .orderBy("doc_id")
      .select("doc_id", "n_windows", "n_shared", "shared_frac", "has_dup_passage")
      .collect()
    assert(out(0) === Row(1L, 1L, 1L, 1.0, true))
    assert(out(1) === Row(2L, 1L, 1L, 1.0, true))
    assert(out(2) === Row(3L, 1L, 0L, 0.0, false))
    assert(out(3) === Row(4L, 0L, 0L, 0.0, false))
  }

  test("stride windows: a copied half shows partial coverage") {
    // doc 1 = A(30 words); doc 2 = B(10) ++ A's first 20 words.
    // doc 1 windows (stride 10, window 20): [a0..a19], [a10..a29] → 2.
    // doc 2 windows: [b0..b9 a0..a9], [a0..a19] → 2; the second equals
    // doc 1's first → each doc has exactly one shared window.
    val a = (0 until 30).map(i => s"a$i")
    val doc1 = a.mkString(" ")
    val doc2 = ((0 until 10).map(i => s"b$i") ++ a.take(20)).mkString(" ")
    val out = Dedup.duplicatePassages(
      Seq((1L, doc1), (2L, doc2)).toDF("doc_id", "text"), 20, 10)
      .orderBy("doc_id")
      .select("doc_id", "n_windows", "n_shared", "shared_frac")
      .collect()
    assert(out(0) === Row(1L, 2L, 1L, 0.5))
    assert(out(1) === Row(2L, 2L, 1L, 0.5))
  }

  test("a passage repeated only within one document is not cross-doc shared") {
    val p = words(20, "p")
    // the same 20-word passage appears twice in ONE doc (positions 0 and 20)
    val docs = Seq((1L, s"$p $p"), (2L, words(20, "z"))).toDF("doc_id", "text")
    val out = Dedup.duplicatePassages(docs, 20, 10).orderBy("doc_id")
      .select("doc_id", "n_shared").as[(Long, Long)].collect()
    assert(out === Array((1L, 0L), (2L, 0L)))
  }

  test("removeDupSpans cuts exactly the shared span and keeps the rest in order") {
    // doc 1 = A(20) ++ tail1(10); doc 2 = head2(10) ++ A(20); doc 3 clean.
    // Windows (w=20, s=10): doc 1 [A], [a10..t9]; doc 2 [h0..a9], [A].
    // Only [A] is shared, so doc 1 loses words 0-19 (keeps tail1), doc 2
    // loses words 10-29 (keeps head2), doc 3 is byte-identical.
    val a = (0 until 20).map(i => s"a$i")
    val tail1 = (0 until 10).map(i => s"t$i")
    val head2 = (0 until 10).map(i => s"h$i")
    val docs = Seq(
      (1L, (a ++ tail1).mkString(" ")),
      (2L, (head2 ++ a).mkString(" ")),
      (3L, words(25, "z"))
    ).toDF("doc_id", "text")
    val out = Dedup.removeDupSpans(docs, window = 20, stride = 10)
      .orderBy("doc_id")
      .select("doc_id", "n_words", "n_kept", "text_dedup")
      .as[(Long, Long, Long, String)].collect()
    assert(out(0) === ((1L, 30L, 10L, tail1.mkString(" "))))
    assert(out(1) === ((2L, 30L, 10L, head2.mkString(" "))))
    assert(out(2) === ((3L, 25L, 25L, words(25, "z"))))
  }

  test("removeDupSpans matches a driver-side reference on random corpora") {
    val rnd = new scala.util.Random(17)
    val W = 8; val S = 4 // small window/stride so coverage shapes vary
    // shared phrase pool so cross-doc window collisions actually occur
    val phrases = Vector.tabulate(6)(p => (0 until W).map(i => s"p${p}w$i"))
    def doc(): String =
      (0 until 2 + rnd.nextInt(4)).flatMap { _ =>
        if (rnd.nextBoolean()) phrases(rnd.nextInt(phrases.length))
        else (0 until 1 + rnd.nextInt(6)).map(_ => s"u${rnd.nextInt(100000)}")
      }.mkString(" ")
    val docs = (0L until 40L).map(i => (i, doc()))
    // reference: window hashes -> >=2-distinct-doc hashes -> coverage -> rebuild
    val wins = docs.flatMap { case (id, t) =>
      val ws = t.split(" ", -1)
      if (ws.length < W) Seq.empty
      else (0 to (ws.length - W) / S).map { j =>
        (id, j * S, ws.slice(j * S, j * S + W).mkString(" "))
      }
    }
    val dup = wins.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= 2).keySet
    val expect = docs.map { case (id, t) =>
      val ws = t.split(" ", -1)
      val starts = wins.filter(w => w._1 == id && dup(w._3)).map(_._2)
      val kept =
        if (starts.isEmpty) ws.toSeq
        else ws.indices.filterNot(i => starts.exists(p => p <= i && i < p + W))
          .map(ws)
      (id, ws.length.toLong, kept.size.toLong,
        if (starts.isEmpty) t else kept.mkString(" "))
    }
    assert(expect.exists(e => e._3 < e._2), "corpus must exercise removal")
    import spark.implicits._
    val got = Dedup.removeDupSpans(docs.toDF("doc_id", "text"), W, S)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got === expect)
  }

  test("removeDupSpans empties a fully-duplicated doc and never a short one") {
    val shared = words(20, "s")
    val docs = Seq((1L, shared), (2L, shared), (3L, words(19, "q")))
      .toDF("doc_id", "text")
    val out = Dedup.removeDupSpans(docs, 20, 10).orderBy("doc_id")
      .select("doc_id", "n_kept", "text_dedup")
      .as[(Long, Long, String)].collect()
    assert(out(0) === ((1L, 0L, "")))
    assert(out(1) === ((2L, 0L, "")))
    assert(out(2) === ((3L, 19L, words(19, "q"))))
  }
}
