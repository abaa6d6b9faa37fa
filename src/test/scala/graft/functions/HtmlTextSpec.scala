package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[HtmlText]] one-pass extraction: visible-text semantics on well-formed
  * pages, conservative (never-throwing) behavior on malformed ones.
  */
class HtmlTextSpec extends SparkSpec {

  private def run(html: String*): Seq[(String, Long)] = {
    import spark.implicits._
    val h = HtmlText(col("html"))
    html.zipWithIndex.map { case (s, i) => (i, s) }.toDF("id", "html")
      .select(col("id"), h.getField("text").as("t"), h.getField("n_links").as("l"))
      .orderBy("id").as[(Int, String, Long)].collect().toSeq
      .map(r => (r._2, r._3))
  }

  test("strips tags, scripts, styles, comments; decodes entities") {
    val out = run(
      "<html><body><h1>Title</h1><p>one <b>two</b> three</p></body></html>",
      "<script>var x = 1 < 2; '</p>'</script>after",
      "<style>.a{color:red}</style>visible",
      "before<!-- hidden <p>still hidden</p> -->after",
      "Fish &amp; chips &lt;tag&gt; &quot;q&quot; &#39;s&#39; a&nbsp;b",
      "no markup at all",
      "  collapse \t runs \n of   space  ")
    assert(out(0) === (("Title one two three", 0L)))
    assert(out(1) === (("after", 0L)))
    assert(out(2) === (("visible", 0L)))
    assert(out(3) === (("before after", 0L)))
    assert(out(4) === (("Fish & chips <tag> \"q\" 's' a b", 0L)))
    assert(out(5) === (("no markup at all", 0L)))
    assert(out(6) === (("collapse runs of space", 0L)))
  }

  test("counts <a> open tags only; unknown entities copy through") {
    val out = run(
      """x <a href="/u">link</a> y <a>bare</a> z </a><abbr>na</abbr>""",
      "keep &copy; and &unknown; literal",
      "tricky &am p; &#x27; partials")
    // <abbr> must not count: 'a' followed by a letter is a different tag
    assert(out(0) === (("x link y bare z na", 2L)))
    assert(out(1) === (("keep &copy; and &unknown; literal", 0L)))
    assert(out(2) === (("tricky &am p; &#x27; partials", 0L)))
  }

  test("malformed input is conservative, never throws") {
    val out = run(
      "unterminated <tag stays open",
      "unterminated <script>never closes",
      "unterminated <!-- comment",
      "<a", // link at EOF, no tag body
      "",
      "<>empty tag<> x")
    assert(out(0) === (("unterminated", 0L)))
    assert(out(1) === (("unterminated", 0L)))
    assert(out(2) === (("unterminated", 0L)))
    assert(out(3) === (("", 1L)))
    assert(out(4) === (("", 0L)))
    assert(out(5) === (("empty tag x", 0L)))
  }

  test("multi-byte text copies through untouched") {
    val out = run("<p>héllo wörld — 北京 &amp; done</p>")
    assert(out(0) === (("héllo wörld — 北京 & done", 0L)))
  }
}
