package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The bench adjudicator's baseline parsing (r12 VERDICT #1): the
  * coordinator compares this round's wall times against the NEWEST
  * committed `bench_detail_r<k>.json` below the current round, in both
  * the pre-r13 scalar per-query format and the r13+ object format, plus
  * the scale-row `{"ratio":..,"sec":..}` shape. A parse regression here
  * would silently disable cross-round adjudication, so the shapes are
  * pinned.
  */
class BenchAdjudicationSpec extends AnyFunSuite {

  test("braceBlock extracts a balanced block") {
    val txt = """x "queries":{"a":{"b":1},"c":2} tail"""
    assert(Bench.braceBlock(txt, txt.indexOf("\"queries\"")) ==
      """{"a":{"b":1},"c":2}""")
    assert(Bench.braceBlock("no brace here", 0) == "")
    assert(Bench.braceBlock("{unclosed", 0) == "")
  }

  test("priorDetail parses the pre-r13 scalar format and scale rows") {
    val dir = Files.createTempDirectory("prior_old").toFile
    Files.writeString(new java.io.File(dir, "bench_detail_r12.json").toPath,
      """{"round":12,"sf":"x","total":1.0,"n_queries":2,"failed":[],
        |"queries":{"q1_agg":1.087,"filter_cel_time":13.826},
        |"scale":{"factor":10,"rows":{"q1_agg":{"ratio":0.62,"sec":0.674,"base":1.087}}},
        |"scale26":{"factor":26,"rows":{"dedup_phash_neardup":{"ratio":45.41,"sec":48.686,"base":1.072}}},
        |"probe_group_histograms":{}}""".stripMargin)
    val prior = Bench.priorDetail(13, dir)
    assert(prior("q1_agg") == 1.087)
    assert(prior("filter_cel_time") == 13.826)
    assert(prior("scale:q1_agg") == 0.674)
    assert(prior("scale26:dedup_phash_neardup") == 48.686)
  }

  test("priorDetail parses the r13+ object format and picks the newest prior round") {
    val dir = Files.createTempDirectory("prior_new").toFile
    // an older file that must NOT win
    Files.writeString(new java.io.File(dir, "bench_detail_r11.json").toPath,
      """{"queries":{"q1_agg":9.999}}""")
    Files.writeString(new java.io.File(dir, "bench_detail_r12.json").toPath,
      """{"round":12,"machine":{"cpus":32,"load_start":0.5,"load_end":1.0},
        |"queries":{"q1_agg":{"sec":1.087,"cpu_sec":4.2,"gc_ms":12,"load0":0.5,"load1":0.6}},
        |"scale":{"factor":10,"rows":{"q1_agg":{"ratio":0.62,"sec":0.674,"base":1.087,"cpu_sec":2.0}}},
        |"adjudication":[],"probe_group_histograms":{}}""".stripMargin)
    // a FUTURE file (same round) that must be ignored
    Files.writeString(new java.io.File(dir, "bench_detail_r13.json").toPath,
      """{"queries":{"q1_agg":5.555}}""")
    val prior = Bench.priorDetail(13, dir)
    assert(prior("q1_agg") == 1.087)
    assert(prior("scale:q1_agg") == 0.674)
  }

  test("priorDetail is empty (not throwing) without committed artifacts") {
    val dir = Files.createTempDirectory("prior_none").toFile
    assert(Bench.priorDetail(13, dir).isEmpty)
    assert(Bench.priorDetail(13, new java.io.File(dir, "nope")).isEmpty)
  }

  test("the committed r12 artifact parses (the baseline the r13 run will use)") {
    // repo-root artifact: the real input to the first adjudicating round
    val repo = new java.io.File(".")
    if (new java.io.File(repo, "bench_detail_r12.json").exists) {
      val prior = Bench.priorDetail(13, repo)
      assert(prior.nonEmpty)
      assert(prior.contains("q1_agg"))
      assert(prior.keys.exists(_.startsWith("scale26:")))
    }
  }
}
