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
    // scalar format carries no cpu: recorded as -1 (the cpu trigger's
    // "no prior cpu" sentinel)
    assert(prior("q1_agg") == ((1.087, -1.0)))
    assert(prior("filter_cel_time") == ((13.826, -1.0)))
    assert(prior("scale:q1_agg") == ((0.674, -1.0)))
    assert(prior("scale26:dedup_phash_neardup") == ((48.686, -1.0)))
  }

  test("priorDetail parses the r13+ object format and picks the newest eligible round") {
    val dir = Files.createTempDirectory("prior_new").toFile
    // an older file that must NOT win
    Files.writeString(new java.io.File(dir, "bench_detail_r11.json").toPath,
      """{"queries":{"q1_agg":9.999}}""")
    Files.writeString(new java.io.File(dir, "bench_detail_r12.json").toPath,
      """{"round":12,"machine":{"cpus":32,"load_start":0.5,"load_end":1.0},
        |"queries":{"q1_agg":{"sec":1.087,"cpu_sec":4.2,"gc_ms":12,"load0":0.5,"load1":0.6}},
        |"scale":{"factor":10,"rows":{"q1_agg":{"ratio":0.62,"sec":0.674,"base":1.087,"cpu_sec":2.0}}},
        |"adjudication":[],"probe_group_histograms":{}}""".stripMargin)
    // a LATER round's file must be ignored...
    Files.writeString(new java.io.File(dir, "bench_detail_r14.json").toPath,
      """{"queries":{"q1_agg":5.555}}""")
    val prior = Bench.priorDetail(13, dir)
    // the object format carries cpu_sec alongside sec
    assert(prior("q1_agg") == ((1.087, 4.2)))
    assert(prior("scale:q1_agg") == ((0.674, 2.0)))
    // ...but a SAME-round artifact (the builder's committed full run) is
    // the PREFERRED baseline (r16): the driver's official run adjudicates
    // against same-code numbers, so its triggers fire on environment
    // inflation alone
    Files.writeString(new java.io.File(dir, "bench_detail_r13.json").toPath,
      """{"queries":{"q1_agg":{"sec":2.222,"cpu_sec":8.8,"gc_ms":1,"load0":0.1,"load1":0.1}}}""")
    val prior2 = Bench.priorDetail(13, dir)
    assert(prior2("q1_agg") == ((2.222, 8.8)))
  }

  test("priorDetail is empty (not throwing) without committed artifacts") {
    val dir = Files.createTempDirectory("prior_none").toFile
    assert(Bench.priorDetail(13, dir).isEmpty)
    assert(Bench.priorDetail(13, new java.io.File(dir, "nope")).isEmpty)
  }

  test("chronicDiverges: >2x wall/cpu either direction at material magnitude; floors hold") {
    // wall regressed and wall collapsed both diverge
    assert(Bench.chronicDiverges(Some((14.0, 60.0)), 58.6, 1363.7))
    assert(Bench.chronicDiverges(Some((14.0, 60.0)), 5.0, 60.0))
    // within 2x either way: settled
    assert(!Bench.chronicDiverges(Some((14.0, 60.0)), 17.9, 67.0))
    assert(!Bench.chronicDiverges(Some((14.0, 60.0)), 7.5, 40.0))
    // cpu-only divergence at material magnitude fires even with wall ok
    assert(Bench.chronicDiverges(Some((14.0, 60.0)), 15.0, 9.0))
    // floors: sub-2s wall jitter and sub-5 cpu-s never trigger
    assert(!Bench.chronicDiverges(Some((0.5, 1.0)), 1.4, 2.9))
    assert(!Bench.chronicDiverges(Some((0.3, -1.0)), 0.05, 0.1))
    // unknown prior cpu disables the cpu arm, wall arm still works
    assert(Bench.chronicDiverges(Some((14.0, -1.0)), 58.6, 1363.7))
    assert(!Bench.chronicDiverges(Some((14.0, -1.0)), 15.0, 1363.7))
    // no prior row: nothing to disagree with
    assert(!Bench.chronicDiverges(None, 58.6, 1363.7))
  }

  test("chronicFamilies: real JSON parse, key order independent, unsettled is sticky") {
    val dir = Files.createTempDirectory("chronic").toFile
    // r18: verdict BEFORE query (the exact reordering the old regex
    // scraper silently dropped, ADVICE r19), plus a nested brace in a
    // trigger string
    Files.writeString(new java.io.File(dir, "bench_detail_r18.json").toPath,
      """{"round":18,"queries":{},
        |"adjudication":[
        | {"verdict":"chunk-deflated","tag":"scale","query":"text_html_extract","trigger":"wall<prior/3(7.0)"},
        | {"tag":"scale100","query":"dedup_keep_best","trigger":"x{y}","verdict":"cpu-divergent(reproduced)"},
        | {"tag":"base","query":"noise_row","verdict":"environmental"}
        |]}""".stripMargin)
    // r19: one family re-flagged via the r20 unsettled verdict, one
    // graduated family carried by solo-first, one flagged only here
    Files.writeString(new java.io.File(dir, "bench_detail_r19.json").toPath,
      """{"round":19,"queries":{},
        |"adjudication":[
        | {"tag":"scale","query":"text_html_extract","verdict":"solo-first"},
        | {"tag":"scale100","query":"dedup_keep_best","verdict":"unsettled"},
        | {"tag":"base","query":"only_once","verdict":"chunk-deflated"}
        |]}""".stripMargin)
    assert(Bench.chronicFamilies(20, dir) ==
      Set("text_html_extract", "dedup_keep_best"))
    // a single flagged round is not chronic
    assert(!Bench.chronicFamilies(20, dir).contains("only_once"))
    // fewer than two artifacts: empty, never throwing
    assert(Bench.chronicFamilies(18, dir).isEmpty)
  }

  test("trigger matrix: regression, prior-inflation, idle-heavy, and the floors") {
    // wall-only helper: prior cpu unavailable (-1), the pre-r16 shape
    def t(prior: Option[Double], wall: Double, cpu: Double) =
      Bench.triggerOf(prior.map(p => (p, -1.0)), wall, cpu)
    // regression: wall > 3x prior, but only at >= 0.75s wall
    assert(t(Some(0.55), 13.83, 100.0).exists(_.startsWith("wall>3x_prior")))
    assert(t(Some(0.10), 0.50, 10.0).isEmpty) // under the 0.75s floor
    assert(t(Some(1.00), 2.50, 50.0).isEmpty) // 2.5x is not 3x
    // prior-inflation, /3 rule: five r12 noise victims' shapes all fire it
    Seq((13.83, 0.55), (3.26, 0.59), (5.08, 1.60), (1.19, 0.27),
      (1.14, 0.30)).foreach { case (prior, honest) =>
      assert(t(Some(prior), honest, honest * 20)
        .exists(_.startsWith("wall<prior/3")), s"prior=$prior honest=$honest")
    }
    // prior-inflation, /2 rule: only ~2x down but prior >= 2s — the label
    // must name the rule that actually fired (r14 split)
    assert(t(Some(48.69), 22.9, 458.0).exists(_.startsWith("wall<prior/2")))
    assert(t(Some(0.50), 0.10, 2.0).isEmpty)  // prior under the floor
    assert(t(Some(1.50), 0.70, 14.0).isEmpty) // 2.1x down, small prior: not 3x
    assert(t(Some(2.50), 1.20, 24.0).exists(_.startsWith("wall<prior/2"))) // 2x down, big prior
    // idle-heavy: >= 2s and wall/cpu > 1.5
    assert(t(None, 3.0, 1.0) == Some("wall/cpu>1.5"))
    assert(t(None, 1.0, 0.1).isEmpty)  // under the 2s floor
    assert(t(None, 3.0, 60.0).isEmpty) // busy query: cpu >> wall
    assert(t(None, 3.0, -1.0).isEmpty) // cpu bean unavailable
    // no prior, honest busy query: nothing fires
    assert(t(None, 10.0, 200.0).isEmpty)
  }

  test("cpu trigger closes the 1.5-3x wall blind spot (r15 VERDICT #2)") {
    def tc(priorWall: Double, priorCpu: Double, wall: Double, cpu: Double) =
      Bench.triggerOf(Some((priorWall, priorCpu)), wall, cpu)
    // the r15 escape: dedup_minhash_sig 0.66s/9.1cpu -> 1.72s/27.6cpu —
    // wall 2.6x (under the 3x trigger) but cpu 3x; must now fire
    assert(tc(0.66, 9.1, 1.72, 27.6).exists(_.startsWith("cpu>2x_prior")))
    // floors: absolute magnitude below 5 cpu-sec never fires (sub-second
    // noise), and exactly 2x is not > 2x
    assert(tc(0.20, 1.5, 0.50, 4.0).isEmpty)
    assert(tc(1.00, 10.0, 1.50, 20.0).isEmpty)
    assert(tc(1.00, 10.0, 1.50, 20.1).exists(_.startsWith("cpu>2x_prior")))
    // no prior cpu recorded (pre-r16 artifact, or bean unavailable): the
    // cpu rule stays silent rather than comparing against -1
    assert(Bench.triggerOf(Some((1.0, -1.0)), 1.5, 30.0).isEmpty)
    // wall rules outrank the cpu rule: a 3x wall regression keeps its
    // wall label even when cpu also doubled
    assert(tc(0.50, 5.0, 1.60, 12.0).exists(_.startsWith("wall>3x_prior")))
  }

  test("verdictOf is three-valued and symmetric around the 1.5x envelope") {
    // the r13 judge's four mislabeled rows: solo 3-5x SLOWER than the
    // published chunk number must NOT read `reproduced`
    assert(Bench.verdictOf(2.06, 10.51) == "chunk-deflated") // keyframe 10x
    assert(Bench.verdictOf(2.68, 13.07) == "chunk-deflated") // ngram 26x
    assert(Bench.verdictOf(2.63, 8.25) == "chunk-deflated")  // html 10x
    // the original direction still labels load noise
    assert(Bench.verdictOf(48.69, 22.9) == "environmental")
    assert(Bench.verdictOf(13.83, 0.47) == "environmental")
    // inside the envelope both ways
    assert(Bench.verdictOf(2.0, 2.0) == "reproduced")
    assert(Bench.verdictOf(2.0, 2.9) == "reproduced")
    assert(Bench.verdictOf(2.0, 1.4) == "reproduced")
    // boundaries: exactly 1.5x either way is still reproduced
    assert(Bench.verdictOf(3.0, 2.0) == "reproduced")
    assert(Bench.verdictOf(2.0, 3.0) == "reproduced")
  }

  test("verdictOf flags a >2x cpu disagreement as cpu-divergent, never silently adopted") {
    // VERDICT r17 #3: keep_best 100× — wall within envelope, cpu 26× apart
    // (12.6 s/50 cpu builder vs 45.2 s/1299 cpu driver-solo): the row
    // measured different WORK and must read as not-reproduced
    assert(Bench.verdictOf(12.6, 45.2, 50.0, 1299.0) ==
      "cpu-divergent(chunk-deflated)")
    assert(Bench.verdictOf(12.6, 13.8, 50.0, 1299.0) ==
      "cpu-divergent(reproduced)")
    assert(Bench.verdictOf(12.6, 13.8, 1299.0, 50.0) ==
      "cpu-divergent(reproduced)")
    // agreement within 2x cpu stays a plain wall verdict
    assert(Bench.verdictOf(12.6, 13.8, 50.0, 80.0) == "reproduced")
    // immaterial cpu (< 5 cpu-s both sides) never triggers the flag —
    // sub-second cpu is scheduler noise
    assert(Bench.verdictOf(0.5, 0.6, 0.2, 0.9) == "reproduced")
    // unknown cpu (-1 sentinel) degrades to the wall-only verdict
    assert(Bench.verdictOf(2.0, 2.9, -1.0, 140.0) == "reproduced")
  }

  test("stream_neardup_ingest histogram reports distinct-fp state widths") {
    // needs a real session + testdata - guard like the artifact test
    val sf = "/root/testdata/sf0.001"
    if (new java.io.File(sf).isDirectory) {
      import org.apache.spark.sql.functions._
      val spark = graft.GraftSession.local()
      val rows = Bench.probeHistograms("stream_neardup_ingest")(spark, sf)
        .collect()
      assert(rows.nonEmpty)
      // shape: (log2_width, n_groups, max_width, uncapped_pairs, capped_pairs)
      val totalGroups = rows.map(_.getLong(1)).sum
      val maxWidth = rows.map(_.getLong(2)).max
      assert(totalGroups > 0 && maxWidth >= 1)
      // the stage's 2^20 maxState cap must be inert at this scale:
      // capped == uncapped on every bucket
      rows.foreach(r => assert(r.getLong(4) == r.getLong(3),
        s"stream state cap engaged at sf0.001 - unexpected: $r"))
      // the histogram measures DISTINCT-fingerprint state, not events:
      // each distinct (type, fp) contributes exactly 3 block rows, so no
      // single (type, block, value) group can exceed the distinct count
      val distinctFps = Tables.events(spark, sf).select(
        coalesce(col("event_type"), lit("\u001a")).as("t"),
        graft.functions.SimHash(
          split(coalesce(col("props"), lit("\u001a")), " ", -1),
          graft.streaming.StreamNearDedup.Bits).as("fp"))
        .distinct().count()
      assert(maxWidth <= distinctFps,
        s"a group wider ($maxWidth) than the distinct-fp count ($distinctFps)")
      graft.GraftSession.sweepPersisted(spark)
    }
  }

  test("the stdout line stays inside the driver's tail window at any registry size") {
    // rounds 12-14 overflowed the 2000-char tail and shipped parsed:null;
    // the budget must hold for a registry far larger than today's, with
    // failures, three scale tiers, and all four verdict kinds present
    val walls = (1 to 400).map(i => (f"query_with_a_long_name_$i%03d", i * 0.173))
    val failed = (1 to 20).map(i => s"failed_query_$i")
    val ratios =
      (1 to 120).map(i => ("scale", 10, s"scaled_query_name_$i", i * 0.31)) ++
        (1 to 40).map(i => ("scale26", 26, s"capped_query_name_$i", i * 0.17)) ++
        (1 to 10).map(i => ("scale100", 100, s"headline_query_$i", i * 1.1)) ++
        (1 to 6).map(i => ("scaleF", 10, s"fresh_stream_query_$i", i * 0.9))
    val verdicts = Seq("reproduced", "environmental", "chunk-deflated",
      "unresolved", "reproduced")
    val line = Bench.buildFinalLine(walls, failed, ratios,
      "/root/testdata/sf0.1", verdicts)
    assert(line.length <= Bench.LineBudget,
      s"line is ${line.length} chars, budget ${Bench.LineBudget}")
    // and it is one VALID JSON object with the exact total preserved
    assert(line.startsWith("{") && line.endsWith("}"))
    assert(line.contains(""""chunk_deflated":1"""))
    assert(line.contains(""""other":"""))
    val expectTotal = walls.map(_._2).sum
    val gotTotal = """"value":([0-9.]+)""".r.findFirstMatchIn(line).get.group(1).toDouble
    assert(math.abs(gotTotal - expectTotal) < 0.01)
    // every kept per-query value plus "other" must re-sum to the total
    val qBlock = Bench.braceBlock(line, line.indexOf("\"queries\""))
    val entries = """"[^"]+":([0-9.]+)""".r.findAllMatchIn(qBlock)
      .map(_.group(1).toDouble).toSeq
    assert(math.abs(entries.sum - expectTotal) < 0.05)

    // mass-failure round: the failed LIST is budgeted (a ~70-name list
    // alone would overflow the tail), but failed_n carries the true count
    val massFailed = (1 to 150).map(i => f"failed_query_with_long_name_$i%03d")
    val line2 = Bench.buildFinalLine(walls, massFailed, ratios,
      "/root/testdata/sf0.1", verdicts)
    assert(line2.length <= Bench.LineBudget,
      s"mass-failure line is ${line2.length} chars")
    assert(line2.contains(""""failed_n":150"""))
    assert(line2.contains(""""failed":["""))
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
