package graft.streaming

import graft.{SparkSpec, Tables}
import graft.model.EventView
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** The dedup state-format guard (ADVICE r17 low): the r17 state-key
  * format change (E/F kind markers, U+001E escaping) silently orphans
  * pre-r17 checkpoint state — duplicates republished across the upgrade
  * go unflagged until the stale state TTLs out. r18 stamps every
  * horizoned checkpoint with a state-format version and fails fast on a
  * mismatched or pre-versioned checkpoint that already carries state.
  */
class StateFormatSpec extends SparkSpec {

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  test("fresh checkpoints are stamped; matching stamps pass; mismatches throw") {
    val ckpt = tmp("sfck")
    StreamNearDedup.ensureStateFormat(spark, ckpt)
    val marker = Paths.get(ckpt, "graft-state-format")
    assert(Files.exists(marker))
    assert(new String(Files.readAllBytes(marker), "UTF-8").trim ==
      StreamNearDedup.StateFormatVersion.toString)
    // a matching stamp is idempotent
    StreamNearDedup.ensureStateFormat(spark, ckpt)
    // a mismatched version fails fast with the operational remedy
    // (rewrite through the Hadoop fs so the local-fs checksum stays valid)
    val fs = new org.apache.hadoop.fs.Path(ckpt)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(
      new org.apache.hadoop.fs.Path(ckpt, "graft-state-format"), true)
    try out.write("1".getBytes("UTF-8")) finally out.close()
    val ex = intercept[IllegalStateException](
      StreamNearDedup.ensureStateFormat(spark, ckpt))
    assert(ex.getMessage.contains("fresh checkpoint"))
  }

  test("marker writes are atomic: no temp debris, whole content; a torn marker fails fast") {
    // VERDICT r18 wrong-finding #2: the old direct fs.create could be
    // torn by a crash mid-write, leaving a partial marker next to real
    // state — converting a crash into a forced fresh-checkpoint reset.
    // The temp+rename writer can never produce one: after stamping, the
    // marker is whole and no temp file remains.
    val ckpt = tmp("sfatomic")
    StreamNearDedup.ensureStateFormat(spark, ckpt)
    val entries = new java.io.File(ckpt).listFiles().map(_.getName)
    assert(!entries.exists(_.contains(".tmp-")),
      s"no temp debris after an atomic stamp: ${entries.mkString(",")}")
    assert(new String(Files.readAllBytes(
      Paths.get(ckpt, "graft-state-format")), "UTF-8").trim ==
      StreamNearDedup.StateFormatVersion.toString)
    // a TORN marker (what a pre-r19 crash could leave) still fails fast
    // with the remedy — fail-safe in both worlds, just no longer
    // self-inflicted
    val fs = new org.apache.hadoop.fs.Path(ckpt)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(
      new org.apache.hadoop.fs.Path(ckpt, "graft-state-format"), true)
    try out.write("".getBytes("UTF-8")) finally out.close()
    val ex = intercept[IllegalStateException](
      StreamNearDedup.ensureStateFormat(spark, ckpt))
    assert(ex.getMessage.contains("fresh checkpoint"))
  }

  test("a pre-versioned checkpoint that already has state is rejected") {
    // simulate an r17-or-earlier checkpoint: streaming state on disk,
    // no marker — its dedup groups sit under old-format keys, so a
    // resumed query would silently miss duplicates
    val ckpt = tmp("sfold")
    Files.createDirectories(Paths.get(ckpt, "offsets"))
    Files.write(Paths.get(ckpt, "offsets", "0"), "v1".getBytes("UTF-8"))
    val ex = intercept[IllegalStateException](
      StreamNearDedup.ensureStateFormat(spark, ckpt))
    assert(ex.getMessage.contains("pre-versioned"))
  }

  test("horizoned subscriptions stamp their checkpoint and refuse a stale one end-to-end") {
    val sourceBus = EventBus(tmp("sfsrc"))
    val ckpt = tmp("sfe2e")
    sourceBus.append(EventView.fromEventsTable(Tables.events(spark, sf))
      .filter(col("sequence_number") < 8))
    val spec = SubscriptionRunner.Spec(Seq.empty, None,
      SubscriptionRunner.Config("sub-sf",
        dedupHorizon = Some(java.time.Duration.ofHours(1))))
    val sink: SubscriptionRunner.Sink = _ => Right(())
    SubscriptionRunner.drain(spark, sourceBus, spec, sink, None, None, ckpt)
    val marker = Paths.get(ckpt, "graft-state-format")
    assert(Files.exists(marker), "a horizoned start() must stamp the checkpoint")
    // a same-version restart passes the gate (the EndToEndSpec restart
    // cases reuse stamped checkpoints end-to-end)
    StreamNearDedup.ensureStateFormat(spark, ckpt)
    // deleting the marker simulates a pre-r18 checkpoint: the restart
    // must fail fast instead of silently missing duplicates
    Files.delete(marker)
    intercept[IllegalStateException] {
      SubscriptionRunner.start(spark, sourceBus, spec, sink, None, None, ckpt)
    }
  }
}
