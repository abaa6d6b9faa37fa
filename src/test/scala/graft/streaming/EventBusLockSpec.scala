package graft.streaming

import graft.{SparkSpec, Tables}
import graft.model.EventView
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The r17 append-safety seams: the per-path append lock (one lock per
  * DIRECTORY, however the path is spelled — the FileOutputCommitter's
  * shared `_temporary` staging loses files under concurrent same-dir
  * commits) and the boundary probe's partition-scheme independence (r18:
  * footer-stats-exact for ANY scheme — a lexicographic-max directory
  * need not hold the max sequence, so no directory pruning is trusted).
  */
class EventBusLockSpec extends SparkSpec {

  test("appendLock: one lock per directory across path spellings") {
    val dir = Files.createTempDirectory("lockid").toString
    assert(EventBus.appendLock(dir) eq EventBus.appendLock(dir + "/"),
      "trailing-slash spelling must share the lock")
    assert(EventBus.appendLock(dir) eq
      EventBus.appendLock(dir + "/sub/.."),
      "normalized spelling must share the lock")
  }

  test("concurrent appends to one bus lose nothing") {
    val bus = EventBus(Files.createTempDirectory("lockcc").toString)
    val base = EventView.fromEventsTable(Tables.events(spark, sf))
      .filter(col("sequence_number") < 64)
    // 8 threads x 4 disjoint slices each, all racing the same directory;
    // with the per-path lock every commit lands whole
    val slices = (0 until 32).map(i =>
      base.filter(col("sequence_number") % 32 === i))
    val threads = (0 until 8).map { t =>
      new Thread(() => (0 until 4).foreach { j =>
        bus.append(slices(t * 4 + j))
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    assert(bus.read(spark).count() == base.count(),
      "every concurrently-appended row must survive commit")
    assert(bus.read(spark).select("sequence_number").distinct().count()
      == base.count())
  }

  test("footer probe ignores files staged under a hidden directory") {
    // a mid-commit (or crashed) append leaves parts under the
    // committer's `_temporary`: complete-but-uncommitted files must not
    // OVERSHOOT the high-water mark (the attach guard would then exclude
    // sequences that commit later, permanently), and a garbled staged
    // footer must not poison the probe
    val dir = Files.createTempDirectory("busstg").toString
    val bus = EventBus(dir)
    val base = EventView.fromEventsTable(Tables.events(spark, sf))
    bus.append(base.filter(col("sequence_number") < 40))
    // stage a COMPLETE part carrying much higher sequences where a
    // crashed commit would leave it
    val stage = Files.createTempDirectory("busstg2").toString
    base.filter(col("sequence_number") >= 100 && col("sequence_number") < 120)
      .coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).head
    val tmpDir = Files.createDirectories(
      java.nio.file.Paths.get(dir, "_temporary", "0"))
    Files.copy(part.toPath, tmpDir.resolve(part.getName))
    assert(bus.maxSequenceFrame(spark).head.getLong(0) == 39L,
      "staged parts must not overshoot the boundary")
    assert(bus.readAboveSequence(spark, 39L)
      .filter(col("sequence_number") > 39L).count() == 0L,
      "delta reads must not surface staged parts")
  }

  test("maxSequenceFrame: exact under partition schemes where directory " +
      "order contradicts sequence order") {
    val dir = Files.createTempDirectory("busnp").toString
    val bus = EventBus(dir)
    val base = EventView.fromEventsTable(Tables.events(spark, sf))
      .filter(col("sequence_number") < 40)
    // partitioned by bus NAME: the lexicographically greatest directory
    // ("z-bus") holds the LOWEST sequences — any directory pruning here
    // would answer the wrong max; the footer-stats probe doesn't care
    bus.appendPartitioned(base.filter(col("sequence_number") < 20)
      .withColumn("bus", lit("z-bus")), "bus")
    bus.appendPartitioned(base.filter(col("sequence_number") >= 20)
      .withColumn("bus", lit("a-bus")), "bus")
    val expected = bus.read(spark).agg(max(col("sequence_number")))
      .head.getLong(0)
    assert(bus.maxSequenceFrame(spark).head.getLong(0) == expected,
      "directory order must not influence the probe")
    // numeric date-SHAPED but non-ISO values too
    val dir2 = Files.createTempDirectory("busnp2").toString
    val bus2 = EventBus(dir2)
    bus2.appendPartitioned(base.filter(col("sequence_number") < 20)
      .withColumn("d", lit("9")), "d")
    bus2.appendPartitioned(base.filter(col("sequence_number") >= 20)
      .withColumn("d", lit("10")), "d")
    assert(bus2.maxSequenceFrame(spark).head.getLong(0) ==
      bus2.read(spark).agg(max(col("sequence_number"))).head.getLong(0))
  }

  test("footer probe: concurrent cold reads (driver pool) stay exact on a many-file bus") {
    // a cold probe's memo-miss footers are read by the bounded driver
    // pool (> 1 miss) — the path a restarted driver takes on a bus its
    // memo has never seen. 80 single-row files make the fan-out real.
    val dir = Files.createTempDirectory("buspool").toString
    val bus = EventBus(dir)
    val base = EventView.fromEventsTable(Tables.events(spark, sf))
      .filter(col("sequence_number") < 80).repartition(80, col("id"))
    bus.append(base)
    val expected = bus.read(spark).agg(max(col("sequence_number")))
      .head.getLong(0)
    assert(bus.maxSequenceFrame(spark).head.getLong(0) == expected)
    // memo-warm repeat answers the same (listing-only path)
    assert(bus.maxSequenceFrame(spark).head.getLong(0) == expected)
    assert(bus.readAboveSequence(spark, expected)
      .filter(col("sequence_number") > expected).count() == 0L)
  }

  test("footer memo tracks the live file set: stale entries pruned, probe stays exact") {
    // memory bound = O(live files) per bus, enforced by pruning against
    // each probe's fresh listing — NOT a coarse clear, which on a bus
    // above the cap would force every probe to re-read every footer
    // (O(files) metadata RPCs per delta round at the 100 TB layout)
    val dir = Files.createTempDirectory("busmemo").toString
    val bus = EventBus(dir)
    val base = EventView.fromEventsTable(Tables.events(spark, sf))
      .filter(col("sequence_number") < 40).repartition(10, col("id"))
    bus.append(base)
    val n0 = bus.read(spark).inputFiles.length
    assert(bus.maxSequenceFrame(spark).head.getLong(0) ==
      bus.read(spark).agg(max(col("sequence_number"))).head.getLong(0))
    assert(EventBus.footerMemoSize(dir) == n0,
      s"memo must hold exactly the live files after a probe ($n0)")
    // a compaction-style rewrite: delete the file holding the max, the
    // next probe prunes its entry and answers from what remains
    val stats = EventBus.footerStats(spark, dir)
    val top = stats.maxBy(_.max)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(top.file), false)
    val expected = bus.read(spark).agg(max(col("sequence_number")))
      .head.getLong(0)
    assert(bus.maxSequenceFrame(spark).head.getLong(0) == expected,
      "probe must answer from the surviving files")
    assert(EventBus.footerMemoSize(dir) == n0 - 1,
      "the deleted file's memo entry must be pruned")
  }

  test("untrusted footer stats degrade the probe to the data aggregate — slower, never wrong") {
    // the load-bearing fallback: a committed file whose sequence_number
    // stats are MISSING (here: written with statistics disabled) must
    // poison footer-only answers for the whole bus — the probe computes
    // from DATA and still finds that file's sequences. A refactor that
    // skipped untrusted files instead of falling back would answer the
    // trusted-footer max (39 here) and silently lose the catch-up rows
    // above it.
    val dir = Files.createTempDirectory("busnostat").toString
    val bus = EventBus(dir)
    val base = EventView.fromEventsTable(Tables.events(spark, sf))
    bus.append(base.filter(col("sequence_number") < 40))
    // a stats-less int64 part, committed (not hidden), holding the true max
    val schema = org.apache.parquet.schema.MessageTypeParser.parseMessageType(
      "message spark_schema { required int64 sequence_number; }")
    val w = org.apache.parquet.hadoop.example.ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(s"$dir/part-nostats-0.parquet"))
      .withConf(spark.sparkContext.hadoopConfiguration)
      .withType(schema)
      .withStatisticsEnabled(false)
      .build()
    val gf = new org.apache.parquet.example.data.simple.SimpleGroupFactory(schema)
    (100L to 110L).foreach { s =>
      w.write(gf.newGroup().append("sequence_number", s))
    }
    w.close()
    val stats = EventBus.footerStats(spark, dir)
    assert(stats.exists(!_.trusted),
      "a stats-less file must read as untrusted, not be skipped")
    assert(bus.maxSequenceFrame(spark).head.getLong(0) == 110L,
      "the probe must fall back to the data aggregate and find the true max")
    // delta reads conservatively include the untrusted file
    assert(bus.readAboveSequence(spark, 39L)
      .filter(col("sequence_number") > 39L).count() == 11L,
      "rows above the trusted-footer max must still be served")
  }

  test("footer probe: the distributed read path (threshold forced low) stays exact") {
    // above graft.bus.footer.distributedThreshold the memo-miss footers
    // are read as ONE Spark job — the 100 TB cold-driver path (a million
    // serial driver-side footer RPCs would take hours; executors turn it
    // into a fan-out). Force the threshold to 2 so a 12-file bus takes it.
    val dir = Files.createTempDirectory("busdist").toString
    val bus = EventBus(dir)
    val base = EventView.fromEventsTable(Tables.events(spark, sf))
      .filter(col("sequence_number") < 48).repartition(12, col("id"))
    bus.append(base)
    val prior = spark.conf.getOption("graft.bus.footer.distributedThreshold")
    spark.conf.set("graft.bus.footer.distributedThreshold", "2")
    try {
      val expected = bus.read(spark).agg(max(col("sequence_number")))
        .head.getLong(0)
      assert(bus.maxSequenceFrame(spark).head.getLong(0) == expected,
        "distributed footer read must answer the exact max")
      // delta pruning rides the same stats: nothing above the max
      assert(bus.readAboveSequence(spark, expected)
        .filter(col("sequence_number") > expected).count() == 0L)
      // and a mid-range boundary still surfaces exactly the tail
      val mid = expected / 2
      assert(bus.readAboveSequence(spark, mid)
        .filter(col("sequence_number") > mid).count() ==
        bus.read(spark).filter(col("sequence_number") > mid).count())
    } finally {
      prior match {
        case Some(v) => spark.conf.set("graft.bus.footer.distributedThreshold", v)
        case None => spark.conf.unset("graft.bus.footer.distributedThreshold")
      }
    }
  }
}
