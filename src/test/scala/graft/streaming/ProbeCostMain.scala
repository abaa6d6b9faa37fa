package graft.streaming

import org.apache.spark.sql.functions._

/** Measurement harness (not a test): probe cost vs bus file count, for
  * the README's scale paragraph. Run with
  * `sbt "Test/runMain graft.streaming.ProbeCostMain"`.
  *
  * Compares the r19 manifest probe (LATEST pointer, O(1)) against the
  * footer-walk fallback (re-lists the bus every probe, O(files)) on
  * warm-memo buses of growing file counts — the VERDICT r18 #1 claim
  * under test is that the manifest probe does NOT grow with file count.
  */
object ProbeCostMain {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    val reps = 20
    println("[probecost] files(=commits*10)  manifest_ms  footerwalk_ms  " +
      "delta_files_read  earliest_ms  earliest_record_reads")
    Seq(300, 1000, 3000).foreach { n =>
      val dir = java.nio.file.Files.createTempDirectory(s"probecost$n")
        .toString
      val bus = EventBus(dir)
      // 10 files per commit → n/10 COMMITS, crossing the checkpoint
      // interval (64) twice by n=3000: the r20 column under test is that
      // an Earliest read's manifest cost is bounded by the interval, not
      // the append count (VERDICT r19 #1)
      val perCommit = 10
      (0 until n / perCommit).foreach { b =>
        bus.append(spark.range(b.toLong * perCommit,
          (b + 1).toLong * perCommit)
          .select(col("id").as("sequence_number")).repartition(perCommit))
      }
      def timeProbes(): Double = {
        bus.maxSequenceFrame(spark).head // warm
        val t0 = System.nanoTime()
        (1 to reps).foreach(_ => bus.maxSequenceFrame(spark).head)
        (System.nanoTime() - t0) / reps / 1e6
      }
      val mfMs = timeProbes()
      spark.conf.set("graft.bus.manifest.enabled", "false")
      val fwMs = timeProbes()
      spark.conf.unset("graft.bus.manifest.enabled")
      // delta read just above the second-to-last commit: O(new commits)
      val deltaFiles = bus.readAboveSequence(spark, n.toLong - perCommit - 1)
        .filter(col("sequence_number") > n.toLong - perCommit - 1)
        .inputFiles.length
      // Earliest-read MANIFEST cost (the walk-back + checkpoint fold —
      // the metadata phase VERDICT r19 #1 asks to see flat; the data
      // relation built over the returned paths is inherently O(files)
      // and identical for any engine reading everything)
      EventBus.manifestFilesAbove(spark, dir, Long.MinValue) // warm
      BusManifest.recordReads.set(0L)
      val t1 = System.nanoTime()
      (1 to reps).foreach(_ =>
        EventBus.manifestFilesAbove(spark, dir, Long.MinValue))
      val eaMs = (System.nanoTime() - t1) / reps / 1e6
      val eaReads = BusManifest.recordReads.get() / reps
      println(f"[probecost] $n%5d  $mfMs%11.2f  $fwMs%13.2f  " +
        f"$deltaFiles%d  $eaMs%11.2f  $eaReads%d")
    }
    spark.stop()
  }
}
