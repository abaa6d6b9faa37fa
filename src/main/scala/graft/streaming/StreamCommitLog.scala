package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}

/** Reader for the committed half of a Structured Streaming FILE-SOURCE
  * checkpoint: which bus files the stream has fully processed AND
  * committed. This is what bounds stream-safe compaction
  * ([[EventBus.compactBelow]]) — the reference compacts its WAL only
  * below the committed offset for the same reason
  * (/root/reference/server/store/wal/wal.go:195-210,
  * server/store/raft/storage/compaction.go): files at-or-below the
  * commit point can be rewritten without the reader ever re-serving or
  * losing them; everything else is the untouchable tail.
  *
  * On-disk format (Spark's public checkpoint layout, stable since 2.x):
  * `<checkpoint>/commits/<batchId>` marks batch N committed;
  * `<checkpoint>/sources/0/<batchId>[.compact]` is the file-source log —
  * a `v1` header line, then one JSON object per line
  * (`{"path":"file:///…","timestamp":…,"batchId":N}`); a `.compact`
  * file folds all earlier entries. A file is COMMITTED exactly when its
  * entry's batchId is at-or-below the highest id in `commits/`.
  */
object StreamCommitLog {

  /** URI paths (scheme-stripped, decoded — `Path.toUri.getPath` form) of
    * every source file the stream at `checkpoint` has committed. Empty
    * when the checkpoint has no commits yet (nothing is safely
    * compactable), or when the layout is missing/unreadable — the
    * conservative answer in every degraded case.
    */
  def committedFiles(fs: FileSystem, checkpoint: String): Set[String] =
    try {
      val cp = new Path(checkpoint)
      val commits = new Path(cp, "commits")
      val sources = new Path(cp, new Path("sources", "0").toString)
      if (!fs.exists(commits) || !fs.exists(sources)) return Set.empty
      val maxCommitted = fs.listStatus(commits)
        .flatMap(st => st.getPath.getName.toLongOption)
        .foldLeft(-1L)(math.max)
      if (maxCommitted < 0) return Set.empty
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val out = Set.newBuilder[String]
      fs.listStatus(sources).foreach { st =>
        val name = st.getPath.getName
        val isLog = name.toLongOption.isDefined ||
          (name.endsWith(".compact") &&
            name.stripSuffix(".compact").toLongOption.isDefined)
        if (isLog) {
          val in = fs.open(st.getPath)
          val txt =
            try scala.io.Source.fromInputStream(in, "UTF-8").mkString
            finally in.close()
          txt.linesIterator.foreach { line =>
            if (line.startsWith("{")) {
              try {
                val node = mapper.readTree(line)
                val bid = node.path("batchId").asLong(Long.MaxValue)
                val p = node.path("path").asText("")
                if (p.nonEmpty && bid <= maxCommitted)
                  out += new Path(new java.net.URI(p)).toUri.getPath
              } catch { case _: Exception => () } // foreign line — skip
            }
          }
        }
      }
      out.result()
    } catch { case _: java.io.IOException => Set.empty }
}
