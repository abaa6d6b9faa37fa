package graft.streaming

import graft.SparkSpec
import java.nio.file.Files

/** [[StreamCommitLog]] pins: the committed set is exactly the file
  * entries whose batchId is at-or-below the highest id in `commits/`,
  * read from both plain and `.compact` source-log files, URI-decoded;
  * every degraded layout answers empty (the conservative signal —
  * nothing compacts).
  */
class StreamCommitLogSpec extends SparkSpec {

  private def fsOf(dir: String) = new org.apache.hadoop.fs.Path(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def write(dir: String, rel: String, text: String): Unit = {
    val p = java.nio.file.Paths.get(dir, rel)
    Files.createDirectories(p.getParent)
    Files.writeString(p, text)
    ()
  }

  test("committed = entries at-or-below the max commit; planned batches excluded") {
    val ck = Files.createTempDirectory("sclog").toString
    write(ck, "commits/0", "v1\n{}")
    write(ck, "commits/1", "v1\n{}")
    // 1.compact folds batches 0-1; a later plain log adds batch 2,
    // which is PLANNED (offsets written) but not committed
    write(ck, "sources/0/1.compact",
      "v1\n" +
        """{"path":"file:///bus/a.parquet","timestamp":1,"batchId":0}""" +
        "\n" +
        """{"path":"file:///bus/x%20y.parquet","timestamp":2,"batchId":1}""")
    write(ck, "sources/0/2",
      "v1\n" +
        """{"path":"file:///bus/c.parquet","timestamp":3,"batchId":2}""")
    // foreign files are ignored, never fatal
    write(ck, "sources/0/.2.tmp", "half-written garbage")
    val got = StreamCommitLog.committedFiles(fsOf(ck), ck)
    assert(got == Set("/bus/a.parquet", "/bus/x y.parquet"),
      s"planned-but-uncommitted batch 2 must be excluded: $got")
  }

  test("log parses are memoized by (path, len, mtime): a repeat call re-reads nothing") {
    val ck = Files.createTempDirectory("sclogmemo").toString
    write(ck, "commits/0", "v1\n{}")
    write(ck, "sources/0/0",
      "v1\n" + """{"path":"file:///bus/a.parquet","timestamp":1,"batchId":0}""")
    val fs = fsOf(ck)
    val first = StreamCommitLog.committedFiles(fs, ck)
    assert(first == Set("/bus/a.parquet"))
    val parsed = StreamCommitLog.logParses.get()
    assert(StreamCommitLog.committedFiles(fs, ck) == first)
    assert(StreamCommitLog.logParses.get() == parsed,
      "a second call over an unchanged log must hit the memo")
    // a NEW log file parses exactly once; the old file stays memoized
    write(ck, "commits/1", "v1\n{}")
    write(ck, "sources/0/1",
      "v1\n" + """{"path":"file:///bus/b.parquet","timestamp":2,"batchId":1}""")
    assert(StreamCommitLog.committedFiles(fs, ck)
      == Set("/bus/a.parquet", "/bus/b.parquet"))
    assert(StreamCommitLog.logParses.get() == parsed + 1,
      "only the new log file re-parses")
  }

  test("committedAmong answers candidates ∩ committed without materializing the full set") {
    val ck = Files.createTempDirectory("sclogamong").toString
    write(ck, "commits/0", "v1\n{}")
    write(ck, "sources/0/0",
      "v1\n" +
        """{"path":"file:///bus/a.parquet","timestamp":1,"batchId":0}""" +
        "\n" +
        """{"path":"file:///bus/b.parquet","timestamp":2,"batchId":0}""" +
        "\n" +
        """{"path":"file:///bus/old.parquet","timestamp":3,"batchId":0}""")
    val fs = fsOf(ck)
    // candidates = the bus's CURRENT files; /bus/old was compacted away
    // and /bus/tail is not committed yet
    val got = StreamCommitLog.committedAmong(fs, ck,
      Set("/bus/a.parquet", "/bus/b.parquet", "/bus/tail.parquet"))
    assert(got == Set("/bus/a.parquet", "/bus/b.parquet"))
    // degraded checkpoint still answers empty
    val ckE = Files.createTempDirectory("sclogamongE").toString
    assert(StreamCommitLog.committedAmong(fsOf(ckE), ckE,
      Set("/bus/a.parquet")).isEmpty)
  }

  test("degraded layouts answer empty: no commits, no sources, no checkpoint") {
    val ck = Files.createTempDirectory("sclog2").toString
    assert(StreamCommitLog.committedFiles(fsOf(ck), ck).isEmpty)
    write(ck, "sources/0/0",
      "v1\n" + """{"path":"file:///bus/a.parquet","timestamp":1,"batchId":0}""")
    // source log exists but nothing committed yet
    assert(StreamCommitLog.committedFiles(fsOf(ck), ck).isEmpty)
    assert(StreamCommitLog.committedFiles(fsOf(ck),
      s"$ck/nonexistent").isEmpty)
  }
}
