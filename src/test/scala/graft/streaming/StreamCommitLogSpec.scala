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
