package graft.tools

/** Dump `.explain("formatted")` for named SparkEntry queries to files —
  * the plan evidence the optimization rounds commit under `plans/r<N>/`.
  *
  * Usage: runMain graft.tools.ExplainDump <outDir> <suffix> [name,name,...]
  * (no names = every declared query). Reads the data dir from
  * SPARK_GRAFT_SF_DIR like Bench. Queries whose construction itself runs
  * jobs (bus/stream lifecycles) execute that orchestration; the captured
  * plan is the returned frame's.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r21")
    val suffix = if (args.length > 1) args(1) else "before"
    val names: Seq[String] =
      if (args.length > 2) args(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local()
    new java.io.File(outDir).mkdirs()
    names.foreach { n =>
      graft.SparkEntry.queries.get(n) match {
        case None => System.err.println(s"[explain] unknown query: $n")
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            val txt = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.writeString(
              java.nio.file.Paths.get(outDir, s"${n}_$suffix.txt"), txt)
            System.err.println(s"[explain] wrote $n ($suffix)")
          } catch { case e: Throwable =>
            System.err.println(s"[explain] FAILED $n: ${e.getClass.getName}: " +
              s"${Option(e.getMessage).getOrElse("").take(200)}")
          } finally {
            graft.GraftSession.sweepPersisted(spark)
          }
      }
    }
    spark.stop()
  }
}
