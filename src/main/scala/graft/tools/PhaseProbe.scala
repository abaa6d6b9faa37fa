package graft.tools

/** Driver-side cost attribution for one named SparkEntry query — the
  * companion to [[StageProbe]] for the time that is NOT in executor
  * metrics: Dataset construction (operator wiring + any eager pin jobs),
  * Catalyst phase durations of the terminal action (analysis, cache
  * substitution, optimization, physical planning), and the action wall.
  *
  * Usage: runMain graft.tools.PhaseProbe <query[,query...]> [reps]
  * Reads SPARK_GRAFT_SF_DIR like Bench.
  */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val names = args.headOption
      .getOrElse(sys.error("usage: PhaseProbe <query[,query...]> [reps]"))
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val reps = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local()
    spark.range(1000).selectExpr("id", "md5(cast(id as string)) h")
      .write.format("noop").mode("overwrite").save()
    for {
      name <- names
      fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      r <- 1 to reps
    } {
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      val phases = df.queryExecution.tracker.phases
        .map { case (k, v) => s"$k=${v.durationMs}ms" }.mkString(" ")
      println(f"[phase] $name rep $r construct=${(t1 - t0) / 1e9}%.2f s " +
        f"action=${(t2 - t1) / 1e9}%.2f s total=${(t2 - t0) / 1e9}%.2f s | $phases")
      graft.GraftSession.sweepPersisted(spark)
      Thread.sleep(500)
    }
    spark.stop()
  }
}
