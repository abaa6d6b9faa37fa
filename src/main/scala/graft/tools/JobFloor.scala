package graft.tools

import org.apache.spark.sql.functions._

/** Micro-benchmark for the session's per-job and per-exchange driver
  * overhead floor — the denominator for deciding whether a chain's wall
  * time is explained by its job count alone (optimization guide §7.3).
  *
  * Usage: runMain graft.tools.JobFloor [reps]
  */
object JobFloor {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(20)
    val spark = graft.GraftSession.local()
    spark.range(1000).selectExpr("id", "md5(cast(id as string)) h")
      .write.format("noop").mode("overwrite").save()

    def timeIt(label: String)(body: => Unit): Unit = {
      val samples = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        body
        (System.nanoTime() - t0) / 1e6
      }.sorted
      println(f"[floor] $label%-28s min=${samples.head}%7.1f ms " +
        f"med=${samples(reps / 2)}%7.1f ms max=${samples.last}%7.1f ms")
    }

    timeIt("1-stage noop (32 rows)") {
      spark.range(32).write.format("noop").mode("overwrite").save()
    }
    timeIt("1-stage noop (100k rows)") {
      spark.range(100000).selectExpr("id", "md5(cast(id as string)) h")
        .write.format("noop").mode("overwrite").save()
    }
    timeIt("2-stage groupBy noop") {
      spark.range(100000).groupBy(expr("id % 97")).count()
        .write.format("noop").mode("overwrite").save()
    }
    timeIt("3-stage groupBy+groupBy") {
      spark.range(100000).groupBy(expr("id % 97").as("k")).count()
        .groupBy(expr("k % 7")).sum("count")
        .write.format("noop").mode("overwrite").save()
    }
    timeIt("broadcast join noop") {
      val small = spark.range(100).toDF("k")
      spark.range(100000).toDF("k").join(broadcast(small), "k")
        .write.format("noop").mode("overwrite").save()
    }
    timeIt("count() (32 rows)") {
      spark.range(32).count()
    }
    spark.stop()
  }
}
