package graft

import graft.model.EventView
import graft.streaming.{EventBus, Publisher, SubscriptionRunner}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The reference's e2e smoke, reproduced: 10,001 events published →
  * stored on a bus → delivered through a real subscription stream →
  * count-checked at the sink (/root/reference/.github/workflows/e2e.yml
  * "Check e2e"). Prints one JSON line with delivered count and
  * single-node throughput — the only end-to-end volume anchor the
  * reference publishes.
  */
object E2ESmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    def tmp(p: String) = Files.createTempDirectory(p).toString

    // first pass = the reference's exact 10,001-event check (cold: includes
    // session + streaming-query startup); second = warm 100k pass, the
    // marginal single-node throughput number
    var allOk = true
    Seq(10001, 100000).foreach { n =>
      val events = EventView.fromEventsTable(Tables.events(spark, sfDir))
        .filter(col("sequence_number") < n)
      val bus = EventBus(tmp("smokebus"))
      val timer = EventBus(tmp("smoketimer"))
      val t0 = System.nanoTime()
      val pub = Publisher.publish(events, bus, timer, "bus-smoke")
      val delivered = spark.sparkContext.longAccumulator(s"delivered$n")
      val q = SubscriptionRunner.start(spark, bus,
        SubscriptionRunner.Spec(Seq.empty, None, SubscriptionRunner.Config("sub-smoke")),
        _ => { delivered.add(1); Right(()) },
        None, None, tmp("smokeck"))
      q.awaitTermination(300000)
      val sec = (System.nanoTime() - t0) / 1e9
      val ok = pub.accepted == n && delivered.value == n
      allOk &= ok
      println(s"""{"metric":"e2e_smoke","events":$n,"published":${pub.accepted},""" +
        s""""delivered":${delivered.value},"ok":$ok,"sec":$sec,""" +
        s""""events_per_sec":${(delivered.value / sec).toLong}}""")
    }
    spark.stop()
    if (!allOk) sys.exit(1)
  }
}
