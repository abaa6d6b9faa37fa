package graft.streaming

import graft.{SparkSpec, Tables}
import graft.model.EventView
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Full delivery lifecycle against real buses and real Structured
  * Streaming queries: publish → subscription stream (filter+deliver) →
  * retry stream generations with attempt escalation → DLQ at the cap.
  */
class EndToEndSpec extends SparkSpec {

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  test("publish → deliver → retry generations → DLQ cap, end to end") {
    val sourceBus = EventBus(tmp("e2esrc"))
    val timerBus = EventBus(tmp("e2etimer"))
    val retrySpool = BucketedSpool(tmp("e2eretry"), tickSeconds = 60L)
    val dlqBus = EventBus(tmp("e2edlq"))

    // publish: 100 clean events land on the source bus
    val events = EventView.fromEventsTable(Tables.events(spark, sf))
      .filter(col("sequence_number") < 100)
    val pub = Publisher.publish(events, sourceBus, timerBus, "bus-e2e")
    assert(pub.accepted == 100 && pub.rejected == 0)

    // subscription: k % 5 == 0 events hit a 503ing endpoint; failures go
    // straight into the due-time-bucketed retry spool (written once)
    val spec = SubscriptionRunner.Spec(Seq.empty, None,
      SubscriptionRunner.Config("sub-e2e", maxRetryAttempts = 2))
    val sink: SubscriptionRunner.Sink = { d =>
      val k = graft.json.JPath.get(graft.json.JValue.parse(d.body), "k")
        .collect { case graft.json.JInt(v) => v }.getOrElse(0L)
      if (k % 5 == 0) Left(503) else Right(())
    }
    val q = SubscriptionRunner.start(spark, sourceBus, spec, sink,
      Some(retrySpool), Some(dlqBus), tmp("e2eck"))
    q.awaitTermination(60000)

    val failing = retrySpool.read(spark).count()
    assert(failing > 0)

    // retry generations through the REAL ticker query: advance the
    // injected clock past each generation's due bucket and wait for the
    // release pass to drain it; attempts escalate → DLQ at the cap
    val clock = new java.util.concurrent.atomic.AtomicLong(
      System.currentTimeMillis() / 1000)
    val rq = SubscriptionRunner.startRetries(spark, retrySpool, spec, sink,
      Some(dlqBus), tmp("e2erck"),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("200 milliseconds"),
      nowEpochSec = () => clock.get())
    def drain(): Unit = {
      val deadline = System.currentTimeMillis() + 60000
      while (retrySpool.maturedBuckets(spark, clock.get()).nonEmpty &&
        System.currentTimeMillis() < deadline) Thread.sleep(200)
      assert(retrySpool.maturedBuckets(spark, clock.get()).isEmpty,
        "ticker failed to drain matured buckets in time")
    }
    (1 to 3).foreach { _ => clock.addAndGet(7200); drain() }
    rq.stop()

    // every failing event exhausted its attempts and reached the DLQ once
    val dlq = dlqBus.read(spark)
    assert(dlq.count() == failing)
    val reasons = dlq.select(col("attributes").getItem("deadletterreason"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(reasons == Set("maxRetryAttempts=2 exceeded"))
    // and the stamped attempt count on DLQ rows is the cap
    val attempts = dlq.select(col("attributes").getItem("xvanusretryattempts"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(attempts == Set("2"))
  }
}
