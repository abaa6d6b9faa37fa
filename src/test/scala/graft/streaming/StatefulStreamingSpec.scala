package graft.streaming

import graft.{SparkSpec, Tables}
import graft.model.EventView
import org.apache.spark.sql.functions._
import java.nio.file.Files

class StatefulStreamingSpec extends SparkSpec {

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  test("watermarked windowed aggregation over a bus stream matches the batch form") {
    val bus = EventBus(tmp("wbus"))
    val view = EventView.fromEventsTable(Tables.events(spark, sf))
      .filter(col("sequence_number") < 500)
    bus.append(view)

    val outTable = "windowed_rates_out"
    val q = WindowedStats.eventRatesStream(bus.readStream(spark))
      .writeStream.format("memory").queryName(outTable)
      .outputMode("update")
      .option("checkpointLocation", tmp("wck"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)

    val streamed = spark.table(outTable)
      .groupBy("window_start", "type").agg(max("n_events").as("n_events"))
    val batch = WindowedStats.eventRates(view)
      .select(col("window_start"), col("type"), col("n_events"))
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("mapGroupsWithState accumulates across micro-batches via checkpoint") {
    val bus = EventBus(tmp("ubus"))
    val ckpt = tmp("uck")
    val view = EventView.fromEventsTable(Tables.events(spark, sf))
    val first = view.filter(col("sequence_number") < 200)
    val second = view.filter(
      col("sequence_number") >= 200 && col("sequence_number") < 400)

    val latestAcc = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    def runOnce(): Unit = {
      val q = UserSessions.profilesStream(bus.readStream(spark))
        .writeStream
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[UserSessions.UserProfile], _: Long) =>
            batch.collect().foreach(p => latestAcc.put(p.userId, p.nEvents))
        }
        .start()
      q.awaitTermination(60000)
    }

    bus.append(first)
    runOnce()
    bus.append(second)
    runOnce() // second run folds new events into checkpointed state

    import scala.jdk.CollectionConverters._
    val latest = latestAcc.asScala.toMap
    // state survived the restart: totals equal the batch fold of BOTH appends
    val expected = UserSessions.profiles(first.union(second))
      .collect().map(p => p.userId -> p.nEvents).toMap
    assert(latest == expected)
    assert(expected.values.sum == 400)
  }
}
