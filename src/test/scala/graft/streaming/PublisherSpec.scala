package graft.streaming

import graft.{SparkSpec, Tables}
import graft.model.EventView
import org.apache.spark.sql.functions._
import java.nio.file.Files

class PublisherSpec extends SparkSpec {

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  private def synth = {
    val base = EventView.fromEventsTable(Tables.events(spark, sf))
      .filter(col("sequence_number") < 100)
    base.withColumn("attributes",
      when(col("sequence_number") % 4 === 0, col("attributes"))
        .when(col("sequence_number") % 4 === 1,
          map(lit("xvanusowner"), lit("someone")))
        .when(col("sequence_number") % 4 === 2,
          map(lit("xvanusdeliverytime"), lit("2024-01-01T00:00:05+02:00")))
        .otherwise(map(lit("xvanusdeliverytime"), lit("not-a-time"))))
  }

  test("publish validates, stamps xvanuseventbus, reroutes delayed (proxy.go:166-237)") {
    val bus = EventBus(tmp("pbus"))
    val timer = EventBus(tmp("ptimer"))
    val res = Publisher.publish(synth, bus, timer, "bus-main")
    assert(res.accepted == 25 && res.delayed == 25 && res.rejected == 50)

    // direct events stamped with the target bus
    val stamped = bus.read(spark)
      .select(col("attributes").getItem(Publisher.EventbusAttr)).distinct()
    assert(stamped.head.getString(0) == "bus-main")

    // delayed events keep their delivery time AND carry the bus stamp, so
    // the timer release can route them home (proxy.go:199-229)
    val t = timer.read(spark).select(col("attributes")).head.getMap[String, String](0)
    assert(t(Publisher.EventbusAttr) == "bus-main")
    assert(t(Publisher.DeliveryTimeAttr) == "2024-01-01T00:00:05+02:00")
  }

  test("publish scans its input once (persist-on-entry, merged counts)") {
    // instrument the source with a per-partition accumulator BELOW the
    // persist point: every re-evaluation of the source adds one per
    // partition, cached reads add zero
    val acc = spark.sparkContext.longAccumulator("publisher-src-scans")
    val instrumented = synth.coalesce(1).mapPartitions { it =>
      acc.add(1); it
    }(org.apache.spark.sql.Encoders.row(synth.schema))
    val res = Publisher.publish(instrumented,
      EventBus(tmp("pbus1")), EventBus(tmp("ptimer1")), "bus-main")
    assert(res.accepted == 25 && res.delayed == 25 && res.rejected == 50)
    assert(acc.value == 1L,
      s"publish evaluated its source ${acc.value}× — must be exactly once")
  }

  test("null attributes map routes as accepted, not dropped") {
    import spark.implicits._
    val df = Seq((1L, Option.empty[Map[String, String]]),
      (2L, Some(Map("custom" -> "v"))))
      .toDF("sequence_number", "attributes")
    val r = Publisher.route(df, "b")
    assert(r.accepted.count() == 2 && r.rejected.count() == 0)
  }

  test("reserved-prefix attributes reject; xvanusdeliverytime itself is allowed") {
    import spark.implicits._
    val df = Seq(
      (1L, Map("xvanusanything" -> "v")),
      (2L, Map("xvanusdeliverytime" -> "2024-01-01T00:00:05Z")),
      (3L, Map("custom" -> "v"))).toDF("sequence_number", "attributes")
    val bad = df.filter(Publisher.hasInvalidAttr || Publisher.hasInvalidDeliveryTime)
      .select("sequence_number").as[Long].collect().toSet
    assert(bad == Set(1L))
  }
}
