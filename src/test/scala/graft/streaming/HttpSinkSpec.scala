package graft.streaming

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.{SparkSpec, Tables}
import graft.model.{EventView, FilterSpec}
import org.apache.spark.sql.functions._
import java.net.InetSocketAddress
import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

/** Delivers real HTTP requests to a local server and asserts the full
  * status-code routing: 2xx → delivered, 429/503 → retry bus, 400 → DLQ
  * (client/http.go + trigger.go:455-526).
  */
class HttpSinkSpec extends SparkSpec {

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  /** Server that picks the response code from the event body's k value:
    * k%10==0 → 503, k%10==1 → 429, k%10==2 → 400, else 200. Records
    * received ce-* headers for the binary-mode assertion.
    */
  private def withServer(f: (String, ConcurrentLinkedQueue[Map[String, String]]) => Unit): Unit = {
    val received = new ConcurrentLinkedQueue[Map[String, String]]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/sink", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        received.add(Map(
          "ce-id" -> ex.getRequestHeaders.getFirst("ce-id"),
          "ce-type" -> ex.getRequestHeaders.getFirst("ce-type"),
          "ce-specversion" -> ex.getRequestHeaders.getFirst("ce-specversion"),
          "content-type" -> ex.getRequestHeaders.getFirst("Content-type")))
        val k = "\"k\":\\s*(\\d+)".r.findFirstMatchIn(body).map(_.group(1).toLong).getOrElse(0L)
        val code = (k % 10) match {
          case 0 => 503
          case 1 => 429
          case 2 => 400
          case _ => 200
        }
        ex.sendResponseHeaders(code, -1)
        ex.close()
      }
    })
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/sink", received)
    finally server.stop(0)
  }

  test("HTTP delivery routes by status: 2xx deliver, 429/503 retry, 400 DLQ") {
    withServer { (url, received) =>
      val retryBus = EventBus(tmp("hretry"))
      val dlqBus = EventBus(tmp("hdlq"))
      val view = EventView.fromEventsTable(Tables.events(spark, sf))
        .filter(col("sequence_number") < 200)
      val spec = SubscriptionRunner.Spec(
        Seq(FilterSpec.Exact(Seq("type" -> "purchase"))), None,
        SubscriptionRunner.Config("sub-http", maxRetryAttempts = 3))
      val res = SubscriptionRunner.processBatch(view, spec, HttpSink(url),
        Some(retryBus), Some(dlqBus), nowEpochSec = 1704240000L)

      val purchases = view.filter(col("type") === "purchase").count()
      assert(res.delivered + res.toRetry + res.toDlq == purchases)
      assert(res.delivered > 0 && res.toRetry > 0 && res.toDlq > 0)

      // retry bus holds only the 429/503 events; DLQ only the 400s
      // (bus frames keep the source event schema — data, not rendered body)
      import spark.implicits._
      val retryCodes = retryBus.read(spark)
        .select(get_json_object(col("data"), "$.k").cast("long") % 10).as[Long].collect()
      assert(retryCodes.toSet.subsetOf(Set(0L, 1L)))
      val dlqCodes = dlqBus.read(spark)
        .select(get_json_object(col("data"), "$.k").cast("long") % 10).as[Long].collect()
      assert(dlqCodes.toSet == Set(2L))
      assert(dlqBus.read(spark).select(col("attributes").getItem("lastdeliveryerror"))
        .distinct().as[String].collect().toSet == Set("400"))

      // binary content mode: context attributes travel as ce-* headers
      val h = received.peek()
      assert(h("ce-specversion") == "1.0")
      assert(h("ce-type") == "purchase")
      assert(h("content-type") == "application/json")
      assert(received.size() == purchases)
    }
  }

  test("batched delivery: size-flush chunks, whole-chunk result (trigger.go:342-375)") {
    val sizes = new ConcurrentLinkedQueue[Integer]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/batch", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        assert(ex.getRequestHeaders.getFirst("Content-type") ==
          "application/cloudevents-batch+json")
        sizes.add("\"specversion\"".r.findAllIn(body).size)
        ex.sendResponseHeaders(200, -1)
        ex.close()
      }
    })
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/batch"
      val view = EventView.fromEventsTable(Tables.events(spark, sf))
        .filter(col("sequence_number") < 100)
      val spec = SubscriptionRunner.Spec(Seq.empty, None,
        SubscriptionRunner.Config("sub-batch"))
      val res = SubscriptionRunner.processBatchWith(view, spec,
        SubscriptionRunner.Delivery.Batched(HttpBatchSink(url), maxBatchSize = 16),
        None, None, nowEpochSec = 1704240000L)
      assert(res.delivered == 100)
      val observed = sizes.toArray(Array.empty[Integer]).map(_.toInt)
      assert(observed.sum == 100)
      assert(observed.forall(_ <= 16)) // SendBatchSize flush bound
    } finally server.stop(0)
  }

  test("failing batch send marks every event in the chunk failed") {
    val failing: SubscriptionRunner.BatchSink = _ => Left(503)
    val retryBus = EventBus(tmp("bretry"))
    val dlqBus = EventBus(tmp("bdlq"))
    val view = EventView.fromEventsTable(Tables.events(spark, sf))
      .filter(col("sequence_number") < 40)
    val spec = SubscriptionRunner.Spec(Seq.empty, None,
      SubscriptionRunner.Config("sub-batch2", maxRetryAttempts = 3))
    val res = SubscriptionRunner.processBatchWith(view, spec,
      SubscriptionRunner.Delivery.Batched(failing, maxBatchSize = 8),
      Some(retryBus), Some(dlqBus), nowEpochSec = 1704240000L)
    assert(res.delivered == 0 && res.toRetry == 40 && res.toDlq == 0)
  }

  test("unreachable sink maps to errUnknown(600) and is retryable") {
    val sink = HttpSink("http://127.0.0.1:1/sink", timeoutMillis = 500)
    val out = sink(SubscriptionRunner.Deliverable(1L, "1", "s", "t", "application/json", "{}"))
    assert(out == Left(HttpSink.ErrUnknown))
    assert(Backoff.isRetryable(HttpSink.ErrUnknown))
    assert(Backoff.isRetryable(HttpSink.ErrDeliveryTimeout))
  }
}
