package graft.streaming

import graft.{SparkSpec, Tables}
import graft.model.{EventView, FilterSpec}
import org.apache.spark.sql.functions._
import java.nio.file.Files

class ValidateSubscriptionSpec extends SparkSpec {

  test("dry-run returns filter verdict + transformed payload per event (proxy.go:799-855)") {
    val view = EventView.fromEventsTable(Tables.events(spark, sf))
      .filter(col("sequence_number") < 50)
    val out = ValidateSubscription(view,
      Seq(FilterSpec.Exact(Seq("type" -> "purchase"))),
      Some("""{"pipeline": [{"command": ["create", "$.data.seen", "yes"]}]}"""))
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), Option(r.getString(2)), Option(r.getString(3)))).toMap

    val types = view.select("sequence_number", "type").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size == 50)
    types.foreach { case (seq, t) =>
      val (verdict, body, err) = out(seq)
      assert(verdict == (t == "purchase"))
      if (verdict) {
        assert(err.isEmpty)
        assert(body.get.contains("\"seen\":\"yes\""))
      } else assert(body.isEmpty) // filtered out → no transformer run
    }
  }

  test("transform errors surface in the dry-run instead of being routed") {
    val view = EventView.fromEventsTable(Tables.events(spark, sf)).limit(5)
    val out = ValidateSubscription(view, Seq.empty,
      Some("""{"define": {"v": "$.data.definitely_missing"}, "pipeline": []}"""))
    assert(out.filter(col("transform_error").isNotNull).count() == 5)
  }
}
