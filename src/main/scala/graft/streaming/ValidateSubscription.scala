package graft.streaming

import graft.filters.FilterCompiler
import graft.model.FilterSpec
import graft.transform.TransformRunner
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Subscription dry-run — the gateway's ValidateSubscription RPC
  * (/root/reference/server/gateway/proxy/proxy.go:799-855): evaluate a
  * subscription's filter against events and, for passing events, run the
  * transformer, returning the filter verdict and the transformed payload
  * (or the transform error) per event. Used to preview what a subscription
  * would deliver without touching any bus.
  *
  * Spark shape: one frame out — filter verdict as a Column, transformer via
  * the interpreter on the passing subset, left-joined back. The reference
  * validates one event per call; this validates a whole frame in one pass
  * (the single-event case is a 1-row frame).
  */
object ValidateSubscription {

  def apply(events: DataFrame, filters: Seq[FilterSpec],
      transformerJson: Option[String]): DataFrame = {
    val withVerdict = events.withColumn("filter_result",
      coalesce(FilterCompiler.compileList(filters), lit(false)))
    val passed = withVerdict.filter(col("filter_result"))
    val transformed = transformerJson match {
      case Some(tj) => TransformRunner(passed, tj)
        .select(col("sequence_number"), col("body").as("transformer_result"),
          col("transform_error"))
      case None => passed.select(col("sequence_number"),
        col("data").as("transformer_result"),
        lit(null).cast("string").as("transform_error"))
    }
    withVerdict
      .select(col("sequence_number"), col("filter_result"))
      .join(transformed, Seq("sequence_number"), "left")
  }
}
