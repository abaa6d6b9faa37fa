package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}

/** CloudEvents structured-mode JSON ingest — the gateway's wire format
  * (CE JSON spec; reference receives it over HTTP/gRPC and stores the
  * 11 context ordinals + extensions, server/store/schema/ce/ordinal.go).
  *
  * One `from_json` to map<string,string> per event: every member —
  * context attribute, extension, or nested data object — arrives as its
  * string form (nested JSON stays raw JSON text), matching the
  * reference's string-typed attribute storage. Known context members
  * project to EventView columns; everything else becomes an extension
  * attribute. Codegen'd, no UDFs, embarrassingly parallel.
  */
object EventJson {

  /** CE context members that are NOT extension attributes (v1 spec). */
  val ContextMembers: Seq[String] = Seq(
    "specversion", "id", "source", "type", "subject", "time",
    "dataschema", "datacontenttype", "data", "data_base64")

  /** RFC3339 time member → timestamp (with or without fractional part). */
  private def parseTime(c: Column): Column =
    coalesce(
      try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
      try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")),
      c.try_cast("timestamp"))

  /** Parse a frame holding CE JSON strings into the EventView shape.
    * @param df frame with the JSON column and a `sequence_number` column
    *           (the bus offset is transport metadata, not part of the
    *           event JSON)
    */
  def parse(df: DataFrame, jsonCol: String = "json"): DataFrame = {
    val m = from_json(col(jsonCol), MapType(StringType, StringType))
    df.withColumn("__m", m).select(
      col("sequence_number"),
      col("__m").getItem("id").as("id"),
      col("__m").getItem("source").as("source"),
      coalesce(col("__m").getItem("specversion"), lit("1.0")).as("specversion"),
      col("__m").getItem("type").as("type"),
      col("__m").getItem("subject").as("subject"),
      parseTime(col("__m").getItem("time")).as("time"),
      col("__m").getItem("dataschema").as("dataschema"),
      col("__m").getItem("datacontenttype").as("datacontenttype"),
      map_filter(col("__m"),
        (k, _) => !k.isin(ContextMembers.map(lit(_)): _*)).as("attributes"),
      col("__m").getItem("data").as("data"))
  }
}
