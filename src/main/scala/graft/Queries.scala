package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One catalog entry per implemented operator (SURVEY.md §2).
  *
  * Each entry pairs a Spark implementation with an ANSI-SQL oracle that the
  * driver executes in DuckDB over the same parquet files. Conventions that
  * keep the hash-compare stable across engines:
  *
  *  - every computed/aggregated column is aliased identically on both sides;
  *  - double columns are cast to DECIMAL(18,2) *before* arithmetic/aggregation
  *    (the synthetic data carries two decimal places, so the cast is lossless,
  *    and decimal aggregation is exact — no float summation-order drift
  *    between Spark's partial aggregation and DuckDB's sequential sum);
  *  - final numeric aggregates are cast to DOUBLE (exact decimal → nearest
  *    double is deterministic and identical in both engines);
  *  - every result is fully ordered by a unique key so row order matches.
  *
  * Scale note: ORDER BY on the *result* of an aggregation is cheap (result
  * cardinality, not input cardinality); none of these orderings force a
  * full-data sort at 100 TB.
  */
object Queries {

  /** name -> (query, optional DuckDB oracle SQL). */
  final case class Q(
      name: String,
      run: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  /** Shorthand: cast a (2-decimal-place) double column to exact decimal. */
  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  // ===========================================================================
  // Flagship relational aggregation (baseline pattern for the catalog)
  // ===========================================================================

  private val q1Agg = Q(
    "q1_agg",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
             COUNT(*) AS count_order
      FROM lineitem
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus
    """))

  // ===========================================================================
  // §2.1 sources / read path: point get + offset-by-time
  // ===========================================================================

  /** Point get — events by (offset, n); reference: vsctl event get
    * (tool/vsctl/command/event.go:303-355). Offset maps to the ordered
    * `event_id` column; the predicate pushes down to the parquet scan, so at
    * 100 TB this touches only row groups whose stats overlap the range.
    */
  private val qPointGet = Q(
    "point_get",
    (s, d) =>
      Tables.events(s, d)
        .filter(col("event_id").between(100, 115))
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), col("props"))
        .orderBy(col("event_id")),
    Some("""
      SELECT event_id, user_id, event_type, value, props
      FROM events WHERE event_id BETWEEN 100 AND 115
      ORDER BY event_id
    """))

  /** Point get by event id — the id is the reference's opaque base64 handle
    * encoding (eventlogID, offset) (proxy.go:863-905); decoded by the REAL
    * [[graft.streaming.EventId]] codec, then looked up. The events table is
    * the multi-log stand-in: log id = event_type's rank in the (tiny) log
    * dimension, per-log offset = position within the log — a real bus
    * stores `sequence_number` directly, making the lookup a pushdown range
    * probe; the windows here only synthesize those columns for the
    * stand-in table (log dimension is ~5 rows).
    */
  private val qPointGetById = Q(
    "point_get_by_id",
    (s, d) => {
      import graft.streaming.EventId
      import org.apache.spark.sql.expressions.Window
      // three opaque handles, decoded through the production codec
      val handles = Seq(EventId.encode(0, 10), EventId.encode(1, 5), EventId.encode(2, 0))
      val pairs = handles.map(EventId.decode)
      import s.implicits._
      val want = pairs.toDF("log_id", "log_offset")
      val logDim = Tables.events(s, d).select(col("event_type")).distinct()
        .withColumn("log_id",
          (row_number().over(Window.orderBy(col("event_type"))) - 1).cast("bigint"))
      val ranked = Tables.events(s, d)
        .join(broadcast(logDim), "event_type")
        .withColumn("log_offset",
          (row_number().over(Window.partitionBy(col("event_type"))
            .orderBy(col("event_id"))) - 1).cast("bigint"))
      ranked.join(broadcast(want), Seq("log_id", "log_offset"))
        .select(col("log_id"), col("log_offset"), col("event_id"),
          col("event_type"), col("value"))
        .orderBy(col("log_id"))
    },
    Some("""
      WITH logs AS (
        SELECT event_type,
               ROW_NUMBER() OVER (ORDER BY event_type) - 1 AS log_id
        FROM (SELECT DISTINCT event_type FROM events)
      ), ranked AS (
        SELECT e.event_id, e.event_type, e.value, l.log_id,
               ROW_NUMBER() OVER (PARTITION BY e.event_type ORDER BY e.event_id) - 1 AS log_offset
        FROM events e JOIN logs l USING (event_type)
      )
      SELECT log_id, log_offset, event_id, event_type, value FROM ranked
      WHERE (log_id, log_offset) IN ((0, 10), (1, 5), (2, 0))
      ORDER BY log_id
    """))

  /** Offset-by-time — first offset with ts >= T, per "eventlog" (we treat
    * event_type as the partition key stand-in). Reference:
    * Eventlog.QueryOffsetByTime (client/pkg/api/client.go:52) backed by a
    * binary seek over per-entry stime index (server/store/vsb/block_seek.go:45-86).
    * Spark-native: min() aggregation over a pushed-down time predicate —
    * parquet row-group stats on ts give the same pruning the vsb index gave.
    */
  private val qOffsetByTime = Q(
    "offset_by_time",
    (s, d) =>
      Tables.events(s, d)
        .filter(col("ts") >= lit("2024-01-03 00:00:00").cast("timestamp"))
        .groupBy(col("event_type"))
        .agg(min(col("event_id")).as("first_offset"))
        .orderBy(col("event_type")),
    Some("""
      SELECT event_type, MIN(event_id) AS first_offset
      FROM events WHERE ts >= TIMESTAMP '2024-01-03 00:00:00'
      GROUP BY event_type
      ORDER BY event_type
    """))

  // --------------------------------------------------------------------------

  val all: Seq[Q] = Seq(q1Agg, qPointGet, qPointGetById, qOffsetByTime) ++
    FilterQueries.all ++ TransformQueries.all ++ StreamQueries.all ++
    ExtQueries.all ++ JoinQueries.all

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  lazy val oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o.trim)).toMap
}
