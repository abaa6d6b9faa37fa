package graft.functions

import org.apache.spark.sql.Column

/** Public face of the exact bounded-domain distinct-count aggregate — see
  * [[org.apache.spark.sql.graftexpr.BitmapDistinctAgg]] for semantics and
  * the plan-shape rationale (single shuffle vs `count(DISTINCT)`'s
  * Expand + re-shuffle).
  */
object BitmapDistinct {
  /** Exact distinct count of a long column whose values lie in
    * `[0, maxDomain)`; one bitmap per group, map-side partial.
    */
  def longs(c: Column, maxDomain: Long): Column =
    org.apache.spark.sql.graftexpr.BitmapDistinctAgg.column(c, maxDomain)
}
