package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftexpr.VecDotExpr

/** Public face of the native dot-product expression — see
  * [[org.apache.spark.sql.graftexpr.VecDotExpr]] for semantics.
  */
object VecDot {
  /** dot(a, b) for two array<float> columns, whole-stage-codegen'd. */
  def apply(a: Column, b: Column): Column = VecDotExpr.column(a, b)
}

/** Public face of the bounded min-k aggregate — see
  * [[org.apache.spark.sql.graftexpr.MinKLongsAgg]] for semantics.
  */
object MinK {
  /** The k smallest non-null values of a long column per group, as a
    * sorted ascending array; map-side partial (≤ k longs per group per
    * mapper reach the shuffle).
    */
  def longs(c: Column, k: Int): Column =
    org.apache.spark.sql.graftexpr.MinKLongsAgg.column(c, k)

  /** The k lexicographically-smallest (key, payload) long pairs per group
    * as a sorted array<struct<k,v>>; map-side partial like [[longs]].
    */
  def longPairs(key: Column, payload: Column, k: Int): Column =
    org.apache.spark.sql.graftexpr.MinKPairsAgg.column(key, payload, k)
}
