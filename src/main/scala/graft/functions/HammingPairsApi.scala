package graft.functions

import org.apache.spark.sql.Column

/** Public face of the native banded-hamming pair expansion — see
  * [[org.apache.spark.sql.graftexpr.HammingPairsExpr]] for semantics.
  */
object HammingPairs {
  /** Qualifying (id_a, id_b, hamming) pairs of one blocked group's capped
    * member array, first-match-block emission; one native eval per group
    * row instead of an interpreted lambda per candidate.
    */
  def apply(ms: Column, blk: Column, maxDist: Int, bits: Int): Column =
    org.apache.spark.sql.graftexpr.HammingPairsApi.column(ms, blk, maxDist, bits)
}
