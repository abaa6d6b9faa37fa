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
