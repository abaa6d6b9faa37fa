package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join: salt the skewed (large) side, replicate the
  * build (small-ish) side across the salt space, join on (key, salt).
  * One hot key's rows spread over `saltFactor` tasks instead of one.
  *
  * AQE's skew-join split (enabled in GraftSession) handles most cases at
  * runtime; explicit salting is for the shapes AQE can't fix — e.g. a
  * skewed aggregation-input join feeding a non-splittable stage, or
  * deterministic layout requirements. The salt is derived from a stable
  * hash of a row-unique column so results are reproducible.
  */
object Skew {

  /** Inner-join `big` (skewed) with `small` on `key`, spreading each of
    * big's key groups over `saltFactor` partitions. `rowId` must be
    * row-unique on the big side (drives the deterministic salt).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      rowId: String, saltFactor: Int = 8): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(crc32(col(rowId).cast("string")), lit(saltFactor)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1)).cast("array<int>")))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
