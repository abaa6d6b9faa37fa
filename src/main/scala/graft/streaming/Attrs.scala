package graft.streaming

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Attribute-map stamping shared by the publish and delivery paths. */
object Attrs {

  /** Overwrite-or-add keys in an attributes map. Re-stamping hits events
    * that already carry the keys, and `map_concat` alone throws on
    * duplicates under the default EXCEPTION dedup policy — so drop the
    * keys being written first.
    */
  def stamp(attrs: Column, kvs: (String, Column)*): Column = {
    val keys = kvs.map(_._1)
    // null map stamps like an empty one (map_concat propagates null)
    val base = coalesce(attrs, map().cast("map<string,string>"))
    map_concat(
      map_filter(base, (k, _) => !k.isin(keys: _*)),
      map(kvs.flatMap { case (k, v) => Seq(lit(k), v) }: _*))
  }
}
