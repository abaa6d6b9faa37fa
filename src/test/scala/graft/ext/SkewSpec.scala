package graft.ext

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("salted join equals plain join; hot key spreads over salt space") {
    // lineitem -> orders is the natural skewable shape
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_linenumber", "l_quantity")
    val ord = Tables.orders(spark, sf).select("o_orderkey", "o_orderdate")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val plain = li.join(ord, "l_orderkey")
    val salted = Skew.saltedJoin(li, ord, "l_orderkey",
      rowId = "l_linenumber", saltFactor = 4)
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)

    // the salt actually spreads one key's rows across distinct values
    val spread = li.withColumn("__salt",
      pmod(crc32(col("l_linenumber").cast("string")), lit(4)))
      .groupBy("l_orderkey").agg(countDistinct("__salt").as("n"))
      .agg(max("n")).head.getLong(0)
    assert(spread > 1)
  }
}
