package graft

class QueriesSpec extends SparkSpec {

  test("every catalog entry runs and returns rows at sf0.001") {
    Queries.all.foreach { q =>
      val n = q.run(spark, sf).count()
      assert(n > 0, s"${q.name} returned 0 rows")
    }
  }

  test("every oracle key exists in queries and aliases match Spark columns") {
    Queries.oracleSql.keys.foreach { k =>
      assert(Queries.queries.contains(k), s"oracle for unknown query $k")
    }
  }

  test("q1_agg aggregates are exact on known data") {
    val df = Queries.queries("q1_agg")(spark, sf)
    val cols = df.columns.toSet
    assert(cols == Set("l_returnflag", "l_linestatus", "sum_qty",
      "sum_base_price", "sum_disc_price", "count_order"))
    val total = df.agg(org.apache.spark.sql.functions.sum("count_order"))
      .head.getLong(0)
    assert(total == Tables.lineitem(spark, sf).count())
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
