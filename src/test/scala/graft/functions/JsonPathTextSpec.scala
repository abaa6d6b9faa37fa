package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[JsonPathText]] must be a drop-in for `get_json_object` on the filter
  * surfaces: same text forms, same NULL cases — plus the memo must be
  * value-keyed (scan buffers are reused between rows, so a reference-keyed
  * cache would serve stale parses).
  */
class JsonPathTextSpec extends SparkSpec {

  private val docs = Seq(
    """{"k": 42, "s": "abc", "b": true, "f": 1.5, "n": null,
       "o": {"x": 7, "y": {"z": "deep"}}, "a": [1, 2, 3]}""",
    """{"k": "17", "s": ""}""",
    """not json at all""",
    """[1, 2, 3]""",
    "",
    """{"k": 1e0}""")

  test("text-form parity with get_json_object on scalars and misses") {
    import spark.implicits._
    val df = docs.zipWithIndex.map { case (d, i) => (i.toLong, d) }.toDF("id", "data")
    // paths where the parity contract is exact: scalar leaves, missing
    // keys, malformed docs, non-object roots, JSON null
    val paths = Seq("k", "s", "b", "n", "missing", "o.x", "o.y.z")
    val rows = df.select(
      col("id") +:
        paths.flatMap(p => Seq(
          JsonPathText(col("data"), p).as(s"m_$p"),
          get_json_object(col("data"), "$." + p).as(s"g_$p"))): _*)
      .orderBy(col("id")).collect()
    for (r <- rows; p <- paths) {
      val m = r.getAs[String](s"m_$p")
      val g = r.getAs[String](s"g_$p")
      assert(m == g, s"id=${r.getLong(0)} path=$p: memo=$m vs get_json_object=$g")
    }
  }

  test("interior nodes read as present (has() support)") {
    import spark.implicits._
    val df = Seq((1L, docs.head)).toDF("id", "data")
    val r = df.select(
      JsonPathText(col("data"), "o").isNotNull.as("obj"),
      JsonPathText(col("data"), "a").isNotNull.as("arr"),
      JsonPathText(col("data"), "n").isNotNull.as("nul"),
      JsonPathText(col("data"), "o.y").isNotNull.as("nested")).head()
    assert(r.getBoolean(0) && r.getBoolean(1) && !r.getBoolean(2) && r.getBoolean(3))
  }

  test("codegen actually compiles (no silent interpreted fallback)") {
    import spark.implicits._
    // fallback=false turns a Janino compile failure from a logged WARN +
    // interpreted eval into a hard error — guards the static-call form of
    // doGenCode (a bad class reference otherwise only costs performance)
    withSQLConf("spark.sql.codegen.fallback" -> "false") {
      val df = Seq((1L, """{"k": 5, "t": "x"}"""), (2L, """{"k": 9}"""))
        .toDF("id", "data")
      val n = df.filter(JsonPathText(col("data"), "k").cast("long") > 4 &&
        JsonPathText(col("data"), "t").isNotNull).count()
      assert(n == 1)
    }
  }

  test("memo is value-keyed: many distinct rows through one task") {
    import spark.implicits._
    // one partition forces every row through the same thread's memo; a
    // stale cache would repeat the first row's values
    val df = spark.range(0, 1000).select(col("id"),
      concat(lit("""{"k": """), col("id"), lit(""", "t": "v"""),
        col("id") % 7, lit(""""}""")).as("data")).repartition(1)
    val bad = df.select(col("id"),
      JsonPathText(col("data"), "k").cast("long").as("k"),
      JsonPathText(col("data"), "t").as("t"))
      .filter(col("k") =!= col("id") ||
        col("t") =!= concat(lit("v"), col("id") % 7))
    assert(bad.count() == 0)
  }
}
