package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VecDotSpec extends SparkSpec {

  test("matches the zip_with+aggregate fold bit-for-bit") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.1f, 0.2f), Array(0.3f, 0.4f)),
      (Array.empty[Float], Array.empty[Float])).toDF("a", "b")
    val fold = aggregate(zip_with(col("a"), col("b"),
      (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, v) => acc + v)
    val rows = df.select(VecDot(col("a"), col("b")).as("dot"), fold.as("ref")).collect()
    rows.foreach { r => assert(r.getDouble(0) == r.getDouble(1)) }
    assert(rows(0).getDouble(0) == (4.0 + 10.0 + 18.0))
  }

  test("participates in whole-stage codegen (unlike the HOF fold)") {
    val emb = graft.Tables.embeddings(spark, sf)
    val df = emb.select(VecDot(col("embedding"), col("embedding")).as("norm2"))
    val plan = df.queryExecution.executedPlan.toString
    // "*(1) Project [vec_dot..." — the * marks a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [vec_dot"))
    assert(df.head.getDouble(0) > 0.0)

    // the fold spelling over the same scan does NOT stay in codegen —
    // that's the point of the native expression
    val fold = emb.select(aggregate(zip_with(col("embedding"), col("embedding"),
      (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, v) => acc + v))
    val vecRows = df.collect().map(_.getDouble(0))
    val foldRows = fold.collect().map(_.getDouble(0))
    assert(vecRows.sameElements(foldRows)) // bit-identical accumulation
  }

  test("null element poisons the sum (zip_with semantics)") {
    import spark.implicits._
    val df = Seq((Seq(Some(1.0f), None), Seq(Some(1.0f), Some(2.0f))))
      .toDF("a", "b")
    assert(df.select(VecDot(col("a"), col("b"))).head.isNullAt(0))
  }
}
