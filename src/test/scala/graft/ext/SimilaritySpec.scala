package graft.ext

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  test("kmeans: every vector assigned, cells non-degenerate, training moves centroids") {
    val emb = Tables.embeddings(spark, sf)
    val n = emb.count()
    val asg = Similarity.ivfTrainAssign(emb, k = 4, iters = 2, dim = 64)
    assert(asg.count() == n)
    assert(asg.select("cell").distinct().count() > 1)
    // training reduces (or keeps) total within-cell distance vs init-only
    val initCent = Similarity.kmeansCentroids(emb, 4, 0, 64)
    val d0 = Similarity.kmeansAssign(emb, initCent).agg(sum("dist")).head.getDouble(0)
    val d2 = asg.agg(sum("dist")).head.getDouble(0)
    assert(d2 <= d0)
  }

  test("trained IVF probe returns ranked neighbors from the query's own cell") {
    val emb = Tables.embeddings(spark, sf)
    val out = Similarity.ivfTopKTrained(emb, emb.filter(col("vec_id") < 3), k = 5,
      kCells = 4, iters = 1, dim = 64)
    assert(out.count() > 0)
    // ranks are 1..k per query
    val maxRank = out.groupBy("query_id").agg(max("rank")).collect()
    maxRank.foreach(r => assert(r.getInt(1) <= 5))
  }
}
