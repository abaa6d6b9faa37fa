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

  test("semanticDedup: dups point to a smaller id in the same cell; keepers survive") {
    val emb = Tables.embeddings(spark, sf)
    val out = Similarity.semanticDedup(emb, k = 4, iters = 2, dim = 64,
      threshold = 0.2).cache()
    assert(out.count() == emb.count()) // one verdict per vector
    // every dup_of is a strictly smaller id from the same cell
    val cells = out.select(col("vec_id").as("dup_of"), col("cell").as("dcell"))
    val bad = out.filter(col("is_semantic_dup"))
      .join(cells, "dup_of")
      .filter(col("dup_of") >= col("vec_id") || col("cell") =!= col("dcell"))
      .count()
    assert(bad == 0)
    // the smallest id of every cell can never be a dup (no lower-id mate)
    val minIds = out.groupBy("cell").agg(min("vec_id").as("vec_id"))
    assert(out.join(minIds, Seq("cell", "vec_id"))
      .filter(col("is_semantic_dup")).count() == 0)
    out.unpersist()
  }

  test("native l2sq bit-matches the zip_with+aggregate fold") {
    val emb = Tables.embeddings(spark, sf).limit(100)
    val other = transform(reverse(col("embedding")), x => x.cast("double") * 1.5)
    val hof = aggregate(
      zip_with(col("embedding"), other,
        (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
      lit(0.0), (acc, v) => acc + v)
    val diff = emb.select(hof.as("h"), graft.functions.L2Sq(col("embedding"), other).as("n"))
      .filter(col("h") =!= col("n"))
    assert(diff.count() === 0)
  }

  test("int8 native codes bit-match the HOF column spelling") {
    val emb = Tables.embeddings(spark, sf).limit(200)
    // the interpreted spelling the native expression replaced — kept here
    // as the semantics oracle (and the shape the DuckDB SQL replays)
    val maxAbs = array_max(transform(col("embedding"), x => abs(x.cast("double"))))
    val scale = when(maxAbs === 0.0, lit(1.0)).otherwise(maxAbs / 127.0)
    val hofCodes = transform(col("embedding"),
      x => floor(x.cast("double") / scale + 0.5).cast("int"))
    val (natCodes, natScale) = Similarity.int8Quantize(col("embedding"))
    val diff = emb.select(
      hofCodes.as("hc"), scale.as("hs"), natCodes.as("nc"), natScale.as("ns"))
      .filter(col("hc") =!= col("nc") || col("hs") =!= col("ns"))
    assert(diff.count() === 0)
  }

  test("PQ codes are m small ids and ADC top-k overlaps exact top-k") {
    val emb = Tables.embeddings(spark, sf).filter(col("vec_id") < 300)
    val books = Similarity.pqTrain(emb, m = 4, k = 4, iters = 1, dim = 64)
    // ≤ m·k codewords, every centroid subdim-wide
    assert(books.count() <= 16)
    val codes = Similarity.pqEncode(emb, books, m = 4, dim = 64)
    assert(codes.count() === emb.count())
    val bad = codes.filter(size(col("codes")) =!= 4 ||
      exists(col("codes"), c => c < 0 || c >= 4))
    assert(bad.count() === 0)

    val queries = emb.filter(col("vec_id") < 3)
    val pq = Similarity.pqTopK(emb, queries, kNeighbors = 10,
      m = 4, kCodes = 4, iters = 1, dim = 64)
    val exact = Similarity.bruteTopK(emb, queries, k = 10)
    // coarse quantization: just require real overlap with the exact set
    val overlap = pq.select(col("query_id"), col("neighbor_id"))
      .intersect(exact.select(col("query_id"), col("neighbor_id"))).count()
    assert(overlap >= 6, s"PQ/exact overlap $overlap of 30")
  }

  test("ivfPqTopK: neighbors come only from probed cells; full-probe equals pqTopK") {
    val emb = Tables.embeddings(spark, sf).filter(col("vec_id") < 300)
    val queries = emb.filter(col("vec_id") < 3)
    val out = Similarity.ivfPqTopK(emb, queries, kNeighbors = 5,
      kCells = 4, cellIters = 2, nprobe = 2, m = 4, kCodes = 4, pqIters = 1,
      dim = 64).cache()
    // ranks 1..k per query, every neighbor tagged with its coarse cell
    assert(out.count() > 0)
    out.groupBy("query_id").agg(max("rank")).collect()
      .foreach(r => assert(r.getInt(1) <= 5))
    // ≤ nprobe distinct cells contribute per query
    out.groupBy("query_id").agg(countDistinct("cell").as("nc")).collect()
      .foreach(r => assert(r.getLong(1) <= 2))
    // with nprobe = kCells the pruning is a no-op: identical (query,
    // neighbor, adc_dist) set to the unpruned pqTopK scan
    val full = Similarity.ivfPqTopK(emb, queries, kNeighbors = 5,
      kCells = 4, cellIters = 2, nprobe = 4, m = 4, kCodes = 4, pqIters = 1,
      dim = 64).select("query_id", "neighbor_id", "adc_dist")
    val pq = Similarity.pqTopK(emb, queries, kNeighbors = 5,
      m = 4, kCodes = 4, iters = 1, dim = 64)
      .select("query_id", "neighbor_id", "adc_dist")
    assert(full.exceptAll(pq).count() === 0)
    assert(pq.exceptAll(full).count() === 0)
    out.unpersist()
  }

  test("residual ivfPqTopK: valid ranks, probed-cell pairs, residual distances differ from raw") {
    val emb = Tables.embeddings(spark, sf).filter(col("vec_id") < 300)
    val queries = emb.filter(col("vec_id") < 3)
    val res = Similarity.ivfPqTopK(emb, queries, kNeighbors = 5,
      kCells = 4, cellIters = 2, nprobe = 2, m = 4, kCodes = 4, pqIters = 1,
      dim = 64, residual = true).cache()
    assert(res.count() > 0)
    res.groupBy("query_id").agg(max("rank")).collect()
      .foreach(r => assert(r.getInt(1) <= 5))
    res.groupBy("query_id").agg(countDistinct("cell").as("nc")).collect()
      .foreach(r => assert(r.getLong(1) <= 2))
    // residual quantization is a different code space: its ADC distances
    // are not the raw path's (identical values would mean the residual
    // subtraction silently didn't happen)
    val raw = Similarity.ivfPqTopK(emb, queries, kNeighbors = 5,
      kCells = 4, cellIters = 2, nprobe = 2, m = 4, kCodes = 4, pqIters = 1,
      dim = 64)
    val joined = res.select(col("query_id"), col("neighbor_id"),
      col("adc_dist").as("d_res"))
      .join(raw.select(col("query_id"), col("neighbor_id"),
        col("adc_dist").as("d_raw")), Seq("query_id", "neighbor_id"))
    assert(joined.filter(col("d_res") =!= col("d_raw")).count() > 0)
    res.unpersist()
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

  test("annRecall: every query reports, recall in [0,1], single-cell corpus hits 1.0") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 4)
    val rec = Similarity.annRecall(emb, queries, k = 3).collect()
    assert(rec.length === 4, "zero-hit queries must still report")
    rec.foreach { r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
      assert(r.getDouble(2) === r.getLong(1).toDouble / 3)
    }
    // when every vector shares one cell, IVF degenerates to brute force
    // and recall must be exactly 1.0 for every query
    val oneCell = emb.withColumn("label", lit(0))
    val full = Similarity.annRecall(oneCell, oneCell.filter(col("vec_id") < 4), 3)
      .collect()
    assert(full.forall(_.getDouble(2) == 1.0), "single-cell recall must be 1.0")
  }
}
