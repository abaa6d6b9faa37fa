package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (SURVEY §7.7).
  *
  * Cosine is computed as an explicit sequential fold (`aggregate`) over
  * double-cast elements so the result is bit-identical to a DuckDB
  * list_reduce with the same per-index products — no reliance on either
  * engine's built-in summation order.
  */
object Similarity {

  /** dot(a, b) as a left-to-right fold of per-index products. */
  def foldDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm2(a: Column): Column = foldDot(a, a)

  def cosine(a: Column, b: Column): Column =
    foldDot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** Brute-force top-k cosine neighbors for a set of query vectors — the
    * exactness baseline. Plan shape: broadcast the (small) query set against
    * the corpus scan, per-row fold, then a per-query top-k window.
    * At 100 TB the corpus side stays partition-parallel; the only shuffle is
    * the top-k aggregation keyed by query id (k rows per partition per query
    * after partial top-k with AQE).
    */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val joined = corpus.as("c").join(broadcast(queries.as("q")),
      col("c.vec_id") =!= col("q.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        cosine(col("q.embedding"), col("c.embedding")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    joined.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** IVF-style partition-pruned search: the corpus is partitioned by a
    * coarse quantizer cell (here the `label` column stands in for the
    * assigned centroid); a query probes only its own cell. This is the
    * scale path: the candidate set shrinks by the number of cells, and the
    * cell id is a partition key so the probe is partition-pruned, not
    * scanned. nprobe>1 = union over the nearest cells.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val joined = corpus.as("c").join(broadcast(queries.as("q")),
      col("c.label") === col("q.label") && col("c.vec_id") =!= col("q.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        col("c.label").as("cell"),
        cosine(col("q.embedding"), col("c.embedding")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    joined.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Sign-bit LSH bucket key from fixed deterministic hyperplanes:
    * h_j[i] = ((i·31 + j·17) mod 7) − 3. Vectors whose dot products agree
    * in sign across the planes share a bucket; near-dup candidates come
    * from an equality join on the bucket key (shuffle on a small int key).
    */
  def lshBucket(emb: Column, dim: Int, planes: Int = 4): Column = {
    val bits = (0 until planes).map { j =>
      val dot = aggregate(
        zip_with(emb, sequence(lit(0), lit(dim - 1)),
          (x, i) => x.cast("double") * (((i * 31 + lit(j * 17)) % 7) - 3).cast("double")),
        lit(0.0), (acc, v) => acc + v)
      when(dot >= 0, 1 << j).otherwise(0)
    }
    bits.reduce(_ + _)
  }

  /** Nearest neighbor within each vector's own cell + a near-dup flag —
    * embedding-cosine near-duplicate detection (one row per vector).
    */
  def embeddingNearDup(corpus: DataFrame, threshold: Double): DataFrame = {
    val joined = corpus.as("a").join(corpus.as("b"),
      col("a.label") === col("b.label") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("vec_id"), col("b.vec_id").as("neighbor_id"),
        cosine(col("a.embedding"), col("b.embedding")).as("cos"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    joined.withColumn("rank", row_number().over(w)).filter(col("rank") === 1)
      .select(col("vec_id"), col("neighbor_id"), col("cos"),
        (col("cos") >= threshold).as("is_near_dup"))
  }
}
