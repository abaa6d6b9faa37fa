package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Direct contract of the native pair expansion
  * ([[org.apache.spark.sql.graftexpr.HammingPairsExpr]]), independent of the
  * probe that hosts it: replaying the banding over a random fingerprint set
  * must emit every brute-force pair within `maxDist` EXACTLY once across all
  * blocks (the pigeonhole guarantee + first-match-block dedup), with
  * `id_a < id_b` in member order and the true hamming distance attached.
  */
class HammingPairsSpec extends SparkSpec {

  private val MaxDist = 2
  private val Bits = 56
  private val NBlocks = MaxDist + 1

  private def widths: Array[Int] = {
    val base = Bits / NBlocks
    val extra = Bits % NBlocks
    Array.tabulate(NBlocks)(b => if (b < extra) base + 1 else base)
  }
  private def shifts: Array[Int] = widths.scanLeft(0)(_ + _).init
  private def slice(v: Long, b: Int): Long =
    (v >>> shifts(b)) & ((1L << widths(b)) - 1)

  /** Clustered random fingerprints: bases with 0-3 random bit flips, so
    * near-dup pairs actually exist, plus uniform noise rows.
    */
  private def corpus(seed: Int, n: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    val mask = (1L << Bits) - 1
    val bases = Array.fill(n / 8)(rnd.nextLong() & mask)
    (0 until n).map { id =>
      val v =
        if (rnd.nextBoolean() && bases.nonEmpty) {
          var x = bases(rnd.nextInt(bases.length))
          (0 until rnd.nextInt(4)).foreach(_ => x ^= 1L << rnd.nextInt(Bits))
          x
        } else rnd.nextLong() & mask
      (id.toLong, v)
    }
  }

  private def bruteForce(rows: Seq[(Long, Long)]): Set[(Long, Long, Int)] =
    (for {
      (ia, va) <- rows; (ib, vb) <- rows if ia < ib
      ham = java.lang.Long.bitCount(va ^ vb) if ham <= MaxDist
    } yield (ia, ib, ham)).toSet

  /** Replay the probe's group construction: per block, members grouped by
    * that block's slice (width ≥ 2), sorted by id, expanded natively.
    */
  private def nativePairs(rows: Seq[(Long, Long)]): Seq[(Long, Long, Int)] = {
    import spark.implicits._
    val groups = for {
      b <- 0 until NBlocks
      // .toSeq matters: mapping a Map with (b, members) tuples would
      // rebuild a Map keyed by b and silently keep ONE group per block
      (_, members) <- rows.groupBy { case (_, v) => slice(v, b) }.toSeq
      if members.size >= 2
    } yield (b, members.sortBy(_._1))
    val df = groups.toDF("blk", "ms")
      .select(explode(HammingPairs(
        col("ms").cast("array<struct<k:bigint,v:bigint>>"), col("blk"), MaxDist, Bits)).as("p"))
      .select("p.id_a", "p.id_b", "p.hamming")
    val out = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    graft.GraftSession.sweepPersisted(spark)
    out
  }

  test("every brute-force pair emitted exactly once across blocks") {
    for (seed <- Seq(7, 41, 113)) {
      val rows = corpus(seed, 96)
      val expect = bruteForce(rows)
      assert(expect.nonEmpty, s"seed $seed must produce near-dup pairs")
      val got = nativePairs(rows)
      assert(got.size === got.distinct.size,
        s"seed $seed: a pair must materialize from exactly ONE block")
      assert(got.toSet === expect, s"seed $seed: native != brute force")
    }
  }

  test("identical fingerprints pair at hamming 0 from block 0 only") {
    import spark.implicits._
    val ms = Seq((1L, 42L), (2L, 42L), (3L, 42L))
    // all three blocks see the full group; only block 0 may emit
    val perBlock = (0 until NBlocks).map { b =>
      Seq((b, ms)).toDF("blk", "ms")
        .select(explode(HammingPairs(col("ms").cast("array<struct<k:bigint,v:bigint>>"), col("blk"), MaxDist, Bits)).as("p"))
        .count()
    }
    assert(perBlock === Seq(3L, 0L, 0L))
    graft.GraftSession.sweepPersisted(spark)
  }

  test("empty and singleton member arrays emit nothing") {
    import spark.implicits._
    val df = Seq((0, Seq.empty[(Long, Long)]), (1, Seq((5L, 9L))))
      .toDF("blk", "ms")
      .select(explode(HammingPairs(col("ms").cast("array<struct<k:bigint,v:bigint>>"), col("blk"), MaxDist, Bits)))
    assert(df.count() === 0L)
    graft.GraftSession.sweepPersisted(spark)
  }
}
