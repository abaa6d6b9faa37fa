package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** Byte-feature extraction and resize/sampling plumbing over binary
  * columns — hand-computed vectors for the codec-free features.
  */
class MultimodalSpec extends SparkSpec {

  private def mediaDf(rows: Seq[(Long, String, Array[Byte])]) = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("kind", StringType),
      StructField("content", BinaryType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3))),
      schema)
  }

  // independent reimplementation of the positional histogram pin:
  // Horner fold h ← (h·31 + bucket[k]) mod 1e9+7 over k = 0..15
  private def horner(buckets: Seq[Long]): Long =
    buckets.foldLeft(0L)((h, b) => (h * 31L + b) % 1000000007L)

  test("byteFeatures: hand-computed entropy / histogram / ascii ratio") {
    // 4 bytes, two distinct values equally likely -> entropy exactly 1 bit
    val twoVal = Array[Byte](0x00, 0x41, 0x00, 0x41)
    // uniform 0..255 -> entropy exactly 8 bits, ascii ratio 95/256
    val uniform = Array.tabulate(256)(_.toByte)
    val out = Multimodal.byteFeatures(
      mediaDf(Seq((1L, "blob", twoVal), (2L, "blob", uniform))))
      .collect().map(r => r.getLong(0) -> r).toMap

    val r1 = out(1L)
    assert(math.abs(r1.getAs[Double]("entropy") - 1.0) < 1e-12)
    assert(r1.getAs[Double]("ascii_ratio") === 0.5) // 'A' printable, 0x00 not
    // buckets: hist16[0]=2 (0x00), hist16[4]=2 (0x41), rest 0
    assert(r1.getAs[Long]("hist16_checksum")
      === horner(Seq.tabulate(16)(k => if (k == 0 || k == 4) 2L else 0L)))

    val r2 = out(2L)
    assert(math.abs(r2.getAs[Double]("entropy") - 8.0) < 1e-12)
    assert(r2.getAs[Double]("ascii_ratio") === 95.0 / 256)
    // uniform: every bucket 16
    assert(r2.getAs[Long]("hist16_checksum") === horner(Seq.fill(16)(16L)))
  }

  test("byteFeatures: histogram checksum distinguishes bucket positions") {
    // moving counts 3→1 and 5→7 cancelled under the old Σ(k+1)·bucket sum;
    // the Horner polynomial must tell these apart
    val a = Array[Byte](0x30, 0x50) // buckets 3 and 5
    val b = Array[Byte](0x10, 0x70) // buckets 1 and 7
    val out = Multimodal.byteFeatures(
      mediaDf(Seq((1L, "blob", a), (2L, "blob", b))))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("hist16_checksum")).toMap
    assert(out(1L) !== out(2L))
  }

  test("byteFeatures: empty and null blobs produce zeroed features") {
    val out = Multimodal.byteFeatures(
      mediaDf(Seq((1L, "blob", Array.empty[Byte]), (2L, "blob", null))))
      .collect().map(r => r.getLong(0) -> r).toMap
    for (id <- Seq(1L, 2L)) {
      assert(out(id).getAs[Long]("byte_len") === 0L)
      assert(out(id).getAs[Double]("entropy") === 0.0)
      assert(out(id).getAs[Double]("ascii_ratio") === 0.0)
    }
  }

  test("sampleOffsets: 40ms steps cover the decoded duration") {
    val media = mediaDf(Seq(
      (1L, "video", MediaHeader.mp4Bytes(640, 360, durationMs = 1000)),
      (2L, "audio", MediaHeader.wavBytes(8000, 1, dataSeconds = 2)),
      (3L, "image", ImageHeader.pngBytes(32, 32))))
    val out = Multimodal.sampleOffsets(Multimodal.decode(media), stepMs = 40)
      .collect().map(r => r.getLong(0) -> r).toMap
    val v = out(1L).getSeq[Long](out(1L).fieldIndex("offsets_ms"))
    assert(v.length === 25 && v.head === 0L && v.last === 960L)
    val a = out(2L).getSeq[Long](out(2L).fieldIndex("offsets_ms"))
    assert(a.length === 50 && a.last === 1960L)
    assert(out(3L).getAs[Long]("n_samples") === 0L)
  }

  test("resizePlan: limiting-axis integer math, audio rows dropped") {
    val media = mediaDf(Seq(
      (1L, "image", ImageHeader.pngBytes(320, 200)),     // fits
      (2L, "video", MediaHeader.mp4Bytes(1920, 1080)),   // width-limited
      (3L, "image", ImageHeader.pngBytes(100, 480)),     // height-limited
      (4L, "audio", MediaHeader.wavBytes(8000, 1))))
    val out = Multimodal.resizePlan(Multimodal.decode(media), 640, 360)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet === Set(1L, 2L, 3L))
    assert(out(1L).getAs[Long]("target_width") === 320L && !out(1L).getAs[Boolean]("scaled"))
    assert(out(2L).getAs[Long]("target_width") === 640L)
    assert(out(2L).getAs[Long]("target_height") === 360L) // 1080*640/1920
    assert(out(3L).getAs[Long]("target_width") === 75L)   // 100*360/480
    assert(out(3L).getAs[Long]("target_height") === 360L)
  }

  test("audioFrames: hand-computed window energies, tail, voiced, skip") {
    val media = mediaDf(Seq(
      (1L, "audio", Samples.wavPcmBytes(8000, 2, 5, 9L)), // 5 frames stereo
      (2L, "audio", Array.fill(32)(0x41.toByte))))        // undecodable
    val out = Multimodal.audioFrames(media, winFrames = 2,
        voicedMeanSq = 1300000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    // windows [0,1] [2,3] [4]; energies recomputed from the formula
    def e(f0: Int, f1: Int): Long =
      (for (f <- f0 until f1; c <- 0 until 2)
        yield { val s = Samples.genSample(f, c, 9L).toLong; s * s }).sum
    assert(out.keySet === Set((1L, 0L), (1L, 1L), (1L, 2L)))
    assert(out((1L, 0L)).getAs[Long]("energy") === e(0, 2))
    assert(out((1L, 1L)).getAs[Long]("energy") === e(2, 4))
    assert(out((1L, 2L)).getAs[Long]("energy") === e(4, 5))
    assert(out((1L, 2L)).getAs[Long]("win_frames") === 1L)
    for (((_, w), r) <- out) {
      val expect = r.getAs[Long]("energy") /
        (r.getAs[Long]("win_frames") * 2) >= 1300000L
      assert(r.getAs[Boolean]("voiced") === expect, s"win $w")
    }
  }
}
