package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Multimodal fingerprint dedup: image dHash + audio energy-delta
  * fingerprints, and the generalized hamming-ball probe they share with
  * text SimHash ([[Dedup.hammingNearDupPairs]]).
  *
  * The probe's contract is COMPLETENESS under the pigeonhole banding:
  * below the member cap it must find exactly the pairs brute force finds —
  * pinned here against an in-test brute-force join, the same shape the
  * DuckDB oracle uses at sf0.01.
  */
class FingerprintSpec extends SparkSpec {

  private def docs(n: Int): DataFrame = {
    import spark.implicits._
    (0L until n.toLong).map(i => (i, s"doc $i")).toDF("doc_id", "text")
  }

  private def bruteForce(hashed: DataFrame, idCol: String, hashCol: String,
      maxDist: Int, blockBy: Seq[String] = Nil): Set[(Long, Long, Int)] = {
    val a = hashed.filter(col(hashCol).isNotNull).select(
      col(idCol).as("ia") +: col(hashCol).as("ha") +:
        blockBy.map(c => col(c).as(s"${c}_a")): _*)
    val b = hashed.filter(col(hashCol).isNotNull).select(
      col(idCol).as("ib") +: col(hashCol).as("hb") +:
        blockBy.map(c => col(c).as(s"${c}_b")): _*)
    val cond = blockBy.foldLeft(col("ia") < col("ib")) {
      case (c, k) => c && col(s"${k}_a") === col(s"${k}_b")
    }
    a.join(b, cond)
      .select(col("ia"), col("ib"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).as("d"))
      .filter(col("d") <= maxDist)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  test("image dHash matches the generative formula on a known vector") {
    // doc_id 5: w=9, h=9, id%6=5 → grayscale, gray(x,y)=(3x+13y+5)%256.
    // Sample grid sx = x*9/8, sy = y*9/8; luma of (v,v,v) is v (299+587+114
    // = 1000). Replay exactly and compare.
    val id = 5L
    def gray(x: Int, y: Int): Int = (x * 3 + y * 13 + 5) % 256
    var expect = 0L
    for (y <- 0 until 8; x <- 0 until 7) {
      val sy = y * 9 / 8
      if (gray((x + 1) * 9 / 8, sy) > gray(x * 9 / 8, sy))
        expect |= 1L << (y * 7 + x)
    }
    val got = Multimodal.imagePhash(
      Multimodal.bmpMediaFromDocuments(docs(10).filter(col("doc_id") === id)))
      .collect()
    assert(got.length === 1 && got(0).getLong(1) === expect)
  }

  test("probe finds exactly the brute-force image pairs") {
    val hashed = Multimodal.imagePhash(
      Multimodal.bmpMediaFromDocuments(docs(150)))
    val probe = Dedup.hammingNearDupPairs(hashed, "media_id", "phash",
      maxDist = 2, bits = 56)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = bruteForce(hashed, "media_id", "phash", 2)
    assert(brute.nonEmpty, "test corpus must contain near-dup images")
    assert(probe === brute)
  }

  test("image probe blocked on decoded dims finds the within-cohort pairs") {
    val hashed = Multimodal.imagePhash(
      Multimodal.bmpMediaFromDocuments(docs(150)))
    val probe = Dedup.hammingNearDupPairs(hashed, "media_id", "phash",
      maxDist = 2, bits = 56, blockBy = Seq("width", "height"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = bruteForce(hashed, "media_id", "phash", 2,
      Seq("width", "height"))
    assert(brute.nonEmpty, "test corpus must contain same-dim near-dups")
    assert(probe === brute)
    // the cohort keys must actually prune: unblocked brute force pairs
    // hot hash values across dimension cohorts
    val unblocked = bruteForce(hashed, "media_id", "phash", 2)
    assert(unblocked.size > brute.size,
      "blocking by dims must prune cross-dimension pairs")
  }

  test("audio fingerprints pair only within the same bit-length") {
    val hashed = Multimodal.audioFingerprint(
      Multimodal.wavMediaFromDocuments(docs(150)))
    val probe = Dedup.hammingNearDupPairs(hashed, "media_id", "afp",
      maxDist = 2, bits = 56, blockBy = Seq("n_bits"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = bruteForce(hashed, "media_id", "afp", 2, Seq("n_bits"))
    assert(brute.nonEmpty, "test corpus must contain near-dup clips")
    assert(probe === brute)
    // the UNBLOCKED probe would cross-pair clips of different lengths
    // (short fingerprints share zero high bits); blocking must remove them
    val unblocked = bruteForce(hashed, "media_id", "afp", 2)
    assert(unblocked.size > brute.size,
      "blocking by n_bits must prune cross-length pairs")
  }

  test("probe group histogram separates demanded pairs from capped pairs") {
    val hashed = Multimodal.imagePhash(
      Multimodal.bmpMediaFromDocuments(docs(150)))
    // maxBlock=2 < the corpus's widest dims-blocked group (4 members at
    // 150 docs) so the cap provably engages in the histogram's arithmetic
    val rows = Dedup.probeGroupHistogram(hashed, "phash",
      maxDist = 2, bits = 56, maxBlock = 2,
      blockBy = Seq("width", "height")).collect()
    assert(rows.nonEmpty)
    val (uncapped, capped) =
      (rows.map(_.getLong(3)).sum, rows.map(_.getLong(4)).sum)
    assert(rows.exists(r => r.getLong(2) > 2),
      "test corpus must contain a group wider than the cap")
    assert(uncapped > capped,
      s"a wider-than-cap group must show uncapped $uncapped > capped $capped")
    // sanity on the bucketing: every group falls in the bucket its
    // max_width claims (max_width < 2^(log2_width+1))
    rows.foreach { r =>
      assert(r.getLong(2) < (2L << r.getInt(0)),
        s"max_width ${r.getLong(2)} outside bucket log2=${r.getInt(0)}")
    }
  }

  test("video size-delta fingerprints pair only within the same bit-length") {
    val hashed = Multimodal.videoFingerprint(
      Multimodal.mp4MediaFromDocuments(docs(300)))
    val probe = Dedup.hammingNearDupPairs(hashed, "media_id", "vfp",
      maxDist = 2, bits = 56, blockBy = Seq("n_bits"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = bruteForce(hashed, "media_id", "vfp", 2, Seq("n_bits"))
    assert(brute.nonEmpty, "test corpus must contain near-dup clips")
    assert(probe === brute)
    // ids ≡ (mod 120) share the size formula AND the sample count — the
    // identical-fingerprint cluster the synthetic corpus guarantees
    assert(probe.exists { case (a, b, d) => d == 0 && (b - a) % 120 == 0 })
  }

  test("keyframe hashes from sliced mdat ranges equal direct-frame hashes") {
    import spark.implicits._
    val media = Multimodal.mp4FrameMediaFromDocuments(docs(400))
    val got = Multimodal.keyframeHashes(media)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(3)).toMap
    assert(got.nonEmpty)
    got.keys.foreach { case (_, sampleIdx) =>
      assert((sampleIdx - 1) % 4 == 0, "only stss samples may surface")
    }
    // the frame sliced out of the container must hash exactly like the
    // same BMP built directly — wrong offsets/sizes would decode garbage
    val directFrames = got.keys.toSeq.map { case (id, sampleIdx) =>
      val i = sampleIdx - 1
      val fw = (id % 8 + 4).toInt
      val fh = (id % 6 + 4).toInt
      // uid packs (clip, sample) so one imagePhash call covers all frames
      (id * 64 + sampleIdx, "image", Pixels.bmpBytes(fw, fh, id * 100 + i))
    }
    val direct = Multimodal.imagePhash(
      directFrames.toDF("media_id", "kind", "content"))
      .collect()
      .map(r => ((r.getLong(0) / 64, (r.getLong(0) % 64).toInt)) -> r.getLong(1))
      .toMap
    assert(got === direct)
    // clip rollup: ids 192 apart carry identical frames (dims and frame
    // seeds realign — the corpus periodicity), so near-dup pairs exist
    // and every reported pair shares >= 2 keyframes
    val clips = Multimodal.keyframeClipDedup(media)
      .filter(col("near_dup")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(clips.nonEmpty, "corpus must contain near-dup clips")
    assert(clips.forall(_._3 >= 2))
    assert(clips.exists { case (a, b, _) => b - a == 192 })
  }

  test("undecodable media fingerprint as NULL and never pair") {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("kind", StringType),
      StructField("content", BinaryType)))
    val good = Multimodal.bmpMediaFromDocuments(docs(4))
    val corrupt = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(100L, "image", Array[Byte](1, 2, 3)),
        Row(101L, "image", null)),
      schema)
    val hashed = Multimodal.imagePhash(good.unionByName(corrupt))
    val nulls = hashed.filter(col("phash").isNull)
      .collect().map(_.getLong(0)).toSet
    assert(nulls === Set(100L, 101L))
    val pairs = Dedup.hammingNearDupPairs(hashed, "media_id", "phash",
      maxDist = 10, bits = 56)
    assert(pairs.filter(col("id_a") >= 100 || col("id_b") >= 100).count() === 0)
  }
}
