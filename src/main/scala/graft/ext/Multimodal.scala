package graft.ext

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY §7.7): image/audio/video as opaque
  * `binary` columns with typed metadata, processed by batch-shaped
  * per-partition decoders.
  *
  * All three kinds decode REAL container bytes: [[ImageHeader]] parses
  * width/height/format from PNG/JPEG/GIF, [[MediaHeader]] parses the WAV
  * RIFF `fmt ` chunk (sample rate, channels) and the MP4 `moov`→`trak`→
  * `tkhd` box (width, height). Header parsing is the scan-speed metadata
  * path — no pixel/sample decode; a full codec swaps in behind the same
  * per-batch signature.
  *
  * Scale notes: media bytes dominate row size, so (1) metadata-only queries
  * must prune the binary column (columnar formats make this free — verify
  * ReadSchema excludes `content`); (2) decode is per-partition batch work
  * with no shuffle; (3) store media in size-bucketed partitions so decode
  * tasks are balanced (a 4 KB icon and a 40 MB video in one task skews).
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType),
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("byte_len", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("format", StringType),
      StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType),
      StructField("duration_ms", LongType))))))

  /** Build a media table from the documents table. Every row carries REAL
    * container bytes with parameters derived from the id — a stored-blob
    * stand-in that real header parsing must decode: images alternate
    * PNG/JPEG, audio is a canonical WAV header, video a minimal ISO-BMFF
    * (ftyp + moov/trak/tkhd).
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame = {
    // fanOut before the synth/decode chain: the local documents parquet is
    // a single split, which would pin every blob's synthesis AND all
    // downstream per-partition decode to one core; a no-op at production
    // split counts (all media builders below share this)
    val base = graft.Tables.fanOut(docs).select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      col("text").cast("binary").as("content"))
    val schema = base.schema
    base.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getString(1) match {
          case "image" =>
            val w = (id % 640 + 1).toInt
            val h = (id % 480 + 1).toInt
            if (id % 6 == 0) ImageHeader.pngBytes(w, h)
            else ImageHeader.jpegBytes(w, h)
          case "audio" =>
            MediaHeader.wavBytes(8000 + (id % 5).toInt * 8000, (id % 2).toInt + 1,
              dataSeconds = (id % 10).toInt + 1)
          case _ =>
            MediaHeader.mp4Bytes((id % 1920).toInt + 16, (id % 1080).toInt + 16,
              durationMs = ((id % 30).toInt + 1) * 1000)
        }
        Row(id, r.getString(1), bytes)
      }
    }(Encoders.row(schema))
  }

  /** Per-partition batch decode producing the typed metadata struct — the
    * Scala shape of a mapInPandas/Arrow-batch decoder: rows stream through
    * a partition-local decoder without driver involvement or shuffle.
    * Unparseable bytes yield null fields and format "unknown".
    */
  def decode(media: DataFrame): DataFrame = {
    val schema = mediaSchema
    val idIdx = media.schema.fieldIndex("media_id")
    val kindIdx = media.schema.fieldIndex("kind")
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](contentIdx)
        val kind = r.getString(kindIdx)
        val n = if (bytes == null) 0L else bytes.length.toLong
        val unknown = Row(n, null, null, "unknown", null, null, null)
        val meta = kind match {
          case "image" => ImageHeader.decode(bytes)
            .map(i => Row(n, i.width, i.height, i.format, null, null, null))
            .getOrElse(unknown)
          case "audio" => MediaHeader.decodeWav(bytes)
            .map(a => Row(n, null, null, a.format, a.sampleRate, a.channels,
              a.durationMs))
            .getOrElse(unknown)
          case "video" => MediaHeader.decodeMp4(bytes)
            .map(v => Row(n, v.width, v.height, v.format, null, null,
              v.durationMs))
            .getOrElse(unknown)
          case _ => unknown
        }
        Row(r.getLong(idIdx), kind, bytes, meta)
      }
    }(Encoders.row(schema))
  }

  /** Metadata-only projection — must NOT read the binary column at scan
    * time (check ReadSchema in the plan).
    */
  def metaOnly(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("kind"),
      length(col("content")).cast("bigint").as("byte_len"))

  /** Frame/window sampling from the REAL decoded clip duration: one offset
    * every `stepMs` through the clip (25 fps video sampling = 40 ms; audio
    * analysis windows likewise). Pure column arithmetic over the decoded
    * metadata — the binary column is untouched, so an offsets-only query
    * scans header metadata, never blobs. Rows with no duration (images,
    * undecodable bytes) get an empty offset list.
    */
  def sampleOffsets(decoded: DataFrame, stepMs: Int): DataFrame = {
    val dur = col("meta").getField("duration_ms")
    decoded.select(col("media_id"), col("kind"), dur.as("duration_ms"),
      when(dur > 0, sequence(lit(0L), dur - 1, lit(stepMs.toLong)))
        .otherwise(array().cast("array<bigint>")).as("offsets_ms"))
      .withColumn("n_samples", size(col("offsets_ms")).cast("bigint"))
  }

  /** Resize planning: fit-within-box target dimensions for image/video
    * rows. Cross-multiplied integer comparison picks the limiting axis and
    * floor division computes the scaled dimension (products stay < 2^53,
    * so the floor(double) is exact and engine-agnostic). The pixel
    * resample itself needs a codec — out of scope for the header-only
    * decode path — but it would slot into the same per-partition batch
    * signature as [[decode]], consuming this plan.
    */
  def resizePlan(decoded: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val w = col("meta").getField("width").cast("bigint")
    val h = col("meta").getField("height").cast("bigint")
    val fits = w <= maxW && h <= maxH
    val widthLimited = w * maxH >= h * maxW
    val tw = when(fits, w).when(widthLimited, lit(maxW.toLong))
      .otherwise(floor(w * maxH / h).cast("bigint"))
    val th = when(fits, h).when(widthLimited, floor(h * maxW / w).cast("bigint"))
      .otherwise(lit(maxH.toLong))
    decoded.filter(w.isNotNull && h.isNotNull)
      .select(col("media_id"), col("kind"), w.as("width"), h.as("height"),
        tw.as("target_width"), th.as("target_height"), (!fits).as("scaled"))
  }

  /** Batch-shaped byte-level feature extraction over the binary column —
    * the features computable WITHOUT a codec: a 16-bin byte histogram,
    * Shannon entropy (bits/byte), and printable-ASCII ratio (cheap
    * compressed-vs-text signal). The per-partition loop is the Arrow/
    * mapInPandas batch shape; a real embedding or codec model slots into
    * the same signature without changing the plan.
    */
  def byteFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("kind", StringType),
      StructField("byte_len", LongType),
      StructField("entropy", DoubleType),
      StructField("ascii_ratio", DoubleType),
      // positional checksum of the 16-bucket histogram: Horner fold
      // h ← (h·31 + hist16[k]) mod 1e9+7 over k = 0..15. Unlike a plain
      // weighted sum Σ(k+1)·bucket (whose bucket moves can cancel — e.g.
      // 3→1 and 5→7 — making the pin weaker than claimed), the rolling
      // polynomial distinguishes every (count, position) assignment up to
      // hash collisions. Scalar because the driver comparator can't sort
      // rows containing array columns (r3: multimodal_features crashed its
      // pandas lexsort) — same scalarization sim_quantize uses.
      StructField("hist16_checksum", LongType)))
    val idIdx = media.schema.fieldIndex("media_id")
    val kindIdx = media.schema.fieldIndex("kind")
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](contentIdx)
        val n = if (bytes == null) 0 else bytes.length
        val counts = new Array[Long](256)
        var ascii = 0L
        var i = 0
        while (i < n) {
          val b = bytes(i) & 0xff
          counts(b) += 1
          if (b >= 0x20 && b < 0x7f) ascii += 1
          i += 1
        }
        var entropy = 0.0
        var j = 0
        while (j < 256) {
          if (counts(j) > 0) {
            val p = counts(j).toDouble / n
            entropy -= p * (math.log(p) / math.log(2))
          }
          j += 1
        }
        var checksum = 0L
        var k = 0
        while (k < 16) {
          var bucket = 0L
          var m = 0
          while (m < 16) { bucket += counts(k * 16 + m); m += 1 }
          checksum = (checksum * 31L + bucket) % 1000000007L
          k += 1
        }
        Row(r.getLong(idIdx), r.getString(kindIdx), n.toLong,
          if (n == 0) 0.0 else entropy,
          if (n == 0) 0.0 else ascii.toDouble / n,
          checksum)
      }
    }(Encoders.row(outSchema))
  }

  /** Media table of REAL image blobs (small generative test pattern —
    * dims and pixels are pure functions of the id, see [[Pixels.genR]]),
    * the pixel-depth counterpart of [[mediaFromDocuments]]'s header-only
    * containers. Container format rotates by id — id%6 = 0 uncompressed
    * 24-bit BMP, 1 PNG RGB (color type 2), 2 PNG RGBA (color type 6),
    * 3 GIF (LZW + 256-entry palette, interlaced when id%8 = 7), 4 PNG
    * palette (color type 3 over a PLTE), 5 PNG grayscale (color type 0)
    * — so every consumer exercises the BMP parser, the full PNG path
    * (zlib inflate + all five scanline filters + 1/3/4-byte pixel strides
    * + PLTE resolution + gray widening), AND the GIF LZW/interlace path.
    * Decoded pixels stay pure functions of (x, y, id) — truecolor rows
    * use [[Pixels.genR]]; GIF AND palette-PNG rows share one palette
    * curve over [[Pixels.gifIndex]] (indexed color can't ride 24-bit
    * truecolor); grayscale rows widen [[Pixels.genR]] to r = g = b — so
    * the oracle computes stats from the formulas, never touching the
    * containers.
    */
  def bmpMediaFromDocuments(docs: DataFrame): DataFrame = {
    val base = graft.Tables.fanOut(docs).select(col("doc_id").as("media_id"))
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("kind", StringType),
      StructField("content", BinaryType)))
    base.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val w = (id % 16 + 4).toInt
        val h = (id % 12 + 4).toInt
        val blob = (id % 6) match {
          case 0 => Pixels.bmpBytes(w, h, id)
          case 1 => Pixels.pngBytes(w, h, id, alpha = false)
          case 2 => Pixels.pngBytes(w, h, id, alpha = true)
          case 3 => Pixels.gifBytes(w, h, id, interlaced = id % 8 == 7)
          case 4 => Pixels.pngPalBytes(w, h, id)
          case _ => Pixels.pngGrayBytes(w, h, id)
        }
        Row(id, "image", blob)
      }
    }(Encoders.row(schema))
  }

  /** Media table of compressed document text — web corpora ship documents
    * compressed, and the pipeline must decode inside the scan. Codec
    * rotates by id%2 (gzip / zstd — [[Gzip.gzip]]/[[Gzip.zstd]], the two
    * frames real corpora mix), so the consumer's magic dispatch is
    * exercised every run. Rows with id%53 = 0 are truncated to half
    * their compressed length: a REAL corruption the decoder must answer
    * with NULL, not an exception — giving the oracle a negative path to
    * pin.
    */
  def gzipMediaFromDocuments(docs: DataFrame): DataFrame = {
    val base = graft.Tables.fanOut(docs).select(col("doc_id").as("media_id"), col("text"))
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("kind", StringType),
      StructField("content", BinaryType)))
    base.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getString(1).getBytes("UTF-8")
        val (kind, packed) =
          if (id % 2 == 0) ("text/gzip", Gzip.gzip(bytes))
          else ("text/zstd", Gzip.zstd(bytes))
        val blob =
          if (id % 53 == 0) java.util.Arrays.copyOf(packed, packed.length / 2)
          else packed
        Row(id, kind, blob)
      }
    }(Encoders.row(schema))
  }

  /** Decode compressed text blobs inside the scan
    * ([[graft.functions.DecompressText]] — magic-dispatched gzip/zstd,
    * bounded, NULL on corruption) and report per-blob text length and
    * content digest. Scan-shaped: no shuffle; at 100 TB decompression
    * rides the same codegen stage as any downstream gate.
    */
  def gzipText(media: DataFrame, maxBytes: Int = 1 << 24): DataFrame = {
    val txt = graft.functions.DecompressText(col("content"), maxBytes)
    graft.Tables.fanOut(media).select(
      col("media_id"),
      txt.isNotNull.as("ok"),
      length(txt).as("text_len"),
      md5(encode(txt, "UTF-8")).as("text_md5"))
  }

  /** Media table of REAL baseline JPEG blobs (block-flat generative
    * pattern — flat 8×8 luma blocks, flat 16×16 chroma regions, quant
    * step 8, so the lossy DCT round trip is EXACT; see [[Jpeg]]). Mode
    * rotates by id%3 — 0 grayscale, 1 YCbCr 4:4:4, 2 YCbCr 4:2:0 — and
    * id%7 = 0 adds a restart interval, so consumers exercise Huffman
    * decode, dequant, IDCT, chroma upsampling, fixed-point color
    * conversion, AND the DRI/RSTn path. Dims are NOT multiples of 8/16
    * (w = id%24+8, h = id%20+8), so edge-MCU cropping runs too.
    */
  def jpegMediaFromDocuments(docs: DataFrame): DataFrame = {
    val base = graft.Tables.fanOut(docs).select(col("doc_id").as("media_id"))
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("kind", StringType),
      StructField("content", BinaryType)))
    base.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val w = (id % 24 + 8).toInt
        val h = (id % 20 + 8).toInt
        Row(id, "image", Jpeg.jpegBytes(w, h, id))
      }
    }(Encoders.row(schema))
  }

  /** Media table of REAL 16-bit PCM WAV blobs (generative test tone —
    * rate/channels/frames and every sample are pure functions of the id,
    * see [[Samples.genSample]]), the sample-depth counterpart of
    * [[mediaFromDocuments]]'s header-only WAVs.
    */
  def wavMediaFromDocuments(docs: DataFrame): DataFrame = {
    val base = graft.Tables.fanOut(docs).select(col("doc_id").as("media_id"))
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("kind", StringType),
      StructField("content", BinaryType)))
    base.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val rate = 8000 + (id % 5).toInt * 8000
        val ch = (id % 2).toInt + 1
        val frames = (id % 50).toInt + 10
        Row(id, "audio", Samples.wavPcmBytes(rate, ch, frames, id))
      }
    }(Encoders.row(schema))
  }

  /** Media table of REAL ISO-BMFF blobs WITH sample tables
    * ([[MediaHeader.mp4BytesWithSamples]]): stts/stsc/stsz/stco/stss plus
    * an mdat whose payload actually occupies the declared ranges. Every
    * table value is a closed-form function of the id (sample count
    * id % 24 + 8, sizes via [[MediaHeader.sampleSize]] with seed = id), so
    * the oracle replays offsets and payload checksums independently.
    */
  def mp4MediaFromDocuments(docs: DataFrame): DataFrame = {
    val base = graft.Tables.fanOut(docs).select(col("doc_id").as("media_id"))
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("kind", StringType),
      StructField("content", BinaryType)))
    base.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        Row(id, "video", MediaHeader.mp4BytesWithSamples(
          (id % 32 + 16).toInt, (id % 24 + 16).toInt, id, (id % 24 + 8).toInt))
      }
    }(Encoders.row(schema))
  }

  /** Resolve every sample of every MP4 to its REAL byte range via the
    * stbl walk ([[MediaHeader.decodeMp4Samples]]) and PROVE the ranges are
    * real by slicing the blob: `checksum` is the byte sum of the sample's
    * declared range read from the container itself (null when the range
    * falls outside the stored blob — the header-only-truncation case).
    * This is the map a frame-sampling pipeline needs to read actual frame
    * bytes from object storage instead of guessing timestamps; scan-local
    * per-partition batch shape, no shuffle, blobs never leave their
    * partitions. Undecodable containers contribute no rows.
    */
  def mp4Samples(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("sample_idx", IntegerType),
      StructField("chunk_idx", IntegerType),
      StructField("offset", LongType),
      StructField("size", LongType),
      StructField("time_ms", LongType),
      StructField("dur_ms", LongType),
      StructField("sync", BooleanType),
      StructField("checksum", LongType)))
    val idIdx = media.schema.fieldIndex("media_id")
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getAs[Array[Byte]](contentIdx)
        MediaHeader.decodeMp4Samples(bytes).toSeq.flatten.map { s =>
          val checksum =
            if (s.offset >= 0 && s.offset + s.size <= bytes.length) {
              var sum = 0L
              var p = s.offset.toInt
              val end = (s.offset + s.size).toInt
              while (p < end) { sum += bytes(p) & 0xff; p += 1 }
              java.lang.Long.valueOf(sum)
            } else null
          Row(id, s.sampleIdx, s.chunkIdx, s.offset, s.size, s.timeMs,
            s.durMs, s.sync, checksum)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Media table of ISO-BMFF blobs whose mdat samples are REAL encoded
    * frames: one uncompressed 24-bit BMP per sample
    * ([[MediaHeader.mp4BytesWithPayloads]]), frame pixels from the
    * [[Pixels]] generative formula with per-frame seed id·100 + frameIdx
    * — so slicing any sample's byte range yields a decodable image whose
    * pixels the oracle can replay. Frame dims (id%8+4)×(id%6+4), sample
    * count id%12+4, every 4th sample an stss keyframe.
    */
  def mp4FrameMediaFromDocuments(docs: DataFrame): DataFrame = {
    val base = graft.Tables.fanOut(docs).select(col("doc_id").as("media_id"))
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("kind", StringType),
      StructField("content", BinaryType)))
    base.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val fw = (id % 8 + 4).toInt
        val fh = (id % 6 + 4).toInt
        val n = (id % 12 + 4).toInt
        val frames = Array.tabulate(n)(i => Pixels.bmpBytes(fw, fh, id * 100 + i))
        Row(id, "video", MediaHeader.mp4BytesWithPayloads(fw, fh, frames,
          syncEvery = 4))
      }
    }(Encoders.row(schema))
  }

  /** REAL keyframe extraction: walk the sample tables, slice each stss
    * sync sample's byte range OUT OF THE BLOB, decode the frame image,
    * and fingerprint it with the shared dHash kernel — the
    * container→bytes→pixels→fingerprint chain a video dedup pipeline
    * runs, all scan-local (no shuffle; blobs never leave their
    * partitions). Sync samples whose declared range falls outside the
    * stored blob, or whose bytes don't decode, yield a NULL fingerprint
    * (and never pair downstream).
    */
  def keyframeHashes(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("sample_idx", IntegerType),
      StructField("time_ms", LongType),
      StructField("phash", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType)))
    val idIdx = media.schema.fieldIndex("media_id")
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getAs[Array[Byte]](contentIdx)
        MediaHeader.decodeMp4Samples(bytes).toSeq.flatten
          .filter(_.sync).map { s =>
            val frame =
              if (s.offset >= 0 && s.offset + s.size <= bytes.length)
                Pixels.decode(java.util.Arrays.copyOfRange(
                  bytes, s.offset.toInt, (s.offset + s.size).toInt))
              else None
            frame match {
              case Some(img) =>
                Row(id, s.sampleIdx, s.timeMs, dHash(img), img.width, img.height)
              case None => Row(id, s.sampleIdx, s.timeMs, null, null, null)
            }
          }
      }
    }(Encoders.row(outSchema))
  }

  /** Clip-level near-dup verdicts from SHARED KEYFRAMES: fingerprint every
    * stss keyframe's decoded pixels ([[keyframeHashes]]), probe frame
    * pairs within hamming `maxDist` through the shared banded probe
    * (cohort-blocked on frame dimensions, never all-pairs), then roll
    * frame pairs up to clip pairs — two clips sharing ≥ `minShared`
    * near-identical keyframes are duplicates. This is the
    * container→bytes→pixels→fingerprint→pairs→clips chain a video corpus
    * dedup actually runs (re-encoded/re-muxed copies keep their visual
    * keyframes); frame_uid packs (clip, sample) into one long — 21 bits
    * for the sample index, matching the walker's 2^20 uniform-stsz cap
    * with headroom over the synthesizer's 2^16 bound, and samples past
    * 2^21 (reachable only through a gigantic non-uniform stsz box) are
    * dropped rather than allowed to alias into the next clip id — and the
    * rollup is one aggregation on the already-tiny pair set. `n_shared`
    * counts DISTINCT shared keyframes on the smaller side (min of each
    * clip's distinct matched frames), so two static-scene frames of one
    * clip matching a single frame of the other count once, not twice.
    */
  def keyframeClipDedup(media: DataFrame, maxDist: Int = 2,
      minShared: Int = 2, maxBlock: Int = 256): DataFrame =
    keyframeClipDedupFrom(keyframeHashes(media), maxDist, minShared, maxBlock)

  /** The pair-rollup half of [[keyframeClipDedup]] over an
    * already-extracted keyframe frame (the [[keyframeHashes]] shape) — so
    * a caller that walked the containers once for another signal
    * ([[Curation.curateVideo]]'s fused decode pass, optimization r21) can
    * feed the same rows without a second blob scan.
    */
  def keyframeClipDedupFrom(keyframes: DataFrame, maxDist: Int = 2,
      minShared: Int = 2, maxBlock: Int = 256): DataFrame = {
    val kf = keyframes
      .filter(col("sample_idx") < lit(1 << 21))
      .select((col("media_id") * lit(1L << 21) + col("sample_idx"))
        .as("frame_uid"),
        col("phash"), col("width"), col("height"))
    Dedup.hammingNearDupPairs(kf, "frame_uid", "phash",
      maxDist, bits = 56, maxBlock, blockBy = Seq("width", "height"))
      .select(shiftright(col("id_a"), 21).as("clip_a"),
        shiftright(col("id_b"), 21).as("clip_b"),
        col("id_a"), col("id_b"))
      .filter(col("clip_a") =!= col("clip_b"))
      .groupBy(col("clip_a"), col("clip_b"))
      // n_shared = least(#distinct frames of a, of b). Within a group the
      // clip prefix is constant, so distinct frame_uid ≡ distinct 21-bit
      // frame-index field — counted by the exact bitmap aggregate
      // (graft.functions.BitmapDistinct) in ONE shuffle. The plain
      // count(DISTINCT a), count(DISTINCT b) form plans as Expand(×2) + a
      // second (group, id)-keyed exchange, and on a degenerate corpus
      // whose clip-pair group count approaches its pair-row count that
      // machinery measured ~4× the whole rollup's floor (6.3 s vs 1.5 s
      // on the 10× keyframe corpus; bitmap form 2.0 s).
      .agg(least(
        graft.functions.BitmapDistinct.longs(
          col("id_a").bitwiseAND(lit((1L << 21) - 1)), 1L << 21),
        graft.functions.BitmapDistinct.longs(
          col("id_b").bitwiseAND(lit((1L << 21) - 1)), 1L << 21))
        .as("n_shared"))
      .withColumn("near_dup", col("n_shared") >= minShared)
  }

  /** Clip-level video fingerprint WITHOUT a codec: one sign bit per
    * consecutive SAMPLE-SIZE delta (bit i set iff size(i+1) > size(i),
    * up to `maxBits`) over the stbl walk's sample order — the size
    * pattern of an encoded stream survives remuxing and metadata edits
    * (the [[audioFingerprint]] energy-delta idea applied to the only
    * per-frame signal a container exposes codec-free). `n_bits` rides
    * along as the probe's cohort key, exactly like the audio path: clips
    * of different lengths never cross-pair. NULL for containers without a
    * decodable sample table.
    */
  def videoFingerprint(media: DataFrame, maxBits: Int = 56): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("vfp", LongType),
      StructField("n_bits", IntegerType)))
    val idIdx = media.schema.fieldIndex("media_id")
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        MediaHeader.decodeMp4Samples(r.getAs[Array[Byte]](contentIdx)) match {
          // single-sample walkable containers fingerprint as (0, 0), not
          // NULL — see the audio path's rationale
          case Some(samples) if samples.nonEmpty =>
            val nBits = math.min(samples.length - 1, maxBits)
            var hash = 0L
            var i = 0
            while (i < nBits) {
              if (samples(i + 1).size > samples(i).size) hash |= 1L << i
              i += 1
            }
            Row(id, hash, nBits)
          case _ => Row(id, null, null)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** ONE decode pass producing BOTH per-clip video signals (optimization
    * r21): the [[videoFingerprint]] size-delta fingerprint and the
    * [[keyframeHashes]] decoded-keyframe dHash rows, as one row per clip
    * with the keyframes nested. [[Curation.curateVideo]] previously ran
    * the two operators separately — each walked every container (and
    * re-ran whatever synthesized the blobs upstream) for signals one walk
    * exposes together. Field-for-field identical to the two standalone
    * operators: same walk, same fingerprint loop, same sync-sample slice
    * + pixel decode + dHash, same NULL-on-undecodable contracts.
    */
  def videoWalk(media: DataFrame, maxBits: Int = 56): DataFrame = {
    val kfType = ArrayType(StructType(Seq(
      StructField("sample_idx", IntegerType),
      StructField("time_ms", LongType),
      StructField("phash", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType))), containsNull = false)
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("vfp", LongType),
      StructField("n_bits", IntegerType),
      StructField("kfs", kfType, nullable = false)))
    val idIdx = media.schema.fieldIndex("media_id")
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getAs[Array[Byte]](contentIdx)
        MediaHeader.decodeMp4Samples(bytes) match {
          case Some(samples) if samples.nonEmpty =>
            val nBits = math.min(samples.length - 1, maxBits)
            var hash = 0L
            var i = 0
            while (i < nBits) {
              if (samples(i + 1).size > samples(i).size) hash |= 1L << i
              i += 1
            }
            val kfs = samples.filter(_.sync).map { s =>
              val frame =
                if (s.offset >= 0 && s.offset + s.size <= bytes.length)
                  Pixels.decode(java.util.Arrays.copyOfRange(
                    bytes, s.offset.toInt, (s.offset + s.size).toInt))
                else None
              frame match {
                case Some(img) =>
                  Row(s.sampleIdx, s.timeMs, dHash(img), img.width, img.height)
                case None => Row(s.sampleIdx, s.timeMs, null, null, null)
              }
            }
            Row(id, hash, nBits, kfs)
          case _ => Row(id, null, null, Seq.empty[Row])
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Keyframe detection WITHOUT a codec: I-frames are bigger than delta
    * frames, so a sample whose size is ≥ 2× the mean of its (up to 4)
    * preceding samples is flagged as a spike — the shot-boundary primitive
    * for containers with no stss box. Integer cross-multiplied compare
    * (size·window ≥ 2·windowSum), window via a bounded frame over the
    * existing per-sample rows — one shuffle on media_id, nothing
    * quadratic. Emits the stss truth bit alongside so recall of the
    * heuristic is measurable (`agree`), and a running `shot_id` per clip
    * (cumulative spike count — the shot segmentation consumers join on).
    */
  def mp4Keyframes(media: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("media_id")).orderBy(col("sample_idx"))
    val prev = w.rowsBetween(-4, -1)
    val spike = col("sample_idx") === 1 ||
      col("size") * count(col("size")).over(prev) >=
        sum(col("size")).over(prev) * 2
    mp4Samples(media)
      .select(col("media_id"), col("sample_idx"), col("size"), col("sync"),
        spike.as("spike"))
      .withColumn("agree", col("sync") === col("spike"))
      .withColumn("shot_id",
        sum(when(col("spike"), 1L).otherwise(0L)).over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** REAL sample decode + integer audio statistics, per-partition batch
    * shape: parse each PCM WAV (RIFF chunks, interleaved LE frames — the
    * actual container layout), then fold |s| / s² sums, peak, channel-0
    * zero crossings, and an interleaved-order Horner checksum over the
    * decoded samples. The checksum pins frame AND channel order, so a
    * decoder that de-interleaved wrong or byte-swapped hash-mismatches.
    * Undecodable bytes yield null stats rather than lies.
    */
  def audioStats(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("sum_abs", LongType),
      StructField("sum_sq", LongType),
      StructField("peak", LongType),
      StructField("zero_crossings", LongType),
      StructField("pcm_checksum", LongType)))
    val idIdx = media.schema.fieldIndex("media_id")
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        Samples.decodeWavPcm(r.getAs[Array[Byte]](contentIdx)) match {
          case Some(a) =>
            val (sumAbs, sumSq, peak, zc, acc) = Samples.stats(a)
            Row(id, a.sampleRate, a.channels, a.nFrames, sumAbs, sumSq, peak,
              zc, acc)
          case None =>
            Row(id, null, null, null, null, null, null, null, null)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Frame-windowed audio energy — the primitive under voice-activity
    * detection / silence trimming (a speech-corpus pipeline trims
    * non-voiced spans before training): per window of `winFrames` frames,
    * the integer energy Σ s² over all channels, and a `voiced` verdict by
    * mean-square threshold (integer division, replayable exactly). One
    * row per (media, window); the short tail window keeps its true frame
    * count. Undecodable media emit no windows — compose with
    * [[audioStats]]'s null row to audit decode failures.
    *
    * Scale shape: per-partition batch decode, no shuffle; output rows =
    * total frames / winFrames.
    */
  def audioFrames(media: DataFrame, winFrames: Int = 16,
      voicedMeanSq: Long = 1300000L): DataFrame = {
    require(winFrames > 0, "winFrames must be positive")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("win_idx", LongType),
      StructField("win_frames", LongType),
      StructField("energy", LongType),
      StructField("voiced", BooleanType)))
    val idIdx = media.schema.fieldIndex("media_id")
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(idIdx)
        Samples.decodeWavPcm(r.getAs[Array[Byte]](contentIdx)) match {
          case Some(a) if a.channels > 0 && a.nFrames > 0 =>
            val ch = a.channels
            val nf = a.nFrames
            val nw = (nf + winFrames - 1) / winFrames
            (0 until nw).iterator.map { w =>
              val f0 = w * winFrames
              val f1 = math.min(nf, f0 + winFrames)
              var e = 0L
              var f = f0
              while (f < f1) {
                var c = 0
                while (c < ch) {
                  val s = a.pcm(f * ch + c).toLong
                  e += s * s
                  c += 1
                }
                f += 1
              }
              val frames = (f1 - f0).toLong
              Row(id, w.toLong, frames, e, e / (frames * ch) >= voicedMeanSq)
            }
          case _ => Iterator.empty
        }
      }
    }(Encoders.row(outSchema))
  }

  private val pixelStatsSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sum_r", LongType),
    StructField("sum_g", LongType),
    StructField("sum_b", LongType),
    StructField("pix_checksum", LongType)))

  /** REAL pixel decode + per-channel statistics, per-partition batch
    * shape: parse each BMP (bottom-up rows, BGR, padded — the actual
    * container layout), then fold sums and a row-major top-down Horner
    * checksum over the decoded pixels. The checksum pins pixel ORDER, so
    * a decoder that misread row order or channel order hash-mismatches.
    * Undecodable bytes yield null stats rather than lies.
    */
  def pixelStats(media: DataFrame): DataFrame = {
    val idIdx = media.schema.fieldIndex("media_id")
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        Pixels.decode(r.getAs[Array[Byte]](contentIdx)) match {
          case Some(img) =>
            val (sr, sg, sb, acc) = Pixels.stats(img)
            Row(id, img.width, img.height, sr, sg, sb, acc)
          case None => Row(id, null, null, null, null, null, null)
        }
      }
    }(Encoders.row(pixelStatsSchema))
  }

  /** REAL pixel resample: decode each BMP, nearest-neighbor it into the
    * fit-within-(maxW,maxH) box computed by the same integer arithmetic
    * as [[resizePlan]], and report the RESAMPLED image's stats — the
    * whole decode→plan→resample chain runs on actual pixels, one
    * partition-local pass, no shuffle.
    */
  def resizePixels(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("target_width", IntegerType),
      StructField("target_height", IntegerType),
      StructField("sum_r", LongType),
      StructField("sum_g", LongType),
      StructField("sum_b", LongType),
      StructField("pix_checksum", LongType)))
    val idIdx = media.schema.fieldIndex("media_id")
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        Pixels.decode(r.getAs[Array[Byte]](contentIdx)) match {
          case Some(img) =>
            val fits = img.width <= maxW && img.height <= maxH
            val widthLimited = img.width.toLong * maxH >= img.height.toLong * maxW
            // clamp to >= 1: an extreme aspect ratio (100x1 into 8x8)
            // floor-divides the passive axis to 0, and a 0-height "image"
            // is not a resample any real pipeline would emit
            val tw =
              if (fits) img.width
              else if (widthLimited) maxW
              else math.max(1, (img.width.toLong * maxH / img.height).toInt)
            val th =
              if (fits) img.height
              else if (widthLimited)
                math.max(1, (img.height.toLong * maxW / img.width).toInt)
              else maxH
            val out = Pixels.resizeNearest(img, tw, th)
            val (sr, sg, sb, acc) = Pixels.stats(out)
            Row(id, img.width, img.height, tw, th, sr, sg, sb, acc)
          case None =>
            Row(id, null, null, null, null, null, null, null, null)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Integer BT.601-style luma both engines reproduce exactly:
    * (299·r + 587·g + 114·b) / 1000, floor division.
    */
  private def luma(p: Int): Int =
    (((p >> 16) & 0xff) * 299 + ((p >> 8) & 0xff) * 587 + (p & 0xff) * 114) / 1000

  /** The 56-bit dHash kernel shared by [[imagePhash]] (whole images) and
    * [[keyframeHashes]] (frames sliced out of MP4 sample ranges). */
  private def dHash(img: Pixels.Image): Long = {
    val g = Pixels.resizeNearest(img, 8, 8)
    var hash = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 7) {
        if (luma(g.pix(y * 8 + x + 1)) > luma(g.pix(y * 8 + x)))
          hash |= 1L << (y * 7 + x)
        x += 1
      }
      y += 1
    }
    hash
  }

  /** Perceptual image fingerprint (dHash, public technique: Krawetz
    * "Kind of Like That", hackerfactor 2013): decode, nearest-neighbor
    * resample to 8×8, integer luma, then one bit per horizontally adjacent
    * pair — bit (y·7+x) set iff gray(x+1,y) > gray(x,y) — 56 bits in a
    * BIGINT (56 keeps the sign bit clear on both engines and matches the
    * hamming probe's widest block layout). Near-identical images (resize,
    * recompress, small edits) land within a few bits; pair lookup is
    * [[Dedup.hammingNearDupPairs]] — banded equality blocks, never
    * all-pairs, so image corpus dedup scales exactly like text SimHash.
    * Undecodable blobs fingerprint as NULL (and never pair).
    * Scan-shaped: per-partition decode, no shuffle.
    */
  def imagePhash(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("phash", LongType),
      // decoded container dimensions ride along as probe cohort keys: the
      // near-dup queries block on (width, height) so hot dHash values
      // (the synthetic corpus's hash is periodic in id) can't cross-pair
      // unrelated dimension cohorts — see [[Dedup.hammingNearDupPairs]]
      StructField("width", IntegerType),
      StructField("height", IntegerType)))
    val idIdx = media.schema.fieldIndex("media_id")
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        Pixels.decode(r.getAs[Array[Byte]](contentIdx)) match {
          case Some(img) =>
            Row(id, dHash(img), img.width, img.height)
          case None => Row(id, null, null, null)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Acoustic fingerprint in the Haitsma–Kalker (2002, public paper) shape
    * reduced to one band: per-frame energy (sum over channels of sample²),
    * one sign bit per consecutive-frame energy delta — bit i set iff
    * e(i+1) > e(i), i < min(nFrames−1, 56). Re-encoded/level-shifted copies
    * of a recording keep the delta signs; pair lookup is the same
    * [[Dedup.hammingNearDupPairs]] banded probe. Short clips leave high
    * bits zero — clips of very different lengths rarely collide, which is
    * the behavior a dedup pipeline wants. NULL on undecodable bytes.
    */
  def audioFingerprint(media: DataFrame, maxBits: Int = 56): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("afp", LongType),
      StructField("n_bits", IntegerType),
      // decoded stream parameters as probe cohort keys: an energy-delta
      // fingerprint is only comparable between clips of the same sample
      // rate and channel layout (frame durations and energy scales differ
      // otherwise), so the near-dup query blocks on them
      StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType)))
    val idIdx = media.schema.fieldIndex("media_id")
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        Samples.decodeWavPcm(r.getAs[Array[Byte]](contentIdx)) match {
          // a decodable clip too short for any delta (nFrames = 1)
          // fingerprints as (0, 0) — matching the closed form's empty sum
          // — NOT as NULL: NULL means undecodable, and a curation pass
          // must not call a valid short clip corrupt
          case Some(a) if a.channels > 0 && a.nFrames >= 1 =>
            val ch = a.channels
            def energy(f: Int): Long = {
              var e = 0L
              var c = 0
              while (c < ch) {
                val s = a.pcm(f * ch + c).toLong
                e += s * s
                c += 1
              }
              e
            }
            val nBits = math.min(a.nFrames - 1, maxBits)
            var hash = 0L
            var prev = energy(0)
            var i = 0
            while (i < nBits) {
              val cur = energy(i + 1)
              if (cur > prev) hash |= 1L << i
              prev = cur
              i += 1
            }
            Row(id, hash, nBits, a.sampleRate, a.channels)
          case _ => Row(id, null, null, null, null)
        }
      }
    }(Encoders.row(outSchema))
  }
}
