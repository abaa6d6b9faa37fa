package graft.ext

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Zero-dependency audio/video container header parsing, following the
  * [[ImageHeader]] pattern: WAV (RIFF `fmt ` chunk → sample rate, channels)
  * and MP4 (`moov`→`trak`→`tkhd` → width, height) straight from the stored
  * bytes. Header parsing is the scan-speed metadata path — tens of bytes
  * per blob, no codec; a full decode pipeline would swap an actual codec in
  * behind the same per-batch signature.
  */
object MediaHeader {

  final case class AudioInfo(sampleRate: Int, channels: Int, format: String,
      durationMs: Long)
  final case class VideoInfo(width: Int, height: Int, format: String,
      durationMs: Long)

  /** One media sample resolved from the stbl tables: its 1-based index,
    * owning chunk, REAL byte range in the file, decode time/duration in
    * media-timescale ms, and whether stss marks it a sync (key) frame
    * (no stss box ⇒ every sample is sync, per spec).
    */
  final case class Mp4Sample(sampleIdx: Int, chunkIdx: Int, offset: Long,
      size: Long, timeMs: Long, durMs: Long, sync: Boolean)

  private def ascii(b: Array[Byte], i: Int, n: Int): String =
    if (i + n <= b.length) new String(b, i, n, StandardCharsets.US_ASCII) else ""

  private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private def u32le(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private def u32be(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  /** WAV: "RIFF"+size+"WAVE", then chunks of [id(4) size(4 LE) data]; the
    * `fmt ` chunk's payload starts (format u16, channels u16, sampleRate
    * u32, byteRate u32), all little-endian. Duration = data chunk size /
    * byte rate — read from the size fields, so a header-only blob (payload
    * truncated by the store) still reports its full clip length.
    */
  def decodeWav(b: Array[Byte]): Option[AudioInfo] = {
    if (b == null || b.length < 20 || ascii(b, 0, 4) != "RIFF" || ascii(b, 8, 4) != "WAVE")
      return None
    var fmt: Option[(Int, Int, Long)] = None // (sampleRate, channels, byteRate)
    var dataSize = 0L
    var i = 12
    while (i + 8 <= b.length) {
      val id = ascii(b, i, 4)
      val size = u32le(b, i + 4)
      if (id == "fmt ") {
        if (i + 20 > b.length || size < 12) return None
        fmt = Some((u32le(b, i + 12).toInt, u16le(b, i + 10), u32le(b, i + 16)))
      } else if (id == "data") dataSize = size
      // advance in LONG space: a crafted 4 GiB size field must not wrap
      // the cursor negative (a header-only blob whose declared data size
      // exceeds the buffer legitimately ends the walk here instead)
      val next = i.toLong + 8L + size + (size & 1L)
      i = if (next > b.length.toLong) b.length else next.toInt
    }
    fmt.map { case (rate, ch, byteRate) =>
      val durMs = if (byteRate > 0) dataSize * 1000L / byteRate else 0L
      AudioInfo(rate, ch, "wav", durMs)
    }
  }

  /** MP4/ISO-BMFF: big-endian [size(4) type(4)] boxes; walk top-level to
    * `moov`, inside it to `trak`, inside that to `tkhd`, whose final 8
    * bytes are width/height as 16.16 fixed point.
    */
  def decodeMp4(b: Array[Byte]): Option[VideoInfo] = {
    if (b == null || b.length < 16) return None

    def findBox(lo: Int, hi: Int, boxType: String): Option[(Int, Int)] = {
      var i = lo
      while (i >= 0 && i + 8 <= hi) {
        // size in LONG space: a crafted ~2^31 box size must not wrap the
        // bounds check or the cursor negative
        val size = u32be(b, i)
        if (size < 8 || i.toLong + size > hi) return None
        if (ascii(b, i + 4, 4) == boxType) return Some((i, size.toInt))
        i += size.toInt
      }
      None
    }

    if (ascii(b, 4, 4) != "ftyp") return None
    for {
      (moov, moovSize) <- findBox(0, b.length, "moov")
      (trak, trakSize) <- findBox(moov + 8, moov + moovSize, "trak")
      (tkhd, tkhdSize) <- findBox(trak + 8, trak + trakSize, "tkhd")
      if tkhdSize >= 92
    } yield {
      // movie duration from mvhd (v0 payload: ver/flags, ctime, mtime,
      // timescale@12, duration@16); absent/zero timescale → 0 ms
      val durMs = findBox(moov + 8, moov + moovSize, "mvhd") match {
        case Some((mvhd, mvhdSize)) if mvhdSize >= 28 =>
          val timescale = u32be(b, mvhd + 8 + 12)
          val dur = u32be(b, mvhd + 8 + 16)
          if (timescale > 0) dur * 1000L / timescale else 0L
        case _ => 0L
      }
      VideoInfo(
        (u32be(b, tkhd + tkhdSize - 8) >> 16).toInt,
        (u32be(b, tkhd + tkhdSize - 4) >> 16).toInt, "mp4", durMs)
    }
  }

  /** Walk the sample tables (ISO/IEC 14496-12 `stbl`): stts (decode
    * deltas), stsc (sample→chunk runs), stsz (sizes), stco/co64 (chunk
    * file offsets), stss (sync samples) → one [[Mp4Sample]] per sample
    * with its REAL byte range. This is the zero-codec map from container
    * metadata to addressable frame bytes — the piece frame sampling needs
    * to read actual ranges instead of guessing timestamps.
    *
    * Bounded-walker discipline (the [[decodeMp4]]/RIFF style): every
    * declared count is validated against its own box's size BEFORE any
    * allocation, so a crafted 2^32 sample_count costs a comparison, not an
    * OOM; offsets accumulate in Long; malformed tables (zero/decreasing
    * stsc first_chunk, short boxes, missing tables) → None, never a throw.
    * Sample byte ranges are emitted as declared — a header-only blob whose
    * mdat was truncated by the store still reports where its samples LIVE
    * (the object-store read path); consumers slicing the blob itself must
    * check `offset + size <= blob length`.
    */
  def decodeMp4Samples(b: Array[Byte]): Option[Seq[Mp4Sample]] = {
    if (b == null || b.length < 16 || ascii(b, 4, 4) != "ftyp") return None

    def findBox(lo: Int, hi: Int, boxType: String): Option[(Int, Int)] = {
      var i = lo
      while (i >= 0 && i + 8 <= hi) {
        val size = u32be(b, i)
        if (size < 8 || i.toLong + size > hi) return None
        if (ascii(b, i + 4, 4) == boxType) return Some((i, size.toInt))
        i += size.toInt
      }
      None
    }
    // full-box payload starts after size(4)+type(4)+version/flags(4)
    def entryCount(box: Int, boxSize: Int, entryBytes: Int,
        headerBytes: Int): Option[Int] = {
      if (boxSize < headerBytes + 4) return None
      val n = u32be(b, box + headerBytes)
      // the count must fit the box's own declared size — the bound that
      // turns a hostile 0xFFFFFFFF into a rejection instead of an alloc
      if (n < 0 || n > (boxSize - headerBytes - 4L) / entryBytes) None
      else Some(n.toInt)
    }

    for {
      (moov, moovSize) <- findBox(0, b.length, "moov")
      (trak, trakSize) <- findBox(moov + 8, moov + moovSize, "trak")
      (mdia, mdiaSize) <- findBox(trak + 8, trak + trakSize, "mdia")
      (mdhd, mdhdSize) <- findBox(mdia + 8, mdia + mdiaSize, "mdhd")
      if mdhdSize >= 24
      timescale = u32be(b, mdhd + 8 + 12) if timescale > 0
      (minf, minfSize) <- findBox(mdia + 8, mdia + mdiaSize, "minf")
      (stbl, stblSize) <- findBox(minf + 8, minf + minfSize, "stbl")
      stblHi = stbl + stblSize
      (stsz, stszSize) <- findBox(stbl + 8, stblHi, "stsz")
      if stszSize >= 20
      uniformSize = u32be(b, stsz + 12)
      // uniform-size stsz carries no per-sample entries for entryCount to
      // bound the declared count against, so a crafted sub-200-byte blob
      // could declare 2^32 samples and cost gigabytes of output Vector.
      // Cap at 2^20: bounds the materialized output (~60 MB worst case,
      // the actual resource at risk) while far above any frame count a
      // sampled-clip pipeline stores per blob. A count can't be inferred
      // from the blob size — legitimate uniform files (PCM-in-MP4) pack
      // millions of samples into compact tables.
      nSamples <- if (uniformSize > 0) {
        val n = u32be(b, stsz + 16)
        if (n >= 0 && n <= (1L << 20)) Some(n.toInt) else None
      } else entryCount(stsz, stszSize, 4, 16)
      (stsc, stscSize) <- findBox(stbl + 8, stblHi, "stsc")
      nStsc <- entryCount(stsc, stscSize, 12, 12)
      if nStsc > 0
      co <- findBox(stbl + 8, stblHi, "stco").map((_, false))
        .orElse(findBox(stbl + 8, stblHi, "co64").map((_, true)))
      ((stco, stcoSize), wide) = co
      nChunks <- entryCount(stco, stcoSize, if (wide) 8 else 4, 12)
      (stts, sttsSize) <- findBox(stbl + 8, stblHi, "stts")
      nStts <- entryCount(stts, sttsSize, 8, 12)
      samples <- {
        // stsc runs: (firstChunk, samplesPerChunk); firstChunk must be
        // 1-based and strictly increasing
        val runs = (0 until nStsc).map { e =>
          (u32be(b, stsc + 16 + e * 12), u32be(b, stsc + 16 + e * 12 + 4))
        }
        val runsOk = runs.headOption.exists(_._1 == 1L) &&
          runs.forall(_._2 >= 0) &&
          runs.sliding(2).forall(w => w.length < 2 || w(0)._1 < w(1)._1)
        // sync table: absent ⇒ all sync (spec); present ⇒ membership
        val sync: Int => Boolean =
          findBox(stbl + 8, stblHi, "stss") match {
            case Some((stss, stssSize)) =>
              entryCount(stss, stssSize, 4, 12) match {
                case Some(nSync) =>
                  val set = (0 until nSync)
                    .map(e => u32be(b, stss + 16 + e * 4)).toSet
                  idx => set.contains(idx.toLong)
                case None => _ => true
              }
            case None => _ => true
          }
        if (!runsOk || nSamples == 0) None
        else {
          val out = Vector.newBuilder[Mp4Sample]
          out.sizeHint(nSamples)
          // stts cursor: decode time accumulates entry by entry
          var sttsEntry = 0
          var sttsLeft =
            if (nStts > 0) u32be(b, stts + 16) else 0L
          var delta = if (nStts > 0) u32be(b, stts + 16 + 4) else 0L
          var time = 0L
          var sampleIdx = 1
          var run = 0
          var chunk = 1
          var ok = true
          while (sampleIdx <= nSamples && chunk <= nChunks && ok) {
            // advance to the stsc run owning this chunk
            while (run + 1 < nStsc && runs(run + 1)._1 <= chunk) run += 1
            val perChunk = runs(run)._2.toInt
            val chunkOff =
              if (wide) {
                val hi = u32be(b, stco + 16 + chunk * 8 - 8)
                val lo = u32be(b, stco + 16 + chunk * 8 - 4)
                (hi << 32) | lo
              } else u32be(b, stco + 16 + (chunk - 1) * 4)
            var within = 0
            var off = chunkOff
            while (within < perChunk && sampleIdx <= nSamples && ok) {
              val size =
                if (uniformSize > 0) uniformSize
                else u32be(b, stsz + 20 + (sampleIdx - 1) * 4)
              if (size < 0) ok = false
              else {
                out += Mp4Sample(sampleIdx, chunk, off, size,
                  time * 1000L / timescale, delta * 1000L / timescale,
                  sync(sampleIdx))
                off += size
                time += delta
                sttsLeft -= 1
                if (sttsLeft <= 0 && sttsEntry + 1 < nStts) {
                  sttsEntry += 1
                  sttsLeft = u32be(b, stts + 16 + sttsEntry * 8)
                  delta = u32be(b, stts + 16 + sttsEntry * 8 + 4)
                }
                sampleIdx += 1
                within += 1
              }
            }
            chunk += 1
          }
          val v = out.result()
          if (ok && v.length == nSamples) Some(v) else None
        }
      }
    } yield samples
  }

  // --- format-conformant synthesizers (used by tests and the synthetic
  // media table; a real pipeline reads stored blobs instead) ---

  /** Canonical 44-byte WAV header (complete fmt chunk + data chunk whose
    * size declares `dataSeconds` of PCM without carrying the payload — the
    * header-only blob-store stand-in; duration still decodes from the size
    * fields exactly as it would from a full file).
    */
  def wavBytes(sampleRate: Int, channels: Int, dataSeconds: Int = 0): Array[Byte] = {
    val buf = ByteBuffer.allocate(44).order(ByteOrder.LITTLE_ENDIAN)
    val blockAlign = channels * 2
    val byteRate = sampleRate * blockAlign
    val dataSize = byteRate * dataSeconds
    buf.put("RIFF".getBytes(StandardCharsets.US_ASCII)).putInt(36 + dataSize)
    buf.put("WAVE".getBytes(StandardCharsets.US_ASCII))
    buf.put("fmt ".getBytes(StandardCharsets.US_ASCII)).putInt(16)
    buf.putShort(1).putShort(channels.toShort).putInt(sampleRate)
    buf.putInt(byteRate).putShort(blockAlign.toShort).putShort(16)
    buf.put("data".getBytes(StandardCharsets.US_ASCII)).putInt(dataSize)
    buf.array()
  }

  /** Minimal ISO-BMFF: ftyp(16) + moov(mvhd v0 (108 B) + trak(tkhd v0,
    * 92 B)). 232 bytes; movie timescale 1000 so mvhd duration is in ms.
    */
  def mp4Bytes(w: Int, h: Int, durationMs: Int = 0): Array[Byte] = {
    val buf = ByteBuffer.allocate(232) // big-endian by default
    buf.putInt(16).put("ftyp".getBytes(StandardCharsets.US_ASCII))
    buf.put("isom".getBytes(StandardCharsets.US_ASCII)).putInt(0)
    buf.putInt(216).put("moov".getBytes(StandardCharsets.US_ASCII))
    buf.putInt(108).put("mvhd".getBytes(StandardCharsets.US_ASCII))
    buf.putInt(0) // version/flags
    buf.putInt(0).putInt(0) // ctime, mtime
    buf.putInt(1000).putInt(durationMs) // timescale (ms), duration
    buf.putInt(0x00010000).putShort(0x0100.toShort).putShort(0) // rate, volume, rsvd
    buf.putLong(0L) // reserved
    // identity transform matrix
    buf.putInt(0x00010000).putInt(0).putInt(0)
    buf.putInt(0).putInt(0x00010000).putInt(0)
    buf.putInt(0).putInt(0).putInt(0x40000000)
    (0 until 6).foreach(_ => buf.putInt(0)) // pre_defined
    buf.putInt(2) // next_track_id
    buf.putInt(100).put("trak".getBytes(StandardCharsets.US_ASCII))
    buf.putInt(92).put("tkhd".getBytes(StandardCharsets.US_ASCII))
    buf.putInt(0) // version/flags
    buf.putInt(0).putInt(0) // ctime, mtime
    buf.putInt(1).putInt(0) // track id, reserved
    buf.putInt(0) // duration
    buf.putLong(0L) // reserved
    buf.putShort(0).putShort(0).putShort(0).putShort(0) // layer/alt/vol/rsvd
    // identity transform matrix
    buf.putInt(0x00010000).putInt(0).putInt(0)
    buf.putInt(0).putInt(0x00010000).putInt(0)
    buf.putInt(0).putInt(0).putInt(0x40000000)
    buf.putInt(w << 16).putInt(h << 16)
    buf.array()
  }

  /** Deterministic sample-size formula shared by [[mp4BytesWithSamples]]
    * and the DuckDB oracle: base 200 + a seed/index hash in [0, 120), plus
    * a 600-byte spike on every 8th sample (the sync frames — I-frames are
    * bigger than deltas, which is what the keyframe spike heuristic keys
    * on). `i` is 0-based.
    */
  def sampleSize(seed: Long, i: Int): Int =
    (200 + java.lang.Math.floorMod(seed * 31 + i.toLong * 17, 120L).toInt
      + (if (i % 8 == 0) 600 else 0))

  /** Samples per chunk: chunks 1-2 carry 6 samples, chunks 3+ carry 4
    * (two stsc runs; the last chunk is ragged — ends when stsz runs out,
    * per spec). */
  private def chunkCount(n: Int): Int =
    if (n <= 12) (n + 5) / 6 else 2 + (n - 12 + 3) / 4

  /** ISO-BMFF with a REAL sample table: ftyp + moov(mvhd + trak(tkhd +
    * mdia(mdhd timescale 1000 + minf(stbl(stts uniform delta 40 ms, stsc
    * two runs, stsz per-sample sizes from [[sampleSize]], stco computed
    * chunk offsets, stss every 8th sample))))) + mdat whose payload bytes
    * actually occupy the declared ranges (byte at absolute position p is
    * (p·7 + seed) mod 256 — so a consumer slicing a declared range reads
    * reproducible content). Every table value is a closed-form function of
    * (seed, nSamples), which is what lets the oracle replay offsets and
    * checksums without touching the container.
    */
  def mp4BytesWithSamples(w: Int, h: Int, seed: Long, nSamples: Int): Array[Byte] = {
    val sizes = Array.tabulate(nSamples)(sampleSize(seed, _))
    buildMp4(w, h, sizes, syncEvery = 8, (buf, headerSz) => {
      var p = headerSz
      val end = headerSz + sizes.map(_.toLong).sum
      while (p < end) {
        buf.put((java.lang.Math.floorMod(p * 7 + seed, 256L)).toByte)
        p += 1
      }
    })
  }

  /** Same container tree with CALLER-SUPPLIED sample payloads — e.g. one
    * real encoded frame per sample ([[graft.ext.Multimodal]] stores BMP
    * frames), so a consumer slicing a sample's byte range gets a
    * decodable image. `syncEvery` spaces the stss entries (1-based
    * samples 1, 1+syncEvery, ...).
    */
  def mp4BytesWithPayloads(w: Int, h: Int, payloads: Array[Array[Byte]],
      syncEvery: Int): Array[Byte] =
    buildMp4(w, h, payloads.map(_.length), syncEvery, (buf, _) =>
      payloads.foreach(buf.put))

  private def buildMp4(w: Int, h: Int, sizes: Array[Int], syncEvery: Int,
      fillPayload: (ByteBuffer, Long) => Unit): Array[Byte] = {
    val n = sizes.length
    // the builder's own synthesis bound: tests and the synthetic corpus
    // never need more than 2^16−1 samples, and a strict bound keeps the
    // builder comfortably inside the 21-bit sample_idx packing the
    // keyframe consumers use (Multimodal.keyframeClipDedup, which drops
    // sample_idx ≥ 2^21 rather than alias)
    require(n > 0 && n < (1 << 16) && syncEvery > 0)
    val c = chunkCount(n)
    val k = (n + syncEvery - 1) / syncEvery // sync: 1-based 1, 1+syncEvery, ...
    val payload = sizes.map(_.toLong).sum
    val sttsSz = 24; val stszSz = 20 + 4 * n; val stscSz = 40
    val stcoSz = 16 + 4 * c; val stssSz = 16 + 4 * k
    val stblSz = 8 + sttsSz + stszSz + stscSz + stcoSz + stssSz
    val minfSz = 8 + stblSz
    val mdiaSz = 8 + 32 + minfSz
    val trakSz = 8 + 92 + mdiaSz
    val moovSz = 8 + 108 + trakSz
    val headerSz = 16 + moovSz + 8
    val buf = ByteBuffer.allocate(headerSz + payload.toInt)
    def tag(s: String): Unit = buf.put(s.getBytes(StandardCharsets.US_ASCII))
    buf.putInt(16); tag("ftyp"); tag("isom"); buf.putInt(0)
    buf.putInt(moovSz); tag("moov")
    buf.putInt(108); tag("mvhd")
    buf.putInt(0); buf.putInt(0).putInt(0)
    buf.putInt(1000).putInt(n * 40) // timescale 1000, duration ms
    buf.putInt(0x00010000).putShort(0x0100.toShort).putShort(0)
    buf.putLong(0L)
    buf.putInt(0x00010000).putInt(0).putInt(0)
    buf.putInt(0).putInt(0x00010000).putInt(0)
    buf.putInt(0).putInt(0).putInt(0x40000000)
    (0 until 6).foreach(_ => buf.putInt(0))
    buf.putInt(2)
    buf.putInt(trakSz); tag("trak")
    buf.putInt(92); tag("tkhd")
    buf.putInt(0); buf.putInt(0).putInt(0)
    buf.putInt(1).putInt(0); buf.putInt(0); buf.putLong(0L)
    buf.putShort(0).putShort(0).putShort(0).putShort(0)
    buf.putInt(0x00010000).putInt(0).putInt(0)
    buf.putInt(0).putInt(0x00010000).putInt(0)
    buf.putInt(0).putInt(0).putInt(0x40000000)
    buf.putInt(w << 16).putInt(h << 16)
    buf.putInt(mdiaSz); tag("mdia")
    buf.putInt(32); tag("mdhd")
    buf.putInt(0); buf.putInt(0).putInt(0)
    buf.putInt(1000).putInt(n * 40) // media timescale 1000
    buf.putShort(0x55c4.toShort).putShort(0) // language "und", pre_defined
    buf.putInt(minfSz); tag("minf")
    buf.putInt(stblSz); tag("stbl")
    buf.putInt(sttsSz); tag("stts")
    buf.putInt(0); buf.putInt(1); buf.putInt(n).putInt(40)
    buf.putInt(stszSz); tag("stsz")
    buf.putInt(0); buf.putInt(0); buf.putInt(n) // non-uniform, count
    sizes.foreach(buf.putInt)
    buf.putInt(stscSz); tag("stsc")
    buf.putInt(0); buf.putInt(2)
    buf.putInt(1).putInt(6).putInt(1) // chunks 1-2: 6 samples each
    buf.putInt(3).putInt(4).putInt(1) // chunks 3+: 4 samples each
    buf.putInt(stcoSz); tag("stco")
    buf.putInt(0); buf.putInt(c)
    var off = headerSz.toLong
    var s = 0
    (1 to c).foreach { ch =>
      buf.putInt(off.toInt)
      val per = if (ch <= 2) 6 else 4
      var j = 0
      while (j < per && s < n) { off += sizes(s); s += 1; j += 1 }
    }
    buf.putInt(stssSz); tag("stss")
    buf.putInt(0); buf.putInt(k)
    (0 until k).foreach(e => buf.putInt(e * syncEvery + 1))
    buf.putInt(8 + payload.toInt); tag("mdat")
    fillPayload(buf, headerSz.toLong)
    buf.array()
  }
}
