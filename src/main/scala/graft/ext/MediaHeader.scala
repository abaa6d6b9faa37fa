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
}
