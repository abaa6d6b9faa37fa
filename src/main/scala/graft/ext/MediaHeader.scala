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

  final case class AudioInfo(sampleRate: Int, channels: Int, format: String)
  final case class VideoInfo(width: Int, height: Int, format: String)

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
    * u32), all little-endian.
    */
  def decodeWav(b: Array[Byte]): Option[AudioInfo] = {
    if (b == null || b.length < 20 || ascii(b, 0, 4) != "RIFF" || ascii(b, 8, 4) != "WAVE")
      return None
    var i = 12
    while (i + 8 <= b.length) {
      val id = ascii(b, i, 4)
      val size = u32le(b, i + 4)
      if (id == "fmt ") {
        if (i + 16 > b.length || size < 8) return None
        return Some(AudioInfo(u32le(b, i + 12).toInt, u16le(b, i + 10), "wav"))
      }
      i += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    None
  }

  /** MP4/ISO-BMFF: big-endian [size(4) type(4)] boxes; walk top-level to
    * `moov`, inside it to `trak`, inside that to `tkhd`, whose final 8
    * bytes are width/height as 16.16 fixed point.
    */
  def decodeMp4(b: Array[Byte]): Option[VideoInfo] = {
    if (b == null || b.length < 16) return None

    def findBox(lo: Int, hi: Int, boxType: String): Option[(Int, Int)] = {
      var i = lo
      while (i + 8 <= hi) {
        val size = u32be(b, i).toInt
        if (size < 8 || i + size > hi) return None
        if (ascii(b, i + 4, 4) == boxType) return Some((i, size))
        i += size
      }
      None
    }

    if (ascii(b, 4, 4) != "ftyp") return None
    for {
      (moov, moovSize) <- findBox(0, b.length, "moov")
      (trak, trakSize) <- findBox(moov + 8, moov + moovSize, "trak")
      (tkhd, tkhdSize) <- findBox(trak + 8, trak + trakSize, "tkhd")
      if tkhdSize >= 92
    } yield VideoInfo(
      (u32be(b, tkhd + tkhdSize - 8) >> 16).toInt,
      (u32be(b, tkhd + tkhdSize - 4) >> 16).toInt, "mp4")
  }

  // --- format-conformant synthesizers (used by tests and the synthetic
  // media table; a real pipeline reads stored blobs instead) ---

  /** Canonical 44-byte WAV header (complete fmt chunk + empty data chunk). */
  def wavBytes(sampleRate: Int, channels: Int): Array[Byte] = {
    val buf = ByteBuffer.allocate(44).order(ByteOrder.LITTLE_ENDIAN)
    val blockAlign = channels * 2
    buf.put("RIFF".getBytes(StandardCharsets.US_ASCII)).putInt(36)
    buf.put("WAVE".getBytes(StandardCharsets.US_ASCII))
    buf.put("fmt ".getBytes(StandardCharsets.US_ASCII)).putInt(16)
    buf.putShort(1).putShort(channels.toShort).putInt(sampleRate)
    buf.putInt(sampleRate * blockAlign).putShort(blockAlign.toShort).putShort(16)
    buf.put("data".getBytes(StandardCharsets.US_ASCII)).putInt(0)
    buf.array()
  }

  /** Minimal ISO-BMFF: ftyp(16) + moov(trak(tkhd v0, 92 B)). 124 bytes. */
  def mp4Bytes(w: Int, h: Int): Array[Byte] = {
    val buf = ByteBuffer.allocate(124) // big-endian by default
    buf.putInt(16).put("ftyp".getBytes(StandardCharsets.US_ASCII))
    buf.put("isom".getBytes(StandardCharsets.US_ASCII)).putInt(0)
    buf.putInt(108).put("moov".getBytes(StandardCharsets.US_ASCII))
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
