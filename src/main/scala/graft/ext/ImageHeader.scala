package graft.ext

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

/** Zero-dependency image header parsing: width/height/format straight from
  * the container bytes (PNG IHDR, JPEG SOFn, GIF logical screen
  * descriptor). This is the real decode step behind the multimodal metadata
  * column — header parsing is the scan-speed path (no pixel decode, reads
  * tens of bytes per blob); a full-pixel pipeline would swap in an actual
  * codec with the same signature.
  */
object ImageHeader {

  final case class Info(width: Int, height: Int, format: String)

  private val PngSig = Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')

  private def u16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private def u32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  /** PNG: 8-byte signature, then the IHDR chunk (len + "IHDR" + 13-byte
    * payload starting with width/height as big-endian u32).
    */
  private def png(b: Array[Byte]): Option[Info] =
    if (b.length >= 24 && b.take(8).sameElements(PngSig) &&
      new String(b, 12, 4, StandardCharsets.US_ASCII) == "IHDR")
      Some(Info(u32(b, 16).toInt, u32(b, 20).toInt, "png"))
    else None

  /** JPEG: walk marker segments from SOI to the first SOFn
    * (0xC0-0xCF except DHT/JPG/DAC); its payload is precision(1),
    * height(2), width(2).
    */
  private def jpeg(b: Array[Byte]): Option[Info] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None
      val marker = b(i + 1) & 0xff
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) {
        i += 2 // standalone markers have no length field
      } else {
        val len = u16(b, i + 2)
        if (len < 2) return None
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          if (i + 9 >= b.length) return None
          return Some(Info(u16(b, i + 7), u16(b, i + 5), "jpeg"))
        }
        i += 2 + len
      }
    }
    None
  }

  /** GIF87a/89a: 6-byte signature then width/height as little-endian u16. */
  private def gif(b: Array[Byte]): Option[Info] =
    if (b.length >= 10 && (new String(b, 0, 6, StandardCharsets.US_ASCII) == "GIF87a" ||
      new String(b, 0, 6, StandardCharsets.US_ASCII) == "GIF89a"))
      Some(Info((b(6) & 0xff) | ((b(7) & 0xff) << 8), (b(8) & 0xff) | ((b(9) & 0xff) << 8), "gif"))
    else None

  def decode(bytes: Array[Byte]): Option[Info] =
    if (bytes == null) None
    else png(bytes).orElse(jpeg(bytes)).orElse(gif(bytes))

  // --- format-conformant synthesizers (used by tests and the synthetic
  // media table; a real pipeline reads stored blobs instead) ---

  /** Minimal spec-conformant PNG prefix: signature + complete IHDR chunk
    * (CRC zeroed — header parsers don't check it). Fixed 33 bytes.
    */
  def pngBytes(w: Int, h: Int): Array[Byte] = {
    val buf = ByteBuffer.allocate(33)
    buf.put(PngSig)
    buf.putInt(13).put("IHDR".getBytes(StandardCharsets.US_ASCII))
    buf.putInt(w).putInt(h)
    buf.put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    buf.putInt(0) // CRC placeholder
    buf.array()
  }

  /** Minimal JPEG: SOI + SOF0 (3 components) + EOI. Fixed 23 bytes. */
  def jpegBytes(w: Int, h: Int): Array[Byte] = {
    val buf = ByteBuffer.allocate(23)
    buf.put(0xff.toByte).put(0xd8.toByte) // SOI
    buf.put(0xff.toByte).put(0xc0.toByte).putShort(17) // SOF0, len
    buf.put(8.toByte).putShort(h.toShort).putShort(w.toShort).put(3.toByte)
    (1 to 3).foreach { c => buf.put(c.toByte).put(0x11.toByte).put(0.toByte) }
    buf.put(0xff.toByte).put(0xd9.toByte) // EOI
    buf.array()
  }
}
