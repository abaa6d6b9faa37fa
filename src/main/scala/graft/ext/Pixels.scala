package graft.ext

/** Real pixel-level codec for the one image family that needs no external
  * library: uncompressed 24-bit BMP (the public BITMAPFILEHEADER +
  * BITMAPINFOHEADER layout, BI_RGB). This is the pixel-depth layer under
  * [[Multimodal]]'s header-only path: BMP blobs round-trip through an
  * actual encoder and parser — bottom-up row order, BGR channel order,
  * 4-byte row padding and all — so pixel statistics and resampling run on
  * REAL decoded bytes. Compressed formats (PNG/JPEG/GIF) still stop at
  * header metadata: their codecs need libraries this environment doesn't
  * ship, and they'd slot into the same per-partition batch signature.
  */
object Pixels {

  /** Decoded image: packed 0xRRGGBB ints, row-major, TOP-DOWN (row 0 is
    * the visual top — i.e. the LAST stored BMP row).
    */
  final case class Image(width: Int, height: Int, pix: Array[Int])

  /** Deterministic test-pattern channel values at (x, y) for a seed —
    * the generative formula the DuckDB oracle replays independently of
    * the container bytes. Integer arithmetic only.
    */
  def genR(x: Int, y: Int, seed: Long): Int = ((x * 3 + y * 13 + seed) % 256).toInt
  def genG(x: Int, y: Int, seed: Long): Int = ((x * 5 + y * 3 + seed * 7) % 256).toInt
  def genB(x: Int, y: Int, seed: Long): Int = ((x * 7 + y * 11 + seed * 3) % 256).toInt

  private def putU16(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = (v & 0xff).toByte; b(i + 1) = ((v >> 8) & 0xff).toByte
  }
  private def putU32(b: Array[Byte], i: Int, v: Long): Unit = {
    b(i) = (v & 0xff).toByte
    b(i + 1) = ((v >> 8) & 0xff).toByte
    b(i + 2) = ((v >> 16) & 0xff).toByte
    b(i + 3) = ((v >> 24) & 0xff).toByte
  }
  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  /** A REAL uncompressed 24-bit BMP of the generative test pattern:
    * 14-byte file header, 40-byte info header, bottom-up BGR rows padded
    * to 4-byte boundaries.
    */
  def bmpBytes(w: Int, h: Int, seed: Long): Array[Byte] = {
    val rowBytes = (w * 3 + 3) / 4 * 4
    val dataSize = rowBytes * h
    val out = new Array[Byte](54 + dataSize)
    out(0) = 'B'; out(1) = 'M'
    putU32(out, 2, 54L + dataSize)
    putU32(out, 10, 54L)        // pixel data offset
    putU32(out, 14, 40L)        // info header size
    putU32(out, 18, w.toLong)
    putU32(out, 22, h.toLong)   // positive height = bottom-up rows
    putU16(out, 26, 1)          // planes
    putU16(out, 28, 24)         // bits per pixel
    putU32(out, 30, 0L)         // BI_RGB
    putU32(out, 34, dataSize.toLong)
    putU32(out, 38, 2835L); putU32(out, 42, 2835L) // 72 dpi
    var stored = 0
    while (stored < h) {
      val y = h - 1 - stored    // visual row for this stored row
      val base = 54 + stored * rowBytes
      var x = 0
      while (x < w) {
        out(base + x * 3) = genB(x, y, seed).toByte
        out(base + x * 3 + 1) = genG(x, y, seed).toByte
        out(base + x * 3 + 2) = genR(x, y, seed).toByte
        x += 1
      }
      stored += 1
    }
    out
  }

  /** Parse an uncompressed 24-bit BI_RGB BMP into top-down packed pixels.
    * Rejects (None) anything else — compressed BMPs, other depths,
    * truncated buffers — instead of guessing.
    */
  def decodeBmp(bytes: Array[Byte]): Option[Image] = {
    if (bytes == null || bytes.length < 54) return None
    if (bytes(0) != 'B' || bytes(1) != 'M') return None
    // header ints are UNTRUSTED — all arithmetic in Long, all fields
    // bounded, or a crafted offset/width defeats the bounds check via Int
    // overflow and turns "return None" into an executor-killing
    // ArrayIndexOutOfBounds / giant allocation
    val offset = u32(bytes, 10)
    val wL = u32(bytes, 18)
    val hL = u32(bytes, 22)
    val bpp = u16(bytes, 28)
    val compression = u32(bytes, 30)
    val maxDim = 1 << 14
    if (wL <= 0 || hL <= 0 || wL > maxDim || hL > maxDim ||
      wL * hL > (1L << 26) || bpp != 24 || compression != 0L) return None
    if (offset < 54 || offset > bytes.length) return None
    val w = wL.toInt
    val h = hL.toInt
    val rowBytes = ((wL * 3 + 3) / 4 * 4).toInt
    if (offset + rowBytes.toLong * h > bytes.length) return None
    val pix = new Array[Int](w * h)
    val off = offset.toInt
    var stored = 0
    while (stored < h) {
      val y = h - 1 - stored
      val base = off + stored * rowBytes
      var x = 0
      while (x < w) {
        val b = bytes(base + x * 3) & 0xff
        val g = bytes(base + x * 3 + 1) & 0xff
        val r = bytes(base + x * 3 + 2) & 0xff
        pix(y * w + x) = (r << 16) | (g << 8) | b
        x += 1
      }
      stored += 1
    }
    Some(Image(w, h, pix))
  }

  /** Nearest-neighbor resample: target (x, y) reads source
    * (x·W / TW, y·H / TH) — integer floor division, so both engines map
    * identically.
    */
  def resizeNearest(img: Image, tw: Int, th: Int): Image = {
    val out = new Array[Int](tw * th)
    var y = 0
    while (y < th) {
      val sy = y * img.height / th
      var x = 0
      while (x < tw) {
        val sx = x * img.width / tw
        out(y * tw + x) = img.pix(sy * img.width + sx)
        x += 1
      }
      y += 1
    }
    Image(tw, th, out)
  }

  val ChecksumMod = 1000000007L

  /** Per-channel sums and a row-major top-down Horner checksum over the
    * packed pixels — the checksum pins ORDER (a decoder that forgot the
    * BMP bottom-up flip produces the same sums but a different fold).
    */
  def stats(img: Image): (Long, Long, Long, Long) = {
    var sr = 0L; var sg = 0L; var sb = 0L; var acc = 0L
    var i = 0
    while (i < img.pix.length) {
      val p = img.pix(i)
      sr += (p >> 16) & 0xff
      sg += (p >> 8) & 0xff
      sb += p & 0xff
      acc = (acc * 31 + p) % ChecksumMod
      i += 1
    }
    (sr, sg, sb, acc)
  }
}
