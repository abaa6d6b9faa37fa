package graft.ext

/** Real pixel-level codecs for the image families that need no external
  * library:
  *
  *  - uncompressed 24-bit BMP (the public BITMAPFILEHEADER +
  *    BITMAPINFOHEADER layout, BI_RGB): bottom-up row order, BGR channel
  *    order, 4-byte row padding;
  *  - PNG 8-bit truecolor (color types 2 RGB / 6 RGBA, RFC 2083): real
  *    zlib DEFLATE via `java.util.zip.Inflater`/`Deflater` (in the JDK,
  *    zero-dep) and the five public scanline filter types
  *    (None/Sub/Up/Average/Paeth) applied and reversed byte-for-byte;
  *  - GIF 87a/89a: a real dictionary LZW codec (variable 9..12-bit codes,
  *    LSB-first packing, clear/EOI, KwKwK case, 4096 reset), 256-entry
  *    color tables, and 4-pass interlacing.
  *
  * This is the pixel-depth layer under [[Multimodal]]'s header-only path:
  * blobs round-trip through actual encoders and parsers, so pixel
  * statistics and resampling run on REAL decoded bytes. JPEG has its own
  * real baseline DCT codec in [[Jpeg]] (encode + decode, same
  * per-partition batch signature); of the supported containers only MP4
  * remains metadata-plus-sample-table (no video codec), see
  * [[MediaHeader]].
  */
object Pixels {

  /** Decoded image: packed 0xRRGGBB ints, row-major, TOP-DOWN (row 0 is
    * the visual top — i.e. the LAST stored BMP row).
    */
  final case class Image(width: Int, height: Int, pix: Array[Int])

  // Pooled zlib contexts (the [[Gzip]] cost posture): a fresh
  // Deflater/Inflater per image pays zlib's workspace init per ROW —
  // ~256 KB + ~0.5 ms for deflate — which dominates encoding a small
  // test image and scales with row count. Thread-locals amortize it;
  // reset() between images releases the input reference.
  private val deflaters = ThreadLocal.withInitial[java.util.zip.Deflater](() =>
    new java.util.zip.Deflater())
  private val inflaters = ThreadLocal.withInitial[java.util.zip.Inflater](() =>
    new java.util.zip.Inflater())

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

  // =========================================================================
  // PNG (RFC 2083): signature + IHDR/[PLTE]/IDAT/IEND chunks, zlib
  // DEFLATE, the five scanline filters. 8-bit depth, color types 0
  // (grayscale), 2 (RGB), 3 (palette indices over PLTE), 6 (RGBA); alpha
  // is carried through the codec but dropped when packing to 0xRRGGBB
  // (stats are defined over RGB).
  // =========================================================================

  private val PngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def putBe32(b: Array[Byte], i: Int, v: Long): Unit = {
    b(i) = ((v >> 24) & 0xff).toByte
    b(i + 1) = ((v >> 16) & 0xff).toByte
    b(i + 2) = ((v >> 8) & 0xff).toByte
    b(i + 3) = (v & 0xff).toByte
  }
  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  /** The Paeth predictor (RFC 2083 §6.6) — exact spec arithmetic. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def chunk(out: java.io.ByteArrayOutputStream, typ: String,
      data: Array[Byte]): Unit = {
    val len = new Array[Byte](4)
    putBe32(len, 0, data.length.toLong)
    out.write(len)
    val tb = typ.getBytes("US-ASCII")
    out.write(tb)
    out.write(data)
    val crc = new java.util.zip.CRC32()
    crc.update(tb); crc.update(data)
    val cb = new Array[Byte](4)
    putBe32(cb, 0, crc.getValue)
    out.write(cb)
  }

  /** A REAL PNG of the generative test pattern: zlib-deflated scanlines,
    * filter type (y + seed) % 5 per row — every encode exercises all five
    * filters, so a decoder that mis-reverses any one of them fails the
    * round trip. `alpha=true` emits color type 6 (RGBA, alpha =
    * (x + y + seed) % 256) to exercise the 4-byte-per-pixel filter stride.
    */
  def pngBytes(w: Int, h: Int, seed: Long, alpha: Boolean = false): Array[Byte] = {
    val bpp = if (alpha) 4 else 3
    pngEncode(w, h, bpp, if (alpha) 6 else 2, seed, null, (y, cur) => {
      var x = 0
      while (x < w) {
        cur(x * bpp) = genR(x, y, seed)
        cur(x * bpp + 1) = genG(x, y, seed)
        cur(x * bpp + 2) = genB(x, y, seed)
        if (alpha) cur(x * bpp + 3) = ((x + y + seed) % 256).toInt
        x += 1
      }
    })
  }

  /** A REAL palette PNG (color type 3): 8-bit indices over a 256-entry
    * PLTE. Index formula and palette curves are SHARED with the GIF
    * fixture ([[gifIndex]], [[gifPalR]]/G/B), so the one oracle arm
    * replays both containers' decoded channels.
    */
  def pngPalBytes(w: Int, h: Int, seed: Long): Array[Byte] = {
    val plte = new Array[Byte](768)
    var i = 0
    while (i < 256) {
      plte(i * 3) = gifPalR(i).toByte
      plte(i * 3 + 1) = gifPalG(i).toByte
      plte(i * 3 + 2) = gifPalB(i).toByte
      i += 1
    }
    pngEncode(w, h, 1, 3, seed, plte, (y, cur) => {
      var x = 0
      while (x < w) { cur(x) = gifIndex(x, y, seed); x += 1 }
    })
  }

  /** A REAL grayscale PNG (color type 0): gray = [[genR]], decoded as
    * r = g = b = gray.
    */
  def pngGrayBytes(w: Int, h: Int, seed: Long): Array[Byte] =
    pngEncode(w, h, 1, 0, seed, null, (y, cur) => {
      var x = 0
      while (x < w) { cur(x) = genR(x, y, seed); x += 1 }
    })

  /** Shared PNG writer: fill each scanline, filter with type
    * (y + seed) % 5 — every encode exercises all five filters — deflate,
    * and emit signature + IHDR [+ PLTE] + IDAT + IEND.
    */
  private def pngEncode(w: Int, h: Int, bpp: Int, colorType: Int, seed: Long,
      plte: Array[Byte], fill: (Int, Array[Int]) => Unit): Array[Byte] = {
    val stride = w * bpp
    // raw scanlines, filter byte + filtered bytes per row
    val raw = new Array[Byte](h * (1 + stride))
    val cur = new Array[Int](stride)  // this row's unfiltered bytes
    val prev = new Array[Int](stride) // previous row's unfiltered bytes
    var y = 0
    while (y < h) {
      fill(y, cur)
      val f = math.floorMod(y + seed, 5L).toInt
      val base = y * (1 + stride)
      raw(base) = f.toByte
      var i = 0
      while (i < stride) {
        val left = if (i >= bpp) cur(i - bpp) else 0
        val up = if (y > 0) prev(i) else 0
        val upLeft = if (y > 0 && i >= bpp) prev(i - bpp) else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, upLeft)
        }
        raw(base + 1 + i) = ((cur(i) - pred) & 0xff).toByte
        i += 1
      }
      System.arraycopy(cur, 0, prev, 0, stride)
      y += 1
    }
    // zlib stream (Deflater default = zlib wrapper); pooled — see above
    val deflater = deflaters.get()
    deflater.reset()
    deflater.setInput(raw); deflater.finish()
    val zbuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) {
      val n = deflater.deflate(tmp)
      zbuf.write(tmp, 0, n)
    }
    deflater.reset()
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSig)
    val ihdr = new Array[Byte](13)
    putBe32(ihdr, 0, w.toLong); putBe32(ihdr, 4, h.toLong)
    ihdr(8) = 8                                  // bit depth
    ihdr(9) = colorType.toByte
    ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0     // deflate, adaptive, no interlace
    chunk(out, "IHDR", ihdr)
    if (plte != null) chunk(out, "PLTE", plte)
    chunk(out, "IDAT", zbuf.toByteArray)
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Parse an 8-bit PNG (color type 0 grayscale, 2 RGB, 3 palette, or
    * 6 RGBA; no interlace) into top-down packed pixels: walk chunks,
    * inflate the concatenated IDAT zlib stream, reverse the per-scanline
    * filter, and resolve palette indices / widen gray. Rejects (None)
    * anything else — other depths, interlaced images, bad CRCs, a missing
    * or over-long PLTE, an index past the palette, truncated or over-long
    * streams. Header ints are UNTRUSTED:
    * Long arithmetic, bounded dims, and the inflate output is bounded to
    * exactly the expected scanline total, so a crafted IHDR or a zip-bomb
    * IDAT can't out-allocate the declared image size.
    */
  def decodePng(bytes: Array[Byte]): Option[Image] = {
    if (bytes == null || bytes.length < PngSig.length + 12) return None
    var i = 0
    while (i < PngSig.length) {
      if (bytes(i) != PngSig(i)) return None
      i += 1
    }
    var pos = PngSig.length
    var w = 0; var h = 0; var bpp = 0; var colorType = -1
    var seenIhdr = false; var seenIend = false
    var palette: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    while (!seenIend) {
      if (pos + 8 > bytes.length) return None
      val len = be32(bytes, pos)
      if (len < 0 || len > Int.MaxValue - 12 || pos + 12 + len > bytes.length)
        return None
      val typ = new String(bytes, pos + 4, 4, "US-ASCII")
      val dataOff = pos + 8
      val dataLen = len.toInt
      val crc = new java.util.zip.CRC32()
      crc.update(bytes, pos + 4, 4 + dataLen)
      if (crc.getValue != be32(bytes, dataOff + dataLen)) return None
      typ match {
        case "IHDR" =>
          if (seenIhdr || dataLen != 13) return None
          seenIhdr = true
          val wL = be32(bytes, dataOff)
          val hL = be32(bytes, dataOff + 4)
          val bitDepth = bytes(dataOff + 8) & 0xff
          colorType = bytes(dataOff + 9) & 0xff
          val interlace = bytes(dataOff + 12) & 0xff
          val maxDim = 1 << 14
          if (wL <= 0 || hL <= 0 || wL > maxDim || hL > maxDim ||
            wL * hL > (1L << 26) || bitDepth != 8 ||
            (colorType != 0 && colorType != 2 &&
              colorType != 3 && colorType != 6) ||
            (bytes(dataOff + 10) & 0xff) != 0 ||
            (bytes(dataOff + 11) & 0xff) != 0 || interlace != 0) return None
          w = wL.toInt; h = hL.toInt
          bpp = colorType match {
            case 0 => 1; case 2 => 3; case 3 => 1; case _ => 4
          }
        case "PLTE" =>
          // spec: before IDAT, 1..256 RGB triples, at most one chunk
          if (!seenIhdr || palette != null || idat.size() > 0 ||
            dataLen == 0 || dataLen % 3 != 0 || dataLen > 768) return None
          palette = java.util.Arrays.copyOfRange(bytes, dataOff, dataOff + dataLen)
        case "IDAT" =>
          if (!seenIhdr) return None
          idat.write(bytes, dataOff, dataLen)
        case "IEND" => seenIend = true
        case _ => () // ancillary chunk: CRC-checked above, content ignored
      }
      pos = dataOff + dataLen + 4
    }
    if (!seenIhdr) return None
    // indexed-color REQUIRES a palette; the other types must not carry
    // indices (a stray PLTE on truecolor is a legal suggested palette —
    // ignored — but on grayscale it is an error per the spec)
    if (colorType == 3 && palette == null) return None
    if (colorType == 0 && palette != null) return None
    val stride = w * bpp
    val expected = h * (1 + stride)
    val raw = new Array[Byte](expected)
    val inflater = inflaters.get()
    inflater.reset()
    inflater.setInput(idat.toByteArray)
    try {
      var got = 0
      while (got < expected && !inflater.finished()) {
        val n = inflater.inflate(raw, got, expected - got)
        if (n == 0 && inflater.needsInput()) return None // truncated stream
        got += n
      }
      if (got != expected) return None
      // the stream must END here — trailing pixel data beyond the declared
      // dims means the header lies about the image
      val probe = new Array[Byte](1)
      if (!inflater.finished() && inflater.inflate(probe) > 0) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inflater.reset() // pooled: reset releases the input reference
    // reverse the per-scanline filter in place (recon bytes overwrite raw)
    val pix = new Array[Int](w * h)
    val cur = new Array[Int](stride)
    val prev = new Array[Int](stride)
    var y = 0
    while (y < h) {
      val base = y * (1 + stride)
      val f = raw(base) & 0xff
      if (f > 4) return None
      var j = 0
      while (j < stride) {
        val v = raw(base + 1 + j) & 0xff
        val left = if (j >= bpp) cur(j - bpp) else 0
        val up = if (y > 0) prev(j) else 0
        val upLeft = if (y > 0 && j >= bpp) prev(j - bpp) else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, upLeft)
        }
        cur(j) = (v + pred) & 0xff
        j += 1
      }
      var x = 0
      while (x < w) {
        pix(y * w + x) = colorType match {
          case 0 =>
            val g = cur(x)
            (g << 16) | (g << 8) | g
          case 3 =>
            val idx = cur(x)
            // an index past the palette is a hard error per the spec
            if (idx * 3 + 2 >= palette.length) return None
            ((palette(idx * 3) & 0xff) << 16) |
              ((palette(idx * 3 + 1) & 0xff) << 8) |
              (palette(idx * 3 + 2) & 0xff)
          case _ =>
            (cur(x * bpp) << 16) | (cur(x * bpp + 1) << 8) | cur(x * bpp + 2)
        }
        x += 1
      }
      System.arraycopy(cur, 0, prev, 0, stride)
      y += 1
    }
    Some(Image(w, h, pix))
  }

  // =========================================================================
  // GIF (87a/89a, public spec): logical screen descriptor + global color
  // table + image descriptor, pixel indices compressed with GIF-variant
  // LZW (variable 9..12-bit codes, LSB-first bit packing, clear/EOI
  // codes), optional 4-pass interlacing. A REAL dictionary encoder and a
  // spec decoder — with [[Jpeg]]'s baseline DCT codec, this completes the
  // zero-dep image families.
  // =========================================================================

  /** GIF test pattern: a palette INDEX per pixel plus a 256-entry
    * generative palette — 24-bit truecolor can't ride a GIF, so the GIF
    * rows use their own formula the oracle replays: decoded channel =
    * palette curve applied to the index.
    */
  def gifIndex(x: Int, y: Int, seed: Long): Int =
    ((x * 7 + y * 11 + seed) % 256).toInt
  def gifPalR(i: Int): Int = (i * 3 + 29) % 256
  def gifPalG(i: Int): Int = (i * 5 + 7) % 256
  def gifPalB(i: Int): Int = (i * 7 + 13) % 256

  /** The four interlace passes' row order (GIF89a appendix E). */
  private def interlaceRows(h: Int): Array[Int] = {
    val out = new Array[Int](h)
    var k = 0
    for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2)); y <- start until h by step) {
      out(k) = y; k += 1
    }
    out
  }

  /** LSB-first variable-width bit writer chunked into ≤255-byte GIF data
    * sub-blocks.
    */
  private final class LzwBitSink(out: java.io.ByteArrayOutputStream) {
    private var acc = 0L
    private var nBits = 0
    private val block = new Array[Byte](255)
    private var blockLen = 0
    private def flushByte(b: Int): Unit = {
      block(blockLen) = b.toByte; blockLen += 1
      if (blockLen == 255) { out.write(blockLen); out.write(block, 0, blockLen); blockLen = 0 }
    }
    def put(code: Int, width: Int): Unit = {
      acc |= code.toLong << nBits
      nBits += width
      while (nBits >= 8) { flushByte((acc & 0xff).toInt); acc >>>= 8; nBits -= 8 }
    }
    def finish(): Unit = {
      if (nBits > 0) flushByte((acc & 0xff).toInt)
      if (blockLen > 0) { out.write(blockLen); out.write(block, 0, blockLen) }
      out.write(0) // block terminator
    }
  }

  /** A REAL GIF of the generative index pattern: 256-color global table,
    * actual dictionary LZW (clear, variable width, reset at 4096),
    * optionally interlaced (rows stored in the 4-pass order).
    */
  def gifBytes(w: Int, h: Int, seed: Long, interlaced: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    u16(w); u16(h)
    out.write(0xf7) // GCT present, 8-bit color resolution, 256 entries
    out.write(0); out.write(0) // background, aspect
    var i = 0
    while (i < 256) {
      out.write(gifPalR(i)); out.write(gifPalG(i)); out.write(gifPalB(i))
      i += 1
    }
    out.write(0x2c) // image descriptor
    u16(0); u16(0); u16(w); u16(h)
    out.write(if (interlaced) 0x40 else 0x00) // no LCT
    out.write(8) // LZW min code size
    // pixel indices in stored-row order
    val rows = if (interlaced) interlaceRows(h) else Array.tabulate(h)(identity)
    val idx = new Array[Int](w * h)
    var k = 0
    for (y <- rows; x <- 0 until w) { idx(k) = gifIndex(x, y, seed); k += 1 }
    // GIF LZW: dictionary keyed (prefixCode << 8 | byte); width bumps one
    // add later than the decoder's (the emitted stream interoperates —
    // see decoder)
    val Clear = 256; val Eoi = 257
    val sink = new LzwBitSink(out)
    var width = 9
    var next = 258
    var dict = new java.util.HashMap[Int, Integer]()
    sink.put(Clear, width)
    var prev = idx(0)
    k = 1
    while (k < idx.length) {
      val c = idx(k)
      val key = (prev << 8) | c
      val hit = dict.get(key)
      if (hit != null) prev = hit.intValue()
      else {
        sink.put(prev, width)
        if (next == 4096) {
          sink.put(Clear, width)
          dict = new java.util.HashMap[Int, Integer]()
          width = 9; next = 258
        } else {
          dict.put(key, Integer.valueOf(next))
          next += 1
          if (next == (1 << width) + 1 && width < 12) width += 1
        }
        prev = c
      }
      k += 1
    }
    sink.put(prev, width)
    sink.put(Eoi, width)
    sink.finish()
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Parse a GIF into top-down packed pixels: screen descriptor, global
    * color table, skip extensions, first image descriptor, full LZW
    * decode (clear/EOI, variable width, KwKwK case), interlace
    * de-permutation. Rejects (None) local color tables absent a global
    * one, truncated streams, over-long streams, and out-of-range codes;
    * header ints are untrusted (bounded dims, output bounded to w·h).
    */
  def decodeGif(bytes: Array[Byte]): Option[Image] = {
    if (bytes == null || bytes.length < 14) return None
    val sig = new String(bytes, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    def u16(i: Int): Int = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
    val maxDim = 1 << 14
    val packed = bytes(10) & 0xff
    var pos = 13
    // global color table (optional per spec; required by this decoder once
    // the image descriptor carries no local table)
    var palette: Array[Int] = null
    if ((packed & 0x80) != 0) {
      val size = 2 << (packed & 7)
      if (pos + size * 3 > bytes.length) return None
      palette = Array.tabulate(size) { i =>
        ((bytes(pos + i * 3) & 0xff) << 16) |
          ((bytes(pos + i * 3 + 1) & 0xff) << 8) | (bytes(pos + i * 3 + 2) & 0xff)
      }
      pos += size * 3
    }
    // walk blocks to the first image descriptor
    while (pos < bytes.length && (bytes(pos) & 0xff) == 0x21) {
      pos += 2 // extension introducer + label
      while (pos < bytes.length && (bytes(pos) & 0xff) != 0) {
        pos += 1 + (bytes(pos) & 0xff)
      }
      pos += 1 // sub-block terminator
    }
    if (pos + 10 > bytes.length || (bytes(pos) & 0xff) != 0x2c) return None
    val w = u16(pos + 5)
    val h = u16(pos + 7)
    val imgPacked = bytes(pos + 9) & 0xff
    if (w <= 0 || h <= 0 || w > maxDim || h > maxDim ||
      w.toLong * h > (1L << 26)) return None
    val interlaced = (imgPacked & 0x40) != 0
    pos += 10
    if ((imgPacked & 0x80) != 0) {
      val size = 2 << (imgPacked & 7)
      if (pos + size * 3 > bytes.length) return None
      palette = Array.tabulate(size) { i =>
        ((bytes(pos + i * 3) & 0xff) << 16) |
          ((bytes(pos + i * 3 + 1) & 0xff) << 8) | (bytes(pos + i * 3 + 2) & 0xff)
      }
      pos += size * 3
    }
    if (palette == null || pos >= bytes.length) return None
    val minCode = bytes(pos) & 0xff
    pos += 1
    if (minCode < 2 || minCode > 8) return None
    // concatenate the data sub-blocks
    val data = new java.io.ByteArrayOutputStream()
    while (pos < bytes.length && (bytes(pos) & 0xff) != 0) {
      val len = bytes(pos) & 0xff
      if (pos + 1 + len > bytes.length) return None
      data.write(bytes, pos + 1, len)
      pos += 1 + len
    }
    val stream = data.toByteArray
    // LZW decode into index order, bounded to w·h outputs
    val nPix = w * h
    val indices = new Array[Int](nPix)
    var got = 0
    val Clear = 1 << minCode
    val Eoi = Clear + 1
    // dictionary as (prefix code, suffix byte) per entry; literals implicit
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    var next = Eoi + 1
    var width = minCode + 1
    var acc = 0L
    var nBits = 0
    var bytePos = 0
    var prevCode = -1
    val expand = new Array[Int](4096)
    def emit(code: Int): Boolean = { // writes the code's string; false on overflow
      var n = 0
      var c = code
      while (c >= Clear) { expand(n) = suffix(c); n += 1; c = prefix(c) }
      expand(n) = c; n += 1
      if (got + n > nPix) return false
      var j = n - 1
      while (j >= 0) { indices(got) = expand(j); got += 1; j -= 1 }
      true
    }
    def firstChar(code: Int): Int = {
      var c = code
      while (c >= Clear) c = prefix(c)
      c
    }
    var done = false
    while (!done) {
      while (nBits < width && bytePos < stream.length) {
        acc |= (stream(bytePos) & 0xffL) << nBits
        nBits += 8; bytePos += 1
      }
      if (nBits < width) return None // truncated before EOI
      val code = (acc & ((1L << width) - 1)).toInt
      acc >>>= width; nBits -= width
      if (code == Clear) {
        next = Eoi + 1; width = minCode + 1; prevCode = -1
      } else if (code == Eoi) {
        done = true
      } else if (prevCode < 0) {
        if (code >= Clear) return None // first code must be a literal
        if (!emit(code)) return None
        prevCode = code
      } else {
        if (code > next) return None
        val cur =
          if (code == next) { // KwKwK: prev string + its own first char
            if (next >= 4096) return None
            prefix(next) = prevCode; suffix(next) = firstChar(prevCode)
            next += 1
            if (next == (1 << width) && width < 12) width += 1
            if (!emit(code)) return None
            prevCode = code
            -1
          } else code
        if (cur >= 0) {
          if (!emit(cur)) return None
          if (next < 4096) {
            prefix(next) = prevCode; suffix(next) = firstChar(cur)
            next += 1
            if (next == (1 << width) && width < 12) width += 1
          }
          prevCode = cur
        }
      }
    }
    if (got != nPix) return None
    // map indices through the palette, undoing interlace row permutation
    val pix = new Array[Int](nPix)
    val rows = if (interlaced) interlaceRows(h) else Array.tabulate(h)(identity)
    var k = 0
    var r = 0
    while (r < h) {
      val y = rows(r)
      var x = 0
      while (x < w) {
        val idx = indices(k)
        if (idx >= palette.length) return None
        pix(y * w + x) = palette(idx)
        x += 1; k += 1
      }
      r += 1
    }
    Some(Image(w, h, pix))
  }

  /** Magic-dispatched decode: BMP ("BM"), PNG (8-byte signature), GIF
    * ("GIF8"), or baseline JPEG (FFD8 — see [[Jpeg.decode]]).
    */
  def decode(bytes: Array[Byte]): Option[Image] =
    if (bytes == null || bytes.length < 3) None
    else if (bytes(0) == 'B' && bytes(1) == 'M') decodeBmp(bytes)
    else if (bytes(0) == PngSig(0) && bytes(1) == PngSig(1)) decodePng(bytes)
    else if (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F') decodeGif(bytes)
    else if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) Jpeg.decode(bytes)
    else None

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
