package graft.ext

class PixelsSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("bmp layout: header fields and padded bottom-up BGR rows by hand") {
    // 2x2, seed 0: gen r/g/b at (x,y) — r=3x+13y, g=5x+3y, b=7x+11y (mod 256)
    val b = Pixels.bmpBytes(2, 2, 0L)
    // row stride = (2*3+3)/4*4 = 8 bytes; file = 54 + 16
    assert(b.length === 70)
    assert(b(0) === 'B'.toByte && b(1) === 'M'.toByte)
    assert((b(10) & 0xff) === 54)        // data offset
    assert((b(18) & 0xff) === 2)         // width
    assert((b(22) & 0xff) === 2)         // height (positive: bottom-up)
    assert((b(28) & 0xff) === 24)        // bpp
    // FIRST stored row is the BOTTOM visual row (y=1):
    //   (0,1): b=11 g=3 r=13 ; (1,1): b=18 g=8 r=16
    assert((b(54) & 0xff) === 11 && (b(55) & 0xff) === 3 && (b(56) & 0xff) === 13)
    assert((b(57) & 0xff) === 18 && (b(58) & 0xff) === 8 && (b(59) & 0xff) === 16)
    // second stored row = visual top (y=0): (0,0): b=0 g=0 r=0 ; (1,0): 7,5,3
    assert((b(62) & 0xff) === 0 && (b(63) & 0xff) === 0 && (b(64) & 0xff) === 0)
    assert((b(65) & 0xff) === 7 && (b(66) & 0xff) === 5 && (b(67) & 0xff) === 3)
  }

  test("decode inverts encode, top-down packed order") {
    val img = Pixels.decodeBmp(Pixels.bmpBytes(5, 3, 42L)).get
    assert(img.width === 5 && img.height === 3)
    for (y <- 0 until 3; x <- 0 until 5) {
      val p = img.pix(y * 5 + x)
      assert(((p >> 16) & 0xff) === Pixels.genR(x, y, 42L))
      assert(((p >> 8) & 0xff) === Pixels.genG(x, y, 42L))
      assert((p & 0xff) === Pixels.genB(x, y, 42L))
    }
  }

  test("decode rejects non-BMP, truncated, and unsupported depths") {
    assert(Pixels.decodeBmp(null).isEmpty)
    assert(Pixels.decodeBmp(Array[Byte](1, 2, 3)).isEmpty)
    assert(Pixels.decodeBmp("not a bitmap at all, just text!".getBytes ++
      new Array[Byte](60)).isEmpty)
    val good = Pixels.bmpBytes(4, 4, 1L)
    assert(Pixels.decodeBmp(good.dropRight(5)).isEmpty)  // truncated pixels
    val bad = good.clone(); bad(28) = 8                  // 8bpp unsupported
    assert(Pixels.decodeBmp(bad).isEmpty)
  }

  test("nearest-neighbor mapping and identity resize") {
    val img = Pixels.decodeBmp(Pixels.bmpBytes(6, 4, 7L)).get
    val same = Pixels.resizeNearest(img, 6, 4)
    assert(same.pix.toSeq === img.pix.toSeq)             // identity map
    val half = Pixels.resizeNearest(img, 3, 2)
    for (y <- 0 until 2; x <- 0 until 3)
      assert(half.pix(y * 3 + x) === img.pix((y * 4 / 2) * 6 + (x * 6 / 3)))
  }

  test("png round trip: RGB and RGBA decode back to the generative pattern") {
    for (alpha <- Seq(false, true); (w, h) <- Seq((1, 1), (5, 3), (16, 11), (19, 7))) {
      val img = Pixels.decodePng(Pixels.pngBytes(w, h, 42L, alpha)).get
      assert(img.width === w && img.height === h)
      for (y <- 0 until h; x <- 0 until w) {
        val p = img.pix(y * w + x)
        assert(((p >> 16) & 0xff) === Pixels.genR(x, y, 42L))
        assert(((p >> 8) & 0xff) === Pixels.genG(x, y, 42L))
        assert((p & 0xff) === Pixels.genB(x, y, 42L))
      }
    }
    // height >= 5 guarantees every filter type (filter = (y + seed) % 5)
    // appears in the stream for any seed
    for (seed <- 0L to 4L) {
      val img = Pixels.decodePng(Pixels.pngBytes(8, 5, seed)).get
      assert((0 until 40).forall { i =>
        val x = i % 8; val y = i / 8
        img.pix(i) === ((Pixels.genR(x, y, seed) << 16) |
          (Pixels.genG(x, y, seed) << 8) | Pixels.genB(x, y, seed))
      })
    }
  }

  test("png palette and grayscale round trips") {
    for ((w, h) <- Seq((1, 1), (5, 3), (16, 11), (19, 7)); seed <- Seq(3L, 42L)) {
      val pal = Pixels.decodePng(Pixels.pngPalBytes(w, h, seed)).get
      assert(pal.width === w && pal.height === h)
      for (y <- 0 until h; x <- 0 until w) {
        val i = Pixels.gifIndex(x, y, seed)
        assert(pal.pix(y * w + x) === ((Pixels.gifPalR(i) << 16) |
          (Pixels.gifPalG(i) << 8) | Pixels.gifPalB(i)))
      }
      val gray = Pixels.decodePng(Pixels.pngGrayBytes(w, h, seed)).get
      for (y <- 0 until h; x <- 0 until w) {
        val g = Pixels.genR(x, y, seed)
        assert(gray.pix(y * w + x) === ((g << 16) | (g << 8) | g))
      }
    }
    // palette-PNG and GIF of the same (w,h,seed) decode IDENTICALLY —
    // the shared-formula contract the oracle arm relies on
    val viaPng = Pixels.decodePng(Pixels.pngPalBytes(9, 6, 7L)).get
    val viaGif = Pixels.decodeGif(Pixels.gifBytes(9, 6, 7L)).get
    assert(viaPng.pix.toSeq === viaGif.pix.toSeq)
  }

  test("png palette decode rejects spec violations") {
    val good = Pixels.pngPalBytes(6, 4, 3L)
    // strip the PLTE chunk: indexed color without a palette must reject.
    // chunk layout: 8 sig + (25 IHDR) then PLTE (12 + 768)
    val noPlte = good.take(8 + 25) ++ good.drop(8 + 25 + 12 + 768)
    assert(Pixels.decodePng(noPlte).isEmpty)
    // truncate the palette to 16 entries (48 bytes): the 6x4/seed=3
    // fixture's indices reach 71, so decode must reject on the first
    // index past the palette
    val shortPlte = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(good, 0, 8 + 25) // sig + IHDR
      val data = java.util.Arrays.copyOfRange(good, 8 + 25 + 8, 8 + 25 + 8 + 48)
      val len = Array[Byte](0, 0, 0, 48)
      out.write(len)
      out.write("PLTE".getBytes("US-ASCII"))
      out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update("PLTE".getBytes("US-ASCII")); crc.update(data)
      val cb = new Array[Byte](4)
      cb(0) = ((crc.getValue >> 24) & 0xff).toByte
      cb(1) = ((crc.getValue >> 16) & 0xff).toByte
      cb(2) = ((crc.getValue >> 8) & 0xff).toByte
      cb(3) = (crc.getValue & 0xff).toByte
      out.write(cb)
      out.write(good, 8 + 25 + 12 + 768, good.length - (8 + 25 + 12 + 768))
      out.toByteArray
    }
    assert(Pixels.decodePng(shortPlte).isEmpty)
  }

  test("png decode rejects malformed input") {
    assert(Pixels.decodePng(null).isEmpty)
    assert(Pixels.decodePng(Array[Byte](1, 2, 3)).isEmpty)
    val good = Pixels.pngBytes(6, 4, 3L)
    assert(Pixels.decodePng(good.dropRight(9)).isEmpty)   // truncated
    val crcBad = good.clone(); crcBad(20) = (crcBad(20) ^ 1).toByte
    assert(Pixels.decodePng(crcBad).isEmpty)              // IHDR CRC mismatch
    // lying header: claim one extra row — the inflated stream is too short
    val short = {
      val b = good.clone()
      // IHDR height field at offset 8 (sig) + 8 (len+type) + 4 = 20..23,
      // recompute CRC so only the SIZE check can reject it
      b(23) = (b(23) + 1).toByte
      val crc = new java.util.zip.CRC32()
      crc.update(b, 12, 4 + 13)
      b(29) = ((crc.getValue >> 24) & 0xff).toByte
      b(30) = ((crc.getValue >> 16) & 0xff).toByte
      b(31) = ((crc.getValue >> 8) & 0xff).toByte
      b(32) = (crc.getValue & 0xff).toByte
      b
    }
    assert(Pixels.decodePng(short).isEmpty)
    // 16-bit depth unsupported (same CRC-fixup so depth is the rejector)
    val deep = {
      val b = good.clone()
      b(24) = 16
      val crc = new java.util.zip.CRC32()
      crc.update(b, 12, 4 + 13)
      b(29) = ((crc.getValue >> 24) & 0xff).toByte
      b(30) = ((crc.getValue >> 16) & 0xff).toByte
      b(31) = ((crc.getValue >> 8) & 0xff).toByte
      b(32) = (crc.getValue & 0xff).toByte
      b
    }
    assert(Pixels.decodePng(deep).isEmpty)
  }

  test("magic dispatch routes BMP, PNG, and GIF to the right parser") {
    assert(Pixels.decode(Pixels.bmpBytes(4, 4, 1L)).isDefined)
    assert(Pixels.decode(Pixels.pngBytes(4, 4, 1L)).isDefined)
    assert(Pixels.decode(Pixels.gifBytes(4, 4, 1L)).isDefined)
    assert(Pixels.decode("JFIF not really".getBytes).isEmpty)
    // same (w, h, seed) through either truecolor container decodes identically
    val viaBmp = Pixels.decode(Pixels.bmpBytes(9, 6, 5L)).get
    val viaPng = Pixels.decode(Pixels.pngBytes(9, 6, 5L, alpha = true)).get
    assert(viaBmp.pix.toSeq === viaPng.pix.toSeq)
  }

  test("gif round trip: LZW dictionary codec + palette, plain and interlaced") {
    for (interlaced <- Seq(false, true); (w, h) <- Seq((1, 1), (5, 3), (16, 11), (19, 15))) {
      val img = Pixels.decodeGif(Pixels.gifBytes(w, h, 42L, interlaced)).get
      assert(img.width === w && img.height === h)
      for (y <- 0 until h; x <- 0 until w) {
        val i = Pixels.gifIndex(x, y, 42L)
        val expected = (Pixels.gifPalR(i) << 16) | (Pixels.gifPalG(i) << 8) |
          Pixels.gifPalB(i)
        assert(img.pix(y * w + x) === expected,
          s"($x,$y) interlaced=$interlaced")
      }
    }
    // a large uniform-ish image pushes the code width past 9 bits (the
    // dictionary grows one entry per emitted code) — decode must track
    // the width schedule exactly
    val big = Pixels.decodeGif(Pixels.gifBytes(100, 80, 3L)).get
    assert(big.width === 100 && big.height === 80)
    val i0 = Pixels.gifIndex(99, 79, 3L)
    assert(big.pix(79 * 100 + 99) ===
      ((Pixels.gifPalR(i0) << 16) | (Pixels.gifPalG(i0) << 8) | Pixels.gifPalB(i0)))
  }

  /** Count Clear codes in a gifBytes stream by replaying the decoder's
    * width schedule (reset at 4096 entries, bump at 1 << width). A count
    * above 1 proves the encoder's dictionary-RESET path ran and the
    * decoder consumed codes through the full 9..12-bit range twice.
    */
  private def gifClearCodes(gif: Array[Byte]): Int = {
    var pos = 13 + 256 * 3 + 10 // header + screen desc + GCT + image desc
    assert((gif(pos) & 0xff) === 8, "LZW min code size")
    pos += 1
    val data = new java.io.ByteArrayOutputStream()
    while ((gif(pos) & 0xff) != 0) {
      val len = gif(pos) & 0xff
      data.write(gif, pos + 1, len)
      pos += 1 + len
    }
    val s = data.toByteArray
    val Clear = 256; val Eoi = 257
    var acc = 0L; var nBits = 0; var bytePos = 0
    var width = 9; var next = 258
    var clears = 0; var prevWasClear = false
    var done = false
    while (!done) {
      while (nBits < width && bytePos < s.length) {
        acc |= (s(bytePos) & 0xffL) << nBits; nBits += 8; bytePos += 1
      }
      assert(nBits >= width, "stream truncated before EOI")
      val code = (acc & ((1L << width) - 1)).toInt
      acc >>>= width; nBits -= width
      if (code == Clear) { clears += 1; next = 258; width = 9; prevWasClear = true }
      else if (code == Eoi) done = true
      else {
        if (!prevWasClear && next < 4096) {
          next += 1
          if (next == (1 << width) && width < 12) width += 1
        }
        prevWasClear = false
      }
    }
    clears
  }

  test("gif LZW dictionary RESET round trip: a low-redundancy image large " +
      "enough to exhaust 4096 codes mid-stream (the 11/12-bit widths)") {
    // 256×128: the generative pattern shifts per row, so early rows are
    // nearly all dictionary misses — the 3838 adds to saturation happen
    // well before the stream ends and the encoder emits a mid-stream Clear
    val (w, h, seed) = (256, 128, 9L)
    val gif = Pixels.gifBytes(w, h, seed)
    assert(gifClearCodes(gif) >= 2,
      "the image must actually force a dictionary reset (initial Clear + ≥1 reset)")
    val img = Pixels.decodeGif(gif).get
    assert(img.width === w && img.height === h)
    for (y <- 0 until h; x <- 0 until w) {
      val i = Pixels.gifIndex(x, y, seed)
      val expected = (Pixels.gifPalR(i) << 16) | (Pixels.gifPalG(i) << 8) |
        Pixels.gifPalB(i)
      assert(img.pix(y * w + x) === expected, s"($x,$y) after dictionary reset")
    }
  }

  test("gif decode rejects malformed input") {
    assert(Pixels.decodeGif(null).isEmpty)
    assert(Pixels.decodeGif("GIF89a".getBytes).isEmpty)
    val good = Pixels.gifBytes(6, 4, 3L)
    assert(Pixels.decodeGif(good.dropRight(8)).isEmpty)  // truncated LZW
    // corrupting the LZW min code size to an invalid value rejects; the
    // image descriptor sits at the fixed offset 6 (sig) + 7 (screen
    // descriptor) + 768 (global color table), its min-code byte 10 later
    assert((good(781) & 0xff) === 0x2c)
    val bad = good.clone(); bad(791) = 1
    assert(Pixels.decodeGif(bad).isEmpty)
  }

  test("stats checksum is order-sensitive (catches a missing bottom-up flip)") {
    val img = Pixels.decodeBmp(Pixels.bmpBytes(4, 3, 9L)).get
    val flipped = Pixels.Image(4, 3,
      (0 until 3).flatMap(y => (0 until 4).map(x => img.pix((2 - y) * 4 + x))).toArray)
    val (r1, g1, b1, c1) = Pixels.stats(img)
    val (r2, g2, b2, c2) = Pixels.stats(flipped)
    assert(r1 === r2 && g1 === g2 && b1 === b2) // sums are order-blind
    assert(c1 !== c2)                           // the checksum is not
  }
}
