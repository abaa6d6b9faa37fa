package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** Baseline JPEG codec: the block-flat fixtures round-trip EXACTLY
  * (DC-only DCT at quant step 8 is lossless), so every pixel is compared
  * against the generative formula — through real Huffman decode, dequant,
  * IDCT, upsampling, and the fixed-point color conversion. The
  * coefficient-level gray encoder drives the AC run/ZRL/extend paths the
  * flat fixtures never emit.
  */
class JpegSpec extends AnyFunSuite {

  /** Expected packed-RGB image straight from the generative formulas. */
  private def expected(w: Int, h: Int, seed: Long): Array[Int] = {
    val mode = Jpeg.modeOf(seed)
    Array.tabulate(w * h) { i =>
      val x = i % w
      val y = i / w
      val yv = Jpeg.genY(x / 8, y / 8, seed)
      if (mode == 0) (yv << 16) | (yv << 8) | yv
      else Jpeg.ycbcrToRgb(yv, Jpeg.genCb(x / 16, y / 16, seed),
        Jpeg.genCr(x / 16, y / 16, seed))
    }
  }

  private def roundTrip(w: Int, h: Int, seed: Long): Unit = {
    val img = Jpeg.decode(Jpeg.jpegBytes(w, h, seed))
      .getOrElse(fail(s"decode failed for ${w}x$h seed=$seed"))
    assert(img.width == w && img.height == h)
    val exp = expected(w, h, seed)
    val bad = img.pix.indices.find(i => img.pix(i) != exp(i))
    bad.foreach { i =>
      fail(f"pixel ${i % w},${i / w} seed=$seed mode=${Jpeg.modeOf(seed)}: " +
        f"got ${img.pix(i)}%06x want ${exp(i)}%06x")
    }
  }

  test("grayscale round trip is pixel-exact (incl. non-multiple-of-8 dims)") {
    roundTrip(8, 8, 0L)      // seed%3=0: gray; %7=0: restart interval too
    roundTrip(9, 13, 3L)
    roundTrip(31, 27, 6L)
    roundTrip(16, 8, 9L)
  }

  test("YCbCr 4:4:4 round trip is pixel-exact") {
    roundTrip(8, 8, 1L)
    roundTrip(17, 9, 4L)
    roundTrip(31, 27, 10L)
    roundTrip(24, 16, 7L)    // %7=0: restarts in color mode
  }

  test("YCbCr 4:2:0 round trip is pixel-exact (incl. edge MCU crop)") {
    roundTrip(16, 16, 2L)
    roundTrip(17, 19, 5L)
    roundTrip(31, 27, 8L)
    roundTrip(9, 9, 11L)
    roundTrip(32, 20, 14L)   // %7=0 and %3=2: restarts with 4:2:0
  }

  test("restart markers reset DC prediction") {
    // seed 21: %7=0 (dri=2) and %3=0 (gray) over enough MCUs for several
    // RST markers — a decoder that fails to reset predictors drifts
    roundTrip(48, 40, 21L)
    val bytes = Jpeg.jpegBytes(48, 40, 21L)
    assert(bytes.sliding(2).exists(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) >= 0xd0 && (p(1) & 0xff) <= 0xd7),
      "fixture should actually contain RST markers")
  }

  test("Pixels.decode dispatches JPEG by FFD8 magic") {
    val img = Pixels.decode(Jpeg.jpegBytes(16, 16, 2L))
    assert(img.exists(i => i.width == 16 && i.height == 16))
  }

  test("AC run-length, ZRL, and negative-amplitude extend decode correctly") {
    // quantized zigzag coefficients: DC plus scattered ACs with >16-zero
    // gaps (forces ZRL), negative values (forces extend's complement arm)
    val coef = new Array[Int](64)
    coef(0) = 5
    coef(1) = -3
    coef(20) = 7    // 18 zeros since index 1 -> ZRL + run
    coef(63) = -1   // run to the very last coefficient
    val q = 2
    val img = Jpeg.decode(Jpeg.grayJpegOfBlock(coef, q))
      .getOrElse(fail("coef block decode failed"))
    // independent reference: direct 4-nested-loop IDCT of the dequantized
    // block (natural order), written separately from the decoder's
    // separable implementation
    val natural = new Array[Int](64)
    for (k <- 0 until 64) natural(Jpeg.ZigZag(k)) = coef(k) * q
    def c(u: Int) = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    val exp = Array.tabulate(64) { i =>
      val x = i % 8
      val y = i / 8
      var s = 0.0
      for (v <- 0 until 8; u <- 0 until 8)
        s += c(u) * c(v) * natural(v * 8 + u) *
          math.cos((2 * x + 1) * u * math.Pi / 16) *
          math.cos((2 * y + 1) * v * math.Pi / 16)
      val px = math.round(s / 4.0 + 128.0).toInt
      math.max(0, math.min(255, px))
    }
    for (i <- 0 until 64) {
      val got = img.pix(i) & 0xff
      assert(got == exp(i), s"pixel $i: got $got want ${exp(i)}")
    }
  }

  test("progressive and malformed inputs reject, not throw") {
    val good = Jpeg.jpegBytes(16, 16, 2L)
    // flip SOF0 to SOF2 (progressive)
    val prog = good.clone()
    val sofAt = prog.indices.find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc2.toByte
    assert(Jpeg.decode(prog).isEmpty)
    assert(Jpeg.decode(Array[Byte]()).isEmpty)
    assert(Jpeg.decode(Array[Byte](0xff.toByte, 0xd8.toByte)).isEmpty)
    assert(Jpeg.decode(good.take(20)).isEmpty)
    assert(Jpeg.decode(null).isEmpty)
  }
}
