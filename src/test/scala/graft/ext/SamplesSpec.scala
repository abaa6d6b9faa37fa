package graft.ext

class SamplesSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("wav pcm layout: header fields and interleaved LE frames by hand") {
    // 2 frames, 2 channels, seed 0: s(i,c) = (i*37 + c*101) % 4001 - 2000
    val b = Samples.wavPcmBytes(8000, 2, 2, 0L)
    assert(b.length === 44 + 2 * 2 * 2)
    assert(new String(b, 0, 4, "US-ASCII") === "RIFF")
    assert(new String(b, 8, 4, "US-ASCII") === "WAVE")
    def s16(i: Int): Int = ((b(i) & 0xff) | (b(i + 1) << 8)).toShort.toInt
    // fmt: tag=1 @20, channels=2 @22, rate @24
    assert(s16(20) === 1 && s16(22) === 2)
    // interleaved frame-major: (0,0)=-2000, (0,1)=-1899, (1,0)=-1963, (1,1)=-1862
    assert(s16(44) === -2000 && s16(46) === -1899)
    assert(s16(48) === -1963 && s16(50) === -1862)
  }

  test("decode inverts encode for mono and stereo, any seed") {
    for (ch <- Seq(1, 2); seed <- Seq(0L, 7L, 42L)) {
      val a = Samples.decodeWavPcm(Samples.wavPcmBytes(16000, ch, 25, seed)).get
      assert(a.sampleRate === 16000 && a.channels === ch && a.nFrames === 25)
      for (i <- 0 until 25; c <- 0 until ch)
        assert(a.pcm(i * ch + c).toInt === Samples.genSample(i, c, seed))
    }
  }

  test("decode rejects malformed, truncated, and unsupported input") {
    assert(Samples.decodeWavPcm(null).isEmpty)
    assert(Samples.decodeWavPcm(Array[Byte](1, 2, 3)).isEmpty)
    val good = Samples.wavPcmBytes(8000, 1, 10, 1L)
    assert(Samples.decodeWavPcm(good.dropRight(5)).isEmpty) // truncated data
    val badFmt = good.clone(); badFmt(20) = 3                // IEEE float tag
    assert(Samples.decodeWavPcm(badFmt).isEmpty)
    val badBits = good.clone(); badBits(34) = 8              // 8-bit depth
    assert(Samples.decodeWavPcm(badBits).isEmpty)
    // header-only WAV (data size declared, payload absent) must reject,
    // not fabricate samples
    assert(Samples.decodeWavPcm(
      MediaHeader.wavBytes(8000, 1, dataSeconds = 2)).isEmpty)
  }

  test("stats: sums, peak, channel-0 zero crossings, order-pinning checksum") {
    val a = Samples.decodeWavPcm(Samples.wavPcmBytes(8000, 2, 40, 9L)).get
    val (sumAbs, sumSq, peak, zc, acc) = Samples.stats(a)
    // independent recomputation from the formula
    val ss = for (i <- 0 until 40; c <- 0 until 2) yield Samples.genSample(i, c, 9L)
    assert(sumAbs === ss.map(v => math.abs(v.toLong)).sum)
    assert(sumSq === ss.map(v => v.toLong * v).sum)
    assert(peak === ss.map(v => math.abs(v.toLong)).max)
    val ch0 = (0 until 40).map(i => Samples.genSample(i, 0, 9L))
    assert(zc === (1 until 40).count(i => (ch0(i - 1) < 0) != (ch0(i) < 0)))
    assert(acc === ss.foldLeft(0L)((s, v) =>
      (s * 31 + (v.toLong & 0xffffL)) % Samples.ChecksumMod))
    // the checksum is order-sensitive: swapping channels keeps every sum
    // but changes the fold
    val swapped = Samples.Audio(a.sampleRate, 2,
      a.pcm.grouped(2).flatMap(p => Seq(p(1), p(0))).toArray)
    val (sa2, sq2, pk2, _, acc2) = Samples.stats(swapped)
    assert(sa2 === sumAbs && sq2 === sumSq && pk2 === peak)
    assert(acc2 !== acc)
  }
}
