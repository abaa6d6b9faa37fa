package graft.ext

/** Real sample-level audio codec: 16-bit PCM WAV (canonical RIFF/WAVE
  * layout, format tag 1, little-endian interleaved frames) — the audio
  * counterpart of [[Pixels]]. Blobs round-trip through an actual encoder
  * and parser, so audio statistics run on REAL decoded samples; the
  * DuckDB oracle replays a generative sample formula, never touching the
  * container bytes (the [[Pixels]] convention). Compressed audio (MP3/
  * AAC) stays header-only — those codecs aren't in scope; they'd slot
  * into the same per-partition batch signature.
  */
object Samples {

  /** Decoded clip: interleaved 16-bit samples, frame-major (frame i,
    * channel c at `pcm(i * channels + c)`).
    */
  final case class Audio(sampleRate: Int, channels: Int, pcm: Array[Short]) {
    def nFrames: Int = if (channels == 0) 0 else pcm.length / channels
  }

  /** Deterministic test-tone sample at (frame, channel) for a seed — the
    * generative formula the oracle replays. Integer arithmetic only;
    * range ±2000 with frequent sign changes, so zero-crossing counts are
    * non-vacuous.
    */
  def genSample(frame: Int, ch: Int, seed: Long): Int =
    (((frame * 37 + ch * 101 + seed * 13) % 4001) - 2000).toInt

  /** A REAL 16-bit PCM WAV of the generative tone: 44-byte canonical
    * header + interleaved little-endian frames.
    */
  def wavPcmBytes(sampleRate: Int, channels: Int, nFrames: Int,
      seed: Long): Array[Byte] = {
    val blockAlign = channels * 2
    val dataSize = nFrames * blockAlign
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1).putShort(channels.toShort).putInt(sampleRate)
    buf.putInt(sampleRate * blockAlign).putShort(blockAlign.toShort).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < nFrames) {
      var c = 0
      while (c < channels) {
        buf.putShort(genSample(i, c, seed).toShort)
        c += 1
      }
      i += 1
    }
    buf.array()
  }

  /** Parse a 16-bit PCM WAV into interleaved samples. Rejects (None)
    * anything else — compressed formats, other bit depths, truncated
    * payloads. Header ints are UNTRUSTED: Long arithmetic, bounded
    * channels/rate/frame count, and the data size must fit inside the
    * actual buffer — a crafted size field can't out-allocate the blob.
    */
  def decodeWavPcm(bytes: Array[Byte]): Option[Audio] = {
    if (bytes == null || bytes.length < 44) return None
    def ascii(i: Int) = new String(bytes, i, 4, "US-ASCII")
    if (ascii(0) != "RIFF" || ascii(8) != "WAVE") return None
    def u16(i: Int): Int = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
    def u32(i: Int): Long =
      (bytes(i) & 0xffL) | ((bytes(i + 1) & 0xffL) << 8) |
        ((bytes(i + 2) & 0xffL) << 16) | ((bytes(i + 3) & 0xffL) << 24)
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    var dataOff = -1
    var dataLen = 0L
    var i = 12
    while (i + 8 <= bytes.length) {
      val id = ascii(i)
      val size = u32(i + 4)
      if (size < 0 || size > bytes.length.toLong) return None
      if (id == "fmt ") {
        if (i + 24 > bytes.length || size < 16) return None
        if (u16(i + 8) != 1) return None // PCM only
        fmt = Some((u16(i + 10), u32(i + 12).toInt, u16(i + 22)))
      } else if (id == "data" && dataOff < 0) {
        dataOff = i + 8
        dataLen = size
      }
      i += 8 + size.toInt + (size.toInt & 1)
    }
    fmt match {
      case Some((ch, rate, bits)) =>
        if (ch < 1 || ch > 8 || bits != 16 ||
          rate < 1 || rate > (1 << 20)) return None
        if (dataOff < 0 || dataOff + dataLen > bytes.length) return None
        val nSamples = (dataLen / 2).toInt
        val nFrames = nSamples / ch
        if (nFrames.toLong * ch > (1L << 24)) return None
        val pcm = new Array[Short](nFrames * ch)
        var s = 0
        while (s < pcm.length) {
          val off = dataOff + s * 2
          pcm(s) = ((bytes(off) & 0xff) | (bytes(off + 1) << 8)).toShort
          s += 1
        }
        Some(Audio(rate, ch, pcm))
      case None => None
    }
  }

  val ChecksumMod = 1000000007L

  /** Integer audio statistics + an order-sensitive Horner checksum over
    * the interleaved unsigned-16 sample stream (pins frame AND channel
    * order — a decoder that de-interleaved wrong or byte-swapped produces
    * the same sums but a different fold). Zero crossings count sign
    * changes on channel 0 (nonneg↔neg transitions). All integer math, so
    * an independent engine reproduces every value exactly.
    */
  def stats(a: Audio): (Long, Long, Long, Long, Long) = {
    var sumAbs = 0L; var sumSq = 0L; var peak = 0L; var zc = 0L; var acc = 0L
    var i = 0
    while (i < a.pcm.length) {
      val v = a.pcm(i).toLong
      val abs = math.abs(v)
      sumAbs += abs
      sumSq += v * v
      if (abs > peak) peak = abs
      acc = (acc * 31 + (v & 0xffffL)) % ChecksumMod
      i += 1
    }
    var f = 1
    while (f < a.nFrames) {
      val prev = a.pcm((f - 1) * a.channels)
      val cur = a.pcm(f * a.channels)
      if ((prev < 0) != (cur < 0)) zc += 1
      f += 1
    }
    (sumAbs, sumSq, peak, zc, acc)
  }
}
