package graft.ext

/** Zero-dep gzip (RFC 1952 via `java.util.zip`) + zstd (Spark's bundled
  * zstd-jni) for compressed text columns — web corpora ship documents
  * compressed, and a pipeline must decode them inside the scan without
  * trusting the bytes.
  *
  * Decode posture (untrusted input): bounded output — a crafted
  * stream that inflates past `maxBytes` rejects (None) rather than
  * out-allocating the executor (zip-bomb guard); any malformed header,
  * truncated deflate stream, or failed CRC32 trailer check also rejects.
  * Never throws.
  *
  * Cost posture (the r13 fix): codec CONTEXTS are pooled per thread.
  * Constructing a fresh `GZIPOutputStream`/`ZstdOutputStream` per row
  * allocates and initializes a native workspace (zlib ~256 KB, zstd
  * ~1-2 MB) that costs ~0.5-1 ms — 30× the actual (de)compression work
  * of a ~300-byte document, and the malloc/free churn grows with row
  * count (r13 solo measurement: 261 CPU-seconds to round-trip 15 MB at
  * 10×). Thread-local `Deflater`/`ZstdCompressCtx`/`ZstdDecompressCtx`
  * amortize that workspace across every row an executor thread
  * processes; resident cost is bounded by the thread count (32 threads
  * × ~2.5 MB). The gzip frame is hand-written (RFC 1952: 10-byte
  * header, raw deflate, CRC32 + ISIZE trailer) byte-identical to
  * `GZIPOutputStream`'s default output; zstd single-shot frames
  * additionally carry the content size, which makes the bounded decode
  * a single native call instead of a pull loop.
  */
object Gzip {

  private val GzHeader = Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0)

  private val deflaters = ThreadLocal.withInitial[java.util.zip.Deflater](() =>
    new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true))
  private val zstdC = ThreadLocal.withInitial[com.github.luben.zstd.ZstdCompressCtx](() =>
    new com.github.luben.zstd.ZstdCompressCtx())
  private val zstdD = ThreadLocal.withInitial[com.github.luben.zstd.ZstdDecompressCtx](() =>
    new com.github.luben.zstd.ZstdDecompressCtx())

  private def writeIntLE(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
    out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
  }

  def gzip(data: Array[Byte]): Array[Byte] = {
    val d = deflaters.get()
    d.reset()
    d.setInput(data)
    d.finish()
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 32)
    out.write(GzHeader, 0, GzHeader.length)
    val buf = new Array[Byte](8192)
    while (!d.finished()) {
      val n = d.deflate(buf)
      out.write(buf, 0, n)
    }
    val crc = new java.util.zip.CRC32()
    crc.update(data, 0, data.length)
    writeIntLE(out, crc.getValue.toInt)
    writeIntLE(out, data.length)
    out.toByteArray
  }

  /** Inflate a gzip stream, bounded to `maxBytes` of output. None on
    * malformed/truncated/over-long input. `GZIPInputStream` keeps the
    * multi-member and CRC32/ISIZE trailer semantics (its per-call
    * Inflater is zlib's cheap ~10 KB inflate state, not the deflate
    * workspace the compressor pools).
    */
  def gunzip(data: Array[Byte], maxBytes: Int): Option[Array[Byte]] = {
    if (data == null || data.length < 18) return None // header + trailer
    boundedRead(new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(data), 8192), data.length, maxBytes)
    // GZIPInputStream verifies the CRC32/ISIZE trailer on EOF
  }

  /** Compress with zstd (Spark's bundled zstd-jni — the codec Spark
    * itself uses for shuffle/parquet, and the dominant corpus compression
    * today). Single-shot frame: carries the content size, so [[unzstd]]
    * bound-checks before allocating.
    */
  def zstd(data: Array[Byte]): Array[Byte] = zstdC.get().compress(data)

  /** Decompress zstd input, bounded to `maxBytes`. None on malformed/
    * truncated/over-long input. A SINGLE frame declaring its content size
    * (our own, and most single-shot producers) decodes in one native
    * call; a lying header cannot overflow the bound — zstd errors when
    * output exceeds the declared size, and a declared size past
    * `maxBytes` rejects before allocating. Everything else — unknown-size
    * streaming frames AND concatenated multi-frame input (`zstd` CLI
    * append; `getFrameContentSize` reports only the FIRST frame, so the
    * one-shot path would misdecode it) — takes the bounded pull loop over
    * a recycling buffer pool, which decodes all frames like gunzip's
    * multi-member handling.
    */
  def unzstd(data: Array[Byte], maxBytes: Int): Option[Array[Byte]] = {
    if (data == null || data.length < 8) return None
    // one-shot is only sound when the first frame IS the whole input
    val singleFrame =
      try com.github.luben.zstd.Zstd.findFrameCompressedSize(data) == data.length
      catch { case _: Exception => false }
    val size =
      if (!singleFrame) -1L
      else
        try com.github.luben.zstd.Zstd.getFrameContentSize(data)
        catch { case _: Exception => -1L }
    if (singleFrame && size > maxBytes) None
    else if (size >= 0)
      try Some(zstdD.get().decompress(data, size.toInt))
      catch { case _: Exception => None }
    else
      boundedRead(new com.github.luben.zstd.ZstdInputStream(
        new java.io.ByteArrayInputStream(data),
        com.github.luben.zstd.RecyclingBufferPool.INSTANCE),
        data.length, maxBytes)
  }

  /** Magic-dispatching decompressor for mixed corpora: gzip (1f 8b) and
    * zstd (28 b5 2f fd) frames each route to their codec; anything else —
    * including plausible-but-unknown compression — rejects rather than
    * guessing.
    */
  def decompress(data: Array[Byte], maxBytes: Int): Option[Array[Byte]] = {
    if (data == null || data.length < 4) return None
    if (data(0) == 0x1f.toByte && data(1) == 0x8b.toByte)
      gunzip(data, maxBytes)
    else if (data(0) == 0x28.toByte && data(1) == 0xb5.toByte &&
      data(2) == 0x2f.toByte && data(3) == 0xfd.toByte)
      unzstd(data, maxBytes)
    else None
  }

  private def boundedRead(mkIn: => java.io.InputStream, inLen: Int,
      maxBytes: Int): Option[Array[Byte]] = {
    // stream construction goes INSIDE the guard: both codecs' constructors
    // already parse (and throw on) malformed headers
    var in: java.io.InputStream = null
    try {
      in = mkIn
      val out = new java.io.ByteArrayOutputStream(math.min(inLen * 4, 65536))
      val buf = new Array[Byte](8192)
      var total = 0
      var n = in.read(buf)
      while (n > 0) {
        total += n
        if (total > maxBytes) return None
        out.write(buf, 0, n)
        n = in.read(buf)
      }
      Some(out.toByteArray)
    } catch {
      case _: java.io.IOException => None
      case _: ArrayIndexOutOfBoundsException => None
    } finally {
      // always release (ZstdInputStream holds NATIVE buffers — waiting on
      // finalization would bloat executor RSS on a corrupt-heavy corpus)
      if (in != null) try in.close() catch { case _: java.io.IOException => () }
    }
  }
}
