package graft.ext

/** Zero-dep gzip (RFC 1952 via `java.util.zip`) for compressed text
  * columns — web corpora ship documents gzip-compressed, and a pipeline
  * must decode them inside the scan without trusting the bytes.
  *
  * Decode posture (untrusted input): bounded output — a crafted
  * stream that inflates past `maxBytes` rejects (None) rather than
  * out-allocating the executor (zip-bomb guard); any malformed header,
  * truncated deflate stream, or failed CRC32 trailer check also rejects.
  * Never throws.
  */
object Gzip {

  def gzip(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(out)
    gz.write(data)
    gz.close()
    out.toByteArray
  }

  /** Inflate a gzip stream, bounded to `maxBytes` of output. None on
    * malformed/truncated/over-long input.
    */
  def gunzip(data: Array[Byte], maxBytes: Int): Option[Array[Byte]] = {
    if (data == null || data.length < 18) return None // header + trailer
    boundedRead(new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(data), 8192), data.length, maxBytes)
    // GZIPInputStream verifies the CRC32/ISIZE trailer on EOF
  }

  /** Compress with zstd (Spark's bundled zstd-jni — the codec Spark
    * itself uses for shuffle/parquet, and the dominant corpus compression
    * today).
    */
  def zstd(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val z = new com.github.luben.zstd.ZstdOutputStream(out)
    z.write(data)
    z.close()
    out.toByteArray
  }

  /** Decompress a zstd frame, bounded to `maxBytes`. None on malformed/
    * truncated/over-long input.
    */
  def unzstd(data: Array[Byte], maxBytes: Int): Option[Array[Byte]] = {
    if (data == null || data.length < 8) return None
    boundedRead(new com.github.luben.zstd.ZstdInputStream(
      new java.io.ByteArrayInputStream(data)), data.length, maxBytes)
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
