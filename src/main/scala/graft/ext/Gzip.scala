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
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(data), 8192)
      val out = new java.io.ByteArrayOutputStream(math.min(data.length * 4, 65536))
      val buf = new Array[Byte](8192)
      var total = 0
      var n = in.read(buf)
      while (n > 0) {
        total += n
        if (total > maxBytes) return None
        out.write(buf, 0, n)
        n = in.read(buf)
      }
      in.close() // GZIPInputStream verifies the CRC32/ISIZE trailer on EOF
      Some(out.toByteArray)
    } catch {
      case _: java.io.IOException => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }
}
