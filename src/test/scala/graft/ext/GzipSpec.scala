package graft.ext

class GzipSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("round trip, incl. multi-byte text") {
    for (s <- Seq("", "a", "hello world", "héllo wörld 北京 — ok",
        "x" * 100000)) {
      val b = s.getBytes("UTF-8")
      assert(Gzip.gunzip(Gzip.gzip(b), 1 << 24).map(_.toSeq) === Some(b.toSeq))
    }
  }

  test("rejects malformed, truncated, and flipped-CRC input") {
    val gz = Gzip.gzip(("some document text " * 20).getBytes("UTF-8"))
    assert(Gzip.gunzip(null, 1 << 20).isEmpty)
    assert(Gzip.gunzip(Array[Byte](1, 2, 3), 1 << 20).isEmpty)
    assert(Gzip.gunzip(gz.take(gz.length / 2), 1 << 20).isEmpty)
    val crcBad = gz.clone()
    crcBad(gz.length - 5) = (crcBad(gz.length - 5) ^ 1).toByte
    assert(Gzip.gunzip(crcBad, 1 << 20).isEmpty)
  }

  test("zip-bomb guard: output past maxBytes rejects") {
    val big = Gzip.gzip(Array.fill(1 << 20)(7.toByte)) // ~1 KiB compressed
    assert(Gzip.gunzip(big, 1 << 20).isDefined)
    assert(Gzip.gunzip(big, (1 << 20) - 1).isEmpty)
  }
}
