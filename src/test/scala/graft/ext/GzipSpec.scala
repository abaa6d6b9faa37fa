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
    val bigZ = Gzip.zstd(Array.fill(1 << 20)(7.toByte))
    assert(Gzip.unzstd(bigZ, 1 << 20).isDefined)
    assert(Gzip.unzstd(bigZ, (1 << 20) - 1).isEmpty)
  }

  test("zstd round trip and rejection") {
    for (s <- Seq("", "a", "hello world", "héllo wörld 北京 — ok")) {
      val b = s.getBytes("UTF-8")
      assert(Gzip.unzstd(Gzip.zstd(b), 1 << 24).map(_.toSeq) === Some(b.toSeq))
    }
    val z = Gzip.zstd(("some document text " * 20).getBytes("UTF-8"))
    assert(Gzip.unzstd(z.take(z.length / 2), 1 << 20).isEmpty)
    assert(Gzip.unzstd(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9), 1 << 20).isEmpty)
  }

  test("concatenated multi-frame zstd decodes all frames, like gzip multi-member") {
    // the `zstd` CLI appends frames; getFrameContentSize sees only the
    // FIRST frame, so the one-shot path must defer to the pull loop here
    val a = "first frame content ".getBytes("UTF-8")
    val b = "second frame content".getBytes("UTF-8")
    val cat = Gzip.zstd(a) ++ Gzip.zstd(b)
    assert(Gzip.unzstd(cat, 1 << 20).map(_.toSeq) === Some((a ++ b).toSeq))
    // bound still enforced across frames
    assert(Gzip.unzstd(cat, a.length + b.length - 1).isEmpty)
    // gzip's multi-member counterpart stays green
    val gcat = Gzip.gzip(a) ++ Gzip.gzip(b)
    assert(Gzip.gunzip(gcat, 1 << 20).map(_.toSeq) === Some((a ++ b).toSeq))
  }

  test("decompress_text: a VALID frame holding invalid UTF-8 reads NULL " +
      "(corruption-oracle contract), valid text round-trips") {
    import org.apache.spark.sql.graftexpr.DecompressTextUtil
    // structurally perfect gzip whose plaintext no UTF-8 decode accepts
    val binBody = Array[Byte](0x41, 0xff.toByte, 0xfe.toByte, 0x00, 0x42,
      0xc3.toByte, 0x28)
    assert(Gzip.decompress(Gzip.gzip(binBody), 1 << 20).isDefined,
      "the frame itself must inflate — the rejection below is UTF-8-level")
    assert(DecompressTextUtil.decompress(Gzip.gzip(binBody), 1 << 20) == null)
    assert(DecompressTextUtil.decompress(Gzip.zstd(binBody), 1 << 20) == null)
    val text = "héllo wörld 北京 — ok"
    assert(DecompressTextUtil.decompress(
      Gzip.gzip(text.getBytes("UTF-8")), 1 << 20).toString === text)
  }

  test("magic dispatch routes gzip and zstd, rejects everything else") {
    val b = "dispatch me".getBytes("UTF-8")
    assert(Gzip.decompress(Gzip.gzip(b), 1 << 20).map(_.toSeq) === Some(b.toSeq))
    assert(Gzip.decompress(Gzip.zstd(b), 1 << 20).map(_.toSeq) === Some(b.toSeq))
    assert(Gzip.decompress(b, 1 << 20).isEmpty)         // plain text
    assert(Gzip.decompress(Array[Byte](), 1 << 20).isEmpty)
    assert(Gzip.decompress(null, 1 << 20).isEmpty)
    // a lone magic prefix with garbage behind it must reject, not decode
    assert(Gzip.decompress(Array[Byte](0x1f, 0x8b.toByte, 1, 2, 3, 4, 5, 6,
      7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18), 1 << 20).isEmpty)
    assert(Gzip.decompress(Array[Byte](0x28, 0xb5.toByte, 0x2f, 0xfd.toByte,
      1, 2, 3, 4, 5), 1 << 20).isEmpty)
  }
}
