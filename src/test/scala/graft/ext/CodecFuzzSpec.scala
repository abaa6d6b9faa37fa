package graft.ext

/** Adversarial-bytes fuzz over every zero-dep binary decoder: media blobs
  * are UNTRUSTED input at scale, so a decoder must reject (None) — never
  * throw, never over-allocate — on arbitrary corruption. Deterministic
  * PRNG (fixed seed): a failure reproduces exactly.
  */
class CodecFuzzSpec extends org.scalatest.funsuite.AnyFunSuite {

  private val rnd = new scala.util.Random(20260813L)

  private def mutate(src: Array[Byte]): Array[Byte] = {
    val b = src.clone()
    val flips = 1 + rnd.nextInt(8)
    var i = 0
    while (i < flips) {
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      i += 1
    }
    rnd.nextInt(4) match {
      case 0 if b.length > 4 => b.take(rnd.nextInt(b.length)) // truncate
      case 1 => b ++ Array.fill(rnd.nextInt(16))(rnd.nextInt(256).toByte)
      case _ => b
    }
  }

  private def fuzz(name: String, valid: => Array[Byte],
      decode: Array[Byte] => Option[Any]): Unit = {
    var decoded = 0
    for (i <- 1 to 300) {
      val bytes = mutate(valid)
      // must not throw; may decode (mutation hit a don't-care byte) or reject
      if (decode(bytes).isDefined) decoded += 1
    }
    // pure garbage of assorted sizes must not throw either
    for (n <- Seq(0, 1, 7, 54, 100, 1000)) {
      val junk = Array.fill(n)(rnd.nextInt(256).toByte)
      decode(junk)
    }
    info(s"$name: $decoded/300 mutants still decoded")
  }

  test("bmp decoder survives corruption") {
    fuzz("bmp", Pixels.bmpBytes(9 + rnd.nextInt(8), 7 + rnd.nextInt(6), rnd.nextLong()),
      Pixels.decodeBmp)
  }

  test("png decoder survives corruption") {
    fuzz("png", Pixels.pngBytes(9 + rnd.nextInt(8), 7 + rnd.nextInt(6),
      rnd.nextLong(), alpha = rnd.nextBoolean()), Pixels.decodePng)
  }

  test("png palette and grayscale decoders survive corruption") {
    fuzz("png-pal", Pixels.pngPalBytes(9 + rnd.nextInt(8), 7 + rnd.nextInt(6),
      rnd.nextLong()), Pixels.decodePng)
    fuzz("png-gray", Pixels.pngGrayBytes(9 + rnd.nextInt(8), 7 + rnd.nextInt(6),
      rnd.nextLong()), Pixels.decodePng)
  }

  test("gif decoder survives corruption") {
    fuzz("gif", Pixels.gifBytes(9 + rnd.nextInt(8), 7 + rnd.nextInt(6),
      rnd.nextLong(), interlaced = rnd.nextBoolean()), Pixels.decodeGif)
  }

  test("jpeg decoder survives corruption") {
    fuzz("jpeg", Jpeg.jpegBytes(9 + rnd.nextInt(24), 9 + rnd.nextInt(20),
      rnd.nextLong()), Jpeg.decode)
  }

  test("wav pcm decoder survives corruption") {
    fuzz("wav", Samples.wavPcmBytes(8000, 1 + rnd.nextInt(2),
      10 + rnd.nextInt(40), rnd.nextLong()), Samples.decodeWavPcm)
  }

  test("header parsers survive corruption") {
    fuzz("png-header", ImageHeader.pngBytes(1 + rnd.nextInt(640), 1 + rnd.nextInt(480)),
      ImageHeader.decode)
    fuzz("jpeg-header", ImageHeader.jpegBytes(1 + rnd.nextInt(640), 1 + rnd.nextInt(480)),
      ImageHeader.decode)
    fuzz("wav-header", MediaHeader.wavBytes(8000, 2, dataSeconds = 3),
      MediaHeader.decodeWav)
    fuzz("mp4-header", MediaHeader.mp4Bytes(320, 240, durationMs = 5000),
      MediaHeader.decodeMp4)
  }

  test("magic dispatch never throws on arbitrary prefixes") {
    for (_ <- 1 to 200) {
      val junk = Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte)
      Pixels.decode(junk)
    }
  }

  test("gzip decoder survives corruption") {
    fuzz("gzip", Gzip.gzip(("fuzz corpus text " * (1 + rnd.nextInt(20)))
      .getBytes("UTF-8")), (b: Array[Byte]) => Gzip.gunzip(b, 1 << 20))
  }

  test("zstd decoder and magic dispatch survive corruption") {
    fuzz("zstd", Gzip.zstd(("fuzz corpus text " * (1 + rnd.nextInt(20)))
      .getBytes("UTF-8")), (b: Array[Byte]) => Gzip.unzstd(b, 1 << 20))
    fuzz("decompress", {
      val b = ("fuzz corpus text " * (1 + rnd.nextInt(20))).getBytes("UTF-8")
      if (rnd.nextBoolean()) Gzip.gzip(b) else Gzip.zstd(b)
    }, (b: Array[Byte]) => Gzip.decompress(b, 1 << 20))
  }

  test("html extractor survives corruption and garbage") {
    import org.apache.spark.unsafe.types.UTF8String
    val valid = ("<html><head><script>var x=1<2;</script><style>.a{}</style>" +
      "</head><body><h1>T</h1><p>a &amp; b <a href=\"/x\">l</a></p>" +
      "<!-- c --></body></html>").getBytes("UTF-8")
    var ok = 0
    for (_ <- 1 to 300) {
      val b = mutate(valid)
      // arbitrary (possibly invalid-UTF-8) bytes: must not throw, output
      // text must stay bounded by input length
      val row = HtmlTextUtilBridge.extract(UTF8String.fromBytes(b))
      assert(row.getUTF8String(0).numBytes() <= b.length)
      if (row.getLong(1) >= 0) ok += 1
    }
    for (n <- Seq(0, 1, 7, 54, 1000)) {
      val junk = Array.fill(n)(rnd.nextInt(256).toByte)
      HtmlTextUtilBridge.extract(UTF8String.fromBytes(junk))
    }
    info(s"html: $ok/300 mutants extracted")
  }

  test("json path memo survives corruption and garbage") {
    import org.apache.spark.unsafe.types.UTF8String
    val valid = """{"k": 1, "o": {"x": "y"}, "a": [1, 2], "s": "t"}"""
      .getBytes("UTF-8")
    for (_ <- 1 to 300) {
      val b = mutate(valid)
      // malformed JSON must read as absent, never throw
      JsonDocMemoBridge.lookup(UTF8String.fromBytes(b), "o.x")
      JsonDocMemoBridge.lookup(UTF8String.fromBytes(b), "k")
    }
    for (n <- Seq(0, 1, 7, 54, 1000)) {
      val junk = Array.fill(n)(rnd.nextInt(256).toByte)
      JsonDocMemoBridge.lookup(UTF8String.fromBytes(junk), "k")
    }
  }
  test("warc walker survives corruption") {
    val valid = ("WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 9\r\n\r\n" +
      "isPartOf!\r\n\r\n" +
      "WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://x.com/1\r\n" +
      "Content-Length: 11\r\n\r\nhello world\r\n\r\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var parsedSome = 0
    for (_ <- 1 to 300) {
      val b = mutate(valid)
      // must not throw; complete-prefix records may still parse
      if (WarcBridge.records(b).numElements() > 0) parsedSome += 1
    }
    for (n <- Seq(0, 1, 4, 7, 54, 1000)) {
      val junk = Array.fill(n)(rnd.nextInt(256).toByte)
      WarcBridge.records(junk)
    }
    // a hostile Content-Length (huge / negative / non-numeric) must stop
    // the walk, not allocate or wrap
    for (cl <- Seq("99999999999999999999", "-7", s"${Long.MaxValue}", "zzz")) {
      val b = s"WARC/1.0\r\nContent-Length: $cl\r\n\r\nx"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      assert(WarcBridge.records(b).numElements() === 0)
    }
    info(s"warc: $parsedSome/300 mutants still yielded a record")
  }
}

/** The kernels live under org.apache.spark.sql.graftexpr (private[sql]
  * bridge); these forwarders keep the fuzz harness in one place.
  */
private object HtmlTextUtilBridge {
  def extract(s: org.apache.spark.unsafe.types.UTF8String) =
    org.apache.spark.sql.graftexpr.HtmlTextUtil.extract(s)
      .asInstanceOf[org.apache.spark.sql.catalyst.expressions.GenericInternalRow]
}

private object JsonDocMemoBridge {
  def lookup(doc: org.apache.spark.unsafe.types.UTF8String, path: String) =
    org.apache.spark.sql.graftexpr.JsonDocMemo.lookup(doc, path)
}

private object WarcBridge {
  def records(b: Array[Byte]) =
    org.apache.spark.sql.graftexpr.WarcUtil.records(b)
}
