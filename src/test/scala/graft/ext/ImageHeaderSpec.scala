package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

class ImageHeaderSpec extends AnyFunSuite {

  private def encoded(w: Int, h: Int, fmt: String): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, out))
    out.toByteArray
  }

  test("parses genuine ImageIO-encoded PNG and JPEG headers") {
    assert(ImageHeader.decode(encoded(320, 200, "png"))
      .contains(ImageHeader.Info(320, 200, "png")))
    assert(ImageHeader.decode(encoded(17, 31, "jpg"))
      .contains(ImageHeader.Info(17, 31, "jpeg")))
    assert(ImageHeader.decode(encoded(64, 48, "gif"))
      .contains(ImageHeader.Info(64, 48, "gif")))
  }

  test("parses the synthetic minimal containers") {
    assert(ImageHeader.decode(ImageHeader.pngBytes(640, 480))
      .contains(ImageHeader.Info(640, 480, "png")))
    assert(ImageHeader.decode(ImageHeader.jpegBytes(123, 45))
      .contains(ImageHeader.Info(123, 45, "jpeg")))
  }

  test("rejects non-image bytes") {
    assert(ImageHeader.decode("hello world, definitely text".getBytes).isEmpty)
    assert(ImageHeader.decode(Array.empty[Byte]).isEmpty)
    assert(ImageHeader.decode(null).isEmpty)
    // truncated PNG signature
    assert(ImageHeader.decode(Array[Byte](0x89.toByte, 'P', 'N')).isEmpty)
  }
}
