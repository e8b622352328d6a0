package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal.MediaDecoder

/** Header-parse fixtures for the pure-JVM media decoder: hand-built byte
  * layouts (every branch of the JPEG marker scan) plus REAL encoder output
  * from the JDK's own ImageIO (an independent PNG/JPEG writer — if our
  * parser disagrees with javax.imageio's encoder about the dimensions it
  * wrote, the parser is wrong).
  */
class MediaDecoderSpec extends AnyFunSuite {

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def be4(v: Int) = f"$v%08X"
  private def be2(v: Int) = f"$v%04X"

  test("PNG IHDR parse: hand-built signature + IHDR") {
    val b = hex("89504E470D0A1A0A 0000000D 49484452 " + be4(640) + be4(480) +
      "08 06 00 00 00 00000000")
    assert(MediaDecoder.pngDims(b).contains((640, 480)))
    assert(MediaDecoder.decode(b) === (("png", 640, 480, 1)))
  }

  test("PNG rejects: short buffer, bad signature, non-IHDR first chunk") {
    assert(MediaDecoder.pngDims(hex("89504E470D0A1A0A")).isEmpty)
    assert(MediaDecoder.pngDims(hex("89504E470D0A1A0B 0000000D 49484452 " +
      be4(10) + be4(10) + "08 06 00 00 00 00000000")).isEmpty)
    // first chunk labeled "IDAT": spec-invalid, must not be read as IHDR
    assert(MediaDecoder.pngDims(hex("89504E470D0A1A0A 0000000D 49444154 " +
      be4(10) + be4(10) + "08 06 00 00 00 00000000")).isEmpty)
    // zero width must not round-trip as a dimension
    assert(MediaDecoder.pngDims(hex("89504E470D0A1A0A 0000000D 49484452 " +
      be4(0) + be4(480) + "08 06 00 00 00 00000000")).isEmpty)
  }

  test("JPEG SOF parse: SOF0 directly after SOI") {
    val b = hex("FFD8 FFC0 0011 08 " + be2(300) + be2(200) +
      "03 011100 021101 031101")
    assert(MediaDecoder.jpegDims(b).contains((200, 300))) // (w, h)
  }

  test("JPEG marker scan: APP0 + DQT + DHT(C4, not a SOF) skipped to SOF2") {
    val b = hex(
      "FFD8" +
        "FFE0 0010 4A46494600 0101 00 0001 0001 00 00" + // APP0/JFIF
        "FFDB 0006 00112233" + // DQT, skipped by length
        "FFC4 0006 00112233" + // DHT: in C0-CF but NOT a frame header
        "FFC2 0011 08 " + be2(77) + be2(66) + "03 011100 021101 031101")
    assert(MediaDecoder.jpegDims(b).contains((66, 77)))
  }

  test("JPEG rejects: no SOI, desynced marker, truncated segment") {
    assert(MediaDecoder.jpegDims(hex("FFD9FFC000110800100010FF")).isEmpty)
    assert(MediaDecoder.jpegDims(hex("FFD8 0012 3456")).isEmpty)
    assert(MediaDecoder.jpegDims(hex("FFD8 FFC0 00FF 08 0010 0010")).isEmpty)
  }

  test("non-image payloads fall back to the deterministic stub") {
    val b = "just some text".getBytes("UTF-8")
    val n = b.length
    assert(MediaDecoder.decode(b) ===
      (("webm", 64 + (n % 512), 64 + ((n / 7) % 512), 1 + (n % 30))))
  }

  test("differential vs the JDK's own PNG encoder") {
    for ((w, h) <- Seq((1, 1), (123, 45), (1899, 1079))) {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      assert(MediaDecoder.pngDims(bos.toByteArray).contains((w, h)),
        s"JDK-encoded ${w}x$h PNG")
      assert(MediaDecoder.decode(bos.toByteArray)._1 === "png")
    }
  }

  test("differential vs the JDK's own JPEG encoder") {
    for ((w, h) <- Seq((16, 16), (200, 300), (1024, 768))) {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      assert(MediaDecoder.jpegDims(bos.toByteArray).contains((w, h)),
        s"JDK-encoded ${w}x$h JPEG")
      assert(MediaDecoder.decode(bos.toByteArray)._1 === "jpeg")
    }
  }

  test("generator prefixes round-trip: what mediaTable embeds, decode reads") {
    // replicate mediaTable's literal prefixes for a couple of doc_ids
    for (docId <- Seq(0L, 3L, 1203L)) {
      val w = (100 + docId % 1800).toInt
      val h = (80 + (docId * 7) % 1000).toInt
      val png = hex("89504E470D0A1A0A 0000000D 49484452 " + be4(w) + be4(h) +
        "080600000000000000") ++ "body".getBytes("UTF-8")
      assert(MediaDecoder.decode(png) === (("png", w, h, 1)))
      val jpeg = hex("FFD8FFE000104A46494600010100000100010000FFC0001108" +
        be2(h) + be2(w) + "03011100021101031101") ++ "body".getBytes("UTF-8")
      assert(MediaDecoder.decode(jpeg) === (("jpeg", w, h, 1)))
    }
  }
}
