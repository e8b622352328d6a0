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
      val gif = hex("474946383961" + le2(w) + le2(h) + "F70000") ++
        "body".getBytes("UTF-8")
      assert(MediaDecoder.decode(gif) === (("gif", w, h, 1)))
      val body = "body".getBytes("UTF-8")
      val webp = hex("52494646" + le4(22 + body.length) +
        "5745425056503858" + "0A00000010000000" +
        le3(w - 1) + le3(h - 1)) ++ body
      assert(MediaDecoder.decode(webp) === (("webp", w, h, 1)))
    }
  }

  private def le2(v: Int) = f"${v & 0xff}%02X${(v >> 8) & 0xff}%02X"
  private def le3(v: Int) =
    f"${v & 0xff}%02X${(v >> 8) & 0xff}%02X${(v >> 16) & 0xff}%02X"
  private def le4(v: Int) = le2(v) + le2(v >> 16)

  test("GIF logical screen descriptor: 87a and 89a, little-endian dims") {
    val b89 = hex("474946383961" + le2(320) + le2(240) + "F70000")
    assert(MediaDecoder.gifDims(b89).contains((320, 240)))
    val b87 = hex("474946383761" + le2(1) + le2(65535) + "000000")
    assert(MediaDecoder.gifDims(b87).contains((1, 65535)))
    // bad version letter, truncated descriptor, zero width
    assert(MediaDecoder.gifDims(hex("474946383861" + le2(1) + le2(1) + "00")).isEmpty)
    assert(MediaDecoder.gifDims(hex("47494638396100")).isEmpty)
    assert(MediaDecoder.gifDims(hex("474946383961" + le2(0) + le2(9) + "000000")).isEmpty)
  }

  test("WebP VP8X: 24-bit little-endian canvas dims") {
    val b = hex("52494646" + le4(22) + "5745425056503858" +
      "0A00000010000000" + le3(16383) + le3(99))
    assert(MediaDecoder.webpDims(b).contains((16384, 100)))
    // not a RIFF / not WEBP / unknown first chunk
    assert(MediaDecoder.webpDims(hex("52494658" + le4(22) + "5745425056503858" +
      "0A00000010000000" + le3(1) + le3(1))).isEmpty)
    assert(MediaDecoder.webpDims(hex("52494646" + le4(22) + "5741565056503858" +
      "0A00000010000000" + le3(1) + le3(1))).isEmpty)
    assert(MediaDecoder.webpDims(hex("52494646" + le4(22) + "5745425041414141" +
      "0A00000010000000" + le3(1) + le3(1))).isEmpty)
  }

  test("WebP VP8 (lossy): start code gates the 14-bit dims") {
    val b = hex("52494646" + le4(22) + "57454250" + "56503820" + le4(10) +
      "000000" + "9D012A" + le2(640) + le2(360) + "00")
    assert(MediaDecoder.webpDims(b).contains((640, 360)))
    // broken start code
    assert(MediaDecoder.webpDims(hex("52494646" + le4(22) + "57454250" +
      "56503820" + le4(10) + "000000" + "9D022A" + le2(640) + le2(360) + "00")).isEmpty)
  }

  test("WebP VP8L (lossless): packed 14+14 bit dims") {
    val w = 1899; val h = 1079
    val bits = ((w - 1) & 0x3fff) | (((h - 1) & 0x3fff) << 14)
    val b = hex("52494646" + le4(22) + "57454250" + "5650384C" + le4(6) +
      "2F" + le4(bits) + "0000000000")
    assert(MediaDecoder.webpDims(b).contains((w, h)))
    // wrong signature byte
    assert(MediaDecoder.webpDims(hex("52494646" + le4(22) + "57454250" +
      "5650384C" + le4(6) + "2E" + le4(bits) + "0000000000")).isEmpty)
  }

  /** A complete little WAV: ch channels, 16-bit PCM, `n` data bytes. */
  private def wav(ch: Int, rate: Int, dataBytes: Int,
      filler: String = ""): Array[Byte] = {
    val align = ch * 2
    val fmt = "666D7420" + le4(16) + le2(1) + le2(ch) + le4(rate) +
      le4(rate * align) + le2(align) + le2(16)
    val data = "64617461" + le4(dataBytes) + ("AB" * dataBytes)
    val body = filler + fmt + data
    hex("52494646" + le4(4 + body.length / 2) + "57415645" + body)
  }

  test("WAV fmt/data parse: channels, rate, bits, floor-divided samples") {
    assert(MediaDecoder.wavMeta(wav(2, 44100, 400))
      .contains((2, 44100, 16, 100L))) // 400 bytes / align 4
    // ragged tail dropped: 7 bytes at align 2 -> 3 samples
    assert(MediaDecoder.wavMeta(wav(1, 8000, 7)).contains((1, 8000, 16, 3L)))
  }

  test("WAV chunk scan: odd-length filler chunk skipped via its pad byte") {
    val filler = "4C495354" + le4(5) + "494E464F67" + "00" // LIST len 5 + pad
    assert(MediaDecoder.wavMeta(wav(1, 16000, 32, filler))
      .contains((1, 16000, 16, 16L)))
  }

  test("WAV PCM decode rejects non-PCM audioFormat codes declaring 16 bits") {
    // same layout as wav() but audioFormat = 3 (IEEE float): wavPcm16 must
    // refuse rather than misdecode the floats as LE integer PCM (r6 ADVICE)
    def wavFmt(code: Int): Array[Byte] = {
      val fmt = "666D7420" + le4(16) + le2(code) + le2(1) + le4(8000) +
        le4(8000 * 2) + le2(2) + le2(16)
      val data = "64617461" + le4(4) + "ABABABAB"
      hex("52494646" + le4(4 + (fmt + data).length / 2) + "57415645" + fmt + data)
    }
    assert(MediaDecoder.wavPcm16(wavFmt(1)).nonEmpty)
    assert(MediaDecoder.wavPcm16(wavFmt(3)).isEmpty)      // IEEE float
    assert(MediaDecoder.wavPcm16(wavFmt(0xFFFE)).isEmpty) // EXTENSIBLE
  }

  test("WAV rejects: wrong magic, data before fmt, truncated fmt") {
    assert(MediaDecoder.wavMeta(hex("52494646" + le4(4) + "57415746")).isEmpty)
    val dataFirst = hex("52494646" + le4(16) + "57415645" +
      "64617461" + le4(4) + "ABABABAB")
    assert(MediaDecoder.wavMeta(dataFirst).isEmpty)
    val truncated = hex("52494646" + le4(12) + "57415645" + "666D7420" + le4(16))
    assert(MediaDecoder.wavMeta(truncated).isEmpty)
  }

  private def be4h(v: Long) = f"$v%08X"

  /** A structurally valid MP4: ftyp + optional free box + moov(mvhd, trak/
    * tkhd) with the given parameters. Returns hex.
    */
  private def mp4(ts: Long, dur: Long, w: Int, h: Int,
      free: Boolean = false): Array[Byte] = {
    val matrix = "00010000" + "00000000" * 3 + "00010000" + "00000000" * 3 +
      "40000000"
    val mvhd = "0000006C6D766864" + "00" * 12 + be4h(ts) + be4h(dur) +
      "000100000100" + "00" * 10 + matrix + "00" * 24 + "00000002"
    val tkhd = "0000005C746B6864" + "00000007" + "00" * 8 + "00000001" +
      "00" * 4 + be4h(dur) + "00" * 16 + matrix +
      be4h(w.toLong * 65536) + be4h(h.toLong * 65536)
    // an unknown udta box inside moov before mvhd: must be skipped
    val udta = "0000000C75647461" + "00" * 4
    val moovLen = 8 + 12 + 108 + 100
    val moov = be4h(moovLen.toLong) + "6D6F6F76" + udta + mvhd +
      "000000647472616B" + tkhd
    val freeBox = if (free) "0000001066726565" + "00" * 8 else ""
    hex("000000106674797069736F6D00000200" + freeBox + moov)
  }

  test("MP4 box walk: brand, mvhd timescale/duration, tkhd 16.16 dims") {
    assert(MediaDecoder.mp4Meta(mp4(1000, 48000, 640, 480))
      .contains(("isom", 1000L, 48000L, 640, 480)))
    // unknown top-level (free) and in-moov (udta) boxes are skipped
    assert(MediaDecoder.mp4Meta(mp4(2000, 0, 16, 16, free = true))
      .contains(("isom", 2000L, 0L, 16, 16)))
  }

  test("MP4 rejects: no ftyp, undersized box, truncated moov, zero dims") {
    assert(MediaDecoder.mp4Meta(hex("00000010667265656973" +
      "6F6D00000200")).isEmpty) // first box not ftyp
    val ok = mp4(1000, 400, 320, 240)
    assert(MediaDecoder.mp4Meta(ok.take(40)).isEmpty) // truncated moov
    val zeroW = mp4(1000, 400, 0, 240)
    assert(MediaDecoder.mp4Meta(zeroW).isEmpty)
    // a box claiming size < 8 desyncs the walk: reject, don't loop
    val bad = ok.clone(); bad(16) = 0; bad(17) = 0; bad(18) = 0; bad(19) = 4
    assert(MediaDecoder.mp4Meta(bad).isEmpty)
  }

  test("WAV differential vs the JDK's own audio writer") {
    import javax.sound.sampled._
    for ((ch, rate, frames) <- Seq((1, 8000, 123), (2, 44100, 50))) {
      val fmt = new AudioFormat(rate.toFloat, 16, ch, true, false)
      val pcm = new Array[Byte](frames * ch * 2)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      val parsed = MediaDecoder.wavMeta(bos.toByteArray)
      assert(parsed.contains((ch, rate, 16, frames.toLong)),
        s"jdk wav ch=$ch rate=$rate: $parsed")
    }
  }

  // ---- qm7: the full PNG pixel codec ----

  private def formulaRgb(id: Long, w: Int, h: Int): Array[Byte] = {
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      rgb(o) = Multimodal.pxR(id, x, y).toByte
      rgb(o + 1) = Multimodal.pxG(id, x, y).toByte
      rgb(o + 2) = Multimodal.pxB(id, x, y).toByte
    }
    rgb
  }

  test("PngCodec round-trip: decode(encode(rgb)) is bit-identical") {
    for (id <- Seq(0L, 7L, 123L, 4096L)) {
      val (w, h) = (Multimodal.pxW(id), Multimodal.pxH(id))
      val rgb = formulaRgb(id, w, h)
      val Right((dw, dh, px)) =
        MediaDecoder.PngCodec.decode(MediaDecoder.PngCodec.encode(w, h, rgb))
      assert((dw, dh) == (w, h))
      assert(java.util.Arrays.equals(px, rgb), s"pixels differ for doc $id")
    }
  }

  test("PngCodec decode agrees with the JDK's ImageIO on OUR encoder's bytes") {
    val (id, w, h) = (42L, 24, 17)
    val rgb = formulaRgb(id, w, h)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(MediaDecoder.PngCodec.encode(w, h, rgb)))
    assert(img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      val expect = 0xff000000 | ((rgb(o) & 0xff) << 16) |
        ((rgb(o + 1) & 0xff) << 8) | (rgb(o + 2) & 0xff)
      assert(img.getRGB(x, y) == expect, s"ImageIO pixel ($x,$y)")
    }
  }

  test("PngCodec unfilters the JDK encoder's ADAPTIVE filters (types 1-4)") {
    // javax.imageio picks Sub/Up/Average/Paeth filters per scanline on
    // gradient-ish content — decoding ITS output exercises every unfilter
    // branch against an independent encoder
    for ((w, h) <- Seq((24, 17), (64, 48), (129, 65))) {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, ((x * 3 + y) % 256) << 16 | ((x + y * 5) % 256) << 8 |
          ((x * x + y) % 256))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      val Right((dw, dh, px)) = MediaDecoder.PngCodec.decode(bos.toByteArray)
      assert((dw, dh) == (w, h))
      for (y <- 0 until h; x <- 0 until w) {
        val o = (y * w + x) * 3
        val got = ((px(o) & 0xff) << 16) | ((px(o + 1) & 0xff) << 8) |
          (px(o + 2) & 0xff)
        assert(got == (img.getRGB(x, y) & 0xffffff), s"pixel ($x,$y) of ${w}x$h")
      }
    }
  }

  test("PngCodec rejects: corrupt CRC, truncated IDAT, bad magic, wrong type") {
    val ok = MediaDecoder.PngCodec.encode(8, 8, formulaRgb(1L, 8, 8))
    assert(MediaDecoder.PngCodec.decode(ok).isRight)
    val badCrc = ok.clone()
    badCrc(40) = (badCrc(40) ^ 0x55).toByte // inside the IDAT chunk's CRC span
    assert(MediaDecoder.PngCodec.decode(badCrc) == Left("bad_crc"))
    assert(MediaDecoder.PngCodec.decode(ok.take(ok.length - 20)) ==
      Left("truncated"))
    val badSig = ok.clone(); badSig(0) = 0x42
    assert(MediaDecoder.PngCodec.decode(badSig) == Left("bad_signature"))
    // RGBA (color type 6) is out of scope: typed reject, not a crash
    val rgba = ok.clone(); rgba(25) = 6
    assert(MediaDecoder.PngCodec.decode(rgba).isLeft)
  }
}
