package graft.core

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.spark.PagesTable

/** Byte-compares current extraction output against the committed golden
  * corpus (generated once by graft.tools.GenGoldens). Any semantic drift in
  * the pipeline — fold order, tie-breaking, fix_text, k-means seeding,
  * renderers — fails here.
  */
class GoldenSpec extends AnyFunSuite {

  private val goldenDir = Paths.get("src/test/resources/golden")

  private def read(sub: String, name: String): String =
    new String(Files.readAllBytes(goldenDir.resolve(sub).resolve(name)),
      StandardCharsets.UTF_8)

  test("extraction output matches committed goldens byte-for-byte") {
    assume(Files.exists(goldenDir), "golden corpus not generated yet")
    var checked = 0
    (0L until 130L).foreach { i =>
      val row = PagesTable.genDoc(i)
      val d = Extract.extractDocument(row.url, row.html)
      assert(d.parseStatus == "ok", s"doc $i: ${d.errorClass}")
      assert(d.extractedText == read("text", s"doc$i.txt"), s"text drift in doc $i (${row.url})")
      assert(d.markdown == read("md", s"doc$i.md"), s"markdown drift in doc $i (${row.url})")
      assert(d.blocksJson == read("blocks", s"doc$i.json"), s"blocks drift in doc $i (${row.url})")
      checked += 1
    }
    assert(checked == 130)
  }

  test("entity-family extraction matches committed goldens byte-for-byte") {
    assume(Files.exists(goldenDir.resolve("text").resolve("ent0.txt")),
      "entity goldens not generated yet")
    var sawDecoded = false
    var sawPreserved = false
    (0L until 10L).foreach { i =>
      val row = PagesTable.genDocFamily(PagesTable.EntityFamily, i)
      val d = Extract.extractDocument(row.url, row.html)
      assert(d.parseStatus == "ok", s"ent doc $i: ${d.errorClass}")
      assert(d.extractedText == read("text", s"ent$i.txt"), s"text drift in ent doc $i")
      assert(d.markdown == read("md", s"ent$i.md"), s"markdown drift in ent doc $i")
      assert(d.blocksJson == read("blocks", s"ent$i.json"), s"blocks drift in ent doc $i")
      // behavioral, beyond the byte pin: defined refs decode, lookalikes stay
      assert(!d.extractedText.contains("&eacute;") &&
        !d.extractedText.contains("&#233;"), s"undecoded entity in ent doc $i")
      if (d.extractedText.contains("é")) sawDecoded = true
      if (d.extractedText.contains("&unknown;") ||
        d.extractedText.contains("&T;")) sawPreserved = true
    }
    assert(sawDecoded, "no doc exercised a decoded entity")
    assert(sawPreserved, "no doc exercised a preserved non-entity")
  }

  test("edge-family extraction matches committed goldens byte-for-byte") {
    assume(Files.exists(goldenDir.resolve("text").resolve("edge0.txt")),
      "edge goldens not generated yet")
    (0L until 10L).foreach { i =>
      val row = PagesTable.genDocFamily(PagesTable.EdgeFamily, i)
      val d = Extract.extractDocument(row.url, row.html)
      assert(d.parseStatus == "ok", s"edge doc $i: ${d.errorClass}")
      assert(d.extractedText == read("text", s"edge$i.txt"), s"text drift in edge doc $i")
      assert(d.markdown == read("md", s"edge$i.md"), s"markdown drift in edge doc $i")
      assert(d.blocksJson == read("blocks", s"edge$i.json"), s"blocks drift in edge doc $i")
    }
    // scenario-shape sanity on top of the byte pin
    val single = Extract.extractDocument("u:0",
      PagesTable.genDocFamily(PagesTable.EdgeFamily, 0).html)
    assert(single.extractedText == "x")
    val manyPages = Extract.extractDocument("u:7",
      PagesTable.genDocFamily(PagesTable.EdgeFamily, 7).html)
    assert(manyPages.nPages == 40)
  }

  test("mixed-family extraction matches committed goldens byte-for-byte") {
    assume(Files.exists(goldenDir.resolve("text").resolve("mix0.txt")),
      "mixed goldens not generated yet")
    var sawRepaired = false
    var sawLookalike = false
    (0L until 10L).foreach { i =>
      val row = PagesTable.genDocFamily(PagesTable.MixedFamily, i)
      val d = Extract.extractDocument(row.url, row.html)
      assert(d.parseStatus == "ok", s"mix doc $i: ${d.errorClass}")
      assert(d.extractedText == read("text", s"mix$i.txt"), s"text drift in mix doc $i")
      assert(d.markdown == read("md", s"mix$i.md"), s"markdown drift in mix doc $i")
      assert(d.blocksJson == read("blocks", s"mix$i.json"), s"blocks drift in mix doc $i")
      // behavioral, beyond the byte pin: no complete mojibake group may
      // survive a fixed line (the incomplete-lead lookalikes "Ã test"/"é Ã"
      // are the ONLY legitimate â/Ã carriers, and never followed by a
      // continuation-mapped char)
      assert(!d.extractedText.contains("â€™") &&
        !d.extractedText.contains("â€œ") && !d.extractedText.contains("â‚¬"),
        s"unrepaired mojibake run in mix doc $i")
      if (d.extractedText.contains("’") || d.extractedText.contains("€"))
        sawRepaired = true
      if (d.extractedText.contains("Ã ") || d.extractedText.endsWith("Ã") ||
        d.extractedText.contains("Ã\n")) sawLookalike = true
    }
    assert(sawRepaired, "no doc exercised a segment repair")
    assert(sawLookalike, "no doc exercised a preserved lookalike")
  }

  test("c1-family extraction matches committed goldens byte-for-byte") {
    assume(Files.exists(goldenDir.resolve("text").resolve("c1r0.txt")),
      "c1 goldens not generated yet")
    var sawRemapped = false
    var sawUndefined = false
    (0L until 10L).foreach { i =>
      val row = PagesTable.genDocFamily(PagesTable.C1Family, i)
      val d = Extract.extractDocument(row.url, row.html)
      assert(d.parseStatus == "ok", s"c1 doc $i: ${d.errorClass}")
      assert(d.extractedText == read("text", s"c1r$i.txt"), s"text drift in c1 doc $i")
      assert(d.markdown == read("md", s"c1r$i.md"), s"markdown drift in c1 doc $i")
      assert(d.blocksJson == read("blocks", s"c1r$i.json"), s"blocks drift in c1 doc $i")
      // behavioral, beyond the byte pin: no defined-graphics C1 ref may
      // survive undecoded, and the remap must yield the cp1252 chars —
      // never the raw C1 controls for the defined slots
      assert(!d.extractedText.contains("&#147;") &&
        !d.extractedText.contains("&#133;") &&
        !d.extractedText.contains("&#x92;"),
        s"undecoded C1 ref in c1 doc $i")
      assert(!d.extractedText.exists(c => c >= 0x91 && c <= 0x94),
        s"raw C1 control for a defined cp1252 slot in c1 doc $i")
      if (d.extractedText.exists(c => "“”…—€’™Ÿ".contains(c)))
        sawRemapped = true
      if (d.extractedText.contains('\u0081') ||
        d.extractedText.contains('\u008d')) sawUndefined = true
    }
    assert(sawRemapped, "no doc exercised the cp1252 remap")
    assert(sawUndefined, "no doc exercised an undefined-slot passthrough")
  }

  test("ocr-family extraction matches committed goldens byte-for-byte") {
    assume(Files.exists(goldenDir.resolve("text").resolve("ocr0.txt")),
      "ocr goldens not generated yet")
    (0L until 10L).foreach { i =>
      val row = PagesTable.genDocFamily(PagesTable.OcrFamily, i)
      val d = Extract.extractDocument(row.url, row.html)
      assert(d.parseStatus == "ok", s"ocr doc $i: ${d.errorClass}")
      assert(d.needOcrPages == d.nPages, s"ocr doc $i should need OCR on every page")
      assert(d.extractedText.nonEmpty, s"ocr doc $i extracted no text")
      assert(d.extractedText == read("text", s"ocr$i.txt"), s"text drift in ocr doc $i")
      assert(d.markdown == read("md", s"ocr$i.md"), s"markdown drift in ocr doc $i")
      assert(d.blocksJson == read("blocks", s"ocr$i.json"), s"blocks drift in ocr doc $i")
    }
  }
}
