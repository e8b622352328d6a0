package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import graft.core.Extract
import graft.spark.PagesTable

/** One-shot generator for the committed golden corpus
  * (src/test/resources/golden). Run once; the goldens then pin the extraction
  * semantics — any behavioral drift fails GoldenSpec. Regenerating goldens is
  * a deliberate, reviewed act (rerun this main), never automatic.
  */
object GenGoldens {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("src/test/resources/golden")
    val n = 130L // 10 docs per fixture family
    Files.createDirectories(Paths.get(outDir, "text"))
    Files.createDirectories(Paths.get(outDir, "md"))
    Files.createDirectories(Paths.get(outDir, "blocks"))
    var written = 0
    def write(key: String, row: PagesTable.PageRow): Unit = {
      val d = Extract.extractDocument(row.url, row.html)
      require(d.parseStatus == "ok", s"golden $key failed: ${d.errorClass}")
      Files.write(Paths.get(outDir, "text", s"$key.txt"),
        d.extractedText.getBytes(StandardCharsets.UTF_8))
      Files.write(Paths.get(outDir, "md", s"$key.md"),
        d.markdown.getBytes(StandardCharsets.UTF_8))
      Files.write(Paths.get(outDir, "blocks", s"$key.json"),
        d.blocksJson.getBytes(StandardCharsets.UTF_8))
      written += 1
    }
    (0L until n).foreach(i => write(s"doc$i", PagesTable.genDoc(i)))
    // the non-cycled scanned-page family (OCR alternate line source) gets
    // its own keys so the 130 cycled goldens stay byte-stable
    (0L until 10L).foreach(i =>
      write(s"ocr$i", PagesTable.genDocFamily(PagesTable.OcrFamily, i)))
    // the non-cycled HTML-entity-damage family (fix_text unescape step)
    (0L until 10L).foreach(i =>
      write(s"ent$i", PagesTable.genDocFamily(PagesTable.EntityFamily, i)))
    // the non-cycled adversarial edge family (parser/geometry edge paths)
    (0L until 10L).foreach(i =>
      write(s"edge$i", PagesTable.genDocFamily(PagesTable.EdgeFamily, i)))
    // the non-cycled mixed-encoding family (fix_text segment fallback)
    (0L until 10L).foreach(i =>
      write(s"mix$i", PagesTable.genDocFamily(PagesTable.MixedFamily, i)))
    // the non-cycled C1 numeric-reference family (WHATWG cp1252 remap)
    (0L until 10L).foreach(i =>
      write(s"c1r$i", PagesTable.genDocFamily(PagesTable.C1Family, i)))
    println(s"wrote $written goldens to $outDir")
  }
}
