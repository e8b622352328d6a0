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
    (0L until n).foreach { i =>
      val row = PagesTable.genDoc(i)
      val d = Extract.extractDocument(row.url, row.html)
      require(d.parseStatus == "ok", s"golden doc $i failed: ${d.errorClass}")
      val key = s"doc$i"
      Files.write(Paths.get(outDir, "text", s"$key.txt"),
        d.extractedText.getBytes(StandardCharsets.UTF_8))
      Files.write(Paths.get(outDir, "md", s"$key.md"),
        d.markdown.getBytes(StandardCharsets.UTF_8))
      Files.write(Paths.get(outDir, "blocks", s"$key.json"),
        d.blocksJson.getBytes(StandardCharsets.UTF_8))
      written += 1
    }
    println(s"wrote $written goldens to $outDir")
  }
}
