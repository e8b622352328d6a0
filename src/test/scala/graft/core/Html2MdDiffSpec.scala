package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.spark.PagesTable

/** An INDEPENDENT html->markdown converter over the constrained HTML
  * dialect `Render.toHtml` emits, mirroring the reference's architecture
  * where markdown IS parse_html(html) (render/markdown.rs:14-42). Written
  * from the HTML text alone — it never sees blocks — so agreement with
  * `Render.toMarkdown` is a genuine two-path differential, not a
  * self-comparison.
  */
object TestHtml2Md {

  def convert(html: String): String = {
    val open = html.indexOf("<body><div>")
    val close = html.lastIndexOf("</div></body>")
    require(open >= 0 && close > open, s"unexpected html shell: ${html.take(120)}")
    val body = html.substring(open + "<body><div>".length, close)
    val parts = scala.collection.mutable.Buffer[String]()
    var i = 0
    def contentUntil(closeTag: String): String = {
      val end = body.indexOf(closeTag, i)
      require(end >= 0, s"missing $closeTag at $i")
      val c = body.substring(i, end)
      i = end + closeTag.length
      c
    }
    while (i < body.length) {
      if (body.startsWith("<h", i) && body.charAt(i + 2).isDigit) {
        val level = body.charAt(i + 2) - '0'
        i += 4 // past <hN>
        parts += ("#" * level) + " " + contentUntil(s"</h$level>")
      } else if (body.startsWith("<header>", i)) {
        i += 8
        val c = contentUntil("</header>")
        if (c.nonEmpty) parts += c
      } else if (body.startsWith("<footer>", i)) {
        i += 8
        val c = contentUntil("</footer>")
        if (c.nonEmpty) parts += c
      } else if (body.startsWith("<p>", i)) {
        i += 3
        val c = contentUntil("</p>")
        if (c.nonEmpty) parts += c
      } else if (body.startsWith("<ul>", i)) {
        i += 4
        val inner = contentUntil("</ul>")
        val items = "<li>(.*?)</li>".r.findAllMatchIn(inner).map(_.group(1)).toSeq
        parts += items.map("* " + _).mkString("\n")
      } else if (body.startsWith("<figure>", i)) {
        i += 8
        val inner = contentUntil("</figure>")
        val src = "src=\"(.*?)\"".r.findFirstMatchIn(inner).map(_.group(1))
          .getOrElse(sys.error(s"figure without img src: $inner"))
        val cap = "<figcaption>(.*?)</figcaption>".r
          .findFirstMatchIn(inner).map(_.group(1))
        parts += cap.fold(s"![]($src)")(c => s"![]($src)\n" + c)
      } else sys.error(s"unexpected tag at $i: ${body.substring(i, math.min(i + 30, body.length))}")
    }
    parts.mkString("\n\n")
  }
}

/** Differential contract: toMarkdown(blocks, p) == convert(toHtml(blocks, p))
  * — the reference's markdown = html2md(html) composition — checked over
  * every golden-corpus document (both image-path modes) plus the crafted
  * RenderSpec block set.
  */
class Html2MdDiffSpec extends AnyFunSuite {

  test("markdown equals the independent html->md conversion on the golden corpus") {
    (0L until 130L).foreach { i =>
      val row = PagesTable.genDoc(i)
      val d = Extract.extractDocument(row.url, row.html)
      assert(d.parseStatus == "ok", s"doc $i")
      assert(TestHtml2Md.convert(d.html) == d.markdown, s"two-path drift in doc $i (${row.url})")
    }
    (0L until 10L).foreach { i =>
      val row = PagesTable.genDocFamily(PagesTable.OcrFamily, i)
      val d = Extract.extractDocument(row.url, row.html)
      assert(TestHtml2Md.convert(d.html) == d.markdown, s"two-path drift in ocr doc $i")
    }
  }

  test("markdown equals the conversion with an image path configured") {
    val blocks = Vector(
      Block(0, BlockKind.Title(1, "T"), Vector(0), BBox.zero),
      Block(1, BlockKind.Image(7, Some("the cap")), Vector(0), BBox.zero),
      Block(2, BlockKind.Image(8, None), Vector(0), BBox.zero),
      Block(3, BlockKind.TextBlock("tail"), Vector(0), BBox.zero))
    for (path <- Seq(None, Some("figs"))) {
      val html = Render.toHtml(blocks, "t", path)
      val md = Render.toMarkdown(blocks, path)
      assert(TestHtml2Md.convert(html) == md, s"path=$path:\n$html\n---\n$md")
    }
  }
}
