package graft.core

import java.util.regex.Pattern

/** Renderers: plain extracted text, HTML, Markdown.
  *
  * Contracts re-derived from /root/reference/ferrules-core/src/render/html.rs
  * and markdown.rs. The reference renders HTML via the build_html crate and
  * derives Markdown from that HTML via html2md; the rebuild renders both
  * directly from blocks with the same content rules, and the goldens pin the
  * exact output:
  *  - Title -> h{level clamped 1..6} (html.rs:45-53);
  *  - Header -> <header>, Footer -> <footer>;
  *  - ListBlock -> ul/li with the bullet-strip regex applied to each item
  *    (html.rs:10, first match only — Rust Regex::replace);
  *  - TextBlock -> <p>;
  *  - Image -> <figure>/<img>/<figcaption>, only when an image path is
  *    configured (html.rs:88-108);
  *  - Table and anything else -> skipped (html.rs:109-111).
  */
object Render {

  /** html.rs:10 — verbatim bullet pattern (prefix group + bullet + a space). */
  val ListBulletPattern: String = "(^|[\\n ]|<[^>]*>)[•●○ഠ ം◦■▪▫–—-]( )"
  private val listBulletRe: Pattern = Pattern.compile(ListBulletPattern)

  /** Strip the first bullet occurrence (Rust `Regex::replace` = first match). */
  def stripBullet(item: String): String =
    listBulletRe.matcher(item).replaceFirst("")

  /** utils.rs:43-56 — keep alnum/'-'/'_', drop whitespace, other -> '-'. */
  def sanitizeDocName(name: String): String = {
    val sb = new StringBuilder
    name.foreach { c =>
      if (c.isLetterOrDigit || c == '-' || c == '_') sb += c
      else if (!c.isWhitespace) sb += '-'
    }
    sb.toString
  }

  /** Plain extracted text: block texts in reading order, one block per line.
    * List items join with '\n'; image captions surface; Table blocks never
    * exist (Table elements are dropped in grouping). Empty blocks are
    * skipped. This is the byte-compared `extracted_text` column.
    */
  def toText(blocks: Seq[Block]): String = {
    val parts = blocks.iterator.flatMap { b =>
      b.kind match {
        case BlockKind.Title(_, t)   => if (t.nonEmpty) Some(t) else None
        case BlockKind.Header(t)     => if (t.nonEmpty) Some(t) else None
        case BlockKind.Footer(t)     => if (t.nonEmpty) Some(t) else None
        case BlockKind.TextBlock(t)  => if (t.nonEmpty) Some(t) else None
        case BlockKind.ListBlock(it) =>
          val s = it.map(stripBullet).mkString("\n")
          if (s.nonEmpty) Some(s) else None
        case BlockKind.Image(_, cap) => cap.filter(_.nonEmpty)
        case BlockKind.Table         => None
      }
    }
    parts.mkString("\n")
  }

  /** HTML page: div tree inside a minimal page shell (html.rs:31-126). */
  def toHtml(blocks: Seq[Block], pageTitle: String, imgSrcPath: Option[String]): String = {
    val sb = new StringBuilder
    sb ++= "<!DOCTYPE html><html><head><title>"
    sb ++= pageTitle
    sb ++= "</title></head><body><div>"
    blocks.foreach(renderBlockHtml(sb, _, imgSrcPath))
    sb ++= "</div></body></html>"
    sb.toString
  }

  private def renderBlockHtml(sb: StringBuilder, b: Block, imgSrcPath: Option[String]): Unit =
    b.kind match {
      case BlockKind.Title(level, text) =>
        val l = math.max(1, math.min(6, level)) // clamp 1..6, html.rs:45
        sb ++= s"<h$l>" ++= text ++= s"</h$l>"
      case BlockKind.Header(text) =>
        sb ++= "<header>" ++= text ++= "</header>"
      case BlockKind.Footer(text) =>
        sb ++= "<footer>" ++= text ++= "</footer>"
      case BlockKind.ListBlock(items) =>
        sb ++= "<ul>"
        items.foreach(it => sb ++= "<li>" ++= stripBullet(it) ++= "</li>")
        sb ++= "</ul>"
      case BlockKind.TextBlock(text) =>
        sb ++= "<p>" ++= text ++= "</p>"
      case BlockKind.Image(imageId, caption) =>
        // Rendered only when an image path is configured (html.rs:88-108).
        imgSrcPath.foreach { path =>
          sb ++= "<figure><img src=\"" ++= path ++= s"/img_$imageId.png" ++= "\" alt=\"\">"
          caption.foreach(c => sb ++= "<figcaption>" ++= c ++= "</figcaption>")
          sb ++= "</figure>"
        }
      case BlockKind.Table => // not implemented in the reference (html.rs:109-111)
    }

  /** Markdown rendered directly from blocks. The reference composes
    * markdown as html2md(toHtml(blocks)) (render/markdown.rs:14-42), so the
    * contract here is: toMarkdown(blocks, p) == htmlToMd(toHtml(blocks, p))
    * for the constrained HTML dialect toHtml emits — Html2MdDiffSpec pins
    * that equivalence over the whole golden corpus, and goldens pin the
    * bytes. In particular, when no image path is configured the HTML
    * renderer skips Image blocks entirely (html.rs:88-108), so markdown
    * must drop them too — captions and all (they stay in extracted_text,
    * a different contract).
    */
  def toMarkdown(blocks: Seq[Block], imgSrcPath: Option[String]): String = {
    val parts = blocks.iterator.flatMap { b =>
      b.kind match {
        case BlockKind.Title(level, text) =>
          val l = math.max(1, math.min(6, level))
          Some(("#" * l) + " " + text)
        case BlockKind.Header(text)    => if (text.nonEmpty) Some(text) else None
        case BlockKind.Footer(text)    => if (text.nonEmpty) Some(text) else None
        case BlockKind.TextBlock(text) => if (text.nonEmpty) Some(text) else None
        case BlockKind.ListBlock(items) =>
          Some(items.map(it => "* " + stripBullet(it)).mkString("\n"))
        case BlockKind.Image(imageId, caption) =>
          imgSrcPath.map { path =>
            val img = s"![]($path/img_$imageId.png)"
            caption.fold(img)(c => img + "\n" + c)
          }
        case BlockKind.Table => None
      }
    }
    parts.mkString("\n\n")
  }

  /** JSON for the blocks array, field-name-compatible with the reference's
    * serde output (tagged `block_type`, blocks.rs:36-37; bbox as f32 fields).
    */
  def blocksToJson(blocks: Seq[Block]): String = {
    val sb = new StringBuilder
    sb += '['
    var first = true
    blocks.foreach { b =>
      if (!first) sb += ','
      first = false
      sb += '{'
      sb ++= "\"id\":" ++= b.id.toString
      sb ++= ",\"kind\":{"
      sb ++= "\"block_type\":\"" ++= b.kind.label ++= "\""
      b.kind match {
        case BlockKind.Header(t)      => sb ++= ",\"text\":" ++= jsonStr(t)
        case BlockKind.Footer(t)      => sb ++= ",\"text\":" ++= jsonStr(t)
        case BlockKind.Title(lvl, t)  =>
          sb ++= ",\"level\":" ++= lvl.toString ++= ",\"text\":" ++= jsonStr(t)
        case BlockKind.ListBlock(its) =>
          sb ++= ",\"items\":[" ++= its.map(jsonStr).mkString(",") ++= "]"
        case BlockKind.TextBlock(t)   => sb ++= ",\"text\":" ++= jsonStr(t)
        case BlockKind.Image(iid, cap) =>
          sb ++= ",\"id\":" ++= iid.toString
          sb ++= ",\"caption\":" ++= cap.fold("null")(jsonStr)
        case BlockKind.Table          =>
      }
      sb += '}'
      sb ++= ",\"pages_id\":[" ++= b.pagesId.mkString(",") ++= "]"
      sb ++= ",\"bbox\":{\"x0\":" ++= fm(b.bbox.x0) ++= ",\"y0\":" ++= fm(b.bbox.y0)
      sb ++= ",\"x1\":" ++= fm(b.bbox.x1) ++= ",\"y1\":" ++= fm(b.bbox.y1) ++= "}"
      sb += '}'
    }
    sb += ']'
    sb.toString
  }

  private def fm(f: Float): String = f.toString

  private def jsonStr(s: String): String = {
    val sb = new StringBuilder
    sb += '"'
    s.foreach {
      case '"'           => sb ++= "\\\""
      case '\\'          => sb ++= "\\\\"
      case '\n'          => sb ++= "\\n"
      case '\r'          => sb ++= "\\r"
      case '\t'          => sb ++= "\\t"
      case c if c < ' '  => sb ++= f"\\u${c.toInt}%04x"
      case c             => sb += c
    }
    sb += '"'
    sb.toString
  }
}
