package graft.spark

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic, seeded generator of the Common-Crawl-style pages table.
  *
  * Schema per BASELINE.json `input_hint`:
  * (url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING).
  *
  * Every row is a pure function of its index (SplitMix64 streams keyed on the
  * index), so generation is embarrassingly parallel: the table is built from
  * `spark.range(n)` and scales to any size without a driver bottleneck —
  * exactly how a 10^12-row synthetic corpus would be materialized on a real
  * cluster before being written to Iceberg.
  *
  * Fixture families (FIXTURES.md section 3) cycle deterministically; each
  * exercises a cited reference branch. `skew` draws its body size from a
  * Pareto-ish distribution to stress the length-bucketed repartitioning.
  */
object PagesTable {

  final case class PageRow(
      url: String,
      warc_ts: Timestamp,
      html: Array[Byte],
      text: String,
      lang: String
  )

  val Families: Vector[String] = Vector(
    "plain", "fontmix", "headings", "lists", "figures", "chrome",
    "sparse", "tables", "overlap", "mojibake", "nolb", "skew", "twocol"
  )

  /** Scanned-page family: NOT in the cycled corpus (appending it to
    * [[Families]] would remap every index's family and invalidate the whole
    * golden corpus for a generator-only reason) — generated explicitly via
    * [[genDocFamily]]; it has its own golden keys (ocr0..ocr9).
    */
  val OcrFamily: String = "ocr"

  /** HTML-entity-damage family: NOT in the cycled corpus (same index-remap
    * rationale as [[OcrFamily]]); golden keys ent0..ent9. Carries the crawl
    * damage ftfy's `unescape_html` step repairs: bare numeric refs, named
    * entities, double/triple-escaped forms, and the not-an-entity lookalikes
    * that must survive untouched.
    */
  val EntityFamily: String = "entity"

  /** Adversarial edge family: NOT in the cycled corpus; golden keys
    * edge0..edge9, each index pinning ONE parser/geometry edge path the
    * uniform generator under-samples — single-char docs, deep span nesting,
    * all-footer pages, zero-area boxes, empty pages/cells, an unbreakable
    * overlong word, many near-empty pages, degenerate ghost probabilities.
    */
  val EdgeFamily: String = "edge"

  /** Mixed-encoding family: NOT in the cycled corpus; golden keys
    * mix0..mix9. Lines mixing ALREADY-CORRECT non-ASCII with cp1252
    * mojibake — the damage family that defeats whole-string decoding (a
    * clean standalone é makes the full byte string invalid UTF-8) and so
    * exercises fix_text's segment fallback; plus the lead-shaped
    * lookalikes that must survive untouched.
    */
  val MixedFamily: String = "mixed"

  /** C1 numeric-reference family: NOT in the cycled corpus; golden keys
    * c1r0..c1r9. Crawl pages authored with cp1252 smart punctuation
    * escaped as raw-byte numeric refs ("&#147;" for a curly quote — the
    * Word-export damage class): fix_text's WHATWG C1 remap must decode
    * the 27 defined graphics-row refs and pass the five undefined slots
    * through as their C1 chars.
    */
  val C1Family: String = "c1ref"

  private val Langs = Vector("en", "fr", "de", "es")

  /** Deterministic SplitMix64 stream. */
  private final class Rng(var state: Long) {
    def nextLong(): Long = {
      state += 0x9e3779b97f4a7c15L
      var z = state
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    def nextInt(bound: Int): Int = ((nextLong() >>> 1) % bound).toInt
    def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16
  }

  private val Words: Vector[String] = Vector(
    "the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog", "data",
    "engine", "spark", "query", "layout", "page", "text", "line", "block",
    "title", "report", "annual", "growth", "market", "value", "index",
    "system", "model", "result", "table", "figure", "section", "chapter",
    "summary", "analysis", "method", "design", "scale", "partition", "shuffle",
    "stream", "batch", "record", "column", "vector", "metric", "signal",
    "window", "filter", "join", "group", "order", "limit", "sample", "between",
    "within", "across", "under", "above", "beyond", "through", "natural",
    "science", "history", "culture", "economy", "policy", "energy", "climate",
    "research", "network", "compute", "storage", "memory", "thread", "kernel"
  )

  /** One round of "UTF-8 bytes re-read as Latin-1" damage. */
  private def latin1Round(s: String): String = new String(
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8),
    java.nio.charset.StandardCharsets.ISO_8859_1)

  private val MojibakeWords: Vector[String] = {
    // UTF-8 bytes of (café, naïve, über, señor) re-read as Latin-1 — once
    // (the classic single damage) and twice (double-encoded, the most
    // common real-crawl damage after it; fix_text unwinds both).
    val singles = Vector("cafÃ©", "naÃ¯ve", "Ã¼ber", "seÃ±or")
    singles ++ singles.map(latin1Round)
  }

  private def sentence(rng: Rng, nWords: Int): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < nWords) {
      if (i > 0) sb += ' '
      sb ++= Words(rng.nextInt(Words.length))
      i += 1
    }
    sb += '.'
    sb.toString
  }

  /** Pure row generator — the only source of corpus bytes. */
  def genDoc(i: Long, seed: Long = 42L): PageRow =
    genDocFamily(Families((i % Families.length).toInt), i, seed)

  /** Row generator with an explicit family (same rng stream as [[genDoc]],
    * keyed on the index alone — genDoc(i) == genDocFamily(cycledFamily, i)).
    */
  def genDocFamily(family: String, i: Long, seed: Long = 42L): PageRow = {
    val rng = new Rng(seed * 0x100000001b3L + i)
    val url = s"https://fixtures.test/$family/$seed/$i"
    val ts = new Timestamp(1700000000000L + i * 1009L * 1000L)
    val lang = Langs((i % Langs.length).toInt)
    val html = genHtml(family, rng, i)
    PageRow(url, ts, html.getBytes("UTF-8"), stripTags(html), lang)
  }

  private def para(rng: Rng, minS: Int = 1, maxS: Int = 4): String =
    (0 until (minS + rng.nextInt(maxS - minS + 1)))
      .map(_ => sentence(rng, 6 + rng.nextInt(10))).mkString(" ")

  private def genHtml(family: String, rng: Rng, idx: Long = 0L): String = {
    val sb = new StringBuilder
    family match {
      case "plain" =>
        sb ++= "<page>"
        sb ++= s"<h1>${sentence(rng, 3)}</h1>"
        for (_ <- 0 until 2 + rng.nextInt(4)) sb ++= s"<p>${para(rng)}</p>"
        sb ++= "</page>"

      case "fontmix" =>
        sb ++= "<page>"
        sb ++= s"<h1>${sentence(rng, 3)}</h1>"
        for (_ <- 0 until 2 + rng.nextInt(3)) {
          sb ++= "<p>"
          sb ++= sentence(rng, 5 + rng.nextInt(8))
          sb ++= s"""<span data-font-weight="700">${sentence(rng, 3)}</span>"""
          sb ++= sentence(rng, 4 + rng.nextInt(6))
          sb ++= s"""<span data-font-size="14" data-font-name="Serif">${sentence(rng, 4)}</span>"""
          sb ++= "</p>"
        }
        sb ++= "</page>"

      case "headings" =>
        sb ++= "<page>"
        val levels = 3 + rng.nextInt(38) // 3..40 titles per doc
        for (k <- 0 until levels) {
          val h = 1 + (k % 6)
          sb ++= s"<h$h>${sentence(rng, 2 + rng.nextInt(4))}</h$h>"
          if (rng.nextInt(3) == 0) sb ++= s"<p>${para(rng, 1, 2)}</p>"
        }
        sb ++= "</page>"

      case "lists" =>
        sb ++= "<page>"
        sb ++= s"<h2>${sentence(rng, 3)}</h2>"
        val bullets = Vector("• ", "● ", "– ", "")
        for (_ <- 0 until 1 + rng.nextInt(3)) {
          sb ++= "<ul>"
          for (_ <- 0 until 2 + rng.nextInt(5)) {
            val b = bullets(rng.nextInt(bullets.length))
            sb ++= s"<li>$b${sentence(rng, 3 + rng.nextInt(6))}</li>"
          }
          sb ++= "</ul>"
          sb ++= s"<p>${para(rng, 1, 2)}</p>"
        }
        sb ++= "</page>"

      case "figures" =>
        sb ++= "<page>"
        sb ++= s"<p>${para(rng)}</p>"
        rng.nextInt(4) match {
          case 0 => // image then caption below
            sb ++= s"<figure><figcaption>Figure 1: ${sentence(rng, 4)}</figcaption></figure>"
          case 1 => // caption above the picture
            sb ++= s"""<figure data-capfirst="1"><figcaption>Figure 1: ${sentence(rng, 4)}</figcaption></figure>"""
          case 2 => // bare picture (caption-less image)
            sb ++= "<figure></figure>"
          case _ => // orphan caption far from any picture
            sb ++= s"<p>${para(rng, 1, 2)}</p>"
            sb ++= s"<figure></figure><p>${para(rng, 1, 2)}</p>"
        }
        sb ++= s"<p>${para(rng)}</p>"
        sb ++= "</page>"

      case "chrome" =>
        sb ++= "<page>"
        sb ++= s"<header>${sentence(rng, 4)}</header>"
        sb ++= s"<nav>Home | About | ${sentence(rng, 6)} | Subscribe | Cookie notice</nav>"
        sb ++= s"<h1>${sentence(rng, 3)}</h1>"
        for (_ <- 0 until 2 + rng.nextInt(3)) sb ++= s"<p>${para(rng)}</p>"
        sb ++= s"<nav>${sentence(rng, 8)} advertisement sidebar links</nav>"
        sb ++= s"<footer>page ${1 + rng.nextInt(40)} copyright</footer>"
        sb ++= "</page>"

      case "sparse" =>
        // image-only / near-empty: exercises need_ocr=true (zero text-layout area)
        sb ++= "<page><figure></figure>"
        if (rng.nextInt(2) == 0) sb ++= "<figure data-width=\"120\" data-height=\"80\"></figure>"
        sb ++= "</page>"

      case "tables" =>
        sb ++= "<page>"
        sb ++= s"<h2>${sentence(rng, 3)}</h2>"
        sb ++= "<table>"
        for (r <- 0 until 2 + rng.nextInt(4)) {
          sb ++= s"<tr><td>Q$r</td><td>${rng.nextInt(1000)}</td><td>${sentence(rng, 2)}</td></tr>"
        }
        sb ++= "</table>"
        sb ++= s"<p>${para(rng)}</p>"
        sb ++= "</page>"

      case "overlap" =>
        // ghost boxes exercise NMS (relaxed IoU 0.7) + merge_remaining
        sb ++= "<page>"
        sb ++= s"<p>${para(rng)}</p>"
        sb ++= """<ghost label="Picture" x0="36" y0="400" x1="336" y1="550" proba="0.95"/>"""
        sb ++= """<ghost label="Picture" x0="40" y0="405" x1="330" y1="545" proba="0.85"/>"""
        sb ++= """<ghost label="Text" x0="350" y0="400" x1="560" y1="500" proba="0.6"/>"""
        sb ++= s"<p>${para(rng, 1, 2)}</p>"
        sb ++= "</page>"

      case "mojibake" =>
        sb ++= "<page>"
        sb ++= s"<h1>${sentence(rng, 3)}</h1>"
        for (_ <- 0 until 2) {
          val w = MojibakeWords(rng.nextInt(MojibakeWords.length))
          sb ++= s"<p>${sentence(rng, 4)} $w ${sentence(rng, 4)}</p>"
        }
        sb ++= "</page>"

      case "entity" =>
        // Damaged spellings as they sit in crawl HTML. The parser's markup
        // decode (HtmlFront) unescapes one &amp; level while reading text
        // nodes, so a k-times-escaped source reaches fix_text (k-1)-times
        // escaped; the deepest form here exercises two fixpoint rounds.
        val damaged = Vector(
          "caf&eacute;",        // named ref left in text
          "caf&#233;",          // numeric decimal
          "&#xE9;cole",         // numeric hex
          "&amp;amp;eacute;clair", // reaches fix_text as &amp;eacute; (2 rounds)
          "&amp;#233;tude",     // reaches fix_text as &#233;tude
          "se&ntilde;or",       "&laquo;quoted&raquo;",
          "em&mdash;dash",      "price&nbsp;&euro;9",
          "AT&T; stays",        // not a defined entity: untouched
          "&unknown; stays",    // unknown name: untouched
          "5 &#xD800; stays"    // surrogate ref: invalid, untouched
        )
        sb ++= "<page>"
        sb ++= s"<h1>${sentence(rng, 3)}</h1>"
        for (_ <- 0 until 3) {
          val w = damaged(rng.nextInt(damaged.length))
          sb ++= s"<p>${sentence(rng, 4)} $w ${sentence(rng, 4)}</p>"
        }
        // trailing paragraph so the damaged lines are never the page's final
        // (unfixed) line
        sb ++= s"<p>${para(rng, 1, 2)}</p>"
        sb ++= "</page>"

      case "c1ref" =>
        // cp1252-byte numeric refs as Word-exported HTML carries them; the
        // parser's one-level &amp; unescape means the double-escaped form
        // reaches fix_text one level shallower (two fixpoint rounds)
        val damaged = Vector(
          "&#147;quoted&#148;", // -> U+201C / U+201D
          "wait&#133; more",    // -> U+2026
          "em&#151;dash",       // -> U+2014
          "&#128;9 deal",       // -> U+20AC
          "&amp;#146;s day",    // reaches fix_text as &#146;s -> U+2019
          "&#x92;s hex",        // hex form -> U+2019
          "&#153; brand",       // -> U+2122
          "&#129; survives",    // undefined slot: U+0081 passes through
          "&#159;-umlaut",      // -> U+0178
          "&#141; also stays"   // undefined slot: U+008D passes through
        )
        sb ++= "<page>"
        sb ++= s"<h1>${sentence(rng, 3)}</h1>"
        for (_ <- 0 until 3) {
          val w = damaged(rng.nextInt(damaged.length))
          sb ++= s"<p>${sentence(rng, 4)} $w ${sentence(rng, 4)}</p>"
        }
        // trailing paragraph so damaged lines are never the page's final
        // (unfixed) line
        sb ++= s"<p>${para(rng, 1, 2)}</p>"
        sb ++= "</page>"

      case "mixed" =>
        // Mixed lines as the wild serves them: correct typographic or
        // accented chars NEXT TO cp1252 mojibake on the same line. The
        // whole-string undo guards reject these (clean é = invalid UTF-8
        // byte), so only the segment fallback can repair the damaged runs
        // — and the lookalikes pin that it never fires on clean text.
        val damaged = Vector(
          "café â€™quotedâ€™",        // clean é + damaged curly quotes
          "â€œstartâ€ é end",   // damage at start, clean é after
          "é naÃ¯ve â‚¬9",            // two damaged runs astride a clean é
          "über â€“ dash",            // clean ü + damaged en-dash
          "ÃƒÂ© é double",            // double-encoded é next to a clean é
          "Ã test é",                 // lead-shaped lookalike: untouched
          "é Ã",                      // trailing incomplete lead: untouched
          "¿Cómo? â€¦",               // clean Spanish + damaged ellipsis
          "Ärger â„¢ mark",           // clean Ä + damaged trade mark
          "caf&eacute; â€™ mix"       // entity + segment repairs compose
        )
        sb ++= "<page>"
        sb ++= s"<h1>${sentence(rng, 3)}</h1>"
        for (_ <- 0 until 3) {
          val w = damaged(rng.nextInt(damaged.length))
          sb ++= s"<p>${sentence(rng, 4)} $w ${sentence(rng, 4)}</p>"
        }
        // trailing paragraph so the damaged lines are never the page's
        // final (unfixed) line
        sb ++= s"<p>${para(rng, 1, 2)}</p>"
        sb ++= "</page>"

      case "edge" =>
        (idx % 10) match {
          case 0 => // single-char document
            sb ++= "<page><p>x</p></page>"
          case 1 => // deep span nesting (inline font overrides stacked)
            val depth = 300
            sb ++= "<page><h1>deep</h1><p>"
            for (d <- 0 until depth)
              sb ++= (if (d % 2 == 0) """<span data-font-weight="700">"""
              else """<span data-font-size="11">""")
            sb ++= "pit"
            for (_ <- 0 until depth) sb ++= "</span>"
            sb ++= s" ${sentence(rng, 3)}</p></page>"
          case 2 => // every block in the footer band: body partition empty
            sb ++= "<page>"
            sb ++= s"<footer>${sentence(rng, 4)}</footer>"
            sb ++= s"<footer>${sentence(rng, 3)}</footer>"
            sb ++= "</page>"
          case 3 => // zero-area and hairline ghost boxes amid normal text
            sb ++= "<page>"
            sb ++= s"<p>${para(rng, 1, 2)}</p>"
            sb ++= """<ghost label="Text" x0="100" y0="300" x1="100" y1="300" proba="0.9"/>"""
            sb ++= """<ghost label="Picture" x0="200" y0="310" x1="200" y1="400" proba="0.8"/>"""
            sb ++= """<ghost label="Text" x0="36" y0="500" x1="576" y1="500" proba="0.7"/>"""
            sb ++= s"<p>${para(rng, 1, 2)}</p>"
            sb ++= "</page>"
          case 4 => // empty page followed by a content page
            sb ++= "<page></page>"
            sb ++= s"<page><h1>${sentence(rng, 2)}</h1><p>${para(rng)}</p></page>"
          case 5 => // whitespace-only blocks around one real paragraph
            sb ++= "<page>"
            sb ++= "<p>   </p>"
            sb ++= s"<p>${para(rng, 1, 2)}</p>"
            sb ++= "<p> \t </p>"
            sb ++= "</page>"
          case 6 => // one unbreakable 1500-char word: overflows every line
            sb ++= "<page><h2>long</h2><p>"
            sb ++= "x" * 1500
            sb ++= s" ${sentence(rng, 4)}</p></page>"
          case 7 => // many near-empty pages (page loop + per-page folds)
            for (p <- 0 until 40)
              sb ++= s"<page><p>p$p</p></page>"
          case 8 => // empty table cells, bare figure, empty list items
            sb ++= "<page>"
            sb ++= "<table><tr><td></td><td>a</td></tr><tr><td></td><td></td></tr></table>"
            sb ++= "<figure></figure>"
            sb ++= s"<ul><li></li><li>${sentence(rng, 2)}</li><li></li></ul>"
            sb ++= "</page>"
          case _ => // degenerate probabilities + far out-of-page ghost boxes
            sb ++= "<page>"
            sb ++= s"<p>${para(rng, 1, 2)}</p>"
            sb ++= """<ghost label="Text" x0="36" y0="300" x1="300" y1="360" proba="1.0"/>"""
            sb ++= """<ghost label="Text" x0="37" y0="301" x1="301" y1="361" proba="0.0"/>"""
            sb ++= """<ghost label="Picture" x0="-50" y0="-50" x1="-10" y1="-10" proba="0.9"/>"""
            sb ++= """<ghost label="Text" x0="1000" y0="1000" x1="2000" y1="2000" proba="0.9"/>"""
            sb ++= "</page>"
        }

      case "nolb" =>
        // no injected linebreak chars: lines break only on the y-jump check
        sb ++= "<page data-nolb=\"1\">"
        sb ++= s"<h1>${sentence(rng, 3)}</h1>"
        for (_ <- 0 until 2 + rng.nextInt(3)) sb ++= s"<p>${para(rng, 1, 2)}</p>"
        sb ++= "</page>"

      case "skew" =>
        // Pareto-ish body size: many small docs, a heavy tail of giants
        val u = rng.nextDouble()
        val paras = math.min(4000, math.max(2, (2.0 / math.pow(1.0 - u, 1.3)).toInt))
        val pages = 1 + paras / 60
        for (p <- 0 until pages) {
          sb ++= "<page>"
          sb ++= s"<h1>${sentence(rng, 3)}</h1>"
          for (_ <- 0 until math.min(paras - p * 60, 60)) sb ++= s"<p>${para(rng, 1, 3)}</p>"
          sb ++= "</page>"
        }

      case "ocr" =>
        // scanned page: the layout model still sees text regions on the
        // raster (ghost boxes), pdfium yields no chars, and the OCR engine
        // supplies the lines — the page.rs:81-91 replace-native branch
        sb ++= "<page>"
        sb ++= """<ghost label="Title" x0="36" y0="80" x1="400" y1="112" proba="0.97"/>"""
        sb ++= s"""<ocr x0="40" y0="84" x1="380" y1="108">${sentence(rng, 3)}</ocr>"""
        val nRegions = 1 + rng.nextInt(3)
        for (r <- 0 until nRegions) {
          val top = 130 + r * 170
          sb ++= s"""<ghost label="Text" x0="36" y0="$top" x1="576" y1="${top + 140}" proba="0.9"/>"""
          for (l <- 0 until 3 + rng.nextInt(4)) {
            val y0 = top + 6 + l * 18
            sb ++= s"""<ocr x0="40" y0="$y0" x1="560" y1="${y0 + 12}">${sentence(rng, 6 + rng.nextInt(6))}</ocr>"""
          }
        }
        sb ++= "</page>"

      case "twocol" =>
        // two-column article: column 0 blocks first (reading order), then
        // column 1 — exercises the x-weighted distance assignment
        sb ++= "<page>"
        sb ++= s"<h1>${sentence(rng, 3)}</h1>"
        for (_ <- 0 until 2 + rng.nextInt(3))
          sb ++= s"""<p data-col="0">${para(rng, 1, 2)}</p>"""
        for (_ <- 0 until 2 + rng.nextInt(3))
          sb ++= s"""<p data-col="1">${para(rng, 1, 2)}</p>"""
        sb ++= "</page>"

      case other => throw new IllegalArgumentException(s"unknown family $other")
    }
    sb.toString
  }

  private def stripTags(html: String): String = {
    val sb = new StringBuilder
    var inTag = false
    html.foreach {
      case '<' => inTag = true
      case '>' => inTag = false; sb += ' '
      case c if !inTag => sb += c
      case _ =>
    }
    sb.toString.trim
  }

  /** Distributed corpus: one row per index in [0, n). */
  def generate(spark: SparkSession, n: Long, seed: Long = 42L,
      partitions: Int = 32): Dataset[PageRow] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).mapPartitions(_.map(i => genDoc(i, seed)))
  }
}
