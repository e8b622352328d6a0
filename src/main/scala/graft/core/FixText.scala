package graft.core

import java.nio.charset.{CharacterCodingException, CodingErrorAction, StandardCharsets}
import java.text.Normalizer

/** Text-fixing subset applied to completed lines.
  *
  * The reference runs `plsfix::fix_text` (a Rust port of ftfy) on every line
  * the moment a line break fires (entities.rs:349) — the final line of a page
  * is never fixed because no break fires for it. Porting all of ftfy is out of
  * scope; this is the documented subset the synthetic corpus exercises, and
  * the goldens pin exactly this behavior:
  *
  *   1. CRLF / CR → LF (ftfy `fix_line_breaks` default);
  *   2. iterated to a shared fixpoint (cap 4 rounds), in ftfy's order:
  *      a. HTML-entity damage undo (ftfy `unescape_html`): numeric character
  *         references ("&#233;", "&#xE9;") and the named entities of the
  *         documented table (the HTML4 Latin-1 set, the core XML five, and
  *         the common punctuation names) decode to their characters, with
  *         the WHATWG C1 remap browsers apply: numeric refs in 0x80-0x9F
  *         ("&#147;") decode through the cp1252 graphics row (→ U+201C),
  *         not to C1 controls; unknown
  *         names and invalid numerics are left untouched. Iterating unwinds
  *         double-escapes: "&amp;eacute;" → "&eacute;" → "é";
  *      b. UTF-8-read-as-legacy-charset mojibake undo, trying
  *         windows-1252 first then Latin-1 (ftfy's `fix_encoding` order:
  *         cp1252 is the wild's most common misread and is the ONLY one
  *         that repairs curly-quote damage like "â€™" → "’", whose €-class
  *         chars aren't Latin-1-encodable at all; for the shared subset the
  *         two decode identically) — so DOUBLE and triple encodings unwind
  *         fully: "ÃÂ©" → "Ã©" → "é". Each round applies only when the
  *         whole string is encodable in the tried charset, its bytes are
  *         strict UTF-8, and the decode actually changes the string, so
  *         already-correct text is never touched and termination is
  *         guaranteed (every successful round strictly shortens the
  *         string);
  *      The two compose per round, covering mixed damage like "&amp;#233;"
  *      and entity text whose decoded bytes are themselves mojibake;
  *   3. Unicode NFC normalization (ftfy `normalization="NFC"` default).
  */
object FixText {

  def fixText(s: String): String = {
    // ONE characterization scan up front: the overwhelmingly common case is
    // a clean ASCII line, for which every repair below is an identity (NFC
    // included) — without this, each line paid three separate full scans
    // (entity, cp1252, latin-1 fast paths), measurable at extraction
    // throughput scale
    var hasCR = false
    var hasAmp = false
    var hasHigh = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\r') hasCR = true
      else if (c == '&') hasAmp = true
      else if (c >= 0x80) hasHigh = true
      i += 1
    }
    if (!hasCR && !hasAmp && !hasHigh) return s
    val lf = if (hasCR) fixLineBreaks(s) else s
    var cur = lf
    if (hasAmp || hasHigh) {
      var rounds = 0
      var changed = true
      while (changed && rounds < 4) {
        val un = unescapeEntities(cur)
        val cp = undoCp1252Mojibake(un)
        val next =
          if (cp ne un) cp
          else {
            val l1 = undoLatin1Mojibake(un)
            // MIXED lines: clean non-ASCII next to damage blocks both
            // whole-string undos ("café â€™" — the lone é byte is not
            // valid UTF-8); fall back to decoding just the
            // UTF-8-shaped runs
            if (l1 ne un) l1 else undoMojibakeSegments(un)
          }
        changed = next ne cur // every undo step returns the SAME instance on no-op
        cur = next
        rounds += 1
      }
    }
    Normalizer.normalize(cur, Normalizer.Form.NFC)
  }

  private def fixLineBreaks(s: String): String =
    if (s.indexOf('\r') < 0) s
    else s.replace("\r\n", "\n").replace('\r', '\n')

  /** Named entities this subset decodes: the XML core five, the HTML4
    * Latin-1 range (160-255, whose names are defined positionally), and the
    * common typographic names crawl text actually carries.
    */
  private val NamedEntities: Map[String, String] = {
    val latin1Names = Vector(
      "nbsp", "iexcl", "cent", "pound", "curren", "yen", "brvbar", "sect",
      "uml", "copy", "ordf", "laquo", "not", "shy", "reg", "macr", "deg",
      "plusmn", "sup2", "sup3", "acute", "micro", "para", "middot", "cedil",
      "sup1", "ordm", "raquo", "frac14", "frac12", "frac34", "iquest",
      "Agrave", "Aacute", "Acirc", "Atilde", "Auml", "Aring", "AElig",
      "Ccedil", "Egrave", "Eacute", "Ecirc", "Euml", "Igrave", "Iacute",
      "Icirc", "Iuml", "ETH", "Ntilde", "Ograve", "Oacute", "Ocirc",
      "Otilde", "Ouml", "times", "Oslash", "Ugrave", "Uacute", "Ucirc",
      "Uuml", "Yacute", "THORN", "szlig", "agrave", "aacute", "acirc",
      "atilde", "auml", "aring", "aelig", "ccedil", "egrave", "eacute",
      "ecirc", "euml", "igrave", "iacute", "icirc", "iuml", "eth", "ntilde",
      "ograve", "oacute", "ocirc", "otilde", "ouml", "divide", "oslash",
      "ugrave", "uacute", "ucirc", "uuml", "yacute", "thorn", "yuml")
    val latin1 = latin1Names.zipWithIndex.map { case (n, i) =>
      n -> (160 + i).toChar.toString
    }
    val typographic = Vector(
      "ndash" -> "–", "mdash" -> "—", "lsquo" -> "‘",
      "rsquo" -> "’", "sbquo" -> "‚", "ldquo" -> "“",
      "rdquo" -> "”", "bdquo" -> "„", "dagger" -> "†",
      "Dagger" -> "‡", "bull" -> "•", "hellip" -> "…",
      "permil" -> "‰", "prime" -> "′", "Prime" -> "″",
      "lsaquo" -> "‹", "rsaquo" -> "›", "frasl" -> "⁄",
      "euro" -> "€", "trade" -> "™", "oline" -> "‾")
    val core = Vector("amp" -> "&", "lt" -> "<", "gt" -> ">",
      "quot" -> "\"", "apos" -> "'")
    (latin1 ++ typographic ++ core).toMap
  }

  /** Decode one round of HTML character references. Strict shape
    * `&name;` / `&#ddd;` / `&#xhh;` with the terminating semicolon required
    * (the legacy no-semicolon forms are ambiguous in prose and skipped);
    * anything unrecognized — unknown name, out-of-range or surrogate code
    * point — is left byte-for-byte. Returns the SAME instance on no-op so
    * the fixpoint loop can detect stability by reference.
    */
  private[core] def unescapeEntities(s: String): String = {
    var amp = s.indexOf('&')
    if (amp < 0) return s
    // java.lang.StringBuilder explicitly: Scala's would auto-tuple the
    // 3-arg append(CharSequence, start, end) into append(Any)
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var changedAny = false
    while (amp >= 0) {
      sb.append(s, i, amp)
      i = amp
      // longest defined name is 6 chars + '#x' + 6 hex digits: cap the scan
      val semi = s.indexOf(';', amp + 1)
      val decoded =
        if (semi > amp + 1 && semi <= amp + 9) decodeRef(s.substring(amp + 1, semi))
        else None
      decoded match {
        case Some(repl) =>
          sb.append(repl)
          i = semi + 1
          changedAny = true
        case None =>
          sb.append('&')
          i = amp + 1
      }
      amp = s.indexOf('&', i)
    }
    if (!changedAny) s
    else { sb.append(s, i, s.length); sb.toString }
  }

  private def decodeRef(body: String): Option[String] =
    if (body.isEmpty) None
    else if (body.charAt(0) == '#') {
      val num = body.substring(1)
      val cp =
        try {
          if (num.nonEmpty && (num.charAt(0) == 'x' || num.charAt(0) == 'X'))
            Some(Integer.parseInt(num.substring(1), 16))
          else Some(Integer.parseInt(num, 10))
        } catch { case _: NumberFormatException => None }
      cp.filter(c => c > 0 && c <= 0x10ffff &&
          !(c >= 0xd800 && c <= 0xdfff))
        // WHATWG C1 remap (what browsers and Python's html.unescape do,
        // hence what ftfy sees): numeric refs in 0x80-0x9F were cp1252
        // bytes in the authoring tool -- "&#147;" means U+201C, not the
        // C1 control; the five cp1252-undefined slots stay as their C1
        // chars, per spec
        .map(c =>
          if (c >= 0x80 && c <= 0x9f) Cp1252Graphics.charAt(c - 0x80).toString
          else new String(Character.toChars(c)))
    } else NamedEntities.get(body)

  /** Reverse map of "sloppy windows-1252" (ftfy's codec) for the 0x80-0x9F
    * byte range: the 27 defined cp1252 graphics map back to their bytes;
    * the five undefined bytes (0x81 8D 8F 90 9D) pass through as their C1
    * control chars — which is exactly what lenient real-world decoders emit
    * for them, so e.g. "â€" (damaged ”) round-trips. All other chars
    * < 0x100 are Latin-1 identity.
    */
  /** The windows-1252 0x80-0x9F graphics row, index = byte - 0x80; the
    * five undefined bytes (0x81 8D 8F 90 9D) hold their own C1 chars.
    */
  private val Cp1252Graphics: String =
    "\u20ac\u0081\u201a\u0192\u201e\u2026\u2020\u2021\u02c6\u2030" +
      "\u0160\u2039\u0152\u008d\u017d\u008f\u0090\u2018\u2019\u201c" +
      "\u201d\u2022\u2013\u2014\u02dc\u2122\u0161\u203a\u0153\u009d" +
      "\u017e\u0178"

  private val Cp1252Reverse: Map[Char, Byte] =
    Cp1252Graphics.zipWithIndex.map { case (c, i) => c -> (0x80 + i).toByte }
      .toMap

  /** Undo exactly one round of "UTF-8 bytes decoded as windows-1252" — the
    * wild's most common misread (it is what repairs curly-quote damage:
    * "â€™" contains U+20AC/U+2122-class chars that Latin-1 cannot encode,
    * so only the cp1252 reverse mapping recovers the original bytes). Same
    * guards as the Latin-1 undo: full-string encodability, strict UTF-8,
    * decode must change the string and still carry non-ASCII.
    */
  private[core] def undoCp1252Mojibake(s: String): String = {
    var i = 0
    var hasHigh = false
    while (i < s.length && !hasHigh) {
      if (s.charAt(i) >= 0x80) hasHigh = true
      i += 1
    }
    if (!hasHigh) return s
    val bytes = new Array[Byte](s.length)
    var k = 0
    while (k < s.length) {
      val c = s.charAt(k)
      if (c < 0x80 || (c >= 0xa0 && c < 0x100)) bytes(k) = c.toByte
      else Cp1252Reverse.get(c) match {
        case Some(b) => bytes(k) = b
        case None    => return s // not sloppy-cp1252-encodable: leave untouched
      }
      k += 1
    }
    val decoder = StandardCharsets.UTF_8
      .newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try {
      val decoded = decoder.decode(java.nio.ByteBuffer.wrap(bytes)).toString
      if (decoded != s && decoded.exists(_ >= 0x80)) decoded else s
    } catch {
      case _: CharacterCodingException => s
    }
  }

  /** Sloppy-cp1252 byte for char `c`, or -1 when not encodable. */
  private def cp1252ByteOf(c: Char): Int =
    if (c < 0x80 || (c >= 0xa0 && c < 0x100)) c
    else Cp1252Reverse.get(c) match {
      case Some(b) => b & 0xff
      case None    => -1
    }

  /** Segment-wise mojibake undo for MIXED lines — applied only when the
    * whole-string undos fail (a clean standalone "é" anywhere makes the
    * full byte string invalid UTF-8, shielding damage elsewhere on the
    * line). Finds maximal runs of COMPLETE UTF-8-shaped groups — a char
    * whose sloppy-cp1252 byte is a UTF-8 lead (0xC2-0xF4) followed by
    * exactly its count of continuation-byte chars (0x80-0xBF) — and
    * strict-decodes each run in place, leaving everything around it
    * untouched. This is ftfy's tradeoff made explicit: a run of chars that
    * byte-maps to well-formed UTF-8 is assumed to BE misread UTF-8 (real
    * text where "é" is legitimately followed by two cp1252-punctuation
    * chars would be misjudged; such sequences do not occur in natural
    * prose, which is why ftfy ships the same assumption). A run that fails
    * the strict decode (overlong, surrogate, out-of-range) is left
    * byte-for-byte. Returns the SAME instance on no-op.
    */
  private[core] def undoMojibakeSegments(s: String): String = {
    var out: java.lang.StringBuilder = null
    var copied = 0
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) < 0x80) i += 1
      else {
        // try a maximal run of complete groups starting here
        val start = i
        var j = i
        var more = true
        while (more && j < s.length) {
          val b = cp1252ByteOf(s.charAt(j))
          if (b >= 0xc2 && b <= 0xf4) {
            val need = if (b < 0xe0) 1 else if (b < 0xf0) 2 else 3
            var k = 1
            var contOk = true
            while (k <= need && contOk) {
              val cb = if (j + k < s.length) cp1252ByteOf(s.charAt(j + k)) else -1
              contOk = cb >= 0x80 && cb <= 0xbf
              k += 1
            }
            if (contOk) j += need + 1 else more = false
          } else more = false
        }
        if (j > start) {
          val bytes = new Array[Byte](j - start)
          var k = start
          while (k < j) { bytes(k - start) = cp1252ByteOf(s.charAt(k)).toByte; k += 1 }
          val decoder = StandardCharsets.UTF_8
            .newDecoder()
            .onMalformedInput(CodingErrorAction.REPORT)
            .onUnmappableCharacter(CodingErrorAction.REPORT)
          try {
            val dec = decoder.decode(java.nio.ByteBuffer.wrap(bytes)).toString
            if (out == null) out = new java.lang.StringBuilder(s.length)
            out.append(s, copied, start)
            out.append(dec)
            copied = j
          } catch { case _: CharacterCodingException => () }
          i = j
        } else i += 1
      }
    }
    if (out == null) s
    else { out.append(s, copied, s.length); out.toString }
  }

  /** Undo exactly one round of "UTF-8 bytes decoded as Latin-1". */
  private[core] def undoLatin1Mojibake(s: String): String = {
    // Fast path: pure ASCII can't be mojibake.
    var i = 0
    var hasHigh = false
    while (i < s.length && !hasHigh) {
      val c = s.charAt(i)
      if (c >= 0x80) hasHigh = true
      if (c >= 0x100) return s // not Latin-1-encodable: leave untouched
      i += 1
    }
    if (!hasHigh) return s
    // Re-check full encodability (chars after the first high one).
    var j = i
    while (j < s.length) {
      if (s.charAt(j) >= 0x100) return s
      j += 1
    }
    val bytes = new Array[Byte](s.length)
    var k = 0
    while (k < s.length) { bytes(k) = s.charAt(k).toByte; k += 1 }
    val decoder = StandardCharsets.UTF_8
      .newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try {
      val decoded = decoder.decode(java.nio.ByteBuffer.wrap(bytes)).toString
      if (decoded != s && decoded.exists(_ >= 0x80)) decoded else s
    } catch {
      case _: CharacterCodingException => s
    }
  }
}
