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
  *   2. UTF-8-read-as-Latin-1 mojibake undo ("Ã©" → "é"), iterated to a
  *      fixpoint (cap 4 rounds) so DOUBLE and triple encodings — the most
  *      common real-crawl damage after single latin-1 (ftfy's `fix_encoding`
  *      also loops until stable) — unwind fully: "ÃÂ©" → "Ã©" → "é".
  *      Each round applies only when the whole string is Latin-1-encodable,
  *      its bytes are strict UTF-8, and the decode actually changes the
  *      string, so already-correct text is never touched and termination is
  *      guaranteed (every successful round strictly shortens the string);
  *   3. Unicode NFC normalization (ftfy `normalization="NFC"` default).
  */
object FixText {

  def fixText(s: String): String = {
    val lf = fixLineBreaks(s)
    var demoji = lf
    var rounds = 0
    var changed = true
    while (changed && rounds < 4) {
      val next = undoLatin1Mojibake(demoji)
      changed = next ne demoji // undo returns the SAME instance on no-op
      demoji = next
      rounds += 1
    }
    Normalizer.normalize(demoji, Normalizer.Form.NFC)
  }

  private def fixLineBreaks(s: String): String =
    if (s.indexOf('\r') < 0) s
    else s.replace("\r\n", "\n").replace('\r', '\n')

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
