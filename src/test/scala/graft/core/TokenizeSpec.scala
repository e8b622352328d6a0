package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** T3/T4 fold semantics (native.rs:16-57, entities.rs:265-363). */
class TokenizeSpec extends AnyFunSuite {

  private def ch(s: String, x: Float, y: Float, fs: Float = 12f,
      fn: String = "Sans", fw: Int = 400, rot: Float = 0f, idx: Int = 0) = {
    val bb = BBox(x, y, x + fs * 0.5f, y + fs)
    PChar(s, fn, fs, fw, rot, bb, bb, idx)
  }

  test("same-font chars fold into one span with merged bbox") {
    val chars = Seq(ch("a", 0f, 0f, idx = 0), ch("b", 6f, 0f, idx = 1), ch("c", 12f, 0f, idx = 2))
    val spans = Tokenize.parseTextSpans(chars)
    assert(spans.length == 1)
    assert(spans.head.text == "abc")
    assert(spans.head.bbox == BBox(0f, 0f, 18f, 12f))
    assert(spans.head.charStartIdx == 0 && spans.head.charEndIdx == 2)
  }

  test("font size / name / weight / rotation changes break spans (entities.rs:282-300)") {
    val chars = Seq(
      ch("a", 0f, 0f),
      ch("b", 6f, 0f, fs = 14f),
      ch("c", 13f, 0f, fs = 14f, fn = "Serif"),
      ch("d", 20f, 0f, fs = 14f, fn = "Serif", fw = 700),
      ch("e", 27f, 0f, fs = 14f, fn = "Serif", fw = 700, rot = 90f)
    )
    assert(Tokenize.parseTextSpans(chars).map(_.text) == Vector("a", "b", "c", "d", "e"))
  }

  test("span ending with newline breaks the line; finished line is fixed") {
    val spans = Vector(
      CharSpan(BBox(0f, 0f, 20f, 12f), "helloÃ©", 0f, "Sans", 12f, 400, 0, 5),
      CharSpan(BBox(20f, 0f, 20f, 0f), "\n", 0f, "", 0f, -1, 6, 6),
      CharSpan(BBox(0f, 14f, 20f, 26f), "worldÃ©", 0f, "Sans", 12f, 400, 7, 12)
    )
    val lines = Tokenize.parseTextLines(spans)
    assert(lines.length == 3)
    assert(lines(0).text == "helloé") // mojibake fixed on break
    assert(lines(1).text == "\n") // the linebreak span's own line (broken by y-jump)
    assert(lines(2).text == "worldÃ©") // final line NEVER fixed (entities.rs:349)
  }

  test("y-jump breaks lines when no linebreak char exists (entities.rs:345-346)") {
    val spans = Vector(
      CharSpan(BBox(0f, 0f, 50f, 12f), "line one", 0f, "Sans", 12f, 400, 0, 7),
      CharSpan(BBox(0f, 14.4f, 50f, 26.4f), "line two", 0f, "Serif", 12f, 400, 8, 15)
    )
    val lines = Tokenize.parseTextLines(spans)
    assert(lines.map(_.text) == Vector("line one", "line two"))
  }

  test("zero-area line bbox replaced, not merged (entities.rs:352-356)") {
    val nl = CharSpan(BBox(50f, 0f, 50f, 0f), "\n", 0f, "", 0f, -1, 0, 0)
    val real = CharSpan(BBox(0f, 0f, 50f, 12f), "text", 0f, "Sans", 12f, 400, 1, 4)
    val lines = Tokenize.parseTextLines(Vector(nl, real))
    assert(lines.length == 1)
    assert(lines.head.bbox == BBox(0f, 0f, 50f, 12f)) // replaced
    assert(lines.head.text == "\ntext")
  }

  test("rotation change breaks lines") {
    val s1 = CharSpan(BBox(0f, 0f, 10f, 12f), "a", 0f, "Sans", 12f, 400, 0, 0)
    val s2 = CharSpan(BBox(10f, 0f, 20f, 12f), "b", 90f, "Sans", 12f, 400, 1, 1)
    assert(Tokenize.parseTextLines(Vector(s1, s2)).length == 2)
  }

  test("\\u0002 span end breaks lines (entities.rs:347)") {
    val s1 = CharSpan(BBox(0f, 0f, 10f, 12f), "a\u0002", 0f, "Sans", 12f, 400, 0, 1)
    val s2 = CharSpan(BBox(10f, 0f, 20f, 12f), "b", 0f, "Sans", 12f, 400, 2, 2)
    val lines = Tokenize.parseTextLines(Vector(s1, s2))
    // s1 seeds line 0; s2 arrives, s1's line does not break on s2 (same y)…
    // but s2 itself doesn't end with  — the break fires when the
    // INCOMING span ends with the control char, so feed them reversed:
    val lines2 = Tokenize.parseTextLines(Vector(s2, s1))
    assert(lines.length == 1)  // "a\u0002" then "b": no break (incoming "b" is clean)
    assert(lines2.length == 2) // "b" then incoming "a\u0002" breaks
  }
}
