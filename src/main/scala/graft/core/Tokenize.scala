package graft.core

import scala.collection.mutable.ArrayBuffer

/** T3/T4: char → CharSpan → Line folds.
  *
  * Order-dependent sequential folds, re-derived from
  * /root/reference/ferrules-core/src/parse/native.rs:16-57 and
  * /root/reference/ferrules-core/src/entities.rs:265-363. These are pure
  * per-page functions; they never see a shuffle.
  */
object Tokenize {

  /** Run-length group chars by (fontSize, fontName, fontWeight, rotation).
    * First char seeds the span with its tight bounds; appended chars merge
    * their loose bounds (native.rs:16-39, entities.rs:265-300).
    */
  def parseTextSpans(chars: Iterable[PChar]): Vector[CharSpan] = {
    val stream = new SpanStream
    chars.foreach(stream.feed)
    stream.result()
  }

  /** Streaming form of the T3 fold: chars are fed one at a time and only the
    * folded spans are retained. This is what the front-end uses — a page
    * never materializes its char stream (a 1 MB document would otherwise
    * hold ~1M char objects in flight per task, which wrecks GC at high
    * parallelism). `feedRaw` is the allocation-free fast path: the common
    * case (char appends to the current span) allocates nothing — text is
    * appended straight from the source CharSequence and the bbox merge is
    * four float compares.
    */
  final class SpanStream {
    private val spans = ArrayBuffer.empty[SpanBuilder]

    def feed(c: PChar): Unit =
      feedRaw(c.text, 0, c.text.length, c.fontName, c.fontSize, c.fontWeight,
        c.rotation, c.tight.x0, c.tight.y0, c.tight.x1, c.tight.y1,
        c.loose.x0, c.loose.y0, c.loose.x1, c.loose.y1, c.index)

    /** Feed one char given as a slice of `src`. Tight bounds seed a new
      * span; loose bounds merge on append (entities.rs:265-300).
      */
    def feedRaw(src: CharSequence, from: Int, until: Int,
        fontName: String, fontSize: Float, fontWeight: Int, rotation: Float,
        tx0: Float, ty0: Float, tx1: Float, ty1: Float,
        lx0: Float, ly0: Float, lx1: Float, ly1: Float, index: Int): Unit = {
      if (spans.nonEmpty && spans.last.tryAppendRaw(src, from, until, fontName,
          fontSize, fontWeight, rotation, lx0, ly0, lx1, ly1, index)) ()
      else spans += SpanBuilder.fromRaw(src, from, until, fontName, fontSize,
        fontWeight, rotation, tx0, ty0, tx1, ty1, index)
    }

    def result(): Vector[CharSpan] = spans.iterator.map(_.build).toVector
  }

  private final class SpanBuilder(
      var x0: Float, var y0: Float, var x1: Float, var y1: Float,
      val text: java.lang.StringBuilder,
      val rotation: Float,
      val fontName: String,
      val fontSize: Float,
      val fontWeight: Int,
      val charStartIdx: Int,
      var charEndIdx: Int
  ) {
    /** entities.rs:282-300: reject on any font/rotation mismatch. */
    def tryAppendRaw(src: CharSequence, from: Int, until: Int,
        fn: String, fs: Float, fw: Int, rot: Float,
        lx0: Float, ly0: Float, lx1: Float, ly1: Float, index: Int): Boolean =
      if (fs != fontSize || fn != fontName || fw != fontWeight || rot != rotation) false
      else {
        text.append(src, from, until)
        charEndIdx = index
        if (lx0 < x0) x0 = lx0
        if (ly0 < y0) y0 = ly0
        if (lx1 > x1) x1 = lx1
        if (ly1 > y1) y1 = ly1
        true
      }

    def build: CharSpan =
      CharSpan(BBox(x0, y0, x1, y1), text.toString, rotation, fontName,
        fontSize, fontWeight, charStartIdx, charEndIdx)
  }

  private object SpanBuilder {
    def fromRaw(src: CharSequence, from: Int, until: Int,
        fn: String, fs: Float, fw: Int, rot: Float,
        tx0: Float, ty0: Float, tx1: Float, ty1: Float, index: Int): SpanBuilder = {
      val sb = new java.lang.StringBuilder(math.max(16, until - from))
      sb.append(src, from, until)
      new SpanBuilder(tx0, ty0, tx1, ty1, sb, rot, fn, fs, fw, index, index)
    }
  }

  /** Accumulate spans into lines. A line breaks when the incoming span has a
    * different rotation, starts below the line (`span.y0 > line.y1`), or its
    * text ends with "\n" / "" (entities.rs:343-362). On a break the
    * *finished* line's text is passed through [[FixText.fixText]]
    * (entities.rs:349); the page's final line is never fixed (no break fires
    * for it). A zero-area line bbox (the previous span was a linebreak char)
    * is replaced by the incoming span's bbox rather than merged
    * (entities.rs:352-356).
    */
  def parseTextLines(spans: Iterable[CharSpan]): Vector[Line] = {
    val lines = ArrayBuffer.empty[LineBuilder]
    val it = spans.iterator
    while (it.hasNext) {
      val span = it.next()
      if (lines.isEmpty) lines += LineBuilder.from(span)
      else {
        val line = lines.last
        if (span.rotation != line.rotation ||
          span.bbox.y0 > line.bbox.y1 ||
          span.text.endsWith("\n") || span.text.endsWith("\u0002")) {
          line.finish() // fix_text on the completed line
          lines += LineBuilder.from(span)
        } else {
          if (line.bbox.isZeroArea) line.bbox = span.bbox
          else line.bbox = line.bbox.merge(span.bbox)
          line.text.append(span.text)
          line.spans += span
        }
      }
    }
    lines.iterator.map(_.build).toVector
  }

  private final class LineBuilder(
      var text: java.lang.StringBuilder,
      var bbox: BBox,
      val rotation: Float,
      val spans: ArrayBuffer[CharSpan]
  ) {
    private var fixed: Option[String] = None
    def finish(): Unit = fixed = Some(FixText.fixText(text.toString))
    def build: Line =
      Line(fixed.getOrElse(text.toString), bbox, rotation, spans.toVector)
  }

  private object LineBuilder {
    def from(span: CharSpan): LineBuilder =
      new LineBuilder(new java.lang.StringBuilder(span.text), span.bbox,
        span.rotation, ArrayBuffer(span))
  }
}
