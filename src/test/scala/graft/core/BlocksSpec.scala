package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Ports of the reference block-grouping tests (merge.rs:441-775).
  *
  * `test_merge_adjacent_text_blocks` (merge.rs:510-540) is corrected to
  * shipped behavior: the adjacent-Text merge is commented out in the
  * reference (merge.rs:219-231, ROADMAP.md:34 unchecked), so two adjacent
  * Text elements produce TWO TextBlocks — documented in SURVEY.md section 5.
  */
class BlocksSpec extends AnyFunSuite {

  private def el(id: Int, pageId: Int, kind: ElementType, text: String, bbox: BBox) =
    new Element(id, 0, kind, pageId, text, bbox)

  private val b1 = BBox(0f, 0f, 2f, 2f)
  private val b2 = BBox(0f, 2.1f, 2f, 4.1f)

  test("adjacent text blocks NOT merged (shipped behavior, merge.rs:219-231)") {
    val blocks = Blocks.mergeElementsIntoBlocks(Vector(
      el(0, 1, ElementType.Text, "First paragraph", b1),
      el(1, 1, ElementType.Text, "Second paragraph", b2)
    ), Map.empty)
    assert(blocks.length == 2)
    assert(blocks(0).kind == BlockKind.TextBlock("First paragraph"))
    assert(blocks(1).kind == BlockKind.TextBlock("Second paragraph"))
  }

  test("merge list items (merge.rs:542-574)") {
    val blocks = Blocks.mergeElementsIntoBlocks(Vector(
      el(0, 1, ElementType.ListItem, "First item", b1),
      el(1, 1, ElementType.ListItem, "Second item", b2),
      el(2, 1, ElementType.Text, "Random text", b2)
    ), Map.empty)
    assert(blocks.length == 2)
    blocks(0).kind match {
      case BlockKind.ListBlock(items) =>
        assert(items == Vector("First item", "Second item"))
      case other => fail(s"expected ListBlock, got $other")
    }
  }

  test("caption followed by image (merge.rs:576-605)") {
    val blocks = Blocks.mergeElementsIntoBlocks(Vector(
      el(0, 1, ElementType.Caption, "Image caption", b1),
      el(1, 1, ElementType.Image, "", b2)
    ), Map.empty)
    assert(blocks.length == 1)
    assert(blocks(0).kind == BlockKind.Image(0, Some("Image caption")))
    assert(blocks(0).bbox == BBox(0f, 0f, 2f, 4.1f)) // merged
  }

  test("orphan caption becomes text (merge.rs:607-627)") {
    val blocks = Blocks.mergeElementsIntoBlocks(Vector(
      el(0, 1, ElementType.Caption, "Orphan caption", b1)
    ), Map.empty)
    assert(blocks.length == 1)
    assert(blocks(0).kind == BlockKind.TextBlock("Orphan caption"))
  }

  test("distant text blocks not merged (merge.rs:629-653)") {
    val far = BBox(0f, 20f, 2f, 22f)
    val blocks = Blocks.mergeElementsIntoBlocks(Vector(
      el(0, 1, ElementType.Text, "First paragraph", b1),
      el(1, 1, ElementType.Text, "Distant paragraph", far)
    ), Map.empty)
    assert(blocks.length == 2)
  }

  test("image as last element (merge.rs:655-675)") {
    val blocks = Blocks.mergeElementsIntoBlocks(Vector(
      el(0, 1, ElementType.Image, "", b1)
    ), Map.empty)
    assert(blocks.length == 1)
    assert(blocks(0).kind == BlockKind.Image(0, None))
  }

  test("image with following caption (merge.rs:677-706)") {
    val blocks = Blocks.mergeElementsIntoBlocks(Vector(
      el(0, 1, ElementType.Image, "", b1),
      el(1, 1, ElementType.Caption, "Image Description", b2)
    ), Map.empty)
    assert(blocks.length == 1)
    assert(blocks(0).kind == BlockKind.Image(0, Some("Image Description")))
  }

  test("image with following non-caption (merge.rs:708-743)") {
    val blocks = Blocks.mergeElementsIntoBlocks(Vector(
      el(0, 1, ElementType.Image, "", b1),
      el(1, 1, ElementType.Text, "Regular text", b2)
    ), Map.empty)
    assert(blocks.length == 2)
    assert(blocks(0).kind == BlockKind.Image(0, None))
    assert(blocks(1).kind == BlockKind.TextBlock("Regular text"))
  }

  test("image with footnote as caption (merge.rs:745-774)") {
    val blocks = Blocks.mergeElementsIntoBlocks(Vector(
      el(0, 1, ElementType.Image, "", b1),
      el(1, 1, ElementType.FootNote, "Image Footnote", b2)
    ), Map.empty)
    assert(blocks.length == 1)
    assert(blocks(0).kind == BlockKind.Image(0, Some("Image Footnote")))
  }

  test("consecutive captions concatenate space-joined then pair (merge.rs:276-299)") {
    val blocks = Blocks.mergeElementsIntoBlocks(Vector(
      el(0, 1, ElementType.Caption, "Part one", b1),
      el(1, 1, ElementType.Caption, "part two", b1),
      el(2, 1, ElementType.Image, "", b2)
    ), Map.empty)
    assert(blocks.length == 1)
    assert(blocks(0).kind == BlockKind.Image(0, Some("Part one part two")))
  }

  test("image block pages_id comes from the image element (merge.rs:292)") {
    val blocks = Blocks.mergeElementsIntoBlocks(Vector(
      el(0, 3, ElementType.Caption, "cap", b1),
      el(1, 4, ElementType.Image, "", b2)
    ), Map.empty)
    assert(blocks(0).pagesId == Vector(4))
  }

  test("headers/footers merge with bare concat (blocks.rs:83,92)") {
    val blocks = Blocks.mergeElementsIntoBlocks(Vector(
      el(0, 1, ElementType.Header, "Left", b1),
      el(1, 1, ElementType.Header, "Right", b2),
      el(2, 1, ElementType.Footer, "page ", b1),
      el(3, 1, ElementType.Footer, "1", b2)
    ), Map.empty)
    assert(blocks.length == 2)
    assert(blocks(0).kind == BlockKind.Header("LeftRight"))
    assert(blocks(1).kind == BlockKind.Footer("page 1"))
  }

  test("title level from map, default 0 (merge.rs:417-432)") {
    val blocks = Blocks.mergeElementsIntoBlocks(Vector(
      el(7, 2, ElementType.Title, "Big", b1),
      el(8, 2, ElementType.Subtitle, "Small", b2)
    ), Map((2, 7) -> 1))
    assert(blocks(0).kind == BlockKind.Title(1, "Big"))
    assert(blocks(1).kind == BlockKind.Title(0, "Small"))
  }

  test("table elements silently skipped (merge.rs:433-435)") {
    val blocks = Blocks.mergeElementsIntoBlocks(Vector(
      el(0, 1, ElementType.Text, "before", b1),
      el(1, 1, ElementType.Table, "cell text", b2),
      el(2, 1, ElementType.Text, "after", b2)
    ), Map.empty)
    assert(blocks.length == 2)
    assert(blocks.map(_.id) == Vector(0, 1)) // block ids stay sequential
  }

  test("list item texts are trimmed on merge only (blocks.rs:73)") {
    val blocks = Blocks.mergeElementsIntoBlocks(Vector(
      el(0, 1, ElementType.ListItem, "  first  ", b1),
      el(1, 1, ElementType.ListItem, "  second  ", b2)
    ), Map.empty)
    blocks(0).kind match {
      // first item is pushed raw (merge.rs:238-240), merged ones trimmed
      case BlockKind.ListBlock(items) => assert(items == Vector("  first  ", "second"))
      case other => fail(s"$other")
    }
  }
}
