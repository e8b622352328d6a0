package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Ports of the reference NMS tests (layout/model.rs:425-557) plus a
  * randomized invariant: output pairwise relaxed IoU <= threshold.
  */
class NmsSpec extends AnyFunSuite {

  private def box(id: Int, x0: Float, y0: Float, x1: Float, y1: Float, p: Float) =
    LayoutBox(id, BBox(x0, y0, x1, y1), "A", p)

  test("high overlap: contained box suppressed (model.rs:430-462)") {
    val out = Nms.nms(Seq(
      box(0, 0f, 0f, 3f, 3f, 0.85f),
      box(1, 1f, 1f, 2f, 2f, 0.95f) // fully contained in #0
    ), 0.5f)
    assert(out.length == 1)
  }

  test("no overlap keeps all (model.rs:464-506)") {
    val out = Nms.nms(Seq(
      box(0, 0f, 0f, 1f, 1f, 0.9f),
      box(1, 2f, 2f, 3f, 3f, 0.95f),
      box(2, 4f, 4f, 5f, 5f, 0.85f)
    ), 0.5f)
    assert(out.length == 3)
  }

  test("multi overlap keeps max proba (model.rs:508-556)") {
    val out = Nms.nms(Seq(
      box(0, 0f, 0f, 2f, 2f, 0.85f),
      box(1, 0.5f, 0.5f, 2f, 2f, 0.95f),
      box(2, 0f, 0f, 2f, 2f, 0.90f)
    ), 0.5f)
    assert(out.length == 1)
    assert(out.head.proba == 0.95f)
  }

  test("property: kept boxes pairwise relaxed IoU <= threshold (seeded)") {
    val rng = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val boxes = (0 until 20).map { i =>
        val x0 = rng.nextFloat() * 100f
        val y0 = rng.nextFloat() * 100f
        val w = 1f + rng.nextFloat() * 50f
        val h = 1f + rng.nextFloat() * 50f
        box(i, x0, y0, x0 + w, y0 + h, 0.01f + rng.nextFloat() * 0.99f)
      }
      val kept = Nms.nms(boxes)
      for {
        i <- kept.indices
        j <- kept.indices if i < j
      } assert(kept(i).bbox.relaxedIou(kept(j).bbox) <= Nms.IouThreshold)
    }
  }

  test("stable order: equal probas keep input order") {
    val out = Nms.nms(Seq(
      box(0, 0f, 0f, 1f, 1f, 0.9f),
      box(1, 10f, 10f, 11f, 11f, 0.9f),
      box(2, 20f, 20f, 21f, 21f, 0.9f)
    ))
    assert(out.map(_.id) == Vector(0, 1, 2))
  }
}
