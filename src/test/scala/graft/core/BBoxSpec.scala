package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Ports of the reference's BBox tests (entities.rs:365-553). */
class BBoxSpec extends AnyFunSuite {

  val bbox1 = BBox(0f, 0f, 2f, 2f)
  val bbox2 = BBox(1f, 1f, 3f, 3f)
  val bbox3 = BBox(2f, 2f, 4f, 4f)
  val bbox4 = BBox(3f, 3f, 5f, 5f) // no overlap
  val bbox5 = BBox(-1f, -1f, 1f, 1f) // negative coordinates
  val bbox6 = BBox(0.5f, 0.5f, 1.5f, 1.5f) // inside bbox1

  test("intersection (entities.rs:369-419)") {
    assert(bbox1.intersection(bbox3) == 0.0f)
    assert(bbox1.intersection(bbox4) == 0.0f) // adjacent
    assert(bbox5.intersection(bbox1) == 1.0f)
    assert(bbox1.intersection(bbox2) == 1.0f)
    assert(bbox1.intersection(bbox6) == bbox6.area)
    assert(bbox1.intersection(bbox1) == bbox1.area)
  }

  test("union (entities.rs:421-464)") {
    assert(bbox1.union(bbox3) == 8.0f)
    assert(bbox1.union(bbox4) == 8.0f)
    assert(bbox5.union(bbox1) == 7.0f)
    assert(bbox1.union(bbox2) == 7.0f)
    assert(bbox1.union(bbox1) == bbox1.area)
  }

  test("iou (entities.rs:466-510)") {
    assert(bbox1.iou(bbox1) == 1.0f)
    assert(bbox1.iou(bbox4) == 0.0f)
    assert(bbox1.iou(bbox3) == 0.0f)
    assert(bbox1.iou(bbox2) == 1.0f / 7.0f)
    assert(bbox1.iou(bbox6) == bbox6.area / bbox1.area)
  }

  test("distance (entities.rs:511-552)") {
    val b2 = BBox(3f, 3f, 5f, 5f)
    val b3 = BBox(0f, 2f, 2f, 4f)
    assert(bbox1.distance(b2, 1f, 1f) == 18.0f)
    assert(bbox1.distance(b3, 1f, 1f) == 4.0f)
    assert(bbox1.distance(bbox1, 1f, 1f) == 0.0f)
    assert(bbox1.distance(b2, 2f, 3f) == 45.0f)
  }

  test("merge expands, contains, relaxedIou") {
    assert(bbox1.merge(bbox3) == BBox(0f, 0f, 4f, 4f))
    assert(BBox(0f, 0f, 4f, 4f).contains(bbox2))
    assert(!bbox1.contains(bbox2))
    // relaxed IoU of a contained box is 1 (intersection / min-area)
    assert(bbox1.relaxedIou(bbox6) == 1.0f)
  }
}
