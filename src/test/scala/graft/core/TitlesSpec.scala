package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** G2: title-level k-means (titles.rs:15-64), deterministic seeded variant. */
class TitlesSpec extends AnyFunSuite {

  private def title(id: Int, pageId: Int, height: Float) =
    new Element(id, 0, ElementType.Title, pageId, s"t$id", BBox(0f, 0f, 100f, height))

  test("n <= buckets returns empty map (titles.rs:25-27)") {
    val titles = (0 until 6).map(i => title(i, 0, 10f + i))
    assert(Titles.titleLevelsKmeans(titles, 6, 42L).isEmpty)
  }

  test("distinct height tiers map to increasing levels") {
    // Heights: 3 tiers well separated by more than the 0.7 ratio.
    val titles =
      (0 until 4).map(i => title(i, 0, 24f)) ++
        (4 until 8).map(i => title(i, 0, 14f)) ++
        (8 until 12).map(i => title(i, 0, 8f))
    val levels = Titles.titleLevelsKmeans(titles, 6, 42L)
    assert(levels.size == 12)
    val l24 = (0 until 4).map(i => levels((0, i))).distinct
    val l14 = (4 until 8).map(i => levels((0, i))).distinct
    val l8 = (8 until 12).map(i => levels((0, i))).distinct
    assert(l24.length == 1 && l14.length == 1 && l8.length == 1)
    // biggest titles get the smallest level, starting at 1
    assert(l24.head == 1)
    assert(l24.head < l14.head && l14.head < l8.head)
  }

  test("centroids within 0.7 ratio share a level (titles.rs:47-56)") {
    // two tiers whose heights are within 0.7x of each other -> same level
    val titles =
      (0 until 5).map(i => title(i, 0, 20f)) ++
        (5 until 10).map(i => title(i, 0, 18f)) // 18 >= 20*0.7=14 -> same level
    val levels = Titles.titleLevelsKmeans(titles, 2, 7L)
    assert(levels.values.toSet.size == 1)
    assert(levels.values.head == 1)
  }

  test("deterministic: same seed, same result; different docs may differ") {
    val titles = (0 until 20).map(i => title(i, 0, 8f + (i % 7) * 3f))
    val a = Titles.titleLevelsKmeans(titles, 6, 123L)
    val b = Titles.titleLevelsKmeans(titles, 6, 123L)
    assert(a == b)
  }

  test("kmeans handles duplicate samples without NaN") {
    val samples = Array.fill(10)(12f)
    val (centroids, assignments) = Titles.kmeansLloyd(samples, 6, 99L)
    assert(centroids.forall(c => !c.isNaN))
    assert(assignments.forall(a => a >= 0 && a < 6))
  }
}
