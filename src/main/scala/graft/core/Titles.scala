package graft.core

/** G2: title-level clustering.
  *
  * Re-derived from /root/reference/ferrules-core/src/parse/titles.rs:15-64:
  * samples are the bbox heights of all Title/Subtitle elements in a document;
  * n <= 6 samples means every title stays level 0 (empty map); otherwise
  * Lloyd's k-means (k=6, up to 100 iterations, kmeans++ init) clusters the
  * heights, centroids are walked in descending order and the level increments
  * whenever a centroid drops below 0.7x the previous one (level starts at 1).
  *
  * The reference's kmeans++ uses an unseeded RNG — the only nondeterminism in
  * the whole pipeline. The rebuild pins a deterministic variant: a SplitMix64
  * stream seeded from the document (the caller passes e.g. a hash of the
  * url). The goldens encode this choice (SURVEY.md section 7.3).
  */
object Titles {

  /** titles.rs:12. */
  val TitleMergeThreshold: Float = 0.7f
  /** document.rs:252 — six title buckets. */
  val TitleBuckets: Int = 6
  val MaxIterations: Int = 100

  /** Deterministic SplitMix64 PRNG. */
  private final class SplitMix64(private var state: Long) {
    def nextLong(): Long = {
      state += 0x9e3779b97f4a7c15L
      var z = state
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    /** Uniform double in [0, 1). */
    def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16
    /** Uniform int in [0, bound). */
    def nextInt(bound: Int): Int = ((nextLong() >>> 1) % bound).toInt
  }

  /** Returns (pageId, elementId) -> level. Empty map when n <= buckets. */
  def titleLevelsKmeans(
      titles: Seq[Element],
      titleBuckets: Int,
      seed: Long
  ): Map[(Int, Int), Int] = {
    val samples: Array[Float] = titles.map(_.bbox.height).toArray
    val n = samples.length
    if (n <= titleBuckets) return Map.empty

    val (centroids, assignments) = kmeansLloyd(samples, titleBuckets, seed)

    // Centroids sorted descending, then the 0.7-gap walk (titles.rs:39-56).
    val sortedIdx = centroids.indices.sortBy(i => -centroids(i))
    val mapping = new Array[Int](centroids.length)
    var level = 1
    var prevVal = centroids(sortedIdx.head)
    for (cIdx <- sortedIdx) {
      val v = centroids(cIdx)
      if (v < prevVal * TitleMergeThreshold) level += 1
      mapping(cIdx) = level
      prevVal = v
    }

    titles.iterator.zipWithIndex.map { case (el, i) =>
      (el.pageId, el.id) -> mapping(assignments(i))
    }.toMap
  }

  /** 1-D Lloyd's k-means with kmeans++ init, deterministic given `seed`.
    * Empty clusters keep their previous centroid. Ties in nearest-centroid
    * assignment go to the lowest centroid index.
    */
  private[core] def kmeansLloyd(
      samples: Array[Float],
      k: Int,
      seed: Long
  ): (Array[Float], Array[Int]) = {
    val n = samples.length
    val rng = new SplitMix64(seed)
    val centroids = new Array[Float](k)

    // kmeans++: first centroid uniform, then proportional to squared distance.
    centroids(0) = samples(rng.nextInt(n))
    val d2 = new Array[Double](n)
    var c = 1
    while (c < k) {
      var total = 0.0
      var i = 0
      while (i < n) {
        var best = Double.MaxValue
        var j = 0
        while (j < c) {
          val d = (samples(i) - centroids(j)).toDouble
          val dd = d * d
          if (dd < best) best = dd
          j += 1
        }
        d2(i) = best
        total += best
        i += 1
      }
      if (total == 0.0) {
        // all points coincide with existing centroids
        centroids(c) = samples(rng.nextInt(n))
      } else {
        val target = rng.nextDouble() * total
        var acc = 0.0
        var pick = n - 1
        var m = 0
        var found = false
        while (m < n && !found) {
          acc += d2(m)
          if (acc >= target) { pick = m; found = true }
          m += 1
        }
        centroids(c) = samples(pick)
      }
      c += 1
    }

    // Lloyd iterations.
    val assignments = new Array[Int](n)
    var iter = 0
    var changed = true
    while (iter < MaxIterations && changed) {
      changed = false
      var i = 0
      while (i < n) {
        var best = 0
        var bestD = Float.MaxValue
        var j = 0
        while (j < k) {
          val d = samples(i) - centroids(j)
          val dd = d * d
          if (dd < bestD) { bestD = dd; best = j }
          j += 1
        }
        if (assignments(i) != best) { assignments(i) = best; changed = true }
        i += 1
      }
      val sums = new Array[Double](k)
      val counts = new Array[Int](k)
      i = 0
      while (i < n) {
        sums(assignments(i)) += samples(i)
        counts(assignments(i)) += 1
        i += 1
      }
      var j = 0
      while (j < k) {
        if (counts(j) > 0) centroids(j) = (sums(j) / counts(j)).toFloat
        j += 1
      }
      iter += 1
    }
    (centroids, assignments)
  }
}
