package graft.core

import scala.collection.mutable.ArrayBuffer

/** Class-agnostic greedy non-maximum suppression.
  *
  * Re-derived from /root/reference/ferrules-core/src/layout/model.rs:401-423:
  * stable sort by proba descending, then greedily keep a box unless its
  * relaxed IoU (intersection / min-area) with any already-kept box exceeds
  * the threshold. Per-page N is tiny, so a local loop is the right shape —
  * relationally this would be a self theta-join + greedy anti-join.
  */
object Nms {

  val IouThreshold: Float = 0.7f // model.rs:165

  def nms(raw: Seq[LayoutBox], iouThreshold: Float = IouThreshold): Vector[LayoutBox] = {
    // Stable descending sort on proba (Rust sort_by is stable; Scala sortBy is too).
    val sorted = raw.sortBy(-_.proba)
    val kept = ArrayBuffer.empty[LayoutBox]
    for (cand <- sorted) {
      var drop = false
      var i = 0
      while (i < kept.length && !drop) {
        if (kept(i).bbox.relaxedIou(cand.bbox) > iouThreshold) drop = true
        i += 1
      }
      if (!drop) kept += cand
    }
    kept.toVector
  }
}
