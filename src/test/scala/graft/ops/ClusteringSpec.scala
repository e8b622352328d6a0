package graft.ops

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral tests for k-means (qc1) and SemDeDup (qc2) on a crafted
  * embedding corpus with planted cluster structure and planted near-dups —
  * the sfDir embeddings are near-uniform random, so structure must be
  * planted to test that the ops FIND it.
  */
class ClusteringSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _
  private var dir: String = _

  private val Dim = 8

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-clustering-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dir = Files.createTempDirectory("graft-clust").toString
    writeCorpus()
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Three well-separated planted clusters along axes 0/1/2 (members get a
    * small deterministic per-index perturbation on the remaining axes), plus
    * one planted near-duplicate pair inside cluster 0: vecs 0 and 9 are
    * nearly parallel (cosine ~ 0.9996), everything else is far apart.
    * vec_ids 0..2 are one member of each cluster so the first-k init starts
    * with one seed per planted cluster (k = 3).
    */
  private def writeCorpus(): Unit = {
    val ss = spark; import ss.implicits._
    def vec(axis: Int, idx: Int): Array[Float] = {
      val v = Array.fill(Dim)(0.0f)
      v(axis) = 10.0f
      v((axis + 3) % Dim) = 0.1f * (idx % 5) // deterministic jitter
      v
    }
    val rows: Seq[(Long, Array[Float], Int)] =
      (0 until 9).map { i =>
        val axis = i % 3
        (i.toLong, vec(axis, i / 3), axis)
      } :+ {
        // vec 9: near-dup of vec 0 (same dominant axis, tiny jitter delta)
        val v = vec(0, 0); v(4) = 0.05f
        (9L, v, 0)
      }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  test("qc1: k-means recovers the planted clusters deterministically") {
    val out = Clustering.kmeansAssign(spark, dir, k = 3, rounds = 3)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(out.size == 10)
    // members of the same planted cluster land in the same k-means cluster
    for (axis <- 0 until 3) {
      val members = (0 until 9).filter(_ % 3 == axis).map(_.toLong) ++
        (if (axis == 0) Seq(9L) else Nil)
      val cids = members.map(out(_)._1).toSet
      assert(cids.size == 1, s"planted cluster $axis split across $cids")
    }
    // the three planted clusters stay distinct
    assert((0 until 3).map(a => out(a.toLong)._1).toSet.size == 3)
    // a second run is bit-identical (deterministic init + integer math)
    val again = Clustering.kmeansAssign(spark, dir, k = 3, rounds = 3)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(again == out)
  }

  test("qc4: k-means|| seeds k self-assigned centers and beats the naive init") {
    val sf = "/root/testdata/sf0.001"
    val out = Clustering.kmeansParallel(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out.size == 500)
    val centers = out.collect { case (id, (cl, _)) if id == cl => id }.toSet
    // every chosen center attracts at least itself at distance zero, and
    // every cluster label IS one of the k chosen centers
    assert(centers.size == 8, s"expected 8 self-assigned centers, got $centers")
    assert(out.values.map(_._1).toSet == centers)
    centers.foreach(c => assert(out(c) == ((c, 0L)), s"center $c: ${out(c)}"))
    assert(out.values.forall(_._2 >= 0L))
    // deterministic: the md5-lane draws replace the paper's coin flips
    val again = Clustering.kmeansParallel(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(again == out)
    // seeding quality: the d^2-weighted oversampling spreads centers, so
    // total within-cluster cost must beat assigning to the first k vectors
    // by id (qc1's init, before any Lloyd round)
    val naive = Clustering.kmeansAssign(spark, sf, k = 8, rounds = 1)
      .agg(org.apache.spark.sql.functions.sum("dist_sq")).collect()(0).getLong(0)
    val seeded = out.values.map(_._2).sum
    assert(seeded < naive, s"k-means|| cost $seeded !< naive-init cost $naive")
  }

  test("qc2: SemDeDup drops the planted near-dup, keeps the earlier one") {
    val out = Clustering.semDedup(spark, dir, k = 3, rounds = 3, tau2E4 = 9025L)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(out(9L) == 1, "near-dup of vec 0 must be dropped")
    assert(out(0L) == 0, "the earliest member of the neighborhood survives")
    // nothing else clears tau = 0.95: the axis jitter puts same-cluster
    // non-dup pairs at cosine <= ~0.99995 of... distinct jitter indices
    // differ by >= 0.1 on an off-axis, cosine <= 0.99999 — compute exactly:
    // members of one planted cluster differ only in the jitter coord, so
    // cos = 100/(sqrt(100+a^2)sqrt(100+b^2)); worst pair (0.0, 0.4) gives
    // cos ~ 0.99920 > 0.95 — so same-cluster jitter variants DO collapse.
    // That is correct SemDeDup behavior at tau=0.95 (they are semantic
    // dups); only the FIRST member of each cluster survives here.
    val survivors = out.filter(_._2 == 0).keys.toSet
    assert(survivors == Set(0L, 1L, 2L),
      s"expected one survivor per planted cluster, got $survivors")
  }

  test("qc2 plan: pairwise stage is a cluster-keyed equi-join, no cartesian") {
    val plan = Clustering.semDedup(spark, dir, k = 3, rounds = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.linesIterator.take(5).mkString("\n"))
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      plan.linesIterator.take(5).mkString("\n"))
  }

  test("qc1 plan: E-step is map-only over centroid literals (no join)") {
    val plan = Clustering.kmeansAssign(spark, dir, k = 3, rounds = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "assignment must not join a centroid table")
    assert(plan.contains("dot_i64"), "native dot_i64 must score the centroids")
  }

  test("qc5: k-center greedy matches a driver-side brute-force traversal") {
    val out = Clustering.kcenterCoreset(spark, dir, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 10)
    // brute-force replication of the traversal on the planted vectors
    val ss = spark; import ss.implicits._
    val vecs = ss.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
      .map { case (id, v) =>
        id -> v.map(x => math.round(x.toDouble * 1e6))
      }.sortBy(_._1)
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    var centers = Vector(vecs.find(_._1 == 0L).get)
    for (_ <- 2 to 3) {
      val next = vecs
        .map { case (id, v) => (id, v, centers.map(c => d2(c._2, v)).min) }
        .minBy { case (id, _, dm) => (-dm, id) }
      centers = centers :+ (next._1 -> next._2)
    }
    val expect = vecs.map { case (id, v) =>
      val (cid, dm) = centers.map(c => (c._1, d2(c._2, v)))
        .minBy { case (c, d) => (d, c) }
      (id, cid, dm)
    }.toSet
    assert(out.toSet == expect)
    // farthest-point picks must land in three DIFFERENT planted clusters
    val picked = out.collect { case (id, c, _) if id == c => id }.toSet
    assert(picked.map(_ % 3).size == 3,
      s"greedy picks should span the planted clusters, got $picked")
  }

  test("qc5 plan: each pass is map-only over center literals (no join)") {
    val plan = Clustering.kcenterCoreset(spark, dir, k = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "assignment must not join a center table")
    assert(plan.contains("dot_i64"), "native dot_i64 must score the centers")
  }

  test("qc3: prototype pruning keeps the hardest half of each cluster") {
    val out = Clustering.prototypePrune(spark, dir, k = 3, rounds = 3,
      keepFrac = 0.5).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2), r.getInt(3), r.getInt(4)))
      .toMap
    assert(out.size == 10)
    // per cluster: exactly ceil(size/2) kept, and every kept member's
    // dist_sq >= every dropped member's (hardest-first)
    out.values.groupBy(_._1).foreach { case (c, members) =>
      val kept = members.filter(_._4 == 1).map(_._2)
      val dropped = members.filter(_._4 == 0).map(_._2)
      assert(kept.size == math.ceil(members.size / 2.0).toInt,
        s"cluster $c kept ${kept.size} of ${members.size}")
      if (dropped.nonEmpty && kept.nonEmpty)
        assert(kept.min >= dropped.max,
          s"cluster $c kept an easier member than it dropped")
    }
  }

  test("qc6: quality report equals a single-threaded Lloyd + geometry replay") {
    // full independent reference: the qc1 recurrence from first principles
    // (first-k init, exact int64 argmin with smallest-cid ties, half-away
    // M-step means, empty clusters keep their centroid), then the qc6 stats
    // with the same pinned sqrt/divide math
    val k = 3; val rounds = 3
    def round9(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue
    def halfAway(x: Double): Long =
      if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong
    def code(v: Array[Float]): Array[Long] =
      v.map(f => java.math.BigDecimal.valueOf(f.toDouble * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue)
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    // rebuild the planted corpus codes exactly as writeCorpus emits them
    def vec(axis: Int, idx: Int): Array[Float] = {
      val v = Array.fill(Dim)(0.0f); v(axis) = 10.0f
      v((axis + 3) % Dim) = 0.1f * (idx % 5); v
    }
    val vecs: Map[Long, Array[Long]] =
      ((0 until 9).map(i => i.toLong -> code(vec(i % 3, i / 3))) :+ {
        val v = vec(0, 0); v(4) = 0.05f; 9L -> code(v)
      }).toMap
    var cents: Vector[Array[Long]] =
      (0L until k.toLong).map(vecs(_)).toVector
    var assign: Map[Long, (Int, Long)] = Map.empty
    for (r <- 1 to rounds) {
      assign = vecs.map { case (id, qv) =>
        val best = cents.zipWithIndex
          .map { case (cv, cid) => (d2(qv, cv), cid) }.min
        id -> ((best._2, best._1))
      }
      if (r < rounds) {
        cents = cents.zipWithIndex.map { case (prev, cid) =>
          val members = vecs.filter { case (id, _) => assign(id)._1 == cid }
          if (members.isEmpty) prev
          else (0 until Dim).map { p =>
            halfAway(members.values.map(_(p)).sum.toDouble / members.size)
          }.toArray
        }
      }
    }
    val nonEmpty = assign.values.map(_._1).toSet
    val want = nonEmpty.map { cid =>
      val ms = assign.collect { case (id, (c, d)) if c == cid => (id, d) }
      val csize = ms.size.toLong
      val sse = ms.map(_._2).sum
      val scat = math.sqrt(sse.toDouble / csize.toDouble)
      val others = nonEmpty - cid
      val minSep = others.map(j => d2(cents(cid), cents(j))).min
      val dbR = others.map { j =>
        val msJ = assign.values.filter(_._1 == j).map(_._2)
        val scatJ = math.sqrt(msJ.sum.toDouble / msJ.size.toDouble)
        round9((scat + scatJ) / math.sqrt(d2(cents(cid), cents(j)).toDouble))
      }.max
      cid -> ((csize, sse, round9(sse.toDouble / csize.toDouble), minSep, dbR))
    }.toMap
    val got = Clustering.clusterQuality(spark, dir, k = k, rounds = rounds)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4),
          r.getDouble(5)))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (cid, v) =>
      assert(got(cid) == v, s"cluster $cid: spark ${got(cid)} vs reference $v")
    }
    // the planted clusters are genuinely well separated: every DB component
    // is far below 1 (scatter << separation)
    assert(got.values.forall(_._5 < 0.5),
      s"planted clusters should read DB << 1: ${got.values.map(_._5)}")
    // sizes recover the planted structure: 4 + 3 + 3
    assert(got.values.map(_._1).toSeq.sorted == Seq(3L, 3L, 4L))
  }

  test("qc7: simplified silhouette equals the single-threaded replay; planted clusters read deep") {
    val k = 3; val rounds = 3
    def round6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    def halfAway(x: Double): Long =
      if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong
    def code(v: Array[Float]): Array[Long] =
      v.map(f => java.math.BigDecimal.valueOf(f.toDouble * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue)
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def vec(axis: Int, idx: Int): Array[Float] = {
      val v = Array.fill(Dim)(0.0f); v(axis) = 10.0f
      v((axis + 3) % Dim) = 0.1f * (idx % 5); v
    }
    val vecs: Map[Long, Array[Long]] =
      ((0 until 9).map(i => i.toLong -> code(vec(i % 3, i / 3))) :+ {
        val v = vec(0, 0); v(4) = 0.05f; 9L -> code(v)
      }).toMap
    var cents: Vector[Array[Long]] = (0L until k.toLong).map(vecs(_)).toVector
    var assign: Map[Long, (Int, Long)] = Map.empty
    for (r <- 1 to rounds) {
      assign = vecs.map { case (id, qv) =>
        val best = cents.zipWithIndex
          .map { case (cv, cid) => (d2(qv, cv), cid) }.min
        id -> ((best._2, best._1))
      }
      if (r < rounds) {
        cents = cents.zipWithIndex.map { case (prev, cid) =>
          val members = vecs.filter { case (id, _) => assign(id)._1 == cid }
          if (members.isEmpty) prev
          else (0 until Dim).map { p =>
            halfAway(members.values.map(_(p)).sum.toDouble / members.size)
          }.toArray
        }
      }
    }
    val want = vecs.keys.map { id =>
      val (cid, a2) = assign(id)
      val b2 = cents.indices.filter(_ != cid).map(j => d2(vecs(id), cents(j))).min
      val aD = math.sqrt(a2.toDouble); val bD = math.sqrt(b2.toDouble)
      val s = if (math.max(aD, bD) == 0.0) 0.0
        else round6((bD - aD) / math.max(aD, bD))
      id -> ((cid, round6(aD), round6(bD), s))
    }.toMap
    val got = Clustering.silhouette(spark, dir, k = k, rounds = rounds)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (id, v) =>
      assert(got(id) == v, s"vec $id: spark ${got(id)} vs reference $v")
    }
    // the planted clusters are well separated: every point reads deep
    // inside its cluster (b >> a), silhouette close to 1
    assert(got.values.forall(_._4 > 0.9),
      s"planted structure should read s ~ 1: ${got.values.map(_._4)}")
  }

  test("qt20: gopher rules fire on the right boundary cases") {
    val ss = spark; import ss.implicits._
    val tdir = Files.createTempDirectory("graft-gopher").toString
    val good = (("the quick brown fox jumps over and over with style that " +
      "people have come to expect of a good test document ") * 3).trim
    val rows = Seq(
      // 0: passes everything (>= 50 words, clean prose, stopwords present)
      (0L, good, "en", "s", good.length.toLong),
      // 1: too short
      (1L, "the and of with tiny", "en", "s", 20L),
      // 2: bullet-heavy (every line a bullet)
      (2L, (0 until 60).map(i => s"- item $i of the and with list").mkString("\n"),
        "en", "s", 100L),
      // 3: symbol-ridden (### and ... everywhere)
      (3L, ("### lorem ... " * 30) + "the and of with", "en", "s", 100L),
      // 4: no alphabetic words (digits only)
      (4L, (1 to 60).mkString(" "), "und", "s", 100L)
    )
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tdir/documents.parquet")
    val out = TextAnalysis.gopherRules(spark, tdir)
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("passes_gopher")).toMap
    assert(out(0L) == 1, "clean prose must pass")
    assert(out(1L) == 0, "word-count floor must fail short docs")
    assert(out(2L) == 0, "bullet-line rule must fail bullet walls")
    assert(out(3L) == 0, "symbol ratio must fail ###/... spam")
    assert(out(4L) == 0, "alpha-word rule must fail digit walls")
  }
}
