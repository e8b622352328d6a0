package graft.ops

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** qg1 host PageRank — the distributed iterative dataflow is compared
  * EXACTLY (int64 for int64) against an independent single-threaded
  * reference implementation of the same fixed-point recurrence, computed
  * here from first principles over the planted edge construction.
  */
class LinkGraphSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _
  private var dir: String = _
  private val ids: Seq[Long] = (0L until 50L) ++ Seq(96L, 128L, 130L)

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-linkgraph-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dir = Files.createTempDirectory("graft-lg").toString
    val ss = spark; import ss.implicits._
    ids.map(id => (id, s"doc $id", 10L))
      .toDF("doc_id", "text", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** The recurrence, single-threaded: ranks start at 10^12; each round
    * r'(v) = 15e10 + (85 * sum over in-edges of r(u)/outdeg(u)) / 100,
    * every division an integer floor, contributions to non-source hosts
    * dropped (the graph is restricted to crawled hosts).
    */
  private def reference(k: Int): Map[Long, (Long, Long)] = {
    val edges = ids.map(id => (id % 32, ((id % 32) * 5 + 1 + id % 3) % 32))
      .distinct
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val nodes = deg.keySet
    var r: Map[Long, Long] = nodes.map(_ -> 1000000000000L).toMap
    for (_ <- 1 to k) {
      val in = edges
        .filter { case (_, d) => nodes.contains(d) }
        .groupBy(_._2)
        .map { case (d, es) =>
          d -> es.map { case (s, _) => r(s) / deg(s) }.sum
        }
      r = nodes.map(n =>
        n -> (150000000000L + in.get(n).map(85L * _ / 100).getOrElse(0L))).toMap
    }
    r.map { case (n, v) => n -> ((deg(n), v)) }
  }

  test("qg1: distributed ranks equal the single-threaded recurrence, exactly") {
    val out = LinkGraph.hostPagerank(spark, dir).collect()
      .map(r => r.getAs[Long]("host_id") ->
        ((r.getAs[Long]("out_deg"), r.getAs[Long]("rank_fp")))).toMap
    val ref = reference(5)
    assert(out.keySet == ref.keySet)
    ref.foreach { case (n, v) =>
      assert(out(n) == v, s"host $n: spark ${out(n)} vs reference $v")
    }
    // at least one host must differ from the uniform start (mass moved)
    assert(out.values.map(_._2).toSet.size > 1)
    // a host nobody links to sits at exactly the teleport mass
    val inLinked = ids.map(id => ((id % 32) * 5 + 1 + id % 3) % 32).toSet
    val orphanRanks = out.collect {
      case (n, (_, r)) if !inLinked.contains(n) => r
    }
    assert(orphanRanks.nonEmpty && orphanRanks.forall(_ == 150000000000L))
  }

  test("qg1: re-running produces identical ranks (determinism)") {
    val a = LinkGraph.hostPagerank(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val b = LinkGraph.hostPagerank(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(a == b)
  }
}
