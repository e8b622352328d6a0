package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Evidence for the two remaining scale techniques the suite queries can't
  * carry (they read bare parquet dirs; these need the catalog / runtime):
  *
  *  - BUCKETING: the fact-to-fact join (q04's shape — lineitem x orders on
  *    orderkey, the join BASELINE.md flags as "demands bucketing/
  *    co-partitioning at 100 TB") goes exchange-free on both sides when the
  *    tables are written bucketed on the join key with the same bucket
  *    count. At 100 TB this turns the biggest shuffle in the workload into
  *    a local zip of pre-hashed files.
  *  - AQE SKEW SPLIT: a skewed shuffle join is re-planned at runtime into
  *    per-split tasks ("skew=true" in the final adaptive plan), the engine's
  *    backstop when a hot key slips past explicit salting.
  */
class BucketingSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    val wh = Files.createTempDirectory("graft-warehouse").toString
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-bucketing-test")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ paths
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("co-bucketed fact-fact join runs with zero join-side exchanges") {
    spark.read.parquet(s"$sf/lineitem.parquet")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("lineitem_b")
    spark.read.parquet(s"$sf/orders.parquet")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_b")

    def agg(l: org.apache.spark.sql.DataFrame, o: org.apache.spark.sql.DataFrame) =
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"))

    val bucketed = agg(spark.table("lineitem_b"), spark.table("orders_b"))
    val plain = agg(spark.read.parquet(s"$sf/lineitem.parquet"),
      spark.read.parquet(s"$sf/orders.parquet"))

    def nExchanges(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.toString
        .linesIterator.count(_.contains("Exchange"))

    // bucketed: ONLY the post-join aggregation exchanges (1); both join
    // sides read pre-hashed bucket files. plain: + one exchange per side.
    assert(nExchanges(bucketed) == 1,
      bucketed.queryExecution.executedPlan.toString)
    assert(nExchanges(plain) == 3,
      plain.queryExecution.executedPlan.toString)
    // and the answers agree
    val b = bucketed.collect().map(r => (r.getString(0), r.getLong(1))).sorted
    val p = plain.collect().map(r => (r.getString(0), r.getLong(1))).sorted
    assert(b.sameElements(p))
  }

  test("AQE splits a skewed join partition at runtime (skew=true in final plan)") {
    val ss = spark; import ss.implicits._
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // tiny thresholds so the synthetic hot key trips the detector at test
    // scale (the hot partition is a single long column after pruning and
    // lz4 crushes it to a few KB — 1KB is the reliable floor here)
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    // the downstream agg re-shuffles anyway; let the rule split regardless
    spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    try {
      // one hot key (0) carrying 50k rows vs 100 rows on every other key
      val left = spark.range(0, 50000).map(i => (if (i < 49000) 0L else i % 40, i))
        .toDF("k", "v")
      val right = spark.range(0, 40).map(i => (i, s"dim_$i")).toDF("k", "name")
      val joined = left.join(right, "k").groupBy("name")
        .agg(count(lit(1)).as("n"))
      joined.collect() // AQE finalizes only on execution
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"), finalPlan)
    } finally {
      Seq("spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.coalescePartitions.enabled",
        "spark.sql.adaptive.forceOptimizeSkewedJoin")
        .foreach(spark.conf.unset)
    }
  }
}
