package graft.spark

import org.apache.spark.sql.SparkSession

/** Production entry point (spark-submit). Runs the resumable extraction job
  * over a pages table and reports metrics + lineage.
  *
  *   spark-submit --class graft.spark.ExtractJobRunner \
  *     --conf spark.sql.extensions=graft.spark.GraftExtensions \
  *     graft.jar <pagesPath|gen:N> <storeRoot> [partitions] [runId] [hash|balanced]
  *
  * `pagesPath` is a parquet path (Iceberg table on a real cluster) with the
  * (url, warc_ts, html, text, lang) schema; `gen:N` generates the seeded
  * synthetic corpus of N docs instead (no external data in the sandbox).
  * The job is idempotently resumable: already-committed urls are skipped,
  * so re-running after a crash or partial commit converges to the same
  * table with zero duplicates.
  */
object ExtractJobRunner {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: ExtractJobRunner <pagesPath|gen:N> <storeRoot> [partitions] [runId]")
    val input = args(0)
    val storeRoot = args(1)
    val builder = SparkSession.builder()
      .appName("graft-extract")
      .config("spark.sql.session.timeZone", "UTC")
    // spark-submit provides spark.master; standalone runs fall back to local
    val spark = (if (sys.props.contains("spark.master")) builder
      else builder.master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[*]")))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val partitions = if (args.length > 2) args(2).toInt
      else spark.sparkContext.defaultParallelism * 4
    val runId = if (args.length > 3) args(3)
      else "run-" + java.util.UUID.randomUUID().toString.take(8)
    // hash (stateless full-range salt) is the default — it is the only
    // placement that scales to very large inputs (the balanced mode's global
    // length sort funnels the whole corpus through one partition: measured
    // 11m30s vs ~2m for 4M docs on this host). "balanced" opts into the
    // snake-dealt optimal byte balance for small corpora.
    val balanced = args.lift(4).contains("balanced")

    val pages = if (input.startsWith("gen:"))
      PagesTable.generate(spark, input.stripPrefix("gen:").toLong,
        partitions = partitions)
    else
      spark.read.parquet(input).as[PagesTable.PageRow]

    val store = new SnapshotStore(storeRoot)
    val t0 = System.nanoTime()
    val extracted = ExtractJob.run(spark, pages, store, runId, partitions, balanced)
    val wallS = (System.nanoTime() - t0) / 1e9

    val table = store.read(spark)
    val committed = table.map(_.count()).getOrElse(0L)
    println(f"[graft] run=$runId extracted=$extracted committed=$committed " +
      f"snapshot=${store.currentSnapshotId.getOrElse(-1L)} " +
      f"wall_s=$wallS%.1f docs_per_sec=${(extracted / math.max(wallS, 1e-9)).toLong}")

    // lineage summary: byte balance across partitions (skew audit)
    import org.apache.spark.sql.functions._
    val lin = spark.read.parquet(s"$storeRoot/lineage")
      .filter(col("run_id") === runId)
    if (!lin.isEmpty) {
      val stats = lin.agg(
        max(col("bytes_in")).as("max_bytes"),
        avg(col("bytes_in")).as("mean_bytes"),
        sum(col("doc_count")).as("docs"),
        max(col("max_doc_bytes")).as("max_doc_bytes"),
        sum(col("parse_errors") + col("empty_docs") + col("oversize_docs") +
          col("exceptions")).as("failures")).head()
      val mean = stats.getDouble(1)
      val ratio = if (mean > 0) stats.getLong(0) / mean else 0.0
      // a document is indivisible: the achievable bound is maxDoc + mean share
      val lptBound = if (mean > 0) (stats.getLong(3) + mean) / mean else 0.0
      println(f"[graft] lineage: docs=${stats.getLong(2)} failures=${stats.getLong(4)} " +
        f"max/mean partition bytes=$ratio%.2f (indivisible-doc bound $lptBound%.2f)")
    }
    spark.stop()
  }
}
