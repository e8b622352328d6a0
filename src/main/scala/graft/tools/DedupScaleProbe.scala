package graft.tools

import org.apache.spark.sql.SparkSession
import graft.spark.CleanJob

/** Scale probe for the qd17 simhash-pair pipeline: generate an N-doc corpus
  * (the CleanJob generator, with its planted exact/near-dup decade bases),
  * then time the full Manku blocked self-join — 45 block-combination keys
  * per doc, one bucket shuffle, bit_count(xor) verify. Prints one JSON line.
  *
  * Usage: `sbt "runMain graft.tools.DedupScaleProbe <nDocs> <outDir> [partitions]"`
  */
object DedupScaleProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: DedupScaleProbe <nDocs> <outDir> [partitions]")
    val n = args(0).toLong
    val dir = args(1)
    val parts = if (args.length > 2) args(2).toInt else 64
    val spark = SparkSession.builder().appName("dedup-scale")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/graft-scratch"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var t0 = System.nanoTime()
    CleanJob.DocCorpus.generate(spark, n, parts).toDF()
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val tGen = (System.nanoTime() - t0) / 1e9
    t0 = System.nanoTime()
    val pairs = graft.ops.Dedup.simhashPairs(spark, dir).count()
    val tPairs = (System.nanoTime() - t0) / 1e9
    // the production order: EXACT dedup first (qd1) — identical texts
    // collapse to one representative, so identical-fingerprint buckets
    // shrink from group-quadratic to singleton and pair volume becomes
    // the true near-dup signal, not copy enumeration
    import org.apache.spark.sql.functions._
    t0 = System.nanoTime()
    spark.read.parquet(s"$dir/documents.parquet")
      .groupBy(col("text")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), col("text"))
      .write.mode("overwrite").parquet(s"$dir-exact/documents.parquet")
    val kept = spark.read.parquet(s"$dir-exact/documents.parquet").count()
    val pairs2 = graft.ops.Dedup.simhashPairs(spark, s"$dir-exact").count()
    val tExact = (System.nanoTime() - t0) / 1e9
    println(f"""{"metric":"simhash_pairs_scale","n_docs":$n,"gen_s":$tGen%.1f,""" +
      f""""pairs":$pairs,"pairs_s":$tPairs%.1f,""" +
      f""""docs_per_sec":${n / tPairs}%.0f,""" +
      f""""exact_collapsed_docs":$kept,"pairs_after_exact":$pairs2,""" +
      f""""exact_then_pairs_s":$tExact%.1f}""")
    spark.stop()
  }
}
