package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.GraftFunctions

/** Similarity search over the `embeddings` table (ARRAY<FLOAT> column).
  *
  * - Brute-force cosine top-k: the correctness baseline. Query set broadcast
  *   against the corpus; cosine is a native codegen'd expression
  *   (graft.functions.CosineSimilarity), ranks via window.
  * - SRP-LSH (random hyperplanes) bucketed variant: the scale path — sign-bit
  *   signatures computed from deterministic seeded hyperplanes, candidates
  *   share a signature prefix; at 100 TB the bucket join replaces the
  *   quadratic cross product.
  */
object Similarity {

  private def embeddings(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  /** Brute-force top-k cosine neighbors for the query vectors
    * (vec_id < nQueries). The query side is tiny -> broadcast; corpus side
    * streams through codegen'd cosine, then a per-query top-k window.
    */
  def annBruteForce(spark: SparkSession, dir: String, nQueries: Int = 5, k: Int = 10): DataFrame = {
    val emb = embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val scored = emb.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .withColumn("cosine", GraftFunctions.cosineFF(col("qvec"), col("embedding")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rnk"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** Multi-table SRP signatures: `tables` independent hash tables of
    * `bitsPerTable` sign bits each (OR-amplified LSH — a candidate needs to
    * collide in ANY table, which is what keeps recall high while each table's
    * bucket stays small). A native one-pass expression
    * (graft.functions.SrpSigs): hyperplanes are a deterministic xxhash64
    * stream over (dim, plane), and all tables*bits dot products accumulate
    * in a single traversal of the vector.
    */
  def srpSignatures(spark: SparkSession, dir: String, tables: Int = 8,
      bitsPerTable: Int = 4): DataFrame =
    embeddings(spark, dir).withColumn("sigs",
      GraftFunctions.srpSigs(col("embedding"), tables, bitsPerTable))

  /** LSH-bucketed ANN: candidates collide with the query in at least one of
    * the SRP tables; rank within the candidate set by exact cosine. Same
    * shape as annBruteForce (approximate — recall measured in OpsSpec).
    */
  def annLsh(spark: SparkSession, dir: String, nQueries: Int = 5, k: Int = 10,
      tables: Int = 8, bitsPerTable: Int = 4): DataFrame = {
    val signed = srpSignatures(spark, dir, tables, bitsPerTable)
      .select(col("vec_id"), col("embedding"), col("sigs"))
    val corpus = signed.select(col("vec_id"), col("embedding"),
      explode(col("sigs")).as("bucket"))
    val queries = signed.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
        explode(col("sigs")).as("bucket"))
    val cand = corpus.join(broadcast(queries),
        Seq("bucket")).filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("qvec"), col("vec_id"), col("embedding"))
      .distinct() // a pair may collide in several tables
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    cand.withColumn("cosine", GraftFunctions.cosineFF(col("qvec"), col("embedding")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rnk"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** IVF coarse quantizer: deterministic Lloyd k-means over a driver-side
    * sample of the corpus (the standard IVF pattern — the quantizer is tiny
    * and trained once; cluster assignment of the corpus stays distributed).
    */
  def ivfCentroids(spark: SparkSession, dir: String, k: Int = 16,
      iters: Int = 10, sampleCap: Int = 4096): Array[Array[Float]] = {
    val sample = embeddings(spark, dir)
      .orderBy(col("vec_id")).limit(sampleCap)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray)
    require(sample.nonEmpty, "empty embeddings table")
    val dim = sample.head.length
    // deterministic init: evenly-strided sample points
    val centroids = Array.tabulate(k)(i => sample((i * sample.length) / k).clone())
    val assign = new Array[Int](sample.length)
    for (_ <- 0 until iters) {
      var i = 0
      while (i < sample.length) {
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var d = 0.0
          var j = 0
          while (j < dim) {
            val diff = sample(i)(j) - centroids(c)(j)
            d += diff * diff
            j += 1
          }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        assign(i) = best
        i += 1
      }
      val sums = Array.fill(k, dim)(0.0)
      val counts = new Array[Int](k)
      i = 0
      while (i < sample.length) {
        val c = assign(i)
        counts(c) += 1
        var j = 0
        while (j < dim) { sums(c)(j) += sample(i)(j); j += 1 }
        i += 1
      }
      for (c <- 0 until k if counts(c) > 0; j <- 0 until dim)
        centroids(c)(j) = (sums(c)(j) / counts(c)).toFloat
    }
    centroids
  }

  /** IVF-bucketed ANN: corpus vectors are assigned to their nearest coarse
    * centroid (distributed, codegen'd cosine against literal centroids);
    * each query probes its `nprobe` nearest cells and ranks candidates by
    * exact cosine. At scale the cell assignment is a write-once partition
    * key — queries then touch nprobe/k of the corpus.
    */
  def annIvf(spark: SparkSession, dir: String, nQueries: Int = 5, topK: Int = 10,
      k: Int = 16, nprobe: Int = 4): DataFrame = {
    import org.apache.spark.sql.functions.{typedlit => tlit}
    val centroids = ivfCentroids(spark, dir, k)
    val cents = centroids.map(c => tlit(c.toSeq))
    val cos = cents.map(c => GraftFunctions.cosineFF(col("embedding"), c))
    val cosArr = array(cos: _*)
    // nearest cell = first argmax (deterministic)
    val assigned = embeddings(spark, dir)
      .withColumn("__cos", cosArr)
      .withColumn("cell", expr("array_position(__cos, array_max(__cos))").cast("int") - 1)
    val corpus = assigned.select(col("vec_id"), col("embedding"), col("cell"))
    // query probe cells: top-nprobe centroid cosines per query vector
    val probes = assigned.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
        posexplode(col("__cos")).as(Seq("cpos", "ccos")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("ccos").desc, col("cpos").asc)
    val probeCells = probes.withColumn("prnk", row_number().over(w))
      .filter(col("prnk") <= nprobe)
      .select(col("query_id"), col("qvec"), col("cpos").as("cell"))
    val cand = corpus.join(broadcast(probeCells), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
    val rankW = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    cand.withColumn("cosine", GraftFunctions.cosineFF(col("qvec"), col("embedding")))
      .withColumn("rnk", row_number().over(rankW))
      .filter(col("rnk") <= topK)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rnk"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** Embedding-cosine near-duplicate pairs (the embedding leg of dedup):
    * all pairs above a cosine threshold. Exact (cross product) — the corpus
    * embedding table is small; the LSH variant above is the scale path.
    */
  def embeddingDupPairs(spark: SparkSession, dir: String, threshold: Double = 0.95): DataFrame = {
    val e = embeddings(spark, dir)
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine", GraftFunctions.cosineFF(col("va"), col("vb")))
      .filter(col("cosine") > threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }
}
