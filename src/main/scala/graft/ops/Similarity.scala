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
