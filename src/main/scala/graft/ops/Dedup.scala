package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication suite over the `documents` table — the operations a
  * large-scale training-data pipeline runs before anything else.
  *
  * All of it is declarative DataFrame code (codegen'd, shuffle-aware):
  *  - exact: hash-groupBy on a normalized fingerprint;
  *  - MinHash + LSH: shingle -> minhash signature -> banded bucket join ->
  *    candidate pairs -> exact-Jaccard verify. The only shuffles are the
  *    band groupBy and the verify join, both on uniformly-hashed keys;
  *  - SimHash: custom scalar expression (graft.functions.SimHash64), near-dup
  *    = small Hamming distance within LSH-prefix buckets;
  *  - n-gram Jaccard: exact pairwise Jaccard within cheap blocking buckets.
  */
object Dedup {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** Normalized exact-dup fingerprint: lowercase, collapse whitespace, md5. */
  def fingerprintCol(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** Histogram of exact-duplicate group sizes (1 = unique doc). The classic
    * first pass of corpus dedup: one hash-shuffle on the fingerprint.
    */
  def exactDedupStats(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .groupBy(fingerprintCol(col("text")).as("fp"))
      .agg(count(lit(1)).as("n_docs"))
      .groupBy(col("n_docs").as("group_size"))
      .agg(count(lit(1)).as("n_groups"))

  /** Keep-first exact dedup: survivors = min doc_id per fingerprint. */
  def exactDedupKeepFirst(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .groupBy(fingerprintCol(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_dups"))

  /** Word shingles (w-grams) as a distinct SORTED array column — a native
    * one-pass expression (graft.functions.WordShingles); the composed
    * lower/split/slice-per-position form cost ~1.3ms per document.
    */
  def shingles(text: Column, w: Int): Column =
    graft.functions.GraftFunctions.wordShingles(text, w)

  /** MinHash signature: sig[i] = min over shingles of seeded xxhash64.
    * A native one-pass expression (graft.functions.MinHashSig) — composing
    * it from transform+array_min would traverse the shingle array once per
    * hash lane (64x the work); the expression computes all lanes in one
    * traversal and stays inside whole-stage codegen.
    */
  def minhashSignature(sh: Column, numHashes: Int): Column =
    graft.functions.GraftFunctions.minhashSig(sh, numHashes)

  /** LSH band keys: hash of each r-row band of the signature (+ band index so
    * equal bands in different positions don't collide).
    */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      xxhash64(lit(b) +: (0 until rowsPerBand).map(r =>
        element_at(sig, b * rowsPerBand + r + 1)): _*)
    }: _*)

  /** MinHash+LSH near-duplicate pairs with exact-Jaccard verification.
    *
    * numHashes=64, bands=16 x rows=4 targets the ~0.5+ Jaccard region.
    * Pipeline: signature (map-only) -> explode bands -> groupBy band bucket
    * (shuffle 1) -> pairs within bucket -> distinct -> verify join (shuffle 2)
    * computing true Jaccard on the shingle sets.
    */
  def minhashLshPairs(
      spark: SparkSession,
      dir: String,
      shingleSize: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5
  ): DataFrame = {
    val rowsPerBand = numHashes / bands
    val base = docs(spark, dir)
      .select(col("doc_id"), shingles(col("text"), shingleSize).as("sh"))
      .filter(size(col("sh")) > 0)
    val withBands = base
      .select(col("doc_id"), col("sh"),
        bandKeys(minhashSignature(col("sh"), numHashes), bands, rowsPerBand).as("bands"))
    val buckets = withBands.select(col("doc_id"), explode(col("bands")).as("band"))
    val cand = buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val sa = base.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val sb = base.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    cand.join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Per-document MinHash profile: shingle count, signature head, band keys —
    * the per-doc leg of the LSH pipeline (pairs come from minhashLshPairs).
    */
  def minhashDocs(spark: SparkSession, dir: String, shingleSize: Int = 3,
      numHashes: Int = 64, bands: Int = 16): DataFrame = {
    val sh = shingles(col("text"), shingleSize)
    val sig = minhashSignature(sh, numHashes)
    docs(spark, dir).select(
      col("doc_id"),
      size(sh).as("n_shingles"),
      element_at(sig, 1).as("sig_head"),
      bandKeys(sig, bands, numHashes / bands).as("band_keys"))
  }

  /** SimHash per document via the native expression, plus its 16-bit prefix
    * bucket (the blocking key for Hamming-distance near-dup search).
    */
  def simhashDocs(spark: SparkSession, dir: String): DataFrame = {
    val sim = graft.functions.GraftFunctions.simhash64(col("text"))
    docs(spark, dir)
      .select(col("doc_id"), sim.as("simhash"),
        shiftrightunsigned(sim, 48).as("prefix16"))
  }

  /** SimHash near-dup pairs: block on the 16-bit prefix, verify Hamming
    * distance <= maxHamming via bit_count(xor).
    */
  def simhashPairs(spark: SparkSession, dir: String, maxHamming: Int = 8): DataFrame = {
    val d = simhashDocs(spark, dir)
    d.as("a").join(d.as("b"),
        col("a.prefix16") === col("b.prefix16") && col("a.doc_id") < col("b.doc_id"))
      .withColumn("hamming", bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"), col("hamming"))
  }

  /** Exact n-gram Jaccard with cheap blocking: same lang + token-count bucket.
    * The blocking keeps the self-join from going quadratic on the corpus.
    */
  def ngramJaccardPairs(
      spark: SparkSession,
      dir: String,
      shingleSize: Int = 2,
      threshold: Double = 0.06
  ): DataFrame = {
    // materialize the shingle table once: a self-join would otherwise
    // recompute the shingling scan on both sides
    // shingle arrays pre-sorted once so the pairwise Jaccard is a native
    // two-pointer merge scan (no per-pair hash sets)
    val base = docs(spark, dir).select(
      col("doc_id"), col("lang"),
      (size(split(col("text"), "\\s+")) / 32).as("len_bucket"),
      shingles(col("text"), shingleSize).as("sh")) // already sorted distinct
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    base.as("a").join(base.as("b"),
        col("a.lang") === col("b.lang") &&
          col("a.len_bucket") === col("b.len_bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .withColumn("jaccard",
        graft.functions.GraftFunctions.jaccardSorted(col("a.sh"), col("b.sh")))
      .filter(col("jaccard") >= threshold)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        round(col("jaccard"), 6).as("jaccard"))
  }
}
