package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The composed cleaning pipeline on the dup-structured generated corpus:
  * stage counts must match the generator's known membership, and lineage
  * must conserve end to end.
  */
class CleanJobSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-clean-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("corpus generator is deterministic with the declared dup structure") {
    val a = CleanJob.DocCorpus.genDoc(123)
    val b = CleanJob.DocCorpus.genDoc(123)
    assert(a == b)
    // id%10==7 is an exact copy of the decade base
    assert(CleanJob.DocCorpus.genDoc(47).text == CleanJob.DocCorpus.genDoc(40).text)
    // id%10==8 differs from the base by at most 2 word substitutions
    val base = CleanJob.DocCorpus.genDoc(40).text.split(" ")
    val near = CleanJob.DocCorpus.genDoc(48).text.split(" ")
    assert(base.length == near.length)
    assert(base.zip(near).count { case (x, y) => x != y } <= 2)
    // id%10==9 re-crawls the decade base's URL: same canonical form,
    // different raw bytes; fresh TEXT (url dedup and text dedup catch
    // different planted populations)
    assert(CleanJob.DocCorpus.genDoc(49).url !=
      CleanJob.DocCorpus.genDoc(40).url)
    assert(CleanJob.DocCorpus.genDoc(49).text !=
      CleanJob.DocCorpus.genDoc(40).text)
    // id%10==5 carries the fixed 12-word boilerplate tail; two carriers
    // from different decades share EXACTLY that run
    val bp = CleanJob.DocCorpus.Boilerplate.mkString(" ")
    val c45 = CleanJob.DocCorpus.genDoc(45).text
    val c55 = CleanJob.DocCorpus.genDoc(55).text
    assert(c45.endsWith(" " + bp) && c55.endsWith(" " + bp))
    assert(c45.stripSuffix(bp) != c55.stripSuffix(bp))
    assert(!CleanJob.DocCorpus.genDoc(40).text.contains(bp))
  }

  test("pipeline degenerate inputs: single doc and empty near-dup graph") {
    val ss = spark; import ss.implicits._
    val out = Files.createTempDirectory("graft-clean-tiny").toString
    CleanJob.DocCorpus.generate(spark, 1L, partitions = 1)
      .write.mode("overwrite").parquet(s"$out/corpus/documents.parquet")
    val stats = CleanJob.run(spark, s"$out/corpus", out)
    assert(stats.nInput == 1 && stats.urlRemoved == 0 &&
      stats.exactRemoved == 0 &&
      stats.nearPairs == 0 && stats.nearRemoved == 0)
    assert(stats.nFinal + stats.qualityRemoved == 1)
    // CC on an empty edge list converges immediately to an empty labeling
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(graft.ops.Dedup.connectedComponents(empty).count() == 0)
  }

  test("pipeline removes the planted dups and lineage conserves") {
    val out = Files.createTempDirectory("graft-clean").toString
    val n = 500L
    CleanJob.DocCorpus.generate(spark, n, partitions = 4)
      .write.mode("overwrite").parquet(s"$out/corpus/documents.parquet")
    val stats = CleanJob.run(spark, s"$out/corpus", out)

    assert(stats.nInput == n)
    // stage 0 removes exactly the 50 planted URL re-crawls (id%10==9),
    // whose TEXT is fresh — only the canonical URL collides
    assert(stats.urlRemoved == n / 10, stats.toString)
    // 50 planted exact dups (+ any near-dups whose 2 seeded substitutions
    // both drew the original word, degenerating to exact)
    assert(stats.exactRemoved >= n / 10 && stats.exactRemoved <= n / 10 + 3,
      stats.toString)
    // the planted near dups pair with their decade base; a handful fall
    // under the Jaccard threshold (short docs, double-substitution)
    assert(stats.nearRemoved >= (n / 10) * 8 / 10 &&
      stats.nearRemoved <= n / 10, stats.toString)
    // pairs are (base, near) two-cliques: one survivor each
    assert(stats.nearClusters == stats.nearRemoved, stats.toString)
    // run() asserts conservation internally; re-check from the outputs
    val finalCount = spark.read.parquet(s"$out/clean/documents.parquet").count()
    assert(finalCount == stats.nFinal)
    assert(stats.nFinal ==
      n - stats.urlRemoved - stats.exactRemoved - stats.nearRemoved -
        stats.qualityRemoved)
    // the clean table has no remaining exact dups
    val distinctTexts = spark.read.parquet(s"$out/clean/documents.parquet")
      .select("text").distinct().count()
    assert(distinctTexts == stats.nFinal)

    // stage 5: every surviving boilerplate carrier (id%10==5) is rewritten
    // (its 12 planted tokens cut), PLUS both members of any near-dup pair
    // that slipped under the LSH threshold and survived doc-level dedup —
    // the substring stage catching what document-level dedup missed is
    // exactly why production pipelines run it last
    import org.apache.spark.sql.functions.col
    val bp = CleanJob.DocCorpus.Boilerplate.mkString(" ")
    val clean = spark.read.parquet(s"$out/clean/documents.parquet")
    val fin = spark.read.parquet(s"$out/final/documents.parquet")
    assert(fin.count() == stats.nFinal)
    val cleanIds = clean.select("doc_id").collect().map(_.getLong(0)).toSet
    val carriers = cleanIds.count(_ % 10 == 5)
    assert(carriers >= 2, s"too few surviving carriers: $carriers")
    // near pairs whose base AND near both reached the clean table: their
    // shared runs (>= 10 tokens: 2 substitutions split >= 30 words into
    // runs of >= ~len/3) are cross-doc duplicated spans stage 5 must cut
    val slippedPairDocs = (0L until n by 10L)
      .filter(b => cleanIds.contains(b) && cleanIds.contains(b + 8))
      .flatMap(b => Seq(b, b + 8)).toSet
    assert(stats.substrRewritten == carriers + slippedPairDocs.size,
      s"rewritten ${stats.substrRewritten} != $carriers carriers + " +
        s"${slippedPairDocs.size} slipped near docs")
    assert(stats.substrTokensRemoved >= 12 * carriers, stats.toString)
    assert(fin.filter(col("text").contains(bp)).count() == 0)
    // nothing else is touched: changed docs are exactly carriers + slipped
    val changed = fin.select(col("doc_id"), col("text").as("t2"))
      .join(clean.select(col("doc_id"), col("text")), Seq("doc_id"))
      .filter(col("t2") =!= col("text"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(changed == cleanIds.filter(_ % 10 == 5) ++ slippedPairDocs,
      s"unexpected rewrites: ${changed.filter(id => id % 10 != 5 && !slippedPairDocs(id))}")

    // stage 6: the line battery delivers the gated-survivor table; only
    // whole lines are removed, so every delivered text's word sequence is
    // a subsequence of its stage-5 text
    val delivered = spark.read.parquet(s"$out/delivered/documents.parquet")
    assert(delivered.count() == stats.nDelivered)
    assert(stats.nDelivered == stats.nFinal - stats.lineGated)
    // vocabulary contains the blocklist token, so line drops must occur
    assert(stats.lineLinesDropped > 0, stats.toString)
    val finTexts = fin.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    delivered.select(col("doc_id"), col("text")).collect().foreach { r =>
      val a = finTexts(r.getLong(0)).split(" ")
      val b = r.getString(1).split(" ")
      var i = 0
      a.foreach { w => if (i < b.length && b(i) == w) i += 1 }
      assert(i == b.length,
        s"doc ${r.getLong(0)}: delivered text is not a word-subsequence")
      // blocklist token never survives (any line containing it is dropped)
      assert(!b.contains("graft"), s"doc ${r.getLong(0)} kept a graft line")
    }

    // stage 7: the Gopher repetition gate releases exactly the delivered
    // docs that pass all thirteen thresholds (qt29's operator, cross-checked
    // here by rerunning it over the delivered table)
    val released = spark.read.parquet(s"$out/released/documents.parquet")
    assert(released.count() == stats.nReleased)
    assert(stats.nReleased == stats.nDelivered - stats.repetitionGated)
    val passIds = graft.ops.TextAnalysis.gopherRepetition(spark, s"$out/delivered")
      .filter(col("passes_repetition") === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val releasedIds = released.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(releasedIds == passIds,
      s"released set != repetition-pass set (${releasedIds.size} vs ${passIds.size})")

    // stage 8: every released doc gets exactly one split; quotas conserve
    // and any residual >= 0.1-similar pair co-locates (the leakage claim —
    // the star guard admits a SUPERSET of any verified pair set, so the
    // check runs against the verified 0.1-threshold pairs)
    val splits = spark.read.parquet(s"$out/splits/splits.parquet")
    assert(splits.count() == stats.nReleased)
    assert(stats.splitTrain + stats.splitVal + stats.splitTest ==
      stats.nReleased, stats.toString)
    assert(splits.select("doc_id").distinct().count() == stats.nReleased)
    val splitOf = splits.select(col("doc_id"), col("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    graft.ops.Dedup.minhashLshPairsPortable(spark, s"$out/released",
        bands = 2, rowsPerBand = 4, threshold = 0.1)
      .select("doc_a", "doc_b").collect().foreach { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        assert(splitOf(a) == splitOf(b), s"LEAK: ($a,$b) straddles splits")
      }
  }

  test("kill-and-resume: completed stages are skipped, lineage identical") {
    import org.apache.spark.sql.functions.col
    val out = Files.createTempDirectory("graft-clean-resume").toString
    val n = 300L
    CleanJob.DocCorpus.generate(spark, n, partitions = 4)
      .write.mode("overwrite").parquet(s"$out/corpus/documents.parquet")
    val full = CleanJob.run(spark, s"$out/corpus", out)

    // simulate a kill between stage 3 and 4: drop the downstream markers
    // (their parquet may be partial in a real kill; overwrite handles it)
    assert(new java.io.File(s"$out/stage_quality_gate.stats").delete())
    assert(new java.io.File(s"$out/stage_substr.stats").delete())
    val exactParquet = new java.io.File(s"$out/stage_exact")
      .listFiles().map(f => f.getName -> f.lastModified()).toMap
    val resumed = CleanJob.run(spark, s"$out/corpus", out, resume = true)
    // identical lineage end to end
    assert(resumed.copy(stageSecs = Map.empty) ==
      full.copy(stageSecs = Map.empty), s"$resumed vs $full")
    // upstream stages were NOT recomputed: markers served them (0.0 secs)
    // and the exact stage's parquet bytes were never rewritten
    Seq("url", "exact", "lsh_pairs", "cc_survivors").foreach { s =>
      assert(resumed.stageSecs(s) == 0.0, s"stage $s recomputed")
    }
    assert(resumed.stageSecs("quality_gate") > 0.0)
    assert(new java.io.File(s"$out/stage_exact")
      .listFiles().map(f => f.getName -> f.lastModified()).toMap == exactParquet)

    // marker self-invalidation: a DIFFERENT corpus into the same outDir
    // must recompute, not serve stale stage outputs
    CleanJob.DocCorpus.generate(spark, n + 100, partitions = 4)
      .write.mode("overwrite").parquet(s"$out/corpus/documents.parquet")
    val regen = CleanJob.run(spark, s"$out/corpus", out, resume = true)
    assert(regen.nInput == n + 100)
    assert(regen.stageSecs("url") > 0.0, "stale url marker served")
    assert(spark.read.parquet(s"$out/final/documents.parquet").count() ==
      regen.nFinal)
    // re-check conservation on the regenerated run's outputs
    assert(regen.nFinal == regen.nInput - regen.urlRemoved -
      regen.exactRemoved - regen.nearRemoved - regen.qualityRemoved)
    assert(spark.read.parquet(s"$out/final/documents.parquet")
      .filter(col("text").contains(CleanJob.DocCorpus.Boilerplate.mkString(" ")))
      .count() == 0)
  }

  test("incremental admission: persisted index equals recompute, flags the " +
      "planted batch structure") {
    import org.apache.spark.sql.functions._
    val out = Files.createTempDirectory("graft-incr").toString
    val n = 3000L
    CleanJob.DocCorpus.generate(spark, n, partitions = 4)
      .write.mode("overwrite").parquet(s"$out/corpus/documents.parquet")
    val batch = CleanJob.DocCorpus.generateBatch(spark, n, 300, 4).toDF()
      .localCheckpoint(true)
    val idx = IncrementalDedupJob.buildIndex(spark, s"$out/corpus", s"$out/index")
    assert(idx.corpusDocs == n && idx.fpRows == n)
    assert(idx.bandRows == 4 * idx.shingleRows) // 4 band keys per doc, none capped
    val withIndex = IncrementalDedupJob.admitBatch(batch,
      spark.read.parquet(s"$out/index/fp.parquet"),
      spark.read.parquet(s"$out/index/shingles.parquet"),
      spark.read.parquet(s"$out/index/bands.parquet"))
    val docs = spark.read.parquet(s"$out/corpus/documents.parquet")
    val sh = graft.ops.Dedup.shinglesOf(docs, 2)
    val recomputed = IncrementalDedupJob.admitBatch(batch,
      docs.select(col("doc_id"), graft.ops.Dedup.fingerprintCol(col("text")).as("fp")),
      sh, graft.ops.Dedup.bandTableOf(sh))
    assert(withIndex.exceptAll(recomputed).count() == 0)
    assert(recomputed.exceptAll(withIndex).count() == 0)
    val rows = withIndex.collect()
    // j%3==0 batch docs copy a corpus decade base verbatim -> exact dups
    val exact = rows.filter(_.getAs[Int]("exact_dup") == 1).map(_.getLong(0)).toSet
    assert((0L until 300L).filter(_ % 3 == 0).map(n + _).toSet.subsetOf(exact),
      s"missed exact dups: ${exact.size}")
    // j%3==1 near variants: the 4x2 band predicate catches nearly all
    val nearIds = rows.filter(r => r.getAs[Int]("exact_dup") == 0 &&
      r.getAs[Long]("n_near") > 0).map(_.getLong(0)).toSet
    val planted = (0L until 300L).filter(_ % 3 == 1).map(n + _).toSet
    assert((planted & nearIds).size >= (planted.size * 9) / 10,
      s"near recall ${(planted & nearIds).size}/${planted.size}")
    // admitted set excludes every exact dup
    val admitted = rows.filter(_.getAs[Boolean]("admit")).map(_.getLong(0)).toSet
    assert((admitted & exact).isEmpty)
  }
}
