package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming tests: watermarked windowed aggregation, stateful
  * sessionization, and the streaming extraction path landing on the
  * idempotent snapshot store.
  */
class StreamOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-stream-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.streaming.checkpointLocation",
        Files.createTempDirectory("graft-ckpt").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def ts(minutes: Long): Timestamp = new Timestamp(1700000000000L + minutes * 60000L)

  test("watermarked hourly window aggregation over a stream") {
    val ss = spark; import ss.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamOps.Event]
    val q = StreamOps.hourlyCounts(input.toDF())
      .writeStream.format("memory").queryName("hourly")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        StreamOps.Event(1, ts(0), 1, "click", 1.0),
        StreamOps.Event(2, ts(10), 1, "click", 2.0),
        StreamOps.Event(3, ts(70), 2, "view", 3.0))
      q.processAllAvailable()
      // advance the watermark far enough to close the first windows
      input.addData(StreamOps.Event(4, ts(400), 3, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT event_type, n_events FROM hourly").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(rows.contains(("click", 2L)), s"got $rows")
      assert(rows.contains(("view", 1L)), s"got $rows")
    } finally q.stop()
  }

  test("stateful sessionization closes sessions on the 30min gap") {
    val ss = spark; import ss.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamOps.Event]
    val q = StreamOps.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: two events 5min apart (one session), then 60min silence, one more
      input.addData(
        StreamOps.Event(1, ts(0), 1, "click", 1.0),
        StreamOps.Event(2, ts(5), 1, "click", 1.0),
        StreamOps.Event(3, ts(65), 1, "click", 1.0))
      q.processAllAvailable()
      input.addData(StreamOps.Event(9, ts(600), 2, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT user_id, n_events FROM sessions WHERE user_id = 1")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.contains((1L, 2L)), s"expected the closed 2-event session, got ${rows.toSeq}")
    } finally q.stop()
  }

  test("streaming dedup keeps one doc per fingerprint within the watermark") {
    val ss = spark; import ss.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val q = StreamOps.streamingDedup(
        input.toDF().toDF("doc_id", "ts", "text"))
      .writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (0L, ts(0), "the quick brown fox"),
        (1L, ts(1), "THE  quick   brown fox"), // normalized dup of doc 0
        (2L, ts(2), "completely different text"))
      q.processAllAvailable()
      input.addData((3L, ts(3), "the quick brown fox")) // dup again
      q.processAllAvailable()
      val ids = spark.sql("SELECT doc_id FROM dedup").collect().map(_.getLong(0)).toSet
      assert(ids.contains(2L))
      // exactly one of the three fox docs survives
      assert((ids & Set(0L, 1L, 3L)).size == 1, ids.toString)
    } finally q.stop()
  }

  test("streaming URL frontier admits one fetch per canonical URL") {
    val ss = spark; import ss.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val q = StreamOps.streamingUrlFrontier(
        input.toDF().toDF("fetch_id", "ts", "url"))
      .writeStream.format("memory").queryName("frontier")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (0L, ts(0), "HTTPS://A.Example.com/p/1/?utm_source=x#top"),
        (1L, ts(1), "https://a.example.com/p/1"), // canon dup of fetch 0
        (2L, ts(2), "https://b.example.com/p/2?v=3"))
      q.processAllAvailable()
      input.addData((3L, ts(3), "https://a.example.com/p/1?utm_medium=y"))
      q.processAllAvailable()
      val rows = spark.sql("SELECT fetch_id, canon_url FROM frontier").collect()
      val ids = rows.map(_.getLong(0)).toSet
      assert(ids.contains(2L))
      // exactly one of the three a.example.com/p/1 fetches is admitted
      assert((ids & Set(0L, 1L, 3L)).size == 1, ids.toString)
      // and its canonical form is the normalized one
      assert(rows.map(_.getString(1)).toSet ==
        Set("https://a.example.com/p/1", "https://b.example.com/p/2?v=3"))
    } finally q.stop()
  }

  test("streaming extraction merges idempotently into the snapshot store") {
    val ss = spark; import ss.implicits._
    implicit val sqlCtx = spark.sqlContext
    val store = new graft.spark.SnapshotStore(
      Files.createTempDirectory("graft-stream-store").toString)
    val input = MemoryStream[graft.spark.PagesTable.PageRow]
    val q = StreamOps.streamingExtract(input.toDF(), store).start()
    try {
      val docs = (0L until 10L).map(graft.spark.PagesTable.genDoc(_))
      input.addData(docs: _*)
      q.processAllAvailable()
      // replay the same batch: merge must be a no-op
      input.addData(docs: _*)
      q.processAllAvailable()
      val tbl = store.read(spark).get
      assert(tbl.count() == 10)
      assert(tbl.select("url").distinct().count() == 10)
    } finally q.stop()
  }

  test("streaming drift reads zero for in-distribution batches, positive for shifted") {
    val ss = spark; import ss.implicits._
    implicit val sqlCtx = spark.sqlContext
    // reference: yesterday's 256-row histogram summary of a tiny corpus
    val refDocs = Seq.tabulate(8)(i => s"stable corpus words block $i")
      .toDF("text")
    val refHist = graft.ops.TextAnalysis.tokenHistogram(refDocs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      .toDF("bucket", "cnt") // materialized: the persisted summary stand-in
    val results = scala.collection.mutable.Map[Long, (Long, Long, Double)]()
    val input = MemoryStream[String]
    val q = StreamOps.streamingDrift(input.toDF().withColumnRenamed("value", "text"),
      refHist) { (drift, id) =>
      val r = drift.collect()(0)
      results.synchronized {
        results(id) = ((r.getLong(0), r.getLong(1), r.getDouble(2))) }
    }.start()
    try {
      // batch 0: the exact reference text mix -> identical distribution,
      // identical totals -> p == q in every bucket -> jsd exactly 0
      input.addData(Seq.tabulate(8)(i => s"stable corpus words block $i"): _*)
      q.processAllAvailable()
      // batch 1: disjoint vocabulary -> positive drift
      input.addData("zq xv qqq vvv kkk jjj www yyy")
      q.processAllAvailable()
      val r0 = results.synchronized(results(0))
      val r1 = results.synchronized(results(1))
      assert(r0._1 == r0._2, s"batch 0 totals ${r0._1} vs ref ${r0._2}")
      assert(r0._3 == 0.0, s"in-distribution batch read jsd ${r0._3}")
      assert(r1._3 > 0.0, s"shifted batch read jsd ${r1._3}")
      assert(results.size == 2)
    } finally q.stop()
  }

  test("streaming admission flags each micro-batch against the static index") {
    val ss = spark; import ss.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val out = Files.createTempDirectory("graft-stream-admit").toString
    // corpus + persisted index (the daily batch artifact)
    graft.spark.CleanJob.DocCorpus.generate(spark, 1000, 4)
      .write.mode("overwrite").parquet(s"$out/corpus/documents.parquet")
    graft.spark.IncrementalDedupJob.buildIndex(spark, s"$out/corpus", s"$out/index")
    val fp = spark.read.parquet(s"$out/index/fp.parquet")
    val sh = spark.read.parquet(s"$out/index/shingles.parquet")
    val bands = spark.read.parquet(s"$out/index/bands.parquet")
    val results = scala.collection.mutable.Map[Long, Array[org.apache.spark.sql.Row]]()
    val input = MemoryStream[graft.spark.CleanJob.DocCorpus.DocRow]
    val q = StreamOps.streamingAdmission(input.toDF(), fp, sh, bands) {
      (admitted, id) => results.synchronized {
        results(id) = admitted.collect() }
    }.start()
    try {
      // batch 0: an exact copy of a corpus doc + a fresh doc
      input.addData(
        graft.spark.CleanJob.DocCorpus.genBatchDoc(1000, 0), // j%3==0: exact
        graft.spark.CleanJob.DocCorpus.genBatchDoc(1000, 2)) // j%3==2: fresh
      q.processAllAvailable()
      // batch 1: a near variant
      input.addData(graft.spark.CleanJob.DocCorpus.genBatchDoc(1000, 1))
      q.processAllAvailable()
      val all = results.synchronized(results.values.flatten.toSeq)
      val byId = all.map(r => r.getLong(0) -> r).toMap
      assert(byId(1000L).getAs[Int]("exact_dup") == 1) // exact copy flagged
      assert(byId(1002L).getAs[Int]("exact_dup") == 0 &&
        byId(1002L).getAs[Boolean]("admit")) // fresh doc admitted
      assert(byId(1001L).getAs[Long]("n_near") > 0) // near variant flagged
      assert(results.size == 2) // one admission result per micro-batch
    } finally q.stop()
  }

  test("streaming mini-batch k-means tracks cluster means exactly per batch") {
    val ss = spark; import ss.implicits._
    implicit val sqlCtx = spark.sqlContext
    // two planted clusters in int64 fixed-point space: around (0, 0) and
    // around (1e6, 1e6); centroids seeded off-center
    val model = new StreamOps.MiniBatchKmeans(
      Array(Array(100000L, 0L), Array(800000L, 900000L)))
    // single-threaded replay of the exact update rule
    val expCents = Array(Array(100000L, 0L), Array(800000L, 900000L))
    val expCounts = Array(0L, 0L)
    def replay(batch: Seq[Seq[Long]]): Unit = {
      val byC = batch.groupBy { v =>
        (0 to 1).minBy { c =>
          val d = (0 to 1).map(i => v(i) - expCents(c)(i))
          d.map(x => x * x).sum * 2 + c // *2+c: tie to smaller cid
        }
      }
      byC.foreach { case (c, vs) =>
        val b = vs.length.toLong
        val nNew = expCounts(c) + b
        (0 to 1).foreach { i =>
          val s = vs.map(_(i)).sum
          expCents(c)(i) += Math.floorDiv(s - expCents(c)(i) * b, nNew)
        }
        expCounts(c) = nNew
      }
    }
    val summaries = scala.collection.mutable.Map[Long, Map[Int, Long]]()
    val input = MemoryStream[(Long, Seq[Long])]
    val q = StreamOps.streamingKmeans(
      input.toDF().selectExpr("_1 AS vec_id", "_2 AS qv"), model) {
      (summary, id) =>
        val m = summary.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        summaries.synchronized { summaries(id) = m }
    }.start()
    try {
      val b0 = Seq(Seq(10L, 20L), Seq(-30L, 5L), Seq(999000L, 1001000L),
        Seq(1002000L, 998000L), Seq(40L, -10L))
      val b1 = Seq(Seq(0L, 0L), Seq(1000000L, 1000000L), Seq(5L, 5L))
      input.addData(b0.zipWithIndex.map { case (v, i) => (i.toLong, v) }: _*)
      q.processAllAvailable()
      replay(b0)
      // the model state after batch 0 equals the exact replay
      assert(model.centroids.map(_.toSeq).toSeq == expCents.map(_.toSeq).toSeq,
        s"${model.centroids.map(_.mkString(",")).mkString(" | ")}")
      assert(model.centerCounts.toSeq == expCounts.toSeq)
      input.addData(b1.zipWithIndex.map { case (v, i) => (10L + i, v) }: _*)
      q.processAllAvailable()
      replay(b1)
      assert(model.centroids.map(_.toSeq).toSeq == expCents.map(_.toSeq).toSeq)
      assert(model.centerCounts.toSeq == expCounts.toSeq)
      // per-batch summaries report the pre-update assignment counts
      assert(summaries.synchronized(summaries(0)) == Map(0 -> 3L, 1 -> 2L))
      assert(summaries.synchronized(summaries(1)) == Map(0 -> 2L, 1 -> 1L))
      // after two batches of well-separated data the centroids sit near the
      // planted means, far from the off-center seeds
      val c = model.centroids
      assert(math.abs(c(0)(0)) < 50000L && math.abs(c(0)(1)) < 50000L,
        c(0).mkString(","))
      assert(math.abs(c(1)(0) - 1000000L) < 50000L &&
        math.abs(c(1)(1) - 1000000L) < 50000L, c(1).mkString(","))
      // restart semantics: a model resumed from persisted (centroids,
      // counts) continues exactly where an uninterrupted one would —
      // replay b0 into a fresh model, resume from its state, apply b1,
      // and land on the same final state as the streaming run above
      val ss2 = spark; import ss2.implicits._
      def toDf(b: Seq[Seq[Long]]) =
        b.zipWithIndex.map { case (v, i) => (i.toLong, v) }
          .toDF("vec_id", "qv")
      val m1 = new StreamOps.MiniBatchKmeans(
        Array(Array(100000L, 0L), Array(800000L, 900000L)))
      m1.update(toDf(b0))
      val m2 = StreamOps.MiniBatchKmeans.resume(m1.centroids, m1.centerCounts)
      m2.update(toDf(b1))
      assert(m2.centroids.map(_.toSeq).toSeq == model.centroids.map(_.toSeq).toSeq)
      assert(m2.centerCounts.toSeq == model.centerCounts.toSeq)
    } finally q.stop()
  }
}
