package graft.spark

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Multi-writer commit arbitration for the Iceberg-emulating SnapshotStore:
  * concurrent mergers must serialize through the manifest CAS with no lost
  * updates, no duplicate keys, and a dense snapshot chain — the semantics a
  * real Iceberg catalog provides and the one part of the drop-in that IS
  * testable without the Iceberg jar.
  */
class StoreConcurrencySpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-store-concurrency")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def runConcurrently(n: Int)(body: Int => Unit): Unit = {
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val start = new java.util.concurrent.CountDownLatch(1)
    val threads = (0 until n).map { t =>
      val th = new Thread(() => {
        start.await()
        try body(t) catch { case e: Throwable => errors.add(e) }
      })
      th.start(); th
    }
    start.countDown()
    threads.foreach(_.join())
    if (!errors.isEmpty) throw errors.peek()
  }

  test("disjoint concurrent mergers: every row commits, chain stays dense") {
    val ss = spark; import ss.implicits._
    val dir = Files.createTempDirectory("graft-mw-disjoint").toString
    val store = new SnapshotStore(dir)
    val writers = 4
    val rounds = 3
    val keysPerMerge = 20
    runConcurrently(writers) { t =>
      for (r <- 0 until rounds) {
        val rows = (0 until keysPerMerge).map(k => (s"w$t-r$r-k$k", t.toLong))
        store.merge(rows.toDF("url", "payload"), "url")
      }
    }
    val table = store.read(spark).get
    assert(table.count() == writers * rounds * keysPerMerge)
    assert(table.select("url").distinct().count() ==
      writers * rounds * keysPerMerge)
    // every commit won exactly one id: the chain is dense 0..N-1
    assert(store.currentSnapshotId.contains(writers * rounds - 1L))
  }

  test("overlapping concurrent mergers: each key commits exactly once") {
    val ss = spark; import ss.implicits._
    val dir = Files.createTempDirectory("graft-mw-overlap").toString
    val store = new SnapshotStore(dir)
    val keys = (0 until 50).map(k => (s"shared-$k", 0L))
    runConcurrently(4) { _ =>
      store.merge(keys.toDF("url", "payload"), "url")
    }
    val table = store.read(spark).get
    // losers re-validated against the winner's snapshot: no duplicates
    assert(table.count() == 50, "duplicate keys leaked through the race")
    assert(table.select("url").distinct().count() == 50)
    // all four merges committed a (possibly empty) snapshot
    assert(store.currentSnapshotId.contains(3L))
  }

  test("snapshot expiry removes old manifests + unreferenced data files only") {
    val ss = spark; import ss.implicits._
    val dir = Files.createTempDirectory("graft-expire").toString
    val store = new SnapshotStore(dir)
    for (r <- 0 until 5)
      store.merge((0 until 10).map(k => (s"r$r-k$k", r.toLong)).toDF("url", "v"), "url")
    val before = store.currentFiles
    assert(store.currentSnapshotId.contains(4L))
    store.expireSnapshots(keepLast = 2)
    // manifests v0..v2 gone, v3/v4 kept, current table byte-identical
    for (id <- 0 to 2)
      assert(!Files.exists(java.nio.file.Paths.get(dir, "_snapshots", s"v$id.json")), s"v$id")
    assert(Files.exists(java.nio.file.Paths.get(dir, "_snapshots", "v3.json")))
    assert(store.currentFiles == before)
    assert(store.read(spark).get.count() == 50)
    // every file the kept manifests reference still exists; no orphans of
    // the expired ones linger in data/ beyond the kept set
    before.foreach(f => assert(Files.exists(java.nio.file.Paths.get(f)), f))
  }

  test("schema evolution: a later snapshot may add a column; old rows read null") {
    val ss = spark; import ss.implicits._
    val dir = Files.createTempDirectory("graft-schema").toString
    val store = new SnapshotStore(dir)
    store.merge((0 until 5).map(k => (s"a$k", 1L)).toDF("url", "v"), "url")
    store.merge((0 until 5).map(k => (s"b$k", 2L, "en")).toDF("url", "v", "lang"), "url")
    val table = store.read(spark).get
    assert(table.columns.toSet == Set("url", "v", "lang"))
    assert(table.filter("lang IS NULL").count() == 5)  // pre-evolution rows
    assert(table.filter("lang = 'en'").count() == 5)
  }

  test("kill-and-resume still holds with listing-derived current snapshot") {
    val ss = spark; import ss.implicits._
    val dir = Files.createTempDirectory("graft-mw-resume").toString
    val store = new SnapshotStore(dir)
    store.merge((0 until 30).map(k => (s"u$k", 1L)).toDF("url", "v"), "url")
    // simulate a crash AFTER data write but BEFORE commit: orphan data files
    val orphan = java.nio.file.Paths.get(dir, "data", "snap-99-deadbeef")
    Files.createDirectories(orphan)
    Files.write(orphan.resolve("part-0.parquet"), Array[Byte](1, 2, 3))
    // resume: re-merge the full input; only missing keys land
    store.merge((0 until 40).map(k => (s"u$k", 2L)).toDF("url", "v"), "url")
    val table = store.read(spark).get
    assert(table.count() == 40)
    assert(table.filter("v = 1").count() == 30) // originals not overwritten
  }
}
