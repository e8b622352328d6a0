package graft.ops

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral tests for the URL curation ops on a crafted corpus whose
  * doc_ids are chosen to collide on the planted canonical URL (pid =
  * doc_id % 300) and to populate one host beyond the quota.
  */
class UrlCurationSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _
  private var dir: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-url-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dir = Files.createTempDirectory("graft-url").toString
    val ss = spark; import ss.implicits._
    // pid groups: {0,300,600}->host d0.spam.example, {1,301,601}->d1,
    // {2,302,602,902,1202}->d2 (5 docs, over cap=3), {7}->d7.spam, {37}->d37
    Seq(
      (0L, 40L), (300L, 35L), (600L, 25L),
      (1L, 45L), (301L, 55L), (601L, 15L),
      (2L, 10L), (302L, 50L), (602L, 30L), (902L, 70L), (1202L, 20L),
      (7L, 33L), (37L, 44L)
    ).map { case (id, nc) => (id, s"doc $id body", nc) }
      .toDF("doc_id", "text", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("qu2: planted raw URLs carry every noise family; canon undoes them") {
    val rows = UrlCuration.urlDedup(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // byte-exact on the messiest doc: uppercase scheme+host, trailing
    // slash, tracking + real params, fragment
    assert(rows(0L).getAs[String]("raw_url") ==
      "HTTPS://D0.SPAM.EXAMPLE/p/0/?utm_source=feed&v=2#sec1")
    assert(rows(0L).getAs[String]("canon_url") ==
      "https://d0.spam.example/p/0?v=2")
    // real param survives alone too (902 % 11 == 0, even -> utm planted)
    assert(rows(902L).getAs[String]("canon_url") ==
      "https://d2.example.com/p/2?v=2")
    // plain tracking-only URLs canonicalize to the bare path
    assert(rows(1L).getAs[String]("canon_url") == "https://d1.example.com/p/1")
  }

  test("qu2: keep-first dedup groups exactly the same-canon docs") {
    val rows = UrlCuration.urlDedup(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("keeper_id"), r.getAs[Int]("is_dup"))).toList
    val keeper = rows.map(r => r._1 -> r._2).toMap
    assert(keeper(1L) == 1L && keeper(301L) == 1L && keeper(601L) == 1L)
    assert(keeper(2L) == 2L && keeper(302L) == 2L && keeper(602L) == 2L &&
      keeper(1202L) == 2L)
    assert(keeper(902L) == 902L, "the ?v=2 variant must NOT merge")
    assert(keeper(300L) == 300L && keeper(600L) == 300L)
    assert(keeper(0L) == 0L, "doc 0 keeps its real param, so it stands alone")
    assert(rows.map(_._3).sum == 6)
  }

  test("qu2: canonicalization is idempotent") {
    val u = UrlCuration.urlDedup(spark, dir)
    val twice = u.select(col("doc_id"), col("canon_url"),
      UrlCuration.canonicalize(col("canon_url")).as("again"))
      .collect()
    twice.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"doc ${r.getLong(0)}: ${r.getString(1)} re-canonicalized to ${r.getString(2)}")
    }
  }

  test("qu3: snapshot dedup keeps the LATEST fetch per canonical URL") {
    val rows = UrlCuration.snapshotDedup(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("warc_epoch"), r.getAs[Long]("keeper_id"),
          r.getAs[Long]("keeper_epoch"), r.getAs[Int]("is_stale")))).toMap
    assert(rows.size == 13)
    // epoch plant: 1704067200 + (id%97)*86400 + (id%13)*3600
    assert(rows(601L)._1 == 1704067200L + 19L * 86400 + 3L * 3600)
    // {1,301,601} share a canon URL; 601 has the newest plant -> keeper
    assert(rows(1L)._2 == 601L && rows(301L)._2 == 601L &&
      rows(601L) == ((1705719600L, 601L, 1705719600L, 0)))
    // {2,302,602,1202}: 1202 newest
    Seq(2L, 302L, 602L).foreach(id => assert(rows(id)._2 == 1202L &&
      rows(id)._4 == 1))
    assert(rows(1202L)._4 == 0)
    // keep-LATEST flips the qu2 keep-first choice on {300,600}: 600 wins
    assert(rows(300L)._2 == 600L && rows(600L)._4 == 0)
    // singletons keep themselves, keeper_epoch decodes back to their own
    Seq(0L, 7L, 37L, 902L).foreach { id =>
      assert(rows(id)._2 == id && rows(id)._3 == rows(id)._1 &&
        rows(id)._4 == 0, s"doc $id: ${rows(id)}")
    }
  }

  test("qu1: per-host quota keeps the longest docs; blocklist zeroes spam") {
    val rows = UrlCuration.domainCap(spark, dir, cap = 3).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("domain"), r.getAs[Long]("domain_docs"),
          r.getAs[Int]("domain_rank"), r.getAs[Int]("blocked"),
          r.getAs[Int]("kept")))).toMap
    assert(rows.size == 13)
    // d2.example.com: 5 docs, quota 3 -> keep 902(70), 302(50), 602(30)
    assert(rows(902L) == (("d2.example.com", 5L, 1, 0, 1)))
    assert(rows(302L) == (("d2.example.com", 5L, 2, 0, 1)))
    assert(rows(602L) == (("d2.example.com", 5L, 3, 0, 1)))
    assert(rows(1202L) == (("d2.example.com", 5L, 0, 0, 0)))
    assert(rows(2L) == (("d2.example.com", 5L, 0, 0, 0)))
    // d1: all 3 within quota, ranked by n_chars desc
    assert(rows(301L)._3 == 1 && rows(1L)._3 == 2 && rows(601L)._3 == 3)
    assert(rows(301L)._5 == 1 && rows(601L)._5 == 1)
    // spam hosts: ranked but never kept
    Seq(0L, 300L, 600L, 7L).foreach { id =>
      assert(rows(id)._4 == 1 && rows(id)._5 == 0, s"doc $id: ${rows(id)}")
    }
    assert(rows(37L) == (("d37.example.com", 1L, 1, 0, 1)))
  }

  test("qu5: frontier schedule replays from qu2's canonical URLs exactly") {
    // single-threaded replay: unique canon URLs -> host counts -> the
    // integer budget arithmetic (D = 1000 ms, S = 64 slots)
    val canon = UrlCuration.urlDedup(spark, dir).collect()
      .map(_.getAs[String]("canon_url")).distinct
    val byHost = canon.groupBy(u => u.replaceAll("^[a-z]+://", "")
      .replaceAll("[/?#].*$", ""))
      .map { case (h, us) => h -> us.length.toLong }
    val total = byHost.values.sum
    val fleet = (total * 1000 + 63) / 64
    val maxSerial = byHost.values.max * 1000
    val exp = byHost.map { case (h, n) =>
      (h, n, total, n * 1000, fleet, n * 1000 / total,
        if (n * 1000 > fleet) "politeness" else "capacity",
        math.max(maxSerial, fleet))
    }.toSeq.sortBy(_._1)
    val got = UrlCuration.frontierSchedule(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getString(6), r.getLong(7)))
      .toSeq.sortBy(_._1)
    assert(got == exp, s"\n got=$got\n exp=$exp")
    // conservation: per-host counts sum to the total on every row
    assert(got.map(_._2).sum == got.head._3)
    // the makespan is the binding host's serial time when politeness binds
    assert(got.forall(_._8 == math.max(maxSerial, fleet)))
  }

  test("qu4: URL features replay byte-for-byte on hand-built cases") {
    val rows = UrlCuration.urlFeatures(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5),
          r.getLong(6), r.getInt(7), r.getLong(8)))).toMap
    // doc 0: HTTPS://D0.SPAM.EXAMPLE/p/0/?utm_source=feed&v=2#sec1 (len 53)
    // host lowered, 2 dots, spam TLD, 1 digit, path /p/0/ (3 slashes),
    // 2 params of which 1 tracking
    assert(rows(0L) == (("d0.spam.example", 2, 1, 1, 3, 2L, 1, 53L)),
      rows(0L).toString)
    // doc 1: https://d1.example.com/p/1?ref=rss (len 34) — 1 param, tracking
    assert(rows(1L) == (("d1.example.com", 2, 0, 1, 2, 1L, 1, 34L)),
      rows(1L).toString)
    // doc 7: https://d7.spam.example/p/7/?ref=rss — trailing slash path
    assert(rows(7L) == (("d7.spam.example", 2, 1, 1, 3, 1L, 1, 36L)),
      rows(7L).toString)
    // doc 37: two digits in host, clean com TLD
    assert(rows(37L) == (("d37.example.com", 2, 0, 2, 2, 1L, 1, 36L)),
      rows(37L).toString)
    // every doc gets a row; lengths and depths are non-negative
    assert(rows.size == 13)
    rows.values.foreach { case (_, sd, sp, hd, pd, np, tp, ul) =>
      assert(sd >= 0 && sp >= 0 && hd >= 0 && pd >= 1 && np >= 0 &&
        tp >= 0 && tp <= np && ul > 0)
    }
  }
}
