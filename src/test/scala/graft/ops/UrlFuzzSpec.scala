package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Fuzz/property coverage for URL canonicalization over a combinatorial
  * population far messier than the planted suite URLs: every cross of
  * scheme case x host case/port x path damage (double slashes, '&' and
  * '%'-escapes in segments, trailing-slash stacks) x query shapes
  * (trackers leading/middle/trailing/only, repeated trackers, empty
  * values, multiple REAL params) x fragments. One Spark pass evaluates
  * the whole population; the properties are checked row by row.
  *
  * Documented semantic bounds (asserted, not hidden): tracker matching is
  * lowercase-only (`UTM_SOURCE` survives — de-facto tracker keys are
  * lowercase), and a literal '&' in a PATH with no query is read as a
  * query separator (the repair step cannot distinguish it; real crawl
  * frontiers make the same call).
  */
class UrlFuzzSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-urlfuzz-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val schemes = Seq("https", "HTTPS", "Http", "ftp")
  private val hosts = Seq("example.com", "WWW.Example.COM", "a-b.co:8443",
    "xn--bcher-kva.example", "h")
  private val paths = Seq("", "/", "/p/1", "/p//x", "/a%20b/c", "/p/1//",
    "/only&amp")
  private val queries = Seq("", "?utm_source=f", "?utm_source=f&v=2",
    "?v=2&ref=r", "?a=1&utm_campaign=c&b=2", "?ref=x&ref=y", "?v=",
    "?a=1&b=2&c=3", "?UTM_SOURCE=up")
  private val frags = Seq("", "#sec", "#a/b?c=d")

  private lazy val population: Seq[String] = for {
    s <- schemes; h <- hosts; p <- paths; q <- queries; f <- frags
  } yield s"$s://$h$p$q$f"

  private def canonAll(urls: Seq[String]): Map[String, String] = {
    val ss = spark; import ss.implicits._
    urls.toDF("u")
      .select(col("u"), UrlCuration.canonicalize(col("u")).as("c"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
  }

  test("canonicalize: idempotent, fragment-free, tracker-free over the fuzz population") {
    val first = canonAll(population)
    val second = canonAll(first.values.toSeq.distinct)
    first.foreach { case (u, c) =>
      assert(second(c) == c, s"not idempotent: $u -> $c -> ${second(c)}")
      assert(!c.contains("#"), s"fragment survived: $u -> $c")
      assert(!"[?&](utm_[a-z_]+|ref)=".r.findFirstIn(c).isDefined,
        s"tracker survived: $u -> $c")
      assert(!c.endsWith("/") || c.endsWith("://"),
        s"trailing slash survived: $u -> $c")
      assert(!c.endsWith("?"), s"empty query survived: $u -> $c")
    }
  }

  test("canonicalize: scheme+host fold to lowercase, path case preserved") {
    val out = canonAll(Seq("HTTPS://WWW.Example.COM/Path/To?v=2#f"))
    assert(out.values.head == "https://www.example.com/Path/To?v=2")
  }

  test("canonicalize: multiple surviving params keep their order and separators") {
    val out = canonAll(Seq(
      "https://h/p?utm_source=x&a=1&b=2", // tracker consumed the '?'
      "https://h/p?a=1&utm_campaign=c&b=2",
      "https://h/p?ref=x&ref=y&a=1&b=2"))
    assert(out("https://h/p?utm_source=x&a=1&b=2") == "https://h/p?a=1&b=2")
    assert(out("https://h/p?a=1&utm_campaign=c&b=2") == "https://h/p?a=1&b=2")
    assert(out("https://h/p?ref=x&ref=y&a=1&b=2") == "https://h/p?a=1&b=2")
  }

  test("canonicalize: slash stacks collapse in one pass") {
    val out = canonAll(Seq(
      "https://h/p//", "https://h/p//?v=2", "https://h/p///#f"))
    assert(out("https://h/p//") == "https://h/p")
    assert(out("https://h/p//?v=2") == "https://h/p?v=2")
    assert(out("https://h/p///#f") == "https://h/p")
  }

  test("canonicalize: documented bounds — uppercase trackers and path '&'") {
    val out = canonAll(Seq(
      "https://h/p?UTM_SOURCE=up", // lowercase-only tracker matching
      "https://h/a&b"))            // path '&' read as query separator
    assert(out("https://h/p?UTM_SOURCE=up") == "https://h/p?UTM_SOURCE=up")
    assert(out("https://h/a&b") == "https://h/a?b")
  }
}
