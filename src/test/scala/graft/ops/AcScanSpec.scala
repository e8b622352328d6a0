package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{AcAutomaton, GraftFunctions, GraftImpl}
import org.apache.spark.unsafe.types.UTF8String

/** qt48's Aho–Corasick scan: hand-built fixtures covering failure links,
  * overlapping matches, and nested phrases; a deterministic fuzz sweep
  * against a naive O(n·m·|P|) reference; and the SQL/plan surface.
  */
class AcScanSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-acscan-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def scan(text: String, phrases: Seq[String]): (Long, Long) = {
    val ac = new AcAutomaton(phrases.toArray)
    val row = GraftImpl.acScan(UTF8String.fromString(text), ac)
    (row.getLong(0), row.getLong(1))
  }

  /** all (start, phrase) pairs, overlaps included — the oracle's
    * position-comprehension semantics, written the slow obvious way.
    */
  private def naive(text: String, phrases: Seq[String]): (Long, Long) = {
    val perPhrase = phrases.map { p =>
      (0 to text.length - p.length).count(i => text.startsWith(p, i))
    }
    (perPhrase.map(_.toLong).sum, perPhrase.count(_ > 0).toLong)
  }

  test("classic ushers case exercises fail links across phrase nests") {
    // she@[1,4), he@[2,4), hers@[2,6) -> 3 hits, 3 distinct ("his" absent)
    assert(scan("ushers", Seq("he", "she", "his", "hers")) == (3L, 3L))
  }

  test("overlapping occurrences of one phrase all count") {
    assert(scan("aaaa", Seq("aa")) == (3L, 1L))
    assert(scan("a a a", Seq("a a")) == (2L, 1L))
  }

  test("a phrase that is a prefix of another fires alongside it") {
    assert(scan("hash join here", Seq("hash", "hash join")) == (2L, 2L))
  }

  test("empty text and too-short text yield zero hits") {
    assert(scan("", Seq("ab")) == (0L, 0L))
    assert(scan("a", Seq("ab")) == (0L, 0L))
  }

  test("deterministic fuzz: automaton == naive on 400 seeded strings") {
    // SplitMix64 (the repo's only sanctioned PRNG) over a 3-char alphabet
    // chosen to maximize phrase self-overlap
    var s = 0x9e3779b97f4a7c15L
    def next(): Long = {
      s += 0x9e3779b97f4a7c15L
      var z = s
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val alphabet = "ab "
    val phrases = Seq("a", "ab", "b a", "aa", "ab a", "bbb")
    for (trial <- 0 until 400) {
      val len = (math.floorMod(next(), 120L)).toInt
      val text = new String(Array.fill(len)(
        alphabet.charAt(math.floorMod(next(), 3L).toInt)))
      assert(scan(text, phrases) == naive(text, phrases),
        s"trial $trial text='$text'")
    }
  }

  test("qt48 is map-only: no exchange, whole-stage codegen, pruned scan") {
    val df = TextAnalysis.blocklistScan(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("*(1)"), plan) // whole-stage codegen span marker
    val readSchema = plan.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("lang"), readSchema) // only doc_id + text read
    val rows = df.collect()
    assert(rows.length == 500)
    assert(rows.forall(r => r.getLong(2) <= r.getLong(1))) // n_phrases <= n_hits
  }

  test("ac_scan rejects malformed phrase lists") {
    intercept[IllegalArgumentException](new AcAutomaton(Array.empty[String]))
    intercept[IllegalArgumentException](new AcAutomaton(Array("a", "")))
    intercept[IllegalArgumentException](new AcAutomaton(Array("a", "a")))
    intercept[IllegalArgumentException](
      GraftFunctions.acScan(org.apache.spark.sql.functions.lit("x"),
        Seq("a|b")))
  }
}
