package graft.core

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.spark.PagesTable

/** Scalacheck property tests (SURVEY.md section 5.3). */
class PropertySpec extends AnyFunSuite {

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(res.passed, s"$name: $res")
  }

  private val genBox: Gen[LayoutBox] = for {
    x0 <- Gen.choose(0f, 500f)
    y0 <- Gen.choose(0f, 700f)
    w <- Gen.choose(1f, 200f)
    h <- Gen.choose(1f, 100f)
    p <- Gen.choose(0.01f, 1f)
    label <- Gen.oneOf(LayoutLabels.Id2Label)
  } yield LayoutBox(0, BBox(x0, y0, x0 + w, y0 + h), label, p)

  test("md5 halves parsed from digest bytes equal the hex-string reference") {
    // the DuckDB oracles compute CAST('0x'||substr(md5(x),1,15)) and
    // substr(...,16,15); the fast byte-twiddling parse must agree exactly
    check("md5Halves", Prop.forAll(Gen.asciiPrintableStr) { s =>
      val dg = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      val hex = dg.map("%02x".format(_)).mkString
      val (a, b) = graft.functions.GraftImpl.md5Halves(dg)
      a == java.lang.Long.parseLong(hex.substring(0, 15), 16) &&
        b == java.lang.Long.parseLong(hex.substring(15, 30), 16)
    })
  }

  test("minhashAffine equals the hex-parsed affine-lane reference") {
    // the one-pass native expression must match the composed form the
    // DuckDB oracles replay: lane_i = min over shingles of
    // (parse(md5hex[0:15]) + i * parse(md5hex[15:30])) mod (2^61 - 1)
    val mersenne61 = 2305843009213693951L
    check("minhashAffine", Prop.forAll(Gen.nonEmptyListOf(Gen.asciiPrintableStr)) { words =>
      val lanes = 8
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        words.map(org.apache.spark.unsafe.types.UTF8String.fromString)
          .toArray[AnyRef])
      val got = graft.functions.GraftImpl.minhashAffine(arr, lanes)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
      val expected = Array.tabulate(lanes) { i =>
        words.map { w =>
          val hex = java.security.MessageDigest.getInstance("MD5")
            .digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
          val a = java.lang.Long.parseLong(hex.substring(0, 15), 16)
          val b = java.lang.Long.parseLong(hex.substring(15, 30), 16)
          (a + i.toLong * b) % mersenne61
        }.min
      }
      got.sameElements(expected)
    })
  }

  test("NMS output pairwise relaxed IoU <= threshold, order proba-desc") {
    check("nms", Prop.forAll(Gen.listOfN(15, genBox)) { boxes =>
      val kept = Nms.nms(boxes.zipWithIndex.map { case (b, i) => b.copy(id = i) })
      val pairwise = (for {
        i <- kept.indices; j <- kept.indices if i < j
      } yield kept(i).bbox.relaxedIou(kept(j).bbox) <= Nms.IouThreshold).forall(identity)
      val ordered = kept.map(_.proba).sliding(2).forall {
        case Seq(a, b) => a >= b
        case _         => true
      }
      pairwise && ordered
    })
  }

  test("element text equals the space-join of its assigned line texts") {
    val genLines: Gen[List[String]] =
      Gen.listOfN(5, Gen.alphaNumStr.suchThat(_.nonEmpty))
    check("element-text", Prop.forAll(genLines) { texts =>
      val box = LayoutBox(7, BBox(0f, 0f, 600f, 1000f), "Text", 0.9f)
      val lines = texts.zipWithIndex.map { case (t, i) =>
        Line(t, BBox(10f, i * 20f, 500f, i * 20f + 12f), 0f, Vector.empty)
      }
      val els = Assign.mergeLinesLayout(Seq(box), lines, 0)
      texts.isEmpty || (els.length == 1 && els.head.text == texts.mkString(" "))
    })
  }

  test("block count never exceeds element count") {
    val genElems: Gen[List[(Int, String)]] = Gen.listOfN(12, for {
      kind <- Gen.choose(0, 9)
      txt <- Gen.alphaStr
    } yield (kind, txt))
    val kinds = Vector(ElementType.Header, ElementType.FootNote, ElementType.Footer,
      ElementType.Text, ElementType.Title, ElementType.Subtitle, ElementType.ListItem,
      ElementType.Caption, ElementType.Image, ElementType.Table)
    check("block-count", Prop.forAll(genElems) { specs =>
      val els = specs.zipWithIndex.map { case ((k, t), i) =>
        new Element(i, i, kinds(k), 0, t, BBox(0f, i * 10f, 100f, i * 10f + 8f))
      }.toVector
      Blocks.mergeElementsIntoBlocks(els, Map.empty).length <= els.length
    })
  }

  test("extraction is deterministic and total on arbitrary corpus indices") {
    check("extract-deterministic", Prop.forAll(Gen.choose(0L, 100000L)) { i =>
      val row = PagesTable.genDoc(i)
      val a = Extract.extractDocument(row.url, row.html)
      val b = Extract.extractDocument(row.url, row.html)
      a == b && a.parseStatus == "ok"
    })
  }

  test("extraction never throws on arbitrary byte garbage (taxonomy total)") {
    check("extract-total", Prop.forAll(Gen.listOf(Gen.choose(-128, 127).map(_.toByte))) { bytes =>
      val d = Extract.extractDocument("u", bytes.toArray)
      d.parseStatus == "ok" || Set("empty_doc", "parse_error", "oversize",
        "exception", "range_error").contains(d.errorClass)
    })
  }

  test("DOM nesting past the cap is a parse_error row, never a stack overflow") {
    def nested(depth: Int): Array[Byte] = {
      val sb = new StringBuilder("<page><p>")
      for (_ <- 0 until depth) sb ++= "<span data-font-weight=\"700\">"
      sb ++= "x"
      for (_ <- 0 until depth) sb ++= "</span>"
      sb ++= "</p></page>"
      sb.toString.getBytes("UTF-8")
    }
    // within the cap: parses fine (the cap must not reject legal nesting)
    assert(Extract.extractDocument("u", nested(300)).parseStatus == "ok")
    // past the cap: deterministic taxonomy row (measured: the unguarded
    // recursive descent overflowed the JVM stack near depth ~3000 — an
    // Error no Spark task survives)
    for (depth <- Seq(graft.core.HtmlFront.MaxDomDepth + 1, 3000, 50000)) {
      val d = Extract.extractDocument("u", nested(depth))
      assert(d.parseStatus == "error" && d.errorClass == "parse_error", s"depth $depth")
    }
  }

  test("page range semantics: original ids kept, bad ranges rejected") {
    val html = "<page><p>one</p></page><page><p>two</p></page><page><p>three</p></page>"
      .getBytes("UTF-8")
    assert(Extract.pageCount(html) == 3)
    val mid = Extract.extractDocument("u", html, Extract.parsePageRange("2"))
    assert(mid.parseStatus == "ok" && mid.nPages == 1)
    assert(mid.extractedText == "two")
    // page id preserved (1, not 0) in the blocks json
    assert(mid.blocksJson.contains("\"pages_id\":[1]"))
    val tail = Extract.extractDocument("u", html, Extract.parsePageRange("2-3"))
    assert(tail.nPages == 2 && tail.extractedText == "two\nthree")
    val bad = Extract.extractDocument("u", html, Extract.parsePageRange("2-9"))
    assert(bad.parseStatus == "error" && bad.errorClass == "range_error")
    assert(Extract.parsePageRange("1-5").contains((0, 5)))
    assert(Extract.parsePageRange("3").contains((2, 3)))
    assert(Extract.parsePageRange("x").isEmpty)
  }
}
