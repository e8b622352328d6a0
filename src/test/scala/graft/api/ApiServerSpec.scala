package graft.api

import graft.core.Extract
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets

/** End-to-end exercise of the HTTP serving surface (SURVEY §2.1 S2 /
  * api/main.rs routes) over real sockets: multipart intake, content
  * negotiation, page-range validation, the SSE event vocabulary, and live
  * mid-parse cancellation. Extraction results are cross-checked against a
  * direct Extract.extractDocument call on the same bytes.
  */
class ApiServerSpec extends AnyFunSuite with BeforeAndAfterAll {

  // pageDelayMs high enough that a 40-page doc gives the cancel endpoint a
  // wide window between pages; keepAliveMs short so the heartbeat is
  // observable in-test without waiting 30 s.
  private val server = new ApiServer(pageDelayMs = 25L, keepAliveMs = 200L,
    onIngest = (name, bytes) => ingested.synchronized {
      ingested += name -> bytes.length; ()
    })
  private val ingested = scala.collection.mutable.ArrayBuffer.empty[(String, Int)]
  private var port: Int = _
  private val client = HttpClient.newHttpClient()

  override def beforeAll(): Unit = { port = server.start(0) }
  override def afterAll(): Unit = server.stop()

  private def url(path: String) = URI.create(s"http://127.0.0.1:$port$path")

  private val boundary = "graftTestBoundary7291"

  private def multipartBody(parts: (String, Option[String], Array[Byte])*): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.UTF_8))
    parts.foreach { case (name, filename, body) =>
      w(s"--$boundary\r\n")
      val fn = filename.map(f => s"""; filename="$f"""").getOrElse("")
      w(s"""Content-Disposition: form-data; name="$name"$fn\r\n\r\n""")
      out.write(body)
      w("\r\n")
    }
    w(s"--$boundary--\r\n")
    out.toByteArray
  }

  private def post(path: String, body: Array[Byte],
      accept: Option[String] = None): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(url(path))
      .header("Content-Type", s"multipart/form-data; boundary=$boundary")
      .POST(HttpRequest.BodyPublishers.ofByteArray(body))
    accept.foreach(a => b.header("Accept", a))
    client.send(b.build(), HttpResponse.BodyHandlers.ofString())
  }

  private val threePageHtml =
    ("<page><h1>Alpha</h1><p>first page body text</p></page>" +
      "<page><p>second page body text</p></page>" +
      "<page><p>third page body text</p></page>").getBytes(StandardCharsets.UTF_8)

  test("GET /health returns the reference envelope") {
    val r = client.send(HttpRequest.newBuilder(url("/health")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    assert(r.statusCode() == 200)
    assert(r.body() == """{"success":true,"data":"Service is healthy","error":null}""")
  }

  test("POST /parse returns the JSON envelope and matches direct extraction") {
    val r = post("/parse", multipartBody(("file", Some("doc.html"), threePageHtml)))
    assert(r.statusCode() == 200, r.body())
    val direct = Extract.extractDocument("doc.html", threePageHtml)
    assert(r.body().startsWith("""{"success":true,"data":{"""))
    assert(r.body().contains(""""n_pages":3"""))
    assert(r.body().contains(s""""n_blocks":${direct.nBlocks}"""))
    // blocks payload is the exact blocksToJson rendering
    assert(r.body().contains(direct.blocksJson))
    assert(ingested.synchronized(ingested.exists(_._1 == "doc.html")))
  }

  test("Accept: text/markdown negotiates the markdown rendering (main.rs:492-508)") {
    val r = post("/parse", multipartBody(("file", Some("doc.html"), threePageHtml)),
      accept = Some("text/markdown"))
    assert(r.statusCode() == 200)
    assert(r.headers().firstValue("Content-Type").orElse("") == "text/markdown")
    val direct = Extract.extractDocument("doc.html", threePageHtml)
    assert(r.body() == direct.markdown)
  }

  test("options page_range filters pages with the 1-based-inclusive grammar") {
    val opts = """{"page_range": "2-3"}""".getBytes(StandardCharsets.UTF_8)
    val r = post("/parse", multipartBody(
      ("file", Some("doc.html"), threePageHtml), ("options", None, opts)))
    assert(r.statusCode() == 200, r.body())
    assert(r.body().contains(""""n_pages":2"""))
    val direct = Extract.extractDocument("doc.html", threePageHtml, Some((1, 3)))
    assert(r.body().contains(direct.blocksJson))
  }

  test("invalid page ranges answer 400 with the reference's message") {
    for (bad <- Seq("0-3", "5-2", "zero", "0")) {
      val opts = s"""{"page_range": "$bad"}""".getBytes(StandardCharsets.UTF_8)
      val r = post("/parse", multipartBody(
        ("file", Some("doc.html"), threePageHtml), ("options", None, opts)))
      assert(r.statusCode() == 400, s"$bad -> ${r.body()}")
      assert(r.body().contains("Invalid page range"), r.body())
    }
    // range past the document's end is a parse-side failure (500), like the
    // reference's in-parse bail (parse/native.rs:263-274)
    val opts = """{"page_range": "2-9"}""".getBytes(StandardCharsets.UTF_8)
    val r = post("/parse", multipartBody(
      ("file", Some("doc.html"), threePageHtml), ("options", None, opts)))
    assert(r.statusCode() == 500)
    assert(r.body().contains("range_error"))
  }

  test("missing file field and malformed multipart answer 400") {
    val r1 = post("/parse", multipartBody(("other", None, "x".getBytes)))
    assert(r1.statusCode() == 400)
    assert(r1.body().contains("missing `file` field"))
    val r2 = client.send(HttpRequest.newBuilder(url("/parse"))
      .header("Content-Type", "text/plain")
      .POST(HttpRequest.BodyPublishers.ofString("hello")).build(),
      HttpResponse.BodyHandlers.ofString())
    assert(r2.statusCode() == 400)
  }

  test("cancel of an unknown job answers 404 (main.rs:870-877)") {
    val r = client.send(HttpRequest.newBuilder(url("/parse/nope/cancel"))
      .POST(HttpRequest.BodyPublishers.noBody()).build(),
      HttpResponse.BodyHandlers.ofString())
    assert(r.statusCode() == 404)
    assert(r.body().contains("not found or already completed"))
  }

  /** Read SSE frames (event name, data json) until a terminal event. */
  private def readSse(path: String, body: Array[Byte],
      onEvent: (String, String) => Unit): Vector[(String, String)] = {
    val req = HttpRequest.newBuilder(url(path))
      .header("Content-Type", s"multipart/form-data; boundary=$boundary")
      .POST(HttpRequest.BodyPublishers.ofByteArray(body)).build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofInputStream())
    assert(resp.statusCode() == 200)
    assert(resp.headers().firstValue("Content-Type").orElse("").startsWith("text/event-stream"))
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(resp.body(), StandardCharsets.UTF_8))
    val events = Vector.newBuilder[(String, String)]
    var ev: String = null
    var line = reader.readLine()
    var done = false
    while (line != null && !done) {
      if (line.startsWith("event: ")) ev = line.stripPrefix("event: ")
      else if (line.startsWith("data: ") && ev != null) {
        val e = (ev, line.stripPrefix("data: "))
        events += e
        onEvent(e._1, e._2)
        if (ev == "complete" || ev == "cancelled" || ev == "error") done = true
        ev = null
      }
      // comment heartbeats (": keep-alive-text") and blanks are skipped
      if (!done) line = reader.readLine()
    }
    reader.close()
    events.result()
  }

  test("SSE stream: job_started, per-page progress, complete with the document") {
    val events = readSse("/parse/sse",
      multipartBody(("file", Some("sse.html"), threePageHtml)), (_, _) => ())
    assert(events.head._1 == "job_started")
    assert(events.head._2.contains(""""type":"job_started""""))
    val progress = events.filter(_._1 == "progress")
    assert(progress.length == 3)
    // pages_completed counts up; total_pages is the whole-doc count
    assert(progress.map(_._2).zipWithIndex.forall { case (d, i) =>
      d.contains(s""""pages_completed":${i + 1}""") && d.contains(""""total_pages":3""")
    }, progress)
    assert(events.last._1 == "complete")
    val direct = Extract.extractDocument("sse.html", threePageHtml)
    assert(events.last._2.contains(direct.blocksJson))
    assert(events.last._2.contains(""""total_pages":3"""))
    // handle was dropped on completion
    assert(server.jobs.activeCount == 0)
  }

  test("SSE stream: mid-parse cancel yields cancelled, not complete") {
    // 40 throttled pages ≈ 1 s of parse; cancel after the first progress
    val many = (1 to 40)
      .map(i => s"<page><p>page number $i body</p></page>").mkString
      .getBytes(StandardCharsets.UTF_8)
    @volatile var cancelSent = false
    val events = readSse("/parse/sse",
      multipartBody(("file", Some("slow.html"), many)),
      (ev, data) => {
        if (ev == "progress" && !cancelSent) {
          cancelSent = true
          // job id came from the job_started frame; cancel via the endpoint
          val id = server.synchronized { lastJobId }
          val r = client.send(HttpRequest.newBuilder(url(s"/parse/$id/cancel"))
            .POST(HttpRequest.BodyPublishers.noBody()).build(),
            HttpResponse.BodyHandlers.ofString())
          assert(r.statusCode() == 200, r.body())
        }
        if (ev == "job_started") {
          val m = """"job_id":"([^"]+)"""".r.findFirstMatchIn(data)
          server.synchronized { lastJobId = m.get.group(1) }
        }
      })
    assert(cancelSent)
    assert(events.last._1 == "cancelled", events.map(_._1))
    assert(events.count(_._1 == "progress") < 40)
    assert(events.forall(_._1 != "complete"))
  }
  private var lastJobId: String = _

  test("SSE keep-alive heartbeat flows while the parse is still working") {
    // a dedicated instance whose per-page work (300 ms) exceeds the
    // heartbeat interval (50 ms), so comment lines MUST appear between
    // progress frames — the axum KeepAlive behavior (main.rs:852-855)
    val slow = new ApiServer(pageDelayMs = 300L, keepAliveMs = 50L)
    val slowPort = slow.start(0)
    try {
      val many = (1 to 3)
        .map(i => s"<page><p>page number $i body</p></page>").mkString
        .getBytes(StandardCharsets.UTF_8)
      val req = HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:$slowPort/parse/sse"))
        .header("Content-Type", s"multipart/form-data; boundary=$boundary")
        .POST(HttpRequest.BodyPublishers.ofByteArray(
          multipartBody(("file", Some("hb.html"), many)))).build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofInputStream())
      val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(resp.body(), StandardCharsets.UTF_8))
      var sawHeartbeat = false
      var sawComplete = false
      var line = reader.readLine()
      var done = false
      while (line != null && !done) {
        if (line.startsWith(": keep-alive-text")) sawHeartbeat = true
        if (line.startsWith("event: complete")) { sawComplete = true; done = true }
        if (line.startsWith("event: error") || line.startsWith("event: cancelled"))
          done = true
        if (!done) line = reader.readLine()
      }
      reader.close()
      assert(sawHeartbeat)
      assert(sawComplete)
    } finally slow.stop()
  }

  test("multipart parser round-trips binary bodies byte-exactly") {
    val bin = Array.tabulate[Byte](512)(i => ((i * 31 + 7) % 256).toByte)
    val body = multipartBody(("file", Some("bin.dat"), bin), ("options", None, "{}".getBytes))
    val parsed = ApiServer.parseMultipart(
      s"multipart/form-data; boundary=$boundary", body)
    assert(parsed.isRight)
    val parts = parsed.toOption.get
    assert(parts.map(_.name) == Vector("file", "options"))
    assert(parts.head.filename.contains("bin.dat"))
    assert(parts.head.body.sameElements(bin))
  }

  test("direct core: cancellation callback aborts with errorClass cancelled") {
    var pagesSeen = 0
    val doc = Extract.extractDocument("u", threePageHtml, None,
      _ => pagesSeen += 1, () => pagesSeen >= 1)
    assert(doc.parseStatus == "error")
    assert(doc.errorClass == "cancelled")
    assert(pagesSeen == 1)
  }
}
