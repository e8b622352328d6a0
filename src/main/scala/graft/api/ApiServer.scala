package graft.api

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.core.{Extract, Render}

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}
import java.util.concurrent.{ConcurrentHashMap, Executors, LinkedBlockingQueue, TimeUnit}
import scala.util.control.NonFatal

/** The reference's HTTP serving surface (ferrules-api/src/main.rs:288-296)
  * rebuilt on the JDK's built-in `com.sun.net.httpserver` — zero added
  * dependencies. Routes, envelopes, event vocabulary, and status codes
  * mirror the axum app:
  *
  *   - GET  /health                  -> `{"success":true,"data":"Service is
  *     healthy","error":null}` (main.rs:308-315)
  *   - POST /parse                   -> multipart `file` (+ optional
  *     `options` JSON `{page_range}`); Accept: text/markdown returns the
  *     markdown rendering, anything else the JSON ApiResponse envelope
  *     around the parsed document (main.rs:317-529)
  *   - POST /parse/sse               -> Server-Sent Events stream:
  *     `job_started` / `progress{pages_completed,total_pages,page_id}` /
  *     `complete{document,total_pages}` / `cancelled` / `error`, with a
  *     30 s `: keep-alive-text` comment heartbeat (main.rs:558-856)
  *   - POST /parse/{job_id}/cancel   -> flips the job's cancellation flag;
  *     404 when the job is unknown or already completed (main.rs:858-878)
  *
  * Deviations, all documented: the body cap (250 MB, main.rs:40) answers
  * 413 from our handler instead of axum's DefaultBodyLimit layer; the
  * document id/name is derived from the multipart filename instead of a
  * fresh uuid-v4 (main.rs:474) so repeated uploads extract
  * deterministically — the job id stays transport-random like the
  * reference's. Extraction itself is the session-shared sequential core
  * (graft.core.Extract), so the server is Spark-free; `onIngest` lets a
  * runner append every accepted upload to the pages input table (SURVEY
  * §2.1 S2: the batch job replaces HTTP at scale, the server is the
  * driver-side entry that feeds the same table).
  */
object ApiServer {

  val MaxBodyBytes: Int = Extract.MaxBytes // main.rs:40 MAX_SIZE_LIMIT

  // ---------------------------------------------------------------- JSON --

  def jsonEsc(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** The `ApiResponse<T>` envelope (main.rs:142-147). `dataJson` is raw
    * JSON (already encoded).
    */
  def apiOk(dataJson: String): String =
    s"""{"success":true,"data":$dataJson,"error":null}"""

  def apiErr(message: String): String =
    s"""{"success":false,"data":null,"error":"${jsonEsc(message)}"}"""

  /** Minimal field scan for the `options` part (main.rs:149-153: only
    * `page_range` and the unused `_save_images`). Tolerant of whitespace;
    * rejects documents that are not a JSON object.
    */
  def optionsPageRange(optionsJson: String): Either[String, Option[String]] = {
    val t = optionsJson.trim
    if (!(t.startsWith("{") && t.endsWith("}")))
      Left("Failed to parse options: expected a JSON object")
    else {
      val m = """"page_range"\s*:\s*"([^"]*)"""".r.findFirstMatchIn(t)
      Right(m.map(_.group(1)))
    }
  }

  /** Page-range grammar + validation, verbatim from parse_page_range
    * (api/main.rs:531-555): "1-5" needs start > 0 and end >= start; a bare
    * "3" needs page > 0; 1-based inclusive in, 0-based half-open out.
    */
  def validatedRange(s: String): Either[String, (Int, Int)] =
    Extract.parsePageRange(s) match {
      case Some((start0, end)) if start0 >= 0 && end >= start0 + 1 =>
        Right((start0, end))
      case Some(_) =>
        Left("Invalid page range: start must be > 0 and end must be >= start")
      case None => Left(s"Invalid page range: $s")
    }

  // ----------------------------------------------------------- multipart --

  final case class Part(name: String, filename: Option[String],
      body: Array[Byte])

  private def indexOf(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    if (needle.isEmpty) return from
    var i = math.max(from, 0)
    val last = hay.length - needle.length
    while (i <= last) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  /** RFC 7578 multipart/form-data split, byte-exact so binary `file` parts
    * survive. Accepts the two field names the reference reads ("file",
    * "options") plus any others (skipped there too, main.rs:420).
    */
  def parseMultipart(contentType: String,
      body: Array[Byte]): Either[String, Vector[Part]] = {
    val b = """boundary=(?:"([^"]+)"|([^;,\s]+))""".r
      .findFirstMatchIn(contentType)
      .map(m => Option(m.group(1)).getOrElse(m.group(2)))
    b match {
      case None => Left("Failed to get next field: missing multipart boundary")
      case Some(boundary) =>
        val delim = ("--" + boundary).getBytes(StandardCharsets.ISO_8859_1)
        val first = indexOf(body, delim, 0)
        if (first < 0) Left("Failed to get next field: boundary not found")
        else {
          val parts = Vector.newBuilder[Part]
          var pos = first + delim.length
          var done = false
          var err: Option[String] = None
          while (!done && err.isEmpty) {
            // after a delimiter: "--" closes the stream, CRLF opens a part
            if (pos + 1 < body.length && body(pos) == '-' && body(pos + 1) == '-')
              done = true
            else {
              // skip the CRLF after the delimiter
              if (pos + 1 < body.length && body(pos) == '\r' && body(pos + 1) == '\n')
                pos += 2
              val headEnd = indexOf(body, "\r\n\r\n".getBytes, pos)
              if (headEnd < 0) err = Some("Failed to get next field: truncated part headers")
              else {
                val headers = new String(body, pos, headEnd - pos, StandardCharsets.ISO_8859_1)
                val name = """name="([^"]*)"""".r.findFirstMatchIn(headers).map(_.group(1))
                val filename = """filename="([^"]*)"""".r.findFirstMatchIn(headers).map(_.group(1))
                val contentStart = headEnd + 4
                val next = indexOf(body, ("\r\n--" + boundary).getBytes(StandardCharsets.ISO_8859_1), contentStart)
                if (next < 0) err = Some("Failed to get next field: unterminated part")
                else {
                  val content = java.util.Arrays.copyOfRange(body, contentStart, next)
                  parts += Part(name.getOrElse(""), filename, content)
                  pos = next + 2 + delim.length
                }
              }
            }
          }
          err.toLeft(parts.result())
        }
    }
  }

  // ---------------------------------------------------------- job events --

  /** The ParseEvent vocabulary (main.rs:154-174), serialized with the same
    * serde `tag = "type"` shape and the same SSE `event:` names.
    */
  sealed trait ParseEvent {
    def eventName: String
    def json: String
  }
  final case class JobStarted(jobId: String) extends ParseEvent {
    def eventName = "job_started"
    def json = s"""{"type":"job_started","job_id":"${jsonEsc(jobId)}"}"""
  }
  final case class Progress(pagesCompleted: Int, totalPages: Int, pageId: Int)
      extends ParseEvent {
    def eventName = "progress"
    def json =
      s"""{"type":"progress","pages_completed":$pagesCompleted,"total_pages":$totalPages,"page_id":$pageId}"""
  }
  final case class Complete(documentJson: String, totalPages: Int)
      extends ParseEvent {
    def eventName = "complete"
    def json =
      s"""{"type":"complete","document":$documentJson,"total_pages":$totalPages}"""
  }
  final case class Cancelled(message: String) extends ParseEvent {
    def eventName = "cancelled"
    def json = s"""{"type":"cancelled","message":"${jsonEsc(message)}"}"""
  }
  final case class ErrorEvent(message: String) extends ParseEvent {
    def eventName = "error"
    def json = s"""{"type":"error","message":"${jsonEsc(message)}"}"""
  }

  private val terminal: ParseEvent => Boolean = {
    case _: Complete | _: Cancelled | _: ErrorEvent => true
    case _ => false
  }

  /** JobManager (main.rs:183-241): live jobs keyed by id; cancel flips the
    * job's flag AND pushes a Cancelled event, exactly like cancel_job
    * (main.rs:214-233); complete_job drops the handle so a late cancel
    * 404s.
    */
  final class JobHandle(
      val cancelled: AtomicBoolean,
      val events: LinkedBlockingQueue[ParseEvent])

  final class JobManager {
    private val active = new ConcurrentHashMap[String, JobHandle]()

    def startJob(jobId: String): JobHandle = {
      val h = new JobHandle(new AtomicBoolean(false),
        new LinkedBlockingQueue[ParseEvent]())
      active.put(jobId, h)
      h
    }

    def cancelJob(jobId: String): Either[String, Unit] =
      Option(active.get(jobId)) match {
        case Some(h) =>
          h.cancelled.set(true)
          h.events.offer(Cancelled("Job was cancelled by user request"))
          Right(())
        case None => Left(s"Job $jobId not found or already completed")
      }

    def completeJob(jobId: String): Unit = { active.remove(jobId); () }

    def activeCount: Int = active.size
  }

  /** The parsed-document payload the envelope wraps — our analogue of the
    * reference's ParsedDocument serialization (entities/document JSON):
    * identity + counts + the blocks array (already JSON from
    * Render.blocksToJson).
    */
  def documentJson(id: String, doc: Extract.ExtractedDoc): String = {
    val name = Render.sanitizeDocName(doc.url)
    s"""{"id":"${jsonEsc(id)}","doc_name":"${jsonEsc(name)}","n_pages":${doc.nPages},""" +
      s""""n_blocks":${doc.nBlocks},"n_elements":${doc.nElements},"n_lines":${doc.nLines},""" +
      s""""need_ocr_pages":${doc.needOcrPages},"blocks":${doc.blocksJson}}"""
  }
}

/** One server instance. `pageDelayMs` throttles per-page work (test hook
  * for observing progress/cancel interleavings — production default 0);
  * `keepAliveMs` is the SSE heartbeat interval (reference: 30 s,
  * main.rs:852-855); `onIngest(filename, bytes)` fires for every accepted
  * upload before parsing.
  */
final class ApiServer(
    pageDelayMs: Long = 0L,
    keepAliveMs: Long = 30000L,
    onIngest: (String, Array[Byte]) => Unit = (_, _) => ()) {

  import ApiServer._

  private var server: HttpServer = _
  private val pool = Executors.newCachedThreadPool()
  val jobs = new JobManager
  private val jobSeq = new AtomicInteger(0)

  def boundPort: Int = server.getAddress.getPort

  def start(port: Int = 0): Int = {
    server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/health", (ex: HttpExchange) => handleSafe(ex)(handleHealth))
    server.createContext("/parse", (ex: HttpExchange) => handleSafe(ex)(handleParseFamily))
    server.setExecutor(pool)
    server.start()
    boundPort
  }

  def stop(): Unit = {
    if (server != null) server.stop(0)
    pool.shutdownNow()
    ()
  }

  // ------------------------------------------------------------ plumbing --

  private def handleSafe(ex: HttpExchange)(f: HttpExchange => Unit): Unit =
    try f(ex)
    catch {
      case NonFatal(e) =>
        try respond(ex, 500, "application/json", apiErr(s"internal error: ${e.getMessage}"))
        catch { case NonFatal(_) => () }
    } finally ex.close()

  private def respond(ex: HttpExchange, status: Int, contentType: String,
      body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(status, bytes.length.toLong)
    val os = ex.getResponseBody
    os.write(bytes)
    os.flush()
  }

  private def readBody(ex: HttpExchange): Either[String, Array[Byte]] = {
    val in = ex.getRequestBody
    val buf = new java.io.ByteArrayOutputStream()
    val chunk = new Array[Byte](64 * 1024)
    var n = in.read(chunk)
    var over = false
    while (n >= 0 && !over) {
      buf.write(chunk, 0, n)
      if (buf.size > MaxBodyBytes) over = true else n = in.read(chunk)
    }
    if (over) Left("payload too large") else Right(buf.toByteArray)
  }

  // ------------------------------------------------------------ handlers --

  private def handleHealth(ex: HttpExchange): Unit =
    if (ex.getRequestMethod != "GET")
      respond(ex, 405, "application/json", apiErr("method not allowed"))
    else respond(ex, 200, "application/json", apiOk("\"Service is healthy\""))

  private def handleParseFamily(ex: HttpExchange): Unit = {
    val path = ex.getRequestURI.getPath.stripSuffix("/")
    path match {
      case "/parse" => handleParse(ex)
      case "/parse/sse" => handleParseSse(ex)
      case CancelPath(jobId) => handleCancel(ex, jobId)
      case _ => respond(ex, 404, "application/json", apiErr(s"no route for $path"))
    }
  }

  private val CancelPath = "/parse/([^/]+)/cancel".r

  /** Shared multipart intake: returns (filename, fileBytes, pageRange) or
    * an error with the status to answer. Field handling mirrors
    * parse_document_handler (main.rs:337-421): `file` streamed, `options`
    * parsed, unknown fields skipped.
    */
  private def intake(ex: HttpExchange)
      : Either[(Int, String), (String, Array[Byte], Option[(Int, Int)])] = {
    if (ex.getRequestMethod != "POST")
      return Left((405, "method not allowed"))
    val ct = Option(ex.getRequestHeaders.getFirst("Content-Type")).getOrElse("")
    if (!ct.toLowerCase.startsWith("multipart/form-data"))
      return Left((400, "Failed to get next field: expected multipart/form-data"))
    readBody(ex) match {
      case Left(_) => Left((413, "payload exceeds the 250 MB limit"))
      case Right(body) =>
        parseMultipart(ct, body) match {
          case Left(msg) => Left((400, msg))
          case Right(parts) =>
            val file = parts.find(_.name == "file")
            val optsPart = parts.find(_.name == "options")
            file match {
              case None => Left((400, "Failed to get next field: missing `file` field"))
              case Some(f) =>
                val rangeE: Either[(Int, String), Option[(Int, Int)]] =
                  optsPart match {
                    case None => Right(None)
                    case Some(o) =>
                      val js = new String(o.body, StandardCharsets.UTF_8)
                      optionsPageRange(js) match {
                        case Left(msg) => Left((400, msg))
                        case Right(None) => Right(None)
                        case Right(Some(rs)) =>
                          validatedRange(rs) match {
                            case Left(msg) => Left((400, msg))
                            case Right(r) => Right(Some(r))
                          }
                      }
                  }
                rangeE.map { range =>
                  val name = f.filename.filter(_.nonEmpty).getOrElse("upload")
                  (name, f.body, range)
                }
            }
        }
    }
  }

  private def throttledExtract(name: String, bytes: Array[Byte],
      range: Option[(Int, Int)], onPage: Int => Unit,
      isCancelled: () => Boolean): Extract.ExtractedDoc =
    Extract.extractDocument(name, bytes, range, pageId => {
      if (pageDelayMs > 0) Thread.sleep(pageDelayMs)
      onPage(pageId)
    }, isCancelled)

  /** POST /parse — synchronous; content negotiation on Accept
    * (main.rs:492-528: exactly "text/markdown" selects markdown, anything
    * else JSON).
    */
  private def handleParse(ex: HttpExchange): Unit =
    intake(ex) match {
      case Left((status, msg)) =>
        respond(ex, status, "application/json", apiErr(msg))
      case Right((name, bytes, range)) =>
        onIngest(name, bytes)
        val doc = throttledExtract(name, bytes, range, _ => (), () => false)
        if (doc.parseStatus != "ok")
          respond(ex, 500, "application/json", apiErr(s"parse failed: ${doc.errorClass}"))
        else {
          val accept = Option(ex.getRequestHeaders.getFirst("Accept")).getOrElse("")
          if (accept == "text/markdown")
            respond(ex, 200, "text/markdown", doc.markdown)
          else {
            val id = java.util.UUID.randomUUID().toString
            respond(ex, 200, "application/json", apiOk(documentJson(id, doc)))
          }
        }
    }

  /** POST /parse/sse — validation errors answer JSON before the stream
    * starts (the reference's handler errors pre-stream too); afterwards the
    * response is an event stream that ends on the first terminal event.
    */
  private def handleParseSse(ex: HttpExchange): Unit =
    intake(ex) match {
      case Left((status, msg)) =>
        respond(ex, status, "application/json", apiErr(msg))
      case Right((name, bytes, range)) =>
        onIngest(name, bytes)
        val jobId = s"${java.util.UUID.randomUUID()}-${jobSeq.incrementAndGet()}"
        val handle = jobs.startJob(jobId)
        handle.events.offer(JobStarted(jobId))

        pool.execute { () =>
          try {
            if (!handle.cancelled.get()) {
              // total_pages = whole-document count, pre-range
              // (main.rs:740-752 calls get_page_count on the full doc)
              val totalPages =
                try Extract.pageCount(bytes)
                catch { case NonFatal(_) => -1 }
              if (totalPages < 0)
                handle.events.offer(ErrorEvent("Failed to get page count"))
              else {
                val completed = new AtomicInteger(0)
                val doc = throttledExtract(name, bytes, range,
                  pageId => {
                    val c = completed.incrementAndGet()
                    handle.events.offer(Progress(c, totalPages, pageId))
                    ()
                  },
                  () => handle.cancelled.get())
                doc.errorClass match {
                  case "" =>
                    if (!handle.cancelled.get())
                      handle.events.offer(Complete(documentJson(jobId, doc), totalPages))
                  case "cancelled" =>
                    handle.events.offer(Cancelled("Processing was cancelled"))
                  case other =>
                    if (!handle.cancelled.get())
                      handle.events.offer(ErrorEvent(s"parse failed: $other"))
                }
              }
            }
          } catch {
            case NonFatal(e) =>
              handle.events.offer(ErrorEvent(s"internal error: ${e.getMessage}"))
          }
        }

        ex.getResponseHeaders.set("Content-Type", "text/event-stream")
        ex.getResponseHeaders.set("Cache-Control", "no-cache")
        ex.sendResponseHeaders(200, 0L) // chunked
        val os = ex.getResponseBody
        def writeEvent(e: ParseEvent): Unit = {
          os.write(s"event: ${e.eventName}\ndata: ${e.json}\n\n"
            .getBytes(StandardCharsets.UTF_8))
          os.flush()
        }
        try {
          var open = true
          while (open) {
            val e = handle.events.poll(keepAliveMs, TimeUnit.MILLISECONDS)
            if (e == null) {
              // axum KeepAlive::new().text("keep-alive-text") → SSE comment
              os.write(": keep-alive-text\n\n".getBytes(StandardCharsets.UTF_8))
              os.flush()
            } else {
              writeEvent(e)
              if (terminal(e)) open = false
            }
          }
        } finally jobs.completeJob(jobId)
    }

  private def handleCancel(ex: HttpExchange, jobId: String): Unit =
    if (ex.getRequestMethod != "POST")
      respond(ex, 405, "application/json", apiErr("method not allowed"))
    else jobs.cancelJob(jobId) match {
      case Right(()) =>
        respond(ex, 200, "application/json", apiOk("\"Job cancelled successfully\""))
      case Left(msg) => respond(ex, 404, "application/json", apiErr(msg))
    }
}
