package graft.codec

import java.io.ByteArrayOutputStream

/** One parsed HTTP/1.x response: status code, headers in arrival order
  * (names lower-cased), and the de-framed, content-DECODED body bytes.
  * `chunked` records whether the body arrived under `Transfer-Encoding:
  * chunked`, and `nChunks` how many non-empty chunks carried it (0 for
  * a Content-Length or close-delimited body). `contentCoding` is the
  * `Content-Encoding` token that was applied — "identity" when none;
  * "gzip"/"deflate" mean `body` holds the DECODED payload (real HTTP
  * responses are overwhelmingly gzip-coded, and handing coded bytes to
  * the charset gate would mojibake-classify every one); "br" means
  * decoded when the optional brotli runtime backs commons-compress on
  * this classpath ([[HttpCodec.brotliAvailable]]) and still-coded
  * otherwise; any OTHER token (compress, multi-coding lists — and br
  * without its runtime) means `body` is still coded — callers route
  * those to quarantine or count them as dropped mass rather than
  * decode text from compressed bytes. `wireBodyBytes` is the framed
  * body size
  * before content-decoding (== body.length under identity) — the
  * wire-vs-decoded accounting the transcode queries report. */
final case class HttpResponse(
    status: Int,
    headers: Seq[(String, String)],
    body: Array[Byte],
    chunked: Boolean,
    nChunks: Int,
    contentCoding: String = "identity",
    wireBodyBytes: Int = -1) {
  def header(name: String): Option[String] = {
    val n = name.toLowerCase
    headers.collectFirst { case (k, v) if k == n => v }
  }
}

/** Deterministic HTTP/1.1 response serializer + tolerant parser — the
  * framing INSIDE a crawl archive's `response` records (a WARC response
  * payload is the raw HTTP response: status line, headers, and a body
  * framed by `Content-Length` or `Transfer-Encoding: chunked`). The
  * writer is, like [[WarcCodec]] and [[TarCodec]], compression-free and
  * fixed-order, so written bytes are a pure function of the inputs and
  * reconstructible by string concatenation in plain SQL — including the
  * chunked framing, whose size lines are lowercase unpadded hex exactly
  * as `java.lang.Long.toHexString` and DuckDB's `to_hex` both produce.
  *
  * The parser follows the never-throw contract of the media decoders:
  * `None` on any structural violation (bad status line, malformed
  * header, chunk size overrun, missing chunk CRLF, truncated body).
  * Tolerances mirror what live servers emit: HTTP/1.0 and 1.1 status
  * lines, case-insensitive header names, chunk extensions after `;`,
  * and trailer headers after the last chunk (skipped). */
object HttpCodec {

  private val Crlf = "\r\n"

  private def clean(s: String, what: String): String = {
    require(!s.exists(c => c == '\r' || c == '\n'),
      s"$what must be CRLF-free: '$s'")
    s
  }

  /** Serialize a response with a `Content-Length` body. Headers emit in
    * the given order, then `Content-Length` last. */
  def write(status: Int, reason: String, headers: Seq[(String, String)],
            body: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    sb ++= "HTTP/1.1 " ++= status.toString ++= " " ++= clean(reason, "reason") ++= Crlf
    headers.foreach { case (k, v) =>
      sb ++= clean(k, "header name") ++= ": " ++= clean(v, "header value") ++= Crlf
    }
    sb ++= "Content-Length: " ++= body.length.toString ++= Crlf ++= Crlf
    val out = new ByteArrayOutputStream()
    val hdr = sb.result().getBytes("UTF-8")
    out.write(hdr, 0, hdr.length)
    out.write(body, 0, body.length)
    out.toByteArray
  }

  /** Serialize a response with a chunked body: fixed chunk size
    * `chunkSize` (last chunk shorter), each chunk framed
    * `<lowercase hex size>CRLF<data>CRLF`, then the `0` chunk and the
    * empty-trailer CRLF. An empty body emits just the terminal chunk. */
  def writeChunked(status: Int, reason: String, headers: Seq[(String, String)],
                   body: Array[Byte], chunkSize: Int): Array[Byte] = {
    require(chunkSize >= 1, s"chunkSize must be >= 1 (got $chunkSize)")
    val sb = new StringBuilder
    sb ++= "HTTP/1.1 " ++= status.toString ++= " " ++= clean(reason, "reason") ++= Crlf
    headers.foreach { case (k, v) =>
      sb ++= clean(k, "header name") ++= ": " ++= clean(v, "header value") ++= Crlf
    }
    sb ++= "Transfer-Encoding: chunked" ++= Crlf ++= Crlf
    val out = new ByteArrayOutputStream()
    val hdr = sb.result().getBytes("UTF-8")
    out.write(hdr, 0, hdr.length)
    var p = 0
    while (p < body.length) {
      val n = math.min(chunkSize, body.length - p)
      val frame = java.lang.Integer.toHexString(n) + Crlf
      val fb = frame.getBytes("UTF-8")
      out.write(fb, 0, fb.length)
      out.write(body, p, n)
      out.write('\r'); out.write('\n')
      p += n
    }
    val fin = ("0" + Crlf + Crlf).getBytes("UTF-8")
    out.write(fin, 0, fin.length)
    out.toByteArray
  }

  /** Undo one `Content-Encoding` layer on the framed body. gzip /
    * x-gzip decode through [[GzipCodec.gunzipMember]] — looped over
    * SUCCESSIVE members until the framed body is consumed, because a
    * gzip body is legally a series of concatenated members (RFC 1952
    * §2.2; flush-per-chunk servers emit several and browsers decode
    * them all), each member CRC+ISIZE checked; deflate tries the
    * RFC 9110 zlib wrapper first and falls back to a raw deflate
    * stream (the historically common server bug browsers also
    * tolerate); br decodes through commons-compress when the brotli
    * runtime is on the classpath ([[brotliAvailable]]) and otherwise
    * passes through coded with the token recorded, so callers can
    * count the dropped-brotli mass instead of losing it silently. A
    * declared gzip/deflate/decodable-br body that fails to decode is a
    * structural violation → None, same never-throw contract as the
    * framing layer. An empty framed body passes through empty (204/304
    * shapes that still carry the header). Unrecognized tokens return
    * the body UNCHANGED with the token recorded — the caller's
    * quarantine signal. */
  private def contentDecode(headers: Seq[(String, String)], framed: Array[Byte])
      : Option[(String, Array[Byte])] = {
    val coding = headers.collectFirst { case ("content-encoding", v) => v }
      .map(_.trim.toLowerCase).filter(_.nonEmpty).getOrElse("identity")
    coding match {
      case "identity" => Some(("identity", framed))
      case _ if framed.isEmpty => Some((coding, framed))
      case "gzip" | "x-gzip" =>
        // gunzipAll owns the member-iteration strictness (successive
        // members, full consumption, None on mid-body garbage or a
        // truncated member) — one implementation, shared with the
        // sitemap gunzip-by-content path
        GzipCodec.gunzipAll(framed).map { members =>
          val out = new ByteArrayOutputStream(sizeHint(framed.length))
          members.foreach { case (data, _, _) => out.write(data, 0, data.length) }
          ("gzip", out.toByteArray)
        }
      case "deflate" =>
        inflate(framed, zlibWrapped = true)
          .orElse(inflate(framed, zlibWrapped = false))
          .map(("deflate", _))
      case "br" if brotliAvailable =>
        brotliDecode(framed).map(("br", _))
      case other => Some((other, framed))
    }
  }

  /** Whether a brotli decoder backs commons-compress on this
    * classpath (the `org.brotli.dec` runtime is optional); checked
    * once — when absent, `br` bodies pass through coded with the
    * token recorded and the funnel counts them as dropped mass. */
  val brotliAvailable: Boolean =
    try org.apache.commons.compress.compressors.brotli.BrotliUtils
      .isBrotliCompressionAvailable
    catch { case _: Throwable => false }

  private def brotliDecode(b: Array[Byte]): Option[Array[Byte]] =
    try {
      val in = new org.apache.commons.compress.compressors.brotli.BrotliCompressorInputStream(
        new java.io.ByteArrayInputStream(b))
      try {
        val out = new ByteArrayOutputStream(sizeHint(b.length))
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { if (n > 0) out.write(buf, 0, n); n = in.read(buf) }
        Some(out.toByteArray)
      } finally in.close()
    } catch { case _: Exception => None } // malformed brotli: structural violation

  /** Initial decode-buffer capacity: ~3× the coded size, clamped so
    * the int arithmetic cannot go negative on payloads past ~715 MB
    * (a negative capacity throws out of the never-throw contract). */
  private[graft] def sizeHint(codedLen: Int): Int =
    math.min(codedLen.toLong * 3 + 64, Int.MaxValue - 8L).toInt

  private def inflate(b: Array[Byte], zlibWrapped: Boolean): Option[Array[Byte]] = {
    val inf = new java.util.zip.Inflater(!zlibWrapped)
    inf.setInput(b)
    val out = new ByteArrayOutputStream(sizeHint(b.length))
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished()) {
        val n = try inf.inflate(buf)
        catch { case _: java.util.zip.DataFormatException => return None }
        if (n > 0) out.write(buf, 0, n)
        else if (inf.needsInput() || inf.needsDictionary()) return None // truncated
      }
      // trailing garbage after the stream is a malformed body, except
      // the zlib Adler-32 trailer the Inflater already consumed
      if (inf.getRemaining != 0) None else Some(out.toByteArray)
    } finally inf.end()
  }

  private def finish(status: Int, headers: Seq[(String, String)],
                     framed: Array[Byte], chunked: Boolean,
                     nChunks: Int): Option[HttpResponse] =
    contentDecode(headers, framed).map { case (coding, body) =>
      HttpResponse(status, headers, body, chunked, nChunks, coding, framed.length)
    }

  /** Parse a raw HTTP response. Body framing precedence per RFC 9112
    * §6: `Transfer-Encoding: chunked` wins over `Content-Length`;
    * with neither, the body is the rest of the buffer
    * (close-delimited). After de-framing, one `Content-Encoding`
    * layer decodes (see [[HttpResponse.contentCoding]]). */
  def parse(b: Array[Byte]): Option[HttpResponse] = {
    // header block ends at CRLFCRLF
    var hEnd = -1
    var i = 0
    while (hEnd < 0 && i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        hEnd = i
      i += 1
    }
    if (hEnd < 0) return None
    val head = new String(b, 0, hEnd, "UTF-8")
    val lines = head.split("\r\n", -1)
    val status0 = lines(0)
    if (!(status0.startsWith("HTTP/1.1 ") || status0.startsWith("HTTP/1.0 "))) return None
    val rest = status0.substring(9)
    val sp = rest.indexOf(' ')
    val codeStr = if (sp < 0) rest else rest.substring(0, sp)
    if (codeStr.length != 3 || !codeStr.forall(_.isDigit)) return None
    val status = codeStr.toInt
    val headers = Seq.newBuilder[(String, String)]
    var chunked = false
    var clen = -1L
    var ok = true
    lines.drop(1).foreach { line =>
      val sep = line.indexOf(':')
      if (sep <= 0) ok = false
      else {
        val name = line.substring(0, sep).trim.toLowerCase
        val value = line.substring(sep + 1).trim
        headers += ((name, value))
        if (name == "transfer-encoding" &&
            value.toLowerCase.split(",").map(_.trim).contains("chunked")) chunked = true
        if (name == "content-length") {
          if (value.isEmpty || !value.forall(_.isDigit) || value.length > 18) ok = false
          else clen = value.toLong
        }
      }
    }
    if (!ok) return None
    val dataStart = hEnd + 4
    if (chunked) {
      val body = new ByteArrayOutputStream()
      var p = dataStart
      var n = 0
      while (true) {
        // chunk-size line: hex digits, optional ;extension, CRLF
        var e = p
        while (e + 1 < b.length && !(b(e) == '\r' && b(e + 1) == '\n')) e += 1
        if (e + 1 >= b.length) return None
        val sizeLine = new String(b, p, e - p, "UTF-8")
        val hexPart = sizeLine.takeWhile(c => c != ';').trim
        if (hexPart.isEmpty || hexPart.length > 15 ||
            !hexPart.forall(c => Character.digit(c, 16) >= 0)) return None
        val size = java.lang.Long.parseLong(hexPart, 16)
        if (size > Int.MaxValue.toLong) return None
        val cs = e + 2
        if (size == 0L) {
          // trailers (if any) run to the final CRLF; accept bare CRLF too
          var q = cs
          while (q + 1 < b.length && !(b(q) == '\r' && b(q + 1) == '\n')) {
            // skip one trailer line
            var t = q
            while (t + 1 < b.length && !(b(t) == '\r' && b(t + 1) == '\n')) t += 1
            if (t + 1 >= b.length) return None
            q = t + 2
          }
          if (q + 1 >= b.length) return None
          return finish(status, headers.result(), body.toByteArray, chunked = true, n)
        }
        if (cs + size + 2 > b.length) return None
        body.write(b, cs, size.toInt)
        if (!(b(cs + size.toInt) == '\r' && b(cs + size.toInt + 1) == '\n')) return None
        p = cs + size.toInt + 2
        n += 1
      }
      None // unreachable
    } else if (clen >= 0) {
      if (clen > Int.MaxValue.toLong || dataStart + clen > b.length) return None
      finish(status, headers.result(),
        java.util.Arrays.copyOfRange(b, dataStart, dataStart + clen.toInt),
        chunked = false, 0)
    } else {
      finish(status, headers.result(),
        java.util.Arrays.copyOfRange(b, dataStart, b.length), chunked = false, 0)
    }
  }
}
