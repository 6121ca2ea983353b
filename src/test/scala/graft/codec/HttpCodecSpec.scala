package graft.codec

import org.scalatest.funsuite.AnyFunSuite

/** Pins the HTTP/1.x response framing: exact inverse round trips for
  * both Content-Length and chunked bodies, a byte-level golden for the
  * chunked serializer (its bytes are oracle-safe — the SQL oracles
  * rebuild the hex-size framing with `to_hex`), framing precedence,
  * parser tolerances servers actually exercise (chunk extensions,
  * trailers, HTTP/1.0, header case), and never-throw rejection of
  * structural violations. Hand-written raw responses guard against the
  * symmetric writer+parser bug a pure round trip can't see. */
class HttpCodecSpec extends AnyFunSuite {

  test("content-length write/parse is an exact inverse") {
    val body = "hello \r\n\r\n world".getBytes("UTF-8")
    val raw = HttpCodec.write(200, "OK", Seq("Content-Type" -> "text/html"), body)
    val r = HttpCodec.parse(raw).getOrElse(fail("parse"))
    assert(r.status == 200 && !r.chunked && r.nChunks == 0)
    assert(r.header("content-type").contains("text/html"))
    assert(r.header("content-length").contains(body.length.toString))
    assert(java.util.Arrays.equals(r.body, body))
  }

  test("chunked write/parse is an exact inverse across chunk sizes") {
    val body = ("abcdefghij" * 37 + "k").getBytes("UTF-8") // 371 bytes
    for (cs <- Seq(1, 7, 16, 370, 371, 5000)) {
      val raw = HttpCodec.writeChunked(200, "OK", Seq("Content-Type" -> "text/plain"), body, cs)
      val r = HttpCodec.parse(raw).getOrElse(fail(s"parse cs=$cs"))
      assert(r.chunked, s"cs=$cs")
      assert(r.nChunks == (body.length + cs - 1) / cs, s"cs=$cs")
      assert(java.util.Arrays.equals(r.body, body), s"cs=$cs")
    }
    // empty body: just the terminal chunk
    val raw0 = HttpCodec.writeChunked(204, "No Content", Nil, Array.emptyByteArray, 8)
    val r0 = HttpCodec.parse(raw0).getOrElse(fail("empty"))
    assert(r0.chunked && r0.nChunks == 0 && r0.body.isEmpty)
  }

  test("byte-level golden: the chunked form the SQL oracles rebuild") {
    val raw = HttpCodec.writeChunked(200, "OK", Seq("Content-Type" -> "text/html"),
      "0123456789abcdefXYZ".getBytes("UTF-8"), 16)
    val expected =
      "HTTP/1.1 200 OK\r\n" +
        "Content-Type: text/html\r\n" +
        "Transfer-Encoding: chunked\r\n" +
        "\r\n" +
        "10\r\n0123456789abcdef\r\n" + // 16 = 0x10, lowercase unpadded hex
        "3\r\nXYZ\r\n" +
        "0\r\n\r\n"
    assert(new String(raw, "UTF-8") == expected)
  }

  test("hand-written responses: extensions, trailers, 1.0, case, precedence") {
    // chunk extension + trailer header after the 0 chunk
    val ext = ("HTTP/1.1 200 OK\r\nX-A: 1\r\n\r\n" +
      "5;name=val\r\nhello\r\n0\r\nX-Trailer: t\r\n\r\n").getBytes("UTF-8")
    // header block has no Transfer-Encoding → close-delimited... add it:
    val ext2 = ("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
      "5;name=val\r\nhello\r\n0\r\nX-Trailer: t\r\n\r\n").getBytes("UTF-8")
    val r2 = HttpCodec.parse(ext2).getOrElse(fail("ext2"))
    assert(new String(r2.body, "UTF-8") == "hello" && r2.nChunks == 1)
    // without chunked TE the same bytes are a close-delimited body
    val r1 = HttpCodec.parse(ext).getOrElse(fail("ext"))
    assert(!r1.chunked && new String(r1.body, "UTF-8").startsWith("5;name=val"))
    // HTTP/1.0, case-insensitive names, chunked wins over Content-Length
    val mixed = ("HTTP/1.0 404 Not Found\r\ncontent-length: 999\r\n" +
      "TRANSFER-ENCODING: Chunked\r\n\r\n" +
      "2\r\nno\r\n0\r\n\r\n").getBytes("UTF-8")
    val r3 = HttpCodec.parse(mixed).getOrElse(fail("mixed"))
    assert(r3.status == 404 && r3.chunked && new String(r3.body, "UTF-8") == "no")
    // close-delimited: no framing headers at all
    val close = "HTTP/1.1 200 OK\r\nX: y\r\n\r\nrest of stream".getBytes("UTF-8")
    val r4 = HttpCodec.parse(close).getOrElse(fail("close"))
    assert(new String(r4.body, "UTF-8") == "rest of stream")
  }

  test("never-throw rejection of structural violations") {
    val bad = Seq(
      "",                                               // empty
      "HTTP/2 200\r\n\r\n",                             // unsupported version
      "HTTP/1.1 20 OK\r\n\r\n",                         // 2-digit status
      "HTTP/1.1 abc OK\r\n\r\n",                        // non-numeric status
      "HTTP/1.1 200 OK\r\nNoColonHere\r\n\r\n",         // malformed header
      "HTTP/1.1 200 OK\r\nContent-Length: 10\r\n\r\nabc", // truncated body
      "HTTP/1.1 200 OK\r\nContent-Length: -1\r\n\r\n",  // negative length
      "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\nzz\r\nab\r\n0\r\n\r\n", // bad hex
      "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n5\r\nab\r\n0\r\n\r\n",  // chunk overrun
      "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n2\r\nabX\r\n0\r\n\r\n", // missing CRLF
      "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n2\r\nab\r\n",           // no 0 chunk
      "HTTP/1.1 200 OK\r\nContent-Length: 99999999999999999999\r\n\r\n")            // overflow
    bad.foreach { s =>
      assert(HttpCodec.parse(s.getBytes("UTF-8")).isEmpty, s"should reject: $s")
    }
    // fuzz: random prefixes of a valid response must never throw
    val good = HttpCodec.writeChunked(200, "OK", Seq("A" -> "b"), ("x" * 100).getBytes, 7)
    (0 until good.length).foreach { n =>
      HttpCodec.parse(java.util.Arrays.copyOfRange(good, 0, n)) // must not throw
    }
  }

  test("Content-Encoding: gzip/deflate bodies content-decode after de-framing") {
    val payload = ("The quick brown fox. " * 40).getBytes("UTF-8")
    // gzip under Content-Length framing
    val gz = GzipCodec.gzipMember(payload)
    val raw = HttpCodec.write(200, "OK",
      Seq("Content-Type" -> "text/html", "Content-Encoding" -> "gzip"), gz)
    val r = HttpCodec.parse(raw).getOrElse(fail("gzip parse"))
    assert(java.util.Arrays.equals(r.body, payload), "body is the DECODED payload")
    assert(r.contentCoding == "gzip" && r.wireBodyBytes == gz.length)
    assert(r.wireBodyBytes < payload.length, "accounting sees the coded wire size")
    // the same gzip body under CHUNKED framing: layers compose —
    // de-frame first, then content-decode
    val rawC = HttpCodec.writeChunked(200, "OK",
      Seq("Content-Encoding" -> "x-gzip"), gz, 64)
    val rc = HttpCodec.parse(rawC).getOrElse(fail("chunked gzip parse"))
    assert(rc.chunked && java.util.Arrays.equals(rc.body, payload))
    assert(rc.contentCoding == "gzip")
    // deflate: zlib-wrapped and raw stream both decode (browser tolerance)
    def deflate(nowrap: Boolean): Array[Byte] = {
      val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, nowrap)
      d.setInput(payload); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) { val n = d.deflate(buf); out.write(buf, 0, n) }
      d.end(); out.toByteArray
    }
    for (nowrap <- Seq(false, true)) {
      val rawD = HttpCodec.write(200, "OK",
        Seq("Content-Encoding" -> "deflate"), deflate(nowrap))
      val rd = HttpCodec.parse(rawD).getOrElse(fail(s"deflate nowrap=$nowrap"))
      assert(java.util.Arrays.equals(rd.body, payload), s"nowrap=$nowrap")
      assert(rd.contentCoding == "deflate")
    }
    // a declared-gzip body that does not gunzip is structural → None
    val broken = gz.clone(); broken(12) = (broken(12) ^ 0x55).toByte
    assert(HttpCodec.parse(HttpCodec.write(200, "OK",
      Seq("Content-Encoding" -> "gzip"), broken)).isEmpty)
    // br without the optional brotli runtime passes the body through
    // CODED with the token kept — the observable-drop contract (with
    // the runtime present these bytes would be malformed → None, so
    // the assertion branches on availability)
    if (!HttpCodec.brotliAvailable) {
      val rb = HttpCodec.parse(HttpCodec.write(200, "OK",
        Seq("Content-Encoding" -> "br"), payload)).getOrElse(fail("br"))
      assert(rb.contentCoding == "br" && java.util.Arrays.equals(rb.body, payload))
    } else {
      assert(HttpCodec.parse(HttpCodec.write(200, "OK",
        Seq("Content-Encoding" -> "br"), payload)).isEmpty,
        "non-brotli bytes under a decodable br coding are structural")
    }
    // empty coded body (204-ish shape) stays empty rather than failing
    val re = HttpCodec.parse(HttpCodec.write(204, "No Content",
      Seq("Content-Encoding" -> "gzip"), Array.emptyByteArray)).getOrElse(fail("empty"))
    assert(re.body.isEmpty && re.wireBodyBytes == 0)
    // identity rows keep the old accounting
    val ri = HttpCodec.parse(HttpCodec.write(200, "OK", Nil, payload)).getOrElse(fail("id"))
    assert(ri.contentCoding == "identity" && ri.wireBodyBytes == payload.length)
  }

  test("multi-member gzip bodies decode: RFC 1952 concatenated members are one stream") {
    // flush-per-chunk servers emit one gzip MEMBER per flush; the
    // concatenation is a legal gzip stream browsers decode in full
    val parts = Seq("first flush of data. ", "second, longer flush of data here. ",
      "and a final trailing flush.").map(_.getBytes("UTF-8"))
    val concat = {
      val out = new java.io.ByteArrayOutputStream()
      parts.foreach { p => val m = GzipCodec.gzipMember(p); out.write(m, 0, m.length) }
      out.toByteArray
    }
    val whole = parts.reduce(_ ++ _)
    for ((raw, tag) <- Seq(
      HttpCodec.write(200, "OK", Seq("Content-Encoding" -> "gzip"), concat) -> "content-length",
      HttpCodec.writeChunked(200, "OK", Seq("Content-Encoding" -> "gzip"), concat, 48) -> "chunked")) {
      val r = HttpCodec.parse(raw).getOrElse(fail(s"$tag multi-member parse"))
      assert(java.util.Arrays.equals(r.body, whole), s"$tag: members concatenate in order")
      assert(r.contentCoding == "gzip" && r.wireBodyBytes == concat.length)
    }
    // garbage BETWEEN members is still structural: the second offset
    // does not start a valid member → None, not a silent truncation
    val m1 = GzipCodec.gzipMember(parts.head)
    val poisoned = m1 ++ Array[Byte](0x00, 0x11, 0x22) ++ GzipCodec.gzipMember(parts(1))
    assert(HttpCodec.parse(HttpCodec.write(200, "OK",
      Seq("Content-Encoding" -> "gzip"), poisoned)).isEmpty)
    // a truncated second member is structural too
    val m2 = GzipCodec.gzipMember(parts(1))
    val truncated = m1 ++ m2.take(m2.length - 3)
    assert(HttpCodec.parse(HttpCodec.write(200, "OK",
      Seq("Content-Encoding" -> "gzip"), truncated)).isEmpty)
  }
}
