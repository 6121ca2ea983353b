package graft.codec

import org.scalatest.funsuite.AnyFunSuite

/** Pins the WARC/1.0 container: exact inverse round trip, byte
  * determinism with a full byte-level golden (the writer's bytes are
  * oracle-safe, so the golden IS the contract the SQL oracles replay),
  * content-length framing protecting payloads that contain CRLFCRLF,
  * parser tolerance (header order, case, WARC/1.1, unknown headers),
  * and never-throw rejection of structural violations. */
class WarcCodecSpec extends AnyFunSuite {

  private def rec(id: Long, body: String) = WarcRecord(
    "response", f"urn:graft:$id%012d",
    Some(s"https://d${id % 50}.example.com/p$id"), "text/html",
    body.getBytes("UTF-8"))

  test("write/parse is an exact inverse; bytes are deterministic") {
    val records = Seq(rec(0, ""), rec(1, "<p>hi</p>"), rec(512, "x" * 1500))
    val warc = WarcCodec.write(records)
    assert(java.util.Arrays.equals(warc, WarcCodec.write(records)), "determinism")
    val back = WarcCodec.parse(warc).getOrElse(fail("parse failed"))
    assert(back.size == records.size)
    back.zip(records).foreach { case (a, b) =>
      assert(a.warcType == b.warcType)
      assert(a.recordId == b.recordId)
      assert(a.targetUri == b.targetUri)
      assert(a.contentType == b.contentType)
      assert(java.util.Arrays.equals(a.payload, b.payload))
    }
    assert(WarcCodec.parse(WarcCodec.write(Nil)).contains(Seq.empty))
  }

  test("parseIndexed: offsets tile the file; each slice re-parses alone") {
    val records = Seq(rec(0, "a"), rec(1, "<p>hi</p>"), rec(2, "x" * 700))
    val warc = WarcCodec.write(records)
    val idx = WarcCodec.parseIndexed(warc).getOrElse(fail("parseIndexed"))
    assert(idx.size == 3)
    // offsets tile: record k+1 starts where record k ends; total = file size
    assert(idx.head._2 == 0L)
    idx.sliding(2).foreach { case Seq((_, o1, l1), (_, o2, _)) => assert(o1 + l1 == o2) }
    assert(idx.last._2 + idx.last._3 == warc.length.toLong)
    idx.zip(records).foreach { case ((r, off, len), orig) =>
      // the ranged read a CDX lookup performs: slice → single-record parse
      val slice = java.util.Arrays.copyOfRange(warc, off.toInt, (off + len).toInt)
      assert(new String(slice, 0, 5, "UTF-8") == "WARC/")
      val alone = WarcCodec.parse(slice).getOrElse(fail("slice parse"))
      assert(alone.size == 1 && alone.head.recordId == orig.recordId)
      assert(java.util.Arrays.equals(alone.head.payload, orig.payload))
      assert(java.util.Arrays.equals(r.payload, orig.payload))
    }
  }

  test("byte-level golden: the exact serialized form the SQL oracles rebuild") {
    val warc = WarcCodec.write(Seq(WarcRecord(
      "conversion", "urn:graft:000000000007", Some("https://x.org/a"),
      "text/plain", "hello".getBytes("UTF-8"))))
    val expected =
      "WARC/1.0\r\n" +
        "WARC-Type: conversion\r\n" +
        "WARC-Record-ID: <urn:graft:000000000007>\r\n" +
        "WARC-Date: 1970-01-01T00:00:00Z\r\n" +
        "WARC-Target-URI: https://x.org/a\r\n" +
        "Content-Type: text/plain\r\n" +
        "Content-Length: 5\r\n" +
        "\r\n" +
        "hello\r\n\r\n"
    assert(new String(warc, "UTF-8") == expected)
  }

  test("content-length framing protects payloads containing CRLFCRLF") {
    val tricky = "a\r\n\r\nWARC/1.0\r\n\r\nb".getBytes("UTF-8")
    val records = Seq(
      WarcRecord("response", "urn:graft:000000000001", None, "application/octet-stream", tricky),
      rec(2, "tail"))
    val back = WarcCodec.parse(WarcCodec.write(records)).getOrElse(fail("parse"))
    assert(back.size == 2)
    assert(java.util.Arrays.equals(back(0).payload, tricky))
    assert(back(1).recordId == "urn:graft:000000000002")
  }

  test("parser tolerates header order, case, WARC/1.1, unknown headers") {
    val hand = ("WARC/1.1\r\n" +
      "content-length: 3\r\n" +
      "X-Custom: whatever\r\n" +
      "warc-target-uri: https://y.net/\r\n" +
      "CONTENT-TYPE: text/plain\r\n" +
      "WARC-Date: 2025-03-01T12:00:00Z\r\n" +
      "Warc-Record-Id: <urn:other:42>\r\n" +
      "WARC-Type: request\r\n" +
      "\r\n" +
      "abc\r\n\r\n").getBytes("UTF-8")
    val back = WarcCodec.parse(hand).getOrElse(fail("tolerant parse failed"))
    assert(back.size == 1)
    val r = back.head
    assert(r.warcType == "request")
    assert(r.recordId == "urn:other:42")
    assert(r.targetUri.contains("https://y.net/"))
    assert(r.contentType == "text/plain")
    assert(new String(r.payload, "UTF-8") == "abc")
  }

  test("structural violations return None, never throw") {
    val good = WarcCodec.write(Seq(rec(1, "body")))
    assert(WarcCodec.parse("HTTP/1.0\r\n\r\n".getBytes).isEmpty, "wrong version line")
    assert(WarcCodec.parse(good.dropRight(1)).isEmpty, "missing terminator byte")
    assert(WarcCodec.parse(good.take(20)).isEmpty, "unterminated header block")
    val noLen = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Record-ID: <urn:graft:000000000001>\r\n\r\nxx\r\n\r\n").getBytes("UTF-8")
    assert(WarcCodec.parse(noLen).isEmpty, "absent content-length")
    val badLen = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Record-ID: <urn:graft:000000000001>\r\n" +
      "Content-Length: 2x\r\n\r\nxx\r\n\r\n").getBytes("UTF-8")
    assert(WarcCodec.parse(badLen).isEmpty, "malformed content-length")
    // payload shorter than declared: terminator check runs off real data
    val lied = new String(good, "UTF-8").replace("Content-Length: 4", "Content-Length: 9")
    assert(WarcCodec.parse(lied.getBytes("UTF-8")).isEmpty, "overlong declared length")
    assert(WarcCodec.parse(("WARC/1.0\r\nnocolon\r\n\r\n\r\n\r\n").getBytes).isEmpty,
      "header line without separator")
  }

  test("writer rejects CRLF-bearing header values") {
    intercept[IllegalArgumentException] {
      WarcCodec.write(Seq(WarcRecord("response", "urn:graft:1", Some("https://a\r\nX: b"),
        "text/html", Array.emptyByteArray)))
    }
  }
  test("revisit records: extras round-trip, empty payload, refers-to resolves") {
    val body = "<html>the original bytes</html>".getBytes("UTF-8")
    val resp = WarcRecord("response", "urn:graft:000000000003",
      Some("https://a.org/p3"), "text/html", body)
    val rev = WarcRecord("revisit", "urn:graft:000000000007",
      Some("https://a.org/p7"), "text/html", Array.emptyByteArray, Seq(
        "WARC-Refers-To" -> "<urn:graft:000000000003>",
        "WARC-Payload-Digest" -> "md5:0123456789abcdef0123456789abcdef",
        "WARC-Profile" ->
          "http://netpreserve.org/warc/1.0/revisit/identical-payload-digest"))
    val bytes = WarcCodec.write(Seq(resp, rev))
    val back = WarcCodec.parse(bytes).get
    assert(back.size == 2)
    assert(back(0).warcType == "response" && back(0).extras.isEmpty)
    val r = back(1)
    assert(r.warcType == "revisit" && r.payload.isEmpty)
    assert(r.extras == rev.extras, "extension headers survive byte-exact, in order")
    // the reference chain closes: a reader can fetch the original
    val referred = r.extras.collectFirst { case ("WARC-Refers-To", v) => v }.get
    assert(referred == "<" + back(0).recordId + ">")
    // determinism: same records, same bytes
    assert(java.util.Arrays.equals(bytes, WarcCodec.write(Seq(resp, rev))))
  }
  test("writer rejects extras that shadow fixed headers or are not WARC-*") {
    def withExtras(extras: Seq[(String, String)]) = WarcRecord(
      "revisit", "urn:graft:000000000001", Some("https://a.org/p"),
      "text/html", Array.emptyByteArray, extras)
    // a smuggled Content-Length would move the payload boundary and
    // void the parse of every record in the file — fail at write time
    intercept[IllegalArgumentException] {
      WarcCodec.write(Seq(withExtras(Seq("Content-Length" -> "999"))))
    }
    intercept[IllegalArgumentException] {
      WarcCodec.write(Seq(withExtras(Seq("WARC-Type" -> "response"))))
    }
    intercept[IllegalArgumentException] {
      WarcCodec.write(Seq(withExtras(Seq("X-Custom" -> "v"))))
    }
    // a legitimate extension header still writes
    assert(WarcCodec.parse(WarcCodec.write(Seq(withExtras(
      Seq("WARC-Profile" -> "p"))))).get.head.extras == Seq("WARC-Profile" -> "p"))
  }
}
