package graft.codec

import java.io.ByteArrayOutputStream

/** One WARC record's engine-visible fields. `recordId` is the bare URI
  * (serialized inside the spec's angle brackets); `targetUri` is absent
  * for records that have none (e.g. `warcinfo`). */
final case class WarcRecord(
    warcType: String,
    recordId: String,
    targetUri: Option[String],
    contentType: String,
    payload: Array[Byte],
    /** Additional `WARC-*` headers beyond the fixed five — the revisit
      * family's `WARC-Refers-To` / `WARC-Payload-Digest` /
      * `WARC-Profile` live here. Written in the given order (after
      * WARC-Target-URI, before Content-Type) so bytes stay a pure
      * function of the record; the parser recovers them in file
      * order. */
    extras: Seq[(String, String)] = Nil)

/** Deterministic WARC/1.0 (ISO 28500) writer + parser — the container
  * web corpora actually arrive in (crawl archives ship response records;
  * the extracted-text "WET" sibling ships `conversion` records). Like
  * [[TarCodec]], the container adds no compression, so the WRITTEN bytes
  * are a pure function of the records and therefore oracle-safe: the
  * writer emits a fixed header order, a fixed `WARC-Date` (the epoch —
  * record identity must not depend on wall clock), and CRLF line
  * endings, making each record's bytes reconstructible by string
  * concatenation in plain SQL.
  *
  * The parser is the tolerant side: headers in ANY order, header names
  * case-insensitive (per spec §4), unknown headers skipped, WARC/1.0 and
  * WARC/1.1 accepted. It returns None on any structural violation —
  * missing version line, unterminated header block, absent/malformed
  * `Content-Length`, payload running off the buffer, or a missing
  * record terminator — the same never-throw contract as the media
  * decoders. */
object WarcCodec {

  /** Fixed, deterministic record date: bytes must be a pure function of
    * the members (tar doctrine — mtime 0). */
  val FixedDate = "1970-01-01T00:00:00Z"

  private val Crlf = "\r\n"

  /** The headers the writer emits itself — extras must not shadow them. */
  private val FixedHeaderNames =
    Set("warc-type", "warc-record-id", "warc-date", "warc-target-uri")

  private def clean(s: String, what: String): String = {
    require(s.nonEmpty && !s.exists(c => c == '\r' || c == '\n'),
      s"$what must be non-empty and CRLF-free: '$s'")
    s
  }

  /** Serialize records in the given order; fixed header order, fixed
    * date, CRLF framing. Header values must be CRLF-free ASCII. */
  def write(records: Seq[WarcRecord]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    records.foreach { r =>
      val sb = new StringBuilder
      sb ++= "WARC/1.0" ++= Crlf
      sb ++= "WARC-Type: " ++= clean(r.warcType, "WARC-Type") ++= Crlf
      sb ++= "WARC-Record-ID: <" ++= clean(r.recordId, "WARC-Record-ID") ++= ">" ++= Crlf
      sb ++= "WARC-Date: " ++= FixedDate ++= Crlf
      r.targetUri.foreach(u => sb ++= "WARC-Target-URI: " ++= clean(u, "WARC-Target-URI") ++= Crlf)
      r.extras.foreach { case (k, v) =>
        // extras must be WARC extension headers that cannot shadow the
        // fixed five: a smuggled Content-Length would move the payload
        // boundary and void the PARSE of every record in the file
        val kl = k.toLowerCase
        require(kl.startsWith("warc-") && !FixedHeaderNames(kl),
          s"extra header must be a non-fixed WARC-* extension header: '$k'")
        sb ++= clean(k, "extra header name") ++= ": " ++= clean(v, "extra header value") ++= Crlf
      }
      sb ++= "Content-Type: " ++= clean(r.contentType, "Content-Type") ++= Crlf
      sb ++= "Content-Length: " ++= r.payload.length.toString ++= Crlf
      sb ++= Crlf
      val hdr = sb.result().getBytes("UTF-8")
      out.write(hdr, 0, hdr.length)
      out.write(r.payload, 0, r.payload.length)
      out.write('\r'); out.write('\n'); out.write('\r'); out.write('\n')
    }
    out.toByteArray
  }

  /** Parse a WARC file back to its records; None on any malformation. */
  def parse(b: Array[Byte]): Option[Seq[WarcRecord]] =
    parseIndexed(b).map(_.map(_._1))

  /** [[parse]] plus each record's byte position: `(record, offset,
    * length)` where `offset` is the record's first byte (its `WARC/`
    * version line) and `length` spans headers, payload, and the CRLFCRLF
    * terminator — the (offset, length) pair a CDX-style lookup index
    * stores so a reader can fetch ONE record from a multi-GB archive
    * with a ranged read instead of a scan. Offsets tile the file
    * exactly: record k+1 starts at offset k + length k. */
  def parseIndexed(b: Array[Byte]): Option[Seq[(WarcRecord, Long, Long)]] = {
    val records = Seq.newBuilder[(WarcRecord, Long, Long)]
    var p = 0
    while (p < b.length) {
      // locate the header block terminator CRLFCRLF
      var hEnd = -1
      var i = p
      while (hEnd < 0 && i + 3 < b.length) {
        if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
          hEnd = i
        i += 1
      }
      if (hEnd < 0) return None
      val header = new String(b, p, hEnd - p, "UTF-8")
      val lines = header.split("\r\n", -1)
      if (lines.isEmpty || !(lines(0) == "WARC/1.0" || lines(0) == "WARC/1.1")) return None
      var wtype: String = null
      var rid: String = null
      var target: Option[String] = None
      var ctype = "application/octet-stream"
      var clen = -1L
      val extras = Seq.newBuilder[(String, String)]
      lines.drop(1).foreach { line =>
        val sep = line.indexOf(':')
        if (sep <= 0) return None
        val name = line.substring(0, sep).trim.toLowerCase
        val value = line.substring(sep + 1).trim
        name match {
          case "warc-type" => wtype = value
          case "warc-record-id" =>
            rid = if (value.startsWith("<") && value.endsWith(">") && value.length >= 2)
              value.substring(1, value.length - 1)
            else value
          case "warc-target-uri" => target = Some(value)
          case "content-type" => ctype = value
          case "content-length" =>
            if (value.isEmpty || !value.forall(_.isDigit)) return None
            clen = value.toLong
          case "warc-date" => () // fixed on write, ignored on read
          case _ if name.startsWith("warc-") =>
            // revisit-family and other extension headers survive the
            // round trip with the writer's original capitalization
            extras += ((line.substring(0, sep).trim, value))
          case _ => () // unknown non-WARC header
        }
      }
      if (wtype == null || rid == null || clen < 0) return None
      val dataStart = hEnd + 4
      if (clen > Int.MaxValue.toLong || dataStart + clen + 4 > b.length) return None
      val dataEnd = dataStart + clen.toInt
      if (!(b(dataEnd) == '\r' && b(dataEnd + 1) == '\n' &&
            b(dataEnd + 2) == '\r' && b(dataEnd + 3) == '\n')) return None
      records += ((WarcRecord(wtype, rid, target, ctype,
        java.util.Arrays.copyOfRange(b, dataStart, dataEnd), extras.result()),
        p.toLong, (dataEnd + 4 - p).toLong))
      p = dataEnd + 4
    }
    Some(records.result())
  }
}
