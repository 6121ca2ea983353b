package graft.codec

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Inflater}

/** Deterministic ZIP (PKWARE APPNOTE) writer + parser — the third shard
  * container beside [[TarCodec]] and [[WarcCodec]]. The writer emits
  * STORED (method 0) entries by default, with zeroed DOS date/time and
  * no extra fields or comments, so — like tar and WARC — the written
  * bytes are a pure function of the members and every field is integer
  * arithmetic an oracle can replay (local header 30 + name + payload,
  * central entry 46 + name, EOCD 22). Compression belongs to the
  * PAYLOAD layer (deflateLength, the PNG writer), not the container —
  * same doctrine that keeps shard identity byte-stable. (Opt-in
  * DEFLATE members exist for OPC fixtures — a .docx is a zip whose
  * members real writers always compress — still deterministic, just
  * not field-replayable arithmetic.)
  *
  * The parser is the tolerant side: it walks the central directory (the
  * authoritative index — local headers alone cannot delimit streamed
  * archives), accepts STORED and DEFLATE (method 8) entries — so
  * archives produced by ordinary zip tools read back — verifies each
  * entry's CRC-32 against the recovered payload, and returns None on
  * any structural violation (bad signatures, truncation, offsets off
  * the buffer, unsupported method, CRC mismatch) — the never-throw
  * contract of all the graft decoders. */
object ZipCodec {

  private def u16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def u32(v: Long): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** Serialize members as STORED entries in the given order. Names must
    * be non-empty ASCII without wildcards on determinism: the archive
    * bytes depend only on (name, payload) pairs. Names in
    * `deflateNames` write as DEFLATE (method 8) entries instead —
    * `java.util.zip.Deflater` at default settings is deterministic for
    * fixed input (the PdfFixtures precedent), and a fixture archive
    * with a compressed member exercises the parser's foreign-DEFLATE
    * read path end to end. */
  def write(members: Seq[(String, Array[Byte])],
            deflateNames: Set[String] = Set.empty): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val central = new ByteArrayOutputStream()
    var offset = 0L
    members.foreach { case (name, payload) =>
      val nameB = name.getBytes("US-ASCII")
      require(nameB.nonEmpty && nameB.length <= 0xffff, s"bad member name: '$name'")
      require(payload.length.toLong <= 0xffffffffL, "zip64 not supported")
      val crc = new CRC32(); crc.update(payload)
      val c = crc.getValue
      val method = if (deflateNames.contains(name)) 8 else 0
      val stored: Array[Byte] =
        if (method == 0) payload
        else {
          val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
          d.setInput(payload); d.finish()
          val z = new ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          while (!d.finished()) z.write(buf, 0, d.deflate(buf))
          d.end()
          z.toByteArray
        }
      // local file header
      out.write(u32(0x04034b50L)); out.write(u16(20)); out.write(u16(0))
      out.write(u16(method))
      out.write(u16(0)); out.write(u16(0)) // DOS time/date zeroed
      out.write(u32(c)); out.write(u32(stored.length.toLong)); out.write(u32(payload.length.toLong))
      out.write(u16(nameB.length)); out.write(u16(0))
      out.write(nameB, 0, nameB.length)
      out.write(stored, 0, stored.length)
      // central directory entry
      central.write(u32(0x02014b50L)); central.write(u16(20)); central.write(u16(20))
      central.write(u16(0)); central.write(u16(method))
      central.write(u16(0)); central.write(u16(0)) // time/date
      central.write(u32(c)); central.write(u32(stored.length.toLong)); central.write(u32(payload.length.toLong))
      central.write(u16(nameB.length)); central.write(u16(0)); central.write(u16(0))
      central.write(u16(0)); central.write(u16(0)); central.write(u32(0L)) // disk, attrs
      central.write(u32(offset))
      central.write(nameB, 0, nameB.length)
      offset += 30L + nameB.length + stored.length
    }
    val cd = central.toByteArray
    out.write(cd, 0, cd.length)
    // end of central directory
    out.write(u32(0x06054b50L)); out.write(u16(0)); out.write(u16(0))
    out.write(u16(members.size)); out.write(u16(members.size))
    out.write(u32(cd.length.toLong)); out.write(u32(offset)); out.write(u16(0))
    out.toByteArray
  }

  private def rd16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
  private def rd32(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) | ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)

  /** Member NAMES only, via the central directory — the cheap
    * classification read: an OPC router needs to know whether
    * `word/document.xml` or `ppt/slides/…` exists, which costs a
    * directory walk and ZERO payload decompression/CRC work (the full
    * [[parse]] inflates and checksums every member). Same structural
    * validation on the directory itself; None on malformation. */
  def memberNames(b: Array[Byte]): Option[Seq[String]] = {
    if (b == null || b.length < 22) return None
    var e = b.length - 22
    while (e >= 0 && rd32(b, e) != 0x06054b50L) e -= 1
    if (e < 0) return None
    val n = rd16(b, e + 10)
    if (rd16(b, e + 8) != n) return None
    val cdSize = rd32(b, e + 12)
    val cdOff = rd32(b, e + 16)
    if (cdOff + cdSize > e) return None
    val names = Seq.newBuilder[String]
    var p = cdOff.toInt
    var i = 0
    while (i < n) {
      if (p + 46 > b.length || rd32(b, p) != 0x02014b50L) return None
      val nameLen = rd16(b, p + 28)
      val extraLen = rd16(b, p + 30)
      val commentLen = rd16(b, p + 32)
      if (p + 46 + nameLen > b.length) return None
      names += new String(b, p + 46, nameLen, "UTF-8")
      p += 46 + nameLen + extraLen + commentLen
      i += 1
    }
    Some(names.result())
  }

  /** Parse an archive back to its members via the central directory;
    * STORED and DEFLATE entries supported; None on any malformation. */
  def parse(b: Array[Byte]): Option[Seq[(String, Array[Byte])]] = {
    // EOCD: scan backward (a trailing archive comment may follow it)
    var e = b.length - 22
    while (e >= 0 && rd32(b, e) != 0x06054b50L) e -= 1
    if (e < 0) return None
    val n = rd16(b, e + 10)
    if (rd16(b, e + 8) != n) return None // multi-disk unsupported
    val cdSize = rd32(b, e + 12)
    val cdOff = rd32(b, e + 16)
    if (cdOff + cdSize > e) return None
    val members = Seq.newBuilder[(String, Array[Byte])]
    var p = cdOff.toInt
    var i = 0
    while (i < n) {
      if (p + 46 > b.length || rd32(b, p) != 0x02014b50L) return None
      val method = rd16(b, p + 10)
      val crc = rd32(b, p + 16)
      val csize = rd32(b, p + 20)
      val usize = rd32(b, p + 24)
      val nameLen = rd16(b, p + 28)
      val extraLen = rd16(b, p + 30)
      val commentLen = rd16(b, p + 32)
      val lho = rd32(b, p + 42)
      if (p + 46 + nameLen > b.length) return None
      val name = new String(b, p + 46, nameLen, "UTF-8")
      // local header: its own name/extra lengths may differ from central's
      val lh = lho.toInt
      if (lho + 30 > b.length || rd32(b, lh) != 0x04034b50L) return None
      val lNameLen = rd16(b, lh + 26)
      val lExtraLen = rd16(b, lh + 28)
      val dataStart = lho + 30 + lNameLen + lExtraLen
      if (csize > Int.MaxValue.toLong || usize > Int.MaxValue.toLong ||
        dataStart + csize > b.length) return None
      val raw = java.util.Arrays.copyOfRange(b, dataStart.toInt, (dataStart + csize).toInt)
      val payload: Array[Byte] = method match {
        case 0 =>
          if (csize != usize) return None
          raw
        case 8 =>
          val inf = new Inflater(true)
          try {
            inf.setInput(raw)
            val outB = new Array[Byte](usize.toInt)
            var got = 0
            while (got < outB.length && !inf.finished()) {
              val k = try inf.inflate(outB, got, outB.length - got)
              catch { case _: java.util.zip.DataFormatException => return None }
              if (k == 0 && inf.needsInput()) return None // truncated stream
              got += k
            }
            if (got != outB.length) return None
            outB
          } finally inf.end()
        case _ => return None
      }
      val check = new CRC32(); check.update(payload)
      if (check.getValue != crc) return None
      members += ((name, payload))
      p += 46 + nameLen + extraLen + commentLen
      i += 1
    }
    Some(members.result())
  }
}
