package graft.codec

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater, Inflater}

/** RFC 1952 gzip member codec — the compression layer of `.warc.gz`
  * crawl archives, which gzip each WARC record as its OWN member and
  * concatenate the members, so a CDX-style index of COMPRESSED
  * (offset, length) pairs still addresses single records through
  * ranged reads. The writer emits a fixed 10-byte header (MTIME 0,
  * XFL 0, OS 255 — bytes must not depend on wall clock or platform)
  * around a raw-deflate body and the CRC32+ISIZE trailer. Unlike the
  * WARC/tar/ZIP-stored writers, deflate OUTPUT is a zlib
  * implementation detail, so compressed bytes are NOT oracle-safe:
  * queries over this layer pin DECODED content, never archive bytes
  * (the [[graft.expressions]] DeflateLength doctrine).
  *
  * The reader follows the never-throw contract: `None` on any
  * structural violation (bad magic, unknown compression method,
  * truncated member, CRC or ISIZE mismatch). FTEXT/FNAME/FCOMMENT/
  * FEXTRA/FHCRC header fields are skipped per spec, so foreign
  * members (gzip(1) output with embedded file names) read fine. */
object GzipCodec {

  /** One deterministic gzip member around `data`. */
  def gzipMember(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length / 2 + 32)
    out.write(Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0xff.toByte))
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(data); d.finish()
    val buf = new Array[Byte](8192)
    while (!d.finished()) {
      val n = d.deflate(buf)
      out.write(buf, 0, n)
    }
    d.end()
    val crc = new CRC32()
    crc.update(data)
    def le32(v: Long): Unit =
      (0 until 4).foreach(i => out.write(((v >>> (8 * i)) & 0xff).toInt))
    le32(crc.getValue)
    le32(data.length.toLong & 0xffffffffL)
    out.toByteArray
  }

  /** Decode ONE member starting at `off`; returns `(payload, length
    * consumed)` so callers can walk concatenated members or do a
    * CDX-ranged read. None on any malformation. */
  def gunzipMember(b: Array[Byte], off: Int): Option[(Array[Byte], Int)] = {
    if (off < 0 || off + 10 > b.length) return None
    if (b(off) != 0x1f || b(off + 1) != 0x8b.toByte || b(off + 2) != 8) return None
    val flg = b(off + 3) & 0xff
    var p = off + 10
    if ((flg & 4) != 0) { // FEXTRA: 2-byte LE length + payload
      if (p + 2 > b.length) return None
      p += 2 + ((b(p) & 0xff) | ((b(p + 1) & 0xff) << 8))
    }
    def skipZeroTerminated(): Boolean = {
      while (p < b.length && b(p) != 0) p += 1
      if (p >= b.length) false else { p += 1; true }
    }
    if ((flg & 8) != 0 && !skipZeroTerminated()) return None // FNAME
    if ((flg & 16) != 0 && !skipZeroTerminated()) return None // FCOMMENT
    if ((flg & 2) != 0) p += 2 // FHCRC
    if (p > b.length) return None
    val inf = new Inflater(true)
    inf.setInput(b, p, b.length - p)
    val out = new ByteArrayOutputStream(1024)
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished()) {
        val n = try inf.inflate(buf)
        catch { case _: java.util.zip.DataFormatException => return None }
        if (n > 0) out.write(buf, 0, n)
        else if (inf.needsInput() || inf.needsDictionary()) return None // truncated
      }
      val consumed = p + inf.getBytesRead.toInt + 8 - off
      if (off + consumed > b.length) return None
      val data = out.toByteArray
      val crc = new CRC32()
      crc.update(data)
      val tp = p + inf.getBytesRead.toInt
      def le32(at: Int): Long =
        (0 until 4).map(i => (b(at + i) & 0xffL) << (8 * i)).sum
      if (le32(tp) != crc.getValue) return None
      if (le32(tp + 4) != (data.length.toLong & 0xffffffffL)) return None
      Some((data, consumed))
    } finally inf.end()
  }

  /** Decode every member of a concatenated-member file, with each
    * member's (offset, compressed length) — the walk a `.warc.gz`
    * reader performs. None if any member is malformed or trailing
    * garbage follows the last member. */
  def gunzipAll(b: Array[Byte]): Option[Seq[(Array[Byte], Long, Long)]] = {
    val out = Seq.newBuilder[(Array[Byte], Long, Long)]
    var p = 0
    while (p < b.length) {
      gunzipMember(b, p) match {
        case Some((data, n)) => out += ((data, p.toLong, n.toLong)); p += n
        case None => return None
      }
    }
    Some(out.result())
  }
}
