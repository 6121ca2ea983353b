package graft.codec

import java.io.ByteArrayOutputStream

/** Deterministic USTAR (POSIX.1-1988 tar) writer + parser — the shard
  * container of the WebDataset-style training-data layout: a corpus of
  * (name, payload) members packed into fixed archives an ordinary
  * `tar` can list and extract. No compression, no timestamps (mtime 0),
  * fixed mode/uid/gid — so the written bytes are a pure function of the
  * members, and a shard's identity is stable across runs and machines
  * (unlike the PNG writer, tar bytes ARE oracle-safe).
  *
  * Scope: regular files only (typeflag '0'), names ≤ 100 bytes, sizes
  * < 8 GiB (11 octal digits). The parser verifies the stored header
  * checksum and the magic, stops at the end-of-archive zero block, and
  * returns None on any structural violation — same never-throw contract
  * as the media decoders. */
object TarCodec {

  private val BlockSize = 512

  private def octal(v: Long, width: Int): Array[Byte] = {
    // width-1 octal digits, NUL terminated (the GNU/POSIX common form)
    val s = java.lang.Long.toOctalString(v)
    require(s.length <= width - 1, s"value $v overflows a $width-byte octal field")
    (("0" * (width - 1 - s.length)) + s).getBytes("US-ASCII") :+ 0.toByte
  }

  /** Serialize members in the given order. Names must be unique,
    * non-empty, ≤ 100 ASCII bytes. */
  def write(members: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    members.foreach { case (name, payload) =>
      val nameB = name.getBytes("US-ASCII")
      require(nameB.nonEmpty && nameB.length <= 100, s"bad member name: '$name'")
      val hdr = new Array[Byte](BlockSize)
      System.arraycopy(nameB, 0, hdr, 0, nameB.length)
      System.arraycopy(octal(420, 8), 0, hdr, 100, 8) // mode 0644
      System.arraycopy(octal(0, 8), 0, hdr, 108, 8) // uid
      System.arraycopy(octal(0, 8), 0, hdr, 116, 8) // gid
      System.arraycopy(octal(payload.length.toLong, 12), 0, hdr, 124, 12)
      System.arraycopy(octal(0, 12), 0, hdr, 136, 12) // mtime
      java.util.Arrays.fill(hdr, 148, 156, ' '.toByte) // chksum spans as spaces
      hdr(156) = '0' // regular file
      System.arraycopy("ustar".getBytes("US-ASCII"), 0, hdr, 257, 5)
      // version "00" (258-259 of magic field per POSIX: magic 6 + version 2)
      hdr(263) = '0'; hdr(264) = '0'
      var sum = 0L
      hdr.foreach(b => sum += (b & 0xff))
      val ck = octal(sum, 7) // 6 digits + NUL, then a space
      System.arraycopy(ck, 0, hdr, 148, 7)
      hdr(155) = ' '
      out.write(hdr, 0, BlockSize)
      out.write(payload, 0, payload.length)
      val pad = (BlockSize - payload.length % BlockSize) % BlockSize
      out.write(new Array[Byte](pad), 0, pad)
    }
    out.write(new Array[Byte](2 * BlockSize), 0, 2 * BlockSize) // end of archive
    out.toByteArray
  }

  /** Parse an archive back to its members; None on any malformed
    * header, checksum mismatch, truncation, or missing terminator. */
  def parse(b: Array[Byte]): Option[Seq[(String, Array[Byte])]] = {
    val members = Seq.newBuilder[(String, Array[Byte])]
    var p = 0
    var done = false
    while (!done) {
      if (p + BlockSize > b.length) return None // no terminator
      if ((0 until BlockSize).forall(i => b(p + i) == 0)) {
        // first zero block; require a second one inside the buffer
        if (p + 2 * BlockSize > b.length) return None
        if (!(0 until BlockSize).forall(i => b(p + BlockSize + i) == 0)) return None
        done = true
      } else {
        val nameEnd = (0 until 100).indexWhere(i => b(p + i) == 0) match {
          case -1 => 100
          case n => n
        }
        if (nameEnd == 0) return None
        val name = new String(b, p, nameEnd, "US-ASCII")
        def octalField(off: Int, len: Int): Long = {
          var v = 0L
          var i = 0
          var seen = false
          while (i < len) {
            val c = b(p + off + i) & 0xff
            if (c >= '0' && c <= '7') { v = v * 8 + (c - '0'); seen = true; i += 1 }
            else if (c == 0 || c == ' ') { if (seen) i = len else i += 1 }
            else return -1L
          }
          if (seen) v else -1L
        }
        val size = octalField(124, 12)
        val storedCk = octalField(148, 8)
        if (size < 0 || storedCk < 0) return None
        var sum = 0L
        var i = 0
        while (i < BlockSize) {
          sum += (if (i >= 148 && i < 156) ' '.toInt else b(p + i) & 0xff)
          i += 1
        }
        if (sum != storedCk) return None
        if (b(p + 156) != '0' && b(p + 156) != 0) return None // regular files only
        val dataStart = p + BlockSize
        if (size > Int.MaxValue.toLong || dataStart + size > b.length) return None
        members += ((name, java.util.Arrays.copyOfRange(b, dataStart, dataStart + size.toInt)))
        p = dataStart + ((size.toInt + BlockSize - 1) / BlockSize) * BlockSize
      }
    }
    Some(members.result())
  }
}
