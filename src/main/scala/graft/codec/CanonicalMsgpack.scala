package graft.codec

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import scala.collection.immutable.TreeMap

/** Minimal canonical msgpack encoder — sorted map keys, omit-empty (callers
  * leave empty fields out), shortest-form integer encodings. This is the
  * hashing substrate for transaction ids (the reference hashes the
  * canonically msgpack-encoded txn: write_txn.go:134 via
  * crypto.TransactionIDString; SURVEY §2.G4).
  *
  * Only the shapes the txn encoding needs are supported: nil, bool,
  * unsigned ints, raw bytes, strings, arrays, string-keyed maps.
  */
object CanonicalMsgpack {

  sealed trait MVal
  case object MNil extends MVal
  final case class MBool(b: Boolean) extends MVal
  /** Unsigned interpretation; BigInt so full uint64 survives (§7.4). */
  final case class MUInt(v: BigInt) extends MVal
  final case class MStr(s: String) extends MVal
  final case class MBytes(b: Array[Byte]) extends MVal
  final case class MArr(items: Vector[MVal]) extends MVal
  final case class MMap(fields: TreeMap[String, MVal]) extends MVal

  object MMap {
    def of(kvs: (String, MVal)*): MMap = MMap(TreeMap(kvs: _*))
  }

  def encode(v: MVal): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    write(v, out)
    out.toByteArray
  }

  private def write(v: MVal, out: ByteArrayOutputStream): Unit = v match {
    case MNil => out.write(0xc0)
    case MBool(b) => out.write(if (b) 0xc3 else 0xc2)
    case MUInt(i) => writeUInt(i, out)
    case MStr(s) => writeStr(s, out)
    case MBytes(b) => writeBytes(b, out)
    case MArr(items) =>
      writeLen(items.length, out, fixTag = 0x90, tag16 = 0xdc, tag32 = 0xdd, fixMax = 15)
      items.foreach(write(_, out))
    case MMap(fields) =>
      writeLen(fields.size, out, fixTag = 0x80, tag16 = 0xde, tag32 = 0xdf, fixMax = 15)
      fields.foreach { case (k, fv) =>
        writeStr(k, out)
        write(fv, out)
      }
  }

  private def writeLen(n: Int, out: ByteArrayOutputStream, fixTag: Int, tag16: Int, tag32: Int, fixMax: Int): Unit = {
    if (n <= fixMax) out.write(fixTag | n)
    else if (n < (1 << 16)) { out.write(tag16); out.write(n >> 8); out.write(n & 0xff) }
    else { out.write(tag32); writeBE32(n, out) }
  }

  private def writeUInt(i: BigInt, out: ByteArrayOutputStream): Unit = {
    require(i >= 0, s"unsigned int expected, got $i")
    if (i < 0x80) out.write(i.toInt)
    else if (i < 0x100) { out.write(0xcc); out.write(i.toInt) }
    else if (i < 0x10000) { out.write(0xcd); out.write(i.toInt >> 8); out.write(i.toInt & 0xff) }
    else if (i < (BigInt(1) << 32)) { out.write(0xce); writeBE32(i.toLong.toInt, out) }
    else {
      require(i < (BigInt(1) << 64), s"uint64 overflow: $i")
      out.write(0xcf)
      val l = i.longValue // two's-complement reinterpretation carries uint64
      var shift = 56
      while (shift >= 0) { out.write(((l >>> shift) & 0xff).toInt); shift -= 8 }
    }
  }

  private def writeBE32(n: Int, out: ByteArrayOutputStream): Unit = {
    out.write((n >>> 24) & 0xff); out.write((n >>> 16) & 0xff)
    out.write((n >>> 8) & 0xff); out.write(n & 0xff)
  }

  private def writeStr(s: String, out: ByteArrayOutputStream): Unit = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    if (b.length <= 31) out.write(0xa0 | b.length)
    else if (b.length < 0x100) { out.write(0xd9); out.write(b.length) }
    else if (b.length < 0x10000) { out.write(0xda); out.write(b.length >> 8); out.write(b.length & 0xff) }
    else { out.write(0xdb); writeBE32(b.length, out) }
    out.write(b, 0, b.length)
  }

  private def writeBytes(b: Array[Byte], out: ByteArrayOutputStream): Unit = {
    if (b.length < 0x100) { out.write(0xc4); out.write(b.length) }
    else if (b.length < 0x10000) { out.write(0xc5); out.write(b.length >> 8); out.write(b.length & 0xff) }
    else { out.write(0xc6); writeBE32(b.length, out) }
    out.write(b, 0, b.length)
  }
}
