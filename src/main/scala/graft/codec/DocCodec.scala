package graft.codec

import scala.util.control.NonFatal

/** Bounded legacy `.doc` (Word 97–2003 binary) TEXT extraction — the
  * third word-processor face beside [[DocxCodec]] and [[RtfCodec]],
  * built on the [[CfbCodec]] container and the public [MS-DOC]
  * layout. Binary Word text is NOT a linear stream: the `WordDocument`
  * stream holds a File Information Block whose `fcClx`/`lcbClx`
  * (offsets 0x1A2/0x1A6) point into the TABLE stream (`1Table` when
  * FIB flag 0x0200 is set, else `0Table`), where the Clx's piece
  * table (PlcPcd) maps character positions to file offsets — pieces
  * can sit anywhere in the stream in any order, each independently
  * 8-bit (cp1252, `fc` bit 30 set, offset = fc/2) or UTF-16LE:
  *
  *   - pieces concatenate in CP order (never file order);
  *   - '\r' closes a paragraph (paragraphs join with '\n'), 0x0B
  *     (vertical tab) and 0x07 (cell mark) contribute '\n', '\t'
  *     passes through, all other control bytes below 0x20 and the
  *     field/object markers (0x13/0x14/0x15/0x01/0x08) are dropped —
  *     the pinned layout rules;
  *   - the `\x05SummaryInformation` property-set stream yields the
  *     title (PIDSI 2) / author (PIDSI 4) sidecar when present
  *     (VT_LPSTR values, cp1252, NUL-terminated).
  *
  * NEVER-THROW doctrine: every offset is bounds-checked, piece count
  * and output size are capped, and [[extract]] catches NonFatal at
  * the API edge. A torn container, missing stream, bad FIB magic or
  * out-of-range piece yields None — a funnel class, never a crash. */
object DocCodec {

  final case class DocFile(nParas: Int, paras: Vector[String],
                           title: Option[String], author: Option[String]) {
    def text: String = paras.mkString("\n")
  }

  private val MaxChars = 4 << 20
  private val MaxPieces = 100000
  private val MaxParas = 100000

  private val Cp1252 = java.nio.charset.Charset.forName("windows-1252")

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xFFL)) | ((b(o + 1) & 0xFFL) << 8) |
      ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)

  def extract(b: Array[Byte]): Option[DocFile] = {
    try extractInner(b)
    catch { case NonFatal(_) => None }
  }

  private def extractInner(b: Array[Byte]): Option[DocFile] = {
    val cfbOpt = CfbCodec.parse(b)
    if (cfbOpt.isEmpty) return None
    val streams = cfbOpt.get.streams
    val wdOpt = streams.get("WordDocument")
    if (wdOpt.isEmpty) return None
    val wd = wdOpt.get
    if (wd.length < 0x1AA) return None
    if (u16(wd, 0) != 0xA5EC) return None // wIdent
    val flags = u16(wd, 0x0A)
    val tblName = if ((flags & 0x0200) != 0) "1Table" else "0Table"
    val tblOpt = streams.get(tblName)
    if (tblOpt.isEmpty) return None
    val tbl = tblOpt.get
    val fcClx = u32(wd, 0x1A2)
    val lcbClx = u32(wd, 0x1A6)
    if (fcClx < 0 || lcbClx <= 0 || fcClx + lcbClx > tbl.length) return None
    val clxEnd = (fcClx + lcbClx).toInt

    // ── Clx: skip Prcs (clxt=1), land on the Pcdt (clxt=2)
    var ci = fcClx.toInt
    var plcOff = -1
    var plcLen = 0
    while (ci < clxEnd && plcOff < 0) {
      (tbl(ci) & 0xFF) match {
        case 1 =>
          if (ci + 3 > clxEnd) return None
          val cb = u16(tbl, ci + 1)
          ci += 3 + cb
        case 2 =>
          if (ci + 5 > clxEnd) return None
          val lcb = u32(tbl, ci + 1)
          if (ci + 5 + lcb > clxEnd) return None
          plcOff = ci + 5
          plcLen = lcb.toInt
        case _ => return None
      }
    }
    if (plcOff < 0 || plcLen < 4 + 12 || (plcLen - 4) % 12 != 0) return None
    val nPieces = (plcLen - 4) / 12
    if (nPieces > MaxPieces) return None

    // ── assemble text in CP order
    val sb = new StringBuilder
    var p = 0
    while (p < nPieces) {
      val cpLo = u32(tbl, plcOff + p * 4)
      val cpHi = u32(tbl, plcOff + (p + 1) * 4)
      if (cpHi < cpLo) return None
      val cpLen = (cpHi - cpLo).toInt
      val pcdOff = plcOff + (nPieces + 1) * 4 + p * 8
      val fcRaw = u32(tbl, pcdOff + 2)
      val fCompressed = (fcRaw & 0x40000000L) != 0
      val fc = fcRaw & 0x3FFFFFFFL
      if (sb.length + cpLen > MaxChars) return None
      if (fCompressed) {
        val off = (fc / 2).toInt
        if (off < 0 || off + cpLen > wd.length) return None
        sb.append(new String(wd, off, cpLen, Cp1252))
      } else {
        val off = fc.toInt
        if (off < 0 || off + 2L * cpLen > wd.length) return None
        var k = 0
        while (k < cpLen) {
          sb.append(u16(wd, off + k * 2).toChar)
          k += 1
        }
      }
      p += 1
    }

    // ── pinned layout rules over the raw Word text
    val paras = Vector.newBuilder[String]
    var nParas = 0
    val cur = new StringBuilder
    var si = 0
    while (si < sb.length) {
      val c = sb.charAt(si)
      if (c == '\r') {
        nParas += 1
        if (nParas > MaxParas) return None
        paras += cur.toString
        cur.setLength(0)
      } else if (c == 0x0B || c == 0x07) cur.append('\n')
      else if (c == '\t' || c >= 0x20) cur.append(c)
      // 0x13/0x14/0x15/0x01/0x08 and other control bytes: dropped
      si += 1
    }
    if (cur.nonEmpty) { nParas += 1; paras += cur.toString }

    // ── SummaryInformation sidecar (title PIDSI=2, author PIDSI=4)
    var title: Option[String] = None
    var author: Option[String] = None
    streams.get("SummaryInformation").foreach { si2 =>
      if (si2.length >= 48 && u16(si2, 0) == 0xFFFE) {
        val secOff = u32(si2, 44).toInt
        if (secOff >= 0 && secOff + 8 <= si2.length) {
          val nProps = u32(si2, secOff + 4).toInt
          if (nProps >= 0 && nProps <= 64 &&
            secOff + 8 + nProps * 8 <= si2.length) {
            var pi = 0
            while (pi < nProps) {
              val pid = u32(si2, secOff + 8 + pi * 8)
              val pOff = u32(si2, secOff + 12 + pi * 8).toInt
              if ((pid == 2 || pid == 4) && secOff + pOff + 8 <= si2.length) {
                val vt = u32(si2, secOff + pOff)
                if (vt == 30) { // VT_LPSTR: u32 len (incl. NUL) + bytes
                  val len = u32(si2, secOff + pOff + 4).toInt
                  if (len > 0 && secOff + pOff + 8 + len <= si2.length) {
                    var sl = len
                    while (sl > 0 && si2(secOff + pOff + 8 + sl - 1) == 0) sl -= 1
                    val v = new String(si2, secOff + pOff + 8, sl, Cp1252)
                    if (pid == 2) title = Some(v) else author = Some(v)
                  }
                }
              }
              pi += 1
            }
          }
        }
      }
    }
    Some(DocFile(nParas, paras.result(), title, author))
  }
}
