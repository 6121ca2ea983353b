package graft.codec

import java.nio.charset.StandardCharsets

/** Deterministic legacy `.doc` builders for the [[DocCodec]] oracle
  * and fuzz suites — the [[PdfFixtures]] doctrine on the [MS-DOC]
  * wire: every byte is a pure function of the id, and the TEXT the
  * extractor must recover is seed arithmetic the DuckDB oracle
  * replays blind to the container (CFB sectors/FAT/mini stream), the
  * FIB indirection and the piece table, so the wrapping cancels
  * exactly iff the whole chain (CFB → FIB → Clx → pieces) is right.
  *
  * Variant v = (id / 3) % 3 (coprime with the mixed funnels' id%N
  * routers):
  *   0: one COMPRESSED (cp1252) piece, 0Table, SummaryInformation
  *      sidecar; every stream small → the MINI-stream read path →
  *      "Doc body <id> alpha"
  *   1: TWO pieces — cp1252 then UTF-16LE (with a euro sign only
  *      UTF-16 can carry) — `1Table` flag set, WordDocument padded
  *      past the 4096 cutoff → the regular FAT read path; NO
  *      sidecar → "Para one <id>\nTab\there € done"
  *   2: pieces stored in REVERSED file order (CP order must win) with
  *      a Prc to skip in front of the Pcdt, plus field markers
  *      (0x13/0x14/0x15) the layout rules must drop →
  *      "Split<id> joined"
  */
object DocFixtures {

  private def u16le(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def u32le(v: Long): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

  /** FIB skeleton: wIdent, nFib(Word97), the which-table flag, and
    * fcClx/lcbClx at the fixed 0x1A2/0x1A6 offsets; text bytes land
    * at the given offsets. */
  private def wordDocument(size: Int, oneTable: Boolean, fcClx: Int,
                           lcbClx: Int,
                           pieces: Seq[(Int, Array[Byte])]): Array[Byte] = {
    val wd = new Array[Byte](size)
    System.arraycopy(u16le(0xA5EC), 0, wd, 0, 2)
    System.arraycopy(u16le(0x00C1), 0, wd, 2, 2) // nFib: Word 97
    System.arraycopy(u16le(if (oneTable) 0x0200 else 0), 0, wd, 0x0A, 2)
    System.arraycopy(u32le(fcClx), 0, wd, 0x1A2, 4)
    System.arraycopy(u32le(lcbClx), 0, wd, 0x1A6, 4)
    pieces.foreach { case (off, data) =>
      System.arraycopy(data, 0, wd, off, data.length)
    }
    wd
  }

  /** Clx with an optional leading Prc and one Pcdt over `pieces`:
    * (cpLen, fcRaw) pairs in CP order. */
  private def clx(withPrc: Boolean, pieces: Seq[(Int, Long)]): Array[Byte] = {
    val out = new scala.collection.mutable.ArrayBuffer[Byte]
    if (withPrc) {
      out += 1
      out ++= u16le(4)
      out ++= Array[Byte](0x10, 0x22, 0x33, 0x44) // opaque grpprl noise
    }
    out += 2
    val n = pieces.size
    out ++= u32le(4L * (n + 1) + 8L * n)
    var cp = 0L
    out ++= u32le(cp)
    pieces.foreach { case (len, _) => cp += len; out ++= u32le(cp) }
    pieces.foreach { case (_, fcRaw) =>
      out ++= u16le(0) // PCD flags
      out ++= u32le(fcRaw)
      out ++= u16le(0) // prm
    }
    out.toArray
  }

  /** Minimal OLE property set with VT_LPSTR title (PIDSI 2) and
    * author (PIDSI 4). */
  private def summaryInformation(title: String, author: String): Array[Byte] = {
    def lpstr(s: String): Array[Byte] = {
      val raw = s.getBytes(StandardCharsets.ISO_8859_1)
      u32le(30) ++ u32le(raw.length + 1) ++ raw ++ Array[Byte](0) ++
        new Array[Byte]((4 - (raw.length + 1) % 4) % 4)
    }
    val v1 = lpstr(title)
    val v2 = lpstr(author)
    val nProps = 2
    val propsOff = 8 + nProps * 8
    val section = u32le(propsOff + v1.length + v2.length) ++ u32le(nProps) ++
      u32le(2) ++ u32le(propsOff) ++
      u32le(4) ++ u32le(propsOff + v1.length) ++
      v1 ++ v2
    val fmtid = Array(0xE0, 0x85, 0x9F, 0xF2, 0xF9, 0x4F, 0x68, 0x10,
      0xAB, 0x91, 0x08, 0x00, 0x2B, 0x27, 0xB3, 0xD9).map(_.toByte)
    u16le(0xFFFE) ++ u16le(0) ++ u32le(0x00020105) ++ new Array[Byte](16) ++
      u32le(1) ++ fmtid ++ u32le(48) ++ section
  }

  private def cp1252(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.Charset.forName("windows-1252"))
  private def utf16(s: String): Array[Byte] =
    s.getBytes(StandardCharsets.UTF_16LE)

  def docDoc(id: Long): Array[Byte] = ((id / 3) % 3) match {
    case 0 =>
      val text = cp1252(s"Doc body $id alpha\r")
      val fcText = 0x300
      val wd = wordDocument(0x400, oneTable = false, fcClx = 0,
        lcbClx = clxLen(withPrc = false, 1),
        pieces = Seq(fcText -> text))
      val tb = clx(withPrc = false,
        Seq(text.length -> (2L * fcText | 0x40000000L)))
      CfbCodec.write(Seq(
        "WordDocument" -> wd, "0Table" -> tb,
        "SummaryInformation" ->
          summaryInformation(s"Doc Props $id", s"Writer ${id % 7}")))
    case 1 =>
      val t1 = cp1252(s"Para one $id\r")
      val t2 = utf16("Tab\there € done")
      val wd = wordDocument(8192, oneTable = true, fcClx = 16,
        lcbClx = clxLen(withPrc = false, 2),
        pieces = Seq(0x400 -> t1, 0x1000 -> t2))
      val tb = new Array[Byte](16) ++ clx(withPrc = false, Seq(
        t1.length -> (2L * 0x400 | 0x40000000L),
        (t2.length / 2) -> 0x1000L))
      CfbCodec.write(Seq("WordDocument" -> wd, "1Table" -> tb))
    case _ =>
      // CP order: "Split<id> " then "joined\r" — file order REVERSED;
      // field markers 0x13/0x14/0x15 inside the first piece must drop
      val t1 = cp1252(s"Split$id" + "\u0013\u0014\u0015 ")
      val t2 = cp1252("joined\r")
      val wd = wordDocument(0x600, oneTable = false, fcClx = 0,
        lcbClx = clxLen(withPrc = true, 2),
        pieces = Seq(0x500 -> t1, 0x400 -> t2))
      val tb = clx(withPrc = true, Seq(
        t1.length -> (2L * 0x500 | 0x40000000L),
        t2.length -> (2L * 0x400 | 0x40000000L)))
      CfbCodec.write(Seq(
        "WordDocument" -> wd, "0Table" -> tb,
        "SummaryInformation" ->
          summaryInformation(s"Split Doc $id", "Runs Writer")))
  }

  /** One-compressed-piece document over arbitrary raw Word text —
    * the spec harness for the control-byte layout rules. */
  def rawPieceDoc(raw: String): Array[Byte] = {
    val text = cp1252(raw)
    val fcText = 0x300
    val wd = wordDocument(0x400 + text.length, oneTable = false, fcClx = 0,
      lcbClx = clxLen(withPrc = false, 1), pieces = Seq(fcText -> text))
    val tb = clx(withPrc = false,
      Seq(text.length -> (2L * fcText | 0x40000000L)))
    CfbCodec.write(Seq("WordDocument" -> wd, "0Table" -> tb))
  }

  private def clxLen(withPrc: Boolean, n: Int): Int =
    (if (withPrc) 7 else 0) + 5 + 4 * (n + 1) + 8 * n

  /** The text [[docDoc]] must extract (paragraphs joined with '\n') —
    * the seed arithmetic the oracle rebuilds in SQL. */
  def docText(id: Long): String = ((id / 3) % 3) match {
    case 0 => s"Doc body $id alpha"
    case 1 => s"Para one $id\nTab\there € done"
    case _ => s"Split$id joined"
  }

  /** Torn download: a valid container cut mid-FAT — must classify
    * corrupt, never ok-empty. */
  def corruptDoc(id: Long): Array[Byte] =
    java.util.Arrays.copyOfRange(docDoc(id * 3), 0, 700)
}
