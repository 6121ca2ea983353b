package graft.codec

import java.nio.charset.StandardCharsets
import scala.util.control.NonFatal

/** Bounded XLSX (SpreadsheetML) TEXT extraction — the fourth office
  * face on the shared OPC substrates ([[ZipCodec]] container,
  * [[DocxCodec.unescapeXml]] entity decode, Dublin Core sidecar):
  * workbook text lives behind ONE indirection the other faces don't
  * have — string cells carry an INDEX into the `xl/sharedStrings.xml`
  * table (`<c t="s"><v>3</v></c>`), the format's dedup of repeated
  * strings — so extraction is (1) parse the shared-strings table,
  * (2) walk each `xl/worksheets/sheet<N>.xml` in NUMERIC order and
  * resolve cells through it.
  *
  * Pinned layout rules (the family doctrine: extraction has no single
  * canonical answer, so ours is defined exactly):
  *   - within a `<row>`, cell values join with '\t' in document order;
  *   - rows join with '\n'; sheets join with '\n';
  *   - cell kinds: `t="s"` resolves the shared index (out-of-range ⇒
  *     empty, never a throw); `t="str"` (formula result) and untyped
  *     cells take their `<v>` body verbatim (numbers stay their raw
  *     digit string — a text pipeline keeps them); `t="inlineStr"`
  *     concatenates the `<is>` block's `<t>` leaves;
  *   - a shared-strings `<si>` concatenates ALL its `<t>` leaves
  *     (plain `<si><t>…</t></si>` and rich-run `<si><r><t>…` forms
  *     read identically);
  *   - empty cells (no `<v>`, no `<is>`) contribute an empty string —
  *     column alignment is layout, like DOCX's empty paragraphs.
  *
  * NEVER-THROW doctrine: ZipCodec rejects structural violations; the
  * XML walks are bounded linear scans with hard caps; [[extract]]
  * catches NonFatal at the edge. */
object XlsxCodec {

  final case class XlsxDoc(nSheets: Int, nRows: Int, nCells: Int,
                           sheets: Vector[Vector[Vector[String]]],
                           title: Option[String], creator: Option[String]) {
    def text: String =
      sheets.map(_.map(_.mkString("\t")).mkString("\n")).mkString("\n")
  }

  private val MaxInput = 64 << 20
  private val MaxXml = 32 << 20
  private val MaxStrings = 1000000
  private val MaxCells = 4000000

  private val SheetName = "^xl/worksheets/sheet([0-9]{1,9})\\.xml$".r
  private val CellTypeRe = """(?s)\st="([^"]*)"""".r

  /** All `<t>` leaf values inside `xml[from, to)`, concatenated and
    * unescaped — the body shared by `<si>` and `<is>` blocks. */
  private def tLeaves(xml: String, from: Int, to: Int): String = {
    val sb = new StringBuilder
    var i = from
    while (i < to) {
      val lt = xml.indexOf("<t", i)
      if (lt < 0 || lt >= to) i = to
      else {
        val d = if (lt + 2 < xml.length) xml.charAt(lt + 2) else ' '
        if (d != '>' && d != '/' && !Character.isWhitespace(d)) i = lt + 2
        else {
          val gt = xml.indexOf('>', lt)
          if (gt < 0 || gt >= to) i = to
          else if (xml.charAt(gt - 1) == '/') i = gt + 1 // empty <t/>
          else {
            val end = xml.indexOf("</t>", gt + 1)
            if (end < 0 || end > to) i = to
            else {
              sb.append(DocxCodec.unescapeXml(xml.substring(gt + 1, end)))
              i = end + 4
            }
          }
        }
      }
    }
    sb.toString
  }

  /** The shared-strings table in index order: one entry per `<si>` —
    * including SELF-CLOSING `<si/>` (an empty string entry some
    * writers emit): missing it would silently shift every subsequent
    * index onto the wrong text, the worst failure a lookup table
    * has. Tag-name delimiting accepts any whitespace, not just the
    * plain space. */
  private[codec] def sharedStrings(xml: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var n = 0
    var i = 0
    while (i < xml.length && n < MaxStrings) {
      val at = xml.indexOf("<si", i)
      if (at < 0) i = xml.length
      else {
        val d = if (at + 3 < xml.length) xml.charAt(at + 3) else ' '
        if (d != '>' && d != '/' && !Character.isWhitespace(d)) i = at + 3
        else {
          val gt = xml.indexOf('>', at)
          if (gt < 0) i = xml.length
          else if (xml.charAt(gt - 1) == '/') { // <si/> — an EMPTY entry
            out += ""
            n += 1
            i = gt + 1
          } else {
            val end = xml.indexOf("</si>", gt)
            if (end < 0) i = xml.length
            else {
              out += tLeaves(xml, gt + 1, end)
              n += 1
              i = end + 5
            }
          }
        }
      }
    }
    out.result()
  }

  /** One worksheet → rows of cell strings under the pinned rules. */
  private[codec] def sheetRows(xml: String, shared: Vector[String]): Vector[Vector[String]] = {
    val rows = Vector.newBuilder[Vector[String]]
    var cells = 0
    var i = 0
    while (i < xml.length && cells < MaxCells) {
      val rAt = xml.indexOf("<row", i)
      if (rAt < 0) i = xml.length
      else {
        val d = if (rAt + 4 < xml.length) xml.charAt(rAt + 4) else ' '
        if (d != '>' && d != '/' && !Character.isWhitespace(d)) i = rAt + 4
        else {
          val gt = xml.indexOf('>', rAt)
          if (gt < 0) i = xml.length
          else if (xml.charAt(gt - 1) == '/') { rows += Vector.empty; i = gt + 1 }
          else {
            val rEnd0 = xml.indexOf("</row>", gt)
            val rEnd = if (rEnd0 < 0) xml.length else rEnd0
            val cellsB = Vector.newBuilder[String]
            var j = gt + 1
            while (j < rEnd && cells < MaxCells) {
              val cAt = xml.indexOf("<c", j)
              if (cAt < 0 || cAt >= rEnd) j = rEnd
              else {
                val cd = if (cAt + 2 < xml.length) xml.charAt(cAt + 2) else ' '
                if (cd != '>' && cd != '/' && !Character.isWhitespace(cd)) j = cAt + 2
                else {
                  val cgt = xml.indexOf('>', cAt)
                  if (cgt < 0 || cgt >= rEnd) j = rEnd
                  else {
                    val attrs = xml.substring(cAt, cgt)
                    // \s-delimited, not space-delimited: writers emit
                    // tab/newline-separated attributes
                    val kind = CellTypeRe.findFirstMatchIn(attrs)
                      .map(_.group(1)).getOrElse("")
                    if (xml.charAt(cgt - 1) == '/') { // empty <c/>
                      cellsB += ""
                      cells += 1
                      j = cgt + 1
                    } else {
                      val cEnd0 = xml.indexOf("</c>", cgt)
                      val cEnd = if (cEnd0 < 0 || cEnd0 > rEnd) rEnd else cEnd0
                      val value = kind match {
                        case "inlineStr" => tLeaves(xml, cgt + 1, cEnd)
                        case _ =>
                          val v = xml.indexOf("<v>", cgt)
                          if (v < 0 || v >= cEnd) ""
                          else {
                            val ve = xml.indexOf("</v>", v)
                            if (ve < 0 || ve > cEnd) ""
                            else {
                              val raw = DocxCodec.unescapeXml(xml.substring(v + 3, ve))
                              if (kind == "s") {
                                val idx = try raw.trim.toInt
                                catch { case _: NumberFormatException => -1 }
                                if (idx >= 0 && idx < shared.length) shared(idx)
                                else "" // out-of-range index: empty, never a throw
                              } else raw
                            }
                          }
                      }
                      cellsB += value
                      cells += 1
                      j = if (cEnd0 < 0) rEnd else cEnd + 4
                    }
                  }
                }
              }
            }
            rows += cellsB.result()
            i = if (rEnd0 < 0) xml.length else rEnd + 6
          }
        }
      }
    }
    rows.result()
  }

  /** Extract workbook text + sidecar from XLSX bytes. None when the
    * bytes are not a readable OPC zip or carry no worksheets. Never
    * throws. */
  def extract(b: Array[Byte]): Option[XlsxDoc] =
    try extractInner(b)
    catch { case NonFatal(_) => None }

  private def extractInner(b: Array[Byte]): Option[XlsxDoc] = {
    if (b == null || b.length < 22 || b.length > MaxInput) return None
    if (!(b(0) == 'P' && b(1) == 'K' && b(2) == 3 && b(3) == 4)) return None
    val members = ZipCodec.parse(b).getOrElse(return None)
    val shared = members.collectFirst {
      case (name, payload) if name == "xl/sharedStrings.xml" && payload.length <= MaxXml =>
        sharedStrings(new String(payload, StandardCharsets.UTF_8))
    }.getOrElse(Vector.empty)
    val sheets = members.flatMap {
      case (SheetName(n), payload) if payload.length <= MaxXml =>
        Some((n.toInt, new String(payload, StandardCharsets.UTF_8)))
      case _ => None
    }.sortBy(_._1)
    if (sheets.isEmpty) return None
    val parsed = sheets.map { case (_, xml) => sheetRows(xml, shared) }.toVector
    val core = members.collectFirst {
      case (name, payload) if name == "docProps/core.xml" && payload.length <= MaxXml =>
        new String(payload, StandardCharsets.UTF_8)
    }
    // the shared sidecar parser: the same core.xml must yield the same
    // metadata through every OPC face
    def first(tag: String) =
      core.flatMap(DocxCodec.firstTagValue(_, tag)).filter(_.nonEmpty)
    Some(XlsxDoc(parsed.length, parsed.map(_.length).sum,
      parsed.map(_.map(_.length).sum).sum, parsed,
      first("dc:title"), first("dc:creator")))
  }
}
