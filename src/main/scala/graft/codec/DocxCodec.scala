package graft.codec

import java.nio.charset.StandardCharsets
import scala.util.control.NonFatal

/** Bounded DOCX (OOXML WordprocessingML) TEXT extraction — the second
  * office-document front gate beside [[PdfCodec]]: a `.docx` is an OPC
  * ZIP whose `word/document.xml` member holds the text, so the codec is
  * a composition of substrates the repo already owns — [[ZipCodec]]
  * reads the container (STORED and foreign-DEFLATE members both), and a
  * linear WordprocessingML walk recovers the text under pinned
  * deterministic layout rules (the PdfCodec doctrine: extraction has no
  * single canonical answer, so ours is defined exactly):
  *
  *   - paragraphs (`<w:p>` … `</w:p>`) join with '\n';
  *   - within a paragraph, `<w:t>` leaf values concatenate with NO
  *     separator (runs split words arbitrarily — `<w:t>Spl</w:t>
  *     <w:t>it</w:t>` is one word), attributes tolerated
  *     (`xml:space="preserve"` is the common one);
  *   - `<w:tab/>` contributes '\t', `<w:br/>` contributes '\n'
  *     (self-closing with or without attributes/whitespace);
  *   - the five XML entities (`&amp; &lt; &gt; &quot; &apos;`) and
  *     decimal/hex character references decode in `<w:t>` bodies;
  *   - empty paragraphs are kept as empty lines (they are layout), but
  *     a document with no `<w:p>` at all yields empty text.
  *
  * Sidecar metadata reads from `docProps/core.xml` (Dublin Core
  * `<dc:title>` / `<dc:creator>`) — the provenance fields a corpus
  * pipeline keys on, mirroring PDF's /Info.
  *
  * NEVER-THROW doctrine: [[ZipCodec.parse]] already rejects structural
  * violations (bad signatures, CRC mismatch, truncation) with None;
  * the XML walk is a single bounded forward scan with hard caps, and
  * [[extract]] catches NonFatal as the last line of defense. */
object DocxCodec {

  final case class DocxDoc(nParas: Int, paras: Vector[String],
                           title: Option[String], creator: Option[String]) {
    def text: String = paras.mkString("\n")
  }

  private val MaxInput = 64 << 20
  private val MaxXml = 32 << 20
  private val MaxParas = 100000
  private val MaxChars = 4 << 20

  /** Decode the five XML entities and numeric character references in a
    * leaf body; an unterminated or unknown reference passes through
    * verbatim (tolerant-reader posture). */
  private[codec] def unescapeXml(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '&') { sb.append(c); i += 1 }
      else {
        val semi = s.indexOf(';', i + 1)
        if (semi < 0 || semi - i > 11) { sb.append(c); i += 1 }
        else {
          val ent = s.substring(i + 1, semi)
          val rep: Option[String] = ent match {
            case "amp" => Some("&")
            case "lt" => Some("<")
            case "gt" => Some(">")
            case "quot" => Some("\"")
            case "apos" => Some("'")
            case _ if ent.startsWith("#x") || ent.startsWith("#X") =>
              try {
                val cp = Integer.parseInt(ent.substring(2), 16)
                if (Character.isValidCodePoint(cp)) Some(new String(Character.toChars(cp))) else None
              } catch { case _: NumberFormatException => None }
            case _ if ent.startsWith("#") =>
              try {
                val cp = Integer.parseInt(ent.substring(1))
                if (Character.isValidCodePoint(cp)) Some(new String(Character.toChars(cp))) else None
              } catch { case _: NumberFormatException => None }
            case _ => None
          }
          rep match {
            case Some(r) => sb.append(r); i = semi + 1
            case None => sb.append(c); i += 1
          }
        }
      }
    }
    sb.toString
  }

  /** First `<tag>`/`<tag attr…>` leaf value in `xml`, unescaped —
    * enough for the Dublin Core sidecar fields (they never repeat).
    * Shared by the DOCX/PPTX/XLSX/EPUB sidecar reads so the SAME
    * core.xml yields the same metadata through every face. */
  private[codec] def firstTagValue(xml: String, tag: String): Option[String] = {
    var from = 0
    while (from < xml.length) {
      val at = xml.indexOf("<" + tag, from)
      if (at < 0) return None
      val afterName = at + 1 + tag.length
      if (afterName < xml.length &&
        (xml.charAt(afterName) == '>' || xml.charAt(afterName) == '/' ||
          Character.isWhitespace(xml.charAt(afterName)))) {
        val close = xml.indexOf('>', afterName)
        if (close < 0) return None
        if (xml.charAt(close - 1) == '/') return Some("") // self-closing
        val end = xml.indexOf("</" + tag + ">", close + 1)
        if (end < 0) return None
        return Some(unescapeXml(xml.substring(close + 1, end)))
      }
      from = afterName
    }
    None
  }

  /** Walk one WordprocessingML (`ns = "w"`) or DrawingML (`ns = "a"`,
    * the PPTX text body) fragment: paragraphs of concatenated
    * `<ns:t>` leaves with tab/br substitutions, under the layout rules
    * in the object doc. The two vocabularies share the exact element
    * shapes — `<ns:p>` paragraphs, `<ns:t>` leaves, self-closing
    * `<ns:tab/>`/`<ns:br/>` — differing only in prefix. Linear single
    * pass, `MaxChars` cap. */
  private[codec] def bodyParagraphs(xml: String, ns: String = "w"): Vector[String] = {
    val pOpen = "<" + ns + ":p"; val pClose = "</" + ns + ":p>"
    val tOpen = "<" + ns + ":t"; val tClose = "</" + ns + ":t>"
    val tabOpen = "<" + ns + ":tab"; val brOpen = "<" + ns + ":br"
    val paras = Vector.newBuilder[String]
    var nParas = 0
    var total = 0
    var i = 0
    val n = xml.length
    while (i < n && nParas < MaxParas) {
      val pAt = xml.indexOf(pOpen, i)
      if (pAt < 0) i = n
      else {
        val afterP = pAt + pOpen.length
        // must be <ns:p> or <ns:p attr…> — not <w:pPr>, <w:proofErr>…
        // (any whitespace delimits: pretty-printers emit newline- and
        // tab-separated attributes, and skipping the paragraph would
        // be silent content loss under an 'ok' verdict)
        val d = if (afterP < n) xml.charAt(afterP) else ' '
        if (d != '>' && d != '/' && !Character.isWhitespace(d)) i = afterP
        else if (d == '/' || (Character.isWhitespace(d) && {
          val gt = xml.indexOf('>', afterP); gt > 0 && xml.charAt(gt - 1) == '/'
        })) {
          // self-closing paragraph: an empty line
          paras += ""
          nParas += 1
          i = math.max(afterP, xml.indexOf('>', afterP) + 1)
        } else {
          val pEnd0 = xml.indexOf(pClose, afterP)
          val pEnd = if (pEnd0 < 0) n else pEnd0
          val sb = new StringBuilder
          var j = xml.indexOf('>', afterP) + 1
          if (j <= 0) j = afterP
          while (j < pEnd && total < MaxChars) {
            val lt = xml.indexOf('<', j)
            if (lt < 0 || lt >= pEnd) j = pEnd
            else if (xml.startsWith(tOpen, lt) && lt + tOpen.length < n &&
              (xml.charAt(lt + tOpen.length) == '>' ||
                Character.isWhitespace(xml.charAt(lt + tOpen.length)) ||
                xml.charAt(lt + tOpen.length) == '/')) {
              val gt = xml.indexOf('>', lt)
              if (gt < 0 || gt >= pEnd) j = pEnd
              else if (xml.charAt(gt - 1) == '/') j = gt + 1 // empty <ns:t/>
              else {
                val end = xml.indexOf(tClose, gt + 1)
                if (end < 0 || end > pEnd) j = pEnd
                else {
                  val body = unescapeXml(xml.substring(gt + 1, end))
                  val room = MaxChars - total
                  val cut = if (body.length > room) body.substring(0, room) else body
                  sb.append(cut); total += cut.length
                  j = end + tClose.length
                }
              }
            } else if (xml.startsWith(tabOpen, lt) && lt + tabOpen.length < n &&
              (xml.charAt(lt + tabOpen.length) == '/' ||
                Character.isWhitespace(xml.charAt(lt + tabOpen.length)))) {
              sb.append('\t'); total += 1
              val gt = xml.indexOf('>', lt); j = if (gt < 0) pEnd else gt + 1
            } else if (xml.startsWith(brOpen, lt) && lt + brOpen.length < n &&
              (xml.charAt(lt + brOpen.length) == '/' ||
                Character.isWhitespace(xml.charAt(lt + brOpen.length)))) {
              sb.append('\n'); total += 1
              val gt = xml.indexOf('>', lt); j = if (gt < 0) pEnd else gt + 1
            } else {
              val gt = xml.indexOf('>', lt)
              j = if (gt < 0) pEnd else gt + 1
            }
          }
          paras += sb.toString
          nParas += 1
          i = if (pEnd0 < 0) n else pEnd + pClose.length
        }
      }
    }
    paras.result()
  }

  /** Extract text + sidecar metadata from DOCX bytes. None when the
    * bytes are not a readable OPC zip or carry no
    * `word/document.xml`. Never throws. */
  def extract(b: Array[Byte]): Option[DocxDoc] =
    try extractInner(b)
    catch { case NonFatal(_) => None }

  /** A PPTX deck's recovered text: slides in numeric order, each a
    * vector of paragraphs. `text` joins paragraphs with '\n' within a
    * slide and slides with '\n' — one pinned flat form, like the PDF
    * page joiner. */
  final case class PptxDoc(nSlides: Int, slides: Vector[Vector[String]],
                           title: Option[String], creator: Option[String]) {
    def nParas: Int = slides.map(_.length).sum
    def text: String = slides.map(_.mkString("\n")).mkString("\n")
  }

  // {1,9}: a member number that cannot fit an Int SKIPS that member
  // (partial recovery) instead of throwing through toInt and rejecting
  // the whole otherwise-readable document
  private val SlideName = "^ppt/slides/slide([0-9]{1,9})\\.xml$".r

  /** PPTX (PresentationML) text extraction — the third office face on
    * the same substrates: slides are `ppt/slides/slide<N>.xml` members
    * whose text lives in DrawingML `<a:p>`/`<a:t>` (the SAME element
    * shapes as WordprocessingML under the `a:` prefix, so the walk is
    * [[bodyParagraphs]] with `ns = "a"`). Slides order NUMERICALLY by
    * N — member order and lexicographic name order both lie (slide10
    * sorts before slide2 lexicographically; real writers emit members
    * in arbitrary order). Dublin Core sidecar as in [[extract]]. None
    * when the bytes are not a readable OPC zip or carry no slides.
    * Never throws. */
  def extractPptx(b: Array[Byte]): Option[PptxDoc] =
    try extractPptxInner(b)
    catch { case NonFatal(_) => None }

  private def extractPptxInner(b: Array[Byte]): Option[PptxDoc] = {
    if (b == null || b.length < 22 || b.length > MaxInput) return None
    if (!(b(0) == 'P' && b(1) == 'K' && b(2) == 3 && b(3) == 4)) return None
    val members = ZipCodec.parse(b).getOrElse(return None)
    val slides = members.flatMap {
      case (SlideName(n), payload) if payload.length <= MaxXml =>
        Some((n.toInt, new String(payload, StandardCharsets.UTF_8)))
      case _ => None
    }.sortBy(_._1)
    if (slides.isEmpty) return None
    val core = members.collectFirst {
      case (name, payload) if name == "docProps/core.xml" && payload.length <= MaxXml =>
        new String(payload, StandardCharsets.UTF_8)
    }
    Some(PptxDoc(slides.length,
      slides.map { case (_, xml) => bodyParagraphs(xml, ns = "a") }.toVector,
      core.flatMap(firstTagValue(_, "dc:title")).filter(_.nonEmpty),
      core.flatMap(firstTagValue(_, "dc:creator")).filter(_.nonEmpty)))
  }

  private def extractInner(b: Array[Byte]): Option[DocxDoc] = {
    if (b == null || b.length < 22 || b.length > MaxInput) return None
    if (!(b(0) == 'P' && b(1) == 'K' && b(2) == 3 && b(3) == 4)) return None
    val members = ZipCodec.parse(b).getOrElse(return None)
    val doc = members.collectFirst {
      case (name, payload) if name == "word/document.xml" => payload
    }.getOrElse(return None)
    if (doc.length > MaxXml) return None
    val xml = new String(doc, StandardCharsets.UTF_8)
    val paras = bodyParagraphs(xml)
    val core = members.collectFirst {
      case (name, payload) if name == "docProps/core.xml" && payload.length <= MaxXml =>
        new String(payload, StandardCharsets.UTF_8)
    }
    Some(DocxDoc(paras.length, paras,
      core.flatMap(firstTagValue(_, "dc:title")).filter(_.nonEmpty),
      core.flatMap(firstTagValue(_, "dc:creator")).filter(_.nonEmpty)))
  }
}
