package graft.codec

import java.nio.charset.StandardCharsets
import scala.util.control.NonFatal

/** Bounded ODT (OpenDocument Text) extraction — the fourth
  * word-processor face ([[DocxCodec]], [[RtfCodec]], [[DocCodec]] are
  * the others), and the second OPC-style one: an `.odt` is a ZIP
  * whose `content.xml` holds the text. Unlike WordprocessingML's
  * leaf-only `<w:t>` runs, ODF paragraphs are MIXED content — raw
  * text interleaved with structural tags — so the walk here is
  * paragraph-scoped tag folding under pinned layout rules:
  *
  *   - paragraphs (`<text:p>` … `</text:p>`) and headings
  *     (`<text:h>`) join with '\n', in document order;
  *   - within a paragraph: `<text:tab/>` → '\t',
  *     `<text:line-break/>` → '\n', `<text:s/>` → one space and
  *     `<text:s text:c="N"/>` → N spaces (ODF run-length encodes
  *     spaces), every other tag (spans, bookmarks, fields) is
  *     STRIPPED — its text content stays (spans are formatting);
  *   - the five XML entities and numeric character references decode
  *     ([[DocxCodec.unescapeXml]] — the shared leaf doctrine);
  *   - metadata reads `meta.xml`'s `<dc:title>` / `<dc:creator>`.
  *
  * NEVER-THROW doctrine: [[ZipCodec.parse]] rejects structural
  * violations with None; the paragraph scan is bounded; [[extract]]
  * catches NonFatal at the API edge. */
object OdtCodec {

  final case class OdtDoc(nParas: Int, paras: Vector[String],
                          title: Option[String], creator: Option[String]) {
    def text: String = paras.mkString("\n")
  }

  private val MaxXml = 32 << 20
  private val MaxParas = 100000
  private val MaxChars = 4 << 20

  private val ParaRe =
    "(?s)<text:(p|h)[\\s>].*?</text:\\1>|<text:(p|h)/>".r

  /** Fold one paragraph's mixed content to text under the pinned
    * rules. `inner` is the body between the paragraph tags. */
  private[codec] def foldParagraph(inner: String): String = {
    val sb = new StringBuilder(inner.length)
    var i = 0
    val n = inner.length
    while (i < n) {
      val c = inner.charAt(i)
      if (c == '<') {
        val close = inner.indexOf('>', i + 1)
        if (close < 0) return sb.toString // torn tag: keep what we have
        val tag = inner.substring(i + 1, close)
        if (tag.startsWith("text:tab")) sb.append('\t')
        else if (tag.startsWith("text:line-break")) sb.append('\n')
        else if (tag.startsWith("text:s/") || tag.startsWith("text:s ") ||
          tag == "text:s") {
          val m = "text:c=\"([0-9]+)\"".r.findFirstMatchIn(tag)
          val k = m.map(_.group(1).toInt).getOrElse(1)
          var j = 0
          while (j < math.min(k, 1000)) { sb.append(' '); j += 1 }
        }
        // every other tag (span open/close, fields, bookmarks): strip
        i = close + 1
      } else {
        sb.append(c)
        i += 1
      }
    }
    sb.toString
  }

  def extract(b: Array[Byte]): Option[OdtDoc] = {
    try extractInner(b)
    catch { case NonFatal(_) => None }
  }

  private def extractInner(b: Array[Byte]): Option[OdtDoc] = {
    val membersOpt = ZipCodec.parse(b)
    if (membersOpt.isEmpty) return None
    val members = membersOpt.get.toMap
    val contentOpt = members.get("content.xml")
    if (contentOpt.isEmpty) return None
    if (contentOpt.get.length > MaxXml) return None
    val xml = new String(contentOpt.get, StandardCharsets.UTF_8)
    val paras = Vector.newBuilder[String]
    var nParas = 0
    var emitted = 0
    val it = ParaRe.findAllMatchIn(xml)
    while (it.hasNext) {
      val m = it.next()
      nParas += 1
      if (nParas > MaxParas) return None
      val whole = m.matched
      val inner =
        if (whole.endsWith("/>")) ""
        else {
          val open = whole.indexOf('>')
          val closeTag = whole.lastIndexOf("</")
          if (open < 0 || closeTag <= open) ""
          else whole.substring(open + 1, closeTag)
        }
      val text = DocxCodec.unescapeXml(foldParagraph(inner))
      emitted += text.length
      if (emitted > MaxChars) return None
      paras += text
    }
    val meta = members.get("meta.xml")
      .map(m => new String(m, StandardCharsets.UTF_8))
    Some(OdtDoc(nParas, paras.result(),
      meta.flatMap(DocxCodec.firstTagValue(_, "dc:title")),
      meta.flatMap(DocxCodec.firstTagValue(_, "dc:creator"))))
  }
}
