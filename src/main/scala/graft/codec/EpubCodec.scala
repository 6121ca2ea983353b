package graft.codec

import java.nio.charset.StandardCharsets
import scala.util.control.NonFatal

/** Bounded EPUB chapter extraction — books are a first-class training
  * corpus source and an EPUB is an OCF ZIP whose reading order lives
  * behind TWO indirections the office faces don't have:
  * `META-INF/container.xml` names the package document (the .opf),
  * whose `<manifest>` maps ids to hrefs and whose `<spine>` lists the
  * reading ORDER as idrefs — so chapter extraction is container →
  * rootfile → manifest join → spine walk, with hrefs resolved against
  * the package document's own directory (the OCF rule; chapters of a
  * nested `OEBPS/` package reference siblings bare).
  *
  * This codec stops at the CONTAINER boundary deliberately: it returns
  * the spine's XHTML chapter payloads in reading order plus the
  * Dublin Core sidecar, and the markup→text step happens in the QUERY
  * layer through the same [[graft.operators.TextOps.htmlExtract]]
  * column every HTML page goes through — one text-extraction doctrine
  * for the whole corpus, not a second dialect inside a codec.
  *
  * NEVER-THROW doctrine: [[ZipCodec.parse]] rejects structural
  * violations; the XML attribute scans are bounded regex finds with
  * caps; [[chapters]] catches NonFatal at the edge. Spine idrefs
  * without a manifest item, items whose href resolves outside the
  * archive, and non-XHTML media types all SKIP (partial recovery beats
  * rejecting a book over one rotten entry); an EPUB with no readable
  * spine at all is None. */
object EpubCodec {

  final case class EpubDoc(nChapters: Int, chapters: Vector[(String, String)],
                           title: Option[String], creator: Option[String])

  private val MaxInput = 64 << 20
  private val MaxXml = 32 << 20
  private val MaxChapters = 10000

  private val RootfileRe =
    """(?is)<rootfile[^>]*\sfull-path="([^"]*)"[^>]*>""".r
  private val ItemRe =
    """(?is)<item\s[^>]*>""".r
  private val ItemrefRe =
    """(?is)<itemref[^>]*\sidref="([^"]*)"[^>]*>""".r
  private def attr(tag: String, name: String): Option[String] = {
    val m = ("(?is)\\s" + name + "=\"([^\"]*)\"").r.findFirstMatchIn(tag)
    m.map(_.group(1))
  }

  /** Resolve `href` against the package document's directory: the OCF
    * convention — hrefs are relative to the .opf location. Dot-segment
    * free fixtures keep this a prefix join; `..` folds one level (the
    * common `../text/ch.xhtml` shape), deeper traversal rejects. */
  private def resolveHref(opfPath: String, href: String): Option[String] = {
    val dir = opfPath.lastIndexOf('/') match {
      case -1 => ""
      case i => opfPath.substring(0, i + 1)
    }
    if (!href.startsWith("../")) Some(dir + href)
    else {
      val up = dir.stripSuffix("/")
      val cut = up.lastIndexOf('/')
      val parent = if (cut < 0) "" else up.substring(0, cut + 1)
      val rest = href.stripPrefix("../")
      if (rest.startsWith("../")) None else Some(parent + rest)
    }
  }

  /** Extract the spine's chapters in reading order:
    * `(member name, xhtml)` pairs + the Dublin Core sidecar. */
  def chapters(b: Array[Byte]): Option[EpubDoc] =
    try chaptersInner(b)
    catch { case NonFatal(_) => None }

  private def chaptersInner(b: Array[Byte]): Option[EpubDoc] = {
    if (b == null || b.length < 22 || b.length > MaxInput) return None
    if (!(b(0) == 'P' && b(1) == 'K' && b(2) == 3 && b(3) == 4)) return None
    val members = ZipCodec.parse(b).getOrElse(return None)
    val byName = members.toMap
    def text(name: String): Option[String] =
      byName.get(name).filter(_.length <= MaxXml)
        .map(new String(_, StandardCharsets.UTF_8))
    val container = text("META-INF/container.xml").getOrElse(return None)
    val opfPath = RootfileRe.findFirstMatchIn(container)
      .map(_.group(1)).getOrElse(return None)
    val opf = text(opfPath).getOrElse(return None)
    // manifest: id → href (xhtml items only; images/css skip)
    val items: Map[String, String] = ItemRe.findAllIn(opf).map { tag =>
      (attr(tag, "id"), attr(tag, "href"), attr(tag, "media-type"))
    }.collect {
      case (Some(id), Some(href), mt)
        if mt.forall(t => t.contains("xhtml") || t.contains("html")) =>
        id -> href
    }.toMap
    val spine = ItemrefRe.findAllMatchIn(opf).map(_.group(1)).take(MaxChapters).toVector
    val chs = spine.flatMap { idref =>
      for {
        href <- items.get(idref)
        path <- resolveHref(opfPath, href)
        xhtml <- text(path)
      } yield (path, xhtml)
    }
    if (chs.isEmpty) return None
    // the shared sidecar parser (attribute-tolerant), trimmed — OPF
    // metadata is routinely pretty-printed
    def dc(tag: String): Option[String] =
      DocxCodec.firstTagValue(opf, tag).map(_.trim).filter(_.nonEmpty)
    Some(EpubDoc(chs.length, chs, dc("dc:title"), dc("dc:creator")))
  }
}
