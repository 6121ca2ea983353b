package graft.codec

import java.nio.charset.StandardCharsets

/** Deterministic DOCX builders for the [[DocxCodec]] oracle and fuzz
  * suites — the [[PdfFixtures]] doctrine applied to OPC: every byte of
  * the archive is a pure function of the id, and the TEXT the extractor
  * must recover is seed arithmetic the DuckDB oracle replays blind to
  * the container and its compression ([[ZipCodec.write]] with the
  * `word/document.xml` member DEFLATE-compressed, the way real writers
  * ship it — so the oracle matching proves container + inflate + XML
  * walk all cancel).
  *
  * Variant v = (id / 3) % 3 (coprime with the mixed-funnel's id%3
  * router so every variant stays live inside each router class):
  *   0: one paragraph, one run → "Docx body <id> alpha"
  *   1: TWO paragraphs; second has `xml:space="preserve"`, a
  *      `<w:tab/>` and an XML entity → "Para one <id>\nTab\there &
  *      done"; NO docProps/core.xml (absent-metadata branch)
  *   2: one paragraph whose word is SPLIT across two runs (proofErr
  *      noise between them must not contribute) → "Split<id> joined"
  */
object DocxFixtures {

  private def bytes(s: String): Array[Byte] = s.getBytes(StandardCharsets.UTF_8)

  private val ContentTypes =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
      |<Default Extension="xml" ContentType="application/xml"/>
      |<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>
      |</Types>""".stripMargin

  private def document(body: String): String =
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">
       |<w:body>$body</w:body></w:document>""".stripMargin

  private def core(title: String, creator: String): String =
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<cp:coreProperties xmlns:cp="http://schemas.openxmlformats.org/package/2006/metadata/core-properties" xmlns:dc="http://purl.org/dc/elements/1.1/">
       |<dc:title>$title</dc:title><dc:creator>$creator</dc:creator>
       |</cp:coreProperties>""".stripMargin

  /** Build a minimal OPC archive: `[Content_Types].xml` first (the
    * magic-byte router's sniff window), then the document, then the
    * optional core-properties sidecar. The document member rides
    * DEFLATE — the foreign-compression read path is always live. */
  def docx(body: String, coreProps: Option[(String, String)]): Array[Byte] = {
    val members = Seq(
      "[Content_Types].xml" -> bytes(ContentTypes),
      "word/document.xml" -> bytes(document(body))) ++
      coreProps.map { case (t, c) => "docProps/core.xml" -> bytes(core(t, c)) }
    ZipCodec.write(members, deflateNames = Set("word/document.xml"))
  }

  def docDocx(id: Long): Array[Byte] = ((id / 3) % 3) match {
    case 0 =>
      docx(s"<w:p><w:r><w:t>Docx body $id alpha</w:t></w:r></w:p>",
        Some((s"Doc Props $id", s"Writer ${id % 7}")))
    case 1 =>
      docx(
        s"<w:p><w:r><w:t>Para one $id</w:t></w:r></w:p>" +
          "<w:p><w:r><w:t>Tab</w:t><w:tab/>" +
          "<w:t xml:space=\"preserve\">here &amp; done</w:t></w:r></w:p>",
        None)
    case _ =>
      docx(
        "<w:p><w:pPr><w:jc w:val=\"left\"/></w:pPr>" +
          s"<w:r><w:t>Spl</w:t></w:r><w:proofErr w:type=\"spellStart\"/>" +
          s"<w:r><w:t>it$id joined</w:t></w:r></w:p>",
        Some((s"Split Doc $id", "Runs Writer")))
  }

  /** The text [[docDocx]] must extract (paragraphs joined with '\n') —
    * the seed arithmetic the oracle rebuilds in SQL. */
  def docText(id: Long): String = ((id / 3) % 3) match {
    case 0 => s"Docx body $id alpha"
    case 1 => s"Para one $id\nTab\there & done"
    case _ => s"Split$id joined"
  }

  def docParas(id: Long): Int = if ((id / 3) % 3 == 1) 2 else 1

  /** The (title, creator) [[docDocx]]'s core sidecar must yield —
    * nulls for variant 1 (no docProps/core.xml member at all). */
  def docMeta(id: Long): (Option[String], Option[String]) = ((id / 3) % 3) match {
    case 0 => (Some(s"Doc Props $id"), Some(s"Writer ${id % 7}"))
    case 1 => (None, None)
    case _ => (Some(s"Split Doc $id"), Some("Runs Writer"))
  }

  /** A CORRUPT docx-shaped blob: PK local-header magic and the OPC
    * sniff token present so the router classifies it `docx`, but no
    * central directory — [[ZipCodec.parse]] must reject it and the
    * funnel must COUNT it, not vanish it. */
  def corruptDocx(id: Long): Array[Byte] =
    (Array[Byte]('P', 'K', 3, 4) ++
      bytes(s"[Content_Types].xml truncated $id")).take(40)

  // ── PPTX (PresentationML) — the third office face ────────────────

  private val PptxContentTypes =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
      |<Default Extension="xml" ContentType="application/xml"/>
      |<Override PartName="/ppt/presentation.xml" ContentType="application/vnd.openxmlformats-officedocument.presentationml.presentation.main+xml"/>
      |</Types>""".stripMargin

  private def slideXml(body: String): String =
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<p:sld xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main" xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main">
       |<p:cSld><p:spTree><p:sp><p:txBody>$body</p:txBody></p:sp></p:spTree></p:cSld></p:sld>""".stripMargin

  /** Build a minimal PPTX: content types, slides (written in the GIVEN
    * member order under the given numbers — the codec must sort
    * numerically, not trust wire order), optional core sidecar. Slide
    * members ride DEFLATE like the docx fixture. */
  def pptx(slides: Seq[(Int, String)],
           coreProps: Option[(String, String)]): Array[Byte] = {
    val members = Seq("[Content_Types].xml" -> bytes(PptxContentTypes)) ++
      slides.map { case (n, body) =>
        s"ppt/slides/slide$n.xml" -> bytes(slideXml(body))
      } ++
      coreProps.map { case (t, c) => "docProps/core.xml" -> bytes(core(t, c)) }
    ZipCodec.write(members,
      deflateNames = slides.map { case (n, _) => s"ppt/slides/slide$n.xml" }.toSet)
  }

  /** Seed PPTX fixture, variant v = (id / 3) % 3 (coprime with an
    * id%3 router, the [[docDocx]] convention):
    *   0: one slide, one run → "Deck body <id> intro"
    *   1: TWO slides written WIRE-REVERSED (slide2's member precedes
    *      slide1's) — numeric ordering is load-bearing; slide2 has two
    *      paragraphs → "Deck <id> one\nTwo a <id>\nTwo b"; NO core
    *   2: one slide, word split across runs + <a:br/> →
    *      "Pptx<id> joined\nnext" */
  def docPptx(id: Long): Array[Byte] = ((id / 3) % 3) match {
    case 0 =>
      pptx(Seq(1 -> s"<a:p><a:r><a:t>Deck body $id intro</a:t></a:r></a:p>"),
        Some((s"Deck Props $id", s"Presenter ${id % 5}")))
    case 1 =>
      pptx(Seq(
        2 -> (s"<a:p><a:r><a:t>Two a $id</a:t></a:r></a:p>" +
          "<a:p><a:r><a:t>Two b</a:t></a:r></a:p>"),
        1 -> s"<a:p><a:r><a:t>Deck $id one</a:t></a:r></a:p>"),
        None)
    case _ =>
      pptx(Seq(1 ->
        (s"<a:p><a:pPr/><a:r><a:t>Ppt</a:t></a:r>" +
          s"<a:r><a:t>x$id joined</a:t></a:r><a:br/>" +
          "<a:r><a:t>next</a:t></a:r></a:p>")),
        Some((s"Split Deck $id", "Runs Presenter")))
  }

  /** The text [[docPptx]] must extract (slide paragraphs joined '\n',
    * slides joined '\n'). */
  def docPptxText(id: Long): String = ((id / 3) % 3) match {
    case 0 => s"Deck body $id intro"
    case 1 => s"Deck $id one\nTwo a $id\nTwo b"
    case _ => s"Pptx$id joined\nnext"
  }

  def docPptxSlides(id: Long): Int = if ((id / 3) % 3 == 1) 2 else 1
  def docPptxParas(id: Long): Int = if ((id / 3) % 3 == 1) 3 else 1

  // ── XLSX (SpreadsheetML) — the fourth office face ─────────────────

  private val XlsxContentTypes =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
      |<Default Extension="xml" ContentType="application/xml"/>
      |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
      |</Types>""".stripMargin

  private def sheetWrap(rows: String): String =
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
       |<sheetData>$rows</sheetData></worksheet>""".stripMargin

  private def sstWrap(sis: String): String =
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">$sis</sst>""".stripMargin

  /** Build a minimal XLSX: content types, optional shared strings,
    * sheets under the given numbers in the GIVEN member order (the
    * codec must sort numerically), optional core sidecar. Sheet and
    * shared-string members ride DEFLATE like the other fixtures. */
  def xlsx(sheets: Seq[(Int, String)], sharedSis: Option[String],
           coreProps: Option[(String, String)]): Array[Byte] = {
    val sheetMembers = sheets.map { case (n, rows) =>
      s"xl/worksheets/sheet$n.xml" -> bytes(sheetWrap(rows))
    }
    val members = Seq("[Content_Types].xml" -> bytes(XlsxContentTypes)) ++
      sharedSis.map(s => "xl/sharedStrings.xml" -> bytes(sstWrap(s))) ++
      sheetMembers ++
      coreProps.map { case (t, c) => "docProps/core.xml" -> bytes(core(t, c)) }
    ZipCodec.write(members,
      deflateNames = sheetMembers.map(_._1).toSet + "xl/sharedStrings.xml")
  }

  /** Seed XLSX fixture, variant v = (id / 3) % 3:
    *   0: one sheet, 2×2 — shared string, raw numeric, and a REUSED
    *      shared index → "Cell <id>\t42\nshared word\tshared word"
    *   1: TWO sheets wire-reversed; inlineStr + t="str" formula text;
    *      a RICH-RUN shared si (runs concatenate) →
    *      "Inline <id> text\tS<id>\nRich run <id>"; NO core
    *   2: escaped entity in a shared string, an empty <c/>, and an
    *      out-of-range shared index (reads empty, never throws) →
    *      "A & B <id>\t\t" */
  def docXlsx(id: Long): Array[Byte] = ((id / 3) % 3) match {
    case 0 =>
      xlsx(
        Seq(1 -> ("""<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1"><v>42</v></c></row>""" +
          """<row r="2"><c r="A2" t="s"><v>1</v></c><c r="B2" t="s"><v>1</v></c></row>""")),
        Some(s"<si><t>Cell $id</t></si><si><t>shared word</t></si>"),
        Some((s"Book Props $id", s"Analyst ${id % 4}")))
    case 1 =>
      xlsx(
        Seq(
          2 -> """<row r="1"><c r="A1" t="s"><v>0</v></c></row>""",
          1 -> (s"""<row r="1"><c r="A1" t="inlineStr"><is><t>Inline $id text</t></is></c>""" +
            s"""<c r="B1" t="str"><v>S$id</v></c></row>""")),
        Some(s"<si><r><t>Rich</t></r><r><t> run $id</t></r></si>"),
        None)
    case _ =>
      xlsx(
        Seq(1 -> (s"""<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1"/>""" +
          """<c r="C1" t="s"><v>99</v></c></row>""")),
        Some(s"<si><t>A &amp; B $id</t></si>"),
        Some((s"Sheet Props $id", "Ledger Writer")))
  }

  /** The text [[docXlsx]] must extract (cells '\t', rows/sheets '\n'). */
  def docXlsxText(id: Long): String = ((id / 3) % 3) match {
    case 0 => s"Cell $id\t42\nshared word\tshared word"
    case 1 => s"Inline $id text\tS$id\nRich run $id"
    case _ => s"A & B $id\t\t"
  }

  def docXlsxSheets(id: Long): Int = if ((id / 3) % 3 == 1) 2 else 1
  def docXlsxRows(id: Long): Int = if ((id / 3) % 3 == 2) 1 else 2
  def docXlsxCells(id: Long): Int = if ((id / 3) % 3 == 0) 4 else 3

  // ── EPUB (OCF) — books ────────────────────────────────────────────

  /** Build a minimal EPUB: STORED `mimetype` first (the OCF rule),
    * container.xml naming `opfPath`, the package document with the
    * given manifest items `(id, href, mediaType)` and spine idrefs,
    * and the content files at their FULL member paths (DEFLATE). */
  def epub(opfPath: String, manifest: Seq[(String, String, String)],
           spine: Seq[String], files: Seq[(String, String)],
           props: Option[(String, String)]): Array[Byte] = {
    val container =
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<container version="1.0" xmlns="urn:oasis:names:tc:opendocument:xmlns:container">
         |<rootfiles><rootfile full-path="$opfPath" media-type="application/oebps-package+xml"/></rootfiles>
         |</container>""".stripMargin
    val meta = props.map { case (t, c) =>
      s"<dc:title>$t</dc:title><dc:creator>$c</dc:creator>"
    }.getOrElse("")
    val opf =
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<package xmlns="http://www.idpf.org/2007/opf" xmlns:dc="http://purl.org/dc/elements/1.1/" version="3.0">
         |<metadata>$meta</metadata>
         |<manifest>${manifest.map { case (i, h, m) =>
              s"""<item id="$i" href="$h" media-type="$m"/>"""
            }.mkString}</manifest>
         |<spine>${spine.map(i => s"""<itemref idref="$i"/>""").mkString}</spine>
         |</package>""".stripMargin
    val members =
      Seq("mimetype" -> bytes("application/epub+zip"),
        "META-INF/container.xml" -> bytes(container),
        opfPath -> bytes(opf)) ++
        files.map { case (p, c) => p -> bytes(c) }
    ZipCodec.write(members,
      deflateNames = files.map(_._1).toSet ++ Set(opfPath, "META-INF/container.xml"))
  }

  private def xhtml(body: String): String =
    s"""<?xml version="1.0" encoding="UTF-8"?>
       |<html xmlns="http://www.w3.org/1999/xhtml">
       |<body>$body</body></html>""".stripMargin

  /** Seed EPUB fixture, variant v = (id / 3) % 3:
    *   0: one chapter → "Book <id> opening line"
    *   1: TWO chapters whose member AND manifest order is REVERSED vs
    *      the spine (reading order is the spine's, nothing else's),
    *      plus a css manifest item that must skip; NO metadata
    *   2: nested package dir with a `../` chapter href (the common
    *      OEBPS/ops layout) → "Deep link <id> works" */
  def docEpub(id: Long): Array[Byte] = ((id / 3) % 3) match {
    case 0 =>
      epub("OEBPS/content.opf",
        Seq(("ch1", "ch1.xhtml", "application/xhtml+xml")),
        Seq("ch1"),
        Seq("OEBPS/ch1.xhtml" -> xhtml(s"<p>Book $id opening line</p>")),
        Some((s"Book Props $id", s"Author ${id % 6}")))
    case 1 =>
      epub("OEBPS/content.opf",
        Seq(("style", "style.css", "text/css"),
          ("chB", "b.xhtml", "application/xhtml+xml"),
          ("chA", "a.xhtml", "application/xhtml+xml")),
        Seq("chA", "chB"),
        Seq("OEBPS/b.xhtml" -> xhtml(s"<p>Chapter two $id</p>"),
          "OEBPS/style.css" -> "p { margin: 0 }",
          "OEBPS/a.xhtml" -> xhtml(s"<p>Chapter one $id</p>")),
        None)
    case _ =>
      epub("OEBPS/ops/content.opf",
        Seq(("ch", "../text/ch.xhtml", "application/xhtml+xml")),
        Seq("ch"),
        Seq("OEBPS/text/ch.xhtml" -> xhtml(s"<p>Deep link $id works</p>")),
        Some((s"Deep Props $id", "Nested Author")))
  }

  /** The per-chapter text [[docEpub]]'s spine yields after the query
    * layer's htmlExtract — seed arithmetic the oracle replays. */
  def docEpubChapterTexts(id: Long): Seq[String] = ((id / 3) % 3) match {
    case 0 => Seq(s"Book $id opening line")
    case 1 => Seq(s"Chapter one $id", s"Chapter two $id")
    case _ => Seq(s"Deep link $id works")
  }
}
