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
}
