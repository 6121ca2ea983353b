package graft.codec

import java.nio.charset.StandardCharsets

/** Deterministic ODT builders for the [[OdtCodec]] oracle and fuzz
  * suites — the [[DocxFixtures]] doctrine on ODF: a `mimetype` member
  * first (STORED, the ODF convention), `content.xml` DEFLATE (the
  * foreign-compression read path stays live), optional `meta.xml`.
  *
  * Variant v = (id / 3) % 3:
  *   0: one paragraph, one span → "Odt body <id> alpha"; meta present
  *   1: TWO paragraphs; the second carries `<text:tab/>`, a
  *      run-length `<text:s text:c="2"/>` and an entity →
  *      "Para one <id>\nTab\there  & done"; NO meta.xml
  *   2: a word split across spans with bookmark noise between, plus a
  *      `<text:line-break/>` → "Split<id> joined\nnext"; meta present
  */
object OdtFixtures {

  private def bytes(s: String): Array[Byte] = s.getBytes(StandardCharsets.UTF_8)

  private val Mimetype = "application/vnd.oasis.opendocument.text"

  private def content(body: String): String =
    s"""<?xml version="1.0" encoding="UTF-8"?>
       |<office:document-content xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">
       |<office:body><office:text>$body</office:text></office:body>
       |</office:document-content>""".stripMargin

  private def meta(title: String, creator: String): String =
    s"""<?xml version="1.0" encoding="UTF-8"?>
       |<office:document-meta xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" xmlns:dc="http://purl.org/dc/elements/1.1/">
       |<office:meta><dc:title>$title</dc:title><dc:creator>$creator</dc:creator></office:meta>
       |</office:document-meta>""".stripMargin

  def odt(body: String, metaProps: Option[(String, String)]): Array[Byte] = {
    val members = Seq(
      "mimetype" -> bytes(Mimetype),
      "META-INF/manifest.xml" -> bytes("<manifest:manifest/>"),
      "content.xml" -> bytes(content(body))) ++
      metaProps.map { case (t, c) => "meta.xml" -> bytes(meta(t, c)) }
    ZipCodec.write(members, deflateNames = Set("content.xml"))
  }

  def docOdt(id: Long): Array[Byte] = ((id / 3) % 3) match {
    case 0 =>
      odt(s"<text:p text:style-name=\"P1\"><text:span>Odt body $id alpha</text:span></text:p>",
        Some((s"Odt Props $id", s"Writer ${id % 7}")))
    case 1 =>
      odt(
        s"<text:p>Para one $id</text:p>" +
          "<text:p>Tab<text:tab/>here<text:s text:c=\"2\"/>&amp; done</text:p>",
        None)
    case _ =>
      odt(
        s"<text:p><text:span text:style-name=\"T1\">Spl</text:span>" +
          s"<text:bookmark text:name=\"b1\"/>it$id joined" +
          "<text:line-break/>next</text:p>",
        Some((s"Split Odt $id", "Spans Writer")))
  }

  /** The text [[docOdt]] must extract. */
  def docText(id: Long): String = ((id / 3) % 3) match {
    case 0 => s"Odt body $id alpha"
    case 1 => s"Para one $id\nTab\there  & done"
    case _ => s"Split$id joined\nnext"
  }
}
