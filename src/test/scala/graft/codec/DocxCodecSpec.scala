package graft.codec

import org.scalatest.funsuite.AnyFunSuite

/** [[DocxCodec]] against the [[DocxFixtures]] wire shapes: pinned text
  * per variant (runs-concatenate, tab/br substitution, entity decode,
  * xml:space attribute tolerance), the foreign-DEFLATE container path,
  * core-properties sidecar incl. the absent branch, structural
  * rejections, and the never-throw fuzz sweep (the [[PdfCodecSpec]]
  * doctrine). No Spark session: the codec is pure bytes → text. */
class DocxCodecSpec extends AnyFunSuite {

  test("variant 0: one paragraph, one run, core props") {
    val d = DocxCodec.extract(DocxFixtures.docDocx(0)).get
    assert(d.text == "Docx body 0 alpha" && d.nParas == 1)
    assert(d.title.contains("Doc Props 0") && d.creator.contains("Writer 0"))
  }

  test("variant 1: two paragraphs, tab substitution, entity, xml:space, NO core.xml") {
    val d = DocxCodec.extract(DocxFixtures.docDocx(3)).get
    assert(d.text == "Para one 3\nTab\there & done", s"got '${d.text}'")
    assert(d.nParas == 2)
    assert(d.title.isEmpty && d.creator.isEmpty,
      "absent docProps/core.xml must surface nulls, not fail the doc")
  }

  test("variant 2: word split across runs concatenates; proofErr noise contributes nothing") {
    val d = DocxCodec.extract(DocxFixtures.docDocx(6)).get
    assert(d.text == "Split6 joined" && d.nParas == 1)
    assert(d.title.contains("Split Doc 6") && d.creator.contains("Runs Writer"))
  }

  test("w:br contributes a newline inside one paragraph") {
    val b = DocxFixtures.docx(
      "<w:p><w:r><w:t>above</w:t><w:br/><w:t>below</w:t></w:r></w:p>", None)
    assert(DocxCodec.extract(b).map(_.text).contains("above\nbelow"))
  }

  test("numeric character references decode; unknown entities pass through") {
    val b = DocxFixtures.docx(
      "<w:p><w:r><w:t>caf&#233; &#x2014; &unknown; ok</w:t></w:r></w:p>", None)
    assert(DocxCodec.extract(b).map(_.text).contains("café — &unknown; ok"))
  }

  test("document.xml member is DEFLATE on the wire (the foreign-compression path)") {
    val raw = DocxFixtures.docDocx(1)
    // the document body text must NOT appear verbatim in the archive
    val s = new String(raw, java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(!s.contains("Para one 1"), "fixture must actually compress the member")
    assert(s.contains("[Content_Types].xml"), "sniff token stays visible")
  }

  test("corrupt container and wrong members reject with None") {
    assert(DocxCodec.extract(DocxFixtures.corruptDocx(5)).isEmpty)
    assert(DocxCodec.extract(Array.emptyByteArray).isEmpty)
    assert(DocxCodec.extract(null).isEmpty)
    assert(DocxCodec.extract("PK not a zip really".getBytes).isEmpty)
    // a valid zip with no word/document.xml is not a docx
    val zipNoDoc = ZipCodec.write(Seq("readme.txt" -> "hi".getBytes))
    assert(DocxCodec.extract(zipNoDoc).isEmpty)
    // a PDF is not a docx
    assert(DocxCodec.extract(PdfFixtures.docPdf(0)).isEmpty)
  }

  test("empty paragraphs are kept as empty lines") {
    val b = DocxFixtures.docx(
      "<w:p><w:r><w:t>first</w:t></w:r></w:p><w:p/>" +
        "<w:p><w:r><w:t>third</w:t></w:r></w:p>", None)
    assert(DocxCodec.extract(b).map(_.text).contains("first\n\nthird"))
  }

  test("never-throw fuzz: 600 truncation/bit-flip/garbage-tail cases") {
    val rnd = new scala.util.Random(171717L)
    val bases = Seq(DocxFixtures.docDocx(0), DocxFixtures.docDocx(3),
      DocxFixtures.docDocx(6))
    var cases = 0
    while (cases < 600) {
      val base = bases(rnd.nextInt(bases.length))
      val mutated: Array[Byte] = rnd.nextInt(3) match {
        case 0 => java.util.Arrays.copyOf(base, rnd.nextInt(base.length + 1))
        case 1 =>
          val c = base.clone()
          val i = rnd.nextInt(c.length)
          c(i) = (c(i) ^ (1 << rnd.nextInt(8))).toByte
          c
        case _ =>
          val keep = rnd.nextInt(base.length + 1)
          val tail = new Array[Byte](rnd.nextInt(128))
          rnd.nextBytes(tail)
          java.util.Arrays.copyOf(base, keep) ++ tail
      }
      DocxCodec.extract(mutated) // contract: never throw, never hang
      cases += 1
    }
    assert(cases == 600)
  }

  test("pptx variant 0: one slide, one run, core props") {
    val d = DocxCodec.extractPptx(DocxFixtures.docPptx(0)).get
    assert(d.text == "Deck body 0 intro" && d.nSlides == 1 && d.nParas == 1)
    assert(d.title.contains("Deck Props 0") && d.creator.contains("Presenter 0"))
  }

  test("pptx variant 1: slides order NUMERICALLY, not by wire position; no core") {
    val d = DocxCodec.extractPptx(DocxFixtures.docPptx(3)).get
    assert(d.text == "Deck 3 one\nTwo a 3\nTwo b", s"got '${d.text}'")
    assert(d.nSlides == 2 && d.nParas == 3)
    assert(d.title.isEmpty && d.creator.isEmpty)
    // the numeric-vs-lexicographic trap: slide2 and slide10
    val b = DocxFixtures.pptx(Seq(
      10 -> "<a:p><a:r><a:t>ten</a:t></a:r></a:p>",
      2 -> "<a:p><a:r><a:t>two</a:t></a:r></a:p>"), None)
    assert(DocxCodec.extractPptx(b).map(_.text).contains("two\nten"),
      "slide2 must precede slide10 (lexicographic name order lies)")
  }

  test("pptx variant 2: split runs concatenate, a:br breaks the line") {
    val d = DocxCodec.extractPptx(DocxFixtures.docPptx(6)).get
    assert(d.text == "Pptx6 joined\nnext" && d.nSlides == 1 && d.nParas == 1)
  }

  test("pptx rejections: a docx is not a pptx and vice versa; corrupt rejects") {
    assert(DocxCodec.extractPptx(DocxFixtures.docDocx(0)).isEmpty,
      "no ppt/slides members -> not a pptx")
    assert(DocxCodec.extract(DocxFixtures.docPptx(0)).isEmpty,
      "no word/document.xml -> not a docx")
    assert(DocxCodec.extractPptx(DocxFixtures.corruptDocx(1)).isEmpty)
    assert(DocxCodec.extractPptx(null).isEmpty)
    // slideLayouts and notes members never read as slides
    val b = DocxFixtures.pptx(Seq(1 -> "<a:p><a:r><a:t>real</a:t></a:r></a:p>"), None)
    val spoofed = ZipCodec.write(
      ZipCodec.parse(b).get :+
        ("ppt/slideLayouts/slideLayout1.xml" ->
          "<a:p><a:r><a:t>layout noise</a:t></a:r></a:p>".getBytes("UTF-8")))
    assert(DocxCodec.extractPptx(spoofed).map(_.text).contains("real"),
      "only ppt/slides/slideN.xml members are slides")
  }

  test("pptx never-throw fuzz: 300 truncation/bit-flip cases") {
    val rnd = new scala.util.Random(181818L)
    val bases = Seq(DocxFixtures.docPptx(0), DocxFixtures.docPptx(3),
      DocxFixtures.docPptx(6))
    for (_ <- 0 until 300) {
      val base = bases(rnd.nextInt(bases.length))
      val mutated = rnd.nextInt(2) match {
        case 0 => java.util.Arrays.copyOf(base, rnd.nextInt(base.length + 1))
        case _ =>
          val c = base.clone()
          c(rnd.nextInt(c.length)) = (c(rnd.nextInt(c.length)) ^ 0x40).toByte
          c
      }
      DocxCodec.extractPptx(mutated) // contract: never throw, never hang
    }
  }

  test("xlsx variant 0: shared strings resolve, raw numerics pass, reuse reads twice") {
    val d = XlsxCodec.extract(DocxFixtures.docXlsx(0)).get
    assert(d.text == "Cell 0\t42\nshared word\tshared word", s"got '${d.text}'")
    assert(d.nSheets == 1 && d.nRows == 2 && d.nCells == 4)
    assert(d.title.contains("Book Props 0") && d.creator.contains("Analyst 0"))
  }

  test("xlsx variant 1: sheets order numerically; inlineStr + str + rich-run si") {
    val d = XlsxCodec.extract(DocxFixtures.docXlsx(3)).get
    assert(d.text == "Inline 3 text\tS3\nRich run 3", s"got '${d.text}'")
    assert(d.nSheets == 2 && d.nRows == 2 && d.nCells == 3)
    assert(d.title.isEmpty)
  }

  test("xlsx variant 2: entity decode, empty cell, out-of-range shared index reads empty") {
    val d = XlsxCodec.extract(DocxFixtures.docXlsx(6)).get
    assert(d.text == "A & B 6\t\t", s"got '${d.text}'")
    assert(d.nCells == 3)
    assert(d.title.contains("Sheet Props 6"))
  }

  test("xlsx rejections + never-throw fuzz") {
    assert(XlsxCodec.extract(DocxFixtures.docDocx(0)).isEmpty,
      "no worksheets -> not an xlsx")
    assert(XlsxCodec.extract(DocxFixtures.corruptDocx(1)).isEmpty)
    assert(XlsxCodec.extract(null).isEmpty)
    assert(XlsxCodec.extract(Array.emptyByteArray).isEmpty)
    val rnd = new scala.util.Random(191919L)
    val bases = Seq(DocxFixtures.docXlsx(0), DocxFixtures.docXlsx(3),
      DocxFixtures.docXlsx(6))
    for (_ <- 0 until 300) {
      val base = bases(rnd.nextInt(bases.length))
      val mutated = rnd.nextInt(2) match {
        case 0 => java.util.Arrays.copyOf(base, rnd.nextInt(base.length + 1))
        case _ =>
          val c = base.clone()
          c(rnd.nextInt(c.length)) = (c(rnd.nextInt(c.length)) ^ 0x11).toByte
          c
      }
      XlsxCodec.extract(mutated) // contract: never throw, never hang
    }
  }

  test("memberNames walks the directory without payload work; sniffOoxml classifies") {
    val names = ZipCodec.memberNames(DocxFixtures.docDocx(0)).get
    assert(names.head == "[Content_Types].xml" && names.contains("word/document.xml"))
    assert(ZipCodec.memberNames(DocxFixtures.corruptDocx(1)).isEmpty,
      "no central directory -> None")
    import graft.operators.Docx.sniffOoxml
    assert(sniffOoxml(DocxFixtures.docDocx(2)) == "docx")
    assert(sniffOoxml(DocxFixtures.docPptx(3)) == "pptx")
    assert(sniffOoxml(DocxFixtures.docXlsx(4)) == "xlsx")
    assert(sniffOoxml(DocxFixtures.corruptDocx(5)) == "unreadable")
    assert(sniffOoxml(ZipCodec.write(Seq("readme.txt" -> "hi".getBytes))) == "zip")
    assert(sniffOoxml(PdfFixtures.docPdf(0)) == "other")
    assert(sniffOoxml(null) == "other")
  }

  test("epub: spine defines reading order, not member or manifest order; css skips") {
    val d0 = EpubCodec.chapters(DocxFixtures.docEpub(0)).get
    assert(d0.nChapters == 1 && d0.chapters.head._1 == "OEBPS/ch1.xhtml")
    assert(d0.chapters.head._2.contains("Book 0 opening line"))
    assert(d0.title.contains("Book Props 0") && d0.creator.contains("Author 0"))
    val d1 = EpubCodec.chapters(DocxFixtures.docEpub(3)).get
    assert(d1.nChapters == 2)
    assert(d1.chapters(0)._2.contains("Chapter one 3") &&
      d1.chapters(1)._2.contains("Chapter two 3"),
      "spine order must win over member and manifest order")
    assert(d1.title.isEmpty)
  }

  test("epub: nested package dir resolves ../ hrefs; rejections never throw") {
    val d2 = EpubCodec.chapters(DocxFixtures.docEpub(6)).get
    assert(d2.nChapters == 1 && d2.chapters.head._1 == "OEBPS/text/ch.xhtml")
    assert(d2.chapters.head._2.contains("Deep link 6 works"))
    assert(EpubCodec.chapters(DocxFixtures.docDocx(0)).isEmpty,
      "no container.xml -> not an epub")
    assert(EpubCodec.chapters(DocxFixtures.corruptDocx(1)).isEmpty)
    assert(EpubCodec.chapters(null).isEmpty)
    val rnd = new scala.util.Random(202020L)
    val bases = Seq(DocxFixtures.docEpub(0), DocxFixtures.docEpub(3),
      DocxFixtures.docEpub(6))
    for (_ <- 0 until 300) {
      val base = bases(rnd.nextInt(bases.length))
      val mutated = rnd.nextInt(2) match {
        case 0 => java.util.Arrays.copyOf(base, rnd.nextInt(base.length + 1))
        case _ =>
          val c = base.clone()
          c(rnd.nextInt(c.length)) = (c(rnd.nextInt(c.length)) ^ 0x22).toByte
          c
      }
      EpubCodec.chapters(mutated) // contract: never throw, never hang
    }
  }

  test("xlsx: self-closing <si/> keeps the shared-string index aligned") {
    // an empty <si/> entry between two real ones: missing it would
    // shift every later index onto the wrong text — the worst failure
    // a lookup table has (wrong VALUES under an ok verdict)
    assert(XlsxCodec.sharedStrings(
      "<sst><si><t>alpha</t></si><si/><si><t>beta</t></si></sst>") ==
      Vector("alpha", "", "beta"))
    assert(XlsxCodec.sharedStrings(
      "<sst><si x=\"1\"/><si><t>only</t></si></sst>") == Vector("", "only"))
  }

  test("whitespace-delimited attributes: pretty-printed OOXML keeps its content") {
    // newline/tab-separated attributes (pretty-printers, some writers):
    // a space-only delimiter check silently drops the paragraph
    val d = DocxCodec.bodyParagraphs(
      "<w:p\n  w:rsidR=\"0\">" +
        "<w:r><w:t\txml:space=\"preserve\">kept text</w:t></w:r></w:p>")
    assert(d == Vector("kept text"), s"got $d")
    val rows = XlsxCodec.sheetRows(
      "<sheetData><row\n r=\"1\"><c\n\tr=\"A1\"\n\tt=\"s\"><v>0</v></c></row></sheetData>",
      Vector("resolved"))
    assert(rows == Vector(Vector("resolved")), s"got $rows")
  }

  test("deterministic: same id, same archive bytes, same output") {
    val b = DocxFixtures.docDocx(9)
    assert(java.util.Arrays.equals(b, DocxFixtures.docDocx(9)))
    assert(DocxCodec.extract(b) == DocxCodec.extract(b.clone()))
  }
}
