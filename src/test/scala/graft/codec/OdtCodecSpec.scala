package graft.codec

import org.scalatest.funsuite.AnyFunSuite

/** [[OdtCodec]] against the [[OdtFixtures]] wire shapes: mixed-content
  * paragraph folding (span stripping, tab/line-break/run-length-space
  * substitution, entity decode), the meta.xml sidecar, structural
  * rejections, and the never-throw fuzz sweep. */
class OdtCodecSpec extends AnyFunSuite {

  test("variant 0: span-wrapped paragraph, meta present") {
    val d = OdtCodec.extract(OdtFixtures.docOdt(0)).get
    assert(d.text == "Odt body 0 alpha" && d.nParas == 1)
    assert(d.title.contains("Odt Props 0") && d.creator.contains("Writer 0"))
  }

  test("variant 1: tab, run-length spaces, entity, no meta") {
    val d = OdtCodec.extract(OdtFixtures.docOdt(3)).get
    assert(d.text == "Para one 3\nTab\there  & done", s"got '${d.text}'")
    assert(d.nParas == 2)
    assert(d.title.isEmpty && d.creator.isEmpty)
  }

  test("variant 2: span-split word, bookmark noise, line break") {
    val d = OdtCodec.extract(OdtFixtures.docOdt(6)).get
    assert(d.text == "Split6 joined\nnext" && d.nParas == 1)
    assert(d.title.contains("Split Odt 6") && d.creator.contains("Spans Writer"))
  }

  test("every fixture id matches its declared seed-arithmetic text") {
    (0L until 60L).foreach { id =>
      val d = OdtCodec.extract(OdtFixtures.docOdt(id))
      assert(d.map(_.text).contains(OdtFixtures.docText(id)), s"id=$id")
    }
  }

  test("headings count as paragraphs; default text:s is one space") {
    val b = OdtFixtures.odt(
      "<text:h text:outline-level=\"1\">Head</text:h>" +
        "<text:p>a<text:s/>b</text:p><text:p/>", None)
    val d = OdtCodec.extract(b).get
    assert(d.paras == Vector("Head", "a b", ""))
  }

  test("the content.xml member is DEFLATE on the wire") {
    val raw = OdtFixtures.docOdt(1)
    val s = new String(raw, java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(!s.contains("Para one 1"))
    assert(s.contains("mimetype"))
  }

  test("router: odt and epub classify by member names") {
    assert(graft.operators.Docx.sniffOoxml(OdtFixtures.docOdt(0)) == "odt")
    assert(graft.operators.Docx.sniffOoxml(DocxFixtures.docDocx(0)) == "docx")
    // a plain zip with neither marker stays zip
    val plain = ZipCodec.write(Seq("readme.txt" -> "hi".getBytes))
    assert(graft.operators.Docx.sniffOoxml(plain) == "zip")
  }

  test("rejections: no content.xml, corrupt container") {
    val noContent = ZipCodec.write(Seq("mimetype" -> "x".getBytes))
    assert(OdtCodec.extract(noContent).isEmpty)
    assert(OdtCodec.extract(null).isEmpty)
    assert(OdtCodec.extract("PK garbage".getBytes).isEmpty)
  }

  test("never-throw fuzz: random mutations of real fixtures") {
    val rnd = new scala.util.Random(20260818L)
    (0 until 600).foreach { k =>
      val base = OdtFixtures.docOdt(k % 9)
      val mutated = base.clone()
      (0 until 1 + rnd.nextInt(6)).foreach { _ =>
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      }
      OdtCodec.extract(mutated)
      OdtCodec.extract(java.util.Arrays.copyOfRange(
        mutated, 0, 1 + rnd.nextInt(mutated.length)))
    }
  }
}
