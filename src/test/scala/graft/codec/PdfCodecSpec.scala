package graft.codec

import org.scalatest.funsuite.AnyFunSuite

/** [[PdfCodec]] against the [[PdfFixtures]] wire shapes, pinned text
  * per variant, structural edge cases (broken xref → scan fallback,
  * cyclic page tree, lying /Length), and the never-throw fuzz sweep —
  * 1000 truncation/bit-flip/splice cases over all four variants (the
  * [[MediaHeaders]] hostile-input doctrine). No Spark session: the
  * codec is pure bytes → text. */
class PdfCodecSpec extends AnyFunSuite {

  private def extractText(id: Long): Option[(Int, String)] =
    PdfCodec.extract(PdfFixtures.docPdf(id)).map(d => (d.nPages, d.text))

  test("variant 0: flate + literal octal/paren escapes + WinAnsi") {
    assert(extractText(0).contains((1, "Doc 0 café résumé (ok)")))
    assert(extractText(4).contains((1, "Doc 4 café résumé (ok)")))
  }

  test("variant 1: two pages, filter array, indirect length, TJ kerning, quote op") {
    assert(extractText(1).contains(
      (2, "Alpha beta gamma 1\nkerned\nSecond\npage 1")))
    // kern −40 fuses, −150/−220 space — the rule's both sides
    assert(extractText(5).exists(_._2.contains("kerned")))
    assert(extractText(5).exists(_._2.contains("Alpha beta gamma 5")))
  }

  test("variant 2: uncompressed stream, hex string, T*") {
    assert(extractText(2).contains((1, "Hex row 2\nnext line")))
  }

  test("variant 3: xref stream + ObjStm + PNG predictor + ToUnicode CMap") {
    assert(extractText(3).contains((1, "Кириллица 3")))
    assert(extractText(7).contains((1, "Кириллица 7")))
  }

  test("ASCII85 + Flate filter chain decodes (incl. z shortcut and partial group)") {
    // direct round trip: zero quads take the 'z' shortcut, the tail is
    // a partial group (n-1 bytes from n chars), '~>' terminates
    val payload = Array[Byte](1, 2, 3, 4, 0, 0, 0, 0, 5, 6, 7, 8, 9, 10)
    val enc = PdfFixtures.ascii85Encode(payload)
    assert(new String(enc).contains("z"), "zero quad must take the shortcut")
    assert(PdfCodec.ascii85(enc).map(_.toSeq).contains(payload.toSeq))
    // a lone trailing char after full groups is invalid, never a crash
    assert(PdfCodec.ascii85("!!!!!:~>".getBytes).isEmpty)
    // ... and through a whole document: /Filter [/ASCII85Decode /FlateDecode]
    val b = PdfFixtures.pdf(Seq(PdfFixtures.Page(
      s"BT /F1 10 Tf 50 700 Td (Chained a85 doc) Tj ET")), a85 = true)
    assert(PdfCodec.extract(b).map(_.text).contains("Chained a85 doc"))
  }

  test("xref stream layout without predictor also parses") {
    val text = "Проверка 42"
    val b = PdfFixtures.pdf(
      Seq(PdfFixtures.Page(
        s"BT /F2 10 Tf 60 710 Td <${PdfFixtures.cidHex(text, text)}> Tj ET",
        font = "/F2")),
      font = PdfFixtures.CidFont(text), xrefStream = true, predictor = false)
    assert(PdfCodec.extract(b).map(_.text).contains(text))
  }

  test("broken startxref falls back to the object scan") {
    val good = PdfFixtures.docPdf(0)
    val s = new String(good, java.nio.charset.StandardCharsets.ISO_8859_1)
    val sx = s.lastIndexOf("startxref")
    val broken = (s.substring(0, sx) + "startxref\n999999999\n%%EOF\n")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(PdfCodec.extract(broken).map(_.text).contains("Doc 0 café résumé (ok)"),
      "scan fallback must recover a document whose xref pointer is rotten")
  }

  test("xref table wiped entirely still recovers via scan") {
    val good = PdfFixtures.docPdf(2) // uncompressed variant
    val s = new String(good, java.nio.charset.StandardCharsets.ISO_8859_1)
    val cut = s.indexOf("xref")
    val trunc = s.substring(0, cut)
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(PdfCodec.extract(trunc).map(_.text).contains("Hex row 2\nnext line"),
      "objects before the truncation point are all the text needs")
  }

  test("lying /Length: endstream search recovers the stream") {
    val good = PdfFixtures.docPdf(2)
    val s = new String(good, java.nio.charset.StandardCharsets.ISO_8859_1)
    // inflate the declared length of the content stream absurdly
    val lied = s.replaceFirst("/Length (\\d+)", "/Length 999999")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(PdfCodec.extract(lied).map(_.text).contains("Hex row 2\nnext line"))
  }

  test("cyclic page tree terminates") {
    // hand-build: pages node whose kid is itself
    val body =
      """%PDF-1.4
        |1 0 obj
        |<< /Type /Catalog /Pages 2 0 R >>
        |endobj
        |2 0 obj
        |<< /Type /Pages /Kids [ 2 0 R 2 0 R ] /Count 2 >>
        |endobj
        |trailer
        |<< /Root 1 0 R >>
        |""".stripMargin
    val b = body.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val d = PdfCodec.extract(b)
    assert(d.isDefined && d.get.nPages == 0, "cycle must terminate, not recurse")
  }

  test("non-PDF and empty inputs return None") {
    assert(PdfCodec.extract(Array.emptyByteArray).isEmpty)
    assert(PdfCodec.extract("not a pdf at all".getBytes).isEmpty)
    assert(PdfCodec.extract(MediaFixtures.png(4, 4)).isEmpty)
    assert(PdfCodec.extract(null).isEmpty)
  }

  test("never-throw fuzz: 1000 truncation/bit-flip/splice cases") {
    val rnd = new scala.util.Random(151515L)
    val bases = (0L to 3L).map(PdfFixtures.docPdf) ++
      Seq(PdfFixtures.encryptedPdf(1), PdfFixtures.lzwPdf(2))
    var cases = 0
    while (cases < 1000) {
      val base = bases(rnd.nextInt(bases.length))
      val mutated: Array[Byte] = rnd.nextInt(4) match {
        case 0 => // truncate
          java.util.Arrays.copyOf(base, rnd.nextInt(base.length + 1))
        case 1 => // bit flip
          val c = base.clone()
          val i = rnd.nextInt(c.length)
          c(i) = (c(i) ^ (1 << rnd.nextInt(8))).toByte
          c
        case 2 => // splice a random window over another position
          val c = base.clone()
          val from = rnd.nextInt(c.length)
          val to = rnd.nextInt(c.length)
          val len = math.min(rnd.nextInt(64), c.length - math.max(from, to))
          if (len > 0) System.arraycopy(base, from, c, to, len)
          c
        case _ => // random garbage tail after a valid prefix
          val keep = rnd.nextInt(base.length + 1)
          val tail = new Array[Byte](rnd.nextInt(256))
          rnd.nextBytes(tail)
          java.util.Arrays.copyOf(base, keep) ++ tail
      }
      // the only contract: never throw, never hang
      PdfCodec.extract(mutated)
      cases += 1
    }
    assert(cases == 1000)
  }

  test("/Info dictionary: literal, UTF-16BE hex, and absent branches") {
    val d0 = PdfCodec.extract(PdfFixtures.docPdf(0)).get
    assert(d0.info == Map("Title" -> "Report 0 café", "Author" -> "Graft Bot"))
    val d1 = PdfCodec.extract(PdfFixtures.docPdf(1)).get
    assert(d1.info.isEmpty, "no /Info must surface as empty, not fail")
    val d2 = PdfCodec.extract(PdfFixtures.docPdf(2)).get
    assert(d2.info == Map("Title" -> "Hex sheet 2"))
    val d3 = PdfCodec.extract(PdfFixtures.docPdf(3)).get
    assert(d3.info == Map("Title" -> "Документ 3", "Author" -> "Автор 3"),
      "BOM-prefixed UTF-16BE text strings decode per §7.9.2.2")
  }

  test("encrypted PDFs classify as encrypted, never ok-with-empty-text") {
    // classic xref: /Encrypt in the trailer dict
    val e1 = PdfCodec.extract(PdfFixtures.encryptedPdf(3)).get
    assert(e1.encrypted && e1.nPages == 0 && e1.text.isEmpty && e1.info.isEmpty)
    // PDF 1.5: /Encrypt in the xref STREAM's dict
    val e2 = PdfCodec.extract(PdfFixtures.encryptedPdfXrefStream(3)).get
    assert(e2.encrypted, "xref-stream trailer must carry /Encrypt too")
    // rotten startxref: the scan fallback recovers the trailer keyword
    val raw = PdfFixtures.encryptedPdf(9)
    val s = new String(raw, java.nio.charset.StandardCharsets.ISO_8859_1)
    val sx = s.lastIndexOf("startxref")
    val broken = (s.substring(0, sx) + "startxref\n0\n%%EOF\n")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val e3 = PdfCodec.extract(broken)
    assert(e3.exists(_.encrypted),
      "scan fallback must classify encrypted, not parse-ok-with-garbage-streams")
    // a normal document never reads as encrypted
    assert(PdfCodec.extract(PdfFixtures.docPdf(0)).exists(!_.encrypted))
  }

  test("scan-fallback trailer recovery is newest-first and content-byte-proof") {
    // a stray `trailer << /Encrypt … >>` inside an UNCOMPRESSED content
    // stream must not classify the document encrypted: the backward
    // scan stops at the newest trailer that parses (the real one at
    // EOF), never merging content bytes underneath it
    val good = PdfFixtures.pdf(Seq(PdfFixtures.Page(
      "BT /F1 9 Tf 40 700 Td (trailer << /Encrypt 5 0 R >> decoy) Tj ET")),
      compress = false)
    val s = new String(good, java.nio.charset.StandardCharsets.ISO_8859_1)
    val sx = s.lastIndexOf("startxref")
    val broken = (s.substring(0, sx) + "startxref\n0\n%%EOF\n")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val d = PdfCodec.extract(broken)
    assert(d.exists(!_.encrypted),
      "a decoy trailer in content bytes must not read as /Encrypt")
    assert(d.exists(_.text.contains("decoy")),
      "the scan fallback still recovers the page text")
  }

  test("LZWDecode: MSB-first EarlyChange=1 default and EarlyChange=0 via DecodeParms") {
    assert(PdfCodec.extract(PdfFixtures.lzwPdf(7)).map(_.text)
      .contains("LZW packed stream 7"))
    val p0 = PdfFixtures.pdf(Seq(PdfFixtures.Page(
      "BT /F1 10 Tf 60 700 Td (Early zero form) Tj ET")),
      lzw = true, lzwEarly0 = true)
    assert(PdfCodec.extract(p0).map(_.text).contains("Early zero form"))
  }

  test("LZW round trip crosses the 9->10->11 width boundaries on both EarlyChange forms") {
    val rnd = new scala.util.Random(161616L)
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    for (trial <- 0 until 60; early <- Seq(0, 1)) {
      val n = 1 + rnd.nextInt(6000) // enough emits to cross 511 and 1023
      val sb = new StringBuilder
      while (sb.length < n) {
        sb.append(words(rnd.nextInt(words.length))).append(rnd.nextInt(100)).append(' ')
      }
      val data = sb.toString.take(n)
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      val enc = PdfFixtures.lzwEncodeMsb(data, early)
      val dec = PdfCodec.lzwMsb(enc, early, 32 << 20)
      assert(dec.exists(java.util.Arrays.equals(_, data)),
        s"trial=$trial early=$early n=$n")
    }
    // incompressible bytes force dictionary churn toward the clear path
    for (trial <- 0 until 10; early <- Seq(0, 1)) {
      val data = new Array[Byte](1 + rnd.nextInt(20000))
      rnd.nextBytes(data)
      val enc = PdfFixtures.lzwEncodeMsb(data, early)
      assert(PdfCodec.lzwMsb(enc, early, 32 << 20)
        .exists(java.util.Arrays.equals(_, data)), s"bin trial=$trial early=$early")
    }
    // hostile: random bytes into the decoder never throw
    for (_ <- 0 until 100) {
      val junk = new Array[Byte](rnd.nextInt(512))
      rnd.nextBytes(junk)
      PdfCodec.lzwMsb(junk, 1, 1 << 20)
    }
  }

  test("deterministic: same input bytes, same output") {
    val b = PdfFixtures.docPdf(9)
    assert(PdfCodec.extract(b) == PdfCodec.extract(b.clone()))
    // and the fixture itself is deterministic
    assert(java.util.Arrays.equals(b, PdfFixtures.docPdf(9)))
  }
}
