package graft.codec

import org.scalatest.funsuite.AnyFunSuite

/** [[CfbCodec]] container round-trips and [[DocCodec]] against the
  * [[DocFixtures]] wire shapes: mini-stream vs FAT read paths,
  * compressed vs UTF-16 pieces, CP-order assembly over reversed file
  * order, Prc skipping, control-byte layout rules, the property-set
  * sidecar, structural rejections, and the never-throw fuzz sweep
  * (the [[PdfCodecSpec]] doctrine). No Spark session: pure bytes. */
class DocCodecSpec extends AnyFunSuite {

  // ── CFB container layer ─────────────────────────────────────────

  test("cfb: small streams round-trip through the mini stream") {
    val in = Seq("alpha" -> Array.tabulate(100)(_.toByte),
      "beta" -> Array.tabulate(5000)(i => (i * 7).toByte),
      "gamma" -> Array.emptyByteArray)
    val f = CfbCodec.parse(CfbCodec.write(in)).get
    in.foreach { case (nm, data) =>
      assert(java.util.Arrays.equals(f.streams(nm), data), nm)
    }
  }

  test("cfb: a stream spanning many sectors round-trips byte-exact") {
    val big = Array.tabulate(100000)(i => (i * 31 + 7).toByte)
    val f = CfbCodec.parse(CfbCodec.write(Seq("big" -> big))).get
    assert(java.util.Arrays.equals(f.streams("big"), big))
  }

  test("cfb: rejections — wrong magic, truncation, cyclic FAT") {
    assert(CfbCodec.parse(null).isEmpty)
    assert(CfbCodec.parse(new Array[Byte](511)).isEmpty)
    val ok = CfbCodec.write(Seq("s" -> Array.tabulate(9000)(_.toByte)))
    assert(CfbCodec.parse(ok).nonEmpty)
    assert(CfbCodec.parse(java.util.Arrays.copyOfRange(ok, 0, 1024)).isEmpty)
    val wrong = ok.clone(); wrong(0) = 0x51
    assert(CfbCodec.parse(wrong).isEmpty)
    // self-cycle in the big stream's FAT chain must not hang
    val cyc = ok.clone()
    // FAT sector 0 starts at byte 512; find the big stream's first
    // sector entry and point it at itself
    var k = 0
    var done = false
    while (k < 128 && !done) {
      val off = 512 + k * 4
      val v = (cyc(off) & 0xFF) | ((cyc(off + 1) & 0xFF) << 8)
      if (v == k + 1) { cyc(off) = k.toByte; done = true } // self-loop
      k += 1
    }
    assert(done)
    assert(CfbCodec.parse(cyc).isEmpty)
  }

  // ── DOC layer ───────────────────────────────────────────────────

  test("variant 0: compressed piece, 0Table, mini path, sidecar") {
    val d = DocCodec.extract(DocFixtures.docDoc(0)).get
    assert(d.text == "Doc body 0 alpha", s"got '${d.text}'")
    assert(d.nParas == 1)
    assert(d.title.contains("Doc Props 0") && d.author.contains("Writer 0"))
  }

  test("variant 1: cp1252 + UTF-16 pieces, 1Table, FAT path, no sidecar") {
    val d = DocCodec.extract(DocFixtures.docDoc(3)).get
    assert(d.text == "Para one 3\nTab\there € done", s"got '${d.text}'")
    assert(d.nParas == 2)
    assert(d.title.isEmpty && d.author.isEmpty)
  }

  test("variant 2: CP order beats file order; Prc skipped") {
    val d = DocCodec.extract(DocFixtures.docDoc(6)).get
    assert(d.text == "Split6 joined", s"got '${d.text}'")
    assert(d.nParas == 1)
    assert(d.title.contains("Split Doc 6") && d.author.contains("Runs Writer"))
  }

  test("every fixture id matches its declared seed-arithmetic text") {
    (0L until 60L).foreach { id =>
      val d = DocCodec.extract(DocFixtures.docDoc(id))
      assert(d.map(_.text).contains(DocFixtures.docText(id)), s"id=$id")
    }
  }

  test("field markers, cell marks and vertical tabs follow the layout pin") {
    // hand-build: text with 0x13 HYPERLINK 0x14 shown 0x15, cell mark, VT
    val raw = "arefbcde\r"
    val text = graft.codec.DocFixtures.rawPieceDoc(raw)
    val d = DocCodec.extract(text).get
    assert(d.text == "arefbc\nd\ne", s"got '${d.text}'")
  }

  test("fixture variant 1 really exercises the FAT (non-mini) path") {
    // WordDocument in variant 1 is 8192 bytes ≥ the 4096 cutoff
    val f = CfbCodec.parse(DocFixtures.docDoc(3)).get
    assert(f.streams("WordDocument").length == 8192)
  }

  test("rejections: missing table stream, bad wIdent, torn container") {
    assert(DocCodec.extract(DocFixtures.corruptDoc(5)).isEmpty)
    assert(DocCodec.extract(null).isEmpty)
    assert(DocCodec.extract("plain text".getBytes).isEmpty)
    // valid CFB but no WordDocument stream
    val noWd = CfbCodec.write(Seq("Other" -> new Array[Byte](100)))
    assert(DocCodec.extract(noWd).isEmpty)
    // bad FIB magic
    val badIdent = DocFixtures.docDoc(0)
    val f = CfbCodec.parse(badIdent).get
    val wd = f.streams("WordDocument").clone()
    wd(0) = 0
    assert(DocCodec.extract(CfbCodec.write(Seq(
      "WordDocument" -> wd, "0Table" -> f.streams("0Table")))).isEmpty)
  }

  test("never-throw fuzz: random mutations of real fixtures") {
    val rnd = new scala.util.Random(20260817L)
    (0 until 600).foreach { k =>
      val base = DocFixtures.docDoc(k % 9)
      val mutated = base.clone()
      val flips = 1 + rnd.nextInt(8)
      (0 until flips).foreach { _ =>
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      }
      DocCodec.extract(mutated) // must not throw
      val slice = java.util.Arrays.copyOfRange(
        mutated, 0, 1 + rnd.nextInt(mutated.length))
      DocCodec.extract(slice)
    }
  }
}
