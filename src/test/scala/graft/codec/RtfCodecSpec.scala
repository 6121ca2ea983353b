package graft.codec

import org.scalatest.funsuite.AnyFunSuite

/** [[RtfCodec]] against the [[RtfFixtures]] wire shapes: pinned text
  * per variant (control-word delimiter rules, destination skipping,
  * hex/unicode escapes with fallback skip, symbol words, info
  * sidecar), structural rejections, and the never-throw fuzz sweep
  * (the [[PdfCodecSpec]] doctrine). No Spark session: pure bytes. */
class RtfCodecSpec extends AnyFunSuite {

  private def rtf(s: String): Option[RtfCodec.RtfDoc] =
    RtfCodec.extract(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  test("variant 0: font table skipped, info sidecar, formatting chain") {
    val d = RtfCodec.extract(RtfFixtures.docRtf(0)).get
    assert(d.text == "Rtf body 0 alpha", s"got '${d.text}'")
    assert(d.nParas == 1)
    assert(d.title.contains("Rtf Props 0") && d.author.contains("Writer 0"))
  }

  test("variant 1: two paragraphs, tab, hex escape, unicode fallback skip, no info") {
    val d = RtfCodec.extract(RtfFixtures.docRtf(3)).get
    assert(d.text == "Para one 3\nTab\tcafé plus €done", s"got '${d.text}'")
    assert(d.nParas == 2)
    assert(d.title.isEmpty && d.author.isEmpty)
  }

  test("variant 2: starred destination skipped, group-split word, emdash") {
    val d = RtfCodec.extract(RtfFixtures.docRtf(6)).get
    assert(d.text == "Split6 joined—end", s"got '${d.text}'")
    assert(d.nParas == 1)
    assert(d.title.contains("Split Rtf 6") && d.author.contains("Runs Writer"))
  }

  test("every fixture id matches its declared seed-arithmetic text") {
    (0L until 60L).foreach { id =>
      val d = RtfCodec.extract(RtfFixtures.docRtf(id))
      assert(d.map(_.text).contains(RtfFixtures.docText(id)), s"id=$id")
    }
  }

  test("uc2 skips two fallback chars; uc0 skips none") {
    assert(rtf("{\\rtf1\\uc2 a\\u8364 XYb}").map(_.text).contains("a€b"))
    assert(rtf("{\\rtf1\\uc0 a\\u8364 b}").map(_.text).contains("a€b"))
    // a control word cancels the remaining fallback skip
    assert(rtf("{\\rtf1\\uc2 a\\u8364\\tab b}").map(_.text).contains("a€\tb"))
  }

  test("uc scope is the group: child override pops at close") {
    val d = rtf("{\\rtf1\\uc1 {\\uc2 \\u233 no}\\u233 x rest}")
    // inside child: skip 2 ('n','o'); after close uc back to 1: skip 'x'
    assert(d.map(_.text).contains("éé rest"), s"got ${d.map(_.text)}")
  }

  test("negative unicode parameter wraps mod 65536") {
    assert(rtf("{\\rtf1 a\\u-4096 ?b}").map(_.text).contains("ab"))
  }

  test("escaped braces and backslash are literal; \\~ \\_ \\- map per the pin") {
    assert(rtf("{\\rtf1 a\\{b\\}c\\\\d\\~e\\_f\\-g}")
      .map(_.text).contains("a{b}c\\d e-fg"))
  }

  test("\\line is an in-paragraph newline, \\par a paragraph break") {
    val d = rtf("{\\rtf1 one\\line two\\par three\\par}").get
    assert(d.nParas == 2 && d.text == "one\ntwo\nthree")
  }

  test("\\bin skips raw bytes that may contain braces") {
    val d = rtf("{\\rtf1 a\\bin3 {}\\b}") // 3 raw bytes: '{', '}', '\\'
    assert(d.map(_.text).contains("ab"), s"got ${d.map(_.text)}")
  }

  test("field instruction skipped, field result kept") {
    val d = rtf("{\\rtf1 {\\field{\\*\\fldinst HYPERLINK \"x\"}{\\fldrslt shown}}}")
    assert(d.map(_.text).contains("shown"))
  }

  test("info operator field is neither body text nor title") {
    val d = rtf("{\\rtf1 {\\info{\\title T}{\\operator Op}} body}").get
    assert(d.text == " body" && d.title.contains("T") && d.author.isEmpty)
  }

  test("structural rejections: no header, stray close, truncated hex, unterminated") {
    assert(rtf("not rtf at all").isEmpty)
    assert(rtf("{\\rtfx}").map(_.text).contains("")) // header prefix ok
    assert(RtfCodec.extract(RtfFixtures.corruptRtf(1)).isEmpty)
    assert(rtf("{\\rtf1 bad\\'q9}").isEmpty)
    assert(rtf("{\\rtf1 bad\\'e").isEmpty)
    assert(RtfCodec.extract(null).isEmpty)
    assert(RtfCodec.extract(Array.emptyByteArray).isEmpty)
  }

  test("trailing bytes after the root close are ignored") {
    assert(rtf("{\\rtf1 ok}garbage {\\'zz").map(_.text).contains("ok"))
  }

  test("never-throw fuzz: random mutations of real fixtures") {
    val rnd = new scala.util.Random(20260816L)
    (0 until 1000).foreach { k =>
      val base = RtfFixtures.docRtf(k % 9)
      val mutated = base.clone()
      val flips = 1 + rnd.nextInt(6)
      (0 until flips).foreach { _ =>
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      }
      RtfCodec.extract(mutated) // must not throw; Option either way
      val slice = java.util.Arrays.copyOfRange(
        mutated, 0, 1 + rnd.nextInt(mutated.length))
      RtfCodec.extract(slice)
    }
  }
}
