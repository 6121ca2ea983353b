package graft.expressions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** [[IdnImpl]] against the RFC 3492 §7.1 sample vectors (the
  * published conformance strings, lowercased to match the host pin),
  * host-level ACE pins cross-checked against an independent RFC 3492
  * implementation (CPython's punycode codec), encode↔decode
  * round-trip fuzz over multi-script labels, and the hostile-input
  * edges. */
class IdnSpec extends AnyFunSuite {

  private def cps(s: String): Array[Int] = s.codePoints().toArray

  private val Rfc3492Vectors = Seq(
    ("ليهمابتكلموشعربي؟", "egbpdaj6bu4bxfgehfvwxn"), // A: Arabic (Egyptian)
    ("他们为什么不说中文", "ihqwcrb4cv8a8dqg056pqjye"), // B: Chinese (simplified)
    ("他們爲什麽不說中文", "ihqwctvzc91f659drss3x8bo0yb"), // C: Chinese (traditional)
    ("pročprostěnemluvíčesky", "proprostnemluvesky-uyb24dma41a"), // D: Czech
    ("למההםפשוטלאמדבריםעברית", "4dbcagdahymbxekheh6e0a7fei0b"), // E: Hebrew
    ("почемужеонинеговорятпорусски", "b1abfaaepdrnnbgefbadotcwatmq2g4l"), // I: Russian
    ("なぜみんな日本語を話してくれないのか", "n8jok5ay5dzabd5bym9f0cm5685rrjetr6pdxa"), // K: Japanese
    ("3年b組金八先生", "3b-ww4c5e180e575a65lsy2b"), // L-style mixed ASCII+CJK
    ("a😀b", "ab-no82a")) // supplementary-plane code point

  test("RFC 3492 sample vectors encode exactly") {
    Rfc3492Vectors.foreach { case (u, p) =>
      assert(IdnImpl.punyEncode(cps(u)) == p, s"encode '$u'")
    }
  }

  test("RFC 3492 sample vectors decode exactly") {
    Rfc3492Vectors.foreach { case (u, p) =>
      assert(IdnImpl.punyDecode(p).sameElements(cps(u)), s"decode '$p'")
    }
  }

  test("host ACE pins: the web_idn_hosts oracle constants") {
    def ace(h: String) = Option(IdnImpl.toAscii(UTF8String.fromString(h)))
      .map(_.toString)
    assert(ace("bücher.example").contains("xn--bcher-kva.example"))
    assert(ace("münchen.example").contains("xn--mnchen-3ya.example"))
    assert(ace("例え.example").contains("xn--r8jz45g.example"))
    assert(ace("испытание.example").contains("xn--80akhbyknj4f.example"))
    assert(ace("ñandú.example").contains("xn--and-6ma2c.example"))
    assert(ace("plain.example").contains("plain.example"))
    // uppercasing and pre-encoded spellings converge on the same key
    assert(ace("BÜCHER.example").contains("xn--bcher-kva.example"))
    assert(ace("xn--bcher-kva.EXAMPLE").contains("xn--bcher-kva.example"))
  }

  test("toUnicode recovers the display form; fake xn-- labels are null") {
    def uni(h: String) = Option(IdnImpl.toUnicode(UTF8String.fromString(h)))
      .map(_.toString)
    assert(uni("xn--bcher-kva.example").contains("bücher.example"))
    assert(uni("xn--80akhbyknj4f.example").contains("испытание.example"))
    assert(uni("plain.example").contains("plain.example"))
    assert(uni("xn--zzzzzzzzzzzzz!!!.example").isEmpty)
  }

  test("encode-decode round-trip over deterministic multi-script labels") {
    val rnd = new scala.util.Random(3492L)
    val pools = Seq(
      ('a' to 'z').map(_.toInt),
      (0x430 to 0x44F).map(identity), // Cyrillic
      (0x3B1 to 0x3C9).map(identity), // Greek
      (0x4E00 to 0x4E80).map(identity), // CJK slice
      (0x1F600 to 0x1F610).map(identity)) // emoji (supplementary)
    (0 until 500).foreach { k =>
      val len = 1 + rnd.nextInt(12)
      val label = Array.fill(len) {
        val pool = pools(rnd.nextInt(pools.length))
        pool(rnd.nextInt(pool.length))
      }
      if (label.exists(_ >= 128)) {
        val enc = IdnImpl.punyEncode(label)
        assert(enc != null, s"case $k must encode")
        assert(enc.forall(_ < 128), "ACE output must be ASCII")
        val back = IdnImpl.punyDecode(enc)
        assert(back != null && back.sameElements(label), s"case $k round-trip")
      }
    }
  }

  test("structural edges: empty host, oversized label, all-basic label") {
    assert(IdnImpl.toAscii(UTF8String.fromString("")) == null)
    val big = "ü" * 300 + ".example"
    assert(IdnImpl.toAscii(UTF8String.fromString(big)) == null)
    // an all-ASCII label through punyEncode keeps the trailing dash
    // convention (basic codepoints + '-'), but toAscii never routes
    // ASCII labels there — pass-through is pinned instead
    assert(Option(IdnImpl.toAscii(UTF8String.fromString("Mixed.Example")))
      .map(_.toString).contains("mixed.example"))
  }
}
