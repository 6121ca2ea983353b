package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** [[WordPiece]] pins: the likelihood-ratio argmax with the
  * fixed-point score key and lexicographic tie-break (hand-computed
  * goldens where ties are LIVE), merged-symbol prefix algebra, greedy
  * longest-match encoding with the whole-word [UNK] rule, and
  * input-order determinism. */
class WordPieceSpec extends AnyFunSuite {

  private val corpus = Seq(("aab", 10L), ("ab", 5L), ("bb", 3L))

  test("merges: likelihood ratio beats raw count; ties break lexicographically") {
    val m = WordPiece.trainMerges(corpus, 3)
    // step 1: (a,##a) scores 10/150 — the only pair above 1/18
    // step 2: (aa,##b), (a,##b), (b,##b) ALL score exactly 1/18 →
    //         fixed-point keys collide → lexicographic smallest left
    // step 3: (aa,##b) and (b,##b) tie at 1/13 → "aa" < "b"
    assert(m == Seq(("a", "##a", "aa"), ("a", "##b", "ab"),
      ("aa", "##b", "aab")))
  }

  test("merge exhaustion stops early") {
    val m = WordPiece.trainMerges(Seq(("ab", 1L)), 10)
    assert(m == Seq(("a", "##b", "ab")))
  }

  test("input order never changes the merge table") {
    val base = WordPiece.trainMerges(corpus, 3)
    val rnd = new scala.util.Random(7L)
    (0 until 20).foreach { _ =>
      assert(WordPiece.trainMerges(rnd.shuffle(corpus), 3) == base)
    }
  }

  test("encode: greedy longest match, continuation prefixes, UNK collapse") {
    val m = WordPiece.trainMerges(corpus, 3)
    val v = WordPiece.vocab(corpus, m)
    assert(v == Set("a", "##a", "##b", "b", "aa", "ab", "aab"))
    def enc(w: String) = WordPiece.encodeWord(w, v, 3)
    assert(enc("aab") == Seq("aab"))
    assert(enc("abb") == Seq("ab", "##b"))
    assert(enc("ba") == Seq("b", "##a"))
    assert(enc("aaba") == Seq("aab", "##a"))
    // no piece at a position → the WHOLE word is [UNK], no partials
    assert(enc("ac") == Seq(WordPiece.Unk))
    assert(enc("caa") == Seq(WordPiece.Unk))
    assert(enc("") == Seq.empty)
  }

  test("a word spelling '##…' never matches a continuation piece at position 0") {
    val c2 = Seq(("#a", 1L))
    val m2 = WordPiece.trainMerges(c2, 1)
    assert(m2 == Seq(("#", "##a", "#a")))
    val v2 = WordPiece.vocab(c2, m2)
    assert(v2 == Set("#", "##a", "#a"))
    // "##a" raw: pos 0 may match "#" (a real initial piece) but NOT
    // the continuation "##a"; the rest then fails → whole-word UNK
    assert(WordPiece.encodeWord("##a", v2, 2) == Seq(WordPiece.Unk))
    assert(WordPiece.encodeWord("#a", v2, 2) == Seq("#a"))
  }

  test("greedy matches the brute-force longest-prefix walk on random words") {
    val m = WordPiece.trainMerges(corpus, 3)
    val v = WordPiece.vocab(corpus, m)
    def brute(w: String): Seq[String] = {
      var pos = 0
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      while (pos < w.length) {
        val cands = (1 to (w.length - pos)).reverse.iterator
          .map(l => w.substring(pos, pos + l))
          .filter(b => pos > 0 || !b.startsWith("##"))
          .map(b => if (pos == 0) b else "##" + b)
          .filter(v.contains)
        if (!cands.hasNext) return Seq(WordPiece.Unk)
        val p = cands.next()
        out += p
        pos += (if (p.startsWith("##")) p.length - 2 else p.length)
      }
      out.toSeq
    }
    val rnd = new scala.util.Random(42L)
    (0 until 500).foreach { _ =>
      val w = Array.fill(1 + rnd.nextInt(8))(
        "abc".charAt(rnd.nextInt(3))).mkString
      assert(WordPiece.encodeWord(w, v, 3) == brute(w), s"word '$w'")
    }
  }

  test("fixed-point key separates near-equal ratios the way the pin says") {
    // 10/(10*18) vs 5/(15*18): 1/18 > 1/54 — distinct keys
    val m = WordPiece.trainMerges(Seq(("ab", 9L), ("cb", 1L)), 1)
    // counts: a:9 c:1 ##b:10; pairs (a,##b):9 → 9/90=0.1,
    // (c,##b):1 → 1/10=0.1 — EXACT tie at different counts →
    // lexicographic: (a,##b) wins
    assert(m.head._1 == "a" && m.head._2 == "##b")
  }
}
