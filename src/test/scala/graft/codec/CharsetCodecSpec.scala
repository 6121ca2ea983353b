package graft.codec

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the charset front gate: the windows-1252 table against
  * java.nio's independent decoder (a table typo cannot hide behind a
  * symmetric encode bug), the WHATWG sniff precedence (BOM > meta >
  * UTF-8 validity > 0x80-0x9F heuristic), strict RFC 3629 validation
  * edges, encode/decode round trips, and the frame-level operator. */
class CharsetCodecSpec extends SparkSpec {

  test("single-byte decode matches java.nio for all 256 bytes (cp1252 + latin-1)") {
    // the five cells CP1252.TXT leaves undefined: WHATWG (and this
    // decoder) pass them through as their C1 controls; java.nio yields
    // U+FFFD — pin our choice explicitly, cross-check java on the rest
    val undefinedCells = Set(0x81, 0x8D, 0x8F, 0x90, 0x9D)
    (0 until 256).foreach { x =>
      val b = Array(x.toByte)
      if (undefinedCells(x))
        assert(CharsetCodec.decode(Array(0x93.toByte) ++ b)._2.drop(1) == x.toChar.toString,
          f"undefined cp1252 cell $x%02x passes through as C1")
      else
        assert(CharsetCodec.decode(Array(0x93.toByte) ++ b)._2.drop(1) ==
          new String(b, "windows-1252"), f"cp1252 byte $x%02x")
      // latin-1 path: prefix byte 0xA0 avoids the cp1252 heuristic only
      // when x itself is outside 0x80-0x9F
      if (x < 0x80 || x > 0x9F)
        assert(CharsetCodec.decode(Array(0xE9.toByte) ++ b)._2.drop(1) ==
          new String(b, "ISO-8859-1"), f"latin-1 byte $x%02x")
    }
  }

  test("sniff precedence: BOM > meta > utf-8 validity > high-byte heuristic") {
    assert(CharsetCodec.decode("\uFEFFhi".getBytes("UTF-8")) == ("utf-8", "hi"))
    assert(CharsetCodec.decode(CharsetCodec.encode("héllo ✓", "utf-16le")) ==
      ("utf-16le", "héllo ✓"))
    assert(CharsetCodec.decode(CharsetCodec.encode("héllo ✓", "utf-16be")) ==
      ("utf-16be", "héllo ✓"))
    // meta declaration wins over byte heuristics
    val metaLatin = CharsetCodec.encode(
      "<html><head><meta charset=\"iso-8859-1\"></head><body>résumé</body></html>",
      "iso-8859-1")
    assert(CharsetCodec.decode(metaLatin) ==
      ("iso-8859-1",
        "<html><head><meta charset=\"iso-8859-1\"></head><body>résumé</body></html>"))
    val httpEquiv = CharsetCodec.encode(
      "<meta http-equiv=\"Content-Type\" content=\"text/html; charset=windows-1252\">€",
      "windows-1252")
    assert(CharsetCodec.decode(httpEquiv)._1 == "windows-1252")
    // unknown label falls through to the heuristic (valid utf-8 here)
    assert(CharsetCodec.decode("<meta charset=\"klingon\">café".getBytes("UTF-8")) ==
      ("utf-8", "<meta charset=\"klingon\">café"))
    // valid multi-byte utf-8, no declaration
    assert(CharsetCodec.decode("déjà — €".getBytes("UTF-8")) == ("utf-8", "déjà — €"))
    // invalid utf-8 with a 0x80-0x9F byte: windows-1252
    assert(CharsetCodec.decode(Array('a'.toByte, 0x80.toByte)) == ("windows-1252", "a€"))
    // invalid utf-8, high bytes only outside the C1 block: latin-1
    assert(CharsetCodec.decode(Array('a'.toByte, 0xE9.toByte)) == ("iso-8859-1", "aé"))
    assert(CharsetCodec.decode(Array.emptyByteArray) == ("utf-8", ""))
  }

  test("transport-layer hint: BOM > Content-Type charset > meta > heuristic") {
    assert(CharsetCodec.contentTypeLabel("text/html; charset=windows-1252") ==
      Some("windows-1252"))
    assert(CharsetCodec.contentTypeLabel("text/html; charset=\"ISO-8859-1\"") ==
      Some("iso-8859-1"))
    assert(CharsetCodec.contentTypeLabel("text/html") == None)
    assert(CharsetCodec.contentTypeLabel("text/html; charset=klingon") == None)
    // hint relabels a pure-ASCII body the heuristic would call utf-8
    assert(CharsetCodec.decode("plain ascii".getBytes("UTF-8"),
      Some("windows-1252")) == ("windows-1252", "plain ascii"))
    // hint outranks an in-body meta declaration
    val conflicted = CharsetCodec.encode("<meta charset=utf-8>résumé", "iso-8859-1")
    assert(CharsetCodec.decode(conflicted, Some("iso-8859-1")) ==
      ("iso-8859-1", "<meta charset=utf-8>résumé"))
    // a BOM outranks the hint
    assert(CharsetCodec.decode("\uFEFFhi".getBytes("UTF-8"),
      Some("windows-1252")) == ("utf-8", "hi"))
  }

  test("strict utf-8 validation: overlongs, surrogates, ceiling, truncation") {
    def v(xs: Int*) = CharsetCodec.isValidUtf8(xs.map(_.toByte).toArray)
    assert(v('a', 0xC3, 0xA9))                 // é
    assert(v(0xE2, 0x82, 0xAC))                // €
    assert(v(0xF0, 0x9F, 0x98, 0x80))          // astral
    assert(!v(0xC0, 0xAF), "overlong 2-byte")
    assert(!v(0xC1, 0xBF), "overlong 2-byte")
    assert(!v(0xE0, 0x80, 0xAF), "overlong 3-byte")
    assert(!v(0xED, 0xA0, 0x80), "surrogate")
    assert(v(0xED, 0x9F, 0xBF), "U+D7FF ok")
    assert(!v(0xF0, 0x8F, 0xBF, 0xBF), "overlong 4-byte")
    assert(!v(0xF4, 0x90, 0x80, 0x80), "above U+10FFFF")
    assert(v(0xF4, 0x8F, 0xBF, 0xBF), "U+10FFFF ok")
    assert(!v(0xE2, 0x82), "truncated")
    assert(!v(0x80), "bare continuation")
    assert(!v(0xF5, 0x80, 0x80, 0x80), "lead above F4")
  }

  test("fixMojibake: inverts utf-8-as-cp1252, leaves clean text alone") {
    def moji(s: String) = CharsetCodec.decodeAs(s.getBytes("UTF-8"), "windows-1252")
    // the classic corruptions invert exactly
    Seq("café", "déjà — “quoted” €9", "naïve résumé", "touché ✓").foreach { orig =>
      val (fixed, was) = CharsetCodec.fixMojibake(moji(orig))
      assert(was && fixed == orig, s"'$orig' (moji '${moji(orig)}')")
    }
    // clean text passes through: ASCII, genuine accents, genuine cp1252
    // punctuation — none of these form valid multi-byte utf-8 as bytes
    Seq("plain ascii", "café naïve", "price — “quoted”", "").foreach { s =>
      assert(CharsetCodec.fixMojibake(s) == (s, false), s"'$s'")
    }
    // text with chars outside the single-byte repertoire is never touched
    assert(CharsetCodec.fixMojibake("汉字 Ã©") == ("汉字 Ã©", false))
    // double-corruption repairs ONE layer per call (deterministic depth)
    val (once, w1) = CharsetCodec.fixMojibake(moji(moji("café")))
    assert(w1 && once == moji("café"))
    assert(CharsetCodec.fixMojibake(once) == ("café", true))
  }

  test("CJK legacy charsets: labeled round trips, density quarantine, strict validation") {
    val samples = Seq(
      "shift_jis" -> "日本語のテスト文書です。東京都渋谷区",
      "gbk"       -> "中文测试文档汉字编码与处理",
      "euc-kr"    -> "한국어 테스트 문서 인코딩",
      "big5"      -> "繁體中文測試文件編碼",
      "euc-jp"    -> "日本語のテキスト処理")
    samples.foreach { case (cs, text) =>
      val b = CharsetCodec.encode(text, cs)
      // a transport hint (raw OR canonical spelling) decodes exactly
      assert(CharsetCodec.decode(b, Some(cs)) == ((cs, text)), s"$cs hint")
      // the old failure mode stays dead — unlabeled CJK bytes never
      // take the windows-1252 / latin-1 labels — and content detection
      // now RECOVERS them: each sample validates and reads plausible
      // in exactly one family, so the verdict is the true charset and
      // the exact text, not the quarantine
      assert(CharsetCodec.decode(b) == ((cs, text)),
        s"unlabeled $cs bytes must content-detect to $cs")
    }
    // WHATWG label aliases normalize
    assert(CharsetCodec.decode(CharsetCodec.encode("漢字", "shift_jis"),
      Some("x-sjis"))._1 == "shift_jis")
    assert(CharsetCodec.decode(CharsetCodec.encode("汉字", "gbk"),
      Some("GB2312"))._1 == "gbk")
    assert(CharsetCodec.decode(CharsetCodec.encode("한글", "euc-kr"),
      Some("ks_c_5601-1987"))._1 == "euc-kr")
    // a meta declaration carries the label too
    val metaSjis = "<meta charset=shift_jis>日本語ページ"
    val mb = CharsetCodec.encode(metaSjis, "shift_jis")
    assert(CharsetCodec.decode(mb) == (("shift_jis", metaSjis)))
    // a DECLARED CJK label whose bytes fail strict validation is the
    // unknown verdict, not replacement-character soup
    assert(CharsetCodec.decode(Array(0x82.toByte), Some("shift_jis")) ==
      (("unknown", "")), "truncated lead byte")
    val cp1252Bytes = CharsetCodec.encode("price €9 – “quoted” here", "windows-1252")
    assert(CharsetCodec.decode(cp1252Bytes, Some("gbk"))._1 == "unknown",
      "cp1252 text mislabeled gbk fails validation")
    // an unrecognized label: utf-8 when the bytes independently
    // validate (garbage labels on real utf-8 are common), else unknown
    assert(CharsetCodec.decode("café utf-8 body text".getBytes("UTF-8"),
      Some("x-mac-cyrillic"))._1 == "utf-8")
    assert(CharsetCodec.decode(cp1252Bytes, Some("x-mac-cyrillic"))._1 == "unknown")
    // forced decodeAs stays total (U+FFFD replacement)
    val forced = CharsetCodec.decodeAs(Array(0x82.toByte), "shift_jis")
    assert(forced == "�")
    // unencodable text raises under the fixture doctrine
    intercept[IllegalArgumentException] { CharsetCodec.encode("한글", "shift_jis") }
  }

  test("content detection: language-signal gate blocks every measured false-positive channel") {
    // The KOI8-R channel: Cyrillic bytes 0xC0-0xDF are VALID shift_jis
    // (a run of single-byte half-width katakana), so a naive
    // exactly-one-validates sweep would decode Russian as kana soup.
    // The kana-dominance rule (full-width kana >= 25% of non-ASCII)
    // rejects it: half-width kana are allowed but carry no signal.
    val ru = CharsetCodec.encode("данные и ещё данные плюс текст про погоду", "koi8-r")
    assert(CharsetCodec.detectMultiByte(ru).isEmpty, "koi8-r must not detect as shift_jis")
    // … and since round 14 the single-byte sweep then attributes the
    // page CORRECTLY instead of quarantining it
    assert(CharsetCodec.decode(ru) ==
      (("koi8-r", "данные и ещё данные плюс текст про погоду")))
    // The Thai channel: cp874 bytes form valid euc-jp pairs landing in
    // kana/symbol rows — the kana rule kills the euc-jp claim, then the
    // single-byte sweep recovers the page as windows-874
    assert(CharsetCodec.decode(
      CharsetCodec.encode("เอกสารทดสอบภาษาไทยที่นี่และที่นั่น", "windows-874"))._1 == "windows-874")
    // The Han-soup channel: EUC-KR Hangul decoded as GBK is a valid
    // all-Han string, but random Han hits the top-frequency head at
    // ~0.5%, far under the >= 10% bar real Chinese clears.
    val ko = CharsetCodec.encode("한국어 테스트 문서 인코딩 확인", "euc-kr")
    assert(CharsetCodec.detectMultiByte(ko).contains("euc-kr"))
    // AMBIGUITY quarantines: these GBK bytes read as plausible Chinese
    // under BOTH gbk (top-simplified head) and big5 (the pivot chars
    // decode into top-traditional) — exactly-one means neither wins.
    val amb = CharsetCodec.encode("的一是不琌璶瓣產", "gbk")
    assert(CharsetCodec.detectMultiByte(amb).isEmpty, "two plausible families must tie out")
    assert(CharsetCodec.decode(amb)._1 == "unknown")
    // Too short to judge: 7 non-ASCII chars stays below the statistic
    // floor even when one family would validate.
    assert(CharsetCodec.detectMultiByte(CharsetCodec.encode("日本語のテスト", "shift_jis")).isEmpty)
  }

  test("label precedence: invalid transport label falls through to meta; mislabels rescue") {
    // garbage Content-Type charset must not shadow a recognized meta
    // declaration (WHATWG: an invalid label is no label)
    val metaRu = "<meta charset=windows-1251>Русская страница с текстом"
    val mb = CharsetCodec.encode(metaRu, "windows-1251")
    assert(CharsetCodec.decode(mb, Some("x-user-defined")) == (("windows-1251", metaRu)),
      "invalid transport label + valid meta label must decode via meta")
    // both labels garbage + non-UTF-8 bytes: detection gets the last
    // shot (kana-dominant shift_jis recovers)
    val ja = "日本語のテスト文書です。東京都渋谷区"
    assert(CharsetCodec.decode(CharsetCodec.encode(ja, "shift_jis"),
      Some("x-user-defined")) == (("shift_jis", ja)))
    // a declared CJK label whose bytes fail strict validation but
    // content-detect uniquely as ANOTHER family decodes as the
    // detected one (mislabeled legacy pages are common). Shift-JIS
    // kana text carries 0x82/0x83 lead bytes, which can never be an
    // EUC-KR lead (EUC leads are 0xA1-0xFE), so the declared decode
    // fails strict by construction and the rescue path must fire.
    val sjText = "日本語のテスト文書です。東京都渋谷区"
    val sjBytes = CharsetCodec.encode(sjText, "shift_jis")
    assert(CharsetCodec.decode(sjBytes, Some("euc-kr")) == (("shift_jis", sjText)),
      "euc-kr-labeled shift_jis page rescues to shift_jis")
  }

  test("single-byte legacy family: Cyrillic/Greek/Turkish/CE labels decode exactly") {
    // third column: the UNLABELED verdict — since round 14 the
    // single-byte content sweep recovers dense non-Latin pages (the
    // Cyrillic rows attribute their exact map; the Greek letter grid is
    // identical in windows-1253 and iso-8859-7, so equal-text ties
    // collapse to windows-1253); the LATIN legacy rows stay quarantined
    // by design — accented-Latin prose is statistically too close to
    // the windows-1252 fallback, and a wrong accent map is the quieter
    // mojibake
    val samples = Seq(
      ("windows-1251", "Русский текст для проверки кодировки", "windows-1251"),
      ("koi8-r",       "Советская кодировка работает", "koi8-r"),
      ("iso-8859-7",   "Ελληνικό κείμενο δοκιμής", "windows-1253"),
      ("windows-1254", "Türkçe metin: ğüşıöç ĞÜŞİÖÇ", "unknown"),
      ("iso-8859-2",   "Příliš žluťoučký kůň úpěl ódy", "unknown"),
      ("windows-1256", "نص عربي للاختبار", "windows-1256"),
      ("iso-8859-15",  "prix 9€ œuvre straße", "unknown"))
    samples.foreach { case (cs, text, unlabeled) =>
      val b = CharsetCodec.encode(text, cs)
      assert(CharsetCodec.decode(b, Some(cs)) == ((cs, text)), s"$cs hint round trip")
      if (b.count(x => (x & 0xFF) >= 0x80) * 4 >= b.length) {
        val got = CharsetCodec.decode(b)
        assert(got._1 == unlabeled, s"$cs unlabeled: got ${got._1}")
        if (unlabeled != "unknown")
          assert(got._2 == text, s"$cs unlabeled text must decode exactly")
      }
    }
    // aliases from the WHATWG registry normalize
    assert(CharsetCodec.decode(CharsetCodec.encode("кто", "windows-1251"),
      Some("cp1251"))._1 == "windows-1251")
    assert(CharsetCodec.decode(CharsetCodec.encode("abc", "iso-8859-2"),
      Some("latin2"))._1 == "iso-8859-2")
    assert(CharsetCodec.decode(CharsetCodec.encode("ได", "windows-874"),
      Some("tis-620"))._1 == "windows-874")
    // strictness holds for the single-byte family too: KOI8-R is total,
    // but a charset with unmapped cells REPORTs into the unknown verdict
    assert(CharsetCodec.decode(Array(0xAA.toByte, 0x20, 0x41, 0x42, 0x43).map(_.toByte),
      Some("windows-1253"))._1 == "unknown",
      "0xAA is unmapped in windows-1253: strict decode quarantines")
  }

  test("encode round trips + unencodable raises") {
    val s1252 = "price €9 – “quoted” naïve"
    assert(CharsetCodec.decode(CharsetCodec.encode(s1252, "windows-1252")) ==
      ("windows-1252", s1252))
    val slat = "plain ASCII café ñ" // no 0x80-0x9F bytes: heuristic says cp1252? no — latin-1
    assert(CharsetCodec.decode(CharsetCodec.encode(slat, "iso-8859-1"))._2 == slat)
    intercept[IllegalArgumentException] {
      CharsetCodec.encode("snowman ☃", "windows-1252")
    }
    intercept[IllegalArgumentException] {
      CharsetCodec.encode("euro €", "iso-8859-1")
    }
  }

  test("degenerate payloads: BOM-only, odd utf-16, 1-byte, meta past the window") {
    // a bare BOM is an empty utf-8 document, not an error
    assert(CharsetCodec.decode(Array(0xEF, 0xBB, 0xBF).map(_.toByte)) == ("utf-8", ""))
    // utf-16le BOM + odd trailing byte: java's decoder yields U+FFFD for
    // the dangling half — deterministic, never a crash
    val odd = Array(0xFF, 0xFE, 0x41, 0x00, 0x42).map(_.toByte)
    val (cs, t) = CharsetCodec.decode(odd)
    assert(cs == "utf-16le" && t.startsWith("A") && t.length == 2)
    // single bytes hit every heuristic branch without range errors
    assert(CharsetCodec.decode(Array('a'.toByte)) == ("utf-8", "a"))
    assert(CharsetCodec.decode(Array(0x93.toByte))._1 == "windows-1252")
    assert(CharsetCodec.decode(Array(0xE9.toByte))._1 == "iso-8859-1")
    // a meta declaration past the 1024-byte sniff window is not seen:
    // the body is valid utf-8, so the validity branch wins
    val farMeta = ("x" * 1200 + "<meta charset=\"iso-8859-1\">café").getBytes("UTF-8")
    assert(CharsetCodec.decode(farMeta)._1 == "utf-8")
    // ...but inside the window it is
    val nearMeta = ("x" * 100 + "<meta charset=\"iso-8859-1\">caf").getBytes("UTF-8")
    assert(CharsetCodec.decode(nearMeta)._1 == "iso-8859-1")
  }

  test("frame operator: mixed-encoding payloads decode to one text column") {
    import spark.implicits._
    val rows = Seq(
      (0L, CharsetCodec.encode("utf-8 déjà ✓", "utf-8")),
      (1L, CharsetCodec.encode("utf-16 ∑", "utf-16le")),
      (2L, CharsetCodec.encode("cp1252 € “q”", "windows-1252")),
      (3L, CharsetCodec.encode("<meta charset=latin-1>résumé", "iso-8859-1")),
      (4L, null))
    val decoded = graft.operators.TextOps
      .decodeCharset(rows.toDF("id", "blob"), "blob", "cs", "t")
    val got = decoded
      .select("id", "cs", "t").as[(Long, String, String)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (0L, "utf-8", "utf-8 déjà ✓"),
      (1L, "utf-16le", "utf-16 ∑"),
      (2L, "windows-1252", "cp1252 € “q”"),
      (3L, "iso-8859-1", "<meta charset=latin-1>résumé"),
      (4L, "utf-8", "")))
    // columnar posture: the gate runs over EVERY crawled document and
    // must stay inside the columnar pipeline, not an RDD hop (on this
    // tiny local relation Catalyst may even constant-fold the whole
    // decode at plan time — LocalTableScan — which is the strongest
    // form of "not an RDD hop")
    val plan = decoded.queryExecution.executedPlan.toString
    assert(!plan.contains("ExistingRDD"),
      s"decodeCharset must stay columnar, plan was:\n$plan")
  }

  test("content detection property: never attributes bytes to the WRONG family (seeded fuzz)") {
    // The detector's contract is asymmetric: missing a page (stays
    // unknown, quarantined, recoverable) is acceptable; decoding it as
    // a DIFFERENT charset (silent mojibake in the corpus) is not. Fuzz
    // script-realistic texts under a fixed seed: for multi-byte
    // sources the verdict must be the true family or None; for
    // single-byte sources it must always be None.
    val rnd = new scala.util.Random(0xC0FFEE)
    def pick(alphabet: String, n: Int, spaceEvery: Int): String =
      (0 until n).map { i =>
        if (spaceEvery > 0 && i % spaceEvery == spaceEvery - 1) ' '
        else alphabet(rnd.nextInt(alphabet.length))
      }.mkString
    val hira = (0x3042 to 0x3093).map(_.toChar).mkString
    val kata = (0x30A2 to 0x30F3).map(_.toChar).mkString
    val hanCommon = "日本語文書東京都渋谷区天気晴気温度予定連絡中文測試文件編碼處理程序简体书写较长测试文档北京市海淀区安排通知大家"
    val hangul = (0 until 80).map(i => (0xAC00 + i * 137).toChar).mkString
    val cyr = ('а' to 'я').mkString + "ёЁАБВГДЕЖЗ"
    val greek = ('α' to 'ω').mkString + "ΑΒΓΔΕΖΗΘ"
    val thai = (0x0E01 to 0x0E2E).map(_.toChar).mkString
    val arabic = (0x0621 to 0x063A).map(_.toChar).mkString
    // ja: kana-dominant with Han sprinkled (the real mix)
    def jaText() = pick(hira + kata + hira, 40, 9) + pick(hanCommon, 8, 0)
    def zhText() = pick(hanCommon, 40, 11)
    def koText() = pick(hangul, 40, 7)
    for (trial <- 1 to 40) {
      val cases = Seq(
        ("shift_jis", jaText()), ("euc-jp", jaText()),
        ("gbk", zhText()), ("big5", "繁體中文測試文件編碼處理" + pick("繁體中文測試文件編碼處理", 20, 0)),
        ("euc-kr", koText()))
      cases.foreach { case (cs, text) =>
        val b = try CharsetCodec.encode(text, cs)
        catch { case _: IllegalArgumentException => Array.emptyByteArray } // unencodable draw: skip
        if (b.nonEmpty) {
          val got = CharsetCodec.detectMultiByte(b)
          assert(got.isEmpty || got.contains(cs),
            s"trial $trial: $cs bytes detected as $got — wrong-family attribution")
        }
      }
      Seq(("koi8-r", cyr), ("windows-1251", cyr), ("iso-8859-7", greek),
        ("windows-874", thai), ("windows-1256", arabic)).foreach { case (cs, alpha) =>
        val text = pick(alpha, 40, 8)
        val b = try CharsetCodec.encode(text, cs)
        catch { case _: IllegalArgumentException => Array.emptyByteArray }
        if (b.nonEmpty) {
          val got = CharsetCodec.detectMultiByte(b)
          assert(got.isEmpty,
            s"trial $trial: single-byte $cs bytes detected as $got — a false-positive channel")
        }
      }
    }
  }
  test("single-byte detection property: never attributes bytes to the WRONG map (seeded fuzz)") {
    // Same asymmetric contract as the multi-byte fuzz: None (quarantine,
    // recoverable) is acceptable; attribution to a DIFFERENT map (silent
    // scramble-mojibake) is not. Texts are built from real word pools —
    // the bigram/structure gates key on how each script is actually
    // written, so letter-soup (which the multi-byte fuzz uses) would
    // only ever exercise the None path.
    val rnd = new scala.util.Random(0xBEEF14)
    val ruWords = ("и в не на что он как это по но они мы из у за от так о для мочь " +
      "человек год время дело жизнь день рука работа слово место вопрос страна мир дом " +
      "друг сторона россия город вода отец конец голос море новый большой должен есть быть " +
      "весь этот свой наш который когда другой после первый сказать говорить знать стать " +
      "думать видеть хотеть пойти просто очень тоже только ещё уже")
      .split(" ").toIndexedSeq
    val elWords = ("και το να του την της με για είναι από στο δεν θα ότι αυτό όπως αλλά " +
      "μια ένα στην κατά μετά χώρα χρόνια μέρα λόγο θέμα ζωή κόσμος τρόπο στιγμή παιδιά " +
      "νερό σπίτι πόλη μεγάλη καλό νέο πρώτη τελευταία κάθε όλοι εμείς εσείς λέει κάνει " +
      "έχει ήταν είχε μπορεί πρέπει γίνει δούμε πάμε εδώ εκεί τώρα σήμερα αύριο ελληνικό")
      .split(" ").toIndexedSeq
    val heWords = ("של את על לא זה הוא היא אני אתה אנחנו הם מה מי יש אין כל גם רק עוד " +
      "אבל אם כי או שלו שלה שלנו בית ספר יום שנה עיר ארץ עולם דבר איש אישה ילד מים לב " +
      "ראש יד דרך מקום זמן פעם חיים עבודה מילה שפה טקסט בדיקה עברית")
      .split(" ").toIndexedSeq
    val arWords = ("في من على إلى عن مع هذا هذه ذلك التي الذي كان كانت يكون لا ما لم لن " +
      "قد كل بعض غير بين عند منذ حتى إذا لكن ثم أو بل يوم سنة وقت مكان عمل كلمة لغة نص " +
      "اختبار عربي بيت مدينة بلد عالم ماء قلب رأس يد طريق حياة ناس رجل امرأة ولد")
      .split(" ").toIndexedSeq
    val thChunks = ("ที่ และ ของ ใน เป็น มี ไม่ ได้ ให้ จะ มา ไป ว่า กับ แล้ว อยู่ คน ปี วัน เวลา " +
      "บ้าน เมือง ประเทศ โลก น้ำ ใจ หัว มือ ทาง ชีวิต งาน คำ ภาษา ข้อความ ทดสอบ ไทย การ ความ")
      .split(" ").toIndexedSeq
    def sentence(pool: IndexedSeq[String], n: Int, sep: String): String =
      (0 until n).map(_ => pool(rnd.nextInt(pool.length))).mkString(sep)
    val families = Seq(
      ("windows-1251", ruWords, " ", Set("windows-1251")),
      ("koi8-r",       ruWords, " ", Set("koi8-r")),
      ("iso-8859-5",   ruWords, " ", Set("iso-8859-5")),
      ("windows-1253", elWords, " ", Set("windows-1253", "iso-8859-7")),
      ("iso-8859-7",   elWords, " ", Set("windows-1253", "iso-8859-7")),
      ("windows-1255", heWords, " ", Set("windows-1255")),
      ("windows-1256", arWords, " ", Set("windows-1256")),
      ("windows-874",  thChunks, "", Set("windows-874")))
    var attributed = 0
    for (trial <- 1 to 40) {
      families.foreach { case (cs, pool, sep, okSet) =>
        val text = sentence(pool, 6 + rnd.nextInt(12), sep)
        val b = try CharsetCodec.encode(text, cs)
        catch { case _: IllegalArgumentException => Array.emptyByteArray }
        if (b.nonEmpty) {
          val got = CharsetCodec.detectSingleByte(b)
          assert(got.isEmpty || okSet.contains(got.get),
            s"trial $trial: $cs bytes detected as $got — wrong-map attribution")
          if (got.isDefined) {
            attributed += 1
            // an in-family verdict must still decode to the SAME text
            assert(CharsetCodec.decode(b)._2 == text,
              s"trial $trial: $cs verdict ${got.get} decoded differently")
          }
        }
      }
      // multi-byte sources must never leak into the single-byte sweep
      val hanoi = Seq(
        ("shift_jis", "日本語の文書をテストします、今日は天気が良いです"),
        ("gbk", "这是一个中文测试文档，今天天气很好，大家都在工作"),
        ("euc-kr", "한국어 문서 테스트입니다 오늘 날씨가 좋습니다"))
      hanoi.foreach { case (cs, text) =>
        val b = CharsetCodec.encode(text, cs)
        assert(CharsetCodec.detectSingleByte(b).isEmpty,
          s"trial $trial: $cs bytes passed a single-byte gate")
      }
    }
    // the sweep must actually RECOVER real pages, not None its way to
    // vacuous safety — demand attribution on the clear majority
    assert(attributed >= 40 * 8 / 2, s"only $attributed/${40 * 8} attributed")
  }
}
