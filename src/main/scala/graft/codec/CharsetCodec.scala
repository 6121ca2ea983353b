package graft.codec

/** Charset sniff + transcode — the missing front gate between a crawl's
  * raw HTTP payload bytes and every text operator behind it
  * ([[graft.operators.TextOps.htmlExtract]] onward): real crawls are
  * 15-25% legacy-encoded, and feeding windows-1252 bytes to a UTF-8
  * reader silently mangles exactly the characters (curly quotes, euro,
  * dashes) that dedup shingles and quality gates then diverge on.
  *
  * Detection precedence (the WHATWG encoding-sniff order, trimmed to
  * the charsets that dominate web corpora):
  *   1. BOM — `EF BB BF` ⇒ utf-8, `FF FE` ⇒ utf-16le, `FE FF` ⇒
  *      utf-16be (the BOM strips; it is a signature, not content);
  *   2. a DECLARED label — transport `Content-Type` hint, else
  *      `<meta … charset=…>` in the first 1024 bytes read through the
  *      ASCII-compatible latin-1 lens. A label the alias table
  *      recognizes wins; a label it does NOT recognize is the
  *      `unknown` verdict (quarantine route) — NOT a silent fall
  *      through to the Latin heuristic, which is exactly how legacy
  *      CJK pages used to decode as windows-1252 soup;
  *   3. strict UTF-8 validation of the whole payload (RFC 3629 ranges:
  *      no overlongs, no surrogates, max U+10FFFF) ⇒ utf-8;
  *   4. else single-byte vs multi-byte triage: when ≥ 25% of the bytes
  *      are high (0x80-0xFF) on a payload of at least 16 bytes, the
  *      page cannot plausibly be Latin text (accents run a few
  *      percent; double-byte CJK runs ≥ 50%) — content detection
  *      ([[detectMultiByte]]: strict-decode sweep + language-signal
  *      plausibility, accept iff exactly one family passes) recovers
  *      the unambiguous CJK pages; the rest is `unknown`, quarantine.
  *      Below the density bar (or too short for density to be a
  *      statistic): any byte in 0x80-0x9F (C1 controls no text uses,
  *      but windows-1252's printable block) ⇒ windows-1252, otherwise
  *      iso-8859-1.
  *
  * Legacy CJK — shift_jis (JDK windows-31j, the MS932 superset real
  * pages use, per WHATWG), gbk (superset of gb2312), euc-kr, big5,
  * euc-jp — decode through the JDK's charset tables under a STRICT
  * decoder (malformed/unmappable ⇒ REPORT): a declared-CJK payload
  * whose bytes do not validate yields the `unknown` verdict rather
  * than replacement-character soup, because unlike the single-byte
  * charsets there is no total deterministic byte→char story to fall
  * back on. `unknown` pages keep their raw bytes and an empty text —
  * the quarantine contract ([[graft.sources.TextSources.writeQuarantine]]
  * is the sink shape).
  *
  * The windows-1252 high block is the fixed 32-entry literal table from
  * the Unicode mapping file (CP1252.TXT); the five undefined cells pass
  * through as their C1 code points — byte-for-byte what `java.nio`'s
  * decoder does, cross-checked in CharsetCodecSpec so a table typo
  * cannot hide behind a symmetric encode bug. */
object CharsetCodec {

  /** windows-1252 bytes 0x80-0x9F → Unicode (CP1252.TXT). */
  private[codec] val Cp1252High: Array[Char] = Array(
    0x20AC, 0x0081, 0x201A, 0x0192, 0x201E, 0x2026, 0x2020, 0x2021,
    0x02C6, 0x2030, 0x0160, 0x2039, 0x0152, 0x008D, 0x017D, 0x008F,
    0x0090, 0x2018, 0x2019, 0x201C, 0x201D, 0x2022, 0x2013, 0x2014,
    0x02DC, 0x2122, 0x0161, 0x203A, 0x0153, 0x009D, 0x017E, 0x0178
  ).map(_.toChar)

  private val Cp1252Rev: Map[Char, Byte] =
    Cp1252High.zipWithIndex.map { case (c, i) => c -> (0x80 + i).toByte }.toMap

  /** Strict RFC 3629 validity: continuation counts, overlong rejection
    * (C0/C1 bare, E0 needs A0-BF, F0 needs 90-BF), surrogate rejection
    * (ED then 80-9F only), ceiling F4 8F. */
  def isValidUtf8(b: Array[Byte], from: Int = 0): Boolean = {
    var i = from
    val n = b.length
    while (i < n) {
      val c = b(i) & 0xFF
      if (c < 0x80) i += 1
      else if (c < 0xC2) return false // bare continuation or overlong lead
      else {
        val (need, lo, hi) = c match {
          case x if x <= 0xDF => (1, 0x80, 0xBF)
          case 0xE0           => (2, 0xA0, 0xBF)
          case 0xED           => (2, 0x80, 0x9F)
          case x if x <= 0xEF => (2, 0x80, 0xBF)
          case 0xF0           => (3, 0x90, 0xBF)
          case x if x <= 0xF3 => (3, 0x80, 0xBF)
          case 0xF4           => (3, 0x80, 0x8F)
          case _              => return false
        }
        if (i + need >= n) return false // truncated sequence
        val f = b(i + 1) & 0xFF
        if (f < lo || f > hi) return false
        var j = 2
        while (j <= need) {
          val x = b(i + j) & 0xFF
          if (x < 0x80 || x > 0xBF) return false
          j += 1
        }
        i += need + 1
      }
    }
    true
  }

  /** Canonical label → JDK charset name for the legacy charsets decoded
    * through the JDK's tables under strict decoders: the CJK
    * double-byte family (shift_jis resolves to windows-31j/MS932 —
    * real shift_jis pages use the Microsoft superset, which is also
    * the mapping WHATWG assigns the label family) plus the non-Latin-1
    * SINGLE-byte family (Cyrillic, Greek, Turkish, Central European,
    * Arabic, Hebrew, Thai — the next ~8% of the legacy web after CJK;
    * single-byte pages with these labels previously fell to the
    * unknown verdict). Strictness still applies: charsets with
    * unmapped cells (koi8, the iso-8859 holes) REPORT and quarantine
    * rather than substitute. */
  private[codec] val LegacyJdk: Map[String, String] = Map(
    "shift_jis" -> "windows-31j",
    "gbk"       -> "GBK",
    "euc-kr"    -> "EUC-KR",
    "big5"      -> "Big5",
    "euc-jp"    -> "EUC-JP",
    "windows-1250" -> "windows-1250",
    "windows-1251" -> "windows-1251",
    "windows-1253" -> "windows-1253",
    "windows-1254" -> "windows-1254", // also the iso-8859-9/latin5 label family, per WHATWG (strict superset)
    "windows-1255" -> "windows-1255",
    "windows-1256" -> "windows-1256",
    "windows-1257" -> "windows-1257",
    "iso-8859-2"   -> "ISO-8859-2",
    "iso-8859-5"   -> "ISO-8859-5",
    "iso-8859-7"   -> "ISO-8859-7",
    "iso-8859-15"  -> "ISO-8859-15",
    "koi8-r"       -> "KOI8-R",
    "koi8-u"       -> "KOI8-U",
    "windows-874"  -> "x-windows-874")

  /** Normalize a declared charset label to one of the supported
    * canonical names; None ⇒ unrecognized (the caller decides between
    * the heuristic — no label at all — and the `unknown` verdict — a
    * label nothing here understands). CJK alias rows follow the WHATWG
    * encoding-label registry. */
  private[codec] def normalizeLabel(raw: String): Option[String] =
    raw.trim.toLowerCase.stripPrefix("\"").stripSuffix("\"") match {
      case "utf-8" | "utf8"                                       => Some("utf-8")
      case "iso-8859-1" | "iso8859-1" | "iso_8859-1" | "latin-1" |
           "latin1" | "l1" | "us-ascii" | "ascii"                 => Some("iso-8859-1")
      case "windows-1252" | "cp1252" | "cp-1252" | "x-cp1252"     => Some("windows-1252")
      case "utf-16" | "utf-16le" | "utf16"                        => Some("utf-16le")
      case "utf-16be"                                             => Some("utf-16be")
      case "shift_jis" | "shift-jis" | "sjis" | "x-sjis" | "ms_kanji" |
           "ms932" | "cp932" | "windows-31j" | "csshiftjis"       => Some("shift_jis")
      case "gbk" | "gb2312" | "gb_2312" | "gb-2312" | "gb_2312-80" |
           "x-gbk" | "chinese" | "csgb2312" | "csiso58gb231280" |
           "iso-ir-58"                                            => Some("gbk")
      case "euc-kr" | "euckr" | "korean" | "ksc_5601" | "ksc5601" |
           "ks_c_5601-1987" | "ks_c_5601-1989" | "csksc56011987" |
           "cseuckr"                                              => Some("euc-kr")
      case "big5" | "big-5" | "x-x-big5" | "cn-big5" | "csbig5"   => Some("big5")
      case "euc-jp" | "eucjp" | "x-euc-jp" |
           "cseucpkdfmtjapanese"                                  => Some("euc-jp")
      case "windows-1250" | "cp1250" | "x-cp1250"                 => Some("windows-1250")
      case "windows-1251" | "cp1251" | "x-cp1251"                 => Some("windows-1251")
      case "windows-1253" | "cp1253" | "x-cp1253"                 => Some("windows-1253")
      case "windows-1254" | "cp1254" | "x-cp1254" | "iso-8859-9" |
           "iso8859-9" | "iso_8859-9" | "latin5" | "l5"           => Some("windows-1254")
      case "windows-1255" | "cp1255" | "x-cp1255"                 => Some("windows-1255")
      case "windows-1256" | "cp1256" | "x-cp1256"                 => Some("windows-1256")
      case "windows-1257" | "cp1257" | "x-cp1257"                 => Some("windows-1257")
      case "iso-8859-2" | "iso8859-2" | "iso_8859-2" | "latin2" |
           "l2" | "csisolatin2" | "iso-ir-101"                    => Some("iso-8859-2")
      case "iso-8859-5" | "iso8859-5" | "iso_8859-5" | "cyrillic" |
           "csisolatincyrillic" | "iso-ir-144"                    => Some("iso-8859-5")
      case "iso-8859-7" | "iso8859-7" | "iso_8859-7" | "greek" |
           "greek8" | "elot_928" | "ecma-118" | "csisolatingreek" |
           "iso-ir-126" | "sun_eu_greek"                          => Some("iso-8859-7")
      case "iso-8859-15" | "iso8859-15" | "iso_8859-15" |
           "latin-9" | "l9" | "csisolatin9"                       => Some("iso-8859-15")
      case "koi8-r" | "koi8" | "koi8_r" | "cskoi8r" | "koi"       => Some("koi8-r")
      case "koi8-u" | "koi8-ru"                                   => Some("koi8-u")
      case "windows-874" | "dos-874" | "tis-620" | "iso-8859-11" |
           "iso8859-11"                                           => Some("windows-874")
      case _                                                      => None
    }

  // ── Content-based multi-byte detection ────────────────────────────
  //
  // The recovery pass for payloads with NO usable declaration (or a
  // declared CJK label whose bytes fail strict validation): strict-
  // decode the payload under every multi-byte family and accept iff
  // EXACTLY ONE candidate both validates and reads as plausible text
  // of that family's script. Strict validity alone is NOT a detector —
  // two measured false-positive channels force the plausibility gate:
  //   * KOI8-R Cyrillic bytes live in 0xC0-0xDF, which shift_jis reads
  //     as a run of VALID single-byte half-width katakana — a naive
  //     exactly-one-validates sweep would decode Russian pages as kana
  //     soup (pinned in CharsetCodecSpec);
  //   * the EUC-style families (gbk / euc-kr / euc-jp / big5) are
  //     mutually byte-compatible over their 0xA1-0xFE × trail grids,
  //     so foreign bytes decode into random-looking Han "soup" that a
  //     script-range check alone calls plausible Chinese.
  // The gate therefore demands the LANGUAGE's own signal, not just the
  // script's: real Japanese is kana-dominated, real Korean is Hangul-
  // syllable-dominated, and real Chinese concentrates on a small head
  // of high-frequency characters (the top-~130 cover >40% of running
  // text per the public Modern-Chinese frequency lists, while Han soup
  // from cross-decoding hits that head at ~0.5%). All thresholds are
  // integer arithmetic — deterministic across JVMs.
  private[codec] val MultiByteFamilies: Seq[String] =
    Seq("shift_jis", "euc-jp", "gbk", "big5", "euc-kr")

  /** Highest-frequency simplified-Chinese characters (public corpus
    * frequency lists); membership, not order, is what the detector
    * uses, so any standard top-~130 head works. */
  private val ZhTopSimplified: Set[Char] =
    ("的一是不了人我在有他这中大来上国个到说们为子和你地出道也时年得就那要下以生会自着去之过家学对可她里后小么心多天而能" +
     "好都然没日于起还发成事只作当想看文无开手十用主行方又如前所本见经头面公同三已老从动两长知民样现分将外但身些与高意进" +
     "此法把被电").toSet

  /** Traditional-Chinese twin of [[ZhTopSimplified]]. */
  private val ZhTopTraditional: Set[Char] =
    ("的一是不了人我在有他這中大來上國個到說們為子和你地出道也時年得就那要下以生會自著去之過家學對可她裡後小麼心多天而能" +
     "好都然沒日於起還發成事只作當想看文無開手十用主行方又如前所本見經頭面公同三已老從動兩長知民樣現分將外但身些與高意進" +
     "此法把被電").toSet

  private def isHan(c: Char): Boolean =
    (c >= 0x4E00 && c <= 0x9FFF) || (c >= 0x3400 && c <= 0x4DBF)
  private def isKana(c: Char): Boolean =
    (c >= 0x3041 && c <= 0x3096) || (c >= 0x30A1 && c <= 0x30FA) || c == 0x30FC
  private def isHangulSyl(c: Char): Boolean = c >= 0xAC00 && c <= 0xD7A3
  private def isJamo(c: Char): Boolean =
    (c >= 0x1100 && c <= 0x11FF) || (c >= 0x3131 && c <= 0x318E)
  private def isHalfKana(c: Char): Boolean = c >= 0xFF61 && c <= 0xFF9F
  private def isCjkPunct(c: Char): Boolean =
    (c >= 0x3000 && c <= 0x303F) || (c >= 0xFF00 && c <= 0xFFEF) ||
    (c >= 0x2010 && c <= 0x2027) || (c >= 0x2030 && c <= 0x205E) ||
    (c >= 0x25A0 && c <= 0x25FF) || (c >= 0x2500 && c <= 0x257F)

  /** Does strictly-decoded `t` read as plausible text of `family`'s
    * language? Every non-ASCII char must sit in the family's allowed
    * blocks (native scripts + CJK punctuation/width forms — one char
    * of Cyrillic-via-GBK or the like rejects), at least 8 non-ASCII
    * chars must exist (below that no statistic is defensible), and the
    * language signal must hold: kana ≥ 25% of non-ASCII for Japanese,
    * Hangul syllables ≥ 60% for Korean (syllables, not bare jamo —
    * EUC-JP kana mis-decoded through EUC-KR lands in the jamo rows),
    * and for Chinese ≥ 8 Han chars of which ≥ 10% are top-frequency
    * (simplified head for gbk, traditional for big5). */
  private def plausibleScript(family: String, t: String): Boolean = {
    var nonAscii = 0; var kana = 0; var hangul = 0; var han = 0; var topHit = 0
    val top = family match {
      case "gbk" => ZhTopSimplified
      case "big5" => ZhTopTraditional
      case _ => null
    }
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      if (c >= 0x80) {
        nonAscii += 1
        val h = isHan(c); val k = isKana(c); val hs = isHangulSyl(c)
        val ok = family match {
          case "shift_jis" | "euc-jp" => h || k || isHalfKana(c) || isCjkPunct(c)
          case "euc-kr"               => h || hs || isJamo(c) || isCjkPunct(c)
          case _                      => h || isCjkPunct(c)
        }
        if (!ok) return false
        if (h) { han += 1; if (top != null && top.contains(c)) topHit += 1 }
        if (k) kana += 1
        if (hs) hangul += 1
      }
      i += 1
    }
    if (nonAscii < 8) false
    else family match {
      case "shift_jis" | "euc-jp" => 4 * kana >= nonAscii
      case "euc-kr"               => 5 * hangul >= 3 * nonAscii
      case _                      => han >= 8 && 10 * topHit >= han
    }
  }

  /** Content-based charset detection: Some(family) iff exactly one
    * multi-byte family strictly validates AND passes the plausibility
    * gate; ties and misses stay None — there is deliberately no
    * best-effort channel, because the caller's alternative (`unknown`
    * + raw-byte quarantine) is recoverable and a wrong charset is
    * not. */
  def detectMultiByte(b: Array[Byte]): Option[String] =
    detectMultiByteDecoded(b).map(_._1)

  /** [[detectMultiByte]] keeping the winner's DECODED text, so the
    * charset-gate hot path pays the 5-family sweep once and never
    * re-decodes the winning family. */
  private[codec] def detectMultiByteDecoded(b: Array[Byte]): Option[(String, String)] = {
    var foundCs: String = null
    var foundText: String = null
    val it = MultiByteFamilies.iterator
    while (it.hasNext) {
      val cs = it.next()
      strictLegacyDecode(b, cs) match {
        case Some(t) if plausibleScript(cs, t) =>
          if (foundCs != null) return None // ambiguous: quarantine honestly
          foundCs = cs; foundText = t
        case _ =>
      }
    }
    if (foundCs == null) None else Some((foundCs, foundText))
  }

  // ── Content-based single-byte detection ───────────────────────────
  //
  // The recovery pass for unlabeled NON-LATIN single-byte pages
  // (Cyrillic / Greek / Hebrew / Arabic / Thai) — the slice of the old
  // quarantine bucket [[detectMultiByte]] cannot touch, because nearly
  // every byte is VALID in every single-byte map: strict decoding
  // disambiguates nothing, so the gate must read the DECODED TEXT.
  // Candidates are the non-Latin script families only — the Latin
  // single-byte family (windows-1250/-1254/-1257, iso-8859-2/-15) is
  // deliberately excluded: accented-Latin prose is statistically too
  // close to the windows-1252 fallback the sparse-high-byte split
  // already applies, and a wrong accent map is quieter mojibake than a
  // wrong script. Three gates stack per candidate, all integer
  // arithmetic:
  //   * ALLOWED BLOCKS, one-strike: every non-ASCII char must be the
  //     script's own letters or common punctuation — one char of
  //     box-drawing, dingbat, or a foreign script rejects (this alone
  //     kills most cross-script scrambles);
  //   * CASE SHAPE (bicameral scripts): lowercase ≥ 2× uppercase —
  //     prose is lowercase-dominated, and the classic confusions flip
  //     case systematically (koi8-r deliberately mirrors lowercase
  //     onto 0xC0-0xDF, so koi8-bytes-as-cp1251 read as all-caps);
  //   * LANGUAGE SIGNAL: for the scripts with a single candidate map,
  //     a top-frequency-letter head (real prose concentrates; scramble
  //     spreads); for Cyrillic — where THREE candidate maps all decode
  //     into the same block and letter-frequency margins are thin — a
  //     top-BIGRAM gate: a wrong map permutes the alphabet, and a
  //     permutation preserves almost no common bigram (~4% survival vs
  //     ~40% in real Russian text; measured in CharsetCodecSpec).
  // Accept iff exactly ONE candidate passes — except candidates whose
  // decoded texts are IDENTICAL (iso-8859-7 and windows-1253 agree on
  // the whole Greek letter grid), which collapse to the first in
  // candidate order: when every passing decode is the same text, there
  // is no wrong choice to make.
  private[codec] val SingleByteFamilies: Seq[String] =
    Seq("windows-1251", "koi8-r", "iso-8859-5",
      "windows-1253", "iso-8859-7",
      "windows-1255", "windows-1256", "windows-874")

  /** Top Russian bigrams (public frequency tables' head, lowercase);
    * membership, not order, is what the detector uses. */
  private val RuBigrams: Set[String] = Set(
    "ст", "но", "то", "на", "ен", "ов", "ни", "ра", "во", "ко",
    "ос", "ре", "ер", "ро", "ол", "ли", "не", "ом", "ка", "ан",
    "ал", "ет", "те", "ор", "од", "ес", "пр", "ат", "ла", "ел",
    "ия", "ит", "ны", "ти", "ин", "го", "ва", "по", "от", "ас",
    "ть", "ми", "ое", "ис", "та", "ем", "ле", "ме", "ог", "ск",
    "до", "ло", "же", "да", "де", "бо", "бе", "ез", "ий", "ки",
    "ру", "ус", "ив", "ые", "ая", "ей", "им", "он", "за", "из",
    "ак", "ок", "ве", "ри", "об", "со", "ед", "ма", "ян", "ви",
    "ча", "мо", "са", "ую", "сь", "ся", "ав", "ых", "ву", "ны")

  /** Top Greek bigrams (tonos folded to base vowels, ς to σ): like
    * Cyrillic, the Greek gate is bigram-based — a letter-frequency head
    * over ~25 lowercase letters leaves too thin a margin against
    * lowercase scrambles from other single-byte maps (measured:
    * Hebrew-bytes-as-cp1253 hit a 22-char head at ~60%). */
  private val GrBigrams: Set[String] = Set(
    "αι", "τα", "ου", "το", "ον", "ος", "ης", "αν", "ει", "τη",
    "ην", "να", "εν", "ερ", "ρα", "ρο", "σε", "ασ", "ατ", "ια",
    "ετ", "με", "εσ", "ντ", "στ", "ισ", "ικ", "οι", "ες", "ως",
    "απ", "πο", "ρι", "λα", "λο", "αλ", "ελ", "ολ", "αρ", "ορ",
    "ιν", "ιο", "κα", "γι", "γα", "σα", "σο", "τε", "τι", "κο",
    "κε", "δι", "δε", "θε", "μα", "μο", "νο", "πε", "πα", "λε",
    "λι", "λη", "νι", "ξε", "γλ", "χε", "ωσ", "υτ", "αυ", "ευ")
  /** Top-frequency Russian letters (≈72% of running text): stacked ON
    * TOP of the bigram gate — a tiny scramble can luck into a few
    * bigram hits (measured: a 14-letter Turkish pangram cluster under
    * iso-8859-5), but its letter MASS still lands off the head. */
  private val RuTop: Set[Char] = "оеаинтсрвлкмдпу".toSet
  private val HeTop: Set[Char] = "יוהלארתבמש".toSet
  private val ArTop: Set[Char] = "اليمونرتبهدة".toSet
  private val ThTop: Set[Char] = "านรเอกงมย่ิ้สลวทดีัหไบ".toSet
  /** Hebrew final forms — legal only where no Hebrew letter follows. */
  private val HeFinals: Set[Char] = "ךםןףץ".toSet

  /** Shared punctuation the legacy single-byte maps carry alongside
    * their script (NBSP, soft hyphen, guillemets, dashes, ellipsis,
    * curly quotes, §, °, ±, ·, №, €, bidi/join controls). Allowed,
    * never counted as letters. */
  private def isLegacyPunct(c: Char): Boolean = c match {
    case 0xA0 | 0xAD | 0xAB | 0xBB | 0xB7 | 0xB0 | 0xB1 | 0xA7 | 0xA6 => true
    case 0x2013 | 0x2014 | 0x2010 | 0x2026 | 0x2116 | 0x20AC => true
    case 0x201C | 0x201D | 0x201E | 0x2018 | 0x2019 | 0x201A => true
    case 0x200C | 0x200D | 0x200E | 0x200F | 0x2020 | 0x2021 | 0x2022 => true
    case _ => false
  }

  private def scriptOf(family: String): String = family match {
    case "windows-1251" | "koi8-r" | "iso-8859-5" => "cyr"
    case "windows-1253" | "iso-8859-7"            => "greek"
    case "windows-1255"                           => "hebrew"
    case "windows-1256"                           => "arabic"
    case _                                        => "thai"
  }

  /** Fold a Greek char to its lowercase base letter (tonos stripped,
    * ς → σ) for bigram matching; 0 = not a Greek letter. */
  private def greekFold(c: Char): Char = c match {
    case 0x03AC => 'α'; case 0x03AD => 'ε'; case 0x03AE => 'η'
    case 0x03AF | 0x0390 | 0x03CA => 'ι'; case 0x03CC => 'ο'
    case 0x03CD | 0x03B0 | 0x03CB => 'υ'; case 0x03CE => 'ω'
    case 0x03C2 => 'σ'
    case 0x0386 => 'α'; case 0x0388 => 'ε'; case 0x0389 => 'η'
    case 0x038A | 0x03AA => 'ι'; case 0x038C => 'ο'
    case 0x038E | 0x03AB => 'υ'; case 0x038F => 'ω'
    case c2 if c2 >= 0x0391 && c2 <= 0x03A9 && c2 != 0x03A2 => (c2 + 0x20).toChar
    case c2 if c2 >= 0x03B1 && c2 <= 0x03C9 => c2
    case _ => 0
  }

  /** Does strictly-decoded `t` read as plausible prose of `family`'s
    * script? See the block comment above for the stacked gates; every
    * threshold is integer arithmetic, and the script-STRUCTURE rules
    * (Thai combining-mark position, Hebrew final forms) are one-strike
    * like the block check — a scramble that stays inside the script's
    * letter grid still violates how the script is written. */
  private def plausibleSingleByte(family: String, t: String): Boolean = {
    val script = scriptOf(family)
    var nonAscii = 0; var letters = 0; var lower = 0; var upper = 0
    var topHit = 0; var pairs = 0; var pairHits = 0
    var prevFold: Char = 0 // previous char folded; 0 = not a letter
    var prevRaw: Char = 0
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      var fold: Char = 0
      if (c >= 0x80) {
        nonAscii += 1
        script match {
          case "cyr" =>
            if (c >= 0x0430 && c <= 0x045F) { letters += 1; lower += 1; fold = c }
            else if (c >= 0x0410 && c <= 0x042F) { letters += 1; upper += 1; fold = (c + 0x20).toChar }
            else if (c >= 0x0400 && c <= 0x040F) { letters += 1; upper += 1; fold = (c + 0x50).toChar }
            else if (!isLegacyPunct(c)) return false
          case "greek" =>
            fold = greekFold(c)
            if (fold != 0) {
              letters += 1
              val isLo = (c >= 0x03AC && c <= 0x03CE) || c == 0x0390 || c == 0x03B0
              if (isLo) lower += 1 else upper += 1
            }
            else if (c != 0x0384 && c != 0x0385 && c != 0x0387 && !isLegacyPunct(c)) return false
          case "hebrew" =>
            if (c >= 0x05D0 && c <= 0x05EA) {
              // final forms close words: another Hebrew letter directly
              // before a final's PREDECESSOR — i.e. a final followed by
              // a letter — is not how Hebrew is written
              if (prevRaw != 0 && HeFinals.contains(prevRaw)) return false
              letters += 1; fold = c
            }
            else if (!((c >= 0x05B0 && c <= 0x05C7) || c == 0x05F3 || c == 0x05F4 ||
              c == 0x20AA || isLegacyPunct(c))) return false
          case "arabic" =>
            val isAr = (c >= 0x0621 && c <= 0x064A) || c == 0x067E || c == 0x0686 ||
              c == 0x0698 || c == 0x06A9 || c == 0x06AF || c == 0x06CC || c == 0x06D2 ||
              c == 0x0679 || c == 0x0688 || c == 0x0691 || c == 0x06BA || c == 0x06BE ||
              c == 0x06C1
            if (isAr) { letters += 1; fold = c }
            else if (!((c >= 0x064B && c <= 0x0655) || c == 0x0640 ||
              (c >= 0x0660 && c <= 0x0669) || c == 0x060C || c == 0x061B || c == 0x061F ||
              c == 0x066A || c == 0x066B || c == 0x066C ||
              // cp1256 is bilingual: accented-Latin cells are legal,
              // uncounted
              (c >= 0x00C0 && c <= 0x00FF) || isLegacyPunct(c))) return false
          case _ => // thai
            if (c >= 0x0E01 && c <= 0x0E4E) {
              // combining marks attach: above/below vowels (ั, ิ-ฺ)
              // only to a consonant; tone marks and signs (็-์) to a
              // consonant or such a vowel — a scramble that lands in
              // the Thai grid still puts ิ after ำ or at word start
              val isConsonant = prevRaw >= 0x0E01 && prevRaw <= 0x0E2E
              val isAboveBelow = prevRaw == 0x0E31 || (prevRaw >= 0x0E34 && prevRaw <= 0x0E3A)
              if (c == 0x0E31 || (c >= 0x0E34 && c <= 0x0E3A)) {
                if (!isConsonant) return false
              } else if (c >= 0x0E47 && c <= 0x0E4E) {
                if (!isConsonant && !isAboveBelow) return false
              }
              letters += 1; fold = c
            }
            else if (!(c == 0x0E4F || c == 0x0E46 || c == 0x0E2F || c == 0x0E3F ||
              (c >= 0x0E50 && c <= 0x0E5B) || isLegacyPunct(c))) return false
        }
        if (fold != 0) {
          script match {
            case "hebrew" => if (HeTop.contains(fold)) topHit += 1
            case "arabic" => if (ArTop.contains(fold)) topHit += 1
            case "thai"   => if (ThTop.contains(fold)) topHit += 1
            case _ => // cyr + greek: bigram gates (+ letter head for cyr)
              if (script == "cyr" && RuTop.contains(fold)) topHit += 1
              if (prevFold != 0) {
                pairs += 1
                val hit =
                  if (script == "cyr") RuBigrams.contains(s"$prevFold$fold")
                  else GrBigrams.contains(s"$prevFold$fold")
                if (hit) pairHits += 1
              }
          }
        }
      }
      prevFold = fold
      prevRaw = if (c >= 0x80) c else 0
      i += 1
    }
    if (letters < 8 || 4 * letters < 3 * nonAscii) false
    else script match {
      case "cyr" =>
        lower >= 2 * upper && pairs >= 6 && 3 * pairHits >= pairs &&
          2 * topHit >= letters
      case "greek" =>
        lower >= 2 * upper && pairs >= 6 && 3 * pairHits >= pairs
      case _ => // hebrew, arabic, thai
        2 * topHit >= letters
    }
  }

  /** Content-based single-byte detection: Some(family) iff exactly one
    * candidate strictly validates AND reads as plausible prose of its
    * script — with the one principled exception that candidates whose
    * decoded texts are identical collapse to the first in
    * [[SingleByteFamilies]] order. Ties with DIFFERENT texts and
    * misses stay None: quarantine is recoverable, mojibake is not. */
  def detectSingleByte(b: Array[Byte]): Option[String] =
    detectSingleByteDecoded(b).map(_._1)

  /** [[detectSingleByte]] keeping the winner's decoded text, so the
    * gate's hot path never re-decodes the winning family. */
  private[codec] def detectSingleByteDecoded(b: Array[Byte]): Option[(String, String)] = {
    var foundCs: String = null
    var foundText: String = null
    val it = SingleByteFamilies.iterator
    while (it.hasNext) {
      val cs = it.next()
      strictLegacyDecode(b, cs) match {
        case Some(t) if plausibleSingleByte(cs, t) =>
          if (foundCs == null) { foundCs = cs; foundText = t }
          else if (t != foundText) return None // ambiguous: quarantine honestly
        case _ =>
      }
    }
    if (foundCs == null) None else Some((foundCs, foundText))
  }

  private val MetaCharset =
    "(?is)<meta[^>]{0,512}?charset\\s*=\\s*['\"]?\\s*([a-z0-9_:\\-]+)".r

  /** RAW declared charset from a `<meta charset=…>` / `<meta http-equiv
    * content="…; charset=…">` in the first 1024 bytes (both spellings
    * end in `charset=`, one pattern covers them) — unnormalized, so the
    * sniff can tell "no declaration" from "a declaration nothing here
    * understands". */
  private[codec] def metaLabelRaw(b: Array[Byte]): Option[String] = {
    val head = new String(b, 0, math.min(b.length, 1024), "ISO-8859-1")
    MetaCharset.findFirstMatchIn(head).map(_.group(1))
  }

  /** Normalized meta declaration (None = absent or unrecognized). */
  private[codec] def metaLabel(b: Array[Byte]): Option[String] =
    metaLabelRaw(b).flatMap(normalizeLabel)

  private val CtCharset = "(?i)charset\\s*=\\s*['\"]?\\s*([a-z0-9_:\\-]+)".r

  /** The charset parameter of an HTTP `Content-Type` header value
    * (`text/html; charset=windows-1252`), normalized — the
    * TRANSPORT-layer declaration, which WHATWG ranks above the in-body
    * meta tag but below a BOM. None = absent OR unrecognized; callers
    * that must route unrecognized declarations to the `unknown`
    * verdict pass [[contentTypeLabelRaw]] as the sniff hint instead. */
  def contentTypeLabel(contentType: String): Option[String] =
    contentTypeLabelRaw(contentType).flatMap(normalizeLabel)

  /** The raw charset parameter, unnormalized (None = absent). */
  def contentTypeLabelRaw(contentType: String): Option[String] =
    CtCharset.findFirstMatchIn(contentType).map(_.group(1))

  /** Detected charset label for a payload (sniff only, no decode).
    * `hint` is a transport-layer declaration — raw or already
    * canonical, both normalize here: BOM > hint > meta > heuristic,
    * where an unrecognized transport label falls through to a
    * recognized meta declaration rather than shadowing it (an invalid
    * label is no label, per WHATWG). Verdicts beyond the recognized
    * labels: bytes that validate as strict UTF-8 earn utf-8 (garbage
    * labels on genuine UTF-8 pages are common); otherwise content
    * detection ([[detectMultiByte]]) gets one shot — both when every
    * declared label was unrecognized and when there was no declaration
    * but the high-byte density reaches 25% on ≥ 16 bytes (multi-byte
    * legacy text of SOME kind). Detection accepts only an UNAMBIGUOUS,
    * script-plausible family; everything else keeps the `unknown`
    * quarantine verdict. Sparse high bytes with no declaration take
    * the windows-1252 / latin-1 split as before. */
  def sniff(b: Array[Byte], hint: Option[String] = None): String =
    sniffDetected(b, hint)._1

  /** [[sniff]] carrying the detection sweep's DECODED text when the
    * verdict came from [[detectMultiByteDecoded]], so [[decode]] never
    * re-decodes a payload the sweep already decoded (the sweep itself
    * is 5 strict decodes — paying a 6th for the winner on every
    * recovered page would tax the gate's hot path). */
  private def sniffDetected(b: Array[Byte], hint: Option[String]): (String, Option[String]) =
    if (b.length >= 3 && b(0) == 0xEF.toByte && b(1) == 0xBB.toByte && b(2) == 0xBF.toByte)
      ("utf-8", None)
    else if (b.length >= 2 && b(0) == 0xFF.toByte && b(1) == 0xFE.toByte) ("utf-16le", None)
    else if (b.length >= 2 && b(0) == 0xFE.toByte && b(1) == 0xFF.toByte) ("utf-16be", None)
    else {
      val meta = metaLabelRaw(b)
      // multi-byte families first (their strict validation is the
      // stronger instrument), then the single-byte script sweep — both
      // exactly-one-plausible, both falling through to quarantine
      def detected: (String, Option[String]) = detectMultiByteDecoded(b) match {
        case Some((cs, t)) => (cs, Some(t))
        case None => detectSingleByteDecoded(b) match {
          case Some((cs, t)) => (cs, Some(t))
          case None          => ("unknown", None)
        }
      }
      // transport label outranks meta, but an UNRECOGNIZED transport
      // label falls through to a recognized meta declaration (WHATWG:
      // an invalid label is no label) instead of shadowing it
      hint.flatMap(normalizeLabel).orElse(meta.flatMap(normalizeLabel)) match {
        case Some(cs) => (cs, None)
        case None =>
          if (isValidUtf8(b)) ("utf-8", None)
          else if (hint.isDefined || meta.isDefined)
            // a declaration existed but nothing recognized it and the
            // bytes are not UTF-8: content detection is the last
            // chance before quarantine
            detected
          else {
            // density triage needs enough bytes to be a statistic — under
            // 16 the Latin split is the only defensible guess
            var hi = 0
            var i = 0
            while (i < b.length) { if ((b(i) & 0xFF) >= 0x80) hi += 1; i += 1 }
            if (b.length >= 16 && 4L * hi >= b.length)
              // dense multi-byte payload with no declaration at all:
              // the detection sweep recovers the unambiguous CJK pages
              // (the bulk of the old quarantine bucket); ambiguous or
              // implausible payloads keep the unknown verdict
              detected
            else if (b.exists(x => (x & 0xFF) >= 0x80 && (x & 0xFF) <= 0x9F))
              ("windows-1252", None)
            else ("iso-8859-1", None)
          }
      }
    }

  private def decodeSingleByte(b: Array[Byte], cp1252: Boolean): String = {
    val sb = new java.lang.StringBuilder(b.length)
    var i = 0
    while (i < b.length) {
      val x = b(i) & 0xFF
      sb.append(
        if (cp1252 && x >= 0x80 && x <= 0x9F) Cp1252High(x - 0x80) else x.toChar)
      i += 1
    }
    sb.toString
  }

  /** Strict JDK decode for a CJK label: None when any byte sequence is
    * malformed or unmappable (REPORT, not REPLACE) — the validation
    * step that turns a wrong CJK declaration into the `unknown`
    * verdict instead of replacement-character soup. Decoders are
    * per-call: `CharsetDecoder` is stateful and not thread-safe. */
  private def strictLegacyDecode(b: Array[Byte], canonical: String): Option[String] = {
    val dec = java.nio.charset.Charset.forName(LegacyJdk(canonical)).newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try Some(dec.decode(java.nio.ByteBuffer.wrap(b)).toString)
    catch { case _: java.nio.charset.CharacterCodingException => None }
  }

  /** Sniff + decode: (canonical charset label, text). A BOM strips; a
    * declared-but-wrong utf-8 decodes with U+FFFD replacement (the
    * declaration wins, as in browsers — a heuristic override would make
    * the gate non-deterministic across payload truncations). A
    * declared-legacy payload decodes STRICTLY; when its bytes fail the
    * JDK table's validation, content detection
    * ([[detectMultiByteDecoded]]) gets ONE shot — mislabeled pages
    * (gb2312-labeled big5, euc-kr-labeled shift_jis) are common, and
    * the exactly-one-plausible bar opens no new false-positive
    * channel — before the `("unknown", "")` quarantine verdict.
    * `("unknown", "")` is also the verdict when detection cannot
    * attribute unrecognized-label or dense-high-byte unlabeled
    * payloads (see [[sniff]]); callers keep the raw bytes for the
    * quarantine sink. `hint` is the transport-layer declaration (see
    * [[sniff]]). */
  def decode(b: Array[Byte], hint: Option[String] = None): (String, String) = {
    val (cs, detectedText) = sniffDetected(b, hint)
    if (cs == "unknown") ("unknown", "")
    else if (LegacyJdk.contains(cs))
      detectedText.map((cs, _)) // the sweep already decoded this payload
        .orElse(strictLegacyDecode(b, cs).map((cs, _)))
        .orElse(detectMultiByteDecoded(b)) // declared-legacy strict fail: mislabel rescue
        .orElse(detectSingleByteDecoded(b))
        .getOrElse(("unknown", ""))
    else (cs, decodeAs(b, cs))
  }

  /** Decode under a FORCED label (no sniff) — the piece [[decode]]
    * composes with [[sniff]], public for fixture building and for
    * callers that already know the wire charset. A matching BOM
    * strips. */
  def decodeAs(b: Array[Byte], charset: String): String = charset match {
    case "utf-8" =>
      val skip = if (b.length >= 3 && b(0) == 0xEF.toByte &&
        b(1) == 0xBB.toByte && b(2) == 0xBF.toByte) 3 else 0
      new String(b, skip, b.length - skip, "UTF-8")
    case "utf-16le" =>
      val skip = if (b.length >= 2 && b(0) == 0xFF.toByte && b(1) == 0xFE.toByte) 2 else 0
      new String(b, skip, b.length - skip, "UTF-16LE")
    case "utf-16be" =>
      val skip = if (b.length >= 2 && b(0) == 0xFE.toByte && b(1) == 0xFF.toByte) 2 else 0
      new String(b, skip, b.length - skip, "UTF-16BE")
    case "windows-1252" => decodeSingleByte(b, cp1252 = true)
    case cjk if LegacyJdk.contains(cjk) =>
      // FORCED decode is total: U+FFFD replacement (the sniffing
      // [[decode]] quarantines invalid CJK instead of calling this)
      new String(b, java.nio.charset.Charset.forName(LegacyJdk(cjk)))
    case _              => decodeSingleByte(b, cp1252 = false)
  }

  /** Repair the classic mojibake: UTF-8 bytes that were once DECODED as
    * windows-1252/latin-1 and re-saved ("café" → "cafÃ©", "—" → "â€”").
    * The inverse is deterministic: if every char maps back to a single
    * byte under the cp1252 reverse table (chars ≤ 0xFF plus the 27
    * high-block mappings) AND those bytes form STRICTLY VALID UTF-8
    * with at least one multi-byte sequence, the text was mojibake with
    * probability ~1 (a real cp1252 sentence virtually never forms valid
    * multi-byte UTF-8 — lead bytes are accented capitals like Ã/Â/â
    * followed by exactly the right continuation punctuation). One
    * round of the inverse; genuinely clean text (ASCII, or accented
    * text that is NOT valid UTF-8 as bytes) passes through untouched.
    * Returns (repaired text, was-repaired). */
  def fixMojibake(s: String): (String, Boolean) = {
    if (s.isEmpty || s.forall(_ < 0x80)) return (s, false)
    val bytes = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val b =
        if (c <= 0x7F || (c >= 0xA0 && c <= 0xFF)) c.toByte
        else Cp1252Rev.getOrElse(c,
          if (c <= 0x9F) c.toByte // C1 pass-through (undefined cp1252 cells)
          else return (s, false)) // not single-byte-expressible: not mojibake
      bytes(i) = b
      i += 1
    }
    if (!isValidUtf8(bytes)) return (s, false)
    if (!bytes.exists(b => (b & 0xFF) >= 0xC2)) return (s, false) // no multi-byte
    (new String(bytes, "UTF-8"), true)
  }

  /** Encode for fixture building and transcode round trips. utf-16
    * variants prepend their BOM (the signature [[sniff]] keys on);
    * single-byte charsets throw on an unencodable character rather than
    * substitute — a fixture that silently lost a character would pin
    * the wrong oracle. */
  def encode(s: String, charset: String): Array[Byte] = charset match {
    case "utf-8" => s.getBytes("UTF-8")
    case "utf-16le" =>
      Array(0xFF.toByte, 0xFE.toByte) ++ s.getBytes("UTF-16LE")
    case "utf-16be" =>
      Array(0xFE.toByte, 0xFF.toByte) ++ s.getBytes("UTF-16BE")
    case "iso-8859-1" =>
      s.map { c =>
        require(c <= 0xFF, f"U+${c.toInt}%04X not in iso-8859-1")
        c.toByte
      }.toArray
    case "windows-1252" =>
      s.map { c =>
        if (c <= 0x7F || (c >= 0xA0 && c <= 0xFF)) c.toByte
        else Cp1252Rev.getOrElse(c,
          throw new IllegalArgumentException(f"U+${c.toInt}%04X not in windows-1252"))
      }.toArray
    case cjk if LegacyJdk.contains(cjk) =>
      val enc = java.nio.charset.Charset.forName(LegacyJdk(cjk)).newEncoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      try {
        val bb = enc.encode(java.nio.CharBuffer.wrap(s))
        val out = new Array[Byte](bb.remaining())
        bb.get(out)
        out
      } catch {
        case e: java.nio.charset.CharacterCodingException =>
          throw new IllegalArgumentException(s"text not encodable in $cjk", e)
      }
    case other => throw new IllegalArgumentException(s"unsupported charset: $other")
  }
}
