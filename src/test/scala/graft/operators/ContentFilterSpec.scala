package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the two per-row content filters added beside the Gopher gates:
  * the C4 rule set (line tier + doc tier, gate order) and the
  * jusText/Boilerpipe block-level main-content classifier (length +
  * link density). Every case is hand-computed. */
class ContentFilterSpec extends SparkSpec {
  import spark.implicits._

  private def c4(rows: (Long, String)*) =
    TextOps.c4Filter(rows.toDF("doc_id", "t"), "doc_id", "t")
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(4), r.getString(5), r.getString(3)))

  test("c4Filter line tier: word count, terminal punct, javascript banner") {
    val Array(r) = c4(
      1L -> Seq(
        "Headline only",                              // 2 words → drop
        "",                                           // blank → drop
        "the quick brown fox runs.",                  // kept
        "no terminal punctuation here",               // no [.!?\"] → drop
        "Please enable JavaScript to continue.",      // banner → drop
        "He said \"stop\"",                           // ends in quote → kept
        "Across five words it goes!").mkString("\n")  // kept
    ).map(r => (r._2, r._3, r._6))
    assert(r._1 == 7L)                                // n_lines counts all
    assert(r._2 == 3L)                                // three survivors
    assert(r._3 ==
      "the quick brown fox runs.\nHe said \"stop\"\nAcross five words it goes!")
  }

  test("c4Filter doc tier: gate order lorem > curly > sentences, raw-text gates") {
    val five = "One two three ok. Two more here! Three now? Four again. Five done."
    val out = c4(
      // lorem ipsum wins even when a curly brace is also present
      1L -> s"Lorem ipsum dolor sit amet { code }.\n$five",
      // curly brace in a line the LINE tier drops still fails the DOC
      2L -> s"function f() { return 1 }\n$five",
      // five sentences over kept lines → kept
      3L -> five,
      // four sentences → too_few_sentences
      4L -> "One two three ok. Two more! Three? Four done.",
      // sentence count is over KEPT lines: terminators on dropped lines
      // (two-word line) do not rescue the doc
      5L -> "a. b.\nOnly four in here. Two! Three? Four done.")
      .map(r => (r._1, r._5))
    assert(out.toSeq == Seq(
      (1L, "lorem_ipsum"), (2L, "curly_brace"), (3L, "kept"),
      (4L, "too_few_sentences"), (5L, "too_few_sentences")))
  }

  test("c4Filter: CRLF line endings survive the terminal-punct check") {
    val Array(r) = c4(
      1L -> "First line ends well.\r\nSecond line also ends! Third? Fourth. Fifth done.")
    assert(r._2 == 2L && r._3 == 2L)       // both CRLF lines counted and kept
    assert(r._5 == "kept")                 // 5 sentences over kept lines
    assert(!r._6.contains("\r"))           // reassembly normalizes to LF
    // A bare-CR line ("line.\r\r\n" → token "line.\r") must NOT pass the
    // terminal-punct anchor: Java's $ would match before the trailing \r
    // where the oracle's RE2 $ would not — the operator uses \z.
    val Array(r2) = c4(1L -> "Ends with bare CR here.\r\r\nAnd the clean closing line stays kept.")
    assert(r2._3 == 1L && r2._6 == "And the clean closing line stays kept.")
  }

  test("c4Filter: null text behaves as empty") {
    val df = Seq((1L, Option.empty[String]), (2L, Some("Real line with five words here. A! B? C. D.")))
      .toDF("doc_id", "t")
    val got = TextOps.c4Filter(df, "doc_id", "t").orderBy("doc_id")
      .select("n_kept", "verdict").as[(Long, String)].collect()
    assert(got.toSeq == Seq((0L, "too_few_sentences"), (1L, "kept")))
  }

  private val page =
    "<html><body>" +
      "<nav><a href=\"/\">Home</a> <a href=\"/a\">About</a></nav>" +
      "<p>This paragraph is the real article body and is comfortably long.</p>" +
      "<p>Tiny.</p>" +
      "<blockquote>A long quoted passage keeps its <a href=\"/c\">single link</a> because density stays low.</blockquote>" +
      "<footer>Copyright <a href=\"/l\">legal terms</a> <a href=\"/p\">privacy page</a></footer>" +
      "</body></html>"

  test("contentBlocks: per-block text and anchor-length bookkeeping") {
    val rows = Seq(page).toDF("html")
      .select(explode(TextOps.contentBlocks(col("html"))).as("b"))
      .select(col("b.txt"), col("b.alen")).as[(String, Long)].collect()
    val byTxt = rows.toMap
    assert(byTxt("Home About") == "Home About".length.toLong)    // pure nav: density 1
    assert(byTxt("Tiny.") == 0L)
    assert(byTxt.keys.exists(_.startsWith("A long quoted passage")))
    assert(byTxt("A long quoted passage keeps its single link because density stays low.") ==
      "single link".length.toLong)
    // footer: two anchors joined by a space
    assert(byTxt.keys.exists(_.startsWith("Copyright")))
    assert(byTxt("Copyright legal terms privacy page") ==
      "legal terms privacy page".length.toLong)
  }

  test("mainContent: length bar and link-density bar, not link presence") {
    val got = Seq(page).toDF("html")
      .select(TextOps.mainContent(col("html")).as("m")).as[String].head()
    assert(got ==
      "This paragraph is the real article body and is comfortably long.\n" +
        "A long quoted passage keeps its single link because density stays low.")
    // nav (density 1.0) and footer (24/34 ≈ 0.7) fail the density bar;
    // "Tiny." fails the length bar; the linked blockquote (11/71) passes.
  }

  test("contentBlocks: <abbr>/<audio> are not anchors — only real <a> elements count") {
    // A naive <a[^>]*> pattern matches <abbr> and lazily swallows text
    // to the NEXT </a>, inflating anchor length past the density bar.
    val html = "<p>The <abbr>HTML</abbr> specification text here is long enough " +
      "to pass every bar and the <a href=\"/x\">tiny link</a> stays small.</p>"
    val Array((txt, alen)) = Seq(html).toDF("html")
      .select(explode(TextOps.contentBlocks(col("html"))).as("b"))
      .select(col("b.txt"), col("b.alen")).as[(String, Long)].collect()
    assert(txt.startsWith("The HTML specification"))
    assert(alen == "tiny link".length.toLong)
  }

  test("contentBlocks: tag-name boundary — <picture>/<progress>/<link>/<track> do not split") {
    // An unanchored `</?(?:p|li|tr|…)[^>]*>` pattern also matches any tag
    // whose NAME merely starts with a listed one — <picture>/<param>/
    // <progress> via `p`, <link> via `li`, <track> via `tr` — so an
    // inline <picture> inside a paragraph fragments the prose into
    // pieces that each fail the length bar. The anchored pattern splits
    // at real block tags only.
    val html = "<p>This paragraph keeps an inline <picture>pic</picture> element " +
      "and a <progress>half</progress> meter <link rel=\"x\"> <track kind=\"y\"> " +
      "without fragmenting into pieces below the bar.</p>"
    val rows = Seq(html).toDF("html")
      .select(explode(TextOps.contentBlocks(col("html"))).as("b"))
      .select(col("b.txt")).as[String].collect()
    assert(rows.length == 1, s"one prose block expected, got ${rows.toSeq}")
    assert(rows.head == "This paragraph keeps an inline pic element and a half " +
      "meter without fragmenting into pieces below the bar.")
    // while real block tags — including attribute-bearing and
    // self-closed spellings — still split
    val html2 = "<div class=\"a\">First block is long enough to pass.</div>" +
      "<br/>Second block also long enough to pass the bar."
    val rows2 = Seq(html2).toDF("html")
      .select(explode(TextOps.contentBlocks(col("html"))).as("b"))
      .select(col("b.txt")).as[String].collect()
    assert(rows2.toSeq == Seq("First block is long enough to pass.",
      "Second block also long enough to pass the bar."))
  }

  test("mainContent: stopword tier drops long link-free non-prose, keeps prose") {
    val stops = Seq("the", "a", "of", "and", "to", "in", "is")
    val html = "<body><p>The quick brown fox jumps over the lazy dog in a long sentence.</p>" +
      "<div>408 512 998 3 14 15 926 535 897 93 238 462 643 383 279 502</div></body>"
    val base = Seq(html).toDF("html")
      .select(TextOps.mainContent(col("html")).as("m")).as[String].head()
    assert(base.contains("408 512") && base.contains("quick brown"))
    val lang = Seq(html).toDF("html")
      .select(TextOps.mainContent(col("html"), stopwords = stops, minStopFrac = 0.05)
        .as("m")).as[String].head()
    assert(lang == "The quick brown fox jumps over the lazy dog in a long sentence.")
  }

  test("contentKeepByLang: per-row language dispatch, unlisted language skips the tier") {
    val sets = Seq(
      "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
      "de" -> Seq("der", "die", "das", "und", "in", "den", "von", "zu", "ist", "mit"))
    val prose = "<p>Die Geschichte geht weiter und weiter in der gleichen Form bis zu dem Ende.</p>"
    val numbers = "<div>408 512 998 3 14 15 926 535 897 93 238 462 643 383 279 502</div>"
    val html = "<body>" + prose + numbers + "</body>"
    def keptWith(lg: String) =
      Seq((lg, html)).toDF("lang", "html")
        .select(filter(TextOps.contentBlocks(col("html")),
          b => TextOps.contentKeepByLang(b, col("lang"), sets, minStopFrac = 0.05)).as("k"))
        .select(transform(col("k"), _.getField("txt")).as("t"))
        .as[Seq[String]].head()
    // de: German prose passes its own set; the number run fails the tier
    assert(keptWith("de") == Seq("Die Geschichte geht weiter und weiter in der gleichen Form bis zu dem Ende."))
    // unlisted language (zh): tier skipped entirely — both blocks stay
    assert(keptWith("zh").toSet == Set(
      "Die Geschichte geht weiter und weiter in der gleichen Form bis zu dem Ende.",
      "408 512 998 3 14 15 926 535 897 93 238 462 643 383 279 502"))
  }

  test("htmlMeta: two-step attribute extraction, flipped order, absent fields") {
    val cases = Seq(
      // canonical form
      "<html lang=\"de\"><head><title> Spaced   Title </title>" +
        "<meta name=\"description\" content=\"Desc one.\">" +
        "<link rel=\"canonical\" href=\"https://x.org/a\"></head></html>" ->
        ("Spaced Title", "de", "Desc one.", "", "https://x.org/a"),
      // flipped attribute order still resolves; og:title present
      "<head><meta content=\"Flipped.\" name=\"description\">" +
        "<meta property=\"og:title\" content=\"OG\"></head>" ->
        ("", "", "Flipped.", "OG", ""),
      // absent everything -> empty strings, never neighbors' values
      "<head><meta name=\"keywords\" content=\"not this\"></head>" ->
        ("", "", "", "", ""))
    val got = cases.map(_._1).toDF("html")
      .select(TextOps.htmlMeta(col("html")).as("m"))
      .select("m.title", "m.lang_attr", "m.meta_desc", "m.og_title", "m.canonical")
      .as[(String, String, String, String, String)].collect().toSeq
    assert(got == cases.map(_._2))
  }

  test("mainContent: script/style contents and comments never leak into blocks") {
    val html = "<body><script>var hidden = 'long enough to pass every bar if it leaked';</script>" +
      "<!-- a comment long enough to pass the length bar easily -->" +
      "<p>Only this visible paragraph survives into the article text.</p></body>"
    val got = Seq(html).toDF("html")
      .select(TextOps.mainContent(col("html")).as("m")).as[String].head()
    assert(got == "Only this visible paragraph survives into the article text.")
  }

  test("pageRobots: a colon-parameterized directive is not an agent prefix") {
    import spark.implicits._
    def verdict(html: String, hdr: String): (Boolean, Boolean) =
      Seq((html, hdr)).toDF("html", "hdr")
        .select(TextOps.pageRobots(col("html"), col("hdr"), "graftbot").as("v"))
        .select(col("v.noindex"), col("v.nofollow"))
        .as[(Boolean, Boolean)].head()
    // the trap: a line-leading parameterized directive would read as an
    // alien agent prefix and drop the CO-LOCATED noindex with it —
    // inverting most-restrictive-wins
    assert(verdict("<html></html>", "max-snippet: 20, noindex") == ((true, false)))
    assert(verdict("<html></html>",
      "unavailable_after: 25 Jun 2026 15:00:00 PST, nofollow") == ((false, true)))
    // a genuinely alien agent prefix still drops its whole line
    assert(verdict("<html></html>", "otherbot: noindex, nofollow") == ((false, false)))
    // ... and our own prefix still applies
    assert(verdict("<html></html>", "graftbot: none") == ((true, true)))
  }

  test("metaRefresh: attribute orders, quote stripping, delay-only, resolution") {
    def mr(html: String): (Boolean, Option[Int], Option[String]) =
      Seq((html, "http://h.example/p/1")).toDF("html", "u")
        .select(TextOps.metaRefresh(col("html"), col("u")).as("v"))
        .select(col("v.has_refresh"), col("v.delay_s"), col("v.target"))
        .as[(Boolean, Option[Int], Option[String])].head()
    assert(mr("<meta http-equiv=\"refresh\" content=\"0; url=/next\">") ==
      ((true, Some(0), Some("http://h.example/next"))))
    // flipped attribute order + uppercase URL= + absolute target
    assert(mr("<meta content=\"3;URL=https://o.example/x\" http-equiv=\"refresh\">") ==
      ((true, Some(3), Some("https://o.example/x"))))
    // single-quoted target with spaces around '='
    assert(mr("<meta http-equiv=\"refresh\" content=\"1; url = '/q/2'\">") ==
      ((true, Some(1), Some("http://h.example/q/2"))))
    // delay-only self-reload: a refresh, not a redirect
    assert(mr("<meta http-equiv=\"refresh\" content=\"300\">") ==
      ((true, Some(300), None)))
    // junk content: has_refresh true, nothing else
    assert(mr("<meta http-equiv=\"refresh\" content=\"soon\">") ==
      ((true, None, None)))
    // no refresh tag at all
    assert(mr("<meta name=\"robots\" content=\"0; url=/trap\">") ==
      ((false, None, None)))
  }

  test("feedEntries: rss relative links, atom href orders, linkless entry") {
    def fe(xml: String): Seq[(String, Option[String], String)] =
      Seq((xml, "http://h.example/feed.xml")).toDF("xml", "u")
        .select(explode(TextOps.feedEntries(col("xml"), col("u"))).as("e"))
        .select(col("e.title"), col("e.url"), col("e.published"))
        .as[(String, Option[String], String)].collect().toSeq
    val rss = "<rss version=\"2.0\"><channel>" +
      "<item><title>A</title><link>/a/1</link><pubDate>D1</pubDate></item>" +
      "<item><title>B</title><pubDate>D2</pubDate></item>" + // linkless
      "</channel></rss>"
    assert(fe(rss) == Seq(
      ("A", Some("http://h.example/a/1"), "D1"),
      ("B", None, "D2")))
    val atom = "<feed xmlns=\"http://www.w3.org/2005/Atom\">" +
      "<entry><title>C</title><link rel=\"alternate\" href=\"http://o.example/c\"/>" +
      "<updated>T1</updated></entry>" +
      "<entry><title>D</title><link href=\"/d\" rel=\"alternate\"/>" +
      "<updated>T2</updated></entry></feed>"
    assert(fe(atom) == Seq(
      ("C", Some("http://o.example/c"), "T1"),
      ("D", Some("http://h.example/d"), "T2")))
    // not a feed: empty
    assert(fe("<html><body>nope</body></html>").isEmpty)
    // kinds route
    val kinds = Seq(rss, atom, "<html/>").toDF("xml")
      .select(TextOps.feedKind(col("xml"))).as[String].collect().toSeq
    assert(kinds == Seq("rss", "atom", "none"))
  }
}
