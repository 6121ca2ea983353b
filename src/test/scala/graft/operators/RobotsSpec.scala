package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the REP parser's group-state machine (RFC 9309 §2.2) and the
  * evaluator's precedence: most-specific agent group, longest prefix,
  * Allow on ties, default allowed. */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  test("parse: comments, case, shared groups, group reset, empty values, CRLF") {
    val txt =
      "# banner comment\r\n" +
        "User-Agent: GoogleBot   # trailing comment\r\n" +
        "user-agent: graftbot\n" +
        "Disallow: /private\n" +
        "ALLOW: /private/ok\n" +
        "Disallow:\n" +              // empty value: no-op rule, closes group
        "User-agent: *\r" +          // after rules: NEW group, not appended
        "Crawl-delay: 10\n" +        // directive: captured, closes the group
        "Disallow: /tmp\n" +
        "Sitemap: https://x.org/s.xml\n" +
        "notacolonline\n" +
        "Allow: /tmp/keep\n"
    val all = Robots.parseAll(txt)
    assert(all.delays == Seq("*" -> 10000L),
      "Crawl-delay attaches to the current group")
    assert(all.sitemaps == Seq("https://x.org/s.xml"), "Sitemap is file-global")
    val rules = Robots.parse(txt)
    assert(rules.toSet == Set(
      Robots.Rule("googlebot", false, "/private"),
      Robots.Rule("graftbot", false, "/private"),
      Robots.Rule("googlebot", true, "/private/ok"),
      Robots.Rule("graftbot", true, "/private/ok"),
      Robots.Rule("*", false, "/tmp"),
      Robots.Rule("*", true, "/tmp/keep")))
    assert(Robots.parse("") == Seq.empty)
    assert(Robots.parse("Disallow: /orphan") == Seq.empty, "rule before any group")
  }

  test("evaluate: agent-group selection, longest match, Allow tie-break, default") {
    val rules = Seq(
      ("a.org", "*", false, "/x"),
      ("a.org", "*", true, "/x/pub"),
      ("a.org", "bot", true, "/"),          // exact group overrides * entirely
      ("a.org", "bot", false, "/x"),
      ("b.org", "*", false, "/p"),
      ("b.org", "*", true, "/p"),           // same length: Allow wins
      ("c.org", "*", false, "/only")
    ).toDF("domain", "agent", "allow", "prefix")
    val urls = Seq(
      ("a.org", "/x/pub/1"),   // bot group: /x disallow (len 2) beats / allow -> blocked
      ("a.org", "/y"),         // bot group: / allow matches -> allowed
      ("b.org", "/p/deep"),    // tie at len 2 -> Allow wins
      ("b.org", "/q"),         // no match -> default allowed
      ("d.org", "/anything")   // domain with no rules -> allowed
    ).toDF("domain", "path")
    val got = Robots.evaluate(urls, rules, "Bot")
      .select("domain", "path", "allowed").as[(String, String, Boolean)]
      .collect().map { case (d, p, al) => (d, p) -> al }.toMap
    assert(got == Map(
      ("a.org", "/x/pub/1") -> false,
      ("a.org", "/y") -> true,
      ("b.org", "/p/deep") -> true,
      ("b.org", "/q") -> true,
      ("d.org", "/anything") -> true))
  }

  test("directives: fractional-second delays, group scope, selection precedence") {
    assert(Robots.delayMs("2") == Some(2000L))
    assert(Robots.delayMs("0.5") == Some(500L))
    assert(Robots.delayMs("1.25") == Some(1250L))
    assert(Robots.delayMs("1.2599") == Some(1259L), "frac truncates past ms")
    assert(Robots.delayMs("0.5s") == None)
    assert(Robots.delayMs("") == None)
    assert(Robots.delayMs(".5") == None, "bare fraction is malformed")
    val txt =
      "User-agent: a\nUser-agent: b\nCrawl-delay: 3\nDisallow: /x\n" +
        "User-agent: *\nCrawl-delay: 0.5\nCrawl-delay: 1.5\n" + // repeated: both kept
        "Sitemap: https://s.org/a.xml\nSitemap: https://s.org/b.xml\n"
    val all = Robots.parseAll(txt)
    assert(all.delays == Seq("b" -> 3000L, "a" -> 3000L, "*" -> 500L, "*" -> 1500L))
    assert(all.sitemaps == Seq("https://s.org/a.xml", "https://s.org/b.xml"))
    // frame selection: exact agent beats *, max wins within a group,
    // missing domain falls to the default
    import spark.implicits._
    val delays = Seq(
      ("d1", "a", 3000L), ("d1", "*", 500L), ("d1", "*", 1500L),
      ("d2", "*", 2000L)).toDF("domain", "agent", "delay_ms")
    val got = Robots.selectDelay(delays, "A", defaultMs = 9999L)
      .as[(String, Long)].collect().toMap
    assert(got == Map("d1" -> 3000L, "d2" -> 2000L))
  }

  test("Crawl-delay closes its group: delay and rule extraction agree on boundaries") {
    // Without the group-close, the second User-agent line would MERGE
    // into the first group for path rules (both a and b sharing the
    // Disallow) while the delay was recorded for a alone — the two
    // extractions disagreeing about where the group ends.
    val all = Robots.parseAll(
      "User-agent: a\nCrawl-delay: 1\nUser-agent: b\nDisallow: /x\n")
    assert(all.delays == Seq("a" -> 1000L), "the delay belongs to a alone")
    assert(all.rules == Seq(Robots.Rule("b", false, "/x")),
      "the Disallow belongs to b alone — a's group closed at the Crawl-delay")
  }

  test("evaluate: RFC 9309 wildcards — '*' runs, trailing '$' anchor, metachar escape") {
    val rules = Seq(
      ("w.org", "*", false, "/*.php"),     // any .php anywhere under /
      ("w.org", "*", true, "/pub/*.php"),  // longer pattern wins for /pub
      ("x.org", "*", false, "/dl$"),       // exactly /dl, nothing longer
      ("y.org", "*", false, "/a+b(c)"),    // regex metachars are literals
      ("z.org", "*", false, "/fish*.php$") // star then anchor
    ).toDF("domain", "agent", "allow", "prefix")
    val urls = Seq(
      ("w.org", "/index.php"),       // /*.php -> blocked
      ("w.org", "/a/b/site.php"),    // '*' spans slashes -> blocked
      ("w.org", "/index.html"),      // no match -> allowed
      ("w.org", "/pub/x.php"),       // Allow /pub/*.php (len 11) beats /*.php (6)
      ("x.org", "/dl"),              // '$' anchors: exact -> blocked
      ("x.org", "/dl/file"),         // longer than anchor -> allowed
      ("y.org", "/a+b(c)/z"),        // literal metachars match -> blocked
      ("y.org", "/aab(c)"),          // '+' is NOT a regex quantifier -> allowed
      ("z.org", "/fishheads/sea.php"), // star run then anchored suffix -> blocked
      ("z.org", "/fish.php?p=1")     // query chars after .php: anchor fails -> allowed
    ).toDF("domain", "path")
    val got = Robots.evaluate(urls, rules, "anybot")
      .select("domain", "path", "allowed").as[(String, String, Boolean)]
      .collect().map { case (d, p, al) => (d, p) -> al }.toMap
    assert(got == Map(
      ("w.org", "/index.php") -> false,
      ("w.org", "/a/b/site.php") -> false,
      ("w.org", "/index.html") -> true,
      ("w.org", "/pub/x.php") -> true,
      ("x.org", "/dl") -> false,
      ("x.org", "/dl/file") -> true,
      ("y.org", "/a+b(c)/z") -> false,
      ("y.org", "/aab(c)") -> true,
      ("z.org", "/fishheads/sea.php") -> false,
      ("z.org", "/fish.php?p=1") -> true))
  }

  test("evaluate: precedence ranks by RFC 9309 octet length; hostile star runs stay linear") {
    // "/ωω" is 3 chars but 5 octets; "*ta" is 3 chars and 3 octets. On
    // a path matching both, char-length ranking ties (Allow would win);
    // octet ranking puts the Disallow first — the RFC's rule.
    val rules = Seq(
      ("m.org", "*", false, "/ωω"),
      ("m.org", "*", true, "*ta"),
      // the backtracking bomb the regex compile choked on: many stars
      // against a long non-matching path — the greedy walk is one pass
      ("h.org", "*", false, "/*a*a*a*a*a*a*a*a*a*a*a*ZZZ")
    ).toDF("domain", "agent", "allow", "prefix")
    val longMiss = "/" + ("ab" * 4000) // never reaches ZZZ
    val urls = Seq(
      ("m.org", "/ωωta"),
      ("h.org", longMiss),
      ("h.org", "/" + ("xa" * 11) + "ZZZ")
    ).toDF("domain", "path")
    val t0 = System.nanoTime()
    val got = Robots.evaluate(urls, rules, "anybot")
      .select("domain", "path", "allowed").as[(String, String, Boolean)]
      .collect().map { case (d, p, al) => (d, p) -> al }.toMap
    val elapsedMs = (System.nanoTime() - t0) / 1000000L
    assert(got == Map(
      ("m.org", "/ωωta") -> false,
      ("h.org", longMiss) -> true,
      ("h.org", "/" + ("xa" * 11) + "ZZZ") -> false))
    assert(elapsedMs < 30000L, s"hostile pattern must not explode (took ${elapsedMs}ms)")
  }
}
